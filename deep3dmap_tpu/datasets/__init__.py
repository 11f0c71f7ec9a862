from .builder import DATASETS, PIPELINES, build_dataset, build_dataloader
from .synthetic import SyntheticScanNetDataset, make_fragment_sample
from .face_tuple import SyntheticFaceTupleDataset
from .nerf_synthetic import SyntheticNerfDataset
from .face_uv import SyntheticFaceUVDataset
from .gan_faces import SyntheticGanFaceDataset
from .lerf_rays import LERFRayDataset
from .scannet import ScanNetDataset
from .real_files import (BlenderDataset, CelebaDataset, DTUDataset,
                         ThreeHundredWLPDataset)
from .async_producer import (AsyncProducerDataset, FaceImagesAsyncDataset,
                             FaceTexUVAsyncDataset)
from .custom import CustomDataset
from .wrappers import (ClassBalancedDataset, ConcatDataset,
                       MultiImageMixDataset, RepeatDataset)
from .samplers import (DistributedGroupSampler, DistributedSampler,
                       DistributedVideoSampler, GroupSampler)
from . import pipelines  # noqa: F401  (register transforms)

__all__ = [
    "DATASETS",
    "PIPELINES",
    "build_dataset",
    "build_dataloader",
    "SyntheticScanNetDataset",
    "make_fragment_sample",
]
