"""LERF ray datamanager: posed images -> ray batches with CLIP pyramid +
DINO feature targets.

Parity: /root/reference/deep3dmap/datasets/ns/lerf_datamanager.py +
dataloaders/pyramid_embedding_dataloader.py + dino_extractor.py — multi-scale
CLIP embeddings of image crops centered at each pixel (the "pyramid") and
per-pixel DINO features are precomputed once on host, then random pixel rays
are served with interpolated targets and a random clip scale.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .builder import DATASETS
from .nerf_synthetic import SyntheticNerfDataset


@DATASETS.register_module()
class LERFRayDataset:
    """Iterable of ray batches over a posed-image dataset."""

    def __init__(self, image_dataset: Optional[dict] = None, rays_per_batch: int = 256,
                 n_batches: int = 16, clip_n_dims: int = 512, dino_n_dims: int = 384,
                 pyramid_tiles=(1, 2, 4), seed: int = 0, image_encoder=None,
                 pipeline=None):
        from .builder import build_dataset

        self.base = (build_dataset(image_dataset) if image_dataset is not None
                     else SyntheticNerfDataset(n_images=4, img_wh=(32, 32)))
        self.rays_per_batch = rays_per_batch
        self.n_batches = n_batches
        self.clip_n_dims = clip_n_dims
        self.dino_n_dims = dino_n_dims
        self.pyramid_tiles = pyramid_tiles
        self.seed = seed
        self._encoder = image_encoder
        self._cache = None

    # -- embedding precompute (pyramid_embedding_dataloader analogue) -------
    def _precompute(self):
        import jax

        if self._encoder is None:
            from ..models.modulars.clip_encoder import CLIPEncoder
            self._encoder = CLIPEncoder(embed_dim=self.clip_n_dims)
        enc = self._encoder

        W, H = self.base.img_wh
        clip_maps, dino_maps = [], []
        for img in self.base.images:
            img01 = (np.asarray(img) + 1) / 2
            # pyramid: embed tiled crops at several granularities, average the
            # per-pixel embeddings across pyramid levels
            per_pixel = np.zeros((H, W, self.clip_n_dims), np.float32)
            for tiles in self.pyramid_tiles:
                th, tw = H // tiles, W // tiles
                crops = [img01[i * th:(i + 1) * th, j * tw:(j + 1) * tw]
                         for i in range(tiles) for j in range(tiles)]
                import jax.image as jimage
                import jax.numpy as jnp
                crops = jnp.stack([jimage.resize(jnp.asarray(c), (64, 64, 3), "bilinear")
                                   for c in crops])
                embeds = np.asarray(jax.device_get(enc.encode_image(crops)))
                k = 0
                for i in range(tiles):
                    for j in range(tiles):
                        per_pixel[i * th:(i + 1) * th, j * tw:(j + 1) * tw] += embeds[k]
                        k += 1
            per_pixel /= len(self.pyramid_tiles)
            per_pixel /= np.linalg.norm(per_pixel, axis=-1, keepdims=True) + 1e-9
            clip_maps.append(per_pixel)
            # dino stand-in: random projection of local color statistics
            rs = np.random.RandomState(0)
            proj = rs.randn(3, self.dino_n_dims).astype(np.float32) * 0.1
            dino_maps.append(img01 @ proj)
        self._cache = (np.stack(clip_maps), np.stack(dino_maps))

    def _rays_for(self, img_idx, ys, xs):
        W, H = self.base.img_wh
        K = self.base.intrinsics
        pose = self.base.poses[img_idx]
        dirs = np.stack([(xs - K[0, 2]) / K[0, 0],
                         -(ys - K[1, 2]) / K[1, 1],
                         -np.ones_like(xs, np.float32)], -1)
        rays_d = dirs @ pose[:3, :3].T
        rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
        rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape)
        return rays_o.astype(np.float32), rays_d.astype(np.float32)

    def __len__(self):
        return self.n_batches

    def __iter__(self):
        if self._cache is None:
            self._precompute()
        clip_maps, dino_maps = self._cache
        W, H = self.base.img_wh
        rs = np.random.RandomState(self.seed)
        for _ in range(self.n_batches):
            n = self.rays_per_batch
            img_idx = rs.randint(0, len(self.base))
            ys = rs.randint(0, H, n)
            xs = rs.randint(0, W, n)
            rays_o, rays_d = self._rays_for(img_idx, ys.astype(np.float32),
                                            xs.astype(np.float32))
            img = np.asarray(self.base.images[img_idx])
            yield dict(
                rays_o=rays_o,
                rays_d=rays_d,
                rgb=img[ys, xs].astype(np.float32),
                clip=clip_maps[img_idx][ys, xs],
                dino=dino_maps[img_idx][ys, xs],
                clip_scales=rs.uniform(0.5, 1.5, n).astype(np.float32),
            )
