"""LERF ray datamanager: posed images -> ray batches with CLIP pyramid +
DINO feature targets.

Parity: /root/reference/deep3dmap/datasets/ns/lerf_datamanager.py +
dataloaders/{pyramid,patch}_embedding_dataloader.py + dino_dataloader.py:

* **CLIP pyramid** — per tile scale, OVERLAPPING square crops (kernel =
  tile_ratio·H, stride = stride_ratio·kernel, padding = kernel//2) are CLIP-
  embedded and normalized into a crop-center grid; a pixel query bilinearly
  interpolates the four neighboring crop embeddings
  (patch_embedding_dataloader.py:76-101), and the scale axis is sampled as a
  random bin + lerp between adjacent tile scales, returning the normalized
  scale (pyramid_embedding_dataloader.py:88-108 _random_scales).
* **DINO** — per-pixel descriptors from a real DINO ViT (modulars/
  dino_vit.DinoViT — dino_vits8 architecture, layer-11 'key' facet, heads
  concatenated), queried nearest-neighbor at patch-grid-scaled coordinates
  (dino_dataloader.py:45-52).  Supply ``dino_npz`` (tools/import_weights.py
  dino) for pretrained features; without it the same architecture runs with
  deterministic random init (labelled ``pretrained=False``) — fine for
  synthetic pipeline tests, not for real LERF runs.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .builder import DATASETS
from .nerf_synthetic import SyntheticNerfDataset


def _embed_crops(encoder, crops01: np.ndarray) -> np.ndarray:
    """[0,1] crops (N, k, k, 3) -> L2-normalized embeddings (N, D).

    Handles both the compact CLIPEncoder (any-size CNN tower, 64px default)
    and the full CLIPViT (fixed image_size + CLIP normalization) — including
    a CLIPEncoder transparently upgraded with imported ViT weights."""
    import jax
    import jax.image as jimage
    import jax.numpy as jnp

    vit = encoder if hasattr(encoder, "visual") else getattr(encoder, "_vit", None)
    res = vit.visual.image_size if vit is not None else 64
    x = jnp.asarray(crops01, jnp.float32)
    if x.shape[1] != res or x.shape[2] != res:
        x = jax.vmap(lambda c: jimage.resize(c, (res, res, 3), "bilinear"))(x)
    if vit is not None:
        x = vit.preprocess(np.asarray(x))
    e = np.asarray(jax.device_get(encoder.encode_image(x)))
    return e / (np.linalg.norm(e, axis=-1, keepdims=True) + 1e-9)


class PatchEmbeddingGrid:
    """One tile scale: overlapping-crop embedding grid + bilinear query.

    Mirrors PatchEmbeddingDataloader: crop centers at
    (k-1)/2 - pad + stride*i, grids padded with an edge-duplicate row/col so
    the top bilinear neighbor always exists.
    """

    def __init__(self, images01: Sequence[np.ndarray], encoder,
                 tile_ratio: float, stride_ratio: float):
        H, W = images01[0].shape[:2]
        self.k = max(int(H * tile_ratio), 2)
        self.stride = max(int(self.k * stride_ratio), 1)
        pad = self.k // 2
        self.pad = pad

        def centers(size):
            n = int(np.floor((size + 2 * pad - (self.k - 1) - 1)
                             / self.stride + 1))
            return (self.k - 1) / 2 - pad + self.stride * np.arange(n)

        self.center_r = centers(H)   # row-axis crop centers
        self.center_c = centers(W)
        grids = []
        for img in images01:
            p = np.pad(np.asarray(img, np.float32),
                       ((pad, pad), (pad, pad), (0, 0)))
            crops = []
            for r0 in range(0, H + 2 * pad - self.k + 1, self.stride):
                for c0 in range(0, W + 2 * pad - self.k + 1, self.stride):
                    crops.append(p[r0:r0 + self.k, c0:c0 + self.k])
            e = _embed_crops(encoder, np.stack(crops))
            g = e.reshape(len(self.center_r), len(self.center_c), -1)
            g = np.concatenate([g, g[:, -1:]], axis=1)
            g = np.concatenate([g, g[-1:]], axis=0)
            grids.append(g)
        self.data = np.stack(grids)  # (n_img, R+1, C+1, D)

    def query(self, img_idx: np.ndarray, rows: np.ndarray,
              cols: np.ndarray) -> np.ndarray:
        r_ind = np.clip(np.searchsorted(self.center_r, rows, side="left") - 1,
                        0, len(self.center_r) - 1)
        c_ind = np.clip(np.searchsorted(self.center_c, cols, side="left") - 1,
                        0, len(self.center_c) - 1)
        tl = self.data[img_idx, r_ind, c_ind]
        tr = self.data[img_idx, r_ind, c_ind + 1]
        bl = self.data[img_idx, r_ind + 1, c_ind]
        br = self.data[img_idx, r_ind + 1, c_ind + 1]
        wc = ((cols - self.center_c[c_ind]) / self.stride)[:, None]
        wr = ((rows - self.center_r[r_ind]) / self.stride)[:, None]
        top = tl + (tr - tl) * wc
        bot = bl + (br - bl) * wc
        return top + (bot - top) * wr


class PyramidEmbeddings:
    """Multi-scale pyramid of PatchEmbeddingGrids with random-scale sampling."""

    def __init__(self, images01, encoder, tile_size_range=(0.15, 0.6),
                 tile_size_res: int = 3, stride_scaler: float = 0.5):
        self.tile_sizes = np.linspace(tile_size_range[0], tile_size_range[1],
                                      tile_size_res)
        self.levels: List[PatchEmbeddingGrid] = []
        for tr in self.tile_sizes:
            # reference's _stride_scaler: interp(tile_ratio, [.05,.15],
            # [1.0, stride_scaler])
            ss = float(np.interp(tr, [0.05, 0.15], [1.0, stride_scaler]))
            self.levels.append(
                PatchEmbeddingGrid(images01, encoder, tr, ss))

    def sample_random_scales(self, rs: np.random.RandomState, img_idx,
                             rows, cols):
        """(embeddings (B, D), scales (B,)) — random bin + lerp, matching
        pyramid_embedding_dataloader._random_scales."""
        n = len(rows)
        nbin = len(self.tile_sizes) - 1
        sbin = rs.randint(0, max(nbin, 1), n)
        w = rs.rand(n).astype(np.float32)
        step = ((self.tile_sizes[1] - self.tile_sizes[0])
                / (self.tile_sizes[-1] - self.tile_sizes[0])) if nbin else 1.0
        bottom = np.zeros((n, self.levels[0].data.shape[-1]), np.float32)
        top = np.zeros_like(bottom)
        for i in range(max(nbin, 1)):
            m = sbin == i
            if not m.any():
                continue
            bottom[m] = self.levels[i].query(img_idx[m], rows[m], cols[m])
            top[m] = self.levels[min(i + 1, len(self.levels) - 1)].query(
                img_idx[m], rows[m], cols[m])
        emb = bottom + (top - bottom) * w[:, None]
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-9
        scales = (sbin * step + w * step).astype(np.float32)
        return emb, scales


@DATASETS.register_module()
class LERFRayDataset:
    """Iterable of ray batches over a posed-image dataset."""

    def __init__(self, image_dataset: Optional[dict] = None, rays_per_batch: int = 256,
                 n_batches: int = 16, clip_n_dims: int = 512, dino_n_dims: int = 384,
                 tile_size_range=(0.15, 0.6), tile_size_res: int = 3,
                 stride_scaler: float = 0.5, seed: int = 0, image_encoder=None,
                 clip_npz: Optional[str] = None, dino_npz: Optional[str] = None,
                 dino_layer: int = 11, dino_facet: str = "key", pipeline=None):
        from .builder import build_dataset

        self.base = (build_dataset(image_dataset) if image_dataset is not None
                     else SyntheticNerfDataset(n_images=4, img_wh=(32, 32)))
        self.rays_per_batch = rays_per_batch
        self.n_batches = n_batches
        self.clip_n_dims = clip_n_dims
        self.dino_n_dims = dino_n_dims
        self.tile_size_range = tuple(tile_size_range)
        self.tile_size_res = tile_size_res
        self.stride_scaler = stride_scaler
        self.seed = seed
        self._encoder = image_encoder
        self._clip_npz = clip_npz
        self._dino_npz = dino_npz
        self._dino_layer = dino_layer
        self._dino_facet = dino_facet
        self._pyramid: Optional[PyramidEmbeddings] = None
        self._dino_maps = None

    def _build_encoder(self):
        if self._encoder is not None:
            return self._encoder
        if self._clip_npz:
            from ..models.modulars.clip_vit import CLIPViT
            self._encoder = CLIPViT.from_npz(self._clip_npz)
        else:
            from ..models.modulars.clip_encoder import CLIPEncoder
            self._encoder = CLIPEncoder(embed_dim=self.clip_n_dims)
        return self._encoder

    # -- embedding precompute (pyramid + dino dataloader analogue) ----------
    def _precompute(self):
        from ..models.modulars.dino_vit import DinoExtractor

        imgs01 = [np.clip((np.asarray(im) + 1) / 2, 0, 1)
                  for im in self.base.images]
        enc = self._build_encoder()
        self._pyramid = PyramidEmbeddings(
            imgs01, enc, self.tile_size_range, self.tile_size_res,
            self.stride_scaler)

        if self._dino_npz:
            dino = DinoExtractor.from_npz(self._dino_npz,
                                          layer=self._dino_layer,
                                          facet=self._dino_facet)
        else:
            dino = DinoExtractor(cfg=dict(dim=self.dino_n_dims,
                                          heads=max(self.dino_n_dims // 64, 1)),
                                 layer=self._dino_layer,
                                 facet=self._dino_facet)
        self.dino_pretrained = dino.pretrained
        self._dino_maps = dino.extract(np.stack(imgs01))  # (n, h, w, D)

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
        if self._pyramid is None:
            self._precompute()
        W, H = self.base.img_wh
        dh, dw = self._dino_maps.shape[1:3]
        rs = np.random.RandomState(self.seed)
        for _ in range(self.n_batches):
            n = self.rays_per_batch
            img_idx = rs.randint(0, len(self.base))
            ys = rs.randint(0, H, n)
            xs = rs.randint(0, W, n)
            rays_o, rays_d = self._rays_for(img_idx, ys.astype(np.float32),
                                            xs.astype(np.float32))
            img = np.asarray(self.base.images[img_idx])
            ii = np.full(n, img_idx)
            clip_emb, clip_scales = self._pyramid.sample_random_scales(
                rs, ii, ys.astype(np.float32), xs.astype(np.float32))
            # dino: nearest patch-grid texel (dino_dataloader.py:45-52)
            dr = np.minimum((ys * dh / H).astype(np.int64), dh - 1)
            dc = np.minimum((xs * dw / W).astype(np.int64), dw - 1)
            yield dict(
                rays_o=rays_o,
                rays_d=rays_d,
                rgb=img[ys, xs].astype(np.float32),
                clip=clip_emb,
                dino=self._dino_maps[img_idx][dr, dc],
                clip_scales=clip_scales,
            )
