"""FAN face-alignment: stacked-hourglass landmark network + decode utilities.

Capability parity with the vendored face_alignment package
(/root/reference/pnpmodules/face_alignment/face_alignment/api.py:51
FaceAlignment; utils.py:72 transform, :108 crop, :48 draw_gaussian,
:185 get_preds_fromhm).  The reference torch.jit.loads a pretrained 2D/3D-FAN
(Bulat & Tzimiropoulos, ICCV'17); here the architecture is native flax
(stacked hourglass over 64x64 heatmaps) so it runs jitted on TPU, and the
crop / heatmap-decode geometry runs host-side in numpy exactly like the
reference (it is dataset-prep code, not training-hot-path).

Face *detection* is out of scope (the reference delegates to a separate
sfd/blazeface detector); like the reference's ``detected_faces`` argument,
callers pass face bounding boxes.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["FAN", "FaceAlignment", "transform_point", "crop_face",
           "draw_gaussian", "get_preds_from_heatmaps"]


def _gn(x):
    groups = min(8, x.shape[-1])
    while x.shape[-1] % groups != 0:
        groups -= 1
    return nn.GroupNorm(num_groups=groups)(x)


class ConvBlock(nn.Module):
    """FAN residual block: 3 pre-activated convs over channel halves."""

    features: int

    @nn.compact
    def __call__(self, x):
        f = self.features
        out1 = nn.Conv(f // 2, (3, 3))(nn.relu(_gn(x)))
        out2 = nn.Conv(f // 4, (3, 3))(nn.relu(_gn(out1)))
        out3 = nn.Conv(f - f // 2 - f // 4, (3, 3))(nn.relu(_gn(out2)))
        out = jnp.concatenate([out1, out2, out3], axis=-1)
        if x.shape[-1] != f:
            x = nn.Conv(f, (1, 1))(nn.relu(_gn(x)))
        return out + x


class Hourglass(nn.Module):
    """Recursive hourglass: downsample, recurse, upsample, add skip."""

    depth: int = 3
    features: int = 128

    @nn.compact
    def __call__(self, x):
        up1 = ConvBlock(self.features)(x)
        low = nn.avg_pool(x, (2, 2), strides=(2, 2))
        low = ConvBlock(self.features)(low)
        if self.depth > 1:
            low = Hourglass(depth=self.depth - 1, features=self.features)(low)
        else:
            low = ConvBlock(self.features)(low)
        low = ConvBlock(self.features)(low)
        up2 = jax.image.resize(low, up1.shape, "nearest")
        return up1 + up2


class FAN(nn.Module):
    """(B, 256, 256, 3) in [0,1] -> (B, n_modules, 64, 64, n_landmarks)
    heatmaps (last module's map is the prediction)."""

    n_modules: int = 2
    n_landmarks: int = 68
    features: int = 128
    hg_depth: int = 3

    @nn.compact
    def __call__(self, x):
        f = self.features
        x = nn.Conv(f // 2, (7, 7), strides=(2, 2))(x)  # 128
        x = nn.relu(_gn(x))
        x = ConvBlock(f)(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))  # 64
        x = ConvBlock(f)(x)
        x = ConvBlock(f)(x)

        outputs = []
        prev = x
        for i in range(self.n_modules):
            hg = Hourglass(depth=self.hg_depth, features=f)(prev)
            hg = ConvBlock(f)(hg)
            hg = nn.relu(_gn(nn.Conv(f, (1, 1))(hg)))
            heat = nn.Conv(self.n_landmarks, (1, 1))(hg)
            outputs.append(heat)
            if i < self.n_modules - 1:
                prev = prev + nn.Conv(f, (1, 1))(hg) + \
                    nn.Conv(f, (1, 1))(heat)
        return jnp.stack(outputs, axis=1)


# ---------------------------------------------------------------- host-side
def transform_point(point, center, scale, resolution: float,
                    invert: bool = False) -> np.ndarray:
    """Map a point between original-image space and the crop's
    ``resolution`` x ``resolution`` space (utils.py:72)."""
    pt = np.array([point[0], point[1], 1.0])
    h = 200.0 * scale
    t = np.eye(3)
    t[0, 0] = resolution / h
    t[1, 1] = resolution / h
    t[0, 2] = resolution * (-center[0] / h + 0.5)
    t[1, 2] = resolution * (-center[1] / h + 0.5)
    if invert:
        t = np.linalg.inv(t)
    return (t @ pt)[:2]


def crop_face(image: np.ndarray, center, scale,
              resolution: int = 256) -> np.ndarray:
    """Crop + resize the face region to resolution^2 (utils.py:108)."""
    import cv2

    ul = transform_point([1, 1], center, scale, resolution, invert=True)
    br = transform_point([resolution, resolution], center, scale, resolution,
                         invert=True)
    ul = ul.astype(int)
    br = br.astype(int)
    ht, wd = image.shape[:2]
    ch = br[1] - ul[1]
    cw = br[0] - ul[0]
    new = np.zeros((ch, cw) + image.shape[2:], image.dtype)
    sy0, sy1 = max(0, ul[1]), min(ht, br[1])
    sx0, sx1 = max(0, ul[0]), min(wd, br[0])
    dy0, dx0 = max(0, -ul[1]), max(0, -ul[0])
    new[dy0:dy0 + (sy1 - sy0), dx0:dx0 + (sx1 - sx0)] = image[sy0:sy1, sx0:sx1]
    return cv2.resize(new, (resolution, resolution),
                      interpolation=cv2.INTER_LINEAR)


def draw_gaussian(image: np.ndarray, point, sigma: float = 1.0) -> np.ndarray:
    """Render a gaussian blob at ``point`` into heatmap ``image``
    (utils.py:48) — used to build training targets."""
    size = int(6 * sigma + 1)
    g1 = np.arange(size) - (size - 1) / 2
    gx, gy = np.meshgrid(g1, g1)
    g = np.exp(-(gx ** 2 + gy ** 2) / (2 * sigma ** 2))
    ul = [int(point[0] - 3 * sigma), int(point[1] - 3 * sigma)]
    br = [ul[0] + size, ul[1] + size]
    H, W = image.shape
    gx0, gy0 = max(0, -ul[0]), max(0, -ul[1])
    gx1 = size - max(0, br[0] - W)
    gy1 = size - max(0, br[1] - H)
    ix0, iy0 = max(0, ul[0]), max(0, ul[1])
    ix1, iy1 = min(W, br[0]), min(H, br[1])
    if ix1 <= ix0 or iy1 <= iy0:
        return image
    image[iy0:iy1, ix0:ix1] = np.maximum(image[iy0:iy1, ix0:ix1],
                                         g[gy0:gy1, gx0:gx1])
    return image


def get_preds_from_heatmaps(hm: np.ndarray, centers=None, scales=None):
    """Heatmaps (B, H, W, L) -> landmark coords with +-0.25px sub-pixel
    refinement; optionally mapped back to original-image space
    (utils.py:185 get_preds_fromhm). Returns (coords_in_hm, coords_orig)."""
    hm = np.asarray(hm)
    B, H, W, L = hm.shape
    flat = hm.transpose(0, 3, 1, 2).reshape(B, L, -1)
    idx = flat.argmax(axis=-1)
    xs = (idx % W).astype(np.float64)
    ys = (idx // W).astype(np.float64)
    # sub-pixel: shift 0.25 toward the larger neighbor
    for b in range(B):
        for l in range(L):
            x, y = int(xs[b, l]), int(ys[b, l])
            m = hm[b, :, :, l]
            if 0 < x < W - 1:
                xs[b, l] += 0.25 * np.sign(m[y, x + 1] - m[y, x - 1])
            if 0 < y < H - 1:
                ys[b, l] += 0.25 * np.sign(m[y + 1, x] - m[y - 1, x])
    preds = np.stack([xs, ys], axis=-1) + 0.5  # (B, L, 2), 0.5 center offset
    if centers is None:
        return preds, preds.copy()
    orig = np.zeros_like(preds)
    for b in range(B):
        for l in range(L):
            orig[b, l] = transform_point(preds[b, l], centers[b], scales[b],
                                         H, invert=True)
    return preds, orig


class FaceAlignment:
    """Landmark estimation API over a (trainable or imported) FAN.

    Unlike the reference, face boxes must be provided (``detected_faces``) —
    detection was a separate pretrained network there too."""

    def __init__(self, n_modules: int = 2, n_landmarks: int = 68,
                 params=None, seed: int = 0, resolution: int = 256):
        self.net = FAN(n_modules=n_modules, n_landmarks=n_landmarks)
        self.resolution = resolution
        if params is None:
            params = self.net.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, resolution, resolution, 3)))
        self.params = params
        self._apply = jax.jit(self.net.apply)

    def get_landmarks_from_image(self, image: np.ndarray,
                                 detected_faces: Sequence[Sequence[float]],
                                 ) -> List[np.ndarray]:
        """image (H, W, 3) uint8/float; detected_faces: [x1, y1, x2, y2]
        boxes. Returns a (68, 2) landmark array per face in image space."""
        image = np.asarray(image)
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        crops, centers, scales = [], [], []
        for (x1, y1, x2, y2) in detected_faces:
            center = np.array([(x1 + x2) / 2.0,
                               (y1 + y2) / 2.0 - (y2 - y1) * 0.12])
            scale = (x2 - x1 + y2 - y1) / 195.0
            crops.append(crop_face(image, center, scale, self.resolution))
            centers.append(center)
            scales.append(scale)
        batch = jnp.asarray(np.stack(crops), jnp.float32)
        hms = self._apply(self.params, batch)[:, -1]  # last module
        _, orig = get_preds_from_heatmaps(np.asarray(hms), centers, scales)
        return [orig[i] for i in range(len(detected_faces))]
