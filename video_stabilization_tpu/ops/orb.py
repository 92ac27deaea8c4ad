"""ORB detect + describe — multi-scale FAST + oriented BRIEF, fixed shapes.

TPU-native equivalent of cv::ORB with the reference's hyperparameters
(src/stabilizer.cpp:483-493): 2500-feature budget, scaleFactor 1.2, 12
levels, edgeThreshold 31, WTA_K 2, FAST_SCORE, patchSize 31, FAST
threshold 20.

Design:
- The 12-level scale pyramid has **static per-level shapes** (computed at
  trace time) and a static per-level feature budget proportional to level
  area, like cv::ORB's nfeatures-per-level split.
- FAST + 3x3 NMS + top-k per level are batched map operations (ops/fast.py).
- Orientation is the intensity-centroid angle over the circular 31-patch.
- Descriptors are **steered BRIEF**: 256 deterministic Gaussian test pairs
  (BRIEF's original construction — NOT OpenCV's learned bit pattern; the
  pattern only needs to be internally consistent since both lock frames are
  described by this same code), rotated by the keypoint angle, sampled with
  nearest-neighbor lookups from a 7x7-Gauss-blurred level image.  Bits are
  stored as +-1 int8 so Hamming distance becomes one bf16 matmul on the MXU
  (ops/match.py).
- Output is a fixed-capacity feature set with a validity mask; keypoint
  coordinates/sizes are mapped back to level-0 pixels (size = 31·1.2^level,
  used by the relative-size filter, src/stabilizer.cpp:290-309).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from video_stabilization_tpu.config import ORBConfig
from video_stabilization_tpu.ops.fast import fast_score
from video_stabilization_tpu.ops.image import resize_bilinear
from video_stabilization_tpu.ops.pyramid import _reflect101_pad

PATCH_RADIUS = 15          # patchSize 31
_EXTRACT_RADIUS = 24       # covers rotated BRIEF reach (15·√2 ≈ 21.2)
_EXTRACT = 2 * _EXTRACT_RADIUS + 1

# --- deterministic BRIEF test pattern (256 pairs, Gaussian σ = patch/5) -----
_rng = np.random.default_rng(20240816)
_P1 = np.clip(np.round(_rng.normal(0.0, PATCH_RADIUS / 2.0, (256, 2))), -15, 15)
_P2 = np.clip(np.round(_rng.normal(0.0, PATCH_RADIUS / 2.0, (256, 2))), -15, 15)
# Host (numpy) constants — see ops/pyramid.py note on device-array globals.
BRIEF_PATTERN_1 = np.asarray(_P1, np.float32)   # (256, 2) as (x, y)
BRIEF_PATTERN_2 = np.asarray(_P2, np.float32)

# circular mask for the intensity centroid (31x31)
_yy, _xx = np.mgrid[-PATCH_RADIUS : PATCH_RADIUS + 1, -PATCH_RADIUS : PATCH_RADIUS + 1]
_CIRC = (_yy ** 2 + _xx ** 2) <= PATCH_RADIUS ** 2
CENTROID_MASK = np.asarray(_CIRC, np.float32)
CENTROID_X = np.asarray(_xx * _CIRC, np.float32)
CENTROID_Y = np.asarray(_yy * _CIRC, np.float32)


def _fix_capacity(feats: "ORBFeatures", cap: int) -> "ORBFeatures":
    """Pad or top-k-truncate to exactly ``cap`` keypoint slots so the output
    shape is independent of how many pyramid levels fit the image (small
    frames break out of the level loop early)."""
    n = feats.points.shape[0]
    if n == cap:
        return feats
    if n < cap:
        pad = cap - n
        return ORBFeatures(
            points=jnp.pad(feats.points, ((0, pad), (0, 0))),
            angle=jnp.pad(feats.angle, (0, pad)),
            response=jnp.pad(feats.response, (0, pad)),
            size=jnp.pad(feats.size, (0, pad)),
            desc=jnp.pad(feats.desc, ((0, pad), (0, 0))),
            mask=jnp.pad(feats.mask, (0, pad)),
        )
    score = jnp.where(feats.mask, feats.response, -jnp.inf)
    _, idx = jax.lax.top_k(score, cap)
    return ORBFeatures(
        points=feats.points[idx],
        angle=feats.angle[idx],
        response=feats.response[idx],
        size=feats.size[idx],
        desc=feats.desc[idx],
        mask=feats.mask[idx],
    )


class ORBFeatures(NamedTuple):
    points: jax.Array     # (N, 2) float32, level-0 pixel coords (x, y)
    angle: jax.Array      # (N,) float32 radians
    response: jax.Array   # (N,) float32 FAST score
    size: jax.Array       # (N,) float32 keypoint diameter at level 0
    desc: jax.Array       # (N, 256) int8 in {-1, +1} (0 on masked lanes)
    mask: jax.Array       # (N,) bool


def _gauss7(img: jax.Array) -> jax.Array:
    """7-tap Gaussian (sigma 2), reflect-101 — cv::ORB blurs each level with
    GaussianBlur(7, 7, 2, 2) before sampling descriptors."""
    k = np.exp(-0.5 * (np.arange(-3, 4) / 2.0) ** 2).astype(np.float32)
    k = k / k.sum()  # host constant (see ops/pyramid.py note)
    x = _reflect101_pad(img, 3, axis=-2)
    rows = sum(k[i] * jax.lax.slice_in_dim(x, i, i + img.shape[-2], axis=-2)
               for i in range(7))
    x = _reflect101_pad(rows, 3, axis=-1)
    return sum(k[i] * jax.lax.slice_in_dim(x, i, i + img.shape[-1], axis=-1)
               for i in range(7))


def _nms3(score: jax.Array) -> jax.Array:
    neigh = jax.lax.reduce_window(score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return jnp.where((score >= neigh) & (score > 0), score, 0.0)


def _level_budgets(total: int, n_levels: int, scale: float) -> list[int]:
    r = 1.0 / (scale * scale)           # per-level area ratio
    weights = [r ** i for i in range(n_levels)]
    s = sum(weights)
    budgets = [max(16, int(round(total * w / s))) for w in weights]
    return budgets


def _detect_level(img: jax.Array, n_keep: int, fast_threshold: float,
                  edge: int):
    """FAST + NMS + top-k on one pyramid level.  Returns (pts, score, mask)
    in level coords."""
    score, _ = fast_score(img, fast_threshold)
    h, w = img.shape
    # zero out the edgeThreshold border (ORB needs full patches)
    valid_region = jnp.zeros((h, w), bool).at[edge:h - edge, edge:w - edge].set(
        True) if (h > 2 * edge and w > 2 * edge) else jnp.zeros((h, w), bool)
    score = jnp.where(valid_region, _nms3(score), 0.0)

    flat = score.reshape(-1)
    top, idx = jax.lax.top_k(flat, n_keep)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    mask = top > 0
    return jnp.stack([xs, ys], -1), top, mask


def _orient_and_describe(img_raw: jax.Array, img_blur: jax.Array,
                         pts: jax.Array, mask: jax.Array):
    """Intensity-centroid angles + steered BRIEF for keypoints on one level."""
    pad = _EXTRACT_RADIUS
    raw_p = jnp.pad(img_raw, pad, mode="edge")
    blur_p = jnp.pad(img_blur, pad, mode="edge")

    def one(pt):
        iy = pt[1].astype(jnp.int32)
        ix = pt[0].astype(jnp.int32)
        # orientation from the raw image (cv::ORB: IC_Angle on the level image)
        patch = jax.lax.dynamic_slice(
            raw_p, (iy + pad - PATCH_RADIUS, ix + pad - PATCH_RADIUS),
            (2 * PATCH_RADIUS + 1, 2 * PATCH_RADIUS + 1),
        )
        m10 = jnp.sum(patch * CENTROID_X)
        m01 = jnp.sum(patch * CENTROID_Y)
        angle = jnp.arctan2(m01, m10)

        # steered BRIEF from the blurred image
        bpatch = jax.lax.dynamic_slice(
            blur_p, (iy, ix), (_EXTRACT, _EXTRACT)
        )  # top-left at (iy+pad-pad): centered at keypoint with radius pad
        c, s = jnp.cos(angle), jnp.sin(angle)

        def sample(pattern):
            rx = jnp.round(c * pattern[:, 0] - s * pattern[:, 1]).astype(jnp.int32)
            ry = jnp.round(s * pattern[:, 0] + c * pattern[:, 1]).astype(jnp.int32)
            lin = (ry + _EXTRACT_RADIUS) * _EXTRACT + (rx + _EXTRACT_RADIUS)
            return bpatch.reshape(-1)[lin]

        v1 = sample(BRIEF_PATTERN_1)
        v2 = sample(BRIEF_PATTERN_2)
        bits = jnp.where(v1 < v2, jnp.int8(1), jnp.int8(-1))
        return angle, bits

    angles, descs = jax.vmap(one)(pts)
    descs = jnp.where(mask[:, None], descs, jnp.int8(0))
    return angles, descs


def orb_detect_and_compute(
    img: jax.Array, config: ORBConfig = ORBConfig()
) -> ORBFeatures:
    """Detect + describe on a (H, W) float32 grayscale image."""
    h, w = img.shape
    img = img.astype(jnp.float32)
    budgets = _level_budgets(config.max_features, config.n_levels,
                             config.scale_factor)

    all_pts, all_ang, all_resp, all_size, all_desc, all_mask = [], [], [], [], [], []
    level_img = img
    for level in range(config.n_levels):
        scale = config.scale_factor ** level
        lh, lw = level_img.shape
        if lh <= 2 * config.edge_threshold or lw <= 2 * config.edge_threshold:
            break
        pts, resp, mask = _detect_level(
            level_img, budgets[level], config.fast_threshold, config.edge_threshold
        )
        blur = _gauss7(level_img)
        ang, desc = _orient_and_describe(level_img, blur, pts, mask)

        all_pts.append(pts * scale)
        all_ang.append(ang)
        all_resp.append(resp)
        all_size.append(jnp.full((pts.shape[0],), config.patch_size * scale))
        all_desc.append(desc)
        all_mask.append(mask)

        nh = int(round(h / (config.scale_factor ** (level + 1))))
        nw = int(round(w / (config.scale_factor ** (level + 1))))
        level_img = resize_bilinear(img, nh, nw)

    feats = ORBFeatures(
        points=jnp.concatenate(all_pts, axis=0),
        angle=jnp.concatenate(all_ang),
        response=jnp.concatenate(all_resp),
        size=jnp.concatenate(all_size),
        desc=jnp.concatenate(all_desc, axis=0),
        mask=jnp.concatenate(all_mask),
    )
    feats = _fix_capacity(feats, config.max_features)
    # relative keypoint-size filter (reference: filterKeypointByRelativeSize,
    # src/stabilizer.cpp:290-309, max ratio 0.10 for ORB)
    keep = feats.size <= (h * config.max_keypoint_size_ratio)
    return feats._replace(mask=feats.mask & keep)
