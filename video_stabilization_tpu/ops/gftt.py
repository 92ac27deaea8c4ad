"""Shi-Tomasi corner detection (goodFeaturesToTrack) — fixed-shape TPU design.

Reference: cv::goodFeaturesToTrack with maxCorners=1300, quality=0.01,
minDistance=10*(rows/720), blockSize=3, gradientSize=3, Harris off
(src/stabilizer.cpp:933-945).

OpenCV's pipeline is: min-eigenvalue response -> quality threshold (relative
to global max) -> 3x3 NMS -> sort by response -> greedy radius suppression.
The greedy pass is inherently sequential; the TPU-native equivalent used here
is **cell-based suppression**: partition the image into minDistance-sized
cells, keep the best NMS survivor per cell (one reshape + argmax — fully
parallel), then take the global top-k cell winners.  Two winners of adjacent
cells can be closer than minDistance (unlike OpenCV's greedy), but spacing is
enforced at cell granularity, which is what motion estimation actually needs
from the detector: well-spread, strong corners.  Fidelity tests compare the
*set* of corners against OpenCV's (coverage overlap), not index-by-index.

Everything is static-shaped: returns exactly ``max_corners`` (x, y) slots
with a validity mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from video_stabilization_tpu.config import GFTTConfig
from video_stabilization_tpu.ops.gradients import box_sum, sobel_xy


class Corners(NamedTuple):
    points: jax.Array    # (max_corners, 2) float32 (x, y) pixel coords
    response: jax.Array  # (max_corners,) float32 min-eigenvalue response
    mask: jax.Array      # (max_corners,) bool validity


def min_eig_response(img: jax.Array, block_size: int = 3) -> jax.Array:
    """Per-pixel smaller eigenvalue of the structure tensor.

    Matches cv2.cornerMinEigenVal up to a constant positive scale (OpenCV
    normalizes Sobel by 1/(2^(ap-1)·blockSize·255) for uint8 input; a global
    scale does not affect relative-quality thresholding or ranking).
    """
    ix, iy = sobel_xy(img)
    a = box_sum(ix * ix, block_size)
    b = box_sum(ix * iy, block_size)
    c = box_sum(iy * iy, block_size)
    # λmin = (a+c)/2 − sqrt(((a−c)/2)² + b²)
    half_tr = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.square(0.5 * (a - c)) + jnp.square(b))
    return half_tr - disc


def _nms3(resp: jax.Array) -> jax.Array:
    """Keep strict 3x3 local maxima (ties keep all, like cv2 dilate-compare)."""
    neigh = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(resp >= neigh, resp, -jnp.inf)


def good_features_to_track(
    img: jax.Array,
    config: GFTTConfig = GFTTConfig(),
    min_distance: float | None = None,
) -> Corners:
    """Detect up to ``config.max_features`` corners on a (H, W) float image.

    ``min_distance`` defaults to the reference's resolution-scaled rule
    10 * (H / 720) (src/stabilizer.cpp:938-940).
    """
    h, w = img.shape[-2], img.shape[-1]
    if min_distance is None:
        min_distance = config.min_distance_at_720 * (h / 720.0)
    cell = max(int(min_distance), 1)

    resp = min_eig_response(img, config.block_size)
    max_resp = jnp.max(resp)
    thresh = config.quality_level * max_resp
    resp = jnp.where(resp >= thresh, resp, -jnp.inf)
    resp = _nms3(resp)

    # --- cell-based suppression ---------------------------------------------
    gh = -(-h // cell)
    gw = -(-w // cell)
    pad_h = gh * cell - h
    pad_w = gw * cell - w
    rp = jnp.pad(resp, ((0, pad_h), (0, pad_w)), constant_values=-jnp.inf)
    cells = rp.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3).reshape(gh, gw, cell * cell)
    best_in_cell = jnp.argmax(cells, axis=-1)               # (gh, gw)
    best_resp = jnp.take_along_axis(cells, best_in_cell[..., None], axis=-1)[..., 0]

    cy = jnp.arange(gh)[:, None] * cell + best_in_cell // cell
    cx = jnp.arange(gw)[None, :] * cell + best_in_cell % cell

    flat_resp = best_resp.reshape(-1)
    flat_x = cx.reshape(-1).astype(jnp.float32)
    flat_y = cy.reshape(-1).astype(jnp.float32)

    k = config.max_features
    n_cells = flat_resp.shape[0]
    if n_cells < k:
        flat_resp = jnp.pad(flat_resp, (0, k - n_cells), constant_values=-jnp.inf)
        flat_x = jnp.pad(flat_x, (0, k - n_cells))
        flat_y = jnp.pad(flat_y, (0, k - n_cells))

    top_resp, top_idx = jax.lax.top_k(flat_resp, k)
    points = jnp.stack([flat_x[top_idx], flat_y[top_idx]], axis=-1)
    mask = jnp.isfinite(top_resp)
    points = jnp.where(mask[:, None], points, 0.0)
    return Corners(points=points, response=jnp.where(mask, top_resp, 0.0), mask=mask)
