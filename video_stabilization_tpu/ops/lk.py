"""Pyramidal Lucas-Kanade sparse optical flow — batched, fixed-shape.

Equivalent of ``cv::calcOpticalFlowPyrLK`` with the reference's parameters:
window 21x21, pyramid maxLevel 3, up to 50 iterations, eps 0.01,
minEigThreshold 1e-4 (reference: src/stabilizer.cpp:185-195).

TPU-native design decisions:

- **All points advance together.**  OpenCV iterates each point until its own
  convergence; here a fixed-bound ``fori_loop`` updates all points each
  iteration with a per-point freeze mask once |δ| < eps — identical math,
  static shapes, one fused program for the whole point set.
- **Patch extraction is a vmapped dynamic slice** of (W+1)x(W+1) around each
  point plus a 4-tap bilinear blend, not a general gather: XLA lowers this to
  efficient dynamic-slice loads per point.
- **Spatial gradients use Scharr/32** on the template patch, computed once
  per level (OpenCV does the same: the structure tensor G is built from the
  first image only and reused across iterations).
- The per-level flow propagation g <- 2(g + v) follows Bouguet's classic
  pyramidal formulation (also OpenCV's).

Returns new point locations, per-point tracking status and mean-abs-residual
error; failed lanes keep their input location (caller filters by status, as
the reference does at src/stabilizer.cpp:203-208).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from video_stabilization_tpu.config import LKConfig


class LKResult(NamedTuple):
    points: jax.Array   # (N, 2) float32 tracked locations in image coords
    status: jax.Array   # (N,) bool — tracked successfully
    error: jax.Array    # (N,) float32 mean |residual| over the window


def _extract_patch(img: jax.Array, top_left: jax.Array, size: int) -> jax.Array:
    """Bilinear (size x size) patch with float top-left corner.

    Slices (size+1)x(size+1) at floor(top_left) and blends the 4 integer
    shifts.  jax.lax.dynamic_slice clamps out-of-range starts; bounds
    validity is checked by the caller.
    """
    tl = jnp.asarray(top_left)
    i0 = jnp.floor(tl)
    fx, fy = tl[0] - i0[0], tl[1] - i0[1]
    big = jax.lax.dynamic_slice(
        img,
        (i0[1].astype(jnp.int32), i0[0].astype(jnp.int32)),
        (size + 1, size + 1),
    )
    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy
    return (
        w00 * big[:-1, :-1]
        + w01 * big[:-1, 1:]
        + w10 * big[1:, :-1]
        + w11 * big[1:, 1:]
    )


def _scharr_patch(p: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Scharr/32 gradients on the interior of a (w+2)x(w+2) patch -> (w, w)."""
    kx = jnp.array([3.0, 10.0, 3.0]) / 32.0
    # d/dx: smooth rows with [3,10,3]/32, central difference along columns.
    sm_rows = kx[0] * p[:-2, :] + kx[1] * p[1:-1, :] + kx[2] * p[2:, :]
    ix = sm_rows[:, 2:] - sm_rows[:, :-2]
    sm_cols = kx[0] * p[:, :-2] + kx[1] * p[:, 1:-1] + kx[2] * p[:, 2:]
    iy = sm_cols[2:, :] - sm_cols[:-2, :]
    return ix, iy


def lk_track(
    pyr_prev: Sequence[jax.Array],
    pyr_next: Sequence[jax.Array],
    points: jax.Array,
    mask: jax.Array,
    config: LKConfig = LKConfig(),
) -> LKResult:
    """Track ``points`` ((N,2), level-0 coords) from pyr_prev to pyr_next."""
    win = config.window_size
    half = (win - 1) / 2.0
    n_levels = len(pyr_prev) - 1
    eps2 = config.epsilon * config.epsilon

    # Pad every level with reflected borders so integration windows may
    # overhang the image, exactly like cv::buildOpticalFlowPyramid's
    # winSize BORDER_REFLECT_101 padding.  Without this, points within
    # half a window of the border lose their coarse-level flow estimate
    # and large motions fail near the edges.
    pad = int(half) + 2
    pyr_prev = [jnp.pad(p, pad, mode="reflect") for p in pyr_prev]
    pyr_next = [jnp.pad(p, pad, mode="reflect") for p in pyr_next]

    def track_one(pt: jax.Array, valid: jax.Array):
        g = jnp.zeros(2, jnp.float32)
        status = valid
        err = jnp.zeros((), jnp.float32)

        for level in range(n_levels, -1, -1):
            img_i = pyr_prev[level]
            img_j = pyr_next[level]
            h_l, w_l = img_i.shape[0] - 2 * pad, img_i.shape[1] - 2 * pad
            p_l = pt / (2.0 ** level)

            # Template patch (win+2 for gradients) and structure tensor.
            tl_grad = p_l - (half + 1.0) + pad
            ipatch_big = _extract_patch(img_i, tl_grad, win + 2)
            ix, iy = _scharr_patch(ipatch_big)
            ipatch = ipatch_big[1:-1, 1:-1]

            gxx = jnp.sum(ix * ix)
            gxy = jnp.sum(ix * iy)
            gyy = jnp.sum(iy * iy)
            det = gxx * gyy - gxy * gxy
            min_eig = 0.5 * (gxx + gyy) - jnp.sqrt(
                jnp.square(0.5 * (gxx - gyy)) + gxy * gxy
            )
            min_eig = min_eig / (win * win)
            good_tensor = (min_eig > config.min_eig_threshold) & (det > 1e-12)
            det_safe = jnp.where(good_tensor, det, 1.0)
            ginv = (
                jnp.array([[gyy, -gxy], [-gxy, gxx]]) / det_safe
            )

            # The point itself must lie inside the level image (the padded
            # window may overhang); matches OpenCV's per-level point check.
            in_bounds_i = (
                (p_l[0] >= 0.0)
                & (p_l[1] >= 0.0)
                & (p_l[0] <= w_l - 1.0)
                & (p_l[1] <= h_l - 1.0)
            )
            level_ok = status & good_tensor & in_bounds_i

            def body(_, carry):
                v, done, err_prev = carry
                tl_j = p_l + g + v - half + pad
                jpatch = _extract_patch(img_j, tl_j, win)
                r = jpatch - ipatch
                bx = jnp.sum(r * ix)
                by = jnp.sum(r * iy)
                delta = -(ginv @ jnp.stack([bx, by]))
                step = jnp.where(done | ~level_ok, jnp.zeros(2), delta)
                v_new = v + step
                small = jnp.sum(delta * delta) < eps2
                err_new = jnp.mean(jnp.abs(r))
                return v_new, done | small, jnp.where(done, err_prev, err_new)

            v0 = jnp.zeros(2, jnp.float32)
            v, _, err = jax.lax.fori_loop(
                0, config.max_iters, body, (v0, ~level_ok, err)
            )
            status = level_ok if level == 0 else status
            # Propagate to the next finer level (x2), or finish.
            if level > 0:
                g = 2.0 * (g + v)
            else:
                g = g + v

        new_pt = pt + g
        h0, w0 = pyr_prev[0].shape
        in_final = (
            (new_pt[0] >= 0.0)
            & (new_pt[1] >= 0.0)
            & (new_pt[0] < w0)
            & (new_pt[1] < h0)
        )
        status = status & in_final
        return jnp.where(status, new_pt, pt), status, err

    pts, status, err = jax.vmap(track_one)(
        points.astype(jnp.float32), mask.astype(bool)
    )
    return LKResult(points=pts, status=status, error=err)
