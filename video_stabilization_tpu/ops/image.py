"""Basic image transforms: color conversion and resampling.

Matches OpenCV conventions (reference uses cv::cvtColor at
src/stabilizer.cpp:1174-1175 and cv::resize INTER_LINEAR/INTER_NEAREST at
:1170-1171 and :449-451):

- BGR->gray uses the ITU-R BT.601 weights Y = 0.299R + 0.587G + 0.114B.
- resize samples source coords at (dst + 0.5) * scale - 0.5 (pixel-center
  alignment), clamped to the border — identical to cv2.resize for
  INTER_LINEAR; INTER_NEAREST uses floor(dst * scale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bgr_to_gray(img: jax.Array) -> jax.Array:
    """(..., H, W, 3) BGR (any float/uint dtype) -> (..., H, W) float32 gray."""
    img = img.astype(jnp.float32)
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    return 0.114 * b + 0.587 * g + 0.299 * r


def _linear_weights(dst_size: int, src_size: int):
    scale = src_size / dst_size
    x = (jnp.arange(dst_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    x0 = jnp.floor(x)
    frac = x - x0
    i0 = jnp.clip(x0.astype(jnp.int32), 0, src_size - 1)
    i1 = jnp.clip(i0 + 1, 0, src_size - 1)
    # clamp fractional weight at the borders like OpenCV (coords < 0 clamp)
    frac = jnp.where(x < 0, 0.0, frac)
    return i0, i1, frac


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize of (..., H, W) or (..., H, W, C) float images.

    Separable: one gather+lerp along rows, one along columns — XLA fuses each
    into a single pass; no 2D gather needed.
    """
    has_c = img.ndim >= 3 and img.shape[-1] in (1, 3, 4) and img.shape[-2] > 4
    h_axis = -3 if has_c else -2
    w_axis = -2 if has_c else -1
    src_h = img.shape[h_axis]
    src_w = img.shape[w_axis]
    img = img.astype(jnp.float32)

    i0, i1, fy = _linear_weights(out_h, src_h)
    rows0 = jnp.take(img, i0, axis=h_axis)
    rows1 = jnp.take(img, i1, axis=h_axis)
    fy_shape = [1] * img.ndim
    fy_shape[h_axis] = out_h
    fy = fy.reshape(fy_shape)
    rows = rows0 * (1.0 - fy) + rows1 * fy

    j0, j1, fx = _linear_weights(out_w, src_w)
    cols0 = jnp.take(rows, j0, axis=w_axis)
    cols1 = jnp.take(rows, j1, axis=w_axis)
    fx_shape = [1] * img.ndim
    fx_shape[w_axis] = out_w
    fx = fx.reshape(fx_shape)
    return cols0 * (1.0 - fx) + cols1 * fx


def resize_nearest(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest-neighbor resize, matching cv2.resize INTER_NEAREST
    (src index = floor(dst * scale))."""
    has_c = img.ndim >= 3 and img.shape[-1] in (1, 3, 4) and img.shape[-2] > 4
    h_axis = -3 if has_c else -2
    w_axis = -2 if has_c else -1
    src_h = img.shape[h_axis]
    src_w = img.shape[w_axis]
    iy = jnp.clip(
        (jnp.arange(out_h, dtype=jnp.float32) * (src_h / out_h)).astype(jnp.int32),
        0, src_h - 1,
    )
    ix = jnp.clip(
        (jnp.arange(out_w, dtype=jnp.float32) * (src_w / out_w)).astype(jnp.int32),
        0, src_w - 1,
    )
    out = jnp.take(img, iy, axis=h_axis)
    return jnp.take(out, ix, axis=w_axis)
