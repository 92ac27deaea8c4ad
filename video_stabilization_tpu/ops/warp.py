"""Perspective warping — the output-rendering kernel.

Equivalent of ``cv::warpPerspective(src, H, size, INTER_LINEAR,
BORDER_CONSTANT, border_value)`` (reference: src/stabilizer.cpp:1309-1314;
the reference fills the border with 0.5x the mean frame color).

Like OpenCV, ``h`` maps SOURCE coords to DESTINATION coords; the kernel
inverts it once (3x3, closed form) and evaluates the projective map per
destination pixel, then bilinearly gathers.  Everything is one fused XLA
program: coordinate generation, the projective divide, the 4-tap gather and
the border blend.  A Pallas tiling of the gather lives in ops/pallas for the
full-resolution hot path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _inv3x3(m: jax.Array) -> jax.Array:
    """Closed-form 3x3 inverse (adjugate / det) — avoids linalg solve inside
    the per-frame step."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    ca = e * i - f * h
    cb = -(d * i - f * g)
    cc = d * h - e * g
    det = a * ca + b * cb + c * cc
    det = jnp.where(jnp.abs(det) > _EPS, det, 1.0)
    adj = jnp.array(
        [
            [ca, -(b * i - c * h), b * f - c * e],
            [cb, a * i - c * g, -(a * f - c * d)],
            [cc, -(a * h - b * g), a * e - b * d],
        ]
    )
    return adj / det


def warp_perspective(
    src: jax.Array,
    h: jax.Array,
    out_shape: Tuple[int, int] | None = None,
    border_value: jax.Array | float = 0.0,
) -> jax.Array:
    """Warp ``src`` by homography ``h`` (src->dst), bilinear + constant border.

    Args:
      src: (H, W) or (H, W, C) float32 image.
      h: (3, 3) homography mapping source pixel coords to destination coords.
      out_shape: (out_h, out_w); defaults to the source shape.
      border_value: scalar or (C,) fill for out-of-bounds samples.

    Returns the warped image with the same rank as ``src``.
    """
    src = src.astype(jnp.float32)
    has_c = src.ndim == 3
    sh, sw = src.shape[0], src.shape[1]
    out_h, out_w = out_shape if out_shape is not None else (sh, sw)

    hinv = _inv3x3(h.astype(jnp.float32))

    ys = jnp.arange(out_h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    # projective map of destination pixel -> source coords
    denom = hinv[2, 0] * xs + hinv[2, 1] * ys + hinv[2, 2]
    denom = jnp.where(jnp.abs(denom) > _EPS, denom, _EPS)
    sx = (hinv[0, 0] * xs + hinv[0, 1] * ys + hinv[0, 2]) / denom
    sy = (hinv[1, 0] * xs + hinv[1, 1] * ys + hinv[1, 2]) / denom

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    inb = (sx >= 0.0) & (sx <= sw - 1.0) & (sy >= 0.0) & (sy <= sh - 1.0)

    x0c = jnp.clip(x0i, 0, sw - 1)
    x1c = jnp.clip(x0i + 1, 0, sw - 1)
    y0c = jnp.clip(y0i, 0, sh - 1)
    y1c = jnp.clip(y0i + 1, 0, sh - 1)

    v00 = src[y0c, x0c]
    v01 = src[y0c, x1c]
    v10 = src[y1c, x0c]
    v11 = src[y1c, x1c]

    if has_c:
        fx = fx[..., None]
        fy = fy[..., None]
        inb = inb[..., None]
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    out = top * (1.0 - fy) + bot * fy

    border = jnp.asarray(border_value, jnp.float32)
    if has_c:
        border = jnp.broadcast_to(border, (src.shape[2],))
    return jnp.where(inb, out, border)
