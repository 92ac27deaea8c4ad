"""Warping — the output-rendering kernels.

Equivalent of ``cv::warpPerspective(src, H, size, INTER_LINEAR,
BORDER_CONSTANT, border_value)`` (reference: src/stabilizer.cpp:1309-1314;
the reference fills the border with 0.5x the mean frame color).

Two implementations:

- :func:`warp_perspective` — the general projective path: per-pixel inverse
  map + 4-tap bilinear gather.  Handles any homography but random-access
  gathers cost ~75 ms at 1080p on this TPU (gathers are latency-bound on a
  vector machine).
- :func:`warp_affine_shear` — the hot path.  The engine only ever produces
  (near-)rigid transforms (estimateMotion kills scale; lock/smoothing
  compose rigid motions), so the inverse 2x2 is LDU-decomposed into
  **one y-shear, separable axis scales, one x-shear** — every pass is a
  per-line constant-shift 1-D resample implemented with contiguous
  ``dynamic_slice`` reads and 2-tap lerps: ZERO random gathers, pure
  bandwidth.  Exact for any affine with a11 != 0; ~7x faster than the
  gather path at 1080p (measured).  Out-of-frame pixels are filled from the
  analytically computed inverse map, identical to the gather path.

Like OpenCV, ``h`` maps SOURCE coords to DESTINATION coords in both.
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


# --- gather-free affine warp (shear decomposition) ---------------------------

_SHEAR_PAD = 256   # max |per-line shift| the shear passes can absorb, px


def _shear_rows(planes: jax.Array, shifts: jax.Array) -> jax.Array:
    """Per-row fractional x-shift: out[c, y, x] = in[c, y, x + shifts[y]].

    Implemented as one contiguous dynamic_slice per row plus a 2-tap lerp —
    no random gathers.  ``planes`` is (C, H, W); reads beyond the canvas
    clamp (callers keep a zero apron so clamped reads land in it).
    """
    c, h, w = planes.shape
    k = jnp.floor(shifts).astype(jnp.int32)           # (H,)
    f = (shifts - jnp.floor(shifts)).astype(planes.dtype)[None, :, None]

    # two-sided zero apron sized to the shift envelope, +1 for the 2-tap lerp
    s = _SHEAR_PAD
    padded = jnp.pad(planes, ((0, 0), (0, 0), (s, s + 1)))

    def row(slab, kk):                                 # slab: (C, W + 2s + 1)
        start = jnp.clip(s + kk, 0, 2 * s)             # in-range for |k| <= s
        return jax.lax.dynamic_slice(slab, (0, start), (c, w + 1))

    # put rows in front for the vmap, then restore
    rows = jnp.transpose(padded, (1, 0, 2))            # (H, C, W + 2s + 1)
    shifted = jax.vmap(row)(rows, k)                   # (H, C, W + 1)
    shifted = jnp.transpose(shifted, (1, 0, 2))        # (C, H, W + 1)
    return shifted[:, :, :-1] * (1 - f) + shifted[:, :, 1:] * f


def _resample_axis(planes: jax.Array, scale: jax.Array, offset: jax.Array,
                   axis: int) -> jax.Array:
    """1-D affine resample with a SHARED index vector along ``axis``:
    out[i] = in[scale * i + offset] (bilinear, clamped)."""
    n = planes.shape[axis]
    idx = jnp.arange(n, dtype=planes.dtype)
    # residual form i + i*(scale-1): exact integer part + small product keeps
    # f32 rounding ~1e-4 px across a 2400-px extended canvas
    pos = idx + idx * (scale - 1.0) + offset
    i0 = jnp.floor(pos)
    f = pos - i0
    i0c = jnp.clip(i0.astype(jnp.int32), 0, n - 1)
    i1c = jnp.clip(i0c + 1, 0, n - 1)
    a = jnp.take(planes, i0c, axis=axis)
    b = jnp.take(planes, i1c, axis=axis)
    shape = [1] * planes.ndim
    shape[axis] = n
    f = f.reshape(shape)
    return a * (1 - f) + b * f


def warp_affine_shear(
    src: jax.Array,
    h: jax.Array,
    border_value: jax.Array | float = 0.0,
) -> jax.Array:
    """Affine warp via LDU shear decomposition — see module docstring.

    Args:
      src: (H, W) or (H, W, C) float32 image.
      h: (3, 3) affine transform mapping source -> destination pixels (the
        projective row is ignored; the engine's transforms are affine by
        construction).  Requires |inv(A)[0,0]| not tiny (|rotation| < ~60°)
        and per-line shifts within ±256 px — always true for stabilization
        corrections; outside that envelope use :func:`warp_perspective`.
      border_value: scalar or (C,) fill for out-of-source pixels.
    """
    src = src.astype(jnp.float32)
    has_c = src.ndim == 3
    planes = jnp.transpose(src, (2, 0, 1)) if has_c else src[None]
    c, hh, ww = planes.shape

    hinv = _inv3x3(h.astype(jnp.float32))
    a11, a12, tx = hinv[0, 0], hinv[0, 1], hinv[0, 2]
    a21, a22, ty = hinv[1, 0], hinv[1, 1], hinv[1, 2]

    a11s = jnp.where(jnp.abs(a11) > 1e-3, a11, 1e-3)
    u = a12 / a11s
    l = a21 / a11s
    p = a11
    q = a22 - a21 * a12 / a11s
    ty2 = ty - l * tx

    pad = _SHEAR_PAD
    ext = jnp.pad(planes, ((0, 0), (pad, pad), (pad, pad)))

    # P1: y-shear — out1(x, y) = img(x, y + l·x + ty2). Work transposed so
    # the per-line slice machinery shifts along the contiguous axis.
    xs_ext = jnp.arange(ww + 2 * pad, dtype=jnp.float32) - pad
    ext_t = jnp.transpose(ext, (0, 2, 1))              # (C, Xe, Ye)
    out1_t = _shear_rows(ext_t, (l * xs_ext + ty2) + 0.0)
    out1 = jnp.transpose(out1_t, (0, 2, 1))            # (C, Ye, Xe)

    # P2: separable axis scales + x-translation —
    # out2(x, y) = out1(p·x + tx, q·y), in extended coordinates.
    out2 = _resample_axis(out1, q, (q - 1.0) * (-pad), axis=1)
    out2 = _resample_axis(out2, p, (p - 1.0) * (-pad) + tx, axis=2)

    # P3: x-shear — out3(x, y) = out2(x + u·y, y).
    ys_ext = jnp.arange(hh + 2 * pad, dtype=jnp.float32) - pad
    out3 = _shear_rows(out2, u * ys_ext)

    warped = out3[:, pad : pad + hh, pad : pad + ww]

    # border mask from the true inverse map (elementwise, fused)
    ys = jnp.arange(hh, dtype=jnp.float32)[:, None]
    xs = jnp.arange(ww, dtype=jnp.float32)[None, :]
    sx = a11 * xs + a12 * ys + tx
    sy = a21 * xs + a22 * ys + ty
    inb = (sx >= 0.0) & (sx <= ww - 1.0) & (sy >= 0.0) & (sy <= hh - 1.0)

    border = jnp.broadcast_to(
        jnp.asarray(border_value, jnp.float32), (c,)
    )[:, None, None]
    out = jnp.where(inb[None], warped, border)
    return jnp.transpose(out, (1, 2, 0)) if has_c else out[0]
