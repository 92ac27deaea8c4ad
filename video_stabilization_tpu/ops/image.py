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


def yuv_planes_to_bgr(y: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Device-side YUV -> BGR uint8, the inverse of VideoWriter's forward
    transform and bit-matched to the native reader's host conversion
    (native/framebuf.cpp y4m_read_bgr: BT.601, +0.5 truncating round).

    ``y`` is (..., H, W); ``u``/``v`` are full-res (..., H, W) or C420
    (..., H/2, W/2) — subsampled chroma is upsampled by nearest/repeat,
    matching the C++ ``(y/2, x/2)`` indexing.  Moving this off the host is
    what makes the native file path decode-light: the host only freads
    planes (io/native.py PrefetchingYUVSource) and ships 1.5 B/px (C420)
    instead of 3 B/px BGR over H2D.
    """
    yf = y.astype(jnp.float32)
    if u.shape[-1] != y.shape[-1]:
        u = jnp.repeat(jnp.repeat(u, 2, axis=-1), 2, axis=-2)
        v = jnp.repeat(jnp.repeat(v, 2, axis=-1), 2, axis=-2)
        u = u[..., : y.shape[-2], : y.shape[-1]]
        v = v[..., : y.shape[-2], : y.shape[-1]]
    uf = u.astype(jnp.float32) - 128.0
    vf = v.astype(jnp.float32) - 128.0
    r = yf + 1.403 * vf
    g = yf - 0.344 * uf - 0.714 * vf
    b = yf + 1.773 * uf
    bgr = jnp.stack([b, g, r], axis=-1)
    return jnp.floor(jnp.clip(bgr, 0.0, 255.0) + 0.5).astype(jnp.uint8)


def yuv_flat_to_bgr(buf: jax.Array, h: int, w: int, c420: bool) -> jax.Array:
    """(..., nbytes) packed Y|U|V uint8 (NativeY4MReader.read_yuv layout)
    -> (..., H, W, 3) BGR uint8 on device."""
    if c420 and (h % 2 or w % 2):
        # csize = ysize//4 below only equals (h//2)*(w//2) for even dims;
        # the native reader (framebuf.cpp y4m_open) rejects these too.
        raise ValueError(f"C420 requires even dimensions, got {h}x{w}")
    ysize = h * w
    csize = ysize // 4 if c420 else ysize
    ch, cw = (h // 2, w // 2) if c420 else (h, w)
    lead = buf.shape[:-1]
    y = buf[..., :ysize].reshape(lead + (h, w))
    u = buf[..., ysize:ysize + csize].reshape(lead + (ch, cw))
    v = buf[..., ysize + csize:].reshape(lead + (ch, cw))
    return yuv_planes_to_bgr(y, u, v)


def gray_u8_cv2exact(frame_u8: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """(..., H, W, 3) uint8 BGR -> (..., out_h, out_w) float32 holding the
    BIT-EXACT integer gray the reference pipeline computes
    (src/stabilizer.cpp:1170-1175: cv::resize INTER_LINEAR then cv::cvtColor
    BGR2GRAY, both on uint8):

    - resize: cv2's fixed-point INTER_LINEAR at integer downscale factors k
      reduces exactly to lattice sampling — odd k is a pure strided slice at
      offset (k-1)/2; even k averages the two center taps per axis with one
      final round ``(sum + d/2) >> log2(d)`` (the 11-bit coefficient pairs
      are (2048,0) / (1024,1024)).  Verified element-exact against the
      installed cv2 for k=2 and k=3.
    - gray: Y = (3735*B + 19235*G + 9798*R + 16384) >> 15 — the 15-bit
      fixed-point BT.601 weights of this cv2 build (probed element-exact;
      the classic 14-bit 1868/9617/4899 table differs by 1 LSB on ~0.3% of
      pixels).

    Used by ``reference_compat`` mode: a ±1 gray LSB vs cv2 perturbs corner
    responses enough to permute the response-sorted GFTT list, which
    desynchronizes the (bit-exact) cv2 RANSAC hypothesis stream downstream.
    Only integer downscale ratios are supported (the compat/drift configs
    are 3x and 2x); general ratios raise.
    """
    h, w = frame_u8.shape[-3], frame_u8.shape[-2]
    if out_h > h or h % out_h or out_w > w or w % out_w:
        raise ValueError(
            f"gray_u8_cv2exact supports integer downscales only, got "
            f"{h}x{w} -> {out_h}x{out_w}")
    x = frame_u8.astype(jnp.int32)
    shift = 0
    for axis, k, size in ((-3, h // out_h, out_h), (-2, w // out_w, out_w)):
        if k == 1:
            continue
        ax = axis % x.ndim
        limit = (size - 1) * k + 1
        if k % 2 == 1:
            start = (k - 1) // 2
            x = jax.lax.slice_in_dim(x, start, start + limit, stride=k, axis=ax)
        else:
            a = jax.lax.slice_in_dim(x, k // 2 - 1, k // 2 - 1 + limit,
                                     stride=k, axis=ax)
            b = jax.lax.slice_in_dim(x, k // 2, k // 2 + limit, stride=k,
                                     axis=ax)
            x = a + b
            shift += 1
    if shift:
        x = (x + (1 << (shift - 1))) >> shift          # one final round, like
        # cv2's single >>22 descale after both separable fixed-point passes
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    gray = (3735 * b + 19235 * g + 9798 * r + (1 << 14)) >> 15
    return gray.astype(jnp.float32)


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


def _resample_linear_1d(img: jax.Array, out_size: int, axis: int) -> jax.Array:
    """One axis of a cv2-INTER_LINEAR resize.

    Fast path: when the downscale factor k = src/dst is an integer, the
    sample positions (i + 0.5)*k - 0.5 land on the lattice k*i + (k-1)/2 —
    integer positions for odd k (pure strided slice) and half-integer for
    even k (mean of two strided slices).  Both avoid the HLO gather the
    general take() path lowers to (1080p->360 sits on this path: k=3).
    """
    src_size = img.shape[axis]
    axis_pos = axis % img.ndim
    if src_size == out_size:
        return img
    if src_size % out_size == 0:
        k = src_size // out_size
        limit = (out_size - 1) * k + 1
        if k % 2 == 1:
            start = (k - 1) // 2
            return jax.lax.slice_in_dim(
                img, start, start + limit, stride=k, axis=axis_pos
            )
        a = jax.lax.slice_in_dim(
            img, k // 2 - 1, k // 2 - 1 + limit, stride=k, axis=axis_pos
        )
        b = jax.lax.slice_in_dim(img, k // 2, k // 2 + limit, stride=k, axis=axis_pos)
        return 0.5 * (a + b)

    i0, i1, f = _linear_weights(out_size, src_size)
    a = jnp.take(img, i0, axis=axis)
    b = jnp.take(img, i1, axis=axis)
    f_shape = [1] * img.ndim
    f_shape[axis] = out_size
    f = f.reshape(f_shape)
    return a * (1.0 - f) + b * f


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize of (..., H, W) or (..., H, W, C) float images.

    Separable: one pass per axis — strided slices for integer scale
    factors, gather+lerp otherwise; XLA fuses each into a single pass.
    """
    has_c = img.ndim >= 3 and img.shape[-1] in (1, 3, 4) and img.shape[-2] > 4
    h_axis = -3 if has_c else -2
    w_axis = -2 if has_c else -1
    img = img.astype(jnp.float32)
    img = _resample_linear_1d(img, out_h, h_axis)
    return _resample_linear_1d(img, out_w, w_axis)


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
