"""Preprocessing filters for the registration-lock modes.

The reference's ORB/SIFT preprocessing chain (src/stabilizer.cpp:464-477,
docs/math-overview.md "Image Preprocessing Pipeline") is:

    medianBlur(5) -> sharpen 3x3 [[0,-1,0],[-1,5,-1],[0,-1,0]] ->
    CLAHE(clip 2.0, 8x8 tiles) -> medianBlur(5)

All four are implemented here as fused XLA programs over (H, W) float/uint8
images:

- **median_blur**: the 25 shifted neighborhoods are stacked and reduced with
  a vectorized median (one XLA sort over a 25-length axis, fully parallel
  across pixels) — no data-dependent control flow.  Borders replicate
  (OpenCV medianBlur convention).
- **sharpen3**: separable-free 3x3 stencil, reflect-101 borders (filter2D's
  BORDER_DEFAULT).
- **clahe**: per-tile 256-bin histograms computed as an equality-vs-bins
  reduction (tile_pixels x 256 one-hot sum — pure VPU work, no scatters),
  OpenCV-style clip + uniform redistribution with residual-to-first-bins,
  CDF LUTs, and bilinear blending of the 4 neighboring tile LUTs per pixel.
  Images not divisible by the tile grid are reflect-padded then cropped,
  like cv::CLAHE.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _replicate_pad(img: jax.Array, pad: int) -> jax.Array:
    return jnp.pad(img, pad, mode="edge")


def median_blur(img: jax.Array, ksize: int = 5) -> jax.Array:
    """ksize x ksize median filter, replicate borders (cv2.medianBlur)."""
    pad = ksize // 2
    x = _replicate_pad(img, pad)
    h, w = img.shape[-2], img.shape[-1]
    shifts = [
        x[..., dy : dy + h, dx : dx + w]
        for dy in range(ksize)
        for dx in range(ksize)
    ]
    stack = jnp.stack(shifts, axis=0)
    return jnp.median(stack, axis=0)


SHARPEN_KERNEL = ((0.0, -1.0, 0.0), (-1.0, 5.0, -1.0), (0.0, -1.0, 0.0))


def sharpen3(img: jax.Array) -> jax.Array:
    """3x3 sharpening stencil (reference kernel, src/stabilizer.cpp:466-470),
    reflect-101 borders like cv2.filter2D's default."""
    x = jnp.pad(img, 1, mode="reflect")
    h, w = img.shape[-2], img.shape[-1]
    out = jnp.zeros_like(img, dtype=jnp.float32)
    for dy in range(3):
        for dx in range(3):
            k = SHARPEN_KERNEL[dy][dx]
            if k != 0.0:
                out = out + k * x[..., dy : dy + h, dx : dx + w].astype(jnp.float32)
    return out


def clahe(
    img: jax.Array,
    clip_limit: float = 2.0,
    tiles: Tuple[int, int] = (8, 8),
) -> jax.Array:
    """Contrast-limited adaptive histogram equalization on a uint8-valued
    (H, W) image (float inputs are rounded/clipped to [0, 255]).

    Matches cv2.createCLAHE(clipLimit, tileGridSize).apply up to +-1 gray
    level (integer rounding differences at tile seams).
    """
    ty, tx = tiles
    h, w = img.shape
    img_u8 = jnp.clip(jnp.round(img.astype(jnp.float32)), 0, 255)

    # pad to a multiple of the tile grid (reflect-101, like cv::CLAHE)
    th = -(-h // ty)
    tw = -(-w // tx)
    ph, pw = th * ty - h, tw * tx - w
    padded = jnp.pad(img_u8, ((0, ph), (0, pw)), mode="reflect") if (ph or pw) else img_u8
    hh, ww = padded.shape

    # --- per-tile histograms (ty*tx, 256), no scatters ----------------------
    tiles_px = padded.reshape(ty, th, tx, tw).transpose(0, 2, 1, 3).reshape(
        ty * tx, th * tw
    )
    bins = jnp.arange(256, dtype=jnp.float32)
    hist = jnp.sum(
        tiles_px[:, :, None] == bins[None, None, :], axis=1, dtype=jnp.float32
    )  # (T, 256)

    # --- clip + redistribute (OpenCV calcLut integer semantics) -------------
    # OpenCV truncates the limit to int (max(1, int(clip*area/256))) and
    # sprinkles the residual one count per `residualStep` bins.
    tile_area = th * tw
    limit = jnp.maximum(1.0, jnp.floor(clip_limit * tile_area / 256.0))
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, limit)
    batch = jnp.floor(excess / 256.0)
    residual = excess - batch * 256.0                  # (T, 1)
    hist = hist + batch
    step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(residual, 1.0)), 1.0)
    bin_idx = jnp.arange(256, dtype=jnp.float32)[None, :]
    gets_one = (jnp.mod(bin_idx, step) == 0) & (bin_idx / step < residual)
    hist = hist + gets_one.astype(jnp.float32)

    # --- LUTs ----------------------------------------------------------------
    cdf = jnp.cumsum(hist, axis=-1)
    scale = 255.0 / tile_area
    luts = jnp.clip(jnp.round(cdf * scale), 0, 255)  # (T, 256)
    luts = luts.reshape(ty, tx, 256)

    # --- bilinear interpolation between tile LUTs ---------------------------
    ys = jnp.arange(hh, dtype=jnp.float32)
    xs = jnp.arange(ww, dtype=jnp.float32)
    fy = ys / th - 0.5                      # tile-space coordinate of pixel
    fx = xs / tw - 0.5
    y0 = jnp.clip(jnp.floor(fy), 0, ty - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(fx), 0, tx - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, ty - 1)
    x1 = jnp.clip(x0 + 1, 0, tx - 1)
    wy = jnp.clip(fy - jnp.floor(fy), 0.0, 1.0)
    wy = jnp.where(fy < 0, 0.0, wy)
    wx = jnp.clip(fx - jnp.floor(fx), 0.0, 1.0)
    wx = jnp.where(fx < 0, 0.0, wx)

    vals = padded.astype(jnp.int32)                     # (hh, ww) in [0,255]
    wyc = wy[:, None]
    wxc = wx[None, :]

    # Per-pixel output = bilinear blend of 4 neighbor-tile LUTs evaluated at
    # the pixel's gray value.  A direct luts[tile, val] lookup is a 2D HLO
    # gather (~8 ms at 360p on TPU — latency-bound); instead blend the LUTs
    # FIRST into a per-pixel-blended LUT *image* per bin... equivalently:
    # upsample each LUT bin-plane to pixel resolution with shared-index row/
    # col takes (tiny (ty,tx) grids), then select by value with 256 masked
    # accumulations — pure VPU, no gathers.
    rows0 = jnp.take(luts, y0, axis=0)                  # (hh, tx, 256)
    rows1 = jnp.take(luts, y1, axis=0)
    lut_rows = rows0 * (1 - wyc[..., None]) + rows1 * wyc[..., None]

    # Blending along x eagerly would materialize (hh, ww, 256) = 235 MB at
    # 360p; chunks of 32 bins keep peak live memory at (hh, ww, 32) ≈ 29 MB
    # while the value-select stays fully vectorized (and the graph stays 8
    # chunk bodies, not 256 unrolled iterations).
    out = jnp.zeros((hh, ww), jnp.float32)
    chunk = 32
    for b0 in range(0, 256, chunk):
        planes = lut_rows[:, :, b0 : b0 + chunk]        # (hh, tx, C)
        p0 = jnp.take(planes, x0, axis=1)               # (hh, ww, C)
        p1 = jnp.take(planes, x1, axis=1)
        up = p0 * (1 - wxc[..., None]) + p1 * wxc[..., None]
        sel = vals[..., None] == jnp.arange(b0, b0 + chunk)[None, None, :]
        out = out + jnp.sum(jnp.where(sel, up, 0.0), axis=-1)
    return out[:h, :w]


def preprocess_for_registration(
    gray: jax.Array,
    clip_limit: float = 2.0,
    tiles: Tuple[int, int] = (8, 8),
    median_ksize: int = 5,
) -> jax.Array:
    """Full reference preprocessing chain for ORB/SIFT lock modes."""
    x = median_blur(gray, median_ksize)
    x = jnp.clip(sharpen3(x), 0.0, 255.0)
    x = clahe(x, clip_limit, tiles)
    x = median_blur(x, median_ksize)
    return x
