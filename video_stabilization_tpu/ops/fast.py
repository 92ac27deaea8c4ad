"""FAST-9/16 corner detection — fully vectorized.

The segment test: a pixel p is a corner if 9 or more *contiguous* pixels on
the 16-pixel Bresenham circle of radius 3 are all brighter than p+t or all
darker than p-t.  Instead of OpenCV's per-pixel early-exit byte machinery,
the 16 circle offsets become 16 shifted views of the image; contiguity is a
logical AND over 9 consecutive entries of the (wrapped) ring, evaluated for
all 16 arc starts at once — one fused elementwise program over (16+, H, W).

Score (the reference configures cv::ORB with FAST_SCORE,
src/stabilizer.cpp:483-493): for each arc, the weakest margin in the arc;
the score is the strongest such arc margin — the maximal threshold at which
the pixel remains a corner.

Two implementations with identical results:

- ``fast_score`` (XLA): materializes the (16, H, W) shifted stack in HBM —
  the 4-pass doubling reduction re-reads it 3x, ~800 B of HBM traffic per
  pixel.  This was the dominant cost of the ORB lock step (2.7 ms of a
  6.4 ms detect+describe at 360p, stage profile 2026-08-20).
- ``fast_score_pallas`` (TPU): row-strip kernel that keeps the padded image
  in VMEM and forms all 16 shifted views + both arc reductions in
  registers — HBM traffic is one image read + one score write (8 B/px,
  ~100x less).  The arithmetic (subtract, min/max doubling, same
  association order) is identical to the XLA path, so results are
  bit-exact; ``tests/test_features.py`` asserts equality on both backends.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Bresenham circle of radius 3, clockwise from 12 o'clock (dy, dx)
CIRCLE_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

ARC_LEN = 9


def _fast_kernel(h: int, w: int, wo: int, strip: int, threshold: float,
                 xp_ref, out_ref):
    """One row-strip of the FAST score map, entirely in VMEM.

    ``xp_ref`` is the full edge-padded image (rows: n_strips*strip + 6,
    cols: wo + 128, valid pixel (y, x) at [y+3, x+3]); ``out_ref`` is this
    strip's (strip, wo) score block.  All 16 ring views are static slices
    of the VMEM window, and the 9-arc min/max doubling runs over a Python
    list of register tiles — nothing but the input read and the score
    write touches HBM."""
    i = pl.program_id(0)
    r0 = i * strip
    win = xp_ref[pl.ds(r0, strip + 6), :]            # (strip+6, wo+128)
    center = win[3:3 + strip, 3:3 + wo]
    ring = [win[3 + dy:3 + dy + strip, 3 + dx:3 + dx + wo]
            for dy, dx in CIRCLE_OFFSETS]
    bright = [r - center for r in ring]

    def arc9(margin, op):
        # same doubling order as the XLA path (bit-exactness)
        m2 = [op(margin[k], margin[(k + 1) % 16]) for k in range(16)]
        m4 = [op(m2[k], m2[(k + 2) % 16]) for k in range(16)]
        m8 = [op(m4[k], m4[(k + 4) % 16]) for k in range(16)]
        return [op(m8[k], margin[(k + 8) % 16]) for k in range(16)]

    def list_max(xs):
        acc = xs[0]
        for x in xs[1:]:
            acc = jnp.maximum(acc, x)
        return acc

    score_bright = list_max(arc9(bright, jnp.minimum))
    score_dark = list_max([-m for m in arc9(bright, jnp.maximum)])
    score = jnp.maximum(score_bright, score_dark)

    rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (strip, wo), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (strip, wo), 1)
    interior = ((rows >= 3) & (rows < h - 3) & (cols >= 3) & (cols < w - 3))
    out_ref[:] = jnp.where(interior & (score > threshold), score, 0.0)


@functools.partial(jax.jit, static_argnames=("threshold",))
def _fast_score_pallas(img: jax.Array, threshold: float) -> jax.Array:
    h, w = img.shape
    strip = min(48, -(-h // 8) * 8)
    n_strips = -(-h // strip)
    wo = -(-w // 128) * 128
    xp = jnp.pad(img.astype(jnp.float32), 3, mode="edge")
    xp = jnp.pad(xp, ((0, n_strips * strip + 6 - xp.shape[0]),
                      (0, wo + 128 - xp.shape[1])))
    kernel = functools.partial(_fast_kernel, h, w, wo, strip, threshold)
    score = pl.pallas_call(
        kernel,
        grid=(n_strips,),
        in_specs=[pl.BlockSpec(xp.shape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec((strip, wo), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_strips * strip, wo), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(xp)
    return score[:h, :w]


def fast_score(img: jax.Array, threshold: float) -> Tuple[jax.Array, jax.Array]:
    """Returns (score, is_corner) maps, zero within 3 px of the border.

    Dispatches to the Pallas VMEM kernel (bit-identical, ~100x less HBM
    traffic) on TPU and in interpret mode elsewhere; ``fast_score_xla``
    keeps the pure-XLA formulation as the reference implementation."""
    score = _fast_score_pallas(img, float(threshold))
    return score, score > 0


def fast_score_xla(img: jax.Array, threshold: float) -> Tuple[jax.Array, jax.Array]:
    """Pure-XLA reference implementation (see module docstring)."""
    img = img.astype(jnp.float32)
    h, w = img.shape
    pad = 3
    x = jnp.pad(img, pad, mode="edge")

    ring = jnp.stack(
        [x[pad + dy : pad + dy + h, pad + dx : pad + dx + w] for dy, dx in CIRCLE_OFFSETS],
        axis=0,
    )  # (16, H, W)

    bright_margin = ring - img[None]          # p_i - p

    def _roll(a, k):
        return jnp.concatenate([a[k:], a[:k]], axis=0)

    def arc9(margin, op):
        # windowed op over all 16 contiguous 9-arcs by doubling: 4 passes
        # over the (16, H, W) stack instead of 9 (HBM-bound stencil)
        m2 = op(margin, _roll(margin, 1))
        m4 = op(m2, _roll(m2, 2))
        m8 = op(m4, _roll(m4, 4))
        return op(m8, _roll(margin, 8))

    # dark arcs are the negated bright arcs: arc_min(-m) = -arc_max(m), so
    # one stack serves both polarities
    score_bright = jnp.max(arc9(bright_margin, jnp.minimum), axis=0)
    score_dark = jnp.max(-arc9(bright_margin, jnp.maximum), axis=0)
    score = jnp.maximum(score_bright, score_dark)

    is_corner = score > threshold
    border = jnp.zeros((h, w), bool).at[pad:-pad, pad:-pad].set(True)
    is_corner = is_corner & border
    score = jnp.where(is_corner, score, 0.0)
    return score, is_corner
