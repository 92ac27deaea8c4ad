"""Affine warping as two Pallas TPU passes — the output-rendering hot kernel.

Replaces the XLA 3-pass shear warp for the engine hot path (equivalent of
``cv::warpPerspective(src, H, size, INTER_LINEAR, BORDER_CONSTANT, value)``,
reference: src/stabilizer.cpp:1309-1314).  Design:

**Catmull-Smith 2-pass decomposition.**  With the inverse (dst->src) affine
``sx = A·x + B·y + tx``, ``sy = C·x + D·y + ty``:

    pass V:  I1[y, u] = src[alpha·y + beta·u + gamma, u]
                 alpha = D - C·B/A,  beta = C/A,  gamma = ty - C·tx/A
    pass H:  out[y, x] = I1[y, A·x + B·y + tx]

Each pass is a *row* resample (bilinear along the sublane axis), because
Mosaic supports dynamic sublane slices of VMEM but not dynamic lane slices.
Pass H is realized as a row resample on I1-transposed; each kernel therefore
transposes its own output in VMEM, and after both passes the data lands back
in row-major orientation — no XLA transpose passes.

**Kernel structure** (``_resample_transpose``): grid over (channel, 128-lane
strips); the whole source strip is VMEM-resident.  For every 8-row output
tile the kernel takes one dynamic sublane window and forms the bilinear
result as a masked sum over ``2·COPIES`` statically shifted slices — the
affine row position varies by at most ``|alpha-1|·8 + |beta|·128`` inside a
tile, so a static copy budget covers rotations up to ~9 degrees.  Larger
motions take the projective gather fallback (``lax.cond``), keeping the op
correct for any homography.

Why this is fast: zero gathers, zero per-line ``dynamic_slice`` HLOs (the
3-pass XLA shear spent ~9 ms at 1080p on those), DMA traffic within ~15% of
the read-input + write-output floor, and the stream axis batches by adding a
grid dimension (``jax.vmap`` of a ``pallas_call``), which the XLA shear could
not do without degenerating into gathers (docs/roadmap.md round-1 item 2).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_stabilization_tpu.ops.warp import _inv3x3, warp_perspective

# Static copy budget per 8-row tile: supports |alpha-1|*8 + |beta|*128 + 3
# <= COPIES, i.e. in-plane rotations up to ~9 deg. PADV rows of padding on the
# resample axis guarantee clamp-free windows for every tile that contains any
# in-source position.
COPIES = 26
# Small-envelope variant (~1.6 deg): stabilization corrections are usually a
# fraction of a degree, so the single-stream path dispatches this ~3x-cheaper
# kernel via lax.cond whenever the transform fits (see warp_affine).
SMALL_COPIES = 8
PADV = COPIES + 4
_WIN = COPIES + 10  # window rows: d in [0, COPIES+1], slice d+1 : d+9


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _resample_kernel(params_ref, in_ref, out_ref, scratch, *, n_tiles: int,
                     r_in: int, copies: int = COPIES):
    """out[l, r] = in[alpha*r + beta*l + gamma_strip, l]  (bilinear over rows),
    written transposed.  in_ref: (1, R_in, 128); out_ref: (1, 128, 128*n_tiles).

    The strip's absolute lane offset is pre-folded into ``gamma_strip`` by the
    caller (params are per-strip), so the kernel never reads ``program_id`` —
    that keeps it correct under ``jax.vmap``, which prepends a batch grid dim.
    """
    alpha = params_ref[0, 0, 0]
    beta = params_ref[0, 0, 1]
    gamma = params_ref[0, 0, 2]

    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lanes8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    lanef = lanes8.astype(jnp.float32)

    for t in range(n_tiles):
        def tile_body(tt, _):
            r0f = jnp.float32(t * 128) + tt.astype(jnp.float32) * 8.0
            # base = floor(min over the tile of (p - r)): guarantees the
            # masked-copy index drel = floor(p) - base - r lands in
            # [0, span+2] for ANY alpha/beta within the copy budget.
            p00 = alpha * r0f + gamma
            m = (p00 - 1.0
                 + jnp.minimum((alpha - 1.0) * 7.0, 0.0)
                 + jnp.minimum(beta * 127.0, 0.0))
            base = jnp.clip(jnp.floor(m).astype(jnp.int32), 0,
                            r_in - (copies + 10))

            p = alpha * (r0f + rows8.astype(jnp.float32)) + beta * lanef + gamma
            i0 = jnp.floor(p)
            w = p - i0
            drel = i0.astype(jnp.int32) - base - rows8

            # NOTE (round 3): keep this loop STATIC and fully unrolled with
            # register accumulators.  Two attempts to pay only the actual
            # copy span both measured SLOWER on hardware: a @pl.when-
            # predicated static loop with scratch accumulation (6x slower —
            # the per-slice VMEM read-modify-write serializes the tile) and
            # a dynamic-bound fori_loop over [dmin, dmax] with per-iteration
            # dynamic sublane reads (10x slower — Mosaic cannot software-
            # pipeline the dynamic reads).  The unrolled masked adds
            # vectorize and pipeline; COPIES is the envelope price.
            window = in_ref[0, pl.ds(base, copies + 10), :]
            acc0 = jnp.zeros((8, 128), jnp.float32)
            acc1 = jnp.zeros((8, 128), jnp.float32)
            for d in range(copies + 2):
                sel = drel == d
                acc0 = acc0 + jnp.where(sel, window[d : d + 8, :], 0.0)
                acc1 = acc1 + jnp.where(sel, window[d + 1 : d + 9, :], 0.0)
            val = acc0 * (1.0 - w) + acc1 * w
            scratch[pl.ds(tt * 8, 8), :] = val
            return 0

        jax.lax.fori_loop(0, 16, tile_body, 0)
        out_ref[0, :, t * 128 : (t + 1) * 128] = scratch[:].T


def _resample_transpose(x: jax.Array, params: jax.Array, n_out: int,
                        interpret: bool, copies: int = COPIES) -> jax.Array:
    """x: (C, R_in, L) with L a 128-multiple, rows pre-padded by copies+4.
    params: (3,) f32 [alpha, beta, gamma] with gamma already pad-shifted.
    Returns (C, L, n_out128): out[c, l, r] = x[c, a*r + b*l + g, l].
    """
    c, r_in, l_total = x.shape
    assert l_total % 128 == 0, l_total
    n_strips = l_total // 128
    n_out128 = _ceil_to(n_out, 128)
    n_tiles = n_out128 // 128

    # per-strip params row: [alpha, beta, gamma + beta*128*j], padded to a
    # (n_strips, 1, 128) SMEM-friendly layout (strip lane offsets folded into
    # gamma so the kernel is program_id-free; see kernel docstring)
    gam = params[2] + params[1] * 128.0 * jnp.arange(n_strips, dtype=jnp.float32)
    prow = jnp.zeros((n_strips, 1, 128), jnp.float32)
    prow = prow.at[:, 0, 0].set(params[0])
    prow = prow.at[:, 0, 1].set(params[1])
    prow = prow.at[:, 0, 2].set(gam)

    kernel = functools.partial(_resample_kernel, n_tiles=n_tiles, r_in=r_in,
                               copies=copies)
    return pl.pallas_call(
        kernel,
        grid=(c, n_strips),
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, r_in, 128), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128, n_out128), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, l_total, n_out128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32)],
        interpret=interpret,
    )(prow, x)


def _affine_span_ok(alpha, beta, copies: int = COPIES) -> jax.Array:
    return jnp.abs(alpha - 1.0) * 8.0 + jnp.abs(beta) * 128.0 + 3.0 <= copies


def affine_envelope_ok(h: jax.Array) -> jax.Array:
    """True when the (3, 3) transform fits the full-envelope Pallas kernel
    (both passes' row spans within COPIES, ~9 deg rotation).  Scalar bool —
    lets batched callers hoist ONE ``lax.cond`` over a whole chunk instead
    of a per-frame fallback switch (engine/offline.py stage 7)."""
    hinv = _inv3x3(h.astype(jnp.float32))
    a, b = hinv[0, 0], hinv[0, 1]
    cc, d = hinv[1, 0], hinv[1, 1]
    a_safe = jnp.where(jnp.abs(a) > 1e-3, a, 1e-3)
    alpha1 = d - cc * b / a_safe
    beta1 = cc / a_safe
    return (
        _affine_span_ok(alpha1, beta1)
        & _affine_span_ok(a, b)
        & (jnp.abs(a) > 1e-3)
    )


def _warp_planes_pallas(planes: jax.Array, hinv: jax.Array,
                        interpret: bool, copies: int = COPIES) -> jax.Array:
    """(C, H, W) f32 planes warped by the inverse map ``hinv`` (affine rows).
    No border handling here — callers mask with the true inverse map."""
    c, h, w = planes.shape
    padv = copies + 4
    a, b, tx = hinv[0, 0], hinv[0, 1], hinv[0, 2]
    cc, d, ty = hinv[1, 0], hinv[1, 1], hinv[1, 2]
    a_safe = jnp.where(jnp.abs(a) > 1e-3, a, 1e-3)

    alpha1 = d - cc * b / a_safe
    beta1 = cc / a_safe
    gamma1 = ty - cc * tx / a_safe

    w128 = _ceil_to(w, 128)
    h128 = _ceil_to(h, 128)

    # pass V: rows = y (source), lanes = x
    xpad = jnp.pad(planes, ((0, 0), (padv, padv), (0, w128 - w)))
    p1 = jnp.stack([alpha1, beta1, gamma1 + padv]).astype(jnp.float32)
    i1t = _resample_transpose(xpad, p1, h, interpret, copies)  # (C, W128, H128)

    # pass H: rows = u (source x), lanes = y
    i1t = jnp.pad(i1t, ((0, 0), (padv, padv), (0, 0)))
    p2 = jnp.stack([a, b, tx + padv]).astype(jnp.float32)
    out = _resample_transpose(i1t, p2, w, interpret, copies)   # (C, H128, W128)
    return out[:, :h, :w]


def warp_affine(
    src: jax.Array,
    h: jax.Array,
    border_value: jax.Array | float = 0.0,
    *,
    projective_fallback: bool = True,
) -> jax.Array:
    """Warp ``src`` by the affine transform ``h`` (src->dst pixel coords),
    bilinear, constant border — Pallas 2-pass kernel on TPU.

    Matches :func:`~video_stabilization_tpu.ops.warp.warp_perspective` on
    affine inputs.  ``projective_fallback=True`` adds a ``lax.cond`` branch to
    the gather path for transforms outside the kernel's rotation envelope
    (~9 deg) — disable it in stream-batched code (vmap turns cond into both-
    branches select; the envelope always holds for stabilization corrections).

    Args:
      src: (H, W) or (H, W, C) image, any real dtype.
      h: (3, 3) transform; the projective row is ignored (engine transforms
        are affine by construction — estimateMotion kills scale, reference
        src/stabilizer.cpp:261-267, and smoothing averages rigid motions).
      border_value: scalar or (C,) fill for out-of-source pixels.
    """
    src = src.astype(jnp.float32)
    has_c = src.ndim == 3
    planes = jnp.transpose(src, (2, 0, 1)) if has_c else src[None]
    c, hh, ww = planes.shape

    hinv = _inv3x3(h.astype(jnp.float32))
    interpret = jax.default_backend() != "tpu"

    def small_branch(pl_in):
        return _warp_planes_pallas(pl_in, hinv, interpret, SMALL_COPIES)

    def pallas_branch(pl_in):
        return _warp_planes_pallas(pl_in, hinv, interpret)

    def fallback_branch(pl_in):
        img = jnp.transpose(pl_in, (1, 2, 0))
        out = warp_perspective(img, h, None, 0.0)
        return jnp.transpose(out, (2, 0, 1))

    a, b = hinv[0, 0], hinv[0, 1]
    cc, d = hinv[1, 0], hinv[1, 1]
    a_safe = jnp.where(jnp.abs(a) > 1e-3, a, 1e-3)
    alpha1 = d - cc * b / a_safe
    beta1 = cc / a_safe

    if projective_fallback:
        # single-stream path: pick the cheapest kernel that fits the
        # transform — the small-envelope variant covers typical stabilization
        # corrections (fractions of a degree) at ~1/3 the copy work; the
        # full-envelope kernel covers up to ~9 deg; anything larger takes
        # the projective gather.  lax.switch executes ONE branch here.
        ok_small = (
            _affine_span_ok(alpha1, beta1, SMALL_COPIES)
            & _affine_span_ok(a, b, SMALL_COPIES)
            & (jnp.abs(a) > 1e-3)
        )
        ok_big = (
            _affine_span_ok(alpha1, beta1)
            & _affine_span_ok(a, b)
            & (jnp.abs(a) > 1e-3)
        )
        idx = jnp.where(ok_small, 0, jnp.where(ok_big, 1, 2))
        warped = jax.lax.switch(
            idx, [small_branch, pallas_branch, fallback_branch], planes
        )
    else:
        # batched path: one static kernel (vmap would evaluate every branch
        # of a switch for every stream)
        warped = pallas_branch(planes)

    # constant border from the true inverse map (fused elementwise)
    ys = jnp.arange(hh, dtype=jnp.float32)[:, None]
    xs = jnp.arange(ww, dtype=jnp.float32)[None, :]
    sx = hinv[0, 0] * xs + hinv[0, 1] * ys + hinv[0, 2]
    sy = hinv[1, 0] * xs + hinv[1, 1] * ys + hinv[1, 2]
    inb = (sx >= 0.0) & (sx <= ww - 1.0) & (sy >= 0.0) & (sy <= hh - 1.0)

    border = jnp.broadcast_to(
        jnp.asarray(border_value, jnp.float32), (c,)
    )[:, None, None]
    out = jnp.where(inb[None], warped, border)
    return jnp.transpose(out, (1, 2, 0)) if has_c else out[0]
