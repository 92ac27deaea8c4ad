"""Temporal-window trajectory smoothing — the GLOBAL_SMOOTHING brain.

Implements the moving-average smoothing homography Q_t of
docs/math-overview.md ("Smoothing camera motion") as two fixed-length
``lax.scan`` chains over the transform window (reference:
src/stabilizer.cpp:793-852):

    past side:    P_j = T[p-j]^-1 · P_{j-1}         (maps frame p -> p-j)
    future side:  F_j = T[p+j] · F_{j-1}            (maps frame p -> p+j+1)
    Q = ( Σ_j P_j + [I] + Σ_j F_j ) / count

Masked lanes (outside the valid window) contribute nothing; shapes stay
static for any warm-up state.

The reference has three documented quirks (SURVEY.md appendix), replicated
only when ``reference_compat`` is set:
  1. future loop bound excludes the NEWEST transform (src/stabilizer.cpp:826);
  2. the presentation frame's identity term is omitted from the average
     (:841-843 divides by neighbour count only);
  3. future-side chaining multiplies on the RIGHT (H_accum·T, :834), i.e.
     T[p]·T[p+1]·…, the reverse of the math doc's product order (benign for
     near-commuting rigid transforms, but not the documented formula).
With ``reference_compat=False`` the math-overview formula is implemented
exactly: all future transforms, identity term included, left-chaining.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from video_stabilization_tpu.ops.warp import _inv3x3


def smoothing_homography(
    transforms: jax.Array,
    tvalid: jax.Array,
    presentation_idx: jax.Array,
    num_transforms: jax.Array,
    reference_compat: bool = False,
) -> jax.Array:
    """Compute the smoothing homography Q for the presentation frame.

    Args:
      transforms: (W-1, 3, 3) chronological inter-frame transforms, newest at
        the last slot; slot i maps window-frame i -> i+1 ... but only the last
        ``num_transforms`` slots are real (warm-up).
      tvalid: (W-1,) validity of each slot.
      presentation_idx: () int32 — chronological window index of the
        presentation frame (0-based over the *valid* suffix of the window).
      num_transforms: () int32 — count of valid transforms (= L-1 for L
        window frames).
      reference_compat: replicate the reference's three quirks bit-for-bit.

    Returns (3, 3) f32 smoothing homography (identity when no neighbours).
    """
    wm1 = transforms.shape[0]
    dtype = transforms.dtype

    # Chronological transform i (0-based over valid suffix) lives at array
    # slot (wm1 - num_transforms + i).
    base = wm1 - num_transforms

    def chrono(i):
        idx = jnp.clip(base + i, 0, wm1 - 1)
        t = transforms[idx]
        v = tvalid[idx] & (i >= 0) & (i < num_transforms)
        return t, v

    p = presentation_idx
    eye = jnp.eye(3, dtype=dtype)

    # --- past side: j = 1 .. wm1, uses chronological transform p-j ----------
    def past_step(carry, j):
        accum = carry
        t, v = chrono(p - j)
        new_accum = jnp.matmul(_inv3x3(t), accum, precision=jax.lax.Precision.HIGHEST)
        accum = jnp.where(v, new_accum, accum)
        contrib = jnp.where(v, accum, jnp.zeros_like(accum))
        return accum, (contrib, v)

    _, (past_terms, past_valid) = jax.lax.scan(
        past_step, eye, jnp.arange(1, wm1 + 1)
    )

    # --- future side ---------------------------------------------------------
    # uses chronological transforms p, p+1, ...; bound excludes the newest
    # transform in compat mode (reference quirk #1).
    last_allowed = num_transforms - (2 if reference_compat else 1)

    def future_step(carry, j):
        accum = carry
        idx = p + j
        t, v = chrono(idx)
        v = v & (idx <= last_allowed)
        if reference_compat:
            new_accum = jnp.matmul(accum, t, precision=jax.lax.Precision.HIGHEST)
        else:
            new_accum = jnp.matmul(t, accum, precision=jax.lax.Precision.HIGHEST)
        accum = jnp.where(v, new_accum, accum)
        contrib = jnp.where(v, accum, jnp.zeros_like(accum))
        return accum, (contrib, v)

    _, (future_terms, future_valid) = jax.lax.scan(
        future_step, eye, jnp.arange(0, wm1)
    )

    h_sum = jnp.sum(past_terms, axis=0) + jnp.sum(future_terms, axis=0)
    count = jnp.sum(past_valid) + jnp.sum(future_valid)

    if not reference_compat:
        # identity term for the presentation frame itself (quirk #2 fixed)
        h_sum = h_sum + eye
        count = count + 1

    have_any = count > 0
    h_avg = h_sum / jnp.maximum(count, 1).astype(dtype)
    finite = jnp.all(jnp.isfinite(h_avg))
    return jnp.where(have_any & finite, h_avg, eye)
