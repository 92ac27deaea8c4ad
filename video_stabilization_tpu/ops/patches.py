"""Batched patch extraction on the MXU — the shared gather-free primitive.

Per-keypoint patch reads are the classic TPU anti-pattern: a vmap of
``dynamic_slice`` lowers to N serialized gathers and is latency-bound (the
round-1 ORB describe spent ~30 ms there).  The MXU formulation extracts ALL
patches at once as two one-hot selection matmuls:

    rows    = onehot(row_idx) @ image      (N·P, H) x (H, W)
    patches = rows @ onehot(col_idx)^T     per keypoint, (P, W) x (W, P)

Each is a large dense matmul the systolic array executes in microseconds;
the one-hot operands are built in-trace from iota comparisons (never
constant-folded into the executable — they are anchored on the input).

Used by ORB descriptor sampling (ops/orb.py) and SIFT descriptor gradients
(ops/sift.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def extract_patches_mxu(
    planes: jax.Array, iy: jax.Array, ix: jax.Array, size: int
) -> jax.Array:
    """Extract (size x size) patches from each of C planes at N positions.

    Args:
      planes: (C, H, W) float array (shared image planes, e.g. raw+blurred
        or gx+gy).
      iy, ix: (N,) int32 top-left corners (pre-clipped to [0, H-size] /
        [0, W-size] by the caller).
      size: static patch side P.

    Returns:
      (N, C, P, P) float32 patches.
    """
    c, h, w = planes.shape
    planes16 = planes.astype(jnp.bfloat16)

    yidx = iy[:, None] + jnp.arange(size)[None, :]               # (N, P)
    rsel = (yidx[:, :, None] == jnp.arange(h)[None, None, :]).astype(
        jnp.bfloat16
    )
    rows = jnp.einsum(
        "nph,chw->ncpw", rsel, planes16, preferred_element_type=jnp.float32
    )                                                            # (N, C, P, W)
    xidx = ix[:, None] + jnp.arange(size)[None, :]               # (N, P)
    csel = (jnp.arange(w)[None, :, None] == xidx[:, None, :]).astype(
        jnp.bfloat16
    )
    return jnp.einsum(
        "ncpw,nwq->ncpq", rows.astype(jnp.bfloat16), csel,
        preferred_element_type=jnp.float32,
    )                                                            # (N, C, P, P)
