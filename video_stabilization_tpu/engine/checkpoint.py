"""Checkpoint / resume for the engine carry.

The reference has no persistence at all (SURVEY.md §5.4) — its state dies
with the Stabilizer instance.  Here the carry is already an explicit pytree
of arrays, so checkpointing is a flat serialization: every leaf to one
``.npz`` entry, restored onto device with the same treedef.  Works for
single-stream, vmapped multi-stream, and (leaves re-sharded by the caller)
mesh-sharded carries.
"""

from __future__ import annotations

import io
import json
from typing import Any

import jax
import numpy as np

from video_stabilization_tpu.engine.state import EngineCarry


def save_carry(path: str, carry: EngineCarry) -> None:
    """Serialize a carry pytree to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(carry)
    arrays = {}
    meta = []
    for i, leaf in enumerate(leaves):
        if hasattr(leaf, "dtype") and "key" in str(leaf.dtype):
            # typed PRNG keys serialize via their raw uint32 data
            arrays[f"leaf_{i}"] = np.asarray(jax.random.key_data(leaf))
            meta.append("prng_key")
        else:
            arrays[f"leaf_{i}"] = np.asarray(leaf)
            meta.append("array")
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def load_carry(path: str, template: EngineCarry) -> EngineCarry:
    """Restore a carry saved by :func:`save_carry`.

    ``template`` (e.g. a fresh ``init_carry``) provides the treedef and
    target shapes; shape mismatches (different config) raise.
    """
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    t_leaves, treedef = jax.tree.flatten(template)
    leaves = []
    for i, (kind, t_leaf) in enumerate(zip(meta, t_leaves)):
        arr = data[f"leaf_{i}"]
        if kind == "prng_key":
            leaves.append(jax.random.wrap_key_data(jax.numpy.asarray(arr)))
        else:
            if tuple(arr.shape) != tuple(t_leaf.shape):
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != "
                    f"config shape {tuple(t_leaf.shape)}"
                )
            leaves.append(jax.numpy.asarray(arr, t_leaf.dtype))
    return jax.tree.unflatten(treedef, leaves)
