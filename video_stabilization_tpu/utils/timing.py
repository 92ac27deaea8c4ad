"""Trustworthy on-device timing + the engine's stage-timer observability.

The reference instruments its four hot kernels with rolling-average
wall-clock timers (src/stabilizer.cpp:982-1009, include/stabilizer.hpp:
461-469).  The TPU equivalent must contend with asynchronous dispatch — and
on this environment's relay runtime, ``jax.block_until_ready`` can return
before execution truly finishes, so every measurement here ends with a host
fetch of an on-device scalar reduction: the only reliable completion barrier
(see bench.py notes).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp


def _checksum(tree: Any) -> float:
    """Reduce an arbitrary pytree of arrays to one host float, forcing true
    completion of the computation that produced it."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    total = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        total = total + jnp.sum(leaf.astype(jnp.float32))
    return float(total)


def honest_time(fn: Callable, *args, iters: int = 5, warmup: int = 1) -> float:
    """Milliseconds per call of ``fn(*args)``, measured with a forced fetch.

    The per-iteration outputs are checksummed on device and a single scalar
    is fetched after all iterations, so the relay round-trip (~27 ms) is
    amortized across ``iters``.
    """
    for _ in range(warmup):
        _checksum(fn(*args))
    t0 = time.perf_counter()
    total = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        out = fn(*args)
        leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
        for leaf in leaves:
            total = total + jnp.sum(leaf.astype(jnp.float32))
    float(total)
    return (time.perf_counter() - t0) / iters * 1000.0


class StageTimer:
    """Host-side rolling-average stage timer mirroring the reference's
    printTimings taxonomy (GFTT / LK / motion estimation / warp).

    Because the per-frame step is one fused program, per-stage on-device
    times are obtained by running the stage sub-functions standalone via
    :func:`honest_time`; at app level this timer tracks whole-step wall time
    with the same rolling-average update rule the reference uses
    (avg += (x - avg) / n, src/stabilizer.cpp:196-199).
    """

    def __init__(self) -> None:
        self._avg: Dict[str, float] = {}
        self._count: Dict[str, int] = {}
        self._last_print = time.perf_counter()
        self.print_interval_s = 1.0

    def record(self, stage: str, ms: float) -> None:
        n = self._count.get(stage, 0) + 1
        avg = self._avg.get(stage, 0.0)
        self._avg[stage] = avg + (ms - avg) / n
        self._count[stage] = n

    def averages(self) -> Dict[str, float]:
        return dict(self._avg)

    def maybe_print(self, out=None) -> None:
        now = time.perf_counter()
        if now - self._last_print < self.print_interval_s:
            return
        self._last_print = now
        parts = [f"{k}: {v:.2f} ms (n={self._count[k]})" for k, v in self._avg.items()]
        msg = "[timings] " + "; ".join(parts)
        print(msg, file=out)


def enable_compile_cache(path: str = "/root/.cache/vstab_jax_cache") -> None:
    """Enable JAX's persistent compilation cache.

    The full engine step with all lock branches compiles for minutes on the
    remote-compile TPU path; the on-disk cache makes every later process
    start instantly for the same config.

    On the CPU backend the cache is left READ-ONLY: PJRT:CPU's
    ``executable.serialize()`` CHECK-aborts the whole process for some
    engine-step programs (reproduced three times at
    ``compilation_cache.put_executable_and_time`` — see docs/roadmap.md).
    TPU executables serialize fine, and they are the ones worth persisting.
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        on_cpu = jax.default_backend() == "cpu"
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            1e9 if on_cpu else 1.0,
        )
    except Exception:
        pass


def profiler_trace(log_dir: str = "/tmp/vstab_trace"):
    """Context manager: capture a JAX profiler trace of the enclosed work.

    The TPU-side replacement for the reference's rolling wall-clock timers
    (src/stabilizer.cpp:982-1009): open the resulting trace in
    TensorBoard/Perfetto to see per-fusion device timings of the step.
    """
    import jax

    return jax.profiler.trace(log_dir)
