"""Per-stage device timing of the fused step, from profiler traces.

The reference prints rolling per-kernel averages from inside its loop
(printTimings, src/stabilizer.cpp:982-1009).  The TPU engine runs the whole
frame as ONE fused XLA program, so per-stage times cannot be measured with
host clocks; instead:

1. ``stabilize_step`` wraps its stages in ``jax.named_scope("stage_*")``;
   the scopes flow into each HLO instruction's ``op_name`` metadata.
2. ``build_stage_map`` parses the *optimized* HLO of the compiled step and
   maps every top-level instruction (fusions included) to its stage.
3. ``profile_stages`` runs N live steps under ``jax.profiler.trace``, walks
   the device plane's "XLA Ops" events via ``jax.profiler.ProfileData``, and
   aggregates device-time by stage.

Device durations come from the hardware trace, so the numbers are correct
even when the host is contended — unlike wall-clock stage timing.
"""

from __future__ import annotations

import glob
import os
import re
import shutil
import tempfile
from typing import Callable, Dict, Iterable

# take the LAST (most deeply nested = most specific) stage scope on the op
_STAGE_RE = re.compile(r"op_name=\"[^\"]*(stage_[a-z0-9_]+)")
_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?(%?[\w.\-]+)\s*=")


def build_stage_map(hlo_text: str) -> Dict[str, str]:
    """Map top-level HLO instruction names -> stage_* labels.

    Uses each instruction's own ``metadata={op_name=...}``; for fusions
    whose metadata lacks a stage, falls back to the first stage found among
    the instructions of the called fused computation.
    """
    # split into computations: "%name (args) -> ... {" blocks
    comp_stage_hits: Dict[str, str] = {}
    instr_stage: Dict[str, str] = {}
    instr_calls: Dict[str, str] = {}
    current_comp = None
    in_entry = False
    entry_name = None
    m = re.search(r"ENTRY\s+(%?[\w.\-]+)", hlo_text)
    if m:
        entry_name = m.group(1)

    for line in hlo_text.splitlines():
        comp_m = re.match(r"\s*(?:ENTRY\s+)?(%?[\w.\-]+)\s*\([^)]*\)\s*->", line)
        if comp_m and "{" in line:
            current_comp = comp_m.group(1)
            in_entry = current_comp == entry_name
            continue
        im = _INSTR_RE.match(line)
        if not im:
            continue
        name = im.group(1)
        sm = _STAGE_RE.search(line)
        if sm and current_comp is not None and current_comp not in comp_stage_hits:
            comp_stage_hits[current_comp] = sm.group(1)
        if in_entry:
            if sm:
                instr_stage[name] = sm.group(1)
            cm = re.search(r"calls=(%?[\w.\-]+)", line)
            if cm:
                instr_calls[name] = cm.group(1)

    for name, callee in instr_calls.items():
        if name not in instr_stage and callee in comp_stage_hits:
            instr_stage[name] = comp_stage_hits[callee]
    return instr_stage


def _event_instr_name(ev_name: str) -> str:
    # trace event names look like "%fusion.8 = f32[...] fusion(...)" or
    # just "fusion.8"
    head = ev_name.split(" ", 1)[0].rstrip("=").strip()
    return head


def profile_stages(
    run_steps: Callable[[], None],
    hlo_text: str,
    tmp_root: str | None = None,
    n_calls: int = 1,
) -> Dict[str, float]:
    """Trace ``run_steps()`` and return per-stage device ms per call.

    Args:
      run_steps: runs ``n_calls`` step invocations and blocks on the result.
      hlo_text: optimized HLO of the compiled step (``compiled.as_text()``).
      n_calls: how many step calls run_steps performs (for averaging).

    Returns {stage: ms_per_call}, plus "total" and "other" entries.  Empty
    dict if no device plane was captured (e.g. pure-CPU interpret mode).
    """
    import jax

    stage_map = build_stage_map(hlo_text)
    tmpdir = tempfile.mkdtemp(prefix="stageprof_", dir=tmp_root)
    try:
        with jax.profiler.trace(tmpdir):
            run_steps()
        files = glob.glob(
            os.path.join(tmpdir, "**", "*.xplane.pb"), recursive=True
        )
        if not files:
            return {}
        pd = jax.profiler.ProfileData.from_file(files[0])
        totals: Dict[str, float] = {}
        grand = 0.0
        for plane in pd.planes:
            if not plane.name.startswith("/device:"):
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = _event_instr_name(ev.name)
                    dur_ms = (ev.duration_ns or 0.0) / 1e6
                    grand += dur_ms
                    stage = (
                        stage_map.get(name)
                        or stage_map.get(name.lstrip("%"))
                        or stage_map.get("%" + name.lstrip("%"))
                    )
                    key = stage if stage else "other"
                    totals[key] = totals.get(key, 0.0) + dur_ms
        if not totals:
            return {}
        totals["total"] = grand
        return {k: v / max(n_calls, 1) for k, v in totals.items()}
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


# reference printTimings taxonomy mapping (src/stabilizer.cpp:982-1009)
REFERENCE_TAXONOMY = {
    "stage_gftt": "goodFeaturesToTrack",
    "stage_lk": "calcOpticalFlowPyrLK",
    "stage_fit": "estimateAffinePartial2D",
    "stage_warp": "warpPerspective",
    "stage_gray_pyramid": "resize+cvtColor+pyramid",
    "stage_smoothing": "smoothing window",
    "stage_lock": "lock transform",
}


def format_taxonomy(stage_ms: Dict[str, float]) -> str:
    """One-line printTimings-style report from a profile_stages result.
    Sub-scopes (e.g. stage_lk_l3) aggregate into their parent taxon."""
    parts = []
    for key, label in REFERENCE_TAXONOMY.items():
        ms = sum(v for k, v in stage_ms.items() if k.startswith(key))
        if ms > 0.0:
            parts.append(f"{label}: {ms:.2f} ms")
    other = stage_ms.get("other", 0.0)
    total = stage_ms.get("total", 0.0)
    parts.append(f"other: {other:.2f} ms")
    parts.append(f"device total: {total:.2f} ms")
    return " | ".join(parts)
