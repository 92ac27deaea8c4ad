#!/usr/bin/env python
"""Op-level breakdown of the offline pipeline's unattributed ("other")
device time: prints the top-N individual XLA ops that carry no stage_*
scope, with their HLO one-liner for identification.

Usage: python benchmarks/profile_other_ops.py [--config 2] [--chunk 16]
"""

import argparse
import glob
import os
import re
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

GEOM = {
    1: dict(h=1080, w=1920, working=360),
    2: dict(h=360, w=640, working=360),
    3: dict(h=720, w=1280, working=360),
    4: dict(h=1080, w=1920, working=360),
}
MODE = {1: "GLOBAL_SMOOTHING", 2: "ACCUMULATED_FULL_LOCK",
        3: "ORB_FULL_LOCK", 4: "SIFT_FULL_LOCK"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--calls", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--streaming", action="store_true")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from video_stabilization_tpu.config import (
        ECCConfig, StabilizationMode, StabilizerConfig,
    )
    from video_stabilization_tpu.utils.stage_profile import (
        _event_instr_name, build_stage_map,
    )
    from video_stabilization_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    g = GEOM[args.config]
    mode = StabilizationMode[MODE[args.config]]
    cfg = StabilizerConfig(
        past_frames=30, future_frames=15, working_height=g["working"],
        frame_height=g["h"], frame_width=g["w"],
        ecc=ECCConfig(enabled=(args.config == 4), max_iters=30),
    )
    key = jax.random.key(0)
    frame = jax.random.randint(key, (g["h"], g["w"], 3), 0, 255, jnp.uint8)

    cfg = dataclasses.replace(cfg, static_mode=int(mode))
    if args.streaming:
        from video_stabilization_tpu.engine import init_carry, make_step_fn

        fn = make_step_fn(cfg)
        carry = init_carry(cfg, int(mode), key)
        feed = frame
    else:
        from video_stabilization_tpu.engine import init_carry, make_offline_fn

        fn = make_offline_fn(cfg)
        carry = init_carry(cfg, int(mode), key)
        feed = jnp.broadcast_to(frame, (args.chunk,) + frame.shape)

    carry, (out, _) = fn(carry, feed)
    jax.block_until_ready(out)
    hlo = fn.lower(carry, feed).compile().as_text()
    stage_map = build_stage_map(hlo)

    # index HLO entry lines by instruction name for display
    hlo_lines = {}
    for line in hlo.splitlines():
        m = re.match(r"^\s*(?:ROOT\s+)?(%?[\w.\-]+)\s*=", line)
        if m:
            hlo_lines[m.group(1).lstrip("%")] = line.strip()

    tmpdir = tempfile.mkdtemp(prefix="otherprof_")
    try:
        with jax.profiler.trace(tmpdir):
            c = carry
            for _ in range(args.calls):
                c, (out, _) = fn(c, feed)
            jax.block_until_ready(out)
        files = glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"),
                          recursive=True)
        pd = jax.profiler.ProfileData.from_file(files[0])
        per_op = {}
        for plane in pd.planes:
            if not plane.name.startswith("/device:"):
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = _event_instr_name(ev.name).lstrip("%")
                    per_op[name] = per_op.get(name, 0.0) + (
                        ev.duration_ns or 0.0) / 1e6
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)

    rows = []
    for name, ms in per_op.items():
        stage = (stage_map.get(name) or stage_map.get("%" + name))
        if stage is None:
            rows.append((ms / args.calls, name))
    rows.sort(reverse=True)
    total_other = sum(r[0] for r in rows)
    print(f"unattributed device time: {total_other:.3f} ms/call over "
          f"{len(rows)} ops; top {args.top}:")
    for ms, name in rows[: args.top]:
        line = hlo_lines.get(name, "")[:180]
        print(f"  {ms:8.3f} ms  {name}")
        if line:
            print(f"            {line}")


if __name__ == "__main__":
    main()
