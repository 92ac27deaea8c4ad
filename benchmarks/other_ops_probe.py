#!/usr/bin/env python
"""List the top unattributed ("other") HLO ops by device time for a config's
offline chunked step — finds what hides outside the stage_* named scopes.

Usage: python benchmarks/other_ops_probe.py [--config 2] [--chunk 16]
"""

import argparse
import glob
import os
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
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from video_stabilization_tpu.config import (
        ECCConfig, StabilizationMode, StabilizerConfig,
    )
    from video_stabilization_tpu.engine import init_carry, make_offline_fn
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
        static_mode=int(mode),
    )
    key = jax.random.key(0)
    frame = jax.random.randint(key, (g["h"], g["w"], 3), 0, 255, jnp.uint8)
    fn = make_offline_fn(cfg)
    carry = init_carry(cfg, int(mode), key)
    frames = jnp.broadcast_to(frame, (args.chunk,) + frame.shape)
    carry, (out, _) = fn(carry, frames)
    float(jnp.sum(out[-1].astype(jnp.float32)))
    compiled = fn.lower(carry, frames).compile()
    hlo = compiled.as_text()
    stage_map = build_stage_map(hlo)

    # map instr name -> its full HLO definition line (shapes tell the story)
    defs = {}
    import re
    instr_re = re.compile(r"^\s*(?:ROOT\s+)?(%?[\w.\-]+)\s*=")
    for line in hlo.splitlines():
        m = instr_re.match(line)
        if m:
            defs[m.group(1).lstrip("%")] = line.strip()[:220]

    tmpdir = tempfile.mkdtemp(prefix="otherprobe_")
    state = {"carry": carry}
    with jax.profiler.trace(tmpdir):
        c = state["carry"]
        for _ in range(args.calls):
            c, (out, _) = fn(c, frames)
        float(jnp.sum(out[-1].astype(jnp.float32)))
    files = glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"), recursive=True)
    pd = jax.profiler.ProfileData.from_file(files[0])
    other = {}
    for plane in pd.planes:
        if not plane.name.startswith("/device:"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = _event_instr_name(ev.name)
                stage = (stage_map.get(name) or stage_map.get(name.lstrip("%"))
                         or stage_map.get("%" + name.lstrip("%")))
                if stage:
                    continue
                other[name] = other.get(name, 0.0) + (ev.duration_ns or 0) / 1e6
    total = sum(other.values()) / args.calls
    print(f"config {args.config} offline chunk {args.chunk}: "
          f"'other' total {total:.3f} ms/chunk "
          f"({total / args.chunk:.3f} /frame)")
    for name, ms in sorted(other.items(), key=lambda kv: -kv[1])[: args.top]:
        per = ms / args.calls
        d = defs.get(name.lstrip("%"), "")
        print(f"  {per:8.3f} ms  {name:24s} {d[:150]}")


if __name__ == "__main__":
    main()
