#!/usr/bin/env python
"""Per-stage DEVICE times of the fused streaming step, via xplane traces.

Unlike benchmarks/profile_stages.py (standalone per-kernel wall timings),
this attributes the real fused step's device time to the stage_* named
scopes — valid even when the host is contended.

Usage: python benchmarks/profile_step_stages.py [--config 2] [--calls 12]
"""

import argparse
import sys

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
    ap.add_argument("--calls", type=int, default=12)
    ap.add_argument("--offline", action="store_true",
                    help="profile the offline chunked pipeline instead")
    ap.add_argument("--chunk", type=int, default=16)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from video_stabilization_tpu.config import (
        ECCConfig, StabilizationMode, StabilizerConfig,
    )
    from video_stabilization_tpu.utils.stage_profile import profile_stages
    from video_stabilization_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    g = GEOM[args.config]
    mode = StabilizationMode[MODE[args.config]]
    cfg = StabilizerConfig(
        past_frames=30, future_frames=15, working_height=g["working"],
        frame_height=g["h"], frame_width=g["w"],
        ecc=ECCConfig(enabled=(args.config == 4), max_iters=30),
    )
    print(f"devices: {jax.devices()}", file=sys.stderr)

    key = jax.random.key(0)
    frame = jax.random.randint(key, (g["h"], g["w"], 3), 0, 255, jnp.uint8)

    if args.offline:
        from video_stabilization_tpu.engine import init_carry, make_offline_fn

        cfg = dataclasses.replace(cfg, static_mode=int(mode))
        fn = make_offline_fn(cfg)
        carry = init_carry(cfg, int(mode), key)
        frames = jnp.broadcast_to(frame, (args.chunk,) + frame.shape)
        carry, (out, _) = fn(carry, frames)          # compile + warm
        float(jnp.sum(out[-1].astype(jnp.float32)))
        compiled = fn.lower(carry, frames).compile()
        hlo = compiled.as_text()

        state = {"carry": carry}

        def run_steps():
            c = state["carry"]
            out = None
            for _ in range(args.calls):
                c, (out, _) = fn(c, frames)
            float(jnp.sum(out[-1].astype(jnp.float32)))
            state["carry"] = c

        per_call = args.calls
        denom = args.chunk
    else:
        from video_stabilization_tpu.engine import init_carry, make_step_fn

        fn = make_step_fn(cfg)
        carry = init_carry(cfg, int(mode), key)
        carry, (out, _) = fn(carry, frame)           # compile + warm
        float(jnp.sum(out.astype(jnp.float32)))
        compiled = fn.lower(carry, frame).compile()
        hlo = compiled.as_text()

        state = {"carry": carry}

        def run_steps():
            c = state["carry"]
            out = None
            for _ in range(args.calls):
                c, (out, _) = fn(c, frame)
            float(jnp.sum(out.astype(jnp.float32)))
            state["carry"] = c

        per_call = args.calls
        denom = 1

    stage_ms = profile_stages(run_steps, hlo, n_calls=per_call)
    if not stage_ms:
        print("no device trace captured", file=sys.stderr)
        return
    print(f"config {args.config} ({'offline chunk %d' % args.chunk if args.offline else 'streaming'}), per-{'chunk' if args.offline else 'step'} device ms:")
    for k in sorted(stage_ms, key=lambda k: -stage_ms[k]):
        ms = stage_ms[k]
        per_frame = ms / denom
        print(f"  {k:26s} {ms:8.3f} ms" +
              (f"  ({per_frame:6.3f} /frame)" if denom > 1 else ""))


if __name__ == "__main__":
    main()
