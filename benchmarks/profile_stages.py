#!/usr/bin/env python
"""Per-stage honest timings of the engine hot path on the real TPU.

Runs each pipeline stage standalone (jitted, forced-checksum completion,
amortized fetch — see utils/timing.honest_time) plus the fused step, at the
BASELINE config-1 geometry (1080p frames, working height 360).

Usage: python benchmarks/profile_stages.py [--iters 20]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--working", type=int, default=360)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from video_stabilization_tpu.config import StabilizationMode, StabilizerConfig
    from video_stabilization_tpu.engine.stabilizer import make_step_fn
    from video_stabilization_tpu.engine.state import init_carry
    from video_stabilization_tpu.motion.ransac import estimate_similarity_ransac
    from video_stabilization_tpu.ops.gftt import good_features_to_track
    from video_stabilization_tpu.ops.image import bgr_to_gray, resize_bilinear
    from video_stabilization_tpu.ops.lk import lk_track
    from video_stabilization_tpu.ops.pyramid import build_pyramid
    from video_stabilization_tpu.ops.warp import warp_affine_shear, warp_perspective
    from video_stabilization_tpu.utils.timing import enable_compile_cache, honest_time

    enable_compile_cache()
    cfg = StabilizerConfig(
        past_frames=30, future_frames=15, working_height=args.working,
        frame_height=args.height, frame_width=args.width,
    )
    wh, ww = cfg.working_size
    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(f"frame {args.width}x{args.height}, working {ww}x{wh}", file=sys.stderr)

    key = jax.random.key(0)
    frame = jax.random.randint(key, (args.height, args.width, 3), 0, 255, jnp.uint8)
    gray = jax.jit(lambda f: resize_bilinear(bgr_to_gray(f), wh, ww))(frame)
    pyr_fn = jax.jit(lambda g: build_pyramid(g, cfg.lk.pyramid_levels))
    pyr = pyr_fn(gray)
    pyr2 = pyr_fn(gray + 1.0)
    corners_fn = jax.jit(lambda g: good_features_to_track(g, cfg.gftt))
    corners = corners_fn(gray)
    lk_fn = jax.jit(lambda pa, pb, p, m: lk_track(pa, pb, p, m, cfg.lk))
    tracked = lk_fn(pyr, pyr2, corners.points, corners.mask)
    ransac_fn = jax.jit(
        lambda a, b, m, k: estimate_similarity_ransac(a, b, m, k, cfg.ransac)
    )
    h_small = jnp.eye(3) + 1e-3
    framef = frame.astype(jnp.float32)
    shear_fn = jax.jit(lambda f, h: warp_affine_shear(f, h, 127.0))
    proj_fn = jax.jit(lambda f, h: warp_perspective(f, h, None, 127.0))

    step = make_step_fn(cfg)
    carry = init_carry(cfg, int(StabilizationMode.GLOBAL_SMOOTHING), key)

    stages = {}

    def t(name, fn, *xs, iters=args.iters):
        ms = honest_time(fn, *xs, iters=iters, warmup=2)
        stages[name] = ms
        print(f"{name:30s} {ms:8.2f} ms", flush=True)

    # order: fused step FIRST (before anything pollutes), then stages
    t0 = time.perf_counter()
    # one compile pass for the step (may be cached)
    carry2, (out, _) = step(carry, frame)
    float(jnp.sum(out.astype(jnp.float32)))
    print(f"step compile+run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def step_only(c, f):
        c2, (o, v) = step(c, f)
        return o

    # NOTE: step donates its carry; time it with a fresh carry per call is
    # impossible without realloc — instead loop carry through (realistic).
    def step_loop(c, f, n):
        for _ in range(n):
            c, (o, v) = step(c, f)
        return c, o

    for _ in range(2):
        carry2, out = step_loop(carry2, frame, 1)
    n_loop = args.iters
    tstart = time.perf_counter()
    carry2, out = step_loop(carry2, frame, n_loop)
    float(jnp.sum(out.astype(jnp.float32)))
    stages["fused_step"] = (time.perf_counter() - tstart) / n_loop * 1000.0
    print(f"{'fused_step':30s} {stages['fused_step']:8.2f} ms", flush=True)

    t("gray+resize(1080p->360)", jax.jit(lambda f: resize_bilinear(bgr_to_gray(f), wh, ww)), frame)
    t("pyramid(360p,3lv)", pyr_fn, gray)
    t("gftt(360p)", corners_fn, gray)
    t("lk(1300pts)", lk_fn, pyr, pyr2, corners.points, corners.mask)
    t("ransac(512hyp)", ransac_fn, corners.points, tracked.points, tracked.status,
      jax.random.key(1))
    t("warp_shear(1080p)", shear_fn, framef, h_small)
    t("warp_projective(1080p)", proj_fn, framef, h_small)

    total = sum(v for k, v in stages.items() if k != "fused_step" and "projective" not in k)
    print(f"{'sum of stages':30s} {total:8.2f} ms")
    print(f"{'fused step':30s} {stages['fused_step']:8.2f} ms")


if __name__ == "__main__":
    main()
