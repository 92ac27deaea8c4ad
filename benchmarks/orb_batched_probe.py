#!/usr/bin/env python
"""Probe: per-stage cost of the batched ORB registration path (config 3's
dominant cost).  Times vmapped preprocess / FAST detect / describe / match
separately on a K-frame batch at working res.

Usage: python benchmarks/orb_batched_probe.py [--batch 8]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from video_stabilization_tpu.config import StabilizerConfig
    from video_stabilization_tpu.ops.filters import preprocess_for_registration
    from video_stabilization_tpu.ops.match import match_hamming_knn
    from video_stabilization_tpu.ops.orb import orb_detect_and_compute
    from video_stabilization_tpu.utils.timing import enable_compile_cache, honest_time

    enable_compile_cache()
    cfg = StabilizerConfig(
        past_frames=30, future_frames=15, working_height=360,
        frame_height=720, frame_width=1280,
    )
    wh, ww = cfg.working_size
    b = args.batch
    key = jax.random.key(0)
    grays = jax.random.uniform(key, (b, wh, ww), jnp.float32) * 255.0

    def stage(name, fn, *xs):
        ms = honest_time(jax.jit(fn), *xs, iters=args.iters, warmup=2)
        print(f"  batched {name:22s} {ms:8.2f} ms ({ms / b:6.3f} ms/frame)")
        return ms

    pre = jax.jit(jax.vmap(lambda g: preprocess_for_registration(
        g, cfg.preprocess.clahe_clip_limit, cfg.preprocess.clahe_tiles,
        cfg.preprocess.median_ksize)))
    procs = pre(grays)
    jax.block_until_ready(procs)

    det = jax.jit(jax.vmap(lambda g: orb_detect_and_compute(g, cfg.orb)))
    feats = det(procs)
    jax.block_until_ready(feats.points)

    print(f"devices: {jax.devices()}  batch {b}  working {ww}x{wh}")
    stage("preprocess", jax.vmap(lambda g: preprocess_for_registration(
        g, cfg.preprocess.clahe_clip_limit, cfg.preprocess.clahe_tiles,
        cfg.preprocess.median_ksize)), grays)
    stage("orb detect+describe", jax.vmap(
        lambda g: orb_detect_and_compute(g, cfg.orb)), procs)
    stage("match knn", jax.vmap(
        lambda d, m: match_hamming_knn(feats.desc[0], feats.mask[0], d, m,
                                       cfg.orb.lowe_ratio)),
        feats.desc, feats.mask)

    # ORB sub-stages
    from video_stabilization_tpu.ops import orb as orbmod
    from video_stabilization_tpu.ops.fast import fast_score

    stage("fast score", jax.vmap(lambda g: fast_score(
        g, cfg.orb.fast_threshold)[0]), procs)
    budgets = orbmod._level_budgets(
        cfg.orb.max_features, cfg.orb.n_levels, cfg.orb.scale_factor)
    stage("detect level0", jax.vmap(lambda g: orbmod._detect_level(
        g, budgets[0], cfg.orb.fast_threshold, cfg.orb.edge_threshold)[0]),
        procs)
    det0 = jax.jit(jax.vmap(lambda g: orbmod._detect_level(
        g, budgets[0], cfg.orb.fast_threshold, cfg.orb.edge_threshold)))
    pts0, resp0, msk0 = det0(procs)
    blur = jax.jit(jax.vmap(orbmod._gauss7))(procs)
    stage("gauss7", jax.vmap(orbmod._gauss7), procs)
    stage("orient+describe l0", jax.vmap(
        lambda g, bl, p, m: orbmod._orient_and_describe(
            g, bl, p, m, cfg.orb.pattern)),
        procs, blur, pts0, msk0)


if __name__ == "__main__":
    main()
