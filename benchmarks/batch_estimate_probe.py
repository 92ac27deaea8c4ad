#!/usr/bin/env python
"""Probe: does batching the per-pair estimate stage over frames pay on TPU?

Times the full estimate stage (gray -> pyramid -> GFTT -> dense LK ->
RANSAC) as (a) one frame pair per dispatch, sequentially, and (b) one
vmapped dispatch over a batch of B pairs — the design question behind the
offline throughput pipeline (round-3 item 1).

Usage: python benchmarks/batch_estimate_probe.py [--batch 8] [--height 360]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--frame-height", type=int, default=360)
    ap.add_argument("--frame-width", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from video_stabilization_tpu.config import StabilizerConfig
    from video_stabilization_tpu.motion.ransac import estimate_similarity_ransac
    from video_stabilization_tpu.ops.gftt import good_features_to_track
    from video_stabilization_tpu.ops.image import bgr_to_gray, resize_bilinear
    from video_stabilization_tpu.ops.lk import lk_track
    from video_stabilization_tpu.ops.pyramid import build_pyramid
    from video_stabilization_tpu.utils.timing import enable_compile_cache, honest_time

    enable_compile_cache()
    cfg = StabilizerConfig(
        past_frames=30, future_frames=15, working_height=args.height,
        frame_height=args.frame_height, frame_width=args.frame_width,
    )
    wh, ww = cfg.working_size
    print(f"devices: {jax.devices()}  frame {args.frame_width}x{args.frame_height} "
          f"working {ww}x{wh}  batch {args.batch}", file=sys.stderr)

    key = jax.random.key(0)
    b = args.batch
    frames = jax.random.randint(
        key, (b + 1, args.frame_height, args.frame_width, 3), 0, 255, jnp.uint8)

    def estimate_pair(f_prev, f_next, k):
        g0 = resize_bilinear(bgr_to_gray(f_prev), wh, ww)
        g1 = resize_bilinear(bgr_to_gray(f_next), wh, ww)
        p0 = build_pyramid(g0, cfg.lk.pyramid_levels)
        p1 = build_pyramid(g1, cfg.lk.pyramid_levels)
        c = good_features_to_track(g0, cfg.gftt)
        tr = lk_track(p0, p1, c.points, c.mask, cfg.lk)
        res = estimate_similarity_ransac(c.points, tr.points, tr.status, k, cfg.ransac)
        return res.h

    one = jax.jit(estimate_pair)
    vmany = jax.jit(jax.vmap(estimate_pair))

    k1 = jax.random.key(1)
    kb = jax.random.split(k1, b)

    # sequential: b dispatches per "iteration"
    def seq(f, k):
        outs = []
        for i in range(b):
            outs.append(one(f[i], f[i + 1], k[i]))
        return jnp.stack(outs)

    t_seq = honest_time(seq, frames, kb, iters=args.iters, warmup=2)
    t_bat = honest_time(vmany, frames[:-1], frames[1:], kb,
                        iters=args.iters, warmup=2)
    print(f"sequential: {t_seq:8.2f} ms total ({t_seq / b:6.2f} ms/pair)")
    print(f"batched   : {t_bat:8.2f} ms total ({t_bat / b:6.2f} ms/pair)")
    print(f"speedup   : {t_seq / t_bat:6.2f}x")

    # per-stage batched breakdown
    def stage(name, fn, *xs):
        ms = honest_time(jax.jit(fn), *xs, iters=args.iters, warmup=2)
        print(f"  batched {name:24s} {ms:8.2f} ms ({ms / b:6.3f} ms/pair)")
        return ms

    grayf = jax.jit(jax.vmap(lambda f: resize_bilinear(bgr_to_gray(f), wh, ww)))
    gs = grayf(frames)
    pyrf = jax.jit(jax.vmap(lambda g: build_pyramid(g, cfg.lk.pyramid_levels)))
    ps = pyrf(gs)
    cf = jax.jit(jax.vmap(lambda g: good_features_to_track(g, cfg.gftt)))
    cs = cf(gs)
    lkf = jax.jit(jax.vmap(lambda pa, pb, p, m: lk_track(pa, pb, p, m, cfg.lk)))
    p_prev = jax.tree.map(lambda x: x[:-1], ps)
    p_next = jax.tree.map(lambda x: x[1:], ps)
    trs = lkf(p_prev, p_next, cs.points[:-1], cs.mask[:-1])
    rf = jax.jit(jax.vmap(
        lambda a, bb, m, k: estimate_similarity_ransac(a, bb, m, k, cfg.ransac)))

    stage("gray+resize", jax.vmap(lambda f: resize_bilinear(bgr_to_gray(f), wh, ww)), frames)
    stage("pyramid", jax.vmap(lambda g: build_pyramid(g, cfg.lk.pyramid_levels)), gs)
    stage("gftt", jax.vmap(lambda g: good_features_to_track(g, cfg.gftt)), gs)
    stage("lk_dense", jax.vmap(lambda pa, pb, p, m: lk_track(pa, pb, p, m, cfg.lk)),
          p_prev, p_next, cs.points[:-1], cs.mask[:-1])
    stage("ransac", jax.vmap(
        lambda a, bb, m, k: estimate_similarity_ransac(a, bb, m, k, cfg.ransac)),
        cs.points[:-1], trs.points, trs.status, kb[: b])


if __name__ == "__main__":
    main()
