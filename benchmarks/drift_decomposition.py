#!/usr/bin/env python
"""Controlled decomposition of the drift-vs-reference residual.

VERDICT r2 asked for a measured decomposition of `drift_vs_reference_px`
instead of magnitude arguments.  Three experiments on identical simulator
footage (bench config-1 geometry), each vs the OpenCV-CPU replica of the
reference pipeline:

A. **full**: the reference-compat engine as benchmarked (cv2exact GFTT +
   cv2exact LK + our RANSAC) — the number bench.py reports.
B. **cv2-corners injected**: same engine, but after every step the carry's
   corner list is overwritten with the corners cv2's pipeline detected on
   that frame — whatever drift remains cannot come from corner selection.
C. **RANSAC-only**: both estimators run on *identical* (src, dst, status)
   correspondence arrays taken from cv2's own GFTT+LK; per-frame transform
   disagreement (mean working-res corner displacement) between our
   vmapped-hypothesis RANSAC + de-scale and cv2.estimateAffinePartial2D +
   de-scale.  This bounds the estimator term alone.

Usage: python benchmarks/drift_decomposition.py [--frames 28]
Writes a JSON line; human summary on stderr.
"""

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(f"[drift] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=28)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--working", type=int, default=360)
    ap.add_argument("--past", type=int, default=30)
    ap.add_argument("--future", type=int, default=15)
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from bench import corner_drift, engine_config, make_footage
    from video_stabilization_tpu.config import (
        GFTTConfig, LKConfig, StabilizationMode,
    )
    from video_stabilization_tpu.engine import Stabilizer
    from video_stabilization_tpu.motion.homography import remove_isotropic_scale
    from video_stabilization_tpu.motion.ransac import estimate_similarity_ransac
    from video_stabilization_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    n = args.frames
    log(f"rendering {n} frames at {args.width}x{args.height}...")
    footage, _ = make_footage(n, args.height, args.width)
    frames_np = [np.asarray(f) for f in footage]

    wh = args.working
    ww = int(round(args.width * wh / args.height))
    scale = wh / args.height
    center = np.array([ww / 2.0, wh / 2.0])

    # ---- OpenCV replica, collecting corners / tracks / transforms ----------
    log("OpenCV replica (collecting per-frame corners and tracks)...")
    import collections

    transforms = collections.deque(maxlen=args.past + args.future)
    prev_gray = prev_pts = None
    hs_cv = []
    cv_corners = []          # corners detected on frame i (cv2 GFTT)
    cv_pairs = []            # (src, dst, status) of the i-1 -> i track
    for frame in frames_np:
        small = cv2.resize(frame, (ww, wh), interpolation=cv2.INTER_LINEAR)
        gray = cv2.cvtColor(small, cv2.COLOR_BGR2GRAY)
        t_new = np.eye(3)
        if prev_gray is not None and prev_pts is not None and len(prev_pts) >= 10:
            nxt, st, _ = cv2.calcOpticalFlowPyrLK(
                prev_gray, gray, prev_pts, None, winSize=(21, 21), maxLevel=3,
                criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS,
                          50, 0.01),
                minEigThreshold=1e-4,
            )
            good = st.reshape(-1).astype(bool)
            cv_pairs.append((prev_pts.reshape(-1, 2).copy(),
                             nxt.reshape(-1, 2).copy(), good.copy()))
            if good.sum() >= 10:
                m, _ = cv2.estimateAffinePartial2D(
                    prev_pts.reshape(-1, 2)[good], nxt.reshape(-1, 2)[good],
                    method=cv2.RANSAC,
                )
                if m is not None and np.isfinite(m).all():
                    t_new = np.vstack([m, [0, 0, 1]])
                    a = t_new[:2, :2]
                    s = np.sqrt(max(np.linalg.det(a), 1e-9))
                    r = a / s
                    t = (t_new[:2, 2] + (np.eye(2) - a) @ center
                         - (np.eye(2) - r) @ center)
                    t_new = np.eye(3)
                    t_new[:2, :2] = r
                    t_new[:2, 2] = t
        transforms.append(t_new)
        p = max(0, len(transforms) - args.future - 1)
        h_avg = np.zeros((3, 3))
        count = 0
        acc = np.eye(3)
        for i in range(p, 0, -1):
            acc = np.linalg.inv(transforms[i - 1]) @ acc
            h_avg += acc
            count += 1
        acc = np.eye(3)
        for i in range(p, len(transforms) - 1):
            acc = acc @ transforms[i]
            h_avg += acc
            count += 1
        hs_cv.append(h_avg / count if count else np.eye(3))
        prev_pts = cv2.goodFeaturesToTrack(
            gray, maxCorners=1300, qualityLevel=0.01,
            minDistance=10 * wh / 720.0, mask=None, blockSize=3)
        cv_corners.append(prev_pts.reshape(-1, 2).copy())
        prev_gray = gray

    # ---- engine config: full reference-compat --------------------------------
    cfg = engine_config(args.height, args.width, wh, args.past, args.future,
                        compat=True)
    cfg = dataclasses.replace(
        cfg,
        lk=LKConfig(method="cv2exact"),
        gftt=GFTTConfig(max_features=1300, selection="cv2exact"),
    )

    def run_engine(inject_corners):
        stab = Stabilizer(cfg, StabilizationMode.GLOBAL_SMOOTHING, seed=0)
        hs = []
        for i in range(n):
            stab.stabilize_frame(footage[i])
            if inject_corners:
                pts = cv_corners[i]
                cap = cfg.gftt.max_features
                buf = np.zeros((cap, 2), np.float32)
                msk = np.zeros((cap,), bool)
                buf[: len(pts)] = pts[:cap]
                msk[: len(pts)] = True
                stab.carry = stab.carry._replace(
                    corners_prev=jnp.asarray(buf),
                    corners_mask=jnp.asarray(msk),
                )
            hs.append(np.asarray(stab.carry.last_h, np.float64))
        return hs

    log("experiment A: full compat engine...")
    t0 = time.perf_counter()
    hs_full = run_engine(inject_corners=False)
    log(f"  ({time.perf_counter() - t0:.0f}s)")
    drift_full = corner_drift(hs_full, hs_cv, ww, wh)

    log("experiment B: cv2 corners injected...")
    hs_inj = run_engine(inject_corners=True)
    drift_inj = corner_drift(hs_inj, hs_cv, ww, wh)

    # ---- experiment C: estimator-only on identical correspondences ----------
    log("experiment C: RANSAC-only on cv2's own correspondences...")
    fit = jax.jit(
        lambda s, d, m, k: estimate_similarity_ransac(s, d, m, k, cfg.ransac)
    )
    centerj = jnp.asarray(center, jnp.float32)
    corners_px = np.array(
        [[0, 0, 1], [ww, 0, 1], [ww, wh, 1], [0, wh, 1]], float
    ).T
    per_frame = []
    ours_seq = []
    cv_seq = []
    for fi, (src, dst, st) in enumerate(cv_pairs):
        cap = 1536
        s = np.zeros((cap, 2), np.float32)
        d = np.zeros((cap, 2), np.float32)
        m = np.zeros((cap,), bool)
        k = min(len(src), cap)
        s[:k], d[:k], m[:k] = src[:k], dst[:k], st[:k]
        res = fit(jnp.asarray(s), jnp.asarray(d), jnp.asarray(m),
                  jax.random.key(fi))
        h_ours, _ = remove_isotropic_scale(res.h, centerj)
        h_ours = np.asarray(h_ours, np.float64)
        # cv2 estimator on the same arrays
        t_cv = np.eye(3)
        if st.sum() >= 10:
            mm, _ = cv2.estimateAffinePartial2D(src[st], dst[st],
                                                method=cv2.RANSAC)
            if mm is not None and np.isfinite(mm).all():
                t_cv = np.vstack([mm, [0, 0, 1]])
                a = t_cv[:2, :2]
                sc = np.sqrt(max(np.linalg.det(a), 1e-9))
                r = a / sc
                t = (t_cv[:2, 2] + (np.eye(2) - a) @ center
                     - (np.eye(2) - r) @ center)
                t_cv = np.eye(3)
                t_cv[:2, :2] = r
                t_cv[:2, 2] = t
        ours_seq.append(h_ours)
        cv_seq.append(t_cv)
        pa = h_ours @ corners_px
        pb = t_cv @ corners_px
        per_frame.append(np.abs(pa[:2] / pa[2] - pb[:2] / pb[2]).mean())
    ransac_per_frame = float(np.mean(per_frame))

    out = {
        "metric": "drift decomposition vs OpenCV replica (px, working res)",
        "frames": n,
        "drift_full_compat": round(drift_full, 4),
        "drift_cv2_corners_injected": round(drift_inj, 4),
        "ransac_only_per_frame_px": round(ransac_per_frame, 5),
        "note": (
            "full = bench drift gate; injected closes the GFTT term; "
            "ransac_only = per-frame transform disagreement of the two "
            "estimators on identical cv2 correspondences"
        ),
    }
    log(f"full={drift_full:.4f}px  injected={drift_inj:.4f}px  "
        f"ransac-only={ransac_per_frame:.5f}px/frame")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
