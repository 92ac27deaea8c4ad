#!/usr/bin/env python
"""Benchmarks: TPU engine vs OpenCV-CPU reference pipeline, 5 configs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
selected config (default 1 — the driver's headline number), plus extra keys
(p50 latency, corner drift for config 1).

BASELINE.json configs:
  1. simulator + global smoothing, working 360, 1080p frames
  2. accumulated LK optical-flow full-motion lock, 360p frames
  3. ORB registration lock, 720p frames
  4. SIFT registration lock + ECC enabled, 1080p frames
  5. batched 8-stream 1080p, translation/rotation-lock decomposition

The reference publishes no numbers (BASELINE.md), so the baseline is
measured here: a faithful OpenCV replica of the per-frame hot path with the
reference's hyperparameters.

Measurement notes for this environment's TPU relay (see
.claude/skills/verify/SKILL.md): block_until_ready can return early, so all
timings end with a host fetch of an on-device scalar checksum; no frame is
fetched to host while timing.
"""

import argparse
import json
import sys
import time

import numpy as np


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def make_footage(n_frames, height, width, n_streams=1):
    """Render simulator footage ON DEVICE and leave it there (no host fetch:
    the first D2H flips the relay into slow synchronous dispatch).

    Returns (streams, trajectory-of-stream-0) — the trajectory yields
    analytic ground-truth homographies for fidelity metrics."""
    import jax

    from video_stabilization_tpu.sim import (
        DEFAULT_APP_PARAMS, make_default_texture, render_frame,
        shake_trajectory,
    )

    tex = make_default_texture(jax.random.key(0), size=512)
    render = jax.jit(lambda t, p: render_frame(t, p, height, width))
    streams = []
    traj0 = None
    for s in range(n_streams):
        traj = shake_trajectory(
            jax.random.key(5 + s), n_frames, DEFAULT_APP_PARAMS,
            pos_amplitude=0.004, roll_amplitude=0.3,
        )
        if s == 0:
            traj0 = traj
        frames = [render(tex, jax.tree.map(lambda x: x[i], traj))
                  for i in range(n_frames)]
        streams.append(frames)
    jax.block_until_ready(streams[-1][-1])
    return (streams if n_streams > 1 else streams[0]), traj0


def analytic_smoothing_truth(traj, n_frames, wh, ww, past, future):
    """Ground-truth smoothing transforms: analytic inter-frame homographies
    at working resolution run through the (corrected) smoothing formula."""
    import jax
    import jax.numpy as jnp

    from video_stabilization_tpu.engine.smoothing import smoothing_homography
    from video_stabilization_tpu.sim import inter_frame_homography

    h_true = []
    for i in range(n_frames - 1):
        pa = jax.tree.map(lambda x: x[i], traj)
        pb = jax.tree.map(lambda x: x[i + 1], traj)
        h_true.append(np.asarray(inter_frame_homography(pa, pb, wh, ww),
                                 np.float64))

    wm1 = past + future
    qs = [np.eye(3)]                       # first frame: no transforms yet
    for n in range(2, n_frames + 1):       # after ingesting frame n
        length = min(n, wm1 + 1)
        num_tr = length - 1
        window = h_true[n - 1 - num_tr : n - 1]
        arr = np.broadcast_to(np.eye(3), (wm1, 3, 3)).copy()
        arr[wm1 - num_tr:] = window
        tvalid = np.zeros(wm1, bool)
        tvalid[wm1 - num_tr:] = True
        pres = length - future - 1 if length > future else 0
        q = smoothing_homography(
            jnp.asarray(arr, jnp.float32), jnp.asarray(tvalid),
            jnp.asarray(pres), jnp.asarray(num_tr), reference_compat=False,
        )
        qs.append(np.asarray(q, np.float64))
    return qs


def engine_config(h, w, working_height, past, future, ecc=False, compat=False):
    from video_stabilization_tpu.config import ECCConfig, StabilizerConfig

    return StabilizerConfig(
        past_frames=past, future_frames=future, working_height=working_height,
        frame_height=h, frame_width=w,
        ecc=ECCConfig(enabled=ecc, max_iters=30),
        reference_compat=compat,
    )


def bench_tpu(frames, cfg, mode, collect_h=False, n_streams=1):
    """Returns (fps, p50_ms, [per-frame H list])."""
    import jax
    import jax.numpy as jnp

    from video_stabilization_tpu.engine import Stabilizer
    from video_stabilization_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    streams = frames if n_streams > 1 else [frames]
    stabs = [Stabilizer(cfg, mode, seed=i) for i in range(n_streams)]

    # compile + warm (forced-fetch completion)
    out = stabs[0].stabilize_frame(streams[0][0])
    float(jnp.sum(out.astype(jnp.float32)))

    stabs = [Stabilizer(cfg, mode, seed=i) for i in range(n_streams)]
    total = jnp.zeros((), jnp.float32)
    n_total = 0
    t0 = time.perf_counter()
    for i in range(len(streams[0])):
        for s, stab in enumerate(stabs):
            out = stab.stabilize_frame(streams[s][i])
            total = total + jnp.sum(out.astype(jnp.float32))
            n_total += 1
    float(total)
    dt = time.perf_counter() - t0
    fps = n_total / dt

    lat = []
    for f in streams[0][: min(5, len(streams[0]))]:
        s0 = time.perf_counter()
        out = stabs[0].stabilize_frame(f)
        float(jnp.sum(out.astype(jnp.float32)))
        lat.append(time.perf_counter() - s0)
    p50 = 1000.0 * float(np.median(lat))

    hs = None
    if collect_h:
        stab = Stabilizer(cfg, mode, seed=0)
        hs = []
        for f in streams[0]:
            stab.stabilize_frame(f)
            hs.append(np.asarray(stab.carry.last_h, np.float64))
    return fps, p50, hs


def opencv_pipeline(frames_np, working_height, past, future, mode="smoothing",
                    collect_h=False):
    """OpenCV-CPU replica of the reference per-frame hot path.

    modes: smoothing (GLOBAL_SMOOTHING), accum (ACCUMULATED_FULL_LOCK),
    orb / sift (registration locks).
    """
    import collections

    import cv2

    h, w = frames_np[0].shape[:2]
    scale = working_height / h
    ww = int(round(w * scale))
    transforms = collections.deque(maxlen=past + future)
    prev_gray = None
    prev_pts = None
    accum = None
    ref_kp = ref_desc = None
    detector = None
    matcher = None
    if mode == "orb":
        detector = cv2.ORB_create(nfeatures=2500, scaleFactor=1.2, nlevels=12,
                                  edgeThreshold=31, patchSize=31,
                                  fastThreshold=20,
                                  scoreType=cv2.ORB_FAST_SCORE)
        matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
    elif mode == "sift":
        detector = cv2.SIFT_create(nfeatures=2500, nOctaveLayers=3,
                                   contrastThreshold=0.04, edgeThreshold=5,
                                   sigma=1.2)
        matcher = cv2.BFMatcher(cv2.NORM_L2)

    def preprocess(g):
        g = cv2.medianBlur(g, 5)
        k = np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], np.float32)
        g = cv2.filter2D(g, -1, k)
        g = cv2.createCLAHE(2.0, (8, 8)).apply(g)
        return cv2.medianBlur(g, 5)

    n_warm = 4
    times = []
    hs = []
    for idx, frame in enumerate(frames_np):
        t0 = time.perf_counter()
        small = cv2.resize(frame, (ww, working_height),
                           interpolation=cv2.INTER_LINEAR)
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
            if good.sum() >= 10:
                m, _ = cv2.estimateAffinePartial2D(
                    prev_pts.reshape(-1, 2)[good], nxt.reshape(-1, 2)[good],
                    method=cv2.RANSAC,
                )
                if m is not None and np.isfinite(m).all():
                    t_new = np.vstack([m, [0, 0, 1]])
                    a = t_new[:2, :2]
                    s = np.sqrt(max(np.linalg.det(a), 1e-9))
                    c = np.array([ww / 2.0, working_height / 2.0])
                    r = a / s
                    t = t_new[:2, 2] + (np.eye(2) - a) @ c - (np.eye(2) - r) @ c
                    t_new = np.eye(3)
                    t_new[:2, :2] = r
                    t_new[:2, 2] = t
        transforms.append(t_new)

        if mode == "smoothing":
            p = max(0, len(transforms) - future - 1)
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
            h_s = h_avg / count if count else np.eye(3)
        elif mode == "accum":
            accum = t_new @ accum if accum is not None else np.eye(3)
            h_s = np.linalg.inv(accum)
        else:  # orb / sift registration against a reference frame
            proc = preprocess(gray)
            kp, desc = detector.detectAndCompute(proc, None)
            h_s = np.eye(3)
            if ref_kp is None:
                ref_kp, ref_desc = kp, desc
            elif desc is not None and ref_desc is not None and len(kp) >= 10:
                if mode == "orb":
                    knn = matcher.knnMatch(ref_desc, desc, k=2)
                    goodm = [a for a, b in (p for p in knn if len(p) == 2)
                             if a.distance < 0.6 * b.distance]
                else:
                    allm = matcher.match(ref_desc, desc)
                    if allm:
                        avg = np.mean([mm.distance for mm in allm])
                        goodm = [mm for mm in allm
                                 if mm.distance <= max(0.5 * avg, 0.02)]
                    else:
                        goodm = []
                if len(goodm) >= 10:
                    srcp = np.float32([ref_kp[mm.queryIdx].pt for mm in goodm])
                    dstp = np.float32([kp[mm.trainIdx].pt for mm in goodm])
                    m, _ = cv2.estimateAffinePartial2D(
                        srcp, dstp, method=cv2.RANSAC,
                        ransacReprojThreshold=5.0)
                    if m is not None and np.isfinite(m).all():
                        h_s = np.linalg.inv(np.vstack([m, [0, 0, 1]]))

        hs.append(h_s.copy())
        h_scaled = h_s.copy()
        h_scaled[:2, 2] /= scale
        avg_c = 0.5 * np.asarray(cv2.mean(frame))[:3]
        cv2.warpPerspective(frame, h_scaled, (w, h), flags=cv2.INTER_LINEAR,
                            borderMode=cv2.BORDER_CONSTANT,
                            borderValue=avg_c.tolist())
        prev_pts = cv2.goodFeaturesToTrack(
            gray, maxCorners=1300, qualityLevel=0.01,
            minDistance=10 * working_height / 720.0, mask=None, blockSize=3)
        prev_gray = gray
        if idx >= n_warm:
            times.append(time.perf_counter() - t0)

    fps = len(times) / sum(times) if times else float("nan")
    return fps, (hs if collect_h else None)


def corner_drift(hs_a, hs_b, ww, wh, skip=5):
    """Mean corner displacement (px, working res) between two per-frame
    transform sequences — the BASELINE drift metric."""
    c = np.array([[0, 0, 1], [ww, 0, 1], [ww, wh, 1], [0, wh, 1]], float).T
    drifts = []
    for ha, hb in zip(hs_a[skip:], hs_b[skip:]):
        pa = ha @ c
        pa = pa[:2] / pa[2]
        pb = hb @ c
        pb = pb[:2] / pb[2]
        drifts.append(np.abs(pa - pb).mean())
    return float(np.mean(drifts))


CONFIGS = {
    1: dict(name="1080p simulator + global smoothing (working 360)",
            size=(1080, 1920), working=360, mode="smoothing"),
    2: dict(name="360p accumulated LK full-motion lock",
            size=(360, 640), working=360, mode="accum"),
    3: dict(name="720p ORB registration lock",
            size=(720, 1280), working=360, mode="orb"),
    4: dict(name="1080p SIFT registration lock + ECC",
            size=(1080, 1920), working=360, mode="sift"),
    5: dict(name="batched 8-stream 1080p translation/rotation-lock",
            size=(1080, 1920), working=360, mode="tlock", streams=8),
}

MODE_MAP = {
    "smoothing": "GLOBAL_SMOOTHING",
    "accum": "ACCUMULATED_FULL_LOCK",
    "orb": "ORB_FULL_LOCK",
    "sift": "SIFT_FULL_LOCK",
    "tlock": "TRANSLATION_LOCK",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=1, choices=sorted(CONFIGS))
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--past", type=int, default=30)
    ap.add_argument("--future", type=int, default=15)
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--skip-drift", action="store_true")
    args = ap.parse_args()

    from video_stabilization_tpu.config import StabilizationMode

    spec = CONFIGS[args.config]
    h, w = spec["size"]
    n_streams = spec.get("streams", 1)
    mode = StabilizationMode[MODE_MAP[spec["mode"]]]

    log(f"config {args.config}: {spec['name']}")
    log(f"rendering {args.frames} frames x {n_streams} stream(s) at {w}x{h}...")
    footage, traj = make_footage(args.frames, h, w, n_streams)

    cfg = engine_config(h, w, spec["working"], args.past, args.future,
                        ecc=(spec["mode"] == "sift"))

    log("running TPU engine...")
    collect = spec["mode"] == "smoothing" and not args.skip_drift
    tpu_fps, tpu_p50, hs_tpu = bench_tpu(
        footage, cfg, mode, collect_h=collect, n_streams=n_streams)
    log(f"TPU: {tpu_fps:.2f} fps/chip, p50 {tpu_p50:.1f} ms")

    cv_fps = float("nan")
    drift_tpu = drift_cv = None
    if not args.skip_baseline:
        log("running OpenCV-CPU baseline...")
        first = footage[0] if n_streams > 1 else footage
        frames_np = [np.asarray(f) for f in first]
        cv_mode = spec["mode"] if spec["mode"] != "tlock" else "smoothing"
        cv_fps, hs_cv = opencv_pipeline(
            frames_np, spec["working"], args.past, args.future,
            mode=cv_mode, collect_h=collect)
        if n_streams > 1:
            log(f"OpenCV-CPU: {cv_fps:.2f} fps single stream "
                f"(per-chip comparison uses the same host)")
        else:
            log(f"OpenCV-CPU: {cv_fps:.2f} fps")
        if collect and hs_tpu is not None and hs_cv is not None:
            # fidelity referee: analytic ground truth from the simulator
            wh2, ww2 = cfg.working_size
            qs_true = analytic_smoothing_truth(
                traj, args.frames, wh2, ww2, args.past, args.future)
            drift_tpu = corner_drift(hs_tpu, qs_true, ww2, wh2)
            drift_cv = corner_drift(hs_cv, qs_true, ww2, wh2)
            log(f"corner drift vs analytic truth: TPU {drift_tpu:.4f} px, "
                f"OpenCV {drift_cv:.4f} px (working res)")

    result = {
        "metric": f"frames/sec/chip, {spec['name']}",
        "value": round(tpu_fps, 3),
        "unit": "fps",
        "vs_baseline": round(tpu_fps / cv_fps, 3) if cv_fps == cv_fps else None,
        "p50_latency_ms": round(tpu_p50, 2),
    }
    if drift_tpu is not None:
        result["corner_drift_vs_truth_px"] = round(drift_tpu, 4)
        result["opencv_drift_vs_truth_px"] = round(drift_cv, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
