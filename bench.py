#!/usr/bin/env python
"""Benchmark: TPU engine vs OpenCV-CPU reference pipeline at 1080p.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so the baseline is measured
here: a faithful OpenCV replica of the reference's per-frame hot path
(resize -> gray -> GFTT -> pyramidal LK -> estimateAffinePartial2D+RANSAC ->
de-scale -> temporal-window smoothing -> 1080p warpPerspective), with the
reference's hyperparameters (src/stabilizer.cpp:185-195, 933-945).

Benchmark config 1 of BASELINE.json: simulator source + global smoothing,
working height 360, frames 1920x1080.
"""

import argparse
import json
import sys
import time

import numpy as np


def make_footage(n_frames: int, height: int, width: int):
    """Render simulator footage ON DEVICE and leave it there.

    Crucial: no np.asarray here.  The first device-to-host fetch flips this
    environment's TPU relay into a synchronous dispatch mode for the rest of
    the process (measured 2026-08-16: ~27 ms per subsequent sync, ~40 MB/s
    D2H).  The TPU bench must run before anything is fetched; the OpenCV
    baseline fetches afterwards.
    """
    import jax

    from video_stabilization_tpu.sim import (
        DEFAULT_APP_PARAMS,
        make_default_texture,
        render_frame,
        shake_trajectory,
    )

    tex = make_default_texture(jax.random.key(0), size=512)
    traj = shake_trajectory(
        jax.random.key(5), n_frames, DEFAULT_APP_PARAMS,
        pos_amplitude=0.004, roll_amplitude=0.3,
    )
    # texture is an ARGUMENT, never a jit-closure capture: a captured device
    # array poisons this runtime into its slow synchronous dispatch mode.
    render = jax.jit(
        lambda t, p: render_frame(t, p, height, width), static_argnums=()
    )
    frames = []
    for i in range(n_frames):
        p = jax.tree.map(lambda x: x[i], traj)
        frames.append(render(tex, p))
    jax.block_until_ready(frames)
    return frames


def bench_tpu(frames, past, future, working_height):
    from video_stabilization_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    """Throughput via pipelined dispatch (frames pre-staged in HBM, outputs
    left in HBM until the end), plus a blocking per-frame latency probe.

    Measurement notes for this environment's TPU relay tunnel:
    - ``jax.block_until_ready`` can return before execution truly completes;
      the only reliable completion barrier is fetching a value.  All timings
      therefore end with a host fetch of an on-device scalar checksum.
    - D2H bandwidth is ~40 MB/s and the first fetch adds ~27 ms to later
      blocking calls — artifacts of the tunnel, not the chip.  Outputs are
      reduced on device; full frames are never fetched while timing.
    """
    import jax

    from video_stabilization_tpu.config import (
        StabilizationMode,
        StabilizerConfig,
    )
    from video_stabilization_tpu.engine import Stabilizer

    h, w = frames[0].shape[:2]
    cfg = StabilizerConfig(
        past_frames=past, future_frames=future, working_height=working_height,
        frame_height=h, frame_width=w,
    )
    import jax.numpy as jnp

    dev_frames = [jax.device_put(f) for f in frames]  # no-op if already on device
    jax.block_until_ready(dev_frames[-1])

    # compile + warm; the float() fetch forces TRUE completion (this
    # runtime's block_until_ready can return before execution finishes)
    stab = Stabilizer(cfg, StabilizationMode.GLOBAL_SMOOTHING)
    out = stab.stabilize_frame(dev_frames[0])
    float(jnp.sum(out.astype(jnp.float32)))

    # throughput: fresh engine (same cached executable), enqueue all steps,
    # reduce every output to one on-device scalar, fetch it once at the end —
    # the only trustworthy completion barrier here.
    stab = Stabilizer(cfg, StabilizationMode.GLOBAL_SMOOTHING)
    total = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for f in dev_frames:
        out = stab.stabilize_frame(f)
        total = total + jnp.sum(out.astype(jnp.float32))
    checksum = float(total)
    dt = time.perf_counter() - t0
    fps = len(dev_frames) / dt

    # per-frame latency: one frame end-to-end with a forced fetch each time
    lat = []
    for f in dev_frames[: min(5, len(dev_frames))]:
        s = time.perf_counter()
        out = stab.stabilize_frame(f)
        float(jnp.sum(out.astype(jnp.float32)))
        lat.append(time.perf_counter() - s)
    return fps, 1000.0 * float(np.median(lat))


def bench_opencv(frames, past, future, working_height):
    """Reference pipeline replica in OpenCV (CPU)."""
    import collections

    import cv2

    h, w = frames[0].shape[:2]
    scale = working_height / h
    ww = int(round(w * scale))
    transforms = collections.deque(maxlen=past + future)
    prev_gray = None
    prev_pts = None

    def decompose_rigid(m):
        # kill isotropic scale about image center (reference :261-267)
        a = m[:2, :2]
        s = np.sqrt(max(np.linalg.det(a), 1e-9))
        return m, s

    n_warm = 6
    times = []
    for idx, frame in enumerate(frames):
        t0 = time.perf_counter()
        small = cv2.resize(frame, (ww, working_height), interpolation=cv2.INTER_LINEAR)
        gray = cv2.cvtColor(small, cv2.COLOR_BGR2GRAY)
        t_new = np.eye(3)
        if prev_gray is not None and prev_pts is not None and len(prev_pts) >= 10:
            nxt, st, _ = cv2.calcOpticalFlowPyrLK(
                prev_gray, gray, prev_pts, None, winSize=(21, 21), maxLevel=3,
                criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 50, 0.01),
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
                    # de-scale about center
                    a = t_new[:2, :2]
                    s = np.sqrt(max(np.linalg.det(a), 1e-9))
                    c = np.array([ww / 2.0, working_height / 2.0])
                    r = a / s
                    t = t_new[:2, 2] + (np.eye(2) - a) @ c - (np.eye(2) - r) @ c
                    t_new = np.eye(3)
                    t_new[:2, :2] = r
                    t_new[:2, 2] = t
        transforms.append(t_new)

        # smoothing average over the window (reference :793-852)
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

        h_scaled = h_s.copy()
        h_scaled[:2, 2] /= scale
        avg = 0.5 * np.asarray(cv2.mean(frame))[:3]
        cv2.warpPerspective(
            frame, h_scaled, (w, h), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=avg.tolist(),
        )
        prev_pts = cv2.goodFeaturesToTrack(
            gray, maxCorners=1300, qualityLevel=0.01,
            minDistance=10 * working_height / 720.0, mask=None, blockSize=3,
        )
        prev_gray = gray
        if idx >= n_warm:
            times.append(time.perf_counter() - t0)
    return len(times) / sum(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--working-height", type=int, default=360)
    ap.add_argument("--past", type=int, default=30)
    ap.add_argument("--future", type=int, default=15)
    ap.add_argument("--skip-baseline", action="store_true")
    args = ap.parse_args()

    print(f"[bench] rendering {args.frames} frames at {args.width}x{args.height}...",
          file=sys.stderr)
    frames = make_footage(args.frames, args.height, args.width)

    print("[bench] running TPU engine...", file=sys.stderr)
    tpu_fps, tpu_p50_ms = bench_tpu(frames, args.past, args.future, args.working_height)
    print(f"[bench] TPU: {tpu_fps:.2f} fps, p50 {tpu_p50_ms:.1f} ms", file=sys.stderr)

    if args.skip_baseline:
        cv_fps = float("nan")
    else:
        print("[bench] running OpenCV-CPU baseline...", file=sys.stderr)
        # fetch footage to host only AFTER the TPU phase (see make_footage note)
        frames_np = [np.asarray(f) for f in frames]
        cv_fps = bench_opencv(frames_np, args.past, args.future, args.working_height)
        print(f"[bench] OpenCV-CPU: {cv_fps:.2f} fps", file=sys.stderr)

    result = {
        "metric": "frames/sec/chip, 1080p simulator + global smoothing (working height 360)",
        "value": round(tpu_fps, 3),
        "unit": "fps",
        "vs_baseline": round(tpu_fps / cv_fps, 3) if cv_fps == cv_fps else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
