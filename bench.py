#!/usr/bin/env python
"""Benchmarks: TPU engine vs OpenCV-CPU reference pipeline, 5 configs.

Prints ONE JSON line.  Headline keys ({"metric", "value", "unit",
"vs_baseline"}) follow the driver contract and report config 1; a "configs"
key carries every config's numbers.

BASELINE.json configs:
  1. simulator + global smoothing, working 360, 1080p frames
  2. accumulated LK optical-flow full-motion lock, 360p frames
  3. ORB registration lock, 720p frames
  4. SIFT registration lock + ECC enabled, 1080p frames
  5. batched 8-stream 1080p, translation-lock decomposition (the real
     vmapped path: one chip dispatch stabilizes all 8 streams per frame)

Measurement protocol (see .claude/skills/verify/SKILL.md):
  - Throughput: lax.scan over the clip — one dispatch per clip, so the
    number is chip throughput, not host dispatch rate.  All timings end
    with a host fetch of an on-device checksum (the only reliable
    completion barrier on this relay).
  - Latency: >= 50 per-frame dispatches, each closed by a forced fetch;
    p50/p99 reported raw (includes this environment's ~27 ms relay
    round-trip per sync — an artifact of the tunnel, reported alongside
    the pipelined per-frame step time which excludes it).
  - The OpenCV baseline is a faithful CPU replica of the reference
    per-frame hot path with the reference's hyperparameters; config 5's
    baseline runs the accumulated-lock mode (the reference's translation
    lock is a documented no-op, src/stabilizer.cpp:790) on one stream.
"""

import argparse
import json
import sys
import time

import numpy as np


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def make_footage(n_frames, height, width, n_streams=1):
    """Render simulator footage ON DEVICE and leave it there.

    Returns (frames, traj0): frames is (T, H, W, 3) u8 for one stream or
    (T, S, H, W, 3) u8 for a batch; traj0 yields analytic ground-truth
    homographies for fidelity metrics."""
    import jax
    import jax.numpy as jnp

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
        streams.append(jnp.stack(frames))
    if n_streams > 1:
        out = jnp.stack(streams, axis=1)          # (T, S, H, W, 3)
    else:
        out = streams[0]                          # (T, H, W, 3)
    jax.block_until_ready(out)
    return out, traj0


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


def _checksum(x):
    import jax.numpy as jnp

    return float(jnp.sum(x[-1].astype(jnp.float32)))


def bench_throughput_scan(frames, cfg, mode, n_streams=1, reps=2):
    """Chip throughput via the scan path: frames/sec/chip."""
    import jax

    from video_stabilization_tpu.config import StabilizationMode  # noqa: F401
    from video_stabilization_tpu.engine.stabilizer import make_scan_fn
    from video_stabilization_tpu.engine.state import init_carry
    from video_stabilization_tpu.parallel import (
        init_batched_carry, make_batched_scan_fn,
    )
    from video_stabilization_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    if n_streams > 1:
        scan = make_batched_scan_fn(cfg)
        carry = init_batched_carry(cfg, n_streams, int(mode), jax.random.key(0))
    else:
        scan = make_scan_fn(cfg)
        carry = init_carry(cfg, int(mode), jax.random.key(0))

    n_frames = frames.shape[0]
    carry, (out, _) = scan(carry, frames)       # compile + warm
    _checksum(out)

    t0 = time.perf_counter()
    for _ in range(reps):
        carry, (out, _) = scan(carry, frames)
    _checksum(out)
    dt = time.perf_counter() - t0
    return reps * n_frames * n_streams / dt


def bench_throughput_offline(frames, cfg, mode, n_streams=1, chunk=16, reps=2):
    """Chip throughput via the offline batched pipeline (engine/offline.py):
    per-pair estimation, registration, and output warps batched over chunk
    frames (x streams) per dispatch — the round-3 throughput path."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from video_stabilization_tpu.engine import (
        init_carry, make_offline_batched_fn, make_offline_fn,
    )
    from video_stabilization_tpu.parallel import init_batched_carry
    from video_stabilization_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    cfg_off = dataclasses.replace(cfg, static_mode=int(mode))
    n_frames = frames.shape[0]
    chunk = min(chunk, n_frames, cfg.total_window)

    if n_streams > 1:
        fn = make_offline_batched_fn(cfg_off)
        frames = jnp.swapaxes(frames, 0, 1)        # (S, T, H, W, C)
        slice_chunk = lambda i, j: frames[:, i:j]
        make_carry = lambda: init_batched_carry(
            cfg_off, n_streams, int(mode), jax.random.key(0))
    else:
        fn = make_offline_fn(cfg_off)
        slice_chunk = lambda i, j: frames[i:j]
        make_carry = lambda: init_carry(cfg_off, int(mode), jax.random.key(0))

    def run_once(carry):
        out = None
        i = 0
        while i + chunk <= n_frames:
            carry, (out, _) = fn(carry, slice_chunk(i, i + chunk))
            i += chunk
        return carry, out, i

    carry, out, done = run_once(make_carry())        # compile + warm
    _checksum(out)

    t0 = time.perf_counter()
    total = 0
    for _ in range(reps):
        carry, out, done = run_once(carry)
        total += done
    _checksum(out)
    dt = time.perf_counter() - t0
    return total * n_streams / dt


def _file_streaming_worker(y4m_path, n_frames, cfg, mode, chunk=16):
    """End-to-end fps of the native file path: NativeY4MReader BLOCK fread
    (one C call per chunk, contiguous (K, bytes) planes) -> chunked planar
    H2D -> on-device YUV->BGR -> offline batched pipeline.  Dispatch is
    async, so the host reads chunk i+1 while the device crunches chunk i —
    no producer thread, no ring, no per-frame Python.  The number includes
    ALL host costs (VERDICT r2 weak #6: the native decoder must be in the
    measured loop, reference src/main_utils.cpp:262-281,397-417).

    MUST run in a process that has never fetched device data: this relay's
    first D2H permanently collapses H2D bandwidth ~45x (1.4 GB/s -> 30 MB/s,
    measured 2026-08-20) in addition to the known ~27 ms sync mode — so
    bench_one invokes this through a fresh subprocess per pass
    (--e2e-stream-worker): a warm pass that populates the persistent compile
    cache, then a measuring pass.  The completion barrier is ONE end-of-run
    checksum fetch — ``block_until_ready`` does NOT await remote execution
    in the relay's pre-fetch mode (probed 2026-08-20: bur returned in 0 ms
    while the real work took seconds), so the fetch, mode-flip cost and all,
    is INSIDE the measured time.  Honest or nothing."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from video_stabilization_tpu.engine import make_offline_fn
    from video_stabilization_tpu.engine.state import init_carry
    from video_stabilization_tpu.io.native import NativeY4MReader
    from video_stabilization_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    cfg_off = dataclasses.replace(cfg, static_mode=int(mode))
    scan = make_offline_fn(cfg_off)

    probe = NativeY4MReader(y4m_path)
    h, w = probe.frame_size
    c420 = probe.is_c420
    probe.close()

    # the host only freads raw Y|U|V planes; colorspace conversion runs on
    # device fused ahead of the offline scan (half the H2D bytes for C420,
    # and none of the native reader's per-pixel float conversion loop)
    from video_stabilization_tpu.ops.image import yuv_flat_to_bgr

    @jax.jit
    def scan_yuv(carry, yuv_chunk):
        frames = yuv_flat_to_bgr(yuv_chunk, h, w, c420)
        return scan(carry, frames)

    src = NativeY4MReader(y4m_path)
    carry = init_carry(cfg_off, int(mode), jax.random.key(0))
    t0 = time.perf_counter()
    done = 0
    out = None
    while done + chunk <= n_frames:
        block = src.read_yuv_block(chunk)       # one native call
        if block is None or len(block) < chunk:
            break
        carry, (out, _) = scan_yuv(carry, jnp.asarray(block))
        done += chunk
    if out is not None:
        _checksum(out)     # REAL completion barrier: one D2H, inside the time
    dt = time.perf_counter() - t0
    src.close()
    return done / dt if done else float("nan")


def bench_file_streaming(y4m_path, n_frames, cfg, mode, chunk=16):
    """Run the e2e file-streaming measurement in FRESH subprocesses so the
    relay is still in its fast pre-first-fetch H2D mode (see
    _file_streaming_worker): pass 1 warms the persistent compile cache
    (timing discarded), pass 2 measures.  Returns fps."""
    import json as _json
    import subprocess

    spec = dict(y4m=y4m_path, n_frames=n_frames, chunk=chunk,
                h=cfg.frame_height, w=cfg.frame_width,
                working=cfg.working_height, past=cfg.past_frames,
                future=cfg.future_frames, mode=int(mode))
    fps = None
    for _pass in ("warm", "measure"):
        proc = subprocess.run(
            [sys.executable, __file__, "--e2e-stream-worker",
             _json.dumps(spec)],
            capture_output=True, text=True, timeout=1200)
        if proc.returncode != 0:
            raise RuntimeError(f"e2e worker failed: {proc.stderr[-500:]}")
        fps = float(
            _json.loads(proc.stdout.strip().splitlines()[-1])["fps"])
    return fps


def measure_dispatch_overhead(n=50):
    """p50 of a trivial jitted dispatch + blocking checksum fetch — the
    fixed relay/sync cost every raw per-frame latency sample carries in this
    environment (~27 ms through the tunnel).  Reported as
    ``dispatch_overhead_ms`` so ``p50_latency_ms - dispatch_overhead_ms ~=
    step_ms_pipelined`` is auditable from the JSON alone (VERDICT r2 item 2 /
    r3 item 4)."""
    import jax
    import jax.numpy as jnp

    x = jnp.arange(8, dtype=jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    float(jnp.sum(f(x)))                      # warm + enter post-fetch mode
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(f(x)))
        samples.append(time.perf_counter() - t0)
    return float(np.percentile(1000.0 * np.asarray(samples), 50))


def bench_batched_latency(frames, cfg, mode, n_streams, n_lat=50):
    """Per-dispatch latency of the stream-batched step (one dispatch
    stabilizes one frame of every stream), p50/p99 raw incl. relay sync."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from video_stabilization_tpu.parallel import (
        init_batched_carry, make_batched_step_fn,
    )
    from video_stabilization_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    cfg_b = dataclasses.replace(cfg, static_mode=int(mode))
    step = make_batched_step_fn(cfg_b)
    carry = init_batched_carry(cfg_b, n_streams, int(mode), jax.random.key(0))
    carry, (out, _) = step(carry, frames[0])
    float(jnp.sum(out.astype(jnp.float32)))
    n = frames.shape[0]
    lat = []
    for i in range(max(n_lat, n)):
        f = frames[i % n]
        t0 = time.perf_counter()
        carry, (out, _) = step(carry, f)
        float(jnp.sum(out.astype(jnp.float32)))
        lat.append(time.perf_counter() - t0)
    lat_ms = 1000.0 * np.asarray(lat)
    return (float(np.percentile(lat_ms, 50)), float(np.percentile(lat_ms, 99)))


def bench_latency(frames, cfg, mode, n_lat=50, collect_h=False):
    """Per-frame dispatch latency (p50/p99, raw incl. relay sync) plus the
    pipelined per-frame step time, via the streaming step path."""
    import jax
    import jax.numpy as jnp

    from video_stabilization_tpu.engine import Stabilizer
    from video_stabilization_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    stab = Stabilizer(cfg, mode, seed=0)
    out = stab.stabilize_frame(frames[0])
    float(jnp.sum(out.astype(jnp.float32)))     # warm + first (slow) fetch

    # pipelined: N dispatches, one fetch
    stab = Stabilizer(cfg, mode, seed=0)
    n_pipe = min(32, frames.shape[0])
    t0 = time.perf_counter()
    for i in range(n_pipe):
        out = stab.stabilize_frame(frames[i])
    float(jnp.sum(out.astype(jnp.float32)))
    step_ms = (time.perf_counter() - t0) / n_pipe * 1000.0

    # raw per-dispatch latency, >= 50 samples
    lat = []
    hs = []
    stab = Stabilizer(cfg, mode, seed=0)
    n = frames.shape[0]
    for i in range(max(n_lat, n)):
        f = frames[i % n]
        t0 = time.perf_counter()
        out = stab.stabilize_frame(f)
        float(jnp.sum(out.astype(jnp.float32)))
        lat.append(time.perf_counter() - t0)
        if collect_h and i < n:
            hs.append(np.asarray(stab.carry.last_h, np.float64))
    lat_ms = 1000.0 * np.asarray(lat)
    return (
        float(np.percentile(lat_ms, 50)),
        float(np.percentile(lat_ms, 99)),
        step_ms,
        hs if collect_h else None,
    )


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
    # real inter-frame transforms only, like the reference's deque
    # (src/stabilizer.cpp:277-288: first push happens at the SECOND frame;
    # capacity totalFrameWindowSize()-1).  An earlier replica version seeded
    # a dummy identity for frame 0, which shifted every smoothing-window
    # index one transform older than the reference's loops (:805-839) —
    # a 0.3 px drift artifact blamed on the engine until the cv2-exact
    # estimator closed every other term.
    transforms = collections.deque(maxlen=past + future)
    n_frames_window = 0                       # reference frames deque size
    frames_cap = past + future + 1
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
        n_frames_window = min(n_frames_window + 1, frames_cap)
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
        if idx > 0:
            # reference pushes a transform only from the second frame on
            transforms.append(t_new)

        if mode == "smoothing":
            # presentation index over FRAMES (src/stabilizer.cpp:1226-1229),
            # walks over the real transform deque (:805-839; the future loop
            # excludes the newest transform — reference quirk)
            p = (n_frames_window - future - 1
                 if n_frames_window > future else 0)
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
    2: dict(name="360p accumulated LK full-motion lock (native file decode)",
            size=(360, 640), working=360, mode="accum"),
    3: dict(name="720p ORB registration lock",
            size=(720, 1280), working=360, mode="orb"),
    4: dict(name="1080p SIFT registration lock + ECC",
            size=(1080, 1920), working=360, mode="sift"),
    5: dict(name="batched 8-stream 1080p smoothing + translation-lock",
            size=(1080, 1920), working=360, mode="tlock", streams=8,
            # 8 streams x 1080p: footage + ring + double-buffered outputs
            # approach HBM capacity; 24 frames keeps ~3 GB headroom
            max_frames=24),
}

MODE_MAP = {
    "smoothing": "GLOBAL_SMOOTHING",
    "accum": "ACCUMULATED_FULL_LOCK",
    "orb": "ORB_FULL_LOCK",
    "sift": "SIFT_FULL_LOCK",
    "tlock": "TRANSLATION_LOCK",
}


def bench_one(idx, args, dispatch_overhead_ms=None):
    import os

    from video_stabilization_tpu.config import StabilizationMode

    spec = CONFIGS[idx]
    h, w = spec["size"]
    n_streams = spec.get("streams", 1)
    n_frames = min(args.frames, spec.get("max_frames", args.frames))
    mode = StabilizationMode[MODE_MAP[spec["mode"]]]
    cfg = engine_config(h, w, spec["working"], args.past, args.future,
                        ecc=(spec["mode"] == "sift"))

    log(f"config {idx}: {spec['name']}")
    log(f"rendering {n_frames} frames x {n_streams} stream(s) at {w}x{h}...")
    footage, traj = make_footage(n_frames, h, w, n_streams)

    result = {"name": spec["name"]}
    if dispatch_overhead_ms is not None:
        # fixed relay/sync cost per blocking fetch in this environment, so
        # p50_latency_ms - dispatch_overhead_ms ~= step_ms_pipelined is
        # auditable from the JSON alone (VERDICT r3 item 4)
        result["dispatch_overhead_ms"] = dispatch_overhead_ms

    # --- OpenCV-CPU baseline FIRST, before any TPU work loads the host ------
    # (VERDICT r3 weak #5: r3's suite-contended 9.21 fps baseline silently
    # inflated vs_baseline; the provenance field records the host load the
    # baseline actually saw)
    hs_cv = None
    cv_fps = None
    if not args.skip_baseline:
        n_base = min(args.baseline_frames, n_frames)
        load_before = os.getloadavg()[0]
        log(f"OpenCV-CPU baseline ({n_base} frames, loadavg {load_before:.2f})...")
        first = footage[:n_base, 0] if n_streams > 1 else footage[:n_base]
        frames_np = [np.asarray(f) for f in first]
        cv_mode = spec["mode"] if spec["mode"] != "tlock" else "accum"
        collect_cv = (n_streams == 1 and spec["mode"] == "smoothing"
                      and not args.skip_drift)
        cv_fps, hs_cv = opencv_pipeline(
            frames_np, spec["working"], args.past, args.future,
            mode=cv_mode, collect_h=collect_cv)
        log(f"OpenCV-CPU: {cv_fps:.2f} fps (1 stream)")
        result["opencv_fps"] = round(cv_fps, 2)
        result["baseline_provenance"] = (
            f"measured first in this run, before the TPU benches, "
            f"1-min loadavg {load_before:.2f} at start "
            f"({os.cpu_count()} host core(s))")

    import dataclasses

    log("TPU throughput (offline batched pipeline)...")
    chunk = 8 if n_streams > 1 else 16
    tpu_fps = bench_throughput_offline(footage, cfg, mode, n_streams,
                                       chunk=chunk)
    log(f"TPU: {tpu_fps:.1f} frames/sec/chip (offline, chunk {chunk})")

    result["tpu_fps_per_chip"] = round(tpu_fps, 2)

    if not args.skip_scan:
        # the streaming scan path (one frame per in-scan step) — the rate a
        # live single-stream feed achieves; offline is the clip/VOD rate
        log("TPU throughput (streaming scan)...")
        if n_streams > 1:
            cfg_thr = dataclasses.replace(cfg, static_mode=int(mode))
        else:
            cfg_thr = cfg
        fps_scan = bench_throughput_scan(footage, cfg_thr, mode, n_streams)
        result["tpu_fps_streaming_scan"] = round(fps_scan, 2)
        log(f"TPU streaming scan: {fps_scan:.1f} frames/sec/chip")
        if n_streams == 1:
            # lax.scan executes the per-frame step strictly sequentially on
            # device, so the scan rate's reciprocal IS the true per-frame
            # device latency — free of this environment's relay-sync and
            # host-dispatch artifacts that p50/step_ms_pipelined carry
            result["step_ms_device"] = round(1000.0 / fps_scan, 2)
        # headline = the better of the two real production paths (both are
        # end-to-end device-resident rates; offline batches per-frame work
        # over chunks, the scan runs strictly frame-at-a-time).  Config 2's
        # headline is replaced below by the native-file e2e rate regardless.
        if fps_scan > tpu_fps:
            result["tpu_fps_per_chip"] = round(fps_scan, 2)
            result["throughput_path"] = "streaming scan"
            tpu_fps = fps_scan
        else:
            result["throughput_path"] = f"offline batched (chunk {chunk})"

    if idx == 1 and not args.skip_ref_window:
        # BASELINE default window is 30 frames (past 30 / future 15); the
        # reference's own default is 2.0s/1.5s = 60/45 @ 30 fps (106-frame
        # ring, ~660 MB at 1080p).  Demonstrate it fits and performs
        # (VERDICT r2 weak #5).
        log("reference-default window (past 60 / future 45)...")
        cfg_ref = engine_config(h, w, spec["working"], 60, 45)
        fps_ref = bench_throughput_offline(footage, cfg_ref, mode, 1, chunk=16)
        result["tpu_fps_ref_window_60_45"] = round(fps_ref, 2)
        log(f"TPU @ 60/45 window: {fps_ref:.1f} fps")

    if idx == 2:
        # the measured config-2 number must ingest a real file through the
        # native decoder (VERDICT r2 weak #6): write the footage to Y4M,
        # stream it back through NativeY4MReader + prefetch ring
        from video_stabilization_tpu.io import VideoWriter

        y4m = "/tmp/bench_config2.y4m"
        log(f"writing {n_frames} frames to {y4m}...")
        wr = VideoWriter(y4m, 30.0, (h, w), subsampling="420")
        for i in range(n_frames):
            wr.write(np.asarray(footage[i]))
        wr.close()
        log("streaming from native Y4M decoder (chunked scan)...")
        fps_e2e = bench_file_streaming(y4m, n_frames, cfg, mode, chunk=16)
        log(f"TPU e2e incl. native decode: {fps_e2e:.1f} fps")
        result["tpu_fps_device_resident"] = result["tpu_fps_per_chip"]
        result["tpu_fps_per_chip"] = round(fps_e2e, 2)
        result["throughput_path"] = "native Y4M decode -> offline batched"
        tpu_fps = fps_e2e
        result["ingest_note"] = (
            "headline fps streams C420 Y4M through the native C++ block "
            "reader (one fread call per chunk) into planar H2D + on-device "
            "YUV->BGR + the offline batched pipeline; C420 chroma is "
            "box-subsampled so streamed pixels differ from the in-memory "
            "C444 footage (r3 advisor note) — drift metrics use the "
            "in-memory path; tpu_fps_device_resident is the device-resident "
            "rate")

    if n_streams == 1:
        collect = spec["mode"] == "smoothing" and not args.skip_drift
        p50, p99, step_ms, hs_tpu = bench_latency(
            footage, cfg, mode, n_lat=args.latency_samples, collect_h=collect)
        log(f"latency p50 {p50:.1f} ms / p99 {p99:.1f} ms "
            f"(pipelined step {step_ms:.1f} ms)")
        result.update(p50_latency_ms=round(p50, 2), p99_latency_ms=round(p99, 2),
                      step_ms_pipelined=round(step_ms, 2))
    else:
        hs_tpu = None
        result["streams"] = n_streams
        result["per_stream_fps"] = round(tpu_fps / n_streams, 2)
        # BASELINE config 5 names BOTH global smoothing and the translation/
        # rotation-lock decomposition (VERDICT r2 weak #4): measure the
        # batched smoothing path too, plus a 4-stream operating point whose
        # per-stream rate must hold real time (>= 30 fps/stream).
        from video_stabilization_tpu.config import StabilizationMode as SM

        log("batched global smoothing (same 8 streams)...")
        fps_sm = bench_throughput_offline(
            footage, cfg, SM.GLOBAL_SMOOTHING, n_streams, chunk=chunk)
        result["smoothing_fps_per_chip"] = round(fps_sm, 2)
        result["smoothing_per_stream_fps"] = round(fps_sm / n_streams, 2)
        log(f"TPU smoothing: {fps_sm:.1f} aggregate fps")

        log("4-stream translation-lock operating point...")
        foot4 = footage[:, :4]
        fps4 = bench_throughput_offline(foot4, cfg, mode, 4, chunk=chunk)
        result["tlock_4stream_fps_per_chip"] = round(fps4, 2)
        result["tlock_4stream_per_stream_fps"] = round(fps4 / 4, 2)
        log(f"TPU 4-stream: {fps4:.1f} aggregate "
            f"({fps4 / 4:.1f} fps/stream)")

        # BASELINE config 5 names the translation/ROTATION-lock
        # decomposition (VERDICT r3 item 8): the batched rotation-lock
        # workload (reference derivation src/stabilizer.cpp:1257-1260,
        # a no-op there; implemented here)
        log("batched rotation-lock (same 8 streams)...")
        fps_rl = bench_throughput_offline(
            footage, cfg, SM.ROTATION_LOCK, n_streams, chunk=chunk)
        result["rotation_lock_fps_per_chip"] = round(fps_rl, 2)
        result["rotation_lock_per_stream_fps"] = round(fps_rl / n_streams, 2)
        log(f"TPU rotation-lock: {fps_rl:.1f} aggregate fps")

        # per-dispatch latency of the batched step: one dispatch = one frame
        # of all 8 streams (VERDICT r3 item 8: config 5 had no p50)
        log("batched per-dispatch latency...")
        p50b, p99b = bench_batched_latency(
            footage, cfg, mode, n_streams, n_lat=args.latency_samples)
        result["p50_latency_ms"] = round(p50b, 2)
        result["p99_latency_ms"] = round(p99b, 2)
        log(f"batched latency p50 {p50b:.1f} ms / p99 {p99b:.1f} ms "
            f"(one dispatch stabilizes all {n_streams} streams)")

    if cv_fps is not None:
        result["vs_baseline"] = round(tpu_fps / cv_fps, 3)
        if n_streams > 1:
            result["baseline_note"] = (
                "aggregate 8-stream translation-lock chip fps vs single-"
                "stream CPU accumulated-lock (the reference's translation "
                "lock is a no-op); smoothing_* / rotation_lock_* / "
                "tlock_4stream_* report the batched smoothing and rotation-"
                "lock workloads and the real-time 4-stream operating point")

    if not args.skip_baseline:
        collect = (n_streams == 1 and spec["mode"] == "smoothing"
                   and not args.skip_drift)
        if collect and hs_tpu:
            wh2, ww2 = cfg.working_size
            qs_true = analytic_smoothing_truth(
                traj, len(hs_tpu), wh2, ww2, args.past, args.future)
            result["corner_drift_vs_truth_px"] = round(
                corner_drift(hs_tpu, qs_true, ww2, wh2), 4)
            result["opencv_drift_vs_truth_px"] = round(
                corner_drift(hs_cv, qs_true[: len(hs_cv)], ww2, wh2), 4)
            log(f"corner drift vs analytic truth: TPU "
                f"{result['corner_drift_vs_truth_px']} px, OpenCV "
                f"{result['opencv_drift_vs_truth_px']} px")

        if collect and hs_cv and not args.skip_compat_drift:
            # fidelity gate vs the REFERENCE pipeline: reference-compat
            # quirks + cv2exact GFTT (cv2's corner list) + cv2exact LK
            # (OpenCV's iteration schedule) + cv2exact RANSAC (bit-exact
            # replica of estimateAffinePartial2D's MWC hypothesis stream,
            # sequential early exit, and LM polish — motion/cv2_ransac.py,
            # run as a host estimator stage), measured against the OpenCV
            # replica on identical footage.
            import dataclasses

            from video_stabilization_tpu.config import (
                GFTTConfig, LKConfig, RansacConfig,
            )
            from video_stabilization_tpu.engine import Stabilizer
            from video_stabilization_tpu.config import StabilizationMode as SM

            log("compat-mode drift vs OpenCV replica (cv2exact GFTT+LK+RANSAC)...")
            cfg_compat = dataclasses.replace(
                cfg, reference_compat=True,
                lk=LKConfig(method="cv2exact"),
                # cv2's element-exact corner list (ops/gftt_host.py: exact
                # u8 gray, ULP-exact min-eig response, pointer-tie-break
                # sort, greedy suppression), injected host-side
                gftt=GFTTConfig(max_features=1300, selection="host"),
                ransac=RansacConfig(method="cv2exact"),
                # the drift referee runs GLOBAL_SMOOTHING only: pin the mode
                # so the unused ORB/SIFT lock branches are never traced
                static_mode=int(SM.GLOBAL_SMOOTHING),
            )
            stab = Stabilizer(cfg_compat, SM.GLOBAL_SMOOTHING, seed=0)
            hs_compat = []
            n_base = len(hs_cv)
            for i in range(n_base):
                stab.stabilize_frame(footage[i])
                hs_compat.append(np.asarray(stab.carry.last_h, np.float64))
            wh2, ww2 = cfg.working_size
            result["drift_vs_reference_px"] = round(
                corner_drift(hs_compat, hs_cv, ww2, wh2), 4)
            log(f"drift vs reference replica: "
                f"{result['drift_vs_reference_px']} px")
    return result


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--e2e-stream-worker":
        # fresh-process streaming measurement (fast H2D mode; see
        # _file_streaming_worker) — prints one JSON line and exits
        spec = json.loads(sys.argv[2])
        from video_stabilization_tpu.config import StabilizationMode

        cfg = engine_config(spec["h"], spec["w"], spec["working"],
                            spec["past"], spec["future"])
        fps = _file_streaming_worker(
            spec["y4m"], spec["n_frames"], cfg,
            StabilizationMode(spec["mode"]), chunk=spec["chunk"])
        print(json.dumps({"fps": round(fps, 2)}), flush=True)
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=0,
                    help="run one config (1-5); default runs all")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--baseline-frames", type=int, default=28)
    ap.add_argument("--latency-samples", type=int, default=50)
    ap.add_argument("--past", type=int, default=30)
    ap.add_argument("--future", type=int, default=15)
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--skip-scan", action="store_true",
                    help="skip the streaming-scan throughput number")
    ap.add_argument("--skip-drift", action="store_true")
    ap.add_argument("--skip-compat-drift", action="store_true")
    ap.add_argument("--skip-ref-window", action="store_true")
    args = ap.parse_args()

    todo = [args.config] if args.config else sorted(CONFIGS)
    results = {}

    log("measuring dispatch/relay overhead (trivial jitted op + fetch)...")
    overhead_ms = round(measure_dispatch_overhead(), 2)
    log(f"dispatch_overhead_ms = {overhead_ms}")

    def emit():
        # cumulative summary line after EVERY config: if an external time
        # cap kills the process mid-run, the last complete stdout line is
        # still a valid result for the configs measured so far
        head_idx = args.config if args.config else 1
        head = results.get(head_idx) or next(iter(results.values()))
        out = {
            "metric": f"frames/sec/chip, {head['name']}",
            "value": head.get("tpu_fps_per_chip"),
            "unit": "fps",
            "vs_baseline": head.get("vs_baseline"),
        }
        for k in ("p50_latency_ms", "p99_latency_ms", "step_ms_pipelined",
                  "dispatch_overhead_ms", "corner_drift_vs_truth_px",
                  "opencv_drift_vs_truth_px", "drift_vs_reference_px"):
            if k in head:
                out[k] = head[k]
        out["configs"] = {str(k): v for k, v in results.items()}
        print(json.dumps(out), flush=True)

    for idx in todo:
        try:
            results[idx] = bench_one(idx, args, dispatch_overhead_ms=overhead_ms)
        except Exception as e:  # keep the driver contract on partial failure
            log(f"config {idx} FAILED: {type(e).__name__}: {e}")
            results[idx] = {"name": CONFIGS[idx]["name"], "error": str(e)[:300]}
        emit()


if __name__ == "__main__":
    main()
