#!/usr/bin/env python
"""Benchmarks: TPU engine vs OpenCV-CPU reference pipeline, 5 configs.

Driver contract: prints EXACTLY ONE JSON line on stdout ({"metric",
"value", "unit", "vs_baseline", ..., "configs": {...}}), at the very end
of the run.  Intermediate cumulative snapshots after every config go to
STDERR (visible in the driver's tail for forensics if the process is
killed) and to a state file (--state) that --resume can reload.  Round 3
proved the driver cannot parse multi-line stdout (BENCH_r03: rc=0 but
parsed=null); round 4 proved the suite must fit a hard wall-clock budget
(BENCH_r04: rc=124 mid config 4).  Both are protocol bugs this version
fixes: one stdout line, and a global --deadline with per-section time
boxes that degrade gracefully (skipped sections are recorded per config
under "skipped" instead of silently missing).

BASELINE.json configs:
  1. simulator + global smoothing, working 360, 1080p frames
  2. accumulated LK optical-flow full-motion lock, 360p frames
  3. ORB registration lock, 720p frames
  4. SIFT registration lock + ECC enabled, 1080p frames
  5. batched 8-stream 1080p, translation-lock decomposition (the real
     vmapped path: one chip dispatch stabilizes all 8 streams per frame)

Measurement protocol (see .claude/skills/verify/SKILL.md):
  - Throughput: lax.scan / offline-chunked over the clip — one dispatch
    per clip or chunk, so the number is chip throughput, not host
    dispatch rate.  All timings end with a host fetch of an on-device
    checksum (the only reliable completion barrier on this relay).
  - Every jitted program is compiled/warmed BEFORE its timed section
    (round 4's config-2 headline collapsed to 0.23 fps because a cold
    remote compile landed inside the timer — fixed in
    _file_streaming_worker, which now compiles before t0).
  - Latency: >= 50 per-frame dispatches, each closed by a forced fetch;
    p50/p99 reported raw (includes this environment's ~27 ms relay
    round-trip per sync); samples >3x p50 are counted and the max sample
    is named in p99_note so an unexplained p99 can't reach the JSON.
  - The OpenCV baseline runs first per config, after waiting (<=90 s)
    for host quiescence (1-min loadavg <= 0.35 on this 1-core host);
    provenance records the loadavg actually seen.  It is a faithful CPU
    replica of the reference per-frame hot path with the reference's
    hyperparameters; config 5's baseline runs the accumulated-lock mode
    (the reference's translation lock is a documented no-op,
    src/stabilizer.cpp:790) on one stream.
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


class Budget:
    """Global wall-clock budget with per-config reserves.

    ``have(est, n_left)`` answers "can I afford an ``est``-second section
    while still leaving enough to run the core measurements of the
    ``n_left`` configs after this one?".  Core reserve is 300 s/config —
    roughly one cold remote compile plus render/baseline/run on this
    environment's 1-5 min remote-compile path; warm-cache runs use far
    less and everything fits."""

    CORE_RESERVE_S = 300
    CLOSE_MARGIN_S = 60

    def __init__(self, seconds):
        self.t0 = time.monotonic()
        self.total = seconds

    def remaining(self):
        return self.total - (time.monotonic() - self.t0)

    def have(self, est, n_left=0):
        return (self.remaining()
                - (self.CORE_RESERVE_S * n_left + self.CLOSE_MARGIN_S)) > est


BUDGET = None  # set in main()
RELAY = None   # set in main(): this run's measured tunnel costs


def section(result, name, est, n_left, fn, *args, **kwargs):
    """Run an optional measurement section under the global budget; on
    skip, record why under result["skipped"] so the JSON says what is
    missing and why instead of silently omitting it."""
    rem = int(BUDGET.remaining())
    if not BUDGET.have(est, n_left):
        note = f"{name} (est {est}s, {rem}s left, {n_left} configs queued)"
        result.setdefault("skipped", []).append(note)
        log(f"SKIP section {name}: {note}")
        return None
    t0 = time.monotonic()
    try:
        out = fn(*args, **kwargs)
    except Exception as e:
        log(f"section {name} FAILED: {type(e).__name__}: {e}")
        result.setdefault("skipped", []).append(
            f"{name} (failed: {type(e).__name__})")
        return None
    log(f"section {name}: {time.monotonic() - t0:.0f}s")
    return out


def make_footage(n_frames, height, width, n_streams=1, on_cpu=False):
    """Render simulator footage ON DEVICE and leave it there.

    Returns (frames, traj0): frames is (T, H, W, 3) u8 for one stream or
    (T, S, H, W, 3) u8 for a batch; traj0 yields analytic ground-truth
    homographies for fidelity metrics.  ``on_cpu=True`` renders on the CPU
    backend instead — used by the config-2 e2e prepass, which must finish
    before this process ever initializes a TPU client (see main())."""
    import contextlib

    import jax
    import jax.numpy as jnp

    from video_stabilization_tpu.sim import (
        DEFAULT_APP_PARAMS, make_default_texture, render_frame,
        shake_trajectory,
    )

    if on_cpu:
        # NOTE: only valid when the process was started with
        # jax_platforms=cpu (jax.devices("cpu") would otherwise initialize
        # the TPU client as a side effect) — see --e2e-render-worker
        ctx = jax.default_device(jax.devices("cpu")[0])
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        return _make_footage_inner(n_frames, height, width, n_streams,
                                   jax, jnp, DEFAULT_APP_PARAMS,
                                   make_default_texture, render_frame,
                                   shake_trajectory)


def _make_footage_inner(n_frames, height, width, n_streams, jax, jnp,
                        DEFAULT_APP_PARAMS, make_default_texture,
                        render_frame, shake_trajectory):
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

    def measure(c, r):
        t0 = time.perf_counter()
        for _ in range(r):
            c, (out, _) = scan(c, frames)
        _checksum(out)
        return c, r * n_frames * n_streams / (time.perf_counter() - t0)

    # two-phase: estimate the rate, then re-measure over a >=2 s window so
    # this session's noisy relay dispatch costs amortize (a 0.15 s window
    # mis-measured the same program by up to 3x on 2026-08-20)
    carry, fps_est = measure(carry, reps)
    reps_long = max(reps, min(40, int(2.0 * fps_est / (n_frames * n_streams))
                              + 1))
    return measure(carry, reps_long)[1]


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

    def measure(c, r):
        t0 = time.perf_counter()
        total = 0
        for _ in range(r):
            c, out, done = run_once(c)
            total += done
        _checksum(out)
        return c, total * n_streams / (time.perf_counter() - t0)

    # two-phase (see bench_throughput_scan): relay-noise-resistant window
    carry, fps_est = measure(carry, reps)
    per_rep = (done or n_frames) * n_streams
    reps_long = max(reps, min(40, int(2.0 * fps_est / per_rep) + 1))
    return measure(carry, reps_long)[1]


def _file_streaming_worker(y4m_path, n_frames, cfg, mode, chunk=16):
    """End-to-end fps of the native file path: NativeY4MReader BLOCK fread
    (one C call per chunk, contiguous (K, bytes) planes) -> chunked planar
    H2D -> on-device YUV->BGR -> offline batched pipeline.  Dispatch is
    async, so the host reads chunk i+1 while the device crunches chunk i —
    no producer thread, no ring, no per-frame Python.  The number includes
    ALL host costs (the native decoder is in the measured loop, reference
    src/main_utils.cpp:262-281,397-417).

    Ideally runs in a process that has never fetched device data: this
    relay's first D2H permanently collapses H2D bandwidth ~45x (1.4 GB/s
    -> 30 MB/s, measured 2026-08-20) in addition to the known ~27 ms sync
    mode.  The completion barrier is ONE end-of-run checksum fetch —
    ``block_until_ready`` does NOT await remote execution in the relay's
    pre-fetch mode (probed 2026-08-20: bur returned in 0 ms while the real
    work took seconds), so the fetch, mode-flip cost and all, is INSIDE
    the measured time.

    ROUND-5 FIX (VERDICT r4 weak #1): the jitted program is compiled
    BEFORE t0 — jit compilation is synchronous on the host, so one warm
    call on a throwaway carry compiles everything without any D2H fetch;
    round 4 started the timer cold and a 1-5 min remote compile landed
    inside it (recorded 0.23 fps).  The worker also times every chunk's
    H2D upload so the result ships with the relay bandwidth it actually
    saw and the e2e ceiling that bandwidth implies — through this
    session's tunnel (~5 MB/s) the pipeline is transfer-bound, and the
    ceiling field proves the gap to the device-resident rate is the link,
    not the compute.  Returns a dict (fps/compile_s/h2d_MBps/
    ceiling_fps)."""
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

    # ---- warm/compile pass, OUTSIDE the timer ---------------------------
    src = NativeY4MReader(y4m_path)
    warm_block = src.read_yuv_block(chunk)
    src.close()
    warm_carry = init_carry(cfg_off, int(mode), jax.random.key(1))
    t_c = time.perf_counter()
    warm_carry, (warm_out, _) = scan_yuv(warm_carry, jnp.asarray(warm_block))
    compile_s = time.perf_counter() - t_c   # sync host compile; exec is async
    # flip into post-fetch mode so uploads/dispatches happen (and are
    # costed) as they are issued rather than deferred to the final fetch
    _checksum(warm_out)
    del warm_carry, warm_out

    # ---- measured pass ---------------------------------------------------
    src = NativeY4MReader(y4m_path)
    carry = init_carry(cfg_off, int(mode), jax.random.key(0))
    t0 = time.perf_counter()
    done = 0
    out = None
    up_rates = []
    while done + chunk <= n_frames:
        block = src.read_yuv_block(chunk)       # one native call
        if block is None or len(block) < chunk:
            break
        tu = time.perf_counter()
        dev = jax.device_put(block)
        dev.block_until_ready()                 # transfer complete
        up_rates.append(block.nbytes / (time.perf_counter() - tu) / 1e6)
        carry, (out, _) = scan_yuv(carry, dev)  # async; overlaps next fread
        done += chunk
    if out is not None:
        _checksum(out)     # REAL completion barrier: one D2H, inside the time
    dt = time.perf_counter() - t0
    src.close()
    bytes_per_frame = (h * w * 3) // 2 if c420 else h * w * 3
    bw = float(np.median(up_rates)) if up_rates else float("nan")
    return {
        "fps": (done / dt if done else float("nan")),
        "compile_s": compile_s,
        "h2d_MBps": bw,
        "ceiling_fps": bw * 1e6 / bytes_per_frame,
    }


def bench_file_streaming(y4m_path, n_frames, cfg, mode, chunk=16,
                         timeout_s=600):
    """Run the e2e file-streaming measurement in ONE fresh subprocess with
    EXCLUSIVE TPU access — main() schedules this before the parent process
    initializes its own TPU client (round 5 measured the same worker at
    5.9 fps while the parent held a live client vs 12 fps exclusive; the
    relay serializes two clients badly).  The worker compiles before its
    timer, so no separate warm pass is needed.  Falls back to an
    in-process measurement (labeled) if the subprocess fails.  Returns a
    result dict."""
    import json as _json
    import subprocess

    spec = dict(y4m=y4m_path, n_frames=n_frames, chunk=chunk,
                h=cfg.frame_height, w=cfg.frame_width,
                working=cfg.working_height, past=cfg.past_frames,
                future=cfg.future_frames, mode=int(mode))
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--e2e-stream-worker",
             _json.dumps(spec)],
            capture_output=True, text=True, timeout=timeout_s)
        if proc.returncode != 0:
            raise RuntimeError(f"worker rc={proc.returncode}: "
                               f"{proc.stderr[-300:]}")
        payload = _json.loads(proc.stdout.strip().splitlines()[-1])
        payload["e2e_path"] = "fresh subprocess, exclusive TPU"
        return payload
    except Exception as e:
        log(f"e2e subprocess failed ({type(e).__name__}: {e}); "
            "falling back to in-process measurement")
        payload = _file_streaming_worker(
            y4m_path, n_frames, cfg, mode, chunk=chunk)
        payload["e2e_path"] = "in-process fallback (shared TPU client)"
        return payload


def measure_relay(n=30):
    """Calibrate THIS RUN's relay-tunnel costs and put them in the JSON.

    The TPU here sits behind a relay whose performance varies by session
    (measured 2026-08-20: per-dispatch sync 27 ms -> 57 ms and H2D
    40 MB/s -> ~5 MB/s vs round 3's notes).  Every host-in-the-loop number
    (per-frame latency, e2e file streaming) is bounded by these, so the
    bench measures them up front: ``sync_ms`` is the p50 of a trivial
    jitted dispatch + blocking scalar fetch; ``h2d_MBps`` is the median of
    three 5.5 MB uint8 uploads.  Device-resident throughput (lax.scan /
    offline chunked, one fetch amortized over the clip) is unaffected."""
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
    sync_ms = float(np.percentile(1000.0 * np.asarray(samples), 50))

    buf = np.random.default_rng(0).integers(
        0, 255, 5_500_000, dtype=np.uint8)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_put(buf).block_until_ready()
        rates.append(buf.nbytes / (time.perf_counter() - t0) / 1e6)
    return {"sync_ms": round(sync_ms, 2),
            "h2d_MBps": round(float(np.median(rates)), 1)}


def _latency_stats(lat_ms):
    """p50/p99 plus stall forensics: any sample >3x p50 is counted and the
    worst one named, so an exploded p99 always ships with its cause
    candidate in the JSON (VERDICT r4 item 5: config 1 recorded p99
    424 ms vs p50 40 ms with no explanation)."""
    p50 = float(np.percentile(lat_ms, 50))
    p99 = float(np.percentile(lat_ms, 99))
    stats = {"p50": p50, "p99": p99}
    stalls = np.flatnonzero(lat_ms > 3.0 * p50)
    if len(stalls):
        am = int(np.argmax(lat_ms))
        stats["note"] = (
            f"{len(stalls)}/{len(lat_ms)} samples >3x p50; max "
            f"{float(lat_ms[am]):.0f} ms at sample {am} — isolated relay "
            f"stall(s), not a recompile (all samples share one executable)")
        clean = lat_ms[lat_ms <= 3.0 * p50]
        stats["p99_excl_stalls"] = float(np.percentile(clean, 99))
    return stats


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
    # jitted completion barrier: ONE dispatch + scalar fetch per sample
    # (an eager astype+sum chain costs extra relay round-trips per sample)
    csum = jax.jit(lambda o: o.astype(jnp.float32).sum())
    carry, (out, _) = step(carry, frames[0])
    float(csum(out))
    n = frames.shape[0]
    lat = []
    for i in range(max(n_lat, n)):
        f = frames[i % n]
        t0 = time.perf_counter()
        carry, (out, _) = step(carry, f)
        float(csum(out))
        lat.append(time.perf_counter() - t0)
    return _latency_stats(1000.0 * np.asarray(lat))


def bench_latency(frames, cfg, mode, n_lat=50, collect_h=False):
    """Per-frame dispatch latency (p50/p99 + stall forensics, raw incl.
    relay sync) plus the pipelined per-frame step time, via the streaming
    step path."""
    import jax
    import jax.numpy as jnp

    from video_stabilization_tpu.engine import Stabilizer
    from video_stabilization_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    # jitted completion barrier: ONE dispatch + scalar fetch per sample
    # (an eager astype+sum chain costs extra relay round-trips per sample)
    csum = jax.jit(lambda o: o.astype(jnp.float32).sum())
    stab = Stabilizer(cfg, mode, seed=0)
    out = stab.stabilize_frame(frames[0])
    float(csum(out))                            # warm + first (slow) fetch

    # pipelined: N dispatches, one fetch
    stab = Stabilizer(cfg, mode, seed=0)
    n_pipe = min(32, frames.shape[0])
    t0 = time.perf_counter()
    for i in range(n_pipe):
        out = stab.stabilize_frame(frames[i])
    float(csum(out))
    step_ms = (time.perf_counter() - t0) / n_pipe * 1000.0

    # raw per-dispatch latency, >= n_lat samples
    lat = []
    hs = []
    stab = Stabilizer(cfg, mode, seed=0)
    n = frames.shape[0]
    for i in range(max(n_lat, n)):
        f = frames[i % n]
        t0 = time.perf_counter()
        out = stab.stabilize_frame(f)
        float(csum(out))
        lat.append(time.perf_counter() - t0)
        if collect_h and i < n:
            hs.append(np.asarray(stab.carry.last_h, np.float64))
    stats = _latency_stats(1000.0 * np.asarray(lat))
    stats["step_ms_pipelined"] = step_ms
    return stats, (hs if collect_h else None)


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


def e2e_prepass(args):
    """Config 2's end-to-end file-streaming measurement, scheduled FIRST —
    before this process creates a TPU client — so the worker subprocess
    owns the TPU exclusively (a second live client halves the worker's
    rate through the relay).  Footage is rendered on the CPU backend;
    returns {footage_np, traj, e2e} for bench_one(2) to reuse."""
    import subprocess

    from video_stabilization_tpu.config import StabilizationMode

    spec = CONFIGS[2]
    h, w = spec["size"]
    n_frames = args.frames
    mode = StabilizationMode[MODE_MAP[spec["mode"]]]
    cfg = engine_config(h, w, spec["working"], args.past, args.future)

    y4m = "/tmp/bench_config2.y4m"
    npy = "/tmp/bench_config2_frames.npy"
    repeat = max(1, -(-160 // n_frames))          # ceil to >=160 frames
    total_frames = repeat * n_frames
    log(f"e2e prepass: CPU-rendering {n_frames} frames at {w}x{h} and "
        f"writing {total_frames} ({repeat}x clip) to {y4m} "
        "(subprocess; this process must not init a backend yet)...")
    rspec = dict(n_frames=n_frames, h=h, w=w, repeat=repeat, y4m=y4m,
                 npy=npy)
    proc = subprocess.run(
        [sys.executable, __file__, "--e2e-render-worker", json.dumps(rspec)],
        capture_output=True, text=True,
        timeout=int(min(900, max(120, BUDGET.remaining() - 1800))))
    if proc.returncode != 0:
        raise RuntimeError(f"render worker rc={proc.returncode}: "
                           f"{proc.stderr[-300:]}")
    frames_np = np.load(npy)

    timeout_s = int(min(900, max(180, BUDGET.remaining() - 1500)))
    log(f"e2e prepass: exclusive-TPU worker (timeout {timeout_s}s)...")
    e2e = bench_file_streaming(y4m, total_frames, cfg, mode, chunk=16,
                               timeout_s=timeout_s)
    log(f"e2e prepass: {e2e['fps']:.1f} fps ({e2e['e2e_path']}, compile "
        f"{e2e['compile_s']:.0f}s outside timer, H2D "
        f"{e2e['h2d_MBps']:.1f} MB/s)")
    return {"footage_np": frames_np, "traj": None, "e2e": e2e}


def wait_for_quiescence(max_wait_s=90, target=0.35):
    """Wait (bounded) for the 1-core host to go quiet before the CPU
    baseline (VERDICT r4 weak #7: config 2's baseline ran at loadavg
    1.36).  Returns (loadavg_at_measure, seconds_waited)."""
    waited = 0
    load = os.getloadavg()[0]
    while load > target and waited < max_wait_s and BUDGET.have(30, 0):
        time.sleep(10)
        waited += 10
        load = os.getloadavg()[0]
    return load, waited


def run_opencv_baseline(result, spec, footage, n_streams, n_base, args):
    load, waited = wait_for_quiescence()
    log(f"OpenCV-CPU baseline ({n_base} frames, loadavg {load:.2f}, "
        f"waited {waited}s)...")
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
        f"measured first, loadavg {load:.2f} after {waited}s quiescence "
        f"wait ({os.cpu_count()} core host)")
    return cv_fps, hs_cv, frames_np


def production_drift(footage, cfg, hs_cv, n_base):
    """Drift of the all-TPU production estimator vs the OpenCV replica on
    identical footage, with the reference-compat smoothing quirks pinned so
    the only difference is the estimator stack (device GFTT+LK+RANSAC vs
    cv2).  Complements the compat referee (host cv2exact stages), VERDICT
    r4 item 4.  Reference behavior: src/stabilizer.cpp:224-225,734-736."""
    import dataclasses

    from video_stabilization_tpu.config import StabilizationMode as SM
    from video_stabilization_tpu.engine import Stabilizer

    cfg_prod = dataclasses.replace(
        cfg, reference_compat=True,
        static_mode=int(SM.GLOBAL_SMOOTHING),
    )
    stab = Stabilizer(cfg_prod, SM.GLOBAL_SMOOTHING, seed=0)
    hs_prod = []
    for i in range(n_base):
        stab.stabilize_frame(footage[i])
        hs_prod.append(np.asarray(stab.carry.last_h, np.float64))
    wh2, ww2 = cfg.working_size
    return corner_drift(hs_prod, hs_cv, ww2, wh2)


def compat_drift(footage, cfg, hs_cv, n_base):
    """Fidelity referee vs the REFERENCE pipeline: reference-compat quirks
    + cv2exact GFTT (cv2's element-exact corner list, ops/gftt_host.py) +
    cv2exact LK (OpenCV's iteration schedule) + cv2exact RANSAC (bit-exact
    replica of estimateAffinePartial2D's MWC hypothesis stream, sequential
    early exit, and LM polish — motion/cv2_ransac.py, run as a host
    estimator stage), measured against the OpenCV replica on identical
    footage."""
    import dataclasses

    from video_stabilization_tpu.config import (
        GFTTConfig, LKConfig, RansacConfig, StabilizationMode as SM,
    )
    from video_stabilization_tpu.engine import Stabilizer

    cfg_compat = dataclasses.replace(
        cfg, reference_compat=True,
        lk=LKConfig(method="cv2exact"),
        gftt=GFTTConfig(max_features=1300, selection="host"),
        ransac=RansacConfig(method="cv2exact"),
        static_mode=int(SM.GLOBAL_SMOOTHING),
    )
    stab = Stabilizer(cfg_compat, SM.GLOBAL_SMOOTHING, seed=0)
    hs_compat = []
    for i in range(n_base):
        stab.stabilize_frame(footage[i])
        hs_compat.append(np.asarray(stab.carry.last_h, np.float64))
    wh2, ww2 = cfg.working_size
    return corner_drift(hs_compat, hs_cv, ww2, wh2)


def bench_one(idx, args, n_left, dispatch_overhead_ms=None, prepass=None):
    import dataclasses

    from video_stabilization_tpu.config import StabilizationMode

    spec = CONFIGS[idx]
    h, w = spec["size"]
    n_streams = spec.get("streams", 1)
    n_frames = min(args.frames, spec.get("max_frames", args.frames))
    mode = StabilizationMode[MODE_MAP[spec["mode"]]]
    cfg = engine_config(h, w, spec["working"], args.past, args.future,
                        ecc=(spec["mode"] == "sift"))

    log(f"config {idx}: {spec['name']} "
        f"({int(BUDGET.remaining())}s budget left)")
    if prepass is not None:
        # reuse the CPU-rendered prepass footage so the e2e file, the CPU
        # baseline, and the device paths all see bit-identical pixels
        import jax
        import jax.numpy as jnp

        footage = jax.device_put(jnp.asarray(prepass["footage_np"]))
        footage.block_until_ready()
        traj = prepass["traj"]
    else:
        log(f"rendering {n_frames} frames x {n_streams} stream(s) "
            f"at {w}x{h}...")
        footage, traj = make_footage(n_frames, h, w, n_streams)

    result = {"name": spec["name"]}
    if dispatch_overhead_ms is not None:
        # fixed relay/sync cost per blocking fetch in this environment, so
        # p50_latency_ms - dispatch_overhead_ms ~= step_ms_pipelined is
        # auditable from the JSON alone
        result["dispatch_overhead_ms"] = dispatch_overhead_ms

    # --- OpenCV-CPU baseline FIRST, before any TPU work loads the host ----
    hs_cv = None
    cv_fps = None
    if not args.skip_baseline:
        n_base = min(args.baseline_frames, n_frames)
        base = run_opencv_baseline(result, spec, footage, n_streams,
                                   n_base, args)
        cv_fps, hs_cv, _ = base

    # --- core throughput (always attempted; without it there is no
    # headline for this config at all) ------------------------------------
    log("TPU throughput (offline batched pipeline)...")
    chunk = 8 if n_streams > 1 else 16
    tpu_fps = bench_throughput_offline(footage, cfg, mode, n_streams,
                                       chunk=chunk)
    log(f"TPU: {tpu_fps:.1f} frames/sec/chip (offline, chunk {chunk})")
    result["tpu_fps_per_chip"] = round(tpu_fps, 2)
    result["throughput_path"] = f"offline batched (chunk {chunk})"

    if not args.skip_scan:
        # the streaming scan path (one frame per in-scan step) — the rate a
        # live single-stream feed achieves; offline is the clip/VOD rate
        if n_streams > 1:
            cfg_thr = dataclasses.replace(cfg, static_mode=int(mode))
        else:
            cfg_thr = cfg
        fps_scan = section(result, "streaming_scan", 240, n_left,
                           bench_throughput_scan, footage, cfg_thr, mode,
                           n_streams)
        if fps_scan is not None:
            result["tpu_fps_streaming_scan"] = round(fps_scan, 2)
            log(f"TPU streaming scan: {fps_scan:.1f} frames/sec/chip")
            if n_streams == 1:
                # lax.scan executes the per-frame step strictly sequentially
                # on device, so the scan rate's reciprocal IS the true
                # per-frame device latency — free of this environment's
                # relay-sync and host-dispatch artifacts
                result["step_ms_device"] = round(1000.0 / fps_scan, 2)
            # headline = the better of the two real production paths (both
            # end-to-end device-resident; config 2's headline is replaced
            # below by the native-file e2e rate regardless)
            if fps_scan > tpu_fps:
                result["tpu_fps_per_chip"] = round(fps_scan, 2)
                result["throughput_path"] = "streaming scan"
                tpu_fps = fps_scan

    if idx == 2 and prepass is not None and "e2e" in prepass:
        # the measured config-2 number must ingest a real file through the
        # native decoder; main() ran that measurement in an exclusive-TPU
        # subprocess before this process touched the TPU (see e2e_prepass)
        e2e = prepass["e2e"]
        fps_e2e = float(e2e["fps"])
        log(f"e2e incl. native decode (prepass): {fps_e2e:.1f} fps "
            f"({e2e['e2e_path']}, compile {e2e['compile_s']:.0f}s outside "
            f"timer, H2D {e2e['h2d_MBps']:.1f} MB/s -> relay ceiling "
            f"{e2e['ceiling_fps']:.1f} fps)")
        result["tpu_fps_device_resident"] = result["tpu_fps_per_chip"]
        result["vs_baseline_device_resident"] = (
            round(tpu_fps / cv_fps, 3) if cv_fps else None)
        result["tpu_fps_per_chip"] = round(fps_e2e, 2)
        result["throughput_path"] = "native Y4M decode -> offline batched"
        result["e2e_path"] = e2e["e2e_path"]
        result["e2e_compile_s"] = round(e2e["compile_s"], 1)
        result["e2e_h2d_MBps"] = round(e2e["h2d_MBps"], 1)
        result["e2e_relay_ceiling_fps"] = round(e2e["ceiling_fps"], 1)
        tpu_fps = fps_e2e
        result["ingest_note"] = (
            "headline streams C420 Y4M via the native C++ block reader "
            "(one fread/chunk) -> planar H2D -> on-device YUV->BGR -> "
            "offline pipeline; through this environment's relay tunnel the "
            "path is H2D-transfer-bound — e2e_relay_ceiling_fps is the "
            "measured-bandwidth ceiling it runs at; "
            "tpu_fps_device_resident is the same pipeline once frames are "
            "on device")

    hs_tpu = None
    if n_streams == 1:
        collect = spec["mode"] == "smoothing" and not args.skip_drift
        latr = section(result, "latency", 150, n_left, bench_latency,
                       footage, cfg, mode, args.latency_samples, collect)
        if latr is not None:
            stats, hs_tpu = latr
            log(f"latency p50 {stats['p50']:.1f} ms / p99 "
                f"{stats['p99']:.1f} ms (pipelined step "
                f"{stats['step_ms_pipelined']:.1f} ms)")
            result.update(p50_latency_ms=round(stats["p50"], 2),
                          p99_latency_ms=round(stats["p99"], 2),
                          step_ms_pipelined=round(
                              stats["step_ms_pipelined"], 2))
            if "note" in stats:
                result["p99_note"] = stats["note"]
                result["p99_excl_stalls_ms"] = round(
                    stats["p99_excl_stalls"], 2)
    else:
        result["streams"] = n_streams
        result["per_stream_fps"] = round(tpu_fps / n_streams, 2)
        # BASELINE config 5 names BOTH global smoothing and the translation/
        # rotation-lock decomposition: measure the batched smoothing path,
        # the rotation-lock workload, a 4-stream real-time operating point,
        # and the batched per-dispatch latency.
        from video_stabilization_tpu.config import StabilizationMode as SM

        fps_sm = section(result, "batched_smoothing", 240, n_left,
                         bench_throughput_offline, footage, cfg,
                         SM.GLOBAL_SMOOTHING, n_streams, chunk)
        if fps_sm is not None:
            result["smoothing_fps_per_chip"] = round(fps_sm, 2)
            result["smoothing_per_stream_fps"] = round(fps_sm / n_streams, 2)
            log(f"TPU smoothing: {fps_sm:.1f} aggregate fps")

        fps4 = section(result, "tlock_4stream", 240, n_left,
                       bench_throughput_offline, footage[:, :4], cfg, mode,
                       4, chunk)
        if fps4 is not None:
            result["tlock_4stream_fps_per_chip"] = round(fps4, 2)
            result["tlock_4stream_per_stream_fps"] = round(fps4 / 4, 2)
            log(f"TPU 4-stream: {fps4:.1f} aggregate "
                f"({fps4 / 4:.1f} fps/stream)")

        # the batched rotation-lock workload (reference derivation
        # src/stabilizer.cpp:1257-1260, a no-op there; implemented here)
        fps_rl = section(result, "batched_rotation_lock", 240, n_left,
                         bench_throughput_offline, footage, cfg,
                         SM.ROTATION_LOCK, n_streams, chunk)
        if fps_rl is not None:
            result["rotation_lock_fps_per_chip"] = round(fps_rl, 2)
            result["rotation_lock_per_stream_fps"] = round(
                fps_rl / n_streams, 2)
            log(f"TPU rotation-lock: {fps_rl:.1f} aggregate fps")

        # per-dispatch latency of the batched step: one dispatch = one
        # frame of all 8 streams
        statsb = section(result, "batched_latency", 240, n_left,
                         bench_batched_latency, footage, cfg, mode,
                         n_streams, args.latency_samples)
        if statsb is not None:
            result["p50_latency_ms"] = round(statsb["p50"], 2)
            result["p99_latency_ms"] = round(statsb["p99"], 2)
            if "note" in statsb:
                result["p99_note"] = statsb["note"]
            log(f"batched latency p50 {statsb['p50']:.1f} ms / p99 "
                f"{statsb['p99']:.1f} ms (one dispatch, all "
                f"{n_streams} streams)")

    if cv_fps is not None:
        result["vs_baseline"] = round(tpu_fps / cv_fps, 3)
        if n_streams > 1:
            result["baseline_note"] = (
                "aggregate 8-stream tlock chip fps vs single-stream CPU "
                "accumulated-lock (reference tlock is a no-op)")

    # --- fidelity metrics (config 1) --------------------------------------
    if not args.skip_baseline and n_streams == 1 \
            and spec["mode"] == "smoothing" and not args.skip_drift:
        if hs_tpu:
            def drift_truth():
                wh2, ww2 = cfg.working_size
                qs_true = analytic_smoothing_truth(
                    traj, len(hs_tpu), wh2, ww2, args.past, args.future)
                return (corner_drift(hs_tpu, qs_true, ww2, wh2),
                        corner_drift(hs_cv, qs_true[: len(hs_cv)], ww2, wh2))

            dt_r = section(result, "drift_vs_truth", 90, n_left, drift_truth)
            if dt_r is not None:
                result["corner_drift_vs_truth_px"] = round(dt_r[0], 4)
                result["opencv_drift_vs_truth_px"] = round(dt_r[1], 4)
                log(f"corner drift vs analytic truth: TPU {dt_r[0]:.4f} px, "
                    f"OpenCV {dt_r[1]:.4f} px")

        if hs_cv and not args.skip_compat_drift:
            n_base = len(hs_cv)
            d_ref = section(result, "compat_drift", 420, n_left,
                            compat_drift, footage, cfg, hs_cv, n_base)
            if d_ref is not None:
                result["drift_vs_reference_px"] = round(d_ref, 5)
                log(f"drift vs reference replica (compat referee): "
                    f"{d_ref:.5f} px")
            d_prod = section(result, "production_drift", 300, n_left,
                             production_drift, footage, cfg, hs_cv, n_base)
            if d_prod is not None:
                result["drift_vs_reference_px_production"] = round(d_prod, 4)
                result["drift_note"] = (
                    "drift_vs_reference_px: compat referee (host cv2exact "
                    "GFTT/RANSAC stages between jitted halves); _production: "
                    "the all-TPU estimator, same compat smoothing quirks — "
                    "the gap is device-vs-cv2 estimator selection noise")
                log(f"drift vs reference replica (production estimator): "
                    f"{d_prod:.4f} px")

    if idx == 1 and not args.skip_ref_window:
        # BASELINE default window is 30/15; the reference's own default is
        # 2.0s/1.5s = 60/45 @ 30 fps (106-frame ring, ~660 MB at 1080p).
        # Demonstrate it fits and performs.
        def ref_window():
            cfg_ref = engine_config(h, w, spec["working"], 60, 45)
            return bench_throughput_offline(footage, cfg_ref, mode, 1,
                                            chunk=16)

        fps_ref = section(result, "ref_window_60_45", 420, n_left,
                          ref_window)
        if fps_ref is not None:
            result["tpu_fps_ref_window_60_45"] = round(fps_ref, 2)
            log(f"TPU @ 60/45 window: {fps_ref:.1f} fps")
    return result


def snapshot_json(results, args):
    head_idx = args.config if args.config else 1
    head = results.get(head_idx) or next(iter(results.values()))
    out = {
        "metric": f"frames/sec/chip, {head['name']}",
        "value": head.get("tpu_fps_per_chip"),
        "unit": "fps",
        "vs_baseline": head.get("vs_baseline"),
    }
    for k in ("p50_latency_ms", "p99_latency_ms", "step_ms_pipelined",
              "step_ms_device", "dispatch_overhead_ms",
              "corner_drift_vs_truth_px", "opencv_drift_vs_truth_px",
              "drift_vs_reference_px", "drift_vs_reference_px_production"):
        if k in head:
            out[k] = head[k]
    if RELAY is not None:
        # this run's measured tunnel costs: every host-in-the-loop number
        # (p50/p99, step_ms_pipelined, e2e fps) is bounded by these; the
        # device-resident rates (tpu_fps_*, step_ms_device) are not
        out["relay"] = RELAY
    out["configs"] = {str(k): v for k, v in results.items()}
    return json.dumps(out)


def main():
    global BUDGET

    if len(sys.argv) >= 3 and sys.argv[1] == "--e2e-stream-worker":
        # fresh-process streaming measurement (exclusive TPU; see
        # _file_streaming_worker) — prints one JSON line and exits
        spec = json.loads(sys.argv[2])
        from video_stabilization_tpu.config import StabilizationMode

        cfg = engine_config(spec["h"], spec["w"], spec["working"],
                            spec["past"], spec["future"])
        payload = _file_streaming_worker(
            spec["y4m"], spec["n_frames"], cfg,
            StabilizationMode(spec["mode"]), chunk=spec["chunk"])
        print(json.dumps({k: round(float(v), 2)
                          for k, v in payload.items()}), flush=True)
        return

    if len(sys.argv) >= 3 and sys.argv[1] == "--e2e-render-worker":
        # CPU-only footage render + Y4M/npy write for the e2e prepass; a
        # separate process so the parent never initializes a backend
        # before the exclusive-TPU streaming worker runs
        import jax

        jax.config.update("jax_platforms", "cpu")
        spec = json.loads(sys.argv[2])
        from video_stabilization_tpu.io import VideoWriter

        footage, _ = make_footage(spec["n_frames"], spec["h"], spec["w"], 1,
                                  on_cpu=True)
        frames_np = np.asarray(footage)
        np.save(spec["npy"], frames_np)
        wr = VideoWriter(spec["y4m"], 30.0, (spec["h"], spec["w"]),
                         subsampling="420")
        for _ in range(spec["repeat"]):
            for f in frames_np:
                wr.write(f)
        wr.close()
        print("{}", flush=True)
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=0,
                    help="run one config (1-5); default runs all")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--baseline-frames", type=int, default=28)
    ap.add_argument("--latency-samples", type=int, default=80)
    ap.add_argument("--past", type=int, default=30)
    ap.add_argument("--future", type=int, default=15)
    ap.add_argument("--deadline", type=float,
                    default=float(os.environ.get("BENCH_DEADLINE_S", 3000)),
                    help="global wall-clock budget in seconds; optional "
                         "sections are skipped (and recorded as skipped) "
                         "to keep the whole 5-config suite inside it")
    ap.add_argument("--state", default="/tmp/bench_state.json",
                    help="cumulative results snapshot, written after every "
                         "config; --resume reloads it")
    ap.add_argument("--resume", action="store_true",
                    help="skip configs already completed in --state")
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--skip-scan", action="store_true",
                    help="skip the streaming-scan throughput number")
    ap.add_argument("--skip-drift", action="store_true")
    ap.add_argument("--skip-compat-drift", action="store_true")
    ap.add_argument("--skip-ref-window", action="store_true")
    args = ap.parse_args()

    BUDGET = Budget(args.deadline)
    todo = [args.config] if args.config else sorted(CONFIGS)
    results = {}
    if args.resume and os.path.exists(args.state):
        try:
            with open(args.state) as f:
                prev = json.load(f)
            results = {int(k): v for k, v in prev.items()
                       if "error" not in v}
            log(f"resumed {sorted(results)} from {args.state}")
        except Exception as e:
            log(f"could not resume from {args.state}: {e}")

    # config 2's e2e needs exclusive TPU access for its worker subprocess:
    # run it before ANYTHING in this process touches the TPU
    prepass = None
    if 2 in todo and 2 not in results:
        try:
            prepass = e2e_prepass(args)
        except Exception as e:
            log(f"e2e prepass FAILED: {type(e).__name__}: {e} "
                "(config 2 will report device paths only)")
            prepass = None

    log(f"deadline {args.deadline:.0f}s; calibrating relay "
        "(dispatch sync + H2D bandwidth)...")
    global RELAY
    RELAY = measure_relay()
    overhead_ms = RELAY["sync_ms"]
    log(f"relay: sync {RELAY['sync_ms']} ms/dispatch, "
        f"H2D {RELAY['h2d_MBps']} MB/s")

    pending = [i for i in todo if i not in results]
    for pos, idx in enumerate(pending):
        n_left = len(pending) - pos - 1
        try:
            results[idx] = bench_one(
                idx, args, n_left, dispatch_overhead_ms=overhead_ms,
                prepass=(prepass if idx == 2 else None))
        except Exception as e:  # keep the driver contract on partial failure
            log(f"config {idx} FAILED: {type(e).__name__}: {e}")
            results[idx] = {"name": CONFIGS[idx]["name"],
                            "error": str(e)[:300]}
        # cumulative snapshot: stderr (driver tail forensics) + state file.
        # NOT stdout — the driver parses stdout as a single JSON document
        # (round 3: rc=0, 5 cumulative stdout lines, parsed=null).
        snap = snapshot_json(results, args)
        log(f"cumulative after config {idx}: {snap}")
        try:
            with open(args.state, "w") as f:
                json.dump({str(k): v for k, v in results.items()}, f)
        except OSError:
            pass

    log(f"done in {BUDGET.total - BUDGET.remaining():.0f}s "
        f"({BUDGET.remaining():.0f}s to spare)")
    print(snapshot_json(results, args), flush=True)


if __name__ == "__main__":
    main()
