#!/usr/bin/env python
"""Quantify what the dense-LK per-point corner polish buys.

Runs bench config 1's drift-vs-analytic-truth measurement with
corner_polish_iters = 1 (round-3 default) vs 0 (dense maps only), to decide
whether the polish's one-hot patch extraction (~1.2 ms/frame of the 2.6 ms
config-2 offline step, benchmarks/other_ops_probe.py) pays for itself.

Usage: python benchmarks/polish_probe.py [--frames 40]
"""

import argparse
import dataclasses
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args()

    import numpy as np

    import bench
    from video_stabilization_tpu.config import LKConfig, StabilizationMode
    from video_stabilization_tpu.engine import Stabilizer
    from video_stabilization_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    footage, traj = bench.make_footage(args.frames, args.height, args.width)
    cfg0 = bench.engine_config(args.height, args.width, 360, 30, 15)
    wh, ww = cfg0.working_size

    qs_true = None
    for polish in (1, 0):
        cfg = dataclasses.replace(
            cfg0, lk=dataclasses.replace(cfg0.lk, corner_polish_iters=polish))
        stab = Stabilizer(cfg, StabilizationMode.GLOBAL_SMOOTHING, seed=0)
        hs = []
        for i in range(args.frames):
            stab.stabilize_frame(footage[i])
            hs.append(np.asarray(stab.carry.last_h, np.float64))
        if qs_true is None:
            qs_true = bench.analytic_smoothing_truth(
                traj, len(hs), wh, ww, 30, 15)
        drift = bench.corner_drift(hs, qs_true, ww, wh)
        print(f"polish={polish}: corner_drift_vs_truth = {drift:.4f} px",
              flush=True)


if __name__ == "__main__":
    main()
