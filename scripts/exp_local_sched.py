"""A/B the warp_local schedule: fps + BOTH bench EPE scenes per schedule.

The warp tent-gather is the biggest single compute item in the L0 kernel
(no_warp ablation: 7.4 of 20.5 us/tile); its cost scales with
2*local + 2 taps per pass.  Smaller local at the fine levels trades the
residual-clamp margin (flow deviation from the tile-center reference)
against throughput — this sweep measures both sides IN ONE PROCESS
(cross-process serve/bench drift is ~10%, larger than any expected win).

Usage: python scripts/exp_local_sched.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np

import bench
from lk_tpu.config import DenseLKConfig


def main():
    rng = np.random.default_rng(1234)
    shift = bench._scene(rng, bench.H, bench.W, 3.7, -2.2)
    zoom = bench._scene_zoom(rng, bench.H, bench.W, 1.004, 0.3)
    # a harder zoom too: 1% scale = flow to ~13 px at the borders, within
    # max_disp but far beyond any single tile's local window margin
    zoom2 = bench._scene_zoom(rng, bench.H, bench.W, 1.01, 0.5)
    scheds = [(3, 4, 5), (2, 4, 5), (2, 3, 5), (1, 3, 5)]
    for sched in scheds:
        d = dataclasses.replace(
            DenseLKConfig(use_pallas_warp=True, pallas_pyramid=True),
            warp_local_schedule=sched)
        # epe_check returns (vs_cv2_on_sane_pts, vs_ground_truth) when
        # gt is given (r5 dual gate); sweep on the parity term
        e_t = bench.epe_check(d, *shift)[0]
        e_z = bench.epe_check(d, *zoom)[0]
        e_z2 = bench.epe_check(d, *zoom2)[0]
        fps = bench.throughput(d)
        print(f"local={sched}: {fps:7.1f} fps  "
              f"epe shift={e_t:.4f} zoom={e_z:.4f} zoom1%={e_z2:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
