"""A/B the padded_build prepadded chain (combined pad + offset band-matmul
decimation) against the two-step build at 1080p: throughput (bench
differential protocol, interleaved rounds) and the full EPE gate terms.

Run alone on the TPU: python scripts/exp_padded_build.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from lk_tpu.config import DenseLKConfig

import numpy as np


def main():
    P = dict(use_pallas_warp=True, pallas_pyramid=True)
    variants = {
        "two_step": DenseLKConfig(**P),
        "padded_build": DenseLKConfig(**P, padded_build=True),
    }

    rng = np.random.default_rng(1234)
    st = bench._scene(rng, bench.H, bench.W, 3.7, -2.2)
    sz = bench._scene_zoom(rng, bench.H, bench.W, 1.004, 0.3)
    nat = bench._scene_natural(bench.H, bench.W, 2.6, -1.8)
    for name, d in variants.items():
        e_t = bench.epe_check(d, st[0], st[1], gt=st[2])
        e_z = bench.epe_check(d, sz[0], sz[1], gt=sz[2])
        e_n = (bench.epe_check(d, nat[0], nat[1], gt=nat[2])
               if nat else (float("nan"), float("nan")))
        print(f"{name:14s} epe shift={e_t[0]:.4f}|{e_t[1]:.4f}"
              f" zoom={e_z[0]:.4f}|{e_z[1]:.4f}"
              f" natural={e_n[0]:.4f}|{e_n[1]:.4f}", flush=True)

    results = {n: [] for n in variants}
    for rnd in range(3):
        for n, d in variants.items():
            fps = bench.throughput(d)
            results[n].append(fps)
            print(f"round{rnd} {n:14s} {fps:8.1f} fps", flush=True)
    for n, vals in results.items():
        print(f"{n:14s} best {max(vals):8.1f}  median "
              f"{sorted(vals)[1]:8.1f}", flush=True)


if __name__ == "__main__":
    main()
