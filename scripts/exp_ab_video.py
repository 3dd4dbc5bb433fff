"""Same-process A/B of DenseLKConfig variants on the production video chain.

Reuses bench.py's differential-chain throughput and two EPE scenes, running
each variant back-to-back in ONE process (the only comparison this
environment supports — process drift is ±3-5%).  Variants are named on the
command line; each is a set of DenseLKConfig field overrides on top of the
bench production config.

Usage:
  python scripts/exp_ab_video.py scharr_mxu=False scharr_mxu=True
  python scripts/exp_ab_video.py ''   # production config only
Each positional arg is a comma-separated k=v list ('' = no overrides).
"""

import ast
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lk_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import bench
from lk_tpu.config import DenseLKConfig


def parse_variant(spec: str) -> dict:
    if not spec:
        return {}
    out = {}
    for kv in spec.split(","):
        k, v = kv.split("=")
        out[k.strip()] = ast.literal_eval(v.strip())
    return out


def main():
    specs = sys.argv[1:] or ["scharr_mxu=False", "scharr_mxu=True"]
    base = DenseLKConfig(use_pallas_warp=True, pallas_pyramid=True)
    variants = [(s or "base", dataclasses.replace(base, **parse_variant(s)))
                for s in specs]

    rng = np.random.default_rng(1234)
    scn_t = bench._scene(rng, bench.H, bench.W, 3.7, -2.2)
    scn_z = bench._scene_zoom(rng, bench.H, bench.W, 1.004, 0.3)
    scn_n = bench._scene_natural(bench.H, bench.W, 2.6, -1.8)

    for name, d in variants:
        epe_t = bench.epe_check(d, *scn_t)
        epe_z = bench.epe_check(d, *scn_z)
        epe_n = bench.epe_check(d, *scn_n) if scn_n else float("nan")
        print(f"{name:30s} epe shift={epe_t:.4f} zoom+rot={epe_z:.4f} "
              f"natural={epe_n:.4f}")

    # interleave throughput reps: A B A B to cancel slow process drift
    results = {name: [] for name, _ in variants}
    for round_ in range(2):
        for name, d in variants:
            fps = bench.throughput(d)
            results[name].append(fps)
            print(f"round {round_} {name:30s} {fps:8.1f} fps")
    for name, _ in variants:
        print(f"{name:30s} best {max(results[name]):8.1f} fps "
              f"reps {['%.0f' % r for r in results[name]]}")


if __name__ == "__main__":
    main()
