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
from lk_tpu.config import DenseLKConfig, LKConfig

_LK_FIELDS = {f.name for f in dataclasses.fields(LKConfig)}


def parse_variant(spec: str) -> tuple[dict, dict]:
    """Split 'k=v,...' into (DenseLKConfig overrides, LKConfig overrides) —
    LKConfig keys (e.g. max_level) route to bench.LK_OVERRIDES."""
    dense_kv, lk_kv = {}, {}
    if spec:
        parts, depth, cur = [], 0, []
        for ch in spec:
            depth += {"(": 1, ")": -1}.get(ch, 0)
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        parts.append("".join(cur))
        for kv in parts:
            k, v = kv.split("=", 1)
            k = k.strip()
            (lk_kv if k in _LK_FIELDS else dense_kv)[k] = ast.literal_eval(
                v.strip())
    return dense_kv, lk_kv


def main():
    specs = sys.argv[1:] or ["scharr_mxu=False", "scharr_mxu=True"]
    base = DenseLKConfig(use_pallas_warp=True, pallas_pyramid=True)
    variants = []
    for s in specs:
        dense_kv, lk_kv = parse_variant(s)
        variants.append((s or "base", dataclasses.replace(base, **dense_kv),
                         lk_kv))

    rng = np.random.default_rng(1234)
    scn_t = bench._scene(rng, bench.H, bench.W, 3.7, -2.2)
    scn_z = bench._scene_zoom(rng, bench.H, bench.W, 1.004, 0.3)
    scn_n = bench._scene_natural(bench.H, bench.W, 2.6, -1.8)

    for name, d, lk_kv in variants:
        bench.LK_OVERRIDES = lk_kv
        # r5 dual gate: epe_check returns (vs_cv2_sane, vs_gt) tuples
        epe_t = bench.epe_check(d, *scn_t)[0]
        epe_z = bench.epe_check(d, *scn_z)[0]
        epe_n = (bench.epe_check(d, *scn_n)[0] if scn_n
                 else float("nan"))
        print(f"{name:30s} epe shift={epe_t:.4f} zoom+rot={epe_z:.4f} "
              f"natural={epe_n:.4f}")

    # interleave throughput reps: A B A B to cancel slow process drift
    results = {name: [] for name, _, _ in variants}
    for round_ in range(2):
        for name, d, lk_kv in variants:
            bench.LK_OVERRIDES = lk_kv
            fps = bench.throughput(d)
            results[name].append(fps)
            print(f"round {round_} {name:30s} {fps:8.1f} fps")
    for name, _, _ in variants:
        print(f"{name:30s} best {max(results[name]):8.1f} fps "
              f"reps {['%.0f' % r for r in results[name]]}")


if __name__ == "__main__":
    main()
