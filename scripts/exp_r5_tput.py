"""r5 throughput A/B: fixed-cost levers on the 1080p video chain.

The r4 decomposition puts ~4 us/tile of fixed grid-step cost on the L0
kernel (16 tiles) and L1 (4 tiles).  Wider tiles cut grid steps (L0
16 -> 8, L1 4 -> 2 at tw=1024) if VMEM holds; deeper video chunks
amortize per-launch cost further.  Same-process back-to-back, bench.py
differential protocol, EPE gate spot-checked for any geometry change.

Run alone on the TPU: python scripts/exp_r5_tput.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from lk_tpu.config import DenseLKConfig

P = dict(use_pallas_warp=True, pallas_pyramid=True)

VARIANTS = {
    "prod": DenseLKConfig(**P),
    "tw1024": DenseLKConfig(**P, fused_tile_w=1024),
    "chunk8": DenseLKConfig(**P, video_chunk=8),
    "chunk12": DenseLKConfig(**P, video_chunk=12),
    "tw1024_chunk8": DenseLKConfig(**P, fused_tile_w=1024, video_chunk=8),
    "th136": DenseLKConfig(**P, fused_tile_h=136),
}


def main():
    only = os.environ.get("LK_ABL")
    names = [n for n in VARIANTS if not only or n == only]
    # two interleaved rounds so drift WITHIN the process is visible
    results = {n: [] for n in names}
    for rnd in range(2):
        for n in names:
            # chain lengths must be divisible by the variant's video_chunk
            kc = max(VARIANTS[n].video_chunk, 1)
            os.environ["LK_BENCH_CHAIN0"] = str(3 * kc if kc > 4 else 12)
            os.environ["LK_BENCH_CHAIN1"] = str(9 * kc if kc > 4 else 36)
            try:
                fps = bench.throughput(VARIANTS[n])
            except Exception as e:
                print(f"{n:16s} FAILED: {type(e).__name__}: {e}",
                      flush=True)
                results[n].append(None)
                continue
            results[n].append(fps)
            print(f"round{rnd} {n:16s} {fps:8.1f} fps", flush=True)
    print("--- best of 2 ---")
    for n in names:
        vals = [v for v in results[n] if v]
        if vals:
            print(f"{n:16s} {max(vals):8.1f}", flush=True)


if __name__ == "__main__":
    main()
