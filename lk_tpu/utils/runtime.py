"""Runtime helpers: persistent compile cache and wall-clock timing.

The axon TPU plugin compiles large programs slowly (minutes for the full
pipeline step on first trace — measured), so every entry point enables JAX's
persistent compilation cache; warm runs then skip compilation entirely.
"""

from __future__ import annotations

import os
import time


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    # LK_PLATFORM=cpu forces the CPU backend (the JAX_PLATFORMS env var is
    # not honored under the axon TPU plugin; the config route is).
    plat = os.environ.get("LK_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    cache = path or os.environ.get(
        "LK_TPU_CACHE", os.path.join(os.path.dirname(__file__), "../../.jax_cache")
    )
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


class Timer:
    """Wall-clock span timer: with Timer() as t: ...; t.dt"""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.dt = time.perf_counter() - self.t0
        return False
