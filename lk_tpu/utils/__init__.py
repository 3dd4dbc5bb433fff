"""Shared utilities: compilation cache setup, timing, logging."""

from lk_tpu.utils.runtime import enable_compilation_cache, Timer  # noqa: F401
