"""Runtime utilities: persistent XLA compilation cache, timers.

The reference pays its startup cost in world-building (399.5s for Y&H,
`epidemic_sim_v1.6_17739074.log`); ours is XLA compilation of the fused
step (~60s for the 3.46M-citizen executable).  The persistent compilation
cache amortises that across processes: measured through the axon TPU
backend, a 25s compile drops to ~5.6s on the next process (deserialize +
load).  World builds are separately amortised by the npz world cache
(`World.save_npz` + CLI --use-cache).
"""

from __future__ import annotations

import os
import time


def enable_compilation_cache(
    cache_dir: str | None = None, min_compile_secs: float = 1.0
) -> str:
    """Turn on JAX's persistent compilation cache.

    Safe to call more than once; returns the cache directory used.
    Directory resolution: explicit arg > $ESUCD_COMPILE_CACHE >
    ~/.cache/epidemicsimulator_tpu/xla.
    """
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("ESUCD_COMPILE_CACHE")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "epidemicsimulator_tpu", "xla"
        )
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


class Timer:
    """Named wall-clock block, the reference's `Timer` (statistics.rs:47-95)
    minus the RSS print (device memory is reported by the profiler instead).

    >>> with Timer("build world") as t: ...
    then ``t.elapsed`` holds seconds.
    """

    def __init__(self, name: str, logger=None):
        self.name = name
        self.logger = logger
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.logger is not None:
            self.logger.info("%s: %.2fs", self.name, self.elapsed)
        return False
