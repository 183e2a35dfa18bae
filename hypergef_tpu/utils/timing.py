"""Kernel timing utilities (TPU analogue of ``util::gpuTimer``,
``include/util/gpuTimer.cuh:7-28``).

Per-dispatch latency through the tunneled TPU runtime is ~0.5–1.5 ms —
larger than many kernels being measured — so kernel times are derived
from two jitted ``fori_loop`` chains (1 iteration vs K iterations): the
difference isolates pure device time per iteration, the same
amortize-over-ITER protocol as the reference benchmarks
(``include/hgnnAgg.cuh:14`` ITER=100) but robust to host dispatch cost.
"""

from __future__ import annotations

import time
from typing import Callable

import jax


class Timer:
    """Simple wall-clock bracket with block_until_ready semantics."""

    def __init__(self):
        self.t0 = None
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


def device_time_per_iter(
    step: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    iters: int = 50,
    repeats: int = 3,
) -> dict:
    """Measure per-iteration device time of ``step`` (shape-preserving).

    Chains ``step`` inside ``lax.fori_loop`` so the K-iteration program
    is one dispatch; reports ``(T(K+1) − T(1)) / K`` minimized over
    ``repeats`` runs, plus the compile time of the long program.
    """

    def loop(x0, n):
        return jax.lax.fori_loop(0, n, lambda i, a: step(a), x0)

    f = jax.jit(loop, static_argnums=1)
    t0 = time.perf_counter()
    jax.block_until_ready(f(x, 1))
    compile_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(f(x, iters + 1))
    compile_long = time.perf_counter() - t0

    def timed(n):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = timed(1)
    t_long = timed(iters + 1)
    return {
        "per_iter_s": max(t_long - t_short, 0.0) / iters,
        "dispatch_s": t_short,
        "compile_s": compile_short + compile_long,
    }
