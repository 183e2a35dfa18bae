"""Round-2 continuation probe: does the DMA-pipelined Pallas gather
(`ops/pallas_sparse.ell_gather_sum(impl="dma")`) beat the ~8 ns/row
serial-load floor that binds every gather-form stage (aligned spills,
tree level 0)?

Candidates, per scale, interleaved A/B/A/B in one process (tunnel drift
is ±30% across runs — see verify skill):

  xla   jnp.take + reshape + masked chunk-sum (production spill form)
  vmem  Pallas kernel, X VMEM-resident, serial per-row loads
  dma8  Pallas kernel, X in ANY/HBM, per-row async DMAs, 8 chunk bufs
  dma16 same with 16 chunk buffers (more DMAs in flight)

All scales run at F=128: Mosaic requires DMA slices 128-aligned in the
minor dim ("Slice shape along dimension 1 must be aligned to tiling
(128), but is 32"), so the DMA form is only expressible at F>=128 —
itself a finding: the per-row-DMA design cannot serve the f=32 spill
path without 4x lane padding.  F=128 is still a production regime
(reference sweeps nhid in {32,64,128}).

Scales:
  spill   X [60k, 128] f32 (30 MB VMEM-resident), 35k gathers — the
          SBM-60k aligned spill shape at wide F
  pubmed  X [19.7k, 128] (10 MB), 87k gathers — tree level 0
  bigX    X [500k, 128] (256 MB, HBM-resident), 131k gathers — the
          large-graph regime (XLA pays ~24 ns/row here, re-measured r2)

Run:  nohup python scripts/probe_dma_gather.py > /tmp/probe_dma.log 2>&1 &
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hypergef_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hypergef_tpu.ops.pallas_sparse import ell_gather_sum
from hypergef_tpu.utils.timing import chain_fold, device_time_per_iter

NGS = 8


def log(m):
    print(m, flush=True)


def make_case(n, c, f, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    gidx = jnp.asarray(rng.integers(0, n, size=(c, NGS)).astype(np.int32))
    mask = jnp.asarray((rng.random((c, NGS)) > 0.15).astype(np.float32))
    return x, gidx, mask


def xla_step(a, gidx, mask):
    c, ngs = gidx.shape
    y = jnp.take(a, gidx.reshape(-1), axis=0).reshape(c, ngs, a.shape[1])
    return (y * mask[:, :, None]).sum(axis=1)


def run_scale(name, n, c, iters):
    f = 128
    x, gidx, mask = make_case(n, c, f, 0)
    rows = c * NGS
    # explicit-impl probe: allow VMEM residency up to ~48 MB (v5e VMEM
    # is 128 MB; the 10 MB library budget is for the auto ladder)
    vmem_ok = n * f * 4 <= 48 * 1024 * 1024

    cases = {"xla": lambda a: xla_step(a, gidx, mask)}
    if vmem_ok:
        cases["vmem"] = lambda a: ell_gather_sum(a, gidx, mask, impl="vmem")
    cases["dma8"] = lambda a: ell_gather_sum(a, gidx, mask, impl="dma", n_buf=8)
    cases["dma16"] = lambda a: ell_gather_sum(a, gidx, mask, impl="dma", n_buf=16)

    # parity check first (tiny cost, catches wrong-value fast kernels)
    want = np.asarray(xla_step(x, gidx, mask))
    for cn, fn in cases.items():
        got = np.asarray(fn(x))
        err = float(np.abs(got - want).max())
        log(f"  [{name}] {cn}: parity max|err|={err:.2e}")
        if err > 1e-4:
            log(f"  [{name}] {cn}: PARITY FAIL — excluded from timing")
            cases[cn] = None

    results = {cn: [] for cn in cases}
    for rnd in range(2):  # interleaved rounds
        for cn, fn in cases.items():
            if fn is None:
                continue
            step = lambda a, fn=fn: chain_fold(fn(a), a)
            try:
                r = device_time_per_iter(step, x, iters=iters, repeats=3)
            except Exception as e:
                log(f"  [{name}] {cn}: FAILED {type(e).__name__}: "
                    + str(e).replace(chr(10), " | ")[:160])
                cases[cn] = None
                continue
            us = r["per_iter_s"] * 1e6
            results[cn].append(us)
            log(f"  [{name}] {cn} round{rnd}: {us:9.1f} us/iter "
                f"({r['per_iter_s']/rows*1e9:6.2f} ns/row) "
                f"compile={r['compile_s']:.1f}s noisy={r['noisy']}")
    log(f"  [{name}] summary ({rows} gathered rows):")
    for cn, ts in results.items():
        if ts:
            log(f"    {cn:6s} min {min(ts):9.1f} us  "
                f"({min(ts)/rows*1e3:6.2f} ns/row)")


def main():
    log(f"devices: {jax.devices()}")
    run_scale("spill", 60_001, 4375, iters=40)
    run_scale("pubmed", 19_718, 10_880, iters=40)
    run_scale("bigX", 500_001, 16_384, iters=10)
    log("done")


if __name__ == "__main__":
    main()
