"""Probe: where do the aligned backend's microseconds go?

SBM-60k full fused layer measures 357 us; the streamed-bytes floor is
~140 us.  Isolate the components by timing ablated variants of the
bucketed aligned apply (forward only, both stages, degree scaling kept):

  full      — production _apply_aligned_b path
  no_spill  — spills stripped (band matmuls + window gathers only)
  no_gather — window gather replaced by a contiguous slice of the same
              byte volume (isolates block-gather overhead)
  bf16_tab  — band tables pre-cast to bf16 on device (is the int8→bf16
              convert fused into the dot, or a separate materialization
              pass that re-streams the tables?)
  dots_only — no window gather AND no spill (pure table stream + MXU)

Run on TPU:
    PYTHONPATH="/root/repo:$PYTHONPATH" nohup python -u \
        scripts/probe_aligned_breakdown.py > /tmp/probe_breakdown.log 2>&1 &
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hypergef_jax_cache")

from hypergef_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))
from clustered_bench import community_hypergraph

from hypergef_tpu.ops import tree as tree_ops
from hypergef_tpu.sparse import planner
from hypergef_tpu.sparse.reorder import apply_vertex_order
from hypergef_tpu.utils.timing import chain_fold, device_time_per_iter


def strip_spills(st):
    return dataclasses.replace(
        st, spills=(), spill_slot=jnp.zeros_like(st.spill_slot)
    )


def cast_tables(st):
    bks = tuple(
        dataclasses.replace(
            bk, b_dense=jnp.asarray(bk.b_dense).astype(jnp.bfloat16))
        for bk in st.buckets
    )
    sps = tuple(
        dataclasses.replace(
            sp, b_spill=jnp.asarray(sp.b_spill).astype(jnp.bfloat16))
        for sp in st.spills
    )
    return dataclasses.replace(st, buckets=bks, spills=sps)


def degather(st):
    """Replace each bucket's window table with a contiguous ramp: same
    gathered byte volume, but the rows are consecutive blocks (XLA can
    turn the take into a copy/slice)."""
    bks = []
    nb = -(-st.num_inputs // st.block_rows)
    for bk in st.buckets:
        ng_b, wb = bk.win_block.shape
        ramp = (np.arange(ng_b * wb, dtype=np.int32) % nb).reshape(ng_b, wb)
        bks.append(dataclasses.replace(bk, win_block=jnp.asarray(ramp)))
    return dataclasses.replace(st, buckets=tuple(bks))


def forward(x, es, vs, degE, degV):
    xe = tree_ops._apply_aligned_b(x, es) * degE
    return tree_ops._apply_aligned_b(xe, vs) * degV


def main():
    n, e, comm, avg, noise, f, iters = 60_000, 30_000, 240, 12, 0.02, 32, 20
    hg = community_hypergraph(n, e, comm, avg, noise, 0)
    hg, _ = apply_vertex_order(hg, np.arange(hg.num_nodes), sort_edges=True)
    plan = planner.plan_aligned(hg)
    es0, vs0 = plan.as_device().stages
    degE = jnp.asarray(hg.degE)
    degV = jnp.asarray(hg.degV)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    print(f"nnz={hg.nnz} dev={jax.devices()[0].platform}", flush=True)

    variants = {
        "full": (es0, vs0),
        "no_spill": (strip_spills(es0), strip_spills(vs0)),
        "no_gather": (degather(es0), degather(vs0)),
        "bf16_tab": (cast_tables(es0), cast_tables(vs0)),
        "dots_only": (degather(strip_spills(es0)), degather(strip_spills(vs0))),
    }
    for name, (es, vs) in variants.items():
        try:
            def step(xv, es_, vs_):
                y = forward(xv, es_, vs_, degE, degV)
                return chain_fold(y, xv)

            t = device_time_per_iter(step, x0, iters=iters, operands=(es, vs))
            print(f"{name:10s}: {t['per_iter_s']*1e6:7.1f} us  "
                  f"(compile {t['compile_s']:.0f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:10s}: FAILED {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
