"""Probe: aligned-backend efficiency variants (ROADMAP round-3 item 0).

SBM-60k, f=32, honest fenced timing.  Variants:

  uniform_bf16   — round-2 shipped form (bf16 band tables on device)
  uniform_int8   — same tables int8-resident, cast at the dot operand
  bucketed_int8  — per-group window widths + spill buckets (new default)
  bucketed_bf16  — bucketed with pre-cast bf16 tables (isolates whether
                   XLA fuses the int8→bf16 convert into the dot read)

Run on TPU:
    PYTHONPATH="/root/repo:$PYTHONPATH" nohup python -u \
        scripts/probe_aligned_opt.py > /tmp/probe_aligned.log 2>&1 &
"""

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

from hypergef_tpu.ops import fused
from hypergef_tpu.ops.tree import AlignedStageDev, AlignedStageBDev, AlignedBucketDev, AlignedSpillDev
from hypergef_tpu.ops.devplan import DevTreePlan
from hypergef_tpu.sparse import planner
from hypergef_tpu.sparse.reorder import apply_vertex_order
from hypergef_tpu.utils.timing import chain_fold, device_time_per_iter


def bf16_stage(st):
    """Pre-cast a device stage's int8 tables to bf16 (A/B helper)."""
    if isinstance(st, AlignedStageDev):
        return AlignedStageDev(
            b_dense=st.b_dense.astype(jnp.bfloat16),
            win_block=st.win_block, spill_src=st.spill_src,
            b_spill=st.b_spill.astype(jnp.bfloat16), counts=st.counts,
            num_inputs=st.num_inputs, num_segments=st.num_segments,
            group_rows=st.group_rows, window_blocks=st.window_blocks,
        )
    return AlignedStageBDev(
        buckets=tuple(AlignedBucketDev(b_dense=b.b_dense.astype(jnp.bfloat16),
                                       win_block=b.win_block)
                      for b in st.buckets),
        spills=tuple(AlignedSpillDev(b_spill=s.b_spill.astype(jnp.bfloat16),
                                     spill_src=s.spill_src)
                     for s in st.spills),
        base_slot=st.base_slot, spill_slot=st.spill_slot, counts=st.counts,
        num_inputs=st.num_inputs, num_segments=st.num_segments,
        group_rows=st.group_rows,
    )


def int8_stage(st):
    """Force a (bf16-shipped) uniform device stage back to int8 tables."""
    return AlignedStageDev(
        b_dense=st.b_dense.astype(jnp.int8),
        win_block=st.win_block, spill_src=st.spill_src,
        b_spill=st.b_spill.astype(jnp.int8), counts=st.counts,
        num_inputs=st.num_inputs, num_segments=st.num_segments,
        group_rows=st.group_rows, window_blocks=st.window_blocks,
    )


def table_mb(st):
    if isinstance(st, AlignedStageBDev):
        n = sum(int(np.prod(b.b_dense.shape)) for b in st.buckets)
        n += sum(int(np.prod(s.b_spill.shape)) for s in st.spills)
        per = st.buckets[0].b_dense.dtype.itemsize
    else:
        n = int(np.prod(st.b_dense.shape)) + int(np.prod(st.b_spill.shape))
        per = st.b_dense.dtype.itemsize
    return n * per / 1e6


def main():
    n, e, comm, avg, noise, f, iters = 60_000, 30_000, 240, 12, 0.02, 32, 20
    hg = community_hypergraph(n, e, comm, avg, noise, 0)
    hg, _ = apply_vertex_order(hg, np.arange(hg.num_nodes), sort_edges=True)
    hgd = hg.device_data()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    print(f"nnz={hg.nnz} dev={jax.devices()[0].platform}", flush=True)

    uni = planner.plan_aligned(hg, form="uniform")
    buck = planner.plan_aligned(hg, form="bucketed")
    e_u, v_u = uni.device()
    e_b, v_b = buck.device()
    print(f"uniform wb={uni.edge_stage.window_blocks}/{uni.vertex_stage.window_blocks} "
          f"spill={uni.edge_stage.spill_fraction:.3f}/{uni.vertex_stage.spill_fraction:.3f}",
          flush=True)
    print(f"bucketed widths e={buck.edge_stage.window_blocks} "
          f"v={buck.vertex_stage.window_blocks} "
          f"spill={buck.edge_stage.spill_fraction:.3f}/{buck.vertex_stage.spill_fraction:.3f}",
          flush=True)

    variants = [
        # (name, (e_stage, v_stage) device pytrees)
        ("uniform_bf16", (e_u, v_u)),  # shipped r2 form (already bf16? now int8)
        ("uniform_int8", (int8_stage(e_u), int8_stage(v_u))),
        ("bucketed_int8", (e_b, v_b)),
        ("bucketed_bf16", (bf16_stage(e_b), bf16_stage(v_b))),
    ]
    # NB: _stage_device now ships uniform tables as int8+pre-cast-to-bf16
    # at transfer; keep an explicit bf16 variant for a clean A/B.
    variants[0] = ("uniform_bf16", (bf16_stage(int8_stage(e_u)),
                                    bf16_stage(int8_stage(v_u))))

    for name, stages in variants:
        mb = table_mb(stages[0]) + table_mb(stages[1])
        pdev = DevTreePlan(stages)

        def step(xv, hgd_, pd):
            y = fused.hgnn_aggregate(hgd_, xv, None, "sum", plan=pd,
                                     backend="aligned")
            return chain_fold(y, xv)

        try:
            t = device_time_per_iter(step, x0, iters=iters, operands=(hgd, pdev))
            print(f"{name}: {t['per_iter_s']*1e6:.1f} us  "
                  f"(tables {mb:.1f} MB, compile {t['compile_s']:.0f}s)",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
