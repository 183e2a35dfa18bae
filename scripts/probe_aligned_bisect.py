"""Probe: bisect the bucketed-aligned apply into its component costs.

G=128 bucketed-int8 measures 386 us/layer on SBM-60k while the streamed
bytes predict ~100 us — and the cost is insensitive to batch count
(G sweep) and only weakly to table bytes.  Time each piece separately:

  pad+cast     x -> bf16 block form
  win_gather   block-window gather only (sum to keep data dependency)
  band_dot     window gather + band matmuls (no spill, no assembly)
  spill_only   spill row gather + spill matmuls
  assembly     base/spill slot gathers + add + slice
  full_e / full_v / full_layer

Run on TPU:
    PYTHONPATH="/root/repo:$PYTHONPATH" nohup python -u \
        scripts/probe_aligned_bisect.py > /tmp/probe_aligned_bisect.log 2>&1 &
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

from hypergef_tpu.ops.tree import _apply_aligned_b, _ALIGNED_BLOCK
from hypergef_tpu.ops.devplan import DevTreePlan
from hypergef_tpu.sparse import planner
from hypergef_tpu.sparse.reorder import apply_vertex_order
from hypergef_tpu.utils.timing import device_time_per_iter


def main():
    n, e, comm, avg, noise, f, iters = 60_000, 30_000, 240, 12, 0.02, 32, 20
    hg = community_hypergraph(n, e, comm, avg, noise, 0)
    hg, _ = apply_vertex_order(hg, np.arange(hg.num_nodes), sort_edges=True)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    print(f"nnz={hg.nnz} dev={jax.devices()[0].platform}", flush=True)

    plan = planner.plan_aligned(hg)  # bucketed int8, G=128
    e_dev, v_dev = plan.device()

    from hypergef_tpu.utils.timing import chain_fold as chain

    def mk_pad(st):
        def fn(xv, pd):
            st = pd.stages[0]
            pad = (-st.num_inputs) % _ALIGNED_BLOCK
            xb = jnp.pad(xv, ((0, pad), (0, 0))).astype(jnp.bfloat16)
            return xv + 1e-30 * jnp.sum(xb.astype(jnp.float32) ** 2)
        return fn

    def mk_win_gather(_):
        def fn(xv, pd):
            st = pd.stages[0]
            pad = (-st.num_inputs) % _ALIGNED_BLOCK
            xb = jnp.pad(xv, ((0, pad), (0, 0))).astype(jnp.bfloat16)
            xb = xb.reshape(-1, _ALIGNED_BLOCK, xv.shape[1])
            acc = jnp.float32(0)
            for bk in st.buckets:
                win = jnp.take(xb, bk.win_block.reshape(-1), axis=0)
                acc = acc + jnp.sum(win.astype(jnp.float32) ** 2)
            return xv + 1e-30 * acc
        return fn

    def mk_band_dot(_):
        def fn(xv, pd):
            st = pd.stages[0]
            pad = (-st.num_inputs) % _ALIGNED_BLOCK
            xb = jnp.pad(xv, ((0, pad), (0, 0))).astype(jnp.bfloat16)
            xb = xb.reshape(-1, _ALIGNED_BLOCK, xv.shape[1])
            acc = jnp.float32(0)
            for bk in st.buckets:
                ng_b, wb = bk.win_block.shape
                win = jnp.take(xb, bk.win_block.reshape(-1), axis=0)
                win = win.reshape(ng_b, wb * _ALIGNED_BLOCK, xv.shape[1])
                out = jax.lax.dot_general(
                    bk.b_dense.astype(jnp.bfloat16), win,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                acc = acc + jnp.sum(out * out)
            return xv + 1e-30 * acc
        return fn

    def mk_spill(_):
        def fn(xv, pd):
            st = pd.stages[0]
            xz = jnp.pad(xv, ((0, 1), (0, 0))).astype(jnp.bfloat16)
            acc = jnp.float32(0)
            for sp in st.spills:
                m_b, sw = sp.spill_src.shape
                rows = jnp.take(xz, sp.spill_src.reshape(-1), axis=0)
                rows = rows.reshape(m_b, sw, xv.shape[1])
                out = jax.lax.dot_general(
                    sp.b_spill.astype(jnp.bfloat16), rows,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                acc = acc + jnp.sum(out * out)
            return xv + 1e-30 * acc
        return fn

    def mk_full(_):
        def fn(xv, pd):
            return chain(_apply_aligned_b(xv, pd.stages[0]), xv)
        return fn

    xe0 = jnp.asarray(rng.normal(size=(hg.num_edges, f)).astype(np.float32))

    cases = [
        ("pad_cast", mk_pad, e_dev, x0),
        ("e_win_gather", mk_win_gather, e_dev, x0),
        ("e_band_dot", mk_band_dot, e_dev, x0),
        ("e_spill", mk_spill, e_dev, x0),
        ("e_full", mk_full, e_dev, x0),
        ("v_win_gather", mk_win_gather, v_dev, xe0),
        ("v_band_dot", mk_band_dot, v_dev, xe0),
        ("v_spill", mk_spill, v_dev, xe0),
        ("v_full", mk_full, v_dev, xe0),
    ]
    for name, mk, dev, xin in cases:
        try:
            pd = DevTreePlan((dev, dev))
            t = device_time_per_iter(mk(dev), xin, iters=iters, operands=(pd,))
            print(f"{name}: {t['per_iter_s']*1e6:.1f} us (compile {t['compile_s']:.0f}s)",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
