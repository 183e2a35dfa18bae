"""Probe: windowed masked-max over the aligned band structure vs the
argmax-carrying gather tree, for max V->E on a community-sorted graph.

Idea: the aligned e-stage's (group, window) layout lets max be computed
with ZERO per-nnz gathers — block-gather each group's window rows, then
a fused select(-inf)+reduce over the window axis using the band mask
(b_dense > 0), plus the same for spill slots.  Cost: n_groups*G*W*F VPU
compare-selects per reduce (vs the tree's ~nnz row gathers).  This probe
measures whether XLA's fused broadcast+reduce is fast enough to beat the
tree (it must NOT materialize the [ng, G, W, F] candidate tensor).

Run: PYTHONPATH=/root/repo python scripts/probe_max_window.py

RESULT (TPU v5e, 2026-08-18, SBM-60k nnz=352k f=32): value AND argmax
parity exact (tie semantics agree: first/min source id), but
    window 1518-1573 us vs tree 1652-1684 us
— a ~9% near-tie, NEGATIVE result for productizing: the masked reduce
is VPU-bound at n_groups*G*W*F compare-selects (~0.5 G ops per reduce,
two reduces for max+argmax), and the MXU cannot express max.  The band
structure buys sum a 12x win but buys max almost nothing; the argmax
tree stays the production V->E max stage.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hypergef_jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp

from clustered_bench import community_hypergraph
from hypergef_tpu.ops import maxops
from hypergef_tpu.sparse.planner import build_aligned_stage, plan_tree
from hypergef_tpu.sparse.reorder import apply_vertex_order
from hypergef_tpu.utils.timing import chain_fold, device_time_per_iter

_NEG = -3.0e38
F = 32

hg = community_hypergraph(60_000, 30_000, 240, 12, 0.02, 0)
hg, _ = apply_vertex_order(hg, np.arange(hg.num_nodes), sort_edges=True)
st = build_aligned_stage(hg.ht_indptr, hg.ht_indices, hg.num_nodes,
                         group_rows=128, window_blocks=4)
tree = plan_tree(hg)
hgd = hg.device_data()
print(f"N={hg.num_nodes} E={hg.num_edges} nnz={hg.nnz} "
      f"spill={st.spill_fraction:.3f} ng={st.b_dense.shape[0]} "
      f"W={st.b_dense.shape[2]} spill_w={st.spill_src.shape[1]}", flush=True)

mask_band = jnp.asarray(st.b_dense > 0)          # [ng, G, W] bool
mask_spill = jnp.asarray(st.b_spill > 0)         # [ng, G, sw]
win_block = jnp.asarray(st.win_block)            # [ng, wb]
spill_src = jnp.asarray(st.spill_src)            # [ng, sw]
n_groups, G, W = st.b_dense.shape
wb = st.win_block.shape[1]
sw = st.spill_src.shape[1]
S = st.num_segments

# source id of window position w (static per group): win_block*128 + w%128
src_band = (st.win_block[:, :, None] * 128
            + np.arange(128)[None, None, :]).reshape(n_groups, W)
src_band = jnp.asarray(src_band.astype(np.int32))  # [ng, W]


def windowed_max(x):
    f = x.shape[1]
    pad = (-st.num_inputs) % 128
    xb = jnp.pad(x, ((0, pad), (0, 0))).reshape(-1, 128, f)
    win = jnp.take(xb, win_block.reshape(-1), axis=0)
    win = win.reshape(n_groups, W, f)
    cand = jnp.where(mask_band[:, :, :, None], win[:, None, :, :], _NEG)
    vals = jnp.max(cand, axis=2)                  # [ng, G, F]
    k = jnp.argmax(cand, axis=2)                  # [ng, G, F] first max w
    arg = jnp.take_along_axis(
        jnp.broadcast_to(src_band[:, None, :], (n_groups, G, W)), k, axis=2)
    if sw:
        xz = jnp.pad(x, ((0, 1), (0, 0)))
        sp = jnp.take(xz, spill_src.reshape(-1), axis=0)
        sp = sp.reshape(n_groups, sw, f)
        scand = jnp.where(mask_spill[:, :, :, None], sp[:, None, :, :], _NEG)
        svals = jnp.max(scand, axis=2)
        sk = jnp.argmax(scand, axis=2)
        sarg = jnp.take_along_axis(
            jnp.broadcast_to(spill_src[:, None, :], (n_groups, G, sw)),
            sk, axis=2)
        use_spill = svals > vals
        arg = jnp.where(use_spill, sarg, arg)
        vals = jnp.maximum(vals, svals)
    y = vals.reshape(n_groups * G, f)[:S]
    a = arg.reshape(n_groups * G, f)[:S]
    cnt = jnp.asarray(st.counts)
    y = jnp.where(cnt[:, None] > 0, y, 0.0)
    return y, a


def tree_max(x):
    e_stage, _ = tree.device()
    return maxops.tree_max_with_arg(x, e_stage)


x0 = jnp.asarray(
    np.random.default_rng(0).normal(size=(hg.num_nodes, F)).astype(np.float32))

# value parity first
yw, aw = jax.jit(windowed_max)(x0)
yt, at = jax.jit(tree_max)(x0)
print("val match:", np.allclose(np.asarray(yw), np.asarray(yt)),
      " arg match:", float(np.mean(np.asarray(aw) == np.asarray(at))),
      flush=True)

for rnd in range(3):
    line = [f"round {rnd}:"]
    for tag, fn in (("window", lambda x: chain_fold(windowed_max(x)[0], x)),
                    ("tree", lambda x: chain_fold(tree_max(x)[0], x))):
        r = device_time_per_iter(fn, x0, iters=40)
        noisy = " (noisy)" if r["noisy"] else ""
        line.append(f"{tag} {r['per_iter_s']*1e6:8.1f}us{noisy}")
    print("  ".join(line), flush=True)
