"""Round-3 mandate #1 probe: bit-packed Pallas incidence stream vs int8
dense stream on the pubmed_real shape (19717 x 7963 uniform-random,
~86k nnz, f=32) — plus component isolation (dot-only / unpack-only) so
the result is a *profile*, not just a number.

Hypothesis under test (see KERNEL_NOTES round-3): on v5e the dense
two-stage at F<=128 is bound by the MXU A-element rate (~768G elem/s),
which numerically equals the int8 HBM stream (~730 GB/s at 1 B/elem).
If true, the bit-packed kernel lands at ~the int8 time (MXU floor);
if the byte stream was the binder, it lands ~8x lower.

Interleaved A/B, honest value-fetch fencing (utils/timing).
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hypergef_tpu.data.synthetic import random_hypergraph  # noqa: E402
from hypergef_tpu.ops import fused  # noqa: E402
from hypergef_tpu.ops.bitstream import (  # noqa: E402
    BitIncidence, _apply_pack, hgnn_aggregate_bitstream)
from hypergef_tpu.sparse.planner import plan_aggregation  # noqa: E402
from hypergef_tpu.utils.timing import device_time_per_iter  # noqa: E402


def main(feat=32, iters=60, rounds=3):
    print("devices:", jax.devices(), flush=True)
    hg = random_hypergraph(19717, 7963, avg_edge_size=10.8, seed=0,
                           name="pubmed_real")
    print(f"graph: {hg.num_nodes}x{hg.num_edges}, nnz={hg.nnz}", flush=True)
    plan = plan_aggregation(hg)
    bi = BitIncidence.from_hypergraph(hg)
    print(f"packed table bytes: {bi.table_bytes()/1e6:.1f} MB "
          f"(int8 would be {(hg.num_nodes*hg.num_edges*2)/1e6:.1f} MB)",
          flush=True)
    hgd = hg.device_data()
    x0 = jnp.asarray(np.random.default_rng(1).normal(
        size=(hg.num_nodes, feat)).astype(np.float32))

    # correctness first (full fused, vs int8 dense)
    ob = hgnn_aggregate_bitstream(hgd, x0, None, "sum", bi)
    oi = fused.hgnn_aggregate(hgd, x0, None, "sum", plan=plan,
                              backend="dense")
    d = float(jnp.abs(ob - oi).max())
    rel = d / float(jnp.abs(oi).max())
    print(f"parity vs int8-dense: max abs diff {d:.3e} (rel {rel:.3e})",
          flush=True)

    def f_i8(a):
        return fused.hgnn_aggregate(hgd, a, None, "sum", plan=plan,
                                    backend="dense")

    def f_bits(a):
        return hgnn_aggregate_bitstream(hgd, a, None, "sum", bi)

    def f_dotonly(a):
        y = _apply_pack(a, bi.ht_pack, probe_mode="dotonly")
        return _apply_pack(y, bi.h_pack, probe_mode="dotonly")

    def f_unpackonly(a):
        y = _apply_pack(a, bi.ht_pack, probe_mode="unpackonly")
        return _apply_pack(y, bi.h_pack, probe_mode="unpackonly")

    legs = [("int8_dense", f_i8), ("bits_full", f_bits),
            ("bits_dotonly", f_dotonly), ("bits_unpackonly", f_unpackonly)]
    for rnd in range(rounds):
        for name, fn in legs:
            r = device_time_per_iter(fn, x0, iters=iters)
            print(f"round {rnd} {name}: {r['per_iter_s']*1e6:.1f} us"
                  f" (compile {r['compile_s']:.1f}s"
                  f"{' NOISY' if r.get('noisy') else ''})", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
