"""Bitstream follow-up probe: is the MXU cost independent of output-lane
occupancy (F padded to 32 vs 128), and does a larger M tile shave the
grid overhead?  This pins down whether the ~520 us dot-only floor on the
pubmed_real shape is the systolic-array A-element rate (N<=128 lanes all
cost the same) or a padding artifact.

Also times f=128 (full lanes): there the padded and useful flops
coincide, so (dot-only f=128) ~= (dot-only f=32 padded) confirms the
A-element model directly.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hypergef_tpu.data.synthetic import random_hypergraph  # noqa: E402
from hypergef_tpu.ops.bitstream import BitIncidence, _apply_pack  # noqa: E402
from hypergef_tpu.utils.timing import device_time_per_iter  # noqa: E402


def main(iters=60, rounds=2):
    print("devices:", jax.devices(), flush=True)
    hg = random_hypergraph(19717, 7963, avg_edge_size=10.8, seed=0,
                           name="pubmed_real")
    bi = BitIncidence.from_hypergraph(hg)
    rng = np.random.default_rng(1)

    def two_stage(a, lane_pad, tm, mode="full"):
        y = _apply_pack(a, bi.ht_pack, probe_mode=mode, lane_pad=lane_pad,
                        tm=tm)
        return _apply_pack(y, bi.h_pack, probe_mode=mode, lane_pad=lane_pad,
                           tm=tm)

    x32 = jnp.asarray(rng.normal(size=(hg.num_nodes, 32)).astype(np.float32))
    x128 = jnp.asarray(rng.normal(size=(hg.num_nodes, 128)).astype(np.float32))

    legs = [
        ("f32_lanes128_tm256", lambda a: two_stage(a, 128, 256), x32),
        ("f32_lanes32_tm256", lambda a: two_stage(a, 32, 256), x32),
        ("f32_lanes32_tm512", lambda a: two_stage(a, 32, 512), x32),
        ("f32_lanes128_tm512", lambda a: two_stage(a, 128, 512), x32),
        ("f128_tm512", lambda a: two_stage(a, 128, 512), x128),
        ("f32_dotonly_lanes32_tm512",
         lambda a: two_stage(a, 32, 512, "dotonly"), x32),
    ]
    for rnd in range(rounds):
        for name, fn, xx in legs:
            try:
                r = device_time_per_iter(fn, xx, iters=iters)
                print(f"round {rnd} {name}: {r['per_iter_s']*1e6:.1f} us"
                      f" (compile {r['compile_s']:.1f}s"
                      f"{' NOISY' if r.get('noisy') else ''})", flush=True)
            except Exception as e:
                print(f"round {rnd} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
