"""Bit-packed incidence-stream Pallas kernel (round-3 mandate #1).

The incidence matrix H is 0/1, so the dense-MXU table (``DenseIncidence``,
int8 since round 2) carries 8x more HBM bytes than information content.
This backend stores H as a **bit table** (1 bit per entry, 32 bits per
int32 word) and unpacks it to bf16 *inside* a Pallas kernel — in VMEM,
feeding MXU dots — which sidesteps the recorded XLA S4-placement negative
result (docs/KERNEL_NOTES.md "packed int4": XLA materializes sub-byte
tables at ~40 GB/s and never hoists the unpack out of loop bodies; inside
a Pallas kernel *we* control the placement).

Packed layout (per K-tile bit-plane form, chosen so the in-kernel unpack
is 32 full-lane VPU ops with NO cross-lane interleave):

    K is tiled in blocks of 4096 bits = 32 planes x 128 lanes.
    word[m, kt*128 + j]  bit b  <->  A[m, kt*4096 + b*128 + j]

so plane b of K-tile kt unpacks with ``(w >> b) & 1`` into the contiguous
column block ``[b*128, (b+1)*128)`` of the tile — a static VMEM store.

Cost model this kernel was built to test (and did — see
docs/KERNEL_NOTES.md round-3 section): on v5e the dense two-stage at F<=128
is bound by the MXU A-element rate (~768G elem/s = 4 MXUs x 128 elem/cyc
x 1.5 GHz), which numerically EQUALS the int8 HBM stream rate (~730 GB/s
at 1 byte/elem).  Bit-packing removes the byte floor; whatever remains is
the compute floor.

Semantics parity: the reference's fused kernel
(``source/hgnnaggr/hgnnaggr_cuda.cu:14-47``); this backend implements the
same ``out = degV . H . (degE*Wdiag) . H^T . X`` with sum/mean first
aggregation (max routes to the argmax tree, ops/fused.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_PLANES = 32
KTILE = _PLANES * _LANE  # 4096 bits per packed lane-row block
_DEF_TM = 256  # output rows per grid step (2 MXU tile edges)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_bits_csr(indptr: np.ndarray, indices: np.ndarray, m: int, k: int):
    """Pack a 0/1 CSR matrix [m, k] into the per-K-tile bit-plane layout.

    Returns an int32 array [m, (kp // KTILE) * 128] where
    word[r, kt*128+j] bit b == A[r, kt*4096 + b*128 + j].
    Works straight off the CSR arrays — never densifies.
    """
    kp = _round_up(max(k, 1), KTILE)
    kt = kp // KTILE
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    cols = np.asarray(indices, dtype=np.int64)
    ktile = cols >> 12  # / 4096
    r = cols & (KTILE - 1)
    b = (r >> 7).astype(np.uint32)  # / 128 -> plane
    j = r & (_LANE - 1)
    words = np.zeros((m, kt * _LANE), dtype=np.uint32)
    np.bitwise_or.at(words, (rows, ktile * _LANE + j), np.uint32(1) << b)
    return words.view(np.int32)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BitPack:
    """One orientation of the packed incidence: A [m, k] as bit words."""

    words: object  # jnp int32 [mp, (kp//KTILE)*128]
    m: int
    k: int

    @property
    def mp(self) -> int:
        return self.words.shape[0]

    @property
    def kp(self) -> int:
        return (self.words.shape[1] // _LANE) * KTILE

    def tree_flatten(self):
        return (self.words,), (self.m, self.k)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


@dataclasses.dataclass
class BitIncidence:
    """Both orientations of H packed as bit tables (the bitstream plan).

    ``h_pack`` encodes H [N, E] (the E->V stage's A operand), ``ht_pack``
    encodes H^T [E, N] (V->E).  8x fewer table bytes than the int8
    ``DenseIncidence``.
    """

    h_pack: BitPack
    ht_pack: BitPack
    num_nodes: int
    num_edges: int

    @classmethod
    def from_hypergraph(cls, hg, tm: int = _DEF_TM):
        csr = hg.to_scipy().tocsr()
        if csr.data.size and int(csr.data.max()) > 1:
            raise ValueError(
                "bitstream backend needs a binary incidence matrix "
                "(duplicate (vertex, edge) pairs present)"
            )
        n, e = csr.shape
        csc = csr.T.tocsr()
        h_words = pack_bits_csr(csr.indptr, csr.indices, n, e)
        ht_words = pack_bits_csr(csc.indptr, csc.indices, e, n)

        def _pad_rows(w, m):
            mp = _round_up(m, tm)
            if mp != m:
                w = np.pad(w, ((0, mp - m), (0, 0)))
            return w

        return cls(
            h_pack=BitPack(jnp.asarray(_pad_rows(h_words, n)), n, e),
            ht_pack=BitPack(jnp.asarray(_pad_rows(ht_words, e)), e, n),
            num_nodes=n,
            num_edges=e,
        )

    def table_bytes(self) -> int:
        return self.h_pack.words.size * 4 + self.ht_pack.words.size * 4


def _bitmm_kernel_factory(kt: int, fp: int, probe_mode: str):
    def kernel(w_ref, b_ref, o_ref, a_scr):
        ki = pl.program_id(1)
        if probe_mode != "dotonly":
            w = w_ref[:]  # [tm, 128] int32
            for pb in range(_PLANES):
                a_scr[:, pb * _LANE:(pb + 1) * _LANE] = (
                    (w >> pb) & 1
                ).astype(jnp.bfloat16)
        else:
            # probe: skip the unpack; fill the A scratch once so the dot
            # timing is isolated (values are meaningless)
            @pl.when((ki == 0) & (pl.program_id(0) == 0))
            def _():
                a_scr[:] = jnp.ones_like(a_scr)
        if probe_mode == "unpackonly":
            # probe: consume the scratch without the MXU dot
            acc = jnp.broadcast_to(
                jnp.sum(a_scr[:], axis=1, keepdims=True).astype(jnp.float32),
                o_ref.shape,
            )
        else:
            bk = b_ref[pl.ds(ki * KTILE, KTILE), :]
            acc = jnp.dot(a_scr[:], bk, preferred_element_type=jnp.float32)

        @pl.when(ki == 0)
        def _():
            o_ref[:] = acc

        @pl.when(ki > 0)
        def _():
            o_ref[:] = o_ref[:] + acc

    return kernel


@functools.partial(
    jax.jit, static_argnums=(2, 3, 4, 5, 6), inline=True
)
def _bitmm_call(words, b, mp, kp, tm, probe_mode, interpret):
    """C [mp, fp] = A @ B with A the bit-packed [mp, kp] 0/1 matrix.

    B must be [kp, fp] bf16 (fp a multiple of 128).  B stays fully VMEM
    resident across the grid (constant index map); the packed table
    streams one [tm, 128]-word block per step; the output tile
    accumulates over the inner K grid axis.
    """
    kt = kp // KTILE
    mt = mp // tm
    fp = b.shape[1]
    kernel = _bitmm_kernel_factory(kt, fp, probe_mode)
    return pl.pallas_call(
        kernel,
        grid=(mt, kt),
        in_specs=[
            pl.BlockSpec((tm, _LANE), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, fp), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, fp), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, fp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, KTILE), jnp.bfloat16)],
        interpret=interpret,
    )(words, b)


def _apply_pack(x, pack: BitPack, probe_mode="full", interpret=None,
                lane_pad=_LANE, tm=_DEF_TM):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    f = x.shape[1]
    fp = _round_up(f, lane_pad)
    xb = jnp.zeros((pack.kp, fp), jnp.bfloat16).at[: pack.k, :f].set(
        x.astype(jnp.bfloat16)
    )
    out = _bitmm_call(pack.words, xb, pack.mp, pack.kp,
                      min(tm, pack.mp), probe_mode, interpret)
    return out[: pack.m, :f]


@jax.custom_vjp
def bit_matvec(x, fwd_pack: BitPack, bwd_pack: BitPack):
    """y = A x with A the 0/1 matrix in ``fwd_pack``; ``bwd_pack``
    encodes A^T and drives the exact VJP (same kernel, packs swapped —
    the exact adjoint, not the reference's symmetric approximation,
    SURVEY.md §0)."""
    return _apply_pack(x, fwd_pack)


def _bm_fwd(x, fwd_pack, bwd_pack):
    return _apply_pack(x, fwd_pack), (fwd_pack, bwd_pack)


def _bm_bwd(res, g):
    fwd_pack, bwd_pack = res
    return bit_matvec(g, bwd_pack, fwd_pack), None, None


bit_matvec.defvjp(_bm_fwd, _bm_bwd)


def hgnn_aggregate_bitstream(hgd, x, wdiag, first_aggr, bi: BitIncidence):
    """out = degV . H . (degE*Wdiag) . (H^T X)  via two bitmm kernels."""
    if first_aggr not in ("sum", "mean"):
        raise ValueError("bitstream implements first_aggr in {sum, mean}; "
                         "max routes to the argmax tree (ops/fused.py)")
    xe = bit_matvec(x, bi.ht_pack, bi.h_pack)
    if first_aggr == "mean":
        cnt = (hgd.ht_indptr[1:] - hgd.ht_indptr[:-1]).astype(x.dtype)
        xe = xe / jnp.maximum(cnt, 1.0)[:, None]
    xe = xe * hgd.degE
    if wdiag is not None:
        xe = xe * wdiag
    return bit_matvec(xe, bi.h_pack, bi.ht_pack) * hgd.degV


def unignn_aggregate_bitstream(hgd, x, use_deg, bi: BitIncidence):
    xe = bit_matvec(x, bi.ht_pack, bi.h_pack)
    if use_deg:
        xe = xe * hgd.degE
    xv = bit_matvec(xe, bi.h_pack, bi.ht_pack)
    if use_deg:
        xv = xv * hgd.degV
    return xv
