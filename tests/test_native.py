"""Native C++ library tests: bit-identical parity with the NumPy twins.

Skipped when the library isn't built (``make -C csrc``)."""

import os

import numpy as np
import pytest

from hypergef_tpu.sparse import native
from hypergef_tpu.sparse.planner import build_ell

pytestmark = pytest.mark.skipif(
    not (native.available() or native.build()), reason="native lib not built"
)


@pytest.mark.parametrize("ngs", [1, 4, 8, 32])
def test_build_ell_bit_identical(skewed_hg, ngs):
    hg = skewed_hg
    want = build_ell(hg.ht_indptr, hg.ht_indices, ngs)
    got = native.build_ell_native(hg.ht_indptr, hg.ht_indices, ngs)
    assert got.num_chunks == want.num_chunks
    np.testing.assert_array_equal(got.gather_idx, want.gather_idx)
    np.testing.assert_array_equal(got.mask, want.mask)
    np.testing.assert_array_equal(got.seg_ids, want.seg_ids)
    np.testing.assert_array_equal(got.seg_ptr, want.seg_ptr)


def test_mtx_roundtrip(tmp_path, small_hg):
    from hypergef_tpu.sparse import mtx

    path = str(tmp_path) + "/"
    fn = small_hg.store_mtx(path)
    assert os.path.exists(fn)
    hg2 = mtx.read_mtx(fn)
    assert hg2.num_nodes == small_hg.num_nodes
    assert hg2.num_edges == small_hg.num_edges
    np.testing.assert_array_equal(hg2.h_indptr, small_hg.h_indptr)
    np.testing.assert_array_equal(hg2.h_indices, small_hg.h_indices)


def test_native_mtx_matches_scipy(tmp_path, skewed_hg):
    import scipy.io

    from hypergef_tpu.sparse.hypergraph import Hypergraph

    fn = str(tmp_path / "g.mtx")
    scipy.io.mmwrite(fn, skewed_hg.to_scipy())
    n, e, r, c = native.read_mtx_coo(fn)
    assert (n, e) == (skewed_hg.num_nodes, skewed_hg.num_edges)
    hg2 = Hypergraph.from_coo(r, c, num_nodes=n, num_edges=e)
    np.testing.assert_array_equal(hg2.h_indptr, skewed_hg.h_indptr)
    np.testing.assert_array_equal(hg2.h_indices, skewed_hg.h_indices)


def test_native_symmetric_expansion(tmp_path):
    fn = str(tmp_path / "sym.mtx")
    with open(fn, "w") as f:
        f.write(
            "%%MatrixMarket matrix coordinate pattern symmetric\n"
            "% comment\n"
            "3 3 3\n"
            "1 1\n"
            "2 1\n"
            "3 2\n"
        )
    n, e, r, c = native.read_mtx_coo(fn)
    assert (n, e) == (3, 3)
    pairs = sorted(zip(r.tolist(), c.tolist()))
    assert pairs == [(0, 0), (0, 1), (1, 0), (1, 2), (2, 1)]


def test_coo_to_csr_native():
    import ctypes

    lib = native._load()
    row = np.array([2, 0, 1, 0, 2], dtype=np.int32)
    col = np.array([1, 3, 0, 1, 0], dtype=np.int32)
    indptr = np.zeros(4, dtype=np.int64)
    indices = np.zeros(5, dtype=np.int32)
    rc = lib.hg_coo_to_csr(
        native._i32p(row), native._i32p(col), 5, 3,
        native._i64p(indptr), native._i32p(indices),
    )
    assert rc == 0
    assert indptr.tolist() == [0, 2, 3, 5]
    assert indices.tolist() == [1, 3, 0, 0, 1]
