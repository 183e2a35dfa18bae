"""Generate deterministic real-shaped fixture datasets (all 4 raw formats).

The environment has no network egress, so the reference's 13 raw
datasets cannot be fetched; these committed fixtures exercise every
loader family end-to-end (tier-1 analogue of the reference's
``test/hgnn_test.py:65-92``) with learnable (homophilic) structure so
accuracy assertions are meaningful.  Output: tests/fixtures/data/.

Deterministic: fixed seeds, stable file ordering.  Re-run to regenerate.
"""

import os
import pickle

import numpy as np
import scipy.sparse as sp

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "data")


def homophilic_edges(labels, num_edges, avg_size, noise, rng):
    """Hyperedges drawn mostly within one class (AllSet-benchmark-like
    community structure) — models must beat chance on these."""
    n_classes = labels.max() + 1
    by_class = [np.nonzero(labels == c)[0] for c in range(n_classes)]
    edge_lists = []
    for _ in range(num_edges):
        c = rng.integers(0, n_classes)
        pool = by_class[c]
        k = max(int(rng.poisson(avg_size)), 2)
        k = min(k, pool.size)
        members = rng.choice(pool, size=k, replace=False)
        flip = rng.random(k) < noise
        members[flip] = rng.integers(0, labels.size, size=int(flip.sum()))
        edge_lists.append(sorted(set(int(m) for m in members)))
    return edge_lists


def make_le_zoo():
    """LE format: <name>.content (id feat... label) + <name>.edges."""
    rng = np.random.default_rng(11)
    n, n_classes, n_feat = 120, 4, 16
    labels = rng.integers(0, n_classes, size=n)
    centers = rng.normal(size=(n_classes, n_feat))
    feats = centers[labels] + 0.4 * rng.normal(size=(n, n_feat))
    edge_lists = homophilic_edges(labels, 70, 5.0, 0.1, rng)
    d = os.path.join(OUT, "zoo", "raw")
    os.makedirs(d, exist_ok=True)
    ids = 1000 + np.arange(n)  # non-contiguous raw ids (real LE files are)
    with open(os.path.join(d, "zoo.content"), "w") as f:
        for i in range(n):
            fv = " ".join(f"{v:.4f}" for v in feats[i])
            f.write(f"{ids[i]} {fv} class{labels[i]}\n")
    with open(os.path.join(d, "zoo.edges"), "w") as f:
        for members in edge_lists:
            f.write(" ".join(str(ids[m]) for m in members) + "\n")


def make_citation_cora():
    """AllSet citation pickles: features/labels/hypergraph."""
    rng = np.random.default_rng(22)
    n, n_classes, n_feat = 150, 3, 24
    labels = rng.integers(0, n_classes, size=n)
    base = np.zeros((n, n_feat), dtype=np.float32)
    for i in range(n):
        on = rng.choice(n_feat // n_classes, size=3, replace=False)
        base[i, labels[i] * (n_feat // n_classes) + on] = 1.0  # sparse BoW-like
    feats = sp.csr_matrix(base)
    edge_lists = homophilic_edges(labels, 90, 4.0, 0.1, rng)
    d = os.path.join(OUT, "cora", "raw")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "features.pickle"), "wb") as f:
        pickle.dump(feats, f)
    with open(os.path.join(d, "labels.pickle"), "wb") as f:
        pickle.dump([int(x) for x in labels], f)
    with open(os.path.join(d, "hypergraph.pickle"), "wb") as f:
        pickle.dump({f"cite{i}": members for i, members in enumerate(edge_lists)}, f)


def make_cornell_walmart():
    """Cornell format: node-labels-*.txt (1-based labels) +
    hyperedges-*.txt (1-based comma-separated member lists)."""
    rng = np.random.default_rng(33)
    n, n_classes = 140, 4
    labels = rng.integers(0, n_classes, size=n)
    edge_lists = homophilic_edges(labels, 80, 6.0, 0.1, rng)
    d = os.path.join(OUT, "walmart-trips", "raw")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "node-labels-walmart-trips.txt"), "w") as f:
        for l in labels:
            f.write(f"{l + 1}\n")
    with open(os.path.join(d, "hyperedges-walmart-trips.txt"), "w") as f:
        for members in edge_lists:
            f.write(",".join(str(m + 1) for m in members) + "\n")


def make_yelp():
    """Yelp CSVs: yelp_business.csv (business_id, f*, label) +
    yelp_edges.csv (vertex, edge)."""
    rng = np.random.default_rng(44)
    n, n_classes, n_feat = 130, 3, 12
    labels = rng.integers(0, n_classes, size=n)
    centers = rng.normal(size=(n_classes, n_feat))
    feats = centers[labels] + 0.4 * rng.normal(size=(n, n_feat))
    edge_lists = homophilic_edges(labels, 75, 5.0, 0.1, rng)
    d = os.path.join(OUT, "yelp", "raw")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "yelp_business.csv"), "w") as f:
        cols = ",".join(f"f{i}" for i in range(n_feat))
        f.write(f"business_id,{cols},label\n")
        for i in range(n):
            fv = ",".join(f"{v:.4f}" for v in feats[i])
            f.write(f"b{i:04d},{fv},{labels[i]}\n")
    with open(os.path.join(d, "yelp_edges.csv"), "w") as f:
        f.write("vertex,edge\n")
        for e, members in enumerate(edge_lists):
            for m in members:
                f.write(f"{m},{e}\n")


if __name__ == "__main__":
    make_le_zoo()
    make_citation_cora()
    make_cornell_walmart()
    make_yelp()
    total = 0
    for base, _, files in os.walk(OUT):
        for fn in files:
            total += os.path.getsize(os.path.join(base, fn))
    print(f"fixtures written to {OUT} ({total/1024:.1f} KiB)")
