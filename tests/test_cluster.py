"""Embedding clustering + semantic dedup (pipelines/cluster.py).

The quantized paths are verified against local numpy references (exact
integer equality — the same math the DuckDB oracle replays); the Lloyd fit
is verified against a single-process numpy Lloyd on the same init.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from hepdata_validator_ray.pipelines import cluster

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb_matrix():
    t = pq.read_table(EMB)
    ids = t["vec_id"].to_numpy()
    mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _local_assign(mat, cids, ids):
    q = cluster._quantize(mat)
    cq = q[np.searchsorted(ids, cids)]
    amin, mind2 = cluster._assign_quantized(q, cq)
    return amin, mind2


def test_kmeans_assign_quantized_matches_local(emb_matrix):
    ids, mat = emb_matrix
    cids = np.asarray(sorted(cluster.DEFAULT_CENTROID_IDS), dtype=np.int64)
    amin, mind2 = _local_assign(mat, cids, ids)
    exp = (
        pd.DataFrame({"cluster": cids[amin], "d2": mind2})
        .groupby("cluster")
        .agg(n=("d2", "size"), inertia=("d2", "sum"))
        .reset_index()
    )
    got = cluster.kmeans_assign_quantized(EMB).to_pandas().sort_values("cluster").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_semantic_dedup_removed_matches_local(emb_matrix):
    ids, mat = emb_matrix
    cids = np.asarray(sorted(cluster.DEFAULT_CENTROID_IDS), dtype=np.int64)
    amin, _ = _local_assign(mat, cids, ids)
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = norm @ norm.T
    thr = 0.4
    rows = []
    for b in range(len(ids)):
        same = (amin == amin[b]) & (ids < ids[b]) & (sims[:, b] >= thr)
        if same.any():
            rows.append((int(ids[b]), int(ids[same].min())))
    exp = pd.DataFrame(rows, columns=["removed_id", "winner_id"]).sort_values("removed_id").reset_index(drop=True)
    got = (
        cluster.semantic_dedup_removed(EMB, threshold=thr)
        .to_pandas()
        .sort_values("removed_id")
        .reset_index(drop=True)
    )
    assert len(got) > 0, "fixture should contain same-cell near-dups"
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_semantic_dedup_fitted_centroids_path(emb_matrix):
    """Production path: float centroids from kmeans_fit; every reported pair
    must be a true >= threshold cosine pair with winner < removed."""
    ids, mat = emb_matrix
    cents, inertia = cluster.kmeans_fit(EMB, n_clusters=4, n_iter=2, seed=7)
    assert cents.shape == (4, mat.shape[1]) and np.isfinite(inertia)
    got = cluster.semantic_dedup_removed(EMB, centroids=cents, threshold=0.4).to_pandas()
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    lookup = {int(v): i for i, v in enumerate(ids)}
    for r in got.itertuples(index=False):
        assert r.winner_id < r.removed_id
        cos = float(norm[lookup[int(r.winner_id)]] @ norm[lookup[int(r.removed_id)]])
        assert cos >= 0.4 - 1e-9


def _dense_winners(norm: np.ndarray, thr: float) -> np.ndarray:
    """The pre-r4 O(n^2)-memory formulation, kept as the test oracle."""
    iu = np.triu(norm @ norm.T >= thr, k=1)
    w = np.where(iu.any(axis=0), iu.argmax(axis=0), -1)
    return w.astype(np.int64)


def test_semdedup_winners_blockwise_equals_dense():
    """_semdedup_winners is exact for ANY block size: same output as the
    dense m @ m.T formulation, including block=1 and block > n."""
    rng = np.random.default_rng(42)
    for n, dim, thr in [(1, 4, 0.5), (7, 4, 0.3), (100, 8, 0.6), (257, 16, 0.8)]:
        m = rng.normal(size=(n, dim))
        # plant exact duplicates so hits are guaranteed at high thresholds
        if n >= 10:
            m[n // 2] = m[0]
            m[n - 1] = m[3]
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        exp = _dense_winners(m, thr)
        for block in (1, 2, 3, 64, n, n + 100):
            got = cluster._semdedup_winners(m, thr, block)
            np.testing.assert_array_equal(got, exp, err_msg=f"n={n} block={block}")


def test_semdedup_giant_cell_bounded_memory():
    """One giant dup-dense cell (the r3-verdict hazard): the kernel's peak
    allocation stays at block^2-scale, far under the dense n^2 matrix."""
    import tracemalloc

    rng = np.random.default_rng(7)
    n, dim, block = 6000, 16, 256
    m = rng.normal(size=(n, dim))
    # dup-dense: every 3rd row duplicates row i-3 (adversarial hot cell)
    for i in range(3, n, 3):
        m[i] = m[i - 3]
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    tracemalloc.start()
    got = cluster._semdedup_winners(m, 0.99, block)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    dense_bytes = n * n * 8
    assert peak < dense_bytes / 4, f"peak {peak} vs dense {dense_bytes}"
    assert peak < 80 * 1024 * 1024
    np.testing.assert_array_equal(got, _dense_winners(m, 0.99))


def test_semantic_dedup_single_cell_small_block(emb_matrix):
    """End-to-end: a single cell holding the whole corpus, dedup'd with a
    tiny cell_block, still matches the dense local reference exactly."""
    ids, mat = emb_matrix
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    thr = 0.4
    w = _dense_winners(norm, thr)
    sel = w >= 0
    exp = (
        pd.DataFrame({"removed_id": ids[sel], "winner_id": ids[w[sel]]})
        .sort_values("removed_id")
        .reset_index(drop=True)
    )
    got = (
        cluster.semantic_dedup_removed(EMB, centroid_ids=(0,), threshold=thr, cell_block=64)
        .to_pandas()
        .sort_values("removed_id")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_kmeans_fit_matches_local_lloyd(emb_matrix):
    """Distributed Lloyd == single-process Lloyd from the same init (allclose:
    partial-sum order differs, assignments must not)."""
    ids, mat = emb_matrix
    k, iters, seed = 8, 3, 11
    cents = cluster._init_centroids(EMB, k, seed)
    ref = cents.copy()
    for _ in range(iters):
        d2 = ((mat * mat).sum(1)[:, None] + (ref * ref).sum(1)[None, :] - 2 * mat @ ref.T)
        amin = d2.argmin(1)
        new = ref.copy()
        for j in range(k):
            m = amin == j
            if m.any():
                new[j] = mat[m].mean(0)
        ref = new
    got, inertia = cluster.kmeans_fit(EMB, n_clusters=k, n_iter=iters, seed=seed)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)
    assert inertia > 0


def test_assign_tie_breaks_to_lowest_centroid():
    q = np.array([[0, 0]], dtype=np.int64)
    cq = np.array([[3, 4], [4, 3], [5, 5]], dtype=np.int64)  # first two equidistant
    amin, mind2 = cluster._assign_quantized(q, cq)
    assert amin[0] == 0 and mind2[0] == 25


def test_load_rows_missing_centroid_raises():
    with pytest.raises(ValueError, match="centroid vec_ids"):
        cluster.kmeans_assign_quantized(EMB, centroid_ids=(0, 10**9)).to_pandas()


def test_label_centroid_sums_local_reference():
    """Distributed grouped vector aggregate equals a local numpy reference."""
    import numpy as np
    import pandas as pd

    from hepdata_validator_ray.pipelines.cluster import _quantize, label_centroid_sums

    SF = "/root/testdata/sf0.001"
    out = (
        label_centroid_sums(f"{SF}/embeddings.parquet")
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    ref = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["label", "embedding"])
    q = _quantize(np.stack(ref["embedding"].to_numpy()))
    labels = ref["label"].to_numpy().astype(np.int64)
    for lab in np.unique(labels):
        m = labels == lab
        sub = out[out["label"] == lab].sort_values("dim")
        assert (sub["n"].to_numpy() == m.sum()).all()
        assert (sub["sum_q"].to_numpy() == q[m].sum(axis=0)).all()
