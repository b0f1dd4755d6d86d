"""Approximate-nearest-neighbor search over the embeddings table.

- ``ann_topk_bruteforce``: exact cosine top-k — broadcast query matrix
  (ray.put once), one numpy matmul per batch, per-batch top-k partials,
  final exact top-k on the tiny candidate set.  The oracle-checkable
  baseline; scales linearly in corpus size with no shuffle.
- ``ann_topk_ivf``: IVF-style variant — k-means-ish coarse centroids
  (deterministic seed), batches route vectors to nearest centroid
  (groupby cell), queries probe the ``n_probe`` nearest cells only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def _load_queries(emb_path: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    emb = pd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    emb = emb.sort_values("vec_id").head(n_queries)
    q = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    return emb["vec_id"].to_numpy(), q


def ann_topk_bruteforce(emb_path: str, k: int = 10, n_queries: int = 5) -> pd.DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vec_ids
    (queries broadcast; corpus streamed; per-batch partial top-k)."""
    q_ids, q_mat = _load_queries(emb_path, n_queries)
    ref = ray.put((q_ids, q_mat))

    class Partial:
        def __init__(self, r):
            self.q_ids, self.q = ray.get(r)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = self.q @ mat.T  # (n_queries × batch)
            ids = df["vec_id"].to_numpy()
            recs = []
            kk = min(k, sims.shape[1])
            for qi in range(len(self.q_ids)):
                top = np.argpartition(-sims[qi], kk - 1)[:kk]
                for j in top:
                    recs.append((int(self.q_ids[qi]), int(ids[j]), float(sims[qi, j])))
            return pd.DataFrame(recs, columns=["query_id", "neighbor_id", "cos"])

    partials = (
        ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(Partial, fn_constructor_args=(ref,), batch_format="pandas", batch_size=4096, concurrency=2)
        .to_pandas()
    )
    # final exact top-k over the tiny candidate set (n_queries × k × n_batches)
    out = (
        partials.sort_values(["query_id", "cos"], ascending=[True, False])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["cos"] = out["cos"].round(6)
    return out[["query_id", "neighbor_id", "cos"]]


def ann_topk_ivf(
    emb_path: str, k: int = 10, n_queries: int = 5, n_cells: int = 16, n_probe: int = 4, seed: int = 11
) -> pd.DataFrame:
    """IVF-bucketed ANN: centroids from a deterministic sample, corpus
    routed to cells (groupby shuffle of id+vector rows), queries probe the
    nearest cells.  Approximate: recall measured against brute force in
    tests."""
    emb = pd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat_n = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    centroids = mat_n[rng.choice(len(mat_n), size=min(n_cells, len(mat_n)), replace=False)]
    q_ids, q_mat = _load_queries(emb_path, n_queries)
    cent_ref = ray.put(centroids)

    class Route:
        def __init__(self, r):
            self.centroids = ray.get(r)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            cell = np.argmax(m @ self.centroids.T, axis=1)
            return pd.DataFrame({"cell": cell.astype(np.int64), "vec_id": df["vec_id"], "embedding": df["embedding"]})

    probe_cells = set(np.argsort(-(q_mat @ centroids.T), axis=1)[:, :n_probe].ravel().tolist())
    routed = (
        ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(Route, fn_constructor_args=(cent_ref,), batch_format="pandas", batch_size=4096, concurrency=2)
        .map_batches(
            lambda df: df[df.cell.isin(probe_cells)], batch_format="pandas"
        )  # prune non-probed cells before any shuffle
        .to_pandas()
    )
    if not len(routed):
        return pd.DataFrame(columns=["query_id", "neighbor_id", "cos"])
    cand = np.stack(routed["embedding"].to_numpy()).astype(np.float64)
    cand = cand / np.maximum(np.linalg.norm(cand, axis=1, keepdims=True), 1e-12)
    sims = q_mat @ cand.T
    ids = routed["vec_id"].to_numpy()
    recs = []
    for qi in range(len(q_ids)):
        kk = min(k, sims.shape[1])
        top = np.argsort(-sims[qi])[:kk]
        for j in top:
            recs.append((int(q_ids[qi]), int(ids[j]), round(float(sims[qi, j]), 6)))
    return pd.DataFrame(recs, columns=["query_id", "neighbor_id", "cos"])
