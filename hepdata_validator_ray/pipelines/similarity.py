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
import pyarrow as pa
import ray
import ray.data

from hepdata_validator_ray.ops import splitmix64 as _splitmix64


def _load_queries(emb_path: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Query matrix = the first ``n_queries`` vec_ids, fetched via a
    predicate-pushdown read (row-group pruning on ``vec_id < n_queries``;
    vec_ids are dense 0-based) — the driver never loads the full table."""
    import pyarrow.dataset as pads

    emb = (
        ray.data.read_parquet(
            emb_path, columns=["vec_id", "embedding"], filter=(pads.field("vec_id") < n_queries)
        )
        .to_pandas()
        .sort_values("vec_id")
        .head(n_queries)
    )
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


def ann_meta(emb_path: str, k: int = 10, n_queries: int = 5, n_cells: int = 16) -> pd.DataFrame:
    """Both ANN paths as ONE gated (method, query_id, neighbor_id, cos)
    union: 'brute' = exact streamed cosine top-k, 'ivf' = the IVF routing
    pipeline run FULL-PROBE (``n_probe = n_cells``) so every cell is probed
    and the routing/pruning/partial-merge machinery must reproduce the exact
    result — the gate proves the IVF plumbing is lossless when nothing is
    pruned (the dedup_embedding_lsh full-recall-config precedent); the
    approximate default config stays measured by the recall test +
    ``ann_topk_ivf`` tail query."""
    # the two legs run SEQUENTIALLY, deliberately: each leg interleaves
    # read_parquet plan construction with execution, and Ray Data's path
    # resolver re-attempts a lazy `fsspec.implementations.http` import on
    # every read_parquet — that import always fails here (no aiohttp), Ray
    # catches the ModuleNotFoundError, but a SECOND thread importing
    # concurrently can observe the partially-initialized module and get a
    # plain ImportError Ray does not catch.  The overlapped fused queries
    # elsewhere (embedding_cluster_meta, bench._consume_concurrent) are safe
    # because they construct ALL plans serially and only execute in threads;
    # these legs cannot without refactoring their internal two-phase reads.
    brute = ann_topk_bruteforce(emb_path, k=k, n_queries=n_queries)
    ivf = ann_topk_ivf(emb_path, k=k, n_queries=n_queries, n_cells=n_cells, n_probe=n_cells)
    brute = brute.copy()
    brute.insert(0, "method", "brute")
    ivf = ivf.copy()
    ivf.insert(0, "method", "ivf")
    out = pd.concat([brute, ivf], ignore_index=True)
    out["query_id"] = out["query_id"].astype("int64")
    out["neighbor_id"] = out["neighbor_id"].astype("int64")
    return out


def _sample_centroids(emb_path: str, n_cells: int, seed: int) -> np.ndarray:
    """Deterministic distributed centroid sample: a hash filter on vec_id
    keeps ~4×n_cells rows (rate from the Parquet metadata row count — no
    data read), only that sample reaches the driver, and a seeded rng picks
    the final n_cells.  Replaces the full-table driver load (VERDICT r1 #3)."""
    ds = ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
    n_total = ds.count()  # metadata-only on a fresh parquet read
    target = min(max(4 * n_cells, n_cells), max(n_total, 1))
    cutoff = np.uint64(min(1.0, target / max(n_total, 1)) * float(1 << 32))
    s = np.uint64(seed)

    def hash_filter(df: pd.DataFrame) -> pd.DataFrame:
        h = _splitmix64(df["vec_id"].to_numpy(dtype=np.uint64) ^ s) >> np.uint64(32)
        return df[h < cutoff]

    sample = ds.map_batches(hash_filter, batch_format="pandas", batch_size=8192).to_pandas()
    if not len(sample):  # degenerate corpus smaller than the rate granularity
        sample = ds.limit(n_cells).to_pandas()
    mat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    pick = rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)
    return mat[np.sort(pick)]


def ann_topk_ivf(
    emb_path: str, k: int = 10, n_queries: int = 5, n_cells: int = 16, n_probe: int = 4, seed: int = 11
) -> pd.DataFrame:
    """IVF-bucketed ANN: centroids from a deterministic DISTRIBUTED sample,
    each batch routes its vectors to cells and keeps only probed-cell
    candidates, then emits per-query partial top-k — the driver merges only
    n_batches × n_queries × k partial rows (never the candidate set).
    Approximate: recall measured against brute force in tests."""
    centroids = _sample_centroids(emb_path, n_cells, seed)
    q_ids, q_mat = _load_queries(emb_path, n_queries)
    probe_cells = np.unique(np.argsort(-(q_mat @ centroids.T), axis=1)[:, :n_probe].ravel())
    ref = ray.put((centroids, probe_cells, q_ids, q_mat))

    class RouteScore:
        """Route → prune to probed cells → per-batch partial top-k.
        Broadcast state (centroids + queries) resolved once per actor."""

        def __init__(self, r):
            self.centroids, self.probe, self.q_ids, self.q = ray.get(r)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            cell = np.argmax(m @ self.centroids.T, axis=1)
            keep = np.isin(cell, self.probe)
            if not keep.any():
                return pd.DataFrame({"query_id": [], "neighbor_id": [], "cos": []})
            m = m[keep]
            ids = df["vec_id"].to_numpy()[keep]
            sims = self.q @ m.T
            kk = min(k, sims.shape[1])
            recs = []
            for qi in range(len(self.q_ids)):
                top = np.argpartition(-sims[qi], kk - 1)[:kk]
                for j in top:
                    recs.append((int(self.q_ids[qi]), int(ids[j]), float(sims[qi, j])))
            return pd.DataFrame(recs, columns=["query_id", "neighbor_id", "cos"])

    partials = (
        ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(RouteScore, fn_constructor_args=(ref,), batch_format="pandas", batch_size=4096, concurrency=2)
        .to_pandas()
    )
    if not len(partials):
        return pd.DataFrame(columns=["query_id", "neighbor_id", "cos"])
    out = (
        partials.sort_values(["query_id", "cos"], ascending=[True, False])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["cos"] = out["cos"].round(6)
    out["query_id"] = out["query_id"].astype("int64")
    out["neighbor_id"] = out["neighbor_id"].astype("int64")
    return out[["query_id", "neighbor_id", "cos"]]


def similarity_calibration(
    emb_path: str,
    n_buckets: int = 16,
    thresholds_x100: tuple[int, ...] = (0, 20, 40, 60, 80),
) -> "ray.data.Dataset":
    """Cosine-threshold CALIBRATION over a deterministic pair sample: for
    each candidate threshold t/100, how many sampled pairs sit at-or-above
    it — the measurement that picks SemDeDup / near-dup thresholds from
    the corpus's actual similarity geometry instead of folklore.

    The pair sample is content-derived, not random: vectors hash-bucket by
    md5(vec_id) % n_buckets (a NON-locality hash — within-bucket pairs are
    a uniform pair sample, unlike LSH buckets), and all pairs form WITHIN
    buckets only.  Scale: choose n_buckets ∝ N so the expected bucket stays
    constant-size; sampled pairs then grow ~N·(bucket−1)/2 — linear, never
    the N² all-pairs — and each bucket is an independent map_groups task.

    Integer-exact at every step, so the SQL twin is hash-exact: vectors
    quantize at scale 100, and the EXACT int64-safety bound is asserted
    per batch on the quantized squared norms: by Cauchy–Schwarz
    ``dot² ≤ qa·qb``, so both ladder sides are ≤ 10⁴·qa·qb — requiring
    ``max(q·q) ≤ 3·10⁷`` keeps every product under 2⁶³ for ANY dimension
    (a |x|-only bound is dimension-blind and silently wraps above
    ~121 dims — review finding).  "Above t" is
    ``dot > 0 AND dot²·10⁴ ≥ t²·qa·qb`` (for t = 0 just dot > 0) — the
    float cosine never exists.

    Output (thr_x100, n_pairs, n_above)."""
    from ray.data.aggregate import Sum

    from hepdata_validator_ray.pipelines.sampling import _bucket_of

    thresholds = tuple(int(t) for t in thresholds_x100)
    if any(t < 0 or t > 100 for t in thresholds):
        raise ValueError("thresholds_x100 must be within [0, 100]")

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        q = np.floor(mat * 100.0 + 0.5).astype(np.int64)
        if len(q):
            qq_max = int(np.einsum("ij,ij->i", q, q).max())
            if qq_max > 30_000_000:
                raise ValueError(
                    f"quantized squared norm {qq_max} > 3e7: dot²·10⁴ could "
                    "exceed int64 — rescale or reduce dimension"
                )
        b = _bucket_of(df["vec_id"].to_numpy(), n_buckets, "md5")
        return pd.DataFrame({"bucket": b, "qe": list(q)})

    def _bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        q = np.stack(df["qe"].to_numpy()).astype(np.int64)
        n = len(q)
        if n < 2:
            return pd.DataFrame(
                {
                    "thr_x100": pd.Series(dtype="int64"),
                    "n_pairs": pd.Series(dtype="int64"),
                    "n_above": pd.Series(dtype="int64"),
                }
            )
        dots = q @ q.T  # int64-exact
        qq = np.einsum("ij,ij->i", q, q)
        iu = np.triu_indices(n, k=1)
        d = dots[iu]
        prod = qq[iu[0]] * qq[iu[1]]
        n_pairs = len(d)
        pos = d > 0
        d2 = d * d * 10_000
        rows = []
        for t in thresholds:
            above = int((pos & (d2 >= t * t * prod)).sum()) if t else int(pos.sum())
            rows.append((t, n_pairs, above))
        return pd.DataFrame(rows, columns=["thr_x100", "n_pairs", "n_above"]).astype("int64")

    return (
        ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(_prep, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_bucket_pairs, batch_format="pandas")
        .groupby("thr_x100")
        .aggregate(Sum("n_pairs", alias_name="n_pairs"), Sum("n_above", alias_name="n_above"))
    )


def knn_label_agreement(emb_path: str, k: int = 10, target_mod: int = 5) -> pd.DataFrame:
    """Label-noise detection by k-NN agreement: for each target vector,
    how many of its k nearest cosine neighbors (self excluded) carry the
    SAME label — a low count flags a mislabeled / out-of-cluster point,
    the standard embedding-space QC before contrastive training.

    Targets are the deterministic subset ``vec_id % target_mod == 0``
    (the broadcast side — the ann_topk query discipline: the target
    matrix ships once via ray.put, the corpus streams, each batch emits
    a per-target partial top-k carrying neighbor labels, the driver
    merges |targets|·k·n_batches bounded candidates).  For whole-corpus
    self-agreement at the 10^12 tier the target set itself is
    corpus-scale and this becomes the IVF-bucketed variant (each cell
    computes agreement locally) — ann_topk_ivf is that routing; here the
    brute path is the gated baseline.  Ranking ties break on
    (cos DESC, neighbor_id) in both engines.

    Output (vec_id, label, n_agree, k_eff)."""
    import pyarrow.dataset as pads

    def keep_targets(t):
        if target_mod <= 1:
            return t
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % target_mod == 0))

    tgt = (
        ray.data.read_parquet(emb_path, columns=["vec_id", "embedding", "label"])
        .map_batches(keep_targets, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
    )
    t_ids = tgt["vec_id"].to_numpy(np.int64)
    t_labels = tgt["label"].to_numpy(np.int64)
    q = np.stack(tgt["embedding"].to_numpy()).astype(np.float64)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    ref = ray.put((t_ids, q))

    class Partial:
        def __init__(self, r):
            self.t_ids, self.q = ray.get(r)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = self.q @ mat.T  # (targets × batch)
            ids = df["vec_id"].to_numpy(np.int64)
            labels = df["label"].to_numpy(np.int64)
            recs = []
            for qi in range(len(self.t_ids)):
                s = sims[qi]
                mask = ids != self.t_ids[qi]  # self excluded
                cand = np.flatnonzero(mask)
                kk = min(k, len(cand))
                if not kk:
                    continue
                top = cand[np.argpartition(-s[cand], kk - 1)[:kk]]
                for j in top:
                    recs.append(
                        (int(self.t_ids[qi]), int(ids[j]), float(s[j]), int(labels[j]))
                    )
            return pd.DataFrame(recs, columns=["query_id", "neighbor_id", "cos", "n_label"])

    partials = (
        ray.data.read_parquet(emb_path, columns=["vec_id", "embedding", "label"])
        .map_batches(Partial, fn_constructor_args=(ref,), batch_format="pandas", batch_size=4096, concurrency=2)
        .to_pandas()
    )
    top = (
        partials.sort_values(
            ["query_id", "cos", "neighbor_id"], ascending=[True, False, True], kind="mergesort"
        )
        .groupby("query_id", as_index=False)
        .head(k)
    )
    lab_of = dict(zip(t_ids, t_labels))
    same = top.assign(
        same=(top["n_label"].to_numpy() == top["query_id"].map(lab_of).to_numpy()).astype(np.int64)
    )
    agg = same.groupby("query_id").agg(k_eff=("neighbor_id", "size"), n_agree=("same", "sum"))
    out = agg.reset_index().rename(columns={"query_id": "vec_id"})
    out["label"] = out["vec_id"].map(lab_of)
    return (
        out[["vec_id", "label", "n_agree", "k_eff"]]
        .astype({"vec_id": "int64", "label": "int64", "n_agree": "int64", "k_eff": "int64"})
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def _fixed_ivf_state(
    emb_path: str, n_queries: int, n_probe: int, centroid_ids: tuple[int, ...] | None
):
    """(cq, probe_mask, q_ids, q_mat): quantized fixed centroids + per-query
    probe mask under the integer (d2, cid) rule — shared by ann_ivf_recall
    and the gated ann_topk_ivf_fixed."""
    from hepdata_validator_ray.pipelines.cluster import (
        DEFAULT_CENTROID_IDS,
        _load_rows,
        _quantize,
    )

    cids = tuple(centroid_ids) if centroid_ids is not None else DEFAULT_CENTROID_IDS
    cents, cid_arr = _load_rows(emb_path, cids)
    cq = _quantize(cents)
    q_ids, q_mat = _load_queries(emb_path, n_queries)
    qq = _quantize(
        np.stack(
            ray.data.read_parquet(
                emb_path,
                columns=["vec_id", "embedding"],
                filter=__import__("pyarrow.dataset", fromlist=["x"]).field("vec_id")
                < int(q_ids.max()) + 1,
            )
            .to_pandas()
            .sort_values("vec_id")
            .head(len(q_ids))["embedding"]
            .to_numpy()
        )
    )
    d2 = (
        (qq * qq).sum(axis=1)[:, None]
        + (cq * cq).sum(axis=1)[None, :]
        - 2 * (qq @ cq.T)
    )
    probe_mask = np.zeros((len(q_ids), len(cid_arr)), dtype=bool)
    for i in range(len(q_ids)):
        order = np.lexsort((np.arange(len(cid_arr)), d2[i]))[:n_probe]
        probe_mask[i, order] = True
    return cq, probe_mask, q_ids, q_mat


def ann_topk_ivf_fixed(
    emb_path: str,
    k: int = 10,
    n_queries: int = 5,
    n_probe: int = 2,
    centroid_ids: tuple[int, ...] | None = None,
) -> pd.DataFrame:
    """IVF top-k under the FIXED quantized centroids + integer routing rule
    (embedding_kmeans assignment; probe ranking by (d2, cid)) — the
    SQL-expressible IVF search that graduates ``ann_topk_ivf`` from
    rows-only to hash-gated (VERDICT r4 #5; the sampled-centroid variant
    stays the production scale path).  Per batch: route vectors to cells,
    keep probed-cell candidates for each query, emit per-query partial
    top-k; the driver merges n_batches × n_queries × k bounded partials
    under the (cos DESC, vec_id) total order and rounds cos to 6 decimals
    (the ann_meta float discipline).

    Output (query_id, neighbor_id, cos)."""
    from hepdata_validator_ray.pipelines.cluster import _assign_quantized, _quantize

    cq, probe_mask, q_ids, q_mat = _fixed_ivf_state(emb_path, n_queries, n_probe, centroid_ids)
    ref = ray.put((cq, probe_mask, q_ids, q_mat))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        cq_l, probe_l, qi_l, qm_l = ray.get(ref)
        raw = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        cell, _ = _assign_quantized(_quantize(raw), cq_l)
        m = raw / np.maximum(np.linalg.norm(raw, axis=1, keepdims=True), 1e-12)
        ids = df["vec_id"].to_numpy(np.int64)
        sims = qm_l @ m.T
        recs = []
        for qi in range(len(qi_l)):
            pm = probe_l[qi, cell]
            if not pm.any():
                continue
            s = sims[qi][pm]
            idj = ids[pm]
            kk = min(k, len(s))
            top = np.argpartition(-s, kk - 1)[:kk]
            for j in top:
                recs.append((int(qi_l[qi]), int(idj[j]), float(s[j])))
        return pd.DataFrame(recs, columns=["query_id", "neighbor_id", "cos"])

    cands = (
        ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(score, batch_format="pandas", batch_size=4096)
        .to_pandas()
    )  # ≤ n_batches × n_queries × k — the bounded merge
    if not len(cands):
        return pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "neighbor_id": pd.Series(dtype="int64"),
                "cos": pd.Series(dtype="float64"),
            }
        )
    out = (
        cands.sort_values(["query_id", "cos", "neighbor_id"], ascending=[True, False, True], kind="mergesort")
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["cos"] = out["cos"].round(6)
    return out.astype({"query_id": "int64", "neighbor_id": "int64", "cos": "float64"})


def ann_ivf_recall(
    emb_path: str,
    k: int = 10,
    n_queries: int = 20,
    n_probe: int = 2,
    centroid_ids: tuple[int, ...] | None = None,
) -> pd.DataFrame:
    """Recall@k evaluation of IVF probing against exact brute force — the
    ANN quality dial every similarity deployment needs BEFORE trusting a
    probe budget: per query, |IVF top-k ∩ exact top-k| / k, where the IVF
    side searches only the ``n_probe`` cells nearest the query.

    Cells use the embedding_kmeans QUANTIZED integer assignment (argmin
    d2, ties → lowest centroid id) so routing is exact on both engines
    and the whole evaluation is SQL-expressible — unlike the sampled-
    centroid ann_topk_ivf, whose rng centroids have no SQL twin.  ONE
    corpus pass serves both sides: each batch assigns cells, scores all
    queries, and emits per-query partial top-k twice (tag 0 = brute over
    everything, tag 1 = probed cells only); the driver merges the
    bounded 2 × n_batches × n_queries × k candidate table.  n_ivf < k
    happens when the probed cells hold fewer than k vectors (mirrored).

    Output (query_id, n_ivf, n_hit, recall)."""
    from hepdata_validator_ray.pipelines.cluster import _assign_quantized, _quantize

    cq, probe_mask, q_ids, q_mat = _fixed_ivf_state(emb_path, n_queries, n_probe, centroid_ids)
    ref = ray.put((cq, probe_mask, q_ids, q_mat))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        cq_l, probe_l, qi_l, qm_l = ray.get(ref)
        raw = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        cell, _ = _assign_quantized(_quantize(raw), cq_l)
        m = raw / np.maximum(np.linalg.norm(raw, axis=1, keepdims=True), 1e-12)
        ids = df["vec_id"].to_numpy(np.int64)
        sims = qm_l @ m.T
        recs = []
        for qi in range(len(qi_l)):
            s = sims[qi]
            kk = min(k, len(s))
            top = np.argpartition(-s, kk - 1)[:kk]
            for j in top:
                recs.append((int(qi_l[qi]), int(ids[j]), float(s[j]), 0))
            pm = probe_l[qi, cell]
            if pm.any():
                sj = s[pm]
                idj = ids[pm]
                kk = min(k, len(sj))
                top = np.argpartition(-sj, kk - 1)[:kk]
                for j in top:
                    recs.append((int(qi_l[qi]), int(idj[j]), float(sj[j]), 1))
        return pd.DataFrame(recs, columns=["query_id", "vec_id", "cos", "tag"])

    cands = (
        ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(score, batch_format="pandas", batch_size=4096)
        .to_pandas()
    )  # ≤ 2 × n_batches × n_queries × k — the bounded merge
    out = []
    for qid in q_ids:
        sub = cands[cands["query_id"] == qid]
        tops = {}
        for tag in (0, 1):
            t = sub[sub["tag"] == tag].sort_values(
                ["cos", "vec_id"], ascending=[False, True], kind="mergesort"
            )
            t = t.drop_duplicates("vec_id").head(k)
            tops[tag] = set(t["vec_id"].tolist())
        n_hit = len(tops[0] & tops[1])
        out.append(
            {
                "query_id": int(qid),
                "n_ivf": len(tops[1]),
                "n_hit": n_hit,
                "recall": n_hit / float(k),
            }
        )
    return pd.DataFrame(out).astype(
        {"query_id": "int64", "n_ivf": "int64", "n_hit": "int64", "recall": "float64"}
    )
