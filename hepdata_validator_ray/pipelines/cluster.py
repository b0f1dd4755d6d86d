"""Embedding clustering + semantic (cluster-bounded) dedup.

Three operators over the embeddings table:

- ``kmeans_assign_quantized``: cluster-size / inertia summary of an
  assignment to FIXED centroids (centroids are corpus rows named by
  vec_id) computed in integer-exact quantized space — every distance is
  an int64, so the DuckDB oracle reproduces the result hash-exactly with
  no float-reduction-order risk.
- ``kmeans_fit``: distributed Lloyd iterations (float64 euclidean).
  Each pass is one streamed ``map_batches`` that emits per-cluster
  partial (count, sum-vector) rows; the driver reduces only
  ``n_batches x k`` tiny rows and broadcasts the new centroids.  The
  corpus never materializes.
- ``semantic_dedup_removed``: SemDeDup-style near-dup removal — assign
  every vector to a cell, then run exact pairwise cosine ONLY within
  each cell (``groupby(cell).map_groups``).  The cell count bounds the
  quadratic work: at web scale k grows with the corpus (SemDeDup uses
  10k-100k cells) so each cell stays worker-memory-sized.  A vector is
  removed when any lower-vec_id vector in the SAME cell has cosine >=
  threshold; the winner is the smallest such id (deterministic,
  SQL-expressible — the gated oracle recomputes cell assignment +
  within-cell pairs in DuckDB).

Partitioning assumption (documented per the custom-operator contract):
within-cell dedup requires each cell to fit in one worker's heap; cells
are the unit of parallelism, so k should be sized ~corpus_rows /
target_cell_rows.  Cross-cell near-dups are deliberately out of scope —
that recall/cost trade-off is the point of SemDeDup-style bucketing
(use ``dedup.embedding_lsh_pairs`` when cross-bucket recall matters).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from hepdata_validator_ray.ops import splitmix64 as _splitmix64

#: quantization scale for the integer-exact assignment path.  floor(x*S+0.5)
#: on float64 is bit-identical in numpy and DuckDB (single IEEE multiply+add,
#: no reductions), unlike round() whose half-even/half-away convention differs.
QUANT_SCALE = 1000


def _quantize(mat: np.ndarray) -> np.ndarray:
    return np.floor(mat.astype(np.float64) * float(QUANT_SCALE) + 0.5).astype(np.int64)


def _load_rows(emb_path: str, vec_ids: tuple[int, ...]) -> tuple[np.ndarray, np.ndarray]:
    """Fetch the named centroid rows via a predicate-pushdown read (row-group
    pruning; the driver never loads the full table), sorted by vec_id."""
    import pyarrow.dataset as pads

    ids = sorted(int(i) for i in vec_ids)
    df = (
        ray.data.read_parquet(
            emb_path, columns=["vec_id", "embedding"], filter=pads.field("vec_id").isin(ids)
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    missing = set(ids) - set(df["vec_id"].tolist())
    if missing:
        raise ValueError(f"centroid vec_ids not in corpus: {sorted(missing)}")
    return np.stack(df["embedding"].to_numpy()).astype(np.float64), np.asarray(ids, dtype=np.int64)


def _assign_quantized(q: np.ndarray, cq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """argmin_j ||q_i - c_j||^2 in int64 (ties -> lowest centroid index).
    Expansion form keeps it one int64 matmul; all terms exact."""
    qn = (q * q).sum(axis=1)
    cn = (cq * cq).sum(axis=1)
    d2 = qn[:, None] + cn[None, :] - 2 * (q @ cq.T)
    amin = d2.argmin(axis=1)  # first occurrence == lowest centroid id (sorted)
    return amin, d2[np.arange(len(q)), amin]


#: default fixed centroids for the gated query — spread across the corpus,
#: present at every test scale (embeddings >= 500 rows at all SFs)
DEFAULT_CENTROID_IDS = (0, 101, 217, 333, 449)

#: pairwise-block edge for within-cell SemDeDup: peak similarity-matrix
#: memory per step is BLOCK^2 float64 (~33 MB at 2048) regardless of cell
#: size, so a skewed hot cell degrades to more block steps, never to an
#: O(n^2) allocation in one task.
SEMDEDUP_CELL_BLOCK = 2048


def _semdedup_winners(
    m: np.ndarray, threshold: float, block: int = SEMDEDUP_CELL_BLOCK
) -> np.ndarray:
    """For row-normalized vectors ``m`` (ordered by ascending vec_id),
    return per-row ``winner`` indices: the SMALLEST index a < b with
    cosine(a, b) >= threshold, or -1 when none exists (row survives).

    Blockwise-exact: identical output to the dense ``m @ m.T`` formulation
    for any ``block`` — a-blocks are scanned in ascending order and a b
    entry is only written once, so the first hit IS the min index.  Early
    exit per b-block once every entry has a winner makes the dup-dense
    case (the hot-cell hazard) CHEAPER, not just bounded."""
    n = len(m)
    winner = np.full(n, -1, dtype=np.int64)
    for bs in range(0, n, block):
        be = min(bs + block, n)
        wblk = winner[bs:be]  # numpy view — writes land in `winner`
        for as_ in range(0, be, block):
            if (wblk >= 0).all():
                break
            ae = min(as_ + block, be)
            hit = (m[as_:ae] @ m[bs:be].T) >= threshold
            if ae > bs:  # blocks straddle the diagonal: enforce a < b
                hit &= np.arange(as_, ae)[:, None] < np.arange(bs, be)[None, :]
            fresh = (wblk < 0) & hit.any(axis=0)
            if fresh.any():
                # argmax over bool = first True row = min a within the block
                wblk[fresh] = as_ + hit[:, fresh].argmax(axis=0)
    return winner


def kmeans_assign_quantized(
    emb_path: str, centroid_ids: tuple[int, ...] = DEFAULT_CENTROID_IDS
) -> "ray.data.Dataset":
    """Per-cluster (n, inertia) under quantized-euclidean assignment to the
    corpus rows named by ``centroid_ids``.  Map-side combine: each batch
    ships at most k partial rows; the groupby is k-sized.

    Inertia is an exact int64 sum of per-row quantized distances.  Bound:
    with unit-scale embeddings (|x|<=1, d<=1024) per-row d2 <= ~4e9, so
    the sum stays exact past 10^9 rows per cluster; far beyond that,
    re-derive with a smaller QUANT_SCALE or split hi/lo words.  The final
    stage asserts non-negativity so a wrap fails loudly (the DuckDB twin
    errors loudly on its ::BIGINT cast at the same point)."""
    cents, cids = _load_rows(emb_path, centroid_ids)
    cq = _quantize(cents)

    # k x d int64 centroids are tiny — closure capture into stateless TASKS
    # beats an actor pool here (no per-run actor spin-up; nothing to cache)
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = _quantize(np.stack(df["embedding"].to_numpy()))
        amin, mind2 = _assign_quantized(q, cq)
        k = len(cids)
        n = np.bincount(amin, minlength=k)
        inertia = np.zeros(k, dtype=np.int64)
        np.add.at(inertia, amin, mind2)
        keep = n > 0
        return pd.DataFrame(
            {"cluster": cids[keep], "n": n[keep].astype(np.int64), "inertia": inertia[keep]}
        )

    return (
        ray.data.read_parquet(emb_path, columns=["embedding"])
        .map_batches(partial, batch_format="pandas", batch_size=4096)
        .groupby("cluster")
        .sum(["n", "inertia"])
        .map_batches(_finish_assign, batch_format="pyarrow")
    )


def _finish_assign(t):
    import pyarrow as pa

    t = t.rename_columns(["cluster", "n", "inertia"])
    import pyarrow.compute as pc

    if t.num_rows and pc.min(t["inertia"]).as_py() < 0:
        raise OverflowError(
            "inertia int64 sum wrapped negative — corpus too large for "
            "QUANT_SCALE; see kmeans_assign_quantized docstring"
        )
    return t


def _init_centroids(emb_path: str, n_clusters: int, seed: int) -> np.ndarray:
    """Deterministic distributed init: hash-filter sample (~4k rows reach the
    driver), seeded pick — same scheme as similarity._sample_centroids but
    un-normalized (euclidean Lloyd).  On corpora smaller than n_clusters the
    returned matrix has fewer rows (every available vector becomes a
    centroid); an empty corpus raises."""
    ds = ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
    n_total = ds.count()
    target = min(max(4 * n_clusters, n_clusters), max(n_total, 1))
    cutoff = np.uint64(min(1.0, target / max(n_total, 1)) * float(1 << 32))
    s = np.uint64(seed)

    def hash_filter(df: pd.DataFrame) -> pd.DataFrame:
        h = _splitmix64(df["vec_id"].to_numpy(dtype=np.uint64) ^ s) >> np.uint64(32)
        return df[h < cutoff]

    sample = ds.map_batches(hash_filter, batch_format="pandas", batch_size=8192).to_pandas()
    if not len(sample):
        sample = ds.limit(n_clusters).to_pandas()
    if not len(sample):
        raise ValueError(f"cannot initialise centroids: no rows in {emb_path}")
    mat = np.stack(sample.sort_values("vec_id")["embedding"].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    pick = rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)
    return mat[np.sort(pick)]


def kmeans_fit(
    emb_path: str, n_clusters: int = 8, n_iter: int = 5, seed: int = 11
) -> tuple[np.ndarray, float]:
    """Distributed Lloyd: per iteration ONE streamed pass emits per-cluster
    partial (n, sum-vector, sq-dist sum) rows; the driver reduces
    n_batches x k rows and rebroadcasts.  Returns (centroids, inertia).
    Empty clusters keep their previous centroid (deterministic).

    Inertia is the objective of the LAST assignment step (measured against
    the centroids entering the final pass, before their update) — the
    standard Lloyd convergence metric; recompute with n_iter+1 if the
    post-update objective is needed."""
    cents = _init_centroids(emb_path, n_clusters, seed)
    ds = ray.data.read_parquet(emb_path, columns=["embedding"])
    inertia = float("nan")

    def make_partial(c: np.ndarray):
        # k x d float centroids are small enough to closure-capture into
        # stateless tasks; each iteration rebroadcasts via the task closure
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            d2 = ((m * m).sum(axis=1)[:, None] + (c * c).sum(axis=1)[None, :] - 2 * (m @ c.T))
            amin = d2.argmin(axis=1)
            k = len(c)
            n = np.bincount(amin, minlength=k)
            sq = np.zeros(k, dtype=np.float64)
            np.add.at(sq, amin, d2[np.arange(len(m)), amin])
            sums = np.zeros((k, m.shape[1]), dtype=np.float64)
            np.add.at(sums, amin, m)
            keep = n > 0
            return pd.DataFrame(
                {
                    "cluster": np.flatnonzero(keep).astype(np.int64),
                    "n": n[keep].astype(np.int64),
                    "sq": sq[keep],
                    "s": list(sums[keep]),
                }
            )

        return partial

    for _ in range(max(n_iter, 1)):
        parts = ds.map_batches(
            make_partial(cents), batch_format="pandas", batch_size=4096
        ).to_pandas()
        new = cents.copy()
        inertia = float(parts["sq"].sum())
        for cl, grp in parts.groupby("cluster"):
            tot = int(grp["n"].sum())
            if tot > 0:
                new[int(cl)] = np.sum(np.stack(grp["s"].to_numpy()), axis=0) / tot
        cents = new
    return cents, inertia


def semantic_dedup_removed(
    emb_path: str,
    centroid_ids: tuple[int, ...] = DEFAULT_CENTROID_IDS,
    threshold: float = 0.4,
    centroids: np.ndarray | None = None,
    cell_block: int = SEMDEDUP_CELL_BLOCK,
) -> "ray.data.Dataset":
    """(removed_id, winner_id) pairs: vector b is removed when some a < b in
    the SAME cell has cosine(a, b) >= threshold; winner = min such a.

    Cell assignment is the integer-exact quantized argmin when cells come
    from ``centroid_ids`` (the oracle-checkable path); pass fitted float
    ``centroids`` (e.g. from :func:`kmeans_fit`) for the production path —
    same code, float64 argmin.

    Cross-engine float caveat (same class as the ln() note in
    text.TfIdfTopStage): the cosine>=threshold compare itself is float64 —
    numpy normalizes then BLAS-dots while DuckDB's oracle sums
    sequentially, so a pair within ~1 ulp of the threshold could flip
    between engines.  Thresholds are operator-chosen round numbers, never
    data values, so an exact tie is measure-zero; the gated config has
    been empirically hash-exact at every test scale.  (The cell
    assignment has no such risk — it is exact integer math.)"""
    if centroids is not None:
        cq = centroids.astype(np.float64)
        cids = np.arange(len(cq), dtype=np.int64)
        quant = False
    else:
        cents, cids = _load_rows(emb_path, centroid_ids)
        cq = _quantize(cents)
        quant = True
    # k x d centroids are tiny — closure capture into stateless tasks
    def route(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy())
        if quant:
            amin, _ = _assign_quantized(_quantize(m), cq)
        else:
            m64 = m.astype(np.float64)
            d2 = (
                (m64 * m64).sum(axis=1)[:, None]
                + (cq * cq).sum(axis=1)[None, :]
                - 2 * (m64 @ cq.T)
            )
            amin = d2.argmin(axis=1)
        return pd.DataFrame(
            {"cell": amin.astype(np.int64), "vec_id": df["vec_id"].to_numpy(), "embedding": df["embedding"]}
        )

    def in_cell(g: pd.DataFrame) -> pd.DataFrame:
        # exact pairwise cosine within one cell, BLOCKWISE: the cell is the
        # parallelism unit but the memory unit is cell_block^2 — a skewed
        # hot cell costs more steps, never an n^2 allocation (r3 verdict #2)
        g = g.sort_values("vec_id").reset_index(drop=True)
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        ids = g["vec_id"].to_numpy()
        winners = _semdedup_winners(m, threshold, cell_block)
        removed_mask = winners >= 0
        out = pd.DataFrame(
            {
                "removed_id": ids[removed_mask].astype(np.int64),
                "winner_id": ids[winners[removed_mask]].astype(np.int64),
            }
        )
        return out if len(out) else pd.DataFrame({"removed_id": pd.Series([], dtype="int64"), "winner_id": pd.Series([], dtype="int64")})

    return (
        ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(route, batch_format="pandas", batch_size=4096)
        .groupby("cell")
        .map_groups(in_cell, batch_format="pandas")
    )


def label_centroid_sums(emb_path: str) -> "ray.data.Dataset":
    """Grouped VECTOR aggregate: per label, the element-wise sum of the
    quantized embedding (the integer-exact centroid numerator) and the
    member count, in long form (label, dim, n, sum_q).  Each batch stacks
    its vectors once and collapses to |labels|×dim partial rows via one
    segment-sorted reduceat — the exchange is label×dim-sized at any
    corpus size; the centroid itself is sum_q / (n·QUANT_SCALE) downstream.
    Quantization = the kmeans floor(x·S + 0.5) convention, so the DuckDB
    zip-unnest oracle is hash-exact by construction."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "label": pd.Series(dtype="int64"),
                    "dim": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                    "sum_q": pd.Series(dtype="int64"),
                }
            )
        q = _quantize(np.stack(df["embedding"].to_numpy()))
        labels = df["label"].to_numpy().astype(np.int64)
        order = np.argsort(labels, kind="stable")
        q = q[order]
        labels = labels[order]
        seg_starts = np.flatnonzero(np.r_[True, labels[1:] != labels[:-1]])
        ns = np.diff(np.r_[seg_starts, len(labels)])
        sums = np.add.reduceat(q, seg_starts, axis=0)  # (|labels|, dim)
        d = q.shape[1]
        return pd.DataFrame(
            {
                "label": np.repeat(labels[seg_starts], d),
                "dim": np.tile(np.arange(d, dtype=np.int64), len(seg_starts)),
                "n": np.repeat(ns.astype(np.int64), d),
                "sum_q": sums.reshape(-1),
            }
        )

    return (
        ray.data.read_parquet(emb_path, columns=["label", "embedding"])
        .map_batches(partial, batch_format="pandas", batch_size=4096)
        .groupby(["label", "dim"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_q", alias_name="sum_q"))
    )


def centroid_pair_dots(emb_path: str) -> pd.DataFrame:
    """Pairwise centroid similarity in INTEGER space: for every label
    pair a < b, the dot product of their quantized centroid-sum vectors
    plus both member counts — the cluster-confusion summary (cosine =
    dot_q / (|a||b|·n_a·n_b·S²) downstream, but the gated artifact stays
    int64-exact).  Rides the distributed label_centroid_sums exchange
    (|labels|×dim rows); the pair matmul runs on that tiny table
    driver-side.  int64 bound: per-dim |sum_q| must stay below ~3·10⁸
    (n·S·|x| — holds through ~10⁵ members per label at unit-scale
    embeddings; quantize coarser beyond)."""
    lc = label_centroid_sums(emb_path).to_pandas()
    piv = lc.pivot(index="label", columns="dim", values="sum_q").sort_index()
    labels = piv.index.to_numpy(np.int64)
    m = piv.to_numpy(np.int64)
    ns = (
        lc[lc["dim"] == 0].set_index("label")["n"].reindex(piv.index).to_numpy(np.int64)
    )
    dots = m @ m.T  # integer-exact
    ia, ib = np.triu_indices(len(labels), k=1)
    return pd.DataFrame(
        {
            "label_a": labels[ia],
            "label_b": labels[ib],
            "dot_q": dots[ia, ib].astype(np.int64),
            "n_a": ns[ia],
            "n_b": ns[ib],
        }
    )


def embedding_random_projection(
    emb_path: str, out_dim: int = 16
) -> "ray.data.Dataset":
    """Johnson-Lindenstrauss random projection with a DETERMINISTIC
    Rademacher (±1) sign matrix: y = q(x) · R, where q is the corpus
    quantization (floor(x·1000 + 0.5) — integer-exact across engines)
    and R[i, j] = +1 iff (i·2654435761 + j·40503) % 1000 < 500 else −1 —
    the same bounded-integer rule family as the MLM mask, so the whole
    projection is reproducible by ANY engine from the formula alone (no
    shipped RNG state) and the DuckDB oracle is hash-exact.

    The map is stateless and embarrassingly parallel: R (in_dim×out_dim,
    a few KB) is built once per task from the rule; each batch stacks
    its vectors and does ONE int64 matmul.  Output long form
    (vec_id, j, y) — the layout the downstream LSH/ANN stages read.
    int64 bound: |q|≤~10³·|x| and in_dim=64 keeps |y| < 10⁶ — far from
    overflow at any realistic embedding scale."""

    def project(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"vec_id": pd.Series(dtype="int64"), "j": pd.Series(dtype="int64"),
                 "y": pd.Series(dtype="int64")}
            )
        q = _quantize(np.stack(df["embedding"].to_numpy()))
        d = q.shape[1]
        i = np.arange(d, dtype=np.int64)[:, None]
        j = np.arange(out_dim, dtype=np.int64)[None, :]
        r = np.where((i * 2654435761 + j * 40503) % 1000 < 500, np.int64(1), np.int64(-1))
        y = q @ r
        vid = df["vec_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "vec_id": np.repeat(vid, out_dim),
                "j": np.tile(np.arange(out_dim, dtype=np.int64), len(vid)),
                "y": y.reshape(-1),
            }
        )

    return ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"]).map_batches(
        project, batch_format="pandas", batch_size=4096
    )


def embedding_label_outliers(emb_path: str, k: int = 5) -> "ray.data.Dataset":
    """Per-label outlier mining — the curation op that surfaces likely
    MISLABELED vectors: for every label, the k members FARTHEST (quantized
    squared euclidean) from the label's rounded integer centroid, ordered
    by (d2 DESC, vec_id ASC).  Output (label, vec_id, d2), k rows/label.

    Integer-exact across engines at any scale: the centroid numerator
    comes from the existing ``label_centroid_sums`` exchange (label×dim
    rows), the rounded centroid is the pure-integer floor((2·S + n) /
    (2·n)) — spelled as floor division in numpy and sign-split in the
    DuckDB oracle (DuckDB // truncates toward zero, numpy floors) — and
    every distance is an int64 sum of squares of quantized residuals.
    Physical shape: one tiny centroid broadcast, per-batch distances +
    per-batch per-label partial top-k, one |labels|-keyed exchange for the
    final top-k merge."""
    sums = label_centroid_sums(emb_path).to_pandas()  # |labels|×dim, tiny
    labels_sorted = np.sort(sums["label"].unique().astype(np.int64))
    dim = int(sums["dim"].max()) + 1
    piv = sums.sort_values(["label", "dim"])
    S = piv["sum_q"].to_numpy(np.int64).reshape(len(labels_sorted), dim)
    n = piv["n"].to_numpy(np.int64).reshape(len(labels_sorted), dim)[:, 0]
    cent = (2 * S + n[:, None]) // (2 * n[:, None])  # numpy floors
    cent_ref = ray.put((labels_sorted, cent))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        lab_keys, cents = ray.get(cent_ref)
        q = _quantize(np.stack(df["embedding"].to_numpy()))
        labels = df["label"].to_numpy().astype(np.int64)
        li = np.searchsorted(lab_keys, labels)
        r = q - cents[li]
        d2 = (r * r).sum(axis=1)
        out = pd.DataFrame(
            {"label": labels, "vec_id": df["vec_id"].astype("int64"), "d2": d2}
        )
        return (
            out.sort_values(["label", "d2", "vec_id"], ascending=[True, False, True])
            .groupby("label", sort=False)
            .head(k)
        )

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["label", "d2", "vec_id"], ascending=[True, False, True])
            .groupby("label", sort=False)
            .head(k)
            .reset_index(drop=True)
        )

    return (
        ray.data.read_parquet(emb_path, columns=["vec_id", "label", "embedding"])
        .map_batches(partial_topk, batch_format="pandas", batch_size=4096)
        .groupby("label")
        .map_groups(final_topk, batch_format="pandas")
    )


def cluster_top_terms(
    sf_dir: str,
    k_terms: int = 5,
    centroid_ids: tuple[int, ...] = DEFAULT_CENTROID_IDS,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """c-TF-IDF cluster labeling (the BERTopic move): for each embedding
    cluster, the words whose within-cluster frequency is most distinctive
    — score = (tf_cw / n_c) · ln(1 + K / df_w), where df_w counts the
    CLUSTERS containing the word (not documents).  Labels clusters of a
    semantic-dedup / mixture pass with human-readable terms.

    Plan (all corpus-scale stages distributed): per-batch quantized
    assignment gives (vec_id, cluster) — the exact integer rule shared
    with embedding_kmeans, so the SQL twin reproduces assignments
    hash-exactly; documents explode to (doc_id, word) under the
    string_split(' ') convention; the two streams meet in ONE id-keyed
    tagged exchange (cluster = −1 marks word rows) where words inherit
    their doc's cluster and pre-count; a second exchange sums to the
    |clusters|·|vocab|-bounded (cluster, word) table, from which
    marginals and the score are driver arithmetic.  Ties break on
    (score DESC, word) in both engines.

    Output (cluster, rank, word, tf, score)."""
    import math

    from hepdata_validator_ray.ops import (
        BUCKET_COL,
        bucketed_aggregate,
        derive_num_buckets_path,
        with_bucket,
    )

    if num_buckets is None:
        num_buckets = derive_num_buckets_path(f"{sf_dir}/documents.parquet")

    cents, cids = _load_rows(f"{sf_dir}/embeddings.parquet", centroid_ids)
    cq = _quantize(cents)

    def assign_rows(df: pd.DataFrame) -> pd.DataFrame:
        q = _quantize(np.stack(df["embedding"].to_numpy()))
        amin, _ = _assign_quantized(q, cq)
        return pd.DataFrame(
            {
                "id": df["vec_id"].to_numpy(dtype=np.int64),
                "cluster": cids[amin].astype(np.int64),
                "word": np.full(len(df), "", dtype=object),
            }
        )

    def word_rows(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"]
        ok = texts.notna()
        words = texts[ok].str.split(" ")
        lens = words.str.len().to_numpy(dtype=np.int64)
        ids = np.repeat(df.loc[ok, "doc_id"].to_numpy(dtype=np.int64), lens)
        import itertools as _it

        flat = np.fromiter(_it.chain.from_iterable(words), dtype=object, count=int(lens.sum()))
        return pd.DataFrame(
            {"id": ids, "cluster": np.full(len(ids), -1, dtype=np.int64), "word": flat}
        )

    def attach_and_count(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        is_asg = df["cluster"].to_numpy() >= 0
        cmap = dict(zip(df.loc[is_asg, "id"], df.loc[is_asg, "cluster"]))
        w = df[~is_asg]
        cl = w["id"].map(cmap)
        ok = cl.notna()
        g = (
            pd.DataFrame({"cluster": cl[ok].astype(np.int64), "word": w.loc[ok, "word"]})
            .groupby(["cluster", "word"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        g["key"] = g["cluster"].astype(str) + "|" + g["word"]
        return g[["key", "cnt"]]

    asg = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(assign_rows, batch_format="pandas", batch_size=4096)
    words = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(word_rows, batch_format="pandas", batch_size=4096)

    joined = (
        asg.union(words)
        .map_batches(lambda t: with_bucket(t, "id", num_buckets), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(attach_and_count, batch_format="pandas")
    )

    def sum_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("key").aggregate([("cnt", "sum")])
        return g.rename_columns(["key", "cnt"])

    tfcw = bucketed_aggregate(joined, "key", None, sum_combine).to_pandas()
    # |clusters| × |vocab| bounded
    if not len(tfcw):
        return pd.DataFrame(
            {
                "cluster": pd.Series(dtype="int64"),
                "rank": pd.Series(dtype="int64"),
                "word": pd.Series(dtype="object"),
                "tf": pd.Series(dtype="int64"),
                "score": pd.Series(dtype="float64"),
            }
        )
    split = tfcw["key"].str.split("|", n=1, expand=True)
    tfcw["cluster"] = split[0].astype(np.int64)
    tfcw["word"] = split[1]
    n_c = tfcw.groupby("cluster")["cnt"].transform("sum").astype("int64")
    df_w = tfcw.groupby("word")["cluster"].transform("nunique").astype("int64")
    nk = int(tfcw["cluster"].nunique())
    tfcw["score"] = (tfcw["cnt"].to_numpy(np.float64) / n_c.to_numpy(np.int64)) * np.log(
        1.0 + nk / df_w.to_numpy(np.int64)
    )
    tfcw = tfcw.sort_values(["cluster", "score", "word"], ascending=[True, False, True], kind="mergesort")
    top = tfcw.groupby("cluster", sort=True).head(k_terms).copy()
    top["rank"] = top.groupby("cluster", sort=False).cumcount() + 1
    return (
        top.rename(columns={"cnt": "tf"})[["cluster", "rank", "word", "tf", "score"]]
        .astype({"cluster": "int64", "rank": "int64", "tf": "int64", "score": "float64"})
        .reset_index(drop=True)
    )


def embedding_silhouette(emb_path: str) -> "ray.data.Dataset":
    """Per-point silhouette of the LABEL clustering under cosine distance
    — the label-quality QC (s near 1: point sits deep in its cluster;
    s < 0: it is closer to another label's cluster = mislabel suspect;
    the mean per label is the classic cluster-health score):

        a(i) = mean_{j∈L(i), j≠i} (1 − cos(i,j)),
        b(i) = min_{M≠L(i)} mean_{j∈M} (1 − cos(i,j)),
        s(i) = (b − a) / max(a, b).

    The O(n²) pair sums collapse to O(n·k): with q = v/‖v‖, the mean
    cosine from i to a label is q_i·S_M/|M| where S_M = Σ_{j∈M} q_j — so
    ONE bounded per-label normalized-sum pass (k×dim driver table,
    broadcast via ray.put) and one streaming scoring pass replace the
    twin's n² join.  Singleton-label points are EXCLUDED (a is undefined;
    mirrored by the twin's inner join), as are corpora with one label.

    Output (vec_id, label, a_val, b_val, silhouette) — per-point rows,
    streaming."""

    def sum_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        q = v / np.linalg.norm(v, axis=1, keepdims=True)
        lab = df["label"].to_numpy(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(uniq), q.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        out = pd.DataFrame({"label": uniq, "cnt": cnt})
        out["sums"] = [row.tobytes() for row in sums]
        return out

    parts = (
        ray.data.read_parquet(emb_path, columns=["embedding", "label"])
        .map_batches(sum_partial, batch_format="pandas", batch_size=4096)
        .to_pandas()
    )  # ≤ |labels| rows per batch — bounded
    if not len(parts):
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": pd.Series(dtype="int64"),
                    "label": pd.Series(dtype="int64"),
                    "a_val": pd.Series(dtype="float64"),
                    "b_val": pd.Series(dtype="float64"),
                    "silhouette": pd.Series(dtype="float64"),
                }
            )
        )
    dim = len(np.frombuffer(parts["sums"].iloc[0], dtype=np.float64))
    labels = np.sort(parts["label"].unique())
    lidx = {int(l): i for i, l in enumerate(labels)}
    S = np.zeros((len(labels), dim), dtype=np.float64)
    C = np.zeros(len(labels), dtype=np.int64)
    for _, r in parts.iterrows():
        i = lidx[int(r["label"])]
        S[i] += np.frombuffer(r["sums"], dtype=np.float64)
        C[i] += int(r["cnt"])
    state = ray.put((labels.astype(np.int64), S, C))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        labs, Sm, Cm = ray.get(state)
        v = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        q = v / np.linalg.norm(v, axis=1, keepdims=True)
        lab = df["label"].to_numpy(np.int64)
        li = np.searchsorted(labs, lab)
        dots = q @ Sm.T  # n × k: Σ_j∈M cos(i, j)
        self_cos = np.einsum("ij,ij->i", q, q)
        own = Cm[li] >= 2
        mean_d = 1.0 - dots / Cm[np.newaxis, :]  # mean dist to each label
        a_val = 1.0 - (dots[np.arange(len(q)), li] - self_cos) / (Cm[li] - np.where(own, 1, 0))
        other = np.ones_like(mean_d, dtype=bool)
        other[np.arange(len(q)), li] = False
        b_val = np.where(other, mean_d, np.inf).min(axis=1)
        keep = own & np.isfinite(b_val)
        if not keep.any():
            return pd.DataFrame(
                {
                    "vec_id": pd.Series(dtype="int64"),
                    "label": pd.Series(dtype="int64"),
                    "a_val": pd.Series(dtype="float64"),
                    "b_val": pd.Series(dtype="float64"),
                    "silhouette": pd.Series(dtype="float64"),
                }
            )
        a, b = a_val[keep], b_val[keep]
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy(np.int64)[keep],
                "label": lab[keep],
                "a_val": a,
                "b_val": b,
                "silhouette": (b - a) / np.maximum(a, b),
            }
        )

    return ray.data.read_parquet(emb_path, columns=["vec_id", "embedding", "label"]).map_batches(
        score, batch_format="pandas", batch_size=4096
    )


def embedding_dim_stats(emb_path: str) -> pd.DataFrame:
    """Per-dimension embedding health panel: mean, population variance,
    min, max for every coordinate — the dead-dimension / variance-
    collapse detector read before ANY geometry op (a dim with var ≈ 0
    wastes index bits; a runaway max flags an unnormalized shard).
    Variance uses the moment identity Σx²/n − (Σx/n)² spelled identically
    in the twin.  One streamed pass of per-batch (Σx, Σx², min, max)
    partials — a dim×4 table per batch, reduced on the driver; the
    corpus never concentrates anywhere.

    Output (dim, n, mean, var_pop, min_v, max_v) — dim is 1-based to
    match the twin's generate_subscripts."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                "dim": np.arange(1, m.shape[1] + 1, dtype=np.int64),
                "n": np.full(m.shape[1], m.shape[0], dtype=np.int64),
                "s": m.sum(axis=0),
                "s2": (m * m).sum(axis=0),
                "mn": m.min(axis=0),
                "mx": m.max(axis=0),
            }
        )

    parts = (
        ray.data.read_parquet(emb_path, columns=["embedding"])
        .map_batches(partial, batch_format="pandas", batch_size=4096)
        .to_pandas()
    )  # dim × n_batches, bounded
    if not len(parts):
        return pd.DataFrame(
            {
                "dim": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
                "mean": pd.Series(dtype="float64"),
                "var_pop": pd.Series(dtype="float64"),
                "min_v": pd.Series(dtype="float64"),
                "max_v": pd.Series(dtype="float64"),
            }
        )
    g = parts.groupby("dim", as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"), min_v=("mn", "min"), max_v=("mx", "max")
    )
    n = g["n"].to_numpy(np.int64).astype(np.float64)
    s = g["s"].to_numpy(np.float64)
    s2 = g["s2"].to_numpy(np.float64)
    g["mean"] = s / n
    g["var_pop"] = s2 / n - (s / n) * (s / n)
    return g[["dim", "n", "mean", "var_pop", "min_v", "max_v"]].astype(
        {"dim": "int64", "n": "int64"}
    )


def embedding_covariance(emb_path: str, batch_size: int = 4096) -> pd.DataFrame:
    """Exact population covariance matrix of the embedding space (upper
    triangle) — the PCA/whitening prerequisite, computed as a batched
    INTEGER GEMM partial reduction: each batch contributes one d×d int64
    Gram matrix QᵀQ of the 1000-quantized vectors plus a column-sum vector,
    so cross-batch reduction is associative-exact (no float summation-order
    divergence anywhere) and the exchanged volume is d²·n_batches, never
    the corpus.  cov_q = S_ij/n − (s_i/n)(s_j/n) in quantized² units, the
    dim-stats moment-identity spelling.

    int64-safety is a CERTIFICATE, not an assumption: numpy's int64 matmul
    wraps silently, so the driver re-checks n·maxq² < 2⁶² from the reduced
    (n, max|q|) partials and raises — the DuckDB twin raises on BIGINT
    overflow at the same bound (re-derive with a smaller QUANT_SCALE or
    hi/lo words beyond it).

    Output (i, j, n, cov_q), 0-based dims, i ≤ j."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = _quantize(np.stack(df["embedding"].to_numpy()))
        d = q.shape[1]
        gram = q.T @ q
        iu, ju = np.triu_indices(d)
        colsum = q.sum(axis=0)
        return pd.DataFrame(
            {
                "i": np.r_[iu, np.arange(d, dtype=np.int64), np.int64(-1)],
                "j": np.r_[ju, np.full(d, -1, dtype=np.int64), np.int64(-1)],
                # the -1/-1 row packs (batch row count, batch max|q|) so the
                # overflow certificate reduces with the same partials
                "s": np.r_[gram[iu, ju], colsum, np.int64(len(df))],
                "m": np.r_[
                    np.zeros(len(iu) + d, dtype=np.int64),
                    np.int64(np.abs(q).max()) if len(df) else np.int64(0),
                ],
            }
        )

    parts = (
        ray.data.read_parquet(emb_path, columns=["embedding"])
        .map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .to_pandas()
    )  # (d²/2 + d + 1) × n_batches, bounded
    empty = pd.DataFrame(
        {
            "i": pd.Series(dtype="int64"),
            "j": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
            "cov_q": pd.Series(dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    g = parts.groupby(["i", "j"], as_index=False).agg(s=("s", "sum"), m=("m", "max"))
    meta = g[(g["i"] == -1) & (g["j"] == -1)]
    n = int(meta["s"].iloc[0])
    maxq = int(meta["m"].iloc[0])
    if n == 0:
        return empty
    if n * maxq * maxq >= (1 << 62):
        raise ValueError(
            f"n·maxq² = {n}·{maxq}² exceeds the int64 Gram bound — "
            "lower QUANT_SCALE or split hi/lo words"
        )
    sums = g[(g["j"] == -1) & (g["i"] >= 0)].set_index("i")["s"]
    pairs = g[g["j"] >= 0].copy()
    nn = float(n)
    si = sums.reindex(pairs["i"]).to_numpy(np.float64)
    sj = sums.reindex(pairs["j"]).to_numpy(np.float64)
    pairs["n"] = np.int64(n)
    pairs["cov_q"] = (pairs["s"].to_numpy(np.float64) / nn) - (si / nn) * (sj / nn)
    return (
        pairs[["i", "j", "n", "cov_q"]]
        .sort_values(["i", "j"])
        .reset_index(drop=True)
        .astype({"i": "int64", "j": "int64", "n": "int64"})
    )
