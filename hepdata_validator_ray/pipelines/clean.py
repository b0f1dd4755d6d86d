"""End-to-end training-data cleaning: the composite pipeline a user of the
reference would actually run at scale.

    read → row-check filter (drop rows failing any check) →
    duplicate removal (strict: any doc_id occurring >1 is dropped) →
    deterministic split assignment → survivor stats / writer

Physical shape: the duplicate-id set comes from the engine's bucketed
exchange (tiny result: only ids with count>1), broadcast via ``ray.put``
into a semi-join filter — the small-side-broadcast pattern, no second
shuffle.  The row filter reuses the exact check kernels, so "clean" is
defined by the same semantics the validator reports on.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from hepdata_validator_ray.checks.base import CheckContext
from hepdata_validator_ray.checks.row_checks import DEFAULT_ACTIVE_CHECKS, prepare_view
from hepdata_validator_ray.engine import duplicate_ids_dataset


def failing_row_mask(batch: pa.Table, ctx: CheckContext) -> np.ndarray:
    """True where the row fails ANY active row-local check."""
    view = prepare_view(batch)
    bad = np.zeros(batch.num_rows, dtype=bool)
    for check in DEFAULT_ACTIVE_CHECKS:
        res = check.fn(view, ctx)
        if len(res.indices):
            bad[res.indices] = True
    return bad


def clean_sequences(
    seq_path: str,
    ctx: CheckContext | None = None,
    output_dir: str | None = None,
    use_bloom: bool = False,
) -> "ray.data.Dataset":
    """Surviving rows: pass every row-local check AND carry a globally
    unique doc_id.  Returns the cleaned Dataset (optionally written as
    partitioned parquet).

    ``use_bloom=True`` broadcasts a Bloom filter of the duplicate ids as a
    prefilter and exact-verifies only the Bloom hits — the pattern for when
    even the duplicate-id set is too large to broadcast exactly (10^12-row
    corpora with high duplication); membership 'no' is exact, so clean rows
    are never dropped by a false positive."""
    ctx = ctx or CheckContext()

    # 1. tiny global artifact: ids occurring more than once (one shuffle,
    #    column-pruned, map-side combined) — broadcast for the semi-join
    dup_ids = duplicate_ids_dataset(seq_path).to_pandas()
    dup_arr = dup_ids["doc_id"].to_numpy(dtype=object) if len(dup_ids) else np.empty(0, dtype=object)
    if use_bloom:
        from hepdata_validator_ray.sketches import BloomFilter

        bloom = BloomFilter(n_bits=1 << 18, k=5)
        bloom.add(dup_arr)
        dup_ref = ray.put((bloom, dup_arr))
    else:
        dup_ref = ray.put(dup_arr)

    def keep(batch: pa.Table) -> pa.Table:
        bad = failing_row_mask(batch, ctx)
        broadcast = ray.get(dup_ref)  # plasma-cached per worker
        col = batch.column("doc_id")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        # to_pylist keeps ids EXACT (arbitrary-precision Python ints):
        # to_numpy on a null-bearing int64 batch yields float64, which
        # quantizes ids above 2^53 and lets duplicates slip the filter
        docs = np.array(arr.to_pylist(), dtype=object)
        if use_bloom:
            bloom, exact = broadcast
            cand = np.flatnonzero(bloom.contains(docs))  # vectorized prefilter
            if len(cand):  # exact-verify ONLY the Bloom hits, vectorized
                bad[cand[np.isin(docs[cand], exact)]] = True
        else:
            dups = broadcast
            if len(dups):
                bad |= np.isin(docs, dups)
        return batch.filter(pa.array(~bad))

    cleaned = ray.data.read_parquet(seq_path).map_batches(keep, batch_format="pyarrow", batch_size=8192)
    if output_dir:
        cleaned.write_parquet(output_dir)
        cleaned = ray.data.read_parquet(output_dir)
    return cleaned


def clean_documents_stats(
    docs_path: str, min_words: int = 5, min_chars: int = 20
) -> "ray.data.Dataset":
    """Composite DOCUMENT cleaning — the end-to-end pipeline a training-data
    user runs over a text corpus: exact-dedup with keep-first survivors +
    quality filters, summarized per language.

    Physical shape: ONE pass over the text computes per-row
    (doc_id, lang, hash, quality metrics) — a materialized intermediate
    ~10× smaller than the corpus (no text) that feeds both sides: the
    bucketed exchange producing (hash, keep_doc_id) for DUPLICATED content
    classes only (a tiny table even at 10^12 docs — only dup classes
    survive the cnt≥2 filter), and the final broadcast filter+count.  The
    corpus is read and hashed exactly once."""
    import pandas as pd

    from hepdata_validator_ray.ops import bucketed_aggregate
    from hepdata_validator_ray.pipelines.dedup import _md5_batch

    def meta_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = _md5_batch(df)
        out["lang"] = df["lang"]
        # fillna(0): null text scores as an empty doc (text.py convention)
        out["n_words"] = df["text"].str.split(" ").str.len().fillna(0).astype("int64")
        out["n_chars"] = df["text"].str.len().fillna(0).astype("int64")
        return out

    meta = (
        ray.data.read_parquet(docs_path, columns=["doc_id", "text", "lang"])
        .map_batches(meta_batch, batch_format="pandas", batch_size=4096)
        .materialize()
    )

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("h").aggregate([("doc_id", "min"), ("doc_id", "count")])
        g = g.rename_columns(["h", "keep_doc_id", "cnt"])
        return g.filter(pa.compute.greater_equal(g["cnt"], 2))

    winners = bucketed_aggregate(meta.select_columns(["doc_id", "h"]), "h", None, combine).to_pandas()
    # a corpus with no exact dups yields an EMPTY dataset whose to_pandas
    # has no columns — the winner table is simply empty then.  Broadcast
    # as (sorted hash keys, parallel int64 winner ids): a dict .map()
    # would materialize the winner column as float64 (NaN for misses),
    # quantizing doc ids above 2^53 so non-winner duplicates compare
    # equal to the winner and wrongly survive.
    if "h" in winners.columns and len(winners):
        order = np.argsort(winners["h"].to_numpy())
        win_h = winners["h"].to_numpy()[order]
        win_id = winners["keep_doc_id"].to_numpy()[order].astype(np.int64)
    else:
        win_h = np.empty(0, dtype=object)
        win_id = np.empty(0, dtype=np.int64)
    win_ref = ray.put((win_h, win_id))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        win_h, win_id = ray.get(win_ref)
        h = df["h"].to_numpy()
        survive_dup = np.ones(len(df), dtype=bool)
        if len(win_h):
            pos = np.searchsorted(win_h, h)
            pos[pos == len(win_h)] = 0
            hit = win_h[pos] == h
            # int64 == int64, exact at any magnitude
            survive_dup[hit] = win_id[pos[hit]] == df["doc_id"].to_numpy()[hit]
        ok = survive_dup & (df["n_words"].to_numpy() >= min_words) & (df["n_chars"].to_numpy() >= min_chars)
        return df[ok]["lang"].value_counts().rename_axis("lang").reset_index(name="n_docs")

    return (
        meta.map_batches(keep, batch_format="pandas", batch_size=8192)
        .groupby("lang")
        .sum("n_docs")
        .map_batches(lambda t: t.rename_columns(["lang", "n_docs"]), batch_format="pyarrow")
    )


def clean_survivor_stats(seq_path: str, ctx: CheckContext | None = None) -> "ray.data.Dataset":
    """Survivor counts by source — the oracle-checkable summary of the full
    cleaning pipeline."""
    from ray.data.aggregate import Count, Sum

    return (
        clean_sequences(seq_path, ctx)
        .groupby("source")
        .aggregate(Count(alias_name="n_rows"), Sum("n_tok", alias_name="sum_n_tok"))
    )
