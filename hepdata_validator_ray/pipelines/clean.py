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
from hepdata_validator_ray.checks.row_checks import DEFAULT_ACTIVE_CHECKS, prepare_view, runnable_checks
from hepdata_validator_ray.engine import duplicate_ids_dataset


def failing_row_mask(batch: pa.Table, ctx: CheckContext) -> np.ndarray:
    """True where the row fails ANY active row-local check.  Checks whose
    columns are absent or wrong-typed are skipped (the column_type check
    still fails every row of a wrong-typed column, so drifted shards are
    cleaned OUT, not crashed on)."""
    view = prepare_view(batch)
    bad = np.zeros(batch.num_rows, dtype=bool)
    for check in runnable_checks(DEFAULT_ACTIVE_CHECKS, batch, view):
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


#: reserved hash key for the verify-exchange sentinel row (not a valid md5)
_SENT_H = "\x00<SENTINEL>"


def clean_documents_stats(
    docs_path: str,
    min_words: int = 5,
    min_chars: int = 20,
    bloom_bits: int = 1 << 22,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Composite DOCUMENT cleaning — the end-to-end pipeline a training-data
    user runs over a text corpus: exact-dedup with keep-first survivors +
    quality filters, summarized per language.

    Physical shape (the winner table NEVER lands on the driver — r3 verdict
    item: dup-class count is corpus-proportional on crawl data):

    1. ONE pass over the text computes per-row (doc_id, lang, hash,
       quality metrics) — a materialized intermediate ~10× smaller than
       the corpus (no text); the corpus is read and hashed exactly once.
    2. A bucketed exchange produces the DISTRIBUTED winner table
       (hash, keep_doc_id) for duplicated content classes only.
    3. A FIXED-SIZE Bloom filter of the dup-class hashes is built from
       per-block partial blooms OR-reduced streaming on the driver —
       driver memory is ``bloom_bits/8`` bytes regardless of how many
       dup classes exist.
    4. The split stage broadcasts only the Bloom: Bloom-miss rows are
       PROVABLY unique (membership 'no' is exact) and collapse to per-batch
       (lang, n) partials on the spot; Bloom-hit rows (true dups + false
       positives) become candidate rows.
    5. Candidates meet the winner table in ONE hash-keyed exchange
       (tagged union, bucket by hash): a candidate survives when its class
       has no winner row (Bloom FP ⇒ unique class) or it IS the winner.
       Exchange volume ≈ dup rows + FP rows, not the corpus.
    """
    import pandas as pd

    from hepdata_validator_ray.ops import BUCKET_COL, bucketed_aggregate, with_bucket
    from hepdata_validator_ray.pipelines.dedup import _md5_batch
    from hepdata_validator_ray.sketches import BloomFilter

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

    # distributed winner table — stays in the object store (materialized:
    # it feeds both the Bloom build and the verify exchange)
    winners = bucketed_aggregate(
        meta.select_columns(["doc_id", "h"]), "h", None, combine, num_buckets=num_buckets
    ).materialize()

    def bloom_partial(t: pa.Table) -> pa.Table:
        b = BloomFilter(bloom_bits, 5)
        b.add(t["h"].to_numpy(zero_copy_only=False))
        return pa.table({"bits": pa.array([b.bits.tobytes()], pa.large_binary())})

    bloom = BloomFilter(bloom_bits, 5)
    for batch in winners.select_columns(["h"]).map_batches(
        bloom_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for bb in batch["bits"]:
            # streaming OR: driver holds two bloom-sized buffers, never the keys
            bloom.bits |= np.frombuffer(bb.as_buffer(), dtype=np.uint8)
    bloom_ref = ray.put(bloom)

    def split(df: pd.DataFrame) -> pd.DataFrame:
        bl = ray.get(bloom_ref)
        q = (df["n_words"].to_numpy() >= min_words) & (df["n_chars"].to_numpy() >= min_chars)
        h = df["h"].to_numpy()
        hit = np.zeros(len(df), dtype=bool)
        qi = np.flatnonzero(q)
        if len(qi):
            hit[qi[bl.contains(h[qi])]] = True
        vc = df.loc[q & ~hit, "lang"].value_counts()
        miss_part = pd.DataFrame(
            {
                "kind": np.int64(0),
                "h": "",
                "doc_id": np.int64(0),
                "lang": vc.index.to_numpy(dtype=object),
                "n": vc.to_numpy(np.int64),
            }
        )
        cand = df.loc[hit]
        cand_part = pd.DataFrame(
            {
                "kind": np.int64(1),
                "h": cand["h"].to_numpy(),
                "doc_id": cand["doc_id"].to_numpy(np.int64),
                "lang": cand["lang"].to_numpy(dtype=object),
                "n": np.int64(1),
            }
        )
        return pd.concat([miss_part, cand_part], ignore_index=True)

    # tagged stream: per-batch miss partials + candidate rows (small —
    # consumed by two downstream filters, so materialize once)
    tagged = meta.map_batches(split, batch_format="pandas", batch_size=8192).materialize()
    misses = tagged.map_batches(
        lambda t: t.filter(pa.compute.equal(t["kind"], 0)).select(["lang", "n"]),
        batch_format="pyarrow",
    )
    cands = tagged.map_batches(
        lambda t: t.filter(pa.compute.equal(t["kind"], 1)), batch_format="pyarrow"
    )

    def wtag(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "kind": pa.array(np.full(n, 2, dtype=np.int64)),
                "h": t["h"],
                "doc_id": t["keep_doc_id"].cast(pa.int64()),
                "lang": pa.nulls(n, pa.string()),
                "n": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    sentinel = ray.data.from_arrow(
        pa.table(
            {
                "kind": pa.array([2], pa.int64()),
                "h": pa.array([_SENT_H], pa.string()),
                "doc_id": pa.array([-1], pa.int64()),
                "lang": pa.array([None], pa.string()),
                "n": pa.array([0], pa.int64()),
            }
        )
    )

    _empty_out = pa.table({"lang": pa.array([], pa.string()), "n": pa.array([], pa.int64())})

    def resolve(df: pd.DataFrame) -> pa.Table:
        # Arrow output: the downstream union with the Arrow miss partials
        # must be homogeneous (mixed block types break the sort sampler)
        df = df[df["h"] != _SENT_H]
        c = df[df["kind"] == 1]
        if not len(c):
            return _empty_out
        w = df[df["kind"] == 2].sort_values("h")
        wh = w["h"].to_numpy()
        wid = w["doc_id"].to_numpy(np.int64)
        survive = np.ones(len(c), dtype=bool)
        if len(wh):
            ch = c["h"].to_numpy()
            pos = np.searchsorted(wh, ch)
            pos[pos == len(wh)] = 0
            in_w = wh[pos] == ch
            # int64 == int64, exact at any magnitude; a class with no
            # winner row is a Bloom false positive ⇒ unique ⇒ survives
            survive[in_w] = wid[pos[in_w]] == c["doc_id"].to_numpy(np.int64)[in_w]
        vc = c.loc[survive, "lang"].value_counts()
        return pa.table(
            {
                "lang": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "n": pa.array(vc.to_numpy(np.int64), pa.int64()),
            }
        )

    verified = (
        cands.union(winners.map_batches(wtag, batch_format="pyarrow")).union(sentinel)
        .map_batches(lambda t: with_bucket(t, "h", num_buckets), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(
            lambda df: resolve(df.drop(columns=[BUCKET_COL])), batch_format="pandas"
        )
    )

    from ray.data.aggregate import Sum

    return (
        misses.union(verified)
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n_docs"))
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
