"""Deterministic sampling / splitting operators (training-data staples).

Unlike ``ds.random_sample`` (seed-dependent on partitioning), these use a
content-derived hash of the key, so the assignment is reproducible across
runs, cluster sizes and file layouts — the property a 10^12-row train/test
split must have.

Two key functions behind one API (mirroring dedup's md5/siphash pair):

- ``key_fn="md5"`` (default): per-row md5 prefix, chosen for cross-engine
  parity — DuckDB's ``('0x' || substr(md5(k),1,8))::UBIGINT`` computes the
  identical bucket, giving these operators exact SQL oracles.
- ``key_fn="siphash"``: the vectorized production path — one C-siphash pass
  over the whole key column (``pd.util.hash_array``), no per-row Python
  (VERDICT r2 #8).  Same determinism/uniformity class, different (equally
  stable) assignment.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_SPLIT_KEY = "hvr-split-key-01"  # 16-byte siphash key for the production path


def _bucket_md5(values: np.ndarray, mod: int) -> np.ndarray:
    return np.fromiter(
        (int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % mod for v in values),
        dtype=np.int64,
        count=len(values),
    )


def _bucket_siphash(values: np.ndarray, mod: int) -> np.ndarray:
    if values.dtype.kind in ("i", "u"):
        h = pd.util.hash_array(values)
    else:
        h = pd.util.hash_array(np.asarray(values, dtype=object), hash_key=_SPLIT_KEY, categorize=False)
    return (h % np.uint64(mod)).astype(np.int64)


def _bucket_of(values: np.ndarray, mod: int = 100, key_fn: str = "md5") -> np.ndarray:
    values = np.asarray(values)
    if key_fn == "md5":
        return _bucket_md5(values, mod)
    if key_fn == "siphash":
        return _bucket_siphash(values, mod)
    raise ValueError(f"unknown key_fn {key_fn!r} (expected 'md5' or 'siphash')")


def split_assignment(
    docs_path: str, key: str = "doc_id", test_pct: int = 10, key_fn: str = "md5"
) -> "ray.data.Dataset":
    """Per-split row counts for a deterministic train/test split."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        buckets = _bucket_of(df[key].to_numpy(), key_fn=key_fn)
        split = pd.Series(np.where(buckets < test_pct, "test", "train"))
        out = split.value_counts().rename_axis("split").reset_index(name="n")
        return out

    return (
        ray.data.read_parquet(docs_path, columns=[key])
        .map_batches(partial, batch_format="pandas", batch_size=8192)
        .groupby("split")
        .sum("n")
        .map_batches(lambda t: t.rename_columns(["split", "n"]), batch_format="pyarrow")
    )


def stratified_sample_counts(
    docs_path: str,
    key: str = "doc_id",
    strata_col: str = "source",
    rates: dict[str, int] | None = None,
    default_pct: int = 5,
    key_fn: str = "md5",
) -> "ray.data.Dataset":
    """Deterministic per-stratum sampling (e.g. downsample web-crawl, keep
    all curated sources): each stratum gets its own hash-bucket rate.
    Returns per-stratum kept counts — the rebalancing primitive of a
    training-data mix.  No shuffle beyond the tiny count aggregate."""
    rates = rates or {}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        buckets = _bucket_of(df[key].to_numpy(), key_fn=key_fn)
        pct = df[strata_col].map(rates).fillna(default_pct).to_numpy(dtype=np.int64)
        kept = df[buckets < pct]
        out = kept[strata_col].value_counts().rename_axis(strata_col).reset_index(name="n")
        return out

    return (
        ray.data.read_parquet(docs_path, columns=[key, strata_col])
        .map_batches(partial, batch_format="pandas", batch_size=8192)
        .groupby(strata_col)
        .sum("n")
        .map_batches(lambda t: t.rename_columns([strata_col, "n"]), batch_format="pyarrow")
    )


def deterministic_sample(
    docs_path: str, key: str = "doc_id", pct: int = 5, key_fn: str = "md5"
) -> "ray.data.Dataset":
    """The exact sampled row set (hash bucket < pct) — reproducible sampling
    as a filter, no shuffle."""

    def fil(df: pd.DataFrame) -> pd.DataFrame:
        buckets = _bucket_of(df[key].to_numpy(), key_fn=key_fn)
        return df[buckets < pct][[key]]

    return ray.data.read_parquet(docs_path, columns=[key]).map_batches(
        fil, batch_format="pandas", batch_size=8192
    )


def sampling_assignment(
    docs_path: str,
    key: str = "doc_id",
    test_pct: int = 10,
    sample_pct: int = 5,
    key_fn: str = "md5",
    mixture_x100: dict[str, int] | None = None,
    exact_k: int | None = None,
    exact_k_group: int | None = None,
    leakage: bool = False,
) -> "ray.data.Dataset":
    """Split counts AND the exact deterministic-sample id set AND (when
    ``mixture_x100`` is given) the epoch-weighted mixture plan as ONE
    union — (kind, key, n): ('split', 'train'/'test', count) rows,
    ('sample', <doc_id>, 1) rows, ('mix', <source>, n_rows_out) +
    ('mixdocs', <source>, n_docs) rows (slot-saving fusion; every leg
    stays independently queryable).  ``leakage=True`` adds the
    cross-split content-contamination audit: ('leak', <split>,
    n_leaky_docs) + ('leakdocs', <split>, n_docs) rows from
    ``split_leakage_stats``."""

    def split_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"kind": "split", "key": df["split"].astype(str), "n": df["n"].astype("int64")}
        )

    def sample_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"kind": "sample", "key": df[key].astype(str), "n": np.ones(len(df), dtype=np.int64)}
        )

    def mix_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [
                pd.DataFrame(
                    {"kind": "mix", "key": df["source"].astype(str), "n": df["n_rows_out"].astype("int64")}
                ),
                pd.DataFrame(
                    {"kind": "mixdocs", "key": df["source"].astype(str), "n": df["n_docs"].astype("int64")}
                ),
            ],
            ignore_index=True,
        )

    out = split_assignment(docs_path, key=key, test_pct=test_pct, key_fn=key_fn).map_batches(
        split_rows, batch_format="pandas"
    ).union(
        deterministic_sample(docs_path, key=key, pct=sample_pct, key_fn=key_fn).map_batches(
            sample_rows, batch_format="pandas"
        )
    )
    if mixture_x100 is not None:
        out = out.union(
            mixture_resample_counts(docs_path, mixture_x100, key=key, key_fn=key_fn).map_batches(
                mix_rows, batch_format="pandas"
            )
        )
    if exact_k is not None:
        ek = exact_k_sample(docs_path, k=exact_k, key=key, key_fn=key_fn)
        out = out.union(
            ray.data.from_pandas(
                pd.DataFrame(
                    {"kind": "ek", "key": ek[key].astype(str), "n": ek["rank"].astype("int64")}
                )
            )
        )
    if exact_k_group is not None:
        out = out.union(
            exact_k_per_group(docs_path, k=exact_k_group, key=key, key_fn=key_fn).map_batches(
                lambda df: pd.DataFrame(
                    {
                        "kind": "ekg",
                        "key": df["source"].astype(str) + "|" + df[key].astype(str),
                        "n": df["rank"].astype("int64"),
                    }
                ),
                batch_format="pandas",
            )
        )
    if leakage:
        def leak_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.concat(
                [
                    pd.DataFrame(
                        {"kind": "leak", "key": df["split"].astype(str), "n": df["n_leaky_docs"].astype("int64")}
                    ),
                    pd.DataFrame(
                        {"kind": "leakdocs", "key": df["split"].astype(str), "n": df["n_docs"].astype("int64")}
                    ),
                ],
                ignore_index=True,
            )

        out = out.union(
            split_leakage_stats(docs_path, test_pct=test_pct).map_batches(
                leak_rows, batch_format="pandas"
            )
        )
    return out


# ---------------------------------------------------------------------------
# Deterministic global shuffle (materialized training order)
# ---------------------------------------------------------------------------

def _hash64(values: np.ndarray, key_fn: str = "md5") -> np.ndarray:
    """Full-width 64-bit content hash of the key column (uint64).  md5 is
    the DuckDB-parity path (`('0x' || substr(md5(k),1,16))::UBIGINT`);
    siphash is the vectorized production path."""
    values = np.asarray(values)
    if key_fn == "md5":
        return np.fromiter(
            (int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16) for v in values),
            dtype=np.uint64,
            count=len(values),
        )
    if key_fn == "siphash":
        if values.dtype.kind in ("i", "u"):
            return pd.util.hash_array(values)
        return pd.util.hash_array(
            np.asarray(values, dtype=object), hash_key=_SPLIT_KEY, categorize=False
        )
    raise ValueError(f"unknown key_fn {key_fn!r} (expected 'md5' or 'siphash')")


def deterministic_shuffle_ranks(
    docs_path: str,
    key: str = "doc_id",
    key_fn: str = "md5",
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Layout-independent global shuffle order: every row gets its exact
    position (0..N-1) in the ordering by (hash64(key), key) — the training
    order is then a pure function of content, identical across runs,
    cluster sizes and file layouts (unlike ``ds.random_shuffle``, whose
    permutation depends on block structure).

    Distributed rank without a global sort of the payload: the top bits of
    the hash form an order-preserving range bucket, so (1) a tiny
    per-bucket count aggregate + driver prefix sum gives each bucket's
    global offset, and (2) one exchange keyed on the bucket sorts only
    in-bucket — ranks are offset + local position.  Payload never moves
    twice; the same two-pass shape as ``sequence_packing``'s prefix sum."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets

    ds = ray.data.read_parquet(docs_path, columns=[key])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        ds, target_rows_per_bucket=500_000, lo=8
    )
    bits = max(1, (nb - 1).bit_length())  # power-of-two buckets
    nb = 1 << bits
    shift = np.uint64(64 - bits)

    def hashed(df: pd.DataFrame) -> pd.DataFrame:
        h = _hash64(df[key].to_numpy(), key_fn=key_fn)
        return pd.DataFrame(
            {key: df[key].to_numpy(), "h": h, BUCKET_COL: (h >> shift).astype(np.int64)}
        )

    # materialized: hds feeds BOTH the counts aggregate and the rank
    # exchange — without this the whole read+hash pass (the dominant cost
    # on the md5 parity path) would execute twice.  The materialized set
    # is 3 narrow columns (key, h, bucket), a bounded fraction of input.
    hds = (
        ray.data.read_parquet(docs_path, columns=[key])
        .map_batches(hashed, batch_format="pandas", batch_size=8192)
        .materialize()
    )

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        c = df[BUCKET_COL].value_counts()
        return pd.DataFrame({BUCKET_COL: c.index.to_numpy(), "n": c.to_numpy()})

    counts = (
        hds.map_batches(partial_counts, batch_format="pandas")
        .groupby(BUCKET_COL)
        .sum("n")
        .to_pandas()
    )  # nb rows — tiny by construction
    offs = np.zeros(nb + 1, dtype=np.int64)
    offs[counts[BUCKET_COL].to_numpy() + 1] = counts["sum(n)"].to_numpy()
    np.cumsum(offs, out=offs)
    offs_ref = ray.put(offs[:nb])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(offs_ref)[int(df[BUCKET_COL].iloc[0])]
        df = df.sort_values(["h", key], kind="mergesort")
        return pd.DataFrame(
            {
                key: df[key].to_numpy(),
                "shuffle_rank": base + np.arange(len(df), dtype=np.int64),
            }
        )

    return hds.groupby(BUCKET_COL).map_groups(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# Domain mixture resampling (epoch-weighted up/downsampling)
# ---------------------------------------------------------------------------

def _mixture_copies(
    df: pd.DataFrame, weights_x100: dict[str, int], default_x100: int, key: str, strata_col: str, key_fn: str
) -> np.ndarray:
    """Per-row deterministic copy count for an epoch weight given in
    hundredths (150 = 1.5 epochs): floor(w) whole copies plus one more iff
    the row's hash bucket (mod 100) falls under the fractional part.  A
    weight of 0 drops the stratum; integers stay integer-exact (no float
    rate anywhere)."""
    w = df[strata_col].fillna("<NULL>").map(weights_x100).fillna(default_x100).to_numpy(dtype=np.int64)
    buckets = _bucket_of(df[key].to_numpy(), mod=100, key_fn=key_fn)
    return w // 100 + (buckets < w % 100)


def mixture_resample_counts(
    docs_path: str,
    weights_x100: dict[str, int] | None = None,
    default_x100: int = 100,
    key: str = "doc_id",
    strata_col: str = "source",
    key_fn: str = "md5",
) -> "ray.data.Dataset":
    """Training-mix rebalancing plan: per source, input doc count and the
    resampled output row count under per-source epoch weights — the
    Pile/LLaMA-style domain-mixture primitive (web 0.5 epochs, books 2.5
    epochs, ...).  Upsampling emits whole-corpus copies plus a
    deterministic hash-selected fractional slice, so the exact output
    multiset is reproducible across runs, partitionings and cluster sizes
    (the property a restartable 100 TB mix job needs).  Map-side partials
    collapse each batch to |sources| rows; the exchange is source-sized."""
    weights_x100 = weights_x100 or {}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        copies = _mixture_copies(df, weights_x100, default_x100, key, strata_col, key_fn)
        g = pd.DataFrame(
            {strata_col: df[strata_col].fillna("<NULL>"), "n_docs": 1, "n_rows_out": copies}
        )
        return g.groupby(strata_col, as_index=False).sum()

    from ray.data.aggregate import Sum

    return (
        ray.data.read_parquet(docs_path, columns=[key, strata_col])
        .map_batches(partial, batch_format="pandas", batch_size=8192)
        .groupby(strata_col)
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_rows_out", alias_name="n_rows_out"))
    )


def mixture_expand(
    docs_path: str,
    weights_x100: dict[str, int] | None = None,
    default_x100: int = 100,
    key: str = "doc_id",
    strata_col: str = "source",
    key_fn: str = "md5",
) -> "ray.data.Dataset":
    """The materialized mixture: (doc_id, copy_idx) with copy_idx in
    [0, n_copies) — the row set a downstream trainer streams.  Pure
    map-side np.repeat + segmented arange per batch (no shuffle, no
    driver state); output size is exactly the weighted sum, so at scale
    the op is bandwidth-bound on its own output, never on coordination."""
    weights_x100 = weights_x100 or {}

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        copies = _mixture_copies(df, weights_x100, default_x100, key, strata_col, key_fn)
        ids = np.repeat(df[key].to_numpy(), copies)
        ends = np.cumsum(copies)
        copy_idx = np.arange(ends[-1] if len(ends) else 0, dtype=np.int64) - np.repeat(
            ends - copies, copies
        )
        return pd.DataFrame({key: ids, "copy_idx": copy_idx})

    return ray.data.read_parquet(docs_path, columns=[key, strata_col]).map_batches(
        expand, batch_format="pandas", batch_size=8192
    )


# ---------------------------------------------------------------------------
# Exact-k deterministic sampling (reservoir-sample analogue)
# ---------------------------------------------------------------------------

def exact_k_sample(docs_path: str, k: int = 50, key: str = "doc_id", key_fn: str = "md5") -> pd.DataFrame:
    """Uniform sample of EXACTLY k rows, deterministically: the k smallest
    (hash64(key), key) pairs — the reproducible replacement for reservoir
    sampling (whose result depends on stream order).  Each batch emits a
    partial top-k; the driver merges n_batches × k candidate rows (the ANN
    partial-top-k discipline — the corpus itself never leaves the
    workers).  Output (rank, key) with rank 1..k in (hash, key) order."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _hash64(df[key].to_numpy(), key_fn=key_fn)
        out = pd.DataFrame({key: df[key].to_numpy(), "h": h})
        return out.sort_values(["h", key], kind="mergesort").head(k)

    cand = (
        ray.data.read_parquet(docs_path, columns=[key])
        .map_batches(partial, batch_format="pandas", batch_size=8192)
        .to_pandas()
    )
    top = cand.sort_values(["h", key], kind="mergesort").head(k).reset_index(drop=True)
    return pd.DataFrame(
        {"rank": np.arange(1, len(top) + 1, dtype=np.int64), key: top[key].to_numpy()}
    )


def exact_k_per_group(
    docs_path: str,
    k: int = 5,
    key: str = "doc_id",
    strata_col: str = "source",
    key_fn: str = "md5",
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Stratified exact-k: per stratum, the k smallest (hash64(key), key)
    rows — balanced eval-set construction at any corpus size.  One
    strata-keyed hash-bucket exchange (the grouped-top-k shape); inside a
    bucket one sort + groupby-head covers all the bucket's groups."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if not len(df):
            return pd.DataFrame(
                {
                    strata_col: pd.Series(dtype="object"),
                    "rank": pd.Series(dtype="int64"),
                    key: pd.Series(dtype="int64"),
                }
            )
        df = pd.DataFrame(
            {
                strata_col: df[strata_col].fillna("<NULL>"),
                key: df[key].to_numpy(),
                "h": _hash64(df[key].to_numpy(), key_fn=key_fn),
            }
        ).sort_values([strata_col, "h", key], kind="mergesort")
        out = df.groupby(strata_col, sort=False).head(k).copy()
        out["rank"] = out.groupby(strata_col, sort=False).cumcount() + 1
        return out[[strata_col, "rank", key]]

    ds = ray.data.read_parquet(docs_path, columns=[key, strata_col])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=2_000_000, lo=8)
    return (
        ds.map_batches(lambda t: with_bucket(t, strata_col, nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(topk, batch_format="pandas")
    )


def split_leakage_stats(
    docs_path: str, test_pct: int = 10, num_buckets: int = 64
) -> "ray.data.Dataset":
    """Train/test contamination audit over the SPLIT boundary: a doc is
    LEAKY when its exact content class (md5(text), nulls as '<NULL>')
    spans more than one split under the standard hash split rule.  Output
    (split, n_docs, n_leaky_docs) — the per-split leak report a training
    pipeline checks before shipping a split.

    One content-keyed bucketed exchange: per-batch (h, split, n) partials
    collapse map-side; each bucket sees every partial of its classes, so
    n_splits-per-class and per-split doc counts are in-bucket groupbys;
    the final exchange is |splits|-sized.  Nothing corpus-scale touches
    the driver."""
    from hepdata_validator_ray.ops import bucketed_aggregate
    from hepdata_validator_ray.pipelines.dedup import _md5_batch

    def partial(t: "pa.Table") -> "pa.Table":
        df = t.to_pandas()
        out = _md5_batch(df)
        out["split"] = np.where(
            _bucket_of(df["doc_id"].to_numpy(), 100) < test_pct, "test", "train"
        )
        g = out.groupby(["h", "split"], as_index=False).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    def combine(t: "pa.Table") -> "pa.Table":
        df = t.to_pandas().groupby(["h", "split"], as_index=False)["n"].sum()
        leaky = (df.groupby("h")["split"].transform("nunique") > 1).to_numpy()
        g = (
            df.assign(ln=np.where(leaky, df["n"], 0))
            .groupby("split", as_index=False)
            .agg(n_docs=("n", "sum"), n_leaky_docs=("ln", "sum"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        bucketed_aggregate(
            ray.data.read_parquet(docs_path, columns=["doc_id", "text"]),
            "h",
            partial,
            combine,
            num_buckets=num_buckets,
        )
        .groupby("split")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_leaky_docs", alias_name="n_leaky_docs"),
        )
    )


def proportional_allocation(seq_path: str, k_total: int = 100) -> "ray.data.Dataset":
    """Stratified-sample SIZING by the largest-remainder method (Hamilton
    apportionment): allocate ``k_total`` eval slots across sources
    proportionally to row counts — alloc = ⌊K·n_s/N⌋ plus one top-up for
    the R = K − Σ⌊·⌋ largest remainders ((K·n_s) mod N DESC, source ASC
    tie-break).  Output (source, n_src, alloc); Σ alloc == k_total exactly,
    every step integer-exact.

    One |sources|-bounded count exchange; the apportionment is driver
    arithmetic on that tiny table."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count

    tot = (
        ray.data.read_parquet(seq_path, columns=["source"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [pc.coalesce(t["source"], pa.scalar("<NULL>", pa.string()))],
                names=["source"],
            ),
            batch_format="pyarrow",
        )
        .groupby("source")
        .aggregate(Count(alias_name="n"))
        .to_pandas()  # |sources|-bounded
        .sort_values("source")
        .reset_index(drop=True)
    )
    if not len(tot):
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "source": pd.Series(dtype="object"),
                    "n_src": pd.Series(dtype="int64"),
                    "alloc": pd.Series(dtype="int64"),
                }
            )
        )
    n = tot["n"].to_numpy(np.int64)
    total = int(n.sum())
    fl = (k_total * n) // total
    rem = (k_total * n) % total
    r = int(k_total - fl.sum())
    # top-up the R largest remainders; ties break on source ASC (tot is
    # already source-sorted, and argsort is stable over -rem)
    order = np.argsort(-rem, kind="stable")
    alloc = fl.copy()
    alloc[order[:r]] += 1
    return ray.data.from_pandas(
        pd.DataFrame(
            {"source": tot["source"], "n_src": n, "alloc": alloc.astype(np.int64)}
        )
    )


def shuffle_adjacency_audit(
    docs_path: str, key: str = "doc_id", key_fn: str = "md5", num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Shuffle-QUALITY audit: in the deterministic global shuffle order
    (hash64(key), key, source — the training order), how many consecutive
    pairs share a source?  Excess same-source adjacency means the shuffle
    isn't mixing (bad for SGD); output (source, n_adj) counts pairs whose
    BOTH members belong to that source, zero rows included.

    No global sort: the hash's top bits form order-preserving range
    buckets (every h in bucket k < every h in bucket k+1), so adjacency is
    in-bucket-local except at bucket seams; each bucket reports its
    per-source counts plus its first/last source, and the driver stitches
    the ≤ nb seams in bucket order.  The full tie-break (h, key, source)
    makes the order — and therefore the counts — engine-independent even
    for duplicate keys with differing sources."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets

    ds = ray.data.read_parquet(docs_path, columns=[key, "source"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        ds, target_rows_per_bucket=500_000, lo=8
    )
    bits = max(1, (nb - 1).bit_length())
    nb = 1 << bits
    shift = np.uint64(64 - bits)

    def hashed(df: pd.DataFrame) -> pd.DataFrame:
        h = _hash64(df[key].to_numpy(), key_fn=key_fn)
        return pd.DataFrame(
            {
                key: df[key].to_numpy(),
                "source": df["source"].fillna("<NULL>"),
                "h": h,
                BUCKET_COL: (h >> shift).astype(np.int64),
            }
        )

    def in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df[BUCKET_COL].iloc[0])
        df = df.sort_values(["h", key, "source"], kind="mergesort")
        src = df["source"].to_numpy(dtype=object)
        same = src[1:] == src[:-1]
        u, c = (
            np.unique(src[:-1][same], return_counts=True)
            if same.any()
            else (np.empty(0, dtype=object), np.empty(0, dtype=np.int64))
        )
        out = pd.DataFrame(
            {"kind": "adj", "source": u, "n": c.astype(np.int64), "bucket": b}
        )
        edge = pd.DataFrame(
            {
                "kind": ["first", "last"],
                "source": [src[0], src[-1]],
                "n": [0, 0],
                "bucket": [b, b],
            }
        )
        seen_src = np.unique(src)  # the bucket's source universe (zero rows)
        seen = pd.DataFrame(
            {"kind": "seen", "source": seen_src, "n": 0, "bucket": b}
        )
        return pd.concat([out, edge, seen], ignore_index=True)

    parts = (
        ray.data.read_parquet(docs_path, columns=[key, "source"])
        .map_batches(hashed, batch_format="pandas", batch_size=8192)
        .groupby(BUCKET_COL)
        .map_groups(in_bucket, batch_format="pandas")
        .to_pandas()  # <= nb x (|sources| + 2) rows — bounded
    )
    adj = (
        parts[parts["kind"] == "adj"].groupby("source")["n"].sum().astype(np.int64)
        if len(parts)
        else pd.Series(dtype=np.int64)
    )
    counts = dict(adj)
    # stitch seams between consecutive NON-EMPTY buckets in bucket order
    firsts = parts[parts["kind"] == "first"].set_index("bucket")["source"].sort_index()
    lasts = parts[parts["kind"] == "last"].set_index("bucket")["source"].sort_index()
    order = sorted(firsts.index)
    for b1, b2 in zip(order, order[1:]):
        if lasts[b1] == firsts[b2]:
            counts[lasts[b1]] = counts.get(lasts[b1], 0) + 1
    # zero rows for every source present in the corpus
    all_src = sorted(set(parts["source"])) if len(parts) else []
    out = pd.DataFrame(
        {"source": all_src, "n_adj": [int(counts.get(s, 0)) for s in all_src]}
    )
    return ray.data.from_pandas(
        out.astype({"n_adj": "int64"})
        if len(out)
        else pd.DataFrame({"source": pd.Series(dtype="object"), "n_adj": pd.Series(dtype="int64")})
    )


def shard_skew_forecast(
    seq_path: str,
    n_shards: int = 16,
    n_salts: int = 8,
    key: str = "source",
    row_key: str = "doc_id",
    weight: str = "n_tok",
    key_fn: str = "md5",
) -> "ray.data.Dataset":
    """Pre-shuffle SKEW FORECAST: the per-shard (row, token) load a planned
    ``n_shards``-way hash exchange keyed on ``key`` would see — PLAIN
    (shard = hash(key) % K, every row of a hot key lands on one shard)
    versus SALTED (shard = hash(key ∥ '#' ∥ hash(row_key) % S) % K, a hot
    key fans out over ≤ S shards).  This is the audit a 100-TB groupby
    needs BEFORE it runs: the north rule's "skew handled explicitly" as a
    measured verdict, not a hope — if the plain max-shard load is ≫ the
    salted one, the exchange must salt (and re-reduce) or it stalls on one
    aggregator.

    Both schemes are computed in ONE pass: the key vocabulary is small
    (that is what MAKES it skewed), so per batch only the distinct
    (key[, salt]) strings are hashed — the md5 cost is |keys|·S per batch,
    not per row; the per-row cost is one salt bucket of ``row_key`` plus a
    packed-int collapse.  The exchange carries ≤ 2·K integer partials per
    batch.  ``key_fn="md5"`` is the DuckDB-parity gate path; "siphash" is
    the vectorized production path (same class, different assignment).

    Output (scheme ∈ {plain, salted}, shard, n_rows, n_tok_sum)."""
    from ray.data.aggregate import Sum

    if n_shards < 1 or n_salts < 1:
        raise ValueError("n_shards and n_salts must be >= 1")

    def partial(t: pa.Table) -> pd.DataFrame:
        src = t.column(key).to_pandas().fillna("<NULL>").astype(str)
        did = t.column(row_key).to_pandas().fillna("<NULL>").astype(str)
        # the read always projects the weight column; a missing column
        # fails at the scan, not here
        nt = t.column(weight).to_pandas().fillna(0).to_numpy(dtype=np.int64)
        n = len(src)
        if n == 0:
            return pd.DataFrame(
                {
                    "gk": pd.Series(dtype="int64"),
                    "n_rows": pd.Series(dtype="int64"),
                    "n_tok_sum": pd.Series(dtype="int64"),
                }
            )
        # plain: hash only the DISTINCT keys
        codes, uniq = pd.factorize(src)
        plain_shard = _bucket_of(np.asarray(uniq, dtype=object), n_shards, key_fn)[codes]
        # salted: per-row salt bucket of row_key, then hash the distinct
        # (key, salt) pairs only
        salt = _bucket_of(did.to_numpy(dtype=object), n_salts, key_fn)
        pair = (src + "#" + pd.Series(salt, index=src.index).astype(str)).to_numpy(dtype=object)
        pcodes, puniq = pd.factorize(pair)
        salted_shard = _bucket_of(np.asarray(puniq, dtype=object), n_shards, key_fn)[pcodes]
        gk = np.concatenate([plain_shard, salted_shard + n_shards]).astype(np.int64)
        w = np.concatenate([nt, nt])
        order = np.argsort(gk, kind="stable")
        gs = gk[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        return pd.DataFrame(
            {
                "gk": gs[starts],
                "n_rows": np.diff(np.r_[starts, gs.size]).astype(np.int64),
                "n_tok_sum": np.add.reduceat(w[order], starts),
            }
        )

    agg = (
        ray.data.read_parquet(seq_path, columns=[row_key, key, weight])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("gk")
        .aggregate(Sum("n_rows", alias_name="n_rows"), Sum("n_tok_sum", alias_name="n_tok_sum"))
    )

    def finale(t: pa.Table) -> pa.Table:
        gk = t["gk"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "scheme": pa.array(
                    np.where(gk < n_shards, "plain", "salted"), pa.string()
                ),
                "shard": pa.array(gk % n_shards, pa.int64()),
                "n_rows": t["n_rows"].cast(pa.int64()),
                "n_tok_sum": t["n_tok_sum"].cast(pa.int64()),
            }
        )

    return agg.map_batches(finale, batch_format="pyarrow")


def weighted_priority_sample(
    docs_path: str,
    k: int = 50,
    key: str = "doc_id",
    weight: str = "n_chars",
    key_fn: str = "md5",
) -> pd.DataFrame:
    """Deterministic weighted sample WITHOUT replacement via priority
    sampling (Efraimidis–Spirakis A-ES): every row gets the priority
    ``ln(u) / w`` with u a content-derived uniform in (0, 1], and the
    global top-k priorities ARE a weight-proportional sample — the
    one-pass distributed algorithm for "sample 50 docs proportional to
    length" that needs no global shuffle, no rejection loop and no state.

    Determinism/parity: u = (hash64(key) | 1) / 2^64 — the bit-or avoids
    both u = 0 (ln −inf) and the +1 overflow a 2^64−1 hash would hit; the
    md5 path is DuckDB-recomputable so the SQL twin orders by the SAME
    double expression (the TfIdf ln-parity convention; selection could
    flip only if two priorities collide within one ulp AT the k boundary —
    distinct md5s keep them ~1e-5 apart).  Rows with NULL key / NULL or
    non-positive weight are excluded on both engines (a weight ≤ 0 has no
    sampling mass).

    Physical shape: per-batch vectorized partial top-k (argpartition), the
    driver merges n_batches × k candidate rows — the ANN partial-top-k
    pattern; the corpus is read column-pruned once.  Output
    (doc_id, w, pri) sorted by (pri DESC, doc_id), exactly k rows (fewer
    when the table is smaller)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = pd.to_numeric(df[weight], errors="raise")
        ok = df[key].notna() & w.notna() & (w > 0)
        df = df.loc[ok]
        if not len(df):
            return pd.DataFrame(
                {key: pd.Series(dtype="int64"), "w": pd.Series(dtype="int64"), "pri": pd.Series(dtype="float64")}
            )
        wv = w.loc[ok].to_numpy(np.int64)
        h = _hash64(df[key].to_numpy(), key_fn=key_fn) | np.uint64(1)
        u = h.astype(np.float64) / 2.0**64
        pri = np.log(u) / wv
        if len(pri) > k:
            idx = np.argpartition(-pri, k - 1)[:k]
        else:
            idx = np.arange(len(pri))
        return pd.DataFrame(
            {
                key: df[key].to_numpy()[idx],
                "w": wv[idx],
                "pri": pri[idx],
            }
        )

    cand = (
        ray.data.read_parquet(docs_path, columns=[key, weight])
        .map_batches(partial, batch_format="pandas", batch_size=8192)
        .to_pandas()  # n_batches × k, bounded
    )
    cand = cand.sort_values(["pri", key], ascending=[False, True], kind="mergesort").head(k)
    return cand.reset_index(drop=True)


def weighted_priority_sample_by_group(
    docs_path: str,
    k: int = 10,
    group: str = "source",
    key: str = "doc_id",
    weight: str = "n_chars",
    key_fn: str = "md5",
) -> pd.DataFrame:
    """Per-GROUP weighted sample without replacement: the A-ES priority
    (`weighted_priority_sample` conventions — same u, same ln(u)/w, same
    exclusions) ranked WITHIN each group, top-k per group — the stratified
    curation draw ("50 docs per source, proportional to length") that a
    mixture builder runs per stratum.

    Per batch: vectorized priorities, then a per-(batch, group) top-k via
    one lexsort + run-length cut (no per-group Python loop); the driver
    merges ≤ n_batches · |groups| · k candidate rows and takes each
    group's final top-k — |groups| is bounded (it is a stratum label), so
    the merge table is tiny.  NULL group keys '<NULL>' (a stratum for
    unlabeled rows is still a stratum).  Output
    (doc_id, group, w, pri) sorted by (group, pri DESC, doc_id) ==
    the SQL twin's row_number() <= k window."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = pd.to_numeric(df[weight], errors="raise")
        ok = df[key].notna() & w.notna() & (w > 0)
        df = df.loc[ok]
        if not len(df):
            return pd.DataFrame(
                {
                    key: pd.Series(dtype="int64"),
                    group: pd.Series(dtype="object"),
                    "w": pd.Series(dtype="int64"),
                    "pri": pd.Series(dtype="float64"),
                }
            )
        wv = w.loc[ok].to_numpy(np.int64)
        g = df[group].fillna("<NULL>").to_numpy(dtype=object)
        h = _hash64(df[key].to_numpy(), key_fn=key_fn) | np.uint64(1)
        pri = np.log(h.astype(np.float64) / 2.0**64) / wv
        # per-group top-k: one lexsort (group asc, pri desc), then keep the
        # first k positions of each group run — vectorized run-length cut
        order = np.lexsort((-pri, g))
        gs = g[order]
        run_start = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        within = np.arange(len(gs)) - np.repeat(run_start, np.diff(np.r_[run_start, len(gs)]))
        keep = order[within < k]
        return pd.DataFrame(
            {
                key: df[key].to_numpy()[keep],
                group: g[keep],
                "w": wv[keep],
                "pri": pri[keep],
            }
        )

    cand = (
        ray.data.read_parquet(docs_path, columns=[key, group, weight])
        .map_batches(partial, batch_format="pandas", batch_size=8192)
        .to_pandas()  # n_batches × |groups| × k, bounded
    )
    if not len(cand):
        return cand
    cand = cand.sort_values([group, "pri", key], ascending=[True, False, True], kind="mergesort")
    out = cand.groupby(group, sort=True).head(k)
    return out.reset_index(drop=True)


def balanced_downsample(
    docs_path: str,
    strata_col: str = "source",
    key: str = "doc_id",
    key_fn: str = "md5",
) -> "ray.data.Dataset":
    """Class-balanced downsampling: every stratum keeps exactly
    min-class-count rows — the label-balancing pass before classifier
    training / eval-set construction.  Pass 1 is a |strata|-bounded
    grouped count (k = its minimum, one tiny exchange); pass 2 is the
    stratified exact-k machinery (per stratum the k smallest
    (hash64(key), key) rows — deterministic, layout-independent, no
    per-group Python).  The SQL twin derives the same k via
    min(count(*)) and the same row_number total order."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count as _Count

    counts = (
        ray.data.read_parquet(docs_path, columns=[strata_col])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [pc.coalesce(t[strata_col], pa.scalar("<NULL>", pa.string()))],
                names=[strata_col],
            ),
            batch_format="pyarrow",
        )
        .groupby(strata_col)
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )  # |strata|-bounded
    k_min = int(counts["n"].min()) if len(counts) else 0
    return exact_k_per_group(docs_path, k=k_min, key=key, strata_col=strata_col, key_fn=key_fn)


def temperature_weights(
    docs_path: str, alpha: float = 0.7, k_total: int = 10000, strata_col: str = "source"
) -> pd.DataFrame:
    """Temperature-scaled mixture weights — the multilingual/multi-domain
    rebalancing rule (w_s ∝ n_s^α, α<1 upsamples small sources): from the
    ONE |strata|-bounded grouped count, each source's sampling weight and
    its expected draw count at a k_total budget.  pow/normalization are
    the only doubles, spelled identically in the twin; the exact ln/pow
    parity is the empirically-certified PMI convention.

    Output (source, n, weight, expected_k)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count as _Count

    counts = (
        ray.data.read_parquet(docs_path, columns=[strata_col])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [pc.coalesce(t[strata_col], pa.scalar("<NULL>", pa.string()))],
                names=[strata_col],
            ),
            batch_format="pyarrow",
        )
        .groupby(strata_col)
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
        .sort_values(strata_col)
        .reset_index(drop=True)
    )  # |strata|-bounded
    if not len(counts):
        return pd.DataFrame(
            {
                "source": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "weight": pd.Series(dtype="float64"),
                "expected_k": pd.Series(dtype="float64"),
            }
        )
    n = counts["n"].astype("int64").to_numpy()
    pw = np.power(n.astype(np.float64), alpha)
    w = pw / pw.sum()
    return pd.DataFrame(
        {
            "source": counts[strata_col],
            "n": n,
            "weight": w,
            "expected_k": w * float(k_total),
        }
    )
