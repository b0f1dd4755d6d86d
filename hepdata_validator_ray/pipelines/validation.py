"""Validation pipelines exposed as queries over the synthetic sequence table.

Each function takes the *sequences parquet directory* and returns a Ray
Dataset / pandas DataFrame whose shape matches a DuckDB oracle exactly
(column names included — the driver hash-compares by sorted column name).

All pipelines are Ray-Data-first: read_parquet (column-pruned) →
vectorized map_batches → (optionally) a small groupby.  Python-level work
touches only violating rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from hepdata_validator_ray.checks.base import CheckContext
from hepdata_validator_ray.checks.row_checks import DEFAULT_ACTIVE_CHECKS, prepare_view, runnable_checks
from hepdata_validator_ray.engine import duplicate_ids_dataset


def _violation_pairs_batch(batch: pa.Table, ctx: CheckContext, checks=None) -> pa.Table:
    """(doc_id, check_name) for every row-local violation in the batch.
    ``checks`` defaults to the DEFAULT-version active set; pass e.g.
    ``build_default_suite("1.2.0").checks`` for opt-in suites."""
    view = prepare_view(batch)
    doc = view.get("doc_id")
    ids: list = []
    names_out: list[str] = []
    for check in runnable_checks(DEFAULT_ACTIVE_CHECKS if checks is None else checks, batch, view):
        res = check.fn(view, ctx)
        if len(res.indices):
            vals = doc.take(pa.array(res.indices)).to_pylist() if doc is not None else [None] * len(res.indices)
            ids.extend(vals)
            names_out.extend([check.name] * len(res.indices))
    return pa.Table.from_pydict(
        {"doc_id": pa.array(ids, type=pa.string()), "check_name": pa.array(names_out, type=pa.string())}
    )


def row_violations(
    seq_path: str, ctx: CheckContext | None = None, version: str | None = None
) -> "ray.data.Dataset":
    """All row-local violations as (doc_id, check_name) pairs.  ``version``
    selects the suite profile (e.g. "1.2.0" additionally activates the
    uniqueItems list check)."""
    from hepdata_validator_ray.checks.row_checks import build_default_suite

    ctx = ctx or (CheckContext(schema_version=version) if version else CheckContext())
    checks = build_default_suite(version).checks if version else None
    return ray.data.read_parquet(seq_path).map_batches(
        lambda b: _violation_pairs_batch(b, ctx, checks),
        batch_format="pyarrow",
        batch_size=8192,
        zero_copy_batch=True,
    )


def violation_counts(seq_path: str, ctx: CheckContext | None = None) -> "ray.data.Dataset":
    """Violations per check — pre-aggregated per batch, then a tiny groupby
    (combiner pattern: the shuffle moves ≤ n_checks rows per batch)."""
    ctx = ctx or CheckContext()

    def partial(batch: pa.Table) -> pa.Table:
        view = prepare_view(batch)
        names, counts = [], []
        for check in runnable_checks(DEFAULT_ACTIVE_CHECKS, batch, view):
            res = check.fn(view, ctx)
            if len(res.indices):
                names.append(check.name)
                counts.append(len(res.indices))
        return pa.Table.from_pydict(
            {"check_name": pa.array(names, type=pa.string()), "n": pa.array(counts, type=pa.int64())}
        )

    return (
        ray.data.read_parquet(seq_path)
        .map_batches(partial, batch_format="pyarrow", batch_size=8192, zero_copy_batch=True)
        .groupby("check_name")
        .sum("n")
        .map_batches(lambda t: t.rename_columns(["check_name", "n"]), batch_format="pyarrow")
    )


def bundle_violations_by_table(bundle_path: str, ctx: CheckContext | None = None) -> "ray.data.Dataset":
    """Single-bundle split path (≙ the reference's single-YAML submissions,
    full_submission_validator.py:175-176,252-261) as an oracle-checkable
    aggregate: ONE parquet carries several logical tables tagged by a
    ``table`` column; rows route per tag and violations count per
    (table, check).  Pre-aggregated per batch → tiny groupby.
    ``engine.validate_bundle`` is the full entry mode with per-table
    verdicts and the optional split write."""
    ctx = ctx or CheckContext()

    def partial(batch: pa.Table) -> pa.Table:
        tags = batch.column("table")
        tags_np = np.asarray(tags.to_numpy(zero_copy_only=False))
        inner = batch.drop_columns(["table"])
        view = prepare_view(inner)
        out_tab: list = []
        out_check: list[str] = []
        out_n: list[int] = []
        for check in runnable_checks(DEFAULT_ACTIVE_CHECKS, inner, view):
            res = check.fn(view, ctx)
            if len(res.indices):
                u, c = np.unique(tags_np[res.indices], return_counts=True)
                out_tab.extend(u.tolist())
                out_check.extend([check.name] * len(u))
                out_n.extend(int(x) for x in c)
        return pa.Table.from_pydict(
            {
                "table_name": pa.array(out_tab, type=pa.string()),
                "check_name": pa.array(out_check, type=pa.string()),
                "n": pa.array(out_n, type=pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(bundle_path)
        .map_batches(partial, batch_format="pyarrow", batch_size=8192, zero_copy_batch=True)
        .groupby(["table_name", "check_name"])
        .sum("n")
        .map_batches(lambda t: t.rename_columns(["table_name", "check_name", "n"]), batch_format="pyarrow")
    )


def duplicate_doc_ids(seq_path: str) -> "ray.data.Dataset":
    """doc_ids appearing more than once: column-pruned read + map-side
    combine + the one global shuffle (SURVEY.md §2.5 A1)."""
    return duplicate_ids_dataset(seq_path)


def stats_by_source(seq_path: str) -> "ray.data.Dataset":
    """Per-source column stats (count / sum / min / max of n_tok) — the
    column-stats check family (A3/ST3), integer-exact for oracle parity."""
    from ray.data.aggregate import Count, Max, Min, Sum

    return (
        ray.data.read_parquet(seq_path, columns=["source", "n_tok"])
        .groupby("source")
        .aggregate(
            Count(alias_name="n_rows"),
            Sum("n_tok", alias_name="sum_n_tok"),
            Min("n_tok", alias_name="min_n_tok"),
            Max("n_tok", alias_name="max_n_tok"),
        )
    )


def ntok_histogram(seq_path: str, bucket_width: int = 64) -> "ray.data.Dataset":
    """n_tok histogram: per-batch bincount partials → tiny groupby sum.
    The drift-check building block (A5) exposed as a query."""

    def partial(batch: pa.Table) -> pa.Table:
        n_tok = batch.column("n_tok").to_numpy(zero_copy_only=False).astype(np.int64)
        buckets = np.floor_divide(n_tok, bucket_width)
        uniq, cnt = np.unique(buckets, return_counts=True)
        return pa.Table.from_pydict(
            {"bucket": pa.array(uniq, type=pa.int64()), "n": pa.array(cnt, type=pa.int64())}
        )

    return (
        ray.data.read_parquet(seq_path, columns=["n_tok"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("bucket")
        .sum("n")
        .map_batches(lambda t: t.rename_columns(["bucket", "n"]), batch_format="pyarrow")
    )


def rows_per_partition(seq_path: str) -> "ray.data.Dataset":
    """Per-input-file row counts — the per-partition lineage/verdict basis."""

    def partial(batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(batch.column("path").combine_chunks())
        idx = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(idx, minlength=len(enc.dictionary))
        return pa.Table.from_pydict(
            {
                "partition_id": enc.dictionary,
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(seq_path, columns=["doc_id"], include_paths=True)
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("partition_id")
        .sum("n")
        .map_batches(lambda t: t.rename_columns(["partition_id", "n_rows"]), batch_format="pyarrow")
    )


def violations_by_partition(seq_path: str, ctx: CheckContext | None = None) -> "ray.data.Dataset":
    """Per-(partition, check) violation counts — the verdict-matrix basis,
    with partition attribution oracle-checkable via filename=true."""
    ctx = ctx or CheckContext()

    def partial(batch: pa.Table) -> pa.Table:
        paths = batch.column("path")
        enc = pc.dictionary_encode(paths.combine_chunks() if isinstance(paths, pa.ChunkedArray) else paths)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        uniq = enc.dictionary.to_pylist()
        inner = batch.drop_columns(["path"])
        view = prepare_view(inner)
        parts: list[str] = []
        checks: list[str] = []
        ns: list[int] = []
        for check in runnable_checks(DEFAULT_ACTIVE_CHECKS, inner, view):
            res = check.fn(view, ctx)
            if len(res.indices):
                cnt = np.bincount(codes[res.indices], minlength=len(uniq))
                for code in np.flatnonzero(cnt):
                    parts.append(uniq[code])
                    checks.append(check.name)
                    ns.append(int(cnt[code]))
        return pa.Table.from_pydict(
            {
                "partition_id": pa.array(parts, type=pa.string()),
                "check_name": pa.array(checks, type=pa.string()),
                "n": pa.array(ns, type=pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(seq_path, include_paths=True)
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["partition_id", "check_name"])
        .sum("n")
        .map_batches(lambda t: t.rename_columns(["partition_id", "check_name", "n"]), batch_format="pyarrow")
    )


def partition_stats(seq_path: str, ctx: CheckContext | None = None) -> "ray.data.Dataset":
    """Per-partition verdict matrix AND row counts as ONE union —
    (partition_id, check_name, n) with the sentinel check_name ``<rows>``
    carrying the row count (slot-saving fusion of violations_by_partition +
    rows_per_partition; both legs stay independently queryable)."""

    def as_rows(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                t["partition_id"].combine_chunks() if isinstance(t["partition_id"], pa.ChunkedArray) else t["partition_id"],
                pa.array(["<rows>"] * t.num_rows, type=pa.string()),
                pc.cast(t["n_rows"], pa.int64()).combine_chunks(),
            ],
            names=["partition_id", "check_name", "n"],
        )

    return violations_by_partition(seq_path, ctx).union(
        rows_per_partition(seq_path).map_batches(as_rows, batch_format="pyarrow")
    )


def longest_sequences(seq_path: str, k: int = 20) -> "ray.data.Dataset":
    """Top-k longest sequences — explicit distributed multi-key sort + limit
    (deterministic tie-break on doc_id)."""
    return (
        ray.data.read_parquet(seq_path, columns=["doc_id", "n_tok"])
        .map_batches(
            lambda t: t.filter(pc.is_valid(t["doc_id"])), batch_format="pyarrow"
        )
        .sort(["n_tok", "doc_id"], descending=[True, False])
        .limit(k)
    )


def ntok_p99_filter_counts(seq_path: str, q: float = 0.99) -> "ray.data.Dataset":
    """Quantile-threshold outlier filter — the aggregate → broadcast →
    filter composition (drop extreme-length sequences before training):
    phase 1 computes the global exact p-quantile of n_tok (distributed
    Quantile aggregate, tiny result); phase 2 streams the table once more
    counting survivors (n_tok ≤ threshold) per source."""
    from ray.data.aggregate import Quantile

    thr = ray.data.read_parquet(seq_path, columns=["n_tok"]).aggregate(
        Quantile("n_tok", q=q, alias_name="thr")
    )["thr"]

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.and_kleene(
            pc.is_valid(batch["n_tok"]), pc.less_equal(batch["n_tok"], pa.scalar(thr))
        )
        kept = batch.filter(pc.fill_null(mask, False))
        g = kept.group_by("source").aggregate([([], "count_all")])
        return g.rename_columns(["source", "n"])

    return (
        ray.data.read_parquet(seq_path, columns=["source", "n_tok"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("source")
        .sum("n")
        .map_batches(lambda t: t.rename_columns(["source", "n"]), batch_format="pyarrow")
    )


def token_bigrams_top(seq_path: str, k: int = 100, vocab_size: int | None = None) -> "ray.data.Dataset":
    """Top-k token bigrams across the corpus — the n-gram statistics pass of
    a training-data pipeline (vocabulary analysis / contamination greps).

    Bigrams are encoded as ONE int64 key (t1*V + t2, never crossing row
    boundaries), pre-counted per batch (map-side combine) and summed in the
    bucketed exchange; a final distributed sort takes the top k with a
    fully deterministic (cnt desc, t1, t2) order."""
    V = vocab_size or CheckContext().vocab_size
    counts = _bigram_count_dataset(seq_path, V)

    def decode(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "t1": pa.array(key // V, type=pa.int64()),
                "t2": pa.array(key % V, type=pa.int64()),
                "cnt": t["cnt"],
            }
        )

    def block_topk(t: pa.Table) -> pa.Table:
        # per-block (= per-bucket) partial top-k so the global sort moves
        # ≤ k × num_buckets rows instead of every distinct bigram
        idx = pc.sort_indices(t, sort_keys=[("cnt", "descending"), ("key", "ascending")])
        return t.take(idx[: min(k, t.num_rows)])

    return (
        counts.map_batches(block_topk, batch_format="pyarrow")
        .sort(["cnt", "key"], descending=[True, False])
        .limit(k)
        .map_batches(decode, batch_format="pyarrow")
    )


def _bigram_count_dataset(seq_path: str, V: int) -> "ray.data.Dataset":
    """The distributed (key = t1·V + t2, cnt) bigram count table — the
    corpus-scale intermediate shared by the top-k ranking and the
    count-of-counts spectrum.  Map-side pre-count, one bucketed int-sum
    exchange; pairs never cross row boundaries; only valid token ids
    (the encoding's injectivity domain) count."""
    from hepdata_validator_ray.ops import bucketed_aggregate, sum_counts_combine

    def partial(batch: pa.Table) -> pa.Table:
        view = prepare_view(batch)
        flat, offsets, lens = view["flat"], view["offsets"], view["lens"]
        n = len(flat)
        if n < 2:
            return pa.Table.from_pydict(
                {"key": pa.array([], type=pa.int64()), "cnt": pa.array([], type=pa.int64())}
            )
        t1 = flat[:-1].astype(np.int64)
        t2 = flat[1:].astype(np.int64)
        key = t1 * np.int64(V) + t2
        # drop pairs straddling row boundaries (position i is a row's last)
        last_positions = offsets[1:][lens > 0] - 1
        valid = np.ones(n - 1, dtype=bool)
        valid[last_positions[last_positions < n - 1]] = False
        # out-of-range token ids would break the t1*V+t2 encoding's
        # injectivity (t2 >= V aliases into the next t1; negatives mis-decode)
        # — bigram stats are defined over VALID token ids only
        valid &= (t1 >= 0) & (t1 < V) & (t2 >= 0) & (t2 < V)
        uniq, cnt = np.unique(key[valid], return_counts=True)
        return pa.Table.from_pydict(
            {"key": pa.array(uniq, type=pa.int64()), "cnt": pa.array(cnt, type=pa.int64())}
        )

    return bucketed_aggregate(
        ray.data.read_parquet(seq_path, columns=["tokens"]), "key", partial, sum_counts_combine("key")
    )


def bigram_count_of_counts(seq_path: str, vocab_size: int | None = None) -> pd.DataFrame:
    """Frequency-of-frequencies spectrum of the bigram table — how many
    distinct bigrams occur exactly c times — the Good–Turing ingredient:
    n_1/N estimates the unseen-bigram probability mass, and a healthy
    natural-language spectrum decays smoothly in c (spikes betray
    templated/duplicated text).  frac_mass = c·n_c / N is each
    frequency class's share of all bigram occurrences.

    The corpus-scale bigram table (shared builder with top-k and PMI)
    stays distributed; a SECOND tiny exchange collapses it to the
    count-of-counts (bounded by |distinct c| ≤ √(2N)); the driver sees
    only that spectrum.  Exact integers except frac_mass, whose division
    is spelled identically in the twin.

    Output (c, n_c, frac_mass)."""
    from hepdata_validator_ray.ops import bucketed_aggregate, sum_counts_combine

    V = vocab_size or CheckContext().vocab_size
    counts = _bigram_count_dataset(seq_path, V)

    def coc_partial(t: pa.Table) -> pa.Table:
        c = t["cnt"].to_numpy(zero_copy_only=False)
        uniq, n_c = np.unique(c, return_counts=True)
        return pa.Table.from_pydict(
            {"key": pa.array(uniq, pa.int64()), "cnt": pa.array(n_c, pa.int64())}
        )

    coc = (
        bucketed_aggregate(counts, "key", coc_partial, sum_counts_combine("key"))
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )  # |distinct c| rows, bounded by sqrt(2N)
    if not len(coc):
        return pd.DataFrame(
            {
                "c": pd.Series(dtype="int64"),
                "n_c": pd.Series(dtype="int64"),
                "frac_mass": pd.Series(dtype="float64"),
            }
        )
    c = coc["key"].to_numpy(np.int64)
    n_c = coc["cnt"].to_numpy(np.int64)
    # exact Python-int total (c·n_c sums past int64 at the 10^12 tier)
    total = sum(int(a) * int(b) for a, b in zip(c, n_c))
    frac = np.array([(int(a) * int(b)) / total for a, b in zip(c, n_c)], dtype=np.float64)
    return pd.DataFrame({"c": c, "n_c": n_c, "frac_mass": frac})


def ntok_quantiles_by_source(seq_path: str) -> "ray.data.Dataset":
    """Per-source n_tok quantiles (the data-mix length diagnostic): a
    grouped distributed Quantile aggregate — one shuffle keyed on the
    low-cardinality source column."""
    import pyarrow.compute as _pc

    from ray.data.aggregate import Quantile

    ds = (
        ray.data.read_parquet(seq_path, columns=["source", "n_tok"])
        .groupby("source")
        .aggregate(
            Quantile("n_tok", q=0.5, alias_name="p50"),
            Quantile("n_tok", q=0.9, alias_name="p90"),
        )
    )

    def round_cols(t: pa.Table) -> pa.Table:
        for c in ("p50", "p90"):
            t = t.set_column(t.column_names.index(c), c, _pc.round(_pc.cast(t[c], pa.float64()), 6))
        return t

    return ds.map_batches(round_cols, batch_format="pyarrow")


def ntok_quantiles(seq_path: str) -> pd.DataFrame:
    """Exact n_tok quantiles via Ray's distributed Quantile aggregate —
    the exact counterpart to the engine's approximate histogram sketch
    (the sketch is the 10^12-scale path; this is the oracle-checkable one)."""
    from ray.data.aggregate import Max, Min, Quantile

    res = ray.data.read_parquet(seq_path, columns=["n_tok"]).aggregate(
        Quantile("n_tok", q=0.5, alias_name="p50"),
        Quantile("n_tok", q=0.9, alias_name="p90"),
        Quantile("n_tok", q=0.99, alias_name="p99"),
        Min("n_tok", alias_name="min_n_tok"),
        Max("n_tok", alias_name="max_n_tok"),
    )
    df = pd.DataFrame([res])
    for c in ("p50", "p90", "p99"):
        df[c] = df[c].astype(float).round(6)
    return df[["p50", "p90", "p99", "min_n_tok", "max_n_tok"]]


def embedding_integrity(emb_path: str, expected_dim: int = 64) -> pd.DataFrame:
    """Vector-column validation: dimension mismatches, NaN components,
    zero-norm vectors — the schema-check family extended to embedding
    columns (one summary row; per-batch numpy, partials summed)."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column("embedding")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
        bad_dim = int((lens != expected_dim).sum())
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        nan_mask = np.isnan(flat)
        # rows containing NaN / rows with zero norm (vectorized segment sums)
        offsets = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(np.maximum(lens, 0), out=offsets[1:])
        cum_nan = np.zeros(len(flat) + 1, dtype=np.int64)
        np.cumsum(nan_mask, out=cum_nan[1:])
        n_nan_rows = int(((cum_nan[offsets[1:]] - cum_nan[offsets[:-1]]) > 0).sum())
        sq = flat.astype(np.float64) ** 2
        cum_sq = np.zeros(len(flat) + 1, dtype=np.float64)
        np.cumsum(sq, out=cum_sq[1:])
        norms = cum_sq[offsets[1:]] - cum_sq[offsets[:-1]]
        n_zero_norm = int((norms == 0).sum())
        return pa.Table.from_pydict(
            {
                "n_bad_dim": pa.array([bad_dim], type=pa.int64()),
                "n_nan_rows": pa.array([n_nan_rows], type=pa.int64()),
                "n_zero_norm": pa.array([n_zero_norm], type=pa.int64()),
                "n_rows": pa.array([batch.num_rows], type=pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(emb_path, columns=["embedding"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .to_pandas()
    )
    return pd.DataFrame([parts.sum().astype("int64").to_dict()])[
        ["n_bad_dim", "n_nan_rows", "n_zero_norm", "n_rows"]
    ]


def full_violation_counts(seq_path: str, ctx: CheckContext | None = None) -> pd.DataFrame:
    """Flagship: row-local counts + cross-partition duplicate count in one
    result — the complete constraint suite summary."""
    rc = violation_counts(seq_path, ctx).to_pandas()
    dups = duplicate_doc_ids(seq_path).to_pandas()
    n_dup = int(dups["cnt"].sum()) if len(dups) else 0
    if n_dup:
        rc = pd.concat(
            [rc, pd.DataFrame([{"check_name": "doc_id_duplicates", "n": n_dup}])], ignore_index=True
        )
    return rc.sort_values("check_name").reset_index(drop=True)


def declared_violations(seq_path: str, declare: list[dict], ctx: CheckContext | None = None) -> "ray.data.Dataset":
    """Violations from CONFIG-ONLY declarative constraints (checks/declarative.py):
    each spec compiles to a vectorized check, evaluated like any registered
    check — the analogue of the reference accepting arbitrary user JSON
    Schemas (__init__.py:97-122).  Output: (doc_id, check_name) pairs."""
    from hepdata_validator_ray.checks.declarative import compile_declared_check

    ctx = ctx or CheckContext()
    checks = [compile_declared_check(s) for s in declare]
    cols = ["doc_id"] + [s["column"] for s in declare if s["column"] != "doc_id"]
    return ray.data.read_parquet(seq_path, columns=list(dict.fromkeys(cols))).map_batches(
        lambda b: _violation_pairs_batch(b, ctx, checks),
        batch_format="pyarrow",
        batch_size=8192,
        zero_copy_batch=True,
    )


def ntok_quantiles_combined(seq_path: str) -> pd.DataFrame:
    """Global AND per-source n_tok quantile stats in one result: per-source
    rows from the grouped distributed Quantile aggregate plus an ``<all>``
    row from the global aggregate (quantiles don't merge, so the global row
    is its own tiny aggregate over the pruned int column, not a driver-side
    recombination of per-source results)."""
    from ray.data.aggregate import Max, Min, Quantile

    per_src = (
        ray.data.read_parquet(seq_path, columns=["source", "n_tok"])
        .groupby("source")
        .aggregate(
            Quantile("n_tok", q=0.5, alias_name="p50"),
            Quantile("n_tok", q=0.9, alias_name="p90"),
            Quantile("n_tok", q=0.99, alias_name="p99"),
            Min("n_tok", alias_name="min_n_tok"),
            Max("n_tok", alias_name="max_n_tok"),
        )
        .to_pandas()
    )
    overall = ray.data.read_parquet(seq_path, columns=["n_tok"]).aggregate(
        Quantile("n_tok", q=0.5, alias_name="p50"),
        Quantile("n_tok", q=0.9, alias_name="p90"),
        Quantile("n_tok", q=0.99, alias_name="p99"),
        Min("n_tok", alias_name="min_n_tok"),
        Max("n_tok", alias_name="max_n_tok"),
    )
    overall = pd.DataFrame([overall]).assign(source="<all>")
    out = pd.concat([per_src, overall], ignore_index=True)
    for c in ("p50", "p90", "p99"):
        out[c] = out[c].astype(float).round(6)
    out["min_n_tok"] = out["min_n_tok"].astype("int64")
    out["max_n_tok"] = out["max_n_tok"].astype("int64")
    return out[["source", "p50", "p90", "p99", "min_n_tok", "max_n_tok"]]


def degenerate_sequence_stats(seq_path: str) -> "ray.data.Dataset":
    """Degenerate-sequence QC (the repeated-token pathology detector a
    token-corpus validator needs): per sequence, the DISTINCT token count
    and the MAX RUN length (longest block of consecutive equal tokens).
    A near-constant sequence (n_distinct ≈ 1) or a long run flags a
    degenerate/looping generation.  Output (doc_id, n_tok, n_distinct,
    max_run); empty sequences report zeros.

    One zero-copy pass, no exchange: each batch's list column flattens to
    (values, offsets); run boundaries are value-changes OR sequence starts
    (one vectorized comparison), per-sequence max-run via np.maximum.at
    over run lengths; distinct counts from one np.unique over the packed
    (sequence-index, token) pairs.  Per-row work only — the operator
    parallelizes embarrassingly at any corpus size."""

    def stats(t: pa.Table) -> pa.Table:
        col = t.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        # ListArray.values covers the whole underlying buffer; slice to
        # this array's window so positions align with rebased offsets
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.int64)[offs[0] : offs[-1]]
        nvals = len(vals)
        doc_id = t.column("doc_id").to_numpy(zero_copy_only=False)
        n_tok = lens.astype(np.int64)
        n_distinct = np.zeros(n, dtype=np.int64)
        max_run = np.zeros(n, dtype=np.int64)
        if nvals:
            seq_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            # run starts: position 0, a value change, or a sequence start
            change = np.empty(nvals, dtype=bool)
            change[0] = True
            change[1:] = (vals[1:] != vals[:-1]) | (seq_idx[1:] != seq_idx[:-1])
            starts = np.flatnonzero(change)
            run_lens = np.diff(np.r_[starts, nvals])
            run_seq = seq_idx[starts]
            np.maximum.at(max_run, run_seq, run_lens)
            # distinct per sequence: unique packed (seq, token) keys —
            # collision-free since the token offset < the range width
            width = int(vals.max()) - int(vals.min()) + 1
            pairs = np.unique(seq_idx * width + (vals - int(vals.min())))
            n_distinct += np.bincount(pairs // width, minlength=n)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_id),
                "n_tok": pa.array(n_tok, type=pa.int64()),
                "n_distinct": pa.array(n_distinct, type=pa.int64()),
                "max_run": pa.array(max_run, type=pa.int64()),
            }
        )

    return ray.data.read_parquet(seq_path, columns=["doc_id", "tokens"]).map_batches(
        stats, batch_format="pyarrow", batch_size=16384
    )


def rare_token_unk_stats(seq_path: str, min_count: int = 5) -> "ray.data.Dataset":
    """Vocabulary-pruning impact audit over the token table: if every token
    with corpus frequency < ``min_count`` were replaced by UNK, what share
    of each source's token stream degrades?  Output per source
    (source, n_tok, n_unk) plus an '<all>' row — the go/no-go number for a
    vocab-size cut.

    Two passes, both bounded: (1) the corpus token histogram — per-batch
    bincount partials into a vocabulary-bounded exchange; the rare-token
    id set (≤ vocab size) broadcasts via ray.put as a sorted int array.
    (2) per-batch np.isin over the flattened values + per-source segmented
    sums into a |sources|-sized groupby.  Token ids never leave int64;
    NULL sources group under '<NULL>'."""
    from ray.data.aggregate import Sum

    def tok_hist(t: pa.Table) -> pa.Table:
        col = t.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.int64)[offs[0] : offs[-1]]
        if not len(vals):
            return pa.Table.from_pydict(
                {"t": pa.array([], type=pa.int64()), "c": pa.array([], type=pa.int64())}
            )
        uniq, cnt = np.unique(vals, return_counts=True)
        return pa.Table.from_pydict(
            {"t": pa.array(uniq, type=pa.int64()), "c": pa.array(cnt, type=pa.int64())}
        )

    hist = (
        ray.data.read_parquet(seq_path, columns=["tokens"])
        .map_batches(tok_hist, batch_format="pyarrow", batch_size=16384)
        .groupby("t")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # vocabulary-bounded at any corpus size
    )
    rare = np.sort(hist.loc[hist["c"] < min_count, "t"].to_numpy(np.int64))
    rare_ref = ray.put(rare)

    def score(t: pa.Table) -> pd.DataFrame:
        # zero-copy Arrow offsets/values — no Python-object list traversal
        r = ray.get(rare_ref)
        col = t.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.int64)[offs[0] : offs[-1]]
        lens = np.diff(offs)
        src = t.column("source").to_pandas().fillna("<NULL>")
        is_unk = np.isin(vals, r) if len(vals) else np.empty(0, dtype=bool)
        seq_idx = np.repeat(np.arange(len(lens)), lens)
        unk_per_row = np.zeros(len(lens), dtype=np.int64)
        np.add.at(unk_per_row, seq_idx[is_unk], 1)  # integer-exact
        out = pd.DataFrame({"source": src, "n_tok": lens.astype(np.int64), "n_unk": unk_per_row})
        return out.groupby("source", as_index=False, sort=False).sum()

    per_src = (
        ray.data.read_parquet(seq_path, columns=["source", "tokens"])
        .map_batches(score, batch_format="pyarrow", batch_size=8192)
        .groupby("source")
        .aggregate(Sum("n_tok", alias_name="n_tok"), Sum("n_unk", alias_name="n_unk"))
        .to_pandas()  # |sources|-bounded
    )
    allrow = pd.DataFrame(
        {
            "source": ["<all>"],
            "n_tok": [int(per_src["n_tok"].sum())],
            "n_unk": [int(per_src["n_unk"].sum())],
        }
    )
    out = pd.concat([per_src, allrow], ignore_index=True).astype(
        {"n_tok": "int64", "n_unk": "int64"}
    )
    return ray.data.from_pandas(out)


def ks_drift_stats(seq_path: str) -> "ray.data.Dataset":
    """Distribution-drift verdict (the A5 family) as an EXACT integer:
    for each source, the Kolmogorov–Smirnov distance between its n_tok
    distribution and the REST of the corpus, reported as the integer
    numerator ks_num = max_v |cum_src(v)·n_rest − cum_rest(v)·n_src|
    (the true KS statistic is ks_num / (n_src·n_rest) — cross-multiplied
    so no float ever enters, making the drift check oracle-gateable where
    KL/chi² cannot be).  Output (source, ks_num, n_src, n_rest).

    One (source, n_tok) histogram exchange — bounded by
    |sources| × |length domain| at any corpus size — then a driver-side
    cumulative closed form on the tiny table.  Bound: ks_num ≤
    n_src·n_rest, so int64 holds below ~3·10⁹ total rows; beyond that the
    same pipeline should emit the numerator as a decimal string (the
    comparison stays exact), documented rather than silently truncated."""
    from ray.data.aggregate import Count

    hist = (
        ray.data.read_parquet(seq_path, columns=["source", "n_tok"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["source"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(t["n_tok"], pa.int64()),
                ],
                names=["source", "v"],
            ),
            batch_format="pyarrow",
        )
        .groupby(["source", "v"])
        .aggregate(Count(alias_name="c"))
        .to_pandas()  # |sources| x |length domain|, bounded
    )
    if not len(hist):
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "source": pd.Series(dtype="object"),
                    "ks_num": pd.Series(dtype="int64"),
                    "n_src": pd.Series(dtype="int64"),
                    "n_rest": pd.Series(dtype="int64"),
                }
            )
        )
    pivot = (
        hist.pivot_table(index="v", columns="source", values="c", aggfunc="sum", fill_value=0)
        .sort_index()
        .astype(np.int64)
    )
    cum = pivot.cumsum()
    totals = pivot.sum()
    n_all = int(totals.sum())
    call = cum.sum(axis=1).to_numpy(np.int64)
    rows = []
    for src in sorted(totals.index):
        n_s = int(totals[src])
        n_r = n_all - n_s
        cs = cum[src].to_numpy(np.int64)
        ks = int(np.max(np.abs(cs * n_r - (call - cs) * n_s))) if n_r else 0
        rows.append({"source": src, "ks_num": ks, "n_src": n_s, "n_rest": n_r})
    return ray.data.from_pandas(
        pd.DataFrame(rows).astype({"ks_num": "int64", "n_src": "int64", "n_rest": "int64"})
    )


def token_ngram_repetition_stats(seq_path: str, k: int = 3) -> "ray.data.Dataset":
    """Within-sequence n-gram repetition (the Gopher duplicate-n-gram
    fraction at TOKEN level): per sequence, total k-gram count and
    DISTINCT k-gram count — (n_ngrams − n_distinct_ngrams)/n_ngrams is the
    repetition share that flags looping generations which per-token run
    length (degenerate_sequence_stats) misses.

    Per-row op, no exchange: k-grams are k shifted views of the flattened
    values; cross-row windows drop via one seq-index comparison; EXACT
    distinct counts come from np.unique over a structured (seq, t0..tk−1)
    row view — no hashing, so the SQL twin (list_distinct over slice
    strings) can never diverge on collisions."""

    def stats(t: pa.Table) -> pa.Table:
        col = t.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.int64)[offs[0] : offs[-1]]
        lens = np.diff(offs)
        doc_id = t.column("doc_id").to_numpy(zero_copy_only=False)
        n_tri = np.zeros(n, dtype=np.int64)
        n_dist = np.zeros(n, dtype=np.int64)
        if len(vals) >= k:
            seq_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            valid = seq_idx[: len(vals) - k + 1] == seq_idx[k - 1 :]
            tri_seg = seq_idx[: len(vals) - k + 1][valid]
            cols = [tri_seg] + [vals[j : len(vals) - k + 1 + j][valid] for j in range(k)]
            mat = np.column_stack(cols)
            if len(mat):
                dt = [(f"f{i}", "<i8") for i in range(k + 1)]
                uniq = np.unique(np.ascontiguousarray(mat).view(dt))
                n_dist += np.bincount(uniq[f"f0"].ravel(), minlength=n)
                n_tri += np.bincount(tri_seg, minlength=n)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_id),
                "n_ngrams": pa.array(n_tri, type=pa.int64()),
                "n_distinct_ngrams": pa.array(n_dist, type=pa.int64()),
            }
        )

    return ray.data.read_parquet(seq_path, columns=["doc_id", "tokens"]).map_batches(
        stats, batch_format="pyarrow", batch_size=16384
    )


def token_coverage_curve(
    seq_path: str, ladder: tuple = (1, 10, 100, 1000, 10000)
) -> "ray.data.Dataset":
    """Tokenizer-fit curve: for each vocabulary size V in ``ladder``, how
    many token OCCURRENCES the top-V tokens (by count DESC, id ASC) cover —
    (v_top, covered, total).  The coverage elbow is how a vocab size gets
    chosen; all integers, so the curve is oracle-exact.

    One vocabulary-bounded token-histogram exchange (per-batch np.unique
    partials → grouped sum), then the ladder is a driver-side cumsum over
    the sorted histogram — the corpus is never rescanned per V."""
    from ray.data.aggregate import Sum

    def tok_hist(t: pa.Table) -> pa.Table:
        col = t.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.int64)[offs[0] : offs[-1]]
        if not len(vals):
            return pa.Table.from_pydict(
                {"t": pa.array([], type=pa.int64()), "c": pa.array([], type=pa.int64())}
            )
        uniq, cnt = np.unique(vals, return_counts=True)
        return pa.Table.from_pydict(
            {"t": pa.array(uniq, type=pa.int64()), "c": pa.array(cnt, type=pa.int64())}
        )

    hist = (
        ray.data.read_parquet(seq_path, columns=["tokens"])
        .map_batches(tok_hist, batch_format="pyarrow", batch_size=16384)
        .groupby("t")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # vocabulary-bounded
        .sort_values(["c", "t"], ascending=[False, True])
        .reset_index(drop=True)
    )
    total = int(hist["c"].sum()) if len(hist) else 0
    cum = np.cumsum(hist["c"].to_numpy(np.int64)) if len(hist) else np.empty(0, np.int64)
    rows = [
        {
            "v_top": int(v),
            "covered": int(cum[min(int(v), len(cum)) - 1]) if len(cum) else 0,
            "total": total,
        }
        for v in ladder
    ]
    return ray.data.from_pandas(
        pd.DataFrame(rows).astype({"v_top": "int64", "covered": "int64", "total": "int64"})
    )


def id_source_consistency(seq_path: str) -> "ray.data.Dataset":
    """Cross-FIELD consistency check (the referential cousin of the format
    checks): the doc_id convention embeds the source (``doc-<source>-N``),
    so its middle segment must equal the row's source column.  Output per
    source: (source, n_rows, n_mismatch) — mismatch = NULL doc_id or a
    segment that differs (NULL-safe comparison).  One vectorized pandas
    pass with map-side collapse into a |sources|-bounded groupby."""
    from ray.data.aggregate import Sum

    def score(df: pd.DataFrame) -> pd.DataFrame:
        src = df["source"]
        seg = df["doc_id"].str.split("-").str[1]
        # NULL-safe inequality: mismatch when exactly one side is null or
        # both non-null and different; matching nulls are consistent
        bad = (seg.isna() != src.isna()) | (seg.notna() & src.notna() & (seg != src))
        bad |= df["doc_id"].isna()
        out = pd.DataFrame({"source": src.fillna("<NULL>"), "bad": bad.astype(np.int64)})
        g = out.groupby("source", as_index=False).agg(
            n_rows=("bad", "size"), n_mismatch=("bad", "sum")
        )
        return g.astype({"n_rows": "int64", "n_mismatch": "int64"})

    return (
        ray.data.read_parquet(seq_path, columns=["doc_id", "source"])
        .map_batches(score, batch_format="pandas", batch_size=16384)
        .groupby("source")
        .aggregate(Sum("n_rows", alias_name="n_rows"), Sum("n_mismatch", alias_name="n_mismatch"))
    )


def parquet_layout_audit(seq_path: str) -> "ray.data.Dataset":
    """Physical-LAYOUT audit from parquet FOOTERS only (no data scan): per
    file, (file, n_row_groups, n_rows, min_rg_rows, max_rg_rows).  Tiny
    row groups destroy scan throughput and huge ones defeat row-group
    pruning — at 100 TB this audit is the difference between a read plan
    that prunes and one that can't, and it costs one footer read per file,
    parallelized as a Dataset over the file list (a task per path batch),
    never touching a data page."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(seq_path):
        files = sorted(
            os.path.join(seq_path, f) for f in os.listdir(seq_path) if f.endswith(".parquet")
        )
    else:
        files = [seq_path]

    def footer_stats(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for path in batch["path"]:
            md = pq.ParquetFile(path).metadata
            sizes = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
            comp = uncomp = 0
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                for j in range(rg.num_columns):
                    col = rg.column(j)
                    comp += col.total_compressed_size
                    uncomp += col.total_uncompressed_size
            rows.append(
                {
                    "file": os.path.basename(path),
                    "n_row_groups": md.num_row_groups,
                    "n_rows": int(sum(sizes)),
                    "min_rg_rows": int(min(sizes)) if sizes else 0,
                    "max_rg_rows": int(max(sizes)) if sizes else 0,
                    "compressed_bytes": int(comp),
                    "uncompressed_bytes": int(uncomp),
                }
            )
        return pd.DataFrame(rows).astype(
            {
                c: "int64"
                for c in (
                    "n_row_groups",
                    "n_rows",
                    "min_rg_rows",
                    "max_rg_rows",
                    "compressed_bytes",
                    "uncompressed_bytes",
                )
            }
        )

    return ray.data.from_items([{"path": f} for f in files]).map_batches(
        footer_stats, batch_format="pandas", batch_size=64
    )


def trimmed_sum_stats(seq_path: str, trim_pct: int = 5) -> "ray.data.Dataset":
    """Robust per-source location statistic, integer-exact: drop the
    lowest and highest ⌊n·trim_pct/100⌋ n_tok values per source and report
    (source, n, n_kept, sum_kept) — the trimmed mean is sum_kept/n_kept,
    left rational so the gate never sees a float.  Equal values are
    interchangeable, so which tied rows fall to the trim is value-
    irrelevant and both engines agree without a tie-break.

    Same scale shape as the padding audit: ONE |sources|×|length-domain|
    histogram exchange, then the trimmed range [k, n−k) is summed over
    histogram runs in O(runs) driver arithmetic — no sort, no row-scale
    shuffle at any corpus size."""
    from ray.data.aggregate import Count

    hist = (
        ray.data.read_parquet(seq_path, columns=["source", "n_tok"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["source"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(t["n_tok"], pa.int64()),
                ],
                names=["source", "v"],
            ),
            batch_format="pyarrow",
        )
        .groupby(["source", "v"])
        .aggregate(Count(alias_name="c"))
        .to_pandas()  # bounded by |sources| x |length domain|
    )
    rows = []
    for src, grp in hist.groupby("source", sort=True):
        grp = grp.sort_values("v")
        v = grp["v"].to_numpy(np.int64)
        c = grp["c"].to_numpy(np.int64)
        hi = np.cumsum(c)
        lo = hi - c
        n = int(hi[-1])
        k = (n * trim_pct) // 100
        a, b = k, n - k  # kept rank range [a, b)
        overlap = np.clip(np.minimum(hi, b) - np.maximum(lo, a), 0, None)
        rows.append(
            {
                "source": src,
                "n": n,
                "n_kept": int(overlap.sum()),
                "sum_kept": int(np.sum(v * overlap)),
            }
        )
    out = pd.DataFrame(rows, columns=["source", "n", "n_kept", "sum_kept"])
    return ray.data.from_pandas(
        out.astype({"n": "int64", "n_kept": "int64", "sum_kept": "int64"})
        if len(out)
        else out
    )


def vocab_growth_curve(
    seq_path: str, ladder: tuple = (1000, 10000, 100000, 1000000), num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Vocabulary GROWTH curve (Heaps'-law empirics): reading the corpus in
    the deterministic shuffle order (hash64(doc_id), doc_id, n_tok), how
    many DISTINCT token ids have been seen after the first K token
    positions, for each K in ``ladder`` — (k_pos, n_distinct_seen).  The
    curve's flattening is the other half of the vocab-size decision next
    to token_coverage_curve.

    No global sort: hash top bits form order-preserving range buckets;
    per-bucket n_tok sums prefix-sum driver-side into bucket base offsets
    (the sequence_packing shape), in-bucket sort + local cumsum give each
    doc its global token offset, and each token's FIRST global position
    min-reduces through one vocabulary-bounded exchange.  The ladder is a
    driver-side searchsorted over the sorted first positions.  Duplicate
    doc_ids order by the (h, doc_id, n_tok) tie-break — deterministic on
    both engines whenever duplicates differ in length (full ties would
    need content interchangeability)."""
    from ray.data.aggregate import Min, Sum

    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets
    from hepdata_validator_ray.pipelines.sampling import _hash64

    ds = ray.data.read_parquet(seq_path, columns=["doc_id", "n_tok", "tokens"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        ds, target_rows_per_bucket=500_000, lo=8
    )
    bits = max(1, (nb - 1).bit_length())
    nb = 1 << bits
    shift = np.uint64(64 - bits)

    def hashed(t: pa.Table) -> pa.Table:
        # NULL ids coalesce to a sentinel BEFORE hashing/ordering so both
        # engines hash and sort the identical key string
        ids = t.column("doc_id").to_pandas().fillna("<NULL>").astype(str).to_numpy(dtype=object)
        h = _hash64(ids, key_fn="md5")
        col = t.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)  # ACTUAL list lengths (n_tok may lie — use truth)
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.string()),
                col,
                pa.array(h.astype(np.int64), type=pa.int64()),
                pa.array(lens, type=pa.int64()),
                pa.array((h >> shift).astype(np.int64), type=pa.int64()),
            ],
            names=["doc_id", "tokens", "h", "tok_len", BUCKET_COL],
        )

    hds = ds.map_batches(hashed, batch_format="pyarrow", batch_size=8192).materialize()

    counts = (
        hds.select_columns([BUCKET_COL, "tok_len"])
        .groupby(BUCKET_COL)
        .aggregate(Sum("tok_len", alias_name="n"))
        .to_pandas()
    )
    offs = np.zeros(nb + 1, dtype=np.int64)
    offs[counts[BUCKET_COL].to_numpy(np.int64) + 1] = counts["n"].to_numpy(np.int64)
    np.cumsum(offs, out=offs)
    base_ref = ray.put(offs[:nb])

    def first_pos(t: pa.Table) -> pa.Table:
        # zero-copy arrow path end to end: sort keys via a NARROW pandas
        # frame, reorder the table once, then every position derives from
        # repeat/cumsum arithmetic on the flattened values — no per-row
        # allocations (the sandbox charges ~1ms per fresh page, so 20k
        # tiny np.arange/concatenate calls would cost two minutes)
        base = int(ray.get(base_ref)[int(t.column(BUCKET_COL)[0].as_py())])
        keys = t.select(["h", "doc_id", "tok_len"]).to_pandas()
        order = keys.sort_values(["h", "doc_id", "tok_len"], kind="mergesort").index.to_numpy()
        t = t.take(pa.array(order))
        col = t.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.int64)[offs[0] : offs[-1]]
        lens = np.diff(offs)
        if not len(flat):
            return pa.Table.from_pydict(
                {"t": pa.array([], type=pa.int64()), "p": pa.array([], type=pa.int64())}
            )
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        doc_off = base + starts
        total = int(lens.sum())
        pos = np.repeat(doc_off - starts, lens) + np.arange(total, dtype=np.int64)
        # per-token min position within the bucket (one lexsort)
        o2 = np.lexsort((pos, flat))
        ft, fp = flat[o2], pos[o2]
        first = np.concatenate(([True], ft[1:] != ft[:-1]))
        return pa.Table.from_pydict(
            {"t": pa.array(ft[first], type=pa.int64()), "p": pa.array(fp[first], type=pa.int64())}
        )

    firsts = (
        hds.groupby(BUCKET_COL)
        .map_groups(first_pos, batch_format="pyarrow")
        .groupby("t")
        .aggregate(Min("p", alias_name="p"))
        .to_pandas()  # vocabulary-bounded
    )
    fp = np.sort(firsts["p"].to_numpy(np.int64)) if len(firsts) else np.empty(0, np.int64)
    rows = [
        {"k_pos": int(k), "n_distinct_seen": int(np.searchsorted(fp, int(k), side="left"))}
        for k in ladder
    ]
    return ray.data.from_pandas(
        pd.DataFrame(rows).astype({"k_pos": "int64", "n_distinct_seen": "int64"})
    )


def token_framing_stats(
    seq_path: str, bos_id: int = 0, eos_id: int = 1
) -> "ray.data.Dataset":
    """Sequence framing audit (the special-token placement check a packed
    training corpus needs before concatenation): per source, how many
    sequences violate the ``[BOS, ..., EOS]`` framing convention — first
    token != ``bos_id``, last token != ``eos_id``, or an EOS appearing
    STRICTLY INSIDE the sequence (which would silently split a document at
    pack time).  Output (source, n_rows, n_bad_first, n_bad_last,
    n_interior_eos); empty/NULL token lists count as bad framing on both
    ends and cannot have an interior EOS.

    One zero-copy pass, no row-scale exchange: first/last tokens are two
    gathers off the list offsets, interior-EOS rows one masked scatter-add;
    per-batch collapse into a |sources|-bounded groupby.  Reference
    analogue: the per-row structural invariants of
    hepdata-validator's data_validator (v0 checks over every row)."""
    from ray.data.aggregate import Sum

    def stats(t: pa.Table) -> pd.DataFrame:
        col = t.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.int64)[offs[0] : offs[-1]]
        src = t.column("source").to_pandas().fillna("<NULL>")
        rel = offs - offs[0]
        nonempty = lens > 0
        first = np.full(n, -1, dtype=np.int64)  # -1 is outside any vocab
        last = np.full(n, -1, dtype=np.int64)
        if len(vals):
            first[nonempty] = vals[rel[:-1][nonempty]]
            last[nonempty] = vals[rel[1:][nonempty] - 1]
        interior = np.zeros(n, dtype=bool)
        if len(vals):
            seq_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            pos = np.arange(len(vals), dtype=np.int64) - rel[:-1][seq_idx]
            inner = (vals == eos_id) & (pos > 0) & (pos < lens[seq_idx] - 1)
            hits = np.zeros(n, dtype=np.int64)
            np.add.at(hits, seq_idx[inner], 1)
            interior = hits > 0
        out = pd.DataFrame(
            {
                "source": src,
                "n_rows": np.ones(n, dtype=np.int64),
                "n_bad_first": (first != bos_id).astype(np.int64),
                "n_bad_last": (last != eos_id).astype(np.int64),
                "n_interior_eos": interior.astype(np.int64),
            }
        )
        return out.groupby("source", as_index=False, sort=False).sum()

    return (
        ray.data.read_parquet(seq_path, columns=["source", "tokens"])
        .map_batches(stats, batch_format="pyarrow", batch_size=16384)
        .groupby("source")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_bad_first", alias_name="n_bad_first"),
            Sum("n_bad_last", alias_name="n_bad_last"),
            Sum("n_interior_eos", alias_name="n_interior_eos"),
        )
    )


def footer_stats_truth_audit(seq_path: str, column: str = "n_tok") -> "ray.data.Dataset":
    """Footer-STATISTICS truthfulness audit: per file, the footer-claimed
    min/max of ``column`` (aggregated over row-group column statistics)
    against the recomputed data min/max.  A 100-TB read plan prunes row
    groups by these footer stats — a stale/corrupted footer silently turns
    pruning into wrong answers, so a validator must be able to certify
    them.  Output (file, n_rows, footer_min, footer_max, data_min,
    data_max, stats_ok); files whose footers carry no stats for the column
    report NULL footer bounds and stats_ok = 0 (untrustworthy).

    Two bounded legs: one footer read per file (a Dataset over the file
    list, zero data pages), and a column-pruned data scan whose per-batch
    (file, n, min, max) partials collapse through a |files|-bounded
    groupby; the final join is |files|-sized driver arithmetic."""
    import os

    import pyarrow.parquet as pq
    from ray.data.aggregate import Max, Min, Sum

    if os.path.isdir(seq_path):
        files = sorted(
            os.path.join(seq_path, f) for f in os.listdir(seq_path) if f.endswith(".parquet")
        )
    else:
        files = [seq_path]

    def footer_bounds(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for path in batch["path"]:
            md = pq.ParquetFile(path).metadata
            names = {md.schema.column(j).name: j for j in range(md.num_columns)}
            j = names.get(column)
            mins: list[int] = []
            maxs: list[int] = []
            if j is not None:
                for i in range(md.num_row_groups):
                    st = md.row_group(i).column(j).statistics
                    if st is not None and st.has_min_max:
                        mins.append(int(st.min))
                        maxs.append(int(st.max))
            rows.append(
                {
                    "file": os.path.basename(path),
                    "footer_min": min(mins) if mins else None,
                    "footer_max": max(maxs) if maxs else None,
                }
            )
        return pd.DataFrame(rows)

    footer = (
        ray.data.from_items([{"path": f} for f in files])
        .map_batches(footer_bounds, batch_format="pandas", batch_size=64)
        .to_pandas()  # |files|-bounded
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(file=df["path"].map(os.path.basename))
        g = df.groupby("file", as_index=False, sort=False).agg(
            n_rows=(column, "size"), data_min=(column, "min"), data_max=(column, "max")
        )
        return g.astype({"n_rows": "int64", "data_min": "int64", "data_max": "int64"})

    data = (
        ray.data.read_parquet(seq_path, columns=[column], include_paths=True)
        .map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby("file")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Min("data_min", alias_name="data_min"),
            Max("data_max", alias_name="data_max"),
        )
        .to_pandas()  # |files|-bounded
    )
    out = footer.merge(data, on="file", how="left")
    out["n_rows"] = out["n_rows"].fillna(0).astype("int64")
    ok = (
        out["footer_min"].notna()
        & out["footer_max"].notna()
        & (out["footer_min"] == out["data_min"])
        & (out["footer_max"] == out["data_max"])
    )
    out["stats_ok"] = ok.astype("int64")
    for c in ("footer_min", "footer_max", "data_min", "data_max"):
        out[c] = out[c].astype("Int64")
    return ray.data.from_pandas(
        out[["file", "n_rows", "footer_min", "footer_max", "data_min", "data_max", "stats_ok"]]
    )


def token_source_histogram(seq_path: str):
    """Shared bounded exchange for the concentration + rank-mass audits:
    the per-(source, token) occurrence histogram as a driver-side table
    (source_code, token, c) plus the sorted source list.

    Shape: a |sources|-bounded enumeration pass (per-batch distinct, no
    exchange), then ONE histogram exchange keyed on a single PACKED int64
    (source_code << 32 | token — the int-key fast path; a (string, int)
    two-column groupby over pandas-format blocks both wedges Ray 2.49's
    hash aggregator and pays the slow path), |sources|×|vocab|-bounded at
    any corpus size.  Returns (srcs, codes, tokens, counts) numpy views."""
    from ray.data.aggregate import Sum

    src_rows = (
        ray.data.read_parquet(seq_path, columns=["source"])
        .map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "source": pc.unique(
                        pc.coalesce(t["source"], pa.scalar("<NULL>", pa.string()))
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()  # ≤ |batches| × |sources| rows — tiny
    )
    srcs = sorted(src_rows["source"].unique().tolist())
    code_of = {s: i for i, s in enumerate(srcs)}
    if not srcs:
        z = np.array([], dtype=np.int64)
        return srcs, z, z, z

    def pair_counts(t: pa.Table) -> pa.Table:
        col = t.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.int64)[offs[0] : offs[-1]]
        if not len(vals):
            return pa.Table.from_pydict(
                {"pk": pa.array([], type=pa.int64()), "c": pa.array([], type=pa.int64())}
            )
        src = t.column("source").to_pandas().fillna("<NULL>")
        row_code = src.map(code_of).to_numpy(np.int64)[np.repeat(np.arange(len(lens)), lens)]
        key = row_code * (1 << 32) + vals  # token ids < 2^32 by schema
        uk, cnt = np.unique(key, return_counts=True)
        return pa.Table.from_pydict(
            {"pk": pa.array(uk, type=pa.int64()), "c": pa.array(cnt.astype(np.int64), type=pa.int64())}
        )

    # big batches on purpose: every batch emits up to |sources|x|vocab|
    # partial rows regardless of its size, so the exchange volume is
    # n_batches x 250k — 4x fewer batches is 4x less shuffle input
    pairs = (
        ray.data.read_parquet(seq_path, columns=["source", "tokens"])
        .map_batches(pair_counts, batch_format="pyarrow", batch_size=65536)
        .groupby("pk")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # |sources| x |vocab|, bounded
    )
    pk = pairs["pk"].to_numpy(np.int64)
    return srcs, pk >> 32, pk & 0xFFFFFFFF, pairs["c"].to_numpy(np.int64)


def _concentration_from_hist(srcs, codes, tokens, counts) -> pd.DataFrame:
    empty = pd.DataFrame(
        {
            "source": pd.Series(dtype="object"),
            "n_tok": pd.Series(dtype="int64"),
            "n_distinct_tokens": pd.Series(dtype="int64"),
            "sum_c2": pd.Series(dtype="int64"),
        }
    )
    if not len(codes):
        return empty
    return (
        pd.DataFrame({"source": np.array(srcs, dtype=object)[codes], "c": counts})
        .assign(one=1, c2=counts * counts)
        .groupby("source", as_index=False, sort=True)
        .agg(n_tok=("c", "sum"), n_distinct_tokens=("one", "sum"), sum_c2=("c2", "sum"))
        .astype({"n_tok": "int64", "n_distinct_tokens": "int64", "sum_c2": "int64"})
    )


def _rank_mass_from_hist(srcs, codes, tokens, counts) -> pd.DataFrame:
    empty = pd.DataFrame(
        {
            "source": pd.Series(dtype="object"),
            "n_tok": pd.Series(dtype="int64"),
            "sum_rank": pd.Series(dtype="int64"),
            "max_rank": pd.Series(dtype="int64"),
        }
    )
    if not len(codes):
        return empty
    # corpus counts per token -> dense frequency ranks (count DESC, t ASC)
    tdf = pd.DataFrame({"t": tokens, "c": counts}).groupby("t", as_index=False)["c"].sum()
    tdf = tdf.sort_values(["c", "t"], ascending=[False, True]).reset_index(drop=True)
    rank_of = pd.Series(np.arange(len(tdf), dtype=np.int64), index=tdf["t"])
    r = rank_of.loc[tokens].to_numpy(np.int64)
    df = pd.DataFrame(
        {
            "source": np.array(srcs, dtype=object)[codes],
            "n_tok": counts,
            "sum_rank": counts * r,  # Σ_t c_{s,t}·rank(t), integer exact
            "max_rank": r,
        }
    )
    return (
        df.groupby("source", as_index=False, sort=True)
        .agg(n_tok=("n_tok", "sum"), sum_rank=("sum_rank", "sum"), max_rank=("max_rank", "max"))
        .astype({"n_tok": "int64", "sum_rank": "int64", "max_rank": "int64"})
    )


def token_concentration_stats(seq_path: str) -> "ray.data.Dataset":
    """Token-CONCENTRATION audit (Simpson / collision statistic, integer
    exact): per source, (n_tok, n_distinct_tokens, sum_c2) where c are the
    per-token occurrence counts within the source and sum_c2 = Σ c² is the
    unnormalized Simpson index numerator — sum_c2/n_tok² is the probability
    two random token draws collide, the skew/degeneracy signal a
    drift-vs-reference check wants without any float entering the gate.

    One token_source_histogram exchange; the per-source collapse is driver
    arithmetic on the bounded table.  Σ c² stays in int64 below ~3·10⁹
    occurrences of one token within one source (the KS bound discipline);
    beyond that a decimal-string escape hatch applies."""
    return ray.data.from_pandas(_concentration_from_hist(*token_source_histogram(seq_path)))


def token_rank_mass_stats(seq_path: str) -> "ray.data.Dataset":
    """Vocabulary-compaction / rank-MASS audit: remap every token id to its
    dense corpus frequency rank (0-based, count DESC then token ASC — the
    id layout a vocab compaction would assign) and report per source
    (n_tok, sum_rank, max_rank).  sum_rank is the integer area under the
    source's rank-frequency curve (lower = mass concentrated in frequent
    tokens — more compressible); max_rank is the source's effective
    vocabulary depth.  sum_rank < vocab · n_tok stays in int64 up to
    ~10¹⁴ tokens per source at a 50k vocab.

    Derived ENTIRELY from the shared token_source_histogram exchange:
    Σ_positions rank(tok) ≡ Σ_t c_{s,t}·rank(t), so no second corpus pass
    and no broadcast remap table are needed — the rank join is driver
    arithmetic on the |sources|×|vocab|-bounded table."""
    return ray.data.from_pandas(_rank_mass_from_hist(*token_source_histogram(seq_path)))


def token_concentration_and_rank_mass(seq_path: str):
    """Both audits off ONE shared histogram exchange (the fused-gate path:
    two corpus passes become one)."""
    h = token_source_histogram(seq_path)
    return _concentration_from_hist(*h), _rank_mass_from_hist(*h)


#: modulus for the corpus-digest accumulator: a Mersenne prime small enough
#: that per-batch partial sums (< 2^31 · batch_size) and the exchange's sum
#: of per-batch partials (< 2^31 · n_batches) both stay far inside int64 —
#: safe to ~4·10⁹ batches ≈ 2.8·10¹⁴ rows per source at the default batch
#: size; beyond that, split the accumulator (decimal-string escape hatch).
DIGEST_MOD = 2147483647


def corpus_digest_stats(seq_path: str) -> "ray.data.Dataset":
    """Order-independent corpus CONTENT DIGEST per source — the equality
    certificate a resumable 100-TB run needs: two layouts / two replays of
    the same corpus produce identical digests, and any single-row content
    change moves its source's digest with probability 1 − 1/DIGEST_MOD.
    digest = Σ_rows (md5-hash64(doc_id | tokens) mod DIGEST_MOD) mod
    DIGEST_MOD, summed per source (plus an '<all>' roll-up), so the digest
    is invariant to row order and partitioning by construction (modular
    addition commutes).  Output (source, n_rows, digest).

    md5 is kept for DuckDB oracle parity (the dedup-family convention —
    hash64 = the first 16 hex chars, big-endian); the row strings are
    built zero-copy via one pyarrow cast + binary_join per batch, and the
    exchange carries only |sources|-sized integer partials."""
    import hashlib

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pd.DataFrame:
        col = t.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # binary_join maps a NULL list to "" (same as an EMPTY list) — mask
        # NULL lists explicitly so they digest as '<NULL>' like the SQL twin
        joined = pc.binary_join(pc.cast(col, pa.list_(pa.string())), ",")
        s = joined.to_pandas().fillna("<NULL>")
        null_rows = pc.is_null(col).to_numpy(zero_copy_only=False)
        if null_rows.any():
            s = s.mask(pd.Series(null_rows, index=s.index), "<NULL>")
        did = t.column("doc_id").to_pandas().fillna("<NULL>")
        src = t.column("source").to_pandas().fillna("<NULL>")
        n = len(s)
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5((a + "|" + b).encode()).digest()[:8], "big")
                % DIGEST_MOD
                for a, b in zip(did, s)
            ),
            dtype=np.int64,
            count=n,
        )
        df = pd.DataFrame({"source": src, "n_rows": np.ones(n, dtype=np.int64), "h": h})
        g = df.groupby("source", as_index=False, sort=False).agg(
            n_rows=("n_rows", "sum"), h=("h", "sum")
        )
        g["h"] = g["h"] % DIGEST_MOD  # keep partials small for the exchange
        return g.astype({"n_rows": "int64", "h": "int64"})

    per_src = (
        ray.data.read_parquet(seq_path, columns=["doc_id", "source", "tokens"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("source")
        .aggregate(Sum("n_rows", alias_name="n_rows"), Sum("h", alias_name="h"))
        .to_pandas()  # |sources|-bounded
    )
    per_src["digest"] = per_src["h"] % DIGEST_MOD
    allrow = pd.DataFrame(
        {
            "source": ["<all>"],
            "n_rows": [int(per_src["n_rows"].sum())],
            "digest": [int(per_src["h"].sum()) % DIGEST_MOD],
        }
    )
    out = pd.concat([per_src[["source", "n_rows", "digest"]], allrow], ignore_index=True)
    return ray.data.from_pandas(out.astype({"n_rows": "int64", "digest": "int64"}))


def snapshot_length_drift(old_path: str, new_path: str) -> "ray.data.Dataset":
    """Cross-SNAPSHOT drift as an exact integer: per source, the L1
    distance Σ_v |c_old(v) − c_new(v)| between the two snapshots' n_tok
    histograms (the total-variation numerator: TV = l1 / (n_old + n_new)
    when normalized) plus both row totals — the ingest-regression check a
    recurring pipeline runs before accepting a new crawl, gateable where
    KL cannot be because no float enters.

    One |sources|×|length-domain|-bounded histogram exchange PER SNAPSHOT
    (the ks_drift shape), then a driver-side outer merge of the two tiny
    tables.  Sources appearing in only one snapshot drift by their full
    mass."""
    from ray.data.aggregate import Count

    def hist(path: str) -> pd.DataFrame:
        return (
            ray.data.read_parquet(path, columns=["source", "n_tok"])
            .map_batches(
                lambda t: pa.Table.from_arrays(
                    [
                        pc.coalesce(t["source"], pa.scalar("<NULL>", pa.string())),
                        pc.cast(t["n_tok"], pa.int64()),
                    ],
                    names=["source", "v"],
                ),
                batch_format="pyarrow",
            )
            .groupby(["source", "v"])
            .aggregate(Count(alias_name="c"))
            .to_pandas()  # |sources| x |length domain|, bounded
        )

    ho = hist(old_path).rename(columns={"c": "co"})
    hn = hist(new_path).rename(columns={"c": "cn"})
    j = ho.merge(hn, on=["source", "v"], how="outer")
    j["co"] = j["co"].fillna(0).astype("int64")
    j["cn"] = j["cn"].fillna(0).astype("int64")
    g = (
        j.assign(ad=(j["co"] - j["cn"]).abs())
        .groupby("source", as_index=False, sort=True)
        .agg(n_old=("co", "sum"), n_new=("cn", "sum"), l1=("ad", "sum"))
        .astype({"n_old": "int64", "n_new": "int64", "l1": "int64"})
    )
    return ray.data.from_pandas(g)


def file_integrity_profile(seq_path: str) -> "ray.data.Dataset":
    """Per-FILE integrity profile: (file, n_rows, n_sources, digest) — the
    partition-grain twin of ``corpus_digest_stats``.  When the per-source
    corpus digest flags divergence, this table binary-searches WHICH file
    diverged (digest is the same order-invariant md5-parity modular sum);
    n_sources is the partitioning-homogeneity signal — a 100-TB layout
    wants source-pure files so source predicates prune at the file level,
    and any file with n_sources > 1 defeats that pruning.

    One column-pruned pass with include_paths; per-batch partials collapse
    through a |files|×|sources|-bounded (file, source) exchange; the
    per-file roll-up is driver arithmetic on that tiny table."""
    import hashlib
    import os

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pd.DataFrame:
        col = t.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        joined = pc.binary_join(pc.cast(col, pa.list_(pa.string())), ",")
        s = joined.to_pandas().fillna("<NULL>")
        null_rows = pc.is_null(col).to_numpy(zero_copy_only=False)
        if null_rows.any():
            s = s.mask(pd.Series(null_rows, index=s.index), "<NULL>")
        did = t.column("doc_id").to_pandas().fillna("<NULL>")
        src = t.column("source").to_pandas().fillna("<NULL>")
        fil = t.column("path").to_pandas().map(os.path.basename)
        n = len(s)
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5((a + "|" + b).encode()).digest()[:8], "big")
                % DIGEST_MOD
                for a, b in zip(did, s)
            ),
            dtype=np.int64,
            count=n,
        )
        g = (
            pd.DataFrame({"file": fil, "source": src, "n": np.ones(n, dtype=np.int64), "h": h})
            .groupby(["file", "source"], as_index=False, sort=False)
            .agg(n=("n", "sum"), h=("h", "sum"))
        )
        g["h"] = g["h"] % DIGEST_MOD
        return g.astype({"n": "int64", "h": "int64"})

    per = (
        ray.data.read_parquet(seq_path, columns=["doc_id", "source", "tokens"], include_paths=True)
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["file", "source"])
        .aggregate(Sum("n", alias_name="n"), Sum("h", alias_name="h"))
        .to_pandas()  # |files| x |sources|, bounded
    )
    if not len(per):
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "file": pd.Series(dtype="object"),
                    "n_rows": pd.Series(dtype="int64"),
                    "n_sources": pd.Series(dtype="int64"),
                    "digest": pd.Series(dtype="int64"),
                }
            )
        )
    g = (
        per.assign(one=1)
        .groupby("file", as_index=False, sort=True)
        .agg(n_rows=("n", "sum"), n_sources=("one", "sum"), digest=("h", "sum"))
    )
    g["digest"] = g["digest"] % DIGEST_MOD
    return ray.data.from_pandas(
        g.astype({"n_rows": "int64", "n_sources": "int64", "digest": "int64"})
    )


def ntok_mad_stats(seq_path: str) -> "ray.data.Dataset":
    """Integer-exact robust WIDTH per source: the median absolute deviation
    of n_tok under the discrete-quantile convention the repo pins
    (``quantile_disc``: the ceil(q·n)-th smallest, 1-based) — med and MAD
    both actual data values, no interpolation, so the drift/robust-stats
    family gains a width statistic that gates exactly.

    Reuses the |sources|×|length-domain| histogram exchange (the ks_drift
    shape); both medians come from cumulative counts over histogram runs in
    O(runs) driver arithmetic — the corpus is never re-scanned for the
    second (absolute-deviation) median."""
    from ray.data.aggregate import Count

    hist = (
        ray.data.read_parquet(seq_path, columns=["source", "n_tok"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["source"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(t["n_tok"], pa.int64()),
                ],
                names=["source", "v"],
            ),
            batch_format="pyarrow",
        )
        .groupby(["source", "v"])
        .aggregate(Count(alias_name="c"))
        .to_pandas()  # |sources| x |length domain|, bounded
    )
    rows = []
    for src, grp in hist.groupby("source", sort=True):
        grp = grp.sort_values("v")
        v = grp["v"].to_numpy(np.int64)
        c = grp["c"].to_numpy(np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)
        r = (n + 1) // 2  # ceil(0.5·n), 1-based disc-median rank
        med = int(v[np.searchsorted(cum, r)])
        av = np.abs(v - med)
        order = np.argsort(av, kind="stable")
        av_s, c_s = av[order], c[order]
        cum2 = np.cumsum(c_s)
        mad = int(av_s[np.searchsorted(cum2, r)])
        rows.append({"source": src, "n": n, "med": med, "mad": mad})
    if not rows:
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "source": pd.Series(dtype="object"),
                    "n": pd.Series(dtype="int64"),
                    "med": pd.Series(dtype="int64"),
                    "mad": pd.Series(dtype="int64"),
                }
            )
        )
    return ray.data.from_pandas(
        pd.DataFrame(rows).astype({"n": "int64", "med": "int64", "mad": "int64"})
    )


def token_periodicity_stats(
    seq_path: str, lags: tuple[int, ...] = (1, 2, 4, 8)
) -> "ray.data.Dataset":
    """Fixed-lag self-match audit: per (source, lag), the number of
    comparable positions (Σ max(n−lag, 0)) and the number of positions
    where ``tokens[i] == tokens[i+lag]`` — the PERIODIC-repetition
    detector.  A lag-L spike flags looping generations with period L,
    which run length (lag 1 only) and distinct-k-gram counting (period
    must fit inside one window) both under-report; the match RATE stays
    rational (two int64 sums).

    One zero-copy pass: each lag is one shifted comparison over the
    flattened values with a per-row validity mask (no k-gram
    materialization), collapsing to |sources|·|lags| partials per batch;
    the exchange key is the single string ``source|lag`` (the two-column
    groupby wedge — see token_source_histogram's note).  NULL lists
    contribute zero positions; NULL elements match NULL (IS NOT DISTINCT
    FROM, the SQL twin's convention) via an out-of-int32-range sentinel.

    Output (source, lag, n_pos, n_match)."""
    from ray.data.aggregate import Sum

    lags = tuple(int(x) for x in lags)
    if not lags or min(lags) < 1:
        raise ValueError("lags must be positive")

    _NULL_ELEM = np.int64(1) << 40  # outside int32 token range by contract

    def partial(t: pa.Table) -> pd.DataFrame:
        col = t.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offs[0]
        null_rows = pc.is_null(col).to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        if null_rows.any():
            if (lens[null_rows] != 0).any():
                raise ValueError("null token list with non-zero stored extent")
        vals_arr = col.values[offs[0] : offs[-1]]  # flattened slice of this batch
        vals = vals_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        elem_null = pc.is_null(vals_arr).to_numpy(zero_copy_only=False)
        if elem_null.any():
            vals = np.where(elem_null, _NULL_ELEM, vals)
        src = t.column("source").to_pandas().fillna("<NULL>").astype(str)
        codes, uniq = pd.factorize(src)
        nsrc = len(uniq)
        seq_codes = np.repeat(codes.astype(np.int64), lens)
        pos_in_row = np.arange(len(vals), dtype=np.int64) - np.repeat(offs[:-1] - base, lens)
        lens_rep = np.repeat(lens, lens)
        out_key: list[str] = []
        out_pos: list[int] = []
        out_match: list[int] = []
        for lag in lags:
            npos_per_src = np.bincount(
                codes, weights=np.maximum(lens - lag, 0), minlength=nsrc
            ).astype(np.int64)
            if len(vals) > lag:
                valid = pos_in_row[: len(vals) - lag] < lens_rep[: len(vals) - lag] - lag
                eq = vals[lag:] == vals[:-lag]
                hit = valid & eq
                nmatch_per_src = np.bincount(
                    seq_codes[: len(vals) - lag][hit], minlength=nsrc
                ).astype(np.int64)
            else:
                nmatch_per_src = np.zeros(nsrc, dtype=np.int64)
            out_key.extend(f"{s}|{lag}" for s in uniq)
            out_pos.extend(npos_per_src.tolist())
            out_match.extend(nmatch_per_src.tolist())
        return pd.DataFrame(
            {
                "key": pd.Series(out_key, dtype=object),
                "n_pos": pd.Series(out_pos, dtype="int64"),
                "n_match": pd.Series(out_match, dtype="int64"),
            }
        )

    agg = (
        ray.data.read_parquet(seq_path, columns=["source", "tokens"])
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("key")
        .aggregate(Sum("n_pos", alias_name="n_pos"), Sum("n_match", alias_name="n_match"))
    )

    def finale(t: pa.Table) -> pa.Table:
        key = t["key"].to_pandas()
        sp = key.str.rsplit("|", n=1)
        return pa.table(
            {
                "source": pa.array(sp.str[0], pa.string()),
                "lag": pa.array(sp.str[1].astype(np.int64), pa.int64()),
                "n_pos": t["n_pos"].cast(pa.int64()),
                "n_match": t["n_match"].cast(pa.int64()),
            }
        )

    return agg.map_batches(finale, batch_format="pyarrow")


def vocab_churn_stats(old_path: str, new_path: str) -> "ray.data.Dataset":
    """Cross-snapshot VOCABULARY churn per source: distinct tokens present
    in each snapshot, gained (new-only) and lost (old-only) — the
    content-level companion to ``snapshot_length_drift`` (which sees only
    length histograms): a tokenizer change, an encoding regression or a
    filtering change shows up here as churn even when the length
    distribution is unmoved.

    One pass per snapshot emits batch-local DISTINCT (source, token) pairs
    tagged with the snapshot bit; presence merges in ONE
    |sources|×|vocab|-bounded groupby via two Max aggregates (duplicate
    partials across batches/snapshots are idempotent under Max — no
    pre-exchange dedup spent); the finale is a |sources|-bounded count.
    NULL token elements are dropped on both engines (the FULL OUTER join
    twin cannot key on NULL).

    Output (source, n_old_vocab, n_new_vocab, n_gained, n_lost)."""
    from ray.data.aggregate import Max, Sum

    def pairs(path: str, col_flag: str):
        def partial(t: pa.Table) -> pa.Table:
            col = t.column("tokens")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            vals_arr = col.values[offs[0] : offs[-1]]
            vals = vals_arr.to_numpy(zero_copy_only=False).astype(np.int64)
            keep = ~pc.is_null(vals_arr).to_numpy(zero_copy_only=False)
            src = t.column("source").to_pandas().fillna("<NULL>").astype(str)
            codes, uniq = pd.factorize(src)
            lens = np.diff(offs)
            seq_codes = np.repeat(codes.astype(np.int64), lens)[keep]
            vals = vals[keep]
            packed = seq_codes * (np.int64(1) << 33) + vals  # token < 2^33 contract
            if len(vals) and not ((vals >= 0) & (vals < (np.int64(1) << 33))).all():
                raise ValueError("token id out of the [0, 2^33) packing contract")
            up = np.unique(packed)
            out = pa.table(
                {
                    "source": pa.array(
                        np.asarray(uniq, dtype=object)[(up >> 33).astype(np.int64)],
                        pa.string(),
                    ),
                    "t": pa.array(up & ((np.int64(1) << 33) - 1), pa.int64()),
                    "is_old": pa.array(
                        np.full(len(up), 1 if col_flag == "old" else 0, dtype=np.int64),
                        pa.int64(),
                    ),
                    "is_new": pa.array(
                        np.full(len(up), 1 if col_flag == "new" else 0, dtype=np.int64),
                        pa.int64(),
                    ),
                }
            )
            return out

        return ray.data.read_parquet(path, columns=["source", "tokens"]).map_batches(
            partial, batch_format="pyarrow", batch_size=16384
        )

    merged = (
        pairs(old_path, "old")
        .union(pairs(new_path, "new"))
        .groupby(["source", "t"])
        .aggregate(Max("is_old", alias_name="is_old"), Max("is_new", alias_name="is_new"))
    )

    def finale_partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "source": t["source"].to_pandas(),
                "o": t["is_old"].to_numpy(zero_copy_only=False),
                "n": t["is_new"].to_numpy(zero_copy_only=False),
            }
        )
        df["gained"] = (1 - df["o"]) * df["n"]
        df["lost"] = (1 - df["n"]) * df["o"]
        g = df.groupby("source", as_index=False, sort=False).agg(
            n_old_vocab=("o", "sum"),
            n_new_vocab=("n", "sum"),
            n_gained=("gained", "sum"),
            n_lost=("lost", "sum"),
        )
        for c in ("n_old_vocab", "n_new_vocab", "n_gained", "n_lost"):
            g[c] = g[c].astype("int64")
        return g

    return (
        merged.map_batches(finale_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_old_vocab", alias_name="n_old_vocab"),
            Sum("n_new_vocab", alias_name="n_new_vocab"),
            Sum("n_gained", alias_name="n_gained"),
            Sum("n_lost", alias_name="n_lost"),
        )
    )


def compute_cost_forecast(seq_path: str, max_len: int = 1024) -> "ray.data.Dataset":
    """Training compute forecast per source, all int64: sequence count,
    token total, Σ n_tok² (the quadratic-attention cost proxy — two
    corpora with equal token totals can differ 100× here), sequences over
    ``max_len`` and the tokens a truncation at ``max_len`` would discard.
    The numbers a batch-size / packing / GPU-hour plan is made from, as
    one cheap metadata-grade pass (n_tok column only, tokens never read).

    Per-batch bincount collapse over factorized sources → |sources|
    exchange.  NULL n_tok counts as 0 (the shared coalesce convention).

    Output (source, n_seqs, sum_tok, sum_tok_sq, n_over, trunc_loss)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pd.DataFrame:
        src = t.column("source").to_pandas().fillna("<NULL>").astype(str)
        nt = t.column("n_tok").to_pandas().fillna(0).to_numpy(dtype=np.int64)
        codes, uniq = pd.factorize(src)
        k = len(uniq)
        over = nt > max_len

        def _isum(w: np.ndarray) -> np.ndarray:
            # integer scatter-add: no float64 accumulator (n_tok² alone can
            # exceed 2^53 under the int32 column contract — ADVICE r3)
            acc = np.zeros(k, dtype=np.int64)
            np.add.at(acc, codes, w)
            return acc

        return pd.DataFrame(
            {
                "source": np.asarray(uniq, dtype=object),
                "n_seqs": np.bincount(codes, minlength=k).astype(np.int64),
                "sum_tok": _isum(nt),
                "sum_tok_sq": _isum(nt * nt),
                "n_over": _isum(over.astype(np.int64)),
                "trunc_loss": _isum(np.where(over, nt - max_len, 0)),
            }
        )

    return (
        ray.data.read_parquet(seq_path, columns=["source", "n_tok"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_seqs", alias_name="n_seqs"),
            Sum("sum_tok", alias_name="sum_tok"),
            Sum("sum_tok_sq", alias_name="sum_tok_sq"),
            Sum("n_over", alias_name="n_over"),
            Sum("trunc_loss", alias_name="trunc_loss"),
        )
    )


def rowgroup_pruning_audit(
    seq_path: str, lo: int = 64, hi: int = 256, column: str = "n_tok"
) -> "ray.data.Dataset":
    """Row-group PRUNING effectiveness audit for the predicate
    ``lo <= column < hi``: per file, how many row groups a footer-driven
    read plan provably skips (stats-complete groups whose [min, max] lies
    entirely outside the window), how many rows those groups hold (the
    I/O the plan saves), and the EXACT selected-row count from the data —
    the go/no-go measurement behind the "prune at the read" doctrine: if
    n_rgs_pruned ≈ 0 on a hot predicate, the layout needs re-sorting (see
    synth.ensure_rowgrouped_sequences_parquet's tight-stats layout).
    Groups without column statistics are never prunable (the conservative
    read-plan rule; footer_stats_truth_audit certifies the stats
    themselves).  NULL values never match the predicate, so stats pruning
    is sound even for groups containing NULLs.

    Two bounded legs (the footer_stats_truth shape): one footer read per
    file (zero data pages), and one column-pruned scan collapsing to
    |files| selected-count partials.

    Output (file, n_rgs, n_rgs_pruned, n_rows_pruned, n_selected)."""
    import os

    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    if os.path.isdir(seq_path):
        files = sorted(
            os.path.join(seq_path, f) for f in os.listdir(seq_path) if f.endswith(".parquet")
        )
    else:
        files = [seq_path]

    def footer_prune(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for path in batch["path"]:
            md = pq.ParquetFile(path).metadata
            names = {md.schema.column(j).name: j for j in range(md.num_columns)}
            j = names.get(column)
            n_rgs = md.num_row_groups
            n_pruned = 0
            rows_pruned = 0
            for i in range(md.num_row_groups):
                if j is None:
                    continue
                st = md.row_group(i).column(j).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats → never prunable
                if int(st.max) < lo or int(st.min) >= hi:
                    n_pruned += 1
                    rows_pruned += md.row_group(i).num_rows
            rows.append((os.path.basename(path), n_rgs, n_pruned, rows_pruned))
        return pd.DataFrame(
            rows, columns=["file", "n_rgs", "n_rgs_pruned", "n_rows_pruned"]
        ).astype({"n_rgs": "int64", "n_rgs_pruned": "int64", "n_rows_pruned": "int64"})

    footer = (
        ray.data.from_pandas(pd.DataFrame({"path": files}))
        .map_batches(footer_prune, batch_format="pandas", batch_size=4)
        .to_pandas()  # |files|-bounded
    )

    def sel_partial(t: pa.Table) -> pd.DataFrame:
        fn = t.column("path").to_pandas().map(os.path.basename)
        v = t.column(column).to_pandas()
        hitv = ((v >= lo) & (v < hi)).fillna(False).to_numpy(dtype=bool)
        df = pd.DataFrame({"file": fn, "n_selected": hitv.astype(np.int64)})
        return df.groupby("file", as_index=False, sort=False).agg(
            n_selected=("n_selected", "sum")
        )

    sel = (
        ray.data.read_parquet(files, columns=[column], include_paths=True)
        .map_batches(sel_partial, batch_format="pyarrow")
        .groupby("file")
        .aggregate(Sum("n_selected", alias_name="n_selected"))
        .to_pandas()  # |files|-bounded
    )
    out = footer.merge(sel, on="file", how="left")
    out["n_selected"] = out["n_selected"].fillna(0).astype("int64")
    return ray.data.from_pandas(out.sort_values("file").reset_index(drop=True))


def ntok_tdigest_quantiles(
    seq_path: str, quantiles: tuple[float, ...] = (0.5, 0.95, 0.99)
) -> pd.DataFrame:
    """Per-source n_tok quantile ESTIMATES via distributed mergeable
    t-digests (the north-star's named sketch; ``v_ntok_quantiles`` stays
    the exact path — this is the unbounded-domain/approximate companion
    whose state is O(delta) per source regardless of the value domain).

    Physical plan: each batch folds its rows into per-source partial
    digests and emits them as (source, means, weights) rows — bounded at
    delta centroids each; one |sources|-keyed ``map_groups`` merges a
    source's partials (Python over |partials| digest merges, NOT over
    rows) and reads the quantile ladder off the merged digest.

    Output (source, q_x100, est) — rows-only (approximate by design;
    accuracy pinned against exact order stats in tests/test_sketches.py
    and tests/test_round4.py)."""
    from hepdata_validator_ray.sketches import TDigest

    def partial(t: pa.Table) -> pd.DataFrame:
        src = t.column("source").to_pandas().fillna("<NULL>").astype(str)
        nt = t.column("n_tok").to_pandas().fillna(0).to_numpy(dtype=np.int64)
        codes, uniq = pd.factorize(src)
        rows = []
        for c, s in enumerate(uniq):
            td = TDigest()
            td.add(nt[codes == c].astype(np.float64))
            td._compress()
            rows.append((s, td.means.tolist(), td.weights.tolist(), td.min, td.max))
        return pd.DataFrame(rows, columns=["source", "means", "weights", "mn", "mx"])

    def merge_group(df: pd.DataFrame) -> pd.DataFrame:
        td = TDigest()
        for means, weights, mn, mx in zip(df["means"], df["weights"], df["mn"], df["mx"]):
            part = TDigest()
            part.means = np.asarray(list(means), dtype=np.float64)
            part.weights = np.asarray(list(weights), dtype=np.int64)
            part.total = int(part.weights.sum())
            part.min = float(mn)
            part.max = float(mx)
            td = td.merge(part)
        src = df["source"].iloc[0]
        return pd.DataFrame(
            {
                "source": [src] * len(quantiles),
                "q_x100": [int(round(q * 100)) for q in quantiles],
                "est": [float(td.quantile(q)) for q in quantiles],
            }
        )

    return (
        ray.data.read_parquet(seq_path, columns=["source", "n_tok"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(merge_group, batch_format="pandas")
        .to_pandas()  # |sources|·|quantiles| — bounded
        .sort_values(["source", "q_x100"])
        .reset_index(drop=True)
    )


def schema_fingerprint_audit(seq_path: str) -> "ray.data.Dataset":
    """Per-file SCHEMA fingerprint: leaf-column count and an md5-parity
    digest over the sorted ``name:physical_type`` leaf set — the schema
    DRIFT detector for a corpus assembled from many crawls/writers, where
    one file silently written with a widened type or a renamed column
    poisons every downstream reader.  Two files agree on the fingerprint
    iff their leaf names and parquet physical types agree (the digest is
    ORDER-insensitive by design — lexicographic sort on both engines —
    so column reordering alone does not flag; name/type changes do).

    One footer read per file, zero data pages (the playout/ftruth shape);
    output is |files|-bounded.  Physical types are the parquet spellings
    ('INT64', 'BYTE_ARRAY', ...) shared verbatim with DuckDB's
    parquet_schema, which is what makes the SQL twin hash-exact.

    Output (file, n_leaves, schema_digest)."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(seq_path):
        files = sorted(
            os.path.join(seq_path, f) for f in os.listdir(seq_path) if f.endswith(".parquet")
        )
    else:
        files = [seq_path]

    def fingerprint(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for path in batch["path"]:
            sch = pq.ParquetFile(path).metadata.schema
            leaves = sorted(
                f"{sch.column(i).name}:{sch.column(i).physical_type}"
                for i in range(len(sch.names))
            )
            dig = int(hashlib.md5("|".join(leaves).encode()).hexdigest()[:8], 16)
            rows.append((os.path.basename(path), len(leaves), dig))
        return pd.DataFrame(rows, columns=["file", "n_leaves", "schema_digest"]).astype(
            {"n_leaves": "int64", "schema_digest": "int64"}
        )

    return ray.data.from_pandas(pd.DataFrame({"path": files})).map_batches(
        fingerprint, batch_format="pandas", batch_size=16
    )


def file_order_audit(seq_path: str) -> "ray.data.Dataset":
    """Within-file WRITE-ORDER audit: per file, how many adjacent pairs of
    the doc_id-embedded counters DESCEND when read in physical row order —
    zero for an append-ordered partition, large for a scrambled/re-sorted
    one.  Write order is real metadata a 10^12-row pipeline depends on
    (append-only ingest invariants, binary-search-by-counter readers,
    delta encoders) yet no column records it; this audit makes it a
    checkable verdict.  Rows whose doc_id has no numeric suffix (NULL /
    bad format) are skipped entirely — adjacency is over the VALID
    subsequence (the convention the SQL twin shares via TRY_CAST).

    Physical row order is only observable within one reader, so this is a
    one-WHOLE-FILE-task source (the file-fingerprint shape; a split read
    would need seam stitching and an order guarantee Ray does not make).
    The SQL twin orders by DuckDB's ``file_row_number``.

    Output (file, n_valid, n_desc)."""
    import os
    import re

    import pyarrow.parquet as pq

    if os.path.isdir(seq_path):
        files = sorted(
            os.path.join(seq_path, f) for f in os.listdir(seq_path) if f.endswith(".parquet")
        )
    else:
        files = [seq_path]

    suffix = re.compile(r"(\d+)$")

    def audit(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for path in batch["path"]:
            ids = pq.read_table(path, columns=["doc_id"]).column("doc_id").to_pandas()
            ctr = ids.str.extract(suffix, expand=False).astype("float64").to_numpy()
            valid = ctr[~np.isnan(ctr)].astype(np.int64)
            n_desc = int((np.diff(valid) < 0).sum()) if len(valid) > 1 else 0
            rows.append((os.path.basename(path), len(valid), n_desc))
        return pd.DataFrame(rows, columns=["file", "n_valid", "n_desc"]).astype(
            {"n_valid": "int64", "n_desc": "int64"}
        )

    return ray.data.from_pandas(pd.DataFrame({"path": files})).map_batches(
        audit, batch_format="pandas", batch_size=4
    )


def file_range_overlap_audit(seq_path: str) -> "ray.data.Dataset":
    """Cross-file KEY-RANGE audit: each file's [min, max] span of the
    doc_id-embedded counter, plus how many OTHER files' spans it overlaps
    — zero everywhere for range-sharded output (each partition owns a
    disjoint counter interval, the layout that lets a reader bisect by
    key and a compactor merge without re-sorting); any positive count
    says the partitioning key promise is broken for that file.  Rows
    without a numeric suffix are ignored (the file_order_audit
    convention); files with NO valid counters report NULL bounds and
    overlap 0.

    One column-pruned pass collapses to |files|-sized (min, max)
    partials; the pairwise overlap count is a driver-side interval sweep
    over the tiny |files| table (O(F log F)), never a row-scale join.

    Output (file, ctr_min, ctr_max, n_overlaps)."""
    import os
    import re

    from ray.data.aggregate import Max, Min

    suffix = re.compile(r"(\d+)$")

    def partial(t: pa.Table) -> pd.DataFrame:
        fn = t.column("path").to_pandas().map(os.path.basename)
        ids = t.column("doc_id").to_pandas()
        ctr = ids.str.extract(suffix, expand=False).astype("float64")
        df = pd.DataFrame({"file": fn, "c": ctr})
        df = df.dropna(subset=["c"])
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "file": pd.Series(dtype=object),
                    "mn": pd.Series(dtype="int64"),
                    "mx": pd.Series(dtype="int64"),
                }
            )
        g = df.groupby("file", as_index=False, sort=False).agg(mn=("c", "min"), mx=("c", "max"))
        return g.astype({"mn": "int64", "mx": "int64"})

    import os as _os

    if _os.path.isdir(seq_path):
        files = sorted(
            _os.path.join(seq_path, f)
            for f in _os.listdir(seq_path)
            if f.endswith(".parquet")
        )
    else:
        files = [seq_path]

    bounds = (
        ray.data.read_parquet(files, columns=["doc_id"], include_paths=True)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("file")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .to_pandas()  # |files|-bounded
    )
    all_files = pd.DataFrame({"file": [_os.path.basename(f) for f in files]})
    out = all_files.merge(bounds, on="file", how="left").sort_values("file").reset_index(drop=True)
    # driver-side interval sweep: overlap(a, b) ⟺ a.mn <= b.mx ∧ b.mn <= a.mx
    spans = out.dropna(subset=["mn"])
    n_overlaps = []
    for _, row in out.iterrows():
        if pd.isna(row["mn"]):
            n_overlaps.append(0)
            continue
        others = spans[spans["file"] != row["file"]]
        n_overlaps.append(
            int(((others["mn"] <= row["mx"]) & (row["mn"] <= others["mx"])).sum())
        )
    out["n_overlaps"] = pd.Series(n_overlaps, dtype="int64")
    # −1 sentinel bounds for counter-less files: keeps the output
    # NULL-free int64 (hash-stable; the SQL twin coalesces identically)
    out["ctr_min"] = out["mn"].fillna(-1).astype("int64")
    out["ctr_max"] = out["mx"].fillna(-1).astype("int64")
    return ray.data.from_pandas(out[["file", "ctr_min", "ctr_max", "n_overlaps"]])


def file_compaction_plan(seq_path: str) -> "ray.data.Dataset":
    """COMPACTION plan from the file counter spans: files whose key ranges
    transitively overlap must merge together (a sorted-merge compactor
    cannot split an overlap), so the merge groups are the connected
    components of the interval graph — computed by the classic
    gaps-and-islands sweep (sort by span start; a new group starts exactly
    when the running max of span ends stays below the next start).  Files
    without counters are each their own singleton group (nothing to
    merge).  The sweep is driver-side over the |files|-bounded span table
    (the range-overlap audit's shape); group ids are 0-based in
    (ctr_min, file) sweep order — deterministic, layout-independent.

    Output (file, merge_group, group_size)."""
    spans = file_range_overlap_audit(seq_path).to_pandas()  # |files|-bounded
    spans = spans.sort_values(["ctr_min", "file"]).reset_index(drop=True)
    group = np.zeros(len(spans), dtype=np.int64)
    gid = -1
    run_max = None
    for i, row in spans.iterrows():
        if int(row["ctr_min"]) == -1:
            gid += 1  # counter-less: singleton group
            group[i] = gid
            continue
        if run_max is None or int(row["ctr_min"]) > run_max:
            gid += 1
            run_max = int(row["ctr_max"])
        else:
            run_max = max(run_max, int(row["ctr_max"]))
        group[i] = gid
    spans["merge_group"] = group
    sizes = spans.groupby("merge_group")["file"].transform("size").astype("int64")
    spans["group_size"] = sizes
    out = spans[["file", "merge_group", "group_size"]].sort_values("file").reset_index(drop=True)
    return ray.data.from_pandas(out)


def winsorized_token_stats(seq_path: str, q: float = 0.99) -> "ray.data.Dataset":
    """Per-source winsorized token totals: raw sum, the sum with n_tok
    capped at the source's discrete q-quantile, and how many rows the cap
    touched — the heavy-tail-robust budget a mixture planner uses when a
    few pathological documents would otherwise own a source's token count.

    Everything comes from ONE |sources|×|length-domain| histogram exchange
    (the ks_drift / ntok_mad shape): the cap is the value at 1-based rank
    ceil(q·n) of the cumulative counts (the pinned quantile_disc
    convention, q·n in the same IEEE double on both engines), and the
    winsorized sum is Σ min(v, cap)·c over the SAME histogram — the corpus
    is never re-scanned after the cap is known, where a naive two-pass
    plan would pay a second 100-TB read.

    Output (source, n, sum_tok, wsum_tok, n_capped), all int64."""
    from ray.data.aggregate import Count

    hist = (
        ray.data.read_parquet(seq_path, columns=["source", "n_tok"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["source"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(t["n_tok"], pa.int64()),
                ],
                names=["source", "v"],
            ).filter(pc.is_valid(pc.cast(t["n_tok"], pa.int64()))),
            batch_format="pyarrow",
        )
        .groupby(["source", "v"])
        .aggregate(Count(alias_name="c"))
        .to_pandas()  # |sources| × |length domain|, bounded
    )
    rows = []
    for src, grp in hist.groupby("source", sort=True):
        grp = grp.sort_values("v")
        v = grp["v"].to_numpy(np.int64)
        c = grp["c"].to_numpy(np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)
        rank = max(int(np.ceil(q * n)), 1)  # 1-based disc-quantile rank
        cap = np.int64(v[np.searchsorted(cum, rank)])
        over = v > cap
        rows.append(
            {
                "source": src,
                "n": n,
                "sum_tok": int((v * c).sum()),
                "wsum_tok": int((np.minimum(v, cap) * c).sum()),
                "n_capped": int(c[over].sum()),
            }
        )
    if not rows:
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "source": pd.Series(dtype="object"),
                    "n": pd.Series(dtype="int64"),
                    "sum_tok": pd.Series(dtype="int64"),
                    "wsum_tok": pd.Series(dtype="int64"),
                    "n_capped": pd.Series(dtype="int64"),
                }
            )
        )
    return ray.data.from_pandas(
        pd.DataFrame(rows).astype(
            {"n": "int64", "sum_tok": "int64", "wsum_tok": "int64", "n_capped": "int64"}
        )
    )


def snapshot_psi(old_path: str, new_path: str, deciles: int = 9) -> "ray.data.Dataset":
    """Population Stability Index between two snapshots' per-source n_tok
    distributions — the industry drift gate (PSI < 0.1 stable, > 0.25
    action) that complements the exact-integer L1 (`snapshot_length_drift`)
    and the KS / chi² legs with the score operators actually page on.

    Bucketing follows the PSI convention: bin edges are the OLD (reference)
    snapshot's per-source deciles — disc-quantiles at q = 1/10 .. 9/10
    under the pinned 1-based-rank-ceil(q·n) convention (== DuckDB
    quantile_disc, verified across sizes); bucket(v) = #edges strictly
    below v, so buckets cover ±∞ and every row lands somewhere.  Sources
    with no OLD rows have no reference bins and are excluded (the vocab
    churn op reports them).  A bucket empty on exactly one side would make
    a PSI term infinite — those are EXCLUDED from the sum and surfaced in
    ``n_zero_buckets`` (refusal-made-visible, never a silent epsilon).

    psi is the ONE float: per bucket ``(pn − po) * ln(pn / po)`` with
    pn = cn/n_new, po = co/n_old — spelled identically in the SQL twin
    (the TfIdf ln-parity convention; the 6-sig-digit gate hash absorbs
    sum-order ulps).

    Scale shape: everything derives from the two |sources|×|length-domain|
    histogram exchanges (the snapshot_length_drift shape) — bucketing is
    driver arithmetic over the bounded histograms, weighted by their
    counts; the corpora are never re-read.

    Output (source, n_old, n_new, n_zero_buckets, psi)."""
    from ray.data.aggregate import Count

    def hist(path: str) -> pd.DataFrame:
        return (
            ray.data.read_parquet(path, columns=["source", "n_tok"])
            .map_batches(
                lambda t: pa.Table.from_arrays(
                    [
                        pc.coalesce(t["source"], pa.scalar("<NULL>", pa.string())),
                        pc.cast(t["n_tok"], pa.int64()),
                    ],
                    names=["source", "v"],
                ).filter(pc.is_valid(pc.cast(t["n_tok"], pa.int64()))),
                batch_format="pyarrow",
            )
            .groupby(["source", "v"])
            .aggregate(Count(alias_name="c"))
            .to_pandas()  # |sources| × |length domain|, bounded
        )

    ho = hist(old_path)
    hn = hist(new_path)
    out_rows = []
    qs = [(i + 1) / 10 for i in range(deciles)]
    for src, grp in ho.groupby("source", sort=True):
        grp = grp.sort_values("v")
        v = grp["v"].to_numpy(np.int64)
        c = grp["c"].to_numpy(np.int64)
        n_old = int(c.sum())
        cum = np.cumsum(c)
        edges = np.array(
            [v[np.searchsorted(cum, max(int(np.ceil(q * n_old)), 1))] for q in qs],
            dtype=np.int64,
        )
        # bucket(v) = #edges strictly below v: searchsorted(side='left')
        # returns the index of the first edge >= v == the count of edges
        # < v, duplicates-safe — the same count the SQL twin's
        # list_filter(edges, e -> v > e) yields; weighted by the histogram
        # count, buckets 0..deciles cover the whole line
        co = np.zeros(deciles + 1, dtype=np.int64)
        np.add.at(co, np.searchsorted(edges, v, side="left"), c)
        gn = hn[hn["source"] == src]
        cn = np.zeros(deciles + 1, dtype=np.int64)
        if len(gn):
            nv = gn["v"].to_numpy(np.int64)
            nc = gn["c"].to_numpy(np.int64)
            np.add.at(cn, np.searchsorted(edges, nv, side="left"), nc)
        n_new = int(cn.sum())
        both = (co > 0) & (cn > 0)
        n_zero = int(((co > 0) != (cn > 0)).sum())
        psi = 0.0
        if n_new > 0 and both.any():
            po = co[both] / n_old
            pn = cn[both] / n_new
            psi = float(np.sum((pn - po) * np.log(pn / po)))
        out_rows.append(
            {
                "source": src,
                "n_old": n_old,
                "n_new": n_new,
                "n_zero_buckets": n_zero,
                "psi": psi,
            }
        )
    if not out_rows:
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "source": pd.Series(dtype="object"),
                    "n_old": pd.Series(dtype="int64"),
                    "n_new": pd.Series(dtype="int64"),
                    "n_zero_buckets": pd.Series(dtype="int64"),
                    "psi": pd.Series(dtype="float64"),
                }
            )
        )
    return ray.data.from_pandas(
        pd.DataFrame(out_rows).astype(
            {"n_old": "int64", "n_new": "int64", "n_zero_buckets": "int64", "psi": "float64"}
        )
    )


def bigram_pmi_top(
    seq_path: str, k: int = 50, min_count: int = 2, vocab_size: int | None = None
) -> "ray.data.Dataset":
    """Top-k token bigrams by pointwise mutual information — the
    association rescoring that separates COLLOCATIONS from merely-frequent
    pairs (raw top-bigrams is dominated by frequent-token products;
    PMI = ln(p(x,y) / (p(x)·p(y))) surfaces pairs that co-occur far above
    chance — the phrase-mining / tokenizer-merge-candidate signal).

    ONE corpus pass, ONE tagged exchange: the per-batch partial emits
    bigram keys (t1·V + t2) AND unigram keys offset into V² + t, so both
    count tables ride the same bucketed sum (valid token ids only, pairs
    never cross row boundaries — the token_bigrams_top conventions).  The
    unigram marginals are vocab-bounded → broadcast as ONE int64 array via
    ``ray.put``; totals are aggregates of the collapsed counts table; the
    PMI stage then maps over the DISTRIBUTED bigram rows (vocab²-bounded
    but corpus-shaped — never driver-resident) with per-block partial
    top-k before the global (pmi DESC, key) sort of ≤ k·num_blocks rows.

    pmi is the ONE float — ln((cnt/N_bi) / ((c_x/N_uni)·(c_y/N_uni))) —
    spelled identically in the SQL twin (ln-parity convention); the
    ``min_count`` filter and both totals are exact integers.  Output
    (t1, t2, cnt, pmi), exactly k rows under the strict deterministic
    LIMIT."""
    from ray.data.aggregate import Sum

    from hepdata_validator_ray.checks.base import CheckContext
    from hepdata_validator_ray.ops import bucketed_aggregate, sum_counts_combine

    V = vocab_size or CheckContext().vocab_size
    V2 = V * V

    def partial(batch: pa.Table) -> pa.Table:
        view = prepare_view(batch)
        flat, offsets, lens = view["flat"], view["offsets"], view["lens"]
        t = flat.astype(np.int64)
        tok_valid = (t >= 0) & (t < V)
        keys = [np.int64(V2) + t[tok_valid]]
        cnts = []
        n = len(flat)
        if n >= 2:
            t1, t2 = t[:-1], t[1:]
            last_positions = offsets[1:][lens > 0] - 1
            valid = np.ones(n - 1, dtype=bool)
            valid[last_positions[last_positions < n - 1]] = False
            valid &= tok_valid[:-1] & tok_valid[1:]
            keys.append(t1[valid] * np.int64(V) + t2[valid])
        allk = np.concatenate(keys) if keys else np.empty(0, np.int64)
        uniq, cnt = np.unique(allk, return_counts=True)
        return pa.Table.from_pydict(
            {"key": pa.array(uniq, type=pa.int64()), "cnt": pa.array(cnt, type=pa.int64())}
        )

    counts = bucketed_aggregate(
        ray.data.read_parquet(seq_path, columns=["tokens"]), "key", partial, sum_counts_combine("key")
    ).materialize()

    uni = counts.filter(expr=f"key >= {V2}").to_pandas()  # vocab-bounded
    uarr = np.zeros(V, dtype=np.int64)
    if len(uni):
        uarr[(uni["key"].to_numpy(np.int64) - V2)] = uni["cnt"].to_numpy(np.int64)
    nuni = int(uarr.sum())
    bi = counts.filter(expr=f"key < {V2}")
    agg = bi.aggregate(Sum("cnt", alias_name="nbi"))
    nbi = int(agg["nbi"] or 0)
    uref = ray.put(uarr)

    def pmi_block(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        keep = cnt >= min_count
        key, cnt = key[keep], cnt[keep]
        if not len(key):
            return pa.table(
                {"key": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64()), "pmi": pa.array([], pa.float64())}
            )
        u = ray.get(uref)
        cx = u[key // V]
        cy = u[key % V]
        pmi = np.log((cnt / nbi) / ((cx / nuni) * (cy / nuni)))
        out = pa.table(
            {"key": pa.array(key, pa.int64()), "cnt": pa.array(cnt, pa.int64()), "pmi": pa.array(pmi, pa.float64())}
        )
        idx = pc.sort_indices(out, sort_keys=[("pmi", "descending"), ("key", "ascending")])
        return out.take(idx[: min(k, out.num_rows)])

    def decode(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "t1": pa.array(key // V, pa.int64()),
                "t2": pa.array(key % V, pa.int64()),
                "cnt": t["cnt"],
                "pmi": t["pmi"],
            }
        )

    return (
        bi.map_batches(pmi_block, batch_format="pyarrow")
        .sort(["pmi", "key"], descending=[True, False])
        .limit(k)
        .map_batches(decode, batch_format="pyarrow")
    )


def token_position_entropy(
    seq_path: str, bucket_len: int = 64, vocab_size: int | None = None
) -> pd.DataFrame:
    """Token-distribution entropy per POSITION bucket (positions 0..63,
    64..127, …) — the positional-artifact detector: a template/BOS token
    pinned at position 0, boilerplate headers, or packing bugs show up as
    an entropy CRATER in early buckets while healthy text is near-flat.

    Per batch the flat token buffer and Arrow offsets give every token its
    within-row position vectorized (arange minus repeated segment starts);
    counts collapse per packed (bucket·V + token) key through ONE bounded
    exchange (≤ ⌈max_len/bucket_len⌉ · V rows however large the corpus).
    Entropy is the one float: H = −Σ (c/n)·ln(c/n) per bucket, spelled
    identically in the SQL twin (ln-parity convention; 6-sig-digit gate
    hash absorbs sum-order ulps).  Invalid token ids are excluded by the
    token_bigrams_top convention (mirrored WHERE).

    Output (bucket, n, n_distinct, entropy) over the tiny bucket table."""
    from hepdata_validator_ray.checks.base import CheckContext
    from hepdata_validator_ray.ops import bucketed_aggregate, sum_counts_combine

    V = vocab_size or CheckContext().vocab_size

    def partial(batch: pa.Table) -> pa.Table:
        view = prepare_view(batch)
        flat, offsets, lens = view["flat"], view["offsets"], view["lens"]
        t = flat.astype(np.int64)
        if not len(t):
            return pa.Table.from_pydict(
                {"key": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        starts = offsets[:-1][lens > 0]
        seg_len = np.diff(np.r_[starts, offsets[-1]]) if len(starts) else np.empty(0, np.int64)
        pos = np.arange(len(t), dtype=np.int64) - np.repeat(starts, seg_len)
        ok = (t >= 0) & (t < V)
        key = (pos[ok] // bucket_len) * np.int64(V) + t[ok]
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.Table.from_pydict(
            {"key": pa.array(uniq, pa.int64()), "cnt": pa.array(cnt, pa.int64())}
        )

    counts = bucketed_aggregate(
        ray.data.read_parquet(seq_path, columns=["tokens"]), "key", partial, sum_counts_combine("key")
    ).to_pandas()  # |pos buckets| × V, bounded
    if not len(counts):
        return pd.DataFrame(
            {
                "bucket": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
                "n_distinct": pd.Series(dtype="int64"),
                "entropy": pd.Series(dtype="float64"),
            }
        )
    counts["bucket"] = counts["key"].to_numpy(np.int64) // V
    out_rows = []
    for b, grp in counts.groupby("bucket", sort=True):
        c = grp["cnt"].to_numpy(np.int64)
        n = int(c.sum())
        p = c / n
        out_rows.append(
            {
                "bucket": int(b),
                "n": n,
                "n_distinct": int(len(c)),
                "entropy": float(-np.sum(p * np.log(p))),
            }
        )
    return pd.DataFrame(out_rows).astype(
        {"bucket": "int64", "n": "int64", "n_distinct": "int64", "entropy": "float64"}
    )


def _source_codes(path: str, column: str = "source") -> list[str]:
    """Sorted distinct coalesced source labels — the |sources|-bounded
    dense-code pre-pass shared by every per-source histogram op (the fix
    that took zipf's partial from a per-token object groupby to pure
    int64: 71 s → ~4 s at sf0.01)."""
    from ray.data.aggregate import Count as _Count

    return (
        ray.data.read_parquet(path, columns=[column])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [pc.unique(pc.coalesce(t[column], pa.scalar("<NULL>", pa.string())))],
                names=[column],
            ),
            batch_format="pyarrow",
        )
        .groupby(column)
        .aggregate(_Count(alias_name="_n"))
        .to_pandas()[column]  # |sources|-bounded
        .sort_values()
        .tolist()
    )


def _source_token_unigram(seq_path: str, V: int) -> tuple[pd.DataFrame, list[str]]:
    """The per-(source, token) unigram count table as a bounded pandas
    frame (≤ |sources|·V rows however large the corpus) plus the sorted
    source list.  ONE packed-int-keyed bucketed exchange: dense source
    codes from the pre-pass keep the token-scale partial pure int64
    (np.unique over code·V + token), and the counts ride the
    token_bigrams bucketed int-sum machinery.  Shared by the Zipf fit
    and the token↔source mutual-information ranking."""
    from hepdata_validator_ray.ops import bucketed_aggregate, sum_counts_combine

    srcs = _source_codes(seq_path)
    code_of = {s: i for i, s in enumerate(srcs)}

    def partial(batch: pa.Table) -> pa.Table:
        view = prepare_view(batch)
        flat, lens = view["flat"], view["lens"]
        src = view.get("source")
        n_rows = view["n"]
        if src is None or not len(flat):
            return pa.Table.from_pydict(
                {"key": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        # per-ROW codes (cheap: |batch rows| lookups), fanned to tokens by
        # the offsets — the token-scale path is all int64
        codes = np.fromiter(
            (code_of[s if s is not None else "<NULL>"] for s in src.to_pylist()),
            dtype=np.int64,
            count=n_rows,
        )
        row_of = np.repeat(np.arange(n_rows, dtype=np.int64)[lens > 0], lens[lens > 0])
        t = flat.astype(np.int64)
        ok = (t >= 0) & (t < V)
        key = codes[row_of[ok]] * np.int64(V) + t[ok]
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.Table.from_pydict(
            {"key": pa.array(uniq, pa.int64()), "cnt": pa.array(cnt, pa.int64())}
        )

    uni = bucketed_aggregate(
        ray.data.read_parquet(seq_path, columns=["source", "tokens"]),
        "key",
        partial,
        sum_counts_combine("key"),
    ).to_pandas()  # |sources| × V, bounded
    uni["source"] = [srcs[i] for i in (uni["key"].to_numpy(np.int64) // V)] if len(uni) else []
    uni["tok"] = uni["key"].to_numpy(np.int64) % V if len(uni) else []
    return uni, srcs


def token_source_mi_top(seq_path: str, k: int = 50, vocab_size: int | None = None) -> pd.DataFrame:
    """Top-k tokens by their contribution to the source↔token mutual
    information I(S;T) = Σ p(s,t)·ln(p(s,t)/(p(s)p(t))) over token draws
    — the feature-selection view of the unigram table: the tokens whose
    presence most identifies WHERE a document came from.  Uniformly
    spread tokens score ~0; a source-exclusive template token scores
    ln(1/p(s)).  Complements PMI (token↔token) and the Zipf fit
    (within-source shape) in the tokenizer/mix-health family.

    The corpus-scale work is the ONE bounded unigram exchange shared
    with the Zipf fit; marginals (V-array, |S|-array) and the per-token
    contributions are numpy over that ≤|S|·V-row table — never
    corpus-proportional.  The ln parity with DuckDB is the empirically
    certified PMI convention; the mi expression is spelled identically
    in the SQL twin, and the top-k boundary is deterministic under
    (mi DESC, tok).

    Output (tok, n_occ, mi)."""
    V = vocab_size or CheckContext().vocab_size
    uni, srcs = _source_token_unigram(seq_path, V)
    if not len(uni):
        return pd.DataFrame(
            {
                "tok": pd.Series(dtype="int64"),
                "n_occ": pd.Series(dtype="int64"),
                "mi": pd.Series(dtype="float64"),
            }
        )
    code = uni["key"].to_numpy(np.int64) // V
    tok = uni["tok"].to_numpy(np.int64)
    c = uni["cnt"].to_numpy(np.int64)
    ns = np.bincount(code, weights=c, minlength=len(srcs))  # per-source totals
    nt = np.bincount(tok, weights=c, minlength=V)  # per-token totals
    N = float(c.sum())
    cf = c.astype(np.float64)
    # the identical double expression as the SQL twin: (c/N)·ln(cN/(ns·nt))
    term = (cf / N) * np.log((cf * N) / (ns[code] * nt[tok]))
    mi = np.bincount(tok, weights=term, minlength=V)
    seen = np.flatnonzero(nt > 0)  # the SQL twin's u table: seen tokens only
    order = seen[np.lexsort((seen, -mi[seen]))][:k]
    return pd.DataFrame(
        {
            "tok": order.astype("int64"),
            "n_occ": nt[order].astype("int64"),
            "mi": mi[order],
        }
    ).reset_index(drop=True)


#: packed-key shift for (source-code, value) histograms — values < 2^40
_HIST_SHIFT = np.int64(1) << np.int64(40)


def _source_ntok_histogram(seq_path: str) -> tuple[pd.DataFrame, list[str]]:
    """The per-(source, n_tok) count table as a bounded pandas frame
    (≤ |sources| × |distinct n_tok| rows however large the corpus) with
    dense codes decoded into ``code``/``v`` columns, plus the sorted
    source list.  One packed-key bucketed exchange over the column-pruned
    (source, n_tok) read; NULL/negative n_tok excluded, NULL source →
    '<NULL>'.  Shared by the Gini audit and quantile normalization."""
    from hepdata_validator_ray.ops import bucketed_aggregate, sum_counts_combine

    M = _HIST_SHIFT
    srcs = _source_codes(seq_path)
    code_of = {s: i for i, s in enumerate(srcs)}

    def partial(batch: pa.Table) -> pa.Table:
        src = pc.coalesce(batch["source"], pa.scalar("<NULL>", pa.string())).to_pylist()
        v = batch["n_tok"].to_numpy(zero_copy_only=False)
        codes = np.fromiter((code_of[s] for s in src), dtype=np.int64, count=len(src))
        ok = ~pd.isna(v)
        vi = v[ok].astype(np.int64)
        keep = vi >= 0
        key = codes[ok][keep] * M + vi[keep]
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.Table.from_pydict(
            {"key": pa.array(uniq, pa.int64()), "cnt": pa.array(cnt, pa.int64())}
        )

    hist = bucketed_aggregate(
        ray.data.read_parquet(seq_path, columns=["source", "n_tok"]),
        "key",
        partial,
        sum_counts_combine("key"),
    ).to_pandas()  # ≤ |sources| × |distinct n_tok|, bounded
    if len(hist):
        hist["code"] = hist["key"].to_numpy(np.int64) // M
        hist["v"] = hist["key"].to_numpy(np.int64) % M
    return hist, srcs


def gini_ntok_by_source(seq_path: str) -> pd.DataFrame:
    """Per-source Gini coefficient of the n_tok distribution — the token-
    budget concentration audit: gini ≈ 0 means every document carries a
    similar share of the source's tokens, gini → 1 means a few giant
    documents dominate (a skew signal for packing, sampling weights and
    dedup cost models).

    ONE bounded histogram exchange (packed code·2^40 + n_tok keys, the
    per-source dense-code pre-pass) — the corpus is read once,
    column-pruned to (source, n_tok).  The Gini itself comes from the
    grouped-data identity G = 2·Σᵢ rankᵢ·xᵢ / (n·Σx) − (n+1)/n, where the
    tie blocks contribute c·nprev·v + v·c(c+1)/2 with EXACT integer
    arithmetic (Python ints over the bounded histogram — no int64
    overflow at any scale; DuckDB's HUGEINT sum is the twin).  Sources
    with zero total tokens report gini 0 (the SQL CASE).

    Output (source, n, sum_tok, gini)."""
    hist, srcs = _source_ntok_histogram(seq_path)
    out = []
    if len(hist):
        for code, grp in hist.groupby("code", sort=True):
            grp = grp.sort_values("v", kind="mergesort")
            s_iv = 0
            nprev = 0
            s_v = 0
            # bounded histogram rows: exact Python-int arithmetic (the
            # rank-sum products overflow int64 at the 10^12-row tier)
            for v, cc in zip(grp["v"].tolist(), grp["cnt"].tolist()):
                s_iv += cc * nprev * v + v * cc * (cc + 1) // 2
                s_v += cc * v
                nprev += cc
            n = nprev
            gini = 2.0 * s_iv / (n * s_v) - (n + 1.0) / n if n * s_v > 0 else 0.0
            out.append({"source": srcs[code], "n": n, "sum_tok": s_v, "gini": gini})
    if not out:
        return pd.DataFrame(
            {
                "source": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "sum_tok": pd.Series(dtype="int64"),
                "gini": pd.Series(dtype="float64"),
            }
        )
    return pd.DataFrame(out).astype({"n": "int64", "sum_tok": "int64", "gini": "float64"})


def zipf_fit_by_source(seq_path: str, vocab_size: int | None = None) -> pd.DataFrame:
    """Per-source Zipf power-law fit over the token unigram distribution:
    OLS of ln(count) on ln(rank) — slope ≈ −1 is the healthy natural-text
    signature; a flat slope means near-uniform ids (synthetic/noise), a
    cliff means a degenerate vocabulary.  The tokenizer-health audit that
    complements fertility and vocab-churn.

    One packed-int-keyed bounded exchange (≤ |sources|·V rows) gives the
    unigram table: a tiny pre-pass over the ONE source column assigns
    every source a dense code (|sources|-bounded groupby, column-pruned
    read), the hot partial is then pure integer work — np.unique over
    code·V + token, no pandas/object keys in the token-scale loop (the
    first version paid a per-batch object groupby over every token: 71 s
    → ~4 s at sf0.01) — and the counts ride the token_bigrams bucketed
    int-sum machinery.  Ranks are per-source (count DESC, token ASC) —
    row_number semantics, ties broken by token id so both engines rank
    identically.  slope/intercept are the floats, computed from the five
    OLS sums with the textbook expressions spelled identically in the SQL
    twin.  Sources with a single distinct token have a degenerate design
    matrix and report slope/intercept 0 (the SQL CASE twin).

    Output (source, n_types, n_tokens, slope, intercept)."""
    V = vocab_size or CheckContext().vocab_size
    uni, srcs = _source_token_unigram(seq_path, V)
    out_rows = []
    for s, grp in uni.groupby("source", sort=True):
        grp = grp.sort_values(["cnt", "tok"], ascending=[False, True], kind="mergesort")
        c = grp["cnt"].to_numpy(np.int64)
        m = len(c)
        x = np.log(np.arange(1, m + 1, dtype=np.float64))
        y = np.log(c.astype(np.float64))
        sx, sy = float(x.sum()), float(y.sum())
        sxx, sxy = float((x * x).sum()), float((x * y).sum())
        den = m * sxx - sx * sx
        if den > 0.0:
            slope = (m * sxy - sx * sy) / den
            intercept = (sy - slope * sx) / m
        else:
            slope = 0.0
            intercept = 0.0
        out_rows.append(
            {
                "source": s,
                "n_types": m,
                "n_tokens": int(c.sum()),
                "slope": slope,
                "intercept": intercept,
            }
        )
    if not out_rows:
        return pd.DataFrame(
            {
                "source": pd.Series(dtype="object"),
                "n_types": pd.Series(dtype="int64"),
                "n_tokens": pd.Series(dtype="int64"),
                "slope": pd.Series(dtype="float64"),
                "intercept": pd.Series(dtype="float64"),
            }
        )
    return pd.DataFrame(out_rows).astype(
        {"n_types": "int64", "n_tokens": "int64", "slope": "float64", "intercept": "float64"}
    )


def ntok_percentile(seq_path: str) -> "ray.data.Dataset":
    """Per-document mid-rank percentile of n_tok against the GLOBAL
    length distribution — the normalized length feature samplers and
    curricula key on.  The broadcast-small-side pattern end to end: ONE
    bounded histogram exchange (distinct n_tok values) builds the
    value → percentile map, which ships once via ray.put and is applied
    per batch with np.searchsorted — the corpus is read twice,
    column-pruned, and the output streams; nothing corpus-scale ever
    sits on the driver.

    Percentile is the tie-block average rank over n:
    (nprev + (c+1)/2.0) / n — spelled identically in the SQL twin.

    Output (doc_id, n_tok, pct), one row per valid-length document."""
    from hepdata_validator_ray.ops import bucketed_aggregate, sum_counts_combine

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch["n_tok"].to_numpy(zero_copy_only=False)
        ok = ~pd.isna(v)
        vi = v[ok].astype(np.int64)
        vi = vi[vi >= 0]
        uniq, cnt = np.unique(vi, return_counts=True)
        return pa.Table.from_pydict(
            {"key": pa.array(uniq, pa.int64()), "cnt": pa.array(cnt, pa.int64())}
        )

    hist = (
        bucketed_aggregate(
            ray.data.read_parquet(seq_path, columns=["n_tok"]),
            "key",
            hist_partial,
            sum_counts_combine("key"),
        )
        .to_pandas()
        .sort_values("key")
    )  # |distinct n_tok| rows, bounded
    vs = hist["key"].to_numpy(np.int64)
    c = hist["cnt"].to_numpy(np.int64)
    nprev = np.concatenate([[0], np.cumsum(c)[:-1]])
    n = int(c.sum())
    pcts = (nprev + (c + 1) / 2.0) / n if n else np.zeros(0)
    table_ref = ray.put((vs, pcts))

    def attach(batch: pa.Table) -> pa.Table:
        vs_b, pcts_b = ray.get(table_ref)
        v = batch["n_tok"].to_numpy(zero_copy_only=False)
        ok = ~pd.isna(v)
        vi = v.copy()
        vi[~ok] = 0
        vi = vi.astype(np.int64)
        keep = ok & (vi >= 0)
        idx = np.searchsorted(vs_b, vi[keep])
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].filter(pa.array(keep)),
                "n_tok": pa.array(vi[keep], pa.int64()),
                "pct": pa.array(pcts_b[idx], pa.float64()),
            }
        )

    return ray.data.read_parquet(seq_path, columns=["doc_id", "n_tok"]).map_batches(
        attach, batch_format="pyarrow", batch_size=65536
    )


def source_js_divergence(seq_path: str, vocab_size: int | None = None) -> pd.DataFrame:
    """Pairwise Jensen–Shannon divergence between per-source token
    distributions — the data-mix similarity matrix (0 = identical
    unigram mix, ln 2 = disjoint vocabularies).  Every pair is emitted,
    including fully disjoint ones.

    The corpus-scale work is the ONE bounded unigram exchange shared
    with the Zipf fit and the MI ranking; the |S|²/2 pairwise terms are
    numpy merges over that ≤|S|·V-row table.  Tokens outside the joint
    support contribute exactly 0.5·ln 2 of their mass, so the inner sum
    runs over the JOINT support only:

        js = Σ_joint [0.5·pa·ln(2pa/(pa+pb)) + 0.5·pb·ln(2pb/(pa+pb))]
             + 0.5·ln 2 · ((1 − cov_a) + (1 − cov_b))

    with cov the joint-support probability mass — the identical double
    expression as the SQL twin (inner join + coalesce for empty pairs).

    Output (src_a, src_b, n_joint, js), src_a < src_b."""
    V = vocab_size or CheckContext().vocab_size
    uni, srcs = _source_token_unigram(seq_path, V)
    out = []
    if len(uni):
        code = uni["key"].to_numpy(np.int64) // V
        tok = uni["tok"].to_numpy(np.int64)
        c = uni["cnt"].to_numpy(np.int64)
        ns = np.bincount(code, weights=c, minlength=len(srcs))
        by_code: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for k in range(len(srcs)):
            m = code == k
            order = np.argsort(tok[m], kind="stable")
            by_code[k] = (tok[m][order], (c[m][order].astype(np.float64) / ns[k]) if ns[k] else c[m][order].astype(np.float64))
        for a in range(len(srcs)):
            ta, pa_ = by_code[a]
            for b in range(a + 1, len(srcs)):
                tb, pb_ = by_code[b]
                ia = np.isin(ta, tb)
                ib = np.isin(tb, ta)
                pra, prb = pa_[ia], pb_[ib]  # aligned: both token-sorted
                if len(pra):
                    s_in = float(
                        (0.5 * pra * np.log(2 * pra / (pra + prb))
                         + 0.5 * prb * np.log(2 * prb / (pra + prb))).sum()
                    )
                    cov_a, cov_b = float(pra.sum()), float(prb.sum())
                else:
                    s_in, cov_a, cov_b = 0.0, 0.0, 0.0
                js = s_in + 0.5 * np.log(2.0) * ((1 - cov_a) + (1 - cov_b))
                out.append(
                    {"src_a": srcs[a], "src_b": srcs[b], "n_joint": int(ia.sum()), "js": js}
                )
    if not out:
        return pd.DataFrame(
            {
                "src_a": pd.Series(dtype="object"),
                "src_b": pd.Series(dtype="object"),
                "n_joint": pd.Series(dtype="int64"),
                "js": pd.Series(dtype="float64"),
            }
        )
    return pd.DataFrame(out).astype({"n_joint": "int64", "js": "float64"})


def spearman_len_distinct_by_source(seq_path: str) -> pd.DataFrame:
    """Per-source Spearman rank correlation between sequence length
    (len(tokens)) and its DISTINCT token count — the repetition-health
    correlate: healthy text keeps ρ high (longer docs keep introducing
    types); looping/degenerate generations flatten the distinct curve and
    crater ρ.

    Exactness at any scale comes from three facts: (1) the joint
    (length, distinct) distribution of integer features is VALUE-bounded,
    so ONE packed-key histogram exchange (code·2⁴² + a·2²¹ + b) carries
    the whole corpus; (2) doubled mid-ranks 2r = 2·nprev + c + 1 are
    integers, so every Spearman sum is exact Python-int arithmetic over
    the bounded histogram (DuckDB HUGEINT twin — the SQL spells the same
    2·rank() + count(*)-over-tie − 1 identity); (3) the textbook ρ
    expression is spelled identically in both engines.  Constant-feature
    sources hit the degenerate CASE (ρ = 0).

    Output (source, n, rho)."""
    import math

    from hepdata_validator_ray.ops import bucketed_aggregate, sum_counts_combine

    SH_A, SH_B = np.int64(1) << np.int64(42), np.int64(1) << np.int64(21)
    srcs = _source_codes(seq_path)
    code_of = {s: i for i, s in enumerate(srcs)}

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        src = pc.coalesce(batch["source"], pa.scalar("<NULL>", pa.string())).to_pylist()
        codes = np.fromiter((code_of[s] for s in src), dtype=np.int64, count=len(src))
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.int64)[offs[0] : offs[-1]]
        n = len(col)
        n_distinct = np.zeros(n, dtype=np.int64)
        if len(vals):
            seq_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            width = int(vals.max()) - int(vals.min()) + 1
            pairs = np.unique(seq_idx * width + (vals - int(vals.min())))
            n_distinct += np.bincount(pairs // width, minlength=n)
        a = lens.astype(np.int64)
        ok = valid & (a < (1 << 21)) & (n_distinct < (1 << 21))
        key = codes[ok] * SH_A + a[ok] * SH_B + n_distinct[ok]
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.Table.from_pydict(
            {"key": pa.array(uniq, pa.int64()), "cnt": pa.array(cnt, pa.int64())}
        )

    hist = bucketed_aggregate(
        ray.data.read_parquet(seq_path, columns=["source", "tokens"]),
        "key",
        partial,
        sum_counts_combine("key"),
    ).to_pandas()  # value-bounded joint histogram
    out = []
    if len(hist):
        key = hist["key"].to_numpy(np.int64)
        hist["code"] = key // SH_A
        hist["a"] = (key // SH_B) % (1 << 21)
        hist["b"] = key % SH_B
        for code, grp in hist.groupby("code", sort=True):
            a = grp["a"].to_numpy(np.int64)
            b = grp["b"].to_numpy(np.int64)
            c = grp["cnt"].to_numpy(np.int64)
            n = int(c.sum())

            def ranks2(v: np.ndarray) -> np.ndarray:
                # doubled mid-rank per distinct value: 2·nprev + c_v + 1
                order = np.argsort(v, kind="stable")
                vs = v[order]
                cs = c[order]
                # collapse equal values (v may repeat across joint cells)
                uv, inv = np.unique(vs, return_inverse=True)
                cu = np.bincount(inv, weights=cs).astype(np.int64)
                nprev = np.concatenate([[0], np.cumsum(cu)[:-1]])
                r2u = 2 * nprev + cu + 1
                r2 = np.empty(len(v), dtype=np.int64)
                r2[order] = r2u[inv]
                return r2

            r2a, r2b = ranks2(a), ranks2(b)
            sx = sum(int(r) * int(cc) for r, cc in zip(r2a, c))
            sy = sum(int(r) * int(cc) for r, cc in zip(r2b, c))
            sxx = sum(int(r) * int(r) * int(cc) for r, cc in zip(r2a, c))
            syy = sum(int(r) * int(r) * int(cc) for r, cc in zip(r2b, c))
            sxy = sum(int(ra) * int(rb) * int(cc) for ra, rb, cc in zip(r2a, r2b, c))
            den2 = float(n * sxx - sx * sx) * float(n * syy - sy * sy)
            rho = (n * sxy - sx * sy) / math.sqrt(den2) if den2 > 0.0 else 0.0
            out.append({"source": srcs[code], "n": n, "rho": rho})
    if not out:
        return pd.DataFrame(
            {
                "source": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "rho": pd.Series(dtype="float64"),
            }
        )
    return pd.DataFrame(out).astype({"n": "int64", "rho": "float64"})


def quantile_normalize_ntok(seq_path: str) -> "ray.data.Dataset":
    """Quantile normalization of n_tok ACROSS sources: every document's
    length maps to the GLOBAL length at its within-source quantile, so
    all sources share one length distribution afterwards — the classic
    cross-batch normalization (microarray quantile normalization / rank
    matching), the mix-balancing transform samplers apply before
    length-stratified selection.

    All rank arithmetic is integer-exact on both engines: the
    within-source mid-rank is the rational (2·nprev + c + 1) / (2·n_s),
    and the global target rank is its ceiling against N computed in
    INTEGERS — t = (num·N + den − 1) // den — so no float quantile ever
    decides a bucket boundary (the snapshot_psi/quantile_disc rank-rule
    discipline).  norm = smallest global value whose cumulative count
    ≥ t (the inverse empirical CDF).

    Physical plan: the bounded (source, n_tok) histogram exchange shared
    with the Gini audit builds the complete (source, v) → norm map on
    the driver (histogram-sized), which broadcasts once via ray.put; a
    second column-pruned pass attaches norm per document with two
    searchsorted lookups.  Corpus-scale data never sits on the driver;
    the output streams.

    Output (doc_id, source, n_tok, norm), one row per valid-length doc."""
    hist, srcs = _source_ntok_histogram(seq_path)
    M = _HIST_SHIFT
    if len(hist):
        hist = hist.sort_values(["code", "v"], kind="mergesort")
        gv = hist.groupby("v")["cnt"].sum().sort_index()
        gvals = gv.index.to_numpy(np.int64)
        gcum = np.cumsum(gv.to_numpy(np.int64))
        N = int(gcum[-1])
        keys_out = []
        norms_out = []
        for code, grp in hist.groupby("code", sort=True):
            c = grp["cnt"].to_numpy(np.int64)
            v = grp["v"].to_numpy(np.int64)
            nprev = np.concatenate([[0], np.cumsum(c)[:-1]])
            den = 2 * int(c.sum())
            # integer ceil((2·nprev+c+1)/den · N): no float decides a rank
            t = [(int(2 * np_ + cc + 1) * N + den - 1) // den for np_, cc in zip(nprev, c)]
            idx = np.searchsorted(gcum, np.asarray(t, dtype=np.int64), side="left")
            keys_out.append(int(code) * M + v)
            norms_out.append(gvals[idx])
        map_keys = np.concatenate(keys_out)
        map_norms = np.concatenate(norms_out)
        order = np.argsort(map_keys)
        map_keys, map_norms = map_keys[order], map_norms[order]
    else:
        map_keys = np.zeros(0, dtype=np.int64)
        map_norms = np.zeros(0, dtype=np.int64)
    code_of = {s: i for i, s in enumerate(srcs)}
    table_ref = ray.put((map_keys, map_norms))

    def attach(batch: pa.Table) -> pa.Table:
        mk, mn = ray.get(table_ref)
        src = pc.coalesce(batch["source"], pa.scalar("<NULL>", pa.string())).to_pylist()
        v = batch["n_tok"].to_numpy(zero_copy_only=False)
        codes = np.fromiter((code_of[s] for s in src), dtype=np.int64, count=len(src))
        ok = ~pd.isna(v)
        vi = v.copy()
        vi[~ok] = 0
        vi = vi.astype(np.int64)
        keep = ok & (vi >= 0)
        key = codes[keep] * M + vi[keep]
        idx = np.searchsorted(mk, key)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].filter(pa.array(keep)),
                "source": pa.array(np.asarray(src, dtype=object)[keep], pa.string()),
                "n_tok": pa.array(vi[keep], pa.int64()),
                "norm": pa.array(mn[idx], pa.int64()),
            }
        )

    return ray.data.read_parquet(seq_path, columns=["doc_id", "source", "n_tok"]).map_batches(
        attach, batch_format="pyarrow", batch_size=65536
    )


def bigram_novelty(old_path: str, new_path: str, vocab_size: int | None = None) -> pd.DataFrame:
    """Cross-snapshot bigram novelty — the LM-drift metric one level above
    vocab churn: what fraction of the NEW snapshot's distinct bigrams
    (and of its bigram occurrence MASS) was never seen in the reference
    snapshot.  High type-novelty with low mass-novelty = a long tail of
    fresh contexts (healthy growth); high mass-novelty = a distribution
    break.

    Both corpus-scale bigram tables come from the shared builder and are
    ALREADY collapsed to distinct keys, so novelty is one tagged keyed
    exchange over the two bounded-by-distinct-bigrams tables (ref rows
    carry cnt=−1 as the tag; a bucket groups by key and checks for the
    tag) — never a broadcast of a bigram set, never driver-resident.
    Counts and masses are exact integers; the two fractions are the only
    doubles, spelled identically in the EXCEPT-free LEFT-JOIN twin.

    Output one row: (n_bigrams_new, n_unseen, mass_new, mass_unseen,
    frac_types_unseen, frac_mass_unseen)."""
    from hepdata_validator_ray.ops import BUCKET_COL, bucketed_aggregate, with_bucket

    V = vocab_size or CheckContext().vocab_size
    new_counts = _bigram_count_dataset(new_path, V)
    ref_keys = _bigram_count_dataset(old_path, V).map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "key": t["key"],
                "cnt": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    )

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        is_ref = df["cnt"].to_numpy() < 0
        new = df[~is_ref]
        seen = new["key"].isin(set(df.loc[is_ref, "key"].tolist())).to_numpy()
        c = new["cnt"].to_numpy(dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "n_bigrams_new": pa.array([len(new)], pa.int64()),
                "n_unseen": pa.array([int((~seen).sum())], pa.int64()),
                "mass_new": pa.array([int(c.sum())], pa.int64()),
                "mass_unseen": pa.array([int(c[~seen].sum())], pa.int64()),
            }
        )

    parts = bucketed_aggregate(
        new_counts.union(ref_keys), "key", None, combine
    ).to_pandas()  # num_buckets summary rows
    tot = parts.sum()
    n_new, n_uns = int(tot["n_bigrams_new"]), int(tot["n_unseen"])
    m_new, m_uns = int(tot["mass_new"]), int(tot["mass_unseen"])
    return pd.DataFrame(
        [
            {
                "n_bigrams_new": n_new,
                "n_unseen": n_uns,
                "mass_new": m_new,
                "mass_unseen": m_uns,
                "frac_types_unseen": n_uns / n_new if n_new else 0.0,
                "frac_mass_unseen": m_uns / m_new if m_new else 0.0,
            }
        ]
    ).astype(
        {
            "n_bigrams_new": "int64",
            "n_unseen": "int64",
            "mass_new": "int64",
            "mass_unseen": "int64",
            "frac_types_unseen": "float64",
            "frac_mass_unseen": "float64",
        }
    )


def source_cross_entropy(seq_path: str, vocab_size: int | None = None) -> pd.DataFrame:
    """Directional cross-entropy H(pₐ; q_b) = −Σ_t pₐ(t)·ln q_b(t) between
    per-source unigram LMs with add-one smoothing — "how surprised is a
    model of b by text from a", the perplexity view of domain similarity
    that complements the symmetric JS matrix (a ⊂ b scores low in one
    direction and high in the other, which JS can't show).

    q_b(t) = (c_bt + 1)/(n_b + V) — smoothing makes every term finite, so
    the sum runs over a's support only and needs b's counts JUST on that
    support: the |S|² pairs are numpy merges over the ONE shared bounded
    unigram exchange, decomposed as

        H = ln(n_b + V) − Σ_{t∈a} pₐ(t)·ln(c_bt + 1)

    (tokens where c_bt = 0 contribute ln 1 = 0) — the identical double
    expression as the LEFT-JOIN-free SQL twin.  Diagonal = each source's
    own smoothed entropy, included as the baseline row.

    Output (src_a, src_b, xent), all ordered pairs including a = b."""
    V = vocab_size or CheckContext().vocab_size
    uni, srcs = _source_token_unigram(seq_path, V)
    out = []
    if len(uni):
        code = uni["key"].to_numpy(np.int64) // V
        tok = uni["tok"].to_numpy(np.int64)
        c = uni["cnt"].to_numpy(np.int64)
        ns = np.bincount(code, weights=c, minlength=len(srcs)).astype(np.int64)
        by_code: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for k in range(len(srcs)):
            m = code == k
            order = np.argsort(tok[m], kind="stable")
            by_code[k] = (tok[m][order], c[m][order])
        for a in range(len(srcs)):
            ta, ca = by_code[a]
            pa_ = ca.astype(np.float64) / ns[a] if ns[a] else ca.astype(np.float64)
            for b in range(len(srcs)):
                tb, cb = by_code[b]
                # c_bt on a's support (0 where absent): searchsorted merge
                idx = np.searchsorted(tb, ta)
                idx_c = np.clip(idx, 0, max(len(tb) - 1, 0))
                cbt = np.where(
                    (idx < len(tb)) & (tb[idx_c] == ta), cb[idx_c], 0
                ).astype(np.float64) if len(tb) else np.zeros(len(ta))
                xent = float(np.log(float(ns[b] + V)) - (pa_ * np.log(cbt + 1.0)).sum())
                out.append({"src_a": srcs[a], "src_b": srcs[b], "xent": xent})
    if not out:
        return pd.DataFrame(
            {
                "src_a": pd.Series(dtype="object"),
                "src_b": pd.Series(dtype="object"),
                "xent": pd.Series(dtype="float64"),
            }
        )
    return pd.DataFrame(out).astype({"xent": "float64"})


def source_diversity(seq_path: str, vocab_size: int | None = None) -> pd.DataFrame:
    """Per-source lexical-diversity panel from the shared unigram
    exchange: Shannon entropy (−Σ p ln p), Simpson concentration (Σ p²,
    the collision probability / HHI), type-token ratio, and normalized
    entropy H/ln(types) — the four standard "is this source degenerate
    or rich" numbers in one bounded pass.  All expressions spelled
    identically in the twin; single-type sources report norm_entropy 0
    via the same CASE (ln 1 = 0 denominator).

    Output (source, n_types, n_tokens, entropy, simpson, ttr,
    norm_entropy)."""
    V = vocab_size or CheckContext().vocab_size
    uni, srcs = _source_token_unigram(seq_path, V)
    out = []
    if len(uni):
        code = uni["key"].to_numpy(np.int64) // V
        c = uni["cnt"].to_numpy(np.int64)
        for k in range(len(srcs)):
            ck = c[code == k]
            if not len(ck):
                continue
            n_tok = int(ck.sum())
            p = ck.astype(np.float64) / n_tok
            h = float(-(p * np.log(p)).sum())
            simpson = float((p * p).sum())
            m = len(ck)
            out.append(
                {
                    "source": srcs[k],
                    "n_types": m,
                    "n_tokens": n_tok,
                    "entropy": h,
                    "simpson": simpson,
                    "ttr": m / n_tok,
                    "norm_entropy": h / np.log(float(m)) if m > 1 else 0.0,
                }
            )
    if not out:
        return pd.DataFrame(
            {
                "source": pd.Series(dtype="object"),
                "n_types": pd.Series(dtype="int64"),
                "n_tokens": pd.Series(dtype="int64"),
                "entropy": pd.Series(dtype="float64"),
                "simpson": pd.Series(dtype="float64"),
                "ttr": pd.Series(dtype="float64"),
                "norm_entropy": pd.Series(dtype="float64"),
            }
        )
    return pd.DataFrame(out).astype(
        {
            "n_types": "int64",
            "n_tokens": "int64",
            "entropy": "float64",
            "simpson": "float64",
            "ttr": "float64",
            "norm_entropy": "float64",
        }
    )


def seq_lm_perplexity(
    seq_path: str, vocab_size: int | None = None, num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Per-sequence cross-entropy under the corpus's OWN bigram LM with
    add-one smoothing — the CCNet-style perplexity filter (score every
    document by how surprising it is to a model of the corpus; extreme
    scores in either direction flag boilerplate / noise before training):

        avg_nll(d) = (1/m_d) · Σ_{(t1,t2)∈d} [ln(ctx(t1)+V) − ln(c(t1,t2)+1)]

    where c is the corpus bigram count, ctx(t1) = Σ_t2 c(t1,t2) the
    context count, and m_d the number of valid bigrams in d.  Every doc
    bigram exists in its own corpus's LM, so the count join is total;
    unseen-bigram handling is bigram_novelty's domain.

    Physical plan (every corpus-scale stage distributed): the shared
    _bigram_count_dataset exchange materializes ONCE (bounded by
    min(Σtok, V²) — far below corpus scale — and consumed twice); context
    counts collapse to a V-bounded table broadcast via ray.put; docs
    explode to per-doc DISTINCT bigram rows (row-local np.unique, ≤ one
    exchanged row per (doc, bigram)); LM rows ride the SAME key-bucketed
    exchange tagged by sign(dcnt) (< 0 ⇒ LM row); each bucket attaches
    counts by searchsorted and emits per-(bucket, doc) partials; a final
    doc_id-keyed exchange sums to (doc_id, m, avg_nll).  Output is
    corpus-scale per-doc rows and STREAMS — never driver-resident.

    Rows with NULL doc_id or no valid bigram emit nothing (mirrored
    WHERE/no-group); NULL-doc rows still count toward the LM; duplicate
    doc_ids merge under GROUP BY semantics on both engines.

    Output (doc_id, m, avg_nll)."""
    from hepdata_validator_ray.ops import (
        BUCKET_COL,
        bucketed_aggregate,
        derive_num_buckets_path,
        sum_counts_combine,
        with_bucket,
    )

    if num_buckets is None:
        num_buckets = derive_num_buckets_path(seq_path)
    V = int(vocab_size or CheckContext().vocab_size)
    V2 = np.int64(V) * np.int64(V)
    counts = _bigram_count_dataset(seq_path, V).materialize()

    def ctx_partial(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(key // V, return_inverse=True)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, cnt)
        return pa.Table.from_pydict(
            {"key": pa.array(uniq, pa.int64()), "cnt": pa.array(s, pa.int64())}
        )

    ctx_pd = bucketed_aggregate(counts, "key", ctx_partial, sum_counts_combine("key")).to_pandas()
    ctx_arr = np.zeros(V, dtype=np.int64)
    if len(ctx_pd):
        ctx_arr[ctx_pd["key"].to_numpy(np.int64)] = ctx_pd["cnt"].to_numpy(np.int64)
    ctx_ref = ray.put(ctx_arr)

    _EMPTY = pa.Table.from_pydict(
        {
            "key": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.string()),
            "dcnt": pa.array([], pa.int64()),
        }
    )

    def doc_rows(batch: pa.Table) -> pa.Table:
        view = prepare_view(batch)
        if "flat" not in view or "doc_id" not in view:
            return _EMPTY
        flat, offsets, lens = view["flat"], view["offsets"], view["lens"]
        n = len(flat)
        if n < 2:
            return _EMPTY
        t1 = flat[:-1].astype(np.int64)
        t2 = flat[1:].astype(np.int64)
        key = t1 * np.int64(V) + t2
        last_positions = offsets[1:][lens > 0] - 1
        valid = np.ones(n - 1, dtype=bool)
        valid[last_positions[last_positions < n - 1]] = False
        valid &= (t1 >= 0) & (t1 < V) & (t2 >= 0) & (t2 < V)
        row_of = np.repeat(np.arange(view["n"], dtype=np.int64), np.maximum(lens, 0))
        ridx = row_of[:-1]
        valid &= ~view["doc_null"][ridx]
        if not valid.any():
            return _EMPTY
        packed = ridx[valid] * V2 + key[valid]
        uniq, dcnt = np.unique(packed, return_counts=True)
        return pa.Table.from_pydict(
            {
                "key": pa.array(uniq % V2, pa.int64()),
                "doc_id": view["doc_id"].take(pa.array(uniq // V2)),
                "dcnt": pa.array(dcnt.astype(np.int64), pa.int64()),
            }
        )

    def lm_rows(t: pa.Table) -> pa.Table:
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "key": t["key"],
                "doc_id": pa.array([""] * len(t), pa.string()),
                "dcnt": pa.array(-cnt, pa.int64()),
            }
        )

    lm = counts.map_batches(lm_rows, batch_format="pyarrow")
    docs = ray.data.read_parquet(seq_path, columns=["doc_id", "tokens"]).map_batches(
        doc_rows, batch_format="pyarrow", batch_size=4096
    )
    _EMPTY_P = pd.DataFrame(
        {
            "doc_id": pd.Series(dtype="object"),
            "s_nll": pd.Series(dtype="float64"),
            "m": pd.Series(dtype="int64"),
        }
    )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        dcnt = df["dcnt"].to_numpy(np.int64)
        is_lm = dcnt < 0
        d = df[~is_lm]
        if not len(d):
            return _EMPTY_P
        lm_keys = df.loc[is_lm, "key"].to_numpy(np.int64)
        lm_cnt = -dcnt[is_lm]
        order = np.argsort(lm_keys, kind="mergesort")
        lm_keys, lm_cnt = lm_keys[order], lm_cnt[order]
        dk = d["key"].to_numpy(np.int64)
        pos = np.searchsorted(lm_keys, dk)
        # self-scoring invariant: every doc bigram is in its own LM —
        # explicit raise (python -O strips asserts; a miss here would
        # silently score against the wrong LM row)
        if not (len(lm_keys) and (pos < len(lm_keys)).all() and (lm_keys[pos] == dk).all()):
            raise ValueError("doc bigram missing from its own corpus LM (self-scoring invariant)")
        ctx = ray.get(ctx_ref)[dk // V]
        dc = d["dcnt"].to_numpy(np.float64)
        nll = dc * (np.log(ctx + np.float64(V)) - np.log(lm_cnt[pos] + 1.0))
        out = pd.DataFrame(
            {"doc_id": d["doc_id"].to_numpy(), "s_nll": nll, "m": d["dcnt"].to_numpy(np.int64)}
        )
        return out.groupby("doc_id", sort=False).agg(
            s_nll=("s_nll", "sum"), m=("m", "sum")
        ).reset_index()

    joined = (
        lm.union(docs)
        .map_batches(lambda t: with_bucket(t, "key", num_buckets), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(attach, batch_format="pandas")
    )

    def per_doc(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas()
        g = pdf.groupby("doc_id", sort=False).agg(s_nll=("s_nll", "sum"), m=("m", "sum")).reset_index()
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(g["doc_id"], pa.string()),
                "m": pa.array(g["m"].to_numpy(np.int64), pa.int64()),
                "avg_nll": pa.array(
                    g["s_nll"].to_numpy(np.float64) / g["m"].to_numpy(np.int64), pa.float64()
                ),
            }
        )

    return bucketed_aggregate(joined, "doc_id", None, per_doc)


def doc_token_entropy(seq_path: str, vocab_size: int | None = None) -> "ray.data.Dataset":
    """Per-document Shannon entropy of the WITHIN-doc token distribution,
    H_d = −Σ_t (c_t/m)·ln(c_t/m) — the doc-level degeneracy score (a
    looping generation craters toward 0; healthy text sits near
    ln(distinct)); the per-doc companion of the per-source diversity
    panel.  Valid token ids only; rows with NULL doc_id or no valid
    token emit nothing (mirrored WHERE/no-group).

    ENTIRELY map-side — no exchange: a doc's tokens never leave their
    batch, so each batch emits its own (doc_id, n_valid, n_types,
    entropy) rows via one packed row·V+token unique + segment reduction;
    output is corpus-scale and streams.  Duplicate doc_ids stay separate
    physical rows here (no grouping is the point: the score is per
    SEQUENCE); the twin groups by (doc_id, rn) via a row-preserving
    unnest — both engines emit one row per input row, so GROUP BY
    doc_id hash-collisions of dup ids are avoided by construction."""
    V = int(vocab_size or CheckContext().vocab_size)

    _EMPTY = pa.Table.from_pydict(
        {
            "doc_id": pa.array([], pa.string()),
            "n_valid": pa.array([], pa.int64()),
            "n_types": pa.array([], pa.int64()),
            "entropy": pa.array([], pa.float64()),
        }
    )

    def per_doc(batch: pa.Table) -> pa.Table:
        view = prepare_view(batch)
        if "flat" not in view or "doc_id" not in view:
            return _EMPTY
        flat, lens = view["flat"], view["lens"]
        n = len(flat)
        if n == 0:
            return _EMPTY
        tok = flat.astype(np.int64)
        row_of = np.repeat(np.arange(view["n"], dtype=np.int64), np.maximum(lens, 0))
        valid = (tok >= 0) & (tok < V) & ~view["doc_null"][row_of]
        if not valid.any():
            return _EMPTY
        packed = row_of[valid] * np.int64(V) + tok[valid]
        uniq, cnt = np.unique(packed, return_counts=True)
        urow = uniq // V
        # segment boundaries per doc over the sorted unique keys
        new_doc = np.ones(len(urow), dtype=bool)
        new_doc[1:] = urow[1:] != urow[:-1]
        seg = np.cumsum(new_doc) - 1
        n_seg = int(seg[-1]) + 1
        m = np.zeros(n_seg, dtype=np.int64)
        np.add.at(m, seg, cnt)
        n_types = np.zeros(n_seg, dtype=np.int64)
        np.add.at(n_types, seg, 1)
        p = cnt.astype(np.float64) / m[seg].astype(np.float64)
        h = np.zeros(n_seg, dtype=np.float64)
        np.add.at(h, seg, -(p * np.log(p)))
        rows = urow[new_doc]
        return pa.Table.from_pydict(
            {
                "doc_id": view["doc_id"].take(pa.array(rows)),
                "n_valid": pa.array(m, pa.int64()),
                "n_types": pa.array(n_types, pa.int64()),
                "entropy": pa.array(h, pa.float64()),
            }
        )

    return ray.data.read_parquet(seq_path, columns=["doc_id", "tokens"]).map_batches(
        per_doc, batch_format="pyarrow", batch_size=8192
    )


def ensure_partitioned_documents(docs_path: str) -> str:
    """Materialize a hive-partitioned (source=…) copy of the documents
    table under /tmp — the RESUMABLE-OUTPUT layout this engine writes at
    scale (one directory per key, so a failed run skips finished
    partitions and a reader prunes whole directories).  Deterministic and
    idempotent: the copy is keyed by the input path digest, written to a
    unique temp dir and atomically os.replace'd (two concurrent callers
    race benignly — ADVICE r3 events_first_seen discipline)."""
    import hashlib
    import os
    import uuid
    from pathlib import Path

    # key = path + content fingerprint (size+mtime of every part): a
    # regenerated source invalidates the cached partitioned copy instead
    # of silently serving stale partitions (ADVICE r4 #1)
    src = Path(docs_path)
    parts = [src] if src.is_file() else sorted(src.glob("*.parquet"))
    fp = ";".join(f"{p.name}:{p.stat().st_size}:{p.stat().st_mtime_ns}" for p in parts)
    digest = hashlib.md5(f"{os.path.abspath(docs_path)}|{fp}".encode()).hexdigest()[:12]
    out = Path("/tmp/hvr_partitioned") / digest / "documents"
    if (out / "_SUCCESS").exists():
        return str(out)
    tmp = out.parent / f".tmp-{uuid.uuid4().hex[:8]}"
    ray.data.read_parquet(docs_path).write_parquet(str(tmp), partition_cols=["source"])
    (tmp / "_SUCCESS").touch()
    out.parent.mkdir(parents=True, exist_ok=True)
    try:
        os.replace(tmp, out)
    except OSError:  # concurrent winner already moved theirs in
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return str(out)


def partition_pruned_counts(docs_path: str, source: str = "src0") -> pd.DataFrame:
    """Per-lang doc counts + char budget for ONE source, read from the
    hive-partitioned copy with a PATH-level partition filter — whole
    directories of other sources are never opened (the prune-at-the-read
    contract; the pruning itself is pinned by the input_files() test).
    Oracle = the same aggregate over the flat table WHERE source = …

    Output (lang, n_docs, sum_chars)."""
    from ray.data.datasource.partitioning import Partitioning, PathPartitionFilter

    part_dir = ensure_partitioned_documents(docs_path)
    ds = ray.data.read_parquet(
        part_dir,
        partition_filter=PathPartitionFilter.of(
            lambda kv: kv.get("source") == source, style="hive"
        ),
        file_extensions=["parquet"],
        columns=["lang", "n_chars"],
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": t["lang"].to_pandas().fillna("<NULL>"),
                "n_chars": t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby("lang", as_index=False).agg(n_docs=("lang", "size"), sum_chars=("n_chars", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()  # |langs|×|blocks|
    if not len(parts):
        return pd.DataFrame(
            {
                "lang": pd.Series(dtype="object"),
                "n_docs": pd.Series(dtype="int64"),
                "sum_chars": pd.Series(dtype="int64"),
            }
        )
    return (
        parts.groupby("lang", as_index=False)
        .agg(n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"))
        .astype({"n_docs": "int64", "sum_chars": "int64"})
    )


def weighted_median_ntok(seq_path: str) -> pd.DataFrame:
    """Per-source TOKEN-BUDGET-weighted median length: the smallest length
    v such that sequences of length ≤ v carry at least half the source's
    tokens (2·Σ_{u≤v} u·c_u ≥ Σ u·c_u — the all-integer rank rule, no
    float ever decides the boundary).  Differs from the row median
    exactly when long docs dominate the budget — THE number that says
    where half the compute goes, not half the rows.  Rides the shared
    (source, n_tok) bounded histogram exchange; NULL/negative n_tok
    drops, NULL source is '<NULL>' (the histogram's conventions).

    Output (source, total_tokens, wmedian)."""
    hist, srcs = _source_ntok_histogram(seq_path)
    if not len(hist):
        return pd.DataFrame(
            {
                "source": pd.Series(dtype="object"),
                "total_tokens": pd.Series(dtype="int64"),
                "wmedian": pd.Series(dtype="int64"),
            }
        )
    out = []
    for ci, grp in hist.groupby("code", sort=True):
        grp = grp.sort_values("v", kind="mergesort")
        v = grp["v"].to_numpy(np.int64)
        w = v * grp["cnt"].to_numpy(np.int64)
        tot = int(w.sum())
        cum = np.cumsum(w)
        idx = int(np.argmax(2 * cum >= tot))  # first v with 2·cum ≥ tot
        out.append({"source": srcs[int(ci)], "total_tokens": tot, "wmedian": int(v[idx])})
    return pd.DataFrame(out).astype({"total_tokens": "int64", "wmedian": "int64"})


def corpus_entropy_rate(seq_path: str, vocab_size: int | None = None) -> pd.DataFrame:
    """Corpus-level bigram entropy rate H(t₂|t₁) = H(bigram) − H(context)
    — the one-number compressibility/diversity summary of the token
    stream (natural text sits well below ln V; near ln V means noise,
    near 0 means template loops).  Uses the distributive identity
    H = ln N − (Σ c·ln c)/N so each entropy is ONE pass of per-batch
    partials (Σ c ln c, Σ c) over the DISTRIBUTED bigram/context tables —
    the corpus-scale tables never reach the driver; the twin spells the
    identical decomposition.

    Output one row (n_bigrams, n_distinct_bigrams, h_bigram, h_context,
    h_rate)."""
    V = int(vocab_size or CheckContext().vocab_size)
    counts = _bigram_count_dataset(seq_path, V).materialize()

    def big_partial(t: pa.Table) -> pa.Table:
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.Table.from_pydict(
            {
                "n": pa.array([int(c.sum())], pa.int64()),
                "d": pa.array([len(c)], pa.int64()),
                "clc": pa.array([float((c * np.log(c)).sum())], pa.float64()),
            }
        )

    def ctx_partial(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(key // V, return_inverse=True)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, cnt)
        return pa.Table.from_pydict(
            {"key": pa.array(uniq, pa.int64()), "cnt": pa.array(s, pa.int64())}
        )

    from hepdata_validator_ray.ops import bucketed_aggregate, sum_counts_combine

    bp = counts.map_batches(big_partial, batch_format="pyarrow").to_pandas()
    ctx = bucketed_aggregate(counts, "key", ctx_partial, sum_counts_combine("key"))

    def ctx_sum(t: pa.Table) -> pa.Table:
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.Table.from_pydict({"clc": pa.array([float((c * np.log(c)).sum())], pa.float64())})

    cp = ctx.map_batches(ctx_sum, batch_format="pyarrow").to_pandas()
    n = int(bp["n"].sum()) if len(bp) else 0
    if n == 0:
        return pd.DataFrame(
            [{"n_bigrams": 0, "n_distinct_bigrams": 0, "h_bigram": 0.0, "h_context": 0.0, "h_rate": 0.0}]
        ).astype({"n_bigrams": "int64", "n_distinct_bigrams": "int64"})
    h_big = float(np.log(n) - bp["clc"].sum() / n)
    h_ctx = float(np.log(n) - cp["clc"].sum() / n)
    return pd.DataFrame(
        [
            {
                "n_bigrams": n,
                "n_distinct_bigrams": int(bp["d"].sum()),
                "h_bigram": h_big,
                "h_context": h_ctx,
                "h_rate": h_big - h_ctx,
            }
        ]
    ).astype({"n_bigrams": "int64", "n_distinct_bigrams": "int64"})


def truncation_loss_curve(
    seq_path: str, budgets: tuple[int, ...] = (128, 256, 512, 1024, 2048, 4096, 8192)
) -> pd.DataFrame:
    """Context-length budget curve: for each candidate max_len, how many
    docs fit whole, how many tokens survive, and how many fall to
    truncation — THE table a context-window decision is made from
    (the marginal token yield of each doubling).  All exact integers off
    the ONE value-bounded n_tok histogram (Σ over the bounded table per
    budget, never a corpus re-scan per budget); NULL/negative n_tok
    drops (histogram conventions).

    Output (budget, n_docs, n_fit, tokens_total, tokens_kept,
    tokens_lost, frac_kept)."""
    hist, _srcs = _source_ntok_histogram(seq_path)
    empty = pd.DataFrame(
        {
            "budget": pd.Series(dtype="int64"),
            "n_docs": pd.Series(dtype="int64"),
            "n_fit": pd.Series(dtype="int64"),
            "tokens_total": pd.Series(dtype="int64"),
            "tokens_kept": pd.Series(dtype="int64"),
            "tokens_lost": pd.Series(dtype="int64"),
            "frac_kept": pd.Series(dtype="float64"),
        }
    )
    if not len(hist):
        return empty
    g = hist.groupby("v", as_index=False)["cnt"].sum()
    v = g["v"].to_numpy(np.int64)
    c = g["cnt"].to_numpy(np.int64)
    n_docs = int(c.sum())
    tok_total = int((v * c).sum())
    out = []
    for b in budgets:
        fit = v <= b
        n_fit = int(c[fit].sum())
        kept = int((np.minimum(v, b) * c).sum())
        out.append(
            {
                "budget": b,
                "n_docs": n_docs,
                "n_fit": n_fit,
                "tokens_total": tok_total,
                "tokens_kept": kept,
                "tokens_lost": tok_total - kept,
                "frac_kept": kept / tok_total if tok_total else 0.0,
            }
        )
    return pd.DataFrame(out).astype(
        {
            "budget": "int64",
            "n_docs": "int64",
            "n_fit": "int64",
            "tokens_total": "int64",
            "tokens_kept": "int64",
            "tokens_lost": "int64",
            "frac_kept": "float64",
        }
    )


def violation_counts_roundtrip(seq_path: str) -> pd.DataFrame:
    """The SINK behind the gate: run the row-violation pass, WRITE the
    per-violation rows to a fresh partitioned parquet directory (one
    subdir per check_name — the resumable layout), then READ the
    directory back and aggregate — so the driver's hash compares bytes
    that made a full write→read round trip through the production sink,
    not an in-memory shortcut.  The output dir is unique per invocation
    (tmp + uuid; cleaned after the read) — two concurrent gates never
    share a path (the events_first_seen ADVICE discipline).

    Output (check_name, n) — identical to v_violation_counts by
    construction; the twin IS that oracle."""
    import shutil
    import uuid
    from pathlib import Path

    from hepdata_validator_ray.checks.base import CheckContext

    out = Path("/tmp/hvr_roundtrip") / uuid.uuid4().hex[:12]
    pairs = ray.data.read_parquet(seq_path).map_batches(
        lambda b: _violation_pairs_batch(b, CheckContext()),
        batch_format="pyarrow",
        batch_size=8192,
    )
    pairs.write_parquet(str(out), partition_cols=["check_name"])
    try:
        back = (
            ray.data.read_parquet(str(out))
            .groupby("check_name")
            .count()
            .to_pandas()
            .rename(columns={"count()": "n"})
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    back["n"] = back["n"].astype("int64")
    return back[["check_name", "n"]]


def source_ks_matrix(seq_path: str) -> pd.DataFrame:
    """Pairwise two-sample Kolmogorov–Smirnov distance between every two
    sources' n_tok distributions — the shape-difference leg of the
    cross-source panel (JS sees token mix, xent sees LM fit; KS sees the
    LENGTH CDF, the thing curriculum packing actually consumes).  The KS
    numerator is exact: max_v |cum_a·n_b − cum_b·n_a| in Python ints
    (cum·n overflows int64 at the 10¹² tier; HUGEINT twin); the single
    float is its division by n_a·n_b, spelled identically.

    Everything derives from the ONE shared (source, n_tok) bounded
    histogram exchange — |S|²·|V| driver arithmetic, the corpora never
    re-read.  Output (source_a, source_b, n_a, n_b, ks_num, ks) for
    a < b pairs."""
    hist, srcs = _source_ntok_histogram(seq_path)
    empty = pd.DataFrame(
        {
            "source_a": pd.Series(dtype="object"),
            "source_b": pd.Series(dtype="object"),
            "n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "ks_num": pd.Series(dtype="int64"),
            "ks": pd.Series(dtype="float64"),
        }
    )
    if not len(hist) or len(srcs) < 2:
        return empty
    vals = np.sort(hist["v"].unique())
    cums = {}
    ns = {}
    for ci, grp in hist.groupby("code"):
        grp = grp.sort_values("v")
        c = np.zeros(len(vals), dtype=np.int64)
        idx = np.searchsorted(vals, grp["v"].to_numpy(np.int64))
        c[idx] = grp["cnt"].to_numpy(np.int64)
        cums[int(ci)] = np.cumsum(c)
        ns[int(ci)] = int(c.sum())
    out = []
    codes = sorted(cums)
    for i, a in enumerate(codes):
        for b in codes[i + 1 :]:
            na, nb = ns[a], ns[b]
            # Python-int cross products: exact at any scale
            diffs = [abs(int(ca) * nb - int(cb) * na) for ca, cb in zip(cums[a], cums[b])]
            num = max(diffs)
            out.append(
                {
                    "source_a": srcs[a],
                    "source_b": srcs[b],
                    "n_a": na,
                    "n_b": nb,
                    "ks_num": num,
                    "ks": float(num) / (float(na) * float(nb)),
                }
            )
    return pd.DataFrame(out).astype(
        {"n_a": "int64", "n_b": "int64", "ks_num": "int64", "ks": "float64"}
    )


def doc_max_token_run(seq_path: str, vocab_size: int | None = None) -> "ray.data.Dataset":
    """Per-document longest run of one repeated VALID token — the
    stutter/padding-leak detector orthogonal to entropy (a doc can have
    healthy global entropy yet carry a 500-token pad run).  Invalid
    (out-of-vocab) positions BREAK runs on both engines: the twin's run
    grouper keys on raw positions, so a removed position splits the
    group, and the kernel mirrors that by making every invalid position
    its own never-counted segment.  Rows with NULL doc_id or no valid
    token emit nothing; duplicate doc_ids stay separate rows (the
    doc_token_entropy row-preserving discipline).

    ENTIRELY map-side — one boundary-mask pass over the flat token
    buffer per batch; corpus-scale per-doc output streams.

    Output (doc_id, n_tok, max_run)."""
    V = int(vocab_size or CheckContext().vocab_size)

    _EMPTY = pa.Table.from_pydict(
        {
            "doc_id": pa.array([], pa.string()),
            "n_tok": pa.array([], pa.int64()),
            "max_run": pa.array([], pa.int64()),
        }
    )

    def per_doc(batch: pa.Table) -> pa.Table:
        view = prepare_view(batch)
        if "flat" not in view or "doc_id" not in view:
            return _EMPTY
        flat, lens = view["flat"], view["lens"]
        n = len(flat)
        if n == 0:
            return _EMPTY
        tok = flat.astype(np.int64)
        row_of = np.repeat(np.arange(view["n"], dtype=np.int64), np.maximum(lens, 0))
        valid = (tok >= 0) & (tok < V) & ~view["doc_null"][row_of]
        if not valid.any():
            return _EMPTY
        new_seg = np.ones(n, dtype=bool)
        if n > 1:
            new_seg[1:] = (
                (tok[1:] != tok[:-1])
                | (row_of[1:] != row_of[:-1])
                | ~valid[1:]
                | ~valid[:-1]
            )
        seg = np.cumsum(new_seg) - 1
        nseg = int(seg[-1]) + 1
        counts = np.bincount(seg[valid], minlength=nseg)
        starts = np.flatnonzero(new_seg)
        seg_row = row_of[starts]  # segments are position-contiguous per row
        mr = np.zeros(view["n"], dtype=np.int64)
        live = counts > 0
        np.maximum.at(mr, seg_row[live], counts[live])
        keep = mr > 0
        rows = np.flatnonzero(keep)
        return pa.Table.from_pydict(
            {
                "doc_id": view["doc_id"].take(pa.array(rows)),
                "n_tok": pa.array(np.maximum(lens, 0)[rows].astype(np.int64), pa.int64()),
                "max_run": pa.array(mr[rows], pa.int64()),
            }
        )

    return ray.data.read_parquet(seq_path, columns=["doc_id", "tokens"]).map_batches(
        per_doc, batch_format="pyarrow", batch_size=8192
    )


def vocab_utilization_by_source(seq_path: str, vocab_size: int | None = None) -> pd.DataFrame:
    """Per-source vocabulary utilization: how many distinct VALID token
    ids the source touches and what fraction of the tokenizer's V that
    is — the "is this source exercising the vocab or looping a template"
    number, and the per-source companion of vocab growth/churn.  Rides
    the shared bounded unigram exchange (|sources|·V however large the
    corpus); validity [0, V) matches the builder; utilization = the only
    double.

    Output (source, n_distinct, n_tokens, utilization)."""
    V = int(vocab_size or CheckContext().vocab_size)
    uni, _srcs = _source_token_unigram(seq_path, V)
    if not len(uni):
        return pd.DataFrame(
            {
                "source": pd.Series(dtype="object"),
                "n_distinct": pd.Series(dtype="int64"),
                "n_tokens": pd.Series(dtype="int64"),
                "utilization": pd.Series(dtype="float64"),
            }
        )
    g = uni.groupby("source", as_index=False).agg(n_distinct=("tok", "size"), n_tokens=("cnt", "sum"))
    g["utilization"] = g["n_distinct"].to_numpy(np.int64) / float(V)
    return g.astype({"n_distinct": "int64", "n_tokens": "int64", "utilization": "float64"})


def source_ntok_quantiles(seq_path: str) -> pd.DataFrame:
    """Per-source p50/p90/p99 of n_tok under the pinned 1-based-ceil(q·n)
    disc-quantile rank rule — the per-source tail panel that picks each
    stratum's packing budget (the global quantiles hide a long-doc
    source behind a short-doc majority).  Pure rank arithmetic on the
    shared bounded (source, n_tok) histogram; all-integer output.

    Output (source, n, p50, p90, p99)."""
    hist, srcs = _source_ntok_histogram(seq_path)
    if not len(hist):
        return pd.DataFrame(
            {
                "source": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "p50": pd.Series(dtype="int64"),
                "p90": pd.Series(dtype="int64"),
                "p99": pd.Series(dtype="int64"),
            }
        )
    out = []
    for ci, grp in hist.groupby("code", sort=True):
        grp = grp.sort_values("v", kind="mergesort")
        v = grp["v"].to_numpy(np.int64)
        c = grp["cnt"].to_numpy(np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)
        q = {
            name: int(v[np.searchsorted(cum, max(int(np.ceil(frac * n)), 1))])
            for name, frac in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))
        }
        out.append({"source": srcs[int(ci)], "n": n, **q})
    return pd.DataFrame(out).astype({"n": "int64", "p50": "int64", "p90": "int64", "p99": "int64"})


def length_bias_by_source(seq_path: str) -> pd.DataFrame:
    """Per-source length-bias pair: the plain mean doc length Σvc/Σc vs
    the TOKEN-WEIGHTED mean Σv²c/Σvc (the length of the doc a random
    TOKEN sits in — the waiting-time-paradox view).  Their ratio ≥ 1 is
    the heavy-tail flag: 1 means uniform lengths, 2 means half the
    budget lives in docs twice the average.  All three sums exact
    integers off the shared bounded histogram (Σv²c in Python ints —
    HUGEINT twin); the three doubles spelled identically.  Sources with
    zero total tokens take the mirrored CASE 0.

    Output (source, n_docs, mean_len, token_weighted_len, bias)."""
    hist, srcs = _source_ntok_histogram(seq_path)
    if not len(hist):
        return pd.DataFrame(
            {
                "source": pd.Series(dtype="object"),
                "n_docs": pd.Series(dtype="int64"),
                "mean_len": pd.Series(dtype="float64"),
                "token_weighted_len": pd.Series(dtype="float64"),
                "bias": pd.Series(dtype="float64"),
            }
        )
    out = []
    for ci, grp in hist.groupby("code", sort=True):
        v = [int(x) for x in grp["v"]]
        c = [int(x) for x in grp["cnt"]]
        n = sum(c)
        t = sum(vi * ci_ for vi, ci_ in zip(v, c))
        t2 = sum(vi * vi * ci_ for vi, ci_ in zip(v, c))  # exact past int64
        mean = t / n
        twl = t2 / t if t > 0 else 0.0
        out.append(
            {
                "source": srcs[int(ci)],
                "n_docs": n,
                "mean_len": mean,
                "token_weighted_len": twl,
                "bias": twl / mean if t > 0 else 0.0,
            }
        )
    return pd.DataFrame(out).astype(
        {"n_docs": "int64", "mean_len": "float64", "token_weighted_len": "float64", "bias": "float64"}
    )


def ntok_mode_by_source(seq_path: str) -> pd.DataFrame:
    """Per-source modal doc length — the padding/template tell the mean
    and quantiles both smear out (a hard spike at one length means
    machine-generated records; natural text has a broad mode).  Smallest
    length on count ties (row_number rule).  Pure argmax on the shared
    bounded histogram; all-integer output plus the one mirrored share.

    Output (source, n, mode_len, mode_count, mode_share)."""
    hist, srcs = _source_ntok_histogram(seq_path)
    if not len(hist):
        return pd.DataFrame(
            {
                "source": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "mode_len": pd.Series(dtype="int64"),
                "mode_count": pd.Series(dtype="int64"),
                "mode_share": pd.Series(dtype="float64"),
            }
        )
    out = []
    for ci, grp in hist.groupby("code", sort=True):
        grp = grp.sort_values(["cnt", "v"], ascending=[False, True], kind="mergesort")
        n = int(grp["cnt"].sum())
        out.append(
            {
                "source": srcs[int(ci)],
                "n": n,
                "mode_len": int(grp["v"].iloc[0]),
                "mode_count": int(grp["cnt"].iloc[0]),
                "mode_share": int(grp["cnt"].iloc[0]) / float(n),
            }
        )
    return pd.DataFrame(out).astype(
        {"n": "int64", "mode_len": "int64", "mode_count": "int64", "mode_share": "float64"}
    )


def token_gini(seq_path: str, vocab_size: int | None = None) -> pd.DataFrame:
    """Gini of the corpus token-frequency distribution over the ids that
    OCCUR — the vocabulary-concentration number beside the Zipf slope
    (natural text is highly concentrated, ≈0.95+; uniform synthetic noise
    sits near 0) and the count-of-counts spectrum.  Exact arithmetic: the
    V-bounded unigram counts collapse to their count-of-counts and the
    grouped-data tie-block identity runs in Python ints (the v_gini_ntok
    discipline, HUGEINT twin); the Gini itself is the only double,
    spelled identically.

    Output one row (n_types, n_tokens, gini)."""
    V = int(vocab_size or CheckContext().vocab_size)
    uni, _srcs = _source_token_unigram(seq_path, V)
    if not len(uni):
        return pd.DataFrame(
            [{"n_types": 0, "n_tokens": 0, "gini": 0.0}]
        ).astype({"n_types": "int64", "n_tokens": "int64"})
    tok_counts = uni.groupby("tok")["cnt"].sum()  # ≤ V rows
    vals, reps = np.unique(tok_counts.to_numpy(np.int64), return_counts=True)
    s_iv = 0
    nprev = 0
    s_v = 0
    for v, cc in zip(vals.tolist(), reps.tolist()):
        s_iv += cc * nprev * v + v * cc * (cc + 1) // 2
        s_v += cc * v
        nprev += cc
    n = nprev
    gini = 2.0 * s_iv / (n * s_v) - (n + 1.0) / n if n * s_v > 0 else 0.0
    return pd.DataFrame(
        [{"n_types": n, "n_tokens": s_v, "gini": gini}]
    ).astype({"n_types": "int64", "n_tokens": "int64"})
