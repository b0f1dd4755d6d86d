"""Table profiling: per-column completeness / cardinality / extrema —
the distributed analogue of DuckDB's SUMMARIZE, as two streamed passes:

1. **stats pass** — per batch, one tiny partial row per column
   (n, n_null, min, max as strings); the driver reduces O(n_batches x
   n_cols) rows, re-typing min/max per column dtype so numeric extrema
   reduce numerically, not lexically.
2. **distinct pass** — per-batch per-column distinct value HASHES
   (one C-siphash pass; int64 bit views through the exchange), a
   column-keyed bucketed exchange, per-bucket distinct count, driver sum.
   Hash-distinct is the scale path (the tfidf-df precedent: ~2^-64
   collision odds vs SQL COUNT(DISTINCT)); nulls are excluded on both
   sides.

Output: (column, n_rows, n_nulls, n_distinct, min_v, max_v) with extrema
cast to VARCHAR — binary (codepoint) string ordering matches DuckDB's
default collation for ASCII corpora.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_PROFILE_KEY = "hvr-profile-col!"  # 16-byte siphash key


def _fmt(v) -> str | None:
    if v is None or (isinstance(v, float) and v != v):
        return None
    return str(v)


def profile_table(path: str, columns: list[str] | None = None) -> pd.DataFrame:
    """Per-column profile of a parquet table (see module docstring)."""
    import pyarrow.compute as pc

    from hepdata_validator_ray.ops import bucketed_aggregate

    ds = ray.data.read_parquet(path, columns=columns)
    schema = ds.schema()  # ray.data Schema: parallel .names / .types lists
    cols = list(columns or schema.names)
    col_type = dict(zip(schema.names, schema.types))
    n_rows = ds.count()  # metadata-only on a fresh parquet read

    def stats_partial(t: pa.Table) -> pa.Table:
        recs = []
        for ci, c in enumerate(cols):
            arr = t.column(c)
            n_null = arr.null_count
            if len(arr) - n_null > 0:
                mm = pc.min_max(arr)
                vmin, vmax = _fmt(mm["min"].as_py()), _fmt(mm["max"].as_py())
            else:
                vmin = vmax = None
            recs.append({"ci": ci, "n_null": n_null, "vmin": vmin, "vmax": vmax})
        return pa.Table.from_pylist(recs)

    parts = ds.map_batches(stats_partial, batch_format="pyarrow", batch_size=65536).to_pandas()

    def distinct_partial(t: pa.Table) -> pa.Table:
        ci_out, h_out = [], []
        for ci, c in enumerate(cols):
            vals = t.column(c).to_pandas()
            vals = vals[vals.notna()]
            if not len(vals):
                continue
            h = np.unique(
                pd.util.hash_array(vals.to_numpy(dtype=object), hash_key=_PROFILE_KEY)
            )
            ci_out.append(np.full(len(h), ci, dtype=np.int64))
            # int64 BIT VIEW: uint64 keys above 2^63 silently fall back to
            # pickled-object blocks in the native exchange (SURVEY round-3)
            h_out.append(h.view(np.int64))
        if not ci_out:
            return pa.Table.from_pydict(
                {"ci": pa.array([], type=pa.int64()), "h": pa.array([], type=pa.int64())}
            )
        return pa.Table.from_pydict(
            {"ci": np.concatenate(ci_out), "h": np.concatenate(h_out)}
        )

    def distinct_combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        g = df.groupby("ci", as_index=False).agg(nd=("h", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    nd_parts = bucketed_aggregate(ds, "h", distinct_partial, distinct_combine).to_pandas()
    nd = nd_parts.groupby("ci")["nd"].sum() if len(nd_parts) else pd.Series(dtype="int64")

    # typed min/max reduce: parse the per-batch string extrema back through
    # the column dtype so numeric columns reduce numerically
    out = []
    for ci, c in enumerate(cols):
        sub = parts[parts["ci"] == ci]
        typ = col_type[c]
        lo = hi = None
        vals_lo = [v for v in sub["vmin"] if v is not None]
        vals_hi = [v for v in sub["vmax"] if v is not None]
        if vals_lo:
            if pa.types.is_integer(typ):
                lo, hi = str(min(int(v) for v in vals_lo)), str(max(int(v) for v in vals_hi))
            elif pa.types.is_floating(typ):
                lo, hi = str(min(float(v) for v in vals_lo)), str(max(float(v) for v in vals_hi))
            else:
                lo, hi = min(vals_lo), max(vals_hi)
        out.append(
            {
                "column": c,
                "n_rows": int(n_rows),
                "n_nulls": int(sub["n_null"].sum()),
                "n_distinct": int(nd.get(ci, 0)),
                "min_v": lo,
                "max_v": hi,
            }
        )
    return pd.DataFrame(out)


def profile_oracle_sql(table: str, columns: list[str]) -> str:
    """DuckDB SQL computing the identical profile (exact COUNT(DISTINCT)
    vs the Ray side's hash-distinct — the accepted ~2^-64 trade)."""
    legs = []
    for c in columns:
        legs.append(
            f"""SELECT '{c}' AS column, count(*)::BIGINT AS n_rows,
       (count(*) - count({c}))::BIGINT AS n_nulls,
       count(DISTINCT {c})::BIGINT AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_v, CAST(max({c}) AS VARCHAR) AS max_v
FROM {table}"""
        )
    return "\nUNION ALL ".join(legs)


def label_purity_stats(docs_path: str) -> "ray.data.Dataset":
    """Functional-dependency / label-purity audit over (source → lang):
    per source, how many distinct lang labels occur, how many rows there
    are, and how many carry the MAJORITY label — n_majority/n_rows is the
    purity, n_langs > 1 the FD violation signal (a mislabeled-partition
    detector).  Majority ties break toward the lexicographically smallest
    lang so both engines agree.

    One (source, lang) pair-counts exchange — bounded by
    |sources|×|langs| at any corpus size — then the per-source argmax is
    driver arithmetic on that tiny table."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count

    pairs = (
        ray.data.read_parquet(docs_path, columns=["source", "lang"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["source"], pa.scalar("<NULL>", pa.string())),
                    pc.coalesce(t["lang"], pa.scalar("<NULL>", pa.string())),
                ],
                names=["source", "lang"],
            ),
            batch_format="pyarrow",
        )
        .groupby(["source", "lang"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()  # |sources| x |langs|, bounded
    )
    if not len(pairs):
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "source": pd.Series(dtype="object"),
                    "n_rows": pd.Series(dtype="int64"),
                    "n_langs": pd.Series(dtype="int64"),
                    "n_majority": pd.Series(dtype="int64"),
                }
            )
        )
    rows = []
    for src, grp in pairs.groupby("source", sort=True):
        grp = grp.sort_values(["n", "lang"], ascending=[False, True])
        rows.append(
            {
                "source": src,
                "n_rows": int(grp["n"].sum()),
                "n_langs": int(len(grp)),
                "n_majority": int(grp["n"].iloc[0]),
            }
        )
    return ray.data.from_pandas(
        pd.DataFrame(rows).astype({"n_rows": "int64", "n_langs": "int64", "n_majority": "int64"})
    )


def k_anonymity_stats(docs_path: str, k: int = 5) -> "ray.data.Dataset":
    """k-anonymity cell-size audit over the (source, lang) quasi-identifier
    pair — the governance pre-check before releasing per-cell statistics
    or sampling per cell: a cell with fewer than ``k`` rows identifies its
    members.  Per source: (n_rows, n_cells, n_small_cells, min_cell) where
    cells are the (source, lang) groups and small means n < k.

    One (source, lang) pair-counts exchange — |sources|×|langs|-bounded at
    any corpus size — then driver arithmetic on the tiny table."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count

    pairs = (
        ray.data.read_parquet(docs_path, columns=["source", "lang"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["source"], pa.scalar("<NULL>", pa.string())),
                    pc.coalesce(t["lang"], pa.scalar("<NULL>", pa.string())),
                ],
                names=["source", "lang"],
            ),
            batch_format="pyarrow",
        )
        .groupby(["source", "lang"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()  # |sources| x |langs|, bounded
    )
    if not len(pairs):
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "source": pd.Series(dtype="object"),
                    "n_rows": pd.Series(dtype="int64"),
                    "n_cells": pd.Series(dtype="int64"),
                    "n_small_cells": pd.Series(dtype="int64"),
                    "min_cell": pd.Series(dtype="int64"),
                }
            )
        )
    g = (
        pairs.assign(one=1, small=(pairs["n"] < k).astype("int64"))
        .groupby("source", as_index=False, sort=True)
        .agg(
            n_rows=("n", "sum"),
            n_cells=("one", "sum"),
            n_small_cells=("small", "sum"),
            min_cell=("n", "min"),
        )
        .astype(
            {"n_rows": "int64", "n_cells": "int64", "n_small_cells": "int64", "min_cell": "int64"}
        )
    )
    return ray.data.from_pandas(g)


def score_auc_by_source(docs_path: str, pos_lang: str = "en") -> pd.DataFrame:
    """Exact ROC AUC per source of the n_chars score predicting
    ``lang == pos_lang`` — the ranking-quality audit for any data-quality
    scorer: AUC is the probability a random positive outranks a random
    negative (the Mann–Whitney U statistic), computed EXACTLY from the
    bounded (source, n_chars) → (pos, neg) histogram, never from a
    corpus-scale sort.

    One packed-key bucketed exchange (code·2^40 + n_chars; dense source
    codes from the |sources|-bounded pre-pass) carries two count columns;
    per source the rank-sum identity over the value-sorted histogram is

        U·2 = Σ_v pos_v · (2·neg_below(v) + neg_v),   AUC = U2 / (2·P·N)

    — ties contribute the standard half credit, and every term is exact
    Python-int arithmetic over the bounded table (DuckDB's HUGEINT sum is
    the twin).  Degenerate sources (all-positive or all-negative) report
    AUC 0 via the same CASE as the SQL.  NULL lang counts as negative
    (SQL CASE WHEN lang = pos THEN 1 ELSE 0); NULL n_chars rows are
    excluded on both engines.

    Output (source, n_pos, n_neg, auc)."""
    import pyarrow.compute as pc

    from hepdata_validator_ray.ops import bucketed_aggregate
    from hepdata_validator_ray.pipelines.validation import _source_codes

    M = np.int64(1) << np.int64(40)  # n_chars < 2^40 by the packed-key contract
    srcs = _source_codes(docs_path)
    code_of = {s: i for i, s in enumerate(srcs)}

    def partial(batch: pa.Table) -> pa.Table:
        src = pc.coalesce(batch["source"], pa.scalar("<NULL>", pa.string())).to_pylist()
        v = batch["n_chars"].to_numpy(zero_copy_only=False)
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        codes = np.fromiter((code_of[s] for s in src), dtype=np.int64, count=len(src))
        ok = ~pd.isna(v)
        vi = v[ok].astype(np.int64)
        keep = vi >= 0
        key = codes[ok][keep] * M + vi[keep]
        is_pos = (lang[ok][keep] == pos_lang).astype(np.int64)
        uniq, inv = np.unique(key, return_inverse=True)
        pos = np.bincount(inv, weights=is_pos, minlength=len(uniq)).astype(np.int64)
        neg = np.bincount(inv, weights=1 - is_pos, minlength=len(uniq)).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "key": pa.array(uniq, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "neg": pa.array(neg, pa.int64()),
            }
        )

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("key").aggregate([("pos", "sum"), ("neg", "sum")])
        return g.rename_columns(["key", "pos", "neg"])

    hist = bucketed_aggregate(
        ray.data.read_parquet(docs_path, columns=["source", "lang", "n_chars"]),
        "key",
        partial,
        combine,
    ).to_pandas()  # ≤ |sources| × |distinct n_chars|, bounded
    out = []
    if len(hist):
        hist["code"] = hist["key"].to_numpy(np.int64) // M
        hist["v"] = hist["key"].to_numpy(np.int64) % M
        for code, grp in hist.groupby("code", sort=True):
            grp = grp.sort_values("v", kind="mergesort")
            u2 = 0
            negbelow = 0
            p_tot = 0
            n_tot = 0
            # bounded histogram rows: exact Python ints (U overflows int64
            # at the 10^12-row tier; DuckDB HUGEINT is the twin)
            for p_v, n_v in zip(grp["pos"].tolist(), grp["neg"].tolist()):
                u2 += p_v * (2 * negbelow + n_v)
                negbelow += n_v
                p_tot += p_v
                n_tot += n_v
            auc = u2 / (2.0 * p_tot * n_tot) if p_tot * n_tot > 0 else 0.0
            out.append({"source": srcs[code], "n_pos": p_tot, "n_neg": n_tot, "auc": auc})
    if not out:
        return pd.DataFrame(
            {
                "source": pd.Series(dtype="object"),
                "n_pos": pd.Series(dtype="int64"),
                "n_neg": pd.Series(dtype="int64"),
                "auc": pd.Series(dtype="float64"),
            }
        )
    return pd.DataFrame(out).astype({"n_pos": "int64", "n_neg": "int64", "auc": "float64"})


def lang_source_residuals(docs_path: str) -> pd.DataFrame:
    """(lang × source) contingency audit: observed cell counts against
    independence-expected counts with Pearson residuals (O−E)/√E — the
    rare/over-represented-combination detector (e.g. a crawl slice where
    one language floods one source).  |langs|·|sources| is tiny however
    large the corpus: ONE low-cardinality grouped count is the only
    exchange; marginals and residuals are arithmetic over the bounded
    cell table, the expression spelled identically in the SQL twin
    (E = row_tot·col_tot/N as DOUBLE).

    Output (lang, source, n, expected, residual)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count as _Count

    cells = (
        ray.data.read_parquet(docs_path, columns=["lang", "source"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["lang"], pa.scalar("<NULL>", pa.string())),
                    pc.coalesce(t["source"], pa.scalar("<NULL>", pa.string())),
                ],
                names=["lang", "source"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["lang", "source"])
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )  # |langs| × |sources|, bounded
    if not len(cells):
        return pd.DataFrame(
            {
                "lang": pd.Series(dtype="object"),
                "source": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "expected": pd.Series(dtype="float64"),
                "residual": pd.Series(dtype="float64"),
            }
        )
    n = cells["n"].astype("int64")
    row_tot = cells.groupby("lang")["n"].transform("sum").astype("int64")
    col_tot = cells.groupby("source")["n"].transform("sum").astype("int64")
    total = int(n.sum())
    expected = (row_tot.to_numpy(np.float64) * col_tot.to_numpy(np.float64)) / total
    residual = (n.to_numpy(np.float64) - expected) / np.sqrt(expected)
    out = pd.DataFrame(
        {
            "lang": cells["lang"],
            "source": cells["source"],
            "n": n,
            "expected": expected,
            "residual": residual,
        }
    )
    return out.sort_values(["lang", "source"]).reset_index(drop=True)


def _skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Keep-mask of the (maximize x, minimize y) pareto frontier under
    strict domination: a dominates b iff a.x ≥ b.x, a.y ≤ b.y and one is
    strict — so coordinate-identical points survive together.  Vectorized:
    sort (x DESC, y ASC); within an x-group only the group-min y survives
    (same x, smaller y dominates); across groups a point survives iff its
    y is strictly below every strictly-larger-x group's minimum."""
    order = np.lexsort((y, -x))
    xs, ys = x[order], y[order]
    new_group = np.ones(len(xs), dtype=bool)
    new_group[1:] = xs[1:] != xs[:-1]
    gidx = np.cumsum(new_group) - 1
    gm = ys[new_group]  # per-group min y (first y: ties sort ascending)
    prevmin = np.full(len(gm), np.inf)
    if len(gm) > 1:
        prevmin[1:] = np.minimum.accumulate(gm[:-1])
    keep_sorted = (ys == gm[gidx]) & (gm[gidx] < prevmin[gidx])
    keep = np.zeros(len(x), dtype=bool)
    keep[order] = keep_sorted
    return keep


def docs_pareto_frontier(docs_path: str, batch_size: int = 8192) -> pd.DataFrame:
    """Pareto/skyline extremes of the corpus on (n_chars ↑, n_words ↓) —
    the docs no other doc beats on BOTH axes: maximal characters with
    minimal whitespace words, i.e. the extreme-fertility outliers a
    tokenizer budget review looks at first.  The operator is the generic
    2-D skyline; the axes are the length-vs-wordcount pair every doc
    already carries.  n_words follows the repo's string_split(' ')
    convention (empty segments count); NULL text / n_chars rows drop
    (mirrored WHERE).

    Physical plan: every global frontier point is on its own batch's
    local frontier, so per-batch vectorized skylines emit candidates and
    the driver re-runs the identical rule once over the merged candidate
    set (the partial-top-k/ANN merge discipline).  Candidate volume is
    Σ per-batch frontier sizes — tiny on real corpora; adversarially
    anti-correlated data degrades toward a full pass, which the NOT
    EXISTS twin shares.

    Output (doc_id, n_chars, n_words)."""

    def local_frontier(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["text"].notna() & df["n_chars"].notna()
        d = df[ok]
        if not len(d):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype=df["doc_id"].dtype),
                    "n_chars": pd.Series(dtype="int64"),
                    "n_words": pd.Series(dtype="int64"),
                }
            )
        x = d["n_chars"].to_numpy(np.int64)
        y = d["text"].str.split(" ").str.len().to_numpy(np.int64)
        keep = _skyline_mask(x, y)
        return pd.DataFrame(
            {"doc_id": d["doc_id"].to_numpy()[keep], "n_chars": x[keep], "n_words": y[keep]}
        )

    cands = (
        ray.data.read_parquet(docs_path, columns=["doc_id", "text", "n_chars"])
        .map_batches(local_frontier, batch_format="pandas", batch_size=batch_size)
        .to_pandas()
    )  # Σ per-batch frontiers — the documented merge bound
    if not len(cands):
        return cands
    keep = _skyline_mask(cands["n_chars"].to_numpy(np.int64), cands["n_words"].to_numpy(np.int64))
    return cands[keep].reset_index(drop=True)


def docs_dup_rate_by_source(docs_path: str, num_buckets: int | None = None) -> pd.DataFrame:
    """Per-source duplication rate: 1 − distinct(text)/n — the FIRST
    number a curation run reads per source (a 40%-dup crawl slice gets a
    different pipeline than a 2% one).  NULL-text rows are excluded from
    both counts (a missing doc is not a duplicate of another missing
    doc); NULL source is the '<NULL>' stratum.

    Distinctness is hash-distinct (the profile/tfidf-df scale path,
    ~2⁻⁶⁴ collision odds vs the twin's COUNT(DISTINCT text)): per batch
    one C-siphash pass emits distinct (hash, source) pairs, the
    hash-keyed exchange co-locates each pair in ONE bucket, buckets
    count distinct pairs per source, the driver sums the |sources|-
    bounded partials.  Full texts never leave their batch.

    Output (source, n_docs, n_distinct, dup_rate)."""
    from hepdata_validator_ray.ops import (
        BUCKET_COL,
        bucketed_aggregate,
        derive_num_buckets_path,
        with_bucket,
    )

    if num_buckets is None:
        num_buckets = derive_num_buckets_path(docs_path)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "src": t["source"].to_pandas().fillna("<NULL>"),
                "txt": t["text"].to_pandas(),
            }
        )
        df = df[df["txt"].notna()]
        if not len(df):
            return pa.Table.from_pydict(
                {"h": pa.array([], pa.int64()), "src": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        h = pd.util.hash_array(
            df["txt"].to_numpy(dtype=object), hash_key=_PROFILE_KEY, categorize=False
        ).view(np.int64)
        g = pd.DataFrame({"h": h, "src": df["src"].to_numpy()})
        counts = g.groupby("src", as_index=False).size()
        g = g.drop_duplicates()
        out = pd.concat(
            [
                pd.DataFrame({"h": g["h"], "src": g["src"], "cnt": np.zeros(len(g), np.int64)}),
                pd.DataFrame(
                    {
                        "h": np.full(len(counts), -1, dtype=np.int64),
                        "src": counts["src"],
                        "cnt": counts["size"].to_numpy(np.int64),
                    }
                ),
            ],
            ignore_index=True,
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        is_cnt = df["cnt"].to_numpy() > 0
        rows = df[is_cnt].groupby("src", as_index=False)["cnt"].sum().rename(columns={"cnt": "n_docs"})
        dis = (
            df[~is_cnt]
            .drop_duplicates(["h", "src"])
            .groupby("src", as_index=False)
            .size()
            .rename(columns={"size": "n_distinct"})
        )
        out = rows.merge(dis, on="src", how="outer").fillna(0)
        return out.astype({"n_docs": "int64", "n_distinct": "int64"})

    ds = ray.data.read_parquet(docs_path, columns=["source", "text"])
    parts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .map_batches(lambda t: with_bucket(t, "h", num_buckets), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )  # ≤ |sources| × n_buckets, bounded
    if not len(parts):
        return pd.DataFrame(
            {
                "source": pd.Series(dtype="object"),
                "n_docs": pd.Series(dtype="int64"),
                "n_distinct": pd.Series(dtype="int64"),
                "dup_rate": pd.Series(dtype="float64"),
            }
        )
    out = parts.groupby("src", as_index=False).agg(
        n_docs=("n_docs", "sum"), n_distinct=("n_distinct", "sum")
    )
    out["dup_rate"] = 1.0 - out["n_distinct"].to_numpy(np.int64) / out["n_docs"].to_numpy(np.int64)
    return out.rename(columns={"src": "source"}).astype(
        {"n_docs": "int64", "n_distinct": "int64", "dup_rate": "float64"}
    )


def docs_length_scaling(docs_path: str, num_buckets: int | None = None) -> pd.DataFrame:
    """Per-source fertility scaling law: OLS of ln(n_chars) on ln(n_words)
    — the exponent says how characters grow with word count (slope ≈ 1 is
    linear text; a flat slope flags templated payloads where length is
    decoupled from word count), the per-source calibration number for
    byte→token budget planning.  Docs need text, n_chars ≥ 1 and
    n_words ≥ 1 (mirrored WHERE).

    Both engines sum the FIVE OLS terms over the SAME bounded
    (source, n_words, n_chars) joint histogram (integer features ⇒
    value-bounded; one packed-key exchange, the Spearman discipline), so
    parity rides c-weighted lns of identical integers — never corpus-
    order float sums.  Degeneracy (a single distinct n_words) is decided
    STRUCTURALLY via count(DISTINCT nw) — a float den == 0 test would
    land epsilon-nonzero on one engine and zero on the other.

    Output (source, n_docs, slope, intercept)."""
    from hepdata_validator_ray.ops import (
        bucketed_aggregate,
        derive_num_buckets_path,
        sum_counts_combine,
    )

    if num_buckets is None:
        num_buckets = derive_num_buckets_path(docs_path)

    SH_W = np.int64(1) << np.int64(21)
    SH_C = np.int64(1) << np.int64(42)
    srcs = sorted(
        ray.data.read_parquet(docs_path, columns=["source"])
        .map_batches(
            lambda t: pa.Table.from_pydict(
                {"source": pc.unique(pc.coalesce(t["source"], pa.scalar("<NULL>", pa.string())))}
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["source"]
        .unique()
        .tolist()
    )
    code_of = {s: i for i, s in enumerate(srcs)}

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "src": t["source"].to_pandas().fillna("<NULL>"),
                "txt": t["text"].to_pandas(),
                "nc": t["n_chars"].to_numpy(zero_copy_only=False),
            }
        )
        df = df[df["txt"].notna() & pd.notna(df["nc"])]
        if not len(df):
            return pa.Table.from_pydict({"key": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
        nw = df["txt"].str.split(" ").str.len().to_numpy(np.int64)
        nc = df["nc"].to_numpy(np.int64)
        code = np.fromiter((code_of[s] for s in df["src"]), dtype=np.int64, count=len(df))
        keep = (nw >= 1) & (nc >= 1)
        if len(nc[keep]) and (int(nw[keep].max()) >= (1 << 21) or int(nc[keep].max()) >= (1 << 21)):
            # explicit raise, not assert: python -O must not let an
            # oversized feature silently corrupt the packed key
            raise ValueError("n_words/n_chars exceed the 21-bit packing bound")
        key = code[keep] * SH_C + nw[keep] * SH_W + nc[keep]
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.Table.from_pydict(
            {"key": pa.array(uniq, pa.int64()), "cnt": pa.array(cnt, pa.int64())}
        )

    hist = bucketed_aggregate(
        ray.data.read_parquet(docs_path, columns=["source", "text", "n_chars"]),
        "key",
        partial,
        sum_counts_combine("key"),
        num_buckets=num_buckets,
    ).to_pandas()  # bounded by |sources| × |value pairs|
    empty = pd.DataFrame(
        {
            "source": pd.Series(dtype="object"),
            "n_docs": pd.Series(dtype="int64"),
            "slope": pd.Series(dtype="float64"),
            "intercept": pd.Series(dtype="float64"),
        }
    )
    if not len(hist):
        return empty
    key = hist["key"].to_numpy(np.int64)
    c = hist["cnt"].to_numpy(np.int64)
    code = key // SH_C
    x = np.log(((key % SH_C) // SH_W).astype(np.float64))
    y = np.log((key % SH_W).astype(np.float64))
    out = []
    for ci in np.unique(code):
        m = code == ci
        n = int(c[m].sum())
        cw = c[m].astype(np.float64)
        sx, sy = float((cw * x[m]).sum()), float((cw * y[m]).sum())
        sxx, sxy = float((cw * x[m] * x[m]).sum()), float((cw * x[m] * y[m]).sum())
        # degeneracy is decided STRUCTURALLY (one distinct integer x), not
        # by den == 0 — constant-x float dens land epsilon-nonzero and the
        # two engines would disagree on the branch
        n_x = len(np.unique(x[m]))
        den = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / den if n_x > 1 else 0.0
        intercept = (sy - slope * sx) / n
        out.append(
            {"source": srcs[int(ci)], "n_docs": n, "slope": slope, "intercept": intercept}
        )
    return pd.DataFrame(out).astype({"n_docs": "int64", "slope": "float64", "intercept": "float64"})


def docs_charclass_by_source(docs_path: str) -> pd.DataFrame:
    """Per-source character-class panel: total chars plus alpha / digit /
    space counts and their fractions — the cheap script/noise detector
    (HTML debris inflates punct-other, scraped tables inflate digits,
    CJK text craters ASCII-alpha).  Counts are exact integers from ONE
    streamed pass of per-batch vectorized regex counts (compiled once per
    class, |sources|-bounded partials); fractions are the only doubles,
    spelled identically.  NULL text drops; NULL source is '<NULL>'.

    Output (source, n_docs, n_chars, n_alpha, n_digit, n_space,
    frac_alpha, frac_digit, frac_space)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["text"].notna()
        d = df[ok]
        if not len(d):
            return pd.DataFrame(
                {
                    c: pd.Series(dtype="int64" if c != "source" else "object")
                    for c in ("source", "n_docs", "n_chars", "n_alpha", "n_digit", "n_space")
                }
            )
        src = d["source"].fillna("<NULL>")
        txt = d["text"]
        g = pd.DataFrame(
            {
                "source": src,
                "n_docs": 1,
                "n_chars": txt.str.len().to_numpy(np.int64),
                "n_alpha": txt.str.count(r"[A-Za-z]").to_numpy(np.int64),
                "n_digit": txt.str.count(r"[0-9]").to_numpy(np.int64),
                "n_space": txt.str.count(r" ").to_numpy(np.int64),
            }
        )
        return g.groupby("source", as_index=False).sum()

    parts = (
        ray.data.read_parquet(docs_path, columns=["source", "text"])
        .map_batches(partial, batch_format="pandas", batch_size=8192)
        .to_pandas()
    )  # |sources| × n_batches, bounded
    empty = pd.DataFrame(
        {
            "source": pd.Series(dtype="object"),
            "n_docs": pd.Series(dtype="int64"),
            "n_chars": pd.Series(dtype="int64"),
            "n_alpha": pd.Series(dtype="int64"),
            "n_digit": pd.Series(dtype="int64"),
            "n_space": pd.Series(dtype="int64"),
            "frac_alpha": pd.Series(dtype="float64"),
            "frac_digit": pd.Series(dtype="float64"),
            "frac_space": pd.Series(dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    g = parts.groupby("source", as_index=False).sum()
    nc = g["n_chars"].to_numpy(np.int64).astype(np.float64)
    for cls in ("alpha", "digit", "space"):
        with np.errstate(invalid="ignore"):
            g[f"frac_{cls}"] = np.where(nc > 0, g[f"n_{cls}"].to_numpy(np.int64) / nc, 0.0)
    return g.astype(
        {
            "n_docs": "int64", "n_chars": "int64", "n_alpha": "int64",
            "n_digit": "int64", "n_space": "int64",
            "frac_alpha": "float64", "frac_digit": "float64", "frac_space": "float64",
        }
    )


def source_concentration(docs_path: str) -> pd.DataFrame:
    """Corpus-level source concentration: the Herfindahl index of doc
    shares across sources (Σ share², 1/|S| = even mix → 1 = single
    source) and CR4, the top-4 sources' combined share — the "is this
    corpus secretly one crawl?" number a mixture plan starts from.
    (source_diversity is per-source over TOKENS; this is cross-source
    over DOCS.)  One |sources|-bounded value-counts exchange; the integer
    top-4 sum breaks count ties by source name (mirrored row_number);
    hhi = Σc²/N² and cr4 = top4/N are the only doubles, spelled
    identically (HUGEINT squares in the twin).

    Output one row (n_sources, n_docs, hhi, cr4)."""
    from hepdata_validator_ray.ops import grouped_value_counts

    counts = (
        grouped_value_counts(
            ray.data.read_parquet(docs_path, columns=["source"]).map_batches(
                lambda t: pa.Table.from_arrays(
                    [pc.coalesce(t["source"], pa.scalar("<NULL>", pa.string()))],
                    names=["source"],
                ),
                batch_format="pyarrow",
            ),
            "source",
        )
        .to_pandas()
        .sort_values(["cnt", "source"], ascending=[False, True], kind="mergesort")
    )  # |sources|, bounded
    if not len(counts):
        return pd.DataFrame(
            [{"n_sources": 0, "n_docs": 0, "hhi": 0.0, "cr4": 0.0}]
        ).astype({"n_sources": "int64", "n_docs": "int64"})
    c = counts["cnt"].to_numpy(np.int64)
    n = int(c.sum())
    top4 = int(c[:4].sum())
    sq = sum(int(v) * int(v) for v in c)  # exact past int64
    return pd.DataFrame(
        [
            {
                "n_sources": len(c),
                "n_docs": n,
                "hhi": float(sq) / (float(n) * float(n)),
                "cr4": float(top4) / float(n),
            }
        ]
    ).astype({"n_sources": "int64", "n_docs": "int64"})
