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
