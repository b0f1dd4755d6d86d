"""Deterministic sampling / splitting operators (training-data staples).

Unlike ``ds.random_sample`` (seed-dependent on partitioning), these use a
content-derived hash (md5 of the key), so the assignment is reproducible
across runs, cluster sizes and file layouts — the property a 10^12-row
train/test split must have.  The md5-prefix construction is chosen for
cross-engine parity: DuckDB's ``('0x' || substr(md5(k),1,8))::UBIGINT``
computes the identical bucket, giving these operators exact SQL oracles.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import ray.data


def _bucket_of(values: list, mod: int = 100) -> list[int]:
    return [int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % mod for v in values]


def split_assignment(docs_path: str, key: str = "doc_id", test_pct: int = 10) -> "ray.data.Dataset":
    """Per-split row counts for a deterministic train/test split."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        buckets = _bucket_of(df[key].tolist())
        split = pd.Series(["test" if b < test_pct else "train" for b in buckets])
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
) -> "ray.data.Dataset":
    """Deterministic per-stratum sampling (e.g. downsample web-crawl, keep
    all curated sources): each stratum gets its own hash-bucket rate.
    Returns per-stratum kept counts — the rebalancing primitive of a
    training-data mix.  No shuffle beyond the tiny count aggregate."""
    rates = rates or {}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        buckets = np.asarray(_bucket_of(df[key].tolist()), dtype=np.int64)
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


def deterministic_sample(docs_path: str, key: str = "doc_id", pct: int = 5) -> "ray.data.Dataset":
    """The exact sampled row set (hash bucket < pct) — reproducible sampling
    as a filter, no shuffle."""

    def fil(df: pd.DataFrame) -> pd.DataFrame:
        buckets = _bucket_of(df[key].tolist())
        return df[[b < pct for b in buckets]][[key]]

    return ray.data.read_parquet(docs_path, columns=[key]).map_batches(
        fil, batch_format="pandas", batch_size=8192
    )
