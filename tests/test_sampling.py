"""Deterministic sampling/splitting: reproducibility and layout independence."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


def test_split_is_deterministic_and_complete():
    from hepdata_validator_ray.pipelines.sampling import split_assignment

    a = split_assignment(DOCS).to_pandas().set_index("split").n.to_dict()
    b = split_assignment(DOCS).to_pandas().set_index("split").n.to_dict()
    assert a == b
    assert sum(a.values()) == 500
    assert 0 < a.get("test", 0) < a.get("train", 500)


def test_sample_subset_of_split():
    from hepdata_validator_ray.pipelines.sampling import deterministic_sample, split_assignment

    sample = set(deterministic_sample(DOCS, pct=5).to_pandas().doc_id)
    bigger = set(deterministic_sample(DOCS, pct=20).to_pandas().doc_id)
    assert sample <= bigger  # nested samples: bucket<5 ⊂ bucket<20
    assert len(bigger) > len(sample) > 0


def test_deterministic_shuffle_ranks_duckdb_parity(ray_session):
    """Distributed two-pass rank vs DuckDB's row_number over the identical
    64-bit md5 ordering — exact frame equality."""
    import duckdb

    from hepdata_validator_ray.pipelines.sampling import deterministic_shuffle_ranks

    docs = "/root/testdata/sf0.001/documents.parquet"
    got = (
        deterministic_shuffle_ranks(docs, num_buckets=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT doc_id,
               (row_number() OVER (
                    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT,
                             doc_id) - 1)::BIGINT AS shuffle_rank
        FROM read_parquet('{docs}')
        ORDER BY doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_deterministic_shuffle_ranks_siphash_permutation(ray_session):
    """Production path: ranks form an exact permutation and are identical
    across different bucket counts (layout independence)."""
    import numpy as np

    from hepdata_validator_ray.pipelines.sampling import deterministic_shuffle_ranks

    docs = "/root/testdata/sf0.001/documents.parquet"
    a = (
        deterministic_shuffle_ranks(docs, key_fn="siphash", num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        deterministic_shuffle_ranks(docs, key_fn="siphash", num_buckets=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    r = np.sort(a["shuffle_rank"].to_numpy())
    assert (r == np.arange(len(a))).all()
    pd.testing.assert_frame_equal(a, b)


def test_mixture_copies_semantics(tmp_path):
    """Weight 250 → 2 copies + hash-selected 3rd for ~50%; 0 drops; 100 → 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.sampling import (
        _bucket_of,
        mixture_expand,
        mixture_resample_counts,
    )

    n = 200
    ids = np.arange(n, dtype=np.int64)
    src = np.where(ids % 4 == 0, "up", np.where(ids % 4 == 1, "drop", "rest")).astype(object)
    p = tmp_path / "docs.parquet"
    pq.write_table(pa.table({"doc_id": pa.array(ids), "source": pa.array(src)}), p)
    W = {"up": 250, "drop": 0}
    out = (
        mixture_resample_counts(str(p), W)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    up_ids = ids[src == "up"]
    frac_hits = int((_bucket_of(up_ids, mod=100, key_fn="md5") < 50).sum())
    assert out.loc["up", "n_rows_out"] == 2 * len(up_ids) + frac_hits
    assert "drop" not in out.index or out.loc["drop", "n_rows_out"] == 0
    assert out.loc["rest", "n_rows_out"] == out.loc["rest", "n_docs"]
    # drop-stratum docs are still COUNTED as input docs (n_docs leg)
    assert out.loc["drop", "n_docs"] == int((src == "drop").sum())

    exp = mixture_expand(str(p), W).to_pandas()
    per_doc = exp.groupby("doc_id").agg(n=("copy_idx", "size"), mx=("copy_idx", "max"))
    # copy_idx is a dense 0..n-1 range per doc
    assert (per_doc["mx"] == per_doc["n"] - 1).all()
    assert exp.groupby("doc_id").size().sum() == out["n_rows_out"].sum()
    assert not set(ids[src == "drop"]) & set(exp["doc_id"])


def test_mixture_siphash_twin(tmp_path):
    """The production key keeps the invariants (whole copies exact, frac
    slice within binomial range) without per-row hashlib."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.sampling import mixture_resample_counts

    n = 2000
    ids = np.arange(n, dtype=np.int64)
    p = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array(ids), "source": pa.array(["s"] * n)}), p
    )
    out = mixture_resample_counts(str(p), {"s": 130}, key_fn="siphash").to_pandas()
    got = int(out["n_rows_out"].iloc[0])
    assert n + int(0.20 * n) < got < n + int(0.40 * n)  # ~30% extra
    # deterministic: identical on re-run
    out2 = mixture_resample_counts(str(p), {"s": 130}, key_fn="siphash").to_pandas()
    assert got == int(out2["n_rows_out"].iloc[0])


def test_exact_k_nested_and_deterministic():
    from hepdata_validator_ray.pipelines.sampling import exact_k_sample

    a = exact_k_sample(DOCS, k=10)
    b = exact_k_sample(DOCS, k=50)
    # the k=10 sample is exactly the first 10 ranks of the k=50 sample
    assert list(a["doc_id"]) == list(b["doc_id"].head(10))
    assert list(a["rank"]) == list(range(1, 11))
    # siphash production twin is deterministic too
    c1 = exact_k_sample(DOCS, k=10, key_fn="siphash")
    c2 = exact_k_sample(DOCS, k=10, key_fn="siphash")
    assert list(c1["doc_id"]) == list(c2["doc_id"])


def test_exact_k_per_group_sizes():
    from hepdata_validator_ray.pipelines.sampling import exact_k_per_group

    out = exact_k_per_group(DOCS, k=3).to_pandas()
    sizes = out.groupby("source").size()
    # every stratum has >=3 docs at sf0.001, so every group returns exactly 3
    assert (sizes == 3).all()
    assert (out.groupby("source")["rank"].max() == 3).all()


def test_shard_skew_forecast_hot_key_salting(tmp_path, ray_session):
    """A corpus dominated by ONE source: the plain scheme must put every
    hot-key row on a SINGLE shard (that is the skew being forecast),
    while the salted scheme spreads them over up to n_salts shards;
    totals are conserved in both schemes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.sampling import shard_skew_forecast

    n_hot, n_cold = 400, 20
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(n_hot + n_cold)]),
            "source": pa.array(["hot"] * n_hot + [f"cold{i}" for i in range(n_cold)]),
            "n_tok": pa.array([3] * (n_hot + n_cold), pa.int32()),
        }
    )
    pq.write_table(t, tmp_path / "seq.parquet")
    got = shard_skew_forecast(str(tmp_path), n_shards=16, n_salts=8).to_pandas()
    plain = got[got.scheme == "plain"]
    salted = got[got.scheme == "salted"]
    # conservation: both schemes account for every row and every token
    assert int(plain.n_rows.sum()) == n_hot + n_cold == int(salted.n_rows.sum())
    assert int(plain.n_tok_sum.sum()) == 3 * (n_hot + n_cold) == int(salted.n_tok_sum.sum())
    # the forecastable skew: one shard carries ALL hot rows under plain...
    assert int(plain.n_rows.max()) >= n_hot
    # ...and salting strictly breaks it up (8 salts over 400 rows cannot
    # land on one shard with the md5 bucketer — pinned, deterministic)
    assert int(salted.n_rows.max()) < n_hot


def test_shard_skew_forecast_layout_independent(tmp_path, ray_session):
    """Same corpus, 1-file vs 3-file layouts → identical forecasts (the
    collapse is per batch but the exchange re-sums exactly)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.sampling import shard_skew_forecast

    df = pd.DataFrame(
        {
            "doc_id": [f"x{i}" for i in range(90)],
            "source": (["a"] * 60 + ["b"] * 25 + [None] * 5),
            "n_tok": np.arange(90, dtype=np.int64) % 7,
        }
    )
    one = tmp_path / "one"
    three = tmp_path / "three"
    one.mkdir()
    three.mkdir()
    pq.write_table(pa.Table.from_pandas(df), one / "all.parquet")
    for i in range(3):
        pq.write_table(pa.Table.from_pandas(df.iloc[i * 30 : (i + 1) * 30]), three / f"p{i}.parquet")
    key = ["scheme", "shard"]
    a = shard_skew_forecast(str(one)).to_pandas().sort_values(key).reset_index(drop=True)
    b = shard_skew_forecast(str(three)).to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
