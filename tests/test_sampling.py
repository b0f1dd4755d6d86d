"""Deterministic sampling/splitting: reproducibility and layout independence."""

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
