"""Regression tests for the late-round-3 self-review findings over
ops.py / relational.py / text.py: dtype-stable bucketing with nullable
int keys, dtype-preserving salted counts, inner-join semantics in the
broadcast nation chain, >2^53 node ids in distributed connected
components, and null-text tolerance in the text kernels."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray


def test_hash_values_int_column_ignores_null_batches():
    """An int64 key must land in the SAME bucket whether or not its batch
    happens to contain a null elsewhere — to_numpy() turning null-bearing
    int columns into float64 used to switch the hash path per batch,
    splitting one key's rows across reducers."""
    from hepdata_validator_ray.ops import _hash_mod

    vals = list(range(1, 21))
    clean = pa.array(vals, type=pa.int64())
    with_null = pa.array(vals + [None], type=pa.int64())
    b_clean = _hash_mod(clean, 64)
    b_null = _hash_mod(with_null, 64)[: len(vals)]
    np.testing.assert_array_equal(b_clean, b_null)


def test_salted_counts_preserve_int_key_dtype(tmp_path):
    """n_salts>0 used to return the key column stringified ('123' for 123);
    the salted path must match the unsalted path in dtype AND values."""
    from hepdata_validator_ray.ops import grouped_value_counts

    ids = np.concatenate([np.full(5000, 7, dtype=np.int64), np.arange(100, dtype=np.int64)])
    f = tmp_path / "hot_int.parquet"
    pq.write_table(pa.table({"doc_id": ids}), f)
    plain = (
        grouped_value_counts(ray.data.read_parquet(str(f)), "doc_id", min_count=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    salted = (
        grouped_value_counts(ray.data.read_parquet(str(f)), "doc_id", min_count=2, n_salts=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert salted["doc_id"].dtype == plain["doc_id"].dtype == np.int64
    pd.testing.assert_frame_equal(plain, salted)
    assert int(salted.loc[salted.doc_id == 7, "cnt"].iloc[0]) == 5001


def test_nation_order_stats_drops_orphans_like_inner_join(tmp_path):
    """An order with no customer, and a customer with no nation, must be
    DROPPED (inner-join oracle semantics) — not crash the string-array
    build / the driver map construction."""
    from hepdata_validator_ray.pipelines.relational import nation_order_stats

    d = tmp_path
    pq.write_table(
        pa.table({"n_nationkey": [0], "n_name": ["ALPHA"]}), d / "nation.parquet"
    )
    pq.write_table(
        pa.table(
            {
                # c2 references nation 9 which does not exist
                "c_custkey": [1, 2],
                "c_nationkey": [0, 9],
            }
        ),
        d / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                # order 3: custkey 99 has no customer row; order 2: its
                # customer has no nation row
                "o_custkey": [1, 2, 99],
                "o_totalprice": [10.0, 20.0, 30.0],
            }
        ),
        d / "orders.parquet",
    )
    out = nation_order_stats(str(d)).to_pandas()
    assert list(out["n_name"]) == ["ALPHA"]
    assert int(out["n_orders"].iloc[0]) == 1
    assert float(out["total_spend"].iloc[0]) == 10.0


def test_connected_components_ds_big_node_ids():
    """Node ids above 2^53 must survive the exchange exactly — nulls in the
    tagged union used to coerce the int64 id columns to float64 in the
    pandas attach stage, quantizing hash-scale ids."""
    from hepdata_validator_ray.ops import connected_components_ds

    big = (1 << 62) + 12345
    pairs = pd.DataFrame(
        {
            "doc_id_a": np.array([big, big + 1, 500], dtype=np.int64),
            "doc_id_b": np.array([big + 1, big + 2, 501], dtype=np.int64),
        }
    )
    ds = ray.data.from_pandas(pairs)
    out = (
        connected_components_ds(ds, "doc_id_a", "doc_id_b")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert out["node"].dtype == np.int64
    assert list(out["node"]) == [500, 501, big, big + 1, big + 2]
    # the three big ids form one component labeled by their min — exactly
    assert list(out["cluster_id"]) == [500, 500, big, big, big]


def test_text_kernels_tolerate_null_text(tmp_path):
    """Null text must score as an empty doc, not raise on the NaN→int cast
    (matching _explode_words' null tolerance in the same module)."""
    from hepdata_validator_ray.pipelines.text import quality_scores, token_count_ws

    f = tmp_path / "documents.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(["hello world", None], type=pa.string()),
            }
        ),
        f,
    )
    ws = token_count_ws(str(f)).to_pandas().sort_values("doc_id")
    assert list(ws["n_ws_tokens"]) == [2, 0]
    q = quality_scores(str(f)).to_pandas().sort_values("doc_id")
    assert int(q["n_words"].iloc[1]) == 0


def test_ngram_jaccard_big_doc_ids(tmp_path):
    """Doc ids above 2^53 must survive the ngram repartition join exactly —
    nulls in the tagged union used to coerce the pair-key columns to
    float64, merging distinct pairs (same class as the CC finding)."""
    from hepdata_validator_ray.pipelines.dedup import ngram_jaccard_pairs

    big = (1 << 60) + 1
    texts = ["the quick brown fox jumps over the dog"] * 2 + ["completely different words here now"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([big, big + 2, 5], type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = ngram_jaccard_pairs(str(tmp_path / "documents.parquet"), threshold=0.3).to_pandas()
    out = out[out.doc_id_a >= 0].reset_index(drop=True)
    assert len(out) == 1
    assert int(out["doc_id_a"].iloc[0]) == big
    assert int(out["doc_id_b"].iloc[0]) == big + 2
    assert float(out["jaccard"].iloc[0]) == 1.0


def test_minhash_skips_zero_shingle_docs(tmp_path):
    """Null-text docs have ZERO shingles and used to share the identity
    signature, pairing at est_jaccard=1.0 while exact ngram Jaccard scores
    them 0.0; they must emit no band rows.  Empty-STRING docs are different:
    they carry the one join-all shingle of the empty word, so two of them
    are genuinely identical (est and exact both 1.0) and may pair."""
    from hepdata_validator_ray.pipelines.dedup import minhash_lsh_pairs

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": pa.array(["", None, None, "real words in this document body"], type=pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = minhash_lsh_pairs(str(tmp_path / "documents.parquet"), threshold=0.0).to_pandas()
    if "doc_id_a" not in out.columns:  # no pairs at all — empty result
        assert len(out) == 0
        return
    real = out[out.doc_id_a >= 0]
    # the two null docs (2, 3) must not pair with anything
    assert not set(real["doc_id_a"]).intersection({2, 3})
    assert not set(real["doc_id_b"]).intersection({2, 3})
