"""Skew handling (north_rule): hot keys must not break or serialize the
shuffles.  The engine's lever is map-side combine — a key occurring k times
in a batch crosses the exchange as ONE (key, k) partial — plus the
hot-bucket guard in pair generation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from hepdata_validator_ray.ops import grouped_pairs, grouped_value_counts


def _hot_table(n=20_000, hot_every=2):
    """Every ``hot_every``-th row shares one doc_id → a massively hot key."""
    ids = [f"doc-web-{i:08d}" if i % hot_every else "doc-hot-00000000" for i in range(n)]
    return pa.table({"doc_id": pa.array(ids, type=pa.string())})


def test_hot_key_duplicate_detection(tmp_path):
    tbl = _hot_table()
    f = tmp_path / "hot.parquet"
    pq.write_table(tbl, f)
    ds = ray.data.read_parquet(str(f))
    dups = grouped_value_counts(ds, "doc_id", min_count=2).to_pandas()
    assert len(dups) == 1
    assert dups.iloc[0].doc_id == "doc-hot-00000000"
    assert dups.iloc[0].cnt == 10_000


def test_hot_key_partials_are_combined(tmp_path):
    """The map-side combine must collapse the hot key before the exchange:
    with B batches, the shuffle carries ≤B partial rows for the hot key,
    not 10,000 raw rows."""
    tbl = _hot_table()
    f = tmp_path / "hot.parquet"
    pq.write_table(tbl, f)
    from hepdata_validator_ray.ops import value_counts_partial

    partial = value_counts_partial("doc_id")
    out = partial(tbl)
    hot = out.filter(pa.compute.equal(out["doc_id"], "doc-hot-00000000"))
    assert hot.num_rows == 1  # one partial row per batch
    assert hot["cnt"][0].as_py() == 10_000


def test_salted_aggregation_matches_unsalted(tmp_path):
    """Explicit two-level salting (north_rule): identical results, hot key's
    level-1 load spread over n_salts groups."""
    tbl = _hot_table()
    f = tmp_path / "hot.parquet"
    pq.write_table(tbl, f)
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
    assert plain.equals(salted)
    assert salted.iloc[0].cnt == 10_000


def test_hot_bucket_guard_in_pair_generation():
    """grouped_pairs' hot-bucket guard: a fine-key collision cluster larger
    than the cap yields no quadratic pair explosion."""
    n = 500
    df = pd.DataFrame(
        {
            "band": np.zeros(n, dtype=np.int64),
            "bucket": ["same"] * n,  # everyone collides
            "doc_id": np.arange(n, dtype=np.int64),
        }
    )
    ds = ray.data.from_pandas(df)
    empty = pd.DataFrame({"doc_id_a": pd.Series(dtype="int64"), "doc_id_b": pd.Series(dtype="int64")})

    def pair_fn(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > 200:  # the guard the dedup pipelines use
            return empty
        import itertools

        recs = [(a, b) for a, b in itertools.combinations(sorted(g.doc_id), 2)]
        return pd.DataFrame(recs, columns=["doc_id_a", "doc_id_b"])

    out = grouped_pairs(ds, ["band", "bucket"], pair_fn, empty=empty).to_pandas()
    assert len(out) == 0  # guard fired: no 125k-pair explosion


def test_skewed_partition_sizes(tmp_path):
    """Straggler shape: wildly different file sizes still validate correctly."""
    from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine
    from hepdata_validator_ray.synth import generate_sequences_table

    sizes = [50, 2_000, 10_000]
    off = 0
    for i, n in enumerate(sizes):
        pq.write_table(generate_sequences_table(n, seed=77, inject=False, row_offset=off), tmp_path / f"p{i}.parquet")
        off += n
    res = ValidationEngine(ValidationConfig(enable_sketches=False, dup_check=True)).validate(str(tmp_path))
    assert res.valid
    assert res.n_rows == sum(sizes)


def test_tumbling_hot_window_single_user(tmp_path):
    """All events in ONE window from ONE user — the maximal skew case: the
    (window,user) map-side combine must collapse each batch to one partial
    row, and counts must still be exact."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import events_tumbling

    n = 20_000
    ts = pd.Timestamp("2026-02-01 10:00:00") + pd.to_timedelta(np.arange(n) % 3000, unit="s")
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), type=pa.int64()),
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "user_id": pa.array(np.zeros(n, dtype=np.int64)),
                "event_type": pa.array(["view"] * n),
                "value": pa.array(np.full(n, 1.25)),
            }
        ),
        d / "events.parquet",
    )
    out = events_tumbling(str(d)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_events"] == n and r["n_users"] == 1 and r["sum_cents"] == n * 125


def test_bm25_all_docs_identical(tmp_path):
    """Degenerate corpus: every doc identical — scores tie exactly, ranks
    break on doc_id ascending deterministically."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.retrieval import bm25_topk

    n = 1000
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array(["alpha beta gamma"] * n),
            }
        ),
        tmp_path / "d.parquet",
    )
    out = bm25_topk(str(tmp_path / "d.parquet"), ["beta"], k=5)
    assert out["doc_id"].tolist() == [0, 1, 2, 3, 4]
    assert (out["tf_total"] == 1).all()


def test_hopping_hot_window_single_user(tmp_path):
    """Hopping-window maximal skew: 20k events from ONE user inside one
    hour.  The map-side replicate (x2 window memberships) must still
    collapse each batch to per-(window,user) partials before the exchange,
    and each event must land in exactly window/hop = 2 windows."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import events_hopping

    n = 20_000
    ts = pd.Timestamp("2026-02-01 10:00:00") + pd.to_timedelta(np.arange(n) % 1800, unit="s")
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "user_id": pa.array(np.zeros(n, dtype=np.int64)),
                "value": pa.array(np.full(n, 1.25)),
            }
        ),
        d / "events.parquet",
    )
    out = events_hopping(str(d)).to_pandas().sort_values("win_start").reset_index(drop=True)
    # all events in [10:00, 10:30) -> exactly two 60-min windows cover them:
    # starts 09:30 and 10:00
    assert out["win_start"].tolist() == ["2026-02-01 09:30:00", "2026-02-01 10:00:00"]
    assert (out["n_events"] == n).all() and (out["n_users"] == 1).all()
    assert int(out["n_events"].sum()) == 2 * n
    assert (out["sum_cents"] == n * 125).all()


def test_q18_hot_orderkey_absorbed_map_side(ray_session, tmp_path):
    """200k line items on ONE order: the map-side per-block orderkey
    partials collapse the hot key BEFORE the join, so the exchange moves
    at most one row per block for it — and the HAVING result is exact."""
    import numpy as np
    import pandas as pd
    from hepdata_validator_ray.pipelines.relational import q18_large_volume_customers

    n = 200_000
    li = pd.DataFrame(
        {
            "l_orderkey": np.full(n, 7, dtype=np.int64),
            "l_partkey": np.arange(n, dtype=np.int64),
            "l_suppkey": np.ones(n, dtype=np.int64),
            "l_linenumber": np.arange(n, dtype=np.int32),
            "l_quantity": np.full(n, 2.0),
            "l_extendedprice": np.full(n, 10.0),
            "l_discount": np.zeros(n),
            "l_tax": np.zeros(n),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime(["1996-01-01"] * n).astype("datetime64[us]"),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    pd.DataFrame(
        {
            "o_orderkey": np.array([7, 8], dtype=np.int64),
            "o_custkey": np.array([1, 2], dtype=np.int64),
            "o_orderstatus": ["O", "O"],
            "o_totalprice": [123.45, 1.0],
            "o_orderdate": pd.to_datetime(["1996-01-01", "1996-01-02"]).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT", "2-HIGH"],
        }
    ).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame(
        {
            "c_custkey": np.array([1, 2], dtype=np.int64),
            "c_name": ["alice", "bob"],
            "c_nationkey": np.array([0, 0], dtype=np.int32),
            "c_acctbal": [0.0, 0.0],
            "c_mktsegment": ["BUILDING", "BUILDING"],
        }
    ).to_parquet(tmp_path / "customer.parquet")
    out = q18_large_volume_customers(str(tmp_path), qty_threshold=100).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["o_orderkey"] == 7 and r["sum_qty"] == 2 * n
    assert r["c_name"] == "alice" and r["o_total_cents"] == 12345
