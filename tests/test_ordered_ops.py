"""Crafted-data semantics pins for the round-3 ordered/grouped additions:
funnel (strict temporal order, greedy-earliest matching), per-group discrete
quantiles (DuckDB quantile_disc index semantics), Markov transition counts,
and the running totals riding the fused events_lag_trailing exchange."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _write_events(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    df.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_funnel_strict_order_and_greedy(tmp_path):
    from hepdata_validator_ray.pipelines.relational import events_funnel

    rows = [
        # user 1: full ordered chain -> step 3
        (1, "2024-01-01 00:01", 1, "view", 1.0),
        (2, "2024-01-01 00:02", 1, "click", 1.0),
        (3, "2024-01-01 00:03", 1, "purchase", 1.0),
        # user 2: reversed -> step 1 only (view exists, nothing after it)
        (4, "2024-01-01 00:01", 2, "purchase", 1.0),
        (5, "2024-01-01 00:02", 2, "click", 1.0),
        (6, "2024-01-01 00:03", 2, "view", 1.0),
        # user 3: click at the SAME ts as view -> strict '>' blocks step 2
        (7, "2024-01-01 00:01", 3, "view", 1.0),
        (8, "2024-01-01 00:01", 3, "click", 1.0),
        # user 4: purchase ties click's ts -> step 2 only
        (9, "2024-01-01 00:01", 4, "view", 1.0),
        (10, "2024-01-01 00:02", 4, "click", 1.0),
        (11, "2024-01-01 00:02", 4, "purchase", 1.0),
        # user 5: greedy must pick the EARLIEST view (t1), not the later
        # one (t3), for the click at t2 to count
        (12, "2024-01-01 00:03", 5, "view", 1.0),
        (13, "2024-01-01 00:01", 5, "view", 1.0),
        (14, "2024-01-01 00:02", 5, "click", 1.0),
    ]
    out = (
        events_funnel(_write_events(tmp_path, rows), num_buckets=3)
        .to_pandas()
        .sort_values("step")
        .reset_index(drop=True)
    )
    assert out["event_type"].tolist() == ["view", "click", "purchase"]
    assert out["n_users"].tolist() == [5, 3, 1]


def test_quantile_disc_matches_duckdb_on_crafted_groups(tmp_path):
    from hepdata_validator_ray.pipelines.relational import docs_quantile_disc

    rng = np.random.default_rng(7)
    frames = []
    doc_id = 0
    # group sizes that exercise the ceil(q*n)-1 index across boundaries,
    # plus duplicated values and a singleton group
    for src, n in [("a", 1), ("b", 2), ("c", 3), ("d", 7), ("e", 25), ("f", 40)]:
        vals = rng.integers(0, 50, size=n)
        frames.append(
            pd.DataFrame(
                {
                    "doc_id": np.arange(doc_id, doc_id + n),
                    "source": src,
                    "n_chars": vals,
                }
            )
        )
        doc_id += n
    df = pd.concat(frames, ignore_index=True)
    # a NULL source group and NULL n_chars rows (dropped like SQL aggregates)
    df.loc[df.index[:3], "source"] = None
    df["n_chars"] = df["n_chars"].astype("float64")
    df.loc[df.index[-2:], "n_chars"] = None
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    got = (
        docs_quantile_disc(str(tmp_path), num_buckets=4)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            f"""
SELECT coalesce(source, '<NULL>') AS source,
       quantile_disc(n_chars, 0.25)::BIGINT AS q25,
       quantile_disc(n_chars, 0.5)::BIGINT AS q50,
       quantile_disc(n_chars, 0.75)::BIGINT AS q75,
       quantile_disc(n_chars, 0.9)::BIGINT AS q90
FROM read_parquet('{tmp_path}/documents.parquet')
GROUP BY 1 HAVING count(n_chars) > 0 ORDER BY 1"""
        )
        .fetchdf()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)


def test_type_transitions_crafted(tmp_path):
    from hepdata_validator_ray.pipelines.relational import events_type_transitions

    rows = [
        # user 1: a -> b -> b (tie ts broken by event_id: 3 before 4)
        (1, "2024-01-01 00:01", 1, "a", 0.0),
        (2, "2024-01-01 00:02", 1, "b", 0.0),
        (3, "2024-01-01 00:03", 1, "b", 0.0),
        (4, "2024-01-01 00:03", 1, "a", 0.0),
        # user 2: single event -> no transition
        (5, "2024-01-01 00:01", 2, "a", 0.0),
        # user 3: NULL type participates via the '<NULL>' sentinel
        (6, "2024-01-01 00:01", 3, "a", 0.0),
        (7, "2024-01-01 00:02", 3, None, 0.0),
    ]
    out = events_type_transitions(_write_events(tmp_path, rows), num_buckets=3).to_pandas()
    got = {(r.prev_type, r.cur_type): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "b"): 1, ("b", "a"): 1, ("a", "<NULL>"): 1}


def test_running_total_matches_pandas(tmp_path):
    from hepdata_validator_ray.pipelines.relational import events_running_total

    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 3600, size=n), unit="s"),
            "user_id": rng.integers(0, 20, size=n),
            "event_type": "x",
            "value": rng.normal(10, 5, size=n),  # negatives included
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = (
        events_running_total(str(tmp_path), num_buckets=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    cents = np.floor(ref["value"].to_numpy() * 100.0).astype(np.int64)
    ref["run_cents"] = pd.Series(cents, index=ref.index).groupby(ref["user_id"]).cumsum()
    ref["run_n"] = ref.groupby("user_id").cumcount() + 1
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert got["run_cents"].tolist() == ref["run_cents"].tolist()
    assert got["run_n"].tolist() == ref["run_n"].tolist()


def test_funnel_single_hot_user_skew():
    """20k events all on ONE user: the entire funnel collapses into a
    single segment in one bucket — reduceat must handle the hot segment
    and the greedy chain must still be exact."""
    import tempfile

    from hepdata_validator_ray.pipelines.relational import events_funnel

    n = 20_000
    rng = np.random.default_rng(3)
    types = rng.choice(["view", "click", "purchase"], size=n)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(np.arange(n), unit="s")
    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame(
            {
                "event_id": np.arange(n),
                "ts": ts,
                "user_id": 1,
                "event_type": types,
                "value": 0.0,
            }
        ).to_parquet(f"{d}/events.parquet", index=False)
        out = events_funnel(d, num_buckets=4).to_pandas().sort_values("step")
        # with 20k shuffled events on one user the full chain is
        # essentially certain to exist
        assert out["n_users"].tolist() == [1, 1, 1]


def test_trending_window_ages_out(ray_session, tmp_path):
    """A day-0 spike counts toward the trailing-7d total on day 6 but is
    gone by day 13; types without an event on a day are not ranked."""
    import numpy as np
    import pandas as pd
    from hepdata_validator_ray.pipelines.relational import events_trending_types

    day = 86_400_000_000
    rows = []
    # type A: 10 events day0, 1 event day6, 1 event day13
    rows += [(i, 1, "A", pd.Timestamp(0)) for i in range(10)]
    rows += [(100, 1, "A", pd.Timestamp(6 * day * 1000))]
    rows += [(101, 1, "A", pd.Timestamp(13 * day * 1000))]
    # type B: 1 event per day, days 0..13
    rows += [(200 + d, 2, "B", pd.Timestamp(d * day * 1000)) for d in range(14)]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    df["value"] = 1.0
    p = str(tmp_path / "events.parquet")
    df.to_parquet(p)
    out = events_trending_types(str(tmp_path))
    d6 = out[out["day"] == "1970-01-07"].set_index("event_type")
    assert d6.loc["A", "rk"] == 1 and d6.loc["A", "n7"] == 11  # spike still in window
    assert d6.loc["B", "n7"] == 7
    d7 = out[out["day"] == "1970-01-08"]
    assert "A" not in set(d7["event_type"])  # no A event on day 7 -> unranked
    d13 = out[out["day"] == "1970-01-14"].set_index("event_type")
    assert d13.loc["A", "n7"] == 1  # day-0 spike aged out
