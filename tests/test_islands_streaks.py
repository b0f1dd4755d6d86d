"""Crafted edge-case tests for the round-3 ordered/grouped operators:
interval merge (gaps-and-islands), longest streaks, ordered path agg,
and MAD outliers.  Each pins the exact boundary semantics the DuckDB
oracles state (adjacency merges, lexical streak tie-break, rn<=n path
cutoff, ceil(q*n)-1 discrete medians)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"

_TS0 = np.datetime64("2024-01-01T00:00:00", "us")


def _write_events(d, rows):
    """rows: list of (event_id, user_id, minutes_offset, event_type, value)."""
    eid, uid, mins, et, val = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "ts": pa.array([_TS0 + np.timedelta64(m * 60, "s") for m in mins]),
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(et, pa.string()),
                "value": pa.array(val, pa.float64()),
                "props": pa.array(["{}"] * len(eid), pa.string()),
            }
        ),
        d / "events.parquet",
    )
    return str(d)


def test_interval_merge_adjacency_and_containment(tmp_path):
    from hepdata_validator_ray.pipelines.relational import events_interval_merge

    # user 1: events at 0 and 30min with 30min duration — ADJACENT (second
    # starts exactly at the first's end) → ONE island covering 60min.
    # user 2: events at 0 and 31min → gap of 1min past the end → TWO islands.
    # user 3: events at 0 and 10min — second interval contained-extends:
    # one island covering 40min (10+30).
    # user 4: single event → one island of exactly 30min.
    d = _write_events(
        tmp_path,
        [
            (1, 1, 0, "view", 1.0),
            (2, 1, 30, "view", 1.0),
            (3, 2, 0, "view", 1.0),
            (4, 2, 31, "view", 1.0),
            (5, 3, 0, "view", 1.0),
            (6, 3, 10, "view", 1.0),
            (7, 4, 0, "view", 1.0),
        ],
    )
    out = (
        events_interval_merge(d, dur_minutes=30)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    MIN = 60_000_000
    assert out.to_dict("records") == [
        {"user_id": 1, "n_islands": 1, "covered_us": 60 * MIN},
        {"user_id": 2, "n_islands": 2, "covered_us": 60 * MIN},
        {"user_id": 3, "n_islands": 1, "covered_us": 40 * MIN},
        {"user_id": 4, "n_islands": 1, "covered_us": 30 * MIN},
    ]


def test_streaks_lexical_tiebreak_and_run_split(tmp_path):
    from hepdata_validator_ray.pipelines.relational import events_streaks

    # user 1: view,view | click,click → two runs of len 2 → tie-break
    # picks 'click' (lexically smallest).
    # user 2: a,a,b,a — the second 'a' run (len 1) must NOT merge with the
    # first (len 2): longest = 2 'a'.
    d = _write_events(
        tmp_path,
        [
            (1, 1, 0, "view", 1.0),
            (2, 1, 1, "view", 1.0),
            (3, 1, 2, "click", 1.0),
            (4, 1, 3, "click", 1.0),
            (5, 2, 0, "a", 1.0),
            (6, 2, 1, "a", 1.0),
            (7, 2, 2, "b", 1.0),
            (8, 2, 3, "a", 1.0),
        ],
    )
    out = events_streaks(d).to_pandas().sort_values("user_id").reset_index(drop=True)
    assert out.to_dict("records") == [
        {"user_id": 1, "streak_len": 2, "streak_type": "click"},
        {"user_id": 2, "streak_len": 2, "streak_type": "a"},
    ]


def test_paths_truncation_and_event_id_tiebreak(tmp_path):
    from hepdata_validator_ray.pipelines.relational import events_paths

    # user 1 has 4 events, two at the SAME ts (event_id breaks the tie);
    # n_first=3 truncates the path but n_events counts all 4.
    d = _write_events(
        tmp_path,
        [
            (10, 1, 0, "a", 1.0),
            (12, 1, 5, "c", 1.0),  # same ts as event 11 — id orders b first
            (11, 1, 5, "b", 1.0),
            (13, 1, 9, "d", 1.0),
        ],
    )
    out = events_paths(d, n_first=3).to_pandas()
    assert out.to_dict("records") == [{"user_id": 1, "path": "a>b>c", "n_events": 4}]


def test_mad_outliers_even_group_and_constant_group(tmp_path):
    from hepdata_validator_ray.pipelines.relational import events_mad_outliers

    # type 'x': cents [100, 200, 300, 400] (even n=4): discrete median =
    # element at ceil(0.5*4)-1 = idx 1 → 200; dev [100,0,100,200] sorted
    # [0,100,100,200] → mad = 100; outliers: dev > 300 → none.
    # type 'y': all identical → med=v, mad=0, outliers = dev>0 → 0.
    # type 'z': one extreme point → dev > 3*mad flags it.
    d = _write_events(
        tmp_path,
        [
            (1, 1, 0, "x", 1.00),
            (2, 1, 1, "x", 2.00),
            (3, 1, 2, "x", 3.00),
            (4, 1, 3, "x", 4.00),
            (5, 2, 0, "y", 7.00),
            (6, 2, 1, "y", 7.00),
            (7, 3, 0, "z", 1.00),
            (8, 3, 1, "z", 1.01),
            (9, 3, 2, "z", 1.02),
            (10, 3, 3, "z", 99.0),
        ],
    )
    out = (
        events_mad_outliers(d).to_pandas().sort_values("event_type").reset_index(drop=True)
    )
    assert out.to_dict("records") == [
        {"event_type": "x", "med": 200, "mad": 100, "n_outliers": 0},
        {"event_type": "y", "med": 700, "mad": 0, "n_outliers": 0},
        {"event_type": "z", "med": 101, "mad": 1, "n_outliers": 1},
    ]


def test_meta2_new_legs_match_standalone():
    """The grown relational_meta2 union carries the islands/streak/path/mad
    legs byte-identically to the standalone queries."""
    import __ray_entry__ as entry
    from hepdata_validator_ray.pipelines.relational import (
        events_interval_merge,
        events_mad_outliers,
        events_streaks,
    )

    meta = entry.queries()["relational_meta2"](SF)
    isl = meta[meta["kind"] == "islands"]
    solo = events_interval_merge(SF).to_pandas()
    got = dict(zip(isl["gkey"].astype(int), zip(isl["k2"], isl["a"])))
    want = dict(zip(solo["user_id"], zip(solo["n_islands"], solo["covered_us"])))
    assert got == want

    st = meta[meta["kind"] == "streak"]
    solo_st = events_streaks(SF).to_pandas()
    assert set(zip(st["gkey"], st["k2"])) == set(
        zip(
            solo_st["user_id"].astype(str) + "|" + solo_st["streak_type"],
            solo_st["streak_len"],
        )
    )

    mo = meta[meta["kind"] == "mad"]
    solo_mo = events_mad_outliers(SF).to_pandas()
    assert dict(zip(mo["gkey"], zip(mo["k2"], mo["a"]))) == dict(
        zip(solo_mo["event_type"], zip(solo_mo["mad"], solo_mo["med"]))
    )


def test_window_dedup_boundary(tmp_path):
    from hepdata_validator_ray.pipelines.relational import events_window_dedup

    # user 1: two 'view' events inside one 10-min window → dedup to 1;
    # third event in the NEXT window (minute 10 = new floor bucket) kept.
    # user 2: same window as user 1's first — different user, kept.
    d = _write_events(
        tmp_path,
        [
            (1, 1, 0, "view", 1.0),
            (2, 1, 9, "view", 1.0),
            (3, 1, 10, "view", 1.0),
            (4, 2, 0, "view", 1.0),
        ],
    )
    out = events_window_dedup(d, window_minutes=10).to_pandas()
    assert out.to_dict("records") == [{"event_type": "view", "n_rows": 4, "n_kept": 3}]


def test_top_words_tiebreak_and_nulls(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.text import top_words_per_source

    p = tmp_path / "documents.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["b a b a", "c c", None], pa.string()),
                "source": pa.array(["s", "s", None], pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
                "n_chars": pa.array([7, 3, 0], pa.int64()),
            }
        ),
        p,
    )
    out = top_words_per_source(str(p), k=2).to_pandas().sort_values("rank").reset_index(drop=True)
    # counts: a=2, b=2, c=2 — all tied; tie-break is word ASC → a then b.
    # NULL text contributes nothing (no '<NULL>' source rows at all).
    assert out.to_dict("records") == [
        {"source": "s", "rank": 1, "word": "a", "n": 2},
        {"source": "s", "rank": 2, "word": "b", "n": 2},
    ]


def test_quantile_cont_interpolation(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import docs_quantile_cont

    p = tmp_path / "documents.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["x"] * 4, pa.string()),
                "source": pa.array(["s"] * 4, pa.string()),
                "lang": pa.array(["en"] * 4, pa.string()),
                "n_chars": pa.array([10, 20, 30, 100], pa.int64()),
            }
        ),
        p,
    )
    out = docs_quantile_cont(str(tmp_path)).to_pandas()
    # n=4: h=(3)*q → p25 at h=0.75 → 10+0.75*10=17.5; p50 at h=1.5 → 25;
    # p75 at h=2.25 → 30+0.25*70=47.5
    assert out.to_dict("records") == [{"source": "s", "p25": 17.5, "p50": 25.0, "p75": 47.5}]


def test_gapfill_quiet_days_and_cohort(tmp_path):
    from hepdata_validator_ray.pipelines.relational import (
        events_cohort_retention,
        events_cumulative_users,
        events_daily_gapfill,
    )

    # user 1: events on day 0 and day 3 → spine has 4 days, days 1-2 zero.
    # user 2: single event day 1 → spine of 1.
    d = _write_events(
        tmp_path,
        [
            (1, 1, 0, "view", 1.0),
            (2, 1, 3 * 24 * 60, "view", 1.0),
            (3, 2, 24 * 60, "view", 1.0),
        ],
    )
    out = events_daily_gapfill(d).to_pandas().sort_values(["user_id", "day"]).reset_index(drop=True)
    assert list(out["n"]) == [1, 0, 0, 1, 1]
    assert list(out["day"])[:4] == ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]

    # epoch weeks start on Thursday: the fixture's Jan 1 (Mon) sits 4 days
    # before the next week boundary, so user 1's day-3 event (Jan 4) falls
    # in week offset 1 — cohort row (w, 0, 2) plus retention row (w, 1, 1)
    co = events_cohort_retention(d).to_pandas().sort_values("week_offset").reset_index(drop=True)
    assert list(co["week_offset"]) == [0, 1]
    assert list(co["n_users"]) == [2, 1]
    assert co["cohort_week"].nunique() == 1

    cu = events_cumulative_users(d)
    assert list(cu["n_new"]) == [1, 1]
    assert list(cu["n_cum"]) == [1, 2]


def test_type_overlap_counts(tmp_path):
    from hepdata_validator_ray.pipelines.relational import events_type_overlap

    # user 1 did view+click (twice each — distinct collapses), user 2 only
    # view, user 3 click+purchase → pairs: (click,view)=1,
    # (click,purchase)=1, no (purchase,view)
    d = _write_events(
        tmp_path,
        [
            (1, 1, 0, "view", 1.0),
            (2, 1, 1, "view", 1.0),
            (3, 1, 2, "click", 1.0),
            (4, 1, 3, "click", 1.0),
            (5, 2, 0, "view", 1.0),
            (6, 3, 0, "click", 1.0),
            (7, 3, 1, "purchase", 1.0),
        ],
    )
    out = events_type_overlap(d).to_pandas().sort_values(["type_a", "type_b"]).reset_index(drop=True)
    assert out.to_dict("records") == [
        {"type_a": "click", "type_b": "purchase", "n_users": 1},
        {"type_a": "click", "type_b": "view", "n_users": 1},
    ]


def test_gapfill_oracle_span_bound_holds():
    """The gapfill oracle joins a STATIC range(0, 2000); pin the data
    contract it relies on — no user's first-to-last span reaches 2000 days
    at either gate scale (review finding: the bound was unasserted)."""
    import duckdb

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        mx = duckdb.sql(
            f"""SELECT max(d1 - d0) FROM (
                  SELECT min(epoch_us(ts) // 86400000000) d0,
                         max(epoch_us(ts) // 86400000000) d1
                  FROM read_parquet('{sf}/events.parquet') GROUP BY user_id)"""
        ).fetchone()[0]
        assert mx < 2000, f"{sf}: span {mx} breaks the static-series oracle bound"


def test_rolling_active_window_semantics(tmp_path):
    from hepdata_validator_ray.pipelines.relational import events_rolling_active_users

    # user 1 active day 0; user 2 active day 5; user 3 active day 0 AND 9.
    # 7-day window: day 0 → {1,3}=2; day 5 → {1,3(from d0? d0>=5-6 yes),2}=3;
    # day 6 → {1,2,3}=3 (d0 still within [0,6]); day 7 → {2}=1 (d0 aged out,
    # d5 in); day 9 → {3}+{2? d5>=3 yes}=2.
    d = _write_events(
        tmp_path,
        [
            (1, 1, 0, "view", 1.0),
            (2, 2, 5 * 24 * 60, "view", 1.0),
            (3, 3, 0, "view", 1.0),
            (4, 3, 9 * 24 * 60, "view", 1.0),
        ],
    )
    out = events_rolling_active_users(d)
    got = dict(zip(out["day"], out["n_active"]))
    assert got["2024-01-01"] == 2
    assert got["2024-01-06"] == 3
    assert got["2024-01-07"] == 3  # day 6: users 1,3 (d0), 2 (d5)
    assert got["2024-01-08"] == 1  # day 7: only user 2's d5 within window
    assert got["2024-01-10"] == 2  # day 9: user 3's d9 + user 2's d5
    assert len(out) == 10  # full spine, first to last event day


def test_rolling_oracle_global_span_bound():
    """The rolling oracle's spine uses a static range(0, 2000) over the
    GLOBAL span — pin that bound too (the gapfill test pins per-user)."""
    import duckdb

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        mx = duckdb.sql(
            f"""SELECT max(epoch_us(ts) // 86400000000) - min(epoch_us(ts) // 86400000000)
                FROM read_parquet('{sf}/events.parquet')"""
        ).fetchone()[0]
        assert mx < 2000, f"{sf}: global span {mx}"
