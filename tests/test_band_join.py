"""Banded non-equi time-range self-join (relational.events_time_band_pairs):
window-boundary pairing, strict-inequality orientation, and partition-count
invariance (the overflow-copy replication argument)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from hepdata_validator_ray.pipelines.relational import events_time_band_pairs


def _write_events(tmp_path, ts_us_by_id):
    d = tmp_path / "sf"
    d.mkdir()
    df = pd.DataFrame(
        {
            "event_id": np.array(list(ts_us_by_id), dtype=np.int64),
            "ts": np.array(list(ts_us_by_id.values()), dtype="datetime64[us]"),
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), d / "events.parquet")
    return str(d)


def test_band_boundaries_and_orientation(ray_session, tmp_path):
    """Pairs exactly at the band edge are included (<=), simultaneous
    events never pair (strict >), and pairs CROSSING a band-window
    boundary are found via the overflow copy."""
    B = 10_000_000  # 10s band in us
    sf = _write_events(
        tmp_path,
        {
            1: 5,            # base
            2: 5,            # simultaneous with 1 -> never pairs with 1
            3: 5 + B,        # exactly band away from 1/2 -> included
            4: 5 + B + 1,    # one us past the band from 1/2 -> excluded
            # a pair crossing the k -> k+1 window boundary: 9.9s and 10.1s
            5: 9_900_000,
            6: 10_100_000,
        },
    )
    got = events_time_band_pairs(sf, band_seconds=10, num_buckets=4).to_pandas()
    pairs = {(a, b): d for a, b, d in got.itertuples(index=False, name=None)}
    assert (1, 3) in pairs and pairs[(1, 3)] == B  # inclusive edge
    assert (2, 3) in pairs
    assert (1, 4) not in pairs and (2, 4) not in pairs  # past the band
    assert (1, 2) not in pairs and (2, 1) not in pairs  # simultaneous
    assert (5, 6) in pairs and pairs[(5, 6)] == 200_000  # crosses window edge
    assert (3, 4) in pairs  # within one window too
    # orientation: every pair strictly forward in time
    assert (got["dt_us"] > 0).all()


def test_band_join_partition_count_invariance(ray_session, tmp_path):
    """Same pair multiset at nb=1 (the only case where an event can sit
    native+overflow in one partition) and at nb=8 — the dedup guard and
    the replication argument."""
    rng = np.random.default_rng(11)
    ts = np.sort(rng.integers(0, 600_000_000, size=400))  # 10 min span, us
    sf = _write_events(tmp_path, {i: int(t) for i, t in enumerate(ts)})
    outs = []
    for nb in (1, 8):
        df = (
            events_time_band_pairs(sf, band_seconds=10, num_buckets=nb)
            .to_pandas()
            .sort_values(["event_id_a", "event_id_b"])
            .reset_index(drop=True)
        )
        outs.append(df)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # brute-force truth
    want = {
        (int(a), int(b))
        for a in range(len(ts))
        for b in range(len(ts))
        if 0 < ts[b] - ts[a] <= 10_000_000
    }
    got = set(zip(outs[0]["event_id_a"], outs[0]["event_id_b"]))
    assert got == want
