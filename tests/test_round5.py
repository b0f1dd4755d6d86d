"""Round-5 pins: fixed-centroid IVF lossless-at-full-probe, the
adversarial-skew corpus generator's contracts, and bucket derivation."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_ann_topk_ivf_fixed_full_probe_equals_brute(ray_session):
    """n_probe = n_cells probes every cell, so the fixed-centroid IVF must
    reproduce the brute-force top-k SET per query (scores identical; rank
    order shared via the (cos DESC, vec_id) total order)."""
    from hepdata_validator_ray.pipelines.cluster import DEFAULT_CENTROID_IDS
    from hepdata_validator_ray.pipelines.similarity import (
        ann_topk_bruteforce,
        ann_topk_ivf_fixed,
    )

    p = f"{SF}/embeddings.parquet"
    brute = ann_topk_bruteforce(p, k=10, n_queries=3)
    ivf = ann_topk_ivf_fixed(p, k=10, n_queries=3, n_probe=len(DEFAULT_CENTROID_IDS))
    for qid in brute["query_id"].unique():
        b = set(brute.loc[brute["query_id"] == qid, "neighbor_id"])
        i = set(ivf.loc[ivf["query_id"] == qid, "neighbor_id"])
        assert b == i


def test_ann_topk_ivf_fixed_partial_probe_subset(ray_session):
    """A 2-cell probe returns ≤ k rows per query, all scored correctly
    (every returned cos must equal the brute cos for that pair)."""
    from hepdata_validator_ray.pipelines.similarity import (
        ann_topk_bruteforce,
        ann_topk_ivf_fixed,
    )

    p = f"{SF}/embeddings.parquet"
    ivf = ann_topk_ivf_fixed(p, k=10, n_queries=3, n_probe=2)
    brute = ann_topk_bruteforce(p, k=200, n_queries=3)
    merged = ivf.merge(brute, on=["query_id", "neighbor_id"], suffixes=("_i", "_b"), how="left")
    assert merged["cos_b"].notna().all()
    assert np.allclose(merged["cos_i"], merged["cos_b"], atol=1e-6)
    assert (ivf.groupby("query_id").size() <= 10).all()


def test_skewed_corpus_contracts(ray_session, tmp_path):
    """ensure_skewed_sequences_parquet: ≥hot_pct% on one source, ~dup_pct%
    dup rows, dup classes share BYTE-IDENTICAL token content, and every
    doc_id still matches the schema pattern."""
    import re

    import pyarrow.parquet as pq

    from hepdata_validator_ray.schema import DOC_ID_PATTERN
    from hepdata_validator_ray.synth import ensure_skewed_sequences_parquet

    out = ensure_skewed_sequences_parquet(SF, n_rows=20_000, n_files=4)
    t = pq.read_table(out)
    df = t.to_pandas()
    assert len(df) == 20_000
    share = (df["source"] == "web").mean()
    assert share >= 0.90
    dup_mask = df["doc_id"].str.startswith("doc-dup-")
    assert 0.17 <= dup_mask.mean() <= 0.23
    pat = re.compile(DOC_ID_PATTERN)
    assert df["doc_id"].map(lambda s: bool(pat.match(s))).all()
    # byte-identical content within a class; n_tok consistent
    dups = df[dup_mask]
    some = dups.groupby("doc_id").filter(lambda g: len(g) > 1).groupby("doc_id")
    checked = 0
    for _, g in list(some)[:5]:
        toks = [np.asarray(x) for x in g["tokens"].head(3)]
        for a in toks[1:]:
            assert np.array_equal(toks[0], a)
        assert (g["n_tok"].head(3) == len(toks[0])).all()
        checked += 1
    assert checked >= 1


def test_derive_num_buckets_path_shapes(tmp_path):
    """File, directory, list, and unreadable inputs; lo/hi clamps."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.ops import derive_num_buckets_path

    p = tmp_path / "a.parquet"
    pq.write_table(pa.table({"x": list(range(10))}), p)
    assert derive_num_buckets_path(str(p)) == 16  # lo clamp
    assert derive_num_buckets_path(str(tmp_path)) == 16
    assert derive_num_buckets_path([str(p), str(p)]) == 16
    assert derive_num_buckets_path("/nonexistent/nope") == 16  # empty glob → lo
    assert derive_num_buckets_path([str(tmp_path / "missing.parquet")]) == 64  # unreadable → fallback


def test_events_attribution_edges(ray_session, tmp_path, monkeypatch):
    """Pins: (a) conversion before any touch → NULL ids, 0 priors;
    (b) same-timestamp touch with SMALLER event_id counts as preceding,
    with LARGER event_id does not; (c) touches after the conversion never
    count; (d) NULL-user rows excluded."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines import relational

    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00",  # u1 click (e0)
            "2024-01-01 00:01:00",  # u1 purchase (e1) -> first=last=0, n=1
            "2024-01-01 00:02:00",  # u1 click (e2)
            "2024-01-01 00:03:00",  # u1 purchase (e3) -> first=0 last=2 n=2
            "2024-01-01 00:00:30",  # u2 purchase (e4) -> NULLs (click later)
            "2024-01-01 00:00:45",  # u2 click (e5)
            "2024-01-01 00:05:00",  # u3: click e6 same ts as purchase e7
            "2024-01-01 00:05:00",  # u3 purchase e7 -> e6 counts (smaller id)
            "2024-01-01 00:06:00",  # u3: purchase e8 same ts as click e9
            "2024-01-01 00:06:00",  # u3 click e9 (larger id -> not preceding e8)
            "2024-01-01 00:07:00",  # null-user purchase (excluded)
        ]
    )
    t = pa.table(
        {
            "event_id": pa.array(list(range(11)), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array([1, 1, 1, 1, 2, 2, 3, 3, 3, 3, None], pa.int64()),
            "event_type": pa.array(
                ["click", "purchase", "click", "purchase", "purchase", "click",
                 "click", "purchase", "purchase", "click", "purchase"]
            ),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    out = (
        relational.events_attribution(str(d))
        .to_pandas()
        .sort_values("conversion_id")
        .reset_index(drop=True)
    )
    assert out["conversion_id"].tolist() == [1, 3, 4, 7, 8]
    # nullable ids are float64-with-NaN by contract (deterministic dtype
    # across Ray block-concat orders)
    def _ids(col):
        return [None if pd.isna(x) else int(x) for x in out[col]]

    assert _ids("first_touch_id") == [0, 0, None, 6, 6]
    assert _ids("last_touch_id") == [0, 2, None, 6, 6]
    assert out["n_prior_touches"].tolist() == [1, 2, 0, 1, 1]


def test_embedding_covariance_matches_numpy(ray_session):
    """cov_q equals the numpy population covariance of the quantized
    matrix, spelled with the same moment identity."""
    from hepdata_validator_ray.pipelines.cluster import _quantize, embedding_covariance

    p = f"{SF}/embeddings.parquet"
    out = embedding_covariance(p)
    df = pd.read_parquet(p)
    q = _quantize(np.stack(df["embedding"].to_numpy())).astype(np.float64)
    n = len(q)
    s = q.sum(axis=0)
    for _, r in out.head(50).iterrows():
        i, j = int(r["i"]), int(r["j"])
        expect = (q[:, i] * q[:, j]).sum() / n - (s[i] / n) * (s[j] / n)
        assert abs(r["cov_q"] - expect) < 1e-6 * max(1.0, abs(expect))
    d = q.shape[1]
    assert len(out) == d * (d + 1) // 2
    assert (out["n"] == n).all()


def test_embedding_covariance_overflow_certificate(ray_session, tmp_path):
    """n·maxq² past the int64 Gram bound must raise, never wrap silently."""
    import pytest

    from hepdata_validator_ray.pipelines.cluster import embedding_covariance

    df = pd.DataFrame(
        {
            "vec_id": np.arange(4, dtype=np.int64),
            "embedding": [np.full(4, 4.0e6, dtype=np.float64) for _ in range(4)],
        }
    )
    p = str(tmp_path / "big.parquet")
    df.to_parquet(p, index=False)
    with pytest.raises(ValueError, match="Gram bound"):
        embedding_covariance(p)


def test_blocklist_whole_word_semantics(ray_session, tmp_path):
    """Whole-word matches only; n_hits counts occurrences, distinct counts
    terms; clean docs and null text omitted."""
    from hepdata_validator_ray.pipelines.text import blocklist_stats

    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "slow join slow error",   # 3 hits, 2 terms
                "slowly but surely",      # substring only -> no hit
                None,
                "leak",                   # 1 hit, 1 term
            ],
        }
    )
    p = str(tmp_path / "docs.parquet")
    df.to_parquet(p, index=False)
    out = blocklist_stats(p).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [0, 3]
    assert out["n_hits"].tolist() == [3, 1]
    assert out["n_distinct_terms"].tolist() == [2, 1]


def test_keep_best_policy_lexicographic(ray_session, tmp_path):
    """Policy = source DESC (LEXICOGRAPHIC: 'src9' > 'src11'), tie -> min
    doc_id; singleton classes omitted; diverges from keep-first."""
    from hepdata_validator_ray.pipelines.dedup import exact_keep_best

    df = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": ["aa", "aa", "aa", "bb", "cc"],
            "source": ["src2", "src11", "src9", "src1", None],
        }
    )
    p = str(tmp_path / "docs.parquet")
    df.to_parquet(p, index=False)
    out = exact_keep_best(p).to_pandas()
    assert len(out) == 1  # only the 'aa' class has >= 2 members
    r = out.iloc[0]
    assert r["keep_doc_id"] == 2 and r["keep_source"] == "src9" and r["n_members"] == 3


def test_attribution_linear_floor_shares(ray_session, tmp_path):
    """Shares are cents // n_prior per conversion (remainder dropped); a
    touch before a zero-share conversion still appears with credit 0."""
    from hepdata_validator_ray.pipelines import relational

    ts = pd.to_datetime(
        [
            "2024-01-01 00:00",  # e0 u1 click
            "2024-01-01 00:01",  # e1 u1 click
            "2024-01-01 00:02",  # e2 u1 purchase value 0.05 -> 5 cents // 2 = 2 each
            "2024-01-01 00:03",  # e3 u1 click
            "2024-01-01 00:04",  # e4 u1 purchase value 0.02 -> 2 cents // 3 = 0 each
            "2024-01-01 00:05",  # e5 u2 click with no later purchase -> omitted
        ]
    )
    t = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "ts": ts,
            "user_id": np.array([1, 1, 1, 1, 1, 2], dtype=np.int64),
            "event_type": ["click", "click", "purchase", "click", "purchase", "click"],
            "value": [0.0, 0.0, 0.05, 0.0, 0.02, 0.0],
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    t.to_parquet(d / "events.parquet", index=False)
    out = (
        relational.events_attribution_linear(str(d))
        .to_pandas()
        .sort_values("touch_id")
        .reset_index(drop=True)
    )
    # e0, e1: 2 (from e2) + 0 (from e4); e3: 0 (from e4 only); e5 omitted
    assert out["touch_id"].tolist() == [0, 1, 3]
    assert out["credit_cents"].tolist() == [2, 2, 0]


def test_time_weighted_value_semantics(ray_session, tmp_path):
    """Holding-interval weighting: value holds until the NEXT event; last
    event contributes nothing; null-value rows excluded entirely (they
    neither hold state nor break intervals... they are filtered BEFORE
    interval construction, so the surrounding interval spans them);
    zero-duration users yield NULL twa."""
    from hepdata_validator_ray.pipelines import relational

    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00",  # u1 v=1.00 holds 2s
            "2024-01-01 00:00:02",  # u1 v=3.00 holds 1s
            "2024-01-01 00:00:03",  # u1 v=9.99 last -> no interval
            "2024-01-01 00:00:05",  # u2 v=5.00 same-ms pair -> den 0
            "2024-01-01 00:00:05",  # u2 v=7.00 last
            "2024-01-01 00:00:06",  # u3 single event -> omitted
        ]
    )
    t = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "ts": ts,
            "user_id": np.array([1, 1, 1, 2, 2, 3], dtype=np.int64),
            "event_type": ["view"] * 6,
            "value": [1.0, 3.0, 9.99, 5.0, 7.0, 2.0],
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    t.to_parquet(d / "events.parquet", index=False)
    out = (
        relational.events_time_weighted_value(str(d))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 2]
    u1 = out.iloc[0]
    # num = 100*2000 + 300*1000 = 500_000; den = 3000; twa = 166.666...
    assert u1["num_cents_ms"] == 500_000 and u1["den_ms"] == 3000
    assert abs(u1["twa_cents"] - 500_000 / 3000) < 1e-12
    u2 = out.iloc[1]
    assert u2["den_ms"] == 0 and pd.isna(u2["twa_cents"]) and u2["n_intervals"] == 1


def test_windowed_funnel_dp_not_greedy(ray_session, tmp_path):
    """The deadline case where greedy earliest matching is WRONG: u1's
    earliest view times out before the click, but a later view chains —
    exact DP must count the user at every step.  u2's chain breaks at the
    click deadline even though an unbounded funnel would pass."""
    from hepdata_validator_ray.pipelines import relational

    rows = [
        # u1: view@0 (times out), view@59m, click@90m (chains to view@59m),
        # purchase@120m (within 60m of click) -> completes
        (0, "2024-01-01 00:00", 1, "view"),
        (1, "2024-01-01 00:59", 1, "view"),
        (2, "2024-01-01 01:30", 1, "click"),
        (3, "2024-01-01 02:00", 1, "purchase"),
        # u2: view@0, click@45m (ok), purchase@3h (click too old) -> stops at 2
        (4, "2024-01-02 00:00", 2, "view"),
        (5, "2024-01-02 00:45", 2, "click"),
        (6, "2024-01-02 03:45", 2, "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    df["ts"] = pd.to_datetime(df["ts"])
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "events.parquet", index=False)
    out = (
        relational.events_funnel_windowed(str(d))
        .to_pandas()
        .sort_values("step")
        .reset_index(drop=True)
    )
    assert out["n_users"].tolist() == [2, 2, 1]
    # the unbounded funnel would have passed u2 through step 3
    unb = relational.events_funnel(str(d)).to_pandas().sort_values("step")
    assert unb["n_users"].tolist() == [2, 2, 2]


def test_burst_max_window_and_tie(ray_session, tmp_path):
    """Peak trailing-window count with [t-W, t] inclusive semantics; ties
    resolve to the EARLIEST achieving window-end."""
    from hepdata_validator_ray.pipelines import relational

    ts = pd.to_datetime(
        [
            "2024-01-01 00:00", "2024-01-01 00:30", "2024-01-01 00:50",  # burst 3 @00:50
            "2024-01-01 03:00", "2024-01-01 03:20", "2024-01-01 03:40",  # burst 3 again later
        ]
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "ts": ts,
            "user_id": np.int64(1),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "events.parquet", index=False)
    out = relational.events_burst_max(str(d)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["burst_max"] == 3
    assert r["at_us"] == int(pd.Timestamp("2024-01-01 00:50").value // 1000)


def test_anomaly_days_single_outlier_identity(ray_session, tmp_path):
    """One outlier over a constant baseline reduces to (D-1) > k²: with 10
    baseline days the outlier is NOT anomalous (D-1 = 9 = k², strict >),
    with 11 days it IS — the integer boundary both engines decide
    identically because no float mean/σ ever exists."""
    from hepdata_validator_ray.pipelines import relational

    def mk(n_baseline, tmpdir):
        rows = []
        eid = 0
        for day in range(n_baseline):
            for _ in range(5):
                rows.append((eid, pd.Timestamp("2024-01-01") + pd.Timedelta(days=day, minutes=eid % 60), 1, "view"))
                eid += 1
        for _ in range(50):
            rows.append((eid, pd.Timestamp("2024-01-01") + pd.Timedelta(days=n_baseline, minutes=eid % 60), 1, "view"))
            eid += 1
        df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
        d = tmpdir
        d.mkdir(exist_ok=True)
        df.to_parquet(d / "events.parquet", index=False)
        return relational.events_anomaly_days(str(d)).to_pandas()

    out9 = mk(9, tmp_path / "a")   # D = 10 -> D-1 = 9, not > 9 -> clean
    assert not out9["is_anomaly"].any()
    out10 = mk(10, tmp_path / "b")  # D = 11 -> D-1 = 10 > 9 -> flagged
    flagged = out10[out10["is_anomaly"]]
    assert len(flagged) == 1 and flagged.iloc[0]["n_events"] == 50
