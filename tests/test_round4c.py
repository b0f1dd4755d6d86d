"""Round-4 session-8 operators: perplexity filter and friends — crafted
fixtures pinning the conventions the sf gate can't isolate (add-one
smoothing arithmetic, NULL-doc LM contribution, OOV/short-row exclusion)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_seq(tmp_path, doc_ids, tokens):
    t = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "tokens": pa.array(tokens, pa.list_(pa.int64())),
            "n_tok": pa.array([len(x) if x is not None else None for x in tokens], pa.int64()),
            "source": pa.array(["s"] * len(doc_ids), pa.string()),
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    return p


def test_seq_lm_perplexity_hand_computed(tmp_path, ray_session):
    """Corpus LM: (1,2)×3, (2,1)×2 → ctx(1)=3, ctx(2)=2 (V=10).  The NULL-
    doc row feeds the LM but scores no doc; the 1-token row and the
    all-OOV-bigram row emit nothing.  avg_nll spells add-one smoothing:
    doc A = (2·[ln13−ln4] + [ln12−ln3])/3, doc B = ln13−ln4."""
    from hepdata_validator_ray.pipelines.validation import seq_lm_perplexity

    p = _write_seq(
        tmp_path,
        ["A", "B", None, "D", "E"],
        [[1, 2, 1, 2], [1, 2], [2, 1], [5], [1, 12, 2]],
    )
    got = seq_lm_perplexity(p, vocab_size=10).to_pandas().set_index("doc_id")
    nll12 = math.log(13) - math.log(4)
    nll21 = math.log(12) - math.log(3)
    assert set(got.index) == {"A", "B"}
    assert got.loc["A", "m"] == 3
    assert got.loc["A", "avg_nll"] == pytest.approx((2 * nll12 + nll21) / 3, rel=1e-12)
    assert got.loc["B", "m"] == 1
    assert got.loc["B", "avg_nll"] == pytest.approx(nll12, rel=1e-12)


def test_seq_lm_perplexity_uniform_corpus_scores_flat(tmp_path, ray_session):
    """Identical docs must score identically (the filter's fixed point)."""
    from hepdata_validator_ray.pipelines.validation import seq_lm_perplexity

    p = _write_seq(tmp_path, [f"d{i}" for i in range(20)], [[3, 4, 5]] * 20)
    got = seq_lm_perplexity(p, vocab_size=8).to_pandas()
    assert len(got) == 20 and got["m"].eq(2).all()
    assert got["avg_nll"].nunique() == 1
    # ctx(3)=ctx(4)=20; p(4|3) = 21/28, p(5|4) = 21/28
    assert got["avg_nll"].iloc[0] == pytest.approx(math.log(28) - math.log(21), rel=1e-12)


def _write_events(tmp_path, rows):
    """rows: list of (day_offset, event_type); ts = epoch + day·86400s."""
    ts = pd.to_datetime([86400 * d for d, _ in rows], unit="s")
    pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": ts,
            "event_type": [t for _, t in rows],
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    return str(tmp_path)


def test_events_acf_period2_and_degenerates(tmp_path, ray_session):
    """Alternating 3-on/0-off days give the textbook period-2 signature
    (r1 = −0.8, r2 = 0.56667 on a length-5 window — the zeros come from
    GAP-FILL, not from rows); a constant series takes the degenerate
    CASE 0.0; a single-day type emits nothing."""
    rows = []
    for d in (0, 2, 4):  # type 'p2' fires 3× on even days only
        rows += [(d, "p2")] * 3
    rows += [(d, "flat") for d in range(4)]  # constant 1/day
    rows += [(0, "once")]
    sf = _write_events(tmp_path, rows)
    from hepdata_validator_ray.pipelines.relational import events_acf

    got = events_acf(sf).set_index(["event_type", "lag"])
    assert got.loc[("p2", 1), "acf"] == pytest.approx(-0.8, rel=1e-12)
    assert got.loc[("p2", 2), "acf"] == pytest.approx(6.12 / 10.8, rel=1e-12)
    assert got.loc[("p2", 1), "n_days"] == 5
    # lags ≥ m emit no row: p2 spans 5 days → lags 1..4 only
    assert set(got.loc["p2"].index) == {1, 2, 3, 4}
    assert (got.loc["flat", "acf"] == 0.0).all()
    assert "once" not in got.index.get_level_values(0)


def test_events_scd2_runs_and_null_phase(tmp_path, ray_session):
    """A,A,B,A collapses to 3 segments (the re-opened A is a NEW segment,
    not a merge); a NULL type is the '<NULL>' phase and breaks runs like
    any other value; equal timestamps order by event_id."""
    ts0 = pd.Timestamp("2024-01-01")
    rows = [
        ("u1", ts0, 0, "A"),
        ("u1", ts0, 1, "A"),  # same ts: event_id breaks the tie
        ("u1", ts0 + pd.Timedelta("1h"), 2, "B"),
        ("u1", ts0 + pd.Timedelta("2h"), 3, "A"),
        ("u2", ts0, 4, None),
        ("u2", ts0 + pd.Timedelta("1h"), 5, "A"),
        ("u2", ts0 + pd.Timedelta("2h"), 6, None),
    ]
    pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "event_type"]).to_parquet(
        str(tmp_path / "events.parquet"), index=False
    )
    from hepdata_validator_ray.pipelines.relational import events_scd2_history

    got = (
        events_scd2_history(str(tmp_path), num_buckets=2)
        .to_pandas()
        .set_index(["user_id", "seg"])
        .sort_index()
    )
    assert got.loc[("u1", 1), "event_type"] == "A" and got.loc[("u1", 1), "n_events"] == 2
    assert got.loc[("u1", 2), "event_type"] == "B"
    assert got.loc[("u1", 3), "event_type"] == "A" and got.loc[("u1", 3), "n_events"] == 1
    assert got.loc[("u2", 1), "event_type"] == "<NULL>"
    assert got.loc[("u2", 3), "event_type"] == "<NULL>"
    assert got.loc[("u1", 1), "ts_first"] == "2024-01-01 00:00:00"


def test_pareto_frontier_strict_domination(tmp_path, ray_session):
    """Frontier of (x max, y min): (10,1) and (12,3) are incomparable and
    both survive; (10,3) is dominated by BOTH; coordinate-identical twins
    survive together; equal-x points keep only the group-min y."""
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            # text word counts: y = len(split(' ')) = spaces + 1
            "text": ["a", "a b c", "a b c", "a", "a", "a b"],
            "n_chars": [10, 12, 10, 10, 10, 9],
        }
    )
    # y values:     1    3      3     1    1    2
    # (10,1)×3 survive together; (12,3) survives (larger x);
    # (10,3) dominated by (10,1); (9,2) dominated by (10,1)
    p = str(tmp_path / "documents.parquet")
    docs.to_parquet(p, index=False)
    from hepdata_validator_ray.pipelines.profile import docs_pareto_frontier

    got = docs_pareto_frontier(p)
    kept = set(got["doc_id"].tolist())
    assert kept == {0, 1, 3, 4}
    assert got.set_index("doc_id").loc[1, "n_words"] == 3


def test_skyline_mask_batch_merge_invariance(tmp_path, ray_session):
    """The global frontier is invariant to batch boundaries: tiny batches
    (forcing many local frontiers) and one batch agree."""
    rng = np.random.default_rng(7)
    n = 400
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["w " * int(k) + "w" for k in rng.integers(0, 30, n)],
            "n_chars": rng.integers(1, 200, n),
        }
    )
    p = str(tmp_path / "documents.parquet")
    docs.to_parquet(p, index=False)
    from hepdata_validator_ray.pipelines.profile import _skyline_mask, docs_pareto_frontier

    got = set(docs_pareto_frontier(p, batch_size=16)["doc_id"].tolist())
    x = docs["n_chars"].to_numpy(np.int64)
    y = docs["text"].str.split(" ").str.len().to_numpy(np.int64)
    exp = set(docs["doc_id"].to_numpy()[_skyline_mask(x, y)].tolist())
    assert got == exp and len(got) > 0


def test_clustering_coefficient_triangle_plus_tail(tmp_path, ray_session):
    """Co-purchase graph: order 0 buys parts {1,2,3} (a triangle), order 1
    buys {3,4} (a tail).  deg: 1→2, 2→2, 3→3, 4→1.  lcc(1)=lcc(2)=1;
    lcc(3)=2·1/(3·2)=1/3; node 4 (deg 1) is absent — and its absence is
    the deg≥2 rule, not a missing-triangle artifact."""
    pd.DataFrame(
        {
            "l_orderkey": np.array([0, 0, 0, 1, 1], dtype=np.int64),
            "l_partkey": np.array([1, 2, 3, 3, 4], dtype=np.int64),
        }
    ).to_parquet(str(tmp_path / "lineitem.parquet"), index=False)
    from hepdata_validator_ray.pipelines.graph import clustering_coefficient

    got = clustering_coefficient(str(tmp_path), num_buckets=4).to_pandas().set_index("node")
    assert set(got.index) == {1, 2, 3}
    assert got.loc[1, "lcc"] == 1.0 and got.loc[2, "lcc"] == 1.0
    assert got.loc[3, "lcc"] == pytest.approx(1 / 3)
    assert got.loc[3, "deg"] == 3 and got.loc[3, "n_tri"] == 1


def test_clustering_coefficient_zero_triangles_reported(tmp_path, ray_session):
    """A pure star (center 9 with leaves 1..3, no leaf co-purchases beyond
    the hub) has deg(9)=3, zero triangles → lcc 0.0 ROW, not absence."""
    pd.DataFrame(
        {
            "l_orderkey": np.array([0, 0, 1, 1, 2, 2], dtype=np.int64),
            "l_partkey": np.array([9, 1, 9, 2, 9, 3], dtype=np.int64),
        }
    ).to_parquet(str(tmp_path / "lineitem.parquet"), index=False)
    from hepdata_validator_ray.pipelines.graph import clustering_coefficient

    got = clustering_coefficient(str(tmp_path), num_buckets=4).to_pandas().set_index("node")
    assert got.loc[9, "n_tri"] == 0 and got.loc[9, "lcc"] == 0.0 and got.loc[9, "deg"] == 3


def test_adamic_adar_weighting_and_cap(tmp_path, ray_session):
    """Pair (1,2) co-occurs in two 2-part baskets (AA = 2/ln2 ≈ 2.885);
    pair (3,4) in one 3-part basket (AA = 1/ln3); the max_deg cap drops
    the giant basket entirely, so (5,6) never appears; ranking is by
    n_common DESC then part ids."""
    rows = [
        (0, 1), (0, 2),          # basket {1,2}
        (1, 1), (1, 2),          # basket {1,2} again
        (2, 3), (2, 4), (2, 7),  # basket {3,4,7}
        (3, 5), (3, 6), (3, 8),  # giant basket (capped out)
    ]
    pd.DataFrame(
        {
            "l_orderkey": np.array([o for o, _ in rows], dtype=np.int64),
            "l_partkey": np.array([p for _, p in rows], dtype=np.int64),
        }
    ).to_parquet(str(tmp_path / "lineitem.parquet"), index=False)
    from hepdata_validator_ray.pipelines.graph import adamic_adar_topk

    got = adamic_adar_topk(str(tmp_path), k=10, max_deg=2, num_buckets=4)
    pairs = {(r.p1, r.p2): (r.n_common, r.aa_score) for r in got.itertuples()}
    assert pairs == {(1, 2): (2, pytest.approx(2 / math.log(2)))}

    got2 = adamic_adar_topk(str(tmp_path), k=10, max_deg=3, num_buckets=4)
    assert got2.iloc[0][["p1", "p2"]].tolist() == [1, 2]  # n_common=2 ranks first
    m = {(r.p1, r.p2): r.aa_score for r in got2.itertuples()}
    assert m[(3, 4)] == pytest.approx(1 / math.log(3))
    assert (5, 6) in m and m[(5, 6)] == pytest.approx(1 / math.log(3))


def test_prf_expansion_hand_computed(tmp_path, ray_session):
    """Query 'q' matches docs 0,1 (the feedback set with k=2).  Candidate
    words: 'rare' (tf_fb=2, df=2), 'common' (tf_fb=1, df=3), and 'q'
    itself is EXCLUDED.  N=4: score(rare)=2·ln2 > score(common)=ln(4/3) —
    feedback-frequent corpus-rare words win."""
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "q rare common",
                "q rare",
                "common noise noise",
                "common",
            ],
        }
    )
    p = str(tmp_path / "documents.parquet")
    docs.to_parquet(p, index=False)
    from hepdata_validator_ray.pipelines.retrieval import prf_expansion_terms

    got = prf_expansion_terms(p, terms=["q"], k=2, m=10).set_index("word")
    assert "q" not in got.index
    assert got.loc["rare", "tf_fb"] == 2 and got.loc["rare", "df"] == 2
    assert got.loc["rare", "prf_score"] == pytest.approx(2 * math.log(2), rel=1e-12)
    assert got.loc["common", "df"] == 3
    assert got.loc["common", "prf_score"] == pytest.approx(math.log(4 / 3), rel=1e-12)
    assert got.loc["rare", "rank"] == 1


def test_doc_token_entropy_conventions(tmp_path, ray_session):
    """[1,1,2,2] → ln2; [5,5,5] → 0.0 (positively signed); OOV ids drop
    from the distribution; all-OOV and NULL-doc rows emit nothing;
    duplicate doc_ids stay separate rows."""
    p = _write_seq(
        tmp_path,
        ["A", "B", None, "C", "A"],
        [[1, 1, 2, 2], [5, 5, 5], [1, 2], [99, 1], [7]],
    )
    from hepdata_validator_ray.pipelines.validation import doc_token_entropy

    got = doc_token_entropy(p, vocab_size=10).to_pandas()
    assert len(got) == 4  # null-doc row gone; dup 'A' twice
    a_rows = got[got["doc_id"] == "A"].sort_values("n_valid")
    assert len(a_rows) == 2
    assert a_rows.iloc[1]["entropy"] == pytest.approx(math.log(2), rel=1e-12)
    b = got[got["doc_id"] == "B"].iloc[0]
    assert b["entropy"] == 0.0 and math.copysign(1, b["entropy"]) == 1.0
    c = got[got["doc_id"] == "C"].iloc[0]
    assert c["n_valid"] == 1 and c["n_types"] == 1  # 99 is OOV, only 1 counts


def test_events_seasonal_error_hand_computed(tmp_path, ray_session):
    """Perfectly 7-periodic series → mae 0; a one-day burst at t=8 over a
    flat 1/day baseline costs |5−1| once + |1−5| once = 8 over n_pred."""
    rows = []
    for d in range(14):
        rows += [(d, "periodic")] * (3 if d % 7 == 0 else 1)
    for d in range(16):
        rows += [(d, "burst")] * (5 if d == 8 else 1)
    sf = _write_events(tmp_path, rows)
    from hepdata_validator_ray.pipelines.relational import events_seasonal_error

    got = events_seasonal_error(sf).set_index("event_type")
    assert got.loc["periodic", "total_abs_err"] == 0 and got.loc["periodic", "mae"] == 0.0
    assert got.loc["periodic", "n_pred"] == 7
    assert got.loc["burst", "n_pred"] == 9
    assert got.loc["burst", "total_abs_err"] == 8
    assert got.loc["burst", "mae"] == pytest.approx(8 / 9)


def test_hill_tail_hand_computed(tmp_path, ray_session):
    """20 users: one with 8 events, one with 4, the rest with 1 →
    k = max(1, 20//10) = 2, x_(3) = 1, α = 2/(ln8 + ln4) = 2/(5·ln2);
    a tie-block spanning the k boundary resolves by multiplicity, not
    order; an all-equal top (uniform users) takes the degenerate 0.0."""
    recs = []
    eid = 0
    for _ in range(8):
        recs.append((eid, "power")); eid += 1
    for _ in range(4):
        recs.append((eid, "mid")); eid += 1
    for i in range(18):
        recs.append((eid, f"one{i}")); eid += 1
    pd.DataFrame(
        {
            "event_id": np.array([e for e, _ in recs], dtype=np.int64),
            "ts": pd.to_datetime([0] * len(recs), unit="s"),
            "user_id": [u for _, u in recs],
            "event_type": ["t"] * len(recs),
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_hill_tail

    got = events_hill_tail(str(tmp_path)).iloc[0]
    assert got["n_users"] == 20 and got["k"] == 2 and got["x_k1"] == 1
    assert got["hill_alpha"] == pytest.approx(2 / (5 * math.log(2)), rel=1e-12)


def test_hill_tail_degenerate_uniform(tmp_path, ray_session):
    """All users equally active → every ln ratio is exactly 0 → CASE 0.0."""
    recs = [(i, f"u{i % 30}") for i in range(30)]
    pd.DataFrame(
        {
            "event_id": np.array([e for e, _ in recs], dtype=np.int64),
            "ts": pd.to_datetime([0] * len(recs), unit="s"),
            "user_id": [u for _, u in recs],
            "event_type": ["t"] * len(recs),
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_hill_tail

    got = events_hill_tail(str(tmp_path)).iloc[0]
    assert got["hill_alpha"] == 0.0 and got["k"] == 3


def test_embedding_silhouette_two_tight_clusters(tmp_path, ray_session):
    """Two well-separated tight clusters → silhouettes near 1; a planted
    point sitting in the OTHER cluster's direction scores negative; a
    singleton label is excluded (a undefined), and its points never
    appear — but it still serves as a 'b' target for others."""
    rng = np.random.default_rng(3)
    ax1 = np.zeros(8); ax1[0] = 1.0
    ax2 = np.zeros(8); ax2[1] = 1.0
    rows = []
    for i in range(10):
        rows.append((i, (ax1 + rng.normal(0, 0.01, 8)).astype(np.float32), 0))
    for i in range(10, 20):
        rows.append((i, (ax2 + rng.normal(0, 0.01, 8)).astype(np.float32), 1))
    rows.append((20, ax2.astype(np.float32), 0))  # mislabeled: points along cluster 1
    rows.append((21, (np.ones(8) / np.sqrt(8)).astype(np.float32), 7))  # singleton label
    pd.DataFrame(
        {
            "vec_id": np.array([r[0] for r in rows], dtype=np.int64),
            "embedding": [r[1] for r in rows],
            "label": np.array([r[2] for r in rows], dtype=np.int32),
        }
    ).to_parquet(str(tmp_path / "embeddings.parquet"), index=False)
    from hepdata_validator_ray.pipelines.cluster import embedding_silhouette

    got = embedding_silhouette(str(tmp_path / "embeddings.parquet")).to_pandas().set_index("vec_id")
    assert 21 not in got.index  # singleton label excluded
    assert (got.loc[:9, "silhouette"] > 0.8).all()
    assert got.loc[20, "silhouette"] < 0  # the mislabel suspect


def test_association_rules_conf_lift(tmp_path, ray_session):
    """4 baskets: {1,2} ×3 and {1,3} ×1.  supp(1)=4, supp(2)=3, supp(3)=1.
    Rule 1→2: conf 3/4, lift 4·3/(4·3)=1; rule 2→1: conf 1, lift 1;
    pair (1,3) dies at min_support=2.  Both directions emitted."""
    recs = [(0, 1), (0, 2), (1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3)]
    pd.DataFrame(
        {
            "l_orderkey": np.array([o for o, _ in recs], dtype=np.int64),
            "l_partkey": np.array([p for _, p in recs], dtype=np.int64),
        }
    ).to_parquet(str(tmp_path / "lineitem.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import association_rules

    got = association_rules(str(tmp_path), k=10, min_support=2, num_buckets=4)
    rules = {(r.antecedent, r.consequent): r for r in got.itertuples()}
    assert set(rules) == {(1, 2), (2, 1)}
    assert rules[(1, 2)].confidence == pytest.approx(0.75)
    assert rules[(1, 2)].lift == pytest.approx(1.0)
    assert rules[(2, 1)].confidence == pytest.approx(1.0)
    assert rules[(1, 2)].supp_pair == 3 and rules[(1, 2)].supp_ante == 4


def test_mann_kendall_trends(tmp_path, ray_session):
    """Strictly rising daily counts (1,2,3,4) → S = 6 = m(m−1)/2, tau 1;
    a flat series → S 0; the gap-fill zero makes day 1 of 'gap' (0
    events) COUNT as a value: series (1,0,2) → S = sign(-1)+sign(1)+
    sign(2) = 1."""
    rows = []
    for d in range(4):
        rows += [(d, "up")] * (d + 1)
    rows += [(d, "flat") for d in range(3)]
    rows += [(0, "gap"), (2, "gap"), (2, "gap")]
    sf = _write_events(tmp_path, rows)
    from hepdata_validator_ray.pipelines.relational import events_trend_mk

    got = events_trend_mk(sf).set_index("event_type")
    assert got.loc["up", "s_stat"] == 6 and got.loc["up", "tau"] == 1.0
    assert got.loc["flat", "s_stat"] == 0
    assert got.loc["gap", "s_stat"] == 1 and got.loc["gap", "n_days"] == 3


def test_partition_pruned_read_touches_only_one_dir(tmp_path, ray_session):
    """The partition filter prunes at the PATH level: the dataset's input
    files all live under source=a/, and the counts match a flat filter."""
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": ["x"] * 40,
            "lang": (["en"] * 3 + ["de"] * 1) * 10,
            "source": (["a"] * 2 + ["b"] * 2) * 10,
            "n_chars": np.arange(40, dtype=np.int64),
        }
    )
    p = str(tmp_path / "documents.parquet")
    docs.to_parquet(p, index=False)
    import ray.data as rd
    from ray.data.datasource.partitioning import Partitioning, PathPartitionFilter

    from hepdata_validator_ray.pipelines.validation import (
        ensure_partitioned_documents,
        partition_pruned_counts,
    )

    part_dir = ensure_partitioned_documents(p)
    ds = rd.read_parquet(
        part_dir,
        partition_filter=PathPartitionFilter.of(lambda kv: kv.get("source") == "a", style="hive"),
        file_extensions=["parquet"],
    )
    files = ds.input_files()
    assert files and all("source=a" in f for f in files)  # b/ dirs never opened

    got = partition_pruned_counts(p, source="a").set_index("lang")
    flat = docs[docs["source"] == "a"].groupby("lang").agg(
        n_docs=("lang", "size"), sum_chars=("n_chars", "sum")
    )
    assert got["n_docs"].to_dict() == flat["n_docs"].to_dict()
    assert got["sum_chars"].to_dict() == {k: int(v) for k, v in flat["sum_chars"].items()}

    # idempotent: second call reuses the materialized copy
    assert ensure_partitioned_documents(p) == part_dir


def test_ann_ivf_recall_full_probe_is_exact(tmp_path, ray_session):
    """Probing ALL cells makes IVF ≡ brute (recall 1.0 everywhere); a
    1-probe budget on a two-lobe corpus stays 1.0 for in-lobe queries —
    their true neighbors live in their own cell."""
    rng = np.random.default_rng(5)
    ax1 = np.zeros(8); ax1[0] = 1.0
    ax2 = np.zeros(8); ax2[1] = 1.0
    vecs = [((ax1 if i % 2 == 0 else ax2) + rng.normal(0, 0.02, 8)).astype(np.float32) for i in range(60)]
    pd.DataFrame(
        {
            "vec_id": np.arange(60, dtype=np.int64),
            "embedding": vecs,
            "label": np.zeros(60, dtype=np.int32),
        }
    ).to_parquet(str(tmp_path / "embeddings.parquet"), index=False)
    from hepdata_validator_ray.pipelines.similarity import ann_ivf_recall

    full = ann_ivf_recall(
        str(tmp_path / "embeddings.parquet"), k=5, n_queries=6, n_probe=2, centroid_ids=(0, 1)
    )
    assert (full["recall"] == 1.0).all() and (full["n_ivf"] == 5).all()

    one = ann_ivf_recall(
        str(tmp_path / "embeddings.parquet"), k=5, n_queries=6, n_probe=1, centroid_ids=(0, 1)
    )
    assert (one["recall"] == 1.0).all()  # lobes are separable: 1 probe suffices


def test_ann_ivf_recall_degrades_for_straddling_query(tmp_path, ray_session):
    """A query sitting exactly BETWEEN two tight lobes has true neighbors
    in both cells; a 1-probe budget can only see one → recall < 1, while
    2 probes recover 1.0.  That asymmetry is the op's whole point."""
    rng = np.random.default_rng(9)
    ax1 = np.zeros(8); ax1[0] = 1.0
    ax2 = np.zeros(8); ax2[1] = 1.0
    mid = (ax1 + ax2) / np.sqrt(2)
    vecs = [mid.astype(np.float32)]
    for i in range(1, 41):
        base = ax1 if i % 2 == 0 else ax2
        vecs.append((base + rng.normal(0, 0.02, 8)).astype(np.float32))
    pd.DataFrame(
        {
            "vec_id": np.arange(41, dtype=np.int64),
            "embedding": vecs,
            "label": np.zeros(41, dtype=np.int32),
        }
    ).to_parquet(str(tmp_path / "embeddings.parquet"), index=False)
    from hepdata_validator_ray.pipelines.similarity import ann_ivf_recall

    kw = dict(k=10, n_queries=1, centroid_ids=(2, 3))  # one centroid per lobe
    one = ann_ivf_recall(str(tmp_path / "embeddings.parquet"), n_probe=1, **kw)
    two = ann_ivf_recall(str(tmp_path / "embeddings.parquet"), n_probe=2, **kw)
    assert two.loc[0, "recall"] == 1.0
    assert one.loc[0, "recall"] < 1.0  # the unseen lobe's neighbors are lost


def test_docs_dup_rate_by_source(tmp_path, ray_session):
    """Source a: 4 docs, 2 distinct texts → dup_rate 0.5; source b: all
    unique → 0; NULL texts are excluded from BOTH counts; the same text
    in two sources counts distinct in each."""
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": ["x", "x", "y", "y", "p", "q", None, "x"],
            "source": ["a", "a", "a", "a", "b", "b", "b", "b"],
        }
    )
    p = str(tmp_path / "documents.parquet")
    docs.to_parquet(p, index=False)
    from hepdata_validator_ray.pipelines.profile import docs_dup_rate_by_source

    got = docs_dup_rate_by_source(p, num_buckets=4).set_index("source")
    assert got.loc["a", "n_docs"] == 4 and got.loc["a", "n_distinct"] == 2
    assert got.loc["a", "dup_rate"] == pytest.approx(0.5)
    assert got.loc["b", "n_docs"] == 3 and got.loc["b", "n_distinct"] == 3
    assert got.loc["b", "dup_rate"] == 0.0


def test_docs_length_scaling_exact_power_law(tmp_path, ray_session):
    """n_chars = n_words² gives slope exactly 2 (ln-ln OLS on a perfect
    power law); a constant-n_words source is a degenerate design → 0."""
    rows = []
    for w in (1, 2, 4, 8):
        rows.append(("pow", "w " * (w - 1) + "w", w * w))
    for _ in range(3):
        rows.append(("flat", "a b", 7))
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(rows), dtype=np.int64),
            "source": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "n_chars": np.array([r[2] for r in rows], dtype=np.int64),
        }
    )
    p = str(tmp_path / "documents.parquet")
    docs.to_parquet(p, index=False)
    from hepdata_validator_ray.pipelines.profile import docs_length_scaling

    got = docs_length_scaling(p, num_buckets=4).set_index("source")
    assert got.loc["pow", "slope"] == pytest.approx(2.0, rel=1e-12)
    assert got.loc["pow", "intercept"] == pytest.approx(0.0, abs=1e-12)
    assert got.loc["flat", "slope"] == 0.0 and got.loc["flat", "n_docs"] == 3


def test_weighted_median_vs_row_median(tmp_path, ray_session):
    """Lengths [1×9, 100]: row median is 1 but the 100-token doc carries
    >half the budget → weighted median 100.  All-zero source → 0."""
    rows = [{"source": "skew", "n_tok": 1, "tokens": []}] * 9
    rows += [{"source": "skew", "n_tok": 100, "tokens": []}]
    rows += [{"source": "zero", "n_tok": 0, "tokens": []}] * 2
    from hepdata_validator_ray.pipelines.validation import weighted_median_ntok

    got = weighted_median_ntok(_write_seq_rows(tmp_path, rows)).set_index("source")
    assert got.loc["skew", "wmedian"] == 100 and got.loc["skew", "total_tokens"] == 109
    assert got.loc["zero", "wmedian"] == 0


def _write_seq_rows(tmp_path, rows):
    t = pa.table(
        {
            "doc_id": pa.array([str(i) for i in range(len(rows))], pa.string()),
            "tokens": pa.array([r.get("tokens") for r in rows], pa.list_(pa.int64())),
            "n_tok": pa.array([r.get("n_tok") for r in rows], pa.int64()),
            "source": pa.array([r.get("source") for r in rows], pa.string()),
        }
    )
    p = str(tmp_path / "seqw.parquet")
    pq.write_table(t, p)
    return p


def test_top_users_with_ties_keeps_whole_level(tmp_path, ray_session):
    """Counts 5,5,3,3,3,1 with k=2 keep BOTH 5s and ALL THREE 3s (5 rows)
    — dense-rank semantics; row-number top-2 would keep 2 rows."""
    recs = []
    eid = 0
    for u, c in (("a", 5), ("b", 5), ("c", 3), ("d", 3), ("e", 3), ("f", 1)):
        for _ in range(c):
            recs.append((eid, u)); eid += 1
    pd.DataFrame(
        {
            "event_id": np.array([e for e, _ in recs], dtype=np.int64),
            "ts": pd.to_datetime([0] * len(recs), unit="s"),
            "user_id": [u for _, u in recs],
            "event_type": ["t"] * len(recs),
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import top_users_per_type_with_ties

    got = top_users_per_type_with_ties(str(tmp_path), k=2, num_buckets=2).to_pandas()
    assert len(got) == 5 and set(got["user_id"]) == {"a", "b", "c", "d", "e"}
    assert set(got.loc[got["rank"] == 2, "user_id"]) == {"c", "d", "e"}


def test_rfm_segments_hand_computed(tmp_path, ray_session):
    """8 users with distinct frequencies 1..8 → quartile edges (ceil rank)
    at 2, 4, 6; frequency buckets are {1,2}=0, {3,4}=1, {5,6}=2, {7,8}=3.
    Everyone shares one day and value, so r/m collapse to bucket 0 and
    the cube is the 4-cell frequency marginal, 2 users each."""
    recs = []
    eid = 0
    for i in range(1, 9):
        for _ in range(i):
            recs.append((eid, f"u{i}")); eid += 1
    pd.DataFrame(
        {
            "event_id": np.array([e for e, _ in recs], dtype=np.int64),
            "ts": pd.to_datetime([0] * len(recs), unit="s"),
            "user_id": [u for _, u in recs],
            "event_type": ["t"] * len(recs),
            "value": np.ones(len(recs)),
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_rfm_segments

    got = events_rfm_segments(str(tmp_path))
    assert (got["r_bucket"] == 0).all()
    f_marginal = got.groupby("f_bucket")["n_users"].sum().to_dict()
    assert f_marginal == {0: 2, 1: 2, 2: 2, 3: 2}
    # monetary = cents sum = 100·f, so m buckets mirror f buckets exactly
    assert (got["m_bucket"] == got["f_bucket"]).all()


def test_entropy_rate_deterministic_vs_uniform(tmp_path, ray_session):
    """A deterministic cycle 1,2,1,2,... has h_rate 0 (each context has
    ONE successor); an even two-way branch costs exactly ln 2."""
    from hepdata_validator_ray.pipelines.validation import corpus_entropy_rate

    p1 = _write_seq(tmp_path, ["A"], [[1, 2] * 8])
    got = corpus_entropy_rate(p1, vocab_size=8).iloc[0]
    assert got["h_rate"] == pytest.approx(0.0, abs=1e-12)

    # context 1 → {2, 3} evenly; contexts 2,3 always → 1
    seq = [1, 2, 1, 3] * 6
    d2 = tmp_path / "b"
    d2.mkdir()
    got2 = corpus_entropy_rate(_write_seq(d2, ["A"], [seq]), vocab_size=8).iloc[0]
    # 12 of 23 bigrams leave context 1 with H=ln2; the rest are deterministic
    assert got2["h_rate"] == pytest.approx((12 / 23) * math.log(2), rel=1e-9)


def test_events_cvar_tail_mean(tmp_path, ray_session):
    """Values 1..100 (cents 100..10000), tail 5% → k=5, top values
    9600..10000 → tail mean 9800; a boundary TIE contributes only its
    partial count (multiset order statistics, not whole levels)."""
    recs = [(i, float(i + 1)) for i in range(100)]
    pd.DataFrame(
        {
            "event_id": np.array([e for e, _ in recs], dtype=np.int64),
            "ts": pd.to_datetime([0] * len(recs), unit="s"),
            "user_id": ["u"] * len(recs),
            "event_type": ["t"] * len(recs),
            "value": np.array([v for _, v in recs]),
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_value_cvar

    got = events_value_cvar(str(tmp_path)).set_index("event_type")
    assert got.loc["t", "k"] == 5
    assert got.loc["t", "tail_sum_cents"] == (9600 + 9700 + 9800 + 9900 + 10000)
    assert got.loc["t", "cvar_cents"] == pytest.approx(9800.0)


def test_events_cvar_boundary_tie_partial(tmp_path, ray_session):
    """Ten equal values with k=1: the tie level contributes exactly ONE
    copy to the tail sum, not the whole level."""
    pd.DataFrame(
        {
            "event_id": np.arange(10, dtype=np.int64),
            "ts": pd.to_datetime([0] * 10, unit="s"),
            "user_id": ["u"] * 10,
            "event_type": ["t"] * 10,
            "value": np.full(10, 7.0),
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_value_cvar

    got = events_value_cvar(str(tmp_path)).iloc[0]
    assert got["k"] == 1 and got["tail_sum_cents"] == 700 and got["cvar_cents"] == 700.0


def test_nearest_join_tie_prefers_earlier(tmp_path, ray_session):
    """An error at t=100 with clicks at t=90 and t=110 (equal |dt|=10s)
    picks the EARLIER click; two clicks at the same ts pick the smaller
    event_id; a user with no clicks emits nothing; dt_us is signed."""
    rows = [
        # user A: error 1 at 100s; clicks 0 at 90s, 2 at 110s (tie)
        ("A", 1, 100, "error"),
        ("A", 0, 90, "click"),
        ("A", 2, 110, "click"),
        # user B: error 10 at 50s; clicks 11,12 both at 60s (same-ts tie)
        ("B", 10, 50, "error"),
        ("B", 12, 60, "click"),
        ("B", 11, 60, "click"),
        # user C: error with no click
        ("C", 20, 10, "error"),
    ]
    pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "event_id": np.array([r[1] for r in rows], dtype=np.int64),
            "ts": pd.to_datetime([r[2] for r in rows], unit="s"),
            "event_type": [r[3] for r in rows],
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_nearest_join

    got = events_nearest_join(str(tmp_path), num_buckets=2).to_pandas().set_index("event_id")
    assert got.loc[1, "nearest_event_id"] == 0 and got.loc[1, "dt_us"] == -10_000_000
    assert got.loc[10, "nearest_event_id"] == 11 and got.loc[10, "dt_us"] == 10_000_000
    assert 20 not in got.index


def test_kruskal_matches_scipy_formula(tmp_path, ray_session):
    """Two clearly shifted groups: H matches the textbook tie-corrected
    computation (replicated in numpy here); identical groups give H ≈ 0;
    all-equal values take the structural degenerate CASE."""
    vals_a = [1.0, 2.0, 3.0, 4.0]
    vals_b = [10.0, 11.0, 12.0, 13.0]
    recs = [(i, "a", v) for i, v in enumerate(vals_a)] + [
        (i + 10, "b", v) for i, v in enumerate(vals_b)
    ]
    pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in recs], dtype=np.int64),
            "ts": pd.to_datetime([0] * len(recs), unit="s"),
            "user_id": ["u"] * len(recs),
            "event_type": [r[1] for r in recs],
            "value": np.array([r[2] for r in recs]),
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_kruskal

    got = events_kruskal(str(tmp_path)).iloc[0]
    # no ties, complete separation of 4+4 ranks: H = 12/(8·9)·(4·2.5²+4·6.5²)−27
    expected = 12.0 / 72.0 * (4 * 2.5**2 + 4 * 6.5**2) - 27.0
    assert got["h_stat"] == pytest.approx(expected, rel=1e-12)
    assert got["h_corrected"] == pytest.approx(expected, rel=1e-12)  # no ties

    # all-equal values: one level → structural degenerate case
    pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "ts": pd.to_datetime([0] * 6, unit="s"),
            "user_id": ["u"] * 6,
            "event_type": ["a", "a", "a", "b", "b", "b"],
            "value": np.full(6, 5.0),
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    got2 = events_kruskal(str(tmp_path)).iloc[0]
    assert got2["n_levels"] == 1 and got2["h_corrected"] == 0.0


def test_user_features_distinct_across_batches(tmp_path, ray_session):
    """Distinct type/day counts survive batch splits: a user whose
    duplicate (type, day) pairs land in different partials still counts
    them once; NULL value → 0 cents; NULL type is a real '<NULL>' type."""
    recs = []
    for i in range(10):  # same type+day repeated → 1 type, 1 day
        recs.append((i, "u1", 0, "A", 2.0))
    recs.append((10, "u1", 86400 * 3, None, None))  # day 3, NULL type+value
    pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in recs], dtype=np.int64),
            "user_id": [r[1] for r in recs],
            "ts": pd.to_datetime([r[2] for r in recs], unit="s"),
            "event_type": [r[3] for r in recs],
            "value": np.array([r[4] for r in recs], dtype=np.float64),
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_user_features

    got = events_user_features(str(tmp_path)).to_pandas().set_index("user_id")
    u = got.loc["u1"]
    assert u["n_events"] == 11 and u["n_types"] == 2 and u["n_days"] == 2
    assert u["first_day"] == 0 and u["last_day"] == 3 and u["span_days"] == 3
    assert u["total_cents"] == 10 * 200


def test_truncation_curve_hand_computed(tmp_path, ray_session):
    """Lengths [100, 200, 600]: at budget 128 only the 100 fits and kept
    = 100+128+128 = 356 of 900; at 1024 everything fits, zero loss."""
    rows = [{"source": "s", "n_tok": v, "tokens": []} for v in (100, 200, 600)]
    from hepdata_validator_ray.pipelines.validation import truncation_loss_curve

    got = truncation_loss_curve(
        _write_seq_rows(tmp_path, rows), budgets=(128, 1024)
    ).set_index("budget")
    assert got.loc[128, "n_fit"] == 1 and got.loc[128, "tokens_kept"] == 356
    assert got.loc[128, "tokens_lost"] == 544
    assert got.loc[128, "frac_kept"] == pytest.approx(356 / 900)
    assert got.loc[1024, "n_fit"] == 3 and got.loc[1024, "tokens_lost"] == 0


def test_charclass_panel_hand_computed(tmp_path, ray_session):
    """'ab1 c' → 5 chars, 3 alpha, 1 digit, 1 space; NULL text drops."""
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": ["ab1 c", None, "99"],
            "source": ["a", "a", "b"],
        }
    )
    p = str(tmp_path / "documents.parquet")
    docs.to_parquet(p, index=False)
    from hepdata_validator_ray.pipelines.profile import docs_charclass_by_source

    got = docs_charclass_by_source(p).set_index("source")
    assert got.loc["a", "n_docs"] == 1 and got.loc["a", "n_chars"] == 5
    assert got.loc["a", "n_alpha"] == 3 and got.loc["a", "n_digit"] == 1
    assert got.loc["a", "frac_space"] == pytest.approx(0.2)
    assert got.loc["b", "frac_digit"] == 1.0


def test_embedding_dim_stats_dead_dim(tmp_path, ray_session):
    """A constant (dead) dimension reports var 0 and mean = the constant;
    a live dimension matches numpy's population moments."""
    rng = np.random.default_rng(2)
    live = rng.normal(0, 1, 50)
    vecs = [np.array([7.0, live[i]], dtype=np.float32) for i in range(50)]
    pd.DataFrame(
        {
            "vec_id": np.arange(50, dtype=np.int64),
            "embedding": vecs,
            "label": np.zeros(50, dtype=np.int32),
        }
    ).to_parquet(str(tmp_path / "embeddings.parquet"), index=False)
    from hepdata_validator_ray.pipelines.cluster import embedding_dim_stats

    got = embedding_dim_stats(str(tmp_path / "embeddings.parquet")).set_index("dim")
    assert got.loc[1, "mean"] == pytest.approx(7.0) and got.loc[1, "var_pop"] == pytest.approx(0.0, abs=1e-12)
    lf = live.astype(np.float32).astype(np.float64)
    assert got.loc[2, "mean"] == pytest.approx(lf.mean(), rel=1e-12)
    assert got.loc[2, "var_pop"] == pytest.approx(lf.var(), rel=1e-9)
    assert got.loc[2, "min_v"] == pytest.approx(lf.min())


def test_theil_uniform_and_concentrated(tmp_path, ray_session):
    """Uniform users → exactly 0.0 (ln 1 is exact, no epsilon); one user
    owning everything among n would approach ln(n): 2 users at (9, 1)
    events give T = (1/2)[(9/5)ln(9/5) + (1/5)ln(1/5)]."""
    recs = [(i, f"u{i % 5}") for i in range(20)]  # 5 users × 4 events
    pd.DataFrame(
        {
            "event_id": np.array([e for e, _ in recs], dtype=np.int64),
            "ts": pd.to_datetime([0] * len(recs), unit="s"),
            "user_id": [u for _, u in recs],
            "event_type": ["t"] * len(recs),
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_user_theil

    got = events_user_theil(str(tmp_path)).iloc[0]
    assert got["theil"] == 0.0

    recs2 = [(i, "a") for i in range(9)] + [(9, "b")]
    pd.DataFrame(
        {
            "event_id": np.array([e for e, _ in recs2], dtype=np.int64),
            "ts": pd.to_datetime([0] * 10, unit="s"),
            "user_id": [u for _, u in recs2],
            "event_type": ["t"] * 10,
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    got2 = events_user_theil(str(tmp_path)).iloc[0]
    exp = 0.5 * ((9 / 5) * math.log(9 / 5) + (1 / 5) * math.log(1 / 5))
    assert got2["theil"] == pytest.approx(exp, rel=1e-12)


def test_fano_bursty_vs_metronomic(tmp_path, ray_session):
    """Alternating 3/0 days: VMR = (5·27 − 81)/(5·9) = 1.2 (bursty);
    constant 1/day: exactly 0 (metronomic, below-Poisson)."""
    rows = []
    for d in (0, 2, 4):
        rows += [(d, "burst")] * 3
    rows += [(d, "flat") for d in range(4)]
    sf = _write_events(tmp_path, rows)
    from hepdata_validator_ray.pipelines.relational import events_fano

    got = events_fano(sf).set_index("event_type")
    assert got.loc["burst", "fano"] == pytest.approx(1.2, rel=1e-12)
    assert got.loc["burst", "mean_per_day"] == pytest.approx(1.8)
    assert got.loc["flat", "fano"] == 0.0


def test_violation_roundtrip_partitioned_and_cleaned(tmp_path, ray_session):
    """The roundtrip writes one subdir per check_name and removes its
    unique output dir after the read; counts match the in-memory pass."""
    import glob as _glob

    from hepdata_validator_ray.pipelines.validation import (
        violation_counts,
        violation_counts_roundtrip,
    )

    p = _write_seq(tmp_path, ["A", None, "C"], [[1, 2], [1], [999999999]])
    before = set(_glob.glob("/tmp/hvr_roundtrip/*"))
    got = violation_counts_roundtrip(p).set_index("check_name")["n"].to_dict()
    mem = violation_counts(p).to_pandas().set_index("check_name")["n"].to_dict()
    assert got == mem and len(got) > 0
    assert set(_glob.glob("/tmp/hvr_roundtrip/*")) == before  # cleaned up


def test_rich_club_star_vs_clique_core(tmp_path, ray_session):
    """A 3×3 biclique (all deg 3) plus pendant leaves: at k=2 only the
    core qualifies (n_k=6, e_k=9, φ=2·9/30=0.6); at k=4 nobody
    qualifies and the row is ABSENT."""
    pairs = [(c, s) for c in range(3) for s in range(3)]  # biclique
    pairs += [(10, 0), (11, 1), (12, 2), (0, 10), (1, 11), (2, 12)]  # leaves
    pd.DataFrame(
        {
            "o_orderkey": np.arange(len(pairs), dtype=np.int64),
            "o_custkey": np.array([c for c, _ in pairs], dtype=np.int64),
        }
    ).to_parquet(str(tmp_path / "orders.parquet"), index=False)
    pd.DataFrame(
        {
            "l_orderkey": np.arange(len(pairs), dtype=np.int64),
            "l_suppkey": np.array([s for _, s in pairs], dtype=np.int64),
        }
    ).to_parquet(str(tmp_path / "lineitem.parquet"), index=False)
    from hepdata_validator_ray.pipelines.graph import rich_club

    got = rich_club(str(tmp_path), ks=(2, 4), num_buckets=4).set_index("k")
    # brute-force reference on the same undirected node-encoded graph
    edges = {(min(2 * c, 2 * s + 1), max(2 * c, 2 * s + 1)) for c, s in pairs}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for k in (2, 4):
        n_k = sum(1 for v in deg.values() if v > k)
        e_k = sum(1 for a, b in edges if deg[a] > k and deg[b] > k)
        if n_k == 0:
            assert k not in got.index
            continue
        row = got.loc[k]
        assert row["n_k"] == n_k and row["e_k"] == e_k
        assert row["phi"] == pytest.approx(2.0 * e_k / (n_k * (n_k - 1.0)))


def test_source_ks_matrix_identical_and_disjoint(tmp_path, ray_session):
    """Identical distributions → ks 0; fully separated supports → ks 1;
    half-shifted → the exact hand value (cdfs [1, 2]/2 vs [0, 1, 2]/2:
    max |cum_a·n_b − cum_b·n_a| at v=1 gives 2/4 = 0.5)."""
    rows = (
        [{"source": "a", "n_tok": 1, "tokens": []}, {"source": "a", "n_tok": 2, "tokens": []}]
        + [{"source": "b", "n_tok": 1, "tokens": []}, {"source": "b", "n_tok": 2, "tokens": []}]
        + [{"source": "c", "n_tok": 10, "tokens": []}, {"source": "c", "n_tok": 11, "tokens": []}]
        + [{"source": "d", "n_tok": 2, "tokens": []}, {"source": "d", "n_tok": 3, "tokens": []}]
    )
    from hepdata_validator_ray.pipelines.validation import source_ks_matrix

    got = source_ks_matrix(_write_seq_rows(tmp_path, rows)).set_index(["source_a", "source_b"])
    assert got.loc[("a", "b"), "ks"] == 0.0
    assert got.loc[("a", "c"), "ks"] == 1.0
    assert got.loc[("a", "d"), "ks"] == pytest.approx(0.5)
    assert got.loc[("a", "d"), "ks_num"] == 2


def test_events_drawdown_peak_to_trough(tmp_path, ray_session):
    """Series 5,3,0(gap),4: running peaks 5,5,5,5 → worst drawdown 5 at
    the GAP day (zero from gap-fill counts); monotone-rising series → 0
    with trough at the first day (earliest-tie rule)."""
    rows = []
    rows += [(0, "crash")] * 5 + [(1, "crash")] * 3 + [(3, "crash")] * 4
    rows += [(d, "up") for d in range(3) for _ in range(d + 1)]
    sf = _write_events(tmp_path, rows)
    from hepdata_validator_ray.pipelines.relational import events_drawdown

    got = events_drawdown(sf).set_index("event_type")
    assert got.loc["crash", "max_drawdown"] == 5 and got.loc["crash", "trough_day"] == 2
    assert got.loc["crash", "peak"] == 5 and got.loc["crash", "n_days"] == 4
    assert got.loc["up", "max_drawdown"] == 0 and got.loc["up", "trough_day"] == 0


def test_source_concentration_even_vs_single(tmp_path, ray_session):
    """Even 4-way mix → hhi 0.25, cr4 1.0; one dominant source of 9/12
    with three singletons → hhi (81+3)/144, cr4 1.0; NULL source is a
    real '<NULL>' stratum."""
    from hepdata_validator_ray.pipelines.profile import source_concentration

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(12, dtype=np.int64),
            "text": ["x"] * 12,
            "source": ["a"] * 9 + ["b", "c", None],
        }
    )
    p = str(tmp_path / "documents.parquet")
    docs.to_parquet(p, index=False)
    got = source_concentration(p).iloc[0]
    assert got["n_sources"] == 4 and got["n_docs"] == 12
    assert got["hhi"] == pytest.approx((81 + 1 + 1 + 1) / 144)
    assert got["cr4"] == 1.0


def test_peak_hour_cron_signature(tmp_path, ray_session):
    """A cron type firing 10× at hour 7 (+1 stray at hour 9) reports
    peak_hour 7 with share 10/11; an even two-hour type takes the
    EARLIER hour on the tie."""
    rows = [(7 * 3600, "cron")] * 10 + [(9 * 3600, "cron")]
    rows += [(4 * 3600, "even"), (16 * 3600, "even")]
    recs = [(i, ts, et) for i, (ts, et) in enumerate(rows)]
    pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in recs], dtype=np.int64),
            "ts": pd.to_datetime([r[1] for r in recs], unit="s"),
            "user_id": ["u"] * len(recs),
            "event_type": [r[2] for r in recs],
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_peak_hour

    got = events_peak_hour(str(tmp_path)).set_index("event_type")
    assert got.loc["cron", "peak_hour"] == 7 and got.loc["cron", "peak_share"] == pytest.approx(10 / 11)
    assert got.loc["even", "peak_hour"] == 4 and got.loc["even", "peak_share"] == 0.5


def test_doc_max_run_invalid_breaks(tmp_path, ray_session):
    """[5,5,99,5,5,5] (99 OOV at V=10): the OOV BREAKS the run → max 3,
    n_tok counts all 6 positions; [1,2,3] → 1; all-OOV row emits
    nothing; a pad-leak [7]*8 reports 8."""
    from hepdata_validator_ray.pipelines.validation import doc_max_token_run

    p = _write_seq(
        tmp_path,
        ["A", "B", "C", "D"],
        [[5, 5, 99, 5, 5, 5], [1, 2, 3], [99, 99], [7] * 8],
    )
    got = doc_max_token_run(p, vocab_size=10).to_pandas().set_index("doc_id")
    assert got.loc["A", "max_run"] == 3 and got.loc["A", "n_tok"] == 6
    assert got.loc["B", "max_run"] == 1
    assert "C" not in got.index
    assert got.loc["D", "max_run"] == 8


def test_mix_drift_rotation(tmp_path, ray_session):
    """Days 0..3 (median = day 1 under the ceil rank rule on 8 events):
    type A dominates early (3 of 4), B late (3 of 4) → A's share_delta
    = 0.25 − 0.75 = −0.5, B's +0.5; shares sum to 1 in each half."""
    rows = [(0, "A"), (0, "A"), (1, "A"), (1, "B"), (2, "B"), (2, "B"), (3, "B"), (3, "A")]
    sf = _write_events(tmp_path, rows)
    from hepdata_validator_ray.pipelines.relational import events_mix_drift

    got = events_mix_drift(sf).set_index("event_type")
    assert got.loc["A", "n_early"] == 3 and got.loc["A", "n_late"] == 1
    assert got.loc["A", "share_delta"] == pytest.approx(-0.5)
    assert got.loc["B", "share_delta"] == pytest.approx(0.5)
    assert got["share_early"].sum() == pytest.approx(1.0)
    assert got["share_late"].sum() == pytest.approx(1.0)


def test_weekend_profile_known_epoch_days(tmp_path, ray_session):
    """Epoch day 0 = Thursday (weekday), day 2 = Saturday, day 3 = Sunday
    — the (d+4)%7 arithmetic, never locale day names."""
    rows = [(0, "t")] * 2 + [(2, "t")] + [(3, "t")] + [(4, "t")]  # Thu×2, Sat, Sun, Mon
    sf = _write_events(tmp_path, rows)
    from hepdata_validator_ray.pipelines.relational import events_weekend_profile

    got = events_weekend_profile(sf).set_index("event_type")
    assert got.loc["t", "n_weekday"] == 3 and got.loc["t", "n_weekend"] == 2
    assert got.loc["t", "weekend_share"] == pytest.approx(0.4)


def test_vocab_utilization_template_vs_rich(tmp_path, ray_session):
    """A template source looping one token uses 1/V; a rich source using
    5 of 10 ids reports 0.5; OOV ids don't count toward either number."""
    from hepdata_validator_ray.pipelines.validation import vocab_utilization_by_source

    t = pa.table(
        {
            "doc_id": pa.array(["A", "B", "C"], pa.string()),
            "tokens": pa.array([[3, 3, 3, 3], [0, 1, 2, 3, 4], [0, 99]], pa.list_(pa.int64())),
            "n_tok": pa.array([4, 5, 2], pa.int64()),
            "source": pa.array(["tmpl", "rich", "oov"], pa.string()),
        }
    )
    p = str(tmp_path / "seq2.parquet")
    pq.write_table(t, p)
    got = vocab_utilization_by_source(p, vocab_size=10).set_index("source")
    assert got.loc["tmpl", "n_distinct"] == 1 and got.loc["tmpl", "utilization"] == 0.1
    assert got.loc["rich", "n_distinct"] == 5 and got.loc["rich", "utilization"] == 0.5
    assert got.loc["oov", "n_distinct"] == 1 and got.loc["oov", "n_tokens"] == 1


def test_source_quantiles_ceil_rank_rule(tmp_path, ray_session):
    """10 docs of lengths 1..10: ceil-rank gives p50 = 5th smallest = 5,
    p90 = 9, p99 = ceil(9.9) = 10th = 10."""
    rows = [{"source": "s", "n_tok": v, "tokens": []} for v in range(1, 11)]
    from hepdata_validator_ray.pipelines.validation import source_ntok_quantiles

    got = source_ntok_quantiles(_write_seq_rows(tmp_path, rows)).set_index("source")
    assert got.loc["s", "p50"] == 5 and got.loc["s", "p90"] == 9 and got.loc["s", "p99"] == 10


def test_length_bias_waiting_time_paradox(tmp_path, ray_session):
    """Lengths [1×9, 91]: mean 10, token-weighted (9+8281)/100 = 82.9
    → bias 8.29 (a random TOKEN almost surely sits in the long doc);
    uniform lengths give bias exactly 1."""
    rows = [{"source": "skew", "n_tok": 1, "tokens": []}] * 9
    rows += [{"source": "skew", "n_tok": 91, "tokens": []}]
    rows += [{"source": "uni", "n_tok": 7, "tokens": []}] * 3
    from hepdata_validator_ray.pipelines.validation import length_bias_by_source

    got = length_bias_by_source(_write_seq_rows(tmp_path, rows)).set_index("source")
    assert got.loc["skew", "mean_len"] == pytest.approx(10.0)
    assert got.loc["skew", "token_weighted_len"] == pytest.approx(82.9)
    assert got.loc["skew", "bias"] == pytest.approx(8.29)
    assert got.loc["uni", "bias"] == 1.0


def test_ntok_mode_spike_and_tie(tmp_path, ray_session):
    """A template source spiking at length 512 reports mode 512 with its
    exact share; on a count tie the SMALLER length wins."""
    rows = [{"source": "tmpl", "n_tok": 512, "tokens": []}] * 5
    rows += [{"source": "tmpl", "n_tok": v, "tokens": []} for v in (3, 9)]
    rows += [{"source": "tie", "n_tok": 8, "tokens": []}] * 2
    rows += [{"source": "tie", "n_tok": 2, "tokens": []}] * 2
    from hepdata_validator_ray.pipelines.validation import ntok_mode_by_source

    got = ntok_mode_by_source(_write_seq_rows(tmp_path, rows)).set_index("source")
    assert got.loc["tmpl", "mode_len"] == 512 and got.loc["tmpl", "mode_count"] == 5
    assert got.loc["tmpl", "mode_share"] == pytest.approx(5 / 7)
    assert got.loc["tie", "mode_len"] == 2  # smaller length wins the tie


def test_iqr_outliers_fence(tmp_path, ray_session):
    """Values 1..8 (cents 100..800) + a 100.0 monster: Q1 = ceil-rank
    3rd = 300¢? — compute from the rule: n=9, Q1 at rank ceil(2.25)=3 →
    300, Q3 at rank ceil(6.75)=7 → 700, IQR 400, hi fence 700+1200=1900
    → only the 10000¢ monster is outside."""
    vals = [float(v) for v in range(1, 9)] + [100.0]
    pd.DataFrame(
        {
            "event_id": np.arange(len(vals), dtype=np.int64),
            "ts": pd.to_datetime([0] * len(vals), unit="s"),
            "user_id": ["u"] * len(vals),
            "event_type": ["t"] * len(vals),
            "value": np.array(vals),
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_iqr_outliers

    got = events_iqr_outliers(str(tmp_path)).iloc[0]
    assert got["q1"] == 300 and got["q3"] == 700
    assert got["n_outliers"] == 1


def test_token_gini_uniform_vs_spike(tmp_path, ray_session):
    """Four ids at equal counts → 0; counts [1,1,1,7] replicate the
    pinned 0.45 grouped-data value (the user-Gini fixture's twin)."""
    from hepdata_validator_ray.pipelines.validation import token_gini

    p = _write_seq(tmp_path, ["A"], [[0, 1, 2, 3] * 5])
    assert token_gini(p, vocab_size=8).iloc[0]["gini"] == 0.0

    d2 = tmp_path / "g2"
    d2.mkdir()
    p2 = _write_seq(d2, ["A"], [[0, 1, 2] + [3] * 7])
    got = token_gini(p2, vocab_size=8).iloc[0]
    assert got["n_types"] == 4 and got["n_tokens"] == 10
    assert got["gini"] == pytest.approx(0.45)


def test_repeat_rate_refresh_loop(tmp_path, ray_session):
    """User u1 fires 'view' 3× on one day (repeat pair) and once the next
    (clean pair); u2 once → rate 1/3; a crossing-midnight pair is NOT a
    repeat."""
    rows = [(0, "u1", "view"), (1, "u1", "view"), (2, "u1", "view")]  # same day 0 (hours)
    recs = [(i, 3600 * h, u, t) for i, (h, u, t) in enumerate(rows)]
    recs.append((3, 86400 + 10, "u1", "view"))  # day 1
    recs.append((4, 20, "u2", "view"))
    pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in recs], dtype=np.int64),
            "ts": pd.to_datetime([r[1] for r in recs], unit="s"),
            "user_id": [r[2] for r in recs],
            "event_type": [r[3] for r in recs],
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_repeat_rate

    got = events_repeat_rate(str(tmp_path)).set_index("event_type")
    assert got.loc["view", "n_pairs"] == 3 and got.loc["view", "n_repeat"] == 1
    assert got.loc["view", "repeat_rate"] == pytest.approx(1 / 3)


def test_hour_entropy_cron_vs_even(tmp_path, ray_session):
    """A one-hour cron type has entropy 0 via the degenerate CASE (and
    +0.0, not −0.0); an even two-hour type reports ln2 with norm 1."""
    rows = [(7 * 3600, "cron")] * 5 + [(4 * 3600, "even"), (16 * 3600, "even")]
    recs = [(i, ts, et) for i, (ts, et) in enumerate(rows)]
    pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in recs], dtype=np.int64),
            "ts": pd.to_datetime([r[1] for r in recs], unit="s"),
            "user_id": ["u"] * len(recs),
            "event_type": [r[2] for r in recs],
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_hour_entropy

    got = events_hour_entropy(str(tmp_path)).set_index("event_type")
    assert got.loc["cron", "entropy"] == 0.0
    assert math.copysign(1, got.loc["cron", "entropy"]) == 1.0
    assert got.loc["cron", "norm_entropy"] == 0.0
    assert got.loc["even", "entropy"] == pytest.approx(math.log(2), rel=1e-12)
    assert got.loc["even", "norm_entropy"] == pytest.approx(1.0, rel=1e-12)
