"""Round-4 session-7 operators: BFS hop distance, grouped-data Gini,
rank-sum AUC, token↔source mutual information — crafted-fixture pins for
the conventions the sf gate can't isolate (seed rule, max-hops cutoff,
tie half-credit, degenerate strata, out-of-vocab exclusion)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hepdata_validator_ray.pipelines.graph import bfs_hops
from hepdata_validator_ray.pipelines.profile import score_auc_by_source
from hepdata_validator_ray.pipelines.validation import (
    gini_ntok_by_source,
    token_source_mi_top,
)


def _write_chain_graph(tmp_path):
    """Path graph c0–s1–c1–s2–c2–s4–c3–s5–c4–s8–c5 via one order+lineitem
    per trade pair.  Node ids: c→2c, s→2s+1; keys chosen so the ONLY
    node ≡ 0 (mod 7) is c0 (node 0) — a single BFS seed."""
    pairs = [(0, 1), (1, 1), (1, 2), (2, 2), (2, 4), (3, 4), (3, 5), (4, 5), (4, 8), (5, 8)]
    for c, s in pairs:
        assert (2 * c) % 7 != 0 or c == 0
        assert (2 * s + 1) % 7 != 0
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
    return str(tmp_path)


def test_bfs_hops_chain_cutoff_and_unreached(tmp_path, ray_session):
    """Hop distances along the chain are exact; nodes beyond max_hops are
    ABSENT (not clamped); the seed itself reports 0."""
    sf = _write_chain_graph(tmp_path)
    got = bfs_hops(sf, max_hops=4).to_pandas()
    dist = {(r.ntype, r.key): r.hops for r in got.itertuples()}
    assert dist == {("c", 0): 0, ("s", 1): 1, ("c", 1): 2, ("s", 2): 3, ("c", 2): 4}


def test_bfs_hops_full_depth_settles_chain(tmp_path, ray_session):
    sf = _write_chain_graph(tmp_path)
    got = bfs_hops(sf, max_hops=10).to_pandas()
    dist = {(r.ntype, r.key): r.hops for r in got.itertuples()}
    # the full chain: alternating c/s, 11 nodes, distances 0..10
    assert len(dist) == 11
    assert dist[("c", 5)] == 10 and dist[("s", 8)] == 9


def test_bfs_hops_min_over_multiple_seeds(tmp_path, ray_session):
    """With seed_mod=1 every node is a seed: all hops are 0 (the min-
    combine never lets a later level overwrite an earlier settlement)."""
    sf = _write_chain_graph(tmp_path)
    got = bfs_hops(sf, max_hops=3, seed_mod=1).to_pandas()
    assert len(got) == 11 and set(got["hops"]) == {0}


def _write_seq(tmp_path, rows):
    t = pa.table(
        {
            "doc_id": pa.array([str(i) for i in range(len(rows))], pa.string()),
            "tokens": pa.array([r.get("tokens") for r in rows], pa.list_(pa.int64())),
            "n_tok": pa.array([r.get("n_tok") for r in rows], pa.int64()),
            "source": pa.array([r.get("source") for r in rows], pa.string()),
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    return p


def test_gini_conventions(tmp_path, ray_session):
    """All-equal → 0; one-doc-dominates [0,0,0,10] → 0.75 exactly; an
    all-zero stratum hits the degenerate CASE (0.0, not NaN); NULL n_tok
    rows drop; NULL source lands in the '<NULL>' stratum."""
    rows = (
        [{"source": "eq", "n_tok": 5, "tokens": []}] * 4
        + [{"source": "skew", "n_tok": v, "tokens": []} for v in (0, 0, 0, 10)]
        + [{"source": "zero", "n_tok": 0, "tokens": []}] * 3
        + [{"source": "eq", "n_tok": None, "tokens": []}]
        + [{"source": None, "n_tok": 7, "tokens": []}]
    )
    got = gini_ntok_by_source(_write_seq(tmp_path, rows)).set_index("source")
    assert got.loc["eq", "n"] == 4 and got.loc["eq", "gini"] == pytest.approx(0.0)
    assert got.loc["skew", "gini"] == pytest.approx(0.75)
    assert got.loc["zero", "gini"] == 0.0 and got.loc["zero", "sum_tok"] == 0
    assert got.loc["<NULL>", "n"] == 1 and got.loc["<NULL>", "gini"] == pytest.approx(0.0)


def _write_docs(tmp_path, rows):
    pd.DataFrame(
        {
            "doc_id": np.arange(len(rows), dtype=np.int64),
            "source": [r[0] for r in rows],
            "lang": [r[1] for r in rows],
            "n_chars": pd.array([r[2] for r in rows], dtype="Int64"),
        }
    ).to_parquet(str(tmp_path / "docs.parquet"), index=False)
    return str(tmp_path / "docs.parquet")


def test_auc_conventions(tmp_path, ray_session):
    """Perfect separation → 1; inverted → 0; pure ties → 0.5; the mixed
    tie case earns exactly half credit (0.625 by hand); single-class
    strata report 0 via the degenerate CASE; NULL lang counts negative;
    NULL n_chars rows drop."""
    rows = (
        [("perfect", "en", 10), ("perfect", "en", 20), ("perfect", "de", 1), ("perfect", "de", 2)]
        + [("inv", "en", 1), ("inv", "en", 2), ("inv", "de", 10), ("inv", "de", 20)]
        + [("tie", "en", 5), ("tie", "de", 5)]
        + [("mix", "en", 1), ("mix", "en", 3), ("mix", "de", 1), ("mix", "de", 2)]
        + [("onlypos", "en", 4), ("onlypos", "en", 9)]
        + [("nulls", "en", 8), ("nulls", None, 3), ("nulls", "en", None)]
    )
    got = score_auc_by_source(_write_docs(tmp_path, rows)).set_index("source")
    assert got.loc["perfect", "auc"] == 1.0
    assert got.loc["inv", "auc"] == 0.0
    assert got.loc["tie", "auc"] == 0.5
    assert got.loc["mix", "auc"] == pytest.approx(0.625)
    assert got.loc["onlypos", "auc"] == 0.0 and got.loc["onlypos", "n_neg"] == 0
    assert got.loc["nulls", "n_pos"] == 1 and got.loc["nulls", "n_neg"] == 1
    assert got.loc["nulls", "auc"] == 1.0  # en@8 beats NULL-lang@3


def test_token_source_mi_hand_computed(tmp_path, ray_session):
    """A: [0,0,1], B: [1,2] — mi(0)=.4·ln(10/6), mi(2)=.2·ln(2.5),
    mi(1)=.2·ln(5/6)+.2·ln(5/4); ranking 0 > 2 > 1; out-of-vocab tokens
    (negative or ≥V) never count."""
    rows = [
        {"source": "A", "tokens": [0, 0, 1], "n_tok": 3},
        {"source": "B", "tokens": [1, 2, -1, 10], "n_tok": 4},
    ]
    got = token_source_mi_top(_write_seq(tmp_path, rows), k=3, vocab_size=10)
    assert list(got["tok"]) == [0, 2, 1]
    assert got["mi"].iloc[0] == pytest.approx(0.4 * math.log(10 / 6))
    assert got["mi"].iloc[1] == pytest.approx(0.2 * math.log(2.5))
    assert got["mi"].iloc[2] == pytest.approx(0.2 * math.log(5 / 6) + 0.2 * math.log(5 / 4))
    assert list(got["n_occ"]) == [2, 1, 2]
    # per-token contribution is p(t)·KL(p(s|t)‖p(s)) — never negative
    assert (got["mi"] >= -1e-15).all()


def test_token_source_mi_uniform_spread_scores_zero(tmp_path, ray_session):
    """A token distributed exactly proportionally to the source marginals
    carries no information: mi == 0 (and never outranks a real signal)."""
    rows = [
        {"source": "A", "tokens": [3, 5], "n_tok": 2},
        {"source": "B", "tokens": [3, 7], "n_tok": 2},
    ]
    got = token_source_mi_top(_write_seq(tmp_path, rows), k=3, vocab_size=10)
    by_tok = got.set_index("tok")["mi"]
    assert by_tok.loc[3] == pytest.approx(0.0)
    assert by_tok.loc[5] > 0 and by_tok.loc[7] > 0
    assert list(got["tok"])[:2] == [5, 7]


def test_events_ohlc_tie_and_null_conventions(tmp_path, ray_session):
    """Equal timestamps break by event_id (lowest opens, highest closes);
    NULL values are invisible to ALL of open/high/low/close/n; a
    single-event day has open=close=high=low."""
    ts = pd.Timestamp("2026-01-05 10:00:00")
    df = pd.DataFrame(
        {
            "event_id": np.array([3, 1, 2, 9, 4], dtype=np.int64),
            "ts": [ts, ts, ts, ts, pd.Timestamp("2026-01-06 00:00:00")],
            "event_type": ["a", "a", "a", "a", "a"],
            "value": [5.0, 7.0, None, 2.0, 42.0],
            "user_id": np.zeros(5, dtype=np.int64),
        }
    )
    df.to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_ohlc

    got = events_ohlc(str(tmp_path)).set_index("day")
    d1 = got.loc["2026-01-05"]
    # same ts: event_id 1 opens (7.0), event_id 9 closes (2.0); the NULL
    # (event_id 2) never counts
    assert (d1["open"], d1["close"], d1["high"], d1["low"], d1["n_events"]) == (
        7.0, 2.0, 7.0, 2.0, 3,
    )
    d2 = got.loc["2026-01-06"]
    assert d2["open"] == d2["close"] == d2["high"] == d2["low"] == 42.0


def test_ntok_percentile_midrank(tmp_path, ray_session):
    """[10,10,20,30]: tie block of two 10s averages ranks 1-2 → 0.375;
    20 → 0.75; 30 → 1.0; NULL n_tok rows are absent from the output."""
    rows = [
        {"source": "s", "n_tok": 10, "tokens": []},
        {"source": "s", "n_tok": 10, "tokens": []},
        {"source": "s", "n_tok": 20, "tokens": []},
        {"source": "s", "n_tok": 30, "tokens": []},
        {"source": "s", "n_tok": None, "tokens": []},
    ]
    from hepdata_validator_ray.pipelines.validation import ntok_percentile

    got = ntok_percentile(_write_seq(tmp_path, rows)).to_pandas()
    assert len(got) == 4
    by_v = got.groupby("n_tok")["pct"].first()
    assert by_v.loc[10] == pytest.approx(0.375)
    assert by_v.loc[20] == pytest.approx(0.75)
    assert by_v.loc[30] == pytest.approx(1.0)


def test_source_js_divergence_extremes(tmp_path, ray_session):
    """Identical unigram mixes → 0; disjoint vocabularies → ln 2; the
    half-overlap case matches the hand-computed decomposition."""
    rows = [
        {"source": "A", "tokens": [1, 2], "n_tok": 2},
        {"source": "B", "tokens": [1, 2], "n_tok": 2},  # identical to A
        {"source": "C", "tokens": [8, 9], "n_tok": 2},  # disjoint from A/B
        {"source": "D", "tokens": [1, 8], "n_tok": 2},  # half-overlaps both
    ]
    from hepdata_validator_ray.pipelines.validation import source_js_divergence

    got = source_js_divergence(_write_seq(tmp_path, rows), vocab_size=16)
    j = {(r.src_a, r.src_b): (r.n_joint, r.js) for r in got.itertuples()}
    assert len(j) == 6
    assert j[("A", "B")][1] == pytest.approx(0.0) and j[("A", "B")][0] == 2
    assert j[("A", "C")][1] == pytest.approx(math.log(2)) and j[("A", "C")][0] == 0
    # A={1:.5,2:.5}, D={1:.5,8:.5}: joint tok 1 contributes 0 (equal p),
    # exclusive mass .5 on each side → js = 0.5·ln2
    assert j[("A", "D")][1] == pytest.approx(0.5 * math.log(2))


def test_spearman_repetition_extremes(tmp_path, ray_session):
    """Monotone (length, distinct) → ρ=1; anti-monotone → ρ=−1; a
    constant-length source hits the degenerate CASE (ρ=0, not NaN)."""
    rows = (
        [{"source": "mono", "tokens": list(range(k)), "n_tok": k} for k in (1, 2, 3)]
        + [
            {"source": "anti", "tokens": [1, 2, 3], "n_tok": 3},
            {"source": "anti", "tokens": [4, 4, 5, 5], "n_tok": 4},
            {"source": "anti", "tokens": [6, 6, 6, 6, 6], "n_tok": 5},
        ]
        + [
            {"source": "const", "tokens": [1, 2], "n_tok": 2},
            {"source": "const", "tokens": [3, 3], "n_tok": 2},
        ]
    )
    from hepdata_validator_ray.pipelines.validation import spearman_len_distinct_by_source

    got = spearman_len_distinct_by_source(_write_seq(tmp_path, rows)).set_index("source")
    assert got.loc["mono", "rho"] == pytest.approx(1.0)
    assert got.loc["anti", "rho"] == pytest.approx(-1.0)
    assert got.loc["const", "rho"] == 0.0


def test_quantile_normalize_rank_matching(tmp_path, ray_session):
    """Two sources on disjoint scales (1-4 vs 101-104) land on the SAME
    normalized values at equal within-source ranks — the rank-matching
    property that defines quantile normalization; integer ceil-rank rule
    hand-checked ([2, 4, 102, 104] for both)."""
    rows = [{"source": "lo", "n_tok": v, "tokens": []} for v in (1, 2, 3, 4)] + [
        {"source": "hi", "n_tok": v, "tokens": []} for v in (101, 102, 103, 104)
    ]
    from hepdata_validator_ray.pipelines.validation import quantile_normalize_ntok

    got = quantile_normalize_ntok(_write_seq(tmp_path, rows)).to_pandas()
    lo = got[got["source"] == "lo"].sort_values("n_tok")["norm"].tolist()
    hi = got[got["source"] == "hi"].sort_values("n_tok")["norm"].tolist()
    assert lo == hi == [2, 4, 102, 104]


def test_events_ewma_truncation_and_tie_order(tmp_path, ray_session):
    """The α=1/2 recurrence follows DuckDB's TRUNCATING // (toward zero):
    s=-1 halves to 0, not −1 (floor would differ); equal timestamps order
    by event_id; the three-step trajectory is hand-walked."""
    ts0 = pd.Timestamp("2026-03-01 00:00:00")
    df = pd.DataFrame(
        {
            "event_id": np.array([1, 2, 3, 10, 11], dtype=np.int64),
            "ts": [ts0, ts0 + pd.Timedelta("1s"), ts0 + pd.Timedelta("2s"), ts0, ts0],
            "user_id": np.array([1, 1, 1, 2, 2], dtype=np.int64),
            "event_type": ["t"] * 5,
            "value": [-0.0001, 0.0, 3.0, 100.0, 0.0],
        }
    )
    df.to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_ewma

    got = events_ewma(str(tmp_path)).set_index("user_id")
    # user 1: s=-1 → trunc(-1/2)=0 → +0 = 0 → trunc(0/2)+30000 = 30000
    assert got.loc[1, "ewma_fp4"] == 30000 and got.loc[1, "n_events"] == 3
    # user 2 (same ts): eid 10 seeds (1000000), eid 11 halves it
    assert got.loc[2, "ewma_fp4"] == 500000


def test_lang_source_residuals_hand_computed(tmp_path, ray_session):
    """2×2 contingency: E(a,x) = 40·40/100 = 16 → residual 14/4 = 3.5."""
    rows = [("a", "x")] * 30 + [("a", "y")] * 10 + [("b", "x")] * 10 + [("b", "y")] * 50
    pd.DataFrame(
        {
            "doc_id": np.arange(100, dtype=np.int64),
            "lang": [r[0] for r in rows],
            "source": [r[1] for r in rows],
        }
    ).to_parquet(str(tmp_path / "docs.parquet"), index=False)
    from hepdata_validator_ray.pipelines.profile import lang_source_residuals

    got = lang_source_residuals(str(tmp_path / "docs.parquet")).set_index(["lang", "source"])
    assert got.loc[("a", "x"), "expected"] == pytest.approx(16.0)
    assert got.loc[("a", "x"), "residual"] == pytest.approx(3.5)
    assert got.loc[("b", "y"), "n"] == 50
    # residuals of a 2×2 table are equal in magnitude, alternating sign
    assert got.loc[("a", "y"), "residual"] < 0 and got.loc[("b", "x"), "residual"] < 0


def test_bigram_count_of_counts_spectrum(tmp_path, ray_session):
    """[1,2,1,2,1] yields (1,2)×2 and (2,1)×2; [3,4] yields one singleton
    → spectrum {1: 1, 2: 2}; frac_mass = c·n_c / 5; row boundaries never
    form a bigram."""
    rows = [
        {"source": "s", "tokens": [1, 2, 1, 2, 1], "n_tok": 5},
        {"source": "s", "tokens": [3, 4], "n_tok": 2},
    ]
    from hepdata_validator_ray.pipelines.validation import bigram_count_of_counts

    got = bigram_count_of_counts(_write_seq(tmp_path, rows), vocab_size=10).set_index("c")
    assert got.loc[1, "n_c"] == 1 and got.loc[2, "n_c"] == 2
    assert got.loc[1, "frac_mass"] == pytest.approx(0.2)
    assert got.loc[2, "frac_mass"] == pytest.approx(0.8)


def test_balanced_downsample_min_class(tmp_path, ray_session):
    """Strata of sizes 5/3/2 all downsample to the min (2), ranks 1..2."""
    rows = [("a", None, 1)] * 5 + [("b", None, 1)] * 3 + [("c", None, 1)] * 2
    p = _write_docs(tmp_path, rows)
    from hepdata_validator_ray.pipelines.sampling import balanced_downsample

    got = balanced_downsample(p).to_pandas()
    sizes = got.groupby("source")["doc_id"].count()
    assert sizes.to_dict() == {"a": 2, "b": 2, "c": 2}
    assert set(got["rank"]) == {1, 2}


def test_bigram_novelty_crafted(tmp_path, ray_session):
    """Ref has bigrams {(1,2),(2,3)}; new has (1,2)×2 (seen) and (7,8),
    (8,9) (unseen) → 3 distinct, 2 unseen, mass 4, unseen mass 2."""
    import pyarrow.parquet as _pq

    old = tmp_path / "old"
    new = tmp_path / "new"
    old.mkdir()
    new.mkdir()
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(["a"], pa.string()),
                "tokens": pa.array([[1, 2, 3]], pa.list_(pa.int64())),
                "n_tok": pa.array([3], pa.int64()),
                "source": pa.array(["s"], pa.string()),
            }
        ),
        str(old / "part.parquet"),
    )
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(["b", "c"], pa.string()),
                "tokens": pa.array([[1, 2, 1, 2], [7, 8, 9]], pa.list_(pa.int64())),
                "n_tok": pa.array([4, 3], pa.int64()),
                "source": pa.array(["s", "s"], pa.string()),
            }
        ),
        str(new / "part.parquet"),
    )
    from hepdata_validator_ray.pipelines.validation import bigram_novelty

    got = bigram_novelty(str(old), str(new), vocab_size=16).iloc[0]
    # new bigrams: (1,2)x2, (2,1)x1, (7,8)x1, (8,9)x1 -> 4 distinct; seen: (1,2)
    assert got["n_bigrams_new"] == 4 and got["n_unseen"] == 3
    assert got["mass_new"] == 5 and got["mass_unseen"] == 3
    assert got["frac_types_unseen"] == pytest.approx(0.75)
    assert got["frac_mass_unseen"] == pytest.approx(0.6)


def test_source_cross_entropy_hand_computed(tmp_path, ray_session):
    """A=[0,0,1], B=[1], V=4: H(A;B) = ln5 − (1/3)ln2; the matrix is
    directional (H(A;B) ≠ H(B;A)) and includes the diagonal baseline."""
    rows = [
        {"source": "A", "tokens": [0, 0, 1], "n_tok": 3},
        {"source": "B", "tokens": [1], "n_tok": 1},
    ]
    from hepdata_validator_ray.pipelines.validation import source_cross_entropy

    got = source_cross_entropy(_write_seq(tmp_path, rows), vocab_size=4).set_index(
        ["src_a", "src_b"]
    )["xent"]
    assert got.loc[("A", "B")] == pytest.approx(math.log(5) - math.log(2) / 3)
    assert got.loc[("A", "A")] == pytest.approx(
        math.log(7) - (2 / 3) * math.log(3) - (1 / 3) * math.log(2)
    )
    assert got.loc[("B", "A")] == pytest.approx(math.log(7) - math.log(2))
    assert len(got) == 4 and got.loc[("A", "B")] != got.loc[("B", "A")]


def test_temperature_weights_upsamples_small_sources(tmp_path, ray_session):
    """α=0.7 gives the small source MORE than its proportional share;
    weights sum to 1; expected_k scales by the budget."""
    rows = [("big", None, 1)] * 100 + [("small", None, 1)] * 1
    p = _write_docs(tmp_path, rows)
    from hepdata_validator_ray.pipelines.sampling import temperature_weights

    got = temperature_weights(p, alpha=0.7, k_total=1000).set_index("source")
    assert got["weight"].sum() == pytest.approx(1.0)
    assert got.loc["small", "weight"] > 1 / 101  # upsampled vs proportional
    assert got.loc["big", "weight"] < 100 / 101
    assert got.loc["small", "expected_k"] == pytest.approx(
        1000 * 1 / (1 + 100**0.7)
    )


def test_degree_assortativity_path_graph(tmp_path, ray_session):
    """The 11-node chain: endpoint degrees replicate np.corrcoef over the
    20 directed edges (independent replication of the five-sum formula);
    n_edges counts BOTH orientations."""
    sf = _write_chain_graph(tmp_path)
    from hepdata_validator_ray.pipelines.graph import degree_assortativity

    got = degree_assortativity(sf).iloc[0]
    assert got["n_edges"] == 20
    # replicate: chain nodes have degree 1 (ends) / 2 (middle)
    chain = [0, 3, 2, 5, 4, 9, 6, 11, 8, 17, 10]  # node ids along the chain
    deg = {n: (1 if i in (0, len(chain) - 1) else 2) for i, n in enumerate(chain)}
    dx, dy = [], []
    for a, b in zip(chain[:-1], chain[1:]):
        dx += [deg[a], deg[b]]
        dy += [deg[b], deg[a]]
    assert got["r"] == pytest.approx(np.corrcoef(dx, dy)[0, 1])


def test_knn_label_agreement_planted_outlier(tmp_path, ray_session):
    """Two tight clusters with one mislabeled point: the outlier's
    neighbors all disagree (n_agree 0), cluster members agree fully;
    self is never its own neighbor (k_eff caps at n−1)."""
    rng = np.random.default_rng(7)
    a = rng.normal(0, 0.01, (6, 8)) + np.r_[[np.ones(8)]] * 5
    b = rng.normal(0, 0.01, (6, 8)) - np.r_[[np.ones(8)]] * 5
    vecs = np.vstack([a, b]).astype(np.float32)
    labels = np.array([0] * 6 + [1] * 5 + [0], dtype=np.int32)  # last b-point mislabeled 0
    pd.DataFrame(
        {
            "vec_id": np.arange(12, dtype=np.int64),
            "embedding": list(vecs),
            "label": labels,
        }
    ).to_parquet(str(tmp_path / "emb.parquet"), index=False)
    from hepdata_validator_ray.pipelines.similarity import knn_label_agreement

    got = knn_label_agreement(str(tmp_path / "emb.parquet"), k=5, target_mod=1).set_index("vec_id")
    assert got.loc[11, "n_agree"] == 0  # mislabeled: all 5 neighbors are label 1
    assert got.loc[0, "n_agree"] == 5  # tight a-cluster: all neighbors label 0
    assert (got["k_eff"] == 5).all()


def test_events_hour_profile_burst(tmp_path, ray_session):
    """A type firing only at hour 3 yields E = 10·11/20 = 5.5 and
    residual (10−5.5)/√5.5; the uniform type's hour-3 cell is depressed."""
    ts_a = [pd.Timestamp(f"2026-04-01 03:{m:02d}:00") for m in range(10)]
    ts_b = [pd.Timestamp(f"2026-04-01 {h:02d}:00:00") for h in range(10)]
    pd.DataFrame(
        {
            "event_id": np.arange(20, dtype=np.int64),
            "ts": ts_a + ts_b,
            "user_id": np.zeros(20, dtype=np.int64),
            "event_type": ["burst"] * 10 + ["flat"] * 10,
            "value": np.ones(20),
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_hour_profile

    got = events_hour_profile(str(tmp_path)).set_index(["event_type", "hour"])
    assert got.loc[("burst", 3), "expected"] == pytest.approx(5.5)
    assert got.loc[("burst", 3), "residual"] == pytest.approx((10 - 5.5) / math.sqrt(5.5))
    assert got.loc[("flat", 3), "residual"] < 0


def test_cluster_top_terms_exclusive_vocab(tmp_path, ray_session):
    """Two well-separated clusters with disjoint-ish vocab: each cluster's
    top term is its exclusive word (shared filler scores ln(1+K/K) low),
    and df counts CLUSTERS, not documents."""
    vecs = np.vstack(
        [np.tile([1.0, 0.0], (3, 1)) + np.random.default_rng(1).normal(0, 0.001, (3, 2)),
         np.tile([0.0, 1.0], (3, 1)) + np.random.default_rng(2).normal(0, 0.001, (3, 2))]
    ).astype(np.float32)
    pd.DataFrame(
        {"vec_id": np.arange(6, dtype=np.int64), "embedding": list(vecs),
         "label": np.zeros(6, dtype=np.int32)}
    ).to_parquet(str(tmp_path / "embeddings.parquet"), index=False)
    texts = ["alpha filler", "alpha filler", "alpha filler",
             "beta filler", "beta filler", "beta filler"]
    pd.DataFrame(
        {"doc_id": np.arange(6, dtype=np.int64), "text": texts}
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)
    from hepdata_validator_ray.pipelines.cluster import cluster_top_terms

    got = cluster_top_terms(str(tmp_path), k_terms=1, centroid_ids=(0, 3))
    top = got.set_index("cluster")["word"]
    assert top.loc[0] == "alpha" and top.loc[3] == "beta"


def test_events_changepoint_planted_shift(tmp_path, ray_session):
    """Level 1/day for 5 days then 10/day for 5 days: the split lands on
    day 5 (last day of the left regime); a flat series has g_norm far
    smaller; single-day types emit no row."""
    rows = []
    eid = 0
    for d in range(10):
        per_day = 1 if d < 5 else 10
        for _ in range(per_day):
            rows.append(("shift", pd.Timestamp(f"2026-05-{d+1:02d} 12:00:00")))
            eid += 1
    for d in range(10):
        rows.append(("flat", pd.Timestamp(f"2026-05-{d+1:02d} 12:00:00")))
    rows.append(("oneday", pd.Timestamp("2026-05-01 12:00:00")))
    pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": [r[1] for r in rows],
            "user_id": np.zeros(len(rows), dtype=np.int64),
            "event_type": [r[0] for r in rows],
            "value": np.ones(len(rows)),
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_changepoint

    got = events_changepoint(str(tmp_path)).set_index("event_type")
    assert got.loc["shift", "split_day"] == "2026-05-05"
    # G_5 = |10·5 − 5·55| = 225; g_norm = 225/550
    assert got.loc["shift", "g_stat"] == 225
    assert got.loc["shift", "g_norm"] == pytest.approx(225 / 550)
    assert got.loc["flat", "g_norm"] == pytest.approx(0.0)
    assert "oneday" not in got.index


def test_transition_entropy_deterministic_vs_branching(tmp_path, ray_session):
    """a→b always (H=0); b→{a,c} evenly (H=ln 2); successors counted."""
    seq = ["a", "b", "a", "b", "c", "a", "b", "a", "b", "c"]  # one user's chain
    ts = [pd.Timestamp("2026-06-01") + pd.Timedelta(seconds=i) for i in range(len(seq))]
    pd.DataFrame(
        {
            "event_id": np.arange(len(seq), dtype=np.int64),
            "ts": ts,
            "user_id": np.zeros(len(seq), dtype=np.int64),
            "event_type": seq,
            "value": np.ones(len(seq)),
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_transition_entropy

    got = events_transition_entropy(str(tmp_path)).set_index("prev_type")
    assert got.loc["a", "entropy"] == pytest.approx(0.0)  # a→b always
    assert got.loc["a", "n_successors"] == 1
    assert got.loc["b", "entropy"] == pytest.approx(math.log(2))  # b→a/c 2:2


def test_bm25_rrf_fusion_crafted(tmp_path, ray_session):
    """A doc in both top-k lists gets two reciprocal terms; a doc in only
    one list gets rank 0 on the other side and a single term; short
    exact-match (TF favors) vs long high-idf (BM25 favors) diverge."""
    texts = [
        "hash hash hash hash",                     # short, TF-heavy
        "hash " + "filler " * 200 + "join stream", # long, multi-term (BM25 likes idf terms)
        "join stream",                              # short multi-term
        "nothing relevant here",
    ]
    pd.DataFrame(
        {"doc_id": np.arange(4, dtype=np.int64), "text": [t.strip() for t in texts]}
    ).to_parquet(str(tmp_path / "docs.parquet"), index=False)
    from hepdata_validator_ray.pipelines.retrieval import bm25_rrf_fusion

    got = bm25_rrf_fusion(
        str(tmp_path / "docs.parquet"), ["hash", "join", "stream"], k=2
    ).set_index("doc_id")
    # doc 3 matches nothing: never in either top-2
    assert 3 not in got.index
    # every present doc's rrf equals the sum of its two reciprocal terms
    for d, row in got.iterrows():
        want = (1 / (60 + row["r_bm25"]) if row["r_bm25"] else 0) + (
            1 / (60 + row["r_tf"]) if row["r_tf"] else 0
        )
        assert row["rrf"] == pytest.approx(want)
    # at least one doc appears in only one of the two rankings
    assert ((got["r_bm25"] == 0) | (got["r_tf"] == 0)).any()


def test_source_diversity_panel(tmp_path, ray_session):
    """Uniform 4-type source: H=ln4, Simpson=1/4, norm=1; single-type
    source: H=0, Simpson=1, norm=0 (degenerate CASE); TTR exact."""
    rows = [
        {"source": "uni", "tokens": [0, 1, 2, 3], "n_tok": 4},
        {"source": "one", "tokens": [7, 7, 7, 7], "n_tok": 4},
    ]
    from hepdata_validator_ray.pipelines.validation import source_diversity

    got = source_diversity(_write_seq(tmp_path, rows), vocab_size=10).set_index("source")
    assert got.loc["uni", "entropy"] == pytest.approx(math.log(4))
    assert got.loc["uni", "simpson"] == pytest.approx(0.25)
    assert got.loc["uni", "norm_entropy"] == pytest.approx(1.0)
    assert got.loc["uni", "ttr"] == pytest.approx(1.0)
    assert got.loc["one", "entropy"] == pytest.approx(0.0)
    assert got.loc["one", "simpson"] == pytest.approx(1.0)
    assert got.loc["one", "norm_entropy"] == 0.0
    assert got.loc["one", "ttr"] == pytest.approx(0.25)


def test_events_user_gini_extremes(tmp_path, ray_session):
    """Uniform activity → 0; one power user among idlers reproduces the
    hand value (counts [1,1,1,7]: G = 2·16/(4·10) − 5/4 = 0.45)."""
    rows = []
    for u, cnt in [(1, 1), (2, 1), (3, 1), (4, 7)]:
        for i in range(cnt):
            rows.append((u, pd.Timestamp("2026-07-01") + pd.Timedelta(seconds=len(rows))))
    pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": [r[1] for r in rows],
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "event_type": ["t"] * len(rows),
            "value": np.ones(len(rows)),
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from hepdata_validator_ray.pipelines.relational import events_user_gini

    got = events_user_gini(str(tmp_path)).iloc[0]
    # sorted counts [1,1,1,7]: Σ rank·x = 1+2+3+28 = 34 → 2·34/(4·10) − 5/4 = 0.45
    assert got["n_users"] == 4 and got["n_events"] == 10
    assert got["gini"] == pytest.approx(0.45)
