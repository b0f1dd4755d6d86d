"""Randomized oracle-equivalence for the round-5 event kernels: each op
runs side-by-side with its REGISTERED DuckDB twin over seeded random event
tables (ts collisions, null users, null values, singleton users all
exercised) and must match rows + columns + the gate's value hash — the
fixture-randomized generalization of the single sf0.01 gate point."""

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo/tools")
from check_correctness import to_pandas, value_hash  # noqa: E402

OPS = [
    "events_conversion_latency",
    "events_attribution",
    "events_attribution_linear",
    "events_time_weighted",
    "events_burst_max",
    "events_anomaly_days",
    "events_funnel_windowed",
]


def _random_events(seed: int, n: int = 400) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01").value // 1000  # µs
    # clustered timestamps with deliberate exact collisions
    t_us = base + rng.integers(0, 5 * 86_400_000_000, n)
    collide = rng.random(n) < 0.05
    t_us[collide] = t_us[rng.integers(0, n, int(collide.sum()))]
    users = rng.integers(1, 20, n).astype("float64")
    users[rng.random(n) < 0.03] = np.nan
    values = np.round(rng.uniform(0, 20, n), 2)
    values[rng.random(n) < 0.05] = np.nan
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(t_us, unit="us"),
            "user_id": pd.array(
                [None if np.isnan(u) else int(u) for u in users], dtype="Int64"
            ),
            "event_type": rng.choice(
                ["view", "click", "purchase", "signup", "error"], n
            ),
            "value": values,
        }
    )
    return df


@pytest.fixture(scope="module")
def oracles():
    import __ray_entry__ as entrymod

    return entrymod.oracle_sql()


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("op", OPS)
def test_random_fixture_matches_twin(ray_session, tmp_path, oracles, op, seed):
    import duckdb

    import __ray_entry__ as entrymod

    d = tmp_path / f"sf-{op}-{seed}"
    d.mkdir()
    _random_events(seed * 7919 + 11).to_parquet(d / "events.parquet", index=False)

    ray_df = to_pandas(entrymod.queries()[op](str(d)))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d / 'events.parquet'}')"
    )
    ora_df = con.execute(oracles[op]).df()

    assert len(ray_df) == len(ora_df), f"{op} seed {seed}: row count"
    assert sorted(map(str, ray_df.columns)) == sorted(map(str, ora_df.columns))
    assert value_hash(ray_df) == value_hash(ora_df), f"{op} seed {seed}: value hash"


DOC_OPS = ["text_blocklist", "mm_decoded_features", "mm_image_features",
           "mm_audio_features", "mm_image_resized", "mm_byte_hist"]
EMB_OPS = ["embedding_covariance", "ann_topk_ivf", "ann_ivf_recall"]


def _random_documents(seed: int, n: int = 300) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = ["slow", "error", "leak", "spill", "join", "hash", "data", "fast",
             "row", "scan", "merge", "the", "a", "table"]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(1, 40))) for _ in range(n)
    ]
    texts = [None if rng.random() < 0.04 else t for t in texts]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(["en", "de", "fr"], n),
            "source": rng.choice([f"src{i}" for i in range(6)], n),
            "n_chars": np.int64([len(t) if t else 0 for t in texts]),
        }
    )


def _random_embeddings(seed: int, n: int = 500, d: int = 8) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [rng.uniform(-1, 1, d).astype(np.float32) for _ in range(n)],
            "label": rng.integers(0, 5, n).astype(np.int32),
        }
    )


@pytest.mark.parametrize("seed", [1, 2])
@pytest.mark.parametrize("op", DOC_OPS)
def test_random_documents_match_twin(ray_session, tmp_path, oracles, op, seed):
    import duckdb

    import __ray_entry__ as entrymod

    d = tmp_path / f"sf-{op}-{seed}"
    d.mkdir()
    _random_documents(seed * 104729 + 3).to_parquet(d / "documents.parquet", index=False)

    ray_df = to_pandas(entrymod.queries()[op](str(d)))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d / 'documents.parquet'}')"
    )
    ora_df = con.execute(oracles[op]).df()
    assert len(ray_df) == len(ora_df), f"{op} seed {seed}: rows"
    assert sorted(map(str, ray_df.columns)) == sorted(map(str, ora_df.columns))
    assert value_hash(ray_df) == value_hash(ora_df), f"{op} seed {seed}: hash"


@pytest.mark.parametrize("seed", [1, 2])
@pytest.mark.parametrize("op", EMB_OPS)
def test_random_embeddings_match_twin(ray_session, tmp_path, oracles, op, seed):
    import duckdb

    import __ray_entry__ as entrymod

    d = tmp_path / f"sf-{op}-{seed}"
    d.mkdir()
    _random_embeddings(seed * 48271 + 5).to_parquet(d / "embeddings.parquet", index=False)

    ray_df = to_pandas(entrymod.queries()[op](str(d)))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d / 'embeddings.parquet'}')"
    )
    ora_df = con.execute(oracles[op]).df()
    assert len(ray_df) == len(ora_df), f"{op} seed {seed}: rows"
    assert sorted(map(str, ray_df.columns)) == sorted(map(str, ora_df.columns))
    assert value_hash(ray_df) == value_hash(ora_df), f"{op} seed {seed}: hash"


# Every events-family op whose oracle is self-contained on the `events`
# view (no synth-path fixtures, no cross-table reads, no persisted state)
EVENTS_WIDE = [
    "events_sessionize", "events_lag_trailing", "events_asof_join",
    "events_range_join", "events_tumbling", "events_daily", "events_rollup",
    "events_funnel", "events_type_transitions", "events_running_total",
    "events_hopping", "events_props_stats", "events_daily_pivot",
    "events_value_corr", "events_daily_unpivot", "events_value_regression",
    "events_value_moments", "events_interval_merge", "events_streaks",
    "events_paths", "events_mad_outliers", "events_window_dedup",
    "events_daily_gapfill", "events_cohort_retention",
    "events_cumulative_users", "events_type_overlap", "events_rolling_active",
    "events_daily_delta", "events_time_band_pairs", "events_wow_growth",
    "events_ohlc", "events_ewma", "events_hill_tail", "events_user_theil",
    "events_user_gini", "events_transition_entropy", "events_scd2",
    "events_nearest_join", "events_user_features", "events_kruskal",
    "events_repeat_rate", "events_iqr_outliers", "events_cvar", "events_rfm",
    "events_top_users_ties", "events_drawdown", "events_fano",
    "events_trend_mk", "events_seasonal_error", "events_acf",
    "events_changepoint", "events_weekend_profile", "events_mix_drift",
    "events_hour_entropy", "events_peak_hour", "events_hour_profile",
    "events_replay_disorder", "events_interarrival_spectrum",
    "events_rolling_median", "events_type_users",
]


def _random_events_full(seed: int, n: int = 400) -> pd.DataFrame:
    """Random events WITHIN the driver table's data contract (the real
    events.parquet is null-free everywhere — the wider family was built
    against that; null tolerance is pinned separately for the round-5 ops
    via _random_events).  Timestamp collisions stay in."""
    df = _random_events(seed, n)
    rng = np.random.default_rng(seed + 1)
    df["user_id"] = rng.integers(1, 20, n).astype("int64")
    df["value"] = np.round(rng.uniform(0, 20, n), 2)
    df["props"] = [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n)]
    return df


@pytest.mark.parametrize("op", EVENTS_WIDE)
def test_events_family_random_twin(ray_session, tmp_path, oracles, op):
    """One random fixture per op across the WHOLE events family: the
    fixture-randomized generalization of the sf0.01 gate (ts collisions,
    null users/values/props, 5-day span so seasonal/trend ops hit their
    degenerate conventions — equality under degeneracy is the point)."""
    import duckdb

    import __ray_entry__ as entrymod

    if op not in oracles:
        pytest.skip("rows-only")
    d = tmp_path / "sf"
    d.mkdir()
    _random_events_full(hash(op) % (2**31)).to_parquet(d / "events.parquet", index=False)

    ray_df = to_pandas(entrymod.queries()[op](str(d)))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d / 'events.parquet'}')"
    )
    ora_df = con.execute(oracles[op]).df()
    assert len(ray_df) == len(ora_df), f"{op}: rows ray={len(ray_df)} oracle={len(ora_df)}"
    assert sorted(map(str, ray_df.columns)) == sorted(map(str, ora_df.columns))
    assert value_hash(ray_df) == value_hash(ora_df), f"{op}: value hash"


# Documents-family ops whose oracle is self-contained on the `documents`
# view; the fixture injects exact-dup texts (10%) so dedup shapes are
# non-degenerate, and carries the bm25 default query terms in-vocabulary
DOC_WIDE = [
    "text_token_counts", "text_quality", "text_langid_fp", "text_langid",
    "text_tfidf_top", "text_top_words", "text_cooccurrence", "text_normalize",
    "text_boilerplate", "text_inverted_index", "text_vocab_oov",
    "text_heavy_hitters", "text_bpe_pairs", "text_bpe_train", "text_bpe_encode",
    "dedup_exact_groups", "dedup_exact_keep_first", "dedup_ngram_jaccard",
    "dedup_minhash_md5", "dedup_simhash_md5", "dedup_near_dup_clusters",
    "dedup_dup_spans",
    "docs_quantile_disc", "docs_quantile_cont", "docs_rollup", "docs_cube",
    "docs_ntile", "docs_lang_mode", "docs_rank_windows", "docs_row_index",
    "docs_order_stats", "docs_winsorize", "docs_feature_scaling",
    "docs_fertility_hist", "docs_charclass", "docs_dup_rate",
    "docs_source_concentration", "docs_length_scaling",
    "profile_documents", "profile_lang_source",
    "split_assignment", "deterministic_sample", "stratified_sample",
    "weighted_priority_sample", "weighted_sample_by_source",
    "balanced_downsample", "mixture_counts", "mixture_expand",
    "exact_k_sample", "exact_k_per_group", "quality_buckets",
    "shuffle_ranks", "shuffle_adjacency", "source_overlap",
    "bm25_topk", "bm25_prf_expansion", "bm25_rrf",
    "training_packing", "training_contamination", "training_lm_scores",
    "training_pii_scrub", "rag_chunks", "training_contamination_exact",
    "split_leakage",
]


def _random_documents_wide(seed: int, n: int = 300) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = ["slow", "error", "leak", "spill", "join", "hash", "data", "fast",
             "row", "scan", "merge", "the", "a", "table", "stream", "sort",
             "key", "value", "batch", "line"]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 40))) for _ in range(n)]
    # inject exact-dup classes so dedup shapes bite
    for i in range(n):
        if i > 10 and rng.random() < 0.10:
            texts[i] = texts[int(rng.integers(0, i))]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(["en", "de", "fr"], n),
            "source": rng.choice([f"src{i}" for i in range(6)], n),
        }
    )
    df["n_chars"] = df["text"].str.len().astype("int64")
    return df


@pytest.mark.parametrize("op", DOC_WIDE)
def test_documents_family_random_twin(ray_session, tmp_path, oracles, op):
    import duckdb

    import __ray_entry__ as entrymod

    if op not in oracles:
        pytest.skip("rows-only")
    d = tmp_path / "sf"
    d.mkdir()
    _random_documents_wide(hash(op) % (2**31)).to_parquet(
        d / "documents.parquet", index=False
    )
    ray_df = to_pandas(entrymod.queries()[op](str(d)))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d / 'documents.parquet'}')"
    )
    ora_df = con.execute(oracles[op]).df()
    assert len(ray_df) == len(ora_df), f"{op}: rows ray={len(ray_df)} oracle={len(ora_df)}"
    assert sorted(map(str, ray_df.columns)) == sorted(map(str, ora_df.columns))
    assert value_hash(ray_df) == value_hash(ora_df), f"{op}: value hash"


EMB_WIDE = [
    "embedding_kmeans", "embedding_dim_stats", "embedding_silhouette",
    "semantic_dedup", "embedding_label_centroids",
    "embedding_similarity_calibration", "embedding_projection",
    "embedding_outliers", "knn_label_agreement", "centroid_pair_dots",
    "dedup_embedding_lsh", "ann_meta", "embedding_cluster_meta",
    "v_embedding_integrity",
]


@pytest.mark.parametrize("op", EMB_WIDE)
def test_embeddings_family_random_twin(ray_session, tmp_path, oracles, op):
    import duckdb

    import __ray_entry__ as entrymod

    if op not in oracles:
        pytest.skip("rows-only")
    d = tmp_path / "sf"
    d.mkdir()
    _random_embeddings(hash(op) % (2**31)).to_parquet(
        d / "embeddings.parquet", index=False
    )
    ray_df = to_pandas(entrymod.queries()[op](str(d)))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d / 'embeddings.parquet'}')"
    )
    ora_df = con.execute(oracles[op]).df()
    assert sorted(map(str, ray_df.columns)) == sorted(map(str, ora_df.columns))
    if op == "dedup_embedding_lsh":
        # LSH is recall-complete BY MEASUREMENT at the gate fixture (dim
        # 64); on an arbitrary random corpus (dim 8 here) the documented
        # contract is one-sided: NO false positives (exact in-bucket cos
        # verify) and high recall vs the exact all-pairs oracle
        rk = set(zip(ray_df["vec_id_a"], ray_df["vec_id_b"]))
        ok = set(zip(ora_df["vec_id_a"], ora_df["vec_id_b"]))
        assert rk <= ok, f"{op}: LSH emitted a false-positive pair"
        assert len(rk) >= 0.99 * len(ok), f"{op}: recall {len(rk)}/{len(ok)}"
        return
    assert len(ray_df) == len(ora_df), f"{op}: rows ray={len(ray_df)} oracle={len(ora_df)}"
    assert value_hash(ray_df) == value_hash(ora_df), f"{op}: value hash"
