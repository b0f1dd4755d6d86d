"""Randomized twin-equivalence for the SEQUENCES (v_*) family: the synth
corpus is regenerated under a NON-DEFAULT seed (different content, same
injection index arithmetic) and every op replays against its oracle —
rebuilt under the same seed patch, so both engines read the seeded bytes.
Ops whose fixtures live in seed-UNAWARE derived caches (csv/orc/ipc/zip/
bundle/rowgrouped/nearpair/mutated) are excluded: their caches would serve
seed-42 content against a seed-7 base (a fixture staleness, not an engine
property)."""

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")
from check_correctness import to_pandas, value_hash  # noqa: E402

SF = "/root/testdata/sf0.01"
SEED = 7

SEQ_OPS = [
    "v_row_violations", "v_row_violations_v12", "v_declarative_check",
    "v_duplicates", "v_stats_by_source", "v_ntok_mode", "v_length_bias",
    "v_source_quantiles", "v_partition_stats", "v_compound_check",
    "v_ntok_quantiles", "v_token_bigrams_top", "v_p99_filter",
    "v_longest_sequences", "flagship_validation_suite", "clean_survivor_stats",
    "v_ntok_hist", "v_degenerate_sequences", "v_rare_token_unk",
    "v_ks_drift", "v_token_ngram_repetition", "v_token_coverage",
    "sampling_allocation", "v_id_source_consistency", "v_token_framing",
    "v_token_periodicity", "v_compute_cost", "v_token_concentration",
    "v_token_rank_mass", "v_corpus_digest", "v_ntok_mad",
    "v_winsorized_tokens", "v_bigram_pmi_top", "v_token_position_entropy",
    "v_zipf_fit", "v_shard_skew", "v_vocab_growth", "v_gini_ntok",
    "v_ntok_percentile", "v_source_js", "v_spearman_repetition",
    "v_source_diversity", "v_source_xent", "sampling_temperature",
    "v_bigram_novelty", "v_bigram_coc", "v_entropy_rate",
    "v_weighted_median", "v_doc_max_run", "v_doc_entropy",
    "v_seq_perplexity", "v_token_gini", "v_vocab_utilization",
    "v_token_source_mi", "v_benford_digits", "dedup_cdc_chunks",
    "dedup_sequence_content", "v_snapshot_psi", "v_snapshot_length_drift",
    "v_vocab_churn", "content_incremental_new", "v_schema_fingerprint",
    "v_file_ranges", "v_file_compaction", "v_footer_stats_truth",
    "v_parquet_layout", "v_file_integrity", "v_trimmed_stats",
]


@pytest.fixture(scope="module")
def seeded(ray_session):
    """Patch every ensure_sequences_parquet binding to the non-default
    seed, then rebuild queries() + oracle_sql() under the patch so both
    sides bake the seeded corpus paths."""
    import __ray_entry__ as entrymod
    import hepdata_validator_ray.synth as synth

    orig = synth.ensure_sequences_parquet

    def forced(sf_dir, n_files=8, seed=42, inject=True, n_rows=None, row_offset=0):
        return orig(
            sf_dir, n_files=n_files, seed=SEED, inject=inject,
            n_rows=n_rows, row_offset=row_offset,
        )

    patched = []
    for mod in (synth, entrymod):
        patched.append((mod, mod.ensure_sequences_parquet))
        mod.ensure_sequences_parquet = forced
    # the oracle paths are baked into a module constant at import time —
    # repoint it at the seeded corpus for the rebuild
    old_glob = entrymod._SYNTH_GLOB_001
    entrymod._SYNTH_GLOB_001 = (
        str(synth.synth_dir_for("/root/testdata/sf0.01", seed=SEED)) + "/*.parquet"
    )
    try:
        yield entrymod.queries(), entrymod.oracle_sql()
    finally:
        entrymod._SYNTH_GLOB_001 = old_glob
        for mod, fn in patched:
            mod.ensure_sequences_parquet = fn


@pytest.mark.parametrize("op", SEQ_OPS)
def test_sequences_random_twin(seeded, op):
    import duckdb

    queries, oracles = seeded
    ray_df = to_pandas(queries[op](SF))
    con = duckdb.connect()
    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    ora_df = con.execute(oracles[op]).df()
    assert len(ray_df) == len(ora_df), f"{op}: rows ray={len(ray_df)} oracle={len(ora_df)}"
    assert sorted(map(str, ray_df.columns)) == sorted(map(str, ora_df.columns))
    assert value_hash(ray_df) == value_hash(ora_df), f"{op}: value hash"
