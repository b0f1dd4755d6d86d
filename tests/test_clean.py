"""End-to-end cleaning pipeline: survivors = rows passing every check with
globally unique doc_ids; ground-truth derived from the injection arithmetic."""

from hepdata_validator_ray.pipelines.clean import clean_sequences, clean_survivor_stats
from hepdata_validator_ray.synth import (
    ensure_sequences_parquet,
    expected_violation_doc_rows,
)

SF = "/root/testdata/sf0.001"
N = 2000


def test_survivor_count_matches_ground_truth():
    p = ensure_sequences_parquet(SF, n_files=4)
    gt = expected_violation_doc_rows(N)
    bad_rows = set()
    for rows in gt.values():
        bad_rows |= rows
    expected_survivors = N - len(bad_rows)
    cleaned = clean_sequences(p)
    assert cleaned.count() == expected_survivors
    # survivors re-validate clean
    from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine

    res = ValidationEngine(ValidationConfig(enable_sketches=False)).validate_dataset(cleaned)
    assert res.valid


def test_survivor_stats_sum(tmp_path):
    p = ensure_sequences_parquet(SF, n_files=4)
    stats = clean_survivor_stats(p).to_pandas()
    gt = expected_violation_doc_rows(N)
    bad_rows = set()
    for rows in gt.values():
        bad_rows |= rows
    assert int(stats.n_rows.sum()) == N - len(bad_rows)
    assert set(stats.source) <= {"web", "books", "code", "wiki", "news"}


def test_bloom_prefilter_path_identical():
    p = ensure_sequences_parquet(SF, n_files=4)
    exact = clean_sequences(p).to_pandas().sort_values("doc_id").reset_index(drop=True)
    bloom = clean_sequences(p, use_bloom=True).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert exact.doc_id.equals(bloom.doc_id)


def test_clean_write_roundtrip(tmp_path):
    p = ensure_sequences_parquet(SF, n_files=4)
    out = clean_sequences(p, output_dir=str(tmp_path / "clean"))
    import ray.data

    assert out.count() == clean_sequences(p).count()
