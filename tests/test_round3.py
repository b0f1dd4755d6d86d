"""Round-3 fixes: chi-squared drift scorer, vectorized sampling twin,
shingle_k > 8, distinct hot-bucket sentinels, archive expected_files linkage
on scrubbed paths, archive validation without shared-config mutation."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


@pytest.fixture(scope="module")
def synth_path():
    from hepdata_validator_ray.synth import ensure_sequences_parquet

    return ensure_sequences_parquet(SF, n_files=4)


# ---------------------------------------------------------------------------
# chi-squared drift scorer (VERDICT r2 #9)
# ---------------------------------------------------------------------------

def test_chi2_drift_scorer(synth_path):
    from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine
    from hepdata_validator_ray.synth import generate_sequences_table

    eng = ValidationEngine(ValidationConfig(concurrency=2, enable_unigram=False, dup_check=False))
    profile = eng.validate(synth_path).sketch.to_bytes()

    # same-distribution profile under chi2: all partitions pass with a
    # sample-size-scaled threshold (chi2 grows with n, unlike KL)
    eng_chi = ValidationEngine(
        ValidationConfig(
            concurrency=2, enable_unigram=False, dup_check=False,
            drift_profile_bytes=profile, drift_scorer="chi2",
            drift_thresholds={"drift_n_tok": 400.0, "drift_source_mix": 400.0},
        )
    )
    res = eng_chi.validate(synth_path)
    rows = res.verdicts[res.verdicts.check_name == "drift_n_tok"]
    assert len(rows) == 4
    assert rows.passed.all()
    assert rows.detail.str.startswith("CHI2(n_tok)=").all()

    # shifted profile: chi2 blows up, every partition flagged
    shifted = generate_sequences_table(2000, seed=9, inject=False, mean_len=1500)
    from hepdata_validator_ray.checks.row_checks import prepare_view
    from hepdata_validator_ray.sketches import SketchBundle

    b = SketchBundle()
    b.n_tok_hist.add(prepare_view(shifted)["n_tok"])
    b.n_rows = 2000
    eng_shift = ValidationEngine(
        ValidationConfig(
            concurrency=2, enable_unigram=False, dup_check=False,
            drift_profile_bytes=b.to_bytes(), drift_scorer="chi2",
            drift_thresholds={"drift_n_tok": 400.0, "drift_source_mix": 400.0},
        )
    )
    res2 = eng_shift.validate(synth_path)
    rows2 = res2.verdicts[res2.verdicts.check_name == "drift_n_tok"]
    assert (~rows2.passed).all()


def test_unknown_drift_scorer_raises(synth_path):
    from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine

    eng = ValidationEngine(ValidationConfig(concurrency=2, enable_unigram=False, dup_check=False))
    profile = eng.validate(synth_path).sketch.to_bytes()
    bad = ValidationEngine(
        ValidationConfig(
            concurrency=2, enable_unigram=False, dup_check=False,
            drift_profile_bytes=profile, drift_scorer="wasserstein",
        )
    )
    with pytest.raises(ValueError, match="drift_scorer"):
        bad.validate(synth_path)


# ---------------------------------------------------------------------------
# vectorized sampling production path (VERDICT r2 #8)
# ---------------------------------------------------------------------------

def test_siphash_split_parity_and_determinism():
    from hepdata_validator_ray.pipelines.sampling import split_assignment

    a = split_assignment(DOCS, key_fn="siphash").to_pandas().set_index("split").n.to_dict()
    b = split_assignment(DOCS, key_fn="siphash").to_pandas().set_index("split").n.to_dict()
    assert a == b  # deterministic across runs
    assert sum(a.values()) == 500
    # same split-fraction class as the md5 oracle path (both uniform hashes)
    md5 = split_assignment(DOCS, key_fn="md5").to_pandas().set_index("split").n.to_dict()
    assert abs(a.get("test", 0) - md5.get("test", 0)) < 40


def test_siphash_sample_nested_and_no_per_row_hashlib():
    import hashlib as _hashlib
    from unittest import mock

    from hepdata_validator_ray.pipelines import sampling

    # nested-sample property holds for the production key too
    small = set(sampling.deterministic_sample(DOCS, pct=5, key_fn="siphash").to_pandas().doc_id)
    big = set(sampling.deterministic_sample(DOCS, pct=20, key_fn="siphash").to_pandas().doc_id)
    assert small <= big and len(big) > len(small) > 0

    # the production bucket kernel never calls hashlib (no per-row Python)
    with mock.patch.object(_hashlib, "md5", side_effect=AssertionError("md5 in production path")):
        out = sampling._bucket_of(np.arange(1000), key_fn="siphash")
    assert out.min() >= 0 and out.max() < 100


def test_stratified_siphash_rates():
    from hepdata_validator_ray.pipelines.sampling import stratified_sample_counts

    out = (
        stratified_sample_counts(DOCS, rates={"src0": 100}, default_pct=0, key_fn="siphash")
        .to_pandas()
    )
    # rate-100 stratum keeps everything; rate-0 strata keep nothing
    assert set(out["source"]) == {"src0"}


# ---------------------------------------------------------------------------
# shingle_k beyond the pinned multiplier table (ADVICE r2)
# ---------------------------------------------------------------------------

def test_shingle_k_past_table_bound():
    from hepdata_validator_ray.pipelines.dedup import _shingle_hashes, _word_hashes

    texts = pd.Series(["one two three four five six seven eight nine ten eleven twelve"])
    wh, offs = _word_hashes(texts, "hvr-minhash-wrdk")
    sh, sh_off = _shingle_hashes(wh, offs, k=10)  # > 8 raised IndexError before
    assert sh_off[-1] == 3  # 12 words, k=10 → 3 windows
    assert len(np.unique(sh)) == 3
    # short-row path past the table bound too
    short = pd.Series(["a b c d e f g h i"])  # 9 words < k=10 → one join-all shingle
    wh2, offs2 = _word_hashes(short, "hvr-minhash-wrdk")
    sh2, sh_off2 = _shingle_hashes(wh2, offs2, k=10)
    assert sh_off2[-1] == 1


def test_pinned_multipliers_unchanged():
    # offsets <8 still use the pinned table — golden fingerprints depend on it
    from hepdata_validator_ray.pipelines.dedup import _SHINGLE_MIX, _shingle_mult

    for j, v in enumerate(_SHINGLE_MIX):
        assert int(_shingle_mult(j)) == v


# ---------------------------------------------------------------------------
# distinct hot-bucket sentinel keys (ADVICE r2)
# ---------------------------------------------------------------------------

def test_hot_rows_distinct_per_bucket():
    from hepdata_validator_ray.pipelines.dedup import _hot_row

    g1 = pd.DataFrame({"band": [2] * 3, "bucket": [111] * 3, "doc_id": [1, 2, 3]})
    g2 = pd.DataFrame({"band": [2] * 5, "bucket": [222] * 5, "doc_id": [4, 5, 6, 7, 8]})
    r1 = _hot_row(g1, "est_jaccard")
    r2 = _hot_row(g2, "est_jaccard")
    assert r1["doc_id_a"].iloc[0] == -1 and r2["doc_id_a"].iloc[0] == -1
    # two hot buckets in the SAME band no longer share a key
    assert r1["doc_id_b"].iloc[0] != r2["doc_id_b"].iloc[0]
    assert r1["doc_id_b"].iloc[0] < 0 and r2["doc_id_b"].iloc[0] < 0
    assert r1["est_jaccard"].iloc[0] == 3.0 and r2["est_jaccard"].iloc[0] == 5.0


# ---------------------------------------------------------------------------
# archive mode: expected_files linkage + no shared-config mutation (ADVICE r2)
# ---------------------------------------------------------------------------

def test_archive_expected_files_linkage(tmp_path):
    """expected_files given archive-relative validates an archive without
    phantom missing/unreferenced verdicts (paths compared scrubbed)."""
    import shutil

    from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine
    from hepdata_validator_ray.synth import ensure_sequences_parquet

    src = ensure_sequences_parquet(SF)
    stage = tmp_path / "stage"
    stage.mkdir()
    names = sorted(p.name for p in __import__("pathlib").Path(src).glob("*.parquet"))[:2]
    for n in names:
        shutil.copy(f"{src}/{n}", stage / n)
    archive = shutil.make_archive(str(tmp_path / "sub"), "zip", stage)

    eng = ValidationEngine(
        ValidationConfig(enable_sketches=False, dup_check=False, expected_files=names)
    )
    res = eng.validate(archive)
    linkage = res.verdicts[
        res.verdicts.check_name.isin(["partition_referenced", "partition_present"])
    ]
    assert len(linkage) == 0  # before the fix: every file flagged both ways

    # now with one expected file absent and one on-disk file unexpected
    eng2 = ValidationEngine(
        ValidationConfig(
            enable_sketches=False, dup_check=False, expected_files=[names[0], "ghost.parquet"]
        )
    )
    res2 = eng2.validate(archive)
    v = res2.verdicts
    missing = v[v.check_name == "partition_present"]
    unref = v[v.check_name == "partition_referenced"]
    assert list(missing.partition_id) == ["ghost.parquet"]
    assert missing.detail.iloc[0] == "Missing data_file 'ghost.parquet'."
    assert list(unref.partition_id) == [names[1]]
    assert unref.detail.iloc[0] == f"{names[1]} is not referenced in the submission."
    # the engine's own config was never mutated by the nested archive run
    assert eng2.config.scrub_prefix is None
