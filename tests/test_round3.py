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


# ---------------------------------------------------------------------------
# uniqueItems row-local check (VERDICT r2 missing #3 / directive #6)
# ---------------------------------------------------------------------------

def test_unique_items_check_unit():
    import pyarrow as pa

    from hepdata_validator_ray.checks.base import CheckContext
    from hepdata_validator_ray.checks.row_checks import check_tokens_unique, prepare_view

    batch = pa.table(
        {
            "doc_id": ["a", "b", "c", "d", "e"],
            "tokens": pa.array([[1, 2, 3], [4, 5, 4, 4], None, [], [7, 7]], type=pa.list_(pa.int32())),
        }
    )
    res = check_tokens_unique(prepare_view(batch), CheckContext())
    assert list(res.indices) == [1, 4]
    assert res.details[0] == (
        "tokens has non-unique elements (value 4 appears 3 times) in 'tokens' "
        "(expected: {'uniqueItems': True})"
    )
    assert res.details[1].startswith("tokens has non-unique elements (value 7 appears 2 times)")


def test_unique_items_version_gated():
    from hepdata_validator_ray.checks.row_checks import build_default_suite

    assert "tokens_unique_items" not in {c.name for c in build_default_suite("1.1.1").checks}
    assert "tokens_unique_items" in {c.name for c in build_default_suite("1.2.0").checks}


# ---------------------------------------------------------------------------
# declarative config-only checks (VERDICT r2 missing #1 / directive #5)
# ---------------------------------------------------------------------------

def test_declarative_checks_compile_and_messages():
    import pyarrow as pa

    from hepdata_validator_ray.checks.base import CheckContext
    from hepdata_validator_ray.checks.declarative import compile_declared_check
    from hepdata_validator_ray.checks.row_checks import prepare_view

    batch = pa.table(
        {
            "doc_id": ["doc-1", "x", None, "doc-4444"],
            "n_tok": pa.array([5, 200, -3, None], type=pa.int64()),
            "source": ["web", "lab", None, "web"],
        }
    )
    v = prepare_view(batch)
    ctx = CheckContext()

    mx = compile_declared_check({"column": "n_tok", "keyword": "maximum", "value": 100})
    res = mx.fn(v, ctx)
    assert mx.name == "n_tok_maximum" and list(res.indices) == [1]
    assert res.details[0] == "200 is greater than the maximum of 100 in 'n_tok' (expected: {'maximum': 100})"

    mn = compile_declared_check({"column": "n_tok", "keyword": "minimum", "value": 0})
    assert list(mn.fn(v, ctx).indices) == [2]  # null row 3 not flagged

    pat = compile_declared_check({"column": "source", "keyword": "pattern", "value": "^web$"})
    res = pat.fn(v, ctx)
    assert list(res.indices) == [1]
    assert res.details[0] == "'lab' does not match '^web$' in 'source' (expected: {'pattern': '^web$'})"

    en = compile_declared_check({"column": "source", "keyword": "enum", "value": ["web"]})
    assert list(en.fn(v, ctx).indices) == [1]

    ml = compile_declared_check({"column": "doc_id", "keyword": "minLength", "value": 3})
    res = ml.fn(v, ctx)
    assert list(res.indices) == [1]
    assert res.details[0] == "'x' is too short in 'doc_id' (expected: {'minLength': 3})"

    nn = compile_declared_check({"column": "doc_id", "keyword": "non_null"})
    assert list(nn.fn(v, ctx).indices) == [2]

    import pytest as _pytest

    with _pytest.raises(KeyError, match="no schema defined for the 'fancy'"):
        compile_declared_check({"column": "n_tok", "keyword": "fancy", "value": 1})


def test_declarative_suite_config_end_to_end(tmp_path, synth_path):
    """Config-only custom check through the full engine — the analogue of
    the reference's custom-schema cases (test_data_validator.py via
    load_custom_schema, data_file_validator.py:52-78)."""
    import json

    from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine
    from hepdata_validator_ray.sources.suite_loader import load_suite_config

    cfg_path = tmp_path / "suite.json"
    cfg_path.write_text(
        json.dumps(
            {
                "name": "decl_e2e",
                "version": "1.1.1",
                "checks": [],
                "declare": [{"column": "n_tok", "keyword": "maximum", "value": 64}],
            }
        )
    )
    suite, _ = load_suite_config(str(cfg_path))
    assert [c.name for c in suite.checks] == ["n_tok_maximum"]
    eng = ValidationEngine(
        ValidationConfig(suite=suite, enable_sketches=False, dup_check=False, concurrency=2)
    )
    res = eng.validate(synth_path)
    import duckdb

    expected = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{synth_path}/*.parquet') WHERE n_tok > 64"
    ).fetchone()[0]
    assert res.violation_counts.get("n_tok_maximum", 0) == expected > 0


# ---------------------------------------------------------------------------
# per-table suite override in bundle mode (VERDICT r2 missing #2 / #4)
# ---------------------------------------------------------------------------

def test_bundle_per_table_suite_override(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.checks.base import register_check_suite
    from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine
    from hepdata_validator_ray.sources.suite_loader import resolve_suite_refs

    # identical bad rows in both tables: n_tok mismatches len(tokens)
    tbl = pa.table(
        {
            "doc_id": ["doc-1", "doc-2", "doc-3", "doc-4"],
            "tokens": pa.array([[1, 2], [3], [4, 5], [6]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([99, 1, 99, 1], type=pa.int64()),
            "source": ["src0", "src0", "src0", "src0"],
            "table": ["t0", "t0", "t1", "t1"],
        }
    )
    bundle = tmp_path / "bundle.parquet"
    pq.write_table(tbl, bundle)

    lenient, _ = resolve_suite_refs(
        {"name": "lenient_no_len", "version": "1.1.1", "exclude": ["token_length_consistency"]}
    )
    register_check_suite("lenient_no_len", lenient)

    eng = ValidationEngine(ValidationConfig(enable_sketches=False, dup_check=False))
    res = eng.validate_bundle(str(bundle), table_suites={"t1": "lenient_no_len"})
    v = res.verdicts
    t0 = v[(v.partition_id == "bundle.parquet#t0") & (v.check_name == "token_length_consistency")]
    t1 = v[(v.partition_id == "bundle.parquet#t1") & (v.check_name == "token_length_consistency")]
    assert len(t0) == 1 and not t0.passed.iloc[0] and t0.n_violations.iloc[0] == 1
    # the override table does NOT even report the excluded check
    assert len(t1) == 0
    assert res.violation_counts.get("token_length_consistency", 0) == 1

    # unknown suite name raises the reference unsupported-schema grammar
    with pytest.raises(KeyError, match="no schema defined"):
        eng.validate_bundle(str(bundle), table_suites={"t1": "nope"})


def test_bundle_override_at_higher_version(tmp_path):
    """An override suite pinned at 1.2.0 activates uniqueItems for ITS table
    only — two tables, same data, distinct verdicts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.checks.base import register_check_suite
    from hepdata_validator_ray.checks.row_checks import build_default_suite
    from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine

    register_check_suite("strict_v12", build_default_suite("1.2.0"))
    tbl = pa.table(
        {
            "doc_id": ["doc-1", "doc-2"],
            "tokens": pa.array([[5, 5, 6], [5, 5, 6]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([3, 3], type=pa.int64()),
            "source": ["src0", "src0"],
            "table": ["t0", "t1"],
        }
    )
    bundle = tmp_path / "bundle2.parquet"
    pq.write_table(tbl, bundle)
    eng = ValidationEngine(ValidationConfig(enable_sketches=False, dup_check=False))
    res = eng.validate_bundle(str(bundle), table_suites={"t1": "strict_v12"})
    v = res.verdicts
    uq = v[v.check_name == "tokens_unique_items"]
    assert list(uq.partition_id) == ["bundle2.parquet#t1"]
    assert not uq.passed.iloc[0]
    assert res.violation_counts.get("tokens_unique_items", 0) == 1


# ---------------------------------------------------------------------------
# candidate reuse + fused window op + ngram clusters (VERDICT r2 #2/#7)
# ---------------------------------------------------------------------------

def test_ngram_candidate_reuse_same_output():
    from hepdata_validator_ray.pipelines.dedup import minhash_candidates, ngram_jaccard_pairs

    default = ngram_jaccard_pairs(DOCS, threshold=0.3).to_pandas()
    cands = minhash_candidates(DOCS).materialize()
    reused = ngram_jaccard_pairs(DOCS, threshold=0.3, candidates=cands).to_pandas()
    key = ["doc_id_a", "doc_id_b"]
    assert sorted(map(tuple, default[key].values.tolist())) == sorted(map(tuple, reused[key].values.tolist()))
    assert len(default) > 0


def test_minhash_candidates_deduped_and_superset_of_pairs():
    from hepdata_validator_ray.pipelines.dedup import minhash_candidates, minhash_lsh_pairs

    cands = minhash_candidates(DOCS).to_pandas()
    cands = cands[cands.doc_id_a >= 0]
    assert not cands.duplicated(["doc_id_a", "doc_id_b"]).any()
    est = minhash_lsh_pairs(DOCS, threshold=0.5).to_pandas()
    est = est[est.doc_id_a >= 0]
    cset = set(zip(cands.doc_id_a, cands.doc_id_b))
    eset = set(zip(est.doc_id_a, est.doc_id_b))
    assert eset <= cset  # estimated-pairs are a threshold-filtered subset


def test_ngram_clusters_pandas_vs_distributed():
    from hepdata_validator_ray.pipelines.dedup import near_dup_clusters

    local = near_dup_clusters(DOCS, threshold=0.3, method="ngram")
    dist = near_dup_clusters(DOCS, threshold=0.3, method="ngram", distributed=True)
    assert local.sort_values("doc_id").reset_index(drop=True).equals(
        dist.sort_values("doc_id").reset_index(drop=True)
    )
    assert len(local) > 0


def test_lag_trailing_fused_matches_separate_ops():
    from hepdata_validator_ray.pipelines.relational import (
        events_lag_previous,
        events_lag_trailing,
        events_trailing_count,
    )

    fused = events_lag_trailing(SF).to_pandas().sort_values("event_id").reset_index(drop=True)
    lag = events_lag_previous(SF).to_pandas().sort_values("event_id").reset_index(drop=True)
    trail = events_trailing_count(SF).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert fused["prev_ts"].fillna("-").tolist() == lag["prev_ts"].fillna("-").tolist()
    assert fused["n_trailing"].tolist() == trail["n_trailing"].tolist()


def test_bundle_null_table_tag_rows_still_validated(tmp_path):
    """Regression: rows with a NULL table tag match no dictionary code in
    the per-table routing (their index encodes as null → NaN), and used to
    be silently dropped.  They must validate under the run-level suite,
    exactly as the no-override branch treats them."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.checks.base import register_check_suite
    from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine
    from hepdata_validator_ray.sources.suite_loader import resolve_suite_refs

    tbl = pa.table(
        {
            "doc_id": ["doc-1", "doc-2", "doc-3"],
            "tokens": pa.array([[1, 2], [3], [4]], type=pa.list_(pa.int32())),
            # doc-2 (table t0) and doc-3 (NULL table) both violate n_tok
            "n_tok": pa.array([2, 99, 99], type=pa.int64()),
            "source": ["src0", "src0", "src0"],
            "table": pa.array(["t0", "t0", None], type=pa.string()),
        }
    )
    bundle = tmp_path / "bundle_null.parquet"
    pq.write_table(tbl, bundle)

    lenient, _ = resolve_suite_refs(
        {"name": "lenient_null_t", "version": "1.1.1", "exclude": ["token_length_consistency"]}
    )
    register_check_suite("lenient_null_t", lenient)

    eng = ValidationEngine(ValidationConfig(enable_sketches=False, dup_check=False))
    res = eng.validate_bundle(str(bundle), table_suites={"t0": "lenient_null_t"})
    # t0's violation is excluded by its override; the NULL-tag row's is NOT
    assert res.n_rows == 3
    assert res.violation_counts.get("token_length_consistency", 0) == 1
    assert not res.valid


def test_cli_suite_config_version_activates_gated_checks(tmp_path):
    """Regression: --suite-config with a declared version but no context
    block must run under THAT version — the 1.2.0-gated uniqueItems check
    used to silently vanish under the CLI's default 1.1.1."""
    import json
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "data"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": ["doc-1"],
                "tokens": pa.array([[5, 5, 6]], type=pa.list_(pa.int32())),
                "n_tok": pa.array([3], type=pa.int64()),
                "source": ["src0"],
            }
        ),
        d / "part0.parquet",
    )
    cfg = tmp_path / "suite12.json"
    cfg.write_text(json.dumps({"name": "strict12_cli", "version": "1.2.0"}))
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "hepdata_validator_ray.cli",
            "validate",
            str(d),
            "--suite-config",
            str(cfg),
            "--no-dup",
            "--no-unigram",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 1, r.stdout + r.stderr
    assert "tokens_unique_items" in r.stdout

    # and the two suite selectors conflict loudly, not silently
    r2 = subprocess.run(
        [
            sys.executable,
            "-m",
            "hepdata_validator_ray.cli",
            "validate",
            str(d),
            "--suite",
            "default",
            "--suite-config",
            str(cfg),
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert r2.returncode == 2
    assert "mutually exclusive" in r2.stdout


def test_declarative_enum_rejects_scalar_string():
    """A bare-string enum value would silently become per-character
    membership; it must be rejected at compile time like jsonschema
    rejects a non-array enum."""
    from hepdata_validator_ray.checks.declarative import compile_declared_check

    with pytest.raises(ValueError, match="enum value"):
        compile_declared_check({"column": "source", "keyword": "enum", "value": "web"})


def test_first_seen_update_uses_delta_only(ray_session, tmp_path):
    """The update phase must produce the same state as a full recompute,
    and the persisted base-state artifact must exist and be user-keyed."""
    import os

    import pandas as pd

    from hepdata_validator_ray.pipelines.relational import events_first_seen_update

    sd = str(tmp_path / "state")
    out = events_first_seen_update("/root/testdata/sf0.001", state_dir=sd).to_pandas()
    assert os.path.isdir(sd) and any(f.endswith(".parquet") for f in os.listdir(sd))
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet", columns=["user_id", "ts"])
    full = (
        ev.assign(day=ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000)
        .groupby("user_id", as_index=False)["day"].min()
        .rename(columns={"day": "first_day"})
    )
    got = out.sort_values("user_id").reset_index(drop=True)
    exp = full.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"), check_dtype=False)


def test_order_statistics_partition_invariant(ray_session):
    """The selected (rank, value) set must not depend on the bucket
    count — range-aligned offsets make correctness partition-invariant."""
    import pandas as pd

    from hepdata_validator_ray.pipelines.relational import docs_order_statistics

    a = (
        docs_order_statistics("/root/testdata/sf0.001", num_buckets=8)
        .to_pandas().sort_values("rank").reset_index(drop=True)
    )
    b = (
        docs_order_statistics("/root/testdata/sf0.001", num_buckets=64)
        .to_pandas().sort_values("rank").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 5 and a["rank"].iloc[0] == 0
    # values are nondecreasing in rank
    assert a["n_chars"].is_monotonic_increasing


def test_order_statistics_adversarial_skew_bounded_buckets(ray_session, tmp_path):
    """The r3 skew hole, closed by sampled composite-key boundaries: ALL
    rows share one n_chars value (equal-width bins would put 100% of the
    mass in one bucket).  The result must stay exact AND the sampled
    boundaries must split the mass by doc_id with per-bucket load bounded
    near n/nb."""
    import numpy as np
    import pandas as pd

    from hepdata_validator_ray.pipelines.relational import (
        _OSTAT_KEY,
        _ostat_sample_boundaries,
        docs_order_statistics,
    )

    n, nb = 20_000, 16
    sf = tmp_path / "skew"
    sf.mkdir()
    pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "n_chars": np.int64(777)}).to_parquet(
        sf / "documents.parquet", index=False
    )
    got = (
        docs_order_statistics(str(sf), num_buckets=nb)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    # ground truth: total order is (n_chars, doc_id) = doc_id order here
    want_ranks = [0, n // 4, n // 2, (3 * n) // 4, n - 1]
    assert list(got["rank"]) == want_ranks
    assert list(got["doc_id"]) == want_ranks  # doc_id == position
    assert (got["n_chars"] == 777).all()

    # bucket-load bound: replay the bucket function over the full corpus
    cuts = _ostat_sample_boundaries(str(sf / "documents.parquet"), nb, n)
    assert len(cuts) >= nb // 2, "single-value corpus must still split by doc_id"
    keys = np.zeros(n, dtype=_OSTAT_KEY)
    keys["v"] = 777
    keys["id"] = np.arange(n)
    loads = np.bincount(np.searchsorted(cuts, keys, side="right"), minlength=len(cuts) + 1)
    assert loads.max() <= 4 * (n // (len(cuts) + 1)), loads
