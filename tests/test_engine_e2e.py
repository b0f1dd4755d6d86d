"""End-to-end engine tests on deterministic synthetic Parquet: golden
violation sets, verdict shape, resume-from-checkpoint identity, drift
detection, and the suppression semantics.

Mirrors the reference's full-submission test strategy
(testsuite/test_full_submission_validator.py): run a whole directory, assert
the message/verdict allocation per file, re-run semantics."""

import shutil
from pathlib import Path

import pandas as pd
import pyarrow.dataset as pads
import pytest

from hepdata_validator_ray.checks.base import CheckContext
from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine
from hepdata_validator_ray.synth import (
    ensure_sequences_parquet,
    expected_violation_doc_rows,
    generate_sequences_table,
)

N = 2000
OUT = Path("/tmp/hvr_out/pytest")


@pytest.fixture(scope="module")
def synth_path():
    return ensure_sequences_parquet("/root/testdata/sf0.001", n_files=4)


@pytest.fixture(scope="module")
def result(synth_path):
    out = OUT / "e2e"
    shutil.rmtree(out, ignore_errors=True)
    eng = ValidationEngine(ValidationConfig(concurrency=2, chunk_files=2))
    return eng.validate(synth_path, output_dir=str(out)), out


def test_violation_counts_match_ground_truth(result):
    res, _ = result
    gt = expected_violation_doc_rows(N)
    expected = {k: len(v) for k, v in gt.items() if v}
    assert res.violation_counts == expected
    assert res.n_rows == N
    assert not res.valid


def test_violations_parquet_written_and_consistent(result):
    res, out = result
    vio = pads.dataset(out / "violations").to_table().to_pandas()
    gt = expected_violation_doc_rows(N)
    # row-check families: compare doc_id sets per check (order-insensitive;
    # the engine's deterministic order contract is by sort keys, not stream order)
    tbl = generate_sequences_table(N, seed=42)
    docs = tbl.column("doc_id").to_pylist()
    for check, rows in gt.items():
        if not rows:
            continue
        got_docs = set(vio[vio.check_name == check].doc_id.dropna())
        exp_docs = {docs[i] for i in rows if docs[i] is not None}
        assert got_docs == exp_docs, check


def test_verdicts_per_partition(result):
    res, _ = result
    v = res.verdicts
    assert set(v.columns) == {"partition_id", "check_name", "passed", "n_rows", "n_violations", "detail"}
    # 4 files × (11 row checks incl. column_type + 1 partition-level
    # padding-limit check)
    assert len(v) == 48
    assert v.groupby("partition_id").n_rows.first().sum() == N
    # every check with ground-truth violations fails in at least one partition;
    # the padding-limit check passes (1 all-padding row per file ≤ limit 1)
    failed_checks = set(v[~v.passed].check_name)
    gt = expected_violation_doc_rows(N)
    assert {k for k, r in gt.items() if r and k != "doc_id_duplicates"} == failed_checks
    assert v[v.check_name == "partition_padding_limit"].passed.all()


def test_sketch_summary(result):
    res, _ = result
    sk = res.sketch
    assert sk is not None
    assert sk.n_rows == N
    est = sk.hll_doc_id.estimate()
    assert abs(est - N) / N < 0.05
    assert sum(sk.source_freq.counts.values()) == N
    assert sk.unigram is not None and sk.unigram.total > 0


def test_manifest_lineage(result):
    res, out = result
    manifest = (out / "manifest.jsonl").read_text().strip().splitlines()
    import json

    entries = [json.loads(l) for l in manifest]
    chunks = [e for e in entries if e["type"] == "chunk"]
    assert len(chunks) == 2  # 4 files, chunk_files=2
    assert sum(c["n_rows"] for c in chunks) == N
    assert all("rows_per_s" in c and "files" in c and "bundle_b64" in c for c in chunks)
    assert any(e["type"] == "dup_pass" for e in entries)


def test_resume_skips_completed_and_is_identical(result, synth_path):
    res_first, out = result
    # re-run over the same output dir: every chunk + dup pass replayed from
    # the manifest, results identical (reference re-runs from scratch;
    # full_submission_validator.py:62-68 — this is the scale upgrade)
    eng = ValidationEngine(ValidationConfig(concurrency=2, chunk_files=2))
    res_again = eng.validate(synth_path, output_dir=str(out))
    assert res_again.violation_counts == res_first.violation_counts
    assert res_again.n_rows == res_first.n_rows
    # manifest unchanged: no new chunk entries
    manifest = (out / "manifest.jsonl").read_text().strip().splitlines()
    import json

    chunks = [json.loads(l) for l in manifest if json.loads(l)["type"] == "chunk"]
    assert len(chunks) == 2


def test_resume_after_partial_run(synth_path):
    """Kill-after-chunk-1 simulation: run with a failure injected after the
    first chunk, then resume; the final result must equal a clean run."""
    out = OUT / "resume"
    shutil.rmtree(out, ignore_errors=True)
    eng = ValidationEngine(ValidationConfig(concurrency=2, chunk_files=2))

    orig = eng._run_chunk
    calls = {"n": 0}

    def failing(files, ci, out_dir):
        if calls["n"] >= 1:
            raise RuntimeError("simulated node loss")
        calls["n"] += 1
        return orig(files, ci, out_dir)

    eng._run_chunk = failing
    with pytest.raises(RuntimeError):
        eng.validate(synth_path, output_dir=str(out))

    # fresh engine resumes from the manifest
    eng2 = ValidationEngine(ValidationConfig(concurrency=2, chunk_files=2))
    res = eng2.validate(synth_path, output_dir=str(out))
    gt = expected_violation_doc_rows(N)
    assert res.violation_counts == {k: len(v) for k, v in gt.items() if v}
    assert res.n_rows == N


def test_clean_data_is_valid():
    p = ensure_sequences_parquet("/root/testdata/sf0.001", n_files=2, inject=False, n_rows=500)
    eng = ValidationEngine(ValidationConfig(concurrency=2, enable_unigram=False))
    res = eng.validate(p)
    assert res.valid
    assert res.n_rows == 500
    assert res.violation_counts == {}


def test_drift_detection(synth_path):
    # profile from the injected data itself → no drift; profile from a
    # shifted distribution → drift flagged on every partition
    eng = ValidationEngine(ValidationConfig(concurrency=2, enable_unigram=False, dup_check=False))
    base = eng.validate(synth_path)
    profile = base.sketch.to_bytes()

    eng_same = ValidationEngine(
        ValidationConfig(concurrency=2, enable_unigram=False, dup_check=False, drift_profile_bytes=profile)
    )
    res_same = eng_same.validate(synth_path)
    drift_rows = res_same.verdicts[res_same.verdicts.check_name == "drift_n_tok"]
    assert len(drift_rows) == 4
    assert drift_rows.passed.all()

    # shifted profile: much longer sequences
    shifted = generate_sequences_table(2000, seed=9, inject=False, mean_len=1500)
    from hepdata_validator_ray.checks.row_checks import prepare_view
    from hepdata_validator_ray.sketches import SketchBundle

    b = SketchBundle()
    view = prepare_view(shifted)
    b.n_tok_hist.add(view["n_tok"])
    b.n_rows = 2000
    eng_shift = ValidationEngine(
        ValidationConfig(
            concurrency=2, enable_unigram=False, dup_check=False, drift_profile_bytes=b.to_bytes()
        )
    )
    res_shift = eng_shift.validate(synth_path)
    drift_rows = res_shift.verdicts[res_shift.verdicts.check_name == "drift_n_tok"]
    assert (~drift_rows.passed).all()
    # failed drift verdicts count as violations: valid, summary() and
    # valid_partitions() agree (round-1 ADVICE consistency fix)
    assert res_shift.violation_counts.get("drift_n_tok", 0) == len(drift_rows)
    assert not res_shift.valid


def test_drift_source_mix_and_per_check_thresholds(synth_path):
    """Source-mix drift: a profile with a skewed source distribution flags
    every partition; a per-check threshold override silences exactly that
    check (registered-check drift scoring with per-check thresholds)."""
    from hepdata_validator_ray.sketches import SketchBundle

    eng = ValidationEngine(ValidationConfig(concurrency=2, enable_unigram=False, dup_check=False))
    base = eng.validate(synth_path)

    skewed = SketchBundle()
    skewed.n_tok_hist = base.sketch.n_tok_hist  # n_tok matches → no n_tok drift
    skewed.source_freq.counts = {"web": 1_000_000}  # wildly different mix
    skewed.n_rows = base.sketch.n_rows

    eng2 = ValidationEngine(
        ValidationConfig(concurrency=2, enable_unigram=False, dup_check=False, drift_profile_bytes=skewed.to_bytes())
    )
    res = eng2.validate(synth_path)
    mix = res.verdicts[res.verdicts.check_name == "drift_source_mix"]
    assert len(mix) == 4 and (~mix.passed).all()
    assert res.violation_counts.get("drift_source_mix", 0) == 4
    ntok = res.verdicts[res.verdicts.check_name == "drift_n_tok"]
    assert ntok.passed.all()

    eng3 = ValidationEngine(
        ValidationConfig(
            concurrency=2, enable_unigram=False, dup_check=False,
            drift_profile_bytes=skewed.to_bytes(),
            drift_thresholds={"drift_source_mix": 1e9},
        )
    )
    res3 = eng3.validate(synth_path)
    mix3 = res3.verdicts[res3.verdicts.check_name == "drift_source_mix"]
    assert mix3.passed.all()


def test_corrupt_file_becomes_violation(tmp_path):
    """Parse errors become violations, not crashes (reference
    data_file_validator.py:99-114 'There was a problem parsing the file')."""
    import pyarrow.parquet as pq

    from hepdata_validator_ray.synth import generate_sequences_table

    good = tmp_path / "good.parquet"
    pq.write_table(generate_sequences_table(100, seed=3, inject=False), good)
    bad = tmp_path / "bad.parquet"
    bad.write_bytes(b"this is not a parquet file")

    eng = ValidationEngine(ValidationConfig(enable_sketches=False, dup_check=False))
    res = eng.validate(str(tmp_path))
    assert not res.valid
    assert res.violation_counts == {"partition_readable": 1}
    assert res.n_rows == 100
    vrow = res.verdicts[res.verdicts.check_name == "partition_readable"]
    assert len(vrow) == 1 and not vrow.passed.iloc[0]


def test_expected_files_linkage(tmp_path):
    """J1/J2 manifest linkage: unreferenced + missing file checks
    (full_submission_validator.py:200-316)."""
    import pyarrow.parquet as pq

    from hepdata_validator_ray.synth import generate_sequences_table

    present = tmp_path / "a.parquet"
    pq.write_table(generate_sequences_table(50, seed=5, inject=False), present)
    extra = tmp_path / "extra.parquet"
    pq.write_table(generate_sequences_table(10, seed=6, inject=False), extra)
    missing = str(tmp_path / "gone.parquet")

    eng = ValidationEngine(
        ValidationConfig(
            enable_sketches=False,
            dup_check=False,
            expected_files=[str(present), missing],
        )
    )
    res = eng.validate(str(tmp_path))
    assert res.violation_counts["partition_referenced"] == 1
    assert res.violation_counts["partition_present"] == 1
    v = res.verdicts
    ref = v[v.check_name == "partition_referenced"]
    assert ref.detail.iloc[0] == "extra.parquet is not referenced in the submission."
    mis = v[v.check_name == "partition_present"]
    assert mis.detail.iloc[0] == "Missing data_file 'gone.parquet'."


def test_row_idx_deterministic_and_ordering(result):
    """Inline reader emits file-absolute row_idx: 'doc-…-NNNNNNNN' encodes
    the global index, so row_idx == global_idx % rows_per_file (500 here);
    load_violations(sort=True) applies the deterministic ordering contract."""
    res, _ = result
    tbl = res.load_violations(sort=True)
    assert tbl is not None and tbl.num_rows > 0
    df = tbl.to_pandas()
    rows_per_file = 500
    checkable = df[df.doc_id.notna() & df.doc_id.str.match(r"doc-[a-z0-9]+-\d{8}$")]
    import re

    for _, r in checkable.head(50).iterrows():
        gidx = int(re.search(r"(\d{8})$", r.doc_id).group(1))
        if r.check_name == "doc_id_duplicates" or r.doc_id.startswith("doc-dup-"):
            continue  # dup ids encode the class, not the row
        assert r.row_idx == gidx % rows_per_file, (r.doc_id, r.row_idx)
    # sorted by (partition_id, row_idx, check_name)
    key = list(zip(df.partition_id, df.row_idx, df.check_name))
    assert key == sorted(key)


def test_result_helpers(result):
    res, _ = result
    ok = res.valid_partitions()
    assert ok == []  # every partition has some violation in the injected set
    assert res.drift_profile_bytes() is not None
    worst = res.worst_partitions(2)
    assert len(worst) == 2
    assert worst.n_violations.iloc[0] >= worst.n_violations.iloc[1]
    # top-1 matches a full manual aggregation
    manual = res.verdicts.groupby("partition_id").n_violations.sum()
    assert worst.n_violations.iloc[0] == manual.max()


def test_appledouble_files_hinted(tmp_path):
    """'._<file>' companions next to a real file: excluded from validation,
    flagged unreferenced + the reference's MacOS-tar hint
    (full_submission_validator.py:202-228)."""
    import pyarrow.parquet as pq

    from hepdata_validator_ray.synth import generate_sequences_table

    pq.write_table(generate_sequences_table(100, seed=8, inject=False), tmp_path / "data.parquet")
    (tmp_path / "._data.parquet").write_bytes(b"\x00\x05\x16\x07 apple double junk")

    eng = ValidationEngine(ValidationConfig(enable_sketches=False, dup_check=False))
    res = eng.validate(str(tmp_path))
    assert res.n_rows == 100  # the companion was not read as data
    assert res.violation_counts.get("partition_readable") is None
    assert res.violation_counts["partition_referenced"] == 1
    hint = res.verdicts[res.verdicts.check_name == "appledouble_hint"]
    assert len(hint) == 1
    assert hint.detail.iloc[0] == (
        "._data.parquet might be a file created by tar on MacOS. "
        "Set COPYFILE_DISABLE=1 before creating the archive."
    )


def test_verdicts_parquet_written(result):
    import pyarrow.parquet as pq

    _, out = result
    t = pq.read_table(out / "verdicts" / "verdicts.parquet")
    assert t.num_rows == 48
    assert set(t.column_names) == {"partition_id", "check_name", "passed", "n_rows", "n_violations", "detail"}


def test_validate_dataset_mid_pipeline(synth_path):
    """validate_dataset: the engine composes with an upstream Ray Data
    transform (validate AFTER a map_batches, no files involved)."""
    import pyarrow as pa
    import ray.data

    ds = ray.data.read_parquet(synth_path)
    # an upstream transform: clamp n_tok to non-negative (fixes one family)
    def clamp(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        fixed = pc.max_element_wise(t["n_tok"], 0)
        return t.set_column(t.column_names.index("n_tok"), "n_tok", fixed)

    eng = ValidationEngine(ValidationConfig(enable_sketches=False, dup_check=False))
    res = eng.validate_dataset(ds.map_batches(clamp, batch_format="pyarrow"))
    gt = expected_violation_doc_rows(N)
    assert "n_tok_non_negative" not in res.violation_counts
    # clamped rows now have n_tok=0 != len → still consistency violations
    assert res.violation_counts["token_length_consistency"] == len(gt["token_length_consistency"])
    assert res.n_rows == N


def test_incremental_ingest(tmp_path):
    """File-granular resume: adding files between runs revalidates ONLY the
    new files (plus the cheap doc_id-column dup re-shuffle)."""
    import json

    import pyarrow.parquet as pq

    from hepdata_validator_ray.synth import generate_sequences_table

    data = tmp_path / "data"
    data.mkdir()
    for i in range(2):
        pq.write_table(generate_sequences_table(300, seed=55, inject=False, row_offset=i * 300), data / f"f{i}.parquet")
    out = tmp_path / "out"
    cfg = ValidationConfig(chunk_files=2, enable_unigram=False)
    res1 = ValidationEngine(cfg).validate(str(data), output_dir=str(out))
    assert res1.n_rows == 600

    # new file arrives, sorting FIRST in the listing (worst case for
    # positional chunking)
    pq.write_table(generate_sequences_table(200, seed=55, inject=False, row_offset=600), data / "a_new.parquet")
    res2 = ValidationEngine(cfg).validate(str(data), output_dir=str(out))
    assert res2.n_rows == 800

    entries = [json.loads(l) for l in (out / "manifest.jsonl").read_text().splitlines()]
    chunk_entries = [e for e in entries if e["type"] == "chunk"]
    # run 1: one chunk (2 files); run 2: one new chunk with ONLY the new file
    assert len(chunk_entries) == 2
    assert chunk_entries[1]["files"] == [str(tmp_path / "data" / "a_new.parquet")]
    # dup pass re-ran for the new file set
    dup_entries = [e for e in entries if e["type"] == "dup_pass"]
    assert len(dup_entries) == 2


def test_resume_preserves_sketch(synth_path):
    out = OUT / "resume"  # left behind by test_resume_after_partial_run
    eng = ValidationEngine(ValidationConfig(concurrency=2, chunk_files=2))
    res = eng.validate(synth_path, output_dir=str(out))
    assert res.sketch is not None and res.sketch.n_rows == N


def test_classic_plan_and_actor_pool_match_inline(synth_path):
    """The classic read_parquet→map_batches plan (inline_read=False), with
    and without an explicit actor pool, must produce identical violation
    counts to the default inline plan."""
    gt = expected_violation_doc_rows(N)
    expected = {k: len(v) for k, v in gt.items() if v and k != "doc_id_duplicates"}

    classic_tasks = ValidationEngine(
        ValidationConfig(inline_read=False, enable_sketches=False, dup_check=False)
    ).validate(synth_path)
    assert classic_tasks.violation_counts == expected

    classic_actors = ValidationEngine(
        ValidationConfig(inline_read=False, concurrency=2, enable_sketches=False, dup_check=False)
    ).validate(synth_path)
    assert classic_actors.violation_counts == expected


def test_bucketed_unigram_drift(synth_path):
    """The 10^12-scale path: unigram histograms bucketed to 1024 bins
    (token_id % buckets) must still detect a skewed token distribution."""
    import numpy as np
    import pyarrow as pa

    from hepdata_validator_ray.checks.row_checks import prepare_view
    from hepdata_validator_ray.sketches import SketchBundle, UnigramHistogram, kl_divergence

    buckets = 1024
    eng = ValidationEngine(
        ValidationConfig(concurrency=None, dup_check=False, unigram_buckets=buckets)
    )
    base = eng.validate(synth_path)
    assert base.sketch.unigram.n_buckets == buckets

    # skewed corpus: token ids concentrated in [5, 50) — different unigram shape
    skew = generate_sequences_table(1000, seed=31, inject=False)
    view = prepare_view(skew)
    u = UnigramHistogram(vocab_size=50257, n_buckets=buckets)
    u.add(view["flat"] % 45 + 5)
    kl = kl_divergence(u.normalized(), base.sketch.unigram.normalized())
    assert kl > 1.0  # clearly detected even after bucketing

    # same-distribution corpus: low divergence
    same = generate_sequences_table(1000, seed=32, inject=False)
    u2 = UnigramHistogram(vocab_size=50257, n_buckets=buckets)
    u2.add(prepare_view(same)["flat"])
    assert kl_divergence(u2.normalized(), base.sketch.unigram.normalized()) < 0.1


def test_suppression_semantics(synth_path):
    """suppress_semantic_on_schema_error=True drops semantic violations for
    rows that already failed a schema check (reference
    data_file_validator.py:143-152 skips semantic checks on schema errors)."""
    ctx = CheckContext(suppress_semantic_on_schema_error=True)
    eng = ValidationEngine(
        ValidationConfig(ctx=ctx, concurrency=2, enable_sketches=False, dup_check=False)
    )
    res = eng.validate(synth_path)
    # semantic violations are suppressed for any row that failed a schema
    # check (e.g. n_tok=-1 rows fail schema-level n_tok_non_negative)
    gt = expected_violation_doc_rows(N)
    schema_rows = (
        gt["doc_id_non_null"]
        | gt["doc_id_format"]
        | gt["source_membership"]
        | gt["n_tok_non_negative"]
        | gt["token_id_range"]
    )
    expected_consistency = len(gt["token_length_consistency"] - schema_rows)
    assert res.violation_counts["token_length_consistency"] == expected_consistency
    assert expected_consistency < len(gt["token_length_consistency"])


def test_missing_required_column_reported_not_crashed(tmp_path):
    """A file lacking a suite column yields the reference's jsonschema
    `required` violation ("'source' is a required property") and the
    remaining checks still run — never a KeyError crash (pyarrow silently
    drops absent columns from projection)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = generate_sequences_table(300, seed=21)
    tbl = tbl.drop_columns(["source"])
    pq.write_table(tbl, tmp_path / "nosrc.parquet")

    eng = ValidationEngine(ValidationConfig(enable_sketches=False, dup_check=False))
    res = eng.validate(str(tmp_path))
    assert not res.valid
    assert res.violation_counts.get("required_columns") == 1
    vio = res.verdicts  # other checks still produced verdicts
    assert (vio.check_name == "doc_id_format").any()
    # and the byte-exact required-property message appears in violations
    out = tmp_path / "out"
    res2 = eng.validate(str(tmp_path), output_dir=str(out))
    v = res2.load_violations().to_pandas()
    assert "'source' is a required property" in set(v.detail)


def test_skipped_checks_not_reported_passed(tmp_path):
    """Checks that could not run (missing required column) must NOT show
    passed=True in the verdict table; the partition gets a required_columns
    verdict naming the column (round-2 review finding)."""
    import pyarrow.parquet as pq

    tbl = generate_sequences_table(200, seed=23).drop_columns(["source"])
    pq.write_table(tbl, tmp_path / "nosrc.parquet")
    eng = ValidationEngine(ValidationConfig(enable_sketches=False, dup_check=False))
    res = eng.validate(str(tmp_path))
    v = res.verdicts
    sm = v[v.check_name == "source_membership"]
    assert len(sm) == 1 and not sm.passed.iloc[0]
    assert sm.detail.iloc[0] == "not run: missing required column"
    req = v[v.check_name == "required_columns"]
    assert len(req) == 1 and not req.passed.iloc[0]
    assert "source" in req.detail.iloc[0]
    # checks not touching 'source' still ran and their verdicts are real
    assert v[v.check_name == "token_length_consistency"].n_violations.iloc[0] > 0


def test_high_dup_rate_distributed_violation_emit(tmp_path):
    """Adversarial dup rate (25% of rows duplicated): the dup pass must emit
    violations via the distributed writer and record only COUNTS in the
    manifest — the driver never holds the dup list (round-3 verdict #1)."""
    import json

    import pyarrow.parquet as pq

    data = tmp_path / "data"
    data.mkdir()
    # rows 0..799 and 600..1399 — 200 overlapping global indices → 200 dup
    # classes × 2 members = 400 dup rows out of 1600 (25%)
    pq.write_table(generate_sequences_table(800, seed=7, inject=False, row_offset=0), data / "a.parquet")
    pq.write_table(generate_sequences_table(800, seed=7, inject=False, row_offset=600), data / "b.parquet")
    out = tmp_path / "out"
    eng = ValidationEngine(ValidationConfig(enable_sketches=False))
    res = eng.validate(str(data), output_dir=str(out))
    assert res.violation_counts["doc_id_duplicates"] == 400

    # distributed sink: a DIRECTORY of parquet (write_parquet), one row per class
    ddir = out / "violations" / "duplicates"
    vio = pads.dataset(str(ddir)).to_table().to_pandas()
    assert len(vio) == 200
    assert (vio.check_name == "doc_id_duplicates").all()
    assert vio.detail.str.startswith("Duplicate").all()

    # manifest carries counts + path only — never the dup list
    entries = [json.loads(l) for l in (out / "manifest.jsonl").read_text().splitlines()]
    dup_entries = [e for e in entries if e["type"] == "dup_pass"]
    assert len(dup_entries) == 1
    e = dup_entries[0]
    assert e["n_duplicate_ids"] == 200 and e["n_dup_rows"] == 400
    assert "dups" not in e
    assert e["dups_path"] == str(ddir)

    # resume reuses the manifest counts: identical result, no new dup_pass entry
    res2 = ValidationEngine(ValidationConfig(enable_sketches=False)).validate(str(data), output_dir=str(out))
    assert res2.violation_counts["doc_id_duplicates"] == 400
    entries2 = [json.loads(l) for l in (out / "manifest.jsonl").read_text().splitlines()]
    assert len([e for e in entries2 if e["type"] == "dup_pass"]) == 1
