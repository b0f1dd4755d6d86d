"""Archive entry mode (S3/S4): .zip / .tar.gz / .parquet.gz inputs unpack to
a temp dir, validate identically to the unpacked directory, scrub the temp
path from every output, and clean up (reference
full_submission_validator.py:85-159, 231-249)."""

import gzip
import shutil
from pathlib import Path

import pyarrow.parquet as pq
import pytest

from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine
from hepdata_validator_ray.synth import generate_sequences_table


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("arch") / "data"
    d.mkdir()
    for i in range(2):
        pq.write_table(
            generate_sequences_table(600, seed=13, row_offset=i * 600), d / f"part-{i}.parquet"
        )
    return d


def _engine():
    return ValidationEngine(ValidationConfig(enable_sketches=False, dup_check=False))


def _names(verdicts):
    return verdicts.assign(partition_id=verdicts.partition_id.map(lambda s: Path(s).name))


@pytest.mark.parametrize("fmt,suffix", [("zip", ".zip"), ("gztar", ".tar.gz")])
def test_archive_matches_directory(dataset_dir, tmp_path, fmt, suffix):
    res_dir = _engine().validate(str(dataset_dir))
    archive = shutil.make_archive(str(tmp_path / "sub"), fmt, root_dir=dataset_dir)
    assert archive.endswith(suffix)
    res_arch = _engine().validate(archive)

    assert res_arch.violation_counts == res_dir.violation_counts
    assert res_arch.n_rows == res_dir.n_rows
    vd = _names(res_dir.verdicts).sort_values(["partition_id", "check_name"]).reset_index(drop=True)
    va = _names(res_arch.verdicts).sort_values(["partition_id", "check_name"]).reset_index(drop=True)
    assert vd.equals(va)
    # temp extraction dir never leaks into outputs
    assert not res_arch.verdicts.partition_id.str.contains("/tmp").any()
    assert res_arch.verdicts.partition_id.iloc[0] == Path(res_arch.verdicts.partition_id.iloc[0]).name


def test_archive_violations_written_scrubbed(dataset_dir, tmp_path):
    archive = shutil.make_archive(str(tmp_path / "sub"), "zip", root_dir=dataset_dir)
    out = tmp_path / "out"
    res = _engine().validate(archive, output_dir=str(out))
    vio = res.load_violations().to_pandas()
    assert len(vio) > 0
    assert not vio.partition_id.str.startswith("/").any()  # relative, scrubbed


def test_gzip_single_file(dataset_dir, tmp_path):
    src = next(dataset_dir.glob("*.parquet"))
    gz = tmp_path / (src.name + ".gz")
    with open(src, "rb") as fin, gzip.open(gz, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    res = _engine().validate(str(gz))
    ref = _engine().validate(str(src))
    assert res.n_rows == ref.n_rows == 600
    assert res.violation_counts == ref.violation_counts


def test_archive_error_paths(tmp_path):
    eng = _engine()
    # missing archive — byte-matches "File {archive} does not exist."
    res = eng.validate(str(tmp_path / "nope.zip"))
    assert not res.valid
    assert res.verdicts.detail.iloc[0] == f"File {tmp_path / 'nope.zip'} does not exist."
    # corrupt archive — "Unable to extract file {archive}. Error was: ..."
    bad = tmp_path / "bad.zip"
    bad.write_bytes(b"definitely not a zip")
    res = eng.validate(str(bad))
    assert not res.valid
    assert res.verdicts.detail.iloc[0].startswith(f"Unable to extract file {bad}. Error was: ")
    # archive without parquet content
    empty_dir = tmp_path / "empty"
    empty_dir.mkdir()
    (empty_dir / "readme.txt").write_text("nothing here")
    arch = shutil.make_archive(str(tmp_path / "empty_arch"), "zip", root_dir=empty_dir)
    res = eng.validate(arch)
    assert not res.valid
    assert res.verdicts.detail.iloc[0] == "No parquet files found in submission."


def test_archive_revalidation_same_output_resumes(dataset_dir, tmp_path):
    """Re-validating the same archive with the same output_dir must resume
    (manifest keys on archive-relative paths), not double-count: each run
    extracts to a fresh temp dir, so absolute-path lineage would both replay
    completed chunks AND re-validate every file."""
    archive = shutil.make_archive(str(tmp_path / "sub2"), "zip", root_dir=dataset_dir)
    out = tmp_path / "out2"
    r1 = _engine().validate(archive, output_dir=str(out))
    r2 = _engine().validate(archive, output_dir=str(out))
    assert r2.n_violations == r1.n_violations
    assert r2.violation_counts == r1.violation_counts
    assert r2.n_rows == r1.n_rows


def test_archive_appledouble_verdicts_scrubbed(dataset_dir, tmp_path):
    """AppleDouble companion files inside an archive surface with SCRUBBED
    partition ids (the driver-built verdict rows go through the same temp
    scrub as the mixed stream)."""
    d = tmp_path / "mac"
    shutil.copytree(dataset_dir, d)
    src = next(d.glob("*.parquet"))
    (d / ("._" + src.name)).write_bytes(b"\x00\x05\x16\x07junk")
    archive = shutil.make_archive(str(tmp_path / "mac_arch"), "zip", root_dir=d)
    res = _engine().validate(archive)
    apple = res.verdicts[res.verdicts.check_name == "appledouble_hint"]
    assert len(apple) == 1
    assert not apple.partition_id.str.contains("/tmp").any()
    assert apple.partition_id.iloc[0] == "._" + src.name
