"""Fault-tolerance contract tests — the 100-TB design leans on Ray's
task retry: a died worker (system failure) is retried by default, and
transient UDF errors are retried when the stage opts in via
``retry_exceptions=True``.  Both must converge to
the same result as a clean run."""
import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _expected() -> pd.DataFrame:
    return (
        pd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "n_chars"]
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_worker_death_retried_by_default(ray_session, tmp_path):
    """One task hard-kills its worker process on first attempt; Ray
    re-executes it elsewhere and the result is exact."""
    marker = str(tmp_path / "died_once")

    def flaky(t: pa.Table) -> pa.Table:
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            os._exit(1)  # simulated machine/worker loss — a SYSTEM failure
        except FileExistsError:
            pass
        import pyarrow.compute as _pc

        return t.set_column(
            t.schema.get_field_index("n_chars"), "n_chars", _pc.add(t["n_chars"], 1)
        )

    got = (
        ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "n_chars"]
        )
        .map_batches(flaky, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert os.path.exists(marker)  # the kill really happened
    exp = _expected()
    assert len(got) == len(exp)
    assert (got["n_chars"].to_numpy() == exp["n_chars"].to_numpy() + 1).all()


def test_transient_udf_error_retried_on_opt_in(ray_session, tmp_path):
    """An application exception is NOT retried by default; a stage doing
    flaky I/O opts in with retry_exceptions=True and converges."""
    marker = str(tmp_path / "raised_once")

    def flaky(t: pa.Table) -> pa.Table:
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            raise RuntimeError("injected transient failure (first attempt only)")
        except FileExistsError:
            pass
        import pyarrow.compute as _pc

        return t.set_column(
            t.schema.get_field_index("n_chars"), "n_chars", _pc.add(t["n_chars"], 1)
        )

    got = (
        ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "n_chars"]
        )
        .map_batches(flaky, batch_format="pyarrow", retry_exceptions=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert os.path.exists(marker)
    exp = _expected()
    assert len(got) == len(exp)
    assert (got["n_chars"].to_numpy() == exp["n_chars"].to_numpy() + 1).all()


def test_resume_staleness_detection(tmp_path, ray_session):
    """A completed input file that CHANGES under the checkpoint raises
    StaleCheckpointError on resume (metadata fingerprints); an untouched
    resume replays from the manifest and matches the fresh result."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from hepdata_validator_ray.engine import (
        StaleCheckpointError,
        ValidationConfig,
        ValidationEngine,
    )
    from hepdata_validator_ray.synth import ensure_sequences_parquet

    src = ensure_sequences_parquet("/root/testdata/sf0.001")
    import glob
    import shutil

    d = tmp_path / "seqs"
    d.mkdir()
    for f in sorted(glob.glob(src + "/*.parquet"))[:3]:
        shutil.copy(f, d)
    out = tmp_path / "out"
    eng = ValidationEngine(ValidationConfig(chunk_files=2))
    r1 = eng.validate(str(d), output_dir=str(out))

    # untouched resume: completed chunks replay, same totals
    r2 = ValidationEngine(ValidationConfig(chunk_files=2)).validate(str(d), output_dir=str(out))
    assert (r2.n_rows, r2.n_violations) == (r1.n_rows, r1.n_violations)

    # mutate one completed file -> resume must refuse
    victim = sorted(d.glob("*.parquet"))[0]
    t = pq.read_table(victim)
    pq.write_table(t.slice(0, t.num_rows - 1), victim)
    with pytest.raises(StaleCheckpointError, match="fingerprint"):
        ValidationEngine(ValidationConfig(chunk_files=2)).validate(str(d), output_dir=str(out))
