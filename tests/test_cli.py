"""CLI subprocess tests — the reference's test_cli.py analogue (golden
verdict lines + exit codes)."""

import subprocess
import sys

from hepdata_validator_ray.synth import ensure_sequences_parquet

SF = "/root/testdata/sf0.001"


def _run(args):
    return subprocess.run(
        [sys.executable, "-m", "hepdata_validator_ray.cli", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )


def test_validate_invalid_exit_1():
    p = ensure_sequences_parquet(SF, n_files=4)
    r = _run(["validate", p, "--no-unigram"])
    assert r.returncode == 1
    assert f"{p} is invalid." in r.stdout
    assert "token_length_consistency" in r.stdout


def test_validate_clean_exit_0():
    p = ensure_sequences_parquet(SF, n_files=2, inject=False, n_rows=300)
    r = _run(["validate", p, "--no-unigram"])
    assert r.returncode == 0
    assert f"{p} is valid." in r.stdout
    assert "Validation successful." in r.stdout


def test_synth_subcommand(tmp_path):
    r = _run(["synth", SF, "--rows", "100", "--files", "1"])
    assert r.returncode == 0
    assert "sequences" in r.stdout
