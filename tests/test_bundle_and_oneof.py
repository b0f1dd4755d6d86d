"""Single-bundle split path (≙ single-YAML submissions) and compound one_of
checks with best-in-context error selection (≙ jsonschema by_relevance)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from hepdata_validator_ray.checks.base import Check, CheckContext, CheckSuite
from hepdata_validator_ray.checks.row_checks import (
    DEFAULT_ROW_CHECKS,
    any_of,
    check_doc_id_format,
    check_tokens_not_empty,
    one_of,
    prepare_view,
    select_best_error,
)
from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine
from hepdata_validator_ray.synth import ensure_bundle_parquet


def test_validate_bundle_per_table_verdicts(tmp_path):
    bundle = ensure_bundle_parquet("/root/testdata/sf0.001")
    eng = ValidationEngine(ValidationConfig(enable_sketches=False))
    res = eng.validate_bundle(bundle, table_column="table")
    # partition identity = <bundle>#<table>, one verdict set per logical table
    parts = sorted(res.verdicts.partition_id.unique())
    assert parts == [f"bundle.parquet#tbl{i}" for i in range(4)]
    # per-table routing conserves rows
    assert res.n_rows == 2000
    # injected violations surface (same families as the multi-file layout)
    assert res.violation_counts.get("source_membership", 0) > 0
    assert res.violation_counts.get("doc_id_duplicates", 0) > 0
    assert not res.valid


def test_validate_bundle_split_write(tmp_path):
    bundle = ensure_bundle_parquet("/root/testdata/sf0.001")
    split = tmp_path / "split"
    eng = ValidationEngine(ValidationConfig(enable_sketches=False, dup_check=False))
    eng.validate_bundle(bundle, table_column="table", split_dir=str(split))
    # ≙ the reference writing per-table data files: table=<name>/ dirs
    subdirs = sorted(d.name for d in split.iterdir() if d.is_dir())
    assert subdirs == [f"table=tbl{i}" for i in range(4)]
    total = sum(pq.read_table(str(d)).num_rows for d in split.iterdir())
    assert total == 2000


def _check_by_name(name: str):
    return next(c for c in DEFAULT_ROW_CHECKS if c.name == name)


def _mini_batch():
    return pa.table(
        {
            "doc_id": ["doc-web-00000001", "BAD FORMAT ID", None],
            "tokens": pa.array([[1, 2], [], []], type=pa.list_(pa.int32())),
            "n_tok": pa.array([2, 0, 0], type=pa.int32()),
            "source": ["web", "web", "web"],
        }
    )


def test_any_of_reports_single_best_error():
    """A row failing every branch of an any_of reports exactly ONE violation,
    chosen by relevance (deeper column path wins) — by_relevance semantics
    (__init__.py:116-121)."""
    comp = any_of("id_or_nonempty", [
        _check_by_name("doc_id_format"),  # columns=('doc_id',)
        Check("tokens_not_empty", check_tokens_not_empty, kind="semantic", columns=("tokens", "n_tok")),
    ])
    ctx = CheckContext()
    view = prepare_view(_mini_batch())
    res = comp.fn(view, ctx)
    # row 0 passes both; row 1 fails both -> ONE report; row 2 fails only
    # the empty-check (null doc_id not flagged by format check) -> passes
    assert res.indices.tolist() == [1]
    # best = deeper path: tokens_not_empty has 2 columns vs doc_id_format's 1
    assert res.details == ["tokens cannot be empty"] or "empty" in res.details[0]


def test_one_of_is_strict_xor():
    """Strict oneOf (≙ data_schema.json value-XOR-bin): a row valid under
    BOTH branches fails with the 'is valid under each of' error; a row valid
    under exactly one passes; a row valid under none gets the best
    sub-error."""
    comp = one_of("id_xor_nonempty", [
        _check_by_name("doc_id_format"),
        Check("tokens_not_empty", check_tokens_not_empty, kind="semantic", columns=("tokens", "n_tok")),
    ])
    ctx = CheckContext()
    view = prepare_view(_mini_batch())
    res = comp.fn(view, ctx)
    got = dict(zip(res.indices.tolist(), res.details))
    # row 0 passes both -> XOR failure naming both branches
    assert got[0] == "is valid under each of doc_id_format, tokens_not_empty"
    # row 1 fails both -> best-in-context sub-error
    assert 1 in got and "valid under each" not in got[1]
    # row 2 passes exactly one branch (format check ignores null doc_id) -> ok
    assert 2 not in got


def test_select_best_error_ranking():
    deep = Check("deep", lambda v, c: None, kind="semantic", columns=("a", "b"))
    shallow = Check("shallow", lambda v, c: None, kind="schema", columns=("a",))
    weak = Check("weak", lambda v, c: None, kind="one_of", columns=("a", "b", "c"))
    # weak kinds always rank last, then deepest column path, then order
    assert select_best_error([(weak, "w"), (shallow, "s"), (deep, "d")]) == "d"
    assert select_best_error([(weak, "w"), (shallow, "s")]) == "s"
    assert select_best_error([(shallow, "s1"), (Check("s2", None, columns=("a",)), "s2")]) == "s1"


def test_compound_in_suite_via_engine():
    """Compound checks integrate with CheckStage: violations carry the
    compound name."""
    import ray.data

    comp = any_of("id_or_nonempty", [
        _check_by_name("doc_id_format"),
        Check("tokens_not_empty", check_tokens_not_empty, kind="semantic", columns=("tokens", "n_tok")),
    ])
    suite = CheckSuite(name="compound_suite", checks=[comp])
    eng = ValidationEngine(ValidationConfig(suite=suite, enable_sketches=False, dup_check=False))
    res = eng.validate_dataset(ray.data.from_arrow(_mini_batch()))
    assert res.violation_counts == {"id_or_nonempty": 1}
