"""Unit tests for the vectorized row-local checks against the synthetic
ground truth (two independent derivations of the violation sets — the check
kernels vs the closed-form injection arithmetic)."""

import numpy as np
import pyarrow as pa
import pytest

from hepdata_validator_ray.checks.base import CheckContext
from hepdata_validator_ray.checks.row_checks import (
    DEFAULT_ROW_CHECKS,
    build_default_suite,
    prepare_view,
)
from hepdata_validator_ray.synth import expected_violation_doc_rows, generate_sequences_table

#: checks active at the DEFAULT suite version — the ground-truth tables
#: model this suite (tokens_unique_items is a >=1.2.0 opt-in, covered in
#: test_round3.py)
ACTIVE_CHECKS = build_default_suite().checks

N = 2000


@pytest.fixture(scope="module")
def view():
    return prepare_view(generate_sequences_table(N, seed=42))


@pytest.fixture(scope="module")
def gt():
    return expected_violation_doc_rows(N)


@pytest.mark.parametrize("check", ACTIVE_CHECKS, ids=lambda c: c.name)
def test_check_matches_ground_truth(check, view, gt):
    res = check.fn(view, CheckContext())
    got = set(res.indices.tolist())
    assert got == gt.get(check.name, set())
    assert len(res.details) == len(res.indices)


def test_clean_table_passes_all():
    view = prepare_view(generate_sequences_table(500, seed=7, inject=False))
    ctx = CheckContext()
    for check in ACTIVE_CHECKS:
        assert len(check.fn(view, ctx).indices) == 0, check.name


def test_detail_strings_reference_grammar(view):
    ctx = CheckContext()
    by_name = {c.name: c for c in DEFAULT_ROW_CHECKS}
    res = by_name["source_membership"].fn(view, ctx)
    assert res.details[0] == (
        "'crawlz' is not one of ['web', 'books', 'code', 'wiki', 'news'] in 'source' "
        "(expected: {'enum': ['web', 'books', 'code', 'wiki', 'news']})"
    )
    res = by_name["doc_id_non_null"].fn(view, ctx)
    assert res.details[0] == "None is not of type 'string' in 'doc_id' (expected: {'type': 'string'})"
    res = by_name["n_tok_non_negative"].fn(view, ctx)
    assert res.details[0] == "-1 is less than the minimum of 0 in 'n_tok' (expected: {'minimum': 0})"


def test_version_gating():
    # mirrors the reference's schema_version gates (data_file_validator.py:141-142)
    names_v0 = {c.name for c in build_default_suite("0.1.0").checks}
    names_v111 = {c.name for c in build_default_suite("1.1.1").checks}
    assert "tokens_not_empty" not in names_v0
    assert "sequence_length_limit" not in names_v0
    assert "tokens_not_empty" in names_v111
    assert "token_length_consistency" in names_v0  # always-on semantic check
    names_v100 = {c.name for c in build_default_suite("1.0.0").checks}
    assert "tokens_not_all_zero" in names_v100
    assert "sequence_length_limit" not in names_v100


def test_required_columns_projection():
    suite = build_default_suite()
    cols = suite.required_columns()
    assert set(cols) == {"doc_id", "source", "n_tok", "tokens"}


def test_empty_batch():
    tbl = generate_sequences_table(5, seed=1).slice(0, 0)
    view = prepare_view(tbl)
    ctx = CheckContext()
    for check in ACTIVE_CHECKS:
        assert len(check.fn(view, ctx).indices) == 0


def test_sliced_batches_equal_full_table(gt):
    """map_batches can hand the stage SLICED tables; the zero-copy offsets
    path must stay correct under nonzero array offsets."""
    t = generate_sequences_table(N, seed=42)
    ctx = CheckContext()
    got = {c.name: set() for c in ACTIVE_CHECKS}
    for lo, n in [(0, 777), (777, 700), (1477, N - 1477)]:
        vs = prepare_view(t.slice(lo, n))
        for c in ACTIVE_CHECKS:
            got[c.name] |= {lo + i for i in c.fn(vs, ctx).indices.tolist()}
    for c in ACTIVE_CHECKS:
        assert got[c.name] == gt.get(c.name, set()), c.name


def test_nulls_in_every_column():
    tbl = pa.table(
        {
            "doc_id": pa.array([None, "doc-web-00000001"], type=pa.string()),
            "tokens": pa.array([None, [1, 2]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([None, 2], type=pa.int32()),
            "source": pa.array([None, "web"], type=pa.string()),
        }
    )
    view = prepare_view(tbl)
    ctx = CheckContext()
    by_name = {c.name: c for c in DEFAULT_ROW_CHECKS}
    assert by_name["doc_id_non_null"].fn(view, ctx).indices.tolist() == [0]
    assert by_name["source_membership"].fn(view, ctx).indices.tolist() == [0]
    # null tokens / n_tok don't crash length consistency; row 1 is consistent
    assert by_name["token_length_consistency"].fn(view, ctx).indices.tolist() == []
