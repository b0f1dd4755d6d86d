"""Vectorized row-local checks over Arrow batches of tokenized sequences.

Each check consumes a *prepared batch view* (numpy/Arrow views computed once
per batch by the stage — see ``prepare_view``) and returns the violating row
positions plus byte-exact detail strings in the reference message grammar.
Hot path is fully vectorized (pyarrow.compute / numpy); Python touches only
the violating rows (rare) to format messages.

Reference analogues per check are cited inline; the overall taxonomy follows
SURVEY.md §2.2 (P1-P10) and §2.5 (A2).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from hepdata_validator_ray import messages as M
from hepdata_validator_ray.checks.base import Check, CheckContext, CheckResult, CheckSuite

_EMPTY = CheckResult(np.empty(0, dtype=np.int64), [])


def _is_stringish(t: pa.DataType) -> bool:
    return pa.types.is_string(t) or pa.types.is_large_string(t)


def _is_int_list(t: pa.DataType) -> bool:
    return (pa.types.is_list(t) or pa.types.is_large_list(t)) and pa.types.is_integer(t.value_type)


#: expected Arrow type family per contract column: (predicate, canonical
#: type to coerce benign encodings into, jsonschema 'type' word).  A column
#: failing its predicate is EXCLUDED from the view (its kernels would crash
#: on the wrong physical type) and every row reports a `column_type` schema
#: violation — a validator must turn a drifted shard into violation rows,
#: never into an aborted job.
_COLUMN_TYPE_SPECS: dict = {
    "doc_id": (_is_stringish, pa.string(), "string"),
    "tokens": (_is_int_list, pa.list_(pa.int64()), "array of integers"),
    "n_tok": (pa.types.is_integer, pa.int64(), "integer"),
    "source": (_is_stringish, pa.string(), "string"),
}


def _coerce_column(col: pa.Array, canonical: pa.DataType) -> pa.Array | None:
    """Losslessly normalize benign physical encodings (dictionary-encoded
    strings, all-null untyped columns) to the canonical type; None when the
    column is genuinely wrong-typed."""
    t = col.type
    if pa.types.is_null(t) or (pa.types.is_dictionary(t) and not pa.types.is_dictionary(canonical)):
        try:
            return col.cast(canonical)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return None
    return None


def prepare_view(batch: pa.Table) -> dict:
    """Compute shared per-batch views once: flattened token buffer, offsets,
    list lengths, numpy casts.  All zero-copy or O(batch) numpy ops.

    Contract columns with the wrong physical type are diverted into
    ``view["wrong_type"]`` (column → actual type string) instead of being
    built — the ``column_type`` check turns them into per-row violations
    and the stage skips every kernel that needs them."""
    batch = batch.combine_chunks()
    view: dict = {"n": batch.num_rows, "batch": batch}

    wrong: dict[str, str] = {}
    coerced: dict[str, pa.Array] = {}
    for col_name, (pred, canonical, _expected) in _COLUMN_TYPE_SPECS.items():
        if col_name not in batch.column_names:
            continue
        col = batch.column(col_name)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pred(col.type):
            continue
        fixed = _coerce_column(col, canonical)
        if fixed is not None:
            coerced[col_name] = fixed
        else:
            wrong[col_name] = str(col.type)
    if wrong:
        view["wrong_type"] = wrong
    if coerced:
        batch = pa.Table.from_arrays(
            [coerced.get(name, batch.column(name)) for name in batch.column_names],
            names=batch.column_names,
        ).combine_chunks()
        view["batch"] = batch

    if "doc_id" in batch.column_names and "doc_id" not in wrong:
        doc = batch.column("doc_id")
        doc = doc.combine_chunks() if isinstance(doc, pa.ChunkedArray) else doc
        view["doc_id"] = doc
        view["doc_null"] = pc.is_null(doc).to_numpy(zero_copy_only=False)

    if "tokens" in batch.column_names and "tokens" not in wrong:
        toks = batch.column("tokens")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        # null list → length -1 sentinel
        lens = np.where(np.isnan(lens), -1, lens).astype(np.int64) if lens.dtype.kind == "f" else lens.astype(np.int64)
        view["tokens"] = toks
        view["lens"] = lens
        if toks.null_count == 0 and isinstance(toks, pa.ListArray):
            # zero-copy hot path: Arrow's own offsets + child values buffer
            # (no flatten allocation, no cumsum temp)
            view["offsets"] = toks.offsets.to_numpy(zero_copy_only=True).astype(np.int64, copy=False)
            view["flat"] = toks.values.to_numpy(zero_copy_only=True)
        else:
            offsets = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(np.maximum(lens, 0), out=offsets[1:])
            view["offsets"] = offsets
            # flatten() drops null entries' values → offsets above stay aligned
            view["flat"] = toks.flatten().to_numpy(zero_copy_only=False)

    if "n_tok" in batch.column_names and "n_tok" not in wrong:
        ntk = batch.column("n_tok")
        ntk = ntk.combine_chunks() if isinstance(ntk, pa.ChunkedArray) else ntk
        view["n_tok_null"] = pc.is_null(ntk).to_numpy(zero_copy_only=False)
        view["n_tok"] = ntk.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)

    if "source" in batch.column_names and "source" not in wrong:
        src = batch.column("source")
        src = src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
        view["source"] = src

    return view


def runnable_checks(checks, batch: pa.Table, view: dict) -> list:
    """The subset of ``checks`` whose input columns are present AND
    correctly typed in this batch — the gate every direct check-iteration
    site must apply (CheckStage applies it inline); a skipped kernel is a
    missing-column/wrong-type verdict elsewhere, never a crash here."""
    usable = set(batch.column_names) - set(view.get("wrong_type") or ())
    return [c for c in checks if all(col in usable for col in c.columns)]


def _segment_any(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row any(True) over the flat buffer's segments — logical_or.reduceat,
    O(total tokens), no Python loop, no large temporaries (allocation-light
    for page-fault-expensive kernels; see tuning.py).

    reduceat runs over the NON-EMPTY segments only (their starts are strictly
    increasing and in-bounds; consecutive selected starts exactly delimit the
    segments because empty segments occupy no flat positions), then scatters
    back — empty segments are False.  Naively clipping out-of-bounds starts
    instead would corrupt the previous segment's boundary (caught by the
    hypothesis property test)."""
    n = len(offsets) - 1
    if n <= 0 or len(mask) == 0:
        return np.zeros(max(n, 0), dtype=bool)
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    nonempty = lens > 0
    out = np.zeros(n, dtype=bool)
    if nonempty.any():
        # cut the buffer at the last referenced position so the final
        # segment can't bleed into unreferenced child values (sliced arrays)
        end = int(offsets[-1])
        out[nonempty] = np.logical_or.reduceat(mask[:end], starts[nonempty])
    return out


def _result(idx: np.ndarray, details: list[str], level: str = "error") -> CheckResult:
    return CheckResult(idx.astype(np.int64), details, level)


# ---------------------------------------------------------------------------
# Schema-keyword checks (P1/P2 family — jsonschema type/pattern/enum/minimum)
# ---------------------------------------------------------------------------

def check_column_type(v: dict, ctx: CheckContext) -> CheckResult:
    # ≙ the jsonschema `type` keyword at the column level: a contract
    # column whose physical Arrow type is wrong fails EVERY row of the
    # batch (the reference would error each document individually); the
    # stage additionally skips all kernels that need the column, so the
    # wrong type yields violation rows instead of an aborted job
    wrong = v.get("wrong_type")
    if not wrong or not v["n"]:
        return _EMPTY
    n = v["n"]
    idxs: list[np.ndarray] = []
    details: list[str] = []
    for col in sorted(wrong):
        msg = M.msg_wrong_type(wrong[col], _COLUMN_TYPE_SPECS[col][2], col)
        idxs.append(np.arange(n, dtype=np.int64))
        details.extend([msg] * n)
    return _result(np.concatenate(idxs), details)


def check_doc_id_non_null(v: dict, ctx: CheckContext) -> CheckResult:
    # ≙ required/type keyword: "None is not of type 'string'"
    idx = np.flatnonzero(v["doc_null"])
    if not len(idx):
        return _EMPTY
    return _result(idx, [M.msg_non_null("doc_id", {"type": "string"})] * len(idx))


def check_doc_id_format(v: dict, ctx: CheckContext) -> CheckResult:
    # ≙ pattern keyword (submission_schema.json related-DOI patterns,
    # tested at reference test_submission_validator.py:342-393)
    ok = pc.match_substring_regex(v["doc_id"], ctx.doc_id_pattern)
    bad = np.flatnonzero(pc.and_kleene(pc.is_valid(v["doc_id"]), pc.invert(ok)).to_numpy(zero_copy_only=False))
    if not len(bad):
        return _EMPTY
    vals = v["doc_id"].take(pa.array(bad)).to_pylist()
    return _result(bad, [M.msg_pattern(s, ctx.doc_id_pattern, "doc_id") for s in vals])


def check_doc_id_max_length(v: dict, ctx: CheckContext) -> CheckResult:
    # ≙ maxLength keyword (additional_info_schema.json:56-60)
    lens = pc.utf8_length(v["doc_id"])
    bad = np.flatnonzero(
        pc.and_kleene(pc.is_valid(v["doc_id"]), pc.greater(lens, ctx.doc_id_max_length)).to_numpy(zero_copy_only=False)
    )
    if not len(bad):
        return _EMPTY
    vals = v["doc_id"].take(pa.array(bad)).to_pylist()
    return _result(bad, [M.msg_max_length(s, ctx.doc_id_max_length, "doc_id") for s in vals])


@functools.lru_cache(maxsize=64)
def _sources_value_set(sources: tuple) -> pa.Array:
    """Per-context allowed-source value set, built once (ST1): ctx.sources
    is a frozen tuple, so the lru key is stable across batches/actors."""
    return pa.array(list(sources), type=pa.string())


def check_source_membership(v: dict, ctx: CheckContext) -> CheckResult:
    # ≙ enum keyword + broadcast-manifest membership (J1 semi-join,
    # full_submission_validator.py:294-316)
    allowed = _sources_value_set(ctx.sources)
    member = pc.is_in(v["source"], value_set=allowed)
    bad = np.flatnonzero(
        pc.or_kleene(pc.is_null(v["source"]), pc.invert(member)).to_numpy(zero_copy_only=False)
    )
    if not len(bad):
        return _EMPTY
    vals = v["source"].take(pa.array(bad)).to_pylist()
    return _result(bad, [M.msg_enum(s, ctx.sources, "source") for s in vals])


def check_n_tok_non_negative(v: dict, ctx: CheckContext) -> CheckResult:
    # ≙ minimum keyword (data_schema.json numeric constraints)
    bad = np.flatnonzero((v["n_tok"] < 0) & ~v["n_tok_null"])
    if not len(bad):
        return _EMPTY
    return _result(bad, [M.msg_minimum(int(v["n_tok"][i]), 0, "n_tok") for i in bad])


def check_token_id_range(v: dict, ctx: CheckContext) -> CheckResult:
    # ≙ range constraint on every list element (P2); segmented any() via
    # cumsum-gather — no Python loop over rows
    flat, offsets = v["flat"], v["offsets"]
    bad_mask = (flat < 0) | (flat >= ctx.vocab_size)
    if not bad_mask.any():
        return _EMPTY
    rows = np.flatnonzero(_segment_any(bad_mask, offsets))
    details = []
    for r in rows:
        seg = bad_mask[offsets[r] : offsets[r + 1]]
        pos = int(np.flatnonzero(seg)[0])
        details.append(M.msg_token_range(int(flat[offsets[r] + pos]), pos, ctx.vocab_size))
    return _result(rows, details)


# ---------------------------------------------------------------------------
# Semantic checks (P3/P4/P10, A2 family)
# ---------------------------------------------------------------------------

def check_token_length_consistency(v: dict, ctx: CheckContext) -> CheckResult:
    # ≙ check_length_values (data_file_validator.py:286-309): the per-row
    # token-array-equality invariant from BASELINE.json input_hint
    lens, n_tok = v["lens"], v["n_tok"]
    bad = np.flatnonzero((lens >= 0) & ~v["n_tok_null"] & (n_tok != lens))
    if not len(bad):
        return _EMPTY
    return _result(bad, [M.msg_length_mismatch(int(n_tok[i]), int(lens[i])) for i in bad])


def check_tokens_not_empty(v: dict, ctx: CheckContext) -> CheckResult:
    # ≙ "symerror cannot be empty" (data_file_validator.py:264)
    bad = np.flatnonzero(v["lens"] == 0)
    if not len(bad):
        return _EMPTY
    return _result(bad, [M.msg_empty("tokens")] * len(bad))


def check_tokens_not_all_zero(v: dict, ctx: CheckContext) -> CheckResult:
    # ≙ "Uncertainties should not all be zero" (data_file_validator.py:273-284):
    # segmented all-zero over the list column, cumsum-gather
    flat, offsets, lens = v["flat"], v["offsets"], v["lens"]
    has_nonzero = _segment_any(flat != 0, offsets)
    bad = np.flatnonzero((lens > 0) & ~has_nonzero)
    if not len(bad):
        return _EMPTY
    return _result(bad, [M.msg_all_zero()] * len(bad))


def check_tokens_unique(v: dict, ctx: CheckContext) -> CheckResult:
    # ≙ uniqueItems keyword (submission_schema.json:50,
    # additional_info_schema.json:56-60) as a row-local list-dedup check
    # (SURVEY.md §2.6): one lexsort of (row, value) over the flat token
    # buffer finds every within-row repeat — O(T log T), no per-row Python;
    # message formatting touches only violating rows.
    flat, offsets, lens = v["flat"], v["offsets"], v["lens"]
    n = len(lens)
    end = int(offsets[-1]) if n else 0
    if end == 0:
        return _EMPTY
    row_of = np.repeat(np.arange(n, dtype=np.int64), np.maximum(lens, 0))
    order = np.lexsort((flat[:end], row_of))
    fs = flat[:end][order]
    rs = row_of[order]
    dup = (fs[1:] == fs[:-1]) & (rs[1:] == rs[:-1])
    if not dup.any():
        return _EMPTY
    rows = np.unique(rs[1:][dup])
    details = []
    for r in rows:
        seg = np.sort(flat[offsets[r] : offsets[r + 1]])
        rep = seg[1:][seg[1:] == seg[:-1]]
        val = int(rep[0])  # smallest duplicated value — deterministic pick
        details.append(M.msg_unique_items("tokens", val, int((seg == val).sum())))
    return _result(rows, details)


def check_sequence_length_limit(v: dict, ctx: CheckContext) -> CheckResult:
    # ≙ 10 MiB data-file size cap (full_submission_validator.py:18,318-325),
    # version-gated ≥1.1.0 exactly like the reference
    bad = np.flatnonzero(v["lens"] > ctx.max_seq_len)
    if not len(bad):
        return _EMPTY
    return _result(bad, [M.msg_too_long_sequence(int(v["lens"][i]), ctx.max_seq_len) for i in bad])


# ---------------------------------------------------------------------------
# Compound alternatives + best-in-context error selection
# ---------------------------------------------------------------------------

#: check kinds ranked as WEAK context errors during best-error selection —
#: the analogue of jsonschema by_relevance's WEAK_MATCHES {"anyOf", "oneOf"}
WEAK_KINDS = frozenset({"one_of", "any_of"})


def select_best_error(candidates: list[tuple[Check, str]]) -> str:
    """Best-in-context error among a row's candidate branch errors —
    reproduces the reference's ``by_relevance`` selection semantics
    (__init__.py:116-121: ``sorted([error] + error.context, key=by_relevance())[0]``):
    deeper paths (more specific column sets) win, weak compound kinds rank
    last, ties keep branch order."""
    best = max(
        enumerate(candidates),
        key=lambda t: (t[1][0].kind not in WEAK_KINDS, len(t[1][0].columns), -t[0]),
    )
    return best[1][1]


def _compound(name: str, branches: list[Check], kind: str, min_version: str) -> Check:
    """Shared machinery for ``any_of``/``one_of``: run every branch, then
    per failing row pick the best-in-context branch error
    (``select_best_error``); for strict oneOf also flag rows valid under
    more than one branch (jsonschema's "is valid under each of")."""

    def fn(v: dict, ctx: CheckContext) -> CheckResult:
        per_branch = [(b, b.fn(v, ctx)) for b in branches]
        fail_maps = [
            {int(i): d for i, d in zip(r.indices, r.details)} for _, r in per_branch
        ]
        none_pass = set(fail_maps[0])
        for m in fail_maps[1:]:
            none_pass &= set(m)
        found: dict[int, str] = {}
        for i in none_pass:
            found[i] = select_best_error(
                [(b, m[i]) for (b, _), m in zip(per_branch, fail_maps)]
            )
        if kind == "one_of":
            # strict XOR: a row valid under ≥2 branches also fails —
            # jsonschema oneOf's "is valid under each of" error
            n = v["n"]
            fail_count = np.zeros(n, dtype=np.int64)
            for m in fail_maps:
                if m:
                    fail_count[np.fromiter(m.keys(), dtype=np.int64, count=len(m))] += 1
            for i in np.flatnonzero(len(branches) - fail_count >= 2):
                passed = [b.name for (b, _), m in zip(per_branch, fail_maps) if int(i) not in m]
                found[int(i)] = f"is valid under each of {', '.join(passed)}"
        if not found:
            return _EMPTY
        rows = np.array(sorted(found), dtype=np.int64)
        return CheckResult(rows, [found[int(i)] for i in rows])

    cols = tuple(dict.fromkeys(c for b in branches for c in b.columns))
    return Check(name, fn, kind=kind, min_version=min_version, columns=cols)


def any_of(name: str, branches: list[Check], min_version: str = "0.1.0") -> Check:
    """Compound alternative ≙ JSON-Schema ``anyOf``: a row passes when at
    least one branch passes; a failing row reports exactly ONE violation —
    the best-in-context branch error via ``select_best_error`` — instead of
    every branch's error (multi-error rows, VERDICT r1 missing #5)."""
    return _compound(name, branches, "any_of", min_version)


def one_of(name: str, branches: list[Check], min_version: str = "0.1.0") -> Check:
    """Strict ``oneOf`` ≙ the reference's value-XOR-bin cells
    (data_schema.json:25-44): a row must satisfy EXACTLY one branch —
    failing all branches reports the best-in-context sub-error, and being
    valid under two or more reports jsonschema's "is valid under each of"
    failure."""
    return _compound(name, branches, "one_of", min_version)


# ---------------------------------------------------------------------------
# Default suite (ordered: schema checks first, then semantic — reference runs
# jsonschema validation before semantic checks, data_file_validator.py:134-152)
# ---------------------------------------------------------------------------

DEFAULT_ROW_CHECKS: list[Check] = [
    # columns=() — always runs; it reads only the wrong_type view entry
    Check("column_type", check_column_type, kind="schema", columns=()),
    Check("doc_id_non_null", check_doc_id_non_null, kind="schema", columns=("doc_id",)),
    Check("doc_id_format", check_doc_id_format, kind="schema", columns=("doc_id",)),
    Check("doc_id_max_length", check_doc_id_max_length, kind="schema", columns=("doc_id",)),
    Check("source_membership", check_source_membership, kind="schema", columns=("source",)),
    Check("n_tok_non_negative", check_n_tok_non_negative, kind="schema", columns=("n_tok",)),
    Check("token_id_range", check_token_id_range, kind="schema", columns=("tokens",)),
    # uniqueItems is version-gated ABOVE the 1.1.1 default: token sequences
    # legitimately repeat ids, so list-uniqueness activates only for suites
    # that opt into ≥1.2.0 (same pattern as the reference's version-pinned
    # schema dirs enabling new keywords)
    Check("tokens_unique_items", check_tokens_unique, kind="schema", min_version="1.2.0", columns=("tokens",)),
    # semantic checks are version-gated like check_independent_variable_values
    # (only ≥1.1.0, data_file_validator.py:141-142)
    Check("token_length_consistency", check_token_length_consistency, kind="semantic", columns=("tokens", "n_tok")),
    Check("tokens_not_empty", check_tokens_not_empty, kind="semantic", min_version="1.1.0", columns=("tokens",)),
    Check("tokens_not_all_zero", check_tokens_not_all_zero, kind="semantic", min_version="1.0.0", columns=("tokens",)),
    Check("sequence_length_limit", check_sequence_length_limit, kind="semantic", min_version="1.1.0", columns=("tokens",)),
]


def build_default_suite(version: str = "1.1.1") -> CheckSuite:
    return CheckSuite(name="sequence_default", checks=DEFAULT_ROW_CHECKS).for_version(version)


#: checks active at the DEFAULT suite version — what generic pipelines
#: (validation.py, clean.py) iterate; version-gated opt-ins like
#: tokens_unique_items (>=1.2.0) are excluded here
DEFAULT_ACTIVE_CHECKS: list[Check] = list(build_default_suite().checks)


# bootstrap the registry with the default suite + versioned profiles
# (≙ the reference's pinned schema-version dirs, __init__.py:51-52)
from hepdata_validator_ray.checks.base import KNOWN_VERSIONS, register_check_suite  # noqa: E402

register_check_suite("sequence_default", build_default_suite())
for _v in KNOWN_VERSIONS:
    register_check_suite(f"sequence_default@{_v}", build_default_suite(_v))
