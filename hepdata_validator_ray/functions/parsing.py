"""Scalar parsing/validation kernels (SURVEY.md §2.7).

Vectorized Arrow equivalents of the reference's lenient scalar parsers:

- ``parse_numeric_with_percent`` ≙ ``convert_to_float``
  (data_file_validator.py:312-332): strip a trailing ``%``, cast to float,
  report rows that fail with the reference's exact message
  "Invalid error value <x>: value must be a number (possibly ending in %)".
- ``check_range_string`` ≙ the range-string regex used by
  ``check_independent_variable_values`` (data_file_validator.py:177) and
  ``check_cmenergies`` (submission_file_validator.py:173): numbers or
  "lo-hi" ranges in scientific notation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: the reference's range regex (data_file_validator.py:177), RE2-compatible
RANGE_PATTERN = r"^[+-]?\d+(\.\d*)?([eE][+-]?\d+)?\s*-\s*[+-]?\d+(\.\d*)?([eE][+-]?\d+)?$"


def parse_numeric_with_percent(arr: pa.Array) -> tuple[pa.Array, np.ndarray, list[str]]:
    """Lenient numeric parse of a string column.

    Returns (parsed float64 array with nulls where unparseable,
    invalid-row mask, per-invalid-row messages).  Empty strings are allowed
    (parse to null, NOT flagged) — matching the reference's
    ``if error != ''`` carve-out (data_file_validator.py:327).
    """
    import pandas as pd

    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    stripped = pc.replace_substring(arr, pattern="%", replacement="")
    trimmed = pc.utf8_trim_whitespace(stripped)
    # Arrow's string→float cast raises on unparseable input even with
    # safe=False, so the lenient parse goes through pandas' C kernel
    parsed_np = pd.to_numeric(trimmed.to_pandas(), errors="coerce")
    parsed = pa.array(parsed_np, type=pa.float64())
    # invalid = non-null input that became null after parse, excluding ""
    became_null = pc.and_kleene(pc.is_valid(arr), pc.is_null(parsed))
    not_empty = pc.not_equal(trimmed, "")
    invalid = pc.and_kleene(became_null, not_empty).fill_null(False).to_numpy(zero_copy_only=False)
    invalid = np.asarray(invalid, dtype=bool)
    msgs = []
    if invalid.any():
        # byte-matches the reference: the message is formatted from the
        # %-STRIPPED (pre-cast, untrimmed) value — error.replace('%','')
        # happens before the float() attempt (data_file_validator.py:318-326),
        # so "ab%c" reports "Invalid error value abc: ..."
        vals = stripped.take(pa.array(np.flatnonzero(invalid))).to_pylist()
        msgs = [f"Invalid error value {v}: value must be a number (possibly ending in %)" for v in vals]
    return parsed, invalid, msgs


def check_range_string(arr: pa.Array) -> np.ndarray:
    """True per row where the string is a valid "lo-hi" range
    (reference range grammar).  Nulls → False."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    m = pc.match_substring_regex(arr, RANGE_PATTERN)
    return np.asarray(m.fill_null(False).to_numpy(zero_copy_only=False), dtype=bool)


def parse_numeric_or_range(arr: pa.Array) -> tuple[np.ndarray, list[str]]:
    """``check_cmenergies`` semantics (submission_file_validator.py:159-178):
    each value must be a plain number OR a valid range string.  Returns
    (invalid mask, messages)."""
    import pandas as pd

    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    as_num = pd.to_numeric(pc.utf8_trim_whitespace(arr).to_pandas(), errors="coerce")
    is_num = as_num.notna().to_numpy()
    is_range = check_range_string(arr)
    valid_input = pc.is_valid(arr).to_numpy(zero_copy_only=False)
    invalid = np.asarray(valid_input, dtype=bool) & ~np.asarray(is_num, dtype=bool) & ~is_range
    msgs = []
    if invalid.any():
        vals = arr.take(pa.array(np.flatnonzero(invalid))).to_pylist()
        # mirrors "Invalid value (in GeV) for cmenergies: '{x}'"
        # (submission_file_validator.py:175-176)
        msgs = [f"Invalid value for range field: '{v}'" for v in vals]
    return invalid, msgs
