"""Scalar parsing kernels — byte-matching the reference's lenient parsers
(convert_to_float, data_file_validator.py:312-332; cmenergies range grammar,
submission_file_validator.py:159-178)."""

import numpy as np
import pyarrow as pa

from hepdata_validator_ray.functions import (
    RANGE_PATTERN,
    check_range_string,
    parse_numeric_or_range,
    parse_numeric_with_percent,
)


def test_percent_strip_and_cast():
    arr = pa.array(["12.5%", "3", "-1e3", "", "abc", None, " 5 ", "ab%c"])
    parsed, invalid, msgs = parse_numeric_with_percent(arr)
    vals = parsed.to_pylist()
    assert vals[0] == 12.5
    assert vals[1] == 3.0
    assert vals[2] == -1000.0
    assert vals[3] is None  # empty allowed, not flagged
    assert vals[4] is None
    assert vals[5] is None
    assert vals[6] == 5.0
    assert vals[7] is None
    assert invalid.tolist() == [False, False, False, False, True, False, False, True]
    # the message uses the %-STRIPPED value, matching the reference's
    # error.replace('%','') before formatting (data_file_validator.py:318-326)
    assert msgs == [
        "Invalid error value abc: value must be a number (possibly ending in %)",
        "Invalid error value abc: value must be a number (possibly ending in %)",
    ]


def test_range_string_grammar():
    ok = ["1-2", "1.5-2.5", "-1.5 - 2.5", "1e3-2e3", "+1.0E-2 - 3"]
    bad = ["1", "1-", "-2", "a-b", "1 to 2", ""]
    got_ok = check_range_string(pa.array(ok))
    got_bad = check_range_string(pa.array(bad))
    assert got_ok.all(), got_ok
    assert not got_bad.any(), got_bad


def test_numeric_or_range():
    arr = pa.array(["13000", "7.5", "1-2", "x", None])
    invalid, msgs = parse_numeric_or_range(arr)
    assert invalid.tolist() == [False, False, False, True, False]
    assert msgs == ["Invalid value for range field: 'x'"]


def test_registry_and_cli_suite_lookup():
    import pytest

    from hepdata_validator_ray.checks.base import get_check_suite

    s = get_check_suite("sequence_default")
    assert len(s.checks) == 11  # incl. the column_type gate
    s0 = get_check_suite("sequence_default@0.1.0")
    assert len(s0.checks) < len(s.checks)
    # unsupported-schema error shape (≙ UnsupportedDataSchemaException,
    # data_file_validator.py:335-347)
    with pytest.raises(KeyError, match="There is no schema defined for the 'nope' data type."):
        get_check_suite("nope")
