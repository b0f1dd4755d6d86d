"""Violation-message grammar, byte-compatible with the reference validator.

The reference formats every validation error as

    "<jsonschema message>[ in '<dotted.path[idx]>'][ (expected: <subschema dict>)]"

with the path rendered by ``add_validation_error`` (reference
hepdata_validator/__init__.py:159-182): integer path parts become ``[i]``,
the FIRST string part is unbracketed/undotted, subsequent string parts are
``.part``.  Printed form is ``"<level> - <message>"``
(``ValidationMessage.__unicode__``, __init__.py:203-219).

This module reproduces that grammar exactly so violation ``detail`` strings
from the Ray engine byte-match what the reference would emit for the
equivalent failure (asserted in tests/test_messages.py, mirroring the byte
assertions in reference testsuite/test_data_validator.py:100-104,372-381).
"""

from __future__ import annotations

from typing import Any, Iterable, Mapping


def format_path(parts: Iterable[Any]) -> str:
    """Render a jsonschema-style error path the way the reference does.

    Reference: hepdata_validator/__init__.py:163-172 — ints as ``[i]``,
    first string bare, later strings dotted.

    >>> format_path(['dependent_variables', 0, 'values', 1, 'errors'])
    'dependent_variables[0].values[1].errors'
    """
    location = ""
    for part in parts:
        if isinstance(part, int):
            location += "[{0}]".format(part)
        elif not location:
            location = part
        else:
            location += "." + part
    return location


def format_message(message: str, path: Iterable[Any] = (), expected: Mapping | None = None) -> str:
    """Assemble the full message string per the reference grammar.

    Reference: hepdata_validator/__init__.py:173-179.  ``expected`` is
    appended only when it is a dict that is not a full schema (no '$schema'
    key), rendered with Python's dict repr — exactly as the f-string
    ``f" (expected: {ve.schema})"`` does.
    """
    location = format_path(path)
    if location:
        message += f" in '{location}'"
    if isinstance(expected, dict) and "$schema" not in expected.keys():
        message += f" (expected: {expected})"
    return message


def render(level: str, message: str) -> str:
    """``ValidationMessage.__unicode__`` equivalent (__init__.py:217-218)."""
    return level + " - " + message


# ---------------------------------------------------------------------------
# Message templates for the sequence-table check suite.
#
# Wording follows the reference's schema-keyword error style (jsonschema
# draft-04/07 messages for type/pattern/enum/minimum/maxLength violations) and
# its semantic-check style (e.g. "Uncertainties should not all be zero",
# data_file_validator.py:279; "Inconsistent length of 'values' list: ...",
# data_file_validator.py:297-299).
# ---------------------------------------------------------------------------


def msg_non_null(field: str, expected: Mapping | None = None) -> str:
    # jsonschema draft: "None is not of type 'string'"
    return format_message(f"None is not of type 'string'", [field], expected)


def msg_wrong_type(actual_type: str, expected: str, field: str) -> str:
    # jsonschema draft type message, lifted to the columnar setting: every
    # row of a wrong-typed column violates, and the detail names the
    # column's PHYSICAL Arrow type rather than repr-ing each value (one
    # shared string per column per batch — O(1) formatting however dirty
    # the shard)
    return format_message(
        f"value of Arrow type '{actual_type}' is not of type '{expected}'",
        [field],
        {"type": expected},
    )


def msg_pattern(value: str, pattern: str, field: str) -> str:
    # jsonschema draft: "'<value>' does not match '<pattern>'"
    return format_message(f"{value!r} does not match {pattern!r}", [field], {"pattern": pattern})


def msg_max_length(value: str, limit: int, field: str) -> str:
    return format_message(f"{value!r} is too long", [field], {"maxLength": limit})


def msg_enum(value: Any, allowed: tuple, field: str) -> str:
    # jsonschema draft: "'x' is not one of ['a', 'b']"
    return format_message(f"{value!r} is not one of {list(allowed)}", [field], {"enum": list(allowed)})


def msg_minimum(value: Any, minimum: Any, field: str) -> str:
    # jsonschema draft: "-1 is less than the minimum of 0"
    return format_message(f"{value} is less than the minimum of {minimum}", [field], {"minimum": minimum})


def msg_maximum(value: Any, maximum: Any, field: str) -> str:
    # jsonschema draft: "11 is greater than the maximum of 10"
    return format_message(f"{value} is greater than the maximum of {maximum}", [field], {"maximum": maximum})


def msg_min_length(value: str, limit: int, field: str) -> str:
    # jsonschema draft: "'x' is too short"
    return format_message(f"{value!r} is too short", [field], {"minLength": limit})


def msg_token_range(value: int, row_pos: int, vocab_size: int) -> str:
    # jsonschema draft maximum-style message on a list element.
    return format_message(
        f"{value} is not in range [0, {vocab_size})",
        ["tokens", row_pos],
        {"minimum": 0, "exclusiveMaximum": vocab_size},
    )


def msg_length_mismatch(n_tok: int, observed: int) -> str:
    # Mirrors "Inconsistent length of 'values' list: independent_variables %s,
    # dependent_variables %s" (data_file_validator.py:296-299).
    return format_message(
        "Inconsistent length of 'tokens' list: n_tok %s, len(tokens) %s" % (str(n_tok), str(observed))
    )


def msg_all_zero() -> str:
    # Mirrors "Uncertainties should not all be zero" (data_file_validator.py:279)
    # with the path grammar of that call site (path=['dependent_variables',
    # 'values', i, 'errors'] renders as dotted text).
    return format_message("Tokens should not all be zero", ["tokens"])


def msg_empty(field: str) -> str:
    # Mirrors "symerror cannot be empty" (data_file_validator.py:264).
    return format_message(f"{field} cannot be empty", [field])


def msg_too_long_sequence(n_tok: int, limit: int) -> str:
    # Mirrors the size-cap message "exceeds maximum size of 10 MB"
    # (full_submission_validator.py:318-325).
    return format_message(f"Sequence length {n_tok} exceeds maximum length of {limit}", ["tokens"])


def msg_unique_items(field: str, value: Any, count: int) -> str:
    # jsonschema draft uniqueItems grammar "%r has non-unique elements"
    # (enforced by the reference at submission_schema.json:50 /
    # additional_info_schema.json:56-60); the instance preview is the first
    # duplicated element instead of the full (possibly huge) list repr.
    return format_message(
        f"{field} has non-unique elements (value {value} appears {count} times)",
        [field],
        {"uniqueItems": True},
    )


def msg_duplicate(kind: str, value: str) -> str:
    # Byte-matches the reference grammar "Duplicate table {key}: {d}"
    # (submission_file_validator.py:152-155; asserted at
    # test_submission_validator.py:316 'Duplicate table name: a').
    return f"Duplicate {kind}: {value}"


def msg_unknown_source(value: str, manifest_name: str) -> str:
    # Mirrors the unreferenced-file sweep "'X' is not referenced in the
    # submission" (full_submission_validator.py:218-228).
    return f"'{value}' is not referenced in the {manifest_name}"


def msg_invalid_number(value: Any) -> str:
    # Mirrors "Invalid error value <x>: value must be a number (possibly
    # ending in %)" (data_file_validator.py:324-326).
    return f"Invalid value {value}: value must be a number (possibly ending in %)"
