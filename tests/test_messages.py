"""Byte-exact conformance of the message grammar to the reference's
``add_validation_error`` formatting (hepdata_validator/__init__.py:159-182),
mirroring the byte assertions in reference testsuite/test_data_validator.py
(e.g. lines 100-104, 372-381)."""

from hepdata_validator_ray import messages as M


def test_path_grammar_first_segment_unbracketed():
    # reference quirk: first string part bare, ints bracketed, later strings dotted
    assert M.format_path(["dependent_variables", 0, "values", 1, "errors"]) == "dependent_variables[0].values[1].errors"
    assert M.format_path(["independent_variables", 0, "values", 24, "value"]) == "independent_variables[0].values[24].value"
    assert M.format_path([0, "values"]) == "[0].values"
    assert M.format_path([]) == ""


def test_message_with_expected_schema_dict():
    msg = M.format_message("'percent' is not one of ['pct']", ["errors", 0, "symerror"], {"enum": ["pct"]})
    assert msg == "'percent' is not one of ['pct'] in 'errors[0].symerror' (expected: {'enum': ['pct']})"


def test_full_schema_not_appended():
    # reference skips the (expected: ...) suffix when the schema has '$schema'
    msg = M.format_message("bad", ["x"], {"$schema": "http://...", "type": "object"})
    assert msg == "bad in 'x'"


def test_no_path_no_suffix():
    assert M.format_message("Uncertainties should not all be zero") == "Uncertainties should not all be zero"


def test_render_level_prefix():
    # ValidationMessage.__unicode__: "<level> - <message>" (__init__.py:217-218)
    assert M.render("error", "boom") == "error - boom"


def test_semantic_message_templates():
    assert M.msg_length_mismatch(5, 3) == "Inconsistent length of 'tokens' list: n_tok 5, len(tokens) 3"
    assert M.msg_all_zero() == "Tokens should not all be zero in 'tokens'"
    assert M.msg_empty("tokens") == "tokens cannot be empty in 'tokens'"
    # reference grammar: "Duplicate table name: a" (test_submission_validator.py:316)
    assert M.msg_duplicate("doc_id", "doc-web-00000001") == "Duplicate doc_id: doc-web-00000001"
    assert (
        M.msg_invalid_number("12x%")
        == "Invalid value 12x%: value must be a number (possibly ending in %)"
    )


def test_schema_keyword_templates():
    assert (
        M.msg_enum("crawlz", ("web", "books"), "source")
        == "'crawlz' is not one of ['web', 'books'] in 'source' (expected: {'enum': ['web', 'books']})"
    )
    assert (
        M.msg_minimum(-1, 0, "n_tok")
        == "-1 is less than the minimum of 0 in 'n_tok' (expected: {'minimum': 0})"
    )
    assert M.msg_non_null("doc_id", {"type": "string"}) == (
        "None is not of type 'string' in 'doc_id' (expected: {'type': 'string'})"
    )
