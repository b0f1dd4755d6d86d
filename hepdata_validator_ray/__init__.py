"""hepdata_validator_ray — a Ray-Data-native schema + constraint validation engine.

A from-scratch reimagining of the capabilities of HEPData/hepdata-validator
(reference: /root/reference, v0.3.6) as streaming Ray Data pipelines over
Parquet tables of pre-tokenized training sequences:

    (doc_id: string, tokens: list<int32>, n_tok: int32, source: string)

The reference validates YAML/JSON documents against JSON Schemas one file at a
time in a single process (``full_submission_validator.py:190-194``).  This
engine expresses the same check taxonomy — type/required/format predicates,
cross-column consistency, membership/referential checks, duplicate detection,
version-gated check suites, a pluggable custom-check registry, and an
accumulated violation-message result model — as vectorized ``map_batches``
stages over zero-copy Arrow batches, groupby shuffles for the global checks,
and mergeable sketches for scale-out column statistics.

Public surface:
    ValidationEngine   — orchestrates the full pipeline (checks + sketches +
                         duplicates + drift), checkpointed and resumable.
    CheckSuite         — a versioned, registrable set of Check objects
                         (analogue of the reference's versioned schema dirs +
                         ``load_custom_schema``, data_file_validator.py:52-78).
    ValidationMessage grammar — messages.py byte-matches the reference's
                         "<msg> in '<path>' (expected: <schema>)" format
                         (hepdata_validator/__init__.py:159-182).
"""

import hepdata_validator_ray.tuning  # noqa: F401  (allocator tuning, import side effect)

from hepdata_validator_ray import rayfix as _rayfix

_rayfix.apply()  # hash-shuffle empty-block schema-broadcast fix (see rayfix.py)

from hepdata_validator_ray.schema import (
    SEQUENCE_SCHEMA,
    VIOLATION_SCHEMA,
    VERDICT_SCHEMA,
    DEFAULT_SOURCES,
    DEFAULT_VOCAB_SIZE,
    DEFAULT_MAX_SEQ_LEN,
    DOC_ID_PATTERN,
)
from hepdata_validator_ray.checks.base import Check, CheckSuite, register_check_suite, get_check_suite
from hepdata_validator_ray.engine import ValidationEngine, ValidationConfig, ValidationResult

__version__ = "0.1.0"

__all__ = [
    "SEQUENCE_SCHEMA",
    "VIOLATION_SCHEMA",
    "VERDICT_SCHEMA",
    "DEFAULT_SOURCES",
    "DEFAULT_VOCAB_SIZE",
    "DEFAULT_MAX_SEQ_LEN",
    "DOC_ID_PATTERN",
    "Check",
    "CheckSuite",
    "register_check_suite",
    "get_check_suite",
    "ValidationEngine",
    "ValidationConfig",
    "ValidationResult",
]
