"""Check protocol, context, versioned suites, and the custom-suite registry.

Reference analogues:
- ``Validator`` abstract base with ``validate()`` + shared message store
  (hepdata_validator/__init__.py:57-95) → ``Check`` protocol returning
  violation indices+details for a whole Arrow batch (vectorized, no per-row
  dispatch).
- ``load_custom_schema(type, path)`` registry (data_file_validator.py:52-78)
  → ``register_check_suite(name, suite)`` / ``get_check_suite(name)``.
- ``schema_version`` kwarg gating which checks run (__init__.py:70-73;
  e.g. check_independent_variable_values only ≥1.1.0,
  data_file_validator.py:141-142) → ``Check.min_version`` + ``CheckSuite.for_version``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

import numpy as np

from hepdata_validator_ray.schema import (
    DEFAULT_MAX_SEQ_LEN,
    DEFAULT_SOURCES,
    DEFAULT_VOCAB_SIZE,
    DOC_ID_MAX_LENGTH,
    DOC_ID_PATTERN,
)

#: Versioned suite profiles, mirroring the reference's pinned schema versions
#: (hepdata_validator/__init__.py:51-52).
KNOWN_VERSIONS = ("1.2.0", "1.1.1", "1.1.0", "1.0.1", "1.0.0", "0.1.0")
#: default suite version stays 1.1.1 — 1.2.0 additionally activates the
#: uniqueItems list check (opt-in: token sequences legitimately repeat ids,
#: so list-uniqueness is a per-suite policy, not a default invariant)
DEFAULT_VERSION = "1.1.1"


def _vtuple(v: str) -> tuple[int, ...]:
    return tuple(int(x) for x in v.split("."))


@dataclass(frozen=True)
class CheckContext:
    """Broadcast configuration captured by every check actor.

    Built once on the driver, shipped via ``ray.put`` (small) and handed to
    actor constructors — the broadcast-lookup pattern for the membership /
    referential checks (reference analogue: schema objects loaded once per
    validator instance, data_file_validator.py:49-61).
    """

    sources: tuple[str, ...] = DEFAULT_SOURCES
    vocab_size: int = DEFAULT_VOCAB_SIZE
    max_seq_len: int = DEFAULT_MAX_SEQ_LEN
    doc_id_pattern: str = DOC_ID_PATTERN
    doc_id_max_length: int = DOC_ID_MAX_LENGTH
    schema_version: str = DEFAULT_VERSION
    #: when True, semantic checks are suppressed for rows that already failed
    #: a schema-level check — reference data_file_validator.py:143-152 skips
    #: semantic checks when schema errors exist for the file.
    suppress_semantic_on_schema_error: bool = False


@dataclass(frozen=True)
class CheckResult:
    """Vectorized outcome of one check over one batch: the violating row
    positions plus a detail string per violation."""

    indices: np.ndarray  # int64 positions within the batch
    details: list[str]
    level: str = "error"


#: A check function: (batch columns dict, ctx) -> CheckResult.
CheckFn = Callable[[dict, CheckContext], CheckResult]


@dataclass(frozen=True)
class Check:
    name: str
    fn: CheckFn
    #: 'schema' checks ≙ JSON-Schema keyword failures; 'semantic' ≙ the
    #: reference's post-schema checks (check_length_values & co.)
    kind: str = "schema"
    level: str = "error"
    #: minimum suite version at which the check is active (reference
    #: version-gating pattern)
    min_version: str = "0.1.0"
    #: input columns the check needs (used for read-projection pruning)
    columns: tuple[str, ...] = ()
    #: columns that must be PRESENT for the check to run at all; defaults
    #: to ``columns``.  A compound over ALTERNATIVE columns (anyOf of a
    #: check on 'a' and a check on 'b') sets this to the intersection —
    #: only columns needed by EVERY branch are hard requirements; its fn
    #: treats a branch whose column is absent as failing for every row.
    required: tuple[str, ...] | None = None

    @property
    def required_cols(self) -> tuple[str, ...]:
        return self.columns if self.required is None else self.required

    def active_in(self, version: str) -> bool:
        return _vtuple(version) >= _vtuple(self.min_version)


@dataclass
class CheckSuite:
    """An ordered list of checks; order defines violation report order within
    a row (schema checks before semantic checks, as in the reference where
    schema validation runs before check_error_values/check_length_values,
    data_file_validator.py:134-152)."""

    name: str
    checks: Sequence[Check]
    version: str = DEFAULT_VERSION

    def for_version(self, version: str) -> "CheckSuite":
        return CheckSuite(
            name=self.name,
            checks=[c for c in self.checks if c.active_in(version)],
            version=version,
        )

    def required_columns(self) -> list[str]:
        """Union of every check's input columns — the READ projection."""
        cols: list[str] = []
        for c in self.checks:
            for col in c.columns:
                if col not in cols:
                    cols.append(col)
        return cols

    def hard_required_columns(self) -> list[str]:
        """Columns whose absence is a required-property violation: a
        compound over alternative columns only hard-requires the
        intersection of its branches (its fn handles absent branches)."""
        cols: list[str] = []
        for c in self.checks:
            for col in c.required_cols:
                if col not in cols:
                    cols.append(col)
        return cols


# ---------------------------------------------------------------------------
# Registry (≙ load_custom_schema, data_file_validator.py:52-78)
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, CheckSuite] = {}


def register_check_suite(name: str, suite: CheckSuite) -> None:
    _REGISTRY[name] = suite


def get_check_suite(name: str) -> CheckSuite:
    """Raises KeyError with the reference's unsupported-schema error shape
    (UnsupportedDataSchemaException, data_file_validator.py:335-347)."""
    if name not in _REGISTRY:
        raise KeyError(f"There is no schema defined for the '{name}' data type.")
    return _REGISTRY[name]


def registered_suites() -> list[str]:
    return sorted(_REGISTRY)
