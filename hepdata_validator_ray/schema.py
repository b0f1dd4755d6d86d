"""Arrow schemas + constants for the validation engine.

The input table shape follows BASELINE.json ``input_hint``: Parquet tables of
pre-tokenized training sequences.  The violation / verdict row types
generalize the reference's result model:

- ``ValidationMessage {file, level, message}`` (reference
  hepdata_validator/__init__.py:203-219) → violation row
  ``{partition_id, row_idx, doc_id, check_name, level, detail}``.
- ``valid_files: dict[SchemaType -> list]`` (full_submission_validator.py:20-40)
  → per-partition verdict rows
  ``{partition_id, check_name, passed, n_rows, n_violations, detail}``.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input table (per BASELINE.json input_hint)
# ---------------------------------------------------------------------------

SEQUENCE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

#: Allowed ``source`` vocabulary (the broadcast manifest analogue of the
#: reference's schema ``enum`` keyword, e.g. schemas/1.1.1/data_schema.json).
DEFAULT_SOURCES = ("web", "books", "code", "wiki", "news")

#: Token-id upper bound (GPT-2-ish vocab size; analogue of a schema
#: ``maximum`` constraint).
DEFAULT_VOCAB_SIZE = 50257

#: Max sequence length — analogue of the reference's 10 MiB per-data-file cap
#: (full_submission_validator.py:18,318-325).
DEFAULT_MAX_SEQ_LEN = 8192

#: ``doc_id`` format — analogue of JSON-Schema ``pattern`` (e.g.
#: submission_schema.json related-DOI patterns).  "doc-<source>-<8 digits>".
DOC_ID_PATTERN = r"^doc-[a-z0-9]+-[0-9]{8}$"

#: ``doc_id`` maxLength — analogue of ``maxLength`` in
#: additional_info_schema.json:56-60.
DOC_ID_MAX_LENGTH = 64

# ---------------------------------------------------------------------------
# Output tables
# ---------------------------------------------------------------------------

VIOLATION_SCHEMA = pa.schema(
    [
        ("partition_id", pa.string()),
        ("row_idx", pa.int64()),
        ("doc_id", pa.string()),
        ("check_name", pa.string()),
        ("level", pa.string()),  # 'error' | 'hint' (reference __init__.py:208)
        ("detail", pa.string()),
    ]
)

VERDICT_SCHEMA = pa.schema(
    [
        ("partition_id", pa.string()),
        ("check_name", pa.string()),
        ("passed", pa.bool_()),
        ("n_rows", pa.int64()),
        ("n_violations", pa.int64()),
        ("detail", pa.string()),
    ]
)

#: Internal "kind" tags for the single-pass check stage's mixed output stream.
KIND_VIOLATION = "violation"
KIND_BATCH_STATS = "batch_stats"
KIND_SKETCH = "sketch"
