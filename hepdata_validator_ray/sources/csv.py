"""CSV/TSV wire format for the tokenized-sequence table (source breadth,
SURVEY.md §2.1 S1/S2 family).

CSV cannot carry list columns, so ``tokens`` travels as a space-joined
string column ``tokens_str``; the reader parses it back to ``list<int32>``
with vectorized Arrow kernels (``pc.split_pattern`` + nested cast — no
Python loop).  Empty strings read as SQL NULL on both engines (Arrow
``strings_can_be_null``; DuckDB ``nullstr=''``), so the oracle reads the
very same bytes with the very same null semantics.
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from hepdata_validator_ray.schema import SEQUENCE_SCHEMA


def ensure_sequences_csv(sf_dir: str) -> str:
    """Materialize the synthetic sequence table as one CSV (idempotent,
    same rows as the parquet layout)."""
    from hepdata_validator_ray.synth import ROWS_BY_TAG, SYNTH_ROOT, SYNTH_VERSION, generate_sequences_table

    tag = Path(sf_dir).name or "default"
    rows = ROWS_BY_TAG.get(tag, 2_000)
    out = SYNTH_ROOT / f"{tag}-v{SYNTH_VERSION}-csv" / "sequences.csv"
    if out.exists():
        return str(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    tbl = generate_sequences_table(rows, seed=42)
    toks = tbl.column("tokens")
    toks_str = pc.binary_join(pc.cast(toks, pa.list_(pa.string())), " ")
    csv_tbl = pa.Table.from_arrays(
        [tbl.column("doc_id"), toks_str, tbl.column("n_tok"), tbl.column("source")],
        names=["doc_id", "tokens_str", "n_tok", "source"],
    )
    import pyarrow.csv as pacsv

    tmp = str(out) + ".tmp"
    pacsv.write_csv(csv_tbl, tmp)
    os.replace(tmp, out)
    return str(out)


def read_sequences_csv(path: str) -> "ray.data.Dataset":
    """Read the CSV wire format back into the canonical sequence schema."""
    import pyarrow.csv as pacsv

    ds = ray.data.read_csv(
        path,
        convert_options=pacsv.ConvertOptions(
            strings_can_be_null=True,
            column_types={"doc_id": pa.string(), "tokens_str": pa.string(), "n_tok": pa.int32(), "source": pa.string()},
        ),
    )

    def parse(t: pa.Table) -> pa.Table:
        toks = pc.cast(pc.split_pattern(t["tokens_str"], " "), pa.list_(pa.int32()))
        return pa.Table.from_arrays(
            [t["doc_id"], toks, t["n_tok"], t["source"]], schema=SEQUENCE_SCHEMA
        )

    return ds.map_batches(parse, batch_format="pyarrow")
