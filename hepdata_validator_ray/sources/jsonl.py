"""JSONL source for the sequence table (S1/S2/S4 source-format breadth).

The reference reads YAML/JSON documents (single- and multi-doc streams,
optionally gzipped: data_file_validator.py:99-114,
full_submission_validator.py:125-140).  The analogue here: the same check
suite over newline-delimited JSON (optionally .gz — Arrow's JSON reader
decompresses by extension), read with ``ray.data.read_json``.
"""

from __future__ import annotations

import gzip
import json
from pathlib import Path

import pyarrow.parquet as pq
import ray.data

from hepdata_validator_ray.synth import ensure_sequences_parquet


def ensure_sequences_jsonl(sf_dir: str, compress: bool = False, n_files: int = 2) -> str:
    """Materialize a JSONL mirror of the (small) synthetic sequence table —
    same rows, different wire format.  Deterministic and cached."""
    src = Path(ensure_sequences_parquet(sf_dir))
    out = src.parent / ("jsonl_gz" if compress else "jsonl")
    done = out / "_DONE"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    parts = sorted(src.glob("*.parquet"))
    groups = [parts[i::n_files] for i in range(n_files)]
    for gi, group in enumerate(groups):
        name = out / (f"part-{gi:05d}.jsonl" + (".gz" if compress else ""))
        opener = gzip.open if compress else open
        with opener(name, "wt") as fh:
            for p in group:
                tbl = pq.read_table(p)
                for row in tbl.to_pylist():
                    fh.write(json.dumps(row) + "\n")
    done.touch()
    return str(out)


def read_sequences_jsonl(path: str) -> "ray.data.Dataset":
    return ray.data.read_json(path, file_extensions=["jsonl", "gz"])
