"""ORC source for the sequence table (source-format breadth, the S-family).

Ray 2.49 ships no ``read_orc``, so the reader is a one-task-per-file
custom source: the file list fans out as a Dataset of paths and each task
decodes its file with ``pyarrow.orc`` into Arrow batches — the same
"whole-file task" shape the engine's fused read+check path uses (ORC
stripes decode to the table's native Arrow schema, so everything
downstream — checks, queries, oracles — is format-agnostic from here).
At scale this parallelizes per file exactly like read_parquet's default
file-splitting; in-file stripe splitting would need a stripe-offset
datasource and is out of scope (documented limitation).

Reference analogue: the YAML/JSON multi-format entry surface
(data_file_validator.py:99-114) — format breadth, identical semantics.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.orc
import pyarrow.parquet as pq
import ray.data

from hepdata_validator_ray.synth import ensure_sequences_parquet


def ensure_sequences_orc(sf_dir: str, n_files: int = 2) -> str:
    """Materialize an ORC mirror of the (small) synthetic sequence table —
    same rows, different wire format.  Deterministic and cached."""
    src = Path(ensure_sequences_parquet(sf_dir))
    out = src.parent / f"orc-f{n_files}"
    done = out / "_DONE"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    parts = sorted(src.glob("*.parquet"))
    groups = [parts[i::n_files] for i in range(n_files)]
    for gi, group in enumerate(groups):
        tbl = pa.concat_tables([pq.read_table(p) for p in group])
        tmp = out / f"part-{gi:05d}.tmp"
        pa.orc.write_table(tbl, str(tmp))
        tmp.rename(out / f"part-{gi:05d}.orc")
    done.touch()
    return str(out)


def read_sequences_orc(path: str) -> "ray.data.Dataset":
    """Dataset over ORC files: one decode task per file."""
    import pandas as pd

    p = Path(path)
    files = sorted(str(f) for f in p.glob("*.orc")) if p.is_dir() else [str(p)]
    if not files:
        raise FileNotFoundError(f"no .orc files under {path}")

    def decode_tables(batch: pd.DataFrame):
        for f in batch["path"]:
            yield pa.orc.read_table(f)

    return ray.data.from_pandas(pd.DataFrame({"path": files})).map_batches(
        decode_tables, batch_format="pandas", batch_size=1
    )
