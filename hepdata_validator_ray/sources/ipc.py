"""Arrow IPC (Feather v2) source for the sequence table — the
zero-parse wire format (source-format breadth, the S-family).

Ray 2.49 ships no IPC reader, so this is the one-task-per-file custom
source (the sources/orc.py shape): the file list fans out as a Dataset
of paths and each task memory-maps its file with ``pyarrow.ipc`` into
Arrow record batches — IPC *is* Arrow's memory layout, so the decode is
a zero-copy map, the cheapest of all the engine's wire formats.  Record
batches inside a file are yielded individually (unlike ORC's whole-file
table), so one giant IPC file still streams batch by batch.  At scale
this parallelizes per file like read_parquet's default file splitting;
in-file batch-offset splitting would need a custom datasource
(documented limitation, same as ORC's stripes).

Reference analogue: the YAML/JSON multi-format entry surface
(data_file_validator.py:99-114) — format breadth, identical semantics.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.ipc
import pyarrow.parquet as pq
import ray.data

from hepdata_validator_ray.synth import ensure_sequences_parquet


def ensure_sequences_ipc(sf_dir: str, n_files: int = 2) -> str:
    """Materialize an Arrow-IPC mirror of the (small) synthetic sequence
    table — same rows, different wire format.  Deterministic and cached."""
    src = Path(ensure_sequences_parquet(sf_dir))
    out = src.parent / f"ipc-f{n_files}"
    done = out / "_DONE"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    parts = sorted(src.glob("*.parquet"))
    groups = [parts[i::n_files] for i in range(n_files)]
    for gi, group in enumerate(groups):
        tbl = pa.concat_tables([pq.read_table(p) for p in group])
        tmp = out / f"part-{gi:05d}.tmp"
        with pa.ipc.new_file(str(tmp), tbl.schema) as w:
            w.write_table(tbl)
        tmp.rename(out / f"part-{gi:05d}.arrow")
    done.touch()
    return str(out)


def read_sequences_ipc(path: str) -> "ray.data.Dataset":
    """Dataset over Arrow-IPC files: one memory-mapped decode task per
    file, record batches streamed individually."""
    import pandas as pd

    p = Path(path)
    files = sorted(str(f) for f in p.glob("*.arrow")) if p.is_dir() else [str(p)]
    if not files:
        raise FileNotFoundError(f"no .arrow files under {path}")

    def decode_batches(batch: pd.DataFrame):
        for f in batch["path"]:
            with pa.memory_map(f, "r") as source:
                reader = pa.ipc.open_file(source)
                for i in range(reader.num_record_batches):
                    rb = reader.get_batch(i)
                    # copy out of the mmap before the file closes
                    yield pa.Table.from_batches([rb]).combine_chunks()

    return ray.data.from_pandas(pd.DataFrame({"path": files})).map_batches(
        decode_batches, batch_format="pandas", batch_size=1
    )
