"""Checkpoint manifest — per-chunk lineage, sketch state, and metrics.

The reference has no resume path (re-runs start from scratch,
full_submission_validator.py:62-68); at 10^12 rows resumability is required
by the north rule.  The manifest is an append-only JSONL file under the
output dir; each line records one completed work unit:

    {"type": "chunk", "chunk_key": ..., "files": [...], "n_rows": ...,
     "n_violations": ..., "wall_s": ..., "rows_per_s": ..., "bundle_b64": ...}
    {"type": "dup_pass", "n_rows": ..., "n_duplicate_ids": ..., ...}

``chunk_key`` is a content hash of the chunk's input file list, so resume
matching is layout-independent.  Appends are atomic at the line level
(single ``write`` of one line + flush), so a killed run leaves a readable
manifest and the next run skips exactly the completed chunks.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import threading
from pathlib import Path
from typing import Any, Iterable


def chunk_key(files: Iterable[str]) -> str:
    h = hashlib.sha256()
    for f in sorted(files):
        h.update(f.encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


class CheckpointManifest:
    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.entries: list[dict] = []
        self._lock = threading.Lock()  # chunk loop + concurrent dup pass
        if self.path.exists():
            with open(self.path) as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        try:
                            self.entries.append(json.loads(line))
                        except json.JSONDecodeError:
                            pass  # torn tail line from a killed run — ignore

    def completed_chunks(self) -> set[str]:
        return {e["chunk_key"] for e in self.entries if e.get("type") == "chunk"}

    def has(self, type_: str) -> bool:
        return any(e.get("type") == type_ for e in self.entries)

    def get_all(self, type_: str) -> list[dict]:
        return [e for e in self.entries if e.get("type") == type_]

    def append(self, entry: dict[str, Any]) -> None:
        with self._lock:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            line = json.dumps(entry, sort_keys=True) + "\n"
            with open(self.path, "a") as fh:
                fh.write(line)
                fh.flush()
                os.fsync(fh.fileno())
            self.entries.append(entry)

    @staticmethod
    def encode_bundle(b: bytes) -> str:
        return base64.b64encode(b).decode()

    @staticmethod
    def decode_bundle(s: str) -> bytes:
        return base64.b64decode(s)
