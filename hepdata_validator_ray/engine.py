"""ValidationEngine — the Ray-Data-native pipeline orchestrator.

Physical plan (one heavy pass + one cheap key-only pass; SURVEY.md §3.4):

    PASS 1 (reads every needed column once):
      read_parquet(files, include_paths=True)
        → map_batches(CheckStage, batch_format='pyarrow', zero_copy_batch=True,
                      concurrency=actor pool)       # all row-local checks +
                                                    # per-batch sketch partials
        → mixed stream {violation | batch_stats | sketch} rows  (≈1-3% of input)
        → materialize (small) → split:
             violations  → write_parquet(out/violations/chunk=K)
             stats       → per-partition verdicts (groupby partition_id)
             sketches    → per-partition merge (groupby + map_groups) → drift
                           verdicts; tree-reduced global SketchBundle

    PASS 2 (reads ONLY the doc_id column — column-pruned at the Parquet read):
      read_parquet(files, columns=['doc_id'])
        → map_batches(per-batch value_counts)        # map-side combine
        → groupby('doc_id').sum() → filter count>1   # the one global shuffle
        → duplicate-violation rows

    Chunked over the input file list; each chunk appends a checkpoint-manifest
    line (lineage + metrics + serialized sketch state) → resumable: a re-run
    skips completed chunks (north_rule requirement; the reference re-runs from
    scratch, full_submission_validator.py:62-68).

    Entry modes (all through ``validate``/``validate_bundle``):
      - directory / file list of parquet (the default path above)
      - .zip / .tar.gz / .tgz / .tar archives and single .parquet.gz files —
        unpacked to a temp dir, temp prefix scrubbed from every output,
        manifest lineage keyed on archive-relative paths so re-validation
        resumes (≙ full_submission_validator.py:85-159)
      - a single multi-table bundle parquet routed by a tag column with
        per-table verdicts and an optional partitioned split write
        (≙ the reference's single-YAML split, :175-176, 252-261)

Scale notes (100 TB / 256 nodes):
- The only all-to-all shuffle is the doc_id duplicate groupby, over a single
  pruned column with per-batch pre-aggregation (map-side combine) so hot
  duplicate classes collapse before the exchange.
- Sketch partials are fixed-size per batch and merged per-partition via a
  small groupby, then tree-reduced — never concentrated on the driver.
- The mixed stream materialization holds ~1-3% of input bytes spread across
  the cluster object store (spillable); violations write out per chunk so
  object-store retention is bounded by chunk size.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from hepdata_validator_ray import messages as M
from hepdata_validator_ray.checks.base import CheckContext, CheckSuite
from hepdata_validator_ray.checks.row_checks import build_default_suite, prepare_view
from hepdata_validator_ray.schema import (
    KIND_BATCH_STATS,
    KIND_SKETCH,
    KIND_VIOLATION,
    VIOLATION_SCHEMA,
)
from hepdata_validator_ray.sketches import (
    SketchBundle,
    UnigramHistogram,
    chi_squared,
    kl_divergence,
)
from hepdata_validator_ray.state.manifest import CheckpointManifest, chunk_key

def _strip_prefix(prefix: str | None, f: str) -> str:
    """Remove the archive-mode temp-extraction prefix from a path (shared by
    the resume lineage, dup-pass keying and verdict scrubbing)."""
    return f[len(prefix):] if prefix and f.startswith(prefix) else f


# Stable Arrow schema for the mixed check-stage output stream.
MIXED_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("partition_id", pa.string()),
        ("row_idx", pa.int64()),
        ("doc_id", pa.string()),
        ("check_name", pa.string()),
        ("level", pa.string()),
        ("detail", pa.string()),
        ("n_rows", pa.int64()),
        ("payload", pa.binary()),
    ]
)


@dataclass
class ValidationConfig:
    ctx: CheckContext = field(default_factory=CheckContext)
    suite: CheckSuite | None = None  # default: build_default_suite(ctx.schema_version)
    batch_size: int = 8192
    concurrency: Any = None  # None → stateless-task autoscale; int/tuple → actor pool
    enable_sketches: bool = True
    enable_unigram: bool = True
    unigram_buckets: int | None = None  # None → full vocab (exact); set for 10^12 scale
    dup_check: bool = True
    drift_profile_bytes: bytes | None = None  # serialized SketchBundle reference profile
    #: drift statistic: "kl" (KL divergence of normalized histograms) or
    #: "chi2" (Pearson chi-squared of observed counts vs the profile's
    #: expected fractions — scales with partition size, so pair it with
    #: per-check thresholds via ``drift_thresholds``)
    drift_scorer: str = "kl"
    drift_kl_threshold: float = 0.15
    #: per-check threshold overrides, e.g. {"drift_n_tok": 0.1,
    #: "drift_source_mix": 0.05}; unlisted checks use drift_kl_threshold
    drift_thresholds: dict | None = None
    #: per-partition cap on all-padding rows — the A3 analogue of the
    #: reference's "≤1 underflow and ≤1 overflow bin per variable" rule
    #: (data_file_validator.py:173-222); None disables the partition check
    max_padding_rows_per_partition: int | None = 1
    chunk_files: int = 64  # files per resumable chunk
    preserve_order: bool = False
    #: when a chunk's mixed stream has fewer rows than this, finish it on the
    #: driver in one pull (the stream is 1-3% of input bytes; the distributed
    #: path kicks in for dirty or huge chunks)
    driver_collect_rows: int = 200_000
    #: fuse read+check into one whole-file task (FileCheckReader).  False →
    #: classic read_parquet → map_batches plan (used when input is a Dataset
    #: or when block-level splitting of huge files is needed)
    inline_read: bool = True
    #: expected input file list (a submission manifest).  When set, the
    #: engine runs the reference's linkage checks (J1/J2,
    #: full_submission_validator.py:200-316): files on disk but not expected
    #: → "is not referenced" violations; expected but absent → "Missing
    #: data_file" violations.  Metadata-only, driver-side set diff.
    expected_files: list[str] | None = None
    #: path prefix scrubbed from partition ids + details in all outputs —
    #: set by the archive entry mode so temp extraction dirs never leak into
    #: messages (reference _remove_temp_directory,
    #: full_submission_validator.py:236-249; tested
    #: test_full_submission_validator.py:217-230)
    scrub_prefix: str | None = None
    #: verify completed chunks' file fingerprints (size + parquet footer
    #: row/row-group counts — METADATA-only, no data pages) on resume and
    #: raise StaleCheckpointError when an already-validated input changed
    #: under the checkpoint: silently reusing a chunk result for different
    #: bytes is the one way resume can return wrong answers.  Byte-level
    #: certification is ``validation.corpus_digest_stats``.
    verify_resume_fingerprints: bool = True


class StaleCheckpointError(ValueError):
    """A completed chunk's input file changed since its manifest entry."""


def _file_fingerprint(path: str) -> list:
    """[size_bytes, n_rows, n_row_groups] — parquet footers only; non-parquet
    inputs fingerprint by size alone (-1 sentinels)."""
    size = int(os.stat(path).st_size)
    if path.endswith(".parquet"):
        try:
            import pyarrow.parquet as _pq

            md = _pq.ParquetFile(path).metadata
            return [size, int(md.num_rows), int(md.num_row_groups)]
        except Exception:
            pass
    return [size, -1, -1]


@dataclass
class ValidationResult:
    valid: bool
    n_rows: int
    n_violations: int
    violation_counts: dict[str, int]
    verdicts: pd.DataFrame  # per (partition_id, check_name)
    violations_path: str | None
    sketch: SketchBundle | None
    wall_s: float
    rows_per_s: float

    def summary(self) -> str:
        # mirrors the reference CLI verdict style (cli.py:20-30)
        lines = []
        if self.valid:
            lines.append("Validation successful.")
        else:
            lines.append("Invalid:")
            for name, cnt in sorted(self.violation_counts.items()):
                lines.append(f"\t error - {name}: {cnt} violation(s)")
        lines.append(f"{self.n_rows} rows validated in {self.wall_s:.2f}s ({self.rows_per_s:,.0f} rows/s)")
        return "\n".join(lines)

    def worst_partitions(self, k: int = 10) -> pd.DataFrame:
        """Top-k partitions by violation count (SURVEY.md §2.6's cheap
        addition: verdicts.sort(n_violations desc).limit(k))."""
        if not len(self.verdicts):
            return self.verdicts
        agg = (
            self.verdicts.groupby("partition_id", as_index=False)
            .n_violations.sum()
            .sort_values("n_violations", ascending=False, kind="mergesort")
        )
        return agg.head(k).reset_index(drop=True)

    def valid_partitions(self) -> list[str]:
        """Partitions with every check passed — ≙ the reference's
        ``valid_files`` bookkeeping (full_submission_validator.py:378-387)."""
        if not len(self.verdicts):
            return []
        ok = self.verdicts.groupby("partition_id").passed.all()
        return sorted(ok[ok].index)

    def print_errors(self, partition_id: str) -> None:
        """≙ ``Validator.print_errors`` (reference __init__.py:195-200):
        prints '\\t <level> - <message>' per failed check of one partition."""
        failed = self.verdicts[(self.verdicts.partition_id == partition_id) & (~self.verdicts.passed)]
        for _, r in failed.iterrows():
            print("\t", f"error - {r.check_name}: {r.detail or str(r.n_violations) + ' violation(s)'}")

    def drift_profile_bytes(self) -> bytes | None:
        """Serialize this run's global sketch as a drift reference profile
        for future runs (ValidationConfig.drift_profile_bytes)."""
        return self.sketch.to_bytes() if self.sketch else None

    def load_violations(self, sort: bool = True) -> "pa.Table | None":
        """Read back the violations parquet; ``sort=True`` applies the
        deterministic (partition_id, row_idx, check_name) order — the
        explicit ordering contract replacing the reference's insertion order
        (SURVEY.md §2.6)."""
        if not self.violations_path or not Path(self.violations_path).exists():
            return None
        import pyarrow.dataset as pads

        tbl = pads.dataset(self.violations_path).to_table()
        if sort and tbl.num_rows:
            idx = pc.sort_indices(
                tbl,
                sort_keys=[("partition_id", "ascending"), ("row_idx", "ascending"), ("check_name", "ascending")],
            )
            tbl = tbl.take(idx)
        return tbl


class CheckStage:
    """Callable class for ``map_batches`` — an actor when concurrency is set.

    ``__init__`` (once per actor): resolve the broadcast CheckContext, select
    version-active checks, pre-build the allowed-source value set.  (ST1
    pattern — the reference loads schemas once per validator instance,
    data_file_validator.py:49-61.)
    ``__call__`` (per batch): run every check vectorized, emit violation rows
    + one stats row and one sketch-partial row per (batch, partition).
    """

    def __init__(
        self,
        ctx: CheckContext,
        suite: CheckSuite,
        enable_sketches: bool = True,
        enable_unigram: bool = True,
        unigram_buckets: int | None = None,
    ):
        if isinstance(ctx, ray.ObjectRef):  # broadcast via ray.put
            ctx = ray.get(ctx)
        self.ctx = ctx
        self.checks = list(suite.for_version(ctx.schema_version).checks)
        self.enable_sketches = enable_sketches
        self.enable_unigram = enable_unigram
        self.unigram_buckets = unigram_buckets

    def _new_bundle(self) -> SketchBundle:
        b = SketchBundle()
        if self.enable_unigram:
            b.unigram = UnigramHistogram(self.ctx.vocab_size, self.unigram_buckets)
        return b

    def __call__(self, batch: pa.Table, row_offset: int | None = 0) -> pa.Table:
        """``row_offset``: index of this batch's first row within its file —
        supplied by FileCheckReader so violation ``row_idx`` is a
        deterministic file-absolute position (the ordering contract of
        SURVEY.md §2.6); 0 (batch-local) in the classic map_batches plan;
        None → row_idx is emitted null (bundle mode, where block order is
        not deterministic and doc_id is the row identity)."""
        paths = None
        if "path" in batch.column_names:
            paths = batch.column("path")
            batch = batch.drop_columns(["path"])
        view = prepare_view(batch)
        n = view["n"]
        # wrong-typed contract columns are absent from the view (their
        # kernels would crash); the column_type check reports them per-row
        present = set(batch.column_names) - set(view.get("wrong_type") or ())

        # ---- run checks (vectorized) ----------------------------------
        out_idx: list[np.ndarray] = []
        out_check: list[str] = []
        out_level: list[str] = []
        out_detail: list[str] = []
        schema_failed: np.ndarray | None = None
        for check in self.checks:
            if any(col not in present for col in check.columns):
                # input is missing a column this check needs — the
                # required-property violation is reported once per file by
                # the reader (FileCheckReader); running the kernel would
                # KeyError on the absent view entry
                continue
            res = check.fn(view, self.ctx)
            idx = res.indices
            if self.ctx.suppress_semantic_on_schema_error and check.kind == "semantic" and schema_failed is not None:
                keep = ~np.isin(idx, np.flatnonzero(schema_failed))
                idx = idx[keep]
                details = [d for d, k in zip(res.details, keep) if k]
            else:
                details = res.details
            if check.kind == "schema" and len(idx):
                if schema_failed is None:
                    schema_failed = np.zeros(n, dtype=bool)
                schema_failed[idx] = True
            if len(idx):
                out_idx.append(idx)
                out_check.extend([check.name] * len(idx))
                out_level.extend([res.level] * len(idx))
                out_detail.extend(details)

        # ---- partition segmentation -----------------------------------
        if paths is not None:
            enc = pc.dictionary_encode(paths.combine_chunks() if isinstance(paths, pa.ChunkedArray) else paths)
            path_codes = enc.indices.to_numpy(zero_copy_only=False)
            uniq_paths = enc.dictionary.to_pylist()
        else:
            path_codes = np.zeros(n, dtype=np.int64)
            uniq_paths = ["<unknown>"]

        doc_arr = view.get("doc_id")

        rows: dict[str, list] = {k: [] for k in MIXED_SCHEMA.names}

        def emit(kind, partition_id, row_idx, doc_id, check_name, level, detail, n_rows, payload):
            rows["kind"].append(kind)
            rows["partition_id"].append(partition_id)
            rows["row_idx"].append(row_idx)
            rows["doc_id"].append(doc_id)
            rows["check_name"].append(check_name)
            rows["level"].append(level)
            rows["detail"].append(detail)
            rows["n_rows"].append(n_rows)
            rows["payload"].append(payload)

        # violation rows — column-wise construction (no per-violation Python
        # dict appends; dirty partitions can make violations a large fraction
        # of the stream, so this block is vectorized like the checks)
        if out_idx:
            all_idx = np.concatenate(out_idx)
            nv = len(all_idx)
            doc_vals = (
                doc_arr.take(pa.array(all_idx)).to_pylist() if doc_arr is not None else [None] * nv
            )
            part_obj = np.asarray(uniq_paths, dtype=object)[path_codes[all_idx]]
            rows["kind"].extend([KIND_VIOLATION] * nv)
            rows["partition_id"].extend(part_obj.tolist())
            if row_offset is None:
                rows["row_idx"].extend([None] * nv)
            else:
                rows["row_idx"].extend((all_idx + row_offset).tolist())
            rows["doc_id"].extend(doc_vals)
            rows["check_name"].extend(out_check)
            rows["level"].extend(out_level)
            rows["detail"].extend(out_detail)
            rows["n_rows"].extend([None] * nv)
            rows["payload"].extend([None] * nv)

        # per-partition stats + sketch partials
        for code, pth in enumerate(uniq_paths):
            mask = path_codes == code
            cnt = int(mask.sum())
            emit(KIND_BATCH_STATS, pth, None, None, None, None, None, cnt, None)
            if self.enable_sketches:
                bundle = self._new_bundle()
                bundle.n_rows = cnt
                if doc_arr is not None:
                    docs = np.asarray(doc_arr.to_numpy(zero_copy_only=False))[mask]
                    bundle.hll_doc_id.add(docs[pd.notna(docs)])
                if "n_tok" in view:
                    bundle.n_tok_hist.add(view["n_tok"][mask & ~view["n_tok_null"]])
                if "source" in view:
                    src = np.asarray(view["source"].to_numpy(zero_copy_only=False))[mask]
                    bundle.source_freq.add(src[pd.notna(src)])
                if bundle.unigram is not None and "flat" in view:
                    offs, lens = view["offsets"], view["lens"]
                    if mask.all():
                        bundle.unigram.add(view["flat"])
                    else:
                        segs = [view["flat"][offs[r] : offs[r + 1]] for r in np.flatnonzero(mask & (lens > 0))]
                        if segs:
                            bundle.unigram.add(np.concatenate(segs))
                emit(KIND_SKETCH, pth, None, None, None, None, None, cnt, bundle.to_bytes())

        return pa.Table.from_pydict(rows, schema=MIXED_SCHEMA)


class FileCheckReader:
    """Whole-file check task: reads one parquet file row-group-wise (column
    pruned) and runs CheckStage on each slab — the fused read+check operator
    of the inline physical plan."""

    def __init__(
        self,
        batch_size: int = 16384,
        columns: list[str] | None = None,
        target_batch_bytes: int = 64 * 1024 * 1024,
        **stage_kwargs,
    ):
        self.batch_size = batch_size
        self.columns = columns
        #: cap batches by BYTES, not rows: wide token rows (8k+ tokens) would
        #: otherwise blow up batch memory (SURVEY.md §7 "wide tokens rows")
        self.target_batch_bytes = target_batch_bytes
        self.stage = CheckStage(**stage_kwargs)

    def _rows_per_batch(self, pf) -> int:
        md = pf.metadata
        if md.num_rows == 0:
            return self.batch_size
        total_bytes = sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))
        avg_row_bytes = max(1, total_bytes // md.num_rows)
        by_bytes = max(256, self.target_batch_bytes // avg_row_bytes)
        return int(min(self.batch_size, by_bytes))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        outs: list[pa.Table] = []
        for path in batch.column(batch.column_names[0]).to_pylist():
            # the try blocks cover ONLY parquet open/decode — an ArrowInvalid
            # raised by check/sketch code on a successfully decoded batch is a
            # bug and must surface, not masquerade as a parse-error violation
            parse_error: Exception | None = None
            off = 0
            try:
                pf = pq.ParquetFile(path)
            except (pa.ArrowInvalid, pa.ArrowIOError, OSError) as e:
                parse_error = e
            else:
                # required-column sweep: pyarrow silently DROPS requested
                # columns absent from the file, so detect them here and
                # report with the reference's jsonschema `required` grammar
                # ("'source' is a required property") — one row per missing
                # column per file; checks needing them are skipped downstream
                missing = [c for c in (self.columns or []) if c not in pf.schema_arrow.names]
                for col in missing:
                    outs.append(
                        pa.Table.from_pydict(
                            {
                                "kind": [KIND_VIOLATION],
                                "partition_id": [path],
                                "row_idx": pa.nulls(1, pa.int64()),
                                "doc_id": pa.nulls(1, pa.string()),
                                "check_name": ["required_columns"],
                                "level": ["error"],
                                "detail": [f"'{col}' is a required property"],
                                "n_rows": pa.nulls(1, pa.int64()),
                                "payload": pa.nulls(1, pa.binary()),
                            },
                            schema=MIXED_SCHEMA,
                        )
                    )
                read_cols = (
                    [c for c in self.columns if c not in missing] if self.columns else self.columns
                )
                it = pf.iter_batches(batch_size=self._rows_per_batch(pf), columns=read_cols)
                while True:
                    try:
                        rb = next(it)
                    except StopIteration:
                        break
                    except (pa.ArrowInvalid, pa.ArrowIOError, OSError) as e:
                        parse_error = e
                        break
                    tbl = pa.Table.from_batches([rb])
                    tbl = tbl.append_column("path", pa.array([path] * tbl.num_rows))
                    outs.append(self.stage(tbl, row_offset=off))
                    off += tbl.num_rows
                pf.close()
            if parse_error is not None:
                e = parse_error
                # parse errors become violations, not crashes — the
                # reference's YAML parse-error capture semantics
                # (data_file_validator.py:99-114: "There was a problem
                # parsing the file")
                outs.append(
                    pa.Table.from_pydict(
                        {
                            "kind": [KIND_VIOLATION],
                            "partition_id": [path],
                            "row_idx": pa.nulls(1, pa.int64()),
                            "doc_id": pa.nulls(1, pa.string()),
                            "check_name": ["partition_readable"],
                            "level": ["error"],
                            # byte-matches data_file_validator.py:112 format
                            "detail": ["There was a problem parsing the file.\n" + str(e)],
                            "n_rows": pa.nulls(1, pa.int64()),
                            "payload": pa.nulls(1, pa.binary()),
                        },
                        schema=MIXED_SCHEMA,
                    )
                )
                # stats row so the partition appears in verdicts with 0 rows
                outs.append(
                    pa.Table.from_pydict(
                        {
                            "kind": [KIND_BATCH_STATS],
                            "partition_id": [path],
                            "row_idx": pa.nulls(1, pa.int64()),
                            "doc_id": pa.nulls(1, pa.string()),
                            "check_name": pa.nulls(1, pa.string()),
                            "level": pa.nulls(1, pa.string()),
                            "detail": pa.nulls(1, pa.string()),
                            "n_rows": [0],
                            "payload": pa.nulls(1, pa.binary()),
                        },
                        schema=MIXED_SCHEMA,
                    )
                )
        if not outs:
            return MIXED_SCHEMA.empty_table()
        merged = pa.concat_tables(outs).combine_chunks()
        # collapse per-batch sketch partials to ONE row per file here, in the
        # task — the driver/reducer then merges #files payloads, not #batches
        is_sketch = pc.equal(merged["kind"], KIND_SKETCH)
        if pc.sum(pc.cast(is_sketch, pa.int64())).as_py() or 0:
            rest = merged.filter(pc.invert(is_sketch))
            sk = merged.filter(is_sketch)
            rows: dict[str, SketchBundle] = {}
            for pid, payload in zip(sk["partition_id"].to_pylist(), sk["payload"].to_pylist()):
                b = SketchBundle.from_bytes(payload)
                rows[pid] = rows[pid].merge(b) if pid in rows else b
            sk_tbl = pa.Table.from_pydict(
                {
                    "kind": [KIND_SKETCH] * len(rows),
                    "partition_id": list(rows),
                    "row_idx": pa.nulls(len(rows), pa.int64()),
                    "doc_id": pa.nulls(len(rows), pa.string()),
                    "check_name": pa.nulls(len(rows), pa.string()),
                    "level": pa.nulls(len(rows), pa.string()),
                    "detail": pa.nulls(len(rows), pa.string()),
                    "n_rows": [int(b.n_rows) for b in rows.values()],
                    "payload": [b.to_bytes() for b in rows.values()],
                },
                schema=MIXED_SCHEMA,
            )
            merged = pa.concat_tables([rest, sk_tbl])
        return merged


def duplicate_ids_dataset(files: list[str] | str, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Cross-partition duplicate doc_ids (the A1 global check): column-pruned
    read → per-batch value_counts (map-side combine, collapses hot duplicate
    classes before the exchange) → bucketed vectorized sum → count > 1.
    The one true all-to-all shuffle in the engine, and it moves only
    pre-combined (doc_id, cnt) partials keyed by a small int bucket."""
    from hepdata_validator_ray.ops import derive_num_buckets_path, grouped_value_counts

    if num_buckets is None:
        num_buckets = derive_num_buckets_path(files)

    if isinstance(files, list):
        # parse-error tolerance mirrors FileCheckReader's contract: an
        # unreadable file or one missing doc_id is skipped HERE — the heavy
        # pass already reports it as a partition_readable / required-column
        # violation — instead of crashing the whole validate() run
        def read_ids(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            outs = []
            for f in batch.column("path").to_pylist():
                try:
                    outs.append(pq.read_table(f, columns=["doc_id"]))
                except Exception:
                    continue
            if not outs:
                return pa.table({"doc_id": pa.nulls(0)})
            return pa.concat_tables(outs, promote_options="default")

        ds = ray.data.from_items([{"path": f} for f in files]).map_batches(
            read_ids, batch_format="pyarrow", batch_size=1
        )
    else:
        ds = ray.data.read_parquet(files, columns=["doc_id"])
    return grouped_value_counts(ds, "doc_id", min_count=2, num_buckets=num_buckets)


def _dup_member_count(ds: "ray.data.Dataset", num_buckets: int | None = None) -> int:
    """Total rows carrying a non-unique doc_id, as ONE distributed Sum over
    the collapsed (doc_id, cnt) dup-class table — the driver receives a
    single int, never the class list (at an adversarial dup rate the class
    table is corpus-scale)."""
    from ray.data.aggregate import Sum

    from hepdata_validator_ray.ops import grouped_value_counts

    classes = grouped_value_counts(ds, "doc_id", min_count=2, num_buckets=num_buckets)
    agg = classes.aggregate(Sum("cnt", alias_name="n_dup"))
    return int(agg["n_dup"] or 0)


def _merge_sketch_batch(batch: pa.Table) -> pa.Table:
    """Merge all sketch payload rows in a batch into one row (per partition
    set) — a tree-reduce step."""
    payloads = batch.column("payload").to_pylist()
    if not payloads:
        return batch
    merged = SketchBundle.from_bytes(payloads[0])
    for p in payloads[1:]:
        merged = merged.merge(SketchBundle.from_bytes(p))
    return pa.Table.from_pydict(
        {"payload": [merged.to_bytes()], "n_rows": [int(merged.n_rows)]},
        schema=pa.schema([("payload", pa.binary()), ("n_rows", pa.int64())]),
    )


def reduce_sketches(ds: "ray.data.Dataset", fanin: int = 32) -> SketchBundle | None:
    """Distributed tree-reduce of sketch rows → one SketchBundle.

    Each level merges ``fanin`` rows per task; the driver only ever sees the
    final handful of partials."""
    ds = ds.select_columns(["payload", "n_rows"])
    cnt = ds.count()
    if cnt == 0:
        return None
    while cnt > fanin:
        ds = ds.map_batches(_merge_sketch_batch, batch_format="pyarrow", batch_size=fanin)
        ds = ds.materialize()
        cnt = ds.count()
    payloads = [r["payload"] for r in ds.take_all()]
    out = SketchBundle.from_bytes(payloads[0])
    for p in payloads[1:]:
        out = out.merge(SketchBundle.from_bytes(p))
    return out


class ValidationEngine:
    def __init__(self, config: ValidationConfig | None = None):
        self.config = config or ValidationConfig()
        if self.config.suite is None:
            self.config.suite = build_default_suite(self.config.ctx.schema_version)

    # -- input handling -----------------------------------------------------
    @staticmethod
    def _list_files(input_path: str | list[str]) -> list[str]:
        if isinstance(input_path, list):
            return sorted(input_path)
        p = Path(input_path)
        if p.is_dir():
            return sorted(str(f) for f in p.rglob("*.parquet"))
        return [str(p)]

    def validate_dataset(self, ds: "ray.data.Dataset") -> ValidationResult:
        """Validate an in-memory/lazy Dataset (e.g. mid-pipeline after a
        transform) — the classic map_batches plan; no file lineage, no
        checkpointing (use ``validate`` on parquet paths for those)."""
        cfg = self.config
        t0 = time.perf_counter()
        stage = CheckStage(
            ctx=cfg.ctx,
            suite=cfg.suite,
            enable_sketches=cfg.enable_sketches,
            enable_unigram=cfg.enable_unigram,
            unigram_buckets=cfg.unigram_buckets,
        )
        mixed = ds.map_batches(
            lambda b: stage(b), batch_format="pyarrow", batch_size=cfg.batch_size, zero_copy_batch=True
        ).materialize()
        res = self._postprocess_mixed(mixed, chunk_index=0, out_dir=None)
        wall = time.perf_counter() - t0
        total_violations = res["n_violations"]
        # degrade like CheckStage does for missing columns: no doc_id
        # column → dup check skipped (the required-column sweep reports
        # it), not an opaque crash at execution
        has_doc_id = any(f == "doc_id" for f in ds.schema().names)
        if cfg.dup_check and has_doc_id:
            # n_dup counts ALL members of each duplicate group (the synth
            # ground truth, oracles and verdicts share this convention:
            # every row carrying a non-unique id is in violation); the
            # dup-class table is summed DISTRIBUTED — it never lands on
            # the driver (adversarial dup rates make it corpus-scale)
            n_dup = _dup_member_count(ds.select_columns(["doc_id"]))
            if n_dup:
                res["violation_counts"]["doc_id_duplicates"] = n_dup
                total_violations += n_dup
        return ValidationResult(
            valid=total_violations == 0,
            n_rows=res["n_rows"],
            n_violations=total_violations,
            violation_counts=res["violation_counts"],
            verdicts=res["verdicts"],
            violations_path=None,
            sketch=res["bundle"],
            wall_s=wall,
            rows_per_s=res["n_rows"] / wall if wall else 0.0,
        )

    # -- archive entry mode (S3/S4) ------------------------------------------
    @staticmethod
    def _archive_kind(path: str) -> str | None:
        if path.endswith((".zip", ".tar.gz", ".tgz", ".tar")):
            return "archive"
        if path.endswith(".parquet.gz"):
            return "gzip"
        return None

    def _error_result(self, check_name: str, path: str, detail: str) -> ValidationResult:
        verdicts = pd.DataFrame(
            [dict(partition_id=path, check_name=check_name, passed=False, n_rows=0, n_violations=1, detail=detail)]
        )
        return ValidationResult(
            valid=False, n_rows=0, n_violations=1, violation_counts={check_name: 1},
            verdicts=verdicts, violations_path=None, sketch=None, wall_s=0.0, rows_per_s=0.0,
        )

    def _validate_archive(self, archive: str, output_dir: str | None) -> ValidationResult:
        """Unpack a .zip/.tar.gz/.tgz/.tar (or single .parquet.gz) to a temp
        dir and validate the contained parquet dataset — the reference's most
        common entry mode (full_submission_validator.py:85-159).  Temp paths
        are scrubbed from every output; the temp dir is removed afterwards
        (reference :231-234)."""
        import gzip
        import shutil
        import tempfile

        p = Path(archive)
        if not p.is_file():
            # byte-matches full_submission_validator.py:90-91
            return self._error_result("archive_exists", archive, f"File {archive} does not exist.")
        tmp = tempfile.mkdtemp()
        try:
            if self._archive_kind(archive) == "gzip":
                target = Path(tmp) / p.name[:-3]
                try:
                    with gzip.GzipFile(archive, "rb") as gz, open(target, "wb") as out:
                        shutil.copyfileobj(gz, out)
                except Exception as e:
                    # byte-matches full_submission_validator.py:98-101
                    return self._error_result(
                        "archive_extract", archive, f"Unable to extract file {archive}. Error was: {e}"
                    )
            else:
                try:
                    shutil.unpack_archive(archive, tmp)
                except Exception as e:
                    return self._error_result(
                        "archive_extract", archive, f"Unable to extract file {archive}. Error was: {e}"
                    )
            files = sorted(str(f) for f in Path(tmp).rglob("*.parquet"))
            if not files:
                # grammar of "No submission.yaml file found in submission."
                # (full_submission_validator.py:110-112) over our data model
                return self._error_result("archive_content", archive, "No parquet files found in submission.")
            # nested validate runs on a shallow-copied config so concurrent
            # validate() calls on one engine never cross-contaminate scrub
            # prefixes / manifest keys (ADVICE r2)
            from dataclasses import replace as _dc_replace

            sub = ValidationEngine(_dc_replace(self.config, scrub_prefix=tmp + "/"))
            return sub.validate(files, output_dir=output_dir)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # -- single-bundle entry mode (≙ single-YAML split path) -----------------
    def validate_bundle(
        self,
        bundle_path: str,
        output_dir: str | None = None,
        table_column: str = "table",
        split_dir: str | None = None,
        table_suites: dict[str, str] | None = None,
    ) -> ValidationResult:
        """Validate ONE parquet file carrying several logical tables tagged
        by ``table_column`` — the analogue of the reference's single-YAML
        submission, which splits the document stream into per-table data
        files and validates each (full_submission_validator.py:175-176,
        252-261).  Rows route per table: the partition identity becomes
        ``<bundle>#<table>`` so verdicts/violations report per logical
        table; ``split_dir`` additionally writes the split as
        ``table=<name>/`` partitioned parquet (≙ S5 data-file writer) —
        resumable layout, one directory per logical table.

        ``table_suites`` maps a table tag to a REGISTERED suite name, so
        each logical table can validate under its own suite — the analogue
        of the reference resolving a different remote schema per data file
        via each table's ``data_schema`` key
        (full_submission_validator.py:330-347,411-421; VERDICT r2 missing
        #2).  Each override runs at its own suite's version; unlisted
        tables use the engine's default suite.  Unknown suite names raise
        the reference's unsupported-schema KeyError up front."""
        from dataclasses import replace as _dc_replace

        from hepdata_validator_ray.checks.base import get_check_suite

        cfg = self.config
        t0 = time.perf_counter()
        bundle_name = Path(bundle_path).name

        def make_stage(ctx: CheckContext, suite: CheckSuite) -> CheckStage:
            return CheckStage(
                ctx=ctx,
                suite=suite,
                enable_sketches=cfg.enable_sketches,
                enable_unigram=cfg.enable_unigram,
                unigram_buckets=cfg.unigram_buckets,
            )

        default_stage = make_stage(cfg.ctx, cfg.suite)
        # per-table override stages, built once on the driver (tiny closures:
        # a stage is a context + check list) and shipped with the task
        stage_by_table: dict[str, CheckStage] = {}
        required_cols = list(cfg.suite.required_columns())
        for tbl, sname in (table_suites or {}).items():
            s = get_check_suite(sname)  # raises reference-grammar KeyError
            stage_by_table[str(tbl)] = make_stage(
                _dc_replace(cfg.ctx, schema_version=s.version), s
            )
            for c in s.required_columns():
                if c not in required_cols:
                    required_cols.append(c)

        def route(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return MIXED_SCHEMA.empty_table()
            tbl_col = t.column(table_column)
            tbl_arr = tbl_col.combine_chunks() if isinstance(tbl_col, pa.ChunkedArray) else tbl_col
            # NULL table tags: coalesce to "" so (1) the row's path tag is
            # never null (CheckStage's path dictionary requires non-null),
            # and (2) the per-table routing below gives the row a real
            # dictionary code that matches no override → default suite.
            # Nulls used to encode as null indices (NaN in the codes array)
            # and the routing loop silently dropped those rows.
            tbl_arr = pc.fill_null(pc.cast(tbl_arr, pa.string()), "")
            tags = pc.binary_join_element_wise(
                pa.array([bundle_name + "#"] * t.num_rows, type=pa.string()),
                pc.cast(tbl_arr, pa.string()),
                "",
            )
            t = t.drop_columns([table_column]).append_column("path", tags)
            # row_offset=None: block order is not deterministic under the
            # streaming executor, so bundle-mode violations carry no
            # positional row_idx — doc_id is the row identity
            if not stage_by_table:
                return default_stage(t, row_offset=None)
            # per-table suite override: segment the batch by table tag and
            # run each segment under its table's stage
            enc = pc.dictionary_encode(pc.cast(tbl_arr, pa.string()))
            codes = enc.indices.to_numpy(zero_copy_only=False)
            outs = []
            for code, tname in enumerate(enc.dictionary.to_pylist()):
                idx = np.flatnonzero(codes == code)
                seg = t.take(pa.array(idx))
                outs.append(stage_by_table.get(tname, default_stage)(seg, row_offset=None))
            return pa.concat_tables(outs) if outs else MIXED_SCHEMA.empty_table()

        cols = required_cols
        ds = ray.data.read_parquet(bundle_path, columns=(cols + [table_column]) if cols else None)
        mixed = ds.map_batches(route, batch_format="pyarrow", batch_size=cfg.batch_size).materialize()
        partition_checks = {
            f"{bundle_name}#{tbl}": [c.name for c in st.checks] for tbl, st in stage_by_table.items()
        } or None
        res = self._postprocess_mixed(
            mixed,
            chunk_index=0,
            out_dir=Path(output_dir) if output_dir else None,
            partition_checks=partition_checks,
        )
        total_violations = res["n_violations"]
        # skip gracefully when the bundle has no doc_id column (the
        # required-column sweep reports it)
        try:
            import pyarrow.parquet as _pq_meta

            bundle_has_doc_id = "doc_id" in _pq_meta.read_schema(bundle_path).names
        except Exception:
            bundle_has_doc_id = False
        if cfg.dup_check and bundle_has_doc_id:
            # distributed sum over the dup-class table (never driver-resident)
            n_dup = _dup_member_count(ray.data.read_parquet(bundle_path, columns=["doc_id"]))
            if n_dup:
                res["violation_counts"]["doc_id_duplicates"] = n_dup
                total_violations += n_dup
        if split_dir is not None:
            ray.data.read_parquet(bundle_path).write_parquet(split_dir, partition_cols=[table_column])
        wall = time.perf_counter() - t0
        return ValidationResult(
            valid=total_violations == 0,
            n_rows=res["n_rows"],
            n_violations=total_violations,
            violation_counts=res["violation_counts"],
            verdicts=res["verdicts"],
            violations_path=str(Path(output_dir) / "violations") if output_dir else None,
            sketch=res["bundle"],
            wall_s=wall,
            rows_per_s=res["n_rows"] / wall if wall else 0.0,
        )

    # -- main entry ----------------------------------------------------------
    def validate(self, input_path: str | list[str], output_dir: str | None = None) -> ValidationResult:
        cfg = self.config
        if isinstance(input_path, str) and self._archive_kind(input_path):
            return self._validate_archive(input_path, output_dir)
        files = self._list_files(input_path)
        # BSD-tar "extended attribute" companions (._<name>, MacOS archives):
        # excluded from validation reads; surfaced as hint verdicts with the
        # reference's message when the actual file sits alongside
        # (full_submission_validator.py:202-228)
        appledouble = [
            f for f in files
            if Path(f).name.startswith("._") and (Path(f).parent / Path(f).name[2:]).is_file()
        ]
        appledouble_set = set(appledouble)
        files = [f for f in files if f not in appledouble_set]
        if not files:
            return ValidationResult(
                valid=True, n_rows=0, n_violations=0, violation_counts={},
                verdicts=pd.DataFrame(columns=["partition_id", "check_name", "passed", "n_rows", "n_violations", "detail"]),
                violations_path=None, sketch=None, wall_s=0.0, rows_per_s=0.0,
            )
        out_dir = Path(output_dir) if output_dir else None
        manifest = CheckpointManifest(out_dir / "manifest.jsonl") if out_dir else None

        # in archive mode every run extracts to a FRESH temp dir, so manifest
        # lineage must key on scrubbed (archive-relative) paths or resume
        # would both replay completed chunks AND re-validate every file
        def rel(f: str) -> str:
            return _strip_prefix(cfg.scrub_prefix, f)

        # resume is FILE-granular: a file inside any completed chunk is never
        # re-read, and only pending files are re-chunked — so incremental
        # ingest (new files appearing between runs, sorting anywhere in the
        # listing) revalidates exactly the new files
        completed_files: set[str] = set()
        if manifest:
            for e in manifest.get_all("chunk"):
                completed_files.update(e.get("files", ()))
        # staleness gate: a completed file whose bytes changed since its
        # manifest entry would silently reuse a WRONG chunk result — verify
        # the recorded metadata fingerprints (stat + parquet footer, no data
        # pages) before trusting the skip.  Old manifests without "fps"
        # entries skip verification (backward compatible).
        if manifest and cfg.verify_resume_fingerprints and completed_files:
            recorded: dict[str, list] = {}
            for e in manifest.get_all("chunk"):
                recorded.update(e.get("fps", {}))
            by_rel = {rel(f): f for f in files}
            for rf, fp_old in recorded.items():
                f = by_rel.get(rf)
                if f is None:
                    continue  # completed file no longer present — nothing to reuse wrongly
                fp_now = _file_fingerprint(f)
                if fp_now != list(fp_old):
                    raise StaleCheckpointError(
                        f"checkpoint manifest records fingerprint {fp_old} for "
                        f"'{rf}' but the file on disk is now {fp_now}; the "
                        "completed-chunk results no longer describe this input — "
                        "delete the output dir (or revert the file) to revalidate"
                    )
        pending = [f for f in files if rel(f) not in completed_files]
        chunks = [pending[i : i + cfg.chunk_files] for i in range(0, len(pending), cfg.chunk_files)]
        t0 = time.perf_counter()
        total_rows = 0
        total_violations = 0
        violation_counts: dict[str, int] = {}
        verdict_frames: list[pd.DataFrame] = []
        bundles: list[SketchBundle] = []

        for f in appledouble:
            name = Path(f).name
            verdict_frames.append(
                pd.DataFrame(
                    [
                        dict(
                            partition_id=rel(f),
                            check_name="partition_referenced",
                            passed=False,
                            n_rows=0,
                            n_violations=1,
                            detail=f"{name} is not referenced in the submission.",
                        ),
                        dict(
                            partition_id=rel(f),
                            check_name="appledouble_hint",
                            passed=False,
                            n_rows=0,
                            n_violations=0,
                            # byte-matches full_submission_validator.py:225-227
                            detail=f"{name} might be a file created by tar on MacOS. "
                            "Set COPYFILE_DISABLE=1 before creating the archive.",
                        ),
                    ]
                )
            )
            violation_counts["partition_referenced"] = violation_counts.get("partition_referenced", 0) + 1
            total_violations += 1

        # file↔manifest linkage checks (J1/J2) — metadata-only set diff.
        # Compared on SCRUBBED paths: expected_files is archive-relative, so
        # archive entry mode (temp extraction paths) links correctly instead
        # of flagging every file both missing and unreferenced (ADVICE r2).
        if cfg.expected_files is not None:
            expected = {rel(f) for f in cfg.expected_files}
            found = {rel(f) for f in files}
            linkage = []
            for f in sorted(found - expected):
                # byte-matches "{f} is not referenced in the submission."
                # (full_submission_validator.py:221-222)
                linkage.append(
                    dict(partition_id=f, check_name="partition_referenced", passed=False,
                         n_rows=0, n_violations=1,
                         detail=f"{Path(f).name} is not referenced in the submission.")
                )
            for f in sorted(expected - found):
                # byte-matches "Missing data_file '%s'." (full_submission_validator.py:313-314)
                linkage.append(
                    dict(partition_id=f, check_name="partition_present", passed=False,
                         n_rows=0, n_violations=1, detail="Missing data_file '%s'." % Path(f).name)
                )
            if linkage:
                verdict_frames.append(pd.DataFrame(linkage))
                for r in linkage:
                    violation_counts[r["check_name"]] = violation_counts.get(r["check_name"], 0) + 1
                    total_violations += 1

        # replay completed chunks from the manifest (resume path)
        if manifest:
            for e in manifest.get_all("chunk"):
                total_rows += e["n_rows"]
                total_violations += e["n_violations"]
                for k, v in e.get("violation_counts", {}).items():
                    violation_counts[k] = violation_counts.get(k, 0) + v
                if e.get("bundle_b64"):
                    bundles.append(SketchBundle.from_bytes(CheckpointManifest.decode_bundle(e["bundle_b64"])))
                if e.get("verdicts"):
                    verdict_frames.append(pd.DataFrame(e["verdicts"]))

        # ---- PASS 2 launched CONCURRENTLY: duplicate doc_id detection ------
        # (column-pruned, independent of the chunk outputs — overlapping it
        # with the heavy pass removes a serialized phase from the wall)
        dup_result: dict = {}
        dup_thread = None
        if cfg.dup_check:
            import threading

            def _dup_worker():
                try:
                    dup_result["summary"] = self._dup_pass(files, out_dir, manifest)
                except BaseException as e:  # surfaced after join
                    dup_result["error"] = e

            dup_thread = threading.Thread(target=_dup_worker, daemon=True)
            dup_thread.start()

        chunk_index_base = len(manifest.get_all("chunk")) if manifest else 0
        for ci, chunk in enumerate(chunks, start=chunk_index_base):
            ckey = chunk_key([rel(f) for f in chunk])
            res = self._run_chunk(chunk, ci, out_dir)
            total_rows += res["n_rows"]
            total_violations += res["n_violations"]
            for k, v in res["violation_counts"].items():
                violation_counts[k] = violation_counts.get(k, 0) + v
            if res["bundle"] is not None:
                bundles.append(res["bundle"])
            verdict_frames.append(res["verdicts"])
            if manifest:
                manifest.append(
                    {
                        "type": "chunk",
                        "chunk_key": ckey,
                        "chunk_index": ci,
                        "files": [rel(f) for f in chunk],
                        "fps": {rel(f): _file_fingerprint(f) for f in chunk},
                        "n_rows": res["n_rows"],
                        "n_violations": res["n_violations"],
                        "violation_counts": res["violation_counts"],
                        "wall_s": res["wall_s"],
                        "rows_per_s": res["n_rows"] / res["wall_s"] if res["wall_s"] else 0.0,
                        "bundle_b64": (
                            CheckpointManifest.encode_bundle(res["bundle"].to_bytes()) if res["bundle"] else None
                        ),
                        "verdicts": res["verdicts"].to_dict(orient="list"),
                    }
                )

        if cfg.dup_check:
            dup_thread.join()
            if "error" in dup_result:
                raise dup_result["error"]
            # n_dup counts ALL members of each duplicate group (the synth
            # ground truth, oracles and verdicts share this convention)
            n_dup = dup_result["summary"]["n_dup_rows"]
            if n_dup:
                violation_counts["doc_id_duplicates"] = violation_counts.get("doc_id_duplicates", 0) + n_dup
                total_violations += n_dup

        wall = time.perf_counter() - t0
        verdicts = (
            pd.concat(verdict_frames, ignore_index=True)
            if verdict_frames
            else pd.DataFrame(columns=["partition_id", "check_name", "passed", "n_rows", "n_violations", "detail"])
        )
        sketch = None
        if bundles:
            sketch = bundles[0]
            for b in bundles[1:]:
                sketch = sketch.merge(b)
        if out_dir is not None and len(verdicts):
            # verdict table sink (≙ S5 data-file writer / valid_files output)
            import pyarrow.parquet as pq

            vdir = out_dir / "verdicts"
            vdir.mkdir(parents=True, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(verdicts, preserve_index=False), vdir / "verdicts.parquet")
        return ValidationResult(
            valid=total_violations == 0,
            n_rows=total_rows,
            n_violations=total_violations,
            violation_counts=violation_counts,
            verdicts=verdicts,
            violations_path=str(out_dir / "violations") if out_dir else None,
            sketch=sketch,
            wall_s=wall,
            rows_per_s=total_rows / wall if wall else 0.0,
        )

    # -- one resumable chunk -------------------------------------------------
    def _run_chunk(self, files: list[str], chunk_index: int, out_dir: Path | None) -> dict:
        cfg = self.config
        t0 = time.perf_counter()
        cols = cfg.suite.required_columns()
        stage_kwargs = dict(
            ctx=cfg.ctx,
            suite=cfg.suite,
            enable_sketches=cfg.enable_sketches,
            enable_unigram=cfg.enable_unigram,
            unigram_buckets=cfg.unigram_buckets,
        )
        if cfg.inline_read:
            # default physical plan: one task per input file; the task reads
            # its file ROW-GROUP-WISE (pruned to the check columns) and runs
            # the check suite in-place, emitting only the tiny mixed stream.
            # The 770MB-per-GB raw token data never round-trips the object
            # store, the file is the lineage/retry unit, and worker demand
            # is capped at #files (no block-split worker-churn storms).
            reader = FileCheckReader(batch_size=cfg.batch_size, columns=cols or None, **stage_kwargs)
            mixed = (
                ray.data.from_items(files, override_num_blocks=max(1, len(files)))
                .map_batches(reader, batch_size=1, batch_format="pyarrow")
                .materialize()
            )
        else:
            ds = ray.data.read_parquet(
                files, columns=cols or None, include_paths=True, override_num_blocks=len(files)
            )
            kwargs: dict[str, Any] = dict(
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                zero_copy_batch=True,
            )
            if cfg.concurrency is not None:
                # explicit actor pool: state (compiled suite + broadcast
                # manifest) built once per actor (ST1 pattern)
                kwargs["concurrency"] = cfg.concurrency
                kwargs["fn_constructor_kwargs"] = stage_kwargs
                mixed = ds.map_batches(CheckStage, **kwargs).materialize()
            else:
                stage = CheckStage(**stage_kwargs)
                mixed = ds.map_batches(lambda b: stage(b), **kwargs).materialize()

        if cfg.scrub_prefix:
            # archive mode: strip the temp extraction dir from partition ids
            # and messages before anything is written or reported
            pref = cfg.scrub_prefix

            def scrub(t: pa.Table) -> pa.Table:
                for col in ("partition_id", "detail"):
                    idx = t.column_names.index(col)
                    t = t.set_column(idx, col, pc.replace_substring(t[col], pattern=pref, replacement=""))
                return t

            mixed = mixed.map_batches(scrub, batch_format="pyarrow").materialize()

        res = self._postprocess_mixed(mixed, chunk_index, out_dir)
        res["wall_s"] = time.perf_counter() - t0
        return res

    def _postprocess_mixed(
        self,
        mixed: "ray.data.Dataset",
        chunk_index: int,
        out_dir: Path | None,
        partition_checks: dict[str, list[str]] | None = None,
    ) -> dict:
        """Split the materialized mixed stream into violations / verdicts /
        sketches.  The stream is tiny relative to the input (violations +
        fixed-size partials): when it fits comfortably on the driver, pull it
        ONCE and finish driver-side (one execution instead of five);
        otherwise use the distributed path.  count() on a materialized
        dataset is metadata-only."""
        cfg = self.config
        drift_df: pd.DataFrame | None = None
        # byte gate alongside the row gate: sketch rows carry pickled
        # payloads (an unbucketed unigram row is ~vocab×8 bytes), so a
        # row count under the threshold can still hide tens of GB;
        # size_bytes() on a materialized dataset is metadata-only
        collect_ok = mixed.count() <= cfg.driver_collect_rows
        if collect_ok:
            try:
                collect_ok = (mixed.size_bytes() or 0) <= 2 * 1024**3
            except Exception:
                pass
        if collect_ok:
            refs = mixed.to_arrow_refs()
            tables = ray.get(refs) if refs else []
            mixed_tbl = (
                pa.concat_tables(tables).combine_chunks() if tables else MIXED_SCHEMA.empty_table()
            )
            vio_tbl = mixed_tbl.filter(pc.equal(mixed_tbl["kind"], KIND_VIOLATION)).select(
                ["partition_id", "row_idx", "doc_id", "check_name", "level", "detail"]
            )
            if out_dir is not None:
                vdir = self._fresh_chunk_dir(out_dir, chunk_index)
                import pyarrow.parquet as pq

                pq.write_table(vio_tbl, vdir / "part-0.parquet")
            vio_df = vio_tbl.select(["partition_id", "check_name"]).to_pandas()
            vio_counts_df = (
                vio_df.groupby(["partition_id", "check_name"], as_index=False).size().rename(columns={"size": "count()"})
            )
            stats_tbl = mixed_tbl.filter(pc.equal(mixed_tbl["kind"], KIND_BATCH_STATS))
            stats_df = (
                stats_tbl.select(["partition_id", "n_rows"])
                .to_pandas()
                .groupby("partition_id", as_index=False)["n_rows"]
                .sum()
            )
            req_df = vio_tbl.filter(pc.equal(vio_tbl["check_name"], "required_columns")).select(
                ["partition_id", "detail"]
            ).to_pandas()
            verdicts = self._build_verdicts(stats_df, vio_counts_df, req_df, partition_checks)
            bundle = None
            if cfg.enable_sketches:
                sk_df = mixed_tbl.filter(pc.equal(mixed_tbl["kind"], KIND_SKETCH)).select(
                    ["partition_id", "n_rows", "payload"]
                ).to_pandas()
                per_part: dict[str, SketchBundle] = {}
                for pid, payload in zip(sk_df["partition_id"].to_numpy(), sk_df["payload"].to_numpy()):
                    b = SketchBundle.from_bytes(payload)
                    per_part[pid] = per_part[pid].merge(b) if pid in per_part else b
                if cfg.drift_profile_bytes is not None:
                    drift_df = self._drift_from_bundles(per_part)
                    verdicts = pd.concat([verdicts, drift_df], ignore_index=True)
                for b in per_part.values():
                    bundle = b if bundle is None else bundle.merge(b)
        else:
            violations = mixed.map_batches(
                lambda t: t.filter(pc.equal(t["kind"], KIND_VIOLATION)).select(
                    ["partition_id", "row_idx", "doc_id", "check_name", "level", "detail"]
                ),
                batch_format="pyarrow",
            )
            if out_dir is not None:
                vdir = self._fresh_chunk_dir(out_dir, chunk_index)
                violations.write_parquet(str(vdir))

            # per-(partition, check) violation counts — small grouped aggregate
            vio_counts_df = (
                mixed.map_batches(
                    lambda t: t.filter(pc.equal(t["kind"], KIND_VIOLATION)).select(["partition_id", "check_name"]),
                    batch_format="pyarrow",
                )
                .groupby(["partition_id", "check_name"])
                .count()
                .to_pandas()
            )
            # per-partition row counts from stats rows
            stats_df = (
                mixed.map_batches(
                    lambda t: t.filter(pc.equal(t["kind"], KIND_BATCH_STATS)).select(["partition_id", "n_rows"]),
                    batch_format="pyarrow",
                )
                .groupby("partition_id")
                .sum("n_rows")
                .to_pandas()
            )
            stats_df = stats_df.rename(columns={"sum(n_rows)": "n_rows"})

            req_df = (
                violations.map_batches(
                    lambda t: t.filter(pc.equal(t["check_name"], "required_columns")).select(
                        ["partition_id", "detail"]
                    ),
                    batch_format="pyarrow",
                ).to_pandas()
                if "required_columns" in set(vio_counts_df.get("check_name", []))
                else pd.DataFrame(columns=["partition_id", "detail"])
            )
            verdicts = self._build_verdicts(stats_df, vio_counts_df, req_df, partition_checks)

            # sketches: per-partition merge for drift + global tree reduce
            bundle = None
            if cfg.enable_sketches:
                sketch_rows = mixed.map_batches(
                    lambda t: t.filter(pc.equal(t["kind"], KIND_SKETCH)).select(
                        ["partition_id", "n_rows", "payload"]
                    ),
                    batch_format="pyarrow",
                ).materialize()
                if cfg.drift_profile_bytes is not None:
                    drift_df = self._drift_verdicts(sketch_rows)
                    verdicts = pd.concat([verdicts, drift_df], ignore_index=True)
                bundle = reduce_sketches(sketch_rows)

        n_rows = int(stats_df["n_rows"].sum()) if len(stats_df) else 0
        vc = (
            vio_counts_df.groupby("check_name")["count()"].sum().astype(int).to_dict()
            if len(vio_counts_df)
            else {}
        )
        # failed drift verdicts count as violations so ValidationResult.valid
        # and summary() agree with valid_partitions() (round-1 ADVICE: drift
        # failures previously left valid=True while excluding the partition)
        if drift_df is not None and len(drift_df):
            for _, r in drift_df[~drift_df["passed"]].iterrows():
                vc[r["check_name"]] = vc.get(r["check_name"], 0) + max(int(r["n_violations"]), 1)
        return {
            "n_rows": n_rows,
            "n_violations": int(sum(vc.values())),
            "violation_counts": vc,
            "verdicts": verdicts,
            "bundle": bundle,
        }

    @staticmethod
    def _fresh_chunk_dir(out_dir: Path, chunk_index: int) -> Path:
        """Chunk violation dir, CLEARED if a stale copy exists — a run that
        died after write_parquet but before its manifest line committed must
        not leave part files that duplicate the rerun's output (round-1
        ADVICE: crash-resume could double violations)."""
        import shutil

        vdir = out_dir / "violations" / f"chunk={chunk_index:05d}"
        if vdir.exists():
            shutil.rmtree(vdir)
        vdir.mkdir(parents=True, exist_ok=True)
        return vdir

    def _build_verdicts(
        self,
        stats_df: pd.DataFrame,
        vio_counts_df: pd.DataFrame,
        required_df: pd.DataFrame | None = None,
        partition_checks: dict[str, list[str]] | None = None,
    ) -> pd.DataFrame:
        """Vectorized: cross(partitions × active checks) merged with the
        grouped violation counts — no per-(partition, check) Python loop
        (100k-file runs produce millions of verdict rows).

        ``required_df`` (partition_id, detail) carries the reader's
        missing-required-column violations: checks depending on a missing
        column are marked NOT RUN (passed=False) instead of spuriously
        passing, and the partition gets a ``required_columns`` verdict."""
        cfg = self.config
        if not len(stats_df):
            return pd.DataFrame(columns=["partition_id", "check_name", "passed", "n_rows", "n_violations", "detail"])
        parts = stats_df[["partition_id", "n_rows"]].copy()
        parts["n_rows"] = parts["n_rows"].astype("int64")
        counts = (
            vio_counts_df.rename(columns={"count()": "nv"})
            if len(vio_counts_df)
            else pd.DataFrame(columns=["partition_id", "check_name", "nv"])
        )

        check_names = [c.name for c in cfg.suite.checks]
        if partition_checks:
            # per-partition suite overrides (bundle table_suites): partitions
            # sharing an active-check list cross-join as one group, so an
            # override partition reports verdicts ONLY for its own suite's
            # checks — still no per-(partition, check) Python loop
            by_list: dict[tuple, list[str]] = {}
            for pid in parts["partition_id"]:
                key = tuple(partition_checks.get(pid, check_names))
                by_list.setdefault(key, []).append(pid)
            base = pd.concat(
                [
                    parts[parts["partition_id"].isin(pids)].merge(
                        pd.DataFrame({"check_name": list(names)}), how="cross"
                    )
                    for names, pids in by_list.items()
                ],
                ignore_index=True,
            )
            for names in by_list:  # override-only checks join the order map
                for n in names:
                    if n not in check_names:
                        check_names.append(n)
        else:
            base = parts.merge(pd.DataFrame({"check_name": check_names}), how="cross")
        base = base.merge(counts, on=["partition_id", "check_name"], how="left")
        base["n_violations"] = base["nv"].to_numpy(dtype="float64", na_value=0.0).astype("int64")
        base["passed"] = base["n_violations"] == 0
        base["detail"] = np.where(
            base["passed"], "", base["n_violations"].astype(str) + " violation(s)"
        )

        frames = [base]
        if required_df is not None and len(required_df):
            # "'source' is a required property" → source
            missing = required_df.copy()
            missing["col"] = missing["detail"].str.extract(r"^'([^']+)'")
            # checks that NEED a missing column were skipped — not passed
            dep = pd.DataFrame(
                [
                    {"check_name": c.name, "col": col}
                    for c in cfg.suite.checks
                    for col in c.columns
                ]
            )
            skipped = missing.merge(dep, on="col")[["partition_id", "check_name"]].drop_duplicates()
            skip_key = set(map(tuple, skipped.to_numpy()))
            mask = base.set_index(["partition_id", "check_name"]).index.isin(skip_key)
            base.loc[mask, "passed"] = False
            base.loc[mask, "n_violations"] = 0
            base.loc[mask, "detail"] = "not run: missing required column"
            # and one required_columns verdict per affected partition
            req = (
                missing.groupby("partition_id")["col"]
                .apply(lambda s: ", ".join(sorted(set(s))))
                .reset_index(name="cols")
                .merge(parts, on="partition_id", how="left")
            )
            req["n_rows"] = req["n_rows"].to_numpy(dtype="float64", na_value=0.0).astype("int64")
            req["check_name"] = "required_columns"
            req["passed"] = False
            req["n_violations"] = missing.groupby("partition_id")["col"].nunique().values
            req["detail"] = "missing required column(s): " + req["cols"]
            frames.append(req)
        if cfg.max_padding_rows_per_partition is not None:
            # partition-level sentinel-count rule (A3): at most K
            # all-padding rows per partition
            k = cfg.max_padding_rows_per_partition
            pad = parts.merge(
                counts[counts.check_name == "tokens_not_all_zero"][["partition_id", "nv"]],
                on="partition_id",
                how="left",
            )
            n_pad = pad["nv"].to_numpy(dtype="float64", na_value=0.0).astype("int64")
            n_pad = pd.Series(n_pad, index=pad.index)
            pad["check_name"] = "partition_padding_limit"
            pad["passed"] = n_pad <= k
            pad["n_violations"] = np.where(pad["passed"], 0, n_pad)
            pad["detail"] = np.where(
                pad["passed"], "", n_pad.astype(str) + f" all-padding rows exceed limit of {k}"
            )
            frames.insert(0, pad)

        unreadable = counts[counts.check_name == "partition_readable"]
        if len(unreadable):
            ur = parts.merge(unreadable[["partition_id", "nv"]], on="partition_id", how="inner")
            ur["check_name"] = "partition_readable"
            ur["passed"] = False
            ur["n_violations"] = ur["nv"].astype("int64")
            ur["detail"] = "file could not be parsed"
            frames.append(ur)

        cols = ["partition_id", "check_name", "passed", "n_rows", "n_violations", "detail"]
        out = pd.concat([f[cols] for f in frames], ignore_index=True)
        # per-partition ordering: padding rule first, then suite order, then
        # readability — the order the loop-based builder produced
        order = {
            "partition_padding_limit": -1,
            "partition_readable": len(check_names) + 1,
            "required_columns": len(check_names) + 2,
        }
        order.update({n: i for i, n in enumerate(check_names)})
        out["__o__"] = out["check_name"].map(order)
        out = (
            out.sort_values(["partition_id", "__o__"], kind="mergesort")
            .drop(columns="__o__")
            .reset_index(drop=True)
        )
        return out

    def _drift_score_bundle(self, partition_id: str, merged: SketchBundle, profile: SketchBundle) -> list[dict]:
        cfg = self.config
        scorer = cfg.drift_scorer
        if scorer not in ("kl", "chi2"):
            raise ValueError(f"unknown drift_scorer {scorer!r} (expected 'kl' or 'chi2')")
        tag = "KL" if scorer == "kl" else "CHI2"

        def thr_for(name: str) -> float:
            return (cfg.drift_thresholds or {}).get(name, cfg.drift_kl_threshold)

        def stat(obs: np.ndarray, ref: np.ndarray) -> float:
            # both take raw counts: KL normalizes both sides internally;
            # chi-squared tests observed counts against the profile fractions
            obs = np.asarray(obs, dtype=np.float64)
            ref = np.asarray(ref, dtype=np.float64)
            if scorer == "chi2":
                return chi_squared(obs, ref)
            return kl_divergence(obs, ref)

        def rec(name: str, val: float, label: str) -> dict:
            thr = thr_for(name)
            return dict(
                partition_id=partition_id,
                check_name=name,
                passed=bool(val <= thr),
                n_rows=int(merged.n_rows),
                n_violations=0 if val <= thr else 1,
                detail=f"{tag}({label})={val:.6f} threshold={thr}",
            )

        recs = [rec("drift_n_tok", stat(merged.n_tok_hist.counts, profile.n_tok_hist.counts), "n_tok")]
        if profile.unigram is not None and merged.unigram is not None:
            recs.append(
                rec("drift_token_unigram", stat(merged.unigram.counts, profile.unigram.counts), "unigram")
            )
        # source-mix drift: the partition's source distribution vs the
        # profile's (exact low-cardinality frequency maps)
        keys = sorted(set(merged.source_freq.counts) | set(profile.source_freq.counts))
        if keys:
            p = np.array([merged.source_freq.counts.get(k, 0) for k in keys], dtype=float)
            q = np.array([profile.source_freq.counts.get(k, 0) for k in keys], dtype=float)
            if p.sum() > 0 and q.sum() > 0:
                recs.append(rec("drift_source_mix", stat(p, q), "source_mix"))
        return recs

    def _drift_from_bundles(self, per_part: dict[str, SketchBundle]) -> pd.DataFrame:
        profile = SketchBundle.from_bytes(self.config.drift_profile_bytes)
        recs: list[dict] = []
        for pid in sorted(per_part):
            recs.extend(self._drift_score_bundle(pid, per_part[pid], profile))
        return pd.DataFrame(recs, columns=["partition_id", "check_name", "passed", "n_rows", "n_violations", "detail"])

    def _drift_verdicts(self, sketch_rows: "ray.data.Dataset") -> pd.DataFrame:
        """Per-partition KL drift of n_tok and token-unigram histograms vs the
        broadcast reference profile (A5).  groupby(partition_id) is a small
        shuffle of fixed-size partial rows, not of data."""
        profile = SketchBundle.from_bytes(self.config.drift_profile_bytes)
        score = self._drift_score_bundle

        def score_group(g: pd.DataFrame) -> pd.DataFrame:
            merged = SketchBundle.from_bytes(g["payload"].iloc[0])
            for p in g["payload"].iloc[1:]:
                merged = merged.merge(SketchBundle.from_bytes(p))
            return pd.DataFrame(score(g["partition_id"].iloc[0], merged, profile))

        return sketch_rows.groupby("partition_id").map_groups(score_group, batch_format="pandas").to_pandas()

    # -- duplicate pass ------------------------------------------------------
    def _dup_pass(
        self, files: list[str], out_dir: Path | None, manifest: CheckpointManifest | None
    ) -> dict:
        """Distributed duplicate pass (A1).  The dup set NEVER lands on the
        driver: ``duplicate_ids_dataset`` collapses to distributed
        (doc_id, cnt) dup-class blocks, the violation rows are emitted by
        ``map_batches`` and sunk with a distributed ``write_parquet``, and
        only the two counts (+ the parquet path) enter the manifest.  At an
        adversarial dup rate — e.g. 20% of 10^12 rows duplicated, the exact
        input a validator must survive — the driver holds two ints, not the
        dup list (reference analogue: submission_file_validator.py:140-156
        holds the table-name set in memory; at its scale that is fine).

        Returns ``{"n_duplicate_ids": classes, "n_dup_rows": member rows}``.
        """
        # key on scrubbed paths so archive mode (fresh temp dir per run)
        # recognizes the same input set across runs
        files_key = chunk_key([_strip_prefix(self.config.scrub_prefix, f) for f in files])
        if manifest and manifest.has("dup_pass"):
            e = manifest.get_all("dup_pass")[-1]
            # reuse only when the INPUT FILE SET is unchanged — incremental
            # ingest must re-shuffle doc_ids across old+new files
            if e.get("files_key") == files_key and "n_dup_rows" in e:
                return {
                    "n_duplicate_ids": int(e["n_duplicate_ids"]),
                    "n_dup_rows": int(e["n_dup_rows"]),
                }
        t0 = time.perf_counter()
        dup_ds = duplicate_ids_dataset(files).materialize()
        n_classes = dup_ds.count()
        n_dup_rows = 0
        if n_classes:
            from ray.data.aggregate import Sum

            agg = dup_ds.aggregate(Sum("cnt", alias_name="n_dup_rows"))
            n_dup_rows = int(agg["n_dup_rows"] or 0)
        dups_path = None
        if out_dir is not None and n_classes:

            def to_violations(t: pa.Table) -> pa.Table:
                ids = t.column("doc_id").to_pylist()
                return pa.Table.from_pydict(
                    {
                        "partition_id": ["<global>"] * len(ids),
                        "row_idx": pa.nulls(len(ids), pa.int64()),
                        "doc_id": [str(d) for d in ids],
                        "check_name": ["doc_id_duplicates"] * len(ids),
                        "level": ["error"] * len(ids),
                        "detail": [M.msg_duplicate("doc_id", d) for d in ids],
                    },
                    schema=VIOLATION_SCHEMA,
                )

            ddir = out_dir / "violations" / "duplicates"
            ddir.mkdir(parents=True, exist_ok=True)
            dup_ds.map_batches(to_violations, batch_format="pyarrow").write_parquet(str(ddir))
            dups_path = str(ddir)
        if manifest:
            manifest.append(
                {
                    "type": "dup_pass",
                    "files_key": files_key,
                    "n_duplicate_ids": int(n_classes),
                    "n_dup_rows": int(n_dup_rows),
                    "dups_path": dups_path,
                    "wall_s": time.perf_counter() - t0,
                }
            )
        return {"n_duplicate_ids": int(n_classes), "n_dup_rows": int(n_dup_rows)}
