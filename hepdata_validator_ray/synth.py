"""Deterministic synthetic generator for the pre-tokenized sequence table.

BASELINE.json ``input_hint`` fixes the input shape::

    (doc_id: string, tokens: list<int32>, n_tok: int32, source: string)

No external data exists at this shape, so tests and benchmarks synthesise it
deterministically (seeded numpy; same tag → byte-identical files) at a small
scale of the 10^12-sequence layout.  A known fraction of rows carries
*injected violations* — one family per check in the suite — with closed-form
ground truth (``expected_violation_rows``) so conformance tests can assert
exact violation sets, mirroring the reference's valid/invalid fixture-pair
strategy (reference testsuite/test_data/*.yaml pairs).

Output is a multi-file Parquet directory (``part-NNNNN.parquet``); each file
is one lineage partition, which the engine's checkpoint manifest and resume
path key on.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from hepdata_validator_ray.schema import (
    DEFAULT_MAX_SEQ_LEN,
    DEFAULT_SOURCES,
    DEFAULT_VOCAB_SIZE,
    SEQUENCE_SCHEMA,
)

#: bump to invalidate previously cached synthetic dirs
SYNTH_VERSION = 5

SYNTH_ROOT = Path(os.environ.get("HVR_SYNTH_ROOT", "/tmp/hvr_synth"))

#: rows per scale-factor tag (tag = basename of the testdata dir)
ROWS_BY_TAG = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}

# Injection rule: (row_idx % modulus == residue) → violation family.
# Moduli are pairwise-coprime-ish primes so families overlap rarely but
# deterministically.  Priority order matters: later rules in INJECTIONS win
# when they rewrite the same field.
INJ_LEN_MISMATCH = (101, 7)      # n_tok = len(tokens) + 3
INJ_TOKEN_RANGE = (211, 13)      # one token set to vocab_size + 5
INJ_BAD_SOURCE = (307, 17)       # source = 'crawlz'
INJ_BAD_DOC_FMT = (401, 19)      # doc_id uppercased (fails ^doc-[a-z0-9]+-\d{8}$)
INJ_NULL_DOC = (997, 23)         # doc_id = null
INJ_ALL_ZERO = (503, 29)         # tokens all zero
INJ_EMPTY = (1009, 31)           # tokens empty (n_tok=0, consistent)
INJ_DUP_DOC = (769, 37)          # doc_id collapsed onto a shared class id
DUP_CLASS_MOD = 1538             # rows hitting INJ_DUP_DOC share doc-dup-<i % 1538>
INJ_NEG_NTOK = (1213, 41)        # n_tok = -1
INJ_TOO_LONG = (1511, 43)        # sequence of MAX_SEQ_LEN + 50 tokens

BAD_SOURCE_VALUE = "crawlz"


def _hits(idx: np.ndarray, rule: tuple[int, int]) -> np.ndarray:
    mod, res = rule
    return (idx % mod) == res


# per-row randomness derives from the GLOBAL row index via the shared mix
# kernel, so generated content is identical for any file layout / chunking
from hepdata_validator_ray.ops import splitmix64 as _splitmix64  # noqa: E402


def generate_sequences_table(
    n_rows: int,
    seed: int = 42,
    sources: tuple[str, ...] = DEFAULT_SOURCES,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
    mean_len: int = 192,
    inject: bool = True,
    row_offset: int = 0,
    idx: np.ndarray | None = None,
) -> pa.Table:
    """Build one Arrow table of synthetic sequences.

    ``row_offset`` lets multi-file generation keep a single global row index
    so injection ground truth is file-layout independent.  ``idx`` overrides
    the global row-index array entirely (content is counter-derived, so two
    rows given the same index get byte-identical content — the skew
    generator's dup-class mechanism)."""
    if idx is None:
        idx = np.arange(row_offset, row_offset + n_rows, dtype=np.int64)
    else:
        idx = np.asarray(idx, dtype=np.int64)
    s64 = np.uint64(seed)

    # -- lengths: uniform in [1, 2*mean_len-1] (mean ≈ mean_len), counter-based
    h_len = _splitmix64(idx.astype(np.uint64) * np.uint64(0xA24BAED4963EE407) + s64)
    lens = (1 + (h_len % np.uint64(2 * mean_len - 1))).astype(np.int64)
    if inject:
        lens[_hits(idx, INJ_EMPTY)] = 0
        lens[_hits(idx, INJ_TOO_LONG)] = DEFAULT_MAX_SEQ_LEN + 50

    # -- flat token buffer: ids in [5, vocab) so 0 stays a pad sentinel -----
    total = int(lens.sum())
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    row_of_flat = np.repeat(idx, lens)
    pos_of_flat = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lens)
    h_tok = _splitmix64(
        row_of_flat.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        + pos_of_flat.astype(np.uint64) * np.uint64(0xD1B54A32D192ED03)
        + s64
    )
    flat = (5 + (h_tok % np.uint64(vocab_size - 5))).astype(np.int32)

    if inject:
        starts = offsets[:-1]
        # one out-of-range token at position 0 of the row
        m = _hits(idx, INJ_TOKEN_RANGE) & (lens > 0)
        flat[starts[m]] = vocab_size + 5
        # all-zero rows
        for s, e in zip(starts[_hits(idx, INJ_ALL_ZERO)], offsets[1:][_hits(idx, INJ_ALL_ZERO)]):
            flat[s:e] = 0

    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(flat))

    # -- n_tok --------------------------------------------------------------
    n_tok = lens.astype(np.int32).copy()
    if inject:
        n_tok[_hits(idx, INJ_LEN_MISMATCH)] += 3
        n_tok[_hits(idx, INJ_NEG_NTOK)] = -1

    # -- source -------------------------------------------------------------
    h_src = _splitmix64(idx.astype(np.uint64) * np.uint64(0x2545F4914F6CDD1D) + s64)
    src_pick = (h_src % np.uint64(len(sources))).astype(np.int64)
    source = np.array(sources, dtype=object)[src_pick]
    if inject:
        source[_hits(idx, INJ_BAD_SOURCE)] = BAD_SOURCE_VALUE

    # -- doc_id -------------------------------------------------------------
    doc_ids: list[str | None] = [f"doc-{s}-{i:08d}" for i, s in zip(idx, source)]
    if inject:
        for j in np.flatnonzero(_hits(idx, INJ_BAD_DOC_FMT)):
            doc_ids[j] = doc_ids[j].upper()
        # layout-independent duplicates: all hit rows with the same
        # (global_idx % DUP_CLASS_MOD) share one doc_id → duplicate groups
        # that are also deliberately hot keys (skew exercise for the shuffle)
        for j in np.flatnonzero(_hits(idx, INJ_DUP_DOC)):
            doc_ids[j] = f"doc-dup-{int(idx[j]) % DUP_CLASS_MOD:08d}"
        for j in np.flatnonzero(_hits(idx, INJ_NULL_DOC)):
            doc_ids[j] = None

    return pa.Table.from_arrays(
        [pa.array(doc_ids, type=pa.string()), tokens, pa.array(n_tok), pa.array(source, type=pa.string())],
        schema=SEQUENCE_SCHEMA,
    )


def synth_dir_for(
    sf_dir: str,
    inject: bool = True,
    n_rows: int | None = None,
    n_files: int = 8,
    row_offset: int = 0,
    seed: int = 42,
) -> Path:
    tag = Path(sf_dir).name or "default"
    suffix = "" if inject else "-clean"
    if n_rows is not None:
        suffix += f"-r{n_rows}"
    suffix += f"-f{n_files}"
    if row_offset:
        suffix += f"-o{row_offset}"
    if seed != 42:
        # non-default seeds get their own cache dir — without this a
        # seed-7 corpus would silently serve from the seed-42 cache
        suffix += f"-s{seed}"
    return SYNTH_ROOT / f"{tag}-v{SYNTH_VERSION}{suffix}" / "sequences"


def ensure_sequences_parquet(
    sf_dir: str,
    n_files: int = 8,
    seed: int = 42,
    inject: bool = True,
    n_rows: int | None = None,
    row_offset: int = 0,
) -> str:
    """Idempotently materialize the synthetic sequence table for a testdata
    scale factor.  Returns the Parquet directory path.

    Deterministic: same (tag, seed, n_files, row_offset) → identical bytes,
    so the DuckDB oracle and the Ray pipeline read the very same files.
    ``row_offset`` shifts the global row-index range (incremental-ingest
    snapshots share content with the base range by counter construction).
    """
    tag = Path(sf_dir).name or "default"
    rows = n_rows if n_rows is not None else ROWS_BY_TAG.get(tag, 2_000)
    out = synth_dir_for(
        sf_dir, inject=inject, n_rows=n_rows, n_files=n_files, row_offset=row_offset, seed=seed
    )
    done = out / "_DONE"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    per_file = (rows + n_files - 1) // n_files
    jobs: list[tuple[int, int, int]] = []  # (file_idx, row_offset, n)
    off = row_offset
    for f in range(n_files):
        n = min(per_file, rows + row_offset - off)
        if n <= 0:
            break
        jobs.append((f, off, n))
        off += n

    def _write_one(f: int, offset: int, n: int) -> None:
        tbl = generate_sequences_table(n, seed=seed, inject=inject, row_offset=offset)
        # random token ids don't compress (snappy ratio ~0.5% measured) —
        # uncompressed skips a decode-side buffer copy per read
        pq.write_table(tbl, out / f"part-{f:05d}.parquet", row_group_size=65536, compression="NONE")

    # parallel generation when a Ray session exists (content is counter-based
    # per global row index, so per-file generation is order-independent)
    try:
        import ray

        use_ray = ray.is_initialized() and len(jobs) > 1
    except ImportError:
        use_ray = False
    if use_ray:
        import ray

        @ray.remote
        def _gen(f, offset, n):
            _write_one(f, offset, n)

        ray.get([_gen.remote(*j) for j in jobs])
    else:
        for j in jobs:
            _write_one(*j)
    done.touch()
    return str(out)


def ensure_shifted_sequences_parquet(sf_dir: str, n_files: int = 8, seed: int = 42) -> str:
    """An 'incremental ingest' snapshot: the same generator shifted forward
    by half the row range, so HALF its rows carry content identical to the
    base layout (counter-based generation keys on the GLOBAL row index) and
    half are new — the fixture for incremental content dedup."""
    tag = Path(sf_dir).name or "default"
    rows = ROWS_BY_TAG.get(tag, 2_000)
    return ensure_sequences_parquet(sf_dir, n_files=n_files, seed=seed, row_offset=rows // 2)


def ensure_archive_zip(sf_dir: str) -> str:
    """Zip of the synthetic sequences dir (idempotent) — input for the
    engine's archive entry mode (S3)."""
    seq_dir = Path(ensure_sequences_parquet(sf_dir))
    out = seq_dir.parent / "sequences_archive.zip"
    if out.exists():
        return str(out)
    import shutil

    tmp = shutil.make_archive(str(seq_dir.parent / "sequences_archive_tmp"), "zip", root_dir=seq_dir)
    os.replace(tmp, out)
    return str(out)


def ensure_skewed_sequences_parquet(
    sf_dir: str,
    n_rows: int = 8_000_000,
    n_files: int = 32,
    hot_pct: int = 90,
    dup_pct: int = 20,
    seed: int = 42,
) -> str:
    """Adversarial-skew corpus (the north rule's skew scenario — VERDICT r4
    #9): ≥``hot_pct``% of rows land on ONE source and ``dup_pct``% of rows
    collapse onto shared hot dup-id classes (~200 members each).  Built from
    the clean generator (inject=False) with counter-based column rewrites,
    so content stays file-layout independent; tokens/n_tok are untouched.
    Feeds tools/skew_stress.py; results recorded in BASELINE.md."""
    tag = Path(sf_dir).name or "default"
    out = (
        SYNTH_ROOT
        / f"{tag}-v{SYNTH_VERSION}-skewc{hot_pct}d{dup_pct}-r{n_rows}-f{n_files}"
        / "sequences"
    )
    done = out / "_DONE"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    per_file = (n_rows + n_files - 1) // n_files
    n_classes = max(1, n_rows // 1000)

    def _write_one(f: int, offset: int, n: int) -> None:
        idx = np.arange(offset, offset + n, dtype=np.int64)
        h1 = _splitmix64(idx.astype(np.uint64) * np.uint64(0xA0761D6478BD642F) + np.uint64(seed))
        h2 = _splitmix64(idx.astype(np.uint64) * np.uint64(0xE7037ED1A0B428DB) + np.uint64(seed))
        hot = (h1 % np.uint64(100)).astype(np.int64) < hot_pct
        dup = (h2 % np.uint64(100)).astype(np.int64) < dup_pct
        pick = (h1 % np.uint64(len(DEFAULT_SOURCES))).astype(np.int64)
        src = np.array(DEFAULT_SOURCES, dtype=object)[pick]
        src[hot] = DEFAULT_SOURCES[0]
        # re-mix before the class modulus: cls must be independent of the
        # dup-selection residue (both mod-100 residues would correlate and
        # collapse the class space to a fifth of n_classes)
        cls = (_splitmix64(h2) % np.uint64(n_classes)).astype(np.int64)
        # dup rows take their CLASS REPRESENTATIVE's index, so token content
        # (and n_tok) is byte-identical within a class — both the id-dedup
        # and the content-dedup exchanges see real hot classes
        eff_idx = np.where(dup, cls, idx)
        tbl = generate_sequences_table(n, seed=seed, inject=False, idx=eff_idx)
        doc_ids = [
            f"doc-dup-{c:08d}" if d else f"doc-{s}-{i:08d}"
            for i, s, d, c in zip(idx, src, dup, cls)
        ]
        tbl = tbl.set_column(0, SEQUENCE_SCHEMA.field("doc_id"), pa.array(doc_ids, type=pa.string()))
        tbl = tbl.set_column(3, SEQUENCE_SCHEMA.field("source"), pa.array(src, type=pa.string()))
        pq.write_table(tbl, out / f"part-{f:05d}.parquet", row_group_size=65536, compression="NONE")

    jobs: list[tuple[int, int, int]] = []
    off = 0
    for f in range(n_files):
        n = min(per_file, n_rows - off)
        if n <= 0:
            break
        jobs.append((f, off, n))
        off += n
    try:
        import ray

        use_ray = ray.is_initialized() and len(jobs) > 1
    except ImportError:
        use_ray = False
    if use_ray:
        import ray

        w = ray.remote(_write_one)
        ray.get([w.remote(*j) for j in jobs])
    else:
        for j in jobs:
            _write_one(*j)
    (out / "_DONE").touch()
    return str(out)


def ensure_bundle_parquet(sf_dir: str, n_tables: int = 4, seed: int = 42) -> str:
    """Single-bundle fixture: ONE parquet file carrying ``n_tables`` logical
    tables tagged by a ``table`` column (deterministic: table = tbl<row idx
    mod n_tables>) — the input for the engine's single-bundle split path
    (≙ the reference's single-YAML submissions)."""
    tag = Path(sf_dir).name or "default"
    rows = ROWS_BY_TAG.get(tag, 2_000)
    out = SYNTH_ROOT / f"{tag}-v{SYNTH_VERSION}-bundle{n_tables}" / "bundle.parquet"
    if out.exists():
        return str(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    tbl = generate_sequences_table(rows, seed=seed)
    tables = np.array([f"tbl{i % n_tables}" for i in range(rows)], dtype=object)
    tbl = tbl.append_column("table", pa.array(tables, type=pa.string()))
    tmp = out.with_suffix(".tmp")
    pq.write_table(tbl, tmp, row_group_size=65536, compression="NONE")
    os.replace(tmp, out)
    return str(out)


def ensure_mutated_documents_parquet(sf_dir: str) -> str:
    """A deterministic 'second crawl' of the documents table — the
    snapshot-diff fixture: ``doc_id % 10 == 3`` rows dropped (→ removed),
    ``doc_id % 7 == 2`` rows get a ``' [rev2]'`` text suffix (→ changed),
    and ``max_id+1 .. max_id+len//20`` brand-new docs appended (→ added).
    A pure function of the base table: both engines read the same file,
    so no generation logic needs SQL parity."""
    import pandas as pd

    tag = Path(sf_dir).name or "default"
    out = SYNTH_ROOT / f"{tag}-v{SYNTH_VERSION}-mutated" / "documents_v2.parquet"
    if out.exists():
        return str(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    df = pd.read_parquet(f"{sf_dir}/documents.parquet")
    df = df[df["doc_id"] % 10 != 3].copy()
    chg = df["doc_id"] % 7 == 2
    df.loc[chg, "text"] = df.loc[chg, "text"].fillna("") + " [rev2]"
    mx = int(df["doc_id"].max())
    n_new = max(len(df) // 20, 1)
    texts = [f"brand new document number {i} from the second crawl" for i in range(n_new)]
    new = pd.DataFrame(
        {
            "doc_id": np.arange(mx + 1, mx + 1 + n_new, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "src_new",
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    df = pd.concat([df, new], ignore_index=True)
    tmp = out.with_suffix(".tmp")
    df.to_parquet(tmp, index=False)
    os.replace(tmp, out)
    return str(out)


def ensure_delta_parquet(sf_dir: str) -> str:
    """A deterministic CDC DELTA between the base documents table and the
    ensure_mutated_documents_parquet second crawl: one row per upserted
    doc (changed text / brand-new doc, ``deleted=False``) and one
    TOMBSTONE per removed doc (``deleted=True``, payload columns NULL).
    Derived mechanically from the two snapshots (anti/semi joins over
    doc_id + text inequality), so ``merge_upsert(base, delta)`` must
    reproduce the v2 snapshot exactly — the closed-loop contract the
    merge tests pin."""
    import pandas as pd

    tag = Path(sf_dir).name or "default"
    out = SYNTH_ROOT / f"{tag}-v{SYNTH_VERSION}-mutated" / "documents_delta.parquet"
    if out.exists():
        return str(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    base = pd.read_parquet(f"{sf_dir}/documents.parquet")
    v2 = pd.read_parquet(ensure_mutated_documents_parquet(sf_dir))
    base_ids = set(base["doc_id"].tolist())
    v2_ids = set(v2["doc_id"].tolist())
    removed = sorted(base_ids - v2_ids)
    base_text = dict(zip(base["doc_id"], base["text"]))
    in_base = v2["doc_id"].isin(base_ids)
    changed = v2[in_base & (v2["doc_id"].map(base_text) != v2["text"])]
    added = v2[~in_base]
    ups = pd.concat([changed, added], ignore_index=True)
    ups["deleted"] = False
    tomb = pd.DataFrame(
        {
            "doc_id": np.array(removed, dtype=np.int64),
            "text": pd.Series([None] * len(removed), dtype=object),
            "lang": pd.Series([None] * len(removed), dtype=object),
            "source": pd.Series([None] * len(removed), dtype=object),
            "n_chars": pd.Series([np.int64(0)] * len(removed), dtype="int64"),
            "deleted": True,
        }
    )
    delta = pd.concat([ups, tomb], ignore_index=True).sort_values("doc_id")
    tmp = out.with_suffix(".tmp")
    delta.to_parquet(tmp, index=False)
    os.replace(tmp, out)
    return str(out)


# ---------------------------------------------------------------------------
# Ground truth for tests
# ---------------------------------------------------------------------------

def expected_violation_doc_rows(n_rows: int) -> dict[str, set[int]]:
    """Row indices expected to violate each check, given the injection rules.

    Computed independently from the check implementations (closed form over
    the moduli), so tests compare two derivations.
    """
    idx = np.arange(n_rows, dtype=np.int64)
    empty = _hits(idx, INJ_EMPTY)
    too_long = _hits(idx, INJ_TOO_LONG)
    all_zero = _hits(idx, INJ_ALL_ZERO)
    null_doc = _hits(idx, INJ_NULL_DOC)
    dup = _hits(idx, INJ_DUP_DOC) & ~null_doc
    out: dict[str, set[int]] = {}
    out["doc_id_non_null"] = set(np.flatnonzero(null_doc).tolist())
    # dup/null injections overwrite the bad-format id, so exclude them
    fmt = _hits(idx, INJ_BAD_DOC_FMT) & ~null_doc & ~_hits(idx, INJ_DUP_DOC)
    out["doc_id_format"] = set(np.flatnonzero(fmt).tolist())
    out["token_length_consistency"] = set(
        np.flatnonzero(_hits(idx, INJ_LEN_MISMATCH) | _hits(idx, INJ_NEG_NTOK)).tolist()
    )
    out["n_tok_non_negative"] = set(np.flatnonzero(_hits(idx, INJ_NEG_NTOK)).tolist())
    # all-zero injection overwrites the out-of-range token; empty rows have none
    out["token_id_range"] = set(np.flatnonzero(_hits(idx, INJ_TOKEN_RANGE) & ~empty & ~all_zero).tolist())
    out["tokens_not_all_zero"] = set(np.flatnonzero(all_zero & ~empty).tolist())
    out["tokens_not_empty"] = set(np.flatnonzero(empty).tolist())
    out["source_membership"] = set(np.flatnonzero(_hits(idx, INJ_BAD_SOURCE)).tolist())
    out["sequence_length_limit"] = set(np.flatnonzero(too_long).tolist())
    # duplicate groups: hit rows sharing (idx % DUP_CLASS_MOD); groups of ≥2
    classes: dict[int, list[int]] = {}
    for j in np.flatnonzero(dup):
        classes.setdefault(int(idx[j]) % DUP_CLASS_MOD, []).append(int(j))
    out["doc_id_duplicates"] = {j for grp in classes.values() if len(grp) >= 2 for j in grp}
    return out


def ensure_nearpair_documents_parquet(sf_dir: str) -> str:
    """The near-dup-pair SELF-JOIN fixture: the base documents table
    unioned with the mutated 'second crawl' whose doc_ids are offset by
    1,000,000 — so every surviving (base, mutated) twin is a same-corpus
    near-duplicate pair (identical for untouched rows, one-suffix-word
    apart for the ``[rev2]`` rows).  A pure function of the two tables;
    both engines read the same file."""
    import pandas as pd

    tag = Path(sf_dir).name or "default"
    out = SYNTH_ROOT / f"{tag}-v{SYNTH_VERSION}-nearpair" / "documents_np.parquet"
    if out.exists():
        return str(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    base = pd.read_parquet(f"{sf_dir}/documents.parquet")
    mut = pd.read_parquet(ensure_mutated_documents_parquet(sf_dir)).copy()
    mut["doc_id"] = mut["doc_id"] + 1_000_000
    df = pd.concat([base, mut], ignore_index=True)
    tmp = out.with_suffix(".tmp")
    df.to_parquet(tmp, index=False)
    os.replace(tmp, out)
    return str(out)


def ensure_dupbest_documents_parquet(sf_dir: str) -> str:
    """Exact-dup fixture for the quality-aware keep-best policy: the base
    documents table unioned with an identical-TEXT copy whose doc_ids are
    offset by 1,000,000 and whose source is rotated srcK → src((K+1) % 20)
    — every content class has exactly two members with DIFFERENT sources,
    so the source-priority survivor provably diverges from keep-first
    (min doc_id) wherever the rotation crosses the lexicographic order."""
    import pandas as pd

    tag = Path(sf_dir).name or "default"
    out = SYNTH_ROOT / f"{tag}-v{SYNTH_VERSION}-dupbest" / "documents_db.parquet"
    if out.exists():
        return str(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    base = pd.read_parquet(f"{sf_dir}/documents.parquet")
    twin = base.copy()
    twin["doc_id"] = twin["doc_id"] + 1_000_000

    def _rot(s):
        if isinstance(s, str) and s.startswith("src") and s[3:].isdigit():
            return f"src{(int(s[3:]) + 1) % 20}"
        return s

    twin["source"] = twin["source"].map(_rot)
    df = pd.concat([base, twin], ignore_index=True)
    tmp = out.with_suffix(".tmp")
    df.to_parquet(tmp, index=False)
    os.replace(tmp, out)
    return str(out)


def ensure_rowgrouped_sequences_parquet(
    sf_dir: str, row_group_size: int = 256, n_files: int = 4, seed: int = 42
) -> str:
    """The SAME sequence corpus re-laid-out with SMALL row groups
    (``row_group_size`` rows each, sorted by n_tok within each file so the
    per-row-group n_tok statistics are tight) — the fixture for row-group
    PRUNING audits, which are degenerate on the base layout's one-row-group
    files.  Deterministic and idempotent like every synth artifact; content
    equals the base corpus row-for-row (only layout differs)."""
    tag = Path(sf_dir).name or "default"
    rows = ROWS_BY_TAG.get(tag, 2_000)
    out = SYNTH_ROOT / f"{tag}-v{SYNTH_VERSION}-rg{row_group_size}x{n_files}" / "sequences"
    done = out / "_DONE"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    tbl = generate_sequences_table(rows, seed=seed)
    # sort by (n_tok, doc_id) so row-group stats are tight ranges — the
    # layout a size-partitioned 100-TB corpus would actually have; NULLs
    # first is pyarrow's default for ascending sort
    order = pa.compute.sort_indices(
        tbl, sort_keys=[("n_tok", "ascending"), ("doc_id", "ascending")]
    )
    tbl = tbl.take(order)
    per = -(-tbl.num_rows // n_files)
    for f in range(n_files):
        part = tbl.slice(f * per, per)
        tmp = out / f"part-{f:02d}.tmp"
        pq.write_table(part, tmp, row_group_size=row_group_size, compression="NONE")
        os.replace(tmp, out / f"part-{f:02d}.parquet")
    done.touch()
    return str(out)
