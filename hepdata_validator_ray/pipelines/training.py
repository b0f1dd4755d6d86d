"""Training-data preparation operators beyond the near-dup family:
sequence packing (concat-and-chunk), benchmark-contamination flagging,
PII/URL scrubbing, and corpus-frequency (unigram LM) scoring.

These are the ops a large-scale LLM-corpus pipeline runs after
validation/dedup and before tokenized shards are cut; none exists in the
reference (a single-file validator) — they extend SURVEY.md §2.8's
training-data family.  All hot paths are vectorized (pandas C siphash,
numpy segmented reductions, compiled regexes in actor ``__init__``) and
every wide step is either a broadcast (small side via ``ray.put``) or a
single bucketed exchange — no driver-side loops over the corpus.

Physical plans:

- ``sequence_packing`` — a distributed exclusive prefix-sum: pass 1
  computes per-range-bucket token sums with map-side combine (only
  ``num_buckets`` rows shuffle), the driver scans that tiny table into
  per-bucket offsets (broadcast), pass 2 exchanges (doc_id, n_tokens)
  pairs once, keyed on the RANGE bucket, and finishes each bucket with a
  local sort + cumsum.  The text column never re-ships.
- ``contamination_flags`` — the eval side (~1/eval_mod of the corpus) is
  reduced to a distinct-shingle-hash array and broadcast; the train side
  streams once through an actor pool doing a sorted-array membership
  test.  No corpus-sized shuffle at all.
- ``lm_frequency_scores`` — pass 1 builds the corpus unigram table
  (map-side ``np.unique`` combine, then one tiny hash-keyed groupby —
  vocabulary-sized, not corpus-sized), broadcasts it sorted; pass 2
  scores each doc with searchsorted + one segmented sum.
- ``pii_scrub`` — embarrassingly parallel map_batches; regexes compiled
  once per actor (ST1).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from hepdata_validator_ray.pipelines.dedup import _shingle_hashes, _word_hashes

#: siphash keys (16 bytes) for word hashing — distinct per op so buckets
#: never correlate across pipelines
_CONTAM_KEY = "hvr-contaminate!"
_LM_KEY = "hvr-unigram-lm!!"


def _pq(sf_dir_or_path: str) -> str:
    import os

    p = sf_dir_or_path
    return p if p.endswith(".parquet") or os.path.isfile(p) else f"{p}/documents.parquet"


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------

def sequence_packing(
    docs_path: str,
    ctx_len: int = 512,
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Concat-and-chunk packing plan: lay every document's whitespace
    tokens end-to-end in doc_id order and cut fixed ``ctx_len`` contexts;
    emit each doc's global token offset and the packs it lands in —
    (doc_id, n_tokens, tok_start, pack_first, pack_last, n_packs).

    Assumes dense int doc_ids (0..N-1, the corpus-shard convention); the
    range bucket ``doc_id // span`` then preserves global order across
    buckets, which is what lets the prefix sum distribute.  Equivalent
    SQL: SUM(len) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets

    path = _pq(docs_path)
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    n_rows = ds.count()  # parquet metadata only — no scan
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        ds, target_rows_per_bucket=500_000, lo=8
    )
    span = max(1, math.ceil((n_rows) / nb))

    def counts(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pandas()
        n = texts.str.split(" ").str.len().fillna(0).astype("int64")
        doc = t["doc_id"].to_numpy()
        return pa.Table.from_pydict(
            {
                "doc_id": doc,
                "n_tokens": n.to_numpy(),
                BUCKET_COL: (doc // span).astype(np.int64),
            }
        )

    # materialized: cnt feeds BOTH the pass-1 sums aggregate and the pass-2
    # rank exchange — without this the full documents read + whitespace
    # token count would execute twice.  cnt is (doc_id, n_tokens, bucket)
    # only; the text column never enters it.
    cnt = ds.map_batches(counts, batch_format="pyarrow").materialize()

    # pass 1: per-bucket sums with map-side combine — only nb rows shuffle
    def partial_sums(t: pa.Table) -> pa.Table:
        b = t[BUCKET_COL].to_numpy()
        n = t["n_tokens"].to_numpy()
        ub, inv = np.unique(b, return_inverse=True)
        s = np.zeros(len(ub), dtype=np.int64)
        np.add.at(s, inv, n)
        return pa.Table.from_pydict({BUCKET_COL: ub, "s": s})

    sums = (
        cnt.map_batches(partial_sums, batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .sum("s")
        .to_pandas()
    )  # nb rows — tiny by construction
    offs = np.zeros(nb + 1, dtype=np.int64)
    offs[sums[BUCKET_COL].to_numpy() + 1] = sums["sum(s)"].to_numpy()
    np.cumsum(offs, out=offs)  # offs[b] = tokens before bucket b
    offs_ref = ray.put(offs[:nb])

    # pass 2: one exchange of (doc_id, n_tokens) keyed on the range bucket;
    # in-bucket finish is a vectorized sort + cumsum
    def finish(df: pd.DataFrame) -> pd.DataFrame:
        bucket_off = ray.get(offs_ref)
        df = df.sort_values("doc_id", kind="mergesort")
        n = df["n_tokens"].to_numpy()
        start = bucket_off[int(df[BUCKET_COL].iloc[0])] + np.concatenate(
            ([0], np.cumsum(n[:-1]))
        )
        last = start + np.maximum(n, 1) - 1  # empty docs occupy their start pack
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tokens": n,
                "tok_start": start,
                "pack_first": start // ctx_len,
                "pack_last": last // ctx_len,
                "n_packs": last // ctx_len - start // ctx_len + 1,
            }
        )

    return cnt.groupby(BUCKET_COL).map_groups(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# Benchmark-contamination flagging
# ---------------------------------------------------------------------------

def eval_shingle_set(
    docs_path: str, k: int = 3, eval_mod: int = 97
) -> np.ndarray:
    """Distinct shingle hashes of the eval slice (doc_id % eval_mod == 0)
    — the broadcast side.  Distinct-per-batch first, so only unique hashes
    ever leave a task; the final union is eval-vocabulary-sized."""
    path = _pq(docs_path)

    def uniq(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy()
        mask = doc % eval_mod == 0
        if not mask.any():
            return pa.Table.from_pydict({"sh": np.empty(0, dtype=np.uint64)})
        texts = t["text"].to_pandas()[mask]
        wh, offs = _word_hashes(texts, _CONTAM_KEY)
        sh, _ = _shingle_hashes(wh, offs, k)
        return pa.Table.from_pydict({"sh": np.unique(sh)})

    parts = (
        ray.data.read_parquet(path, columns=["doc_id", "text"])
        .map_batches(uniq, batch_format="pyarrow")
        .to_pandas()
    )
    return np.unique(parts["sh"].to_numpy().astype(np.uint64))


class ContaminationStage:
    """Actor-pool scorer: the eval shingle set (sorted uint64 array) is
    fetched once per actor in ``__init__``; each batch does one shingle
    pass + sorted membership + per-row distinct-match count."""

    def __init__(self, eval_ref, k: int = 3):
        self.eval_sh = ray.get(eval_ref) if not isinstance(eval_ref, np.ndarray) else eval_ref
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pandas()
        wh, offs = _word_hashes(texts, _CONTAM_KEY)
        sh, sh_off = _shingle_hashes(wh, offs, self.k)
        n = t.num_rows
        hits = np.zeros(n, dtype=np.int64)
        if len(sh):
            pos = np.searchsorted(self.eval_sh, sh)
            pos[pos == len(self.eval_sh)] = 0
            matched = self.eval_sh[pos] == sh if len(self.eval_sh) else np.zeros(len(sh), bool)
            if matched.any():
                row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(sh_off))
                # distinct (row, shingle) via one packed uint64 key: the
                # matched shingle's eval-set INDEX (< 2^32) replaces the
                # hash, so (row << 32) | idx is injective — a 1-D unique,
                # not np.unique(axis=0)'s void-dtype row sort
                key = (row_of[matched].astype(np.uint64) << np.uint64(32)) | pos[
                    matched
                ].astype(np.uint64)
                uniq_keys = np.unique(key)
                rows, counts = np.unique(
                    (uniq_keys >> np.uint64(32)).astype(np.int64), return_counts=True
                )
                hits[rows] = counts
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"].to_numpy(), "contam_hits": hits}
        )


def contamination_flags(
    docs_path: str, k: int = 3, eval_mod: int = 97, concurrency: int = 8
) -> "ray.data.Dataset":
    """Per-doc count of DISTINCT k-word shingles shared with the eval
    slice (doc_id % eval_mod == 0) — the test-set-overlap decontamination
    check.  Eval docs score their own shingle count (trivially
    contaminated); filter doc_id % eval_mod != 0 downstream to act on the
    train side only."""
    path = _pq(docs_path)
    ev_ref = ray.put(eval_shingle_set(docs_path, k=k, eval_mod=eval_mod))
    return ray.data.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        ContaminationStage,
        fn_constructor_kwargs=dict(eval_ref=ev_ref, k=k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, concurrency),
    )


# ---------------------------------------------------------------------------
# PII / URL scrubbing
# ---------------------------------------------------------------------------

#: RE2-safe patterns (no backrefs/lookaround) so the DuckDB-parity test can
#: run the identical regex on both engines
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PATTERN = r"https?://[^ \t\n]+"
PHONE_PATTERN = r"\+[0-9][0-9 ()-]{6,14}[0-9]"


class PiiScrubStage:
    """Actor-pool scrubber: regexes compiled once per actor; counting and
    redaction are pandas C string kernels over the whole batch."""

    REDACTIONS = (
        (URL_PATTERN, "<URL>"),      # URLs first: they may embed @ or digits
        (EMAIL_PATTERN, "<EMAIL>"),
        (PHONE_PATTERN, "<PHONE>"),
    )

    def __init__(self):
        import re

        self.pats = [(re.compile(p), tok) for p, tok in self.REDACTIONS]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"]
        counts = {}
        clean = text
        for (pat, tok), name in zip(self.pats, ("n_urls", "n_emails", "n_phones")):
            counts[name] = clean.str.count(pat).astype("int64")
            clean = clean.str.replace(pat, tok, regex=True)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "text_clean": clean,
                "n_urls": counts["n_urls"],
                "n_emails": counts["n_emails"],
                "n_phones": counts["n_phones"],
                "n_redacted_chars": (
                    text.str.len() - clean.str.len()
                    + 5 * counts["n_urls"] + 7 * counts["n_emails"] + 7 * counts["n_phones"]
                ).astype("int64"),
            }
        )


def pii_scrub(docs_path: str, concurrency: int = 8) -> "ray.data.Dataset":
    return ray.data.read_parquet(_pq(docs_path), columns=["doc_id", "text"]).map_batches(
        PiiScrubStage, batch_format="pandas", batch_size=4096, concurrency=(1, concurrency)
    )


# ---------------------------------------------------------------------------
# Corpus-frequency (unigram LM) scoring
# ---------------------------------------------------------------------------

def unigram_counts(docs_path: str) -> pd.DataFrame:
    """Corpus unigram table keyed by word hash: (wh uint64, c int64),
    sorted by wh.  Map-side ``np.unique`` combine means each task ships at
    most its batch vocabulary; the groupby that follows is
    vocabulary-sized, not corpus-sized.  The result is broadcastable (a
    100 TB web corpus has a bounded word vocabulary — same regime as the
    IVF centroid table)."""
    path = _pq(docs_path)

    def partial(t: pa.Table) -> pa.Table:
        wh, _ = _word_hashes(t["text"].to_pandas(), _LM_KEY)
        u, c = np.unique(wh, return_counts=True)
        # ship the key as an int64 BIT VIEW: Ray's groupby reduce
        # materializes group keys as Python ints, and a uint64 above
        # 2^63 overflows the int64 block build — the block then silently
        # falls back to pickled-object storage (observed: column 'wh').
        return pa.Table.from_pydict({"wh": u.view(np.int64), "c": c.astype(np.int64)})

    agg = (
        ray.data.read_parquet(path, columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("wh")
        .sum("c")
        .to_pandas()
    )
    agg = agg.rename(columns={"sum(c)": "c"})
    # undo the int64 bit view, THEN sort — int64 order differs from
    # uint64 order for hashes above 2^63
    agg["wh"] = agg["wh"].to_numpy(dtype=np.int64).view(np.uint64)
    return agg.sort_values("wh").reset_index(drop=True)


class LmScoreStage:
    """Actor-pool scorer: sorted vocab arrays fetched once per actor; each
    batch is one searchsorted + one segmented sum."""

    def __init__(self, vocab_ref):
        vocab = ray.get(vocab_ref) if not isinstance(vocab_ref, pd.DataFrame) else vocab_ref
        self.wh = vocab["wh"].to_numpy().astype(np.uint64)
        self.c = vocab["c"].to_numpy().astype(np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        from hepdata_validator_ray.pipelines.text import _segment_sum

        wh, offs = _word_hashes(t["text"].to_pandas(), _LM_KEY)
        if len(wh) and len(self.wh):
            pos = np.searchsorted(self.wh, wh)
            pos[pos == len(self.wh)] = 0
            freq = np.where(self.wh[pos] == wh, self.c[pos], 0)
        else:
            freq = np.zeros(len(wh), dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"].to_numpy(),
                "lm_freq_sum": _segment_sum(freq, offs),
                "n_tokens": np.diff(offs),
            }
        )


def lm_frequency_scores(
    docs_path: str, concurrency: int = 8, vocab: "pd.DataFrame | None" = None
) -> "ray.data.Dataset":
    """Per-doc sum of corpus frequencies of its words — the integerized
    unigram-LM familiarity score (deterministic across engines, unlike a
    float log-prob sum whose value depends on summation order).  Low
    scores ≈ rare/garbled text; the quality-filter signal.  Pass a
    precomputed ``vocab`` (from :func:`unigram_counts`) to share the
    vocabulary exchange with other consumers (e.g. quality buckets)."""
    path = _pq(docs_path)
    vocab_ref = ray.put(unigram_counts(docs_path) if vocab is None else vocab)
    return ray.data.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        LmScoreStage,
        fn_constructor_kwargs=dict(vocab_ref=vocab_ref),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, concurrency),
    )


# ---------------------------------------------------------------------------
# CCNet-style quality buckets (head / middle / tail)
# ---------------------------------------------------------------------------

def quality_bucket_assignments(
    docs_path: str,
    hi_pct: int = 102,
    lo_pct: int = 98,
    concurrency: int = 8,
    vocab: "pd.DataFrame | None" = None,
    scores: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """CCNet-style corpus-relative quality buckets: per-doc per-token LM
    familiarity fx = (lm_freq_sum * 1000) // n_tokens compared to the corpus
    mean mx = (sum lm * 1000) // (sum tokens) — bucket 2 ('head') when
    fx >= hi_pct% of mx, 0 ('tail') when fx < lo_pct% of mx, else 1.

    All math is integer (floor division), so the DuckDB oracle is hash-exact.
    The corpus totals come from the already-vocabulary-sized unigram table
    (sum over docs of lm_freq_sum == sum over vocab of c^2) in exact Python
    ints on the driver — no extra corpus pass, no overflow at any corpus
    size; per-doc fx is split as q*1000 + (r*1000)//nt (q, r = divmod(lm,
    nt)) so the intermediate never exceeds ~1000*nt even when lm*1000
    would wrap int64 (lm is bounded by n_words_doc x the top corpus word
    count, which passes 2^53 in the 100TB regime).  CCNet proper buckets
    by perplexity *tertiles*; the mean-relative rule here is the
    deterministic, exact-arithmetic variant (rank-tertile thresholds can
    be layered on via the existing Quantile aggregate when approximate
    cuts are acceptable).

    Pass ``scores`` (a (doc_id, lm_freq_sum, n_tokens) dataset from
    :func:`lm_frequency_scores`) to reuse an existing scored pass instead
    of re-scanning the corpus.  Returns (doc_id, fx, bucket); docs with
    zero words are excluded (they have no defined per-token score —
    matching the SQL twin, where such docs never enter the word join)."""
    path = _pq(docs_path)
    if vocab is None:
        vocab = unigram_counts(docs_path)
    c = vocab["c"].to_numpy()
    total_nt = int(c.sum())
    total_lm = sum(int(x) * int(x) for x in c)  # exact python ints
    if total_nt == 0:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "fx": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int64()),
                }
            )
        )
    mx = total_lm * 1000 // total_nt
    hi = hi_pct * mx // 100
    lo = lo_pct * mx // 100

    def bucketize(t: pa.Table) -> pa.Table:
        lm = t["lm_freq_sum"].to_numpy()
        nt = t["n_tokens"].to_numpy()
        keep = nt > 0
        lm, nt = lm[keep].astype(np.int64), nt[keep]
        # overflow-safe exact (lm*1000)//nt: q*1000 + (r*1000)//nt with
        # q, r = divmod(lm, nt) — r*1000 < 1000*nt stays far below 2^63
        q, r = np.divmod(lm, nt)
        fx = q * 1000 + (r * 1000) // nt
        bucket = np.where(fx >= hi, 2, np.where(fx < lo, 0, 1)).astype(np.int64)
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"].to_numpy()[keep], "fx": fx, "bucket": bucket}
        )

    if scores is None:
        scores = lm_frequency_scores(path, concurrency=concurrency, vocab=vocab)
    return scores.map_batches(bucketize, batch_format="pyarrow")


def quality_bucket_counts(
    docs_path: str, hi_pct: int = 102, lo_pct: int = 98
) -> "ray.data.Dataset":
    """Per-bucket (n, min_f, max_f) summary of the quality assignment —
    map-side combine, 3-row groupby."""
    ds = quality_bucket_assignments(docs_path, hi_pct=hi_pct, lo_pct=lo_pct)

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("bucket")["fx"].agg(n="size", min_f="min", max_f="max").reset_index()
        return pa.Table.from_pandas(g.astype("int64"), preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            ray.data.aggregate.Sum("n", alias_name="n"),
            ray.data.aggregate.Min("min_f", alias_name="min_f"),
            ray.data.aggregate.Max("max_f", alias_name="max_f"),
        )
    )


# ---------------------------------------------------------------------------
# RAG-style overlapping chunk spans
# ---------------------------------------------------------------------------

def rag_chunk_spans(
    docs_path: str, chunk: int = 64, stride: int = 48
) -> "ray.data.Dataset":
    """Overlapping retrieval chunks per document, emitted as word-index
    spans (doc_id, chunk_idx, w_start, w_end) without materializing chunk
    text — downstream stages slice the text lazily, so a 100 TB corpus
    ships only O(rows) span metadata, not chunk^x duplicated bytes.

    Semantics (the standard sliding-window chunker): chunk k covers words
    [k*stride, min(k*stride + chunk, n)); the last chunk is the first k
    with k*stride + chunk >= n, i.e. k_max = 0 if n <= chunk else
    ceil((n - chunk) / stride).  Wholly embarrassingly parallel — a pure
    per-batch flat-map with vectorized repeat/arange index math."""
    if stride <= 0 or chunk <= 0:
        raise ValueError("chunk and stride must be positive")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].str.split(" ").str.len().fillna(0).astype("int64").to_numpy()
        kmax = np.where(n <= chunk, 0, (n - chunk + stride - 1) // stride)
        reps = kmax + 1
        doc = np.repeat(df["doc_id"].to_numpy(), reps)
        # chunk_idx restarts per doc: global arange minus each doc's base
        base = np.cumsum(reps) - reps
        idx = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(base, reps)
        w_start = idx * stride
        w_end = np.minimum(w_start + chunk, np.repeat(n, reps))
        return pd.DataFrame(
            {"doc_id": doc, "chunk_idx": idx, "w_start": w_start, "w_end": w_end}
        )

    return ray.data.read_parquet(_pq(docs_path), columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pandas", batch_size=4096
    )


def chunk_counts(
    docs_path: str, chunk: int = 64, stride: int = 48
) -> "ray.data.Dataset":
    """Per-document chunk count under ``rag_chunk_spans`` semantics —
    computed map-side from the word count (one row per doc, no span
    materialization), so the gated meta union stays one exchange-free
    per-batch transform."""
    if stride <= 0 or chunk <= 0:
        raise ValueError("chunk and stride must be positive")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].str.split(" ").str.len().fillna(0).astype("int64").to_numpy()
        kmax = np.where(n <= chunk, 0, (n - chunk + stride - 1) // stride)
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "n_chunks": pd.Series(kmax + 1, index=df.index, dtype="int64")}
        )

    return ray.data.read_parquet(_pq(docs_path), columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pandas", batch_size=4096
    )


# ---------------------------------------------------------------------------
# Deterministic MLM masking (BERT-style span selection, integer-exact)
# ---------------------------------------------------------------------------

#: multiplicative mixers for the per-position mask decision (Knuth's
#: 2654435761 and a distinct odd constant for the position term)
_MLM_K1 = 2654435761
_MLM_K2 = 40503


def mlm_mask_stats(
    seq_path: str, rate_x1000: int = 150, mod: int = 1000
) -> "ray.data.Dataset":
    """Deterministic MLM-style mask selection over tokenized sequences:
    token at position ``pos`` of document ``did`` is masked iff
    ``(did*K1 + pos*K2) % mod < rate_x1000`` — a pure-integer rule, so
    the exact same token set is selected by any engine on any partition
    layout (unlike RNG masking, which is irreproducible across runs and
    engines).  15% default, the BERT convention.

    Per-doc output (the label-side summary a masking stage must get
    right): token count, masked count, masked-label sum, first masked
    position (-1 when nothing masked).  The whole kernel runs on the
    zero-copy Arrow list buffers: one segmented pass, no per-token
    Python.  Docs with NULL/empty tokens are out of contract (the
    violations corpus routes them to the validation pipeline)."""

    def fn(t: pa.Table) -> pa.Table:
        toks_col = t["tokens"]
        valid = pc.and_(
            toks_col.is_valid().combine_chunks()
            if isinstance(toks_col, pa.ChunkedArray)
            else toks_col.is_valid(),
            pc.greater(pc.list_value_length(toks_col), 0),
        )
        t = t.filter(valid)
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "n_tok": pa.array([], pa.int64()),
                    "n_masked": pa.array([], pa.int64()),
                    "masked_sum": pa.array([], pa.int64()),
                    "first_masked": pa.array([], pa.int64()),
                }
            )
        toks = t["tokens"].combine_chunks() if isinstance(t["tokens"], pa.ChunkedArray) else t["tokens"]
        offs = toks.offsets.to_numpy().astype(np.int64)
        vals = toks.values.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offs[0]
        offs0 = offs - base  # window-relative segment bounds
        vals = vals[base : offs[-1]]
        lens = np.diff(offs0)
        # doc ids: the trailing digit run of doc_id (0 when absent/null)
        did = (
            t["doc_id"]
            .to_pandas()
            .str.extract(r"(\d+)", expand=False)
            .fillna("0")
            .astype(np.int64)
            .to_numpy()
        )
        pos = np.arange(offs0[-1], dtype=np.int64) - np.repeat(offs0[:-1], lens)
        h = (np.repeat(did, lens) * _MLM_K1 + pos * _MLM_K2) % mod
        msk = h < rate_x1000
        starts = offs0[:-1]
        n_masked = np.add.reduceat(msk.astype(np.int64), starts)
        masked_sum = np.add.reduceat(np.where(msk, vals, 0), starts)
        big = np.int64(1) << 60
        first = np.minimum.reduceat(np.where(msk, pos, big), starts)
        return pa.table(
            {
                # NULL doc_ids group under '<NULL>' (repo convention;
                # Ray's groupby cannot sort a null-containing string key)
                "doc_id": pc.coalesce(t["doc_id"], pa.scalar("<NULL>", pa.string())),
                "n_tok": pa.array(lens, pa.int64()),
                "n_masked": pa.array(n_masked, pa.int64()),
                "masked_sum": pa.array(masked_sum, pa.int64()),
                # +big sentinel (not -1) so the duplicate-doc Min below
                # matches SQL's NULL-ignoring min over the union
                "first_masked": pa.array(first, pa.int64()),
            }
        )

    def decode_first(t: pa.Table) -> pa.Table:
        big = 1 << 60
        fm = t["first_masked"]
        return t.set_column(
            t.schema.get_field_index("first_masked"),
            "first_masked",
            pc.if_else(pc.greater_equal(fm, big), pa.scalar(-1, pa.int64()), fm),
        )

    from ray.data.aggregate import Min, Sum

    return (
        ray.data.read_parquet(seq_path, columns=["doc_id", "tokens"])
        .map_batches(fn, batch_format="pyarrow")
        # the corpus deliberately contains duplicate doc_ids (the dup
        # check's fixture); SQL's GROUP BY merges them, so do we — the
        # exchange moves 5 ints per doc
        .groupby("doc_id")
        .aggregate(
            Sum("n_tok", alias_name="n_tok"),
            Sum("n_masked", alias_name="n_masked"),
            Sum("masked_sum", alias_name="masked_sum"),
            Min("first_masked", alias_name="first_masked"),
        )
        .map_batches(decode_first, batch_format="pyarrow")
    )


def eval_exact_spans(docs_path: str, span_words: int = 5, eval_mod: int = 97) -> list[str]:
    """Deterministic eval-benchmark strings: for every eval doc (doc_id %
    eval_mod == 0) with >= span_words words, the MIDDLE span_words-word
    span, distinct.  Bounded by the eval slice, not the corpus — the
    broadcast side of exact decontamination."""
    import pandas as pd

    spans: set[str] = set()
    ds = ray.data.read_parquet(_pq(docs_path), columns=["doc_id", "text"])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["doc_id"].to_numpy() % eval_mod == 0) & df["text"].notna()]
        out = []
        for t in df["text"]:
            ws = t.split(" ")
            if len(ws) >= span_words:
                m = (len(ws) - span_words) // 2
                out.append(" ".join(ws[m : m + span_words]))
        return pd.DataFrame({"s": pd.Series(out, dtype="object")})

    for b in ds.map_batches(pick, batch_format="pandas", batch_size=4096).iter_batches(
        batch_format="pandas"
    ):
        spans.update(b["s"].tolist())
    return sorted(spans)


def contamination_exact_spans(
    docs_path: str, span_words: int = 5, eval_mod: int = 97
) -> "ray.data.Dataset":
    """GPT-3-style exact-span decontamination (the complement of the
    shingle-overlap ``contamination_flags``): per doc, the number of
    distinct eval spans occurring verbatim WORD-ALIGNED inside its text —
    i.e. as one of the doc's ``span_words``-word shingles, the n-gram
    overlap definition GPT-3's decontamination used.  The eval set — the
    middle span of each eval-slice doc — is benchmark-bounded and
    broadcasts as SORTED shingle hashes.

    Scale shape (replaces a first cut that ran one str.contains pass PER
    eval string — O(|eval|·corpus) chars, measured fatal at 5k spans ×
    500k docs): each batch makes ONE pass through the shared shingle-hash
    kernel and one searchsorted membership probe, so cost is O(corpus
    shingles · log|eval|) regardless of eval size.  Eval docs hit their
    own span by construction; filter doc_id % eval_mod != 0 downstream to
    act on the train side only."""
    import pandas as pd

    from hepdata_validator_ray.pipelines.dedup import (
        _WORD_KEY_MINHASH,
        _shingle_hashes,
        _word_hashes,
    )
    from hepdata_validator_ray.pipelines.text import _per_row_distinct

    spans = eval_exact_spans(docs_path, span_words=span_words, eval_mod=eval_mod)
    if spans:
        wh, offs = _word_hashes(pd.Series(spans), _WORD_KEY_MINHASH)
        sh, _ = _shingle_hashes(wh, offs, span_words)  # one hash per span
        ev_hashes = np.sort(np.unique(sh))
    else:
        ev_hashes = np.empty(0, dtype=np.uint64)
    ev_ref = ray.put(ev_hashes)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        ev = ray.get(ev_ref)
        df = df.reset_index(drop=True)
        hits = np.zeros(len(df), dtype=np.int64)
        if len(ev):
            wh, offs = _word_hashes(df["text"], _WORD_KEY_MINHASH)
            sh, sh_off = _shingle_hashes(wh, offs, span_words)
            if len(sh):
                pos = np.searchsorted(ev, sh)
                pos[pos == len(ev)] = 0
                hit = ev[pos] == sh
                seg = np.repeat(np.arange(len(df), dtype=np.int64), np.diff(sh_off))
                m_sh, m_seg = sh[hit], seg[hit]
                if len(m_sh):
                    # distinct matched spans per doc (shared distinct kernel)
                    order, first = _per_row_distinct(m_sh, m_seg)
                    np.add.at(hits, m_seg[order][first], 1)
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"), "n_hits": hits})

    return ray.data.read_parquet(_pq(docs_path), columns=["doc_id", "text"]).map_batches(
        scan, batch_format="pandas", batch_size=4096
    )


def length_bucket_padding_stats(
    docs_path: str,
    bucket_width: int = 256,
    batch_rows: int = 8,
    length_col: str = "n_chars",
) -> "ray.data.Dataset":
    """Length-bucketed batching PADDING AUDIT — the batch-efficiency metric
    a training run tunes bucket_width/batch_rows against.  Semantics: docs
    group into length buckets (bucket = len // bucket_width); within a
    bucket, docs sort by length and chunk into batches of ``batch_rows``;
    a batch pads every member to its max.  Output per bucket: n_docs,
    n_batches, sum_len, padded_cells (Σ batch_size·batch_max, partial
    batch included), waste (= padded_cells − sum_len).

    Scale design: batch stats over the SORTED multiset are a pure function
    of the length HISTOGRAM — batch maxima are the lengths at ranks
    ≡ batch_rows−1 (mod batch_rows), countable per histogram run in O(1)
    (#{r ∈ [lo, hi) : r ≡ G−1 (mod G)} = ⌊hi/G⌋ − ⌊lo/G⌋), and tie order
    within equal lengths provably cannot change any batch's (count, max,
    sum).  So the ONLY exchange is a value-counts of len — bounded by the
    length DOMAIN (≤ max doc length rows) at any corpus size — and the
    finale is O(distinct lengths) driver arithmetic.  No sort, no
    row-scale shuffle, no per-chunk enumeration (10^12 rows / G batches
    are never materialized)."""
    from hepdata_validator_ray.ops import grouped_value_counts

    def lens(t: pa.Table) -> pa.Table:
        col = t[length_col]
        if length_col == "text":  # derive length when no length column exists
            col = pc.utf8_length(col)
        v = pc.coalesce(pc.cast(col, pa.int64()), pa.scalar(0, pa.int64()))
        return pa.Table.from_arrays([v], names=["len"])

    vc = (
        grouped_value_counts(
            ray.data.read_parquet(docs_path, columns=[length_col]).map_batches(
                lens, batch_format="pyarrow"
            ),
            "len",
        )
        .to_pandas()  # length-domain-bounded at any corpus size
        .sort_values("len")
        .reset_index(drop=True)
    )
    G = int(batch_rows)
    rows = []
    if len(vc):
        vc["bucket"] = (vc["len"].to_numpy(np.int64) // bucket_width).astype(np.int64)
        for bucket, grp in vc.groupby("bucket", sort=True):
            v = grp["len"].to_numpy(np.int64)
            c = grp["cnt"].to_numpy(np.int64)
            hi = np.cumsum(c)
            lo = hi - c
            n = int(hi[-1])
            padded = G * int(np.sum(v * (hi // G - lo // G)))
            rem = n % G
            if rem:
                padded += rem * int(v[-1])  # partial batch holds the largest lengths
            total = int(np.sum(v * c))
            rows.append(
                {
                    "bucket": int(bucket),
                    "n_docs": n,
                    "n_batches": -(-n // G),
                    "sum_len": total,
                    "padded_cells": padded,
                    "waste": padded - total,
                }
            )
    out = pd.DataFrame(
        rows, columns=["bucket", "n_docs", "n_batches", "sum_len", "padded_cells", "waste"]
    ).astype("int64" if rows else {c: "int64" for c in
        ["bucket", "n_docs", "n_batches", "sum_len", "padded_cells", "waste"]})
    return ray.data.from_pandas(out)
