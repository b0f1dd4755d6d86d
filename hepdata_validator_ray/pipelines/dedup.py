"""Deduplication operators for large-scale training-data pipelines.

Five families, each expressed Ray-Data-first:

- **exact**: content-hash groupby (md5 for DuckDB oracle parity); keep-first
  via min(doc_id) per group.  The hash groupby is the only shuffle and moves
  one 32-char key per row.
- **MinHash + LSH**: shingle → minhash signature → band buckets → groupby
  (band, bucket) → candidate pairs with signature-estimated Jaccard.
  Shuffle moves (band, bucket, doc_id, signature) rows, not documents.
- **SimHash**: 64-bit simhash; candidates via 16-bit band buckets (any pair
  within Hamming distance ≤3 shares ≥1 of 4 bands); verify exact Hamming.
- **n-gram Jaccard**: exact Jaccard over word shingles for LSH candidates
  (broadcast shingle-set lookup at small scale; documented repartition-join
  path at 10^12 scale).
- **embedding cosine**: exact all-pairs cosine ≥ t (the oracle-checkable
  baseline) and an LSH-bucketed approximate variant for scale.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def _md5_batch(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["h"] = [hashlib.md5(t.encode()).hexdigest() for t in df["text"]]
    return df[["doc_id", "h"]]


def exact_dup_groups(docs_path: str) -> pd.DataFrame:
    """Exact-duplicate summary: number of content-hash groups with >1 member
    and total duplicate docs.  Returned as a one-row summary so the result
    schema is stable even when the corpus has no exact dups."""
    from hepdata_validator_ray.ops import grouped_value_counts

    hashed = ray.data.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        _md5_batch, batch_format="pandas", batch_size=4096
    )
    groups = grouped_value_counts(hashed, "h", min_count=2).to_pandas()
    n_groups = int(len(groups))
    n_docs = int(groups["cnt"].sum()) if n_groups else 0
    return pd.DataFrame([{"n_dup_groups": n_groups, "n_dup_docs": n_docs}])


def exact_keep_first(docs_path: str) -> "ray.data.Dataset":
    """Survivor per content-hash group: min(doc_id) — deterministic
    keep-first semantics (reference first-occurrence duplicate reporting,
    submission_file_validator.py:142-149, generalized to content identity).
    Bucketed exchange + Arrow hash aggregate per bucket (ops.py)."""
    from hepdata_validator_ray.ops import bucketed_aggregate

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("h").aggregate([("doc_id", "min")])
        return g.rename_columns(["h", "keep_doc_id"])

    hashed = ray.data.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        _md5_batch, batch_format="pandas", batch_size=4096
    )
    return bucketed_aggregate(hashed, "h", None, combine)


#: independent 16-byte siphash keys for the two fingerprint halves
_CONTENT_KEY_A = "hvr-content-key1"
_CONTENT_KEY_B = "hvr-content-key2"


def _strong_content_keys(t: pa.Table) -> pa.Table:
    """128-bit content fingerprint per row as two uint64 columns (h1, h2).

    Zero-copy: the ``list<int32>`` column's flat values buffer is re-viewed
    as a binary array (list offsets ×4 over the SAME buffer — no token data
    is copied), then each row's byte string is hashed twice with pandas'
    C siphash under independent keys.  Identical content → identical key;
    distinct-content collision odds ~2^-128 — the practical exactness class
    of a cryptographic digest with no large temporaries (this kernel is
    memory-bandwidth-bound territory at 10^12 rows).  Null tokens ≡ empty."""
    col = t.column("tokens")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    vals = arr.values
    itemsize = arr.type.value_type.bit_width // 8
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    if vals.offset:
        offs = offs + vals.offset
    offs = offs * itemsize
    bin_arr = pa.Array.from_buffers(
        pa.large_binary(), len(arr), [None, pa.py_buffer(offs), vals.buffers()[1]]
    )
    obj = bin_arr.to_numpy(zero_copy_only=False)
    h1 = pd.util.hash_array(obj, hash_key=_CONTENT_KEY_A, categorize=False)
    h2 = pd.util.hash_array(obj, hash_key=_CONTENT_KEY_B, categorize=False)
    if arr.null_count:
        # null rows may reference arbitrary (per Arrow spec: monotonic but
        # unspecified-width) offset ranges — pin them to the empty hash
        null_mask = pa.compute.is_null(arr).to_numpy(zero_copy_only=False)
        empty = np.empty(1, dtype=object)
        empty[0] = b""
        h1[null_mask] = pd.util.hash_array(empty, hash_key=_CONTENT_KEY_A, categorize=False)[0]
        h2[null_mask] = pd.util.hash_array(empty, hash_key=_CONTENT_KEY_B, categorize=False)[0]
    return pa.Table.from_pydict(
        {"h1": pa.array(h1, type=pa.uint64()), "h2": pa.array(h2, type=pa.uint64())}
    )


def sequence_content_dedup(seq_path: str) -> "ray.data.Dataset":
    """Content dedup over token sequences — single pass: vectorized 128-bit
    fingerprint per row (no per-row Python, no token bytes copied) → map-side
    pair counts → bucketed exchange keyed on h1 (already a uniform hash) →
    groups of ≥2.  The training-pipeline 'same tokens, different doc'
    detector.  Output: (h1, h2, cnt)."""
    from hepdata_validator_ray.ops import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["h1", "h2"]).aggregate([([], "count_all")])
        return g.rename_columns(["h1", "h2", "cnt"])

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["h1", "h2"]).aggregate([("cnt", "sum")])
        g = g.filter(pa.compute.greater_equal(g["cnt_sum"], 2))
        return g.rename_columns(["h1", "h2", "cnt"])

    keyed = ray.data.read_parquet(seq_path, columns=["tokens"]).map_batches(
        _strong_content_keys, batch_format="pyarrow", batch_size=16384
    )
    return bucketed_aggregate(keyed, "h1", partial, combine)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 31) - 1  # 31-bit prime: (a*x+b) fits in uint64 → vectorized


def _stable_shingle_hashes(words: list[str], k: int) -> np.ndarray:
    """Hash each k-word shingle to 31-bit uint (md5-based for determinism)."""
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "little") % _MERSENNE
    return out


def _perm_params(num_perm: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm-wide signature: min over shingles of (a*x+b) mod p.
    Vectorized as an (n_shingles × num_perm) uint64 outer product — both
    operands < 2^31 so the product never overflows."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    vals = (shingle_hashes[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return np.min(vals, axis=0)


class MinHashStage:
    """Actor-pool stage: permutation params built once per actor; emits one
    (band, bucket, doc_id, signature) row per band per doc."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3, seed: int = 1234):
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k
        self.a, self.b = _perm_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        return minhash_signature(_stable_shingle_hashes(text.split(" "), self.k), self.a, self.b)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_band, out_bucket, out_doc, out_sig = [], [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sig = self.signature(text)
            sig_bytes = sig.tobytes()
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                bucket = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                out_band.append(band)
                out_bucket.append(bucket)
                out_doc.append(doc_id)
                out_sig.append(sig_bytes)
        return pd.DataFrame(
            {"band": out_band, "bucket": out_bucket, "doc_id": out_doc, "sig": out_sig}
        )


_PAIR_EMPTY = pd.DataFrame({"doc_id_a": pd.Series(dtype="int64"), "doc_id_b": pd.Series(dtype="int64"), "est_jaccard": pd.Series(dtype="float64")})


def _pairs_from_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """All (a<b) pairs within one LSH bucket with signature-estimated
    Jaccard.  Bucket sizes are small by construction; a hot bucket indicates
    a hot near-dup cluster (report it rather than exploding pairs)."""
    rows = g.drop_duplicates("doc_id")
    if len(rows) < 2 or len(rows) > 200:  # hot-bucket guard
        return _PAIR_EMPTY
    recs = []
    docs = rows["doc_id"].tolist()
    sigs = [np.frombuffer(s, dtype=np.uint64) for s in rows["sig"]]
    for i, j in itertools.combinations(range(len(docs)), 2):
        est = float(np.mean(sigs[i] == sigs[j]))
        a, b = sorted((docs[i], docs[j]))
        recs.append((a, b, est))
    return pd.DataFrame(recs, columns=["doc_id_a", "doc_id_b", "est_jaccard"])


def minhash_lsh_pairs(
    docs_path: str,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """Candidate near-duplicate pairs with estimated Jaccard ≥ threshold.

    The minhash stage runs as stateless tasks (its state — permutation
    params — is tiny and driver-built, shipped in the task closure), so the
    pipeline never reserves CPU for idle pools; with map_groups shuffle
    stages downstream this also avoids pool-starvation on small clusters."""
    from hepdata_validator_ray.ops import grouped_pairs

    stage = MinHashStage(num_perm=num_perm, bands=bands, shingle_k=shingle_k)
    sig_rows = ray.data.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        lambda df: stage(df),
        batch_format="pandas",
        batch_size=2048,
    )
    # coarse-bucketed shuffle: fine (band, bucket) collisions located
    # vectorized inside each coarse bucket — per-group Python cost is paid
    # only for actual candidate clusters (ops.grouped_pairs)
    ds = grouped_pairs(sig_rows, ["band", "bucket"], _pairs_from_bucket, empty=_PAIR_EMPTY)
    # a pair can surface from several bands → dedupe, keep max estimate
    return (
        ds.groupby(["doc_id_a", "doc_id_b"])
        .max("est_jaccard")
        .map_batches(
            lambda t: t.filter(pa.compute.greater_equal(t["max(est_jaccard)"], threshold)).rename_columns(
                ["doc_id_a", "doc_id_b", "est_jaccard"]
            ),
            batch_format="pyarrow",
        )
    )


def near_dup_clusters(docs_path: str, threshold: float = 0.5, concurrency: int | None = None) -> pd.DataFrame:
    """Near-duplicate clusters: MinHash-LSH candidate pairs → connected
    components; cluster_id = min doc_id of the component (deterministic).

    Components come from iterative min-label propagation
    (ops.connected_components) — each iteration is a groupby-min, i.e. a
    bucketed exchange at 10^12 scale; post-LSH edge lists are small enough
    to run it vectorized in pandas here.  Same output contract either way."""
    from hepdata_validator_ray.ops import connected_components

    pairs = minhash_lsh_pairs(docs_path, threshold=threshold).to_pandas()
    out = connected_components(pairs)
    return out.rename(columns={"node": "doc_id"})


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(words: list[str]) -> int:
    """Classic 64-bit simhash over word hashes (Charikar 2002)."""
    if not words:
        return 0
    hs = np.array(
        [int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little") for w in words],
        dtype=np.uint64,
    )
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    return int(sum((np.uint64(1) << np.uint64(i)) for i in range(64) if v[i] > 0))


class SimHashStage:
    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sh = [simhash64(t.split(" ")) for t in df["text"]]
        return pd.DataFrame({"doc_id": df["doc_id"], "simhash": pd.array(sh, dtype="uint64")})


def simhash_pairs(docs_path: str, max_hamming: int = 3, concurrency: int | None = None) -> "ray.data.Dataset":
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via 4×16-bit band
    buckets (pigeonhole: distance ≤3 ⇒ one band equal)."""
    sh = ray.data.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        SimHashStage(), batch_format="pandas", batch_size=2048
    )

    def bands(df: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for doc_id, h in zip(df["doc_id"], df["simhash"]):
            h = int(h)
            for band in range(4):
                recs.append((band, (h >> (band * 16)) & 0xFFFF, doc_id, h))
        return pd.DataFrame(recs, columns=["band", "bucket", "doc_id", "simhash"])

    empty = pd.DataFrame(
        {"doc_id_a": pd.Series(dtype="int64"), "doc_id_b": pd.Series(dtype="int64"), "hamming": pd.Series(dtype="int64")}
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates("doc_id")
        if len(rows) < 2 or len(rows) > 200:
            return empty
        recs = []
        docs = rows["doc_id"].tolist()
        hs = [int(h) for h in rows["simhash"]]
        for i, j in itertools.combinations(range(len(docs)), 2):
            d = bin(hs[i] ^ hs[j]).count("1")
            if d <= max_hamming:
                a, b = sorted((docs[i], docs[j]))
                recs.append((a, b, d))
        return pd.DataFrame(recs, columns=["doc_id_a", "doc_id_b", "hamming"]) if recs else empty

    from hepdata_validator_ray.ops import grouped_pairs

    return (
        grouped_pairs(sh.map_batches(bands, batch_format="pandas"), ["band", "bucket"], verify, empty=empty)
        .groupby(["doc_id_a", "doc_id_b"])
        .min("hamming")
        .map_batches(lambda t: t.rename_columns(["doc_id_a", "doc_id_b", "hamming"]), batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, over LSH candidates)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs_path: str, threshold: float = 0.3, shingle_k: int = 3, concurrency: int | None = None
) -> "ray.data.Dataset":
    """Exact word-shingle Jaccard for MinHash-LSH candidate pairs.

    Small scale: the shingle-set table is broadcast (ray.put) into the verify
    stage, which runs as stateless tasks (ray.get of a shared object is
    plasma-cached per node).  At 10^12 docs the same verify becomes a
    repartition join of (pair → both shingle sets) on doc_id — noted here as
    the scale path."""
    cands = minhash_lsh_pairs(docs_path, threshold=0.0, shingle_k=shingle_k)

    docs = pd.read_parquet(docs_path, columns=["doc_id", "text"])
    sets = {
        d: frozenset(
            " ".join(ws[i : i + shingle_k]) for i in range(max(1, len(ws) - shingle_k + 1))
        )
        for d, t in zip(docs["doc_id"], docs["text"])
        for ws in [t.split(" ")]
    }
    ref = ray.put(sets)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        sets = ray.get(ref)
        jac = []
        for a, b in zip(df["doc_id_a"], df["doc_id_b"]):
            sa, sb = sets[a], sets[b]
            inter = len(sa & sb)
            union = len(sa | sb)
            jac.append(inter / union if union else 0.0)
        out = pd.DataFrame({"doc_id_a": df["doc_id_a"], "doc_id_b": df["doc_id_b"], "jaccard": jac})
        return out[out.jaccard >= threshold]

    return cands.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_cosine_pairs(emb_path: str, threshold: float = 0.9) -> "ray.data.Dataset":
    """Exact all-pairs cosine ≥ threshold (a<b).  The small side (full
    normalized matrix) is broadcast once via ray.put; each batch does one
    matmul against it — the oracle-checkable baseline."""
    emb = pd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat_n = mat / np.maximum(norms, 1e-12)
    ids = emb["vec_id"].to_numpy()
    ref = ray.put((ids, mat_n))

    class Stage:
        def __init__(self, r):
            self.ids, self.mat = ray.get(r)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            sims = qn @ self.mat.T  # vectorized: one matmul per batch
            qa = df["vec_id"].to_numpy()
            recs = []
            for i in range(len(qa)):
                hits = np.flatnonzero(sims[i] >= threshold)
                for j in hits:
                    if qa[i] < self.ids[j]:  # a<b dedupe, drops self-pairs
                        recs.append((int(qa[i]), int(self.ids[j]), round(float(sims[i, j]), 6)))
            return pd.DataFrame(recs, columns=["vec_id_a", "vec_id_b", "cos"])

    return ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"]).map_batches(
        Stage, fn_constructor_args=(ref,), batch_format="pandas", batch_size=1024, concurrency=2
    )


def embedding_lsh_pairs(
    emb_path: str,
    threshold: float = 0.9,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 7,
) -> pd.DataFrame:
    """Approximate variant: multi-table random-hyperplane LSH buckets →
    exact cosine within buckets.  The scale path: the shuffle moves
    (table, bucket, id, vec) rows and each bucket verifies locally;
    ``n_tables`` trades shuffle volume for recall (measured in tests against
    the exact all-pairs baseline)."""

    class BucketStage:
        def __init__(self, dim: int = 64):
            r = np.random.default_rng(seed)
            self.planes = [r.normal(size=(dim, n_planes)) for _ in range(n_tables)]

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            frames = []
            for t_idx, planes in enumerate(self.planes):
                signs = (q @ planes) > 0
                buckets = (signs * (1 << np.arange(n_planes))).sum(axis=1)
                frames.append(
                    pd.DataFrame(
                        {
                            "table": t_idx,
                            "bucket": buckets.astype(np.int64),
                            "vec_id": df["vec_id"],
                            "embedding": df["embedding"],
                        }
                    )
                )
            return pd.concat(frames, ignore_index=True)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id")
        if len(g) < 2 or len(g) > 500:
            return pd.DataFrame({"vec_id_a": [], "vec_id_b": [], "cos": []})
        mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ mat.T
        ids = g["vec_id"].to_numpy()
        recs = []
        ii, jj = np.where(np.triu(sims >= threshold, k=1))
        for i, j in zip(ii, jj):
            a, b = sorted((int(ids[i]), int(ids[j])))
            recs.append((a, b, round(float(sims[i, j]), 6)))
        return pd.DataFrame(recs, columns=["vec_id_a", "vec_id_b", "cos"])

    stage = BucketStage()
    out = (
        ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(lambda df: stage(df), batch_format="pandas", batch_size=2048)
        .groupby(["table", "bucket"])
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return pd.DataFrame(columns=["vec_id_a", "vec_id_b", "cos"])
    # a pair can surface from several tables → dedupe
    out = out.groupby(["vec_id_a", "vec_id_b"], as_index=False)["cos"].max()
    return out.astype({"vec_id_a": "int64", "vec_id_b": "int64"})
