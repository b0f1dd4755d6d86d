"""Mergeable column-statistic sketches (SURVEY.md §2.3 ST3).

The reference computes exact small-scale equivalents in memory (a ``seen``
set for duplicates, submission_file_validator.py:142-149; overflow/underflow
lists, data_file_validator.py:173-208).  At 10^12 rows those become mergeable
sketches accumulated per batch inside the check stage and combined by
associative ``merge`` — per-partition first (drift checks), then globally
(tree reduce).

All sketches are numpy-vectorized on update, associatively mergeable, and
serializable (``to_bytes``/``from_bytes``) so they can live in the checkpoint
manifest across resume boundaries.

Algorithms are the standard public constructions: HyperLogLog (Flajolet et
al. 2007), count-min sketch (Cormode & Muthukrishnan 2005), and a fixed
log-spaced histogram as the quantile sketch (mergeable by construction, the
role a t-digest plays; exact-merge semantics make resume reproducible).
"""

from __future__ import annotations

import pickle
import zlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd


def hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic vectorized 64-bit hash (stable across processes /
    PYTHONHASHSEED, unlike builtin hash)."""
    return pd.util.hash_array(np.asarray(values, dtype=object), categorize=False)


class HyperLogLog:
    """HLL with 2**p registers; vectorized adds; standard bias-corrected
    estimate.  Used for the doc_id distinct-count check."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        h = hash64(values)
        reg = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining 64-p bits + 1.
        # Exact branchless clz (6 halving steps): float log2 is NOT exact
        # for uint64 — values within half an ulp below a power of two round
        # UP (e.g. 2^63-1 → log2 == 63.0), understating the rank by 1.
        cur = rest.copy()
        lz = np.zeros(len(h), dtype=np.uint8)
        for shift in (32, 16, 8, 4, 2, 1):
            s = np.uint64(shift)
            small = cur < (np.uint64(1) << (np.uint64(64) - s))
            lz[small] += np.uint8(shift)
            cur[small] <<= s
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, reg, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** (-self.registers.astype(np.float64)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)  # linear counting small-range correction
        return float(est)


def _depth_salt(d: int) -> np.uint64:
    # 64-bit wrap computed in Python ints (numpy scalar uint64 multiply
    # warns on overflow even though wraparound is exactly what we want)
    return np.uint64((d * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF)


class CountMin:
    """Count-min sketch over hashable keys; used for source-frequency
    estimates when the source cardinality is too high for an exact map."""

    def __init__(self, width: int = 2048, depth: int = 4):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)

    def add(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(values) == 0:
            return
        if counts is None:
            counts = np.ones(len(values), dtype=np.int64)
        h = hash64(values)
        for d in range(self.depth):
            # d-th hash: XOR the depth into the HIGH bits BEFORE the multiply
            # (adding d+1 after the multiply put the perturbation in bits the
            # >>17 discarded, making every depth row the same hash function)
            hd = ((h ^ _depth_salt(d)) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
            np.add.at(self.table[d], (hd % np.uint64(self.width)).astype(np.int64), counts)

    def query(self, value) -> int:
        h = hash64(np.array([value], dtype=object))
        est = np.iinfo(np.int64).max
        for d in range(self.depth):
            hd = ((h ^ _depth_salt(d)) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
            est = min(est, int(self.table[d][int(hd[0] % np.uint64(self.width))]))
        return est

    def merge(self, other: "CountMin") -> "CountMin":
        assert (self.width, self.depth) == (other.width, other.depth)
        out = CountMin(self.width, self.depth)
        out.table = self.table + other.table
        return out


class BloomFilter:
    """Simple partitioned Bloom filter (k hash functions via double hashing,
    Kirsch-Mitzenmacher).  Used for broadcast semi-joins where even the
    duplicate-id SET is too large to ship exactly (10^12-scale `clean`):
    membership 'no' is exact, 'yes' has FP rate ≈ (1-e^{-kn/m})^k."""

    def __init__(self, n_bits: int = 1 << 20, k: int = 5):
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits // 8 + 1, dtype=np.uint8)

    def _positions(self, values: np.ndarray) -> np.ndarray:
        h1 = hash64(values)
        h2 = (h1 >> np.uint64(17)) | np.uint64(1)
        idx = np.empty((self.k, len(values)), dtype=np.uint64)
        for i in range(self.k):
            idx[i] = (h1 + np.uint64(i) * h2) % np.uint64(self.n_bits)
        return idx

    def add(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        pos = self._positions(np.asarray(values, dtype=object)).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64), (1 << (pos & np.uint64(7))).astype(np.uint8))

    def contains(self, values: np.ndarray) -> np.ndarray:
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(values, dtype=object))
        out = np.ones(len(values), dtype=bool)
        for i in range(self.k):
            p = pos[i]
            bit = (self.bits[(p >> np.uint64(3)).astype(np.int64)] >> (p & np.uint64(7)).astype(np.uint8)) & 1
            out &= bit.astype(bool)
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.n_bits, self.k) == (other.n_bits, other.k)
        out = BloomFilter(self.n_bits, self.k)
        out.bits = self.bits | other.bits
        return out


class HistogramSketch:
    """Fixed-bucket histogram over a bounded integer domain; serves as the
    mergeable quantile sketch for n_tok and the drift histogram."""

    def __init__(self, n_buckets: int = 256, lo: int = 0, hi: int = 16384):
        self.n_buckets = n_buckets
        self.lo = lo
        self.hi = hi
        self.counts = np.zeros(n_buckets + 2, dtype=np.int64)  # +under/overflow
        self.total = 0
        self.sum = 0
        self.min = None
        self.max = None

    def _bucket(self, x: np.ndarray) -> np.ndarray:
        scaled = ((x - self.lo) * self.n_buckets) // max(1, (self.hi - self.lo))
        return np.clip(scaled + 1, 0, self.n_buckets + 1).astype(np.int64)

    def add(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        v = values.astype(np.int64)
        np.add.at(self.counts, self._bucket(v), 1)
        self.total += len(v)
        self.sum += int(v.sum())
        mn, mx = int(v.min()), int(v.max())
        self.min = mn if self.min is None else min(self.min, mn)
        self.max = mx if self.max is None else max(self.max, mx)

    def merge(self, other: "HistogramSketch") -> "HistogramSketch":
        assert (self.n_buckets, self.lo, self.hi) == (other.n_buckets, other.lo, other.hi)
        out = HistogramSketch(self.n_buckets, self.lo, self.hi)
        out.counts = self.counts + other.counts
        out.total = self.total + other.total
        out.sum = self.sum + other.sum
        mins = [m for m in (self.min, other.min) if m is not None]
        maxs = [m for m in (self.max, other.max) if m is not None]
        out.min = min(mins) if mins else None
        out.max = max(maxs) if maxs else None
        return out

    def quantile(self, q: float) -> float:
        if self.total == 0:
            return float("nan")
        target = q * self.total
        cum = np.cumsum(self.counts)
        b = int(np.searchsorted(cum, target))
        width = (self.hi - self.lo) / self.n_buckets
        if b == 0:
            return float(self.lo)
        if b >= self.n_buckets + 1:
            return float(self.max if self.max is not None else self.hi)
        return float(self.lo + (b - 1) * width + width / 2)

    def mean(self) -> float:
        return self.sum / self.total if self.total else float("nan")

    def normalized(self) -> np.ndarray:
        return self.counts / max(1, self.total)


class UnigramHistogram:
    """Token-unigram frequency histogram.  ``n_buckets >= vocab_size`` gives
    exact per-token counts; smaller bucketing (token_id % n_buckets) bounds
    partial size at 10^12 scale — drift statistics tolerate bucketing."""

    def __init__(self, vocab_size: int, n_buckets: int | None = None):
        self.vocab_size = vocab_size
        self.n_buckets = n_buckets or vocab_size
        self.counts = np.zeros(self.n_buckets, dtype=np.int64)
        self.total = 0

    def add(self, token_ids: np.ndarray) -> None:
        if len(token_ids) == 0:
            return
        ids = token_ids[(token_ids >= 0) & (token_ids < self.vocab_size)]
        b = ids.astype(np.int64) % self.n_buckets
        self.counts += np.bincount(b, minlength=self.n_buckets)
        self.total += len(ids)

    def merge(self, other: "UnigramHistogram") -> "UnigramHistogram":
        assert self.n_buckets == other.n_buckets
        out = UnigramHistogram(self.vocab_size, self.n_buckets)
        out.counts = self.counts + other.counts
        out.total = self.total + other.total
        return out

    def normalized(self) -> np.ndarray:
        return self.counts / max(1, self.total)


class TDigest:
    """Mergeable t-digest (the north-star's named quantile sketch) — the
    UNBOUNDED-domain companion to HistogramSketch (which stays the default:
    its integer counts merge EXACTLY, so resume is bit-reproducible, while a
    t-digest's centroids depend on merge order).  Use this when the value
    domain is unknown/unbounded so no fixed bucket range exists.

    Classic merging digest (Dunning & Ertl): centroids (mean, weight) kept
    sorted by mean; compression greedily merges neighbours while the merged
    centroid's quantile span stays within the k1-scale bound
    4·n·q(1−q)/delta.  add()/merge() buffer then compress — O(C log C) per
    compression with C ≤ buffer+delta centroids; quantile() interpolates
    between centroid means with exact min/max endpoints."""

    def __init__(self, delta: int = 100):
        self.delta = int(delta)
        self.means = np.zeros(0, dtype=np.float64)
        self.weights = np.zeros(0, dtype=np.int64)
        self.total = 0
        self.min: float | None = None
        self.max: float | None = None
        self._buf: list[np.ndarray] = []
        self._buf_n = 0

    def add(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        v = np.asarray(values, dtype=np.float64)
        mn, mx = float(v.min()), float(v.max())
        self.min = mn if self.min is None else min(self.min, mn)
        self.max = mx if self.max is None else max(self.max, mx)
        self._buf.append(v)
        self._buf_n += len(v)
        self.total += len(v)
        if self._buf_n >= 8 * self.delta:
            self._compress()

    def _compress(self) -> None:
        if self._buf:
            bv = np.concatenate(self._buf)
            means = np.concatenate([self.means, bv])
            weights = np.concatenate([self.weights, np.ones(len(bv), dtype=np.int64)])
            self._buf, self._buf_n = [], 0
        else:
            means, weights = self.means, self.weights
        if len(means) == 0:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        n = int(weights.sum())

        def _k(q: float) -> float:
            # k1 scale function: bounded centroid count (~delta), finest
            # resolution at the tails (Dunning & Ertl)
            return self.delta / (2.0 * np.pi) * np.arcsin(2.0 * min(1.0, max(0.0, q)) - 1.0)

        out_m: list[float] = []
        out_w: list[int] = []
        cum = 0  # weight strictly before the open centroid
        k_left = _k(0.0)
        cm, cw = means[0] * weights[0], int(weights[0])
        for m, w in zip(means[1:], weights[1:]):
            w = int(w)
            if _k((cum + cw + w) / n) - k_left <= 1.0:
                cm += m * w
                cw += w
            else:
                out_m.append(cm / cw)
                out_w.append(cw)
                cum += cw
                k_left = _k(cum / n)
                cm, cw = m * w, w
        out_m.append(cm / cw)
        out_w.append(cw)
        self.means = np.asarray(out_m, dtype=np.float64)
        self.weights = np.asarray(out_w, dtype=np.int64)

    def merge(self, other: "TDigest") -> "TDigest":
        assert self.delta == other.delta
        out = TDigest(self.delta)
        self._compress()
        other._compress()
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        out.total = self.total + other.total
        mins = [m for m in (self.min, other.min) if m is not None]
        maxs = [m for m in (self.max, other.max) if m is not None]
        out.min = min(mins) if mins else None
        out.max = max(maxs) if maxs else None
        out._compress()
        return out

    def quantile(self, q: float) -> float:
        self._compress()
        if self.total == 0:
            return float("nan")
        if q <= 0:
            return float(self.min)
        if q >= 1:
            return float(self.max)
        target = q * self.total
        cum = np.cumsum(self.weights) - self.weights / 2.0
        i = int(np.searchsorted(cum, target))
        if i == 0:
            lo_x, lo_c = float(self.min), 0.0
            hi_x, hi_c = float(self.means[0]), float(cum[0])
        elif i >= len(self.means):
            lo_x, lo_c = float(self.means[-1]), float(cum[-1])
            hi_x, hi_c = float(self.max), float(self.total)
        else:
            lo_x, lo_c = float(self.means[i - 1]), float(cum[i - 1])
            hi_x, hi_c = float(self.means[i]), float(cum[i])
        if hi_c <= lo_c:
            return lo_x
        frac = (target - lo_c) / (hi_c - lo_c)
        return lo_x + frac * (hi_x - lo_x)

    def n_centroids(self) -> int:
        self._compress()
        return len(self.means)


class ExactFrequency:
    """Exact frequency map for low-cardinality keys (source column)."""

    def __init__(self):
        self.counts: dict = {}

    def add(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        if counts is None:
            uniq, cnt = np.unique(np.asarray(values, dtype=object), return_counts=True)
        else:
            uniq, cnt = values, counts
        for k, c in zip(uniq, cnt):
            self.counts[k] = self.counts.get(k, 0) + int(c)

    def merge(self, other: "ExactFrequency") -> "ExactFrequency":
        out = ExactFrequency()
        out.counts = dict(self.counts)
        for k, c in other.counts.items():
            out.counts[k] = out.counts.get(k, 0) + c
        return out


@dataclass
class SketchBundle:
    """All sketches the check stage accumulates per batch/partition, with a
    single associative merge — the unit the drift check and the global-stats
    reduction operate on."""

    hll_doc_id: HyperLogLog = field(default_factory=lambda: HyperLogLog(12))
    n_tok_hist: HistogramSketch = field(default_factory=lambda: HistogramSketch(256, 0, 16384))
    source_freq: ExactFrequency = field(default_factory=ExactFrequency)
    unigram: UnigramHistogram | None = None
    n_rows: int = 0

    def merge(self, other: "SketchBundle") -> "SketchBundle":
        out = SketchBundle(
            hll_doc_id=self.hll_doc_id.merge(other.hll_doc_id),
            n_tok_hist=self.n_tok_hist.merge(other.n_tok_hist),
            source_freq=self.source_freq.merge(other.source_freq),
            unigram=(
                self.unigram.merge(other.unigram)
                if self.unigram is not None and other.unigram is not None
                else (self.unigram or other.unigram)
            ),
            n_rows=self.n_rows + other.n_rows,
        )
        return out

    def to_bytes(self) -> bytes:
        return zlib.compress(pickle.dumps(self), 1)

    @staticmethod
    def from_bytes(b: bytes) -> "SketchBundle":
        return pickle.loads(zlib.decompress(b))


# ---------------------------------------------------------------------------
# Drift statistics (A5): KL divergence and chi-squared vs a reference profile
# ---------------------------------------------------------------------------

def kl_divergence(p: np.ndarray, q: np.ndarray, eps: float = 1e-9) -> float:
    p = p / max(p.sum(), eps)
    q = q / max(q.sum(), eps)
    mask = p > 0
    return float(np.sum(p[mask] * np.log((p[mask] + eps) / (q[mask] + eps))))


def chi_squared(observed: np.ndarray, expected_frac: np.ndarray, eps: float = 1e-9) -> float:
    n = observed.sum()
    if n == 0:
        return 0.0
    exp = expected_frac / max(expected_frac.sum(), eps) * n
    # clamp, don't mask: observed mass in a category the reference profile
    # never saw is the strongest drift signal there is — masking exp<=eps
    # buckets silently excluded exactly that mass (the KL scorer flags it
    # via log((p+eps)/eps); the floor of 0.5 bounds the per-bucket term at
    # ~2·observed², mirroring the classic continuity treatment)
    exp = np.maximum(exp, 0.5)
    return float(np.sum((observed - exp) ** 2 / exp))
