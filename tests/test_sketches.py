"""Sketch correctness: accuracy envelopes, associative merge, serialization."""

import numpy as np
import pytest

from hepdata_validator_ray.sketches import (
    CountMin,
    ExactFrequency,
    HistogramSketch,
    HyperLogLog,
    SketchBundle,
    UnigramHistogram,
    chi_squared,
    hash64,
    kl_divergence,
)


def test_hash64_deterministic():
    a = hash64(np.array(["x", "y", "x"], dtype=object))
    b = hash64(np.array(["x", "y", "x"], dtype=object))
    assert (a == b).all()
    assert a[0] == a[2] and a[0] != a[1]


def test_hll_estimate_within_error():
    hll = HyperLogLog(12)
    vals = np.array([f"doc-{i}" for i in range(100_000)], dtype=object)
    hll.add(vals)
    est = hll.estimate()
    # standard error ~1.04/sqrt(4096) ≈ 1.6%; allow 5%
    assert abs(est - 100_000) / 100_000 < 0.05


def test_hll_merge_equals_union():
    a, b = HyperLogLog(12), HyperLogLog(12)
    a.add(np.array([f"a{i}" for i in range(5000)], dtype=object))
    b.add(np.array([f"b{i}" for i in range(5000)], dtype=object))
    both = HyperLogLog(12)
    both.add(np.array([f"a{i}" for i in range(5000)] + [f"b{i}" for i in range(5000)], dtype=object))
    assert a.merge(b).estimate() == pytest.approx(both.estimate())


def test_hll_duplicates_dont_inflate():
    hll = HyperLogLog(12)
    hll.add(np.array(["same"] * 10_000, dtype=object))
    assert hll.estimate() < 10


def test_countmin_overestimates_only():
    cm = CountMin(width=2048, depth=4)
    rng = np.random.default_rng(0)
    keys = np.array([f"k{i % 50}" for i in range(10_000)], dtype=object)
    cm.add(keys)
    for i in range(50):
        assert cm.query(f"k{i}") >= 200  # true count
    merged = cm.merge(cm)
    assert merged.query("k0") >= 2 * cm.query("k0") - 1


def test_histogram_quantiles_and_merge():
    h = HistogramSketch(256, 0, 16384)
    rng = np.random.default_rng(1)
    data = rng.integers(0, 1000, 50_000)
    h.add(data)
    assert h.total == 50_000
    assert h.min == data.min() and h.max == data.max()
    assert h.mean() == pytest.approx(data.mean(), rel=1e-9)
    # bucket width is 64 → quantile within one bucket of truth
    assert abs(h.quantile(0.5) - np.quantile(data, 0.5)) <= 64
    h2 = HistogramSketch(256, 0, 16384)
    h2.add(data + 200)
    merged = h.merge(h2)
    assert merged.total == 100_000
    assert merged.sum == h.sum + h2.sum


def test_unigram_exact_and_bucketed():
    u = UnigramHistogram(vocab_size=100)
    u.add(np.array([1, 1, 2, 99, 100, -5], dtype=np.int64))  # 100 and -5 ignored
    assert u.total == 4
    assert u.counts[1] == 2 and u.counts[2] == 1 and u.counts[99] == 1
    b = UnigramHistogram(vocab_size=100, n_buckets=10)
    b.add(np.array([1, 11, 21], dtype=np.int64))
    assert b.counts[1] == 3  # all collapse to bucket 1


def test_exact_frequency_merge():
    a, b = ExactFrequency(), ExactFrequency()
    a.add(np.array(["x", "x", "y"], dtype=object))
    b.add(np.array(["y", "z"], dtype=object))
    m = a.merge(b)
    assert m.counts == {"x": 2, "y": 2, "z": 1}


def test_bundle_roundtrip_and_merge():
    b1, b2 = SketchBundle(), SketchBundle()
    b1.unigram = UnigramHistogram(50)
    b2.unigram = UnigramHistogram(50)
    b1.hll_doc_id.add(np.array(["a", "b"], dtype=object))
    b2.hll_doc_id.add(np.array(["b", "c"], dtype=object))
    b1.n_tok_hist.add(np.array([10, 20]))
    b2.n_tok_hist.add(np.array([30]))
    b1.n_rows, b2.n_rows = 2, 1
    m = b1.merge(b2)
    assert m.n_rows == 3
    assert m.n_tok_hist.total == 3
    rt = SketchBundle.from_bytes(m.to_bytes())
    assert rt.n_rows == 3
    assert rt.n_tok_hist.total == 3
    assert (rt.hll_doc_id.registers == m.hll_doc_id.registers).all()


def test_bloom_filter():
    from hepdata_validator_ray.sketches import BloomFilter

    bf = BloomFilter(n_bits=1 << 16, k=5)
    members = np.array([f"doc-{i}" for i in range(1000)], dtype=object)
    bf.add(members)
    assert bf.contains(members).all()  # no false negatives, ever
    others = np.array([f"other-{i}" for i in range(10_000)], dtype=object)
    fp_rate = bf.contains(others).mean()
    assert fp_rate < 0.05  # m/n=65, k=5 → theoretical ~1e-5; generous bound
    # merge = union
    bf2 = BloomFilter(n_bits=1 << 16, k=5)
    extra = np.array(["zzz-1", "zzz-2"], dtype=object)
    bf2.add(extra)
    merged = bf.merge(bf2)
    assert merged.contains(members).all() and merged.contains(extra).all()


def test_connected_components_label_propagation():
    import pandas as pd

    from hepdata_validator_ray.ops import connected_components

    # two components: {1,2,3,4} (chain) and {10,11}; singleton 99 not in edges
    pairs = pd.DataFrame(
        {"doc_id_a": [1, 2, 3, 10], "doc_id_b": [2, 3, 4, 11]}
    )
    out = connected_components(pairs)
    cid = dict(zip(out.node, out.cluster_id))
    assert cid[1] == cid[2] == cid[3] == cid[4] == 1
    assert cid[10] == cid[11] == 10
    assert connected_components(pairs.iloc[0:0]).empty


def test_kl_and_chisq():
    p = np.array([0.5, 0.5, 0.0])
    assert kl_divergence(p, p) == pytest.approx(0.0, abs=1e-6)
    q = np.array([0.9, 0.1, 0.0])
    assert kl_divergence(p, q) > 0.2
    obs = np.array([50, 50])
    assert chi_squared(obs, np.array([0.5, 0.5])) == pytest.approx(0.0)
    assert chi_squared(obs, np.array([0.9, 0.1])) > 100


def test_tdigest_quantiles_close_to_exact():
    """t-digest quantile estimates within tight relative error of exact
    order stats on a skewed (lognormal-ish) sample, and centroid count
    bounded by ~2·delta."""
    import numpy as np

    from hepdata_validator_ray.sketches import TDigest

    rng = np.random.default_rng(7)
    x = np.exp(rng.normal(0, 1.2, size=50_000)) * 100.0
    td = TDigest(delta=100)
    for chunk in np.array_split(x, 37):
        td.add(chunk)
    xs = np.sort(x)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        exact = xs[int(q * (len(xs) - 1))]
        est = td.quantile(q)
        assert abs(est - exact) <= 0.05 * exact + 1e-9, (q, est, exact)
    assert td.n_centroids() <= 2 * td.delta
    assert td.quantile(0.0) == xs[0] and td.quantile(1.0) == xs[-1]


def test_tdigest_merge_matches_single_digest_accuracy():
    """Sharded add + tree merge stays as accurate as one digest over the
    whole stream (the distributed-aggregation contract)."""
    import numpy as np

    from hepdata_validator_ray.sketches import TDigest

    rng = np.random.default_rng(11)
    x = rng.uniform(0, 1000, size=40_000)
    shards = []
    for part in np.array_split(x, 16):
        t = TDigest(delta=100)
        t.add(part)
        shards.append(t)
    while len(shards) > 1:  # tree merge, the engine's reduce shape
        shards = [
            shards[i].merge(shards[i + 1]) if i + 1 < len(shards) else shards[i]
            for i in range(0, len(shards), 2)
        ]
    td = shards[0]
    xs = np.sort(x)
    assert td.total == len(x)
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        exact = xs[int(q * (len(xs) - 1))]
        assert abs(td.quantile(q) - exact) <= 0.02 * 1000, q


def test_tdigest_empty_and_single_value():
    import numpy as np

    from hepdata_validator_ray.sketches import TDigest

    td = TDigest()
    assert np.isnan(td.quantile(0.5))
    td.add(np.array([42.0]))
    assert td.quantile(0.5) == 42.0
    assert td.quantile(0.0) == 42.0 == td.quantile(1.0)
