"""End-to-end cleaning pipeline: survivors = rows passing every check with
globally unique doc_ids; ground-truth derived from the injection arithmetic."""

from hepdata_validator_ray.pipelines.clean import clean_sequences, clean_survivor_stats
from hepdata_validator_ray.synth import (
    ensure_sequences_parquet,
    expected_violation_doc_rows,
)

SF = "/root/testdata/sf0.001"
N = 2000


def test_survivor_count_matches_ground_truth():
    p = ensure_sequences_parquet(SF, n_files=4)
    gt = expected_violation_doc_rows(N)
    bad_rows = set()
    for rows in gt.values():
        bad_rows |= rows
    expected_survivors = N - len(bad_rows)
    cleaned = clean_sequences(p)
    assert cleaned.count() == expected_survivors
    # survivors re-validate clean
    from hepdata_validator_ray.engine import ValidationConfig, ValidationEngine

    res = ValidationEngine(ValidationConfig(enable_sketches=False)).validate_dataset(cleaned)
    assert res.valid


def test_survivor_stats_sum(tmp_path):
    p = ensure_sequences_parquet(SF, n_files=4)
    stats = clean_survivor_stats(p).to_pandas()
    gt = expected_violation_doc_rows(N)
    bad_rows = set()
    for rows in gt.values():
        bad_rows |= rows
    assert int(stats.n_rows.sum()) == N - len(bad_rows)
    assert set(stats.source) <= {"web", "books", "code", "wiki", "news"}


def test_high_dup_rate_never_driver_materialized(tmp_path, monkeypatch):
    """VERDICT r4 #1: at a ≥20% dup rate the dup-id set must never land on
    the driver — clean_sequences goes Bloom + distributed verify, so any
    Dataset.to_pandas() during the build is a regression.  Survivors are
    exactly the unique-id rows (all rows otherwise valid)."""
    import numpy as np
    import pandas as pd
    import ray.data

    rng = np.random.default_rng(7)
    n = 4000
    # 25% of rows collapsed onto 100 shared dup ids; the rest unique
    is_dup = rng.random(n) < 0.25
    ids = np.array([f"doc-web-{i:08d}" for i in range(n)], dtype=object)
    ids[is_dup] = np.array([f"doc-dup-{int(c) % 100:08d}" for c in rng.integers(0, 100, is_dup.sum())], dtype=object)
    toks = [list(map(int, rng.integers(0, 50257, 5))) for _ in range(n)]
    df = pd.DataFrame(
        {"doc_id": ids, "tokens": toks, "n_tok": np.int32(5), "source": "web"}
    )
    p = str(tmp_path / "seq.parquet")
    df.to_parquet(p, index=False)

    def _banned(self, *a, **k):
        raise AssertionError("driver-side to_pandas during clean_sequences build")

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", _banned)
    cleaned = clean_sequences(p)
    monkeypatch.undo()

    got = set(cleaned.to_pandas()["doc_id"])
    vc = pd.Series(ids).value_counts()
    expected = set(vc[vc == 1].index)
    assert got == expected
    assert len(expected) < 0.85 * n  # the fixture really is high-dup


def test_clean_write_roundtrip(tmp_path):
    p = ensure_sequences_parquet(SF, n_files=4)
    out = clean_sequences(p, output_dir=str(tmp_path / "clean"))
    import ray.data

    assert out.count() == clean_sequences(p).count()


def _docs_parquet(tmp_path, rows):
    import pandas as pd

    p = str(tmp_path / "docs.parquet")
    pd.DataFrame(rows).to_parquet(p, index=False)
    return p


def _local_clean_docs_truth(rows, min_words=5, min_chars=20):
    """Ground truth replaying the DuckDB oracle semantics in pandas."""
    import hashlib

    import pandas as pd

    df = pd.DataFrame(rows)
    df["h"] = [
        hashlib.md5(t.encode()).hexdigest() if isinstance(t, str) else "<NULL>"
        for t in df["text"]
    ]
    keep = df.groupby("h")["doc_id"].transform("min") == df["doc_id"]
    nw = df["text"].str.split(" ").str.len().fillna(0)
    nc = df["text"].str.len().fillna(0)
    surv = df[keep & (nw >= min_words) & (nc >= min_chars)]
    return surv["lang"].value_counts().sort_index()


def _assert_clean_docs(tmp_path, rows, **kw):
    from hepdata_validator_ray.pipelines.clean import clean_documents_stats

    p = _docs_parquet(tmp_path, rows)
    got = (
        clean_documents_stats(p, **kw)
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    exp = _local_clean_docs_truth(rows)
    assert list(got["lang"]) == list(exp.index)
    assert list(got["n_docs"].astype(int)) == list(exp.to_numpy())


def test_clean_docs_stats_no_dups(tmp_path, ray_session):
    """Empty winner table: Bloom stays all-zero, every row takes the
    provably-unique miss path, verify exchange sees only the sentinel."""
    rows = [
        {"doc_id": i, "lang": "en" if i % 2 else "de", "text": f"unique document number {i} with words"}
        for i in range(40)
    ]
    _assert_clean_docs(tmp_path, rows)


def test_clean_docs_stats_dup_dense(tmp_path, ray_session):
    """Adversarial dup rate (every text shared by 10 docs): keep-first
    winners only, counted once per class."""
    rows = [
        {"doc_id": i, "lang": "en", "text": f"shared corpus text block {i % 4} padded out"}
        for i in range(40)
    ]
    _assert_clean_docs(tmp_path, rows)


def test_clean_docs_stats_bloom_false_positives_exact(tmp_path, ray_session):
    """A deliberately tiny Bloom (64 bits, hundreds of distinct classes)
    saturates to near-all-ones — nearly every unique row becomes a false
    positive and must survive the verify exchange (no winner row for its
    class).  Result stays exactly equal to ground truth."""
    rows = [
        {"doc_id": i, "lang": ["en", "de", "fr"][i % 3], "text": f"document body {i} some extra words here"}
        for i in range(300)
    ]
    rows += [  # a few true dup classes mixed in
        {"doc_id": 1000 + i, "lang": "en", "text": f"duplicated body {i % 5} padded with words"}
        for i in range(50)
    ]
    _assert_clean_docs(tmp_path, rows, bloom_bits=64)


def test_clean_docs_stats_quality_filter_boundaries(tmp_path, ray_session):
    """Rows failing min_words / min_chars never count, duplicate or not;
    null text scores as empty and is filtered."""
    rows = [
        {"doc_id": 0, "lang": "en", "text": "short"},  # fails both
        {"doc_id": 1, "lang": "en", "text": "one two three four five six seven"},  # passes
        {"doc_id": 2, "lang": "en", "text": "one two three four five six seven"},  # dup of 1
        {"doc_id": 3, "lang": "de", "text": None},  # null text
        {"doc_id": 4, "lang": "de", "text": "a b c d e f g h i j k l m n o p q"},  # passes
    ]
    _assert_clean_docs(tmp_path, rows)
