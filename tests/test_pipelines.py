"""Pipeline tests: the non-SQL-expressible operators get exact in-test
oracles here (MinHash vs exact Jaccard, LSH recall vs brute force, IVF
recall, langid on real multilingual snippets, fingerprint determinism,
multimodal plumbing)."""

import itertools

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"
EMB = f"{SF}/embeddings.parquet"


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def _exact_jaccard_sets(k=3):
    docs = pd.read_parquet(DOCS, columns=["doc_id", "text"])
    sets = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        ws = t.split(" ")
        sets[d] = frozenset(" ".join(ws[i : i + k]) for i in range(max(1, len(ws) - k + 1)))
    return sets


def test_minhash_estimates_track_exact_jaccard():
    from hepdata_validator_ray.pipelines.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(DOCS, threshold=0.0, concurrency=2).to_pandas()
    pairs = pairs[pairs.doc_id_a >= 0]  # drop hot-bucket report rows
    assert len(pairs) > 0
    sets = _exact_jaccard_sets()
    errs = []
    for _, r in pairs.iterrows():
        sa, sb = sets[r.doc_id_a], sets[r.doc_id_b]
        exact = len(sa & sb) / len(sa | sb)
        errs.append(abs(exact - r.est_jaccard))
    # 64 permutations → std error ≈ sqrt(j(1-j)/64) ≈ 0.06; allow 0.25 worst-case
    assert np.mean(errs) < 0.1
    assert max(errs) < 0.3


def test_ngram_jaccard_is_exact():
    from hepdata_validator_ray.pipelines.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(DOCS, threshold=0.0, concurrency=2).to_pandas()
    sets = _exact_jaccard_sets()
    for _, r in pairs.iterrows():
        sa, sb = sets[r.doc_id_a], sets[r.doc_id_b]
        exact = len(sa & sb) / len(sa | sb)
        assert r.jaccard == pytest.approx(exact)


def test_simhash_pairs_verified_hamming():
    from hepdata_validator_ray.pipelines.dedup import simhash64, simhash_pairs

    pairs = simhash_pairs(DOCS, max_hamming=5, concurrency=2).to_pandas()
    pairs = pairs[pairs.doc_id_a >= 0]  # drop hot-bucket report rows
    docs = pd.read_parquet(DOCS, columns=["doc_id", "text"]).set_index("doc_id")["text"]
    for _, r in pairs.iterrows():
        d = bin(simhash64(docs[r.doc_id_a].split(" ")) ^ simhash64(docs[r.doc_id_b].split(" "))).count("1")
        assert d == r.hamming
        assert d <= 5


def test_exact_dedup_on_injected_duplicates():
    """Exact duplicate detection over the synthetic sequence table (which has
    injected doc_id duplicates with known ground truth)."""
    from hepdata_validator_ray.pipelines.validation import duplicate_doc_ids
    from hepdata_validator_ray.synth import ensure_sequences_parquet, expected_violation_doc_rows, generate_sequences_table

    p = ensure_sequences_parquet(SF, n_files=4)
    dups = duplicate_doc_ids(p).to_pandas()
    gt_rows = expected_violation_doc_rows(2000)["doc_id_duplicates"]
    tbl = generate_sequences_table(2000, seed=42)
    docs = tbl.column("doc_id").to_pylist()
    exp_ids = {docs[i] for i in gt_rows}
    assert set(dups.doc_id) == exp_ids
    assert int(dups.cnt.sum()) == len(gt_rows)


def test_embedding_lsh_recall_vs_bruteforce():
    from hepdata_validator_ray.pipelines.dedup import embedding_cosine_pairs, embedding_lsh_pairs

    exact = embedding_cosine_pairs(EMB, threshold=0.4).to_pandas()
    approx = embedding_lsh_pairs(EMB, threshold=0.4).to_pandas()
    approx = approx[approx.vec_id_a >= 0]  # drop hot-bucket report rows
    exact_pairs = set(zip(exact.vec_id_a, exact.vec_id_b))
    approx_pairs = set(zip(approx.vec_id_a, approx.vec_id_b))
    assert approx_pairs <= exact_pairs  # no false positives (exact verify)
    if exact_pairs:
        assert len(approx_pairs) / len(exact_pairs) > 0.2  # recall floor at cos≈0.4


def test_near_dup_clusters_are_consistent():
    """Cluster invariants: every pair endpoint is clustered; pairs land in
    the same cluster; cluster_id is the min member (deterministic)."""
    from hepdata_validator_ray.pipelines.dedup import minhash_lsh_pairs, near_dup_clusters

    pairs = minhash_lsh_pairs(DOCS, threshold=0.5).to_pandas()
    pairs = pairs[pairs.doc_id_a >= 0]
    clusters = near_dup_clusters(DOCS, threshold=0.5)
    cid = dict(zip(clusters.doc_id, clusters.cluster_id))
    for _, r in pairs.iterrows():
        assert cid[r.doc_id_a] == cid[r.doc_id_b]
    for _, r in clusters.iterrows():
        assert r.cluster_id <= r.doc_id
        assert cid[r.cluster_id] == r.cluster_id  # roots are self-labeled


def test_hot_bucket_is_reported_not_dropped(tmp_path):
    """A constructed hot near-dup cluster (> HOT_BUCKET_LIMIT docs with
    identical text) must surface as doc_id_a == -1 report rows carrying the
    bucket size — truncation is visible in results, never silent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.dedup import HOT_BUCKET_LIMIT, minhash_lsh_pairs

    n_hot = HOT_BUCKET_LIMIT + 50
    text = ["the same exact document text repeated verbatim many times"] * n_hot + [
        f"unique filler document number {i} with distinct words" for i in range(20)
    ]
    tbl = pa.table({"doc_id": list(range(len(text))), "text": text})
    pq.write_table(tbl, tmp_path / "docs.parquet")

    pairs = minhash_lsh_pairs(str(tmp_path / "docs.parquet"), threshold=0.5).to_pandas()
    hot = pairs[pairs.doc_id_a < 0]
    assert len(hot) > 0, "hot bucket must be reported"
    assert (hot.est_jaccard == n_hot).all()  # metric carries the bucket size
    # and the truncated cluster produced no quadratic pair explosion
    real = pairs[pairs.doc_id_a >= 0]
    assert len(real) < n_hot * (n_hot - 1) / 2


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------

def _bruteforce_topk(k=10, n_queries=3):
    emb = pd.read_parquet(EMB, columns=["vec_id", "embedding"]).sort_values("vec_id")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    out = {}
    for qi in range(n_queries):
        sims = mat[qi] @ mat.T
        top = np.argsort(-sims)[:k]
        out[int(ids[qi])] = [int(ids[j]) for j in top]
    return out


def test_ann_bruteforce_matches_numpy():
    from hepdata_validator_ray.pipelines.similarity import ann_topk_bruteforce

    got = ann_topk_bruteforce(EMB, k=10, n_queries=3)
    ref = _bruteforce_topk(k=10, n_queries=3)
    for qid, neigh in ref.items():
        got_n = set(got[got.query_id == qid].neighbor_id)
        assert got_n == set(neigh)


def test_ann_ivf_recall():
    from hepdata_validator_ray.pipelines.similarity import ann_topk_ivf

    got = ann_topk_ivf(EMB, k=10, n_queries=3, n_cells=16, n_probe=8)
    ref = _bruteforce_topk(k=10, n_queries=3)
    recalls = []
    for qid, neigh in ref.items():
        got_n = set(got[got.query_id == qid].neighbor_id)
        recalls.append(len(got_n & set(neigh)) / len(neigh))
    assert np.mean(recalls) >= 0.5  # probing half the cells


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------

def test_langid_on_real_snippets():
    from hepdata_validator_ray.pipelines.text import LangIdStage

    stage = LangIdStage()
    cases = {
        "the cat and the dog went to the house of a friend": "en",
        "der Hund und die Katze sind nicht in der Stadt": "de",
        "le chat et le chien ne sont pas dans la maison": "fr",
        "el perro y el gato no están en la casa": "es",
        "我 是 一 个 人 他 是 我 的 朋友": "zh",
    }
    for text, lang in cases.items():
        assert stage.predict_one(text) == lang, text
    assert stage.predict_one("") == "unknown"
    assert stage.predict_one("zzz qqq xxx") == "unknown"


def test_langid_golden_conformance():
    """Golden-file conformance (VERDICT r1 #10): full langid output over the
    sf0.001 documents byte-matches the committed golden — regression guard
    for the no-oracle query."""
    import os

    from hepdata_validator_ray.pipelines.text import lang_id

    got = lang_id(DOCS).to_pandas().sort_values("doc_id").reset_index(drop=True)
    golden = pd.read_csv(os.path.join(os.path.dirname(__file__), "golden", "langid_sf0001.csv"))
    pd.testing.assert_frame_equal(got, golden)


def test_fingerprint_golden_conformance():
    import os

    from hepdata_validator_ray.pipelines.text import fingerprints

    got = fingerprints(DOCS).to_pandas().sort_values("doc_id").reset_index(drop=True)
    golden = pd.read_csv(
        os.path.join(os.path.dirname(__file__), "golden", "fingerprints_sf0001.csv"),
        dtype={"fingerprint": "uint64"},
    )
    got["fingerprint"] = got["fingerprint"].astype("uint64")
    pd.testing.assert_frame_equal(got, golden)


def test_fingerprint_properties():
    from hepdata_validator_ray.pipelines.text import fingerprint_words

    a = fingerprint_words(["the", "quick", "fox"])
    assert a == fingerprint_words(["the", "quick", "fox"])  # deterministic
    assert a != fingerprint_words(["quick", "the", "fox"])  # order-sensitive
    assert a != fingerprint_words(["the", "quick"])  # length-sensitive


def test_quality_and_token_count_consistency():
    from hepdata_validator_ray.pipelines.text import quality_scores, token_count_ws

    q = quality_scores(DOCS).to_pandas().set_index("doc_id")
    t = token_count_ws(DOCS).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(DOCS).set_index("doc_id")
    assert (q["n_chars_calc"] == docs["n_chars"]).all()  # provided metadata agrees
    assert (q["n_words"] == t["n_ws_tokens"]).all()


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_multimodal_decode_stub():
    from hepdata_validator_ray.pipelines.multimodal import decoded_features

    out = decoded_features(DOCS, concurrency=2).to_pandas()
    assert len(out) == 500
    assert set(out.columns) == {"doc_id", "n_bytes", "byte_hist"}
    # histogram sums to byte count (fake decode is internally consistent)
    sums = out["byte_hist"].map(sum)
    assert (sums == out["n_bytes"]).all()


def test_multimodal_resize_and_frames():
    from hepdata_validator_ray.pipelines.multimodal import resized_payloads, sampled_frames

    out = resized_payloads(DOCS, concurrency=2).to_pandas()
    assert (out.n_bytes == 64).all()
    assert len(out) == 500

    frames = sampled_frames(DOCS, concurrency=2).to_pandas()
    assert len(frames) > 500  # flat_map shape: multiple frames per doc
    assert set(frames.columns) == {"doc_id", "frame_idx", "frame"}
    assert (frames.frame_idx % 4 == 0).all()
    assert frames.frame.map(len).max() <= 32


def test_multimodal_strict_mode_raises():
    import ray.exceptions
    from hepdata_validator_ray.pipelines.multimodal import decoded_features

    with pytest.raises(Exception):  # surfaces as RayTaskError(NotImplementedError)
        decoded_features(DOCS, concurrency=1, strict=True).to_pandas()


def test_exact_dedup_production_key_matches_md5_groups():
    """siphash production key yields the same dup-group structure as the
    md5 oracle-parity key."""
    from hepdata_validator_ray.pipelines.dedup import exact_dup_groups

    a = exact_dup_groups(DOCS, key_fn="md5")
    b = exact_dup_groups(DOCS, key_fn="siphash")
    assert a.equals(b)


def test_repetition_metrics_kernel():
    """_repetition_metrics vs a plain-Python reference on crafted rows
    (dup-heavy, singleton, empty-ish)."""
    import collections

    import numpy as np
    import pandas as pd

    from hepdata_validator_ray.pipelines.text import _explode_words, _repetition_metrics

    texts = [
        "a b a b a b c",          # dup words + dominant bigram 'a b'
        "x",                      # single word, no bigrams
        "one two three four",     # all distinct
        "z z z z z",              # one word repeated
    ]
    words = pd.Series(texts).str.split(" ")
    flat, offsets = _explode_words(words)
    distinct, top_bigram, sum_wlen = _repetition_metrics(flat, offsets)
    for i, t in enumerate(texts):
        ws = t.split(" ")
        assert distinct[i] == len(set(ws))
        assert sum_wlen[i] == sum(len(w) for w in ws)
        bigrams = collections.Counter(zip(ws, ws[1:]))
        assert top_bigram[i] == (max(bigrams.values()) if bigrams else 0)


def test_quality_scores_repetition_columns(ray_session):
    """End-to-end over the real table: spot-check one doc against Python."""
    import collections

    from hepdata_validator_ray.pipelines import text as text_pipe

    out = text_pipe.quality_scores("/root/testdata/sf0.001/documents.parquet").to_pandas()
    import pyarrow.parquet as pq

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    merged = out.merge(docs, on="doc_id")
    for _, row in merged.head(25).iterrows():
        ws = row["text"].split(" ")
        assert row["n_dup_words"] == len(ws) - len(set(ws))
        bigrams = collections.Counter(zip(ws, ws[1:]))
        assert row["top_bigram_n"] == (max(bigrams.values()) if bigrams else 0)
        assert row["mean_wlen_x100"] == (sum(len(w) for w in ws) * 100) // len(ws)
