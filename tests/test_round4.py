"""Round-4 operators: C4-style boilerplate removal and the inverted-index
build — crafted-fixture arithmetic the sf tables can't pin (threshold
edges, partial chunks, position ties), plus local ground-truth replays of
the oracle semantics."""

import numpy as np
import pandas as pd
import pytest

from hepdata_validator_ray.pipelines.retrieval import inverted_index
from hepdata_validator_ray.pipelines.text import (
    _chunk_strings,
    _explode_words,
    boilerplate_scrub_stats,
)


def _write_docs(tmp_path, texts):
    p = str(tmp_path / "docs.parquet")
    pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}).to_parquet(
        p, index=False
    )
    return p


def test_chunk_strings_kernel():
    flat, offs = _explode_words(pd.Series([["a", "b", "c", "d", "e"], ["x"], []]))
    chunks, nw, c_off = _chunk_strings(flat, offs, 2)
    assert list(chunks) == ["a b", "c d", "e", "x"]
    assert list(nw) == [2, 2, 1, 1]
    assert list(c_off) == [0, 3, 4, 4]


def test_boilerplate_scrub_crafted(tmp_path, ray_session):
    """'b1 b2' occurs in 3 distinct docs (df=3, removed at min_df=3);
    'u1 u2' in only one (kept); the partial trailing chunk 'tail' is a
    1-word chunk and counts as such."""
    texts = [
        "b1 b2 u1 u2 tail",  # chunks: 'b1 b2'(drop), 'u1 u2'(keep), 'tail'(keep) -> 3
        "b1 b2 k1 k2",       # 'b1 b2'(drop), 'k1 k2'(keep) -> 2
        "b1 b2",             # all removed -> 0
        "solo",              # single 1-word chunk, df=1 -> 1
    ]
    got = (
        boilerplate_scrub_stats(_write_docs(tmp_path, texts), chunk_words=2, min_df=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["n_words_kept"]) == [3, 2, 0, 1]


def test_boilerplate_within_doc_repeats_count_once_for_df(tmp_path, ray_session):
    """df counts DISTINCT docs: a chunk repeated 5× inside one doc has
    df=1 and survives; but once another doc pushes it over min_df, EVERY
    occurrence (all repeats) is removed."""
    texts = ["r1 r2 " * 5 + "end", "other words"]
    p = _write_docs(tmp_path, [t.strip() for t in texts])
    keep_all = boilerplate_scrub_stats(p, chunk_words=2, min_df=2).to_pandas()
    assert sorted(keep_all["n_words_kept"]) == [2, 11]  # nothing crosses df=2
    p2 = str(tmp_path / "docs2.parquet")
    pd.DataFrame(
        {"doc_id": np.array([0, 1], dtype=np.int64), "text": [("r1 r2 " * 5 + "end").strip(), "r1 r2 only"]}
    ).to_parquet(p2, index=False)
    got = boilerplate_scrub_stats(p2, chunk_words=2, min_df=2).to_pandas().sort_values("doc_id")
    # doc0: five 'r1 r2' chunks all removed, 'end' kept -> 1
    # doc1: 'r1 r2' removed, 'only' kept -> 1
    assert list(got["n_words_kept"]) == [1, 1]


def test_inverted_index_positions_tf_and_pruning(tmp_path, ray_session):
    texts = [
        "w x w y w",   # w: tf=3 first=1; x: tf=1 first=2; y: tf=1 first=4
        "y w",         # y: first=1; w: first=2
        "z z z",       # z only here -> pruned at min_df=2
    ]
    got = (
        inverted_index(_write_docs(tmp_path, texts), min_df=2)
        .to_pandas()
        .sort_values(["word", "doc_id"])
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {
            "word": ["w", "w", "y", "y"],
            "doc_id": [0, 1, 0, 1],
            "tf": [3, 1, 1, 1],
            "first_pos": [1, 2, 4, 1],
        }
    )
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "tf": "int64", "first_pos": "int64"}), exp
    )
    assert "z" not in set(got["word"])


def test_inverted_index_no_qualifying_terms(tmp_path, ray_session):
    got = inverted_index(_write_docs(tmp_path, ["a b", "c d"]), min_df=2).to_pandas()
    assert len(got) == 0


def test_contamination_exact_spans_cross_doc(tmp_path, ray_session):
    """A train doc containing an eval doc's middle span verbatim is
    flagged; partial overlap is not; eval docs hit their own span."""
    from hepdata_validator_ray.pipelines.training import contamination_exact_spans

    # doc 0 is the eval doc (0 % 97 == 0): middle 5 words of 7 -> words[1:6]
    eval_text = "pre m1 m2 m3 m4 m5 post"          # span = "m1 m2 m3 m4 m5"
    texts = [
        eval_text,                                  # doc 0: hits own span -> 1
        "x m1 m2 m3 m4 m5 y",                       # doc 1: contains span -> 1
        "m1 m2 m3 m4 other",                        # doc 2: partial -> 0
        "clean text entirely",                      # doc 3 -> 0
    ]
    got = (
        contamination_exact_spans(_write_docs(tmp_path, texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["n_hits"]) == [1, 1, 0, 0]


def test_contamination_exact_spans_no_eval_docs(tmp_path, ray_session):
    """Short eval docs (< span_words words) contribute no eval strings;
    every doc then scores 0 (the LEFT-JOIN total semantics)."""
    from hepdata_validator_ray.pipelines.training import contamination_exact_spans

    got = (
        contamination_exact_spans(_write_docs(tmp_path, ["a b", "c d e"]))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(got["n_hits"]) == [0, 0]


def test_embedding_label_outliers_crafted(tmp_path, ray_session):
    """A planted far vector is the label's top outlier; negative
    coordinates exercise the sign-split rounded-centroid path; ties break
    on vec_id ascending."""
    from hepdata_validator_ray.pipelines.cluster import embedding_label_outliers

    rows = []
    # label 0: three near-identical vectors + one far outlier (vec 3)
    for i, v in enumerate([[-0.5, 0.1], [-0.5, 0.1], [-0.5, 0.1], [9.0, -9.0]]):
        rows.append({"vec_id": i, "label": 0, "embedding": v})
    # label 1: two equidistant vectors (tie on d2 -> vec_id order)
    rows.append({"vec_id": 10, "label": 1, "embedding": [1.0, 0.0]})
    rows.append({"vec_id": 11, "label": 1, "embedding": [-1.0, 0.0]})
    p = str(tmp_path / "emb.parquet")
    pd.DataFrame(rows).to_parquet(p, index=False)
    got = (
        embedding_label_outliers(p, k=2)
        .to_pandas()
        .sort_values(["label", "d2", "vec_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    l0 = got[got["label"] == 0]
    assert list(l0["vec_id"])[0] == 3  # the planted outlier ranks first
    l1 = got[got["label"] == 1]
    assert list(l1["vec_id"]) == [10, 11]  # exact d2 tie -> vec_id order
    assert l1["d2"].nunique() == 1
    # local replay of the integer contract for label 0
    q = np.floor(np.array([[-0.5, 0.1], [-0.5, 0.1], [-0.5, 0.1], [9.0, -9.0]]) * 1000 + 0.5).astype(np.int64)
    S, n = q.sum(0), 4
    cent = (2 * S + n) // (2 * n)
    d2 = ((q - cent) ** 2).sum(1)
    exp0 = {int(v): int(d) for v, d in zip([0, 1, 2, 3], d2)}
    for r in l0.itertuples(index=False):
        assert exp0[int(r.vec_id)] == int(r.d2)


def test_split_leakage_crafted(tmp_path, ray_session):
    """Docs sharing content across the train/test boundary are leaky in
    BOTH splits; same-split duplicates are not leakage."""
    import hashlib

    from hepdata_validator_ray.pipelines.sampling import split_leakage_stats

    def split_of(doc_id):
        return "test" if int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100 < 10 else "train"

    # find one test-split and three train-split ids deterministically
    ids = list(range(200))
    test_ids = [i for i in ids if split_of(i) == "test"]
    train_ids = [i for i in ids if split_of(i) == "train"]
    a_test, a_train = test_ids[0], train_ids[0]   # shared content -> leaky
    b1, b2 = train_ids[1], train_ids[2]           # same-split dup -> clean
    rows = [
        {"doc_id": a_test, "text": "leaked shared content"},
        {"doc_id": a_train, "text": "leaked shared content"},
        {"doc_id": b1, "text": "train only duplicate"},
        {"doc_id": b2, "text": "train only duplicate"},
        {"doc_id": train_ids[3], "text": "unique"},
    ]
    p = str(tmp_path / "docs.parquet")
    pd.DataFrame(rows).to_parquet(p, index=False)
    got = split_leakage_stats(p).to_pandas().set_index("split")
    assert int(got.loc["test", "n_docs"]) == 1 and int(got.loc["test", "n_leaky_docs"]) == 1
    assert int(got.loc["train", "n_docs"]) == 4 and int(got.loc["train", "n_leaky_docs"]) == 1


def test_grouped_hll_within_error_and_batching_invariant(ray_session):
    """Per-group HLL estimate lands within 3 standard errors
    (3·1.04/√(2^p)) of the exact per-group distinct, and the estimate is
    identical across batch sizes (register max-merge is associative and
    commutative — layout independence, the property a distributed sketch
    must have)."""
    from hepdata_validator_ray.pipelines.relational import approx_distinct_users_per_type

    SF = "/root/testdata/sf0.001"
    exact = (
        approx_distinct_users_per_type(SF, exact=True)
        .to_pandas()
        .set_index("event_type")["n_users"]
    )
    approx = (
        approx_distinct_users_per_type(SF)
        .to_pandas()
        .set_index("event_type")["n_users_approx"]
    )
    assert set(exact.index) == set(approx.index)
    rel = (approx - exact).abs() / exact
    assert (rel <= 3 * 1.04 / np.sqrt(1 << 12)).all(), rel.to_dict()


def test_grouped_hll_merge_is_layout_independent(tmp_path, ray_session):
    """Same rows, two different file layouts -> identical estimates."""
    import pyarrow.parquet as pq
    import pyarrow as paw

    from hepdata_validator_ray.pipelines.relational import approx_distinct_users_per_type

    src = pd.read_parquet("/root/testdata/sf0.001/events.parquet", columns=["event_type", "user_id"])
    src["ts"] = pd.Timestamp("2020-01-01")  # schema padding unused by the op
    for name, parts in [("one", [src]), ("many", np.array_split(src, 7))]:
        # the op reads <sf_dir>/events.parquet — write it as a PART DIR
        d = tmp_path / name / "events.parquet"
        d.mkdir(parents=True)
        for i, part in enumerate(parts):
            pq.write_table(paw.Table.from_pandas(part.reset_index(drop=True)), d / f"p{i}.parquet")
    a = approx_distinct_users_per_type(str(tmp_path / "one")).to_pandas()
    b = approx_distinct_users_per_type(str(tmp_path / "many")).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("event_type").reset_index(drop=True),
        b.sort_values("event_type").reset_index(drop=True),
    )


def test_cluster_representatives_prefers_quality_over_min_id(tmp_path, ray_session):
    """The representative is the LARGEST member (ties -> min doc_id), not
    the min-id cluster label — the keep-best-copy curation semantic."""
    import ray.data

    from hepdata_validator_ray.pipelines.dedup import cluster_representatives

    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3, 7, 8], dtype=np.int64),
            "n_chars": np.array([10, 50, 50, 5, None], dtype="float"),
        }
    )
    p = str(tmp_path / "docs.parquet")
    docs.to_parquet(p, index=False)
    cc = ray.data.from_pandas(
        pd.DataFrame(
            {
                "node": np.array([1, 2, 3, 7, 8], dtype=np.int64),
                "cluster_id": np.array([1, 1, 1, 7, 7], dtype=np.int64),
            }
        )
    )
    got = (
        cluster_representatives(cc, p)
        .to_pandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    # cluster 1: members 1(10) 2(50) 3(50) -> rep=2 (largest, tie -> min id)
    # cluster 7: members 7(5) 8(null->0) -> rep=7
    assert list(got["cluster_id"]) == [1, 7]
    assert list(got["rep_doc_id"]) == [2, 7]
    assert list(got["rep_n_chars"]) == [50, 5]
    assert list(got["n_members"]) == [3, 2]


def test_contamination_exact_spans_word_aligned_only(tmp_path, ray_session):
    """The hit definition is WORD-ALIGNED (GPT-3 n-gram overlap): a doc
    containing the span only as an unaligned char substring (glued to the
    previous word) does NOT count."""
    from hepdata_validator_ray.pipelines.training import contamination_exact_spans

    texts = [
        "pre m1 m2 m3 m4 m5 post",   # eval doc (id 0): span 'm1 m2 m3 m4 m5'
        "zzzm1 m2 m3 m4 m5",         # char-contains but NOT word-aligned -> 0
        "ok m1 m2 m3 m4 m5",         # word-aligned -> 1
    ]
    got = (
        contamination_exact_spans(_write_docs(tmp_path, texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["n_hits"]) == [1, 0, 1]


def test_rolling_median_window_semantics(tmp_path, ray_session):
    """Rolling median includes the current row, honors min_periods=1
    prefixes, and even windows average the two middles (doubled median
    stays integral)."""
    import pyarrow.parquet as pq
    import pyarrow as paw

    from hepdata_validator_ray.pipelines.relational import events_rolling_median

    d = tmp_path / "events.parquet"
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]),
            "user_id": np.int64(7),
            "value": [1.00, 3.00, 2.00, 10.00],
        }
    )
    pq.write_table(paw.Table.from_pandas(df), d)
    got = (
        events_rolling_median(str(tmp_path), window=2)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # windows (w=2): [100]->200, [100,300]->400, [300,200]->500, [200,1000]->1200
    assert list(got["med_cents_x2"]) == [200, 400, 500, 1200]


def test_heavy_hitters_exact_and_certified(tmp_path, ray_session):
    """MG 2-pass returns the exact top-k with a validity certificate; an
    undersized capacity FAILS LOUDLY instead of silently approximating."""
    from hepdata_validator_ray.pipelines.text import heavy_hitter_shingles

    # 3 heavy shingles (counts 30/20/10 via repetition) over noise docs
    texts = (
        ["h1 h2 h3"] * 30
        + ["m1 m2 m3"] * 20
        + ["l1 l2 l3"] * 10
        + [f"n{i} n{i+1} n{i+2} n{i+3}" for i in range(100)]
    )
    p = _write_docs(tmp_path, texts)
    got = heavy_hitter_shingles(p, k=3, capacity=512).to_pandas()
    assert list(got["shingle"]) == ["h1 h2 h3", "m1 m2 m3", "l1 l2 l3"]
    assert list(got["n"]) == [30, 20, 10]

    with pytest.raises(ValueError, match="certificate failed"):
        # capacity 2 over ~203 distinct shingles in ONE batch: thresholds
        # dominate the k-th count -> must raise
        heavy_hitter_shingles(p, k=3, capacity=2)


def test_heavy_hitters_lossless_small_corpus(tmp_path, ray_session):
    """A corpus with fewer distinct shingles than capacity is summarized
    losslessly: fewer than k rows is legitimate, no false certificate."""
    from hepdata_validator_ray.pipelines.text import heavy_hitter_shingles

    got = heavy_hitter_shingles(
        _write_docs(tmp_path, ["a b c", "a b c", "x y z"]), k=10, capacity=512
    ).to_pandas()
    assert list(got["shingle"]) == ["a b c", "x y z"]
    assert list(got["n"]) == [2, 1]


def test_bpe_pair_counts_word_boundaries(tmp_path, ray_session):
    """Byte pairs never span word boundaries; every occurrence counts."""
    from hepdata_validator_ray.pipelines.text import bpe_merge_pair_counts

    texts = ["abab ab", "ba x"]  # 'ab': 2(in abab) + 1 = 3; 'ba': 1 + 1 = 2; 'b a' never pairs
    got = bpe_merge_pair_counts(_write_docs(tmp_path, texts), k=10).to_pandas()
    d = dict(zip(got["pair"], got["n"]))
    assert d["ab"] == 3 and d["ba"] == 2
    assert "b " not in d and " a" not in d


def test_vocab_oov_top_v_tie_break(tmp_path, ray_session):
    """Vocabulary ties at the top-V boundary break by word ASC; OOV
    counts occurrences, not distinct words."""
    from hepdata_validator_ray.pipelines.text import vocab_oov_stats

    # counts: a=3, b=2, c=2, z=1 -> top_v=2 vocab = {a, b} (c loses the tie)
    texts = ["a a b c", "a b c z"]
    got = (
        vocab_oov_stats(_write_docs(tmp_path, texts), top_v=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["n_tok"]) == [4, 4]
    assert list(got["n_oov"]) == [1, 2]  # doc0: c; doc1: c z


def test_bpe_merge_positions_run_parity():
    """Greedy leftmost semantics: a != b matches can't overlap; a == b
    takes even offsets within each run (aaaa -> AA, aaa -> Aa)."""
    from hepdata_validator_ray.pipelines.text import _bpe_apply_merge, _bpe_merge_positions

    t = np.array([97, 97, 97, 97, 0, 97, 97, 97], dtype=np.int64)  # 'aaaa' 'aaa'
    m = _bpe_merge_positions(t, 97, 97)
    assert list(m) == [0, 2, 5]  # aaaa -> two merges; aaa -> one, leftover 'a'
    out = _bpe_apply_merge(t, 97, 97, 256)
    assert list(out) == [256, 256, 0, 256, 97]
    # a != b: 'abab' merges BOTH (never overlapping)
    t2 = np.array([97, 98, 97, 98], dtype=np.int64)
    assert list(_bpe_apply_merge(t2, 97, 98, 300)) == [300, 300]


def test_bpe_train_iterations_crafted(tmp_path, ray_session):
    """Three iterations on a crafted corpus: iteration 1 picks 'ab'
    (count 5 beats 'ba' 3 via run structure), iteration 2 counts pairs
    involving the MERGED token, and a merge of the merged token with a
    byte follows — verified against hand-computed greedy-BPE counts."""
    from hepdata_validator_ray.pipelines.text import bpe_train_iterations

    # 'ababab': pairs ab=3 ba=2; 'abc' x2: ab=2 bc=2  -> it1 winner 'ab' (5)
    texts = ["ababab abc", "abc"]
    got = bpe_train_iterations(_write_docs(tmp_path, texts), n_iters=3, k=5).to_pandas()
    it1 = got[got["it"] == 1]
    d1 = {(l, r): n for l, r, n in it1[["left_tok", "right_tok", "n"]].itertuples(index=False)}
    assert d1[("a", "b")] == 5 and d1[("b", "a")] == 2 and d1[("b", "c")] == 2
    # after merging 'ab': 'ababab' -> AB AB AB, 'abc' -> AB c
    it2 = got[got["it"] == 2]
    d2 = {(l, r): n for l, r, n in it2[["left_tok", "right_tok", "n"]].itertuples(index=False)}
    assert d2[("ab", "ab")] == 2 and d2[("ab", "c")] == 2
    assert ("a", "b") not in d2  # fully consumed by the merge
    # it2 winner: n=2 tie between (ab,ab) and (ab,c) -> left asc, then
    # right asc: 'ab' < 'c', so (ab,ab) wins; it3 counts (abab, ab) etc.
    it3 = got[got["it"] == 3]
    d3 = {(l, r): n for l, r, n in it3[["left_tok", "right_tok", "n"]].itertuples(index=False)}
    assert d3[("abab", "ab")] == 1 and d3[("ab", "c")] == 2


def test_length_bucket_padding_closed_form(tmp_path, ray_session):
    """The histogram closed form equals naive sort-and-chunk, including
    the partial batch (padded to ITS max, not the bucket max) and
    cross-run batch boundaries."""
    from hepdata_validator_ray.pipelines.training import length_bucket_padding_stats

    # one bucket (width 256): lengths 5,5,5,7,9 with G=2 ->
    # batches [5,5],[5,7],[9]: padded = 10+14+9 = 33, sum = 31, waste 2
    lens = [5, 5, 5, 7, 9, 300, 301]  # + bucket 1: [300,301] -> padded 602
    df = pd.DataFrame(
        {
            "doc_id": range(len(lens)),
            "text": ["x"] * len(lens),
            "n_chars": lens,
            "source": ["s"] * len(lens),
            "lang": ["en"] * len(lens),
        }
    )
    p = str(tmp_path / "docs.parquet")
    df.to_parquet(p, index=False)
    got = (
        length_bucket_padding_stats(p, bucket_width=256, batch_rows=2)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert list(got["bucket"]) == [0, 1]
    assert list(got["n_docs"]) == [5, 2]
    assert list(got["n_batches"]) == [3, 1]
    assert list(got["sum_len"]) == [31, 601]
    assert list(got["padded_cells"]) == [33, 602]
    assert list(got["waste"]) == [2, 1]


def test_length_bucket_padding_null_and_empty(tmp_path, ray_session):
    """NULL n_chars coalesces to 0; an all-null corpus still produces a
    bucket-0 row with zero waste."""
    from hepdata_validator_ray.pipelines.training import length_bucket_padding_stats

    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["x", "y"],
            "n_chars": pd.array([None, None], dtype="Int64"),
            "source": ["s", "s"],
            "lang": ["en", "en"],
        }
    )
    p = str(tmp_path / "docs.parquet")
    df.to_parquet(p, index=False)
    got = length_bucket_padding_stats(p, bucket_width=256, batch_rows=8).to_pandas()
    assert list(got["bucket"]) == [0]
    assert list(got["n_docs"]) == [2]
    assert list(got["padded_cells"]) == [0] and list(got["waste"]) == [0]


def test_bpe_encode_counts_crafted(tmp_path, ray_session):
    """Encode applies the learned merges in order: 'ababab abc'/'abc'
    learns ab, then ab+ab, then ab+c — so 'ababab' -> [abab, ab] = 2
    tokens, 'abc' -> [abc] = 1; whitespace is never a token and NULL
    text encodes to 0."""
    from hepdata_validator_ray.pipelines.text import bpe_encode_token_counts

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["ababab abc", "abc", None],
            "source": ["s"] * 3,
            "lang": ["en"] * 3,
            "n_chars": [10, 3, 0],
        }
    )
    p = str(tmp_path / "docs.parquet")
    df.to_parquet(p, index=False)
    got = (
        bpe_encode_token_counts(p, n_merges=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # merges: 1) a+b=ab (5)  2) tie at 2 between (ab,ab) and (ab,c) ->
    # (ab,ab) wins on right_tok 'ab' < 'c'  3) (ab,c) or (abab,ab)? counts:
    # abab+ab=1, ab+c=2 -> ab+c wins.  doc0: abab ab abc -> [abab, ab] +
    # [abc] = 3;  doc1: [abc] = 1;  doc2: 0
    assert list(got["n_tok_bpe"]) == [3, 1, 0]


def test_degenerate_sequence_stats_crafted(tmp_path, ray_session):
    """Run/distinct semantics pinned: runs break on value change AND on
    sequence boundaries (a run never spans rows); empty and NULL token
    lists report zeros; an all-same sequence has n_distinct=1 and
    max_run=n."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import degenerate_sequence_stats

    t = pa.table(
        {
            "doc_id": ["a", "b", "c", "d", "e"],
            "tokens": pa.array(
                [[7, 7, 7, 7], [1, 2, 2, 3, 2], [], None, [5]],
                type=pa.list_(pa.int32()),
            ),
            "n_tok": pa.array([4, 5, 0, 0, 1], type=pa.int32()),
            "source": ["s"] * 5,
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    got = (
        degenerate_sequence_stats(p)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["n_tok"]) == [4, 5, 0, 0, 1]
    assert list(got["n_distinct"]) == [1, 3, 0, 0, 1]
    assert list(got["max_run"]) == [4, 2, 0, 0, 1]
    # boundary: two adjacent rows ending/starting with the same token must
    # NOT merge runs — craft rows [9,9] and [9,9,9] in one file
    t2 = pa.table(
        {
            "doc_id": ["x", "y"],
            "tokens": pa.array([[9, 9], [9, 9, 9]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([2, 3], type=pa.int32()),
            "source": ["s", "s"],
        }
    )
    p2 = str(tmp_path / "seq2.parquet")
    pq.write_table(t2, p2)
    got2 = degenerate_sequence_stats(p2).to_pandas().sort_values("doc_id")
    assert list(got2["max_run"]) == [2, 3]


def test_rare_token_unk_threshold_edge(tmp_path, ray_session):
    """Tokens with corpus freq == min_count are NOT rare (strict <);
    NULL sources group under '<NULL>'; the '<all>' row sums the rest."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import rare_token_unk_stats

    # token 1 appears 3x (rare at min_count=4? 3<4 yes), token 2 appears
    # exactly 4x (NOT rare), token 3 appears 5x (not rare)
    t = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "tokens": pa.array(
                [[1, 2, 2, 3], [1, 2, 3, 3], [1, 2, 3, 3]], type=pa.list_(pa.int32())
            ),
            "n_tok": pa.array([4, 4, 4], type=pa.int32()),
            "source": pa.array(["s1", "s1", None]),
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    got = (
        rare_token_unk_stats(p, min_count=4)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert list(got["source"]) == ["<NULL>", "<all>", "s1"]
    assert list(got["n_tok"]) == [4, 12, 8]
    assert list(got["n_unk"]) == [1, 3, 2]  # only token 1 (freq 3) is rare


def test_cdc_chunk_boundary_and_dup_semantics(tmp_path, ray_session):
    """CDC semantics pinned: boundaries at row starts and divisible pairs;
    an inserted token only reshapes its own chunk's neighborhood (the CDC
    property), and exact repeated chunks count as dup across AND within
    rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.dedup import cdc_chunk_dedup_stats

    # divisor=61, mult=1000003: pair (61, 0) -> 61*1000003 % 61 == 0 so a
    # boundary fires BEFORE the 0 at position 2 of [61, 0, 5].  Rows a & b
    # share the chunk [61]; c is unique.
    t = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "tokens": pa.array(
                [[61, 0, 5], [61, 0, 5], [1, 2, 3]], type=pa.list_(pa.int32())
            ),
            "n_tok": pa.array([3, 3, 3], type=pa.int32()),
            "source": pa.array(["s1", "s2", "s2"]),
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    got = (
        cdc_chunk_dedup_stats(p)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    # rows a/b each chunk as [61] + [0,5] (both duplicated across rows);
    # row c is one chunk [1,2,3], unique
    assert list(got["source"]) == ["s1", "s2"]
    assert list(got["n_chunks"]) == [2, 3]
    assert list(got["n_dup_chunks"]) == [2, 2]


def test_ks_drift_integer_exact(tmp_path, ray_session):
    """KS numerator pinned against a hand computation: src A = [1,1,2],
    B = [2,3]: at v=1 |2*2-0*3|=4, v=2 |3*2-1*3|=3, v=3 |3*2-2*3|=0 ->
    ks_num(A)=4 with (n_src=3, n_rest=2); symmetric for B."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import ks_drift_stats

    t = pa.table(
        {
            "doc_id": ["a", "b", "c", "d", "e"],
            "tokens": pa.array([[0]] * 5, type=pa.list_(pa.int32())),
            "n_tok": pa.array([1, 1, 2, 2, 3], type=pa.int32()),
            "source": pa.array(["A", "A", "A", "B", "B"]),
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    got = ks_drift_stats(p).to_pandas().sort_values("source").reset_index(drop=True)
    assert list(got["source"]) == ["A", "B"]
    assert list(got["n_src"]) == [3, 2]
    assert list(got["n_rest"]) == [2, 3]
    # A: cum_A = [2,3,3], cum_B = [0,1,2]; |cum_A*2 - cum_B*3| = [4,3,0]
    assert list(got["ks_num"]) == [4, 4]  # KS is symmetric src<->rest


def test_token_ngram_repetition_crafted(tmp_path, ray_session):
    """3-gram repetition pinned: [1,2,1,2,1,2,1] has 5 trigrams but only
    2 distinct; windows never span rows; len<3 rows report zeros."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import token_ngram_repetition_stats

    t = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "tokens": pa.array(
                [[1, 2, 1, 2, 1, 2, 1], [3, 4], [5, 6, 7]], type=pa.list_(pa.int32())
            ),
            "n_tok": pa.array([7, 2, 3], type=pa.int32()),
            "source": ["s"] * 3,
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    got = (
        token_ngram_repetition_stats(p)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["n_ngrams"]) == [5, 0, 1]
    assert list(got["n_distinct_ngrams"]) == [2, 0, 1]


def test_token_coverage_curve_ladder(tmp_path, ray_session):
    """Coverage ladder pinned: counts {5:3, 7:2, 9:1} -> top-1 covers 3
    (token 5), top-10 covers all 6; ladder points beyond the vocab clamp
    to the full cumsum; tie-break is (count DESC, id ASC)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import token_coverage_curve

    t = pa.table(
        {
            "doc_id": ["a", "b"],
            "tokens": pa.array([[5, 7, 5, 9], [5, 7]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([4, 2], type=pa.int32()),
            "source": ["s", "s"],
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    got = token_coverage_curve(p, ladder=(1, 2, 10)).to_pandas()
    assert list(got["v_top"]) == [1, 2, 10]
    assert list(got["covered"]) == [3, 5, 6]
    assert list(got["total"]) == [6, 6, 6]


def test_proportional_allocation_largest_remainder(tmp_path, ray_session):
    """Hamilton apportionment pinned: counts (7, 2, 1), K=10 -> floors
    (7, 2, 1) sum 10, no top-ups; counts (5, 4, 2), K=10 over N=11 ->
    floors (4, 3, 1) + 2 top-ups by remainder (6/7/9 -> B and C? rem =
    (10n) mod 11 = (6, 7, 9) -> C then B get +1) = (4, 4, 2); Σ == K."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.sampling import proportional_allocation

    t = pa.table(
        {
            "doc_id": [str(i) for i in range(11)],
            "tokens": pa.array([[0]] * 11, type=pa.list_(pa.int32())),
            "n_tok": pa.array([1] * 11, type=pa.int32()),
            "source": pa.array(["A"] * 5 + ["B"] * 4 + ["C"] * 2),
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    got = (
        proportional_allocation(p, k_total=10)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert list(got["n_src"]) == [5, 4, 2]
    assert list(got["alloc"]) == [4, 4, 2]
    assert int(got["alloc"].sum()) == 10


def test_lang_confusion_matrix_crafted(tmp_path, ray_session):
    """Label audit pinned: declared lang vs stopword argmax — a German doc
    labeled 'en' lands in the (en, de) off-diagonal cell; NULL lang groups
    under '<NULL>'; NULL/unscorable text predicts 'unknown'."""
    from hepdata_validator_ray.pipelines.text import lang_confusion_matrix

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "the and of with",      # en
                "der die das und ist",  # de, but labeled en
                None,                    # unknown
                "xyzzy qwerty",          # no stopwords -> unknown
            ],
            "lang": ["en", "en", None, "fr"],
            "source": ["s"] * 4,
            "n_chars": [10, 10, 0, 10],
        }
    )
    p = str(tmp_path / "docs.parquet")
    df.to_parquet(p, index=False)
    got = (
        lang_confusion_matrix(p)
        .to_pandas()
        .sort_values(["lang", "pred_lang"])
        .reset_index(drop=True)
    )
    cells = {(l, pr): n for l, pr, n in got.itertuples(index=False)}
    assert cells[("en", "en")] == 1
    assert cells[("en", "de")] == 1
    assert cells[("<NULL>", "unknown")] == 1
    assert cells[("fr", "unknown")] == 1


def test_id_source_consistency_null_safety(tmp_path, ray_session):
    """Cross-field check pinned: embedded segment != source is a mismatch,
    matching NULLs are consistent, NULL doc_id always mismatches, a
    dash-less doc_id vs non-null source mismatches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import id_source_consistency

    t = pa.table(
        {
            "doc_id": pa.array(
                ["doc-wiki-1", "doc-news-2", None, "nodash", "doc-web-5"]
            ),
            "tokens": pa.array([[0]] * 5, type=pa.list_(pa.int32())),
            "n_tok": pa.array([1] * 5, type=pa.int32()),
            "source": pa.array(["wiki", "wiki", "wiki", "web", None]),
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    got = (
        id_source_consistency(p)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    cells = {s: (r, m) for s, r, m in got.itertuples(index=False)}
    assert cells["wiki"] == (3, 2)   # news-segment + NULL doc_id mismatch
    assert cells["web"] == (1, 1)    # dash-less segment is NULL vs 'web'
    assert cells["<NULL>"] == (1, 1) # 'web' segment vs NULL source


def test_parquet_layout_audit_multi_row_group(tmp_path, ray_session):
    """Footer audit pinned: a file written with row_group_size=2 over 5
    rows reports 3 groups (2,2,1) — min 1, max 2 — without reading data."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import parquet_layout_audit

    t = pa.table({"doc_id": [str(i) for i in range(5)], "n_tok": list(range(5))})
    p = tmp_path / "f.parquet"
    pq.write_table(t, str(p), row_group_size=2)
    got = parquet_layout_audit(str(tmp_path)).to_pandas()
    assert list(got["file"]) == ["f.parquet"]
    assert list(got["n_row_groups"]) == [3]
    assert list(got["n_rows"]) == [5]
    assert list(got["min_rg_rows"]) == [1]
    assert list(got["max_rg_rows"]) == [2]


def test_trimmed_sum_histogram_closed_form(tmp_path, ray_session):
    """Trim semantics pinned: n=10 values [1..10], 10% trim -> k=1, keep
    ranks [1, 9) = values 2..9, sum 44; a tie-heavy source trims tied
    values identically regardless of order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import trimmed_sum_stats

    vals_a = list(range(1, 11))          # 1..10
    vals_b = [5, 5, 5, 5, 5, 9, 9, 9]    # ties across the cut
    t = pa.table(
        {
            "doc_id": [str(i) for i in range(len(vals_a) + len(vals_b))],
            "tokens": pa.array([[0]] * (len(vals_a) + len(vals_b)), type=pa.list_(pa.int32())),
            "n_tok": pa.array(vals_a + vals_b, type=pa.int32()),
            "source": pa.array(["A"] * len(vals_a) + ["B"] * len(vals_b)),
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    got = (
        trimmed_sum_stats(p, trim_pct=10)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    a = got[got.source == "A"].iloc[0]
    assert (a["n"], a["n_kept"], a["sum_kept"]) == (10, 8, 44)
    # B: n=8, k=0 (8*10//100=0) -> everything kept
    b = got[got.source == "B"].iloc[0]
    assert (b["n"], b["n_kept"], b["sum_kept"]) == (8, 8, 52)


def test_shuffle_adjacency_seam_stitching(tmp_path, ray_session):
    """Adjacency counts are bucket-count invariant (seams stitched across
    order-preserving range buckets) and match a brute-force reordering."""
    import hashlib

    from hepdata_validator_ray.pipelines.sampling import shuffle_adjacency_audit

    n = 200
    df = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": ["x"] * n,
            "source": [f"s{i % 3}" for i in range(n)],
            "lang": ["en"] * n,
            "n_chars": [1] * n,
        }
    )
    p = str(tmp_path / "docs.parquet")
    df.to_parquet(p, index=False)
    # brute force: order by (md5 hash64, doc_id, source), count same-source
    order = sorted(
        zip(df["doc_id"], df["source"]),
        key=lambda t: (int(hashlib.md5(str(t[0]).encode()).hexdigest()[:16], 16), t[0], t[1]),
    )
    want: dict = {}
    for (_, a), (_, b) in zip(order, order[1:]):
        if a == b:
            want[a] = want.get(a, 0) + 1
    for nb in (2, 16):
        got = shuffle_adjacency_audit(p, num_buckets=nb).to_pandas()
        cells = dict(zip(got["source"], got["n_adj"]))
        assert cells == {s: want.get(s, 0) for s in ("s0", "s1", "s2")}


def test_vocab_growth_curve_order_and_ladder(tmp_path, ray_session):
    """Growth curve pinned against a brute-force replay of the shuffle
    order: first positions honor the (hash, id, len) order and ladder
    points count strictly-before-K first occurrences."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import vocab_growth_curve

    toks = {"a": [1, 2, 1], "b": [2, 3], "c": [4], "d": [1]}
    t = pa.table(
        {
            "doc_id": list(toks),
            "tokens": pa.array(list(toks.values()), type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(v) for v in toks.values()], type=pa.int32()),
            "source": ["s"] * len(toks),
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    order = sorted(toks, key=lambda d: (int(hashlib.md5(d.encode()).hexdigest()[:16], 16), d))
    stream = [x for d in order for x in toks[d]]
    def brute(k):
        return len(set(stream[:k]))
    got = vocab_growth_curve(p, ladder=(1, 3, 5, 100)).to_pandas()
    assert list(got["k_pos"]) == [1, 3, 5, 100]
    assert list(got["n_distinct_seen"]) == [brute(1), brute(3), brute(5), brute(100)]


def test_replay_disorder_watermark_semantics(tmp_path, ray_session):
    """Replay-disorder lateness pinned on a crafted stream: with replay
    order (by md5 hash of event_id) differing from ts order, lateness is
    watermark-minus-ts against the running max of previously replayed
    events, per user."""
    import hashlib

    from hepdata_validator_ray.pipelines.relational import events_out_of_order_stats

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:01:00", "2024-01-01 00:02:00",
         "2024-01-01 00:03:00"]
    )
    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "ts": ts,
            "user_id": [7, 7, 7, 7],
            "event_type": ["view"] * 4,
            "value": [1.0] * 4,
            "props": ["{}"] * 4,
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(str(d / "events.parquet"), index=False)
    got = events_out_of_order_stats(str(d)).to_pandas()
    # brute force
    order = sorted(range(4), key=lambda i: (int(hashlib.md5(str(i).encode()).hexdigest()[:16], 16), i))
    us = (ts.view("int64") // 1000).tolist()
    wm, late, mx = None, 0, 0
    for i in order:
        if wm is not None and wm > us[i]:
            late += 1
            mx = max(mx, wm - us[i])
        wm = us[i] if wm is None else max(wm, us[i])
    assert list(got["n_events"]) == [4]
    assert list(got["n_late"]) == [late]
    assert list(got["max_late_us"]) == [mx]
    assert late > 0  # the crafted hash order must actually disorder


def test_label_purity_majority_tie_break(tmp_path, ray_session):
    """Purity audit pinned: a 2-2 lang tie takes the lexicographically
    smaller lang as majority; NULL langs group under '<NULL>'."""
    from hepdata_validator_ray.pipelines.profile import label_purity_stats

    df = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": ["x"] * 6,
            "source": ["A", "A", "A", "A", "B", "B"],
            "lang": ["en", "en", "de", "de", None, "fr"],
            "n_chars": [1] * 6,
        }
    )
    p = str(tmp_path / "docs.parquet")
    df.to_parquet(p, index=False)
    got = (
        label_purity_stats(p).to_pandas().sort_values("source").reset_index(drop=True)
    )
    a = got[got.source == "A"].iloc[0]
    assert (a["n_rows"], a["n_langs"], a["n_majority"]) == (4, 2, 2)  # de wins tie
    b = got[got.source == "B"].iloc[0]
    assert (b["n_rows"], b["n_langs"], b["n_majority"]) == (2, 2, 1)


def test_new_ops_partition_layout_invariance(tmp_path, ray_session):
    """Every round-4 sequence-table operator must give IDENTICAL results
    whether the corpus arrives as one file or many (the north-rule's
    partitioning-explicit claim): same rows from a 1-file and a 7-file
    layout of the same data."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.dedup import cdc_chunk_dedup_stats
    from hepdata_validator_ray.pipelines.sampling import proportional_allocation
    from hepdata_validator_ray.pipelines.training import length_bucket_padding_stats
    from hepdata_validator_ray.pipelines.validation import (
        degenerate_sequence_stats,
        ks_drift_stats,
        rare_token_unk_stats,
        token_coverage_curve,
        token_ngram_repetition_stats,
        trimmed_sum_stats,
        vocab_growth_curve,
    )

    rng = np.random.default_rng(7)
    n = 700
    toks = [rng.integers(0, 50, size=rng.integers(3, 40)).astype(np.int32).tolist() for _ in range(n)]
    t = pa.table(
        {
            "doc_id": [f"doc-s{i % 3}-{i:05d}" for i in range(n)],
            "tokens": pa.array(toks, type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(x) for x in toks], type=pa.int32()),
            "source": [f"s{i % 3}" for i in range(n)],
        }
    )
    one = tmp_path / "one"
    many = tmp_path / "many"
    one.mkdir(); many.mkdir()
    pq.write_table(t, str(one / "all.parquet"))
    for j in range(7):
        pq.write_table(t.slice(j * 100, 100), str(many / f"p{j}.parquet"))

    ops = [
        ("degen", lambda p: degenerate_sequence_stats(p), ["doc_id"]),
        ("rep3", lambda p: token_ngram_repetition_stats(p), ["doc_id"]),
        ("unk", lambda p: rare_token_unk_stats(p, min_count=5), ["source"]),
        ("ks", lambda p: ks_drift_stats(p), ["source"]),
        ("cover", lambda p: token_coverage_curve(p, ladder=(1, 10, 100)), ["v_top"]),
        ("trim", lambda p: trimmed_sum_stats(p), ["source"]),
        ("pad", lambda p: length_bucket_padding_stats(p, length_col="n_tok"), ["bucket"]),
        ("cdc", lambda p: cdc_chunk_dedup_stats(p), ["source"]),
        ("alloc", lambda p: proportional_allocation(p, k_total=10), ["source"]),
        ("vocab", lambda p: vocab_growth_curve(p, ladder=(10, 1000)), ["k_pos"]),
    ]
    for name, fn, keys in ops:
        a = fn(str(one)).to_pandas().sort_values(keys).reset_index(drop=True)
        b = fn(str(many)).to_pandas().sort_values(keys).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b), name


def test_kcore_cascade_peel(tmp_path, ray_session):
    """Cascade semantics pinned: a chain hanging off a clique peels over
    MULTIPLE rounds (removing the tail lowers the next node's degree),
    and the 2-core is exactly the triangle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.graph import kcore_membership

    # build via the orders/lineitem trade encoding: customer c and
    # supplier s become nodes 2c and 2s+1; an (order: cust, supp) row is
    # an undirected edge.  Triangle needs odd cycles — bipartite graphs
    # have none, so use a 4-cycle (2-core) plus a pendant chain instead:
    # c1-s1-c2-s2-c1 cycle, plus s2-c3-s3 chain (c3, s3 peel in 2 rounds)
    orders = pa.table(
        {
            "o_orderkey": pa.array(range(6), type=pa.int64()),
            "o_custkey": pa.array([1, 2, 2, 1, 3, 3], type=pa.int64()),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(range(6), type=pa.int64()),
            "l_suppkey": pa.array([1, 1, 2, 2, 2, 3], type=pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(orders, str(d / "orders.parquet"))
    pq.write_table(lineitem, str(d / "lineitem.parquet"))
    got = (
        kcore_membership(str(d), k=2, max_iter=8)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    # 2-core: the 4-cycle c1(2), c2(4), s1(3), s2(5); c3(6)/s3(7) peel:
    # s3 has degree 1 -> gone round 1; c3 drops to 1 -> gone round 2
    assert list(got["node"]) == [2, 3, 4, 5]
    assert list(got["deg_core"]) == [2, 2, 2, 2]


def test_kcore_nonconvergence_raises(tmp_path, ray_session):
    """An undersized max_iter raises loudly instead of silently desyncing
    from the statically-unrolled oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from hepdata_validator_ray.pipelines.graph import kcore_membership

    # a 5-node path peels one endpoint pair per round at k=2: needs > 1
    orders = pa.table(
        {
            "o_orderkey": pa.array(range(4), type=pa.int64()),
            "o_custkey": pa.array([1, 2, 2, 3], type=pa.int64()),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(range(4), type=pa.int64()),
            "l_suppkey": pa.array([1, 1, 2, 2], type=pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(orders, str(d / "orders.parquet"))
    pq.write_table(lineitem, str(d / "lineitem.parquet"))
    with _pytest.raises(ValueError, match="did not converge"):
        kcore_membership(str(d), k=2, max_iter=1)


def test_token_framing_crafted(tmp_path, ray_session):
    """Framing audit pinned: [BOS..EOS] clean, empty/NULL lists bad on both
    ends, interior EOS only counted strictly inside, single-token and
    two-token edge rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import token_framing_stats

    rows = [
        [0, 7, 1],        # clean
        [0, 1],           # clean (no interior possible)
        [],               # bad first + bad last
        None,             # bad first + bad last
        [0, 1, 5, 1],     # clean ends, ONE interior EOS row
        [3, 7, 1],        # bad first
        [0, 7, 7],        # bad last
        [0],              # bad last (single token: first==last==BOS)
        [1, 1, 1],        # bad first, interior EOS
    ]
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(rows))]),
            "tokens": pa.array(rows, type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(r) if r else 0 for r in rows], type=pa.int32()),
            "source": pa.array(["s"] * 5 + ["t"] * 4),
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    got = token_framing_stats(p).to_pandas().set_index("source")
    s = got.loc["s"]
    assert (s["n_rows"], s["n_bad_first"], s["n_bad_last"], s["n_interior_eos"]) == (5, 2, 2, 1)
    tt = got.loc["t"]
    assert (tt["n_rows"], tt["n_bad_first"], tt["n_bad_last"], tt["n_interior_eos"]) == (4, 2, 2, 1)


def test_footer_stats_truth_audit(tmp_path, ray_session):
    """Footer-truth audit pinned: multi-row-group footers aggregate to the
    true data bounds (stats_ok=1); a file written WITHOUT statistics
    reports NULL footer bounds and stats_ok=0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import footer_stats_truth_audit

    d = tmp_path / "seqs"
    d.mkdir()

    def tbl(ntoks):
        return pa.table(
            {
                "doc_id": pa.array([f"d{i}" for i in range(len(ntoks))]),
                "tokens": pa.array([[0] * v for v in ntoks], type=pa.list_(pa.int32())),
                "n_tok": pa.array(ntoks, type=pa.int32()),
                "source": pa.array(["s"] * len(ntoks)),
            }
        )

    pq.write_table(tbl([5, 9, 2, 7]), str(d / "a.parquet"), row_group_size=2)
    pq.write_table(tbl([4, 4]), str(d / "b.parquet"), write_statistics=False)
    got = footer_stats_truth_audit(str(d)).to_pandas().set_index("file")
    a = got.loc["a.parquet"]
    assert (a["n_rows"], a["footer_min"], a["footer_max"], a["stats_ok"]) == (4, 2, 9, 1)
    assert (a["data_min"], a["data_max"]) == (2, 9)
    b = got.loc["b.parquet"]
    assert b["n_rows"] == 2 and b["stats_ok"] == 0
    assert pd.isna(b["footer_min"]) and pd.isna(b["footer_max"])
    assert (b["data_min"], b["data_max"]) == (4, 4)


def test_token_concentration_crafted(tmp_path, ray_session):
    """Concentration audit pinned: Σ c² over per-(source, token) counts —
    hand-computed collision numerators, cross-row accumulation within a
    source, empty/NULL lists contribute nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import token_concentration_stats

    rows = [
        ("s", [7, 7, 7, 9]),   # s: 7→3, 9→1 (so far)
        ("s", [9, 5]),         # s: 9→2, 5→1  ⇒ c = {3,2,1}, Σc²=14, n_tok=6, nd=3
        ("t", []),             # nothing
        ("t", None),           # nothing
        ("t", [4, 4]),         # t: c={2}, Σc²=4, n_tok=2, nd=1
    ]
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(rows))]),
            "tokens": pa.array([r[1] for r in rows], type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[1]) if r[1] else 0 for r in rows], type=pa.int32()),
            "source": pa.array([r[0] for r in rows]),
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    got = token_concentration_stats(p).to_pandas().set_index("source")
    s = got.loc["s"]
    assert (s["n_tok"], s["n_distinct_tokens"], s["sum_c2"]) == (6, 3, 14)
    tt = got.loc["t"]
    assert (tt["n_tok"], tt["n_distinct_tokens"], tt["sum_c2"]) == (2, 1, 4)


def test_token_rank_mass_crafted(tmp_path, ray_session):
    """Rank-mass audit pinned: corpus ranks (count DESC, token ASC,
    0-based) with a count tie broken by token id; per-source rank sums and
    depth hand-computed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import token_rank_mass_stats

    # corpus counts: 7→3, 9→2, 5→2, 3→1  ⇒ ranks 7→0, 5→1 (tie 2-2: 5<9), 9→2, 3→3
    rows = [
        ("s", [7, 7, 9]),   # ranks 0,0,2: sum 2, max 2, n 3
        ("s", [5]),         # rank 1: s ⇒ sum 3, max 2, n 4
        ("t", [9, 5, 3, 7]),  # ranks 2,1,3,0: sum 6, max 3, n 4
        ("t", None),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(rows))]),
            "tokens": pa.array([r[1] for r in rows], type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[1]) if r[1] else 0 for r in rows], type=pa.int32()),
            "source": pa.array([r[0] for r in rows]),
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    got = token_rank_mass_stats(p).to_pandas().set_index("source")
    s = got.loc["s"]
    assert (s["n_tok"], s["sum_rank"], s["max_rank"]) == (4, 3, 2)
    tt = got.loc["t"]
    assert (tt["n_tok"], tt["sum_rank"], tt["max_rank"]) == (4, 6, 3)


def test_corpus_digest_invariance_and_sensitivity(tmp_path, ray_session):
    """Digest certificate pinned: identical corpus in a different row order
    and file layout gives IDENTICAL digests; a single-token change moves
    the affected source's digest (and '<all>'), leaving others fixed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import corpus_digest_stats

    def write(rows, d):
        d.mkdir(exist_ok=True)
        for i, chunk in enumerate(rows):
            t = pa.table(
                {
                    "doc_id": pa.array([r[0] for r in chunk]),
                    "tokens": pa.array([r[2] for r in chunk], type=pa.list_(pa.int32())),
                    "n_tok": pa.array(
                        [len(r[2]) if r[2] else 0 for r in chunk], type=pa.int32()
                    ),
                    "source": pa.array([r[1] for r in chunk]),
                }
            )
            pq.write_table(t, str(d / f"part{i}.parquet"))
        return str(d)

    base = [("a", "s", [1, 2, 3]), ("b", "s", [4]), ("c", "t", None), ("d", "t", [9, 9])]
    p1 = write([base], tmp_path / "one")
    p2 = write([[base[2], base[0]], [base[3], base[1]]], tmp_path / "two")
    g1 = corpus_digest_stats(p1).to_pandas().set_index("source").sort_index()
    g2 = corpus_digest_stats(p2).to_pandas().set_index("source").sort_index()
    pd.testing.assert_frame_equal(g1, g2)
    mut = [r if r[0] != "b" else ("b", "s", [5]) for r in base]
    g3 = corpus_digest_stats(write([mut], tmp_path / "mut")).to_pandas().set_index("source")
    assert g3.loc["s", "digest"] != g1.loc["s", "digest"]
    assert g3.loc["t", "digest"] == g1.loc["t", "digest"]
    assert g3.loc["<all>", "digest"] != g1.loc["<all>", "digest"]
    # roll-up identity: <all> = Σ per-source digests (mod DIGEST_MOD)
    from hepdata_validator_ray.pipelines.validation import DIGEST_MOD

    assert g1.loc["<all>", "digest"] == (g1.loc["s", "digest"] + g1.loc["t", "digest"]) % DIGEST_MOD


def test_k_anonymity_crafted(tmp_path, ray_session):
    """k-anonymity audit pinned: cell sizes straddling k=5, NULL lang cells
    counted as their own cell, min over a source's cells."""
    from hepdata_validator_ray.pipelines.profile import k_anonymity_stats

    df = pd.DataFrame(
        {
            "doc_id": range(12),
            "text": ["x"] * 12,
            "source": ["A"] * 8 + ["B"] * 4,
            "lang": ["en"] * 5 + ["de"] * 2 + [None] + ["fr"] * 4,
            "n_chars": [1] * 12,
        }
    )
    p = str(tmp_path / "docs.parquet")
    df.to_parquet(p, index=False)
    got = k_anonymity_stats(p, k=5).to_pandas().set_index("source")
    a = got.loc["A"]  # cells: en=5 (ok), de=2 (small), <NULL>=1 (small)
    assert (a["n_rows"], a["n_cells"], a["n_small_cells"], a["min_cell"]) == (8, 3, 2, 1)
    b = got.loc["B"]  # fr=4 -> small
    assert (b["n_rows"], b["n_cells"], b["n_small_cells"], b["min_cell"]) == (4, 1, 1, 4)


def test_prefix_similarity_join_completeness_brute_force(tmp_path, ray_session):
    """Prefix-filter exact similarity join pinned against brute force: every
    pair with shingle Jaccard >= 1/2 is found (completeness theorem), no
    extras, and the integer triples match a numpy recompute."""
    from hepdata_validator_ray.pipelines.dedup import (
        _shingle_hashes,
        _word_hashes,
        _WORD_KEY_MINHASH,
        prefix_similarity_join,
    )

    texts = [
        "a b c d e f g h",        # 0: base
        "a b c d e f g h",        # 1: identical -> J=1
        "a b c d e f g x",        # 2: one tail word changed -> J high
        "z y x w v u t s",        # 3: unrelated
        "a b c d e f g h i j",    # 4: superset-ish
        "q r",                    # 5: short (single whole-text shingle)
        "q r",                    # 6:短 twin -> J=1
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    p = str(tmp_path / "docs.parquet")
    df.to_parquet(p, index=False)

    wh, offs = _word_hashes(df["text"], _WORD_KEY_MINHASH)
    sh, sh_off = _shingle_hashes(wh, offs, 3)
    shi = sh.view(np.int64)
    sets = [np.unique(shi[sh_off[i] : sh_off[i + 1]]) for i in range(len(df))]
    want = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = np.intersect1d(sets[i], sets[j], assume_unique=True).size
            na, nb = sets[i].size, sets[j].size
            if 2 * inter >= (na + nb - inter):
                want.add((i, j, int(inter), int(na), int(nb)))

    got = prefix_similarity_join(p).to_pandas()
    got_set = {
        (int(r.doc_id_a), int(r.doc_id_b), int(r.n_inter), int(r.n_a), int(r.n_b))
        for r in got.itertuples()
    }
    assert got_set == want and len(want) >= 2


def test_prefix_filter_group_cap_certificate(tmp_path, ray_session):
    """An oversized prefix group RAISES (validity certificate) instead of
    silently dropping pairs."""
    from hepdata_validator_ray.pipelines.dedup import prefix_filter_candidates

    # 30 identical docs share every prefix shingle -> one group of 30 > cap
    df = pd.DataFrame(
        {"doc_id": np.arange(30, dtype=np.int64), "text": ["same text here okay"] * 30}
    )
    p = str(tmp_path / "docs.parquet")
    df.to_parquet(p, index=False)
    with pytest.raises(Exception, match="cap"):
        prefix_filter_candidates(p, cap=10).to_pandas()


def test_snapshot_length_drift_crafted(tmp_path, ray_session):
    """L1 drift pinned: hand-computed per-source histogram distances,
    one-sided sources drift by their full mass."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import snapshot_length_drift

    def write(rows, name):
        t = pa.table(
            {
                "doc_id": pa.array([f"d{i}" for i in range(len(rows))]),
                "tokens": pa.array([[0] * v for _, v in rows], type=pa.list_(pa.int32())),
                "n_tok": pa.array([v for _, v in rows], type=pa.int32()),
                "source": pa.array([s for s, _ in rows]),
            }
        )
        p = str(tmp_path / name)
        pq.write_table(t, p)
        return p

    old = write([("s", 3), ("s", 3), ("s", 5), ("t", 2)], "old.parquet")
    new = write([("s", 3), ("s", 7), ("u", 1)], "new.parquet")
    got = snapshot_length_drift(old, new).to_pandas().set_index("source")
    # s: v3 |2-1|=1, v5 |1-0|=1, v7 |0-1|=1 => l1=3
    assert (got.loc["s", "n_old"], got.loc["s", "n_new"], got.loc["s", "l1"]) == (3, 2, 3)
    assert (got.loc["t", "n_old"], got.loc["t", "n_new"], got.loc["t", "l1"]) == (1, 0, 1)
    assert (got.loc["u", "n_old"], got.loc["u", "n_new"], got.loc["u", "l1"]) == (0, 1, 1)


def test_file_integrity_profile_crafted(tmp_path, ray_session):
    """Per-file integrity profile pinned: digests localize a corrupted
    partition (only the touched file's digest moves), n_sources flags
    mixed-source files, and the file digests sum (mod M) to the corpus
    digest."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import (
        DIGEST_MOD,
        corpus_digest_stats,
        file_integrity_profile,
    )

    def write(d, name, rows):
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows]),
                "tokens": pa.array([r[2] for r in rows], type=pa.list_(pa.int32())),
                "n_tok": pa.array([len(r[2]) if r[2] else 0 for r in rows], type=pa.int32()),
                "source": pa.array([r[1] for r in rows]),
            }
        )
        pq.write_table(t, str(d / name))

    d = tmp_path / "seqs"
    d.mkdir()
    write(d, "a.parquet", [("x", "s", [1, 2]), ("y", "s", [3])])
    write(d, "b.parquet", [("z", "s", [4]), ("w", "t", [5])])  # mixed sources
    got = file_integrity_profile(str(d)).to_pandas().set_index("file")
    assert (got.loc["a.parquet", "n_rows"], got.loc["a.parquet", "n_sources"]) == (2, 1)
    assert (got.loc["b.parquet", "n_rows"], got.loc["b.parquet", "n_sources"]) == (2, 2)
    # file digests reconcile with the corpus roll-up
    corpus = corpus_digest_stats(str(d)).to_pandas().set_index("source")
    assert int(got["digest"].sum()) % DIGEST_MOD == int(corpus.loc["<all>", "digest"])
    # corrupt one file -> only its digest moves
    write(d, "b.parquet", [("z", "s", [4, 4]), ("w", "t", [5])])
    got2 = file_integrity_profile(str(d)).to_pandas().set_index("file")
    assert got2.loc["a.parquet", "digest"] == got.loc["a.parquet", "digest"]
    assert got2.loc["b.parquet", "digest"] != got.loc["b.parquet", "digest"]


def test_ntok_mad_disc_convention(tmp_path, ray_session):
    """MAD pinned to the disc-quantile convention: even-count source takes
    the LOWER middle value (rank ceil(n/2)), and the deviation median is a
    real data deviation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import ntok_mad_stats

    vals = [1, 3, 5, 100]  # med = 3 (rank 2 of 4); |v-3| = [2,0,2,97] -> mad = 2
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(vals))]),
            "tokens": pa.array([[0] * v for v in vals], type=pa.list_(pa.int32())),
            "n_tok": pa.array(vals, type=pa.int32()),
            "source": pa.array(["s"] * len(vals)),
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    got = ntok_mad_stats(p).to_pandas().set_index("source")
    assert (got.loc["s", "n"], got.loc["s", "med"], got.loc["s", "mad"]) == (4, 3, 2)


def test_token_periodicity_crafted(tmp_path, ray_session):
    """Periodicity audit pinned by hand: a period-2 looper spikes lag 2
    (and lag 4, its multiple) without spiking lag 1; NULL lists contribute
    zero positions; a NULL element matches a NULL element (IS NOT DISTINCT
    FROM, the SQL twin's convention)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import token_periodicity_stats

    rows = [
        [5, 9, 5, 9, 5, 9],   # period 2: lag1 0/5, lag2 4/4, lag4 2/2
        [3, 3, 3],            # constant: every lag matches fully
        None,                 # zero positions at every lag
        [1, None, 1, None],   # NULL elems: lag2 pairs (1,1),(None,None) both match
    ]
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(rows))]),
            "tokens": pa.array(rows, type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(r) if r else 0 for r in rows], type=pa.int32()),
            "source": pa.array(["a", "a", "a", "b"]),
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    got = (
        token_periodicity_stats(p, lags=(1, 2, 4))
        .to_pandas()
        .set_index(["source", "lag"])
        .sort_index()
    )
    # source a: rows of len 6, 3, 0
    assert tuple(got.loc[("a", 1)][["n_pos", "n_match"]]) == (5 + 2, 0 + 2)
    assert tuple(got.loc[("a", 2)][["n_pos", "n_match"]]) == (4 + 1, 4 + 1)
    assert tuple(got.loc[("a", 4)][["n_pos", "n_match"]]) == (2 + 0, 2 + 0)
    # source b: the NULL-element row, len 4
    assert tuple(got.loc[("b", 1)][["n_pos", "n_match"]]) == (3, 0)
    assert tuple(got.loc[("b", 2)][["n_pos", "n_match"]]) == (2, 2)
    assert tuple(got.loc[("b", 4)][["n_pos", "n_match"]]) == (0, 0)


def test_token_periodicity_duckdb_parity(ray_session):
    """sf0.001 synth corpus: the numpy shifted comparison and the SQL
    list-slice zip agree exactly on every (source, lag) cell."""
    import duckdb

    from hepdata_validator_ray.pipelines.validation import token_periodicity_stats
    from hepdata_validator_ray.synth import ensure_sequences_parquet

    d = str(ensure_sequences_parquet("/root/testdata/sf0.001"))
    got = (
        token_periodicity_stats(d)
        .to_pandas()
        .sort_values(["source", "lag"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            f"""
WITH l AS (SELECT unnest([1, 2, 4, 8]) AS lag),
r AS (SELECT coalesce(source, '<NULL>') AS source, tokens,
             coalesce(len(tokens), 0)::BIGINT AS n FROM read_parquet('{d}/*.parquet')),
x AS (SELECT r.source, l.lag::BIGINT AS lag, greatest(n - l.lag, 0)::BIGINT AS n_pos,
             (CASE WHEN n > l.lag
                   THEN len(list_filter(list_zip(tokens[1+l.lag:], tokens[:n-l.lag]),
                                        x -> x[1] IS NOT DISTINCT FROM x[2]))
                   ELSE 0 END)::BIGINT AS n_match
      FROM r CROSS JOIN l)
SELECT source, lag, sum(n_pos)::BIGINT AS n_pos, sum(n_match)::BIGINT AS n_match
FROM x GROUP BY 1, 2"""
        )
        .df()[["source", "lag", "n_pos", "n_match"]]
        .sort_values(["source", "lag"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_similarity_calibration_crafted(tmp_path, ray_session):
    """Hand-built geometry: an identical pair (cos 1), an orthogonal pair
    (cos 0), an antipodal pair (dot < 0) — all forced into ONE bucket by
    bucket-count 1, so every pair is sampled; the ladder counts are exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.similarity import similarity_calibration

    vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [1.0, 0.0, 0.0, 0.0],   # with v0: cos 1
        [0.0, 1.0, 0.0, 0.0],   # with v0/v1: cos 0; dot 0 is NOT above t=0
        [-1.0, 0.0, 0.0, 0.0],  # with v0/v1: cos −1 (dot < 0 never counts)
    ]
    t = pa.table(
        {
            "vec_id": pa.array(range(4), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    p = str(tmp_path / "emb.parquet")
    pq.write_table(t, p)
    got = (
        similarity_calibration(p, n_buckets=1, thresholds_x100=(0, 50, 100))
        .to_pandas()
        .set_index("thr_x100")
        .sort_index()
    )
    # 6 pairs total; only (v0, v1) has dot > 0
    assert (got["n_pairs"] == 6).all()
    assert got.loc[0, "n_above"] == 1
    assert got.loc[50, "n_above"] == 1
    assert got.loc[100, "n_above"] == 1  # exact cos 1 survives t = 1.00


def test_similarity_calibration_duckdb_parity(ray_session):
    import duckdb

    from hepdata_validator_ray.pipelines.similarity import similarity_calibration

    p = "/root/testdata/sf0.001/embeddings.parquet"
    got = similarity_calibration(p).to_pandas().sort_values("thr_x100").reset_index(drop=True)
    want = (
        duckdb.sql(
            f"""
WITH q AS (SELECT vec_id, ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8))::UBIGINT % 16 AS b,
  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*100 + 0.5) AS BIGINT)) AS qe
  FROM read_parquet('{p}')),
n AS (SELECT vec_id, b, qe, list_sum(list_transform(qe, x -> x*x))::BIGINT AS qq FROM q),
pr AS (SELECT list_sum(list_transform(list_zip(a.qe, c.qe), s -> s[1]*s[2]))::BIGINT AS dot,
              a.qq AS qa, c.qq AS qb
       FROM n a JOIN n c ON a.b = c.b AND a.vec_id < c.vec_id),
t AS (SELECT unnest([0, 20, 40, 60, 80]) AS thr)
SELECT thr::BIGINT AS thr_x100, count(*)::BIGINT AS n_pairs,
       count(*) FILTER (WHERE dot > 0 AND dot*dot*10000 >= thr*thr*qa*qb)::BIGINT AS n_above
FROM pr CROSS JOIN t GROUP BY 1"""
        )
        .df()
        .sort_values("thr_x100")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[["thr_x100", "n_pairs", "n_above"]], want, check_dtype=False
    )


def test_vocab_churn_crafted(tmp_path, ray_session):
    """Hand-built churn: token 7 persists, 8 is lost, 9 is gained; a
    source present only in the new snapshot churns by its full vocab."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import vocab_churn_stats

    def write(d, rows, srcs):
        t = pa.table(
            {
                "doc_id": pa.array([f"d{i}" for i in range(len(rows))]),
                "tokens": pa.array(rows, type=pa.list_(pa.int32())),
                "n_tok": pa.array([len(r) if r else 0 for r in rows], pa.int32()),
                "source": pa.array(srcs),
            }
        )
        d.mkdir()
        pq.write_table(t, d / "x.parquet")

    old = tmp_path / "old"
    new = tmp_path / "new"
    write(old, [[7, 8], [7]], ["a", "a"])
    write(new, [[7, 9], None, [5]], ["a", "a", "b"])
    got = vocab_churn_stats(str(old), str(new)).to_pandas().set_index("source")
    a = got.loc["a"]
    assert tuple(a[["n_old_vocab", "n_new_vocab", "n_gained", "n_lost"]]) == (2, 2, 1, 1)
    b = got.loc["b"]
    assert tuple(b[["n_old_vocab", "n_new_vocab", "n_gained", "n_lost"]]) == (0, 1, 1, 0)


def test_compute_cost_forecast_crafted(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import compute_cost_forecast

    t = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d"]),
            "source": pa.array(["s", "s", "s", None]),
            "n_tok": pa.array([10, 2000, 1024, None], pa.int32()),
        }
    )
    p = str(tmp_path / "x.parquet")
    pq.write_table(t, p)
    got = compute_cost_forecast(p, max_len=1024).to_pandas().set_index("source")
    s = got.loc["s"]
    # 1024 is NOT over (strict >); 2000 loses 976 tokens to truncation
    assert tuple(s[["n_seqs", "sum_tok", "sum_tok_sq", "n_over", "trunc_loss"]]) == (
        3,
        3034,
        10 * 10 + 2000 * 2000 + 1024 * 1024,
        1,
        976,
    )
    nu = got.loc["<NULL>"]
    assert tuple(nu[["n_seqs", "sum_tok", "sum_tok_sq", "n_over", "trunc_loss"]]) == (
        1, 0, 0, 0, 0,
    )


def test_rowgroup_pruning_audit_crafted(tmp_path, ray_session):
    """Crafted tight-stats layout: rows sorted by n_tok, row groups of 4 —
    the [10, 30) window must prune exactly the groups whose range lies
    outside, and the selected count is exact regardless of pruning."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import rowgroup_pruning_audit

    nt = list(range(0, 48, 3))  # 0, 3, ..., 45 — sorted, rgs of 4 span 12
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(nt))]),
            "source": pa.array(["s"] * len(nt)),
            "n_tok": pa.array(nt, pa.int32()),
        }
    )
    p = tmp_path / "part-00.parquet"
    pq.write_table(t, p, row_group_size=4)
    got = rowgroup_pruning_audit(str(tmp_path), lo=10, hi=30).to_pandas().iloc[0]
    # groups: [0,9] pruned, [12,21] kept, [24,33] kept, [36,45] pruned
    assert int(got["n_rgs"]) == 4
    assert int(got["n_rgs_pruned"]) == 2
    assert int(got["n_rows_pruned"]) == 8
    # selected: 12,15,18,21,24,27 → 6 rows
    assert int(got["n_selected"]) == 6


def test_rowgroup_pruning_rowgrouped_fixture_content_parity(ray_session):
    """The re-laid-out pruning fixture carries the SAME corpus content as
    the base layout (only layout differs): per-source row counts match."""
    import duckdb

    from hepdata_validator_ray.synth import (
        ensure_rowgrouped_sequences_parquet,
        ensure_sequences_parquet,
    )

    base = str(ensure_sequences_parquet("/root/testdata/sf0.001"))
    rg = ensure_rowgrouped_sequences_parquet("/root/testdata/sf0.001")
    q = "SELECT coalesce(source, '<NULL>') s, count(*) n, sum(coalesce(n_tok, 0)) st FROM read_parquet('{}/*.parquet') GROUP BY 1 ORDER BY 1"
    assert duckdb.sql(q.format(base)).fetchall() == duckdb.sql(q.format(rg)).fetchall()


def test_interarrival_spectrum_crafted(tmp_path, ray_session):
    """Hand-built gaps: user 1 at t = 0, 5 µs, 1005 µs → gaps 5 (1 digit)
    and 1000 (4 digits); user 2's single event contributes nothing; a
    zero gap (same ts, event_id tie-break) lands in the 1-digit bucket."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import events_interarrival_spectrum

    ts = pa.array([0, 5, 1005, 7, 42, 42], pa.timestamp("us"))
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "ts": ts,
            "user_id": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
            "event_type": pa.array(["a", "a", "b", "a", "c", "c"]),
            "value": pa.array([0.0] * 6),
            "props": pa.array(["{}"] * 6),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    got = (
        events_interarrival_spectrum(str(d))
        .to_pandas()
        .set_index(["event_type", "n_digits"])["n_gaps"]
        .to_dict()
    )
    assert got == {("a", 1): 1, ("b", 4): 1, ("c", 1): 1}


def test_ntok_tdigest_quantiles_accuracy(ray_session):
    """The distributed t-digest pipeline's per-source quantile estimates
    sit within 5% (relative) of DuckDB's exact quantile_disc on the synth
    corpus — the accuracy contract for the rows-only sketch path."""
    import duckdb

    from hepdata_validator_ray.pipelines.validation import ntok_tdigest_quantiles
    from hepdata_validator_ray.synth import ensure_sequences_parquet

    d = str(ensure_sequences_parquet("/root/testdata/sf0.001"))
    got = ntok_tdigest_quantiles(d).set_index(["source", "q_x100"])
    exact = duckdb.sql(
        f"""
SELECT coalesce(source, '<NULL>') AS source,
       quantile_disc(coalesce(n_tok, 0), 0.50) AS q50,
       quantile_disc(coalesce(n_tok, 0), 0.95) AS q95,
       quantile_disc(coalesce(n_tok, 0), 0.99) AS q99
FROM read_parquet('{d}/*.parquet') GROUP BY 1"""
    ).df().melt(id_vars="source", var_name="q", value_name="v")
    exact["q_x100"] = exact["q"].str.removeprefix("q").astype(int)
    exact = exact.set_index(["source", "q_x100"])
    assert set(got.index) == set(exact.index)
    for idx in exact.index:
        e = float(exact.loc[idx, "v"])
        g = float(got.loc[idx, "est"])
        assert abs(g - e) <= 0.05 * max(abs(e), 1.0) + 2.0, (idx, g, e)


def test_schema_fingerprint_detects_drift(tmp_path, ray_session):
    """Two files, one with a widened type (int64 vs int32 n_tok) and one
    with a renamed column: three distinct digests; identical-schema files
    agree; column REORDERING alone does not flag (documented)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import schema_fingerprint_audit

    base = pa.table(
        {"doc_id": pa.array(["a"]), "n_tok": pa.array([1], pa.int32())}
    )
    widened = pa.table(
        {"doc_id": pa.array(["a"]), "n_tok": pa.array([1], pa.int64())}
    )
    renamed = pa.table(
        {"doc_id": pa.array(["a"]), "num_tok": pa.array([1], pa.int32())}
    )
    reordered = pa.table(
        {"n_tok": pa.array([1], pa.int32()), "doc_id": pa.array(["a"])}
    )
    for name, t in [("a", base), ("b", widened), ("c", renamed), ("d", reordered), ("e", base)]:
        pq.write_table(t, tmp_path / f"{name}.parquet")
    got = schema_fingerprint_audit(str(tmp_path)).to_pandas().set_index("file")
    dig = got["schema_digest"]
    assert dig["a.parquet"] == dig["e.parquet"] == dig["d.parquet"]  # order-insensitive
    assert len({dig["a.parquet"], dig["b.parquet"], dig["c.parquet"]}) == 3
    assert (got["n_leaves"] == 2).all()


def test_orc_source_roundtrip_and_violations(ray_session):
    """The ORC mirror reads back row-identical to the parquet corpus
    (schema + per-source counts), and the check suite over the ORC read
    produces the same violation multiset as over parquet — cross-format
    equivalence, the archive-mode discipline."""
    import pandas as pd

    from hepdata_validator_ray.pipelines.validation import row_violations
    from hepdata_validator_ray.sources.orc import ensure_sequences_orc, read_sequences_orc
    from hepdata_validator_ray.synth import ensure_sequences_parquet
    from hepdata_validator_ray.checks.base import CheckContext
    from hepdata_validator_ray.pipelines.validation import _violation_pairs_batch

    sf = "/root/testdata/sf0.001"
    pq_dir = str(ensure_sequences_parquet(sf))
    orc_dir = ensure_sequences_orc(sf)
    ds = read_sequences_orc(orc_dir)
    assert ds.count() == 2000
    ctx = CheckContext()
    got = (
        ds.map_batches(lambda b: _violation_pairs_batch(b, ctx), batch_format="pyarrow")
        .to_pandas()
        .sort_values(["doc_id", "check_name"], na_position="first")
        .reset_index(drop=True)
    )
    want = (
        row_violations(pq_dir)
        .to_pandas()
        .sort_values(["doc_id", "check_name"], na_position="first")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_simhash_md5_twin_matches_bruteforce(ray_session):
    """The banded simhash pair search under the md5-parity word hash finds
    EXACTLY the brute-force all-pairs hamming<=3 set at sf0.001 (23 pairs)
    — the pigeonhole completeness argument made checkable."""
    import duckdb
    import pandas as pd

    from hepdata_validator_ray.pipelines.dedup import simhash_pairs

    sf = "/root/testdata/sf0.001"
    got = (
        simhash_pairs(f"{sf}/documents.parquet", key_fn="md5")
        .to_pandas()
        .sort_values(["doc_id_a", "doc_id_b"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
WITH d AS (SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')),
w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM d WHERE text IS NOT NULL),
h AS (SELECT doc_id, ('0x'||substr(md5(word),1,16))::UBIGINT AS h FROM w),
j AS (SELECT unnest(range(64)) AS j),
b AS (SELECT doc_id, j.j,
             count(*) FILTER (WHERE (h >> j.j::UBIGINT) & 1::UBIGINT = 1::UBIGINT) AS ones,
             count(*) AS n
      FROM h CROSS JOIN j GROUP BY 1, 2),
s0 AS (SELECT doc_id, sum(CASE WHEN 2*ones > n THEN (1::HUGEINT << j) ELSE 0::HUGEINT END)::UBIGINT AS sh
       FROM b GROUP BY doc_id),
s AS (SELECT d.doc_id, coalesce(s0.sh, 0::UBIGINT) AS sh FROM d LEFT JOIN s0 USING (doc_id)),
pr AS (SELECT a.doc_id AS doc_id_a, c.doc_id AS doc_id_b,
              bit_count(xor(a.sh, c.sh))::DOUBLE AS hamming
       FROM s a JOIN s c ON a.doc_id < c.doc_id)
SELECT doc_id_a, doc_id_b, hamming FROM pr WHERE hamming <= 3"""
    ).df().sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    assert len(want) > 0
    pd.testing.assert_frame_equal(
        got[["doc_id_a", "doc_id_b", "hamming"]], want, check_dtype=False
    )


def test_minhash_md5_twin_lsh_banding_matches_sql(ray_session):
    """The md5-per-perm minhash twin's banded pair set AND per-pair
    signature-agreement estimates match the full SQL recomputation at
    sf0.001 (28 pairs) — LSH banding certified end-to-end, not sampled."""
    import duckdb
    import pandas as pd

    from hepdata_validator_ray.pipelines.dedup import minhash_lsh_pairs_md5

    sf = "/root/testdata/sf0.001"
    got = (
        minhash_lsh_pairs_md5(f"{sf}/documents.parquet")
        .to_pandas()
        .sort_values(["doc_id_a", "doc_id_b"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
WITH d AS (SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet') WHERE text IS NOT NULL),
sh AS (SELECT doc_id,
  CASE WHEN len(string_split(text,' ')) < 3 THEN [array_to_string(string_split(text,' '), ' ')]
       ELSE [array_to_string(string_split(text,' ')[x+1:x+3], ' ') FOR x IN range(len(string_split(text,' ')) - 2)]
  END AS shingles FROM d),
sp AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
perms AS (SELECT unnest(range(16)) AS p),
sig AS (SELECT doc_id, p, min(('0x'||substr(md5(CAST(p AS VARCHAR) || '|' || s),1,16))::UBIGINT) AS m
        FROM sp CROSS JOIN perms GROUP BY 1, 2),
sigl AS (SELECT doc_id, list(CAST(m AS VARCHAR) ORDER BY p) AS sl FROM sig GROUP BY 1),
bk AS (SELECT doc_id, b,
       (('0x'||substr(md5('B' || CAST(b AS VARCHAR) || '|' ||
          array_to_string(sl[b*4+1:b*4+4], ',')),1,16))::UBIGINT >> 1)::BIGINT AS bucket,
       sl
       FROM sigl CROSS JOIN (SELECT unnest(range(4)) AS b)),
pr AS (SELECT DISTINCT a.doc_id AS doc_id_a, c.doc_id AS doc_id_b, a.sl AS sa, c.sl AS sb
       FROM bk a JOIN bk c ON a.bucket = c.bucket AND a.doc_id < c.doc_id)
SELECT doc_id_a, doc_id_b,
       (len(list_filter(list_zip(sa, sb), z -> z[1] = z[2]))::DOUBLE / 16) AS est_jaccard
FROM pr"""
    ).df().sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    assert len(want) > 0
    pd.testing.assert_frame_equal(
        got[["doc_id_a", "doc_id_b", "est_jaccard"]], want, check_dtype=False
    )


def test_minhash_md5_hot_bucket_raises_not_truncates(tmp_path, ray_session):
    """250 identical docs co-bucket in every band (> HOT_BUCKET_LIMIT):
    the md5 GATE path must raise (its SQL twin enumerates every pair, so
    truncation would silently desync engine and oracle) — the
    raise-never-drop certificate."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from hepdata_validator_ray.pipelines.dedup import minhash_lsh_pairs_md5

    n = 250
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["the same document text for everyone"] * n),
        }
    )
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)
    with pytest.raises(Exception, match="hot bucket"):
        minhash_lsh_pairs_md5(p).materialize()


def test_file_order_audit_crafted(tmp_path, ray_session):
    """Hand-built order: ascending file → 0 descents; one swap → 1; NULL
    and no-suffix ids are skipped (adjacency over the valid subsequence
    bridges across them)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import file_order_audit

    ids_a = ["doc-s-00000001", "doc-s-00000002", "doc-s-00000003"]
    # 5 then (skip, skip) then 4: the bridged pair (5, 4) descends once
    ids_b = ["doc-s-00000005", None, "no-digits-here", "doc-s-00000004"]
    pq.write_table(pa.table({"doc_id": pa.array(ids_a, pa.string())}), tmp_path / "a.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(ids_b, pa.string())}), tmp_path / "b.parquet")
    got = file_order_audit(str(tmp_path)).to_pandas().set_index("file")
    assert tuple(got.loc["a.parquet"][["n_valid", "n_desc"]]) == (3, 0)
    assert tuple(got.loc["b.parquet"][["n_valid", "n_desc"]]) == (2, 1)


def test_file_range_overlap_crafted(tmp_path, ray_session):
    """Disjoint spans → 0 overlaps; one straddling file overlaps both; a
    counter-less file reports −1 sentinel bounds and 0 overlaps."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import file_range_overlap_audit

    def w(name, ids):
        pq.write_table(pa.table({"doc_id": pa.array(ids, pa.string())}), tmp_path / name)

    w("a.parquet", ["doc-s-00000001", "doc-s-00000010"])
    w("b.parquet", ["doc-s-00000020", "doc-s-00000030"])
    w("c.parquet", ["doc-s-00000005", "doc-s-00000025"])  # straddles a and b
    w("d.parquet", ["no-digits", None])
    got = file_range_overlap_audit(str(tmp_path)).to_pandas().set_index("file")
    assert tuple(got.loc["a.parquet"][["ctr_min", "ctr_max", "n_overlaps"]]) == (1, 10, 1)
    assert tuple(got.loc["b.parquet"][["ctr_min", "ctr_max", "n_overlaps"]]) == (20, 30, 1)
    assert tuple(got.loc["c.parquet"][["ctr_min", "ctr_max", "n_overlaps"]]) == (5, 25, 2)
    assert tuple(got.loc["d.parquet"][["ctr_min", "ctr_max", "n_overlaps"]]) == (-1, -1, 0)


def test_file_compaction_plan_crafted(tmp_path, ray_session):
    """Transitive overlap chains merge: a-c-b form ONE group through the
    straddler; d (disjoint) and e (counter-less) are singletons."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import file_compaction_plan

    def w(name, ids):
        pq.write_table(pa.table({"doc_id": pa.array(ids, pa.string())}), tmp_path / name)

    w("a.parquet", ["doc-s-00000001", "doc-s-00000010"])
    w("b.parquet", ["doc-s-00000020", "doc-s-00000030"])
    w("c.parquet", ["doc-s-00000005", "doc-s-00000025"])  # chains a↔b
    w("d.parquet", ["doc-s-00000050", "doc-s-00000060"])
    w("e.parquet", [None, "no-digits"])
    got = file_compaction_plan(str(tmp_path)).to_pandas().set_index("file")
    assert (
        got.loc["a.parquet", "merge_group"]
        == got.loc["b.parquet", "merge_group"]
        == got.loc["c.parquet", "merge_group"]
    )
    assert got.loc["a.parquet", "group_size"] == 3
    assert got.loc["d.parquet", "group_size"] == 1
    assert got.loc["e.parquet", "group_size"] == 1
    assert len(set(got["merge_group"])) == 3


def test_events_rollup_levels_reconcile(tmp_path, ray_session):
    """Crafted 2-type × 2-day events: the derived per-type and grand
    levels must equal the additive roll-up of the finest grain, with the
    '<ALL>'/-1 markers; a NULL event_type refuses (marker conflation)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import events_rollup

    ts = pa.array(
        [1704067200_000000, 1704067200_000000, 1704153600_000000, 1704153600_000000],
        pa.timestamp("us"),
    )  # 2024-01-01 ×2, 2024-01-02 ×2
    tbl = pa.table(
        {
            "ts": ts,
            "event_type": pa.array(["a", "b", "a", "a"], pa.string()),
            "value": pa.array([1.00, 2.50, 0.25, 0.25], pa.float64()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = events_rollup(str(tmp_path))
    idx = got.set_index(["event_type", "day"])
    d1, d2 = 19723, 19724  # days since epoch for 2024-01-01/02
    assert tuple(idx.loc[("a", d1)][["n_events", "sum_cents"]]) == (1, 100)
    assert tuple(idx.loc[("a", d2)][["n_events", "sum_cents"]]) == (2, 50)
    assert tuple(idx.loc[("b", d1)][["n_events", "sum_cents"]]) == (1, 250)
    assert tuple(idx.loc[("a", -1)][["n_events", "sum_cents"]]) == (3, 150)
    assert tuple(idx.loc[("b", -1)][["n_events", "sum_cents"]]) == (1, 250)
    assert tuple(idx.loc[("<ALL>", -1)][["n_events", "sum_cents"]]) == (4, 400)
    assert len(got) == 6

    tbl2 = tbl.set_column(1, "event_type", pa.array(["a", None, "b", "a"], pa.string()))
    pq.write_table(tbl2, tmp_path / "events.parquet")
    import pytest as _pytest

    with _pytest.raises(Exception, match="NULL event_type"):
        events_rollup(str(tmp_path))


def test_benford_decade_boundaries_exact(tmp_path, ray_session):
    """Cents 1/9/10/99/100/999/1000 land on digits 1/9/1/9/1/9/1 — the
    float-log10 failure points; zero cents drops (mirrored WHERE)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.relational import benford_digit_audit

    vals = [0.01, 0.09, 0.10, 0.99, 1.00, 9.99, 10.00, 0.00]
    tbl = pa.table(
        {
            "event_type": pa.array(["t"] * len(vals), pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = benford_digit_audit(str(tmp_path)).set_index("first_digit")["n"]
    assert int(got.loc[1]) == 4  # 1, 10, 100, 1000 cents
    assert int(got.loc[9]) == 3  # 9, 99, 999 cents
    assert int(got.sum()) == 7  # the 0.00 row dropped


def test_fertility_histogram_conventions(tmp_path, ray_session):
    """'' is 1 word / 0 chars → bucket 0; 'a  b' splits to 3 words (empty
    segment counted) → (10·4)//3 = 13; NULL text drops; NULL source keys
    '<NULL>'."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.text import fertility_histogram

    tbl = pa.table(
        {
            "source": pa.array(["s", "s", None, "s"], pa.string()),
            "text": pa.array(["", "a  b", "xy", None], pa.string()),
        }
    )
    path = tmp_path / "documents.parquet"
    pq.write_table(tbl, path)
    got = fertility_histogram(str(path)).to_pandas().set_index(["source", "fert_x10"])
    assert int(got.loc[("s", 0), "n_docs"]) == 1
    assert int(got.loc[("s", 13), "n_docs"]) == 1
    assert int(got.loc[("<NULL>", 20), "n_docs"]) == 1  # 'xy': 20//1
    assert int(got["n_docs"].sum()) == 3  # NULL text dropped


def test_winsorized_token_stats_conventions(tmp_path, ray_session):
    """Cap = discrete 0.99-quantile (1-based rank ceil(q*n)); capped sum
    uses min(v, cap); NULL n_tok dropped, NULL source keys '<NULL>'."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import winsorized_token_stats

    # source s: values 1..10 -> with q=0.5, rank ceil(5)=5 -> cap=5
    tbl = pa.table(
        {
            "source": pa.array(["s"] * 10 + [None, None], pa.string()),
            "n_tok": pa.array(list(range(1, 11)) + [7, None], pa.int64()),
        }
    )
    path = tmp_path / "sequences.parquet"
    pq.write_table(tbl, path)
    got = winsorized_token_stats(str(path), q=0.5).to_pandas().set_index("source")
    assert int(got.loc["s", "n"]) == 10
    assert int(got.loc["s", "sum_tok"]) == 55
    # cap 5: 1+2+3+4+5 + 5*5 = 40; 5 rows above the cap
    assert int(got.loc["s", "wsum_tok"]) == 40
    assert int(got.loc["s", "n_capped"]) == 5
    # NULL source bucket: single non-null value, cap=7, nothing capped
    assert int(got.loc["<NULL>", "n"]) == 1
    assert int(got.loc["<NULL>", "wsum_tok"]) == 7
    assert int(got.loc["<NULL>", "n_capped"]) == 0


def _wrong_type_table():
    import pyarrow as pa

    # doc_id int64 (wrong: expect string), n_tok string (wrong: expect
    # integer), tokens + source correct
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "tokens": pa.array([[1, 2], [3], [4, 5]], pa.list_(pa.int32())),
            "n_tok": pa.array(["2", "1", "2"], pa.string()),
            "source": pa.array(["web", "web", "books"], pa.string()),
        }
    )


def test_wrong_typed_columns_become_violations_not_crashes(tmp_path, ray_session):
    """A shard whose contract columns drifted to the wrong physical type
    must yield per-row column_type violations — never an aborted job
    (the r3 crash: match_substring_regex on int64 doc_id)."""
    import pyarrow.parquet as pq

    from hepdata_validator_ray.engine import ValidationEngine

    pq.write_table(_wrong_type_table(), tmp_path / "part-0.parquet")
    res = ValidationEngine().validate(str(tmp_path))
    assert not res.valid
    # 3 rows x 2 wrong columns
    assert res.violation_counts["column_type"] == 6
    # kernels over the wrong columns were skipped, not crashed: no
    # doc_id_format / n_tok_non_negative rows
    assert "doc_id_format" not in res.violation_counts
    assert "n_tok_non_negative" not in res.violation_counts
    # well-typed columns still checked (token checks ran)
    assert res.n_rows == 3


def test_wrong_type_message_grammar():
    from hepdata_validator_ray.checks.base import CheckContext
    from hepdata_validator_ray.checks.row_checks import check_column_type, prepare_view

    view = prepare_view(_wrong_type_table())
    assert view["wrong_type"] == {"doc_id": "int64", "n_tok": "string"}
    res = check_column_type(view, CheckContext())
    assert len(res.indices) == 6
    assert (
        res.details[0]
        == "value of Arrow type 'int64' is not of type 'string' in 'doc_id' (expected: {'type': 'string'})"
    )


def test_benign_encodings_are_coerced_not_flagged(ray_session):
    """Dictionary-encoded strings and all-null untyped columns are valid
    physical spellings of the contract types — they coerce, not flag."""
    import pyarrow as pa

    from hepdata_validator_ray.checks.base import CheckContext
    from hepdata_validator_ray.checks.row_checks import prepare_view

    t = pa.table(
        {
            "doc_id": pa.array(["a", "b"], pa.string()).dictionary_encode(),
            "n_tok": pa.array([None, None], pa.null()),
        }
    )
    view = prepare_view(t)
    assert "wrong_type" not in view
    assert view["n_tok_null"].all()
    assert view["doc_id"].type == pa.string()


def test_clean_sequences_drops_wrong_typed_rows(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.clean import clean_sequences

    pq.write_table(_wrong_type_table(), tmp_path / "part-0.parquet")
    out = clean_sequences(str(tmp_path / "part-0.parquet")).to_pandas()
    assert len(out) == 0  # every row fails column_type


def test_snapshot_psi_conventions(tmp_path, ray_session):
    """Edges from OLD deciles; new-only sources excluded; one-sided-empty
    buckets surfaced in n_zero_buckets, not epsilon'd; identical snapshots
    give psi == 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import snapshot_psi

    old = tmp_path / "old.parquet"
    new = tmp_path / "new.parquet"
    # source s: old values 1..100; new values shifted up by 50
    pq.write_table(
        pa.table(
            {
                "source": pa.array(["s"] * 100 + ["old_only"], pa.string()),
                "n_tok": pa.array(list(range(1, 101)) + [7], pa.int64()),
            }
        ),
        old,
    )
    pq.write_table(
        pa.table(
            {
                "source": pa.array(["s"] * 100 + ["new_only"], pa.string()),
                "n_tok": pa.array(list(range(51, 151)) + [7], pa.int64()),
            }
        ),
        new,
    )
    got = snapshot_psi(str(old), str(new)).to_pandas().set_index("source")
    assert "new_only" not in got.index  # no reference bins
    assert "old_only" in got.index  # reference exists, new side empty
    assert int(got.loc["old_only", "n_new"]) == 0
    # old_only: 1 non-empty old bucket, 0 new -> that bucket is one-sided
    assert int(got.loc["old_only", "n_zero_buckets"]) == 1
    s = got.loc["s"]
    # shift by 50: new mass vacates the low deciles -> buckets 0..4 hold
    # old-only mass except... at least one one-sided bucket and psi > 0
    assert float(s["psi"]) > 0.5
    assert int(s["n_zero_buckets"]) >= 1
    # identical snapshots -> psi exactly 0, no zero buckets
    same = snapshot_psi(str(old), str(old)).to_pandas().set_index("source")
    assert (same["psi"] == 0.0).all()
    assert (same["n_zero_buckets"] == 0).all()


def test_weighted_priority_sample_properties(tmp_path, ray_session):
    """A-ES correctness: weight-proportional inclusion, deterministic
    (content-derived priorities), NULL / non-positive weights excluded,
    k > n degrades to all qualifying rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.sampling import weighted_priority_sample

    n = 400
    # docs 0..199 weight 1, docs 200..399 weight 2000 (heavy)
    ids = list(range(n)) + [n, n + 1, n + 2]
    w = [1] * 200 + [2000] * 200 + [0, -5, None]
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "n_chars": pa.array(w, pa.int64())}),
        tmp_path / "documents.parquet",
    )
    p = str(tmp_path / "documents.parquet")
    got = weighted_priority_sample(p, k=50)
    assert len(got) == 50
    # excluded rows never sampled
    assert not set(got["doc_id"]).intersection({n, n + 1, n + 2})
    # 2000:1 weights -> heavy docs dominate any reasonable draw
    heavy = (got["doc_id"] >= 200).sum()
    assert heavy >= 45
    # deterministic: same input -> identical frame
    again = weighted_priority_sample(p, k=50)
    assert got.equals(again)
    # k > qualifying rows -> all 400, still sorted by priority
    allrows = weighted_priority_sample(p, k=1000)
    assert len(allrows) == 400
    assert (allrows["pri"].to_numpy()[:-1] >= allrows["pri"].to_numpy()[1:]).all()


def test_bigram_pmi_crafted(tmp_path, ray_session):
    """Hand-computable PMI: the always-adjacent pair beats the frequent
    pair; min_count excludes singletons; row-boundary pairs never form."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import bigram_pmi_top

    # corpus (V small): rows [7,8] x4  -> (7,8) always together;
    # [1,2] x4 and [1,3],[2,4],[3,4],[4,1] spread 1..4 everywhere;
    # [5] alone (no bigram); one (9,9) singleton pair (excluded at min 2)
    rows = [[7, 8]] * 4 + [[1, 2]] * 4 + [[1, 3], [2, 4], [3, 4], [4, 1], [5], [9, 9]]
    pq.write_table(
        pa.table({"tokens": pa.array(rows, pa.list_(pa.int32()))}),
        tmp_path / "seq.parquet",
    )
    got = bigram_pmi_top(str(tmp_path / "seq.parquet"), k=10, min_count=2, vocab_size=16).to_pandas()
    # singleton (9,9) excluded; (5,*) never formed
    assert not ((got["t1"] == 9) & (got["t2"] == 9)).any()
    # totals: unigrams = 4*2 + 4*2 + 4*2 + 1 + 2 = 27; bigrams = 4+4+4+1 = 13
    nuni, nbi = 27, 13
    def pmi(cxy, cx, cy):
        return math.log((cxy / nbi) / ((cx / nuni) * (cy / nuni)))
    # (7,8): cnt 4, c7 = c8 = 4  -> the exclusive pair
    top = got.iloc[0]
    assert (int(top["t1"]), int(top["t2"])) == (7, 8)
    assert abs(float(top["pmi"]) - pmi(4, 4, 4)) < 1e-12
    # (1,2): cnt 4 but c1 = 6 (4x[1,2] + [1,3] + [4,1]), c2 = 5
    # (4x[1,2] + [2,4]) -> lower pmi than the exclusive (7,8)
    r12 = got[(got["t1"] == 1) & (got["t2"] == 2)].iloc[0]
    assert abs(float(r12["pmi"]) - pmi(4, 6, 5)) < 1e-12
    assert float(r12["pmi"]) < float(top["pmi"])


def test_token_position_entropy_crafted(tmp_path, ray_session):
    """Position 0 pinned to one token -> entropy 0 in bucket 0 (with
    bucket_len=1); later position uniform over 4 tokens -> ln(4);
    invalid ids excluded; bucket grouping by position//bucket_len."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import token_position_entropy

    rows = [[7, 1], [7, 2], [7, 3], [7, 4], [7, 99999]]  # 99999 invalid (V=16 below... use V=100)
    pq.write_table(
        pa.table({"tokens": pa.array(rows, pa.list_(pa.int32()))}),
        tmp_path / "seq.parquet",
    )
    got = token_position_entropy(str(tmp_path / "seq.parquet"), bucket_len=1, vocab_size=100)
    got = got.set_index("bucket")
    assert int(got.loc[0, "n"]) == 5 and int(got.loc[0, "n_distinct"]) == 1
    assert float(got.loc[0, "entropy"]) == 0.0
    # position 1: tokens 1..4 uniform (the 99999 excluded) -> ln(4)
    assert int(got.loc[1, "n"]) == 4 and int(got.loc[1, "n_distinct"]) == 4
    assert abs(float(got.loc[1, "entropy"]) - math.log(4)) < 1e-12
    # bucket_len=2 folds both positions into bucket 0
    folded = token_position_entropy(str(tmp_path / "seq.parquet"), bucket_len=2, vocab_size=100)
    assert folded["bucket"].tolist() == [0]
    assert int(folded.loc[0, "n"]) == 9


def test_zipf_fit_crafted(tmp_path, ray_session):
    """Slope matches an independent OLS (np.polyfit) on the ln-ln points
    and is steeply negative for the geometric count profile; a single-type
    source has a degenerate design matrix and reports 0; NULL source keys
    '<NULL>'."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.validation import zipf_fit_by_source

    # source a: token 1 x8, token 2 x4, token 3 x2, token 4 x1
    toks_a = [1] * 8 + [2] * 4 + [3] * 2 + [4]
    rows = [toks_a, [5] * 6]  # source b: single type
    pq.write_table(
        pa.table(
            {
                "source": pa.array(["a", None], pa.string()),
                "tokens": pa.array(rows, pa.list_(pa.int32())),
            }
        ),
        tmp_path / "seq.parquet",
    )
    got = zipf_fit_by_source(str(tmp_path / "seq.parquet"), vocab_size=100).set_index("source")
    a = got.loc["a"]
    assert int(a["n_types"]) == 4 and int(a["n_tokens"]) == 15
    x = np.log(np.arange(1, 5, dtype=np.float64))
    y = np.log(np.array([8.0, 4.0, 2.0, 1.0]))
    slope_ref = float(np.polyfit(x, y, 1)[0])
    assert abs(float(a["slope"]) - slope_ref) < 1e-10
    assert float(a["slope"]) < -0.9  # steeply Zipfian
    b = got.loc["<NULL>"]
    assert int(b["n_types"]) == 1
    assert float(b["slope"]) == 0.0 and float(b["intercept"]) == 0.0


def test_weighted_sample_by_group_properties(tmp_path, ray_session):
    """Exactly k per group (fewer when the stratum is smaller); the
    batch-boundary cut never loses a global winner; NULL group keys
    '<NULL>'."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.sampling import (
        weighted_priority_sample_by_group,
        weighted_priority_sample,
    )

    ids = list(range(300))
    src = ["a"] * 150 + ["b"] * 145 + [None] * 3 + ["tiny"] * 2
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "source": pa.array(src, pa.string()),
                "n_chars": pa.array([10] * 300, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    p = str(tmp_path / "documents.parquet")
    got = weighted_priority_sample_by_group(p, k=5)
    sizes = got.groupby("source").size().to_dict()
    assert sizes == {"a": 5, "b": 5, "<NULL>": 3, "tiny": 2}
    # uniform weights degenerate to the unweighted hash draw: group 'a's
    # members must equal the global A-ES top-5 restricted to a
    solo = weighted_priority_sample(p, k=300)
    a_top = solo[solo["doc_id"] < 150].head(5)["doc_id"].tolist()
    assert sorted(got[got["source"] == "a"]["doc_id"]) == sorted(a_top)
