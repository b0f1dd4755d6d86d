"""Training-data-prep operator tests (pipelines/training.py): packing
prefix-sum invariants, contamination vs a brute-force reference,
LM-frequency scores vs DuckDB, and PII scrubbing vs the identical RE2
regexes run by DuckDB on a crafted fixture (the synthetic corpus contains
no PII, so the gated queries can't exercise the scrubber — this parity
test is its oracle)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hepdata_validator_ray.pipelines import training

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


@pytest.fixture(scope="module")
def docs_df():
    return pq.read_table(DOCS, columns=["doc_id", "text"]).to_pandas()


def test_sequence_packing_prefix_sum(ray_session, docs_df):
    out = training.sequence_packing(DOCS, ctx_len=128).to_pandas().sort_values("doc_id")
    # global invariant: tok_start is the exclusive prefix sum in doc_id order
    n = docs_df.sort_values("doc_id")["text"].str.split(" ").str.len().to_numpy()
    expect_start = np.concatenate(([0], np.cumsum(n[:-1])))
    assert (out["tok_start"].to_numpy() == expect_start).all()
    assert (out["n_tokens"].to_numpy() == n).all()
    assert (out["pack_first"] == out["tok_start"] // 128).all()
    last = out["tok_start"] + np.maximum(out["n_tokens"], 1) - 1
    assert (out["pack_last"] == last // 128).all()
    assert (out["n_packs"] == out["pack_last"] - out["pack_first"] + 1).all()


def test_sequence_packing_bucket_boundaries(ray_session, docs_df):
    """Forcing many tiny buckets exercises the cross-bucket offset math."""
    out = (
        training.sequence_packing(DOCS, ctx_len=64, num_buckets=17)
        .to_pandas()
        .sort_values("doc_id")
    )
    n = docs_df.sort_values("doc_id")["text"].str.split(" ").str.len().to_numpy()
    assert (out["tok_start"].to_numpy() == np.concatenate(([0], np.cumsum(n[:-1])))).all()


def _ref_shingles(text: str, k: int = 3) -> set:
    ws = text.split(" ")
    if not ws:
        return set()
    if len(ws) < k:
        return {" ".join(ws)}
    return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}


def test_contamination_vs_bruteforce(ray_session, docs_df):
    out = (
        training.contamination_flags(DOCS, k=3, eval_mod=97)
        .to_pandas()
        .set_index("doc_id")["contam_hits"]
    )
    ev = set()
    for _, r in docs_df[docs_df["doc_id"] % 97 == 0].iterrows():
        ev |= _ref_shingles(r["text"])
    for _, r in docs_df.iterrows():
        expect = len(_ref_shingles(r["text"]) & ev)
        assert out[r["doc_id"]] == expect, r["doc_id"]


def test_eval_shingle_set_sorted_unique(ray_session):
    ev = training.eval_shingle_set(DOCS, k=3, eval_mod=97)
    assert ev.dtype == np.uint64
    assert (np.diff(ev.astype(np.int64) if False else ev) > 0).all()  # strictly increasing


def test_lm_frequency_scores_vs_duckdb(ray_session):
    out = training.lm_frequency_scores(DOCS).to_pandas().sort_values("doc_id")
    con = duckdb.connect()
    ref = con.execute(
        f"""
        WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                   FROM read_parquet('{DOCS}')),
        c AS (SELECT word, count(*)::BIGINT AS c FROM w GROUP BY word)
        SELECT w.doc_id, SUM(c.c)::BIGINT AS lm_freq_sum, count(*)::BIGINT AS n_tokens
        FROM w JOIN c USING (word) GROUP BY w.doc_id ORDER BY doc_id
        """
    ).df()
    assert (out["lm_freq_sum"].to_numpy() == ref["lm_freq_sum"].to_numpy()).all()
    assert (out["n_tokens"].to_numpy() == ref["n_tokens"].to_numpy()).all()


PII_DOCS = [
    "contact me at alice.smith+spam@example.co.uk for details",
    "see https://example.com/path?q=1#frag and http://a.b/c now",
    "call +1 (415) 555-0199 or +44 20 7946 0958 today",
    "mixed: bob@test.org visits https://x.io/u@name then dials +33123456789",
    "clean text with no pii at all",
    "edge@case.io",  # whole doc is one email
]


def test_pii_scrub_duckdb_parity(ray_session, tmp_path):
    """The scrubber's counts must match DuckDB running the IDENTICAL RE2
    patterns — regex-parity in the BPE_PATTERN tradition."""
    p = str(tmp_path / "pii.parquet")
    pq.write_table(
        pa.table({"doc_id": list(range(len(PII_DOCS))), "text": PII_DOCS}), p
    )
    out = training.pii_scrub(p).to_pandas().sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    url, email, phone = (
        training.URL_PATTERN,
        training.EMAIL_PATTERN,
        training.PHONE_PATTERN,
    )
    ref = con.execute(
        f"""
        WITH s0 AS (SELECT doc_id, text FROM read_parquet('{p}')),
        s1 AS (SELECT doc_id, len(regexp_extract_all(text, '{url}'))::BIGINT AS n_urls,
                      regexp_replace(text, '{url}', '<URL>', 'g') AS t FROM s0),
        s2 AS (SELECT doc_id, n_urls,
                      len(regexp_extract_all(t, '{email}'))::BIGINT AS n_emails,
                      regexp_replace(t, '{email}', '<EMAIL>', 'g') AS t FROM s1),
        s3 AS (SELECT doc_id, n_urls, n_emails,
                      len(regexp_extract_all(t, '{phone}'))::BIGINT AS n_phones,
                      regexp_replace(t, '{phone}', '<PHONE>', 'g') AS t FROM s2)
        SELECT doc_id, n_urls, n_emails, n_phones, t AS text_clean
        FROM s3 ORDER BY doc_id
        """
    ).df()
    assert (out["n_urls"].to_numpy() == ref["n_urls"].to_numpy()).all()
    assert (out["n_emails"].to_numpy() == ref["n_emails"].to_numpy()).all()
    assert (out["n_phones"].to_numpy() == ref["n_phones"].to_numpy()).all()
    assert list(out["text_clean"]) == list(ref["text_clean"])


def test_pii_scrub_counts(ray_session, tmp_path):
    p = str(tmp_path / "pii2.parquet")
    pq.write_table(pa.table({"doc_id": list(range(len(PII_DOCS))), "text": PII_DOCS}), p)
    out = training.pii_scrub(p).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_emails"] == 1 and out.loc[0, "n_urls"] == 0
    assert out.loc[1, "n_urls"] == 2
    assert out.loc[2, "n_phones"] == 2
    assert out.loc[4, "n_redacted_chars"] == 0
    assert out.loc[4, "text_clean"] == PII_DOCS[4]
    assert out.loc[5, "text_clean"] == "<EMAIL>"


def test_token_counts_fused_matches_singles(ray_session):
    from hepdata_validator_ray.pipelines import text as t

    fused = t.token_counts(DOCS).to_pandas().sort_values("doc_id").reset_index(drop=True)
    ws = t.token_count_ws(DOCS).to_pandas().sort_values("doc_id").reset_index(drop=True)
    bpe = t.bpe_token_count(DOCS).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (fused["n_ws_tokens"] == ws["n_ws_tokens"]).all()
    assert (fused["n_bpe_tokens"] == bpe["n_bpe_tokens"]).all()


def test_rag_chunk_spans_duckdb_parity(ray_session):
    """Sliding-window chunker vs the same semantics in DuckDB SQL
    (generate the k range as a list, unnest) — full-frame equality."""
    got = (
        training.rag_chunk_spans(DOCS, chunk=64, stride=48)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH w AS (
          SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n
          FROM read_parquet('{DOCS}')
        ),
        k AS (
          SELECT doc_id, n,
                 CASE WHEN n <= 64 THEN 0 ELSE (n - 64 + 47) // 48 END AS kmax
          FROM w
        ),
        e AS (SELECT doc_id, n, unnest(range(0, kmax + 1)) AS chunk_idx FROM k)
        SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
               (chunk_idx * 48)::BIGINT AS w_start,
               least(chunk_idx * 48 + 64, n)::BIGINT AS w_end
        FROM e ORDER BY doc_id, chunk_idx
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rag_chunk_spans_cover_and_overlap(ray_session, docs_df):
    """Every word is covered; consecutive chunks overlap by chunk-stride
    except possibly the clipped last chunk."""
    out = training.rag_chunk_spans(DOCS, chunk=32, stride=24).to_pandas()
    n = docs_df.set_index("doc_id")["text"].str.split(" ").str.len()
    for doc_id, g in out.groupby("doc_id"):
        g = g.sort_values("chunk_idx")
        assert g["w_start"].iloc[0] == 0
        assert g["w_end"].iloc[-1] == n.loc[doc_id]
        assert (g["w_end"] - g["w_start"] <= 32).all()
        # no gaps: each chunk starts inside (or at the end of) the previous
        assert (g["w_start"].iloc[1:].to_numpy() <= g["w_end"].iloc[:-1].to_numpy()).all()


def test_chunk_counts_match_spans(ray_session):
    spans = training.rag_chunk_spans(DOCS, chunk=64, stride=48).to_pandas()
    counts = training.chunk_counts(DOCS, chunk=64, stride=48).to_pandas()
    per_doc = spans.groupby("doc_id").size()
    merged = counts.set_index("doc_id")["n_chunks"]
    assert (per_doc.sort_index() == merged.sort_index()).all()


def test_chunk_validation():
    with pytest.raises(ValueError):
        training.rag_chunk_spans(DOCS, chunk=0)
    with pytest.raises(ValueError):
        training.chunk_counts(DOCS, stride=0)


def test_unigram_vocab_exact_with_high_uint64_keys(ray_session, tmp_path):
    """Regression: the vocab exchange ships word-hash keys as int64 bit
    views.  uint64 keys above 2^63 used to overflow Ray's reduce-side
    block build and silently fall back to pickled-object blocks; this
    pins exact (hash, count) parity against a driver-side numpy pass,
    including at least one key above 2^63."""
    from hepdata_validator_ray.pipelines.dedup import _word_hashes
    from hepdata_validator_ray.pipelines.training import _LM_KEY

    rng = np.random.default_rng(11)
    words = [f"tok{i}" for i in range(200)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(3, 30)))
        for _ in range(400)
    ]
    p = tmp_path / "documents.parquet"
    pq.write_table(
        pa.table({"doc_id": np.arange(400, dtype=np.int64), "text": texts}), p
    )

    vocab = training.unigram_counts(str(p))
    # driver-side ground truth from the same hash kernel
    wh, _ = _word_hashes(pd.Series(texts), _LM_KEY)
    exp_h, exp_c = np.unique(wh, return_counts=True)

    assert vocab["wh"].dtype == np.uint64
    got = vocab.sort_values("wh").reset_index(drop=True)
    np.testing.assert_array_equal(got["wh"].to_numpy(), exp_h)
    np.testing.assert_array_equal(got["c"].to_numpy(), exp_c)
    # the regression only bites above 2^63 — make sure we exercised it
    assert (exp_h > np.uint64(1) << np.uint64(63)).any()
    # sorted ascending in uint64 order (searchsorted contract downstream)
    assert (np.diff(got["wh"].to_numpy().astype(np.uint64)) > 0).all()


def test_quality_buckets_duckdb_parity():
    """CCNet-style quality buckets: exact integer math — per-doc assignment
    and the 3-row summary both match the DuckDB twin at sf0.001."""
    import duckdb

    d = "/root/testdata/sf0.001/documents.parquet"
    asg = (
        training.quality_bucket_assignments(d)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}')")
    exp = con.execute(
        """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
wx AS (SELECT doc_id, unnest(ws) AS word FROM w),
wc AS (SELECT word, count(*)::BIGINT AS c FROM wx GROUP BY word),
sc AS (SELECT wx.doc_id, sum(wc.c)::HUGEINT AS lm, count(*)::HUGEINT AS nt
       FROM wx JOIN wc USING (word) GROUP BY wx.doc_id),
m AS (SELECT (sum(lm)*1000)//sum(nt) AS mx FROM sc)
SELECT doc_id, ((lm*1000)//nt)::BIGINT AS fx,
       CASE WHEN (lm*1000)//nt >= (102*(SELECT mx FROM m))//100 THEN 2
            WHEN (lm*1000)//nt < (98*(SELECT mx FROM m))//100 THEN 0
            ELSE 1 END::BIGINT AS bucket
FROM sc ORDER BY doc_id
"""
    ).df()
    pd.testing.assert_frame_equal(asg.astype("int64"), exp.astype("int64"))
    # summary consistency: counts per bucket match the assignment
    cnt = training.quality_bucket_counts(d).to_pandas().set_index("bucket")["n"]
    vc = asg["bucket"].value_counts()
    for b, n in vc.items():
        assert cnt.loc[b] == n


def test_quality_buckets_zero_word_docs_excluded(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = tmp_path / "documents.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": np.arange(4, dtype=np.int64),
                "text": ["common common", "common rare", None, "common"],
            }
        ),
        p,
    )
    asg = training.quality_bucket_assignments(str(p)).to_pandas()
    # the null-text doc contributes no words: excluded (matches SQL unnest)
    assert set(asg["doc_id"]) == {0, 1, 3}
    assert set(asg["bucket"]) <= {0, 1, 2}


def test_mlm_mask_partition_invariant_and_rate(ray_session):
    """The integer mask rule must select the same tokens at any batch
    split, and the global rate must sit near 15%."""
    from hepdata_validator_ray.pipelines.training import mlm_mask_stats
    from hepdata_validator_ray.synth import ensure_sequences_parquet

    p = ensure_sequences_parquet("/root/testdata/sf0.001")
    a = mlm_mask_stats(p).to_pandas().sort_values("doc_id").reset_index(drop=True)
    import ray as _ray

    b = (
        _ray.data.read_parquet(p, override_num_blocks=3)
        .map_batches(lambda t: t, batch_format="pyarrow")
        .write_parquet("/tmp/hvr_mlm_reblocked", mode="overwrite")
    )
    c = mlm_mask_stats("/tmp/hvr_mlm_reblocked").to_pandas().sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, c)
    rate = a["n_masked"].sum() / a["n_tok"].sum()
    assert 0.12 < rate < 0.18
    # nothing masked => first_masked == -1; something masked => in range
    masked = a[a["n_masked"] > 0]
    assert (masked["first_masked"] >= 0).all()
    assert (a.loc[a["n_masked"] == 0, "first_masked"] == -1).all()
