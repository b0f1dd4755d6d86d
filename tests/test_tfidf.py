"""TF-IDF top-term operator (pipelines/text.py) — DuckDB parity + kernel edge cases."""

import duckdb
import numpy as np
import pandas as pd

from hepdata_validator_ray.pipelines import text

DOCS = "/root/testdata/sf0.001/documents.parquet"

_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
wx AS (SELECT doc_id, unnest(ws) AS word FROM w),
tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf FROM wx GROUP BY doc_id, word),
df AS (SELECT word, count(DISTINCT doc_id)::BIGINT AS df FROM wx GROUP BY word),
nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
sc AS (
  SELECT tf.doc_id, tf.word, tf.tf, df.df,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * ln((SELECT n FROM nn) / df.df) DESC, tf.word) AS rk
  FROM tf JOIN df USING (word)
)
SELECT doc_id, word AS top_term, tf AS top_tf, df AS top_df FROM sc WHERE rk = 1 ORDER BY doc_id
"""


def test_tfidf_top_terms_duckdb_parity():
    got = text.tfidf_top_terms(DOCS).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    exp = con.execute(_SQL).df()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got.astype({"top_tf": "int64", "top_df": "int64"}),
        exp.astype({"top_tf": "int64", "top_df": "int64"}),
    )


def test_doc_frequencies_vocabulary_sized():
    wh, df, n = text.doc_frequencies(DOCS)
    assert n == 500
    assert (np.diff(wh.view(np.uint64).astype(object)) > 0).all()  # sorted, unique
    assert df.min() >= 1 and df.max() <= n


def test_tfidf_stage_tie_breaks_on_word():
    """Two terms with identical (tf, df) tie on score; the lexicographically
    smaller term must win — matching the SQL ORDER BY ... DESC, word."""
    wh = np.array([], dtype=np.uint64)
    stage = text.TfIdfTopStage.__new__(text.TfIdfTopStage)
    stage.wh = wh
    stage.df = np.array([], dtype=np.int64)
    stage.n = 10
    pdf = pd.DataFrame({"doc_id": [1], "text": ["zeta alpha"]})
    out = stage(pdf)
    assert out["top_term"].tolist() == ["alpha"]
    assert out["top_tf"].tolist() == [1]
    # unseen words fall back to df=1 (they are always in the corpus table in
    # the two-pass pipeline; the fallback guards crafted/unit inputs)
    assert out["top_df"].tolist() == [1]


def test_tfidf_rare_term_wins_over_common():
    texts = ["common rare", "common common filler", "common filler other"]
    pdf = pd.DataFrame({"doc_id": [0, 1, 2], "text": texts})
    flatwords = [w for t in texts for w in t.split(" ")]
    # build the stage state the way doc_frequencies would
    words = sorted(set(flatwords))
    df_counts = {w: sum(w in t.split(" ") for t in texts) for w in words}
    harr = pd.util.hash_array(np.array(words, dtype=object), hash_key=text._TFIDF_KEY)
    order = np.argsort(harr)
    stage = text.TfIdfTopStage.__new__(text.TfIdfTopStage)
    stage.wh = harr[order]
    stage.df = np.array([df_counts[words[i]] for i in order], dtype=np.int64)
    stage.n = len(texts)
    out = stage(pdf).set_index("doc_id")
    assert out.loc[0, "top_term"] == "rare"  # df=1 beats df=3
    # 'common' has df=N so idf=0; 'filler' (tf=1, df=2) scores higher
    assert out.loc[1, "top_term"] == "filler"
    assert out.loc[2, "top_term"] == "other"  # df=1 wins in doc 2


def test_cooccurrence_boundary_and_window(ray_session, tmp_path):
    """Crafted: pairs never straddle documents; distance ≤ 2 only;
    canonical (min,max) ordering."""
    import pandas as pd
    import ray as _ray
    from hepdata_validator_ray.pipelines.text import word_cooccurrence_top

    p = str(tmp_path / "docs.parquet")
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["b a c b", "z", None],
        }
    ).to_parquet(p)
    out = (
        word_cooccurrence_top(p, max_dist=2, k=100)
        .to_pandas()
        .set_index(["w1", "w2"])["n"]
        .to_dict()
    )
    # doc1 pairs: d1: (b,a),(a,c),(c,b); d2: (b,c),(a,b) -> canonical counts
    assert out == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 2}


def test_source_overlap_bitmask_semantics(ray_session, tmp_path):
    """Crafted: shingle shared across 3 sources counts toward all 3
    pairs; a within-source repeat counts once; no cross-doc shingles."""
    import pandas as pd
    from hepdata_validator_ray.pipelines.text import source_overlap_matrix

    p = str(tmp_path / "docs.parquet")
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "source": ["s1", "s2", "s3", "s1", "s2"],
            "text": [
                "x y z tail1",     # s1 has 'x y z'
                "x y z tail2",     # s2 has 'x y z'
                "x y z tail3",     # s3 has 'x y z'
                "x y z again",     # s1 repeat -> still one distinct shingle
                "a b",             # too short for a 3-gram
            ],
        }
    ).to_parquet(p)
    out = source_overlap_matrix(p).set_index(["src_a", "src_b"])["n_shared"].to_dict()
    assert out == {("s1", "s2"): 1, ("s1", "s3"): 1, ("s2", "s3"): 1}
