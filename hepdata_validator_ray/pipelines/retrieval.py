"""BM25 bag-of-words retrieval over the documents table.

Two streamed passes, no shuffle:

1. **stats pass** — per batch, one partial row: corpus size, total word
   count, and per-query-term document frequency.  The driver reduces
   O(n_batches) tiny rows and broadcasts (N, avgdl, df[t]).
2. **score pass** — per batch: term-frequency matrix for the query terms
   (direct string equality on the exploded word buffer — a handful of
   terms, no hashing, no collision risk), BM25 scores, and a per-batch
   partial top-k.  The driver merges only n_batches x k candidate rows.

The float BM25 score orders candidates but never leaves the engine: the
output is integer-only (rank, doc_id, dl, tf_total), so the DuckDB oracle
is hash-exact under the same transcendental-tie argument as
``text.tfidf_top_terms`` — the score expression is generated with ONE
parenthesization (term contributions accumulated left-to-right in sorted
term order) evaluated identically by numpy and the SQL, exact ties are
only possible between identical (tf-vector, dl) inputs (both engines then
agree and break on doc_id), and near-ties between different inputs would
need a transcendental coincidence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

BM25_K1 = 1.2
BM25_B = 0.75


def _term_tfs(texts: pd.Series, terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(dl, tf) for a batch: dl = single-space word count per row (DuckDB
    ``len(string_split(text, ' '))`` parity; null text -> 0), tf = per-row
    frequency of each query term, all vectorized over the exploded buffer."""
    from hepdata_validator_ray.pipelines.text import _explode_words, _segment_sum

    words = texts.str.split(" ")
    flat, offs = _explode_words(words)
    dl = np.diff(offs)
    tf = np.zeros((len(dl), len(terms)), dtype=np.int64)
    if len(flat):
        for j, t in enumerate(terms):
            tf[:, j] = _segment_sum((flat == t), offs)
    return dl, tf


def bm25_corpus_stats(docs_path: str, terms: list[str]) -> tuple[int, int, np.ndarray]:
    """(n_docs, sum_dl, df-per-term) — one streamed pass, one tiny partial
    row per batch, driver reduces O(n_batches) rows."""
    terms = list(terms)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dl, tf = _term_tfs(df["text"], terms)
        row = {"n": len(df), "sum_dl": int(dl.sum())}
        for j in range(len(terms)):
            row[f"df_{j}"] = int((tf[:, j] > 0).sum())
        return pd.DataFrame([row])

    parts = (
        ray.data.read_parquet(docs_path, columns=["text"])
        .map_batches(partial, batch_format="pandas", batch_size=8192)
        .to_pandas()
    )
    if not len(parts) or "n" not in parts.columns:  # empty corpus → no partials
        return 0, 0, np.zeros(len(terms), dtype=np.int64)
    df_t = np.array([int(parts[f"df_{j}"].sum()) for j in range(len(terms))], dtype=np.int64)
    return int(parts["n"].sum()), int(parts["sum_dl"].sum()), df_t


def bm25_topk(
    docs_path: str,
    terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> pd.DataFrame:
    """Top-k documents by BM25 (Lucene idf variant, ln(1 + (N-df+0.5)/(df+0.5)))
    for a bag of query terms; ties break on doc_id ascending.  Output
    (rank, doc_id, dl, tf_total) carries no floats."""
    terms = sorted(terms)  # fixed accumulation order, mirrored in the SQL
    n_docs, sum_dl, df_t = bm25_corpus_stats(docs_path, terms)
    if n_docs == 0:
        return pd.DataFrame(columns=["rank", "doc_id", "dl", "tf_total"]).astype(
            {"rank": "int64", "doc_id": "int64", "dl": "int64", "tf_total": "int64"}
        )
    avgdl = float(sum_dl) / float(n_docs)
    idf = np.array(
        [np.log(1.0 + (n_docs - d + 0.5) / (d + 0.5)) for d in df_t], dtype=np.float64
    )
    ref = ray.put((terms, idf, avgdl))

    # stateless TASKS, not an actor pool: the broadcast state is a tuple of
    # tiny arrays resolved by one local object-store get per batch, and a
    # query-time operator shouldn't pay actor spin-up (~1s) per call
    def score_partial(df: pd.DataFrame) -> pd.DataFrame:
        q_terms, q_idf, q_avgdl = ray.get(ref)
        dl, tf = _term_tfs(df["text"], q_terms)
        dlf = dl.astype(np.float64)
        score = np.zeros(len(dl), dtype=np.float64)
        # left-to-right accumulation in sorted term order — the SQL
        # oracle writes the identical explicit sum
        for j in range(len(q_terms)):
            tfj = tf[:, j].astype(np.float64)
            score = score + (q_idf[j] * tfj) / (
                tfj + k1 * ((1.0 - b) + b * (dlf / q_avgdl))
            )
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "dl": dl.astype("int64"),
                "tf_total": tf.sum(axis=1).astype("int64"),
                "score": score,
            }
        )
        kk = min(k, len(out))
        return out.sort_values(["score", "doc_id"], ascending=[False, True]).head(kk)

    partials = (
        ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
        .map_batches(score_partial, batch_format="pandas", batch_size=8192)
        .to_pandas()
    )
    out = (
        partials.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out[["rank", "doc_id", "dl", "tf_total"]].astype(
        {"rank": "int64", "doc_id": "int64", "dl": "int64", "tf_total": "int64"}
    )


def _bm25_scored_cte(terms: list[str], k1: float = BM25_K1, b: float = BM25_B) -> str:
    """The generated WITH-block computing per-doc (dl, tf_total, score)
    with the same parenthesization and term order the Ray kernel
    accumulates in — shared by the top-k oracle and the RRF fusion twin."""
    terms = sorted(terms)
    # coalesce: string_split(NULL) is NULL in SQL but the Ray kernel treats
    # null text as an empty word list (dl=0, tf=0, score exactly 0.0)
    tf_cols = ",\n       ".join(
        f"coalesce(len(list_filter(ws, x -> x = '{t}')), 0)::BIGINT AS tf_{j}"
        for j, t in enumerate(terms)
    )
    df_cols = ",\n       ".join(
        f"sum(CASE WHEN tf_{j} > 0 THEN 1 ELSE 0 END)::BIGINT AS df_{j}"
        for j in range(len(terms))
    )
    # 0.5::DOUBLE forces DOUBLE (not DECIMAL) arithmetic so every division
    # is IEEE double division, bit-matching the numpy kernel
    score_terms = " + ".join(
        f"(ln(1 + (s.n - s.df_{j} + 0.5::DOUBLE) / (s.df_{j} + 0.5::DOUBLE)) * d.tf_{j}"
        f" / (d.tf_{j} + {k1} * ((1 - {b}) + {b} * (d.dl / (s.sum_dl / s.n)))))"
        for j in range(len(terms))
    )
    tf_total = " + ".join(f"d.tf_{j}" for j in range(len(terms)))
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
d AS (
  SELECT doc_id, coalesce(len(ws), 0)::BIGINT AS dl,
       {tf_cols}
  FROM w
),
s AS (
  SELECT count(*)::BIGINT AS n, sum(dl)::DOUBLE AS sum_dl,
       {df_cols}
  FROM d
),
scored AS (
  SELECT d.doc_id, d.dl, ({tf_total})::BIGINT AS tf_total,
         {score_terms} AS score
  FROM d, s
)"""


def bm25_oracle_sql(terms: list[str], k: int = 10, k1: float = BM25_K1, b: float = BM25_B) -> str:
    """DuckDB SQL computing the identical BM25 top-k — the score expression
    is generated with the same parenthesization and term order the Ray
    kernel accumulates in."""
    return f"""{_bm25_scored_cte(terms, k1, b)}
SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
       doc_id, dl, tf_total
FROM scored ORDER BY score DESC, doc_id LIMIT {k}"""


def bm25_rrf_fusion(
    docs_path: str,
    terms: list[str],
    k: int = 10,
    k_rrf: int = 60,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> pd.DataFrame:
    """Reciprocal-rank fusion of two rankings for one term bag — BM25 and
    raw term frequency — the standard hybrid-retrieval merge:
    rrf(d) = Σ_r 1/(k_rrf + rank_r(d)) over the rankings that placed d in
    their top-k (absent rank contributes 0, reported as rank 0).  TF and
    BM25 disagree exactly where document-length normalization matters, so
    the fusion surfaces both short exact matches and long high-score docs.

    ONE corpus pass: each batch emits partial top-k under BOTH orders
    (score DESC, doc_id) and (tf_total DESC, doc_id) — 2k candidate rows
    per batch, the ANN merge discipline — and the driver re-ranks the
    bounded candidate set; each global top-k is provably inside its own
    per-batch partials.  The rrf sum adds the BM25 term then the TF term
    (two doubles, same order as the SQL twin's coalesce sum).

    Output (doc_id, r_bm25, r_tf, rrf) for the union of both top-ks."""
    terms = sorted(terms)
    n_docs, sum_dl, df_t = bm25_corpus_stats(docs_path, terms)
    if n_docs == 0:
        return pd.DataFrame(columns=["doc_id", "r_bm25", "r_tf", "rrf"]).astype(
            {"doc_id": "int64", "r_bm25": "int64", "r_tf": "int64", "rrf": "float64"}
        )
    avgdl = float(sum_dl) / float(n_docs)
    idf = np.array(
        [np.log(1.0 + (n_docs - d + 0.5) / (d + 0.5)) for d in df_t], dtype=np.float64
    )
    ref = ray.put((terms, idf, avgdl))

    def score_partial(df: pd.DataFrame) -> pd.DataFrame:
        q_terms, q_idf, q_avgdl = ray.get(ref)
        dl, tf = _term_tfs(df["text"], q_terms)
        dlf = dl.astype(np.float64)
        score = np.zeros(len(dl), dtype=np.float64)
        for j in range(len(q_terms)):
            tfj = tf[:, j].astype(np.float64)
            score = score + (q_idf[j] * tfj) / (
                tfj + k1 * ((1.0 - b) + b * (dlf / q_avgdl))
            )
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "tf_total": tf.sum(axis=1).astype("int64"),
                "score": score,
            }
        )
        kk = min(k, len(out))
        by_score = out.sort_values(["score", "doc_id"], ascending=[False, True]).head(kk)
        by_tf = out.sort_values(["tf_total", "doc_id"], ascending=[False, True]).head(kk)
        return pd.concat([by_score, by_tf], ignore_index=True).drop_duplicates("doc_id")

    cand = (
        ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
        .map_batches(score_partial, batch_format="pandas", batch_size=8192)
        .to_pandas()
        .drop_duplicates("doc_id")
    )
    top_s = cand.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
    top_t = cand.sort_values(["tf_total", "doc_id"], ascending=[False, True]).head(k)
    r_bm25 = {d: i + 1 for i, d in enumerate(top_s["doc_id"])}
    r_tf = {d: i + 1 for i, d in enumerate(top_t["doc_id"])}
    ids = sorted(set(r_bm25) | set(r_tf))
    rows = []
    for d in ids:
        a, t = r_bm25.get(d, 0), r_tf.get(d, 0)
        rrf = (1.0 / (k_rrf + a) if a else 0.0) + (1.0 / (k_rrf + t) if t else 0.0)
        rows.append({"doc_id": int(d), "r_bm25": a, "r_tf": t, "rrf": rrf})
    return pd.DataFrame(rows).astype(
        {"doc_id": "int64", "r_bm25": "int64", "r_tf": "int64", "rrf": "float64"}
    )


def bm25_rrf_oracle_sql(
    terms: list[str], k: int = 10, k_rrf: int = 60, k1: float = BM25_K1, b: float = BM25_B
) -> str:
    """Fusion twin: the shared scored CTE, both row_number rankings, FULL
    OUTER JOIN, the identical coalesce rrf sum (BM25 term first)."""
    return f"""{_bm25_scored_cte(terms, k1, b)},
r1 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS r
       FROM scored ORDER BY score DESC, doc_id LIMIT {k}),
r2 AS (SELECT doc_id, row_number() OVER (ORDER BY tf_total DESC, doc_id)::BIGINT AS r
       FROM scored ORDER BY tf_total DESC, doc_id LIMIT {k})
SELECT coalesce(r1.doc_id, r2.doc_id) AS doc_id,
       coalesce(r1.r, 0)::BIGINT AS r_bm25, coalesce(r2.r, 0)::BIGINT AS r_tf,
       coalesce(1.0 / ({k_rrf} + r1.r), 0) + coalesce(1.0 / ({k_rrf} + r2.r), 0) AS rrf
FROM r1 FULL OUTER JOIN r2 ON r1.doc_id = r2.doc_id"""


# ---------------------------------------------------------------------------
# Inverted index build (long-form posting lists)
# ---------------------------------------------------------------------------


def inverted_index(
    docs_path: str, min_df: int = 2, num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Distributed inverted-index build — the index-construction
    counterpart of ``bm25_topk``'s query side: one long-form posting row
    (word, doc_id, tf, first_pos) per distinct (term, doc) for every term
    whose document frequency >= ``min_df`` (df pruning drops hapax noise;
    first_pos is 1-based, DuckDB ``list_position`` parity).

    Physical shape: ONE pass computes per-doc term stats (pandas C groupby
    over the exploded word buffer), materialized as the distributed
    posting table; term df is then ONE vocabulary-sized exchange over that
    table (a posting row is already distinct per (term, doc), so df is a
    plain value count), and the qualifying term set — vocabulary-bounded
    by construction — broadcasts back as the final filter.  The corpus
    text is read once; nothing corpus-scale touches the driver."""
    from hepdata_validator_ray.ops import derive_num_buckets_path, grouped_value_counts
    from hepdata_validator_ray.pipelines.text import _explode_words

    if num_buckets is None:
        num_buckets = derive_num_buckets_path(docs_path)

    def stats_batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["text"].notna()]
        flat, offs = _explode_words(df["text"].str.split(" "))
        lens = np.diff(offs)
        row = np.repeat(np.arange(len(df), dtype=np.int64), lens)
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offs[:-1], lens) + 1
        g = (
            pd.DataFrame({"row": row, "word": flat, "pos": pos})
            .groupby(["row", "word"], sort=False)
            .agg(tf=("pos", "size"), first_pos=("pos", "min"))
            .reset_index()
        )
        return pd.DataFrame(
            {
                "word": g["word"],
                "doc_id": df["doc_id"].to_numpy()[g["row"].to_numpy()].astype(np.int64),
                "tf": g["tf"].astype("int64"),
                "first_pos": g["first_pos"].astype("int64"),
            }
        )

    postings = (
        ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
        .map_batches(stats_batch, batch_format="pandas", batch_size=4096)
        .materialize()  # feeds the df exchange AND the final filter
    )
    dfs = grouped_value_counts(
        postings.select_columns(["word"]), "word", min_count=min_df, num_buckets=num_buckets
    ).to_pandas()  # vocabulary-bounded
    # membership travels as SORTED siphash keys: uint64 searchsorted is
    # ~20x cheaper per batch than object-array isin at a 50k-term
    # vocabulary, and the string itself never needs to match — a 2^-64
    # collision only lets a sub-min_df posting row through
    _KEY = "hvr-invidx-key-0"
    if len(dfs):
        terms_h = np.sort(
            pd.util.hash_array(dfs["word"].to_numpy(dtype=object), hash_key=_KEY, categorize=False)
        )
    else:
        terms_h = np.empty(0, dtype=np.uint64)
    terms_ref = ray.put(terms_h)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(terms_ref)
        if not len(t):
            return df.iloc[0:0]
        h = pd.util.hash_array(df["word"].to_numpy(dtype=object), hash_key=_KEY, categorize=False)
        pos = np.searchsorted(t, h)
        pos[pos == len(t)] = 0
        return df[t[pos] == h]

    return postings.map_batches(keep, batch_format="pandas", batch_size=65536)


def prf_expansion_terms(
    docs_path: str,
    terms: list[str],
    k: int = 10,
    m: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> pd.DataFrame:
    """Pseudo-relevance-feedback query expansion (the Rocchio move): take
    the BM25 top-k for the query bag, then rank every word those feedback
    docs contain by prf_score = tf_fb(w) · ln(N / df(w)) — frequent in
    the feedback set, rare in the corpus ⇒ a good expansion term.  The
    original query terms are excluded (mirrored NOT IN); candidate words
    have df ≥ 1 by construction (they occur in a feedback doc), so the
    idf is total.

    Four streamed passes, NO shuffle, every driver table bounded: BM25's
    stats + score passes (bm25_topk), a feedback-TF pass (the k doc ids
    broadcast via ray.put; partials bounded by the feedback vocabulary),
    and a candidate-df pass (the candidate vocab broadcast once; per-row
    distinct hits via the packed row·C+code unique — never a |corpus|
    × |vocab| matrix).  Score ties: identical (tf_fb, df) pairs agree on
    both engines and break on word; distinct inputs near-tying would
    need a transcendental coincidence (the bm25/tfidf argument).

    Output (rank, word, tf_fb, df, prf_score), top-m by
    (prf_score DESC, word)."""
    from hepdata_validator_ray.pipelines.text import _explode_words

    terms = sorted(terms)
    fb = bm25_topk(docs_path, terms, k=k, k1=k1, b=b)
    empty = pd.DataFrame(
        {
            "rank": pd.Series(dtype="int64"),
            "word": pd.Series(dtype="object"),
            "tf_fb": pd.Series(dtype="int64"),
            "df": pd.Series(dtype="int64"),
            "prf_score": pd.Series(dtype="float64"),
        }
    )
    if not len(fb):
        return empty
    fb_ref = ray.put(fb["doc_id"].to_numpy(np.int64))

    def fb_tf_partial(df_b: pd.DataFrame) -> pd.DataFrame:
        ids = ray.get(fb_ref)
        sel = df_b[df_b["doc_id"].isin(ids) & df_b["text"].notna()]
        if not len(sel):
            return pd.DataFrame({"word": pd.Series(dtype="object"), "cnt": pd.Series(dtype="int64")})
        flat, _ = _explode_words(sel["text"].str.split(" "))
        u, c = np.unique(flat, return_counts=True)
        return pd.DataFrame({"word": u, "cnt": c.astype(np.int64)})

    tf_fb = (
        ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
        .map_batches(fb_tf_partial, batch_format="pandas", batch_size=8192)
        .to_pandas()
    )
    if not len(tf_fb):
        return empty
    tf_fb = tf_fb.groupby("word", as_index=False)["cnt"].sum()
    tf_fb = tf_fb[~tf_fb["word"].isin(terms)]
    if not len(tf_fb):
        return empty
    cands = np.sort(tf_fb["word"].to_numpy(dtype=object))
    cand_ref = ray.put(cands)
    C = len(cands)

    def df_partial(df_b: pd.DataFrame) -> pd.DataFrame:
        cv = ray.get(cand_ref)
        texts = df_b["text"]
        ok = texts.notna()
        flat, offs = _explode_words(texts[ok].str.split(" "))
        row = {"n_docs": len(df_b)}
        out = pd.DataFrame([row])
        if len(flat):
            code = np.searchsorted(cv, flat)
            hit = (code < len(cv)) & (cv[np.minimum(code, len(cv) - 1)] == flat)
            row_of = np.repeat(np.arange(len(offs) - 1, dtype=np.int64), np.diff(offs))
            packed = row_of[hit] * np.int64(len(cv)) + code[hit]
            dcodes = np.unique(packed) % np.int64(len(cv))
            u, c = np.unique(dcodes, return_counts=True)
            dfv = np.zeros(len(cv), dtype=np.int64)
            dfv[u] = c
        else:
            dfv = np.zeros(len(cv), dtype=np.int64)
        for j in range(len(cv)):
            out[f"d_{j}"] = dfv[j]
        return out

    # candidate vocab is feedback-doc-bounded; a partial row per batch
    parts = (
        ray.data.read_parquet(docs_path, columns=["text"])
        .map_batches(df_partial, batch_format="pandas", batch_size=8192)
        .to_pandas()
    )
    n_docs = int(parts["n_docs"].sum())
    dfv = np.array([int(parts[f"d_{j}"].sum()) for j in range(C)], dtype=np.int64)
    dmap = dict(zip(cands.tolist(), dfv.tolist()))
    tf_fb = tf_fb.assign(df=tf_fb["word"].map(dmap).astype("int64"))
    tfv = tf_fb["cnt"].to_numpy(np.int64)
    tf_fb = tf_fb.assign(
        prf_score=tfv * np.log(np.float64(n_docs) / tf_fb["df"].to_numpy(np.float64))
    )
    out = (
        tf_fb.sort_values(["prf_score", "word"], ascending=[False, True], kind="mergesort")
        .head(m)
        .reset_index(drop=True)
        .rename(columns={"cnt": "tf_fb"})
    )
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out[["rank", "word", "tf_fb", "df", "prf_score"]].astype(
        {"rank": "int64", "tf_fb": "int64", "df": "int64", "prf_score": "float64"}
    )


def prf_oracle_sql(
    terms: list[str], k: int = 10, m: int = 20, k1: float = BM25_K1, b: float = BM25_B
) -> str:
    """DuckDB twin: the shared BM25 scored CTE → feedback top-k →
    feedback-word TFs (query terms excluded) → corpus df per candidate →
    the identical tf·ln(N/df) score and (score DESC, word) rank."""
    terms = sorted(terms)
    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""{_bm25_scored_cte(terms, k1, b)},
fb AS (SELECT doc_id FROM scored ORDER BY score DESC, doc_id LIMIT {k}),
fw AS (SELECT unnest(string_split(text, ' ')) AS word
       FROM documents JOIN fb USING (doc_id) WHERE text IS NOT NULL),
tfd AS (SELECT word, count(*)::BIGINT AS tf_fb FROM fw
        WHERE word NOT IN ({quoted}) GROUP BY word),
cw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       FROM documents WHERE text IS NOT NULL),
dft AS (SELECT word, count(DISTINCT doc_id)::BIGINT AS df FROM cw
        WHERE word IN (SELECT word FROM tfd) GROUP BY word),
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
sc AS (SELECT t.word, t.tf_fb, d.df, t.tf_fb * ln(nn.n::DOUBLE / d.df) AS prf_score
       FROM tfd t JOIN dft d USING (word) CROSS JOIN nn),
r AS (SELECT *, row_number() OVER (ORDER BY prf_score DESC, word) AS rk FROM sc)
SELECT rk::BIGINT AS rank, word, tf_fb, df, prf_score FROM r WHERE rk <= {m}"""
