"""Text-analysis pipelines over the documents table (training-data-pipeline
operators: token counting, quality scoring, language ID, fingerprinting).

All stages are ``map_batches`` over pandas/Arrow batches with vectorized
string kernels; the language-ID stage is an actor-pool class (stopword
tables + compiled regex built once per actor — ST1 pattern)."""

from __future__ import annotations

import pandas as pd
import ray.data

PUNCT_CLASS = "[.,!?;:]"
STOPWORDS_WS = ("the", "and", "of", "a", "to")

#: minimal per-language stopword tables for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, frozenset] = {
    "en": frozenset("the and of to a in is it you that was for on are with as".split()),
    "de": frozenset("der die das und ist ich nicht ein eine zu mit auf für von".split()),
    "fr": frozenset("le la les et de un une je ne pas pour dans est que avec".split()),
    "es": frozenset("el la los las y de un una que en es no por con para".split()),
    "zh": frozenset("的 是 了 在 我 有 他 这 不 就 人 都 一 个".split()),
}


def token_count_ws(docs_path: str) -> "ray.data.Dataset":
    """Whitespace token count per doc — single-space split semantics chosen
    for exact DuckDB ``string_split(text, ' ')`` parity."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].str.split(" ").str.len().astype("int64")
        return pd.DataFrame({"doc_id": df["doc_id"], "n_ws_tokens": n})

    return ray.data.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pandas", batch_size=4096
    )


def quality_scores(docs_path: str) -> "ray.data.Dataset":
    """Quality metrics per doc: char count, whitespace-token count,
    punctuation count, stopword hits, mean word length ×1000 (integerized
    for cross-engine hash stability)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"]
        n_chars = text.str.len().astype("int64")
        words = text.str.split(" ")
        n_words = words.str.len().astype("int64")
        n_punct = text.str.count(PUNCT_CLASS).astype("int64")
        stop = frozenset(STOPWORDS_WS)
        n_stop = words.map(lambda ws: sum(1 for w in ws if w in stop)).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars_calc": n_chars,
                "n_words": n_words,
                "n_punct": n_punct,
                "n_stopwords": n_stop,
            }
        )

    return ray.data.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pandas", batch_size=4096
    )


#: GPT-2-style pre-tokenization pattern, simplified to ASCII classes so the
#: Python `re` and DuckDB RE2 engines match identically (parity-tested)
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"


class BpeTokenCountStage:
    """BPE-ish token counting — actor-pool stage, regex compiled once per
    actor (ST1 pattern; the reference compiles its schemas once per
    validator instance the same way)."""

    def __init__(self):
        import re

        self.pat = re.compile(BPE_PATTERN)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].map(lambda t: len(self.pat.findall(t))).astype("int64")
        return pd.DataFrame({"doc_id": df["doc_id"], "n_bpe_tokens": n})


def bpe_token_count(docs_path: str, concurrency: int = 2) -> "ray.data.Dataset":
    return ray.data.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        BpeTokenCountStage, batch_format="pandas", batch_size=4096, concurrency=concurrency
    )


class LangIdStage:
    """Stopword-scoring language ID — actor-pool stage: tables built once in
    ``__init__`` (once per actor), batches scored in ``__call__``."""

    def __init__(self, langs: dict[str, frozenset] | None = None):
        self.tables = langs or LANG_STOPWORDS
        self.langs = sorted(self.tables)

    def predict_one(self, text: str) -> str:
        words = text.lower().split()
        if not words:
            return "unknown"
        scores = {
            lang: sum(1 for w in words if w in table) for lang, table in self.tables.items()
        }
        best = max(self.langs, key=lambda l: scores[l])
        return best if scores[best] > 0 else "unknown"

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "pred_lang": [self.predict_one(t) for t in df["text"]]}
        )


def lang_id(docs_path: str, concurrency: int = 2) -> "ray.data.Dataset":
    return ray.data.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        LangIdStage, batch_format="pandas", batch_size=4096, concurrency=concurrency
    )


FP_BASE = 1099511628211  # FNV-ish word-rolling base
FP_SEED = 0xCBF29CE484222325
_MASK64 = 0xFFFFFFFFFFFFFFFF


def fingerprint_words(words: list[str]) -> int:
    """Deterministic rolling hash over the word sequence (document
    fingerprint — order-sensitive, unlike a bag-of-words hash).  Plain-int
    modular arithmetic: wraparound is intended."""
    h = FP_SEED
    for w in words:
        wh = 0
        for b in w.encode():
            wh = (wh * 131 + b) & _MASK64
        h = ((h ^ wh) * FP_BASE) & _MASK64
    return h


def fingerprints(docs_path: str) -> "ray.data.Dataset":
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        fps = [fingerprint_words(t.split(" ")) for t in df["text"]]
        return pd.DataFrame({"doc_id": df["doc_id"], "fingerprint": pd.array(fps, dtype="uint64")})

    return ray.data.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pandas", batch_size=4096
    )
