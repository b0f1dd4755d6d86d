"""Property-based testing (hypothesis): every vectorized check kernel must
agree with a naive pure-Python row-loop oracle on arbitrary inputs —
including nulls, empty lists, extreme values, and unicode doc_ids.

This goes beyond the reference's fixture-pair strategy (SURVEY.md §5): the
reference tests enumerate hand-written corpora; the property tests explore
the input space mechanically."""

import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from hepdata_validator_ray.checks.base import CheckContext
from hepdata_validator_ray.checks.row_checks import DEFAULT_ROW_CHECKS, prepare_view

CTX = CheckContext(vocab_size=100, max_seq_len=20, doc_id_max_length=12)
DOC_RE = re.compile(CTX.doc_id_pattern)


def naive_violations(rows: list[dict]) -> dict[str, set[int]]:
    """Straight-line per-row reimplementation of every check's semantics."""
    out: dict[str, set[int]] = {c.name: set() for c in DEFAULT_ROW_CHECKS}
    for i, r in enumerate(rows):
        doc, toks, ntk, src = r["doc_id"], r["tokens"], r["n_tok"], r["source"]
        if doc is None:
            out["doc_id_non_null"].add(i)
        else:
            if not DOC_RE.match(doc):
                out["doc_id_format"].add(i)
            if len(doc) > CTX.doc_id_max_length:
                out["doc_id_max_length"].add(i)
        if src is None or src not in CTX.sources:
            out["source_membership"].add(i)
        if ntk is not None and ntk < 0:
            out["n_tok_non_negative"].add(i)
        if toks is not None:
            if any(t < 0 or t >= CTX.vocab_size for t in toks):
                out["token_id_range"].add(i)
            if ntk is not None and ntk != len(toks):
                out["token_length_consistency"].add(i)
            if len(toks) == 0:
                out["tokens_not_empty"].add(i)
            if len(toks) > 0 and all(t == 0 for t in toks):
                out["tokens_not_all_zero"].add(i)
            if len(toks) > CTX.max_seq_len:
                out["sequence_length_limit"].add(i)
            if len(set(toks)) != len(toks):
                out["tokens_unique_items"].add(i)
    return out


row_strategy = st.fixed_dictionaries(
    {
        "doc_id": st.one_of(
            st.none(),
            st.just("doc-web-00000001"),
            st.text(min_size=0, max_size=20),
            st.from_regex(r"doc-[a-z0-9]{1,8}-[0-9]{8}", fullmatch=True),
            st.just("doc-verylongsourcename-00000001"),
        ),
        "tokens": st.one_of(
            st.none(),
            st.lists(st.integers(min_value=-5, max_value=120), min_size=0, max_size=25),
            st.just([0] * 5),
        ),
        "n_tok": st.one_of(st.none(), st.integers(min_value=-3, max_value=30)),
        "source": st.one_of(st.none(), st.sampled_from(["web", "books", "junk", ""])),
    }
)


@settings(max_examples=60, deadline=None)
@given(st.lists(row_strategy, min_size=0, max_size=40))
def test_vectorized_checks_match_naive_oracle(rows):
    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.string()),
            "tokens": pa.array([r["tokens"] for r in rows], type=pa.list_(pa.int32())),
            "n_tok": pa.array([r["n_tok"] for r in rows], type=pa.int32()),
            "source": pa.array([r["source"] for r in rows], type=pa.string()),
        }
    )
    view = prepare_view(tbl)
    expected = naive_violations(rows)
    for check in DEFAULT_ROW_CHECKS:
        got = set(check.fn(view, CTX).indices.tolist())
        assert got == expected[check.name], (check.name, rows)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=10), min_size=0, max_size=30)
)
def test_segment_any_matches_python(lists):
    from hepdata_validator_ray.checks.row_checks import _segment_any

    flat = np.array([x for l in lists for x in l], dtype=np.int64)
    lens = np.array([len(l) for l in lists], dtype=np.int64)
    offsets = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    mask = flat > 25
    got = _segment_any(mask, offsets)
    exp = np.array([any(x > 25 for x in l) for l in lists], dtype=bool)
    assert (got == exp).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=6), min_size=0, max_size=50))
def test_minhash_similarity_bounds(words):
    """MinHash estimate of identical docs is 1.0; of disjoint docs ~0."""
    import pandas as pd

    from hepdata_validator_ray.pipelines.dedup import (
        _WORD_KEY_MINHASH,
        _perm_params,
        _shingle_hashes,
        _word_hashes,
        minhash_signature,
    )

    def shingles(ws):
        wh, offs = _word_hashes(pd.Series([" ".join(ws)]), _WORD_KEY_MINHASH)
        sh, _ = _shingle_hashes(wh, offs, 3)
        return np.unique(sh)

    a, b = _perm_params(64)
    h1 = shingles(words)
    sig1 = minhash_signature(h1, a, b)
    sig2 = minhash_signature(h1, a, b)
    assert (sig1 == sig2).all()  # deterministic
    if len(h1):
        other = shingles([w + "xq" for w in words] + ["zz"])
        if len(np.intersect1d(h1, other)) == 0:
            est = float(np.mean(sig1 == minhash_signature(other, a, b)))
            assert est < 0.5
