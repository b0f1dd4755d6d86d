"""Property tests for the zero-copy content-fingerprint and shingle kernels
(the round-2 hot-path rewrites): layout invariance is the critical property
— the same logical rows must hash identically regardless of chunking,
slicing, or values-buffer offsets."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from hepdata_validator_ray.pipelines.dedup import (
    _WORD_KEY_MINHASH,
    _shingle_hashes,
    _strong_content_keys,
    _word_hashes,
)


def _keys(col):
    out = _strong_content_keys(pa.table({"tokens": col}))
    return list(zip(out["h1"].to_pylist(), out["h2"].to_pylist()))


BASE = pa.array([[1, 2, 3], [4, 5], [1, 2, 3], [], None, [0, 0, 0, 0]], type=pa.list_(pa.int32()))


def test_content_keys_equality_semantics():
    k = _keys(BASE)
    assert k[0] == k[2], "identical content must hash equal"
    # null is its OWN group, distinct from [] (SQL GROUP BY semantics);
    # all nulls hash equal to each other
    assert k[3] != k[4], "null tokens must not collide with empty tokens"
    more = _keys(pa.array([None, None], type=pa.list_(pa.int32())))
    assert more[0] == more[1] == k[4], "all null rows form one group"
    assert len({k[0], k[1], k[3], k[5]}) == 4, "distinct content must differ"


def test_content_keys_layout_invariance():
    k = _keys(BASE)
    chunked = pa.chunked_array([BASE.slice(0, 2), BASE.slice(2, 4)])
    assert _keys(chunked) == k, "multi-chunk layout must not change keys"
    assert _keys(BASE.slice(2, 4)) == k[2:], "sliced array must match suffix"
    shifted = pa.concat_arrays([pa.array([[9, 9]], type=pa.list_(pa.int32())), BASE]).slice(1, 6)
    assert _keys(shifted) == k, "values-buffer offset must not change keys"


@settings(max_examples=50, deadline=None)
@given(st.lists(st.lists(st.integers(0, 1000), max_size=20), min_size=1, max_size=20), st.integers(0, 18))
def test_content_keys_random_layouts(rows, cut):
    arr = pa.array(rows, type=pa.list_(pa.int32()))
    k = _keys(arr)
    cut = min(cut, len(rows) - 1)
    chunked = pa.chunked_array([arr.slice(0, cut), arr.slice(cut)])
    assert _keys(chunked) == k
    # order sensitivity: reversing a multi-element row changes its key
    for i, r in enumerate(rows):
        if len(r) >= 2 and r != r[::-1]:
            rev = list(rows)
            rev[i] = r[::-1]
            assert _keys(pa.array(rev, type=pa.list_(pa.int32())))[i] != k[i]
            break


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=4), min_size=0, max_size=30), st.integers(2, 4))
def test_shingle_count_and_determinism(words, k):
    text = " ".join(words)
    wh, offs = _word_hashes(pd.Series([text]), _WORD_KEY_MINHASH)
    sh, sh_off = _shingle_hashes(wh, offs, k)
    n_words = len(text.split(" "))  # "" splits to [""] — 1 word
    expected = max(n_words - k + 1, 1)
    assert sh_off[-1] == expected
    wh2, offs2 = _word_hashes(pd.Series([text]), _WORD_KEY_MINHASH)
    sh2, _ = _shingle_hashes(wh2, offs2, k)
    assert (sh == sh2).all()


def test_shingle_batch_consistency():
    """Shingles of a batch equal the per-row shingles concatenated — the
    shifted-slice windowing must not leak across row boundaries."""
    texts = ["a b c d", "x", "", "p q", "m n o p q r"]
    wh, offs = _word_hashes(pd.Series(texts), _WORD_KEY_MINHASH)
    sh_all, off_all = _shingle_hashes(wh, offs, 3)
    for i, t in enumerate(texts):
        whi, offsi = _word_hashes(pd.Series([t]), _WORD_KEY_MINHASH)
        shi, _ = _shingle_hashes(whi, offsi, 3)
        assert (sh_all[off_all[i] : off_all[i + 1]] == shi).all(), t
