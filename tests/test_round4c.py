"""Round-4 session-8 operators: perplexity filter and friends — crafted
fixtures pinning the conventions the sf gate can't isolate (add-one
smoothing arithmetic, NULL-doc LM contribution, OOV/short-row exclusion)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_seq(tmp_path, doc_ids, tokens):
    t = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "tokens": pa.array(tokens, pa.list_(pa.int64())),
            "n_tok": pa.array([len(x) if x is not None else None for x in tokens], pa.int64()),
            "source": pa.array(["s"] * len(doc_ids), pa.string()),
        }
    )
    p = str(tmp_path / "seq.parquet")
    pq.write_table(t, p)
    return p


def test_seq_lm_perplexity_hand_computed(tmp_path, ray_session):
    """Corpus LM: (1,2)×3, (2,1)×2 → ctx(1)=3, ctx(2)=2 (V=10).  The NULL-
    doc row feeds the LM but scores no doc; the 1-token row and the
    all-OOV-bigram row emit nothing.  avg_nll spells add-one smoothing:
    doc A = (2·[ln13−ln4] + [ln12−ln3])/3, doc B = ln13−ln4."""
    from hepdata_validator_ray.pipelines.validation import seq_lm_perplexity

    p = _write_seq(
        tmp_path,
        ["A", "B", None, "D", "E"],
        [[1, 2, 1, 2], [1, 2], [2, 1], [5], [1, 12, 2]],
    )
    got = seq_lm_perplexity(p, vocab_size=10).to_pandas().set_index("doc_id")
    nll12 = math.log(13) - math.log(4)
    nll21 = math.log(12) - math.log(3)
    assert set(got.index) == {"A", "B"}
    assert got.loc["A", "m"] == 3
    assert got.loc["A", "avg_nll"] == pytest.approx((2 * nll12 + nll21) / 3, rel=1e-12)
    assert got.loc["B", "m"] == 1
    assert got.loc["B", "avg_nll"] == pytest.approx(nll12, rel=1e-12)


def test_seq_lm_perplexity_uniform_corpus_scores_flat(tmp_path, ray_session):
    """Identical docs must score identically (the filter's fixed point)."""
    from hepdata_validator_ray.pipelines.validation import seq_lm_perplexity

    p = _write_seq(tmp_path, [f"d{i}" for i in range(20)], [[3, 4, 5]] * 20)
    got = seq_lm_perplexity(p, vocab_size=8).to_pandas()
    assert len(got) == 20 and got["m"].eq(2).all()
    assert got["avg_nll"].nunique() == 1
    # ctx(3)=ctx(4)=20; p(4|3) = 21/28, p(5|4) = 21/28
    assert got["avg_nll"].iloc[0] == pytest.approx(math.log(28) - math.log(21), rel=1e-12)
