"""Round-5 pins: fixed-centroid IVF lossless-at-full-probe, the
adversarial-skew corpus generator's contracts, and bucket derivation."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_ann_topk_ivf_fixed_full_probe_equals_brute(ray_session):
    """n_probe = n_cells probes every cell, so the fixed-centroid IVF must
    reproduce the brute-force top-k SET per query (scores identical; rank
    order shared via the (cos DESC, vec_id) total order)."""
    from hepdata_validator_ray.pipelines.cluster import DEFAULT_CENTROID_IDS
    from hepdata_validator_ray.pipelines.similarity import (
        ann_topk_bruteforce,
        ann_topk_ivf_fixed,
    )

    p = f"{SF}/embeddings.parquet"
    brute = ann_topk_bruteforce(p, k=10, n_queries=3)
    ivf = ann_topk_ivf_fixed(p, k=10, n_queries=3, n_probe=len(DEFAULT_CENTROID_IDS))
    for qid in brute["query_id"].unique():
        b = set(brute.loc[brute["query_id"] == qid, "neighbor_id"])
        i = set(ivf.loc[ivf["query_id"] == qid, "neighbor_id"])
        assert b == i


def test_ann_topk_ivf_fixed_partial_probe_subset(ray_session):
    """A 2-cell probe returns ≤ k rows per query, all scored correctly
    (every returned cos must equal the brute cos for that pair)."""
    from hepdata_validator_ray.pipelines.similarity import (
        ann_topk_bruteforce,
        ann_topk_ivf_fixed,
    )

    p = f"{SF}/embeddings.parquet"
    ivf = ann_topk_ivf_fixed(p, k=10, n_queries=3, n_probe=2)
    brute = ann_topk_bruteforce(p, k=200, n_queries=3)
    merged = ivf.merge(brute, on=["query_id", "neighbor_id"], suffixes=("_i", "_b"), how="left")
    assert merged["cos_b"].notna().all()
    assert np.allclose(merged["cos_i"], merged["cos_b"], atol=1e-6)
    assert (ivf.groupby("query_id").size() <= 10).all()


def test_skewed_corpus_contracts(ray_session, tmp_path):
    """ensure_skewed_sequences_parquet: ≥hot_pct% on one source, ~dup_pct%
    dup rows, dup classes share BYTE-IDENTICAL token content, and every
    doc_id still matches the schema pattern."""
    import re

    import pyarrow.parquet as pq

    from hepdata_validator_ray.schema import DOC_ID_PATTERN
    from hepdata_validator_ray.synth import ensure_skewed_sequences_parquet

    out = ensure_skewed_sequences_parquet(SF, n_rows=20_000, n_files=4)
    t = pq.read_table(out)
    df = t.to_pandas()
    assert len(df) == 20_000
    share = (df["source"] == "web").mean()
    assert share >= 0.90
    dup_mask = df["doc_id"].str.startswith("doc-dup-")
    assert 0.17 <= dup_mask.mean() <= 0.23
    pat = re.compile(DOC_ID_PATTERN)
    assert df["doc_id"].map(lambda s: bool(pat.match(s))).all()
    # byte-identical content within a class; n_tok consistent
    dups = df[dup_mask]
    some = dups.groupby("doc_id").filter(lambda g: len(g) > 1).groupby("doc_id")
    checked = 0
    for _, g in list(some)[:5]:
        toks = [np.asarray(x) for x in g["tokens"].head(3)]
        for a in toks[1:]:
            assert np.array_equal(toks[0], a)
        assert (g["n_tok"].head(3) == len(toks[0])).all()
        checked += 1
    assert checked >= 1


def test_derive_num_buckets_path_shapes(tmp_path):
    """File, directory, list, and unreadable inputs; lo/hi clamps."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.ops import derive_num_buckets_path

    p = tmp_path / "a.parquet"
    pq.write_table(pa.table({"x": list(range(10))}), p)
    assert derive_num_buckets_path(str(p)) == 16  # lo clamp
    assert derive_num_buckets_path(str(tmp_path)) == 16
    assert derive_num_buckets_path([str(p), str(p)]) == 16
    assert derive_num_buckets_path("/nonexistent/nope") == 16  # empty glob → lo
    assert derive_num_buckets_path([str(tmp_path / "missing.parquet")]) == 64  # unreadable → fallback
