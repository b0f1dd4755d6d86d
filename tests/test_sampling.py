"""Deterministic sampling/splitting: reproducibility and layout independence."""

import pandas as pd

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


def test_split_is_deterministic_and_complete():
    from hepdata_validator_ray.pipelines.sampling import split_assignment

    a = split_assignment(DOCS).to_pandas().set_index("split").n.to_dict()
    b = split_assignment(DOCS).to_pandas().set_index("split").n.to_dict()
    assert a == b
    assert sum(a.values()) == 500
    assert 0 < a.get("test", 0) < a.get("train", 500)


def test_sample_subset_of_split():
    from hepdata_validator_ray.pipelines.sampling import deterministic_sample, split_assignment

    sample = set(deterministic_sample(DOCS, pct=5).to_pandas().doc_id)
    bigger = set(deterministic_sample(DOCS, pct=20).to_pandas().doc_id)
    assert sample <= bigger  # nested samples: bucket<5 ⊂ bucket<20
    assert len(bigger) > len(sample) > 0
