"""Sequence-content dedup: identical token arrays under different doc_ids."""

import pyarrow as pa
import pyarrow.parquet as pq

from hepdata_validator_ray.pipelines.dedup import sequence_content_dedup
from hepdata_validator_ray.synth import generate_sequences_table


def test_detects_copied_token_arrays(tmp_path):
    tbl = generate_sequences_table(1000, seed=11, inject=False)
    # copy row 5's tokens onto rows 100 and 200 (different doc_ids)
    toks = tbl.column("tokens").to_pylist()
    toks[100] = toks[5]
    toks[200] = toks[5]
    toks[300] = toks[7]
    tbl = tbl.set_column(1, "tokens", pa.array(toks, type=pa.list_(pa.int32())))
    pq.write_table(tbl, tmp_path / "a.parquet")

    out = sequence_content_dedup(str(tmp_path)).to_pandas()
    assert len(out) == 2
    assert sorted(out.cnt.tolist()) == [2, 3]


def test_no_false_positives(tmp_path):
    pq.write_table(generate_sequences_table(500, seed=12, inject=False), tmp_path / "a.parquet")
    out = sequence_content_dedup(str(tmp_path)).to_pandas()
    assert len(out) == 0
