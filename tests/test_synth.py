"""Generator determinism: content must be independent of file layout and
byte-stable across calls (the oracle and the Ray pipeline read the same
bytes; resume depends on regeneration stability)."""

import pyarrow as pa

from hepdata_validator_ray.synth import generate_sequences_table


def test_layout_independence():
    whole = generate_sequences_table(1000, seed=42)
    a = generate_sequences_table(400, seed=42, row_offset=0)
    b = generate_sequences_table(600, seed=42, row_offset=400)
    recombined = pa.concat_tables([a, b])
    assert whole.equals(recombined.combine_chunks())


def test_call_stability():
    t1 = generate_sequences_table(500, seed=7)
    t2 = generate_sequences_table(500, seed=7)
    assert t1.equals(t2)


def test_seed_sensitivity():
    t1 = generate_sequences_table(100, seed=1, inject=False)
    t2 = generate_sequences_table(100, seed=2, inject=False)
    assert not t1.equals(t2)
