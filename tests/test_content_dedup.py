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


def test_dup_span_stats_duckdb_parity():
    """Cross-doc duplicated-span diagnostic: exact parity with the DuckDB
    string-shingle twin at sf0.001 (hash-shingle identity)."""
    import duckdb

    from hepdata_validator_ray.pipelines.dedup import dup_span_stats

    d = "/root/testdata/sf0.001/documents.parquet"
    got = dup_span_stats(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}')")
    exp = con.execute(
        """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
shg AS (
  SELECT doc_id,
         CASE WHEN len(ws) = 0 THEN []
              WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
              ELSE list_distinct(list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
         END AS sh
  FROM w
),
expl AS (SELECT doc_id, unnest(sh) AS s FROM shg),
sdf AS (SELECT s, count(*)::BIGINT AS df FROM expl GROUP BY s)
SELECT e.doc_id,
       count(*) FILTER (WHERE sdf.df >= 2)::BIGINT AS n_dup_shingles,
       count(*)::BIGINT AS n_shingles
FROM expl e JOIN sdf USING (s) GROUP BY e.doc_id ORDER BY e.doc_id
"""
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_dup_span_stats_crafted(tmp_path):
    """A shared 3-word span is flagged on both docs; a unique doc has 0."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.dedup import dup_span_stats

    p = tmp_path / "documents.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": np.arange(3, dtype=np.int64),
                "text": [
                    "alpha beta gamma delta",
                    "zzz alpha beta gamma",
                    "totally unique words here",
                ],
            }
        ),
        p,
    )
    out = dup_span_stats(str(p)).to_pandas().set_index("doc_id").sort_index()
    # docs 0 and 1 share the 'alpha beta gamma' shingle exactly once each
    assert out.loc[0, "n_dup_shingles"] == 1 and out.loc[0, "n_shingles"] == 2
    assert out.loc[1, "n_dup_shingles"] == 1 and out.loc[1, "n_shingles"] == 2
    assert out.loc[2, "n_dup_shingles"] == 0 and out.loc[2, "n_shingles"] == 2


def test_snapshot_diff_crafted(tmp_path):
    """added / removed / changed / unchanged, with NULL-text transitions:
    NULL→NULL is UNCHANGED (IS DISTINCT FROM semantics), NULL→text and
    text→NULL are CHANGED."""
    import pandas as pd

    from hepdata_validator_ray.pipelines.dedup import snapshot_diff

    old = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["same", "will change", None, None, "gone"],
        }
    )
    new = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 6],
            "text": ["same", "changed!", None, "was null", "fresh"],
        }
    )
    old.to_parquet(tmp_path / "old.parquet", index=False)
    new.to_parquet(tmp_path / "new.parquet", index=False)
    out = snapshot_diff(str(tmp_path / "old.parquet"), str(tmp_path / "new.parquet"), num_buckets=3)
    got = {(int(r.doc_id), r.status) for r in out.to_pandas().itertuples()}
    assert got == {(2, "changed"), (4, "changed"), (5, "removed"), (6, "added")}


def test_mutated_documents_fixture_deterministic_and_classified():
    """The second-crawl fixture is a pure function of the base table, and
    the diff statuses land exactly on the mutation rule's residue classes."""
    import pandas as pd

    from hepdata_validator_ray.pipelines.dedup import snapshot_diff
    from hepdata_validator_ray.synth import ensure_mutated_documents_parquet

    sf = "/root/testdata/sf0.001"
    mut = ensure_mutated_documents_parquet(sf)
    assert ensure_mutated_documents_parquet(sf) == mut
    base = pd.read_parquet(f"{sf}/documents.parquet")
    got = snapshot_diff(f"{sf}/documents.parquet", mut, num_buckets=4).to_pandas()
    by = {s: set(g["doc_id"]) for s, g in got.groupby("status")}
    ids = base["doc_id"]
    assert by["removed"] == set(ids[ids % 10 == 3])
    # changed = the rev2 class minus anything that was removed
    assert by["changed"] == set(ids[(ids % 7 == 2) & (ids % 10 != 3)])
    assert len(by["added"]) == max((ids % 10 != 3).sum() // 20, 1)
    assert by["added"].isdisjoint(set(ids))


def test_merge_upsert_closed_loop(ray_session):
    """merge(base, delta(base→v2)) must equal the v2 snapshot exactly —
    upserts shadow, tombstones delete, untouched rows pass through."""
    import hashlib

    import pandas as pd

    from hepdata_validator_ray.pipelines.dedup import merge_upsert
    from hepdata_validator_ray.synth import (
        ensure_delta_parquet,
        ensure_mutated_documents_parquet,
    )

    sf = "/root/testdata/sf0.001"
    v2 = pd.read_parquet(ensure_mutated_documents_parquet(sf)).sort_values("doc_id").reset_index(drop=True)
    out = (
        merge_upsert(f"{sf}/documents.parquet", ensure_delta_parquet(sf))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    v2["text_md5"] = [
        hashlib.md5((t if isinstance(t, str) else "<NULL>").encode()).hexdigest()
        for t in v2["text"]
    ]
    pd.testing.assert_frame_equal(
        out[["doc_id", "text_md5", "lang", "source", "n_chars"]],
        v2[["doc_id", "text_md5", "lang", "source", "n_chars"]],
        check_dtype=False,
    )
    # origin: exactly the delta's upsert rows won as 'delta'
    delta = pd.read_parquet(ensure_delta_parquet(sf))
    assert set(out.loc[out["origin"] == "delta", "doc_id"]) == set(
        delta.loc[~delta["deleted"], "doc_id"]
    )
