"""Per-source z-score / min-max normalization (relational.docs_feature_scaling):
bit-exact float parity vs DuckDB evaluating the identically-parenthesized
expression, plus degenerate groups (constant, singleton) and NULL handling."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from hepdata_validator_ray.pipelines.relational import docs_feature_scaling

SF = "/root/testdata/sf0.001"


def _oracle(path):
    return duckdb.sql(
        f"""
WITH s AS (
  SELECT coalesce(source, '<NULL>') AS source, count(*)::BIGINT AS n,
         sum(n_chars)::BIGINT AS sx, sum(n_chars * n_chars)::BIGINT AS sxx,
         min(n_chars)::BIGINT AS mn, max(n_chars)::BIGINT AS mx
  FROM read_parquet('{path}') WHERE n_chars IS NOT NULL GROUP BY 1)
SELECT d.doc_id, s.source,
       CASE WHEN (sxx::DOUBLE/n - (sx::DOUBLE/n)*(sx::DOUBLE/n)) > 0
            THEN (d.n_chars - sx::DOUBLE/n)
                 / sqrt(sxx::DOUBLE/n - (sx::DOUBLE/n)*(sx::DOUBLE/n)) END AS z,
       CASE WHEN mx > mn THEN (d.n_chars - mn)::DOUBLE / (mx - mn)::DOUBLE END AS mm
FROM read_parquet('{path}') d JOIN s ON coalesce(d.source, '<NULL>') = s.source
WHERE d.n_chars IS NOT NULL ORDER BY doc_id
"""
    ).df()


def test_feature_scaling_bit_exact(ray_session):
    got = (
        docs_feature_scaling(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _oracle(f"{SF}/documents.parquet")
    # check_exact: the floats must be BIT-identical, not just close —
    # both engines evaluate the same parenthesization over the same ints
    pd.testing.assert_frame_equal(got, want, check_exact=True, check_dtype=False)


def test_feature_scaling_degenerate_groups(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "source": ["const", "const", "const", "solo", None, None],
            "n_chars": pd.array([7, 7, 7, 42, 5, None], dtype="Int64"),
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), d / "documents.parquet")
    got = docs_feature_scaling(str(d)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # NULL n_chars row (doc 5) excluded end-to-end
    assert list(got["doc_id"]) == [0, 1, 2, 3, 4]
    # constant group: zero variance and zero range -> both NULL
    const = got[got["source"] == "const"]
    assert const["z"].isna().all() and const["mm"].isna().all()
    # singleton group: same (n=1 variance 0, mx==mn)
    solo = got[got["source"] == "solo"]
    assert solo["z"].isna().all() and solo["mm"].isna().all()
    # NULL source groups under '<NULL>' and scales within that group
    nul = got[got["source"] == "<NULL>"]
    assert len(nul) == 1 and nul["z"].isna().all()  # single non-null member


def test_q5_empty_window_stable_schema(ray_session):
    """A date window before the data span returns ZERO rows with the
    stable (n_name, n_lines, rev_fp4) schema — the join chain must not
    collapse to a schemaless frame."""
    from hepdata_validator_ray.pipelines.relational import q5_regional_revenue

    out = q5_regional_revenue(
        "/root/testdata/sf0.001", date_lo="1990-01-01", date_hi="1991-01-01"
    ).materialize()
    assert out.count() == 0
    # the sentinel row pins the schema through the join chain and the
    # aggregate even when every partition is otherwise empty (to_pandas
    # on a 0-row dataset drops columns — the Dataset schema is the
    # contract)
    assert sorted(out.schema().names) == ["n_lines", "n_name", "rev_fp4"]


def test_q3_empty_window_stable_schema(ray_session):
    """Cutoff past the data span: every order qualifies on date but no
    lineitem ships after it — zero rows, stable schema via the sentinel."""
    from hepdata_validator_ray.pipelines.relational import q3_shipping_priority

    out = q3_shipping_priority("/root/testdata/sf0.001", cutoff="2050-01-01").materialize()
    assert out.count() == 0
    assert sorted(out.schema().names) == ["l_orderkey", "o_date_days", "o_pri", "rev_fp4"]


def test_q3_k_truncates(ray_session):
    from hepdata_validator_ray.pipelines.relational import q3_shipping_priority

    out = q3_shipping_priority("/root/testdata/sf0.001", k=3).to_pandas()
    assert len(out) == 3
    # descending revenue with ascending orderkey tie-break
    assert list(out["rev_fp4"]) == sorted(out["rev_fp4"], reverse=True)


def test_q18_impossible_threshold_stable_schema(ray_session):
    """No order can clear sum_qty > 10^9 — zero rows, stable schema."""
    from hepdata_validator_ray.pipelines.relational import q18_large_volume_customers

    out = q18_large_volume_customers(
        "/root/testdata/sf0.001", qty_threshold=10**9
    ).materialize()
    assert out.count() == 0
    assert sorted(out.schema().names) == [
        "c_custkey", "c_name", "o_date_days", "o_orderkey", "o_total_cents", "sum_qty",
    ]


def test_winsorize_clamps_to_group_bounds(ray_session):
    from hepdata_validator_ray.pipelines.relational import docs_winsorize

    out = docs_winsorize("/root/testdata/sf0.001").to_pandas()
    import pandas as pd

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])
    for src, g in out.groupby("source"):
        vals = docs[docs["source"].fillna("<NULL>") == src]["n_chars"].dropna().sort_values().to_numpy()
        import numpy as np
        lo = vals[max(int(np.ceil(0.05 * len(vals))) - 1, 0)]
        hi = vals[max(int(np.ceil(0.95 * len(vals))) - 1, 0)]
        assert (g["n_chars_w"] >= lo).all() and (g["n_chars_w"] <= hi).all()
        inside = (g["n_chars"] >= lo) & (g["n_chars"] <= hi)
        assert (g.loc[inside, "n_chars_w"] == g.loc[inside, "n_chars"]).all()
    assert len(out) == len(docs[docs["n_chars"].notna()])


def test_q12_empty_window_stable_schema(ray_session):
    """An empty ship-date window joins only sentinels — zero rows, stable
    schema (the matched-sentinel guard keeps the native join total)."""
    from hepdata_validator_ray.pipelines.relational import q12_priority_lines

    out = q12_priority_lines(
        "/root/testdata/sf0.001", date_lo_us=0, date_hi_us=1
    ).materialize()
    assert out.count() == 0
    assert len(out.to_pandas()) == 0  # empty aggregate, no crash


def test_q12_matches_duckdb_sf0001(ray_session):
    """Full-window Q12 counts match a DuckDB recompute at sf0.001."""
    import duckdb

    from hepdata_validator_ray.pipelines.relational import q12_priority_lines

    got = (
        q12_priority_lines("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        """
SELECT l_returnflag,
       count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))::BIGINT AS high_line_count,
       count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))::BIGINT AS low_line_count
FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet') l
JOIN read_parquet('/root/testdata/sf0.001/orders.parquet') o ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag ORDER BY l_returnflag"""
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)
