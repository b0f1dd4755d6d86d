"""TPC-H composite batch (pipelines/tpch.py): sf0.001 DuckDB parity for
all five shapes plus the empty-side edge cases each sentinel discipline
exists for (empty order window for Q4, every-customer-active for Q22,
filter-empties-everything for Q19)."""

import duckdb
import pandas as pd

from hepdata_validator_ray.pipelines import tpch

SF = "/root/testdata/sf0.001"


def _df(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).df()


def _check(ds, sql: str) -> None:
    got = ds.to_pandas()
    key = list(got.columns)
    got = got.sort_values(key).reset_index(drop=True)
    want = _df(sql)[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q4_matches_duckdb(ray_session):
    _check(
        tpch.q4_late_orders(SF),
        """
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority""",
    )


def test_q4_empty_window_stable(ray_session):
    """A fully-pruned order window leaves only sentinels in the join —
    zero rows out, no schema wedge (the matched-sentinel guard)."""
    out = tpch.q4_late_orders(SF, date_lo_us=0, date_hi_us=1).materialize()
    assert out.count() == 0
    assert len(out.to_pandas()) == 0


def test_q13_matches_duckdb_and_preserves_zero_bucket(ray_session):
    got = tpch.q13_customer_distribution(SF).to_pandas()
    _check(
        tpch.q13_customer_distribution(SF),
        """
SELECT c_count, count(*)::BIGINT AS custdist
FROM (SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderdate >= TIMESTAMP '1999-01-01'
      GROUP BY c_custkey) t
GROUP BY c_count""",
    )
    # the sum over the distribution is exactly |customer| — zero-count
    # customers included (the LEFT OUTER preservation this shape exists for)
    n_cust = _df("SELECT count(*)::BIGINT AS n FROM customer")["n"].iloc[0]
    assert got["custdist"].sum() == n_cust


def test_q14_matches_duckdb(ray_session):
    _check(
        tpch.q14_promo_revenue(SF),
        """
SELECT l_returnflag, count(*)::BIGINT AS n_lines,
       sum(CASE WHEN p_type LIKE 'PROMO%'
                THEN round(l_extendedprice*100)::BIGINT * (100 - round(l_discount*100)::BIGINT)
                ELSE 0 END)::BIGINT AS promo_rev_fp4,
       sum(round(l_extendedprice*100)::BIGINT * (100 - round(l_discount*100)::BIGINT))::BIGINT AS total_rev_fp4
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag""",
    )


def test_q19_matches_duckdb(ray_session):
    # wider brackets than the sf0.01 defaults: the default brackets match
    # zero lines at sf0.001, which the dedicated empty test covers below
    wide = (("Brand#12", 1, 30, 1, 40), ("Brand#23", 1, 40, 1, 40), ("Brand#34", 1, 50, 1, 50))
    _check(
        tpch.q19_bracket_revenue(SF, brackets=wide),
        """
SELECT p_brand, count(*)::BIGINT AS n_lines,
       sum(round(l_extendedprice*100)::BIGINT * (100 - round(l_discount*100)::BIGINT))::BIGINT AS rev_fp4
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 30 AND p_size BETWEEN 1 AND 40)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 1 AND 40 AND p_size BETWEEN 1 AND 40)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 1 AND 50 AND p_size BETWEEN 1 AND 50)
GROUP BY p_brand""",
    )


def test_q19_no_matching_bracket_is_empty_not_broken(ray_session):
    out = tpch.q19_bracket_revenue(
        SF, brackets=(("Brand#NO_SUCH", 1, 1, 1, 1),)
    ).materialize()
    assert out.count() == 0


def test_q22_matches_duckdb(ray_session):
    _check(
        tpch.q22_idle_customers(SF),
        """
WITH pos AS (
  SELECT sum(round(c_acctbal*100)::BIGINT) AS s, count(*)::BIGINT AS n
  FROM customer WHERE round(c_acctbal*100)::BIGINT > 0)
SELECT c_nationkey::BIGINT AS cntrycode, count(*)::BIGINT AS numcust,
       sum(round(c_acctbal*100)::BIGINT)::BIGINT AS totacctbal_cents
FROM customer, pos
WHERE round(c_acctbal*100)::BIGINT * pos.n > pos.s
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey""",
    )


def test_q22_all_customers_active_is_empty(ray_session):
    """With the window covering all history every above-average customer
    has an order — the anti join drops everything except the left −2
    sentinel, which the finale strips: zero rows, schema intact."""
    out = tpch.q22_idle_customers(SF, since_us=0).materialize()
    assert out.count() == 0
