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


def _df_pd(got) -> pd.DataFrame:
    return got if isinstance(got, pd.DataFrame) else got.to_pandas()


def _check_any(got, sql: str) -> None:
    got = _df_pd(got)
    key = list(got.columns)
    got = got.sort_values(key).reset_index(drop=True)
    want = _df(sql)[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _df(sql: str) -> pd.DataFrame:  # noqa: F811 — widen views for batch 2+3
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "part", "supplier", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).df()


def test_q7_matches_duckdb_on_a_live_pair(ray_session):
    # (13, 19) is the busiest cross-nation pair at sf0.001 (58 lines);
    # the sf0.01 default pair (0, 1) is gate-checked by the driver
    _check_any(
        tpch.q7_nation_volume(SF, nation_a=13, nation_b=19),
        """
SELECT s.s_nationkey::BIGINT AS supp_nation, c.c_nationkey::BIGINT AS cust_nation,
       year(l_shipdate)::BIGINT AS l_year, count(*)::BIGINT AS n_lines,
       sum(round(l_extendedprice*100)::BIGINT*(100-round(l_discount*100)::BIGINT))::BIGINT AS rev_fp4
FROM lineitem l JOIN supplier s ON l_suppkey = s_suppkey
JOIN orders o ON l_orderkey = o_orderkey JOIN customer c ON o_custkey = c_custkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
  AND ((s.s_nationkey = 13 AND c.c_nationkey = 19)
    OR (s.s_nationkey = 19 AND c.c_nationkey = 13))
GROUP BY 1, 2, 3""",
    )


def test_q7_dead_pair_is_empty_not_broken(ray_session):
    """The default (0, 1) pair has no sf0.001 traffic: every sentinel and
    the empty groupby must pass through without a schema wedge."""
    out = tpch.q7_nation_volume(SF).materialize()
    assert out.count() == 0


def test_q10_matches_duckdb_with_deterministic_ties(ray_session):
    got = _df_pd(tpch.q10_returned_revenue(SF))
    want = _df(
        """
SELECT c_custkey::BIGINT AS c_custkey, any_value(c_name) AS c_name,
       any_value(c_nationkey)::BIGINT AS c_nationkey,
       sum(round(l_extendedprice*100)::BIGINT*(100-round(l_discount*100)::BIGINT))::BIGINT AS revenue_fp4
FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey ORDER BY revenue_fp4 DESC, c_custkey LIMIT 20"""
    )
    # ORDER matters here (top-k is positional): compare row-for-row
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_q10_empty_window_returns_typed_empty(ray_session):
    out = tpch.q10_returned_revenue(SF, date_lo_us=0, date_hi_us=1)
    assert len(out) == 0
    assert list(out.columns) == ["c_custkey", "c_name", "c_nationkey", "revenue_fp4"]


def test_q15_matches_duckdb(ray_session):
    _check_any(
        tpch.q15_top_suppliers(SF),
        """
WITH rev AS (
  SELECT l_suppkey,
         sum(round(l_extendedprice*100)::BIGINT*(100-round(l_discount*100)::BIGINT))::BIGINT AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT rev.l_suppkey::BIGINT AS s_suppkey, s.s_name AS s_name, rev.r AS total_rev_fp4
FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
WHERE rev.r = (SELECT max(r) FROM rev)""",
    )


def test_q15_empty_window_returns_typed_empty(ray_session):
    """When the window prunes everything the sentinel's 0 becomes the max
    and is stripped — zero rows, stable columns."""
    out = tpch.q15_top_suppliers(SF, date_lo_us=0, date_hi_us=1)
    assert len(out) == 0
    assert list(out.columns) == ["s_suppkey", "s_name", "total_rev_fp4"]


def test_q16_matches_duckdb(ray_session):
    _check_any(
        tpch.q16_supplier_diversity(SF),
        """
WITH pr AS (
  SELECT DISTINCT p_brand, p_size, l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
SELECT p_brand, p_size::BIGINT AS p_size, count(*)::BIGINT AS supplier_cnt
FROM pr GROUP BY 1, 2""",
    )


def test_q17_matches_duckdb(ray_session):
    _check_any(
        tpch.q17_small_quantity_revenue(SF),
        """
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#2'),
agg AS (SELECT l_partkey, sum(round(l_quantity)::BIGINT) AS sq, count(*)::BIGINT AS n
        FROM lineitem JOIN bp ON l_partkey = p_partkey GROUP BY 1)
SELECT 'Brand#2' AS p_brand, count(*)::BIGINT AS n_lines,
       coalesce(sum(round(l.l_extendedprice*100)::BIGINT), 0)::BIGINT AS sum_price_cents
FROM lineitem l JOIN agg a ON l.l_partkey = a.l_partkey
WHERE 5*round(l.l_quantity)::BIGINT*a.n < 1*a.sq""",
    )


def test_q17_unknown_brand_is_the_zero_row(ray_session):
    """No parts of the brand → nothing qualifies → exactly the unioned
    zero row survives (matching the oracle's always-one-row aggregate)."""
    got = tpch.q17_small_quantity_revenue(SF, brand="Brand#NO_SUCH").to_pandas()
    assert len(got) == 1
    assert int(got["n_lines"].iloc[0]) == 0
    assert int(got["sum_price_cents"].iloc[0]) == 0


def test_q21_matches_duckdb(ray_session):
    _check_any(
        tpch.q21_blocked_suppliers(SF),
        """
WITH pair AS (SELECT l_orderkey, l_suppkey, max(l_shipdate) AS ms FROM lineitem GROUP BY 1, 2),
j AS (SELECT p.l_orderkey, p.l_suppkey,
             (p.ms > o.o_orderdate + INTERVAL 60 DAY)::INT AS late
      FROM pair p JOIN orders o ON p.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'),
q AS (SELECT l_orderkey FROM j GROUP BY 1 HAVING count(*) >= 2 AND sum(late) = 1)
SELECT j.l_suppkey::BIGINT AS s_suppkey, count(*)::BIGINT AS numwait
FROM j JOIN q USING (l_orderkey) WHERE j.late = 1 GROUP BY 1""",
    )


def test_q21_everything_late_counts_nobody(ray_session):
    """late_days=-100000 makes EVERY supplier late, so no order has
    exactly one late supplier unless it is single-supplier (excluded by
    n_supp >= 2): zero rows out, schema stable."""
    out = tpch.q21_blocked_suppliers(SF, late_days=-100000).materialize()
    got = out.to_pandas()
    # single-supplier orders are excluded; multi-supplier all-late orders
    # have n_late >= 2 — nothing qualifies
    assert len(got) == 0


def test_q8_matches_duckdb(ray_session):
    _check_any(
        tpch.q8_market_share(SF),
        """
SELECT year(o_orderdate)::BIGINT AS o_year,
  sum(CASE WHEN s_nationkey = 0
      THEN round(l_extendedprice*100)::BIGINT*(100-round(l_discount*100)::BIGINT)
      ELSE 0 END)::BIGINT AS target_rev_fp4,
  sum(round(l_extendedprice*100)::BIGINT*(100-round(l_discount*100)::BIGINT))::BIGINT AS total_rev_fp4
FROM lineitem JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
JOIN nation n ON c_nationkey = n_nationkey JOIN supplier ON l_suppkey = s_suppkey
WHERE p_type = 'ECONOMY' AND n.n_regionkey = 0
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1""",
    )


def test_q8_empty_window_stable(ray_session):
    out = tpch.q8_market_share(SF, date_lo_us=0, date_hi_us=1).materialize()
    assert out.count() == 0


def test_q9_matches_duckdb(ray_session):
    _check_any(
        tpch.q9_nation_profit(SF),
        """
SELECT s_nationkey::BIGINT AS supp_nation, year(o_orderdate)::BIGINT AS o_year,
  count(*)::BIGINT AS n_lines,
  sum(round(l_extendedprice*100)::BIGINT*(100-round(l_discount*100)::BIGINT)
      - round(p_retailprice*100)::BIGINT*round(l_quantity)::BIGINT*100)::BIGINT AS profit_fp4
FROM lineitem JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey JOIN supplier ON l_suppkey = s_suppkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2""",
    )


def test_q9_signed_profit_path_is_exercised(ray_session):
    """175 of 799 'red' lines at sf0.001 have retail·qty·100 above their
    discounted revenue (checked in DuckDB), so the per-line profit terms
    the collapse sums are genuinely signed — pin that the grouped totals
    still reconcile to the line-level signed sum."""
    got = tpch.q9_nation_profit(SF).to_pandas()
    total = _df(
        """
SELECT sum(round(l_extendedprice*100)::BIGINT*(100-round(l_discount*100)::BIGINT)
      - round(p_retailprice*100)::BIGINT*round(l_quantity)::BIGINT*100)::BIGINT AS p,
       count(*) FILTER (WHERE round(l_extendedprice*100)::BIGINT*(100-round(l_discount*100)::BIGINT)
      < round(p_retailprice*100)::BIGINT*round(l_quantity)::BIGINT*100)::BIGINT AS n_neg
FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_name LIKE '%red%'"""
    )
    assert int(total["n_neg"].iloc[0]) > 0  # signed terms really occur
    assert int(got["profit_fp4"].sum()) == int(total["p"].iloc[0])


def test_q9_no_matching_part_is_empty(ray_session):
    out = tpch.q9_nation_profit(SF, name_word="zzz_no_such_word").materialize()
    assert out.count() == 0


def test_q6_matches_duckdb(ray_session):
    _check_any(
        tpch.q6_forecast_revenue(SF),
        """
SELECT count(*)::BIGINT AS n_lines,
       coalesce(sum(round(l_extendedprice*100)::BIGINT * round(l_discount*100)::BIGINT), 0)::BIGINT AS revenue_fp4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND round(l_discount*100)::BIGINT BETWEEN 5 AND 7
  AND round(l_quantity)::BIGINT < 24""",
    )


def test_q6_empty_window_is_the_zero_row(ray_session):
    got = tpch.q6_forecast_revenue(SF, date_lo_us=0, date_hi_us=1).to_pandas()
    assert len(got) == 1
    assert int(got["n_lines"].iloc[0]) == 0 and int(got["revenue_fp4"].iloc[0]) == 0


# --- batch 4: the derived-partsupp shapes (Q2 / Q11 / Q20) -----------------

_PS_SQL = """
WITH sc AS (SELECT count(*)::BIGINT AS s FROM supplier),
ps AS (
  SELECT p_partkey::BIGINT AS ps_partkey,
         ((p_partkey::BIGINT + i.i * greatest(1, sc.s // 4)) % sc.s)::BIGINT AS ps_suppkey
  FROM part, sc, (SELECT unnest([0, 1, 2, 3])::BIGINT AS i) i),
ps2 AS (
  SELECT ps_partkey, ps_suppkey,
         ((ps_partkey*13 + ps_suppkey*101) % 9999 + 1)::BIGINT AS ps_availqty,
         ((ps_partkey*7919 + ps_suppkey*104729) % 99901 + 100)::BIGINT AS ps_supplycost_cents
  FROM ps)
"""


def test_ps_derivation_distinct_suppliers_contract():
    """3·⌊S/4⌋ < S makes the four rotated suppkeys distinct per part, for
    every supplier-count regime (tiny S=4 through dbgen-scale)."""
    import numpy as np

    for S in (4, 5, 7, 10, 100, 1000, 10007):
        pk = np.arange(min(5000, 3 * S), dtype=np.int64)
        sk, avail, cost = tpch._ps_matrices(pk, S)
        assert (np.sort(sk, axis=1)[:, 1:] != np.sort(sk, axis=1)[:, :-1]).all()
        assert (sk >= 0).all() and (sk < S).all()
        assert (avail >= 1).all() and (avail <= 9999).all()
        assert (cost >= 100).all() and (cost < 100001).all()


def test_q2_matches_duckdb(ray_session):
    _check_any(
        tpch.q2_min_cost_supplier(SF),
        _PS_SQL
        + """
SELECT s_acctbal, s_name, n_name, p_partkey::BIGINT AS p_partkey
FROM ps2 JOIN part ON ps_partkey = p_partkey
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_type = 'ECONOMY' AND p_size >= 25 AND r_name = 'EUROPE'
  AND ps_supplycost_cents = (
    SELECT min(x.ps_supplycost_cents) FROM ps2 x
    JOIN supplier s2 ON x.ps_suppkey = s2.s_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE x.ps_partkey = ps2.ps_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 50""",
    )


def test_q2_strict_limit_is_deterministic(ray_session):
    """k=5 < candidate count, so the LIMIT binds here — the
    (acctbal DESC, n_name, s_name, p_partkey) total order must pick the
    identical 5 rows on both engines."""
    _check_any(
        tpch.q2_min_cost_supplier(SF, k=5),
        _PS_SQL
        + """
SELECT s_acctbal, s_name, n_name, p_partkey::BIGINT AS p_partkey
FROM ps2 JOIN part ON ps_partkey = p_partkey
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_type = 'ECONOMY' AND p_size >= 25 AND r_name = 'EUROPE'
  AND ps_supplycost_cents = (
    SELECT min(x.ps_supplycost_cents) FROM ps2 x
    JOIN supplier s2 ON x.ps_suppkey = s2.s_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE x.ps_partkey = ps2.ps_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 5""",
    )


def test_q2_unknown_region_is_empty_with_stable_schema(ray_session):
    got = tpch.q2_min_cost_supplier(SF, region_name="NOWHERE")
    assert len(got) == 0
    assert list(got.columns) == ["s_acctbal", "s_name", "n_name", "p_partkey"]


def test_q11_matches_duckdb(ray_session):
    _check_any(
        tpch.q11_stock_value(SF),
        _PS_SQL
        + """
, v AS (SELECT ps_partkey, sum(ps_supplycost_cents * ps_availqty)::BIGINT AS value_cents
        FROM ps2 JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3' GROUP BY 1)
SELECT ps_partkey, value_cents FROM v
WHERE value_cents * 200 > 1 * (SELECT sum(value_cents)::BIGINT FROM v)""",
    )


def test_q11_unknown_nation_is_empty(ray_session):
    out = tpch.q11_stock_value(SF, nation_name="NOWHERE").materialize()
    assert out.count() == 0


def test_q20_matches_duckdb(ray_session):
    _check_any(
        tpch.q20_excess_stock(SF),
        _PS_SQL
        + """
, agg AS (SELECT l_partkey::BIGINT AS apk, l_suppkey::BIGINT AS ask,
                 sum(round(l_quantity)::BIGINT) AS sq
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY 1, 2)
SELECT s_suppkey::BIGINT AS s_suppkey, any_value(s_name) AS s_name,
       count(*)::BIGINT AS n_pairs
FROM ps2
JOIN part ON ps_partkey = p_partkey
JOIN agg ON apk = ps_partkey AND ask = ps_suppkey
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_name LIKE '%red%' AND r_name = 'MIDDLE EAST' AND 2*ps_availqty > sq
GROUP BY 1""",
    )


def test_q20_empty_window_is_empty_with_stable_schema(ray_session):
    """No shipped lines in the window → the agg side is only its sentinel;
    the matched-sentinel join stays schema-total and the result is empty."""
    got = tpch.q20_excess_stock(SF, date_lo_us=0, date_hi_us=1)
    assert len(got) == 0
    assert list(got.columns) == ["s_suppkey", "s_name", "n_pairs"]
