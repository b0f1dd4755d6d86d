"""Randomized twin-equivalence for the TPC-H family: every join/aggregate
shape replays against its registered DuckDB oracle over RANDOM fact tables
(customer/supplier/part/orders/lineitem regenerated per seed, respecting
the dbgen contracts the kernels assert — dense 0-based keys, integral
quantities, 2-decimal money) joined to the REAL region/nation dims (the
queries' default region/nation names must resolve)."""

import shutil
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo/tools")
from check_correctness import to_pandas, value_hash  # noqa: E402

REAL = "/root/testdata/sf0.01"

TPCH_OPS = [
    "q1_pricing_summary", "segment_revenue", "nation_order_stats",
    "filtered_lineitem_count", "orders_customer_native_join",
    "top_parts_per_brand", "referential_integrity", "q5_regional_revenue",
    "q3_shipping_priority", "q18_large_volume", "q12_priority_lines",
    "q4_late_orders", "q13_customer_distribution", "q14_promo_revenue",
    "q19_bracket_revenue", "q22_idle_customers", "q7_nation_volume",
    "q10_returned_revenue", "q15_top_suppliers", "q16_supplier_diversity",
    "q17_small_quantity_revenue", "q21_blocked_suppliers", "q8_market_share",
    "q9_nation_profit", "q6_forecast_revenue", "q2_min_cost_supplier",
    "q11_stock_value", "q20_excess_stock", "customer_orders_fulljoin",
    "top_customers", "basket_pairs", "basket_rules",
    # the graph family builds its bipartite/co-purchase graphs from
    # orders x lineitem, so it rides the same random facts
    "graph_pagerank", "graph_triangles", "graph_clustering",
    "graph_rich_club", "graph_adamic_adar", "graph_kcore",
    "graph_assortativity", "graph_bfs_hops",
]

SEGMENTS = ["MACHINERY", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD", "BUILDING"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
COLORS = ["red", "blue", "green", "small", "large"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]


def _gen_tpch(seed: int, d):
    rng = np.random.default_rng(seed)
    NC, NS, NP, NO = 120, 40, 300, 900

    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(NC, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(NC)],
            "c_nationkey": rng.integers(0, 25, NC).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-999, 9999, NC), 2),
            "c_mktsegment": rng.choice(SEGMENTS, NC),
        }
    )
    supp = pd.DataFrame(
        {
            "s_suppkey": np.arange(NS, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(NS)],
            "s_nationkey": rng.integers(0, 25, NS).astype(np.int32),
            "s_acctbal": np.round(rng.uniform(-999, 9999, NS), 2),
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(NP, dtype=np.int64),
            "p_name": [
                f"{rng.choice(COLORS)} {rng.choice(NOUNS)}" for _ in range(NP)
            ],
            "p_brand": [f"Brand#{int(b)}" for b in rng.integers(1, 26, NP)],
            "p_type": rng.choice(TYPES, NP),
            "p_size": rng.integers(1, 51, NP).astype(np.int32),
            "p_retailprice": np.round(rng.uniform(900, 1100, NP), 2),
        }
    )
    odate = pd.to_datetime("1995-01-01") + pd.to_timedelta(
        rng.integers(0, 2400, NO), unit="D"
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(NO, dtype=np.int64),
            "o_custkey": rng.integers(0, NC, NO).astype(np.int64),
            "o_orderstatus": rng.choice(["P", "O", "F"], NO),
            "o_totalprice": np.round(rng.uniform(1000, 500000, NO), 2),
            "o_orderdate": odate,
            "o_orderpriority": rng.choice(PRIORITIES, NO),
        }
    )
    # up to 8 lines/order so q18's sum_qty > 300 threshold has qualifiers
    nlines = rng.integers(1, 9, NO)
    ok = np.repeat(orders["o_orderkey"].to_numpy(), nlines)
    n = len(ok)
    lineno = np.concatenate([np.arange(1, k + 1) for k in nlines]).astype(np.int32)
    li = pd.DataFrame(
        {
            "l_orderkey": ok,
            "l_partkey": rng.integers(0, NP, n).astype(np.int64),
            "l_suppkey": rng.integers(0, NS, n).astype(np.int64),
            "l_linenumber": lineno,
            "l_quantity": rng.integers(1, 51, n).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(100, 100000, n), 2),
            "l_discount": np.round(rng.integers(0, 11, n) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n) / 100.0, 2),
            "l_returnflag": rng.choice(["A", "N", "R"], n),
            "l_linestatus": rng.choice(["O", "F"], n),
            "l_shipdate": np.repeat(odate.to_numpy(), nlines)
            + pd.to_timedelta(rng.integers(1, 121, n), unit="D").to_numpy(),
        }
    )
    # testdata contract: TIMESTAMP columns are µs (pandas would write ns)
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[us]")
    li["l_shipdate"] = li["l_shipdate"].astype("datetime64[us]")
    for name, df in (
        ("customer", cust), ("supplier", supp), ("part", part),
        ("orders", orders), ("lineitem", li),
    ):
        df.to_parquet(d / f"{name}.parquet", index=False)
    for name in ("region", "nation"):
        shutil.copy(f"{REAL}/{name}.parquet", d / f"{name}.parquet")


@pytest.fixture(scope="module")
def oracles():
    import __ray_entry__ as entrymod

    return entrymod.oracle_sql()


@pytest.fixture(scope="module")
def rand_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tpch_rand")
    _gen_tpch(20260820, d)
    return d


@pytest.mark.parametrize("op", TPCH_OPS)
def test_tpch_random_twin(ray_session, rand_dir, oracles, op):
    import duckdb

    import __ray_entry__ as entrymod

    ray_df = to_pandas(entrymod.queries()[op](str(rand_dir)))
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{rand_dir / t}.parquet')"
        )
    ora_df = con.execute(oracles[op]).df()
    assert len(ray_df) == len(ora_df), f"{op}: rows ray={len(ray_df)} oracle={len(ora_df)}"
    if len(ray_df) == 0:
        # both empty: Ray's to_pandas drops the schema from all-empty
        # datasets, so the column comparison is vacuous here
        return
    assert sorted(map(str, ray_df.columns)) == sorted(map(str, ora_df.columns))
    assert value_hash(ray_df) == value_hash(ora_df), f"{op}: value hash"
