"""Fixed-point PageRank: local-reference equality, edge-build invariants,
iteration-count sensitivity, and a hot-node skew case."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _local_pagerank(edges: pd.DataFrame, n_iter: int) -> dict[int, int]:
    """Single-process reference: the same integer recurrence, no Ray."""
    from hepdata_validator_ray.pipelines.graph import BASE, D_DEN, D_NUM, SCALE

    outdeg = edges.groupby("src")["dst"].size().to_dict()
    r = {n: SCALE for n in outdeg}
    for _ in range(n_iter):
        s: dict[int, int] = {}
        for src, dst in edges.itertuples(index=False):
            s[dst] = s.get(dst, 0) + r[src] // outdeg[src]
        r = {n: BASE + (D_NUM * v) // D_DEN for n, v in s.items()}
    return r


def _edges_df(sf_dir: str) -> pd.DataFrame:
    return duckdb.sql(
        f"""
WITH pairs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
               FROM read_parquet('{sf_dir}/orders.parquet') o
               JOIN read_parquet('{sf_dir}/lineitem.parquet') l ON o_orderkey = l_orderkey)
SELECT c*2 AS src, s*2+1 AS dst FROM pairs
UNION ALL SELECT s*2+1, c*2 FROM pairs"""
    ).fetchdf()


@pytest.mark.parametrize("n_iter", [1, 2, 3])
def test_pagerank_matches_local_reference(n_iter):
    from hepdata_validator_ray.pipelines.graph import pagerank

    got = pagerank(SF, n_iter=n_iter).to_pandas()
    ref = _local_pagerank(_edges_df(SF), n_iter)
    got_map = {
        (2 * int(k) if t == "c" else 2 * int(k) + 1): int(r)
        for t, k, r in zip(got["ntype"], got["key"], got["rank_fp"])
    }
    assert got_map == ref


def test_trade_edges_symmetric_distinct_with_degree():
    from hepdata_validator_ray.pipelines.graph import trade_edges

    e = trade_edges(SF).to_pandas()
    # distinct directed edges
    assert not e.duplicated(["src", "dst"]).any()
    # symmetric: every edge's reverse exists
    fwd = set(zip(e["src"], e["dst"]))
    assert all((d, s) in fwd for s, d in fwd)
    # outdeg column equals the actual per-src edge count
    deg = e.groupby("src")["dst"].size()
    assert (e.set_index("src")["outdeg"] == deg.reindex(e["src"]).to_numpy()).all()
    # namespace: even = customer, odd = supplier; bipartite edges only
    assert ((e["src"] % 2) != (e["dst"] % 2)).all()


def test_pagerank_hot_node_skew(tmp_path):
    """Star graph: ONE supplier trades with 2000 customers — the hot
    node's in-contributions all land in one dst group and its out-edges
    dominate one src bucket; ranks must still be exact."""
    from hepdata_validator_ray.pipelines.graph import pagerank

    n = 2000
    orders = pd.DataFrame({"o_orderkey": np.arange(n), "o_custkey": np.arange(n)})
    line = pd.DataFrame({"l_orderkey": np.arange(n), "l_suppkey": 7})
    orders.to_parquet(tmp_path / "orders.parquet", index=False)
    line.to_parquet(tmp_path / "lineitem.parquet", index=False)
    got = pagerank(str(tmp_path), n_iter=3).to_pandas()
    edges = pd.DataFrame(
        {
            "src": np.r_[np.arange(n) * 2, np.full(n, 15)],
            "dst": np.r_[np.full(n, 15), np.arange(n) * 2],
        }
    )
    ref = _local_pagerank(edges, 3)
    hub = got[got["ntype"] == "s"]
    assert len(hub) == 1 and int(hub["rank_fp"].iloc[0]) == ref[15]
    # every leaf has the same rank by symmetry
    leaf = got[got["ntype"] == "c"]["rank_fp"].unique()
    assert len(leaf) == 1 and int(leaf[0]) == ref[0]


# --------------------------------------------------------------------------
# Triangle counting
# --------------------------------------------------------------------------


def test_within_group_pairs_kernel():
    from hepdata_validator_ray.pipelines.graph import _within_group_pairs

    g = np.array([1, 1, 1, 2, 2, 3])
    fi, si = _within_group_pairs(g)
    pairs = sorted(zip(fi.tolist(), si.tolist()))
    # group 1 (rows 0-2): (0,1),(0,2),(1,2); group 2 (rows 3-4): (3,4)
    assert pairs == [(0, 1), (0, 2), (1, 2), (3, 4)]
    fi, si = _within_group_pairs(np.array([], dtype=np.int64))
    assert len(fi) == 0 and len(si) == 0
    fi, si = _within_group_pairs(np.array([7]))
    assert len(fi) == 0


def test_triangle_counts_crafted(tmp_path):
    """K4 on parts 1-4 (every node in C(3,2)=3 triangles) plus a star
    center 10 with leaves 11-13 sharing no order pairwise (0 triangles) —
    built as synthetic lineitem orders."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hepdata_validator_ray.pipelines.graph import triangle_counts

    rows = []
    oid = 0
    # K4: one order per pair (1,2),(1,3),(1,4),(2,3),(2,4),(3,4)
    for a, b in [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]:
        oid += 1
        rows += [(oid, a), (oid, b)]
    # star: center 10 with leaves 11,12,13 in separate orders
    for leaf in (11, 12, 13):
        oid += 1
        rows += [(oid, 10), (oid, leaf)]
    # duplicate lineitem rows must not create duplicate edges
    rows += [(1, 1), (1, 2)]
    t = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], type=pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = triangle_counts(str(tmp_path)).to_pandas().set_index("node")["n_tri"].to_dict()
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_matches_oracle_sf0001():
    from hepdata_validator_ray.pipelines.graph import triangle_counts, triangle_oracle_sql

    got = triangle_counts(SF).to_pandas().sort_values("node").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')")
    want = con.execute(triangle_oracle_sql()).df().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_triangle_orientation_bounds_wedges():
    """The degree-ordered orientation is the hot-node guard: a star graph
    (one celebrity co-purchased with everything) must generate ZERO wedges
    at the celebrity — every star edge orients leaf → center."""
    from hepdata_validator_ray.pipelines.graph import _within_group_pairs

    # simulate orientation: center degree 1000, leaves degree 1; every
    # edge (leaf, center) has rank(leaf) < rank(center) -> src=leaf
    # => out-adjacency of the center is empty, wedge count 0, vs C(1000,2)
    # = 499500 under a center-keyed adjacency.  (The orientation logic is
    # exercised end-to-end in the crafted/oracle tests; this pins the
    # combinatorial claim the docstring makes.)
    src = np.repeat(np.arange(1000), 1)  # each leaf one out-edge
    fi, si = _within_group_pairs(src)
    assert len(fi) == 0
