"""Distributed PageRank in exact fixed-point integer arithmetic.

The graph: distinct (customer, supplier) trade pairs derived from the
orders ⋈ lineitem large-large native hash join, doubled into an
undirected edge set (so every node has out-degree ≥ 1 — no dangling-mass
special case).  Node namespace: ``customer_key*2`` / ``supplier_key*2+1``
(the SQL oracle uses the same encoding).

Why fixed point: float PageRank sums contributions in engine-dependent
order, so the last ulps differ between Ray and DuckDB and a value-hash
gate can never pass.  Every operation here is int64 addition or floor
division —

    r'(v) = BASE + (D_NUM * Σ_{(u,v)∈E} r(u) // outdeg(u)) // D_DEN
    BASE  = ((D_DEN - D_NUM) * SCALE) // D_DEN

— so partial sums are associative at any batch split and the generated
DuckDB oracle (one unrolled CTE per iteration, identical constants and
parenthesization) is hash-exact by construction.  This is the template
for gating ANY iterative numeric algorithm: quantize, iterate in
integers, unroll the oracle.

Physical plan (designed for the 10^12-edge regime):
- the edge list is built by Ray Data's native shuffle join, mapped to
  both directed orientations, then deduplicated WITH out-degree attached
  in ONE src-keyed bucketed exchange and materialized once;
- every iteration is two exchanges: ranks meet edges on hash(src) via a
  sentinel-tagged union (the connected-components repartition-join
  pattern — no driver-side rank table, no broadcast of a node-scale
  side), then per-edge contributions sum per dst with map-side combine.
- iteration 1 skips the rank join entirely: r0 is the constant SCALE,
  so contributions fall out of the edge list alone.

Reference analogy: the reference engine has no graph operators; this is
part of the beyond-reference training-data/LLM operator family (graph
dedup/authority scoring over derived link graphs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

SCALE = 10**9
D_NUM, D_DEN = 85, 100
BASE = ((D_DEN - D_NUM) * SCALE) // D_DEN

#: sentinel tag for the rank/edge union (the connected-components trick:
#: int64 sentinel, not nulls — a null-bearing int64 column converts to
#: float64 in pandas and silently quantizes ids above 2^53)
_TAG = np.iinfo(np.int64).min


def _pq(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def trade_edges(sf_dir: str, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Deduplicated directed edge list (src, dst, outdeg), both
    orientations of every distinct customer–supplier trade pair.  One
    native shuffle join + one src-keyed bucketed exchange that fuses
    dedup and out-degree counting (all edges of one src are co-located,
    so outdeg is an in-bucket groupby, not a broadcast)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    orders = ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    line = ray.data.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey"])
    joined = orders.join(
        line,
        join_type="inner",
        num_partitions=derive_num_buckets(line, target_rows_per_bucket=500_000, lo=8),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def to_edges(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64) * 2
        s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64) * 2 + 1
        src = np.concatenate([c, s])
        dst = np.concatenate([s, c])
        return pa.Table.from_arrays([pa.array(src), pa.array(dst)], names=["src", "dst"])

    def dedup_and_degree(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).drop_duplicates(["src", "dst"])
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in ("src", "dst", "outdeg")}
            )
        deg = df.groupby("src")["dst"].transform("size").astype("int64")
        return pd.DataFrame(
            {"src": df["src"].astype("int64"), "dst": df["dst"].astype("int64"), "outdeg": deg}
        )

    nb = num_buckets if num_buckets is not None else derive_num_buckets(joined, target_rows_per_bucket=1_000_000, lo=16)
    return (
        joined.map_batches(to_edges, batch_format="pyarrow")
        # map-side dedup shrinks the exchange before the shuffle
        .map_batches(
            lambda t: pa.Table.from_pandas(
                t.to_pandas().drop_duplicates(["src", "dst"]), preserve_index=False
            ),
            batch_format="pyarrow",
        )
        .map_batches(lambda t: with_bucket(t, "src", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(dedup_and_degree, batch_format="pandas")
    )


def _sum_contribs_per_dst(contribs: "ray.data.Dataset", num_buckets: int) -> "ray.data.Dataset":
    """(dst, contrib) → (node, r) with the rank-update formula applied per
    dst; map-side partial sums bound the exchange at |nodes|×|batches|."""
    from hepdata_validator_ray.ops import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("dst").aggregate([("contrib", "sum")])
        return g.rename_columns(["dst", "contrib"])

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("dst", as_index=False)["contrib"].sum()
        r = BASE + (D_NUM * df["contrib"].to_numpy(dtype=np.int64)) // D_DEN
        return pa.Table.from_arrays(
            [pa.array(df["dst"].to_numpy(dtype=np.int64)), pa.array(r)], names=["node", "r"]
        )

    return bucketed_aggregate(contribs, "dst", partial, combine, num_buckets=num_buckets)


def pagerank(sf_dir: str, n_iter: int = 3, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Fixed-point PageRank over the trade graph; returns (ntype, key,
    rank_fp) where rank_fp is the int64 fixed-point rank after ``n_iter``
    exact-arithmetic iterations (hash-exact vs the generated oracle)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    edges = trade_edges(sf_dir).materialize()
    nb = num_buckets if num_buckets is not None else derive_num_buckets(edges, target_rows_per_bucket=1_000_000, lo=16)

    # iteration 1: r0 = SCALE for every node, so contrib = SCALE // outdeg
    # falls out of the edge list — no rank join needed
    def first_contribs(t: pa.Table) -> pa.Table:
        outdeg = t["outdeg"].to_numpy(zero_copy_only=False)
        contrib = SCALE // outdeg
        return pa.Table.from_arrays([t["dst"], pa.array(contrib)], names=["dst", "contrib"])

    ranks = _sum_contribs_per_dst(
        edges.map_batches(first_contribs, batch_format="pyarrow"), nb
    )

    # subsequent iterations: ranks meet edges on hash(src) via a tagged
    # union (dst == _TAG marks a rank row), contribs then sum per dst
    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["src"], t["dst"], t["outdeg"], pa.array(np.full(t.num_rows, _TAG, dtype=np.int64))],
            names=["src", "dst", "outdeg", "r"],
        )

    def tag_ranks(t: pa.Table) -> pa.Table:
        fill = pa.array(np.full(t.num_rows, _TAG, dtype=np.int64))
        return pa.Table.from_arrays([t["node"], fill, fill, t["r"]], names=["src", "dst", "outdeg", "r"])

    def attach_and_contrib(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        is_rank = df["dst"].to_numpy() == _TAG
        rmap = dict(zip(df.loc[is_rank, "src"], df.loc[is_rank, "r"]))
        e = df[~is_rank]
        if not len(e):
            return pd.DataFrame({"dst": pd.Series(dtype="int64"), "contrib": pd.Series(dtype="int64")})
        r = e["src"].map(rmap).to_numpy(dtype=np.int64)
        contrib = r // e["outdeg"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"dst": e["dst"].astype("int64"), "contrib": contrib})

    tagged_edges = edges.map_batches(tag_edges, batch_format="pyarrow")
    for _ in range(n_iter - 1):
        tagged_ranks = ranks.map_batches(tag_ranks, batch_format="pyarrow")
        contribs = (
            tagged_edges.union(tagged_ranks)
            .map_batches(lambda t: with_bucket(t, "src", nb), batch_format="pyarrow")
            .groupby(BUCKET_COL)
            .map_groups(attach_and_contrib, batch_format="pandas")
        )
        ranks = _sum_contribs_per_dst(contribs, nb)

    def decode(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        ntype = np.where(node % 2 == 0, "c", "s")
        return pa.Table.from_arrays(
            [pa.array(ntype), pa.array(node // 2), t["r"]], names=["ntype", "key", "rank_fp"]
        )

    return ranks.map_batches(decode, batch_format="pyarrow")


def pagerank_oracle_sql(n_iter: int = 3) -> str:
    """DuckDB oracle GENERATED next to the kernel: one unrolled CTE per
    iteration with the identical integer constants, floor divisions, and
    node encoding, so the two engines cannot drift."""
    ctes = [
        """pairs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""",
        """e AS (SELECT c*2 AS src, s*2+1 AS dst FROM pairs
         UNION ALL SELECT s*2+1 AS src, c*2 AS dst FROM pairs)""",
        "deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY src)",
        f"r0 AS (SELECT src AS node, {SCALE}::BIGINT AS r FROM deg)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""r{i} AS (SELECT e.dst AS node,
              ({BASE} + ({D_NUM} * sum(r{i-1}.r // d.outdeg)) // {D_DEN})::BIGINT AS r
       FROM e JOIN deg d USING (src) JOIN r{i-1} ON r{i-1}.node = e.src
       GROUP BY e.dst)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'c' ELSE 's' END AS ntype,
       (node // 2)::BIGINT AS key, r AS rank_fp FROM r{n_iter}"""
    )
