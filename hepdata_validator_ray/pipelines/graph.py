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
import pyarrow.compute as pc
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

    # derive the bucket count from LINEITEM's metadata-only parquet count,
    # not from `joined` — count() on a joined dataset EXECUTES the join,
    # so the old form ran the native join twice (~2x the whole edge-build
    # wall).  |joined| <= |lineitem| exactly (each lineitem matches one
    # order), x2 orientations
    nb = num_buckets if num_buckets is not None else derive_num_buckets(line, target_rows_per_bucket=500_000, lo=16)
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


# --------------------------------------------------------------------------
# Triangle counting (degree-ordered wedge join)
# --------------------------------------------------------------------------


def _within_group_pairs(group_key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All ordered index pairs (i, j) with i < j inside each contiguous run
    of equal ``group_key`` values — fully vectorized (the repeat +
    segmented-arange kernel; no per-group Python).  Returns (first_idx,
    second_idx) into the input order; 'first' always precedes 'second'
    within its run, so a rank-sorted input yields rank-oriented pairs."""
    n = len(group_key)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    flag = np.ones(n, dtype=bool)
    flag[1:] = group_key[1:] != group_key[:-1]
    starts = np.maximum.accumulate(np.where(flag, np.arange(n), 0))
    j = np.arange(n) - starts  # in-group index == pairs ending at this row
    total = int(j.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    second = np.repeat(np.arange(n), j)
    pcum = np.concatenate([[0], np.cumsum(j)])[:-1]
    first = np.repeat(starts, j) + (np.arange(total) - np.repeat(pcum, j))
    return first, second


def copurchase_edges(sf_dir: str, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Distinct undirected co-purchase edges (a < b): parts appearing in the
    same order.  Two bucketed exchanges: rows of one order meet on
    hash(orderkey) (within-order pair generation is the vectorized
    segmented-pairs kernel — per-order part counts are small by the data
    contract, ≤ a dozen, so the per-order quadratic blowup is bounded);
    identical pairs from different orders then meet on hash(a) for the
    global distinct.  Map-side (order, part) dedup shrinks exchange 1."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    line = ray.data.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        line, target_rows_per_bucket=1_000_000, lo=16
    )

    def distinct_op(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["l_orderkey", "l_partkey"])
        return pa.Table.from_pandas(df, preserve_index=False)

    def order_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).drop_duplicates(["l_orderkey", "l_partkey"])
        df = df.sort_values(["l_orderkey", "l_partkey"], kind="mergesort")
        o = df["l_orderkey"].to_numpy(dtype=np.int64)
        p = df["l_partkey"].to_numpy(dtype=np.int64)
        fi, si = _within_group_pairs(o)
        out = pd.DataFrame({"a": p[fi], "b": p[si]}).drop_duplicates(["a", "b"])
        return out

    pairs = (
        line.map_batches(distinct_op, batch_format="pyarrow")
        .map_batches(lambda t: with_bucket(t, "l_orderkey", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(order_pairs, batch_format="pandas")
    )

    def pair_distinct(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).drop_duplicates(["a", "b"])
        return df.astype({"a": "int64", "b": "int64"})

    return (
        pairs.map_batches(lambda t: with_bucket(t, "a", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(pair_distinct, batch_format="pandas")
    )


def triangle_counts(
    sf_dir: str, num_buckets: int | None = None, return_degrees: bool = False
):
    """Per-node triangle counts over the co-purchase graph — the classic
    degree-ordered wedge join (Cohen / Suri–Vassilvitskii MR algorithm),
    expressed as bucketed exchanges end to end; no driver-side adjacency,
    no node-scale broadcast:

    1. degrees via one node-keyed exchange over both endpoints;
    2. degrees attach to edges via TWO tagged-union exchanges (the
       pagerank/connected-components repartition-join pattern — degree
       rows and edge rows meet on the same hash bucket);
    3. each edge orients low-rank → high-rank where rank = (deg, id):
       every triangle then materializes exactly once, as a wedge at its
       lowest-rank corner matched against one oriented edge, and wedge
       volume is the O(m^1.5) optimum instead of Σ deg² — the hot-node
       (celebrity-part) guard;
    4. wedges (out-adjacency pairs, rank-sorted so pair orientation is
       free) meet oriented edges on hash(pair) in one more tagged union;
       matches emit per-corner count partials, summed by a final
       node-keyed exchange.

    Counts are exact integers — the oracle is a DISTINCT-edges triple
    self-join, hash-exact by construction."""
    from hepdata_validator_ray.ops import (
        BUCKET_COL,
        bucketed_aggregate,
        derive_num_buckets,
        with_bucket,
    )

    edges = copurchase_edges(sf_dir, num_buckets=num_buckets).materialize()
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        edges, target_rows_per_bucket=500_000, lo=16
    )

    # -- 1. degrees -------------------------------------------------------
    def deg_partial(t: pa.Table) -> pa.Table:
        node = np.concatenate(
            [
                t["a"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["b"].to_numpy(zero_copy_only=False).astype(np.int64),
            ]
        )
        u, c = np.unique(node, return_counts=True)
        return pa.Table.from_arrays([pa.array(u), pa.array(c.astype(np.int64))], names=["node", "deg"])

    def deg_combine(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.drop(columns=[BUCKET_COL])
            .groupby("node", as_index=False)["deg"]
            .sum()
            .astype("int64")
        )

    degrees = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .map_batches(lambda t: with_bucket(t, "node", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(deg_combine, batch_format="pandas")
    ).materialize()

    # -- 2. attach degrees (two tagged-union exchanges) --------------------
    def tag_edges_a(t: pa.Table) -> pa.Table:
        fill = pa.array(np.full(t.num_rows, _TAG, dtype=np.int64))
        return pa.Table.from_arrays([t["a"], t["b"], fill], names=["k", "b", "deg"])

    def tag_deg(t: pa.Table) -> pa.Table:
        fill = pa.array(np.full(t.num_rows, _TAG, dtype=np.int64))
        return pa.Table.from_arrays([t["node"], fill, t["deg"]], names=["k", "b", "deg"])

    def attach_a(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        is_deg = df["b"].to_numpy() == _TAG
        dmap = dict(zip(df.loc[is_deg, "k"], df.loc[is_deg, "deg"]))
        e = df[~is_deg]
        if not len(e):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in ("a", "b", "da")})
        return pd.DataFrame(
            {
                "a": e["k"].astype("int64"),
                "b": e["b"].astype("int64"),
                "da": e["k"].map(dmap).astype("int64"),
            }
        )

    with_da = (
        edges.map_batches(tag_edges_a, batch_format="pyarrow")
        .union(degrees.map_batches(tag_deg, batch_format="pyarrow"))
        .map_batches(lambda t: with_bucket(t, "k", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(attach_a, batch_format="pandas")
    )

    def tag_edges_b(t: pa.Table) -> pa.Table:
        fill = pa.array(np.full(t.num_rows, _TAG, dtype=np.int64))
        return pa.Table.from_arrays([t["b"], t["a"], t["da"], fill], names=["k", "a", "da", "deg"])

    def tag_deg_b(t: pa.Table) -> pa.Table:
        fill = pa.array(np.full(t.num_rows, _TAG, dtype=np.int64))
        return pa.Table.from_arrays([t["node"], fill, fill, t["deg"]], names=["k", "a", "da", "deg"])

    def attach_b_and_orient(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        is_deg = df["da"].to_numpy() == _TAG
        dmap = dict(zip(df.loc[is_deg, "k"], df.loc[is_deg, "deg"]))
        e = df[~is_deg]
        if not len(e):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in ("src", "dst", "dd")})
        a = e["a"].to_numpy(dtype=np.int64)
        b = e["k"].to_numpy(dtype=np.int64)
        da = e["da"].to_numpy(dtype=np.int64)
        db = e["k"].map(dmap).to_numpy(dtype=np.int64)
        # rank = (deg, id): lower rank becomes src
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        dd = np.where(a_first, db, da)
        return pd.DataFrame({"src": src, "dst": dst, "dd": dd})

    oriented = (
        with_da.map_batches(tag_edges_b, batch_format="pyarrow")
        .union(degrees.map_batches(tag_deg_b, batch_format="pyarrow"))
        .map_batches(lambda t: with_bucket(t, "k", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(attach_b_and_orient, batch_format="pandas")
    ).materialize()

    # -- 3. wedges at the lowest-rank corner -------------------------------
    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if not len(df):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in ("y", "z", "u")})
        # rank-sort out-adjacency: pair (first, second) is then oriented
        df = df.sort_values(["src", "dd", "dst"], kind="mergesort")
        src = df["src"].to_numpy(dtype=np.int64)
        dst = df["dst"].to_numpy(dtype=np.int64)
        fi, si = _within_group_pairs(src)
        return pd.DataFrame({"y": dst[fi], "z": dst[si], "u": src[fi]})

    wedge_ds = (
        oriented.map_batches(lambda t: with_bucket(t, "src", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(wedges, batch_format="pandas")
    )

    # -- 4. wedge ⋈ edge on the PACKED pair, then per-node count ------------
    # (y, z) packs losslessly into one int64 — node ids are < 2^32 by data
    # contract (part keys; guarded below).  The packed pair IS the exchange
    # key and the match value: wedge rows ship 2 int64 columns instead of 4
    # and the in-bucket match is a single-int64 isin, not a two-column merge.
    _PAIR_MASK = np.uint64(0xFFFFFFFF)

    def _pack(y: np.ndarray, z: np.ndarray) -> np.ndarray:
        yu = y.astype(np.uint64)
        zu = z.astype(np.uint64)
        if len(yu) and (int(yu.max()) >> 32 or int(zu.max()) >> 32):
            raise ValueError(
                "triangle_counts packs node ids into 32-bit halves; remap ids "
                "below 2^32 (or switch the pair key to the hashed-pair path)"
            )
        return ((yu << np.uint64(32)) | zu).view(np.int64)

    def key_wedges(t: pa.Table) -> pa.Table:
        y = t["y"].to_numpy(zero_copy_only=False)
        z = t["z"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays([pa.array(_pack(y, z)), t["u"]], names=["pk", "u"])

    def key_edges(t: pa.Table) -> pa.Table:
        y = t["src"].to_numpy(zero_copy_only=False)
        z = t["dst"].to_numpy(zero_copy_only=False)
        fill = pa.array(np.full(t.num_rows, _TAG, dtype=np.int64))
        return pa.Table.from_arrays([pa.array(_pack(y, z)), fill], names=["pk", "u"])

    def match_and_count(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        is_edge = df["u"].to_numpy() == _TAG
        pk = df["pk"].to_numpy(dtype=np.int64)
        w_pk = pk[~is_edge]
        hit = np.isin(w_pk, pk[is_edge])
        m_pk = w_pk[hit]
        if not len(m_pk):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in ("node", "cnt")})
        mu = df["u"].to_numpy(dtype=np.int64)[~is_edge][hit]
        upk = m_pk.view(np.uint64)
        node = np.concatenate(
            [mu, (upk >> np.uint64(32)).astype(np.int64), (upk & _PAIR_MASK).astype(np.int64)]
        )
        u, c = np.unique(node, return_counts=True)
        return pd.DataFrame({"node": u.astype(np.int64), "cnt": c.astype(np.int64)})

    matched = (
        wedge_ds.map_batches(key_wedges, batch_format="pyarrow")
        .union(oriented.map_batches(key_edges, batch_format="pyarrow"))
        .map_batches(lambda t: with_bucket(t, "pk", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(match_and_count, batch_format="pandas")
    )

    def final_sum(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("node", as_index=False)["cnt"].sum()
        return pa.Table.from_pandas(
            pd.DataFrame({"node": df["node"].astype("int64"), "n_tri": df["cnt"].astype("int64")}),
            preserve_index=False,
        )

    tri = bucketed_aggregate(matched, "node", None, final_sum, num_buckets=max(8, nb // 2))
    return (tri, degrees) if return_degrees else tri


#: shared CTE prefix of the triangle-family oracles — DISTINCT co-purchase
#: edges + the canonical a < b < c triple self-join (one row per triangle,
#: orientation-invariant) — factored so the two spellings cannot desync
_TRI_CTES = """
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
edges AS (
  SELECT DISTINCT l1.p AS a, l2.p AS b
  FROM li l1 JOIN li l2 ON l1.o = l2.o AND l1.p < l2.p
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
)"""


def triangle_oracle_sql() -> str:
    """DuckDB oracle: the shared triangle CTEs, counted per corner."""
    return _TRI_CTES + """
SELECT node, count(*)::BIGINT AS n_tri
FROM (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
GROUP BY node"""


def clustering_oracle_sql() -> str:
    """DuckDB twin of clustering_coefficient: the shared triangle CTEs +
    distinct-neighbor degrees, lcc spelled identically."""
    return _TRI_CTES + """,
tcnt AS (SELECT node, count(*)::BIGINT AS n_tri
         FROM (SELECT x AS node FROM tri
               UNION ALL SELECT y FROM tri
               UNION ALL SELECT z FROM tri)
         GROUP BY node),
deg AS (SELECT node, count(*)::BIGINT AS deg
        FROM (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)
        GROUP BY node)
SELECT d.node, d.deg, coalesce(t.n_tri, 0)::BIGINT AS n_tri,
       2.0 * coalesce(t.n_tri, 0) / (d.deg * (d.deg - 1)) AS lcc
FROM deg d LEFT JOIN tcnt t ON t.node = d.node
WHERE d.deg >= 2"""


def frequent_part_pairs(
    sf_dir: str, k: int = 100, num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Market-basket frequent pairs: the top-k part pairs by SUPPORT
    (number of distinct orders containing both) — the association-rule
    counting pass (Apriori k=2).

    Same partitioning as copurchase_edges — rows of one order meet on
    hash(orderkey), within-order pairs come from the vectorized
    segmented-pairs kernel (per-order part counts are bounded by the
    data contract, so the quadratic blowup is too) — but each pair is
    counted ONCE PER ORDER (map-side per-bucket groupby partials).

    The pair-keyed finale is ONE bucketed exchange (bucket on the packed
    pair key) with an in-bucket sum + per-bucket top-k; a pair's partials
    all land in one bucket, so the global top-k is a subset of the
    nb×k per-bucket winners the driver merges.  (Replaces a native
    two-key groupby + global sort — two all-to-alls whose fixed latency
    dominated the gate slot: 55 s → ~3 s at sf0.01.)"""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    line = ray.data.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        line, target_rows_per_bucket=1_000_000, lo=16
    )

    def order_pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).drop_duplicates(["l_orderkey", "l_partkey"])
        df = df.sort_values(["l_orderkey", "l_partkey"], kind="mergesort")
        o = df["l_orderkey"].to_numpy(dtype=np.int64)
        p = df["l_partkey"].to_numpy(dtype=np.int64)
        fi, si = _within_group_pairs(o)
        if not len(fi):
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                 "n": pd.Series(dtype="int64")}
            )
        # one support count per (order, pair) — parts are distinct and
        # sorted within the order, so (p[fi], p[si]) is already canonical
        out = (
            pd.DataFrame({"a": p[fi], "b": p[si]})
            .groupby(["a", "b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype("int64")
        # packed pair key for the one-exchange finale (partkeys < 2^31 by
        # the TPC-H contract, so a<<32|b is injective)
        out["pk"] = (out["a"].to_numpy(np.int64) << np.int64(32)) | out["b"].to_numpy(np.int64)
        return out

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        g = df.groupby(["a", "b"], as_index=False)["n"].sum()
        return g.sort_values(["n", "a", "b"], ascending=[False, True, True]).head(k)

    partials = (
        line.map_batches(lambda t: with_bucket(t, "l_orderkey", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(order_pair_counts, batch_format="pandas")
    )
    winners = (
        partials.map_batches(lambda t: with_bucket(t, "pk", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()  # bounded: nb × k rows
        .sort_values(["n", "a", "b"], ascending=[False, True, True])
        .head(k)
        .reset_index(drop=True)
        .astype({"a": "int64", "b": "int64", "n": "int64"})
    )
    return ray.data.from_pandas(winners)


def kcore_membership(
    sf_dir: str, k: int = 45, max_iter: int = 8, num_buckets: int | None = None
) -> "ray.data.Dataset":
    """k-CORE decomposition of the co-purchase trade graph — the classic
    peel: repeatedly delete nodes with degree < k (and their edges) until
    fixpoint; output the surviving nodes with their in-core degree
    (node, deg_core).  The k-core is ORDER-INDEPENDENT (the fixpoint is
    unique no matter the peel order), which is exactly what makes it
    gate-exact: the oracle unrolls ``max_iter`` prune rounds statically
    and extra rounds are no-ops.

    Fully distributed peel, no node-scale driver state: every round is
    (1) one src-keyed degree exchange over the shrinking edge table,
    (2) the dead-node table (distributed — worst case it IS node-scale)
    meets the edges in TWO tagged-union exchanges (on src, then dst — the
    pagerank/CC repartition-join pattern) that drop dead endpoints
    in-bucket.  The driver sees only the per-round dead COUNT; edges are
    materialized between rounds like every iterative pipeline here.
    Raises if the peel hasn't converged after ``max_iter`` rounds (the
    oracle unrolls exactly that many — silence would desync)."""
    from hepdata_validator_ray.ops import (
        BUCKET_COL,
        derive_num_buckets,
        grouped_value_counts,
        with_bucket,
    )

    _TAG = np.iinfo(np.int64).min

    cur = trade_edges(sf_dir).select_columns(["src", "dst"]).materialize()
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        cur, target_rows_per_bucket=1_000_000, lo=16
    )

    def remove_dead(edges: "ray.data.Dataset", dead: "ray.data.Dataset", key: str, other: str):
        def edge_rows(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [pc.cast(t[key], pa.int64()), pc.cast(t[other], pa.int64())],
                names=["kk", "oo"],
            )

        def dead_rows(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [
                    pc.cast(t["src"], pa.int64()),
                    pa.array(np.full(t.num_rows, _TAG, np.int64)),
                ],
                names=["kk", "oo"],
            )

        u = edges.map_batches(edge_rows, batch_format="pyarrow").union(
            dead.map_batches(dead_rows, batch_format="pyarrow")
        )

        def prune(df: pd.DataFrame) -> pd.DataFrame:
            df = df.drop(columns=[BUCKET_COL])
            deadk = df.loc[df["oo"] == _TAG, "kk"].unique()
            live = df[(df["oo"] != _TAG) & (~df["kk"].isin(deadk))]
            return pd.DataFrame(
                {
                    key: live["kk"].to_numpy(np.int64),
                    other: live["oo"].to_numpy(np.int64),
                }
            )

        return (
            u.map_batches(lambda t: with_bucket(t, "kk", nb), batch_format="pyarrow")
            .groupby(BUCKET_COL)
            .map_groups(prune, batch_format="pandas")
        )

    converged = False
    for _ in range(max_iter):
        deg = grouped_value_counts(cur, "src")
        dead = deg.map_batches(
            lambda t: t.filter(pc.less(t["cnt"], pa.scalar(k, pa.int64()))).select(["src"]),
            batch_format="pyarrow",
        ).materialize()
        if dead.count() == 0:
            converged = True
            break
        cur = remove_dead(cur, dead, "src", "dst")
        cur = remove_dead(cur, dead, "dst", "src").materialize()
    if not converged:
        raise ValueError(
            f"k-core peel did not converge within max_iter={max_iter} rounds; "
            f"raise max_iter (and unroll the oracle identically)"
        )
    out = grouped_value_counts(cur, "src")
    return out.map_batches(
        lambda t: t.rename_columns(["node", "deg_core"]), batch_format="pyarrow"
    )


def kcore_oracle_sql(k: int = 45, max_iter: int = 8) -> str:
    """Generated DuckDB oracle: the identical edge construction, then
    ``max_iter`` statically-unrolled prune rounds (extra rounds no-op at
    fixpoint — k-core is peel-order independent)."""
    # every CTE is MATERIALIZED: DuckDB inlines CTEs by default and e{i}
    # references e{i-1} three times, so the naive unroll re-evaluates the
    # chain 3^max_iter times (measured: fd exhaustion at 8 rounds)
    parts = [
        """
WITH pairs AS MATERIALIZED (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
e0 AS MATERIALIZED (SELECT c AS src, s AS dst FROM pairs UNION ALL SELECT s, c FROM pairs)"""
    ]
    for i in range(1, max_iter + 1):
        parts.append(
            f""",
bad{i} AS MATERIALIZED (SELECT src FROM e{i-1} GROUP BY src HAVING count(*) < {k}),
e{i} AS MATERIALIZED (SELECT e.src, e.dst FROM e{i-1} e
        WHERE e.src NOT IN (SELECT src FROM bad{i})
          AND e.dst NOT IN (SELECT src FROM bad{i}))"""
        )
    parts.append(
        f"""
SELECT src AS node, count(*)::BIGINT AS deg_core FROM e{max_iter} GROUP BY src"""
    )
    return "".join(parts)


# --------------------------------------------------------------------------
# BFS hop distance (level-synchronous frontier expansion)
# --------------------------------------------------------------------------


def bfs_hops(
    sf_dir: str, max_hops: int = 4, seed_mod: int = 7, num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Minimum hop distance from a deterministic seed set (``node %
    seed_mod == 0``) over the undirected trade graph — the multi-source
    BFS every graph-curation pass needs (e.g. "documents within k link
    hops of a trusted set").

    Level-synchronous frontier expansion, the textbook distributed BFS:
    the frontier at level i is exactly the nodes first settled at
    distance i, so each edge is relaxed at most once per endpoint
    settlement and total work is O(|E| · settled fraction), not
    O(|E| · max_hops).  Each level is two bucketed exchanges, both
    node/edge-scale and fully distributed:

    1. frontier meets edges on hash(src) via the sentinel-tagged union
       (the pagerank/connected-components pattern — no driver-side
       frontier, no node-scale broadcast);
    2. candidate (dst, i) rows min-combine with the settled table on
       hash(node); map-side partials bound the exchange.

    The settled table is materialized per level (it feeds both the next
    frontier and the final result); everything is int64, so the
    recursive-CTE oracle (same seed rule, same bounded depth) is
    hash-exact.  Unreached nodes are absent on both engines.

    Output (ntype, key, hops) in the pagerank node decoding.
    """
    from hepdata_validator_ray.ops import BUCKET_COL, bucketed_aggregate, derive_num_buckets, with_bucket

    edges = trade_edges(sf_dir, num_buckets=num_buckets).materialize()
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        edges, target_rows_per_bucket=500_000, lo=16
    )

    def seed_rows(t: pa.Table) -> pa.Table:
        # seeds drawn from the src column: e holds both orientations, so
        # src ranges over EVERY node (same closure as the SQL seed CTE)
        src = t["src"].to_numpy(zero_copy_only=False)
        s = np.unique(src[src % seed_mod == 0])
        return pa.Table.from_arrays(
            [pa.array(s), pa.array(np.zeros(len(s), dtype=np.int64))], names=["node", "d"]
        )

    def min_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("node").aggregate([("d", "min")])
        return g.rename_columns(["node", "d"])

    # settled(node, d): map-side partial min bounds every exchange
    settled = bucketed_aggregate(
        edges.map_batches(seed_rows, batch_format="pyarrow"),
        "node",
        lambda t: min_combine(t),
        min_combine,
        num_buckets=nb,
    ).materialize()

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["src"], t["dst"], pa.array(np.full(t.num_rows, _TAG, dtype=np.int64))],
            names=["src", "dst", "d"],
        )

    tagged_edges = edges.map_batches(tag_edges, batch_format="pyarrow")

    for level in range(1, max_hops + 1):
        front_d = level - 1

        def tag_frontier(t: pa.Table, _fd: int = front_d) -> pa.Table:
            keep = pc.equal(t["d"], pa.scalar(_fd, pa.int64()))
            f = t.filter(keep)
            fill = pa.array(np.full(f.num_rows, _TAG, dtype=np.int64))
            return pa.Table.from_arrays([f["node"], fill, f["d"]], names=["src", "dst", "d"])

        def expand(df: pd.DataFrame, _lvl: int = level) -> pa.Table:
            # returns Arrow so the settled ∪ candidates union is a single
            # block type (mixed pandas/arrow blocks break the batcher)
            df = df.drop(columns=[BUCKET_COL])
            is_front = df["dst"].to_numpy() == _TAG
            fset = set(df.loc[is_front, "src"].tolist())
            if not fset:
                return pa.Table.from_pydict(
                    {"node": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
                )
            e = df[~is_front]
            hit = e.loc[e["src"].isin(fset), "dst"]
            # in-bucket dedup bounds the min-combine exchange at the
            # bucket's distinct-dst count
            nodes = np.unique(hit.to_numpy(dtype=np.int64))
            return pa.Table.from_pydict(
                {"node": pa.array(nodes), "d": pa.array(np.full(len(nodes), _lvl, dtype=np.int64))}
            )

        candidates = (
            tagged_edges.union(settled.map_batches(tag_frontier, batch_format="pyarrow"))
            .map_batches(lambda t: with_bucket(t, "src", nb), batch_format="pyarrow")
            .groupby(BUCKET_COL)
            .map_groups(expand, batch_format="pandas")
        )
        settled = bucketed_aggregate(
            settled.union(candidates),
            "node",
            lambda t: min_combine(t),
            min_combine,
            num_buckets=nb,
        ).materialize()

    def decode(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        ntype = np.where(node % 2 == 0, "c", "s")
        return pa.Table.from_arrays(
            [pa.array(ntype), pa.array(node // 2), t["d"]], names=["ntype", "key", "hops"]
        )

    return settled.map_batches(decode, batch_format="pyarrow")


def bfs_oracle_sql(max_hops: int = 4, seed_mod: int = 7) -> str:
    """Generated DuckDB oracle: identical edge construction and seed rule,
    bounded-depth recursive CTE (UNION dedups (node, d) pairs, so the walk
    is bounded by |nodes| · (max_hops+1)), min-hop per node."""
    return f"""
WITH RECURSIVE
pairs AS MATERIALIZED (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
e AS MATERIALIZED (SELECT c AS src, s AS dst FROM pairs UNION ALL SELECT s, c FROM pairs),
walk(node, d) AS (
  SELECT DISTINCT src AS node, 0 AS d FROM e WHERE src % {seed_mod} = 0
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.node WHERE w.d < {max_hops}
)
SELECT CASE WHEN node % 2 = 0 THEN 'c' ELSE 's' END AS ntype,
       (node // 2)::BIGINT AS key, min(d)::BIGINT AS hops
FROM walk GROUP BY node"""


# --------------------------------------------------------------------------
# Degree assortativity (Pearson correlation of endpoint degrees over edges)
# --------------------------------------------------------------------------


def degree_assortativity(sf_dir: str, num_buckets: int | None = None) -> pd.DataFrame:
    """Degree assortativity of the undirected trade graph — the Pearson
    correlation of (deg(src), deg(dst)) over every directed edge: r > 0
    means hubs link to hubs (social-graph shape), r < 0 means hubs fan
    out to leaves (bipartite/star shape, the expected signature here).
    The one-number structural-health check for any derived link graph.

    Plan: trade_edges already carries deg(src) (=outdeg; the graph holds
    both orientations, so out-degree IS degree).  deg(dst) attaches via
    ONE sentinel-tagged union exchange on hash(dst) against the distinct
    (node, deg) table — the pagerank join pattern, no node-scale
    broadcast.  The five correlation sums reduce per bucket in int64
    (bounded: deg² · bucket rows < 2⁶³ needs deg < 2³¹·√…, fine for any
    real degree at these bucket sizes — asserted, not assumed) and merge
    as Python ints on the driver (one row per bucket); the textbook r is
    spelled identically in the HUGEINT SQL twin.  Since both edge
    orientations are present, sx = sy — a free internal consistency
    assert on both engines.

    Output one row: (n_edges, r)."""
    import math

    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    edges = trade_edges(sf_dir, num_buckets=num_buckets).materialize()
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        edges, target_rows_per_bucket=500_000, lo=16
    )

    def deg_rows(t: pa.Table) -> pa.Table:
        # distinct (node, deg) inside the block; the exchange dedups fully
        df = pd.DataFrame(
            {
                "src": t["src"].to_numpy(zero_copy_only=False),
                "dst": np.full(t.num_rows, _TAG, dtype=np.int64),
                "outdeg": t["outdeg"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates("src")
        return pa.Table.from_pandas(df, preserve_index=False)

    def tag_edges(t: pa.Table) -> pa.Table:
        # key edges by DST so they co-locate with the dst node's deg row
        return pa.Table.from_arrays(
            [t["dst"], t["src"], t["outdeg"]], names=["src", "dst", "outdeg"]
        )

    def sums(df: pd.DataFrame) -> pa.Table:
        df = df.drop(columns=[BUCKET_COL])
        is_deg = df["dst"].to_numpy() == _TAG
        dmap = (
            df[is_deg].drop_duplicates("src").set_index("src")["outdeg"]
        )
        e = df[~is_deg]
        if not len(e):
            z = pa.array([0], pa.int64())
            return pa.Table.from_pydict(
                {k: z for k in ("n", "sx", "sy", "sxx", "syy", "sxy")}
            )
        # here src column = original dst (the co-location key)
        da = e["src"].map(dmap).to_numpy(dtype=np.int64)  # deg of dst endpoint
        db = e["outdeg"].to_numpy(dtype=np.int64)  # deg of src endpoint
        assert da.max(initial=0) < (1 << 31) and db.max(initial=0) < (1 << 31)
        return pa.Table.from_pydict(
            {
                "n": pa.array([len(e)], pa.int64()),
                "sx": pa.array([int(db.sum())], pa.int64()),
                "sy": pa.array([int(da.sum())], pa.int64()),
                "sxx": pa.array([int((db * db).sum())], pa.int64()),
                "syy": pa.array([int((da * da).sum())], pa.int64()),
                "sxy": pa.array([int((da * db).sum())], pa.int64()),
            }
        )

    parts = (
        edges.map_batches(tag_edges, batch_format="pyarrow")
        .union(edges.map_batches(deg_rows, batch_format="pyarrow"))
        .map_batches(lambda t: with_bucket(t, "src", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(sums, batch_format="pandas")
        .to_pandas()
    )  # one row per bucket
    n = int(parts["n"].sum())
    sx, sy = int(parts["sx"].sum()), int(parts["sy"].sum())
    sxx, syy, sxy = int(parts["sxx"].sum()), int(parts["syy"].sum()), int(parts["sxy"].sum())
    assert sx == sy, "both orientations present ⇒ symmetric sums"
    den2 = float(n * sxx - sx * sx) * float(n * syy - sy * sy)
    r = (n * sxy - sx * sy) / math.sqrt(den2) if den2 > 0.0 else 0.0
    return pd.DataFrame([{"n_edges": n, "r": r}]).astype({"n_edges": "int64", "r": "float64"})


def assortativity_oracle_sql() -> str:
    """Generated DuckDB oracle: same distinct-edge construction, degrees
    by GROUP BY, five HUGEINT sums, identical r expression."""
    return """
WITH pairs AS MATERIALIZED (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
e AS MATERIALIZED (SELECT c AS src, s AS dst FROM pairs UNION ALL SELECT s, c FROM pairs),
deg AS (SELECT src AS node, count(*)::BIGINT AS d FROM e GROUP BY src),
j AS (SELECT d1.d AS dx, d2.d AS dy FROM e
      JOIN deg d1 ON d1.node = e.src JOIN deg d2 ON d2.node = e.dst),
s AS (SELECT count(*)::BIGINT AS n, sum(dx) AS sx, sum(dy) AS sy,
             sum(dx*dx) AS sxx, sum(dy*dy) AS syy, sum(dx*dy) AS sxy FROM j)
SELECT n AS n_edges,
  CASE WHEN (n*sxx - sx*sx)::DOUBLE * (n*syy - sy*sy)::DOUBLE > 0.0
       THEN (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx)::DOUBLE * (n*syy - sy*sy)::DOUBLE)
       ELSE 0.0 END AS r
FROM s"""


def clustering_coefficient(sf_dir: str, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Per-node local clustering coefficient over the co-purchase graph:
    lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) — the fraction of a node's
    neighbor pairs that are themselves connected; near 1 flags cliques
    (bundle/template purchases), near 0 tree-like reach.  Defined for
    deg ≥ 2; 0-triangle nodes REPORT 0 (they are the interesting ones),
    which is why this is a degrees-LEFT-JOIN-triangles, not a filter on
    the triangle table.

    Reuses triangle_counts' internal degree table (return_degrees=True —
    ONE co-purchase build feeds both legs); the two bounded node tables
    meet in one node-keyed tagged exchange (deg rows carry n_tri = −1).

    Output (node, deg, n_tri, lcc)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    tri, degrees = triangle_counts(sf_dir, num_buckets=num_buckets, return_degrees=True)
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        degrees, target_rows_per_bucket=500_000, lo=16
    )

    def tag_tri(t: pa.Table) -> pa.Table:
        fill = pa.array(np.full(t.num_rows, -1, dtype=np.int64))
        return pa.Table.from_arrays([t["node"], fill, t["n_tri"]], names=["node", "deg", "n_tri"])

    def tag_deg(t: pa.Table) -> pa.Table:
        fill = pa.array(np.full(t.num_rows, -1, dtype=np.int64))
        return pa.Table.from_arrays([t["node"], t["deg"], fill], names=["node", "deg", "n_tri"])

    def join_and_score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        is_tri = df["deg"].to_numpy() < 0
        t = df[is_tri]
        d = df[~is_tri]
        d = d[d["deg"] >= 2]
        if not len(d):
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype="int64"),
                    "deg": pd.Series(dtype="int64"),
                    "n_tri": pd.Series(dtype="int64"),
                    "lcc": pd.Series(dtype="float64"),
                }
            )
        tmap = dict(zip(t["node"], t["n_tri"]))
        n_tri = d["node"].map(tmap).fillna(0).astype("int64")
        deg = d["deg"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "node": d["node"].to_numpy(np.int64),
                "deg": deg,
                "n_tri": n_tri.to_numpy(np.int64),
                "lcc": 2.0 * n_tri.to_numpy(np.int64) / (deg * (deg - 1)),
            }
        )

    return (
        degrees.map_batches(tag_deg, batch_format="pyarrow")
        .union(tri.map_batches(tag_tri, batch_format="pyarrow"))
        .map_batches(lambda t: with_bucket(t, "node", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(join_and_score, batch_format="pandas")
    )


def adamic_adar_topk(
    sf_dir: str,
    k: int = 50,
    max_deg: int = 64,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Link prediction / co-purchase affinity over the part–order
    bipartite graph: for every part pair sharing ≥1 order, the
    common-order count and the Adamic–Adar score Σ_o 1/ln(|o|) — a pair
    met in small baskets signals affinity; giant baskets say little
    (that IS the 1/ln weighting).  Top-k pairs under the INTEGER
    (n_common DESC, p1, p2) order, so the cutoff never rides a float.

    Wedge enumeration is Σ |o|² — the hot-node hazard — so orders with
    more than ``max_deg`` distinct parts are excluded (the hub cap,
    MIRRORED in the twin's WHERE; basket size is naturally small, the
    cap guards the adversarial tail).  Pipeline: order-keyed exchange
    over lineitem (dedup + degree + vectorized within-group pairs,
    p1 < p2 free from the sort) → pair-keyed exchange (pairs pack into
    one int64) whose buckets emit scores AND their own top-k partial;
    the driver merges the bounded n_buckets×k candidate table
    (partial-top-k discipline: a pair lives wholly in one bucket).

    Output (p1, p2, n_common, aa_score)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    line = ray.data.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        line, target_rows_per_bucket=500_000, lo=16
    )

    def sc_rows(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "s": t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "c": t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        ).drop_duplicates()  # map-side dedup shrinks the exchange
        return pa.Table.from_pandas(df, preserve_index=False)

    def pairs_per_order(df: pd.DataFrame) -> pd.DataFrame:
        df = (
            df.drop(columns=[BUCKET_COL])
            .drop_duplicates(["s", "c"])
            .sort_values(["s", "c"], kind="mergesort")
        )
        deg = df.groupby("s")["c"].transform("size").astype("int64")
        df = df[(deg >= 2) & (deg <= max_deg)]
        if not len(df):
            return pd.DataFrame({col: pd.Series(dtype="int64") for col in ("pk", "deg")})
        s_arr = df["s"].to_numpy(np.int64)
        c_arr = df["c"].to_numpy(np.int64)
        d_arr = df.groupby("s")["c"].transform("size").to_numpy(np.int64)
        fi, si = _within_group_pairs(s_arr)
        p1, p2 = c_arr[fi], c_arr[si]  # sorted within s → p1 < p2
        if len(p1) and (int(p1.max()) >> 32 or int(p2.max()) >> 32):
            raise ValueError("adamic_adar_topk packs part ids into 32-bit halves")
        pk = ((p1.astype(np.uint64) << np.uint64(32)) | p2.astype(np.uint64)).view(np.int64)
        return pd.DataFrame({"pk": pk, "deg": d_arr[fi]})

    def bucket_scores_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if not len(df):
            return pd.DataFrame(
                {
                    "p1": pd.Series(dtype="int64"),
                    "p2": pd.Series(dtype="int64"),
                    "n_common": pd.Series(dtype="int64"),
                    "aa_score": pd.Series(dtype="float64"),
                }
            )
        g = df.assign(w=1.0 / np.log(df["deg"].to_numpy(np.float64))).groupby(
            "pk", as_index=False
        ).agg(n_common=("deg", "size"), aa_score=("w", "sum"))
        upk = g["pk"].to_numpy(np.int64).view(np.uint64)
        g["p1"] = (upk >> np.uint64(32)).astype(np.int64)
        g["p2"] = (upk & np.uint64(0xFFFFFFFF)).astype(np.int64)
        g = g.sort_values(
            ["n_common", "p1", "p2"], ascending=[False, True, True], kind="mergesort"
        ).head(k)
        g["n_common"] = g["n_common"].astype("int64")
        return g[["p1", "p2", "n_common", "aa_score"]]

    cands = (
        line.map_batches(sc_rows, batch_format="pyarrow")
        .map_batches(lambda t: with_bucket(t, "s", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(pairs_per_order, batch_format="pandas")
        .map_batches(lambda t: with_bucket(t, "pk", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(bucket_scores_topk, batch_format="pandas")
        .to_pandas()
    )  # ≤ n_buckets × k rows — the bounded merge
    if not len(cands):
        return pd.DataFrame(
            {
                "p1": pd.Series(dtype="int64"),
                "p2": pd.Series(dtype="int64"),
                "n_common": pd.Series(dtype="int64"),
                "aa_score": pd.Series(dtype="float64"),
            }
        )
    return (
        cands.sort_values(["n_common", "p1", "p2"], ascending=[False, True, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def adamic_adar_oracle_sql(k: int = 50, max_deg: int = 64) -> str:
    """DuckDB twin: distinct bipartite edges, capped degrees, pair join
    under p1 < p2, the identical 1/ln(deg) sum and integer rank order."""
    return f"""
WITH e AS (SELECT DISTINCT l_orderkey AS s, l_partkey AS c FROM lineitem),
d AS (SELECT s, count(*)::BIGINT AS deg FROM e GROUP BY s),
el AS (SELECT s, deg FROM d WHERE deg >= 2 AND deg <= {max_deg}),
p AS (SELECT e1.c AS p1, e2.c AS p2, el.deg
      FROM el JOIN e e1 ON e1.s = el.s JOIN e e2 ON e2.s = el.s AND e1.c < e2.c),
g AS (SELECT p1, p2, count(*)::BIGINT AS n_common, sum(1.0 / ln(deg)) AS aa_score
      FROM p GROUP BY p1, p2),
r AS (SELECT *, row_number() OVER (ORDER BY n_common DESC, p1, p2) AS rk FROM g)
SELECT p1, p2, n_common, aa_score FROM r WHERE rk <= {k}"""


def rich_club(
    sf_dir: str, ks: tuple[int, ...] = (2, 4, 8, 16), num_buckets: int | None = None
) -> pd.DataFrame:
    """Rich-club coefficient of the undirected trade graph: for each
    degree threshold k, φ(k) = 2·E_k / (N_k(N_k−1)) — the edge density
    among nodes of degree > k.  A rising φ(k) says the hubs form their
    own dense core (oligopoly trade structure); flat/falling says hubs
    reach outward.  Complements assortativity (one number) with the
    full threshold profile.

    Reuses the assortativity plan verbatim: trade_edges carries deg(src),
    deg(dst) attaches via the SAME dst-keyed sentinel-tagged exchange; a
    bucket emits per-k counts of edges with BOTH endpoint degrees > k,
    counted once per undirected edge via the src < dst orientation pick
    (node parity makes exactly one orientation satisfy it).  N_k comes
    from the bounded distinct (node, deg) table.  k levels with no
    qualifying node emit no row (mirrored GROUP BY-over-empty); N_k = 1
    takes the CASE 0.0.

    Output (k, n_k, e_k, phi)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    ks = tuple(sorted(ks))
    edges = trade_edges(sf_dir, num_buckets=num_buckets).materialize()
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        edges, target_rows_per_bucket=500_000, lo=16
    )

    def deg_rows(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "src": t["src"].to_numpy(zero_copy_only=False),
                "dst": np.full(t.num_rows, _TAG, dtype=np.int64),
                "outdeg": t["outdeg"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates("src")
        return pa.Table.from_pandas(df, preserve_index=False)

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["dst"], t["src"], t["outdeg"]], names=["src", "dst", "outdeg"]
        )

    def per_k_counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        is_deg = df["dst"].to_numpy() == _TAG
        dmap = df[is_deg].drop_duplicates("src").set_index("src")["outdeg"]
        e = df[~is_deg]
        # undirected-once: keep the orientation whose ORIGINAL src < dst
        # (columns are swapped here: src holds the original dst)
        e = e[e["dst"].to_numpy() < e["src"].to_numpy()]
        if not len(e):
            return pd.DataFrame({"k": pd.Series(dtype="int64"), "e_k": pd.Series(dtype="int64")})
        d_dst = e["src"].map(dmap).to_numpy(dtype=np.int64)
        d_src = e["outdeg"].to_numpy(dtype=np.int64)
        lo = np.minimum(d_src, d_dst)
        return pd.DataFrame(
            {"k": np.asarray(ks, dtype=np.int64), "e_k": [int((lo > k).sum()) for k in ks]}
        )

    parts = (
        edges.map_batches(tag_edges, batch_format="pyarrow")
        .union(edges.map_batches(deg_rows, batch_format="pyarrow"))
        .map_batches(lambda t: with_bucket(t, "src", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_k_counts, batch_format="pandas")
        .to_pandas()
    )  # |ks| × n_buckets, bounded
    # N_k from the DEGREE HISTOGRAM (bounded by distinct degree values):
    # per-batch distinct (node, deg) partials, a node-keyed exchange
    # dedups fully, buckets emit (deg, n) — never node-scale driver rows
    from hepdata_validator_ray.ops import bucketed_aggregate

    def node_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "node": t["src"].to_numpy(zero_copy_only=False),
                "deg": t["outdeg"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates("node")
        return pa.Table.from_pandas(df, preserve_index=False)

    def deg_hist(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates("node")
        g = df.groupby("deg", as_index=False).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    dh = bucketed_aggregate(edges, "node", node_partial, deg_hist).to_pandas()
    dh = dh.groupby("deg", as_index=False)["n"].sum()
    out = []
    e_k = parts.groupby("k")["e_k"].sum() if len(parts) else pd.Series(dtype="int64")
    dv = dh["deg"].to_numpy(np.int64)
    dn = dh["n"].to_numpy(np.int64)
    for k in ks:
        n_k = int(dn[dv > k].sum())
        if n_k == 0:
            continue
        ek = int(e_k.get(k, 0))
        phi = 2.0 * ek / (n_k * (n_k - 1.0)) if n_k >= 2 else 0.0
        out.append({"k": k, "n_k": n_k, "e_k": ek, "phi": phi})
    if not out:
        return pd.DataFrame(
            {
                "k": pd.Series(dtype="int64"),
                "n_k": pd.Series(dtype="int64"),
                "e_k": pd.Series(dtype="int64"),
                "phi": pd.Series(dtype="float64"),
            }
        )
    return pd.DataFrame(out).astype({"k": "int64", "n_k": "int64", "e_k": "int64", "phi": "float64"})
