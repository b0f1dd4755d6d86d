"""TPC-H-shaped composite pipelines beyond the Q1/Q3/Q5/Q12/Q18 set in
``relational.py`` — each exercises a DISTINCT physical join/aggregate shape
the 100-TB engine needs, re-expressed Ray-Data-first:

- Q4  (``q4_late_orders``)        EXISTS semi-join where the predicate
  references BOTH sides (lineitem ship date vs its order's date), so the
  existence test needs one per-order reduction after the join;
- Q13 (``q13_customer_distribution``)  zero-preserving LEFT OUTER join +
  two-level count-of-counts;
- Q14 (``q14_promo_revenue``)     row-scale fact⋈dimension with a
  conditional numerator — the ratio stays RATIONAL (two int64 sums);
- Q19 (``q19_bracket_revenue``)   disjunctive multi-bracket predicate
  evaluated post-join over (brand, size, quantity);
- Q22 (``q22_idle_customers``)    native LEFT ANTI join + a broadcast
  scalar threshold computed exactly (integer cross-multiplication, no
  float average ever materializes).

Shared scale discipline (same as relational.py's q5/q3/q18/q12, cited
against reference hepdata_validator/__init__.py:159-182 only for message
grammar — these composites have no reference counterpart):

- every fact table streams column-pruned with footer-derived block counts;
- per-batch map-side collapse BEFORE any exchange, integer-exact
  (np.add/maximum.reduceat over key-sorted runs — no float accumulators);
- cross-batch duplicate partials are tolerated wherever the downstream
  operator is duplicate-safe (inner join on a unique dimension key, anti
  join existence, post-join re-reduction) so no pre-join exchange is spent
  on dedup;
- revenue/balance arithmetic is integer fixed-point (cents, fp4 =
  cents×(100−disc)) so partial sums associate and the DuckDB oracles are
  hash-exact;
- the matched-sentinel guard (impossible key −1 on both sides, −2 for a
  left side that must SURVIVE an anti join) keeps every native join total
  when a filter empties a side — Ray's hash shuffle drops the schema of
  all-empty sides (see rayfix.py); sentinels are stripped before the
  finale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Max, Sum

from hepdata_validator_ray.pipelines.relational import _int_group_sums, _pq


def _meta_rows(path: str) -> int:
    # footer-only row count: no Ray execution, no data pages read
    import pyarrow.parquet as _pqm

    return _pqm.ParquetFile(path).metadata.num_rows


def _nblocks(rows: int, target: int = 500_000, lo: int = 8, hi: int = 4096) -> int:
    return int(min(hi, max(lo, -(-rows // target))))


def _int_group_max(keys: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-key int64 max over key-sorted runs (the map-side collapse for
    existence/max partials — exact, no hashing, no float)."""
    if len(keys) == 0:
        return keys.astype(np.int64), vals.astype(np.int64)
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    return ks[starts], np.maximum.reduceat(vals[order], starts)


def _rev_fp4(price: np.ndarray, disc: np.ndarray) -> np.ndarray:
    """Integer fixed-point revenue: cents(price) × (100 − hundredths
    (discount)), units of 1e-4 dollars.  Prices/discounts carry exactly 2
    decimals by the data contract, so round-to-nearest has no .5 ties and
    partial sums associate exactly (the hash-exact oracle prerequisite)."""
    cents = np.round(price.astype(np.float64) * 100.0).astype(np.int64)
    d100 = np.round(disc.astype(np.float64) * 100.0).astype(np.int64)
    return cents * (100 - d100)


# fixed priority vocabulary: the packed-key ride (orderkey*8 + code) needs a
# GLOBALLY consistent code, so per-batch factorize is not an option; an
# unseen priority is a contract violation and raises (validation-engine
# semantics — the doc-kind router would have rejected the row upstream).
_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
_PRI_CODE = {p: i for i, p in enumerate(_PRIORITIES)}


def q4_late_orders(
    sf_dir: str,
    date_lo_us: int = 820_454_400_000_000,  # 1996-01-01 epoch microseconds
    date_hi_us: int = 836_179_200_000_000,  # 1996-07-01
    late_days: int = 90,
) -> "ray.data.Dataset":
    """TPC-H Q4-shaped order-priority audit: count orders (per priority) in
    an order-date window having AT LEAST ONE line item shipped more than
    ``late_days`` after the order date.  The EXISTS predicate references
    both sides (l_shipdate vs o_orderdate), so existence cannot be
    pre-collapsed on the lineitem side alone.

    Physical plan (two row-scale exchanges — the intrinsic Q4 cost):
    1. lineitem streams column-pruned; each batch collapses to
       (l_orderkey, max_ship_us) MAX partials — duplicates across batches
       are fine because step 3 re-reduces per order;
    2. partials ⋈ orders(window-filtered at the read, projected to three
       ints) is THE native hash join, sentinel-guarded;
    3. per-order ANY(late) via one int64-keyed groupby-Max over the packed
       key orderkey*8+pri_code (priority rides the unique key; a
       (string,int) two-column groupby would wedge Ray 2.49's hash
       aggregator — see validation.py's histogram-exchange note);
    4. the finale is a |priorities|-bounded count.

    Output (o_orderpriority, order_count)."""
    import pyarrow.compute as _pc

    late_us = np.int64(late_days) * 86_400_000_000

    def _li_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uk, mx = _int_group_max(ok, ship)
        return pa.table(
            {"l_orderkey": pa.array(uk, pa.int64()), "max_ship_us": pa.array(mx, pa.int64())}
        )

    def _orders_proj(t: pa.Table) -> pa.Table:
        pri = t["o_orderpriority"].to_pandas()
        unseen = ~pri.isin(_PRI_CODE)
        if unseen.any():
            raise ValueError(f"unseen o_orderpriority values: {sorted(pri[unseen].unique())}")
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "o_date_us": t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()),
                "pri_code": pa.array(pri.map(_PRI_CODE).to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    sent_li = ray.data.from_arrow(
        pa.table(
            {"l_orderkey": pa.array([-1], pa.int64()), "max_ship_us": pa.array([0], pa.int64())}
        )
    )
    sent_ord = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([-1], pa.int64()),
                "o_date_us": pa.array([0], pa.int64()),
                "pri_code": pa.array([0], pa.int64()),
            }
        )
    )

    lo_ts = pd.Timestamp(date_lo_us, unit="us")
    hi_ts = pd.Timestamp(date_hi_us, unit="us")
    li = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_orderkey", "l_shipdate"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "lineitem"))),
        )
        .map_batches(_li_partial, batch_format="pyarrow")
        .union(sent_li)
    )
    orders = (
        ray.data.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
            filter=(_pc.field("o_orderdate") >= _pc.scalar(lo_ts))
            & (_pc.field("o_orderdate") < _pc.scalar(hi_ts)),
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "orders"))),
        )
        .map_batches(_orders_proj, batch_format="pyarrow")
        .union(sent_ord)
    )
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "orders")), target=1_000_000),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def _pack_late(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        code = t["pri_code"].to_numpy(zero_copy_only=False)
        late = (
            t["max_ship_us"].to_numpy(zero_copy_only=False)
            > t["o_date_us"].to_numpy(zero_copy_only=False) + late_us
        ).astype(np.int64)
        # sentinel (−1, code 0) packs to −8; real orderkeys are ≥ 0
        return pa.table(
            {"pk": pa.array(ok * np.int64(8) + code, pa.int64()), "late": pa.array(late, pa.int64())}
        )

    per_order = (
        joined.map_batches(_pack_late, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Max("late", alias_name="late"))
    )

    def _finale(t: pa.Table) -> pa.Table:
        pk = t["pk"].to_numpy(zero_copy_only=False)
        late = t["late"].to_numpy(zero_copy_only=False)
        keep = (pk != -8) & (late == 1)
        code = pk[keep] % 8  # floor mod: non-negative for real keys
        uc, cnt = _int_group_sums(code, np.ones(len(code), dtype=np.int64))
        return pa.table(
            {
                "o_orderpriority": pa.array([_PRIORITIES[int(c)] for c in uc], pa.string()),
                "order_count": pa.array(cnt, pa.int64()),
            }
        )

    return (
        per_order.map_batches(_finale, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("order_count", alias_name="order_count"))
    )


def q13_customer_distribution(
    sf_dir: str,
    since_us: int = 915_148_800_000_000,  # 1999-01-01 epoch microseconds
) -> "ray.data.Dataset":
    """TPC-H Q13-shaped customer order-count distribution: per customer the
    number of orders placed since a date (ZERO-preserving — customers with
    no qualifying orders count in the c_count=0 bucket), then the
    count-of-counts histogram.

    Physical plan:
    1. orders window-filtered at the read collapse per batch to
       (o_custkey, cnt) sum partials — duplicates across batches are fine
       because step 3 re-sums per customer;
    2. customer(c_custkey) LEFT OUTER JOIN partials is the native hash
       join — the zero bucket comes from the preserved null side, NOT from
       a driver-side complement scan; matched sentinels (−1 both sides)
       keep the join total when the window is empty;
    3. per-customer total via one int64-keyed groupby-Sum (null → 0);
    4. the finale count-of-counts groupby is bounded by the max per-
       customer order count.

    Output (c_count, custdist)."""
    import pyarrow.compute as _pc

    def _ord_partial(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, s = _int_group_sums(ck, np.ones(len(ck), dtype=np.int64))
        return pa.table({"o_custkey": pa.array(uk, pa.int64()), "cnt": pa.array(s, pa.int64())})

    sent_ord = ray.data.from_arrow(
        pa.table({"o_custkey": pa.array([-1], pa.int64()), "cnt": pa.array([0], pa.int64())})
    )
    sent_cust = ray.data.from_arrow(pa.table({"c_custkey": pa.array([-1], pa.int64())}))

    orders = (
        ray.data.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_custkey", "o_orderdate"],
            filter=_pc.field("o_orderdate") >= _pc.scalar(pd.Timestamp(since_us, unit="us")),
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "orders"))),
        )
        .select_columns(["o_custkey"])
        .map_batches(_ord_partial, batch_format="pyarrow")
        .union(sent_ord)
    )
    cust = (
        ray.data.read_parquet(
            _pq(sf_dir, "customer"),
            columns=["c_custkey"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "customer"))),
        )
        .map_batches(lambda t: pa.table({"c_custkey": t["c_custkey"].cast(pa.int64())}), batch_format="pyarrow")
        .union(sent_cust)
    )
    joined = cust.join(
        orders,
        join_type="left_outer",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "customer")), target=1_000_000),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def _collapse(t: pa.Table) -> pa.Table:
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        # unmatched lefts carry null cnt — the zero bucket
        cnt = pc.fill_null(t["cnt"], 0).cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = ck != -1
        uk, s = _int_group_sums(ck[keep], cnt[keep])
        return pa.table({"c_custkey": pa.array(uk, pa.int64()), "c_count": pa.array(s, pa.int64())})

    per_cust = (
        joined.map_batches(_collapse, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("c_count", alias_name="c_count"))
    )

    def _hist_partial(t: pa.Table) -> pa.Table:
        c = t["c_count"].to_numpy(zero_copy_only=False)
        uk, s = _int_group_sums(c, np.ones(len(c), dtype=np.int64))
        return pa.table({"c_count": pa.array(uk, pa.int64()), "custdist": pa.array(s, pa.int64())})

    return (
        per_cust.map_batches(_hist_partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
    )


def q14_promo_revenue(
    sf_dir: str,
    date_lo_us: int = 820_454_400_000_000,  # 1996-01-01
    date_hi_us: int = 852_076_800_000_000,  # 1997-01-01
    promo_prefix: str = "PROMO",
) -> "ray.data.Dataset":
    """TPC-H Q14-shaped promotion-revenue share, per return flag: integer
    fixed-point promo and total revenue for ship-window line items whose
    part type starts with the promo prefix.  The promo/total RATIO is left
    rational — both int64 sums are exact, so the caller (or the oracle)
    divides without the engine ever committing to a float.

    Physical plan (one row-scale exchange): per-batch lineitem partials
    collapse on (l_partkey × returnflag-code-of-batch) — the returnflag
    vocabulary is carried per batch (q12's factorize discipline), and
    cross-batch duplicate partials are fine because each partial joins the
    unique part key exactly once; part projects to (key, promo∈{0,1})
    before the exchange; the finale is a |flags|-bounded groupby.

    Output (l_returnflag, n_lines, promo_rev_fp4, total_rev_fp4)."""

    def _li_partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (ship >= date_lo_us) & (ship < date_hi_us)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        fl = t["l_returnflag"].to_pandas().to_numpy()[keep]
        if not len(pk):
            return pa.table(
                {
                    "l_partkey": pa.array([], pa.int64()),
                    "l_returnflag": pa.array([], pa.string()),
                    "rev_fp4": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        rev = _rev_fp4(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep],
            t["l_discount"].to_numpy(zero_copy_only=False)[keep],
        )
        codes, uniq = pd.factorize(fl)
        packed = pk * np.int64(len(uniq) + 1) + codes
        uk, rsum = _int_group_sums(packed, rev)
        _, csum = _int_group_sums(packed, np.ones(len(pk), dtype=np.int64))
        return pa.table(
            {
                "l_partkey": pa.array(uk // (len(uniq) + 1), pa.int64()),
                "l_returnflag": pa.array(uniq[(uk % (len(uniq) + 1)).astype(np.int64)], pa.string()),
                "rev_fp4": pa.array(rsum, pa.int64()),
                "cnt": pa.array(csum, pa.int64()),
            }
        )

    def _part_proj(t: pa.Table) -> pa.Table:
        promo = pc.starts_with(t["p_type"], promo_prefix)
        return pa.table(
            {
                "p_partkey": t["p_partkey"].cast(pa.int64()),
                "promo": promo.cast(pa.int64()),
            }
        )

    sent_li = ray.data.from_arrow(
        pa.table(
            {
                "l_partkey": pa.array([-1], pa.int64()),
                "l_returnflag": pa.array(["<SENTINEL>"], pa.string()),
                "rev_fp4": pa.array([0], pa.int64()),
                "cnt": pa.array([0], pa.int64()),
            }
        )
    )
    sent_part = ray.data.from_arrow(
        pa.table({"p_partkey": pa.array([-1], pa.int64()), "promo": pa.array([0], pa.int64())})
    )

    li = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_partkey", "l_returnflag", "l_shipdate", "l_extendedprice", "l_discount"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "lineitem"))),
        )
        .map_batches(_li_partial, batch_format="pyarrow")
        .union(sent_li)
    )
    part = (
        ray.data.read_parquet(
            _pq(sf_dir, "part"),
            columns=["p_partkey", "p_type"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "part"))),
        )
        .map_batches(_part_proj, batch_format="pyarrow")
        .union(sent_part)
    )
    joined = li.join(
        part,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "part")), target=1_000_000),
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def _score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["l_partkey"], -1))
        rev = t["rev_fp4"].to_numpy(zero_copy_only=False)
        promo = t["promo"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "n_lines": t["cnt"],
                "promo_rev_fp4": pa.array(rev * promo, pa.int64()),
                "total_rev_fp4": pa.array(rev, pa.int64()),
            }
        )

    return (
        joined.map_batches(_score, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("n_lines", alias_name="n_lines"),
            Sum("promo_rev_fp4", alias_name="promo_rev_fp4"),
            Sum("total_rev_fp4", alias_name="total_rev_fp4"),
        )
    )


_Q19_BRACKETS = (
    ("Brand#12", 1, 11, 1, 5),
    ("Brand#23", 10, 20, 1, 10),
    ("Brand#34", 20, 30, 1, 15),
)


def q19_bracket_revenue(
    sf_dir: str,
    brackets: tuple[tuple[str, int, int, int, int], ...] = _Q19_BRACKETS,
) -> "ray.data.Dataset":
    """TPC-H Q19-shaped disjunctive-bracket revenue: integer fixed-point
    revenue of line items matching ANY (brand, quantity range, size range)
    bracket — the OR-of-conjunctions predicate that defeats simple
    read-time pruning because each disjunct constrains BOTH sides of the
    join.

    Physical plan (one row-scale exchange): lineitem collapses per batch
    on the packed key l_partkey*64 + quantity (quantities are integral and
    < 64 by the data contract, asserted), so the bracket's quantity term
    survives the collapse; part ships (key, brand, size); the brackets are
    evaluated vectorized post-join; the finale groups by brand
    (|brackets|-bounded).

    Output (p_brand, n_lines, rev_fp4) for matching lines."""

    def _li_partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qtyf = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        qty = np.round(qtyf).astype(np.int64)
        if not ((qty >= 0) & (qty < 64) & (qty == qtyf)).all():
            raise ValueError("l_quantity out of the integral [0, 64) data contract")
        rev = _rev_fp4(
            t["l_extendedprice"].to_numpy(zero_copy_only=False),
            t["l_discount"].to_numpy(zero_copy_only=False),
        )
        packed = pk * np.int64(64) + qty
        uk, rsum = _int_group_sums(packed, rev)
        _, csum = _int_group_sums(packed, np.ones(len(pk), dtype=np.int64))
        return pa.table(
            {
                "l_partkey": pa.array(uk // 64, pa.int64()),
                "qty": pa.array(uk % 64, pa.int64()),
                "rev_fp4": pa.array(rsum, pa.int64()),
                "cnt": pa.array(csum, pa.int64()),
            }
        )

    sent_li = ray.data.from_arrow(
        pa.table(
            {
                "l_partkey": pa.array([-1], pa.int64()),
                "qty": pa.array([0], pa.int64()),
                "rev_fp4": pa.array([0], pa.int64()),
                "cnt": pa.array([0], pa.int64()),
            }
        )
    )
    sent_part = ray.data.from_arrow(
        pa.table(
            {
                "p_partkey": pa.array([-1], pa.int64()),
                "p_brand": pa.array(["<SENTINEL>"], pa.string()),
                "p_size": pa.array([0], pa.int64()),
            }
        )
    )

    li = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "lineitem"))),
        )
        .map_batches(_li_partial, batch_format="pyarrow")
        .union(sent_li)
    )
    part = (
        ray.data.read_parquet(
            _pq(sf_dir, "part"),
            columns=["p_partkey", "p_brand", "p_size"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "part"))),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "p_partkey": t["p_partkey"].cast(pa.int64()),
                    "p_brand": t["p_brand"],
                    "p_size": t["p_size"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .union(sent_part)
    )
    joined = li.join(
        part,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "part")), target=1_000_000),
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        qty = df["qty"].to_numpy()
        size = df["p_size"].to_numpy()
        brand = df["p_brand"].to_numpy()
        keep = np.zeros(len(df), dtype=bool)
        for b, qlo, qhi, slo, shi in brackets:
            keep |= (brand == b) & (qty >= qlo) & (qty <= qhi) & (size >= slo) & (size <= shi)
        # the sentinel brand never matches a bracket, so it strips here; a
        # typed empty frame keeps the downstream aggregate's schema stable
        out = pd.DataFrame(
            {
                "p_brand": df["p_brand"][keep],
                "n_lines": df["cnt"][keep].astype("int64"),
                "rev_fp4": df["rev_fp4"][keep].astype("int64"),
            }
        )
        if len(out) == 0:
            return pd.DataFrame(
                {
                    "p_brand": pd.Series([], dtype=object),
                    "n_lines": pd.Series([], dtype="int64"),
                    "rev_fp4": pd.Series([], dtype="int64"),
                }
            )
        return out.groupby("p_brand", as_index=False).sum()

    return (
        joined.map_batches(_score, batch_format="pandas")
        .groupby("p_brand")
        .aggregate(Sum("n_lines", alias_name="n_lines"), Sum("rev_fp4", alias_name="rev_fp4"))
    )


def q22_idle_customers(
    sf_dir: str,
    since_us: int = 915_148_800_000_000,  # 1999-01-01
) -> "ray.data.Dataset":
    """TPC-H Q22-shaped idle high-balance customers: per nation, the count
    and total balance (integer cents) of customers whose balance is
    STRICTLY above the mean positive balance and who placed NO order since
    a date.

    Exactness: the mean never materializes — ``bal_cents · n_pos >
    sum_pos_cents`` is the integer cross-multiplied comparison (the KS
    numerator discipline), so float rounding can never flip a boundary
    customer.  The two scalars come from one bounded pre-pass (two int64s
    on the driver — broadcast by closure, not per-batch reshipped).

    Physical plan (one row-scale exchange): orders collapse per batch to
    custkey partials (duplicates across batches are fine — LEFT ANTI join
    is an existence test, duplicate right keys are idempotent); the
    threshold-filtered customer side meets them in Ray's native left_anti
    hash join.  Sentinels: the right side carries −1 to stay non-empty
    under an empty window; the LEFT side's sentinel is −2 — a key that
    exists on the right would be anti-dropped, and the left side must
    survive the join to pin the schema when the filter empties it.

    Output (cntrycode, numcust, totacctbal_cents)."""
    import pyarrow.compute as _pc

    # bounded scalar pre-pass: Σ positive cents and their count
    def _bal_partial(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64) * 100.0
        ).astype(np.int64)
        pos = cents > 0
        return pa.table(
            {
                "s": pa.array([int(cents[pos].sum())], pa.int64()),
                "n": pa.array([int(pos.sum())], pa.int64()),
            }
        )

    scal = (
        ray.data.read_parquet(_pq(sf_dir, "customer"), columns=["c_acctbal"])
        .map_batches(_bal_partial, batch_format="pyarrow")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )
    sum_pos = int(scal["s"] or 0)
    n_pos = int(scal["n"] or 0)

    def _cust_filter(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64) * 100.0
        ).astype(np.int64)
        keep = cents * np.int64(n_pos) > np.int64(sum_pos)
        return pa.table(
            {
                "c_custkey": t["c_custkey"].cast(pa.int64()).filter(pa.array(keep)),
                "cntrycode": t["c_nationkey"].cast(pa.int64()).filter(pa.array(keep)),
                "bal_cents": pa.array(cents[keep], pa.int64()),
            }
        )

    def _ord_keys(t: pa.Table) -> pa.Table:
        ck = np.unique(t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"o_custkey": pa.array(ck, pa.int64())})

    sent_cust = ray.data.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array([-2], pa.int64()),
                "cntrycode": pa.array([-1], pa.int64()),
                "bal_cents": pa.array([0], pa.int64()),
            }
        )
    )
    sent_ord = ray.data.from_arrow(pa.table({"o_custkey": pa.array([-1], pa.int64())}))

    cust = (
        ray.data.read_parquet(
            _pq(sf_dir, "customer"),
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "customer"))),
        )
        .map_batches(_cust_filter, batch_format="pyarrow")
        .union(sent_cust)
    )
    orders = (
        ray.data.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_custkey", "o_orderdate"],
            filter=_pc.field("o_orderdate") >= _pc.scalar(pd.Timestamp(since_us, unit="us")),
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "orders"))),
        )
        .select_columns(["o_custkey"])
        .map_batches(_ord_keys, batch_format="pyarrow")
        .union(sent_ord)
    )
    idle = cust.join(
        orders,
        join_type="left_anti",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "customer")), target=1_000_000),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def _finale(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["c_custkey"], -2)
        t = t.filter(keep)
        nat = t["cntrycode"].to_numpy(zero_copy_only=False)
        bal = t["bal_cents"].to_numpy(zero_copy_only=False)
        uk, s = _int_group_sums(nat, bal)
        _, c = _int_group_sums(nat, np.ones(len(nat), dtype=np.int64))
        return pa.table(
            {
                "cntrycode": pa.array(uk, pa.int64()),
                "numcust": pa.array(c, pa.int64()),
                "totacctbal_cents": pa.array(s, pa.int64()),
            }
        )

    return (
        idle.map_batches(_finale, batch_format="pyarrow")
        .groupby("cntrycode")
        .aggregate(
            Sum("numcust", alias_name="numcust"),
            Sum("totacctbal_cents", alias_name="totacctbal_cents"),
        )
    )
