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


# ---------------------------------------------------------------------------
# Batch 2: Q7 / Q10 / Q15 / Q16 / Q17 / Q21 shapes (no partsupp /
# commitdate columns exist in the synthetic tables, so Q16's exclusion
# list and Q21's lateness predicate are reshaped onto the available
# columns — the PHYSICAL shapes are the point, and each is new:
#
# - Q7  two independent FK enrichment paths over one fact (supplier via
#       broadcast dim, customer via a chained native join);
# - Q10 bounded aggregate → deterministic top-k → dimension gather-back
#       (the enrichment read is filtered to the k winner keys);
# - Q15 global-scalar argmax with TIES kept (equality filter, no sort);
# - Q16 exact distinct-pair counting + native LEFT ANTI exclusion;
# - Q17 self-aggregate threshold: the fact joins ITS OWN per-key
#       aggregate, comparison integer cross-multiplied;
# - Q21 per-group multi-entity existence logic evaluated VECTORIZED on
#       the join's hash-partition colocation guarantee (documented).
# ---------------------------------------------------------------------------


def q7_nation_volume(
    sf_dir: str,
    nation_a: int = 0,
    nation_b: int = 1,
    date_lo_us: int = 788_918_400_000_000,  # 1995-01-01 epoch microseconds
    date_hi_us: int = 915_148_800_000_000,  # 1999-01-01
) -> "ray.data.Dataset":
    """TPC-H Q7-shaped nation-pair trade volume: integer fixed-point
    revenue per (supplier nation, customer nation, ship year) for line
    items shipped in a date window where one end sits in ``nation_a`` and
    the other in ``nation_b`` (both directions, reported separately).

    The shape: ONE fact enriched through TWO independent FK paths —
    supplier→nation rides a broadcast dict (supplier is the classic small
    dimension, q5's discipline), while customer→nation must chain through
    orders, i.e. two native hash joins (orders⋈customer on custkey, then
    lineitem partials⋈that on orderkey) because orders and lineitem are
    the genuinely unbroadcastable row-scale tables.

    Map-side collapse packs (orderkey, snat-bit, year-index) into one
    int64 (years in the window are bounded and asserted), so cross-batch
    duplicate partials are fine — each packed key joins its order exactly
    once and the finale re-sums per small group.

    Output (supp_nation, cust_nation, l_year, n_lines, rev_fp4)."""
    import pyarrow.compute as _pc

    ylo = pd.Timestamp(date_lo_us, unit="us").year
    nyears = pd.Timestamp(date_hi_us - 1, unit="us").year - ylo + 1
    if nyears < 1 or nyears > 16:
        raise ValueError("date window must span 1..16 calendar years")
    span = np.int64(2 * nyears)

    supp = pd.read_parquet(_pq(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    supp_nat_ref = ray.put(
        dict(zip(supp["s_suppkey"].to_numpy(), supp["s_nationkey"].to_numpy().astype(np.int64)))
    )

    def _li_partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (ship >= date_lo_us) & (ship < date_hi_us)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        snat = pd.Series(sk).map(ray.get(supp_nat_ref)).fillna(-1).to_numpy(dtype=np.int64)
        sel = (snat == nation_a) | (snat == nation_b)
        if not sel.any():
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "code": pa.array([], pa.int64()),
                    "rev_fp4": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)[keep][sel].astype(np.int64)
        ship_y = (
            ship[keep][sel].astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
            + 1970
        )
        code = (snat[sel] == nation_b).astype(np.int64) * nyears + (ship_y - ylo)
        rev = _rev_fp4(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep][sel],
            t["l_discount"].to_numpy(zero_copy_only=False)[keep][sel],
        )
        packed = ok * span + code
        uk, rsum = _int_group_sums(packed, rev)
        _, csum = _int_group_sums(packed, np.ones(len(packed), dtype=np.int64))
        return pa.table(
            {
                "l_orderkey": pa.array(uk // span, pa.int64()),
                "code": pa.array(uk % span, pa.int64()),
                "rev_fp4": pa.array(rsum, pa.int64()),
                "cnt": pa.array(csum, pa.int64()),
            }
        )

    sent_li = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([-1], pa.int64()),
                "code": pa.array([0], pa.int64()),
                "rev_fp4": pa.array([0], pa.int64()),
                "cnt": pa.array([0], pa.int64()),
            }
        )
    )
    sent_ord = ray.data.from_arrow(
        pa.table({"o_orderkey": pa.array([-1], pa.int64()), "o_custkey": pa.array([-1], pa.int64())})
    )
    sent_cust = ray.data.from_arrow(
        pa.table({"c_custkey": pa.array([-1], pa.int64()), "cnat": pa.array([-1], pa.int64())})
    )

    cust = (
        ray.data.read_parquet(
            _pq(sf_dir, "customer"),
            columns=["c_custkey", "c_nationkey"],
            filter=_pc.field("c_nationkey").isin([nation_a, nation_b]),
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "customer"))),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "c_custkey": t["c_custkey"].cast(pa.int64()),
                    "cnat": t["c_nationkey"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .union(sent_cust)
    )
    orders = (
        ray.data.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_orderkey", "o_custkey"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "orders"))),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                    "o_custkey": t["o_custkey"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .union(sent_ord)
    )
    ord_cust = orders.join(
        cust,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "orders")), target=1_000_000),
        on=("o_custkey",),
        right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "cnat"])

    li = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "lineitem"))),
        )
        .map_batches(_li_partial, batch_format="pyarrow")
        .union(sent_li)
    )
    joined = li.join(
        ord_cust,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "orders")), target=1_000_000),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["l_orderkey"].to_numpy()
        cnat = df["cnat"].to_numpy()
        code = df["code"].to_numpy()
        snat = np.where(code >= nyears, nation_b, nation_a)
        # sentinel strip + the cross-nation predicate (snat, cnat both
        # restricted to {a, b} upstream, so "different ends" is exact)
        keep = (ok != -1) & (cnat >= 0) & (snat != cnat)
        if not keep.any():
            return pd.DataFrame(
                {
                    "gk": pd.Series([], dtype="int64"),
                    "n_lines": pd.Series([], dtype="int64"),
                    "rev_fp4": pd.Series([], dtype="int64"),
                }
            )
        # code = direction·nyears + year-index already IS the group key
        gk = code[keep]
        uk, rs = _int_group_sums(gk, df["rev_fp4"].to_numpy()[keep])
        _, cs = _int_group_sums(gk, df["cnt"].to_numpy()[keep])
        return pd.DataFrame({"gk": uk, "n_lines": cs, "rev_fp4": rs})

    agg = (
        joined.map_batches(_score, batch_format="pandas")
        .groupby("gk")
        .aggregate(Sum("n_lines", alias_name="n_lines"), Sum("rev_fp4", alias_name="rev_fp4"))
    )

    def _finale(t: pa.Table) -> pa.Table:
        gk = t["gk"].to_numpy(zero_copy_only=False)
        sb = gk // nyears
        return pa.table(
            {
                "supp_nation": pa.array(np.where(sb == 1, nation_b, nation_a), pa.int64()),
                "cust_nation": pa.array(np.where(sb == 1, nation_a, nation_b), pa.int64()),
                "l_year": pa.array(ylo + gk % nyears, pa.int64()),
                "n_lines": t["n_lines"].cast(pa.int64()),
                "rev_fp4": t["rev_fp4"].cast(pa.int64()),
            }
        )

    return agg.map_batches(_finale, batch_format="pyarrow")


def q10_returned_revenue(
    sf_dir: str,
    date_lo_us: int = 820_454_400_000_000,  # 1996-01-01
    date_hi_us: int = 828_316_800_000_000,  # 1996-04-01
    k: int = 20,
) -> pd.DataFrame:
    """TPC-H Q10-shaped returned-item report: top-``k`` customers by
    integer fixed-point revenue over RETURNED ('R') line items whose
    orders fall in a quarter, enriched with customer name and nation.

    The shape: row-scale fact join → customer-bounded aggregate →
    deterministic top-k (revenue DESC, custkey ASC breaks ties exactly as
    the oracle's ORDER BY) → dimension GATHER-BACK, where the enrichment
    read is pruned to the k winner keys (a filtered dimension read, not a
    shuffle join — k is tiny by contract).  A per-batch partial top-k
    prefilter bounds the global sort input to n_blocks·k rows, so the
    sort never sees the customer-scale table.

    Returns a pandas DataFrame (c_custkey, c_name, c_nationkey,
    revenue_fp4) sorted by (revenue_fp4 DESC, c_custkey ASC)."""
    import pyarrow.compute as _pc

    def _li_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = _rev_fp4(
            t["l_extendedprice"].to_numpy(zero_copy_only=False),
            t["l_discount"].to_numpy(zero_copy_only=False),
        )
        uk, rsum = _int_group_sums(ok, rev)
        return pa.table(
            {"l_orderkey": pa.array(uk, pa.int64()), "rev_fp4": pa.array(rsum, pa.int64())}
        )

    sent_li = ray.data.from_arrow(
        pa.table({"l_orderkey": pa.array([-1], pa.int64()), "rev_fp4": pa.array([0], pa.int64())})
    )
    sent_ord = ray.data.from_arrow(
        pa.table({"o_orderkey": pa.array([-1], pa.int64()), "o_custkey": pa.array([-1], pa.int64())})
    )

    li = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
            filter=_pc.field("l_returnflag") == _pc.scalar("R"),
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "lineitem"))),
        )
        .select_columns(["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(_li_partial, batch_format="pyarrow")
        .union(sent_li)
    )
    orders = (
        ray.data.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
            filter=(_pc.field("o_orderdate") >= _pc.scalar(pd.Timestamp(date_lo_us, unit="us")))
            & (_pc.field("o_orderdate") < _pc.scalar(pd.Timestamp(date_hi_us, unit="us"))),
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "orders"))),
        )
        .select_columns(["o_orderkey", "o_custkey"])
        .map_batches(
            lambda t: pa.table(
                {
                    "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                    "o_custkey": t["o_custkey"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .union(sent_ord)
    )
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "orders")), target=1_000_000),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def _cust_partial(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        rev = t["rev_fp4"].to_numpy(zero_copy_only=False)
        keep = ck != -1  # sentinel strip
        uk, rsum = _int_group_sums(ck[keep], rev[keep])
        return pa.table(
            {"c_custkey": pa.array(uk, pa.int64()), "revenue_fp4": pa.array(rsum, pa.int64())}
        )

    per_cust = (
        joined.map_batches(_cust_partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("revenue_fp4", alias_name="revenue_fp4"))
    )

    def _topk_partial(df: pd.DataFrame) -> pd.DataFrame:
        # partial top-k per batch: the global sort input is n_blocks·k
        return df.sort_values(
            ["revenue_fp4", "c_custkey"], ascending=[False, True]
        ).head(k)

    winners = (
        per_cust.map_batches(_topk_partial, batch_format="pandas")
        .sort(["revenue_fp4", "c_custkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    if len(winners) == 0:
        return pd.DataFrame(
            {
                "c_custkey": pd.Series([], dtype="int64"),
                "c_name": pd.Series([], dtype=object),
                "c_nationkey": pd.Series([], dtype="int64"),
                "revenue_fp4": pd.Series([], dtype="int64"),
            }
        )
    keys = [int(x) for x in winners["c_custkey"].tolist()]
    dim = (
        ray.data.read_parquet(
            _pq(sf_dir, "customer"),
            columns=["c_custkey", "c_name", "c_nationkey"],
            filter=_pc.field("c_custkey").isin(keys),
        )
        .to_pandas()
    )
    dim["c_custkey"] = dim["c_custkey"].astype("int64")
    dim["c_nationkey"] = dim["c_nationkey"].astype("int64")
    out = winners.merge(dim, on="c_custkey", how="inner")
    return (
        out[["c_custkey", "c_name", "c_nationkey", "revenue_fp4"]]
        .sort_values(["revenue_fp4", "c_custkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


def q15_top_suppliers(
    sf_dir: str,
    date_lo_us: int = 820_454_400_000_000,  # 1996-01-01
    date_hi_us: int = 828_316_800_000_000,  # 1996-04-01
) -> pd.DataFrame:
    """TPC-H Q15-shaped top supplier(s): the supplier(s) whose integer
    fixed-point revenue over a ship-date quarter equals the GLOBAL
    maximum — ties kept, exactly like the reference query's
    total_revenue = (SELECT max(...)) equality (no sort, no limit).

    The shape: row-scale fact collapses to a |suppliers|-bounded
    aggregate (materialized once — both the scalar max and the equality
    filter read it, never the fact again); the argmax SET is tiny by
    construction (ties at the exact int64 maximum), so the name
    gather-back is a key-pruned dimension read.  The sentinel
    (suppkey −1, rev 0) doubles as the empty-window guard: revenue of a
    real supplier is strictly positive, so when the window prunes
    everything the max is the sentinel's 0 and the final strip returns
    zero rows with a stable schema.

    Returns a pandas DataFrame (s_suppkey, s_name, total_rev_fp4) sorted
    by s_suppkey."""

    def _li_partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (ship >= date_lo_us) & (ship < date_hi_us)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        rev = _rev_fp4(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep],
            t["l_discount"].to_numpy(zero_copy_only=False)[keep],
        )
        uk, rsum = _int_group_sums(sk, rev)
        return pa.table(
            {"s_suppkey": pa.array(uk, pa.int64()), "total_rev_fp4": pa.array(rsum, pa.int64())}
        )

    sent = ray.data.from_arrow(
        pa.table({"s_suppkey": pa.array([-1], pa.int64()), "total_rev_fp4": pa.array([0], pa.int64())})
    )
    per_supp = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "lineitem"))),
        )
        .map_batches(_li_partial, batch_format="pyarrow")
        .union(sent)
        .groupby("s_suppkey")
        .aggregate(Sum("total_rev_fp4", alias_name="total_rev_fp4"))
        .materialize()
    )
    mx = per_supp.max("total_rev_fp4")
    winners = (
        per_supp.filter(expr=f"total_rev_fp4 == {int(mx)}")
        .to_pandas()
    )
    winners = winners[winners["s_suppkey"] != -1]
    if len(winners) == 0:
        return pd.DataFrame(
            {
                "s_suppkey": pd.Series([], dtype="int64"),
                "s_name": pd.Series([], dtype=object),
                "total_rev_fp4": pd.Series([], dtype="int64"),
            }
        )
    import pyarrow.compute as _pc

    keys = [int(x) for x in winners["s_suppkey"].tolist()]
    dim = ray.data.read_parquet(
        _pq(sf_dir, "supplier"),
        columns=["s_suppkey", "s_name"],
        filter=_pc.field("s_suppkey").isin(keys),
    ).to_pandas()
    dim["s_suppkey"] = dim["s_suppkey"].astype("int64")
    out = winners.merge(dim, on="s_suppkey", how="inner")
    return (
        out[["s_suppkey", "s_name", "total_rev_fp4"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


def q16_supplier_diversity(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q16-shaped supplier diversity: DISTINCT supplier count per
    part (brand, size), excluding deficit suppliers (s_acctbal < 0 — the
    synthetic stand-in for Q16's complaint list; no partsupp table exists,
    so the part↔supplier association is the lineitem fact itself).

    The shape: exact distinct-pair counting + native LEFT ANTI exclusion:

    1. lineitem projects to (l_partkey, l_suppkey) and each batch emits
       its DISTINCT pairs (lexsort collapse — cross-batch duplicates are
       fine, step 3 re-distincts);
    2. pairs ⋈ part(brand→code, size) native on partkey — brand codes
       parse from the fixed 'Brand#N' vocabulary (raise on contract
       violation, q4's discipline) so the attr rides one packed int64
       attr·2³¹ + suppkey (suppkey < 2³¹ asserted);
    3. ONE groupby on the packed key is the exact global distinct;
    4. the unpacked (attr, suppkey) rows anti-join the deficit-supplier
       keys natively on suppkey (left sentinel −2 survives by the q22
       rule); the finale is an |attrs|-bounded count.

    Output (p_brand, p_size, supplier_cnt)."""
    import pyarrow.compute as _pc

    def _li_pairs(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(pk) and not (sk < np.int64(2) ** 31).all():
            raise ValueError("l_suppkey out of the < 2^31 packing contract")
        # batch-local distinct pairs via lexsort
        order = np.lexsort((sk, pk))
        pk, sk = pk[order], sk[order]
        first = np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])]
        return pa.table(
            {
                "l_partkey": pa.array(pk[first], pa.int64()),
                "l_suppkey": pa.array(sk[first], pa.int64()),
            }
        )

    def _part_proj(t: pa.Table) -> pa.Table:
        brand = t["p_brand"].to_pandas()
        code = pd.to_numeric(brand.str.removeprefix("Brand#"), errors="coerce")
        if code.isna().any():
            raise ValueError(f"unseen p_brand values: {sorted(brand[code.isna()].unique())}")
        size = t["p_size"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(size) and not ((size >= 0) & (size < 64)).all():
            raise ValueError("p_size out of the [0, 64) packing contract")
        return pa.table(
            {
                "p_partkey": t["p_partkey"].cast(pa.int64()),
                "attr": pa.array(code.to_numpy(dtype=np.int64) * 64 + size, pa.int64()),
            }
        )

    sent_li = ray.data.from_arrow(
        pa.table({"l_partkey": pa.array([-1], pa.int64()), "l_suppkey": pa.array([-2], pa.int64())})
    )
    sent_part = ray.data.from_arrow(
        pa.table({"p_partkey": pa.array([-1], pa.int64()), "attr": pa.array([0], pa.int64())})
    )

    li = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_partkey", "l_suppkey"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "lineitem"))),
        )
        .map_batches(_li_pairs, batch_format="pyarrow")
        .union(sent_li)
    )
    part = (
        ray.data.read_parquet(
            _pq(sf_dir, "part"),
            columns=["p_partkey", "p_brand", "p_size"],
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

    def _pack(t: pa.Table) -> pa.Table:
        attr = t["attr"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        # the join sentinel (attr 0, suppkey −2) packs to −2: negative,
        # impossible for real pairs, stripped after the distinct
        packed = attr * (np.int64(2) ** 31) + sk
        return pa.table({"pair": pa.array(np.unique(packed), pa.int64())})

    from ray.data.aggregate import Count

    distinct = (
        joined.map_batches(_pack, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Count(alias_name="n"))
    )

    def _unpack(t: pa.Table) -> pa.Table:
        pairs = t["pair"].to_numpy(zero_copy_only=False)
        keep = pairs >= 0
        pairs = pairs[keep]
        return pa.table(
            {
                "attr": pa.array(pairs // (np.int64(2) ** 31), pa.int64()),
                "suppkey": pa.array(pairs % (np.int64(2) ** 31), pa.int64()),
            }
        )

    # left sentinel −2 (never on the right, whose keys are ≥ 0 real plus
    # its own −1 sentinel) survives the anti join → schema pinned even
    # when the distinct table is empty of real rows
    sent_left = ray.data.from_arrow(
        pa.table({"attr": pa.array([-1], pa.int64()), "suppkey": pa.array([-2], pa.int64())})
    )
    pairs_tbl = distinct.map_batches(_unpack, batch_format="pyarrow").union(sent_left)

    def _excl_proj(t: pa.Table) -> pa.Table:
        bal = t["s_acctbal"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"x_suppkey": t["s_suppkey"].cast(pa.int64()).filter(pa.array(bal < 0))}
        )

    sent_excl = ray.data.from_arrow(pa.table({"x_suppkey": pa.array([-1], pa.int64())}))
    excl = (
        ray.data.read_parquet(
            _pq(sf_dir, "supplier"),
            columns=["s_suppkey", "s_acctbal"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "supplier"))),
        )
        .map_batches(_excl_proj, batch_format="pyarrow")
        .union(sent_excl)
    )
    kept = pairs_tbl.join(
        excl,
        join_type="left_anti",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "supplier")), target=1_000_000),
        on=("suppkey",),
        right_on=("x_suppkey",),
    )

    def _count_partial(t: pa.Table) -> pa.Table:
        attr = t["attr"].to_numpy(zero_copy_only=False)
        sk = t["suppkey"].to_numpy(zero_copy_only=False)
        attr = attr[sk != -2]  # strip the anti-join survivor sentinel
        uk, c = _int_group_sums(attr, np.ones(len(attr), dtype=np.int64))
        return pa.table({"attr": pa.array(uk, pa.int64()), "supplier_cnt": pa.array(c, pa.int64())})

    agg = (
        kept.map_batches(_count_partial, batch_format="pyarrow")
        .groupby("attr")
        .aggregate(Sum("supplier_cnt", alias_name="supplier_cnt"))
    )

    def _finale(t: pa.Table) -> pa.Table:
        attr = t["attr"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p_brand": pa.array([f"Brand#{int(a) // 64}" for a in attr], pa.string()),
                "p_size": pa.array(attr % 64, pa.int64()),
                "supplier_cnt": t["supplier_cnt"].cast(pa.int64()),
            }
        )

    return agg.map_batches(_finale, batch_format="pyarrow")


def q17_small_quantity_revenue(
    sf_dir: str,
    brand: str = "Brand#2",
    frac_num: int = 1,
    frac_den: int = 5,
) -> "ray.data.Dataset":
    """TPC-H Q17-shaped small-quantity-order revenue: line count and
    price-cents total for the brand's line items whose quantity sits
    STRICTLY below ``frac_num/frac_den`` of that part's average quantity
    (over ALL of the part's lines).  The yearly average the reference
    divides by at the end stays RATIONAL — the caller divides.

    The shape: the fact joins ITS OWN per-key aggregate (the
    aggregate-then-rejoin self-reference no other composite has).  The
    threshold is never a float: ``qty < (num/den)·(sum/n)`` evaluates as
    the int64 cross-multiplication ``den·qty·n < num·sum``, so a
    boundary line can never flip on rounding.

    Physical plan — and why there is no per-part Python:
    1. lineitem collapses per batch on packed partkey·64+qty (the q19
       discipline — quantities are integral < 64, asserted), carrying
       (cnt, price_cents);
    2. partials ⋈ brand parts prunes ~24/25 of the stream BEFORE the
       wide ops (duplicate partials fine — unique dimension key);
    3. ONE groupby on the packed key makes the collapse exact;
    4. per-part totals (n, Σqty) are a SECOND bounded groupby over the
       ≤64-rows-per-part collapsed table, which then natively re-joins
       the collapsed rows on partkey — both sides pair-scale, the
       comparison fully vectorized;
    5. the finale unions a typed zero row so the single-group aggregate
       keeps its schema when nothing qualifies (matching the oracle's
       always-one-row global aggregate).

    Output exactly one row (p_brand, n_lines, sum_price_cents)."""
    import pyarrow.compute as _pc

    def _li_partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qtyf = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        qty = np.round(qtyf).astype(np.int64)
        if not ((qty >= 0) & (qty < 64) & (qty == qtyf)).all():
            raise ValueError("l_quantity out of the integral [0, 64) data contract")
        cents = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64) * 100.0
        ).astype(np.int64)
        packed = pk * np.int64(64) + qty
        uk, csum = _int_group_sums(packed, np.ones(len(pk), dtype=np.int64))
        _, psum = _int_group_sums(packed, cents)
        return pa.table(
            {
                "l_partkey": pa.array(uk // 64, pa.int64()),
                "qty": pa.array(uk % 64, pa.int64()),
                "cnt": pa.array(csum, pa.int64()),
                "price_cents": pa.array(psum, pa.int64()),
            }
        )

    sent_li = ray.data.from_arrow(
        pa.table(
            {
                "l_partkey": pa.array([-1], pa.int64()),
                "qty": pa.array([0], pa.int64()),
                "cnt": pa.array([0], pa.int64()),
                "price_cents": pa.array([0], pa.int64()),
            }
        )
    )
    sent_part = ray.data.from_arrow(pa.table({"p_partkey": pa.array([-1], pa.int64())}))

    li = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "lineitem"))),
        )
        .map_batches(_li_partial, batch_format="pyarrow")
        .union(sent_li)
    )
    bparts = (
        ray.data.read_parquet(
            _pq(sf_dir, "part"),
            columns=["p_partkey", "p_brand"],
            filter=_pc.field("p_brand") == _pc.scalar(brand),
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "part"))),
        )
        .select_columns(["p_partkey"])
        .map_batches(
            lambda t: pa.table({"p_partkey": t["p_partkey"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
        .union(sent_part)
    )
    pruned = li.join(
        bparts,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "part")), target=1_000_000),
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def _repack(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        qty = t["qty"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pk2": pa.array(pk * np.int64(64) + qty, pa.int64()),
                "cnt": t["cnt"],
                "price_cents": t["price_cents"],
            }
        )

    collapsed = (
        pruned.map_batches(_repack, batch_format="pyarrow")
        .groupby("pk2")
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("price_cents", alias_name="price_cents"))
        .materialize()  # pair-scale; feeds BOTH the totals and the re-join
    )

    def _split(t: pa.Table) -> pa.Table:
        pk2 = t["pk2"].to_numpy(zero_copy_only=False)
        qty = pk2 % 64  # floor mod: sentinel −64 → (−1, 0)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_partkey": pa.array(pk2 // 64, pa.int64()),
                "n": pa.array(cnt, pa.int64()),
                "sq": pa.array(qty * cnt, pa.int64()),
            }
        )

    totals = (
        collapsed.map_batches(_split, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("n", alias_name="n"), Sum("sq", alias_name="sq"))
    )

    def _unpack_rows(t: pa.Table) -> pa.Table:
        pk2 = t["pk2"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "r_partkey": pa.array(pk2 // 64, pa.int64()),
                "qty": pa.array(pk2 % 64, pa.int64()),
                "cnt": t["cnt"],
                "price_cents": t["price_cents"],
            }
        )

    rows = collapsed.map_batches(_unpack_rows, batch_format="pyarrow")
    rejoined = rows.join(
        totals,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "part")), target=1_000_000),
        on=("r_partkey",),
        right_on=("l_partkey",),
    )

    def _score(t: pa.Table) -> pa.Table:
        qty = t["qty"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        sq = t["sq"].to_numpy(zero_copy_only=False)
        # den·qty·n < num·Σqty — int64-exact; the sentinel row (all
        # zeros) fails the strict inequality and strips here
        keep = np.int64(frac_den) * qty * n < np.int64(frac_num) * sq
        return pa.table(
            {
                "p_brand": pa.array([brand] * int(keep.sum()), pa.string()),
                "n_lines": t["cnt"].filter(pa.array(keep)),
                "sum_price_cents": t["price_cents"].filter(pa.array(keep)),
            }
        )

    zero = ray.data.from_arrow(
        pa.table(
            {
                "p_brand": pa.array([brand], pa.string()),
                "n_lines": pa.array([0], pa.int64()),
                "sum_price_cents": pa.array([0], pa.int64()),
            }
        )
    )
    return (
        rejoined.map_batches(_score, batch_format="pyarrow")
        .union(zero)
        .groupby("p_brand")
        .aggregate(
            Sum("n_lines", alias_name="n_lines"),
            Sum("sum_price_cents", alias_name="sum_price_cents"),
        )
    )


def q21_blocked_suppliers(
    sf_dir: str,
    late_days: int = 60,
) -> "ray.data.Dataset":
    """TPC-H Q21-shaped waiting-supplier audit: per supplier, the number
    of FINISHED ('F') multi-supplier orders where that supplier was the
    ONLY late one (shipped more than ``late_days`` after the order date —
    the synthetic stand-in for receipt-vs-commit, which doesn't exist in
    this lineitem).  Q21's EXISTS + NOT EXISTS pair over sibling line
    items is per-order logic touching EVERY supplier of the order.

    Physical plan — and the partitioning assumption it relies on:
    1. lineitem collapses per batch to (orderkey, suppkey)→max_ship
       partials (two-key lexsort reduceat; cross-batch duplicate pairs
       are fine, step 3 re-reduces);
    2. partials ⋈ F-orders (projected to two ints) native on orderkey;
    3. the per-order existence logic runs VECTORIZED inside ONE
       map_batches with ``batch_size=None`` over the join output: Ray's
       hash join partitions by the key, so every row of an orderkey
       lands in the same output block, and a whole-block batch sees each
       order COMPLETE (this colocation guarantee is the documented
       assumption — Ray 2.49's aggregator finalize yields ONE block per
       partition, pinned by
       tests/test_rayfix.py::test_hash_shuffle_finalize_yields_one_block_per_partition
       so an upgrade that splits finalized partitions fails loudly; the
       lexsort-reduceat computes per-pair max, per-order
       distinct-supplier and late-supplier counts with no Python loop);
    4. qualifying (n_supp ≥ 2, n_late == 1) orders emit their single
       late supplier; the finale is a |suppliers|-bounded groupby.

    Output (s_suppkey, numwait)."""
    import pyarrow.compute as _pc

    late_us = np.int64(late_days) * 86_400_000_000

    def _li_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, ok))
        ok, sk, ship = ok[order], sk[order], ship[order]
        first = np.r_[True, (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])]
        starts = np.flatnonzero(first)
        return pa.table(
            {
                "l_orderkey": pa.array(ok[starts], pa.int64()),
                "l_suppkey": pa.array(sk[starts], pa.int64()),
                "max_ship_us": pa.array(np.maximum.reduceat(ship, starts), pa.int64()),
            }
        )

    sent_li = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([-1], pa.int64()),
                "l_suppkey": pa.array([-1], pa.int64()),
                "max_ship_us": pa.array([0], pa.int64()),
            }
        )
    )
    sent_ord = ray.data.from_arrow(
        pa.table({"o_orderkey": pa.array([-1], pa.int64()), "o_date_us": pa.array([0], pa.int64())})
    )

    li = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_orderkey", "l_suppkey", "l_shipdate"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "lineitem"))),
        )
        .map_batches(_li_partial, batch_format="pyarrow")
        .union(sent_li)
    )
    orders = (
        ray.data.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
            filter=_pc.field("o_orderstatus") == _pc.scalar("F"),
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "orders"))),
        )
        .select_columns(["o_orderkey", "o_orderdate"])
        .map_batches(
            lambda t: pa.table(
                {
                    "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                    "o_date_us": t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .union(sent_ord)
    )
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "orders")), target=1_000_000),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def _per_order(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        ship = t["max_ship_us"].to_numpy(zero_copy_only=False)
        odate = t["o_date_us"].to_numpy(zero_copy_only=False)
        if len(ok) == 0:
            return pa.table(
                {"s_suppkey": pa.array([], pa.int64()), "numwait": pa.array([], pa.int64())}
            )
        # exact per-(order, supplier) collapse within the colocated block
        order = np.lexsort((sk, ok))
        ok, sk, ship, odate = ok[order], sk[order], ship[order], odate[order]
        first = np.r_[True, (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])]
        starts = np.flatnonzero(first)
        p_ok = ok[starts]
        p_sk = sk[starts]
        p_ship = np.maximum.reduceat(ship, starts)
        p_late = (p_ship > odate[starts] + late_us).astype(np.int64)
        # per-order counts over the pair-collapsed arrays
        ostarts = np.flatnonzero(np.r_[True, p_ok[1:] != p_ok[:-1]])
        n_supp = np.diff(np.r_[ostarts, len(p_ok)])
        n_late = np.add.reduceat(p_late, ostarts)
        # broadcast the order verdict back onto its pairs
        oidx = np.cumsum(np.r_[False, p_ok[1:] != p_ok[:-1]])
        qual = (n_supp >= 2) & (n_late == 1)
        emit = qual[oidx] & (p_late == 1)  # the unique late supplier
        uk, c = _int_group_sums(p_sk[emit], np.ones(int(emit.sum()), dtype=np.int64))
        return pa.table({"s_suppkey": pa.array(uk, pa.int64()), "numwait": pa.array(c, pa.int64())})

    return (
        joined.map_batches(_per_order, batch_format="pyarrow", batch_size=None)
        .groupby("s_suppkey")
        .aggregate(Sum("numwait", alias_name="numwait"))
    )


def q8_market_share(
    sf_dir: str,
    region: int = 0,
    target_nation: int = 0,
    p_type: str = "ECONOMY",
    date_lo_us: int = 820_454_400_000_000,  # 1996-01-01
    date_hi_us: int = 883_612_800_000_000,  # 1998-01-01
) -> "ray.data.Dataset":
    """TPC-H Q8-shaped market share: per order year, the revenue a TARGET
    supplier nation captured of one part type's import volume into one
    region — the RATIO stays RATIONAL (target and total int64 fp4 sums per
    year; the caller divides).

    The deep-chain composite: three native joins in sequence (lineitem ⋈
    type-filtered part on partkey → per-(order, target-bit) collapse →
    ⋈ (orders ⋈ region-filtered customer)), with the supplier dimension
    folded in as a broadcast dict and the region's nation set resolved
    driver-side from the tiny nation/region tables.  The conditional
    numerator rides a single bit packed next to the orderkey (q4's
    packed-key discipline), so cross-batch duplicate partials stay safe —
    every packed key joins its order exactly once.

    Output (o_year, target_rev_fp4, total_rev_fp4)."""
    import pyarrow.compute as _pc

    nation = pd.read_parquet(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"])
    region_nations = [int(x) for x in nation.loc[nation["n_regionkey"] == region, "n_nationkey"]]
    supp = pd.read_parquet(_pq(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    supp_nat_ref = ray.put(
        dict(zip(supp["s_suppkey"].to_numpy(), supp["s_nationkey"].to_numpy().astype(np.int64)))
    )

    sent_li = ray.data.from_arrow(
        pa.table(
            {
                "l_partkey": pa.array([-1], pa.int64()),
                "l_orderkey": pa.array([-1], pa.int64()),
                "tbit": pa.array([0], pa.int64()),
                "rev_fp4": pa.array([0], pa.int64()),
            }
        )
    )
    sent_part = ray.data.from_arrow(pa.table({"p_partkey": pa.array([-1], pa.int64())}))
    sent_ord = ray.data.from_arrow(
        pa.table({"o_orderkey": pa.array([-1], pa.int64()), "o_custkey": pa.array([-1], pa.int64()), "o_year": pa.array([0], pa.int64())})
    )
    sent_cust = ray.data.from_arrow(pa.table({"c_custkey": pa.array([-1], pa.int64())}))

    def _li_proj(t: pa.Table) -> pa.Table:
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        snat = pd.Series(sk).map(ray.get(supp_nat_ref)).fillna(-1).to_numpy(dtype=np.int64)
        rev = _rev_fp4(
            t["l_extendedprice"].to_numpy(zero_copy_only=False),
            t["l_discount"].to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "l_partkey": t["l_partkey"].cast(pa.int64()),
                "l_orderkey": t["l_orderkey"].cast(pa.int64()),
                "tbit": pa.array((snat == target_nation).astype(np.int64), pa.int64()),
                "rev_fp4": pa.array(rev, pa.int64()),
            }
        )

    li = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_partkey", "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "lineitem"))),
        )
        .map_batches(_li_proj, batch_format="pyarrow")
        .union(sent_li)
    )
    tparts = (
        ray.data.read_parquet(
            _pq(sf_dir, "part"),
            columns=["p_partkey", "p_type"],
            filter=_pc.field("p_type") == _pc.scalar(p_type),
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "part"))),
        )
        .select_columns(["p_partkey"])
        .map_batches(
            lambda t: pa.table({"p_partkey": t["p_partkey"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
        .union(sent_part)
    )
    pruned = li.join(
        tparts,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "part")), target=1_000_000),
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def _collapse(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        tb = t["tbit"].to_numpy(zero_copy_only=False)
        rev = t["rev_fp4"].to_numpy(zero_copy_only=False)
        keep = ok != -1  # part-join sentinel strip
        packed = ok[keep] * np.int64(2) + tb[keep]
        uk, rs = _int_group_sums(packed, rev[keep])
        return pa.table(
            {
                "o_key": pa.array(uk // 2, pa.int64()),
                "tbit": pa.array(uk % 2, pa.int64()),
                "rev_fp4": pa.array(rs, pa.int64()),
            }
        )

    sent_partial = ray.data.from_arrow(
        pa.table(
            {
                "o_key": pa.array([-1], pa.int64()),
                "tbit": pa.array([0], pa.int64()),
                "rev_fp4": pa.array([0], pa.int64()),
            }
        )
    )
    partials = pruned.map_batches(_collapse, batch_format="pyarrow").union(sent_partial)

    lo_ts = pd.Timestamp(date_lo_us, unit="us")
    hi_ts = pd.Timestamp(date_hi_us, unit="us")

    def _ord_proj(t: pa.Table) -> pa.Table:
        yr = (
            t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
            + 1970
        )
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "o_custkey": t["o_custkey"].cast(pa.int64()),
                "o_year": pa.array(yr, pa.int64()),
            }
        )

    orders = (
        ray.data.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
            filter=(_pc.field("o_orderdate") >= _pc.scalar(lo_ts))
            & (_pc.field("o_orderdate") < _pc.scalar(hi_ts)),
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "orders"))),
        )
        .map_batches(_ord_proj, batch_format="pyarrow")
        .union(sent_ord)
    )
    cust = (
        ray.data.read_parquet(
            _pq(sf_dir, "customer"),
            columns=["c_custkey", "c_nationkey"],
            filter=_pc.field("c_nationkey").isin(region_nations),
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "customer"))),
        )
        .select_columns(["c_custkey"])
        .map_batches(
            lambda t: pa.table({"c_custkey": t["c_custkey"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
        .union(sent_cust)
    )
    ord_cust = orders.join(
        cust,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "orders")), target=1_000_000),
        on=("o_custkey",),
        right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "o_year"])

    joined = partials.join(
        ord_cust,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "orders")), target=1_000_000),
        on=("o_key",),
        right_on=("o_orderkey",),
    )

    def _finale(t: pa.Table) -> pa.Table:
        ok = t["o_key"].to_numpy(zero_copy_only=False)
        keep = ok != -1
        yr = t["o_year"].to_numpy(zero_copy_only=False)[keep]
        tb = t["tbit"].to_numpy(zero_copy_only=False)[keep]
        rev = t["rev_fp4"].to_numpy(zero_copy_only=False)[keep]
        uy, tot = _int_group_sums(yr, rev)
        _, tgt = _int_group_sums(yr, rev * tb)
        return pa.table(
            {
                "o_year": pa.array(uy, pa.int64()),
                "target_rev_fp4": pa.array(tgt, pa.int64()),
                "total_rev_fp4": pa.array(tot, pa.int64()),
            }
        )

    return (
        joined.map_batches(_finale, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(
            Sum("target_rev_fp4", alias_name="target_rev_fp4"),
            Sum("total_rev_fp4", alias_name="total_rev_fp4"),
        )
    )


def q9_nation_profit(
    sf_dir: str,
    name_word: str = "red",
) -> "ray.data.Dataset":
    """TPC-H Q9-shaped product-profit by supplier nation and order year,
    for parts whose name contains ``name_word``.  No partsupp table exists
    in the synthetic schema, so cost is the part's retail price per unit
    (cost_fp4 = retail_cents·qty·100 — same 10⁻⁴-dollar fixed point as
    revenue) and profit_fp4 = rev_fp4 − cost_fp4, which keeps Q9's
    physical shape intact: fact ⋈ attribute-filtered part (carrying a
    PER-PART numeric needed by the profit expression, unlike Q8's pure
    key filter), supplier nation via broadcast, order YEAR via one native
    orderkey join, finale grouped on the packed (nation, year) key.

    Output (supp_nation, o_year, n_lines, profit_fp4) — profit can be
    negative (int64, exact)."""
    import pyarrow.compute as _pc

    supp = pd.read_parquet(_pq(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    supp_nat_ref = ray.put(
        dict(zip(supp["s_suppkey"].to_numpy(), supp["s_nationkey"].to_numpy().astype(np.int64)))
    )

    sent_li = ray.data.from_arrow(
        pa.table(
            {
                "l_partkey": pa.array([-1], pa.int64()),
                "l_orderkey": pa.array([-1], pa.int64()),
                "snat": pa.array([0], pa.int64()),
                "qty": pa.array([0], pa.int64()),
                "rev_fp4": pa.array([0], pa.int64()),
            }
        )
    )
    sent_part = ray.data.from_arrow(
        pa.table({"p_partkey": pa.array([-1], pa.int64()), "retail_cents": pa.array([0], pa.int64())})
    )
    sent_ord = ray.data.from_arrow(
        pa.table({"o_orderkey": pa.array([-1], pa.int64()), "o_year": pa.array([0], pa.int64())})
    )

    def _li_proj(t: pa.Table) -> pa.Table:
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        snat = pd.Series(sk).map(ray.get(supp_nat_ref)).fillna(-1).to_numpy(dtype=np.int64)
        qtyf = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        qty = np.round(qtyf).astype(np.int64)
        if len(qty) and not ((qty >= 0) & (qty == qtyf)).all():
            raise ValueError("l_quantity out of the integral data contract")
        rev = _rev_fp4(
            t["l_extendedprice"].to_numpy(zero_copy_only=False),
            t["l_discount"].to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "l_partkey": t["l_partkey"].cast(pa.int64()),
                "l_orderkey": t["l_orderkey"].cast(pa.int64()),
                "snat": pa.array(snat, pa.int64()),
                "qty": pa.array(qty, pa.int64()),
                "rev_fp4": pa.array(rev, pa.int64()),
            }
        )

    def _part_proj(t: pa.Table) -> pa.Table:
        keep = pc.match_substring(t["p_name"], name_word)
        t = t.filter(keep)
        cents = np.round(
            t["p_retailprice"].to_numpy(zero_copy_only=False).astype(np.float64) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "p_partkey": t["p_partkey"].cast(pa.int64()),
                "retail_cents": pa.array(cents, pa.int64()),
            }
        )

    li = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=[
                "l_partkey",
                "l_orderkey",
                "l_suppkey",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
            ],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "lineitem"))),
        )
        .map_batches(_li_proj, batch_format="pyarrow")
        .union(sent_li)
    )
    parts = (
        ray.data.read_parquet(
            _pq(sf_dir, "part"),
            columns=["p_partkey", "p_name", "p_retailprice"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "part"))),
        )
        .map_batches(_part_proj, batch_format="pyarrow")
        .union(sent_part)
    )
    pruned = li.join(
        parts,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "part")), target=1_000_000),
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def _collapse(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        keep = ok != -1
        snat = t["snat"].to_numpy(zero_copy_only=False)[keep]
        if len(snat) and not ((snat >= 0) & (snat < 32)).all():
            raise ValueError("s_nationkey out of the [0, 32) packing contract")
        profit = (
            t["rev_fp4"].to_numpy(zero_copy_only=False)[keep]
            - t["retail_cents"].to_numpy(zero_copy_only=False)[keep]
            * t["qty"].to_numpy(zero_copy_only=False)[keep]
            * np.int64(100)
        )
        packed = ok[keep] * np.int64(32) + snat
        uk, ps = _int_group_sums(packed, profit)
        _, cs = _int_group_sums(packed, np.ones(len(packed), dtype=np.int64))
        return pa.table(
            {
                "o_key": pa.array(uk // 32, pa.int64()),
                "snat": pa.array(uk % 32, pa.int64()),
                "profit_fp4": pa.array(ps, pa.int64()),
                "n_lines": pa.array(cs, pa.int64()),
            }
        )

    sent_partial = ray.data.from_arrow(
        pa.table(
            {
                "o_key": pa.array([-1], pa.int64()),
                "snat": pa.array([0], pa.int64()),
                "profit_fp4": pa.array([0], pa.int64()),
                "n_lines": pa.array([0], pa.int64()),
            }
        )
    )
    partials = pruned.map_batches(_collapse, batch_format="pyarrow").union(sent_partial)

    def _ord_proj(t: pa.Table) -> pa.Table:
        yr = (
            t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
            + 1970
        )
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "o_year": pa.array(yr, pa.int64()),
            }
        )

    orders = (
        ray.data.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_orderkey", "o_orderdate"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "orders"))),
        )
        .map_batches(_ord_proj, batch_format="pyarrow")
        .union(sent_ord)
    )
    joined = partials.join(
        orders,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "orders")), target=1_000_000),
        on=("o_key",),
        right_on=("o_orderkey",),
    )

    def _finale(t: pa.Table) -> pa.Table:
        ok = t["o_key"].to_numpy(zero_copy_only=False)
        keep = ok != -1
        snat = t["snat"].to_numpy(zero_copy_only=False)[keep]
        yr = t["o_year"].to_numpy(zero_copy_only=False)[keep]
        packed = snat * np.int64(8192) + (yr - 1970)
        uk, ps = _int_group_sums(packed, t["profit_fp4"].to_numpy(zero_copy_only=False)[keep])
        _, cs = _int_group_sums(packed, t["n_lines"].to_numpy(zero_copy_only=False)[keep])
        return pa.table(
            {
                "gk": pa.array(uk, pa.int64()),
                "n_lines": pa.array(cs, pa.int64()),
                "profit_fp4": pa.array(ps, pa.int64()),
            }
        )

    agg = (
        joined.map_batches(_finale, batch_format="pyarrow")
        .groupby("gk")
        .aggregate(Sum("n_lines", alias_name="n_lines"), Sum("profit_fp4", alias_name="profit_fp4"))
    )

    def _unpack(t: pa.Table) -> pa.Table:
        gk = t["gk"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "supp_nation": pa.array(gk // 8192, pa.int64()),
                "o_year": pa.array(gk % 8192 + 1970, pa.int64()),
                "n_lines": t["n_lines"].cast(pa.int64()),
                "profit_fp4": t["profit_fp4"].cast(pa.int64()),
            }
        )

    return agg.map_batches(_unpack, batch_format="pyarrow")


def q6_forecast_revenue(
    sf_dir: str,
    date_lo_us: int = 820_454_400_000_000,  # 1996-01-01
    date_hi_us: int = 852_076_800_000_000,  # 1997-01-01
    disc_lo_c: int = 5,
    disc_hi_c: int = 7,
    qty_below: int = 24,
) -> "ray.data.Dataset":
    """TPC-H Q6-shaped forecast-revenue delta: Σ extendedprice·discount
    over a ship-date year, a discount band and a quantity cap — the pure
    single-pass filtered aggregate (no join; the simplest composite,
    included to complete the matrix: with it, every TPC-H query shape
    except the partsupp-dependent Q2/Q11/Q20 has a native pipeline here).

    All predicates evaluate on integer fixed-point (discount in
    hundredths, quantity integral-asserted), the product is fp4 =
    cents·hundredths, and the read is column-pruned with the date window
    pushed into the parquet scan.  Output is exactly one row
    (n_lines, revenue_fp4) — a unioned zero row keeps it total when the
    filters match nothing (the q17 convention)."""
    import pyarrow.compute as _pc

    def _partial(t: pa.Table) -> pa.Table:
        qtyf = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        qty = np.round(qtyf).astype(np.int64)
        if len(qty) and not (qty == qtyf).all():
            raise ValueError("l_quantity out of the integral data contract")
        d100 = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64) * 100.0
        ).astype(np.int64)
        cents = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64) * 100.0
        ).astype(np.int64)
        keep = (d100 >= disc_lo_c) & (d100 <= disc_hi_c) & (qty < qty_below)
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "n_lines": pa.array([int(keep.sum())], pa.int64()),
                "revenue_fp4": pa.array([int((cents[keep] * d100[keep]).sum())], pa.int64()),
            }
        )

    lo_ts = pd.Timestamp(date_lo_us, unit="us")
    hi_ts = pd.Timestamp(date_hi_us, unit="us")
    zero = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "n_lines": pa.array([0], pa.int64()),
                "revenue_fp4": pa.array([0], pa.int64()),
            }
        )
    )
    return (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
            filter=(_pc.field("l_shipdate") >= _pc.scalar(lo_ts))
            & (_pc.field("l_shipdate") < _pc.scalar(hi_ts)),
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "lineitem"))),
        )
        .select_columns(["l_quantity", "l_extendedprice", "l_discount"])
        .map_batches(_partial, batch_format="pyarrow")
        .union(zero)
        .groupby("k")
        .aggregate(Sum("n_lines", alias_name="n_lines"), Sum("revenue_fp4", alias_name="revenue_fp4"))
        .map_batches(
            lambda t: t.select(["n_lines", "revenue_fp4"]), batch_format="pyarrow"
        )
    )


# ---------------------------------------------------------------------------
# Derived partsupp: the synthetic schema ships no partsupp table, so the last
# three TPC-H shapes (Q2 / Q11 / Q20) derive one DETERMINISTICALLY from the
# part table and the supplier COUNT — the same closed-form integer recipe on
# both engines (numpy here, a CTE in the oracle), so partsupp never exists on
# disk yet both sides see the identical 4-suppliers-per-part relation:
#
#   step            = max(1, S // 4)                 (S = |supplier|)
#   ps_suppkey[i]   = (p_partkey + i·step) % S,  i ∈ {0,1,2,3}
#                     (distinct because 3·⌊S/4⌋ < S — dbgen's own rotation
#                      scheme, adapted to the 0-based dense keys)
#   ps_availqty     = (p_partkey·13  + ps_suppkey·101)    % 9999  + 1
#   ps_supplycost   = (p_partkey·7919 + ps_suppkey·104729) % 99901 + 100  (cents)
#
# Every value is int64-bounded (cost < 1e5, avail < 1e4, products ≤ 4e9 per
# part) and the derivation is BATCH-LOCAL: all four supplier rows of a part
# materialize inside the part batch that carries it, so per-part reductions
# (Q2's min-cost argmin, Q11's stock value) need NO exchange at all — the
# relation is born collapsed.  Only Q20, which meets the row-scale lineitem,
# pays a keyed exchange (packed partkey·S + suppkey).


def _ps_matrices(pk: np.ndarray, S: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(n,4) int64 matrices (ps_suppkey, ps_availqty, ps_supplycost_cents)
    for the derived-partsupp rows of the given part keys."""
    step = np.int64(max(1, S // 4))
    sk = (pk[:, None] + np.arange(4, dtype=np.int64)[None, :] * step) % np.int64(S)
    avail = (pk[:, None] * np.int64(13) + sk * np.int64(101)) % np.int64(9999) + 1
    cost = (pk[:, None] * np.int64(7919) + sk * np.int64(104729)) % np.int64(99901) + 100
    return sk, avail, cost


def _dense_dim(df: pd.DataFrame, key: str) -> pd.DataFrame:
    """Sort a dimension by its key and assert the dbgen dense-key contract
    (keys exactly 0..n−1) so broadcast lookups can be positional."""
    df = df.sort_values(key).reset_index(drop=True)
    keys = df[key].to_numpy().astype(np.int64)
    if len(keys) and not (keys == np.arange(len(keys), dtype=np.int64)).all():
        raise ValueError(f"{key} violates the dense 0..n-1 key contract")
    return df


def _region_supplier_mask(sf_dir: str, region_name: str) -> tuple[np.ndarray, pd.DataFrame, np.ndarray]:
    """(in_region mask over suppkey, supplier dim frame, n_name per suppkey).

    Supplier/nation/region are the broadcast dims (the q7/q8 convention —
    at extreme SF swap the supplier side for a native join); masks are
    positional over the dense 0-based keys."""
    supp = _dense_dim(
        pd.read_parquet(_pq(sf_dir, "supplier")), "s_suppkey"
    )
    nat = _dense_dim(
        pd.read_parquet(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_name", "n_regionkey"]),
        "n_nationkey",
    )
    reg = pd.read_parquet(_pq(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    rkeys = reg.loc[reg["r_name"] == region_name, "r_regionkey"].to_numpy().astype(np.int64)
    snat = supp["s_nationkey"].to_numpy().astype(np.int64)
    nat_reg = nat["n_regionkey"].to_numpy().astype(np.int64)
    in_region = np.isin(nat_reg[snat], rkeys)
    n_name = nat["n_name"].to_numpy(dtype=object)[snat]
    return in_region, supp, n_name


def q2_min_cost_supplier(
    sf_dir: str,
    p_type: str = "ECONOMY",
    size_min: int = 25,
    region_name: str = "EUROPE",
    k: int = 50,
) -> pd.DataFrame:
    """TPC-H Q2-shaped minimum-cost supplier: for every part of the given
    type with size ≥ ``size_min``, the in-region supplier(s) holding the
    MINIMUM derived supply cost (ties all kept, as Q2 does), top-``k`` by
    (s_acctbal DESC, n_name, s_name, p_partkey) — a total order because
    (s_name, p_partkey) is unique per row, which is what makes the strict
    LIMIT deterministic on both engines.

    The correlated min-subquery costs NOTHING here: the derived partsupp
    is born collapsed (all 4 supplier rows of a part live in its batch),
    so the per-part argmin is a vectorized axis-1 reduction — no exchange,
    no self-join.  A per-batch partial top-k bounds the global sort input
    to n_blocks·k rows (the q10 discipline)."""
    import pyarrow.compute as _pc

    S = _meta_rows(_pq(sf_dir, "supplier"))
    in_region, supp, n_name = _region_supplier_mask(sf_dir, region_name)
    dim_ref = ray.put(
        (
            in_region,
            supp["s_acctbal"].to_numpy().astype(np.float64),
            supp["s_name"].to_numpy(dtype=object),
            n_name,
        )
    )

    def _batch(t: pa.Table) -> pa.Table:
        pk = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        inr, acct, snm, nnm = ray.get(dim_ref)
        sk, _avail, cost = _ps_matrices(pk, S)
        m = inr[sk]
        big = np.int64(2**62)
        minc = np.where(m, cost, big).min(axis=1)
        keep = m & (cost == minc[:, None])  # no in-region supplier → all False
        pi, si = np.nonzero(keep)
        skk = sk[pi, si]
        return pa.table(
            {
                "s_acctbal": pa.array(acct[skk], pa.float64()),
                "s_name": pa.array(snm[skk].tolist(), pa.string()),
                "n_name": pa.array(nnm[skk].tolist(), pa.string()),
                "p_partkey": pa.array(pk[pi], pa.int64()),
            }
        )

    def _topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["s_acctbal", "n_name", "s_name", "p_partkey"],
            ascending=[False, True, True, True],
        ).head(k)

    ds = (
        ray.data.read_parquet(
            _pq(sf_dir, "part"),
            columns=["p_partkey", "p_type", "p_size"],
            filter=(_pc.field("p_type") == _pc.scalar(p_type))
            & (_pc.field("p_size") >= _pc.scalar(size_min)),
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "part"))),
        )
        .select_columns(["p_partkey"])
        .map_batches(_batch, batch_format="pyarrow")
        .map_batches(_topk, batch_format="pandas")
    )
    out = (
        ds.sort(
            ["s_acctbal", "n_name", "s_name", "p_partkey"],
            descending=[True, False, False, False],
        )
        .limit(k)
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {
                "s_acctbal": pd.Series([], dtype="float64"),
                "s_name": pd.Series([], dtype=object),
                "n_name": pd.Series([], dtype=object),
                "p_partkey": pd.Series([], dtype="int64"),
            }
        )
    return out.reset_index(drop=True)


def q11_stock_value(
    sf_dir: str,
    nation_name: str = "NATION_3",
    frac_num: int = 1,
    frac_den: int = 200,
) -> "ray.data.Dataset":
    """TPC-H Q11-shaped important-stock report: per-part derived stock
    value Σ(supplycost·availqty) over the nation's suppliers, keeping
    parts whose value exceeds ``frac_num/frac_den`` of the nation total —
    the global-scalar-threshold shape.  The threshold never becomes a
    float: ``value·frac_den > total·frac_num`` is the int64
    cross-multiplication (the q22 discipline), and the oracle's
    ``sum(...)::BIGINT`` raises on int64 overflow exactly where the
    engine's assert does.

    Per-part values are batch-local (the derived relation is born
    collapsed — p_partkey is unique in part, so no groupby is ever
    needed); the narrow (partkey, value) table materializes ONCE and
    feeds both the scalar total and the filter, the training_pack
    two-consumer discipline."""
    nat = _dense_dim(
        pd.read_parquet(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_name"]), "n_nationkey"
    )
    nkeys = nat.loc[nat["n_name"] == nation_name, "n_nationkey"].to_numpy().astype(np.int64)
    supp = _dense_dim(
        pd.read_parquet(_pq(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]), "s_suppkey"
    )
    S = len(supp)
    in_nation = np.isin(supp["s_nationkey"].to_numpy().astype(np.int64), nkeys)
    mask_ref = ray.put(in_nation)

    def _batch(t: pa.Table) -> pa.Table:
        pk = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = ray.get(mask_ref)
        sk, avail, cost = _ps_matrices(pk, S)
        inn = m[sk]
        val = np.where(inn, avail * cost, 0).sum(axis=1)  # ≤ 4·1e4·1e5 = 4e9 per part
        keep = inn.any(axis=1)
        return pa.table(
            {
                "ps_partkey": pa.array(pk[keep], pa.int64()),
                "value_cents": pa.array(val[keep], pa.int64()),
            }
        )

    vals = (
        ray.data.read_parquet(
            _pq(sf_dir, "part"),
            columns=["p_partkey"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "part"))),
        )
        .map_batches(_batch, batch_format="pyarrow")
        .materialize()  # narrow |part|-bounded table; feeds total AND filter
    )
    total = int(vals.sum("value_cents") or 0)
    if total > (2**62) // max(frac_num, 1):
        raise ValueError("nation stock total exceeds the int64 threshold bound")
    lo = np.int64(total) * np.int64(frac_num)

    def _thresh(t: pa.Table) -> pa.Table:
        v = t["value_cents"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(v * np.int64(frac_den) > lo))

    return vals.map_batches(_thresh, batch_format="pyarrow").sort(
        ["value_cents", "ps_partkey"], descending=[True, False]
    )


def q20_excess_stock(
    sf_dir: str,
    name_word: str = "red",
    date_lo_us: int = 820_454_400_000_000,  # 1996-01-01
    date_hi_us: int = 852_076_800_000_000,  # 1997-01-01
    region_name: str = "MIDDLE EAST",
) -> pd.DataFrame:
    """TPC-H Q20-shaped excess-stock suppliers: in-region suppliers holding
    more than HALF a year's shipped quantity (2·availqty > Σqty, strict —
    integer, never the 0.5· float) of some name-matching part they supply,
    with the qualifying-pair count per supplier.  Pairs with NO shipped
    lines are excluded, matching SQL's NULL-comparison semantics in the
    reference formulation (the inner join enforces it structurally).

    The one keyed exchange: lineitem collapses per batch on the packed
    (partkey·S + suppkey) key (bound: pk_max·S < 2⁶³ — holds to SF 10⁴⁺;
    asserted), ONE groupby makes the year sums exact (the threshold filter
    is not duplicate-safe), then meets the derived partsupp rows of the
    name-matched parts in a native inner join.  Matched −1 sentinels keep
    both join sides schema-total when a filter empties one (rayfix
    discipline); the winner table is supplier-bounded by construction."""
    S = _meta_rows(_pq(sf_dir, "supplier"))
    in_region, supp, _n_name = _region_supplier_mask(sf_dir, region_name)
    mask_ref = ray.put(in_region)

    def _li_partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qtyf = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        qty = np.round(qtyf).astype(np.int64)
        if len(qty) and not ((qty >= 0) & (qty == qtyf)).all():
            raise ValueError("l_quantity out of the integral data contract")
        if len(pk) and pk.max() > (2**62) // max(S, 1):
            raise ValueError("partkey·S exceeds the packed-key int64 bound")
        packed = pk * np.int64(S) + sk
        uk, sq = _int_group_sums(packed, qty)
        return pa.table({"packed": pa.array(uk, pa.int64()), "sq": pa.array(sq, pa.int64())})

    sent_li = ray.data.from_arrow(
        pa.table({"packed": pa.array([-1], pa.int64()), "sq": pa.array([0], pa.int64())})
    )
    sent_ps = ray.data.from_arrow(
        pa.table({"ps_packed": pa.array([-1], pa.int64()), "avail": pa.array([0], pa.int64())})
    )

    li = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
            filter=(pc.field("l_shipdate") >= pc.scalar(pd.Timestamp(date_lo_us, unit="us")))
            & (pc.field("l_shipdate") < pc.scalar(pd.Timestamp(date_hi_us, unit="us"))),
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "lineitem"))),
        )
        .select_columns(["l_partkey", "l_suppkey", "l_quantity"])
        .map_batches(_li_partial, batch_format="pyarrow")
        .union(sent_li)
        .groupby("packed")
        .aggregate(Sum("sq", alias_name="sq"))
    )

    def _ps_batch(t: pa.Table) -> pa.Table:
        t = t.filter(pc.match_substring(t["p_name"], name_word))
        pk = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = ray.get(mask_ref)
        sk, avail, _cost = _ps_matrices(pk, S)
        inr = m[sk]
        pi, si = np.nonzero(inr)
        return pa.table(
            {
                "ps_packed": pa.array(pk[pi] * np.int64(S) + sk[pi, si], pa.int64()),
                "avail": pa.array(avail[pi, si], pa.int64()),
            }
        )

    psds = (
        ray.data.read_parquet(
            _pq(sf_dir, "part"),
            columns=["p_partkey", "p_name"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "part"))),
        )
        .map_batches(_ps_batch, batch_format="pyarrow")
        .union(sent_ps)
    )
    joined = li.join(
        psds,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "part")), target=1_000_000),
        on=("packed",),
        right_on=("ps_packed",),
    )

    def _winners(t: pa.Table) -> pa.Table:
        packed = t["packed"].to_numpy(zero_copy_only=False)
        avail = t["avail"].to_numpy(zero_copy_only=False)
        sq = t["sq"].to_numpy(zero_copy_only=False)
        keep = (packed != -1) & (np.int64(2) * avail > sq)
        skk = packed[keep] % np.int64(S)
        uk, cnt = _int_group_sums(skk, np.ones(int(keep.sum()), dtype=np.int64))
        return pa.table(
            {"s_suppkey": pa.array(uk, pa.int64()), "n_pairs": pa.array(cnt, pa.int64())}
        )

    won = (
        joined.map_batches(_winners, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
        .to_pandas()  # supplier-bounded by construction
    )
    if len(won) == 0:
        return pd.DataFrame(
            {
                "s_suppkey": pd.Series([], dtype="int64"),
                "s_name": pd.Series([], dtype=object),
                "n_pairs": pd.Series([], dtype="int64"),
            }
        )
    names = supp[["s_suppkey", "s_name"]].copy()
    names["s_suppkey"] = names["s_suppkey"].astype("int64")
    out = won.merge(names, on="s_suppkey", how="inner")
    return (
        out[["s_suppkey", "s_name", "n_pairs"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )
