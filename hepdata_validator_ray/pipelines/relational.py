"""General relational pipelines over the TPC-H-ish testdata tables.

These demonstrate the engine's generic query capability (the reference's
validation checks are predicates + aggregates; the same Ray Data operators
compose into arbitrary analytics).  Patterns used:

- column-pruned ``read_parquet``
- vectorized per-batch compute (pyarrow.compute)
- broadcast hash joins for small dimension tables (``ray.put`` once,
  pandas merge per batch inside ``map_batches``) — no shuffle join for
  dim tables (SURVEY.md §2.4 J1)
- grouped aggregates with named aliases so the DuckDB oracle matches by
  column name

Epoch-bucketing contract: every time-window kernel floor-divides int64
epoch microseconds (numpy ``//`` floors) while the DuckDB oracles use SQL
``//`` (truncates toward zero) — identical for ts >= 1970-01-01, divergent
before it.  Pre-1970 timestamps are out of contract for the whole family
(tumbling/hopping/window_dedup/gapfill/cohort/cumulative); a real ingest
would reject them at validation (the doc-kind router's ts range check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Min, Sum


def _int_group_sums(keys: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact per-key int64 sums: np.add.reduceat over key-sorted runs.
    Replaces np.bincount(inv, weights=...), whose float64 accumulator
    silently loses integer exactness above 2^53 — per-(block,key)
    partials at 100 TB can cross that, and the hash-exact oracle
    contract depends on every partial staying integral (ADVICE r3)."""
    if len(keys) == 0:
        return keys.astype(np.int64), vals.astype(np.int64)
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    return ks[starts], np.add.reduceat(vals[order], starts)


def _pq(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def q1_pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1 shape over lineitem: grouped sums of derived expressions."""

    def derive(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        charge = pc.multiply(disc_price, pc.add(pa.scalar(1.0), t["l_tax"]))
        return pa.Table.from_arrays(
            [t["l_returnflag"], t["l_linestatus"], t["l_quantity"], t["l_extendedprice"], disc_price, charge],
            names=["l_returnflag", "l_linestatus", "qty", "base_price", "disc_price", "charge"],
        )

    ds = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        )
        .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base_price", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Sum("charge", alias_name="sum_charge"),
            Count(alias_name="count_order"),
        )
    )

    def round_cols(t: pa.Table) -> pa.Table:
        # float sums rounded for cross-engine bit-stability (summation order
        # differs between Ray partial aggregation and DuckDB)
        for col in ["sum_base_price", "sum_disc_price", "sum_charge"]:
            t = t.set_column(t.column_names.index(col), col, pc.round(t[col], 2))
        t = t.set_column(t.column_names.index("sum_qty"), "sum_qty", pc.round(t["sum_qty"], 2))
        return t

    return ds.map_batches(round_cols, batch_format="pyarrow")


def segment_revenue(sf_dir: str) -> "ray.data.Dataset":
    """Revenue by customer market segment: broadcast-join lineitem→orders→
    customer.  orders+customer are small → broadcast dict lookups inside
    map_batches; lineitem streams."""
    cust = pd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    orders = pd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    o2seg = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    lookup_ref = ray.put(dict(zip(o2seg.o_orderkey.to_numpy(), o2seg.c_mktsegment.to_numpy())))

    class JoinStage:
        def __init__(self, ref):
            self.lookup = ray.get(ref)  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
            seg = pd.Series(keys).map(self.lookup).to_numpy(dtype=object)
            rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])).to_numpy(
                zero_copy_only=False
            )
            keep = pd.notna(seg)
            return pa.Table.from_pydict(
                {
                    "c_mktsegment": pa.array(seg[keep], type=pa.string()),
                    "revenue": pa.array(rev[keep]),
                }
            )

    return (
        ray.data.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(JoinStage, fn_constructor_args=(lookup_ref,), batch_format="pyarrow", concurrency=2)
        .groupby("c_mktsegment")
        .aggregate(Sum("revenue", alias_name="revenue"), Count(alias_name="n_lines"))
        .map_batches(
            lambda t: t.set_column(t.column_names.index("revenue"), "revenue", pc.round(t["revenue"], 2)),
            batch_format="pyarrow",
        )
    )


def nation_order_stats(sf_dir: str) -> "ray.data.Dataset":
    """Orders per customer nation (region→nation→customer→orders broadcast
    chain): grouped count + rounded sum of totalprice."""
    nation = pd.read_parquet(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    cust = pd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    # inner-join semantics end-to-end: a customer with no nation row is
    # simply absent from the map (the old .loc[cust.c_custkey] raised
    # KeyError on the driver for that case)
    m = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    c2n = dict(zip(m.c_custkey.to_numpy(), m.n_name.to_numpy(dtype=object)))
    ref = ray.put(c2n)

    class Stage:
        def __init__(self, r):
            self.lookup = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["o_custkey"].to_numpy(zero_copy_only=False)
            names = pd.Series(keys).map(self.lookup)
            # drop orders whose custkey has no customer/nation row — the
            # oracle's inner joins drop them too (NaN here used to crash
            # the string-array build instead)
            keep = names.notna().to_numpy()
            if not keep.all():
                t = t.filter(pa.array(keep))
                names = names[keep]
            return pa.Table.from_pydict(
                {
                    "n_name": pa.array(names.to_numpy(dtype=object), type=pa.string()),
                    "o_totalprice": t["o_totalprice"],
                }
            )

    return (
        ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
        .map_batches(Stage, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=2)
        .groupby("n_name")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total_spend"))
        .map_batches(
            lambda t: t.set_column(
                t.column_names.index("total_spend"), "total_spend", pc.round(t["total_spend"], 2)
            ),
            batch_format="pyarrow",
        )
    )


def events_daily(sf_dir: str) -> "ray.data.Dataset":
    """Per-day per-type event rollup (the streaming-table analytics shape)."""

    def derive(t: pa.Table) -> pa.Table:
        day = pc.strftime(t["ts"], format="%Y-%m-%d")
        return pa.Table.from_arrays(
            [day, t["event_type"], t["value"]], names=["day", "event_type", "value"]
        )

    return (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type", "value"])
        .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .map_batches(
            lambda t: t.set_column(t.column_names.index("sum_value"), "sum_value", pc.round(t["sum_value"], 4)),
            batch_format="pyarrow",
        )
    )


def top_customers(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """Top-k customers by total spend — grouped aggregate + sort + limit."""
    return (
        ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
        .groupby("o_custkey")
        .aggregate(Sum("o_totalprice", alias_name="total_spend"), Count(alias_name="n_orders"))
        .map_batches(
            lambda t: t.set_column(
                t.column_names.index("total_spend"), "total_spend", pc.round(t["total_spend"], 2)
            ),
            batch_format="pyarrow",
        )
        # o_custkey tie-break: rounded spend makes exact ties at the
        # k-boundary likely, and an untied LIMIT is nondeterministic on
        # both the Ray and the SQL side
        .sort(["total_spend", "o_custkey"], descending=[True, False])
        .limit(k)
    )


def orders_customer_native_join(sf_dir: str) -> "ray.data.Dataset":
    """Both-sides-large join via Ray Data's native hash-partitioned
    ``Dataset.join`` (the shuffle-join operator; broadcast joins elsewhere
    cover the small-side case).  Grouped rollup per market segment."""
    from hepdata_validator_ray.ops import derive_num_buckets

    orders = ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    cust = ray.data.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=derive_num_buckets(orders, target_rows_per_bucket=500_000, lo=8),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    return (
        joined.groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total_spend"))
        .map_batches(
            lambda t: t.set_column(
                t.column_names.index("total_spend"), "total_spend", pa.compute.round(t["total_spend"], 2)
            ),
            batch_format="pyarrow",
        )
    )


def filtered_lineitem_count(sf_dir: str, cutoff: str = "1996-01-01") -> "ray.data.Dataset":
    """Predicate-pushdown demo: the shipdate filter is pushed into the
    Parquet read (row-group pruning via a pyarrow dataset expression), so
    non-matching row groups never leave storage — 'prune at the read'."""
    import pyarrow.dataset as pads

    return (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_returnflag", "l_shipdate"],
            filter=(pads.field("l_shipdate") < pa.scalar(pd.Timestamp(cutoff))),
        )
        .groupby("l_returnflag")
        .count()
        .map_batches(lambda t: t.rename_columns(["l_returnflag", "n"]), batch_format="pyarrow")
    )


def events_sessionize(sf_dir: str, gap_minutes: int = 30, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Sessionize the event stream: per user, a new session starts when the
    gap to the previous event exceeds ``gap_minutes`` (the classic streaming
    window op the reference lacks — SURVEY.md §2.8).

    Physical plan: users are hash-bucketed (small-int shuffle key, ops.py);
    inside a bucket the session assignment is a vectorized pandas
    sort + diff + cumsum over ALL the bucket's users at once — no per-user
    Python dispatch.  Partitioning assumption: one USER's events fit in one
    bucket task (true by construction of the hash bucket); the bucket
    count itself scales with input size (``ops.derive_num_buckets``) so a
    bucket is never a fixed 1/32 of the table."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    gap = pd.Timedelta(minutes=gap_minutes)

    def sessionify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(["user_id", "ts"], kind="mergesort")
        prev_ts = df.groupby("user_id")["ts"].shift()
        new_session = prev_ts.isna() | ((df["ts"] - prev_ts) > gap)
        df["sid"] = new_session.cumsum()  # globally increasing within bucket
        out = (
            df.groupby(["user_id", "sid"], as_index=False)
            .agg(session_start=("ts", "min"), n_events=("ts", "size"), sum_value=("value", "sum"))
        )
        out["session_start"] = out["session_start"].dt.strftime("%Y-%m-%d %H:%M:%S")
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].round(4)
        return out[["user_id", "session_start", "n_events", "sum_value"]]

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts", "value"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=32)
    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(sessionify, batch_format="pandas")
    )


def events_lag_previous(sf_dir: str, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Ordered-window / as-of operator: for every event, the timestamp of
    the user's previous event (merge_asof/lag semantics).  Users hash-bucket
    into coarse groups (count derived from input size); inside a bucket the
    lag is one vectorized pandas groupby-shift over all the bucket's users.
    Deterministic tie-break: (ts, event_id)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    def lag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id")["ts"].shift()
        out = pd.DataFrame(
            {
                "event_id": df["event_id"],
                "prev_ts": prev.dt.strftime("%Y-%m-%d %H:%M:%S"),
            }
        )
        out["prev_ts"] = out["prev_ts"].where(prev.notna(), None)
        return out

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=32)
    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(lag, batch_format="pandas")
    )


def events_trailing_count(sf_dir: str, window_minutes: int = 60, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Sliding/trailing window aggregate (the streaming-window operator,
    SURVEY.md §2.8): for every event, the number of the SAME user's events
    in the trailing ``window_minutes`` (inclusive of the event itself).

    One hash-bucket exchange on user_id; inside a bucket, one C-speed
    searchsorted pair per user segment (a per-USER loop of ~µs calls — no
    per-event Python; an int64 band-shift formulation would be fully
    vectorized but silently overflows ns arithmetic past ~292 cumulative
    segment-years, so the per-segment form is the safe one)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    win = np.timedelta64(window_minutes, "m")
    win_ns = np.int64(win / np.timedelta64(1, "ns"))

    def trailing(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        if not len(df):
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"), "n_trailing": pd.Series(dtype="int64")})
        t64 = df["ts"].to_numpy().astype("datetime64[ns]").view("i8")
        users = df["user_id"].to_numpy()
        n = len(t64)
        seg_starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        bounds = np.r_[seg_starts, n]
        lo = np.empty(n, dtype=np.int64)
        hi = np.empty(n, dtype=np.int64)
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = t64[s:e]
            lo[s:e] = s + np.searchsorted(seg, seg - win_ns, side="left")
            # hi includes equal-timestamp peers — SQL RANGE frames extend
            # through the current row's ORDER BY peers
            hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        cnt = hi - lo
        return pd.DataFrame({"event_id": df["event_id"], "n_trailing": cnt.astype("int64")})

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=32)
    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(trailing, batch_format="pandas")
    )


def _typed_range_counts(
    t64: np.ndarray, types: np.ndarray, bounds: np.ndarray, right_type: str, win_ns: np.int64
) -> np.ndarray:
    """Per-row count of SAME-segment ``right_type`` rows with ts in the
    half-open window [ts - win, ts) — the bounded range-join kernel.  One
    searchsorted pair per user segment over the segment's (sorted) typed
    timestamps; no per-event Python."""
    n = len(t64)
    out = np.zeros(n, dtype=np.int64)
    is_right = types == right_type
    for s, e in zip(bounds[:-1], bounds[1:]):
        rt = t64[s:e][is_right[s:e]]
        if not len(rt):
            continue
        seg = t64[s:e]
        out[s:e] = np.searchsorted(rt, seg, side="left") - np.searchsorted(
            rt, seg - win_ns, side="left"
        )
    return out


def events_lag_trailing(
    sf_dir: str, window_minutes: int = 60, num_buckets: int | None = None, right_type: str = "view"
) -> "ray.data.Dataset":
    """lag(prev event ts) AND trailing-window count AND bounded range-join
    count in ONE hash-bucket exchange — the fused form of
    ``events_lag_previous`` + ``events_trailing_count`` +
    ``events_range_join``: all three window/ordered-join ops share the same
    partitioning key (user_id) and in-bucket sort, so computing them
    together divides the exchanges by three (pick ONE partitioning key and
    reuse it across stages).  Output: (event_id, prev_ts, n_trailing,
    n_view_win, run_cents, run_n), where n_view_win counts the same user's
    ``right_type`` events in [ts - window, ts) and run_cents / run_n are the
    running (cumulative) integer-cents sum and row_number per user over the
    same (ts, event_id) total order — a fourth window op riding the same
    exchange for free (ROWS UNBOUNDED PRECEDING running aggregate; integer
    cents so no float summation-order divergence)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    win = np.timedelta64(window_minutes, "m")
    win_ns = np.int64(win / np.timedelta64(1, "ns"))

    def fused(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        if not len(df):
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "prev_ts": pd.Series(dtype="object"),
                    "n_trailing": pd.Series(dtype="int64"),
                    "n_view_win": pd.Series(dtype="int64"),
                    "run_cents": pd.Series(dtype="int64"),
                    "run_n": pd.Series(dtype="int64"),
                }
            )
        prev = df.groupby("user_id")["ts"].shift()
        t64 = df["ts"].to_numpy().astype("datetime64[ns]").view("i8")
        users = df["user_id"].to_numpy()
        n = len(t64)
        seg_starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        bounds = np.r_[seg_starts, n]
        lo = np.empty(n, dtype=np.int64)
        hi = np.empty(n, dtype=np.int64)
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = t64[s:e]
            lo[s:e] = s + np.searchsorted(seg, seg - win_ns, side="left")
            # hi includes equal-timestamp peers — SQL RANGE frames extend
            # through the current row's ORDER BY peers
            hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        n_rj = _typed_range_counts(t64, df["event_type"].to_numpy(), bounds, right_type, win_ns)
        # running totals ride the same sort: a plain cumsum minus each
        # user segment's starting offset (integer cents — associative,
        # order-stable); run_n is the in-segment row_number
        cents = np.floor(df["value"].to_numpy(dtype=np.float64) * 100.0).astype(np.int64)
        cs = np.cumsum(cents)
        sizes = np.diff(bounds)
        base = np.repeat(cs[bounds[:-1]] - cents[bounds[:-1]], sizes)
        run_n = np.arange(n, dtype=np.int64) - np.repeat(bounds[:-1], sizes) + 1
        out = pd.DataFrame(
            {
                "event_id": df["event_id"],
                "prev_ts": prev.dt.strftime("%Y-%m-%d %H:%M:%S"),
                "n_trailing": (hi - lo).astype("int64"),
                "n_view_win": n_rj,
                "run_cents": cs - base,
                "run_n": run_n,
            }
        )
        out["prev_ts"] = out["prev_ts"].where(prev.notna(), None)
        return out

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type", "value"]
    )
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=32)
    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(fused, batch_format="pandas")
    )


def events_running_total(sf_dir: str, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Standalone running-aggregate view: per event, the cumulative
    integer-cents sum and row_number over the user's events in (ts,
    event_id) order — SQL ``SUM(...) OVER (PARTITION BY user_id ORDER BY
    ts, event_id ROWS UNBOUNDED PRECEDING)``.  Thin projection of the fused
    single-exchange operator (``events_lag_trailing``) so both forms share
    one kernel and one partitioning."""
    return events_lag_trailing(sf_dir, num_buckets=num_buckets).select_columns(
        ["event_id", "run_cents", "run_n"]
    )


def events_attribution(
    sf_dir: str,
    touch_type: str = "click",
    conversion_type: str = "purchase",
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """First/last-touch conversion attribution: for every conversion event,
    the id of the user's FIRST and LAST preceding touch event and the count
    of preceding touches — 'preceding' = strictly earlier in the
    (ts, event_id) total order (simultaneous-timestamp ties break on
    event_id, the running-window family's rule).  Conversions with no
    preceding touch keep NULL touch ids (left semantics); NULL-user rows
    are excluded on both engines.

    One user-keyed bucketed exchange (the events family's shared
    partitioning key); in-bucket the three outputs are vectorized scans
    over the sorted segment array — last touch via a global
    np.maximum.accumulate whose per-segment validity falls out of position
    monotonicity (an out-of-segment max is provably < segment start), first
    touch via one np.minimum.reduceat per segment (valid whenever any
    prior touch exists, since the segment minimum precedes it), prior
    count via shifted cumsum minus the segment-start offset.  No per-user
    Python loop.  SQL twin: first_value/last_value(... IGNORE NULLS) OVER
    (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING).

    Output (conversion_id, user_id, first_touch_id, last_touch_id,
    n_prior_touches)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    # nullable touch ids are FLOAT64-with-NaN, never object-with-None: Ray
    # concatenates pandas blocks, and a mixed int64/object block stream
    # resolves dtype by CONCAT ORDER — nondeterministic across runs — while
    # the gate normalizes float NaN ("nan") and None ("<null>") differently
    # (latent flake caught by the randomized twin-equivalence tests)
    _EMPTY = pd.DataFrame(
        {
            "conversion_id": pd.Series(dtype="int64"),
            "user_id": pd.Series(dtype="int64"),
            "first_touch_id": pd.Series(dtype="float64"),
            "last_touch_id": pd.Series(dtype="float64"),
            "n_prior_touches": pd.Series(dtype="int64"),
        }
    )

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        df = df[df["user_id"].notna()]
        if not len(df):
            return _EMPTY
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        users = df["user_id"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        etype = df["event_type"].to_numpy()
        n = len(df)
        touch = etype == touch_type
        pos = np.arange(n, dtype=np.int64)
        seg_starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        sizes = np.diff(np.r_[seg_starts, n])
        start_of = np.repeat(seg_starts, sizes)
        BIG = np.int64(n + 1)
        ff_last = np.maximum.accumulate(np.where(touch, pos, -1))
        first_pos_seg = np.minimum.reduceat(np.where(touch, pos, BIG), seg_starts)
        first_of = np.repeat(first_pos_seg, sizes)
        cs = np.cumsum(touch.astype(np.int64))
        prev_last = np.r_[np.int64(-1), ff_last[:-1]]
        prev_cs = np.r_[np.int64(0), cs[:-1]]
        ci = np.flatnonzero(etype == conversion_type)
        if not len(ci):
            return _EMPTY
        n_prior = prev_cs[ci] - prev_cs[start_of[ci]]
        has = n_prior > 0
        first_ids = np.where(
            has, eid[np.minimum(first_of[ci], n - 1)].astype(np.float64), np.nan
        )
        last_ids = np.where(
            has, eid[np.maximum(prev_last[ci], 0)].astype(np.float64), np.nan
        )
        return pd.DataFrame(
            {
                "conversion_id": eid[ci],
                "user_id": users[ci],
                "first_touch_id": first_ids,
                "last_touch_id": last_ids,
                "n_prior_touches": n_prior,
            }
        )

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=32)
    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(scan, batch_format="pandas")
    )


def events_conversion_latency(
    sf_dir: str,
    touch_type: str = "click",
    conversion_type: str = "purchase",
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Time-to-convert summary for the touch→conversion edge: over every
    conversion with a preceding touch (the events_attribution frame),
    integer-ms latency to the LAST touch, reduced to ONE exact row —
    (n, min_ms, max_ms, sum_ms) are int64 partials merged associatively
    per bucket; mean_ms = sum::DOUBLE / n is the only float (one
    division, identical spelling in the twin).  Zero-latency (same-ms
    tie-ordered) conversions count.

    Output one row (n_conversions, min_ms, max_ms, sum_ms, mean_ms);
    zero attributable conversions → zero rows (mirrored by the twin's
    empty-group aggregate)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    _EMPTY = pd.DataFrame(
        {
            "n_conversions": pd.Series(dtype="int64"),
            "min_ms": pd.Series(dtype="int64"),
            "max_ms": pd.Series(dtype="int64"),
            "sum_ms": pd.Series(dtype="int64"),
        }
    )

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        df = df[df["user_id"].notna()]
        if not len(df):
            return _EMPTY
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        users = df["user_id"].to_numpy(np.int64)
        t_us = df["ts"].to_numpy().astype("datetime64[us]").view("i8")
        etype = df["event_type"].to_numpy()
        n = len(df)
        touch = etype == touch_type
        pos = np.arange(n, dtype=np.int64)
        seg_starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        start_of = np.repeat(seg_starts, np.diff(np.r_[seg_starts, n]))
        ff_last = np.maximum.accumulate(np.where(touch, pos, -1))
        prev_last = np.r_[np.int64(-1), ff_last[:-1]]
        ci = np.flatnonzero(etype == conversion_type)
        ok = (prev_last[ci] >= start_of[ci]) if len(ci) else np.zeros(0, bool)
        ci = ci[ok]
        if not len(ci):
            return _EMPTY
        lat = (t_us[ci] - t_us[prev_last[ci]]) // 1000
        return pd.DataFrame(
            {
                "n_conversions": [np.int64(len(lat))],
                "min_ms": [np.int64(lat.min())],
                "max_ms": [np.int64(lat.max())],
                "sum_ms": [np.int64(lat.sum())],
            }
        )

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=32)
    partials = (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(scan, batch_format="pandas")
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_conversions": pa.array([], pa.int64()),
                    "min_ms": pa.array([], pa.int64()),
                    "max_ms": pa.array([], pa.int64()),
                    "sum_ms": pa.array([], pa.int64()),
                    "mean_ms": pa.array([], pa.float64()),
                }
            )
        nn = int(pc.sum(t["n_conversions"]).as_py())
        sm = int(pc.sum(t["sum_ms"]).as_py())
        return pa.table(
            {
                "n_conversions": pa.array([nn], pa.int64()),
                "min_ms": pa.array([int(pc.min(t["min_ms"]).as_py())], pa.int64()),
                "max_ms": pa.array([int(pc.max(t["max_ms"]).as_py())], pa.int64()),
                "sum_ms": pa.array([sm], pa.int64()),
                "mean_ms": pa.array([float(sm) / nn], pa.float64()),
            }
        )

    # bucket partials are |buckets|-bounded: one tiny driver-side finale
    return ray.data.from_arrow(
        finish(pa.Table.from_pandas(partials.to_pandas(), preserve_index=False))
    )


def events_attribution_linear(
    sf_dir: str,
    touch_type: str = "click",
    conversion_type: str = "purchase",
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Linear multi-touch REVENUE attribution: every touch preceding a
    conversion (the events_attribution frame: strictly earlier in
    (ts, event_id) per user) receives an equal integer share
    ``cents(conversion) // n_prior_touches`` of that conversion's value,
    summed over all the conversions it precedes — floor division so the
    per-touch credits are exact int64 on both engines (the remainder is
    deliberately unattributed, mirrored by the twin's BIGINT ``//``).
    Touches preceding NO attributable conversion are omitted; a touch
    whose every share floors to zero still appears with credit 0 (the
    existence of a later conversion, not the credit, decides membership —
    matching the twin's inner join).

    Same user-keyed exchange and in-bucket sort as events_attribution; the
    per-touch sum is one reverse-cumulative pass over the conversion-term
    array with per-segment end offsets — no per-user loop, no pair
    materialization (the SQL twin pays the touch×conversion join; the
    kernel never does).

    Output (touch_id, user_id, credit_cents)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    _EMPTY = pd.DataFrame(
        {
            "touch_id": pd.Series(dtype="int64"),
            "user_id": pd.Series(dtype="int64"),
            "credit_cents": pd.Series(dtype="int64"),
        }
    )

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        df = df[df["user_id"].notna()]
        if not len(df):
            return _EMPTY
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        users = df["user_id"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        etype = df["event_type"].to_numpy()
        cents = np.floor(np.nan_to_num(df["value"].to_numpy(np.float64)) * 100.0).astype(np.int64)
        n = len(df)
        touch = etype == touch_type
        conv = etype == conversion_type
        seg_starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        sizes = np.diff(np.r_[seg_starts, n])
        start_of = np.repeat(seg_starts, sizes)
        cs = np.cumsum(touch.astype(np.int64))
        prev_cs = np.r_[np.int64(0), cs[:-1]]
        n_prior = prev_cs - prev_cs[start_of]
        term = np.zeros(n, dtype=np.int64)
        attributable = conv & (n_prior > 0)
        term[attributable] = cents[attributable] // n_prior[attributable]
        # suffix sums (terms strictly after each row: term[row]=0 for touches)
        rs = np.r_[np.cumsum(term[::-1])[::-1], np.int64(0)]
        cnt = np.r_[np.cumsum(attributable[::-1].astype(np.int64))[::-1], np.int64(0)]
        seg_end = np.repeat(np.r_[seg_starts[1:], np.int64(n)], sizes)
        ti = np.flatnonzero(touch)
        credit = rs[ti] - rs[seg_end[ti]]
        later = cnt[ti] - cnt[seg_end[ti]]
        keep = later > 0
        return pd.DataFrame(
            {
                "touch_id": eid[ti][keep],
                "user_id": users[ti][keep],
                "credit_cents": credit[keep],
            }
        )

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type", "value"]
    )
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=32)
    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(scan, batch_format="pandas")
    )


def events_time_weighted_value(
    sf_dir: str, num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Per-user TIME-WEIGHTED average value — the telemetry/state-average
    primitive (each event's value holds until the user's next event; the
    mean weights by holding duration, not by event count):

        twa = Σ cents_i · Δms_i / Σ Δms_i,   Δms_i = (t_{i+1} − t_i) // 1000

    over the user's (ts, event_id)-ordered valued events; the last event
    has no holding interval and contributes nothing.  Both sums are exact
    int64 (cents ≤ ~10⁴, Δms ≤ ~10¹⁰ per interval — products stay far
    inside int64 at per-user scale), so the only float is the final
    one-division ratio; a zero total duration (all events in one
    millisecond) yields NULL, never a platform-dependent inf.  NULL-value
    and NULL-user rows are excluded (mirrored WHERE).

    One user-keyed bucketed exchange; in-bucket the intervals are a
    shifted-difference over the sorted segment array and the per-user sums
    are np.add.reduceat over segment bounds — no per-user loop.

    Output (user_id, n_intervals, num_cents_ms, den_ms, twa_cents)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    _EMPTY = pd.DataFrame(
        {
            "user_id": pd.Series(dtype="int64"),
            "n_intervals": pd.Series(dtype="int64"),
            "num_cents_ms": pd.Series(dtype="int64"),
            "den_ms": pd.Series(dtype="int64"),
            "twa_cents": pd.Series(dtype="float64"),
        }
    )

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        df = df[df["user_id"].notna() & df["value"].notna()]
        if not len(df):
            return _EMPTY
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        users = df["user_id"].to_numpy(np.int64)
        t_us = df["ts"].to_numpy().astype("datetime64[us]").view("i8")
        cents = np.floor(df["value"].to_numpy(np.float64) * 100.0).astype(np.int64)
        n = len(df)
        same_next = np.r_[users[1:] == users[:-1], False]
        dms = np.zeros(n, dtype=np.int64)
        dms[:-1] = (t_us[1:] - t_us[:-1]) // 1000
        dms[~same_next] = 0
        has_iv = same_next
        seg_starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        num = np.add.reduceat(cents * dms, seg_starts)
        den = np.add.reduceat(dms, seg_starts)
        niv = np.add.reduceat(has_iv.astype(np.int64), seg_starts)
        uid = users[seg_starts]
        keep = niv > 0
        num, den, niv, uid = num[keep], den[keep], niv[keep], uid[keep]
        twa = np.where(den > 0, num.astype(np.float64) / np.where(den > 0, den, 1), np.nan)
        out = pd.DataFrame(
            {
                "user_id": uid,
                "n_intervals": niv,
                "num_cents_ms": num,
                "den_ms": den,
                "twa_cents": twa,
            }
        )
        out["twa_cents"] = out["twa_cents"].where(den > 0, None)
        return out

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=32)
    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(scan, batch_format="pandas")
    )


def events_funnel(
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Ordered-sequence funnel: how many users performed step 1, then step
    2 STRICTLY LATER, then step 3 strictly later still (greedy
    earliest-occurrence matching, which is optimal by the classic exchange
    argument, so reachability is exact).  One user-keyed hash-bucket
    exchange; inside each bucket every step is one vectorized
    ``np.minimum.reduceat`` over the user segments (no per-user Python
    loop).  Each bucket emits one |steps|-row partial; a tiny final groupby
    sums them.  Output: (step, event_type, n_users)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    steps = tuple(steps)
    pos_inf = np.iinfo(np.int64).max
    neg_inf = np.iinfo(np.int64).min

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros(len(steps), dtype=np.int64)
        df = df.drop(columns=[BUCKET_COL])
        if len(df):
            df = df.sort_values(["user_id", "ts"], kind="mergesort")
            t64 = df["ts"].to_numpy().astype("datetime64[ns]").view("i8")
            users = df["user_id"].to_numpy()
            types = df["event_type"].to_numpy()
            seg_starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
            sizes = np.diff(np.r_[seg_starts, len(users)])
            thr = np.full(len(seg_starts), neg_inf, dtype=np.int64)
            for si, etype in enumerate(steps):
                thr_row = np.repeat(thr, sizes)
                cand = np.where((types == etype) & (t64 > thr_row), t64, pos_inf)
                thr = np.minimum.reduceat(cand, seg_starts)
                counts[si] = int((thr < pos_inf).sum())
        return pd.DataFrame(
            {
                "step": np.arange(1, len(steps) + 1, dtype=np.int64),
                "event_type": list(steps),
                "n_users": counts,
            }
        )

    import pyarrow.dataset as pads

    # prune at the read: only the step types can ever advance the funnel
    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"),
        columns=["user_id", "ts", "event_type"],
        filter=pads.field("event_type").isin(list(steps)),
    )
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=16)
    partials = (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )
    return partials.groupby(["step", "event_type"]).aggregate(Sum("n_users", alias_name="n_users"))


def events_funnel_windowed(
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    window_minutes: int = 60,
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Deadline funnel: step k counts users holding a FEASIBLE step-k event
    — one with a feasible step-(k−1) event strictly earlier in the
    (ts, event_id) order and at most ``window_minutes`` older.  Unlike the
    unbounded funnel, greedy earliest matching is NOT optimal under
    deadlines (an early step-1 event can time out where a later one would
    chain), so feasibility is the exact DP over all chains.

    The DP stays vectorized: within the per-user sort, times are
    nondecreasing, so the best feasible predecessor of a candidate is
    simply the LATEST feasible step-(k−1) row before it in its segment —
    one searchsorted over the feasible-position array per step, O(1) per
    candidate, no per-user loop, no quadratic EXISTS (the SQL twin pays
    that join; the kernel never does).

    Output (step, event_type, n_users)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    steps = tuple(steps)
    win_ns = np.int64(np.timedelta64(window_minutes, "m") / np.timedelta64(1, "ns"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros(len(steps), dtype=np.int64)
        df = df.drop(columns=[BUCKET_COL])
        df = df[df["user_id"].notna()]
        if len(df):
            df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
            t64 = df["ts"].to_numpy().astype("datetime64[ns]").view("i8")
            users = df["user_id"].to_numpy(np.int64)
            types = df["event_type"].to_numpy()
            n = len(df)
            seg_starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
            start_of = np.repeat(seg_starts, np.diff(np.r_[seg_starts, n]))
            feas_pos = np.flatnonzero(types == steps[0])
            counts[0] = len(np.unique(users[feas_pos]))
            for si in range(1, len(steps)):
                ci = np.flatnonzero(types == steps[si])
                if not len(ci) or not len(feas_pos):
                    feas_pos = np.empty(0, dtype=np.int64)
                    break
                j = np.searchsorted(feas_pos, ci) - 1
                prev = feas_pos[np.maximum(j, 0)]
                ok = (j >= 0) & (prev >= start_of[ci]) & (t64[ci] - t64[prev] <= win_ns)
                feas_pos = ci[ok]
                counts[si] = len(np.unique(users[feas_pos]))
        return pd.DataFrame(
            {
                "step": np.arange(1, len(steps) + 1, dtype=np.int64),
                "event_type": list(steps),
                "n_users": counts,
            }
        )

    import pyarrow.dataset as pads

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"),
        columns=["user_id", "ts", "event_id", "event_type"],
        filter=pads.field("event_type").isin(list(steps)),
    )
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=16)
    partials = (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )
    return partials.groupby(["step", "event_type"]).aggregate(Sum("n_users", alias_name="n_users"))


def events_burst_max(
    sf_dir: str, window_minutes: int = 60, num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Per-user peak sliding-window rate — the rate-limit / bot audit: the
    maximum number of the user's events in any ``window_minutes`` window,
    measured at event boundaries (where every continuous-window maximum is
    attained), plus the EARLIEST window-end achieving it (µs epoch).  The
    window is [t − W, t] inclusive with equal-timestamp peers counted
    (SQL RANGE-frame semantics, the events_lag_trailing convention).

    One user-keyed exchange; per segment the trailing counts are two
    searchsorted passes and the argmax is a masked minimum.reduceat —
    no per-user loop.

    Output (user_id, burst_max, at_us)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    win_us = np.int64(np.timedelta64(window_minutes, "m") / np.timedelta64(1, "us"))
    _EMPTY = pd.DataFrame(
        {
            "user_id": pd.Series(dtype="int64"),
            "burst_max": pd.Series(dtype="int64"),
            "at_us": pd.Series(dtype="int64"),
        }
    )

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        df = df[df["user_id"].notna()]
        if not len(df):
            return _EMPTY
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        users = df["user_id"].to_numpy(np.int64)
        t_us = df["ts"].to_numpy().astype("datetime64[us]").view("i8")
        n = len(df)
        bounds = np.r_[np.flatnonzero(np.r_[True, users[1:] != users[:-1]]), n]
        c = np.empty(n, dtype=np.int64)
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = t_us[s:e]
            lo = np.searchsorted(seg, seg - win_us, side="left")
            hi = np.searchsorted(seg, seg, side="right")
            c[s:e] = hi - lo
        seg_starts = bounds[:-1]
        sizes = np.diff(bounds)
        bmax = np.maximum.reduceat(c, seg_starts)
        at = np.minimum.reduceat(
            np.where(c == np.repeat(bmax, sizes), t_us, np.iinfo(np.int64).max), seg_starts
        )
        return pd.DataFrame(
            {"user_id": users[seg_starts], "burst_max": bmax, "at_us": at}
        )

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=32)
    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(scan, batch_format="pandas")
    )


def events_anomaly_days(sf_dir: str, k_sigma: int = 3) -> "ray.data.Dataset":
    """Anomalous-day detection per event type with ZERO float arithmetic:
    a day is anomalous when |n_d − mean| > k·σ over the type's active
    days, decided by the integer cross-multiplication

        (n_d·D − S)² > k² · (D·S2 − S²)

    (mean = S/D, var = (D·S2 − S²)/D² — the float mean/σ never exist, so
    the boundary case is decided identically on both engines).  Every
    (type, active day) row is emitted with its verdict, so the output is
    non-degenerate even on a corpus with no anomalies.

    Map-side (type, day) collapse per batch, one |types|-keyed exchange
    over day-partials, per-type moments from the bounded day table.

    Output (event_type, day_idx, n_events, is_anomaly); day_idx =
    epoch_us // 86_400_000_000."""
    _US_DAY = np.int64(86_400_000_000)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas().fillna("<NULL>"),
                # explicit µs normalization: a bare int64 cast would yield
                # whatever unit the file carries (pandas-written parquet is
                # ns) and silently shift every day boundary
                "day_idx": t["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                )
                // _US_DAY,
            }
        )
        g = df.groupby(["event_type", "day_idx"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_type(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day_idx", as_index=False)["n"].sum()
        nd = g["n"].to_numpy(np.int64)
        D = np.int64(len(g))
        S = np.int64(nd.sum())
        S2 = np.int64((nd * nd).sum())
        dev = nd * D - S
        flag = dev * dev > np.int64(k_sigma * k_sigma) * (D * S2 - S * S)
        return pd.DataFrame(
            {
                "event_type": df["event_type"].iloc[0],
                "day_idx": g["day_idx"].to_numpy(np.int64),
                "n_events": nd,
                "is_anomaly": flag,
            }
        )

    return (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("event_type")
        .map_groups(per_type, batch_format="pandas")
    )


def events_type_transitions(sf_dir: str, num_buckets: int | None = None) -> "ray.data.Dataset":
    """First-order Markov transition counts: for every consecutive pair of
    one user's events in (ts, event_id) order, count the (prev_type →
    cur_type) transition globally.  Same user-keyed exchange shape as the
    other ordered ops; inside a bucket the transition pairs fall out of one
    adjacency mask over the sorted arrays and a factorize + bincount — each
    bucket emits at most |types|² partial rows, then a tiny groupby sums
    them.  Output: (prev_type, cur_type, n)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if not len(df):
            return pd.DataFrame(
                {
                    "prev_type": pd.Series(dtype="object"),
                    "cur_type": pd.Series(dtype="object"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        users = df["user_id"].to_numpy()
        # '<NULL>' sentinel (the docs_lang_mode convention) keeps null types
        # countable without corrupting the factorize codes (NaN → -1)
        codes, types = pd.factorize(df["event_type"].fillna("<NULL>").to_numpy())
        codes = codes.astype(np.int64)
        m = users[1:] == users[:-1]
        v = np.int64(len(types))
        pair = codes[:-1][m] * v + codes[1:][m]
        ks, cnts = np.unique(pair, return_counts=True)
        return pd.DataFrame(
            {
                "prev_type": types.take(ks // v),
                "cur_type": types.take(ks % v),
                "n": cnts.astype(np.int64),
            }
        )

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=16)
    partials = (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )
    return partials.groupby(["prev_type", "cur_type"]).aggregate(Sum("n", alias_name="n"))


def docs_quantile_disc(
    sf_dir: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9), num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Exact per-group DISCRETE quantiles (the quantile_disc / percentile_disc
    analogue — always an actual element of the group, unlike the gated
    interpolating ``v_ntok_quantiles``): for each source, the element at
    0-based index ceil(q*n)-1 of the sorted non-null n_chars (pinned to
    DuckDB's quantile_disc semantics by ``tests``; the q*n product is
    evaluated in the same IEEE double arithmetic on both sides).  One
    source-keyed hash-bucket exchange ships only (source, n_chars); inside
    a bucket every group's quantiles come from one shared mergesort +
    per-segment index arithmetic.  Groups with zero non-null values are
    omitted (the oracle says HAVING count(n_chars) > 0).  Integer outputs
    → hash-exact by construction."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    qcols = [f"q{int(round(q * 100))}" for q in qs]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        df = df[df["n_chars"].notna()]
        if not len(df):
            return pd.DataFrame(
                {"source": pd.Series(dtype="object")}
                | {c: pd.Series(dtype="int64") for c in qcols}
            )
        df = pd.DataFrame(
            {"source": df["source"].fillna("<NULL>"), "n_chars": df["n_chars"].astype("int64")}
        ).sort_values(["source", "n_chars"], kind="mergesort")
        src = df["source"].to_numpy()
        vals = df["n_chars"].to_numpy()
        seg_starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        ns = np.diff(np.r_[seg_starts, len(src)])
        out = {"source": src[seg_starts]}
        for q, c in zip(qs, qcols):
            idx = seg_starts + np.maximum(np.ceil(q * ns).astype(np.int64) - 1, 0)
            out[c] = vals[idx]
        return pd.DataFrame(out)

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["source", "n_chars"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=2_000_000, lo=8)
    return (
        ds.map_batches(lambda t: with_bucket(t, "source", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )


def events_tumbling(sf_dir: str, window_minutes: int = 60) -> "ray.data.Dataset":
    """Tumbling (fixed, non-overlapping) time-window aggregate: per window,
    event count, distinct users, and an exact integer value sum
    (floor(value*100) cents — float SUM order differs between engines, an
    integer sum cannot).

    Map-side combine collapses each batch to its distinct (window, user)
    partials before the exchange, so the shuffle moves at most
    |windows|x|users| rows regardless of corpus size; the per-window
    groupby then counts users as plain rows."""
    import pyarrow as pa

    from hepdata_validator_ray.ops import bucketed_aggregate

    win_us = np.int64(window_minutes) * np.int64(60_000_000)

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ep = df["ts"].to_numpy().astype("datetime64[us]").view("i8")
        win = (ep // win_us) * win_us
        cents = np.floor(df["value"].to_numpy(dtype=np.float64) * 100.0).astype(np.int64)
        g = (
            pd.DataFrame({"win": win, "user_id": df["user_id"], "n": 1, "cents": cents})
            .groupby(["win", "user_id"], as_index=False)
            .agg(n=("n", "sum"), cents=("cents", "sum"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "user_id", "value"])
    return bucketed_aggregate(ds, "win", partial, _window_rollup_combine, num_buckets=16)


def _window_rollup_combine(t: pa.Table) -> pa.Table:
    """Reduce-side rollup shared by the tumbling and hopping window
    aggregates: collapse per-(win,user) partials from different batches to
    one row each, then count users as rows per window."""
    df = t.to_pandas()
    wu = df.groupby(["win", "user_id"], as_index=False).agg(
        n=("n", "sum"), cents=("cents", "sum")
    )
    g = wu.groupby("win", as_index=False).agg(
        n_events=("n", "sum"), n_users=("user_id", "count"), sum_cents=("cents", "sum")
    )
    out = pd.DataFrame(
        {
            "win_start": pd.to_datetime(g["win"], unit="us").dt.strftime("%Y-%m-%d %H:%M:%S"),
            "n_events": g["n_events"].astype("int64"),
            "n_users": g["n_users"].astype("int64"),
            "sum_cents": g["sum_cents"].astype("int64"),
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def events_hopping(
    sf_dir: str, window_minutes: int = 60, hop_minutes: int = 30
) -> "ray.data.Dataset":
    """Hopping (sliding, overlapping) time-window aggregate: windows of
    ``window_minutes`` starting every ``hop_minutes`` (window must be a
    multiple of hop).  Each event is replicated into its window/hop
    memberships MAP-SIDE with numpy tile/repeat, then collapsed to distinct
    (window, user) partials BEFORE the exchange — the shuffle still moves at
    most |windows|x|users| rows, not |events| x (window/hop).

    Same output contract as ``events_tumbling`` (count, distinct users,
    exact integer cents sum); the two share ``_window_rollup_combine``."""
    import pyarrow as pa

    from hepdata_validator_ray.ops import bucketed_aggregate

    if window_minutes % hop_minutes:
        raise ValueError("window_minutes must be a multiple of hop_minutes")
    nwin = window_minutes // hop_minutes
    hop_us = np.int64(hop_minutes) * np.int64(60_000_000)

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ep = df["ts"].to_numpy().astype("datetime64[us]").view("i8")
        s0 = (ep // hop_us) * hop_us
        cents = np.floor(df["value"].to_numpy(dtype=np.float64) * 100.0).astype(np.int64)
        # event at t belongs to windows starting at s0 - k*hop for
        # k = 0..nwin-1 (each start s satisfies s <= t < s + window)
        win = np.tile(s0, nwin) - np.repeat(np.arange(nwin, dtype=np.int64) * hop_us, len(s0))
        g = (
            pd.DataFrame(
                {
                    "win": win,
                    "user_id": np.tile(df["user_id"].to_numpy(), nwin),
                    "n": 1,
                    "cents": np.tile(cents, nwin),
                }
            )
            .groupby(["win", "user_id"], as_index=False)
            .agg(n=("n", "sum"), cents=("cents", "sum"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "user_id", "value"])
    return bucketed_aggregate(ds, "win", partial, _window_rollup_combine, num_buckets=16)


def events_range_join(
    sf_dir: str,
    left_type: str = "purchase",
    right_type: str = "view",
    window_minutes: int = 60,
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Bounded range join (the interval-join operator Ray Data lacks): for
    each LEFT-type event, the number of SAME-user RIGHT-type events with ts
    in the half-open window [ts - window, ts) — the attribution-style
    "views in the hour before each purchase" join.

    Physical plan: one hash-bucket exchange on user_id (the one
    partitioning key every events operator reuses); inside a bucket one
    searchsorted pair per user segment against the segment's typed
    timestamps.  Oracle: DuckDB range join (LEFT JOIN on user + ts band,
    GROUP BY)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    win = np.timedelta64(window_minutes, "m")
    win_ns = np.int64(win / np.timedelta64(1, "ns"))

    def rjoin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        if not len(df):
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"), "n_in_window": pd.Series(dtype="int64")}
            )
        t64 = df["ts"].to_numpy().astype("datetime64[ns]").view("i8")
        users = df["user_id"].to_numpy()
        seg_starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        bounds = np.r_[seg_starts, len(t64)]
        cnt = _typed_range_counts(t64, df["event_type"].to_numpy(), bounds, right_type, win_ns)
        keep = df["event_type"].to_numpy() == left_type
        return pd.DataFrame(
            {"event_id": df["event_id"].to_numpy()[keep], "n_in_window": cnt[keep]}
        )

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=32)
    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(rjoin, batch_format="pandas")
    )


def top_parts_per_brand(sf_dir: str, k: int = 3, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Grouped top-k (top documents per domain is the training-data shape):
    top-k parts per brand by retail price.  One hash-bucket exchange on the
    group key; inside a bucket a single vectorized sort + groupby-head
    covers all the bucket's groups.  Deterministic tie-break: p_partkey."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(
            ["p_brand", "p_retailprice", "p_partkey"], ascending=[True, False, True], kind="mergesort"
        )
        out = df.groupby("p_brand", sort=False).head(k)
        return out[["p_brand", "p_partkey", "p_retailprice"]]

    ds = ray.data.read_parquet(_pq(sf_dir, "part"), columns=["p_brand", "p_partkey", "p_retailprice"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=16)
    return (
        ds.map_batches(lambda t: with_bucket(t, "p_brand", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(topk, batch_format="pandas")
    )


def events_asof_join(
    sf_dir: str, left_type: str = "purchase", right_type: str = "view", num_buckets: int | None = None
) -> "ray.data.Dataset":
    """As-of join (the ordered-join operator Ray Data lacks): for each
    LEFT-type event, the most recent RIGHT-type event of the SAME user at or
    before its timestamp.

    Physical plan: both sides hash-bucket on user_id into one exchange
    (bucket count derived from input size); inside a bucket ONE vectorized
    ``pd.merge_asof(by=user_id)`` handles all the bucket's users.
    Partitioning assumption: a user's events co-locate in one bucket (true
    by construction of the hash bucket).  Output carries only the matched
    timestamp so equal-timestamp ties are value-deterministic; oracle:
    DuckDB's native ASOF LEFT JOIN."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        left = df[df.event_type == left_type].sort_values(["ts", "event_id"], kind="mergesort")
        right = df[df.event_type == right_type].sort_values(["ts", "event_id"], kind="mergesort")
        merged = pd.merge_asof(
            left[["event_id", "user_id", "ts"]],
            right[["user_id", "ts"]].assign(matched_ts=right["ts"]),
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        out = pd.DataFrame(
            {
                "event_id": merged["event_id"],
                "matched_ts": merged["matched_ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
            }
        )
        out["matched_ts"] = out["matched_ts"].where(merged["matched_ts"].notna(), None)
        return out

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=32)
    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(asof, batch_format="pandas")
    )


def referential_integrity(sf_dir: str) -> pd.DataFrame:
    """Referential anti-join checks (SURVEY.md §2.4 J2): count of child rows
    whose foreign key has no parent — broadcast key-set membership filter
    inside map_batches, no shuffle.  One summary row per relation so the
    result schema is stable even with zero violations."""

    def missing_count(child_tbl: str, child_key: str, parent_tbl: str, parent_key: str) -> int:
        parent = pd.read_parquet(_pq(sf_dir, parent_tbl), columns=[parent_key])[parent_key].to_numpy()
        ref = ray.put(np.sort(parent))

        class AntiJoin:
            def __init__(self, r):
                self.keys = ray.get(r)  # sorted ndarray, once per actor

            def __call__(self, t: pa.Table) -> pa.Table:
                keys = t[child_key].to_numpy(zero_copy_only=False)
                # sorted-membership via searchsorted — exploits the sorted
                # broadcast array (np.isin would rebuild its own structure
                # per batch and ignore the sort)
                if len(self.keys):
                    pos = np.searchsorted(self.keys, keys)
                    pos[pos == len(self.keys)] = 0
                    n = int((self.keys[pos] != keys).sum())
                else:
                    n = len(keys)
                return pa.Table.from_pydict({"n": pa.array([n], type=pa.int64())})

        parts = (
            ray.data.read_parquet(_pq(sf_dir, child_tbl), columns=[child_key])
            .map_batches(AntiJoin, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=2)
            .sum("n")
        )
        return int(parts)

    return pd.DataFrame(
        [
            {"relation": "lineitem->orders", "n_missing": missing_count("lineitem", "l_orderkey", "orders", "o_orderkey")},
            {"relation": "orders->customer", "n_missing": missing_count("orders", "o_custkey", "customer", "c_custkey")},
        ]
    )


def events_props_stats(sf_dir: str, key: str = "k") -> "ray.data.Dataset":
    """Semi-structured payload extraction (the reference parses YAML payloads
    into typed fields, `full_submission_validator.py` load path; the
    web-pipeline analogue is a JSON props column): pull an integer field out
    of the `props` JSON string with ONE compiled-regex vectorized pass
    (pandas `str.extract`, no per-row json.loads), then aggregate per
    event_type with a map-side combine so the exchange moves
    |event_types| x |batches| rows.

    Extraction grammar (documented contract, matched exactly by the DuckDB
    oracle's json_extract on this flat shape): a single integer value for
    ``key`` in a flat JSON object.  Rows whose props are NULL / not valid
    flat-int JSON count into ``n_null`` and contribute nothing to the sums.
    """
    import re

    import pyarrow as pa

    from hepdata_validator_ray.ops import bucketed_aggregate

    pat = re.compile(r'[{,]\s*"' + re.escape(key) + r'"\s*:\s*(-?\d+)\s*[,}]')

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        k = pd.to_numeric(df["props"].str.extract(pat, expand=False), errors="coerce").astype("Int64")
        g = (
            pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "n_events": 1,
                    "n_null": k.isna().astype("int64"),
                    "k": k,
                }
            )
            .groupby("event_type", as_index=False)
            .agg(
                n_events=("n_events", "sum"),
                n_null=("n_null", "sum"),
                sum_k=("k", "sum"),
                min_k=("k", "min"),
                max_k=("k", "max"),
            )
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"),
            n_null=("n_null", "sum"),
            sum_k=("sum_k", "sum"),
            min_k=("min_k", "min"),
            max_k=("max_k", "max"),
        )
        for c in ("n_events", "n_null", "sum_k", "min_k", "max_k"):
            g[c] = g[c].astype("Int64" if c in ("sum_k", "min_k", "max_k") else "int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "props"])
    return bucketed_aggregate(ds, "event_type", partial, combine, num_buckets=8)


def docs_rollup_stats(sf_dir: str, grouping: str = "rollup") -> "ray.data.Dataset":
    """Multi-level rollup/cube aggregate: doc count and char sum at
    (source, lang), (source, <ALL>), and (<ALL>, <ALL>) levels —
    ``grouping="cube"`` adds the (<ALL>, lang) level (GROUP BY CUBE).

    Physical plan: ONE map-side-combined exchange to the finest level
    (|sources| x |langs| rows — tiny however large the corpus), then the
    coarser levels are re-aggregated from the finest table in a single
    1-partition map_batches — hierarchical re-aggregation, never a second
    scan of the input.  Real NULL group values become '<NULL>' so they stay
    distinguishable from the rollup's '<ALL>' marker (the SQL oracle uses
    the same sentinels)."""
    if grouping not in ("rollup", "cube"):
        raise ValueError(f"grouping must be 'rollup' or 'cube', got {grouping!r}")
    import pyarrow as pa

    from hepdata_validator_ray.ops import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (
            pd.DataFrame(
                {
                    "source": df["source"].fillna("<NULL>"),
                    "lang": df["lang"].fillna("<NULL>"),
                    "n_docs": 1,
                    "sum_chars": df["n_chars"].fillna(0).astype("int64"),
                }
            )
            .groupby(["source", "lang"], as_index=False)
            .agg(n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["source", "lang"], as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def expand(t: pa.Table) -> pa.Table:
        f = t.to_pandas()
        by_src = f.groupby("source", as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum")
        )
        by_src.insert(1, "lang", "<ALL>")
        total = pd.DataFrame(
            {
                "source": ["<ALL>"],
                "lang": ["<ALL>"],
                "n_docs": [f["n_docs"].sum()],
                "sum_chars": [f["sum_chars"].sum()],
            }
        )
        levels = [f, by_src, total]
        if grouping == "cube":
            by_lang = f.groupby("lang", as_index=False).agg(
                n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum")
            )
            by_lang.insert(0, "source", "<ALL>")
            levels.insert(2, by_lang)
        out = pd.concat(levels, ignore_index=True)
        out["n_docs"] = out["n_docs"].astype("int64")
        out["sum_chars"] = out["sum_chars"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["source", "lang", "n_chars"])
    finest = bucketed_aggregate(ds, "source", partial, combine, num_buckets=8)
    # the finest level is tiny (|sources| x |langs|) — 1 partition is the
    # POINT: rollup expansion must see all of it at once
    return finest.repartition(1).map_batches(expand, batch_format="pyarrow")


def events_daily_pivot(
    sf_dir: str,
    values: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
) -> "ray.data.Dataset":
    """Pivot (long -> wide): per day, one count column per DECLARED event
    type plus ``n_other``.  Like Spark's ``pivot(values=[...])``, the
    category list is part of the call contract so the output schema is
    deterministic and the plan never needs a distinct-values pre-pass
    (which would be a second full scan + barrier at scale).  Types outside
    the list — including NULL — fold into ``n_other`` rather than silently
    vanishing.

    Per batch the (day x type) counts come from ONE np.bincount over
    fused integer codes (day_code * (n_types+1) + type_code); the exchange
    then moves at most |days| x |batches| wide rows."""
    import pyarrow as pa

    from hepdata_validator_ray.ops import bucketed_aggregate

    vals = list(values)
    cols = [f"n_{v}" for v in vals] + ["n_other"]
    nv = len(vals)

    def partial(t: pa.Table) -> pa.Table:
        day = pc.strftime(t["ts"], format="%Y-%m-%d").to_pandas()
        day_codes, day_uniq = pd.factorize(day)
        et = pd.Categorical(t["event_type"].to_pandas(), categories=vals)
        tcodes = et.codes.astype(np.int64)  # -1 = not in list / NULL
        tcodes[tcodes < 0] = nv  # the n_other slot
        counts = np.bincount(
            day_codes * (nv + 1) + tcodes, minlength=len(day_uniq) * (nv + 1)
        ).reshape(len(day_uniq), nv + 1)
        out = pd.DataFrame({"day": day_uniq})
        for j, c in enumerate(cols):
            out[c] = counts[:, j].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("day", as_index=False)[cols].sum()
        for c in cols:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])
    return bucketed_aggregate(ds, "day", partial, combine, num_buckets=8)


def docs_lang_mode(sf_dir: str) -> "ray.data.Dataset":
    """Per-group MODE aggregate: for each source, the most frequent lang
    (deterministic tie-break: lexically smallest lang among the tied).
    Mode is not decomposable the way sum/min are, so the plan ships the
    full (source, lang) count table — still tiny, |sources| x |langs| —
    through one map-side-combined exchange keyed on source, then takes the
    per-source argmax inside the reduce.  NULL langs stay countable via the
    '<NULL>' sentinel (shared with docs_rollup_stats; same on the SQL
    side)."""
    import pyarrow as pa

    from hepdata_validator_ray.ops import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (
            pd.DataFrame(
                {
                    "source": df["source"].fillna("<NULL>"),
                    "lang": df["lang"].fillna("<NULL>"),
                    "n": 1,
                }
            )
            .groupby(["source", "lang"], as_index=False)
            .agg(n=("n", "sum"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["source", "lang"], as_index=False).agg(n=("n", "sum"))
        # argmax per source with the documented tie-break: sort by
        # (count desc, lang asc) and keep the first row per source
        g = g.sort_values(["source", "n", "lang"], ascending=[True, False, True])
        top = g.drop_duplicates("source", keep="first").reset_index(drop=True)
        out = pd.DataFrame(
            {
                "source": top["source"],
                "mode_lang": top["lang"],
                "n_docs": top["n"].astype("int64"),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["source", "lang"])
    return bucketed_aggregate(ds, "source", partial, combine, num_buckets=8)


def docs_ntile(sf_dir: str, n: int = 4) -> "ray.data.Dataset":
    """NTILE window: per source, assign each doc to one of ``n`` equal-depth
    tiles by (n_chars, doc_id) order — SQL NTILE semantics (the first
    cnt % n tiles get one extra row).  Completes the ranking-window family
    (top-k-per-group = rank filter, shuffle_ranks = global row_number,
    this = ntile).  Ordering key coalesces NULL n_chars to 0 (same on the
    SQL side).

    A window that ranks EVERY row cannot be a bounded aggregate, but it
    never needs to co-locate a whole source in one task either (the r3
    plan's skew hazard: one hot source == one giant task).  Two passes:

    1. one |sources|×|value-domain| histogram exchange (the ntok_mad
       shape) gives each (source, v) run its START rank (cumulative count
       of strictly smaller values) and each source its total n; both
       broadcast as value-domain-bounded dicts via ``ray.put``;
    2. one row-scale exchange hash-bucketed on the packed ``source|v`` key
       co-locates exactly the rows that still contend (equal values); each
       bucket mergesorts by (key, doc_id), assigns segment ordinals with
       run-length arithmetic, and rank = start + ordinal feeds the
       closed-form tile — no driver row ever, no cross-bucket seam (ranks
       of distinct values are independent by construction)."""
    import pyarrow as pa

    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket
    from ray.data.aggregate import Count

    hist = (
        ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["source", "n_chars"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["source"], pa.scalar("<NULL>", pa.string())),
                    pc.coalesce(pc.cast(t["n_chars"], pa.int64()), pa.scalar(0, pa.int64())),
                ],
                names=["skey", "v"],
            ),
            batch_format="pyarrow",
        )
        .groupby(["skey", "v"])
        .aggregate(Count(alias_name="c"))
        .to_pandas()  # |sources| × |value domain|, bounded
    )
    starts: dict[str, int] = {}
    ns: dict[str, int] = {}
    for src, grp in hist.groupby("skey", sort=True):
        grp = grp.sort_values("v")
        c = grp["c"].to_numpy(np.int64)
        run_starts = np.concatenate([[0], np.cumsum(c)[:-1]])
        for v, s in zip(grp["v"].to_numpy(np.int64), run_starts):
            starts[f"{src}|{v}"] = int(s)
        ns[src] = int(c.sum())
    maps_ref = ray.put((starts, ns))

    def project(t: pa.Table) -> pa.Table:
        skey = pc.coalesce(t["source"], pa.scalar("<NULL>", pa.string()))
        v = pc.coalesce(pc.cast(t["n_chars"], pa.int64()), pa.scalar(0, pa.int64()))
        out = pa.Table.from_arrays(
            [
                pc.cast(t["doc_id"], pa.int64()),
                t["source"],
                pc.binary_join_element_wise(skey, pc.cast(v, pa.string()), "|"),
                skey,
            ],
            names=["doc_id", "source", "key", "skey"],
        )
        return with_bucket(out, "key", nb)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if not len(df):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "source": pd.Series(dtype="object"),
                    "tile": pd.Series(dtype="int64"),
                }
            )
        smap, nmap = ray.get(maps_ref)
        df = df.sort_values(["key", "doc_id"], kind="mergesort").reset_index(drop=True)
        key = df["key"].to_numpy(dtype=object)
        seg = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ordinal = np.arange(len(df), dtype=np.int64) - np.repeat(seg, np.diff(np.r_[seg, len(df)]))
        start = df["key"].map(smap).to_numpy(np.int64)
        cnt = df["skey"].map(nmap).to_numpy(np.int64)
        r = start + ordinal  # 0-based within-source rank, globally exact
        base = cnt // n  # small-tile size (0 when cnt < n)
        rem = cnt % n
        boundary = rem * (base + 1)  # rows in the one-extra tiles
        tile = np.where(
            r < boundary,
            r // (base + 1),
            rem + (r - boundary) // np.maximum(base, 1),
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "source": df["source"],
                "tile": (tile + 1).astype("int64"),  # SQL NTILE is 1-based
            }
        )

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "source", "n_chars"])
    nb = derive_num_buckets(ds, target_rows_per_bucket=2_000_000, lo=8)
    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )


def docs_rank_windows(sf_dir: str) -> "ray.data.Dataset":
    """The SQL ranking-window family in one pass: per source, ROW_NUMBER
    (full (n_chars DESC, doc_id) tie-break), RANK / DENSE_RANK /
    PERCENT_RANK / CUME_DIST (peers = equal n_chars, per SQL semantics —
    the peer frame ignores the doc_id tie-break).  NULL n_chars coalesces
    to 0 on both sides (the docs_ntile convention).

    One source-keyed exchange; in-bucket everything is vectorized over the
    (source, n_chars DESC, doc_id) mergesort order: run starts flag rank,
    per-source cumsum of the flag gives dense_rank, a run-end transform
    gives cume_dist.  percent_rank = (rank−1)/(cnt−1) and
    cume_dist = peer_end/cnt are single divisions of exact integer doubles,
    so they hash bit-equal against the SQL window functions (percent_rank
    of a single-row partition is 0, pinned by test)."""
    import pyarrow as pa

    from hepdata_validator_ray.ops import bucketed_aggregate

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["n_chars"] = df["n_chars"].fillna(0).astype("int64")
        df = df.sort_values(
            ["source", "n_chars", "doc_id"], ascending=[True, False, True], kind="mergesort"
        ).reset_index(drop=True)
        idx = df.groupby("source").cumcount().to_numpy()
        cnt = df.groupby("source")["doc_id"].transform("size").to_numpy()
        src = df["source"].to_numpy()
        nc = df["n_chars"].to_numpy()
        p = np.arange(len(df))
        flag = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            flag[1:] = (src[1:] != src[:-1]) | (nc[1:] != nc[:-1])
        start_p = np.maximum.accumulate(np.where(flag, p, -1))
        rank = idx[start_p] + 1
        dense = pd.Series(flag).groupby(df["source"]).cumsum().to_numpy()
        run_id = np.cumsum(flag)
        peer_end = pd.Series(idx).groupby(run_id).transform("max").to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            pr = np.where(cnt > 1, (rank - 1.0) / (cnt - 1.0), 0.0)
        cd = (peer_end + 1.0) / cnt
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "source": df["source"],
                "rn": (idx + 1).astype("int64"),
                "rnk": rank.astype("int64"),
                "drnk": dense.astype("int64"),
                "pr": pr,
                "cd": cd,
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "source", "n_chars"])
    return bucketed_aggregate(ds, "source", None, combine, num_buckets=8)


#: column order of the moment-statistic partials shared by the corr and
#: regression aggregates
_SUFFSTATS = ["n_pairs", "sx", "sy", "sxy", "sxx", "syy"]


def _suffstats_partial(key: str):
    """Map-side partial for moment-based statistics over events: per batch
    and event_type, INTEGER-EXACT (n, Σx, Σy, Σxy, Σx², Σy²) where
    x = floor(value*100) cents and y = the ``key`` int extracted from the
    props JSON (same compiled-regex grammar as events_props_stats).  Rows
    where either side is NULL / unparseable are excluded from the pair
    stats.  Integer sums make the partials associative — no float
    summation-order divergence however the batches split."""
    import re

    import pyarrow as pa

    pat = re.compile(r'[{,]\s*"' + re.escape(key) + r'"\s*:\s*(-?\d+)\s*[,}]')

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        y = pd.to_numeric(df["props"].str.extract(pat, expand=False), errors="coerce")
        v = df["value"]
        ok = (y.notna() & v.notna()).to_numpy()
        x = np.floor(v.to_numpy(dtype=np.float64) * 100.0)[ok].astype(np.int64)
        yv = y.to_numpy(dtype=np.float64)[ok].astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "event_type": df["event_type"].to_numpy()[ok],
                    "n_pairs": 1,
                    "sx": x,
                    "sy": yv,
                    "sxy": x * yv,
                    "sxx": x * x,
                    "syy": yv * yv,
                }
            )
            .groupby("event_type", as_index=False)[_SUFFSTATS]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return partial


def events_value_corr(sf_dir: str, key: str = "k") -> "ray.data.Dataset":
    """Per-group Pearson correlation between the event value (quantized to
    integer cents) and the ``key`` int field of the props JSON — computed
    from INTEGER-EXACT decomposable sufficient statistics (n, Σx, Σy, Σxy,
    Σx², Σy²), so the map-side partials sum associatively with no float
    summation-order divergence however the batches split.  The one float
    expression — corr from the six integer sums — is evaluated with
    identical parenthesization by this kernel and the DuckDB oracle, so the
    doubles are bit-identical.

    Rows where either side is NULL (or props doesn't parse) are excluded
    from the pair stats; ``corr`` is NULL when either variance term is 0."""
    import pyarrow as pa

    from hepdata_validator_ray.ops import bucketed_aggregate

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("event_type", as_index=False)[_SUFFSTATS].sum()
        n = g["n_pairs"].to_numpy(dtype=np.float64)
        sx = g["sx"].to_numpy(dtype=np.float64)
        sy = g["sy"].to_numpy(dtype=np.float64)
        sxy = g["sxy"].to_numpy(dtype=np.float64)
        sxx = g["sxx"].to_numpy(dtype=np.float64)
        syy = g["syy"].to_numpy(dtype=np.float64)
        # the oracle spells this expression identically: (n*sxy - sx*sy) /
        # (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = np.where(
                (varx > 0) & (vary > 0),
                (n * sxy - sx * sy) / (np.sqrt(varx) * np.sqrt(vary)),
                np.nan,
            )
        out = pd.DataFrame(
            {
                "event_type": g["event_type"],
                "n_pairs": g["n_pairs"].astype("int64"),
                "corr": corr,
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value", "props"])
    return bucketed_aggregate(ds, "event_type", _suffstats_partial(key), combine, num_buckets=8)


def events_value_regression(sf_dir: str, key: str = "k") -> "ray.data.Dataset":
    """Per-group simple linear regression (REGR_SLOPE / REGR_INTERCEPT
    analogue): y = props ``key`` field regressed on x = cents-quantized
    value, from the SAME integer-exact sufficient statistics as
    events_value_corr (shared map-side partial, one exchange).  slope =
    (n*Σxy − Σx*Σy) / (n*Σx² − Σx*Σx); intercept = (Σy − slope*Σx) / n —
    both spelled identically in the DuckDB oracle, so the doubles are
    bit-equal.  slope/intercept are NULL when x has zero variance."""
    import pyarrow as pa

    from hepdata_validator_ray.ops import bucketed_aggregate

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("event_type", as_index=False)[_SUFFSTATS].sum()
        n = g["n_pairs"].to_numpy(dtype=np.float64)
        sx = g["sx"].to_numpy(dtype=np.float64)
        sy = g["sy"].to_numpy(dtype=np.float64)
        sxy = g["sxy"].to_numpy(dtype=np.float64)
        sxx = g["sxx"].to_numpy(dtype=np.float64)
        varx = n * sxx - sx * sx
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = np.where(varx > 0, (n * sxy - sx * sy) / varx, np.nan)
            intercept = np.where(varx > 0, (sy - slope * sx) / n, np.nan)
        out = pd.DataFrame(
            {
                "event_type": g["event_type"],
                "n_pairs": g["n_pairs"].astype("int64"),
                "slope": slope,
                "intercept": intercept,
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value", "props"])
    return bucketed_aggregate(ds, "event_type", _suffstats_partial(key), combine, num_buckets=8)


def _kmoment_partial(key: str):
    """Map-side partial for higher-moment statistics: per batch and
    event_type, INTEGER-EXACT (n, Σk, Σk², Σk³, Σk⁴) over the ``key`` int
    extracted from the props JSON (same compiled-regex grammar as
    events_props_stats / _suffstats_partial).  k is bounded (0..99 in the
    synthetic contract), so k⁴ ≤ 9.8e7 and the int64 power sums stay exact
    past 10¹¹ rows — the partials sum associatively with no float
    summation-order divergence however the batches split."""
    import re

    import pyarrow as pa

    pat = re.compile(r'[{,]\s*"' + re.escape(key) + r'"\s*:\s*(-?\d+)\s*[,}]')

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        y = pd.to_numeric(df["props"].str.extract(pat, expand=False), errors="coerce")
        ok = y.notna().to_numpy()
        k = y.to_numpy(dtype=np.float64)[ok].astype(np.int64)
        k2 = k * k
        g = (
            pd.DataFrame(
                {
                    "event_type": df["event_type"].to_numpy()[ok],
                    "n_vals": 1,
                    "s1": k,
                    "s2": k2,
                    "s3": k2 * k,
                    "s4": k2 * k2,
                }
            )
            .groupby("event_type", as_index=False)[_KMOMENTS]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return partial


_KMOMENTS = ["n_vals", "s1", "s2", "s3", "s4"]


def events_value_moments(sf_dir: str, key: str = "k") -> "ray.data.Dataset":
    """Per-group skewness and excess kurtosis (population form) of the props
    ``key`` int field, from INTEGER-EXACT decomposable power sums
    (n, Σk, Σk², Σk³, Σk⁴) — the corr/regression template extended to 3rd
    and 4th moments.  With vn = n*Σk² − Σk*Σk:

        skew_pop = (n*n*Σk³ − 3.0*n*Σk*Σk² + 2.0*Σk*Σk*Σk) / (vn*sqrt(vn))
        kurt_pop = (n*n*n*Σk⁴ − 4.0*n*n*Σk*Σk³ + 6.0*n*Σk*Σk*Σk²
                    − 3.0*Σk*Σk*Σk*Σk) / (vn*vn) − 3.0

    Both expressions are spelled with IDENTICAL parenthesization in this
    kernel and the DuckDB oracle, so the doubles hash bit-equal (the oracle
    computes the same integer sums in SQL and applies the same scalar
    expression — deliberately NOT DuckDB's skewness()/kurtosis() aggregates,
    whose internal accumulation order is not reproducible from sufficient
    statistics).  Both are NULL when vn ≤ 0 (zero variance or n < 2).
    Rows whose props don't parse are excluded."""
    import pyarrow as pa

    from hepdata_validator_ray.ops import bucketed_aggregate

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("event_type", as_index=False)[_KMOMENTS].sum()
        n = g["n_vals"].to_numpy(dtype=np.float64)
        s1 = g["s1"].to_numpy(dtype=np.float64)
        s2 = g["s2"].to_numpy(dtype=np.float64)
        s3 = g["s3"].to_numpy(dtype=np.float64)
        s4 = g["s4"].to_numpy(dtype=np.float64)
        vn = n * s2 - s1 * s1
        with np.errstate(invalid="ignore", divide="ignore"):
            skew = np.where(
                vn > 0,
                (n * n * s3 - 3.0 * n * s1 * s2 + 2.0 * s1 * s1 * s1) / (vn * np.sqrt(vn)),
                np.nan,
            )
            kurt = np.where(
                vn > 0,
                (n * n * n * s4 - 4.0 * n * n * s1 * s3 + 6.0 * n * s1 * s1 * s2 - 3.0 * s1 * s1 * s1 * s1)
                / (vn * vn)
                - 3.0,
                np.nan,
            )
        out = pd.DataFrame(
            {
                "event_type": g["event_type"],
                "n_vals": g["n_vals"].astype("int64"),
                "skew_pop": skew,
                "kurt_pop": kurt,
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "props"])
    return bucketed_aggregate(ds, "event_type", _kmoment_partial(key), combine, num_buckets=8)


def events_daily_unpivot(
    sf_dir: str,
    values: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
) -> "ray.data.Dataset":
    """UNPIVOT (wide -> long): melts the pivot's per-day count columns back
    to (day, event_type, n_events) rows, folding the ``n_other`` column to
    the '<OTHER>' tag and dropping zero-count combinations (so the long form
    equals a direct GROUP BY day, folded-type — the SQL oracle states it
    that way).  The melt is one numpy repeat/tile pass per batch; it runs as
    a streaming map over the already-tiny pivot output, no extra exchange."""
    import pyarrow as pa

    tags = list(values) + ["<OTHER>"]
    cols = [f"n_{v}" for v in values] + ["n_other"]

    def melt(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        m = df[cols].to_numpy(dtype=np.int64)  # (rows, types)
        day = np.repeat(df["day"].to_numpy(), len(tags))
        et = np.tile(np.asarray(tags, dtype=object), len(df))
        n = m.reshape(-1)
        keep = n > 0
        out = pd.DataFrame(
            {"day": day[keep], "event_type": et[keep], "n_events": n[keep]}
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return events_daily_pivot(sf_dir, values=values).map_batches(
        melt, batch_format="pyarrow"
    )


def events_interval_merge(
    sf_dir: str, dur_minutes: int = 30, num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Gaps-and-islands / interval union: treat every event as the half-open
    interval [ts, ts + dur) and, per user, merge overlapping-or-adjacent
    intervals into islands.  Output per user: island count and total covered
    microseconds (exact int64 — no float anywhere).  The operator Ray Data
    (and SQL without window gymnastics) lacks; the reference's analogue is
    the contiguous-bin coverage idea of its independent-variable checks.

    One user_id hash-bucket exchange (the events-operator shape); inside a
    bucket one mergesort + a per-user-segment cummax (the trailing-window
    precedent: a per-USER loop of ~µs numpy calls — a fully vectorized
    offset-shifted global cummax exists but overflows int64 at extreme
    segment counts).  Adjacent intervals (next.ts == running end) MERGE —
    pinned by tests and stated in the oracle (strict > starts an island)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    dur_us = np.int64(dur_minutes) * 60_000_000

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(["user_id", "ts"], kind="mergesort")
        if not len(df):
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_islands": pd.Series(dtype="int64"),
                    "covered_us": pd.Series(dtype="int64"),
                }
            )
        t = df["ts"].to_numpy().astype("datetime64[us]").view("i8")
        te = t + dur_us
        users = df["user_id"].to_numpy()
        n = len(t)
        seg_starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        bounds = np.r_[seg_starts, n]
        run_end = np.empty(n, dtype=np.int64)
        for s, e in zip(bounds[:-1], bounds[1:]):
            run_end[s:e] = np.maximum.accumulate(te[s:e])
        new_island = np.r_[True, t[1:] > run_end[:-1]]
        new_island[seg_starts] = True  # a user's first event always opens
        isl_starts = np.flatnonzero(new_island)
        isl_last = np.r_[isl_starts[1:] - 1, n - 1]
        covered = run_end[isl_last] - t[isl_starts]
        isl_user = users[isl_starts]
        u_starts = np.flatnonzero(np.r_[True, isl_user[1:] != isl_user[:-1]])
        n_islands = np.diff(np.r_[u_starts, len(isl_user)])
        covered_us = np.add.reduceat(covered, u_starts)
        return pd.DataFrame(
            {
                "user_id": isl_user[u_starts].astype("int64"),
                "n_islands": n_islands.astype("int64"),
                "covered_us": covered_us.astype("int64"),
            }
        )

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=32)
    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(merge, batch_format="pandas")
    )


def events_streaks(sf_dir: str, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Longest consecutive same-type run per user (gaps-and-islands by
    run-length encoding): events ordered by (ts, event_id); output
    (user_id, streak_len, streak_type) with the deterministic tie-break
    "lexically smallest type among the runs achieving the max length"
    (≙ SQL ORDER BY len DESC, type ASC LIMIT 1 per user).

    One user_id exchange; in-bucket the runs fall out of one mergesort +
    adjacency mask (run-length encode), then a runs-table sort picks each
    user's winner — work linear in runs, never per-event Python."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if not len(df):
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "streak_len": pd.Series(dtype="int64"),
                    "streak_type": pd.Series(dtype="object"),
                }
            )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        users = df["user_id"].to_numpy()
        types = df["event_type"].fillna("<NULL>").to_numpy()
        brk = np.r_[True, (users[1:] != users[:-1]) | (types[1:] != types[:-1])]
        run_starts = np.flatnonzero(brk)
        run_len = np.diff(np.r_[run_starts, len(users)])
        runs = pd.DataFrame(
            {
                "user_id": users[run_starts],
                "streak_len": run_len.astype("int64"),
                "streak_type": types[run_starts],
            }
        ).sort_values(
            ["user_id", "streak_len", "streak_type"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = runs.drop_duplicates("user_id", keep="first").reset_index(drop=True)
        out["user_id"] = out["user_id"].astype("int64")
        return out[["user_id", "streak_len", "streak_type"]]

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=32)
    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )


def events_paths(sf_dir: str, n_first: int = 8, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Ordered string aggregation (SQL string_agg ... ORDER BY): per user
    the '>'-joined sequence of the FIRST ``n_first`` event types in
    (ts, event_id) order, plus the user's total event count — the classic
    path-analysis projection.  One user_id exchange; in-bucket one
    mergesort + cumcount filter; the per-user join is linear in OUTPUT
    size (one string per user must be materialized by definition)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if not len(df):
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "path": pd.Series(dtype="object"),
                    "n_events": pd.Series(dtype="int64"),
                }
            )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        df["event_type"] = df["event_type"].fillna("<NULL>")
        totals = df.groupby("user_id", sort=False).size()
        rn = df.groupby("user_id", sort=False).cumcount()
        head = df[rn < n_first]
        paths = head.groupby("user_id", sort=False)["event_type"].agg(">".join)
        out = pd.DataFrame(
            {
                "user_id": paths.index.to_numpy().astype("int64"),
                "path": paths.to_numpy(),
                "n_events": totals.reindex(paths.index).to_numpy().astype("int64"),
            }
        )
        return out

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=32)
    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )


def events_mad_outliers(sf_dir: str, k_mad: int = 3, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Robust per-group outlier detection: per event_type, the discrete
    median of integer cents (floor(value*100), the tumbling-window
    quantization), the median absolute deviation (discrete median of
    |cents − med| — integral since both are ints), and the count of rows
    with |cents − med| > k·MAD.  Every quantity is an int64, so the DuckDB
    quantile_disc oracle is hash-exact by construction (the
    docs_quantile_disc ceil(q·n)−1 index convention).

    MAD is holistic (two dependent medians), so the operator buckets by
    event_type and computes both medians per type inside ONE exchange —
    the docs_quantile_disc shape.  Partitioning assumption (documented, as
    for every holistic per-group op here): one type's rows fit in a bucket
    task; at the 10^12-row regime a type-keyed two-pass distributed
    quantile (the gated v_ntok_quantiles machinery) replaces the in-bucket
    sort."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        df = df[df["value"].notna()]
        if not len(df):
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype="object"),
                    "med": pd.Series(dtype="int64"),
                    "mad": pd.Series(dtype="int64"),
                    "n_outliers": pd.Series(dtype="int64"),
                }
            )
        codes, uniques = pd.factorize(df["event_type"].fillna("<NULL>").to_numpy())
        codes = codes.astype(np.int64)
        cents = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
        order = np.lexsort((cents, codes))
        types = uniques.take(codes[order])
        cents = cents[order]
        seg_starts = np.flatnonzero(np.r_[True, codes[order][1:] != codes[order][:-1]])
        ns = np.diff(np.r_[seg_starts, len(types)])
        med_idx = seg_starts + np.maximum(np.ceil(0.5 * ns).astype(np.int64) - 1, 0)
        med = cents[med_idx]
        dev = np.abs(cents - np.repeat(med, ns))
        # second segmented sort for the deviation median: segment ids are
        # already contiguous, so one stable argsort keyed on dev per segment
        seg_id = np.repeat(np.arange(len(ns)), ns)
        order2 = np.lexsort((dev, seg_id))
        dev_sorted = dev[order2]
        mad = dev_sorted[med_idx]
        over = (dev > np.int64(k_mad) * np.repeat(mad, ns)).astype(np.int64)
        n_out = np.add.reduceat(over, seg_starts)
        return pd.DataFrame(
            {
                "event_type": types[seg_starts],
                "med": med.astype("int64"),
                "mad": mad.astype("int64"),
                "n_outliers": n_out.astype("int64"),
            }
        )

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=2_000_000, lo=8)
    return (
        ds.map_batches(lambda t: with_bucket(t, "event_type", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )


def events_window_dedup(sf_dir: str, window_minutes: int = 10, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Windowed streaming deduplication: collapse repeats of the same
    (user, event_type) inside each fixed ``window_minutes`` window to one
    representative — the classic at-least-once-delivery cleanup.  Output
    per event_type: raw row count and deduplicated count (n_kept =
    distinct (user, window) pairs).

    One user_id hash-bucket exchange; a user's rows land in exactly one
    bucket, so per-bucket distinct counting is globally exact and each
    bucket ships ≤ |types| partial rows — the exchange's reduce side is
    |buckets| × |types| regardless of corpus size."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    win_us = np.int64(window_minutes) * 60_000_000

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if not len(df):
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype="object"),
                    "n_rows": pd.Series(dtype="int64"),
                    "n_kept": pd.Series(dtype="int64"),
                }
            )
        win = df["ts"].to_numpy().astype("datetime64[us]").view("i8") // win_us
        g = pd.DataFrame(
            {
                "event_type": df["event_type"].fillna("<NULL>"),
                "user_id": df["user_id"].to_numpy(),
                "win": win,
            }
        )
        rows = g.groupby("event_type", sort=False).size()
        kept = g.drop_duplicates().groupby("event_type", sort=False).size()
        return pd.DataFrame(
            {
                "event_type": rows.index,
                "n_rows": rows.to_numpy().astype("int64"),
                "n_kept": kept.reindex(rows.index).to_numpy().astype("int64"),
            }
        )

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts", "event_type"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=16)
    partials = (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )
    return partials.groupby("event_type").aggregate(
        Sum("n_rows", alias_name="n_rows"), Sum("n_kept", alias_name="n_kept")
    )


def customer_orders_fulljoin_stats(sf_dir: str) -> "ray.data.Dataset":
    """FULL OUTER join coverage report: per market segment, customers with
    and without orders plus the matched order count — the join-coverage
    audit (which dimension rows are dangling?) that complements the inner
    native join and the anti-join sweep.  Uses Ray Data's native
    hash-partitioned full_outer join; the aggregate collapses the joined
    stream immediately, so nothing wide materializes."""
    from hepdata_validator_ray.ops import derive_num_buckets

    orders = ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_orderkey"])
    cust = ray.data.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    joined = cust.join(
        orders,
        join_type="full_outer",
        num_partitions=derive_num_buckets(orders, target_rows_per_bucket=500_000, lo=8),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        seg = df["c_mktsegment"].fillna("<NONE>")  # orders with no customer
        has_cust = df["c_custkey"].notna()
        has_ord = df["o_orderkey"].notna()
        out = pd.DataFrame(
            {
                "segment": seg,
                # row-level semantics: matched = one row per (customer,
                # order) pair; cust_only rows appear exactly once per
                # orderless customer — so the counts are safely additive
                # across batches with no distinct needed
                "n_rows_matched": (has_cust & has_ord).astype("int64"),
                "n_rows_cust_only": (has_cust & ~has_ord).astype("int64"),
                "n_rows_order_only": (~has_cust & has_ord).astype("int64"),
            }
        )
        return out.groupby("segment", as_index=False).sum()

    return (
        joined.map_batches(collapse, batch_format="pandas")
        .groupby("segment")
        .aggregate(
            Sum("n_rows_matched", alias_name="n_rows_matched"),
            Sum("n_rows_cust_only", alias_name="n_rows_cust_only"),
            Sum("n_rows_order_only", alias_name="n_rows_order_only"),
        )
    )


def docs_quantile_cont(
    sf_dir: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75), num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Exact per-group INTERPOLATED quantiles (quantile_cont /
    percentile_cont): value = v[floor(h)] + (v[floor(h)+1] − v[floor(h)])·frac
    at h = (n−1)·q.  With integer inputs and dyadic q (0.25/0.5/0.75) every
    term is an exact IEEE double, so numpy and DuckDB produce bit-identical
    results — the float analogue of the disc version's hash-exactness
    argument.  Same single source-keyed exchange as docs_quantile_disc."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    qcols = [f"p{int(round(q * 100))}" for q in qs]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        df = df[df["n_chars"].notna()]
        if not len(df):
            return pd.DataFrame(
                {"source": pd.Series(dtype="object")}
                | {c: pd.Series(dtype="float64") for c in qcols}
            )
        df = pd.DataFrame(
            {"source": df["source"].fillna("<NULL>"), "n_chars": df["n_chars"].astype("int64")}
        ).sort_values(["source", "n_chars"], kind="mergesort")
        src = df["source"].to_numpy()
        vals = df["n_chars"].to_numpy().astype(np.float64)
        seg_starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        ns = np.diff(np.r_[seg_starts, len(src)])
        out = {"source": src[seg_starts]}
        for q, c in zip(qs, qcols):
            h = (ns - 1) * q
            lo = np.floor(h).astype(np.int64)
            frac = h - lo
            v_lo = vals[seg_starts + lo]
            v_hi = vals[seg_starts + np.minimum(lo + 1, ns - 1)]
            out[c] = v_lo + (v_hi - v_lo) * frac
        return pd.DataFrame(out)

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["source", "n_chars"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=2_000_000, lo=8)
    return (
        ds.map_batches(lambda t: with_bucket(t, "source", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )


def events_daily_gapfill(sf_dir: str, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Calendar-spine gap filling (the generate_series op Ray Data and
    plain GROUP BY lack): per user, EVERY day from their first to their
    last event — quiet days included with n = 0.  Output (user_id, day, n).

    One user_id exchange; in-bucket the spine is pure numpy: per-user
    (min_day, max_day) segments expand via the mixture_expand
    repeat+segmented-arange trick, then active-day counts scatter onto the
    spine with searchsorted.  Output size is Σ user spans — the operator
    is bandwidth-bound on its own output, like any spine generator."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    DAY_US = np.int64(86_400_000_000)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if not len(df):
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "day": pd.Series(dtype="object"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        day = df["ts"].to_numpy().astype("datetime64[us]").view("i8") // DAY_US
        g = (
            pd.DataFrame({"user_id": df["user_id"].to_numpy(), "day": day})
            .groupby(["user_id", "day"], sort=True)
            .size()
            .reset_index(name="n")
        )
        users = g["user_id"].to_numpy()
        days = g["day"].to_numpy()
        cnts = g["n"].to_numpy().astype(np.int64)
        seg_starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        seg_ends = np.r_[seg_starts[1:], len(users)] - 1
        spans = days[seg_ends] - days[seg_starts] + 1
        spine_user = np.repeat(users[seg_starts], spans)
        ends = np.cumsum(spans)
        offs = np.arange(ends[-1], dtype=np.int64) - np.repeat(ends - spans, spans)
        spine_day = np.repeat(days[seg_starts], spans) + offs
        # scatter active counts onto the spine: within a user the spine is
        # a dense day range, so the active day's position is start + delta
        spine_n = np.zeros(len(spine_user), dtype=np.int64)
        seg_id = np.repeat(np.arange(len(seg_starts)), np.diff(np.r_[seg_starts, len(users)]))
        pos = np.repeat(ends - spans, np.diff(np.r_[seg_starts, len(users)])) + (
            days - days[seg_starts[seg_id]]
        )
        spine_n[pos] = cnts
        return pd.DataFrame(
            {
                "user_id": spine_user.astype("int64"),
                "day": pd.to_datetime(spine_day * 86_400, unit="s").strftime("%Y-%m-%d"),
                "n": spine_n,
            }
        )

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=16)
    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )


def events_cohort_retention(sf_dir: str, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Cohort retention matrix: users grouped by first-seen week (cohort);
    for each week offset k, how many of the cohort's users were active k
    weeks after their first week.  Output (cohort_week, week_offset,
    n_users) — offset 0 row is the cohort size.

    One user_id exchange; a user's whole history lands in one bucket, so
    first-seen week and the distinct (user, offset) pairs are computed
    locally and each bucket ships ≤ |cohorts|×|offsets| partial rows."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    WEEK_US = np.int64(7 * 86_400_000_000)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if not len(df):
            return pd.DataFrame(
                {
                    "cohort_week": pd.Series(dtype="int64"),
                    "week_offset": pd.Series(dtype="int64"),
                    "n_users": pd.Series(dtype="int64"),
                }
            )
        week = df["ts"].to_numpy().astype("datetime64[us]").view("i8") // WEEK_US
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(), "week": week})
        first = g.groupby("user_id")["week"].transform("min")
        g["cohort_week"] = first
        g["week_offset"] = g["week"] - first
        pairs = g[["user_id", "cohort_week", "week_offset"]].drop_duplicates()
        out = (
            pairs.groupby(["cohort_week", "week_offset"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        out["n_users"] = out["n_users"].astype("int64")
        return out

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=16)
    partials = (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )
    return partials.groupby(["cohort_week", "week_offset"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )


def events_cumulative_users(sf_dir: str, num_buckets: int | None = None) -> pd.DataFrame:
    """Running distinct-user count per day (the cumulative-distinct window
    SQL needs a first-seen trick for): day d's value counts every user
    whose FIRST event is on or before d.  Output (day, n_new, n_cum).

    Two cheap stages: per-user first-seen day via one user_id-bucketed
    exchange (each bucket ships one row per user → then a tiny per-day
    count), cumsum over the day table (|days| rows — driver-safe by
    construction, the days axis does not grow with corpus size)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    DAY_US = np.int64(86_400_000_000)

    def first_seen(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if not len(df):
            return pd.DataFrame({"day": pd.Series(dtype="int64"), "n_new": pd.Series(dtype="int64")})
        day = df["ts"].to_numpy().astype("datetime64[us]").view("i8") // DAY_US
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(), "day": day})
        firsts = g.groupby("user_id", as_index=False)["day"].min()
        out = firsts.groupby("day", as_index=False).size().rename(columns={"size": "n_new"})
        out["n_new"] = out["n_new"].astype("int64")
        return out

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=16)
    per_day = (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(first_seen, batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("n_new", alias_name="n_new"))
    ).to_pandas()
    per_day = per_day.sort_values("day").reset_index(drop=True)
    per_day["n_cum"] = per_day["n_new"].cumsum().astype("int64")
    per_day["n_new"] = per_day["n_new"].astype("int64")
    out = pd.DataFrame(
        {
            "day": pd.to_datetime(per_day["day"] * 86_400, unit="s").dt.strftime("%Y-%m-%d"),
            "n_new": per_day["n_new"],
            "n_cum": per_day["n_cum"],
        }
    )
    return out


def events_type_overlap(sf_dir: str, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Audience overlap between event types: for every unordered type pair
    (a < b), how many distinct users did BOTH — the set-similarity
    numerator behind every 'viewers who also purchased' metric.  One
    user_id exchange; per bucket the distinct (user, type) table self-joins
    (a C-level merge bounded by |types| rows per user), and each bucket
    ships ≤ |types|² partials."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if not len(df):
            return pd.DataFrame(
                {
                    "type_a": pd.Series(dtype="object"),
                    "type_b": pd.Series(dtype="object"),
                    "n_users": pd.Series(dtype="int64"),
                }
            )
        m = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "t": df["event_type"].fillna("<NULL>"),
            }
        ).drop_duplicates()
        j = m.merge(m, on="user_id", suffixes=("_a", "_b"))
        j = j[j["t_a"] < j["t_b"]]
        out = (
            j.groupby(["t_a", "t_b"], as_index=False)
            .size()
            .rename(columns={"t_a": "type_a", "t_b": "type_b", "size": "n_users"})
        )
        out["n_users"] = out["n_users"].astype("int64")
        return out

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "event_type"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=16)
    partials = (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )
    return partials.groupby(["type_a", "type_b"]).aggregate(Sum("n_users", alias_name="n_users"))


def events_rolling_active_users(sf_dir: str, window_days: int = 7, num_buckets: int | None = None) -> pd.DataFrame:
    """Rolling N-day active users (sliding-window DISTINCT — the op a naive
    SQL needs an O(days×rows) band join for): for every calendar day in the
    global span, how many users had ≥1 event in the trailing N days.

    Shape: one user_id exchange; per user the covered OUTPUT days are the
    union of [day, day+N) intervals over the user's active days — the
    interval-merge kernel — emitted as (start, +1) / (end, −1) DELTAS, so a
    bucket ships O(islands) rows, never per-day rows.  The global sweep is
    a groupby-sum over the delta axis plus a cumsum on the |days|-sized
    spine (corpus-size-free, like events_cumulative_users).  Output
    (day, n_active), all integers."""
    from ray.data.aggregate import Sum as _Sum

    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    DAY_US = np.int64(86_400_000_000)
    w = np.int64(window_days)

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if not len(df):
            return pd.DataFrame({"day": pd.Series(dtype="int64"), "delta": pd.Series(dtype="int64")})
        day = df["ts"].to_numpy().astype("datetime64[us]").view("i8") // DAY_US
        g = (
            pd.DataFrame({"user_id": df["user_id"].to_numpy(), "day": day})
            .drop_duplicates()
            .sort_values(["user_id", "day"], kind="mergesort")
        )
        users = g["user_id"].to_numpy()
        d = g["day"].to_numpy()
        n = len(d)
        # interval union of [d, d+w) per user: next island when gap > w
        seg_starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        new_island = np.r_[True, d[1:] > d[:-1] + w]
        new_island[seg_starts] = True
        isl_starts = np.flatnonzero(new_island)
        isl_last = np.r_[isl_starts[1:] - 1, n - 1]
        starts = d[isl_starts]
        ends = d[isl_last] + w  # exclusive
        out = pd.DataFrame(
            {
                "day": np.r_[starts, ends],
                "delta": np.r_[np.ones(len(starts), np.int64), -np.ones(len(ends), np.int64)],
            }
        )
        return out.groupby("day", as_index=False).sum()

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=16)
    dl = (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(deltas, batch_format="pandas")
        .groupby("day")
        .aggregate(_Sum("delta", alias_name="delta"))
    ).to_pandas()
    dl = dl.sort_values("day").reset_index(drop=True)
    dkeys = dl["day"].to_numpy()
    dvals = dl["delta"].to_numpy().astype(np.int64)
    # spine = event-day span only (deltas extend w-1 days past the last
    # event; the report stops at the last EVENT day by definition)
    d0 = int(dkeys[0])
    d1 = int(dkeys[-1] - w)  # last event day = last end - w
    spine = np.arange(d0, d1 + 1, dtype=np.int64)
    run = np.zeros(len(spine), dtype=np.int64)
    idx = np.searchsorted(spine, dkeys)
    m = idx < len(spine)
    np.add.at(run, idx[m], dvals[m])
    n_active = np.cumsum(run)
    return pd.DataFrame(
        {
            "day": pd.to_datetime(spine * 86_400, unit="s").strftime("%Y-%m-%d"),
            "n_active": n_active,
        }
    )


def events_daily_delta(sf_dir: str) -> pd.DataFrame:
    """Day-over-day change per event type: (day, event_type, n, n_prev,
    delta) where n_prev is the PREVIOUS CALENDAR DAY's count (0 when
    absent — a true day lag, not a lag over present-rows only).  The
    per-(day,type) aggregate is the tiny events_daily table; the lag is a
    driver-side vectorized shift over that |days|×|types| axis
    (corpus-size-free)."""
    DAY_US = 86_400_000_000

    base = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(
            lambda df: pd.DataFrame(
                {
                    "day": df["ts"].to_numpy().astype("datetime64[us]").view("i8") // DAY_US,
                    "event_type": df["event_type"].fillna("<NULL>"),
                    "n": np.ones(len(df), dtype=np.int64),
                }
            ).groupby(["day", "event_type"], as_index=False).sum(),
            batch_format="pandas",
        )
        .groupby(["day", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
    ).to_pandas()
    base = base.sort_values(["event_type", "day"]).reset_index(drop=True)
    prev = base.copy()
    prev["day"] = prev["day"] + 1
    m = base.merge(
        prev.rename(columns={"n": "n_prev"}), on=["day", "event_type"], how="left"
    )
    m["n_prev"] = m["n_prev"].fillna(0).astype("int64")
    m["n"] = m["n"].astype("int64")
    m["delta"] = (m["n"] - m["n_prev"]).astype("int64")
    m["day"] = pd.to_datetime(m["day"] * 86_400, unit="s").dt.strftime("%Y-%m-%d")
    return m[["day", "event_type", "n", "n_prev", "delta"]]


def events_time_band_pairs(
    sf_dir: str, band_seconds: int = 10, num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Global time-band self-join — the true NON-EQUI range join: all
    event pairs (a, b) with ``a.ts < b.ts <= a.ts + band_seconds``,
    regardless of user.  Output (event_id_a, event_id_b, dt_us).

    The banded-exchange shape (the standard distributed range-join
    partitioning): band window ``k = ts_us // band_us``; a pair's right
    side can only sit in the left side's window k or k+1, so every event
    ships NATIVE to partition ``k % nb`` plus one OVERFLOW copy to
    ``(k-1) % nb`` — exactly 2× the input rows move, never a cross
    product.  In-partition, lefts are the natives only (each event is
    native to exactly one partition, so each pair is generated exactly
    once); candidates are all rows present, searchsorted against
    ``(ta, ta + band]`` bounds, pairs expanded by the segmented-arange
    kernel.  Far-away windows that share a partition by the modulus are
    filtered by the same range check — correctness never depends on the
    partition count.  Output volume is the join's true cardinality
    (quadratic in any single burst — an inherent property of the range
    join, not of this plan); strict ``<`` on ts means simultaneous events
    never pair, which keeps the pair set orientation-unambiguous without
    an id tie-break.  Null-ts rows drop map-side, matching the SQL join
    predicate's null semantics."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets

    band_us = np.int64(band_seconds) * 1_000_000

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "ts"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        ds, target_rows_per_bucket=250_000, lo=8
    )

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["ts"].notna()]
        ts = df["ts"].to_numpy().astype("datetime64[us]").view("i8")
        eid = df["event_id"].to_numpy(dtype=np.int64)
        k = ts // band_us
        native = pd.DataFrame(
            {"event_id": eid, "ts_us": ts, "native": np.True_, BUCKET_COL: k % nb}
        )
        overflow = pd.DataFrame(
            {"event_id": eid, "ts_us": ts, "native": np.False_, BUCKET_COL: (k - 1) % nb}
        )
        return pd.concat([native, overflow], ignore_index=True)

    def pair(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_id_a": pd.Series(dtype="int64"),
                "event_id_b": pd.Series(dtype="int64"),
                "dt_us": pd.Series(dtype="int64"),
            }
        )
        if not len(df):
            return empty
        # candidate side: every distinct event in the partition (an event
        # appears native+overflow in ONE partition only when nb == 1)
        cand = df.drop_duplicates("event_id").sort_values("ts_us", kind="mergesort")
        cts = cand["ts_us"].to_numpy()
        cid = cand["event_id"].to_numpy()
        left = df[df["native"]]
        ta = left["ts_us"].to_numpy()
        la = left["event_id"].to_numpy()
        lo = np.searchsorted(cts, ta, side="right")
        hi = np.searchsorted(cts, ta + band_us, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return empty
        keep = cnt > 0
        off = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(cnt[keep])))[:-1], cnt[keep]
        )
        idx = np.repeat(lo[keep], cnt[keep]) + off
        rep_a = np.repeat(np.arange(len(ta))[keep], cnt[keep])
        return pd.DataFrame(
            {
                "event_id_a": la[rep_a],
                "event_id_b": cid[idx],
                "dt_us": cts[idx] - ta[rep_a],
            }
        )

    return (
        ds.map_batches(replicate, batch_format="pandas")
        .groupby(BUCKET_COL)
        .map_groups(pair, batch_format="pandas")
    )


def docs_feature_scaling(sf_dir: str) -> "ray.data.Dataset":
    """Per-source feature normalization of n_chars — the training-feature
    preprocessing pair: population z-score and min-max, broadcast from
    integer-exact group statistics.  Two passes, NO wide shuffle: pass 1
    aggregates (n, Σx, Σx², min, max) per source with map-side combine
    (≤|sources| partial rows per batch; the group-count axis, not the
    corpus axis); pass 2 broadcasts the tiny stats table via ray.put and
    applies the per-row float transform vectorized per batch.

    Float-parenthesization contract (the corr/regression precedent): both
    engines evaluate z = (x - sx/n) / sqrt(sxx/n - (sx/n)*(sx/n)) and
    mm = (x - mn) / (mx - mn) from the SAME exact int64 sums with the
    SAME operation order, so the doubles hash bit-equal.  z is NULL when
    the variance term is <= 0, mm is NULL when mx == mn; NULL n_chars
    rows are excluded end-to-end (they enter neither the stats nor the
    output); NULL source groups as '<NULL>' (the docs_lang_mode key
    convention)."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ok = df["n_chars"].notna()
        x = df["n_chars"].to_numpy(dtype=np.float64)[ok.to_numpy()].astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "source": df["source"].fillna("<NULL>").to_numpy()[ok.to_numpy()],
                    "n": 1,
                    "sx": x,
                    "sxx": x * x,
                    "mn": x,
                    "mx": x,
                }
            )
            .groupby("source", as_index=False)
            .agg(n=("n", "sum"), sx=("sx", "sum"), sxx=("sxx", "sum"), mn=("mn", "min"), mx=("mx", "max"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "source", "n_chars"])
    stats = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sxx", alias_name="sxx"),
            ray.data.aggregate.Min("mn", alias_name="mn"),
            ray.data.aggregate.Max("mx", alias_name="mx"),
        )
        .to_pandas()  # ≤|sources| rows — the broadcastable axis
    )
    mean = {}
    sq = {}
    mn_d = {}
    rng_d = {}
    for _, r in stats.iterrows():
        n = float(r["n"])
        m = float(r["sx"]) / n
        v = float(r["sxx"]) / n - m * m
        mean[r["source"]] = m
        sq[r["source"]] = np.sqrt(v) if v > 0 else np.nan
        mn_d[r["source"]] = np.int64(r["mn"])
        rng_d[r["source"]] = np.float64(r["mx"] - r["mn"]) if r["mx"] > r["mn"] else np.nan
    stats_ref = ray.put((mean, sq, mn_d, rng_d))

    def transform(df: pd.DataFrame) -> pd.DataFrame:
        mean, sq, mn_d, rng_d = ray.get(stats_ref)
        df = df[df["n_chars"].notna()]
        src = df["source"].fillna("<NULL>")
        x = df["n_chars"].to_numpy(dtype=np.float64).astype(np.int64)
        m = src.map(mean).to_numpy(dtype=np.float64)
        s = src.map(sq).to_numpy(dtype=np.float64)
        mn = src.map(mn_d).to_numpy(dtype=np.float64)
        rng = src.map(rng_d).to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore"):
            z = (x - m) / s
            mm = (x - mn) / rng
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(dtype=np.int64), "source": src, "z": z, "mm": mm}
        )

    return ds.map_batches(transform, batch_format="pandas")


def q5_regional_revenue(
    sf_dir: str,
    region: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> "ray.data.Dataset":
    """TPC-H Q5 (local-supplier volume): revenue per nation for orders in
    a date year, customers in one region, and line items whose SUPPLIER
    sits in the customer's own nation.  The multi-way join showcase:

    - the two BIG sides (lineitem, orders⋈customer) meet in Ray Data's
      native hash-partitioned inner joins — orders⋈customer on custkey,
      then lineitem⋈that on orderkey; at 100 TB these are the genuinely
      unbroadcastable tables and each joins on its natural key once;
    - the DIM tables (supplier→nationkey, nation⋈region) broadcast as
      plain dicts — supplier is the classic small side (10k rows/SF);
    - orders are pruned AT THE READ with a parquet row-group filter on
      o_orderdate (plus column pruning everywhere), so the year's slice
      is all that enters the join;
    - revenue is INTEGER fixed-point: cents(price) × (100 − hundredths
      (discount)) — units of 10⁻⁴ dollars — so partial sums associate
      and the DuckDB oracle is hash-exact (prices/discounts carry 2
      decimals by the TPC-H data contract; round-to-nearest of p*100 has
      no .5 ties).  Output (n_name, n_lines, rev_fp4)."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq_meta

    def _meta_rows(path: str) -> int:
        # footer-only row count: no Ray execution, no data read
        return _pq_meta.ParquetFile(path).metadata.num_rows

    def _nblocks(rows: int, target: int = 500_000, lo: int = 8, hi: int = 4096) -> int:
        return int(min(hi, max(lo, -(-rows // target))))

    nation = pd.read_parquet(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pd.read_parquet(_pq(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"].to_numpy())
    in_region = nation[nation["n_regionkey"].isin(rkeys)]
    nat_name = dict(zip(in_region["n_nationkey"].to_numpy(), in_region["n_name"].to_numpy()))
    supp = pd.read_parquet(_pq(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    supp_nat_ref = ray.put(dict(zip(supp["s_suppkey"].to_numpy(), supp["s_nationkey"].to_numpy())))
    nat_name_ref = ray.put(nat_name)

    lo = pd.Timestamp(date_lo)
    hi = pd.Timestamp(date_hi)
    # Native hash joins cannot digest a side whose shuffle never ships
    # a schema: partitions that receive no rows finalize a ZERO-COLUMN
    # table and pa.Table.join raises "no match for key field".
    # rayfix.py patches the hash-shuffle schema broadcast so empty
    # TYPED blocks disseminate their schema (upstream drops it); the
    # remaining all-empty-side case (a fully-pruned date window emits
    # only SCHEMALESS empty blocks) is covered by ONE matched sentinel
    # row per join leg (all keys = -1, impossible for TPC-H keys): it
    # survives every join and the final aggregate by construction, so
    # the pipeline keeps its schema even on zero real rows, and is
    # stripped at the end.
    sent_orders = ray.data.from_arrow(
        pa.table({"o_orderkey": pa.array([-1], pa.int64()), "o_custkey": pa.array([-1], pa.int64())})
    )
    sent_cust = ray.data.from_arrow(
        pa.table({"c_custkey": pa.array([-1], pa.int64()), "c_nationkey": pa.array([-1], pa.int32())})
    )
    sent_li = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([-1], pa.int64()),
                "l_suppkey": pa.array([-1], pa.int64()),
                "l_extendedprice": pa.array([0.0], pa.float64()),
                "l_discount": pa.array([0.0], pa.float64()),
            }
        )
    )

    # block counts from parquet footers (pre-filter row counts are an
    # upper proxy; keeps blocks ~500k rows so the shuffle map isn't
    # dominated by per-tiny-block push overhead)
    nb_orders = _nblocks(_meta_rows(_pq(sf_dir, "orders")))
    nb_cust = _nblocks(_meta_rows(_pq(sf_dir, "customer")))
    nb_li = _nblocks(_meta_rows(_pq(sf_dir, "lineitem")))
    orders = (
        ray.data.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
            filter=(_pc.field("o_orderdate") >= _pc.scalar(lo)) & (_pc.field("o_orderdate") < _pc.scalar(hi)),
            override_num_blocks=nb_orders,
        )
        .select_columns(["o_orderkey", "o_custkey"])
        .union(sent_orders)
    )
    cust = ray.data.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"], override_num_blocks=nb_cust
    ).union(sent_cust)
    nparts = nb_cust
    oc = orders.join(cust, join_type="inner", num_partitions=nparts, on=("o_custkey",), right_on=("c_custkey",))
    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        override_num_blocks=nb_li,
    ).union(sent_li)
    lparts = nb_li
    j = li.join(
        oc.select_columns(["o_orderkey", "c_nationkey"]),
        join_type="inner",
        num_partitions=lparts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    class Finish:
        def __init__(self, supp_ref, name_ref):
            # sentinel mappings keep the fabricated row alive through the
            # nation-match filter and the final aggregate (schema pin)
            self.supp_nat = {**ray.get(supp_ref), -1: -1}
            self.nat_name = {**ray.get(name_ref), -1: "<SENTINEL>"}

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            s_nat = df["l_suppkey"].map(self.supp_nat)
            keep = (s_nat == df["c_nationkey"]) & df["c_nationkey"].isin(self.nat_name)
            df = df[keep.to_numpy(dtype=bool)]
            if len(df) == 0:
                # typed empty frame: a schemaless empty block would make
                # the downstream aggregate warn about schema drift
                return pd.DataFrame(
                    {"n_name": pd.Series([], dtype=object),
                     "n_lines": pd.Series([], dtype="int64"),
                     "rev_fp4": pd.Series([], dtype="int64")}
                )
            cents = np.round(df["l_extendedprice"].to_numpy(dtype=np.float64) * 100.0).astype(np.int64)
            d100 = np.round(df["l_discount"].to_numpy(dtype=np.float64) * 100.0).astype(np.int64)
            g = (
                pd.DataFrame(
                    {
                        "n_name": df["c_nationkey"].map(self.nat_name),
                        "n_lines": 1,
                        "rev_fp4": cents * (100 - d100),
                    }
                )
                .groupby("n_name", as_index=False)
                .sum()
            )
            return g.astype({"n_lines": "int64", "rev_fp4": "int64"})

    def _strip_sentinel(t: pa.Table) -> pa.Table:
        # the aggregate output always holds the sentinel group, so this
        # block is never empty and the UDF always runs (schema stays)
        return t.filter(pc.not_equal(t["n_name"], "<SENTINEL>"))

    return (
        j.map_batches(
            Finish,
            fn_constructor_args=(supp_nat_ref, nat_name_ref),
            batch_format="pandas",
            concurrency=(1, 4),
        )
        .groupby("n_name")
        .aggregate(Sum("n_lines", alias_name="n_lines"), Sum("rev_fp4", alias_name="rev_fp4"))
        .map_batches(_strip_sentinel, batch_format="pyarrow")
    )


def q3_shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-15",
    k: int = 10,
) -> "ray.data.Dataset":
    """TPC-H Q3 (shipping priority): top-k unshipped orders by revenue for
    one market segment — the join+top-k composite:

    - customer is reduced to a BROADCAST custkey set (semi-join filter
      inside the orders map, no customer shuffle at all — the segment
      predicate makes it the classic small side);
    - lineitem is PRE-AGGREGATED map-side to one (l_orderkey, rev
      partial) row per order per block BEFORE the join, so the single
      native hash join moves order-granular partials, not line items;
    - both filtered reads prune at the parquet layer (o_orderdate <
      cutoff row-group filter; l_shipdate > cutoff);
    - the q5 sentinel-row guard pins schemas through the join and the
      aggregate on empty windows;
    - revenue is the same integer fixed-point (1e-4 dollars) as Q5;
      dates ship as epoch DAYS and priority as its leading digit, so
      every output column is integer/string-exact vs the DuckDB oracle.

    Output: (l_orderkey, o_date_days, o_pri, rev_fp4), top-k by
    (rev_fp4 DESC, l_orderkey ASC) — the unique-key tie-break makes the
    LIMIT deterministic."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pqm

    def _meta_rows(path: str) -> int:
        return _pqm.ParquetFile(path).metadata.num_rows

    def _nblocks(rows: int, target: int = 500_000, lo: int = 8, hi: int = 4096) -> int:
        return int(min(hi, max(lo, -(-rows // target))))

    cut = pd.Timestamp(cutoff)
    cust = pd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    seg_keys = np.sort(cust.loc[cust["c_mktsegment"] == segment, "c_custkey"].to_numpy(np.int64))
    seg_ref = ray.put(seg_keys)

    sent_orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([-1], pa.int64()),
                "o_date_days": pa.array([-1], pa.int64()),
                "o_pri": pa.array([-1], pa.int64()),
            }
        )
    )
    sent_li = ray.data.from_arrow(
        pa.table({"l_orderkey": pa.array([-1], pa.int64()), "rev_fp4": pa.array([0], pa.int64())})
    )

    class SemiOrders:
        """Broadcast semi-join: keep segment customers' orders; emit epoch
        days + priority digit (integer-exact columns)."""

        def __init__(self, keys_ref):
            self.keys = ray.get(keys_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = t["o_custkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.keys, ck)
            pos[pos == len(self.keys)] = 0
            keep = self.keys[pos] == ck if len(self.keys) else np.zeros(len(ck), dtype=bool)
            t = t.filter(pa.array(keep))
            days = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 86_400_000_000
            pri = pc.utf8_slice_codeunits(t["o_orderpriority"], 0, 1).cast(pa.int64())
            return pa.table(
                {
                    "o_orderkey": t["o_orderkey"],
                    "o_date_days": pa.array(days, pa.int64()),
                    "o_pri": pri,
                }
            )

    def _li_partial(t: pa.Table) -> pa.Table:
        # map-side pre-aggregation: one row per distinct orderkey per block
        cents = np.round(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        d100 = np.round(t["l_discount"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        rev = cents * (100 - d100)
        uk, sums = _int_group_sums(ok, rev)
        return pa.table(
            {
                "l_orderkey": pa.array(uk, pa.int64()),
                "rev_fp4": pa.array(sums, pa.int64()),
            }
        )

    nb_orders = _nblocks(_meta_rows(_pq(sf_dir, "orders")))
    nb_li = _nblocks(_meta_rows(_pq(sf_dir, "lineitem")))
    orders = (
        ray.data.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
            filter=_pc.field("o_orderdate") < _pc.scalar(cut),
            override_num_blocks=nb_orders,
        )
        .map_batches(SemiOrders, fn_constructor_args=(seg_ref,), batch_format="pyarrow", concurrency=(1, 8))
        .union(sent_orders)
    )
    li = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
            filter=_pc.field("l_shipdate") > _pc.scalar(cut),
            override_num_blocks=nb_li,
        )
        .select_columns(["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(_li_partial, batch_format="pyarrow")
        .union(sent_li)
    )
    j = li.join(
        orders,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "orders")), target=1_000_000),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def _strip(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["l_orderkey"], -1))

    agg = j.groupby("l_orderkey").aggregate(
        Sum("rev_fp4", alias_name="rev_fp4"),
        # o_date_days / o_pri are functionally dependent on the order
        # key; Min is just "the value" and keeps one exchange
        Min("o_date_days", alias_name="o_date_days"),
        Min("o_pri", alias_name="o_pri"),
    )
    # keep the sentinel THROUGH the sort (a sort over all-empty blocks
    # loses the schema), take k+1, strip it, re-limit.  Invariant: exactly
    # ONE sentinel row (rev 0, key -1) exists, so the top k+1 always
    # contains the true top-k real rows REGARDLESS of where the sentinel
    # sorts (at rev_fp4 ties with 100%-discount orders the -1 key sorts
    # FIRST, not last — the k+1 slack is what absorbs it, so do not
    # "optimize" the slack away)
    return (
        agg.sort(["rev_fp4", "l_orderkey"], descending=[True, False])
        .limit(k + 1)
        .map_batches(_strip, batch_format="pyarrow")
        .limit(k)
    )


def q18_large_volume_customers(
    sf_dir: str,
    qty_threshold: int = 250,
    k: int = 100,
) -> "ray.data.Dataset":
    """TPC-H Q18 (large-volume customers): orders whose total line-item
    quantity exceeds a threshold, with their customer — the
    HAVING-over-aggregate + join composite:

    - lineitem pre-aggregates map-side (per-block orderkey partials)
      then once globally; the HAVING filter runs right on the aggregate
      output, so only HOT orders (a tiny heavy-hitter set) enter any
      join;
    - hot orders ⋈ orders and ⋈ customer are native hash joins — at
      100 TB orders/customer are unbroadcastable, and each join's left
      side is already threshold-pruned;
    - quantities are integer-valued by the TPC-H contract (1..50), so
      sum_qty is int64-exact; o_totalprice ships as cents; dates as
      epoch days — every column hash-exact vs DuckDB;
    - the q5/q3 sentinel guard (matched key -1 rows, HAVING keeps the
      sentinel explicitly, strip after sort via k+1) makes the pipeline
      total when no order clears the threshold.

    Output: (c_custkey, c_name, o_orderkey, o_date_days, o_total_cents,
    sum_qty), top-k by (o_total_cents DESC, o_orderkey ASC)."""
    import pyarrow.parquet as _pqm

    def _meta_rows(path: str) -> int:
        return _pqm.ParquetFile(path).metadata.num_rows

    def _nblocks(rows: int, target: int = 500_000, lo: int = 8, hi: int = 4096) -> int:
        return int(min(hi, max(lo, -(-rows // target))))

    sent_hot = ray.data.from_arrow(
        pa.table({"l_orderkey": pa.array([-1], pa.int64()), "sum_qty": pa.array([0], pa.int64())})
    )
    sent_orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([-1], pa.int64()),
                "o_custkey": pa.array([-1], pa.int64()),
                "o_date_days": pa.array([-1], pa.int64()),
                "o_total_cents": pa.array([0], pa.int64()),
            }
        )
    )
    sent_cust = ray.data.from_arrow(
        pa.table({"c_custkey": pa.array([-1], pa.int64()), "c_name": pa.array(["<SENTINEL>"], pa.string())})
    )

    def _li_qty_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, sums = _int_group_sums(ok, qty)
        return pa.table(
            {
                "l_orderkey": pa.array(uk, pa.int64()),
                "sum_qty": pa.array(sums, pa.int64()),
            }
        )

    def _having(t: pa.Table) -> pa.Table:
        # HAVING sum_qty > T; the matched sentinel is kept explicitly
        keep = pc.or_(pc.greater(t["sum_qty"], qty_threshold), pc.equal(t["l_orderkey"], -1))
        return t.filter(keep)

    def _orders_proj(t: pa.Table) -> pa.Table:
        days = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 86_400_000_000
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_date_days": pa.array(days, pa.int64()),
                "o_total_cents": pa.array(cents, pa.int64()),
            }
        )

    nb_li = _nblocks(_meta_rows(_pq(sf_dir, "lineitem")))
    nb_orders = _nblocks(_meta_rows(_pq(sf_dir, "orders")))
    nb_cust = _nblocks(_meta_rows(_pq(sf_dir, "customer")))

    hot = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_orderkey", "l_quantity"],
            override_num_blocks=nb_li,
        )
        .map_batches(_li_qty_partial, batch_format="pyarrow")
        .union(sent_hot)
        .groupby("l_orderkey")
        .aggregate(Sum("sum_qty", alias_name="sum_qty"))
        .map_batches(_having, batch_format="pyarrow")
    )
    orders = (
        ray.data.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
            override_num_blocks=nb_orders,
        )
        .map_batches(_orders_proj, batch_format="pyarrow")
        .union(sent_orders)
    )
    cust = ray.data.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_name"], override_num_blocks=nb_cust
    ).union(sent_cust)

    ho = hot.join(
        orders,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "orders")), target=1_000_000),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    hoc = ho.join(
        cust,
        join_type="inner",
        num_partitions=_nblocks(_meta_rows(_pq(sf_dir, "customer")), target=1_000_000),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def _finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["o_custkey"],
                "c_name": t["c_name"],
                "o_orderkey": t["l_orderkey"],
                "o_date_days": t["o_date_days"],
                "o_total_cents": t["o_total_cents"],
                "sum_qty": t["sum_qty"],
            }
        )

    def _strip(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["o_orderkey"], -1))

    return (
        hoc.map_batches(_finish, batch_format="pyarrow")
        .sort(["o_total_cents", "o_orderkey"], descending=[True, False])
        .limit(k + 1)
        .map_batches(_strip, batch_format="pyarrow")
        .limit(k)
    )


def docs_winsorize(
    sf_dir: str, q_lo: float = 0.05, q_hi: float = 0.95
) -> "ray.data.Dataset":
    """Per-source winsorization: clamp every document's n_chars into its
    source's exact discrete [p05, p95] band — the outlier-robust
    normalization a quality-filtering pipeline applies before thresholding.

    Composition, not a new exchange: the per-source bounds come from
    ``docs_quantile_disc`` (one source-keyed exchange over (source,
    n_chars) — tiny output, one row per source), materialize as a
    broadcast dict, and the clamp itself is a stateless vectorized
    map over the documents read.  Sources with zero non-null n_chars
    have no bounds and their documents are omitted (the oracle's inner
    join).  Integer in, integer out → hash-exact."""
    bounds = docs_quantile_disc(sf_dir, qs=(q_lo, q_hi)).to_pandas()
    lo_c, hi_c = (f"q{int(round(q * 100))}" for q in (q_lo, q_hi))
    lo_map = dict(zip(bounds["source"], bounds[lo_c].astype(np.int64)))
    hi_map = dict(zip(bounds["source"], bounds[hi_c].astype(np.int64)))
    maps_ref = ray.put((lo_map, hi_map))

    class Clamp:
        def __init__(self, ref):
            self.lo_map, self.hi_map = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            src = df["source"].fillna("<NULL>")
            lo = src.map(self.lo_map)
            keep = lo.notna().to_numpy(dtype=bool) & df["n_chars"].notna().to_numpy(dtype=bool)
            df, src, lo = df[keep], src[keep], lo[keep]
            hi = src.map(self.hi_map).to_numpy(np.int64)
            n = df["n_chars"].to_numpy(np.int64)
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].astype("int64"),
                    "source": src,
                    "n_chars": n,
                    "n_chars_w": np.clip(n, lo.to_numpy(np.int64), hi),
                }
            )

    return ray.data.read_parquet(
        _pq(sf_dir, "documents"), columns=["doc_id", "source", "n_chars"]
    ).map_batches(Clamp, fn_constructor_args=(maps_ref,), batch_format="pandas", concurrency=(1, 8))


def events_trending_types(sf_dir: str, window_days: int = 7, k: int = 3) -> pd.DataFrame:
    """Trending event types: per calendar day, the top-k types by their
    TRAILING ``window_days``-day count — the "what's hot this week"
    product-analytics composite.

    The corpus collapses map-side to (day, type, n) partials (one tiny
    |days|×|types| exchange, the events_daily shape); the trailing
    window and per-day ranking run driver-side on that corpus-size-free
    table: per type a prefix-sum + searchsorted over its sorted days
    (true calendar window — absent days contribute 0, matching SQL's
    RANGE frame), then a vectorized (day, n7 DESC, type ASC) ranking.
    Only types with ≥1 event on the day are ranked (the SQL contract:
    rows of the per-day aggregate)."""
    DAY_US = 86_400_000_000

    base = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(
            lambda df: pd.DataFrame(
                {
                    "day": df["ts"].to_numpy().astype("datetime64[us]").view("i8") // DAY_US,
                    "event_type": df["event_type"].fillna("<NULL>"),
                    "n": np.ones(len(df), dtype=np.int64),
                }
            ).groupby(["day", "event_type"], as_index=False).sum(),
            batch_format="pandas",
        )
        .groupby(["day", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
    ).to_pandas()
    base = base.sort_values(["event_type", "day"]).reset_index(drop=True)
    n7 = np.empty(len(base), dtype=np.int64)
    for _, g in base.groupby("event_type", sort=False):
        days = g["day"].to_numpy(np.int64)
        csum = np.cumsum(g["n"].to_numpy(np.int64))
        lo = np.searchsorted(days, days - (window_days - 1), side="left")
        n7[g.index.to_numpy()] = csum - np.where(lo > 0, csum[lo - 1], 0)
    base["n7"] = n7
    base = base.sort_values(
        ["day", "n7", "event_type"], ascending=[True, False, True], kind="mergesort"
    ).reset_index(drop=True)
    base["rk"] = base.groupby("day").cumcount() + 1
    out = base[base["rk"] <= k].copy()
    out["day"] = pd.to_datetime(out["day"] * 86_400, unit="s").dt.strftime("%Y-%m-%d")
    out["n7"] = out["n7"].astype("int64")
    out["rk"] = out["rk"].astype("int64")
    return out[["day", "event_type", "n7", "rk"]].reset_index(drop=True)


def docs_global_row_index(sf_dir: str, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Order-preserving global row index (the distributed zipWithIndex):
    every document gets its 0-based rank under the total order
    (source, doc_id) — the deterministic sharding / resume-key primitive
    a training run uses to address examples.

    No global sort: one source-keyed exchange assigns each group its
    LOCAL (in-source) index vectorized; the per-source row counts — a
    |sources|-sized table — come back to the driver, prefix-sum in
    source order, and broadcast as each source's global offset.
    rank = offset[source] + local_idx.  NULL source groups under
    '<NULL>' (and sorts with that literal on both sides)."""
    from hepdata_validator_ray.ops import BUCKET_COL, with_bucket

    import pyarrow.parquet as _pqm

    nb = num_buckets or int(
        min(4096, max(8, -(-_pqm.ParquetFile(_pq(sf_dir, "documents")).metadata.num_rows // 2_000_000)))
    )

    def bucketize(t: pa.Table) -> pa.Table:
        t = t.set_column(
            t.schema.get_field_index("source"),
            "source",
            pc.coalesce(t["source"], pa.scalar("<NULL>", pa.string())),
        )
        return with_bucket(t, "source", nb)

    ds = ray.data.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "source"]).map_batches(
        bucketize, batch_format="pyarrow"
    )

    # phase 1: per-source totals (tiny)
    counts = (
        ds.groupby("source")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("source", kind="mergesort")
        .reset_index(drop=True)
    )
    offsets = dict(
        zip(counts["source"], np.r_[0, np.cumsum(counts["n"].to_numpy(np.int64))[:-1]])
    )
    off_ref = ray.put(offsets)

    # phase 2: in-source local index + broadcast offset (ray.get of the
    # tiny dict is served from the local object store per task)
    def index_group(df: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        df = df.drop(columns=[BUCKET_COL]).sort_values(
            ["source", "doc_id"], kind="mergesort"
        )
        src = df["source"].to_numpy()
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        lens = np.diff(np.r_[starts, len(src)])
        local = np.arange(len(src), dtype=np.int64) - np.repeat(starts, lens)
        base = df["source"].map(offs).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "source": df["source"],
                "idx": base + local,
            }
        )

    return ds.groupby(BUCKET_COL).map_groups(index_group, batch_format="pandas")


def events_first_seen_update(
    sf_dir: str, state_dir: str | None = None
) -> "ray.data.Dataset":
    """Incremental materialized-state maintenance (the streaming-view
    pattern of SURVEY §2.8): the state is (user_id, first_day) — each
    user's first-seen calendar day.  Phase 1 builds the state from the
    BASE half of the corpus (ts before the midpoint day, derived from
    the parquet column statistics — no data scan) and PERSISTS it as the
    partitioned state artifact; phase 2 ingests only the DELTA half
    (read pruned to ts ≥ cutoff), collapses it map-side to per-batch
    (user, min day) partials, and min-merges them with the state read in
    ONE user-keyed exchange — the delta path never rescans the base.

    The closed-loop contract (pinned in tests + the oracle): the updated
    state equals min(day) per user over the WHOLE corpus."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pqm

    from ray.data.aggregate import Min

    DAY_US = np.int64(86_400_000_000)
    ev = _pq(sf_dir, "events")
    # cutoff from footer statistics only (no scan)
    md = _pqm.ParquetFile(ev).metadata
    ts_idx = [md.schema.column(i).name for i in range(md.num_columns)].index("ts")
    lo = min(md.row_group(g).column(ts_idx).statistics.min for g in range(md.num_row_groups))
    hi = max(md.row_group(g).column(ts_idx).statistics.max for g in range(md.num_row_groups))
    cutoff = lo + (hi - lo) / 2

    def day_partials(lo_f=None, hi_f=None):
        def fn(t: pa.Table) -> pa.Table:
            ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            day = ts // DAY_US
            order = np.argsort(uid, kind="stable")
            uid, day = uid[order], day[order]
            starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
            return pa.table(
                {
                    "user_id": pa.array(uid[starts], pa.int64()),
                    "first_day": pa.array(np.minimum.reduceat(day, starts), pa.int64()),
                }
            )
        return fn

    if state_dir is None:
        # UNIQUE per invocation: a fixed input-keyed path races concurrent
        # executions (bench sweep vs oracle gate) — write_parquet(overwrite)
        # against the other run's read of the same dir can yield partial /
        # mixed state (ADVICE r3).  Callers that want a durable, shared
        # state artifact pass state_dir explicitly and own its lifecycle.
        import hashlib as _hl
        import tempfile as _tf

        import os as _os

        _os.makedirs("/tmp/hvr_state", exist_ok=True)
        state_dir = _tf.mkdtemp(
            prefix=f"first_seen-{_hl.md5(ev.encode()).hexdigest()[:12]}-",
            dir="/tmp/hvr_state",
        )
    base = (
        ray.data.read_parquet(ev, columns=["user_id", "ts"], filter=_pc.field("ts") < _pc.scalar(cutoff))
        .map_batches(day_partials(), batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("first_day", alias_name="first_day"))
    )
    base.write_parquet(state_dir, mode="overwrite")

    delta = ray.data.read_parquet(
        ev, columns=["user_id", "ts"], filter=_pc.field("ts") >= _pc.scalar(cutoff)
    ).map_batches(day_partials(), batch_format="pyarrow")
    state = ray.data.read_parquet(state_dir)
    return (
        state.union(delta)
        .groupby("user_id")
        .aggregate(Min("first_day", alias_name="first_day"))
    )


def events_wow_growth(sf_dir: str) -> pd.DataFrame:
    """Week-over-week growth per event type in BASIS POINTS — the growth
    dashboard op, integer-exact across engines: the corpus collapses
    map-side to (week, type, n) (one tiny exchange, Thursday-epoch weeks
    = epoch_us // 7 days, the cohort-retention convention), the calendar
    lag joins week w to w-1 driver-side on that |weeks|×|types| table,
    and growth_bps = trunc((n - n_prev)·10⁴ / n_prev) is spelled as a
    SIGN-SPLIT floor division on BOTH sides (DuckDB's // truncates
    toward zero, numpy's floors — the split makes them identical).
    Weeks whose previous calendar week has no rows are excluded."""
    WEEK_US = np.int64(7 * 86_400_000_000)

    base = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(
            lambda df: pd.DataFrame(
                {
                    "wk": df["ts"].to_numpy().astype("datetime64[us]").view("i8") // WEEK_US,
                    "event_type": df["event_type"].fillna("<NULL>"),
                    "n": np.ones(len(df), dtype=np.int64),
                }
            ).groupby(["wk", "event_type"], as_index=False).sum(),
            batch_format="pandas",
        )
        .groupby(["wk", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
    ).to_pandas()
    prev = base.rename(columns={"n": "n_prev"}).copy()
    prev["wk"] = prev["wk"] + 1
    m = base.merge(prev, on=["wk", "event_type"], how="inner")
    n, p = m["n"].to_numpy(np.int64), m["n_prev"].to_numpy(np.int64)
    d = n - p
    bps = np.where(d >= 0, (d * 10000) // p, -(((-d) * 10000) // p))
    out = pd.DataFrame(
        {
            "wk": m["wk"].astype("int64"),
            "event_type": m["event_type"],
            "n": n,
            "n_prev": p,
            "growth_bps": bps.astype(np.int64),
        }
    )
    return out


#: composite sort key for distributed selection: lexicographic (value,
#: doc_id) — numpy structured comparison IS field-lexicographic, so
#: searchsorted against sampled boundary pairs is the bucket function
_OSTAT_KEY = np.dtype([("v", "i8"), ("id", "i8")])


def _ostat_sample_boundaries(path: str, nb: int, n_total: int) -> np.ndarray:
    """Sampled-quantile bucket boundaries over the COMPOSITE key (n_chars,
    doc_id): a deterministic hash-strided sample (splitmix64(doc_id) %
    stride == 0 — layout-independent, no shipped RNG state) collapses to
    ~64·nb pairs on the driver, whose even-position order statistics become
    the nb−1 cut points.  Because doc_id is unique the composite sample has
    no duplicate keys, so even an ALL-ONE-VALUE corpus (the adversarial
    equal-width-bin case) splits across buckets by doc_id — per-bucket load
    is bounded by sampling error (~n/nb · (1+ε)), never by value
    multiplicity."""
    from hepdata_validator_ray.ops import splitmix64 as _sm64

    target = min(max(nb * 64, 1024), 1 << 18)
    stride = max(1, n_total // target)

    def pick(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["n_chars"]))
        ids = t["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        sel = _sm64(ids.view(np.uint64)) % np.uint64(stride) == 0
        return pa.table(
            {
                "v": pa.array(
                    t["n_chars"].cast(pa.int64()).to_numpy(zero_copy_only=False)[sel], pa.int64()
                ),
                "id": pa.array(ids[sel], pa.int64()),
            }
        )

    smp = (
        ray.data.read_parquet(path, columns=["doc_id", "n_chars"])
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()  # bounded: ~`target` rows regardless of corpus size
    )
    arr = np.empty(len(smp), dtype=_OSTAT_KEY)
    if len(smp):
        arr["v"] = smp["v"].to_numpy(np.int64)
        arr["id"] = smp["id"].to_numpy(np.int64)
        arr.sort()
    if len(arr) < 2 or nb < 2:
        return arr[:0]  # degenerate sample -> single bucket (still exact)
    cut_pos = np.clip(np.round(np.arange(1, nb) * len(arr) / nb).astype(np.int64), 0, len(arr) - 1)
    return np.unique(arr[cut_pos])


def docs_order_statistics(
    sf_dir: str, ranks: tuple[int, ...] | None = None, num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Exact GLOBAL order statistics by distributed selection — the
    median-of-100TB primitive: the value (and doc) at chosen 0-based
    global ranks under the total order (n_chars, doc_id), WITHOUT a
    global sort materialization.

    Range partitioning, not hash: each row's bucket is its composite key's
    position among SAMPLED-QUANTILE boundaries over (n_chars, doc_id)
    (one column-pruned sampling pass, ~64·nb pairs on the driver — see
    ``_ostat_sample_boundaries``; replaces the r3 equal-width footer bins,
    whose skew hole this closes: value mass concentrated in one bin now
    splits by doc_id).  Buckets are ORDER-ALIGNED; per-bucket counts
    prefix-sum into global bucket offsets driver-side (|buckets| ints);
    each bucket then sorts only ITS rows, adds its offset, and keeps
    the requested ranks.  Shuffle = one exchange of (n_chars, doc_id);
    driver traffic = |buckets| counts + the bounded boundary sample."""
    import pyarrow.parquet as _pqm

    from ray.data.aggregate import Count
    from hepdata_validator_ray.ops import BUCKET_COL

    path = _pq(sf_dir, "documents")
    md = _pqm.ParquetFile(path).metadata
    n_total = md.num_rows
    if ranks is None:
        ranks = (0, n_total // 4, n_total // 2, (3 * n_total) // 4, n_total - 1)
    ranks_arr = np.asarray(sorted(set(ranks)), dtype=np.int64)
    nb = num_buckets or int(min(4096, max(8, -(-n_total // 2_000_000))))
    cuts = _ostat_sample_boundaries(path, nb, n_total)
    cuts_ref = ray.put(cuts)
    nb = len(cuts) + 1  # effective bucket count (distinct boundaries + 1)

    def binize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["n_chars"]))
        v = t["n_chars"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = t["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keys = np.empty(len(v), dtype=_OSTAT_KEY)
        keys["v"] = v
        keys["id"] = ids
        b = np.searchsorted(ray.get(cuts_ref), keys, side="right")
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_chars": pa.array(v, pa.int64()),
                BUCKET_COL: pa.array(b.astype(np.int64), pa.int64()),
            }
        )

    ds = ray.data.read_parquet(path, columns=["doc_id", "n_chars"]).map_batches(
        binize, batch_format="pyarrow"
    )
    counts = (
        ds.groupby(BUCKET_COL).aggregate(Count(alias_name="n")).to_pandas()
        .sort_values(BUCKET_COL)
        .reset_index(drop=True)
    )
    offs = np.zeros(nb, dtype=np.int64)
    offs[counts[BUCKET_COL].to_numpy(np.int64)] = counts["n"].to_numpy(np.int64)
    starts = np.r_[0, np.cumsum(offs)[:-1]]
    starts_by_bucket = {int(b): int(s) for b, s in enumerate(starts)}
    start_ref = ray.put((starts_by_bucket, ranks_arr))

    def select_ranks(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"rank": pd.Series(dtype="int64"), "doc_id": pd.Series(dtype="int64"),
                 "n_chars": pd.Series(dtype="int64")}
            )
        starts_map, want = ray.get(start_ref)
        b = int(df[BUCKET_COL].iloc[0])
        df = df.drop(columns=[BUCKET_COL]).sort_values(
            ["n_chars", "doc_id"], kind="mergesort"
        )
        gidx = starts_map[b] + np.arange(len(df), dtype=np.int64)
        hit = np.isin(gidx, want)
        out = df[hit].copy()
        out["rank"] = gidx[hit]
        return pd.DataFrame(
            {
                "rank": out["rank"].astype("int64"),
                "doc_id": out["doc_id"].astype("int64"),
                "n_chars": out["n_chars"].astype("int64"),
            }
        )

    return ds.groupby(BUCKET_COL).map_groups(select_ranks, batch_format="pandas")


def approx_distinct_users_per_type(
    sf_dir: str, p: int = 12, exact: bool = False
) -> "ray.data.Dataset | pd.DataFrame":
    """Per-group approximate COUNT DISTINCT — the 10^12-row spelling of
    "distinct users per event type": per batch each group contributes ONE
    HLL register array (2^p bytes), groups merge registers by elementwise
    max in one |groups|-keyed exchange, and the estimate reads off the
    merged registers.  Exchange volume = |groups| x 2^p bytes x n_batches
    — independent of row count (the exact twin ships every (type, user)
    pair).  Output (event_type, n_users_approx int64).

    ``exact=True`` returns the exact twin — same exchange SHAPE (per-batch
    distinct collapse, one keyed exchange) but corpus-proportional volume
    — used by the oracle gate and the pytest that pins the HLL estimate
    within 3 standard errors (1.04/sqrt(2^p)) of it."""
    from hepdata_validator_ray.ops import BUCKET_COL, with_bucket
    from hepdata_validator_ray.sketches import HyperLogLog

    ev = _pq(sf_dir, "events")

    if exact:
        from ray.data.aggregate import Count

        def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
            g = df[["event_type", "user_id"]].copy()
            g["event_type"] = g["event_type"].fillna("<NULL>")
            return g.drop_duplicates()

        return (
            ray.data.read_parquet(ev, columns=["event_type", "user_id"])
            .map_batches(distinct_pairs, batch_format="pandas", batch_size=8192)
            .groupby(["event_type", "user_id"])
            .aggregate(Count(alias_name="_c"))
            .map_batches(
                lambda df: df[["event_type"]]
                .value_counts()
                .rename_axis("event_type")
                .reset_index(name="n_partial"),
                batch_format="pandas",
            )
            .groupby("event_type")
            .sum("n_partial")
            .map_batches(
                lambda t: t.rename_columns(["event_type", "n_users"]), batch_format="pyarrow"
            )
        )

    def partial_hll(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].fillna("<NULL>")
        out_t, out_r = [], []
        for t, sub in df.groupby(et, sort=False):
            h = HyperLogLog(p)
            h.add(sub["user_id"].to_numpy())
            out_t.append(t)
            out_r.append(h.registers.tobytes())
        return pd.DataFrame({"event_type": out_t, "regs": out_r})

    def merge_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        rows = []
        for t, sub in df.groupby("event_type", sort=False):
            h = HyperLogLog(p)
            h.registers = np.maximum.reduce(
                [np.frombuffer(b, dtype=np.uint8) for b in sub["regs"]]
            )
            rows.append((t, int(round(h.estimate()))))
        return pd.DataFrame(rows, columns=["event_type", "n_users_approx"]).astype(
            {"n_users_approx": "int64"}
        )

    return (
        ray.data.read_parquet(ev, columns=["event_type", "user_id"])
        .map_batches(partial_hll, batch_format="pandas", batch_size=16384)
        .map_batches(lambda t: with_bucket(t, "event_type", 16), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(merge_group, batch_format="pandas")
    )


def events_rolling_median(
    sf_dir: str, window: int = 7, num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Per-user ROLLING MEDIAN — the windowed-aggregate family's
    order-statistic member (rolling sums/lags exist; median resists the
    usual prefix tricks): for each event, the median of the user's last
    ``window`` values (cents), ordered by (ts, event_id), including the
    current row and fewer-than-window prefixes.

    Output (event_id, user_id, med_cents_x2): the doubled median is ALWAYS
    integral (one middle ×2, or the sum of two middles), so the column is
    int64 hash-exact — both engines average two int64 middles in float64,
    exact below 2^52.  One user-keyed exchange; in-bucket the per-user
    windows run through pandas' C rolling-median kernel."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "ts", "user_id", "value"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=16)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in ("event_id", "user_id", "med_cents_x2")}
            )
        cents = np.floor(df["value"].to_numpy(np.float64) * 100.0).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts": df["ts"].to_numpy(),
                "cents": cents,
            }
        ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        med = (
            df.groupby("user_id", sort=False)["cents"]
            .rolling(window, min_periods=1)
            .median()
            .to_numpy()
        )
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": df["user_id"].to_numpy(),
                "med_cents_x2": np.round(med * 2.0).astype(np.int64),
            }
        )

    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )


def events_out_of_order_stats(sf_dir: str, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Backfill-REPLAY disorder audit — watermark/late-event accounting for
    the common pattern of replaying a historical stream in deterministic
    shuffle order (content-hash order, the layout-independent training
    replay): per user, an event is LATE when its ts is older than the
    running max ts among previously-replayed events, and its lateness is
    that watermark minus ts.  Output per user: (user_id, n_events, n_late,
    max_late_us) — max_late_us bounds the reorder buffer / watermark delay
    a consumer of the replayed stream needs.

    Same physical plan as sessionize: user-hash-bucketed exchange, then one
    vectorized pandas pass over ALL the bucket's users (sort by (user,
    replay hash, event_id), per-user running max via grouped cummax,
    integer microsecond arithmetic — no float, no per-user Python).  The
    replay hash is the md5-parity hash64 (see deterministic_shuffle_ranks),
    so the oracle replays the identical order."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket
    from hepdata_validator_ray.pipelines.sampling import _hash64

    def late(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        df["_h"] = _hash64(df["event_id"].to_numpy(), key_fn="md5")
        df = df.sort_values(["user_id", "_h", "event_id"], kind="mergesort")
        us = pd.Series(
            df["ts"].to_numpy().astype("datetime64[us]").view("i8"), index=df.index
        )  # epoch microseconds, integer-exact
        wm = us.groupby(df["user_id"]).cummax().groupby(df["user_id"]).shift()
        late_us = (wm - us).fillna(0).astype("int64").clip(lower=0)
        is_late = late_us > 0
        out = pd.DataFrame(
            {"user_id": df["user_id"], "n": 1, "late": is_late.astype("int64"), "lus": late_us}
        )
        g = out.groupby("user_id", as_index=False).agg(
            n_events=("n", "sum"), n_late=("late", "sum"), max_late_us=("lus", "max")
        )
        return g.astype({"n_events": "int64", "n_late": "int64", "max_late_us": "int64"})

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "event_id", "ts"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds)
    return (
        ds.map_batches(
            lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow", batch_size=65536
        )
        .groupby(BUCKET_COL)
        .map_groups(late, batch_format="pandas")
    )


def q12_priority_lines(
    sf_dir: str,
    date_lo_us: int = 820_454_400_000_000,  # 1996-01-01 in epoch microseconds
    date_hi_us: int = 852_076_800_000_000,  # 1997-01-01
) -> "ray.data.Dataset":
    """TPC-H Q12-shaped priority audit over the available columns: for
    line items shipped inside a date window, per l_returnflag the count
    whose ORDER is high-priority ('1-URGENT'/'2-HIGH') vs not — the
    selective-join + conditional-aggregation composite.

    Physical plan (one row-scale exchange total):
    - lineitem streams column-pruned; each batch filters the ship-date
      window and collapses to (l_orderkey, l_returnflag, cnt) partials —
      duplicates across batches are FINE because each partial row joins
      orders exactly once, so the final sum is unaffected (no pre-join
      orderkey exchange needed);
    - partials ⋈ orders(o_orderkey, hi) is THE native hash join; orders is
      row-scale (unbroadcastable at 100 TB), projected to two ints before
      the exchange; the q5/q3/q18 matched-sentinel guard (key −1 on both
      sides, stripped after) keeps the join total when the window is empty;
    - the finale is a |flags|-bounded groupby of integer conditional sums.

    Output (l_returnflag, high_line_count, low_line_count)."""
    import pyarrow.parquet as _pqm

    def _meta_rows(path: str) -> int:
        return _pqm.ParquetFile(path).metadata.num_rows

    def _nblocks(rows: int, target: int = 500_000, lo: int = 8, hi: int = 4096) -> int:
        return int(min(hi, max(lo, -(-rows // target))))

    def _li_partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (ship >= date_lo_us) & (ship < date_hi_us)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)[keep]
        fl = t["l_returnflag"].to_pandas().to_numpy()[keep]
        if not len(ok):
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "l_returnflag": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        codes, uniq = pd.factorize(fl)
        packed = ok * np.int64(len(uniq) + 1) + codes  # |flags| tiny, no overflow
        uk, sums = _int_group_sums(packed, np.ones(len(ok), dtype=np.int64))
        return pa.table(
            {
                "l_orderkey": pa.array(uk // (len(uniq) + 1), pa.int64()),
                "l_returnflag": pa.array(uniq[(uk % (len(uniq) + 1)).astype(np.int64)], pa.string()),
                "cnt": pa.array(sums, pa.int64()),
            }
        )

    def _orders_proj(t: pa.Table) -> pa.Table:
        pri = t["o_orderpriority"].to_pandas()
        hi = pri.isin(["1-URGENT", "2-HIGH"]).to_numpy().astype(np.int64)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "hi": pa.array(hi, pa.int64()),
            }
        )

    sent_li = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([-1], pa.int64()),
                "l_returnflag": pa.array(["<SENTINEL>"], pa.string()),
                "cnt": pa.array([0], pa.int64()),
            }
        )
    )
    sent_ord = ray.data.from_arrow(
        pa.table({"o_orderkey": pa.array([-1], pa.int64()), "hi": pa.array([0], pa.int64())})
    )

    li = (
        ray.data.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_orderkey", "l_returnflag", "l_shipdate"],
            override_num_blocks=_nblocks(_meta_rows(_pq(sf_dir, "lineitem"))),
        )
        .map_batches(_li_partial, batch_format="pyarrow")
        .union(sent_li)
    )
    orders = (
        ray.data.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_orderkey", "o_orderpriority"],
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

    def _score(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["l_orderkey"], -1)
        t = t.filter(keep)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "high_line_count": pa.array(cnt * hi, pa.int64()),
                "low_line_count": pa.array(cnt * (1 - hi), pa.int64()),
            }
        )

    return (
        joined.map_batches(_score, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("high_line_count", alias_name="high_line_count"),
            Sum("low_line_count", alias_name="low_line_count"),
        )
    )


def events_interarrival_spectrum(sf_dir: str, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Inter-arrival SPECTRUM: per event type, a log-decade histogram of
    the per-user gap (microseconds) to the user's PREVIOUS event of any
    type, the gap attributed to the LATER event — the burstiness profile
    that sizes session thresholds and rate limits (a uniform stream and a
    bursty one with equal event counts differ only here).  Each user's
    first event has no gap and is not counted.

    INTEGER-exact log bucketing: the bucket is the DECIMAL DIGIT COUNT of
    the gap (0 → 1 digit), computed by searchsorted against powers of ten
    — no float log on either engine (the SQL twin is length(CAST(gap AS
    VARCHAR))).

    Physical plan: the sessionize shape — user-hash-bucketed exchange,
    one vectorized pandas pass per bucket (sort by (user, ts, event_id),
    grouped shift, digit bucketing, local collapse), then a
    |types|×|digits|-bounded groupby over the packed single string key.

    Output (event_type, n_digits, n_gaps)."""
    from ray.data.aggregate import Sum

    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    pow10 = np.array([10**k for k in range(1, 19)], dtype=np.int64)

    def spectrum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        # (user, ts, event_id) total order — the deterministic tie-break
        # shared with the SQL window twin
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = pd.Series(
            df["ts"].to_numpy().astype("datetime64[us]").view("i8"), index=df.index
        )
        gap = (us - us.groupby(df["user_id"].to_numpy()).shift()).to_numpy()
        has = ~np.isnan(gap)
        g = gap[has].astype(np.int64)
        if (g < 0).any():
            raise AssertionError("negative gap after (user, ts) sort")
        digits = np.searchsorted(pow10, g, side="right") + 1
        key = (
            df["event_type"].to_numpy()[has].astype(object)
            + "|"
            + pd.Series(digits).astype(str).to_numpy(dtype=object)
        )
        codes, uniq = pd.factorize(key)
        return pd.DataFrame(
            {
                "key": np.asarray(uniq, dtype=object),
                "n_gaps": np.bincount(codes).astype(np.int64),
            }
        )

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "event_id", "ts", "event_type"]
    )
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds)
    agg = (
        ds.map_batches(
            lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow", batch_size=65536
        )
        .groupby(BUCKET_COL)
        .map_groups(spectrum, batch_format="pandas")
        .groupby("key")
        .aggregate(Sum("n_gaps", alias_name="n_gaps"))
    )

    def finale(t: pa.Table) -> pa.Table:
        key = t["key"].to_pandas()
        sp = key.str.rsplit("|", n=1)
        return pa.table(
            {
                "event_type": pa.array(sp.str[0], pa.string()),
                "n_digits": pa.array(sp.str[1].astype(np.int64), pa.int64()),
                "n_gaps": t["n_gaps"].cast(pa.int64()),
            }
        )

    return agg.map_batches(finale, batch_format="pyarrow")


def events_rollup(sf_dir: str) -> pd.DataFrame:
    """Multi-level ROLLUP aggregate over events — the three grouping levels
    of ``GROUP BY ROLLUP(event_type, day)`` from ONE row-scale pass: the
    coarser levels (per-type, grand total) are DERIVED from the finest
    (type, day) grain, exact because both aggregates are additive (row
    count, integer cents sum).  At 100 TB that is one corpus scan instead
    of one per level; the derivation runs driver-side over the
    |types|×|days|-bounded finest table.

    The exchange key is the single packed string ``type|day`` (the
    two-column-groupby wedge workaround, see events_interarrival_spectrum);
    day is integer days since epoch (== SQL ``datediff('day', …)``).
    Rolled-up markers: event_type '<ALL>', day −1 — matching the twin's
    COALESCE spelling, which requires event_type to be genuinely NULL-free
    (asserted; a NULL type would conflate with the marker on BOTH engines
    identically, but the contract is cleaner as a refusal).

    Output (event_type, day, n_events, sum_cents) over all three levels."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df["event_type"].isna().any():
            raise ValueError("NULL event_type conflates with the rollup marker")
        day = df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        cents = np.round(df["value"].to_numpy(np.float64) * 100.0).astype(np.int64)
        key = (df["event_type"].to_numpy(dtype=object) + "|" + day.astype(str).astype(object))
        g = (
            pd.DataFrame({"key": key, "n_events": np.int64(1), "sum_cents": cents})
            .groupby("key", sort=False)
            .sum()
            .reset_index()
        )
        return g

    fin = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pandas")
        .groupby("key")
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_cents", alias_name="sum_cents"))
        .to_pandas()  # |types|×|days|-bounded by construction
    )
    split = fin["key"].str.rsplit("|", n=1, expand=True)
    fin["event_type"] = split[0]
    fin["day"] = split[1].astype("int64")
    finest = fin[["event_type", "day", "n_events", "sum_cents"]]
    lvl1 = (
        finest.groupby("event_type", as_index=False)[["n_events", "sum_cents"]]
        .sum()
        .assign(day=np.int64(-1))
    )
    grand = pd.DataFrame(
        {
            "event_type": ["<ALL>"],
            "day": np.array([-1], dtype=np.int64),
            "n_events": [finest["n_events"].sum()],
            "sum_cents": [finest["sum_cents"].sum()],
        }
    )
    out = pd.concat(
        [finest, lvl1[["event_type", "day", "n_events", "sum_cents"]], grand],
        ignore_index=True,
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_cents"] = out["sum_cents"].astype("int64")
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


_POW10 = 10 ** np.arange(19, dtype=np.int64)  # 10^18 is the last int64 decade


def benford_digit_audit(sf_dir: str) -> pd.DataFrame:
    """First-significant-digit counts of the integer cent value per event
    type — the Benford's-law forensics profile (fabricated or truncated
    numeric feeds bend the leading-digit distribution long before any
    range check fires).  The first digit is INTEGER-exact: decimal digit
    count via searchsorted over the powers of ten, then one integer
    divide — never float log10, which misclassifies at the decade
    boundaries (the events_interarrival_spectrum discipline; the SQL twin
    is ``substr(CAST(cents AS VARCHAR), 1, 1)``).

    Non-positive cents carry no leading digit and are dropped on BOTH
    engines (mirrored WHERE, not a raise — zero is a legitimate value for
    a metered feed).  One |types|×9-bounded packed-string exchange.

    Output (event_type, first_digit, n)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["value"].to_numpy(np.float64) * 100.0).astype(np.int64)
        keep = cents > 0
        cents = cents[keep]
        et = df["event_type"].to_numpy(dtype=object)[keep]
        nd = np.searchsorted(_POW10[1:], cents, side="right")  # floor(log10)
        fd = cents // _POW10[nd]
        key = et + "|" + fd.astype(str).astype(object)
        g = (
            pd.DataFrame({"key": key, "n": np.int64(1)})
            .groupby("key", sort=False)
            .sum()
            .reset_index()
        )
        return g

    fin = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])
        .map_batches(partial, batch_format="pandas")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # |types|×9-bounded
    )
    split = fin["key"].str.rsplit("|", n=1, expand=True)
    out = pd.DataFrame(
        {
            "event_type": split[0],
            "first_digit": split[1].astype("int64"),
            "n": fin["n"].astype("int64"),
        }
    )
    return out.sort_values(["event_type", "first_digit"]).reset_index(drop=True)


def events_ohlc(sf_dir: str) -> pd.DataFrame:
    """Per-(event_type, day) OHLC candle — open/close are the values of
    the FIRST/LAST event under the strict (ts, event_id) total order
    (event_id is unique, so both engines pick the same row even with
    equal timestamps), high/low the extrema, n_events the count.  The
    ordered-first/last aggregate every time-series rollup needs, done
    WITHOUT a global sort: ordered selection is associative, so a
    per-batch partial (each key's first/last candidate trio + extrema)
    meets a per-bucket combine that re-applies the same order rule over
    partials — the exchange is bounded by |keys|·|batches| however many
    events a day holds.  NULL values are excluded on both engines;
    open/high/low/close are SELECTED doubles (no arithmetic), so the
    hash comparison is exact.

    Output (event_type, day, open, high, low, close, n_events)."""
    from hepdata_validator_ray.ops import bucketed_aggregate

    schema = pa.schema(
        [
            ("key", pa.string()),
            ("o_ts", pa.int64()),
            ("o_id", pa.int64()),
            ("open", pa.float64()),
            ("c_ts", pa.int64()),
            ("c_id", pa.int64()),
            ("close", pa.float64()),
            ("high", pa.float64()),
            ("low", pa.float64()),
            ("n_events", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_valid(t["value"])
        t = t.filter(keep)
        day = pc.strftime(t["ts"], format="%Y-%m-%d")
        df = pd.DataFrame(
            {
                "key": pc.binary_join_element_wise(t["event_type"], day, "|").to_pandas(),
                "ts_us": t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
                "eid": t["event_id"].to_numpy(zero_copy_only=False),
                "v": t["value"].to_numpy(zero_copy_only=False),
            }
        )
        return pa.Table.from_pandas(_ohlc_reduce(df), schema=schema, preserve_index=False)

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        # re-reduce partials: first/last re-selected under the SAME
        # (ts, event_id) order, extrema and counts merge associatively
        lo = df.rename(columns={"o_ts": "ts_us", "o_id": "eid", "open": "v"})
        hi = df.rename(columns={"c_ts": "ts_us", "c_id": "eid", "close": "v"})
        merged = _ohlc_reduce(pd.concat([lo, hi], ignore_index=True)[["key", "ts_us", "eid", "v"]])
        ext = df.groupby("key", as_index=False).agg(
            high=("high", "max"), low=("low", "min"), n_events=("n_events", "sum")
        )
        out = merged.drop(columns=["high", "low", "n_events"]).merge(ext, on="key")
        return pa.Table.from_pandas(out[[f.name for f in schema]], schema=schema, preserve_index=False)

    def _ohlc_reduce(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "key": pd.Series(dtype="object"),
                    "o_ts": pd.Series(dtype="int64"),
                    "o_id": pd.Series(dtype="int64"),
                    "open": pd.Series(dtype="float64"),
                    "c_ts": pd.Series(dtype="int64"),
                    "c_id": pd.Series(dtype="int64"),
                    "close": pd.Series(dtype="float64"),
                    "high": pd.Series(dtype="float64"),
                    "low": pd.Series(dtype="float64"),
                    "n_events": pd.Series(dtype="int64"),
                }
            )
        s = df.sort_values(["key", "ts_us", "eid"], kind="mergesort")
        g = s.groupby("key", sort=False)
        first = g.nth(0)
        last = g.nth(-1)
        agg = g.agg(high=("v", "max"), low=("v", "min"), n_events=("v", "size")).reset_index()
        return pd.DataFrame(
            {
                "key": agg["key"],
                "o_ts": first["ts_us"].to_numpy(dtype=np.int64),
                "o_id": first["eid"].to_numpy(dtype=np.int64),
                "open": first["v"].to_numpy(dtype=np.float64),
                "c_ts": last["ts_us"].to_numpy(dtype=np.int64),
                "c_id": last["eid"].to_numpy(dtype=np.int64),
                "close": last["v"].to_numpy(dtype=np.float64),
                "high": agg["high"].to_numpy(dtype=np.float64),
                "low": agg["low"].to_numpy(dtype=np.float64),
                "n_events": agg["n_events"].to_numpy(dtype=np.int64),
            }
        )

    res = bucketed_aggregate(
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "ts", "event_type", "value"]),
        "key",
        partial,
        combine,
    ).to_pandas()  # |event_type|·|days| rows, bounded
    split = res["key"].str.split("|", n=1, expand=True)
    out = pd.DataFrame(
        {
            "event_type": split[0],
            "day": split[1],
            "open": res["open"].astype("float64"),
            "high": res["high"].astype("float64"),
            "low": res["low"].astype("float64"),
            "close": res["close"].astype("float64"),
            "n_events": res["n_events"].astype("int64"),
        }
    )
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def events_ewma(sf_dir: str, num_buckets: int | None = None) -> pd.DataFrame:
    """Per-user exponential moving average of event values (α = 1/2) —
    the inherently SEQUENTIAL per-key scan (s_t = s_{t-1}/2 + v_t, seeded
    s_1 = v_1) that streaming feature stores maintain, done distributed
    and gate-ably exact.

    Exactness recipe (the pagerank fixed-point discipline applied to a
    recurrence): values quantize to int64 ten-thousandths via
    floor(v·10⁴ + 0.5) (parity-verified against DuckDB), and each step
    divides by 2 with TRUNCATION toward zero — DuckDB's `//` semantics,
    mirrored as sign(s)·(|s|//2) in numpy — so both engines walk the
    identical integer trajectory and the SQL twin is one
    list_reduce(list(v ORDER BY ts, event_id), (s, x) -> s // 2 + x).

    Physical plan: one user-keyed bucketed exchange co-locates each
    user's history; inside a bucket the recurrence loops over the STEP
    axis (irreducibly sequential) but stays vectorized across users —
    total work O(events), loop length max-events-per-user.  The result
    is user-bounded.

    Output (user_id, n_events, ewma_fp4)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets_path, with_bucket

    if num_buckets is None:
        num_buckets = derive_num_buckets_path(_pq(sf_dir, "events"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "user_id": t["user_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "eid": t["event_id"],
                "v_fp": pa.array(np.floor(v * 10000.0 + 0.5).astype(np.int64)),
            }
        )

    def scan(df: pd.DataFrame) -> pa.Table:
        df = df.drop(columns=[BUCKET_COL]).sort_values(
            ["user_id", "ts_us", "eid"], kind="mergesort"
        )
        uid = df["user_id"].to_numpy(dtype=np.int64)
        v = df["v_fp"].to_numpy(dtype=np.int64)
        if not len(df):
            return pa.Table.from_pydict(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "ewma_fp4": pa.array([], pa.int64()),
                }
            )
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        lens = np.diff(np.r_[starts, len(uid)])
        s = v[starts].copy()  # seed: first event's value
        max_len = int(lens.max())
        for i in range(1, max_len):
            active = lens > i
            idx = starts[active] + i
            sa = s[active]
            # DuckDB `//` truncates toward zero; mirror exactly
            s[active] = np.sign(sa) * (np.abs(sa) // 2) + v[idx]
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "n_events": pa.array(lens.astype(np.int64)),
                "ewma_fp4": pa.array(s, pa.int64()),
            }
        )

    res = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "ts", "user_id", "value"])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(lambda t: with_bucket(t, "user_id", num_buckets), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(scan, batch_format="pandas")
        .to_pandas()
    )  # |users| rows, bounded
    return res.sort_values("user_id").reset_index(drop=True)


def events_hour_profile(sf_dir: str) -> pd.DataFrame:
    """Hour-of-day seasonality audit per event type: observed counts per
    (type, hour 0-23) against the independence expectation (type margin ×
    hour margin / N) with Pearson residuals — the burst/bot detector (a
    type that fires only at one hour lights up its residual; organic
    traffic follows the global diurnal curve).  Same contingency
    machinery as the lang×source audit, but over a DERIVED time key:
    hours extract vectorized per batch, one |types|·24-bounded grouped
    count is the only exchange, residual arithmetic over the bounded
    cell table with the expression spelled identically in the twin.

    Output (event_type, hour, n, expected, residual)."""
    from ray.data.aggregate import Count as _Count

    cells = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(pc.hour(t["ts"]), pa.int64()),
                ],
                names=["event_type", "hour"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "hour"])
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )  # |types| × 24, bounded
    if not len(cells):
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "hour": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
                "expected": pd.Series(dtype="float64"),
                "residual": pd.Series(dtype="float64"),
            }
        )
    n = cells["n"].astype("int64")
    row_tot = cells.groupby("event_type")["n"].transform("sum").astype("int64")
    col_tot = cells.groupby("hour")["n"].transform("sum").astype("int64")
    total = int(n.sum())
    expected = row_tot.to_numpy(np.float64) * col_tot.to_numpy(np.int64) / total
    residual = (n.to_numpy(np.float64) - expected) / np.sqrt(expected)
    return (
        pd.DataFrame(
            {
                "event_type": cells["event_type"],
                "hour": cells["hour"].astype("int64"),
                "n": n,
                "expected": expected,
                "residual": residual,
            }
        )
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )


def events_changepoint(sf_dir: str) -> pd.DataFrame:
    """Single-changepoint detection per event type over its daily-count
    series — the drift monitor's "did the level shift, and when": the
    CUSUM-style statistic G_k = |m·P_k − k·T| (P = prefix sum of daily
    counts, T = total, m = #days) peaks at the day after which the mean
    level changes; all arithmetic is INTEGER, so the argmax (ties → the
    earliest day, the row_number rule) is hash-exact on both engines.
    g_norm = G*/(m·T) ∈ [0,1) is the only double (identically spelled) —
    near 0 means a flat series.

    One |types|·|days|-bounded grouped-count exchange is the only
    corpus-scale stage; the per-type scan over days is driver arithmetic
    on the bounded table.  Types with a single day emit no row (no
    interior split exists), matching the twin's k ≤ m−1 window.

    Output (event_type, split_day, g_stat, g_norm, n_days)."""
    from ray.data.aggregate import Count as _Count

    daily = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())),
                    pc.strftime(t["ts"], format="%Y-%m-%d"),
                ],
                names=["event_type", "day"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "day"])
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )  # |types| × |days|, bounded
    out = []
    for et, grp in daily.groupby("event_type", sort=True):
        grp = grp.sort_values("day", kind="mergesort")
        c = grp["n"].astype("int64").tolist()
        m = len(c)
        if m < 2:
            continue
        T = sum(c)
        # exact Python ints: m·P_k and k·T overflow int64 at the 10^12 tier
        best_k, best_g = 0, -1
        P = 0
        for k in range(1, m):
            P += c[k - 1]
            g = abs(m * P - k * T)
            if g > best_g:
                best_k, best_g = k, g
        out.append(
            {
                "event_type": et,
                "split_day": grp["day"].iloc[best_k - 1],
                "g_stat": best_g,
                "g_norm": best_g / (m * T) if m * T > 0 else 0.0,
                "n_days": m,
            }
        )
    if not out:
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "split_day": pd.Series(dtype="object"),
                "g_stat": pd.Series(dtype="int64"),
                "g_norm": pd.Series(dtype="float64"),
                "n_days": pd.Series(dtype="int64"),
            }
        )
    return pd.DataFrame(out).astype({"g_stat": "int64", "g_norm": "float64", "n_days": "int64"})


def events_transition_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-type Markov predictability: Shannon entropy of the next-type
    distribution given the current type, H_i = −Σ_j p(j|i)·ln p(j|i) —
    near 0 means the type deterministically chains into one successor
    (bot/funnel signature), ln(|types|) means maximal branching.  Built
    ON the transitions table: the user-keyed exchange of
    events_type_transitions is the only corpus-scale stage; the |types|²
    -bounded count table reduces to entropies in driver arithmetic with
    the expression spelled identically in the window-sum twin.

    Output (prev_type, n, n_successors, entropy)."""
    tr = events_type_transitions(sf_dir).to_pandas()  # |types|², bounded
    if not len(tr):
        return pd.DataFrame(
            {
                "prev_type": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "n_successors": pd.Series(dtype="int64"),
                "entropy": pd.Series(dtype="float64"),
            }
        )
    out = []
    for prev, grp in tr.groupby("prev_type", sort=True):
        n_i = int(grp["n"].sum())
        p = grp["n"].to_numpy(np.float64) / n_i
        out.append(
            {
                "prev_type": prev,
                "n": n_i,
                "n_successors": len(grp),
                "entropy": float(-(p * np.log(p)).sum()),
            }
        )
    return pd.DataFrame(out).astype(
        {"n": "int64", "n_successors": "int64", "entropy": "float64"}
    )


def events_user_gini(sf_dir: str) -> pd.DataFrame:
    """Engagement-inequality audit: the Gini coefficient of per-user event
    counts — 0 means uniform activity, → 1 means a few power users (or
    bots) generate everything.  Two bounded reductions after the one
    user-keyed exchange: per-user counts collapse to their
    count-of-counts histogram (bounded by √(2N) distinct activity
    levels), from which the grouped-data Gini identity runs in exact
    Python ints (c·nprev·v + v·c(c+1)//2 per tie block — the
    v_gini_ntok discipline, HUGEINT twin).

    Output one row: (n_users, n_events, gini)."""
    from hepdata_validator_ray.ops import bucketed_aggregate, sum_counts_combine
    from ray.data.aggregate import Count as _Count

    per_user = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])
        .groupby("user_id")
        .aggregate(_Count(alias_name="n"))
    )

    def coc_partial(t: pa.Table) -> pa.Table:
        v = t["n"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.Table.from_pydict(
            {"key": pa.array(uniq, pa.int64()), "cnt": pa.array(cnt, pa.int64())}
        )

    coc = (
        bucketed_aggregate(per_user, "key", coc_partial, sum_counts_combine("key"))
        .to_pandas()
        .sort_values("key")
    )  # |distinct activity levels|, bounded
    if not len(coc):
        return pd.DataFrame(
            [{"n_users": 0, "n_events": 0, "gini": 0.0}]
        ).astype({"n_users": "int64", "n_events": "int64", "gini": "float64"})
    s_iv = 0
    nprev = 0
    s_v = 0
    for v, cc in zip(coc["key"].tolist(), coc["cnt"].tolist()):
        s_iv += cc * nprev * v + v * cc * (cc + 1) // 2
        s_v += cc * v
        nprev += cc
    n = nprev
    gini = 2.0 * s_iv / (n * s_v) - (n + 1.0) / n if n * s_v > 0 else 0.0
    return pd.DataFrame(
        [{"n_users": n, "n_events": s_v, "gini": gini}]
    ).astype({"n_users": "int64", "n_events": "int64", "gini": "float64"})


def events_acf(sf_dir: str, max_lag: int = 7) -> pd.DataFrame:
    """Per-type autocorrelation of the GAP-FILLED daily-count series at
    lags 1..max_lag — the seasonality/burst detector (a weekly cycle
    lights up lag 7; near-zero everywhere means memoryless traffic; a
    slow decay means trends/regime shifts).  Sample ACF with the overall
    mean:

        r_L = Σ_{t≤m−L} (x_t−x̄)(x_{t+L}−x̄) / Σ_t (x_t−x̄)²

    Multiplying through by m² clears the rational mean, so both numerator
    and denominator are exact integers (Python ints — m²·Σx_t·x_{t+L}
    overflows int64 at the 10^12 tier; HUGEINT twin):

        num = m²·S_L − m·T·(A_L+B_L) + (m−L)·T²,   den = m²·Q − m·T²

    and acf = float(num)/float(den) mirrors DuckDB's separate
    HUGEINT→DOUBLE casts exactly.  Days are integer epoch days
    (ts::DATE), zero-filled over each type's own [min, max] span — a
    lag over observed-days-only would silently skip gaps.

    One |types|×|days|-bounded grouped-count exchange is the only
    corpus-scale stage; the per-type scan is driver arithmetic on the
    bounded table.  Constant series take the degenerate CASE (0.0);
    lags ≥ m emit no row.

    Output (event_type, lag, n_days, acf)."""
    from ray.data.aggregate import Count as _Count

    daily = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(pc.cast(pc.cast(t["ts"], pa.date32()), pa.int32()), pa.int64()),
                ],
                names=["event_type", "d"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "d"])
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )  # |types| × |days|, bounded
    out = []
    for et, grp in daily.groupby("event_type", sort=True):
        d = grp["d"].to_numpy(np.int64)
        md, xd = int(d.min()), int(d.max())
        series = np.zeros(xd - md + 1, dtype=np.int64)
        series[d - md] = grp["n"].to_numpy(np.int64)
        x = [int(v) for v in series]
        m = len(x)
        T = sum(x)
        Q = sum(v * v for v in x)
        den = m * m * Q - m * T * T
        for lag in range(1, min(max_lag, m - 1) + 1):
            s_l = sum(x[t] * x[t + lag] for t in range(m - lag))
            a_l = sum(x[: m - lag])
            b_l = sum(x[lag:])
            num = m * m * s_l - m * T * (a_l + b_l) + (m - lag) * T * T
            out.append(
                {
                    "event_type": et,
                    "lag": lag,
                    "n_days": m,
                    "acf": float(num) / float(den) if den != 0 else 0.0,
                }
            )
    if not out:
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "lag": pd.Series(dtype="int64"),
                "n_days": pd.Series(dtype="int64"),
                "acf": pd.Series(dtype="float64"),
            }
        )
    return pd.DataFrame(out).astype({"lag": "int64", "n_days": "int64", "acf": "float64"})


def events_scd2_history(sf_dir: str, num_buckets: int | None = None) -> "ray.data.Dataset":
    """SCD-type-2 history build: per user, collapse consecutive runs of
    the same event_type (under the strict (ts, event_id) total order)
    into validity segments — the dimension-table "current value with
    from/to timestamps" op every warehouse pipeline needs, and the
    run-length view of a user's behavioral phases.  A segment closes
    exactly when the NEXT event has a different type (NULL type is the
    '<NULL>' phase, a real value — it opens/closes segments like any
    other).

    Physical plan: users hash-bucket (the sessionize discipline — one
    user's history fits one bucket task, bucket count derived from input
    size); inside a bucket the segment assignment is one vectorized
    sort + shift + cumsum over ALL the bucket's users; per-segment
    first/last/count collapse via groupby.  Segment numbers restart per
    user (cumsum of change flags within user), matching the twin's
    windowed sum.  Output is corpus-scale and streams.

    Output (user_id, seg, event_type, n_events, ts_first, ts_last)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        et = df["event_type"].fillna("<NULL>")
        prev = et.groupby(df["user_id"]).shift()
        change = prev.isna() | (et != prev)
        df = df.assign(event_type=et, seg=change.groupby(df["user_id"]).cumsum().astype("int64"))
        out = df.groupby(["user_id", "seg", "event_type"], as_index=False, sort=False).agg(
            n_events=("event_id", "size"), ts_first=("ts", "min"), ts_last=("ts", "max")
        )
        out["n_events"] = out["n_events"].astype("int64")
        out["ts_first"] = out["ts_first"].dt.strftime("%Y-%m-%d %H:%M:%S")
        out["ts_last"] = out["ts_last"].dt.strftime("%Y-%m-%d %H:%M:%S")
        return out[["user_id", "seg", "event_type", "n_events", "ts_first", "ts_last"]]

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(ds, target_rows_per_bucket=500_000, lo=32)
    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(collapse, batch_format="pandas")
    )


def events_seasonal_error(sf_dir: str, period: int = 7) -> pd.DataFrame:
    """Seasonal-naive forecastability audit: per type, the error of the
    "this day looks like the same weekday last week" forecast
    x̂_t = x_{t−period} over the gap-filled daily series — a LOW MAE says
    the series is dominated by its weekly cycle (schedulable, cacheable);
    a high one says bursts rule.  total_abs_err = Σ|x_t − x_{t−P}| is an
    exact integer; mae divides it by the prediction count (identical
    spelling both engines).  Types spanning ≤ period days emit no row.

    Same bounded |types|×|days| exchange + driver arithmetic as
    events_acf (the daily-count discipline); the twin self-joins the
    gap-filled CTE at d+period.

    Output (event_type, n_pred, total_abs_err, mae)."""
    from ray.data.aggregate import Count as _Count

    daily = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(pc.cast(pc.cast(t["ts"], pa.date32()), pa.int32()), pa.int64()),
                ],
                names=["event_type", "d"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "d"])
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )  # |types| × |days|, bounded
    out = []
    for et, grp in daily.groupby("event_type", sort=True):
        d = grp["d"].to_numpy(np.int64)
        md, xd = int(d.min()), int(d.max())
        series = np.zeros(xd - md + 1, dtype=np.int64)
        series[d - md] = grp["n"].to_numpy(np.int64)
        m = len(series)
        if m <= period:
            continue
        err = np.abs(series[period:] - series[:-period])
        n_pred = m - period
        total = int(err.sum())
        out.append(
            {
                "event_type": et,
                "n_pred": n_pred,
                "total_abs_err": total,
                "mae": float(total) / float(n_pred),
            }
        )
    if not out:
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "n_pred": pd.Series(dtype="int64"),
                "total_abs_err": pd.Series(dtype="int64"),
                "mae": pd.Series(dtype="float64"),
            }
        )
    return pd.DataFrame(out).astype(
        {"n_pred": "int64", "total_abs_err": "int64", "mae": "float64"}
    )


def events_hill_tail(sf_dir: str, k_cap: int = 100) -> pd.DataFrame:
    """Heavy-tail audit: the Hill estimator of the per-user activity
    distribution's tail index, α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1)) over the
    top-k order statistics — α near 1 means an extreme power-user/bot
    tail (infinite-mean territory), large α a light tail.  k is the
    deterministic rule max(1, min(k_cap, n_users // 10)); needs the
    (k+1)-th largest activity to exist, else no row (mirrored by the
    twin's empty cross join).

    Order statistics come from the SAME count-of-counts histogram as the
    user Gini (one user-keyed exchange, then a √(2N)-bounded spectrum):
    walking the bounded histogram from the top replaces the twin's
    row_number sort — never a corpus-scale order-by.  The ln sum groups
    per level (cnt·ln(v/x_k1)); lsum = 0 exactly iff all top-k equal
    x_(k+1) (ln 1 = 0 is exact), the degenerate CASE on both engines.

    Output one row (n_users, k, x_k1, hill_alpha)."""
    from hepdata_validator_ray.ops import bucketed_aggregate, sum_counts_combine
    from ray.data.aggregate import Count as _Count

    per_user = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])
        .groupby("user_id")
        .aggregate(_Count(alias_name="n"))
    )

    def coc_partial(t: pa.Table) -> pa.Table:
        v = t["n"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.Table.from_pydict(
            {"key": pa.array(uniq, pa.int64()), "cnt": pa.array(cnt, pa.int64())}
        )

    coc = (
        bucketed_aggregate(per_user, "key", coc_partial, sum_counts_combine("key"))
        .to_pandas()
        .sort_values("key", ascending=False)
    )  # bounded spectrum, largest activity level first
    empty = pd.DataFrame(
        {
            "n_users": pd.Series(dtype="int64"),
            "k": pd.Series(dtype="int64"),
            "x_k1": pd.Series(dtype="int64"),
            "hill_alpha": pd.Series(dtype="float64"),
        }
    )
    if not len(coc):
        return empty
    vals = coc["key"].to_numpy(np.int64)
    cnts = coc["cnt"].to_numpy(np.int64)
    n_users = int(cnts.sum())
    k = max(1, min(k_cap, n_users // 10))
    if n_users < k + 1:
        return empty
    # walk the histogram: how many of each level fall inside the top-k,
    # and which level holds order statistic k+1
    cum = np.cumsum(cnts)
    idx_k1 = int(np.searchsorted(cum, k + 1))  # first level with cum ≥ k+1
    x_k1 = int(vals[idx_k1])
    lsum = 0.0
    taken = 0
    for v, c in zip(vals.tolist(), cnts.tolist()):
        take = min(c, k - taken)
        if take <= 0:
            break
        lsum += take * np.log(np.float64(v) / np.float64(x_k1))
        taken += take
    alpha = k / lsum if lsum > 0 else 0.0
    return pd.DataFrame(
        [{"n_users": n_users, "k": k, "x_k1": x_k1, "hill_alpha": alpha}]
    ).astype({"n_users": "int64", "k": "int64", "x_k1": "int64", "hill_alpha": "float64"})


def association_rules(
    sf_dir: str,
    k: int = 50,
    min_support: int = 2,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Market-basket association rules over (order, part) baskets: for the
    top-k part pairs by co-occurrence support, BOTH directed rules a→c
    with confidence = supp(pair)/supp(a) and lift = N·supp(pair)/
    (supp(a)·supp(c)) — lift > 1 is genuine affinity, ≈1 is popularity
    coincidence (the conf-vs-lift distinction is the whole point of the
    op).  Pair ranking is INTEGER (supp DESC, p1, p2): the float conf and
    lift are reported values, never the cutoff.

    ONE order-keyed exchange materializes basket-local facts — distinct
    within-order pairs (Σ|o|² grain), per-part distinct-order partials
    (negative key space −(part+2)) and the basket count (key −1) — so
    supports and N cost no extra corpus pass; the |parts|-bounded support
    table broadcasts via ray.put and attaches inside the pair-keyed count
    exchange, whose buckets emit top-k partials (a pair lives in one
    bucket).  min_support is mirrored in the twin's HAVING.

    Output (antecedent, consequent, supp_pair, supp_ante, supp_cons,
    confidence, lift) — 2k rows (both directions of k pairs)."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    line = ray.data.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        line, target_rows_per_bucket=500_000, lo=16
    )

    def op_rows(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o": t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "p": t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def basket_facts(df: pd.DataFrame) -> pd.DataFrame:
        df = (
            df.drop(columns=[BUCKET_COL])
            .drop_duplicates(["o", "p"])
            .sort_values(["o", "p"], kind="mergesort")
        )
        out = [pd.DataFrame({"pk": [np.int64(-1)], "cnt": [df["o"].nunique()]})]
        sup = df.groupby("p", as_index=False)["o"].size()
        out.append(
            pd.DataFrame(
                {
                    "pk": -(sup["p"].to_numpy(np.int64) + 2),
                    "cnt": sup["size"].to_numpy(np.int64),
                }
            )
        )
        from hepdata_validator_ray.pipelines.graph import _within_group_pairs

        fi, si = _within_group_pairs(df["o"].to_numpy(np.int64))
        if len(fi):
            p_arr = df["p"].to_numpy(np.int64)
            p1, p2 = p_arr[fi], p_arr[si]
            if int(p1.max()) >> 32 or int(p2.max()) >> 32:
                raise ValueError("association_rules packs part ids into 32-bit halves")
            pk = ((p1.astype(np.uint64) << np.uint64(32)) | p2.astype(np.uint64)).view(np.int64)
            out.append(pd.DataFrame({"pk": pk, "cnt": np.ones(len(pk), dtype=np.int64)}))
        return pd.concat(out, ignore_index=True)

    facts = (
        line.map_batches(op_rows, batch_format="pyarrow")
        .map_batches(lambda t: with_bucket(t, "o", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(basket_facts, batch_format="pandas")
    ).materialize()

    def _neg(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["pk"], 0))

    def _pos(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["pk"], 0))

    side = facts.map_batches(_neg, batch_format="pyarrow").to_pandas()  # |parts|-bounded
    n_baskets = int(side.loc[side["pk"] == -1, "cnt"].sum())
    items = side[side["pk"] < -1]
    sup_parts = (-(items["pk"].to_numpy(np.int64)) - 2).astype(np.int64)
    sup_tbl = pd.DataFrame({"p": sup_parts, "s": items["cnt"].to_numpy(np.int64)})
    sup_tbl = sup_tbl.groupby("p", as_index=False)["s"].sum()
    sup_ref = ray.put(
        (sup_tbl["p"].to_numpy(np.int64), sup_tbl["s"].to_numpy(np.int64), n_baskets)
    )

    _EMPTY = pd.DataFrame(
        {
            "antecedent": pd.Series(dtype="int64"),
            "consequent": pd.Series(dtype="int64"),
            "supp_pair": pd.Series(dtype="int64"),
            "supp_ante": pd.Series(dtype="int64"),
            "supp_cons": pd.Series(dtype="int64"),
            "confidence": pd.Series(dtype="float64"),
            "lift": pd.Series(dtype="float64"),
        }
    )

    def bucket_rules_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        g = df.groupby("pk", as_index=False)["cnt"].sum()
        g = g[g["cnt"] >= min_support]
        if not len(g):
            return _EMPTY
        upk = g["pk"].to_numpy(np.int64).view(np.uint64)
        p1 = (upk >> np.uint64(32)).astype(np.int64)
        p2 = (upk & np.uint64(0xFFFFFFFF)).astype(np.int64)
        sp = g["cnt"].to_numpy(np.int64)
        order = np.lexsort((p2, p1, -sp))[: k]
        p1, p2, sp = p1[order], p2[order], sp[order]
        keys, svals, nb_total = ray.get(sup_ref)
        s1 = svals[np.searchsorted(keys, p1)]
        s2 = svals[np.searchsorted(keys, p2)]
        rows = pd.DataFrame(
            {
                "antecedent": np.concatenate([p1, p2]),
                "consequent": np.concatenate([p2, p1]),
                "supp_pair": np.concatenate([sp, sp]),
                "supp_ante": np.concatenate([s1, s2]),
                "supp_cons": np.concatenate([s2, s1]),
            }
        )
        rows["confidence"] = rows["supp_pair"].to_numpy(np.float64) / rows["supp_ante"].to_numpy(np.int64)
        rows["lift"] = (rows["supp_pair"].to_numpy(np.float64) * nb_total) / (
            rows["supp_ante"].to_numpy(np.int64) * rows["supp_cons"].to_numpy(np.int64)
        )
        return rows

    cands = (
        facts.map_batches(_pos, batch_format="pyarrow")
        .map_batches(lambda t: with_bucket(t, "pk", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(bucket_rules_topk, batch_format="pandas")
        .to_pandas()
    )  # ≤ n_buckets × 2k rows — the bounded merge
    if not len(cands):
        return _EMPTY
    # driver re-applies the pair rank: order by (supp DESC, p1, p2) over
    # the canonical (p1 < p2) representative = rows where antecedent < consequent
    canon = cands[cands["antecedent"] < cands["consequent"]]
    canon = canon.sort_values(
        ["supp_pair", "antecedent", "consequent"], ascending=[False, True, True], kind="mergesort"
    ).head(k)
    def _canon_pk(a: np.ndarray, c: np.ndarray) -> np.ndarray:
        lo, hi = np.minimum(a, c), np.maximum(a, c)
        return ((lo.astype(np.uint64) << np.uint64(32)) | hi.astype(np.uint64)).view(np.int64)

    win = _canon_pk(canon["antecedent"].to_numpy(np.int64), canon["consequent"].to_numpy(np.int64))
    keep = np.isin(
        _canon_pk(cands["antecedent"].to_numpy(np.int64), cands["consequent"].to_numpy(np.int64)),
        win,
    )
    return cands[keep].reset_index(drop=True).astype(
        {
            "antecedent": "int64",
            "consequent": "int64",
            "supp_pair": "int64",
            "supp_ante": "int64",
            "supp_cons": "int64",
            "confidence": "float64",
            "lift": "float64",
        }
    )


def events_trend_mk(sf_dir: str) -> pd.DataFrame:
    """Mann–Kendall monotonic-trend test per event type over the
    gap-filled daily-count series: S = Σ_{i<j} sign(x_j − x_i) (exact
    integer; positive = rising, near 0 = trendless) and Kendall's
    tau_a = S / (m(m−1)/2) — the nonparametric "is this type growing"
    audit that outlives outliers (signs, not magnitudes).  Same bounded
    |types|×|days| exchange + driver arithmetic as events_acf; the twin
    self-joins the gap-filled CTE on a.d < b.d.  Single-day types emit
    no row (no pair exists).

    Output (event_type, n_days, s_stat, tau)."""
    from ray.data.aggregate import Count as _Count

    daily = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(pc.cast(pc.cast(t["ts"], pa.date32()), pa.int32()), pa.int64()),
                ],
                names=["event_type", "d"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "d"])
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )  # |types| × |days|, bounded
    out = []
    for et, grp in daily.groupby("event_type", sort=True):
        d = grp["d"].to_numpy(np.int64)
        md, xd = int(d.min()), int(d.max())
        x = np.zeros(xd - md + 1, dtype=np.int64)
        x[d - md] = grp["n"].to_numpy(np.int64)
        m = len(x)
        if m < 2:
            continue
        diff = np.sign(x[np.newaxis, :] - x[:, np.newaxis])  # m ≤ |days|: tiny
        s = int(np.triu(diff, 1).sum())
        out.append(
            {
                "event_type": et,
                "n_days": m,
                "s_stat": s,
                "tau": float(s) / float(m * (m - 1) // 2),
            }
        )
    if not out:
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "n_days": pd.Series(dtype="int64"),
                "s_stat": pd.Series(dtype="int64"),
                "tau": pd.Series(dtype="float64"),
            }
        )
    return pd.DataFrame(out).astype({"n_days": "int64", "s_stat": "int64", "tau": "float64"})


def top_users_per_type_with_ties(
    sf_dir: str, k: int = 3, num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Grouped top-k WITH TIES: per event type, every user whose event
    count reaches the k-th DISTINCT count level (dense_rank ≤ k) — the
    leaderboard semantics where "top 3" means top three SCORES, not three
    arbitrary rows off a tie.  Row-number top-k (top_parts_per_brand)
    truncates ties; this is the other contract, and the output size is
    data-dependent by design.

    Two exchanges: (type, user) counts collapse map-side then sum in one
    packed-key exchange; the bounded count table re-buckets BY TYPE so
    each type's level ranking is one in-bucket vectorized dense-rank
    (counts are collapsed — the bucket holds at most |users of type|
    rows, not events).  Output (event_type, user_id, n, rank) streams.

    Twin: dense_rank() window with the identical ≤ k predicate."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket
    from ray.data.aggregate import Count as _Count

    counts = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "user_id"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())), t["user_id"]],
                names=["event_type", "user_id"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "user_id"])
        .aggregate(_Count(alias_name="n"))
    )
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        counts, target_rows_per_bucket=500_000, lo=8
    )

    def dense_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        out = []
        for et, grp in df.groupby("event_type", sort=False):
            grp = grp.sort_values(["n", "user_id"], ascending=[False, True], kind="mergesort")
            n = grp["n"].to_numpy(np.int64)
            new_level = np.ones(len(n), dtype=bool)
            new_level[1:] = n[1:] != n[:-1]
            rank = np.cumsum(new_level)
            keep = rank <= k
            if keep.any():
                out.append(
                    pd.DataFrame(
                        {
                            "event_type": et,
                            "user_id": grp["user_id"].to_numpy()[keep],
                            "n": n[keep],
                            "rank": rank[keep].astype(np.int64),
                        }
                    )
                )
        if not out:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype="object"),
                    "user_id": pd.Series(dtype="object"),
                    "n": pd.Series(dtype="int64"),
                    "rank": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    return (
        counts.map_batches(lambda t: with_bucket(t, "event_type", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(dense_topk, batch_format="pandas")
    )


def events_rfm_segments(sf_dir: str) -> pd.DataFrame:
    """RFM segmentation — the classic engagement cube: per user compute
    Recency (epoch day of last event), Frequency (event count) and
    Monetary (Σ cents, floor(value·100+0.5), NULLs → 0), quartile each
    dimension under the pinned 1-based-ceil(q·n) disc-quantile rank rule
    (the snapshot_psi convention; bucket = #edges strictly below v, so
    ties share a bucket deterministically), and count users per
    (r, f, m) cell — ≤ 4³ output rows however large the corpus.

    Shape: ONE user-keyed exchange collapses events to the per-user
    triple (max/count/sum are associative — map-side partials); three
    histogram exchanges over that table bound the driver at |distinct
    recency days| + |distinct counts| + |distinct cent totals| rows.
    The first two are value-bounded (time span; √(2N) activity levels);
    the M histogram is |users|-worst-case — at the 10⁹-user tier the M
    edges would come from the docs_order_statistics distributed-selection
    primitive instead (documented scale path); the quartile rule is
    identical either way.

    Output (r_bucket, f_bucket, m_bucket, n_users)."""
    from hepdata_validator_ray.ops import bucketed_aggregate, sum_counts_combine

    def user_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_pandas(),
                "d": pc.cast(pc.cast(pc.cast(t["ts"], pa.date32()), pa.int32()), pa.int64()).to_pandas(),
                "cents": np.where(
                    pc.is_valid(t["value"]).to_numpy(zero_copy_only=False),
                    np.floor(t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5),
                    0.0,
                ).astype(np.int64),
            }
        )
        g = df.groupby("user_id", as_index=False).agg(
            r=("d", "max"), f=("d", "size"), m=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def user_combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("user_id", as_index=False).agg(r=("r", "max"), f=("f", "sum"), m=("m", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    users = bucketed_aggregate(
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts", "value"]),
        "user_id",
        user_partial,
        user_combine,
    ).materialize()

    def hist_of(col: str) -> pd.DataFrame:
        def partial(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            uniq, cnt = np.unique(v, return_counts=True)
            return pa.Table.from_pydict(
                {"key": pa.array(uniq, pa.int64()), "cnt": pa.array(cnt, pa.int64())}
            )

        return (
            bucketed_aggregate(users, "key", partial, sum_counts_combine("key"))
            .to_pandas()
            .sort_values("key")
        )

    def edges_of(hist: pd.DataFrame) -> np.ndarray:
        v = hist["key"].to_numpy(np.int64)
        c = hist["cnt"].to_numpy(np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)
        return np.array(
            [v[np.searchsorted(cum, max(int(np.ceil(q * n)), 1))] for q in (0.25, 0.5, 0.75)],
            dtype=np.int64,
        )

    hists = {c: hist_of(c) for c in ("r", "f", "m")}
    if not len(hists["r"]):
        return pd.DataFrame(
            {
                "r_bucket": pd.Series(dtype="int64"),
                "f_bucket": pd.Series(dtype="int64"),
                "m_bucket": pd.Series(dtype="int64"),
                "n_users": pd.Series(dtype="int64"),
            }
        )
    edges = {c: edges_of(h) for c, h in hists.items()}
    e_ref = ray.put(edges)

    def assign(t: pa.Table) -> pa.Table:
        e = ray.get(e_ref)
        df = pd.DataFrame({c: t[c].to_numpy(zero_copy_only=False).astype(np.int64) for c in ("r", "f", "m")})
        out = {}
        for c in ("r", "f", "m"):
            # bucket = #edges strictly below v (the snapshot_psi rule)
            out[f"{c}_bucket"] = (df[c].to_numpy()[:, None] > e[c][None, :]).sum(axis=1)
        g = pd.DataFrame(out).groupby(["r_bucket", "f_bucket", "m_bucket"], as_index=False).size()
        return pa.Table.from_pandas(g.rename(columns={"size": "n_users"}), preserve_index=False)

    parts = users.map_batches(assign, batch_format="pyarrow").to_pandas()  # ≤ 64 × blocks
    return (
        parts.groupby(["r_bucket", "f_bucket", "m_bucket"], as_index=False)["n_users"]
        .sum()
        .astype({"r_bucket": "int64", "f_bucket": "int64", "m_bucket": "int64", "n_users": "int64"})
    )


def events_value_cvar(sf_dir: str, tail: float = 0.05) -> pd.DataFrame:
    """Expected shortfall / CVaR of event values per type: the mean of the
    worst (largest) ``tail`` fraction of cent-quantized values — the
    tail-risk number a p99 alone understates (it averages EVERYTHING
    beyond the cut, so one monster event moves it).  k = ceil(tail·n)
    uses the raw double product on BOTH engines (the identical-expression
    discipline — 0.05·n is not exact in binary and must round the same
    way twice); the top-k sum is an exact integer off the per-type cents
    histogram (levels walked from the top, the boundary level contributing
    its partial count — order statistics of a multiset are tie-order-free,
    so the twin's row_number DESC sum matches exactly).

    One |types|×|distinct cents|-bounded exchange; NULL values drop
    (mirrored WHERE).  Output (event_type, n, k, tail_sum_cents,
    cvar_cents)."""
    from ray.data.aggregate import Count as _Count

    hist = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(
                        pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(100.0)), pa.scalar(0.5))),
                        pa.int64(),
                    ),
                ],
                names=["event_type", "c"],
            ).filter(pc.is_valid(t["value"])),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "c"])
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )  # |types| × |distinct cents|, bounded
    out = []
    for et, grp in hist.groupby("event_type", sort=True):
        grp = grp.sort_values("c", ascending=False, kind="mergesort")
        v = grp["c"].to_numpy(np.int64)
        cnt = grp["n"].to_numpy(np.int64)
        n = int(cnt.sum())
        k = int(np.ceil(tail * n))
        taken, s = 0, 0
        for vi, ci in zip(v.tolist(), cnt.tolist()):
            take = min(ci, k - taken)
            if take <= 0:
                break
            s += take * vi
            taken += take
        out.append(
            {
                "event_type": et,
                "n": n,
                "k": k,
                "tail_sum_cents": s,
                "cvar_cents": float(s) / float(k) if k else 0.0,
            }
        )
    if not out:
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "k": pd.Series(dtype="int64"),
                "tail_sum_cents": pd.Series(dtype="int64"),
                "cvar_cents": pd.Series(dtype="float64"),
            }
        )
    return pd.DataFrame(out).astype(
        {"n": "int64", "k": "int64", "tail_sum_cents": "int64", "cvar_cents": "float64"}
    )


def events_nearest_join(
    sf_dir: str,
    left_type: str = "error",
    right_type: str = "click",
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Nearest-in-TIME join: for every ``left_type`` event, the single
    ``right_type`` event of the same user minimizing (|Δt|, ts, event_id)
    — the both-directions cousin of the as-of join (an as-of only looks
    back; root-causing an error wants the click on EITHER side).  The
    tie rule is total and mirrored: equal |Δt| prefers the earlier
    event, equal ts the smaller event_id.

    Per user-bucket: right events collapse per (user, ts) to the min
    event_id (the within-ts winner under the rule), then TWO vectorized
    merge_asofs (backward + forward) race — backward wins ties because
    its Δt carries the smaller ts.  Left events with no right-side user
    match drop (inner semantics, mirrored).  dt_us = right − left in
    exact integer microseconds.

    Output (event_id, nearest_event_id, dt_us) — corpus-scale, streams."""
    from hepdata_validator_ray.ops import BUCKET_COL, derive_num_buckets, with_bucket

    def nearest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        a = df[df["event_type"] == left_type][["user_id", "event_id", "ts"]]
        b = df[df["event_type"] == right_type][["user_id", "event_id", "ts"]]
        empty = pd.DataFrame(
            {
                "event_id": pd.Series(dtype="int64"),
                "nearest_event_id": pd.Series(dtype="int64"),
                "dt_us": pd.Series(dtype="int64"),
            }
        )
        if not len(a) or not len(b):
            return empty
        # within-ts winner: the smallest event_id per (user, ts)
        b = (
            b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
            .drop_duplicates(["user_id", "ts"], keep="first")
            .sort_values(["ts", "user_id"], kind="mergesort")
        )
        a = a.sort_values(["ts", "user_id"], kind="mergesort")
        back = pd.merge_asof(
            a, b, on="ts", by="user_id", direction="backward", suffixes=("", "_b")
        )
        fwd = pd.merge_asof(
            a, b, on="ts", by="user_id", direction="forward", suffixes=("", "_f")
        )
        # unit-safe µs: pandas may hold datetime64[ns] OR [us] depending
        # on the parquet reader — normalize explicitly, never //1000
        t = a["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return _nearest_choose(a, b, back, fwd, t, empty)

    def _nearest_choose(a, b, back, fwd, t, empty):
        bmap = dict(
            zip(
                b["event_id"].to_numpy(np.int64),
                b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
            )
        )
        eb = back["event_id_b"].to_numpy()
        ef = fwd["event_id_f"].to_numpy()
        has_b = pd.notna(eb)
        has_f = pd.notna(ef)
        INF = np.int64(1) << np.int64(62)
        ts_b = np.array([bmap[int(x)] if ok else 0 for x, ok in zip(eb, has_b)], dtype=np.int64)
        ts_f = np.array([bmap[int(x)] if ok else 0 for x, ok in zip(ef, has_f)], dtype=np.int64)
        dt_b = np.where(has_b, t - ts_b, INF)
        dt_f = np.where(has_f, ts_f - t, INF)
        pick_b = has_b & (~has_f | (dt_b <= dt_f))
        any_match = has_b | has_f
        nid = np.where(pick_b, np.where(has_b, eb, 0), np.where(has_f, ef, 0))
        dt = np.where(pick_b, -dt_b, dt_f)
        out = pd.DataFrame(
            {
                "event_id": a["event_id"].to_numpy(np.int64),
                "nearest_event_id": nid,
                "dt_us": dt,
            }
        )[any_match]
        out["nearest_event_id"] = out["nearest_event_id"].astype("int64")
        out["dt_us"] = out["dt_us"].astype("int64")
        return out if len(out) else empty

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "event_id", "ts", "event_type"]
    )
    nb = num_buckets if num_buckets is not None else derive_num_buckets(
        ds, target_rows_per_bucket=500_000, lo=32
    )
    return (
        ds.map_batches(lambda t: with_bucket(t, "user_id", nb), batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(nearest, batch_format="pandas")
    )


def events_kruskal(sf_dir: str) -> pd.DataFrame:
    """Kruskal–Wallis H across event types over cent-quantized values —
    the nonparametric ANOVA: do the types draw from the same value
    distribution at all?  (The per-type moments can agree while ranks
    scream; H is the one-number gate before reading any per-type panel.)

        H = 3·Σ_i S_i²/n_i / (N(N+1)) − 3(N+1),   H_c = H / C,
        C = 1 − Σ_v (c_v³ − c_v)/(N³ − N)

    with S_i = Σ_v c_iv·(2·nprev_v + c_v + 1) the DOUBLED mid-rank sum —
    the AUC/Spearman integer identity, so every sum is exact (Python
    ints past int64; HUGEINT twin) and the two floats (H, H_c) are
    spelled identically.  All-equal values make C = 0 → degenerate CASE
    (H_c = 0.0, surfaced by n_levels = 1).

    One |types|×|distinct cents|-bounded exchange (shared shape with
    events_value_cvar); rank arithmetic is driver work on the bounded
    table.  Output one row (n, n_types, n_levels, h_stat, h_corrected)."""
    from ray.data.aggregate import Count as _Count

    hist = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(
                        pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(100.0)), pa.scalar(0.5))),
                        pa.int64(),
                    ),
                ],
                names=["event_type", "c"],
            ).filter(pc.is_valid(t["value"])),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "c"])
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )  # |types| × |distinct cents|, bounded
    empty = pd.DataFrame(
        {
            "n": pd.Series(dtype="int64"),
            "n_types": pd.Series(dtype="int64"),
            "n_levels": pd.Series(dtype="int64"),
            "h_stat": pd.Series(dtype="float64"),
            "h_corrected": pd.Series(dtype="float64"),
        }
    )
    if not len(hist):
        return empty
    lv = hist.groupby("c", as_index=False)["n"].sum().sort_values("c")
    vals = lv["c"].to_numpy(np.int64)
    c_v = lv["n"].to_numpy(np.int64)
    N = int(c_v.sum())
    nprev = np.concatenate([[0], np.cumsum(c_v)[:-1]])
    dmid = {int(v): 2 * int(p) + int(cc) + 1 for v, p, cc in zip(vals, nprev, c_v)}
    cmap = {int(v): int(cc) for v, cc in zip(vals, c_v)}
    s_sq_over_n = 0.0
    n_types = 0
    for et, grp in hist.groupby("event_type", sort=True):
        n_i = int(grp["n"].sum())
        s_i = sum(int(c) * dmid[int(v)] for v, c in zip(grp["c"], grp["n"]))  # exact int
        s_sq_over_n += (s_i * s_i) / n_i / 4.0
        n_types += 1
    h = 12.0 * s_sq_over_n / (N * (N + 1)) - 3.0 * (N + 1)
    ties = sum(int(cc) ** 3 - int(cc) for cc in c_v)  # exact int
    denom = N**3 - N
    # degenerate = STRUCTURAL integer test (ties == denom <=> one level),
    # never a float-zero comparison (the docs_length_scaling lesson)
    h_c = h / (1.0 - ties / denom) if denom and ties != denom else 0.0
    return pd.DataFrame(
        [
            {
                "n": N,
                "n_types": n_types,
                "n_levels": len(vals),
                "h_stat": h,
                "h_corrected": h_c,
            }
        ]
    ).astype({"n": "int64", "n_types": "int64", "n_levels": "int64"})


def events_user_features(sf_dir: str, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Per-user behavioral feature table — the feature-engineering
    precursor every downstream model (bot score, churn, segmentation)
    joins against: event count, distinct types, distinct active days,
    first/last epoch day, activity span, and the exact cents total
    (floor(value·100+0.5), NULLs → 0).  Everything here is associative,
    so map-side partials collapse per batch and ONE user-keyed exchange
    finishes each feature — distinct counts ride per-batch DISTINCT
    (type, day) sets that re-distinct in the bucket (a user's partials
    co-locate), never a corpus-scale set on the driver.

    Output (user_id, n_events, n_types, n_days, first_day, last_day,
    span_days, total_cents) — corpus-scale, streams."""
    from hepdata_validator_ray.ops import BUCKET_COL, bucketed_aggregate, derive_num_buckets

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_pandas(),
                "et": pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())).to_pandas(),
                "d": pc.cast(pc.cast(pc.cast(t["ts"], pa.date32()), pa.int32()), pa.int64()).to_pandas(),
                "cents": np.where(
                    pc.is_valid(t["value"]).to_numpy(zero_copy_only=False),
                    np.floor(t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5),
                    0.0,
                ).astype(np.int64),
            }
        )
        g = df.groupby("user_id").agg(
            n_events=("d", "size"), first_day=("d", "min"), last_day=("d", "max"),
            total_cents=("cents", "sum"),
        )
        types = df[["user_id", "et"]].drop_duplicates().groupby("user_id")["et"].agg(list)
        days = df[["user_id", "d"]].drop_duplicates().groupby("user_id")["d"].agg(list)
        g = g.assign(types=types, days=days).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        base = df.groupby("user_id", as_index=False).agg(
            n_events=("n_events", "sum"),
            first_day=("first_day", "min"),
            last_day=("last_day", "max"),
            total_cents=("total_cents", "sum"),
        )
        # vectorized distinct-of-partial-lists: explode + drop_duplicates
        nt = (
            df[["user_id", "types"]].explode("types").drop_duplicates()
            .groupby("user_id").size().rename("n_types")
        )
        ndv = (
            df[["user_id", "days"]].explode("days").drop_duplicates()
            .groupby("user_id").size().rename("n_days")
        )
        base = base.merge(nt, on="user_id").merge(ndv, on="user_id")
        base["span_days"] = base["last_day"] - base["first_day"]
        base = base[
            ["user_id", "n_events", "n_types", "n_days", "first_day", "last_day", "span_days", "total_cents"]
        ].astype(
            {
                "n_events": "int64", "n_types": "int64", "n_days": "int64",
                "first_day": "int64", "last_day": "int64", "span_days": "int64",
                "total_cents": "int64",
            }
        )
        return pa.Table.from_pandas(base, preserve_index=False)

    ds = ray.data.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "ts", "event_type", "value"]
    )
    return bucketed_aggregate(ds, "user_id", partial, combine, batch_size=32768)


def events_user_theil(sf_dir: str) -> pd.DataFrame:
    """Theil-T inequality of per-user event counts — the DECOMPOSABLE
    inequality measure (unlike Gini, Theil sums across subgroups, so
    per-source legs can later attribute the inequality): T = (1/n)·
    Σ (x/μ)·ln(x/μ), 0 = uniform, ln(n) = one user owns everything.
    Same one user-keyed exchange + √(2N)-bounded count-of-counts
    histogram as the Gini/Hill pair (completing the inequality panel);
    the per-level term c_v·(v·n/tot)·ln(v·n/tot)/n is spelled identically
    in the twin (ln of the same rational; uniform corpora hit ln 1 = 0
    EXACTLY on both engines, no epsilon).

    Output one row (n_users, n_events, theil)."""
    from hepdata_validator_ray.ops import bucketed_aggregate, sum_counts_combine
    from ray.data.aggregate import Count as _Count

    per_user = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])
        .groupby("user_id")
        .aggregate(_Count(alias_name="n"))
    )

    def coc_partial(t: pa.Table) -> pa.Table:
        v = t["n"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.Table.from_pydict(
            {"key": pa.array(uniq, pa.int64()), "cnt": pa.array(cnt, pa.int64())}
        )

    coc = bucketed_aggregate(per_user, "key", coc_partial, sum_counts_combine("key")).to_pandas()
    if not len(coc):
        return pd.DataFrame(
            [{"n_users": 0, "n_events": 0, "theil": 0.0}]
        ).astype({"n_users": "int64", "n_events": "int64"})
    v = coc["key"].to_numpy(np.int64)
    c = coc["cnt"].to_numpy(np.int64)
    n = int(c.sum())
    tot = int((v * c).sum())
    r = (v.astype(np.float64) * n) / tot  # x/μ per level, the shared rational
    theil = float((c * r * np.log(r)).sum() / n)
    return pd.DataFrame(
        [{"n_users": n, "n_events": tot, "theil": theil}]
    ).astype({"n_users": "int64", "n_events": "int64"})


def events_fano(sf_dir: str) -> pd.DataFrame:
    """Burstiness / dispersion per type: the Fano factor of the gap-filled
    daily-count series, VMR = population-variance / mean — 1 is Poisson
    (memoryless arrivals), ≫ 1 bursty, < 1 metronomic; the dispersion
    member of the daily panel (MK = direction, ACF = cycles, CUSUM =
    where, Fano = clumpiness).  m²-cleared arithmetic keeps both sides
    integer: vmr = (m·Q − T²) / (m·T) with Q = Σx², T = Σx (Python ints
    past int64; HUGEINT twin); all-empty... T = 0 types cannot occur
    (a type exists only via events), T > 0 always, so the division is
    total.  Same bounded |types|×|days| exchange + driver arithmetic.

    Output (event_type, n_days, mean_per_day, fano)."""
    from ray.data.aggregate import Count as _Count

    daily = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(pc.cast(pc.cast(t["ts"], pa.date32()), pa.int32()), pa.int64()),
                ],
                names=["event_type", "d"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "d"])
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )  # |types| × |days|, bounded
    out = []
    for et, grp in daily.groupby("event_type", sort=True):
        d = grp["d"].to_numpy(np.int64)
        md, xd = int(d.min()), int(d.max())
        x = np.zeros(xd - md + 1, dtype=np.int64)
        x[d - md] = grp["n"].to_numpy(np.int64)
        xs = [int(v) for v in x]
        m = len(xs)
        T = sum(xs)
        Q = sum(v * v for v in xs)
        out.append(
            {
                "event_type": et,
                "n_days": m,
                "mean_per_day": float(T) / float(m),
                "fano": float(m * Q - T * T) / float(m * T),
            }
        )
    if not out:
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "n_days": pd.Series(dtype="int64"),
                "mean_per_day": pd.Series(dtype="float64"),
                "fano": pd.Series(dtype="float64"),
            }
        )
    return pd.DataFrame(out).astype({"n_days": "int64"})


def events_drawdown(sf_dir: str) -> pd.DataFrame:
    """Worst-collapse audit: per type, the maximum drawdown of the
    gap-filled daily-count series — max over days of (running peak − that
    day's count), in exact integers (a traffic series that once did 500/day
    and now does 40 has drawdown 460 however it meanders back).  Also
    reports the running peak and the day the worst drawdown bottomed
    (earliest day on ties — the row_number rule).  Same bounded
    |types|×|days| exchange + driver scan as the rest of the daily panel;
    window-max twin.

    Output (event_type, n_days, peak, max_drawdown, trough_day)."""
    from ray.data.aggregate import Count as _Count

    daily = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(pc.cast(pc.cast(t["ts"], pa.date32()), pa.int32()), pa.int64()),
                ],
                names=["event_type", "d"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "d"])
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )  # |types| × |days|, bounded
    out = []
    for et, grp in daily.groupby("event_type", sort=True):
        d = grp["d"].to_numpy(np.int64)
        md, xd = int(d.min()), int(d.max())
        x = np.zeros(xd - md + 1, dtype=np.int64)
        x[d - md] = grp["n"].to_numpy(np.int64)
        peaks = np.maximum.accumulate(x)
        dd = peaks - x
        best = int(dd.argmax())  # earliest day on ties
        out.append(
            {
                "event_type": et,
                "n_days": len(x),
                "peak": int(peaks[-1]),
                "max_drawdown": int(dd[best]),
                "trough_day": md + best,
            }
        )
    if not out:
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "n_days": pd.Series(dtype="int64"),
                "peak": pd.Series(dtype="int64"),
                "max_drawdown": pd.Series(dtype="int64"),
                "trough_day": pd.Series(dtype="int64"),
            }
        )
    return pd.DataFrame(out).astype(
        {"n_days": "int64", "peak": "int64", "max_drawdown": "int64", "trough_day": "int64"}
    )


def events_peak_hour(sf_dir: str) -> pd.DataFrame:
    """Peak-hour concentration per type: the busiest hour-of-day, its
    event count, and its share of the type's traffic — the quick bot
    sniff (organic types peak near 1/12–1/8 of traffic; a cron-driven
    type parks ~everything in one hour).  Ties take the earliest hour
    (row_number rule).  Same |types|×24-bounded exchange as the hour
    profile; share is the only double, spelled identically.

    Output (event_type, n, peak_hour, peak_n, peak_share)."""
    from ray.data.aggregate import Count as _Count

    hist = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(pc.hour(t["ts"]), pa.int64()),
                ],
                names=["event_type", "hour"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "hour"])
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )  # |types| × 24, bounded
    out = []
    for et, grp in hist.groupby("event_type", sort=True):
        grp = grp.sort_values(["n", "hour"], ascending=[False, True], kind="mergesort")
        n = int(grp["n"].sum())
        out.append(
            {
                "event_type": et,
                "n": n,
                "peak_hour": int(grp["hour"].iloc[0]),
                "peak_n": int(grp["n"].iloc[0]),
                "peak_share": float(int(grp["n"].iloc[0])) / float(n),
            }
        )
    if not out:
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "peak_hour": pd.Series(dtype="int64"),
                "peak_n": pd.Series(dtype="int64"),
                "peak_share": pd.Series(dtype="float64"),
            }
        )
    return pd.DataFrame(out).astype(
        {"n": "int64", "peak_hour": "int64", "peak_n": "int64", "peak_share": "float64"}
    )


def events_mix_drift(sf_dir: str) -> pd.DataFrame:
    """Traffic-mix drift: split the corpus at the MEDIAN epoch day (the
    pinned 1-based-ceil(q·n) disc-quantile rule over the bounded day
    histogram == quantile_disc) and compare each type's share of early
    (d ≤ median) vs late traffic — the "did the mix rotate under us"
    audit that per-type changepoints can't see (every type can hold its
    own level while the MIX shifts).  Counts exact integers; the two
    shares and their delta are the only doubles, spelled identically.

    Derived entirely from the ONE |types|×|days|-bounded exchange the
    daily panel shares; the corpus is never re-read.

    Output (event_type, n_early, n_late, share_early, share_late,
    share_delta)."""
    from ray.data.aggregate import Count as _Count

    daily = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(pc.cast(pc.cast(t["ts"], pa.date32()), pa.int32()), pa.int64()),
                ],
                names=["event_type", "d"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "d"])
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )  # |types| × |days|, bounded
    empty = pd.DataFrame(
        {
            "event_type": pd.Series(dtype="object"),
            "n_early": pd.Series(dtype="int64"),
            "n_late": pd.Series(dtype="int64"),
            "share_early": pd.Series(dtype="float64"),
            "share_late": pd.Series(dtype="float64"),
            "share_delta": pd.Series(dtype="float64"),
        }
    )
    if not len(daily):
        return empty
    dh = daily.groupby("d", as_index=False)["n"].sum().sort_values("d")
    c = dh["n"].to_numpy(np.int64)
    n_total = int(c.sum())
    cum = np.cumsum(c)
    median_d = int(dh["d"].to_numpy(np.int64)[np.searchsorted(cum, max(int(np.ceil(0.5 * n_total)), 1))])
    early = daily[daily["d"] <= median_d].groupby("event_type")["n"].sum()
    late = daily[daily["d"] > median_d].groupby("event_type")["n"].sum()
    tot_e = int(early.sum())
    tot_l = int(late.sum())
    out = []
    for et in sorted(set(daily["event_type"])):
        ne = int(early.get(et, 0))
        nl = int(late.get(et, 0))
        se = ne / float(tot_e) if tot_e else 0.0
        sl = nl / float(tot_l) if tot_l else 0.0
        out.append(
            {
                "event_type": et,
                "n_early": ne,
                "n_late": nl,
                "share_early": se,
                "share_late": sl,
                "share_delta": sl - se,
            }
        )
    return pd.DataFrame(out).astype(
        {
            "n_early": "int64",
            "n_late": "int64",
            "share_early": "float64",
            "share_late": "float64",
            "share_delta": "float64",
        }
    )


def events_weekend_profile(sf_dir: str) -> pd.DataFrame:
    """Weekday/weekend split per type — the coarse seasonality summary
    (B2B types crater on weekends, consumer types spike; a flat split on
    a human-driven type is itself a bot flag).  Day-of-week comes from
    INTEGER epoch-day arithmetic, dow = (d + 4) % 7 with Sunday = 0
    (1970-01-01 was a Thursday) — mirrored literally in the twin, never
    locale-dependent day names.  Counts exact; weekend_share the only
    double.  Same bounded |types|×|days| exchange as the daily panel.

    Output (event_type, n_weekday, n_weekend, weekend_share)."""
    from ray.data.aggregate import Count as _Count

    daily = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(pc.cast(pc.cast(t["ts"], pa.date32()), pa.int32()), pa.int64()),
                ],
                names=["event_type", "d"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "d"])
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )  # |types| × |days|, bounded
    if not len(daily):
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "n_weekday": pd.Series(dtype="int64"),
                "n_weekend": pd.Series(dtype="int64"),
                "weekend_share": pd.Series(dtype="float64"),
            }
        )
    dow = (daily["d"].to_numpy(np.int64) + 4) % 7  # Sunday = 0
    is_we = (dow == 0) | (dow == 6)
    daily = daily.assign(we=np.where(is_we, daily["n"].to_numpy(np.int64), 0))
    g = daily.groupby("event_type", as_index=False).agg(n=("n", "sum"), n_weekend=("we", "sum"))
    g["n_weekday"] = g["n"] - g["n_weekend"]
    g["weekend_share"] = g["n_weekend"].to_numpy(np.int64) / g["n"].to_numpy(np.int64)
    return g[["event_type", "n_weekday", "n_weekend", "weekend_share"]].astype(
        {"n_weekday": "int64", "n_weekend": "int64", "weekend_share": "float64"}
    )


def events_iqr_outliers(sf_dir: str) -> pd.DataFrame:
    """Tukey-fence outlier census per type over cent-quantized values:
    Q1/Q3 under the pinned ceil(q·n) disc-quantile rule, fences at
    Q1 − 3·IQR / Q3 + 3·IQR computed in EXACT integers (the 1.5 classic
    doubles to 3 to keep the fence integral — mirrored literally), and
    the count outside either fence — the box-plot convention next to the
    MAD census (events_mad_outliers), which trims differently on skew.
    One |types|×|cents|-bounded exchange; all-integer output.

    Output (event_type, n, q1, q3, n_outliers)."""
    from ray.data.aggregate import Count as _Count

    hist = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(
                        pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(100.0)), pa.scalar(0.5))),
                        pa.int64(),
                    ),
                ],
                names=["event_type", "c"],
            ).filter(pc.is_valid(t["value"])),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "c"])
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )  # |types| × |distinct cents|, bounded
    out = []
    for et, grp in hist.groupby("event_type", sort=True):
        grp = grp.sort_values("c", kind="mergesort")
        v = grp["c"].to_numpy(np.int64)
        cnt = grp["n"].to_numpy(np.int64)
        n = int(cnt.sum())
        cum = np.cumsum(cnt)
        q1 = int(v[np.searchsorted(cum, max(int(np.ceil(0.25 * n)), 1))])
        q3 = int(v[np.searchsorted(cum, max(int(np.ceil(0.75 * n)), 1))])
        lo = q1 - 3 * (q3 - q1)
        hi = q3 + 3 * (q3 - q1)
        n_out = int(cnt[(v < lo) | (v > hi)].sum())
        out.append({"event_type": et, "n": n, "q1": q1, "q3": q3, "n_outliers": n_out})
    if not out:
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "q1": pd.Series(dtype="int64"),
                "q3": pd.Series(dtype="int64"),
                "n_outliers": pd.Series(dtype="int64"),
            }
        )
    return pd.DataFrame(out).astype(
        {"n": "int64", "q1": "int64", "q3": "int64", "n_outliers": "int64"}
    )


def events_repeat_rate(sf_dir: str) -> pd.DataFrame:
    """Same-day repeat rate per type: of all (user, day) pairs that
    touched the type, the fraction that fired MORE than once that day —
    the refresh-loop/retry tell (organic actions mostly happen once per
    user-day; a client bug or scraper repeats).  One packed-key exchange
    collapses (type, user, day) counts map-side (associative), a second
    tiny reduction per type counts pairs and repeat pairs; integers
    exact, the rate the only double.

    Output (event_type, n_pairs, n_repeat, repeat_rate)."""
    from ray.data.aggregate import Count as _Count

    triple = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts", "event_type"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())),
                    t["user_id"],
                    pc.cast(pc.cast(pc.cast(t["ts"], pa.date32()), pa.int32()), pa.int64()),
                ],
                names=["event_type", "user_id", "d"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "user_id", "d"])
        .aggregate(_Count(alias_name="n"))
    )

    def per_type(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "rep": (t["n"].to_numpy(zero_copy_only=False) > 1).astype(np.int64),
            }
        )
        g = df.groupby("event_type", as_index=False).agg(n_pairs=("rep", "size"), n_repeat=("rep", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = triple.map_batches(per_type, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "n_pairs": pd.Series(dtype="int64"),
                "n_repeat": pd.Series(dtype="int64"),
                "repeat_rate": pd.Series(dtype="float64"),
            }
        )
    g = parts.groupby("event_type", as_index=False).agg(n_pairs=("n_pairs", "sum"), n_repeat=("n_repeat", "sum"))
    g["repeat_rate"] = g["n_repeat"].to_numpy(np.int64) / g["n_pairs"].to_numpy(np.int64)
    return g.astype({"n_pairs": "int64", "n_repeat": "int64", "repeat_rate": "float64"})


def events_hour_entropy(sf_dir: str) -> pd.DataFrame:
    """Diurnal flatness per type: Shannon entropy of the hour-of-day
    distribution, plus its normalization by ln(n_active_hours) — the
    continuous companion of peak-share (peak-share reads the single
    busiest hour; entropy reads the whole profile: 1.0 = perfectly even
    across the hours the type uses at all, → 0 = one-hour cron).  The
    −Σ(n/N)ln(n/N) expression is spelled identically (the
    transition-entropy discipline); single-hour types take the
    degenerate CASE (norm_entropy 0).  Same |types|×24-bounded exchange
    as the hour profile.

    Output (event_type, n, n_hours, entropy, norm_entropy)."""
    from ray.data.aggregate import Count as _Count

    hist = (
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pc.coalesce(t["event_type"], pa.scalar("<NULL>", pa.string())),
                    pc.cast(pc.hour(t["ts"]), pa.int64()),
                ],
                names=["event_type", "hour"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["event_type", "hour"])
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )  # |types| × 24, bounded
    out = []
    for et, grp in hist.groupby("event_type", sort=True):
        n = int(grp["n"].sum())
        p = grp["n"].to_numpy(np.float64) / n
        # 0.0 − sum, NOT -(sum): a single-hour type's sum is +0.0 and bare
        # negation would emit −0.0 (the doc-entropy format hazard)
        h = float(0.0 - (p * np.log(p)).sum())
        k = len(grp)
        out.append(
            {
                "event_type": et,
                "n": n,
                "n_hours": k,
                "entropy": h,
                "norm_entropy": h / np.log(k) if k > 1 else 0.0,
            }
        )
    if not out:
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "n_hours": pd.Series(dtype="int64"),
                "entropy": pd.Series(dtype="float64"),
                "norm_entropy": pd.Series(dtype="float64"),
            }
        )
    return pd.DataFrame(out).astype(
        {"n": "int64", "n_hours": "int64", "entropy": "float64", "norm_entropy": "float64"}
    )
