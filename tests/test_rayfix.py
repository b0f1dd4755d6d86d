"""Regression tests for the hash-shuffle schema-broadcast fix (rayfix.py).

Upstream Ray 2.49 drops the typed-empty-shard schema broadcast whenever
the first block submitted to a join input is empty
(hash_shuffle.py:223-225 short-circuit + :588-589 one-shot flag), so a
join whose side is all typed empty blocks crashes in finalize with
``No match for key field reference``.  These tests pin the deterministic
repro and the patched behavior.
"""
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray

import hepdata_validator_ray  # noqa: F401  (applies rayfix at import)
from hepdata_validator_ray import rayfix


def test_patch_applied():
    assert rayfix.apply() is True
    from ray.data._internal.execution.operators import hash_shuffle as hs

    assert getattr(hs, "_hvr_schema_fix", False) is True


def test_attach_points_raise_on_layout_drift():
    """A Ray upgrade that renames either hook point must raise, not
    silently no-op, so apply() takes the loud not-applied path."""

    class Drifted:  # simulates ray.data hash_shuffle after a rename
        pass

    with pytest.raises(AttributeError):
        rayfix._attach_points(Drifted())


def test_apply_warns_loudly_when_patch_cannot_attach(monkeypatch):
    """Failure to attach must emit a RuntimeWarning (visible by default),
    not just a log line — the documented guard against a silent Ray
    upgrade regressing empty-side joins."""
    from ray.data._internal.execution.operators import hash_shuffle as hs

    monkeypatch.setattr(rayfix, "_APPLIED", False)
    monkeypatch.delattr(hs, "_hvr_schema_fix")

    def boom(_hs):
        raise AttributeError("_shuffle_block gone (simulated Ray upgrade)")

    monkeypatch.setattr(rayfix, "_attach_points", boom)
    with pytest.warns(RuntimeWarning, match="NOT applied"):
        assert rayfix.apply() is False
    # monkeypatch teardown restores _hvr_schema_fix/_APPLIED, so the
    # already-installed patch stays active for the rest of the session
    # (pinned by test_patch_applied).


def test_join_all_typed_empty_side(ray_session):
    """Pre-patch this crashed reliably: the left side's blocks are all
    TYPED empty (a selective in-UDF filter), so no partition ever
    receives a left shard and finalize builds zero-column tables."""
    lo = pd.Timestamp("1990-01-01")
    hi = pd.Timestamp("1991-01-01")

    def filt(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi)),
        )
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    orders = ray.data.read_parquet(
        "/root/testdata/sf0.001/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(filt, batch_format="pyarrow")
    cust = ray.data.read_parquet(
        "/root/testdata/sf0.001/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    j = orders.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    ).materialize()
    assert j.count() == 0
    # the broadcast keeps the join output schema intact on empty results
    assert sorted(j.schema().names) == ["c_nationkey", "o_custkey", "o_orderkey"]


def test_join_nonempty_still_correct(ray_session):
    """The patch must not change non-empty join results."""
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()), "a": pa.array([10, 20, 30, 40], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 4, 5], pa.int64()), "b": pa.array([200, 400, 500], pa.int64())})
    )
    j = (
        left.join(right, join_type="inner", num_partitions=4, on=("k",))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(j["k"]) == [2, 4]
    assert list(j["a"]) == [20, 40]
    assert list(j["b"]) == [200, 400]


def test_hash_shuffle_finalize_yields_one_block_per_partition():
    """q21_blocked_suppliers (and every whole-block per-key vectorized
    pass) relies on Ray 2.49's hash-shuffle aggregator yielding the
    finalized partition as ONE block — the upstream source still carries
    the 'TODO break down blocks to target size' marker.  If a Ray upgrade
    implements that TODO, partition output may split mid-key and the
    batch_size=None colocation guarantee dies: this pin fails LOUDLY so
    the whole-block consumers get re-audited (the rayfix discipline)."""
    import inspect

    from ray.data._internal.execution.operators import hash_shuffle

    src = inspect.getsource(hash_shuffle.HashShuffleAggregator.finalize)
    assert "TODO break down blocks" in src and "yield block" in src, (
        "Ray's hash-shuffle finalize no longer yields one block per "
        "partition — re-audit q21_blocked_suppliers and any other "
        "batch_size=None whole-block consumer of join output"
    )


def test_empty_bundle_schema_warning_suppressed_real_drift_still_warns(ray_session):
    """VERDICT r4 #6 pin: a zero-row block in a typed stream (sentinel /
    fully-filtered batch) must NOT fire the 'different schema' warning —
    Ray drops the schema from empty RefBundles, so before the rayfix patch
    every sentinel union warned and latched the one-shot flag, masking any
    later REAL drift.  A genuinely divergent non-empty schema must still
    warn."""
    import logging

    import pyarrow as pa

    import ray.data

    # ray's data logger does not propagate to root, so caplog misses it —
    # attach a handler to the emitting logger directly
    logger = logging.getLogger("ray.data._internal.execution.streaming_executor_state")
    records: list = []

    class _Grab(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = _Grab(level=logging.WARNING)
    logger.addHandler(h)
    try:

        def typed(n):
            return ray.data.range(2).map_batches(
                lambda b, n=n: pa.table(
                    {"lang": pa.array(["en"] * n, pa.string()), "n": pa.array([1] * n, pa.int64())}
                ),
                batch_format="pyarrow",
            )

        typed(1).union(typed(0)).materialize()
        assert not any("different schema" in m for m in records)

        records.clear()

        def other(n):
            return ray.data.range(2).map_batches(
                lambda b, n=n: pa.table({"x": pa.array([1.0] * n, pa.float64())}),
                batch_format="pyarrow",
            )

        typed(1).union(other(1)).materialize()
        assert any("different schema" in m for m in records)
    finally:
        logger.removeHandler(h)
