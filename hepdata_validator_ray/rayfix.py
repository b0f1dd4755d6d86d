"""Targeted runtime fixes for Ray Data 2.49 hash-shuffle schema broadcast.

Upstream bug (ray/data/_internal/execution/operators/hash_shuffle.py):

The hash-shuffle operator (native joins, hash aggregates) disseminates
schemas to aggregator partitions that receive no rows by fanning out
TYPED EMPTY shards — but only for the FIRST block submitted per input
sequence (``send_empty_blocks=should_broadcast_schemas``, flag set
unconditionally at hash_shuffle.py:588-589).  If that first block is
EMPTY, ``_shuffle_block`` short-circuits before fanning anything out
(hash_shuffle.py:223-225), the one-shot flag is consumed anyway, and
every partition that later receives no rows finalizes a ZERO-COLUMN
table — ``pa.Table.join`` then raises ``No match for key field
reference ... on left/right side of the join``.

Empty blocks are normal in a streaming pipeline: a fully-pruned
filtered read emits schemaless empty blocks, a selective map UDF emits
typed empty blocks, and an upstream join emits typed empty blocks for
its empty partitions.  Whether a join crashes therefore depends on the
RACE between the first non-empty block and any empty block reaching the
shuffle — reproducibly lost for empty-side joins (see
tests/test_feature_scaling.py empty-window tests).

Two surgical patches, applied idempotently at package import:

1. ``_shuffle_block``: an empty block that still carries a schema
   (>0 columns) and is asked to broadcast now fans out typed empty
   shards to every partition instead of short-circuiting.  Schemaless
   empty blocks (0 columns — nothing to broadcast) keep the original
   short-circuit.

2. ``HashShufflingOperatorBase._do_add_input_inner``: wrapped so the
   one-shot broadcast flag is RE-ARMED when the submitted bundle was
   all-empty — a schemaless empty first block no longer permanently
   consumes the broadcast; the first block that can actually carry a
   schema does.

Together with one matched sentinel row per join leg (see
``relational.q5_regional_revenue``) this makes native joins total on
empty inputs.  Scale note: re-broadcasts only happen while the stream
has produced nothing but empty blocks; once any non-empty block is
shuffled the flag latches exactly as upstream intended.
"""
from __future__ import annotations

import logging
import warnings

logger = logging.getLogger(__name__)

_APPLIED = False


def _attach_points(hs):
    """Resolve the Ray internals both patches hook. Raises AttributeError on
    Ray layout drift (e.g. an upgrade renames ``_shuffle_block``), which
    ``apply`` converts into the loud not-applied path."""
    shuffle_remote = hs._shuffle_block
    shuffle_fn = shuffle_remote._function  # python fn under the @ray.remote wrapper
    orig_add = hs.HashShufflingOperatorBase._do_add_input_inner
    return shuffle_remote, shuffle_fn, orig_add


def _warn_not_applied(exc: BaseException) -> None:
    """LOUD failure: a silent drop of this patch would regress empty-side
    native joins to the upstream submission-order race (crash in finalize
    with ``No match for key field reference``) — only the per-leg sentinel
    rows (see relational.q5_regional_revenue) would still cover the
    all-empty case.  Emit a RuntimeWarning (visible by default) on top of
    the log line so an unnoticed Ray upgrade fails the pinned
    test_patch_applied AND announces itself in any interactive run."""
    msg = (
        "rayfix: hash-shuffle schema-broadcast patch NOT applied "
        f"({type(exc).__name__}: {exc}). Empty-side native joins may crash "
        "with 'No match for key field reference' — Ray internals drifted "
        "(upgrade?); re-pin rayfix._attach_points against the new layout."
    )
    logger.error(msg)
    warnings.warn(msg, RuntimeWarning, stacklevel=3)


def apply() -> bool:
    """Install both patches (idempotent). Returns True if active; on
    failure warns LOUDLY (RuntimeWarning + error log) and returns False."""
    global _APPLIED
    if _APPLIED:
        return True
    try:
        import ray
        from ray.data._internal.arrow_block import ArrowBlockAccessor  # noqa: F401
        from ray.data._internal.execution.operators import hash_shuffle as _hs
        from ray.data.block import BlockAccessor, BlockExecStats, BlockType
        from ray.data._internal.table_block import TableBlockAccessor
    except Exception as exc:  # pragma: no cover - ray layout drift
        _warn_not_applied(exc)
        return False

    if getattr(_hs, "_hvr_schema_fix", False):
        _APPLIED = True
        return True

    try:
        _orig_shuffle_remote, _orig_shuffle_fn, _orig_add_probe = _attach_points(_hs)
    except Exception as exc:
        _warn_not_applied(exc)
        return False

    def _shuffle_block_fixed(
        block,
        input_index,
        key_columns,
        pool,
        block_transformer=None,
        send_empty_blocks=False,
        override_partition_id=None,
    ):
        stats = BlockExecStats.builder()
        # fast path: non-empty blocks go straight to the original (the
        # transformer must NOT run here — the original applies it, and
        # running it twice would tax every block of every shuffle)
        if BlockAccessor.for_block(block).num_rows() > 0:
            return _orig_shuffle_fn(
                block,
                input_index,
                key_columns,
                pool,
                block_transformer=block_transformer,
                send_empty_blocks=send_empty_blocks,
                override_partition_id=override_partition_id,
            )
        if block_transformer is not None:
            blk = block_transformer(block)
        else:
            blk = block
        blk = TableBlockAccessor.try_convert_block_type(blk, block_type=BlockType.ARROW)
        if blk.num_rows == 0 and blk.num_columns > 0 and send_empty_blocks:
            # the upstream short-circuit dropped the schema broadcast on
            # empty typed blocks; fan typed empty shards to EVERY
            # partition so no aggregator finalizes a zero-column table
            empty = blk.schema.empty_table()
            awaitables = []
            for pid in range(pool.num_partitions):
                agg = pool.get_aggregator_for_partition(pid)
                awaitables.append(agg.submit.remote(input_index, pid, ray.put(empty)))
            pending = awaitables
            while pending:
                _, pending = ray.wait(pending, num_returns=len(pending), timeout=1)
            meta = BlockAccessor.for_block(blk).get_metadata(exec_stats=stats.build())
            return (meta, {})
        return _orig_shuffle_fn(
            block,
            input_index,
            key_columns,
            pool,
            block_transformer=block_transformer,
            send_empty_blocks=send_empty_blocks,
            override_partition_id=override_partition_id,
        )

    _hs._shuffle_block = ray.remote(_shuffle_block_fixed)

    _orig_add = _orig_add_probe

    def _bundle_schemaless(bundle) -> bool:
        """True when the bundle provably carries no column schema — the only
        case patch 1 could NOT have fanned typed empty shards out.  An
        indeterminable schema re-arms too (a duplicate broadcast is a
        harmless redundant fan-out; a missed one is a finalize crash)."""
        s = getattr(bundle, "schema", None)
        if s is None:
            return True
        names = getattr(s, "names", None)
        if names is None:  # Ray Schema wrapper around an arrow schema
            names = getattr(getattr(s, "base_schema", None), "names", None)
        return names is None or len(names) == 0

    def _do_add_input_inner_fixed(self, input_bundle, input_index):
        before = self._has_schemas_broadcasted[input_index]
        _orig_add(self, input_bundle, input_index)
        if (
            not before
            # all blocks KNOWN empty (num_rows=None is unknown, not empty —
            # upstream submitted it as a potential schema carrier)
            and all(m.num_rows == 0 for m in input_bundle.metadata)
            # typed all-empty bundles already broadcast via patch 1; only a
            # schemaless bundle consumed the one-shot flag with nothing sent
            and _bundle_schemaless(input_bundle)
        ):
            self._has_schemas_broadcasted[input_index] = False

    _hs.HashShufflingOperatorBase._do_add_input_inner = _do_add_input_inner_fixed
    _hs._hvr_schema_fix = True
    _apply_schema_warning_fixes()
    _APPLIED = True
    return True


def _apply_schema_warning_fixes() -> None:
    """Two COSMETIC-but-load-bearing warning fixes (VERDICT r4 #6: constant
    false-positive schema warnings will mask a real drift one day).

    3. ``dedupe_schemas_with_validation``: Ray drops the schema from any
       ZERO-ROW RefBundle (``bundle.schema`` comes back empty even when the
       underlying Arrow table carries the stream's exact schema), so every
       sentinel/filtered-empty block fires "produced a RefBundle with a
       different schema".  An empty bundle in a typed stream is NOT
       divergence: stamp the stream schema on it and return
       ``diverged=False`` — which also keeps the one-shot warning ARMED for
       a genuine non-empty schema drift (upstream latches the warned flag
       on the first false positive and then never warns again).
    4. The "Failed to hash the schemas (for deduplication)" warning fires
       whenever an input parquet footer embeds pandas metadata (a dict →
       ``pa.Schema`` unhashable; the driver's testdata does).  The hash is
       only an early-exit optimization — the code falls through to the
       full unify — so the specific message is filtered, not the logger.

    Failure to install either is logged but does not disable the
    hash-shuffle patches above (different failure domain: noise, not
    correctness)."""
    try:
        from ray.data._internal.execution import streaming_executor_state as _ses
        from ray.data._internal.execution.interfaces import RefBundle as _RefBundle
        from ray.data.block import _is_empty_schema as _empty

        if not getattr(_ses, "_hvr_empty_bundle_fix", False):
            _orig_dedupe = _ses.dedupe_schemas_with_validation

            def _dedupe_fixed(old_schema, bundle, warn=True, enforce_schemas=False):
                if not _empty(old_schema) and _empty(getattr(bundle, "schema", None)):
                    return (
                        _RefBundle(
                            bundle.blocks,
                            schema=old_schema,
                            owns_blocks=bundle.owns_blocks,
                        ),
                        False,
                    )
                return _orig_dedupe(
                    old_schema, bundle, warn=warn, enforce_schemas=enforce_schemas
                )

            _ses.dedupe_schemas_with_validation = _dedupe_fixed
            _ses._hvr_empty_bundle_fix = True
    except Exception as exc:  # pragma: no cover - ray layout drift
        logger.warning("rayfix: empty-bundle schema patch not applied (%s)", exc)

    try:
        from ray.data._internal.arrow_ops import transform_pyarrow as _tp

        class _DropSchemaHashNoise(logging.Filter):
            def filter(self, record: logging.LogRecord) -> bool:
                return "Failed to hash the schemas" not in record.getMessage()

        lg = getattr(_tp, "logger", None) or logging.getLogger(_tp.__name__)
        if not any(isinstance(f, _DropSchemaHashNoise) for f in lg.filters):
            lg.addFilter(_DropSchemaHashNoise())
    except Exception as exc:  # pragma: no cover - ray layout drift
        logger.warning("rayfix: schema-hash warning filter not applied (%s)", exc)
