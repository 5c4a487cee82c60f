"""In-process fix for a Ray 2.49 hash-shuffle schema-broadcast bug.

Ray's hash-shuffle operators (``Dataset.join``, hash aggregations)
broadcast each input side's SCHEMA to every partition aggregator by
fanning out empty schema-carrying shards with the FIRST shuffled block
(``hash_shuffle.py:584``, ``send_empty_blocks=should_broadcast_schemas``).
The driver marks the side as broadcast as soon as that first task is
SUBMITTED (``hash_shuffle.py:549``) — but the remote ``_shuffle_block``
early-returns on a 0-row block (``hash_shuffle.py:223-225``) BEFORE the
schema fan-out. Empty blocks are common: the sort-based aggregate
finalize emits zero-column empty pandas blocks for empty partitions,
and map stages pass them through untouched. When one of those is the
first block of a join side, schemas never reach the aggregators, every
partition that then receives no rows for that side builds a
SCHEMA-LESS empty table, and pyarrow's join raises

    ArrowInvalid: No match or multiple matches for key field reference
    FieldRef.Name(<key>) on <left|right> side of the join

(reproduced on a 3-row groupby+join; also with an explicitly empty
side). The fix is driver-side and minimal: feed blocks to the original
``_do_add_input_inner`` one at a time, and while submitting an EMPTY
block mask the has-broadcast flag as True (so the empty block is
submitted with ``send_empty_blocks=False`` — it early-returns
harmlessly either way) and restore it after, deferring the real schema
broadcast to the first NON-empty block. Broadcasting a 0-column
pandas-empty's "schema" would be just as wrong as not broadcasting,
which is why the task-side can't fix this alone.

Applied once at textproc join-module import (idempotent). Safe to drop
once upstream orders the early-return after the schema fan-out and
skips schema-less blocks for broadcasting.
"""

from __future__ import annotations

_applied = False


def apply() -> None:
    """Patch the shuffle driver + task sides (idempotent)."""
    global _applied
    if _applied:
        return

    import ray
    from ray.data._internal.execution.interfaces import RefBundle
    from ray.data._internal.execution.operators import hash_shuffle as _hs
    from ray.data._internal.execution.operators.hash_shuffle import (
        HashShufflingOperatorBase,
    )
    from ray.data.block import BlockAccessor, BlockExecStats, BlockType
    from ray.data._internal.table_block import TableBlockAccessor

    # --- driver side: defer the broadcast past empty blocks -------------
    orig_add = HashShufflingOperatorBase._do_add_input_inner

    def _do_add_input_inner(self, input_bundle, input_index: int):
        for block_ref, meta in zip(input_bundle.block_refs, input_bundle.metadata):
            sub = RefBundle(
                [(block_ref, meta)],
                schema=input_bundle.schema,
                owns_blocks=input_bundle.owns_blocks,
            )
            empty = meta.num_rows == 0  # None (unknown) counts as non-empty
            if empty and not self._has_schemas_broadcasted[input_index]:
                # An empty block can't be trusted to carry the side's
                # schema (sort-aggregate finalize emits ZERO-COLUMN
                # pandas empties): mask the flag so this submission
                # doesn't claim the broadcast, and let the task-side
                # patch below fan out the schema anyway if the block
                # turns out to be a schema-ful (arrow) empty.
                self._has_schemas_broadcasted[input_index] = True
                try:
                    orig_add(self, sub, input_index)
                finally:
                    self._has_schemas_broadcasted[input_index] = False
            else:
                orig_add(self, sub, input_index)

    _do_add_input_inner._brinkray_patch = True  # introspectable marker
    HashShufflingOperatorBase._do_add_input_inner = _do_add_input_inner

    # --- task side: schema-ful empty blocks still fan out schemas -------
    # (covers the genuinely-all-empty side, where deferring alone would
    # never broadcast; 0-column empties are skipped — broadcasting their
    # "schema" would poison the aggregators the same way)
    orig_shuffle = _hs._shuffle_block._function
    _empty_bcast_memo: set = set()  # (pool anchor actor id, input_index)

    def _shuffle_block_fixed(
        block,
        input_index,
        key_columns,
        pool,
        block_transformer=None,
        send_empty_blocks=False,
        override_partition_id=None,
    ):
        if block_transformer is not None:
            block = block_transformer(block)
        block = TableBlockAccessor.try_convert_block_type(
            block, block_type=BlockType.ARROW
        )
        if block.num_rows == 0 and block.schema.names:
            # fan out at most once per (shuffle side, worker process):
            # the memo key anchors on the pool's first aggregator actor,
            # which is stable across this shuffle's tasks
            memo_key = (
                pool.get_aggregator_for_partition(0)._actor_id.hex(),
                input_index,
            )
            if memo_key in _empty_bcast_memo:
                stats = BlockExecStats.builder()
                meta = BlockAccessor.for_block(block).get_metadata(
                    exec_stats=stats.build()
                )
                return (meta, {})
            _empty_bcast_memo.add(memo_key)
            stats = BlockExecStats.builder()
            shard_ref = ray.put(_hs._create_empty_table(block.schema))
            pending = [
                pool.get_aggregator_for_partition(pid).submit.remote(
                    input_index, pid, shard_ref
                )
                for pid in range(pool.num_partitions)
            ]
            while pending:
                _, pending = ray.wait(
                    pending, num_returns=len(pending), timeout=1
                )
            meta = BlockAccessor.for_block(block).get_metadata(
                exec_stats=stats.build()
            )
            return (meta, {})
        return orig_shuffle(
            block,
            input_index,
            key_columns,
            pool,
            block_transformer=None,
            send_empty_blocks=send_empty_blocks,
            override_partition_id=override_partition_id,
        )

    _hs._shuffle_block = ray.remote(_shuffle_block_fixed)
    _applied = True
