"""Streaming CDC apply: exactly-once MERGE INTO the copy-on-write table.

The ingest shape the cow table's ledger exists for: a change stream
(op, key, row) lands via ``foreachBatch``, and each micro-batch is ONE
``sources.cowtable.merge_into`` call keyed by the micro-batch id. The
ledger makes replays no-ops, so the pipeline is exactly-once under the
two failure modes foreachBatch has:

- crash AFTER merge, BEFORE checkpoint commit -> Spark re-delivers the
  batch -> the ledger sees the batch id and skips (no double apply);
- crash mid-merge -> the manifest was never rewritten (manifest-last
  commit), the table still reads as the previous snapshot, and the
  re-delivered batch applies cleanly.

A micro-batch may carry several changes for one key (a row updated
twice within the trigger interval); ``merge_into`` deliberately rejects
duplicate keys, so the sink pre-collapses to last-wins by an explicit
``order_col`` (event time / LSN) — silent arbitrary-winner collapse is
how CDC pipelines corrupt tables.

Reference analog: none (the reference has no streaming surface); on
real Iceberg this is MERGE INTO inside foreachBatch with the same
batch-id dedup discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pdf_parser_spark.sources.cowtable import merge_into, read_manifest


def collapse_last_wins(changes: DataFrame, key_col: str, order_col: str,
                       op_col: str = "op") -> DataFrame:
    """One change per key: the row with the greatest ``order_col`` wins;
    exact order ties resolve by ``op_col`` descending ('upsert' beats
    'delete' — the safe default: a tie means the source emitted both at
    one timestamp, and resurrecting is recoverable while dropping is
    not). One per-key window, partitioned on the key — scales."""
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).desc(),
                                            F.col(op_col).desc())
    return (changes.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def merge_stream(changes: DataFrame, table_dir: str, checkpoint_dir: str,
                 *, order_col: str, op_col: str = "op",
                 available_now: bool = True, on_commit=None,
                 strategy: str = "cow"):
    """Start the CDC-apply query; returns the StreamingQuery.

    ``changes`` is a streaming DataFrame carrying every table column
    plus ``op_col`` ('upsert'|'delete') and ``order_col`` (event
    time/LSN used for last-wins collapse within a micro-batch).

    ``strategy='mor'`` applies each micro-batch as a merge-on-read
    commit (O(batch) write cost, no file rewrites — the right mode for
    high-frequency triggers; run ``compact_table`` periodically to
    purge the accumulated delete files).

    ``on_commit(spark, merge_stats)`` runs after EVERY merge attempt,
    including ledger-no-op replays — the hook that chains downstream
    incremental maintenance (e.g.
    sources/maintain.refresh_extracted_table) so derived tables follow
    the stream. Running on replays is what makes the retry path whole:
    if the hook fails (or the process dies) after the merge committed,
    Spark retries the trigger, the merge replays as a ledger no-op, and
    the hook MUST still run or the derived table stays stale forever.
    So the hook must be idempotent (the maintenance refresh is: its
    merge is ledgered under the reflected source version)."""
    key_col = read_manifest(table_dir)["key_col"]

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.limit(1).count():
            return                      # empty trigger: no new snapshot
        collapsed = collapse_last_wins(batch_df, key_col, order_col,
                                       op_col).drop(order_col)
        stats = merge_into(batch_df.sparkSession, table_dir, collapsed,
                           op_col=op_col, batch_id=int(batch_id),
                           strategy=strategy)
        if on_commit is not None:
            on_commit(batch_df.sparkSession, stats)

    w = (changes.writeStream.foreachBatch(apply)
         .option("checkpointLocation", checkpoint_dir))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
