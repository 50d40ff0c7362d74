package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ReplacingMergeTree(_version) + FINAL semantics, Spark-first.
  *
  * The reference replicates MySQL rows into ClickHouse tables declared
  * `ENGINE = ReplacingMergeTree(_version) ORDER BY (pk...)` and forces
  * `final = 1` on reads, so the *observable* table is "latest `_version`
  * per primary key, deletes physically removed"
  * (reference: clickhouse_api.py:17-27, 275, 303-366; db_replicator.py:202-211).
  *
  * Here the base storage is an append-only DataFrame carrying a `_version`
  * column (and optionally `_deleted` tombstones); FINAL is a derived view.
  *
  * Scale notes:
  *  - `max_by(struct(*), version)` plans as a hash aggregate with
  *    partial (map-side) combine, so the shuffle carries one row per key
  *    per input partition — strictly better than the window-function
  *    formulation (full shuffle + sort of every version).
  *  - The aggregate shuffles on the PK, which is exactly the partitioning
  *    a downstream PK join wants; Catalyst reuses it (no second shuffle).
  */
object FinalView {

  /** Latest row per key by `version` (deterministic total order required:
    * pass e.g. struct(ts, seq) to break ties).
    */
  def latestByKey(df: DataFrame, keys: Seq[String], version: Column): DataFrame = {
    val payloadCols = df.columns.filterNot(keys.contains).map(col)
    val packed = struct(payloadCols.toIndexedSeq: _*)
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(max_by(packed, version).as("_latest"))
      .select(keys.map(col) ++ df.columns.filterNot(keys.contains)
        .map(c => col(s"_latest.$c").as(c)): _*)
  }

  /** FINAL view over a versioned CDC log: latest version per key, with rows
    * whose latest image is a delete dropped (reference erase semantics,
    * clickhouse_api.py:368-400 — here tombstones are rows, not statements).
    *
    * @param isDelete predicate over the *latest* row marking it a
    *                  tombstone; NULL counts as "not deleted" — the
    *                  common CDC shape stamps the flag only on deletes,
    *                  and `!null` is null, which `filter` would drop
    *                  (losing every LIVE row, the exact opposite of the
    *                  documented contract)
    */
  def finalView(log: DataFrame, keys: Seq[String], version: Column,
                isDelete: Column): DataFrame =
    latestByKey(log, keys, version).filter(!coalesce(isDelete, lit(false)))

  /** Per-micro-batch last-write-wins collapse (reference A1: the realtime
    * buffer keeps one pending image per PK, later events overwrite —
    * db_replicator_realtime.py:123-177). Identical machinery to
    * `latestByKey`; named separately because it runs *inside* foreachBatch
    * before the sink write, shrinking update-heavy batches.
    */
  def lwwCollapse(batch: DataFrame, keys: Seq[String], seq: Column): DataFrame =
    latestByKey(batch, keys, seq)
}
