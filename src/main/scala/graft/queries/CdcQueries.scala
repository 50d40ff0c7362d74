package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.FinalView

/** The reference's CDC semantics expressed as queries over the `events`
  * fixture (event_id = binlog offset order, user_id = primary key):
  *
  *  - FINAL dedup view — ReplacingMergeTree(_version) + `final=1`
  *    (reference: clickhouse_api.py:275, db_replicator.py:202-211)
  *  - tombstone handling — physical deletes via erase()
  *    (reference: clickhouse_api.py:368-400)
  *  - last-write-wins collapse — the realtime insert buffer
  *    (reference: db_replicator_realtime.py:123-177)
  *  - `_version` stamping — per-table monotone counter
  *    (reference: clickhouse_api.py:303-366)
  *
  * All are formulated as `max_by` hash aggregates, not windows: partial
  * aggregation collapses each map partition to one row per key before the
  * shuffle, so at 100 TB the shuffle size is bounded by |keys|, not |rows|.
  */
object CdcQueries {

  // Exact nanosecond ordering (ts_ns long), matching the oracle's
  // `ORDER BY ts` over DuckDB's native ns timestamps.
  private val eventVersion = struct(col("ts_ns"), col("event_id"))

  val defs: Map[String, QueryFn] = Map(
    // A4: FINAL view — latest row per PK.
    "cdc_final_view" -> { (s, dir) =>
      FinalView.latestByKey(
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), col("ts"), col("ts_ns")),
        Seq("user_id"), eventVersion)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), tsSeconds(col("ts")).as("ts_s"))
        .orderBy("user_id")
    },

    // A4 + S9: FINAL view with tombstones dropped ('error' plays the
    // REMOVE_EVENT role: a key whose latest image is a delete vanishes).
    "cdc_tombstone_final" -> { (s, dir) =>
      FinalView.finalView(
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), col("ts_ns")),
        Seq("user_id"), eventVersion,
        isDelete = col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy("user_id")
    },

    // A1: per-(key, attribute) last-write-wins collapse.
    "cdc_lww_collapse" -> { (s, dir) =>
      FinalView.lwwCollapse(
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("value"),
            col("ts_ns"), col("event_id")),
        Seq("user_id", "event_type"), eventVersion)
        .select(col("user_id"), col("event_type"), col("value").as("last_value"))
        .orderBy("user_id", "event_type")
    },

    // S8: _version stamping — monotone per-key sequence in offset order.
    "cdc_version_stamp" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts_ns"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts_ns"))
        .withColumn("_version", row_number().over(w).cast("long"))
        .drop("ts_ns")
        .orderBy("user_id", "_version")
    },

    // A2/A3: consolidation aggregates — max version per key group (the
    // parallel-worker version merge) and lexicographic max over the PK
    // tuple (snapshot resume bookkeeping).
    "cdc_max_version" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(max(col("event_id")).as("max_event_id"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // S1/S3: deterministic worker sharding of a snapshot scan —
    // pmod(crc32(concat_ws('|', pk)), W) = w (reference mysql_api.py:124-133).
    // Spark's crc32 has no DuckDB twin, so the oracle checks shard *sizes*
    // via an expressible hash instead; the crc32 variant is asserted in
    // ScalaTest (sum of shard sizes == table size, shards disjoint).
    "cdc_shard_assign" -> { (s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          pmod(crc32(concat_ws("|", col("c_custkey"))), lit(4)).as("shard"))
        .groupBy("shard").agg(count(lit(1)).as("n"))
        .select(sum("n").as("total_rows"), count(lit(1)).as("n_shards"))
    }
  )

  val oracles: Map[String, String] = Map(
    "cdc_final_view" ->
      s"""SELECT user_id, event_id, event_type, value,
         |  ${sqlTsSeconds("ts")} AS ts_s
         |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
         |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "cdc_tombstone_final" ->
      """SELECT user_id, event_id, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,

    "cdc_lww_collapse" ->
      """SELECT user_id, event_type, value AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "cdc_version_stamp" ->
      """SELECT user_id, event_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS _version
        |FROM events ORDER BY user_id, _version""".stripMargin,

    "cdc_max_version" ->
      """SELECT event_type, MAX(event_id) AS max_event_id, COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "cdc_shard_assign" ->
      """SELECT CAST(SUM(n) AS BIGINT) AS total_rows, COUNT(*) AS n_shards
        |FROM (SELECT COUNT(*) AS n FROM customer GROUP BY c_custkey % 4)""".stripMargin
  )
}
