package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.GraftConfig
import graft.ddl.SchemaRegistry
import graft.sources.Snapshot

/** The reference's per-database run sequence (db_replicator.py:89-194):
  * initial bulk replication, then realtime binlog tailing — here an
  * optional snapshot phase landing version-0 rows on the exact warehouse
  * paths the realtime pipeline keeps appending to, then the spool
  * stream. `config.skipInitialReplication` skips the snapshot phase
  * (reference `initial_replication: false` — the target starts empty and
  * fills from the stream only).
  */
object Replicator {

  /** @param snapshots source-table name → bulk DataFrame (a
    *                  [[Snapshot.jdbc]] read in production, a fixture in
    *                  tests); only tables admitted by the config globs
    *                  and already registered are snapshotted.
    */
  def start(spark: SparkSession, config: GraftConfig,
            registry: SchemaRegistry, warehouseDir: String,
            spoolDir: String, checkpointDir: String,
            snapshots: Map[String, DataFrame] = Map.empty,
            trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : (CdcPipeline, StreamingQuery) = {
    val pipeline = new CdcPipeline(spark, config, registry, warehouseDir)
    if (!config.skipInitialReplication) {
      val fs = new org.apache.hadoop.fs.Path(warehouseDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      snapshots.foreach { case (tbl, df) =>
        // a completion marker makes restarts cheap and idempotent — the
        // reference persists per-table initial-replication status the
        // same way (db_replicator.py:213-281); without it every process
        // restart re-scans the source table and re-appends a full
        // version-0 image
        val marker = new org.apache.hadoop.fs.Path(
          s"$warehouseDir/_state/initial_done/${registry.defaultDb}.$tbl")
        if (config.tableMatches(tbl) && registry.contains(tbl) &&
            !fs.exists(marker)) {
          Snapshot.runAt(spark, df, registry(tbl),
            pipeline.tablePath(registry.defaultDb, tbl), config)
          Option(marker.getParent).foreach(fs.mkdirs)
          fs.create(marker, true).close()
        }
      }
    }
    (pipeline, pipeline.start(spoolDir, checkpointDir, trigger))
  }
}
