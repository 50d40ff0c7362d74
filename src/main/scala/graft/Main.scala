package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ddl.SchemaRegistry
import graft.sources.Snapshot
import graft.streaming.{CdcPipeline, LagMonitor, Replicator}

/** Config-driven bootstrap — the `main.py run_all` analogue (E1).
  *
  * {{{
  * spark-submit --class graft.Main graft.jar config.yaml <db> <warehouseDir> <checkpointDir>
  * }}}
  *
  * Reads the reference-shaped YAML, restores (or expects) the schema
  * registry state under `<warehouseDir>/_state/<db>.json`, optionally
  * runs the initial JDBC snapshot for every registered table
  * (`skip_initial_replication` / absent `mysql:` section skip it), then
  * tails the event spool (`binlog_replicator.data_dir`) with lag
  * monitoring attached and blocks. Process supervision / restart (W7)
  * belongs to the cluster manager, exactly as the reference's runner
  * belongs to its supervisor.
  */
object Main {

  /** Everything but the blocking wait — factored for tests. */
  def run(spark: SparkSession, config: GraftConfig, db: String,
          warehouseDir: String, checkpointDir: String)
      : (CdcPipeline, StreamingQuery, LagMonitor) = {
    val registry = new SchemaRegistry(db,
      Some(s"$warehouseDir/_state/$db.json"))
    val spoolDir = config.spoolDir.getOrElse(
      throw new IllegalArgumentException(
        "config: binlog_replicator.data_dir is required"))
    val snapshots: Map[String, DataFrame] = config.mysql match {
      case Some(conn) if !config.skipInitialReplication =>
        val workers =
          if (config.initialReplicationThreads > 0)
            config.initialReplicationThreads
          else spark.sparkContext.defaultParallelism
        registry.tableKeys.collect { case (d, t) if d == db =>
          t -> Snapshot.jdbc(spark, conn.jdbcUrl(db), t,
            registry(d, t).primaryKeys, workers, conn.properties)
        }.toMap
      case _ => Map.empty
    }
    val monitor = LagMonitor.attach(spark)
    val (pipeline, query) = Replicator.start(spark, config, registry,
      warehouseDir, spoolDir, checkpointDir, snapshots)
    (pipeline, query, monitor)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: graft.Main <config.yaml> <db> <warehouseDir> <checkpointDir>")
    val Array(cfgPath, db, warehouseDir, checkpointDir) = args
    val config = GraftConfig.load(cfgPath)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    val (_, query, _) = run(spark, config, db, warehouseDir, checkpointDir)
    query.awaitTermination()
  }
}
