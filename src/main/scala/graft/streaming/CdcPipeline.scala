package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.GraftConfig
import graft.ddl.{DdlOp, DdlParser, SchemaRegistry}
import graft.operators.{FinalView, GraftTable, RecordConversion}
import graft.sources.EventSpool

import scala.collection.mutable

/** The realtime replication loop, Spark-first.
  *
  * Reference shape (db_replicator_realtime.py): tail the durable event
  * queue → fold DML into a per-table LWW buffer → flush every 1 s /
  * 100k rows → DDL events force a flush barrier, then mutate schema
  * state. Exactly-once comes from replaying events ≥ the last-committed
  * transaction and idempotent versioned writes.
  *
  * Spark shape: Structured Streaming over the spool (checkpointed
  * offsets = the transaction bookkeeping), `foreachBatch` = the flush:
  *
  *  1. split the micro-batch at DDL boundaries (seq order) — the
  *     reference's flush-before-DDL barrier (db_replicator_realtime.py:183-196);
  *  2. per segment, per table: parse row JSON with the schema *as of that
  *     segment*, LWW-collapse per PK (A1), convert (X1-X12), then append
  *     images / tombstones stamped with a monotone version;
  *  3. apply the DDL to the SchemaRegistry + storage, then continue.
  *
  * Versions are `batchId << 20 | segment` — monotone across batches and
  * across DDL barriers within a batch; replayed batches restamp the same
  * versions, so the FINAL view makes redelivery idempotent (W1).
  */
final class CdcPipeline(
    spark: SparkSession,
    config: GraftConfig,
    registry: SchemaRegistry,
    warehouseDir: String) {

  private val tables = mutable.Map.empty[String, GraftTable]

  def table(name: String): GraftTable = tables.getOrElseUpdate(name, {
    val schema = registry(name)
    GraftTable(spark, s"$warehouseDir/$name", schema.primaryKeys,
      schema.toStructType)
  })

  /** Drop cached handle (schema changed / table dropped). */
  private def invalidate(name: String): Unit = tables.remove(name)

  def start(spoolDir: String, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    EventSpool.readStream(spark, spoolDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId)
      }
      .start()

  /** One flush. Public so batch tests / replays can drive it directly. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    // DDL events are rare and tiny — driver-side is the correct altitude
    // (they mutate driver-side schema state anyway).
    val ddls = batch.filter(col("op") === EventSpool.OpQuery)
      .select("seq", "db", "query").collect()
      .filter(r => r.isNullAt(1) || config.databaseMatches(r.getString(1)))
      .sortBy(_.getLong(0))

    val dml = batch.filter(col("op") =!= EventSpool.OpQuery).cache()
    try {
      var lo = Long.MinValue
      var segment = 0
      ddls.foreach { ddl =>
        val hi = ddl.getLong(0)
        flushSegment(dml.filter(col("seq") > lo && col("seq") < hi),
          version(batchId, segment))
        applyDdl(ddl.getString(2))
        lo = hi
        segment += 1
      }
      flushSegment(dml.filter(col("seq") > lo), version(batchId, segment))
    } finally dml.unpersist()
  }

  private def version(batchId: Long, segment: Int): Long =
    (batchId << 20) | segment.toLong

  private def flushSegment(dml: DataFrame, version: Long): Unit = {
    // one driver-side pass to learn which tables have traffic — bounded by
    // table count, not row count
    val active = dml.select("db", "table").distinct().collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .filter(r => config.databaseMatches(r.getString(0)) &&
        config.tableMatches(r.getString(1)))
    active.foreach { r =>
      val (db, tbl) = (r.getString(0), r.getString(1))
      val target = config.targetTable(db, tbl)
      if (registry.contains(target))
        flushTable(dml.filter(col("db") === db && col("table") === tbl),
          target, version)
    }
  }

  private def flushTable(events: DataFrame, target: String,
                         version: Long): Unit = {
    val schema = registry(target)
    val tbl = table(target)
    // wire schema: every field as string; RecordConversion casts/decodes.
    val wire = StructType(schema.fields.map(f =>
      org.apache.spark.sql.types.StructField(f.name,
        org.apache.spark.sql.types.StringType)))

    // A1: LWW per PK across the whole segment (insert-then-delete of the
    // same key must resolve to the *last* op, db_replicator_realtime.py:123-177):
    // parse first, then collapse on the typed PKs.
    val parsed = events
      .select(col("seq"), col("op"), from_json(col("row"), wire).as("r"))
      .select(Seq(col("seq"), col("op")) ++
        schema.fields.map(f => col(s"r.${f.name}").as(f.name)): _*)
    val collapsed = FinalView.latestByKey(parsed, schema.primaryKeys,
      struct(col("seq")))

    val adds = collapsed.filter(col("op") === EventSpool.OpAdd)
      .drop("seq", "op")
    val removes = collapsed.filter(col("op") === EventSpool.OpRemove)
      .select(schema.primaryKeys.map(col): _*)

    val converted = RecordConversion.convert(adds, schema, config.mysqlTimezone)
    if (!converted.isEmpty) tbl.append(converted, version)
    if (!removes.isEmpty) {
      // REMOVE payloads carry PKs only (converter.py:575-583); convert just
      // the key columns so typed keys match the stored images.
      val keySchema = schema.copy(fields =
        schema.fields.filter(f => schema.primaryKeys.contains(f.name)))
      tbl.delete(RecordConversion.convert(removes, keySchema,
        config.mysqlTimezone), version)
    }
  }

  private def applyDdl(sql: String): Unit = {
    val op = DdlParser.parse(sql, config.typesMapping)
    op match {
      case DdlOp.TruncateTable(_, t) =>
        val target = resolveTarget(t)
        if (registry.contains(target)) table(target).truncate()
      case DdlOp.DropTable(_, t, _) =>
        val target = resolveTarget(t)
        if (registry.contains(target)) { table(target).drop(); invalidate(target) }
      case DdlOp.RenameTable(renames) =>
        renames.foreach { case (from, to) =>
          if (registry.contains(from)) {
            val fs = new org.apache.hadoop.fs.Path(warehouseDir)
              .getFileSystem(spark.sparkContext.hadoopConfiguration)
            fs.rename(new org.apache.hadoop.fs.Path(s"$warehouseDir/$from"),
              new org.apache.hadoop.fs.Path(s"$warehouseDir/$to"))
            invalidate(from)
          }
        }
      case _ => ()
    }
    registry.applyDdl(op)
    // ALTER/CREATE change the schema → rebuild table handles lazily
    op match {
      case DdlOp.AlterTable(_, t, _) => invalidate(resolveTarget(t))
      case DdlOp.CreateTable(_, s) => invalidate(s.name)
      case _ => ()
    }
  }

  private def resolveTarget(t: String): String = t
}
