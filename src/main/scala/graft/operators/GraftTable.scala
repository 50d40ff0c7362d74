package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A replicated target table: append-only parquet + `_version` +
  * `_deleted`, read through the FINAL dedup view.
  *
  * This is the Spark re-expression of the reference's
  * `ReplacingMergeTree(_version)` target (clickhouse_api.py:17-27,
  * 233-301): ClickHouse collapses versions at merge/FINAL time; here the
  * base files are immutable appends and the collapse is
  * `max_by(row, _version)` at read, with `compact()` playing the role of
  * the background merge / periodic OPTIMIZE (db_optimizer.py:57-113).
  *
  * Scale design:
  *  - writes are blind appends — no read-modify-write, so ingest
  *    parallelism is unbounded and replays are idempotent (same
  *    (key, version) collapses to one row);
  *  - deletes are tombstone rows, not rewrites (the reference issues
  *    `DELETE FROM` mutations, clickhouse_api.py:368-400 — equally
  *    deferred merges under the hood);
  *  - the FINAL aggregate shuffles on the PK — the same partitioning a
  *    downstream PK join reuses;
  *  - `compact()` bounds read amplification exactly like OPTIMIZE FINAL.
  */
final class GraftTable(
    spark: SparkSession,
    val root: String,
    val keys: Seq[String],
    val payloadSchema: StructType) {

  private val dataDir = s"$root/data"
  val metaCols: Seq[String] = Seq("_version", "_deleted")

  private def fs = new Path(root).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(dataDir))

  private def align(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    df.select(payloadSchema.fields.toIndexedSeq.map { f =>
      (if (present.contains(f.name)) col(f.name)
       else lit(null)).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Upsert a batch of row images at `version` (reference insert +
    * `_version` stamping, clickhouse_api.py:303-366). Caller is expected
    * to have LWW-collapsed the batch to one image per key. */
  def append(df: DataFrame, version: Long): Unit =
    align(df)
      .withColumn("_version", lit(version))
      .withColumn("_deleted", lit(false))
      .write.mode(SaveMode.Append).parquet(dataDir)

  /** Delete by key at `version`: tombstone rows with NULL payload
    * (reference erase, clickhouse_api.py:368-400). */
  def delete(keyDf: DataFrame, version: Long): Unit =
    align(keyDf.select(keys.map(col): _*))
      .withColumn("_version", lit(version))
      .withColumn("_deleted", lit(true))
      .write.mode(SaveMode.Append).parquet(dataDir)

  /** The raw versioned log (all appends + tombstones). */
  def log: DataFrame =
    if (exists) spark.read.schema(fullSchema).parquet(dataDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], fullSchema)

  private def fullSchema: StructType =
    StructType(payloadSchema.fields.toIndexedSeq ++ Seq(
      StructField("_version", LongType, nullable = false),
      StructField("_deleted", BooleanType, nullable = false)))

  /** FINAL view: latest version per key, tombstones dropped — what
    * `SELECT ... FINAL` returns in the reference (db_replicator.py:202-211). */
  def read: DataFrame =
    FinalView.finalView(log, keys,
      version = struct(col("_version"), col("_deleted")),
      isDelete = col("_deleted"))
      .select(payloadSchema.fieldNames.map(col).toIndexedSeq: _*)

  /** Max stamped version (reference version-counter consolidation,
    * clickhouse_api.py:444-467). -1 when empty. */
  def maxVersion: Long = {
    if (!exists) return -1L
    val r = log.agg(max(col("_version"))).head()
    if (r.isNullAt(0)) -1L else r.getLong(0)
  }

  /** OPTIMIZE analogue: materialize the FINAL view (keeping each
    * survivor's `_version`) and atomically swap the data directory.
    * Bounds read amplification after long append runs. */
  def compact(): Unit = {
    if (!exists) return
    val keep = FinalView.latestByKey(log, keys,
      struct(col("_version"), col("_deleted")))
      .filter(!col("_deleted"))
    val tmp = new Path(s"$root/.compact-${System.nanoTime()}")
    keep.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val data = new Path(dataDir)
    val old = new Path(s"$root/.old-${System.nanoTime()}")
    if (!fs.rename(data, old))
      throw new java.io.IOException(s"compact: cannot stage $dataDir")
    if (!fs.rename(tmp, data)) {
      fs.rename(old, data) // roll back
      throw new java.io.IOException(s"compact: cannot swap $dataDir")
    }
    fs.delete(old, true)
  }

  /** TRUNCATE: drop all data, keep the table (db_replicator_realtime.py:268-302). */
  def truncate(): Unit = fs.delete(new Path(dataDir), true)

  /** DROP TABLE. */
  def drop(): Unit = fs.delete(new Path(root), true)
}

object GraftTable {
  def apply(spark: SparkSession, root: String, keys: Seq[String],
            payloadSchema: StructType): GraftTable =
    new GraftTable(spark, root, keys, payloadSchema)
}
