package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A column of a replicated table: `id` is the stable identity assigned
  * by the SchemaRegistry (survives CHANGE/RENAME COLUMN), `name`/`dataType`
  * are the *current* ones.
  */
final case class GraftColumn(id: Int, name: String, dataType: DataType,
                             nullable: Boolean = true) {
  def toStructField: StructField = StructField(name, dataType, nullable)
}

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
  * == Layout ==
  * {{{
  * root/meta/gen-N.json      // column (id,name,type) list per generation
  * root/meta/epoch           // pointer: which data epoch is current
  * root/data[-eE]/gen=N/[_bucket=K/]part-*.parquet
  * }}}
  *
  * **Data epochs** make compaction invisible to readers: `compact()`
  * writes the collapsed table into a NEW epoch directory, then swaps the
  * `meta/epoch` pointer (an atomic tmp-write + rename). Readers resolve
  * the pointer at plan time, so there is never a moment with no data
  * directory — the failure mode of swapping `data/` in place, where a
  * reader racing the two renames observed an empty table. The previous
  * epoch's files survive until the NEXT compaction, so any read planned
  * before the swap keeps its files for a full compaction interval
  * (the same grace contract as ClickHouse part GC after a merge).
  * Epoch 0 is plain `data/` — pre-epoch layouts read unchanged.
  *
  * **Schema generations** make CHANGE/RENAME COLUMN a metadata-only
  * operation (like ClickHouse `ALTER ... RENAME COLUMN`,
  * converter.py:1098-1189) instead of a 100 TB rewrite: files stay where
  * they are; each generation records the column names/types its files
  * were written with, and reads map every generation to the *current*
  * names via the stable column ids. Pure ADD COLUMN updates the current
  * generation in place (parquet null-fills missing columns by name);
  * rename / retype / drop start a new generation.
  *
  * **PK bucketing**: with a single integral primary key, files are
  * partitioned by `_bucket = floor(pk / 4294967)` — the reference's
  * `PARTITION BY intDiv(id, 4294967)` (clickhouse_api.py:249-251) — so
  * point lookups and PK-range scans prune partitions instead of scanning
  * 100 TB. `lookup()` plants the partition filter.
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
  *  - `compact()` bounds read amplification and collapses generations,
  *    exactly like OPTIMIZE FINAL merging parts.
  */
final class GraftTable(
    spark: SparkSession,
    val root: String,
    val keys: Seq[String],
    val columns: Seq[GraftColumn]) {

  private val metaDir = s"$root/meta"
  val metaCols: Seq[String] = Seq("_version", "_deleted")

  /** Per-table-root monitor serializing epoch allocation, pointer
    * swaps, and live writes between `compact()`, staged loads, and the
    * realtime flush path. Keyed in the companion so every handle on the
    * same table shares it — the deployment unit is one replicator
    * process per source (same as the reference), so a JVM monitor is
    * the right scope; cross-process coordination stays the operator's
    * job, as documented on compact. Keyed on the fs-QUALIFIED path:
    * `/wh/db/t`, `/wh/db/t/`, and `file:/wh/db/t` must share one
    * monitor, not silently three. */
  private val epochLock: Object = GraftTable.epochLockFor(
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(new Path(root)).toString)

  val payloadSchema: StructType = StructType(columns.map(_.toStructField))

  private def fs = new Path(root).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  // ------------------------------------------------------- PK bucketing

  /** Reference bucket width: intDiv(pk, 4294967), clickhouse_api.py:249. */
  private val BucketWidth = 4294967L

  private val bucketKey: Option[GraftColumn] = keys match {
    case Seq(k) => columns.find(c => c.name == k && (c.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }))
    case _ => None
  }

  private def bucketExpr(pk: Column): Column =
    floor(pk.cast(LongType) / BucketWidth).cast(IntegerType)

  // ------------------------------------------------------------- epochs

  private def epochPtrPath = new Path(s"$metaDir/epoch")
  private val EpochDirRe = """data-e(\d+)""".r

  private def epochDataDir(e: Int): String =
    if (e == 0) s"$root/data" else s"$root/data-e$e"

  private def listEpochs(): Seq[Int] = {
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).toSeq.map(_.getPath.getName).collect {
      case "data" => 0
      case EpochDirRe(n) => n.toInt
    }
  }

  /** Pointer read per operation (one tiny FS read, off any per-row path).
    * Missing pointer → the highest epoch dir present: the only ways the
    * pointer can be absent are a pre-epoch layout (only `data/`, epoch 0)
    * and a crash inside the swap's delete+rename window, where the new
    * epoch is already fully written — both resolve correctly. */
  private def currentEpoch: Int =
    if (fs.exists(epochPtrPath)) {
      val in = fs.open(epochPtrPath)
      (try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      finally in.close()).trim.toInt
    } else listEpochs().maxOption.getOrElse(0)

  private def writeEpochPtr(e: Int): Unit = {
    val tmp = new Path(s"$metaDir/.epoch.tmp")
    val out = fs.create(tmp, true)
    try out.write(e.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(epochPtrPath, false)
    if (!fs.rename(tmp, epochPtrPath))
      throw new java.io.IOException(s"cannot publish epoch $e")
  }

  // ------------------------------------------------------- staged loads

  /** Staged (atomic-publish) bulk loads — the epoch twin of the
    * reference's stage-in-a-temp-database-then-RENAME initial
    * replication (db_replicator_initial.py:149-162): shards land in an
    * UNPUBLISHED epoch dir, readers keep resolving the pinned current
    * epoch (empty for a fresh table, the pre-migration rows otherwise),
    * and [[publishStagedLoad]] flips the `meta/epoch` pointer once —
    * a mid-load reader sees nothing-or-everything, never a partial
    * table. `meta/staging` records the staging epoch so a crashed
    * multi-shard load resumes into the SAME dir (its completed shards'
    * files must stay where their markers say they are). */
  private def stagingMetaPath = new Path(s"$metaDir/staging")

  /** `meta/staging` content: line 1 the staging epoch, line 2 the live
    * table's max `_version` when the load began (the PUBLISH BASELINE —
    * rows stamped above it arrived after the load started and are
    * lifted into the staging epoch at publish so the pointer swap loses
    * nothing). A one-line legacy file parses with an infinite baseline:
    * publish then lifts nothing, the pre-baseline behavior. */
  private def stagingMeta(): Option[(Int, Long)] =
    if (!fs.exists(stagingMetaPath)) None
    else {
      val in = fs.open(stagingMetaPath)
      val txt = (try new String(
        org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      finally in.close()).trim
      val lines = txt.split("\n").map(_.trim)
      Some((lines(0).toInt,
        if (lines.length > 1) lines(1).toLong else Long.MaxValue))
    }

  /** The unpublished staging epoch of an interrupted load, if any. */
  def pendingStagedLoad(): Option[Int] = stagingMeta().map(_._1)

  /** Begin (or resume) a staged load; returns the staging epoch.
    * Holds the epoch lock so the reservation cannot race a concurrent
    * `compact()`'s own `max + 1` allocation — without it both can pick
    * the same number, and compact's Overwrite would clobber the staged
    * shards (then publish old data AS the load). */
  def beginStagedLoad(): Int = epochLock.synchronized {
    beginStagedLoadLocked()
  }

  private def beginStagedLoadLocked(): Int = pendingStagedLoad().getOrElse {
    // pin the pointer FIRST: with no pointer file, `currentEpoch` falls
    // back to the max epoch dir present — which would resolve to the
    // half-written staging dir the moment its first file lands
    writeEpochPtr(currentEpoch)
    val target = (listEpochs() :+ currentEpoch).max + 1
    // the publish baseline: rows the live table holds NOW predate the
    // load and are superseded by it; anything stamped above arrives
    // during the load and must survive the swap
    val baseline = maxVersion
    // tmp-write + rename, same crash contract as writeEpochPtr: a crash
    // mid-write would otherwise leave an empty meta/staging whose
    // parse throws on EVERY later pendingStagedLoad — bricking both
    // compaction and snapshot resume until manual cleanup
    val tmp = new Path(s"$metaDir/.staging.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$target\n$baseline".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(stagingMetaPath, false)
    if (!fs.rename(tmp, stagingMetaPath))
      throw new java.io.IOException(s"cannot reserve staging epoch $target")
    target
  }

  /** Abandon a pending staged load: delete the unpublished staging
    * epoch and its reservation. The operator recovery path for a load
    * whose driver is gone for good (crashed mid-snapshot, restarted
    * with the table out of the snapshot set): publishing would expose a
    * partial table, and leaving the reservation keeps the staged dir
    * and post-baseline tombstones pinned forever — abandoning loses
    * only unpublished (never-visible) shard data, which a re-run
    * re-reads from source. No-op when nothing is pending. The caller
    * must also clear the load's external shard markers, or a resumed
    * run would skip the "completed" shards of the abandoned epoch. */
  def abandonStagedLoad(): Unit = epochLock.synchronized {
    pendingStagedLoad().foreach { e =>
      fs.delete(new Path(epochDataDir(e)), true)
      fs.delete(stagingMetaPath, false)
    }
  }

  /** [[append]] into an unpublished staging epoch — invisible to every
    * reader until [[publishStagedLoad]]. */
  def appendStaged(df: DataFrame, version: Long, epoch: Int): Unit =
    writeBatch(df, version, deleted = false, epoch = Some(epoch))

  /** Atomically publish a staged load. Two steps under the epoch lock:
    *
    * 1. Lift the post-begin DELTA — every live-epoch row stamped above
    *    the baseline recorded at [[beginStagedLoad]] — into the staging
    *    epoch. These are realtime CDC appends/tombstones that landed
    *    while the load ran; without the lift the pointer swap would
    *    make them invisible and the next compact would delete them,
    *    with the stream checkpoint already past their events. Row-level
    *    (not file-level) so an intervening compact() — which folds
    *    delta rows into merged files but preserves their `_version` —
    *    cannot hide them. At scale the filter rides parquet `_version`
    *    row-group stats: pre-load files prune to footer reads.
    * 2. Swap the `meta/epoch` pointer; readers flip from the pinned old
    *    epoch to the complete load atomically.
    *
    * Idempotent — a crash between the lift and the staging-meta delete
    * re-runs both: the re-lifted rows are identical images at identical
    * versions, collapsed by the FINAL view and swept by compaction. The
    * epoch lock keeps all of it from interleaving with live writes and
    * with a concurrent compact's own pointer swap (which would
    * otherwise revert a just-published load to compacted PRE-load data
    * and garbage-collect the staged epoch a cycle later). */
  def publishStagedLoad(epoch: Int): Unit = epochLock.synchronized {
    // replay after a crash BETWEEN the pointer swap and the meta
    // delete: the pointer already names the staging epoch, so the lift
    // already ran — and `log` would now resolve to the published
    // staging epoch itself, making the lift a same-directory
    // read+append (file-listing-dependent). Skip straight to cleanup.
    val swapped = currentEpoch == epoch
    if (!swapped) {
      stagingMeta().foreach { case (e, baseline) =>
        if (e == epoch && baseline != Long.MaxValue && exists) {
          val delta = log.filter(col("_version") > baseline)
          if (!delta.isEmpty) writeStamped(delta, epoch)
        }
      }
      writeEpochPtr(epoch)
    }
    fs.delete(stagingMetaPath, false)
  }

  // ---------------------------------------------------------- meta/gens

  private case class Gen(n: Int, cols: Seq[GraftColumn])

  private def genMetaPath(n: Int) = new Path(s"$metaDir/gen-$n.json")
  private def genDataPath(e: Int, n: Int) = s"${epochDataDir(e)}/gen=$n"

  private def writeGenMeta(n: Int, cols: Seq[GraftColumn]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.createArrayNode()
    cols.foreach { c =>
      val o = mapper.createObjectNode()
      o.put("id", c.id)
      o.put("name", c.name)
      o.put("type", c.dataType.json)
      o.put("nullable", c.nullable)
      arr.add(o)
    }
    val out = fs.create(genMetaPath(n), true)
    try out.write(mapper.writeValueAsString(arr)
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readGenMeta(p: Path): Seq[GraftColumn] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val in = fs.open(p)
    val bytes =
      try org.apache.commons.io.IOUtils.toByteArray(in)
      finally in.close()
    import scala.jdk.CollectionConverters._
    mapper.readTree(bytes).elements().asScala.map { o =>
      GraftColumn(o.get("id").asInt(), o.get("name").asText(),
        DataType.fromJson(o.get("type").asText()),
        o.get("nullable").asBoolean())
    }.toSeq
  }

  private def listGens(): Seq[Gen] =
    if (!fs.exists(new Path(metaDir))) Nil
    else fs.listStatus(new Path(metaDir)).toSeq
      .map(_.getPath)
      .flatMap { p =>
        val m = """gen-(\d+)\.json""".r.findFirstMatchIn(p.getName)
        m.map(g => Gen(g.group(1).toInt, readGenMeta(p)))
      }
      .sortBy(_.n)

  private def sameCols(a: Seq[GraftColumn], b: Seq[GraftColumn]): Boolean =
    a.map(c => (c.id, c.name, c.dataType)).toSet ==
      b.map(c => (c.id, c.name, c.dataType)).toSet

  /** Reconcile stored generation metadata with this handle's (current)
    * columns: no meta yet → gen 0; pure column additions → update the
    * current generation in place; rename / retype / drop → start a new
    * generation (old files keep their names; reads re-alias by id). */
  private var gensCache: Seq[Gen] = null
  private def gens: Seq[Gen] = {
    if (gensCache == null) gensCache = reconcile()
    gensCache
  }

  private def reconcile(): Seq[Gen] = {
    val existing = listGens()
    if (existing.isEmpty) {
      writeGenMeta(0, columns)
      Seq(Gen(0, columns))
    } else {
      val cur = existing.last
      if (sameCols(cur.cols, columns)) existing
      else {
        val curById = cur.cols.map(c => c.id -> c).toMap
        val changed = columns.exists(c => curById.get(c.id)
          .exists(o => o.name != c.name || o.dataType != c.dataType))
        val dropped = cur.cols.exists(c => !columns.exists(_.id == c.id))
        if (changed || dropped) {
          val n = cur.n + 1
          writeGenMeta(n, columns)
          existing :+ Gen(n, columns)
        } else { // pure addition
          writeGenMeta(cur.n, columns)
          existing.init :+ Gen(cur.n, columns)
        }
      }
    }
  }

  def exists: Boolean = fs.exists(new Path(epochDataDir(currentEpoch)))

  private def align(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    df.select(columns.toIndexedSeq.map { c =>
      (if (present.contains(c.name)) col(c.name)
       else lit(null)).cast(c.dataType).as(c.name)
    }: _*)
  }

  private def currentGen: Int = gens.last.n

  private def writeBatch(df: DataFrame, version: Long, deleted: Boolean,
                         epoch: Option[Int] = None): Unit =
    epoch match {
      case Some(e) => writeBatchTo(df, version, deleted, e)
      case None =>
        // LIVE write: epoch resolution and the parquet commit are atomic
        // under the table's epoch lock, so a concurrent
        // publishStagedLoad either sees this batch's committed files
        // when it lifts the post-begin delta into the staging epoch, or
        // this write blocks and then lands in the published epoch —
        // never the lost-in-a-doomed-epoch middle. Holding a monitor
        // across a Spark action serializes only same-table writers,
        // which are already serial in the pipeline (flush futures are
        // one-per-table); staged shard appends go to a different
        // directory and take no lock.
        epochLock.synchronized {
          writeBatchTo(df, version, deleted, currentEpoch)
        }
    }

  private def writeBatchTo(df: DataFrame, version: Long, deleted: Boolean,
                           epoch: Int): Unit =
    writeStamped(align(df)
      .withColumn("_version", lit(version))
      .withColumn("_deleted", lit(deleted)), epoch)

  /** Write an already-stamped frame (payload + `_version` + `_deleted`,
    * possibly heterogeneous per row — the staged-publish delta) with the
    * standard bucket+salt co-location. */
  private def writeStamped(stamped: DataFrame, epoch: Int): Unit = {
    val w = bucketKey match {
      case Some(k) =>
        // co-locate rows by (bucket, salt) before the partitioned write:
        // without it every write task opens a file per bucket it sees —
        // tasks × buckets small files per batch, which the FINAL scan
        // then pays for file-by-file. The salt keeps a hot bucket from
        // collapsing into one writer task; files per batch ≈ buckets ×
        // salt, independent of input parallelism. The shuffle moves the
        // already-collapsed batch once — bounded by |keys|, not |events|.
        // sortWithinPartitions(pk): parquet row-group min/max stats on
        // the PK become tight disjoint ranges instead of whole-bucket
        // spans, so a point lookup's pushed pk predicate skips row
        // groups INSIDE the bucket file too — a per-partition sort of
        // the already-collapsed batch, no extra shuffle.
        stamped.withColumn("_bucket", bucketExpr(col(k.name)))
          .repartition(col("_bucket"), pmod(hash(col(k.name)), lit(4)))
          .sortWithinPartitions(col(k.name))
          .write.partitionBy("_bucket")
      case None => stamped.write
    }
    w.mode(SaveMode.Append)
      .parquet(genDataPath(epoch, currentGen))
  }

  /** Upsert a batch of row images at `version` (reference insert +
    * `_version` stamping, clickhouse_api.py:303-366). Caller is expected
    * to have LWW-collapsed the batch to one image per key. */
  def append(df: DataFrame, version: Long): Unit =
    writeBatch(df, version, deleted = false)

  /** Delete by key at `version`: tombstone rows with NULL payload
    * (reference erase, clickhouse_api.py:368-400). */
  def delete(keyDf: DataFrame, version: Long): Unit =
    writeBatch(keyDf.select(keys.map(col): _*), version, deleted = true)

  private def metaFields: Seq[StructField] = Seq(
    StructField("_version", LongType, nullable = false),
    StructField("_deleted", BooleanType, nullable = false))

  private def emptyLog: DataFrame = {
    val full = StructType((payloadSchema.fields ++ metaFields).toIndexedSeq)
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
  }

  /** The raw versioned log (all appends + tombstones), every generation
    * re-aliased to the current column names/types via the stable ids. */
  def log: DataFrame = {
    val e = currentEpoch
    val parts = gens.flatMap { g =>
      val p = genDataPath(e, g.n)
      if (!fs.exists(new Path(p))) None
      else {
        val genStruct = StructType((g.cols.map(_.toStructField) ++ metaFields).toIndexedSeq)
        val raw = spark.read.schema(genStruct).parquet(p)
        val byId = g.cols.map(c => c.id -> c).toMap
        val sel = columns.map { c =>
          byId.get(c.id) match {
            case Some(o) => col(o.name).cast(c.dataType).as(c.name)
            case None => lit(null).cast(c.dataType).as(c.name)
          }
        } ++ metaCols.map(col)
        Some(raw.select(sel.toIndexedSeq: _*))
      }
    }
    if (parts.isEmpty) emptyLog
    else parts.reduce(_ unionByName _)
  }

  /** FINAL view: latest version per key, tombstones dropped — what
    * `SELECT ... FINAL` returns in the reference (db_replicator.py:202-211). */
  def read: DataFrame =
    FinalView.finalView(log, keys,
      version = struct(col("_version"), col("_deleted")),
      isDelete = col("_deleted"))
      .select(payloadSchema.fieldNames.map(col).toIndexedSeq: _*)

  /** Time-travel FINAL view: the table as it stood when `maxVersion`
    * was the newest committed version. ClickHouse offers nothing like
    * it, but the versioned log records every image anyway — the filter
    * sits UNDER the dedup aggregate, so parquet row-group min/max stats
    * on `_version` skip newer files instead of aggregating and
    * discarding them (on a compacted table, history older than the last
    * OPTIMIZE is gone — same contract as ReplacingMergeTree merges). */
  def readAsOf(maxVersion: Long): DataFrame =
    FinalView.finalView(log.filter(col("_version") <= maxVersion), keys,
      version = struct(col("_version"), col("_deleted")),
      isDelete = col("_deleted"))
      .select(payloadSchema.fieldNames.map(col).toIndexedSeq: _*)

  /** Point lookup through the FINAL view with partition pruning: the
    * `_bucket` predicate is planted *under* the dedup aggregate, so only
    * the key's bucket directory is scanned (at 100 TB: one partition, not
    * the table). */
  def lookup(keyValue: Any): DataFrame = {
    val pk = keys.head
    val pruned = bucketKey match {
      case Some(k) =>
        // recompute the file-side bucket from the literal
        val b = math.floorDiv(keyValue.toString.toLong, BucketWidth).toInt
        logPruned(b).filter(col(pk) === lit(keyValue))
      case None => log.filter(col(pk) === lit(keyValue))
    }
    FinalView.finalView(pruned, keys,
      version = struct(col("_version"), col("_deleted")),
      isDelete = col("_deleted"))
      .select(payloadSchema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Like [[log]] but reading only one `_bucket` partition per gen.
    * A generation written before the PK became integral (e.g. MODIFY
    * varchar → int) has no `_bucket=` dirs at all — those fall back to
    * scanning the whole generation (the caller's key predicate still
    * applies); only a *bucketed* generation missing this particular
    * bucket dir is provably empty for the key and skipped. */
  /** Bucketed-ness per generation, memoized: whether a gen's data dir
    * has `_bucket=` subdirs is immutable once files exist, and probing
    * it per lookup would put a listing RPC on the point-read hot path.
    * Only positive answers are cached (an absent dir may appear later). */
  private val bucketedGen =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), java.lang.Boolean]
  private def isBucketed(e: Int, n: Int): Boolean = {
    val cached = bucketedGen.get((e, n))
    if (cached != null) cached.booleanValue()
    else {
      val genDir = new Path(genDataPath(e, n))
      if (!fs.exists(genDir)) false
      else {
        val b = fs.listStatus(genDir)
          .exists(_.getPath.getName.startsWith("_bucket="))
        // cache ONLY positive answers: a probe racing the generation's
        // first write (dir holds just _temporary/) must not pin "not
        // bucketed" — that would disable pruning for the handle's life
        if (b) bucketedGen.put((e, n), b)
        b
      }
    }
  }

  private def logPruned(bucket: Int): DataFrame = {
    val e = currentEpoch
    val parts = gens.flatMap { g =>
      val bucketed = isBucketed(e, g.n)
      val p = if (bucketed) s"${genDataPath(e, g.n)}/_bucket=$bucket"
              else genDataPath(e, g.n)
      if (!fs.exists(new Path(p))) None
      else {
        val genStruct = StructType((g.cols.map(_.toStructField) ++ metaFields).toIndexedSeq)
        val raw = spark.read.schema(genStruct).parquet(p)
        val byId = g.cols.map(c => c.id -> c).toMap
        val sel = columns.map { c =>
          byId.get(c.id) match {
            case Some(o) => col(o.name).cast(c.dataType).as(c.name)
            case None => lit(null).cast(c.dataType).as(c.name)
          }
        } ++ metaCols.map(col)
        Some(raw.select(sel.toIndexedSeq: _*))
      }
    }
    if (parts.isEmpty) emptyLog else parts.reduce(_ unionByName _)
  }

  /** One metadata-only recursive walk over the current epoch's parquet
    * files — shared by the two derived signals below. */
  private def foreachDataFile(
      f: org.apache.hadoop.fs.LocatedFileStatus => Unit): Unit = {
    val e = currentEpoch
    gens.foreach { g =>
      val p = new Path(genDataPath(e, g.n))
      if (fs.exists(p)) {
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val s = it.next()
          if (s.getPath.getName.endsWith(".parquet")) f(s)
        }
      }
    }
  }

  /** Parquet data files in the current epoch. */
  def dataFileCount: Long = {
    var n = 0L
    foreachDataFile(_ => n += 1)
    n
  }

  /** The compaction churn signal: a fingerprint of the current epoch's
    * file LISTING (name + length per parquet file), mixed with the
    * epoch and generation numbers. Same metadata-only listing cost as
    * [[dataFileCount]], but change-complete where a bare count is not:
    * a TRUNCATE-then-reload that happens to recreate the old file count
    * still changes the fingerprint (parquet part files carry fresh UUID
    * names), and a rename/retype ALTER — a new generation with zero new
    * files — changes the generation component, so the gen-collapse
    * rewrite compact() exists to perform is never suppressed on a
    * write-quiet table. */
  def compactionSignature: Long = {
    var h = 1125899906842597L * (currentEpoch + 1) + 31L * currentGen
    // order-insensitive mix: listing order is fs-dependent
    foreachDataFile(s =>
      h += s.getPath.getName.hashCode.toLong * 1099511628211L +
        s.getLen * 16777619L)
    h
  }

  /** Max stamped version (reference version-counter consolidation,
    * clickhouse_api.py:444-467). -1 when empty. */
  def maxVersion: Long = {
    if (!exists) return -1L
    val r = log.agg(max(col("_version"))).head()
    if (r.isNullAt(0)) -1L else r.getLong(0)
  }

  /** OPTIMIZE analogue: materialize the FINAL view (keeping each
    * survivor's `_version`) into a NEW data epoch, publish it by swapping
    * the `meta/epoch` pointer, and keep the previous epoch's files for
    * one more compaction cycle. Also collapses all generations into the
    * current one — the same part-merge work ClickHouse's OPTIMIZE FINAL
    * does.
    *
    * Crash-safe at every step: a crash before the pointer swap leaves
    * the pointer on the old epoch (the partial new epoch is garbage-
    * collected by the next successful compaction); a crash inside the
    * swap's tiny delete+rename window resolves to the — fully written —
    * new epoch via the max-epoch fallback in `currentEpoch`.
    *
    * Concurrency contract: single compactor, serialized with the writer
    * (the pipeline runs `Compactor.tick()` inside the micro-batch loop,
    * so compact-vs-append cannot race by construction); readers need no
    * coordination at all — a plan that resolved the pointer before the
    * swap reads the previous epoch, which outlives it by a full
    * compaction interval. The epoch lock additionally serializes the
    * whole rewrite against staged loads in this process: epoch
    * allocation, the Overwrite into the target dir, and the pointer
    * swap can never interleave with beginStagedLoad/publishStagedLoad
    * (a staged load in progress simply waits out the compaction, and
    * vice versa).
    *
    * Returns the post-compact [[compactionSignature]], read under the
    * same lock — the churn guard records THIS value, not a re-listing
    * taken after the lock drops (where an interleaved publish would get
    * folded into the baseline and the published load never compacted). */
  def compact(): Long = epochLock.synchronized {
    compactLocked()
    compactionSignature
  }

  /** OPTIMIZE … ZORDER: [[compact]], but the compacted epoch is laid
    * out by the Morton key of two numeric columns (the public
    * lakehouse multi-dimensional clustering recipe;
    * [[graft.functions.ZValue]] documents the bit math). The pk-sorted
    * layout prunes row groups on the pk only; after a z-order rewrite
    * every file's [min,max] box is narrow in BOTH named columns, so
    * min/max skipping works for predicates on either (pinned by a
    * GraftTableSpec files-touched assertion). Analytic (non-bucketed)
    * tables only — bucketed CDC tables keep their pk-sorted bucket
    * layout, which the realtime delete path prunes by.
    *
    * Scale shape: one extra tiny min/max aggregate over the PERSISTED
    * collapsed image (4 longs to the driver — table stats, not data),
    * a codegen'd map-only z projection, and the range exchange any
    * layout rewrite pays; `files` bounds output file count. */
  def compactZOrder(colA: String, colB: String, files: Int = 32): Long =
    epochLock.synchronized {
      require(bucketKey.isEmpty,
        "compactZOrder: z-order layout is for non-bucketed (analytic) " +
          "tables; single-int-pk tables keep the bucketed pk-sorted " +
          "layout the CDC path prunes by")
      require(columns.exists(_.name == colA) && columns.exists(_.name == colB),
        s"compactZOrder: unknown columns ($colA, $colB)")
      compactLocked(zorder = Some((colA, colB, files)))
      compactionSignature
    }

  private def compactLocked(
      zorder: Option[(String, String, Int)] = None): Unit = {
    if (!exists) return
    val e = currentEpoch
    val cur = currentGen
    val keep0 = FinalView.latestByKey(log, keys,
      struct(col("_version"), col("_deleted")))
    // Tombstones normally die here (applied, then dropped). But with a
    // staged load pending, publish will lift post-baseline rows —
    // tombstones included — into the staging epoch: dropping one now
    // would resurrect its key the moment the load publishes (the
    // snapshot has the row; the delete that arrived after the load
    // began is the only thing that removes it). Keep exactly those.
    val keep = stagingMeta() match {
      case Some((_, b)) if b != Long.MaxValue =>
        keep0.filter(!col("_deleted") || col("_version") > b)
      case _ => keep0.filter(!col("_deleted"))
    }
    // past any crashed attempt's leftovers, so SaveMode.Overwrite below
    // can only ever clobber a partial epoch, never a published one.
    // The pending staged epoch counts even though its DIR may not exist
    // yet (meta/staging is written before the first staged parquet job):
    // without it, compact could allocate the reserved number, publish
    // old data AS the staging epoch, and the load's shards would then
    // append into a live epoch — a permanently corrupted table.
    val target = (listEpochs() ++ pendingStagedLoad() :+ e).max + 1
    val w = zorder match {
      case Some((ca, cb, files)) =>
        // min-max normalize both dims to 16 bits from a 4-long driver
        // aggregate (table stats, not data), then range-partition and
        // sort by the interleaved key: each output file covers one z
        // range — a narrow [min,max] box in BOTH dims
        val img = keep.persist()
        val mm = img.agg(
          min(col(ca).cast(LongType)), max(col(ca).cast(LongType)),
          min(col(cb).cast(LongType)), max(col(cb).cast(LongType)))
          .collect()(0)
        if (mm.isNullAt(0) || mm.isNullAt(2)) img.write // empty/all-null
        else {
          val (mnA, mxA) = (mm.getLong(0), mm.getLong(1))
          val (mnB, mxB) = (mm.getLong(2), mm.getLong(3))
          // normalize via DOUBLE: integer (c-mn)*65535 overflows Long
          // once the column's range exceeds ~1.4e14 (and mx-mn itself
          // can overflow across the sign boundary, e.g. hash-derived
          // ids), yielding garbage z keys — the layout silently loses
          // its pruning power. Layout quality doesn't need bit-exact
          // integer division; clamp to [0, 65535] after the fp math.
          def norm(c: Column, mn: Long, mx: Long): Column = {
            val range = mx.toDouble - mn.toDouble
            if (range <= 0d) lit(0L)
            else least(lit(65535L), greatest(lit(0L),
              ((coalesce(c.cast(LongType), lit(mn)).cast("double")
                - mn.toDouble) * 65535d / range).cast(LongType)))
          }
          val z = graft.functions.ZValue.zColumn(
            norm(col(ca), mnA, mxA), norm(col(cb), mnB, mxB))
          img.withColumn("_zorder", z)
            .repartitionByRange(files, col("_zorder"))
            .sortWithinPartitions("_zorder")
            .drop("_zorder")
            .write
        }
      case None => bucketKey match {
      case Some(k) =>
        // same (bucket, salt) co-location + pk sort as writeBatch: the
        // FINAL aggregate leaves pk-hash partitioning, and writing THAT
        // through partitionBy would open tasks × buckets files — the
        // compacted epoch would carry more files than the appends it
        // replaced. One extra shuffle of the collapsed image bounds it
        // at buckets × salt, with tight per-row-group pk stats.
        keep.withColumn("_bucket", bucketExpr(col(k.name)))
          .repartition(col("_bucket"), pmod(hash(col(k.name)), lit(4)))
          .sortWithinPartitions(col(k.name))
          .write.partitionBy("_bucket")
      case None => keep.write
      }
    }
    w.mode(SaveMode.Overwrite).parquet(genDataPath(target, cur))
    if (zorder.isDefined) keep.unpersist()
    writeEpochPtr(target)
    // previous epoch survives one cycle for in-flight readers; anything
    // older — including partial epochs from crashed attempts — goes now.
    // An in-progress staged load (meta/staging present) keeps its epoch:
    // the compactor is serialized with the writer, but nothing serializes
    // it against an operator-driven bulk load on the same table.
    val staging = pendingStagedLoad()
    listEpochs()
      .filter(x => x != target && x != e && !staging.contains(x))
      .foreach(x => fs.delete(new Path(epochDataDir(x)), true))
    // Superseded generation METADATA gets the same one-cycle grace as
    // the data dirs: a reader that resolved the pre-swap pointer still
    // needs the old gens listed to read the grace epoch — delete a
    // gen's meta only once no retained epoch holds its files (i.e. one
    // compaction later). Lingering metas are harmless meanwhile: log()
    // skips gens whose data dir is absent.
    gens.filter(_.n != cur)
      .filter(g => !fs.exists(new Path(genDataPath(e, g.n))))
      .foreach(g => fs.delete(genMetaPath(g.n), false))
    writeGenMeta(cur, columns)
    gensCache = null
  }

  /** TRUNCATE: drop all data — every epoch — keep the table
    * (db_replicator_realtime.py:268-302). */
  def truncate(): Unit = epochLock.synchronized {
    listEpochs().foreach(e => fs.delete(new Path(epochDataDir(e)), true))
    fs.delete(epochPtrPath, false)
    // a pending staged load is ABANDONED — its epoch dir is gone with
    // the rest, so the reservation must go too, or every later write
    // path would keep honoring a load nobody will ever publish. (A
    // loader whose external shard markers survive a concurrent TRUNCATE
    // is an operator-error corner: in the replicator flow snapshots
    // complete before the realtime stream — and its TRUNCATEs — start.)
    fs.delete(stagingMetaPath, false)
  }

  /** DROP TABLE. */
  def drop(): Unit = fs.delete(new Path(root), true)
}

object GraftTable {
  /** One monitor per table root, shared by every handle in the process
    * (see the field doc in the class). Weak-ish growth is fine: entries
    * are one Object per distinct table path ever touched. */
  private val epochLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def epochLockFor(root: String): Object =
    epochLocks.computeIfAbsent(root, _ => new Object)

  /** Handle carrying the registry's STABLE column ids — what every
    * writer against a CDC-managed table path must use. A handle built
    * with positional ids on an evolved schema (any DROP/CHANGE history
    * leaves id gaps) writes generation metadata under the WRONG ids,
    * and the realtime handle's by-id re-alias then reads those columns
    * as NULL. */
  def fromSchema(spark: SparkSession, root: String,
                 schema: graft.ddl.TableSchema): GraftTable = {
    // parser-produced schemas that never passed through the registry
    // carry id = -1 on every field — positional is the only identity
    // they have (and matches what the registry WOULD assign at CREATE,
    // so a later registry-handled handle still reads these files)
    val ids = schema.fields.map(_.id)
    val cols =
      if (ids.forall(_ >= 0) && ids.distinct.length == ids.length)
        schema.fields.map(f => GraftColumn(f.id, f.name,
          graft.types.MySqlType.toSpark(f.tpe), f.nullable))
      else schema.fields.zipWithIndex.map { case (f, i) =>
        GraftColumn(i, f.name, graft.types.MySqlType.toSpark(f.tpe),
          f.nullable)
      }
    new GraftTable(spark, root, schema.primaryKeys, cols)
  }

  /** Positional ids — for tables that never rename columns (snapshots,
    * tests, queries). CDC tables get registry-assigned ids instead. */
  def apply(spark: SparkSession, root: String, keys: Seq[String],
            payloadSchema: StructType): GraftTable =
    new GraftTable(spark, root, keys,
      payloadSchema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
        GraftColumn(i, f.name, f.dataType, f.nullable)
      })

  def apply(spark: SparkSession, root: String, keys: Seq[String],
            columns: Seq[GraftColumn]): GraftTable =
    new GraftTable(spark, root, keys, columns)
}
