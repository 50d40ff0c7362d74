package graft.sources

import org.apache.spark.sql.DataFrame

/** One batch of raw envelope lines from a live transport, plus the
  * transport's opaque resume cursor AFTER the batch (Kafka offsets, a
  * GTID set, dump-file byte offsets — whatever the transport seeks by;
  * None when the transport has no cursor of its own, in which case the
  * envelopes' embedded `source.file:pos` stands in). */
final case class EnvelopeBatch(lines: Seq[String],
                               cursor: Option[String] = None)

/** A pluggable live transport of Debezium envelope lines. The
  * reference's live transport IS the replication protocol
  * (pymysqlreplication binlogstream.py:157-470 pulls COM_BINLOG_DUMP
  * packets in-process); here the transport is whatever carries the
  * connector's JSON — a tailed dump directory, a Kafka consumer, a
  * test fixture — and everything downstream of the lines is shared. */
trait EnvelopeTransport {
  /** The next batch of complete envelope lines (empty = idle). */
  def poll(): EnvelopeBatch
}

/** THE line-stream → admission seam: every transport hands raw
  * envelope lines to [[ingest]], which normalizes them through
  * [[DebeziumJson.parse]] and appends through the ONE
  * [[SpoolProducer]] admission/seq path — glob filtering, total-order
  * seq stamping, rotation, durable cursor. A new transport (Kafka
  * `readStream`, a message queue, a socket) plugs in WITHOUT touching
  * admission or seq logic, the property the reference gets from
  * funnelling every event through `BinlogReplicator.run`
  * (binlog_replicator.py:427-548).
  *
  * Cursor precedence: the transport's own cursor wins (it knows how to
  * seek); otherwise the LAST envelope's embedded `source.file:pos`
  * (the reference's transaction_id shape) is persisted, so even a
  * cursor-less transport resumes at binlog granularity. An all-skipped
  * batch still persists the cursor — skipped transactions must not be
  * re-read forever. */
final class EnvelopeIngest(producer: SpoolProducer) {

  /** Normalize + admit one batch. Returns the number of spooled
    * events (admission may drop some; parse skips tombstones and
    * heartbeats). */
  def ingest(lines: Seq[String], cursor: Option[String] = None): Int = {
    val records = lines.map(DebeziumJson.parse)
    val events = records.flatMap(_.event)
    val effective = cursor.orElse(
      records.reverseIterator.flatMap(EnvelopeIngest.envelopeCursor)
        .nextOption())
    producer.append(events, effective)
    events.size
  }

  /** One poll-and-ingest turn over a pluggable transport. */
  def drain(transport: EnvelopeTransport): Int = {
    val batch = transport.poll()
    if (batch.lines.isEmpty) 0 else ingest(batch.lines, batch.cursor)
  }
}

object EnvelopeIngest {

  /** MariaDB domain-server-sequence GTID: `0-1-101`. */
  private val MariaGtid = """(\d+)-(\d+)-(\d+)""".r

  /** The resume coordinate a cursor-less transport persists for one
    * envelope: a MariaDB domain-server-seq GTID wins (`gtid:0-1-101` —
    * the coordinate the reference seeks by on MariaDB,
    * binlog_replicator.py:188-219), otherwise the binlog file:pos
    * (the MySQL-path saved transaction_id shape; MySQL uuid:txid GTID
    * SETS are not totally ordered by suffix, so file:pos stays the
    * safer MySQL cursor). */
  def envelopeCursor(r: DebeziumJson.Record): Option[String] =
    r.gtid.collect { case g @ MariaGtid(_, _, _) => s"gtid:$g" }
      .orElse(r.pos)

  /** GTID-aware replay seek for transports that re-read a stream from
    * the beginning after a restart (a re-tailed console-consumer dump,
    * a topic re-read from earliest): drops every envelope at or before
    * the saved `gtid:<domain>-<server>-<seq>` cursor on the same
    * domain-server stream, the reference's resume semantics. Envelopes
    * without a comparable GTID (schema-history DDL, other domains) are
    * dropped while still BEFORE the cursor position and kept after it
    * — exactly the events a binlog seek would skip or replay. Without
    * a gtid cursor the lines pass through untouched. */
  def afterGtidCursor(lines: Seq[String],
                      cursor: Option[String]): Seq[String] =
    cursor.collect { case c if c.startsWith("gtid:") =>
      c.stripPrefix("gtid:") } match {
      case Some(MariaGtid(d, s, n)) =>
        val (dom, srv, seq) = (d.toLong, s.toLong, n.toLong)
        var passed = false
        lines.filter { line =>
          passed || (DebeziumJson.parse(line).gtid match {
            case Some(MariaGtid(d2, s2, n2))
              if d2.toLong == dom && s2.toLong == srv =>
              val v = n2.toLong
              if (v > seq) { passed = true; true } // first unapplied event
              else { if (v == seq) passed = true; false } // applied
            case _ => false // non-comparable before the seek point: skip
          })
        }
      case _ => lines
    }

  /** Attach the seam to ANY Structured Streaming source of envelope
    * strings — `spark.readStream.format("kafka")…` (use the `value`
    * column), a socket source, a MemoryStream fixture — as a
    * `foreachBatch` sink:
    *
    * {{{
    * frames.writeStream.foreachBatch(EnvelopeIngest.streamSink(producer))
    * }}}
    *
    * Per batch the lines are ordered by (partition, offset) when the
    * frame carries Kafka's columns (Kafka only orders within a
    * partition — a per-table topic-partition keeps the reference's
    * per-table ordering contract) and by arrival order otherwise, then
    * fed through the one admission/seq path. The persisted cursor is
    * the max offset per partition (JSON) for Kafka frames, else the
    * envelopes' own `source.file:pos`.
    *
    * Seq assignment is a total order — the same single-writer shape as
    * the reference's one binlog reader — but the batch does NOT
    * materialize on the driver in one piece: rows stream through
    * `toLocalIterator` in slices of `maxLinesPerSlice`, each slice
    * going through [[EnvelopeIngest.ingest]] with the running
    * max-offset-per-partition cursor (a valid resume point at every
    * slice boundary, because the global (partition, offset) sort means
    * everything not yet ingested is past the running cursor). Driver
    * memory is bounded by one sort partition plus one slice regardless
    * of micro-batch size, so a from-`earliest` restart on a fat topic
    * cannot materialize the whole topic — the cap is enforced in the
    * seam, not left to the caller's `maxOffsetsPerTrigger` (which
    * remains the knob for bounding executor-side batch work). A crash
    * mid-batch re-delivers the micro-batch and re-appends the prefix
    * with the same at-least-once semantics the spool already has. */
  def streamSink(producer: SpoolProducer, column: String = "value",
                 maxLinesPerSlice: Int = 65536)
      : (DataFrame, Long) => Unit = {
    require(maxLinesPerSlice > 0,
      s"maxLinesPerSlice should be positive, got $maxLinesPerSlice")
    val ingest = new EnvelopeIngest(producer)
    (df: DataFrame, _: Long) => {
      import org.apache.spark.sql.functions.col
      import scala.jdk.CollectionConverters._
      val cols = df.columns.toSet
      val kafkaShaped = cols.contains("partition") && cols.contains("offset")
      val ordered =
        if (kafkaShaped)
          df.select(col(column).cast("string").as("line"),
              col("partition").cast("int").as("p"),
              col("offset").cast("long").as("o"))
            .sort(col("p"), col("o"))
        else df.select(col(column).cast("string").as("line"))
      // running max offset per partition across slices; sorted so the
      // rendered cursor JSON is deterministic
      val maxByPart = scala.collection.mutable.SortedMap.empty[Int, Long]
      ordered.toLocalIterator().asScala.grouped(maxLinesPerSlice)
        .foreach { slice =>
          val cursor =
            if (kafkaShaped) {
              slice.foreach { r =>
                val p = r.getInt(1)
                val o = r.getLong(2)
                maxByPart.update(p, maxByPart.get(p).fold(o)(math.max(_, o)))
              }
              Some(maxByPart.iterator
                .map { case (p, o) => s""""$p":${o + 1}""" }
                .mkString("{", ",", "}"))
            } else None
          ingest.ingest(slice.map(_.getString(0)), cursor)
        }
    }
  }
}
