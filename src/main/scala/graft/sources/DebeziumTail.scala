package graft.sources

import graft.GraftConfig

/** Tails a directory of Debezium JSON-line dumps and appends the new
  * records to the spool — the deployable realtime producer process,
  * playing the role of the reference's standalone binlog_replicator
  * (runner.py supervises it the same arm's-length way).
  *
  * The dump directory is whatever sink the Debezium deployment writes:
  * `kafka-console-consumer … >> events.jsonl`, a Kafka Connect file
  * sink, or Debezium Server's file channel — anything that appends
  * complete JSON lines to files. Files are processed in name order and
  * assumed append-only (rotate by creating a new file, like the Kafka
  * consumer does on restart).
  *
  * Resume state is byte offsets per dump file, serialized into the
  * producer's `source_pos` — so a restarted tailer re-reads nothing,
  * exactly like the reference's saved last_seen_transaction
  * (binlog_replicator.py:63-85). Partial trailing lines (a record
  * mid-append) stay unconsumed until their newline arrives.
  *
  * Spool file granularity: published spool files are immutable (the
  * file source's contract), so unlike the reference's FileWriter the
  * producer cannot append to the current file — each tick with new
  * events publishes at least one file. Under low traffic that means
  * file count tracks POLL count, bounded by `pollMs` (≤2 files/s at
  * the default 500 ms), not event count; the retention sweep keeps the
  * spool bounded either way.
  */
final class DebeziumTail(dumpDir: String, producer: SpoolProducer) {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private var offsets: Map[String, Long] = decode(producer.sourcePos)

  private def decode(pos: Option[String]): Map[String, Long] =
    pos.filter(_.startsWith("{")).map { s =>
      import scala.jdk.CollectionConverters._
      val node = mapper.readTree(s)
      node.fields().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
    }.getOrElse(Map.empty)

  private def encode(m: Map[String, Long]): String = {
    val node = mapper.createObjectNode()
    m.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    node.toString
  }

  /** One poll: read every dump file's unconsumed bytes (complete lines
    * only), convert, append to the spool, persist offsets. Returns the
    * number of events appended (0 = idle, caller sleeps — the
    * reference's READ_LOG_INTERVAL backoff, binlog_replicator.py:538). */
  def tick(): Int = {
    val dir = new java.io.File(dumpDir)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        (f.getName.endsWith(".json") || f.getName.endsWith(".jsonl")))
      .sortBy(_.getName)
    var appended = 0
    for (f <- files) {
      val tracked = offsets.getOrElse(f.getName, 0L)
      val len = f.length()
      // a SHRUNKEN file means the consumer restarted with truncation
      // (`>` instead of `>>`): restart from 0 rather than skip forever —
      // re-emitted events are the at-least-once window the pipeline
      // already converges under (same-seq LWW/FINAL collapse)
      val start = if (len < tracked) 0L else tracked
      if (len > start) {
        val raf = new java.io.RandomAccessFile(f, "r")
        val bytes =
          try {
            raf.seek(start)
            val buf = new Array[Byte]((len - start).toInt)
            raf.readFully(buf)
            buf
          } finally raf.close()
        // consume only through the last complete line — a record being
        // appended right now must wait for its newline
        val lastNl = bytes.lastIndexOf('\n'.toByte)
        if (lastNl >= 0) {
          val text = new String(bytes, 0, lastNl + 1,
            java.nio.charset.StandardCharsets.UTF_8)
          val records = text.split("\n", -1).toSeq.map(DebeziumJson.parse)
          val events = records.flatMap(_.event)
          offsets += f.getName -> (start + lastNl + 1)
          producer.append(events, Some(encode(offsets)))
          appended += events.size
        }
      }
    }
    appended
  }
}

/** Deployment entrypoint: `graft.sources.DebeziumSpoolProducer
  * <config.yaml> <dumpDir> [pollMs]` — tail the dump, write the spool
  * named by the config's `binlog_replicator.data_dir`, sweep retention.
  * Pair it with `graft.Main` consuming the same spool and the realtime
  * path is live end-to-end; see README "Live binlog deployment". */
object DebeziumSpoolProducer {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: DebeziumSpoolProducer <config.yaml> <dumpDir> [pollMs]")
    val config = GraftConfig.load(args(0))
    val spool = config.spoolDir.getOrElse(
      sys.error("config missing binlog_replicator.data_dir"))
    val pollMs = if (args.length > 2) args(2).toLong else 500L
    val producer = new SpoolProducer(spool, config)
    val tail = new DebeziumTail(args(1), producer)
    var lastSweep = 0L
    while (true) {
      val n = tail.tick()
      val now = System.currentTimeMillis()
      if (now - lastSweep > 60000L) { producer.sweep(now); lastSweep = now }
      if (n == 0) Thread.sleep(pollMs)
    }
  }
}
