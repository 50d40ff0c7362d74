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
  * Resume state is (byte offset, head signature) per dump file,
  * serialized into the producer's `source_pos` — so a restarted tailer
  * re-reads nothing, exactly like the reference's saved
  * last_seen_transaction (binlog_replicator.py:63-85). The head
  * signature (CRC32 of the first ≤64 bytes) detects a REWRITTEN file —
  * a consumer restarted with `>` instead of `>>` — even when the new
  * content has already grown past the old offset by the next poll; a
  * length check alone would read from the stale offset and silently
  * drop the head of the new stream. On rewrite the tailer restarts the
  * file from 0: re-emitted events are the at-least-once window the
  * pipeline converges under (same-seq LWW/FINAL collapse). Partial
  * trailing lines (a record mid-append) stay unconsumed until their
  * newline arrives. State entries for deleted dump files are pruned,
  * so rotation doesn't grow the state forever.
  *
  * Reads are bounded at `maxBytesPerRead` per file per tick — a
  * multi-GB initial catch-up drains over successive ticks on a fixed
  * buffer instead of materializing the whole backlog (where
  * `(len-start).toInt` would overflow outright past 2 GB). A single
  * line larger than the cap cannot make progress and is reported
  * loudly rather than spun on silently.
  *
  * Spool file granularity: published spool files are immutable (the
  * file source's contract), so unlike the reference's FileWriter the
  * producer cannot append to the current file — each tick with new
  * events publishes at least one file. Under low traffic that means
  * file count tracks POLL count, bounded by `pollMs` (≤2 files/s at
  * the default 500 ms), not event count; the retention sweep keeps the
  * spool bounded either way.
  */
final class DebeziumTail(dumpDir: String, producer: SpoolProducer,
                         maxBytesPerRead: Int = 16 << 20) {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  // the shared line-stream → admission seam: this tailer is ONE
  // transport behind it; a Kafka readStream plugs into the same seam
  // via EnvelopeIngest.streamSink without touching admission/seq
  private val ingest = new EnvelopeIngest(producer)

  private case class FileState(off: Long, sig: Long)
  private val SigUnknown = -1L // legacy offset-only state: accept any head

  private var state: Map[String, FileState] = decode(producer.sourcePos)
  private var warnedStuck = Set.empty[String]

  private def decode(pos: Option[String]): Map[String, FileState] =
    pos.filter(_.startsWith("{")).map { s =>
      import scala.jdk.CollectionConverters._
      mapper.readTree(s).fields().asScala.map { e =>
        val v = e.getValue
        e.getKey -> (if (v.isNumber) FileState(v.asLong(), SigUnknown)
                     else FileState(v.get("off").asLong(),
                       v.get("sig").asLong()))
      }.toMap
    }.getOrElse(Map.empty)

  private def encode(m: Map[String, FileState]): String = {
    val node = mapper.createObjectNode()
    m.toSeq.sortBy(_._1).foreach { case (k, st) =>
      val o = node.putObject(k); o.put("off", st.off); o.put("sig", st.sig)
    }
    node.toString
  }

  /** CRC32 of the first min(64, len) bytes — the file's identity. */
  private def headSig(f: java.io.File, len: Long): Long = {
    val n = math.min(64L, len).toInt
    if (n <= 0) return 0L
    val raf = new java.io.RandomAccessFile(f, "r")
    val buf = new Array[Byte](n)
    try raf.readFully(buf) finally raf.close()
    val crc = new java.util.zip.CRC32(); crc.update(buf); crc.getValue
  }

  /** One poll: read every dump file's unconsumed bytes (complete lines
    * only, at most `maxBytesPerRead` per file), convert, append to the
    * spool, persist state. Returns the number of events appended (0 =
    * idle, caller sleeps — the reference's READ_LOG_INTERVAL backoff,
    * binlog_replicator.py:538). */
  def tick(): Int = {
    val dir = new java.io.File(dumpDir)
    // a null listing is an IO hiccup, not an empty dir: keep state
    val listing = dir.listFiles()
    if (listing == null) return 0
    val files = listing
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        (f.getName.endsWith(".json") || f.getName.endsWith(".jsonl")))
      .sortBy(_.getName)
    // prune state for rotated-away files, or it grows forever
    val names = files.map(_.getName).toSet
    state = state.filter { case (k, _) => names.contains(k) }
    var appended = 0
    // per-file IO failures skip THIS file for THIS tick, never kill the
    // producer: a dump file deleted between the listing and the open is
    // routine when the dump dir runs its own retention, and the state
    // entry for a vanished file prunes itself next tick
    for (f <- files) try {
      val len = f.length()
      val sig = headSig(f, len)
      val start = state.get(f.getName) match {
        case Some(FileState(off, s))
          if len >= off && (s == sig || s == SigUnknown) => off
        case Some(_) => 0L // shrunk or rewritten: restart the file
        case None => 0L
      }
      if (len > start) {
        val toRead = math.min(len - start, maxBytesPerRead.toLong).toInt
        val raf = new java.io.RandomAccessFile(f, "r")
        val bytes =
          try {
            raf.seek(start)
            val buf = new Array[Byte](toRead)
            raf.readFully(buf)
            buf
          } finally raf.close()
        // consume only through the last complete line — a record being
        // appended right now must wait for its newline
        val lastNl = bytes.lastIndexOf('\n'.toByte)
        if (lastNl >= 0) {
          val text = new String(bytes, 0, lastNl + 1,
            java.nio.charset.StandardCharsets.UTF_8)
          state += f.getName -> FileState(start + lastNl + 1, sig)
          // this transport's cursor (file offsets + head signatures)
          // overrides the envelopes' source.file:pos at the seam
          appended += ingest.ingest(text.split("\n", -1).toSeq,
            Some(encode(state)))
          warnedStuck -= f.getName
        } else if (toRead == maxBytesPerRead &&
                   !warnedStuck.contains(f.getName)) {
          // a single record larger than the read cap can never complete:
          // say so once instead of re-reading the same bytes forever
          System.err.println(s"[graft] dump file ${f.getName}: no newline " +
            s"in $maxBytesPerRead bytes from offset $start — raise " +
            "maxBytesPerRead or fix the producer's record framing")
          warnedStuck += f.getName
        }
      }
    } catch {
      case _: java.io.FileNotFoundException => () // raced a delete: skip
      case e: java.io.IOException =>
        System.err.println(
          s"[graft] dump file ${f.getName}: read failed (${e.getMessage}) " +
            "— will retry next tick")
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
