package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** S12 — replication lag monitoring.
  *
  * The reference samples a state file and computes seconds-since-last-
  * event per replicator, serving it from a tiny HTTP endpoint
  * (monitoring.py:27-78). Spark-first, the stream already publishes
  * exactly that telemetry through `StreamingQueryListener` progress
  * events; this listener keeps the latest snapshot per query so an
  * operator (or test) can ask "how far behind is replication?" without
  * scraping logs.
  *
  * Attach once per session: `LagMonitor.attach(spark)`.
  */
final class LagMonitor extends StreamingQueryListener {

  /** Latest progress snapshot for one streaming query. */
  final case class Progress(
      batchId: Long,
      timestampMs: Long,       // trigger wall-clock
      numInputRows: Long,
      batchDurationMs: Long,   // triggerExecution
      observedAtMs: Long) {    // driver clock when the event arrived
    /** monitoring.py's headline metric: seconds since the last batch
      * finished — 0 while events flow, grows when the stream stalls. */
    def lagSeconds(nowMs: Long = System.currentTimeMillis()): Double =
      math.max(0L, nowMs - observedAtMs) / 1000.0
  }

  private val latest = new ConcurrentHashMap[java.util.UUID, Progress]()

  def progress(queryId: java.util.UUID): Option[Progress] =
    Option(latest.get(queryId))

  def all: Map[java.util.UUID, Progress] = {
    import scala.jdk.CollectionConverters._
    latest.asScala.toMap
  }

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val ts = try java.time.Instant.parse(p.timestamp).toEpochMilli
             catch { case _: Throwable => System.currentTimeMillis() }
    latest.put(p.id, Progress(
      batchId = p.batchId,
      timestampMs = ts,
      numInputRows = p.numInputRows,
      batchDurationMs =
        Option(p.durationMs.get("triggerExecution")).map(_.toLong)
          .getOrElse(0L),
      observedAtMs = System.currentTimeMillis()))
  }

  /** Spark 4 emits QueryIdleEvent (not a zero-row progress event) when a
    * trigger finds no new data: idle means CAUGHT UP, so the observation
    * clock must refresh or `lag_seconds` grows without bound on a
    * healthy quiet stream and pages the on-call for a stall that does
    * not exist. `compute` (not `computeIfPresent`): a stream started
    * against an already-drained spool emits ONLY idle events — with no
    * seeded entry the query would never appear and /health would report
    * `queries: 0` for a running stream, indistinguishable from the
    * stream being down (batchId −1 marks "idle before first batch"). */
  override def onQueryIdle(
      e: StreamingQueryListener.QueryIdleEvent): Unit =
    latest.compute(e.id, (_, prev) => {
      val now = System.currentTimeMillis()
      Option(prev) match {
        case Some(p) => p.copy(numInputRows = 0L, observedAtMs = now)
        case None => Progress(batchId = -1L, timestampMs = now,
          numInputRows = 0L, batchDurationMs = 0L, observedAtMs = now)
      }
    })

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    latest.remove(e.id)
}

object LagMonitor {
  /** Create and register a monitor on the session's stream bus. */
  def attach(spark: SparkSession): LagMonitor = {
    val m = new LagMonitor
    spark.streams.addListener(m)
    m
  }
}
