package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch streaming deduplication for a document feed.
  *
  * Spark's own `dropDuplicates` on a stream keeps *all* keys in state
  * and (without watermark) emits updates; a training-data ingest wants
  * "emit each content fingerprint the first time it is ever seen, drop
  * every later copy, forever". That is per-key custom state →
  * `KeyValueGroupedDataset.flatMapGroupsWithState`:
  *
  *  - key: the content fingerprint (md5 of normalized text upstream);
  *  - state: a single boolean "seen" per fingerprint (the minimal
  *    state — at 100 TB the state store holds one bit-ish entry per
  *    distinct document, partitioned across executors by key);
  *  - output: Append (emitted rows are final — exactly-once per key).
  *
  * Within one micro-batch the winner is the smallest (seq) row, so
  * replays pick the same representative deterministically.
  */
object StreamingDedup {

  /** events: (fp: String, seq: Long, payload columns...). Returns the
    * first-ever row per fp, streaming. */
  def firstSeen(events: DataFrame, fpCol: String, seqCol: String): DataFrame = {
    implicit val rowEnc = RowEncoder.encoderFor(events.schema)
    implicit val boolEnc = org.apache.spark.sql.Encoders.scalaBoolean
    val keyed = events.groupByKey(r => r.getAs[String](fpCol))(
      org.apache.spark.sql.Encoders.STRING)
    val seqIdx = events.schema.fieldIndex(seqCol)
    // fail fast on the driver: getLong inside flatMapGroupsWithState
    // would otherwise kill the streaming query at runtime on an INT32
    // fixture column
    require(events.schema(seqIdx).dataType ==
      org.apache.spark.sql.types.LongType,
      s"$seqCol must be LONG, got ${events.schema(seqIdx).dataType.sql}")
    keyed.flatMapGroupsWithState[Boolean, Row](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
        if (state.exists) Iterator.empty
        else {
          state.update(true)
          // deterministic representative: min seq within the batch
          Iterator(rows.minBy(_.getLong(seqIdx)))
        }
    }
  }
}
