package graft.operators

import org.apache.spark.sql.DataFrame

private[graft] object Partitioning {
  /** Re-spread an under-partitioned input across the cluster. A tiny
    * parquet (one row group) arrives as ONE split, so every expensive
    * map-side stage downstream (shingle explode, per-pair set ops,
    * cosine folds) would run in a single task; an input at real scale
    * already has ≥ cores partitions and passes through untouched — the
    * repartition only ever moves small inputs.
    *
    * The small-input probe is PLAN-SAFE: catalog/file-listing stats
    * (`analyzed.stats.sizeInBytes`), not `df.rdd.getNumPartitions` —
    * the RDD probe materialized the full pre-AQE physical plan once per
    * call (planning every scan twice and bypassing AQE's own coalescing
    * decisions on a 100 TB table). An input whose estimated bytes would
    * already yield ≥ `defaultParallelism` file splits passes through;
    * unknown-size inputs (stats default to Long.Max) pass through too.
    */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val bytes = df.queryExecution.analyzed.stats.sizeInBytes
    val smallBound =
      BigInt(target) * spark.sessionState.conf.filesMaxPartitionBytes
    if (bytes < smallBound) df.repartition(target) else df
  }
}
