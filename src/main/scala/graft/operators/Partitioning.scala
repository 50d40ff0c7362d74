package graft.operators

import org.apache.spark.sql.DataFrame

private[operators] object Partitioning {
  /** Re-spread an under-partitioned input across the cluster. A tiny
    * parquet (one row group) arrives as ONE split, so every expensive
    * map-side stage downstream (shingle explode, per-pair set ops,
    * cosine folds) would run in a single task; an input at real scale
    * already has ≥ cores partitions and passes through untouched — the
    * repartition only ever moves small inputs.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
