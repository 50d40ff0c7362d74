package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the complete operator surface (SURVEY.md §2 + the
  * training-data-pipeline extensions); each entry has a DuckDB oracle in
  * `oracleSql` unless the computation is not SQL-expressible, in which
  * case the driver falls back to a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.defs ++ TpchShapes.defs ++ CdcQueries.defs ++
      ConversionQueries.defs ++ TextQueries.defs ++ SimilarityQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ TpchShapes.oracles ++ CdcQueries.oracles ++
      ConversionQueries.oracles ++ TextQueries.oracles ++
      SimilarityQueries.oracles
}
