package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The analytic query surface: the engine exposes Spark's full relational
  * algebra (the reference delegates reads to ClickHouse SQL; a user of the
  * replicated tables runs exactly this kind of query against them).
  *
  * Every query is written plan-first:
  *  - filters before joins so parquet pushdown trims the scan,
  *  - dimension sides broadcast (`broadcast()` for the always-tiny ones,
  *    AQE for the rest),
  *  - aggregates in exact decimal so results are engine-independent,
  *  - deterministic total order wherever LIMIT appears.
  */
object CoreQueries {

  val defs: Map[String, QueryFn] = Map(
    // TPC-H Q1 shape: single scan, hash agg with map-side combine. At 100 TB
    // this is scan-bound; the filter + 7-column projection reach parquet.
    "q1_pricing_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // TPC-H Q3 shape: selective dim filter first, then fact join; customer
    // (filtered to one segment) broadcasts under AQE at bench scale.
    "q3_shipping_priority" -> { (s, dir) =>
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-06-30").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 shape: star join, all dims broadcast; one shuffle (final agg).
    "q5_nation_revenue" -> { (s, dir) =>
      val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nat = t(s, dir, "nation")
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q6 shape: pure scan + filter + single agg — pushdown showcase.
    "q6_forecast_revenue" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(8,4)")), 2).cast("double").as("revenue"))
    },

    // Top-k over a join: deterministic total order under LIMIT.
    "q10_top_customers" -> { (s, dir) =>
      val cust = t(s, dir, "customer").select("c_custkey", "c_name")
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(moneySum(col("o_totalprice")).as("total_spend"),
          count(lit(1)).as("n_orders"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select("c_custkey", "c_name", "total_spend", "n_orders")
        .orderBy(col("total_spend").desc, col("c_custkey"))
        .limit(10)
    },

    // Window ranking: per-partition top-k without a global sort.
    "q_window_top3_acctbal" -> { (s, dir) =>
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rnk")
        .orderBy("c_nationkey", "rnk")
    },

    // Anti join (NOT EXISTS): customers with no recent orders.
    "q_anti_no_orders" -> { (s, dir) =>
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey").as("c_custkey"))
      t(s, dir, "customer")
        .join(ord, Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Semi join (EXISTS): suppliers that shipped anything in 1997.
    "q_semi_active_suppliers" -> { (s, dir) =>
      val li97 = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_suppkey").as("s_suppkey"))
      t(s, dir, "supplier")
        .join(li97, Seq("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },

    // Set ops.
    "q_intersect_nations" -> { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },
    "q_except_nations" -> { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    // Rollup (multi-dimensional agg in one pass).
    "q_rollup_flag_status" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), moneySum(col("l_quantity")).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // Distinct aggregation.
    "q_distinct_parts_per_brand" -> { (s, dir) =>
      t(s, dir, "part")
        .groupBy("p_brand")
        .agg(countDistinct(col("p_type")).as("n_types"),
          countDistinct(col("p_size")).as("n_sizes"))
        .orderBy("p_brand")
    },

    // JSON column access (events.props is a JSON text column, reference
    // maps MySQL json → String and queries via JSON functions; SURVEY §1.2).
    "q_json_props_bucket" -> { (s, dir) =>
      t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
          col("value"))
        .groupBy(pmod(col("k"), lit(10)).as("k_bucket"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
        .orderBy("k_bucket")
    }
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlMoneySum("l_quantity")} AS sum_qty,
         |  ${sqlMoneySum("l_extendedprice")} AS sum_base_price,
         |  ${sqlRevenueSum("l_extendedprice", "l_discount")} AS sum_disc_price,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate,
         |  ${sqlRevenueSum("l_extendedprice", "l_discount")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      s"""SELECT n_name,
         |  ${sqlRevenueSum("l_extendedprice", "l_discount")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |  CAST(l_discount AS DECIMAL(8,4))),2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q10_top_customers" ->
      s"""SELECT c_custkey, c_name,
         |  ${sqlMoneySum("o_totalprice")} AS total_spend,
         |  COUNT(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_custkey, c_name
         |ORDER BY total_spend DESC, c_custkey LIMIT 10""".stripMargin,

    "q_window_top3_acctbal" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, rnk FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    CAST(row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rnk
        |  FROM customer) WHERE rnk <= 3
        |ORDER BY c_nationkey, rnk""".stripMargin,

    "q_anti_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,

    "q_semi_active_suppliers" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_suppkey = s_suppkey
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
        |ORDER BY s_suppkey""".stripMargin,

    "q_intersect_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,

    "q_except_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,

    "q_rollup_flag_status" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${sqlMoneySum("l_quantity")} AS qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_distinct_parts_per_brand" ->
      """SELECT p_brand, COUNT(DISTINCT p_type) AS n_types,
        |  COUNT(DISTINCT p_size) AS n_sizes
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_json_props_bucket" ->
      s"""SELECT CAST(props->>'k' AS BIGINT) % 10 AS k_bucket, COUNT(*) AS n,
         |  ${sqlMoneySum("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin
  )
}
