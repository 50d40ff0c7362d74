package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The remaining classic TPC-H query shapes, adapted to the fixture's
  * reduced schema (no partsupp table, no shipmode/commitdate columns —
  * see TESTDATA.md). Each keeps the *plan shape* that makes the original
  * interesting at 100 TB: Q7/Q8's multi-dimension star with pre-join
  * dimension filters, Q12's conditional aggregation over a fact join,
  * Q13's outer-join double aggregation, Q15's scalar-max view, Q19's
  * disjunctive residual over an equi join.
  *
  * Same conventions as [[CoreQueries]]: filters before joins, dims
  * broadcast, money in exact decimal, deterministic output order.
  */
object TpchShapes {

  val defs: Map[String, QueryFn] = Map(
    // TPC-H Q7 shape: bidirectional trade volume between two nations by
    // year. The two-nation filter lands on supplier/customer BEFORE the
    // fact join (via tiny broadcast nation joins), so the big join keys
    // only carry matching rows; the pair disjunction is a residual on
    // the already-filtered result.
    "q7_trade_volume" -> { (s, dir) =>
      val nations = Seq("NATION_1", "NATION_2")
      val supN = t(s, dir, "nation").filter(col("n_name").isin(nations: _*))
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val custN = t(s, dir, "nation").filter(col("n_name").isin(nations: _*))
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
        .select("s_suppkey", "supp_nation")
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        .join(broadcast(custN), col("c_nationkey") === col("cn_key"))
        .select("c_custkey", "cust_nation")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
          "l_shipdate")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === nations(0) && col("cust_nation") === nations(1)) ||
          (col("supp_nation") === nations(1) && col("cust_nation") === nations(0)))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // TPC-H Q8 shape: one nation's share of a region's market for one
    // part type, by year. Numerator and denominator are both
    // exact-decimal sums rounded before the (double) division, so the
    // share is bit-identical across engines. The part-type filter
    // broadcasts into the fact scan; the region filter prunes the
    // customer side before the join.
    "q8_market_share" -> { (s, dir) =>
      val target = "NATION_2"
      val parts = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
        .select("p_partkey")
      val asiaCust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("cn_key"))),
          col("c_nationkey") === col("cn_key"))
        .select("c_custkey")
      val supN = t(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
        .select("s_suppkey", "supp_nation")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
          "l_discount")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          revenueSum(
            when(col("supp_nation") === target, col("l_extendedprice")).otherwise(0.0),
            when(col("supp_nation") === target, col("l_discount")).otherwise(0.0))
            .as("nation_volume"),
          revenueSum(col("l_extendedprice"), col("l_discount")).as("total_volume"))
        .select(col("o_year"), col("nation_volume"), col("total_volume"),
          round(col("nation_volume") / col("total_volume"), 6).as("mkt_share"))
        .orderBy("o_year")
    },

    // TPC-H Q12 shape (no l_shipmode in the fixture → ship-delay class
    // stands in for the mode): conditional priority counts per class.
    // One fact-fact join on the order key, then a two-branch conditional
    // aggregation — the CASE stays inside the map-side partial agg.
    "q12_delay_priority" -> { (s, dir) =>
      val delay = datediff(col("l_shipdate"), col("o_orderdate"))
      val highPrio = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          when(delay >= 120, "3-LATE")
            .when(delay >= 60, "2-SLOW").otherwise("1-FAST").as("delay_class"),
          highPrio.as("high"))
        .groupBy("delay_class")
        .agg(count(when(col("high"), 1)).as("high_prio_count"),
          count(when(!col("high"), 1)).as("low_prio_count"))
        .orderBy("delay_class")
    },

    // TPC-H Q13 shape: distribution of customers by order count — a
    // LEFT OUTER join (keeping zero-order customers) under a filtered
    // fact, then two aggregations. The first groupBy shuffles on the
    // customer key; the second input is one row per customer, so the
    // distribution agg is nearly free.
    "q13_order_distribution" -> { (s, dir) =>
      val ord = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .select("o_custkey", "o_orderkey")
      t(s, dir, "customer").select("c_custkey")
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy("n_orders")
        .agg(count(lit(1)).as("n_custs"))
        .orderBy(col("n_custs").desc, col("n_orders").desc)
    },

    // TPC-H Q15 shape: top supplier by quarterly revenue — an aggregate
    // "view" filtered to its own maximum. The 1-row max broadcasts back
    // over the per-supplier revenue (the classic scalar-subquery
    // decorrelation); revenue equality is safe because both sides carry
    // the identical rounded-decimal double.
    "q15_top_supplier" -> { (s, dir) =>
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(revenueSum(col("l_extendedprice"), col("l_discount"))
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },

    // TPC-H Q2 shape (no partsupp → the observed minimum unit price from
    // lineitem stands in for ps_supplycost): cheapest EUROPE supplier per
    // small part. The per-part minimum is a window over the already
    // part+supplier-collapsed aggregate — tiny relative to the fact — and
    // the min/equality arithmetic is a single IEEE division per row, so
    // both engines derive bit-identical costs.
    "q2_min_cost_supplier" -> { (s, dir) =>
      val eur = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val smallParts = t(s, dir, "part")
        .filter(col("p_size") < 10 && col("p_type") === "SMALL")
        .select("p_partkey")
      val cost = t(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
        .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("p_partkey")
      cost.withColumn("min_cost", min("unit_cost").over(w))
        .filter(col("unit_cost") === col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost")
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },

    // TPC-H Q9 shape (supply cost surrogate: 60% of the part's retail
    // price): profit by supplier nation and year for one part color.
    // Every term is exact decimal — extendedprice×discount minus
    // retail×quantity×0.6 — summed exactly and rounded once, so the
    // profit is engine-independent. The color filter broadcasts; nation
    // joins broadcast; the only wide exchange is the final group-by.
    "q9_color_profit" -> { (s, dir) =>
      val redParts = t(s, dir, "part").filter(col("p_name").startsWith("red "))
        .select("p_partkey", "p_retailprice")
      val supN = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "supp_nation")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_orderdate")
      val amount =
        col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1.0) - col("l_discount")).cast(DecimalType(8, 4)) -
        col("p_retailprice").cast(DecimalType(12, 2)) *
          col("l_quantity").cast(DecimalType(7, 2)) *
          lit(0.6).cast(DecimalType(2, 1))
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount")
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("supp_nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(sum(amount), 2).cast("double").as("profit"))
        .orderBy(col("supp_nation"), col("o_year").desc)
    },

    // TPC-H Q11 shape (value = shipped revenue per part for one region's
    // suppliers): parts whose value exceeds a global-threshold scalar —
    // the 1-row total broadcasts back over the per-part aggregate, like
    // q22's threshold. Both value and total are exact-decimal sums.
    "q11_important_parts" -> { (s, dir) =>
      val afr = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter(col("r_name") === "AFRICA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val value = t(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(broadcast(afr), col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(moneySum(col("l_extendedprice")).as("value"))
      val total = value.agg(sum(col("value").cast(DecimalType(18, 2)))
        .cast("double").as("grand_total"))
      value.crossJoin(broadcast(total))
        .filter(col("value") > col("grand_total") * 0.001)
        .select(col("l_partkey").as("p_partkey"), col("value"))
        .orderBy(col("value").desc, col("p_partkey"))
    },

    // TPC-H Q16 shape: supplier variety per brand/size-bucket, with the
    // "complaints" exclusion as a NOT IN → broadcast anti join on the
    // supplier key. countDistinct rewrites to a two-phase expand +
    // distinct aggregate — the shuffle carries (brand, bucket, supplier)
    // triples, already deduplicated map-side.
    "q16_supplier_variety" -> { (s, dir) =>
      val badSup = t(s, dir, "supplier").filter(col("s_name").endsWith("7"))
        .select(col("s_suppkey").as("l_suppkey"))
      val parts = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO")
        .select("p_partkey", "p_brand", "p_size")
      t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(badSup), Seq("l_suppkey"), "left_anti")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), (col("p_size") / 10).cast("long").as("size_bucket"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("size_bucket"))
    },

    // TPC-H Q20 shape (shipped-quantity share stands in for the
    // partsupp availability test): EUROPE suppliers who shipped more
    // than a quarter of any red part's 1997 volume. Two stacked
    // aggregations over the same filtered fact — the per-part total
    // joins back per-(supplier, part) — then a distinct supplier set
    // semi-joins the dimension. Quantity sums are integral doubles, so
    // every comparison is exact.
    "q20_heavy_shippers" -> { (s, dir) =>
      val red = t(s, dir, "part").filter(col("p_name").startsWith("red "))
        .select("p_partkey")
      val sq = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(broadcast(red), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum("l_quantity").as("q"))
      val pt = sq.groupBy(col("l_partkey").as("pt_partkey"))
        .agg(sum("q").as("t"))
      val heavy = sq.join(pt, col("l_partkey") === col("pt_partkey"))
        .filter(col("q") > col("t") * 0.25)
        .select("l_suppkey").distinct()
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },

    // TPC-H Q21 shape: the sole late supplier in multi-supplier orders —
    // a semi join (some OTHER supplier exists in the order) stacked with
    // an anti join (no OTHER supplier was late) over the same fact, both
    // as non-equi residuals on the order-key hash join. At scale both
    // sides shuffle once on the order key and reuse the exchange.
    "q21_sole_late_supplier" -> { (s, dir) =>
      val ordF = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey",
        "l_shipdate")
      val late = li.join(ordF, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
      val others = li.select(col("l_orderkey").as("o2_orderkey"),
        col("l_suppkey").as("o2_suppkey"))
      val lateOthers = late.select(col("l_orderkey").as("o3_orderkey"),
        col("l_suppkey").as("o3_suppkey"))
      late
        .join(others, col("l_orderkey") === col("o2_orderkey") &&
          col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
        .join(lateOthers, col("l_orderkey") === col("o3_orderkey") &&
          col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },

    // TPC-H Q19 shape: disjunctive brand/size/quantity bands — an equi
    // join on the part key whose OR-of-ANDs condition becomes a residual
    // filter on the hash join, never a cartesian. The part side carries
    // only (key, brand, size) and broadcasts.
    "q19_banded_revenue" -> { (s, dir) =>
      val part = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
      val li = t(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val bands =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#24" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey") && bands)
        .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q2_min_cost_supplier" ->
      """WITH cost AS (
        |  SELECT p_partkey, l_suppkey,
        |    MIN(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size < 10 AND p_type = 'SMALL'
        |  GROUP BY 1, 2),
        |pc AS (
        |  SELECT p_partkey, s_acctbal, s_name, n_name, unit_cost,
        |    MIN(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
        |  FROM cost
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost
        |FROM pc WHERE unit_cost = min_cost
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q9_color_profit" ->
      """SELECT n_name AS supp_nation, year(o_orderdate) AS o_year,
        |  CAST(ROUND(SUM(
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      CAST(1.0 - l_discount AS DECIMAL(8,4)) -
        |    CAST(p_retailprice AS DECIMAL(12,2)) *
        |      CAST(l_quantity AS DECIMAL(7,2)) * CAST(0.6 AS DECIMAL(2,1))
        |  ), 2) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE 'red %'
        |GROUP BY 1, 2 ORDER BY supp_nation, o_year DESC""".stripMargin,

    "q11_important_parts" ->
      s"""WITH v AS (
         |  SELECT l_partkey AS p_partkey,
         |    ${sqlMoneySum("l_extendedprice")} AS value
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'AFRICA' GROUP BY 1)
         |SELECT p_partkey, value FROM v
         |WHERE value > 0.001 * (SELECT CAST(SUM(CAST(value AS DECIMAL(18,2)))
         |  AS DOUBLE) FROM v)
         |ORDER BY value DESC, p_partkey""".stripMargin,

    "q16_supplier_variety" ->
      """SELECT p_brand, CAST(p_size // 10 AS BIGINT) AS size_bucket,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, size_bucket""".stripMargin,

    "q20_heavy_shippers" ->
      """WITH sq AS (
        |  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'red %'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY 1, 2),
        |pt AS (SELECT l_partkey, SUM(q) AS t FROM sq GROUP BY 1)
        |SELECT s_suppkey, s_name FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE' AND EXISTS (
        |  SELECT 1 FROM sq JOIN pt USING (l_partkey)
        |  WHERE sq.l_suppkey = s_suppkey AND q > 0.25 * t)
        |ORDER BY s_suppkey""".stripMargin,

    "q21_sole_late_supplier" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |SELECT s_suppkey, s_name, numwait FROM (
        |  SELECT l1.l_suppkey, COUNT(*) AS numwait FROM late l1
        |  WHERE EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey)
        |  GROUP BY 1)
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q7_trade_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  year(l_shipdate) AS l_year,
         |  ${sqlRevenueSum("l_extendedprice", "l_discount")} AS volume
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      s"""SELECT year(o_orderdate) AS o_year,
         |  ${sqlRevenueSum(
              "CASE WHEN n2.n_name = 'NATION_2' THEN l_extendedprice ELSE 0.0 END",
              "CASE WHEN n2.n_name = 'NATION_2' THEN l_discount ELSE 0.0 END")} AS nation_volume,
         |  ${sqlRevenueSum("l_extendedprice", "l_discount")} AS total_volume,
         |  ROUND(${sqlRevenueSum(
              "CASE WHEN n2.n_name = 'NATION_2' THEN l_extendedprice ELSE 0.0 END",
              "CASE WHEN n2.n_name = 'NATION_2' THEN l_discount ELSE 0.0 END")} /
         |    ${sqlRevenueSum("l_extendedprice", "l_discount")}, 6) AS mkt_share
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "q12_delay_priority" ->
      """SELECT CASE
        |    WHEN date_diff('day', o_orderdate, l_shipdate) >= 120 THEN '3-LATE'
        |    WHEN date_diff('day', o_orderdate, l_shipdate) >= 60 THEN '2-SLOW'
        |    ELSE '1-FAST' END AS delay_class,
        |  COUNT(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH'))
        |    AS high_prio_count,
        |  COUNT(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
        |    AS low_prio_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY delay_class""".stripMargin,

    "q13_order_distribution" ->
      """SELECT n_orders, COUNT(*) AS n_custs FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey)
        |GROUP BY n_orders ORDER BY n_custs DESC, n_orders DESC""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    ${sqlRevenueSum("l_extendedprice", "l_discount")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q19_banded_revenue" ->
      s"""SELECT ${sqlRevenueSum("l_extendedprice", "l_discount")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |    AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |    AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin
  )
}
