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

    // The ranking-function family in one pass: rank / dense_rank /
    // ntile / percent_rank over the same ordered partition.
    // percent_rank = (rank−1)/(n−1) divides exact integers, so the
    // double is engine-identical.
    "q_rank_family" -> { (s, dir) =>
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select("c_nationkey", "c_custkey", "c_acctbal")
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("drnk", dense_rank().over(w).cast("long"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("prnk", round(percent_rank().over(w), 6))
        .filter(col("rnk") <= 8)
        .orderBy("c_nationkey", "rnk", "c_custkey")
    },

    // Dispersion under the exactness contract: variance/stddev from
    // exact decimal Σx and Σx² (the textbook identity) instead of the
    // engines' float accumulators, whose partition-order-dependent low
    // bits can never hash-match. l_quantity is integral, so both sums
    // are exact and the derived moments are bit-identical.
    "q_dispersion_by_flag" -> { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val q = col("l_quantity").cast(DecimalType(18, 2))
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(q).as("sx"), sum(q * q).as("sxx"))
        .select(col("l_returnflag"), col("n"),
          // cast the EXACT decimal sums to double first (both are well
          // under 2^53 in their fixed-point units, so the cast is
          // lossless), then derive the moments in pure double — decimal
          // sx·sx would overflow 38 digits and silently round
          round(col("sx").cast("double") / col("n"), 6).as("mean_qty"),
          round((col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") / col("n")) /
            (col("n") - 1), 6).as("var_qty"))
        .orderBy("l_returnflag")
    },

    // Running aggregate window (ROWS UNBOUNDED PRECEDING): cumulative
    // spend along each customer's order sequence. The cumsum runs in
    // exact decimal over a deterministic total order, so every prefix is
    // engine-identical.
    "q_running_total" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("run_spend",
          round(sum(col("o_totalprice").cast(
            org.apache.spark.sql.types.DecimalType(18, 2))).over(w), 2)
            .cast("double"))
        .select(col("o_custkey"), col("o_orderkey"),
          tsSeconds(col("o_orderdate")).as("o_orderdate_s"), col("run_spend"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Exact quartile vector per segment: the percentile family beyond
    // the lower median — each quartile is the STORED value at index
    // floor((n−1)·q)+1 in the (acctbal, custkey) order, picked by
    // conditional aggregation over ranked rows. No interpolation
    // arithmetic, so both engines select identical elements.
    "q_quartiles_by_segment" -> { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val n = Window.partitionBy("c_mktsegment")
      def idx(q: Double) = (floor((col("cnt") - 1) * q) + 1).cast("long")
      t(s, dir, "customer")
        .select("c_mktsegment", "c_acctbal", "c_custkey")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(n))
        .groupBy("c_mktsegment")
        .agg(max(col("cnt")).as("n_customers"),
          max(when(col("rn") === idx(0.25), col("c_acctbal"))).as("p25"),
          max(when(col("rn") === idx(0.5), col("c_acctbal"))).as("p50"),
          max(when(col("rn") === idx(0.75), col("c_acctbal"))).as("p75"))
        .orderBy("c_mktsegment")
    },

    // Full outer join: daily order activity vs daily shipment activity —
    // days live on either side alone (orders precede the first shipment;
    // shipments trail the last order), so both null branches are
    // exercised. Both inputs pre-aggregate to one row per day before the
    // join, so the full-outer shuffle moves |days|, not |rows|.
    "q_full_outer_daily" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n_orders"))
      val l = t(s, dir, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(count(lit(1)).as("n_ships"))
      o.join(l, Seq("day"), "full")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day_s"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_ships"), lit(0L)).as("n_ships"))
        .orderBy("day_s")
    },

    // Cube (all 4 grouping sets in one pass — rollup's big sibling).
    "q_cube_flag_status" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), moneySum(col("l_quantity")).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // Cohort retention over the event stream: users grouped by their
    // first-activity week, counted at each week offset — the classic
    // product-analytics triangle. The (user, week) relation is
    // distinct BEFORE the cohort join, so each user contributes one
    // row per active week and the per-cell count needs no
    // count-distinct expand; both aggregations partially aggregate and
    // the one join is user-keyed.
    "q_user_retention" -> { (s, dir) =>
      val uw = t(s, dir, "events")
        .select(col("user_id"), expr("ts_ns div 604800000000000")
          .as("week"))
        .distinct()
      val cohort = uw.groupBy("user_id").agg(min("week").as("cohort_week"))
      uw.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("offset_weeks"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "offset_weeks")
    },

    // Rolling anomaly score over the event stream: per (type, day)
    // counts z-scored against the trailing 7 OBSERVED days (a ROWS
    // frame over per-day rows — with gaps in the day sequence it spans
    // more than 7 calendar days; calendar semantics would need a RANGE
    // frame on day) — the volume monitor an ingest pipeline alarms on. Mean/variance are derived
    // from the window's integer sum/sum-of-squares in a FIXED
    // arithmetic chain (never an engine's own stddev aggregate, whose
    // internal algorithm differs across engines), so the score is
    // IEEE-identical under the oracle. The window partitions by type
    // over per-DAY rows — the heavy lifting is the count's partial
    // aggregation; the window relation is days × types, tiny at any
    // event volume.
    "q_event_anomaly" -> { (s, dir) =>
      val e = t(s, dir, "events").select(col("event_type"),
        expr("ts_ns div 86400000000000").as("day"))
      val counts = e.groupBy("event_type", "day")
        .agg(count(lit(1)).as("c"))
      val win = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-7, -1)
      val n = count(lit(1)).over(win)
      val sD = sum(col("c")).over(win).cast("double")
      val ssD = sum(col("c") * col("c")).over(win).cast("double")
      val nD = n.cast("double")
      val variance = (ssD - sD * sD / nD) / (nD - lit(1.0))
      val z = when(n >= 3 && variance > 0.0,
        round((col("c").cast("double") - sD / nD) / sqrt(variance), 6))
      counts.select(col("event_type"), col("day"), col("c"), z.as("z"))
        .orderBy("event_type", "day")
    },

    // Offset window function (lag): average days between consecutive
    // orders per customer. Consecutive-gap sums telescope to
    // (max − min), so the result is tie-order independent by
    // construction; integer day arithmetic keeps it engine-exact.
    "q_order_gaps" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("o_custkey"),
          datediff(col("o_orderdate"), col("prev")).as("gap"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_gaps"), sum("gap").as("total_gap"))
        .select(col("o_custkey").as("c_custkey"), col("n_gaps"),
          round(col("total_gap") / col("n_gaps"), 4).as("avg_gap_days"))
        .orderBy("c_custkey")
    },

    // Z-order layout audit: interleave two min-max-normalized dimensions
    // into a Morton key (functions/ZValue.scala), bucket the table by the
    // key's top 6 bits — 64 stand-in "files" — and report each bucket's
    // per-dimension [min,max] box plus whether a point lookup on either
    // dimension's global midpoint would have to read that bucket. The
    // single-pk `sortWithinPartitions` layout prunes one column only; a
    // z-sorted layout keeps BOTH boxes narrow, and sum(hit_p)/sum(hit_s)
    // over the output IS the files-touched count that proves it. Plan: a
    // tiny 1-row min/max aggregate broadcast back onto the scan, ONE
    // map-only codegen'd projection computing z, then one aggregate whose
    // key space is bounded at 64 groups at any corpus size.
    "q_zorder_layout" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
      val mm = li.agg(
        min("l_partkey").as("pmn"), max("l_partkey").as("pmx"),
        min("l_suppkey").as("smn"), max("l_suppkey").as("smx"))
      val z = call_function("graft_zvalue",
        expr("CASE WHEN pmx = pmn THEN 0 ELSE " +
          "((l_partkey - pmn) * 65535) div (pmx - pmn) END"),
        expr("CASE WHEN smx = smn THEN 0 ELSE " +
          "((l_suppkey - smn) * 65535) div (smx - smn) END"))
      li.crossJoin(broadcast(mm))
        .select(col("l_partkey"), col("l_suppkey"),
          expr("(pmn + pmx) div 2").as("pmid"),
          expr("(smn + smx) div 2").as("smid"),
          z.as("z"))
        .groupBy(expr("z div 67108864").as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min("l_partkey").as("p_min"), max("l_partkey").as("p_max"),
          min("l_suppkey").as("s_min"), max("l_suppkey").as("s_max"),
          min("pmid").as("pmid"), min("smid").as("smid"))
        .select(col("bucket"), col("n_rows"),
          col("p_min"), col("p_max"), col("s_min"), col("s_max"),
          when(col("p_min") <= col("pmid") && col("pmid") <= col("p_max"),
            1L).otherwise(0L).as("hit_p"),
          when(col("s_min") <= col("smid") && col("smid") <= col("s_max"),
            1L).otherwise(0L).as("hit_s"))
        .orderBy("bucket")
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
    },

    // TPC-H Q4 shape: correlated EXISTS with an inequality — a semi join
    // whose condition mixes the equi key with a non-equi residual. Spark
    // hash-joins on the key and applies the residual as a join filter;
    // no cartesian anywhere, both sides pruned to 3/2 columns at scan.
    "q4_late_shipment" -> { (s, dir) =>
      val ord = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      ord.join(li,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q14 shape: conditional aggregation over a fact-dim join.
    // The date filter prunes the fact scan; `part` broadcasts. The ratio
    // divides the two already-rounded exact sums (deterministic doubles),
    // never raw float aggregates.
    "q14_promo_share" -> { (s, dir) =>
      val part = t(s, dir, "part").select("p_partkey", "p_type")
      val promoRev = revenueSum(
        when(col("p_type") === "PROMO", col("l_extendedprice")).otherwise(0.0),
        when(col("p_type") === "PROMO", col("l_discount")).otherwise(0.0))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .select("l_partkey", "l_extendedprice", "l_discount")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(promoRev.as("promo_revenue"),
          revenueSum(col("l_extendedprice"), col("l_discount")).as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 4)
            .as("promo_pct"))
    },

    // TPC-H Q17 shape: correlated scalar subquery (per-part average) —
    // decorrelated by hand into an aggregate + self-join, with the brand
    // filter applied BEFORE both lineitem passes (broadcast semi via the
    // tiny filtered part side) so neither aggregates the full fact table.
    // l_quantity is integral, so the double average is order-independent
    // (exact integer sums < 2^53) and matches DuckDB bit-for-bit.
    "q17_small_qty_revenue" -> { (s, dir) =>
      val brandParts = broadcast(
        t(s, dir, "part").filter(col("p_brand") === "Brand#23")
          .select("p_partkey"))
      val li = t(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(brandParts, col("l_partkey") === col("p_partkey"))
      val halfAvg = li.groupBy(col("l_partkey").as("ap_partkey"))
        .agg((avg("l_quantity") * 0.5).as("half_avg"))
      li.join(halfAvg, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < col("half_avg"))
        .agg(moneySum(col("l_extendedprice")).as("small_qty_revenue"),
          count(lit(1)).as("n_items"))
    },

    // TPC-H Q18 shape: HAVING on a fact aggregate driving a join back to
    // the dimensions — the aggregate output (46 orders at sf0.01) is tiny,
    // so AQE broadcasts it into orders/customer; the only wide stage is
    // the per-order quantity sum.
    "q18_large_orders" -> { (s, dir) =>
      val bigOrders = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("total_qty"))
        .filter(col("total_qty") > 300)
      val cust = t(s, dir, "customer").select("c_custkey", "c_name")
      t(s, dir, "orders")
        .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          tsSeconds(col("o_orderdate")).as("o_orderdate_s"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },

    // As-of join (operator Spark lacks natively — operators/AsOfJoin):
    // every purchase enriched with the user's most recent click at or
    // before it. One shuffle + one sort via the union-tag running
    // window; timestamps compared on exact ns longs.
    "q_asof_purchase_click" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts_ns", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_event_id"),
          col("ts_ns"))
      graft.operators.AsOfJoin
        .backward(purchases, clicks, Seq("user_id"), "ts_ns", "ts_ns")
        .select(col("event_id"), col("user_id"),
          tsSeconds(expr("timestamp_micros(ts_ns div 1000)")).as("p_ts_s"),
          col("value"),
          col("asof.click_event_id").as("click_event_id"),
          tsSeconds(expr("timestamp_micros(asof.ts_ns div 1000)"))
            .as("click_ts_s"),
          expr("(ts_ns - asof.ts_ns) div 1000000000").as("gap_s"))
        .orderBy("event_id")
    },

    // Strict-order conversion funnel over the event stream: first
    // signup, first view within 7 days AFTER it, first purchase within
    // 7 days after THAT view. Each stage is a min-aggregate + re-join
    // on the user key — the same partitioning every stage reuses; no
    // window over the whole stream, no event-pair explosion. Stage
    // math runs on whole-second longs: Spark reads the parquet ns
    // column exactly while DuckDB truncates it to µs at scan, so
    // seconds are the finest granularity both engines agree on
    // bit-for-bit (the package doc's tsSeconds rule, applied to
    // arithmetic, not just output).
    "q_funnel_signup_view_purchase" -> { (s, dir) =>
      val week = 604800L // 7 days in seconds
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("ts_ns div 1000000000").as("ts_s"))
      val signup = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts_s").as("t_signup"))
      val view = ev.filter(col("event_type") === "view")
        .join(signup, "user_id")
        .filter(col("ts_s") > col("t_signup") &&
          col("ts_s") <= col("t_signup") + week)
        .groupBy("user_id").agg(min("ts_s").as("t_view"))
      val purchase = ev.filter(col("event_type") === "purchase")
        .join(view, "user_id")
        .filter(col("ts_s") > col("t_view") &&
          col("ts_s") <= col("t_view") + week)
        .groupBy("user_id").agg(min("ts_s").as("t_purchase"))
      signup.join(view, Seq("user_id"), "left")
        .join(purchase, Seq("user_id"), "left")
        .orderBy("user_id")
    },

    // Discrete median (percentile family) with exact semantics: the
    // lower-median element per group selected by row_number — no
    // interpolation arithmetic, so Spark and DuckDB pick the identical
    // stored value (cross-engine float interpolation differs in the
    // last bit and is unhashable).
    "q_median_acctbal_by_segment" -> { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val n = Window.partitionBy("c_mktsegment")
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(n))
        .filter(col("rn") === expr("(cnt + 1) div 2"))
        .select(col("c_mktsegment"), col("cnt").as("n_customers"),
          col("c_acctbal").as("median_acctbal"))
        .orderBy("c_mktsegment")
    },

    // Pivot (wide conditional aggregation): order counts per priority,
    // one column per status — Spark's relational pivot; the oracle is
    // the equivalent CASE-based conditional aggregation.
    "q_pivot_status_by_priority" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")
    },

    // Banded range join (operators/RangeJoin): clicks in the hour
    // before each purchase, as an EQUI join on (user, time-bucket) + an
    // exact range filter — never the per-key cartesian a naive
    // inequality join plans. Left join back to keep zero-click
    // purchases at n = 0.
    "q_range_clicks_before_purchase" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts_ns")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_ns"))
      val hourNs = 3600L * 1000000000L
      val counts = graft.operators.RangeJoin
        .within(purchases, clicks, Seq("user_id"), "ts_ns", "ts_ns",
          lowerNs = -hourNs, upperNs = -1L)
        .groupBy("event_id").agg(count(lit(1)).as("n_clicks"))
      purchases.join(counts, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"),
          tsSeconds(expr("timestamp_micros(ts_ns div 1000)")).as("p_ts_s"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
        .orderBy("event_id")
    },

    // TPC-H Q22 shape: scalar aggregate subquery (global threshold) +
    // anti join. The 1-row threshold cross-joins in as a broadcast; the
    // threshold itself is an exact-decimal sum divided in double so both
    // engines derive the identical bit pattern.
    "q22_idle_rich_customers" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val thr = cust.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("thr"))
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey"))
      cust.crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("thr"))
        .join(urgent, Seq("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
          moneySum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy("c_mktsegment")
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

    "q_rank_family" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, rnk, drnk, quartile, prnk
        |FROM (SELECT c_nationkey, c_custkey, c_acctbal,
        |    rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |    ntile(4) OVER w AS quartile,
        |    ROUND(percent_rank() OVER w, 6) AS prnk
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal DESC, c_custkey))
        |WHERE rnk <= 8 ORDER BY c_nationkey, rnk, c_custkey""".stripMargin,

    "q_dispersion_by_flag" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  ROUND(CAST(SUM(q) AS DOUBLE) / COUNT(*), 6) AS mean_qty,
        |  ROUND((CAST(SUM(q * q) AS DOUBLE) -
        |      CAST(SUM(q) AS DOUBLE) * CAST(SUM(q) AS DOUBLE) / COUNT(*)) /
        |    (COUNT(*) - 1), 6) AS var_qty
        |FROM (SELECT l_returnflag, CAST(l_quantity AS DECIMAL(18,2)) AS q
        |      FROM lineitem)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_running_total" ->
      s"""SELECT o_custkey, o_orderkey,
         |  ${sqlTsSeconds("o_orderdate")} AS o_orderdate_s,
         |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |    ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE) AS run_spend
         |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_quartiles_by_segment" ->
      """SELECT c_mktsegment, MAX(cnt) AS n_customers,
        |  MAX(CASE WHEN rn = FLOOR((cnt - 1) * 0.25) + 1 THEN c_acctbal END)
        |    AS p25,
        |  MAX(CASE WHEN rn = FLOOR((cnt - 1) * 0.5) + 1 THEN c_acctbal END)
        |    AS p50,
        |  MAX(CASE WHEN rn = FLOOR((cnt - 1) * 0.75) + 1 THEN c_acctbal END)
        |    AS p75
        |FROM (SELECT c_mktsegment, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal, c_custkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY c_mktsegment) AS cnt
        |  FROM customer)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_full_outer_daily" ->
      """SELECT strftime(COALESCE(o.day, l.day), '%Y-%m-%d') AS day_s,
        |  COALESCE(n_orders, 0) AS n_orders, COALESCE(n_ships, 0) AS n_ships
        |FROM (SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders
        |      FROM orders GROUP BY 1) o
        |FULL JOIN (SELECT CAST(l_shipdate AS DATE) AS day, COUNT(*) AS n_ships
        |      FROM lineitem GROUP BY 1) l USING (day)
        |ORDER BY day_s""".stripMargin,

    "q_cube_flag_status" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${sqlMoneySum("l_quantity")} AS qty
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_user_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 604800000000000 AS week FROM events),
        |c AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1)
        |SELECT cohort_week, week - cohort_week AS offset_weeks,
        |  COUNT(*) AS n_users
        |FROM uw JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_event_anomaly" ->
      """WITH e AS (SELECT event_type,
        |    epoch_ns(ts) // 86400000000000 AS day FROM events),
        |c AS (SELECT event_type, day, COUNT(*) AS c FROM e GROUP BY 1, 2),
        |w AS (SELECT event_type, day, c,
        |    SUM(c) OVER win AS s, SUM(c * c) OVER win AS ss,
        |    COUNT(*) OVER win AS n
        |  FROM c WINDOW win AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, c,
        |  CASE WHEN n >= 3 AND
        |      (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |        / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) > 0.0
        |    THEN round((CAST(c AS DOUBLE)
        |        - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |      / sqrt((CAST(ss AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) - 1.0)), 6)
        |    ELSE NULL END AS z
        |FROM w ORDER BY event_type, day""".stripMargin,

    "q_order_gaps" ->
      """SELECT o_custkey AS c_custkey, COUNT(*) AS n_gaps,
        |  ROUND(CAST(SUM(gap) AS DOUBLE) / COUNT(*), 4) AS avg_gap_days
        |FROM (
        |  SELECT o_custkey,
        |    date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS gap
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |WHERE gap IS NOT NULL
        |GROUP BY o_custkey ORDER BY c_custkey""".stripMargin,

    // Mirrors the engine bit-for-bit: same min-max normalization in
    // integer arithmetic, the same Morton shift-mask cascade (masks
    // 0x00FF00FF/0x0F0F0F0F/0x33333333/0x55555555 in decimal), stepwise
    // through REPLACE CTEs.
    "q_zorder_layout" ->
      """WITH mm AS (
        |  SELECT MIN(l_partkey) AS pmn, MAX(l_partkey) AS pmx,
        |         MIN(l_suppkey) AS smn, MAX(l_suppkey) AS smx FROM lineitem),
        |n AS (
        |  SELECT l_partkey, l_suppkey,
        |    CASE WHEN pmx = pmn THEN 0
        |      ELSE ((l_partkey - pmn) * 65535) // (pmx - pmn) END AS px,
        |    CASE WHEN smx = smn THEN 0
        |      ELSE ((l_suppkey - smn) * 65535) // (smx - smn) END AS sx,
        |    (pmn + pmx) // 2 AS pmid, (smn + smx) // 2 AS smid
        |  FROM lineitem, mm),
        |s1 AS (SELECT * REPLACE (((px | (px << 8)) & 16711935) AS px,
        |                         ((sx | (sx << 8)) & 16711935) AS sx) FROM n),
        |s2 AS (SELECT * REPLACE (((px | (px << 4)) & 252645135) AS px,
        |                         ((sx | (sx << 4)) & 252645135) AS sx) FROM s1),
        |s3 AS (SELECT * REPLACE (((px | (px << 2)) & 858993459) AS px,
        |                         ((sx | (sx << 2)) & 858993459) AS sx) FROM s2),
        |s4 AS (SELECT * REPLACE (((px | (px << 1)) & 1431655765) AS px,
        |                         ((sx | (sx << 1)) & 1431655765) AS sx) FROM s3),
        |b AS (
        |  SELECT (px | (sx << 1)) // 67108864 AS bucket, COUNT(*) AS n_rows,
        |    MIN(l_partkey) AS p_min, MAX(l_partkey) AS p_max,
        |    MIN(l_suppkey) AS s_min, MAX(l_suppkey) AS s_max,
        |    MIN(pmid) AS pmid, MIN(smid) AS smid
        |  FROM s4 GROUP BY 1)
        |SELECT bucket, n_rows, p_min, p_max, s_min, s_max,
        |  CAST(CASE WHEN p_min <= pmid AND pmid <= p_max
        |    THEN 1 ELSE 0 END AS BIGINT) AS hit_p,
        |  CAST(CASE WHEN s_min <= smid AND smid <= s_max
        |    THEN 1 ELSE 0 END AS BIGINT) AS hit_s
        |FROM b ORDER BY bucket""".stripMargin,

    "q_distinct_parts_per_brand" ->
      """SELECT p_brand, COUNT(DISTINCT p_type) AS n_types,
        |  COUNT(DISTINCT p_size) AS n_sizes
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_json_props_bucket" ->
      s"""SELECT CAST(props->>'k' AS BIGINT) % 10 AS k_bucket, COUNT(*) AS n,
         |  ${sqlMoneySum("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin,

    "q4_late_shipment" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q14_promo_share" ->
      s"""SELECT ${sqlRevenueSum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice ELSE 0.0 END",
            "CASE WHEN p_type = 'PROMO' THEN l_discount ELSE 0.0 END")} AS promo_revenue,
         |  ${sqlRevenueSum("l_extendedprice", "l_discount")} AS total_revenue,
         |  ROUND(100.0 * ${sqlRevenueSum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice ELSE 0.0 END",
            "CASE WHEN p_type = 'PROMO' THEN l_discount ELSE 0.0 END")} /
         |    ${sqlRevenueSum("l_extendedprice", "l_discount")}, 4) AS promo_pct
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""".stripMargin,

    "q17_small_qty_revenue" ->
      s"""SELECT ${sqlMoneySum("l_extendedprice")} AS small_qty_revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE p_brand = 'Brand#23'
         |  AND l_quantity < (SELECT 0.5 * AVG(l_quantity)
         |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,

    "q18_large_orders" ->
      s"""SELECT c_custkey, c_name, o_orderkey,
         |  ${sqlTsSeconds("o_orderdate")} AS o_orderdate_s,
         |  o_totalprice, SUM(l_quantity) AS total_qty
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
         |HAVING SUM(l_quantity) > 300
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_funnel_signup_view_purchase" ->
      """WITH e AS (SELECT user_id, event_type,
        |             epoch_ns(ts) // 1000000000 AS ts_s
        |           FROM events),
        |s AS (SELECT user_id, MIN(ts_s) AS t_signup FROM e
        |      WHERE event_type = 'signup' GROUP BY 1),
        |v AS (SELECT e.user_id, MIN(e.ts_s) AS t_view
        |      FROM e JOIN s USING (user_id)
        |      WHERE e.event_type = 'view' AND e.ts_s > s.t_signup
        |        AND e.ts_s <= s.t_signup + 604800
        |      GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts_s) AS t_purchase
        |      FROM e JOIN v USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts_s > v.t_view
        |        AND e.ts_s <= v.t_view + 604800
        |      GROUP BY 1)
        |SELECT s.user_id, s.t_signup, v.t_view, p.t_purchase
        |FROM s LEFT JOIN v USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q_median_acctbal_by_segment" ->
      """SELECT c_mktsegment, cnt AS n_customers,
        |  c_acctbal AS median_acctbal
        |FROM (SELECT c_mktsegment, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal, c_custkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY c_mktsegment) AS cnt
        |  FROM customer)
        |WHERE rn = (cnt + 1) // 2 ORDER BY c_mktsegment""".stripMargin,

    "q_pivot_status_by_priority" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
        |  COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_range_clicks_before_purchase" ->
      s"""WITH p AS (SELECT user_id, event_id, ts FROM events
         |  WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
         |SELECT p.event_id, p.user_id, ${sqlTsSeconds("p.ts")} AS p_ts_s,
         |  COUNT(c.ts) AS n_clicks
         |FROM p LEFT JOIN c ON p.user_id = c.user_id
         |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
         |GROUP BY p.event_id, p.user_id, p.ts
         |ORDER BY p.event_id""".stripMargin,

    "q_asof_purchase_click" ->
      s"""WITH p AS (SELECT user_id, event_id, ts, value FROM events
         |  WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, event_id, ts FROM events
         |  WHERE event_type = 'click')
         |SELECT p.event_id, p.user_id,
         |  ${sqlTsSeconds("p.ts")} AS p_ts_s, p.value,
         |  c.event_id AS click_event_id,
         |  ${sqlTsSeconds("c.ts")} AS click_ts_s,
         |  (epoch_ns(p.ts) - epoch_ns(c.ts)) // 1000000000 AS gap_s
         |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
         |ORDER BY p.event_id""".stripMargin,

    "q22_idle_rich_customers" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
         |  ${sqlMoneySum("c_acctbal")} AS sum_acctbal
         |FROM customer
         |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
         |    AS DOUBLE) / COUNT(*) FROM customer WHERE c_acctbal > 0)
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |    AND o_orderpriority = '1-URGENT')
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
