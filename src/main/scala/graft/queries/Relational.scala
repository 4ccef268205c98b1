package graft.queries

import graft.Tables
import graft.operators.{Dedup, Ranks}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Lineage.LineageOps

/** Relational operator coverage (SURVEY.md §2.8: categories the reference has
  * no implementation for — joins, aggregates, windows, rollup, set ops,
  * semi/anti joins, top-k). All declared through the DataFrame API so
  * Catalyst keeps predicate pushdown, column pruning, broadcast selection and
  * AQE in play; only genuinely dimensional tables are broadcast explicitly.
  *
  * Float discipline for the DuckDB oracle: every SUM over doubles goes
  * through an exact DECIMAL accumulator and is cast back to double, so the
  * result is independent of partial-aggregation order on both engines.
  */
object Relational {
  private type Q = (SparkSession, String) => DataFrame

  /** Order-insensitive exact sum of a 2-decimal money column. */
  private def exactSum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Order-insensitive exact sum of price*(1-discount) (double product is
    * deterministic per-row; the sum is made exact via decimal). The final
    * rescale to 2 decimals keeps the unscaled value < 2^53 so the
    * decimal→double conversion is exact on both Spark and DuckDB. */
  private def revenue(price: Column, disc: Column): Column =
    sum((price * (lit(1.0) - disc)).cast("decimal(28,10)"))
      .cast("decimal(38,2)").cast("double")

  val queries: Map[String, Q] = Map(
    // TPC-H Q1 flavor: scan-heavy group-aggregate; filter pushed to parquet.
    "q1_agg" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_quantity") <= 45)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          exactSum(col("l_quantity")).as("sum_qty"),
          exactSum(col("l_extendedprice")).as("sum_base_price"),
          revenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // TPC-H Q3 flavor: 3-way join + agg + top-k by computed measure.
    "q3_join" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 flavor: 6-way join; region/nation are broadcast dims.
    "q5_join" -> { (s, dir) =>
      val region = broadcast(Tables(s, dir, "region"))
      val nation = broadcast(Tables(s, dir, "nation"))
      val supplier = Tables(s, dir, "supplier")
      val customer = Tables(s, dir, "customer")
      val orders = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val lineitem = Tables(s, dir, "lineitem")
      customer
        .join(orders, col("c_custkey") === col("o_custkey"))
        .join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .join(supplier, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(nation, col("s_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(desc("revenue"), asc("n_name"))
    },

    // TPC-H Q9 flavor (profit by nation and year): the canonical 5-way
    // fact-to-dims join. The testdata ships no partsupp, so supply cost is
    // proxied as p_retailprice·0.1 per unit — the SHAPE is the point:
    // part (filtered, broadcast) and nation (broadcast) prune lineitem
    // map-side, supplier/orders join on their keys, and profit follows the
    // proven q3_join decimal discipline (textually identical double
    // arithmetic inside a DECIMAL(28,10) accumulator, ROUND(...,2) out).
    "q9_profit" -> { (s, dir) =>
      val part = broadcast(Tables(s, dir, "part")
        .filter(col("p_name").contains("red")))
      val nation = broadcast(Tables(s, dir, "nation"))
      Tables(s, dir, "lineitem")
        .join(part, col("l_partkey") === col("p_partkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(nation, col("s_nationkey") === col("n_nationkey"))
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
            col("p_retailprice") * lit(0.1) * col("l_quantity"))
            .cast("decimal(28,10)"))
          .cast("decimal(38,2)").cast("double").as("sum_profit"))
        .orderBy(asc("nation"), desc("o_year"))
    },

    // TPC-H Q18 flavor (large-volume customers): aggregate-HAVING
    // semi-join — orders qualify via a slim (orderkey, total qty)
    // aggregate, the qualifier reaches orders as a LEFT SEMI join (never
    // materialized into the output), and the bounded top-100 is
    // TakeOrdered, not a global sort. Quantities are integral doubles →
    // exact BIGINT sums.
    "q18_big_orders" -> { (s, dir) =>
      val l = Tables(s, dir, "lineitem")
      val big = l.groupBy("l_orderkey")
        .agg(expr("CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)").as("q"))
        .filter(col("q") > 250)
        .select(col("l_orderkey").as("bk"))
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders")
            .join(big, col("o_orderkey") === col("bk"), "left_semi"),
          col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(expr("CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)").as("total_qty"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(100)
    },

    // Exact order-statistic quantiles (p50/p90/p99 of per-customer spend):
    // the EXACT complement of approx_percentile, via the decomposed global
    // rank ([[Ranks]]) — position ⌈n·k/100⌉ in the (cents, custkey) total
    // order, all integer arithmetic, no single-partition sort. The
    // positions come from the bounded bucket gather as literals; a 3-row
    // broadcast picks the quantile rows.
    "q_exact_quantiles" -> { (s, dir) =>
      val per = Tables(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)").as("cents"))
      val b = Ranks.bucketRange(per, Seq(col("cents").asc, col("o_custkey").asc))
      val pos = Seq(50L, 90L, 99L).map(k => (k, (b.rowTotal * k + 99) / 100))
      import s.implicits._
      b.withRowNumber("i").result
        .join(broadcast(pos.toDF("pctl", "pos")), col("i") === col("pos"))
        .select(col("pctl"), col("pos"), col("cents"))
        .orderBy("pctl")
    },

    // Top-k: TakeOrderedAndProject — no global sort at scale.
    "q_topk" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(15)
    },

    // Window functions: rank + running sum per customer (single shuffle).
    "q_window" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("running_spend"))
        .orderBy("o_custkey", "rn")
    },

    // Grouping sets via ROLLUP (partial aggregates stay map-side).
    "q_rollup" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(exactSum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // Exact distinct aggregation (expand + two-phase agg).
    "q_distinct" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("distinct_parts"), count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // Left-semi join (EXISTS).
    "q_semi_join" -> { (s, dir) =>
      val o = Tables(s, dir, "orders").filter(col("o_orderstatus") === "O")
      Tables(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Left-anti join (NOT EXISTS): customers with no in-progress order.
    "q_anti_join" -> { (s, dir) =>
      val o = Tables(s, dir, "orders").filter(col("o_orderstatus") === "P")
      Tables(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Set operation: INTERSECT (customers with both F and O orders).
    "q_setop" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      val op = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
      f.intersect(op).orderBy("custkey")
    },

    // Pivot: event-type counts per user as columns (conditional agg).
    "q_pivot" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .count()
        .na.fill(0L)
        .orderBy("user_id")
    },

    // Per-group top-k: top-3 highest-value events per type. Event types
    // are FEW and corpus-sized — a partitionBy(type) rank window would
    // sort each type's full event stream in one task. [[Ranks.groupedTopK]]
    // keeps a local top-3 per (input partition, type) first, so the final
    // per-type rank touches ≤ 3·P rows per group.
    "q_topk_grouped" -> { (s, dir) =>
      Ranks.groupedTopK(
          Tables(s, dir, "events").select("event_type", "event_id", "value"),
          "event_type", Seq(col("value").desc, col("event_id").asc), 3, "rnk")
        .withColumn("rnk", col("rnk").cast("int"))
        .orderBy("event_type", "rnk")
    },

    // Percentiles: interpolated median/p90 per event type (floor-scaled).
    "q_percentiles" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(
          floor(expr("percentile(value, 0.5)") * 100).cast("long").as("med"),
          floor(expr("percentile(value, 0.9)") * 100).cast("long").as("p90"))
        .orderBy("event_type")
    },

    // Correlated scalar subquery (decorrelated by Catalyst into a join).
    "q_scalar_subquery" -> { (s, dir) =>
      Tables(s, dir, "customer").createOrReplaceTempView("customer_v")
      Tables(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c_custkey,
          |  (SELECT COUNT(*) FROM orders_v o WHERE o.o_custkey = c.c_custkey) AS n_orders,
          |  (SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM orders_v o WHERE o.o_custkey = c.c_custkey) AS max_price
          |FROM customer_v c ORDER BY c_custkey""".stripMargin)
    },

    // Explicit GROUPING SETS with grouping() flags — the third member of
    // the multi-grain family (rollup/cube cover the prefix/power-set
    // cases; arbitrary set lists need the Expand operator directly).
    "q_grouping_sets" -> { (s, dir) =>
      Tables(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
          |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
          |  COUNT(*) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
          |                        (o_orderstatus, o_orderpriority))
          |ORDER BY g_status, g_prio,
          |  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    },

    // Correlated EXISTS with a non-equi conjunct (the TPC-H Q4 shape:
    // orders with a late-shipping line item). Decorrelates to a left-semi
    // hash join on l_orderkey with the inequality as a join residual —
    // a different path than q_semi_join's pure equi-EXISTS.
    "q_exists_subquery" -> { (s, dir) =>
      Tables(s, dir, "orders").createOrReplaceTempView("orders_ex")
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_ex")
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS n_orders
          |FROM orders_ex o
          |WHERE EXISTS (
          |  SELECT 1 FROM lineitem_ex l
          |  WHERE l.l_orderkey = o.o_orderkey
          |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    },

    // Join-key skew diagnostics — the report you run BEFORE picking a
    // salting factor or AQE skew threshold on a 100 TB join: top-20
    // heaviest keys with integer-exact corpus share (ppm). One partial-agg
    // shuffle on the slim key; the 1-row total broadcasts; bounded top-k.
    "q_skew_report" -> { (s, dir) =>
      val counts = Tables(s, dir, "lineitem")
        .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("total"))
      counts.crossJoin(broadcast(tot))
        .select(col("l_suppkey"), col("n"),
          expr("n * 1000000 div total").as("share_ppm"))
        .orderBy(col("n").desc, col("l_suppkey"))
        .limit(20)
    },

    // Scalar function breadth: date/string/math over a deterministic
    // subset, every expression mirrored 1:1 in the oracle.
    "q_scalar_funcs" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .filter(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          upper(col("o_orderpriority")).as("prio_upper"),
          substring(col("o_orderpriority"), 1, 1).as("prio_code"),
          length(col("o_orderpriority")).cast("long").as("prio_len"),
          concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
          replace(col("o_orderpriority"), lit("-"), lit("_")).as("prio_snake"),
          abs(col("o_custkey") - lit(750)).cast("long").as("dist"),
          floor(sqrt(col("o_totalprice")) * 100).cast("long").as("sqrt_cents"),
          pmod(col("o_orderkey"), lit(7)).as("bucket7"),
          greatest(col("o_custkey"), col("o_orderkey")).as("gk"),
          least(col("o_custkey"), col("o_orderkey")).as("lk"))
        .orderBy("o_orderkey")
    },

    // CUBE grouping sets over events (exact counts, decimal-exact sums).
    "q_cube" -> { (s, dir) =>
      Tables(s, dir, "events")
        .withColumn("bucket", pmod(col("user_id"), lit(10)))
        .cube("event_type", "bucket")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy(asc_nulls_first("event_type"), asc_nulls_first("bucket"))
    },

    // HLL sketches / approximate distinct (rows-only: estimates are
    // engine-specific by design; exact-distinct parity is q_distinct).
    "q_approx_distinct" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          hll_sketch_estimate(hll_sketch_agg(col("l_suppkey"))).as("approx_supps"))
        .orderBy("l_returnflag")
    },

    // Set operation: EXCEPT (customers with no in-progress order).
    "q_except" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_custkey").as("custkey"))
      val o = Tables(s, dir, "orders").filter(col("o_orderstatus") === "P")
        .select(col("o_custkey").as("custkey"))
      c.except(o).orderBy("custkey")
    },

    // FULL OUTER join with both null branches genuinely populated:
    // high-balance customers vs per-customer big-order aggregates. The
    // branch tag proves preserved-side semantics on each side. Shuffled
    // hash/sort-merge join on the slim key — at 100 TB both sides reduce
    // to per-key aggregates before the join, so the exchange carries
    // aggregate rows, not raw orders.
    "q_full_outer" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
        .filter(col("c_acctbal") > 7000)
        .select(col("c_custkey"), col("c_acctbal").as("acctbal"))
      val o = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > 250000)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_big"), exactSum(col("o_totalprice")).as("big_total"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          when(col("c_custkey").isNull, lit("order_only"))
            .when(col("o_custkey").isNull, lit("cust_only"))
            .otherwise(lit("both")).as("branch"),
          col("acctbal"), col("n_big"), col("big_total"))
        .orderBy("custkey")
    },

    // Aggregate-function breadth: conditional counting, boolean
    // aggregates, deterministic argmin/argmax (unique composite measure —
    // price cents then orderkey as tiebreak), interpolated median floored
    // to cents. All partial-aggregatable: one slim shuffle per group key.
    "q_agg_breadth" -> { (s, dir) =>
      val m = (floor(col("o_totalprice") * 100).cast("long") * lit(10000000L)
        + col("o_orderkey")).as("m")
      Tables(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus"), m)
        .groupBy("o_orderpriority")
        .agg(
          count_if(col("o_totalprice") > 250000).as("n_big"),
          bool_and(col("o_totalprice") > 2000).cast("long").as("all_above_2k"),
          bool_or(col("o_orderstatus") === "F").cast("long").as("any_final"),
          max_by(col("o_orderkey"), col("m")).as("key_of_max"),
          min_by(col("o_orderkey"), col("m")).as("key_of_min"),
          floor(median(col("o_totalprice")) * 100).cast("long").as("median_cents"))
        .orderBy("o_orderpriority")
    },

    // Statistical moments (mean/stddev/skewness/covariance/correlation)
    // via exact decimal power sums — the mergeable "moment sketch": one
    // map-side-combining shuffle of 7 numbers per group, then the
    // statistics derive in the driver-side projection. The derivation
    // expressions are textually identical in the oracle, so every double
    // op (IEEE +,-,*,/,sqrt are correctly rounded) produces bit-equal
    // results; the power sums themselves are order-independent decimals.
    // At 100 TB this replaces three separate Welford passes (stddev_pop,
    // covar_pop, corr) with one scan.
    "q_stats_moments" -> { (s, dir) =>
      val x = col("l_quantity")
      val y = col("l_discount")
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(x.cast("decimal(18,0)")).cast("double").as("sx"),
          sum((x * x).cast("decimal(18,0)")).cast("double").as("sxx"),
          sum((x * x * x).cast("decimal(28,0)")).cast("double").as("sxxx"),
          sum(y.cast("decimal(18,2)")).cast("double").as("sy"),
          sum((y * y).cast("decimal(18,4)")).cast("double").as("syy"),
          sum((x * y).cast("decimal(18,2)")).cast("double").as("sxy"))
        .selectExpr(
          "l_returnflag", "n",
          "sx / n AS mean_qty",
          "sqrt(sxx / n - (sx / n) * (sx / n)) AS std_qty",
          "(sxxx / n - 3 * (sx / n) * (sxx / n) + 2 * (sx / n) * (sx / n) * (sx / n)) / ((sxx / n - (sx / n) * (sx / n)) * sqrt(sxx / n - (sx / n) * (sx / n))) AS skew_qty",
          "sy / n AS mean_disc",
          "(n * sxy - sx * sy) / (n * n) AS covar_qd",
          "(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_qd")
        .orderBy("l_returnflag")
    },

    // Deequ-style expectations suite: five declared constraints evaluated
    // in ONE scan (conditional counts + exact uniqueness), integer-ppm
    // metrics, pass/fail against per-check thresholds. The acctbal range
    // check is deliberately tuned to FAIL (negative balances exist) so
    // the report proves both branches.
    "q_data_quality" -> { (s, dir) =>
      import graft.operators.DataQuality
      import graft.operators.DataQuality.{Check, UniqueCheck}
      DataQuality.report(
        Tables(s, dir, "customer"),
        Seq(
          Check("complete", "c_name", col("c_name").isNotNull),
          Check("format", "c_name", col("c_name").rlike("^Customer#[0-9]{9}$")),
          Check("range", "c_acctbal", col("c_acctbal").between(0, 10000), thresholdPpm = 950000L),
          Check("domain", "c_mktsegment", col("c_mktsegment").isin(
            "AUTOMOBILE", "MACHINERY", "FURNITURE", "HOUSEHOLD", "BUILDING"))),
        Seq(UniqueCheck("c_custkey")))
    },

    // Weighted PageRank centrality of suppliers in the co-supply network
    // (edge weight = orders shared). Rows-only per the float-iteration
    // discipline (20 rounds of double arithmetic have no engine-exact SQL
    // twin); PageRankSpec proves the operator against a dense local
    // power iteration. Ranks reported as floor-scaled ppb.
    "q_pagerank" -> { (s, dir) =>
      // fan out the unsplittable scan on the self-join key (Tables.fanOutOn
      // scaladoc): the co-supply pair join is the query's heavy stage and
      // otherwise runs single-threaded at local file sizes
      val li = Tables.fanOutOn(
        Tables(s, dir, "lineitem").select("l_orderkey", "l_suppkey"), "l_orderkey")
      val pairs = li.as("a").join(li.as("b"), "l_orderkey")
        .filter(col("a.l_suppkey") < col("b.l_suppkey"))
        .groupBy(col("a.l_suppkey").as("s1"), col("b.l_suppkey").as("s2"))
        .agg(count(lit(1)).cast("double").as("w"))
      val edges = pairs.union(pairs.select(col("s2"), col("s1"), col("w")))
      // 5-round budget: the near-complete weighted co-supply graph mixes
      // in ~3 rounds (second eigenvalue far below alpha), so the head
      // ordering is stable well before the cut; local-mode round cost is
      // scheduling-bound (~0.6 s/round), so the budget IS the wall time.
      // PageRankSpec proves operator convergence separately at 20+ rounds.
      graft.operators.Graph.pageRank(edges, "s1", "s2", Some("w"), iters = 5)
        .select(col("node").as("suppkey"),
          floor(col("rank") * 1e9).cast("long").as("rank_ppb"))
        .orderBy(desc("rank_ppb"), asc("suppkey"))
        .limit(20)
    },

    // Z-order layout audit: the Morton key (native interleave_bits
    // kernel) clusters rows close in BOTH (partkey, suppkey); cutting the
    // z-range into 16 equal slices — exactly what range-partitioning on
    // the key would produce as files — shows every slice covering a
    // bounded box in both dimensions, i.e. min-max pruning works for
    // predicates on EITHER column. Pure integer arithmetic: the oracle
    // re-derives the same key from shift/mask magic numbers.
    "q_zorder_layout" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .withColumn("zkey",
          graft.functions.InterleaveBits(col("l_partkey"), col("l_suppkey")))
      val zmax = li.agg(max("zkey").as("zmax"))
      li.crossJoin(broadcast(zmax))
        .withColumn("bucket", expr("zkey * 16 div (zmax + 1)"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
          min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
        .orderBy("bucket")
    },

    // Hilbert-layout audit (the locality sibling of q_zorder_layout):
    // rows mapped onto the 256x256 Hilbert curve, the curve range cut
    // into 16 equal slices — every slice must cover a bounded box in
    // BOTH dimensions. Pure integer arithmetic: the oracle re-derives
    // the curve position by unrolling the 8 quadrant-rotation rounds as
    // CASE/bit CTE steps, so the codegen'd kernel is oracle-proven like
    // InterleaveBits, not just spec-proven.
    "q_hilbert_layout" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .selectExpr("l_partkey % 256 AS xm", "l_suppkey % 256 AS ym")
        .withColumn("hkey",
          graft.functions.HilbertKey(col("xm"), col("ym"), 8))
      li.withColumn("bucket", expr("hkey div 4096"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min("xm").as("min_x"), max("xm").as("max_x"),
          min("ym").as("min_y"), max("ym").as("max_y"))
        .orderBy("bucket")
    },

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): residue 7 is
    // deterministically nulled on BOTH sides, and the proof of null-safe
    // semantics is the output itself — the NULL-key row carries counts
    // from both sides (a plain equi-join would strand two unmatched
    // rows). Both sides reduce to per-key counts before the join.
    "q_null_safe_join" -> { (s, dir) =>
      val a = Tables(s, dir, "customer")
        .select(expr("nullif(c_custkey % 100, 7)").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n_cust"))
      val b = Tables(s, dir, "orders")
        .select(expr("nullif(o_custkey % 100, 7)").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n_ord"))
      a.as("a").join(b.as("b"), col("a.k") <=> col("b.k"), "full_outer")
        .select(coalesce(col("a.k"), col("b.k")).as("k"),
          col("n_cust"), col("n_ord"))
        .orderBy(asc_nulls_first("k"))
    },

    // k-anonymity audit over quasi-identifiers (nation x balance band):
    // every equivalence class smaller than k=5 is a re-identification
    // risk the release pipeline must suppress or generalize. One slim
    // partial-agg shuffle; the report carries class size + risk flag —
    // the privacy twin of the data-quality expectations suite.
    "q_k_anonymity" -> { (s, dir) =>
      Tables(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nationkey"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
        .groupBy("nationkey", "bal_band")
        .agg(count(lit(1)).as("k"))
        .withColumn("risky", when(col("k") < 5, 1L).otherwise(0L))
        .orderBy("nationkey", "bal_band")
    },

    // Triangle enumeration in the part co-purchase graph (edges = part
    // pairs sharing >= 2 orders), via [[graft.operators.Graph.triangles]] —
    // DEGREE orientation, so wedge volume is O(|E|^1.5) on ANY graph
    // (id orientation, the shape the oracle uses, explodes quadratically
    // at a skewed hub; the operator's output is the orientation-
    // independent id-sorted triple, so the two enumerations are
    // set-identical and the oracle hash still pins it exactly). The
    // threshold keeps co-purchase edges, not co-occurrence noise.
    "q_triangles" -> { (s, dir) =>
      // unsplittable-scan fan-out on the self-join key (Tables.fanOutOn)
      val li = Tables.fanOutOn(
        Tables(s, dir, "lineitem").select("l_orderkey", "l_partkey"), "l_orderkey")
      val e = li.as("x").join(li.as("y"), "l_orderkey")
        .filter(col("x.l_partkey") < col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("u"), col("y.l_partkey").as("v"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select("u", "v")
      graft.operators.Graph.triangles(e, "u", "v")
        .orderBy("a", "b", "c")
    },

    // Association rules over order baskets (support / confidence / lift,
    // all integer ppm — market-basket analysis with an exact oracle).
    // Item and pair supports reduce FIRST; the tiny item-count table
    // broadcasts back onto the ≥3-support pairs, and the basket total is
    // a 1-row broadcast — the raw basket table is joined once, never the
    // rule table against raw data.
    "q_market_basket" -> { (s, dir) =>
      // unsplittable-scan fan-out on the basket key (Tables.fanOutOn): the
      // per-basket distinct and the pair self-join both cluster on it
      val b = Tables.fanOutOn(
        Tables(s, dir, "lineitem").select("l_orderkey", "l_partkey"), "l_orderkey")
        .distinct()
      val nB = b.agg(countDistinct("l_orderkey").as("nb"))
      val ic = b.groupBy("l_partkey").agg(count(lit(1)).as("n_i"))
      val pc = b.as("x").join(b.as("y"), "l_orderkey")
        .filter(col("x.l_partkey") < col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 3)
      // lift's numerator n_ab*nb*1e6 outgrows BIGINT once baskets pass
      // ~1e6 (nb²·1e6 > 2^63), so it rides DECIMAL(38,0) products — exact
      // integers to 38 digits, safe to nb ~ 1e10. Decimal DIVISION rounds
      // (HALF_UP at the result scale) instead of flooring, so the quotient
      // gets an explicit remainder correction: q ∈ {floor, floor+1} by the
      // rounding bound, and q·d > n ⟺ q = floor+1 — bit-exact with the
      // oracle's integer `//` at any scale, not just below the overflow.
      pc.join(broadcast(ic.select(col("l_partkey").as("pa"), col("n_i").as("n_a"))), "pa")
        .join(broadcast(ic.select(col("l_partkey").as("pb"), col("n_i").as("n_b"))), "pb")
        .crossJoin(broadcast(nB))
        .withColumn("__ln", expr("CAST(n_ab AS DECIMAL(38,0)) * nb * 1000000"))
        .withColumn("__ld", expr("CAST(n_a AS DECIMAL(38,0)) * n_b"))
        .withColumn("__lq", expr("CAST(__ln / __ld AS DECIMAL(38,0))"))
        .select(col("pa"), col("pb"), col("n_ab"),
          expr("n_ab * 1000000 div nb").as("support_ppm"),
          expr("n_ab * 1000000 div n_a").as("conf_ppm"),
          expr("CAST(CASE WHEN __lq * __ld > __ln THEN __lq - 1 ELSE __lq END AS BIGINT)")
            .as("lift_ppm"))
        .orderBy(desc("lift_ppm"), asc("pa"), asc("pb"))
    },

    // Closed-form OLS per group from the same exact-decimal power sums as
    // q_stats_moments — distributed linear regression in ONE scan, with
    // slope/intercept/covariance derived through textually-identical
    // double arithmetic in the oracle (hash-exact, unlike the built-in
    // regr_slope whose float sums are partition-order dependent).
    "q_linreg" -> { (s, dir) =>
      val x = col("l_quantity")
      val y = col("l_extendedprice")
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(x.cast("decimal(18,0)")).cast("double").as("sx"),
          sum((x * x).cast("decimal(18,0)")).cast("double").as("sxx"),
          sum(y.cast("decimal(18,2)")).cast("double").as("sy"),
          sum((x * y).cast("decimal(28,2)")).cast("double").as("sxy"))
        .selectExpr(
          "l_returnflag", "n",
          "(n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope",
          "(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept",
          "(n * sxy - sx * sy) / (n * n) AS covar_xy")
        .orderBy("l_returnflag")
    },

    // RFM segmentation (recency / frequency / monetary quintiles): the
    // classic CRM cube. Per-customer aggregates reduce first (one slim
    // shuffle); each quintile cut is the decomposed global NTILE
    // ([[Ranks]] — three independent range-bucket passes over the reduced
    // per-customer grain, custkey tiebreaks so the cuts are total orders
    // on both engines, no single-partition window); segments roll up with
    // exact decimal spend.
    "q_rfm_segments" -> { (s, dir) =>
      // materialize the per-customer reduction ONCE: the three quintile
      // passes each range-bucket a different order — without this pin the
      // orders scan + aggregate would run three times (house pattern)
      val per = Tables(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(max("o_orderdate").as("last_date"),
          count(lit(1)).as("freq"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
        .lineageCut()
      def quintile(df: DataFrame, out: String, order: Column*): DataFrame =
        Ranks.bucketRange(df, order)
          .withRowNumber("__i").withNtile("__i", 5, out)
          .result.drop("__i")
      val cut = quintile(
        quintile(
          quintile(per, "r", col("last_date").asc, col("o_custkey").asc),
          "f", col("freq").asc, col("o_custkey").asc),
        "m", col("spend").asc, col("o_custkey").asc)
      cut
        .groupBy("r", "f", "m")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("spend")).cast("decimal(38,2)").cast("double").as("total_spend"))
        .orderBy("r", "f", "m")
    },

    // Revenue-concentration (Lorenz) deciles: users ranked by exact cent
    // spend, cumulative share per rank-decile in integer ppm — the
    // "top 10% carry X% of revenue" curve with no float anywhere. The
    // rank and running sum ride ONE decomposed range-bucket pass
    // ([[Ranks]]) over the reduced per-customer grain, and the grand
    // totals fall out of the same bounded bucket gather as literals — no
    // single-partition window at any grain; cum*1e6 stays in Long up to
    // ~9.2e12 total cents (decompose like uniformMixWeights beyond that).
    "q_lorenz" -> { (s, dir) =>
      val per = Tables(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)").as("cents"))
      val b = Ranks.bucketRange(per,
        Seq(col("cents").asc, col("o_custkey").asc), valueCols = Seq("cents"))
      b.withRowNumber("i").withCumSum("cents", "cum")
        .result
        .withColumn("n", lit(b.rowTotal))
        .withColumn("total", lit(b.valueTotal("cents")))
        .withColumn("decile", expr("(i - 1) * 10 div n + 1"))
        .groupBy("decile")
        .agg(max("i").as("cum_users"), max("cum").as("cum_cents"),
          expr("max(cum) * 1000000 div max(total)").as("share_ppm"))
        .orderBy("decile")
    },

    // Volume-discount profile (pricing analytics): how discount depth
    // and unit price move with order-line quantity. Quantity bands by
    // integer division; per band the mean discount in basis points and
    // the mean unit price in cents — both exact integer ratios of exact
    // sums, never an AVG over floats.
    "q_discount_depth" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .selectExpr("CAST(l_quantity AS BIGINT) div 10 AS qty_band",
          "CAST(ROUND(l_discount * 10000) AS BIGINT) AS disc_bp",
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents",
          "CAST(l_quantity AS BIGINT) AS qty")
        .groupBy("qty_band")
        .agg(count(lit(1)).as("n_lines"),
          expr("CAST(SUM(disc_bp) AS BIGINT) div COUNT(*)").as("mean_disc_bp"),
          expr("CAST(SUM(price_cents) AS BIGINT) div CAST(SUM(qty) AS BIGINT)").as("unit_price_cents"))
        .orderBy("qty_band")
    },

    // Open-order aging report (the backlog triage every ops team runs):
    // non-finalized orders bucketed by age against the corpus max date
    // (1-row broadcast anchor — "today" must be data-derived or the
    // query isn't reproducible), exact cent value per bucket. Age
    // buckets by integer day arithmetic.
    "q_order_aging" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
        .selectExpr("o_orderstatus",
          "CAST(datediff(o_orderdate, TIMESTAMP '1992-01-01') AS BIGINT) AS day",
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      val anchor = o.agg(max("day").as("dmax"))
      o.filter(col("o_orderstatus") =!= "F")
        .crossJoin(broadcast(anchor))
        .withColumn("age_days", col("dmax") - col("day"))
        .withColumn("bucket", expr(
          "CASE WHEN age_days <= 30 THEN '0-30' WHEN age_days <= 90 THEN '31-90' " +
            "WHEN age_days <= 365 THEN '91-365' ELSE '365+' END"))
        .groupBy("o_orderstatus", "bucket")
        .agg(count(lit(1)).as("n_orders"),
          expr("CAST(SUM(cents) AS BIGINT)").as("open_cents"),
          max("age_days").as("oldest_days"))
        .orderBy("o_orderstatus", "bucket")
    },

    // Referential-integrity audit (the cross-TABLE complement of the
    // single-table expectations suite): orphan counts per FK relation as
    // anti-join cardinalities, with child totals and orphan ppm. Each
    // relation is one anti join against the parent's key projection —
    // the parent side reduces to keys before shipping.
    "q_ref_integrity" -> { (s, dir) =>
      def orphans(rel: String, child: DataFrame, ck: String,
                  parent: DataFrame, pk: String) =
        child.select(col(ck)).join(
            parent.select(col(pk).as(ck)).distinct(), Seq(ck), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
          .crossJoin(child.agg(count(lit(1)).as("n_child")))
          .selectExpr(s"'$rel' AS relation", "n_child", "n_orphans",
            "n_orphans * 1000000 div n_child AS orphan_ppm")
      val li = Tables(s, dir, "lineitem")
      orphans("lineitem.orderkey->orders", li, "l_orderkey", Tables(s, dir, "orders"), "o_orderkey")
        .union(orphans("lineitem.partkey->part", li, "l_partkey", Tables(s, dir, "part"), "p_partkey"))
        .union(orphans("lineitem.suppkey->supplier", li, "l_suppkey", Tables(s, dir, "supplier"), "s_suppkey"))
        .union(orphans("orders.custkey->customer", Tables(s, dir, "orders"), "o_custkey",
          Tables(s, dir, "customer"), "c_custkey"))
        .union(orphans("customer.nationkey->nation", Tables(s, dir, "customer"), "c_nationkey",
          Tables(s, dir, "nation"), "n_nationkey"))
        .orderBy("relation")
    },

    // Gini coefficient (the scalar the q_lorenz curve integrates to):
    // G = (2·Σ i·x_(i) − (n+1)·T) / (n·T) over rank-ordered exact cents.
    // Both numerator and denominator stay BIGINT-exact and < 2^53, so
    // the final double division is textually identical — no float
    // anywhere before the last step. The rank is the decomposed global
    // row_number ([[Ranks]]) — no single-partition window.
    "q_gini" -> { (s, dir) =>
      val per = Tables(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)").as("cents"))
      Ranks.bucketRange(per, Seq(col("cents").asc, col("o_custkey").asc))
        .withRowNumber("i")
        .result
        .agg(count(lit(1)).as("n"),
          expr("CAST(SUM(cents) AS BIGINT)").as("t"),
          expr("CAST(SUM(i * cents) AS BIGINT)").as("s"))
        .selectExpr("n", "t",
          "CAST(2 * s - (n + 1) * t AS DOUBLE) / (CAST(n AS DOUBLE) * t) AS gini")
    },

    // Chi-square independence report (priority x status contingency):
    // observed counts, expected under independence, per-cell chi-square
    // contribution — all derived from exact integer marginals through
    // textually identical double arithmetic, so the statistic is
    // hash-exact. ONE scan builds the cell table; marginals are window
    // sums over the grid-sized cells (re-deriving them as separate
    // aggregates re-scanned orders four times).
    "q_chisq" -> { (s, dir) =>
      val W = org.apache.spark.sql.expressions.Window
      Tables(s, dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("obs"))
        .withColumn("rt", sum("obs").over(W.partitionBy("o_orderpriority")))
        .withColumn("ct", sum("obs").over(W.partitionBy("o_orderstatus")))
        .withColumn("n", sum("obs").over(W.partitionBy()))
        .selectExpr("o_orderpriority", "o_orderstatus", "obs",
          "CAST(rt AS DOUBLE) * ct / n AS expected",
          "(obs - CAST(rt AS DOUBLE) * ct / n) * (obs - CAST(rt AS DOUBLE) * ct / n) / (CAST(rt AS DOUBLE) * ct / n) AS contrib")
        .orderBy("o_orderpriority", "o_orderstatus")
    },

    // Pairwise Pearson correlation matrix from ONE scan. Correlation is
    // invariant under linear scaling, so the measures first become exact
    // integers (quantity is integral; discount/tax rescale to basis
    // points) — all nine power sums are then BIGINT-exact and
    // order-independent, with magnitudes < 2^53 so the numerator stays
    // integer and the denominator's double arithmetic is textually
    // identical on both engines (sqrt is correctly rounded IEEE). The
    // built-in corr() (float sums, partition-order dependent) could not
    // be hash-exact. The 1-row sum vector fans out to pair rows via
    // stack, never by re-aggregating.
    "q_corr_matrix" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .selectExpr(
          "CAST(l_quantity AS BIGINT) AS x",
          "CAST(ROUND(l_discount * 100) AS BIGINT) AS y",
          "CAST(ROUND(l_tax * 100) AS BIGINT) AS z")
        .agg(
          count(lit(1)).as("n"),
          sum("x").as("sx"), expr("SUM(x * x)").as("sxx"),
          sum("y").as("sy"), expr("SUM(y * y)").as("syy"),
          sum("z").as("sz"), expr("SUM(z * z)").as("szz"),
          expr("SUM(x * y)").as("sxy"), expr("SUM(x * z)").as("sxz"),
          expr("SUM(y * z)").as("syz"))
        .selectExpr("n",
          "(n * sxy - sx * sy) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)) AS c_qd",
          "(n * sxz - sx * sz) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * (n * szz - sz * sz)) AS c_qt",
          "(n * syz - sy * sz) / sqrt(CAST(n * syy - sy * sy AS DOUBLE) * (n * szz - sz * sz)) AS c_dt")
        .selectExpr(
          "stack(3, 'quantity~discount', c_qd, 'quantity~tax', c_qt, 'discount~tax', c_dt) AS (pair, corr)",
          "n")
        .select("pair", "n", "corr")
        .orderBy("pair")
    },

    // Fuzzy string join (entity resolution step 1): candidate pairs are a
    // BLOCKED equi-join on a cheap key (the name's noun), verified by
    // Levenshtein — never all-pairs. The join runs on the DISTINCT value
    // table, whose size is the attribute's cardinality, not the row
    // count: at 100 TB of rows with a bounded dirty-attribute domain the
    // resolve step stays dimension-sized and the result broadcasts back.
    "q_fuzzy_join" -> { (s, dir) =>
      val names = Tables(s, dir, "part").select("p_name").distinct()
        .withColumn("noun", expr("split_part(p_name, ' ', 2)"))
      val a = names.select(col("p_name").as("name_a"), col("noun"))
      val b = names.select(col("p_name").as("name_b"), col("noun"))
      a.join(b, Seq("noun"))
        .filter(col("name_a") < col("name_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("dist") <= 3)
        .select("name_a", "name_b", "dist")
        .orderBy("name_a", "name_b")
    },

    // Entity resolution step 2: fuzzy-equivalent names collapse to
    // canonical entities via connected components over the verified pair
    // edges (node id = the name's min partkey — derivable on both
    // engines), then labels join back to the name table and roll up to
    // cluster cards. Reuses Dedup.connectedComponents (pointer jumping,
    // O(log n) rounds); the oracle closes the same edges with a recursive
    // CTE, the q_dedup_cluster acceptance.
    "q_entity_cluster" -> { (s, dir) =>
      val names = Tables(s, dir, "part")
        .groupBy("p_name")
        .agg(min("p_partkey").as("nid"), count(lit(1)).as("n_parts"))
        .withColumn("noun", expr("split_part(p_name, ' ', 2)"))
        .lineageCut()
      val a = names.select(col("nid").as("src"), col("p_name").as("na"), col("noun"))
      val b = names.select(col("nid").as("dst"), col("p_name").as("nb"), col("noun"))
      // the blocked self-join is catalog-sized on BOTH sides and executes
      // during construction (it feeds connectedComponents), so the static
      // sweep never sees it — the r13 runtime sweep caught the planner
      // broadcasting the full checkpointed name table here (the q_lm_score
      // hazard class); hash-build bounds the build at one partition
      val edges = a.join(b.hint("shuffle_hash"), Seq("noun"))
        .filter(col("na") < col("nb") && levenshtein(col("na"), col("nb")) <= 3)
        .select("src", "dst")
      val comp = Dedup.connectedComponents(edges, "src", "dst")
      // catalog-sized checkpointed label table: hash-build, never
      // broadcast (the q_lm_score hazard class)
      names.join(comp.withColumnRenamed("node", "nid").hint("shuffle_hash"),
          Seq("nid"), "left")
        .withColumn("cluster", coalesce(col("comp"), col("nid")))
        .groupBy("cluster")
        .agg(min("p_name").as("canonical"), count(lit(1)).as("n_names"),
          expr("CAST(SUM(n_parts) AS BIGINT)").as("n_parts"))
        .select("canonical", "n_names", "n_parts")
        .orderBy("canonical")
    },

    // Benford first-digit audit (forensic analytics): the leading
    // significant digit of order totals vs the Benford expectation —
    // digit from exact integer cents via string head (×100 preserves the
    // leading digit), expectation as literal ppm constants (floor of
    // log10(1+1/d)·1e6, identical on both engines because they are
    // literals, not engine log calls).
    "q_benford" -> { (s, dir) =>
      val benford = "CASE d WHEN 1 THEN 301029 WHEN 2 THEN 176091 WHEN 3 THEN 124938" +
        " WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66946 WHEN 7 THEN 57991" +
        " WHEN 8 THEN 51152 ELSE 45757 END"
      Tables(s, dir, "orders")
        .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
        .filter(col("cents") > 0)
        .selectExpr("CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT) AS d")
        .groupBy("d")
        .agg(count(lit(1)).as("n"))
        .withColumn("share_ppm",
          expr("n * 1000000 div CAST(SUM(n) OVER () AS BIGINT)"))
        .withColumn("benford_ppm", expr(benford))
        .withColumn("dev_ppm", expr("abs(share_ppm - benford_ppm)"))
        .orderBy("d")
    },

    // Order-fulfillment cycle time: ship-date minus order-date per
    // priority (integer days — negative lags exist in the synthetic
    // data, so the mean uses floor of DOUBLE division: integer div
    // truncates toward zero on Spark but floors on DuckDB). Percentiles
    // via the proven floor(percentile) pattern.
    "q_cycle_time" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .join(Tables(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("days"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          expr("CAST(SUM(days) AS BIGINT)").as("sum_days"),
          min("days").as("min_days"), max("days").as("max_days"),
          floor(expr("percentile(days, 0.5)")).cast("long").as("p50_days"),
          floor(expr("percentile(days, 0.9)")).cast("long").as("p90_days"))
        .withColumn("mean_days_x100",
          expr("CAST(floor(sum_days * 100.0 / n) AS BIGINT)"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q7 shape (volume shipping): bilateral trade between two
    // nations by ship year. Both nation dims broadcast; the pair filter
    // lands in the join, revenue is the proven exact-decimal sum.
    "q7_volume" -> { (s, dir) =>
      val n1 = broadcast(Tables(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(Tables(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      Tables(s, dir, "supplier")
        .join(Tables(s, dir, "lineitem"), col("s_suppkey") === col("l_suppkey"))
        .join(Tables(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(Tables(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // TPC-H Q8 shape (market share): NATION_3 suppliers' share of
    // EUROPE-customer revenue by order year. Numerator and denominator
    // are each exact-decimal sums rounded to 2 decimals before the cast,
    // so the final double division is textually identical on both
    // engines — the filtered-ratio pattern.
    "q8_market_share" -> { (s, dir) =>
      val nc = broadcast(Tables(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey")))
      val ns = broadcast(Tables(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val reg = broadcast(Tables(s, dir, "region").filter(col("r_name") === "EUROPE"))
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(nc, col("c_nationkey") === col("c_nk"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .join(ns, col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          expr("CAST(ROUND(SUM(CAST(CASE WHEN supp_nation = 'NATION_3' THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END AS DECIMAL(28,10))), 2) AS DOUBLE)").as("nation_rev"),
          expr("CAST(ROUND(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE)").as("total_rev"))
        .selectExpr("o_year", "nation_rev", "total_rev",
          "nation_rev / total_rev AS mkt_share")
        .orderBy("o_year")
    },

    // TPC-H Q14 shape (promotion effect): share of shipped revenue on
    // PROMO-type parts by ship year — the same filtered-ratio pattern.
    "q14_promo" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(
          expr("CAST(ROUND(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END AS DECIMAL(28,10))), 2) AS DOUBLE)").as("promo_rev"),
          expr("CAST(ROUND(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE)").as("total_rev"))
        .selectExpr("l_year", "promo_rev", "total_rev",
          "100.0 * promo_rev / total_rev AS promo_pct")
        .orderBy("l_year")
    },

    // TPC-H Q10 shape (returned-item revenue): which customers returned
    // the most value. The returnflag filter pushes to the lineitem scan,
    // nation broadcasts, and the top-20 is TakeOrderedAndProject — the
    // canonical fact-to-fact join report at 100 TB.
    "q10_returns" -> { (s, dir) =>
      val nation = broadcast(Tables(s, dir, "nation"))
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(Tables(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
    },
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(ROUND(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_quantity <= 45
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_join" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | CAST(ROUND(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_join" ->
      """SELECT n_name,
        | CAST(ROUND(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey AND l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q9_profit" ->
      """SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        | CAST(ROUND(SUM(CAST(l_extendedprice*(1.0-l_discount) - p_retailprice*0.1*l_quantity AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_profit
        |FROM lineitem, part, supplier, nation, orders
        |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        |  AND s_nationkey = n_nationkey AND l_orderkey = o_orderkey
        |  AND p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q18_big_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        | CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (
        |    SELECT l_orderkey FROM lineitem
        |    GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_exact_quantiles" ->
      """WITH per AS (
        |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT cents, CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS i,
        |         CAST(COUNT(*) OVER () AS BIGINT) AS n FROM per),
        |pos AS (SELECT CAST(pctl AS BIGINT) AS pctl FROM (VALUES (50), (90), (99)) t(pctl))
        |SELECT pctl, (n * pctl + 99) // 100 AS pos, cents
        |FROM ranked, pos WHERE i = (n * pctl + 99) // 100
        |ORDER BY pctl""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin,

    "q_window" ->
      """SELECT o_custkey, o_orderkey,
        | ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,

    "q_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS distinct_parts, COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q_setop" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY custkey""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        | COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        | COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        | COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        | COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_topk_grouped" ->
      """WITH r AS (
        | SELECT event_type, event_id, value,
        |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rnk
        | FROM events)
        |SELECT event_type, event_id, value, rnk FROM r WHERE rnk <= 3
        |ORDER BY event_type, rnk""".stripMargin,

    "q_percentiles" ->
      """SELECT event_type,
        | CAST(floor(quantile_cont(value, 0.5) * 100) AS BIGINT) AS med,
        | CAST(floor(quantile_cont(value, 0.9) * 100) AS BIGINT) AS p90
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        | CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |                        (o_orderstatus, o_orderpriority))
        |ORDER BY g_status, g_prio,
        |  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_exists_subquery" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_skew_report" ->
      """WITH c AS (SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
        |SELECT l_suppkey, n, n * 1000000 // total AS share_ppm
        |FROM c, t
        |ORDER BY n DESC, l_suppkey LIMIT 20""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT c_custkey,
        |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  (SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer c ORDER BY c_custkey""".stripMargin,

    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        | year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        | upper(o_orderpriority) AS prio_upper,
        | substr(o_orderpriority, 1, 1) AS prio_code,
        | CAST(len(o_orderpriority) AS BIGINT) AS prio_len,
        | concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
        | replace(o_orderpriority, '-', '_') AS prio_snake,
        | CAST(abs(o_custkey - 750) AS BIGINT) AS dist,
        | CAST(floor(sqrt(o_totalprice) * 100) AS BIGINT) AS sqrt_cents,
        | o_orderkey % 7 AS bucket7,
        | greatest(o_custkey, o_orderkey) AS gk,
        | least(o_custkey, o_orderkey) AS lk
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,

    "q_cube" ->
      """SELECT event_type, user_id % 10 AS bucket, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY CUBE(event_type, user_id % 10)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,

    "q_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY custkey""".stripMargin,

    "q_full_outer" ->
      """WITH c AS (SELECT c_custkey, c_acctbal AS acctbal FROM customer
        |           WHERE c_acctbal > 7000),
        |o AS (SELECT o_custkey, COUNT(*) AS n_big,
        |        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS big_total
        |      FROM orders WHERE o_totalprice > 250000 GROUP BY 1)
        |SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
        |  CASE WHEN c.c_custkey IS NULL THEN 'order_only'
        |       WHEN o.o_custkey IS NULL THEN 'cust_only'
        |       ELSE 'both' END AS branch,
        |  acctbal, n_big, big_total
        |FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
        |ORDER BY custkey""".stripMargin,

    "q_agg_breadth" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        | CAST(bool_and(o_totalprice > 2000) AS BIGINT) AS all_above_2k,
        | CAST(bool_or(o_orderstatus = 'F') AS BIGINT) AS any_final,
        | max_by(o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS key_of_max,
        | min_by(o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS key_of_min,
        | CAST(floor(median(o_totalprice) * 100) AS BIGINT) AS median_cents
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_stats_moments" ->
      """WITH s AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_quantity*l_quantity*l_quantity AS DECIMAL(28,0))) AS DOUBLE) AS sxxx,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_discount*l_discount AS DECIMAL(18,4))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity*l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  sx / n AS mean_qty,
        |  sqrt(sxx / n - (sx / n) * (sx / n)) AS std_qty,
        |  (sxxx / n - 3 * (sx / n) * (sxx / n) + 2 * (sx / n) * (sx / n) * (sx / n)) / ((sxx / n - (sx / n) * (sx / n)) * sqrt(sxx / n - (sx / n) * (sx / n))) AS skew_qty,
        |  sy / n AS mean_disc,
        |  (n * sxy - sx * sy) / (n * n) AS covar_qd,
        |  (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_qd
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "q_data_quality" ->
      """WITH m AS (SELECT COUNT(*) AS n,
        |  COUNT(CASE WHEN c_name IS NOT NULL THEN 1 END) AS c0,
        |  COUNT(CASE WHEN regexp_matches(c_name, '^Customer#[0-9]{9}$') THEN 1 END) AS c1,
        |  COUNT(CASE WHEN c_acctbal BETWEEN 0 AND 10000 THEN 1 END) AS c2,
        |  COUNT(CASE WHEN c_mktsegment IN ('AUTOMOBILE','MACHINERY','FURNITURE','HOUSEHOLD','BUILDING') THEN 1 END) AS c3,
        |  COUNT(DISTINCT c_custkey) AS u0
        |  FROM customer)
        |SELECT check_name, col_name, metric_ppm,
        |  CAST(CASE WHEN metric_ppm >= thr THEN 1 ELSE 0 END AS BIGINT) AS passed
        |FROM (
        |  SELECT 'complete' AS check_name, 'c_name' AS col_name, c0*1000000//n AS metric_ppm, 1000000 AS thr FROM m
        |  UNION ALL SELECT 'format', 'c_name', c1*1000000//n, 1000000 FROM m
        |  UNION ALL SELECT 'range', 'c_acctbal', c2*1000000//n, 950000 FROM m
        |  UNION ALL SELECT 'domain', 'c_mktsegment', c3*1000000//n, 1000000 FROM m
        |  UNION ALL SELECT 'unique', 'c_custkey', u0*1000000//n, 1000000 FROM m)
        |ORDER BY check_name, col_name""".stripMargin,

    "q_zorder_layout" ->
      """WITH s1 AS (SELECT l_partkey, l_suppkey,
        |    l_partkey AS pa, l_suppkey AS sa FROM lineitem),
        |s2 AS (SELECT l_partkey, l_suppkey,
        |    (pa | (pa << 16)) & 281470681808895 AS pa,
        |    (sa | (sa << 16)) & 281470681808895 AS sa FROM s1),
        |s3 AS (SELECT l_partkey, l_suppkey,
        |    (pa | (pa << 8)) & 71777214294589695 AS pa,
        |    (sa | (sa << 8)) & 71777214294589695 AS sa FROM s2),
        |s4 AS (SELECT l_partkey, l_suppkey,
        |    (pa | (pa << 4)) & 1085102592571150095 AS pa,
        |    (sa | (sa << 4)) & 1085102592571150095 AS sa FROM s3),
        |s5 AS (SELECT l_partkey, l_suppkey,
        |    (pa | (pa << 2)) & 3689348814741910323 AS pa,
        |    (sa | (sa << 2)) & 3689348814741910323 AS sa FROM s4),
        |s6 AS (SELECT l_partkey, l_suppkey,
        |    (pa | (pa << 1)) & 6148914691236517205 AS pa,
        |    (sa | (sa << 1)) & 6148914691236517205 AS sa FROM s5),
        |z AS (SELECT l_partkey, l_suppkey, pa | (sa << 1) AS zkey FROM s6),
        |m AS (SELECT MAX(zkey) AS zmax FROM z)
        |SELECT zkey * 16 // (zmax + 1) AS bucket, COUNT(*) AS n,
        |  MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
        |  MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
        |FROM z, m GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_null_safe_join" ->
      """WITH a AS (SELECT nullif(c_custkey % 100, 7) AS k, COUNT(*) AS n_cust
        |           FROM customer GROUP BY 1),
        |b AS (SELECT nullif(o_custkey % 100, 7) AS k, COUNT(*) AS n_ord
        |      FROM orders GROUP BY 1)
        |SELECT COALESCE(a.k, b.k) AS k, n_cust, n_ord
        |FROM a FULL OUTER JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY k NULLS FIRST""".stripMargin,

    "q_k_anonymity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |  COUNT(*) AS k,
        |  CAST(CASE WHEN COUNT(*) < 5 THEN 1 ELSE 0 END AS BIGINT) AS risky
        |FROM customer GROUP BY 1, 2 ORDER BY nationkey, bal_band""".stripMargin,

    "q_triangles" ->
      """WITH e AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b USING (l_orderkey)
        |  WHERE a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |FROM e e1 JOIN e e2 ON e1.v = e2.u
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        |ORDER BY a, b, c""".stripMargin,

    "q_market_basket" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT l_orderkey) AS nb FROM b),
        |ic AS (SELECT l_partkey, COUNT(*) AS n_i FROM b GROUP BY 1),
        |pc AS (SELECT x.l_partkey AS pa, y.l_partkey AS pb, COUNT(*) AS n_ab
        |       FROM b x JOIN b y USING (l_orderkey)
        |       WHERE x.l_partkey < y.l_partkey
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 3)
        |SELECT pa, pb, n_ab,
        |  n_ab * 1000000 // nb AS support_ppm,
        |  n_ab * 1000000 // a.n_i AS conf_ppm,
        |  n_ab * nb * 1000000 // (a.n_i * c.n_i) AS lift_ppm
        |FROM pc JOIN ic a ON pc.pa = a.l_partkey
        |  JOIN ic c ON pc.pb = c.l_partkey, n
        |ORDER BY lift_ppm DESC, pa, pb""".stripMargin,

    "q_linreg" ->
      """WITH s AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
        |  (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept,
        |  (n * sxy - sx * sy) / (n * n) AS covar_xy
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "q_rfm_segments" ->
      """WITH per AS (
        |  SELECT o_custkey, MAX(o_orderdate) AS last_date, COUNT(*) AS freq,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY 1),
        |scored AS (
        |  SELECT *,
        |    CAST(NTILE(5) OVER (ORDER BY last_date, o_custkey) AS BIGINT) AS r,
        |    CAST(NTILE(5) OVER (ORDER BY freq, o_custkey) AS BIGINT) AS f,
        |    CAST(NTILE(5) OVER (ORDER BY spend, o_custkey) AS BIGINT) AS m
        |  FROM per)
        |SELECT r, f, m, COUNT(*) AS n_customers,
        |  CAST(CAST(SUM(spend) AS DECIMAL(38,2)) AS DOUBLE) AS total_spend
        |FROM scored GROUP BY 1, 2, 3 ORDER BY r, f, m""".stripMargin,

    "q_lorenz" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT cents,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS i,
        |    CAST(SUM(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n,
        |    CAST(SUM(cents) OVER () AS BIGINT) AS total
        |  FROM per WINDOW w AS (ORDER BY cents, o_custkey))
        |SELECT (i - 1) * 10 // n + 1 AS decile,
        |  MAX(i) AS cum_users, MAX(cum) AS cum_cents,
        |  MAX(cum) * 1000000 // MAX(total) AS share_ppm
        |FROM r GROUP BY 1 ORDER BY decile""".stripMargin,

    "q_discount_depth" ->
      """WITH b AS (
        |  SELECT CAST(l_quantity AS BIGINT) // 10 AS qty_band,
        |    CAST(ROUND(l_discount * 10000) AS BIGINT) AS disc_bp,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem)
        |SELECT qty_band, COUNT(*) AS n_lines,
        |  CAST(SUM(disc_bp) AS BIGINT) // COUNT(*) AS mean_disc_bp,
        |  CAST(SUM(price_cents) AS BIGINT) // CAST(SUM(qty) AS BIGINT) AS unit_price_cents
        |FROM b GROUP BY 1 ORDER BY qty_band""".stripMargin,

    "q_order_aging" ->
      """WITH o AS (
        |  SELECT o_orderstatus,
        |    CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |m AS (SELECT MAX(day) AS dmax FROM o),
        |a AS (
        |  SELECT o_orderstatus, dmax - day AS age_days, cents
        |  FROM o, m WHERE o_orderstatus <> 'F')
        |SELECT o_orderstatus,
        |  CASE WHEN age_days <= 30 THEN '0-30' WHEN age_days <= 90 THEN '31-90'
        |    WHEN age_days <= 365 THEN '91-365' ELSE '365+' END AS bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(cents) AS BIGINT) AS open_cents,
        |  MAX(age_days) AS oldest_days
        |FROM a GROUP BY 1, 2 ORDER BY o_orderstatus, bucket""".stripMargin,

    "q_ref_integrity" ->
      """WITH x AS (
        |  SELECT 'lineitem.orderkey->orders' AS relation,
        |    (SELECT COUNT(*) FROM lineitem) AS n_child,
        |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
        |  UNION ALL
        |  SELECT 'lineitem.partkey->part',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |  UNION ALL
        |  SELECT 'lineitem.suppkey->supplier',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        |  UNION ALL
        |  SELECT 'orders.custkey->customer',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL
        |  SELECT 'customer.nationkey->nation',
        |    (SELECT COUNT(*) FROM customer),
        |    (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
        |      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)))
        |SELECT relation, CAST(n_child AS BIGINT) AS n_child,
        |  CAST(n_orphans AS BIGINT) AS n_orphans,
        |  CAST(n_orphans AS BIGINT) * 1000000 // CAST(n_child AS BIGINT) AS orphan_ppm
        |FROM x ORDER BY relation""".stripMargin,

    "q_gini" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT cents, CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS i
        |  FROM per),
        |a AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS t,
        |    CAST(SUM(i * cents) AS BIGINT) AS s
        |  FROM r)
        |SELECT n, t,
        |  CAST(2 * s - (n + 1) * t AS DOUBLE) / (CAST(n AS DOUBLE) * t) AS gini
        |FROM a""".stripMargin,

    "q_chisq" ->
      """WITH cells AS (
        |  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS obs
        |  FROM orders GROUP BY 1, 2),
        |m AS (SELECT o_orderpriority, o_orderstatus, obs,
        |  CAST(SUM(obs) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS rt,
        |  CAST(SUM(obs) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS ct,
        |  CAST(SUM(obs) OVER () AS BIGINT) AS n
        |  FROM cells)
        |SELECT o_orderpriority, o_orderstatus, obs,
        |  CAST(rt AS DOUBLE) * ct / n AS expected,
        |  (obs - CAST(rt AS DOUBLE) * ct / n) * (obs - CAST(rt AS DOUBLE) * ct / n) / (CAST(rt AS DOUBLE) * ct / n) AS contrib
        |FROM m ORDER BY o_orderpriority, o_orderstatus""".stripMargin,

    "q_corr_matrix" ->
      """WITH i AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(ROUND(l_discount * 100) AS BIGINT) AS y,
        |    CAST(ROUND(l_tax * 100) AS BIGINT) AS z
        |  FROM lineitem),
        |a AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(z) AS BIGINT) AS sz, CAST(SUM(z * z) AS BIGINT) AS szz,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * z) AS BIGINT) AS sxz,
        |    CAST(SUM(y * z) AS BIGINT) AS syz
        |  FROM i),
        |c AS (
        |  SELECT n,
        |    (n * sxy - sx * sy) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)) AS c_qd,
        |    (n * sxz - sx * sz) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * (n * szz - sz * sz)) AS c_qt,
        |    (n * syz - sy * sz) / sqrt(CAST(n * syy - sy * sy AS DOUBLE) * (n * szz - sz * sz)) AS c_dt
        |  FROM a)
        |SELECT 'quantity~discount' AS pair, n, c_qd AS corr FROM c
        |UNION ALL SELECT 'quantity~tax', n, c_qt FROM c
        |UNION ALL SELECT 'discount~tax', n, c_dt FROM c
        |ORDER BY pair""".stripMargin,

    "q_fuzzy_join" ->
      """WITH n AS (
        |  SELECT DISTINCT p_name, split_part(p_name, ' ', 2) AS noun
        |  FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM n a JOIN n b ON a.noun = b.noun AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY name_a, name_b""".stripMargin,

    "q_entity_cluster" ->
      """WITH RECURSIVE n AS (
        |  SELECT p_name, MIN(p_partkey) AS nid, COUNT(*) AS n_parts,
        |    split_part(p_name, ' ', 2) AS noun
        |  FROM part GROUP BY 1),
        |e AS (
        |  SELECT a.nid AS src, b.nid AS dst
        |  FROM n a JOIN n b ON a.noun = b.noun AND a.p_name < b.p_name
        |  WHERE levenshtein(a.p_name, b.p_name) <= 3),
        |bi AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        |reach AS (
        |  SELECT src, dst FROM bi
        |  UNION
        |  SELECT r.src, b.dst FROM reach r JOIN bi b ON r.dst = b.src),
        |comp AS (SELECT src AS nid, LEAST(src, MIN(dst)) AS cluster FROM reach GROUP BY src)
        |SELECT MIN(p_name) AS canonical, COUNT(*) AS n_names,
        |  CAST(SUM(n_parts) AS BIGINT) AS n_parts
        |FROM n LEFT JOIN comp USING (nid)
        |GROUP BY COALESCE(cluster, nid)
        |ORDER BY canonical""".stripMargin,

    "q_benford" ->
      """WITH c AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |d AS (
        |  SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS d
        |  FROM c WHERE cents > 0),
        |g AS (SELECT d, COUNT(*) AS n FROM d GROUP BY 1)
        |SELECT d, n,
        |  n * 1000000 // CAST(SUM(n) OVER () AS BIGINT) AS share_ppm,
        |  CASE d WHEN 1 THEN 301029 WHEN 2 THEN 176091 WHEN 3 THEN 124938
        |    WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66946 WHEN 7 THEN 57991
        |    WHEN 8 THEN 51152 ELSE 45757 END AS benford_ppm,
        |  abs(n * 1000000 // CAST(SUM(n) OVER () AS BIGINT) -
        |    (CASE d WHEN 1 THEN 301029 WHEN 2 THEN 176091 WHEN 3 THEN 124938
        |      WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66946 WHEN 7 THEN 57991
        |      WHEN 8 THEN 51152 ELSE 45757 END)) AS dev_ppm
        |FROM g ORDER BY d""".stripMargin,

    "q_hilbert_layout" ->
      """WITH s0 AS (SELECT l_partkey % 256 AS xm, l_suppkey % 256 AS ym, l_partkey % 256 AS x, l_suppkey % 256 AS y, CAST(0 AS BIGINT) AS d FROM lineitem),
        |r1 AS (SELECT xm, ym, x, y, d, CASE WHEN (x & 128) > 0 THEN 1 ELSE 0 END AS rx, CASE WHEN (y & 128) > 0 THEN 1 ELSE 0 END AS ry FROM s0),
        |u1 AS (SELECT xm, ym, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 127 - y ELSE y END) ELSE x END AS x, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 127 - x ELSE x END) ELSE y END AS y, d + 16384 * xor(3 * rx, ry) AS d FROM r1),
        |r2 AS (SELECT xm, ym, x, y, d, CASE WHEN (x & 64) > 0 THEN 1 ELSE 0 END AS rx, CASE WHEN (y & 64) > 0 THEN 1 ELSE 0 END AS ry FROM u1),
        |u2 AS (SELECT xm, ym, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 63 - y ELSE y END) ELSE x END AS x, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 63 - x ELSE x END) ELSE y END AS y, d + 4096 * xor(3 * rx, ry) AS d FROM r2),
        |r3 AS (SELECT xm, ym, x, y, d, CASE WHEN (x & 32) > 0 THEN 1 ELSE 0 END AS rx, CASE WHEN (y & 32) > 0 THEN 1 ELSE 0 END AS ry FROM u2),
        |u3 AS (SELECT xm, ym, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 31 - y ELSE y END) ELSE x END AS x, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 31 - x ELSE x END) ELSE y END AS y, d + 1024 * xor(3 * rx, ry) AS d FROM r3),
        |r4 AS (SELECT xm, ym, x, y, d, CASE WHEN (x & 16) > 0 THEN 1 ELSE 0 END AS rx, CASE WHEN (y & 16) > 0 THEN 1 ELSE 0 END AS ry FROM u3),
        |u4 AS (SELECT xm, ym, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 15 - y ELSE y END) ELSE x END AS x, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 15 - x ELSE x END) ELSE y END AS y, d + 256 * xor(3 * rx, ry) AS d FROM r4),
        |r5 AS (SELECT xm, ym, x, y, d, CASE WHEN (x & 8) > 0 THEN 1 ELSE 0 END AS rx, CASE WHEN (y & 8) > 0 THEN 1 ELSE 0 END AS ry FROM u4),
        |u5 AS (SELECT xm, ym, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 7 - y ELSE y END) ELSE x END AS x, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 7 - x ELSE x END) ELSE y END AS y, d + 64 * xor(3 * rx, ry) AS d FROM r5),
        |r6 AS (SELECT xm, ym, x, y, d, CASE WHEN (x & 4) > 0 THEN 1 ELSE 0 END AS rx, CASE WHEN (y & 4) > 0 THEN 1 ELSE 0 END AS ry FROM u5),
        |u6 AS (SELECT xm, ym, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 3 - y ELSE y END) ELSE x END AS x, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 3 - x ELSE x END) ELSE y END AS y, d + 16 * xor(3 * rx, ry) AS d FROM r6),
        |r7 AS (SELECT xm, ym, x, y, d, CASE WHEN (x & 2) > 0 THEN 1 ELSE 0 END AS rx, CASE WHEN (y & 2) > 0 THEN 1 ELSE 0 END AS ry FROM u6),
        |u7 AS (SELECT xm, ym, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 1 - y ELSE y END) ELSE x END AS x, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 1 - x ELSE x END) ELSE y END AS y, d + 4 * xor(3 * rx, ry) AS d FROM r7),
        |r8 AS (SELECT xm, ym, x, y, d, CASE WHEN (x & 1) > 0 THEN 1 ELSE 0 END AS rx, CASE WHEN (y & 1) > 0 THEN 1 ELSE 0 END AS ry FROM u7),
        |u8 AS (SELECT xm, ym, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 0 - y ELSE y END) ELSE x END AS x, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 0 - x ELSE x END) ELSE y END AS y, d + 1 * xor(3 * rx, ry) AS d FROM r8)
        |SELECT d // 4096 AS bucket, COUNT(*) AS n,
        |  MIN(xm) AS min_x, MAX(xm) AS max_x, MIN(ym) AS min_y, MAX(ym) AS max_y
        |FROM u8 GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_cycle_time" ->
      """WITH d AS (
        |  SELECT o_orderpriority,
        |    CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) AS days
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
        |SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(days) AS BIGINT) AS sum_days,
        |  MIN(days) AS min_days, MAX(days) AS max_days,
        |  CAST(floor(quantile_cont(days, 0.5)) AS BIGINT) AS p50_days,
        |  CAST(floor(quantile_cont(days, 0.9)) AS BIGINT) AS p90_days,
        |  CAST(floor(CAST(SUM(days) AS BIGINT) * 100.0 / COUNT(*)) AS BIGINT) AS mean_days_x100
        |FROM d GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(ROUND(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
        |FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |  AND c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q8_market_share" ->
      """WITH g AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(ROUND(SUM(CAST(CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END AS DECIMAL(28,10))), 2) AS DOUBLE) AS nation_rev,
        |    CAST(ROUND(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS total_rev
        |  FROM lineitem, orders, customer, supplier, nation n1, region, nation n2
        |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND l_suppkey = s_suppkey AND c_nationkey = n1.n_nationkey
        |    AND n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |    AND s_nationkey = n2.n_nationkey
        |  GROUP BY 1)
        |SELECT o_year, nation_rev, total_rev,
        |  nation_rev / total_rev AS mkt_share
        |FROM g ORDER BY o_year""".stripMargin,

    "q14_promo" ->
      """WITH g AS (
        |  SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |    CAST(ROUND(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END AS DECIMAL(28,10))), 2) AS DOUBLE) AS promo_rev,
        |    CAST(ROUND(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS total_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1)
        |SELECT l_year, promo_rev, total_rev,
        |  100.0 * promo_rev / total_rev AS promo_pct
        |FROM g ORDER BY l_year""".stripMargin,

    "q10_returns" ->
      """SELECT c_custkey, c_name, n_name,
        | CAST(ROUND(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
  )
}
