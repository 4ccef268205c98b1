package graft.queries

import graft.Tables
import graft.batch.{FoldAggregator, OrderedFold}
import graft.fold.{FoldOption, SnapshotFold}
import graft.model.Snapshot
import graft.operators.{AsOfJoin, RangeJoin, Ranks, Sessionize}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Lineage.LineageOps

/** Batch-parity queries for the fold algebra (SURVEY.md §2.1 O1–O12 and
  * §2.3 P9) over the `events` table playing the role of the Kafka log:
  * `user_id` = key, `event_id` = offset, `ts` = event time, payload =
  * (event_type, value, props).
  *
  * Order-insensitive folds run through [[FoldAggregator]] (map-side partial
  * agg); order-sensitive folds run through [[OrderedFold]] (single shuffle +
  * secondary sort). Money sums accumulate exact Long CENTS (2-decimal
  * values, rescaled to double at finish) so results are independent of
  * merge order and the hot fold loop is allocation-free — a BigDecimal
  * buffer pays a Decimal encode/decode per row in the typed path.
  */
object FoldQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** Snapshot payload for q_fold_last. */
  final case class Last(value: Double, event_type: String)

  /** State for q_fold_flatmap: counts + parity-split exact cent sums. */
  final case class PState(n: Long, nOdd: Long, nEven: Long, odd: Long, even: Long)

  /** `events` row; ts is nanoseconds-since-epoch (see Tables). */
  final case class Event(
      event_id: Long,
      ts: Long,
      user_id: Long,
      event_type: String,
      value: Double,
      props: String)

  private def events(s: SparkSession, dir: String): Dataset[Event] = {
    import s.implicits._
    Tables(s, dir, "events").as[Event]
  }

  /** Slim projections: typed aggregation deserializes the WHOLE object per
    * row (no column pruning through lambdas), so each fold query projects
    * to exactly the fields its fold reads before going typed. */
  final case class KV(user_id: Long, value: Double)
  final case class KT(user_id: Long, event_type: String)
  final case class KTV(user_id: Long, event_type: String, value: Double)
  final case class KP(user_id: Long, props: String)

  private def slim[T](s: SparkSession, dir: String, cols: Seq[String])(
      implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] =
    Tables(s, dir, "events").select(cols.map(col): _*).as[T]

  /** Double → exact cents (2-decimal HALF_UP, same rounding as the oracle's
    * CAST(x AS DECIMAL(18,2))). Goes through the decimal STRING value of the
    * double (BigDecimal.valueOf) — `Math.round(v * 100)` rounds the binary
    * product and diverges on values like 0.285. The fold then accumulates
    * plain Longs; cents/100.0 at finish is correctly rounded, identical to
    * DuckDB's decimal(…,2) → double cast. */
  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** props are tiny JSON objects like {"k": 87}; this is the "user codec"
    * of the fold (reference JournalParser.scala:16-90 decodes payloads the
    * same way — inside the fold, not the engine). */
  private val kPattern = """"k"\s*:\s*(-?\d+)""".r
  private def parseK(props: String): Long =
    kPattern.findFirstMatchIn(props).map(_.group(1).toLong).getOrElse(0L)

  /** BIGINT-overflow-safe exact floor(num/den) for POSITIVE integer SQL
    * expressions (write both in DECIMAL(38,0) arithmetic — the caller
    * casts before multiplying, or the product overflows before it gets
    * here). Decimal division ROUNDS (HALF_UP at the result scale) instead
    * of flooring, so the quotient gets a remainder correction: q ∈ {floor,
    * floor+1} by the rounding bound, and q·den > num ⟺ q = floor+1 —
    * bit-exact with the oracle's integer `//` at any scale. Same pattern
    * as q_market_basket's lift (Relational.scala); factored here for the
    * ppm ratios whose numerators outgrow BIGINT at realistic populations. */
  private[graft] def exactFloorDiv(df: DataFrame, num: String, den: String,
      out: String): DataFrame =
    df.withColumn("__fd_n", expr(num))
      .withColumn("__fd_d", expr(den))
      .withColumn("__fd_q", expr("CAST(__fd_n / __fd_d AS DECIMAL(38,0))"))
      .withColumn(out, expr(
        "CAST(CASE WHEN __fd_q * __fd_d > __fd_n THEN __fd_q - 1 ELSE __fd_q END AS BIGINT)"))
      .drop("__fd_n", "__fd_d", "__fd_q")

  // ---------------------------------------------------------------- queries

  val queries: Map[String, Q] = Map(
    // O1/O9 via Aggregator: per-key running count (the reference's golden
    // e2e fold, StatefulProcessingWithKafkaSpec.scala:308-327).
    "q_fold_count" -> { (s, dir) =>
      import s.implicits._
      val fold = FoldOption.of[Long, Long](_ => 1L)((n, _) => n + 1)
      slim[Long](s, dir, Seq("user_id")).groupByKey(identity)(org.apache.spark.sql.Encoders.scalaLong)
        .agg(FoldAggregator(fold)(_ + _).toColumn.name("n_events"))
        .toDF("user_id", "n_events")
        .orderBy("user_id")
    },

    // O1: counter fold over a money value (exact Long-cents accumulator).
    "q_fold_sum" -> { (s, dir) =>
      import s.implicits._
      val fold = FoldOption.of[Long, KV](e => cents(e.value))((st, e) => st + cents(e.value))
      slim[KV](s, dir, Seq("user_id", "value")).groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
        .agg(FoldAggregator(fold)(_ + _).toColumn.name("total"))
        .toDF("user_id", "total")
        .select(col("user_id"), (col("total").cast("double") / lit(100.0)).as("total"))
        .orderBy("user_id")
    },

    // O5: filter combinator — fold only purchase events.
    "q_fold_filter" -> { (s, dir) =>
      import s.implicits._
      val fold = FoldOption.of[Long, KT](_ => 1L)((n, _) => n + 1).filter(_.event_type == "purchase")
      slim[KT](s, dir, Seq("user_id", "event_type")).groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
        .agg(FoldAggregator(fold)(_ + _).toColumn.name("n_purchases"))
        .toDF("user_id", "n_purchases")
        .filter(col("n_purchases").isNotNull)
        .orderBy("user_id")
    },

    // O6: contraCollect — partial-function filter+map (clicks, doubled value).
    "q_fold_collect" -> { (s, dir) =>
      import s.implicits._
      val base = FoldOption.of[Long, Long](identity)((st, d) => st + d)
      val fold = base.contraCollect[KTV] { case e if e.event_type == "click" => cents(e.value * 2) }
      slim[KTV](s, dir, Seq("user_id", "event_type", "value")).groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
        .agg(FoldAggregator(fold)(_ + _).toColumn.name("click_sum"))
        .toDF("user_id", "click_sum")
        .filter(col("click_sum").isNotNull)
        .select(col("user_id"), (col("click_sum").cast("double") / lit(100.0)).as("click_sum"))
        .orderBy("user_id")
    },

    // O2: contramap — decode the JSON payload before folding (J1 parity).
    "q_fold_contramap" -> { (s, dir) =>
      import s.implicits._
      val fold = FoldOption.of[Long, Long](identity)(_ + _).contramap[KP](e => parseK(e.props))
      slim[KP](s, dir, Seq("user_id", "props")).groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
        .agg(FoldAggregator(fold)(_ + _).toColumn.name("k_sum"))
        .toDF("user_id", "k_sum")
        .orderBy("user_id")
    },

    // O7: handleErrorWith — failing step recovers into an error counter.
    "q_fold_error" -> { (s, dir) =>
      import s.implicits._
      val risky = FoldOption.of[(Long, Long), KT] { e =>
        if (e.event_type == "error") throw new IllegalStateException("boom") else (1L, 0L)
      } { (st, e) =>
        if (e.event_type == "error") throw new IllegalStateException("boom")
        else (st._1 + 1, st._2)
      }
      val fold = risky.handleErrorWith((st, _) => Some(st.map(t => (t._1, t._2 + 1)).getOrElse((0L, 1L))))
      slim[KT](s, dir, Seq("user_id", "event_type")).groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
        .agg(FoldAggregator(fold)((a, b) => (a._1 + b._1, a._2 + b._2)).toColumn.name("st"))
        .toDF("user_id", "st")
        .select(col("user_id"), col("st._1").as("n_ok"), col("st._2").as("n_error"))
        .orderBy("user_id")
    },

    // O3+P9: ordered replay with SnapshotFold — last state per key by offset.
    "q_fold_last" -> { (s, dir) =>
      import s.implicits._
      val inner = FoldOption[Last, Event]((_, e) => Some(Last(e.value, e.event_type)))
      val fold = SnapshotFold[Last, Event](_.event_id)(inner)
      OrderedFold.run(events(s, dir))(_.user_id, _.event_id)(fold)
        .map { case (k, sn) => (k, sn.offset, sn.value.value, sn.value.event_type) }
        .toDF("user_id", "last_offset", "last_value", "last_type")
        .orderBy("user_id")
    },

    // O12 journal replay: order-sensitive concat fold proves offset order.
    "q_fold_ordered" -> { (s, dir) =>
      import s.implicits._
      val fold = FoldOption.of[String, Event](_.event_type)((st, e) => st + "," + e.event_type)
      OrderedFold.run(events(s, dir))(_.user_id, _.event_id)(fold)
        .toDF("user_id", "type_seq")
        .orderBy("user_id")
    },

    // O4: flatMap — second fold chosen from the state (parity of position).
    "q_fold_flatmap" -> { (s, dir) =>
      import s.implicits._
      val incr = FoldOption.of[PState, Event](_ => PState(1L, 0L, 0L, 0L, 0L))(
        (st, _) => st.copy(n = st.n + 1))
      val addOdd = FoldOption[PState, Event]((st, e) =>
        st.map(p => p.copy(nOdd = p.nOdd + 1, odd = p.odd + cents(e.value))))
      val addEven = FoldOption[PState, Event]((st, e) =>
        st.map(p => p.copy(nEven = p.nEven + 1, even = p.even + cents(e.value))))
      val fold = incr.flatMap {
        case Some(p) if p.n % 2 == 1 => addOdd
        case _ => addEven
      }
      OrderedFold.run(events(s, dir))(_.user_id, _.event_id)(fold)
        .map { case (k, p) =>
          (k,
            if (p.nOdd > 0) Some(p.odd) else None,
            if (p.nEven > 0) Some(p.even) else None)
        }
        .toDF("user_id", "odd_sum", "even_sum")
        .select(
          col("user_id"),
          (col("odd_sum").cast("double") / lit(100.0)).as("odd_sum"),
          (col("even_sum").cast("double") / lit(100.0)).as("even_sum"))
        .orderBy("user_id")
    },

    // P9 end-to-end: replayed (duplicated) log deduped by the offset guard.
    "q_offset_dedup" -> { (s, dir) =>
      import s.implicits._
      val ds = events(s, dir)
      val replayed = ds.union(ds.filter(_.event_id % 2 == 0))
      val inner = FoldOption.of[Long, Event](_ => 1L)((n, _) => n + 1)
      val fold = SnapshotFold[Long, Event](_.event_id)(inner)
      OrderedFold.run(replayed)(_.user_id, _.event_id)(fold)
        .map { case (k, sn) => (k, sn.value, sn.offset) }
        .toDF("user_id", "n_events", "max_offset")
        .orderBy("user_id")
    },

    // T5 analogue: gap-based sessionization (idle timeout = 6h).
    "q_session_agg" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), expr("ts div 1000000").as("ms"))
      Sessionize.byGap(e, "user_id", "ms", "event_id", 6L * 3600 * 1000)
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), min("ms").as("start_ms"), max("ms").as("end_ms"))
        .orderBy("user_id", "session_id")
    },

    // Ordered-funnel analysis (view -> click -> purchase): per user the
    // deepest strictly-ordered step reached, rolled up to a per-depth
    // population + floor-avg conversion latency. Chained conditional-min
    // windows + the per-user collapse share ONE user shuffle.
    "q_funnel" -> { (s, dir) =>
      // first three days only: the full stream converts every user (depth-3
      // everywhere — one row proves nothing); the early window leaves a
      // real depth distribution to report
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"), expr("ts div 1000000").as("ms"))
        .filter(col("ms") < 1704326400000L)
      Sessionize.funnel(e, "user_id", "ms", "event_type",
        Seq("view", "click", "purchase"))
        .groupBy("funnel_depth")
        .agg(count(lit(1)).as("n_users"),
          expr("sum(coalesce(convert_ms, 0L)) div " +
            "greatest(sum(CASE WHEN convert_ms IS NOT NULL THEN 1L ELSE 0L END), 1L)")
            .as("avg_convert_ms"))
        .orderBy("funnel_depth")
    },

    // Cohort retention — the second product-analytics flagship: users
    // grouped by FIRST-ACTIVE day, counted on each later active day
    // offset. Day arithmetic is integer (ms div 86400000 — UTC day
    // buckets on both engines); the per-user first-day table joins back
    // slim (id + day), distinct (user, cohort, offset) collapses
    // multi-event days before the count.
    "q_retention" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"), expr("(ts div 1000000) div 86400000").as("day"))
      val first = e.groupBy("user_id").agg(min("day").as("cohort_day"))
      e.join(first, "user_id")
        .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"),
          col("user_id"))
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },

    // Last-touch attribution — the third product-analytics flagship after
    // q_funnel/q_retention: every purchase attributes its revenue to the
    // latest preceding non-purchase event ("channel") within a 24 h
    // lookback, else to 'direct'. Reuses AsOfJoin.backward (one user
    // shuffle, no inequality join); the lookback is a cheap post-join
    // filter because the as-of join emits exactly ONE candidate per
    // purchase. Revenue follows the decimal-exact sum discipline.
    "q_attribution" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), expr("ts div 1000000").as("ms"),
          col("event_type"), col("value"))
      val purchases = e.filter(col("event_type") === "purchase").drop("event_type")
      val touches = e.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ms"), col("event_id"),
          col("event_type").as("touch_type"), col("ms").as("touch_ms"))
      AsOfJoin.backward(purchases, touches,
        on = Seq("user_id"), orderCols = Seq("ms", "event_id"),
        payload = Seq("touch_type", "touch_ms"), strict = true)
        .withColumn("channel",
          when(col("touch_ms").isNotNull &&
            col("ms") - col("touch_ms") <= lit(86400000L), col("touch_type"))
            .otherwise(lit("direct")))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_conversions"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("channel")
    },

    // Daily volume anomaly flags: per (event_type, UTC day) counts compared
    // against the type's floor-mean daily volume; a day is anomalous when
    // it deviates ±20% from that mean. All-integer arithmetic (ratio
    // comparison via cross-multiplication) so the oracle is bit-exact.
    // Scale shape: one shuffle to the (type, day) grain — tiny output —
    // then the per-type means broadcast back.
    "q_anomaly" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("event_type"), expr("(ts div 1000000) div 86400000").as("day"))
      val daily = e.groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      val stats = daily.groupBy("event_type")
        .agg(expr("sum(n) div count(1)").as("mean_n"))
      daily.join(broadcast(stats), "event_type")
        .withColumn("anomaly",
          when(col("n") * lit(100L) > col("mean_n") * lit(120L) ||
            col("n") * lit(100L) < col("mean_n") * lit(80L), lit(1L)).otherwise(lit(0L)))
        .select("event_type", "day", "n", "mean_n", "anomaly")
        .orderBy("event_type", "day")
    },

    // 7-day trailing revenue average per event type — the explicit
    // bounded-ROWS window frame (q_window covers the unbounded running
    // frame). All-cents BIGINT arithmetic: daily revenue reduces to exact
    // cents first, the trailing sum and floor-average stay integral, so
    // the oracle is bit-exact. One shuffle to the (type, day) grain; the
    // window runs over the tiny daily table.
    "q_moving_avg" -> { (s, dir) =>
      val daily = Tables(s, dir, "events")
        .select(col("event_type"), expr("(ts div 1000000) div 86400000").as("day"),
          col("value"))
        .groupBy("event_type", "day")
        .agg((sum(col("value").cast("decimal(18,2)")) * lit(100))
          .cast("long").as("rev_cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
      daily
        .withColumn("rev7_cents", sum(col("rev_cents")).over(w))
        .withColumn("n7", count(lit(1)).over(w))
        .select(col("event_type"), col("day"), col("rev_cents"),
          expr("rev7_cents div n7").as("avg7_cents"))
        .orderBy("event_type", "day")
    },

    // Feature-adoption reach curves — per event type, daily new adopters
    // and cumulative reach (the growth chart next to retention/funnel/
    // attribution). Cumulative distinct users is not a window-able
    // aggregate; the standard decomposition is first-seen day per
    // (user, type) -> daily adopter counts -> running sum per type. Both
    // shuffles carry slim keys; the running sum windows over the tiny
    // (type, day) grain with NO single-partition stage.
    "q_reach" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("(ts div 1000000) div 86400000").as("day"))
      val firstDay = e.groupBy("user_id", "event_type")
        .agg(min("day").as("first_day"))
      val daily = firstDay.groupBy("event_type", "first_day")
        .agg(count(lit(1)).as("new_users"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("first_day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      daily
        .withColumn("cum_users", sum(col("new_users")).over(w))
        .orderBy("event_type", "first_day")
    },

    // Top 3-step event paths — the Sankey/user-journey source table:
    // consecutive event-type trigrams per user (offset order), counted
    // corpus-wide, bounded top-10. One user shuffle for both lead
    // windows; the path agg is map-side combined; TakeOrderedAndProject
    // caps the output.
    "q_paths" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("event_id")
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("t2", lead("event_type", 1).over(w))
        .withColumn("t3", lead("event_type", 2).over(w))
        .filter(col("t3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(10)
    },

    // Recursive-CTE reachability over the event-transition graph (which
    // event types are reachable from 'view', in how few steps) — the
    // declarative closure surface (Spark 4.x WITH RECURSIVE), next to
    // q_dedup_cluster's ITERATIVE closure operator. The recursion runs on
    // the 5-node transition graph derived by one user-window shuffle; the
    // hop bound terminates the cyclic graph. Identical SQL text runs on
    // both engines.
    "q_reachability" -> { (s, dir) =>
      Tables(s, dir, "events").createOrReplaceTempView("events_rec")
      // materialize the tiny edge table BEFORE the recursion: a CTE is
      // re-executed per recursive step, so leaving the event-stream
      // window inside it re-scans the log once per hop (3.2-3.7 s vs 1.2 s
      // warm at sf0.1). The graph is <= |types|^2 rows — a bounded driver
      // gather (the IVF-centroid / bloom-words precedent) turns every
      // recursive step into a LocalRelation join.
      import s.implicits._
      s.sql(
        """SELECT DISTINCT event_type AS src, next_type AS dst FROM (
          |  SELECT event_type,
          |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
          |  FROM events_rec)
          |WHERE next_type IS NOT NULL AND next_type <> event_type""".stripMargin)
        .as[(String, String)].collect().toSeq
        .toDF("src", "dst")
        .createOrReplaceTempView("edges_rec")
      s.sql(
        """WITH RECURSIVE reach(dst, hops) AS (
          |  SELECT dst, 1 FROM edges_rec WHERE src = 'view'
          |  UNION ALL
          |  SELECT e.dst, r.hops + 1 FROM reach r JOIN edges_rec e ON e.src = r.dst
          |  WHERE r.hops < 4)
          |SELECT dst, CAST(MIN(hops) AS BIGINT) AS min_hops
          |FROM reach GROUP BY dst ORDER BY dst""".stripMargin)
    },

    // Spend-decile report — NTILE over per-user totals (the whale-curve
    // table: how concentrated is revenue). Totals reduce first (one
    // user shuffle); the decile cut is the decomposed global NTILE
    // ([[Ranks]] — range buckets + literal prefix offsets, no
    // single-partition window even over the reduced grain); the
    // (spend, user) order is total so both engines tile identically;
    // sums are exact cents.
    "q_user_deciles" -> { (s, dir) =>
      val totals = Tables(s, dir, "events")
        .groupBy("user_id")
        .agg((sum(col("value").cast("decimal(18,2)")) * lit(100))
          .cast("long").as("spend_cents"))
      Ranks.bucketRange(totals, Seq(col("spend_cents").desc, col("user_id").asc))
        .withRowNumber("__i")
        .withNtile("__i", 10, "decile")
        .result.drop("__i")
        .groupBy("decile")
        .agg(count(lit(1)).as("n_users"),
          sum(col("spend_cents")).as("decile_cents"),
          max(col("spend_cents")).as("max_cents"),
          min(col("spend_cents")).as("min_cents"))
        .orderBy("decile")
    },

    // Range join: assign every event to the per-user session interval
    // containing it. The bucketed point-in-interval equi-join
    // (operators.RangeJoin) replaces the BroadcastNestedLoopJoin a raw
    // BETWEEN predicate would plan — both sides scale out.
    "q_range_join" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), expr("ts div 1000000").as("ms"))
      val sessions = Sessionize.byGap(e, "user_id", "ms", "event_id", 6L * 3600 * 1000)
        .groupBy("user_id", "session_id")
        .agg(min("ms").as("s_start"), max("ms").as("s_end"))
      RangeJoin.pointInInterval(e, "ms", sessions, "s_start", "s_end",
        equiCols = Seq("user_id"), bucketWidth = 86400000L)
        .select(col("event_id"), col("user_id"), col("ms"),
          col("session_id").cast("long").as("session_id"),
          col("s_start"), col("s_end"))
        .orderBy("event_id")
    },

    // As-of join: each purchase picks up the latest strictly-prior click.
    "q_asof_join" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), expr("ts div 1000000").as("ms"), col("event_type"))
      val purchases = e.filter(col("event_type") === "purchase").drop("event_type")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ms"), col("event_id"), col("event_id").as("click_id"))
      AsOfJoin.backward(purchases, clicks,
        on = Seq("user_id"), orderCols = Seq("ms", "event_id"),
        payload = Seq("click_id"), strict = true)
        .select("event_id", "user_id", "click_id")
        .orderBy("event_id")
    },

    // J1 JournalParser parity: kafka-journal wire records (JSON envelope +
    // action header, 3 events per append), decoded with
    // graft.streaming.JournalParser, decoded payloads aggregated.
    // encode∘decode is the identity on the data, so the oracle computes
    // the same aggregate straight from `events` — the Spark side genuinely
    // round-trips through from_json. The encode harness lives in
    // JournalFixture (materialized once per sf dir) so this query times
    // the codegen'd decode, not collect_list + interpreted transform.
    "q_journal_decode" -> { (s, dir) =>
      import org.apache.spark.sql.types.{LongType, StructType}
      val decoded = graft.streaming.JournalParser.toEvents(
        JournalFixture.encoded(s, dir), payloadSchema = new StructType().add("k", LongType))
      decoded.groupBy(col("key").cast("long").as("user_id"))
        .agg(
          sum(col("payload.k")).as("k_sum"),
          count(lit(1)).as("n_events"),
          max(col("seq_nr")).as("max_seq"))
        .orderBy("user_id")
    },

    // T5/T6 analogue: unload idle keys — snapshot only keys active in the
    // last 2 days relative to the max event time.
    "q_unload_idle" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(col("user_id"), expr("ts div 1000000").as("ms"))
      val mx = e.agg(max("ms").as("max_ms"))
      e.crossJoin(broadcast(mx))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), max("ms").as("last_ms"), max("max_ms").as("gmax"))
        .filter(col("last_ms") >= col("gmax") - lit(2L * 24 * 3600 * 1000))
        .drop("gmax")
        .orderBy("user_id")
    },

    // SCD type-2 dimension build from the change stream: collapse each
    // per-user run of identical event_type into one version row with
    // [valid_from, valid_to) at ms grain, open-ended current row flagged.
    // All three window functions share ONE user-key exchange (change
    // detection, version numbering, interval close) — the canonical
    // "CDC stream → queryable dimension" pass; at 100 TB the shuffle
    // carries only (user, type, ms), never the payload.
    "q_scd2" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ms", "event_id")
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts div 1000000").as("ms"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("valid_to_ms", lead("ms", 1).over(w))
        .select(col("user_id"), col("version"), col("event_type"),
          col("ms").as("valid_from_ms"), col("valid_to_ms"),
          when(col("valid_to_ms").isNull, 1L).otherwise(0L).as("is_current"))
        .orderBy("user_id", "version")
    },

    // Window-function breadth: distribution ranks (percent_rank,
    // cume_dist), frame-addressed values (nth_value, first/last over the
    // full frame), offset with default (lag). One total order per
    // event_type — (value, event_id) breaks double ties — so every
    // function shares ONE exchange+sort. The rank fractions are ratios of
    // identical integers on both engines, hence hash-exact doubles.
    "q_window_breadth" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("value", "event_id")
      val wf = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Tables(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("nth3", nth_value(col("value"), 3).over(wf))
        .withColumn("fv", first(col("value")).over(wf))
        .withColumn("lv", last(col("value")).over(wf))
        .withColumn("lag2", lag(col("value"), 2, -1.0).over(w))
        .orderBy("event_id")
    },

    // The SCALE twin of q_window_breadth (the q_substring_dup_fast
    // discipline: same oracle, different plan): every window statistic
    // re-derived from ONE grouped-decomposition rank ([[Ranks]]) plus
    // distributed equi-joins — no per-type corpus sort anywhere. The
    // window's order key (value, event_id) is UNIQUE, so the peer groups
    // rank/percent_rank/cume_dist quantify over are single rows:
    // percent_rank = (r−1)/(n−1) and cume_dist = r/n straight from the
    // decomposed row_number (tie semantics would need the (type, value)
    // min/max-r join instead); nth/first/last value = 1-row-per-type
    // broadcast picks at r ∈ {3, 1, n}; lag(2) = self-equi-join on
    // (type, r−2) with the default patched by coalesce. The window-API
    // demo stays q_window_breadth; this is the plan a 100 TB corpus runs.
    "q_window_scaled" -> { (s, dir) =>
      val base = Tables(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val b = Ranks.groupedBucketRange(base, "event_type",
        Seq(col("value").asc, col("event_id").asc))
      val ranked = b.withRowNumber("__r").withGroupCount("__n").result
        .lineageCut() // branches below reuse + self-join (house rule)
      def pick(r: Column, as: String) = ranked.filter(col("__r") === r)
        .select(col("event_type"), col("value").as(as))
      // presence flag, not coalesce on the value: lag's default applies
      // only when the offset ROW doesn't exist — a present row with a
      // NULL value must stay NULL (real lag semantics on nullable input)
      val lagSrc = ranked.select(col("event_type").as("__t2"),
        (col("__r") + 2).as("__rl"), col("value").as("__lag2v"),
        lit(true).as("__lp"))
      ranked
        .join(broadcast(pick(lit(3L), "nth3")), Seq("event_type"), "left")
        .join(broadcast(pick(lit(1L), "fv")), Seq("event_type"))
        .join(broadcast(pick(col("__n"), "lv")), Seq("event_type"))
        .join(lagSrc, col("event_type") === col("__t2") && col("__r") === col("__rl"), "left")
        .select(col("event_id"), col("event_type"), col("value"),
          when(col("__n") === 1, lit(0.0)).otherwise(
            (col("__r") - 1).cast("double") / (col("__n") - 1).cast("double")).as("pr"),
          (col("__r").cast("double") / col("__n").cast("double")).as("cd"),
          col("nth3"), col("fv"), col("lv"),
          when(col("__lp").isNull, lit(-1.0)).otherwise(col("__lag2v")).as("lag2"))
        .orderBy("event_id")
    },

    // Time-series gap filling: the sparse high-value daily series joined
    // onto a full (type x day) spine — missing days become explicit zero
    // rows so the running cumulative is continuous (the resample step
    // every dashboard needs before charting a sparse series). The spine
    // derives from the 1-row min/max (broadcast), never a driver literal.
    "q_gap_fill" -> { (s, dir) =>
      val d = Tables(s, dir, "events")
        .filter(col("value") > 250)
        .select(col("event_type"), expr("ts div 1000000 div 86400000").as("day"),
          col("value"))
      val daily = d.groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
      val mm = d.agg(min("day").as("dmin"), max("day").as("dmax"))
      val spine = d.select("event_type").distinct()
        .crossJoin(broadcast(mm))
        .select(col("event_type"), explode(sequence(col("dmin"), col("dmax"))).as("day"))
      val filled = spine.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("cnt"), lit(0L)).as("n"))
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      filled.withColumn("running", sum("n").over(wc))
        .orderBy("event_type", "day")
    },

    // MERGE/upsert semantics (SCD1 apply): the CDC batch — each user's
    // last post-cutoff event, 'view' meaning delete, anything else upsert
    // — applied onto the pre-cutoff base snapshot via ONE full outer
    // join: matched+delete drops, matched+upsert updates, unmatched
    // change inserts, unmatched base survives. The provenance tag proves
    // each branch. Both snapshots reduce to per-key rows BEFORE the
    // merge join (the 100 TB shape: the join moves state rows, not logs).
    "q_merge_upsert" -> { (s, dir) =>
      val cutoff = 1705363200000L // 2024-01-16 UTC
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ms").desc, col("event_id").desc)
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), expr("ts div 1000000").as("ms"))
      def lastState(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("value"))
      val base = lastState(e.filter(col("ms") < cutoff))
      val changes = lastState(e.filter(col("ms") >= cutoff))
        .withColumn("action",
          when(col("event_type") === "view", lit("D")).otherwise(lit("U")))
      base.as("b").join(changes.as("c"),
          col("b.user_id") === col("c.user_id"), "full_outer")
        .filter(col("c.action").isNull || col("c.action") =!= "D")
        .select(
          coalesce(col("b.user_id"), col("c.user_id")).as("user_id"),
          coalesce(col("c.event_type"), col("b.event_type")).as("event_type"),
          coalesce(col("c.value"), col("b.value")).as("value"),
          when(col("c.user_id").isNull, lit("kept"))
            .when(col("b.user_id").isNull, lit("inserted"))
            .otherwise(lit("updated")).as("merge_op"))
        .orderBy("user_id")
    },

    // Temporal (validity-interval) join: every event matched to the SCD2
    // version in force STRICTLY BEFORE it — composed from the q_scd2
    // change rows and AsOfJoin.backward (strict, so a change event reads
    // the state it is leaving, not the one it opens). The as-of
    // union+window shape keeps this ONE user shuffle; an interval/theta
    // join would explode pairs. Report: the (prior state x arriving
    // event) transition matrix — off-diagonal cells are the state
    // changes; first events have no prior state ('none'). The oracle
    // derives the same state via a LAST_VALUE IGNORE NULLS fill over a
    // 1-PRECEDING frame — two independent constructions, one hash.
    "q_temporal_join" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ms", "event_id")
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts div 1000000").as("ms"))
      val versions = e
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .select(col("user_id"), col("ms"), col("event_id"),
          col("event_type").as("state"))
      AsOfJoin.backward(e, versions,
          on = Seq("user_id"), orderCols = Seq("ms", "event_id"),
          payload = Seq("state"), strict = true)
        .select(coalesce(col("state"), lit("none")).as("state"), col("event_type"))
        .groupBy("state", "event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("state", "event_type")
    },

    // Sigma-band outlier report: per event type, rows beyond mean ± 3
    // stddev_pop — mean/σ derive from the exact decimal power sums
    // (identical doubles on both engines, so the outlier SET is identical
    // and the report is hash-exact, no float tolerance). Group stats
    // broadcast back onto the stream: two scans, one of them a slim
    // 3-number-per-group aggregate.
    "q_outliers" -> { (s, dir) =>
      val v = col("value")
      val e = Tables(s, dir, "events").select(col("event_type"), v)
      val stats = e.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(v.cast("decimal(18,2)")).cast("double").as("sv"),
        sum((v * v).cast("decimal(18,4)")).cast("double").as("svv"))
        .selectExpr("event_type", "n", "sv / n AS mu",
          "sqrt(svv / n - (sv / n) * (sv / n)) AS sigma")
      e.join(broadcast(stats), "event_type")
        .filter(v > col("mu") + lit(3.0) * col("sigma") ||
          v < col("mu") - lit(3.0) * col("sigma"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_outliers"),
          floor(min(v) * 100).cast("long").as("min_out_cents"),
          floor(max(v) * 100).cast("long").as("max_out_cents"))
        .orderBy("event_type")
    },

    // Multi-touch (linear) attribution — the equal-split extension of
    // last-touch q_attribution: each purchase's revenue divides EXACTLY
    // across its preceding 24 h of non-purchase touches — integer cents,
    // remainder to the earliest touch — so every touched purchase's cents
    // are conserved to the cent by construction (purchases with no touch
    // in the lookback stay unattributed, the 'direct' bucket of the
    // last-touch query). Next-purchase lookup is a forward IGNORE-NULLS
    // first over one user exchange; the per-purchase split adds one.
    "q_multi_touch" -> { (s, dir) =>
      val W = org.apache.spark.sql.expressions.Window
      val wFwd = W.partitionBy("user_id").orderBy("ms", "event_id")
        .rowsBetween(0, org.apache.spark.sql.expressions.Window.unboundedFollowing)
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts div 1000000").as("ms"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      // all three np_* come from the SAME (first following) purchase row:
      // the CASEs null together, so the three IGNORE-NULLS firsts cannot
      // mix rows (the q_attribution fill discipline)
      val isP = col("event_type") === "purchase"
      val np = e
        .withColumn("np_ms", first(when(isP, col("ms")), ignoreNulls = true).over(wFwd))
        .withColumn("np_id", first(when(isP, col("event_id")), ignoreNulls = true).over(wFwd))
        .withColumn("np_cents", first(when(isP, col("cents")), ignoreNulls = true).over(wFwd))
      val touches = np
        .filter(col("event_type") =!= "purchase" &&
          col("np_ms").isNotNull &&
          col("np_ms") - col("ms") <= 24L * 3600 * 1000)
      val wP = W.partitionBy("user_id", "np_id")
      val wPo = wP.orderBy("ms", "event_id")
      touches
        .withColumn("n_t", count(lit(1)).over(wP))
        .withColumn("r", row_number().over(wPo))
        .withColumn("share",
          expr("np_cents div n_t + CASE WHEN r = 1 THEN np_cents % n_t ELSE 0 END"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_touches"),
          sum("share").cast("long").as("attributed_cents"))
        .orderBy("event_type")
    },

    // Rolling 7-day distinct users (WAU by day). Cumulative reach
    // (q_reach) decomposes into first-seen days, but a ROLLING distinct
    // cannot — the exact scalable shape is the bounded day-explode: each
    // (user, active-day) pair feeds the 7 windows it belongs to, so the
    // cost is 7x the user-day table (slim), never a pairwise join or a
    // per-window rescan. Partial head windows are excluded (full-window
    // semantics).
    "q_rolling_reach" -> { (s, dir) =>
      val ud = Tables(s, dir, "events")
        .select(col("user_id"), expr("ts div 1000000 div 86400000").as("day"))
        .distinct()
      val mm = ud.agg(min("day").as("dmin"), max("day").as("dmax"))
      ud.select(col("user_id"), explode(sequence(col("day"), col("day") + 6)).as("wday"))
        .groupBy("wday").agg(countDistinct("user_id").as("wau"))
        .crossJoin(broadcast(mm))
        .filter(col("wday").between(col("dmin") + 6, col("dmax")))
        .select("wday", "wau")
        .orderBy("wday")
    },

    // Peak session concurrency by sweep line: sessions become +1/-1
    // boundary deltas (half-open [start, end+1)), per-ms deltas reduce
    // first, and the running sum's per-day maximum is the load curve's
    // peak — the interval-stabbing answer WITHOUT an interval join. The
    // global cumsum is the decomposed two-level prefix ([[Ranks]]) over
    // the per-ms delta table (session-bounded, collapsed by ms) — no
    // single-partition stage at any grain.
    "q_peak_concurrency" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), expr("ts div 1000000").as("ms"))
      val sess = Sessionize.byGap(e, "user_id", "ms", "event_id", 6L * 3600 * 1000)
        .groupBy("user_id", "session_id")
        .agg(min("ms").as("sms"), max("ms").as("ems"))
      val deltas = sess.select(col("sms").as("ms"), lit(1L).as("dd"))
        .union(sess.select((col("ems") + 1).as("ms"), lit(-1L).as("dd")))
        .groupBy("ms").agg(sum("dd").as("delta"))
      Ranks.bucketRange(deltas, Seq(col("ms").asc), valueCols = Seq("delta"))
        .withCumSum("delta", "conc")
        .result
        .groupBy(expr("ms div 86400000").as("day"))
        .agg(max("conc").as("peak"))
        .orderBy("day")
    },

    // Value-based RANGE window frame (the sliding-interval complement of
    // the ROWS frames elsewhere): per event, that user's activity in the
    // trailing hour BY TIMESTAMP — frame membership is decided by the ms
    // value, so simultaneous events are tie-agnostic by construction.
    // Both frame aggregates share ONE user exchange+sort.
    "q_range_frame" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ms")
        .rangeBetween(-3600000L, 0L)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000000").as("ms"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("cents_1h", sum("cents").over(w))
        .select("event_id", "user_id", "ms", "n_1h", "cents_1h")
        .orderBy("event_id")
    },

    // CUSUM changepoint per event type, all-integer: with n days, total T
    // and daily count x_i, S_k = Σ_{i<=k}(n·x_i − T) = n·cum_k − k·T stays
    // in BIGINT (no mean, no float), and the changepoint is the day
    // maximizing |S_k| (earliest day on ties). Pre/post rates are
    // floor-scaled ppm of exact integers. One (type, day) reduction, then
    // windows over the 150-row daily grid — the event stream is scanned
    // once and everything after the first aggregate is grid-sized.
    "q_changepoint" -> { (s, dir) =>
      val W = org.apache.spark.sql.expressions.Window
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), expr("ts div 1000000 div 86400000").as("day"))
        .agg(count(lit(1)).as("x"))
      val wt = W.partitionBy("event_type")
      val wo = wt.orderBy("day")
      daily
        .withColumn("k", row_number().over(wo).cast("long"))
        .withColumn("cum", sum("x").over(wo.rowsBetween(W.unboundedPreceding, 0)))
        .withColumn("n", count(lit(1)).over(wt))
        .withColumn("t", sum("x").over(wt))
        .withColumn("su", expr("n * cum - k * t"))
        .withColumn("pick",
          row_number().over(wt.orderBy(abs(col("su")).desc, col("day").asc)))
        .filter(col("pick") === 1)
        .selectExpr("event_type", "day AS cp_day", "su AS cusum",
          "cum * 1000000 div k AS pre_rate_ppm",
          "CASE WHEN k = n THEN NULL ELSE (t - cum) * 1000000 div (n - k) END AS post_rate_ppm")
        .orderBy("event_type")
    },

    // Conversion-latency distribution: per user, first 'view' → first
    // 'purchase' delta (ms, integer) for users converting after first
    // view; deciles cut by the decomposed global NTILE ([[Ranks]]) over
    // the reduced per-user grain with user_id tiebreaks (total order on
    // both engines). The event stream reduces to two conditional MINs per
    // user in one scan — the decile buckets then touch user-count rows,
    // never events, and no single-partition window anywhere.
    "q_time_to_convert" -> { (s, dir) =>
      val per = Tables(s, dir, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", expr("ts div 1000000"))).as("v_ms"),
          min(when(col("event_type") === "purchase", expr("ts div 1000000"))).as("p_ms"))
        .filter(col("v_ms").isNotNull && col("p_ms").isNotNull && col("p_ms") > col("v_ms"))
        .withColumn("delta", col("p_ms") - col("v_ms"))
      Ranks.bucketRange(per, Seq(col("delta").asc, col("user_id").asc))
        .withRowNumber("__i")
        .withNtile("__i", 10, "decile")
        .result.drop("__i")
        .groupBy("decile")
        .agg(count(lit(1)).as("n_users"),
          min("delta").as("min_ms"), max("delta").as("max_ms"),
          expr("CAST(SUM(delta) AS BIGINT) div COUNT(*)").as("mean_ms"))
        .orderBy("decile")
    },

    // Time-weighted average (step-function integration): each event's
    // value holds until the next event, so the per-user TWA is
    // Σ cents_i·(ms_{i+1}−ms_i) div (ms_n − ms_1) — all integer (exact
    // cents × ms durations; ≤2.6e13 per term, far inside Long). The lead
    // window and the final aggregate share ONE user exchange; a plain
    // AVG would weight a value by its event COUNT, not by how long it
    // was in force — the classic telemetry-gauge mistake.
    "q_twap" -> { (s, dir) =>
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ms", "event_id")
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000000").as("ms"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
        .withColumn("nms", lead("ms", 1).over(W))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          expr("MAX(ms) - MIN(ms)").as("dur_ms"),
          expr("CAST(SUM(CASE WHEN nms IS NULL THEN 0 ELSE cents * (nms - ms) END) AS BIGINT)").as("area"))
        .selectExpr("user_id", "n_events", "dur_ms",
          "CASE WHEN dur_ms = 0 THEN NULL ELSE area div dur_ms END AS twa_cents")
        .orderBy("user_id")
    },

    // Incremental view maintenance: a day-15 cutoff splits the log into a
    // maintained BASE aggregate (state rows: n, cents per (type, day))
    // and a DELTA batch; the view updates by merging state rows — base is
    // never rescanned. The oracle recomputes the view from the FULL log,
    // so the hash-match IS the maintenance-correctness proof (sum/count
    // are mergeable partials; the mean derives after the merge, never
    // averaged across batches). Both legs push their disjoint time
    // predicates to the scan.
    "q_ivm" -> { (s, dir) =>
      // cutoff 2024-01-16 as raw NANOS: the predicate sits directly above
      // the scan and reaches PushedFilters when the driver ships ts as
      // physical long nanos (with the TIMESTAMP_NTZ shipping it stays a
      // scan-adjacent DataFilter — Tables' normalization is in between)
      val cutNs = 19738L * 86400L * 1000000000L
      def stateRows(pred: Column => Column) =
        Tables(s, dir, "events")
          .filter(pred(col("ts")))
          .groupBy(col("event_type"), expr("ts div 1000000 div 86400000").as("day"))
          .agg(count(lit(1)).as("n"),
            expr("CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)").as("cents"))
      stateRows(_ < cutNs).union(stateRows(_ >= cutNs))
        .groupBy("event_type", "day")
        .agg(expr("CAST(SUM(n) AS BIGINT)").as("n"),
          expr("CAST(SUM(cents) AS BIGINT)").as("cents"))
        .selectExpr("event_type", "day", "n", "cents",
          "cents div n AS mean_cents")
        .orderBy("event_type", "day")
    },

    // Calendar seasonality profile: weekday x event-type activity grid
    // with per-type share in ppm. Weekday from pure epoch-day arithmetic
    // ((day+4) mod 7 — 1970-01-01 was a Thursday), so no timezone
    // function is in play on either engine.
    // A/B experiment readout (two-proportion z-test): variant by user-id
    // parity, conversion = heavy purchaser (>= 16 purchases — "ever
    // purchased" is degenerate on this log: every user converts, p(1-p)=0
    // and the statistic is 0/0). Counts reduce per user in one scan, the
    // 2-row variant table collapses to one experiment row, and the z
    // statistic derives from exact BIGINTs through textually identical
    // double arithmetic (sqrt is IEEE-exact on both engines) — same
    // discipline as q_linreg/q_corr_matrix. Rates stay integer ppm; the
    // all-or-none degenerate case yields NULL by an identical guard.
    "q_ab_test" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(expr("CASE WHEN CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) >= 16 THEN 1 ELSE 0 END").as("conv"))
        .groupBy(expr("user_id % 2").as("variant"))
        .agg(count(lit(1)).as("n"), expr("CAST(SUM(conv) AS BIGINT)").as("c"))
        .agg(
          expr("CAST(SUM(CASE WHEN variant = 0 THEN n ELSE 0 END) AS BIGINT)").as("n_a"),
          expr("CAST(SUM(CASE WHEN variant = 0 THEN c ELSE 0 END) AS BIGINT)").as("conv_a"),
          expr("CAST(SUM(CASE WHEN variant = 1 THEN n ELSE 0 END) AS BIGINT)").as("n_b"),
          expr("CAST(SUM(CASE WHEN variant = 1 THEN c ELSE 0 END) AS BIGINT)").as("conv_b"))
        .selectExpr("n_a", "conv_a", "n_b", "conv_b",
          "conv_a * 1000000 div n_a AS rate_a_ppm",
          "conv_b * 1000000 div n_b AS rate_b_ppm",
          "CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN NULL ELSE (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * (1.0 / n_a + 1.0 / n_b)) END AS z")
    },

    // Weighted shortest path by bounded Bellman-Ford: the event-type
    // transition graph gets rarity costs (1e6 div transition count), and
    // 4 relaxation rounds give the exact min-cost path of <= 4 hops from
    // 'view' to every type — the oracle closes the same edges with a
    // hop-bounded recursive CTE. The edge list reduces from one user-
    // ordered scan and is checkpointed (graph-sized, here <= 20 rows);
    // each relaxation joins the <= |V|-row frontier against it, so round
    // cost is |E|-bounded — the q_dedup_cluster/pagerank iterative
    // discipline at fixed depth (no fixpoint, no lineage growth risk).
    "q_shortest_path" -> { (s, dir) =>
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ms", "event_id")
      val edges = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts div 1000000").as("ms"))
        .withColumn("nxt", lead("event_type", 1).over(W))
        .filter(col("nxt").isNotNull && col("nxt") =!= col("event_type"))
        .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("n"))
        .selectExpr("src", "dst", "1000000 div n AS w")
        .lineageCut()
      var dist = edges.sparkSession.range(1)
        .selectExpr("'view' AS node", "CAST(0 AS BIGINT) AS cost")
      for (_ <- 1 to 4) {
        val stepped = dist.join(edges, col("node") === col("src"))
          .select(col("dst").as("node"), (col("cost") + col("w")).as("cost"))
        dist = dist.union(stepped).groupBy("node").agg(min("cost").as("cost"))
      }
      dist.selectExpr("node AS event_type", "cost AS min_cost")
        .orderBy("event_type")
    },

    // CEP-style sequence pattern detection (the MATCH_RECOGNIZE / Flink
    // CEP analogue): each user's ordered event stream becomes a string of
    // type initials (all five types have distinct first letters), and the
    // pattern "view, any clicks, purchase" is a regex counted left-to-
    // right non-overlapping — identical semantics on both engines for
    // this alternation-free pattern. One user exchange builds the
    // sequence; the match count is a per-row codegen'd regexp_count.
    "q_event_pattern" -> { (s, dir) =>
      Tables(s, dir, "events")
        .select(col("user_id"),
          struct(expr("ts div 1000000").as("ms"), col("event_id"),
            expr("substring(event_type, 1, 1)").as("i")).as("ev"))
        .groupBy("user_id")
        .agg(expr(
          "array_join(transform(array_sort(collect_list(ev)), x -> x.i), '')").as("seq"))
        .select(col("user_id"),
          length(col("seq")).cast("long").as("n_events"),
          expr("CAST(regexp_count(seq, 'vc*p') AS BIGINT)").as("n_funnels"))
        .orderBy("user_id")
    },

    // Mann-Whitney U (nonparametric A/B): rank-sum comparison of per-user
    // exact cent spend between the parity variants — robust where the
    // z-test's normal approximation is not. All integer: ranks double via
    // the tie trick (2·avgrank = 2·rank + ties − 1, exact for any tie
    // group), so U2 = 2·U stays BIGINT and U2_a + U2_b = 2·n_a·n_b holds
    // identically (conservation is part of the hash-checked output). One
    // user reduction, then a per-DISTINCT-cents reduction whose decomposed
    // global cumsum ([[Ranks]]) replaces the rank window: the tie-group
    // min-rank is (rows strictly below) + 1 = cum_t − t + 1, so the
    // doubled avg rank is r2 = 2·cum_t − t + 1 and per-variant sums
    // weight r2 by the group's variant counts — no rank window, no
    // single-partition stage.
    "q_mannwhitney" -> { (s, dir) =>
      val per = Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(expr("CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)").as("cents"))
        .selectExpr("user_id % 2 AS variant", "cents")
      val grp = per.groupBy("cents")
        .agg(expr("CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)").as("ca"),
          expr("CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)").as("cb"))
        .withColumn("t", expr("ca + cb"))
      Ranks.bucketRange(grp, Seq(col("cents").asc), valueCols = Seq("t"))
        .withCumSum("t", "cum_t")
        .result
        .withColumn("r2", expr("2 * cum_t - t + 1"))
        .agg(
          expr("CAST(SUM(ca) AS BIGINT)").as("n_a"),
          expr("CAST(SUM(cb) AS BIGINT)").as("n_b"),
          expr("CAST(SUM(ca * r2) AS BIGINT)").as("s2_a"),
          expr("CAST(SUM(cb * r2) AS BIGINT)").as("s2_b"))
        .withColumn("u2_a", expr("s2_a - n_a * (n_a + 1)"))
        .withColumn("u2_b", expr("s2_b - n_b * (n_b + 1)"))
        // auc_ppm's numerator u2·1e6 outgrows BIGINT past ~2e6
        // users/variant → the exactFloorDiv decimal discipline
        .transform(exactFloorDiv(_, "CAST(u2_a AS DECIMAL(38,0)) * 1000000",
          "CAST(2 AS DECIMAL(38,0)) * n_a * n_b", "auc_ppm"))
        .select("n_a", "n_b", "u2_a", "u2_b", "auc_ppm")
    },

    // Two-sample Kolmogorov-Smirnov (distribution-shape complement of the
    // location tests): D = max |ECDF_a − ECDF_b| over per-user cent
    // spend, computed exactly as max |cumA·n_b − cumB·n_a| (integer — no
    // float ECDF anywhere); the report carries the gap's location and
    // D in ppm. One user reduction, then a per-DISTINCT-cents reduction;
    // both ECDFs ride ONE decomposed global cumsum pass ([[Ranks]] — the
    // totals fall out of the same bounded bucket gather as literals), and
    // the argmax is orderBy+limit(1) (TakeOrdered — a per-partition top-1
    // reduce), so no single-partition window anywhere.
    "q_ks_test" -> { (s, dir) =>
      val grp = Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(expr("CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)").as("cents"))
        .selectExpr("user_id % 2 AS variant", "cents")
        .groupBy("cents")
        .agg(expr("CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)").as("ca"),
          expr("CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)").as("cb"))
      val b = Ranks.bucketRange(grp, Seq(col("cents").asc), valueCols = Seq("ca", "cb"))
      // gap and d_ppm ride DECIMAL(38,0): the cum·n products outgrow
      // BIGINT past ~3e9 users/variant and the ppm numerator already at
      // ~3e6 — the exactFloorDiv discipline (d_num reports as BIGINT,
      // fine to ~9.2e18; the ARGMAX compares the unclipped decimals).
      // d_ppm derives on the grid BEFORE the top-1, keeping the tail a
      // bare Sort+Limit — a projection between them forfeits the
      // TakeOrderedAndProject fusion (planned as global sort+CollectLimit)
      val grid = b.withCumSum("ca", "cum_a").withCumSum("cb", "cum_b")
        .result
        .withColumn("n_a", lit(b.valueTotal("ca")))
        .withColumn("n_b", lit(b.valueTotal("cb")))
        .withColumn("gap", expr(
          "abs(CAST(cum_a AS DECIMAL(38,0)) * n_b - CAST(cum_b AS DECIMAL(38,0)) * n_a)"))
      exactFloorDiv(grid, "gap * 1000000", "CAST(n_a AS DECIMAL(38,0)) * n_b", "d_ppm")
        .select(col("n_a"), col("n_b"), col("cents").as("at_cents"),
          expr("CAST(gap AS BIGINT)").as("d_num"), col("d_ppm"), col("gap"))
        .orderBy(col("gap").desc, col("at_cents").asc).limit(1)
        .drop("gap")
    },

    // Recency-decay engagement score with an exact integer half-life:
    // weight = 1/2^age_weeks realized as floor division by power-of-two
    // literals (no float pow anywhere), anchored at the corpus max day
    // (1-row broadcast, the q_gap_fill bounds pattern). The decay rolls
    // up per user next to the raw sum, so the report shows exactly what
    // recency weighting changed.
    "q_decay_score" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"),
          expr("ts div 1000000 div 86400000").as("day"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      val mm = e.agg(max("day").as("dmax"))
      e.crossJoin(broadcast(mm))
        .withColumn("w", expr("(dmax - day) div 7"))
        .withColumn("decayed", expr(
          "cents div (CASE w WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8 WHEN 4 THEN 16 ELSE 32 END)"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          expr("CAST(SUM(cents) AS BIGINT)").as("raw_cents"),
          expr("CAST(SUM(decayed) AS BIGINT)").as("decay_cents"))
        .orderBy("user_id")
    },

    "q_dow_profile" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(ts div 1000000 div 86400000 + 4) % 7").as("dow"))
        .agg(count(lit(1)).as("n"))
        .withColumn("share_ppm",
          expr("n * 1000000 div CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)"))
        .orderBy("event_type", "dow")
    },
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q_fold_count" ->
      "SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1 ORDER BY 1",

    "q_fold_sum" ->
      """SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_fold_filter" ->
      """SELECT user_id, COUNT(*) AS n_purchases FROM events
        |WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_fold_collect" ->
      """SELECT user_id, CAST(SUM(CAST(value*2 AS DECIMAL(18,2))) AS DOUBLE) AS click_sum
        |FROM events WHERE event_type = 'click' GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_fold_contramap" ->
      """SELECT user_id, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_fold_error" ->
      """SELECT user_id,
        | COUNT(CASE WHEN event_type <> 'error' THEN 1 END) AS n_ok,
        | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_fold_last" ->
      """SELECT user_id, MAX(event_id) AS last_offset,
        | max_by(value, event_id) AS last_value, max_by(event_type, event_id) AS last_type
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_fold_ordered" ->
      """SELECT user_id, string_agg(event_type, ',' ORDER BY event_id) AS type_seq
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_fold_flatmap" ->
      """WITH r AS (
        |  SELECT user_id, value, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events)
        |SELECT user_id,
        | CAST(SUM(CASE WHEN rn % 2 = 1 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS odd_sum,
        | CAST(SUM(CASE WHEN rn % 2 = 0 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS even_sum
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_offset_dedup" ->
      """SELECT user_id, COUNT(DISTINCT event_id) AS n_events, MAX(event_id) AS max_offset
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_session_agg" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |f AS (
        |  SELECT user_id, event_id, ms,
        |    CASE WHEN LAG(ms) OVER w IS NULL OR ms - LAG(ms) OVER w > 21600000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |g AS (
        |  SELECT user_id, ms, CAST(SUM(new_s) OVER
        |    (PARTITION BY user_id ORDER BY ms, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, COUNT(*) AS n_events, MIN(ms) AS start_ms, MAX(ms) AS end_ms
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // chained conditional-min windows mirror the operator exactly;
    // strictly-after at ms precision (the house ms-truncation idiom);
    // windowed/plain integer SUMs CAST per the HUGEINT rule
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events
        |           WHERE epoch_ms(ts) < 1704326400000),
        |s0 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN ms END)
        |         OVER (PARTITION BY user_id) AS t0 FROM e),
        |s1 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ms > t0 THEN ms END)
        |         OVER (PARTITION BY user_id) AS t1 FROM s0),
        |s2 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ms > t1 THEN ms END)
        |         OVER (PARTITION BY user_id) AS t2 FROM s1),
        |u AS (
        | SELECT user_id,
        |  CAST(MAX(CASE WHEN t2 IS NOT NULL THEN 3 WHEN t1 IS NOT NULL THEN 2
        |       WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS funnel_depth,
        |  MAX(t2 - t0) AS convert_ms
        | FROM s2 GROUP BY user_id)
        |SELECT funnel_depth, COUNT(*) AS n_users,
        | CAST(SUM(COALESCE(convert_ms, 0)) AS BIGINT)
        |   // greatest(CAST(SUM(CASE WHEN convert_ms IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT), 1)
        |   AS avg_convert_ms
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    // UTC day buckets = epoch_ms // 86400000 on both engines; COUNT is
    // BIGINT, day arithmetic stays BIGINT
    "q_retention" ->
      """WITH e AS (
        | SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1),
        |a AS (
        | SELECT DISTINCT f.cohort_day, e.day - f.cohort_day AS day_offset, e.user_id
        | FROM e JOIN f USING (user_id))
        |SELECT cohort_day, day_offset, COUNT(*) AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the as-of fill mirrors q_asof_join's oracle; both LAST_VALUE fills
    // pick the same row because the CASEs are null on exactly the same
    // (purchase) rows; 24 h lookback applied after the fill
    "q_attribution" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type, value FROM events),
        |f AS (
        |  SELECT user_id, ms, event_type, value,
        |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS) OVER w AS touch_type,
        |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN ms END IGNORE NULLS) OVER w AS touch_ms
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |p AS (
        |  SELECT CASE WHEN touch_ms IS NOT NULL AND ms - touch_ms <= 86400000
        |    THEN touch_type ELSE 'direct' END AS channel, value
        |  FROM f WHERE event_type = 'purchase')
        |SELECT channel, COUNT(*) AS n_conversions,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    // integer-exact throughout: COUNT is BIGINT, the HUGEINT SUM is cast
    // before the floor division, the ±20% band compares via
    // cross-multiplication — no doubles anywhere
    "q_anomaly" ->
      """WITH e AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day FROM events),
        |d AS (SELECT event_type, day, COUNT(*) AS n FROM e GROUP BY 1, 2),
        |s AS (SELECT event_type, CAST(SUM(n) AS BIGINT) // COUNT(*) AS mean_n FROM d GROUP BY 1)
        |SELECT d.event_type, d.day, d.n, s.mean_n,
        | CAST(CASE WHEN d.n*100 > s.mean_n*120 OR d.n*100 < s.mean_n*80
        |   THEN 1 ELSE 0 END AS BIGINT) AS anomaly
        |FROM d JOIN s USING (event_type)
        |ORDER BY 1, 2""".stripMargin,

    // cents stay BIGINT end to end (HUGEINT rule: CAST every windowed
    // integer SUM); values are all positive so floor (//) and Spark's
    // truncating div agree
    "q_moving_avg" ->
      """WITH d AS (
        | SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |   CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_cents
        | FROM events GROUP BY 1, 2),
        |w AS (
        | SELECT event_type, day, rev_cents,
        |   CAST(SUM(rev_cents) OVER (PARTITION BY event_type ORDER BY day
        |     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rev7_cents,
        |   CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY day
        |     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n7
        | FROM d)
        |SELECT event_type, day, rev_cents, rev7_cents // n7 AS avg7_cents
        |FROM w ORDER BY 1, 2""".stripMargin,

    // first-seen-day decomposition of cumulative distinct; windowed
    // integer SUM CAST per the HUGEINT rule
    "q_reach" ->
      """WITH f AS (
        | SELECT user_id, event_type,
        |   MIN(epoch_ms(ts) // 86400000) AS first_day
        | FROM events GROUP BY 1, 2),
        |d AS (SELECT event_type, first_day, COUNT(*) AS new_users
        |      FROM f GROUP BY 1, 2)
        |SELECT event_type, first_day, new_users,
        | CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY first_day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM d ORDER BY event_type, first_day""".stripMargin,

    "q_paths" ->
      """WITH e AS (
        | SELECT user_id, event_id, event_type,
        |   LEAD(event_type, 1) OVER w AS t2,
        |   LEAD(event_type, 2) OVER w AS t3
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |SELECT concat_ws('>', event_type, t2, t3) AS path, COUNT(*) AS n
        |FROM e WHERE t3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin,

    // the same recursive SQL, verbatim (DuckDB WITH RECURSIVE)
    "q_reachability" ->
      """WITH RECURSIVE edges AS (
        |  SELECT DISTINCT event_type AS src, next_type AS dst FROM (
        |    SELECT event_type,
        |      LEAD(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
        |    FROM events)
        |  WHERE next_type IS NOT NULL AND next_type <> event_type),
        |reach(dst, hops) AS (
        |  SELECT dst, 1 FROM edges WHERE src = 'view'
        |  UNION ALL
        |  SELECT e.dst, r.hops + 1 FROM reach r JOIN edges e ON e.src = r.dst
        |  WHERE r.hops < 4)
        |SELECT dst, CAST(MIN(hops) AS BIGINT) AS min_hops
        |FROM reach GROUP BY dst ORDER BY dst""".stripMargin,

    // NTILE remainder-to-first-buckets is standard on both engines; the
    // (spend DESC, user) order is total so tiling is deterministic;
    // integer SUM CAST per the HUGEINT rule
    "q_user_deciles" ->
      """WITH t AS (
        | SELECT user_id,
        |   CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS spend_cents
        | FROM events GROUP BY 1),
        |d AS (
        | SELECT user_id, spend_cents,
        |   CAST(NTILE(10) OVER (ORDER BY spend_cents DESC, user_id) AS BIGINT) AS decile
        | FROM t)
        |SELECT decile, COUNT(*) AS n_users,
        | CAST(SUM(spend_cents) AS BIGINT) AS decile_cents,
        | MAX(spend_cents) AS max_cents, MIN(spend_cents) AS min_cents
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_range_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |f AS (
        |  SELECT user_id, event_id, ms,
        |    CASE WHEN LAG(ms) OVER w IS NULL OR ms - LAG(ms) OVER w > 21600000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |g AS (
        |  SELECT user_id, ms, CAST(SUM(new_s) OVER
        |    (PARTITION BY user_id ORDER BY ms, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f),
        |sess AS (
        |  SELECT user_id, session_id, MIN(ms) AS s_start, MAX(ms) AS s_end
        |  FROM g GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ms, sess.session_id, sess.s_start, sess.s_end
        |FROM e JOIN sess
        |  ON e.user_id = sess.user_id AND e.ms BETWEEN sess.s_start AND sess.s_end
        |ORDER BY e.event_id""".stripMargin,

    "q_asof_join" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type FROM events
        |  WHERE event_type IN ('click','purchase')),
        |f AS (
        |  SELECT user_id, event_id, ms, event_type,
        |    LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ms, event_id, CASE WHEN event_type='purchase' THEN 0 ELSE 1 END
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id
        |  FROM e)
        |SELECT event_id, user_id, click_id FROM f WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    "q_journal_decode" ->
      """SELECT user_id,
        | CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        | COUNT(*) AS n_events,
        | MAX(event_id) AS max_seq
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_unload_idle" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
        |mx AS (SELECT MAX(ms) AS gmax FROM e)
        |SELECT user_id, COUNT(*) AS n_events, MAX(ms) AS last_ms
        |FROM e, mx GROUP BY user_id, gmax
        |HAVING MAX(ms) >= gmax - 172800000 ORDER BY user_id""".stripMargin,

    "q_scd2" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events),
        |c AS (
        |  SELECT user_id, event_id, event_type, ms,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_type
        |  FROM e),
        |f AS (SELECT * FROM c WHERE prev_type IS NULL OR prev_type <> event_type),
        |v AS (
        |  SELECT user_id, event_type, ms AS valid_from_ms,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
        |    LEAD(ms) OVER w AS valid_to_ms
        |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id))
        |SELECT user_id, version, event_type, valid_from_ms, valid_to_ms,
        |  CAST(CASE WHEN valid_to_ms IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,

    "q_window_breadth" ->
      """SELECT event_id, event_type, value,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  nth_value(value, 3) OVER wf AS nth3,
        |  first_value(value) OVER wf AS fv,
        |  last_value(value) OVER wf AS lv,
        |  lag(value, 2, -1.0) OVER w AS lag2
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id),
        |  wf AS (PARTITION BY event_type ORDER BY value, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,

    // identical semantics, decomposed plan — the strongest equivalence
    // check is sharing the window query's oracle verbatim
    "q_window_scaled" ->
      """SELECT event_id, event_type, value,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  nth_value(value, 3) OVER wf AS nth3,
        |  first_value(value) OVER wf AS fv,
        |  last_value(value) OVER wf AS lv,
        |  lag(value, 2, -1.0) OVER w AS lag2
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id),
        |  wf AS (PARTITION BY event_type ORDER BY value, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,

    "q_gap_fill" ->
      """WITH d AS (SELECT event_type, epoch_ms(ts)//86400000 AS day
        |           FROM events WHERE value > 250),
        |daily AS (SELECT event_type, day, COUNT(*) AS cnt FROM d GROUP BY 1, 2),
        |mm AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM d),
        |spine AS (SELECT t.event_type, s.day
        |          FROM (SELECT DISTINCT event_type FROM d) t,
        |               (SELECT unnest(generate_series((SELECT dmin FROM mm),
        |                                              (SELECT dmax FROM mm))) AS day) s),
        |f AS (SELECT spine.event_type, spine.day, COALESCE(cnt, 0) AS n
        |      FROM spine LEFT JOIN daily
        |        ON spine.event_type = daily.event_type AND spine.day = daily.day)
        |SELECT event_type, day, CAST(n AS BIGINT) AS n,
        |  CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running
        |FROM f ORDER BY event_type, day""".stripMargin,

    "q_merge_upsert" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ms
        |           FROM events),
        |b AS (SELECT user_id, event_type, value FROM
        |       (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |          ORDER BY ms DESC, event_id DESC) AS rn
        |        FROM e WHERE ms < 1705363200000) WHERE rn = 1),
        |c AS (SELECT user_id, event_type, value,
        |        CASE WHEN event_type = 'view' THEN 'D' ELSE 'U' END AS action FROM
        |       (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |          ORDER BY ms DESC, event_id DESC) AS rn
        |        FROM e WHERE ms >= 1705363200000) WHERE rn = 1)
        |SELECT COALESCE(b.user_id, c.user_id) AS user_id,
        |  COALESCE(c.event_type, b.event_type) AS event_type,
        |  COALESCE(c.value, b.value) AS value,
        |  CASE WHEN c.user_id IS NULL THEN 'kept'
        |       WHEN b.user_id IS NULL THEN 'inserted'
        |       ELSE 'updated' END AS merge_op
        |FROM b FULL OUTER JOIN c ON b.user_id = c.user_id
        |WHERE c.action IS NULL OR c.action <> 'D'
        |ORDER BY user_id""".stripMargin,

    "q_temporal_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms
        |           FROM events),
        |c AS (SELECT *, LAG(event_type) OVER
        |        (PARTITION BY user_id ORDER BY ms, event_id) AS p FROM e),
        |m AS (SELECT user_id, event_id, event_type, ms,
        |        CASE WHEN p IS NULL OR p <> event_type THEN event_type END AS chg
        |      FROM c),
        |f AS (SELECT user_id, event_type,
        |        COALESCE(LAST_VALUE(chg IGNORE NULLS) OVER (PARTITION BY user_id
        |          ORDER BY ms, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 'none') AS state
        |      FROM m)
        |SELECT state, event_type, COUNT(*) AS n
        |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_outliers" ->
      """WITH s AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
        |    CAST(SUM(CAST(value*value AS DECIMAL(18,4))) AS DOUBLE) AS svv
        |  FROM events GROUP BY 1),
        |t AS (SELECT event_type, sv / n AS mu,
        |        sqrt(svv / n - (sv / n) * (sv / n)) AS sigma FROM s)
        |SELECT e.event_type, COUNT(*) AS n_outliers,
        |  CAST(floor(MIN(value) * 100) AS BIGINT) AS min_out_cents,
        |  CAST(floor(MAX(value) * 100) AS BIGINT) AS max_out_cents
        |FROM events e JOIN t ON e.event_type = t.event_type
        |WHERE value > mu + 3.0 * sigma OR value < mu - 3.0 * sigma
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_multi_touch" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |n AS (SELECT *,
        |  FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN ms END IGNORE NULLS)
        |    OVER w AS np_ms,
        |  FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
        |    OVER w AS np_id,
        |  FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN cents END IGNORE NULLS)
        |    OVER w AS np_cents
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |t AS (SELECT * FROM n WHERE event_type <> 'purchase'
        |        AND np_ms IS NOT NULL AND np_ms - ms <= 86400000),
        |s AS (SELECT *, COUNT(*) OVER (PARTITION BY user_id, np_id) AS n_t,
        |        ROW_NUMBER() OVER (PARTITION BY user_id, np_id
        |          ORDER BY ms, event_id) AS r
        |      FROM t)
        |SELECT event_type, COUNT(*) AS n_touches,
        |  CAST(SUM(np_cents // n_t +
        |    CASE WHEN r = 1 THEN np_cents % n_t ELSE 0 END) AS BIGINT) AS attributed_cents
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rolling_reach" ->
      """WITH ud AS (SELECT DISTINCT user_id, epoch_ms(ts)//86400000 AS day
        |            FROM events),
        |w AS (SELECT user_id, day + o AS wday
        |      FROM ud, (SELECT unnest(generate_series(0, 6)) AS o)),
        |m AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM ud)
        |SELECT wday, COUNT(DISTINCT user_id) AS wau
        |FROM w, m WHERE wday BETWEEN dmin + 6 AND dmax
        |GROUP BY wday ORDER BY wday""".stripMargin,

    "q_peak_concurrency" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |f AS (
        |  SELECT user_id, event_id, ms,
        |    CASE WHEN LAG(ms) OVER w IS NULL OR ms - LAG(ms) OVER w > 21600000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |g AS (
        |  SELECT user_id, ms, CAST(SUM(new_s) OVER
        |    (PARTITION BY user_id ORDER BY ms, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f),
        |s AS (SELECT user_id, session_id, MIN(ms) AS sms, MAX(ms) AS ems
        |      FROM g GROUP BY 1, 2),
        |d AS (SELECT sms AS ms, 1 AS dd FROM s
        |      UNION ALL SELECT ems + 1, -1 FROM s),
        |h AS (SELECT ms, CAST(SUM(dd) AS BIGINT) AS delta FROM d GROUP BY 1),
        |c AS (SELECT ms, CAST(SUM(delta) OVER (ORDER BY ms
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc FROM h)
        |SELECT ms // 86400000 AS day, MAX(conc) AS peak
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_range_frame" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events)
        |SELECT event_id, user_id, ms,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(SUM(cents) OVER w AS BIGINT) AS cents_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ms
        |  RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ms(ts)//86400000 AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day,
        |    CAST(ROW_NUMBER() OVER wo AS BIGINT) AS k,
        |    CAST(SUM(x) OVER (wo ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(COUNT(*) OVER wt AS BIGINT) AS n,
        |    CAST(SUM(x) OVER wt AS BIGINT) AS t
        |  FROM daily
        |  WINDOW wo AS (PARTITION BY event_type ORDER BY day),
        |         wt AS (PARTITION BY event_type)),
        |s AS (
        |  SELECT *, n * cum - k * t AS su,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY abs(n * cum - k * t) DESC, day ASC) AS pick
        |  FROM w)
        |SELECT event_type, day AS cp_day, su AS cusum,
        |  cum * 1000000 // k AS pre_rate_ppm,
        |  CASE WHEN k = n THEN NULL
        |       ELSE (t - cum) * 1000000 // (n - k) END AS post_rate_ppm
        |FROM s WHERE pick = 1 ORDER BY event_type""".stripMargin,

    "q_time_to_convert" ->
      """WITH per AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS v_ms,
        |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS p_ms
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1),
        |d AS (
        |  SELECT user_id, p_ms - v_ms AS delta
        |  FROM per
        |  WHERE v_ms IS NOT NULL AND p_ms IS NOT NULL AND p_ms > v_ms),
        |t AS (
        |  SELECT delta,
        |    CAST(NTILE(10) OVER (ORDER BY delta, user_id) AS BIGINT) AS decile
        |  FROM d)
        |SELECT decile, COUNT(*) AS n_users,
        |  MIN(delta) AS min_ms, MAX(delta) AS max_ms,
        |  CAST(SUM(delta) AS BIGINT) // COUNT(*) AS mean_ms
        |FROM t GROUP BY 1 ORDER BY decile""".stripMargin,

    "q_twap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |l AS (
        |  SELECT user_id, ms, cents,
        |    LEAD(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS nms
        |  FROM e),
        |g AS (
        |  SELECT user_id, COUNT(*) AS n_events,
        |    MAX(ms) - MIN(ms) AS dur_ms,
        |    CAST(SUM(CASE WHEN nms IS NULL THEN 0 ELSE cents * (nms - ms) END) AS BIGINT) AS area
        |  FROM l GROUP BY 1)
        |SELECT user_id, n_events, dur_ms,
        |  CASE WHEN dur_ms = 0 THEN NULL ELSE area // dur_ms END AS twa_cents
        |FROM g ORDER BY user_id""".stripMargin,

    "q_ivm" ->
      """WITH g AS (
        |  SELECT event_type, epoch_ms(ts)//86400000 AS day,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n, cents, cents // n AS mean_cents
        |FROM g ORDER BY event_type, day""".stripMargin,

    "q_ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CASE WHEN CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) >= 16
        |         THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY 1),
        |v AS (
        |  SELECT user_id % 2 AS variant, COUNT(*) AS n,
        |    CAST(SUM(conv) AS BIGINT) AS c
        |  FROM u GROUP BY 1),
        |e AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN variant = 0 THEN n ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN variant = 0 THEN c ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(SUM(CASE WHEN variant = 1 THEN n ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN variant = 1 THEN c ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM v)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  conv_a * 1000000 // n_a AS rate_a_ppm,
        |  conv_b * 1000000 // n_b AS rate_b_ppm,
        |  CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN NULL ELSE (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * (1.0 / n_a + 1.0 / n_b)) END AS z
        |FROM e""".stripMargin,

    "q_shortest_path" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events),
        |t AS (
        |  SELECT event_type AS src,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS dst
        |  FROM ev),
        |e AS (
        |  SELECT src, dst, 1000000 // COUNT(*) AS w
        |  FROM t WHERE dst IS NOT NULL AND dst <> src
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT 'view' AS node, CAST(0 AS BIGINT) AS cost, 0 AS hops
        |  UNION ALL
        |  SELECT e.dst, p.cost + e.w, p.hops + 1
        |  FROM p JOIN e ON e.src = p.node WHERE p.hops < 4)
        |SELECT node AS event_type, CAST(MIN(cost) AS BIGINT) AS min_cost
        |FROM p GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q_event_pattern" ->
      """WITH s AS (
        |  SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), ''
        |      ORDER BY epoch_ms(ts), event_id) AS seq
        |  FROM events GROUP BY 1)
        |SELECT user_id, CAST(len(seq) AS BIGINT) AS n_events,
        |  CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT) AS n_funnels
        |FROM s ORDER BY user_id""".stripMargin,

    "q_mannwhitney" ->
      """WITH per AS (
        |  SELECT user_id % 2 AS variant,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY user_id),
        |r AS (
        |  SELECT variant,
        |    CAST(RANK() OVER (ORDER BY cents) AS BIGINT) AS r,
        |    CAST(COUNT(*) OVER (PARTITION BY cents) AS BIGINT) AS t
        |  FROM per),
        |v AS (
        |  SELECT variant, COUNT(*) AS n,
        |    CAST(SUM(2 * r + t - 1) AS BIGINT) AS s2
        |  FROM r GROUP BY 1),
        |e AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN variant = 0 THEN n ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN variant = 1 THEN n ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN variant = 0 THEN s2 ELSE 0 END) AS BIGINT) AS s2_a,
        |    CAST(SUM(CASE WHEN variant = 1 THEN s2 ELSE 0 END) AS BIGINT) AS s2_b
        |  FROM v)
        |SELECT n_a, n_b,
        |  s2_a - n_a * (n_a + 1) AS u2_a,
        |  s2_b - n_b * (n_b + 1) AS u2_b,
        |  (s2_a - n_a * (n_a + 1)) * 1000000 // (2 * n_a * n_b) AS auc_ppm
        |FROM e""".stripMargin,

    "q_ks_test" ->
      """WITH per AS (
        |  SELECT user_id % 2 AS variant,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY user_id),
        |g AS (
        |  SELECT cents,
        |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM per GROUP BY 1),
        |c AS (
        |  SELECT cents,
        |    CAST(SUM(ca) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
        |    CAST(SUM(cb) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b,
        |    CAST(SUM(ca) OVER () AS BIGINT) AS n_a,
        |    CAST(SUM(cb) OVER () AS BIGINT) AS n_b
        |  FROM g),
        |p AS (
        |  SELECT *, abs(cum_a * n_b - cum_b * n_a) AS gap,
        |    ROW_NUMBER() OVER (ORDER BY abs(cum_a * n_b - cum_b * n_a) DESC, cents ASC) AS pick
        |  FROM c)
        |SELECT n_a, n_b, cents AS at_cents, gap AS d_num,
        |  gap * 1000000 // (n_a * n_b) AS d_ppm
        |FROM p WHERE pick = 1""".stripMargin,

    "q_decay_score" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts)//86400000 AS day,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |m AS (SELECT MAX(day) AS dmax FROM e),
        |d AS (
        |  SELECT user_id, cents,
        |    cents // (CASE (dmax - day) // 7 WHEN 0 THEN 1 WHEN 1 THEN 2
        |      WHEN 2 THEN 4 WHEN 3 THEN 8 WHEN 4 THEN 16 ELSE 32 END) AS decayed
        |  FROM e, m)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(cents) AS BIGINT) AS raw_cents,
        |  CAST(SUM(decayed) AS BIGINT) AS decay_cents
        |FROM d GROUP BY 1 ORDER BY user_id""".stripMargin,

    "q_dow_profile" ->
      """WITH g AS (
        |  SELECT event_type, (epoch_ms(ts)//86400000 + 4) % 7 AS dow,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, dow, n,
        |  n * 1000000 // CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS share_ppm
        |FROM g ORDER BY event_type, dow""".stripMargin,
  )
}
