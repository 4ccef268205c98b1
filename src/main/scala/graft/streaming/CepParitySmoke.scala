package graft.streaming

import graft.Tables
import graft.fold.FoldOption
import graft.model.Record
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Stream↔batch parity for CEP PATTERN DETECTION: the declared
  * `q_event_pattern` counts 'vc*p' (view, clicks, purchase) matches over
  * each user's whole history with a regex; online, the same pattern is a
  * 2-state DFA carried as per-key fold state — match counts must agree
  * user for user.
  *
  * DFA equivalence to the left-to-right non-overlapping regex scan, for
  * this alternation-free pattern: S0 --v--> S1; S1 --c--> S1;
  * S1 --p--> S0 (count a match); S1 --v--> S1 (the dead candidate is
  * replaced by one starting at this 'v'); anything else --> S0. A
  * character that kills the open candidate can never resurrect an
  * earlier one, so the greedy restart is exact.
  *
  * Order-sensitive AND not replay-idempotent — the replay overlap passes
  * only through the engine's P9 offset guard, like the TWAP twin.
  * Exits 0 iff every user's (n_events, n_funnels) matches. Forked by
  * StreamBatchParitySpec.
  */
object CepParitySmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val batch: Map[String, (Long, Long)] =
      graft.SparkEntry.queries("q_event_pattern")(spark, dir)
        .collect()
        .map(r => r.getLong(0).toString -> ((r.getLong(1), r.getLong(2))))
        .toMap

    val feed = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("substring(event_type, 1, 1)").as("i"),
        expr("ts div 1000000").as("ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy { case (_, id, _, ms) => (ms, id) }
      .zipWithIndex
      .map { case ((user, _, i, _), seq) =>
        Record("events", 0, seq.toLong, new Timestamp(0L), 0, user.toString,
          i.getBytes("UTF-8"), Map.empty)
      }

    // state: (inCandidate 0/1, matches, nEvents)
    val step: ((Long, Long, Long), Record) => (Long, Long, Long) = { (st, r) =>
      val c = new String(r.value, "UTF-8").charAt(0)
      val (s, m, n) = st
      val next = c match {
        case 'v' => (1L, m)
        case 'c' => (s, m)
        case 'p' => if (s == 1L) (0L, m + 1) else (0L, m)
        case _ => (0L, m)
      }
      (next._1, next._2, n + 1)
    }
    val fold = FoldOption.of[(Long, Long, Long), Record](
      r => step((0L, 0L, 0L), r))(step)

    val input = MemoryStream[Record]
    val out = KeyFlowTws.flow(input.toDS(), fold)
    val q = out.writeStream.format("memory").queryName("cepparity")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cepparity").toString)
      .start()
    val quarters = (1 to 3).map(i => feed.length * i / 4)
    val b1 = feed.slice(0, quarters(0))
    val b2 = b1.takeRight(35) ++ feed.slice(quarters(0), quarters(1))
    val b3 = feed.slice(quarters(1), quarters(2))
    val b4 = feed.slice(quarters(2), feed.length)
    Seq(b1, b2, b3, b4).foreach { b =>
      input.addData(b.toSeq); q.processAllAvailable()
    }

    val streamed: Map[String, (Long, Long)] =
      spark.table("cepparity").as[KeyOutput[(Long, Long, Long)]]
        .collect().groupBy(_.key).toSeq
        .map { case (u, rows) =>
          val (_, m, n) = rows.maxBy(_.offset).state.get
          u -> ((n, m))
        }.toMap
    q.stop()

    val ok = streamed == batch
    if (!ok) {
      (streamed.keySet ++ batch.keySet).toSeq.sorted
        .filter(k => streamed.get(k) != batch.get(k)).take(5).foreach { k =>
          println(s"MISMATCH user=$k stream=${streamed.get(k)} batch=${batch.get(k)}")
        }
    }
    spark.stop()
    println(s"CEP_PARITY_OK=$ok (${batch.size} users, " +
      s"${batch.valuesIterator.map(_._2).sum} matches)")
    sys.exit(if (ok) 0 else 1)
  }
}
