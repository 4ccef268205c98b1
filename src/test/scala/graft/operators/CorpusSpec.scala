package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkTestBase {

  test("withSplit: deterministic, append-stable, fractions near 90/5/5") {
    import spark.implicits._
    val full = (0L until 2000L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val split = Corpus.withSplit(full, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // append-stability: the same ids through a SMALLER corpus get the same
    // split (assignment depends on the id alone)
    val partial = Corpus.withSplit(full.filter(col("doc_id") < 100), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    partial.foreach { case (id, s) => assert(split(id) == s) }
    // multiplicative hashing decorrelates from id order: fractions land
    // near the declared 900/50/50 permille
    val n = split.size.toDouble
    val train = split.values.count(_ == "train") / n
    val v = split.values.count(_ == "val") / n
    assert(math.abs(train - 0.9) < 0.03, s"train fraction $train")
    assert(math.abs(v - 0.05) < 0.02, s"val fraction $v")
  }

  test("packSequences: greedy window fill, per-partition, budget boundaries exact") {
    import spark.implicits._
    // cum-before: 0,4,9,12,21 -> packs 0,0,0,1,2 at budget 10
    val docs = Seq((1L, "a", 4L), (2L, "a", 5L), (3L, "a", 3L), (4L, "a", 9L), (5L, "a", 2L),
      (6L, "b", 11L), (7L, "b", 1L)) // partition b: cum-before 0,11 -> packs 0,1
      .toDF("doc_id", "src", "n_tokens")
    val out = Corpus.packSequences(docs, "src", "doc_id", "n_tokens", 10L)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 2L, 6L -> 0L, 7L -> 1L))
    // a non-positive budget fails at the call, not as an ANSI division
    // error deep inside the job
    val e = intercept[IllegalArgumentException] {
      Corpus.packSequences(docs, "src", "doc_id", "n_tokens", 0L)
    }
    assert(e.getMessage.contains("budgetTokens"))
  }

  test("packSequences matches a naive driver-side cumsum on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 4) {
      val budget = 1 + rnd.nextInt(50)
      val rows = (0 until 200).map { i =>
        (i.toLong, s"s${rnd.nextInt(3)}", 1L + rnd.nextInt(40)) // (id, src, tokens)
      }
      val truth = rows.groupBy(_._2).flatMap { case (_, docs) =>
        var cum = 0L
        docs.sortBy(_._1).map { case (id, _, tok) =>
          val pack = cum / budget; cum += tok; id -> pack
        }
      }
      val got = Corpus.packSequences(rows.toDF("doc_id", "src", "n_tokens"),
        "src", "doc_id", "n_tokens", budget.toLong)
        .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
      assert(got == truth, s"budget=$budget")
    }
  }

  test("interleaveOrder: stride keys exact, merged order mixes sources by weight") {
    import spark.implicits._
    val docs = ((0 until 30).map(i => (i.toLong, "A")) ++
      (100 until 115).map(i => (i.toLong, "B"))).toDF("doc_id", "source")
    val weights = Seq(("A", 2000000L), ("B", 1000000L)).toDF("source", "weight_ppm")
    val out = Corpus.interleaveOrder(docs, "doc_id", "source", weights, epoch = 0)
      .select("doc_id", "source", "src_rank", "interleave_key")
      .as[(Long, String, Long, Long)].collect()
    // key formula exact per row
    out.foreach { case (_, src, r, key) =>
      val w = if (src == "A") 2000000L else 1000000L
      assert(key == (r * 1000000L) / w)
    }
    // ranks are a dense per-source permutation
    assert(out.filter(_._2 == "A").map(_._3).sorted.sameElements(1L to 30L))
    assert(out.filter(_._2 == "B").map(_._3).sorted.sameElements(1L to 15L))
    // reading in (key, source, rank) order interleaves ~2 A per B while
    // both sources last (floor offsets allow a small constant drift)
    val merged = out.sortBy { case (_, s, r, k) => (k, s, r) }.take(30)
    val a = merged.count(_._2 == "A")
    assert(a >= 18 && a <= 22, s"A share in merged prefix: $a/30")
  }

  test("selectByBudget: two-level cumsum equals the naive global window, any bucket count") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // heavy score ties (0..9) force cross-bucket tie runs; ids break them
    val rows = (0 until 500).map { i =>
      (i.toLong, rnd.nextInt(10).toLong, 1L + rnd.nextInt(30)) // (id, score, tokens)
    }
    val budget = 2000L
    val truth = {
      var cum = 0L
      rows.sortBy { case (id, s, _) => (-s, id) }.flatMap { case (id, s, tok) =>
        val before = cum; cum += tok
        if (before < budget) Some(id -> (s, tok, cum)) else None
      }.toMap
    }
    // buckets > rows, buckets = 1 (degenerate single partition), and a
    // normal fan-out must all be bit-identical to the naive cumsum
    for (buckets <- Seq(1, 7, 64, 1000)) {
      val got = Corpus.selectByBudget(
        rows.toDF("doc_id", "score", "n_tokens"),
        "doc_id", "score", "n_tokens", budget, buckets)
        .select("doc_id", "score", "n_tokens", "cum_tokens")
        .as[(Long, Long, Long, Long)].collect()
        .map { case (id, s, tok, cum) => id -> (s, tok, cum) }.toMap
      assert(got == truth, s"buckets=$buckets")
    }
  }

  test("selectByBudget: boundary doc overruns, zero budget empty, huge budget keeps all") {
    import spark.implicits._
    val docs = Seq((1L, 10L, 6L), (2L, 9L, 6L), (3L, 8L, 6L))
      .toDF("doc_id", "score", "n_tokens")
    // budget 7: doc 1 fills 6, doc 2 STARTS at 6 < 7 so it overruns to 12
    val sel = Corpus.selectByBudget(docs, "doc_id", "score", "n_tokens", 7L, 2)
      .select("doc_id").as[Long].collect().sorted
    assert(sel.sameElements(Array(1L, 2L)))
    assert(Corpus.selectByBudget(docs, "doc_id", "score", "n_tokens", 0L, 2).count() == 0L)
    assert(Corpus.selectByBudget(docs, "doc_id", "score", "n_tokens", 1000L, 2).count() == 3L)
  }

  test("epochOrder: dense permutation equal to the naive global rank, epochs differ") {
    import spark.implicits._
    val ids = (0 until 300).map(i => Tuple1(i.toLong * 7L)) // sparse ids
    val df = ids.toDF("doc_id")
    def hash(id: Long, epoch: Int): Long =
      ((id + epoch.toLong * 1000003L) % 2147483648L * 2654435761L) % 2147483647L
    for (epoch <- Seq(0, 1); buckets <- Seq(1, 5, 64)) {
      val truth = ids.map(_._1).sortBy(id => (hash(id, epoch), id))
        .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
      val got = Corpus.epochOrder(df, "doc_id", epoch, buckets)
        .select("doc_id", "epoch_rank").as[(Long, Long)].collect().toMap
      assert(got == truth, s"epoch=$epoch buckets=$buckets")
    }
    // epochs are DIFFERENT permutations of the same corpus
    val e0 = Corpus.epochOrder(df, "doc_id", 0, 8)
      .select("doc_id", "epoch_rank").as[(Long, Long)].collect().toMap
    val e1 = Corpus.epochOrder(df, "doc_id", 1, 8)
      .select("doc_id", "epoch_rank").as[(Long, Long)].collect().toMap
    assert(e0.values.toSeq.sorted == (1L to 300L) && e1.values.toSeq.sorted == (1L to 300L))
    assert(e0 != e1)
  }

  test("uniformMixWeights: integer-exact up/downsample weights toward uniform budget") {
    import spark.implicits._
    // total 600 over 3 groups -> target 200/group
    val perGroup = Seq(("a", 100L), ("b", 200L), ("c", 300L)).toDF("src", "n_tokens")
    val out = Corpus.uniformMixWeights(perGroup, "src", "n_tokens")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map(
      "a" -> 2000000L, // 200/100: upsample 2x
      "b" -> 1000000L, // on target
      "c" -> 666666L)) // 200/300 floor-scaled
  }

  test("uniformMixWeights: ANSI-safe at BIGINT extremes, clamped at maxUpsamplePpm") {
    import spark.implicits._
    // one 1-token group + one ~9.2e18-token group: the naive T*1e6 AND the
    // naive (T mod g)*1e6 both overflow Long here (ANSI throw before the
    // guarded clamp + shift-scaled fractional term)
    val perGroup = Seq(("tiny", 1L), ("huge", 9000000000000000000L))
      .toDF("src", "n_tokens")
    val out = Corpus.uniformMixWeights(perGroup, "src", "n_tokens")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("tiny") == 1000000000L) // clamped at the default 1000x cap
    // shifted fractional path: within 2 ppm units of true floor(T*1e6/g)
    val target = (BigInt(9000000000000000000L) + 1) / 2
    val truth = (target * 1000000 / BigInt(9000000000000000000L)).toLong
    assert((out("huge") - truth).abs <= 2L, s"got ${out("huge")} want ~$truth")

    // cap boundary from below is exact: target/g = 1000 -> exactly the cap
    val boundary = Seq(("x", 1L), ("y", 1999L)).toDF("src", "n_tokens")
    val b = Corpus.uniformMixWeights(boundary, "src", "n_tokens")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(b("x") == 1000000000L) // target 1000, g 1: 1000*1e6 == cap
    assert(b("y") == 500250L)     // floor(1000*1e6/1999), un-shifted path
  }

  test("applyMixWeights: floor epochs + hash-fraction copy, deterministic, append-stable") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, if (i < 500) "down" else "up"))
      .toDF("doc_id", "src")
    val weights = Seq(("down", 400000L), ("up", 2500000L)).toDF("src", "weight_ppm")
    val out = Corpus.applyMixWeights(docs, "doc_id", "src", weights)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies")).toMap
    // downsampled group: copies in {0, 1}, roughly 40% kept (hash-exact)
    val downCopies = (0L until 500L).map(out)
    assert(downCopies.forall(c => c == 0L || c == 1L))
    val kept = downCopies.count(_ == 1L)
    assert(kept > 120 && kept < 280, s"kept=$kept of 500 at weight 0.4")
    // upsampled group: 2 or 3 copies (2.5x), never dropped
    val upCopies = (500L until 1000L).map(out)
    assert(upCopies.forall(c => c == 2L || c == 3L))
    // exact hash semantics: copy iff bucket < remainder (spot-check against
    // the published formula — ppm bucket, NOT OrderHashWidth: here the
    // 1e6 bucket IS the fraction semantics)
    def bucket(id: Long): Long = (id % 2147483648L * 2654435761L) % 1000000L
    (0L until 500L).foreach { id =>
      assert(out(id) == (if (bucket(id) < 400000L) 1L else 0L), s"id=$id")
    }
    // append-stable: the same doc keeps its multiplicity in a bigger corpus
    val more = (0L until 2000L).map(i => (i, if (i < 500) "down" else "up"))
      .toDF("doc_id", "src")
    val out2 = Corpus.applyMixWeights(more, "doc_id", "src", weights)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies")).toMap
    (0L until 1000L).foreach(id => assert(out2(id) == out(id)))
  }

  test("chunkDocs: stride boundaries exact, overlap reconstructs, degenerate docs survive") {
    import spark.implicits._
    // chunk=5, overlap=2 -> stride=3; len 5 -> 1 chunk, len 6 -> 2, len 8 -> 2,
    // len 9 -> 3 (starts 0,3,6); empty string -> one empty chunk; null -> no rows
    val docs = Seq((1L, "abcde"), (2L, "abcdef"), (3L, "abcdefgh"), (4L, "abcdefghi"),
      (5L, ""), (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Corpus.chunkDocs(docs, "doc_id", "text", 5, 2)
      .select("doc_id", "chunk_id", "n_chunks", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toList).toMap
    assert(out(1L).map(_._4) == List("abcde"))
    assert(out(2L).map(_._4) == List("abcde", "def"))
    assert(out(3L).map(_._4) == List("abcde", "defgh"))
    assert(out(4L).map(_._4) == List("abcde", "defgh", "ghi"))
    assert(out(4L).forall(_._3 == 3L))
    assert(out(5L).map(_._4) == List(""))
    assert(!out.contains(6L))
    // every character of the source is covered, in order, by stride slices
    out(4L).zipWithIndex.foreach { case ((_, cid, _, txt), i) =>
      assert(cid == i && "abcdefghi".drop(i * 3).take(5) == txt)
    }
  }

  test("stratifiedSample: exact hash order, cap honored, small groups kept whole") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, if (i < 280) "big" else "small"))
      .toDF("doc_id", "grp")
    val out = Corpus.stratifiedSample(docs, "doc_id", "grp", 20)
      .select("doc_id", "grp", "sample_rank")
      .as[(Long, String, Long)].collect()
    val big = out.filter(_._2 == "big").sortBy(_._3)
    val small = out.filter(_._2 == "small")
    assert(big.length == 20 && small.length == 20) // small group kept whole
    // ranks are 1..n in (hash, id) order — verify against the published formula
    def bucket(id: Long): Long = (id % 2147483648L * 2654435761L) % 2147483647L
    val expect = (0L until 280L).sortBy(id => (bucket(id), id)).take(20)
    assert(big.map(_._1).toList == expect.toList)
  }

  test("quantileFilter: per-group floor cut, ties broken by id, keepPpm edges") {
    import spark.implicits._
    // group a: 5 rows, keep 50% -> floor(2.5)=2; scores tie at 9 -> lower id wins
    // group b: 1 row, keep 50% -> floor(0.5)=0 rows
    val df = Seq((1L, "a", 9L), (2L, "a", 9L), (3L, "a", 7L), (4L, "a", 5L),
      (5L, "a", 3L), (6L, "b", 100L)).toDF("id", "grp", "score")
    val out = Corpus.quantileFilter(df, "grp", "score", "id", 500000L)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
    // keepPpm = 1e6 keeps everything; 0 keeps nothing
    assert(Corpus.quantileFilter(df, "grp", "score", "id", 1000000L).count() == 6L)
    assert(Corpus.quantileFilter(df, "grp", "score", "id", 0L).count() == 0L)
  }

  test("writeClustered: files own disjoint sorted key ranges, rows preserved, pruning skips files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("clustered").toString
    try {
      // deliberately shuffled insert order: clustering must impose the layout
      val df = scala.util.Random.shuffle((0L until 1000L).toList)
        .map(i => (i, s"doc$i")).toDF("doc_id", "text")
      Corpus.writeClustered(df, dir, 4, "doc_id")
      val back = spark.read.parquet(dir)
      assert(back.count() == 1000L)
      // per-file [min, max] doc_id ranges must be pairwise disjoint
      val ranges = back.groupBy(input_file_name().as("f"))
        .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
        .as[(String, Long, Long)].collect().map(r => (r._2, r._3)).sortBy(_._1)
      assert(ranges.length == 4, s"expected 4 files, got ${ranges.length}")
      ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
        assert(hi < lo, s"overlapping file ranges: $hi >= $lo")
      case _ => }
      // a point read prunes to one file's row groups: parquet min/max keeps
      // the scan's output correct and the filter pushes to the scan
      val one = back.filter(col("doc_id") === 7L)
      val scan = one.queryExecution.executedPlan.toString
      assert(scan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]"),
        s"filter must push to parquet, got:\n$scan")
      assert(one.count() == 1L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("keepBest: max score wins, ties to min id, n_group counts the whole group") {
    import spark.implicits._
    // group a: 3 crawls, best score 9 held by ids 2 and 3 -> id 2 wins, n=3
    // group b: singleton survives with n=1
    val df = Seq((1L, "a", 5L), (3L, "a", 9L), (2L, "a", 9L), (4L, "b", 1L))
      .toDF("id", "grp", "score")
    val out = Corpus.keepBest(df, "grp", "score", "id")
      .select("id", "grp", "score", "n_group")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(out == Set((2L, "a", 9L, 3L), (4L, "b", 1L, 1L)))
    // exactly one survivor per group, total preserved in n_group
    val again = Corpus.keepBest(df, "grp", "score", "id")
    assert(again.count() == 2L)
    assert(again.agg(sum("n_group")).as[Long].head() == 4L)
  }

  test("snapshotDiff: added/removed/changed/unchanged by digest, null text = changed") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, "s1", "alpha"), (2L, "s1", "beta"), (3L, "s2", "gamma"),
      (5L, "s2", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val newSnap = Seq(
      (2L, "s1", "beta"),            // unchanged
      (3L, "s2", "gamma EDITED"),    // changed
      (4L, "s2", "delta"),           // added
      (5L, "s2", null.asInstanceOf[String])) // null on both sides -> changed
      .toDF("doc_id", "source", "text")
    val out = Corpus.snapshotDiff(oldSnap, newSnap, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("s1", "removed") -> 1L,   // doc 1
      ("s1", "unchanged") -> 1L, // doc 2
      ("s2", "changed") -> 2L,   // doc 3 + null-digest doc 5
      ("s2", "added") -> 1L))    // doc 4
  }

  test("snapshotDiff: NULL-id rows never silently merge — old side reads " +
    "removed, new side reads added (presence markers, not id-nullness)") {
    import spark.implicits._
    val oldSnap = Seq((Some(1L), "s", "kept"), (None, "s", "ghost-old"))
      .toDF("doc_id", "source", "text")
    val newSnap = Seq((Some(1L), "s", "kept"), (None, "s", "ghost-new"))
      .toDF("doc_id", "source", "text")
    val out = Corpus.snapshotDiff(oldSnap, newSnap, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // inferring presence from id-nullness classified ghost-old as "added"
    assert(out == Map(
      ("s", "unchanged") -> 1L,
      ("s", "removed") -> 1L,
      ("s", "added") -> 1L))
  }

  test("contamination: shared shingles counted, clean docs absent, eval broadcast") {
    import spark.implicits._
    val eval = Seq((100L, "abcdefghij")).toDF("doc_id", "text") // 8-grams: abcdefgh, bcdefghi, cdefghij
    val train = Seq(
      (1L, "xxabcdefghxx"),  // shares exactly abcdefgh (1 gram)
      (2L, "zzzzzzzzzzzz"))  // clean
      .toDF("doc_id", "text")
    val out = Corpus.contamination(train, eval, "doc_id", "text", 8)
    assert(out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(1L -> 1L))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval gram set must broadcast, got:\n$plan")
  }
}
