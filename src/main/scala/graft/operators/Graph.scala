package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Lineage.LineageOps

/** Distributed graph analytics beyond connected components (Dedup): the
  * iterative-DataFrame discipline (per-round lineage rebase, bounded
  * cache, eager-checkpoint handoff) established by
  * [[Dedup.connectedComponents]] applied to power-iteration PageRank.
  *
  * Design notes for 100 TB graphs (same as Pregel/GraphX in pure
  * DataFrames): each round is ONE equi-join of the edge table against the
  * slim (node, rank) table plus one partial-agg groupBy — shuffle-bounded
  * by |E|, nothing row-wise ever reaches the driver. The edge table is
  * normalized (per-source contribution fractions) ONCE and reused behind
  * a single persisted exchange; per-round driver traffic is two scalar
  * aggregates (dangling mass + L1 delta). Rebase on the materialized RDD
  * keeps each round's Catalyst plan constant-size — an un-truncated loop
  * OOMs in analysis around round 8-10 (PLANS.md plan-shape rules). At
  * cluster scale swap `localCheckpoint` for `checkpoint()` against a
  * reliable dir.
  */
object Graph {

  /** Weighted PageRank by power iteration.
    *
    * `edges` is a directed weighted edge list; pass `weightCol = None`
    * for an unweighted graph. Per iteration:
    * `rank(v) = (1-alpha)/N + alpha * (sum_{u->v} rank(u) * w(u,v)/W(u) + D/N)`
    * where `W(u)` is u's total out-weight and `D` the rank mass sitting on
    * dangling nodes (no out-edges) — redistributed uniformly so ranks sum
    * to 1 every round. Runs `iters` fixed rounds (deterministic result for
    * a deterministic input) but exits early when the L1 delta drops under
    * `tol`.
    *
    * Returns an eagerly checkpointed (node, rank) table — lineage-free,
    * no cache-manager entry, blocks reclaimed when the caller drops it.
    */
  /** Triangle enumeration with DEGREE orientation (Chiba–Nishizeki /
    * compact-forward; Latapy 2008): every undirected edge is directed from
    * its lower-(degree, id) endpoint to the higher one, an acyclic total
    * order under which each triangle {x,y,z} materializes exactly once —
    * as the wedge at its lowest-order corner plus one closing-edge probe.
    *
    * Why degree and not id: wedge volume is Σ outdeg(v)², and ordering by
    * degree caps every out-degree at O(√|E|) (a node keeps only edges to
    * HIGHER-degree neighbors, and there can be at most 2√|E| nodes of
    * degree ≥ √|E|), so the join is O(|E|^1.5) on ANY graph — a hub with
    * degree d contributes d wedges under id orientation quadratically
    * (d²/2) but only O(|E|) here because the hub's edges point INTO it.
    * Id orientation keeps the same worst case only on degree-uniform
    * graphs; the skewed graphs a 100 TB corpus produces are exactly where
    * it explodes.
    *
    * Input: an edge list read as UNDIRECTED (direction and duplicates are
    * canonicalized away; self-loops dropped). Output: one row per triangle
    * as the id-sorted triple (a, b, c), a < b < c — orientation-independent,
    * so an id-oriented oracle pins it exactly.
    *
    * Shape at 100 TB: canonicalize (one distinct shuffle on the edge key),
    * one partial-agg degree count, two broadcast-or-shuffle joins to attach
    * endpoint degrees, then the wedge join + closing-edge equi-join — every
    * stage |E|- or wedge-bounded, nothing driver-side. The oriented table
    * materializes once (eager localCheckpoint — the pageRank discipline)
    * because the enumeration reads it three times.
    */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // materialize the canonical edge table FIRST (the pageRank edge-plan
    // discipline): the degree count and BOTH orientation-join legs read
    // it, and the caller's edge plan is typically an expensive
    // pair-generation join — without this pin it executes three times
    // inside the oriented plan (q_triangles measured 30 s vs 3 s at sf0.1)
    val e0 = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()
      .lineageCut()
    val deg = e0.select(col("u").as("node")).union(e0.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // direct from lower (deg, id) to higher; carry the head's (deg, id) so
    // the wedge join can order out-neighbors without re-joining degrees
    val fwd = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = e0
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(fwd, col("u")).otherwise(col("v")).as("src"),
        when(fwd, col("v")).otherwise(col("u")).as("dst"),
        when(fwd, col("dv")).otherwise(col("du")).as("ddeg"))
      .lineageCut()
    val wedge = oriented.as("e1").join(oriented.as("e2"), "src")
      .filter(col("e1.ddeg") < col("e2.ddeg") ||
        (col("e1.ddeg") === col("e2.ddeg") && col("e1.dst") < col("e2.dst")))
      .select(col("src").as("x"), col("e1.dst").as("y"), col("e2.dst").as("z"))
    // no explicit unpersist: `tri` is lazy and its truncated lineage READS
    // the checkpointed blocks — they are reclaimed when the caller drops
    // the returned plan (the Ingest.withRejects discipline)
    // Middle vertex = the one that is neither least nor greatest. A
    // when/otherwise chain, NOT x+y+z-least-greatest: the sum trick
    // overflows Long for ids near 2^62, and ids are caller-arbitrary
    // (often hashes). Triangle vertices are pairwise distinct by
    // construction (oriented simple graph), so the chain is total.
    val lo = least(col("x"), col("y"), col("z"))
    val hi = greatest(col("x"), col("y"), col("z"))
    wedge.join(oriented.as("e3"),
        col("e3.src") === col("y") && col("e3.dst") === col("z"), "left_semi")
      .select(
        lo.as("a"),
        when(col("x") =!= lo && col("x") =!= hi, col("x"))
          .when(col("y") =!= lo && col("y") =!= hi, col("y"))
          .otherwise(col("z")).as("b"),
        hi.as("c"))
  }

  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: Option[String] = None,
      alpha: Double = 0.85, iters: Int = 20, tol: Double = 1e-12): DataFrame = {
    val spark = edges.sparkSession
    def materialize(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema).persist()

    val w = weightCol.map(col(_).cast("double")).getOrElse(lit(1.0))
    // Materialize the normalized edge list FIRST: everything downstream
    // (out-weights, fractions, node set) derives from it, so the caller's
    // edge plan — often an expensive pair-generation join — executes
    // exactly once. (Before this, frac and nodes each re-ran the upstream
    // plan: q_pagerank's lineitem self-join executed twice.)
    // Weight hygiene at the same point: a NULL weight would make its
    // edge's frac NULL (contribution silently dropped — rank mass no
    // longer sums to 1), and a source whose weights sum to 0 would make
    // frac = w/0 = NaN/Infinity and corrupt every downstream rank. Edges
    // with NULL or non-positive weight carry no rank mass BY DEFINITION,
    // so they are dropped here — a node left with no out-edges becomes
    // dangling and the existing redistribution keeps the mass invariant.
    val e = materialize(edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"), w.as("w"))
      .filter(col("w") > 0.0))
    // contribution fractions, normalized once: frac = w(u,v) / W(u).
    // Pre-partitioned by src so the per-round rank join never re-shuffles
    // the edge side (the big table moves ONCE, at build). An r15 A/B of
    // keeping the partitioning METADATA visible (persisting a
    // Repartition-over-LogicalRDD plan instead of rebasing) measured
    // SLOWER locally (+1-2 s on q_pagerank) with no per-round exchange
    // to remove — maybeB broadcasts the rank side on small graphs, and on
    // big graphs the physical layout is already src-clustered — so the
    // bare-RDD rebase stays.
    val outW = e.groupBy("src").agg(sum("w").as("tw"))
    val frac = materialize(
      e.join(outW, "src").select(col("src"), col("dst"), (col("w") / col("tw")).as("frac"))
        .repartition(col("src")))
    val nodes = materialize(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct())
    val n = nodes.count()
    require(n > 0, "empty graph")
    // materialize() rebases on a bare RDD, so the rank table has no stats
    // and Catalyst would pick sort-merge — re-sorting |E| rows EVERY round
    // (measured 0.59 s/round vs 0.07 at sf0.1). |V| is known exactly: when
    // the rank table is small, force the broadcast on every per-round
    // small side; past the threshold the joins degrade gracefully to
    // shuffled joins on the pre-partitioned frac, the correct 100 TB shape.
    val small = n <= 5000000L
    def maybeB(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // The dangling flag rides a STATIC node table and the dangling mass is
    // a driver scalar carried round to round: the round's ONE action
    // computes the L1 delta AND the next round's dangling mass in the same
    // aggregate over the freshly materialized table (which doubles as its
    // materializing action — the connectedComponents labelSum shape). The
    // former loop paid a separate dangling⋈ranks broadcast job plus a
    // next⋈ranks delta join EVERY round. `next` must keep STREAMING from
    // the static table with ranks entering only through maybeB: a version
    // that streamed from the previous round's table built an unbroken
    // narrow-dependency RDD chain across rounds and task serialization
    // StackOverflowed after ~30 rounds (caught by PageRankSpec's
    // early-convergence chain test).
    val nodesD = materialize(nodes
      .join(frac.select(col("src").as("node")).distinct()
        .withColumn("__o", lit(1)), Seq("node"), "left")
      .select(col("node"), col("__o").isNull.as("dang")))
    var ranks = materialize(nodesD.select(col("node"), lit(1.0 / n).as("rank")))
    var dmass = Option(nodesD
      .agg(sum(when(col("dang"), lit(1.0 / n))).as("dm"))
      .head().getAs[java.lang.Double]("dm")).map(_.doubleValue).getOrElse(0.0)
    var it = 0
    var done = false
    while (it < iters && !done) {
      // ranks is slimmed to (node, rank) on every use: after round 1 the
      // persisted table also carries (dang, prev), which must not ride
      // the broadcasts or collide with the prev rename
      val contrib = frac
        .join(maybeB(ranks.select(col("node").as("src"), col("rank"))), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") * col("frac")).as("c"))
      val next = materialize(
        nodesD.join(maybeB(contrib), Seq("node"), "left")
          .join(maybeB(ranks.select(col("node"), col("rank").as("prev"))), Seq("node"))
          .select(col("node"),
            (lit((1.0 - alpha) / n) + lit(alpha) * lit(dmass) / n
              + lit(alpha) * coalesce(col("c"), lit(0.0))).as("rank"),
            col("dang"), col("prev")))
      val row = next.agg(
        sum(abs(col("rank") - col("prev"))).as("d"),
        coalesce(sum(when(col("dang"), col("rank"))), lit(0.0)).as("dm")).head()
      val delta = row.getDouble(0)
      dmass = row.getDouble(1)
      ranks.unpersist()
      ranks = next
      it += 1
      done = delta < tol
    }
    e.unpersist(); frac.unpersist(); nodes.unpersist(); nodesD.unpersist()
    val out = ranks.select(col("node"), col("rank")).lineageCut()
    ranks.unpersist()
    out
  }
}
