package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Link-graph authority scoring for corpus curation — the PageRank-style
  * signal web-scale pipelines use to weight crawl sources (a page/domain
  * linked by many well-linked peers is likelier to carry quality text
  * than an orphan or a link-farm leaf).
  *
  * The entire computation is INTEGER arithmetic on a fixed-point rank
  * scale: ranks are longs summing to ~`massScale`, the damping step is
  * exact floor arithmetic (`floor(x/20)*17 + floor((x mod 20)*17/20)`
  * == `floor(0.85*x)` with no intermediate overflow and no float sum),
  * and per-edge contributions are `floor(rank / outdeg)`. Exact long
  * sums are order-independent, so the result is bit-identical across
  * partitionings, engines, and runs — a full SQL-oracle replay, where a
  * float PageRank would drift with reduction order. Quantization error
  * is < 1 rank unit per floor (≤ outdeg units per node per iteration) —
  * at the 1e15 default scale, noise in the 15th digit.
  *
  * Scale shape (100 TB of edges): each iteration is one edge-keyed
  * equi-join (ranks are node-keyed — join on `src`, partial-aggregated
  * sum into `dst`) plus one broadcast-sized scalar (the dangling mass,
  * ONE number to the driver per iteration). Ranks localCheckpoint each
  * round, so the plan/lineage stays one-iteration deep (the
  * [[DedupOps]] pointer-doubling discipline). Iterations are a fixed
  * small count — authority signals converge in a handful of rounds and
  * pipelines pin them for reproducibility.
  */
object GraphOps {

  /** `floor(x * num / 20)` for non-negative long `x` without overflow
    * past 2^53 and without a float multiply: both terms stay well inside
    * exact double range (x ≤ massScale = 1e15 < 2^53, so `x/20` is a
    * correctly-rounded double ≥ 1/20 away from the wrong integer;
    * `(x mod 20)*num ≤ 19*17`). */
  private def dampTerm(x: Column, num: Int): Column =
    floor(x / 20).cast("long") * num +
      floor((x % 20) * num / 20).cast("long")

  /** Fixed-point PageRank over an edge list. `edges` must carry the two
    * long-typed endpoint columns; multi-edges should be pre-distinct'd
    * by the caller if unwanted. Returns `(node, rank)` for every node
    * appearing as a source or destination, `Σ rank ≈ massScale`.
    *
    * Dangling mass (nodes with no out-edges — every sink in a bipartite
    * projection) redistributes uniformly each iteration, the standard
    * correction; damping is fixed at 0.85 in exact 17/20 arithmetic. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3,
               massScale: Long = 1000000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(massScale >= 1L, s"massScale must be >= 1, got $massScale")
    // the edge frame is read every round (and often arrives as a
    // distinct/join pipeline) — materialize it ONCE, pre-partitioned by
    // src, so iterations scan blocks instead of re-running the caller's
    // plan per action AND the per-round contribution join re-shuffles
    // only the (node, rank) side, never the edges (guide §2.4: two
    // operations keyed the same way share one exchange — the checkpoint
    // preserves the hash partitioning across rounds)
    val e = edges.select(col(srcCol).cast("long").as("__graft_src"),
      col(dstCol).cast("long").as("__graft_dst"))
      .repartition(col("__graft_src")).localCheckpoint()
    // node set and out-degrees in ONE union-aggregate pass (the previous
    // shape paid a distinct shuffle, a separate outdeg aggregation, and
    // a join to glue them): deg > 0 marks sources, null = dangling.
    // Rank rows CARRY this degree, so the dangling mass is one
    // null-filtered scan of the checkpointed ranks (no anti-join) and
    // the contribution join needs no outdeg equi-join.
    val nodesDeg = e.select(col("__graft_src").as("node"), lit(1L).as("__graft_c"))
      .union(e.select(col("__graft_dst").as("node"), lit(0L).as("__graft_c")))
      .groupBy(col("node"))
      .agg(sum(col("__graft_c")).as("__graft_outc"))
      .select(col("node"),
        when(col("__graft_outc") > 0L, col("__graft_outc")).as("__graft_deg"))
      .localCheckpoint()
    val n = nodesDeg.count()
    if (n == 0L) return nodesDeg.select(col("node")).withColumn("rank", lit(0L))
    val init = massScale / n
    val teleport = lit(dampInt(init, 3)) // floor(0.15 * init), exact

    var ranks = nodesDeg.withColumn("rank", lit(init))
    var i = 0
    while (i < iters) {
      // one-iteration lineage: the PREVIOUS round's frame materializes
      // at the top of this round, and the returned frame keeps its final
      // iteration's plan visible (gated by PlanGateSpec) instead of
      // hiding it behind a trailing checkpoint
      if (i > 0) ranks = ranks.localCheckpoint()
      ranks = prStep(nodesDeg, e, ranks, n, teleport)
      i += 1
    }
    ranks.select(col("node"), col("rank"))
  }

  /** One PageRank iteration — the exact arithmetic both the fixed-count
    * and the converging drivers share, so their round-i states are
    * bit-identical by construction. `ranks` and `nodesDeg` carry
    * `__graft_deg` (null = no out-edges); the returned frame carries it
    * too, so the next round can reuse it. */
  private def prStep(nodesDeg: DataFrame, e: DataFrame,
                     ranks: DataFrame, n: Long, teleport: Column): DataFrame = {
    // dangling mass: one exact long to the driver (sum as decimal —
    // Spark's non-ANSI long sum would wrap silently on overflow). The
    // deg-null filter reads the already-checkpointed ranks — no join.
    val dang = ranks.filter(col("__graft_deg").isNull)
      .agg(coalesce(sum(col("rank").cast(DecimalType(38, 0))), lit(0))
        .cast("long")).head().getLong(0)
    val contribs = ranks.filter(col("__graft_deg").isNotNull)
      .join(e, col("node") === col("__graft_src"))
      .select(col("__graft_dst").as("node"),
        floor(col("rank") / col("__graft_deg")).cast("long").as("__graft_c"))
      .groupBy(col("node"))
      .agg(sum(col("__graft_c").cast(DecimalType(38, 0)))
        .cast("long").as("__graft_in"))
    nodesDeg
      .join(contribs, Seq("node"), "left")
      .select(col("node"), col("__graft_deg"),
        (teleport + dampTerm(
          coalesce(col("__graft_in"), lit(0L)) + lit(dang / n), 17))
          .as("rank"))
  }

  /** [[pageRank]] with an L1-delta stopping rule: iterate until the
    * total absolute rank movement between consecutive rounds is at most
    * `tolL1` (in `massScale` units) or `maxIters` rounds have run,
    * whichever first. Returns the final ranks AND the number of rounds
    * executed, so callers can audit how much the bound saved.
    *
    * Each round pays ONE extra aggregate beyond [[pageRank]]'s work —
    * an equi-join of the previous and current rank frames (both
    * localCheckpointed, so neither recomputes) and a decimal-exact
    * `sum(abs(delta))` reduced to a single driver scalar; the delta is
    * exact integer arithmetic like the ranks themselves, so the stop
    * decision is deterministic and engine-replayable. The round-i state
    * is bit-identical to `pageRank(..., iters = i)` ([[prStep]] is the
    * shared single-round arithmetic) — the fixed-count form stays the
    * oracle path, this form is how a 100-TB run avoids paying for
    * iterations a fast-mixing graph doesn't need. */
  def pageRankConverged(edges: DataFrame, srcCol: String, dstCol: String,
                        tolL1: Long, maxIters: Int = 20,
                        massScale: Long = 1000000000000000L): (DataFrame, Int) = {
    require(tolL1 >= 0L, s"tolL1 must be >= 0, got $tolL1")
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    require(massScale >= 1L, s"massScale must be >= 1, got $massScale")
    val e = edges.select(col(srcCol).cast("long").as("__graft_src"),
      col(dstCol).cast("long").as("__graft_dst"))
      .repartition(col("__graft_src")).localCheckpoint()
    val nodesDeg = e.select(col("__graft_src").as("node"), lit(1L).as("__graft_c"))
      .union(e.select(col("__graft_dst").as("node"), lit(0L).as("__graft_c")))
      .groupBy(col("node"))
      .agg(sum(col("__graft_c")).as("__graft_outc"))
      .select(col("node"),
        when(col("__graft_outc") > 0L, col("__graft_outc")).as("__graft_deg"))
      .localCheckpoint()
    val n = nodesDeg.count()
    if (n == 0L) return (nodesDeg.select(col("node")).withColumn("rank", lit(0L)), 0)
    val init = massScale / n
    val teleport = lit(dampInt(init, 3))

    var ranks = nodesDeg.withColumn("rank", lit(init)).localCheckpoint()
    var i = 0
    var converged = false
    while (i < maxIters && !converged) {
      val next = prStep(nodesDeg, e, ranks, n, teleport).localCheckpoint()
      val delta = ranks.select(col("node"), col("rank").as("__graft_prev"))
        .join(next, Seq("node"))
        .agg(coalesce(sum(abs(col("rank") - col("__graft_prev"))
          .cast(DecimalType(38, 0))), lit(0)).cast("long"))
        .head().getLong(0)
      ranks = next
      i += 1
      if (delta <= tolL1) converged = true
    }
    (ranks.select(col("node"), col("rank")), i)
  }

  /** Driver-side mirror of [[dampTerm]] for plan-time constants. */
  private def dampInt(x: Long, num: Int): Long =
    (x / 20) * num + ((x % 20) * num) / 20

  /** Per-node triangle counts over an undirected edge list — the local
    * link-graph cohesion signal (a node embedded in triangles sits in a
    * genuine community; link farms and spam rings show near-zero
    * closure relative to degree, so `2·tri / (deg·(deg−1))` — the local
    * clustering coefficient, one division the caller can add — is a
    * standard crawl-curation feature alongside [[pageRank]]).
    *
    * Degree-orientation algorithm (the MapReduce-classic wedge-closing
    * scheme): direct every canonical edge from its lower-(degree, id)
    * endpoint to the higher; enumerate wedges only from each node's
    * ORIENTED out-neighbors, and close them against the oriented edge
    * set. Orientation bounds every out-neighborhood by O(√(2m)) — a
    * celebrity node with 10⁸ followers contributes wedges only through
    * its few higher-degree peers, not C(10⁸, 2) pairs — keeping total
    * wedge volume ≤ m^1.5 regardless of skew. Each triangle materializes
    * exactly once (its endpoints appear in orientation order), then
    * credits all three corners.
    *
    * Every step is an equi-join or a partial-aggregated count on integer
    * keys — one distinct shuffle, one degree aggregation, two
    * degree-attach joins, the wedge self-join on the pivot node, the
    * closing join on the (v, w) pair, and the final corner count. No
    * cartesian anywhere; exact integer arithmetic end to end, so any SQL
    * engine replays it bit-for-bit.
    *
    * Returns `(node, degree, triangles)` for every node incident to at
    * least one non-loop edge. Self-loops drop; multi-edges collapse. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("__graft_a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("__graft_b"))
      .filter(col("__graft_a") =!= col("__graft_b"))
      .distinct()
    val deg = und.select(col("__graft_a").as("node"))
      .union(und.select(col("__graft_b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    // orient a→b iff (deg(a), a) < (deg(b), b); carry the head's degree
    // so wedge enumeration can order the two spokes without re-joining
    val o = und
      .join(deg.select(col("node").as("__graft_a"), col("degree").as("__graft_da")),
        Seq("__graft_a"))
      .join(deg.select(col("node").as("__graft_b"), col("degree").as("__graft_db")),
        Seq("__graft_b"))
      .select(
        when(col("__graft_da") < col("__graft_db") ||
            (col("__graft_da") === col("__graft_db") &&
              col("__graft_a") < col("__graft_b")),
          struct(col("__graft_a").as("u"), col("__graft_b").as("v"),
            col("__graft_db").as("dv")))
          .otherwise(struct(col("__graft_b").as("u"), col("__graft_a").as("v"),
            col("__graft_da").as("dv"))).as("e"))
      .select(col("e.u").as("__graft_u"), col("e.v").as("__graft_v"),
        col("e.dv").as("__graft_dv"))
    // wedges (u; v, w) with (deg(v), v) < (deg(w), w): the closing edge,
    // if present, is oriented v→w — each triangle matches exactly once
    val wedges = o.as("x")
      .join(o.select(col("__graft_u"), col("__graft_v").as("__graft_w"),
        col("__graft_dv").as("__graft_dw")).as("y"), Seq("__graft_u"))
      .filter(col("__graft_dv") < col("__graft_dw") ||
        (col("__graft_dv") === col("__graft_dw") &&
          col("__graft_v") < col("__graft_w")))
      .select(col("__graft_u"), col("__graft_v"), col("__graft_w"))
    val tris = wedges.join(
      o.select(col("__graft_u").as("__graft_v"), col("__graft_v").as("__graft_w"))
        .hint("shuffle_hash"),
      Seq("__graft_v", "__graft_w"), "left_semi")
    val corners = tris
      .select(explode(array(col("__graft_u"), col("__graft_v"), col("__graft_w")))
        .as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    deg.join(corners, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }
}
