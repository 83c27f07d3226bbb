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
    val e = edges.select(col(srcCol).cast("long").as("__graft_src"),
      col(dstCol).cast("long").as("__graft_dst"))
    val nodes = e.select(col("__graft_src").as("node"))
      .union(e.select(col("__graft_dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    if (n == 0L) return nodes.withColumn("rank", lit(0L))
    val init = massScale / n
    val teleport = lit(dampInt(init, 3)) // floor(0.15 * init), exact
    val outdeg = e.groupBy(col("__graft_src"))
      .agg(count(lit(1)).as("__graft_deg")).localCheckpoint()

    var ranks = nodes.withColumn("rank", lit(init))
    var i = 0
    while (i < iters) {
      // one-iteration lineage: the PREVIOUS round's frame materializes
      // at the top of this round, and the returned frame keeps its final
      // iteration's plan visible (gated by PlanGateSpec) instead of
      // hiding it behind a trailing checkpoint
      if (i > 0) ranks = ranks.localCheckpoint()
      // dangling mass: one exact long to the driver (sum as decimal —
      // Spark's non-ANSI long sum would wrap silently on overflow)
      val dang = ranks.join(outdeg, col("node") === col("__graft_src"), "left_anti")
        .agg(coalesce(sum(col("rank").cast(DecimalType(38, 0))), lit(0))
          .cast("long")).head().getLong(0)
      val contribs = ranks
        .join(e, col("node") === col("__graft_src"))
        .join(outdeg, Seq("__graft_src"))
        .select(col("__graft_dst").as("node"),
          floor(col("rank") / col("__graft_deg")).cast("long").as("__graft_c"))
        .groupBy(col("node"))
        .agg(sum(col("__graft_c").cast(DecimalType(38, 0)))
          .cast("long").as("__graft_in"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (teleport + dampTerm(
            coalesce(col("__graft_in"), lit(0L)) + lit(dang / n), 17))
            .as("rank"))
      i += 1
    }
    ranks
  }

  /** Driver-side mirror of [[dampTerm]] for plan-time constants. */
  private def dampInt(x: Long, num: Int): Long =
    (x / 20) * num + ((x % 20) * num) / 20
}
