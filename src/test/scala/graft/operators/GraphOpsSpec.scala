package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {

  test("pageRank: 3-cycle stays uniform, mass conserved to quantization") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val mass = 1000000000000000L
    val got = GraphOps.pageRank(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    // symmetric cycle: all ranks identical
    assert(got.values.toSet.size === 1)
    // each floor loses < 1 unit; 3 iterations, <= a few units per node
    val total = got.values.sum
    assert(total <= mass && total >= mass - 100L,
      s"mass $total drifted from $mass")
  }

  test("pageRank: star with dangling sink — hand-computed first iteration") {
    import spark.implicits._
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    // massScale 20000, n 4 -> init 5000, teleport floor(5000*3/20)=750
    // node 1 is dangling (rank 5000 redistributes: share 1250)
    // r1(1) = 750 + floor(0.85*(15000+1250)) = 750 + 13812 = 14562
    // r1(2..4) = 750 + floor(0.85*1250) = 750 + 1062 = 1812
    val got = GraphOps.pageRank(edges, "src", "dst", iters = 1,
      massScale = 20000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 14562L)
    assert(got(2L) === 1812L && got(3L) === 1812L && got(4L) === 1812L)
  }

  test("pageRank: bit-identical across partitionings; sink gains rank") {
    import spark.implicits._
    val edges = (1L to 200L).map(i => (i, i % 20 + 1000L)).toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame) =
      GraphOps.pageRank(df, "src", "dst", iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val a = run(edges)
    assert(a === run(edges.repartition(17)))
    // the 20 sink nodes absorb more rank than any pure source
    val ranks = a.toMap
    val sinkMin = (1000L to 1019L).map(ranks).min
    val srcMax = (1L to 200L).map(ranks).max
    assert(sinkMin > srcMax)
  }

  test("pageRankConverged: early stop on a fast-mixing graph, bit-identical " +
    "to the fixed-count run at the stop round") {
    import spark.implicits._
    // directed 3-cycle: uniform ranks are a fixpoint up to quantization,
    // so the L1 delta collapses after the first couple of rounds
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val maxIters = 10
    val (df, rounds) = GraphOps.pageRankConverged(edges, "src", "dst",
      tolL1 = 10L, maxIters = maxIters)
    assert(rounds >= 1 && rounds < maxIters,
      s"expected early stop, ran $rounds/$maxIters rounds")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixed = GraphOps.pageRank(edges, "src", "dst", iters = rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === fixed, "converged ranks diverge from fixed-count ranks")
  }

  test("pageRankConverged: tolL1=0 on a skewed graph runs to maxIters " +
    "unless it hits an exact fixpoint, and matches the fixed run") {
    import spark.implicits._
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L)).toDF("src", "dst")
    val maxIters = 4
    val (df, rounds) = GraphOps.pageRankConverged(edges, "src", "dst",
      tolL1 = 0L, maxIters = maxIters, massScale = 20000L)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixed = GraphOps.pageRank(edges, "src", "dst", iters = rounds,
      massScale = 20000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === fixed)
    assert(rounds >= 1 && rounds <= maxIters)
  }

  test("triangleCounts: hand fixture — K4 + pendant + stray edge + noise") {
    import spark.implicits._
    // K4 on {1,2,3,4}; pendant 5-1; disconnected edge 6-7; plus a
    // self-loop, a duplicate, and a reversed duplicate (all collapse)
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val edges = (k4 ++ Seq((5L, 1L), (6L, 7L), (3L, 3L), (1L, 2L), (2L, 1L)))
      .toDF("src", "dst")
    val got = GraphOps.triangleCounts(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // K4: each node in C(3,2)=3 triangles; node 1 also carries the pendant
    assert(got(1L) === ((4L, 3L)))
    assert(got(2L) === ((3L, 3L)))
    assert(got(3L) === ((3L, 3L)))
    assert(got(4L) === ((3L, 3L)))
    assert(got(5L) === ((1L, 0L)))
    assert(got(6L) === ((1L, 0L)) && got(7L) === ((1L, 0L)))
  }

  test("triangleCounts: K6 clique formula; partition-independent") {
    import spark.implicits._
    val k6 = (for (i <- 1L to 6L; j <- (i + 1) to 6L) yield (i, j))
      .toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame) =
      GraphOps.triangleCounts(df, "src", "dst")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
    val a = run(k6)
    // every node: degree 5, C(5,2)=10 triangles; total corners = 3*C(6,3)
    assert(a === (1L to 6L).map(i => (i, 5L, 10L)))
    assert(a.map(_._3).sum === 3L * 20L)
    assert(a === run(k6.repartition(11)))
  }
}
