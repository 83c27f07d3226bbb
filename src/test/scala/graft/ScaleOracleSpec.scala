package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.SpatialOps._
import graft.operators.CorpusOps._
import graft.operators.DedupOps._
import graft.operators.TemporalOps._
import graft.operators.VectorOps
import graft.operators.VectorOps._

/** Second-scale-factor oracle (r13 verdict #7): the DuckDB gate runs at
  * sf0.01, so a plan bug that only appears when the data outgrows a
  * sampler cap, trips a different AQE shape, or crosses a cell-count
  * threshold is invisible to it. This suite re-checks the most
  * PLAN-SENSITIVE operators — the ones whose fancy plan (grid cells,
  * pivot cells, theta estimators, at-rest pruning, tombstone
  * subtraction) could silently diverge from their semantics at 10x the
  * oracle's data — against an independent naive Spark computation at
  * sf0.1. The naive twin takes a structurally different plan (cross +
  * filter, window top-k, from-scratch rewrite), so agreement checks the
  * clever plan's RESULT, not its implementation.
  */
class ScaleOracleSpec extends SparkSpec {

  private val d = sf("sf0.1")
  private lazy val cust = customerPts(spark, d)
  private lazy val supp = supplierPts(spark, d)

  private def pairs(df: DataFrame, a: String, b: String): Seq[(Long, Long)] =
    df.select(col(a).cast("long"), col(b).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  private def naiveDistancePairs(r: Double): Seq[(Long, Long)] =
    pairs(cust.crossJoin(supp)
      .filter(sqrt(pow(col("cx") - col("sx"), 2) + pow(col("cy") - col("sy"), 2)) <= r),
      "c_custkey", "s_suppkey")

  private def naiveKnnPairs(k: Int): Seq[(Long, Long)] = {
    val w = Window.partitionBy(col("c_custkey"))
      .orderBy(sqrt(pow(col("cx") - col("sx"), 2) + pow(col("cy") - col("sy"), 2)).asc,
        col("s_suppkey").asc)
    pairs(cust.crossJoin(supp).withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k), "c_custkey", "s_suppkey")
  }

  test("sf0.1: distance join — grid and broadcast equal the naive cross") {
    val want = naiveDistancePairs(100.0)
    assert(want.nonEmpty)
    assert(pairs(cust.distanceJoin(supp, Seq("cx", "cy"), Seq("sx", "sy"), 100.0),
      "c_custkey", "s_suppkey") === want, "grid != naive at sf0.1")
    assert(pairs(cust.distanceJoin(supp, Seq("cx", "cy"), Seq("sx", "sy"), 100.0,
        broadcastRight = true),
      "c_custkey", "s_suppkey") === want, "broadcast != naive at sf0.1")
  }

  test("sf0.1: kNN join — grid, pivot, and auto equal the naive window") {
    val want = naiveKnnPairs(3)
    assert(want.nonEmpty)
    assert(pairs(cust.knnJoin(supp, Seq("cx", "cy"), Seq("sx", "sy"), 3,
        "c_custkey", Seq("s_suppkey")), "c_custkey", "s_suppkey") === want,
      "grid kNN join != naive at sf0.1")
    assert(pairs(cust.knnJoinPivot(supp, Seq("cx", "cy"), Seq("sx", "sy"), 3,
        "c_custkey", Seq("s_suppkey")), "c_custkey", "s_suppkey") === want,
      "pivot kNN join != naive at sf0.1")
    spark.conf.set(graft.GraftConf.KnnJoinAlgo, "auto")
    try assert(pairs(cust.knnJoinAuto(supp, Seq("cx", "cy"), Seq("sx", "sy"), 3,
        "c_custkey", "s_suppkey", Seq("s_suppkey")),
      "c_custkey", "s_suppkey") === want, "auto kNN join != naive at sf0.1")
    finally spark.conf.unset(graft.GraftConf.KnnJoinAlgo)
  }

  test("sf0.1: shape distance join equals the cross filter") {
    import graft.spatial.ShapeCodec
    val cx = col("n_nationkey").cast("double") * 400.0
    val cy = col("n_nationkey").cast("double") * 40.0
    val boxes = nation(spark, d).select(col("n_nationkey"),
      struct(lit(ShapeCodec.TagMBR).as("tag"),
        array(cx - 150.0, cy - 20.0, cx + 150.0, cy + 20.0).as("coords"))
        .as("nbox"))
    val pts = cust.select(col("c_custkey"),
      struct(lit(ShapeCodec.TagPoint).as("tag"),
        array(col("cx"), col("cy")).as("coords")).as("cpt"))
    val got = pairs(boxes.shapeDistanceJoin(pts, "nbox", "cpt", 100.37),
      "n_nationkey", "c_custkey")
    val want = pairs(boxes.crossJoin(pts)
      .filter(graft.functions.stDistance(col("nbox"), col("cpt")) <= 100.37),
      "n_nationkey", "c_custkey")
    assert(got === want && got.nonEmpty)
  }

  test("sf0.1: at-rest spatial layout — pruned reads and delete waves " +
    "equal a from-scratch build") {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_scale_oracle_disk").toString
    graft.index.SpatialDisk.write(cust, path, Seq("cx", "cy"))
    def keys(df: DataFrame): Seq[Long] =
      df.select("c_custkey").collect().map(_.getLong(0)).sorted.toSeq
    val lo = Array(2000.0, 100.0); val hi = Array(4000.0, 300.0)
    assert(keys(graft.index.SpatialDisk.boxRange(spark, path, lo, hi)) ===
      keys(cust.boxRange(Seq("cx", "cy"), lo.toSeq, hi.toSeq)),
      "disk box range != in-memory at sf0.1")
    val c = Array(5000.0, 500.0)
    assert(keys(graft.index.SpatialDisk.knn(spark, path, c, 10, Seq("c_custkey"))) ===
      keys(cust.knn(Seq("cx", "cy"), c.toSeq, 10, tieBreak = Seq("c_custkey"))),
      "disk kNN != in-memory at sf0.1")
    assert(pairs(graft.index.SpatialDisk.distanceJoin(supp, Seq("sx", "sy"),
        path, 100.0), "c_custkey", "s_suppkey") === naiveDistancePairs(100.0),
      "disk distance join != naive at sf0.1")
    // delete waves: ids-only (%10==3) + located (%10==7) must equal a
    // from-scratch layout of the survivors
    graft.index.SpatialDisk.delete(spark, path,
      cust.filter(col("c_custkey") % 10 === 3).select("c_custkey"), "c_custkey")
    graft.index.SpatialDisk.deleteAt(spark, path,
      cust.filter(col("c_custkey") % 10 === 7).select("c_custkey", "cx", "cy"),
      "c_custkey")
    val survivors = cust.filter(col("c_custkey") % 10 =!= 3 &&
      col("c_custkey") % 10 =!= 7)
    val refPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_scale_oracle_disk_ref").toString
    graft.index.SpatialDisk.write(survivors, refPath, Seq("cx", "cy"))
    assert(keys(graft.index.SpatialDisk.boxRange(spark, path,
        Array(-1e7, -1e7), Array(1e7, 1e7))) ===
      keys(graft.index.SpatialDisk.boxRange(spark, refPath,
        Array(-1e7, -1e7), Array(1e7, 1e7))),
      "tombstoned layout != from-scratch survivors at sf0.1")
    assert(graft.index.SpatialDisk.fsck(spark, path).collect()
      .forall(_.getBoolean(1)), "fsck not green after sf0.1 delete waves")
  }

  test("sf0.1: BM25 at-rest index equals the in-memory scorer") {
    val docs = documents(spark, d)
    val terms = Seq("spark", "vector", "window", "hash", "merge", "customer")
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_scale_oracle_bm25").toString
    docs.writeBm25Index(path, "doc_id", "text")
    val got = bm25TopKAgainstIndex(spark, path, terms, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = docs.bm25TopK("doc_id", "text", terms, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want && got.nonEmpty,
      "BM25 index read != in-memory scorer at sf0.1")
  }

  test("sf0.1: MinHash at-rest index equals the direct wave-vs-corpus form") {
    val docs = documents(spark, d)
    val wave = docs.filter(col("doc_id") % 100 === 0)
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_scale_oracle_minhash").toString
    docs.writeMinhashIndex(path, "doc_id", "text")
    def trip(df: DataFrame): Seq[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sorted
    val got = trip(wave.minHashPairsAgainstIndex(path, "doc_id", "text",
      threshold = 0.5))
    val want = trip(wave.minHashPairsAgainst(docs, "doc_id", "text",
      threshold = 0.5))
    assert(got === want, "minhash index read != direct form at sf0.1")
  }

  test("sf0.1: IVF-PQ at-rest layout equals the in-memory composed index") {
    val emb = embeddings(spark, d)
    val q = emb.filter(col("vec_id") === 1L).select("embedding")
      .head().getSeq[Float](0).toArray
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_scale_oracle_ivfpq").toString
    emb.writeIvfPq(path, "embedding", "vec_id", nlist = 8, m = 4, ksub = 4,
      iters = 2)
    val disk = VectorOps.readIvfPqTopK(spark, path, "embedding", "vec_id",
        q, 10, nprobe = 4, refine = 40)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val mem = emb.cosineTopKIvfPq("embedding", "vec_id", q, 10,
        nlist = 8, nprobe = 4, m = 4, ksub = 4, refine = 40, iters = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(disk === mem && disk.nonEmpty,
      "IVF-PQ disk read != in-memory at sf0.1")
  }

  test("sf0.1: bucketed interval join equals the naive range join") {
    val dayUs = 86400000000L
    val ev = events(spark, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"))
    val windows = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("w_user_id"), col("event_id").as("p_event_id"),
        unix_micros(col("ts")).as("w_start"),
        (unix_micros(col("ts")) + dayUs).as("w_end"))
    val got = pairs(clicks.intervalJoin(
        windows.withColumnRenamed("w_user_id", "user_id"),
        Seq("user_id"), Seq("user_id"), "t", "w_start", "w_end",
        bucketWidth = dayUs), "event_id", "p_event_id")
    val want = pairs(clicks.join(windows,
        col("user_id") === col("w_user_id") &&
        col("t") >= col("w_start") && col("t") <= col("w_end")),
      "event_id", "p_event_id")
    assert(got === want && got.nonEmpty,
      "bucketed interval join != naive range join at sf0.1")
  }

  test("sf0.1: contamination sweep's hash gate loses no contaminated doc") {
    val docs = documents(spark, d)
    val eval = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("eval_id"), col("text"))
    val got = pairs(contaminationPairs(docs, eval, "doc_id", "eval_id",
      "text", n = 8), "doc_id", "eval_id")
    // ungated exact twin: the full string-gram equi-join, no candidates
    def grams(df: DataFrame, id: String, out: String) = df
      .select(col(id).as(out),
        explode(graft.functions.wordGrams(col("text"), 8)).as("__g"))
      .distinct()
    val want = pairs(grams(docs, "doc_id", "__cid")
      .join(grams(eval, "eval_id", "__eid"), Seq("__g"))
      .groupBy(col("__cid"), col("__eid"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 1)
      .select(col("__cid").as("doc_id"), col("__eid").as("eval_id")),
      "doc_id", "eval_id")
    assert(got === want && got.nonEmpty,
      "gated contamination sweep != ungated exact join at sf0.1")
  }
}
