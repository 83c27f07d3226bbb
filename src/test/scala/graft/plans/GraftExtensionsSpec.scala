package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.index.IndexManager

/** Extension-point coverage: the injected optimizer rule must silently
  * reroute matching plans to the clustered/cached index data, and the SQL
  * function registry must expose the scalar surface. Installed at runtime
  * via GraftExtensions.install (the shared test JVM already has a session,
  * so builder-time withExtensions can't apply). */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = graft.SparkSpec.session
    GraftExtensions.install(s)
    s
  }

  private val dir = "/root/testdata/sf0.001"

  test("index substitution rule reroutes matching plans to the cached index") {
    val src = Tables.customerPts(spark, dir)
    IndexManager.indexTable(spark, src, "ext_sub", Seq("cx", "cy"), numPartitions = 4)

    // a *fresh* equivalent plan (not the indexed object) gets substituted
    val q = Tables.customerPts(spark, dir)
      .filter(col("cx") >= 2000 && col("cx") <= 4000)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"expected cached index scan in plan:\n$plan")

    // and still returns exactly the un-indexed result
    val want = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal").as("cx"),
        (col("c_custkey") % 1000).cast("double").as("cy"))
      .filter(col("cx") >= 2000 && col("cx") <= 4000)
    assert(q.exceptAll(want).isEmpty && want.exceptAll(q).isEmpty)
    assert(q.count() > 0)
    IndexManager.dropIndex(spark, "ext_sub")
  }

  test("substitution handles pass-through column filters and mixed conjuncts") {
    val src = Tables.customerPts(spark, dir)
    IndexManager.indexTable(spark, src, "ext_pass", Seq("cx", "cy"), numPartitions = 4)
    // filter on the UN-aliased key column (c_custkey) + an aliased one (cx)
    val q = Tables.customerPts(spark, dir)
      .filter(col("c_custkey") > 50 && col("cx") < 9000)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"expected cached index scan in plan:\n$plan")
    val want = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal").as("cx"),
        (col("c_custkey") % 1000).cast("double").as("cy"))
      .filter(col("c_custkey") > 50 && col("cx") < 9000)
    assert(q.exceptAll(want).isEmpty && want.exceptAll(q).isEmpty && q.count() > 0)
    IndexManager.dropIndex(spark, "ext_pass")
  }

  test("no substitution when the filter needs a column the index lacks") {
    val src = Tables.customerPts(spark, dir)
    IndexManager.indexTable(spark, src, "ext_miss", Seq("cx", "cy"), numPartitions = 4)
    // c_mktsegment is not among the indexed projection's columns
    val q = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal").as("cx"), col("c_mktsegment"))
      .filter(col("c_mktsegment") === "BUILDING")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("InMemoryTableScan"))
    assert(q.count() > 0)
    IndexManager.dropIndex(spark, "ext_miss")
  }

  test("range index substitutes: a 1-D filter over the same source reads the cache") {
    val src = Tables.orders(spark, dir)
    IndexManager.rangeIndexTable(spark, src, "ext_range", "o_totalprice", numPartitions = 4)
    // a fresh equivalent plan with a 1-D key filter — the reference's
    // useIndexedData covers every index kind, not just the spatial ones
    val q = Tables.orders(spark, dir)
      .filter(col("o_totalprice") >= 50000.0 && col("o_totalprice") <= 60000.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"expected cached range-index scan in plan:\n$plan")
    val want = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_totalprice") >= 50000.0 && col("o_totalprice") <= 60000.0)
    assert(q.exceptAll(want).isEmpty && want.exceptAll(q).isEmpty && q.count() > 0)
    IndexManager.dropIndex(spark, "ext_range")
  }

  test("hash index substitutes: an equality filter over the same source reads the cache") {
    val src = Tables.customer(spark, dir)
    IndexManager.hashIndexTable(spark, src, "ext_hash", "c_mktsegment", numPartitions = 4)
    val q = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"expected cached hash-index scan in plan:\n$plan")
    val want = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
    assert(q.exceptAll(want).isEmpty && want.exceptAll(q).isEmpty && q.count() > 0)
    IndexManager.dropIndex(spark, "ext_hash")
  }

  test("plan-keyed DDL survives the rule: substituted probes map back to the source") {
    val src = Tables.customerPts(spark, dir)
    IndexManager.indexTable(spark, src, "ext_ddl", Seq("cx", "cy"), numPartitions = 4)
    // with the rule installed, a fresh probe over the same source is
    // ITSELF substituted before indexesOfPlan sees it — the reverse
    // mapping must still resolve it to the registered source
    assert(IndexManager.indexesOfPlan(spark, Tables.customerPts(spark, dir))
      === Seq("ext_ddl"))
    // a second index built from the (already-substituted) source must
    // register the ORIGINAL plan, keeping both plan-addressable
    IndexManager.quadTreeIndexTable(spark, Tables.customerPts(spark, dir),
      "ext_ddl2", Seq("cx", "cy"), numPartitions = 4)
    assert(IndexManager.indexesOfPlan(spark, Tables.customerPts(spark, dir)).sorted
      === Seq("ext_ddl", "ext_ddl2"))
    Seq("ext_ddl", "ext_ddl2").foreach(IndexManager.dropIndex(spark, _))
  }

  test("multi-index choice: 1-D filter picks the range cache, 2-D box the z cache") {
    // orders: both key columns are REAL parquet columns, so the filter
    // conjuncts still reference them when the rule runs (a computed
    // column like customerPts.cy is inlined by the optimizer and its
    // conjunct no longer mentions the index key); bare-table filters
    // also exercise the Filter-without-Project matching shape
    IndexManager.indexTable(spark, Tables.orders(spark, dir), "ext_mi_z",
      Seq("o_totalprice", "o_custkey"), numPartitions = 4)
    IndexManager.rangeIndexTable(spark, Tables.orders(spark, dir),
      "ext_mi_r", "o_totalprice", numPartitions = 4)
    try {
      // the z cache carries its internal __graft_z column (visible in
      // the InMemoryRelation's output); the range cache does not — a
      // plan-string marker for WHICH cache a substituted query reads
      val q1 = Tables.orders(spark, dir)
        .filter(col("o_totalprice") >= 50000.0 && col("o_totalprice") <= 60000.0)
      val p1 = q1.queryExecution.optimizedPlan.toString
      assert(p1.contains("InMemoryRelation"), s"1-D filter not substituted:\n$p1")
      assert(!p1.contains("__graft_z"),
        s"1-D filter must prefer the range cache (tightest key match):\n$p1")
      val q2 = Tables.orders(spark, dir)
        .filter(col("o_totalprice") >= 50000.0 && col("o_totalprice") <= 100000.0 &&
          col("o_custkey") >= 100 && col("o_custkey") <= 900)
      val p2 = q2.queryExecution.optimizedPlan.toString
      assert(p2.contains("__graft_z"),
        s"2-D box must prefer the z cache (covers both conjunct columns):\n$p2")
      // both substituted plans still return exactly the un-indexed rows
      val raw = spark.read.parquet(s"$dir/orders.parquet")
      val want1 = raw.filter(col("o_totalprice") >= 50000.0 && col("o_totalprice") <= 60000.0)
      assert(q1.exceptAll(want1).isEmpty && want1.exceptAll(q1).isEmpty && q1.count() > 0)
      val want2 = raw.filter(col("o_totalprice") >= 50000.0 &&
        col("o_totalprice") <= 100000.0 &&
        col("o_custkey") >= 100 && col("o_custkey") <= 900)
      assert(q2.exceptAll(want2).isEmpty && want2.exceptAll(q2).isEmpty && q2.count() > 0)
    } finally Seq("ext_mi_z", "ext_mi_r").foreach(IndexManager.dropIndex(spark, _))
  }

  test("dropping the index stops substitution") {
    val src = Tables.customerPts(spark, dir)
    IndexManager.indexTable(spark, src, "ext_drop", Seq("cx", "cy"), numPartitions = 4)
    IndexManager.dropIndex(spark, "ext_drop")
    val q = Tables.customerPts(spark, dir).filter(col("cx") >= 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("InMemoryTableScan"))
  }

  test("SQL-mode spatial joins: the TVFs build the DataFrame verbs' plans") {
    import spark.implicits._
    GraftExtensions.registerFunctions(spark)
    val l = (0 until 200).map(i => (i.toLong, (i % 50) * 10.0, (i % 20) * 10.0))
      .toDF("id1", "x1", "y1")
    val r = (0 until 100).map(i => (i.toLong, (i % 40) * 10.0 + 1.0, (i % 25) * 10.0 + 1.0))
      .toDF("id2", "x2", "y2")
    l.createOrReplaceTempView("tvf_l")
    r.createOrReplaceTempView("tvf_r")
    val dj = spark.sql(
      "SELECT id1, id2 FROM graft_distance_join('tvf_l', 'tvf_r', 'x1,y1', 'x2,y2', 15.0)")
    // the grid plan, not a cross product
    val plan = dj.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join Cross") && !plan.contains("Cartesian"),
      s"TVF produced a cross plan:\n$plan")
    import graft.operators.SpatialOps._
    val want = l.distanceJoin(r, Seq("x1", "y1"), Seq("x2", "y2"), 15.0)
      .select("id1", "id2").collect().map(t => (t.getLong(0), t.getLong(1))).toSet
    val got = dj.collect().map(t => (t.getLong(0), t.getLong(1))).toSet
    assert(got === want && got.nonEmpty)

    // the gridded fixture has equidistant neighbors — the tie-break
    // argument is what makes the result deterministic on both sides
    val kj = spark.sql(
      "SELECT id1, id2 FROM graft_knn_join('tvf_l', 'tvf_r', 'x1,y1', 'x2,y2', 3, 'id1', 'id2')")
    val wantK = l.knnJoin(r, Seq("x1", "y1"), Seq("x2", "y2"), 3, "id1", Seq("id2"))
      .select("id1", "id2").collect().map(t => (t.getLong(0), t.getLong(1))).toSet
    val gotK = kj.collect().map(t => (t.getLong(0), t.getLong(1))).toSet
    assert(gotK === wantK && gotK.nonEmpty)
    // non-literal / wrong-arity arguments fail loudly, not mysteriously
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_distance_join('tvf_l', 'tvf_r', 'x1,y1', 'x2,y2')").collect()
    }
    // the at-rest layout's SQL twins build the Scala verbs' plans
    val diskPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_ext_spec_disk").toString
    graft.index.SpatialDisk.write(l, diskPath, Seq("x1", "y1"))
    val db = spark.sql(
      s"SELECT id1 FROM graft_disk_box_range('$diskPath', '100,50', '300,150')")
      .collect().map(_.getLong(0)).toSet
    val wantDb = l.filter(col("x1").between(100.0, 300.0) &&
      col("y1").between(50.0, 150.0)).select("id1")
      .collect().map(_.getLong(0)).toSet
    assert(db === wantDb && db.nonEmpty)
    val dk = spark.sql(
      s"SELECT id1 FROM graft_disk_knn('$diskPath', '155,55', 5, 'id1')")
      .collect().map(_.getLong(0)).toSet
    val wantDk = l.knn(Seq("x1", "y1"), Seq(155.0, 55.0), 5, Seq("id1"))
      .select("id1").collect().map(_.getLong(0)).toSet
    assert(dk === wantDk && dk.size === 5)

    // disk kNN JOIN through SQL builds the same pruned-layout plan
    val dkj = spark.sql(
      s"SELECT id2, id1 FROM graft_disk_knn_join('tvf_r', 'x2,y2', " +
        s"'$diskPath', 3, 'id2', 'id1')")
      .collect().map(t => (t.getLong(0), t.getLong(1))).toSet
    val wantDkj = graft.index.SpatialDisk.knnJoin(r, Seq("x2", "y2"),
        diskPath, 3, leftId = "id2", tieBreak = Seq("id1"))
      .select("id2", "id1").collect()
      .map(t => (t.getLong(0), t.getLong(1))).toSet
    assert(dkj === wantDkj && dkj.nonEmpty)

    // intersects join through SQL: same PBSM plan, no cross
    val lb = l.select(col("id1"), struct(
      lit(graft.spatial.ShapeCodec.TagMBR).as("tag"),
      array(col("x1") - 5.0, col("y1") - 5.0,
        col("x1") + 5.0, col("y1") + 5.0).as("coords")).as("lbox"))
    val rb = r.select(col("id2"), struct(
      lit(graft.spatial.ShapeCodec.TagMBR).as("tag"),
      array(col("x2") - 5.0, col("y2") - 5.0,
        col("x2") + 5.0, col("y2") + 5.0).as("coords")).as("rbox"))
    lb.createOrReplaceTempView("tvf_lb")
    rb.createOrReplaceTempView("tvf_rb")
    val ij = spark.sql(
      "SELECT id1, id2 FROM graft_intersects_join('tvf_lb', 'tvf_rb', 'lbox', 'rbox')")
    val ijPlan = ij.queryExecution.optimizedPlan.toString
    assert(!ijPlan.contains("Join Cross") && !ijPlan.contains("Cartesian"),
      s"intersects TVF produced a cross plan:\n$ijPlan")
    val gotIj = ij.collect().map(t => (t.getLong(0), t.getLong(1))).toSet
    val wantIj = lb.shapeIntersectsJoin(rb, "lbox", "rbox")
      .select("id1", "id2").collect()
      .map(t => (t.getLong(0), t.getLong(1))).toSet
    assert(gotIj === wantIj && gotIj.nonEmpty)

    // a fractional k is a caller mistake — rejected loudly, never
    // silently truncated to its floor
    val eK = intercept[Throwable] {
      spark.sql("SELECT * FROM graft_knn_join('tvf_l', 'tvf_r', 'x1,y1', 'x2,y2', 3.5, 'id1', 'id2')").collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(e => Option(e.getMessage)).toSeq
    assert(chain(eK).exists(_.contains("integral")),
      s"fractional k not rejected with the integral message: ${chain(eK)}")
  }

  test("SQL function registry exposes the scalar surface") {
    GraftExtensions.registerFunctions(spark)
    val row = spark.sql(
      "SELECT graft_lang_id('the cat is on the mat') AS l, " +
        "graft_simhash64('alpha beta') AS s, " +
        "graft_cosine_similarity(array(cast(1.0 as float), cast(0.0 as float)), " +
        " array(cast(1.0 as float), cast(0.0 as float))) AS c").head()
    assert(row.getString(0) === "en")
    assert(row.getLong(1) === graft.functions.TextKernels.simHash64("alpha beta"))
    assert(row.getDouble(2) === 1.0)
  }

  test("SQL registry: sign projection and text normalization") {
    GraftExtensions.registerFunctions(spark)
    val row = spark.sql(
      "SELECT graft_normalize_text('  Hello,   World!! ') AS n, " +
        "graft_sign_project(array(cast(1.0 as float), cast(0.0 as float)), 4, 0) AS p")
      .head()
    assert(row.getString(0) === "hello world")
    // matches the Column-API expression exactly
    import spark.implicits._
    val want = Seq(Array(1f, 0f)).toDF("v")
      .select(graft.functions.signProject(col("v"), 4, 0L))
      .head().getSeq[Double](0)
    assert(row.getSeq[Double](1) === want)
  }
}
