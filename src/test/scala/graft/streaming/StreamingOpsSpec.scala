package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.streaming.StreamingOps._

class StreamingOpsSpec extends SparkSpec {

  test("streaming hourly stats equal the batch aggregation") {
    val got = StreamingOps.hourlyEventStatsBatchEquivalent(spark, sf())
    val want = graft.queries.Relational.eventsHourly(spark, sf())
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming contamination gate equals the batch gram-intersection") {
    import graft.functions.wordGrams
    val got = StreamingOps.streamContaminationCounts(spark, sf(), n = 8)
    // batch equivalent: distinct corpus (doc, gram) pairs semi-joined
    // against the distinct eval gram set, counted per doc
    val docs = Tables.documents(spark, sf())
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(wordGrams(col("text"), 8))).as("g"))
    val ev = grams.filter(col("doc_id") % 7 === 0).select("g").distinct()
    val want = grams.filter(col("doc_id") % 7 =!= 0)
      .join(ev, Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("matched_grams"))
    assert(got.count() > 0, "gate found no contaminated docs — fixture broke")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming passage gate equals the batch anti-join recompute") {
    import graft.operators.CorpusOps
    val docs = Tables.documents(spark, sf())
    // the gate takes staged wavePath + corpusPath — the even/odd split
    // is the harness's fixture, staged here
    val corpusPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_spec_stpg_corpus").toString
    val wavePath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_spec_stpg_wave").toString
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(corpusPath)
    docs.filter(col("doc_id") % 2 =!= 0)
      .write.mode("overwrite").parquet(wavePath)
    val got = StreamingOps.streamPassageGate(spark, wavePath, corpusPath,
      width = 20)
    // batch equivalent: arrivals' passages minus the corpus digest set,
    // reassembled in position order
    val chunked = docs.select(col("doc_id"),
      posexplode(CorpusOps.passagesOf(col("text"), 20)).as(Seq("pos", "pass")))
    val corpus = chunked.filter(col("doc_id") % 2 === 0)
      .select(md5(col("pass")).as("k")).distinct()
    val want = chunked.filter(col("doc_id") % 2 =!= 0)
      .join(corpus, md5(col("pass")) === col("k"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"),
          col("pass")))), x => x("pass")), " ").as("text_clean"),
        count(lit(1)).as("kept_passages"))
    assert(got.count() > 0, "gate passed no documents — fixture broke")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // and the gate actually drops something: corpus-shared passages exist
    val arrivalsAll = chunked.filter(col("doc_id") % 2 =!= 0).count()
    val kept = got.agg(sum(col("kept_passages"))).head().getLong(0)
    assert(kept < arrivalsAll,
      s"gate dropped nothing ($kept of $arrivalsAll) — corpus overlap fixture broke")
  }

  test("streaming semantic gate equals the batch IVF gate per pair") {
    import graft.operators.VectorOps
    import graft.operators.VectorOps._
    val idx = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stsg_spec_idx").toString
    val wavePath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stsg_spec_wave").toString
    val emb = Tables.embeddings(spark, sf())
    emb.filter(col("vec_id") % 2 === 0).writeIvfPq(idx, "embedding",
      "vec_id", nlist = 8, m = 4, ksub = 4, iters = 2)
    emb.filter(col("vec_id") % 2 =!= 0)
      .select((col("vec_id") + 1000000L).as("wid"),
        col("embedding").as("wvec"))
      .write.mode("overwrite").parquet(wavePath)
    val got = StreamingOps.streamSemanticGate(spark, wavePath, idx,
      "embedding", "vec_id", "wvec", "wid", threshold = 0.3, nprobe = 4)
    val want = VectorOps.ivfSemanticGate(spark.read.parquet(wavePath),
      "wvec", "wid", idx, "embedding", "vec_id", 0.3, nprobe = 4)
    assert(got.count() > 0, "gate flagged no pairs — fixture broke")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // tombstones reach the stream (the anti-join is a static read —
    // stream-safe): after a layout delete the stream equals the batch
    // gate and no pair names a purged vector
    VectorOps.deleteFromIvfPq(spark, idx,
      emb.filter(col("vec_id") % 2 === 0 && col("vec_id") % 3 === 0)
        .select(col("vec_id")), "vec_id")
    val gotDel = StreamingOps.streamSemanticGate(spark, wavePath, idx,
      "embedding", "vec_id", "wvec", "wid", threshold = 0.3, nprobe = 4)
    val wantDel = VectorOps.ivfSemanticGate(spark.read.parquet(wavePath),
      "wvec", "wid", idx, "embedding", "vec_id", 0.3, nprobe = 4)
    assert(gotDel.exceptAll(wantDel).isEmpty && wantDel.exceptAll(gotDel).isEmpty,
      "stream != batch on the tombstoned layout")
    assert(gotDel.filter(col("vec_id") % 3 === 0).count() === 0L,
      "a tombstoned vector surfaced through the stream gate")
    // restore the undeleted layout for the escape check below
    emb.filter(col("vec_id") % 2 === 0).writeIvfPq(idx, "embedding",
      "vec_id", nlist = 8, m = 4, ksub = 4, iters = 2)
    // exhaustive escape: nprobe = nlist equals the brute threshold join
    val all = VectorOps.ivfSemanticGate(spark.read.parquet(wavePath),
      "wvec", "wid", idx, "embedding", "vec_id", 0.3, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = spark.read.parquet(wavePath).crossJoin(
        emb.filter(col("vec_id") % 2 === 0))
      .withColumn("cos",
        graft.functions.cosineSimilarity(col("wvec"), col("embedding")))
      .filter(col("cos") >= 0.3)
      .select(col("wid"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all === brute)
  }

  test("streaming ANN join equals the batch wave join; tombstoned " +
    "vectors never surface") {
    import graft.operators.VectorOps
    import graft.operators.VectorOps._
    val emb = graft.Tables.embeddings(spark, sf())
    val idx = java.nio.file.Files
      .createTempDirectory("graft_staj_spec_idx").toString
    emb.filter(col("vec_id") % 2 === 0).writeIvfPq(idx, "embedding",
      "vec_id", nlist = 8, m = 4, ksub = 4, iters = 2)
    VectorOps.deleteFromIvfPq(spark, idx,
      emb.filter(col("vec_id") % 10 === 0).select(col("vec_id")), "vec_id")
    val outPath = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_staj_spec_out").toString
    graft.operators.DedupOps.deleteDir(spark, outPath)
    // a GENUINE multi-batch stream: the wave lands as several parquet
    // part files and the operator reads one file per trigger, so
    // foreachBatch runs once per file
    val wave = emb.filter(col("vec_id") % 2 =!= 0)
      .select((col("vec_id") + 1000000L).as("wid"),
        col("embedding").as("wvec"))
    val flatWave = java.nio.file.Files
      .createTempDirectory("graft_staj_spec_flat").toString
    wave.repartition(3).write.mode("overwrite").parquet(flatWave)
    val got = StreamingOps.streamAnnJoin(spark, flatWave, idx, "wvec",
        "wid", "embedding", "vec_id", k = 3, outPath, nprobe = 4,
        refine = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    val want = VectorOps.readIvfPqTopKJoin(spark.read.parquet(flatWave),
        "wvec", "wid", idx, "embedding", "vec_id", k = 3, nprobe = 4,
        refine = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    assert(got === want && got.nonEmpty,
      "streamed per-arrival top-k != the batch wave join")
    // no tombstoned neighbor ever surfaced
    assert(!got.exists(_._2 % 10 == 0),
      "a tombstoned vector surfaced in the streamed top-k")
  }

  test("streaming minhash gate equals the batch index gate per pair") {
    import graft.operators.DedupOps._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stmh_spec").toString
    val wavePath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stmh_spec_wave").toString
    val docs = Tables.documents(spark, sf())
    docs.filter(col("doc_id") % 2 === 0).writeMinhashIndex(path, "doc_id", "text")
    docs.filter(col("doc_id") % 2 =!= 0).select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(wavePath)
    val got = StreamingOps.streamMinhashGate(spark, wavePath, path,
      threshold = 0.3)
    val want = docs.filter(col("doc_id") % 2 =!= 0)
      .minHashPairsAgainstIndex(path, "doc_id", "text", threshold = 0.3)
      .select(col("id_new").as("doc_id"), col("id_corpus"), col("jaccard"))
    assert(got.count() > 0, "gate flagged no pairs — fixture broke")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    val arrivals = docs.filter(col("doc_id") % 2 =!= 0).count()
    assert(got.select("doc_id").distinct().count() < arrivals,
      "every arrival near-dup'd the corpus — planted-dup fixture broke")
    // tombstones reach the stream: after a corpus delete the stream
    // equals the batch gate on the tombstoned layout, and no pair
    // names a deleted corpus doc
    graft.operators.DedupOps.deleteFromMinhashIndex(spark, path,
      docs.filter(col("doc_id") % 2 === 0 && col("doc_id") % 3 === 0)
        .select(col("doc_id")))
    val gotDel = StreamingOps.streamMinhashGate(spark, wavePath, path,
      threshold = 0.3)
    val wantDel = docs.filter(col("doc_id") % 2 =!= 0)
      .minHashPairsAgainstIndex(path, "doc_id", "text", threshold = 0.3)
      .select(col("id_new").as("doc_id"), col("id_corpus"), col("jaccard"))
    assert(gotDel.exceptAll(wantDel).isEmpty && wantDel.exceptAll(gotDel).isEmpty,
      "stream != batch on the tombstoned layout")
    assert(gotDel.filter(col("id_corpus") % 3 === 0).count() === 0L,
      "a tombstoned corpus doc surfaced as a pair")
  }

  test("streaming digest admit gate equals the batch admit on the same layout") {
    import graft.operators.DedupOps._
    val idx = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stdg_spec_idx").toString
    val wavePath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stdg_spec_wave").toString
    val docs = Tables.documents(spark, sf())
    docs.writeDigestIndex(idx, "doc_id", "text")
    val wave = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" NOVEL")).as("text")))
    wave.write.mode("overwrite").parquet(wavePath)
    val got = StreamingOps.streamDigestGate(spark, wavePath, idx)
    val want = spark.read.parquet(wavePath)
      .admitAgainstDigestIndex(idx, "doc_id", "text")
    assert(got.count() > 0, "gate admitted nothing — fixture broke")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // tombstones reach the stream: after deleting part of the corpus
    // the SAME stream admits what the batch admit over the tombstoned
    // layout admits — and strictly more than before (a deleted doc
    // blocks nothing)
    graft.operators.DedupOps.deleteFromDigestIndex(spark, idx,
      docs.filter(col("doc_id") % 3 === 0).select(col("doc_id")))
    val gotDel = StreamingOps.streamDigestGate(spark, wavePath, idx)
    val wantDel = spark.read.parquet(wavePath)
      .admitAgainstDigestIndex(idx, "doc_id", "text")
    assert(gotDel.exceptAll(wantDel).isEmpty && wantDel.exceptAll(gotDel).isEmpty,
      "stream != batch on the tombstoned layout")
    assert(gotDel.count() > got.count(),
      "deleting corpus docs must admit MORE of the wave")
    // true duplicates are blocked: admitted is a strict subset
    assert(got.count() < wave.count(),
      "every arrival was admitted — planted-dup fixture broke")
  }

  test("streaming CDC-index gate equals the batch layout gate per arrival") {
    import graft.operators.DedupOps._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stcdc_spec").toString
    val wavePath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stcdc_spec_wave").toString
    val docs = Tables.documents(spark, sf())
    docs.filter(col("doc_id") % 2 === 0).writeCdcIndex(path, "doc_id", "text")
    docs.filter(col("doc_id") % 2 =!= 0).select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(wavePath)
    val got = StreamingOps.streamCdcIndexGate(spark, wavePath, path)
      .select(col("doc_id"), col("matched_corpus_docs").cast("long"),
        col("shared_chunks").cast("long"))
    val want = docs.filter(col("doc_id") % 2 =!= 0)
      .cdcPairsAgainstIndex(path, "doc_id", "text", minShared = 1)
      .groupBy(col("id_new").as("doc_id"))
      .agg(count(lit(1)).as("matched_corpus_docs"),
        sum(col("shared_chunks")).as("shared_chunks"))
    assert(got.count() > 0, "gate flagged no documents — fixture broke")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // tombstones reach the stream: post-delete the stream equals the
    // batch gate on the tombstoned layout
    graft.operators.DedupOps.deleteFromCdcIndex(spark, path,
      docs.filter(col("doc_id") % 2 === 0 && col("doc_id") % 3 === 0)
        .select(col("doc_id")))
    val gotDel = StreamingOps.streamCdcIndexGate(spark, wavePath, path)
      .select(col("doc_id"), col("matched_corpus_docs").cast("long"),
        col("shared_chunks").cast("long"))
    val wantDel = docs.filter(col("doc_id") % 2 =!= 0)
      .cdcPairsAgainstIndex(path, "doc_id", "text", minShared = 1)
      .groupBy(col("id_new").as("doc_id"))
      .agg(count(lit(1)).as("matched_corpus_docs"),
        sum(col("shared_chunks")).as("shared_chunks"))
    assert(gotDel.exceptAll(wantDel).isEmpty && wantDel.exceptAll(gotDel).isEmpty,
      "stream != batch on the tombstoned layout")
    // clean arrivals stay silent: flagged must be a strict subset
    val arrivals = docs.filter(col("doc_id") % 2 =!= 0).count()
    assert(got.count() < arrivals,
      "every arrival matched the corpus — planted-dup fixture broke")
  }

  test("sessionize carries open sessions across micro-batches, emits closed only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, tMs: Long, uid: Long, v: Double) =
      Event(id, new java.sql.Timestamp(tMs), uid, "click", v)
    val input = MemoryStream[Event]
    // idleTimeout=false: processAllAvailable livelocks on the no-data
    // micro-batches that pending processing-time timers cause; the
    // timeout branch is unit-tested below with TestGroupState instead
    val q = sessionize(input.toDS(), gapMs = 5000, idleTimeout = false)
      .writeStream.outputMode("append").format("memory").queryName("sess").start()
    def emitted(): Set[(Long, Long, Long, Int, Double)] =
      spark.table("sess").as[UserSession].collect()
        .map(s => (s.user_id, s.start_ms, s.end_ms, s.n_events, s.total_value)).toSet
    try {
      // batch 1: user 1 opens a session, user 2 opens a session
      input.addData(ev(1, 1000, 1, 1.0), ev(2, 2000, 1, 2.0), ev(4, 1500, 2, 4.0))
      q.processAllAvailable()
      assert(emitted() === Set.empty, "open sessions must not be emitted")

      // batch 2: within the gap — must EXTEND user 1's carried session,
      // not start a new one (the cross-batch split bug)
      input.addData(ev(3, 4000, 1, 3.0))
      q.processAllAvailable()
      assert(emitted() === Set.empty)

      // batch 3: both users jump past the gap — the carried sessions
      // close whole: user 1's spans all three batches as ONE session
      input.addData(ev(5, 60000, 1, 5.0), ev(6, 60000, 2, 6.0))
      q.processAllAvailable()
      assert(emitted() === Set(
        (1L, 1000L, 4000L, 3, 6.0),
        (2L, 1500L, 1500L, 1, 4.0)))
    } finally q.stop()
  }

  test("sessionStep timeout branch flushes and clears the carried session") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val open = SessionState(1000L, 4000L, 3,
      java.math.BigDecimal.valueOf(6.0).setScale(6))
    val timedOut = TestGroupState.create[SessionState](
      optionalState = org.apache.spark.api.java.Optional.of(open),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 100000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = true)
    val out = StreamingOps.sessionStep(5000L, idleTimeout = true)(
      7L, Iterator.empty, timedOut).toList
    assert(out === List(UserSession(7L, 1000L, 4000L, 3, 6.0)))
    assert(timedOut.isRemoved, "flushed state must be cleared")

    // non-timeout step arms the idle timer and carries the open session
    val fresh = TestGroupState.create[SessionState](
      optionalState = org.apache.spark.api.java.Optional.empty[SessionState](),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 100000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    def ev(id: Long, tMs: Long, v: Double) =
      Event(id, new java.sql.Timestamp(tMs), 7L, "click", v)
    val emitted = StreamingOps.sessionStep(5000L, idleTimeout = true)(
      7L, Iterator(ev(1, 1000, 1.0), ev(2, 20000, 2.0)), fresh).toList
    assert(emitted.map(s => (s.start_ms, s.end_ms, s.n_events)) === List((1000L, 1000L, 1)))
    assert(fresh.get === SessionState(20000L, 20000L, 1,
      java.math.BigDecimal.valueOf(2.0).setScale(6)))
    assert(fresh.getTimeoutTimestampMs.isPresent,
      "open session must arm the idle timeout")
  }

  test("file-stream sessionization equals SQL gaps-and-islands") {
    val got = StreamingOps.sessionizeBatchEquivalent(spark, sf(), gapMs = 14400000L).toDF()
    Tables.events(spark, sf()).createOrReplaceTempView("ev_sess")
    val want = spark.sql(
      """SELECT user_id, MIN(t) AS start_ms, MAX(t) AS end_ms,
        |  CAST(COUNT(*) AS INT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM (
        |  SELECT user_id, t, value,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM (
        |    SELECT user_id, event_id, unix_millis(ts) AS t, value,
        |      CASE WHEN unix_millis(ts) - LAG(unix_millis(ts)) OVER (
        |             PARTITION BY user_id ORDER BY unix_millis(ts), event_id) > 14400000
        |           THEN 1 ELSE 0 END AS is_new
        |    FROM ev_sess) f) s
        |GROUP BY user_id, sid""".stripMargin)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("native session_window stream equals the custom sessionizer and the SQL oracle") {
    val native = StreamingOps.sessionizeNativeBatchEquivalent(spark, sf(), gapMs = 14400000L)
    val custom = StreamingOps.sessionizeBatchEquivalent(spark, sf(), gapMs = 14400000L).toDF()
    assert(native.count() > 0)
    assert(native.exceptAll(custom).isEmpty && custom.exceptAll(native).isEmpty)
  }

  test("watermark drops late data and finalizes windows exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, hourFrac: Double, v: Double) =
      Event(id, new java.sql.Timestamp((hourFrac * 3600 * 1000).toLong), 1L, "click", v)
    val input = MemoryStream[Event]
    val q = hourlyEventStats(input.toDS().toDF(), watermark = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("wm").start()
    try {
      // batch 1: events at 00:10 and 03:10 -> watermark advances to 02:10,
      // so window [00:00, 01:00) finalizes with exactly one event
      input.addData(ev(1, 0.17, 1.0), ev(2, 3.17, 2.0))
      q.processAllAvailable()
      // batch 2: a LATE event at 00:20 (behind the watermark -> dropped)
      // and one at 05:10 -> [03:00, 04:00) finalizes WITHOUT the late row
      input.addData(ev(3, 0.33, 100.0), ev(4, 5.17, 4.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("wm").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    // hour 0 window: count 1, total 1.0 — the late 100.0 never lands
    assert(rows.contains((0L, 1L, 1.0)), s"got $rows")
    assert(rows.contains((3L * 3600000, 1L, 2.0)), s"got $rows")
    assert(!rows.exists(_._3 == 101.0), s"late row was not dropped: $rows")
  }

  test("spatial predicates compose over streams (stateless filters)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double, Double)]
    input.addData((1L, 1.0, 1.0), (2L, 5.0, 5.0), (3L, 20.0, 20.0))
    import graft.operators.SpatialOps._
    val out = input.toDS().toDF("id", "x", "y")
      .boxRange(Seq("x", "y"), Seq(0.0, 0.0), Seq(10.0, 10.0))
      .writeStream.outputMode("append").format("memory").queryName("spst").start()
    out.processAllAvailable(); out.stop()
    assert(spark.table("spst").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("streaming geo join: multi-batch arrivals against the at-rest layout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // layout = the supplier points; stream = customer points in 3
    // genuine micro-batches; union of emissions must equal the batch
    // distance join (and each batch pays only its own arrivals)
    val cust = graft.Tables.customerPts(spark, sf())
    val supp = graft.Tables.supplierPts(spark, sf())
    val layout = java.nio.file.Files.createTempDirectory("graft_geo_spec").toString
    graft.index.SpatialDisk.write(supp, layout, Seq("sx", "sy"), cellBits = 4)
    val statics = graft.index.SpatialDisk.joinTable(spark, layout, "__gc")
    val rows = cust.select("c_custkey", "cx", "cy").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val input = MemoryStream[(Long, Double, Double)]
    val stream = input.toDS().toDF("c_custkey", "cx", "cy")
    val q = graft.index.SpatialDisk
      .withQueryCells(stream, Seq("cx", "cy"), layout, 100.0, "__gc")
      .join(statics, Seq("__gc"))
      .filter(graft.functions.pointDistance(
        Seq(col("cx"), col("cy")), Seq(col("sx"), col("sy"))) <= 100.0)
      .select(col("c_custkey"), col("s_suppkey"))
      .writeStream.outputMode("append").format("memory")
      .queryName("geojoin").start()
    val thirds = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
    thirds.foreach { batch => input.addData(batch.toIndexedSeq); q.processAllAvailable() }
    q.stop()
    import graft.operators.SpatialOps._
    val want = cust.distanceJoinNaive(supp, Seq("cx", "cy"), Seq("sx", "sy"), 100.0)
      .select("c_custkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val got = spark.table("geojoin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === want && got.nonEmpty)
  }

  test("streaming geo join == batch on a TOMBSTONED layout (delete parity)") {
    // the r12 delete-parity discipline reaches the spatial family: a
    // GDPR purge on the layout and the live stream must answer exactly
    // like the batch join over the SURVIVORS — the static side rides
    // the same token-checked tombstone anti-join every batch read does
    val cust = graft.Tables.customerPts(spark, sf())
    val supp = graft.Tables.supplierPts(spark, sf())
    val layout = java.nio.file.Files
      .createTempDirectory("graft_geo_del_spec").toString
    graft.index.SpatialDisk.write(supp, layout, Seq("sx", "sy"), cellBits = 4)
    graft.index.SpatialDisk.delete(spark, layout,
      supp.filter(col("s_suppkey") % 3 === 0).select("s_suppkey"),
      "s_suppkey")
    // a LOCATED wave on top of the ids-only one: the stream must
    // subtract both tombstone kinds through the same read chokepoint
    graft.index.SpatialDisk.deleteAt(spark, layout,
      supp.filter(col("s_suppkey") % 3 =!= 0 && col("s_suppkey") % 5 === 0)
        .select("s_suppkey", "sx", "sy"),
      "s_suppkey")
    val wavePath = java.nio.file.Files
      .createTempDirectory("graft_geo_del_wave").toString
    cust.write.mode("overwrite").parquet(wavePath)
    val got = StreamingOps.streamSpatialJoin(spark, wavePath, layout,
        Seq("cx", "cy"), radius = 100.0)
      .select("c_custkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    import graft.operators.SpatialOps._
    val want = cust.distanceJoinNaive(
        supp.filter(col("s_suppkey") % 3 =!= 0 &&
          !(col("s_suppkey") % 5 === 0)),
        Seq("cx", "cy"), Seq("sx", "sy"), 100.0)
      .select("c_custkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === want && got.nonEmpty,
      "stream over the tombstoned layout != batch join over survivors")
  }

  test("dropDuplicatesWithinWatermark bounds dedup state by event time") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, tMs: Long) =
      Event(id, new java.sql.Timestamp(tMs), 1L, "click", 1.0)
    val input = MemoryStream[Event]
    val q = input.toDS().toDF()
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode("append").format("memory").queryName("wmdd").start()
    try {
      input.addData(ev(1, 1000), ev(1, 2000), ev(2, 3000)) // dup of 1 within window
      q.processAllAvailable()
      input.addData(ev(3, 61000)) // advances watermark to 51s -> id-1 state evicted
      q.processAllAvailable()
      input.addData(ev(1, 70000)) // id 1 again, state long gone -> re-admitted
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("wmdd").collect().map(_.getLong(0))
    // in-window duplicate suppressed; the far-later duplicate re-admitted
    // (state for id 1 was evicted once the watermark passed) — that
    // re-admission is exactly the bounded-state contract
    assert(ids.count(_ == 1L) === 2, s"got ${ids.toSeq}")
    assert(ids.count(_ == 2L) === 1 && ids.count(_ == 3L) === 1)
  }

  test("stateless library expressions compose over streams") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    input.addData((1L, "the quick brown fox"), (2L, "der hund ist nicht da und"))
    val out = input.toDS().toDF("id", "text")
      .withColumn("lang", graft.functions.langId(col("text")))
      .withColumn("n_tokens", graft.functions.tokenCount(col("text")))
      .writeStream.outputMode("append").format("memory").queryName("txt").start()
    out.processAllAvailable(); out.stop()
    val rows = spark.table("txt").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    assert(rows === Set((1L, "en", 4L), (2L, "de", 6L)))
  }

  test("streaming as-of backfill equals the batch as-of join row-for-row") {
    import graft.operators.TemporalOps._
    val got = StreamingOps.streamAsOf(spark, sf())
    val ev = Tables.events(spark, sf())
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    val want = clicks.asOfJoin(purchases, Seq("user_id"), Seq("user_id"),
        "ts", "p_ts", "p_event_id")
      .select("event_id", "user_id", "ts", "p_event_id", "p_ts", "p_value")
    assert(got.count() === want.count() && got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("stream-stream spatio-temporal join equals the batch grid join") {
    import graft.operators.SpatialOps._
    // wider radius/window than the oracle query so the pair set is rich
    val got = StreamingOps.streamSpatioTemporalJoin(spark, sf(),
        radius = 20.0, dtMillis = 1800000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.eventsPts(spark, sf())
    val rSide = ev.select(col("event_id").as("event_id2"),
      col("ts").as("ts2"), col("ex").as("ex2"), col("ey").as("ey2"))
    val want = ev.spatioTemporalJoin(rSide, Seq("ex", "ey"),
        Seq("ex2", "ey2"), "ts", "ts2", r = 20.0, dtMillis = 1800000L)
      .select("event_id", "event_id2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want && got.nonEmpty,
      s"stream-stream pairs diverge: missing=${(want -- got).take(5)} " +
        s"extra=${(got -- want).take(5)}")
  }

  test("splitAssign composes over a stream and agrees with the batch assignment") {
    import spark.implicits._
    import graft.operators.SampleOps._
    implicit val sqlCtx = spark.sqlContext
    // split assignment is a pure function of the id, so it is trivially
    // streamable — each arriving example gets the SAME split the batch
    // pipeline would give it (the property that lets an online ingest
    // path and an offline rebuild agree)
    val ids = (0L until 64L)
    val input = MemoryStream[Long]
    input.addData(ids: _*)
    val splits = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val out = input.toDS().toDF("doc_id").splitAssign("doc_id", splits)
      .writeStream.outputMode("append").format("memory").queryName("spl").start()
    out.processAllAvailable(); out.stop()
    val streamed = spark.table("spl").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = ids.toDF("doc_id").splitAssign("doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed === batch && streamed.values.toSet.size === 3)
  }

  test("importance scoring composes over a stream against a frozen ratio fit") {
    import spark.implicits._
    import graft.operators.CorpusOps._
    implicit val sqlCtx = spark.sqlContext
    // periodic-refit / online-score: ratios fit once on a batch
    // snapshot; each micro-batch scores statelessly via foreachBatch
    // (per-doc aggregation needs only the doc's own row), landing the
    // SAME weights the batch path gives
    val corpus = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta gamma gamma", true),
      (3L, "omega omega psi psi", false),
      (4L, "alpha beta alpha gamma", false)).toDF("doc_id", "text", "is_t")
    val ratios = corpus.importanceRatios("text", col("is_t")).cache()
    val arriving = Seq((10L, "alpha beta omega"), (11L, "gamma gamma"),
      (12L, "psi alpha"), (13L, "zzz"))
    val input = MemoryStream[(Long, String)]
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.scoreWithRatios(ratios, "doc_id", "text").collect()
          .foreach(r => sink.add((r.getLong(0), r.getLong(1), r.getDouble(2))))
        ()
      }.start()
    input.addData(arriving.take(2): _*); q.processAllAvailable()
    input.addData(arriving.drop(2): _*); q.processAllAvailable()
    q.stop()
    val streamed = sink.toArray(Array.empty[(Long, Long, Double)]).sortBy(_._1).toSeq
    val batch = arriving.toDF("doc_id", "text")
      .scoreWithRatios(ratios, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(streamed === batch)
    assert(streamed.find(_._1 == 13L).get._3 === 0.0) // all-OOV doc
  }

  test("k-means assignment composes over a stream and agrees with the batch clustering") {
    import spark.implicits._
    import graft.operators.VectorOps._
    implicit val sqlCtx = spark.sqlContext
    // the periodic-retrain / online-assign split: centroids train on a
    // batch snapshot; assignment is a stateless codegen'd projection,
    // so arriving vectors land in the SAME cell the batch clustering
    // gives them (SemDeDup blocking at ingest time)
    val rng = new scala.util.Random(3)
    val rows = (0L until 80L).map(i => (i, Array.fill(8)(rng.nextGaussian().toFloat)))
    val batchDf = rows.toDF("vec_id", "embedding")
    val centers = batchDf.kmeansCenters("embedding", "vec_id", k = 4, iters = 2)
    val input = MemoryStream[(Long, Array[Float])]
    input.addData(rows: _*)
    val out = input.toDS().toDF("vec_id", "embedding")
      .assignClusters("embedding", "vec_id", centers)
      .writeStream.outputMode("append").format("memory").queryName("kmstream").start()
    out.processAllAvailable(); out.stop()
    val streamed = spark.table("kmstream").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = batchDf.kmeansAssign("embedding", "vec_id", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamed === batch && streamed.values.toSet.size > 1)
  }

  test("streamSpanGate equals the batch span sweep; overlap is redacted") {
    val got = StreamingOps.streamSpanGate(spark, sf(), n = 8)
    val docs = Tables.documents(spark, sf())
    val want = graft.operators.DedupOps.decontaminateSpans(
      docs.filter(col("doc_id") % 7 =!= 0).select(col("doc_id"), col("text")),
      docs.filter(col("doc_id") % 7 === 0),
      "doc_id", "text", "text", n = 8)
    assert(got.count() > 0, "gate passed no documents — fixture broke")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the gate actually redacts: eval-shared 8-gram windows exist
    val removed = got.agg(sum(col("n_removed"))).head().getLong(0)
    assert(removed > 0, "gate removed nothing — overlap fixture broke")
  }

  test("streamPhraseGate equals the batch boolean containment; " +
    "malformed queries refused") {
    val q = Seq(Seq(Seq("the", "spark"), Seq("hash", "join")),
      Seq(Seq("big", "table"), Seq("customer")))
    val got = StreamingOps.streamPhraseGate(spark, sf(), q)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val docs = Tables.documents(spark, sf())
    val toks = graft.functions.tokens(col("text"))
    val padded = concat(lit(" "), array_join(toks, " "), lit(" "))
    val want = docs.filter(
        (padded.contains(" the spark ") || padded.contains(" hash join ")) &&
        (padded.contains(" big table ") || padded.contains(" customer ")))
      .select(col("doc_id"),
        graft.functions.tokenCount(col("text")).as("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === want && got.nonEmpty,
      "streamed phrase gate != batch containment")
    intercept[IllegalArgumentException] {
      StreamingOps.streamPhraseGate(spark, sf(), Seq(Seq(Seq("two words"))))
    }
  }

  test("streamBm25QueryJoin equals the batch query-join bit-for-bit " +
    "across micro-batches; empty wave answers the contract schema") {
    import spark.implicits._
    import graft.operators.CorpusOps
    import graft.operators.CorpusOps._
    val tmp = System.getProperty("java.io.tmpdir")
    val idx = new java.io.File(tmp, "graft_stqj_spec_idx").toString
    val wave = new java.io.File(tmp, "graft_stqj_spec_wave").toString
    val out = new java.io.File(tmp, "graft_stqj_spec_out").toString
    graft.operators.DedupOps.deleteDir(spark, wave)
    graft.operators.DedupOps.deleteDir(spark, out)
    Tables.documents(spark, sf()).writeBm25Index(idx, "doc_id", "text")
    val q12 = Seq((1L, "spark"), (1L, "vector"), (2L, "customer"),
      (2L, "hash"))
    val q3 = Seq((3L, "merge"), (3L, "zzz_not_a_token"))
    // two wave files -> two micro-batches (queries atomic per file)
    q12.toDF("qid", "term").repartition(1)
      .write.mode("append").parquet(wave)
    q3.toDF("qid", "term").repartition(1)
      .write.mode("append").parquet(wave)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq.sorted
    val streamed = rows(StreamingOps.streamBm25QueryJoin(spark, wave, idx,
      "qid", "term", k = 5, out))
    val batch = rows(CorpusOps.bm25TopKJoinAgainstIndex(spark, idx,
      (q12 ++ q3).toDF("qid", "term"), "qid", "term", 5))
    assert(streamed === batch && streamed.nonEmpty,
      "streamed query-set retrieval != batch query join")
    // an empty wave yields the contract schema, not a missing-path error
    val emptyWave = new java.io.File(tmp, "graft_stqj_spec_empty").toString
    val emptyOut = new java.io.File(tmp, "graft_stqj_spec_eout").toString
    graft.operators.DedupOps.deleteDir(spark, emptyOut)
    Seq.empty[(Long, String)].toDF("qid", "term")
      .write.mode("overwrite").parquet(emptyWave)
    val empty = StreamingOps.streamBm25QueryJoin(spark, emptyWave, idx,
      "qid", "term", k = 5, emptyOut)
    assert(empty.isEmpty && empty.columns.toSeq ===
      Seq("qid", "doc_id", "dl", "score"))
  }

  test("query-set streams fail LOUDLY when a query's rows span wave files") {
    import spark.implicits._
    val tmp = System.getProperty("java.io.tmpdir")
    val idx = new java.io.File(tmp, "graft_stqj_spec_idx").toString
    val wave = new java.io.File(tmp, "graft_stqj_split_wave").toString
    val out = new java.io.File(tmp, "graft_stqj_split_out").toString
    graft.operators.DedupOps.deleteDir(spark, wave)
    graft.operators.DedupOps.deleteDir(spark, out)
    // qid 1 deliberately TORN across two wave files: fragment scores
    // are not mergeable, so the wave-atomicity guard must kill the
    // stream instead of silently emitting two fragment top-ks
    Seq((1L, "spark"), (2L, "customer")).toDF("qid", "term")
      .repartition(1).write.mode("append").parquet(wave)
    Seq((1L, "vector")).toDF("qid", "term")
      .repartition(1).write.mode("append").parquet(wave)
    val e = intercept[Exception] {
      StreamingOps.streamBm25QueryJoin(spark, wave, idx, "qid", "term",
        k = 5, out)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("split across wave files")),
      s"expected the wave-atomicity guard, got: ${messages(e).mkString(" | ")}")
  }

  test("streamHybridQueryJoin equals the batch hybrid query-join bit-for-bit " +
    "across micro-batches") {
    import spark.implicits._
    import graft.operators.CorpusOps
    import graft.operators.CorpusOps._
    import graft.operators.VectorOps._
    val tmp = System.getProperty("java.io.tmpdir")
    val bm = new java.io.File(tmp, "graft_sthyb_spec_bm").toString
    val ivf = new java.io.File(tmp, "graft_sthyb_spec_ivf").toString
    val wave = new java.io.File(tmp, "graft_sthyb_spec_wave").toString
    val out = new java.io.File(tmp, "graft_sthyb_spec_out").toString
    graft.operators.DedupOps.deleteDir(spark, wave)
    graft.operators.DedupOps.deleteDir(spark, out)
    Tables.documents(spark, sf()).writeBm25Index(bm, "doc_id", "text")
    Tables.embeddings(spark, sf()).writeIvfPq(ivf, "embedding", "vec_id",
      nlist = 8, m = 4, ksub = 4, iters = 2)
    val vecs = Tables.embeddings(spark, sf()).filter(col("vec_id") < 3)
      .select((col("vec_id") + 1L).as("qid"), col("embedding").as("qv"))
    val q12 = Seq((1L, "spark"), (1L, "vector"), (2L, "customer"),
      (2L, "hash"))
    val q3 = Seq((3L, "merge"), (3L, "scan"))
    q12.toDF("qid", "term").join(vecs, Seq("qid")).repartition(1)
      .write.mode("append").parquet(wave)
    q3.toDF("qid", "term").join(vecs, Seq("qid")).repartition(1)
      .write.mode("append").parquet(wave)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq.sorted
    val streamed = rows(StreamingOps.streamHybridQueryJoin(spark, wave,
      bm, ivf, "qid", "term", "qv", "vec_id", "embedding",
      candidates = 10, k = 3, out))
    val batch = rows(CorpusOps.hybridTopKJoinAgainstIndex(spark, bm, ivf,
      (q12 ++ q3).toDF("qid", "term"), vecs, "qid", "term", "qv",
      "vec_id", "embedding", candidates = 10, k = 3))
    assert(streamed === batch && streamed.nonEmpty,
      "streamed hybrid query-set retrieval != batch hybrid query join")
  }

  test("streamed PCA projection equals the batch projection bit-for-bit") {
    import spark.implicits._
    import graft.operators.VectorOps._
    implicit val sqlCtx = spark.sqlContext
    // the train-offline / score-online split: the direction trains on a
    // batch snapshot; projectOnto is a stateless shuffle-free fold, so
    // arriving vectors score identically to the batch pass
    val rng = new scala.util.Random(11)
    val rows = (0L until 60L).map(i => (i, Array.fill(6)(rng.nextGaussian().toFloat)))
    val batchDf = rows.toDF("vec_id", "embedding")
    val dir = batchDf.principalDirection("embedding")
    val input = MemoryStream[(Long, Array[Float])]
    input.addData(rows: _*)
    val out = input.toDS().toDF("vec_id", "embedding")
      .projectOnto("embedding", "vec_id", dir)
      .writeStream.outputMode("append").format("memory").queryName("pcstream").start()
    out.processAllAvailable(); out.stop()
    val streamed = spark.table("pcstream").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = batchDf.projectOnto("embedding", "vec_id", dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed === batch && streamed.nonEmpty)
  }
}
