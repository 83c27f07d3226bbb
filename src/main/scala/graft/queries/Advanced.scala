package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.index.IndexManager
import graft.multimodal.Multimodal
import graft.operators.VectorOps._
import graft.streaming.StreamingOps

/** Index-backed, streaming, and multimodal queries.
  *
  * The indexed spatial queries reuse the *same DuckDB oracles* as their
  * unindexed twins (Spatial.oracles) — index-on/index-off result equality
  * is exactly the reference's correctness contract for IndexedRelationScan.
  */
object Advanced {

  private def custIndex(s: SparkSession, d: String) =
    IndexManager.indexTable(s, customerPts(s, d), s"customer_pts:$d",
      Seq("cx", "cy"), numPartitions = 16)

  def boxRangeIndexed(s: SparkSession, d: String): DataFrame =
    custIndex(s, d).boxRange(Array(2000.0, 100.0), Array(4000.0, 300.0))
      .orderBy(col("c_custkey"))

  def circleRangeIndexed(s: SparkSession, d: String): DataFrame =
    custIndex(s, d).circleRange(Array(5000.0, 500.0), 500.0)
      .orderBy(col("c_custkey"))

  def knnIndexed(s: SparkSession, d: String): DataFrame =
    custIndex(s, d).knn(Array(5000.0, 500.0), 10, tieBreak = Seq("c_custkey"))
      .orderBy(col("c_custkey"))

  private def custQuadIndex(s: SparkSession, d: String) =
    IndexManager.quadTreeIndexTable(s, customerPts(s, d), s"customer_qt:$d",
      Seq("cx", "cy"), numPartitions = 16)

  /** Same probes as the z-indexed twins, answered through the quadtree
    * index (multi-interval leaf pruning) — and the same oracles: index
    * kind must never change results. */
  def quadTreeRangeQ(s: SparkSession, d: String): DataFrame =
    custQuadIndex(s, d).boxRange(Array(2000.0, 100.0), Array(4000.0, 300.0))
      .orderBy(col("c_custkey"))

  def quadTreeKnnQ(s: SparkSession, d: String): DataFrame =
    custQuadIndex(s, d).knn(Array(5000.0, 500.0), 10, tieBreak = Seq("c_custkey"))
      .orderBy(col("c_custkey"))

  /** Typed-Dataset class inference (reference
    * examples/SpatialClassInference.scala:29-40): the same box probe as
    * sp_box_range, but through a `Dataset[CustPointRow]` whose Point-UDT
    * column is queried by name — same oracle, because the surface must
    * never change results. */
  def pointUdtRangeQ(s: SparkSession, d: String): DataFrame = {
    graft.spatial.SpatialUDT.register()
    import s.implicits._
    import graft.operators.SpatialOps._
    customerPts(s, d).as[(Long, Double, Double)]
      .map { case (id, x, y) => CustPointRow(id, x, y, graft.spatial.Point(Array(x, y))) }
      .range("p", Array(2000.0, 100.0), Array(4000.0, 300.0))
      .select(col("c_custkey"), col("cx"), col("cy"))
      .orderBy(col("c_custkey"))
  }

  def eventsHourlyStream(s: SparkSession, d: String): DataFrame =
    StreamingOps.hourlyEventStatsBatchEquivalent(s, d)
      .orderBy(col("hour_ms"), col("event_type"))

  /** Stateful streaming sessionization (flatMapGroupsWithState) over the
    * events file stream; 4-hour inactivity gap ~ the median inter-event
    * gap of the generated data, so users split into many sessions. */
  def sessionsStream(s: SparkSession, d: String): DataFrame =
    StreamingOps.sessionizeBatchEquivalent(s, d, gapMs = 14400000L).toDF()
      .orderBy(col("user_id"), col("start_ms"))

  /** The same sessionization on Spark's native `session_window` (engine-
    * managed state + watermark finalization) — both sessionizers answer
    * to the ONE gaps-and-islands oracle. */
  def sessionsNativeStream(s: SparkSession, d: String): DataFrame =
    StreamingOps.sessionizeNativeBatchEquivalent(s, d, gapMs = 14400000L)
      .orderBy(col("user_id"), col("start_ms"))

  /** Streaming exact dedup (dropDuplicates state over a file stream). */
  def streamDedup(s: SparkSession, d: String): DataFrame =
    StreamingOps.streamDedupCounts(s, d).orderBy(col("lang"))

  /** Streaming decontamination gate: corpus docs stream through a
    * stream-static semi join against the static eval-set grams, with a
    * stateful per-doc matched-gram count — the batch contamination
    * sweep aggregated over the eval side, run on a genuine stream. */
  def streamContamination(s: SparkSession, d: String): DataFrame =
    StreamingOps.streamContaminationCounts(s, d, n = 8).orderBy(col("doc_id"))

  /** Streaming repeated-passage gate: odd-doc arrivals stream through a
    * stream-static anti join against the even-doc corpus's passage
    * digests and reassemble from surviving passages — the incremental
    * shard-vs-corpus twin of pp_passage_dedup. */
  def streamPassageGateQ(s: SparkSession, d: String): DataFrame = {
    // the even/odd corpus-vs-wave split is the QUERY's fixture, not the
    // operator's: the gate takes staged wavePath + corpusPath (the
    // streamMinhashGate/streamDigestGate contract)
    val corpusPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stpg_corpus_" + Integer.toHexString(d.hashCode)).toString
    val wavePath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stpg_wave_" + Integer.toHexString(d.hashCode)).toString
    val docs = s.read.parquet(s"$d/documents.parquet")
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(corpusPath)
    docs.filter(col("doc_id") % 2 =!= 0)
      .write.mode("overwrite").parquet(wavePath)
    StreamingOps.streamPassageGate(s, wavePath, corpusPath, width = 20)
      .orderBy(col("doc_id"))
  }

  /** Streaming SEMANTIC gate: embedding arrivals stream against the
    * even-vector corpus's at-rest IVF-PQ layout — probe cells from the
    * stateless centroid fold, exact cosine over probed rows only. The
    * plan is ivfSemanticGate verbatim on a streaming source; the
    * verdict row pins stream-equals-batch per pair. */
  def streamSemanticGateQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.VectorOps
    import graft.operators.VectorOps._
    val idx = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stsg_idx_" + Integer.toHexString(d.hashCode)).toString
    val wavePath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stsg_wave_" + Integer.toHexString(d.hashCode)).toString
    val emb = s.read.parquet(s"$d/embeddings.parquet")
    emb.filter(col("vec_id") % 2 === 0).writeIvfPq(idx, "embedding",
      "vec_id", nlist = 8, m = 4, ksub = 4, iters = 2)
    emb.filter(col("vec_id") % 2 =!= 0)
      .select((col("vec_id") + 1000000L).as("wid"),
        col("embedding").as("wvec"))
      .write.mode("overwrite").parquet(wavePath)
    val stream = StreamingOps.streamSemanticGate(s, wavePath, idx,
      "embedding", "vec_id", "wvec", "wid", threshold = 0.3, nprobe = 4)
    val batch = VectorOps.ivfSemanticGate(s.read.parquet(wavePath),
      "wvec", "wid", idx, "embedding", "vec_id", 0.3, nprobe = 4)
    stream.select(col("wid"), col("vec_id"), col("cos").as("__cs"))
      .join(batch.select(col("wid"), col("vec_id"), col("cos").as("__cb")),
        Seq("wid", "vec_id"), "full_outer")
      .agg(
        (sum(when(col("__cs") === col("__cb"), 0).otherwise(1)) === 0)
          .as("stream_equals_batch"),
        (count(lit(1)) > 0).as("nonempty"))
  }

  /** Streaming ANN JOIN: a live embedding stream retrieves per-arrival
    * top-k from the at-rest IVF-PQ layout (per-micro-batch
    * readIvfPqTopKJoin, with a DELETE wave applied first so tombstoned
    * vectors never surface). Verdict row pins stream-equals-batch per
    * (arrival, neighbor, cos) on the same layout. */
  def streamAnnJoinQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.VectorOps
    import graft.operators.VectorOps._
    val tag = Integer.toHexString(d.hashCode)
    val idx = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_staj_idx_$tag").toString
    val wavePath = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_staj_wave_$tag").toString
    val outPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_staj_out_$tag").toString
    graft.operators.DedupOps.deleteDir(s, outPath)
    val emb = s.read.parquet(s"$d/embeddings.parquet")
    emb.filter(col("vec_id") % 2 === 0).writeIvfPq(idx, "embedding",
      "vec_id", nlist = 8, m = 4, ksub = 4, iters = 2)
    VectorOps.deleteFromIvfPq(s, idx,
      emb.filter(col("vec_id") % 10 === 0).select(col("vec_id")), "vec_id")
    emb.filter(col("vec_id") % 2 =!= 0)
      .select((col("vec_id") + 1000000L).as("wid"),
        col("embedding").as("wvec"))
      .write.mode("overwrite").parquet(wavePath)
    val stream = StreamingOps.streamAnnJoin(s, wavePath, idx, "wvec",
      "wid", "embedding", "vec_id", k = 3, outPath, nprobe = 4,
      refine = 20)
    val batch = VectorOps.readIvfPqTopKJoin(s.read.parquet(wavePath),
      "wvec", "wid", idx, "embedding", "vec_id", k = 3, nprobe = 4,
      refine = 20)
    stream.select(col("wid"), col("vec_id"), col("cos").as("__cs"))
      .join(batch.select(col("wid"), col("vec_id"), col("cos").as("__cb")),
        Seq("wid", "vec_id"), "full_outer")
      .agg(
        (sum(when(col("__cs") === col("__cb"), 0).otherwise(1)) === 0)
          .as("stream_equals_batch"),
        (count(lit(1)) > 0).as("nonempty"))
  }

  /** Streaming query-set BM25 retrieval: the SAME three queries as
    * `tx_bm25_query_join`, arriving as TWO wave files (queries 1-2,
    * then query 3) so the per-micro-batch handoff genuinely fires
    * twice; each batch runs the batch verb against the at-rest layout,
    * reading only its terms' posting slivers. Answers the batch verb's
    * REAL DuckDB oracle — per-query results are micro-batch invariant
    * by construction (queries staged atomically per file). */
  def streamBm25QueryJoinQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    import s.implicits._
    val tag = Integer.toHexString(d.hashCode)
    val idx = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_stqj_idx_$tag").toString
    val wavePath = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_stqj_wave_$tag").toString
    val outPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_stqj_out_$tag").toString
    graft.operators.DedupOps.deleteDir(s, wavePath)
    graft.operators.DedupOps.deleteDir(s, outPath)
    documents(s, d).writeBm25Index(idx, "doc_id", "text")
    // two waves, each query's term rows atomic within its file
    Seq((1L, "spark"), (1L, "vector"), (1L, "window"),
        (2L, "customer"), (2L, "hash")).toDF("qid", "term")
      .repartition(1).write.mode("append").parquet(wavePath)
    Seq((3L, "merge"), (3L, "zzz_not_a_token")).toDF("qid", "term")
      .repartition(1).write.mode("append").parquet(wavePath)
    StreamingOps.streamBm25QueryJoin(s, wavePath, idx, "qid", "term",
        k = 5, outPath)
      .orderBy(col("qid"), col("doc_id"))
  }

  /** Streaming query-set HYBRID retrieval against both at-rest layouts
    * (VERDICT r15 #3): the tx_hybrid_query_join fixture arrives as two
    * waves — qids 1-2 then qid 3 — each wave file carrying its
    * queries' (term, embedding) rows atomically; per micro-batch the
    * batch verb runs verbatim, so the drained union answers the batch
    * join's REAL oracle. */
  def streamHybridQueryJoinQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    import graft.operators.VectorOps._
    import s.implicits._
    val tag = Integer.toHexString(d.hashCode)
    val bmPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_sthyb_bm_$tag").toString
    val ivfPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_sthyb_ivf_$tag").toString
    val wavePath = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_sthyb_wave_$tag").toString
    val outPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_sthyb_out_$tag").toString
    graft.operators.DedupOps.deleteDir(s, wavePath)
    graft.operators.DedupOps.deleteDir(s, outPath)
    documents(s, d).writeBm25Index(bmPath, "doc_id", "text")
    embeddings(s, d).writeIvfPq(ivfPath, "embedding", "vec_id",
      nlist = 8, m = 4, ksub = 4, iters = 2)
    // the tx_hybrid_query_join query set, each query's rows atomic in
    // ONE wave file with its embedding riding every term row
    val vecs = embeddings(s, d).filter(col("vec_id") < 3)
      .select((col("vec_id") + 1L).as("qid"), col("embedding").as("qv"))
    Seq((1L, "spark"), (1L, "vector"), (1L, "window"),
        (2L, "customer"), (2L, "hash")).toDF("qid", "term")
      .join(vecs, Seq("qid"))
      .repartition(1).write.mode("append").parquet(wavePath)
    Seq((3L, "merge"), (3L, "scan")).toDF("qid", "term")
      .join(vecs, Seq("qid"))
      .repartition(1).write.mode("append").parquet(wavePath)
    StreamingOps.streamHybridQueryJoin(s, wavePath, bmPath, ivfPath,
        "qid", "term", "qv", "vec_id", "embedding",
        candidates = 20, k = 5, outPath)
      .orderBy(col("qid"), col("doc_id"))
  }

  /** Streaming minhash near-dup gate: odd-doc arrivals sign themselves
    * with the layout meta's banding and stream-static join the even-doc
    * corpus's at-rest buckets; candidate pairs exact-verify with
    * shingles read from the layout. Verdict row pins
    * stream-equals-batch on the same layout, per pair. */
  def streamMinhashGateQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.DedupOps._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stmh_idx_" + Integer.toHexString(d.hashCode)).toString
    val wavePath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stmh_wave_" + Integer.toHexString(d.hashCode)).toString
    val docs = s.read.parquet(s"$d/documents.parquet")
    docs.filter(col("doc_id") % 2 === 0).writeMinhashIndex(path, "doc_id", "text")
    // the odd-doc wave split is the QUERY's fixture, not the operator's:
    // the gate takes a staged wavePath (r11 verdict #3)
    docs.filter(col("doc_id") % 2 =!= 0).select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(wavePath)
    val stream = StreamingOps.streamMinhashGate(s, wavePath, path,
      threshold = 0.3)
    val batch = docs.filter(col("doc_id") % 2 =!= 0)
      .minHashPairsAgainstIndex(path, "doc_id", "text", threshold = 0.3)
      .select(col("id_new").as("doc_id"), col("id_corpus"),
        col("jaccard").as("__jb"))
    stream.select(col("doc_id"), col("id_corpus"), col("jaccard").as("__js"))
      .join(batch, Seq("doc_id", "id_corpus"), "full_outer")
      .agg(
        (sum(when(col("__js") === col("__jb"), 0).otherwise(1)) === 0)
          .as("stream_equals_batch"),
        (count(lit(1)) > 0).as("nonempty"))
  }

  /** Streaming digest ADMIT gate with a REAL oracle: the corpus digest
    * layout writes once, the dd_digest_gate wave arrives as a live
    * stream, and the admitted rows must equal DuckDB's NOT EXISTS over
    * raw text — the stateless crawl-ingest filter answering exact
    * reference semantics from the at-rest layout. */
  def streamDigestGateQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.DedupOps._
    val idx = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stdg_idx_" + Integer.toHexString(d.hashCode)).toString
    val wavePath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stdg_wave_" + Integer.toHexString(d.hashCode)).toString
    val docs = s.read.parquet(s"$d/documents.parquet")
    docs.writeDigestIndex(idx, "doc_id", "text")
    docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" NOVEL")).as("text")))
      .write.mode("overwrite").parquet(wavePath)
    StreamingOps.streamDigestGate(s, wavePath, idx)
      .select(col("doc_id"), length(col("text")).as("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Streaming CDC-index gate: odd-doc arrivals chunk themselves and
    * stream-static join the even-doc corpus's AT-REST chunk membership
    * layout. The verdict row asserts engine-side that the stream's
    * per-arrival (matched corpus docs, shared chunks) equals the batch
    * [[graft.operators.DedupOps.DatasetDedupOps.cdcPairsAgainstIndex]]
    * aggregated per arrival — the stream and batch read THE SAME
    * layout, so this is the streaming-equals-batch contract on the CDC
    * blocking key. */
  def streamCdcGateQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.DedupOps._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stcdc_idx_" + Integer.toHexString(d.hashCode)).toString
    val wavePath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_stcdc_wave_" + Integer.toHexString(d.hashCode)).toString
    val docs = s.read.parquet(s"$d/documents.parquet")
    docs.filter(col("doc_id") % 2 === 0).writeCdcIndex(path, "doc_id", "text")
    // the odd-doc wave split is the QUERY's fixture, not the operator's:
    // the gate takes a staged wavePath (r11 verdict #3)
    docs.filter(col("doc_id") % 2 =!= 0).select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(wavePath)
    val stream = StreamingOps.streamCdcIndexGate(s, wavePath, path)
    val batch = docs.filter(col("doc_id") % 2 =!= 0)
      .cdcPairsAgainstIndex(path, "doc_id", "text", minShared = 1)
      .groupBy(col("id_new").as("doc_id"))
      .agg(count(lit(1)).as("__m"), sum(col("shared_chunks")).as("__sc"))
    stream.select(col("doc_id"),
        col("matched_corpus_docs").cast("long").as("__ms"),
        col("shared_chunks").cast("long").as("__ss"))
      .join(batch, Seq("doc_id"), "full_outer")
      .agg(
        (sum(when(col("__ms") === col("__m") &&
          col("__ss") === col("__sc"), 0).otherwise(1)) === 0)
          .as("stream_equals_batch"),
        (count(lit(1)) > 0).as("nonempty"))
  }

  /** Streaming geofence/enrichment: customer points stream in
    * micro-batches against the at-rest supplier layout — stateless cell
    * routing + stream-static cell equi-join + exact distance. Emitted
    * pairs equal the batch distance join's, so the oracle is the plain
    * pair SQL. */
  def streamGeoJoinQ(s: SparkSession, d: String): DataFrame = {
    // staging is the QUERY's fixture (the streamDigestGate contract):
    // the supplier layout writes once, the customer point wave stages
    // as a parquet the operator streams from
    val tag = Integer.toHexString(d.hashCode)
    val layout = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_geo_layout_$tag").toString
    val wavePath = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_geo_wave_$tag").toString
    graft.index.SpatialDisk.write(supplierPts(s, d), layout,
      Seq("sx", "sy"), cellBits = 4)
    customerPts(s, d).write.mode("overwrite").parquet(wavePath)
    StreamingOps.streamSpatialJoin(s, wavePath, layout, Seq("cx", "cy"),
        radius = 100.0)
      .select(col("c_custkey"), col("s_suppkey"))
      .orderBy(col("c_custkey"), col("s_suppkey"))
  }

  /** Streaming span-decontamination gate: non-eval arrivals are
    * span-redacted per micro-batch against the static eval set — the
    * incremental twin of pp_span_decontamination, answering to the
    * SAME oracle (per-document redaction given static eval grams is
    * exact under micro-batching by construction). */
  def streamSpanGateQ(s: SparkSession, d: String): DataFrame =
    StreamingOps.streamSpanGate(s, d, n = 8).orderBy(col("doc_id"))

  /** Streaming boolean-phrase keyword alert: the stateless gate twin of
    * tx_phrase_bool — same clause composition, same per-document
    * adjacency check, answering the SAME oracle when fed the batch
    * corpus (a stateless filter is micro-batch exact by construction). */
  def streamPhraseGateQ(s: SparkSession, d: String): DataFrame =
    StreamingOps.streamPhraseGate(s, d,
        Seq(Seq(Seq("the", "spark"), Seq("hash", "join")),
          Seq(Seq("big", "table"), Seq("customer"))))
      .orderBy(col("doc_id"))

  /** Point-in-time as-of join: each click event attaches the same
    * user's most recent prior-or-simultaneous purchase (the classic
    * attribution / feature-backfill shape). Union + running window —
    * one shuffle, no join node; DuckDB oracles it with its NATIVE
    * `ASOF LEFT JOIN`, an independent implementation. */
  def asOfJoinQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.TemporalOps._
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    clicks.asOfJoin(purchases, Seq("user_id"), Seq("user_id"),
        "ts", "p_ts", "p_event_id")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("p_event_id"), col("p_ts"), col("p_value"))
      .orderBy(col("event_id"))
  }

  /** Streaming twin of the as-of join: clicks stream through
    * foreachBatch micro-batches, each batch-as-of joined against the
    * static purchase table — exact by construction, so it answers to
    * the SAME native ASOF JOIN oracle as the batch query. */
  def streamAsOfQ(s: SparkSession, d: String): DataFrame =
    StreamingOps.streamAsOf(s, d).orderBy(col("event_id"))

  /** Stream-stream spatio-temporal co-location: both event streams
    * live, joined on spatial cells with a watermarked event-time range
    * bound; the exact predicates match the batch operator's contract,
    * so it answers the batch `sp_st_join` oracle exactly. */
  def streamStJoinQ(s: SparkSession, d: String): DataFrame =
    StreamingOps.streamSpatioTemporalJoin(s, d, radius = 5.0,
        dtMillis = 300000L)
      .filter(col("event_id") < col("event_id2"))
      .orderBy(col("event_id"), col("event_id2"))

  /** Bucketed interval join: clicks landing inside the 24-hour
    * attribution window opened by each purchase of the same user —
    * the validity-window enrichment shape, as a (key, bucket)
    * equi-join + refine instead of Catalyst's per-key cross. */
  def intervalJoinQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.TemporalOps._
    val dayUs = 86400000000L
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"))
    val windows = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"),
        unix_micros(col("ts")).as("w_start"),
        (unix_micros(col("ts")) + dayUs).as("w_end"))
    clicks.intervalJoin(windows, Seq("user_id"), Seq("user_id"),
        "t", "w_start", "w_end", bucketWidth = dayUs)
      .select(col("event_id"), col("user_id"), col("p_event_id"))
      .orderBy(col("event_id"), col("p_event_id"))
  }

  /** 1-D range index over order totals (TreeMap/Treap-analogue path). */
  def rangeIndexQ(s: SparkSession, d: String): DataFrame =
    IndexManager.rangeIndexTable(s, orders(s, d), s"orders_price:$d", "o_totalprice")
      .range(50000.0, 60000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** Order-statistic queries over the 1-D range index — the reference
    * treap's `rank`/`getCount` API (reference: index/Treap.scala:
    * 117-135), previously a documented collapse into the range index.
    * The two-level answers (driver bounds for interior partitions, one
    * pruned scan for the boundary) are exact, so DuckDB replays all
    * three as plain counting SQL. */
  def rangeRankQ(s: SparkSession, d: String): DataFrame = {
    val idx = IndexManager.rangeIndexTable(s, orders(s, d), s"orders_price:$d",
      "o_totalprice")
    val minKey = orders(s, d).agg(min(col("o_totalprice"))).head().getDouble(0)
    import s.implicits._
    Seq((idx.rank(50000.0), idx.getCount(minKey), idx.countRange(50000.0, 60000.0)))
      .toDF("rank_50k", "min_key_count", "range_50_60k")
  }

  /** Hash index over market segment (HashMap-analogue path). */
  def hashIndexQ(s: SparkSession, d: String): DataFrame =
    IndexManager.hashIndexTable(s, customer(s, d), s"cust_seg:$d", "c_mktsegment")
      .lookup("BUILDING")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Media-feature ANN, emitted as contract rows (the sp_zknn_check
    * pattern): the stub feature vectors are engine-private (wraparound
    * 64-bit hashing, not SQL-replicable), but the top-k CONTRACT over
    * them is deterministic — exactly k rows ranked 1..k, rank 1 is the
    * query medium itself (self-similarity dominates a unit-norm
    * cosine), and every emitted cosine bit-equals an independent
    * recompute via Spark's higher-order array functions. */
  def mediaFeaturesTopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.syntheticMediaTable(s, d).as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(media, dim = 32).toDF()
    val q = feats.filter(col("media_id") === 0)
      .select(col("features")).head().getSeq[Float](0).toArray
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cos").desc, col("media_id").asc)
    feats.cosineTopK("features", "media_id", q, 10)
      .withColumn("rank", row_number().over(w))
      .select(col("rank"),
        (col("rank") =!= 1 || col("media_id") === 0).as("top1_is_self"),
        (col("cos") === Pipeline.cosHofCol(col("features"), lit(q))).as("cos_exact"))
      .orderBy(col("rank"))
  }

  /** Approximate zKNN join, emitted as per-(left, rank) contract rows
    * (VERDICT r5 item 2 — sp_zknn_check's contract folded into the
    * operator's own query): the neighbor SETS are curve-dependent, but
    * per left row the operator must return exactly k rows (ranks 1..k by
    * exact distance — rank completeness makes under/over-production a
    * hash failure), with k DISTINCT rights, whose max exact distance
    * dominates the exact kth-NN distance (from the naive path that also
    * oracles sp_knn_join). DuckDB predicts the whole table from
    * `customer` alone. */
  def zknnJoinQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.SpatialOps._
    import graft.functions.pointDistance
    import org.apache.spark.sql.expressions.Window
    val dcol = pointDistance(Seq("cx", "cy").map(col), Seq("sx", "sy").map(col))
    val perLeft = Window.partitionBy(col("c_custkey"))
    val z = customerPts(s, d)
      .zknnJoin(supplierPts(s, d), Seq("cx", "cy"), Seq("sx", "sy"),
        k = 3, leftId = "c_custkey", rightId = "s_suppkey",
        tieBreak = Seq("s_suppkey"), shifts = 2)
      .select(col("c_custkey"), col("s_suppkey"), dcol.as("__zd"))
      .withColumn("rank", row_number().over(
        perLeft.orderBy(col("__zd").asc, col("s_suppkey").asc)))
      .withColumn("__ndis", size(collect_set(col("s_suppkey")).over(perLeft)))
      .withColumn("__zmax", max(col("__zd")).over(perLeft))
    val exact = customerPts(s, d)
      .knnJoinNaive(supplierPts(s, d), Seq("cx", "cy"), Seq("sx", "sy"),
        k = 3, leftId = "c_custkey", tieBreak = Seq("s_suppkey"))
      .groupBy(col("c_custkey")).agg(max(dcol).as("__emax"))
    z.join(exact, Seq("c_custkey"))
      .select(col("c_custkey"), col("rank"),
        (col("__ndis") === 3).as("rights_distinct"),
        (col("__zmax") >= col("__emax")).as("covers_exact_kth"))
      .orderBy(col("c_custkey"), col("rank"))
  }

  /** Hard zKNN contract check: per left row the approximate join must
    * return exactly k rows, all-distinct rights, whose max exact distance
    * dominates the exact kth-NN distance (any k distinct rights do).
    * Deterministic whatever the curve recall is, so DuckDB can oracle the
    * shape contract even though the neighbor sets are probabilistic
    * (reference semantics: ZKJSpark.scala:36-170). */
  def zknnCheckQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.SpatialOps._
    import graft.functions.pointDistance
    val dcol = pointDistance(Seq("cx", "cy").map(col), Seq("sx", "sy").map(col))
    val z = customerPts(s, d)
      .zknnJoin(supplierPts(s, d), Seq("cx", "cy"), Seq("sx", "sy"),
        k = 3, leftId = "c_custkey", rightId = "s_suppkey",
        tieBreak = Seq("s_suppkey"), shifts = 2)
      .groupBy(col("c_custkey")).agg(
        count(lit(1)).cast("int").as("n_rows"),
        countDistinct(col("s_suppkey")).cast("int").as("n_distinct"),
        max(dcol).as("__zmax"))
    val exact = customerPts(s, d)
      .knnJoinNaive(supplierPts(s, d), Seq("cx", "cy"), Seq("sx", "sy"),
        k = 3, leftId = "c_custkey", tieBreak = Seq("s_suppkey"))
      .groupBy(col("c_custkey")).agg(max(dcol).as("__emax"))
    z.join(exact, Seq("c_custkey"))
      .select(col("c_custkey"), col("n_rows"), col("n_distinct"),
        (col("__zmax") >= col("__emax")).as("covers_exact_kth"))
      .orderBy(col("c_custkey"))
  }

  /** Library scalar functions through the SQL surface (temp-function
    * registry), emitted as contract rows (the mm_features_topk pattern):
    * DuckDB can't evaluate the engine-private `graft_*` hashes, but it
    * can verify BOOLEANS — per document, each SQL-registry result must
    * bit-equal the same function through the DataFrame expression path
    * (whose values tx_langid_fingerprint already hash-checks against a
    * full DuckDB replay). The predicted table is all-TRUE, so any
    * registry-path divergence is a hash failure. */
  def sqlFunctionsQ(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftExtensions.registerFunctions(s)
    documents(s, d).createOrReplaceTempView("graft_documents")
    val viaSql = s.sql(
      """SELECT doc_id, graft_lang_id(text) AS lang_sql,
        | graft_simhash64(text) AS sh_sql, graft_fingerprint64(text) AS fp_sql
        |FROM graft_documents""".stripMargin)
    val viaDf = documents(s, d).select(col("doc_id"),
      graft.functions.langId(col("text")).as("lang_df"),
      graft.functions.simhash64(col("text")).as("sh_df"),
      graft.functions.fingerprint64(col("text")).as("fp_df"))
    viaSql.join(viaDf, Seq("doc_id"))
      .select(col("doc_id"),
        (col("lang_sql") === col("lang_df")).as("lang_id_agrees"),
        (col("sh_sql") === col("sh_df")).as("simhash_agrees"),
        (col("fp_sql") === col("fp_df")).as("fingerprint_agrees"))
      .orderBy(col("doc_id"))
  }

  /** KD-tree partitioner contract (reference
    * partitioner/KDTreePartitioner.scala:34-140 — the one reference
    * component previously skipped; the reference itself never wires it
    * into a relation or join, so it surfaces here as a first-class
    * layout op): partition the customer points into 8 KD regions and
    * emit the deterministic contract — exact region count, total row
    * coverage, the proportional-median balance bound, in-plan box
    * containment of every row in its own region, and equality of a box
    * query served from ONLY the admitted (box-intersecting) regions
    * against the unpartitioned plan. The whole table rides as the
    * sample (cap 4000 > |customer| at the driver's scale), so the cuts
    * are exact medians and every verdict is deterministic. */
  def kdTreePartitionQ(s: SparkSession, d: String): DataFrame = {
    import graft.index.KdTreePartitioner
    import graft.index.KdTreePartitioner.RegionCol
    import graft.operators.SpatialOps._
    val pts = customerPts(s, d)
    val (kd, tree) = KdTreePartitioner.partition(pts, Seq("cx", "cy"), parts = 8)
    val nLeaves = KdTreePartitioner.numLeaves(tree)
    val boxes = KdTreePartitioner.leafBoxes(tree, 2)
    // literal per-region box bounds; containment checked in-plan
    def arr(f: Int => Double) = lit((0 until nLeaves).map(f).toArray)
    val inBox =
      col("cx") >= element_at(arr(boxes(_)._1(0)), col(RegionCol) + 1) &&
      col("cx") <  element_at(arr(boxes(_)._2(0)), col(RegionCol) + 1) &&
      col("cy") >= element_at(arr(boxes(_)._1(1)), col(RegionCol) + 1) &&
      col("cy") <  element_at(arr(boxes(_)._2(1)), col(RegionCol) + 1)

    val (qlo, qhi) = (Array(2000.0, 100.0), Array(4000.0, 300.0))
    val admitted = KdTreePartitioner.admittedRegions(tree, 2, qlo, qhi)
    val pruned = kd.filter(col(RegionCol).isin(admitted: _*))
      .boxRange(Seq("cx", "cy"), qlo.toSeq, qhi.toSeq).select("c_custkey")
    val plain = pts.boxRange(Seq("cx", "cy"), qlo.toSeq, qhi.toSeq).select("c_custkey")
    val rangeExact = pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty

    val n = pts.count()
    kd.groupBy(col(RegionCol))
      .agg(count(lit(1)).as("__cnt"),
        sum(when(inBox, 0).otherwise(1)).as("__out"))
      .agg(
        count(lit(1)).cast("int").as("n_regions"),
        sum(col("__cnt")).as("total_rows"),
        (max(col("__cnt")) <= lit(2 * ((n + 7) / 8))).as("balanced"),
        (sum(col("__out")) === 0).as("in_own_box"),
        lit(rangeExact).as("range_query_exact"))
  }

  /** Frame content rides as hex text so DuckDB can hash-check the exact
    * bytes (substring over the hex of the blob = 2 chars per byte). */
  def mediaFrameSample(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.syntheticMediaTable(s, d))
      .select(col("media_id"), col("frame_idx"),
        upper(hex(col("frame"))).as("frame_hex"),
        length(col("frame")).cast("int").as("frame_len"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** REAL video-frame extraction: every 2nd frame of each id-seeded
    * animated GIF decodes through ImageIO's frame-indexed reader and
    * pools to features. Contract columns verified ENGINE-side (a
    * second independent decode must agree bit-for-bit; dims fixed);
    * DuckDB predicts the table shape from `documents` alone (frame
    * count = 2 + id % 4, stride 2). */
  def mediaGifFramesQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def frames() = Multimodal.sampleGifFrames(
      Multimodal.syntheticGifTable(s, d).as[Multimodal.MediaRow],
      stride = 2, dim = 16)
    val again = frames().select(col("media_id").as("__m"),
      col("frame_idx").as("__f"), col("features").as("__feat2"))
    frames()
      .join(again, col("media_id") === col("__m") &&
        col("frame_idx") === col("__f"))
      .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
        (col("features") === col("__feat2")).as("deterministic"),
        (size(col("features")) === 16).as("dim_ok"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** REAL MJPEG-in-AVI frame extraction (verdict r11 #9 — the last
    * honest video codec in reach of a pure JDK): the RIFF walk finds
    * every `00dc` frame chunk, ImageIO decodes the JPEG payloads, and
    * the same determinism/shape contract as mm_gif_frames is pinned by
    * a second independent decode. Oracle predicts the frame table
    * (2 + id % 4 frames at stride 2 over the %3==1 doc slice). */
  def mediaAviFramesQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def frames() = Multimodal.sampleAviFrames(
      Multimodal.syntheticAviTable(s, d).as[Multimodal.MediaRow],
      stride = 2, dim = 16)
    val again = frames().select(col("media_id").as("__m"),
      col("frame_idx").as("__f"), col("features").as("__feat2"))
    frames()
      .join(again, col("media_id") === col("__m") &&
        col("frame_idx") === col("__f"))
      .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
        (col("features") === col("__feat2")).as("deterministic"),
        (size(col("features")) === 16).as("dim_ok"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** DIB-in-AVI decode with a CONTENT oracle: the lossless `00db` path
    * must reproduce a direct pool of the source frame bit-for-bit. */
  def mediaDibFramesQ(s: SparkSession, d: String): DataFrame =
    Multimodal.dibFramesVerdict(s, d)
      .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
        col("matches_direct"), col("dim_ok"))
      .orderBy(col("media_id"), col("frame_idx"))

  private val sessionsOracleSql =
      """SELECT user_id, start_ms, end_ms, n_events, total_value FROM (
        |  SELECT user_id, MIN(t) AS start_ms, MAX(t) AS end_ms,
        |    CAST(COUNT(*) AS INT) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |  FROM (
        |    SELECT user_id, t, value,
        |      SUM(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |    FROM (
        |      SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS t, value,
        |        CASE WHEN epoch_ms(CAST(ts AS TIMESTAMP))
        |               - LAG(epoch_ms(CAST(ts AS TIMESTAMP))) OVER (
        |                   PARTITION BY user_id
        |                   ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)), event_id) > 14400000
        |             THEN 1 ELSE 0 END AS is_new
        |      FROM events) f) s
        |  GROUP BY user_id, sid) t
        |ORDER BY user_id, start_ms""".stripMargin

  private val asOfOracleSql =
    """WITH l AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
      |), r AS (
      |  SELECT user_id, ts AS p_ts, event_id AS p_event_id, value AS p_value
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, ts
      |                                     ORDER BY event_id DESC) AS rn
      |        FROM events WHERE event_type = 'purchase') WHERE rn = 1
      |)
      |SELECT l.event_id, l.user_id, l.ts, r.p_event_id, r.p_ts, r.p_value
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.ts >= r.p_ts
      |ORDER BY l.event_id""".stripMargin

  /** Certified grouped quantiles over lineitem: exact values from the
    * SQL-portable rank interpolation (StatsOps.quantileStats spells the
    * arithmetic out; Spark's own `percentile` interpolation is not),
    * sketch verdict pinned TRUE. The inexact q literal 0.95 is CAST to
    * DOUBLE in the oracle — DuckDB decimal literals replay
    * `0.95*(n-1)`'s fraction exactly where doubles round (the tx_bm25
    * lesson); 0.25/0.5/0.75 are binary-exact either way. */
  def quantileStatsQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.StatsOps._
    lineitem(s, d)
      .quantileStats("l_returnflag", "l_extendedprice",
        Seq(0.25, 0.5, 0.75, 0.95))
      .orderBy(col("l_returnflag"), col("q"))
  }

  /** Robust MAD outlier clip of documents by length within language:
    * exact median + exact MAD via the same rank interpolation, keep
    * |v - median| <= 3 * MAD (MAD = 0 keeps the group). Every compare
    * is the bit-parity IEEE graph, so the kept set hash-matches. */
  def outlierFilterQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.StatsOps._
    documents(s, d).select(col("doc_id"), col("lang"), col("n_chars"))
      .robustOutlierFilter("lang", "n_chars", k = 3.0)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("median"), col("mad"))
      .orderBy(col("doc_id"))
  }

  private def medianCte(src: String, vExpr: String, group: String,
                        rankedName: String, outName: String,
                        outCol: String): String =
    s"""$rankedName AS (
       |  SELECT $group, $vExpr AS v,
       |    row_number() OVER (PARTITION BY $group ORDER BY $vExpr) - 1 AS rn,
       |    count(*) OVER (PARTITION BY $group) AS n
       |  FROM $src),
       |$outName AS (
       |  SELECT $group,
       |    max(CASE WHEN rn = floor(CAST(0.5 AS DOUBLE) * (n - 1)) THEN v END)
       |      + (coalesce(max(CASE WHEN rn = floor(CAST(0.5 AS DOUBLE) * (n - 1)) + 1 THEN v END),
       |                  max(CASE WHEN rn = floor(CAST(0.5 AS DOUBLE) * (n - 1)) THEN v END))
       |         - max(CASE WHEN rn = floor(CAST(0.5 AS DOUBLE) * (n - 1)) THEN v END))
       |      * (CAST(0.5 AS DOUBLE) * (any_value(n) - 1)
       |         - floor(CAST(0.5 AS DOUBLE) * (any_value(n) - 1))) AS $outCol
       |  FROM $rankedName
       |  WHERE rn = floor(CAST(0.5 AS DOUBLE) * (n - 1))
       |     OR rn = floor(CAST(0.5 AS DOUBLE) * (n - 1)) + 1
       |  GROUP BY $group)""".stripMargin

  private val outlierFilterOracleSql: String =
    s"""WITH ${medianCte("documents", "CAST(n_chars AS DOUBLE)", "lang", "rk1", "med", "median")},
       |dv AS (
       |  SELECT d.doc_id, d.lang, d.n_chars, m.median,
       |    abs(CAST(d.n_chars AS DOUBLE) - m.median) AS dev
       |  FROM documents d JOIN med m ON d.lang = m.lang),
       |${medianCte("dv", "dev", "lang", "rk2", "madt", "mad")}
       |SELECT dv.doc_id AS doc_id, dv.lang AS lang, dv.n_chars AS n_chars,
       |       dv.median AS median, madt.mad AS mad
       |FROM dv JOIN madt ON dv.lang = madt.lang
       |WHERE madt.mad = 0.0 OR dv.dev <= CAST(3.0 AS DOUBLE) * madt.mad
       |ORDER BY dv.doc_id""".stripMargin

  private val quantileStatsOracleSql: String = {
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val perQ = qs.map { q =>
      s"""SELECT l_returnflag, CAST($q AS DOUBLE) AS q, n, exact FROM (
         |  SELECT l_returnflag, any_value(n) AS n,
         |    max(CASE WHEN rn = floor(CAST($q AS DOUBLE) * (n - 1)) THEN v END)
         |      + (coalesce(max(CASE WHEN rn = floor(CAST($q AS DOUBLE) * (n - 1)) + 1 THEN v END),
         |                  max(CASE WHEN rn = floor(CAST($q AS DOUBLE) * (n - 1)) THEN v END))
         |         - max(CASE WHEN rn = floor(CAST($q AS DOUBLE) * (n - 1)) THEN v END))
         |      * (CAST($q AS DOUBLE) * (any_value(n) - 1)
         |         - floor(CAST($q AS DOUBLE) * (any_value(n) - 1))) AS exact
         |  FROM ranked
         |  WHERE rn = floor(CAST($q AS DOUBLE) * (n - 1))
         |     OR rn = floor(CAST($q AS DOUBLE) * (n - 1)) + 1
         |  GROUP BY l_returnflag) s${qs.indexOf(q)}""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ranked AS (
       |  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v,
       |    row_number() OVER (PARTITION BY l_returnflag ORDER BY CAST(l_extendedprice AS DOUBLE)) - 1 AS rn,
       |    count(*) OVER (PARTITION BY l_returnflag) AS n
       |  FROM lineitem)
       |SELECT l_returnflag, q, n, exact, TRUE AS within_bound FROM (
       |$perQ) u
       |ORDER BY l_returnflag, q""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q27_quantile_stats" -> quantileStatsOracleSql,
    "q28_outlier_filter" -> outlierFilterOracleSql,
    "sp_box_range_indexed" -> Spatial.oracles("sp_box_range"),
    "sp_circle_range_indexed" -> Spatial.oracles("sp_circle_range"),
    "sp_knn_indexed" -> Spatial.oracles("sp_knn"),
    "sp_quadtree_range" -> Spatial.oracles("sp_box_range"),
    "sp_quadtree_knn" -> Spatial.oracles("sp_knn"),
    "sp_point_udt_range" -> Spatial.oracles("sp_box_range"),
    "q8_events_hourly_stream" -> Relational.oracles("q6_events_hourly"),
    // gaps-and-islands twin of BOTH sessionizers (custom-state and
    // native session_window): same (time, event_id) ordering, same
    // DECIMAL(18,6) value rounding
    "st_sessions" -> sessionsOracleSql,
    "st_sessions_native" -> sessionsOracleSql,
    // duplicates never span langs (within-lang duplication by
    // construction), so per-lang distinct-text counts are exactly the
    // post-dedup per-lang row counts whichever duplicate survives
    "st_stream_dedup" ->
      """SELECT lang, COUNT(DISTINCT text) AS n_unique FROM documents
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // streaming gate = batch contamination aggregated over the eval
    // side: distinct corpus (doc, gram) pairs matched against the
    // distinct eval gram set (same tok/grams CTE as pp_contamination)
    "st_contamination" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\r]+') AS t
        |  FROM documents
        |), grams AS (
        |  SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS gram
        |  FROM tok, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
        |  WHERE len(t) >= 8
        |), ev AS (
        |  SELECT DISTINCT gram FROM grams WHERE doc_id % 7 = 0
        |)
        |SELECT g.doc_id, count(*) AS matched_grams
        |FROM grams g JOIN ev ON g.gram = ev.gram
        |WHERE g.doc_id % 7 <> 0
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // streaming gate = arrivals' passages minus the corpus digest set,
    // reassembled; same passage split + md5 key as pp_passage_dedup
    // the streaming geofence emits the batch distance join's pairs
    "st_geo_join" ->
      """SELECT c_custkey, s_suppkey
        |FROM (SELECT c_custkey, c_acctbal AS cx,
        |        CAST(c_custkey % 1000 AS DOUBLE) AS cy FROM customer) c,
        |     (SELECT s_suppkey, s_acctbal AS sx,
        |        CAST(s_suppkey % 1000 AS DOUBLE) AS sy FROM supplier) s
        |WHERE sqrt((cx - sx)*(cx - sx) + (cy - sy)*(cy - sy)) <= 100.0
        |ORDER BY c_custkey, s_suppkey""".stripMargin,
    "st_passage_gate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                q -> q != '') AS ts
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, ts,
        |    unnest(range(0, CAST(ceil(len(ts)/20.0) AS BIGINT))) AS pos
        |  FROM toks),
        |chunked AS (
        |  SELECT doc_id, pos,
        |    array_to_string(ts[(pos*20+1):(pos*20+20)], ' ') AS pass
        |  FROM pos),
        |corpus AS (
        |  SELECT DISTINCT md5(pass) AS key FROM chunked WHERE doc_id % 2 = 0),
        |kept AS (
        |  SELECT c.doc_id, c.pos, c.pass
        |  FROM chunked c LEFT JOIN corpus k ON md5(c.pass) = k.key
        |  WHERE c.doc_id % 2 <> 0 AND k.key IS NULL)
        |SELECT doc_id,
        |  string_agg(pass, ' ' ORDER BY pos) AS text_clean,
        |  count(*) AS kept_passages
        |FROM kept GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // DuckDB's NATIVE ASOF LEFT JOIN — an independent implementation of
    // the same point-in-time semantics (greatest p_ts <= ts, inclusive,
    // per user). The rn=1 dedupe pins equal-timestamp ties to the max
    // event id, the same total order the window operator uses. The
    // streaming twin answers to the SAME oracle: per-micro-batch
    // batch-as-of against a static right side is exact by construction.
    "ts_asof_join" -> asOfOracleSql,
    "st_asof" -> asOfOracleSql,
    // verdict row: the stream and batch gates read the SAME at-rest
    // CDC layout; the engine-side full-outer compare is the contract
    "st_cdc_gate" ->
      "SELECT TRUE AS stream_equals_batch, TRUE AS nonempty",
    // the streaming admit gate answers the batch admit's REAL oracle:
    // raw-text NOT EXISTS over the same synthesized wave
    "st_digest_admit" -> graft.queries.Pipeline.oracles("dd_digest_admit"),
    "st_minhash_gate" ->
      "SELECT TRUE AS stream_equals_batch, TRUE AS nonempty",
    "st_semantic_gate" ->
      "SELECT TRUE AS stream_equals_batch, TRUE AS nonempty",
    "st_ann_join" ->
      "SELECT TRUE AS stream_equals_batch, TRUE AS nonempty",
    // the stream-stream co-location join answers the batch operator's
    // oracle: the event-time range is only the state bound (1 ms wider
    // than the contract), the exact integer-ms predicate decides
    "st_st_join" -> graft.queries.Spatial.oracles("sp_st_join"),
    // the streaming gate answers to the batch sweep's exact oracle:
    // per-document redaction against static eval grams is micro-batch
    // invariant by construction
    "st_span_gate" -> graft.queries.Pipeline.oracles("pp_span_decontamination"),
    "st_phrase_gate" -> graft.queries.Pipeline.oracles("tx_phrase_bool"),
    // the streaming query-set retrieval gate answers the batch
    // query-join verb's REAL oracle: per-query top-k is micro-batch
    // invariant (queries arrive atomically per wave file)
    "st_bm25_query_join" -> graft.queries.Pipeline.oracles("tx_bm25_query_join"),
    "st_hybrid_query_join" -> graft.queries.Pipeline.oracles("tx_hybrid_query_join"),
    // plain range join in DuckDB (the engine handles it natively);
    // epoch_us == Spark's unix_micros on the same micro timestamps
    "ts_interval_join" ->
      """WITH c AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS t
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT event_id AS p_event_id, user_id, epoch_us(ts) AS w_start,
        |    epoch_us(ts) + 86400000000 AS w_end
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT c.event_id, c.user_id, p.p_event_id
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND c.t BETWEEN p.w_start AND p.w_end
        |ORDER BY event_id, p_event_id""".stripMargin,
    "sp_range_index" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice >= 50000.0 AND o_totalprice <= 60000.0
        |ORDER BY o_orderkey""".stripMargin,
    "sp_hash_index" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin,
    // treap rank/getCount/countRange replayed as plain counting SQL
    "sp_range_rank" ->
      """SELECT
        |  CAST((SELECT count(*) FROM orders WHERE o_totalprice <= 50000.0) AS BIGINT)
        |    AS rank_50k,
        |  CAST((SELECT count(*) FROM orders
        |        WHERE o_totalprice = (SELECT min(o_totalprice) FROM orders)) AS BIGINT)
        |    AS min_key_count,
        |  CAST((SELECT count(*) FROM orders
        |        WHERE o_totalprice >= 50000.0 AND o_totalprice <= 60000.0) AS BIGINT)
        |    AS range_50_60k""".stripMargin,
    // pure byte slicing: media = video docs (doc_id % 3 = 2), bytes =
    // UTF-8 text, frames = 64-byte chunks, every 2nd; content compared
    // via hex (2 hex chars per byte -> substring at *128)
    "mm_frame_sample" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id, upper(hex(encode(text))) AS hx,
        |    octet_length(encode(text)) AS nb
        |  FROM documents WHERE doc_id % 3 = 2
        |)
        |SELECT media_id, u.frame_idx AS frame_idx,
        |  substring(hx, u.frame_idx * 128 + 1, 128) AS frame_hex,
        |  CAST(least(64, nb - u.frame_idx * 64) AS INT) AS frame_len
        |FROM media,
        |  UNNEST(generate_series(0,
        |    greatest(CAST(ceil(nb / 64.0) AS INT) - 1, 0), 2)) AS u(frame_idx)
        |ORDER BY media_id, frame_idx""".stripMargin,
    // the zKNN contract is fully determined even though the neighbor SETS
    // are approximate: per left, ranks 1..k complete, k distinct rights,
    // max exact distance >= exact kth — predicted from `customer` alone
    // media-feature ANN contract: predicted table = ranks 1..10 with
    // both verdict columns TRUE (see mediaFeaturesTopK scaladoc)
    "mm_features_topk" ->
      """SELECT CAST(r AS INT) AS rank, TRUE AS top1_is_self, TRUE AS cos_exact
        |FROM (SELECT row_number() OVER (ORDER BY doc_id) AS r FROM documents) t
        |WHERE r <= 10 ORDER BY rank""".stripMargin,
    // real GIF decode contract: DuckDB predicts the frame table's shape
    // (2 + id % 4 frames, stride 2) while determinism and dims are
    // verified engine-side by a second independent decode
    "mm_gif_frames" ->
      """SELECT doc_id AS media_id, CAST(u.f AS INT) AS frame_idx,
        |  TRUE AS deterministic, TRUE AS dim_ok
        |FROM documents,
        |  UNNEST(generate_series(0, CAST(2 + doc_id % 4 AS INT) - 1, 2)) AS u(f)
        |WHERE doc_id % 3 = 2 AND doc_id < 90
        |ORDER BY media_id, frame_idx""".stripMargin,
    // MJPEG-in-AVI decode contract: same predicted frame table on the
    // %3==1 doc slice; decode determinism pinned engine-side
    "mm_video_frames" ->
      """SELECT doc_id AS media_id, CAST(u.f AS INT) AS frame_idx,
        |  TRUE AS deterministic, TRUE AS dim_ok
        |FROM documents,
        |  UNNEST(generate_series(0, CAST(2 + doc_id % 4 AS INT) - 1, 2)) AS u(f)
        |WHERE doc_id % 3 = 1 AND doc_id < 90
        |ORDER BY media_id, frame_idx""".stripMargin,
    // DIB-in-AVI: same predicted frame table on the %3==0 slice; the
    // matches_direct flag is the engine-side BIT-FOR-BIT content pin
    // (lossless codec — a direct pool of the source must reproduce)
    "mm_video_frames_dib" ->
      """SELECT doc_id AS media_id, CAST(u.f AS INT) AS frame_idx,
        |  TRUE AS matches_direct, TRUE AS dim_ok
        |FROM documents,
        |  UNNEST(generate_series(0, CAST(2 + doc_id % 4 AS INT) - 1, 2)) AS u(f)
        |WHERE doc_id % 3 = 0 AND doc_id < 90
        |ORDER BY media_id, frame_idx""".stripMargin,
    "sp_zknn_join" ->
      """SELECT c_custkey, CAST(u.r AS INT) AS rank,
        |  TRUE AS rights_distinct, TRUE AS covers_exact_kth
        |FROM customer, UNNEST([1, 2, 3]) AS u(r)
        |ORDER BY c_custkey, rank""".stripMargin,
    "sp_zknn_check" ->
      """SELECT c_custkey, CAST(3 AS INT) AS n_rows, CAST(3 AS INT) AS n_distinct,
        |  TRUE AS covers_exact_kth
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // KD-partitioner contract: 8 exact-median regions covering every
    // row, balanced, box-contained, range-exact (see kdTreePartitionQ)
    "sp_kdtree_partition" ->
      """SELECT CAST(8 AS INT) AS n_regions,
        |  CAST(count(*) AS BIGINT) AS total_rows,
        |  TRUE AS balanced, TRUE AS in_own_box, TRUE AS range_query_exact
        |FROM customer""".stripMargin,
    // SQL-registry contract: every graft_* function through the SQL
    // surface bit-equals its DataFrame expression twin (see sqlFunctionsQ)
    "q15_sql_functions" ->
      """SELECT doc_id, TRUE AS lang_id_agrees, TRUE AS simhash_agrees,
        |  TRUE AS fingerprint_agrees
        |FROM documents ORDER BY doc_id""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sp_box_range_indexed" -> (boxRangeIndexed _),
    "sp_circle_range_indexed" -> (circleRangeIndexed _),
    "sp_knn_indexed" -> (knnIndexed _),
    "sp_quadtree_range" -> (quadTreeRangeQ _),
    "sp_quadtree_knn" -> (quadTreeKnnQ _),
    "q8_events_hourly_stream" -> (eventsHourlyStream _),
    "st_sessions" -> (sessionsStream _),
    "st_sessions_native" -> (sessionsNativeStream _),
    "st_stream_dedup" -> (streamDedup _),
    "st_contamination" -> (streamContamination _),
    "st_passage_gate" -> (streamPassageGateQ _),
    "st_cdc_gate" -> (streamCdcGateQ _),
    "st_digest_admit" -> (streamDigestGateQ _),
    "st_minhash_gate" -> (streamMinhashGateQ _),
    "st_semantic_gate" -> (streamSemanticGateQ _),
    "st_ann_join" -> (streamAnnJoinQ _),
    "st_geo_join" -> (streamGeoJoinQ _),
    "st_span_gate" -> (streamSpanGateQ _),
    "st_phrase_gate" -> (streamPhraseGateQ _),
    "st_bm25_query_join" -> (streamBm25QueryJoinQ _),
    "st_hybrid_query_join" -> (streamHybridQueryJoinQ _),
    "ts_asof_join" -> (asOfJoinQ _),
    "st_asof" -> (streamAsOfQ _),
    "st_st_join" -> (streamStJoinQ _),
    "ts_interval_join" -> (intervalJoinQ _),
    "sp_range_index" -> (rangeIndexQ _),
    "sp_range_rank" -> (rangeRankQ _),
    "sp_hash_index" -> (hashIndexQ _),
    "sp_zknn_join" -> (zknnJoinQ _),
    "sp_zknn_check" -> (zknnCheckQ _),
    "q15_sql_functions" -> (sqlFunctionsQ _),
    "sp_kdtree_partition" -> (kdTreePartitionQ _),
    "mm_features_topk" -> (mediaFeaturesTopK _),
    "mm_frame_sample" -> (mediaFrameSample _),
    "mm_gif_frames" -> (mediaGifFramesQ _),
    "mm_video_frames" -> (mediaAviFramesQ _),
    "mm_video_frames_dib" -> (mediaDibFramesQ _),
    "sp_point_udt_range" -> (pointUdtRangeQ _),
    "q27_quantile_stats" -> (quantileStatsQ _),
    "q28_outlier_filter" -> (outlierFilterQ _)
  )
}

/** Customer point with a typed Point-UDT column (the class-inference
  * surface exercised by sp_point_udt_range). */
case class CustPointRow(c_custkey: Long, cx: Double, cy: Double, p: graft.spatial.Point)
