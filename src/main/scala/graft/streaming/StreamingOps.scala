package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Tables.dsum

/** Structured Streaming surface over the `events` stream table.
  *
  * The reference has no streaming support (README lists spatio-temporal
  * analytics as "developing"; SURVEY.md §2.5), so this is extension
  * surface: the same declarative transforms run on `readStream` sources,
  * with watermarked windows for aggregation and mapGroupsWithState for
  * sessionization. Every stateless operator in this library (spatial
  * predicates, text/vector expressions) composes with streams for free.
  */
object StreamingOps {

  /** Watermarked tumbling-hour aggregation — the streaming twin of the
    * batch q6_events_hourly query (same grouping, same exact-sum
    * discipline), used to prove batch/stream agreement. */
  def hourlyEventStats(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(unix_millis(col("w.start")).as("hour_ms"), col("event_type"),
        col("n"), col("total_value"))

  /** Run the streaming hourly aggregation over the events parquet of a
    * scale-factor dir as a file-source stream, synchronously, and return
    * the final result — lets the driver's batch-oriented harness (and the
    * DuckDB oracle) check a genuinely streaming plan. */
  def hourlyEventStatsBatchEquivalent(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file stream source wants a directory; stage the single parquet
    // file into a temp dir (test-scale convenience, not a scale path)
    val staged = java.nio.file.Files.createTempDirectory("graft_stream_src")
    staged.toFile.deleteOnExit()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    staged.resolve("events.parquet").toFile.deleteOnExit()
    val raw = graft.Tables.normalizeEventTs(
      spark.readStream
        .schema(batchSchema)
        .parquet(staged.toString))
    val sinkName = s"graft_stream_${System.nanoTime()}"
    val q = hourlyEventStats(raw)
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(sinkName)
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    spark.table(sinkName)
  }

  /** Streaming exact dedup: `dropDuplicates` on the text column over the
    * documents file stream (state = seen keys), reduced to a per-lang
    * count so the output is deterministic regardless of which duplicate
    * row survives micro-batch ordering. */
  def streamDedupCounts(spark: SparkSession, dir: String): DataFrame = {
    val batchSchema = spark.read.parquet(s"$dir/documents.parquet").schema
    val staged = java.nio.file.Files.createTempDirectory("graft_dedup_src")
    staged.toFile.deleteOnExit()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      staged.resolve("documents.parquet"))
    staged.resolve("documents.parquet").toFile.deleteOnExit()
    val sinkName = s"graft_dedup_${System.nanoTime()}"
    val q = spark.readStream
      .schema(batchSchema)
      .parquet(staged.toString)
      .dropDuplicates("text")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_unique"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(sinkName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sinkName)
  }

  /** Streaming point-in-time backfill: click events arrive as a
    * multi-file stream; each micro-batch is as-of joined (backward,
    * inclusive — [[graft.operators.TemporalOps]]) against the STATIC
    * purchase table via `foreachBatch`. This split is EXACT, not an
    * approximation: the as-of result for a left row depends only on
    * that row and the static right side, so processing lefts in any
    * batching yields the batch answer row-for-row — which is why
    * foreachBatch + batch-as-of is the production shape for online
    * feature lookup against a frozen feature table. Batches append to
    * one parquet sink; the returned frame reads it back complete.
    *
    * Streaming-specific machinery: file stream with maxFilesPerTrigger
    * (genuinely multiple micro-batches), foreachBatch with a batch-only
    * operator inside, idempotent-append parquet sink. */
  def streamAsOf(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.TemporalOps._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    val staged = java.nio.file.Files.createTempDirectory("graft_asof_src")
    staged.toFile.deleteOnExit()
    // several source files -> several micro-batches under maxFilesPerTrigger
    clicks.repartition(4).write.mode("overwrite").parquet(staged.toString)
    val out = java.nio.file.Files.createTempDirectory("graft_asof_out")
    out.toFile.deleteOnExit()
    val q = spark.readStream
      .schema(clicks.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.asOfJoin(purchases, Seq("user_id"), Seq("user_id"),
            "ts", "p_ts", "p_event_id")
          .write.mode("append").parquet(out.toString)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(out.toString)
      .select("event_id", "user_id", "ts", "p_event_id", "p_ts", "p_value")
  }

  /** Streaming benchmark-decontamination gate: documents arrive as a
    * file stream; each is checked against a STATIC eval-set gram table
    * via a stream-static LEFT SEMI join at the gram level, then a
    * stateful per-document count of matched distinct grams (Complete
    * mode). Per-doc gram distinctness comes from `array_distinct`
    * WITHIN the row (no stateful distinct needed), so the result is
    * exactly the batch `contaminationPairs` aggregated over the eval
    * side — the production shape: the eval set is small and static
    * (broadcast side), the corpus streams through, and a doc appearing
    * here is quarantined before training.
    *
    * Streaming-specific machinery: stream-static semi join (static side
    * re-read per micro-batch, broadcast by size), stateful streaming
    * aggregation keyed by doc_id. */
  def streamContaminationCounts(spark: SparkSession, dir: String,
                                n: Int = 8): DataFrame = {
    import graft.functions.wordGrams
    val batch = spark.read.parquet(s"$dir/documents.parquet")
    val evalGrams = batch.filter(col("doc_id") % 7 === 0)
      .select(explode(array_distinct(wordGrams(col("text"), n))).as("__gram"))
      .distinct()
    val staged = java.nio.file.Files.createTempDirectory("graft_contam_src")
    staged.toFile.deleteOnExit()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      staged.resolve("documents.parquet"))
    staged.resolve("documents.parquet").toFile.deleteOnExit()
    val sinkName = s"graft_contam_${System.nanoTime()}"
    val q = spark.readStream
      .schema(batch.schema)
      .parquet(staged.toString)
      .filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        explode(array_distinct(wordGrams(col("text"), n))).as("__gram"))
      .join(evalGrams, Seq("__gram"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("matched_grams"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(sinkName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sinkName)
  }

  /** Streaming spatial enrichment — a point stream distance-joins the
    * AT-REST spatial layout ([[graft.index.SpatialDisk]]): each arrival
    * explodes to the coarse cells its radius-dilated bbox intersects (a
    * STATELESS projection — bounds are plan-time constants from the
    * layout's meta), the static side is the layout keyed by its
    * directory cell, and the cell equi-join meets each qualifying pair
    * exactly once before the exact distance predicate. The production
    * geofence/enrichment gate: the layout is written once beside the
    * corpus, and every micro-batch pays only its own arrivals.
    *
    * Arrivals live at `wavePath` (a point parquet whose `keys` columns
    * are the query coordinates), the at-rest layout at `layoutPath` —
    * wave selection/staging is the caller's (the streamDigestGate
    * contract). Emits every (arrival, layout-row) pair within `radius`
    * carrying both sides' columns. Admitted tombstone deletes on the
    * layout subtract automatically: the static side rides the same
    * token-checked chokepoint every batch read does, so stream equals
    * batch on a tombstoned layout by construction (spec-pinned). */
  def streamSpatialJoin(spark: SparkSession, wavePath: String,
                        layoutPath: String, keys: Seq[String],
                        radius: Double = 100.0): DataFrame = {
    val statics = graft.index.SpatialDisk
      .joinTable(spark, layoutPath, "__graft_geo_cell")
    val layoutKeys = graft.index.SpatialDisk.keyColumns(spark, layoutPath)
    val schema = spark.read.parquet(wavePath).schema
    val sinkName = s"graft_geo_${System.nanoTime()}"
    val stream = spark.readStream
      .schema(schema)
      .parquet(wavePath)
    val q = graft.index.SpatialDisk
      .withQueryCells(stream, keys, layoutPath, radius, "__graft_geo_cell")
      .join(statics, Seq("__graft_geo_cell"))
      .filter(graft.functions.pointDistance(
        keys.map(col), layoutKeys.map(col)) <= radius)
      .drop("__graft_geo_cell")
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(sinkName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sinkName)
  }

  /** Stream-STREAM spatio-temporal co-location join: two live event
    * streams joined on the spatial grid cell with an event-time RANGE
    * condition — the watermark + time-bound pair that lets Spark
    * expire join state, so it runs forever on unbounded streams (rows
    * older than watermark + dt leave the buffers). The batch
    * [[graft.operators.SpatialOps.DatasetSpatialOps.spatioTemporalJoin]]
    * grid discipline in streaming form: the right stream replicates to
    * the 3^d neighbor cells as a STATELESS projection, the left keeps
    * its own cell, a qualifying pair meets in exactly one cell, and
    * the exact distance + integer-ms |dt| predicates refine.
    *
    * The event-time range rides 1 ms WIDER than `dtMillis`: the range
    * bound compares full-resolution timestamps while the contract's
    * predicate compares TRUNCATED epoch-ms — a pair at dt =
    * dtMillis + 0.4 ms truncates into the contract but would miss a
    * tight range. The range is the state bound; the ms predicate
    * decides, so the stream answers the batch operator's oracle
    * exactly. */
  def streamSpatioTemporalJoin(spark: SparkSession, dir: String,
                               radius: Double = 5.0,
                               dtMillis: Long = 300000L,
                               watermark: String = "30 minutes"): DataFrame = {
    val pts = graft.Tables.eventsPts(spark, dir)
    val tag = Integer.toHexString(dir.hashCode)
    val staged = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_stst_src_$tag")
    java.nio.file.Files.createDirectories(staged)
    pts.repartition(2).write.mode("overwrite").parquet(staged.toString)
    val schema = spark.read.parquet(staged.toString).schema
    def reader() = spark.readStream.schema(schema).parquet(staged.toString)
    val l = reader()
      .withWatermark("ts", watermark)
      .withColumn("__graft_st_cx", floor(col("ex") / radius).cast("long"))
      .withColumn("__graft_st_cy", floor(col("ey") / radius).cast("long"))
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val offArr = array(offsets.map { case (dx, dy) =>
      array(lit(dx), lit(dy)) }: _*)
    val rSide = reader()
      .select(col("event_id").as("event_id2"), col("ts").as("ts2"),
        col("ex").as("ex2"), col("ey").as("ey2"))
      .withWatermark("ts2", watermark)
      .withColumn("__graft_st_off", explode(offArr))
      .withColumn("__graft_st_rcx",
        floor(col("ex2") / radius).cast("long") +
          element_at(col("__graft_st_off"), 1))
      .withColumn("__graft_st_rcy",
        floor(col("ey2") / radius).cast("long") +
          element_at(col("__graft_st_off"), 2))
      .drop("__graft_st_off")
    val margin = dtMillis + 1
    val joined = l.join(rSide,
      col("__graft_st_cx") === col("__graft_st_rcx") &&
        col("__graft_st_cy") === col("__graft_st_rcy") &&
        col("ts2") >= col("ts") - expr(s"INTERVAL $margin MILLISECOND") &&
        col("ts2") <= col("ts") + expr(s"INTERVAL $margin MILLISECOND") &&
        graft.functions.pointDistance(
          Seq(col("ex"), col("ey")), Seq(col("ex2"), col("ey2"))) <= radius &&
        abs(unix_millis(col("ts")) - unix_millis(col("ts2"))) <= dtMillis)
      .select(col("event_id"), col("event_id2"))
    val sinkName = s"graft_stst_${System.nanoTime()}"
    val q = joined.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(sinkName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sinkName)
  }

  /** Streaming repeated-passage gate: newly-arriving documents stream
    * through a stream-static ANTI join against the STATIC corpus's
    * passage-digest table — any fixed-width passage already present in
    * the corpus (here: the even-doc half) is dropped, and each arrival
    * is reassembled from its surviving passages. The shard-vs-corpus
    * shape of [[graft.operators.CorpusOps.DatasetCorpusOps.passageDedup]]
    * (which dedups WITHIN a corpus): the production quarantine gate for
    * incremental crawls. A document whose passages ALL exist in the
    * corpus produces no row (nothing survives to aggregate).
    *
    * Scale shape: the digest table is passage-cardinality-sized and
    * carries 32-char md5 keys only; the stream side explodes to
    * (digest, id, pos) — passage text rides only the per-document
    * reassembly aggregation.
    *
    * Arrivals live at `wavePath`, the static corpus (a documents
    * parquet) at `corpusPath` — wave selection/staging is the caller's
    * (the streamDigestGate contract); the operator holds no filesystem
    * staging and no test-fixture split. */
  def streamPassageGate(spark: SparkSession, wavePath: String,
                        corpusPath: String, width: Int = 20,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    import graft.operators.CorpusOps
    val corpusKeys = spark.read.parquet(corpusPath)
      .select(explode(CorpusOps.passagesOf(col(textCol), width))
        .as("__graft_pass"))
      .select(md5(col("__graft_pass")).as("__graft_key"))
      .distinct()
    val schema = spark.read.parquet(wavePath).schema
    val sinkName = s"graft_passage_${System.nanoTime()}"
    val q = spark.readStream
      .schema(schema)
      .parquet(wavePath)
      .select(col(idCol),
        posexplode(CorpusOps.passagesOf(col(textCol), width))
          .as(Seq("__graft_pos", "__graft_pass")))
      .withColumn("__graft_key", md5(col("__graft_pass")))
      .join(corpusKeys, Seq("__graft_key"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__graft_pos"), col("__graft_pass")))),
          x => x("__graft_pass")), " ").as("text_clean"),
        count(lit(1)).as("kept_passages"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(sinkName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sinkName)
  }

  /** Streaming SEMANTIC near-dup gate against the at-rest IVF layout:
    * embedding arrivals staged at `wavePath` probe their nprobe nearest
    * coarse cells (stateless literal-centroid fold), stream-static join
    * only those cells' layout rows, and emit exact-cosine pairs at or
    * above `threshold`. Append mode, zero state store — each layout row
    * lives in one cell so a pair meets at most once; the plan is
    * [[graft.operators.VectorOps.ivfSemanticGate]] VERBATIM on a
    * streaming source, so stream-equals-batch holds by construction
    * and the `st_semantic_gate` verdict row pins it. */
  def streamSemanticGate(spark: SparkSession, wavePath: String,
                         indexPath: String, vecCol: String, idCol: String,
                         waveVecCol: String, waveIdCol: String,
                         threshold: Double, nprobe: Int = 4): DataFrame = {
    val schema = spark.read.parquet(wavePath).schema
    val arrivals = spark.readStream.schema(schema).parquet(wavePath)
    val sinkName = s"graft_sggate_${System.nanoTime()}"
    val q = graft.operators.VectorOps.ivfSemanticGate(arrivals, waveVecCol,
        waveIdCol, indexPath, vecCol, idCol, threshold, nprobe)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(sinkName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sinkName)
  }

  /** Streaming ANN JOIN against the at-rest IVF-PQ layout: for every
    * arriving embedding, its `k` most-cosine-similar stored vectors —
    * the live-retrieval shape ("embed the stream, search the at-rest
    * corpus"). Each micro-batch runs
    * [[graft.operators.VectorOps.readIvfPqTopKJoin]] VERBATIM via
    * `foreachBatch` — the batch verb's probed-cell union is a bounded
    * driver collect no continuous plan can express, and per-batch
    * handoff is Spark's sanctioned escape for exactly this. Per-left
    * results are independent, so the union over micro-batches equals
    * the batch join over the whole wave bit-for-bit (spec-pinned), and
    * tombstoned vectors never surface. Emissions land at `outPath`
    * (parquet, appended per batch — the production sink); the returned
    * frame reads it back after the wave drains. */
  def streamAnnJoin(spark: SparkSession, wavePath: String,
                    indexPath: String, waveVecCol: String,
                    waveIdCol: String, vecCol: String, idCol: String,
                    k: Int, outPath: String, nprobe: Int = 4,
                    refine: Int = 50): DataFrame = {
    val schema = spark.read.parquet(wavePath).schema
    // several source files -> several micro-batches under
    // maxFilesPerTrigger: the per-batch handoff genuinely runs once
    // per file, not once per wave
    val arrivals = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(wavePath)
    val q = arrivals.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.VectorOps.readIvfPqTopKJoin(batch, waveVecCol,
            waveIdCol, indexPath, vecCol, idCol, k, nprobe, refine)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // an empty wave never triggers foreachBatch, so the sink dir may
    // not exist — answer the empty result with the contract schema
    // instead of a missing-path error
    val op = new org.apache.hadoop.fs.Path(outPath)
    if (op.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(op))
      spark.read.parquet(outPath)
    else {
      import org.apache.spark.sql.types._
      val idType = schema.fields.find(_.name == waveIdCol)
        .map(_.dataType).getOrElse(LongType)
      // the layout id's true type comes from the layout itself (only
      // read on this empty-wave path)
      val layoutIdType = spark.read.parquet(s"$indexPath/data").schema
        .fields.find(_.name == idCol).map(_.dataType).getOrElse(LongType)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(waveIdCol, idType),
          StructField(idCol, layoutIdType), StructField("cos", DoubleType))))
    }
  }

  /** Streaming QUERY-SET BM25 retrieval against the at-rest BM25
    * layout — the serving twin of
    * [[graft.operators.CorpusOps.bm25TopKJoinAgainstIndex]]: query
    * batches arrive as (queryId, term) rows staged at `wavePath`, and
    * each micro-batch runs the batch verb VERBATIM via `foreachBatch`
    * (its bounded term-IN pushdown probe is a driver collect no
    * continuous plan can express — the [[streamAnnJoin]] escape),
    * reading ONLY the batch's terms' posting slivers. Zero state store:
    * per-QUERY results are independent, so the union over micro-batches
    * equals the batch join over all queries bit-for-bit (spec-pinned),
    * PROVIDED each query's term rows are staged in ONE wave file (a
    * query split across files would score each fragment separately —
    * queries are atomic retrieval requests, so stage them atomically)
    * and query ids are not reused across waves. Emissions land at
    * `outPath` (parquet, appended per batch); the returned frame reads
    * it back after the wave drains. */
  /** The query-set streams' wave-atomicity contract, promoted from
    * prose to a CHECK (VERDICT r15 #7): a query whose term rows are
    * split across wave files would silently return one fragment score
    * per file (fragment BM25 scores are NOT mergeable — each fragment
    * top-ks over a partial term set), so each batch's arriving query
    * ids are checked against every id already processed in this wave
    * drain and an overlap fails the stream LOUDLY. Driver state is one
    * id per query, ceiling-guarded by `spark.graft.maxDriverPushdown`
    * (the shared driver-collect discipline) — a wave set too large for
    * the guard errors with the knob's name rather than silently
    * dropping the check. Returns the per-batch checker. */
  private def waveAtomicityGuard(spark: SparkSession, queryIdCol: String,
                                 verb: String): DataFrame => Unit = {
    val seen = scala.collection.mutable.HashSet[Any]()
    val cap = graft.GraftConf.maxDriverPushdown(spark)
    batch => {
      val ids = batch.select(col(queryIdCol)).distinct()
        .limit(cap + 1).collect().map(_.get(0))
      require(ids.length + seen.size <= cap,
        s"$verb: wave-atomicity guard state would exceed " +
          s"${graft.GraftConf.MaxDriverPushdown}=$cap distinct query ids; " +
          "raise the ceiling or drain in smaller wave sets")
      val dup = ids.filter(seen.contains)
      require(dup.isEmpty,
        s"$verb: query ids split across wave files: " +
          s"${dup.take(5).mkString(", ")}${if (dup.length > 5) ", ..." else ""} — " +
          "a query's rows must be staged in ONE wave file (fragment " +
          "scores are not mergeable) and query ids must not be reused " +
          "across waves")
      seen ++= ids
    }
  }

  def streamBm25QueryJoin(spark: SparkSession, wavePath: String,
                          indexPath: String, queryIdCol: String,
                          termCol: String, k: Int, outPath: String,
                          k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import graft.operators.CorpusOps
    val schema = spark.read.parquet(wavePath).schema
    val arrivals = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(wavePath)
    val guard = waveAtomicityGuard(spark, queryIdCol, "streamBm25QueryJoin")
    val q = arrivals.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        guard(batch)
        CorpusOps.bm25TopKJoinAgainstIndex(spark, indexPath, batch,
            queryIdCol, termCol, k, k1, b)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // an empty wave never triggers foreachBatch — answer the contract
    // schema (queryId from the wave, id from the layout, dl, score)
    val op = new org.apache.hadoop.fs.Path(outPath)
    if (op.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(op))
      spark.read.parquet(outPath)
    else {
      import org.apache.spark.sql.types._
      val params = graft.operators.DedupOps.indexMeta(spark, indexPath,
        "streamBm25QueryJoin")
      val qidType = schema.fields.find(_.name == queryIdCol)
        .map(_.dataType).getOrElse(LongType)
      val layoutIdType = spark.read.parquet(s"$indexPath/postings").schema
        .fields.find(_.name == params("idCol")).map(_.dataType)
        .getOrElse(LongType)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(queryIdCol, qidType),
          StructField(params("idCol"), layoutIdType),
          StructField("dl", LongType), StructField("score", DoubleType))))
    }
  }

  /** Streaming QUERY-SET HYBRID retrieval against BOTH at-rest layouts
    * — the serving twin of
    * [[graft.operators.CorpusOps.hybridTopKJoinAgainstIndex]]
    * (VERDICT r15 #3), completing the stream=batch bar for the
    * query-set joins. Wave rows carry a query's terms AND its
    * embedding together — `(queryId, term, queryVec)`, the vector
    * repeated per term row — so one wave FILE stays one atomic
    * retrieval request (the [[streamBm25QueryJoin]] contract; the
    * duplication is wave-sized and keeps the two inputs impossible to
    * tear). Each micro-batch splits the frame and runs the batch verb
    * VERBATIM: BM25 candidates from one term-pruned posting read,
    * candidate vectors by bounded id-IN against the IVF-PQ layout,
    * exact-cosine re-rank per query. Zero state store — per-query
    * results are independent, so the union over micro-batches equals
    * the batch join bit-for-bit (spec-pinned), and the wave-atomicity
    * guard fails LOUDLY if a query id spans wave files or recurs. */
  def streamHybridQueryJoin(spark: SparkSession, wavePath: String,
                            bm25Path: String, ivfPath: String,
                            queryIdCol: String, termCol: String,
                            queryVecCol: String, vecIdCol: String,
                            vecCol: String, candidates: Int, k: Int,
                            outPath: String,
                            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import graft.operators.CorpusOps
    val schema = spark.read.parquet(wavePath).schema
    require(Seq(queryIdCol, termCol, queryVecCol).forall(c =>
      schema.fieldNames.contains(c)),
      s"streamHybridQueryJoin: wave rows must carry ($queryIdCol, $termCol, " +
        s"$queryVecCol); staged schema has ${schema.fieldNames.mkString(", ")}")
    val arrivals = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(wavePath)
    val guard = waveAtomicityGuard(spark, queryIdCol, "streamHybridQueryJoin")
    val q = arrivals.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        guard(batch)
        val queries = batch.select(col(queryIdCol), col(termCol))
        val queryVecs = batch.select(col(queryIdCol), col(queryVecCol)).distinct()
        CorpusOps.hybridTopKJoinAgainstIndex(spark, bm25Path, ivfPath,
            queries, queryVecs, queryIdCol, termCol, queryVecCol,
            vecIdCol, vecCol, candidates, k, k1, b)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // empty wave -> contract schema (queryId, layout id, score, cos)
    val op = new org.apache.hadoop.fs.Path(outPath)
    if (op.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(op))
      spark.read.parquet(outPath)
    else {
      import org.apache.spark.sql.types._
      val params = graft.operators.DedupOps.indexMeta(spark, bm25Path,
        "streamHybridQueryJoin")
      val qidType = schema.fields.find(_.name == queryIdCol)
        .map(_.dataType).getOrElse(LongType)
      val layoutIdType = spark.read.parquet(s"$bm25Path/postings").schema
        .fields.find(_.name == params("idCol")).map(_.dataType)
        .getOrElse(LongType)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(queryIdCol, qidType),
          StructField(params("idCol"), layoutIdType),
          StructField("score", DoubleType), StructField("cos", DoubleType))))
    }
  }

  /** Streaming near-dup gate against the at-rest minhash index:
    * arrivals staged at `wavePath` (selection is the caller's — same
    * contract as [[streamDigestGate]]) sign THEMSELVES with the layout
    * meta's banding (a pure projection — no state), stream-static join
    * the stored (band, bucket) membership arrays, and exact-verify
    * candidate pairs with shingle Jaccard where the CORPUS side's
    * shingles come from the layout — corpus text is never touched by
    * the stream. Emits (idCol, id_corpus, jaccard) per surviving pair;
    * clean arrivals stay silent.
    *
    * Stream-shape trade vs the batch gate: the arrival's own shingle
    * set rides its band rows into the join (the batch form semi-joins
    * texts back instead) — per-wave cost ×bands on one array column,
    * in exchange for a gate with no stream-side self-join. */
  def streamMinhashGate(spark: SparkSession, wavePath: String,
                        indexPath: String,
                        threshold: Double = 0.5,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    import graft.operators.DedupOps
    import graft.operators.DedupOps._
    import graft.functions.{shingleSet, sortedJaccard}
    val params = DedupOps.indexMeta(spark, indexPath, "streamMinhashGate")
    val waveTokens = params.getOrElse("__waves", params("__token"))
      .split(";").toSeq
    require(waveTokens.contains(params("__token")),
      s"streamMinhashGate: write-token mismatch inside $indexPath/meta " +
        "(token not in the waves list) — rewrite the layout")
    val storedId = params("idCol")
    def tokenChecked(df: DataFrame, what: String): DataFrame = {
      require(df.columns.contains("__graft_token"),
        s"streamMinhashGate: $indexPath/$what has no __graft_token " +
          "column — the layout is torn or foreign; rewrite it")
      df.filter(assert_true(col("__graft_token").isin(waveTokens: _*),
        lit(s"streamMinhashGate: write-token mismatch between " +
          s"$indexPath/meta and $indexPath/$what — rewrite the layout")).isNull)
        .drop("__graft_token")
    }
    val storedB = tokenChecked(
      spark.read.parquet(s"$indexPath/buckets"), "buckets")
    // multi-wave or tombstoned: re-group the split membership arrays
    // with admitted delete waves anti-joined out (the batch gate's
    // exact shape)
    val tombs = DedupOps.tombstoneIds(spark, indexPath, params,
      "streamMinhashGate")
    val member =
      if (waveTokens.length == 1 && tombs.isEmpty) storedB
      else {
        val exploded = storedB
          .select(col("__band"), col("__bucket"),
            explode(col("__cids")).as("__cid"))
        val live = tombs match {
          case Some(t) => exploded.join(
            t.select(col(storedId).as("__cid")), Seq("__cid"), "left_anti")
          case None => exploded
        }
        live.groupBy(col("__band"), col("__bucket"))
          .agg(sort_array(collect_list(col("__cid"))).as("__cids"))
      }
    val corpusSh = tokenChecked(
      spark.read.parquet(s"$indexPath/shingles"), "shingles")
      .select(col(storedId).as("id_corpus"), col("__shingles").as("__sh2"))
    // arrivals live at wavePath — wave selection/staging is the
    // caller's (the streamDigestGate contract); the operator itself
    // holds no filesystem staging and no test-fixture split
    val sinkName = s"graft_mhgate_${System.nanoTime()}"
    val arrivals = spark.readStream
      .schema(spark.read.parquet(wavePath).schema)
      .parquet(wavePath)
    // the arrival's own shingle set rides its band rows (`carry`) — a
    // stream cannot join back to itself for the verify
    val sigsWithSh = new DatasetDedupOps(arrivals)
      .bandedBuckets(idCol, textCol, params("shingle").toInt,
        params("numHashes").toInt, params("bands").toInt,
        params("seed").toLong,
        carry = Seq("__sh1" ->
          shingleSet(col(textCol), params("shingle").toInt)))
    val q = sigsWithSh
      .join(member, Seq("__band", "__bucket"))
      .select(col(idCol), col("__sh1"),
        explode(col("__cids")).as("id_corpus"))
      .filter(col(idCol) =!= col("id_corpus"))
      .join(corpusSh, Seq("id_corpus"))
      .withColumn("jaccard", sortedJaccard(col("__sh1"), col("__sh2")))
      .filter(col("jaccard") >= threshold)
      .groupBy(col(idCol), col("id_corpus"))
      .agg(max(col("jaccard")).as("jaccard"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(sinkName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sinkName)
  }

  /** Streaming exact-dedup ADMIT gate against the at-rest digest index:
    * arrivals staged at `wavePath` hash themselves (meta-driven
    * normalization) and pass if their text matches nothing in the
    * corpus layout. Fully STATELESS — the Bloom probe is a codegen'd
    * filter (a definite-no admits with NO join; only maybes ride the
    * stream-static anti join) and the admit decision is per-row, so
    * the gate runs forever in append mode with zero state store: the
    * production crawl-ingest filter
    * ([[graft.operators.DedupOps.DatasetDedupOps.admitAgainstDigestIndex]]
    * on a live stream, same layout, same answers). */
  def streamDigestGate(spark: SparkSession, wavePath: String,
                       indexPath: String,
                       textCol: String = "text"): DataFrame = {
    import graft.operators.DedupOps
    import graft.functions.{bloomMightContain, normalizeText}
    val params = DedupOps.indexMeta(spark, indexPath, "streamDigestGate")
    val waveTokens = params.getOrElse("__waves", params("__token"))
      .split(";").toSeq
    require(waveTokens.contains(params("__token")),
      s"streamDigestGate: write-token mismatch inside $indexPath/meta " +
        "(token not in the waves list) — rewrite the layout")
    val storedRows = spark.read.parquet(s"$indexPath/digests")
      .filter(assert_true(col("__graft_token").isin(waveTokens: _*),
        lit(s"streamDigestGate: write-token mismatch between " +
          s"$indexPath/meta and $indexPath/digests — rewrite the layout")).isNull)
    // admitted delete waves subtract: a tombstoned doc blocks nothing
    val storedKeys = (DedupOps.tombstoneIds(spark, indexPath, params,
        "streamDigestGate") match {
      case Some(t) => storedRows.join(t, Seq(params("idCol")), "left_anti")
      case None    => storedRows
    }).select(col("__h64"), col("__md5"))
    val maybe =
      if (params("bloom") == "yes")
        Some(DedupOps.digestBlooms(spark, indexPath, waveTokens)
          .map(b => bloomMightContain(col("__h64"), b))
          .reduce(_ || _))
      else None
    val schema = spark.read.parquet(wavePath).schema
    val waveCols = schema.fieldNames.toSeq
    def t(c: org.apache.spark.sql.Column) =
      if (params("normalized").toBoolean) normalizeText(c) else c
    val arrivals = spark.readStream.schema(schema).parquet(wavePath)
      .withColumn("__h64", xxhash64(t(col(textCol))))
      .withColumn("__md5", unhex(md5(t(col(textCol)))))
    val admitted = maybe match {
      case Some(m) =>
        arrivals.filter(!m).unionByName(
          arrivals.filter(m)
            .join(storedKeys, Seq("__h64", "__md5"), "left_anti"))
      case None =>
        arrivals.join(storedKeys, Seq("__h64", "__md5"), "left_anti")
    }
    val sinkName = s"graft_dggate_${System.nanoTime()}"
    val q = admitted.select(waveCols.map(col): _*)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(sinkName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sinkName)
  }

  /** Streaming ingest gate against the AT-REST CDC chunk index: newly
    * arriving documents staged at `wavePath` (selection is the
    * caller's — same contract as [[streamDigestGate]]) chunk
    * THEMSELVES (a stateless projection — the
    * chunking parameters come from the layout's meta, so a
    * differently-chunked stream is impossible) and stream-static join
    * the stored membership arrays; per arrival it emits how many
    * corpus docs share content-defined chunks with it and how many
    * distinct chunks are shared. Clean documents produce no row — the
    * quarantine shape of [[streamPassageGate]] on the CDC blocking
    * key, reading the index [[graft.operators.DedupOps.DatasetDedupOps.writeCdcIndex]]
    * wrote once (corpus text is never touched by the stream).
    *
    * Scale shape: the static side is the narrow (hash, members) table
    * scanned in place; the stream side carries (doc_id, 64-bit hash)
    * rows into the join — text never rides past the chunk projection. */
  def streamCdcIndexGate(spark: SparkSession, wavePath: String,
                         indexPath: String,
                         maxDocsPerChunk: Int = 64,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    import graft.operators.DedupOps
    import graft.functions.cdcChunks
    val params = DedupOps.indexMeta(spark, indexPath, "streamCdcIndexGate")
    val waveTokens = params.getOrElse("__waves", params("__token"))
      .split(";").toSeq
    require(waveTokens.contains(params("__token")),
      s"streamCdcIndexGate: write-token mismatch inside $indexPath/meta " +
        "(token not in the waves list) — rewrite the layout")
    val chunks = spark.read.parquet(s"$indexPath/chunks")
    require(chunks.columns.contains("__graft_token"),
      s"streamCdcIndexGate: $indexPath/chunks has no __graft_token " +
        "column — the layout is torn or foreign; rewrite it")
    val stored = chunks
      .filter(assert_true(col("__graft_token").isin(waveTokens: _*),
        lit(s"streamCdcIndexGate: write-token mismatch between " +
          s"$indexPath/meta and $indexPath/chunks — rewrite the layout")).isNull)
      .drop("__graft_token")
    // the batch gate's contract exactly: merged membership when the
    // layout holds several waves, boilerplate chunks capped on the
    // MERGED population — without the cap one shared chunk would
    // explode into every arrival (the pair detonation the batch cap
    // exists to prevent)
    // multi-wave or tombstoned: re-group with admitted delete waves
    // anti-joined out BEFORE the boilerplate cap (the batch gate's
    // exact shape)
    val tombs = DedupOps.tombstoneIds(spark, indexPath, params,
      "streamCdcIndexGate")
    val merged =
      if (waveTokens.length == 1 && tombs.isEmpty) stored
      else {
        val exploded = stored
          .select(col("__h"), explode(col("__cids")).as("__cid"))
        val live = tombs match {
          case Some(t) => exploded.join(
            t.select(col(params("idCol")).as("__cid")), Seq("__cid"), "left_anti")
          case None => exploded
        }
        live.groupBy(col("__h"))
          .agg(sort_array(collect_list(col("__cid"))).as("__cids"))
      }
    val member = merged.filter(size(col("__cids")) <= maxDocsPerChunk)
    // arrivals live at wavePath — wave selection/staging is the
    // caller's (the streamDigestGate contract); the operator itself
    // holds no filesystem staging and no test-fixture split
    val sinkName = s"graft_cdcgate_${System.nanoTime()}"
    val q = spark.readStream
      .schema(spark.read.parquet(wavePath).schema)
      .parquet(wavePath)
      .select(col(idCol),
        explode(cdcChunks(col(textCol), params("window").toInt,
          params("maskBits").toInt, params("minSize").toInt,
          params("maxSize").toInt)).as("__c"))
      .select(col(idCol), xxhash64(col("__c")).as("__h"))
      .join(member, Seq("__h"))
      .select(col(idCol), col("__h"), explode(col("__cids")).as("__cid"))
      .filter(col(idCol) =!= col("__cid"))
      .groupBy(col(idCol))
      .agg(
        size(array_distinct(collect_list(col("__cid"))))
          .as("matched_corpus_docs"),
        size(array_distinct(collect_list(struct(col("__h"), col("__cid")))))
          .as("shared_chunks"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(sinkName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sinkName)
  }

  /** Streaming twin of [[graft.operators.DedupOps.decontaminateSpans]]:
    * arriving corpus documents are span-redacted against the STATIC
    * eval set per micro-batch via `foreachBatch` — the incremental
    * quarantine gate that cleans a crawl as it lands instead of
    * re-sweeping the corpus. Redaction is per-document given the eval
    * grams, so micro-batching is exact by construction: the streamed
    * output bit-equals the batch sweep over the same rows (spec-pinned),
    * and the whole thing answers to the same DuckDB oracle as
    * `pp_span_decontamination`. */
  /** Streaming keyword alert — the unbounded-stream twin of
    * [[graft.operators.CorpusOps.phraseBoolMatchAgainstIndex]]'s
    * predicate: arriving documents filter through the BOOLEAN phrase
    * composition (AND of clauses, OR of phrase/term alternatives) as a
    * pure STATELESS projection. Phrase adjacency is per-document local
    * (the same boundary-safe padded-containment the batch surface
    * uses), so the gate needs no state store, no watermark, and no
    * index — each micro-batch pays exactly its own arrivals, the
    * monitoring/alerting shape of a streaming corpus intake. Emits
    * `(doc_id, n_tokens)` and answers the SAME oracle as
    * `tx_phrase_bool` when fed the batch corpus. */
  def streamPhraseGate(spark: SparkSession, dir: String,
                       query: Seq[Seq[Seq[String]]]): DataFrame = {
    require(query.nonEmpty && query.forall(cl => cl.nonEmpty && cl.forall(
      alt => alt.nonEmpty && alt.forall(t =>
        t.nonEmpty && !t.exists(_.isWhitespace)))),
      "streamPhraseGate: query must be AND-of-clauses, " +
        "OR-of-alternatives, each a non-empty whitespace-free phrase")
    val batch = spark.read.parquet(s"$dir/documents.parquet")
    val staged = java.nio.file.Files.createTempDirectory("graft_phrase_src")
    staged.toFile.deleteOnExit()
    batch.select(col("doc_id"), col("text"))
      .repartition(4).write.mode("overwrite").parquet(staged.toString)
    val out = java.nio.file.Files.createTempDirectory("graft_phrase_out")
    out.toFile.deleteOnExit()
    val srcSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val toks = graft.functions.tokens(col("text"))
    val padded = concat(lit(" "), array_join(toks, " "), lit(" "))
    val pred = query.map(cl => cl.map(alt =>
        padded.contains(" " + alt.mkString(" ") + " ")).reduce(_ || _))
      .reduce(_ && _)
    val q = spark.readStream
      .schema(srcSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString)
      .filter(pred)
      .select(col("doc_id"),
        graft.functions.tokenCount(col("text")).as("n_tokens"))
      .writeStream
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.write.mode("append").parquet(out.toString)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(out.toString).select("doc_id", "n_tokens")
  }

  def streamSpanGate(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val batch = spark.read.parquet(s"$dir/documents.parquet")
    val evalDocs = batch.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text"))
    val staged = java.nio.file.Files.createTempDirectory("graft_span_src")
    staged.toFile.deleteOnExit()
    // several source files -> several micro-batches under maxFilesPerTrigger
    batch.filter(col("doc_id") % 7 =!= 0).select(col("doc_id"), col("text"))
      .repartition(4).write.mode("overwrite").parquet(staged.toString)
    val out = java.nio.file.Files.createTempDirectory("graft_span_out")
    out.toFile.deleteOnExit()
    val srcSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val q = spark.readStream
      .schema(srcSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString)
      .writeStream
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.DedupOps.decontaminateSpans(
            b.toDF, broadcast(evalDocs), "doc_id", "text", "text", n)
          .write.mode("append").parquet(out.toString)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(out.toString)
      .select("doc_id", "text_clean", "n_tokens", "n_removed")
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(start: Long, end: Long, n: Int, total: java.math.BigDecimal)
  final case class UserSession(user_id: Long, start_ms: Long, end_ms: Long,
                               n_events: Int, total_value: Double)

  /** Gap-based sessionization with explicit state, correct ACROSS
    * micro-batches: the still-open session rides in `GroupState`, so a
    * session spanning several batches is emitted once, whole — never
    * split at batch boundaries. A session is emitted when a later event
    * proves the gap (Append mode), or — with `idleTimeout = true` — when
    * an idle user's processing-time timeout fires after `gapMs` with no
    * new data. Idle timeout is OPT-IN (default false): its pending timers
    * make the engine run no-data micro-batches, which synchronous
    * `processAllAvailable` harnesses livelock on — continuous-mode
    * callers with a real trigger interval opt in explicitly. The
    * custom-state analogue of the reference's missing spatio-temporal
    * layer.
    *
    * Ordering contract: events sort by (event time, event_id) WITHIN a
    * batch; ACROSS batches a user's event times must not regress (there
    * is no watermark buffer here to reorder late data — feed a
    * time-ordered source, as the file-staged twin does, or use a native
    * `session_window` aggregation when late data matters).
    *
    * Determinism discipline: totals accumulate in DECIMAL(18,6) (the
    * per-value rounding of Spark's double->decimal cast), so the result
    * is exactly reproducible and hash-comparable with a SQL
    * gaps-and-islands oracle using the same decimal cast. */
  def sessionize(events: Dataset[Event], gapMs: Long,
                 idleTimeout: Boolean = false): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val conf = if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout()
               else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), conf)(sessionStep(gapMs, idleTimeout))
  }

  /** The per-group state transition of [[sessionize]], extracted so the
    * timeout branch is unit-testable with `TestGroupState` (the engine
    * path can't exercise it deterministically: pending processing-time
    * timers make the engine run no-data micro-batches, which a
    * synchronous `processAllAvailable` harness livelocks on — hence
    * `idleTimeout = false` in every batch-equivalent twin, where a
    * sentinel batch closes open sessions through the gap logic instead). */
  private[streaming] def sessionStep(gapMs: Long, idleTimeout: Boolean)(
      uid: Long, rows: Iterator[Event],
      state: GroupState[SessionState]): Iterator[UserSession] = {
    def emit(s: SessionState): UserSession =
      UserSession(uid, s.start, s.end, s.n, s.total.doubleValue)
    if (state.hasTimedOut) {
      // idle past the gap: close and flush the carried session
      val flushed = state.getOption.map(emit)
      state.remove()
      flushed.iterator
    } else {
      // seed with the carried open session, fold this batch's sorted
      // events into gap-separated sessions
      val times = rows.map(e => (e.ts.getTime, e.event_id, e.value)).toArray
        .sortBy(t => (t._1, t._2))
      val sessions = scala.collection.mutable.ArrayBuffer.empty[SessionState]
      state.getOption.foreach(sessions += _)
      times.foreach { case (t, _, v) =>
        val dv = java.math.BigDecimal.valueOf(v).setScale(6, java.math.RoundingMode.HALF_UP)
        sessions.lastOption match {
          case Some(s) if t - s.end <= gapMs =>
            sessions(sessions.length - 1) = SessionState(s.start, t, s.n + 1, s.total.add(dv))
          case _ =>
            sessions += SessionState(t, t, 1, dv)
        }
      }
      if (sessions.isEmpty) Iterator.empty
      else {
        // all but the last are gap-proven closed; the last stays open in
        // state until a later event (or the idle timeout) closes it
        state.update(sessions.last)
        if (idleTimeout) state.setTimeoutDuration(gapMs)
        sessions.dropRight(1).iterator.map(emit)
      }
    }
  }

  /** Run gap sessionization over the events parquet as a genuine
    * MULTI-BATCH file-source stream: micro-batch 1 is the real events
    * file, micro-batch 2 a sentinel file holding one far-future event per
    * user (maxFilesPerTrigger=1 keeps them separate batches, staged
    * modification times order them). The sentinel closes every
    * still-open session through the ordinary gap logic — so this path
    * exercises the cross-batch state carry for real — and the sentinel's
    * own one-event sessions are filtered out of the result. Checkable
    * against a SQL gaps-and-islands oracle over just the real events. */
  def sessionizeBatchEquivalent(spark: SparkSession, dir: String,
                                gapMs: Long): Dataset[UserSession] = {
    import spark.implicits._
    val (evs, sentNs) = stagedEventStreamWithSentinel(spark, dir, gapMs)
    val sinkName = s"graft_sess_${System.nanoTime()}"
    val q = sessionize(evs.as[Event], gapMs, idleTimeout = false)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(sinkName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sinkName).as[UserSession]
      .filter(col("start_ms") < lit(sentNs / 1000000L))
  }

  /** Gap sessionization on Spark's NATIVE `session_window` — the fully
    * declarative path (state, merging, and watermark finalization all
    * engine-managed; the recommended form at scale where late data needs
    * watermark reordering). Same output contract as [[sessionize]]:
    * `session_window.end` is last-event + gap, so `end_ms` subtracts the
    * gap back; totals use the same DECIMAL(18,6) discipline. Emitted in
    * Append mode once the watermark passes a session's close. */
  def sessionizeNative(events: DataFrame, gapMs: Long,
                       watermark: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMs milliseconds"))
      .agg(count(lit(1)).cast("int").as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        (unix_millis(col("session_window.end")) - gapMs).as("end_ms"),
        col("n_events"), col("total_value"))

  /** [[sessionizeNative]] over the same staged two-batch file stream as
    * [[sessionizeBatchEquivalent]]: the sentinel advances the watermark
    * past every real session's close, finalizing them for Append; the
    * sentinel's own session stays unfinalized in state (and is filtered
    * anyway). Both sessionizers are checked against the ONE SQL
    * gaps-and-islands oracle. */
  def sessionizeNativeBatchEquivalent(spark: SparkSession, dir: String,
                                      gapMs: Long): DataFrame = {
    val (evs, sentNs) = stagedEventStreamWithSentinel(spark, dir, gapMs)
    val sinkName = s"graft_sessn_${System.nanoTime()}"
    val q = sessionizeNative(evs, gapMs)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(sinkName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sinkName).filter(col("start_ms") < lit(sentNs / 1000000L))
  }

  /** Stage `dir`/events.parquet as a genuine MULTI-BATCH file stream:
    * micro-batch 1 is the real events file, micro-batch 2 a sentinel
    * file holding one far-future event per user (maxFilesPerTrigger=1
    * keeps them separate batches; staged modification times order them).
    * The sentinel closes every open session through ordinary gap logic
    * (custom sessionizer) or advances the watermark (native one);
    * sentinel sessions start at the returned nanos timestamp, so callers
    * filter `start_ms < sentNs / 1e6`. */
  private def stagedEventStreamWithSentinel(spark: SparkSession, dir: String,
                                            gapMs: Long): (DataFrame, Long) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s"$dir/events.parquet"
    val batch = spark.read.parquet(src)
    val batchSchema = batch.schema
    val staged = java.nio.file.Files.createTempDirectory("graft_sess_src")
    staged.toFile.deleteOnExit()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(src), staged.resolve("a_events.parquet"))
    staged.resolve("a_events.parquet").toFile.deleteOnExit()
    java.nio.file.Files.setLastModifiedTime(staged.resolve("a_events.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 120000L))

    // sentinel batch: ts far beyond every real event + gap. The physical
    // ts type follows the source file (long nanos in older testdata
    // generations, micro timestamps since) because the stream reader
    // reads the sentinel file under the source's batchSchema.
    val tsType = batchSchema("ts").dataType
    val maxNs = tsType match {
      case org.apache.spark.sql.types.LongType =>
        batch.agg(max(col("ts"))).head().getLong(0)
      case _ =>
        batch.agg(max(unix_micros(col("ts").cast("timestamp")))).head().getLong(0) * 1000L
    }
    val sentNs = maxNs + (gapMs + 60000L) * 1000000L
    val sentTs = tsType match {
      case org.apache.spark.sql.types.LongType => lit(sentNs)
      // sentNs stays a multiple of 1000, so the micros division is exact
      case t => timestamp_micros(lit(sentNs / 1000L)).cast(t)
    }
    val sentinelTmp = java.nio.file.Files.createTempDirectory("graft_sess_sent")
    sentinelTmp.toFile.deleteOnExit()
    batch.select(col("user_id")).distinct()
      .select(batchSchema.fieldNames.map {
        case "event_id"   => lit(-1L).as("event_id")
        case "ts"         => sentTs.as("ts")
        case "user_id"    => col("user_id")
        case "event_type" => lit("__graft_end").as("event_type")
        case "value"      => lit(0.0).as("value")
        case other        => lit(null).cast(batchSchema(other).dataType).as(other)
      }: _*)
      .coalesce(1).write.mode("overwrite").parquet(sentinelTmp.toString)
    val part = java.nio.file.Files.list(sentinelTmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("sentinel parquet missing"))
    java.nio.file.Files.copy(part, staged.resolve("z_sentinel.parquet"))
    staged.resolve("z_sentinel.parquet").toFile.deleteOnExit()

    val evs = graft.Tables.normalizeEventTs(
        spark.readStream
          .schema(batchSchema)
          .option("maxFilesPerTrigger", "1")
          .parquet(staged.toString))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    (evs, sentNs)
  }
}
