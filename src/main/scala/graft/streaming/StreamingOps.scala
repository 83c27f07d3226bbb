package graft.streaming

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
    val raw = spark.readStream
      .schema(batchSchema)
      .parquet(staged.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(start: Long, end: Long, n: Int, total: java.math.BigDecimal)
  final case class UserSession(user_id: Long, start_ms: Long, end_ms: Long,
                               n_events: Int, total_value: Double)

  /** Gap-based sessionization with explicit state: a session closes when
    * no event arrives within `gapMs` (via processing-time timeout in
    * continuous mode; in this synchronous form sessions also flush on
    * stream end). The custom-state analogue of the reference's missing
    * spatio-temporal layer.
    *
    * Determinism discipline: events sort by (time, event_id) within the
    * group and totals accumulate in DECIMAL(18,6) (the per-value rounding
    * of Spark's double->decimal cast), so the result is exactly
    * reproducible and hash-comparable with a SQL gaps-and-islands oracle
    * using the same decimal cast. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], UserSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid: Long, rows: Iterator[Event], state: GroupState[List[SessionState]]) =>
          // batch-synchronous sessionization: fold sorted events into
          // gap-separated sessions; emit all (stream end flushes)
          val times = rows.map(e => (e.ts.getTime, e.event_id, e.value)).toArray
            .sortBy(t => (t._1, t._2))
          val sessions = scala.collection.mutable.ArrayBuffer.empty[SessionState]
          times.foreach { case (t, _, v) =>
            val dv = java.math.BigDecimal.valueOf(v).setScale(6, java.math.RoundingMode.HALF_UP)
            sessions.lastOption match {
              case Some(s) if t - s.end <= gapMs =>
                sessions(sessions.length - 1) = SessionState(s.start, t, s.n + 1, s.total.add(dv))
              case _ =>
                sessions += SessionState(t, t, 1, dv)
            }
          }
          state.remove()
          sessions.iterator.map(s =>
            UserSession(uid, s.start, s.end, s.n, s.total.doubleValue))
      }
  }

  /** Run gap sessionization over the events parquet as a genuine
    * file-source stream (same staging trick as
    * [[hourlyEventStatsBatchEquivalent]]) and return the final sessions —
    * stateful flatMapGroupsWithState through a real streaming query,
    * checkable against a SQL gaps-and-islands oracle. */
  def sessionizeBatchEquivalent(spark: SparkSession, dir: String,
                                gapMs: Long): Dataset[UserSession] = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val staged = java.nio.file.Files.createTempDirectory("graft_sess_src")
    staged.toFile.deleteOnExit()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    staged.resolve("events.parquet").toFile.deleteOnExit()
    val evs = spark.readStream
      .schema(batchSchema)
      .parquet(staged.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val sinkName = s"graft_sess_${System.nanoTime()}"
    val q = sessionize(evs, gapMs)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(sinkName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sinkName).as[UserSession]
  }
}
