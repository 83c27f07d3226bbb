package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.operators.TemporalOps._

class TemporalOpsSpec extends SparkSpec {

  test("asOfJoin: backward inclusive match, outer nulls, tie to greatest id") {
    import spark.implicits._
    val l = Seq(
      (10L, 1L, 100L),  // before any right row -> nulls
      (11L, 1L, 200L),  // matches r at 200 exactly (inclusive)
      (12L, 1L, 250L),  // matches r at 200, not 300
      (13L, 1L, 300L),  // two right rows at 300: greatest tie (91) wins
      (14L, 2L, 500L),  // other key: its own timeline
      (15L, 3L, 500L)   // key with no right rows at all -> nulls
    ).toDF("event_id", "user_id", "t")
    val r = Seq(
      (90L, 1L, 200L, 1.0),
      (91L, 1L, 300L, 2.0),
      (92L, 1L, 300L, 3.0),
      (93L, 2L, 400L, 4.0)
    ).toDF("r_id", "r_user", "r_t", "r_v")
    // deliberately pass tie 92 vs 91 order: greatest r_id at equal r_t wins
    val got = l.asOfJoin(r, Seq("user_id"), Seq("r_user"), "t", "r_t", "r_id")
      .select("event_id", "r_id", "r_t", "r_v").collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some((x.getLong(1), x.getLong(2), x.getDouble(3)))))
      .toMap
    assert(got(10L) === None)
    assert(got(11L) === Some((90L, 200L, 1.0)))
    assert(got(12L) === Some((90L, 200L, 1.0)))
    assert(got(13L) === Some((92L, 300L, 3.0)))
    assert(got(14L) === Some((93L, 400L, 4.0)))
    assert(got(15L) === None)
  }

  test("asOfJoin plans as one shuffle + running window, NO join node") {
    val ev = Tables.events(spark, sf())
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_event_id"))
    val df = clicks.asOfJoin(purchases, Seq("user_id"), Seq("user_id"),
      "ts", "p_ts", "p_event_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"as-of must not plan a join node:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly one hash shuffle, got $shuffles:\n$plan")
    // and it must agree with the quadratic argmax reference on real data:
    // max over (p_ts, p_event_id) structs = greatest time then greatest
    // tie; max ignores nulls, so no-prior-purchase events map to null
    val want = clicks.join(purchases, Seq("user_id"), "left")
      .groupBy(col("event_id"))
      .agg(max(when(col("p_ts") <= col("ts"),
        struct(col("p_ts"), col("p_event_id")))).as("m"))
      .select(col("event_id"), col("m.p_event_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val got = df.select(col("event_id"), col("p_event_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === want)
  }

  test("intervalJoin: inclusive containment, matches the naive theta join") {
    import spark.implicits._
    val l = Seq((1L, 1L, 100L), (2L, 1L, 150L), (3L, 1L, 201L), (4L, 2L, 100L))
      .toDF("id", "k", "t")
    val r = Seq((10L, 1L, 100L, 200L), (11L, 1L, 140L, 160L), (12L, 2L, 300L, 400L))
      .toDF("w_id", "w_k", "w_start", "w_end")
    val got = l.intervalJoin(r, Seq("k"), Seq("w_k"), "t", "w_start", "w_end",
        bucketWidth = 50L)
      .select("id", "w_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // id=1 in [100,200] only; id=2 in both windows; id=3 past 200 (inclusive
    // end misses by 1); id=4 outside key-2's window
    assert(got === Set((1L, 10L), (2L, 10L), (2L, 11L)))
    // bucket width must not change the result, only the replication
    for (w <- Seq(1L, 7L, 1000L)) {
      val alt = l.intervalJoin(r, Seq("k"), Seq("w_k"), "t", "w_start", "w_end", w)
        .select("id", "w_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(alt === got, s"bucketWidth=$w changed the result")
    }
  }

  test("intervalJoin plans an equi-join on (key, bucket), not a cross") {
    import spark.implicits._
    val l = Tables.events(spark, sf()).filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"))
    val r = Tables.events(spark, sf()).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        unix_micros(col("ts")).as("ws"),
        (unix_micros(col("ts")) + 7200000000L).as("we"))
    val df = l.intervalJoin(r, Seq("user_id"), Seq("user_id"), "t", "ws", "we",
      bucketWidth = 7200000000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"interval join must not cross:\n$plan")
    assert(df.count() > 0, "fixture produced no in-window pairs")
  }

  test("intervalJoin auto width equals any fixed width (width is perf-only)") {
    import spark.implicits._
    val l = Seq((1L, 1L, 100L), (2L, 1L, 150L), (3L, 1L, 201L), (4L, 2L, 100L))
      .toDF("id", "k", "t")
    val r = Seq((10L, 1L, 100L, 200L), (11L, 1L, 140L, 160L), (12L, 2L, 300L, 400L))
      .toDF("w_id", "w_k", "w_start", "w_end")
    val auto = l.intervalJoin(r, Seq("k"), Seq("w_k"), "t", "w_start", "w_end")
      .select("id", "w_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val fixed = l.intervalJoin(r, Seq("k"), Seq("w_k"), "t", "w_start", "w_end", 50L)
      .select("id", "w_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(auto === fixed && auto.nonEmpty)
  }

  test("asOfJoin rejects name clashes and bad key lists") {
    import spark.implicits._
    val l = Seq((1L, 1L, 1L)).toDF("id", "k", "t")
    val r = Seq((1L, 1L, 1L)).toDF("id", "k", "rt")
    intercept[IllegalArgumentException] {
      l.asOfJoin(r, Seq("k"), Seq("k"), "t", "rt", "id") // right `id` clashes
    }
    intercept[IllegalArgumentException] {
      l.asOfJoin(r, Seq.empty, Seq.empty, "t", "rt", "id")
    }
  }
}
