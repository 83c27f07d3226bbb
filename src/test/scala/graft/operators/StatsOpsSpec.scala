package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.StatsOps._

class StatsOpsSpec extends SparkSpec {

  test("quantileStats: exact rank interpolation on a known fixture") {
    import spark.implicits._
    // group g: values 10,20,30,40,50 (n=5) -> q*(n-1) lands on exact
    // ranks for .25/.5/.75 (1,2,3) and interpolates for .9 (3.6)
    val df = Seq.tabulate(5)(i => ("g", (i + 1) * 10.0)) .toDF("grp", "v")
    val got = df.quantileStats("grp", "v", Seq(0.25, 0.5, 0.75, 0.9))
      .collect().map(r => r.getDouble(1) -> (r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(got(0.25) === ((5L, 20.0, true)))
    assert(got(0.5) === ((5L, 30.0, true)))
    assert(got(0.75) === ((5L, 40.0, true)))
    // 0.9 * 4 = 3.6 -> 40 + (50-40)*(the IEEE frac of 3.6)
    val (_, v9, ok9) = got(0.9)
    assert(v9 === 40.0 + (50.0 - 40.0) * (0.9 * 4.0 - 3.0))
    // the verdict catches the sketch's honest limitation here: the
    // digest returns a data ELEMENT (50.0) while exact interpolates
    // (46.0) — on a 5-row group that gap is far outside 1%, and
    // certification exists precisely to surface that before the sketch
    // is trusted at scales where nothing would check it
    assert(!ok9)
  }

  test("quantileStats: q=1.0 and n=1 edges, partition-independent") {
    import spark.implicits._
    val df = (Seq(("a", 7.0)) ++ Seq.tabulate(10)(i => ("b", i.toDouble)))
      .toDF("grp", "v")
    val got = df.quantileStats("grp", "v", Seq(0.0, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    assert(got(("a", 0.0)) === 7.0 && got(("a", 1.0)) === 7.0)
    assert(got(("b", 0.0)) === 0.0 && got(("b", 1.0)) === 9.0)
    val rep = df.repartition(7).quantileStats("grp", "v", Seq(0.0, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    assert(rep === got)
  }

  test("quantileStats: sketch verdict holds on the lineitem prices") {
    val li = graft.Tables.lineitem(spark, sf())
    val got = li.quantileStats("l_returnflag", "l_extendedprice",
      Seq(0.25, 0.5, 0.75, 0.95))
      .collect()
    assert(got.length === 12)
    assert(got.forall(_.getBoolean(4)), "sketch outside bound")
    // exact quantiles are monotone in q within each group
    got.groupBy(_.getString(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getDouble(1)).map(_.getDouble(3))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
  }

  test("robustOutlierFilter: MAD clip on a known fixture, MAD=0 keeps the group") {
    import spark.implicits._
    // group a: values 10,10,11,12,13,100 -> median 11.5, deviations
    // (1.5,1.5,0.5,0.5,1.5,88.5) sorted (0.5,0.5,1.5,1.5,1.5,88.5) ->
    // MAD 1.5; k=3 keeps |v-11.5| <= 4.5 -> drops only 100
    // group b: all equal -> MAD 0 -> whole group kept by convention
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 11.0),
      ("a", 4L, 12.0), ("a", 5L, 13.0), ("a", 6L, 100.0),
      ("b", 7L, 5.0), ("b", 8L, 5.0), ("b", 9L, 5.0)
    ).toDF("g", "id", "v")
    val got = df.robustOutlierFilter("g", "v", k = 3.0)
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L))
    val aRow = got.find(_._1 == 1L).get
    assert(aRow._2 === 11.5 && aRow._3 === 1.5)
    val bRow = got.find(_._1 == 7L).get
    assert(bRow._2 === 5.0 && bRow._3 === 0.0)
  }

  test("robustOutlierFilter is partition-independent and immune to extreme outliers") {
    import spark.implicits._
    val rng = new scala.util.Random(47)
    val rows = (0 until 200).map { i =>
      val v = if (i % 50 == 0) 1e9 else 100.0 + rng.nextGaussian()
      (s"g${i % 2}", i.toLong, v)
    }
    val df = rows.toDF("g", "id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      d.robustOutlierFilter("g", "v", k = 3.5)
        .collect().map(_.getLong(1)).sorted.toSeq
    val kept = run(df)
    // the 1e9 spikes are dropped (mean/stddev clipping would have been
    // dragged by them; median/MAD is not)
    assert(rows.filter(_._3 == 1e9).map(_._2).forall(id => !kept.contains(id)))
    assert(kept.size >= 180)
    assert(kept === run(df.repartition(13)))
  }

  test("keyStats: exact counts, shares, skew factors on a hand fixture") {
    import spark.implicits._
    // key 1: 6 rows, key 2: 3, key 3: 1 -> total 10, k=3, mean 10/3
    val rows = (Seq.fill(6)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }
    val got = rows.toDF("id", "key").keyStats("key", topN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sortBy(-_._2).toSeq
    assert(got.map(t => (t._1, t._2)) === Seq((1L, 6L), (2L, 3L)))
    assert(got(0)._3 === 6.0 / 10.0)
    assert(got(0)._4 === 6.0 * 3.0 / 10.0)
    assert(got(1)._3 === 3.0 / 10.0)
    assert(got(1)._4 === 3.0 * 3.0 / 10.0)
  }

  test("keyStats: partition-independent; TakeOrdered cut, no global sort") {
    val li = graft.Tables.lineitem(spark, sf())
    def run(d: org.apache.spark.sql.DataFrame) =
      d.keyStats("l_suppkey", topN = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).sortBy(_._1).toSeq
    val a = run(li)
    assert(a.size === 10 && a === run(li.repartition(13)))
    val plan = li.keyStats("l_suppkey", topN = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-N must cut via per-partition heaps:\n$plan")
  }
}
