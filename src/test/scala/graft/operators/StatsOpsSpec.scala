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
}
