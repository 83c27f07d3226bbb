package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped numeric statistics with certified sketches — the
  * [[CorpusOps.DatasetCorpusOps.vocabStats]] discipline applied to
  * quantiles: the exact answer and the mergeable sketch side by side,
  * with a boolean verdict that the sketch honored its bound. At 100 TB
  * run the sketch alone (`approx_percentile` is a fixed-size mergeable
  * digest, one partial-combined aggregation, no sort); the exact path
  * exists so small-scale runs can certify the sketch's contract before
  * trusting it where exact is unaffordable.
  */
object StatsOps {

  /** Exact per-group quantile by the SQL-portable rank interpolation —
    * the [[DatasetStatsOps.quantileStats]] arithmetic factored for
    * reuse (same IEEE graph, so anything built on it stays
    * hash-oracle-able). Returns `(group, <out>)`. */
  private def exactQuantile(df: org.apache.spark.sql.DataFrame,
                            groupCol: String, v: org.apache.spark.sql.Column,
                            q: Double, out: String): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
    val ranked = df.select(col(groupCol), v.cast("double").as("__v"))
      .withColumn("__rn", row_number().over(w).cast("long") - 1L)
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val kD = floor(lit(q) * (col("__n") - 1L).cast("double"))
    ranked.filter(col("__rn").cast("double") === kD ||
        col("__rn").cast("double") === kD + 1.0)
      .groupBy(col(groupCol))
      .agg(first(col("__n")).as("__gn"),
        max(when(col("__rn").cast("double") === kD, col("__v"))).as("__lo"),
        max(when(col("__rn").cast("double") === kD + 1.0, col("__v"))).as("__hi"))
      .select(col(groupCol),
        (col("__lo") + (coalesce(col("__hi"), col("__lo")) - col("__lo")) *
          (lit(q) * (col("__gn") - 1L).cast("double") -
            floor(lit(q) * (col("__gn") - 1L).cast("double")))).as(out))
  }

  implicit class DatasetStatsOps[T](private val ds: Dataset[T]) extends AnyVal {

    /** Robust per-group outlier filter by median absolute deviation:
      * keep rows with `|v - median| <= k * MAD`, where median and MAD
      * are the EXACT per-group statistics (the [[quantileStats]] rank
      * interpolation — not a sketch, and not mean/stddev, which an
      * outlier itself drags; median/MAD have a 50% breakdown point,
      * which is why curation pipelines clip on them). Appends the
      * group's `median` and `mad` columns to the kept rows. A group
      * with `MAD = 0` (at least half its values equal the median) has
      * no scale estimate — the filter keeps the whole group by
      * convention rather than inventing one.
      *
      * Scale shape: two window passes (value ranks, deviation ranks) —
      * each ONE hash shuffle + per-group sort, the quantileStats cost
      * model — and two broadcast joins of #groups-row stat tables; the
      * kept set never shuffles. Every arithmetic step is the proven
      * rank-interpolation IEEE graph, so the filter decision replays
      * bit-for-bit in any engine (hash-oracle-able). */
    def robustOutlierFilter(groupCol: String, valueCol: String,
                            k: Double = 3.5): DataFrame = {
      require(k > 0.0, s"k must be > 0, got $k")
      val df = ds.toDF
      val med = StatsOps.exactQuantile(
        df.select(col(groupCol), col(valueCol)), groupCol,
        col(valueCol), 0.5, "median")
      val withMed = df.join(broadcast(med), Seq(groupCol))
        .withColumn("__dev", abs(col(valueCol).cast("double") - col("median")))
      val mad = StatsOps.exactQuantile(
        withMed.select(col(groupCol), col("__dev")), groupCol,
        col("__dev"), 0.5, "mad")
      withMed.join(broadcast(mad), Seq(groupCol))
        .filter(col("mad") === 0.0 || col("__dev") <= lit(k) * col("mad"))
        .drop("__dev")
    }

    /** Per-group quantiles of `valueCol` at each q in `qs`:
      * `(group, q, n, exact, within_bound)`.
      *
      * The exact value deliberately does NOT use Spark's `percentile`
      * aggregate: its internal interpolation arithmetic is not
      * SQL-portable. Instead the classic rank interpolation is spelled
      * out in plain column arithmetic —
      * `k = floor(q*(n-1))`, `frac = q*(n-1) - k`,
      * `exact = v[k] + (v[k+1] - v[k]) * frac` — over a per-group
      * `row_number` ranking, so ANY engine replays the identical IEEE
      * graph and the result hash-matches. Ties in `valueCol` are safe
      * without a tiebreak: equal values make rank-k well-defined
      * whatever order `row_number` picks.
      *
      * Scale shape: the exact path costs ONE hash shuffle + per-group
      * sort (the window), then a filter keeping <= 2 rows per
      * (group, q) and a tiny aggregation; the sketch rides the same
      * plan as one more aggregate. The verdict bounds the sketch's
      * VALUE error relative to the exact quantile; the sketch's own
      * guarantee is on rank (<= n/accuracy ranks), so `bound` should be
      * sized to the data's local density — the certify step is exactly
      * the place that check happens. */
    def quantileStats(groupCol: String, valueCol: String, qs: Seq[Double],
                      accuracy: Int = 10000, bound: Double = 0.01): DataFrame = {
      require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0))
      val df = ds.toDF
      val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      val ranked = df.select(col(groupCol), col(valueCol).cast("double").as("__v"))
        .withColumn("__rn", row_number().over(w).cast("long") - 1L)
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      val sketch = df.groupBy(col(groupCol))
        .agg(percentile_approx(col(valueCol).cast("double"),
          array(qs.map(lit): _*), lit(accuracy)).as("__apx"))
      // ONE window pass: keep every row that is a rank-k or rank-k+1
      // witness for ANY q, then a single conditional aggregation pulls
      // all the lo/hi values out — the naive per-q formulation re-ran
      // the window |qs| times (measured 3x the cost at sf0.1)
      def kD(q: Double) = floor(lit(q) * (col("__n") - 1L).cast("double"))
      val anyWitness = qs.map { q =>
        col("__rn").cast("double") === kD(q) ||
          col("__rn").cast("double") === kD(q) + 1.0
      }.reduce(_ || _)
      val loHi = qs.zipWithIndex.flatMap { case (q, i) => Seq(
        max(when(col("__rn").cast("double") === kD(q), col("__v"))).as(s"__lo$i"),
        max(when(col("__rn").cast("double") === kD(q) + 1.0, col("__v"))).as(s"__hi$i"))
      }
      val aggd = ranked.filter(anyWitness)
        .groupBy(col(groupCol))
        .agg(first(col("__n")).as("n"), loHi: _*)
      // unpivot to (group, q, exact) rows with ONE explode projection —
      // a per-q union would re-run the whole window chain per branch
      // (DataFrame reuse is not plan reuse; measured 4x the window cost)
      val qStructs = qs.zipWithIndex.map { case (q, i) =>
        val lo = col(s"__lo$i"); val hi = col(s"__hi$i")
        struct(lit(q).as("q"),
          (lo + (coalesce(hi, lo) - lo) *
            (lit(q) * (col("n") - 1L).cast("double") -
              floor(lit(q) * (col("n") - 1L).cast("double"))))
            .as("exact"),
          lit(i).as("__qi"))
      }
      val perQ = aggd
        .select(col(groupCol), col("n"), explode(array(qStructs: _*)).as("__e"))
        .select(col(groupCol), col("__e.q").as("q"), col("n"),
          col("__e.exact").as("exact"), col("__e.__qi").as("__qi"))
      perQ.join(sketch, Seq(groupCol))
        .withColumn("__a", element_at(col("__apx"), col("__qi") + 1))
        .withColumn("within_bound",
          abs(col("__a") - col("exact")) <=
            lit(bound) * greatest(abs(col("exact")), lit(1e-9)))
        .select(col(groupCol), col("q"), col("n"), col("exact"),
          col("within_bound"))
    }

    /** Shuffle-key skew diagnostics — the audit a plan review runs
      * BEFORE a big join or aggregation ships: the `topN` heaviest
      * values of `keyCol` with exact counts, each key's share of all
      * rows, and its skew factor (count ÷ mean count per distinct
      * key; a key at skew 500 on 32 partitions means one straggler
      * task does ~16 partitions' work — the number that justifies
      * salting or an AQE skew-join threshold).
      *
      * Scale shape: ONE partial-aggregated count per key (table size =
      * distinct keys), a TakeOrdered top-N cut (per-partition heaps,
      * never a global sort), and one broadcast two-number total. The
      * totals sum as decimal (a non-ANSI long sum would wrap
      * silently); shares/skews are single pinned-shape double
      * divisions, so the whole report replays exactly. */
    def keyStats(keyCol: String, topN: Int = 20): DataFrame = {
      require(topN >= 1, s"topN must be >= 1, got $topN")
      val counts = ds.toDF.groupBy(col(keyCol))
        .agg(count(lit(1)).as("cnt"))
      val tot = counts.agg(
        sum(col("cnt").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("long").as("__t"),
        count(lit(1)).as("__k"))
      counts.orderBy(col("cnt").desc, col(keyCol).asc).limit(topN)
        .crossJoin(broadcast(tot))
        .select(col(keyCol), col("cnt"),
          (col("cnt").cast("double") / col("__t").cast("double")).as("share"),
          (col("cnt").cast("double") * col("__k").cast("double") /
            col("__t").cast("double")).as("skew"))
    }
  }
}
