package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus-sampling operators — the mixture/balance stage
  * of a training-data pipeline (up/down-weight languages or sources,
  * cap runaway groups) built so the SAME selection comes out of every
  * engine and every run:
  *
  *  - [[DatasetSampleOps.mixtureSample]] keeps a row iff a Knuth
  *    multiplicative hash of its id, folded to a unit fraction, falls
  *    under its group's rate. The hash is plain integer arithmetic
  *    (`(id * 2654435761) mod 2^32` — the same SQL-expressible sampler
  *    the IVF centroid chooser uses), so DuckDB replays the exact row
  *    set and the driver hash-checks it. No shuffle, no sort: one
  *    codegen'd filter over the scan.
  *  - [[DatasetSampleOps.groupCap]] keeps the top `cap` rows per group
  *    under a deterministic total order. One hash shuffle on the group
  *    key; the rank filter is a WindowGroupLimit, so each map task
  *    pre-prunes to `cap` rows per group before the shuffle — the
  *    shuffle carries at most cap * tasks rows per group however large
  *    the group is (low-cardinality group keys are the norm here:
  *    languages, sources).
  */
object SampleOps {

  /** Unit-interval fold of the Knuth multiplicative hash of `id` —
    * deterministic, engine-portable (exact in any engine with 64-bit
    * integers; the fraction is < 2^32 so the double compare is exact).
    * The id is masked to 32 bits and the multiply runs in two 16-bit
    * halves, so no intermediate exceeds 2^49 — the naive
    * `id * 2654435761` overflows Long past id ~3.5e9 (silent wrap in
    * non-ANSI Spark, an error in ANSI Spark and DuckDB), well inside a
    * 100-TB corpus's id space. Engine-exact replay additionally
    * requires NON-NEGATIVE ids: SQL `%` truncates toward zero on
    * negatives where Spark's pmod floors, so the two engines mask a
    * negative id to different residues. */
  private def knuthFrac(id: Column): Column =
    graft.functions.knuth32(id) / 4294967296.0

  implicit class DatasetSampleOps[T](private val ds: Dataset[T]) extends AnyVal {

    /** Per-group Bernoulli sampling at each group's `rates` rate
      * (groups not listed keep `defaultRate`). Selection depends only
      * on (id, rates) — stable across runs, partitionings, and
      * engines. */
    def mixtureSample(groupCol: String, idCol: String,
                      rates: Map[String, Double],
                      defaultRate: Double = 0.0): DataFrame = {
      require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
        "sampling rates must be in [0, 1]")
      val rate = rates.foldLeft(lit(defaultRate)) { case (e, (g, r)) =>
        when(col(groupCol) === g, lit(r)).otherwise(e)
      }
      ds.toDF.filter(knuthFrac(col(idCol)) < rate)
    }

    /** Deterministic train/val/test split assignment: adds a `split`
      * column naming, for each row, the first split whose cumulative
      * fraction bound exceeds the row's Knuth-hash unit fraction
      * ([[knuthFrac]]). Selection depends only on (id, fractions) —
      * stable across runs, partitionings, engines, and corpus growth
      * (a row keeps its split when new rows arrive, the property that
      * makes hash splits the standard over random ones). Because the
      * hash ignores every other column, the split is automatically
      * stratified: any subpopulation (language, source) lands in each
      * split in the same proportions. No shuffle: one codegen'd
      * when-chain over the scan.
      *
      * Fractions must sum to 1 (±1e-9); the LAST split absorbs the
      * upper tail so every row is assigned. For bit-exact SQL
      * replay pick fractions whose cumulative sums are exact binary
      * doubles (0.75/0.125/0.125, not 0.8/0.1/0.1 whose 0.8+0.1
      * folds to 0.9000000000000001). */
    def splitAssign(idCol: String, splits: Seq[(String, Double)]): DataFrame = {
      require(splits.nonEmpty, "need at least one split")
      require(splits.forall(_._2 > 0.0), s"fractions must be > 0: $splits")
      require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
        s"fractions must sum to 1, got ${splits.map(_._2).sum}")
      val bounds = splits.init.scanLeft(0.0)(_ + _._2).tail // cumulative, sans 1.0
      val f = knuthFrac(col(idCol))
      val assign = splits.init.zip(bounds)
        .foldRight(lit(splits.last._1): Column) { case (((name, _), b), e) =>
          when(f < b, lit(name)).otherwise(e)
        }
      ds.toDF.withColumn("split", assign)
    }

    /** Temperature-scaled mixture rebalancing (the standard
      * multilingual recipe: sample group g with probability
      * proportional to n_g^alpha, alpha < 1 up-weighting the tail so
      * head languages/sources stop dominating). Computes each group's
      * deterministic keep rate
      * `min(1, budget * share_g / n_g)` with `share_g = n_g^alpha /
      * SUM_h n_h^alpha`, then selects rows with the same Knuth-hash
      * Bernoulli filter as [[mixtureSample]] — so the expected kept
      * count is ~`budget` rows distributed by the tempered shares, and
      * the selection is stable across runs, partitionings, engines,
      * and corpus growth. Output = input columns + the group's
      * `samp_rate`.
      *
      * `alphaQuarters` expresses alpha in quarters (1 => 0.25,
      * 2 => 0.5, 3 => 0.75, 4 => 1.0): these powers evaluate as a
      * fixed chain of correctly-rounded `sqrt`s and one multiply, so
      * every engine computes bit-identical shares — the repo-wide
      * log-free discipline (`pow(x, a)` carries no correct-rounding
      * guarantee; `ln`-space mixing would break the hash oracle).
      *
      * Scale shape: ONE partial-combined count per group (table size =
      * #groups: languages, sources — tiny), a decimal-exact share
      * denominator (order-independent), rates broadcast back onto the
      * corpus, then a shuffle-free codegen'd filter. The corpus never
      * shuffles. */
    def temperatureMixture(groupCol: String, idCol: String,
                           alphaQuarters: Int, budget: Long): DataFrame = {
      require(alphaQuarters >= 1 && alphaQuarters <= 4,
        s"alphaQuarters must be 1..4, got $alphaQuarters")
      require(budget >= 0, s"budget must be >= 0, got $budget")
      def qpow(n: Column): Column = {
        val d = n.cast("double")
        alphaQuarters match {
          case 1 => sqrt(sqrt(d))
          case 2 => sqrt(d)
          case 3 => sqrt(d) * sqrt(sqrt(d))
          case 4 => d
        }
      }
      val counts = ds.toDF.groupBy(col(groupCol))
        .agg(count(lit(1)).as("__graft_tn"))
        .withColumn("__graft_s", qpow(col("__graft_tn")))
      // decimal-exact denominator: order- and partition-independent
      // (38,6 headroom — group shares can reach n_g^1.0 at alpha=1)
      val tot = counts.agg(
        sum(col("__graft_s").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
          .cast("double").as("__graft_tot"))
      val ratesT = counts.crossJoin(broadcast(tot))
        .select(col(groupCol),
          least(lit(1.0),
            lit(budget).cast("double") * (col("__graft_s") / col("__graft_tot")) /
              col("__graft_tn").cast("double"))
            .as("samp_rate"))
      ds.toDF.join(broadcast(ratesT), Seq(groupCol))
        .filter(knuthFrac(col(idCol)) < col("samp_rate"))
    }

    /** Exact-size stratified sample: exactly `min(k, n_g)` rows from
      * each group, chosen uniformly and deterministically — the
      * fixed-budget counterpart of [[mixtureSample]]'s expected-rate
      * Bernoulli draw (eval sets, per-language probes, and audit
      * samples need exact counts, not a rate whose realization
      * drifts ±√n). Rows are ranked inside each group by their Knuth
      * unit fraction ([[knuthFrac]], id tie-break): the hash order is
      * uniform over any id encoding, independent of every other
      * column, and stable across runs, partitionings, and engines —
      * though (unlike the Bernoulli filter) a row's MEMBERSHIP can
      * change when the group gains new rows, the price of exactness.
      *
      * Scale shape: the rank-`k` window filter plans as
      * WindowGroupLimit, so every map task pre-prunes to ≤ k rows per
      * group before the one group shuffle — a billion-row language
      * still ships only k·tasks candidates. */
    def stratifiedSample(groupCol: String, idCol: String, k: Int): DataFrame = {
      require(k >= 1, s"k must be >= 1, got $k")
      ds.toDF.groupCap(groupCol, k,
        Seq(knuthFrac(col(idCol)).asc, col(idCol).asc))
    }

    /** Leakage-free train/val/test split: assign every row the split of
      * its NEAR-DUP COMPONENT, not of its own id — the correction that
      * keeps a document and its near-duplicates on the same side of the
      * split (id-hash splits scatter a duplicate cluster across
      * train/test, and the model "generalizes" to test examples it
      * memorized from train — the classic dedup-blind eval leak).
      * `pairs` is any near-dup pair list ([[graft.operators.DedupOps]]
      * minhash/simhash/n-gram/winnow/embedding generators all fit);
      * components come from the pointer-doubling propagation and the
      * component label (its min reachable id) feeds the SAME Knuth-hash
      * assignment as [[splitAssign]], so unpaired documents fall
      * exactly where plain splitAssign would put them... IF their own
      * id is their component — which it is, by the min-id labeling.
      * Returns `(id, component, split)`.
      *
      * Scale shape: [[graft.operators.DedupOps]] component propagation
      * (O(log n) rounds) + one shuffle-free codegen'd split projection. */
    def leakageFreeSplit(idCol: String, pairs: DataFrame,
                         splits: Seq[(String, Double)],
                         id1: String = "id1", id2: String = "id2"): DataFrame = {
      import graft.operators.DedupOps._
      ds.toDF.nearDupComponents(idCol, pairs, id1, id2)
        .splitAssign("component", splits)
        .select(col(idCol), col("component"), col("split"))
    }

    /** Deterministic random-negative mining for contrastive training:
      * each row gets `k` pseudo-random partners drawn from its HASH
      * BUCKET by circular offset — the scalable stand-in for "sample k
      * uniform negatives per anchor" (a true global draw needs a
      * global index; hash buckets + within-bucket rotation give
      * hash-uniform partners with only bucket-local coordination).
      * Returns `(id, neg_id, j)` for offsets `j = 1..k`; self-partners
      * (only possible when a bucket has ≤ k members) are dropped.
      * Selection is a pure function of (id, k, buckets, seed) —
      * stable across runs, partitionings, and engines.
      *
      * Scale shape: one window rank per bucket (size the bucket count
      * so buckets hold thousands of rows — the window sorts ONLY
      * within a bucket), then a (bucket, rank)-keyed equi-join; k
      * rides as one explode. Anchors and negatives are id-only — the
      * caller joins payloads back by id. */
    def mineNegatives(idCol: String, k: Int, buckets: Int,
                      seed: Long = 0L): DataFrame = {
      require(k >= 1 && buckets >= 1)
      val bucketed = ds.toDF.select(col(idCol).as("__graft_mid"))
        .withColumn("__graft_b",
          floor(knuthFrac(col("__graft_mid") + lit(seed)) * buckets).cast("int"))
        .withColumn("__graft_rn", row_number().over(
          Window.partitionBy(col("__graft_b"))
            .orderBy(knuthFrac(col("__graft_mid") + lit(seed + 1)).asc,
              col("__graft_mid").asc)))
      val sized = bucketed.withColumn("__graft_sz",
        count(lit(1)).over(Window.partitionBy(col("__graft_b"))))
      val wanted = sized
        // sequence(1, 0) counts DOWN (the bpePairStats guard):
        // singleton buckets must short-circuit to no offsets
        .withColumn("j", explode(when(col("__graft_sz") <= 1,
            array().cast("array<int>"))
          .otherwise(sequence(lit(1),
            least(lit(k.toLong), col("__graft_sz") - 1).cast("int")))))
        .withColumn("__graft_tr",
          pmod(col("__graft_rn") - 1 + col("j"), col("__graft_sz")) + 1)
      val targets = bucketed.select(col("__graft_b"),
        col("__graft_rn").as("__graft_tr"), col("__graft_mid").as("neg_id"))
      wanted.join(targets, Seq("__graft_b", "__graft_tr"))
        .filter(col("neg_id") =!= col("__graft_mid"))
        .select(col("__graft_mid").as(idCol), col("neg_id"), col("j"))
    }

    /** Deterministic epoch shuffle into training shards — the "global
      * random order" a distributed trainer actually consumes: every
      * epoch permutes the corpus, the permutation is materialized as
      * `(shard, pos)` so `numShards` readers each stream their own
      * shard in `pos` order, and the whole assignment is a pure
      * function of (id, epoch, numShards) — reproducible across runs,
      * partitionings, and engines (resume-safe: a crashed epoch
      * re-derives the identical order).
      *
      * The shard is the top bits of the row's Knuth-hash key
      * (`key * numShards div 2^32` — exact integer arithmetic, key <
      * 2^32 so the product stays < 2^63 for any sane shard count) and
      * `pos` ranks the key WITHIN the shard, so concatenating shards
      * 0..S-1 in pos order is one uniformly-hashed global permutation.
      * The epoch enters as an additive pre-hash offset (a bijection on
      * the masked id domain), so epochs give genuinely different
      * permutations under the SAME portable hash the samplers and
      * splitters replay in SQL.
      *
      * Scale shape: ONE hash shuffle on the shard id and a per-shard
      * sort of n/numShards rows — never a global sort, no driver
      * state; compose with [[graft.operators.CorpusOps]]' sharded
      * export to land shard-partitioned parquet. Ids must be
      * non-negative (the [[knuthFrac]] contract). */
    def epochShuffle(idCol: String, epoch: Int, numShards: Int): DataFrame = {
      require(epoch >= 0, s"epoch must be >= 0, got $epoch")
      require(numShards >= 1 && numShards <= (1 << 20),
        s"numShards must be in [1, 2^20], got $numShards")
      // 1000003 (prime) spaces epoch offsets far apart in the masked
      // 32-bit domain; the shift is a bijection, so each epoch is a
      // full permutation, not a resample
      val key = graft.functions.knuth32(col(idCol) + lit(epoch.toLong * 1000003L))
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("__graft_ek").asc, col(idCol).asc)
      ds.toDF
        .withColumn("__graft_ek", key)
        .withColumn("shard",
          floor(col("__graft_ek") * numShards / 4294967296L).cast("int"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .drop("__graft_ek")
    }

    /** Keep the top `cap` rows of each group under `order` (callers
      * must make the order total — include a unique tie-break — or the
      * kept set is nondeterministic). */
    def groupCap(groupCol: String, cap: Int, order: Seq[Column]): DataFrame = {
      require(cap >= 1, s"cap must be >= 1, got $cap")
      val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
      ds.toDF.withColumn("__graft_gc_rn", row_number().over(w))
        .filter(col("__graft_gc_rn") <= cap)
        .drop("__graft_gc_rn")
    }

    /** Quality-stratified selection: keep the best `keepFrac` FRACTION
      * of every group under `order` (best-first — score descending
      * with a unique tie-break). Where [[groupCap]] cuts at an
      * absolute count, this cuts at a per-group PROPORTION, the shape
      * domain-balanced curation needs: "keep the top 25% of each
      * source by quality" prunes low-quality mass without shifting the
      * source mixture (an absolute threshold would gut strict-scoring
      * domains and keep everything from lenient ones). Every group
      * keeps `ceil(n_g * keepFrac)` rows, so no non-empty group is
      * emptied.
      *
      * Deterministic and engine-replayable when `order` is a total
      * order and `keepFrac` is an exact binary fraction (0.25, 0.5,
      * 0.375 — the [[splitAssign]] discipline: `n * keepFrac` is then
      * one exact IEEE multiply in every engine). Scale shape: ONE hash
      * shuffle on the group key; the rank and the group count ride the
      * same window partitioning (one exchange, one sort), and the
      * filter is codegen'd — no joins, no driver state. */
    def groupTopFraction(groupCol: String, keepFrac: Double,
                         order: Seq[Column]): DataFrame = {
      require(keepFrac > 0.0 && keepFrac <= 1.0,
        s"keepFrac must be in (0, 1], got $keepFrac")
      val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
      val wc = Window.partitionBy(col(groupCol))
      ds.toDF
        .withColumn("__graft_tf_rn", row_number().over(w))
        .withColumn("__graft_tf_n", count(lit(1)).over(wc))
        .filter(col("__graft_tf_rn") <=
          ceil(col("__graft_tf_n") * keepFrac).cast("long"))
        .drop("__graft_tf_rn", "__graft_tf_n")
    }
  }
}
