package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.operators.SampleOps._

class SampleOpsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf())

  test("mixtureSample: rate 1 keeps a group whole, rate 0 drops it, others thin") {
    val langs = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val keep = langs.keySet.head
    val out = docs.mixtureSample("lang", "doc_id", Map(keep -> 1.0))
    val outLangs = out.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(outLangs === Map(keep -> langs(keep)),
      "rate 1 keeps the listed group whole; default 0 drops the rest")

    val half = docs.mixtureSample("lang", "doc_id",
      Map.empty, defaultRate = 0.5).count().toDouble / docs.count()
    assert(half > 0.3 && half < 0.7, s"rate-0.5 kept fraction off: $half")
  }

  test("mixtureSample: selection is a deterministic function of (id, rates)") {
    val a = docs.mixtureSample("lang", "doc_id", Map.empty, defaultRate = 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = docs.repartition(7).mixtureSample("lang", "doc_id", Map.empty, defaultRate = 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b && a.nonEmpty, "partitioning must not change the kept set")
  }

  test("mixtureSample: corpus-scale ids don't overflow the Knuth hash") {
    import spark.implicits._
    // the naive (id * 2654435761) wraps Long past id ~3.5e9 (and errors
    // in ANSI engines); the two-halves form must agree with reference
    // integer arithmetic at the extreme id. DuckDB on the same formula
    // gives hash32(Long.MaxValue) = 1640531535 -> frac ~0.3820.
    val big = Seq((Long.MaxValue, "en"), (3499999999L, "en"), (0L, "en"))
      .toDF("doc_id", "lang")
    val kept = big.mixtureSample("lang", "doc_id", Map("en" -> 0.383))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // frac(MaxValue) ~= 0.38199 < 0.383 (kept); frac(0) = 0 (kept)
    assert(kept.contains(Long.MaxValue) && kept.contains(0L))
    val dropped = big.mixtureSample("lang", "doc_id", Map("en" -> 0.381))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!dropped.contains(Long.MaxValue), "frac(MaxValue) must be ~0.382")
  }

  test("mixtureSample plans as one shuffle-free codegen'd filter") {
    val plan = docs.mixtureSample("lang", "doc_id", Map("en" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mixture sampling must not shuffle:\n$plan")
  }

  test("splitAssign: total partition, deterministic, agrees with mixtureSample") {
    val out = docs.splitAssign("doc_id",
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    // every row assigned exactly one split, no row lost
    assert(out.count() === docs.count())
    val bySplit = out.groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"),
      s"all three splits must be populated: $bySplit")
    // the hash ignores partitioning
    val a = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = docs.repartition(7).splitAssign("doc_id",
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    // split 'train' is EXACTLY the f < 0.75 region: the mixtureSample
    // keep set at rate 0.75 (same hash, same bound)
    val train = a.collect { case (id, "train") => id }.toSet
    val sampled = docs.mixtureSample("lang", "doc_id", Map.empty, defaultRate = 0.75)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(train === sampled)
  }

  test("splitAssign: stratified for free — per-lang shares track the fractions") {
    val out = docs.splitAssign("doc_id",
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    val perLang = out.groupBy(col("lang"), col("split")).count().collect()
      .groupBy(_.getString(0))
    perLang.foreach { case (lang, rows) =>
      val total = rows.map(_.getLong(2)).sum.toDouble
      val trainShare = rows.find(_.getString(1) == "train")
        .map(_.getLong(2)).getOrElse(0L) / total
      assert(trainShare > 0.55 && trainShare < 0.95,
        s"$lang train share $trainShare far from 0.75")
    }
  }

  test("splitAssign rejects fractions that don't sum to 1") {
    intercept[IllegalArgumentException] {
      docs.splitAssign("doc_id", Seq("train" -> 0.8, "val" -> 0.1))
    }
    intercept[IllegalArgumentException] {
      docs.splitAssign("doc_id", Seq.empty)
    }
  }

  test("groupCap: at most cap rows per group, exactly the order's top rows") {
    val out = docs.groupCap("lang", 5, Seq(col("n_chars").desc, col("doc_id").asc))
    val byLang = out.select("lang", "doc_id").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(byLang.values.forall(_.size <= 5))
    // spot-check one group against a driver-side sort
    val (lang, got) = byLang.head
    val want = docs.filter(col("lang") === lang)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, n) => (-n, id) }.take(5).map(_._1).toSet
    assert(got === want)
  }

  test("groupCap rank filter stays a WindowGroupLimit (map-side pre-prune)") {
    val plan = docs.groupCap("lang", 5, Seq(col("n_chars").desc, col("doc_id").asc))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"cap must pre-prune before the shuffle:\n$plan")
  }

  test("temperatureMixture: tempered rates up-weight the tail, budget respected") {
    import spark.implicits._
    // 400/100/25 skew: alpha=0.5 shares prop to 20/10/5, so the tail
    // group's keep RATE is the highest and the head's the lowest
    val fixture = ((0 until 400).map(i => (i.toLong, "en")) ++
      (1000 until 1100).map(i => (i.toLong, "de")) ++
      (2000 until 2025).map(i => (i.toLong, "fr"))).toDF("doc_id", "lang")
    val got = fixture.temperatureMixture("lang", "doc_id",
      alphaQuarters = 2, budget = 100L)
    val rates = got.select(col("lang"), col("samp_rate")).distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("fr") > rates("de") && rates("de") > rates("en"),
      s"rates not tempered: $rates")
    // expected kept mass = sum rate_g * n_g = budget (no group capped at 1)
    val expected = rates("en") * 400 + rates("de") * 100 + rates("fr") * 25
    assert(math.abs(expected - 100.0) < 1e-6, s"expected mass $expected")
    // alpha = 1.0 degenerates to uniform rates (share_g = n_g / N)
    val uni = fixture.temperatureMixture("lang", "doc_id",
        alphaQuarters = 4, budget = 100L)
      .select(col("lang"), col("samp_rate")).distinct()
      .collect().map(_.getDouble(1)).distinct
    assert(uni.length == 1, s"alpha=1 rates not uniform: ${uni.toSeq}")
  }

  test("temperatureMixture: deterministic, partition-independent, corpus never shuffles") {
    import spark.implicits._
    val fixture = (0 until 300).map(i => (i.toLong, s"g${i % 4}"))
      .toDF("doc_id", "lang")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.temperatureMixture("lang", "doc_id", alphaQuarters = 3, budget = 60L)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(run(fixture) === run(fixture.repartition(11)))
    val plan = fixture.temperatureMixture("lang", "doc_id", 2, 60L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rates must broadcast onto the corpus:\n$plan")
  }

  test("leakageFreeSplit: clusters never straddle; singletons = splitAssign") {
    import spark.implicits._
    val ids = (1L to 400L).map(i => (i, s"doc $i"))
    val df = ids.toDF("doc_id", "text")
    // chain pairs clustering ids into groups of 4: {1..4}, {5..8}, ...
    val pairs = (1L to 400L).filter(_ % 4 != 0)
      .map(i => (i, i + 1)).toDF("id1", "id2")
    val out = df.leakageFreeSplit("doc_id", pairs,
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length === 400)
    // every member of a cluster carries the cluster-min component and
    // ONE split
    out.groupBy(t => (t._1 - 1) / 4).foreach { case (g, rows) =>
      assert(rows.map(_._2).toSet === Set(g * 4 + 1),
        s"cluster $g mislabeled: ${rows.toSeq}")
      assert(rows.map(_._3).toSet.size === 1,
        s"cluster $g straddles splits: ${rows.toSeq}")
    }
    // an unpaired doc falls exactly where plain splitAssign puts it
    val solo = Seq((999L, "solo")).toDF("doc_id", "text")
    val a = solo.leakageFreeSplit("doc_id",
        Seq.empty[(Long, Long)].toDF("id1", "id2"),
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .collect()(0).getString(2)
    val b = solo.splitAssign("doc_id",
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .collect()(0).getString(2)
    assert(a === b)
  }

  test("mineNegatives: k distinct non-self partners, bucket-local, stable") {
    import spark.implicits._
    val df = (1L to 120L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      d.mineNegatives("doc_id", k = 3, buckets = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sortBy(t => (t._1, t._3)).toSeq
    val out = run(df)
    assert(out === run(df.repartition(11)))
    val byAnchor = out.groupBy(_._1)
    byAnchor.foreach { case (id, rows) =>
      assert(rows.map(_._2).distinct.size === rows.size, s"dup partner for $id")
      assert(!rows.exists(_._2 == id), s"self partner for $id")
      assert(rows.size <= 3)
    }
    // partners come from the anchor's own hash bucket
    def hash32(x: Long): Long = {
      val x32 = x & 0xffffffffL
      ((x32 >>> 16) * 2654435761L % 4294967296L * 65536L +
        (x32 & 0xffffL) * 2654435761L) % 4294967296L
    }
    def bucket(id: Long): Int = (hash32(id) * 4 / 4294967296L).toInt
    out.foreach { case (id, neg, _) =>
      assert(bucket(id) === bucket(neg), s"cross-bucket pair $id -> $neg")
    }
    // every anchor in a bucket of size > 3 gets the full k
    val sizes = (1L to 120L).groupBy(bucket).view.mapValues(_.size).toMap
    byAnchor.foreach { case (id, rows) =>
      if (sizes(bucket(id)) > 3) assert(rows.size === 3, s"anchor $id short")
    }
  }

  test("stratifiedSample: exactly min(k, n_g) per group, hash-order members") {
    val sizes = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = docs.stratifiedSample("lang", "doc_id", 40)
      .select("lang", "doc_id").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(out.keySet === sizes.keySet)
    sizes.foreach { case (lang, n) =>
      assert(out(lang).size === math.min(40L, n), s"lang $lang")
    }
    // membership = the k smallest (hash, id) — driver-side replay
    def hash32(id: Long): Long = {
      val id32 = id & 0xffffffffL
      ((id32 >>> 16) * 2654435761L % 4294967296L * 65536L +
        (id32 & 0xffffL) * 2654435761L) % 4294967296L
    }
    val (lang, got) = out.head
    val want = docs.filter(col("lang") === lang)
      .select("doc_id").collect().map(_.getLong(0))
      .sortBy(id => (hash32(id), id)).take(40).toSet
    assert(got === want)
  }

  test("stratifiedSample: partition-independent; WindowGroupLimit pre-prune") {
    def run(df: org.apache.spark.sql.DataFrame) =
      df.stratifiedSample("lang", "doc_id", 25)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(run(docs) === run(docs.repartition(13)))
    val plan = docs.stratifiedSample("lang", "doc_id", 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"sample must pre-prune map-side:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("epochShuffle: a full permutation, driver-replayed, epoch-distinct") {
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val out = docs.epochShuffle("doc_id", epoch = 1, numShards = 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every row appears exactly once, shards in range
    assert(out.map(_._1).toSet === ids && out.length === ids.size)
    assert(out.forall(t => t._2 >= 0 && t._2 < 8))
    // pos is 1..n_shard consecutive within each shard
    out.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq,
        s"shard $s positions not consecutive")
    }
    // driver replay of the exact (shard, order) assignment
    def hash32(id: Long): Long = {
      val id32 = id & 0xffffffffL
      ((id32 >>> 16) * 2654435761L % 4294967296L * 65536L +
        (id32 & 0xffffL) * 2654435761L) % 4294967296L
    }
    val want = ids.toSeq.map { id =>
      val k = hash32(id + 1000003L)
      (id, k * 8 / 4294967296L, k)
    }
    want.groupBy(_._2).foreach { case (s, rows) =>
      val ordered = rows.sortBy(t => (t._3, t._1)).map(_._1)
      val got = out.filter(_._2 == s).sortBy(_._3).map(_._1).toSeq
      assert(got === ordered, s"shard $s order diverges from the replay")
    }
    // a different epoch is a genuinely different permutation
    val e2 = docs.epochShuffle("doc_id", epoch = 2, numShards = 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(e2 !== out.toSet, "epochs 1 and 2 produced the same permutation")
  }

  test("epochShuffle plans one shard shuffle, never a global sort") {
    val plan = docs.epochShuffle("doc_id", 0, 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning"),
      s"expected a shard hash shuffle:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"a global sort must not appear:\n$plan")
  }

  test("groupTopFraction: per-group ceil(n*frac) best-first, no group emptied") {
    import spark.implicits._
    val fixture = Seq(
      ("a", 1L, 10L), ("a", 2L, 40L), ("a", 3L, 30L), ("a", 4L, 20L),
      ("b", 5L, 5L), ("b", 6L, 50L), ("b", 7L, 15L), ("b", 8L, 25L), ("b", 9L, 35L),
      ("c", 10L, 1L))
      .toDF("src", "id", "score")
    val got = fixture.groupTopFraction("src", 0.5,
      Seq(col("score").desc, col("id").asc))
      .select("id").collect().map(_.getLong(0)).toSet
    // a: ceil(4*0.5)=2 -> {2,3}; b: ceil(5*0.5)=3 -> {6,9,8}; c: ceil(1*0.5)=1 -> {10}
    assert(got === Set(2L, 3L, 6L, 9L, 8L, 10L))
    val all = fixture.groupTopFraction("src", 1.0, Seq(col("id").asc)).count()
    assert(all === 10L, "keepFrac=1 must keep everything")
    // one exchange: rank and count share the group partitioning
    val plan = fixture.groupTopFraction("src", 0.25,
      Seq(col("score").desc, col("id").asc))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1,
      s"expected at most one exchange:\n$plan")
  }
}
