package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.functions.TextKernels
import graft.operators.DedupOps._

class DedupOpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf())

  test("exactDedup keeps exactly one row per distinct text, min id") {
    val df = Seq(
      (10L, "alpha beta"), (3L, "alpha beta"), (7L, "gamma"),
      (1L, "delta"), (2L, "delta"), (5L, "delta")
    ).toDF("doc_id", "text")
    val out = df.exactDedup("text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set((3L, "alpha beta"), (7L, "gamma"), (1L, "delta")))
  }

  test("minHashPairs: exact precision, full recall on planted near-dups") {
    val got = docs.minHashPairs("doc_id", "text", shingle = 3,
      numHashes = 64, bands = 16, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // precision is exact by construction: re-check each returned pair
    val textOf = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (a, b, j) =>
      val exact = TextKernels.shingleJaccard(textOf(a), textOf(b), 3)
      assert(j === exact && j >= 0.8, s"pair ($a,$b)")
    }
    // recall vs brute force (tiny corpus, all-pairs is cheap in-test)
    val ids = textOf.keys.toSeq.sorted
    val brute = for {
      i <- ids.indices; jdx <- (i + 1) until ids.length
      if TextKernels.shingleJaccard(textOf(ids(i)), textOf(ids(jdx)), 3) >= 0.8
    } yield (ids(i), ids(jdx))
    assert(got.map(t => (t._1, t._2)).toSet === brute.toSet)
    assert(got.nonEmpty)
  }

  test("minHashPairsAgainst: shard-vs-corpus gate finds cross pairs only") {
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val got = fresh.minHashPairsAgainst(corpus, "doc_id", "text", shingle = 3,
        numHashes = 64, bands = 16, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val textOf = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // precision + side correctness per returned pair
    got.foreach { case (n, c, j) =>
      assert(n % 10 == 0 && c % 10 != 0, s"pair ($n,$c) on wrong sides")
      val exact = TextKernels.shingleJaccard(textOf(n), textOf(c), 3)
      assert(j === exact && j >= 0.8, s"pair ($n,$c)")
    }
    // recall: every brute-force CROSS pair is found; corpus-internal
    // pairs never appear (they are the symmetric operator's job)
    val ids = textOf.keys.toSeq.sorted
    val cross = for {
      n <- ids if n % 10 == 0; c <- ids if c % 10 != 0
      if TextKernels.shingleJaccard(textOf(n), textOf(c), 3) >= 0.8
    } yield (n, c)
    assert(got.map(t => (t._1, t._2)).toSet === cross.toSet)
    assert(got.nonEmpty, "fixture has no cross-boundary near-dups — split broke")
  }

  test("simHashPairs: pigeonhole blocking gives full recall within maxHamming") {
    val got = docs.simHashPairs("doc_id", "text", blocks = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sims = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> TextKernels.simHash64(r.getString(1)))
    val brute = (for {
      i <- sims.indices; j <- (i + 1) until sims.length
      h = java.lang.Long.bitCount(sims(i)._2 ^ sims(j)._2)
      if h <= 3
    } yield {
      val (a, b) = if (sims(i)._1 < sims(j)._1) (sims(i)._1, sims(j)._1)
                   else (sims(j)._1, sims(i)._1)
      (a, b, h)
    }).toSet
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("ngramJaccardPairs: exhaustive within blocks, exact scores") {
    val got = docs.ngramJaccardPairs("doc_id", "text",
      blockBy = Seq(col("lang")), n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byLang = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(_._2)
    val brute = byLang.values.flatMap { rows =>
      val sorted = rows.sortBy(_._1)
      for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
        if TextKernels.shingleJaccard(sorted(i)._3, sorted(j)._3, 3) >= 0.8
      } yield (sorted(i)._1, sorted(j)._1)
    }.toSet
    assert(got === brute)
  }

  test("ngram blocking by (lang, length-bucket) is sub-quadratic and exact in-block") {
    val bucket = length(conv(col("n_chars").cast("string"), 10, 2))
    val got = docs.ngramJaccardPairs("doc_id", "text",
      blockBy = Seq(col("lang"), bucket), n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force within the same (lang, bit-length) blocks
    val rows = docs.select(col("doc_id"), col("lang"), bucket.as("b"), col("text"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getInt(2)), r.getString(3)))
    val brute = rows.groupBy(_._2).values.flatMap { blk =>
      val sorted = blk.sortBy(_._1)
      for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
        if TextKernels.shingleJaccard(sorted(i)._3, sorted(j)._3, 3) >= 0.8
      } yield (sorted(i)._1, sorted(j)._1)
    }.toSet
    assert(got === brute)
    // certify the candidate space shrank vs lang-only blocking: sum of
    // C(block,2) with the length bucket must be well under lang-only's
    def candPairs(groups: Iterable[Int]): Long =
      groups.map(c => c.toLong * (c - 1) / 2).sum
    val withBucket = candPairs(rows.groupBy(_._2).values.map(_.length))
    val langOnly = candPairs(rows.groupBy(_._2._1).values.map(_.length))
    assert(withBucket < langOnly / 2,
      s"blocked candidates $withBucket not sub-quadratic vs lang-only $langOnly")
  }

  test("minhash bucket cap bounds pair generation on a boilerplate cluster") {
    // 60 identical docs (one giant bucket in every band) + 2 genuine
    // near-dups that must survive the cap
    val boiler = (1 to 60).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog"))
    val base = "completely different text about distributed query engines " +
      "reading columnar parquet files with predicate pushdown partition " +
      "pruning adaptive execution and whole stage code generation"
    val nearDup = Seq((1001L, base), (1002L, base + "!"))
    val df = (boiler ++ nearDup).toDF("doc_id", "text")

    val capped = df.minHashPairs("doc_id", "text", shingle = 3, numHashes = 64,
      bands = 16, threshold = 0.8, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the boilerplate cluster's C(60,2)=1770 pairs are cut...
    assert(!capped.exists { case (a, b) => a <= 60 && b <= 60 },
      s"capped run must not emit boilerplate pairs, got ${capped.size}")
    // ...while the small-bucket near-dup still comes through
    assert(capped.contains((1001L, 1002L)))

    // audit surface: the dropped buckets are enumerable, not silent
    val dropped = df.minHashOversizedBuckets("doc_id", "text", shingle = 3,
      numHashes = 64, bands = 16, maxBucket = 10)
    assert(dropped.count() === 16, "all 16 bands hold one oversized bucket")
    assert(dropped.agg(max(col("size"))).head().getLong(0) === 60L)

    // uncapped (maxBucket=0) still generates the full cluster
    val uncapped = df.minHashPairs("doc_id", "text", shingle = 3, numHashes = 64,
      bands = 16, threshold = 0.8, maxBucket = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.count { case (a, b) => a <= 60 && b <= 60 } === 60 * 59 / 2)

    // a cap past the array route's ceiling (would nest ~cap^2/2 pair
    // structs in one row) falls back to the self-join shape — with
    // every bucket under the cap it must equal the uncapped output
    assert(DedupOps.CappedArrayBucketMax < 5000)
    val bigCap = df.minHashPairs("doc_id", "text", shingle = 3, numHashes = 64,
      bands = 16, threshold = 0.8, maxBucket = 5000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bigCap === uncapped,
      "the self-join capped route must match uncapped when nothing is cut")
  }

  test("at-rest minhash index: index-backed pairs equal the direct form") {
    import spark.implicits._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_minhash_index_spec").toString
    val all = docs
    val fresh = all.filter(col("doc_id") % 10 === 0)
    val corpus = all.filter(col("doc_id") % 10 =!= 0)
    corpus.writeMinhashIndex(path, "doc_id", "text", shingle = 3,
      numHashes = 64, bands = 16)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    for (cap <- Seq(0, 50)) {
      val got = rows(fresh.minHashPairsAgainstIndex(path, "doc_id", "text",
        threshold = 0.8, maxBucket = cap))
      val want = rows(fresh.minHashPairsAgainst(corpus, "doc_id", "text",
        shingle = 3, numHashes = 64, bands = 16, threshold = 0.8,
        maxBucket = cap))
      assert(got === want && got.nonEmpty, s"cap=$cap index != direct")
    }
    // the wave bands with the INDEX's parameters (from the meta) — no
    // caller-supplied banding to get wrong
    // torn layout refused loudly
    val tampered = spark.read.textFile(s"$path/meta").collect().toSeq
      .map(l => if (l.startsWith("token=")) "token=some-other-write" else l)
    spark.createDataset(tampered).coalesce(1).write.mode("overwrite")
      .text(s"$path/meta")
    val e = intercept[Throwable] {
      fresh.minHashPairsAgainstIndex(path, "doc_id", "text",
        threshold = 0.8).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("write-token mismatch")), s"$msgs")
  }

  test("dd_minhash_pairs_capped verdict row is all-TRUE (a real, audited recall cut)") {
    // the driver-facing end-to-end exercise of the cap: the boilerplate
    // derivation plants an identical-text cluster, so the capped run
    // must lose at least those intra-cluster pairs, keep no
    // intra-cluster survivor, and audit the dropped buckets — the
    // contract DuckDB now hash-checks as an all-TRUE verdict row
    val row = graft.queries.Pipeline.minHashCappedQ(spark, sf()).head()
    row.schema.fieldNames.foreach { f =>
      assert(row.getAs[Boolean](f), s"verdict column $f must be TRUE")
    }
  }

  test("repetitionRatio: duplicated 3-grams counted, short texts score 0") {
    val df = Seq(
      (1L, "a b c a b c"), // grams: abc,bca,cab,abc -> 1 dup of 4 = 0.25
      (2L, "x y"),         // shorter than n words -> 0.0
      (3L, "w1 w2 w3 w4")  // all grams distinct -> 0.0
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        graft.functions.repetitionRatio(col("text"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 0.25 && got(2L) === 0.0 && got(3L) === 0.0)
  }

  test("contaminationPairs: shared 8-gram windows found, counts distinct, clean docs absent") {
    val evalDoc = "the quick brown fox jumps over the lazy dog tonight"
    val eval = Seq((100L, evalDoc)).toDF("eval_id", "text")
    val corpus = Seq(
      // embeds an exact 8-word window of the eval doc -> contaminated
      (1L, "prefix words " + "quick brown fox jumps over the lazy dog" + " suffix"),
      // repeats the SAME window twice -> still ONE distinct shared gram
      (2L, "quick brown fox jumps over the lazy dog and quick brown fox jumps over the lazy dog"),
      // shares only shorter fragments -> clean at n = 8
      (3L, "the quick brown fox sleeps all day long here"),
      (4L, "completely unrelated content about spark query planning engines")
    ).toDF("doc_id", "text")
    val got = graft.operators.DedupOps
      .contaminationPairs(corpus, eval, "doc_id", "eval_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1 shares exactly the one embedded window; doc 2's duplicated
    // window still counts once (distinct grams per doc)
    assert(got === Set((1L, 100L, 1L), (2L, 100L, 1L)))
  }

  test("contamination gate is a superset of the exact gram join on \\f/\\x0B/leading-tab text") {
    // Texts crafted so wordGrams' tokenizer (space-only trim,
    // [ \t\n\r]+ split) and shingleSet's (full trim, Java \s+ split)
    // DISAGREE: under wordGrams the corpus and eval share a gram
    // string, under shingleSet they share zero hashes. The old
    // shingleSet-based gate silently dropped these docs before the
    // exact join could flag them (round-13 advisor finding).
    val cases = Seq(
      // leading tab: Spark trim keeps \t, split yields a leading ""
      // token; the eval side has 2 real tokens (< n=3 -> whole-text
      // shingle under shingleSet, matching nothing in the corpus set)
      ((1L, "\ta b x"), (101L, "\ta b")),
      // leading newline: same empty-token divergence class
      ((2L, "\na b y"), (102L, "\na b")),
      // \f as its own space-delimited token: a separator (and trimmed)
      // to shingleSet's Java-\s tokenizer, a real token to wordGrams
      ((3L, "\f q r s"), (103L, "\f q r"))
    )
    for (((cid, ctext), (eid, etext)) <- cases) {
      val corpus = Seq((cid, ctext)).toDF("doc_id", "text")
      val eval_ = Seq((eid, etext)).toDF("eval_id", "text")
      val got = graft.operators.DedupOps
        .contaminationPairs(corpus, eval_, "doc_id", "eval_id", "text", n = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((cid, eid)), s"case ($cid, $eid): gate dropped a true match")
      // the span surgery sees the same match and actually removes tokens
      val cleaned = graft.operators.DedupOps
        .decontaminateSpans(corpus, eval_, "doc_id", "text", "text", n = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(cleaned(cid) > 0L, s"case ($cid, $eid): spans not cut")
    }
    // kernel-level superset property: the hash of a shared gram string
    // is in both sides' sets whenever the gram strings are equal
    val a = TextKernels.wordGramHashSet("\ta b x", 3).toSet
    val b = TextKernels.wordGramHashSet("\ta b", 3).toSet
    assert(a.intersect(b).nonEmpty)
    // ...and the documented divergence that motivated the fix: the old
    // shingleSet tokenizer shares NO hash on the same pair of texts
    val oldA = TextKernels.shingleSet("\ta b x", 3).toSet
    val oldB = TextKernels.shingleSet("\ta b", 3).toSet
    assert(oldA.intersect(oldB).isEmpty)
  }

  test("nearDupComponents: chains merge to min id, singletons stay themselves") {
    val nodes = (1L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // chain 1-2-3-4 (diameter 3), pair 6-8, singletons 5, 7, 9
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (8L, 6L)).toDF("id1", "id2")
    val got = nodes.nearDupComponents("doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 7L, 8L -> 6L, 9L -> 9L))
    // "keep one per cluster" composes as a plain filter on the labels
    val keep = nodes.nearDupComponents("doc_id", pairs)
      .filter(col("doc_id") === col("component")).count()
    assert(keep === 5) // components {1..4}, {6,8}, {5}, {7}, {9}

    // the iteration cap throws instead of returning half-converged labels
    val longChain = (1L to 40L).map(i => (i, "x")).toDF("doc_id", "text")
    val chainPairs = (1L until 40L).map(i => (i, i + 1)).toDF("id1", "id2")
    intercept[IllegalArgumentException] {
      longChain.nearDupComponents("doc_id", chainPairs, maxIters = 3).collect()
    }
    // and a sufficient cap converges the same chain
    val full = longChain.nearDupComponents("doc_id", chainPairs)
      .agg(countDistinct(col("component"))).head().getLong(0)
    assert(full === 1L)
  }

  test("nearDupComponents: superset pair lists label only this dataset's ids") {
    val nodes = Seq((2L, "a"), (4L, "b"), (6L, "c")).toDF("doc_id", "text")
    // pairs computed on a superset: 99 is foreign, and 1 is a foreign
    // BRIDGE connecting our docs 2 and 4 (2-1, 1-4)
    val pairs = Seq((1L, 2L), (1L, 4L), (99L, 6L)).toDF("id1", "id2")
    val got = nodes.nearDupComponents("doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // only our three ids appear — no rows for 1 or 99
    assert(got.keySet === Set(2L, 4L, 6L))
    // the foreign bridge still merges 2 and 4 (min reachable id = 1)
    assert(got(2L) === got(4L))
  }

  test("nearDupComponents: disjoint foreign components occupy no label state") {
    val nodes = Seq((2L, "a"), (4L, "b"), (6L, "c")).toDF("doc_id", "text")
    // a foreign bridge (1 connects 2 and 4), a foreign leaf off 6, and a
    // large DISJOINT foreign component (ids 100..139) that never touches
    // this dataset — an adversarial superset pair list
    val foreignChain = (100L until 139L).map(i => (i, i + 1))
    val pairs = (Seq((1L, 2L), (1L, 4L), (99L, 6L)) ++ foreignChain)
      .toDF("id1", "id2")
    val labelTable = nodes.nearDupLabelTable("doc_id", pairs)
    // label state = ownIds {2,4,6} + reachable foreign ids {1,99} ONLY:
    // the 40-node disjoint chain never enters the iteration
    val ids = labelTable.select("__id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 4L, 6L, 99L),
      s"label table must stay O(|ownIds| + touching edges), got $ids")
    // and the output is still correct: the bridge merges 2 and 4 under
    // the minimum OWN id reachable (labels initialize from this
    // dataset's ids only, so a foreign bridge relays labels but never
    // becomes one); no foreign rows emitted
    val got = nodes.nearDupComponents("doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(2L -> 2L, 4L -> 2L, 6L -> 6L))
  }

  test("extendComponents: star edges reproduce the full recompute") {
    // old labeling: {1,2}->1, {3}->3; wave 10,11,20 with pairs bridging
    // 2-10-11 — extended must merge {1,2,10,11}->1, keep {3}, {20}
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L))
      .toDF("doc_id", "component")
      .unionByName(Seq((10L, 10L), (11L, 11L), (20L, 20L))
        .toDF("doc_id", "component")) // wave enters as singletons
    val wavePairs = Seq((2L, 10L), (10L, 11L)).toDF("id1", "id2")
    val got = DedupOps.extendComponents(labels, wavePairs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1L), (2L, 1L), (3L, 3L), (10L, 1L),
      (11L, 1L), (20L, 20L)))
    // and against the kernel itself: full recompute over the star-
    // expanded edge list must agree on a chain that needs doubling
    val chain = (0 until 32).map(i => (100L + i, 101L + i))
      .toDF("id1", "id2")
    val chainIds = (100L to 132L)
    val seed = chainIds.map(i => (i, i)).toDF("doc_id", "component")
    val ext = DedupOps.extendComponents(seed, chain, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ext === chainIds.map(i => (i, 100L)).toSet)
  }

  test("shrinkComponents: deletes split components; equals the full recompute") {
    // components over a chain 1-2-3-4 (one component, label 1) plus the
    // pair {10,11}; deleting the bridge doc 2 must SPLIT {1} from {3,4}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id1", "id2")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("doc_id")
    val labels = nodes.nearDupComponents("doc_id", pairs).localCheckpoint()
    val deleted = Seq(2L).toDF("doc_id")
    val got = DedupOps.shrinkComponents(labels, pairs, "doc_id", deleted)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1L), (3L, 3L), (4L, 3L), (10L, 10L),
      (11L, 10L), (20L, 20L)), s"$got")
    // the contract: bit-equal to a full recompute over the survivors
    val full = nodes.join(deleted, Seq("doc_id"), "left_anti")
      .nearDupComponents("doc_id",
        pairs.filter(col("id1") =!= 2L && col("id2") =!= 2L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === full)
    // untouched components keep their rows verbatim (never recomputed):
    // deleting from {10,11} must not touch the {1,2,3,4} labels
    val got2 = DedupOps.shrinkComponents(labels, pairs, "doc_id",
        Seq(11L).toDF("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 === Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (20L, 20L)))
    // and on the real corpus: delete a third, shrink == full recompute
    val docPairs = docs.minHashPairs("doc_id", "text", threshold = 0.8)
      .localCheckpoint()
    val docLabels = docs.nearDupComponents("doc_id", docPairs)
      .localCheckpoint()
    val del = docs.filter(col("doc_id") % 3 === 0).select(col("doc_id"))
    val shrunk = DedupOps.shrinkComponents(docLabels, docPairs, "doc_id", del)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullDocs = docs.join(del, Seq("doc_id"), "left_anti")
      .nearDupComponents("doc_id", docPairs
        .join(del.select(col("doc_id").as("id1")), Seq("id1"), "left_anti")
        .join(del.select(col("doc_id").as("id2")), Seq("id2"), "left_anti"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shrunk === fullDocs, "shrink != full recompute on the corpus")
  }

  test("dedup rate: minhash collapses the planted near-dup clusters") {
    val pairs = docs.minHashPairs("doc_id", "text", threshold = 0.8)
    val survivors = docs.join(pairs.select(col("id2").as("doc_id")),
      Seq("doc_id"), "left_anti")
    val n = docs.count()
    val kept = survivors.count()
    assert(kept < n, "near-dup removal must drop documents")
    assert(kept >= n - pairs.count(), "can only drop flagged docs")
  }

  test("dedupKeepBest: one best row per component, singletons pass through") {
    import spark.implicits._
    // components: {1,2,3} (chain), {4} and {5} singletons
    val docs = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1), (5L, 0.7)
    ).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val comps = docs.nearDupComponents("doc_id", pairs)
    val kept = docs.dedupKeepBest("doc_id", comps,
        Seq(col("quality").desc, col("doc_id").asc))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    // cluster {1,2,3}: quality tie 2 vs 3 breaks to lower id -> 2
    assert(kept.map(_._1).toSeq === Seq(2L, 4L, 5L))
    // every kept row carries its component label
    assert(kept.toMap.apply(2L) === 1L)
    // plan: the rank-1 filter pre-prunes map-side
    val plan = docs.dedupKeepBest("doc_id", comps,
      Seq(col("quality").desc, col("doc_id").asc))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"keep-best must pre-prune before the component shuffle:\n$plan")
  }

  test("decontaminateSpans: matched windows cut, everything else intact") {
    import spark.implicits._
    val eval_ = Seq((100L, "e1 e2 e3")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b e1 e2 e3 c"),       // one match at start 3 -> tokens 3-5 cut
      (2L, "x y z"),                // untouched
      (3L, "e1 e2 e3"),             // fully cut
      (4L, "q"),                    // shorter than n -> no grams, untouched
      (5L, "p e1 e2 e3 e1 e2 e3")   // two matches (starts 2, 5) -> only p left
    ).toDF("doc_id", "text")
    val got = DedupOps.decontaminateSpans(corpus, eval_,
        "doc_id", "text", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("a b c", 6L, 3L)))
    assert(got(2L) === (("x y z", 3L, 0L)))
    assert(got(3L) === (("", 3L, 3L)))
    assert(got(4L) === (("q", 1L, 0L)))
    assert(got(5L) === (("p", 7L, 6L)))
  }

  test("dedupRepeatedSpans: first occurrence survives, every copy cut") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d x"),        // first occurrence of "a b c d"
      (2L, "p q a b c d r"),    // cross-doc copy -> cut
      (3L, "e f g h e f g h"),  // within-doc repeat -> second cut
      (4L, "u v w")             // unique, untouched
    ).toDF("doc_id", "text")
    val got = DedupOps.dedupRepeatedSpans(corpus, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("a b c d x", 5L, 0L)))
    assert(got(2L) === (("p q r", 7L, 4L)))
    assert(got(3L) === (("e f g h", 8L, 4L)))
    assert(got(4L) === (("u v w", 3L, 0L)))
  }

  test("dedupRepeatedSpans: partition-independent; partial min(struct) plan") {
    val docs = graft.Tables.documents(spark, sf())
      .filter(col("doc_id") < 150).select(col("doc_id"), col("text"))
    def run(c: org.apache.spark.sql.DataFrame) =
      DedupOps.dedupRepeatedSpans(c, "doc_id", "text", n = 8)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
        .sortBy(_._1).toSeq
    val a = run(docs)
    assert(a === run(docs.repartition(13)) && a.size === docs.count())
    val plan = DedupOps.dedupRepeatedSpans(docs, "doc_id", "text", n = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"),
      s"first occurrence must combine map-side:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("decontaminateSpans: redaction indexes wordGrams' own split") {
    import spark.implicits._
    val eval_ = Seq((100L, "e1 e2 e3")).toDF("doc_id", "text")
    val corpus = Seq(
      // \f is ONE wordGrams token ("a\fb") but two tokens() tokens —
      // the old \s+ redaction index cut [b, e1, e2] here
      (1L, "a\fb e1 e2 e3"),
      // leading tab survives trim as an empty split slot; positions
      // must still line up and the empty slot must not be counted
      (2L, "\tz e1 e2 e3"),
      (3L, null.asInstanceOf[String])) // NULL text = empty doc
      .toDF("doc_id", "text")
    val got = DedupOps.decontaminateSpans(corpus, eval_,
        "doc_id", "text", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("a\fb", 4L, 3L)))
    assert(got(2L) === (("z", 4L, 3L)))
    assert(got(3L) === (("", 0L, 0L)))
  }

  test("decontaminateSpans: partition-independent; clean corpus unchanged") {
    val docs = graft.Tables.documents(spark, sf())
    val corpus = docs.filter(col("doc_id") % 7 =!= 0 && col("doc_id") < 200)
    val eval_ = docs.filter(col("doc_id") % 7 === 0 && col("doc_id") < 200)
    def run(c: org.apache.spark.sql.DataFrame) =
      DedupOps.decontaminateSpans(c, eval_, "doc_id", "text", "text", n = 8)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
        .sortBy(_._1).toSeq
    val a = run(corpus)
    assert(a === run(corpus.repartition(13)))
    assert(a.size === corpus.count())
    // removals only happen where the flagging sweep finds sharing
    val flagged = DedupOps.contaminationPairs(corpus,
      eval_.select(col("doc_id").as("eval_id"), col("text")),
      "doc_id", "eval_id", "text", n = 8)
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    a.foreach { case (id, _, removed) =>
      assert((removed > 0) === flagged.contains(id),
        s"doc $id: removed=$removed but flagged=${flagged.contains(id)}")
    }
  }

  test("cdcChunkPairs: brute-force parity on shared chunks, exact jaccard") {
    val got = docs.cdcChunkPairs("doc_id", "text", minShared = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val textOf = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // brute force: chunk every doc with the same params, count shared
    // DISTINCT chunks per pair, honoring the membership cap
    val chunkSets = textOf.map { case (id, t) =>
      id -> TextKernels.cdcChunks(t, 8, 0x3FL, 32, 256).toSet
    }
    val docCount = chunkSets.values.flatten.groupBy(identity)
      .map { case (c, xs) => c -> xs.size }
    val ids = textOf.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      shared = (chunkSets(ids(i)) intersect chunkSets(ids(j)))
        .count(c => docCount(c) <= 64)
      if shared >= 1
    } yield (ids(i), ids(j)) -> shared.toLong).toMap
    assert(got.keySet === brute.keySet)
    got.foreach { case (pair, (shared, jac)) =>
      assert(shared === brute(pair), s"pair $pair shared count")
      assert(jac === TextKernels.shingleJaccard(
        textOf(pair._1), textOf(pair._2), 3), s"pair $pair jaccard")
    }
    assert(got.nonEmpty)
  }

  test("cdcDedupStats: conservation identities and cross-doc count") {
    val r = docs.cdcDedupStats("doc_id", "text").collect()(0)
    val (total, distinct_, dup, cross) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val textOf = docs.select("doc_id", "text").collect()
      .map(r2 => r2.getLong(0) -> r2.getString(1)).toMap
    assert(total === textOf.values.map(_.length.toLong).sum,
      "chunks must partition every doc exactly")
    assert(distinct_ + dup === total)
    val perDocChunks = textOf.map { case (id, t) =>
      id -> TextKernels.cdcChunks(t, 8, 0x3FL, 32, 256).toSet }
    val bruteCross = perDocChunks.values.flatten.groupBy(identity)
      .count { case (_, xs) => xs.size >= 2 }
    assert(cross === bruteCross.toLong)
    assert(cross > 0, "the corpus's planted near-dups must share chunks")
  }

  test("at-rest digest index: gate equals the text join, bloom prunes") {
    import org.apache.spark.sql.DataFrame
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_digest_index_spec").toString
    val corpus = docs
    val wave = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" NOVEL")).as("text")))
    def pairsOf(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = pairsOf(wave.as("w").join(corpus.as("c"),
      col("w.text") === col("c.text"))
      .select(col("w.doc_id"), col("c.doc_id")))
    assert(want.nonEmpty)
    // with and without the bloom filter: identical, both equal the join
    for (bloomBytes <- Seq(128L << 20, 0L)) {
      corpus.writeDigestIndex(path, "doc_id", "text",
        maxBloomBytes = bloomBytes)
      val meta = spark.read.textFile(s"$path/meta").collect().mkString("\n")
      assert(meta.contains(if (bloomBytes > 0) "bloom:yes" else "bloom:no"))
      val got = pairsOf(wave.exactPairsAgainstIndex(path, "doc_id", "text"))
      assert(got === want, s"maxBloomBytes=$bloomBytes")
      // admit is the exact complement of the matched wave ids
      val admitted = wave.admitAgainstDigestIndex(path, "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val matched = got.map(_._1).toSet
      val waveIds = wave.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(admitted.intersect(matched).isEmpty)
      assert(admitted.union(matched) === waveIds)
    }
    // the bloom genuinely prunes: novel texts overwhelmingly probe false
    corpus.writeDigestIndex(path, "doc_id", "text")
    val token = DedupOps.indexMeta(spark, path, "spec")("__token")
    val bloom = org.apache.spark.util.sketch.BloomFilter.readFrom(
      DedupOps.digestBlooms(spark, path, Seq(token)).head)
    val novelHits = wave.filter(col("doc_id") >= 2000000L)
      .select(xxhash64(col("text"))).collect()
      .count(r => bloom.mightContainLong(r.getLong(0)))
    val novelTotal = wave.filter(col("doc_id") >= 2000000L).count()
    assert(novelHits <= novelTotal / 4,
      s"bloom cleared too few novels: $novelHits of $novelTotal maybe")
    // every true duplicate must probe true (no false negatives, ever)
    val dupMisses = wave.filter(col("doc_id") < 2000000L)
      .select(xxhash64(col("text"))).collect()
      .count(r => !bloom.mightContainLong(r.getLong(0)))
    assert(dupMisses === 0)
    // a torn layout (stale bloom from a prior write) refuses loudly
    val tampered = spark.read.textFile(s"$path/meta").collect().toSeq
      .map(l => if (l.startsWith("token=")) "token=some-other-write" else l)
    spark.createDataset(tampered).coalesce(1).write.mode("overwrite")
      .text(s"$path/meta")
    val e = intercept[Throwable] {
      wave.exactPairsAgainstIndex(path, "doc_id", "text").collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("write-token mismatch")), s"$msgs")
  }

  test("digest index append: waves gate like a fresh full write") {
    import org.apache.spark.sql.DataFrame
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_digest_append_spec").toString
    val corpus0 = docs.filter(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 5)
    val wave2 = docs.filter(col("doc_id") % 10 >= 6)
    // the probe wave: half true dups of corpus0, half of wave2, plus novels
    val probe = docs.filter(col("doc_id") % 10 === 1)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 10 === 7)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" NOVEL")).as("text")))
    def pairsOf(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    corpus0.writeDigestIndex(path, "doc_id", "text")
    val before = pairsOf(probe.exactPairsAgainstIndex(path, "doc_id", "text"))
    wave2.appendDigestIndex(path, "doc_id", "text")
    val got = pairsOf(probe.exactPairsAgainstIndex(path, "doc_id", "text"))
    // reference: one fresh write over the union
    val fullPath = path + "_full"
    corpus0.unionByName(wave2).writeDigestIndex(fullPath, "doc_id", "text")
    val want = pairsOf(probe.exactPairsAgainstIndex(fullPath, "doc_id", "text"))
    assert(got === want, "appended layout != fresh full write")
    assert(got.size > before.size,
      "append added no reachable dups — wave fixture broke")
    // admit stays the exact complement across waves
    val admitted = probe.admitAgainstDigestIndex(path, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val probeIds = probe.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted === probeIds.diff(got.map(_._1).toSet))
    // bloom coverage tracks the wave list: two filters, both consulted —
    // a wave2 dup must probe maybe even though wave1's filter says no
    val tokens = DedupOps.indexMeta(spark, path, "spec")("__waves").split(";")
    assert(tokens.length === 2)
    assert(DedupOps.digestBlooms(spark, path, tokens.toSeq).size === 2)
    // id clash across waves refuses
    val clash = intercept[IllegalArgumentException] {
      corpus0.appendDigestIndex(path, "doc_id", "text")
    }
    assert(clash.getMessage.contains("already exists"))
    // compact: one wave, ONE rebuilt bloom, identical answers
    DedupOps.compactDigestIndex(spark, path)
    val waves = DedupOps.indexMeta(spark, path, "spec")("__waves").split(";")
    assert(waves.length === 1)
    assert(DedupOps.digestBlooms(spark, path, waves.toSeq).size === 1)
    assert(pairsOf(probe.exactPairsAgainstIndex(path, "doc_id", "text"))
      === got, "compact changed answers")
    // torn append (rows + bloom landed, meta didn't) refuses loudly
    val metaBefore = spark.read.textFile(s"$path/meta").collect().toSeq
    docs.filter(col("doc_id") % 10 === 0).select(
        (col("doc_id") + 500000L).as("doc_id"), col("text"))
      .appendDigestIndex(path, "doc_id", "text")
    spark.createDataset(metaBefore).coalesce(1).write.mode("overwrite")
      .text(s"$path/meta")
    val e = intercept[Throwable] {
      probe.exactPairsAgainstIndex(path, "doc_id", "text").collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("write-token mismatch")), s"$msgs")
    // repair drops the orphaned digest rows AND the orphaned bloom row;
    // reads recover to the compacted single-wave answers
    DedupOps.repairDigestIndex(spark, path)
    assert(pairsOf(probe.exactPairsAgainstIndex(path, "doc_id", "text"))
      === got, "repair changed admitted answers")
    val wavesAfter = DedupOps.indexMeta(spark, path, "spec")("__waves")
      .split(";")
    assert(DedupOps.digestBlooms(spark, path, wavesAfter.toSeq).size
      === wavesAfter.length)
  }

  test("meta crash window heals at read; oversized wave bloom downgrades loudly") {
    import org.apache.hadoop.fs.Path
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_digest_crash_spec").toString
    val corpus = docs.filter(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 5)
    val wave2 = docs.filter(col("doc_id") % 10 >= 6)
    val probe = docs.filter(col("doc_id") % 10 === 1)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 10 === 7)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    def pairsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    corpus.writeDigestIndex(path, "doc_id", "text")
    val want = pairsOf(probe.exactPairsAgainstIndex(path, "doc_id", "text"))
    // simulate publishMeta's delete->rename crash window: meta gone, the
    // COMPLETE meta_tmp (with its job _SUCCESS) in its place — the next
    // read must finish the interrupted rename and answer identically
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new Path(s"$path/meta"), new Path(s"$path/meta_tmp")))
    assert(pairsOf(probe.exactPairsAgainstIndex(path, "doc_id", "text"))
      === want, "read through the crash window changed answers")
    assert(fs.exists(new Path(s"$path/meta")) &&
      !fs.exists(new Path(s"$path/meta_tmp")),
      "the read did not promote meta_tmp back into place")
    // an appended wave whose own filter would exceed the bound
    // downgrades the layout to bloom:no — loud in the meta, and the
    // join-only gate still equals a fresh full write
    wave2.appendDigestIndex(path, "doc_id", "text", maxBloomBytes = 0L)
    assert(DedupOps.indexMeta(spark, path, "spec")("bloom") === "no")
    val fullPath = path + "_full"
    corpus.unionByName(wave2).writeDigestIndex(fullPath, "doc_id", "text")
    assert(pairsOf(probe.exactPairsAgainstIndex(path, "doc_id", "text"))
      === pairsOf(probe.exactPairsAgainstIndex(fullPath, "doc_id", "text")),
      "bloom-downgraded layout != fresh full write")
    // absent meta WITHOUT a complete meta_tmp is a genuine tear: refuse
    assert(fs.rename(new Path(s"$path/meta"), new Path(s"$path/meta_tmp")))
    assert(fs.delete(new Path(s"$path/meta_tmp/_SUCCESS"), false))
    val e = intercept[IllegalArgumentException] {
      probe.exactPairsAgainstIndex(path, "doc_id", "text").collect()
    }
    assert(e.getMessage.contains("torn"), e.getMessage)
  }

  test("digest index delete: tombstoned docs unmatch; compact folds; ids revive after fold") {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_digest_del_spec").toString
    val corpus0 = docs.filter(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 5)
    val wave2 = docs.filter(col("doc_id") % 10 >= 6)
    val delIds = docs.filter(col("doc_id") % 10 >= 1 && col("doc_id") % 3 === 0)
      .select(col("doc_id"))
    val probe = docs
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    def pairsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    corpus0.writeDigestIndex(path, "doc_id", "text")
    wave2.appendDigestIndex(path, "doc_id", "text")
    val before = pairsOf(probe.exactPairsAgainstIndex(path, "doc_id", "text"))
    DedupOps.deleteFromDigestIndex(spark, path, delIds)
    val got = pairsOf(probe.exactPairsAgainstIndex(path, "doc_id", "text"))
    // reference: fresh full write over the survivors
    val fullPath = path + "_full"
    corpus0.unionByName(wave2)
      .join(delIds, Seq("doc_id"), "left_anti")
      .writeDigestIndex(fullPath, "doc_id", "text")
    val want = pairsOf(probe.exactPairsAgainstIndex(fullPath, "doc_id", "text"))
    assert(got === want, "deleted layout != fresh write on survivors")
    assert(got.size < before.size, "delete removed no reachable dups — fixture broke")
    // admit is the exact complement on the survivor corpus
    val admitted = probe.admitAgainstDigestIndex(path, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val wantAdmit = probe.admitAgainstDigestIndex(fullPath, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted === wantAdmit)
    // a second delete of the same ids is an idempotent no-op that
    // admits NOTHING — an admitted wave with no tombstone rows on disk
    // would read as a MISSING wave to fsck
    DedupOps.deleteFromDigestIndex(spark, path, delIds)
    assert(pairsOf(probe.exactPairsAgainstIndex(path, "doc_id", "text")) === got)
    val refsck = DedupOps.fsckTextIndex(spark, path).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toSeq
    assert(refsck.forall(_._2), s"fsck not green after all-dead re-delete: $refsck")
    // a tombstoned id stays dead for the clash check until a compact
    val deadRows = docs.join(delIds, Seq("doc_id"), "left_semi").limit(5)
    val clash = intercept[IllegalArgumentException] {
      deadRows.appendDigestIndex(path, "doc_id", "text")
    }
    assert(clash.getMessage.contains("already exists"))
    // compact folds: tombstones gone, answers unchanged, ids revive
    DedupOps.compactDigestIndex(spark, path)
    assert(!new java.io.File(path, "tombstones").exists(),
      "compact left the tombstones dir behind")
    assert(pairsOf(probe.exactPairsAgainstIndex(path, "doc_id", "text")) === got,
      "compact changed the deleted layout's answers")
    assert(!DedupOps.indexMeta(spark, path, "spec").contains("__tombs"))
    deadRows.appendDigestIndex(path, "doc_id", "text")
    assert(pairsOf(probe.exactPairsAgainstIndex(path, "doc_id", "text"))
      .size > got.size, "re-added docs after the fold must match again")
  }

  test("minhash index delete: membership subtracts before the cap; compact folds") {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_minhash_del_spec").toString
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    val delIds = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 3 === 0)
      .select(col("doc_id"))
    def setOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    corpus.writeMinhashIndex(path, "doc_id", "text")
    DedupOps.deleteFromMinhashIndex(spark, path, delIds)
    val fullPath = path + "_full"
    corpus.join(delIds, Seq("doc_id"), "left_anti")
      .writeMinhashIndex(fullPath, "doc_id", "text")
    for (cap <- Seq(0, 8)) {
      val got = setOf(fresh.minHashPairsAgainstIndex(path, "doc_id", "text",
        threshold = 0.3, maxBucket = cap))
      val want = setOf(fresh.minHashPairsAgainstIndex(fullPath, "doc_id", "text",
        threshold = 0.3, maxBucket = cap))
      assert(got === want, s"deleted layout != fresh write on survivors (cap $cap)")
      if (cap == 0) assert(got.nonEmpty, "no pairs at all — fixture broke")
    }
    val got0 = setOf(fresh.minHashPairsAgainstIndex(path, "doc_id", "text",
      threshold = 0.3))
    DedupOps.compactMinhashIndex(spark, path)
    assert(!new java.io.File(path, "tombstones").exists())
    assert(setOf(fresh.minHashPairsAgainstIndex(path, "doc_id", "text",
      threshold = 0.3)) === got0, "compact changed answers")
  }

  test("cdc index delete: chunk membership subtracts; compact folds") {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_cdc_del_spec").toString
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    val delIds = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 3 === 0)
      .select(col("doc_id"))
    def setOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    corpus.writeCdcIndex(path, "doc_id", "text")
    DedupOps.deleteFromCdcIndex(spark, path, delIds)
    val fullPath = path + "_full"
    corpus.join(delIds, Seq("doc_id"), "left_anti")
      .writeCdcIndex(fullPath, "doc_id", "text")
    val got = setOf(fresh.cdcPairsAgainstIndex(path, "doc_id", "text",
      minShared = 1))
    val want = setOf(fresh.cdcPairsAgainstIndex(fullPath, "doc_id", "text",
      minShared = 1))
    assert(got === want, "deleted layout != fresh write on survivors")
    assert(got.nonEmpty, "no pairs at all — fixture broke")
    DedupOps.compactCdcIndex(spark, path)
    assert(!new java.io.File(path, "tombstones").exists())
    assert(setOf(fresh.cdcPairsAgainstIndex(path, "doc_id", "text",
      minShared = 1)) === got, "compact changed answers")
  }

  test("append id-clash gate: local bloom probe clears clean waves, clash still refuses") {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_idbloom_spec").toString
    val corpus = docs.filter(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 5)
    corpus.writeDigestIndex(path, "doc_id", "text")
    val params = DedupOps.indexMeta(spark, path, "spec")
    assert(params("__idbloom") === "yes")
    // a clean wave (disjoint id range) clears by the LOCAL probe alone
    // — idClashCheck returns true exactly when the stored table was
    // never touched (deterministic: same data, same filter hashes)
    val clean = corpus.select((col("doc_id") + 5000000L).as("doc_id"))
    assert(DedupOps.idClashCheck(spark, path, "digests", "spec", clean,
      "doc_id", params), "clean wave did not clear on the bloom fast path")
    // a clashing wave refuses through the confirm join
    val e = intercept[IllegalArgumentException] {
      DedupOps.idClashCheck(spark, path, "digests", "spec",
        corpus.select(col("doc_id")).limit(3), "doc_id", params)
    }
    assert(e.getMessage.contains("already exists"))
    // end-to-end: a clean append keeps coverage (idbloom stays yes) and
    // re-appending the same wave is caught by the NEW wave's filter
    val wave2 = docs.filter(col("doc_id") % 10 >= 6)
    wave2.appendDigestIndex(path, "doc_id", "text")
    assert(DedupOps.indexMeta(spark, path, "spec")("__idbloom") === "yes")
    val e2 = intercept[IllegalArgumentException] {
      wave2.appendDigestIndex(path, "doc_id", "text")
    }
    assert(e2.getMessage.contains("already exists"))
    // the downgrade is loud and sticky: a bound-skipped wave flips the
    // meta to no, and later appends stay on the confirm-join path
    val p2 = path + "_nofit"
    corpus.writeDigestIndex(p2, "doc_id", "text")
    docs.filter(col("doc_id") % 10 === 6)
      .select((col("doc_id") + 7000000L).as("doc_id"), col("text"))
      .appendDigestIndex(p2, "doc_id", "text")
    // simulate an over-bound wave by flipping the meta line directly is
    // not possible without a maxIdBloomBytes knob on append; instead
    // pin the string-id fallback: a non-long id column keeps idbloom=no
    val p3 = path + "_strid"
    corpus.select(concat(lit("d"), col("doc_id")).as("doc_id"), col("text"))
      .writeDigestIndex(p3, "doc_id", "text")
    assert(DedupOps.indexMeta(spark, p3, "spec")("__idbloom") === "no")
    // and the string layout's clash check still works (semi-join path)
    val e3 = intercept[IllegalArgumentException] {
      corpus.select(concat(lit("d"), col("doc_id")).as("doc_id"), col("text"))
        .limit(3).appendDigestIndex(p3, "doc_id", "text")
    }
    assert(e3.getMessage.contains("already exists"))
  }

  test("fsck: healthy layouts answer all-green; a torn append is NAMED; repair clears it") {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_fsck_spec").toString
    val corpus = docs.filter(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 5)
    val wave2 = docs.filter(col("doc_id") % 10 >= 6)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSeq
    corpus.writeDigestIndex(path, "doc_id", "text")
    wave2.appendDigestIndex(path, "doc_id", "text")
    DedupOps.deleteFromDigestIndex(spark, path,
      docs.filter(col("doc_id") % 3 === 0).select(col("doc_id")))
    val healthy = rows(DedupOps.fsckTextIndex(spark, path))
    assert(healthy.map(_._1) === Seq("meta", "token_in_waves",
      "digests_tokens", "bloom_covers_waves", "idbloom_covers_waves",
      "tombstones"), s"check inventory drifted: $healthy")
    assert(healthy.forall(_._2), s"healthy layout not all-green: $healthy")
    // tear an append (rows land, meta commit doesn't): readers refuse,
    // fsck NAMES the torn table instead
    val metaBefore = spark.read.textFile(s"$path/meta").collect().toSeq
    import spark.implicits._
    docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 700000L).as("doc_id"), col("text"))
      .appendDigestIndex(path, "doc_id", "text")
    spark.createDataset(metaBefore).coalesce(1).write.mode("overwrite")
      .text(s"$path/meta")
    val torn = rows(DedupOps.fsckTextIndex(spark, path)).toMap
    assert(!torn("digests_tokens"), "fsck missed the torn append")
    assert(torn("meta") && torn("token_in_waves"))
    DedupOps.repairDigestIndex(spark, path)
    assert(rows(DedupOps.fsckTextIndex(spark, path)).forall(_._2),
      "repair did not restore an all-green fsck")
    // a missing meta with no complete meta_tmp reports, never throws
    val broken = path + "_nometa"
    corpus.limit(5).writeDigestIndex(broken, "doc_id", "text")
    val fs = new org.apache.hadoop.fs.Path(broken)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$broken/meta"), true)
    val noMeta = rows(DedupOps.fsckTextIndex(spark, broken))
    assert(noMeta === Seq(("meta", false)) ||
      (noMeta.length == 1 && !noMeta.head._2), s"$noMeta")
    // bm25 family: constants + negative-df + tombstone checks all green
    val bm = path + "_bm25"
    import graft.operators.CorpusOps.DatasetCorpusOps
    corpus.writeBm25Index(bm, "doc_id", "text")
    graft.operators.CorpusOps.deleteFromBm25Index(spark, bm,
      corpus.limit(7).select(col("doc_id")))
    val bmRows = rows(graft.operators.CorpusOps.fsckBm25Index(spark, bm))
    assert(bmRows.map(_._1).contains("terms_df_nonnegative") &&
      bmRows.forall(_._2), s"$bmRows")
    // ivfpq family
    val iv = path + "_ivf"
    val emb = graft.Tables.embeddings(spark, sf())
    import graft.operators.VectorOps._
    emb.writeIvfPq(iv, "embedding", "vec_id", nlist = 8, m = 4, ksub = 4,
      iters = 2)
    graft.operators.VectorOps.deleteFromIvfPq(spark, iv,
      emb.limit(5).select(col("vec_id")), "vec_id")
    val ivRows = rows(graft.operators.VectorOps.fsckIvfPq(spark, iv))
    assert(ivRows.map(_._1) === Seq("meta", "data_tokens", "tombstones",
      "idbloom_present") && ivRows.forall(_._2), s"$ivRows")
    // spatial family: the cell-count check the kNN radii stand on
    val sp = path + "_sp"
    graft.index.SpatialDisk.write(
      graft.Tables.customerPts(spark, sf()), sp, Seq("cx", "cy"), cellBits = 3)
    val spRows = rows(graft.index.SpatialDisk.fsck(spark, sp))
    assert(spRows.map(_._1) === Seq("meta", "data_tokens", "cell_counts_exact")
      && spRows.forall(_._2), s"$spRows")
    // drift a cell count in the meta: fsck names the broken guarantee
    val metaLines = spark.read.textFile(s"$sp/meta").collect().toSeq
    val drifted = metaLines.map { l =>
      if (!l.startsWith("cells=")) l
      else {
        val body = l.substring(6)
        val first = body.split(";").head
        val parts = first.split(":")
        val bumped = s"${parts(0)}:${parts(1).toLong + 1}:${parts(2)}"
        "cells=" + (bumped +: body.split(";").tail).mkString(";")
      }
    }
    spark.createDataset(drifted).coalesce(1).write.mode("overwrite")
      .text(s"$sp/meta")
    val spBad = rows(graft.index.SpatialDisk.fsck(spark, sp)).toMap
    assert(!spBad("cell_counts_exact"), "fsck missed the drifted cell count")
  }

  test("fsck -> repair round-trips: minhash and CDC torn appends heal " +
    "in place and answer like the pre-tear layout") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSeq
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val wave = docs.filter(col("doc_id") % 2 =!= 0)
    import spark.implicits._
    // ---- minhash
    val mh = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_fsck_rt_mh").toString
    corpus.writeMinhashIndex(mh, "doc_id", "text")
    def mhPairs() = wave
      .minHashPairsAgainstIndex(mh, "doc_id", "text", threshold = 0.3)
      .select("id_new", "id_corpus").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val mhWant = mhPairs()
    val mhMeta = spark.read.textFile(s"$mh/meta").collect().toSeq
    corpus.limit(20)
      .select((col("doc_id") + 800000L).as("doc_id"), col("text"))
      .appendMinhashIndex(mh, "doc_id", "text")
    spark.createDataset(mhMeta).coalesce(1).write.mode("overwrite")
      .text(s"$mh/meta") // the append's meta commit "never happened"
    val mhTorn = rows(DedupOps.fsckTextIndex(spark, mh)).toMap
    assert(!mhTorn("buckets_tokens") && !mhTorn("shingles_tokens"),
      s"fsck missed the torn minhash append: $mhTorn")
    DedupOps.repairMinhashIndex(spark, mh)
    assert(rows(DedupOps.fsckTextIndex(spark, mh)).forall(_._2),
      "minhash repair did not restore an all-green fsck")
    assert(mhPairs() === mhWant,
      "repaired minhash layout answers differently from the pre-tear one")
    // ---- cdc
    val cd = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_fsck_rt_cdc").toString
    corpus.writeCdcIndex(cd, "doc_id", "text")
    def cdPairs() = wave
      .cdcPairsAgainstIndex(cd, "doc_id", "text", minShared = 1)
      .select("id_new", "id_corpus").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val cdWant = cdPairs()
    val cdMeta = spark.read.textFile(s"$cd/meta").collect().toSeq
    corpus.limit(20)
      .select((col("doc_id") + 800000L).as("doc_id"), col("text"))
      .appendCdcIndex(cd, "doc_id", "text")
    spark.createDataset(cdMeta).coalesce(1).write.mode("overwrite")
      .text(s"$cd/meta")
    val cdTorn = rows(DedupOps.fsckTextIndex(spark, cd)).toMap
    assert(!cdTorn("chunks_tokens") && !cdTorn("shingles_tokens"),
      s"fsck missed the torn cdc append: $cdTorn")
    DedupOps.repairCdcIndex(spark, cd)
    assert(rows(DedupOps.fsckTextIndex(spark, cd)).forall(_._2),
      "cdc repair did not restore an all-green fsck")
    assert(cdPairs() === cdWant,
      "repaired cdc layout answers differently from the pre-tear one")
  }

  test("digest index: normalized form matches case/punct variants") {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_digest_norm_spec").toString
    val corpus = Seq((1L, "Alpha, Beta!"), (2L, "gamma delta"))
      .toDF("doc_id", "text")
    corpus.writeDigestIndex(path, "doc_id", "text", normalized = true)
    val wave = Seq((10L, "alpha   beta"), (11L, "GAMMA DELTA?"),
      (12L, "epsilon")).toDF("doc_id", "text")
    val got = wave.exactPairsAgainstIndex(path, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 1L), (11L, 2L)))
    val admitted = wave.admitAgainstDigestIndex(path, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted === Set(12L))
  }

  test("at-rest cdc index: index-backed pairs equal the direct form") {
    import spark.implicits._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_cdc_index_spec").toString
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    corpus.writeCdcIndex(path, "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    for (cap <- Seq(64, 3)) {
      val got = rows(fresh.cdcPairsAgainstIndex(path, "doc_id", "text",
        minShared = 1, maxDocsPerChunk = cap))
      val want = rows(fresh.cdcChunkPairsAgainst(corpus, "doc_id", "text",
        minShared = 1, maxDocsPerChunk = cap))
      assert(got === want, s"cap=$cap index != direct")
      if (cap == 64) assert(got.nonEmpty)
    }
    // a torn layout (meta token not matching the tables) refuses loudly
    val tampered = spark.read.textFile(s"$path/meta").collect().toSeq
      .map(l => if (l.startsWith("token=")) "token=some-other-write" else l)
    spark.createDataset(tampered).coalesce(1).write.mode("overwrite")
      .text(s"$path/meta")
    val e = intercept[Throwable] {
      fresh.cdcPairsAgainstIndex(path, "doc_id", "text").collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("write-token mismatch")), s"$msgs")
  }

  test("minhash index append + compact: wave admission keeps the direct contract") {
    import org.apache.spark.sql.DataFrame
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_minhash_append_spec").toString
    val corpus0 = docs.filter(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 5)
    val wave2 = docs.filter(col("doc_id") % 10 >= 6)
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    corpus0.writeMinhashIndex(path, "doc_id", "text")
    wave2.appendMinhashIndex(path, "doc_id", "text")
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val union = corpus0.unionByName(wave2)
    // cap 2 exercises the merged-population path: a bucket whose
    // members are split across waves must be capped on the MERGED size
    for (cap <- Seq(0, 2)) {
      val got = rows(fresh.minHashPairsAgainstIndex(path, "doc_id", "text",
        threshold = 0.3, maxBucket = cap))
      val want = rows(fresh.minHashPairsAgainst(union, "doc_id", "text",
        threshold = 0.3, maxBucket = cap))
      assert(got === want, s"cap=$cap appended index != direct on union")
      if (cap == 0) assert(got.nonEmpty)
    }
    val gotAll = rows(fresh.minHashPairsAgainstIndex(path, "doc_id", "text",
      threshold = 0.3))
    assert(gotAll.exists(p => p._2 % 10 >= 6),
      "no pair against an appended-wave doc — the append is invisible")
    val clash = intercept[IllegalArgumentException] {
      corpus0.appendMinhashIndex(path, "doc_id", "text")
    }
    assert(clash.getMessage.contains("already exists"))
    DedupOps.compactMinhashIndex(spark, path)
    val meta = spark.read.textFile(s"$path/meta").collect()
      .find(_.startsWith("waves=")).get
    assert(!meta.contains(";"), s"compact left several waves: $meta")
    val after = rows(fresh.minHashPairsAgainstIndex(path, "doc_id", "text",
      threshold = 0.3))
    assert(after === gotAll, "compact changed answers")
  }

  test("cdc index append + compact: wave admission keeps the direct contract") {
    import org.apache.spark.sql.DataFrame
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_cdc_append_spec").toString
    val corpus0 = docs.filter(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 5)
    val wave2 = docs.filter(col("doc_id") % 10 >= 6)
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    corpus0.writeCdcIndex(path, "doc_id", "text")
    wave2.appendCdcIndex(path, "doc_id", "text")
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val union = corpus0.unionByName(wave2)
    // cap 3 matters: a chunk's MERGED membership must be capped, not
    // the per-wave slices
    for (cap <- Seq(64, 3)) {
      val got = rows(fresh.cdcPairsAgainstIndex(path, "doc_id", "text",
        minShared = 1, maxDocsPerChunk = cap))
      val want = rows(fresh.cdcChunkPairsAgainst(union, "doc_id", "text",
        minShared = 1, maxDocsPerChunk = cap))
      assert(got === want, s"cap=$cap appended index != direct on union")
      if (cap == 64) assert(got.nonEmpty)
    }
    // cross-wave sharing must be visible: some pair's corpus doc comes
    // from the APPENDED wave
    val gotAll = rows(fresh.cdcPairsAgainstIndex(path, "doc_id", "text",
      minShared = 1))
    assert(gotAll.exists(p => p._2 % 10 >= 6),
      "no pair against an appended-wave doc — the append is invisible")
    // an id clash across waves refuses up front
    val clash = intercept[IllegalArgumentException] {
      corpus0.appendCdcIndex(path, "doc_id", "text")
    }
    assert(clash.getMessage.contains("already exists"))
    // compact: back to one wave, same answers, in-place read again
    DedupOps.compactCdcIndex(spark, path)
    val meta = spark.read.textFile(s"$path/meta").collect()
      .find(_.startsWith("waves=")).get
    assert(!meta.contains(";"), s"compact left several waves: $meta")
    val tokens = spark.read.parquet(s"$path/chunks")
      .select("__graft_token").distinct().collect()
    assert(tokens.length === 1)
    val after = rows(fresh.cdcPairsAgainstIndex(path, "doc_id", "text",
      minShared = 1))
    assert(after === gotAll, "compact changed answers")
    // a torn append (rows landed, meta commit didn't) refuses loudly:
    // simulate by appending and then restoring the pre-append meta
    val metaBefore = spark.read.textFile(s"$path/meta").collect().toSeq
    docs.filter(col("doc_id") % 10 === 0).select(
        (col("doc_id") + 500000L).as("doc_id"), col("text"))
      .appendCdcIndex(path, "doc_id", "text")
    spark.createDataset(metaBefore).coalesce(1).write.mode("overwrite")
      .text(s"$path/meta")
    val e = intercept[Throwable] {
      fresh.cdcPairsAgainstIndex(path, "doc_id", "text").collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("write-token mismatch")), s"$msgs")
    // repair rolls the torn wave back: reads recover to the pre-append
    // answers, and the SAME wave can re-run its append cleanly (its
    // orphaned rows no longer trip the id-clash check)
    DedupOps.repairCdcIndex(spark, path)
    assert(rows(fresh.cdcPairsAgainstIndex(path, "doc_id", "text",
      minShared = 1)) === gotAll, "repair changed admitted answers")
    val retryWave = docs.filter(col("doc_id") % 10 === 0).select(
      (col("doc_id") + 500000L).as("doc_id"), col("text"))
    retryWave.appendCdcIndex(path, "doc_id", "text")
    val withRetry = rows(fresh.cdcPairsAgainstIndex(path, "doc_id", "text",
      minShared = 1))
    assert(withRetry.size > gotAll.size,
      "re-appended wave invisible after repair")
  }

  test("cdc membership cap drops boilerplate chunks; audit lists them") {
    // 6 docs with an identical 200-char body: every chunk lives in 6
    // docs, so a cap of 4 admits no pair — and the audit names exactly
    // the dropped chunks
    val body = ("the quick brown fox jumps over the lazy dog. " * 5).trim
    val df = (1L to 6L).map(i => (i, body)).toDF("doc_id", "text")
    val pairs = df.cdcChunkPairs("doc_id", "text", minShared = 1,
      maxDocsPerChunk = 4)
    assert(pairs.count() === 0)
    val audit = df.cdcCrossDocChunks("doc_id", "text", maxDocsPerChunk = 4)
      .collect()
    val nChunks = TextKernels.cdcChunks(body, 8, 0x3FL, 32, 256).toSet.size
    assert(audit.length === nChunks)
    audit.foreach(r => assert(r.getLong(2) === 6L))
    // raising the cap re-admits the cluster: all 15 pairs, jaccard 1.0
    val open = df.cdcChunkPairs("doc_id", "text", minShared = 1,
      maxDocsPerChunk = 8).collect()
    assert(open.length === 15)
    open.foreach(r => assert(r.getDouble(3) === 1.0))
  }
}
