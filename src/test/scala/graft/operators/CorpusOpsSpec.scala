package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.operators.CorpusOps._

class CorpusOpsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf())

  test("boilerplateScore: planted shared header scores 1.0, unique text 0.0") {
    import spark.implicits._
    val header = "terms of service apply to all visitors"
    val fixture = Seq(
      (1L, s"$header alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$header iota kappa lambda mu nu xi omicron pi"),
      (3L, "completely unrelated text one two three four five six seven"),
      (4L, "short")).toDF("doc_id", "text")
    val got = fixture.boilerplateScore("doc_id", "text", n = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 4 has < 4 words -> no grams -> absent
    assert(got.keySet === Set(1L, 2L, 3L))
    // the 7-word header contributes 4 internal 4-grams shared by docs 1
    // and 2; grams straddling header/tail differ between them, so the
    // shared grams are EXACTLY the header-internal ones. 15 words ->
    // 12 distinct grams per doc.
    val (t1, b1, f1) = got(1L)
    assert(t1 === 12L && b1 === 4L, s"doc1 got ($t1, $b1)")
    assert(f1 === 4.0 / 12.0)
    // doc 3 shares nothing
    assert(got(3L)._2 === 0L && got(3L)._3 === 0.0)
  }

  test("boilerplateScore: fraction bounded, duplicate docs fully boilerplate") {
    val base = docs.filter(col("doc_id") < 50)
    val dup = docs.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val out = base.unionAll(dup)
      .boilerplateScore("doc_id", "text", n = 5, minDocs = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.foreach { case (t, b, f) =>
      assert(b <= t && f >= 0.0 && f <= 1.0)
    }
    // every duplicated doc (both copies) with >= 5 words scores 1.0:
    // each of its grams occurs in at least the two copies
    val expectDup = 2 * docs.filter(col("doc_id") < 10)
      .filter(graft.functions.tokenCount(col("text")) >= 5).count()
    assert(out.count(_._3 == 1.0) >= expectDup && expectDup > 0)
  }

  test("unigramScore: exact mean corpus unigram probability on a known fixture") {
    import spark.implicits._
    val fixture = Seq((1L, "a a b"), (2L, "a c"), (3L, "   "))
      .toDF("doc_id", "text")
    val got = fixture.unigramScore("doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // corpus counts: a=3, b=1, c=1; N=5
    assert(got(1L) === ((3L, 7L, 7.0 / 15.0)))  // 3+3+1 over 3*5
    assert(got(2L) === ((2L, 4L, 4.0 / 10.0)))  // 3+1 over 2*5
    assert(got(3L) === ((0L, 0L, 0.0)))          // zero tokens -> 0.0
  }

  test("unigramScore: typical docs outscore rare-token docs on the corpus") {
    import spark.implicits._
    val junk = Seq((9000001L, "qzxv jkqw zzyx wvut qpzm xkcd"))
      .toDF("doc_id", "text")
    val scored = docs.select(col("doc_id"), col("text")).unionAll(junk)
      .unigramScore("doc_id", "text")
    val junkScore = scored.filter(col("doc_id") === 9000001L)
      .head().getDouble(3)
    val corpusMedian = scored.filter(col("doc_id") < 9000000L)
      .stat.approxQuantile("unigram_score", Array(0.5), 0.0).head
    assert(junkScore < corpusMedian,
      s"rare-token junk ($junkScore) must score below the median ($corpusMedian)")
    // scores are probabilities-of-sorts: always in (0, 1] for non-empty docs
    assert(scored.filter(col("n_tokens") > 0)
      .filter(col("unigram_score") <= 0.0 || col("unigram_score") > 1.0)
      .count() === 0L)
  }

  test("unigramScore reuses the count-table exchange for the corpus total") {
    // the corpus-total branch derives from the same token-count shuffle
    // as the score join; AQE must reuse that exchange, not recompute it
    // (a third corpus pass at 100 TB otherwise)
    val df = docs.unigramScore("doc_id", "text")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"corpus total must reuse the count exchange:\n$p")
  }

  test("vocabStats: sketch within bound, deterministic under repartitioning") {
    val a = docs.vocabStats("lang", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(a.nonEmpty && a.values.forall(_._2),
      s"HLL sketch must land within 5% of exact: $a")
    // HLL registers are max-merged — order and partitioning must not
    // change the verdict or the exact counts
    val b = docs.repartition(13).vocabStats("lang", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(a === b)
  }

  test("sourceReputationFilter drops the low-quality source, keeps the good one") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "good", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "good", "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (3L, "bad", "the the the the the the"),
      (4L, "bad", "a a a a of of of of")).toDF("doc_id", "source", "text")
    val out = fixture.sourceReputationFilter("source", "text", minMean = 0.5)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L), s"only the good source survives: $kept")
    // the attached mean equals an independent davg over the same group
    val want = fixture.filter(col("source") === "good")
      .agg(Tables.davg(graft.functions.qualityScore(col("text"))))
      .head().getDouble(0)
    val attached = out.select("source_mean_q").distinct().head().getDouble(0)
    assert(attached === want)
  }

  test("sourceReputationFilter broadcasts the reputation table (corpus never shuffles)") {
    val plan = docs.sourceReputationFilter("source", "text", minMean = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"reputation join must broadcast:\n$plan")
  }

  test("winnowFingerprints: shared n+w-1 run guarantees a shared fingerprint") {
    import spark.implicits._
    // docs 1 and 2 share a 7-word run (= n + w - 1 for n=4, w=4) inside
    // otherwise-disjoint text; doc 3 is unrelated; doc 4 too short
    val run = "quick brown foxes jump over lazy dogs"
    val fixture = Seq(
      (1L, s"alpha beta gamma $run delta epsilon"),
      (2L, s"one two three four $run five six seven"),
      (3L, "totally different words in this unrelated document body here"),
      (4L, "just three words")).toDF("doc_id", "text")
    val fp = fixture.winnowFingerprints("doc_id", "text", n = 4, w = 4)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDoc = fp.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    // the winnowing guarantee: >= 1 shared fingerprint for the run
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
    // unrelated doc shares nothing with either
    assert((byDoc(3L) intersect (byDoc(1L) union byDoc(2L))).isEmpty)
    // < n + w - 1 words -> no full window -> absent
    assert(!byDoc.contains(4L))
    // every fingerprint is a gram md5 actually present in the doc
    val grams1 = "alpha beta gamma quick brown foxes jump over lazy dogs delta epsilon"
      .split(" ").sliding(4).map(_.mkString(" ")).toSet
    val md5s1 = grams1.map(g => java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(byDoc(1L).subsetOf(md5s1))
  }

  test("winnowPairs: long shared run pairs up, unrelated docs do not") {
    import spark.implicits._
    val run = "the quick brown fox jumps over the lazy dog again and again"
    val fixture = Seq(
      (1L, s"prefix words here $run suffix tail words"),
      (2L, s"other opening text $run closing remarks follow now"),
      (3L, "entirely distinct content with no overlap whatsoever present here today")
    ).toDF("doc_id", "text")
    val got = fixture.winnowPairs("doc_id", "text", n = 4, w = 4, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    // shared fingerprints are a symmetric count and id1 < id2
    assert(got.head._3 >= 2L)
  }

  test("tokenChunks: full coverage, stride overlap, tail chunk shorter") {
    import spark.implicits._
    val words = (1 to 10).map(i => s"w$i").mkString(" ")
    val fixture = Seq((1L, words), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val got = fixture.tokenChunks("doc_id", "text", size = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // doc 1: 10 tokens -> ceil((10-4)/2)+1 = 4 chunks at starts 0,2,4,6
    val d1 = got.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    assert(d1.toSeq === Seq("w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8",
      "w7 w8 w9 w10"))
    // doc 2: fewer tokens than size -> one (short) chunk
    assert(got.filter(_._1 == 2L).map(_._3).toSeq === Seq("a b"))
    // doc 3: zero tokens -> no chunks
    assert(!got.exists(_._1 == 3L))
  }

  test("sequencePack: contiguous next-fit bins, overflow by at most one doc") {
    val packed = docs.sequencePack("source", "doc_id",
      graft.functions.tokenCount(col("text")), capacity = 500L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(packed.length.toLong === docs.count())
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // cum_tokens is the exclusive prefix sum in doc_id order
      var cum = 0L
      sorted.foreach { case (_, _, tok, cumGot, bin) =>
        assert(cumGot === cum)
        assert(bin === cum / 500L)
        cum += tok
      }
      // bins are contiguous and non-decreasing; a bin's content starts
      // before capacity*(bin+1) by construction
      val bins = sorted.map(_._5)
      assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
    }
  }

  test("sequencePack: total tokens per bin exceed capacity only via the straddler") {
    import spark.implicits._
    val fixture = Seq(
      ("s", 1L, 300L), ("s", 2L, 300L), ("s", 3L, 50L),
      ("s", 4L, 600L), ("s", 5L, 10L)).toDF("source", "doc_id", "n")
    val got = fixture.sequencePack("source", "doc_id", col("n"), capacity = 500L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4)))
    // cum: 0, 300, 600, 650, 1250 -> bins 0, 0, 1, 1, 2
    assert(got.toSeq === Seq((1L, 0L, 0L), (2L, 300L, 0L),
      (3L, 600L, 1L), (4L, 650L, 1L), (5L, 1250L, 2L)))
  }

  test("sequencePackGlobal: bins span source boundaries on a known fixture") {
    import spark.implicits._
    val fixture = Seq(
      ("a", 1L, 300L), ("a", 2L, 300L),
      ("b", 1L, 50L), ("b", 2L, 600L), ("c", 1L, 10L))
      .toDF("source", "doc_id", "n")
    // global order (a,1)(a,2)(b,1)(b,2)(c,1); cum: 0,300,600,650,1250
    // -> bins 0,0,1,1,2 — (b,1) lands in the bin (a,*) opened
    val got = fixture.sequencePackGlobal("source", "doc_id", col("n"),
      capacity = 500L, bucketWidth = 1L)
      .orderBy("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(("a", 1L, 0L, 0L), ("a", 2L, 300L, 0L),
      ("b", 1L, 600L, 1L), ("b", 2L, 650L, 1L), ("c", 1L, 1250L, 2L)))
  }

  test("sequencePackGlobal rejects non-integral id columns") {
    import spark.implicits._
    // "100" sorts before "63" but buckets after it — the decomposition
    // would silently misorder the prefix sum, so it must refuse
    val fixture = Seq(("a", "63", 10L), ("a", "100", 5L))
      .toDF("source", "doc_id", "n")
    val e = intercept[IllegalArgumentException] {
      fixture.sequencePackGlobal("source", "doc_id", col("n"), capacity = 64L)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("heavyNgrams: exact heavy set whatever the sketch width; semi-join plan") {
    // the naive exact result the prefilter must never change
    val naive = docs
      .select(explode(graft.functions.wordGrams(col("text"), 3)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "fixture has no heavy grams — test is vacuous")
    // degenerate width 1 (single bucket, zero pruning) and a wide
    // sketch (real pruning) must both return exactly the naive set
    for (w <- Seq(1, 1 << 16)) {
      val got = docs.heavyNgrams("text", n = 3, minCount = 4L, sketchWidth = w)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got === naive, s"sketchWidth=$w diverged from the exact set")
    }
    // the prefilter is a broadcast semi-join, never a driver collect
    val plan = docs.heavyNgrams("text", n = 3, minCount = 4L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("Broadcast"),
      s"expected a broadcast semi-join prefilter:\n$plan")
  }

  test("sequencePackGlobal fails loudly on negative token counts") {
    import spark.implicits._
    // the bucket-total identity max(prefix+own)=sum holds only for
    // non-negative tokens; a negative count must throw, not silently
    // corrupt every downstream offset
    val fixture = Seq(("a", 1L, 10L), ("a", 2L, -3L), ("a", 3L, 5L))
      .toDF("source", "doc_id", "n")
    val e = intercept[Throwable] {
      fixture.sequencePackGlobal("source", "doc_id", col("n"),
        capacity = 64L, bucketWidth = 1L).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("non-negative")),
      s"negative tokens not rejected: $msgs")
  }

  test("sequencePackGlobal: decomposed scan equals the sequential global scan") {
    // bucketWidth=64 forces genuine multi-bucket recombination on the
    // documents table; the driver replay is the sequential chain the
    // two-pass decomposition must reproduce exactly
    val got = docs.sequencePackGlobal("source", "doc_id",
      graft.functions.tokenCount(col("text")), capacity = 2048L,
      bucketWidth = 64L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val seq0 = docs.select(col("source"), col("doc_id"),
      graft.functions.tokenCount(col("text")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(got.size === seq0.length && seq0.nonEmpty)
    var cum = 0L
    seq0.foreach { case (s, id, tok) =>
      assert(got((s, id)) === ((tok, cum, cum / 2048L)),
        s"mismatch at ($s, $id)")
      cum += tok
    }
  }

  test("bm25TopK replays bit-exactly against an independent driver scorer") {
    val terms = Seq("spark", "vector", "window", "hash", "merge", "customer")
    val k1 = 1.2; val b = 0.75; val k = 15
    val got = docs.bm25TopK("doc_id", "text", terms, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // independent recompute with the operator's exact IEEE graph
    val corpus = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.split("\\s+").filter(_.nonEmpty))
    val n = corpus.length.toDouble
    val avgdl = corpus.map(_._2.length.toLong).sum.toDouble / corpus.length.toDouble
    val idf = terms.map { t =>
      val dfT = corpus.count(_._2.contains(t)).toDouble
      (n - dfT + 0.5) / (dfT + 0.5)
    }
    val scored = corpus.map { case (id, toks) =>
      val dl = toks.length.toDouble
      val score = terms.zipWithIndex.map { case (t, i) =>
        val tf = toks.count(_ == t).toDouble
        idf(i) * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
      }.reduce(_ + _)
      (id, toks.length.toLong, score)
    }.filter(_._3 > 0.0)
    val want = scored.sortBy { case (id, _, s) => (-s, id) }.take(k)
    assert(got.sortBy { case (id, _, s) => (-s, id) }.toSeq === want.toSeq)
    // sanity: the term set has df variety, so idf actually discriminates
    assert(idf.distinct.length > 1)
  }

  test("hybridTopK: cosine re-rank of exactly the bm25 candidate set") {
    val terms = Seq("spark", "vector", "window", "hash", "merge", "customer")
    val embs = Tables.embeddings(spark, sf())
    val q = embs.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val got = docs.hybridTopK("doc_id", "text", terms, embs, "vec_id",
      "embedding", q, candidates = 50, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // reference: the bm25 stage, joined and re-ranked by the same
    // codegen'd cosine — stage composition must add NOTHING else
    val cand = docs.bm25TopK("doc_id", "text", terms, 50)
      .select(col("doc_id"), col("score"))
    val want = cand.join(embs.select(col("vec_id").as("doc_id"),
        col("embedding")), Seq("doc_id"))
      .withColumn("cos",
        graft.functions.cosineSimilarity(col("embedding"), lit(q)))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getDouble(r.fieldIndex("cos"))))
      .sortBy { case (id, _, c) => (-c, id) }.take(10)
    assert(got.sortBy { case (id, _, c) => (-c, id) }.toSeq === want.toSeq)
    // the re-rank genuinely reorders: cosine order != bm25 order here
    val byScore = got.sortBy { case (id, s, _) => (-s, id) }.map(_._1).toSeq
    val byCos = got.sortBy { case (id, _, c) => (-c, id) }.map(_._1).toSeq
    assert(byScore !== byCos, "fixture degenerate: re-rank was a no-op")
  }

  test("bm25 index: layout answers bit-identically, postings read pruned") {
    import spark.implicits._
    import graft.operators.CorpusOps
    val terms = Seq("spark", "vector", "window", "hash", "merge", "customer")
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25_idx_spec").toString
    docs.writeBm25Index(path, "doc_id", "text")
    val got = CorpusOps.bm25TopKAgainstIndex(spark, path, terms, 15)
    val want = docs.bm25TopK("doc_id", "text", terms, 15)
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => t._1).toSeq ===
      want.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => t._1).toSeq)
    // a term absent from the corpus contributes its literal 0.0 — the
    // bm25TopK contract — and never breaks the layout read
    val got2 = CorpusOps.bm25TopKAgainstIndex(spark, path,
      terms :+ "zzz_not_a_token", 15)
    val want2 = docs.bm25TopK("doc_id", "text", terms :+ "zzz_not_a_token", 15)
    assert(got2.collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
      === want2.collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq)
    // the postings scan carries the pushed term IN filter — the layout
    // read is term-pruned, not a table scan
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("term"),
      "postings scan lost its pushed term filter")
    // torn layout refuses
    val tampered = spark.read.textFile(s"$path/meta").collect().toSeq
      .map(l => if (l.startsWith("token=")) "token=some-other-write" else l)
    spark.createDataset(tampered).coalesce(1).write.mode("overwrite")
      .text(s"$path/meta")
    val e = intercept[Throwable] {
      CorpusOps.bm25TopKAgainstIndex(spark, path, terms, 5).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("write-token mismatch")), s"$msgs")
  }

  test("bm25 index append: waves answer like a fresh full write") {
    import spark.implicits._
    import graft.operators.CorpusOps
    val terms = Seq("spark", "vector", "window", "hash", "merge", "customer")
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25_app_spec").toString
    val fullPath = path + "_full"
    val corpus0 = docs.filter(col("doc_id") % 2 === 0)
    val wave = docs.filter(col("doc_id") % 2 =!= 0)
    corpus0.writeBm25Index(path, "doc_id", "text")
    wave.appendBm25Index(path, "doc_id", "text")
    docs.writeBm25Index(fullPath, "doc_id", "text")
    def top(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val got = top(CorpusOps.bm25TopKAgainstIndex(spark, path, terms, 15))
    val want = top(CorpusOps.bm25TopKAgainstIndex(spark, fullPath, terms, 15))
    assert(got === want, "appended layout != fresh full write")
    assert(got === top(docs.bm25TopK("doc_id", "text", terms, 15)),
      "appended layout != in-memory scorer on the union")
    // cross-wave id clash refuses
    val clash = intercept[IllegalArgumentException] {
      corpus0.appendBm25Index(path, "doc_id", "text")
    }
    assert(clash.getMessage.contains("already exists"))
    // compact collapses waves to one token; answers unchanged
    CorpusOps.compactBm25Index(spark, path)
    val meta = spark.read.textFile(s"$path/meta").collect()
      .find(_.startsWith("waves=")).get
    assert(!meta.contains(";"), s"compact left several waves: $meta")
    assert(top(CorpusOps.bm25TopKAgainstIndex(spark, path, terms, 15))
      === want, "compact changed answers")
    // torn append (rows landed, meta commit didn't) refuses loudly...
    val metaBefore = spark.read.textFile(s"$path/meta").collect().toSeq
    docs.filter(col("doc_id") % 10 === 0).select(
        (col("doc_id") + 500000L).as("doc_id"), col("text"))
      .appendBm25Index(path, "doc_id", "text")
    spark.createDataset(metaBefore).coalesce(1).write.mode("overwrite")
      .text(s"$path/meta")
    val e = intercept[Throwable] {
      CorpusOps.bm25TopKAgainstIndex(spark, path, terms, 5).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("write-token mismatch")), s"$msgs")
    // ...and repair rolls it back: answers recover, the wave re-runs
    CorpusOps.repairBm25Index(spark, path)
    assert(top(CorpusOps.bm25TopKAgainstIndex(spark, path, terms, 15))
      === want, "repair changed admitted answers")
    docs.filter(col("doc_id") % 10 === 0).select(
        (col("doc_id") + 500000L).as("doc_id"), col("text"))
      .appendBm25Index(path, "doc_id", "text")
    assert(CorpusOps.bm25TopKAgainstIndex(spark, path, terms, 15)
      .count() > 0)
  }

  test("bm25 index delete: bit-equal to a fresh write on survivors; compact folds") {
    import spark.implicits._
    import graft.operators.CorpusOps
    val terms = Seq("spark", "vector", "window", "hash", "merge", "customer")
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25_del_spec").toString
    val survPath = path + "_surv"
    val corpus0 = docs.filter(col("doc_id") % 2 === 0)
    val wave = docs.filter(col("doc_id") % 2 =!= 0)
    val delIds = docs.filter(col("doc_id") % 3 === 0).select(col("doc_id"))
    corpus0.writeBm25Index(path, "doc_id", "text")
    wave.appendBm25Index(path, "doc_id", "text")
    CorpusOps.deleteFromBm25Index(spark, path, delIds)
    docs.join(delIds, Seq("doc_id"), "left_anti")
      .writeBm25Index(survPath, "doc_id", "text")
    def top(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    def metaConsts(p: String): (String, String) = {
      val ls = spark.read.textFile(s"$p/meta").collect()
      (ls.find(_.startsWith("n=")).get, ls.find(_.startsWith("sumdl=")).get)
    }
    val got = top(CorpusOps.bm25TopKAgainstIndex(spark, path, terms, 15))
    val want = top(CorpusOps.bm25TopKAgainstIndex(spark, survPath, terms, 15))
    assert(got === want, "deleted layout != fresh write on survivors")
    // the constants themselves are exact — the same N and Σdl a fresh
    // survivor write computes from scratch
    assert(metaConsts(path) === metaConsts(survPath),
      "delete left drifted constants")
    // match-all excludes tombstoned docs
    val mTerms = Seq("spark", "hash")
    val gotM = CorpusOps.matchAllTermsAgainstIndex(spark, path, mTerms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val wantM = CorpusOps.matchAllTermsAgainstIndex(spark, survPath, mTerms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotM === wantM && gotM.nonEmpty)
    // a second delete of the same ids is an idempotent no-op on the
    // constants (no double subtraction)
    CorpusOps.deleteFromBm25Index(spark, path, delIds)
    assert(metaConsts(path) === metaConsts(survPath),
      "re-delete subtracted the constants twice")
    // a tombstoned id stays dead for the clash check until a compact
    val deadRows = docs.join(delIds, Seq("doc_id"), "left_semi").limit(5)
    val clash = intercept[IllegalArgumentException] {
      deadRows.appendBm25Index(path, "doc_id", "text")
    }
    assert(clash.getMessage.contains("already exists"))
    // compact folds: tombstones gone, no negative dictionary rows
    // survive, answers and constants unchanged, dead ids revive
    CorpusOps.compactBm25Index(spark, path)
    assert(!new java.io.File(path, "tombstones").exists(),
      "compact left the tombstones dir behind")
    assert(spark.read.parquet(s"$path/terms")
      .filter(col("__df") <= 0L).count() === 0L,
      "compact left non-positive dictionary rows")
    assert(top(CorpusOps.bm25TopKAgainstIndex(spark, path, terms, 15))
      === want, "compact changed the deleted layout's answers")
    assert(metaConsts(path) === metaConsts(survPath))
    deadRows.appendBm25Index(path, "doc_id", "text")
    // torn delete (tombstones + negative df rows landed, meta didn't)
    // refuses loudly, and repair rolls the delete back whole
    val metaBefore = spark.read.textFile(s"$path/meta").collect().toSeq
    val before = top(CorpusOps.bm25TopKAgainstIndex(spark, path, terms, 15))
    CorpusOps.deleteFromBm25Index(spark, path,
      docs.filter(col("doc_id") % 5 === 1).select(col("doc_id")))
    spark.createDataset(metaBefore).coalesce(1).write.mode("overwrite")
      .text(s"$path/meta")
    val e = intercept[Throwable] {
      CorpusOps.bm25TopKAgainstIndex(spark, path, terms, 5).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("write-token mismatch")), s"$msgs")
    CorpusOps.repairBm25Index(spark, path)
    assert(top(CorpusOps.bm25TopKAgainstIndex(spark, path, terms, 15))
      === before, "repair must roll the torn delete back whole")
  }

  test("bm25 located delete (with text): bit-equal to the ids-only " +
    "verb; absent, dead, and empty-text waves are exact no-ops") {
    import spark.implicits._
    import graft.operators.CorpusOps
    val terms = Seq("spark", "vector", "window", "hash", "merge", "customer")
    val pathA = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25_delat_a").toString
    val pathB = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25_delat_b").toString
    val corpus0 = docs.filter(col("doc_id") % 2 === 0)
    val wave = docs.filter(col("doc_id") % 2 =!= 0)
    val delDocs = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
    for (p <- Seq(pathA, pathB)) {
      corpus0.writeBm25Index(p, "doc_id", "text")
      wave.appendBm25Index(p, "doc_id", "text")
    }
    def top(p: String) = CorpusOps.bm25TopKAgainstIndex(spark, p, terms, 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    def metaConsts(p: String): (String, String) = {
      val ls = spark.read.textFile(s"$p/meta").collect()
      (ls.find(_.startsWith("n=")).get, ls.find(_.startsWith("sumdl=")).get)
    }
    // the located verb (text rides the wave; postings never scanned)
    // must leave a layout BIT-EQUAL to the ids-only verb's
    CorpusOps.deleteFromBm25IndexWithText(spark, pathA, delDocs, "text")
    CorpusOps.deleteFromBm25Index(spark, pathB, delDocs.select("doc_id"))
    val want = top(pathB)
    assert(top(pathA) === want, "located delete != ids-only delete")
    assert(metaConsts(pathA) === metaConsts(pathB),
      "located delete drifted the constants")
    // absent ids (never written): exact no-ops — nothing admitted,
    // nothing subtracted
    CorpusOps.deleteFromBm25IndexWithText(spark, pathA,
      docs.select((col("doc_id") + 900000L).as("doc_id"), col("text")),
      "text")
    assert(top(pathA) === want && metaConsts(pathA) === metaConsts(pathB),
      "an all-absent wave must change nothing")
    // re-delete of already-dead docs: idempotent no-op
    CorpusOps.deleteFromBm25IndexWithText(spark, pathA, delDocs, "text")
    assert(metaConsts(pathA) === metaConsts(pathB),
      "re-delete subtracted the constants twice")
    // empty-tokenizing text is refused loudly (nothing to confirm by)
    val e = intercept[IllegalArgumentException] {
      CorpusOps.deleteFromBm25IndexWithText(spark, pathA,
        Seq((987654L, "")).toDF("doc_id", "text"), "text")
    }
    assert(e.getMessage.contains("tokenizes empty"), e.getMessage)
    // fsck green over the located waves; compact folds them
    assert(graft.operators.DedupOps.fsckTextIndex(spark, pathA).collect()
      .forall(_.getBoolean(1)), "fsck not green after located deletes")
    CorpusOps.compactBm25Index(spark, pathA)
    assert(top(pathA) === want, "compact changed the located layout")
    assert(!new java.io.File(pathA, "tombstones").exists())
  }

  test("phraseMatchAgainstIndex: candidates from slivers, adjacency " +
    "confirmed — equals the raw containment; deleted docs never match") {
    import spark.implicits._
    import graft.operators.CorpusOps
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_phrase_spec").toString
    docs.writeBm25Index(path, "doc_id", "text")
    val phrase = Seq("the", "spark")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSeq
    val got = CorpusOps.phraseMatchAgainstIndex(spark, path, docs, "text",
      phrase)
    // ground truth: boundary-safe containment over the raw token stream
    val toks = graft.functions.tokens(col("text"))
    val padded = concat(lit(" "), array_join(toks, " "), lit(" "))
    val want = docs.filter(padded.contains(" the spark "))
      .select(col("doc_id"),
        graft.functions.tokenCount(col("text")).as("n_tokens"))
      .orderBy(col("doc_id"))
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      want.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(got.count() > 0, "fixture phrase matches nothing — fixture broke")
    // bag-of-words would overmatch: docs holding both terms
    // non-adjacently must NOT surface
    val bag = CorpusOps.matchAllTermsAgainstIndex(spark, path, phrase)
    assert(bag.count() > got.count(),
      "no non-adjacent both-term doc in the fixture — adjacency untested")
    // a deleted doc leaves the candidate stage, never the confirm
    val dead = ids(got).take(2)
    CorpusOps.deleteFromBm25Index(spark, path, dead.toDF("doc_id"))
    val after = ids(CorpusOps.phraseMatchAgainstIndex(spark, path, docs,
      "text", phrase))
    assert(after === ids(got).filterNot(dead.contains),
      "tombstoned docs must not match a phrase")
    // an absent term empties the result through the candidate stage
    assert(CorpusOps.phraseMatchAgainstIndex(spark, path, docs, "text",
      Seq("the", "zzzznotaword")).count() === 0L)
    // whitespace in a phrase token is refused loudly
    val e = intercept[IllegalArgumentException] {
      CorpusOps.phraseMatchAgainstIndex(spark, path, docs, "text",
        Seq("the spark"))
    }
    assert(e.getMessage.contains("whitespace"), e.getMessage)
  }

  test("phraseBoolMatchAgainstIndex: AND/OR of phrases and terms equals " +
    "the raw containment; term-only queries never read the corpus") {
    import spark.implicits._
    import graft.operators.CorpusOps
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_phrase_bool_spec").toString
    docs.writeBm25Index(path, "doc_id", "text")
    val toks = graft.functions.tokens(col("text"))
    val padded = concat(lit(" "), array_join(toks, " "), lit(" "))
    def want(pred: org.apache.spark.sql.Column) =
      docs.filter(pred).select(col("doc_id"),
          graft.functions.tokenCount(col("text")).as("n_tokens"))
        .orderBy(col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def run(q: Seq[Seq[Seq[String]]]) =
      CorpusOps.phraseBoolMatchAgainstIndex(spark, path, docs, "text", q)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // (\"the spark\" OR \"hash join\") AND (\"big table\" OR customer)
    val q1 = Seq(Seq(Seq("the", "spark"), Seq("hash", "join")),
      Seq(Seq("big", "table"), Seq("customer")))
    val w1 = want((padded.contains(" the spark ") ||
        padded.contains(" hash join ")) &&
      (padded.contains(" big table ") || padded.contains(" customer ")))
    assert(run(q1) === w1 && w1.nonEmpty, "boolean composition mismatch")
    // each clause alone is strictly larger than the conjunction
    assert(run(Seq(q1.head)).size > w1.size &&
      run(Seq(q1(1))).size > w1.size, "AND did not narrow — fixture broke")
    // pure term query: exact from postings, corpus never read — feed a
    // corpus frame whose text would crash any evaluation to prove it
    val poisoned = docs.select(col("doc_id"),
      (col("text").substr(lit(1), assert_true(lit(false)).cast("int")))
        .as("text"))
    val termOnly = CorpusOps.phraseBoolMatchAgainstIndex(spark, path,
        poisoned, "text", Seq(Seq(Seq("customer")), Seq(Seq("spark"))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(termOnly === want(array_contains(toks, "customer") &&
      array_contains(toks, "spark")), "term-only boolean query mismatch")
    // a deleted doc drops out of every clause
    val dead = w1.take(1).map(_._1)
    CorpusOps.deleteFromBm25Index(spark, path, dead.toDF("doc_id"))
    assert(run(q1) === w1.filterNot(p => dead.contains(p._1)),
      "tombstoned doc surfaced through the boolean query")
    // malformed queries are refused loudly
    intercept[IllegalArgumentException] {
      CorpusOps.phraseBoolMatchAgainstIndex(spark, path, docs, "text",
        Seq(Seq(Seq("the spark"))))
    }
    intercept[IllegalArgumentException] {
      CorpusOps.phraseBoolMatchAgainstIndex(spark, path, docs, "text", Seq())
    }
  }

  test("bm25TopKJoinAgainstIndex: query-set retrieval — batching, " +
    "pushdown path, and deletes all preserve per-query results") {
    import spark.implicits._
    import graft.operators.CorpusOps
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25_qjoin_spec").toString
    docs.writeBm25Index(path, "doc_id", "text")
    def run(q: Seq[(Long, String)], k: Int = 5,
            maxPush: Int = 1024): Seq[(Long, Long, Long, Double)] =
      CorpusOps.bm25TopKJoinAgainstIndex(spark, path,
          q.toDF("qid", "term"), "qid", "term", k,
          maxPushdownTerms = maxPush)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
    val q1 = Seq((1L, "spark"), (1L, "vector"), (1L, "window"))
    val q2 = Seq((2L, "customer"), (2L, "hash"))
    // batching invariance: two queries together == each alone
    val together = run(q1 ++ q2)
    val alone = run(q1) ++ run(q2)
    assert(together === alone && together.nonEmpty)
    // k rows per query
    assert(together.groupBy(_._1).forall(_._2.size == 5))
    // the semi-join path (terms over the cap) returns the identical set
    assert(run(q1 ++ q2, maxPush = 2) === together)
    // repeated terms within a query count once
    assert(run(q1 ++ Seq((1L, "spark"))) === run(q1))
    // a query of only absent terms yields nothing, and absent terms
    // inside a real query contribute nothing
    assert(run(Seq((9L, "zzz_not_a_token"))).isEmpty)
    assert(run(q1 :+ (1L -> "zzz_not_a_token")) === run(q1))
    // over-ceiling maxPushdownTerms fails loudly naming the knob
    spark.conf.set(graft.GraftConf.MaxDriverPushdown, "8")
    try {
      val e = intercept[IllegalArgumentException](run(q1, maxPush = 9))
      assert(e.getMessage.contains(graft.GraftConf.MaxDriverPushdown))
    } finally spark.conf.unset(graft.GraftConf.MaxDriverPushdown)
    // tombstoned docs never rank
    val dead = together.filter(_._1 == 1L).take(2).map(_._2)
    CorpusOps.deleteFromBm25Index(spark, path, dead.toDF("doc_id"))
    val after = run(q1)
    assert(after.map(_._2).toSet.intersect(dead.toSet).isEmpty,
      "tombstoned docs ranked")
    assert(after.count(_._1 == 1L) == 5, "top-k did not refill after delete")
  }

  test("bm25 single-query and query-set surfaces agree up to rounding " +
    "(the documented DECIMAL-vs-IEEE-chain divergence stays sub-1e-6)") {
    import spark.implicits._
    import graft.operators.CorpusOps
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25_surface_pin_spec").toString
    docs.writeBm25Index(path, "doc_id", "text")
    val terms = Seq("spark", "vector", "window")
    // k = full corpus so near-tie RANK flips can't hide set differences
    val single = CorpusOps.bm25TopKAgainstIndex(spark, path, terms, 1000)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val joined = CorpusOps.bm25TopKJoinAgainstIndex(spark, path,
        terms.map(t => (1L, t)).toDF("qid", "term"), "qid", "term", 1000)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(single.keySet === joined.keySet && single.nonEmpty,
      "the two bm25 surfaces ranked different doc sets")
    // scores differ only by the decimal(18,6) rounding of each term's
    // contribution — bounded by (#terms) * 5e-7
    single.foreach { case (doc, s) =>
      assert(math.abs(s - joined(doc)) <= terms.size * 5e-7,
        s"doc $doc: single=$s joined=${joined(doc)}")
    }
  }

  test("hybridTopKJoinAgainstIndex: per-query re-rank off both layouts; " +
    "batching invariant; vector deletes drop candidates") {
    import spark.implicits._
    import graft.operators.CorpusOps
    import graft.operators.VectorOps._
    val bmPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_hyb_qjoin_bm").toString
    val ivfPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_hyb_qjoin_ivf").toString
    docs.writeBm25Index(bmPath, "doc_id", "text")
    val emb = graft.Tables.embeddings(spark, sf())
    emb.writeIvfPq(ivfPath, "embedding", "vec_id", nlist = 8, m = 4,
      ksub = 4, iters = 2)
    val qv = emb.filter(col("vec_id") < 2)
      .select((col("vec_id") + 1L).as("qid"), col("embedding").as("qv"))
    def run(q: Seq[(Long, String)]): Seq[(Long, Long, Double, Double)] =
      CorpusOps.hybridTopKJoinAgainstIndex(spark, bmPath, ivfPath,
          q.toDF("qid", "term"), qv, "qid", "term", "qv", "vec_id",
          "embedding", candidates = 20, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSeq
    val q1 = Seq((1L, "spark"), (1L, "vector"))
    val q2 = Seq((2L, "customer"), (2L, "hash"))
    val together = run(q1 ++ q2)
    assert(together === run(q1) ++ run(q2) && together.nonEmpty)
    assert(together.groupBy(_._1).forall(_._2.size == 5))
    // exact cosine against each query's OWN embedding
    val vecOf = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosScala(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    together.foreach { case (qid, doc, _, cos) =>
      val want = cosScala(vecOf(doc), vecOf(qid - 1))
      assert(cos === want, s"cos mismatch at ($qid, $doc)")
    }
    // purging a ranked doc's VECTOR drops it from the re-rank
    val victim = together.head._2
    VectorOps.deleteFromIvfPq(spark, ivfPath,
      Seq(victim).toDF("vec_id"), "vec_id")
    assert(!run(q1 ++ q2).exists(_._2 == victim),
      "vector-tombstoned doc re-ranked on stale bytes")
  }

  test("piiRedact: per-class counts on the original text, ordered " +
    "redaction, clean rows untouched") {
    import spark.implicits._
    val rows = Seq(
      (1L, "reach me at alice.smith+work@mail.example.org or bob@x.io thanks"),
      (2L, "server 192.168.1.200 and 10.0.0.1 rebooted"),
      (3L, "ssn 987-65-4321 phone 14155552671 mixed"),
      (4L, "no pii here just words"),
      (5L, "edge: v4-ish 999.999.999.999 still redacts; short digits 12345 do not"),
      (6L, "intl call +14155552671 now")
    ).toDF("doc_id", "text")
    val got = rows.piiRedact("doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got(1L) === (("reach me at <EMAIL> or <EMAIL> thanks", 2L, 0L, 0L, 0L, 2L)))
    assert(got(2L) === (("server <IP> and <IP> rebooted", 0L, 2L, 0L, 0L, 2L)))
    assert(got(3L) === (("ssn <SSN> phone <PHONE> mixed", 0L, 0L, 1L, 1L, 2L)))
    assert(got(4L) === (("no pii here just words", 0L, 0L, 0L, 0L, 0L)))
    // the ipv4 pattern is deliberately high-recall (no octet range
    // check — over-redact, never leak); bounded digit runs stay
    assert(got(5L)._1.contains("<IP>") && got(5L)._1.contains("12345"))
    // the leading '+' is CONSUMED (`\+?\b\d…`; with the boundary first
    // the '+' survived redaction as '+<PHONE>')
    assert(got(6L) === (("intl call <PHONE> now", 0L, 0L, 0L, 1L, 1L)))
    // shuffle-free projection: the privacy pass rides the corpus scan
    val plan = rows.piiRedact("doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"piiRedact must not shuffle:\n$plan")
  }

  test("urlNormalize: case/port/www/fragment/tracking/param-order " +
    "variants collapse; distinct pages stay distinct") {
    import spark.implicits._
    val cases = Seq(
      // all six of these are the SAME page
      ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
      ("HTTPS://EXAMPLE.COM/a?a=1&b=2", "https://example.com/a?a=1&b=2"),
      ("https://example.com:443/a?a=1&b=2", "https://example.com/a?a=1&b=2"),
      ("https://www.example.com/a?a=1&b=2", "https://example.com/a?a=1&b=2"),
      ("https://example.com/a?a=1&b=2#sec-3", "https://example.com/a?a=1&b=2"),
      ("https://example.com/a?utm_source=tw&a=1&utm_medium=x&b=2&fbclid=99",
        "https://example.com/a?a=1&b=2"),
      // tracking-only query drops entirely
      ("https://example.com/a?utm_campaign=x", "https://example.com/a"),
      // host-only trailing slash strips; path trailing slash stays
      ("https://example.com/", "https://example.com"),
      ("http://example.com:80/", "http://example.com"),
      ("https://example.com/a/", "https://example.com/a/"),
      // path case is PRESERVED (only scheme+host lower)
      ("https://Example.com/CaseSensitive/Path", "https://example.com/CaseSensitive/Path"),
      // non-default port and mid-host www stay
      ("https://example.com:8443/a", "https://example.com:8443/a"),
      ("https://api.www-host.com/a", "https://api.www-host.com/a"),
      // tracking names are anchored to their ?/& separator: params that
      // merely END in a tracking name, and tracking-lookalikes inside
      // another param's value, are NOT stripped (unanchored matching
      // merged distinct URLs into one canonical key)
      ("https://example.com/a?refbclid=2", "https://example.com/a?refbclid=2"),
      ("https://example.com/a?xgclid=1&a=2", "https://example.com/a?a=2&xgclid=1"),
      // schemeless strings pass through the host steps untouched
      ("just a string", "just a string"))
    val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i, u) }
      .toDF("i", "url")
      .select(col("i"), graft.functions.urlNormalize(col("url")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i) === want, s"urlNormalize('$in')")
    }
    // the dedup keeps the lowest id per canonical key
    val docs = Seq(
      (10L, "https://example.com/a?b=2&a=1"),
      (3L, "HTTPS://WWW.EXAMPLE.COM:443/a?a=1&b=2#f"),
      (7L, "https://example.com/other")
    ).toDF("doc_id", "url")
    val kept = docs.urlCanonicalDedup("doc_id", "url")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L, 7L))
  }

  test("matchAllTermsAgainstIndex equals the raw-text conjunction") {
    import graft.operators.CorpusOps
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_matchall_spec").toString
    docs.writeBm25Index(path, "doc_id", "text")
    val terms = Seq("spark", "hash", "customer")
    val got = CorpusOps.matchAllTermsAgainstIndex(spark, path, terms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val toksOf = graft.functions.tokens(col("text"))
    val want = docs.filter(terms.map(t => array_contains(toksOf, t))
        .reduce(_ && _))
      .select(col("doc_id"), size(toksOf).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got === want)
    assert(got.nonEmpty, "conjunction empty — fixture broke")
    // duplicate terms in the query collapse (distinct semantics)
    val dup = CorpusOps.matchAllTermsAgainstIndex(spark, path,
      terms ++ terms).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(dup === got)
  }

  test("hybrid index: fully at-rest form equals the in-memory composition") {
    import graft.operators.CorpusOps
    import graft.operators.VectorOps._
    val terms = Seq("spark", "vector", "window", "hash", "merge", "customer")
    val bmPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_hyb_bm_spec").toString
    val ivfPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_hyb_ivf_spec").toString
    val embs = Tables.embeddings(spark, sf())
    docs.writeBm25Index(bmPath, "doc_id", "text")
    embs.writeIvfPq(ivfPath, "embedding", "vec_id", nlist = 8, m = 4,
      ksub = 4, iters = 2)
    val q = embs.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val got = CorpusOps.hybridTopKAgainstIndex(spark, bmPath, ivfPath,
      "vec_id", "embedding", terms, q, candidates = 50, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val want = docs.hybridTopK("doc_id", "text", terms, embs, "vec_id",
      "embedding", q, candidates = 50, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.sortBy(_._1).toSeq === want.sortBy(_._1).toSeq)
  }

  test("bm25TopK: a doc containing no query term never ranks") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "spark merge window"),
      (2L, "alpha beta gamma delta"),
      (3L, "spark spark spark spark")).toDF("doc_id", "text")
    val got = fixture.bm25TopK("doc_id", "text", Seq("spark", "merge"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L))
  }

  test("importanceWeights: target-like docs outweigh off-target docs") {
    import spark.implicits._
    // target = docs with is_t; shared filler keeps the vocab overlapping
    val fixture = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta gamma gamma", true),
      (3L, "omega omega psi psi", false),
      (4L, "alpha beta alpha gamma", false), // target-like but unlabeled
      (5L, "", false)).toDF("doc_id", "text", "is_t")
    val got = fixture.importanceWeights("doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // empty doc: zero tokens, weight 0 by contract
    assert(got(5L) === ((0L, 0.0)))
    // target-vocabulary docs score strictly above the off-target doc,
    // INCLUDING the unlabeled doc 4 (importance is about content, not label)
    assert(got(4L)._2 > got(3L)._2)
    assert(got(1L)._2 > got(3L)._2)
    // all weights positive for non-empty docs (smoothing)
    Seq(1L, 2L, 3L, 4L).foreach(id => assert(got(id)._2 > 0.0))
  }

  test("importance split: frozen-fit scoring reproduces the fused verb; OOV skipped") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta gamma gamma", true),
      (3L, "omega omega psi psi", false),
      (4L, "alpha beta alpha gamma", false)).toDF("doc_id", "text", "is_t")
    val ratios = fixture.importanceRatios("text", col("is_t"))
    // self-fit scoring == the fused verb, bit for bit
    val split = fixture.scoreWithRatios(ratios, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val fused = fixture.importanceWeights("doc_id", "text", col("is_t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(split === fused)
    // frozen fit scoring NEW docs: unknown tokens skipped, all-OOV doc -> 0
    val fresh = Seq((10L, "alpha zzz beta"), (11L, "zzz qqq")).toDF("doc_id", "text")
    val got = fresh.scoreWithRatios(ratios, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(10L)._1 == 2L, "zzz must be skipped, alpha+beta counted")
    assert(got(11L) === ((0L, 0.0)))
  }

  test("importanceWeights is partition-independent (decimal-exact sum)") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val words = Array("a", "b", "c", "d", "e", "f", "g")
    val fixture = (0 until 120).map { i =>
      val txt = Seq.fill(12)(words(rng.nextInt(words.length))).mkString(" ")
      (i.toLong, txt, i % 3 == 0)
    }.toDF("doc_id", "text", "is_t")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.importanceWeights("doc_id", "text", col("is_t"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    assert(run(fixture) === run(fixture.repartition(17)))
  }

  test("bpePairStats: hand-computed pair counts, repeats and 1-char words") {
    import spark.implicits._
    // vocabulary: ab x2, abc x1, aaa x1, x x1
    //   ab  -> (a,b) twice (word count 2)
    //   abc -> (a,b), (b,c)
    //   aaa -> (a,a) twice within ONE word (every adjacent occurrence)
    //   x   -> nothing (no adjacent pair)
    val fixture = Seq(
      (1L, "ab abc aaa"),
      (2L, "ab x")).toDF("doc_id", "text")
    val got = fixture.bpePairStats("text", topN = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(("a", "b") -> 3L, ("b", "c") -> 1L, ("a", "a") -> 2L))
  }

  test("bpePairStats: deterministic topN cut, partition-independent") {
    import spark.implicits._
    val fixture = (0 until 200).map(i =>
      (i.toLong, s"w${i % 7}a w${i % 5}b shared shared")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.bpePairStats("text", topN = 5)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val a = run(fixture)
    assert(a.size == 5)
    // counts non-increasing; ties broken lexicographically
    assert(a.map(_._3).sliding(2).forall(p => p.head >= p.last))
    assert(a === run(fixture.repartition(13)))
  }

  test("passageDedup: hand fixture — global first occurrence survives") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "a b c d e f"),   // passages "a b c", "d e f" — both first
      (2L, "a b c x y z"),   // "a b c" dup of doc1#0 -> dropped
      (3L, "d e f")          // dup of doc1#1 -> doc fully dropped
    ).toDF("doc_id", "text")
    val got = fixture.passageDedup("doc_id", "text", width = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === (("a b c d e f", 2L, 2L)))
    assert(got(2L) === (("x y z", 1L, 2L)))
    assert(got(3L) === (("", 0L, 1L)))
  }

  test("passageDedup: corpus invariants + partition independence") {
    val base = docs.filter(col("doc_id") < 60)
    val out = base.passageDedup("doc_id", "text", width = 10)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === base.count())
    rows.foreach { case (_, txt, kept, total) =>
      assert(kept <= total)
      val n = if (txt.isEmpty) 0 else txt.split("\\s+").length
      // every kept passage has <= width words; count matches the text
      assert(n <= kept * 10 && (kept == 0) == txt.isEmpty)
    }
    // total kept across the corpus == number of DISTINCT passages
    val distinctPassages = base.passageDedup("doc_id", "text", width = 10)
      .agg(sum(col("kept_passages"))).head().getLong(0)
    val rerun = base.repartition(13).passageDedup("doc_id", "text", width = 10)
      .agg(sum(col("kept_passages"))).head().getLong(0)
    assert(distinctPassages === rerun)
  }

  test("bigramScore: hand-computed pooled ratio") {
    import spark.implicits._
    // corpus = one doc "a b a b": bigrams (a,b),(b,a),(a,b)
    // c12: (a,b)=2, (b,a)=1; c1: a=2, b=2
    // s12 = 2+1+2 = 5; s1 = 2+2+2 = 6; score = 5/6
    val fixture = Seq((1L, "a b a b"), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
    val got = fixture.bigramScore("doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) === ((3L, 5.0 / 6.0)))
    assert(got(2L) === ((0L, 0.0))) // single token: no bigrams
    assert(got(3L) === ((0L, 0.0)))
  }

  test("bigramScore: scrambled word order scores below typical order") {
    import spark.implicits._
    // five docs share the dominant order u->v; doc 6 has the same
    // unigram mix but atypical adjacencies
    val fixture = (1L to 5L).map(i => (i, "u v u v u v")) :+
      ((6L, "u u u v v v"))
    val got = fixture.toDF("doc_id", "text").bigramScore("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(6L) < got(1L),
      s"scrambled ${got(6L)} should score below typical ${got(1L)}")
    assert(got.values.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("bpeEncode: ordered merges, chained and adjacent occurrences") {
    import spark.implicits._
    val fixture = Seq((1L, "hello aaaa aaa")).toDF("doc_id", "text")
    val got = fixture.select(
      fixture.bpeEncode("text", Seq("l" -> "l", "ll" -> "o", "a" -> "a"))
        .as("bpe")).head().getSeq[String](0)
    // hello: (l,l) -> h e ll o; (ll,o) -> h e llo
    // aaaa:  (a,a) left-to-right non-overlap -> aa aa
    // aaa:   -> aa a
    assert(got === Seq("h", "e", "llo", "aa", "aa", "aa", "a"))
  }

  test("bpeEncode: lossless — tokens concatenate back to the words") {
    val merges = Seq("s" -> "p", "sp" -> "a", "spa" -> "r", "spar" -> "k",
      "t" -> "h", "th" -> "e", "d" -> "a", "da" -> "t", "dat" -> "a")
    val base = docs.filter(col("doc_id") < 40)
    val bad = base.select(
      concat_ws("", base.bpeEncode("text", merges)).as("re"),
      regexp_replace(trim(col("text")), "\\s+", "").as("orig"))
      .filter(col("re") =!= col("orig")).count()
    assert(bad === 0L)
    // and the merge list actually fires: fewer BPE tokens than chars
    val Seq(nBpe, nCh) = base.select(
      sum(size(base.bpeEncode("text", merges))).cast("long"),
      sum(length(regexp_replace(col("text"), "\\s+", ""))).cast("long"))
      .head().toSeq.map(_.asInstanceOf[Long])
    assert(nBpe < nCh)
  }

  test("vocabEncode: hand fixture — frequency ranks, ties, OOV") {
    import spark.implicits._
    // counts: b=3, a=1, c=1, x=1; top-2 = b(id 1), a(id 2) — count
    // tie at 1 breaks lexicographically; c and x fall out -> OOV id 0
    val fixture = Seq((1L, "b a b c"), (2L, "b x"), (3L, ""))
      .toDF("doc_id", "text")
    val got = fixture.vocabEncode("doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((Seq(1, 2, 1, 0), 4L, 1L)))
    assert(got(2L) === ((Seq(1, 0), 2L, 1L)))
    assert(got(3L) === ((Seq.empty[Int], 0L, 0L)))
  }

  test("vocabEncode: partition-independent, ids dense in 0..vocabSize") {
    val base = docs.filter(col("doc_id") < 80)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.vocabEncode("doc_id", "text", vocabSize = 30)
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1).toSeq
    val a = run(base)
    assert(a === run(base.repartition(13)))
    val allIds = a.flatMap(_._2)
    assert(allIds.forall(id => id >= 0 && id <= 30))
    // the full vocab range is used (corpus has > 30 distinct tokens)
    assert(allIds.toSet.size === 31)
  }

  test("invertedIndex: hand fixture — exact stats, capped ordered postings") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "a b a"),   // a:2, b:1
      (2L, "b b"),     // b:2
      (3L, "a c"),     // a:1, c:1
      (4L, "a")        // a:1
    ).toDF("doc_id", "text")
    val got = fixture.invertedIndex("doc_id", "text", maxPostings = 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // df/tf_total are over ALL docs even where the posting list is cut
    assert(got("a") === ((3L, 4L, "1:2 3:1")))
    assert(got("b") === ((2L, 3L, "1:1 2:2")))
    assert(got("c") === ((1L, 1L, "3:1")))
  }

  test("invertedIndex: partition-independent; WindowGroupLimit pre-prune") {
    val base = docs.filter(col("doc_id") < 100)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.invertedIndex("doc_id", "text", maxPostings = 5)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getString(3))).sortBy(_._1).toSeq
    val a = run(base)
    assert(a === run(base.repartition(13)) && a.nonEmpty)
    val plan = base.invertedIndex("doc_id", "text", maxPostings = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"posting cap must pre-prune map-side:\n$plan")
    // every posting string respects the cap
    assert(a.forall(_._4.split(" ").length <= 5))
  }

  test("tfidfVectors: hand fixture — exact tf/df and pinned-shape weights") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "a b a"), (2L, "b c"), (3L, "a"), (4L, "")).toDF("doc_id", "text")
    val got = fixture.tfidfVectors("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // N = 4 (the empty doc counts); df: a=2, b=2, c=1
    def w(tf: Long, df: Long): Double =
      (4.0 - df.toDouble + 0.5) / (df.toDouble + 0.5) * tf.toDouble
    assert(got((1L, "a")) === ((2L, w(2, 2))))
    assert(got((1L, "b")) === ((1L, w(1, 2))))
    assert(got((2L, "b")) === ((1L, w(1, 2))))
    assert(got((2L, "c")) === ((1L, w(1, 1))))
    assert(got((3L, "a")) === ((1L, w(1, 2))))
    assert(got.size === 5) // the empty doc emits no rows
  }

  test("tfidfVectors: partition-independent, rarer terms outweigh common") {
    val base = docs.filter(col("doc_id") < 120)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.tfidfVectors("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    val a = run(base)
    assert(a === run(base.repartition(13)) && a.nonEmpty)
    // at equal tf, a strictly rarer term weighs strictly more
    val byTerm = a.groupBy(_._2).view.mapValues(_.head).toMap
    val pairs = for {
      (t1, r1) <- byTerm.toSeq; (t2, r2) <- byTerm.toSeq
      if r1._3 == r2._3 && r1._4 != r2._4
    } yield (r1, r2)
    pairs.headOption.foreach { case (r1, r2) =>
      val df1 = a.count(_._2 == r1._2); val df2 = a.count(_._2 == r2._2)
      if (df1 < df2) assert(r1._4 > r2._4) else if (df2 < df1) assert(r2._4 > r1._4)
    }
  }

  test("snapshotDiff: NULL text is present, not absent") {
    import spark.implicits._
    val old = Seq((1L, null.asInstanceOf[String]), (2L, "x"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val nu = Seq((1L, "y"), (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = nu.snapshotDiff(old, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "changed", 2L -> "changed",
      3L -> "added", 4L -> "unchanged"))
  }

  test("snapshotDiff: every status on a hand fixture; partition-independent") {
    import spark.implicits._
    val old = Seq((1L, "same"), (2L, "was this"), (3L, "gone")).toDF("doc_id", "text")
    val nu = Seq((1L, "same"), (2L, "now this"), (4L, "fresh")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.snapshotDiff(old, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
    val got = run(nu)
    assert(got === Seq(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    assert(got === run(nu.repartition(7)))
  }

  test("writeSharded: exact round trip, driver-replayable shards, pruned reads") {
    val out = java.nio.file.Files.createTempDirectory("graft_shard_spec")
    out.toFile.deleteOnExit()
    val src = docs.filter(col("doc_id") < 200).select(col("doc_id"), col("text"))
    val manifest = src.writeSharded(out.toString, "doc_id", shards = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def hash32(id: Long): Long = {
      val id32 = id & 0xffffffffL
      ((id32 >>> 16) * 2654435761L % 4294967296L * 65536L +
        (id32 & 0xffffL) * 2654435761L) % 4294967296L
    }
    val srcIds = src.select("doc_id").collect().map(_.getLong(0))
    val wantManifest = srcIds.groupBy(id => (hash32(id) % 4).toInt)
      .view.mapValues(_.length.toLong).toMap
    assert(manifest === wantManifest)
    // every row lands exactly once, in its computed shard
    val back = spark.read.parquet(out.toString)
      .select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(back.length === srcIds.length)
    back.foreach { case (id, s) => assert(s === (hash32(id) % 4).toInt) }
    // a one-shard read prunes the other directories at plan time
    val plan = spark.read.parquet(out.toString)
      .filter(col("shard") === 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(shard"),
      s"shard read must prune via partition filters:\n$plan")
  }

  test("collocations: exact lift on a hand fixture; bound pair ranks first") {
    import spark.implicits._
    // "new york" always together (3x); "of the" frequent but independent-ish
    val fixture = Seq(
      (1L, "new york of the"),
      (2L, "new york of a"),
      (3L, "new york the of")
    ).toDF("doc_id", "text")
    val got = fixture.collocations("text", minCount = 2, topN = 5)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // N = 12 tokens; c(new)=3, c(york)=3, c12(new,york)=3 -> lift 12*3/9
    assert(got(("new", "york")) === ((3L, 3.0 * 12.0 / (3.0 * 3.0))))
    // "york of": c12=3, c(york)=3, c(of)=3 -> same lift; "of the" weaker
    val topPair = fixture.collocations("text", minCount = 2, topN = 1)
      .collect()(0)
    assert(topPair.getDouble(3) === 4.0)
  }

  test("collocations: partition-independent; TakeOrdered cut") {
    val base = docs.filter(col("doc_id") < 200)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.collocations("text", minCount = 3, topN = 20)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    val a = run(base)
    assert(a === run(base.repartition(13)) && a.nonEmpty)
    val plan = base.collocations("text", minCount = 3, topN = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-N must cut via per-partition heaps:\n$plan")
  }

  test("learnBpeMerges: greedy ranks on a hand corpus, then round-trip") {
    import spark.implicits._
    // the x3, cat x1; round 1 ties (t,h)/(h,e) at 3 -> lexicographic
    // (h,e); round 2 (t,he) at 3; round 3 ties (a,t)/(c,a) -> (a,t)
    val fixture = Seq((1L, "the the cat"), (2L, "the")).toDF("doc_id", "text")
    val merges = fixture.learnBpeMerges("text", rounds = 3)
    assert(merges === Seq("h" -> "e", "t" -> "he", "a" -> "t"))
    val enc = fixture.select(fixture.bpeEncode("text", merges).as("b"))
      .collect().map(_.getSeq[String](0))
    assert(enc(0) === Seq("the", "the", "c", "at"))
    assert(enc(1) === Seq("the"))
  }
}
