package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.spatial.ZValue

/** Codegen-path checks: every native expression evaluated through a
  * DataFrame (whole-stage codegen) must equal its kernel called directly
  * (interpreted path). */
class ExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private val vecs: Seq[(Long, Array[Float], Array[Float])] = Seq(
    (1L, Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
    (2L, Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
    (3L, Array(0.5f, -1f, 2f), Array(-0.5f, 1f, -2f)),
    (4L, Array(0f, 0f, 0f), Array(1f, 1f, 1f)))

  test("cosine/dot/l2 through codegen match direct kernel math") {
    val df = vecs.toDF("id", "a", "b")
      .select($"id", cosineSimilarity($"a", $"b").as("cos"),
        dotProduct($"a", $"b").as("dot"), l2Distance($"a", $"b").as("l2"))
    val rows = df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    assert(rows(0)._2 === 0.0 && rows(0)._3 === 0.0)
    assert(math.abs(rows(1)._2 - 1.0) < 1e-15 && rows(1)._3 === 14.0 && rows(1)._4 === 0.0)
    assert(math.abs(rows(2)._2 + 1.0) < 1e-15)
    assert(rows(3)._2 === 0.0) // zero norm -> 0 by convention
  }

  test("vector kernels reject dimension mismatches loudly") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val a = new GenericArrayData(Array(1.0f, 2.0f))
    val b = new GenericArrayData(Array(1.0f, 2.0f, 3.0f))
    val e = intercept[IllegalArgumentException](VectorKernels.l2F(a, b))
    assert(e.getMessage.contains("dimension mismatch"))
    intercept[IllegalArgumentException](VectorKernels.cosineF(a, b))
    intercept[IllegalArgumentException](VectorKernels.dotF(a, b))
  }

  test("empty/blank text yields zero tokens and a low quality score") {
    import spark.implicits._
    val rows = Seq("", "   ", "real text here").toDF("text")
      .select(graft.functions.tokenCount(col("text")).as("n"),
        graft.functions.qualityScore(col("text")).as("q"))
      .collect()
    assert(rows(0).getLong(0) === 0L && rows(1).getLong(0) === 0L)
    assert(rows(2).getLong(0) === 3L)
  }

  test("null inputs propagate as null") {
    val df = Seq((1L, Some(Array(1f, 2f)), None: Option[Array[Float]]))
      .toDF("id", "a", "b")
      .select(cosineSimilarity($"a", $"b").as("cos"))
    assert(df.collect().head.isNullAt(0))
  }

  test("zorder expression equals ZValue.interleave") {
    val df = Seq((3, 5), (0, 0), (1023, 511)).toDF("x", "y")
      .select(zorderCells(Seq($"x", $"y"), bits = 10).as("z"))
    val got = df.collect().map(_.getLong(0)).toSeq
    val want = Seq((3, 5), (0, 0), (1023, 511))
      .map { case (x, y) => ZValue.interleave(Array(x, y), 10) }
    assert(got === want)
  }

  test("text expressions through codegen match kernels") {
    val texts = Seq("alpha beta gamma delta", "the quick brown fox", "")
    val df = texts.toDF("t").select(
      simhash64($"t").as("sh"),
      fingerprint64($"t").as("fp"),
      langId($"t").as("lang"),
      minhashSignature($"t", 3, 16, 7L).as("sig"))
    val rows = df.collect()
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(rows(i).getLong(0) === TextKernels.simHash64(t))
      assert(rows(i).getLong(1) === TextKernels.fingerprint64(t))
      assert(rows(i).getString(2) === TextKernels.langId(t))
      assert(rows(i).getSeq[Long](3).toSeq === TextKernels.minHashSig(t, 3, 16, 7L).toSeq)
    }
  }

  test("cdcChunks through codegen matches the kernel and reassembles") {
    val rnd = new scala.util.Random(3)
    val texts = Seq(
      (0 until 4000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString,
      "tiny", "")
    val rows = texts.toDF("t")
      .select($"t", cdcChunks($"t").as("ch"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val got = r.getSeq[String](1).toSeq
      assert(got === TextKernels.cdcChunks(t, 16, 0xFFL, 64, 1024).toSeq)
      assert(got.mkString === t)
    }
  }

  test("hyperplane sketch: deterministic, similar vectors share more bits") {
    val a = Array.fill(32)(1.0f)
    val b = a.clone(); b(0) = 0.9f // nearly identical
    val c = Array.fill(32)(-1.0f)  // opposite
    val df = Seq(("a", a), ("b", b), ("c", c)).toDF("k", "v")
      .select($"k", hyperplaneSketch($"v", 64, 42L).as("sk"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(m("a") ^ m("b")) <
           java.lang.Long.bitCount(m("a") ^ m("c")))
    assert(m("a") === VectorKernels.hyperplaneSketch(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(a), 64, 42L))
  }

  test("quality score components stay in [0,1]") {
    val df = Seq("the the the the", "alpha beta gamma delta epsilon").toDF("t")
      .select(qualityScore($"t").as("q"), stopwordRatio($"t").as("s"),
        distinctTokenRatio($"t").as("d"))
    df.collect().foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("signProject: codegen matches an independent sign-matrix replay") {
    // independent replay of the ±1 matrix: fmix32 of i*outDim + j + seed
    // via the SQL-shaped arithmetic (two-halves folds + // xorshifts),
    // lower half of 2^32 -> +1
    def sign(i: Int, j: Int, outDim: Int, seed: Long): Double = {
      def mul(k: Long, c: Long): Long =
        (k / 65536 * c % 4294967296L * 65536L + k % 65536 * c) % 4294967296L
      def xs(k: Long, s: Int): Long = k ^ (k / (1L << s))
      val k0 = (i.toLong * outDim + j + seed) & 0xffffffffL
      val h = xs(mul(xs(mul(xs(k0, 16), 0x85ebca6bL), 13), 0xc2b2ae35L), 16)
      if (h < 2147483648L) 1.0 else -1.0
    }
    val outDim = 5
    val got = vecs.map(v => (v._1, v._2)).toDF("id", "a")
      .select($"id", graft.functions.signProject($"a", outDim, seed = 7L).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    vecs.foreach { case (id, a, _) =>
      val want = (0 until outDim).map { j =>
        a.indices.foldLeft(0.0)((acc, i) =>
          acc + a(i).toDouble * sign(i, j, outDim, 7L))
      }
      assert(got(id) === want, s"vector $id")
    }
    // a projection is a shuffle-free scan-side expression
    val plan = vecs.map(v => (v._1, v._2)).toDF("id", "a")
      .select(graft.functions.signProject($"a", 8))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }

  test("signProject: JL contract — norms roughly preserved at outDim 32") {
    // E[|Px|^2] = outDim * |x|^2 for ±1 projections; on a fixed vector
    // the concentration at outDim=32 keeps the ratio well inside [0.3, 3]
    val v = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val inNorm2 = v.map(x => x.toDouble * x).sum
    val p = Seq((1L, v)).toDF("id", "a")
      .select(graft.functions.signProject($"a", 32).as("p"))
      .collect()(0).getSeq[Double](0)
    val ratio = p.map(x => x * x).sum / (32.0 * inNorm2)
    assert(ratio > 0.3 && ratio < 3.0, s"norm ratio $ratio")
  }

  test("normalizeText collapses case/punct/spacing variants; idempotent") {
    val cases = Seq(
      ("  Hello,   World!! ", "hello world"),
      ("HELLO world", "hello world"),
      ("a-b_c.d", "a b c d"),
      ("already clean", "already clean"),
      ("\t tabs\nand\r\nnewlines ", "tabs and newlines"),
      ("!!!", ""))
    val got = cases.map(_._1).toDF("t")
      .select(graft.functions.normalizeText($"t")).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, w) => assert(g === w) }
    // idempotent: normalizing a normalized string is the identity
    val again = got.toSeq.toDF("t")
      .select(graft.functions.normalizeText($"t")).as[String].collect()
    assert(again.toSeq === got.toSeq)
  }

  test("redactPii replaces emails, URLs, and phone numbers with typed tokens") {
    val cases = Seq(
      ("write to a.user+x@sub.example.org today",
       "write to <EMAIL> today"),
      ("docs at https://ex.org/p?q=1#frag and http://plain.io/x",
       "docs at <URL> and <URL>"),
      ("call 555-867-5309 or 555.123.4567 now",
       "call <PHONE> or <PHONE> now"),
      // an email inside a URL path: the email token is substituted
      // first, then the URL pass collapses the whole non-whitespace run
      ("see https://ex.org/u/a@b.co/profile", "see <URL>"),
      ("no pii here at all", "no pii here at all"))
    val got = cases.map(_._1).toDF("t")
      .select(graft.functions.redactPii($"t")).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, w) => assert(g === w) }
  }

  test("nearest_cells: codegen equals kernel; ties break to the lowest cell") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val cs = Array(Array(0.0, 0.0), Array(10.0, 0.0), Array(0.0, 10.0),
      Array(10.0, 0.0)) // cell 4 duplicates cell 2: a forced tie
    val rows = Seq((1L, Array(9L, 1L)), (2L, Array(0L, 9L)), (3L, Array(5L, 5L)))
      .toDF("id", "qv")
    val got = rows.select($"id",
        graft.functions.nearestCells($"qv", cs, 2).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    // row 1 is nearest cell 2 (the 10,0 centroid), tie with cell 4
    // breaks LOW; row 2 nearest cell 3
    assert(got(1L) === Seq(2, 4))
    assert(got(2L) === Seq(3, 1))
    // codegen path equals the kernel called directly
    val direct = graft.functions.VectorKernels.nearestCellsQ(
      new GenericArrayData(Array(5L, 5L)), cs, 2)
    assert(got(3L) === direct.toIntArray().toSeq)
    // content equality (the BloomMightContainLong lesson): cloned
    // centroid matrices canonicalize equal
    import org.apache.spark.sql.catalyst.expressions.Literal
    val a = NearestCells(Literal(1L), cs, 2)
    val b = NearestCells(Literal(1L), cs.map(_.clone()), 2)
    assert(a === b && a.hashCode === b.hashCode)
  }

  test("bloom probe expressions compare by filter CONTENT, not array reference") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    bf.putLong(42L)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    // two semantically identical probes (cloned bytes) must canonicalize
    // equal or Catalyst subexpression reuse can never merge them
    val a = BloomMightContainLong(Literal(42L), bytes)
    val b = BloomMightContainLong(Literal(42L), bytes.clone())
    assert(a === b)
    assert(a.hashCode === b.hashCode)
    assert(a.semanticEquals(b))
    val different = bytes.clone()
    different(different.length - 1) = (different(different.length - 1) ^ 1).toByte
    assert(a !== BloomMightContainLong(Literal(42L), different))
  }

  test("hier pivot kernels: admitted set equals flat kernel; argmin routes via coarse") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(7)
    val d = 3
    val p = 40
    val pivots = Array.fill(p)(Array.fill(d)(rnd.nextDouble() * 100))
    // arbitrary grouping (sorted by x into uneven spans): the kernels
    // require only the offsets layout, not any particular clustering
    val order = pivots.sortBy(_(0))
    val sizes = Array(5, 9, 2, 11, 6, 7)
    val offsets = sizes.scanLeft(0)(_ + _)
    val g = sizes.length
    val coarse = Array.tabulate(g) { gi =>
      val span = order.slice(offsets(gi), offsets(gi + 1))
      Array.tabulate(d)(i => span.map(_(i)).sum / span.length)
    }
    val flatP = order.flatten
    val flatC = coarse.flatten
    val bands = Array.fill(p)(rnd.nextDouble() * 40)
    bands(3) = Double.NegativeInfinity // a left-less cell
    def dist(a: Array[Double], off: Int, flat: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < d) { val x = a(i) - flat(off + i); acc += x * x; i += 1 }
      math.sqrt(acc)
    }
    // the group-band formula of SpatialOps.hierGroupBands
    val groupBands = Array.tabulate(g) { gi =>
      (offsets(gi) until offsets(gi + 1)).foldLeft(Double.NegativeInfinity) {
        (acc, i) =>
          if (bands(i) == Double.NegativeInfinity) acc
          else math.max(acc, dist(coarse(gi), i * d, flatP) + bands(i))
      }
    }
    for (_ <- 1 to 300) {
      val pt = Array.fill(d)(rnd.nextDouble() * 140 - 20)
      val v = new GenericArrayData(pt)
      val flat = VectorKernels.pivotAdmitted(v, flatP, bands, d, isFloat = false)
      val hier = VectorKernels.hierPivotAdmitted(v, flatC, flatP, offsets,
        groupBands, bands, d, isFloat = false)
      assert(hier.toIntArray().toSeq === flat.toIntArray().toSeq,
        s"admitted sets diverge at ${pt.toSeq}")
      // argmin: the emitted cell must live in the nearest coarse group
      // and its distance must be the true distance to that fine pivot
      // (and the group-local minimum)
      val asg = VectorKernels.hierPivotArgmin(v, flatC, flatP, offsets, d,
        isFloat = false)
      val cell = asg.getInt(0); val dd = asg.getDouble(1)
      val bestG = (0 until g).minBy(gi => dist(pt, gi * d, flatC))
      assert(cell >= offsets(bestG) + 1 && cell <= offsets(bestG + 1),
        s"cell $cell outside nearest coarse group $bestG")
      assert(math.abs(dd - dist(pt, (cell - 1) * d, flatP)) < 1e-12)
      val groupMin = (offsets(bestG) until offsets(bestG + 1))
        .map(i => dist(pt, i * d, flatP)).min
      assert(math.abs(dd - groupMin) < 1e-12)
    }
  }
}
