package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, IntegerType}

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {

  private lazy val media = syntheticMediaTable(spark, sf())

  test("media table: binary payload column + typed metadata") {
    val schema = media.schema
    assert(schema("bytes").dataType === BinaryType)
    assert(schema("width").dataType === IntegerType)
    assert(media.count() > 0)
    assert(media.select("kind").distinct().count() === 3)
  }

  test("synthetic image rows are REAL PNGs the true decode path handles") {
    import spark.implicits._
    val imgs = media.as[MediaRow].filter(_.kind == "image").take(5)
    assert(imgs.nonEmpty)
    imgs.foreach { m =>
      // PNG magic + a successful real decode, distinct per id
      assert((m.bytes(0) & 0xFF) == 0x89 && m.bytes(1) == 'P'.toByte,
        s"media ${m.media_id} is not a PNG payload")
      assert(decodeImage(m.bytes, 16).isDefined)
    }
    val f0 = decodeImage(imgs(0).bytes, 16).get.toSeq
    val f1 = decodeImage(imgs(1).bytes, 16).get.toSeq
    assert(f0 !== f1, "distinct media must decode to distinct features")
  }

  test("decodeStub: deterministic, unit-norm, payload-sensitive") {
    val a = decodeStub("hello".getBytes, 32)
    val b = decodeStub("hello".getBytes, 32)
    val c = decodeStub("world".getBytes, 32)
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq !== c.toSeq)
    val norm = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  /** A real in-memory PNG: left half dark, right half bright — enough
    * structure that grid-mean pooling must see it. */
  private def pngBytes(w: Int, h: Int, leftGray: Int, rightGray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = if (x < w / 2) leftGray else rightGray
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decodeImage: REAL PNG decode — deterministic, content-driven, not the stub") {
    val bytes = pngBytes(64, 48, leftGray = 20, rightGray = 220)
    val a = decodeImage(bytes, 32).get
    val b = decodeImage(bytes, 32).get
    assert(a.toSeq === b.toSeq, "decode must be deterministic")
    // decoded features reflect PIXELS, not byte hashes
    assert(a.toSeq !== decodeStub(bytes, 32).toSeq,
      "real decode must differ from the hash stub on the same bytes")
    val norm = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // the left-dark / right-bright structure survives pooling: some
    // cells differ, and a flipped image decodes to a different vector
    val flipped = decodeImage(pngBytes(64, 48, 220, 20), 32).get
    assert(a.toSeq !== flipped.toSeq,
      "pooled features must track pixel CONTENT, not payload size")
    // a JPEG of the same image also decodes (format sniffing)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val jout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jout)
    assert(decodeImage(jout.toByteArray, 32).isDefined)
  }

  test("decodeFeatures: image/audio take the real paths, the rest the stub") {
    val png = pngBytes(32, 32, 0, 255)
    assert(decodeFeatures("image", png, 16).toSeq ===
      decodeImage(png, 16).get.toSeq)
    // PNG bytes under the audio kind are NOT decodable audio — fallback
    assert(decodeAudio(png, 16).isEmpty)
    assert(decodeFeatures("audio", png, 16).toSeq ===
      decodeStub(png, 16).toSeq)
    // a real WAV under the audio kind takes the real decode
    val wav = syntheticWav(7L, nSamples = 800)
    assert(decodeFeatures("audio", wav, 16).toSeq ===
      decodeAudio(wav, 16).get.toSeq)
    // video stays on the stub at the feature level (frame extraction is
    // its own surface, sampleGifFrames)
    assert(decodeFeatures("video", wav, 16).toSeq ===
      decodeStub(wav, 16).toSeq)
    // non-decodable image payloads fall back to the stub
    val text = "not an image at all".getBytes("UTF-8")
    assert(decodeImage(text, 16).isEmpty)
    assert(decodeFeatures("image", text, 16).toSeq ===
      decodeStub(text, 16).toSeq)
  }

  test("decodeAudio: REAL WAV decode — deterministic, content-driven, not the stub") {
    val wav = syntheticWav(42L, nSamples = 1600)
    // RIFF container magic: the payload is a genuine WAV
    assert(wav(0) == 'R'.toByte && wav(1) == 'I'.toByte &&
      wav(2) == 'F'.toByte && wav(3) == 'F'.toByte)
    val a = decodeAudio(wav, 16).get
    val b = decodeAudio(wav, 16).get
    assert(a.toSeq === b.toSeq, "decode must be deterministic")
    assert(a.toSeq !== decodeStub(wav, 16).toSeq,
      "real decode must differ from the hash stub on the same bytes")
    val norm = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // different ids mix different tones -> different envelopes
    val other = decodeAudio(syntheticWav(43L, nSamples = 1600), 16).get
    assert(a.toSeq !== other.toSeq)
    // a LOUD vs QUIET window structure must be visible: a WAV whose
    // second half is silence pools to near-zero trailing windows
    val halfSilent = {
      val full = syntheticWav(42L, nSamples = 1600)
      // zero the last 800 samples in the data chunk (tail of the file)
      val c = full.clone()
      var i = c.length - 1600; while (i < c.length) { c(i) = 0; i += 1 }
      c
    }
    val hs = decodeAudio(halfSilent, 16).get
    assert(hs.takeRight(4).forall(v => math.abs(v) < 0.05),
      s"silent tail must pool near zero: ${hs.toSeq}")
  }

  test("decodeGifFrames: REAL animated-GIF frames — counts, stride, determinism") {
    val gif = syntheticGif(10L, side = 16) // 2 + 10%4 = 4 frames
    assert(gif(0) == 'G'.toByte && gif(1) == 'I'.toByte && gif(2) == 'F'.toByte)
    val all = decodeGifFrames(gif, stride = 1, dim = 16).get
    assert(all.map(_._1) === Seq(0, 1, 2, 3))
    val strided = decodeGifFrames(gif, stride = 2, dim = 16).get
    assert(strided.map(_._1) === Seq(0, 2))
    // strided frames ARE the corresponding full-decode frames
    assert(strided.map(_._2.toSeq) ===
      Seq(all(0)._2.toSeq, all(2)._2.toSeq))
    // frames animate: consecutive frames differ
    assert(all(0)._2.toSeq !== all(1)._2.toSeq)
    // deterministic across decodes
    assert(decodeGifFrames(gif, stride = 2, dim = 16).get.map(_._2.toSeq) ===
      strided.map(_._2.toSeq))
    // non-GIF bytes are refused, not crashed on
    assert(decodeGifFrames(pngBytes(16, 16, 0, 255), 1, 16).isEmpty)
  }

  test("sampleGifFrames runs the real frame decode distributed") {
    import spark.implicits._
    val media = syntheticGifTable(spark, sf())
    assert(media.count() > 0)
    val frames = sampleGifFrames(media.as[MediaRow], stride = 2, dim = 16)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    // per id: frame count = ceil((2 + id % 4) / 2), indices 0,2,..
    val byId = rows.groupBy(_.getLong(0))
    byId.foreach { case (id, rs) =>
      val n = 2 + (id % 4).toInt
      val wantIdx = (0 until n by 2).toSeq
      assert(rs.map(_.getInt(1)).sorted.toSeq === wantIdx, s"media $id")
    }
    // features equal a driver-side decode of the same payload
    val one = media.as[MediaRow].filter((m: MediaRow) => m.media_id == rows.head.getLong(0))
      .head()
    val driverFeats = decodeGifFrames(one.bytes, 2, 16).get.toMap
    rows.filter(_.getLong(0) == one.media_id).foreach { r =>
      assert(r.getSeq[Float](2).toSeq ===
        driverFeats(r.getInt(1)).toSeq)
    }
  }

  test("decodeAviFrames: REAL MJPEG-in-AVI frames — RIFF walk, stride, determinism") {
    val avi = syntheticAvi(10L, side = 16) // 2 + 10%4 = 4 frames
    assert(new String(avi, 0, 4, "US-ASCII") === "RIFF" &&
      new String(avi, 8, 4, "US-ASCII") === "AVI ")
    val all = decodeAviFrames(avi, stride = 1, dim = 16).get
    assert(all.map(_._1) === Seq(0, 1, 2, 3))
    val strided = decodeAviFrames(avi, stride = 2, dim = 16).get
    assert(strided.map(_._1) === Seq(0, 2))
    // strided frames ARE the corresponding full-decode frames
    assert(strided.map(_._2.toSeq) ===
      Seq(all(0)._2.toSeq, all(2)._2.toSeq))
    // frames animate: consecutive frames differ
    assert(all(0)._2.toSeq !== all(1)._2.toSeq)
    // deterministic across decodes
    assert(decodeAviFrames(avi, stride = 2, dim = 16).get.map(_._2.toSeq) ===
      strided.map(_._2.toSeq))
    // non-AVI bytes are refused, not crashed on; so is a torn container
    assert(decodeAviFrames(pngBytes(16, 16, 0, 255), 1, 16).isEmpty)
    assert(decodeAviFrames(avi.take(avi.length / 2), 1, 16).isEmpty ||
      decodeAviFrames(avi.take(avi.length / 2), 1, 16).get.nonEmpty,
      "torn container must refuse or return only whole frames")
  }

  test("decodeAviFrames: uncompressed DIB-in-AVI — pure byte arithmetic, " +
    "content bit-equal to a direct pool of the source") {
    val avi = syntheticDibAvi(10L, side = 16) // 2 + 10%4 = 4 frames
    assert(new String(avi, 0, 4, "US-ASCII") === "RIFF")
    val all = decodeAviFrames(avi, stride = 1, dim = 16).get
    assert(all.map(_._1) === Seq(0, 1, 2, 3))
    // the codec is LOSSLESS: every decoded frame pools bit-for-bit to
    // the direct pool of the synthetic source image — the content
    // oracle the lossy MJPEG twin cannot offer
    all.foreach { case (idx, feats) =>
      assert(feats.toSeq === directPooledFrame(10L, 16, idx, 16).toSeq,
        s"frame $idx drifted from the direct pool")
    }
    // ...and differs from the MJPEG decode only by JPEG loss: frames
    // still animate and stride still subsamples
    val strided = decodeAviFrames(avi, stride = 2, dim = 16).get
    assert(strided.map(_._1) === Seq(0, 2))
    assert(all(0)._2.toSeq !== all(1)._2.toSeq)
    // a truncated container refuses or returns only whole frames
    val cut = decodeAviFrames(avi.take(avi.length / 2), 1, 16)
    assert(cut.isEmpty || cut.get.nonEmpty)
    // the distributed path + the verdict table: every row matches
    val verdict = dibFramesVerdict(spark, sf()).collect()
    assert(verdict.nonEmpty)
    assert(verdict.forall(r => r.getBoolean(2) && r.getBoolean(3)),
      "a distributed DIB decode drifted from the direct pool")
  }

  test("sampleAviFrames runs the real MJPEG decode distributed") {
    import spark.implicits._
    val media = syntheticAviTable(spark, sf())
    assert(media.count() > 0)
    val frames = sampleAviFrames(media.as[MediaRow], stride = 2, dim = 16)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    val byId = rows.groupBy(_.getLong(0))
    byId.foreach { case (id, rs) =>
      val n = 2 + (id % 4).toInt
      val wantIdx = (0 until n by 2).toSeq
      assert(rs.map(_.getInt(1)).sorted.toSeq === wantIdx, s"media $id")
    }
    // features equal a driver-side decode of the same payload
    val one = media.as[MediaRow]
      .filter((m: MediaRow) => m.media_id == rows.head.getLong(0)).head()
    val driverFeats = decodeAviFrames(one.bytes, 2, 16).get.toMap
    rows.filter(_.getLong(0) == one.media_id).foreach { r =>
      assert(r.getSeq[Float](2).toSeq === driverFeats(r.getInt(1)).toSeq)
    }
  }

  test("extractFeatures runs the real decode distributed over PNG rows") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "image", pngBytes(40, 40, 10, 240), 40, 40),
      MediaRow(2L, "image", pngBytes(40, 40, 240, 10), 40, 40),
      MediaRow(3L, "audio", "waveform-bytes".getBytes("UTF-8"), 0, 0))
    val feats = extractFeatures(spark.createDataset(rows), dim = 16)
      .collect().map(f => f.media_id -> f.features).toMap
    assert(feats(1L).toSeq ===
      decodeImage(pngBytes(40, 40, 10, 240), 16).get.toSeq)
    assert(feats(1L).toSeq !== feats(2L).toSeq)
    assert(feats(3L).toSeq ===
      decodeStub("waveform-bytes".getBytes("UTF-8"), 16).toSeq)
  }

  test("extractFeatures preserves ids and emits fixed-dim vectors") {
    import spark.implicits._
    val feats = extractFeatures(media.as[MediaRow], dim = 16)
    val rows = feats.collect()
    assert(rows.length === media.count())
    assert(rows.forall(_.features.length === 16))
    assert(rows.map(_.media_id).toSet ===
      media.select("media_id").collect().map(_.getLong(0)).toSet)
  }

  test("feature vectors feed the ANN surface end-to-end") {
    import spark.implicits._
    import graft.operators.VectorOps._
    val feats = extractFeatures(media.as[MediaRow], dim = 16).toDF()
    val q = feats.filter(col("media_id") === 0).select("features")
      .head().getSeq[Float](0).toArray
    val top = feats.cosineTopK("features", "media_id", q, 3).collect()
    assert(top.length === 3)
    assert(top.head.getAs[Long]("media_id") === 0L) // self is most similar
  }

  test("resizeHalf: REAL resample for decodable images, others untouched") {
    import spark.implicits._
    val before = media.as[MediaRow].collect().map(m => m.media_id -> m).toMap
    val after = resizeHalf(media.as[MediaRow]).collect()
    after.foreach { m =>
      val b = before(m.media_id)
      if (b.kind == "image") {
        // the synthetic image rows are real PNGs: the output must be a
        // real PNG whose DECODED dimensions are half the original's
        assert(m.width === math.max(1, b.width / 2))
        assert(m.height === math.max(1, b.height / 2))
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.bytes))
        assert(img != null, s"media ${m.media_id} resized payload not an image")
        assert(img.getWidth === m.width && img.getHeight === m.height,
          s"media ${m.media_id}: metadata/payload dims diverge")
      } else {
        assert(m.width === b.width && m.bytes.length === b.bytes.length)
      }
    }
    assert(after.exists(_.kind == "image"))
    // non-decodable image payloads keep the deterministic stand-in
    val raw = Seq(MediaRow(7L, "image", "not an image".getBytes("UTF-8"), 40, 20))
    val fb = resizeHalf(spark.createDataset(raw)).head()
    assert(fb.width === 20 && fb.height === 10 &&
      fb.bytes.length === ("not an image".getBytes("UTF-8").length + 3) / 4)
  }

  test("sampleFrames: video rows only, stride honored, frames bounded") {
    val frames = sampleFrames(media, frameBytes = 50, stride = 2)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(1) % 2 == 0))
    assert(rows.forall(r => r.getAs[Array[Byte]]("frame").length <= 50))
    val videoIds = media.filter(col("kind") === "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet.subsetOf(videoIds))
  }
}
