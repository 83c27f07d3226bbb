package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side plumbing — schema, partitioning, iterator-based
  * per-partition processing (the Scala analogue of `mapInPandas`), and
  * composition with the vector-search operators — is real and tested.
  *
  * IMAGE decode is REAL: PNG/JPEG/GIF/BMP bytes go through
  * `javax.imageio` (ships with the JDK — no external codec) to pixels,
  * pooled into a grid-mean feature vector ([[decodeImage]]). Audio and
  * video decode remain STUBBED (no codecs in this container):
  * `decodeStub` derives a deterministic fake feature vector from the
  * bytes, with the codec boundary clearly marked. Non-decodable
  * "image" bytes (e.g. the synthetic table's UTF-8 payloads) fall back
  * to the stub, so the plumbing runs end-to-end on any input. */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                            width: Int, height: Int)
  final case class MediaFeatures(media_id: Long, kind: String, dim: Int,
                                 features: Array[Float])

  /** ==== STUB BOUNDARY ====
    * Real implementation would decode the media (JPEG/PNG/WAV/...) and
    * run a feature extractor. This deterministic stand-in hashes the
    * bytes into a unit-norm vector so downstream plumbing (schemas,
    * shuffles, ANN search) is exercised with realistic shapes. */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xFF)) * 0x100000001B3L; i += 1 }
    var k = 0
    var norm = 0.0
    while (k < dim) {
      var x = h + k * 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      val v = ((x >> 11).toDouble / (1L << 52).toDouble).toFloat
      out(k) = v
      norm += v.toDouble * v.toDouble
      k += 1
    }
    val n = math.sqrt(norm).toFloat
    if (n > 0) { k = 0; while (k < dim) { out(k) /= n; k += 1 } }
    out
  }

  /** REAL image decode: bytes -> pixels via `javax.imageio` -> pooled
    * feature vector. The image is divided into a ~sqrt(dim) x sqrt(dim)
    * grid of `dim` cells; each feature is the mean gray value of its
    * cell (grid-mean pooling — the classic "tiny image" descriptor),
    * unit-normalized like every embedding this engine searches over.
    * Deterministic: ImageIO's PNG/JPEG decode and the sRGB `getRGB`
    * conversion are pure functions of the bytes.
    *
    * Returns None when the bytes are not a decodable image (ImageIO
    * sniffs the container format), so callers can fall back to the
    * stub instead of failing mid-pipeline. */
  def decodeImage(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
    val gw = math.ceil(math.sqrt(dim.toDouble)).toInt
    val gh = (dim + gw - 1) / gw
    val sums = new Array[Double](gw * gh)
    val counts = new Array[Long](gw * gh)
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < h) {
      val cy = math.min(gh - 1, y * gh / h)
      var x = 0
      while (x < w) {
        val cx = math.min(gw - 1, x * gw / w)
        val rgb = img.getRGB(x, y)
        val gray = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
          (rgb & 0xFF)) / (3.0 * 255.0)
        val c = cy * gw + cx
        sums(c) += gray; counts(c) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](dim)
    var norm = 0.0
    var k = 0
    while (k < dim) {
      val v = if (counts(k) > 0) (sums(k) / counts(k)).toFloat else 0.0f
      out(k) = v
      norm += v.toDouble * v.toDouble
      k += 1
    }
    val n = math.sqrt(norm).toFloat
    if (n > 0) { k = 0; while (k < dim) { out(k) /= n; k += 1 } }
    else out(0) = 1.0f // pure-black image: a fixed unit direction
    Some(out)
  }

  /** The per-row decode dispatch [[extractFeatures]] runs: image bytes
    * through the REAL [[decodeImage]] path, everything else (audio,
    * video — no codecs in this container) and non-decodable image
    * payloads through the deterministic [[decodeStub]]. */
  def decodeFeatures(kind: String, bytes: Array[Byte], dim: Int): Array[Float] =
    if (kind == "image") decodeImage(bytes, dim).getOrElse(decodeStub(bytes, dim))
    else decodeStub(bytes, dim)

  /** A small REAL PNG, deterministically derived from the media id: an
    * id-seeded integer gradient pattern, so distinct media decode to
    * distinct pooled features. Runs inside executors (per-partition). */
  private def syntheticPng(mediaId: Long, side: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val h = mediaId * 0x9E3779B97F4A7C15L
    val fx = 1 + (h & 3L).toInt
    val fy = 1 + ((h >>> 2) & 3L).toInt
    val phase = ((h >>> 32) & 0xFFL).toInt
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        val g = (x * fx * 13 + y * fy * 7 + phase) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Synthesize a deterministic media table from `documents` — the test
    * double for a real binary source, keeping every downstream op
    * runnable. IMAGE rows carry REAL PNG payloads ([[syntheticPng]]) so
    * the correctness gate exercises the true `javax.imageio` decode;
    * audio/video rows keep UTF-8 text bytes (their decode is the stub,
    * and the frame-sample oracle replays the byte slicing in SQL). */
  def syntheticMediaTable(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val kinds = Seq("image", "audio", "video")
    val base = docs.select(
      col("doc_id").as("media_id"),
      element_at(lit(kinds.toArray), (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      (col("n_chars") % 640 + 32).cast("int").as("width"),
      (col("n_chars") % 480 + 32).cast("int").as("height"))
    import spark.implicits._
    base.as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        if (m.kind != "image") m
        else MediaRow(m.media_id, m.kind, syntheticPng(m.media_id, 24), 24, 24)
      }
    }.toDF()
  }

  /** Batch feature extraction: iterator-based per-partition processing
    * (one decoder init per partition, streaming through rows — the exact
    * shape a real codec needs; the `mapInPandas` analogue). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 32): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder initialization would go here (real codecs
      // are expensive to construct; never per-row). ImageIO's reader
      // registry is JVM-global, so the image path needs none.
      rows.map { m =>
        MediaFeatures(m.media_id, m.kind, dim, decodeFeatures(m.kind, m.bytes, dim))
      }
    }
  }

  /** Resize for `image` rows: halve width/height and decimate the
    * payload to a quarter of its bytes (every 4th byte — the stub for a
    * real resampling kernel; metadata and payload stay consistent, which
    * is the contract downstream stages depend on). Iterator-based
    * per-partition transform like [[extractFeatures]]. */
  def resizeHalf(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        if (m.kind != "image") m
        else {
          // ==== STUB BOUNDARY ==== real impl: decode -> resample -> encode
          val out = new Array[Byte]((m.bytes.length + 3) / 4)
          var i = 0
          while (i < out.length) { out(i) = m.bytes(i * 4); i += 1 }
          MediaRow(m.media_id, m.kind, out,
            math.max(1, m.width / 2), math.max(1, m.height / 2))
        }
      }
    }
  }

  /** Frame sampling for `video` rows: split the payload into fixed-size
    * chunk "frames" and take every `stride`-th (stub for real frame
    * extraction; exercises the explode/one-to-many shape). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 2): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("__n_frames",
        ceil(length(col("bytes")) / lit(frameBytes.toDouble)).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("__n_frames") - 1, lit(0)), lit(stride))))
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(bytes, frame_idx * $frameBytes + 1, $frameBytes)").as("frame"))
}
