package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side plumbing — schema, partitioning, iterator-based
  * per-partition processing (the Scala analogue of `mapInPandas`), and
  * composition with the vector-search operators — is real and tested.
  * The actual media decode is STUBBED (this container ships no
  * image/audio codecs): `decodeStub` derives a deterministic fake
  * feature vector from the bytes, with the real codec boundary clearly
  * marked. Swapping in a JNI/FFI decoder changes only that one function.
  */
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

  /** Synthesize a deterministic media table from `documents` (bytes =
    * UTF-8 text, metadata derived from doc stats) — the test double for a
    * real binary source, keeping every downstream op runnable. */
  def syntheticMediaTable(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val kinds = Seq("image", "audio", "video")
    docs.select(
      col("doc_id").as("media_id"),
      element_at(lit(kinds.toArray), (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      (col("n_chars") % 640 + 32).cast("int").as("width"),
      (col("n_chars") % 480 + 32).cast("int").as("height"))
  }

  /** Batch feature extraction: iterator-based per-partition processing
    * (one decoder init per partition, streaming through rows — the exact
    * shape a real codec needs; the `mapInPandas` analogue). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 32): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder initialization would go here (real codecs
      // are expensive to construct; never per-row)
      rows.map { m =>
        MediaFeatures(m.media_id, m.kind, dim, decodeStub(m.bytes, dim))
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
