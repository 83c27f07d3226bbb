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

  test("decodeStub: deterministic, unit-norm, payload-sensitive") {
    val a = decodeStub("hello".getBytes, 32)
    val b = decodeStub("hello".getBytes, 32)
    val c = decodeStub("world".getBytes, 32)
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq !== c.toSeq)
    val norm = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
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

  test("resizeHalf: images shrink consistently, other kinds untouched") {
    import spark.implicits._
    val before = media.as[MediaRow].collect().map(m => m.media_id -> m).toMap
    val after = resizeHalf(media.as[MediaRow]).collect()
    after.foreach { m =>
      val b = before(m.media_id)
      if (b.kind == "image") {
        assert(m.width === math.max(1, b.width / 2))
        assert(m.height === math.max(1, b.height / 2))
        assert(m.bytes.length === (b.bytes.length + 3) / 4)
      } else {
        assert(m.width === b.width && m.bytes.length === b.bytes.length)
      }
    }
    assert(after.exists(_.kind == "image"))
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
