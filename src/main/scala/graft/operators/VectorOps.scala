package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions._

/** Similarity search over embedding columns (`array<float>`) — the
  * n-dimensional analogue of the spatial kNN surface, sharing its
  * top-k / blocking-join shapes.
  *
  * Brute-force top-k plans as TakeOrderedAndProject (per-partition heap,
  * k-row driver merge); the LSH variants block with the random-hyperplane
  * sketch expression and verify candidates exactly, so precision is exact
  * and only recall is probabilistic.
  */
object VectorOps {

  implicit class DatasetVectorOps[T](private val ds: Dataset[T]) extends AnyVal {

    /** Exact top-k by cosine similarity against one query vector.
      * Scans everything once; no shuffle beyond the top-k merge. */
    def cosineTopK(vecCol: String, idCol: String, query: Array[Float],
                   k: Int): DataFrame =
      ds.toDF
        .withColumn("cos", cosineSimilarity(col(vecCol), lit(query)))
        .orderBy(col("cos").desc, col(idCol).asc)
        .limit(k)

    /** Approximate top-k: candidates must share >= 1 sketch band with the
      * query (`bandBits`-bit blocks of the hyperplane sketch), then exact
      * cosine ranks them. `planes`/`bandBits` trade recall for scan cost:
      * at scale the band match is an equi-filter a bucketed layout can
      * serve without a full scan. */
    def cosineTopKLsh(vecCol: String, idCol: String, query: Array[Float],
                      k: Int, planes: Int = 16, bandBits: Int = 4,
                      seed: Long = 42L): DataFrame = {
      require(planes % bandBits == 0)
      val bands = planes / bandBits
      val mask = (1L << bandBits) - 1
      val qSketch = graft.functions.VectorKernels.hyperplaneSketch(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(query), planes, seed)
      val sk = hyperplaneSketch(col(vecCol), planes, seed)
      val bandMatch = (0 until bands).map { b =>
        shiftright(sk, b * bandBits).bitwiseAND(lit(mask)) ===
          lit((qSketch >>> (b * bandBits)) & mask)
      }.reduce(_ || _)
      ds.toDF
        .filter(bandMatch)
        .withColumn("cos", cosineSimilarity(col(vecCol), lit(query)))
        .orderBy(col("cos").desc, col(idCol).asc)
        .limit(k)
    }

    /** Approximate top-k, IVF-style: a coarse quantizer of `nlist`
      * deterministically-sampled centroid vectors partitions the
      * collection into cells (argmax-cosine assignment, all codegen'd
      * column arithmetic); a query exactly re-ranks only the `nprobe`
      * cells whose centroids are nearest to it. At scale, writing the
      * data partitioned by `__cell` turns the probe into partition
      * pruning — the classic IVF index layout on Spark primitives. */
    def cosineTopKIvf(vecCol: String, idCol: String, query: Array[Float],
                      k: Int, nlist: Int = 16, nprobe: Int = 4,
                      seed: Long = 42L): DataFrame = {
      require(nlist >= 1 && nprobe >= 1)
      val df = ds.toDF
      // nlist rows to the driver — bounded like RangePartitioner's sketch
      val centroids = df
        .select(col(idCol), col(vecCol))
        .orderBy(xxhash64(col(idCol), lit(seed)))
        .limit(nlist)
        .collect()
        .map(_.getSeq[Float](1).toArray)
      val cosToCentroids = array(centroids.map(c =>
        cosineSimilarity(col(vecCol), lit(c))): _*)
      val withCos = df.withColumn("__graft_cos", cosToCentroids)
        .withColumn("__cell",
          array_position(col("__graft_cos"), array_max(col("__graft_cos"))))
      val qCos = centroids.map(c => graft.functions.VectorKernels.cosineF(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(query),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(c)))
      val probes = qCos.zipWithIndex.sortBy(-_._1).take(nprobe)
        .map(_._2 + 1L) // array_position is 1-based
      withCos
        .filter(col("__cell").isin(probes: _*))
        .withColumn("cos", cosineSimilarity(col(vecCol), lit(query)))
        .orderBy(col("cos").desc, col(idCol).asc)
        .limit(k)
        .drop("__graft_cos", "__cell")
    }

    /** Exact all-pairs similarity join (cosine >= threshold) against
      * `right`. Cross product + codegen'd kernel filter; correct at any
      * threshold, quadratic by nature — the oracle/baseline path. Spark
      * broadcasts the smaller side (BroadcastNestedLoopJoin). */
    def similarityJoinExact(right: Dataset[_], lVec: String, rVec: String,
                            lId: String, rId: String,
                            threshold: Double): DataFrame = {
      val l = ds.toDF.select(col(lId), col(lVec))
      val r = right.toDF.select(col(rId).as("__rid"), col(rVec).as("__rvec"))
      l.crossJoin(r)
        .withColumn("cos", cosineSimilarity(col(lVec), col("__rvec")))
        .filter(col("cos") >= threshold)
        .select(col(lId), col("__rid").as(rId), col("cos"))
    }

    /** LSH-blocked near-duplicate pairs within this dataset:
      * sketch-band equi-join -> exact cosine verify at `threshold`.
      * Linear-ish in data size for high thresholds (near-dup regime). */
    def embeddingNearDupPairs(vecCol: String, idCol: String,
                              threshold: Double = 0.9, planes: Int = 16,
                              bandBits: Int = 4, seed: Long = 42L): DataFrame = {
      require(planes % bandBits == 0)
      val bands = planes / bandBits
      val mask = (1L << bandBits) - 1
      val doc = ds.toDF.select(col(idCol), col(vecCol))
        .withColumn("__sk", hyperplaneSketch(col(vecCol), planes, seed))
      val bandStructs = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("__sk"), b * bandBits).bitwiseAND(lit(mask)).as("key"))
      }
      // candidates touch only (id, band, key); vectors join back onto the
      // deduped pairs for the exact verify (never ride the banded join)
      val banded = doc
        .select(col(idCol), explode(array(bandStructs: _*)).as("__b"))
        .select(col(idCol),
          col("__b.band").as("__band"), col("__b.key").as("__key"))
      val l = banded.select(col(idCol).as("id1"), col("__band"), col("__key"))
      val r = banded.select(col(idCol).as("id2"), col("__band"), col("__key"))
      val pairs = l.join(r, Seq("__band", "__key"))
        .filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"))
        .distinct()
      val v1 = ds.toDF.select(col(idCol).as("id1"), col(vecCol).as("__v1"))
      val v2 = ds.toDF.select(col(idCol).as("id2"), col(vecCol).as("__v2"))
      pairs.join(v1, Seq("id1")).join(v2, Seq("id2"))
        .withColumn("cos", cosineSimilarity(col("__v1"), col("__v2")))
        .filter(col("cos") >= threshold)
        .select(col("id1"), col("id2"), col("cos"))
    }
  }
}
