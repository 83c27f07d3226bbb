package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.{bpeTokenCount, cosineSimilarity, fingerprint64, langId, qualityScore, stopwordRatio, distinctTokenRatio, tokenCount}
import graft.operators.DedupOps._
import graft.operators.VectorOps._

/** The LLM-data-pipeline surface: dedup, text analysis, and embedding
  * similarity search over the `documents` / `embeddings` tables
  * (BASELINE.json north star; graded alongside SURVEY.md §2).
  *
  * Oracle policy: deterministic/SQL-expressible ops carry a DuckDB oracle
  * (exact dedup, token stats, exact cosine ops — the cosine SQL mirrors
  * the kernel's sequential-double accumulation so doubles match
  * bit-for-bit). The IVF ANN path was made FULLY SQL-recomputable by
  * choosing a plain-integer-arithmetic centroid sampler (VectorOps
  * .centroidOrder), so its oracle replays centroid choice, argmax cell
  * assignment, probe selection, and the final top-k in DuckDB. Ops whose
  * candidate generation is engine-hash-based (hyperplane LSH, MinHash/
  * SimHash, fingerprint, lang-id) cannot be replayed row-for-row; where
  * their CONTRACT is deterministic they carry a contract oracle instead
  * (sp_zknn_check pattern), else rows-only + ScalaTest.
  */
object Pipeline {

  // ---- dedup ----

  def exactDedupQ(s: SparkSession, d: String): DataFrame =
    documents(s, d).exactDedup("text", "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Independent n-gram Jaccard recompute via Spark built-ins over
    * STRING shingles — a different codepath from the hashed-shingle
    * kernels (`shingleSet`/`sortedJaccard`), mirroring the DuckDB
    * dd_ngram_jaccard_pairs oracle's string-set semantics (equal modulo
    * negligible 64-bit shingle-hash collisions — the same argument that
    * oracle's green hash already rests on). */
  private def jaccardBuiltinCol(t1: Column, t2: Column, n: Int): Column = {
    def sh(t: Column): Column = {
      val toks = filter(split(trim(t), "\\s+"), x => x =!= lit(""))
      array_distinct(
        when(size(toks) === 0, array().cast("array<string>"))
          .when(size(toks) < n, array(concat_ws(" ", toks)))
          .otherwise(transform(sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
    }
    val (a, b) = (sh(t1), sh(t2))
    val inter = size(array_intersect(a, b))
    when(size(a) === 0 && size(b) === 0, lit(1.0))
      .when(size(a) === 0 || size(b) === 0, lit(0.0))
      .otherwise(inter.cast("double") / (size(a) + size(b) - inter))
  }

  /** MinHash near-dup, emitted as an aggregate precision verdict (same
    * pattern as dd_emb_near_dup): the banded candidate SET is
    * engine-hash-specific, but every returned pair must be ordered,
    * score at/above the threshold, and carry a Jaccard bit-equal to the
    * independent built-in-function recompute over string shingles.
    * Recall (the LSH tradeoff) is covered by the brute-force ScalaTest
    * oracle; the capped variant is measured by dd_minhash_pairs_capped. */
  def minHashPairsQ(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val pairs = docs
      .minHashPairs("doc_id", "text", shingle = 3, numHashes = 64,
        bands = 16, threshold = 0.8)
      .join(docs.select(col("doc_id").as("id1"), col("text").as("__t1")), Seq("id1"))
      .join(docs.select(col("doc_id").as("id2"), col("text").as("__t2")), Seq("id2"))
    pairs.agg(
      (sum(when(col("id1") < col("id2"), 0).otherwise(1)) === 0).as("all_ordered"),
      (sum(when(col("jaccard") >= 0.8, 0).otherwise(1)) === 0).as("all_above_threshold"),
      (sum(when(col("jaccard") ===
        jaccardBuiltinCol(col("__t1"), col("__t2"), 3), 0).otherwise(1)) === 0)
        .as("all_jaccard_exact"),
      (count(lit(1)) > 0).as("nonempty"))
  }

  /** CDC chunk-sharing near-dup gate: chunk boundaries are
    * engine-hash-private, so the oracle is the verdict row — every pair
    * ordered, sharing at least `minShared` content-defined chunks, and
    * carrying a Jaccard bit-equal to the independent built-in-function
    * recompute; nonempty pins that the corpus's planted near-dups
    * actually share realigned chunks (the insertion-robustness payoff). */
  def cdcPairsQ(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val pairs = docs
      .cdcChunkPairs("doc_id", "text", minShared = 2)
      .join(docs.select(col("doc_id").as("id1"), col("text").as("__t1")), Seq("id1"))
      .join(docs.select(col("doc_id").as("id2"), col("text").as("__t2")), Seq("id2"))
    pairs.agg(
      (sum(when(col("id1") < col("id2"), 0).otherwise(1)) === 0).as("all_ordered"),
      (sum(when(col("shared_chunks") >= 2, 0).otherwise(1)) === 0).as("all_min_shared"),
      (sum(when(col("jaccard") ===
        jaccardBuiltinCol(col("__t1"), col("__t2"), 3), 0).otherwise(1)) === 0)
        .as("all_jaccard_exact"),
      (count(lit(1)) > 0).as("nonempty"))
  }

  /** Chunk-store savings summary: `total_chunk_chars` is REAL oracle
    * teeth — the reassembly contract makes it equal the corpus's total
    * text length, which DuckDB computes independently; the verdict
    * booleans pin the engine-side conservation identities the hash
    * grouping must satisfy. */
  def cdcDedupQ(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val stats = docs.cdcDedupStats("doc_id", "text")
    val corpusChars = docs.agg(sum(length(col("text")).cast("long")).as("__cc"))
    stats.crossJoin(corpusChars).select(
      col("total_chunk_chars"),
      (col("total_chunk_chars") === col("__cc")).as("chars_conserved"),
      (col("distinct_chunk_chars") + col("dup_chunk_chars") ===
        col("total_chunk_chars")).as("savings_consistent"),
      (col("cross_doc_chunks") > 0).as("sharing_nonempty"))
  }

  /** The digest-gate queries' synthetic ingest wave: every 7th corpus
    * doc verbatim under a shifted id (a true duplicate the gate must
    * pair), plus every 11th doc with mutated text (novel — the Bloom
    * filter clears most of these locally). Built from the same table
    * the oracle reads, so the DuckDB join on raw text is the exact
    * reference semantics. */
  private def digestWave(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" NOVEL")).as("text")))

  private val digestWaveSql =
    """SELECT doc_id + 1000000 AS id_new, text FROM documents WHERE doc_id % 7 = 0
      |UNION ALL
      |SELECT doc_id + 2000000 AS id_new, text || ' NOVEL' FROM documents
      |WHERE doc_id % 11 = 0""".stripMargin

  /** At-rest exact-dedup digest gate, pairs form: corpus digests +
    * Bloom filter persist once ([[writeDigestIndex]]); the wave's
    * exact-duplicate pairs come off the layout with corpus text never
    * re-read. The oracle is the REAL reference semantics — a raw-text
    * equi-join in DuckDB — not a verdict row: digest equality is
    * checked against text equality itself. */
  def digestGateQ(s: SparkSession, d: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_digest_idx_" + Integer.toHexString(d.hashCode)).toString
    val docs = documents(s, d)
    docs.writeDigestIndex(path, "doc_id", "text")
    digestWave(docs).exactPairsAgainstIndex(path, "doc_id", "text")
      .orderBy(col("id_new"), col("id_corpus"))
  }

  /** The digest gate's ADMIT set: wave docs whose text matches nothing
    * in the corpus — Bloom-cleared rows skip the join entirely. Oracle
    * is the NOT EXISTS form of the same raw-text semantics. */
  def digestAdmitQ(s: SparkSession, d: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_digest_idx_" + Integer.toHexString(d.hashCode)).toString
    val docs = documents(s, d)
    docs.writeDigestIndex(path, "doc_id", "text")
    digestWave(docs).admitAgainstDigestIndex(path, "doc_id", "text")
      .select(col("doc_id"), length(col("text")).as("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** At-rest CDC chunk index gate: the corpus's chunk-hash membership
    * arrays and verify shingles persist once ([[writeCdcIndex]]); the
    * wave dedups against the LAYOUT. The verdict row asserts
    * engine-side that index-backed pairs equal the direct
    * [[cdcChunkPairsAgainst]] bit-for-bit — full-outer compare of
    * (shared_chunks, jaccard) per pair — the index-on/index-off
    * contract the minhash index answers with the same shape. */
  def cdcIndexQ(s: SparkSession, d: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_cdc_idx_" + Integer.toHexString(d.hashCode)).toString
    val docs = documents(s, d)
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    corpus.writeCdcIndex(path, "doc_id", "text")
    val viaIndex = fresh.cdcPairsAgainstIndex(path, "doc_id", "text",
      minShared = 1)
    val direct = fresh.cdcChunkPairsAgainst(corpus, "doc_id", "text",
      minShared = 1)
    viaIndex.select(col("id_new"), col("id_corpus"),
      col("shared_chunks").as("__si"), col("jaccard").as("__ji"))
      .join(direct.select(col("id_new"), col("id_corpus"),
        col("shared_chunks").as("__sd"), col("jaccard").as("__jd")),
        Seq("id_new", "id_corpus"), "full_outer")
      .agg(
        (sum(when(col("__si") === col("__sd") &&
          col("__ji") === col("__jd"), 0).otherwise(1)) === 0)
          .as("index_equals_direct"),
        (count(lit(1)) > 0).as("nonempty"))
  }

  /** Digest-index wave admission with a REAL oracle: corpus waves 1–5
    * write the layout, waves 6–9 are APPENDED ([[appendDigestIndex]] —
    * per-wave Bloom filters OR'd at read), and the probe wave's pairs
    * must equal DuckDB's raw-text join against exactly the two
    * admitted waves. */
  def digestAppendQ(s: SparkSession, d: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_digest_app_" + Integer.toHexString(d.hashCode)).toString
    val docs = documents(s, d)
    docs.filter(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 5)
      .writeDigestIndex(path, "doc_id", "text")
    docs.filter(col("doc_id") % 10 >= 6)
      .appendDigestIndex(path, "doc_id", "text")
    digestWave(docs).exactPairsAgainstIndex(path, "doc_id", "text")
      .orderBy(col("id_new"), col("id_corpus"))
  }

  /** Tombstone DELETES on the digest layout with a REAL oracle: waves
    * 1–5 write, waves 6–9 append, then every doc_id % 3 == 0 corpus
    * doc is deleted ([[DedupOps.deleteFromDigestIndex]] — ids land
    * under a delete token, readers anti-join them); the probe wave's
    * pairs must equal DuckDB's raw-text join against exactly the
    * SURVIVING corpus docs — write → append → delete answers like a
    * layout the deleted docs never entered. */
  def digestDeleteQ(s: SparkSession, d: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_digest_del_" + Integer.toHexString(d.hashCode)).toString
    val docs = documents(s, d)
    docs.filter(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 5)
      .writeDigestIndex(path, "doc_id", "text")
    docs.filter(col("doc_id") % 10 >= 6)
      .appendDigestIndex(path, "doc_id", "text")
    graft.operators.DedupOps.deleteFromDigestIndex(s, path,
      docs.filter(col("doc_id") % 3 === 0).select(col("doc_id")))
    digestWave(docs).exactPairsAgainstIndex(path, "doc_id", "text")
      .orderBy(col("id_new"), col("id_corpus"))
  }

  /** The layout AUDIT verb ([[DedupOps.fsckTextIndex]]): a digest
    * layout after write → append → delete must answer the exact
    * all-green check inventory — the ops surface completing the
    * write/append/delete/compact/repair story. DuckDB predicts the
    * (check, ok) table. */
  def indexFsckQ(s: SparkSession, d: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_fsck_q_" + Integer.toHexString(d.hashCode)).toString
    val docs = documents(s, d)
    docs.filter(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 5)
      .writeDigestIndex(path, "doc_id", "text")
    docs.filter(col("doc_id") % 10 >= 6)
      .appendDigestIndex(path, "doc_id", "text")
    graft.operators.DedupOps.deleteFromDigestIndex(s, path,
      docs.filter(col("doc_id") % 3 === 0).select(col("doc_id")))
    graft.operators.DedupOps.fsckTextIndex(s, path)
      .select(col("check"), col("ok"))
      .orderBy(col("check"))
  }

  /** Tombstone DELETES on the CDC chunk index, verdict form: write →
    * append → delete, then the wave's index-backed pairs must equal
    * the direct chunk pairs against the SURVIVING corpus bit-for-bit —
    * before AND after [[DedupOps.compactCdcIndex]] folds the
    * tombstones physically. */
  def cdcDeleteQ(s: SparkSession, d: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_cdc_del_" + Integer.toHexString(d.hashCode)).toString
    val docs = documents(s, d)
    val corpus0 = docs.filter(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 5)
    val wave2 = docs.filter(col("doc_id") % 10 >= 6)
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    val del = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 3 === 0)
      .select(col("doc_id"))
    corpus0.writeCdcIndex(path, "doc_id", "text")
    wave2.appendCdcIndex(path, "doc_id", "text")
    graft.operators.DedupOps.deleteFromCdcIndex(s, path, del)
    val direct = fresh.cdcChunkPairsAgainst(
      corpus0.unionByName(wave2).join(del, Seq("doc_id"), "left_anti"),
      "doc_id", "text", minShared = 1)
    def compare(got: DataFrame, name: String): DataFrame =
      got.select(col("id_new"), col("id_corpus"),
        col("shared_chunks").as("__sg"), col("jaccard").as("__jg"))
        .join(direct.select(col("id_new"), col("id_corpus"),
          col("shared_chunks").as("__sd"), col("jaccard").as("__jd")),
          Seq("id_new", "id_corpus"), "full_outer")
        .agg(
          (sum(when(col("__sg") === col("__sd") &&
            col("__jg") === col("__jd"), 0).otherwise(1)) === 0).as(name),
          (count(lit(1)) > 0).as("nonempty"))
    // materialize BEFORE the compact folds the tombstone files this
    // lazy plan reads
    val viaDeleted = compare(fresh.cdcPairsAgainstIndex(path, "doc_id",
      "text", minShared = 1), "delete_equals_direct").localCheckpoint()
    graft.operators.DedupOps.compactCdcIndex(s, path)
    val viaCompacted = compare(fresh.cdcPairsAgainstIndex(path, "doc_id",
      "text", minShared = 1), "compact_equals_direct")
    viaDeleted.select(col("delete_equals_direct"), col("nonempty"))
      .crossJoin(viaCompacted.select(col("compact_equals_direct")))
      .select(col("delete_equals_direct"), col("compact_equals_direct"),
        col("nonempty"))
  }

  /** Tombstone DELETES on the minhash layout, verdict form: the
    * deleted ids leave the bucket membership (subtracted BEFORE any
    * cap) and the index-backed pairs equal the direct banded join
    * against the surviving corpus — before and after the compaction
    * fold. */
  def minHashDeleteQ(s: SparkSession, d: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_minhash_del_" + Integer.toHexString(d.hashCode)).toString
    val docs = documents(s, d)
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val del = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 3 === 0)
      .select(col("doc_id"))
    corpus.writeMinhashIndex(path, "doc_id", "text", shingle = 3,
      numHashes = 64, bands = 16)
    graft.operators.DedupOps.deleteFromMinhashIndex(s, path, del)
    val direct = fresh.minHashPairsAgainst(
      corpus.join(del, Seq("doc_id"), "left_anti"), "doc_id", "text",
      shingle = 3, numHashes = 64, bands = 16, threshold = 0.8)
    def compare(got: DataFrame, name: String): DataFrame =
      got.select(col("id_new"), col("id_corpus"), col("jaccard").as("__jg"))
        .join(direct.select(col("id_new"), col("id_corpus"),
          col("jaccard").as("__jd")), Seq("id_new", "id_corpus"), "full_outer")
        .agg(
          (sum(when(col("__jg") === col("__jd"), 0).otherwise(1)) === 0)
            .as(name),
          (count(lit(1)) > 0).as("nonempty"))
    // materialize BEFORE the compact folds the tombstone files this
    // lazy plan reads
    val viaDeleted = compare(fresh.minHashPairsAgainstIndex(path, "doc_id",
      "text", threshold = 0.8), "delete_equals_direct").localCheckpoint()
    graft.operators.DedupOps.compactMinhashIndex(s, path)
    val viaCompacted = compare(fresh.minHashPairsAgainstIndex(path, "doc_id",
      "text", threshold = 0.8), "compact_equals_direct")
    viaDeleted.select(col("delete_equals_direct"), col("nonempty"))
      .crossJoin(viaCompacted.select(col("compact_equals_direct")))
      .select(col("delete_equals_direct"), col("compact_equals_direct"),
        col("nonempty"))
  }

  /** Wave admission into the at-rest CDC index: corpus0 writes the
    * layout, wave2 is APPENDED (O(wave) — corpus rows untouched), the
    * fresh wave gates against the two-wave layout, then
    * [[DedupOps.compactCdcIndex]] merges it back to one wave. The
    * verdict row asserts engine-side that BOTH the appended and the
    * compacted layout reproduce the direct pairs against the unioned
    * corpus bit-for-bit. */
  def cdcAppendQ(s: SparkSession, d: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_cdc_app_" + Integer.toHexString(d.hashCode)).toString
    val docs = documents(s, d)
    val corpus0 = docs.filter(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 5)
    val wave2 = docs.filter(col("doc_id") % 10 >= 6)
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    corpus0.writeCdcIndex(path, "doc_id", "text")
    wave2.appendCdcIndex(path, "doc_id", "text")
    val viaAppend = fresh.cdcPairsAgainstIndex(path, "doc_id", "text",
      minShared = 1)
    val direct = fresh.cdcChunkPairsAgainst(corpus0.unionByName(wave2),
      "doc_id", "text", minShared = 1)
    def compare(got: DataFrame): DataFrame =
      got.select(col("id_new"), col("id_corpus"),
        col("shared_chunks").as("__sg"), col("jaccard").as("__jg"))
        .join(direct.select(col("id_new"), col("id_corpus"),
          col("shared_chunks").as("__sd"), col("jaccard").as("__jd")),
          Seq("id_new", "id_corpus"), "full_outer")
        .agg(
          (sum(when(col("__sg") === col("__sd") &&
            col("__jg") === col("__jd"), 0).otherwise(1)) === 0).as("eq"),
          (count(lit(1)) > 0).as("ne"))
    // the append comparison must evaluate BEFORE the compact rewrites
    // the files it lazily reads — collect the one verdict row eagerly;
    // viaCompact is PLANNED after the compact for the same reason (the
    // parquet file listing snapshots at read time)
    val aRow = compare(viaAppend).collect()(0)
    graft.operators.DedupOps.compactCdcIndex(s, path)
    val viaCompact = fresh.cdcPairsAgainstIndex(path, "doc_id", "text",
      minShared = 1)
    compare(viaCompact).select(
      lit(aRow.getBoolean(0)).as("append_equals_direct"),
      col("eq").as("compact_equals_direct"),
      lit(aRow.getBoolean(1)).as("nonempty"))
  }

  /** Wave admission into the at-rest minhash index — [[cdcAppendQ]]'s
    * contract on the minhash blocking key: append is O(wave), the
    * two-wave layout and the compacted layout must both reproduce the
    * direct pairs against the unioned corpus bit-for-bit. */
  def minhashAppendQ(s: SparkSession, d: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_mh_app_" + Integer.toHexString(d.hashCode)).toString
    val docs = documents(s, d)
    val corpus0 = docs.filter(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 5)
    val wave2 = docs.filter(col("doc_id") % 10 >= 6)
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    corpus0.writeMinhashIndex(path, "doc_id", "text")
    wave2.appendMinhashIndex(path, "doc_id", "text")
    val viaAppend = fresh.minHashPairsAgainstIndex(path, "doc_id", "text",
      threshold = 0.3)
    val direct = fresh.minHashPairsAgainst(corpus0.unionByName(wave2),
      "doc_id", "text", threshold = 0.3)
    def compare(got: DataFrame): DataFrame =
      got.select(col("id_new"), col("id_corpus"), col("jaccard").as("__jg"))
        .join(direct.select(col("id_new"), col("id_corpus"),
          col("jaccard").as("__jd")),
          Seq("id_new", "id_corpus"), "full_outer")
        .agg(
          (sum(when(col("__jg") === col("__jd"), 0).otherwise(1)) === 0)
            .as("eq"),
          (count(lit(1)) > 0).as("ne"))
    val aRow = compare(viaAppend).collect()(0)
    graft.operators.DedupOps.compactMinhashIndex(s, path)
    val viaCompact = fresh.minHashPairsAgainstIndex(path, "doc_id", "text",
      threshold = 0.3)
    compare(viaCompact).select(
      lit(aRow.getBoolean(0)).as("append_equals_direct"),
      col("eq").as("compact_equals_direct"),
      lit(aRow.getBoolean(1)).as("nonempty"))
  }

  /** At-rest minhash index gate: the corpus's banded buckets AND
    * verify shingles persist once ([[writeMinhashIndex]]); the wave
    * dedups against the LAYOUT — corpus text never re-read. The
    * verdict row asserts engine-side that index-backed pairs equal the
    * direct [[minHashPairsAgainst]] bit-for-bit (full-outer compare of
    * jaccard per pair), the index-on/index-off contract the spatial
    * indexes answer with shared oracles. */
  def minHashIndexQ(s: SparkSession, d: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_minhash_idx_" + Integer.toHexString(d.hashCode)).toString
    val docs = documents(s, d)
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    corpus.writeMinhashIndex(path, "doc_id", "text", shingle = 3,
      numHashes = 64, bands = 16)
    val viaIndex = fresh.minHashPairsAgainstIndex(path, "doc_id", "text",
      threshold = 0.8)
    val direct = fresh.minHashPairsAgainst(corpus, "doc_id", "text",
      shingle = 3, numHashes = 64, bands = 16, threshold = 0.8)
    viaIndex.select(col("id_new"), col("id_corpus"), col("jaccard").as("__ji"))
      .join(direct.select(col("id_new"), col("id_corpus"),
        col("jaccard").as("__jd")), Seq("id_new", "id_corpus"), "full_outer")
      .agg(
        (sum(when(col("__ji") === col("__jd"), 0).otherwise(1)) === 0)
          .as("index_equals_direct"),
        (count(lit(1)) > 0).as("nonempty"))
  }

  /** Incremental ingest-time dedup gate: docs with doc_id % 10 == 0
    * play the newly arrived shard, the rest the existing corpus; the
    * asymmetric banded join replaces the corpus self-join. Aggregate
    * contract verdict (the dd_minhash_pairs pattern) plus the
    * side-correctness bits the asymmetric form adds: every pair has a
    * shard-side left id and a corpus-side right id. */
  def minHashIncrementalQ(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val pairs = fresh
      .minHashPairsAgainst(corpus, "doc_id", "text", shingle = 3,
        numHashes = 64, bands = 16, threshold = 0.8)
      .join(docs.select(col("doc_id").as("id_new"), col("text").as("__t1")), Seq("id_new"))
      .join(docs.select(col("doc_id").as("id_corpus"), col("text").as("__t2")), Seq("id_corpus"))
    pairs.agg(
      (sum(when(col("id_new") % 10 === 0, 0).otherwise(1)) === 0).as("all_new_side"),
      (sum(when(col("id_corpus") % 10 =!= 0, 0).otherwise(1)) === 0).as("all_corpus_side"),
      (sum(when(col("jaccard") >= 0.8, 0).otherwise(1)) === 0).as("all_above_threshold"),
      (sum(when(col("jaccard") ===
        jaccardBuiltinCol(col("__t1"), col("__t2"), 3), 0).otherwise(1)) === 0)
        .as("all_jaccard_exact"),
      (count(lit(1)) > 0).as("nonempty"))
  }

  /** Measures the MinHash bucket cap's recall cut end-to-end (driver
    * queries otherwise run uncapped): a deterministic boilerplate-heavy
    * derivation of `documents` — every 5th doc's text replaced by ONE
    * fixed template, the identical-text cluster a templated corpus
    * produces — run uncapped vs capped, alongside the oversized-bucket
    * audit. Emitted as an aggregate contract verdict (the
    * dd_minhash_pairs pattern): the surviving pair SET is
    * engine-hash-specific, but the cap's behavior on the cluster is
    * fully determined — identical texts share every band bucket, all of
    * those buckets exceed the cap, so (a) no intra-cluster pair
    * survives, (b) the cut is at least C(cluster, 2) (capped pairs are
    * a subset of uncapped; uncapped holds every cluster pair at exact
    * Jaccard 1.0), (c) the audit reports at least one oversized bucket
    * per band and a max bucket at least the cluster size. Surviving
    * pairs obey the uncapped twin's ordered/threshold/bit-exact-Jaccard
    * contract (vacuous truths guarded with coalesce if none survive). */
  def minHashCappedQ(s: SparkSession, d: String): DataFrame = {
    val template = "subscribe to our newsletter terms of service apply " +
      "all rights reserved unsubscribe at any time"
    val boiler = documents(s, d).withColumn("text",
      when(col("doc_id") % 5 === 0, lit(template)).otherwise(col("text")))
    val uncapped = boiler.minHashPairs("doc_id", "text", shingle = 3,
      numHashes = 64, bands = 16, threshold = 0.8)
    val capped = boiler.minHashPairs("doc_id", "text", shingle = 3,
      numHashes = 64, bands = 16, threshold = 0.8, maxBucket = 20)
      .join(boiler.select(col("doc_id").as("id1"), col("text").as("__t1")), Seq("id1"))
      .join(boiler.select(col("doc_id").as("id2"), col("text").as("__t2")), Seq("id2"))
    val audit = boiler.minHashOversizedBuckets("doc_id", "text", shingle = 3,
      numHashes = 64, bands = 16, maxBucket = 20)
    def allZero(c: Column): Column = coalesce(sum(c), lit(0L)) === 0
    uncapped.agg(count(lit(1)).as("n_uncapped"))
      .crossJoin(capped.agg(
        count(lit(1)).as("n_capped"),
        allZero(when(col("id1") < col("id2"), 0).otherwise(1)).as("all_ordered"),
        allZero(when(col("jaccard") >= 0.8, 0).otherwise(1)).as("all_above_threshold"),
        allZero(when(col("jaccard") ===
          jaccardBuiltinCol(col("__t1"), col("__t2"), 3), 0).otherwise(1))
          .as("all_jaccard_exact"),
        allZero(when(col("id1") % 5 === 0 && col("id2") % 5 === 0, 1).otherwise(0))
          .as("no_cluster_pair_survives")))
      .crossJoin(audit.agg(count(lit(1)).as("n_oversized_buckets"),
        coalesce(max(col("size")), lit(0L)).as("max_bucket_size")))
      .crossJoin(boiler.filter(col("doc_id") % 5 === 0)
        .agg(count(lit(1)).as("n_cluster")))
      .select(
        col("all_ordered"), col("all_above_threshold"), col("all_jaccard_exact"),
        col("no_cluster_pair_survives"),
        (col("n_uncapped") - col("n_capped") >=
          col("n_cluster") * (col("n_cluster") - 1) / 2).as("cut_covers_cluster"),
        (col("n_oversized_buckets") >= 16).as("every_band_reports_cluster"),
        (col("max_bucket_size") >= col("n_cluster")).as("max_bucket_covers_cluster"))
  }

  /** Benchmark decontamination sweep: (corpus doc, eval doc) pairs
    * sharing >= 1 distinct word 8-gram, with every 7th doc standing in
    * as the benchmark set. Grams join on their strings, so DuckDB
    * replays the whole operator (tokenization is the explicit
    * Java∩RE2 whitespace class). */
  def contaminationQ(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val eval = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("eval_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    graft.operators.DedupOps.contaminationPairs(
        corpus, broadcast(eval), "doc_id", "eval_id", "text", n = 8)
      .orderBy(col("doc_id"), col("eval_id"))
  }

  /** Unigram corpus-likelihood quality score (the SQL-replayable
    * KenLM-perplexity stand-in): mean corpus unigram probability of
    * each document's tokens — exact integer sums, one double
    * division. */
  def unigramQualityQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d).unigramScore("doc_id", "text").orderBy(col("doc_id"))
  }

  /** Source-reputation (domain) filter: keep documents of sources whose
    * mean quality score >= 0.645 (drops roughly half the synthetic
    * sources at every SF); decimal-exact mean -> full hash oracle. */
  def sourceFilterQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d).sourceReputationFilter("source", "text", minMean = 0.645)
      .select(col("doc_id"), col("source"), col("source_mean_q"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic stratified train/val/test split: 0.75/0.125/0.125 by
    * the Knuth hash of doc_id (cumulative bounds 0.75 and 0.875 are
    * exact binary doubles, so the CASE replays bit-for-bit). */
  def splitAssignQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.SampleOps._
    documents(s, d)
      .splitAssign("doc_id",
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .select(col("doc_id"), col("lang"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Per-lang vocabulary size, exact + HLL-sketch contract: the oracle
    * replays the exact count and pins `within_bound` TRUE — a DuckDB
    * engine cannot reproduce Spark's HLL++ registers, so the CONTRACT
    * (sketch within 5% of exact) is the oracled surface, the same
    * pattern as the LSH/minhash contract oracles. */
  def vocabSketchQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d).vocabStats("lang", "text").orderBy(col("lang"))
  }

  /** Corpus-level boilerplate scoring: 5-grams shared by >= 2 distinct
    * documents are boilerplate; each doc scores the fraction of its
    * distinct grams that are. Integer counts + one double division ->
    * full hash oracle on the proven gram tokenizer. */
  def boilerplateQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d).boilerplateScore("doc_id", "text", n = 5, minDocs = 2L)
      .orderBy(col("doc_id"))
  }

  /** PII detection + redaction over deterministically PLANTED pii (an
    * email, an IPv4, a phone run, and an SSN derived from doc_id ride
    * every document — the word-salad corpus carries none of its own, and
    * both engines build the identical augmented text), so the chained
    * regexp_replace redaction and the per-class counts have real work
    * at any SF and hash-oracle bit-for-bit. */
  def piiRedactQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    val planted = documents(s, d).select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com"),
        lit(" from 10.0."), (col("doc_id") % 256), lit("."),
        (col("doc_id") % 100),
        lit(" call +1415555"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" ssn 123-45-6789")).as("text"))
    planted.piiRedact("doc_id", "text").orderBy(col("doc_id"))
  }

  /** Canonical-URL dedup over deterministically synthesized URLs (the
    * corpus carries none): four variants per article id — raw with
    * unsorted params, SHOUTED scheme/host with :443 and a fragment,
    * www. with a utm param, and an http://...:80 item path — where the
    * first three canonicalize to ONE key. Both engines build the same
    * URLs and replay the same normalization chain, so the survivor set
    * hash-oracles exactly. */
  def urlDedupQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    val n = (col("doc_id") % 50).cast("string")
    val url = when(col("doc_id") % 4 === 0,
        concat(lit("https://example.com/article/"), n, lit("?b=2&a=1")))
      .when(col("doc_id") % 4 === 1,
        concat(lit("HTTPS://EXAMPLE.COM:443/article/"), n, lit("?a=1&b=2#frag")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("https://www.example.com/article/"), n,
          lit("?a=1&utm_source=x&b=2")))
      .otherwise(concat(lit("http://example.com:80/item/"), n, lit("/")))
    documents(s, d).select(col("doc_id"), url.as("url"))
      .urlCanonicalDedup("doc_id", "url")
      .select(col("doc_id"), col("url_norm"))
      .orderBy(col("doc_id"))
  }

  /** Temperature-scaled (alpha = 0.5) language rebalancing at a
    * 200-row budget: sqrt shares, decimal-exact denominator,
    * Knuth-hash selection — full hash oracle. */
  def temperatureQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.SampleOps._
    documents(s, d)
      .temperatureMixture("lang", "doc_id", alphaQuarters = 2, budget = 200L)
      .select(col("doc_id"), col("lang"), col("samp_rate"))
      .orderBy(col("doc_id"))
  }

  /** DSIR-style importance weights toward the English slice: exact
    * integer LM counts, fixed-shape smoothed ratios, decimal-exact
    * per-doc sum — full hash oracle. */
  def importanceQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d).importanceWeights("doc_id", "text", col("lang") === "en")
      .orderBy(col("doc_id"))
  }

  /** BPE tokenizer-training pair statistics: the 50 most frequent
    * adjacent character pairs weighted by word frequency — integer
    * counts end to end with a lexicographic tie-break at the cut, so
    * the oracle replays the exact topN set. */
  def bpePairsQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d).bpePairStats("text", topN = 50)
      .orderBy(col("lhs"), col("rhs"))
  }

  /** Deterministic sequence packing into 2048-token bins per source
    * shard: exclusive prefix sum of whitespace token counts in doc_id
    * order, integral division by the capacity — integer arithmetic end
    * to end, replayed exactly by the window-function oracle. */
  def sequencePackQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d)
      .sequencePack("source", "doc_id", tokenCount(col("text")), capacity = 2048L)
      .select(col("source"), col("doc_id"), col("tok_count"),
        col("cum_tokens"), col("bin"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Corpus-wide sequence packing over the single (source, doc_id)
    * ordering — bins span source boundaries. The Spark side runs the
    * decomposed two-pass scan (bounded within-bucket windows + tiny
    * offset tables; bucketWidth=64 so sf0.01 genuinely exercises the
    * multi-bucket recombination); the oracle replays it as ONE plain
    * global window sum — the two must agree bit-exactly. */
  def sequencePackGlobalQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d)
      .sequencePackGlobal("source", "doc_id", tokenCount(col("text")),
        capacity = 2048L, bucketWidth = 64L)
      .orderBy(col("source"), col("doc_id"))
  }

  /** Winnowing fingerprints (MOSS): distinct window-min md5 gram
    * hashes per document — substring-robust fingerprinting. The hash
    * is the md5 hex STRING and the window min is lexicographic, so the
    * oracle needs no custom hash kernel: both engines compute identical
    * md5 hex and compare ASCII identically. */
  /** Content-defined chunking contract (functions.cdcChunks): per doc,
    * the rolling-hash chunks must concatenate back to the text exactly,
    * every non-last chunk lands in [minSize, maxSize], and the last is
    * <= maxSize — verified engine-side (boundary positions are
    * hash-private), the verdict-row pattern. The insertion-robustness
    * property is spec-pinned (suffix chunks realign after a prefix
    * edit). */
  def cdcChunksQ(s: SparkSession, d: String): DataFrame = {
    import graft.functions.cdcChunks
    documents(s, d)
      .select(col("doc_id"), col("text"), cdcChunks(col("text")).as("__ch"))
      .select(col("doc_id"),
        (concat_ws("", col("__ch")) === col("text")).as("reassembles"),
        (size(filter(
          slice(col("__ch"), lit(1), greatest(size(col("__ch")) - 1, lit(0))),
          c => length(c) < 64 || length(c) > 1024)) === 0).as("sizes_ok"),
        (size(col("__ch")) === 0 ||
          length(element_at(col("__ch"), -1)) <= 1024).as("last_ok"))
      .orderBy(col("doc_id"))
  }

  def winnowQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d).winnowFingerprints("doc_id", "text", n = 4, w = 4)
      .orderBy(col("doc_id"), col("fingerprint"))
  }

  /** Substring-level near-dup candidates: pairs sharing >= 2 winnowing
    * fingerprints — what suffix-array substring dedup would surface,
    * as a fingerprint equi-join. */
  def winnowPairsQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d).winnowPairs("doc_id", "text", n = 4, w = 4, minShared = 2L)
      .orderBy(col("id1"), col("id2"))
  }

  /** Context-window token chunking: 64-token chunks, stride 48 —
    * per-doc explode, replayed exactly via generate_series + list
    * slicing. */
  def tokenChunksQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d).tokenChunks("doc_id", "text", size = 64, stride = 48)
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Deterministic mixture sampling over the corpus: per-language keep
    * rates applied through the engine-portable Knuth-hash fraction
    * (SampleOps.mixtureSample), so DuckDB replays the exact kept set —
    * the language-rebalancing stage of a training-data pipeline as a
    * full hash oracle. */
  def mixtureSampleQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.SampleOps._
    documents(s, d)
      .mixtureSample("lang", "doc_id",
        Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25, "es" -> 0.1))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Exact-size stratified sample (SampleOps.stratifiedSample):
    * exactly min(40, n_lang) docs per language, uniform by the Knuth
    * hash order — the fixed-budget eval-set draw. Replays as a plain
    * window rank over the same integer hash fold. */
  def stratifiedSampleQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.SampleOps._
    documents(s, d)
      .stratifiedSample("lang", "doc_id", 40)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic per-group cap: top 50 docs per language by
    * (n_chars desc, doc_id) — the runaway-source capping stage
    * (SampleOps.groupCap); plain window SQL for DuckDB. */
  def groupCapQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.SampleOps._
    documents(s, d)
      .groupCap("lang", 50, Seq(col("n_chars").desc, col("doc_id").asc))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic epoch-1 shuffle of the corpus into 8 training
    * shards (SampleOps.epochShuffle): shard = top bits of the
    * epoch-offset Knuth hash, pos = within-shard hash rank. Pure
    * integer arithmetic on the repo's ONE portable hash, so DuckDB
    * replays the full (shard, pos) permutation bit-for-bit. */
  def epochShuffleQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.SampleOps._
    documents(s, d)
      .epochShuffle("doc_id", epoch = 1, numShards = 8)
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("doc_id"))
  }

  /** Exact corpus-wide heavy 3-grams (>= 4 occurrences) behind the
    * count-sketch prefilter (CorpusOps.heavyNgrams). The sketch only
    * routes work — the output is the exact heavy set, so the oracle is
    * the plain explode + GROUP BY + HAVING. */
  def heavyNgramsQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d).heavyNgrams("text", n = 3, minCount = 4L)
      .orderBy(col("gram"))
  }

  /** Quality-stratified selection: keep the top 25% of every source by
    * (token count desc, doc_id) — SampleOps.groupTopFraction. 0.25 is
    * an exact binary fraction, so the ceil bound replays exactly. */
  def groupTopFractionQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.SampleOps._
    documents(s, d)
      .groupTopFraction("source", 0.25,
        Seq(graft.functions.tokenCount(col("text")).desc, col("doc_id").asc))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** SimHash near-dup pairs. Pigeonhole blocking with maxHamming < blocks
    * is COMPLETE (3 differing bits cannot touch all 4 blocks), so the
    * result is exactly every pair at Hamming distance <= 3 — which makes
    * the operator fully DuckDB-replayable: the oracle refolds the
    * splitmix64 token hashes and the per-bit majority vote in HUGEINT
    * modular arithmetic (recursive-CTE fold over distinct tokens) and
    * joins all pairs under the same Hamming bound. */
  def simHashPairsQ(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .simHashPairs("doc_id", "text", blocks = 4, maxHamming = 3)
      .orderBy(col("id1"), col("id2"))

  /** Blocking key: (lang, bit-length of n_chars) — a geometric length
    * bucket computed in exact integer arithmetic so Spark and DuckDB
    * agree bit-for-bit (no float log at bucket boundaries). Near-dups at
    * threshold 0.8 have near-equal sizes, so same-bucket is the declared
    * candidate semantics (standard blocking tradeoff: pairs straddling a
    * power-of-2 size boundary are not candidates). Blocking by lang
    * alone is O(n²) in the dominant language — the full cross product on
    * a monolingual corpus. */
  def ngramJaccardPairsQ(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .ngramJaccardPairs("doc_id", "text",
        blockBy = Seq(col("lang"),
          length(conv(col("n_chars").cast("string"), 10, 2))),
        n = 3, threshold = 0.8)
      .orderBy(col("id1"), col("id2"))

  /** Embedding near-dup, emitted as an aggregate contract verdict (the
    * sp_zknn_check pattern): the LSH-banded candidate SET is
    * engine-specific (hyperplane sketches), so the pair list cannot be
    * replayed in SQL — but its precision contract can: every returned
    * pair is ordered (id1 < id2), scores at/above the threshold, and
    * carries a cosine bit-equal to an independent recompute via Spark's
    * higher-order array functions (different codepath than the codegen'd
    * kernel). Ordered + verified cos >= t together imply every pair is a
    * row of the exact similarity join (emb_sim_join, hash-anchored), so
    * precision is fully checked; recall is the declared LSH tradeoff,
    * covered by the recall spec. */
  def embNearDupQ(s: SparkSession, d: String): DataFrame = {
    val pairs = embeddings(s, d)
      .embeddingNearDupPairs("embedding", "vec_id", threshold = 0.3,
        planes = 16, bandBits = 4)
      .join(embeddings(s, d).select(col("vec_id").as("id1"),
        col("embedding").as("__v1")), Seq("id1"))
      .join(embeddings(s, d).select(col("vec_id").as("id2"),
        col("embedding").as("__v2")), Seq("id2"))
    pairs.agg(
      (sum(when(col("id1") < col("id2"), 0).otherwise(1)) === 0).as("all_ordered"),
      (sum(when(col("cos") >= 0.3, 0).otherwise(1)) === 0).as("all_above_threshold"),
      (sum(when(col("cos") === cosHofCol(col("__v1"), col("__v2")), 0).otherwise(1)) === 0)
        .as("all_cos_exact"),
      (count(lit(1)) > 0).as("nonempty"))
  }

  /** Near-dup clustering: connected components over the deterministic
    * n-gram pair list (min reachable id per doc; unpaired docs are
    * singleton components) — the step after pair generation in a real
    * dedup pipeline, so "keep one doc per cluster" is one `min_by`
    * away. Deterministic edges -> recursive-CTE oracle. */
  def componentsQ(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val pairs = docs.ngramJaccardPairs("doc_id", "text",
      blockBy = Seq(col("lang"),
        length(conv(col("n_chars").cast("string"), 10, 2))),
      n = 3, threshold = 0.8)
    docs.nearDupComponents("doc_id", pairs).orderBy(col("doc_id"))
  }

  /** Incremental component extension: the corpus's labeling is FROZEN
    * (ingest never re-pairs the corpus against itself), the wave's
    * cross + internal pairs extend it via star edges
    * ([[graft.operators.DedupOps.extendComponents]]), and the verdict
    * row pins engine-side equality with the full from-scratch
    * labeling over the unioned edge list. */
  def componentsExtendQ(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val wave = docs.filter(col("doc_id") % 10 === 0)
    val corpusPairs = corpus.minHashPairs("doc_id", "text", threshold = 0.8)
      .select(col("id1"), col("id2"))
    val labels = corpus.nearDupComponents("doc_id", corpusPairs)
    val cross = wave.minHashPairsAgainst(corpus, "doc_id", "text",
      threshold = 0.8)
      .select(col("id_new").as("id1"), col("id_corpus").as("id2"))
    val inner = wave.minHashPairs("doc_id", "text", threshold = 0.8)
      .select(col("id1"), col("id2"))
    val wavePairs = cross.unionByName(inner)
    // new docs enter as their own singleton components, then the wave's
    // pairs merge them in — the admit-wave shape
    val seeded = labels.unionByName(
      wave.select(col("doc_id"), col("doc_id").as("component")))
    val extended = graft.operators.DedupOps
      .extendComponents(seeded, wavePairs, "doc_id")
    val full = docs.nearDupComponents("doc_id",
      corpusPairs.unionByName(wavePairs))
    extended.select(col("doc_id"), col("component").as("__ce"))
      .join(full.select(col("doc_id"), col("component").as("__cf")),
        Seq("doc_id"), "full_outer")
      .agg(
        (sum(when(col("__ce") === col("__cf"), 0).otherwise(1)) === 0)
          .as("extend_equals_full"),
        (count(lit(1)) > 0).as("nonempty"),
        (sum(when(col("__ce") =!= col("doc_id"), 1).otherwise(0)) > 0)
          .as("merges_present"))
  }

  /** DELETE maintenance for near-dup components
    * ([[DedupOps.shrinkComponents]]): purge a third of the corpus and
    * only the components that lost a member recompute — the verdict
    * row pins bit-equality with the full recompute over the surviving
    * pairs, plus that at least one component actually SPLIT (the
    * fixture's planted chains guarantee a removed bridge). */
  def componentsShrinkQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d)
    // the corpus's planted dup clusters are CLIQUES (removing a member
    // never disconnects one), so a split needs a planted BRIDGE: the
    // chain 1-3-4 whose middle doc (3, a % 3 == 0 id) gets deleted
    val pairs = docs.minHashPairs("doc_id", "text", threshold = 0.8)
      .select(col("id1"), col("id2"))
      .unionByName(Seq((1L, 3L), (3L, 4L)).toDF("id1", "id2"))
      .localCheckpoint()
    val labels = docs.nearDupComponents("doc_id", pairs).localCheckpoint()
    val del = docs.filter(col("doc_id") % 3 === 0).select(col("doc_id"))
    val shrunk = graft.operators.DedupOps
      .shrinkComponents(labels, pairs, "doc_id", del).localCheckpoint()
    val survPairs = pairs
      .join(del.select(col("doc_id").as("id1")), Seq("id1"), "left_anti")
      .join(del.select(col("doc_id").as("id2")), Seq("id2"), "left_anti")
    val full = docs.join(del, Seq("doc_id"), "left_anti")
      .nearDupComponents("doc_id", survPairs)
    // splits: each pre-delete component with survivors yields >= 1 new
    // component; strictly more means a removed bridge split one
    val nOldSurviving = labels.join(del, Seq("doc_id"), "left_anti")
      .select(col("component")).distinct().count()
    val nAfter = shrunk.select(col("component")).distinct().count()
    shrunk.select(col("doc_id"), col("component").as("__cs"))
      .join(full.select(col("doc_id"), col("component").as("__cf")),
        Seq("doc_id"), "full_outer")
      .agg(
        (sum(when(col("__cs") === col("__cf"), 0).otherwise(1)) === 0)
          .as("shrink_equals_full"),
        (count(lit(1)) > 0).as("nonempty"),
        lit(nAfter > nOldSurviving).as("splits_present"))
  }

  /** Leakage-free split (SampleOps.leakageFreeSplit): every doc takes
    * its near-dup COMPONENT's split, so duplicate clusters never
    * straddle train/test. Same deterministic pair list as
    * dd_components; same hash CASE as pp_split_assign, keyed on the
    * component label. */
  def leakageFreeSplitQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.SampleOps._
    import graft.operators.DedupOps._
    val docs = documents(s, d)
    val pairs = docs.ngramJaccardPairs("doc_id", "text",
      blockBy = Seq(col("lang"),
        length(conv(col("n_chars").cast("string"), 10, 2))),
      n = 3, threshold = 0.8)
    docs.leakageFreeSplit("doc_id", pairs,
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .orderBy(col("doc_id"))
  }

  /** Deterministic negative mining (SampleOps.mineNegatives): 3
    * hash-bucket-circular negatives per doc over 16 buckets — integer
    * window arithmetic end to end, fully replayed. */
  def mineNegativesQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.SampleOps._
    documents(s, d).mineNegatives("doc_id", k = 3, buckets = 16)
      .orderBy(col("doc_id"), col("j"))
  }

  /** Near-dup retention: components over the deterministic n-gram
    * pairs, then keep each component's best member by (quality DESC,
    * doc_id ASC) — the "dedup keeps the best copy" policy, fully
    * oracled because quality doubles are bit-equal across engines. */
  def keepBestQ(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val pairs = docs.ngramJaccardPairs("doc_id", "text",
      blockBy = Seq(col("lang"),
        length(conv(col("n_chars").cast("string"), 10, 2))),
      n = 3, threshold = 0.8)
    val comps = docs.nearDupComponents("doc_id", pairs)
    docs.select(col("doc_id"), qualityScore(col("text")).as("quality"))
      .dedupKeepBest("doc_id", comps,
        Seq(col("quality").desc, col("doc_id").asc))
      .select(col("doc_id"), col("component"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** The canonical curation chain end-to-end — exact dedup, then quality
    * and length gates, emitting per-doc stats: the composition a training
    * -data pipeline actually runs, fully oracled because every stage is
    * deterministic and the quality/token kernels have exact SQL mirrors
    * (hash-matched by tx_stats). One digest shuffle + codegen'd scalar
    * gates — no extra shuffle beyond the dedup itself. */
  def curationPipelineQ(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .exactDedup("text", "doc_id")
      .filter(qualityScore(col("text")) >= 0.63 &&
        tokenCount(col("text")).between(25, 5000))
      .select(col("doc_id"), col("lang"),
        tokenCount(col("text")).as("n_tokens"),
        qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  /** PII redaction over a deterministically dirtied corpus: the raw
    * documents carry no emails/URLs/phones (verified), so every 3rd doc
    * gets a synthetic contact line appended — both engines replay the
    * SAME injection, then the SAME email→URL→phone redaction chain, so
    * the whole op is hash-checked with real matches (the patterns are
    * restricted to Java-regex ∩ RE2 syntax on purpose). */
  def redactQ(s: SparkSession, d: String): DataFrame = {
    val dirty = documents(s, d).withColumn("text",
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or https://ex.org/d/"), col("doc_id"),
          lit(" tel 555-867-530"), col("doc_id") % 10))
        .otherwise(col("text")))
    dirty.select(col("doc_id"),
        graft.functions.redactPii(col("text")).as("red_text"))
      .orderBy(col("doc_id"))
  }

  /** Symmetric max-abs int8 quantization of the embeddings table — the
    * storage-path op (4x smaller vectors). floor-of-shifted instead of
    * round() keeps the arithmetic dialect-portable -> full hash oracle;
    * the int array rides as a joined string (the q21 array precedent —
    * the compare harness hashes scalars). */
  def quantizeQ(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).quantizeInt8("embedding", "vec_id")
      .select(col("vec_id"), col("scale"),
        array_join(col("q"), ",").as("q_csv"))
      .orderBy(col("vec_id"))

  /** Top-2 principal components (VectorOps.principalComponents):
    * integer-quantized Gram matrix (exact, order-independent), 8
    * pinned-fold power-iteration rounds, λ-deflation, 8 more rounds,
    * then one shuffle-free projection per component. Every double
    * replays bit-for-bit via the unrolled-CTE oracle. */
  def principalComponentQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.VectorOps._
    embeddings(s, d).principalComponents("embedding", "vec_id", k = 2)
      .orderBy(col("vec_id"))
  }

  /** The emb_pca oracle: quantize -> exact HUGEINT Gram (upper
    * triangle, mirrored) -> 8 unrolled power-iteration CTE pairs
    * (matvec in b-order, norm in a-order, the pinned driver folds) ->
    * λ = v8ᵀ(G·v8) -> deflated matrix gr2 (λ·v(a)·v(b)
    * left-associated) -> 8 more rounds -> the same list_sum
    * projection per component. Built by loop because the iteration
    * count is the only thing that varies. */
  private def pcaSql: String = {
    // MATERIALIZED is load-bearing: DuckDB inlines CTEs by default, and
    // the deflated chain references the first chain several times — the
    // Gram aggregation would re-evaluate per reference (minutes instead
    // of half a second). Lambdas may not contain subqueries, hence the
    // gr2a hoist of λ and v8(a) into plain row columns.
    def rounds(n: Int, mat: String, mp: String, vp: String, v0: String) =
      (1 to n).map { k =>
        val prev = if (k == 1) v0 else s"$vp${k - 1}"
        // the zero-norm CASE mirrors the driver's degenerate branch
        // (zero vector, which then propagates through every remaining
        // round and zeroes the deflation term — identical semantics)
        s"""$mp$k AS MATERIALIZED (
           |  SELECT a, list_sum(list_transform(
           |    list_zip(grow, (SELECT v FROM $prev)), x -> x[1] * x[2])) AS mv
           |  FROM $mat),
           |$vp$k AS MATERIALIZED (
           |  SELECT list_transform(l, x -> CASE
           |      WHEN list_sum(list_transform(l, y -> y * y)) = 0 THEN 0.0
           |      ELSE x / sqrt(list_sum(list_transform(l, y -> y * y))) END) AS v
           |  FROM (SELECT list(mv ORDER BY a) AS l FROM $mp$k))""".stripMargin
      }.mkString(",\n")
    s"""WITH qv AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 65536.0) AS BIGINT)) AS q
       |  FROM embeddings),
       |idx AS MATERIALIZED (SELECT unnest(range(0,
       |  (SELECT max(len(embedding)) FROM embeddings))) AS i),
       |gu AS MATERIALIZED (
       |  SELECT ia.i AS a, ib.i AS b,
       |    CAST(SUM(CAST(q[ia.i + 1] AS HUGEINT) * q[ib.i + 1]) AS DOUBLE) AS gv
       |  FROM qv, idx ia, idx ib
       |  WHERE ib.i >= ia.i
       |  GROUP BY ia.i, ib.i),
       |gf AS (SELECT a, b, gv FROM gu
       |       UNION ALL SELECT b AS a, a AS b, gv FROM gu WHERE a <> b),
       |gr AS MATERIALIZED (SELECT a, list(gv ORDER BY b) AS grow FROM gf GROUP BY a),
       |v0 AS (SELECT list(1.0 ORDER BY i) AS v FROM idx),
       |${rounds(8, "gr", "m", "v", "v0")},
       |mf AS MATERIALIZED (
       |  SELECT a, list_sum(list_transform(
       |    list_zip(grow, (SELECT v FROM v8)), x -> x[1] * x[2])) AS mv
       |  FROM gr),
       |lam AS MATERIALIZED (
       |  SELECT list_sum(list_transform(
       |    list_zip((SELECT v FROM v8), l), x -> x[1] * x[2])) AS lm
       |  FROM (SELECT list(mv ORDER BY a) AS l FROM mf)),
       |gr2a AS (
       |  SELECT gr.a AS a, gr.grow AS grow, vv.v AS pv, lam.lm AS lm,
       |    list_extract(vv.v, gr.a + 1) AS va
       |  FROM gr, (SELECT v FROM v8) vv, lam),
       |gr2 AS MATERIALIZED (
       |  SELECT a, list_transform(list_zip(grow, pv),
       |    x -> x[1] - lm * va * x[2]) AS grow
       |  FROM gr2a),
       |${rounds(8, "gr2", "w", "u", "v0")}
       |SELECT e.vec_id,
       |  list_sum(list_transform(list_zip(e.embedding, (SELECT v FROM v8)),
       |    x -> CAST(x[1] AS DOUBLE) * x[2])) AS pc1,
       |  list_sum(list_transform(list_zip(e.embedding, (SELECT v FROM u8)),
       |    x -> CAST(x[1] AS DOUBLE) * x[2])) AS pc2
       |FROM embeddings e ORDER BY e.vec_id""".stripMargin
  }

  /** JL sign random projection (functions.signProject): embeddings
    * down to 8 hashed ±1 coordinates, exploded to scalar rows for the
    * exact-double compare. The fold order matches list_sum, so every
    * coordinate replays bit-for-bit. */
  def randomProjectQ(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"),
        posexplode(graft.functions.signProject(col("embedding"), 8))
          .as(Seq("dim", "value")))
      .orderBy(col("vec_id"), col("dim"))

  // ---- text analysis ----

  def textStatsQ(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      stopwordRatio(col("text")).as("stop_ratio"),
      distinctTokenRatio(col("text")).as("distinct_ratio"),
      qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  /** Within-document repetition score: fraction of duplicated word
    * 3-grams (graft.functions.repetitionRatio) — the repetitive-
    * boilerplate quality signal; identical IEEE expression shape in the
    * DuckDB replay, so scores hash-match bit for bit. */
  def repetitionQ(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      graft.functions.repetitionRatio(col("text"), 3).as("rep_ratio"))
      .orderBy(col("doc_id"))

  /** Whitespace vs BPE-ish token counts side by side. */
  def tokenCountsQ(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_ws_tokens"),
      bpeTokenCount(col("text")).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  /** Language-id guess + content fingerprint per doc. Both kernels are
    * deterministic arithmetic over the character stream, and the test
    * corpus is ASCII-only (verified; CJK-script branch never fires), so
    * the DuckDB oracle replays them exactly: the FNV-1a-style rolling
    * hash as a list_reduce fold in HUGEINT modular arithmetic, and the
    * function-word profile argmax (first profile attaining the max, 0
    * hits -> 'und') as a greatest() CASE. */
  def langIdQ(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"), col("lang"),
      langId(col("text")).as("lang_guess"),
      fingerprint64(col("text")).as("fp64"))
      .orderBy(col("doc_id"))

  /** Cross-corpus repeated-passage removal (CorpusOps.passageDedup):
    * 20-word passages, global first occurrence by (doc_id, position)
    * survives, documents reassembled. Fully replayed in DuckDB (the
    * dedup key is md5 in both engines). */
  def passageDedupQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d).passageDedup("doc_id", "text", width = 20)
      .orderBy(col("doc_id"))
  }

  /** Word-order typicality (CorpusOps.bigramScore): pooled corpus
    * bigram-to-unigram evidence ratio — exact integer sums, one final
    * division, bit-replayable. */
  def bigramQualityQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d).bigramScore("doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Fixed ordered merge list for the BPE-encode query and its oracle —
    * chosen to exercise chained merges (spark/the/join/data collapse to
    * single tokens through 3–4 dependent ranks) over this corpus's
    * vocabulary. The operator takes ANY list (e.g. from
    * CorpusOps.learnBpeMerges); the QUERY pins a literal one so the
    * DuckDB replay can apply the identical ranks. */
  private[graft] val bpeMerges: Seq[(String, String)] = Seq(
    "s" -> "p", "sp" -> "a", "spa" -> "r", "spar" -> "k",
    "t" -> "h", "th" -> "e",
    "j" -> "o", "jo" -> "i", "joi" -> "n",
    "d" -> "a", "da" -> "t", "dat" -> "a",
    "e" -> "r", "o" -> "r")

  /** BPE apply (CorpusOps.bpeEncode) under [[bpeMerges]]: per-document
    * whitespace vs BPE token counts plus the first 8 BPE tokens. The
    * encode kernel is a replace-chain, replayed verbatim in DuckDB. */
  def bpeEncodeQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    val docs = documents(s, d)
    val bpe = docs.bpeEncode("text", bpeMerges)
    docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_ws_tokens"),
      size(bpe).cast("long").as("n_bpe_tokens"),
      array_join(slice(bpe, 1, 8), " ").as("bpe_head"))
      .orderBy(col("doc_id"))
  }

  /** Fixed-point integer PageRank (GraphOps.pageRank) over the
    * supplier->part purchase graph (part keys offset to disjoint node
    * ids): 3 iterations, damping 17/20, uniform dangling redistribution
    * — every part is dangling, so the correction path is exercised on
    * real data. All-long arithmetic, bit-replayed by 3 unrolled
    * iterations in DuckDB. */
  def pageRankQ(s: SparkSession, d: String): DataFrame = {
    val e = lineitem(s, d)
      .select(col("l_suppkey").as("src"),
        (col("l_partkey") + 1000000000L).as("dst"))
      .distinct()
    graft.operators.GraphOps.pageRank(e, "src", "dst", iters = 3)
      .orderBy(col("rank").desc, col("node").asc)
      .limit(50)
  }

  /** Per-node triangle counts (GraphOps.triangleCounts) over the part
    * co-occurrence graph — parts are linked when some order contains
    * both. The within-order pair join is bounded by the per-order item
    * count (≤ 7), so edge construction is itself scale-safe. Integer
    * counts end to end, fully replayed. */
  def triangleCountsQ(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.as("x").join(li.as("y"), Seq("ok"))
      .filter(col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("src"), col("y.pk").as("dst"))
    graft.operators.GraphOps.triangleCounts(e, "src", "dst")
      .orderBy(col("node"))
  }

  /** Inverted-index export (CorpusOps.invertedIndex): per-term df /
    * total tf over the whole corpus plus a 20-entry capped posting
    * string — exact stats, bounded export. Integer/string exact,
    * fully replayed. */
  def invertedIndexQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d).invertedIndex("doc_id", "text", maxPostings = 20)
      .orderBy(col("term"))
  }

  /** Text normalization + exact dedup (functions.normalizeText +
    * DedupOps.exactDedup): injected case/punct/spacing variants
    * collapse onto their source doc and the min-id copy survives.
    * String-exact, fully replayed. */
  def normalizedDedupQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.DedupOps._
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    val variants = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("  "), upper(col("text")), lit(" !!!")).as("text"))
    docs.unionByName(variants)
      .withColumn("text_norm", graft.functions.normalizeText(col("text")))
      .exactDedup("text_norm", "doc_id")
      .select(col("doc_id"), col("text_norm"))
      .orderBy(col("doc_id"))
  }

  /** Hash-sharded export round trip (CorpusOps.writeSharded): the
    * corpus writes to a shard-partitioned temp directory and the
    * manifest read BACK from the files answers to a DuckDB replay of
    * the shard hash — verifying the write path end to end. */
  def writeShardedQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    val out = java.nio.file.Files.createTempDirectory("graft_shards")
    out.toFile.deleteOnExit()
    documents(s, d).select(col("doc_id"), col("text"))
      .writeSharded(out.toString, "doc_id", shards = 8)
      .orderBy(col("shard"))
  }

  /** Collocation lexicon (CorpusOps.collocations): top-40 adjacent
    * pairs by lift among pairs seen ≥5 times — exact integer counts,
    * one pinned-shape double lift, fully replayed. */
  def collocationsQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d).collocations("text", minCount = 5, topN = 40)
      .orderBy(col("lift").desc, col("w1").asc, col("w2").asc)
  }

  /** Exact repeated-span dedup (DedupOps.dedupRepeatedSpans): every
    * duplicated ≥8-word run keeps its lowest-(doc,pos) occurrence,
    * all other copies cut. Injected duplicate tails force real
    * removals. Integer/string-exact, fully replayed. */
  def dedupRepeatedSpansQ(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    // plant cross-doc duplication: docs ≡ 3 (mod 19) append the first
    // 12 tokens of the PREVIOUS doc — a run only span dedup catches
    val donors = docs
      .select((col("doc_id") + 1L).as("doc_id"),
        concat_ws(" ", slice(graft.functions.tokens(col("text")), 1, 12))
          .as("__tail"))
    val fixture = docs.join(donors, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 19 === 3 && col("__tail").isNotNull &&
            col("__tail") =!= "",
          concat(col("text"), lit(" "), col("__tail")))
          .otherwise(col("text")).as("text"))
    graft.operators.DedupOps.dedupRepeatedSpans(fixture, "doc_id", "text", n = 8)
      .orderBy(col("doc_id"))
  }

  /** TF-IDF doc-term export (CorpusOps.tfidfVectors) over a bounded
    * doc slice; integer tf/df, one pinned-shape double weight. */
  def tfidfQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d).filter(col("doc_id") < 300)
      .tfidfVectors("doc_id", "text")
      .orderBy(col("doc_id"), col("term"))
  }

  /** Shuffle-key skew diagnostics (StatsOps.keyStats): the 20 heaviest
    * lineitem supplier keys with exact counts, shares, and skew
    * factors. Integer counts + pinned-shape double divisions. */
  def keyStatsQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.StatsOps._
    lineitem(s, d).keyStats("l_suppkey", topN = 20)
      .orderBy(col("cnt").desc, col("l_suppkey").asc)
  }

  /** Snapshot delta audit (CorpusOps.snapshotDiff): a deterministic
    * mutation of the corpus (drop %11, edit %13, add %17 under new
    * ids) diffed against the original — every id classified
    * added/removed/changed/unchanged by content digest. */
  def snapshotDiffQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    val old = documents(s, d).select(col("doc_id"), col("text"))
    val newV = old.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionByName(old.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    newV.snapshotDiff(old, "doc_id", "text").orderBy(col("doc_id"))
  }

  /** Vocabulary build + id encoding (CorpusOps.vocabEncode): top-1000
    * tokens by (count DESC, token ASC), ids 1..1000, OOV -> 0; per-doc
    * counts plus the first 10 ids. Integer-exact, fully replayed. */
  def vocabEncodeQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d).vocabEncode("doc_id", "text", vocabSize = 1000)
      .select(col("doc_id"),
        col("n_tokens"), col("n_unk"),
        concat_ws(",", slice(col("ids"), 1, 10)).as("ids_head"))
      .orderBy(col("doc_id"))
  }

  /** Surgical span decontamination (DedupOps.decontaminateSpans): the
    * redaction counterpart of pp_contamination — matched eval 8-gram
    * windows are cut out of each corpus document instead of flagging
    * the whole document; untouched docs pass through. Same %7 split as
    * the flagging sweep; integer/string-exact, fully replayed. */
  def decontaminateSpansQ(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    graft.operators.DedupOps.decontaminateSpans(
      docs.filter(col("doc_id") % 7 =!= 0),
      broadcast(docs.filter(col("doc_id") % 7 === 0)),
      "doc_id", "text", "text", n = 8)
      .orderBy(col("doc_id"))
  }

  // ---- embedding similarity search ----

  private def queryVec(s: SparkSession, d: String): Array[Float] =
    embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  def annBruteTopKQ(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .cosineTopK("embedding", "vec_id", queryVec(s, d), 10)
      .select(col("vec_id"), col("cos"))
      .orderBy(col("vec_id"))

  /** Independent cosine recompute via Spark's built-in higher-order
    * array functions — a different codepath from the codegen'd
    * `cosineSimilarity` kernel, with the same sequential double
    * accumulation and the same `dot / (sqrt(na) * sqrt(nb))` final
    * expression, so agreement is bit-exact and meaningful. */
  private[queries] def cosHofCol(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b,
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)
    val na = aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val nb = aggregate(b, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    dot / (sqrt(na) * sqrt(nb))
  }

  /** LSH ANN, emitted as contract rows (the sp_zknn_check pattern): the
    * candidate set depends on engine-private hyperplane sketches, so the
    * DuckDB-checkable CONTRACT sticks to the properties that hold at
    * EVERY corpus size — exactly k rows ranked 1..k, rank 1 is the
    * query vector itself (it shares every band with itself, and a
    * unit-self cosine dominates), and every emitted cosine bit-equal to
    * the independent HOF recompute. Recall against the exact top-k (the
    * LSH tradeoff, corpus-size-dependent — a fixed membership bound
    * like the old "inside exact top-2k" provably flakes at sf0.001) is
    * pinned by the ScalaTest oracle on fixed data instead, the same
    * split as dd_minhash_pairs. */
  def annLshTopKQ(s: SparkSession, d: String): DataFrame = {
    val k = 10
    val q = queryVec(s, d)
    val ann = embeddings(s, d)
      .cosineTopKLsh("embedding", "vec_id", q, k, planes = 16, bandBits = 4)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cos").desc, col("vec_id").asc)
    ann.withColumn("rank", row_number().over(w))
      .select(col("rank"),
        (col("rank") =!= 1 || col("vec_id") === 0).as("top1_is_query"),
        (col("cos") === cosHofCol(col("embedding"), lit(q))).as("cos_exact"))
      .orderBy(col("rank"))
  }

  /** IVF ANN — fully DuckDB-hash-matched: the centroid sampler is plain
    * integer arithmetic (VectorOps.centroidOrder), so the oracle replays
    * the whole pipeline (centroids -> argmax-cosine cells -> probe
    * choice -> exact top-k in probed cells) row-for-row. */
  def annIvfTopKQ(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .cosineTopKIvf("embedding", "vec_id", queryVec(s, d), 10,
        nlist = 16, nprobe = 4)
      .select(col("vec_id"), col("cos"))
      .orderBy(col("vec_id"))

  /** Exact vector kNN join (pivot algorithm): 3 nearest embeddings per
    * embedding by L2. */
  def embKnnJoinQ(s: SparkSession, d: String): DataFrame = {
    val left = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val right = embeddings(s, d).select(
      col("vec_id").as("vec_id2"), col("embedding").as("embedding2"))
    left.knnJoinVec(right, "embedding", "embedding2", "vec_id", k = 3,
        tieBreak = Seq("vec_id2"))
      .select(col("vec_id"), col("vec_id2"), col("l2"))
      .orderBy(col("vec_id"), col("vec_id2"))
  }

  /** ANN over the IVF DISK layout: write partitioned-by-cell parquet,
    * probe only the nearest cell directories (rows-only: approximate by
    * probing; scores exact, pruning spec-proven). */
  def annIvfDiskQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.VectorOps
    // fixed per-sfDir path (mode=overwrite): repeated runs reuse one
    // directory instead of orphaning a fresh tempdir per invocation; the
    // result is lazy, so deleting after-the-fact is not an option here
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_ivf_q_" + Integer.toHexString(d.hashCode)).toString
    embeddings(s, d).writeIvf(path, "embedding", "vec_id", nlist = 16)
    VectorOps.readIvfTopK(s, path, "embedding", "vec_id", queryVec(s, d), 10, nprobe = 4)
      .select(col("vec_id"), col("cos"))
      .orderBy(col("vec_id"))
  }

  /** Delete-parity for the plain-IVF layout (the last at-rest layout
    * to gain the delete verb set): write from the full table, tombstone
    * every 7th id — including the query vector's own row, so the top-k
    * must survive losing its self-match — and read; the oracle is the
    * full IVF replay with the assignment restricted to survivors
    * (centroids stay the FULL table's sample: they were baked at write
    * time). */
  def annIvfDeleteQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.VectorOps
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_ivf_del_q_" + Integer.toHexString(d.hashCode)).toString
    val emb = embeddings(s, d)
    emb.writeIvf(path, "embedding", "vec_id", nlist = 16)
    VectorOps.deleteFromIvf(s, path,
      emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")), "vec_id")
    VectorOps.readIvfTopK(s, path, "embedding", "vec_id", queryVec(s, d),
        10, nprobe = 4)
      .select(col("vec_id"), col("cos"))
      .orderBy(col("vec_id"))
  }

  /** The fixed BM25 query-term set (mid-to-low document frequency mix
    * from the synthetic vocabulary) — shared by the query and the
    * oracle generator. */
  private val bm25Terms = Seq("spark", "vector", "window", "hash", "merge", "customer")

  private lazy val bm25TermSql = bm25Terms.zipWithIndex.map { case (t, i) =>
    s"""((st.n - st.df$i + 0.5) / (st.df$i + 0.5))
       |     * (len(list_filter(b.toks, t -> t = '$t')) * (CAST(1.2 AS DOUBLE) + 1.0))
       |     / (len(list_filter(b.toks, t -> t = '$t'))
       |        + CAST(1.2 AS DOUBLE) * ((1.0 - 0.75) + 0.75 * b.dl / st.avgdl))""".stripMargin
  }.mkString("\n   + ")

  private lazy val bm25DfSql = bm25Terms.zipWithIndex.map { case (t, i) =>
    s"""CAST(sum(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END) AS DOUBLE) AS df$i"""
  }.mkString(",\n    ")

  private def bm25CtesSqlFor(where: String) =
    s"""tk AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(trim(text), '\\s+'), q -> q != '') AS toks
       |  FROM documents$where),
       |base AS (SELECT doc_id, toks, len(toks) AS dl FROM tk),
       |st AS (SELECT
       |    CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(len(toks)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
       |    $bm25DfSql
       |  FROM tk)""".stripMargin

  private lazy val bm25CtesSql = bm25CtesSqlFor("")

  /** [[bm25OracleSql]] restricted to the docs surviving the
    * tx_bm25_delete fixture's tombstone wave (doc_id % 7 == 0 deleted):
    * the at-rest layout after write -> append -> delete must replay the
    * EXACT from-scratch scoring over the survivors. */
  private lazy val bm25DeleteOracleSql =
    s"""WITH ${bm25CtesSqlFor(" WHERE doc_id % 7 <> 0")}
       |SELECT doc_id, dl, score FROM (
       |  SELECT doc_id, dl, score FROM (
       |    SELECT b.doc_id, b.dl,
       |      $bm25TermSql AS score
       |    FROM base b, st) s
       |  WHERE score > 0
       |  ORDER BY score DESC, doc_id ASC LIMIT 20) t
       |ORDER BY doc_id""".stripMargin

  /** The reference BM25 semantics (top-20) — answered identically by
    * the from-scratch scorer and the at-rest index. */
  private lazy val bm25OracleSql =
    s"""WITH $bm25CtesSql
       |SELECT doc_id, dl, score FROM (
       |  SELECT doc_id, dl, score FROM (
       |    SELECT b.doc_id, b.dl,
       |      $bm25TermSql AS score
       |    FROM base b, st) s
       |  WHERE score > 0
       |  ORDER BY score DESC, doc_id ASC LIMIT 20) t
       |ORDER BY doc_id""".stripMargin

  /** The reference hybrid semantics (BM25 top-50 → cosine top-10) —
    * answered identically by the in-memory composition and the fully
    * at-rest (BM25 layout + IVF layout) form. */
  private lazy val hybridOracleSql =
    s"""WITH $bm25CtesSql,
       |cand AS (
       |  SELECT doc_id, score FROM (
       |    SELECT doc_id, score FROM (
       |      SELECT b.doc_id, b.dl,
       |        $bm25TermSql AS score
       |      FROM base b, st) s
       |    WHERE score > 0
       |    ORDER BY score DESC, doc_id ASC LIMIT 50) t),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       |SELECT doc_id, score, cos FROM (
       |  SELECT c.doc_id, c.score, ${cosSql("e.embedding", "q.qe")} AS cos
       |  FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id, q
       |  ORDER BY cos DESC, c.doc_id ASC LIMIT 10) t
       |ORDER BY doc_id""".stripMargin

  /** The at-rest BM25 index answering the SAME top-20 as tx_bm25:
    * postings + dictionary + constants persist once
    * (CorpusOps.writeBm25Index); the query reads only its terms'
    * posting rows. */
  def bm25IndexQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps
    import graft.operators.CorpusOps._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25_idx_" + Integer.toHexString(d.hashCode)).toString
    documents(s, d).writeBm25Index(path, "doc_id", "text")
    CorpusOps.bm25TopKAgainstIndex(s, path, bm25Terms, 20)
      .orderBy(col("doc_id"))
  }

  /** Query-SET BM25 retrieval off the same layout: three queries (one
    * with an absent term) score in ONE pruned posting read; per-(query,
    * doc) scores sum decimal-cast contributions, so the unordered SQL
    * sum replays them bit-for-bit. */
  def bm25QueryJoinQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps
    import graft.operators.CorpusOps._
    import s.implicits._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25_idx_" + Integer.toHexString(d.hashCode)).toString
    documents(s, d).writeBm25Index(path, "doc_id", "text")
    val queries = Seq(
      (1L, "spark"), (1L, "vector"), (1L, "window"),
      (2L, "customer"), (2L, "hash"),
      (3L, "merge"), (3L, "zzz_not_a_token")).toDF("qid", "term")
    CorpusOps.bm25TopKJoinAgainstIndex(s, path, queries, "qid", "term", 5)
  }

  /** Tombstone DELETES on the BM25 layout with a REAL oracle: even
    * docs write, odd docs append, every doc_id % 7 == 0 doc is deleted
    * ([[CorpusOps.deleteFromBm25Index]] — layout-derived negative df
    * rows, net constants in the meta, tombstones anti-joined at read);
    * the top-20 must equal DuckDB's from-scratch BM25 replay over the
    * SURVIVORS, bit for bit. */
  def bm25DeleteQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps
    import graft.operators.CorpusOps._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25_del_" + Integer.toHexString(d.hashCode)).toString
    val docs = documents(s, d)
    docs.filter(col("doc_id") % 2 === 0).writeBm25Index(path, "doc_id", "text")
    docs.filter(col("doc_id") % 2 =!= 0).appendBm25Index(path, "doc_id", "text")
    CorpusOps.deleteFromBm25Index(s, path,
      docs.filter(col("doc_id") % 7 === 0).select(col("doc_id")))
    CorpusOps.bm25TopKAgainstIndex(s, path, bm25Terms, 20)
      .orderBy(col("doc_id"))
  }

  /** The LOCATED BM25 delete under the same oracle: identical fixture
    * to tx_bm25_delete, but the purge wave carries the document TEXT
    * ([[CorpusOps.deleteFromBm25IndexWithText]] — df/dl deltas
    * recomputed from the wave's own tokenization, presence confirmed
    * through a term-pruned posting sliver, never the ids-only verb's
    * O(postings) semi-join). Same survivor SQL: the cheaper path must
    * answer bit-for-bit the same. */
  def bm25DeleteTextQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps
    import graft.operators.CorpusOps._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25_delt_" + Integer.toHexString(d.hashCode)).toString
    val docs = documents(s, d)
    docs.filter(col("doc_id") % 2 === 0).writeBm25Index(path, "doc_id", "text")
    docs.filter(col("doc_id") % 2 =!= 0).appendBm25Index(path, "doc_id", "text")
    CorpusOps.deleteFromBm25IndexWithText(s, path,
      docs.filter(col("doc_id") % 7 === 0).select(col("doc_id"), col("text")),
      "text")
    CorpusOps.bm25TopKAgainstIndex(s, path, bm25Terms, 20)
      .orderBy(col("doc_id"))
  }

  /** Conjunctive retrieval off the BM25 layout: docs containing ALL
    * query terms, from the terms' posting slivers alone — the boolean
    * candidate-generation primitive under filtered search. Real
    * oracle: the list_contains conjunction over raw text. */
  def matchAllQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps
    import graft.operators.CorpusOps._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25_idx_" + Integer.toHexString(d.hashCode)).toString
    documents(s, d).writeBm25Index(path, "doc_id", "text")
    CorpusOps.matchAllTermsAgainstIndex(s, path,
      Seq("spark", "hash", "customer"))
  }

  /** Quoted-phrase retrieval off the BM25 layout: conjunctive
    * candidates from the phrase terms' posting slivers, token-adjacency
    * confirm over ONLY the candidate docs via a pushed id IN — the
    * corpus is never scanned. Real oracle: boundary-safe padded-join
    * LIKE over the raw token stream. */
  def phraseIndexQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps
    import graft.operators.CorpusOps._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25_idx_" + Integer.toHexString(d.hashCode)).toString
    documents(s, d).writeBm25Index(path, "doc_id", "text")
    CorpusOps.phraseMatchAgainstIndex(s, path, documents(s, d), "text",
      Seq("the", "spark"))
  }

  /** Boolean phrase retrieval off the same at-rest BM25 layout:
    * ("the spark" OR "hash join") AND ("big table" OR customer) — OR
    * of multi-token phrases, OR mixing phrase and bare term, AND
    * composition, all candidates from one pruned posting sliver. */
  def phraseBoolQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps
    import graft.operators.CorpusOps._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25_idx_" + Integer.toHexString(d.hashCode)).toString
    documents(s, d).writeBm25Index(path, "doc_id", "text")
    CorpusOps.phraseBoolMatchAgainstIndex(s, path, documents(s, d), "text",
      Seq(Seq(Seq("the", "spark"), Seq("hash", "join")),
        Seq(Seq("big", "table"), Seq("customer"))))
  }

  /** Fully at-rest hybrid retrieval: BM25 stage off the postings
    * layout, cosine re-rank off the IVF-PQ layout's raw vectors via a
    * pushed id IN filter — neither stage touches the corpus. Same
    * oracle as tx_hybrid_retrieve. */
  def hybridIndexQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps
    import graft.operators.CorpusOps._
    val bmPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25_idx_" + Integer.toHexString(d.hashCode)).toString
    val ivfPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_hyb_ivf_" + Integer.toHexString(d.hashCode)).toString
    documents(s, d).writeBm25Index(bmPath, "doc_id", "text")
    embeddings(s, d).writeIvfPq(ivfPath, "embedding", "vec_id",
      nlist = 8, m = 4, ksub = 4, iters = 2)
    val q = embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    CorpusOps.hybridTopKAgainstIndex(s, bmPath, ivfPath, "vec_id",
      "embedding", bm25Terms, q, candidates = 50, k = 10)
      .orderBy(col("doc_id"))
  }

  /** Query-SET hybrid retrieval, both stages at rest: three queries'
    * BM25 candidates from one posting read, re-ranked by cosine against
    * each query's OWN embedding (vec_id 0/1/2) off the IVF-PQ layout's
    * raw vectors. */
  def hybridQueryJoinQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps
    import graft.operators.CorpusOps._
    import s.implicits._
    val bmPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bm25_idx_" + Integer.toHexString(d.hashCode)).toString
    val ivfPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_hyb_ivf_" + Integer.toHexString(d.hashCode)).toString
    documents(s, d).writeBm25Index(bmPath, "doc_id", "text")
    embeddings(s, d).writeIvfPq(ivfPath, "embedding", "vec_id",
      nlist = 8, m = 4, ksub = 4, iters = 2)
    val queries = Seq(
      (1L, "spark"), (1L, "vector"), (1L, "window"),
      (2L, "customer"), (2L, "hash"),
      (3L, "merge"), (3L, "scan")).toDF("qid", "term")
    val queryVecs = embeddings(s, d).filter(col("vec_id") < 3)
      .select((col("vec_id") + 1L).as("qid"), col("embedding").as("qv"))
    CorpusOps.hybridTopKJoinAgainstIndex(s, bmPath, ivfPath, queries,
      queryVecs, "qid", "term", "qv", "vec_id", "embedding",
      candidates = 20, k = 5)
  }

  /** BM25 top-20 keyword retrieval over documents (rational odds-ratio
    * idf — the log-free, hash-replayable form; CorpusOps.bm25TopK). */
  def bm25Q(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    documents(s, d)
      .bm25TopK("doc_id", "text", bm25Terms, k = 20)
      .orderBy(col("doc_id"))
  }

  /** Hybrid retrieval: BM25 top-50 lexical candidates re-ranked by
    * exact cosine against the query embedding (vec_id 0), top-10 out —
    * the two-stage RAG retrieval shape, fully DuckDB-replayed
    * (CorpusOps.hybridTopK). Embeddings link 1:1 by vec_id = doc_id. */
  def hybridRetrieveQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CorpusOps._
    val q = embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    documents(s, d).hybridTopK("doc_id", "text", bm25Terms,
      embeddings(s, d), "vec_id", "embedding", q, candidates = 50, k = 10)
      .orderBy(col("doc_id"))
  }

  /** Embedding-level decontamination (corpus %7!=0 vs eval %7==0 — the
    * same split as pp_contamination), emitted as contract verdicts: the
    * candidate set rides engine-private hyperplane sketches, so the
    * DuckDB-checkable contract is the dd_emb_near_dup pattern — every
    * emitted pair is corpus x eval, above threshold, with the kernel's
    * bit-exact cosine, and the sweep found something. */
  def semanticContaminationQ(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val corpus = emb.filter(col("vec_id") % 7 =!= 0)
    val eval_ = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("eval_id"), col("embedding").as("eval_emb"))
    val pairs = corpus
      .semanticContaminationAgainst(eval_, "embedding", "vec_id",
        "eval_emb", "eval_id", threshold = 0.3)
      .join(emb.select(col("vec_id"), col("embedding").as("__v1")), Seq("vec_id"))
      .join(emb.select(col("vec_id").as("eval_id"),
        col("embedding").as("__v2")), Seq("eval_id"))
    pairs.agg(
      (sum(when(col("vec_id") % 7 =!= 0, 0).otherwise(1)) === 0).as("all_corpus_side"),
      (sum(when(col("eval_id") % 7 === 0, 0).otherwise(1)) === 0).as("all_eval_side"),
      (sum(when(col("cos") >= 0.3, 0).otherwise(1)) === 0).as("all_above_threshold"),
      (sum(when(col("cos") === cosHofCol(col("__v1"), col("__v2")), 0).otherwise(1)) === 0)
        .as("all_cos_exact"),
      (count(lit(1)) > 0).as("nonempty"))
  }

  /** Deterministic Lloyd's k-means assignment (k=8, 2 iterations) over
    * the embeddings — full DuckDB replay: seeds, integer-exact centroid
    * sums, and argmin assignments are all engine-portable arithmetic
    * (VectorOps.kmeansAssign's contract). */
  def kmeansQ(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .kmeansAssign("embedding", "vec_id", k = 8, iters = 2)
      .orderBy(col("vec_id"))

  /** ANN through the TRAINED coarse quantizer — unlike the sketch ANN
    * variants, the whole index replays in DuckDB (k-means CTEs + L2
    * probe choice + exact cosine re-rank), so this one gets a full
    * hash oracle, not a contract. */
  def annIvfTrainedQ(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .cosineTopKIvfTrained("embedding", "vec_id", queryVec(s, d), 10,
        nlist = 8, nprobe = 2, iters = 2)
      .orderBy(col("vec_id"))

  /** ANN through product quantization — like the trained IVF, the
    * whole index replays in DuckDB (per-subspace k-means CTEs + ADC
    * score + exact cosine re-rank), so full hash oracle. */
  def annPqTopKQ(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .cosineTopKPq("embedding", "vec_id", queryVec(s, d), 10,
        m = 4, ksub = 4, refine = 50, iters = 2)
      .orderBy(col("vec_id"))

  /** Composed IVF-PQ: trained coarse cells prune, PQ ADC ranks, exact
    * cosine re-ranks — both trainings replay, full hash oracle. */
  def annIvfPqTopKQ(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .cosineTopKIvfPq("embedding", "vec_id", queryVec(s, d), 10,
        nlist = 8, nprobe = 4, m = 4, ksub = 4, refine = 50, iters = 2)
      .orderBy(col("vec_id"))

  /** The SAME composed IVF-PQ index, persisted ([[writeIvfPq]]) then
    * queried from disk ([[VectorOps.readIvfPqTopK]]): cell directories
    * prune the probe, ADC reads only code columns, vectors are read for
    * the refine set alone — answers to the in-memory replay oracle. */
  def annIvfPqDiskQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.VectorOps
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_ivfpq_q_" + Integer.toHexString(d.hashCode)).toString
    embeddings(s, d).writeIvfPq(path, "embedding", "vec_id",
      nlist = 8, m = 4, ksub = 4, iters = 2)
    VectorOps.readIvfPqTopK(s, path, "embedding", "vec_id",
      queryVec(s, d), 10, nprobe = 4, refine = 50)
      .orderBy(col("vec_id"))
  }

  /** Incremental IVF-PQ: half the embeddings write the layout, the
    * rest APPEND with the existing codebooks (no retrain). Queried at
    * full probes + full refine, the exact re-rank makes the result
    * independent of code quality — so the oracle is the plain
    * brute-force SQL over ALL rows, proving every appended row is
    * reachable and exactly scored. */
  def annIvfPqAppendQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.VectorOps
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_ivfpq_app_" + Integer.toHexString(d.hashCode)).toString
    val emb = embeddings(s, d)
    emb.filter(col("vec_id") % 2 === 0).writeIvfPq(path, "embedding",
      "vec_id", nlist = 8, m = 4, ksub = 4, iters = 2)
    emb.filter(col("vec_id") % 2 =!= 0).appendIvfPq(path, "embedding", "vec_id")
    val total = emb.count().toInt
    VectorOps.readIvfPqTopK(s, path, "embedding", "vec_id",
      queryVec(s, d), 10, nprobe = 8, refine = total)
      .orderBy(col("vec_id"))
  }

  /** Tombstone DELETES on the IVF-PQ layout with a REAL oracle:
    * write -> append -> delete every vec_id % 3 == 0, then the top-10
    * at the exactness escape must equal DuckDB's brute cosine top-k
    * over exactly the SURVIVING vectors — a purged embedding can never
    * rank, and the layout answers as if it never entered. */
  def annIvfPqDeleteQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.VectorOps
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_ivfpq_del_" + Integer.toHexString(d.hashCode)).toString
    val emb = embeddings(s, d)
    emb.filter(col("vec_id") % 2 === 0).writeIvfPq(path, "embedding",
      "vec_id", nlist = 8, m = 4, ksub = 4, iters = 2)
    emb.filter(col("vec_id") % 2 =!= 0).appendIvfPq(path, "embedding", "vec_id")
    VectorOps.deleteFromIvfPq(s, path,
      emb.filter(col("vec_id") % 3 === 0).select(col("vec_id")), "vec_id")
    val total = emb.count().toInt
    VectorOps.readIvfPqTopK(s, path, "embedding", "vec_id",
      queryVec(s, d), 10, nprobe = 8, refine = total)
      .orderBy(col("vec_id"))
  }

  /** Chunk -> document embedding pooling (VectorOps.meanPoolEmbeddings):
    * per-position exact integer-quantized means over 10-chunk "documents"
    * (vec_id div 10), emitted as per-position rows so the oracle
    * compares scalars. One (group, position) partial-combined shuffle;
    * plain float sums would flake across partitionings. */
  def meanPoolQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.VectorOps._
    embeddings(s, d)
      .select(expr("vec_id div 10").as("doc_id"), col("embedding"))
      .meanPoolEmbeddings("doc_id", "embedding")
      .select(col("doc_id"), col("n_chunks"),
        posexplode(col("pooled")).as(Seq("p", "v")))
      .orderBy(col("doc_id"), col("p"))
  }

  /** ANN JOIN against the at-rest IVF-PQ layout: a query WAVE (every
    * fifth embedding) retrieves its top-k from the corpus layout in
    * ONE distributed plan — probe cells per left, ADC over code
    * columns, per-left refine, exact cosine re-rank. Run at the
    * exactness escape (full probes, refine >= rows), so the oracle is
    * the brute cosine top-k join SQL: every (wave row, corpus row)
    * pair exactly scored and ranked. */
  def annIvfPqJoinQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.VectorOps
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_ivfpq_join_" + Integer.toHexString(d.hashCode)).toString
    val emb = embeddings(s, d)
    emb.writeIvfPq(path, "embedding", "vec_id", nlist = 8, m = 4, ksub = 4,
      iters = 2)
    val wave = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val total = emb.count().toInt
    VectorOps.readIvfPqTopKJoin(wave, "qvec", "qid", path,
        "embedding", "vec_id", k = 3, nprobe = 8, refine = total)
      .orderBy(col("qid"), col("vec_id"))
  }

  /** Recall audit of the incremental IVF-PQ layout — the contract row:
    * at full probes + full refine every sampled query's recall is
    * exactly 1.0 (the exactness escape), verified engine-side and
    * pinned by the oracle (the dd_minhash_pairs_capped verdict-row
    * pattern: DuckDB cannot cheaply replay per-query ADC probes, so
    * the CONTRACT is the oracled surface). */
  def annIvfPqAuditQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.VectorOps
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_ivfpq_audit_" + Integer.toHexString(d.hashCode)).toString
    val emb = embeddings(s, d)
    emb.writeIvfPq(path, "embedding", "vec_id", nlist = 8, m = 4, ksub = 4,
      iters = 2)
    val total = emb.count().toInt
    VectorOps.auditIvfPqRecall(s, path, "embedding", "vec_id",
        nQueries = 4, k = 5, nprobe = 8, refine = total)
      .agg(count(lit(1)).as("n_queries"),
        (min(col("recall")) === 1.0).as("all_exact_at_full_probes"))
  }

  /** SemDeDup-style semantic near-dup pairs: k-means blocks, exact
    * within-cluster cosine >= 0.8 verifies. */
  def semanticPairsQ(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .semanticDedupPairs("embedding", "vec_id", k = 8, threshold = 0.8)
      .orderBy(col("id1"), col("id2"))

  def simJoinExactQ(s: SparkSession, d: String): DataFrame = {
    val left = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val right = embeddings(s, d).select(
      col("vec_id").as("vec_id2"), col("embedding").as("embedding2"))
    left.similarityJoinExact(right, "embedding", "embedding2",
        "vec_id", "vec_id2", threshold = 0.3)
      .filter(col("vec_id") < col("vec_id2"))
      .orderBy(col("vec_id"), col("vec_id2"))
  }

  /** DuckDB replay of VectorOps.kmeansAssign: the same quantization,
    * Knuth-hash seeds, argmin assignments (ties to the lowest cluster
    * id) and integer-exact centroid updates, one CTE pair per Lloyd
    * iteration. Emits CTEs `kq` (quantized vectors), `c0..c$iters`
    * (centroids) — callers compute the final assignment over
    * `c$iters`. The squared-L2 fold is the bit-parity
    * list_sum(list_transform(...)) shape; centroids are
    * `CAST(intSum AS DOUBLE) / count`, exact in both engines. */
  private def kmeansCteSql(k: Int, iters: Int, seed: Long): String = {
    def sqDist(qv: String, cv: String): String =
      s"""list_sum(list_transform(list_zip($qv, $cv),
         |        x -> (CAST(x[1] AS DOUBLE) - x[2]) * (CAST(x[1] AS DOUBLE) - x[2])))""".stripMargin
    val head =
      s"""kq AS (
         |  SELECT vec_id,
         |    list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * 65536.0) AS BIGINT)) AS qv
         |  FROM embeddings),
         |c0 AS (
         |  SELECT CAST(rn - 1 AS INT) AS cid,
         |         list_transform(qv, x -> CAST(x AS DOUBLE)) AS cv FROM (
         |    SELECT qv, row_number() OVER (
         |        ORDER BY ((vec_id + $seed) * 2654435761) % 4294967296, vec_id) AS rn
         |    FROM kq) s
         |  WHERE rn <= $k)""".stripMargin
    def iterSql(t: Int): String =
      s"""a$t AS (
         |  SELECT vec_id, qv, cid FROM (
         |    SELECT kq.vec_id, kq.qv, c.cid,
         |      row_number() OVER (PARTITION BY kq.vec_id
         |        ORDER BY ${sqDist("kq.qv", "c.cv")} ASC, c.cid ASC) AS rn
         |    FROM kq, c${t - 1} c) z WHERE rn = 1),
         |u$t AS (
         |  SELECT cid, pos, sum(qel) AS s, count(*) AS n FROM (
         |    SELECT cid, unnest(generate_series(1, len(qv))) AS pos, unnest(qv) AS qel
         |    FROM a$t) e
         |  GROUP BY cid, pos),
         |c$t AS (
         |  SELECT p.cid, CASE WHEN u.cv IS NULL THEN p.cv ELSE u.cv END AS cv
         |  FROM c${t - 1} p LEFT JOIN (
         |    SELECT cid, list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY pos) AS cv
         |    FROM u$t GROUP BY cid) u ON p.cid = u.cid)""".stripMargin
    (head +: (1 to iters).map(iterSql)).mkString(",\n")
  }

  /** Final k-means assignment CTE `kmf(vec_id, cluster)` over the last
    * centroid CTE from [[kmeansCteSql]]. */
  private def kmeansAssignSql(iters: Int): String =
    s"""kmf AS (
       |  SELECT vec_id, cid AS cluster FROM (
       |    SELECT kq.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY kq.vec_id
       |        ORDER BY list_sum(list_transform(list_zip(kq.qv, c.cv),
       |            x -> (CAST(x[1] AS DOUBLE) - x[2]) * (CAST(x[1] AS DOUBLE) - x[2]))) ASC,
       |          c.cid ASC) AS rn
       |    FROM kq, c$iters c) z WHERE rn = 1)""".stripMargin

  /** DuckDB replay of VectorOps.cosineTopKPq's whole index: the
    * [[kmeansCteSql]] arithmetic per SUBSPACE SLICE (same quantization,
    * same Knuth-hash seed rows — the codebooks slice ONE seed set, so
    * every subspace reuses the `sd` CTE — argmin ties to the lowest
    * code, integer-exact updates), then ADC = the sum over subspaces of
    * the squared-L2 between the query's quantized slice and the
    * candidate's code centroid, left-to-right like the Spark column.
    * Emits CTEs `pq`, `sd`, per-subspace `c{t}_{s}` and final codes
    * `f{s}`, plus `adc(vec_id, score)`. */
  private def pqCteSql(m: Int, ksub: Int, iters: Int, seed: Long,
                       dim: Int): String = {
    val subDim = dim / m
    def lo(s: Int) = s * subDim + 1
    def hi(s: Int) = (s + 1) * subDim
    def l2(qv: String, cv: String): String =
      s"""list_sum(list_transform(list_zip($qv, $cv),
         |        x -> (CAST(x[1] AS DOUBLE) - x[2]) * (CAST(x[1] AS DOUBLE) - x[2])))""".stripMargin
    val head =
      s"""pq AS (
         |  SELECT vec_id,
         |    list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * 65536.0) AS BIGINT)) AS qv
         |  FROM embeddings),
         |sd AS (
         |  SELECT CAST(rn - 1 AS INT) AS cid, qv FROM (
         |    SELECT qv, row_number() OVER (
         |        ORDER BY ((vec_id + $seed) * 2654435761) % 4294967296, vec_id) AS rn
         |    FROM pq) s
         |  WHERE rn <= $ksub)""".stripMargin
    def subCtes(s: Int): Seq[String] = {
      val c0 =
        s"""c0_$s AS (
           |  SELECT cid, list_transform(qv[${lo(s)}:${hi(s)}], x -> CAST(x AS DOUBLE)) AS cv
           |  FROM sd)""".stripMargin
      val steps = (1 to iters).map { t =>
        s"""a${t}_$s AS (
           |  SELECT vec_id, qv, cid FROM (
           |    SELECT p.vec_id, p.qv, c.cid,
           |      row_number() OVER (PARTITION BY p.vec_id
           |        ORDER BY ${l2(s"p.qv[${lo(s)}:${hi(s)}]", "c.cv")} ASC, c.cid ASC) AS rn
           |    FROM pq p, c${t - 1}_$s c) z WHERE rn = 1),
           |u${t}_$s AS (
           |  SELECT cid, pos, sum(qel) AS s, count(*) AS n FROM (
           |    SELECT cid, unnest(generate_series(1, $subDim)) AS pos,
           |           unnest(qv[${lo(s)}:${hi(s)}]) AS qel
           |    FROM a${t}_$s) e
           |  GROUP BY cid, pos),
           |c${t}_$s AS (
           |  SELECT p.cid, CASE WHEN u.cv IS NULL THEN p.cv ELSE u.cv END AS cv
           |  FROM c${t - 1}_$s p LEFT JOIN (
           |    SELECT cid, list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY pos) AS cv
           |    FROM u${t}_$s GROUP BY cid) u ON p.cid = u.cid)""".stripMargin
      }
      val f =
        s"""f$s AS (
           |  SELECT vec_id, cid FROM (
           |    SELECT p.vec_id, c.cid,
           |      row_number() OVER (PARTITION BY p.vec_id
           |        ORDER BY ${l2(s"p.qv[${lo(s)}:${hi(s)}]", "c.cv")} ASC, c.cid ASC) AS rn
           |    FROM pq p, c${iters}_$s c) z WHERE rn = 1)""".stripMargin
      (c0 +: steps) :+ f
    }
    val adcTerms = (0 until m)
      .map(s => l2(s"q.qv[${lo(s)}:${hi(s)}]", s"cc$s.cv"))
      .mkString("\n    + ")
    val adcJoins = (0 until m).map(s =>
      s"  JOIN f$s ON f$s.vec_id = p.vec_id\n" +
        s"  JOIN c${iters}_$s cc$s ON cc$s.cid = f$s.cid").mkString("\n")
    val adc =
      s"""qpq AS (SELECT qv FROM pq WHERE vec_id = 0),
         |adc AS (
         |  SELECT p.vec_id,
         |    $adcTerms AS score
         |  FROM pq p CROSS JOIN qpq q
         |$adcJoins)""".stripMargin
    ((head +: (0 until m).flatMap(subCtes)) :+ adc).mkString(",\n")
  }

  // DuckDB cosine in double precision with the same sequential
  // accumulation as VectorKernels.cosineF -> bit-exact parity.
  private def cosSql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b),
       |  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |  * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin

  private val stopListSql = "('the', 'a', 'of', 'and', 'to', 'in', 'is')"

  // SQL mirrors of the token/quality kernels — the exact expression
  // shapes hash-proven by tx_stats, factored for reuse by the pipeline
  // oracle (identical IEEE evaluation order is what makes >= filters on
  // the double agree between engines)
  private val ntokSql =
    """len(list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != ''))"""
  private val stopRatioSql =
    s"""CAST(len(list_filter(list_filter(regexp_split_to_array(trim(text), '\\s+'), q -> q != ''),
       |      t -> t IN $stopListSql)) AS DOUBLE)
       |   / $ntokSql""".stripMargin
  private val distinctRatioSql =
    s"""CAST(len(list_distinct(list_filter(regexp_split_to_array(trim(text), '\\s+'), q -> q != ''))) AS DOUBLE)
       |   / $ntokSql""".stripMargin
  private val qualitySql =
    s"""0.3 * least(CAST(1.0 AS DOUBLE),
       |        CAST($ntokSql AS DOUBLE)
       |          / CAST(100.0 AS DOUBLE))
       | + 0.4 * ($distinctRatioSql)
       | + 0.3 * (CAST(1.0 AS DOUBLE)
       |   - $stopRatioSql)""".stripMargin

  /** Full SQL replay of the IVF ANN pipeline (cosineTopKIvf and the disk
    * layout both follow it): centroids are the `nlist` vectors minimizing
    * the Knuth multiplicative hash ((id + seed) * 2654435761) mod 2^32
    * (VectorOps.centroidOrder — deliberately SQL-expressible); each
    * vector joins its argmax-cosine centroid (first index on ties, like
    * Spark's array_position-of-array_max); the query probes the `nprobe`
    * cells with the most query-similar centroids (stable sort on ties,
    * like sortBy); exact cosine top-k inside probed cells. All cosine
    * comparisons ride the bit-exact cosSql mirror. */
  private def annIvfOracleSql(k: Int, nlist: Int, nprobe: Int, seed: Long,
                              survivorWhere: String = ""): String =
    s"""WITH cent AS (
       |  SELECT cell, cv FROM (
       |    SELECT embedding AS cv, row_number() OVER (
       |        ORDER BY ((vec_id + $seed) * 2654435761) % 4294967296, vec_id) AS cell
       |    FROM embeddings) c
       |  WHERE cell <= $nlist
       |),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |assign AS (
       |  SELECT vec_id, emb, cell FROM (
       |    SELECT e.vec_id, e.embedding AS emb, cent.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.embedding", "cent.cv")} DESC, cent.cell ASC) AS rn
       |    FROM (SELECT * FROM embeddings $survivorWhere) e CROSS JOIN cent) a
       |  WHERE rn = 1
       |),
       |probes AS (
       |  SELECT cell FROM (
       |    SELECT cent.cell, row_number() OVER (
       |        ORDER BY ${cosSql("cent.cv", "q.qv")} DESC, cent.cell ASC) AS pr
       |    FROM cent, q) p
       |  WHERE pr <= $nprobe
       |)
       |SELECT vec_id, cos FROM (
       |  SELECT a.vec_id, ${cosSql("a.emb", "q.qv")} AS cos
       |  FROM assign a JOIN probes USING (cell), q
       |  ORDER BY cos DESC, a.vec_id ASC LIMIT $k) t
       |ORDER BY vec_id""".stripMargin

  /** DuckDB replay of TextKernels.simHash64: distinct tokens fold
    * splitmix64 over their chars in a recursive CTE (one iteration per
    * char position; HUGEINT carries the unsigned 64-bit value, xors hop
    * through signed BIGINT, the 64x64 multiplies split the left operand
    * into 32-bit halves so INT128 never overflows), then per-doc per-bit
    * majority votes over the token MULTISET reassemble the signature.
    * Defines CTE `simdocs(doc_id, simhash)` — callers must open with
    * WITH RECURSIVE. Tokenless docs get signature 0 (all votes lose). */
  private val simhashCteSql = {
    // (u64 as HUGEINT) -> signed BIGINT two's-complement reinterpretation
    def toS(u: String) =
      s"CAST($u - 18446744073709551616 * ($u // 9223372036854775808) AS BIGINT)"
    // (a * c) mod 2^64 with a < 2^64: split a into 32-bit halves
    def mulMod(a: String, c: String) =
      s"($a % 4294967296 * $c + (($a // 4294967296 * $c) % 4294967296) * 4294967296) % 18446744073709551616"
    s"""dtok AS (
       |  SELECT DISTINCT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), q -> q != '')) AS tok
       |  FROM documents),
       |chs AS (
       |  SELECT tok,
       |    unnest(generate_series(1, length(tok))) AS pos,
       |    unnest(list_transform(regexp_extract_all(tok, '.'), c -> CAST(unicode(c) AS HUGEINT))) AS code
       |  FROM dtok),
       |fold(tok, pos, h) AS (
       |  SELECT tok, 0, CAST(11400714819323198485 AS HUGEINT) FROM dtok
       |  UNION ALL
       |  SELECT tok, pos, out FROM (
       |    SELECT c.tok AS tok, c.pos AS pos,
       |      f.h - f.h % 128 + CAST(xor(CAST(f.h % 128 AS BIGINT), CAST(c.code AS BIGINT)) AS HUGEINT) AS a,
       |      (a + 11400714819323198485) % 18446744073709551616 AS x1,
       |      CAST(xor(${toS("x1")}, CAST(x1 // 1073741824 AS BIGINT)) AS BIGINT) AS t1s,
       |      CAST(t1s AS HUGEINT) + 18446744073709551616 * CAST(t1s < 0 AS HUGEINT) AS t1,
       |      ${mulMod("t1", "13787848793156543929")} AS x2,
       |      CAST(xor(${toS("x2")}, CAST(x2 // 134217728 AS BIGINT)) AS BIGINT) AS t2s,
       |      CAST(t2s AS HUGEINT) + 18446744073709551616 * CAST(t2s < 0 AS HUGEINT) AS t2,
       |      ${mulMod("t2", "10723151780598845931")} AS x3,
       |      CAST(xor(${toS("x3")}, CAST(x3 // 2147483648 AS BIGINT)) AS BIGINT) AS outs,
       |      CAST(outs AS HUGEINT) + 18446744073709551616 * CAST(outs < 0 AS HUGEINT) AS out
       |    FROM fold f JOIN chs c ON c.tok = f.tok AND c.pos = f.pos + 1) stage),
       |th AS (
       |  SELECT tok, h FROM (
       |    SELECT tok, h, row_number() OVER (PARTITION BY tok ORDER BY pos DESC) AS rn FROM fold) t
       |  WHERE rn = 1),
       |doctok AS (
       |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), q -> q != '')) AS tok
       |  FROM documents),
       |votes AS (
       |  SELECT d.doc_id, b.b,
       |    sum(CASE WHEN (th.h // (CAST(1 AS HUGEINT) << b.b)) % 2 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM doctok d JOIN th USING (tok), (SELECT unnest(generate_series(0, 63)) AS b) b
       |  GROUP BY d.doc_id, b.b),
       |sim AS (
       |  SELECT doc_id, ${toS("su")} AS simhash
       |  FROM (
       |    SELECT doc_id,
       |      coalesce(sum(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << b ELSE CAST(0 AS HUGEINT) END), 0) AS su
       |    FROM votes GROUP BY doc_id)),
       |simdocs AS (
       |  SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
       |  FROM documents d LEFT JOIN sim s USING (doc_id))""".stripMargin
  }

  // n-gram pair SQL, shared by the pair query and the components oracle
  private val ngramShingleCteSql =
    """sh AS (
      |  SELECT doc_id, lang, length(printf('%b', n_chars)) AS lbucket,
      |    list_distinct(
      |      CASE WHEN len(ts) = 0 THEN []::VARCHAR[]
      |           WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
      |           ELSE [array_to_string(ts[i:i+2], ' ') FOR i IN range(1, len(ts) - 1)]
      |      END) AS s
      |  FROM (SELECT doc_id, lang, n_chars,
      |          list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != '') AS ts
      |        FROM documents)
      |)""".stripMargin
  private val ngramPairsSelectSql =
    """SELECT id1, id2, jaccard FROM (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2,
      |    CASE WHEN len(a.s) = 0 AND len(b.s) = 0 THEN CAST(1.0 AS DOUBLE)
      |         WHEN len(a.s) = 0 OR len(b.s) = 0 THEN CAST(0.0 AS DOUBLE)
      |         ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
      |    END AS jaccard
      |  FROM sh a JOIN sh b
      |    ON a.lang = b.lang AND a.lbucket = b.lbucket AND a.doc_id < b.doc_id) t
      |WHERE jaccard >= 0.8""".stripMargin

  /** DuckDB replay of the [[graft.operators.CorpusOps.bpeEncode]]
    * replace-chain under [[bpeMerges]], applied to a word expression. */
  private def bpeEncodeSql(wordExpr: String): String =
    bpeMerges.foldLeft(
      s"regexp_replace($wordExpr, '(.)', ' \\1 ', 'g')") {
      case (acc, (a, b)) => s"replace($acc, ' $a  $b ', ' $a$b ')"
    }

  /** DuckDB mirror of GraphOps.dampTerm: exact floor(x*num/20) for
    * non-negative BIGINT x with no float multiply. */
  private def dampSql(x: String, num: Int): String =
    s"(CAST(floor(($x)/20) AS BIGINT)*$num" +
      s" + CAST(floor((($x)%20)*$num/20) AS BIGINT))"

  /** One unrolled PageRank iteration (CTE bodies): contributions,
    * dangling share, new ranks — the exact integer arithmetic of
    * GraphOps.pageRank. */
  private def prIterSql(prev: String, cur: String): String =
    s"""pr_c$cur AS (
       |  SELECT e.dst AS node,
       |    CAST(SUM(CAST(floor(CAST(r.rank AS DOUBLE)/d.outdeg) AS BIGINT))
       |         AS BIGINT) AS contrib
       |  FROM pr_r$prev r
       |  JOIN pr_edges e ON r.node = e.src
       |  JOIN pr_deg d ON d.src = e.src
       |  GROUP BY e.dst),
       |pr_g$cur AS (
       |  SELECT COALESCE(CAST(SUM(r.rank) AS BIGINT), 0)
       |           // (SELECT n FROM pr_n) AS share
       |  FROM pr_r$prev r LEFT JOIN pr_deg d ON r.node = d.src
       |  WHERE d.src IS NULL),
       |pr_r$cur AS (
       |  SELECT nd.node,
       |    (SELECT tp FROM pr_tele)
       |      + ${dampSql(s"COALESCE(c.contrib, 0) + (SELECT share FROM pr_g$cur)", 17)}
       |      AS rank
       |  FROM pr_nodes nd LEFT JOIN pr_c$cur c USING (node))""".stripMargin

  private val oracles0: Map[String, String] = Map(
    // full replay: same 20-word passages, same md5 dedup key, same
    // (doc_id, pos) first-occurrence order, same reassembly
    "pp_passage_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                q -> q != '') AS ts
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, ts,
        |    unnest(range(0, CAST(ceil(len(ts)/20.0) AS BIGINT))) AS pos
        |  FROM toks),
        |chunked AS (
        |  SELECT doc_id, pos,
        |    array_to_string(ts[(pos*20+1):(pos*20+20)], ' ') AS pass
        |  FROM pos),
        |kept AS (
        |  SELECT doc_id, pos, pass FROM (
        |    SELECT doc_id, pos, pass,
        |      row_number() OVER (PARTITION BY md5(pass)
        |                         ORDER BY doc_id, pos) AS rn
        |    FROM chunked) t WHERE rn = 1),
        |agg AS (
        |  SELECT doc_id,
        |    string_agg(pass, ' ' ORDER BY pos) AS text_clean,
        |    count(*) AS kept_passages
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id,
        |  COALESCE(a.text_clean, '') AS text_clean,
        |  COALESCE(a.kept_passages, 0) AS kept_passages,
        |  CAST(ceil(len(t.ts)/20.0) AS BIGINT) AS total_passages
        |FROM toks t LEFT JOIN agg a USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    // exact integer sums over corpus bigram/unigram counts; the single
    // final double division is correctly rounded in both engines
    "tx_bigram_quality" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                q -> q != '') AS ts
        |  FROM documents),
        |big AS (
        |  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
        |        FROM toks) t),
        |unicnt AS (
        |  SELECT w1, count(*) AS c1
        |  FROM (SELECT unnest(ts) AS w1 FROM toks) u GROUP BY 1),
        |bicnt AS (
        |  SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
        |per AS (
        |  SELECT b.doc_id,
        |    CAST(sum(bc.c12) AS BIGINT) AS s12,
        |    CAST(sum(uc.c1) AS BIGINT) AS s1,
        |    count(*) AS n_bigrams
        |  FROM big b
        |  JOIN bicnt bc USING (w1, w2)
        |  JOIN unicnt uc USING (w1)
        |  GROUP BY 1)
        |SELECT d.doc_id, COALESCE(p.n_bigrams, 0) AS n_bigrams,
        |  CASE WHEN COALESCE(p.n_bigrams, 0) = 0 THEN 0.0
        |       ELSE CAST(p.s12 AS DOUBLE) / CAST(p.s1 AS DOUBLE)
        |  END AS bigram_score
        |FROM documents d LEFT JOIN per p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // same gram windows as pp_contamination; the redaction is an
    // index-aware list_filter — every kept token's 1-based position is
    // outside every matched [start, start+8) window
    "pp_span_decontamination" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(text), '[ \t\n\r]+') AS gt
        |  FROM documents),
        |eg AS (
        |  SELECT DISTINCT array_to_string(gt[i:i+7], ' ') AS gram
        |  FROM (SELECT gt, unnest(range(1, len(gt) - 6)) AS i
        |        FROM tok WHERE doc_id % 7 = 0 AND len(gt) >= 8) t),
        |cg AS (
        |  SELECT doc_id, i, array_to_string(gt[i:i+7], ' ') AS gram
        |  FROM (SELECT doc_id, gt, unnest(range(1, len(gt) - 6)) AS i
        |        FROM tok WHERE doc_id % 7 <> 0 AND len(gt) >= 8) t),
        |starts AS (
        |  SELECT doc_id, list(DISTINCT i) AS ss
        |  FROM cg JOIN eg USING (gram) GROUP BY doc_id),
        |red AS (
        |  SELECT t.doc_id, t.gt, COALESCE(s.ss, []) AS ss,
        |    list_filter(t.gt, (x, i) ->
        |      len(list_filter(COALESCE(s.ss, []),
        |          st -> i >= st AND i < st + 8)) = 0) AS kept
        |  FROM tok t LEFT JOIN starts s USING (doc_id)
        |  WHERE t.doc_id % 7 <> 0)
        |SELECT doc_id,
        |  COALESCE(array_to_string(list_filter(kept, x -> x != ''), ' '), '')
        |    AS text_clean,
        |  CAST(len(list_filter(gt, x -> x != '')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(gt, x -> x != ''))
        |       - len(list_filter(kept, x -> x != '')) AS BIGINT) AS n_removed
        |FROM red ORDER BY doc_id""".stripMargin,
    // same injected variants, same normalization chain ('g' flag: the
    // Spark built-in replaces every match), min-id survivor per key
    "pp_normalized_dedup" ->
      """WITH uni AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |    '  ' || upper(text) || ' !!!' AS text
        |  FROM documents WHERE doc_id % 7 = 0),
        |norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 \t\n\r]', ' ', 'g'), '[ \t\n\r]+', ' ', 'g'))
        |      AS text_norm
        |  FROM uni)
        |SELECT min(doc_id) AS doc_id, text_norm
        |FROM norm GROUP BY text_norm
        |ORDER BY doc_id""".stripMargin,
    // integer tf/df; the weight's IEEE shape ((N - df + 0.5)/(df + 0.5)
    // * tf, all via double casts) is pinned to the Spark column exactly
    "tx_tfidf" ->
      """WITH tfx AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM (SELECT doc_id,
        |          unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                 q -> q != '')) AS term
        |        FROM documents WHERE doc_id < 300) t
        |  GROUP BY doc_id, term),
        |dfx AS (SELECT term, count(*) AS df FROM tfx GROUP BY term),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n
        |       FROM documents WHERE doc_id < 300)
        |SELECT tfx.doc_id, tfx.term, CAST(tfx.tf AS BIGINT) AS tf,
        |  (nn.n - CAST(dfx.df AS DOUBLE) + 0.5) / (CAST(dfx.df AS DOUBLE) + 0.5)
        |    * CAST(tfx.tf AS DOUBLE) AS tfidf
        |FROM tfx JOIN dfx USING (term), nn
        |ORDER BY tfx.doc_id, tfx.term""".stripMargin,
    // exact pair/unigram counts; lift = c12*N / (c1*c2) in the pinned
    // double shape; (lift DESC, w1, w2) makes the top-40 cut total
    "tx_collocations" ->
      """WITH tok AS (
        |  SELECT list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                     q -> q != '') AS ts
        |  FROM documents),
        |uni AS (
        |  SELECT w, count(*) AS c
        |  FROM (SELECT unnest(ts) AS w FROM tok) t GROUP BY w),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
        |pairs AS (
        |  SELECT ts[i] AS w1, ts[i+1] AS w2 FROM (
        |    SELECT ts, unnest(range(1, len(ts))) AS i
        |    FROM tok WHERE len(ts) >= 2) t),
        |bi AS (
        |  SELECT w1, w2, count(*) AS pair_count
        |  FROM pairs GROUP BY w1, w2 HAVING count(*) >= 5)
        |SELECT b.w1, b.w2, b.pair_count,
        |  CAST(b.pair_count AS DOUBLE) * CAST(t.n AS DOUBLE)
        |    / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
        |FROM bi b JOIN uni u1 ON b.w1 = u1.w
        |          JOIN uni u2 ON b.w2 = u2.w, tot t
        |ORDER BY lift DESC, b.w1, b.w2 LIMIT 40""".stripMargin,
    // the two-halves Knuth fold mod 8 — the manifest the files must
    // carry if the write path round-trips every row exactly once
    "pp_write_sharded" ->
      """SELECT CAST(((doc_id % 4294967296 // 65536 * 2654435761 % 4294967296)
        |        * 65536 + doc_id % 65536 * 2654435761) % 4294967296 % 8
        |      AS INT) AS shard,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin,
    // same planted duplication; global first occurrence = rn 1 over
    // (doc, pos) per gram digest; the same index-aware redaction
    "dd_span_dedup" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                q -> q != '') AS ts0
        |  FROM documents),
        |fixture AS (
        |  SELECT b.doc_id,
        |    CASE WHEN b.doc_id % 19 = 3 AND p.doc_id IS NOT NULL
        |              AND array_to_string(p.ts0[1:12], ' ') != ''
        |         THEN b.text || ' ' || array_to_string(p.ts0[1:12], ' ')
        |         ELSE b.text END AS text
        |  FROM base b LEFT JOIN base p ON p.doc_id = b.doc_id - 1),
        |tok AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(text), '[ \t\n\r]+') AS gt
        |  FROM fixture),
        |cg AS (
        |  SELECT doc_id, i, md5(array_to_string(gt[i:i+7], ' ')) AS g
        |  FROM (SELECT doc_id, gt, unnest(range(1, len(gt) - 6)) AS i
        |        FROM tok WHERE len(gt) >= 8) t),
        |dup AS (
        |  SELECT doc_id, i FROM (
        |    SELECT doc_id, i,
        |      row_number() OVER (PARTITION BY g ORDER BY doc_id, i) AS rn
        |    FROM cg) t WHERE rn > 1),
        |starts AS (SELECT doc_id, list(DISTINCT i) AS ss FROM dup GROUP BY doc_id),
        |red AS (
        |  SELECT t.doc_id, t.gt, COALESCE(s.ss, []) AS ss,
        |    list_filter(t.gt, (x, i) ->
        |      len(list_filter(COALESCE(s.ss, []),
        |          st -> i >= st AND i < st + 8)) = 0) AS kept
        |  FROM tok t LEFT JOIN starts s USING (doc_id))
        |SELECT doc_id,
        |  COALESCE(array_to_string(list_filter(kept, x -> x != ''), ' '), '')
        |    AS text_clean,
        |  CAST(len(list_filter(gt, x -> x != '')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(gt, x -> x != ''))
        |       - len(list_filter(kept, x -> x != '')) AS BIGINT) AS n_removed
        |FROM red ORDER BY doc_id""".stripMargin,
    // exact per-key counts, decimal-safe total, pinned-shape divisions
    "q29_key_stats" ->
      """WITH c AS (
        |  SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS tt, count(*) AS kk FROM c),
        |top AS (SELECT l_suppkey, cnt FROM c
        |        ORDER BY cnt DESC, l_suppkey LIMIT 20)
        |SELECT top.l_suppkey, top.cnt,
        |  CAST(cnt AS DOUBLE) / CAST(tt AS DOUBLE) AS share,
        |  CAST(cnt AS DOUBLE) * CAST(kk AS DOUBLE) / CAST(tt AS DOUBLE) AS skew
        |FROM top, t ORDER BY cnt DESC, l_suppkey""".stripMargin,
    // same deterministic mutation, digest compare over a full outer join
    "pp_snapshot_diff" ->
      """WITH old AS (SELECT doc_id, text FROM documents),
        |newv AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM old WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text FROM old
        |  WHERE doc_id % 17 = 0),
        |nh AS (SELECT doc_id, md5(text) AS h FROM newv),
        |oh AS (SELECT doc_id, md5(text) AS h FROM old)
        |SELECT COALESCE(nh.doc_id, oh.doc_id) AS doc_id,
        |  CASE WHEN oh.doc_id IS NULL THEN 'added'
        |       WHEN nh.doc_id IS NULL THEN 'removed'
        |       WHEN nh.h IS NOT DISTINCT FROM oh.h THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM nh FULL OUTER JOIN oh ON nh.doc_id = oh.doc_id
        |ORDER BY doc_id""".stripMargin,
    // exact df/tf stats over all docs; posting string capped at the 20
    // lowest doc ids per term — same window-rank cap as the Spark side
    "tx_inverted_index" ->
      """WITH tf AS (
        |  SELECT term, doc_id, count(*) AS tf
        |  FROM (SELECT doc_id,
        |          unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                 q -> q != '')) AS term
        |        FROM documents) t
        |  GROUP BY term, doc_id),
        |stats AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df,
        |    CAST(sum(tf) AS BIGINT) AS tf_total
        |  FROM tf GROUP BY term),
        |capped AS (
        |  SELECT term, doc_id, tf,
        |    row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        |  FROM tf),
        |posts AS (
        |  SELECT term, string_agg(doc_id || ':' || tf, ' ' ORDER BY doc_id)
        |    AS postings
        |  FROM capped WHERE rn <= 20 GROUP BY term)
        |SELECT s.term, s.df, s.tf_total, p.postings
        |FROM stats s JOIN posts p USING (term)
        |ORDER BY s.term""".stripMargin,
    // integer-exact vocab ranks + id encoding, fully replayed
    "tx_vocab_encode" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                q -> q != '') AS ts
        |  FROM documents),
        |tokpos AS (
        |  SELECT doc_id, pos, ts[pos] AS tok
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS pos
        |        FROM toks) t),
        |cnt AS (SELECT tok, count(*) AS c FROM tokpos GROUP BY 1),
        |vocab AS (
        |  SELECT tok,
        |    CAST(row_number() OVER (ORDER BY c DESC, tok ASC) AS INT) AS tid
        |  FROM cnt QUALIFY tid <= 1000),
        |enc AS (
        |  SELECT t.doc_id, t.pos, COALESCE(v.tid, 0) AS tid
        |  FROM tokpos t LEFT JOIN vocab v USING (tok)),
        |per AS (
        |  SELECT doc_id,
        |    count(*) AS n_tokens,
        |    CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
        |    array_to_string((list(tid ORDER BY pos))[1:10], ',') AS ids_head
        |  FROM enc GROUP BY 1)
        |SELECT d.doc_id,
        |  COALESCE(p.n_tokens, 0) AS n_tokens,
        |  COALESCE(p.n_unk, 0) AS n_unk,
        |  COALESCE(p.ids_head, '') AS ids_head
        |FROM documents d LEFT JOIN per p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // identical replace-chain per word, identical merge ranks
    "tx_bpe_encode" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |                q -> q != '') AS ts
         |  FROM documents),
         |enc AS (
         |  SELECT doc_id, ts,
         |    flatten(list_transform(ts, w ->
         |      list_filter(regexp_split_to_array(trim(${bpeEncodeSql("w")}),
         |                                        '\\s+'), q -> q != ''))) AS bpe
         |  FROM toks)
         |SELECT doc_id,
         |  CAST(len(ts) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(bpe) AS BIGINT) AS n_bpe_tokens,
         |  COALESCE(array_to_string(bpe[1:8], ' '), '') AS bpe_head
         |FROM enc ORDER BY doc_id""".stripMargin,
    // degree-oriented wedge closing, exact integer counts; the
    // lexicographic (degree, id) orientation is spelled out so both
    // engines orient every edge identically
    "gp_triangles" ->
      """WITH pe AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
        |  WHERE x.l_partkey < y.l_partkey),
        |deg AS (
        |  SELECT node, count(*) AS degree FROM (
        |    SELECT a AS node FROM pe UNION ALL SELECT b AS node FROM pe) n
        |  GROUP BY node),
        |o AS (
        |  SELECT CASE WHEN da.degree < db.degree
        |              OR (da.degree = db.degree AND pe.a < pe.b)
        |         THEN pe.a ELSE pe.b END AS u,
        |         CASE WHEN da.degree < db.degree
        |              OR (da.degree = db.degree AND pe.a < pe.b)
        |         THEN pe.b ELSE pe.a END AS v,
        |         CASE WHEN da.degree < db.degree
        |              OR (da.degree = db.degree AND pe.a < pe.b)
        |         THEN db.degree ELSE da.degree END AS dv
        |  FROM pe JOIN deg da ON pe.a = da.node JOIN deg db ON pe.b = db.node),
        |wg AS (
        |  SELECT x.u AS u, x.v AS v, y.v AS w
        |  FROM o x JOIN o y ON x.u = y.u
        |  WHERE x.dv < y.dv OR (x.dv = y.dv AND x.v < y.v)),
        |tri AS (
        |  SELECT wg.u, wg.v, wg.w FROM wg
        |  WHERE EXISTS (SELECT 1 FROM o WHERE o.u = wg.v AND o.v = wg.w)),
        |corners AS (
        |  SELECT node, count(*) AS triangles FROM (
        |    SELECT u AS node FROM tri UNION ALL
        |    SELECT v AS node FROM tri UNION ALL
        |    SELECT w AS node FROM tri) c
        |  GROUP BY node)
        |SELECT deg.node, deg.degree,
        |  COALESCE(corners.triangles, 0) AS triangles
        |FROM deg LEFT JOIN corners USING (node)
        |ORDER BY deg.node""".stripMargin,
    // 3 unrolled fixed-point iterations, bit-identical long arithmetic
    "gp_pagerank" ->
      s"""WITH pr_edges AS (
         |  SELECT DISTINCT l_suppkey AS src,
         |    l_partkey + 1000000000 AS dst
         |  FROM lineitem),
         |pr_nodes AS (
         |  SELECT src AS node FROM pr_edges
         |  UNION SELECT dst FROM pr_edges),
         |pr_n AS (SELECT count(*) AS n FROM pr_nodes),
         |pr_deg AS (
         |  SELECT src, count(*) AS outdeg FROM pr_edges GROUP BY src),
         |pr_init AS (
         |  SELECT 1000000000000000 // (SELECT n FROM pr_n) AS iv),
         |pr_tele AS (
         |  SELECT ${dampSql("(SELECT iv FROM pr_init)", 3)} AS tp),
         |pr_r0 AS (
         |  SELECT node, (SELECT iv FROM pr_init) AS rank FROM pr_nodes),
         |${prIterSql("0", "1")},
         |${prIterSql("1", "2")},
         |${prIterSql("2", "3")}
         |SELECT node, rank FROM pr_r3
         |ORDER BY rank DESC, node ASC LIMIT 50""".stripMargin,
    // same injection, same email -> URL -> phone replacement chain; the
    // patterns are Java-regex ∩ RE2 so both engines see identical matches
    "pp_redact" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        CASE WHEN doc_id % 3 = 0
        |             THEN text || ' contact user' || doc_id ||
        |                  '@example.com or https://ex.org/d/' || doc_id ||
        |                  ' tel 555-867-530' || (doc_id % 10)
        |             ELSE text END,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      'https?://[^\s]+', '<URL>', 'g'),
        |    '\d{3}[-.]\d{3}[-.]\d{4}', '<PHONE>', 'g') AS red_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    // exact integer Gram + unrolled pinned-fold power iteration; see
    // pcaSql for the construction
    "emb_pca" -> pcaSql,
    // ±1 sign from fmix32 of key = i*8 + dim (seed 0): xorshifts as
    // xor(k, k // 2^s), wrapping multiplies as the two-halves fold —
    // the matrix is data-independent, so it builds once as per-dim
    // sign lists. list_sum folds the products in index order — the
    // same IEEE accumulation as the kernel, so values are exact
    "emb_random_project" ->
      """WITH keys AS (
        |  SELECT ii.i AS i, jj.j AS j, CAST(ii.i * 8 + jj.j AS BIGINT) AS k
        |  FROM (SELECT unnest(range(0,
        |          (SELECT max(len(embedding)) FROM embeddings))) AS i) ii,
        |       (SELECT unnest(range(0, 8)) AS j) jj),
        |m1 AS (SELECT i, j, xor(k, k // 65536) AS x FROM keys),
        |m2 AS (SELECT i, j, (x // 65536 * 2246822507 % 4294967296 * 65536
        |                     + x % 65536 * 2246822507) % 4294967296 AS x FROM m1),
        |m3 AS (SELECT i, j, xor(x, x // 8192) AS x FROM m2),
        |m4 AS (SELECT i, j, (x // 65536 * 3266489909 % 4294967296 * 65536
        |                     + x % 65536 * 3266489909) % 4294967296 AS x FROM m3),
        |sg AS (SELECT i, j,
        |         CASE WHEN xor(x, x // 65536) < 2147483648
        |              THEN 1.0 ELSE -1.0 END AS s FROM m4),
        |sgl AS (SELECT j, list(s ORDER BY i) AS sv FROM sg GROUP BY j),
        |pr AS (SELECT vec_id, embedding, unnest(range(0, 8)) AS dim
        |       FROM embeddings)
        |SELECT p.vec_id, CAST(p.dim AS INT) AS dim,
        |  list_sum(list_transform(
        |    list_zip(p.embedding, g.sv),
        |    x -> CAST(x[1] AS DOUBLE) * x[2])) AS value
        |FROM pr p JOIN sgl g ON p.dim = g.j
        |ORDER BY p.vec_id, p.dim""".stripMargin,
    // identical IEEE shape: scale = max |v| (order-independent), then
    // floor(v * 127 / scale + 0.5) per element; zero vectors -> zeros
    "emb_quantize_int8" ->
      """SELECT vec_id,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale,
        |  array_to_string(
        |    CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) = 0
        |         THEN list_transform(embedding, x -> 0)
        |         ELSE list_transform(embedding, x -> CAST(floor(
        |                CAST(x AS DOUBLE) * 127.0
        |                / list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE))))
        |                + 0.5) AS INT))
        |    END, ',') AS q_csv
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "pp_curation_pipeline" ->
      s"""WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text)
         |SELECT doc_id, lang, $ntokSql AS n_tokens,
         | $qualitySql AS quality
         |FROM documents JOIN keep USING (doc_id)
         |WHERE ($qualitySql) >= 0.63
         |  AND $ntokSql BETWEEN 25 AND 5000
         |ORDER BY doc_id""".stripMargin,
    "dd_exact_dedup" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // same whitespace class, same sliding windows, same 1 - distinct/total
    "tx_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\r]+') AS t
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) >= 3
        |         THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t) - 2)]
        |         ELSE [] END AS grams
        |  FROM tok)
        |SELECT doc_id,
        |  CASE WHEN len(grams) = 0 THEN 0.0
        |       ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
        |                    / CAST(len(grams) AS DOUBLE)
        |  END AS rep_ratio
        |FROM g ORDER BY doc_id""".stripMargin,
    "tx_stats" ->
      """SELECT doc_id,
        | len(list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != '')) AS n_tokens,
        | CAST(len(list_filter(list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != ''),
        |      t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS DOUBLE)
        |   / len(list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != '')) AS stop_ratio,
        | CAST(len(list_distinct(list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != ''))) AS DOUBLE)
        |   / len(list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != '')) AS distinct_ratio,
        | 0.3 * least(CAST(1.0 AS DOUBLE),
        |        CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != '')) AS DOUBLE)
        |          / CAST(100.0 AS DOUBLE))
        | + 0.4 * (CAST(len(list_distinct(list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != ''))) AS DOUBLE)
        |   / len(list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != '')))
        | + 0.3 * (CAST(1.0 AS DOUBLE)
        |   - CAST(len(list_filter(list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != ''),
        |        t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS DOUBLE)
        |     / len(list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != ''))) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tx_token_counts" ->
      """SELECT doc_id,
        | len(list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != '')) AS n_ws_tokens,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ann_ivf_topk" -> annIvfOracleSql(k = 10, nlist = 16, nprobe = 4, seed = 42L),
    // the disk layout preserves IVF semantics exactly (same centroids via
    // metadata round-trip, same probes, exact re-rank in probed cells)
    "ann_ivf_disk_topk" -> annIvfOracleSql(k = 10, nlist = 16, nprobe = 4, seed = 42L),
    "ann_ivf_delete_topk" -> annIvfOracleSql(k = 10, nlist = 16, nprobe = 4,
      seed = 42L, survivorWhere = "WHERE vec_id % 7 <> 0"),
    // contract oracles (sp_zknn_check pattern): the expected table is the
    // contract's prediction, generated from the base data — if the LSH
    // result violates rank completeness, the top-2k margin, or bit-exact
    // cosines, the Spark side emits different rows and the hash fails
    "ann_lsh_topk" ->
      """SELECT CAST(r AS INT) AS rank, TRUE AS top1_is_query, TRUE AS cos_exact
        |FROM (SELECT row_number() OVER (ORDER BY vec_id) AS r FROM embeddings) t
        |WHERE r <= 10 ORDER BY rank""".stripMargin,
    "dd_emb_near_dup" ->
      """SELECT TRUE AS all_ordered, TRUE AS all_above_threshold,
        |  TRUE AS all_cos_exact, TRUE AS nonempty""".stripMargin,
    "pp_semantic_contamination" ->
      """SELECT TRUE AS all_corpus_side, TRUE AS all_eval_side,
        |  TRUE AS all_above_threshold, TRUE AS all_cos_exact,
        |  TRUE AS nonempty""".stripMargin,
    "dd_minhash_pairs" ->
      """SELECT TRUE AS all_ordered, TRUE AS all_above_threshold,
        |  TRUE AS all_jaccard_exact, TRUE AS nonempty""".stripMargin,
    "dd_minhash_incremental" ->
      """SELECT TRUE AS all_new_side, TRUE AS all_corpus_side,
        |  TRUE AS all_above_threshold, TRUE AS all_jaccard_exact,
        |  TRUE AS nonempty""".stripMargin,
    // chunk boundaries are hash-private; the one DuckDB-computable fact
    // is total chars (chunks partition each doc), the rest is verdict
    "dd_cdc_pairs" ->
      """SELECT TRUE AS all_ordered, TRUE AS all_min_shared,
        |  TRUE AS all_jaccard_exact, TRUE AS nonempty""".stripMargin,
    "dd_cdc_dedup" ->
      """SELECT CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chunk_chars,
        |  TRUE AS chars_conserved, TRUE AS savings_consistent,
        |  TRUE AS sharing_nonempty
        |FROM documents""".stripMargin,
    "dd_cdc_index" ->
      "SELECT TRUE AS index_equals_direct, TRUE AS nonempty",
    // the digest gate's oracle is the reference semantics itself: a
    // raw-text equi-join — the layout must reproduce it exactly
    "dd_digest_gate" ->
      s"""WITH wave AS ($digestWaveSql)
         |SELECT w.id_new, c.doc_id AS id_corpus
         |FROM wave w JOIN documents c ON w.text = c.text
         |ORDER BY id_new, id_corpus""".stripMargin,
    "dd_digest_admit" ->
      s"""WITH wave AS ($digestWaveSql)
         |SELECT id_new AS doc_id, length(text) AS n_chars FROM wave w
         |WHERE NOT EXISTS (SELECT 1 FROM documents c WHERE c.text = w.text)
         |ORDER BY doc_id""".stripMargin,
    "dd_cdc_append" ->
      ("SELECT TRUE AS append_equals_direct, TRUE AS compact_equals_direct, " +
        "TRUE AS nonempty"),
    // tombstone deletes: the digest layout's raw-text oracle restricted
    // to the surviving corpus docs (write waves 1-9, doc_id % 3 deleted)
    "dd_digest_delete" ->
      s"""WITH wave AS ($digestWaveSql)
         |SELECT w.id_new, c.doc_id AS id_corpus
         |FROM wave w JOIN documents c ON w.text = c.text
         |WHERE c.doc_id % 10 >= 1 AND c.doc_id % 3 <> 0
         |ORDER BY id_new, id_corpus""".stripMargin,
    "dd_cdc_delete" ->
      ("SELECT TRUE AS delete_equals_direct, TRUE AS compact_equals_direct, " +
        "TRUE AS nonempty"),
    // the audit verb's all-green inventory on a healthy
    // write+append+delete digest layout
    "dd_index_fsck" ->
      """SELECT * FROM (VALUES
        |  ('bloom_covers_waves', TRUE), ('digests_tokens', TRUE),
        |  ('idbloom_covers_waves', TRUE), ('meta', TRUE),
        |  ('token_in_waves', TRUE), ('tombstones', TRUE))
        |  AS t("check", ok)
        |ORDER BY "check"""".stripMargin,
    "dd_minhash_delete" ->
      ("SELECT TRUE AS delete_equals_direct, TRUE AS compact_equals_direct, " +
        "TRUE AS nonempty"),
    "tx_bm25_delete" -> bm25DeleteOracleSql,
    "tx_bm25_delete_text" -> bm25DeleteOracleSql,
    "dd_components_extend" ->
      ("SELECT TRUE AS extend_equals_full, TRUE AS nonempty, " +
        "TRUE AS merges_present"),
    "dd_components_shrink" ->
      ("SELECT TRUE AS shrink_equals_full, TRUE AS nonempty, " +
        "TRUE AS splits_present"),
    // the appended digest layout answers the same raw-text semantics,
    // restricted to exactly the two admitted corpus waves
    "dd_digest_append" ->
      s"""WITH wave AS ($digestWaveSql)
         |SELECT w.id_new, c.doc_id AS id_corpus
         |FROM wave w JOIN documents c ON w.text = c.text
         |WHERE c.doc_id % 10 >= 1
         |ORDER BY id_new, id_corpus""".stripMargin,
    "dd_minhash_append" ->
      ("SELECT TRUE AS append_equals_direct, TRUE AS compact_equals_direct, " +
        "TRUE AS nonempty"),
    // the at-rest index must be invisible in results: the verdict row
    // pins the engine-side full-outer equality with the direct form
    "dd_minhash_index" ->
      "SELECT TRUE AS index_equals_direct, TRUE AS nonempty",
    // full replay of the decontamination sweep: same whitespace class,
    // same sliding 8-gram windows, same string-keyed join
    "pp_contamination" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\r]+') AS t
        |  FROM documents
        |), grams AS (
        |  SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS gram
        |  FROM tok, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
        |  WHERE len(t) >= 8
        |)
        |SELECT c.doc_id AS doc_id, e.doc_id AS eval_id,
        |  count(*) AS shared_grams
        |FROM grams c JOIN grams e ON c.gram = e.gram
        |WHERE c.doc_id % 7 <> 0 AND e.doc_id % 7 = 0
        |GROUP BY 1, 2 ORDER BY doc_id, eval_id""".stripMargin,
    // boilerplate = 5-grams in >= 2 distinct docs; same tok/grams CTE
    // shape as pp_contamination (hash-proven tokenizer), integer counts
    // and one double division
    "pp_url_dedup" ->
      """WITH urls AS (
        |  SELECT doc_id, CASE CAST(doc_id % 4 AS INTEGER)
        |    WHEN 0 THEN 'https://example.com/article/' || CAST(doc_id % 50 AS VARCHAR) || '?b=2&a=1'
        |    WHEN 1 THEN 'HTTPS://EXAMPLE.COM:443/article/' || CAST(doc_id % 50 AS VARCHAR) || '?a=1&b=2#frag'
        |    WHEN 2 THEN 'https://www.example.com/article/' || CAST(doc_id % 50 AS VARCHAR) || '?a=1&utm_source=x&b=2'
        |    ELSE 'http://example.com:80/item/' || CAST(doc_id % 50 AS VARCHAR) || '/'
        |  END AS url FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '', 'g') AS u FROM urls),
        |s2 AS (SELECT doc_id,
        |  lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0))
        |  || substr(u, length(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)) + 1) AS u FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(u, '^(https?://)www\.', '\1', 'g') AS u FROM s2),
        |s4 AS (SELECT doc_id, regexp_replace(regexp_replace(u,
        |  '^(https://[^/?#:]*):443([/?#].*)?$', '\1\2', 'g'),
        |  '^(http://[^/?#:]*):80([/?#].*)?$', '\1\2', 'g') AS u FROM s3),
        |s5 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(u,
        |  '([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*', '\1', 'g'),
        |  '&&+', '&', 'g'), '\?&', '?', 'g'), '[?&]+$', '', 'g') AS u FROM s4),
        |s6 AS (SELECT doc_id, CASE WHEN length(regexp_extract(u, '\?(.*)$', 1)) > 0
        |  THEN regexp_replace(u, '\?.*$', '', 'g') || '?' ||
        |    array_to_string(list_sort(string_split(regexp_extract(u, '\?(.*)$', 1), '&')), '&')
        |  ELSE u END AS u FROM s5),
        |s7 AS (SELECT doc_id, regexp_replace(u, '^(https?://[^/?#]*)/+$', '\1', 'g') AS url_norm FROM s6)
        |SELECT doc_id, url_norm FROM (
        |  SELECT doc_id, url_norm,
        |    row_number() OVER (PARTITION BY url_norm ORDER BY doc_id) AS rn FROM s7) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "pp_pii_redact" ->
      """WITH planted AS (
        |  SELECT doc_id, text
        |    || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |    || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
        |    || CAST(doc_id % 100 AS VARCHAR)
        |    || ' call +1415555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    || ' ssn 123-45-6789' AS text
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
        |    '\+?\b\d{10,15}\b', '<PHONE>', 'g') AS text_clean,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  len(regexp_extract_all(text, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS n_ipv4,
        |  len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn,
        |  len(regexp_extract_all(text, '\+?\b\d{10,15}\b')) AS n_phone,
        |    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |  + len(regexp_extract_all(text, '\b(\d{1,3}\.){3}\d{1,3}\b'))
        |  + len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))
        |  + len(regexp_extract_all(text, '\+?\b\d{10,15}\b')) AS n_pii
        |FROM planted ORDER BY doc_id""".stripMargin,
    "pp_boilerplate" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\r]+') AS t
        |  FROM documents
        |), grams AS (
        |  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS gram
        |  FROM tok, UNNEST(generate_series(1, len(t) - 4)) AS u(i)
        |  WHERE len(t) >= 5
        |), df AS (
        |  SELECT gram, count(*) AS docfreq FROM grams GROUP BY gram
        |)
        |SELECT g.doc_id AS doc_id,
        |  count(*) AS total_grams,
        |  count(d.gram) AS boilerplate_grams,
        |  CAST(count(d.gram) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS boilerplate_frac
        |FROM grams g LEFT JOIN df d ON g.gram = d.gram AND d.docfreq >= 2
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // winnowing: window-min over md5 hex gram hashes; pos is 0-based in
    // Spark (posexplode) so the DuckDB gram CTE subtracts 1. A window
    // starting at pos is full iff pos <= n_grams - w.
    // CDC contract row: boundaries are hash-private, the properties are
    // verified engine-side; DuckDB predicts the verdict table's shape
    "tx_cdc_chunks" ->
      """SELECT doc_id, TRUE AS reassembles, TRUE AS sizes_ok,
        |  TRUE AS last_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tx_winnow" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\r]+') AS t
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id, i - 1 AS pos, md5(array_to_string(t[i:i+3], ' ')) AS h
        |  FROM tok, UNNEST(generate_series(1, len(t) - 3)) AS u(i)
        |  WHERE len(t) >= 4
        |), win AS (
        |  SELECT doc_id, pos,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
        |    count(*) OVER (PARTITION BY doc_id) AS n_grams
        |  FROM grams
        |)
        |SELECT DISTINCT doc_id, wmin AS fingerprint
        |FROM win WHERE pos <= n_grams - 4
        |ORDER BY doc_id, fingerprint""".stripMargin,
    // context-window chunking: 64-token chunks, stride 48; chunk count
    // = ceil((n - 64)/48) + 1 (min 1), chunk c = tokens [c*48, c*48+64)
    "tx_token_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                q -> q != '') AS t
        |  FROM documents
        |), n AS (
        |  SELECT doc_id, t, len(t) AS nt,
        |    CASE WHEN len(t) <= 64 THEN 1
        |         ELSE (len(t) - 64 + 47) // 48 + 1 END AS nchunks
        |  FROM toks WHERE len(t) >= 1
        |)
        |SELECT doc_id, c AS chunk_id,
        |  array_to_string(t[c * 48 + 1 : c * 48 + 64], ' ') AS chunk_text
        |FROM n, UNNEST(generate_series(0, nchunks - 1)) AS u(c)
        |ORDER BY doc_id, chunk_id""".stripMargin,
    // temperature mixture: sqrt(n) shares (correctly rounded in both
    // engines), DECIMAL(38,6) order-independent denominator, the
    // two-halves Knuth-hash filter of pp_mixture_sample, and the rate
    // expression shape-identical to the Spark least(...) column
    "pp_temperature" ->
      """WITH g AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |s AS (SELECT lang, n, sqrt(CAST(n AS DOUBLE)) AS sg FROM g),
        |t AS (SELECT CAST(sum(CAST(sg AS DECIMAL(38,6))) AS DOUBLE) AS tot FROM s),
        |r AS (SELECT lang,
        |        least(1.0, CAST(200 AS DOUBLE) * (sg / t.tot) / CAST(n AS DOUBLE))
        |          AS samp_rate
        |      FROM s, t)
        |SELECT d.doc_id, d.lang, r.samp_rate
        |FROM documents d JOIN r ON d.lang = r.lang
        |WHERE ((doc_id % 4294967296 // 65536 * 2654435761 % 4294967296)
        |         * 65536 + doc_id % 65536 * 2654435761) % 4294967296
        |      / 4294967296.0 < r.samp_rate
        |ORDER BY doc_id""".stripMargin,
    // DSIR importance weights: raw/target unigram count tables, the
    // fixed-shape smoothed ratio ((m+1)/(M+V)) / ((n+1)/(N+V)), the
    // dsum DECIMAL(18,6) per-doc sum, one final division — every
    // arithmetic step shape-identical to the Spark side
    "pp_importance" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                       q -> q != '')) AS tok
        |  FROM documents),
        |raw AS (SELECT tok, count(*) AS n FROM tk GROUP BY tok),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |               CAST(count(*) AS BIGINT) AS v FROM raw),
        |ttk AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                            q -> q != '')) AS tok
        |  FROM documents WHERE lang = 'en'),
        |tgt AS (SELECT tok, count(*) AS m FROM ttk GROUP BY tok),
        |mtot AS (SELECT CAST(coalesce(sum(m), 0) AS BIGINT) AS mm FROM tgt),
        |ratio AS (
        |  SELECT r.tok,
        |    (CAST(coalesce(t.m, 0) + 1 AS DOUBLE) / CAST(mt.mm + tt.v AS DOUBLE))
        |      / (CAST(r.n + 1 AS DOUBLE) / CAST(tt.nn + tt.v AS DOUBLE)) AS rr
        |  FROM raw r LEFT JOIN tgt t ON r.tok = t.tok, tot tt, mtot mt),
        |pd AS (
        |  SELECT k.doc_id,
        |    CAST(sum(CAST(rr AS DECIMAL(18,6))) AS DOUBLE) AS s,
        |    CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM tk k JOIN ratio ON k.tok = ratio.tok GROUP BY k.doc_id)
        |SELECT d.doc_id,
        |  coalesce(pd.n_tokens, 0) AS n_tokens,
        |  CASE WHEN coalesce(pd.n_tokens, 0) = 0 THEN 0.0
        |       ELSE pd.s / CAST(pd.n_tokens AS DOUBLE) END AS imp_weight
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // BPE pair statistics: word vocabulary (counts), character split via
    // regexp_extract_all('.') — RE2 '.' == Java '.' on whitespace-free
    // words — adjacent pair expansion, integer-weighted count, topN cut
    // with a lexicographic tie-break (generate_series(1,0) is empty in
    // DuckDB, so 1-char words vanish exactly like the guarded Spark side)
    "tx_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                            q -> q != '')) AS w
        |  FROM documents),
        |wc AS (SELECT w, count(*) AS n FROM w GROUP BY w),
        |ch AS (SELECT n, regexp_extract_all(w, '.') AS cs FROM wc),
        |pr AS (
        |  SELECT cs[i] AS lhs, cs[i + 1] AS rhs, n
        |  FROM (SELECT n, cs, unnest(generate_series(1, len(cs) - 1)) AS i
        |        FROM ch) t)
        |SELECT lhs, rhs, pair_count FROM (
        |  SELECT lhs, rhs, CAST(sum(n) AS BIGINT) AS pair_count
        |  FROM pr GROUP BY lhs, rhs
        |  ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 50) z
        |ORDER BY lhs, rhs""".stripMargin,
    // substring near-dup candidates: self-join of the winnowing
    // fingerprint sets (same CTE chain as tx_winnow)
    "dd_winnow_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\r]+') AS t
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id, i - 1 AS pos, md5(array_to_string(t[i:i+3], ' ')) AS h
        |  FROM tok, UNNEST(generate_series(1, len(t) - 3)) AS u(i)
        |  WHERE len(t) >= 4
        |), win AS (
        |  SELECT doc_id, pos,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
        |    count(*) OVER (PARTITION BY doc_id) AS n_grams
        |  FROM grams
        |), fps AS (
        |  SELECT DISTINCT doc_id, wmin AS fingerprint
        |  FROM win WHERE pos <= n_grams - 4
        |)
        |SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS shared_fps
        |FROM fps a JOIN fps b
        |  ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY id1, id2""".stripMargin,
    // contiguous next-fit packing: exclusive prefix sum of whitespace
    // token counts per source shard, integral division by the 2048
    // capacity — integer arithmetic end to end
    "pp_sequence_pack" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                         q -> q != '')) AS BIGINT) AS tok_count
        |  FROM documents
        |)
        |SELECT source, doc_id, tok_count,
        |  CAST(COALESCE(sum(tok_count) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS cum_tokens,
        |  CAST(COALESCE(sum(tok_count) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048
        |    AS BIGINT) AS bin
        |FROM toks ORDER BY source, doc_id""".stripMargin,
    // corpus-wide packing: the Spark side's two-pass decomposed scan
    // must equal ONE plain global window sum over (source, doc_id)
    "pp_sequence_pack_global" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                         q -> q != '')) AS BIGINT) AS tok_count
        |  FROM documents
        |)
        |SELECT source, doc_id, tok_count,
        |  CAST(COALESCE(sum(tok_count) OVER (ORDER BY source, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS cum_tokens,
        |  CAST(COALESCE(sum(tok_count) OVER (ORDER BY source, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048
        |    AS BIGINT) AS bin
        |FROM toks ORDER BY source, doc_id""".stripMargin,
    // exact replay of the Knuth-hash mixture sampler: same integer
    // arithmetic, same IEEE constants, exact power-of-two division.
    // The multiply runs in two 16-bit halves exactly like knuthFrac —
    // the naive (doc_id * 2654435761) raises an out-of-range error in
    // DuckDB past doc_id ~3.5e9, so the engine-portability claim needs
    // the overflow-free form on BOTH sides (same values for any
    // non-negative 64-bit id)
    "pp_mixture_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ((doc_id % 4294967296 // 65536 * 2654435761 % 4294967296)
        |         * 65536 + doc_id % 65536 * 2654435761) % 4294967296
        |      / 4294967296.0 <
        |  CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0
        |            WHEN 'fr' THEN 0.25 WHEN 'es' THEN 0.1 ELSE 0.0 END
        |ORDER BY doc_id""".stripMargin,
    // same Knuth-hash fold as pp_mixture_sample, here as the window
    // ORDER key: exactly 40 rows per language, ties broken by id
    "pp_stratified_sample" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    ((doc_id % 4294967296 // 65536 * 2654435761 % 4294967296)
        |       * 65536 + doc_id % 65536 * 2654435761) % 4294967296 AS hk
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn
        |  FROM h)
        |SELECT doc_id, lang FROM r WHERE rn <= 40
        |ORDER BY doc_id""".stripMargin,
    // same Knuth-hash fold as pp_mixture_sample; bounds 0.75/0.875 are
    // exact binary doubles so the CASE replays bit-for-bit
    "pp_split_assign" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    ((doc_id % 4294967296 // 65536 * 2654435761 % 4294967296)
        |       * 65536 + doc_id % 65536 * 2654435761) % 4294967296
        |      / 4294967296.0 AS f
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN f < 0.75 THEN 'train'
        |       WHEN f < 0.875 THEN 'val' ELSE 'test' END AS split
        |FROM h ORDER BY doc_id""".stripMargin,
    // decimal-exact per-source mean of the shared quality expression
    "pp_source_filter" ->
      s"""WITH stats AS (
         |  SELECT source,
         |    CAST(SUM(CAST(($qualitySql) AS DECIMAL(18,6))) AS DOUBLE)
         |      / count(*) AS source_mean_q
         |  FROM documents GROUP BY source)
         |SELECT d.doc_id, d.source, s.source_mean_q
         |FROM documents d JOIN stats s USING (source)
         |WHERE s.source_mean_q >= 0.645
         |ORDER BY d.doc_id""".stripMargin,
    // integer occurrence counting on the proven whitespace tokenizer;
    // the one double division at the end is correctly rounded in both
    // engines (no log — ln is not required correctly rounded)
    "tx_unigram_quality" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                       q -> q != '')) AS tok
        |  FROM documents
        |), cnt AS (
        |  SELECT tok, count(*) AS c FROM tok GROUP BY 1
        |), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
        |per AS (
        |  SELECT t.doc_id, count(*) AS n_tokens,
        |    CAST(sum(c.c) AS BIGINT) AS sum_cnt
        |  FROM tok t JOIN cnt c USING (tok) GROUP BY 1
        |)
        |SELECT d.doc_id, COALESCE(p.n_tokens, 0) AS n_tokens,
        |  COALESCE(p.sum_cnt, 0) AS sum_cnt,
        |  CASE WHEN COALESCE(p.n_tokens, 0) = 0 THEN 0.0
        |       ELSE CAST(p.sum_cnt AS DOUBLE)
        |              / CAST(p.n_tokens * n AS DOUBLE) END AS unigram_score
        |FROM documents d LEFT JOIN per p USING (doc_id), tot
        |ORDER BY doc_id""".stripMargin,
    // contract oracle: exact vocab count + TRUE verdict (Spark's HLL++
    // registers aren't replayable in DuckDB; the 5%-of-exact contract is)
    "tx_vocab_sketch" ->
      """WITH tok AS (
        |  SELECT lang,
        |    unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                       q -> q != '')) AS tok
        |  FROM documents)
        |SELECT lang, COUNT(DISTINCT tok) AS n_distinct_exact,
        |  TRUE AS within_bound
        |FROM tok GROUP BY lang ORDER BY lang""".stripMargin,
    "pp_group_cap" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM documents) t
        |WHERE rn <= 50 ORDER BY doc_id""".stripMargin,
    // the two-halves Knuth fold of (doc_id + epoch*1000003); shard is
    // the key's top bits via exact integer arithmetic (k*8 < 2^35, and
    // /2^32 is a binary-exponent shift, so both engines' floors agree)
    "pp_epoch_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    (((doc_id + 1000003) % 4294967296 // 65536 * 2654435761
        |        % 4294967296) * 65536
        |      + (doc_id + 1000003) % 65536 * 2654435761) % 4294967296 AS k
        |  FROM documents)
        |SELECT doc_id, CAST(k * 8 // 4294967296 AS INT) AS shard,
        |  row_number() OVER (PARTITION BY k * 8 // 4294967296
        |                     ORDER BY k, doc_id) AS pos
        |FROM h ORDER BY doc_id""".stripMargin,
    // the sketch prefilter never reaches the output — the oracle is the
    // plain exact heavy-hitter query
    "tx_heavy_ngrams" ->
      """WITH tok AS (
        |  SELECT regexp_split_to_array(trim(text), '[ \t\n\r]+') AS t
        |  FROM documents
        |), grams AS (
        |  SELECT array_to_string(t[i:i+2], ' ') AS gram
        |  FROM tok, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
        |  WHERE len(t) >= 3
        |)
        |SELECT gram, count(*) AS cnt FROM grams
        |GROUP BY gram HAVING count(*) >= 4 ORDER BY gram""".stripMargin,
    "pp_group_top_frac" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                    q -> q != '')) AS tc
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY tc DESC, doc_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM t)
        |SELECT doc_id, source FROM r
        |WHERE rn <= CAST(ceil(n * 0.25) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,
    // cap contract fully determined by the templated cluster (see
    // minHashCappedQ scaladoc): one all-TRUE verdict row
    "dd_minhash_pairs_capped" ->
      """SELECT TRUE AS all_ordered, TRUE AS all_above_threshold,
        |  TRUE AS all_jaccard_exact, TRUE AS no_cluster_pair_survives,
        |  TRUE AS cut_covers_cluster, TRUE AS every_band_reports_cluster,
        |  TRUE AS max_bucket_covers_cluster""".stripMargin,
    // full row-level replay: pigeonhole blocking (maxHamming < blocks) is
    // complete, so the operator's result == every pair at Hamming <= 3
    // over the replayed signatures
    "dd_simhash_pairs" ->
      s"""WITH RECURSIVE $simhashCteSql
         |SELECT id1, id2, hamming FROM (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2,
         |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |  FROM simdocs a JOIN simdocs b ON a.doc_id < b.doc_id) t
         |WHERE hamming <= 3 ORDER BY id1, id2""".stripMargin,
    // ASCII corpus (verified): per-char Character.toLowerCase == lower(),
    // UTF-16 units == codepoints, the CJK-script branch never fires
    "tx_langid_fingerprint" ->
      """SELECT doc_id, lang,
        |  CASE WHEN greatest(he, hd, hf, hs) = 0 THEN 'und'
        |       WHEN he = greatest(he, hd, hf, hs) THEN 'en'
        |       WHEN hd = greatest(he, hd, hf, hs) THEN 'de'
        |       WHEN hf = greatest(he, hd, hf, hs) THEN 'fr'
        |       ELSE 'es' END AS lang_guess,
        |  CAST(fpu - 18446744073709551616 * (fpu // 9223372036854775808) AS BIGINT) AS fp64
        |FROM (
        |  SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), q -> q != '') AS toks,
        |    len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','that','it','for'))) AS he,
        |    len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','mit','zu','den'))) AS hd,
        |    len(list_filter(toks, t -> t IN ('le','la','les','et','est','un','une','des','que','pour'))) AS hf,
        |    len(list_filter(toks, t -> t IN ('el','la','los','las','y','es','un','una','que','por'))) AS hs,
        |    list_reduce(
        |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |        list_transform(regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '.'),
        |                       c -> CAST(unicode(c) AS HUGEINT))),
        |      (h, c) -> ((h - h % 128 + CAST(xor(CAST(h % 128 AS BIGINT), CAST(c AS BIGINT)) AS HUGEINT))
        |                 * 1099511628211) % 18446744073709551616) AS fpu
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "ann_brute_topk" ->
      s"""SELECT vec_id, cos FROM (
         |  WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |  SELECT vec_id, ${cosSql("embedding", "qv")} AS cos
         |  FROM embeddings, q
         |  ORDER BY cos DESC, vec_id ASC LIMIT 10) t
         |ORDER BY vec_id""".stripMargin,
    // same sequential (f64(a)-f64(b))^2 accumulation as VectorKernels.l2F
    "emb_knn_join" ->
      """SELECT vec_id, vec_id2, l2 FROM (
        |  SELECT a.vec_id AS vec_id, b.vec_id AS vec_id2,
        |    sqrt(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
        |         * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))) AS l2,
        |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
        |      ORDER BY sqrt(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |        x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
        |           * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))) ASC,
        |        b.vec_id ASC) AS rn
        |  FROM embeddings a CROSS JOIN embeddings b) t
        |WHERE rn <= 3 ORDER BY vec_id, vec_id2""".stripMargin,
    // BM25 with the odds-ratio idf: every constant and association in
    // the score expression is written identically to the Spark side
    // (tf * (k1 + 1.0), (1.0 - b) + b * dl / avgdl, terms summed left
    // to right), so the doubles are bit-equal. Stats (n, avgdl, df)
    // are exact integers cast once to double in both engines. The
    // inexact constant 1.2 is CAST to DOUBLE explicitly: DuckDB parses
    // bare numeric literals as DECIMAL, and decimal-exact tf*2.2 is one
    // ulp off double tf*(1.2+1.0) (binary-exact 0.5/0.75/0.25 literals
    // elsewhere in this file are immune).
    "tx_bm25" -> bm25OracleSql,
    // the boolean AND answered from posting slivers must equal the
    // raw-text conjunction
    "tx_match_all" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != '') AS toks
        |  FROM documents)
        |SELECT doc_id, len(toks) AS dl FROM tk
        |WHERE list_contains(toks, 'spark') AND list_contains(toks, 'hash')
        |  AND list_contains(toks, 'customer')
        |ORDER BY doc_id""".stripMargin,
    // quoted-phrase retrieval: posting-sliver candidates + adjacency
    // confirm over only those docs must equal the boundary-safe
    // padded-join containment over the raw corpus
    "tx_phrase_index" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != '') AS toks
        |  FROM documents)
        |SELECT doc_id, len(toks) AS n_tokens FROM tk
        |WHERE ' ' || array_to_string(toks, ' ') || ' ' LIKE '% the spark %'
        |ORDER BY doc_id""".stripMargin,
    "tx_hybrid_query_join" ->
      ("""WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != '') AS toks
        |  FROM documents),
        |base AS (SELECT doc_id, toks, len(toks) AS dl FROM tk),
        |st AS (SELECT count(*) AS n,
        |  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM base),
        |queries(qid, term) AS (VALUES
        |  (1, 'spark'), (1, 'vector'), (1, 'window'),
        |  (2, 'customer'), (2, 'hash'),
        |  (3, 'merge'), (3, 'scan')),
        |dfs AS (
        |  SELECT t.term,
        |    CAST(sum(CASE WHEN list_contains(b.toks, t.term) THEN 1 ELSE 0 END) AS DOUBLE) AS df
        |  FROM (SELECT DISTINCT term FROM queries) t, base b GROUP BY t.term),
        |contrib AS (
        |  SELECT q.qid, b.doc_id, b.dl,
        |    ((st.n - d.df + 0.5) / (d.df + 0.5))
        |      * (CAST(len(list_filter(b.toks, x -> x = q.term)) AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
        |      / (CAST(len(list_filter(b.toks, x -> x = q.term)) AS DOUBLE)
        |         + CAST(1.2 AS DOUBLE) * ((1.0 - 0.75) + 0.75 * CAST(b.dl AS DOUBLE) / st.avgdl)) AS c
        |  FROM queries q
        |  JOIN dfs d ON d.term = q.term, base b, st
        |  WHERE list_contains(b.toks, q.term)),
        |bscores AS (
        |  SELECT qid, doc_id,
        |    CAST(sum(CAST(c AS DECIMAL(18,6))) AS DOUBLE) AS score
        |  FROM contrib GROUP BY qid, doc_id),
        |cand AS (
        |  SELECT qid, doc_id, score FROM (
        |    SELECT qid, doc_id, score,
        |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rn
        |    FROM bscores WHERE score > 0) t
        |  WHERE rn <= 20),
        |qv AS (SELECT CAST(vec_id + 1 AS INTEGER) AS qid, embedding AS qemb
        |  FROM embeddings WHERE vec_id < 3),
        |rer AS (
        |  SELECT c.qid, c.doc_id, c.score,
        |    list_sum(list_transform(list_zip(e.embedding, qv.qemb),
        |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(qv.qemb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
        |  FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id
        |  JOIN qv ON qv.qid = c.qid)
        |SELECT CAST(qid AS BIGINT) AS qid, doc_id, score, cos FROM (
        |  SELECT qid, doc_id, score, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, doc_id ASC) AS rn
        |  FROM rer) t
        |WHERE rn <= 5
        |ORDER BY qid, doc_id""").stripMargin,
    "tx_bm25_query_join" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != '') AS toks
        |  FROM documents),
        |base AS (SELECT doc_id, toks, len(toks) AS dl FROM tk),
        |st AS (SELECT count(*) AS n,
        |  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM base),
        |queries(qid, term) AS (VALUES
        |  (1, 'spark'), (1, 'vector'), (1, 'window'),
        |  (2, 'customer'), (2, 'hash'),
        |  (3, 'merge'), (3, 'zzz_not_a_token')),
        |dfs AS (
        |  SELECT t.term,
        |    CAST(sum(CASE WHEN list_contains(b.toks, t.term) THEN 1 ELSE 0 END) AS DOUBLE) AS df
        |  FROM (SELECT DISTINCT term FROM queries) t, base b GROUP BY t.term),
        |contrib AS (
        |  SELECT q.qid, b.doc_id, b.dl,
        |    ((st.n - d.df + 0.5) / (d.df + 0.5))
        |      * (CAST(len(list_filter(b.toks, x -> x = q.term)) AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
        |      / (CAST(len(list_filter(b.toks, x -> x = q.term)) AS DOUBLE)
        |         + CAST(1.2 AS DOUBLE) * ((1.0 - 0.75) + 0.75 * CAST(b.dl AS DOUBLE) / st.avgdl)) AS c
        |  FROM queries q
        |  JOIN dfs d ON d.term = q.term, base b, st
        |  WHERE list_contains(b.toks, q.term)),
        |scores AS (
        |  SELECT qid, doc_id, max(dl) AS dl,
        |    CAST(sum(CAST(c AS DECIMAL(18,6))) AS DOUBLE) AS score
        |  FROM contrib GROUP BY qid, doc_id)
        |SELECT CAST(qid AS BIGINT) AS qid, doc_id, dl, score FROM (
        |  SELECT qid, doc_id, dl, score,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rn
        |  FROM scores WHERE score > 0) t
        |WHERE rn <= 5
        |ORDER BY qid, doc_id""".stripMargin,
    "tx_phrase_bool" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), q -> q != '') AS toks
        |  FROM documents),
        |p AS (SELECT doc_id, len(toks) AS n_tokens,
        |  ' ' || array_to_string(toks, ' ') || ' ' AS pad FROM tk)
        |SELECT doc_id, n_tokens FROM p
        |WHERE (pad LIKE '% the spark %' OR pad LIKE '% hash join %')
        |  AND (pad LIKE '% big table %' OR pad LIKE '% customer %')
        |ORDER BY doc_id""".stripMargin,
    // the at-rest BM25 index must reproduce the from-scratch scorer
    // exactly — SAME oracle text
    "tx_bm25_index" -> bm25OracleSql,
    "tx_hybrid_retrieve" -> hybridOracleSql,
    // both stages at rest, same reference semantics — SAME oracle text
    "tx_hybrid_index" -> hybridOracleSql,
    "emb_kmeans" ->
      s"""WITH ${kmeansCteSql(k = 8, iters = 2, seed = 42L)},
         |${kmeansAssignSql(iters = 2)}
         |SELECT vec_id, cluster FROM kmf ORDER BY vec_id""".stripMargin,
    // trained IVF: same k-means CTEs; probe = nprobe cells nearest the
    // query's quantized vector in L2 (tie to lowest cid), then exact
    // cosine top-k inside probed cells
    "ann_ivf_trained_topk" ->
      s"""WITH ${kmeansCteSql(k = 8, iters = 2, seed = 42L)},
         |${kmeansAssignSql(iters = 2)},
         |qq AS (SELECT qv FROM kq WHERE vec_id = 0),
         |eq AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |probes AS (
         |  SELECT cid FROM (
         |    SELECT c.cid, row_number() OVER (
         |        ORDER BY list_sum(list_transform(list_zip(q.qv, c.cv),
         |            x -> (CAST(x[1] AS DOUBLE) - x[2]) * (CAST(x[1] AS DOUBLE) - x[2]))) ASC,
         |          c.cid ASC) AS pr
         |    FROM c2 c, qq q) p
         |  WHERE pr <= 2)
         |SELECT vec_id, cos FROM (
         |  SELECT a.vec_id, ${cosSql("e.embedding", "eq.qe")} AS cos
         |  FROM kmf a
         |  JOIN probes ON a.cluster = probes.cid
         |  JOIN embeddings e ON e.vec_id = a.vec_id, eq
         |  ORDER BY cos DESC, a.vec_id ASC LIMIT 10) t
         |ORDER BY vec_id""".stripMargin,
    // product quantization: per-subspace k-means CTEs slicing ONE seed
    // set, ADC candidate scoring, exact cosine top-k over the refined
    // set — the full index replayed
    "ann_pq_topk" ->
      s"""WITH ${pqCteSql(m = 4, ksub = 4, iters = 2, seed = 42L, dim = 64)},
         |cand AS (SELECT vec_id FROM adc ORDER BY score ASC, vec_id ASC LIMIT 50),
         |eq AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, cos FROM (
         |  SELECT e.vec_id, ${cosSql("e.embedding", "eq.qe")} AS cos
         |  FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id, eq
         |  ORDER BY cos DESC, e.vec_id ASC LIMIT 10) t
         |ORDER BY vec_id""".stripMargin,
    // composed IVF-PQ: coarse k-means CTEs (cells + probes), PQ CTEs
    // (codes + ADC), candidate = probed cells ranked by ADC, exact
    // cosine top-k — the whole two-level index replayed in one query.
    // The disk-layout twin (ann_ivfpq_disk_topk, below) answers to the
    // SAME replay: the layout changes where bytes live, not values.
    "ann_ivfpq_topk" ->
      s"""WITH ${kmeansCteSql(k = 8, iters = 2, seed = 42L)},
         |${kmeansAssignSql(iters = 2)},
         |${pqCteSql(m = 4, ksub = 4, iters = 2, seed = 42L, dim = 64)},
         |qiq AS (SELECT qv FROM kq WHERE vec_id = 0),
         |probes AS (
         |  SELECT cid FROM (
         |    SELECT c.cid, row_number() OVER (
         |        ORDER BY list_sum(list_transform(list_zip(q.qv, c.cv),
         |            x -> (CAST(x[1] AS DOUBLE) - x[2]) * (CAST(x[1] AS DOUBLE) - x[2]))) ASC,
         |          c.cid ASC) AS pr
         |    FROM c2 c, qiq q) p
         |  WHERE pr <= 4),
         |cand AS (
         |  SELECT a.vec_id FROM adc a
         |  JOIN kmf ON kmf.vec_id = a.vec_id
         |  JOIN probes ON kmf.cluster = probes.cid
         |  ORDER BY a.score ASC, a.vec_id ASC LIMIT 50),
         |eq2 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, cos FROM (
         |  SELECT e.vec_id, ${cosSql("e.embedding", "eq2.qe")} AS cos
         |  FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id, eq2
         |  ORDER BY cos DESC, e.vec_id ASC LIMIT 10) t
         |ORDER BY vec_id""".stripMargin,
    "dd_semantic_pairs" ->
      s"""WITH ${kmeansCteSql(k = 8, iters = 2, seed = 42L)},
         |${kmeansAssignSql(iters = 2)}
         |SELECT cluster, id1, id2, cos FROM (
         |  SELECT a.cluster AS cluster, a.vec_id AS id1, b.vec_id AS id2,
         |    ${cosSql("e1.embedding", "e2.embedding")} AS cos
         |  FROM kmf a JOIN kmf b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  JOIN embeddings e1 ON e1.vec_id = a.vec_id
         |  JOIN embeddings e2 ON e2.vec_id = b.vec_id) t
         |WHERE cos >= 0.8 ORDER BY id1, id2""".stripMargin,
    "emb_sim_join" ->
      s"""SELECT vec_id, vec_id2, cos FROM (
         |  SELECT a.vec_id AS vec_id, b.vec_id AS vec_id2,
         |    ${cosSql("a.embedding", "b.embedding")} AS cos
         |  FROM embeddings a, embeddings b
         |  WHERE a.vec_id < b.vec_id) t
         |WHERE cos >= 0.3 ORDER BY vec_id, vec_id2""".stripMargin,
    // Jaccard over token-3-gram STRING sets == the kernel's Jaccard over
    // hashed shingle sets (hash-injective modulo negligible collisions);
    // docs under 3 tokens contribute their whole token stream as the one
    // shingle, exactly like TextKernels.shingleHashes. Blocking key
    // xxhash64(lang) == equality on lang. The division is an exact
    // integer ratio in both engines -> bit-identical doubles.
    "dd_ngram_jaccard_pairs" ->
      s"""WITH $ngramShingleCteSql
         |$ngramPairsSelectSql
         |ORDER BY id1, id2""".stripMargin,
    // connected components over the SAME deterministic pair list: every
    // doc labeled with the min id reachable through near-dup edges — the
    // recursive CTE terminates because (id, lbl) pairs are finite and
    // UNION deduplicates
    // retention on top of the same components: each component keeps its
    // best member under (quality DESC, doc_id ASC) — quality doubles are
    // the bit-parity tx_stats expression, so the argmax agrees exactly
    "dd_keep_best" ->
      s"""WITH RECURSIVE $ngramShingleCteSql,
         |pairs AS ($ngramPairsSelectSql),
         |edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
         |          UNION ALL SELECT id2 AS src, id1 AS dst FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id AS doc_id, MIN(lbl) AS component FROM reach GROUP BY id),
         |qual AS (SELECT doc_id, $qualitySql AS quality FROM documents)
         |SELECT doc_id, component, quality FROM (
         |  SELECT c.doc_id, c.component, q.quality,
         |    row_number() OVER (PARTITION BY c.component
         |      ORDER BY q.quality DESC, c.doc_id ASC) AS rn
         |  FROM comp c JOIN qual q ON q.doc_id = c.doc_id) t
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "dd_components" ->
      s"""WITH RECURSIVE $ngramShingleCteSql,
         |pairs AS ($ngramPairsSelectSql),
         |edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
         |          UNION ALL SELECT id2 AS src, id1 AS dst FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id)
         |SELECT id AS doc_id, MIN(lbl) AS component FROM reach
         |GROUP BY id ORDER BY doc_id""".stripMargin,
    // two Knuth folds (bucket at seed 0, in-bucket order at seed 1),
    // window rank + circular modular offsets — integer-exact
    "pp_mine_negatives" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST(floor(((doc_id % 4294967296 // 65536 * 2654435761 % 4294967296)
        |       * 65536 + doc_id % 65536 * 2654435761) % 4294967296
        |      / 4294967296.0 * 16) AS INT) AS b,
        |    (((doc_id + 1) % 4294967296 // 65536 * 2654435761 % 4294967296)
        |       * 65536 + (doc_id + 1) % 65536 * 2654435761) % 4294967296 AS h2
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, b,
        |    row_number() OVER (PARTITION BY b ORDER BY h2, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY b) AS sz
        |  FROM h),
        |w AS (
        |  SELECT doc_id, b, rn, sz,
        |    unnest(range(1, least(3, sz - 1) + 1)) AS j
        |  FROM r WHERE sz > 1)
        |SELECT w.doc_id, t.doc_id AS neg_id, CAST(w.j AS INT) AS j
        |FROM w JOIN r t
        |  ON t.b = w.b AND t.rn = (w.rn - 1 + w.j) % w.sz + 1
        |ORDER BY w.doc_id, j""".stripMargin,
    // the dd_components labels fed through the pp_split_assign hash
    // CASE, keyed on the component
    "pp_leakage_free_split" ->
      s"""WITH RECURSIVE $ngramShingleCteSql,
         |pairs AS ($ngramPairsSelectSql),
         |edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
         |          UNION ALL SELECT id2 AS src, id1 AS dst FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id AS doc_id, MIN(lbl) AS component FROM reach
         |         GROUP BY id),
         |h AS (
         |  SELECT doc_id, component,
         |    ((component % 4294967296 // 65536 * 2654435761 % 4294967296)
         |       * 65536 + component % 65536 * 2654435761) % 4294967296
         |      / 4294967296.0 AS f
         |  FROM comp)
         |SELECT doc_id, component,
         |  CASE WHEN f < 0.75 THEN 'train'
         |       WHEN f < 0.875 THEN 'val' ELSE 'test' END AS split
         |FROM h ORDER BY doc_id""".stripMargin
  )

  // the disk layout persists the SAME index the in-memory verb builds
  // (identical training, codes, probes, ADC, refine arithmetic), so its
  // oracle IS the in-memory replay — the layout changes where bytes
  // live, never values
  val oracles: Map[String, String] =
    oracles0.updated("ann_ivfpq_disk_topk", oracles0("ann_ivfpq_topk"))
      // append at full probes + full refine re-ranks EXACTLY, so the
      // incremental layout answers to the brute-force oracle
      .updated("ann_ivfpq_append_topk", oracles0("ann_brute_topk"))
      // delete at the same escape answers the brute oracle over the
      // SURVIVORS — the tombstoned vectors must be unreachable
      .updated("ann_ivfpq_delete_topk",
        s"""SELECT vec_id, cos FROM (
           |  WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
           |  SELECT vec_id, ${cosSql("embedding", "qv")} AS cos
           |  FROM embeddings, q
           |  WHERE vec_id % 3 <> 0
           |  ORDER BY cos DESC, vec_id ASC LIMIT 10) t
           |ORDER BY vec_id""".stripMargin)
      // audit contract row (engine-side verification; per-query ADC
      // probe replays are out of a SQL oracle's reach)
      .updated("ann_ivfpq_audit",
        "SELECT CAST(4 AS BIGINT) AS n_queries, TRUE AS all_exact_at_full_probes")
      // chunk->doc pooling: decimal-exact per-position means replayed
      // row-for-row (ordinality is 1-based in DuckDB, posexplode 0-based)
      .updated("emb_mean_pool",
        """WITH ex AS (
          |  SELECT vec_id // 10 AS doc_id,
          |    unnest(generate_series(1, len(embedding))) - 1 AS p,
          |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 65536.0) AS BIGINT) AS xq
          |  FROM embeddings
          |), agg AS (
          |  SELECT doc_id, p, SUM(xq) AS s, COUNT(*) AS n
          |  FROM ex GROUP BY doc_id, p
          |)
          |SELECT doc_id,
          |  CAST(max(n) OVER (PARTITION BY doc_id) AS BIGINT) AS n_chunks,
          |  CAST(p AS INT) AS p,
          |  CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 65536.0) AS v
          |FROM agg ORDER BY doc_id, p""".stripMargin)
      // the ANN join at the exactness escape answers the brute cosine
      // top-k JOIN — same cosSql IEEE shape as ann_brute_topk, windowed
      // per wave row
      .updated("ann_ivfpq_join_topk",
        s"""SELECT qid, vec_id, cos FROM (
           |  SELECT a.vec_id AS qid, b.vec_id AS vec_id,
           |    ${cosSql("a.embedding", "b.embedding")} AS cos,
           |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
           |      ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC,
           |        b.vec_id ASC) AS rn
           |  FROM embeddings a CROSS JOIN embeddings b
           |  WHERE a.vec_id % 5 = 0) t
           |WHERE rn <= 3 ORDER BY qid, vec_id""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pp_curation_pipeline" -> (curationPipelineQ _),
    "pp_redact" -> (redactQ _),
    "pp_mixture_sample" -> (mixtureSampleQ _),
    "pp_stratified_sample" -> (stratifiedSampleQ _),
    "pp_group_cap" -> (groupCapQ _),
    "pp_epoch_shuffle" -> (epochShuffleQ _),
    "tx_heavy_ngrams" -> (heavyNgramsQ _),
    "pp_group_top_frac" -> (groupTopFractionQ _),
    "pp_split_assign" -> (splitAssignQ _),
    "pp_source_filter" -> (sourceFilterQ _),
    "tx_unigram_quality" -> (unigramQualityQ _),
    "tx_vocab_sketch" -> (vocabSketchQ _),
    "pp_contamination" -> (contaminationQ _),
    "pp_boilerplate" -> (boilerplateQ _),
    "pp_pii_redact" -> (piiRedactQ _),
    "pp_url_dedup" -> (urlDedupQ _),
    "pp_sequence_pack" -> (sequencePackQ _),
    "pp_sequence_pack_global" -> (sequencePackGlobalQ _),
    "tx_winnow" -> (winnowQ _),
    "tx_cdc_chunks" -> (cdcChunksQ _),
    "tx_token_chunks" -> (tokenChunksQ _),
    "tx_bpe_pairs" -> (bpePairsQ _),
    "pp_importance" -> (importanceQ _),
    "pp_temperature" -> (temperatureQ _),
    "dd_winnow_pairs" -> (winnowPairsQ _),
    "emb_quantize_int8" -> (quantizeQ _),
    "emb_random_project" -> (randomProjectQ _),
    "emb_pca" -> (principalComponentQ _),
    "dd_exact_dedup" -> (exactDedupQ _),
    "dd_minhash_pairs" -> (minHashPairsQ _),
    "dd_minhash_incremental" -> (minHashIncrementalQ _),
    "dd_minhash_index" -> (minHashIndexQ _),
    "dd_minhash_pairs_capped" -> (minHashCappedQ _),
    "dd_cdc_pairs" -> (cdcPairsQ _),
    "dd_cdc_dedup" -> (cdcDedupQ _),
    "dd_cdc_index" -> (cdcIndexQ _),
    "dd_digest_gate" -> (digestGateQ _),
    "dd_digest_admit" -> (digestAdmitQ _),
    "dd_cdc_append" -> (cdcAppendQ _),
    "dd_minhash_append" -> (minhashAppendQ _),
    "dd_digest_append" -> (digestAppendQ _),
    "dd_digest_delete" -> (digestDeleteQ _),
    "dd_index_fsck" -> (indexFsckQ _),
    "dd_cdc_delete" -> (cdcDeleteQ _),
    "dd_minhash_delete" -> (minHashDeleteQ _),
    "tx_bm25_delete" -> (bm25DeleteQ _),
    "tx_bm25_delete_text" -> (bm25DeleteTextQ _),
    "dd_simhash_pairs" -> (simHashPairsQ _),
    "dd_ngram_jaccard_pairs" -> (ngramJaccardPairsQ _),
    "dd_components" -> (componentsQ _),
    "dd_components_extend" -> (componentsExtendQ _),
    "dd_components_shrink" -> (componentsShrinkQ _),
    "pp_leakage_free_split" -> (leakageFreeSplitQ _),
    "pp_mine_negatives" -> (mineNegativesQ _),
    "dd_keep_best" -> (keepBestQ _),
    "dd_emb_near_dup" -> (embNearDupQ _),
    "tx_stats" -> (textStatsQ _),
    "tx_repetition" -> (repetitionQ _),
    "tx_token_counts" -> (tokenCountsQ _),
    "tx_langid_fingerprint" -> (langIdQ _),
    "ann_brute_topk" -> (annBruteTopKQ _),
    "ann_lsh_topk" -> (annLshTopKQ _),
    "ann_ivf_topk" -> (annIvfTopKQ _),
    "ann_ivf_disk_topk" -> (annIvfDiskQ _),
    "ann_ivf_delete_topk" -> (annIvfDeleteQ _),
    "emb_sim_join" -> (simJoinExactQ _),
    "emb_knn_join" -> (embKnnJoinQ _),
    "emb_kmeans" -> (kmeansQ _),
    "dd_semantic_pairs" -> (semanticPairsQ _),
    "tx_bm25" -> (bm25Q _),
    "tx_bm25_index" -> (bm25IndexQ _),
    "tx_match_all" -> (matchAllQ _),
    "tx_phrase_index" -> (phraseIndexQ _),
    "tx_phrase_bool" -> (phraseBoolQ _),
    "tx_bm25_query_join" -> (bm25QueryJoinQ _),
    "tx_hybrid_query_join" -> (hybridQueryJoinQ _),
    "tx_hybrid_retrieve" -> (hybridRetrieveQ _),
    "tx_hybrid_index" -> (hybridIndexQ _),
    "pp_semantic_contamination" -> (semanticContaminationQ _),
    "ann_ivf_trained_topk" -> (annIvfTrainedQ _),
    "ann_pq_topk" -> (annPqTopKQ _),
    "ann_ivfpq_topk" -> (annIvfPqTopKQ _),
    "ann_ivfpq_disk_topk" -> (annIvfPqDiskQ _),
    "ann_ivfpq_append_topk" -> (annIvfPqAppendQ _),
    "ann_ivfpq_delete_topk" -> (annIvfPqDeleteQ _),
    "ann_ivfpq_join_topk" -> (annIvfPqJoinQ _),
    "emb_mean_pool" -> (meanPoolQ _),
    "ann_ivfpq_audit" -> (annIvfPqAuditQ _),
    "pp_passage_dedup" -> (passageDedupQ _),
    "tx_bigram_quality" -> (bigramQualityQ _),
    "tx_bpe_encode" -> (bpeEncodeQ _),
    "tx_vocab_encode" -> (vocabEncodeQ _),
    "tx_inverted_index" -> (invertedIndexQ _),
    "pp_normalized_dedup" -> (normalizedDedupQ _),
    "tx_tfidf" -> (tfidfQ _),
    "q29_key_stats" -> (keyStatsQ _),
    "pp_snapshot_diff" -> (snapshotDiffQ _),
    "dd_span_dedup" -> (dedupRepeatedSpansQ _),
    "pp_write_sharded" -> (writeShardedQ _),
    "tx_collocations" -> (collocationsQ _),
    "pp_span_decontamination" -> (decontaminateSpansQ _),
    "gp_pagerank" -> (pageRankQ _),
    "gp_triangles" -> (triangleCountsQ _)
  )
}
