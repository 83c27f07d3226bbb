package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Native expressions over text for the dedup / fingerprint / language-id
  * surface. Scalar per-row transforms with `doGenCode` emitting static
  * kernel calls, so they run inside whole-stage codegen next to the
  * built-ins (no UDF serialization, no codegen fallback).
  */

/** `minhash_signature(text) -> array<long>` (numHashes slots). */
case class MinHashSignature(child: Expression, shingle: Int, numHashes: Int,
                            seed: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(a: Any): Any =
    TextKernels.minHashSigU(a.asInstanceOf[UTF8String], shingle, numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.TextKernels.minHashSigU($a, $shingle, $numHashes, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `cdc_chunks(text) -> array<string>` — content-defined chunk split
  * (rolling-hash boundaries; see [[TextKernels.cdcChunks]]). */
case class CdcChunks(child: Expression, window: Int, mask: Long,
                     minSize: Int, maxSize: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(a: Any): Any =
    TextKernels.cdcChunksU(a.asInstanceOf[UTF8String], window, mask,
      minSize, maxSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.TextKernels.cdcChunksU($a, $window, ${mask}L, $minSize, $maxSize)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `simhash64(text) -> long`. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any =
    TextKernels.simHash64U(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.simHash64U($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `shingle_jaccard(a, b) -> double` — exact Jaccard of n-shingle sets. */
case class ShingleJaccard(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.shingleJaccardU(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.shingleJaccardU($a, $b, $n);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `shingle_set(text) -> array<long>` — the document's distinct, SORTED
  * n-shingle hash set: the per-doc half of shingle Jaccard, so a blocked
  * join can compute it once per document instead of re-tokenizing per
  * candidate pair (see [[SortedJaccard]] for the per-pair half). */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_set"

  override def nullSafeEval(a: Any): Any =
    TextKernels.shingleSetU(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.shingleSetU($a, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `word_gram_hash_set(text) -> array<long>` — distinct sorted hashes
  * of the exact joined n-gram strings `wordGrams` produces (space-only
  * trim, `[ \t\n\r]+` split, " " join). The hash is over the joined
  * gram STRING, so a gate on this set admits a strict superset of a
  * string-keyed gram equi-join — unlike [[ShingleSet]], whose
  * Java-`\s` tokenizer diverges from wordGrams on \f/\x0B/leading-\t
  * texts (see [[TextKernels.wordGramHashSet]]). */
case class WordGramHashSet(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_gram_hash_set"

  override def nullSafeEval(a: Any): Any =
    TextKernels.wordGramHashSetU(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.wordGramHashSetU($a, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `sorted_jaccard(a, b) -> double` over two distinct-sorted long
  * arrays: merge intersection straight off the unsafe array format —
  * bit-identical to `shingle_jaccard` on the original texts when fed
  * each side's [[ShingleSet]]. */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sortedJaccardAD(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.sortedJaccardAD($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `fingerprint64(text) -> long` — whitespace/case-normalized rolling hash. */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fingerprint64"

  override def nullSafeEval(a: Any): Any =
    TextKernels.fingerprint64U(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.fingerprint64U($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `lang_id(text) -> string` — heuristic language identification. */
case class LangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id"

  override def nullSafeEval(a: Any): Any =
    TextKernels.langIdU(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.langIdU($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
