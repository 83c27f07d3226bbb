package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Boolean predicate trees with kNN membership as a first-class leaf —
  * the reference's filter semantics for `knn AND p`, `NOT knn`,
  * `knn OR p` (reference: execution/FilterExec.scala:48-65, which
  * evaluates such filters by set algebra: And → intersection,
  * Or → union, Not → difference against the child's row set).
  *
  * kNN membership is not a per-row predicate — whether a row qualifies
  * depends on the whole table — so Spark's `Column` algebra cannot carry
  * it and the reference resorts to an always-true placeholder expression
  * plus a custom FilterExec. Here the same composition is an explicit
  * little ADT: kNN-free subtrees fold back into ONE ordinary `filter`
  * Column (predicate pushdown and codegen fully preserved), and only
  * connectives whose operands involve kNN membership pay a set
  * operation, exactly the algebra the reference evaluates.
  *
  * Row multiplicity under a kNN-bearing connective follows Spark's
  * intersect / union-distinct / except — set semantics, the same
  * contract as the reference's set algebra.
  *
  * {{{
  *   import graft.operators.SpatialPredicate._
  *   // 20 nearest the depot that are NOT inside the exclusion zone
  *   df.spatialFilter(
  *     inKnn(Seq("x", "y"), Seq(cx, cy), 20, Seq("id")) &&
  *       !cond(inBox(Seq(col("x"), col("y")), zoneLo, zoneHi)))
  * }}}
  */
sealed trait SpatialPredicate {
  def &&(other: SpatialPredicate): SpatialPredicate = SpatialPredicate.And(this, other)
  def ||(other: SpatialPredicate): SpatialPredicate = SpatialPredicate.Or(this, other)
  def unary_! : SpatialPredicate = SpatialPredicate.Not(this)
}

object SpatialPredicate {

  /** True of a row iff it is one of the `k` nearest to `center` within
    * the FULL dataset the filter runs over (ties broken by `tieBreak`
    * for determinism). */
  final case class InKnn(keys: Seq[String], center: Seq[Double], k: Int,
                         tieBreak: Seq[String] = Nil) extends SpatialPredicate
  /** An ordinary per-row Spark predicate. */
  final case class Cond(c: Column) extends SpatialPredicate
  final case class And(l: SpatialPredicate, r: SpatialPredicate) extends SpatialPredicate
  final case class Or(l: SpatialPredicate, r: SpatialPredicate) extends SpatialPredicate
  final case class Not(p: SpatialPredicate) extends SpatialPredicate

  def inKnn(keys: Seq[String], center: Seq[Double], k: Int,
            tieBreak: Seq[String] = Nil): SpatialPredicate =
    InKnn(keys, center, k, tieBreak)
  def cond(c: Column): SpatialPredicate = Cond(c)

  /** Fold a kNN-free subtree to one Column so Catalyst sees a single
    * filter expression (pushdown intact); None if kNN membership occurs
    * anywhere below. */
  private def asColumn(p: SpatialPredicate): Option[Column] = p match {
    case Cond(c)   => Some(c)
    case And(l, r) => for { a <- asColumn(l); b <- asColumn(r) } yield a && b
    case Or(l, r)  => for { a <- asColumn(l); b <- asColumn(r) } yield a || b
    case Not(x)    => asColumn(x).map(!_)
    case _: InKnn  => None
  }

  private[operators] def compile(df: DataFrame, p: SpatialPredicate): DataFrame =
    asColumn(p) match {
      case Some(c) => df.filter(c)
      case None => p match {
        case InKnn(keys, center, k, tie) =>
          new SpatialOps.DatasetSpatialOps(df).knn(keys, center, k, tie)
        case And(l, r) => compile(df, l).intersect(compile(df, r))
        case Or(l, r)  => compile(df, l).union(compile(df, r)).distinct()
        case Not(x)    => df.except(compile(df, x))
        case Cond(_)   => throw new IllegalStateException("unreachable: asColumn covers Cond")
      }
    }
}
