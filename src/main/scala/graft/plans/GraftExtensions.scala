package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.index.IndexManager

/** Transparent index substitution: any logical subtree that computes the
  * same result as a registered index's source is rewritten to read the
  * index's clustered+cached data instead (original columns projected
  * back under the original expression ids, so parent operators are
  * untouched).
  *
  * This is the optimizer-rule rebuild of the reference's pre-optimization
  * `useIndexedData` rewrite (reference: execution/QueryExecution.scala:30-33,
  * IndexManager.scala:311-318), which itself mirrors Spark's
  * CacheManager.useCachedData. Because the rule runs as a late optimizer
  * batch (the only injection point available on a live session), filter
  * pushdown has already reshaped `Filter(src)` into
  * `Project(pl, Filter(cond, relation))`; the rule therefore matches both
  * the direct shape and this pushed-down shape, remapping the pushed
  * condition onto the index's output columns so it still lands directly
  * above the in-memory scan (PhysicalOperation collapses the
  * Project/Filter chain there, keeping batch min/max pruning).
  */
object IndexSubstitution extends Rule[LogicalPlan] {

  /** child-attr exprId -> output column name, for attrs the project list
    * passes through unchanged or aliases directly. */
  private def passThroughNames(pl: Seq[NamedExpression]): Map[ExprId, String] =
    pl.collect {
      case a: AttributeReference => a.exprId -> a.name
      case al @ Alias(c: AttributeReference, _) => c.exprId -> al.name
    }.toMap

  /** Re-project `repl` to `orig`'s names under `orig`'s expression ids.
    * An attribute that is ALREADY bound (same name, same exprId — the
    * clustered cache preserves the source DataFrame's attribute ids, so
    * a query built from the registered DataFrame object lands here)
    * passes through unaliased: a self-alias trips Spark's
    * pruneFilterProject fast-path, whose unchecked Seq[Attribute] cast
    * would plant the Alias inside InMemoryTableScanExec and crash later
    * at physical canonicalization. */
  private def aliased(orig: Seq[Attribute], repl: LogicalPlan): LogicalPlan = {
    val byName = repl.output.map(a => a.name -> a).toMap
    Project(orig.map { o =>
      val n = byName(o.name)
      if (n.exprId == o.exprId) n else Alias(n, o.name)(exprId = o.exprId)
    }, repl)
  }

  private def covers(p: LogicalPlan, repl: LogicalPlan): Boolean =
    p.output.map(_.name).toSet.subsetOf(repl.output.map(_.name).toSet)

  /** Among several indexes registered on ONE source, prefer the one
    * whose key columns cover the most of the query's filter conjunct
    * references, then the one with the fewest key columns (tightest
    * match: a 1-D filter over a table carrying both a range index on
    * that column and a 2-D z-order index should read the range cache —
    * its clustering puts the WHOLE selected range in contiguous cached
    * batches, where the z-cache interleaves it). Candidates with no
    * filter in scope keep registration-scan order. */
  private def rankByFilter(
      cands: Seq[(LogicalPlan, LogicalPlan, Seq[String])],
      refNames: Seq[String]): (LogicalPlan, LogicalPlan, Seq[String]) =
    cands.maxBy { case (_, _, keyCols) =>
      (refNames.count(keyCols.contains), -keyCols.size)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val subs = org.apache.spark.sql.SparkSession.getActiveSession
      .map(IndexManager.planSubstitutions)
      .getOrElse(Seq.empty)
    if (subs.isEmpty) plan
    // top-down: the Filter shapes are seen BEFORE their child relation,
    // so the filter conjuncts are in scope to rank multiple candidate
    // indexes; bottom-up substituted the bare child first and the
    // ranking never saw a filter. Replacement subtrees are cache scans
    // (InMemoryRelation leaves) that match no registered source, so
    // descending into them cannot re-substitute.
    else plan.transformDown { case p =>
      // single scan over the registered substitutions per node (sameResult
      // canonicalizes whole subtrees — doing it twice per match doubled
      // the dominant cost of this rule)
      subs.filter(s => s._1.sameResult(p) && covers(p, s._2)) match {
        case direct if direct.nonEmpty =>
          aliased(p.output, direct.head._2)
        case _ => p match {
          case pr @ Project(pl, Filter(cond, child)) =>
            val names = passThroughNames(pl)
            val cands = subs.filter { case (src, repl, _) =>
              src.sameResult(Project(pl, child)) &&
                pl.map(_.name).toSet.subsetOf(repl.output.map(_.name).toSet) &&
                cond.references.forall(a => names.get(a.exprId)
                  .exists(n => repl.output.exists(_.name == n)))
            }
            if (cands.isEmpty) p
            else {
              val refNames = cond.references.toSeq
                .flatMap(a => names.get(a.exprId)).distinct
              val (_, repl, _) = rankByFilter(cands, refNames)
              val byName = repl.output.map(a => a.name -> a).toMap
              val remapped = cond.transform {
                case a: AttributeReference => byName(names(a.exprId))
              }
              aliased(pr.output, Filter(remapped, repl))
            }
          // bare Filter over a registered source (no pruning Project on
          // top — e.g. a full-column filter over a raw table read):
          // same ranking, references resolve against the child directly
          case f @ Filter(cond, child) =>
            val cands = subs.filter { case (src, repl, _) =>
              src.sameResult(child) && covers(child, repl) &&
                cond.references.forall(a => repl.output.exists(_.name == a.name))
            }
            if (cands.isEmpty) p
            else {
              val refNames = cond.references.toSeq.map(_.name).distinct
              val (_, repl, _) = rankByFilter(cands, refNames)
              val byName = repl.output.map(a => a.name -> a).toMap
              val remapped = cond.transform {
                case a: AttributeReference => byName(a.name)
              }
              aliased(f.output, Filter(remapped, repl))
            }
          case _ => p
        }
      }
    }
  }
}

/** Session extensions: inject the index-substitution rule and register
  * the library's scalar functions for SQL use.
  *
  * ```
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * ```
  * Sessions created without extensions (e.g. the driver harness) can get
  * the SQL functions via [[GraftExtensions.registerFunctions]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => IndexSubstitution)
    GraftExtensions.sqlTableFunctions.foreach { case (name, builder) =>
      e.injectTableFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name),
        builder))
    }
  }
}

object GraftExtensions {

  /** Install the optimizer rule + SQL functions on an ALREADY-RUNNING
    * session (builder-time `withExtensions` is impossible once a session
    * exists — e.g. under a shared harness session). Uses the
    * experimental-methods injection point, the sanctioned runtime
    * equivalent of injectOptimizerRule. Idempotent. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(IndexSubstitution)) {
      spark.experimental.extraOptimizations = cur :+ IndexSubstitution
    }
    registerFunctions(spark)
  }

  /** Wrap a builder with arity validation so a wrong argument count is an
    * AnalysisException-style error, not an IndexOutOfBoundsException. */
  private def arity(name: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      require(es.length == n, s"$name expects $n arguments, got ${es.length}")
      b(es)
    }

  /** Name -> builder for every SQL-exposed scalar function. */
  val sqlFunctions: Map[String, Seq[Expression] => Expression] = Map(
    "graft_cosine_similarity" -> arity("graft_cosine_similarity", 2)(es =>
      graft.functions.CosineSimilarity(es(0), es(1))),
    "graft_dot_product" -> arity("graft_dot_product", 2)(es =>
      graft.functions.DotProduct(es(0), es(1))),
    "graft_l2_distance" -> arity("graft_l2_distance", 2)(es =>
      graft.functions.L2Distance(es(0), es(1))),
    "graft_simhash64" -> arity("graft_simhash64", 1)(es =>
      graft.functions.SimHash64(es(0))),
    "graft_fingerprint64" -> arity("graft_fingerprint64", 1)(es =>
      graft.functions.Fingerprint64(es(0))),
    // graft_cdc_chunks(text) — content-defined chunk split at the
    // library defaults (window 16, avg chunk ~256 chars, [64, 1024])
    "graft_cdc_chunks" -> arity("graft_cdc_chunks", 1)(es =>
      graft.functions.CdcChunks(es(0), 16, 0xFFL, 64, 1024)),
    "graft_lang_id" -> arity("graft_lang_id", 1)(es =>
      graft.functions.LangId(es(0))),
    "graft_st_intersects" -> arity("graft_st_intersects", 2)(es =>
      graft.functions.ShapeIntersects(es(0), es(1))),
    "graft_st_distance" -> arity("graft_st_distance", 2)(es =>
      graft.functions.ShapeMinDist(es(0), es(1))),
    "graft_st_aswkt" -> arity("graft_st_aswkt", 1)(es =>
      graft.functions.ShapeAsWkt(es(0))),
    "graft_st_fromwkt" -> arity("graft_st_fromwkt", 1)(es =>
      graft.functions.WktToShape(es(0))),
    "graft_st_aswkb" -> arity("graft_st_aswkb", 1)(es =>
      graft.functions.ShapeAsWkb(es(0))),
    "graft_st_fromwkb" -> arity("graft_st_fromwkb", 1)(es =>
      graft.functions.WkbToShape(es(0))),
    // graft_sign_project(vec, outDim, seed) — JL ±1 projection; dims and
    // seed must be foldable literals (evaluated once at plan time)
    "graft_sign_project" -> arity("graft_sign_project", 3)(es => {
      require(es(1).foldable && es(2).foldable,
        "graft_sign_project: outDim and seed must be literals")
      graft.functions.SignProject(es(0),
        es(1).eval(null).asInstanceOf[Number].intValue(),
        es(2).eval(null).asInstanceOf[Number].longValue())
    }),
    // the SHARED pattern constants of functions.normalizeText — built as
    // direct Catalyst nodes (a Column round-trip yields unresolved
    // ColumnNodes in the function-registry context)
    "graft_normalize_text" -> arity("graft_normalize_text", 1)(es => {
      import org.apache.spark.sql.catalyst.expressions.{Literal, Lower, RegExpReplace, StringTrim}
      StringTrim(
        RegExpReplace(
          RegExpReplace(Lower(es(0)),
            Literal(graft.functions.NormStripRe), Literal(" ")),
          Literal(graft.functions.NormWsRe), Literal(" ")))
    }),
    // graft_point_in_polygon(x, y, array(x0,y0,x1,y1,...)) — the ring must
    // be a foldable literal; it is evaluated once at plan time
    "graft_point_in_polygon" -> arity("graft_point_in_polygon", 3)(es => {
      require(es(2).foldable, "polygon ring must be a literal array")
      val verts = es(2).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray()
      graft.functions.PointInPolygon(es(0), es(1), verts)
    }))

  /** Register the SQL functions on an existing session (temp-function
    * registry — works without session extensions). */
  def registerFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    sqlFunctions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    sqlTableFunctions.foreach { case (name, builder) =>
      spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
  }

  // ---- SQL-mode spatial joins (table-valued functions) ----
  //
  // The DataFrame join verbs exposed to `spark.sql` — beyond reference
  // parity (the reference's SQL mode ships only scalar predicates,
  // README.md:16). Table/view names resolve through the session catalog,
  // so any temp view or catalog table works:
  //
  //   SELECT * FROM graft_distance_join('pts_l', 'pts_r', 'x1,y1', 'x2,y2', 100.0)
  //   SELECT * FROM graft_knn_join('pts_l', 'pts_r', 'x1,y1', 'x2,y2', 3, 'id1')
  //
  // The builder constructs the SAME plan as the DataFrame verb (grid
  // equi-join / bound-then-refine), so SQL mode pays no plan penalty.
  // All arguments must be literals; the kNN form runs its radius
  // sampling at analysis time (the cost-based plan's price in a TVF).

  private def litString(fn: String, what: String, e: Expression): String = {
    require(e.foldable, s"$fn: $what must be a string literal")
    val v = e.eval(null)
    require(v != null, s"$fn: $what must not be NULL")
    v.toString
  }

  private def litNum(fn: String, what: String, e: Expression): Double = {
    require(e.foldable, s"$fn: $what must be a numeric literal")
    e.eval(null) match {
      case n: java.lang.Number => n.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be numeric, got $other")
    }
  }

  /** Integral numeric literal — `k=3.5` is a caller mistake, and
    * silently truncating it to 3 would be the one argument here that
    * escapes the loud literal/arity discipline around it. */
  private def litInt(fn: String, what: String, e: Expression): Int = {
    val d = litNum(fn, what, e)
    require(d == math.rint(d) && math.abs(d) <= Int.MaxValue,
      s"$fn: $what must be an integral literal, got $d")
    d.toInt
  }

  private def csvCols(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def csvNums(fn: String, what: String, s: String): Array[Double] =
    s.split(",").map(_.trim).filter(_.nonEmpty).map { t =>
      try t.toDouble catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$fn: $what must be comma-separated numbers, got '$s'") }
    }

  /** Name -> builder for every SQL-exposed table-valued function. */
  val sqlTableFunctions: Map[String, Seq[Expression] =>
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = Map(
    "graft_distance_join" -> (es => {
      val fn = "graft_distance_join"
      require(es.length == 5,
        s"$fn(left_table, right_table, 'lx,ly', 'rx,ry', radius)")
      val spark = org.apache.spark.sql.SparkSession.active
      import graft.operators.SpatialOps._
      spark.table(litString(fn, "left table", es(0)))
        .distanceJoin(spark.table(litString(fn, "right table", es(1))),
          csvCols(litString(fn, "left keys", es(2))),
          csvCols(litString(fn, "right keys", es(3))),
          litNum(fn, "radius", es(4)))
        .queryExecution.logical
    }),
    "graft_knn_join" -> (es => {
      val fn = "graft_knn_join"
      require(es.length == 6 || es.length == 7,
        s"$fn(left_table, right_table, 'lx,ly', 'rx,ry', k, 'left_id'[, 'tie,break'])")
      val spark = org.apache.spark.sql.SparkSession.active
      import graft.operators.SpatialOps._
      // the optional 7th argument names right-side tie-break columns —
      // REQUIRED for a deterministic result when equal distances are
      // possible (gridded coordinates), same as the DataFrame verb
      val tieBreak =
        if (es.length == 7) csvCols(litString(fn, "tie break", es(6))) else Nil
      spark.table(litString(fn, "left table", es(0)))
        .knnJoin(spark.table(litString(fn, "right table", es(1))),
          csvCols(litString(fn, "left keys", es(2))),
          csvCols(litString(fn, "right keys", es(3))),
          litInt(fn, "k", es(4)),
          litString(fn, "left id", es(5)), tieBreak)
        .queryExecution.logical
    }),
    // SQL mode for the at-rest layout (graft.index.SpatialDisk): box
    // range and kNN answered directly from the cell-partitioned
    // parquet, same pre-listing directory pruning as the Scala verbs
    "graft_disk_box_range" -> (es => {
      val fn = "graft_disk_box_range"
      require(es.length == 3,
        s"$fn(layout_path, 'lo1,lo2,...', 'hi1,hi2,...')")
      val spark = org.apache.spark.sql.SparkSession.active
      graft.index.SpatialDisk.boxRange(spark,
          litString(fn, "layout path", es(0)),
          csvNums(fn, "lows", litString(fn, "lows", es(1))),
          csvNums(fn, "highs", litString(fn, "highs", es(2))))
        .queryExecution.logical
    }),
    "graft_disk_knn" -> (es => {
      val fn = "graft_disk_knn"
      require(es.length == 3 || es.length == 4,
        s"$fn(layout_path, 'c1,c2,...', k[, 'tie,break'])")
      val spark = org.apache.spark.sql.SparkSession.active
      val tieBreak =
        if (es.length == 4) csvCols(litString(fn, "tie break", es(3))) else Nil
      graft.index.SpatialDisk.knn(spark,
          litString(fn, "layout path", es(0)),
          csvNums(fn, "center", litString(fn, "center", es(1))),
          litInt(fn, "k", es(2)), tieBreak)
        .queryExecution.logical
    }),
    "graft_disk_knn_join" -> (es => {
      val fn = "graft_disk_knn_join"
      require(es.length == 5 || es.length == 6,
        s"$fn(left_table, 'lx,ly', layout_path, k, 'left_id'[, 'tie,break'])")
      val spark = org.apache.spark.sql.SparkSession.active
      val tieBreak =
        if (es.length == 6) csvCols(litString(fn, "tie break", es(5))) else Nil
      graft.index.SpatialDisk.knnJoin(
          spark.table(litString(fn, "left table", es(0))),
          csvCols(litString(fn, "left keys", es(1))),
          litString(fn, "layout path", es(2)),
          litInt(fn, "k", es(3)),
          litString(fn, "left id", es(4)), tieBreak)
        .queryExecution.logical
    }),
    "graft_intersects_join" -> (es => {
      val fn = "graft_intersects_join"
      require(es.length == 4,
        s"$fn(left_table, right_table, 'left_shape_col', 'right_shape_col')")
      val spark = org.apache.spark.sql.SparkSession.active
      import graft.operators.SpatialOps._
      spark.table(litString(fn, "left table", es(0)))
        .shapeIntersectsJoin(
          spark.table(litString(fn, "right table", es(1))),
          litString(fn, "left shape col", es(2)),
          litString(fn, "right shape col", es(3)))
        .queryExecution.logical
    })
  )
}
