package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-type lint (VERDICT r8 #8): the `pp_sequence_pack` round-8 hash
  * mismatch was a CLASS of bug, not an instance — DuckDB promotes
  * `sum(BIGINT)` (scalar or window) to `HUGEINT`, while Spark emits
  * `BIGINT`, so any un-CAST integer `sum` whose value reaches an output
  * column diverges the driver's type-sensitive hash on value-identical
  * rows. This spec scans every `SparkEntry.oracleSql` string and fails
  * on the pattern BEFORE the driver's correctness gate can.
  *
  * Rule (tuned against the full 130-oracle corpus: zero false
  * positives; detects the exact r8 regression form):
  * flag a `sum(` occurrence iff
  *   - it sits in a FINAL select list — a `SELECT` at paren depth 0
  *     (CTE bodies live inside parens, and an intermediate HUGEINT that
  *     only feeds joins/filters/comparisons never reaches the output
  *     schema), and
  *   - no `CAST( ... )` span encloses it (the discipline the rest of
  *     the corpus applies), and
  *   - its argument has no double-typed hint (`DOUBLE` keyword or a
  *     decimal literal): DuckDB's `sum(DOUBLE)` stays `DOUBLE`, so
  *     those sums are already type-stable.
  *
  * Bare decimal literals (the other candidate class) are deliberately
  * NOT flagged: the corpus uses them only where a double operand
  * already forces DuckDB's decimal→double coercion (comparisons, CASE
  * branches beside double expressions), all hash-green — a literal
  * rule would be pure false positives at this granularity.
  */
class OracleTypeLintSpec extends AnyFunSuite {

  /** Positions of `word` (case-insensitive, word-bounded) at paren
    * depth 0. */
  private def depth0Positions(s: String, word: String): Seq[Int] = {
    val su = s.toUpperCase
    val w = word.toUpperCase
    val out = Seq.newBuilder[Int]
    var depth = 0
    var i = 0
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < s.length) {
      val c = s(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && su.startsWith(w, i) &&
        (i == 0 || !isWordChar(s(i - 1))) &&
        (i + w.length >= s.length || !isWordChar(s(i + w.length))))
        out += i
      i += 1
    }
    out.result()
  }

  /** Split on commas at paren depth 0. */
  private def splitDepth0(s: String): Seq[String] = {
    val parts = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach { c =>
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      if (c == ',' && depth == 0) { parts += cur.toString; cur.clear() }
      else cur += c
    }
    parts += cur.toString
    parts.result()
  }

  /** (start, end) spans of every `CAST( ... )` with balanced parens. */
  private def castSpans(s: String): Seq[(Int, Int)] = {
    val spans = Seq.newBuilder[(Int, Int)]
    val re = "(?i)\\bCAST\\s*\\(".r
    re.findAllMatchIn(s).foreach { m =>
      var depth = 0
      var i = m.end - 1
      var found = false
      while (i < s.length && !found) {
        if (s(i) == '(') depth += 1
        else if (s(i) == ')') {
          depth -= 1
          if (depth == 0) { spans += ((m.start, i)); found = true }
        }
        i += 1
      }
    }
    spans.result()
  }

  private val doubleHint = "(?i)(\\.\\d|DOUBLE)".r
  private val sumRe = "(?i)\\bsum\\s*\\(".r

  /** Flagged argument snippets of risky sums in one oracle SQL. */
  private def lint(sql: String): Seq[String] = {
    val sels = depth0Positions(sql, "SELECT")
    val froms = depth0Positions(sql, "FROM")
    sels.flatMap { sp =>
      val end = froms.find(_ > sp).getOrElse(sql.length)
      splitDepth0(sql.substring(sp + 6, end)).flatMap { expr =>
        val spans = castSpans(expr)
        sumRe.findAllMatchIn(expr).flatMap { m =>
          val covered = spans.exists { case (a, b) => a < m.start && m.start < b }
          if (covered) None
          else {
            // balanced-paren argument of this sum
            var depth = 0
            var i = m.end - 1
            var arg = ""
            var found = false
            while (i < expr.length && !found) {
              if (expr(i) == '(') depth += 1
              else if (expr(i) == ')') {
                depth -= 1
                if (depth == 0) { arg = expr.substring(m.end, i); found = true }
              }
              i += 1
            }
            if (doubleHint.findFirstIn(arg).isDefined) None
            else Some(arg.trim.take(60))
          }
        }
      }
    }
  }

  test("every oracle's final select casts its integer sums") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) => lint(sql).map(a => s"$name: sum($a)")
    }
    assert(offenders.isEmpty,
      "un-CAST integer sum in a final select list (DuckDB promotes " +
        "sum(BIGINT) to HUGEINT and the driver hash is type-sensitive):\n" +
        offenders.mkString("\n"))
  }

  test("the lint detects the round-8 sequence-pack regression form") {
    val r8Form =
      """WITH toks AS (
        |  SELECT source, doc_id, CAST(len(t) AS BIGINT) AS tok_count
        |  FROM documents
        |)
        |SELECT source, doc_id, tok_count,
        |  COALESCE(sum(tok_count) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_tokens,
        |  COALESCE(sum(tok_count) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048
        |    AS bin
        |FROM toks ORDER BY source, doc_id""".stripMargin
    assert(lint(r8Form).size === 2,
      "lint must flag both un-CAST window sums of the r8 oracle")
    // the repaired form (CAST wrapping each window sum) must pass
    assert(lint(SparkEntry.oracleSql("pp_sequence_pack")).isEmpty)
  }

  test("CTE-internal and filter-side sums are not flagged") {
    val ok =
      """WITH t AS (SELECT k, sum(v) AS s FROM x GROUP BY k)
        |SELECT k FROM t WHERE s > 10 ORDER BY k""".stripMargin
    assert(lint(ok).isEmpty)
  }
}
