package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface; every key has either a
  * DuckDB-equivalent SQL in `oracleSql` (strong hash check) or is a
  * hash-free operator (LSH/heuristic ops) that gets the rows-only check.
  */
object SparkEntry {

  /** Flagship: exact kNN join (k=3) of customer points against supplier
    * points on sf0.001 — exercises sampling, the grid join, windowed
    * top-k, and the exactness fallback in one plan. */
  def entry(spark: SparkSession): DataFrame =
    queries("sp_knn_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.Spatial.queries ++
    graft.queries.Pipeline.queries ++
    graft.queries.Advanced.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
    graft.queries.Spatial.oracles ++
    graft.queries.Pipeline.oracles ++
    graft.queries.Advanced.oracles
}
