package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator group's named queries and their DuckDB oracle
  * SQL twins. Column names are aliased identically on both sides (the
  * driver's compare sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Reference's flagship question: top-10 counterparty exposure
    * (dashboard.py:164-165) → top-10 users by total event value.
    */
  def entry(spark: SparkSession): DataFrame =
    ops.EventOps.topUsers(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.EventOps.queries ++ ops.RelationalOps.queries ++
      ops.TextOps.queries ++ ops.DedupOps.queries ++
      ops.SimilarityOps.queries ++ ops.MultimodalOps.queries ++
      ops.TemporalOps.queries ++ ops.CurationOps.queries ++
      ops.SearchOps.queries ++ ops.StatOps.queries ++
      ops.SpanOps.queries ++ ops.ScrubOps.queries ++ ops.BpeOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    ops.EventOps.oracle ++ ops.RelationalOps.oracle ++
      ops.TextOps.oracle ++ ops.DedupOps.oracle ++
      ops.SimilarityOps.oracle ++ ops.MultimodalOps.oracle ++
      ops.TemporalOps.oracle ++ ops.CurationOps.oracle ++
      ops.SearchOps.oracle ++ ops.StatOps.oracle ++
      ops.SpanOps.oracle ++ ops.ScrubOps.oracle ++ ops.BpeOps.oracle
}
