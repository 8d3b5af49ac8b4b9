package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the query corpus from the per-domain modules:
  *  - [[graft.queries.Relational]] — generic operator surface (SURVEY §2.5–2.8)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-schema revenue rollup: fact scan → broadcast dim joins → agg. */
  def entry(spark: SparkSession): DataFrame =
    queries("join_star_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data pipeline operators (dedup / similarity / text analysis /
    * multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.EraQueries.queries ++
      graft.queries.EraViews.queries ++
      graft.queries.TrainingData.queries ++
      graft.queries.Behavioral.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. The era_* queries read era files — a format
    * DuckDB cannot decode — so their oracle SQL runs over the normalized
    * fixture tables [[graft.queries.EraOracle.exportTables]] writes during Verify
    * (decode correctness itself stays pinned by the RPC-fixture differential
    * specs; the SQL re-computes the analytics above the decoded values). */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++ graft.queries.TrainingData.oracleSql ++
      graft.queries.EraOracle.oracleSqlWithViews ++ graft.queries.Behavioral.oracleSql
}
