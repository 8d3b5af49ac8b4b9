package graft.export

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed (co-located) table layout — the storage-side shuffle eliminator
 * for recurring joins at 100 TB: write both sides of a hot equi-join
 * bucketed (and sorted) by the join key, and every subsequent join on that
 * key reads co-partitioned buckets — the planner drops the Exchange on
 * BOTH sides, turning the cluster-wide shuffle of the big table into
 * local per-bucket merges. This is how a production deployment pins the
 * layout of the 15 era tables (all keyed by `slot`) or the `documents`
 * corpus (keyed by `doc_id`) so the analytical join corpus never re-pays
 * partitioning.
 *
 * Spark-first: this is plain `DataFrameWriter.bucketBy/sortBy` +
 * `saveAsTable` — the bucket metadata lives in the catalog, and Catalyst's
 * `EnsureRequirements` recognizes the `HashPartitioning(bucketCol,
 * nBuckets)` output so no custom physical planning is needed. The
 * `BucketedJoinSpec` plan test pins the zero-Exchange guarantee.
 */
object Bucketed {

  /** Writes `df` as a catalog table bucketed by `bucketCol` into
    * `nBuckets`, sorted within buckets by the same key. The frame is
    * REPARTITIONED onto the bucket key first: without it every input
    * task emits a file per bucket (P×nBuckets small files), and Spark
    * only honors the sorted-bucket metadata — the no-per-task-Sort half
    * of the layout's promise — when each bucket is a single file. The
    * repartition uses the same hash the bucketing applies, so each task
    * holds exactly one bucket and writes exactly one sorted file. */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(bucketCol))
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Equi-join of two bucketed catalog tables on their bucket key — plans
    * with zero Exchange when both were written with the same bucket count. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
