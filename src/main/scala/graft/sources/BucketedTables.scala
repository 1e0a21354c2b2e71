package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet storage: the shuffle-elimination lever for corpora
  * that are joined or grouped on the same key query after query.
  *
  * At 100 TB the dominant cost of `corpus.join(labels, "doc_id")` or
  * `corpus.groupBy("doc_id")...` is the hash-partition Exchange of the
  * big side — every query re-shuffles the full corpus. Writing the
  * corpus ONCE as a bucketed table (`bucketBy(n, key)`) persists that
  * partitioning into the file layout + catalog metadata; every later
  * scan reports `outputPartitioning = HashPartitioning(key, n)` and
  * Catalyst drops the Exchange on the bucketed side of joins and
  * aggregations entirely (and with `sortBy` the SortMergeJoin's Sort
  * too). One shuffle at ingest, zero per downstream query.
  *
  * Bucket-count sizing at scale: pick `numBuckets` so one bucket of the
  * LARGEST co-bucketed table fits an executor's task comfortably
  * (~128-512 MB of parquet per bucket); co-joined tables must use the
  * SAME count and key for the join to stay exchange-free.
  *
  * The reference has no storage tier (ingest is programmatic
  * `InputHandler.send`, SURVEY.md §2.2 sources/sinks) — this is the
  * Spark-native sink its users gain by switching.
  */
object BucketedTables {

  /** Writes `df` as an EXTERNAL bucketed+sorted parquet table at `path`,
    * registered as `table` in the session catalog. Sorting within
    * buckets defaults to the bucket key (lets SMJ skip its Sort and
    * gives parquet min/max row-group pruning on the key).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      numBuckets: Int,
      bucketCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "at least one bucket column required")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val sorts = if (sortCols.nonEmpty) sortCols else bucketCols
    df.write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }

  /** The bucketed table as a DataFrame (scan carries the bucket
    * partitioning, so joins/aggs on the bucket key skip their Exchange).
    */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
