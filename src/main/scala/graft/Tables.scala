package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-provided test data (TESTDATA.md).
  * All engine operators take DataFrames; this is just the I/O edge.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `ts` normalization, adaptive to how the driver generated the parquet:
    *  - TIMESTAMP(NANOS) (rounds 1-8): Spark 4 has no nanosecond timestamp
    *    type ([PARQUET_TYPE_ILLEGAL] by default), so read nanos as long and
    *    convert in integer arithmetic (values are µs-aligned → lossless;
    *    a double round-trip would lose precision at 1.7e18 ns).
    *  - timestamp[us] isAdjustedToUTC=false (round 9+): reads as
    *    TIMESTAMP_NTZ; cast to TimestampType (session tz is UTC
    *    everywhere in this engine) so downstream window arithmetic and
    *    oracle formatting are identical across both layouts.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
}
