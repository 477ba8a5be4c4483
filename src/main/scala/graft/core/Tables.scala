package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata star schema (see TESTDATA.md).
  *
  * Every query in [[graft.SparkEntry]] takes an `sfDir` (scale-factor
  * directory) and reads only these parquet tables — never synthesized data —
  * so the driver's DuckDB oracle sees byte-identical inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.ts` is nanosecond-precision parquet, which Spark cannot read
    * natively — sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    * (see GraftSession) so it arrives as long nanos. We expose it as
    * microsecond TimestampType `ts` (truncation, matching what a cluster
    * ingest would do) plus the raw `ts_ns`. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    import org.apache.spark.sql.types.LongType
    if (raw.schema("ts").dataType == LongType)
      raw.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts_ns div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
