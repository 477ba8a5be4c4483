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
  /** `events.ts` has shipped as two physical encodings across testdata
    * generations: TIMESTAMP(NANOS) (unreadable natively — sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true`, see GraftSession, so it
    * arrives as long nanos) and plain micros with isAdjustedToUTC=false
    * (arrives as TIMESTAMP_NTZ). Either way the catalog contract is the
    * same: `ts` is session-zone TimestampType (sessions run UTC, so the
    * NTZ→LTZ cast is wall-clock-preserving and matches what DuckDB sees
    * reading the file naively) and `ts_ns` is epoch long nanos. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(apply(s, d, "events"))

  /** Normalize a frame whose `ts` column may be any of the event-table
    * physical encodings (see [[events]]) to the catalog contract:
    * `ts` session-zone TimestampType + `ts_ns` epoch long nanos. */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        // drop any pre-existing ts_ns first — renaming into an occupied
        // name would leave two ts_ns columns and every later reference
        // ambiguous; the raw nanos column is the source of truth here
        raw.drop("ts_ns").withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case TimestampNTZType =>
        raw.drop("ts_ns").withColumn("ts", raw("ts").cast(TimestampType))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
      case _ =>
        if (raw.columns.contains("ts_ns")) raw
        else raw.withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
