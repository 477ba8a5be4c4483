package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming building blocks (SURVEY.md §2.9 ST1-ST4, ST7;
  * ref: cloudtrail_etl.scala:95-138 — JSON file stream with declared
  * schema and maxFilesPerTrigger, partitioned parquet sink with
  * checkpoint and trigger).
  *
  * Scale notes: file streams list the source directory every trigger —
  * at production volume keep the directory partitioned by arrival date or
  * use `cleanSource`. The parquet sink writes one file per partition per
  * trigger; size `maxFilesPerTrigger` so microbatches are large enough to
  * avoid a small-file explosion.
  */
object FileStreams {

  /** ST1: JSON file stream with explicit schema and bounded ingest rate
    * (ref: cloudtrail_etl.scala:95-98). */
  def jsonFileStream(spark: SparkSession, path: String, schema: StructType,
                     maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)

  /** ST3: partitioned parquet streaming sink with checkpoint
    * (ref: cloudtrail_etl.scala:128-138). `availableNow` drains the
    * source then stops — the batch-equivalence mode; pass false for the
    * reference's continuous 10 s trigger. */
  def startPartitionedParquetSink(df: DataFrame, path: String,
                                  checkpoint: String,
                                  partitionCols: Seq[String],
                                  availableNow: Boolean = true): StreamingQuery = {
    val trigger =
      if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime("10 seconds")
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy(partitionCols: _*)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }

  /** ST7: watermarked tumbling-window counts per event type. */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col(keyCol), col("n"))
}
