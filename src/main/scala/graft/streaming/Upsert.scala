package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC upsert via `foreachBatch` — keep a keyed serving table
  * current from an update stream when the sink has no native MERGE (the
  * streaming composition of the reference's batch SCD merge,
  * servicenow_api_extract.py:2334-2349, with its cloudtrail-style file
  * stream). Each micro-batch B: target ← keep-latest-per-key(target ∪ B).
  *
  * Scale notes: the merge body runs on the DRIVER per batch but all data
  * work is distributed; the batch is small relative to the target by
  * construction. At 100 TB replace the full overwrite with
  * partition-scoped dynamic overwrite of only the partitions B touches
  * (`FileIO.overwritePartitions` — same merge, bounded write) and bucket
  * the target by the merge key so the union-dedup joins co-locate. The
  * merged frame is materialized (cache + count) BEFORE the overwrite
  * because the batch reads the same directory it rewrites.
  */
object Upsert {

  /** Start an AvailableNow drain of `source` that merges every
    * micro-batch into the parquet table at `targetDir`, keeping the
    * latest row per `keys` ordered by `orderCols` (descending, last
    * column should be a unique tiebreak). Re-running with the same
    * checkpoint processes only NEW source files — restartable and
    * exactly-once from the sink's perspective. */
  def startParquetUpsert(source: DataFrame, targetDir: String,
                         checkpointDir: String, keys: Seq[String],
                         orderCols: Seq[String]): StreamingQuery =
    source.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val target =
          try spark.read.parquet(targetDir)
          catch { case _: org.apache.spark.sql.AnalysisException => batch.limit(0).toDF() }
        val merged = graft.operators.Windows.dedupLatest(
            target.unionByName(batch.toDF()), keys, orderCols.map(col))
          .cache()
        merged.count() // pull data out before overwriting the dir it came from
        merged.write.mode(SaveMode.Overwrite).parquet(targetDir)
        merged.unpersist()
        ()
      }
      .start()
}
