package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** S12: REST-API payload → DataFrame (ref:
  * from_api_call_to_columnar_db.py:500-590 — page through an API, parse
  * the JSON payload, stage as a temp view).
  *
  * The fetch itself is injected (`pages: Iterator[String]`, each one JSON
  * response body) so the parse path is testable without a network; in
  * production pass an iterator that pages through the endpoint. Parsing
  * happens distributed: the page strings are parallelized and
  * `spark.read.json` runs the schema-checked parse on executors — the
  * driver never parses rows, it only carries the raw page strings (size
  * the pages accordingly; a paged API is driver-bounded by nature, which
  * is why the reference lands it to a columnar staging table first). */
object RestSource {

  def fromJsonPages(spark: SparkSession, pages: Iterator[String],
                    schema: StructType): DataFrame = {
    import spark.implicits._
    val ds: Dataset[String] = spark.createDataset(pages.toSeq)
    spark.read.schema(schema).json(ds)
  }
}
