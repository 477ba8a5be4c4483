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

  /** Cursor-follow pagination (the GraphQL/REST `pageInfo` shape —
    * ref: dags/airflow/graphql_to_postgres.py:53-70's client generalized
    * to a paged endpoint): each response envelope carries the page's row
    * array under `rowsField` plus the next-page token under
    * `cursorField`; the token is absent/null on the final page.
    * `fetch(None)` returns the first page, `fetch(Some(token))` the page
    * at that cursor.
    *
    * The follow loop is inherently driver-side and sequential — each
    * request needs the previous response's token — which is exactly why
    * the reference lands API payloads to a columnar staging table before
    * any analytics. Row parsing still runs distributed: the driver only
    * accumulates raw page strings; the schema-checked JSON decode of the
    * row arrays happens on executors. `maxPages` bounds a server that
    * keeps handing out tokens (a loop guard, not a truncation: hitting
    * it throws rather than returning a silently partial frame). */
  def fromCursoredPages(spark: SparkSession, fetch: Option[String] => String,
                        schema: StructType, rowsField: String = "data",
                        cursorField: String = "next",
                        maxPages: Int = 100000): DataFrame = {
    import org.apache.spark.sql.functions.{col, explode}
    import org.apache.spark.sql.types.ArrayType
    // jackson ships with Spark. The driver necessarily holds each page it
    // fetched; readTree re-walks it once for the token and the row-array
    // VALIDATION below — O(page) driver work per page, while the typed
    // row decode still runs on executors.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // (token, hasRows): a 200-OK envelope WITHOUT the row array — the
    // standard GraphQL error shape is {"errors":[...]} with no "data" —
    // must fail loudly here; letting it through would return a silently
    // partial frame, the exact failure mode this source guards against
    def envelope(body: String): (Option[String], Boolean) = {
      val root = mapper.readTree(body)
      val cur = root.get(cursorField)
      val rows = root.get(rowsField)
      (if (cur == null || cur.isNull) None else Some(cur.asText()),
        rows != null && rows.isArray)
    }
    val bodies = scala.collection.mutable.ArrayBuffer.empty[String]
    var cursor: Option[String] = None
    var more = true
    while (more) {
      if (bodies.length >= maxPages)
        throw new IllegalStateException(
          s"cursor pagination exceeded maxPages=$maxPages (endpoint loop?)")
      val body = fetch(cursor)
      val (next, hasRows) = envelope(body)
      if (!hasRows)
        throw new IllegalStateException(
          s"cursored page ${bodies.length} carries no '$rowsField' array " +
            s"(error envelope?): ${body.take(200)}")
      bodies += body
      cursor = next
      more = cursor.isDefined
    }
    import spark.implicits._
    val ds: Dataset[String] = spark.createDataset(bodies.toSeq)
    spark.read
      .schema(new StructType().add(rowsField, ArrayType(schema)))
      .json(ds)
      .select(explode(col(rowsField)).as("__row"))
      .select("__row.*")
  }
}
