package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** External-file ingest with revision pinning — the reference's
  * drive-hosted-sheet loader shape (ref:
  * dags/airflow/utils/gdriveutil.py:53-97 — fetch a file by name or id,
  * optionally resolve the REVISION whose modifiedTime matches a given
  * minute, download as a byte stream, then stage as a table).
  *
  * The remote store is injected ([[Store]]: name → time-ordered
  * revisions) so the revision-resolution and parse path is testable
  * without a network — in production back it with the drive/files API.
  * Like [[RestSource]], the fetch is inherently driver-bounded (one
  * file, paged download), and parsing runs DISTRIBUTED: the content
  * lines are parallelized and `spark.read.csv` does the schema-checked
  * parse on executors. A spreadsheet-export file is dim-sized by
  * nature; big data does not arrive through a sheets API.
  */
object DriveSource {

  /** One revision of a remote file. `modifiedTime` is epoch millis UTC. */
  case class Revision(id: String, modifiedTime: Long, content: Array[Byte])

  /** name → revisions (any order; resolution sorts). */
  type Store = Map[String, Seq[Revision]]

  /** The reference's get_revision_id: latest revision at or before
    * `asOfMillis` (it matches on a minute-truncated timestamp; ≤ is the
    * deterministic generalization). Throws if the file or a qualifying
    * revision is missing — a silent fallback to HEAD would ingest data
    * from the future of the requested snapshot. */
  def revisionAsOf(store: Store, name: String, asOfMillis: Long): Revision = {
    val revs = store.getOrElse(name,
      throw new NoSuchElementException(s"no file '$name' in store"))
    revs.filter(_.modifiedTime <= asOfMillis)
      .sortBy(r => (r.modifiedTime, r.id))
      .lastOption
      .getOrElse(throw new NoSuchElementException(
        s"no revision of '$name' at or before $asOfMillis"))
  }

  /** Fetch the `asOf` revision of a CSV/sheet-export file and parse it
    * distributed with an explicit schema. */
  def readCsvRevision(spark: SparkSession, store: Store, name: String,
                      asOfMillis: Long, schema: StructType,
                      header: Boolean = true, delimiter: String = ","): DataFrame = {
    import spark.implicits._
    val text = new String(revisionAsOf(store, name, asOfMillis).content,
      java.nio.charset.StandardCharsets.UTF_8)
    val lines = text.split("\r?\n").toSeq.filter(_.nonEmpty)
    val body = if (header) lines.drop(1) else lines
    spark.read
      .option("header", "false")
      .option("sep", delimiter)
      .schema(schema)
      .csv(spark.createDataset(body))
  }
}
