package graft.operators

import graft.functions.{ByteBinCounts, ByteSample}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSql

/** Multimodal-column plumbing (builder brief): media as opaque `binary`
  * payloads with a typed metadata struct, featurized by deterministic
  * byte-level expressions.
  *
  * The design at 100 TB: payloads stay in the executor (never collected),
  * feature extraction is a per-row native expression (no shuffle), and
  * downstream joins/aggs use only the small metadata + feature columns —
  * project the payload away as early as possible (`featurize` does).
  */
object Multimodal {

  /** Wrap a text/string asset table into the canonical multimodal shape:
    * (id, kind, payload binary, meta struct). For real media the payload
    * column is the raw file bytes; the shape is identical. */
  def assets(df: DataFrame, idCol: String, kindCol: String,
             contentCol: String, metaCols: Seq[String]): DataFrame =
    df.select(
      col(idCol).as("asset_id"),
      col(kindCol).as("kind"),
      encode(col(contentCol), "UTF-8").as("payload"),
      struct(metaCols.map(col): _*).as("meta"))

  /** Byte-level feature columns from the payload: total bytes, the 16-bin
    * high-nibble histogram, and a stride-sampled thumbnail payload. The
    * payload itself is projected away — downstream plans carry only small
    * columns. */
  def featurize(assets: DataFrame, sampleStride: Int = 7): DataFrame =
    assets.select(
      col("asset_id"), col("kind"), col("meta"),
      length(col("payload")).as("n_bytes"),
      GraftSql.column(ByteBinCounts(GraftSql.expression(col("payload")))).as("byte_bins"),
      length(GraftSql.column(ByteSample(GraftSql.expression(col("payload")), sampleStride)))
        .as("n_sample_bytes"))

  /** REAL image decode — deliberately unimplemented: image/audio codecs
    * are not available in this environment (builder brief). The
    * deterministic byte-level featurizer above stands in so the pipeline
    * shape (binary payload → per-row feature extraction → metadata-only
    * downstream) is fully exercised. Wire a codec here on a real cluster. */
  def decodeImageRgb(payload: Column): Column =
    throw new NotImplementedError(
      "image codecs unavailable here; use Multimodal.featurize's byte features")
}
