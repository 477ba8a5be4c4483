package graft.queries

import graft.core.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column catalog: documents wrapped as binary assets, byte
  * features extracted natively, payload projected away before the agg.
  * The oracle recomputes the byte-bin counts character-wise from the
  * original text (the payload is its UTF-8 image), so a green row proves
  * the binary path end to end.
  */
object MultimodalQueries {

  val queries: Map[String, Q] = Map(
    "m_binary_features" -> { (s, dir) =>
      val a = Multimodal.assets(Tables.documents(s, dir),
        idCol = "doc_id", kindCol = "source", contentCol = "text",
        metaCols = Seq("lang", "n_chars"))
      Multimodal.featurize(a, sampleStride = 7)
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_assets"),
             sum(col("n_bytes")).as("bytes_sum"),
             sum(element_at(col("byte_bins"), 3)).as("bin2_sum"),
             sum(element_at(col("byte_bins"), 7)).as("bin6_sum"),
             sum(element_at(col("byte_bins"), 8)).as("bin7_sum"),
             sum(col("n_sample_bytes")).as("sample_bytes_sum"))
        .orderBy(col("kind"))
    }
  )

  val oracle: Map[String, String] = Map(
    // ascii text: byte bins == char-class counts; sample = ceil(len/7)
    "m_binary_features" ->
      """SELECT source AS kind, COUNT(*) AS n_assets,
        |  CAST(SUM(len(text)) AS BIGINT) AS bytes_sum,
        |  CAST(SUM(len(text) - len(regexp_replace(text, '[\x20-\x2f]', '', 'g'))) AS BIGINT) AS bin2_sum,
        |  CAST(SUM(len(text) - len(regexp_replace(text, '[\x60-\x6f]', '', 'g'))) AS BIGINT) AS bin6_sum,
        |  CAST(SUM(len(text) - len(regexp_replace(text, '[\x70-\x7f]', '', 'g'))) AS BIGINT) AS bin7_sum,
        |  CAST(SUM((len(text) + 6) // 7) AS BIGINT) AS sample_bytes_sum
        |FROM documents GROUP BY source ORDER BY source""".stripMargin
  )
}
