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

  /** Deterministic uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB,
    * bottom-up rows, 4-byte row padding) whose every pixel is the
    * GRAYSCALE value v(x,y) = (id·7 + x·3 + y·5 + x·y) mod 256. Grayscale
    * makes the decoded BT.601 luma EXACTLY v ((299v+587v+114v)/1000 = v
    * in integer math), so an oracle can re-derive the decoded statistics
    * arithmetically without an image library. Dimensions vary per id
    * (w ∈ 4..6, h ∈ 3..4) to exercise the padding and both row parities. */
  private[queries] def bmpFixture(id: Long): Array[Byte] = {
    val w = 4 + (id % 3).toInt
    val h = 3 + (id % 2).toInt
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val b = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var y = h - 1 // positive height → rows stored bottom-up
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = ((id * 7 + x * 3 + y * 5 + x * y) % 256).toByte
        b.put(v).put(v).put(v) // BGR of a gray pixel
        x += 1
      }
      b.position(b.position() + rowBytes - w * 3)
      y -= 1
    }
    b.array()
  }

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
    },

    // Real image decode, oracled: arithmetic BMP fixtures (one per nation
    // key) → javax.imageio decode → per-frame luminance stats; the oracle
    // recomputes the identical stats from the pixel formula alone, so a
    // hash match proves dimensions, pixel VALUES, and pixel ORDER (the
    // position-weighted sum) survive the container round-trip — decode
    // correctness as a green row, not just a golden unit test.
    "m_frames" -> { (s, dir) =>
      import s.implicits._
      val assets = Tables.nation(s, dir)
        .select(col("n_nationkey").cast("long")).as[Long]
        .map(id => (id, bmpFixture(id)))
        .toDF("asset_id", "payload")
      Multimodal.frameStats(Multimodal.decodeFrames(assets, nFrames = 1))
        .select("asset_id", "width", "height", "n_px", "luma_sum", "luma_wsum")
        .orderBy("asset_id")
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
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // re-derives the decoded stats from the fixture's pixel formula:
    // v(x,y) = (id*7 + x*3 + y*5 + x*y) % 256, w = 4+id%3, h = 3+id%2,
    // row-major weight y*w + x + 1
    "m_frames" ->
      """WITH dims AS (
        |  SELECT n_nationkey AS id, 4 + n_nationkey % 3 AS w,
        |    3 + n_nationkey % 2 AS h
        |  FROM nation),
        |px AS (
        |  SELECT d.id, d.w, d.h, x.x, y.y,
        |    (d.id*7 + x.x*3 + y.y*5 + x.x*y.y) % 256 AS v
        |  FROM dims d
        |  JOIN generate_series(0, 5) AS x(x) ON x.x < d.w
        |  JOIN generate_series(0, 3) AS y(y) ON y.y < d.h)
        |SELECT id AS asset_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height, COUNT(*) AS n_px,
        |  CAST(SUM(v) AS BIGINT) AS luma_sum,
        |  CAST(SUM(v * (y*w + x + 1)) AS BIGINT) AS luma_wsum
        |FROM px GROUP BY 1, 2, 3 ORDER BY asset_id""".stripMargin
  )
}
