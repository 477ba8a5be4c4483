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

  /** One decoded (or frame-sampled) unit of media: fixed output schema
    * regardless of codec, so downstream plans never depend on the decoder.
    * `pixels` is an 8-bit luminance buffer, row-major, width×height. */
  case class Frame(asset_id: Long, frame_idx: Int,
                   width: Int, height: Int, pixels: Array[Byte])

  /** Real pure-JVM image decode (PNG/JPEG/BMP/GIF via `javax.imageio` —
    * ships with the JDK, no native codec needed): each decodable image in
    * the payload becomes one [[Frame]] of 8-bit luminance pixels
    * (integer BT.601 luma, deterministic across platforms). Multi-frame
    * containers (animated GIF) emit up to `nFrames` frames; still images
    * emit one; an undecodable or truncated payload emits ZERO frames —
    * at 100 TB a corrupt media file must skip, not kill the stage (count
    * assets with no output frames downstream to quarantine them). */
  def imageioDecode(assetId: Long, payload: Array[Byte], nFrames: Int): Seq[Frame] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) Seq.empty
      else {
        val reader = readers.next()
        reader.setInput(in, false, true)
        try {
          val avail =
            try math.max(reader.getNumImages(true), 1)
            catch { case _: Exception => 1 }
          (0 until math.min(avail, math.max(nFrames, 1))).flatMap { i =>
            try {
              val img = reader.read(i)
              val w = img.getWidth; val h = img.getHeight
              // one bulk getRGB: per-pixel getRGB pays a color-model
              // conversion per CALL — ~10× slower on megapixel frames
              val rgbs = img.getRGB(0, 0, w, h, null, 0, w)
              val px = new Array[Byte](w * h)
              var j = 0
              while (j < px.length) {
                val rgb = rgbs(j)
                px(j) = (((rgb >> 16 & 0xFF) * 299 +
                  (rgb >> 8 & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000).toByte
                j += 1
              }
              Some(Frame(assetId, i, w, h, px))
            } catch { case _: Exception => None }
          }
        } finally reader.dispose()
      }
    } finally if (in != null) in.close()
  }

  /** Real pure-JVM audio decode for RIFF/WAVE PCM payloads (8/16-bit,
    * any channel count — the container is parsed directly from bytes, no
    * codec library): the sample stream is cut into `nFrames` windows,
    * each emitted as a width×1 [[Frame]] whose bytes are the 8-bit
    * amplitude envelope (16-bit samples keep their high byte offset to
    * unsigned; channels stay interleaved as stored). Non-WAV, non-PCM,
    * or truncated payloads emit ZERO frames — the same corrupt-media
    * quarantine contract as [[imageioDecode]]. */
  def wavDecode(assetId: Long, payload: Array[Byte], nFrames: Int): Seq[Frame] = {
    def u8(i: Int) = payload(i) & 0xFF
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String) =
      s.indices.forall(j => payload(i + j) == s.charAt(j).toByte)
    if (payload.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE"))
      return Seq.empty
    var pos = 12
    var bits = -1
    var dataFrom = -1
    var dataLen = -1
    while (pos + 8 <= payload.length && (dataFrom < 0 || bits < 0)) {
      val size = le32(pos + 4).toInt
      // bounds math in Long: a near-Int.Max size field would overflow
      // `pos + 8 + size` and sneak past the check → AIOOBE, not quarantine
      if (size < 0 || pos.toLong + 8L + size > payload.length) return Seq.empty
      if (tag(pos, "fmt ")) {
        if (size < 16 || le16(pos + 8) != 1) return Seq.empty // PCM only
        bits = le16(pos + 8 + 14)
        if (bits != 8 && bits != 16) return Seq.empty
      } else if (tag(pos, "data")) { dataFrom = pos + 8; dataLen = size }
      pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (bits < 0 || dataFrom < 0) return Seq.empty
    val nSamples = dataLen / (bits / 8)
    if (nSamples == 0) return Seq.empty
    val n = math.max(nFrames, 1)
    (0 until n).flatMap { f =>
      val from = (nSamples.toLong * f / n).toInt
      val until = (nSamples.toLong * (f + 1) / n).toInt
      if (until <= from) None
      else {
        val out = new Array[Byte](until - from)
        var i = from
        while (i < until) {
          out(i - from) =
            if (bits == 8) payload(dataFrom + i) // 8-bit PCM is unsigned
            else ((le16(dataFrom + i * 2).toShort >> 8) + 128).toByte
          i += 1
        }
        Some(Frame(assetId, f, out.length, 1, out))
      }
    }
  }

  /** Deterministic stand-in codec for payloads that are NOT real images
    * (e.g. text assets reshaped into the multimodal schema): derives WxH
    * from the payload length and cuts the payload into `nFrames` pixel
    * buffers. Lets the frame-pipeline plumbing be exercised on any
    * binary column; real media uses [[imageioDecode]] (the default). */
  def stubDecode(assetId: Long, payload: Array[Byte], nFrames: Int): Seq[Frame] = {
    val side = math.max(1, math.sqrt(math.max(payload.length, 1).toDouble).toInt)
    (0 until nFrames).map { f =>
      val from = (payload.length.toLong * f / nFrames).toInt
      val until = (payload.length.toLong * (f + 1) / nFrames).toInt
      Frame(assetId, f, side, math.max(1, (until - from) / side),
        java.util.Arrays.copyOfRange(payload, from, until))
    }
  }

  /** Frame decode / frame-sample as a typed mapPartitions over the asset
    * table — the Scala analogue of a batched decode UDF: the decoder is
    * invoked inside the partition iterator (one JVM-local pass, no
    * shuffle, payloads never leave the executor), emits 0..n frames per
    * asset with a FIXED schema, and the payload column is gone from the
    * output. `decoder` is injectable; defaults to the real
    * [[imageioDecode]] (pass [[stubDecode]] for non-media payloads). */
  def decodeFrames(assets: DataFrame, nFrames: Int,
                   decoder: (Long, Array[Byte], Int) => Seq[Frame] = imageioDecode)
      : org.apache.spark.sql.Dataset[Frame] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decoder(id, payload, nFrames)
      })
  }

  /** Per-frame pixel statistics — the numeric image a downstream plan
    * keeps once payloads and pixel buffers are projected away: dimensions,
    * pixel count, luminance sum, and a POSITION-WEIGHTED luminance sum
    * (weight = row-major index + 1), which pins the full pixel ORDER, not
    * just the value multiset — a decoder that flips rows or columns
    * changes it even when the plain sum survives. Per-row arithmetic on
    * the buffer, no shuffle. */
  def frameStats(frames: org.apache.spark.sql.Dataset[Frame]): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.map { fr =>
      var s = 0L; var ws = 0L; var i = 0
      while (i < fr.pixels.length) {
        val v = fr.pixels(i) & 0xFF
        s += v
        ws += v.toLong * (i + 1)
        i += 1
      }
      (fr.asset_id, fr.frame_idx, fr.width.toLong, fr.height.toLong,
        fr.pixels.length.toLong, s, ws)
    }.toDF("asset_id", "frame_idx", "width", "height",
      "n_px", "luma_sum", "luma_wsum")
  }

  /** Thumbnail resize of a decoded frame by stride-sampling pixel rows
    * and columns down to ≤ side×side — the shape of any box-filter
    * resize: per-row arithmetic on the pixel buffer, no shuffle. */
  def resizeFrames(frames: org.apache.spark.sql.Dataset[Frame], side: Int)
      : org.apache.spark.sql.Dataset[Frame] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.map { fr =>
      val sx = math.max(1, fr.width / side)
      val sy = math.max(1, fr.height / side)
      val w = math.max(1, fr.width / sx)
      val h = math.max(1, fr.height / sy)
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val src = (y * sy) * fr.width + (x * sx)
          out(y * w + x) =
            if (src < fr.pixels.length) fr.pixels(src) else 0
          x += 1
        }
        y += 1
      }
      Frame(fr.asset_id, fr.frame_idx, w, h, out)
    }
  }
}
