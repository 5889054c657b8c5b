package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline: image/audio/video
  * are opaque `binary` columns with typed metadata.
  *
  * IMAGE rows are REAL: synthesized as genuine PNG bytes and decoded /
  * resized / feature-extracted through pure-JVM `javax.imageio` (no
  * external codec needed). VIDEO/TABLE rows keep a clearly-marked
  * decode STUB (the JDK ships no video/audio codecs); their Spark-side
  * plumbing — schema, partitioning, batched per-partition processing
  * shape — is identical, and on a real cluster the stub body swaps for
  * a JNI/library decoder (or a Pandas-UDF `mapInPandas` stage in
  * PySpark) with the dataflow unchanged. */
object Multimodal {

  /** media(media_ref STRING, bytes BINARY,
    *       meta STRUCT<mime STRING, width INT, height INT, duration_ms INT>) */
  final case class MediaMeta(mime: String, width: Int, height: Int,
      duration_ms: Int)
  final case class MediaRow(media_ref: String, bytes: Array[Byte],
      meta: MediaMeta)
  final case class DecodedMedia(media_ref: String, kind: String,
      width: Int, height: Int, nFrames: Int)
  final case class MediaFeatures(media_ref: String, features: Array[Float])

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Encode a deterministic RGB pattern as real PNG bytes. */
  private def pngBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = seed
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        r = mix(r)
        img.setRGB(x, y, (r & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def readPng(bytes: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  /** Deterministic synthetic media table keyed by the media_refs of a
    * Doc table. Image spans carry GENUINE PNG bytes (decoded for real
    * downstream); table/video spans carry fake bytes with a tiny
    * parseable header [kind:1][w:2][h:2][frames:2] + payload (no JDK
    * codec exists for them). */
  def synthesizeMedia(spark: SparkSession, docs: Dataset[graft.pipeline.Doc],
      seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    docs.flatMap(_.spans.filter(_.kind != "text")).map { s =>
      val r = mix(seed ^ s.media_ref.hashCode.toLong)
      if (s.kind == "image") {
        // small real PNGs: dims 16..63 keep synthesis cheap while the
        // decode path is the genuine ImageIO one
        val w = (16 + ((r >>> 7) % 48)).toInt.abs
        val h = (16 + ((r >>> 19) % 48)).toInt.abs
        MediaRow(s.media_ref, pngBytes(w, h, r), MediaMeta("image/png", w, h, 40))
      } else {
        val kind: Byte = if (s.kind == "table") 2 else 3
        val w = (64 + ((r >>> 7) % 448)).toInt.abs
        val h = (64 + ((r >>> 19) % 448)).toInt.abs
        val frames = if (kind == 3) (1 + ((r >>> 31) % 32)).toInt.abs else 1
        val payloadLen = (256 + ((r >>> 40) % 768)).toInt.abs
        val bytes = new Array[Byte](7 + payloadLen)
        bytes(0) = kind
        bytes(1) = (w >> 8).toByte; bytes(2) = w.toByte
        bytes(3) = (h >> 8).toByte; bytes(4) = h.toByte
        bytes(5) = (frames >> 8).toByte; bytes(6) = frames.toByte
        var i = 0
        var rr = r
        while (i < payloadLen) { rr = mix(rr); bytes(7 + i) = (rr & 0xff).toByte; i += 1 }
        val mime = if (kind == 2) "application/fake" else "video/fake"
        MediaRow(s.media_ref, bytes, MediaMeta(mime, w, h, frames * 40))
      }
    }
  }

  /** ??? DECODE STUB (video/table only) ??? — the JDK ships no video
    * codec, so non-image rows parse the deterministic fake header. The
    * signature and batch shape are the real contract; image rows never
    * reach this (they decode for real in `decodeMedia`). */
  def decodeStub(ref: String, bytes: Array[Byte]): DecodedMedia = {
    val kind = bytes(0) match {
      case 1 => "image"; case 2 => "table"; case _ => "video"
    }
    val w = ((bytes(1) & 0xff) << 8) | (bytes(2) & 0xff)
    val h = ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    val f = ((bytes(5) & 0xff) << 8) | (bytes(6) & 0xff)
    DecodedMedia(ref, kind, w, h, f)
  }

  /** Per-row decode dispatch: PNG bytes decode for REAL via ImageIO
    * (dimensions read from the actual image, not trusted metadata);
    * everything else is the stub. */
  def decodeMedia(ref: String, mime: String, bytes: Array[Byte]): DecodedMedia =
    if (mime == "image/png") {
      val img = readPng(bytes)
      DecodedMedia(ref, "image", img.getWidth, img.getHeight, 1)
    } else decodeStub(ref, bytes)

  /** Decode step: batched per partition (the `mapInPandas` analogue —
    * one decoder init per partition, rows streamed through). */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real pipeline: initialize the decoder library once per partition
      it.map(m => decodeMedia(m.media_ref, m.meta.mime, m.bytes))
    }
  }

  /** Feature extraction: fixed-width Float vector per media row
    * (deterministic from payload bytes — the embedding-model stand-in).
    * Schema/batch shape is the real contract: features ARRAY<FLOAT>. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val out = new Array[Float](dim)
        if (m.meta.mime == "image/png") {
          // REAL pixel features: per-bucket luminance folded over the
          // decoded raster (deterministic — ImageIO decode is exact)
          val img = readPng(m.bytes)
          var y = 0
          var i = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              out(i % dim) += lum / 765.0f
              i += 1; x += 1
            }
            y += 1
          }
        } else {
          var i = 7
          while (i < m.bytes.length) {
            out((i - 7) % dim) += (m.bytes(i) & 0xff) / 255.0f
            i += 1
          }
        }
        var d = 0
        var norm = 0.0
        while (d < dim) { norm += out(d) * out(d); d += 1 }
        val inv = if (norm > 0) (1.0 / math.sqrt(norm)).toFloat else 0.0f
        d = 0
        while (d < dim) { out(d) *= inv; d += 1 }
        MediaFeatures(m.media_ref, out)
      }
    }
  }

  /** Resize: PNG rows are resized for REAL (pixel rewrite through a
    * Graphics2D scale + re-encode); fake-codec rows scale metadata only
    * (their bytes aren't pixels). Same schema in and out. */
  def resize(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val side = math.max(m.meta.width, m.meta.height)
      if (side <= maxSide) m
      else {
        val scale = maxSide.toDouble / side
        val nw = math.max(1, (m.meta.width * scale).toInt)
        val nh = math.max(1, (m.meta.height * scale).toInt)
        if (m.meta.mime == "image/png") {
          val img = readPng(m.bytes)
          val scaled = new java.awt.image.BufferedImage(
            nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = scaled.createGraphics()
          g.drawImage(img, 0, 0, nw, nh, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(scaled, "png", bos)
          m.copy(bytes = bos.toByteArray,
            meta = m.meta.copy(width = nw, height = nh))
        } else m.copy(meta = m.meta.copy(width = nw, height = nh))
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th frame index. */
  def frameSample(media: Dataset[MediaRow], stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.meta.mime.startsWith("video/"))
      .map(m => (m.media_ref, decodeStub(m.media_ref, m.bytes).nFrames))
      .toDF("media_ref", "n_frames")
      .select($"media_ref", explode(expr(
        s"filter(sequence(0, n_frames - 1), i -> i % $stride = 0)")).as("frame_idx"))
  }
}
