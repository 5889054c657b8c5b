package graft.ops

import graft.pipeline.DocGen
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  lazy val docs = DocGen.docs(spark, 40, seed = 21L, partitions = 4)
  lazy val media = Multimodal.synthesizeMedia(spark, docs)

  test("media table schema and determinism") {
    val schema = media.toDF().schema
    assert(schema.fieldNames.toSeq == Seq("media_ref", "bytes", "meta"))
    assert(schema("bytes").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val a = media.collect().map(m => (m.media_ref, m.bytes.toSeq)).sortBy(_._1)
    val b = Multimodal.synthesizeMedia(spark, docs).collect()
      .map(m => (m.media_ref, m.bytes.toSeq)).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
  }

  test("decode parses headers consistently with metadata") {
    val joined = Multimodal.decode(media).collect().map(d => d.media_ref -> d).toMap
    media.collect().foreach { m =>
      val d = joined(m.media_ref)
      assert(d.width == m.meta.width)
      assert(d.height == m.meta.height)
    }
  }

  test("feature extraction: fixed-dim normalized vectors, partition-independent") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(f => f.media_ref -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7), dim = 16)
      .collect().map(f => f.media_ref -> f.features.toSeq).toMap
    assert(f1 == f2)
    f1.values.foreach { v =>
      assert(v.length == 16)
      val norm = v.map(x => x.toDouble * x).sum
      assert(math.abs(norm - 1.0) < 1e-3 || norm == 0.0)
    }
  }

  test("image rows are genuine PNGs decoded by ImageIO") {
    val pngs = media.collect().filter(_.meta.mime == "image/png")
    assert(pngs.nonEmpty)
    pngs.foreach { m =>
      // PNG magic
      assert((m.bytes(0) & 0xff) == 0x89 && m.bytes(1) == 'P' &&
        m.bytes(2) == 'N' && m.bytes(3) == 'G', m.media_ref)
      val d = Multimodal.decodeMedia(m.media_ref, m.meta.mime, m.bytes)
      // dimensions come from the ACTUAL decoded raster
      assert(d.width == m.meta.width && d.height == m.meta.height)
    }
  }

  test("resize caps the longest side; PNG pixels are really rewritten") {
    val cap = 32
    val resized = Multimodal.resize(media, maxSide = cap).collect()
    resized.foreach { m =>
      assert(math.max(m.meta.width, m.meta.height) <= cap)
    }
    val orig = media.collect().map(m => m.media_ref -> m).toMap
    var rewrote = 0
    resized.foreach { m =>
      val o = orig(m.media_ref)
      if (o.meta.mime == "image/png" &&
          math.max(o.meta.width, o.meta.height) > cap) {
        // re-encoded: the decoded raster must match the new metadata
        val d = Multimodal.decodeMedia(m.media_ref, m.meta.mime, m.bytes)
        assert(d.width == m.meta.width && d.height == m.meta.height)
        assert(m.bytes.toSeq != o.bytes.toSeq)
        rewrote += 1
      } else if (o.meta.mime != "image/png") {
        // fake-codec rows: metadata-only scale, bytes untouched
        assert(m.bytes.toSeq == o.bytes.toSeq)
      }
    }
    assert(rewrote > 0, "expected at least one PNG above the cap")
  }

  test("frame sampling strides over video frames only") {
    val frames = Multimodal.frameSample(media, stride = 4).collect()
    val videoRefs = media.filter(_.meta.mime.startsWith("video/"))
      .collect().map(_.media_ref).toSet
    assert(frames.map(_.getString(0)).toSet.subsetOf(videoRefs))
    frames.foreach(r => assert(r.getInt(1) % 4 == 0))
  }
}
