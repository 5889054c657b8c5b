package graft.pipeline

import graft.Fixtures
import graft.correct.{CompiledModel, Corrector}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Spark end-to-end per SURVEY.md §5.4: synthesized interleaved Doc
  * table, full job on local[*], span-sequence equality invariant,
  * accumulators, idempotent resume. */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  lazy val model: CompiledModel =
    CompiledModel.train(Fixtures.trainingPairs, Fixtures.wordlist)

  test("doc generation is deterministic and partition-independent") {
    val a = DocGen.docs(spark, 50, seed = 7L, partitions = 2).collect()
    val b = DocGen.docs(spark, 50, seed = 7L, partitions = 8).collect()
    assert(a.sortBy(_.doc_id).toSeq == b.sortBy(_.doc_id).toSeq)
    val kinds = a.flatMap(_.spans).map(_.kind).toSet
    assert(kinds.contains("text"))
    assert((kinds - "text").nonEmpty) // media spans present
  }

  test("correction preserves span-sequence (kind, media_ref, order) and fixes text") {
    val docs = DocGen.docs(spark, 40, seed = 11L, partitions = 4)
    val bc = CorrectionJob.broadcastModel(spark, model)
    val metrics = Metrics(spark)
    val out = CorrectionJob.correctDocs(docs, bc, Some(metrics),
      saltPartitions = Some(4)).collect().map(d => d.doc_id -> d).toMap
    val in = docs.collect()
    assert(out.size == in.length)
    for (d <- in) {
      val o = out(d.doc_id)
      assert(o.spans.length == d.spans.length)
      for ((s, os) <- d.spans.zip(o.spans)) {
        assert(os.kind == s.kind)
        assert(os.media_ref == s.media_ref)
        assert(os.offset == s.offset)
        if (s.kind != "text") assert(os.text == s.text) // media untouched
        else assert(os.text == Corrector.correctLine(s.text, model))
      }
    }
    assert(metrics.docs.value == 40L)
    assert(metrics.textSpans.value > 0L)
    assert(metrics.mediaSpans.value > 0L)
    assert(metrics.spansChanged.value > 0L)
  }

  test("chunked (skew-splitting) path produces identical output") {
    val docs = DocGen.docs(spark, 30, seed = 5L, partitions = 4)
    val bc = CorrectionJob.broadcastModel(spark, model)
    val a = CorrectionJob.correctDocs(docs, bc).collect()
      .sortBy(_.doc_id).toSeq
    val b = CorrectionJob.correctDocsChunked(docs, bc, chunkSize = 8)
      .collect().sortBy(_.doc_id).toSeq
    assert(a == b)
  }

  test("LM-rescored job equals the per-doc sequential fold") {
    val docs = DocGen.docs(spark, 20, seed = 9L, partitions = 4)
    val lm = graft.correct.CharNgramLm.train(
      graft.Fixtures.trainingPairs.map(_._2), n = 4)
    val bc = CorrectionJob.broadcastModel(spark, model)
    val bcLm = spark.sparkContext
      .broadcast(lm: graft.correct.LmScorer)
    val got = CorrectionJob.correctDocsLm(docs, bc, bcLm,
      saltPartitions = Some(4)).collect().sortBy(_.doc_id).toSeq
    val expected = docs.collect().sortBy(_.doc_id).toSeq
      .map(d => graft.correct.LmDecoder.correctDocLm(d, model, lm))
    assert(got == expected)
    // media untouched, order preserved
    got.zip(expected).foreach { case (g, e) =>
      assert(g.spans.map(s => (s.kind, s.media_ref, s.offset)) ==
        e.spans.map(s => (s.kind, s.media_ref, s.offset)))
    }
  }

  test("bucketed write commits manifests; resume completes and matches one-shot") {
    val base = Files.createTempDirectory("graft-io").toString
    val docs = DocGen.docs(spark, 60, seed = 3L, partitions = 4)

    // one-shot reference write
    val p1 = s"$base/oneshot"
    val ms = TableIO.writeDocs(docs, p1, buckets = 8)
    assert(ms.map(_.bucket).toSet == (0 until 8).toSet)
    assert(ms.map(_.numDocs).sum == 60L)
    val r1 = TableIO.readDocs(spark, p1).collect().sortBy(_.doc_id).toSeq

    // interrupted write (fails after 3 buckets), then resume
    val p2 = s"$base/resumed"
    intercept[TableIO.InjectedFailure] {
      TableIO.writeDocs(docs, p2, buckets = 8, failAfterBuckets = Some(3))
    }
    val committedBefore = TableIO.committedBuckets(p2)
    assert(committedBefore.size == 3)
    val resumed = TableIO.writeDocs(docs, p2, buckets = 8, attemptId = "attempt-1")
    assert(resumed.map(_.bucket).toSet == (0 until 8).toSet -- committedBefore)
    val r2 = TableIO.readDocs(spark, p2).collect().sortBy(_.doc_id).toSeq
    assert(r1 == r2)

    // fully-committed table: a re-run is a no-op
    assert(TableIO.writeDocs(docs, p2, buckets = 8, attemptId = "attempt-2").isEmpty)

    // metrics ride the snapshot (end-to-end corrected write)
    val p3 = s"$base/with-metrics"
    val bc = CorrectionJob.broadcastModel(spark, model)
    val mx = Metrics(spark)
    val corrected = CorrectionJob.correctDocs(docs, bc, Some(mx))
    TableIO.writeDocs(corrected, p3, buckets = 4, metrics = Some(mx))
    val snap = java.nio.file.Files.readString(
      java.nio.file.Paths.get(p3, "_snapshot-0.json"))
    assert(snap.contains("\"metrics\""))
    assert(snap.contains("\"textSpans\""))
    // exact VALUES, not just keys: writeDocs persists its input before the
    // parquet write + stats scans, so the accumulators count each doc ONCE
    // (an unpersisted input would recompute the correction and double-count)
    assert(mx.docs.value == 60L, s"docs accumulator = ${mx.docs.value}")
    val totalSpans = docs.collect().map(_.spans.length.toLong).sum
    assert(mx.textSpans.value + mx.mediaSpans.value == totalSpans,
      s"spans ${mx.textSpans.value}+${mx.mediaSpans.value} != $totalSpans")
    assert(snap.contains(s""""docs":60"""), snap)
  }

  test("COW merge: updated rows replaced, untouched buckets keep manifests, idempotent, time travel until vacuum") {
    import spark.implicits._
    val p = s"${Files.createTempDirectory("graft-io-merge")}/t"
    val docs = DocGen.docs(spark, 60, seed = 3L, partitions = 4)
    TableIO.writeDocs(docs, p, buckets = 8)
    val before = TableIO.readManifests(p).map(m => m.bucket -> m).toMap
    // updates: rewrite docs 0..9 with a single marker span + one brand-new doc
    def id(i: Int): String = f"doc-$i%08d"
    val upd = (Seq.tabulate(10)(i =>
      Doc(id(i), Seq(Span("text", s"updated $i", null, 0)))) :+
      Doc("doc-99999999", Seq(Span("text", "brand new", null, 0)))).toDS()
    val ms = TableIO.mergeDocs(upd, p, buckets = 8, attemptId = "merge-0")
    val affected = ms.map(_.bucket).toSet
    // untouched buckets keep their manifests VERBATIM (same attempt, files)
    val after = TableIO.readManifests(p).map(m => m.bucket -> m).toMap
    for (b <- 0 until 8 if !affected.contains(b))
      assert(after(b) == before(b), s"bucket $b was rewritten")
    // merged read: updated content wins, everything else intact, new doc present
    val got = TableIO.readDocs(spark, p).collect().map(d => d.doc_id -> d).toMap
    assert(got.size == 61)
    for (i <- 0 until 10) assert(got(id(i)).spans.map(_.text) == Seq(s"updated $i"))
    assert(got("doc-99999999").spans.head.text == "brand new")
    val orig = docs.collect().map(d => d.doc_id -> d).toMap
    for (i <- 10 until 60) assert(got(id(i)) == orig(id(i)))
    // idempotence: re-merging the same updates commits identical content
    val ms2 = TableIO.mergeDocs(upd, p, buckets = 8, attemptId = "merge-1")
    assert(ms2.map(m => (m.bucket, m.numDocs, m.numSpans, m.checksum)).toSet ==
      ms.map(m => (m.bucket, m.numDocs, m.numSpans, m.checksum)).toSet)
    // superseded files still on disk (previous snapshot = time travel)
    // until vacuum reclaims exactly the unreferenced ones
    val reclaimed = TableIO.vacuum(p)
    assert(reclaimed.nonEmpty)
    assert(TableIO.readDocs(spark, p).count() == 61)
    // merge snapshot recorded
    val snaps = new java.io.File(p).listFiles()
      .map(_.getName).filter(_.startsWith("_snapshot-"))
    assert(snaps.length == 3) // write + 2 merges
  }

  test("metadata-pointer commit: orphans invisible, temp manifests don't count, vacuum reclaims") {
    val p = s"${Files.createTempDirectory("graft-io-meta")}/t"
    val docs = DocGen.docs(spark, 60, seed = 3L, partitions = 4)
    intercept[TableIO.InjectedFailure] {
      TableIO.writeDocs(docs, p, buckets = 8, failAfterBuckets = Some(3))
    }
    // all 8 buckets' data files exist on disk (written once, up front),
    // but only 3 manifests committed — readers see EXACTLY those
    assert(TableIO.committedBuckets(p).size == 3)
    val mans = TableIO.readManifests(p)
    assert(mans.size == 3 && mans.forall(_.files.nonEmpty))
    assert(TableIO.readDocs(spark, p).count() == mans.map(_.numDocs).sum)
    // a stray truncated TEMP manifest (crash mid-publish) is not a
    // commit: committedBuckets keys off the final name only
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p, "_manifests", ".bucket-9.json.tmp"),
      """{"bucket":9,""")
    assert(!TableIO.committedBuckets(p).contains(9))
    // vacuum deletes only unreferenced part files; committed data intact
    val before = TableIO.readDocs(spark, p).collect().sortBy(_.doc_id).toSeq
    val deleted = TableIO.vacuum(p)
    assert(deleted.nonEmpty, "uncommitted attempt files must be reclaimed")
    assert(TableIO.readDocs(spark, p).collect().sortBy(_.doc_id).toSeq == before)
    // resume after vacuum completes the table; explicit-Configuration
    // (sessionless-style) inspection agrees
    TableIO.writeDocs(docs, p, buckets = 8, attemptId = "attempt-1")
    assert(TableIO.readDocs(spark, p).count() == 60L)
    assert(TableIO.committedBuckets(p,
      new org.apache.hadoop.conf.Configuration()).size == 8)
    assert(TableIO.vacuum(p).isEmpty, "fully committed table has no orphans")
  }

  test("extraction pipeline e2e: boilerplate strip -> correct -> commit -> read back") {
    import spark.implicits._
    // inject the same footer span into every doc — the cross-doc repeated
    // content the strip must identify (plus any organically repeated
    // perturbed lines, which the independent recomputation accounts for)
    val footer = "Imprint: Verlag und Druck Beispiel"
    val raw = DocGen.docs(spark, 40, seed = 21L, partitions = 4).collect()
      .map(d => Doc(d.doc_id, d.spans :+ Span("text", footer, "", d.spans.length)))
      .toSeq
    val docs = spark.createDataset(raw)
    val res = Boilerplate.strip(docs, minDf = 2)
    // independent expected strip set (JVM recomputation, no Spark)
    val boiler = raw.flatMap(d => d.spans.filter(_.kind == "text").map(sp => (sp.text, d.doc_id)))
      .groupBy(_._1).collect { case (t, xs) if xs.map(_._2).distinct.size >= 2 => t }
      .toSet
    assert(boiler(footer))
    val expected = raw.map(d => d.doc_id ->
      d.spans.filter(sp => sp.kind != "text" || !boiler(sp.text))).toMap
    val stripped = res.docs.collect()
    assert(stripped.map(d => d.doc_id -> d.spans).toMap == expected)
    // correct the stripped docs and commit through the snapshot seam
    val bc = CorrectionJob.broadcastModel(spark, model)
    val corrected = CorrectionJob.correctDocs(res.docs, bc, None, Some(4))
    val out = s"${Files.createTempDirectory("graft-extract")}/table"
    TableIO.writeDocs(corrected, out, buckets = 4)
    val back = TableIO.readDocs(spark, out).collect().sortBy(_.doc_id).toSeq
    assert(back == corrected.collect().sortBy(_.doc_id).toSeq)
    // span-sequence invariant holds through the WHOLE chain: the committed
    // table's (kind, media_ref, offset) sequences equal the stripped input's
    back.foreach { d =>
      val in = expected(d.doc_id)
      assert(d.spans.map(s => (s.kind, s.media_ref, s.offset)) ==
        in.map(s => (s.kind, s.media_ref, s.offset)), d.doc_id)
    }
  }

  test("north-rule e2e from RAW MARKUP: html -> extract -> strip -> correct -> commit") {
    import spark.implicits._
    // render each generated doc as an HTML page: structural boilerplate
    // (header/nav/footer — the DOM-heuristic strip's job) + a cross-doc
    // repeated promo paragraph OUTSIDE any boilerplate container (the
    // CCNet strip's job) + the doc's spans as <p>/<img> in order
    val promo = "Subscribe to our newsletter today"
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val orig = DocGen.docs(spark, 30, seed = 33L, partitions = 4).collect().toSeq
    val pages = orig.map { d =>
      val sb = new StringBuilder
      sb ++= "<html><head><title>t</title></head><body>"
      sb ++= "<header><h1>Site</h1></header><nav><a href=\"/\">Home</a></nav>"
      sb ++= s"<article><p>${esc(promo)}</p>"
      d.spans.foreach { sp =>
        if (sp.kind == "text") sb ++= s"<p>${esc(sp.text)}</p>"
        else sb ++= s"""<img src="${sp.media_ref}">"""
      }
      sb ++= "</article><footer>Imprint</footer></body></html>"
      (d.doc_id, sb.toString)
    }
    val extracted = HtmlExtract.docsFromHtml(spark.createDataset(pages))
    // after the structural strip, each doc = promo + its original spans
    // (media kinds all render as <img> → 'image'), sequential offsets
    val expectExtracted = orig.map { d =>
      d.doc_id -> (Span("text", promo, "", 0) +: d.spans.map(sp =>
        if (sp.kind == "text") sp.copy(offset = sp.offset + 1)
        else Span("image", "", sp.media_ref, sp.offset + 1)))
    }.toMap
    assert(extracted.collect().map(d => d.doc_id -> d.spans).toMap == expectExtracted)
    // cross-doc strip: promo (df = 30) goes; organically repeated
    // perturbed lines go too — recomputed independently JVM-side
    val res = Boilerplate.strip(extracted, minDf = 2)
    val boiler = expectExtracted.values.flatten
      .collect { case sp if sp.kind == "text" => sp.text }
      .groupBy(identity).collect { case (t, xs) if {
        val docs = expectExtracted.count(_._2.exists(s => s.kind == "text" && s.text == t))
        docs >= 2
      } => t }.toSet
    assert(boiler(promo))
    val expectStripped = expectExtracted.view.mapValues(
      _.filter(sp => sp.kind != "text" || !boiler(sp.text))).toMap
    assert(res.docs.collect().map(d => d.doc_id -> d.spans).toMap == expectStripped)
    // correct + snapshot-commit + read back: span sequences survive
    val bc = CorrectionJob.broadcastModel(spark, model)
    val corrected = CorrectionJob.correctDocs(res.docs, bc, None, Some(4))
    val out = s"${Files.createTempDirectory("graft-html-e2e")}/table"
    TableIO.writeDocs(corrected, out, buckets = 4)
    val back = TableIO.readDocs(spark, out).collect().sortBy(_.doc_id).toSeq
    back.foreach { d =>
      val in = expectStripped(d.doc_id)
      assert(d.spans.map(s => (s.kind, s.media_ref, s.offset)) ==
        in.map(s => (s.kind, s.media_ref, s.offset)), d.doc_id)
    }
  }

  test("crawl-front e2e: .warc.gz shard FILES -> binaryFile scan -> extract -> strip -> correct -> commit") {
    import spark.implicits._
    // same page synthesis as the html e2e, but the pages are packed
    // into real multi-member .warc.gz shard files on disk and re-enter
    // through the PRODUCTION source path (WarcIO.docsFromWarc = Spark
    // binaryFile scan + per-blob container parse)
    val promo = "Subscribe to our newsletter today"
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val orig = DocGen.docs(spark, 30, seed = 47L, partitions = 4).collect().toSeq
    def page(d: Doc): String = {
      val sb = new StringBuilder
      sb ++= "<html><head><title>t</title></head><body>"
      sb ++= "<header><h1>Site</h1></header><nav><a href=\"/\">Home</a></nav>"
      sb ++= s"<article><p>${esc(promo)}</p>"
      d.spans.foreach { sp =>
        if (sp.kind == "text") sb ++= s"<p>${esc(sp.text)}</p>"
        else sb ++= s"""<img src="${sp.media_ref}">"""
      }
      sb ++= "</article><footer>Imprint</footer></body></html>"
      sb.toString
    }
    val shardDir = Files.createTempDirectory("graft-warc-e2e")
    orig.grouped(10).zipWithIndex.foreach { case (docs, i) =>
      val out = new java.io.ByteArrayOutputStream(1 << 16)
      docs.foreach { d =>
        graft.sources.WarcIO.writeResponse(out,
          uri = s"https://example.org/${d.doc_id}",
          html = page(d).getBytes(java.nio.charset.StandardCharsets.UTF_8),
          date = "2026-01-01T00:00:00Z", gzip = true)
      }
      java.nio.file.Files.write(
        shardDir.resolve(f"shard-$i%05d.warc.gz"), out.toByteArray)
    }
    val extracted = graft.sources.WarcIO.docsFromWarc(spark, shardDir.toString)
      .map(d => d.copy(doc_id = d.doc_id.stripPrefix("https://example.org/")))
    val expectExtracted = orig.map { d =>
      d.doc_id -> (Span("text", promo, "", 0) +: d.spans.map(sp =>
        if (sp.kind == "text") sp.copy(offset = sp.offset + 1)
        else Span("image", "", sp.media_ref, sp.offset + 1)))
    }.toMap
    assert(extracted.collect().map(d => d.doc_id -> d.spans).toMap == expectExtracted)
    // downstream is the proven chain: cross-doc strip -> correct -> commit
    val res = Boilerplate.strip(extracted, minDf = 2)
    val stripped = res.docs.collect().map(d => d.doc_id -> d.spans).toMap
    assert(stripped.forall { case (_, spans) => !spans.exists(_.text == promo) },
      "promo (df=30) must be stripped")
    val bc = CorrectionJob.broadcastModel(spark, model)
    val corrected = CorrectionJob.correctDocs(res.docs, bc, None, Some(4))
    val out = s"${Files.createTempDirectory("graft-warc-table")}/table"
    TableIO.writeDocs(corrected, out, buckets = 4)
    val back = TableIO.readDocs(spark, out).collect().sortBy(_.doc_id).toSeq
    back.foreach { d =>
      val in = stripped(d.doc_id)
      assert(d.spans.map(s => (s.kind, s.media_ref, s.offset)) ==
        in.map(s => (s.kind, s.media_ref, s.offset)), d.doc_id)
    }
  }

  private object Files {
    def createTempDirectory(prefix: String): java.nio.file.Path =
      java.nio.file.Files.createTempDirectory(prefix)
  }
}
