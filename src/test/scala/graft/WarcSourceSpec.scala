package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.WarcCodec

/** The graft-warc DataSource V2 connector: ISO 28500 record framing as a
  * table, HTTP/charset decode behind column pruning, corruption
  * quarantine, planning-time file pruning, early record-walk stop.
  */
class WarcSourceSpec extends AnyFunSuite {
  import TestSpark._

  private val CRLF = "\r\n"

  /** One WARC record: version line, headers, Content-Length block,
    * CRLFCRLF separator. */
  private def record(warcType: String, uri: String, block: Array[Byte],
      contentType: String = "application/http;msgtype=response",
      idx: Int = 0): Array[Byte] = {
    val head = (s"WARC/1.0$CRLF" +
      s"WARC-Type: $warcType$CRLF" +
      s"WARC-Target-URI: $uri$CRLF" +
      s"WARC-Date: 2024-01-0${1 + idx % 9}T00:00:00Z$CRLF" +
      s"WARC-Record-ID: <urn:uuid:rec-$warcType-$idx>$CRLF" +
      s"Content-Type: $contentType$CRLF" +
      s"Content-Length: ${block.length}$CRLF" + CRLF).getBytes(StandardCharsets.US_ASCII)
    head ++ block ++ (CRLF + CRLF).getBytes(StandardCharsets.US_ASCII)
  }

  /** An application/http response block with an explicit charset. */
  private def httpBlock(status: Int, body: Array[Byte],
      contentType: String = "text/html; charset=utf-8"): Array[Byte] =
    (s"HTTP/1.1 $status OK$CRLF" +
      s"Content-Type: $contentType$CRLF" +
      s"Content-Length: ${body.length}$CRLF" + CRLF)
      .getBytes(StandardCharsets.US_ASCII) ++ body

  /** Two archive files: f0 = warcinfo + request + 2 responses (one
    * latin-1, one 404), f1 = 1 utf-8 response. Returns (dir, paths). */
  private def writeArchives(): (String, Seq[String]) = {
    val dir = Files.createTempDirectory("graft-warc").toString
    val latin1Body = "café résumé".getBytes(StandardCharsets.ISO_8859_1)
    val f0 = record("warcinfo", "urn:warcinfo", "software: graft-test".getBytes, "application/warc-fields") ++
      record("request", "http://a.example/", "GET / HTTP/1.1\r\n\r\n".getBytes,
        "application/http;msgtype=request", idx = 1) ++
      record("response", "http://a.example/",
        httpBlock(200, latin1Body, "text/html; charset=iso-8859-1"), idx = 2) ++
      record("response", "http://a.example/missing",
        httpBlock(404, "not found".getBytes(StandardCharsets.UTF_8)), idx = 3)
    val f1 = record("response", "http://b.example/",
      httpBlock(200, "hello warc ☃ world".getBytes(StandardCharsets.UTF_8)))
    Files.write(Paths.get(s"$dir/f0.warc"), f0)
    Files.write(Paths.get(s"$dir/f1.warc"), f1)
    (dir, Seq(s"$dir/f0.warc", s"$dir/f1.warc"))
  }

  test("reads one row per record with framed metadata and charset-decoded bodies") {
    val (dir, _) = writeArchives()
    val rows = spark.read.format("graft-warc").load(dir).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Boolean]("parse_ok")))
    // record indexes are sequential per file from 0
    rows.groupBy(_.getAs[String]("path")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("record_idx")).sorted.toSeq == rs.indices.toSeq)
    }
    val info = rows.filter(_.getAs[String]("warc_type") == "warcinfo").head
    assert(info.getAs[String]("content_type") == "application/warc-fields")
    assert(info.isNullAt(info.fieldIndex("http_status")), "non-HTTP record got a status")
    // the latin-1 response decodes under its declared charset
    val latin = rows.filter(r => r.getAs[String]("warc_type") == "response" &&
      r.getAs[String]("target_uri") == "http://a.example/").head
    assert(latin.getAs[Int]("http_status") == 200)
    assert(latin.getAs[String]("charset") == "iso-8859-1")
    assert(latin.getAs[String]("body_text") == "café résumé")
    // the utf-8 response round-trips its astral-free unicode exactly
    val utf = rows.filter(_.getAs[String]("target_uri") == "http://b.example/").head
    assert(utf.getAs[String]("body_text") == "hello warc ☃ world")
    // the 404 is a well-framed record with its real status
    assert(rows.filter(_.getAs[String]("target_uri") == "http://a.example/missing")
      .head.getAs[Int]("http_status") == 404)
    // WARC named headers surfaced verbatim
    assert(utf.getAs[String]("record_id") == "<urn:uuid:rec-response-0>")
    assert(latin.getAs[String]("warc_date") == "2024-01-03T00:00:00Z")
  }

  test("whole-file gzip (incl. multi-member) inflates to the identical table") {
    val (dir, paths) = writeArchives()
    val gzDir = Files.createTempDirectory("graft-warc-gz").toString
    def gzip(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    // f0 as TWO concatenated gzip members (the per-record CommonCrawl
    // layout), f1 as one member
    val f0 = Files.readAllBytes(Paths.get(paths.head))
    val cut = f0.length / 2
    Files.write(Paths.get(s"$gzDir/f0.warc.gz"),
      gzip(java.util.Arrays.copyOfRange(f0, 0, cut)) ++
        gzip(java.util.Arrays.copyOfRange(f0, cut, f0.length)))
    Files.write(Paths.get(s"$gzDir/f1.warc.gz"),
      gzip(Files.readAllBytes(Paths.get(paths(1)))))
    def canon(d: String) = spark.read.format("graft-warc").load(d)
      .select("record_idx", "warc_type", "target_uri", "http_status", "body_text")
      .collect().map(_.toString).sorted.toSeq
    assert(canon(gzDir) == canon(dir))
  }

  test("malformed framing quarantines the tail and keeps the records before it") {
    val (dir, paths) = writeArchives()
    // truncate f0 inside its third record's block
    val full = Files.readAllBytes(Paths.get(paths.head))
    Files.write(Paths.get(paths.head), java.util.Arrays.copyOf(full, full.length - 40))
    val rows = spark.read.format("graft-warc").load(paths.head).collect()
    val bad = rows.filter(!_.getAs[Boolean]("parse_ok"))
    assert(bad.length == 1, s"expected one quarantine row, got ${bad.length}")
    assert(bad.head.isNullAt(bad.head.fieldIndex("warc_type")))
    // the intact leading records still parsed
    assert(rows.count(_.getAs[Boolean]("parse_ok")) >= 2)
    // a non-WARC file quarantines the same way
    val junk = s"$dir/junk.warc"
    Files.write(Paths.get(junk), "HTTP/1.1 200 OK\r\n\r\nnot a warc".getBytes)
    val j = spark.read.format("graft-warc").load(junk).collect()
    assert(j.length == 1 && !j.head.getAs[Boolean]("parse_ok"))
    // an adversarial Content-Length near Long.MaxValue must quarantine,
    // not overflow the cursor into a failed task (crawl data is untrusted)
    val huge = s"$dir/huge.warc"
    Files.write(Paths.get(huge),
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "Content-Length: 9223372036854775800\r\n\r\nbody").getBytes)
    val h = spark.read.format("graft-warc").load(huge).collect()
    assert(h.length == 1 && !h.head.getAs[Boolean]("parse_ok"))
  }

  test("column pruning reaches the scan; counting records decodes no payload") {
    val (dir, _) = writeArchives()
    val slim = spark.read.format("graft-warc").load(dir)
      .select("path", "warc_type")
    val plan = slim.queryExecution.executedPlan.toString
    assert(plan.contains("graft-warc"), plan)
    assert(!plan.contains("body_text"), plan)
    assert(slim.count() == 5)
    val n = spark.read.format("graft-warc").load(dir)
      .groupBy("warc_type").agg(count(lit(1))).count()
    assert(n == 3) // warcinfo, request, response
  }

  test("path filter prunes files at planning time; type/idx pushdown skips walk work") {
    val (dir, paths) = writeArchives()
    val one = spark.read.format("graft-warc").load(dir)
      .filter(col("path") === s"file:${paths(1)}")
    assert(one.rdd.getNumPartitions == 1, s"got ${one.rdd.getNumPartitions}")
    assert(one.count() == 1)
    // pushdown never changes results: pushed AND re-applied
    val full = spark.read.format("graft-warc").load(dir)
    assert(full.filter(col("warc_type") === "response").count() == 3)
    // record_idx bound stops the walk BEFORE malformed later records: with
    // f0's tail truncated mid-record-3, an idx<=1 scan sees clean rows
    // only — proof the bound skipped the walk, not filtered rows after
    val raw = Files.readAllBytes(Paths.get(paths.head))
    Files.write(Paths.get(paths.head), java.util.Arrays.copyOf(raw, raw.length - 40))
    val bounded = spark.read.format("graft-warc").load(paths.head)
      .filter(col("record_idx") <= 1).collect()
    assert(bounded.length == 2 && bounded.forall(_.getAs[Boolean]("parse_ok")))
    val unbounded = spark.read.format("graft-warc").load(paths.head).collect()
    assert(unbounded.exists(!_.getAs[Boolean]("parse_ok")))
  }

  test("WarcCodec property: 200 random archives round-trip record-exactly") {
    val rnd = new scala.util.Random(77)
    (1 to 200).foreach { trial =>
      val n = 1 + rnd.nextInt(6)
      val specs = (0 until n).map { i =>
        val isResp = rnd.nextBoolean()
        // bodies may contain ANYTHING — CRLFs, 'WARC/' look-alikes,
        // random binary: Content-Length framing must never resync inside
        val body: Array[Byte] =
          if (isResp) (s"body $trial-$i " + ("x" * rnd.nextInt(50))).getBytes(StandardCharsets.UTF_8)
          else { val b = new Array[Byte](rnd.nextInt(80)); rnd.nextBytes(b); b }
        (isResp, s"http://p.example/$trial/$i", body)
      }
      val bytes = specs.zipWithIndex.map { case ((isResp, uri, body), i) =>
        if (isResp) record("response", uri, httpBlock(200, body), idx = i)
        else record("metadata", uri, body, "application/warc-fields", idx = i)
      }.reduce(_ ++ _)
      val out = graft.sources.WarcCodec.walk(bytes, wantHttp = true, wantBody = true)
      assert(out.size == n, s"trial $trial: ${out.size} != $n")
      out.zip(specs).zipWithIndex.foreach { case ((r, (isResp, uri, body)), i) =>
        assert(r.parseOk && r.recordIdx == i)
        assert(r.targetUri.contains(uri))
        if (isResp) {
          assert(r.warcType.contains("response") && r.httpStatus.contains(200))
          assert(r.bodyText.contains(new String(body, StandardCharsets.UTF_8)))
        } else assert(r.warcType.contains("metadata") && r.httpStatus.isEmpty)
      }
    }
  }

  test("WarcCodec fuzz: arbitrary and mutated bytes never throw — quarantine or truncate only") {
    val rnd = new scala.util.Random(1234)
    // pure noise: every buffer walks to a bounded, throw-free result
    (1 to 200).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(b)
      val out = WarcCodec.walk(b, wantHttp = true, wantBody = true)
      assert(out.size <= b.length + 1, s"fuzz $i produced unbounded output")
    }
    // mutated VALID archives: flip/truncate/splice a well-formed file —
    // the walk must stay total, and any emitted parse_ok row must carry
    // a sane record index
    val valid = record("response", "http://f.example/",
      httpBlock(200, "fuzz seed document body".getBytes(StandardCharsets.UTF_8))) ++
      record("metadata", "urn:meta", "k: v".getBytes, "application/warc-fields", idx = 1)
    (1 to 300).foreach { i =>
      val b = valid.clone()
      rnd.nextInt(3) match {
        case 0 => // point mutation
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          val out = WarcCodec.walk(b, wantHttp = true, wantBody = true)
          out.foreach(r => assert(r.recordIdx >= 0 && r.recordIdx <= 2))
        case 1 => // truncation
          val cut = java.util.Arrays.copyOf(b, rnd.nextInt(b.length))
          WarcCodec.walk(cut, wantHttp = true, wantBody = true): Unit
        case 2 => // splice two fragments
          val a = java.util.Arrays.copyOf(b, rnd.nextInt(b.length))
          val c = java.util.Arrays.copyOfRange(valid, rnd.nextInt(valid.length), valid.length)
          WarcCodec.walk(a ++ c, wantHttp = true, wantBody = true): Unit
      }
    }
    // gzip fuzz: corrupt deflate streams behind a valid magic never throw
    // at the inflate seam the STREAMING path also uses
    (1 to 100).foreach { _ =>
      val b = new Array[Byte](64 + rnd.nextInt(512))
      rnd.nextBytes(b)
      b(0) = 0x1f.toByte; b(1) = 0x8b.toByte
      try WarcCodec.inflate(b, 1 << 20): Unit
      catch { case _: java.io.IOException => () } // IO-shaped is the contract...
    }
  }

  test("WarcCodec charset handling: parameter extraction, fallback, replacement") {
    assert(WarcCodec.charsetOf("text/html; charset=ISO-8859-1").contains("iso-8859-1"))
    assert(WarcCodec.charsetOf("text/html; charset=\"utf-8\"; foo=bar").contains("utf-8"))
    assert(WarcCodec.charsetOf("text/html").isEmpty)
    // unknown charset falls back to UTF-8 rather than failing the scan
    assert(WarcCodec.decode("abc".getBytes(StandardCharsets.UTF_8), "not-a-charset") == "abc")
    // malformed bytes REPLACE, never throw (crawl payloads lie)
    val broken = Array[Byte](0x61, 0xFF.toByte, 0x62)
    assert(WarcCodec.decode(broken, "utf-8") == "a�b")
  }

  test("end to end: WARC responses flow through the q152 boilerplate front door") {
    val dir = Files.createTempDirectory("graft-warc-e2e").toString
    val article = "<html><body><p>" +
      ("A long informative paragraph about city trips and weather patterns. " * 4) +
      "</p></body></html>"
    val navPage = "<ul>" + (1 to 8).map(i =>
      s"""<li><a href="/p$i">Navigation item number $i</a></li>""").mkString + "</ul>"
    val bytes =
      record("response", "http://site.example/article", httpBlock(200,
        article.getBytes(StandardCharsets.UTF_8), "text/html; charset=utf-8")) ++
      record("response", "http://site.example/nav", httpBlock(200,
        navPage.getBytes(StandardCharsets.UTF_8), "text/html; charset=utf-8"), idx = 1)
    Files.write(Paths.get(s"$dir/crawl.warc"), bytes)
    val docs = CorpusPipeline.fromWarc(spark, dir)
    val routed = graft.operators.TextAnalysis.markupExtract(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[String]("lane"), r.getAs[String]("clean_text")))).toMap
    // the article extracts to a clean lane with its prose text; the
    // link-farm page quarantines — the crawl front door and the markup
    // front door compose without any adapter
    val (artLane, artText) = routed("http://site.example/article")
    assert(!artLane.startsWith("quarantine"), artLane)
    assert(artText.contains("informative paragraph about city trips"))
    assert(routed("http://site.example/nav")._1.startsWith("quarantine"))
  }

  test("s21 streaming crawl ingest: new archives decode, gate, and publish per batch") {
    import graft.streaming.CrawlIngest
    val landing = Files.createTempDirectory("graft-crawl-landing").toString
    val out = Files.createTempDirectory("graft-crawl-out").toString
    val (pub, quar, ckpt) = (s"$out/published", s"$out/quarantine", s"$out/ckpt")
    // first archive lands BEFORE the stream starts (initial listing)
    Files.write(Paths.get(s"$landing/a0.warc"),
      record("response", "http://c.example/ok",
        httpBlock(200, "a perfectly calm crawl document".getBytes(StandardCharsets.UTF_8))) ++
      record("request", "http://c.example/ok", "GET /".getBytes,
        "application/http;msgtype=request", idx = 1) ++
      record("response", "http://c.example/404",
        httpBlock(404, "gone".getBytes(StandardCharsets.UTF_8)), idx = 2))
    val q = CrawlIngest.ingestStream(spark, landing, pub, quar, ckpt)
    try {
      q.processAllAvailable()
      val d0 = spark.read.parquet(pub)
      assert(d0.count() == 1, "only the HTTP-200 response becomes a document")
      assert(d0.head().getAs[String]("text") == "a perfectly calm crawl document")
      // a newly LANDED archive with an unsafe doc arrives mid-stream
      Files.write(Paths.get(s"$landing/a1.warc"),
        record("response", "http://c.example/bad",
          httpBlock(200, "contains selfharmterm so it quarantines".getBytes(StandardCharsets.UTF_8))) ++
        record("response", "http://c.example/fine",
          httpBlock(200, "another calm crawl document arrives".getBytes(StandardCharsets.UTF_8)), idx = 1))
      q.processAllAvailable()
      assert(spark.read.parquet(pub).count() == 2)
      val held = spark.read.parquet(quar).collect()
      assert(held.length == 1 && held.head.getAs[String]("lane") == "blocked")
      // doc ids are stable, distinct, AND batch-parity: a backfill via
      // CorpusPipeline.fromWarc over the same landing dir assigns the
      // SAME xxhash64(path, record_idx) ids the stream did — re-ingest
      // across the two paths is id-level idempotent
      val streamed = (spark.read.parquet(pub).select("doc_id").collect() ++
        spark.read.parquet(quar).select("doc_id").collect())
        .map(_.getLong(0)).sorted.toSeq
      assert(streamed.distinct.length == streamed.length)
      val batch = CorpusPipeline.fromWarc(spark, landing)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(streamed == batch, s"stream $streamed vs batch $batch")
    } finally q.stop()
  }

  test("CorpusPipeline.fromWarc yields the documents contract from 200 responses only") {
    val (dir, _) = writeArchives()
    val docs = CorpusPipeline.fromWarc(spark, dir)
    assert(docs.columns.toSeq == Seq("doc_id", "text", "lang", "source"))
    val rows = docs.collect()
    // 2 HTTP-200 responses across both files; the 404 / request / warcinfo
    // records never become documents
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("source")).toSet ==
      Set("http://a.example/", "http://b.example/"))
    // doc_id is the stable (path, record_idx) hash: re-reading is idempotent
    val again = CorpusPipeline.fromWarc(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).sorted.toSeq ==
      again.map(_.getAs[Long]("doc_id")).sorted.toSeq)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 2)
  }
}
