package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

class WarcSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def rec(typ: String, uri: String, payload: Array[Byte],
                  version: String = "WARC/1.0",
                  extraHeader: String = ""): Array[Byte] =
    (version + "\r\n" +
      s"WARC-Type: $typ\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      extraHeader +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
      payload ++ "\r\n\r\n".getBytes("UTF-8")

  test("WARC record walk: multi-record, case-insensitive headers, payload with embedded CRLFCRLF") {
    // the payload deliberately CONTAINS \r\n\r\n — the walk must be
    // Content-Length-driven, never terminator-scanning, or a binary
    // payload (gzip, image) would truncate the record
    val tricky = "first\r\n\r\nsecond WARC/1.0\r\n fake".getBytes("UTF-8")
    val buf = rec("request", "https://a/1", "GE".getBytes) ++
      rec("response", "https://a/1", tricky,
        extraHeader = "cOnTeNt-TyPe: application/http\r\n") ++
      rec("metadata", "https://a/2", Array.emptyByteArray, version = "WARC/1.1")
    val rs = Warc.parseRecords(buf)
    assert(rs.length == 3, s"expected 3 records, got ${rs.length}")
    assert(rs.map(_.headers("warc-type")) == Seq("request", "response", "metadata"))
    assert(rs(1).payload.sameElements(tricky), "length-driven payload must round-trip exactly")
    assert(rs(1).headers("content-type") == "application/http",
      "header names lower-case, values verbatim")
    assert(rs(2).version == "WARC/1.1" && rs(2).payload.isEmpty)
  }

  test("WARC record walk: malformed records stop the walk, prior records salvage") {
    val good = rec("response", "https://ok", "abc".getBytes)
    // missing mandatory Content-Length
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n" + "x\r\n\r\n").getBytes("UTF-8")
    assert(Warc.parseRecords(good ++ noLen).length == 1, "salvage keeps the good prefix")
    // length overruns the buffer
    val overrun = ("WARC/1.0\r\nContent-Length: 9999\r\n\r\n").getBytes("UTF-8") ++ "tiny".getBytes
    assert(Warc.parseRecords(good ++ overrun).length == 1)
    // bad version line
    assert(Warc.parseRecords("HTTP/1.1 200 OK\r\n\r\n".getBytes("UTF-8")).isEmpty)
    // missing \r\n\r\n terminator after the payload
    val noTerm = ("WARC/1.0\r\nContent-Length: 2\r\n\r\nab").getBytes("UTF-8")
    assert(Warc.parseRecords(noTerm).isEmpty)
    // negative-looking / non-numeric length rejects
    val badLen = ("WARC/1.0\r\nContent-Length: -5\r\n\r\nab\r\n\r\n").getBytes("UTF-8")
    assert(Warc.parseRecords(badLen).isEmpty)
    assert(Warc.parseRecords(Array.emptyByteArray).isEmpty)
    // fuzz: random bytes never throw
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 300)
      Warc.parseRecords(Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte))
  }

  test("WARC file source: a directory of .warc segments explodes to one row per record, parallel by file") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft_warc_src").toString
    try {
      val f1 = rec("response", "https://x/1", "hello".getBytes) ++
        rec("response", "https://x/2", "world!".getBytes)
      val f2 = rec("request", "https://y/3", Array.emptyByteArray)
      java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "seg-00000.warc"), f1)
      java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "seg-00001.warc"), f2)
      val rows = Warc.records(spark, tmp)
        .select(col("file"), col("record_idx"),
          col("headers")("warc-target-uri").as("uri"), col("payload"))
        .collect()
      assert(rows.length == 3, s"3 records across 2 files, got ${rows.length}")
      val byUri = rows.map(r => r.getString(2) ->
        new String(r.getAs[Array[Byte]]("payload"), "UTF-8")).toMap
      assert(byUri == Map("https://x/1" -> "hello", "https://x/2" -> "world!",
        "https://y/3" -> ""))
      assert(rows.map(_.getString(0)).distinct.length == 2, "file lineage column")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  test("gzipped segments: multi-member .warc.gz inflates and walks; bombs and corruption reject") {
    // Common Crawl convention: each record its own gzip MEMBER,
    // members concatenated — GZIPInputStream must walk them all
    val r1 = rec("response", "https://g/1", "alpha".getBytes)
    val r2 = rec("response", "https://g/2", "beta".getBytes)
    val multi = gzip(r1) ++ gzip(r2)
    val inflated = Warc.gunzipAll(multi).get
    assert(inflated.sameElements(r1 ++ r2), "member concatenation must inflate losslessly")
    assert(Warc.parseRecords(inflated).length == 2)
    // bomb guard: a tiny cap rejects instead of allocating
    assert(Warc.gunzipAll(gzip(new Array[Byte](100000)), cap = 1024).isEmpty,
      "inflated size past the cap must reject, not allocate")
    // corrupt / truncated gzip rejects, never throws
    assert(Warc.gunzipAll(multi.dropRight(7)).isEmpty)
    val flipped = multi.clone(); flipped(multi.length / 2) = (flipped(multi.length / 2) ^ 0x5a).toByte
    Warc.gunzipAll(flipped) // corrupt body: None or salvage — must not throw
    assert(Warc.gunzipAll("notgz".getBytes).isEmpty)
    // the file source inflates .gz transparently
    val tmp = java.nio.file.Files.createTempDirectory("graft_warc_gz").toString
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "seg.warc.gz"), multi)
      val rows = Warc.records(spark, tmp).collect()
      assert(rows.length == 2, s".warc.gz must explode to its records, got ${rows.length}")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("member streaming: a segment whose TOTAL inflated size exceeds the cap still yields ALL its records") {
    // three members, each inflating to ~600 KB — total ~1.8 MB. A
    // whole-segment cap of 1 MB would silently drop everything (the
    // round-15 failure mode); the per-member walk must keep all 3.
    val capPerMember = 1 << 20
    val recs = (0 until 3).map { i =>
      rec("response", s"https://big/$i", Array.fill(600 * 1024)(('a' + i).toByte))
    }
    val segment = recs.map(gzip).reduce(_ ++ _)
    assert(segment.length < 3 * capPerMember, "sanity: compressed segment is small")
    val rows = Warc.fileRows("seg.warc.gz", segment, capPerMember).toVector
    assert(rows.length == 3, s"all records must survive, got ${rows.length}")
    assert(rows.forall(_._4), "every row parses clean")
    assert(rows.map(_._3) == Vector(0, 1, 2), "record_idx is file-ordered")
    assert(rows.map(_._2) == Vector(0, 1, 2), "one record per member, CC convention")
    assert(rows.map(r => new String(r._8.take(1), "UTF-8")) == Vector("a", "b", "c"))
    // a member that ALONE exceeds the cap drops visibly — only itself
    val rows2 = Warc.fileRows("seg.warc.gz", segment, capPerMember = 100 * 1024).toVector
    assert(rows2.count(!_._4) == 3 && rows2.forall(_._5 == "member_cap_exceeded"),
      "per-member cap overruns must surface, not vanish")
  }

  test("member streaming: a corrupt middle member drops ONLY itself, visibly, and the walk resyncs") {
    val r = (0 until 3).map(i => gzip(rec("response", s"https://c/$i", s"pay$i".getBytes)))
    // corrupt member 1's deflate body (past the 10-byte header)
    val bad = r(1).clone(); bad(14) = (bad(14) ^ 0x5a).toByte
    val segment = r(0) ++ bad ++ r(2)
    val rows = Warc.fileRows("seg.warc.gz", segment).toVector
    val good = rows.filter(_._4)
    val drops = rows.filter(!_._4)
    assert(good.map(_._7("warc-target-uri")) == Vector("https://c/0", "https://c/2"),
      s"members 0 and 2 must survive, got ${good.map(_._7)}")
    assert(drops.nonEmpty && drops.forall(_._5 != null),
      "the damaged member must be VISIBLE as a drop row with a reason")
    // truncated final member: prior members survive, tail drops visibly
    val trunc = r(0) ++ r(1).dropRight(5)
    val rows3 = Warc.fileRows("t.warc.gz", trunc).toVector
    assert(rows3.count(_._4) == 1 && rows3.count(!_._4) == 1)
    // CRC damage (flip a byte in the trailer) is caught, not emitted as a record
    val crcBad = r(0).clone(); crcBad(crcBad.length - 6) = (crcBad(crcBad.length - 6) ^ 1).toByte
    val rows4 = Warc.fileRows("x.warc.gz", crcBad).toVector
    assert(rows4.exists(d => !d._4 && d._5.startsWith("gzip_")), s"trailer damage must drop: $rows4")
    // an unparseable record TAIL inside a good member surfaces too
    val tailJunk = gzip(rec("response", "https://c/ok", "x".getBytes) ++ "WARC/9.9 junk".getBytes)
    val rows5 = Warc.fileRows("y.warc.gz", tailJunk).toVector
    assert(rows5.count(_._4) == 1 &&
      rows5.exists(d => !d._4 && d._5 == "record_parse_error"))
    // fuzz: arbitrary bytes through the member walk never throw
    val rnd = new scala.util.Random(31)
    for (_ <- 0 until 300)
      Warc.fileRows("f.warc.gz", Array.fill(rnd.nextInt(400))(rnd.nextInt(256).toByte)).foreach(_ => ())
  }

  test("fileStats: the per-file ingest ledger counts clean records and dropped members with reasons") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft_warc_stats").toString
    try {
      val good = gzip(rec("response", "https://s/1", "one".getBytes)) ++
        gzip(rec("response", "https://s/2", "two".getBytes))
      val r0 = gzip(rec("response", "https://s/3", "three".getBytes))
      val bad = r0.clone(); bad(14) = (bad(14) ^ 0x5a).toByte
      java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "clean.warc.gz"), good)
      java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "damaged.warc.gz"), r0 ++ bad)
      val stats = Warc.fileStats(Warc.records(spark, tmp)).collect()
        .map(r => r.getString(0).split('/').last ->
          ((r.getLong(1), r.getLong(2), r.getSeq[String](3)))).toMap
      assert(stats("clean.warc.gz")._1 == 2 && stats("clean.warc.gz")._2 == 0)
      assert(stats("damaged.warc.gz")._1 == 1, "the clean member of the damaged file survives")
      assert(stats("damaged.warc.gz")._2 >= 1 && stats("damaged.warc.gz")._3.nonEmpty,
        s"drops must be counted WITH reasons: ${stats("damaged.warc.gz")}")
      // the clean stream is one filter away
      assert(Warc.records(spark, tmp).filter(col("ok")).count() == 3)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("httpSplit: response payloads divide into HTTP headers and body at the first blank line") {
    val body = "<html>\r\n\r\nbody with blank lines</html>".getBytes("UTF-8")
    val payload = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=UTF-8\r\n" +
      "X-Weird: a:b:c\r\n\r\n").getBytes("UTF-8") ++ body
    val (hdrs, got) = Warc.httpSplit(payload).get
    assert(hdrs(":status-line") == "HTTP/1.1 200 OK")
    assert(hdrs("content-type") == "text/html; charset=UTF-8")
    assert(hdrs("x-weird") == "a:b:c", "values keep their colons")
    assert(got.sameElements(body), "body copied whole, embedded blank lines preserved")
    // empty body
    val (_, empty) = Warc.httpSplit("HTTP/1.0 204 No Content\r\n\r\n".getBytes).get
    assert(empty.isEmpty)
    // not HTTP / never closes headers → None, never throws
    assert(Warc.httpSplit("GET / HTTP/1.1\r\n\r\n".getBytes).isEmpty, "request lines are not responses")
    assert(Warc.httpSplit("HTTP/1.1 200 OK\r\nBroken".getBytes).isEmpty)
    assert(Warc.httpSplit(Array.emptyByteArray).isEmpty)
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 200) Warc.httpSplit(Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte))
  }

  test("decodeChunked: RFC 9112 framing reassembles across chunks; truncation and bad hex are visible verdicts") {
    def frame(parts: Seq[Array[Byte]], trailers: String = "\r\n"): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach { p =>
        out.write(s"${p.length.toHexString}\r\n".getBytes); out.write(p); out.write("\r\n".getBytes)
      }
      out.write(("0\r\n" + trailers).getBytes)
      out.toByteArray
    }
    val body = "hello chunked world, crossing boundaries".getBytes
    val parts = body.grouped(7).toSeq
    assert(Warc.decodeChunked(frame(parts)).toOption.get.sameElements(body))
    // chunk extensions after ';' ignored; trailers skipped
    val ext = "5;name=v\r\nhello\r\n0\r\nX-T: 1\r\n\r\n".getBytes
    assert(Warc.decodeChunked(ext).toOption.get.sameElements("hello".getBytes))
    // empty entity
    assert(Warc.decodeChunked("0\r\n\r\n".getBytes).toOption.get.isEmpty)
    // truncated mid-chunk / missing terminator / bad hex / cap — all Left, never throw
    assert(Warc.decodeChunked("a\r\nshort".getBytes).isLeft, "truncated data")
    assert(Warc.decodeChunked("zz\r\nhello\r\n0\r\n\r\n".getBytes).isLeft, "bad hex")
    assert(Warc.decodeChunked("5\r\nhelloXX0\r\n\r\n".getBytes).isLeft, "missing data CRLF")
    assert(Warc.decodeChunked(frame(parts), cap = 10).isLeft, "cap")
    assert(Warc.decodeChunked("ffffffff\r\n".getBytes).isLeft, "giant chunk size is a verdict, not an allocation")
    // fuzz: truncated frames at every prefix length never throw
    val full = frame(parts)
    for (n <- 0 until full.length) Warc.decodeChunked(full.take(n))
    val rnd = new scala.util.Random(37)
    for (_ <- 0 until 300) Warc.decodeChunked(Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte))
  }

  test("decodeEntity: chunked + Content-Encoding unwrap in wire order; unknown codings are visible") {
    val raw = "the entity body".getBytes
    val gz = gzip(raw)
    val chunked = {
      val out = new java.io.ByteArrayOutputStream()
      gz.grouped(5).foreach { p =>
        out.write(s"${p.length.toHexString}\r\n".getBytes); out.write(p); out.write("\r\n".getBytes)
      }
      out.write("0\r\n\r\n".getBytes); out.toByteArray
    }
    val hdrs = Map("transfer-encoding" -> "chunked", "content-encoding" -> "gzip")
    assert(Warc.decodeEntity(hdrs, chunked).toOption.get.sameElements(raw))
    // identity / absent headers pass through
    assert(Warc.decodeEntity(Map.empty, raw).toOption.get.sameElements(raw))
    // deflate: zlib-wrapped AND the raw fallback both decode
    val zlib = {
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val buf = new Array[Byte](1024); val n = d.deflate(buf); d.end(); buf.take(n)
    }
    val rawDeflate = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](1024); val n = d.deflate(buf); d.end(); buf.take(n)
    }
    assert(Warc.decodeEntity(Map("content-encoding" -> "deflate"), zlib).toOption.get.sameElements(raw))
    assert(Warc.decodeEntity(Map("content-encoding" -> "deflate"), rawDeflate).toOption.get.sameElements(raw),
      "the classic raw-deflate server bug must still decode")
    // unknown coding: a verdict, not compressed bytes passed off as text
    assert(Warc.decodeEntity(Map("content-encoding" -> "br"), raw).isLeft)
    // corrupt gzip body under chunked framing: visible
    val badGz = gz.clone(); badGz(badGz.length / 2) = (badGz(badGz.length / 2) ^ 0x5a).toByte
    assert(Warc.decodeEntity(Map("content-encoding" -> "gzip"), badGz).isLeft)
  }

  test("bodyToText: BOM outranks header, declared charset honored, strict UTF-8 sniff then Latin-1 fallback") {
    val s = "naïve café – ± é"
    // BOM wins even against a lying header
    val bomUtf8 = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ s.getBytes("UTF-8")
    assert(Warc.bodyToText(Map("content-type" -> "text/plain; charset=ISO-8859-1"), bomUtf8) == s)
    val bomLe = Array[Byte](0xff.toByte, 0xfe.toByte) ++ s.getBytes("UTF-16LE")
    assert(Warc.bodyToText(Map.empty, bomLe) == s)
    val bomBe = Array[Byte](0xfe.toByte, 0xff.toByte) ++ s.getBytes("UTF-16BE")
    assert(Warc.bodyToText(Map.empty, bomBe) == s)
    // declared charset decodes Latin-1 bytes correctly
    val latin = "café ±".getBytes("ISO-8859-1")
    assert(Warc.bodyToText(Map("content-type" -> "text/html; charset=iso-8859-1"), latin) == "café ±")
    assert(Warc.bodyToText(Map("content-type" -> "text/html; charset=\"ISO-8859-1\""), latin) == "café ±",
      "quoted charset parameter")
    // undeclared: valid UTF-8 sniffs as UTF-8 …
    assert(Warc.bodyToText(Map.empty, s.getBytes("UTF-8")) == s)
    // … and invalid UTF-8 falls back to Latin-1 instead of U+FFFD soup
    assert(Warc.bodyToText(Map.empty, latin) == "café ±")
    // unknown declared charset falls through to the sniff
    assert(Warc.bodyToText(Map("content-type" -> "text/plain; charset=x-nope"), s.getBytes("UTF-8")) == s)
    assert(Warc.bodyToText(Map.empty, Array.emptyByteArray) == "")
  }

  test("llm_warc_entity: the full production chain reproduces the oracle formula on every document") {
    val dir = TestSpark.sf
    val got = Warc.warcEntity(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2), r.getString(3)))).toMap
    val want = graft.sources.Tables.documents(spark, dir)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map { r =>
        val id = r.getLong(0)
        val ct = (id % 3) match {
          case 0 => "text/plain; charset=UTF-8"
          case 1 => "text/plain; charset=ISO-8859-1"
          case _ => "text/plain"
        }
        // the ISO-8859-1 regime projects onto U+00..U+FF (mirrors the
        // oracle's regexp_replace) — a no-op on Latin-1-clean testdata
        val text = if (id % 3 == 1) r.getString(1).filter(_ <= 0xFF.toChar)
                   else r.getString(1)
        id -> (((id % 3).toInt, ct, text + " é"))
      }.toMap
    assert(got.keySet == want.keySet)
    assert(got == want, "entity-path recovery diverges from the synthesized chain's closed form")
  }

  test("warcEntity ISO-8859-1 regime survives a NON-Latin-1 corpus: projection, not silent '?' mangling") {
    import spark.implicits._
    // doc_ids ≡ 1 (mod 3) take the ISO-8859-1 regime; their text
    // carries CJK + astral chars that ISO-8859-1 cannot encode. The
    // round-16 code getBytes'd them to '?' silently; now the body is
    // explicitly projected onto the Latin-1 subset, so the recovered
    // text equals the same projection the oracle SQL computes.
    val docs = Seq(
      (1L, "café 中文 mix 😀 tail", "x", "srcA", 10L),
      (4L, "pure latin-1 ünïcødé", "x", "srcB", 10L),
      (0L, "utf-8 regime keeps 中文", "x", "srcC", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ent_l1").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Warc.warcEntity(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getString(3)))).toMap
    assert(got(1L) == (("text/plain; charset=ISO-8859-1", "café  mix  tail é")),
      "non-Latin-1 chars must be DROPPED by the projection, never '?'-substituted")
    assert(got(4L) == (("text/plain; charset=ISO-8859-1", "pure latin-1 ünïcødé é")),
      "Latin-1-encodable text passes unchanged")
    assert(got(0L) == (("text/plain; charset=UTF-8", "utf-8 regime keeps 中文 é")),
      "the UTF-8 regime is unaffected by the projection")
  }

  test("streaming crawl ingest: segment files landing in the directory emit records incrementally, once each") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_stream").toString
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "seg-0.warc"),
        rec("response", "https://s/1", "one".getBytes) ++
          rec("response", "https://s/2", "two".getBytes))
      val stream = Warc.recordStream(spark, dir)
        .select(col("file"), col("headers")("warc-target-uri").as("uri"))
      val q = stream.writeStream.format("memory").queryName("warc_ingest")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val b1 = spark.sql("select uri from warc_ingest").collect().map(_.getString(0)).toSet
        assert(b1 == Set("https://s/1", "https://s/2"), s"first segment's records: $b1")
        // a second segment arrives (gzipped, per the crawl convention)
        java.nio.file.Files.write(java.nio.file.Paths.get(dir, "seg-1.warc.gz"),
          gzip(rec("response", "https://s/3", "three".getBytes)))
        q.processAllAvailable()
        val all = spark.sql("select uri from warc_ingest").collect().map(_.getString(0))
        assert(all.toSet == Set("https://s/1", "https://s/2", "https://s/3"),
          s"new segment's records append: ${all.toSet}")
        assert(all.length == 3, "each record exactly once — the file log is the delivery ledger")
      } finally q.stop()
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("reused-compressor gzip writer is byte-identical to GZIPOutputStream") {
    val rnd = new scala.util.Random(4177)
    val cases = Seq(
      Array.emptyByteArray,
      "hello warc".getBytes("UTF-8"),
      Array.fill(200000)((rnd.nextInt(256) - 128).toByte), // incompressible: multi-buf deflate loop
      ("abc" * 50000).getBytes("UTF-8")) // highly compressible
    for (raw <- cases) {
      val viaJdk = {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(raw); g.close()
        bos.toByteArray
      }
      val viaReused = Warc.gzipMemberOf(raw)
      assert(java.util.Arrays.equals(viaJdk, viaReused),
        s"gzip writer diverged from GZIPOutputStream at raw length ${raw.length}")
      // and consecutive members from the SAME thread-local state stay clean
      val again = Warc.gzipMemberOf(raw)
      assert(java.util.Arrays.equals(viaReused, again), "reset-per-member state leaked across calls")
    }
  }

  test("llm_warc_http: gunzip + record walk + HTTP split reproduce the oracle formula on every document") {
    val dir = TestSpark.sf
    val got = Warc.warcHttp(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3), r.getString(4))))
      .toMap
    val want = graft.sources.Tables.documents(spark, dir)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map { r =>
        val text = r.getString(1)
        r.getLong(0) -> (("HTTP/1.1 200 OK", "text/html; charset=UTF-8",
          text.getBytes("UTF-8").length.toLong, text))
      }.toMap
    assert(got.keySet == want.keySet)
    assert(got == want, "full ingest-path extraction diverges from the synthesized segment's closed form")
  }

  test("llm_warc_extract: the real record walk reproduces the oracle formula on every document") {
    val dir = TestSpark.sf
    val got = Warc.warcExtract(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2), r.getLong(3), r.getString(4))))
      .toMap
    val want = graft.sources.Tables.documents(spark, dir)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val text = r.getString(2)
        r.getLong(0) -> ((2, s"https://${r.getString(1)}/doc/${r.getLong(0)}",
          text.getBytes("UTF-8").length.toLong, text))
      }.toMap
    assert(got.keySet == want.keySet)
    assert(got == want, "extracted WARC fields diverge from the synthesized segment's closed form")
  }
}
