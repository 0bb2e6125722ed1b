package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sitemap

/** Sitemap document parsing + depth-capped index expansion pins —
  * the hostile-input discipline mirrors RobotsSpec: every cap
  * exercised, entity bombs inert, framing attacks dropped. */
class SitemapSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("urlset and sitemapindex entries parse typed, in document order") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://a.example/one</loc><lastmod>2026-01-01</lastmod></url>
        |  <url><loc> https://a.example/two </loc><priority>0.8</priority></url>
        |</urlset>""".stripMargin
    assert(Sitemap.parseEntries(xml) ==
      Seq(("url", "https://a.example/one"), ("url", "https://a.example/two")))
    val idx =
      """<sitemapindex><sitemap><loc>https://a.example/s1.xml</loc></sitemap>
        |<sitemap><loc>https://a.example/s2.xml</loc></sitemap></sitemapindex>""".stripMargin
    assert(Sitemap.parseEntries(idx) ==
      Seq(("sitemap", "https://a.example/s1.xml"), ("sitemap", "https://a.example/s2.xml")))
  }

  test("entity decode, CDATA literality, comment/PI/DOCTYPE skipping") {
    val xml =
      """<!DOCTYPE urlset [<!ENTITY bomb "&bomb;&bomb;">]>
        |<?xml-stylesheet href="x"?>
        |<urlset>
        |<!-- <url><loc>https://decoy.invalid/a</loc></url> -->
        |<url><loc>https://a.example/p?x=1&amp;y=&#50;</loc></url>
        |<url><loc><![CDATA[https://a.example/cd?a=1&amp;raw]]></loc></url>
        |<url><loc><![CDATA[https://a.example/evil</loc>]]></loc></url>
        |</urlset>""".stripMargin
    assert(Sitemap.parseEntries(xml) == Seq(
      ("url", "https://a.example/p?x=1&y=2"), // &amp; and &#50; decode
      ("url", "https://a.example/cd?a=1&amp;raw"), // CDATA stays literal
      ("url", "https://a.example/evil</loc>"))) // </loc> inside CDATA doesn't terminate
    // an entity bomb never expands: the DOCTYPE is skipped, undeclared
    // refs pass through verbatim (and this loc survives, visibly odd)
    val bomb = "<urlset><url><loc>https://a.example/&bomb;</loc></url></urlset>"
    assert(Sitemap.parseEntries(bomb) == Seq(("url", "https://a.example/&bomb;")))
  }

  test("loc outside url/sitemap context, unterminated loc, junk are ignored") {
    assert(Sitemap.parseEntries("<urlset><loc>https://stray.example/</loc></urlset>").isEmpty)
    assert(Sitemap.parseEntries("<urlset><url><loc>https://a.example/x").isEmpty)
    assert(Sitemap.parseEntries(null).isEmpty)
    assert(Sitemap.parseEntries("").isEmpty)
    assert(Sitemap.parseEntries("not xml at all & < > ;;").isEmpty)
  }

  test("caps: overlong loc dropped, control chars dropped, entry cap holds, input cap bounds work") {
    val longLoc = "https://a.example/" + "x" * Sitemap.MaxLocLen
    assert(Sitemap.parseEntries(s"<urlset><url><loc>$longLoc</loc></url></urlset>").isEmpty)
    assert(Sitemap.parseEntries(
      "<urlset><url><loc>https://a.example/a\tb</loc></url></urlset>").isEmpty)
    // entry cap: MaxEntries + 10 entries -> exactly MaxEntries kept.
    // (50k entries is also the parser's real-world per-file load — a
    // cheap throughput smoke on the bounded walk.)
    val many = new StringBuilder("<urlset>")
    for (i <- 0 until Sitemap.MaxEntries + 10)
      many.append(s"<url><loc>https://a.example/$i</loc></url>")
    many.append("</urlset>")
    assert(Sitemap.parseEntries(many.toString).length == Sitemap.MaxEntries)
    // input cap: a loc ENDING past MaxChars never completes; the walk
    // stops at the cap instead of scanning the tail
    val padded = "<urlset>" + " " * Sitemap.MaxChars +
      "<url><loc>https://a.example/past-cap</loc></url></urlset>"
    assert(Sitemap.parseEntries(padded).isEmpty)
  }

  test("expand: index -> child sitemaps -> pages, depth-capped, cycle-proof") {
    val s = spark
    import s.implicits._
    val fetched = Seq(
      ("https://h.example/index.xml",
        "<sitemapindex><sitemap><loc>https://h.example/a.xml</loc></sitemap>" +
          "<sitemap><loc>https://h.example/b.xml</loc></sitemap>" +
          // hostile cycle back to the index itself
          "<sitemap><loc>https://h.example/index.xml</loc></sitemap></sitemapindex>"),
      ("https://h.example/a.xml",
        "<urlset><url><loc>https://h.example/p1</loc></url>" +
          "<url><loc>https://h.example/p2</loc></url></urlset>"),
      ("https://h.example/b.xml",
        "<urlset><url><loc>https://h.example/p2</loc></url>" +
          "<url><loc>https://h.example/p3</loc></url></urlset>"),
      // only reachable at depth 2 — must NOT appear at the default cap
      ("https://h.example/c.xml",
        "<sitemapindex><sitemap><loc>https://h.example/d.xml</loc></sitemap></sitemapindex>"))
      .toDF("sitemap_url", "xml")
    val seeds = Seq("https://h.example/index.xml").toDF("sitemap_url")
    val got = Sitemap.expand(fetched, seeds, maxDepth = 2)
      .select("page_url", "via_sitemap", "depth")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(
      ("https://h.example/p1", "https://h.example/a.xml", 1),
      ("https://h.example/p2", "https://h.example/a.xml", 1),
      ("https://h.example/p2", "https://h.example/b.xml", 1),
      ("https://h.example/p3", "https://h.example/b.xml", 1)))
    // a urlset AT the seed emits pages at depth 0
    val direct = Sitemap.expand(fetched,
      Seq("https://h.example/a.xml").toDF("sitemap_url"), maxDepth = 2)
      .select("page_url", "depth").collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(direct == Set(("https://h.example/p1", 0), ("https://h.example/p2", 0)))
  }

  test("llm_sitemap_urls: distributed walk reproduces the closed form per row") {
    val rows = SparkEntry.queries("llm_sitemap_urls")(spark, TestSpark.sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet)
    for ((docId, es) <- byDoc) {
      val h = docs(docId) + ".example.com"
      val want = (docId % 3) match {
        case 0 => Seq(("sitemap", s"https://$h/maps/child-a-$docId.xml"),
          ("sitemap", s"http://$h/maps/child-b-$docId.xml"))
        case 1 => Seq(("url", s"https://$h/p/$docId?a=1&b=2"),
          ("url", s"https://$h/cdata/$docId?q=r&s=t"), ("url", "!"))
        case _ => Seq(("url", s"http://$h/Upper/$docId"),
          ("url", s"https://$h/~doc/$docId"))
      }
      val got = es.sortBy(_._3).map(e => (e._4, e._5)).toSeq
      assert(got == want, s"doc $docId entries diverged")
    }
  }
}
