package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Robots, Urls}
import graft.sources.Urls.{normalizeUrl, removeDotSegments}

class UrlsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("normalization: case, default ports, dot-segments, escapes, fragments") {
    assert(normalizeUrl("HTTP://ExAmPle.COM:80/Path/X").contains("http://example.com/Path/X"),
      "scheme+host lower-case, default port stripped, PATH case preserved")
    assert(normalizeUrl("https://a.com:443/x").contains("https://a.com/x"))
    assert(normalizeUrl("https://a.com:8443/x").contains("https://a.com:8443/x"),
      "non-default ports survive")
    assert(normalizeUrl("http://a.com:443/x").contains("http://a.com:443/x"),
      "443 is only default for https")
    assert(normalizeUrl("http://a.com/a/./b/../c").contains("http://a.com/a/c"))
    assert(normalizeUrl("http://a.com/../../x").contains("http://a.com/x"),
      "leading dot-dots cannot climb above root")
    assert(normalizeUrl("http://a.com").contains("http://a.com/"), "empty path becomes /")
    // escapes: unreserved decode, reserved preserved + upper-cased hex
    assert(normalizeUrl("http://a.com/%7Euser/%41%2fx%2F").contains("http://a.com/~user/A%2Fx%2F"),
      "%7E->~, %41->A, %2f stays %2F (decoding it would change path structure)")
    assert(normalizeUrl("http://a.com/100%off/%").contains("http://a.com/100%off/%"),
      "malformed escapes pass through verbatim")
    assert(normalizeUrl("http://a.com/x?b=2&a=1#frag").contains("http://a.com/x?b=2&a=1"),
      "fragment dropped, query ORDER preserved")
    assert(normalizeUrl("http://user:pw@A.com/x").contains("http://user:pw@a.com/x"),
      "userinfo preserved, host still lower-cases")
    // non-absolute / junk → None, never throws
    assert(normalizeUrl("not a url").isEmpty)
    assert(normalizeUrl("/relative/path").isEmpty)
    assert(normalizeUrl("mailto:x@y.com").isEmpty, "no authority — out of the crawl scope")
    assert(normalizeUrl("").isEmpty)
  }

  test("RFC 3986 §6.2.2 order: percent-decoding runs BEFORE dot-segment removal") {
    // %2E is an unreserved escape for '.', so %2E%2E is a dot-segment
    // alias — decode-then-collapse, or frontier dedup misses it
    assert(normalizeUrl("http://a.com/x/%2E%2E/secret").contains("http://a.com/secret"))
    assert(normalizeUrl("http://a.com/%2e/y").contains("http://a.com/y"))
    assert(normalizeUrl("http://a.com/a/%2E%2e/%2e%2E/b").contains("http://a.com/b"))
    // and the aliases canonicalize EQUAL to their literal forms
    assert(normalizeUrl("http://a.com/x/%2E%2E/s") == normalizeUrl("http://a.com/x/../s"))
  }

  test("remove_dot_segments matches RFC 3986 §5.2.4 and normalization is idempotent") {
    assert(removeDotSegments("/a/b/c/./../../g") == "/a/g") // RFC example
    assert(removeDotSegments("mid/content=5/../6") == "mid/6") // RFC example
    assert(removeDotSegments("/a/../../../b") == "/b")
    assert(removeDotSegments("/.") == "/")
    assert(removeDotSegments("/..") == "/")
    assert(removeDotSegments("") == "")
    // idempotence fuzz: normalize(normalize(u)) == normalize(u)
    val rnd = new scala.util.Random(29)
    val parts = Seq("a", ".", "..", "%7E", "%2f", "B", "")
    for (_ <- 0 until 500) {
      val u = "http://Ex.COM:80/" + Seq.fill(rnd.nextInt(6))(parts(rnd.nextInt(parts.length))).mkString("/")
      normalizeUrl(u).foreach { once =>
        assert(normalizeUrl(once).contains(once), s"not idempotent: $u -> $once")
      }
    }
  }

  test("llm_url_normalize: distributed canonical forms reproduce the closed-form case table") {
    val got = Urls.urlNormalize(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val want = graft.sources.Tables.documents(spark, TestSpark.sf)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("doc_id", "source", "n_chars").collect()
      .map { r =>
        val id = r.getLong(0); val src = r.getString(1); val n = r.getLong(2).toInt
        val (m, c) = (n % 4) match {
          case 0 => (s"HTTP://${src.toUpperCase}.Example.COM:80/Doc/$id",
            s"http://$src.example.com/Doc/$id")
          case 1 => (s"https://$src.example.com:443/a/./b/../doc/$id",
            s"https://$src.example.com/a/doc/$id")
          case 2 => (s"http://$src.example.com/%7Edoc/%2Fesc%2f/$id",
            s"http://$src.example.com/~doc/%2Fesc%2F/$id")
          case _ => (s"http://$src.example.com/doc/$id?q=1&r=2#section-$id",
            s"http://$src.example.com/doc/$id?q=1&r=2")
        }
        id -> ((m, c))
      }.toMap
    assert(got.keySet == want.keySet)
    assert(got == want, "canonical forms diverge from the closed-form case table")
  }

  test("resolve matches RFC 3986 §5.4.1 — the normal examples, verbatim") {
    val base = "http://a/b/c/d;p?q"
    val normal = Seq(
      "g:h"     -> "g:h",
      "g"       -> "http://a/b/c/g",
      "./g"     -> "http://a/b/c/g",
      "g/"      -> "http://a/b/c/g/",
      "/g"      -> "http://a/g",
      "//g"     -> "http://g",
      "?y"      -> "http://a/b/c/d;p?y",
      "g?y"     -> "http://a/b/c/g?y",
      "#s"      -> "http://a/b/c/d;p?q#s",
      "g#s"     -> "http://a/b/c/g#s",
      "g?y#s"   -> "http://a/b/c/g?y#s",
      ";x"      -> "http://a/b/c/;x",
      "g;x"     -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y#s",
      ""        -> "http://a/b/c/d;p?q",
      "."       -> "http://a/b/c/",
      "./"      -> "http://a/b/c/",
      ".."      -> "http://a/b/",
      "../"     -> "http://a/b/",
      "../g"    -> "http://a/b/g",
      "../.."   -> "http://a/",
      "../../"  -> "http://a/",
      "../../g" -> "http://a/g")
    for ((ref, want) <- normal)
      assert(Urls.resolve(base, ref).contains(want),
        s"resolve($base, '$ref') must be $want, got ${Urls.resolve(base, ref)}")
  }

  test("resolve matches RFC 3986 §5.4.2 — the abnormal examples, verbatim (strict parser)") {
    val base = "http://a/b/c/d;p?q"
    val abnormal = Seq(
      // more ..s than path segments: extras discard at the root
      "../../../g"    -> "http://a/g",
      "../../../../g" -> "http://a/g",
      // dot-segments NOT at a boundary the merge created
      "/./g"  -> "http://a/g",
      "/../g" -> "http://a/g",
      "g."    -> "http://a/b/c/g.",
      ".g"    -> "http://a/b/c/.g",
      "g.."   -> "http://a/b/c/g..",
      "..g"   -> "http://a/b/c/..g",
      // nonsensical-but-legal mixes
      "./../g"  -> "http://a/b/g",
      "./g/."   -> "http://a/b/c/g/",
      "g/./h"   -> "http://a/b/c/g/h",
      "g/../h"  -> "http://a/b/c/h",
      "g;x=1/./y"  -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      // dot-segments in query/fragment are DATA, not path structure
      "g?y/./x"  -> "http://a/b/c/g?y/./x",
      "g?y/../x" -> "http://a/b/c/g?y/../x",
      "g#s/./x"  -> "http://a/b/c/g#s/./x",
      "g#s/../x" -> "http://a/b/c/g#s/../x",
      // strict parser: a ref with its own scheme is taken whole, even
      // when the scheme matches the base (no backward-compat rewrite)
      "http:g" -> "http:g")
    for ((ref, want) <- abnormal)
      assert(Urls.resolve(base, ref).contains(want),
        s"resolve($base, '$ref') must be $want, got ${Urls.resolve(base, ref)}")
  }

  test("resolve edges: scheme-less base fails, authority-empty-path merge, null-free") {
    assert(Urls.resolve("not a url", "g").isEmpty,
      "a base with no scheme cannot anchor a relative ref")
    assert(Urls.resolve("not a url", "http://x/y").contains("http://x/y"),
      "a ref with its own scheme never needs the base")
    assert(Urls.resolve("http://h", "g").contains("http://h/g"),
      "§5.2.3: base with authority and empty path merges as '/' + ref")
    assert(Urls.resolve("http://h/a/b?x=1", "?y=2").contains("http://h/a/b?y=2"),
      "query-only ref keeps the base path, replaces the query")
    assert(Urls.resolve("http://h/a/", "sub/page").contains("http://h/a/sub/page"))
  }

  test("parseRef and resolve are LINEAR on hostile megabyte refs") {
    // single-pass delimiter walk: a megabyte of 'a's with no
    // structure, a megabyte of '/./' bombs, a megabyte of '?'s —
    // all must parse+resolve in linear time (same discipline as
    // removeDotSegments below)
    val base = "http://a/b/c/d"
    val bombs = Seq(
      "a" * 1000000,
      "/./" * 300000,
      "x" + "?" * 1000000,
      "../" * 300000 + "g")
    val t0 = System.nanoTime()
    for (b <- bombs) assert(Urls.resolve(base, b).isDefined)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 1500.0, s"hostile resolve took $ms ms — nonlinear parse")
  }

  test("remove_dot_segments is LINEAR on hostile megabyte paths (no substring churn)") {
    // frontier URLs are attacker-supplied; the textbook slicing
    // formulation is O(n²) on paths like /a/a/a/… — the same hostile
    // class as the bounded HTML entity scan. Pin ~linear growth.
    def timeMs(s: String): Double = {
      removeDotSegments(s) // warm
      val t0 = System.nanoTime()
      removeDotSegments(s); removeDotSegments(s); removeDotSegments(s)
      (System.nanoTime() - t0) / 3e6
    }
    val segBomb = "/a" * 500000           // 1 MB of 2-char segments
    assert(timeMs(segBomb) < 150.0, "segment bomb must stay linear")
    assert(removeDotSegments(segBomb) == segBomb)
    val dotBomb = "/." * 500000           // 1 MB of "/./" prefix steps
    assert(timeMs(dotBomb) < 150.0, "dot bomb must stay linear")
    assert(removeDotSegments(dotBomb) == "/", "all dot segments collapse to the bare slash")
    val upBomb = "/.." * 250000 + "/x"    // 1 MB of pops on an empty stack
    assert(timeMs(upBomb) < 150.0, "up-dir bomb must stay linear")
    assert(removeDotSegments(upBomb) == "/x")
    // 4x growth check on the worst shape. Both sides take the MIN of
    // 3 measurements: suites run in parallel on a throttling host, so
    // a single descheduled measurement can inflate either side ~50x
    // (observed: a one-shot ratio of 76x that re-measured at ~4x on a
    // settled host) — min-of-N is robust to that, while a genuinely
    // superlinear walk cannot get under the bound by scheduling luck.
    def bestMs(s: String): Double = (1 to 3).map(_ => timeMs(s)).min
    val ts4 = math.max(bestMs("/a" * 100000), 0.01)
    val tb4 = bestMs("/a" * 400000)
    assert(tb4 / ts4 < 10.0, s"4x input grew ${tb4 / ts4}x — superlinear dot-segment walk")
  }

  test("llm_url_frontier: canonicalize → per-host robots → seen-set collapse, end to end") {
    val rows = Urls.urlFrontier(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2), r.getLong(3), r.getLong(4))))
      .toMap
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2).toInt))
    assert(rows.size == docs.length,
      "each doc's two alias spellings must collapse to exactly one canonical row")
    for ((id, src, n) <- docs) {
      val host = s"$src.example.com"
      val (canon, allowed) = (n % 4) match {
        case 0 => (s"http://$host/data/pub/$id", true)   // longest-match Allow
        case 1 => (s"https://$host/data/raw/$id", false) // Disallow /data
        case 2 => (s"http://$host/tmp/run$id.log", false) // anchored wildcard
        // host-dependent: even-length sources also Disallow /doc —
        // a wrong robots join flips exactly these rows
        case _ => (s"http://$host/doc/~$id?q=1", src.length % 2 == 1)
      }
      assert(rows.contains(canon), s"canonical $canon missing from the frontier")
      assert(rows(canon) == ((host, allowed, 2L, id)),
        s"frontier row for $canon diverges: got ${rows(canon)}")
    }
  }

  test("frontierPolicy: the per-host variation changes only the /doc verdict") {
    val even = Robots.rulesFor(Robots.parse(Urls.frontierPolicy("src0")), "graftbot/1.0")
    val odd  = Robots.rulesFor(Robots.parse(Urls.frontierPolicy("src10")), "graftbot/1.0")
    assert(!Robots.isAllowed(even, "/doc/~7"), "even-length host disallows /doc")
    assert(Robots.isAllowed(odd, "/doc/~7"), "odd-length host allows /doc")
    for (rules <- Seq(even, odd)) {
      assert(Robots.isAllowed(rules, "/data/pub/1"))
      assert(!Robots.isAllowed(rules, "/data/raw/1"))
      assert(!Robots.isAllowed(rules, "/tmp/run1.log"))
      assert(Robots.isAllowed(rules, "/tmp/run1.txt"))
    }
  }

  test("hostCol cuts at the FIRST ://, not an absolute URL embedded in the query") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // the redirect/tracking-link shape the canonicalizer preserves:
      // the host is a.example, never the embedded b.example
      "http://a.example/r?u=http://b.example/x" -> "a.example",
      "https://h.example/p/1"                   -> "h.example",
      // authority kept verbatim (port/userinfo are part of the key
      // until the canonicalizer folds them)
      "https://user@h.example:8443/p"           -> "user@h.example:8443",
      // query-/fragment-only tails still terminate the authority
      "http://h.example?q=1"                    -> "h.example",
      "http://h.example#frag"                   -> "h.example",
      // the frontier's parse-failure sentinel passes through visible
      "!"                                       -> "!")
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), graft.sources.Urls.hostCol(col("u")).as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((u, want) <- cases)
      assert(got(u) == want, s"hostCol($u) = ${got(u)}, want $want")
  }
}
