package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL canonicalization (RFC 3986 syntax-based normalization, §6.2.2)
  * — the crawl-frontier dedup primitive: the same resource arrives
  * under `HTTP://ExAmPle.com:80/a/../b` and `http://example.com/b`,
  * and frontier dedup, seen-set membership and per-host politeness
  * all key on the canonical form. Implemented exactly to the
  * SYNTAX-BASED subset (safe for any scheme, never changes which
  * resource is identified):
  *
  *  - scheme and host lower-case;
  *  - default ports stripped (http:80, https:443);
  *  - percent-escapes of UNRESERVED characters decoded (`%7E` → `~`)
  *    — reserved escapes like `%2F` are NOT decoded (that would
  *    change the path structure) but their hex digits upper-case;
  *  - dot-segments removed per the RFC §5.2.4 algorithm;
  *  - empty path → `/` when an authority is present;
  *  - the fragment dropped (never sent to the server).
  *
  * Query parameters keep their ORDER — reordering is a semantic
  * transform some sites break on, so it stays out of the safe set.
  * Returns None for strings that do not parse as absolute
  * `scheme://authority…` URLs; malformed percent-escapes pass
  * through verbatim (normalizing garbage would corrupt it).
  */
object Urls {

  private val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)((?:/[^?#]*)?)(\\?[^#]*)?(#.*)?$".r

  private def unreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  /** Decode unreserved %XX escapes, upper-case the rest; malformed
    * escapes (%, %Z9, truncated) pass through untouched. */
  private[graft] def normalizeEscapes(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '%' && i + 2 < s.length) {
        val h = s.substring(i + 1, i + 3)
        if (h.forall(ch => Character.digit(ch, 16) >= 0)) {
          val v = Integer.parseInt(h, 16).toChar
          if (unreserved(v)) sb.append(v)
          else { sb.append('%').append(h.toUpperCase) }
          i += 3
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[graft] def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "/..") { in = "/"; if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "." || in == "..") in = ""
      else {
        val next = in.indexOf('/', 1)
        val seg = if (next < 0) in else in.substring(0, next)
        out += seg
        in = if (next < 0) "" else in.substring(next)
      }
    }
    out.mkString
  }

  /** Canonicalize an absolute URL; None if it is not one. */
  def normalizeUrl(url: String): Option[String] = url match {
    case UrlRe(scheme0, auth0, path0, query, _fragment) =>
      val scheme = scheme0.toLowerCase
      // authority = [userinfo@]host[:port]
      val (userinfo, hostPort) = auth0.lastIndexOf('@') match {
        case -1 => ("", auth0)
        case at => (auth0.substring(0, at + 1), auth0.substring(at + 1))
      }
      val (host0, port0) = hostPort.lastIndexOf(':') match {
        case -1 => (hostPort, "")
        case c if hostPort.drop(c + 1).forall(_.isDigit) =>
          (hostPort.substring(0, c), hostPort.substring(c + 1))
        case _ => (hostPort, "") // IPv6 literal or junk: leave intact
      }
      val host = host0.toLowerCase
      val defaultPort = (scheme == "http" && port0 == "80") ||
        (scheme == "https" && port0 == "443") || port0.isEmpty
      val port = if (defaultPort) "" else ":" + port0
      // RFC 3986 §6.2.2 order: percent-encoding normalization FIRST,
      // then dot-segment removal — so `/%2E%2E/x` decodes to `/../x`
      // and collapses; the reverse order leaves a literal `/../` in
      // the "canonical" form and frontier dedup misses the alias.
      val path1 = removeDotSegments(normalizeEscapes(Option(path0).getOrElse("")))
      val path = if (path1.isEmpty) "/" else path1
      val q = Option(query).map(normalizeEscapes).getOrElse("")
      Some(s"$scheme://$userinfo$host$port$path$q")
    case _ => None
  }

  /** The ORACLED registry leg (`llm_url_normalize`): per-row messy
    * URLs chosen by `n_chars % 4`, each exercising a different
    * normalization rule — case + default port, dot-segments,
    * unreserved-escape decode vs reserved-escape preservation, and
    * fragment drop — normalized DISTRIBUTED by the real
    * canonicalizer; DuckDB states the canonical form for each case
    * directly. */
  def urlNormalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("n_chars").cast("int").as("n_chars"))
      .as[(Long, String, Int)]
      .mapPartitions { it =>
        it.map { case (docId, source, nChars) =>
          val messy = (nChars % 4) match {
            case 0 => s"HTTP://${source.toUpperCase}.Example.COM:80/Doc/$docId"
            case 1 => s"https://$source.example.com:443/a/./b/../doc/$docId"
            case 2 => s"http://$source.example.com/%7Edoc/%2Fesc%2f/$docId"
            case _ => s"http://$source.example.com/doc/$docId?q=1&r=2#section-$docId"
          }
          normalizeUrl(messy) match {
            case Some(canon) => (docId, messy, canon)
            case None => (docId, messy, "!") // parse failure is visible
          }
        }
      }.toDF("doc_id", "url", "canonical_url")
  }
}
