package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the missing step between a crawl
  * response body (`Warc.warcEntity` / `bodyToText`) and the
  * quality / dedup / chunking family, which all want prose, not
  * markup. This is BOUNDED single-pass parsing in the style of the
  * repo's other format walks (header arithmetic, never a DOM
  * library): one forward scan, O(1) state, no recursion, no
  * allocation proportional to nesting — hostile markup (a million
  * unclosed tags, `<script` with no end, `&#` bombs) degrades to
  * dropped spans, never to an exception or quadratic time.
  *
  * Extraction rules (deliberately simple and closed-form, so an
  * oracle can restate the output):
  *
  *  - `<script …>…</script>` and `<style …>…</style>` spans are
  *    dropped whole (case-insensitive; an unterminated opener drops
  *    to end-of-input — script bodies are code, never prose);
  *  - `<!-- … -->` comments dropped (unterminated → to end);
  *  - every other tag `<…>` is replaced by a single space (an
  *    unterminated `<` drops the tail — it cannot be text);
  *    CDATA sections emit their content;
  *  - character references decode: the HTML core names (amp, lt,
  *    gt, quot, apos, nbsp) and numeric `&#123;` / `&#x1F;` forms
  *    (invalid / out-of-range / unterminated references pass
  *    through verbatim — decoding garbage would corrupt it);
  *  - finally whitespace collapses to single spaces and the result
  *    is trimmed — the token boundary form the downstream text
  *    family (`tokenCount`, `chunkDocs`, `quality`) expects.
  */
object Html {

  private val Named = Map(
    "amp" -> '&', "lt" -> '<', "gt" -> '>',
    "quot" -> '"', "apos" -> '\'', "nbsp" -> ' ')

  /** Case-insensitive region match of `what` at `i` — bounded, no
    * substring allocation. */
  private def matchesAt(s: String, i: Int, what: String): Boolean = {
    if (i + what.length > s.length) return false
    var k = 0
    while (k < what.length) {
      if (Character.toLowerCase(s.charAt(i + k)) != what.charAt(k)) return false
      k += 1
    }
    true
  }

  /** True when the character at `i` (if any) cannot extend a tag
    * name — so `<script>` matches and `<scriptx>` does not. */
  private def nameBoundary(s: String, i: Int): Boolean =
    i >= s.length || !Character.isLetterOrDigit(s.charAt(i))

  /** Index just past the closing `>` of `</name …>` at/after `i`,
    * or -1. `name` must be lower-case. */
  private def closeTagEnd(s: String, i: Int, name: String): Int = {
    var k = i
    while (k < s.length) {
      if (s.charAt(k) == '<' && k + 1 < s.length && s.charAt(k + 1) == '/' &&
          matchesAt(s, k + 2, name) && nameBoundary(s, k + 2 + name.length)) {
        var g = k + 2 + name.length
        while (g < s.length && s.charAt(g) != '>') g += 1
        return if (g < s.length) g + 1 else -1
      }
      k += 1
    }
    -1
  }

  /** Extract the visible text of `html` per the rules above. Total
    * work is O(n); never throws. */
  def extractText(html: String): String = {
    if (html == null) return ""
    val n = html.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (matchesAt(html, i, "<!--")) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (matchesAt(html, i, "<![cdata[")) {
          val end = html.indexOf("]]>", i + 9)
          val stop = if (end < 0) n else end
          out.append(html, i + 9, stop)
          i = if (end < 0) n else end + 3
        } else if ((matchesAt(html, i, "<script") && nameBoundary(html, i + 7)) ||
                   (matchesAt(html, i, "<style") && nameBoundary(html, i + 6))) {
          val name = if (matchesAt(html, i, "<script")) "script" else "style"
          val end = closeTagEnd(html, i + 1, name)
          i = if (end < 0) n else end
          out.append(' ')
        } else {
          var g = i + 1
          while (g < n && html.charAt(g) != '>') g += 1
          i = if (g < n) g + 1 else n
          out.append(' ')
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val ref = if (semi < 0 || semi - i > 10) null else html.substring(i + 1, semi)
        val decoded: String =
          if (ref == null) null
          else if (ref.startsWith("#x") || ref.startsWith("#X")) {
            val hex = ref.substring(2)
            if (hex.nonEmpty && hex.forall(ch => Character.digit(ch, 16) >= 0)) {
              val cp = java.lang.Long.parseLong(hex, 16)
              if (cp > 0 && cp <= 0x10ffff) new String(Character.toChars(cp.toInt)) else null
            } else null
          } else if (ref.startsWith("#")) {
            val dec = ref.substring(1)
            if (dec.nonEmpty && dec.forall(_.isDigit) && dec.length <= 7) {
              val cp = dec.toLong
              if (cp > 0 && cp <= 0x10ffff) new String(Character.toChars(cp.toInt)) else null
            } else null
          } else Named.get(ref).map(_.toString).orNull
        if (decoded != null) { out.append(decoded); i = semi + 1 }
        else { out.append(c); i += 1 }
      } else {
        out.append(c)
        i += 1
      }
    }
    // whitespace collapse + trim — the token-boundary form
    val s = out.toString
    val sb = new java.lang.StringBuilder(s.length)
    var j = 0
    var pendingSpace = false
    while (j < s.length) {
      val ch = s.charAt(j)
      if (Character.isWhitespace(ch) || ch == ' ') pendingSpace = true
      else {
        if (pendingSpace && sb.length() > 0) sb.append(' ')
        pendingSpace = false
        sb.append(ch)
      }
      j += 1
    }
    sb.toString
  }

  /** The ORACLED registry leg (`llm_html_extract`): every document
    * is wrapped in a synthesized page exercising each extraction
    * rule — a dropped `<style>` block, a dropped comment, a dropped
    * `<script>` block (containing a `<` that must not re-open tag
    * parsing), named + numeric character references, and the
    * document text ENTITY-ESCAPED (so `&`/`<`/`>` in real prose
    * round-trip through escape → extract). The REAL extractor runs
    * distributed; DuckDB restates the closed-form result: `'Doc & '
    * || doc_id || ' ' || ws-collapsed(text)`. Map-only — at 100 TB
    * this is a pure scan between the WARC entity decode and the
    * quality family. */
  def htmlExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (docId, text) =>
          val escaped = text.replace("&", "&amp;")
            .replace("<", "&lt;").replace(">", "&gt;")
          val page =
            s"""<html lang="en"><head><title></title>
               |<style>p { color: red; }</style></head>
               |<body><!-- synthesized -->
               |<h1>Doc&#32;&amp;&#x20;$docId</h1>
               |<p>$escaped</p>
               |<script type="text/javascript">if (1 < 2) { emit("<fake>"); }</script>
               |</body></html>""".stripMargin
          (docId, extractText(page))
        }
      }.toDF("doc_id", "extracted_text")
  }
}
