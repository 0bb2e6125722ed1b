package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Language identification by character-n-gram rank profiles — the
  * Cavnar–Trenkle method ("N-Gram-Based Text Categorization", SDAIR
  * 1994), the public-domain standard a corpus pipeline actually runs
  * (langid.py / CLD's ancestors): build a per-language PROFILE (the
  * top-K character 1..5-grams by frequency, rank-ordered) from seed
  * text once, then score a document by the rank-displacement ("out of
  * place") distance between its own profile and each language's, and
  * predict the nearest. Everything is deterministic — fixed seed
  * corpus, total-order tie-breaks — so the registry leg's verdicts
  * are closed-form and oracle-checkable.
  *
  * Scale shape: scoring is a pure per-row function of the text (the
  * profiles are a ~`Langs × K` static table derived from embedded
  * seeds at class load on every executor — no broadcast, no join, the
  * SrpBuckets plane-weights pattern), so language-ID of a 100 TB
  * corpus is one map-only codegen'd scan via the `graft_lang_id`
  * kernel. Per-row cost is HARD-BOUNDED: only the first `MaxChars`
  * characters are read (CT saturates in a few hundred grams), so a
  * hostile gigabyte document costs the same as a page.
  *
  * Profile building from a DataFrame (`trainProfiles`) is the
  * mergeable-aggregate form — explode grams, partial-agg counts,
  * rank — for training on real corpora; LangIdSpec pins it equal to
  * the in-memory builder on the same input.
  */
object LangId {

  /** Profile depth K: the paper's classic operating point (300 grams
    * suffices for language ID; more helps only finer tasks). */
  val ProfileK = 300

  /** Classification reads at most this many chars of a document —
    * the hard per-row cost bound for hostile input. */
  val MaxChars = 4096

  /** The gram alphabet keeps LETTERS only (Unicode, so CJK counts);
    * everything else — digits, punctuation, whitespace — is a word
    * boundary, per the paper's tokenization. */
  private def normalize(text: String, maxChars: Int): String = {
    val n = math.min(text.length, maxChars)
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        if (pendingSpace && sb.length() > 0) sb.append(' ')
        pendingSpace = false
        sb.append(Character.toLowerCase(c))
      } else pendingSpace = true
      i += 1
    }
    sb.toString
  }

  /** All character 1..5-grams of `text` (normalized, words padded
    * with `_` on both sides, grams never span words — the paper's
    * construction). Bounded: at most 5 grams start per character. */
  private[graft] def grams(text: String, maxChars: Int = MaxChars): Seq[String] = {
    val out = Vector.newBuilder[String]
    for (word <- normalize(text, maxChars).split(' ') if word.nonEmpty) {
      val padded = "_" + word + "_"
      val m = padded.length
      var i = 0
      while (i < m) {
        var n = 1
        while (n <= 5 && i + n <= m) {
          out += padded.substring(i, i + n)
          n += 1
        }
        i += 1
      }
    }
    out.result()
  }

  /** Rank-ordered top-K profile of a gram multiset: most frequent
    * first, ties broken by gram code-point order — a TOTAL order, so
    * the profile is a pure function of the counts. */
  private[graft] def profileOf(counts: Map[String, Long], k: Int = ProfileK): Array[String] =
    counts.toArray.sortBy { case (g, c) => (-c, g) }.take(k).map(_._1)

  /** In-memory profile builder (seed corpora are tiny). */
  private[graft] def buildProfile(texts: Seq[String], k: Int = ProfileK): Array[String] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    for (t <- texts; g <- grams(t, Int.MaxValue))
      counts.update(g, counts.getOrElse(g, 0L) + 1L)
    profileOf(counts.toMap, k)
  }

  /** The MERGEABLE-AGGREGATE profile builder — how profiles train on
    * a real corpus: explode grams (map-side), count per (lang, gram)
    * (partial agg before the one shuffle), rank with a per-lang
    * window over (count desc, gram) and keep K. Deterministic: the
    * same total order as `buildProfile` (LangIdSpec pins equality).
    * Input frame needs (lang, text). */
  def trainProfiles(docs: DataFrame, k: Int = ProfileK): Map[String, Array[String]] = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val gramUdf = udf((s: String) => grams(s, Int.MaxValue))
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("gram"))
    docs
      .filter(col("text").isNotNull)
      .select(col("lang"), explode(gramUdf(col("text"))).as("gram"))
      .groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("gram"))
      .as[(String, Int, String)]
      .collect()
      .groupBy(_._1)
      .map { case (lang, rows) => lang -> rows.sortBy(_._2).map(_._3) }
  }

  /** Embedded seed corpus — a few ORIGINAL sentences per language,
    * written for this module (never copied), carrying each language's
    * high-frequency function words / characters, which is what the
    * top of a CT profile is made of. Held-out evaluation text lives
    * in `heldOut` below and shares no sentences with these. */
  private[graft] val seeds: Map[String, Seq[String]] = Map(
    "en" -> Seq(
      "The small table stands near the window and the light of the " +
        "morning falls on it while the house is still quiet.",
      "She said that the road to the village was long but that we " +
        "would reach it before the evening came with its cold wind.",
      "There is a book on the shelf which nobody has read for years " +
        "and yet it holds the answer to the question we keep asking.",
      "When the rain stops the children run out of the houses and " +
        "the street fills with their voices until the night arrives."),
    "es" -> Seq(
      "La mesa pequeña está cerca de la ventana y la luz de la " +
        "mañana cae sobre ella mientras la casa sigue en silencio.",
      "Ella dijo que el camino hacia el pueblo era largo pero que " +
        "llegaríamos antes de que viniera la noche con su viento frío.",
      "Hay un libro en el estante que nadie ha leído durante años y " +
        "sin embargo guarda la respuesta a la pregunta que hacemos.",
      "Cuando deja de llover los niños salen de las casas y la " +
        "calle se llena de sus voces hasta que llega la noche."),
    "fr" -> Seq(
      "La petite table se trouve près de la fenêtre et la lumière " +
        "du matin tombe sur elle pendant que la maison reste calme.",
      "Elle a dit que la route vers le village était longue mais que " +
        "nous arriverions avant que le soir ne vienne avec son vent froid.",
      "Il y a un livre sur l'étagère que personne n'a lu depuis des " +
        "années et pourtant il garde la réponse à la question posée.",
      "Quand la pluie cesse les enfants sortent des maisons et la " +
        "rue se remplit de leurs voix jusqu'à ce que la nuit arrive."),
    "de" -> Seq(
      "Der kleine Tisch steht nahe dem Fenster und das Licht des " +
        "Morgens fällt auf ihn während das Haus noch ruhig ist.",
      "Sie sagte dass der Weg zum Dorf lang war aber dass wir ihn " +
        "vor dem Abend erreichen würden bevor der kalte Wind kam.",
      "Es gibt ein Buch im Regal das seit Jahren niemand gelesen hat " +
        "und doch hält es die Antwort auf die Frage die wir stellen.",
      "Wenn der Regen aufhört laufen die Kinder aus den Häusern und " +
        "die Straße füllt sich mit ihren Stimmen bis die Nacht kommt."),
    "zh" -> Seq(
      "小桌子放在窗户的旁边，早晨的光照在它的上面，房子里还是很安静的。",
      "她说去村子的路很长，但是我们会在晚上到来之前到达那里，冷风也会来。",
      "书架上有一本书，很多年没有人读过它，可是它里面有我们一直在问的问题的答案。",
      "雨停了的时候，孩子们从房子里跑出来，街上都是他们的声音，一直到晚上。"))

  /** Held-out snippets — three per language, disjoint from `seeds` —
    * the evaluation set the registry leg classifies distributed and
    * LangIdSpec pins at 15/15 (which is what makes the leg's
    * closed-form oracle sound). */
  private[graft] val heldOut: Map[String, Seq[String]] = Map(
    "en" -> Seq(
      "In the garden behind the old wall the trees keep their leaves " +
        "longer than anywhere else and the birds return to them first.",
      "He walked along the river every day because the water showed " +
        "him that everything moves on even when the days feel the same.",
      "The letter arrived in the afternoon and she read it twice " +
        "before putting it back into the drawer without a single word."),
    "es" -> Seq(
      "En el jardín detrás del muro viejo los árboles guardan sus " +
        "hojas más tiempo que en otros lugares y los pájaros vuelven.",
      "Él caminaba junto al río todos los días porque el agua le " +
        "mostraba que todo sigue su curso aunque los días parezcan iguales.",
      "La carta llegó por la tarde y ella la leyó dos veces antes de " +
        "volver a guardarla en el cajón sin decir una sola palabra."),
    "fr" -> Seq(
      "Dans le jardin derrière le vieux mur les arbres gardent leurs " +
        "feuilles plus longtemps qu'ailleurs et les oiseaux y reviennent.",
      "Il marchait le long de la rivière chaque jour parce que l'eau " +
        "lui montrait que tout continue même quand les jours se ressemblent.",
      "La lettre est arrivée dans l'après-midi et elle l'a lue deux " +
        "fois avant de la ranger dans le tiroir sans dire un seul mot."),
    "de" -> Seq(
      "Im Garten hinter der alten Mauer behalten die Bäume ihre " +
        "Blätter länger als anderswo und die Vögel kehren zuerst zurück.",
      "Er ging jeden Tag am Fluss entlang weil ihm das Wasser zeigte " +
        "dass alles weitergeht auch wenn die Tage sich gleichen.",
      "Der Brief kam am Nachmittag an und sie las ihn zweimal bevor " +
        "sie ihn ohne ein einziges Wort zurück in die Schublade legte."),
    "zh" -> Seq(
      "老墙后面的花园里，树上的叶子比别的地方留得更久，鸟也先回到这里来。",
      "他每天都在河边走，因为水让他知道，就算日子看起来一样，一切还是在往前走的。",
      "信是下午到的，她把它读了两遍，然后一句话也没有说，就把它放回了抽屉里。"))

  /** The static language profiles — derived from `seeds` at class
    * load, identically on every executor (the SrpBuckets pattern:
    * deterministic derivation beats shipping a model). Sorted lang
    * order makes the argmin tie-break total. */
  private[graft] lazy val profiles: Array[(String, Map[String, Int])] =
    seeds.toArray.sortBy(_._1).map { case (lang, texts) =>
      lang -> buildProfile(texts).zipWithIndex.toMap
    }

  /** Classify `text`: rank-displacement distance to each profile,
    * smallest wins; ties break toward the lexicographically first
    * language code; null/letterless text → "und" (undetermined).
    *
    * This is the per-row hot path of a 100 TB scan, so the gram walk
    * is inlined (no intermediate gram Vector, no boxed-count map
    * copy) — but it computes EXACTLY the `grams` + `profileOf`
    * composition: same grams, same (count desc, gram asc) total
    * order (LangIdSpec pins equality against the reference
    * composition on random text). */
  def classify(text: String): String = {
    if (text == null) return "und"
    val norm = normalize(text, MaxChars)
    val counts = new java.util.HashMap[String, Array[Int]](512)
    val len = norm.length
    var ws = 0
    while (ws < len) {
      while (ws < len && norm.charAt(ws) == ' ') ws += 1
      if (ws < len) {
        var we = ws
        while (we < len && norm.charAt(we) != ' ') we += 1
        val padded = new java.lang.StringBuilder(we - ws + 2)
          .append('_').append(norm, ws, we).append('_').toString
        val m = padded.length
        var i = 0
        while (i < m) {
          var n = 1
          while (n <= 5 && i + n <= m) {
            val g = padded.substring(i, i + n)
            val c = counts.get(g)
            if (c == null) counts.put(g, Array(1)) else c(0) += 1
            n += 1
          }
          i += 1
        }
        ws = we
      }
    }
    if (counts.isEmpty) return "und"
    val entries = counts.entrySet().toArray(
      new Array[java.util.Map.Entry[String, Array[Int]]](counts.size))
    java.util.Arrays.sort(entries,
      new java.util.Comparator[java.util.Map.Entry[String, Array[Int]]] {
        def compare(a: java.util.Map.Entry[String, Array[Int]],
            b: java.util.Map.Entry[String, Array[Int]]): Int = {
          val d = Integer.compare(b.getValue()(0), a.getValue()(0))
          if (d != 0) d else a.getKey.compareTo(b.getKey)
        }
      })
    val k = math.min(ProfileK, entries.length)
    var bestLang = "und"
    var bestDist = Long.MaxValue
    for ((lang, prof) <- profiles) {
      var dist = 0L
      var r = 0
      while (r < k) {
        dist += math.abs(prof.getOrElse(entries(r).getKey, ProfileK) - r).toLong
        r += 1
      }
      if (dist < bestDist) { bestDist = dist; bestLang = lang }
    }
    bestLang
  }

  /** The COLUMN-level classification API — per-document language as
    * a plain column. Kernel path: the codegen'd `graft_lang_id`
    * (plans/LangIdExpr) — a static call inside WholeStageCodegen;
    * fallback: a ScalaUDF over the SAME `classify`, bit-identical
    * across the gate (KernelParitySpec). */
  def langCol(spark: SparkSession, text: Column): Column =
    if (Llm.kernelOn(spark, "graft_lang_id"))
      call_function("graft_lang_id", text)
    else udf((s: String) => if (s == null) null else classify(s)).apply(text)
}
