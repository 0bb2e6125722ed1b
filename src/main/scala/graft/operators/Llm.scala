package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SketchAggs
import graft.sources.Tables

/** Large-scale training-data pipeline operators over the `documents`
  * and `embeddings` tables: deduplication (exact hash, MinHash-LSH,
  * SimHash), similarity search (exact cosine top-k + LSH-bucketed
  * ANN), and text analysis (token stats, language ID, quality
  * scoring). These go beyond the reference's surface (north-star
  * requirement); the sketch machinery is shared with the ecosystem
  * sketches (bloomfilter.py / minwisehashing.py ancestry).
  *
  * Scale posture, the common thread: nothing here is all-pairs.
  * Near-dup candidate generation is banded/bucketed (MinHash bands,
  * SimHash band keys, hyperplane buckets) so the quadratic step only
  * runs inside buckets; exact verification touches candidate pairs
  * only. Exact-twin queries exist where the approximate operator
  * is not deterministic enough for the hash-matching oracle.
  */
object Llm {

  // ---- shared text primitives -------------------------------------------

  /** Whitespace tokenization of normalized text (lower + trim). */
  private def tokenized(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))

  /** Distinct word-3-gram shingles per document — the unit of the
    * near-dup Jaccard. Documents shorter than one shingle are
    * excluded (both here and in the oracle). */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")))
        .as("shingle"))

  // ---- deduplication -----------------------------------------------------

  /** Exact dedup: group documents by md5 of whitespace-normalized
    * text; each group keeps its smallest doc_id. One scan, one
    * shuffle on the 128-bit hash — the canonical 100 TB exact-dedup
    * plan (hash first, never compare raw text). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))

  /** Near-dup detection via MinHash + LSH banding, exact-verified:
    *  1. 128 seeded hashes per shingle (xxhash64, F10), elementwise-
    *     min MinHash signature per doc (mergeable Aggregator);
    *  2. 32 bands × 4 rows: docs sharing any band-hash become
    *     candidate pairs (bucket join — never all-pairs; a jaccard-
    *     0.9 pair is missed with probability (1-0.9⁴)³² ≈ 3e-7);
    *  3. candidates are verified with the exact shingle Jaccard and
    *     kept at >= 0.8.
    * The oracle computes the same >= 0.8 pairs all-pairs in DuckDB —
    * feasible at sf0.01, which is exactly why the banded plan is the
    * one that ships: at 100 TB only step 3's candidate set is
    * quadratic, and it is tiny. */
  def dedupNear(spark: SparkSession, dir: String): DataFrame = {
    // Scale note: `sh` feeds both the signature build and the two
    // sides of the verify join (4 pruned scans of documents in this
    // plan). A production 100 TB run persists or checkpoints the
    // shingle table between stages (it is the pipeline's working
    // set); left unpersisted here because the gate executes each
    // query exactly once and a library function must not leak cached
    // partitions into the caller's session.
    val sh = shingled(spark, dir)
    // Kirsch-Mitzenmacher double hashing: two string hashes expand to
    // 128 independent-enough functions h1 + i*h2 — 64x fewer string
    // hash evaluations than 128 seeded xxhash64 calls per shingle.
    // raw full-range base hashes: the h1 + i*h2 expansion happens
    // inside the aggregator where mod-2^64 wraparound is natural
    // (masking h2 here would collapse the hash family — see
    // SketchAggs.MinHash2Agg)
    val hashed = sh
      .withColumn("h1", xxhash64(lit(1), col("shingle")))
      .withColumn("h2", xxhash64(lit(2), col("shingle")))
    val sigUdaf = udaf(new SketchAggs.MinHash2Agg(128), ExpressionEncoder[(Long, Long)]())
    // shingle-set size rides along with the signature, and then
    // through the band join — the candidate pairs carry (n_a, n_b)
    // so no separate size subquery rescans the corpus.
    val sigs = hashed.groupBy(col("doc_id"))
      .agg(sigUdaf(col("h1"), col("h2")).as("sig"), count(lit(1)).as("n"))
    val bands = sigs.select(col("doc_id"), col("n"), posexplode(expr(
      "transform(sequence(0, 31), b -> xxhash64(b, slice(sig, b*4 + 1, 4)))")))
      .toDF("doc_id", "n", "band", "band_hash")
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("x.n").as("n_a"),
              col("y.doc_id").as("doc_b"), col("y.n").as("n_b"))
      .distinct()
    // exact verify restricted to candidate pairs: expand each pair by
    // doc_a's shingles, then hash-join against doc_b's shingle set.
    val inter = cand
      .join(sh.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .withColumn("jac", col("n_common") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jac") >= 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard"))
  }

  /** Per-document 60-bit SimHash over word bigrams (with
    * multiplicity — on this corpus distinct-token SimHash is
    * degenerate because all docs share a tiny vocabulary). The
    * feature hash is md5-derived so the DuckDB oracle reproduces it
    * bit-for-bit; the signature is a single-pass mergeable
    * Aggregator. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val bigrams = tokenized(spark, dir)
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks)-2), i -> concat_ws(' ', toks[i], toks[i+1]))")).as("g"))
      .withColumn("hv", conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long"))
    val simUdaf = udaf(new SketchAggs.SimHashAgg(60), org.apache.spark.sql.Encoders.scalaLong)
    bigrams.groupBy(col("doc_id")).agg(simUdaf(col("hv")).as("simhash"))
  }

  /** SimHash near-dup pairs at Hamming distance <= 3 using the
    * classic 4-band × 15-bit scheme: by pigeonhole, any pair within
    * distance 3 agrees exactly on at least one band, so the band
    * equi-join (bucketed, shuffle on band key) finds every such pair
    * without an all-pairs pass; the Hamming filter then runs on
    * candidates only. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhash(spark, dir)
    val bands = sig.select(col("doc_id"), col("simhash"), posexplode(expr(
      "transform(sequence(0, 3), b -> (simhash >> (b*15)) & 32767)")))
      .toDF("doc_id", "simhash", "band", "band_key")
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  // ---- text analysis -----------------------------------------------------

  /** Corpus stats by language: doc counts, token counts (whitespace
    * tokenization), char counts. Plain partial-agg-friendly rollup. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(lower(trim(col("text"))), "\\s+")).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("sum_tokens"),
           round(avg(col("n_tokens")), 4).as("avg_tokens"),
           round(avg(length(col("text"))), 4).as("avg_chars"))

  /** Language ID by character-class heuristic (n-gram-free variant:
    * script detection + diacritic profiling), reported as a confusion
    * matrix against the labeled `lang`. On this corpus the text is
    * pure ASCII so every prediction is 'en' — the interesting output
    * is the structure, and the operator is deterministic and
    * oracle-checkable. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("pred_lang",
        when(col("text").rlike("[\\u4e00-\\u9fff]"), "zh")
          .when(col("text").rlike("[ñ¡¿áéíóúü]"), "es")
          .when(col("text").rlike("[àâçèêëîïôùûœ]"), "fr")
          .when(col("text").rlike("[äöüß]"), "de")
          .otherwise("en"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** Per-document quality score: unique-token ratio × length factor
    * (saturating at 100 tokens), plus the raw features. All integer
    * features are surfaced as BIGINT so both engines agree on
    * schema. */
  def quality(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_uniq"),
        (length(regexp_replace(col("text"), "\\s", "")) / size(col("toks"))).as("raw_tok_len"))
      .select(col("doc_id"), col("n_tokens"), col("n_uniq"),
        round(col("raw_tok_len"), 4).as("avg_token_len"),
        round(col("n_uniq") / col("n_tokens") * least(lit(1.0), col("n_tokens") / 100.0), 6).as("quality"))

  /** Token counting two ways per source: plain whitespace and a
    * BPE-style pre-tokenization regex (letter runs | digit runs |
    * single non-alnum) — the standard cheap estimator for LLM token
    * budgets. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_ws", size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("n_bpe", size(expr(
        "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)")).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_ws")).as("sum_ws_tokens"),
           sum(col("n_bpe")).as("sum_bpe_tokens"))

  // ---- similarity search -------------------------------------------------

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, cast(0.0 AS double), (a, x) -> a + x * x))"))

  /** Cosine of the (v, pv) pair: the codegen'd native expression
    * (plans/CosineSimilarity via GraftExtensions) when the session
    * has it — one fused primitive loop inside WholeStageCodegen — and
    * the interpreted higher-order-function formulation as a fallback
    * for sessions built without `spark.sql.extensions`. Both compose
    * the identical double arithmetic, so results hash-match either
    * way. */
  private def cosineSim(spark: SparkSession) =
    if (spark.catalog.functionExists("graft_cosine")) expr("graft_cosine(v, pv)")
    else expr("aggregate(zip_with(v, pv, (x, y) -> x * y), cast(0.0 AS double), (a, x) -> a + x)") /
      (col("nrm") * col("pn"))

  /** Exact cosine top-k (k=10) for each probe vector (vec_id < 10):
    * the brute-force baseline and the oracle-checked twin of the ANN
    * path. Probes are broadcast, the corpus is scanned once, ranking
    * is a partitioned window (TakeOrdered per probe, no global
    * sort) — exactly the plan a 100 TB brute-force rerank uses. */
  def knnExact(spark: SparkSession, dir: String): DataFrame = {
    val all = vecs(spark, dir)
    val probes = all.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id").asc)
    all.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim", round(cosineSim(spark), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("probe_id"), col("vec_id"), col("sim"), col("rn"))
  }

  /** ANN via signed-random-projection LSH: 16 hash tables × 6
    * hyperplanes whose ±1 weights derive from xxhash64 (deterministic,
    * no stored model). Candidates = vectors sharing any table bucket
    * with the probe; exact cosine reranks candidates only. Approx by
    * construction → rows-only in the driver gate; LlmSpec asserts
    * recall@10 against `knnExact`. At scale the bucket join replaces
    * the brute-force scan with a shuffle on (table, bucket).
    *
    * Parameter note: the synthetic embeddings are near-orthogonal
    * noise (top-10 cosine ≈ 0.3, no label clustering), the
    * adversarial case for LSH — 16×6 yields ≈0.5 recall at ≈0.2
    * candidate fraction here. On a real clustered corpus the same
    * machinery gives high recall with far fewer tables; table/plane
    * counts are the tuning knobs. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    // Hyperplane weights are row-independent: precompute the 16×6
    // ±1 plane vectors once (deterministic LCG) and broadcast them.
    // (A first cut derived weights per-row inside nested SQL lambdas
    // — 6k interpreted hash evals per row, 30s at sf0.1; the
    // broadcast table is the plan that scales.)
    val planes: Array[Array[Array[Double]]] = {
      var x = 20240801L
      def next(): Double = {
        x = x * 6364136223846793005L + 1442695040888963407L
        if (((x >>> 33) & 1L) == 1L) 1.0 else -1.0
      }
      Array.fill(16, 6, 64)(next())
    }
    val bc = spark.sparkContext.broadcast(planes)
    val bucketsUdf = udf((v: Seq[Double]) => {
      val ps = bc.value
      val out = new Array[Int](16)
      var t = 0
      while (t < 16) {
        var bits = 0
        var p = 0
        while (p < 6) {
          val w = ps(t)(p)
          var dot = 0.0
          var d = 0
          while (d < 64) { dot += v(d) * w(d); d += 1 }
          if (dot > 0) bits |= (1 << p)
          p += 1
        }
        out(t) = bits
        t += 1
      }
      out
    })
    val all = vecs(spark, dir).withColumn("buckets", bucketsUdf(col("v")))
    val tabled = all.select(col("vec_id"), col("v"), col("nrm"),
      posexplode(col("buckets"))).toDF("vec_id", "v", "nrm", "t", "bucket")
    val probes = tabled.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"),
        col("t"), col("bucket"))
    val cand = tabled.join(probes, Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), col("v"), col("nrm"), col("pv"), col("pn"))
      .dropDuplicates("probe_id", "vec_id")
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id").asc)
    cand
      .withColumn("sim", round(cosineSim(spark), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("probe_id"), col("vec_id"), col("sim"), col("rn"))
  }

  // ---- multimodal --------------------------------------------------------

  /** Multimodal column plumbing: documents' text re-materialized as
    * an opaque `binary` payload column with a typed metadata struct —
    * the schema shape an image/audio table has at 100 TB — and
    * metadata extraction over it (byte length, leading byte, SHA-256
    * content address, nested-struct field access). The decode /
    * feature-extraction path that needs real media codecs lives in
    * `Multimodal.decodeFeatures` (deterministic stub, see that
    * file); this query keeps the Spark-side schema + lineage real
    * and oracle-checked. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(col("lang").as("lang"), col("source").as("source")).as("meta"),
        ascii(col("text")).as("fb"))
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        col("fb").cast("long").as("first_byte"),
        sha2(col("payload"), 256).as("sha_hex"),
        col("meta.lang").as("meta_lang"))
}
