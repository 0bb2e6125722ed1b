package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Llm

/** Whole-query drift pin for the no-extension path.
  *
  * Every native-kernel call site routes through `Llm.kernelOn`, which
  * honors the `spark.graft.kernels.enabled` escape hatch in addition
  * to extension presence — so flipping the conf in THIS session takes
  * exactly the branches a session without `GraftExtensions` would
  * take. Running each kernel-using declared query under both settings
  * and requiring identical results pins all twenty decision points
  * end-to-end: the per-expression bit-parity tests (LlmSpec /
  * PropertySpec) prove each kernel equals its pinned fallback
  * FORMULA; this proves each operator actually WIRES the equivalent
  * pair, so a no-extension deployment hash-matches the oracle too.
  *
  * `llm_ann_ivf` is the one exception to exact equality: within one
  * path Lloyd is reproducible (the training layout is width-pinned,
  * so partial sums merge in a fixed order — verified identical at
  * local[4] vs local[32]), but the kernel and fallback paths compute
  * the assignment distance with differently-associated float
  * arithmetic, so the two codebooks can differ in the last ulp and
  * flip a boundary assignment. Its pin is per-probe neighbor-set
  * overlap instead.
  */
class KernelParitySpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf

  /** Column-name-sorted, row-sorted, null/array/struct-normalized
    * textual form — the same canonicalization shape the driver's
    * oracle compare uses. */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*)
      .collect()
      .map(_.toSeq.map {
        case null                              => "∅"
        case a: Seq[_]                         => a.mkString("[", ",", "]")
        case m: scala.collection.Map[_, _]     =>
          m.map { case (k, v) => s"$k=$v" }.toSeq.sorted.mkString("{", ",", "}")
        case b: Array[Byte]                    => b.map("%02x".format(_)).mkString
        case x                                 => x.toString
      }.mkString(""))
      .sorted.toSeq
  }

  private def withKernels[A](on: Boolean)(body: => A): A = {
    spark.conf.set("spark.graft.kernels.enabled", on.toString)
    try body
    finally spark.conf.unset("spark.graft.kernels.enabled")
  }

  // Minimal declared-query set covering every kernelOn site:
  // nearDupCandidates + bandJoin (dedup_near), nearDupCore
  // (dedup_clusters), curate's stats + band path (curate),
  // simhashSigs (simhash_pairs), vocabTopK, charEntropy,
  // repetitionOn, contaminationOn, dedupEmbed's pair cosine,
  // fingerprintOn, cosineSim (knn_exact), annLsh's SRP buckets,
  // segmentDedupOn, unigramLogprobOn, invertedIndex's postings
  // digest, tfidfTermsOn, knnQuantized's dequantize-dot + rerank
  // cosine (both kernels keep the fallback's association order, so
  // the quantized path pins EXACT despite being float-heavy).
  private val covering = Seq(
    "llm_dedup_near", "llm_dedup_clusters", "llm_curate",
    "llm_simhash_pairs", "llm_vocab_topk", "llm_char_entropy",
    "llm_repetition", "llm_contamination", "llm_dedup_embed",
    "llm_fingerprint", "llm_knn_exact", "llm_ann_lsh",
    "llm_segment_dedup", "llm_unigram_logprob", "llm_inverted_index",
    "llm_tfidf_terms", "llm_knn_quantized", "llm_dedup_near_incr",
    // PQ family: codebooks + candidates are typed code (kernel-free
    // and layout-pinned), so only the ADC scan + re-rank cosine cross
    // the gate — exact parity holds, unlike IVF's float-boundary case
    // (llm_ann_probe additionally crosses the parquet snapshot)
    "llm_ann_pq", "llm_ann_ivfpq", "llm_ann_probe",
    // html extraction / frontier: kernels (graft_html_text,
    // graft_url_canon, graft_robots_allowed) vs ScalaUDFs over the
    // same Scala walks — bit-identical by construction, pinned
    // end-to-end anyway
    "llm_html_extract", "llm_crawl_extract", "llm_url_frontier",
    "llm_url_normalize", "llm_robots_filter", "llm_html_links",
    "llm_lang_id", "llm_frontier_schedule", "llm_sitemap_seeds",
    "llm_sitemap_urls", "llm_anchor_terms",
    // link-graph family: the edge build crosses the three discover
    // kernels; hostRank/linkBfs consume the same stream, and their
    // long arithmetic is kernel-free — the edge leg covers the gate
    "llm_link_graph", "llm_host_rank", "llm_host_rank_warm",
    "llm_mix_ranked", "llm_link_bfs",
    // the cross-era leg's snapshot cache keys on the kernel gate, so
    // BOTH eras rebuild through the fallback path under the flip —
    // the parity pin covers the whole corpus, not just the delta
    "llm_link_incr",
    // BPE family: graft_bpe_tokens vs the ScalaUDF over the same
    // encodeSeed — bit-identical by construction, pinned end-to-end
    "llm_bpe_tokenize", "llm_chunk_bpe",
    // winnowing family: graft_winnow vs the gram-explode + two-window
    // SQL formulation (LlmSpec pins the selected sets; these pin the
    // three registry queries end-to-end)
    "llm_winnow", "llm_dup_spans", "llm_dup_coverage", "llm_dup_sources")

  for (q <- covering)
    test(s"$q is identical with kernels disabled") {
      val on  = withKernels(on = true)  { canon(SparkEntry.queries(q)(spark, dir)) }
      val off = withKernels(on = false) { canon(SparkEntry.queries(q)(spark, dir)) }
      assert(on.nonEmpty, s"$q returned no rows — parity would be vacuous")
      assert(off == on, s"$q diverges between kernel and fallback paths")
    }

  test("llm_ann_ivf neighbor sets overlap with kernels disabled") {
    def neighbors(): Map[Long, Set[Long]] =
      Llm.annIvf(spark, dir)
        .select(col("probe_id"), col("vec_id"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }
    val on  = withKernels(on = true)(neighbors())
    val off = withKernels(on = false)(neighbors())
    assert(on.keySet == off.keySet)
    val overlaps = on.keySet.toSeq.map { p =>
      val (a, b) = (on(p), off(p))
      a.intersect(b).size.toDouble / a.union(b).size.max(1)
    }
    val mean = overlaps.sum / overlaps.size
    assert(mean >= 0.9,
      s"mean per-probe neighbor overlap $mean < 0.9 between kernel and fallback paths")
  }

  // Expression-level bit parity for the ADC kernel (the whole-query
  // rows above cover the wiring; this pins the FORMULA on adversarial
  // inputs — byte values up to ks−1 including the sign-bit range a
  // packed byte misreads without the & 0xFF, and ptab entries of
  // mixed magnitude where fold order shows up in the last ulp).
  test("graft_adc equals the HOF table-lookup fold bit-for-bit") {
    val sp = spark
    import sp.implicits._
    for ((m, ks) <- Seq((16, 16), (8, 256))) withClue(s"m=$m ks=$ks: ") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 64).map { i =>
      val ptab = Array.fill(m * ks)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(6) - 3))
      val code = Array.fill(m)(rnd.nextInt(ks).toByte)
      (i, ptab.toSeq, code)
    }
    val df = rows.toDF("id", "ptab", "code")
    val kernel = df.selectExpr("id", s"graft_adc(ptab, code, $ks) as s")
    val fold = df.selectExpr("id",
      s"""aggregate(sequence(0, ${m - 1}), cast(0.0 as double),
          (a, j) -> a + element_at(ptab,
            j * $ks + cast(conv(hex(substring(code, j + 1, 1)), 16, 10) as int) + 1)) as s""")
    val k = kernel.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val f = fold.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(k.keySet == f.keySet)
    for ((id, kv) <- k)
      assert(java.lang.Double.doubleToLongBits(kv) == java.lang.Double.doubleToLongBits(f(id)),
        s"row $id: kernel $kv != fold ${f(id)} (bit-level)")
    }
  }

  // embedNearDup is not a declared query (the synthetic embeddings
  // are near-orthogonal noise with no pairs at its default 0.9
  // threshold); cover its SRP-bucket + verify-cosine sites at a low
  // threshold where real pairs exist.
  test("embed near-dup pairs are identical with kernels disabled") {
    val on  = withKernels(on = true)  { canon(Llm.embedNearDup(spark, dir, 0.25)) }
    val off = withKernels(on = false) { canon(Llm.embedNearDup(spark, dir, 0.25)) }
    assert(on.nonEmpty, "no pairs at threshold 0.25 — lower it so the pin bites")
    assert(off == on, "embedNearDup diverges between kernel and fallback paths")
  }

  // The OTHER session escape hatch: deserialized checkpoint blocks
  // (spark.graft.ckpt.deserialized=true) must be storage-level-only —
  // identical results through the checkpoint-heaviest declared
  // queries (curate crosses Ckpt.par2 + multiple ckptLocal barriers;
  // dedup_near crosses the working-set checkpoint).
  test("deserialized-checkpoint escape hatch changes storage, not results") {
    def withDeserCkpt[A](body: => A): A = {
      spark.conf.set("spark.graft.ckpt.deserialized", "true")
      try body
      finally spark.conf.unset("spark.graft.ckpt.deserialized")
    }
    for (q <- Seq("llm_curate", "llm_dedup_near")) {
      val ser   = canon(SparkEntry.queries(q)(spark, dir))
      val deser = withDeserCkpt { canon(SparkEntry.queries(q)(spark, dir)) }
      assert(ser.nonEmpty, s"$q returned no rows — parity would be vacuous")
      assert(deser == ser, s"$q diverges under deserialized checkpoint blocks")
    }
  }
}
