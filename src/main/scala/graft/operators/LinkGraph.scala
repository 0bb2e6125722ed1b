package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Ckpt.CkptOps
import graft.sources.{Html, Tables, Urls}

/** Link-graph analytics over the crawl loop's output — what a corpus
  * pipeline runs once fetch → extract → discover → frontier is closed
  * (round 18): the host-level WEB GRAPH, and the two algorithms every
  * production crawl derives from it — PageRank-style host authority
  * (crawl prioritization / quality weighting for training-data
  * curation, the Common-Crawl host-ranking job) and bounded-hop BFS
  * reachability from a seed set (crawl-horizon estimation).
  *
  * The reference has no link graph (its graph is the 4-node habitat
  * proximity graph, random_walk_utils.py:7-31 — covered by G1–G3);
  * this extends the S9+ crawl family the same way the frontier legs
  * do. The deliberate design choices:
  *
  *  - **Edges come from PAGE MARKUP through the production chain** —
  *    `graft_html_links` (extract) → `graft_url_resolve` (RFC 3986 §5
  *    against the page's own URL) → `graft_url_canon` → host — not
  *    from a synthesized edge list, so the whole discover path is
  *    under the oracle on every run.
  *  - **PageRank runs in FIXED-POINT long arithmetic** (1e12 scale,
  *    d = 0.85 as the 85/100 ratio, truncating division). Float
  *    PageRank sums are partition-order-dependent — the exact reason
  *    the money aggregates moved to split-long (SURVEY §8) — and an
  *    oracle hash over doubles would be layout-luck. Long adds are
  *    associative: bit-identical on any cluster layout, and DuckDB
  *    restates every iteration exactly (`//` floor-division equals
  *    Spark's `div` on the non-negative domain here).
  *  - **Scale shape**: the edge set materializes ONCE (serialized
  *    localCheckpoint — at 100 TB a reliable checkpoint at the same
  *    cut); each PageRank iteration is one join of the rank vector
  *    (one row per host) against the pre-materialized edges plus one
  *    groupBy(dst) partial-agg sum — the rank vector, never the edge
  *    table, is what re-shuffles per iteration. BFS likewise joins a
  *    shrinking frontier against the same materialized edges with an
  *    anti-join on the visited set per hop. Host cardinality
  *    (~hundreds of millions at web scale) dwarfs executor counts, so
  *    every stage parallelizes; nothing collects to the driver but
  *    the node COUNT (one scalar) and the loop trip counts are fixed
  *    constants, not data-dependent driver loops.
  */
object LinkGraph {

  /** Host-id modulus for the synthesized graph: doc_id % 101 is the
    * page's host, the three outlink targets are affine maps of doc_id
    * mod the same prime — every doc on a host therefore links to the
    * SAME three targets (a fixed 101-node, ≤3-out-degree functional
    * graph whose edge set SATURATES at ~297 regardless of corpus
    * size: the sf10c8 rung measures the linear markup-scan term over
    * a stable graph), and the closed form restates in one SQL
    * expression. Multiplicities still grow with the corpus — that is
    * the aggregated signal. */
  private val Hosts = 101

  /** PageRank fixed-point scale (1e12), damping 85/100, iterations. */
  private[graft] val Scale = 1000000000000L
  private[graft] val Iters = 5

  /** BFS hop bound and the seed rule (host id % 10 == 0). */
  private[graft] val MaxHops = 4

  /** One crawl page per document: the page lives at
    * `http://h{doc_id%101}.example/p/{doc_id}` and links out through
    * every attribute form the extractor supports — a double-quoted
    * absolute anchor, a single-quoted absolute anchor, an UNQUOTED
    * protocol-relative href (exercises §5.2.2's network-path branch
    * of `resolve`), an `<img src>` asset reference (repeats the first
    * target: multiplicity is data, not noise), and a RELATIVE anchor
    * whose resolution lands back on the page's own host (exercises
    * the §5.2.3 merge; dropped later by the self-loop rule). A
    * comment decoy must contribute nothing. */
  private def pageCol = {
    val id = col("doc_id").cast("string")
    val src = pmod(col("doc_id"), lit(Hosts)).cast("string")
    val d1 = pmod(col("doc_id") * 2 + 1, lit(Hosts)).cast("string")
    val d2 = pmod(col("doc_id") * 3 + 7, lit(Hosts)).cast("string")
    val d3 = pmod(col("doc_id") * 7 + 13, lit(Hosts)).cast("string")
    val page = concat(
      lit("<html><body><!-- <a href=\"http://decoy.example/never\"> -->\n<a href=\"http://h"),
      d1, lit(".example/a/"), id,
      lit("\">x</a>\n<a href='http://h"), d2, lit(".example/b/"), id,
      lit("'>y</a>\n<a href=//h"), d3, lit(".example/c/"), id,
      lit(">z</a>\n<img src=\"http://h"), d1, lit(".example/i/"), id,
      lit(".png\">\n<a href=\"../p/"), id, lit("\">self</a></body></html>"))
    val pageUrl = concat(lit("http://h"), src, lit(".example/p/"), id)
    (page, pageUrl)
  }

  /** Frame-level edge extraction — (page_url, page) rows in, one row
    * per extracted link that resolves off the page's own host out
    * (passthrough columns kept, `page`/`ref` dropped, `link_url` +
    * `src_host`/`dst_host` added). Map-only and entirely columnar:
    * `graft_html_links`, `graft_url_resolve` against the page URL,
    * `graft_url_canon`, host keying — one WholeStageCodegen scan,
    * zero object boundaries, no state and no shuffle, so the SAME
    * core is the batch legs' scan and `Streaming.outlinkStream`'s
    * per-micro-batch lift (the chunkStream pattern). */
  private[graft] def edgesOf(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    pages
      // src keys off the CANONICAL fetch URL — a page fetched under a
      // non-canonical spelling ("HTTP://B.Example:80/p") must land on
      // the same graph node as links pointing at it, or one real host
      // splits in two and the self-loop drop misfires; a fetch URL
      // that doesn't parse can't key edges at all (resolve against it
      // yields nothing either), so those rows drop visibly here
      .withColumn("src_host",
        Urls.hostCol(Urls.canonCol(spark, col("page_url"))))
      .filter(col("src_host").isNotNull)
      .select(col("*"), explode(Html.linksCol(spark, col("page"))).as("ref"))
      .withColumn("link_url",
        Urls.canonCol(spark,
          Urls.resolveCol(spark, col("page_url"), col("ref"))))
      .filter(col("link_url").isNotNull)
      .withColumn("dst_host", Urls.hostCol(col("link_url")))
      .filter(col("dst_host") =!= col("src_host"))
      .drop("page", "ref")
  }

  /** The synthesized crawl-page frame (doc_id, page_url, page).
    * Widened BEFORE the page markup is synthesized (r21, guide
    * §2.6/§2.3): the documents table arrives as one parquet split, so
    * the whole extract→resolve→canon kernel chain above this frame
    * ran as ONE task; the round-robin exchange moves only the 8-byte
    * doc_id column (the markup is derived from it AFTER the widen)
    * and is the identity at real scale, where the scan is already
    * wider than the session. Every consumer aggregates (groupBy /
    * distinct) right above, so results are layout-independent. */
  private def pagesOf(spark: SparkSession, dir: String): DataFrame = {
    val (page, pageUrl) = pageCol
    Tables.widened(
        Tables.documents(spark, dir)
          .filter(col("text").isNotNull)
          .select(col("doc_id")))
      .select(col("doc_id"), pageUrl.as("page_url"), page.as("page"))
  }

  /** The raw cross-host link stream over the synthesized crawl pages
    * — one row per off-host link, with multiplicity (the `<img>`
    * repeat of target 1 survives; the relative self-link does not). */
  private[graft] def linkStream(spark: SparkSession, dir: String): DataFrame =
    edgesOf(pagesOf(spark, dir)).select(col("src_host"), col("dst_host"))

  /** The per-generation batch job: aggregate a fetched-page frame to
    * host-edge counts — the persistable LINK INDEX (one parquet table,
    * the near-dup band index's sibling). One exchange, the edge key. */
  def buildLinkIndex(pages: DataFrame): DataFrame =
    edgesOf(pages)
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))

  /** Merge a previous generation's persisted link index with a new
    * crawl's delta: full-outer on the edge key, counts add. Per-crawl
    * cost is index+delta sized, never a re-extract of old pages; at
    * 100 TB the index persists BUCKETED on the edge key (the
    * `sink_bucketed` layout), making the merge exchange-free on the
    * index side — the delta is the only moving data. */
  def mergeLinkIndex(prev: DataFrame, delta: DataFrame): DataFrame =
    prev.select(col("src_host"), col("dst_host"), col("n_links").as("n_prev"))
      .join(delta.select(col("src_host"), col("dst_host"),
        col("n_links").as("n_new")), Seq("src_host", "dst_host"), "full_outer")
      .na.fill(0L, Seq("n_prev", "n_new"))
      .withColumn("n_links", col("n_prev") + col("n_new"))

  /** The ORACLED edge-build leg (`llm_link_graph`): the host-level
    * link graph with multiplicities — `(src_host, dst_host, n_links)`
    * — aggregated from the raw link stream. ONE exchange (the edge
    * groupBy, the operator's own output key); everything below it is
    * a map-only codegen scan. DuckDB restates the closed-form targets
    * per document and re-aggregates. */
  def linkGraph(spark: SparkSession, dir: String): DataFrame =
    buildLinkIndex(pagesOf(spark, dir))

  /** The ORACLED cross-era leg (`llm_link_incr`) — the link graph at
    * crawl cadence, the graph-family sibling of
    * `llm_dedup_incremental` / `llm_dedup_near_incr` /
    * `appendAnnIndex`: the PREVIOUS generation's edge counts (pages
    * of docs with doc_id % 3 != 0) live in a persisted parquet index
    * built once and reloaded (the round trip is the demonstrated
    * step); the NEW crawl (doc_id % 3 == 0) aggregates only its own
    * delta and merges counts — old pages are never re-fetched or
    * re-extracted. Output per edge: (n_prev, n_new, n_links = sum).
    * DuckDB restates both eras' counts as conditional sums over the
    * closed form; LinkGraphSpec additionally pins the merged totals
    * equal to a from-scratch full rebuild. */
  def linkIncr(spark: SparkSession, dir: String): DataFrame = {
    // the kernel gate is part of the cache key: under a flipped gate
    // (KernelParitySpec, a no-extension deployment) the prev index
    // REBUILDS through the fallback path instead of silently reusing
    // the kernel-built snapshot — the end-to-end parity pin covers
    // both eras, not just the delta
    val group = s"$dir|k=${Llm.kernelOn(spark, "graft_html_links")}"
    val fp = Tables.inputFingerprint(spark, dir, "documents")
    val snap = Snapshots.of(group, fp, "graft_link_index") { tmp =>
      buildLinkIndex(pagesOf(spark, dir).filter(pmod(col("doc_id"), lit(3)) =!= 0))
        .write.mode("overwrite").parquet(s"$tmp/edges")
    }
    val prev = spark.read.parquet(s"$snap/edges")
    val delta = buildLinkIndex(
      pagesOf(spark, dir).filter(pmod(col("doc_id"), lit(3)) === 0))
    mergeLinkIndex(prev, delta)
  }

  /** Anchor-bearing synthesized page (the `llm_anchor_terms` leg's
    * input): three `<a>` elements with multi-word anchor texts that
    * exercise the anchor walk's rules — an entity (`&amp;` → a
    * visible `&` term), a nested tag + newline run collapsing to
    * single spaces, a comment decoy inside the anchor contributing
    * nothing, and a named target without href emitting nothing.
    * Targets reuse the link-graph affine maps, so one host can be
    * `d1` for one doc class and `d2` for another — the aggregation
    * mixes multisets exactly like a real graph. */
  private def anchorPageCol = {
    val id = col("doc_id").cast("string")
    val src = pmod(col("doc_id"), lit(Hosts)).cast("string")
    val d1 = pmod(col("doc_id") * 2 + 1, lit(Hosts)).cast("string")
    val d2 = pmod(col("doc_id") * 3 + 7, lit(Hosts)).cast("string")
    val page = concat(
      lit("<html><body>\n<a href=\"http://h"), d1, lit(".example/a/"), id,
      lit("\">fast data &amp; spark</a>\n<a href='http://h"), d2,
      lit(".example/b/"), id,
      lit("'>query <b>engine</b>\n   scale</a>\n<a href=\"http://h"),
      d1, lit(".example/c/"), id,
      lit("\"><!-- decoy -->data engine</a>\n" +
        "<a name=\"target\">not a link</a>\n</body></html>"))
    val pageUrl = concat(lit("http://h"), src, lit(".example/p/"), id)
    (page, pageUrl)
  }

  /** The ORACLED anchor-term leg (`llm_anchor_terms`) — what the web
    * CALLS each host: anchor `(href, text)` pairs extract through the
    * `graft_link_anchors` kernel, resolve + canonicalize to host
    * edges exactly like `edgesOf` (same self-loop drop), anchor text
    * tokenizes to lower-cased terms, and each DESTINATION host keeps
    * its top-`k` terms by (count desc, term) — the link-context
    * quality feature corpus pipelines join next to host rank. Scale
    * shape: term rows stay map-side until ONE (dst_host, term)
    * groupBy (partial-agg'd), then one host-keyed window for the
    * top-k — no global sort, no driver state. DuckDB re-derives every
    * per-doc term multiset from the closed form and re-aggregates. */
  def anchorTerms(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (page, pageUrl) = anchorPageCol
    // NOT widened (r21 A/B): the serial synth+anchor chain costs
    // ~0.29 CPU-s at sf0.1 — under the ~0.3 CPU-s break-even the
    // warc_http A/B established; the widen's exchange + extra task
    // inits measured net-negative (0.70 s → 0.79 s warm)
    val anchors = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), pageUrl.as("page_url"), page.as("page"))
      .withColumn("src_host", Urls.hostCol(Urls.canonCol(spark, col("page_url"))))
      .filter(col("src_host").isNotNull)
      .select(col("page_url"), col("src_host"),
        explode(Html.anchorsCol(spark, col("page"))).as("pair"))
      .select(col("page_url"), col("src_host"),
        substring_index(col("pair"), "\t", 1).as("href"),
        substring_index(col("pair"), "\t", -1).as("anchor"))
      .withColumn("link_url",
        Urls.canonCol(spark, Urls.resolveCol(spark, col("page_url"), col("href"))))
      .filter(col("link_url").isNotNull)
      .withColumn("dst_host", Urls.hostCol(col("link_url")))
      .filter(col("dst_host") =!= col("src_host"))
    val counts = anchors
      .select(col("dst_host"),
        explode(split(lower(col("anchor")), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("dst_host"), col("term"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("dst_host")).orderBy(col("n").desc, col("term"))
    counts
      .withColumn("term_rank", row_number().over(w).cast("long"))
      .filter(col("term_rank") <= k)
      .select(col("dst_host"), col("term_rank"), col("term"), col("n"))
  }

  /** The DISTINCT simple-graph edge set both algorithms consume,
    * materialized once — PRE-PARTITIONED on src_host. The distinct
    * leaves the table hashed on (src, dst); both consumers join it on
    * src_host every iteration/hop, so without the repartition the
    * corpus-sized edge table would RE-SHUFFLE once per PageRank
    * iteration and per BFS hop. One build-time exchange buys
    * exchange-free static sides for every subsequent step
    * (localCheckpoint preserves the physical partitioning into the
    * LogicalRDD — PlanSpec pins the elision with broadcast/AQE off),
    * and the outdeg groupBy + join in `edgeDeg` land on the same
    * clustering, adding zero further exchanges. */
  private[graft] def edgeSet(spark: SparkSession, dir: String): DataFrame =
    linkStream(spark, dir).distinct()
      .repartition(col("src_host")).ckptLocal()

  /** (edge, outdeg-of-src) — the PageRank static side: built on
    * edgeSet's src_host clustering (aggregate and join both
    * exchange-free), checkpointed with that clustering intact. */
  private[graft] def edgeDeg(edges: DataFrame): DataFrame =
    edges
      .join(edges.groupBy("src_host").agg(count(lit(1)).as("outdeg")),
        "src_host")
      .ckptLocal()

  /** Node universe of an edge set: every host touching an edge —
    * shared by both algorithms so their node sets cannot diverge. */
  private[graft] def nodesOf(edges: DataFrame): DataFrame =
    edges.select(col("src_host").as("host"))
      .union(edges.select(col("dst_host").as("host")))
      .distinct()

  /** One power-iteration step — (host, rank) in, (host, rank) out.
    * Factored so PlanSpec can pin the ITERATION's physical shape (the
    * registry leg's final plan is just a checkpoint scan): contribs
    * flow edge→dst through one partial-agged hash exchange, the
    * rank/nodes joins are equi-joins (never a nested loop), and the
    * corpus-sized `edeg` table arrives pre-materialized — only the
    * host-sized rank vector moves per step. */
  private[graft] def rankStep(nodes: DataFrame, edeg: DataFrame,
      ranks: DataFrame, teleport: Long): DataFrame = {
    // the rank/node vectors are re-ALIASED (fresh exprIds) before each
    // join so consecutive steps can CHAIN LAZILY: iteration i+1's plan
    // embeds iteration i's, and without the re-alias the repeated
    // edeg/nodes subtrees would make the dataframe-qualified column
    // references ambiguous. Name-based joins + aliased sides keep the
    // resolution local to each side's output (r21: the per-iteration
    // eager checkpoint this replaced cost one driver job barrier per
    // iteration — guide §1.2, remove passes before tuning them)
    val r = ranks.select(col("host").as("r_host"), col("rank").as("r_rank"))
    val inflow = edeg.join(r, col("src_host") === col("r_host"))
      .select(col("dst_host"), expr("r_rank div outdeg").as("contrib"))
      .groupBy("dst_host").agg(sum(col("contrib")).as("inflow"))
    nodes.select(col("host"))
      .join(inflow.select(col("dst_host").as("i_host"), col("inflow")),
        col("host") === col("i_host"), "left_outer")
      .select(col("host"),
        (lit(teleport) +
          expr("(85 * coalesce(inflow, CAST(0 AS BIGINT))) div 100"))
          .as("rank"))
  }

  /** The ORACLED host-authority leg (`llm_host_rank`): PageRank over
    * the host graph in EXACT fixed-point arithmetic.
    *
    * Definition (mirrored verbatim by the DuckDB oracle):
    * N = |hosts touching a distinct edge|, base = Scale div N,
    * teleport = (15 × base) div 100, r₀(v) = base, and for each of
    * the 5 iterations
    *   r(v) = teleport + (85 × Σ_{(u,v)∈E} (r(u) div outdeg(u))) div 100.
    * Truncating integer division throughout; dangling hosts (in-links
    * only) contribute nothing — their mass decays, the standard
    * power-iteration-without-dangling-redistribution variant. Total
    * mass stays ≤ Scale, so 85 × inflow ≤ 8.5e13 — overflow headroom
    * ~10⁵ on longs.
    *
    * Per iteration: `rankStep` above — the corpus-sized edge table
    * never re-shuffles; iterations chain LAZILY with a checkpoint
    * every `RankCkptEvery` steps bounding the plan (r21 — the former
    * per-iteration eager checkpoint cost one driver job barrier per
    * step for a host-sized vector), and only the node COUNT ever
    * reaches the driver. */
  /** Lineage bound for the lazily-chained power iterations: a
    * checkpoint cuts the plan every this-many steps (and never on the
    * final step — the caller's one materialization executes the tail).
    * Short chains (the 5-cold/2-warm oracled cadences) therefore run
    * as ONE or TWO driver jobs instead of one per iteration; an
    * arbitrarily long chain still can't grow an unbounded plan. */
  private[graft] val RankCkptEvery = 4

  /** The chained iteration loop shared by `hostRank`/`hostRankFrom`:
    * `iters` rankSteps composed LAZILY (exact long arithmetic — the
    * result is identical however the chain is cut), checkpointed only
    * at the `RankCkptEvery` cadence. */
  private def rankLoop(nodes: DataFrame, edeg: DataFrame,
      ranks0: DataFrame, teleport: Long, iters: Int): DataFrame = {
    var ranks = ranks0
    for (i <- 1 to iters) {
      ranks = rankStep(nodes, edeg, ranks, teleport)
      if (i % RankCkptEvery == 0 && i < iters) ranks = ranks.ckptLocal()
    }
    ranks.select(col("host"), col("rank").as("rank_scaled"))
  }

  def hostRank(spark: SparkSession, dir: String): DataFrame =
    hostRankWithN(spark, dir)._1

  /** `hostRank` plus the node count its own base derives from —
    * exposed so `mixRanked` reuses the count instead of re-counting
    * the rank table with an extra job. */
  private[graft] def hostRankWithN(spark: SparkSession,
      dir: String): (DataFrame, Long) = {
    val edges = edgeSet(spark, dir)
    val nodes = nodesOf(edges).ckptLocal()
    val n = nodes.count()
    val base = Scale / math.max(n, 1L)
    val teleport = 15L * base / 100L
    val edeg = edgeDeg(edges)
    val ranks0 = nodes.select(col("host"), lit(base).as("rank"))
    (rankLoop(nodes, edeg, ranks0, teleport, Iters), n)
  }

  /** WARM-START power iteration over an explicit edge table — the
    * crawl-cadence form of `hostRank` (round-19 verdict item 5): at
    * each crawl generation the graph changes a little, so seeding
    * iteration 0 from the PREVIOUS generation's ranks (`prevRanks`:
    * (host, rank_scaled); hosts new to the merged graph enter at the
    * uniform base) reaches the same fixed point in far fewer
    * iterations than the cold uniform start — the standard
    * incremental-PageRank warm start, exact-arithmetic flavor.
    * Everything stays fixed-point long arithmetic, so the result is
    * layout-independent and a declared seed restates exactly
    * (LinkGraphSpec pins the continuation property
    * `warm(cold(k), j) == cold(k + j)`; the oracled leg restates a
    * full prev-era → merged-era chain). Same per-iteration shape as
    * `hostRank`: edges materialize once pre-partitioned on src, only
    * the host-sized rank vector moves per step. */
  def hostRankFrom(edges: DataFrame, prevRanks: DataFrame,
      iters: Int): DataFrame =
    hostRankFromPrepared(
      edges.select(col("src_host"), col("dst_host")).distinct()
        .repartition(col("src_host")).ckptLocal(),
      prevRanks, iters)

  /** `hostRankFrom` over an ALREADY-distinct, src_host-partitioned,
    * materialized edge frame — the warm leg builds both eras' edge
    * sets from one tagged scan and must not pay a second
    * distinct+repartition+checkpoint per era. */
  private def hostRankFromPrepared(dedges: DataFrame, prevRanks: DataFrame,
      iters: Int): DataFrame = {
    val nodes = nodesOf(dedges).ckptLocal()
    val n = nodes.count()
    val base = Scale / math.max(n, 1L)
    val teleport = 15L * base / 100L
    val edeg = edgeDeg(dedges)
    // the seed join chains lazily into iteration 1 (one consumer —
    // its former eager checkpoint bought nothing but a job barrier)
    val ranks0 = nodes
      .join(prevRanks.select(col("host"), col("rank_scaled")), Seq("host"), "left_outer")
      .select(col("host"), coalesce(col("rank_scaled"), lit(base)).as("rank"))
    rankLoop(nodes, edeg, ranks0, teleport, iters)
  }

  /** Warm-start iteration count for the oracled leg: the merged
    * graph differs from the previous era's by one doc class, so two
    * warm steps stand in for the cold five (the point of the warm
    * start — the leg's cost is 5 prev-era + 2 merged iterations vs
    * 5 + 5 for two cold runs). */
  private[graft] val WarmIters = 2

  /** The ORACLED warm-start leg (`llm_host_rank_warm`) — host
    * authority at crawl cadence: the PREVIOUS generation (the
    * `llm_link_incr` era split, doc_id % 3 != 0) ranks cold with the
    * standard 5 iterations, then the FULL merged graph re-ranks with
    * only `WarmIters` iterations seeded from those ranks (new-era
    * hosts enter at the merged graph's uniform base). DuckDB
    * restates the entire chain — era edges, 5 cold iterations, seed
    * coalesce, 2 warm iterations — in exact integer arithmetic. */
  def hostRankWarm(spark: SparkSession, dir: String): DataFrame = {
    // ONE corpus scan for both eras (r21; guide §1.2 — the previous
    // shape extracted the page markup twice, once per era): every
    // distinct edge is tagged with whether any PREVIOUS-era page
    // carries it, materialized edge-sized and src_host-partitioned
    // (the edgeSet shape), and both chains consume filtered views —
    // prev-era = in_prev edges, merged = all. Filter/project preserve
    // the checkpointed partitioning, so the per-iteration
    // exchange-free static side is unchanged.
    val tagged = edgesOf(pagesOf(spark, dir))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(max(when(pmod(col("doc_id"), lit(3)) =!= 0, 1).otherwise(0))
        .as("in_prev"))
      .repartition(col("src_host")).ckptLocal()
    val noPrev = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("host",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("rank_scaled",
          org.apache.spark.sql.types.LongType))))
    val prev = hostRankFromPrepared(
      tagged.filter(col("in_prev") === 1)
        .select(col("src_host"), col("dst_host")), noPrev, Iters)
    hostRankFromPrepared(
      tagged.select(col("src_host"), col("dst_host")), prev, WarmIters)
  }

  /** Authority-weighted corpus mixing (`llm_mix_ranked`) — the
    * reason a corpus pipeline computes host rank at all: the mixture
    * step keeps more documents from authoritative hosts. Each
    * document joins its host's PageRank (ONE broadcast join — the
    * rank table is host-sized, millions of rows at web scale, tens
    * of MB; never a doc-sized shuffle), the rank buckets into a
    * 1–5 quality prior against integer thresholds around the uniform
    * base (≥ 1.1·base → 5, ≥ base → 4, ≥ 0.8·base → 3, below → 2,
    * host absent from the graph → 1), and the keep rule is
    * `llm_mix_weighted`'s content-free salted-hash-vs-threshold
    * compare with the bucket as the weight: u < bucket × 15000 of
    * 100000 (15%..75%). Reproducible on any engine/layout/run — the
    * property mixture resampling needs. DuckDB restates the rank
    * from its unrolled CTE and the keep rule per row. */
  def mixRanked(spark: SparkSession, dir: String): DataFrame = {
    // the node count rides out of hostRank itself (one row per node
    // by construction) — counting the rank table again cost a job and,
    // with the now-lazy rank chain, would have re-run it (r21). The
    // chain materializes HERE (host-sized) so the broadcast below
    // ships a plain in-memory table and the leg's final plan stays
    // the pinned shape: one BroadcastHashJoin, no shuffle join
    // anywhere near the corpus scan.
    val (ranksLazy, nHosts) = hostRankWithN(spark, dir)
    val ranks = ranksLazy.ckptLocal()
    val base = Scale / math.max(nHosts, 1L)
    val hi = 11L * base / 10L
    val lo = 8L * base / 10L
    Tables.widened(Tables.documents(spark, dir))
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        concat(lit("h"), pmod(col("doc_id"), lit(Hosts)).cast("string"),
          lit(".example")).as("host"))
      .join(broadcast(ranks), Seq("host"), "left_outer")
      .withColumn("rank_bucket",
        when(col("rank_scaled").isNull, lit(1L))
          .when(col("rank_scaled") >= hi, lit(5L))
          .when(col("rank_scaled") >= base, lit(4L))
          .when(col("rank_scaled") >= lo, lit(3L))
          .otherwise(lit(2L)))
      .withColumn("u",
        (conv(substring(md5(concat(lit("mixrank:"), col("doc_id").cast("string"))), 1, 14),
          16, 10).cast("long") % 100000L))
      .filter(col("u") < col("rank_bucket") * 15000L)
      .select(col("doc_id"), col("host"), col("rank_bucket"),
        col("u").as("mix_rank"))
  }

  /** The ORACLED reachability leg (`llm_link_bfs`): minimum hop
    * distance from the seed hosts (numeric id % 10 == 0) within
    * MaxHops, over the distinct edge set. Classic frontier BFS: per
    * hop, the (shrinking) frontier joins the materialized edges on
    * src, dedups, anti-joins the visited set, and the loop stops
    * early when a hop discovers nothing — at most MaxHops bounded
    * jobs, never a data-dependent driver loop. Unreached hosts are
    * absent (a crawl-horizon query wants the reachable set, not
    * NULL-padded totals). DuckDB restates it as a depth-bounded
    * recursive CTE with min(d). */
  def linkBfs(spark: SparkSession, dir: String): DataFrame = {
    val edges = edgeSet(spark, dir)
    val seeds = nodesOf(edges).filter(
      pmod(regexp_extract(col("host"), "^h(\\d+)\\.example$", 1).cast("long"),
        lit(10)) === 0)
    var visited = seeds.select(col("host"), lit(0L).as("dist")).ckptLocal()
    var frontier = visited.select("host")
    var hop = 1
    var done = false
    while (hop <= MaxHops && !done) {
      val next = edges.join(frontier, edges("src_host") === frontier("host"))
        .select(col("dst_host").as("host")).distinct()
        .join(visited.select("host"), Seq("host"), "left_anti")
        .ckptLocal()
      if (next.isEmpty) done = true
      else {
        // every hop's `next` is already checkpointed, so the running
        // visited set stays a LAZY union of materialized frames —
        // checkpointing the union too cost one extra driver job per
        // hop for data that never recomputes (r21)
        visited = visited
          .union(next.select(col("host"), lit(hop.toLong).as("dist")))
        frontier = next.select("host")
      }
      hop += 1
    }
    visited.select(col("host"), col("dist"))
  }
}
