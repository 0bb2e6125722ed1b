package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinkGraph

/** Link-graph family pins: the distributed edge build / fixed-point
  * PageRank / bounded BFS are each compared against an INDEPENDENT
  * pure-Scala reference computed from the closed-form synthesis — a
  * different implementation of the same definition (in-memory maps vs
  * iterative DataFrame jobs), so a partitioning, join, checkpoint or
  * truncation bug in the distributed loop cannot agree with it by
  * luck. */
class LinkGraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val P = 101
  private lazy val ids: Array[Long] =
    graft.sources.Tables.documents(spark, TestSpark.sf)
      .where("text is not null").select("doc_id")
      .collect().map(_.getLong(0))

  // closed-form link targets per doc, in page order (d1 appears twice:
  // anchor + <img> asset)
  private def targets(id: Long): Seq[(Long, Long)] = {
    val s = id % P
    Seq((s, (2 * id + 1) % P), (s, (3 * id + 7) % P),
        (s, (7 * id + 13) % P), (s, (2 * id + 1) % P))
  }
  private lazy val rawLinks: Seq[(Long, Long)] =
    ids.toSeq.flatMap(targets).filter { case (a, b) => a != b }
  private lazy val edges: Seq[(Long, Long)] = rawLinks.distinct
  private lazy val nodes: Seq[Long] =
    edges.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
  private def hostName(h: Long): String = s"h$h.example"

  test("edge build matches the closed form, with multiplicity, no decoys") {
    val got = LinkGraph.linkGraph(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = rawLinks.groupBy(identity).map { case ((s, d), v) =>
      (hostName(s), hostName(d)) -> v.size.toLong
    }
    assert(got == want, "edge multiset must equal the closed form")
    assert(!got.keys.exists { case (a, b) =>
      a.contains("decoy") || b.contains("decoy") },
      "the comment decoy must contribute no edge")
    // the <img> repeat of target 1 must be COUNTED, not dedup'd:
    // at least one doc has d1 distinct from src, so some edge
    // carries multiplicity >= 2
    assert(got.values.exists(_ >= 2L), "img-asset multiplicity lost")
  }

  /** Independent fixed-point PageRank (LinkGraph's documented
    * definition) over in-memory maps. */
  private def referenceRank(): Map[String, Long] = {
    val n = nodes.length
    val base = LinkGraph.Scale / n
    val tp = 15L * base / 100L
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(_ -> base).toMap
    for (_ <- 1 to LinkGraph.Iters) {
      val inflow = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((u, v) <- edges) inflow(v) += r(u) / outdeg(u)
      r = nodes.map(h => h -> (tp + 85L * inflow(h) / 100L)).toMap
    }
    r.map { case (h, v) => hostName(h) -> v }
  }

  test("hostRank equals the pure-Scala fixed-point reference bit-for-bit") {
    val got = LinkGraph.hostRank(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == referenceRank(),
      "distributed fixed-point PageRank must equal the in-memory reference")
  }

  test("rank mass is conserved up to truncation + dangling decay") {
    val got = LinkGraph.hostRank(spark, TestSpark.sf).collect().map(_.getLong(1))
    val total = got.sum
    assert(total > 0L && total <= LinkGraph.Scale,
      s"total mass $total must stay within the fixed-point scale")
    assert(got.forall(_ >= 0L), "ranks are non-negative by construction")
  }

  test("hostRank is deterministic across invocations") {
    val a = LinkGraph.hostRank(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val b = LinkGraph.hostRank(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b), "long arithmetic must be layout-independent")
  }

  /** Cold reference with a parametric seed + iteration count — the
    * warm-start pins compare against this. */
  private def referenceRankFrom(seed: Map[Long, Long], iters: Int): Map[Long, Long] = {
    val n = nodes.length
    val base = LinkGraph.Scale / n
    val tp = 15L * base / 100L
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(h => h -> seed.getOrElse(h, base)).toMap
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((u, v) <- edges) inflow(v) += r(u) / outdeg(u)
      r = nodes.map(h => h -> (tp + 85L * inflow(h) / 100L)).toMap
    }
    r
  }

  test("lazy-chained rank loop is identical wherever RankCkptEvery cuts it") {
    // r21: iterations chain lazily with a checkpoint every
    // RankCkptEvery steps — the result must be bit-identical for
    // counts below, at, just past, and multiple times the cadence
    val s = spark
    import s.implicits._
    val edgeDf = edges.map { case (u, v) => (hostName(u), hostName(v)) }
      .toDF("src_host", "dst_host")
    val noPrev = Seq.empty[(String, Long)].toDF("host", "rank_scaled")
    for (iters <- Seq(3, LinkGraph.RankCkptEvery, LinkGraph.RankCkptEvery + 1,
        2 * LinkGraph.RankCkptEvery + 1)) {
      val got = LinkGraph.hostRankFrom(edgeDf, noPrev, iters).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = referenceRankFrom(Map.empty, iters)
        .map { case (h, r) => hostName(h) -> r }
      assert(got == want,
        s"lazy-chained rank at iters=$iters diverged from the reference")
    }
  }

  test("warm start continues the cold iteration exactly: warm(cold(k), j) == cold(k+j)") {
    val s = spark
    import s.implicits._
    val edgeDf = edges.map { case (u, v) => (hostName(u), hostName(v)) }
      .toDF("src_host", "dst_host")
    val coldK = referenceRankFrom(Map.empty, 3)
    val prevDf = coldK.toSeq.map { case (h, r) => (hostName(h), r) }
      .toDF("host", "rank_scaled")
    val warm = LinkGraph.hostRankFrom(edgeDf, prevDf, iters = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val coldKj = referenceRankFrom(Map.empty, 5)
      .map { case (h, r) => hostName(h) -> r }
    assert(warm == coldKj,
      "seeding from cold(3) and stepping 2 must equal cold(5) bit-for-bit")
  }

  test("llm_host_rank_warm: prev-era cold ranks + 2 warm steps on the merged graph, new hosts at base") {
    // in-memory restatement of the leg's whole chain
    val eraIds = ids.filter(_ % 3 != 0)
    val eraEdges = eraIds.flatMap(id => targets(id))
      .filter { case (a, b) => a != b }.distinct.toSeq
    val eraNodes = eraEdges.flatMap(e => Seq(e._1, e._2)).distinct
    val baseA = LinkGraph.Scale / eraNodes.length
    val tpA = 15L * baseA / 100L
    val outA = eraEdges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var rA = eraNodes.map(_ -> baseA).toMap
    for (_ <- 1 to LinkGraph.Iters) {
      val inflow = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((u, v) <- eraEdges) inflow(v) += rA(u) / outA(u)
      rA = eraNodes.map(h => h -> (tpA + 85L * inflow(h) / 100L)).toMap
    }
    val want = referenceRankFrom(rA, LinkGraph.WarmIters)
      .map { case (h, r) => hostName(h) -> r }
    val got = SparkEntry.queries("llm_host_rank_warm")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, "warm leg must equal the in-memory chain restatement")
  }

  test("incremental link index: eras match the closed form, merge equals a full rebuild") {
    val got = LinkGraph.linkIncr(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // independent reference: the same raw link multiset split by era
    val byEdge = ids.toSeq.flatMap(id => targets(id).map(t => (id, t)))
      .filter { case (_, (a, b)) => a != b }
      .groupBy { case (_, (s, d)) => (hostName(s), hostName(d)) }
    val want = byEdge.map { case (k, links) =>
      val prev = links.count(_._1 % 3 != 0).toLong
      val neu = links.count(_._1 % 3 == 0).toLong
      k -> (prev, neu, prev + neu)
    }
    assert(got == want, "cross-era counts must equal the per-era closed form")
    // the merge must reconstruct exactly what a from-scratch rebuild
    // over ALL pages produces — incremental == batch, the same
    // contract the near-dup index pins
    val full = LinkGraph.linkGraph(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.map { case (k, (_, _, t)) => k -> t } == full,
      "merged totals diverge from the full rebuild")
    // the persisted snapshot is reused: a second invocation (same
    // input fingerprint) returns identical rows
    val again = LinkGraph.linkIncr(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(again == got, "snapshot reuse must be deterministic")
  }

  test("edgesOf keys src from the CANONICAL fetch URL and dst from the first ://") {
    import spark.implicits._
    val pages = Seq(
      // page fetched under a NON-canonical spelling: its own links
      // must still self-loop-drop against the canonical host, and a
      // link with an absolute URL embedded in the query must key to
      // the OUTER host, never the embedded one
      ("HTTP://B.Example:80/p/2",
        "<a href=\"/x\">self</a>" +
          "<a href=\"http://a.example/r?u=http://c.example/z\">r</a>"),
      // a fetch URL that doesn't parse cannot key edges — the row
      // drops instead of producing a garbage src_host node
      ("not a url", "<a href=\"http://a.example/y\">y</a>"))
      .toDF("page_url", "page")
    val got = LinkGraph.edgesOf(pages)
      .select("src_host", "dst_host", "link_url")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("b.example", "a.example",
      "http://a.example/r?u=http://c.example/z")),
      s"got $got")
  }

  /** Independent bounded BFS (queue over adjacency lists). */
  private def referenceBfs(): Map[String, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val seeds = nodes.filter(_ % 10 == 0)
    val dist = scala.collection.mutable.Map[Long, Long](seeds.map(_ -> 0L): _*)
    var frontier = seeds
    for (k <- 1 to LinkGraph.MaxHops) {
      val next = frontier.flatMap(h => adj.getOrElse(h, Nil))
        .distinct.filterNot(dist.contains)
      next.foreach(h => dist(h) = k.toLong)
      frontier = next
    }
    dist.map { case (h, d) => hostName(h) -> d }.toMap
  }

  test("linkBfs equals the pure-Scala BFS distances") {
    val got = LinkGraph.linkBfs(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceBfs()
    assert(got == want, "distributed frontier BFS must equal queue BFS")
    assert(got.values.forall(d => d >= 0L && d <= LinkGraph.MaxHops))
    // every seed present in the graph sits at distance 0
    nodes.filter(_ % 10 == 0).foreach { s =>
      assert(got.get(hostName(s)).contains(0L), s"seed $s must be at dist 0")
    }
  }
}
