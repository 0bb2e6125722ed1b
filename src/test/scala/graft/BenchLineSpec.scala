package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Pins Bench's stdout line-budget degradation ladder WITHOUT running
  * a benchmark: the driver keeps only the last 2000 chars of stdout
  * (sbt's ~74-char success trailer included), so the metrics line
  * must stay parseable and <= 1910 chars at ANY registry size.
  * Round 4 shipped `parsed:null` when the then-3.1 KB line overflowed
  * the window; round 10 shipped totals-only when the 86-name map
  * outgrew the diag-free rung. The ladder's fix (round-10 verdict
  * item 1) is the `qv` rung: per-query values as an ARRAY aligned to
  * the sorted registry names, fingerprinted with `qn_md5` — this
  * spec drives the ladder with synthetic registries well past 300
  * queries and pins the real registry onto a per-query-carrying rung. */
class BenchLineSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def mkLine(n: Int): String = {
    val names = (1 to n).map(i => f"llm_synthetic_query_name_$i%03d")
    val wall = names.map(nm => nm -> Some(12.3456)).toMap
    Bench.compactLine(names, wall, total = n * 12.3456, cpuTotal = n * 7.0,
      calibMax = 0.31, sf = "0.1", failed = Nil)
  }

  /** Per-query wall values as carried by whichever rung the line
    * landed on: the named map, or the qv array (alignment verified
    * against the fingerprint), or None on the totals-only fallback. */
  private def perQuery(l: String, names: Seq[String]): Option[Seq[Double]] = {
    val node = mapper.readTree(l)
    if (node.has("queries")) {
      Some(names.map(n => node.get("queries").get(n).asDouble))
    } else if (node.has("qv")) {
      assert(node.get("qn_md5").asText == Bench.namesFingerprint(names),
        "qv rung must fingerprint the name list it is aligned to")
      assert(node.get("n_queries").asInt == names.size)
      assert(node.get("qv").size == names.size, "qv must have one slot per sorted name")
      Some((0 until names.size).map(i => node.get("qv").get(i).asDouble))
    } else None
  }

  test("compact line stays parseable and under the 1910-char budget from 1 to 300 queries") {
    for (n <- Seq(1, 10, 40, 60, 83, 84, 90, 120, 150, 200, 300)) {
      val l = mkLine(n)
      assert(l.length <= 1910, s"$n queries: ${l.length} chars overflows the tail window")
      val node = mapper.readTree(l)
      assert(node.get("metric").asText == "total", s"$n queries: not a metrics line")
      assert(node.get("value").asDouble > 0)
      // an empty failed list is omitted — those 12 chars are what
      // keeps the 84-name registry's per-query map inside the window
      assert(!node.has("failed"), s"$n queries: empty failed list should be omitted")
      // the round-10 regression: per-query data must survive far past
      // the named map's ~84-name ceiling, via the qv rung
      val names = (1 to n).map(i => f"llm_synthetic_query_name_$i%03d")
      val vals = perQuery(l, names)
      assert(vals.nonEmpty, s"$n queries: per-query data fell off the line")
      assert(vals.get.forall(v => math.abs(v - 12.3456) < 0.06),
        s"$n queries: rung values must round-trip within its decimal precision")
    }
  }

  test("small registries keep the named map + diagnostics; mid-size switch to qv; only 500+ fall back") {
    val small = mapper.readTree(mkLine(40))
    assert(small.has("queries") && small.get("queries").size == 40)
    assert(small.has("cpu_sec") && small.has("calib_max"),
      "diagnostics expected on the 2-decimal rung")
    val mid = mapper.readTree(mkLine(120))
    assert(!mid.has("queries"), "a 120-name MAP cannot fit the tail window")
    assert(mid.has("qv") && mid.get("qv").size == 120,
      "120 queries must ride the qv rung, not the totals-only fallback")
    assert(mid.has("cpu_sec"), "the 2-decimal qv rung still carries diagnostics")
    val big = mapper.readTree(mkLine(500))
    assert(!big.has("queries") && !big.has("qv"),
      "500 synthetic 27-char names exceed even the qv rung")
    assert(big.get("queries_in_file_only").asBoolean,
      "fallback must say where the per-query data went")
    assert(big.get("n_queries").asInt == 500)
  }

  test("failed queries render as null values and survive every rung") {
    val names = (1 to 500).map(i => f"llm_synthetic_query_name_$i%03d")
    val wall = names.map(nm => nm -> (None: Option[Double])).toMap
    val l = Bench.compactLine(names, wall, 0.0, 0.0, 0.31, "0.1", names.take(3))
    assert(l.length <= 1910)
    val node = mapper.readTree(l)
    assert(node.get("failed").size == 3, "failed list must survive the totals-only fallback")
    // and on the qv rung, an all-failed registry is all-null slots
    val names120 = names.take(120)
    val l120 = Bench.compactLine(names120,
      names120.map(nm => nm -> (None: Option[Double])).toMap, 0.0, 0.0, 0.31, "0.1",
      names120.take(3))
    val node120 = mapper.readTree(l120)
    assert(node120.has("qv") && node120.get("qv").get(0).isNull,
      "a failed query must hold a null slot in the qv array")
    assert(node120.get("failed").size == 3)
  }

  test("a mass failure's own failed list cannot overflow the window (sample + dropped count)") {
    // the worst possible bench day: EVERY query fails. The failed
    // list alone outgrows the tail window past ~105 full names; the
    // line must degrade to a 20-name sample + count, never ship an
    // unparseable (parsed:null) artifact on the run that most needs
    // diagnosing
    for (n <- Seq(120, 200, 500)) {
      val names = (1 to n).map(i => f"llm_synthetic_query_name_$i%03d")
      val wall = names.map(nm => nm -> (None: Option[Double])).toMap
      val l = Bench.compactLine(names, wall, 0.0, 0.0, 0.31, "0.1", names)
      assert(l.length <= 1910, s"$n all-failed: ${l.length} chars overflows the window")
      val node = mapper.readTree(l)
      assert(node.get("failed").size == 20, s"$n all-failed: expected the 20-name sample")
      assert(node.get("failed_dropped").asInt == n - 20)
      assert(node.get("n_queries").asInt == n)
    }
    // the real registry all-failed still fits with its full list today
    val real = SparkEntry.queries.keys.toSeq.sorted
    val lr = Bench.compactLine(real,
      real.map(nm => nm -> (None: Option[Double])).toMap, 0.0, 0.0, 0.31, "0.1", real)
    assert(lr.length <= 1910)
    val noder = mapper.readTree(lr)
    assert(noder.get("failed").size == real.size || noder.has("failed_dropped"),
      "all-failed real registry must carry the full list or the sampled form")
  }

  test("the real registry's line carries per-query data with its actual names") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val wall = names.map(nm => nm -> Some(3.21)).toMap
    val l = Bench.compactLine(names, wall, 46.1, 82.7, 0.31, "0.1", Nil)
    assert(l.length <= 1910, s"real registry line is ${l.length} chars")
    val vals = perQuery(l, names)
    assert(vals.nonEmpty,
      s"the real ${names.size}-query registry must carry per-query data (map or qv), " +
        "not the totals-only fallback — round 10 shipped an artifact without it")
    assert(vals.get.forall(v => math.abs(v - 3.21) < 0.06))
    // worst case on the same registry: throttled flag + a failed list
    // must not push the line onto the totals-only rung either
    val lWorst = Bench.compactLine(names, wall, 46.1, 82.7, 0.92, "0.1",
      names.take(3), throttled = true)
    assert(lWorst.length <= 1910, s"worst-case real line is ${lWorst.length} chars")
    val worst = mapper.readTree(lWorst)
    assert(worst.get("throttled").asBoolean && worst.get("failed").size == 3)
    assert(worst.has("queries") || worst.has("qv"),
      "per-query data must survive the throttled+failed worst case at the real registry size")
  }

  // ---- throttle adjudication (round-9 verdict item 1) -------------
  // Synthetic replays of the round-9 failure: a throttle window that
  // spans the same block of queries in both sweeps. The analysis must
  // (a) flag those queries for the bounded re-sweep, (b) clear them
  // once a clean-window sample exists (self-correction), and (c) keep
  // flagging honestly when no clean window ever happens — including a
  // run throttled end-to-end, where min(observed probes) alone would
  // redefine slow as normal.

  private val healthy = 0.38

  test("a query throttled in both sweeps is flagged; a clean-window sample clears it") {
    // windows: 0 clean, 1 throttled (throttle hit before its closing
    // probe), 2 throttled (recovered before ITS closing probe — the
    // 0.80 opening probe still taints it, conservatively), 3 clean
    val windows = IndexedSeq((0.38, 0.39), (0.39, 0.80), (0.80, 0.39), (0.39, 0.38))
    val winIdx = Map(
      "q_clean" -> List(0, 3),    // clean both sweeps
      "q_hot"   -> List(1, 2),    // throttled both sweeps → re-sweep needed
      "q_edge"  -> List(1, 3))    // one throttled, one clean → min factor clean
    val (h, factors, flagged) = Bench.throttleAnalysis(winIdx, windows, healthy)
    assert(h === 0.38)
    assert(flagged == Set("q_hot"), s"only the doubly-throttled query should flag: $flagged")
    assert(factors("q_clean") < 1.3 && factors("q_edge") < 1.3)
    assert(factors("q_hot") > 1.9, s"q_hot's cleanest window was ~2x: ${factors("q_hot")}")
    // self-correction: the re-sweep adds a clean-window sample
    val windows2 = windows :+ ((0.38, 0.39))
    val winIdx2 = winIdx.updated("q_hot", 4 :: winIdx("q_hot"))
    val (_, factors2, flagged2) = Bench.throttleAnalysis(winIdx2, windows2, healthy)
    assert(flagged2.isEmpty, "a clean re-sweep sample must clear the flag")
    assert(factors2("q_hot") < 1.3)
  }

  test("cpu attribution flags exactly the queries whose REPORTED sample had a timed-out drain") {
    // sample lists are prepended per sweep, so index 0 = latest sweep;
    // sus lists are index-aligned with cpu lists
    val cpu = Map(
      "q_clean"    -> List(2.0, 2.1),  // both settles clean
      "q_inflated" -> List(20.5, 22.0),// min sample (idx 0) tainted → flag
      "q_rescued"  -> List(6.5, 20.5), // min sample (idx 0) clean; the
                                       // inflated sweep-1 sample lost the min
      "q_failed"   -> Nil)             // no samples → nothing to flag
    val sus = Map(
      "q_clean"    -> List(false, false),
      "q_inflated" -> List(true, true),
      "q_rescued"  -> List(false, true),
      "q_failed"   -> Nil)
    val flagged = Bench.cpuSuspects(cpu, sus)
    assert(flagged == Set("q_inflated"),
      s"only the query whose reported min-CPU sample was tainted flags: $flagged")
    // a query with samples but MISSING suspect bits (defensive) flags:
    // absence of evidence of a clean settle is not evidence of one
    assert(Bench.cpuSuspects(Map("q" -> List(1.0)), Map.empty) == Set("q"))
  }

  test("a run throttled end-to-end still reads as throttled (healthy clamp)") {
    // every probe slow: min observed = 0.74, but the documented
    // healthy clamp keeps the reference honest
    val windows = IndexedSeq((0.80, 0.76), (0.74, 0.79))
    val winIdx = Map("q1" -> List(0, 1), "q2" -> List(1))
    val (h, factors, flagged) = Bench.throttleAnalysis(winIdx, windows, healthy)
    assert(h === healthy, "reference must clamp to the documented healthy value")
    assert(flagged == Set("q1", "q2"), "an end-to-end-throttled run must flag everything")
    assert(factors.values.forall(_ > 1.9))
  }

  test("a healthy run flags nothing and pays no stdout chars") {
    val windows = IndexedSeq((0.38, 0.39), (0.37, 0.40))
    val winIdx = Map("q1" -> List(0, 1), "q2" -> List(0))
    val (_, _, flagged) = Bench.throttleAnalysis(winIdx, windows, healthy)
    assert(flagged.isEmpty)
    val names = (1 to 84).map(i => f"llm_synthetic_query_name_$i%03d")
    val wall = names.map(nm => nm -> Some(12.3456)).toMap
    val clean = Bench.compactLine(names, wall, 100.0, 70.0, 0.31, "0.1", Nil)
    assert(!clean.contains("throttled"), "healthy runs must not carry the field")
  }

  test("the throttled flag survives every rung of the line ladder") {
    for (n <- Seq(40, 84, 120)) {
      val names = (1 to n).map(i => f"llm_synthetic_query_name_$i%03d")
      val wall = names.map(nm => nm -> Some(12.3456)).toMap
      val l = Bench.compactLine(names, wall, n * 12.3456, n * 7.0, 0.92, "0.1", Nil,
        throttled = true)
      assert(l.length <= 1910, s"$n queries throttled: ${l.length} chars")
      val node = mapper.readTree(l)
      assert(node.get("throttled").asBoolean, s"$n queries: flag must survive the ladder")
    }
  }
}
