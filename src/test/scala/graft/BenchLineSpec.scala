package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Pins Bench's stdout line-budget degradation ladder WITHOUT running
  * a benchmark: the driver keeps only the last 2000 chars of stdout
  * (sbt's ~74-char success trailer included), so the metrics line
  * must stay parseable and <= 1910 chars at ANY registry size.
  * Round 4 shipped `parsed:null` when the then-3.1 KB line overflowed
  * the window, and the overflow reproduces past ~84 queries unless
  * the totals-only fallback kicks in — this spec drives the ladder
  * with synthetic registries well past that point. */
class BenchLineSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def mkLine(n: Int): String = {
    val names = (1 to n).map(i => f"llm_synthetic_query_name_$i%03d")
    val wall = names.map(nm => nm -> Some(12.3456)).toMap
    Bench.compactLine(names, wall, total = n * 12.3456, cpuTotal = n * 7.0,
      calibMax = 0.31, sf = "0.1", failedJson = "[]")
  }

  test("compact line stays parseable and under the 1910-char budget from 1 to 150 queries") {
    for (n <- Seq(1, 10, 40, 60, 83, 84, 90, 120, 150)) {
      val l = mkLine(n)
      assert(l.length <= 1910, s"$n queries: ${l.length} chars overflows the tail window")
      val node = mapper.readTree(l)
      assert(node.get("metric").asText == "total", s"$n queries: not a metrics line")
      assert(node.get("value").asDouble > 0)
      // an empty failed list is omitted — those 12 chars are what
      // keeps the 84-name registry's per-query map inside the window
      assert(!node.has("failed"), s"$n queries: empty failed list should be omitted")
    }
  }

  test("small registries keep per-query values + diagnostics; huge ones fall back to totals-only") {
    val small = mapper.readTree(mkLine(40))
    assert(small.has("queries") && small.get("queries").size == 40)
    assert(small.has("cpu_sec") && small.has("calib_max"),
      "diagnostics expected on the 2-decimal rung")
    val big = mapper.readTree(mkLine(120))
    assert(!big.has("queries"), "a 120-query map cannot fit the tail window")
    assert(big.get("queries_in_file_only").asBoolean,
      "fallback must say where the per-query data went")
    assert(big.get("n_queries").asInt == 120)
  }

  test("failed queries render as null values and survive every rung") {
    val names = (1 to 120).map(i => f"llm_synthetic_query_name_$i%03d")
    val wall = names.map(nm => nm -> (None: Option[Double])).toMap
    val l = Bench.compactLine(names, wall, 0.0, 0.0, 0.31, "0.1",
      names.take(3).map("\"" + _ + "\"").mkString("[", ",", "]"))
    assert(l.length <= 1910)
    val node = mapper.readTree(l)
    assert(node.get("failed").size == 3, "failed list must survive the totals-only fallback")
  }

  test("the real registry's line fits the window with its actual names") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val wall = names.map(nm => nm -> Some(3.21)).toMap
    val l = Bench.compactLine(names, wall, 46.1, 82.7, 0.31, "0.1", "[]")
    assert(l.length <= 1910, s"real registry line is ${l.length} chars")
    val node = mapper.readTree(l)
    assert(node.has("queries") && node.get("queries").size == names.size,
      "the real registry should still carry its per-query map")
  }
}
