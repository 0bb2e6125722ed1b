package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Llm

class LlmSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("exact dedup partitions the corpus (group sizes sum to doc count)") {
    val rows = Llm.dedupExact(spark, TestSpark.sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    assert(rows.forall(_.getLong(2) >= 0))
  }

  test("near-dup LSH finds every planted pair, all verified >= 0.8") {
    val pairs = Llm.dedupNear(spark, TestSpark.sf).collect()
    // 28 pairs exceed jaccard 0.8 in the sf0.001 corpus (computed
    // independently with an all-pairs DuckDB query). Pinning the
    // exact count catches LSH recall regressions — a degenerate hash
    // family once silently dropped subset-pairs while everything
    // else stayed green.
    assert(pairs.length == 28, s"expected all 28 planted pairs, got ${pairs.length}")
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be ordered")
      assert(r.getDouble(2) >= 0.8)
    }
  }

  test("simhash pairs are within hamming 3 and consistent with signatures") {
    val sig = Llm.simhash(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Llm.simhashPairs(spark, TestSpark.sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val ham = java.lang.Long.bitCount(sig(r.getLong(0)) ^ sig(r.getLong(1)))
      assert(ham == r.getLong(2) && ham <= 3)
    }
  }

  test("knn exact: 10 ranked neighbors per probe, sims in [-1, 1], self excluded") {
    val rows = Llm.knnExact(spark, TestSpark.sf).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.size == 10)
    byProbe.foreach { case (pid, rs) =>
      assert(rs.length == 10)
      assert(rs.map(_.getInt(3)).sorted.sameElements(1 to 10))
      assert(rs.forall(r => r.getLong(1) != pid))
      assert(rs.forall(r => math.abs(r.getDouble(2)) <= 1.0))
      // ranking is by descending similarity
      val sorted = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ANN LSH recall@10 beats random selection by a wide margin") {
    val exact = Llm.knnExact(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Llm.annLsh(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    // near-orthogonal noise corpus: 16x6 LSH lands ~0.5; random top-10
    // from ~20% candidates would land ~0.2
    assert(recall >= 0.35, s"recall@10 $recall below floor")
  }

  test("quality scores are in (0, 1] and token stats cover all docs") {
    val q = Llm.quality(spark, TestSpark.sf).collect()
    assert(q.forall(r => r.getDouble(4) > 0 && r.getDouble(4) <= 1.0))
    val stats = Llm.textStats(spark, TestSpark.sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.sf).count()
    assert(stats.map(_.getLong(1)).sum == nDocs)
  }
}
