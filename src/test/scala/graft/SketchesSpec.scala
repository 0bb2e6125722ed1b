package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchAggs
import graft.operators.{Ecosystem, Sketches}

/** Property tests for the sketch family (SURVEY §5.2): Bloom
  * no-false-negatives + bounded FPR, MinHash Jaccard error bound,
  * HLL relative error vs the exact twin. */
class SketchesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("bloom filter: zero false negatives, FPR near design point") {
    val present = (0 until 500).map(i => s"key_$i")
    val bloomUdaf = udaf(new SketchAggs.BloomAgg(1000L, 0.03), Encoders.STRING)
    val bytes = present.toDF("k").agg(bloomUdaf(col("k"))).head().getAs[Array[Byte]](0)
    val bf = SketchAggs.deserializeBloom(bytes)
    assert(present.forall(bf.mightContainString), "bloom must never false-negative")
    val absent = (0 until 2000).map(i => s"absent_$i")
    val fpr = absent.count(bf.mightContainString).toDouble / absent.size
    assert(fpr <= 0.06, s"FPR $fpr should be near the 0.03 design point at half load")
  }

  test("minhash signature jaccard estimates true jaccard within Chernoff bound") {
    // |A|=800, |B|=800, |A∩B|=600 -> true J = 600/1000 = 0.6
    val a = (0 until 800).map(i => ("a", s"k_$i"))
    val b = (200 until 1000).map(i => ("b", s"k_$i"))
    val df = (a ++ b).toDF("grp", "key")
      .withColumn("hashes",
        expr("transform(sequence(0, 127), i -> xxhash64(i, key) & 9223372036854775807)"))
    val sigUdaf = udaf(new SketchAggs.MinHashAgg(128), ExpressionEncoder[Array[Long]]())
    val sigs = df.groupBy("grp").agg(sigUdaf(col("hashes")).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val est = sigs("a").zip(sigs("b")).count { case (x, y) => x == y } / 128.0
    assert(math.abs(est - 0.6) < 0.15, s"estimate $est should be within 0.15 of 0.6")
  }

  test("declared minhash query tracks the exact jaccard twin") {
    val exact = Sketches.jaccardExact(spark, TestSpark.sf)
      .select("type_a", "type_b", "jaccard").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val est = Sketches.minhashJaccard(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (k, e) =>
      assert(math.abs(e - exact(k)) < 0.15, s"pair $k: estimate $e vs exact ${exact(k)}")
    }
  }

  test("HLL estimate within 3x rsd of exact distinct") {
    val exact = Ecosystem.distinctUsers(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Ecosystem.approxDistinctUsers(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      val err = math.abs(approx(t) - n).toDouble / n
      assert(err <= 3 * 0.01625, s"$t: HLL err $err exceeds 3x rsd")
    }
  }

  test("bloom membership query returns only true verdicts (no false negatives)") {
    val rows = Sketches.bloomMembers(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)), "present-key probes must all be in_bloom")
  }
}
