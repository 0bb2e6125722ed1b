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

  test("faithful HLL matches the reference algorithm bit-for-bit (golden values)") {
    // goldens computed with an independent replica of
    // hyperloglog.py:4-38 (sha256, b=12, linear/large-range
    // corrections, Python round)
    val hllUdaf = udaf(new SketchAggs.FaithfulHllAgg(12), Encoders.STRING)
    val synthetic = (0 until 10000).map(_.toString).toDF("k")
      .agg(hllUdaf(col("k"))).head().getLong(0)
    assert(synthetic == 9706L,
      s"synthetic 10k-key estimate $synthetic != golden 9706 (bit-level drift)")
    val perType = Sketches.hllFaithful(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perType.values.forall(_ == 15L),
      s"sf0.001 cohorts have 15 distinct users (linear-counting regime): $perType")
  }

  test("faithful HLL goldens hold in BOTH estimator regimes on declared testdata") {
    // goldens from the same independent Python replica of
    // hyperloglog.py:4-38. Two regimes of the estimator:
    //  - linear counting (E <= 2.5m, zero registers remain):
    //    sf0.01 user cohorts, 150 distinct -> 151
    //  - raw harmonic-mean estimate (E > 2.5m = 10240):
    //    sf0.1 event_id cohorts, ~20k distinct each
    val perType01 = Sketches.hllFaithful(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perType01.values.forall(_ == 151L),
      s"sf0.01 cohorts (150 users, linear-counting regime): $perType01")

    val hllUdaf = udaf(new SketchAggs.FaithfulHllAgg(12), Encoders.STRING)
    val raw = graft.sources.Tables.events(spark, "/root/testdata/sf0.1")
      .select(col("event_type"), col("event_id").cast("string").as("k"))
      .groupBy(col("event_type")).agg(hllUdaf(col("k")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val golden = Map("click" -> 19689L, "error" -> 20332L, "purchase" -> 19839L,
                     "signup" -> 20330L, "view" -> 20046L)
    assert(raw == golden, s"raw-regime goldens drifted: $raw vs $golden")
  }

  test("SimHashAgg matches the SQL vote formulation bit-for-bit") {
    // simhashSigs builds signatures as 60 codegen'd vote sums; the
    // mergeable Aggregator is the streaming/custom-agg form of the
    // same sketch — they must never drift.
    val hvs = (0 until 5000).map(i => ("d" + (i % 7), (i * 2654435761L) ^ (i << 13)))
    val df = hvs.toDF("k", "hv")
    val simUdaf = udaf(new SketchAggs.SimHashAgg(60), Encoders.scalaLong)
    val viaAgg = df.groupBy("k").agg(simUdaf(col("hv")).as("sig"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val votes = (0 until 60).map(b =>
      sum(shiftright(col("hv"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"v_$b"))
    val viaSql = df.groupBy("k").agg(votes.head, votes.tail: _*)
      .select(col("k"),
        (0 until 60).map(b => when(col(s"v_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("sig"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaAgg == viaSql)
  }

  test("true DGIM stays within the 50% error bound with logarithmic memory") {
    // adversarial-ish stream: bursty 1s, 10k bits over a 1000-tick window
    val d = new graft.plans.Dgim(1000L)
    val ones = scala.collection.mutable.Queue.empty[Long]
    var err = 0.0
    var checks = 0
    var t = 0L
    val rnd = new scala.util.Random(7)
    while (t < 10000) {
      val bit = if (rnd.nextInt(10) < 3 || (t / 500) % 2 == 0) 1 else 0
      if (bit == 1) ones.enqueue(t)
      d.addBit(t, bit)
      if (t % 97 == 0 && t > 1000) {
        while (ones.nonEmpty && t - ones.head > 1000) ones.dequeue()
        val exact = ones.size
        val est = d.estimate(t)
        if (exact > 0) { err = math.max(err, math.abs(est - exact).toDouble / exact); checks += 1 }
      }
      t += 1
    }
    assert(checks > 50)
    assert(err <= 0.5, s"max relative error $err exceeds the DGIM bound")
    assert(d.bucketCount <= 30, s"bucket count ${d.bucketCount} not logarithmic")
  }

  test("declared DGIM query tracks the exact trailing-hour error count") {
    val est = Sketches.dgimTrue(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact trailing-hour count per type, anchored at each type's max ts
    val e = graft.sources.Tables.events(spark, TestSpark.sf)
    val exact = e.groupBy(col("event_type"))
      .agg(org.apache.spark.sql.functions.max(col("ts").cast("long")).as("mx"))
      .join(e.select(col("event_type"), col("ts").cast("long").as("tsec")), Seq("event_type"))
      .filter(col("tsec") >= col("mx") - 3600 && col("event_type") === "error")
      .count()
    val errEst = est("error")
    assert(est.keys.toSet.contains("error"))
    assert(est.filter(_._1 != "error").values.forall(_ == 0L),
      "non-error cohorts carry zero 1-bits")
    assert(math.abs(errEst - exact).toDouble <= math.max(1.0, 0.5 * exact),
      s"DGIM estimate $errEst vs exact $exact breaches the 50% bound")
  }

  test("stitched sub-window DGIM: hot-key scale path stays within the 50% bound") {
    // same trailing-window contract as dgimTrue, but replayed as
    // |keys| x chunks independent tasks; only the boundary chunk is
    // sketch-estimated, so the error bound is at worst the classic
    // 50% (and usually far tighter — interior chunks are exact)
    val est = Sketches.dgimStitched(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val e = graft.sources.Tables.events(spark, TestSpark.sf)
    val exact = e.groupBy(col("event_type"))
      .agg(org.apache.spark.sql.functions.max(col("ts").cast("long")).as("mx"))
      .join(e.select(col("event_type"), col("ts").cast("long").as("tsec")), Seq("event_type"))
      .filter(col("tsec") >= col("mx") - 3600 && col("event_type") === "error")
      .count()
    assert(est.filter(_._1 != "error").values.forall(_ == 0L),
      "non-error cohorts carry zero 1-bits")
    assert(math.abs(est("error") - exact).toDouble <= math.max(1.0, 0.5 * exact),
      s"stitched estimate ${est("error")} vs exact $exact breaches the 50% bound")
  }

  test("stitched DGIM on a synthetic hot key: bound holds, interior chunks exact") {
    import spark.implicits._
    // one hot key, 20k ticks of bursty bits — the shape where
    // dgimTrue degrades to a single serial task and the stitch is
    // the scale answer. Exact trailing count is known, so the bound
    // check is sharp; with the window edge mid-chunk only ~1/8 of
    // the window is sketch-estimated, so expect far better than 50%.
    val rnd = new scala.util.Random(11)
    val bits = (0L until 20000L).map { t =>
      ("hot", t, t, if (rnd.nextInt(10) < 3 || (t / 500) % 2 == 0) 1 else 0)
    }
    val base = bits.toDF("event_type", "tsec", "event_id", "bit")
    val windowSec = 4000L
    val est = Sketches.dgimStitchedOn(spark, base, windowSec, chunks = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val now = 19999L
    val exact = bits.count { case (_, t, _, b) => b == 1 && t >= now - windowSec }
    assert(math.abs(est("hot") - exact).toDouble <= 0.5 * exact,
      s"stitched ${est("hot")} vs exact $exact breaches the 50% bound")
    // interior chunks are exact: only the boundary chunk is
    // sketched, so the total error is bounded by 50% of ONE chunk's
    // ones (<= chunkLen of them) — assert the much tighter bound
    assert(math.abs(est("hot") - exact).toDouble <= 0.5 * (windowSec / 8.0),
      s"stitched ${est("hot")} vs exact $exact worse than the boundary-chunk bound")
  }
}
