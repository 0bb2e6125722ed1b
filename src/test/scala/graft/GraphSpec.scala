package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Geo
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("haversine: zero for identical points, known equator arc, symmetric") {
    val df = Seq(
      (0.0, 0.0, 0.0, 0.0),      // same point
      (0.0, 0.0, 0.0, 1.0),      // 1 degree of longitude at the equator
      (48.8566, 2.3522, 40.7128, -74.0060) // Paris -> New York
    ).toDF("lat1", "lon1", "lat2", "lon2")
      .withColumn("d", Geo.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
      .withColumn("dRev", Geo.haversineKm(col("lat2"), col("lon2"), col("lat1"), col("lon1")))
    val rows = df.collect()
    assert(rows(0).getDouble(4) == 0.0)
    assert(math.abs(rows(1).getDouble(4) - 111.19) < 0.1)   // 2*pi*R/360
    assert(math.abs(rows(2).getDouble(4) - 5837.0) < 30.0)  // published ~5837 km
    rows.foreach(r => assert(math.abs(r.getDouble(4) - r.getDouble(5)) < 1e-9))
  }

  test("graph nodes: one per event_type with valid coordinate ranges") {
    val nodes = Graph.graphNodes(spark, TestSpark.sf).collect()
    assert(nodes.map(_.getString(0)).distinct.length == nodes.length)
    nodes.foreach { r =>
      assert(r.getDouble(1) >= -90 && r.getDouble(1) <= 90)
      assert(r.getDouble(2) >= -180 && r.getDouble(2) <= 180)
    }
  }

  test("walk frequencies are deterministic and consistent") {
    val run1 = Graph.walkFreq(spark, TestSpark.sf).collect()
    val run2 = Graph.walkFreq(spark, TestSpark.sf).collect()
    assert(run1.map(_.toString).sameElements(run2.map(_.toString)),
      "seeded walks must be reproducible")
    val pcts = run1.map(_.getDouble(2))
    assert(math.abs(pcts.sum - 1.0) < 1e-3)
    assert(run1.map(_.getLong(1)).forall(_ > 0))
  }

  test("markov classes cover every observed state with a coherent classification") {
    val rows = Graph.markovClasses(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rec, cls) = (r.getBoolean(1), r.getString(3))
      if (!rec) assert(cls == "transient")
      else assert(cls == "recurrent-aperiodic" || cls == "recurrent-periodic")
      assert(r.getLong(2) >= 1)
    }
  }

  test("transition matrix rows are row-stochastic") {
    val df = Graph.transitionMatrix(spark, TestSpark.sf)
    val pCols = df.columns.filter(_.startsWith("p_"))
    df.collect().foreach { r =>
      val s = pCols.indices.map(i => r.getDouble(i + 1)).sum
      assert(math.abs(s - 1.0) < 1e-3, s"row ${r.getString(0)} sums to $s")
    }
  }

  test("connected components: path graph converges in O(log n) rounds via pointer jumping") {
    import spark.implicits._
    // a 64-node path is the worst case for plain hash-min label
    // propagation (needs 63 rounds); pointer jumping must close it
    // well inside maxIter = 10 (~log2 64 + constant). Plus a separate
    // triangle and an isolated node to pin multi-component labeling.
    val nodes = ((0L until 64L) ++ Seq(100L, 101L, 102L, 200L)).toDF("id")
    val edges = ((0L until 63L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (102L, 100L))).toDF("src", "dst")
    // driverCutoff = 0 forces the distributed min-propagation rounds
    // (the at-scale path); the default exercises the driver-side
    // union-find fast path — both must produce identical labels
    for (cutoff <- Seq(0, 100000)) {
      val out = Graph.connectedComponents(nodes, edges, maxIter = 10,
        driverCutoff = cutoff).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out.size == 68)
      for (i <- 0L until 64L) assert(out(i) == 0L, s"path node $i -> ${out(i)} (cutoff $cutoff)")
      for (i <- Seq(100L, 101L, 102L)) assert(out(i) == 100L)
      assert(out(200L) == 200L, "isolated node keeps its own label")
    }
  }

  test("connected components: null edge endpoints are dropped, id column found by name") {
    import spark.implicits._
    // both paths must treat a malformed (null-endpoint) edge as
    // absent — the distributed join drops it naturally; the
    // union-find fast path once NPE'd in the Ordering instead — and
    // the id type must come from the `id` column even when it is not
    // the frame's first column
    val nodes = Seq(("x", 1L), ("x", 2L), ("x", 3L)).toDF("tag", "id")
    val edges = Seq((Some(1L), Some(2L)), (Some(2L), None), (None, Some(3L)))
      .toDF("src", "dst")
    for (cutoff <- Seq(0, 100000)) {
      val out = Graph.connectedComponents(nodes, edges,
        maxIter = 10, driverCutoff = cutoff).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 3L),
        s"cutoff $cutoff: $out")
    }
  }
}
