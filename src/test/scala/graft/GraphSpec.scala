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
}
