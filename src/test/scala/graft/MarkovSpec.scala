package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Markov

/** Golden-chain tests for the pure-Scala Tarjan + DTMC classifier
  * (MarkovChainAnalysis.py:24-161 semantics). */
class MarkovSpec extends AnyFunSuite {

  private def classes(states: Seq[String], p: Array[Array[Double]]) =
    Markov.classify(states.toIndexedSeq, p).map(c => c.state -> c).toMap

  test("two-state cycle is recurrent with period 2") {
    val c = classes(Seq("a", "b"), Array(Array(0, 1.0), Array(1.0, 0)))
    assert(c("a").is_recurrent && c("b").is_recurrent)
    assert(c("a").period == 2 && c("b").period == 2)
    assert(c("a").dtmc_class == "recurrent-periodic")
  }

  test("self-loop state is recurrent-aperiodic; feeder is transient") {
    // a -> b, b -> b: a cannot return (singleton SCC, no self-loop)
    val c = classes(Seq("a", "b"), Array(Array(0, 1.0), Array(0, 1.0)))
    assert(!c("a").is_recurrent && c("a").dtmc_class == "transient")
    assert(c("b").is_recurrent && c("b").period == 1)
    assert(c("b").dtmc_class == "recurrent-aperiodic")
  }

  test("three-cycle has period 3") {
    val p = Array(Array(0, 1.0, 0), Array(0, 0, 1.0), Array(1.0, 0, 0))
    val c = classes(Seq("a", "b", "c"), p)
    assert(c.values.forall(_.period == 3))
    assert(c.values.forall(_.dtmc_class == "recurrent-periodic"))
  }

  test("cycle plus self-loop becomes aperiodic (gcd(1,2)=1)") {
    val p = Array(Array(0.5, 0.5), Array(1.0, 0))
    val c = classes(Seq("a", "b"), p)
    assert(c("a").period == 1 && c("b").is_recurrent)
  }

  test("tarjan finds the expected SCC structure") {
    // 0 <-> 1, 2 alone (reachable from 1, no way back)
    val adj = Array(List(1), List(0, 2), List.empty[Int])
    val sccs = Markov.tarjanScc(3, adj).map(_.sorted).sortBy(_.head)
    assert(sccs == List(List(0, 1), List(2)))
  }

  test("gcd") {
    assert(Markov.gcd(12, 18) == 6)
    assert(Markov.gcd(7, 13) == 1)
  }
}
