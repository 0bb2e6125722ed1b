package graft.plans

import scala.collection.mutable

/** Markov-chain structural analysis in pure Scala, run driver-side on
  * a collected transition matrix (SURVEY §2.8 [D]: the state space is
  * the categorical event-type domain, bounded and tiny — |S|² numbers
  * cross the driver, never row data).
  *
  * Mirrors /root/reference/model/MarkovChainAnalysis.py:
  *  - Tarjan SCC over the positive-probability adjacency (:24-79);
  *  - recurrent = in an SCC of size > 1 or with a self-loop (:90-95);
  *  - period via the BFS-level cycle-length GCD (:119-146). One
  *    deliberate delta: the reference computes the period once per
  *    SCC from its first-popped element (:104) — we compute it per
  *    state with the same BFS formula, which is representative-order
  *    independent (and equal across an SCC for true DTMC periods),
  *    so results don't depend on Tarjan's traversal order.
  */
object Markov {

  case class StateClass(state: String, is_recurrent: Boolean, period: Long, dtmc_class: String)

  /** Tarjan's strongly-connected components (iterative DFS).
    * `adj(i)` lists the positive-probability successors of state i. */
  def tarjanScc(n: Int, adj: Array[List[Int]]): List[List[Int]] = {
    val ids = Array.fill(n)(-1)
    val low = Array.fill(n)(0)
    val onStack = Array.fill(n)(false)
    val stack = mutable.Stack[Int]()
    var id = 0
    var sccs = List.empty[List[Int]]

    // explicit DFS frames: (node, next-child index)
    for (root <- 0 until n if ids(root) == -1) {
      val frames = mutable.Stack[(Int, Int)]((root, 0))
      while (frames.nonEmpty) {
        val (at, ci) = frames.pop()
        if (ci == 0) {
          ids(at) = id; low(at) = id; id += 1
          stack.push(at); onStack(at) = true
        }
        val children = adj(at)
        if (ci < children.length) {
          frames.push((at, ci + 1))
          val to = children(ci)
          if (ids(to) == -1) frames.push((to, 0))
          else if (onStack(to)) low(at) = math.min(low(at), ids(to))
        } else {
          if (frames.nonEmpty) {
            val parent = frames.top._1
            low(parent) = math.min(low(parent), low(at))
          }
          if (ids(at) == low(at)) {
            var scc = List.empty[Int]
            var done = false
            while (!done) {
              val node = stack.pop()
              onStack(node) = false
              scc ::= node
              if (node == at) done = true
            }
            sccs ::= scc
          }
        }
      }
    }
    sccs.reverse
  }

  /** Period of `start` by the reference's BFS-cycle-GCD
    * (MarkovChainAnalysis.py:119-146): BFS levels are shortest
    * distances; every edge back into `start` closes a cycle of
    * length dist+1; the period is the GCD of those lengths (1 if no
    * cycle returns). */
  def bfsPeriod(n: Int, adj: Array[List[Int]], start: Int): Long = {
    val dist = Array.fill(n)(-1)
    dist(start) = 0
    val q = mutable.Queue(start)
    val periods = mutable.Set.empty[Long]
    while (q.nonEmpty) {
      val s = q.dequeue()
      for (t <- adj(s)) {
        if (t == start) periods += (dist(s) + 1).toLong
        else if (dist(t) == -1) { dist(t) = dist(s) + 1; q.enqueue(t) }
      }
    }
    if (periods.isEmpty) 1L else periods.reduce(gcd)
  }

  @annotation.tailrec
  def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** Full DTMC classification of every state. `p` is row-stochastic
    * over `states` (zero rows allowed — absorbing/unseen states). */
  def classify(states: IndexedSeq[String], p: Array[Array[Double]]): Seq[StateClass] = {
    val n = states.length
    val adj = Array.tabulate(n)(i => (0 until n).filter(j => p(i)(j) > 0).toList)
    val sccOf = new Array[Int](n)
    val sccs = tarjanScc(n, adj)
    for ((scc, k) <- sccs.zipWithIndex; s <- scc) sccOf(s) = k
    val sccSize = sccs.map(_.length).toArray

    (0 until n).map { s =>
      val recurrent = sccSize(sccOf(s)) > 1 || p(s)(s) > 0
      val per = bfsPeriod(n, adj, s)
      val cls =
        if (!recurrent) "transient"
        else if (per == 1L) "recurrent-aperiodic"
        else "recurrent-periodic"
      StateClass(states(s), recurrent, per, cls)
    }
  }
}
