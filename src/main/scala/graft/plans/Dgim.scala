package graft.plans

import scala.collection.mutable

/** True DGIM (Datar-Gionis-Indyk-Motwani) windowed bit counting.
  *
  * The reference's dgim.py is NOT real DGIM — it stores every 1-bit
  * as its own (timestamp, 1) bucket with no exponential merging
  * (dgim.py:12-16), so its memory is O(ones-in-window) and its
  * "estimate" is the exact count minus half the oldest bit
  * (SURVEY §2.4 A9). This is the genuine algorithm the reference
  * names: at most `maxPerSize` (=2) buckets per power-of-two size,
  * oldest pair merged on overflow — O(log² W) memory regardless of
  * stream length, estimate error ≤ 50 % of the true count (the
  * classic DGIM bound), which is what "approximate bit-stream
  * counting" has to mean at 100 TB.
  *
  * Single-stream, order-dependent by nature: feed bits in event-time
  * order per key (sortWithinPartitions upstream).
  */
class Dgim(windowSize: Long, maxPerSize: Int = 2) {

  /** (newestTimestamp, size); index 0 = newest bucket. */
  private val buckets = mutable.ArrayDeque.empty[(Long, Long)]

  def addBit(ts: Long, bit: Int): Unit = {
    expire(ts)
    if (bit == 1) {
      buckets.prepend((ts, 1L))
      var size = 1L
      var merging = true
      while (merging) {
        val sameSize = buckets.iterator.zipWithIndex.filter(_._1._2 == size).map(_._2).toSeq
        if (sameSize.length > maxPerSize) {
          // merge the two OLDEST buckets of this size; the merged
          // bucket keeps the newer of the two timestamps
          val newer = sameSize(sameSize.length - 2)
          val older = sameSize(sameSize.length - 1)
          val merged = (buckets(newer)._1, size * 2)
          buckets.remove(older)
          buckets.remove(newer)
          buckets.insert(newer, merged)
          size *= 2
        } else merging = false
      }
    }
  }

  private def expire(now: Long): Unit =
    while (buckets.nonEmpty && now - buckets.last._1 > windowSize)
      buckets.removeLast()

  /** DGIM estimate at time `now`: full size of every bucket except
    * the oldest, which contributes half. */
  def estimate(now: Long): Long = {
    expire(now)
    if (buckets.isEmpty) 0L
    // all but the oldest in full, plus half the oldest (floor —
    // matching the reference's int(estimate) truncation, dgim.py:35)
    else buckets.iterator.map(_._2).sum - buckets.last._2 + buckets.last._2 / 2
  }

  /** Memory guarantee hook for tests: bucket count is O(log² W). */
  def bucketCount: Int = buckets.length

  /** Sketch state as plain data — (newestTimestamp, size) newest
    * first — so a streaming job can park it in a state store between
    * micro-batches (Streaming.dgimCounts) and restore with
    * `loadBuckets`. O(log² W) values however long the stream. */
  def exportBuckets: Seq[(Long, Long)] = buckets.toSeq

  def loadBuckets(bs: Seq[(Long, Long)]): Unit = {
    buckets.clear()
    buckets.appendAll(bs)
  }
}
