package graft.operators

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Central `localCheckpoint` wrapper for the pipeline working sets.
  *
  * Checkpointed blocks default to SERIALIZED storage
  * (MEMORY_AND_DISK_SER) instead of `localCheckpoint()`'s
  * deserialized MEMORY_AND_DISK: a deserialized block's size is
  * measured by `SizeEstimator` walking a sample of the stored object
  * graph — round-9 stack profiles showed that walk as a top-5 frame
  * across the checkpoint-heavy llm queries — while a serialized
  * block's size is just its byte length, and UnsafeRow serialization
  * is a buffer copy. The round-9 A/B on the five most CPU-expensive
  * queries (DevTime, warm runs, sf0.1) measured the serialized form
  * cheaper on every one: llm_tfidf_terms 8.0 → 3.9 CPU-s, llm_curate
  * 13.9 → 8.9, llm_dedup_near 6.8 → 5.1, llm_dedup_clusters
  * 8.6 → 6.9, llm_inverted_index level.
  *
  * `spark.graft.ckpt.deserialized=true` restores the engine default
  * (the escape hatch if a future workload rereads a checkpoint so
  * often that per-read deserialization dominates the one-time
  * SizeEstimator walk). */
private[graft] object Ckpt {
  implicit class CkptOps(private val df: DataFrame) extends AnyVal {
    def ckptLocal(): DataFrame = {
      val deser = df.sparkSession.conf
        .getOption("spark.graft.ckpt.deserialized").contains("true")
      val level =
        if (deser) StorageLevel.MEMORY_AND_DISK
        else StorageLevel.MEMORY_AND_DISK_SER
      df.localCheckpoint(true, level)
    }
  }

  /** Materialize two INDEPENDENT eager subtrees concurrently and wait
    * for both. Spark schedules jobs submitted from separate driver
    * threads side by side (the same mechanism broadcast exchanges use
    * to materialize asynchronously), so two pipelines that would
    * otherwise run their checkpoint barriers back to back overlap
    * their cluster utilization instead — on a 1000-executor cluster
    * the second subtree's scan runs while the first's shuffle drains.
    * `a` runs on a pool thread with the session re-attached (Spark's
    * active-session thread-local does not cross threads); `b` runs on
    * the caller's thread, so no extra thread is parked waiting. Only
    * pass subtrees where neither side reads the other's result; an
    * exception on either side propagates to the caller — but only
    * AFTER both sides have finished, so a failure in `b` never leaves
    * `a`'s jobs running as orphans behind whatever the caller (e.g. a
    * per-query try/catch loop) does next. The unbounded wait is that
    * same guarantee, not an oversight: a bounded wait that abandons a
    * hung `a` would orphan its jobs behind the caller; a hang stays
    * visible in the Spark UI instead of being masked by a timeout.
    *
    * Thread hygiene (round-9 ADVICE): the pool thread is a REUSED
    * global-EC worker, so `a` runs with the caller's active session
    * AND scheduling-relevant local properties (job group/description,
    * interrupt-on-cancel, scheduler pool) copied in, and everything
    * restored after — a stale session or job group must not leak into
    * whatever unrelated task the pool runs next (multi-session JVMs),
    * and `a`'s jobs must land in the caller's job group so a caller-
    * side cancelJobGroup reaches them. */
  private[graft] def par2[A, B](spark: SparkSession)(a: => A, b: => B): (A, B) = {
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.util.Try
    val sc = spark.sparkContext
    val propKeys = Seq("spark.jobGroup.id", "spark.job.description",
      "spark.job.interruptOnCancel", "spark.scheduler.pool")
    val callerProps = propKeys.map(k => k -> sc.getLocalProperty(k))
    val fa = Future {
      val priorSession = SparkSession.getActiveSession
      val priorProps = propKeys.map(k => k -> sc.getLocalProperty(k))
      SparkSession.setActiveSession(spark)
      callerProps.foreach { case (k, v) => sc.setLocalProperty(k, v) }
      try a
      finally {
        priorProps.foreach { case (k, v) => sc.setLocalProperty(k, v) }
        priorSession match {
          case Some(s) => SparkSession.setActiveSession(s)
          case None    => SparkSession.clearActiveSession()
        }
      }
    }
    val bv = Try(b)
    val av = Try(Await.result(fa, Duration.Inf))
    (av.get, bv.get)
  }
}
