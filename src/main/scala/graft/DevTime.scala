package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries one at a time in a fresh session
  * (isolates per-query cost from bench-order JVM contamination).
  * Usage: sbt "runMain graft.DevTime <sfDir> <query> [query ...]"
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val (confs, rest) = args.partition(_.contains("="))
    val sfDir = rest.head
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // JVM (not ICU) case mappings: Unicode-correct either way, and
      // the ICU path was the top CPU frame in round-7 stack profiles
      // of the shingle/tokenize pipelines (execBinaryICU per row)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      // never bypass-merge shuffle: bypass opens one file per reduce
      // partition per map task (32x32 per exchange); the unsafe/sort
      // writers open one file per map task
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    confs.foreach { c => val Array(k, v) = c.split("=", 2); builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for (s <- si.submissionTime; c <- si.completionTime) yield c - s
        println(f"  STAGE ${si.stageId}%4d ${ms.getOrElse(-1L)}%7d ms " +
          f"tasks=${si.numTasks}%4d  ${si.name.take(80)}")
      }
    })
    // DEVTIME_SAMPLE=1 enables sampling; DEVTIME_SAMPLE_MS overrides
    // the interval (default 5000 — drop to ~200 for sub-5 s queries,
    // or one sample per run tells you nothing)
    val sampleMs = sys.env.getOrElse("DEVTIME_SAMPLE_MS", "5000").toLong
    val sampler = new Thread(() => {
      while (true) {
        Thread.sleep(sampleMs)
        val stacks = Thread.getAllStackTraces
        val lines = new scala.collection.mutable.ArrayBuffer[String]()
        stacks.forEach { (t, st) =>
          if (t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
              !t.getName.contains("sampler") &&
              t.getName.startsWith("Executor task launch")) {
            // top APPLICATION frame beats 5 raw frames for aggregation
            lines += st.take(12).mkString(" <- ")
          }
        }
        println("  SAMPLE ---- runnable=" + lines.size)
        lines.take(16).foreach(l => println(s"  SAMPLE ${l.take(400)}"))
      }
    })
    sampler.setDaemon(true)
    if (sys.env.contains("DEVTIME_SAMPLE")) sampler.start()
    // executor CPU per query (same listener+settle pattern as Bench):
    // CPU is the number to compare across A/B runs on this host —
    // wall swings 10-50x under the VM's throttling, CPU only
    // stretches with frequency scaling
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) cpuNs.addAndGet(m.executorCpuTime)
      }
    })
    def settle(): Long = {
      var prev = -1L; var cur = cpuNs.get(); var spins = 0
      while (cur != prev && spins < 40) { Thread.sleep(50); prev = cur; cur = cpuNs.get(); spins += 1 }
      cur
    }
    rest.drop(1).foreach { n =>
      val cpu0 = settle()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"TIMING $n $wall%.2f s  cpu ${(settle() - cpu0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
