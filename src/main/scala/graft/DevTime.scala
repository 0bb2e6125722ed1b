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
    val sampler = new Thread(() => {
      while (true) {
        Thread.sleep(5000)
        val stacks = Thread.getAllStackTraces
        val lines = new scala.collection.mutable.ArrayBuffer[String]()
        stacks.forEach { (t, st) =>
          if (t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
              !t.getName.contains("sampler")) {
            lines += s"${t.getName}: ${st.take(5).mkString(" <- ")}"
          }
        }
        println("  SAMPLE ---- runnable=" + lines.size)
        lines.take(8).foreach(l => println(s"  SAMPLE ${l.take(300)}"))
      }
    })
    sampler.setDaemon(true)
    if (sys.env.contains("DEVTIME_SAMPLE")) sampler.start()
    rest.drop(1).foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"TIMING $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
