ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "simulacion_ecosistemaspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forward forked-run output raw to stdout (no "[info] " prefix) so the
// driver can parse the single-line JSON metrics that Bench prints.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Test / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Suites share one SparkSession in the forked test JVM — run them
// sequentially so streaming queries don't race the shared context.
Test / parallelExecution := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Whole-stage codegen emits one Janino class per stage; a long
  // bench run (50+ queries in one JVM) overflows the default 240 MB
  // JIT code cache, and the resulting silent flush/recompile thrash
  // makes later queries run 10-50x slower (measured in round 3).
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("GRAFT_JVM_LOG").map(f =>
  s"-Xlog:gc*,safepoint*:file=$f:time,uptime").toSeq ++
  // Forward engine conf knobs into the FORKED run JVM (sbt -D lands
  // in the sbt JVM only): GRAFT_CONF="k=v;k2=v2" becomes -Dk=v ...;
  // Spark's session builder absorbs spark.* system properties, so
  // e.g. GRAFT_CONF=spark.graft.kernels.enabled=false runs a whole
  // Verify/Bench on the fallback formulations (tools/sf1_sweep.sh).
  sys.env.get("GRAFT_CONF").toSeq.flatMap(_.split(';')).filter(_.nonEmpty).map("-D" + _)
