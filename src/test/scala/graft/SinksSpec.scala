package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

/** Write-path round-trip pins that the oracle can't express: the CSV
  * dialect must carry hostile text verbatim in BOTH directions (the
  * sf-corpus text is benign, so only a constructed fixture exercises
  * quoting, embedded delimiters, and the writer's default whitespace
  * trimming). */
class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("CSV dialect round-trips delimiter/quote/whitespace-hostile text verbatim") {
    val hostile = Seq(
      "plain",
      "comma, separated, values",
      "a \"quoted\" claim",
      "\"leads with a quote",
      "ends with a quote\"",
      "\"\"doubled quotes\"\"",
      "  leading and trailing spaces  ",
      "\ttab\tseparated\t",
      "unicode: ñandú 🦗 中文",
      "semicolon; pipe| mix: , \" '")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        hostile.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }, 2),
      schema)
    val out = java.nio.file.Files.createTempDirectory("graft_csv_hostile").toString
    df.write.mode("overwrite").options(Sinks.csvDialect).csv(out)
    val back = spark.read.schema(schema).options(Sinks.csvDialect).csv(out)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    hostile.zipWithIndex.foreach { case (t, i) =>
      assert(back(i.toLong) == t, s"text $i mutated through the CSV dialect")
    }
    // and the files are RFC-4180: a quoted field escapes quotes by
    // doubling them, not with a backslash
    val raw = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".csv"))
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines())
    assert(raw.exists(_.contains("\"a \"\"quoted\"\" claim\"")),
      s"expected doubled-quote escaping in:\n${raw.mkString("\n")}")
  }

  test("sink_csv rollup equals the same rollup on the original table") {
    val expected = graft.sources.Tables.documents(spark, TestSpark.sf)
      .filter(col("n_chars") > 200 && length(col("text")) === col("n_chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = SparkEntry.queries("sink_csv")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
