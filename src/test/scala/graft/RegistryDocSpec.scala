package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the registry index: `queryDoc` documents exactly the declared
  * registry (no missing, no stale entries), and README.md's generated
  * section equals `RegistryDoc.table` — adding a query without
  * documenting it, or documenting without regenerating the README,
  * fails here with the one command that fixes it. */
class RegistryDocSpec extends AnyFunSuite {

  test("queryDoc covers the registry exactly") {
    val q = SparkEntry.queries.keySet
    val d = SparkEntry.queryDoc.keySet
    assert((q -- d).isEmpty, s"queries missing from queryDoc: ${(q -- d).toSeq.sorted}")
    assert((d -- q).isEmpty, s"stale queryDoc entries: ${(d -- q).toSeq.sorted}")
  }

  // Stale docs REGENERATE here (then still fail once, so the run is
  // red and the rewrite gets noticed and committed) — a new query can
  // no longer ship stale docs past a single `sbt test`, the round-16
  // failure mode where the generator was registered but never re-run.
  private def regen(): Unit =
    try RegistryDoc.main(Array.empty)
    catch { case e: Throwable => info(s"auto-regeneration failed: $e") }

  test("README query index matches the generated table") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val b = readme.indexOf(RegistryDoc.Begin); val e = readme.indexOf(RegistryDoc.End)
    assert(b >= 0 && e > b, "README.md lacks the registry:begin/end markers")
    val section = readme.substring(b + RegistryDoc.Begin.length, e).trim
    if (section != RegistryDoc.table.trim) regen()
    assert(section == RegistryDoc.table.trim,
      "README registry index was stale — it has been REGENERATED in place; " +
        "review `git diff README.md ORACLES.md`, commit, and re-run")
  }

  test("ORACLES.md matches the generated oracle-SQL dump") {
    val oracles = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("ORACLES.md")), "UTF-8")
    if (oracles != RegistryDoc.oracles) regen()
    assert(oracles == RegistryDoc.oracles,
      "ORACLES.md was stale — it has been REGENERATED in place; " +
        "review `git diff README.md ORACLES.md`, commit, and re-run")
  }
}
