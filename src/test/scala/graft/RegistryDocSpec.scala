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

  // Stale docs regenerate ONLY when opted in (GRAFT_REGEN_DOCS=1):
  // the default `sbt test` run never writes to the checkout — a CI
  // or read-only tree gets the actionable failure, not a surprise
  // mutation, and a stale-doc rewrite can't slip into a commit
  // unreviewed. With the flag set the run still fails once so the
  // regenerated diff gets looked at before committing.
  private val RegenOptIn = sys.env.get("GRAFT_REGEN_DOCS").contains("1")
  private def regen(): Unit =
    if (RegenOptIn)
      try RegistryDoc.main(Array.empty)
      catch { case e: Throwable => info(s"auto-regeneration failed: $e") }

  private val StaleHint =
    " was stale — run `sbt \"runMain graft.RegistryDoc\"` (or re-run tests " +
      "with GRAFT_REGEN_DOCS=1 to regenerate in place), review " +
      "`git diff README.md ORACLES.md`, commit, and re-run"

  test("README query index matches the generated table") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val b = readme.indexOf(RegistryDoc.Begin); val e = readme.indexOf(RegistryDoc.End)
    assert(b >= 0 && e > b, "README.md lacks the registry:begin/end markers")
    val section = readme.substring(b + RegistryDoc.Begin.length, e).trim
    if (section != RegistryDoc.table.trim) regen()
    assert(section == RegistryDoc.table.trim, "README registry index" + StaleHint)
  }

  test("ORACLES.md matches the generated oracle-SQL dump") {
    val oracles = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("ORACLES.md")), "UTF-8")
    if (oracles != RegistryDoc.oracles) regen()
    assert(oracles == RegistryDoc.oracles, "ORACLES.md" + StaleHint)
  }
}
