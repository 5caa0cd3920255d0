package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Round-artifact discipline gates (the r10 process failure: emb6+sim7
  * landed AFTER the artifacts were regenerated, so the plan audit and
  * sweep logs silently didn't cover the round's last two queries).
  * These checks make "every registered query appears in the committed
  * artifacts" a compile-adjacent assert instead of a checklist item. */
class ArtifactsSpec extends AnyFunSuite {

  /** The artifacts live at the REPO ROOT, not wherever the test JVM was
    * launched: walk up from user.dir to the nearest directory holding
    * build.sbt so a forked-JVM or IDE run (different CWD) still reads the
    * committed artifacts instead of dying on FileNotFoundException. */
  private val repoRoot: java.nio.file.Path = {
    var d = java.nio.file.Paths.get(sys.props("user.dir")).toAbsolutePath
    while (d != null && !java.nio.file.Files.exists(d.resolve("build.sbt")))
      d = d.getParent
    require(d != null,
      s"no build.sbt above ${sys.props("user.dir")} — run tests from inside the repo")
    d
  }

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(repoRoot.resolve(p)),
      java.nio.charset.StandardCharsets.UTF_8)

  test("PLANS.md has a row for every registered query") {
    val plans = read("PLANS.md")
    val missing = graft.SparkEntry.all.map(_.name)
      .filterNot(n => plans.contains(s"| $n "))
    assert(missing.isEmpty,
      s"queries missing from PLANS.md (regenerate: runMain graft.tools.PlanAudit " +
        s"/root/testdata/sf0.001 --md): ${missing.mkString(", ")}")
  }

  test("bench_full.json has a timing for every registered query") {
    val bench = read("bench_full.json")
    val missing = graft.SparkEntry.all.map(_.name)
      .filterNot(n => bench.contains("\"" + n + "\":"))
    assert(missing.isEmpty,
      s"queries missing from bench_full.json (regenerate: runMain graft.Bench " +
        s"at sf0.1): ${missing.mkString(", ")}")
  }
}
