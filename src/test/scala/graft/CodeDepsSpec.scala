package graft

import org.scalatest.funsuite.AnyFunSuite

/** CodeDeps is the grain of the round-15 suite record carry: a wrong
  * closure CARRIES a record past a code change (the unsafe direction),
  * so the spec pins the scanner's reachability semantics on a
  * synthetic source tree.
  */
class CodeDepsSpec extends AnyFunSuite {

  private def mkTree(files: Map[String, String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("codedeps").toString
    files.foreach { case (name, text) =>
      val p = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, text.getBytes("UTF-8"))
    }
    dir
  }

  test("closure is transitive and rootsOf finds the quoted name") {
    val dir = mkTree(Map(
      "a/QueriesFoo.scala" ->
        """object QueriesFoo { val q = Q("q9_thing", OpBar.run _) }""",
      "b/OpBar.scala" ->
        """object OpBar { def run = OpBaz.helper }""",
      "b/OpBaz.scala" ->
        """object OpBaz { def helper = 1 }""",
      "c/Unrelated.scala" ->
        """object Unrelated { def x = 2 }"""))
    val s = CodeDeps.scan(dir)
    val roots = s.rootsOf("q9_thing")
    assert(roots.size == 1 && roots.head.endsWith("QueriesFoo.scala"))
    val cl = s.closureOf(roots)
    assert(cl.exists(_.endsWith("QueriesFoo.scala")))
    assert(cl.exists(_.endsWith("OpBar.scala")), "direct dep")
    assert(cl.exists(_.endsWith("OpBaz.scala")), "transitive dep")
    assert(!cl.exists(_.endsWith("Unrelated.scala")), "no false dep")
  }

  test("fingerprint changes when any closure file changes, and ignores " +
      "files outside the closure") {
    val base = Map(
      "QueriesFoo.scala" ->
        """object QueriesFoo { val q = Q("q9_thing", OpBar.run _) }""",
      "OpBar.scala" -> """object OpBar { def run = 1 }""",
      "Unrelated.scala" -> """object Unrelated { def x = 2 }""")
    // NOTE: paths include the temp dir, so the testable invariants are
    // within-tree: a dependency edit changes the fp, an out-of-closure
    // edit does not.
    val dir = mkTree(base)
    val s1 = CodeDeps.scan(dir)
    val fp1 = s1.fingerprint(s1.rootsOf("q9_thing"), Seq.empty, "salt")
    // out-of-closure edit: same fingerprint
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "Unrelated.scala"),
      """object Unrelated { def x = 3 }""".getBytes("UTF-8"))
    val s2 = CodeDeps.scan(dir)
    val fp2 = s2.fingerprint(s2.rootsOf("q9_thing"), Seq.empty, "salt")
    assert(fp1 == fp2, "edit outside the closure must not rotate")
    // in-closure edit: fingerprint rotates
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "OpBar.scala"),
      """object OpBar { def run = 99 }""".getBytes("UTF-8"))
    val s3 = CodeDeps.scan(dir)
    val fp3 = s3.fingerprint(s3.rootsOf("q9_thing"), Seq.empty, "salt")
    assert(fp1 != fp3, "dependency edit must rotate the fingerprint")
    // salt rotates too (methodology change retires records)
    val fp4 = s3.fingerprint(s3.rootsOf("q9_thing"), Seq.empty, "salt2")
    assert(fp3 != fp4)
  }

  test("the real tree resolves every catalog query to a non-empty root " +
      "set and per-query grain separates unrelated families") {
    val s = CodeDeps.scan("src/main/scala")
    val names = SparkEntry.queries.keys.toSeq
    val unresolved = names.filter(n => s.rootsOf(n).isEmpty)
    assert(unresolved.isEmpty,
      s"queries with no quoted-name root (would fall back to " +
        s"whole-tree fp): $unresolved")
    // spot-check grain: a pure-graph query's closure should not pull in
    // the streaming layer, and vice versa
    val g3 = s.closureOf(s.rootsOf("g3_triangle_count"))
    assert(!g3.exists(_.endsWith("streaming/Streaming.scala")),
      "g3 closure leaked into streaming")
    val st1Roots = s.rootsOf("st1_streaming_daily_stats")
    assert(s.closureOf(st1Roots)
      .exists(_.endsWith("streaming/Streaming.scala")))
  }
}
