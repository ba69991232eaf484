package graft

/** Source-dependency scanner backing PER-QUERY (and per-probe) record
  * fingerprints in [[Bench]] (VERDICT r14 #1: the suite's mandatory
  * floor outgrew the bench budget because every run re-measured all
  * ~300 queries; records can only carry safely if "the code this query
  * runs" is fingerprinted at finer grain than the whole tree).
  *
  * Mechanism: scan `src/main/scala` once per run; extract every
  * top-level-ish `object`/`class`/`trait` name; build a file→file
  * reference graph (file A depends on file B iff A's text mentions a
  * name B defines, word-bounded); take the transitive closure. A
  * query's root files are those containing its QUOTED name literal
  * (catalog entries always quote their name in `Q("name", ...)`), so
  * the fingerprint covers the defining file plus every graft source it
  * can reach.
  *
  * The scan deliberately OVER-approximates (a name mentioned in a
  * comment or shared by two files pulls both in): a too-big closure
  * only retires a record early and re-measures — never carries a stale
  * number past a code change, which is the direction that matters.
  * Under-approximation is bounded by the repo's style (operators are
  * invoked `Object.method`, imports name the object), and the
  * whole-tree fingerprint remains the fallback when a query's name
  * literal is not found anywhere.
  */
object CodeDeps {

  final case class Scan(files: Seq[java.io.File],
      bytes: Map[String, Array[Byte]],
      closure: Map[String, Set[String]]) {

    /** Files whose text contains the quoted literal `"name"`,
      * excluding harness/tool files (anything defining a `main`):
      * Explain/Bench/Verify quote catalog names they do not DEFINE,
      * and their closures reach the whole tree via SparkEntry — which
      * would collapse every per-query fingerprint back to whole-tree
      * grain.
      */
    def rootsOf(quotedName: String): Seq[String] = {
      val needle = "\"" + quotedName + "\""
      files.map(_.getPath).filter { p =>
        val t = new String(bytes(p), "UTF-8")
        t.contains(needle) && !t.contains("def main(args: Array[String])")
      }
    }

    /** Transitive dependency closure over the given root paths. */
    def closureOf(roots: Seq[String]): Set[String] =
      roots.flatMap(r => closure.getOrElse(r, Set(r))).toSet

    /** Fingerprint of the closure of `roots` plus `extraFiles`, salted
      * with `salt` (the measurement-methodology constant — a
      * methodology change retires records like a code change).
      * Deterministic: paths are sorted before hashing.
      */
    def fingerprint(roots: Seq[String], extraFiles: Seq[String],
        salt: String): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.update(salt.getBytes("UTF-8"))
      val paths = (closureOf(roots) ++ extraFiles.filter(p =>
        new java.io.File(p).isFile)).toSeq.sorted
      paths.foreach { p =>
        md.update(p.getBytes("UTF-8"))
        md.update(bytes.getOrElse(p,
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))))
      }
      md.digest().map("%02x".format(_)).mkString.take(12)
    }
  }

  private val defRe =
    """(?m)^\s*(?:final\s+|private(?:\[\w+\])?\s+|implicit\s+|sealed\s+|abstract\s+)*(?:case\s+)?(?:object|class|trait)\s+([A-Za-z_]\w*)""".r

  /** Strip comments before REFERENCE scanning: this repo's scaladoc
    * cross-references operators by name in prose ("the st8 catalog
    * query", "Structured Streaming"), which would cascade every
    * closure to ~the whole tree and defeat the per-query grain. Line
    * comments are stripped only when the `//` is not part of a URL
    * literal (`://`). Root detection (rootsOf) still scans RAW text —
    * a name quoted anywhere only widens a root set, the safe
    * direction.
    */
  private def stripComments(t: String): String = {
    val noBlock = """(?s)/\*.*?\*/""".r.replaceAllIn(t, " ")
    noBlock.linesIterator.map { l =>
      val i = l.indexOf("//")
      if (i > 0 && l.charAt(i - 1) == ':') l // URL inside a literal
      else if (i >= 0) l.substring(0, i)
      else l
    }.mkString("\n")
  }

  def scan(root: String = "src/main/scala"): Scan = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .toSeq.sortBy(_.getPath).flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f)
      else Seq.empty
    val files = walk(new java.io.File(root))
    val bytes: Map[String, Array[Byte]] = files.map(f =>
      f.getPath -> java.nio.file.Files.readAllBytes(f.toPath)).toMap
    val texts: Map[String, String] =
      bytes.map { case (p, b) => p -> new String(b, "UTF-8") }
    // name -> defining files (a name defined in several files pulls all
    // of them in — over-approximation, safe direction)
    val defs: Map[String, Seq[String]] = files
      .flatMap { f =>
        defRe.findAllMatchIn(texts(f.getPath)).map(_.group(1))
          .toSeq.distinct.map(_ -> f.getPath)
      }
      .groupBy(_._1).map { case (n, fs) => n -> fs.map(_._2).distinct }
    // direct references: word-bounded mention of a defined name in the
    // comment-stripped text
    val codeTexts: Map[String, String] =
      texts.map { case (p, t) => p -> stripComments(t) }
    val direct: Map[String, Set[String]] = files.map { f =>
      val p = f.getPath
      val t = codeTexts(p)
      val refs = defs.iterator.flatMap { case (name, where) =>
        if (!t.contains(name)) Iterator.empty
        else {
          val re = ("""\b""" + java.util.regex.Pattern.quote(name) +
            """\b""").r
          if (re.findFirstIn(t).isDefined) where.iterator else Iterator.empty
        }
      }.toSet
      p -> (refs + p)
    }.toMap
    // transitive closure (fixpoint; the graph is ~120 nodes)
    val closure = scala.collection.mutable.Map[String, Set[String]]() ++
      direct
    var changed = true
    while (changed) {
      changed = false
      closure.keys.foreach { p =>
        val cur = closure(p)
        val next = cur ++ cur.flatMap(q => closure.getOrElse(q, Set(q)))
        if (next.size != cur.size) { closure(p) = next; changed = true }
      }
    }
    Scan(files, bytes, closure.toMap)
  }
}
