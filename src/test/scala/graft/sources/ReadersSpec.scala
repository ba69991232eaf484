package graft.sources

import java.nio.file.Files

import graft.SparkSpecBase

class ReadersSpec extends SparkSpecBase {

  test("splitCsvHeader: quoted commas, doubled quotes, BOM strip") {
    assert(Readers.splitCsvHeader("a,b,c").toSeq === Seq("a", "b", "c"))
    assert(Readers.splitCsvHeader("\"price, usd\",name").toSeq ===
      Seq("price, usd", "name"))
    assert(Readers.splitCsvHeader("\"say \"\"hi\"\"\",x").toSeq ===
      Seq("say \"hi\"", "x"))
    assert(Readers.splitCsvHeader("\uFEFFchain,event_id").toSeq ===
      Seq("chain", "event_id"))
    assert(Readers.splitCsvHeader(" padded , cols ").toSeq ===
      Seq("padded", "cols"))
  }

  test("readCsvUnionByName: quoted header comma yields one column, " +
      "BOM does not leak into the first name") {
    val dir = Files.createTempDirectory("graft_readers").toString
    val f1 = s"$dir/a.csv"
    Files.writeString(java.nio.file.Paths.get(f1),
      "\uFEFF\"price, usd\",name\n1.5,x\n")
    val df = Readers.readCsvUnionByName(spark, Seq(f1))
    assert(df.columns.toSeq === Seq("price, usd", "name"))
    assert(df.count() === 1)
  }

  test("splitCsvHeader inverts RFC-4180 rendering for arbitrary names") {
    // property-style: render any field list per RFC-4180 (quote when the
    // name holds a comma/quote/outer space, double the quotes), then the
    // split must return exactly the original names
    def render(fields: Seq[String]): String =
      fields.map { f =>
        if (f.exists(c => c == ',' || c == '"') || f != f.trim)
          "\"" + f.replace("\"", "\"\"") + "\""
        else f
      }.mkString(",")
    val rnd = new scala.util.Random(11)
    val alphabet = "abzXY901 ,\"._-"
    for (_ <- 1 to 200) {
      val fields = (1 to 1 + rnd.nextInt(8)).map { _ =>
        val raw = (1 to 1 + rnd.nextInt(10))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        raw.trim match { case "" => "x"; case t => t } // split() trims
      }
      val line = render(fields)
      assert(Readers.splitCsvHeader(line).toSeq === fields,
        s"header line: <$line>")
    }
  }

  test("readCsvUnionByName: empty header fails with a clear message") {
    val dir = Files.createTempDirectory("graft_readers2").toString
    val f = s"$dir/empty.csv"
    Files.writeString(java.nio.file.Paths.get(f), "")
    val e = intercept[IllegalArgumentException] {
      Readers.readCsvUnionByName(spark, Seq(f))
    }
    assert(e.getMessage.contains("empty CSV header"))
  }
}
