package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Adversarial-input properties for the MinHash field arithmetic and the
  * connected-components exhaustion guard (round-3 hardening items #7/#8).
  *
  * The 31-bit Mersenne-field subtleties documented at the `minHashP`
  * scaladoc are exercised here against a SCALAR reference implementation:
  * the column expressions must agree with plain JVM arithmetic on the
  * field's edge values (h = 0, 1, p−1), and the a·x+b products must stay
  * overflow-free for every permutation index.
  */
class MinHashPropertySpec extends SparkSpecBase {

  import spark.implicits._

  // ---- scalar reference implementations ------------------------------

  private def md5Hash56Ref(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 14), 16)
  }

  private def permutedRef(h31: Long, i: Int): Long =
    Math.floorMod(h31 * Dedup.minHashA(i) + Dedup.minHashB(i), Dedup.minHashP)

  private def shinglesRef(text: String, n: Int): Seq[String] = {
    val toks = text.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    if (toks.size < n) Seq.empty
    else (0 to toks.size - n).map(i => toks.slice(i, i + n).mkString(" "))
  }

  test("md5Hash56 column agrees with the scalar reference on adversarial " +
      "strings (empty, whitespace, unicode, metacharacters, long)") {
    val rnd = new Random(23)
    val adversarial = Seq(
      "", " ", "  \t ", "a", "a b c",
      "\u00e9t\u00e9 caf\u00e9",  // precomposed accents (NFC)
      "e\u0301te\u0301",  // combining accents (NFD)
      "\u4e16\u754c \u4f60\u597d",  // CJK
      "a.b*c(d)e[f]g\\h|i",                // regex metacharacters
      "0", "-1", "2147483647",
      "x" * 2000)                          // long input
    val fuzz = (1 to 200).map(_ =>
      (1 to rnd.nextInt(12) + 1).map(_ =>
        rnd.alphanumeric.take(rnd.nextInt(8) + 1).mkString).mkString(" "))
    val inputs = (adversarial ++ fuzz).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val got = inputs.toDF("id", "s")
      .select(col("id"), Dedup.md5Hash56(col("s")).as("h"))
      .as[(Long, Long)].collect().toMap
    inputs.foreach { case (i, s) =>
      assert(got(i) === md5Hash56Ref(s), s"md5Hash56 mismatch on '$s'")
      assert(got(i) >= 0L && got(i) < (1L << 56))
    }
  }

  test("permutation arithmetic matches the scalar field reference on " +
      "h = 0, 1, p-1 for every hash index, with no Long overflow") {
    val p = Dedup.minHashP
    // overflow-freedom of a*x + b across the whole index range used
    // anywhere in the catalog (and far beyond)
    (0 until 256).foreach { i =>
      val a = Dedup.minHashA(i)
      val b = Dedup.minHashB(i)
      assert(a >= 0 && a < p && b >= 0 && b < p)
      // (p-1)*a + b <= (p-1)*(p-1) + (p-1) < 2^62 — provably in range
      assert((p - 1) <= (Long.MaxValue - b) / math.max(a, 1L),
        s"a*x+b would overflow for i=$i")
    }
    // the column pipeline on literal edge hashes must equal the scalar
    val edge = Seq((0L, 0L), (1L, 1L), (2L, p - 1)).toDF("id", "__h")
    val sig = Dedup.minHashSignatureArrayFromHashes(edge, "id", 32)
      .as[(Long, Seq[Long])].collect().toMap
    Seq(0L -> 0L, 1L -> 1L, 2L -> (p - 1)).foreach { case (id, h) =>
      val want = (0 until 32).map(i => permutedRef(h, i))
      assert(sig(id) === want, s"signature mismatch for h=$h")
    }
    // h = 0 degenerates to b_i exactly; h = p-1 to (b_i - a_i) mod p
    assert(sig(0L) === (0 until 32).map(Dedup.minHashB))
    assert(sig(2L) === (0 until 32).map(i =>
      Math.floorMod(Dedup.minHashB(i) - Dedup.minHashA(i), p)))
  }

  test("shingles/shingleHashes on degenerate docs: empty text, " +
      "whitespace-only, fewer tokens than n, exactly n tokens") {
    val docs = Seq(
      (0L, ""), (1L, "   "), (2L, "\t\n "),
      (3L, "one"), (4L, "one two"),
      (5L, "one two three"),              // exactly n → 1 shingle
      (6L, "  padded   tokens   here  ")) // irregular whitespace
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "text", "doc_id", 3)
      .as[(Long, String)].collect().groupBy(_._1)
    val hs = Dedup.shingleHashes(docs, "text", "doc_id", 3)
      .as[(Long, Long)].collect().groupBy(_._1)
    (0L to 4L).foreach { id =>
      assert(!sh.contains(id), s"doc $id should emit no shingles")
      assert(!hs.contains(id), s"doc $id should emit no hashes")
    }
    assert(sh(5L).map(_._2).toSeq === Seq("one two three"))
    assert(hs(5L).map(_._2).toSeq ===
      Seq(Math.floorMod(md5Hash56Ref("one two three"), Dedup.minHashP)))
    assert(sh(6L).map(_._2).toSeq === Seq("padded tokens here"))
  }

  test("shingleHashes ≡ md5Hash56 over shingles, and the two signature " +
      "paths agree on random docs with repeated shingles") {
    val rnd = new Random(41)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    // small vocabulary → heavy shingle repetition within documents, the
    // exact case where the no-distinct path must still agree (min over a
    // multiset = min over its set)
    val docs = (0L until 60L).map { id =>
      (id, (1 to rnd.nextInt(40) + 3)
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    // hash-frame ≡ reference hashes of the reference shingles (as SETS:
    // the raw path keeps duplicates, which is its documented contract)
    val hs = Dedup.shingleHashes(df, "text", "doc_id", 3)
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (k, v) => (k, v.map(_._2).toSet) }
    docs.foreach { case (id, text) =>
      val want = shinglesRef(text, 3)
        .map(s => Math.floorMod(md5Hash56Ref(s), Dedup.minHashP)).toSet
      assert(hs.getOrElse(id, Set.empty) === want, s"hash set for doc $id")
    }
    // signature path equivalence: distinct-string path vs raw-hash path
    val viaStrings = Dedup.minHashSignatureArray(
        Dedup.shingles(df, "text", "doc_id", 3), "doc_id", 16)
      .as[(Long, Seq[Long])].collect().toMap
    val viaHashes = Dedup.minHashSignatureArrayFromHashes(
        Dedup.shingleHashes(df, "text", "doc_id", 3), "doc_id", 16)
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaStrings.keySet === viaHashes.keySet)
    viaStrings.foreach { case (id, s) =>
      assert(viaHashes(id) === s, s"signature divergence for doc $id")
    }
    // shuffle-free inline path produces the identical signatures
    val viaInline = Dedup.minHashSignatureArrayInline(
        df, "text", "doc_id", 3, 16)
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaInline.keySet === viaHashes.keySet)
    viaHashes.foreach { case (id, s) =>
      assert(viaInline(id) === s, s"inline signature divergence for doc $id")
    }
  }

  // ---- connected components: maxIters exhaustion ---------------------

  test("connectedComponents: a chain deeper than maxIters fails loudly " +
      "with starFallback=false, falls back to star contraction by " +
      "default; a converging run on the same graph labels the chain") {
    // 25-hop path graph 0-1-2-...-25: min-label propagation moves the
    // label one hop per round, so depth 25 cannot converge in 10 rounds
    val nodes = (0L to 25L).map(Tuple1(_)).toDF("id")
    val pairs = (0L until 25L).map(i => (i, i + 1)).toDF("a", "b")
    val err = intercept[java.lang.AssertionError] {
      Dedup.connectedComponents(nodes, "id", pairs, "a", "b",
        maxIters = 10, starFallback = false).count()
    }
    assert(err.getMessage.contains("star contraction"),
      s"exhaustion message should name the escape hatch: ${err.getMessage}")
    // default: same call degrades to star contraction and still labels
    // the whole chain with its minimum id
    val viaFallback = Dedup.connectedComponents(nodes, "id", pairs,
        "a", "b", maxIters = 10)
      .as[(Long, Long)].collect()
    assert(viaFallback.length === 26)
    assert(viaFallback.forall(_._2 === 0L))
    // the same graph converges when the bound covers the diameter, and
    // every node lands in cluster 0
    val ok = Dedup.connectedComponents(nodes, "id", pairs, "a", "b",
        maxIters = 30)
      .as[(Long, Long)].collect()
    assert(ok.length === 26)
    assert(ok.forall(_._2 === 0L))
  }

  test("star contraction: a 64-hop chain the bounded loop refuses " +
      "converges in O(log² n) rounds and agrees with propagation on a " +
      "mixed adversarial graph") {
    // 64-hop chain plus shuffled id order (labels must not depend on
    // insertion order), an 8-clique, and isolated singletons
    val chain = (100L until 164L).map(i => (i, i + 1))
    val clique = for {
      a <- 0L until 8L; b <- (a + 1) until 8L
    } yield (a * 7 + 200, b * 7 + 200) // non-contiguous ids
    val nodes = ((100L to 164L) ++ (0L until 8L).map(_ * 7 + 200) ++
      Seq(999L, 1001L)).map(Tuple1(_)).toDF("id")
    val pairs = (chain ++ clique).toDF("a", "b")
    // the bounded loop refuses this diameter when the fallback is off
    intercept[java.lang.AssertionError] {
      Dedup.connectedComponents(nodes, "id", pairs, "a", "b",
        maxIters = 10, starFallback = false).count()
    }
    val star = Dedup.connectedComponentsStarContraction(
        nodes, "id", pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    // chain collapses to min id 100, clique to 200, singletons to self
    (100L to 164L).foreach(i => assert(star(i) === 100L))
    (0L until 8L).foreach(a => assert(star(a * 7 + 200) === 200L))
    assert(star(999L) === 999L && star(1001L) === 1001L)
    // agreement with the propagation form on a diameter it can close
    val prop = Dedup.connectedComponents(nodes, "id", pairs, "a", "b",
        maxIters = 80, starFallback = false)
      .as[(Long, Long)].collect().toMap
    assert(star === prop)
  }

  // ---- banding stage extraction (round 9) ----------------------------

  test("bandCollisionPairs: verified LSH pairs are a subset of the band " +
      "candidates, and candidates are exactly the pairs sharing >=1 " +
      "full band of the signature") {
    val rnd = new Random(41)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val docs = (0L until 40L).map { i =>
      val base = (0 until 12).map(_ => vocab(rnd.nextInt(vocab.size)))
      // half the docs are near-copies of an earlier doc (one token off)
      val text =
        if (i >= 20) {
          val src = (0 until 12).map(_ => vocab(((i - 20) % 7).toInt))
          (src :+ vocab(rnd.nextInt(vocab.size))).mkString(" ")
        } else base.mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val sig = Dedup.minHashSignatureArrayInline(docs, "text", "doc_id",
      2, 16).localCheckpoint(true)
    val cand = Dedup.bandCollisionPairs(sig, "doc_id", 16, 4)
      .as[(Long, Long)].collect().toSet
    // scalar reference: band b of doc = sig[4b..4b+3]; candidate iff
    // any band equal
    val sigs = sig.as[(Long, Seq[Long])].collect().toMap
    val ids = sigs.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      if (0 until 4).exists(k =>
        sigs(a).slice(k * 4, k * 4 + 4) == sigs(b).slice(k * 4, k * 4 + 4))
    } yield (a, b)).toSet
    assert(cand === expected)
    // the full verified pipeline only ever emits candidate pairs
    val verified = Dedup.minHashLshPairs(docs, "text", "doc_id", 2, 16, 4, 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(verified.subsetOf(cand))
    assert(verified.nonEmpty, "fixture should produce at least one pair")
  }
}
