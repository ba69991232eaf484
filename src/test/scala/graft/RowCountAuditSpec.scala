package graft

/** Mechanized scale-hygiene audit #3: a query whose Spark AND oracle
  * sides are both empty "passes" the correctness gate while testing
  * nothing — round 8 found two such vacuous gates (`m44`'s first
  * definition censored every subject; `j7_anti_join`'s "users who never
  * purchased" was empty at every SF for seven rounds). This audit
  * EXECUTES every catalog query at sf0.001 and fails on an empty result
  * unless the emptiness is justified below — so a data-shape drift or
  * an over-restrictive predicate can't silently hollow out a gate.
  *
  * Self-policing like the window and cartesian audits: an allowlist
  * entry whose query now returns rows fails as STALE.
  */
class RowCountAuditSpec extends SparkSpecBase {

  /** query name -> why an empty result at sf0.001 is the CORRECT
    * answer there (and where the query is non-vacuous).
    */
  private val legitimatelyEmpty: Map[String, String] = Map(
    "g4_kcore_peel" -> ("the sf0.001 interaction graph has no k-core at " +
      "the pinned k — the oracle agrees; 21 rows at sf0.01, where the " +
      "driver's gate runs"),
    "g12_adamic_adar" -> ("the sf0.001 supplier backbone is a " +
      "near-complete graph (~10 suppliers), so every 2-hop pair is " +
      "already an edge and link prediction has nothing to predict — " +
      "the oracle agrees; 2729 rows at sf0.01, where the driver's " +
      "gate runs"))

  test("every catalog query returns rows at sf0.001 unless its " +
      "emptiness is documented") {
    val dir = sf("sf0.001")
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val hits = scala.collection.mutable.Set[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      if (n == 0) {
        if (legitimatelyEmpty.contains(name)) hits += name
        else offenders += name
      }
    }
    val stale = legitimatelyEmpty.keySet.diff(hits)
    assert(offenders.isEmpty,
      s"vacuously-empty catalog queries at sf0.001: $offenders")
    assert(stale.isEmpty, s"STALE allowlist entries: $stale")
  }
}
