package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the OTHER mergeable
  * frequency sketch, complementing [[HeavyHitters]]: where Misra-Gries
  * never overestimates and keeps k items, count-min never UNDERestimates
  * and keeps a fixed depth×width cell grid whose size is independent of
  * both the stream length and the key cardinality. Cells are plain
  * counts, so sketches merge by elementwise addition — the per-day /
  * per-shard union story of the HLL registers (a30), for frequencies.
  *
  * Estimates are fully DETERMINISTIC: the d hash rows are md5-derived
  * (the engine-portable [[Dedup.md5Hash56]] construction), so - unlike
  * MG, whose intermediate counters depend on partition order - every
  * estimate is reproducible cross-engine and the catalog query (m45)
  * oracle-checks the estimates THEMSELVES, overestimate included, not
  * just a bound. The ε·n overestimate guarantee (ε = e/width, prob 1−δ,
  * δ = e^−depth) is probabilistic and therefore asserted in the spec,
  * not the hash gate.
  *
  * At 100 TB: the sketch build is one narrow projection + a groupBy onto
  * d·w cells (bounded shuffle, map-side combined); point queries join
  * the BROADCAST cell grid — no shuffle keyed on the item at any stage.
  */
object CountMin {

  /** Row-`r` bucket of an item: md5-derived 56-bit hash mod width. */
  def bucket(item: Column, r: Int, width: Int): Column =
    pmod(Dedup.md5Hash56(concat(lit(s"$r:"), item.cast("string"))),
      lit(width.toLong))

  /** The sketch: one row per non-empty (r, bucket) cell. */
  def sketch(items: DataFrame, itemCol: String, depth: Int,
      width: Int): DataFrame =
    items.select(posexplode(array((0 until depth).map(r =>
        bucket(col(itemCol), r, width)): _*)).as(Seq("r", "bucket")))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cell_n"))

  /** Point estimates for every distinct item in `universe`:
    * est = min over rows of the item's cell. The cell grid is at most
    * depth×width rows — broadcast — so the probe is shuffle-free on the
    * item side up to its final min aggregate.
    *
    * The join is LEFT so an item absent from the sketched stream still
    * gets a row: its empty cells count as 0 (the sketch stores only
    * non-empty cells), and min over any empty cell is the correct CMS
    * answer est = 0 — an inner join would instead silently drop the
    * item or inflate its min to the non-empty cells only.
    */
  def estimate(sk: DataFrame, universe: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame =
    universe.select(col(itemCol)).distinct()
      .select(col(itemCol), posexplode(array((0 until depth).map(r =>
        bucket(col(itemCol), r, width)): _*)).as(Seq("r", "bucket")))
      .join(broadcast(sk), Seq("r", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cell_n"), lit(0L))).as("est_n"))
}
