package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single most recent right row of
  * the same key with `right.ts <= left.ts` (the market-data primitive:
  * "the quote in effect at trade time"; DuckDB/kdb ASOF JOIN, pandas
  * merge_asof). Spark has no built-in.
  *
  * NOT implemented as a join at all: both sides union into one frame
  * tagged by side, and a single per-key ordered window forward-fills the
  * right side's payload onto later left rows (`last(..., ignoreNulls)`
  * over rows-unbounded-preceding). One shuffle on the key, one sort —
  * the same cost as any windowed aggregate, with none of a range-join's
  * pair blowup and no per-key state assumptions. At equal timestamps the
  * right row sorts FIRST, giving the standard inclusive (<=) asof
  * semantics.
  *
  * `right` must be unique per (keyCols, tsCol) — pre-aggregate if not —
  * so the matched row is well-defined (the same contract DuckDB's ASOF
  * relies on for a deterministic result).
  */
object AsOfJoin {

  /** @param rightCols payload columns of `right` to carry; they appear in
    *   the output as `prefix + name` (nullable — null when no right row
    *   precedes the left row). `right` needs only keyCols ++ tsCol ++
    *   rightCols; extra columns are ignored.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val renamed = rightCols.map(c => c -> s"$prefix$c")
    val r = right.select(
      (keyCols :+ tsCol).map(col) ++
        renamed.map { case (from, to) => col(from).as(to) }: _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
    val all = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = renamed.foldLeft(all) { case (df, (_, to)) =>
      df.withColumn(to, last(col(to), ignoreNulls = true).over(w))
    }
    filled.where(col("__side") === 1)
      .select((leftCols ++ renamed.map(_._2)).map(col): _*)
  }

  /** NEAREST-direction as-of with tolerance (pandas merge_asof
    * direction='nearest'): for each left row, the right row of the same
    * key minimizing |right.ts − left.ts|, provided the gap is within
    * `toleranceSec`; equidistant candidates resolve BACKWARD (pandas'
    * rule). Same union-not-join construction as [[asOf]], run in both
    * directions over ONE sorted frame: a backward `last(ignoreNulls)`
    * and a forward `first(ignoreNulls)` window share the single
    * per-key sort, so the whole operator is still one shuffle + one
    * sort — no range join, no pair space. Gap arithmetic runs on
    * whole-second epochs (exact longs, engine-portable), so `tsCol`
    * must be TIMESTAMP-typed here (unlike [[asOf]], which only orders). Emits the
    * payload columns as `prefix + name` plus `${prefix}dir`
    * ('backward' / 'forward' / null when nothing is in tolerance).
    * Same uniqueness contract on `right` as [[asOf]].
    */
  def asOfNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightCols: Seq[String], toleranceSec: Long,
      prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloads = rightCols :+ "__rts"
    val r = right.select(
      (keyCols :+ tsCol).map(col) ++
        rightCols.map(c => col(c).as(s"__p_$c")) :+
        col(tsCol).as("__p___rts"): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
    val all = l.unionByName(r, allowMissingColumns = true)
    val wb = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = payloads.foldLeft(all) { (df, p) =>
      df.withColumn(s"__b_$p", last(col(s"__p_$p"), ignoreNulls = true)
          .over(wb))
        .withColumn(s"__f_$p", first(col(s"__p_$p"), ignoreNulls = true)
          .over(wf))
    }
    val ts = unix_seconds(col(tsCol))
    val bd = ts - unix_seconds(col("__b___rts"))
    val fd = unix_seconds(col("__f___rts")) - ts
    val bok = col("__b___rts").isNotNull && bd <= toleranceSec
    val fok = col("__f___rts").isNotNull && fd <= toleranceSec
    val pickB = bok && (!fok || bd <= fd)
    val outs = rightCols.map { c =>
      when(pickB, col(s"__b_$c")).when(fok, col(s"__f_$c"))
        .as(s"$prefix$c")
    } :+ when(pickB, lit("backward")).when(fok, lit("forward"))
      .as(s"${prefix}dir")
    filled.where(col("__side") === 1)
      .select(leftCols.map(col) ++ outs: _*)
  }
}
