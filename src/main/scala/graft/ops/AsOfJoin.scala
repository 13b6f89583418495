package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `rightTime <= leftTime` within the same key — composed from
  * built-ins (preference order (a), SURVEY §7.3): tag + union + one
  * window pass carrying the right row as an atomic struct through
  * `last(_, ignoreNulls)`.
  *
  * Scale rationale: a naive range join explodes to |L|×|R| per key
  * and a broadcast-range join needs bounds; the union form shuffles
  * each input ONCE on the key and makes a single ordered pass —
  * exactly the merge-scan an ASOF join wants, expressed so Catalyst
  * plans it as one window over one exchange.
  */
object AsOfJoin {

  /** @param left      probe side (all its columns pass through)
    * @param right     reference side
    * @param keyCols   equi-key columns present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param rightValueCols columns of `right` carried as `asof_<c>`
    *   (null when no as-of match); the matched row is atomic — no
    *   column mixing across right rows. Ties on time break by the
    *   struct ordering (deterministic).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String,
      rightValueCols: Seq[String]): DataFrame = {
    val passCols = left.columns.filterNot(keyCols.contains).toSeq
    val rStruct = struct(rightValueCols.map(col): _*)
    val l = left.select(
      (keyCols.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side")) ++
        passCols.map(c => col(c).as(s"__l_$c")) :+
        lit(null).cast(right.select(rStruct).schema.head.dataType)
          .as("__r"): _*)
    val r = right.select(
      (keyCols.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__side")) ++
        passCols.map(c => lit(null).cast(left.schema(c).dataType)
          .as(s"__l_$c")) :+ rStruct.as("__r"): _*)
    // right rows sort before left rows at equal time (side 0 < 1), so
    // an exactly-simultaneous right row IS visible to the left row;
    // equal-time right rows break ties by struct order (max wins).
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(keyCols.map(col) ++
        passCols.map(c => col(s"__l_$c").as(c)) ++
        rightValueCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }
}
