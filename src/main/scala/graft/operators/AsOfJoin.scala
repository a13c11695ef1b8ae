package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generalized as-of join: for each left row, the single right row with the
  * greatest `rightTime` strictly below `leftTime` within the same key —
  * e.g. "the quote in effect at trade time", "the last click before this
  * purchase".
  *
  * Formulation: union both sides tagged, one window pass per key ordered by
  * (time, side, tiebreak) carrying the last right row forward, then keep
  * left rows. ONE shuffle on the key — no per-row range probe, no interval
  * explosion; at 1000 executors this is a single repartition of each input,
  * which is the floor for any keyed join.
  */
object AsOfJoin {

  /** @param left/right     inputs
    * @param key            equality key column (same name both sides)
    * @param leftTime/rightTime  event-time columns
    * @param rightCols      right columns to carry (emitted as `asof_<name>`,
    *                       null when no earlier right row exists)
    * @param rightTiebreak  unique right column ordering simultaneous right
    *                       rows (latest wins deterministically)
    */
  def lastBefore(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String],
      rightTiebreak: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType, StructType}
    val leftCols = left.columns.toSeq
    // INTEGRAL tiebreaks only: a fractional type's cast('long') truncates
    // (0.4 and 0.9 both become 0), silently collapsing distinct tiebreak
    // values and reintroducing the nondeterminism the parameter exists
    // to prevent — the exact failure a plain NumericType check admits.
    // Null tiebreak values coalesce to Long.MinValue so they order
    // deterministically (any non-null tiebreak wins over null).
    rightTiebreak.foreach { c =>
      val ok = right.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        // precision ≤ 18 only: a wider scale-0 decimal can hold values
        // outside Long range, where cast('long') yields null → the
        // Long.MinValue null-sentinel → distinct tiebreaks silently
        // collapse into ties — the exact nondeterminism this guard exists
        // to prevent
        case d: DecimalType if d.scale == 0 && d.precision <= 18 => true
        case _ => false
      }
      require(ok, s"rightTiebreak '$c' must be an integral type that " +
        s"fits in a Long (fractional values would truncate and tie; " +
        s"decimals wider than precision 18 can overflow the long cast " +
        s"to null and tie), got ${right.schema(c).dataType}")
    }
    val tb = rightTiebreak.map(c => coalesce(col(c).cast("long"),
      lit(Long.MinValue))).getOrElse(lit(0L))
    // Carry the matched right row as ONE struct: per-column carries with
    // ignoreNulls would skip a genuinely-null value in the matched row
    // (falling back to an older row) and could mix columns from different
    // right rows. The struct is non-null exactly for right rows, so
    // last(ignoreNulls) picks the whole matched row atomically.
    val rStructType = StructType(rightCols.map(c => right.schema(c)))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(0L))
      .select(Seq(col("__t"), col("__side"), col("__tb")) ++ leftCols.map(col)
        :+ lit(null).cast(rStructType).as("__r"): _*)
    // join semantics: a null-keyed or null-timed right row matches
    // NOTHING. Unfiltered, a null rightTime sorts FIRST under asc (Spark
    // nulls-first) and becomes the carried match for every early left
    // row, and null keys would pair up inside the window's null
    // partition — both silent wrong-output modes of the window
    // formulation that an equivalent SQL join doesn't have. (Null-keyed
    // LEFT rows keep their partition, see only left rows after this
    // filter, and correctly emit null asof_* columns.)
    val r = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__tb", tb)
      .select(Seq(col("__t"), col("__side"), col("__tb")) ++ leftCols.map {
        case c if c == key => col(key)
        case c => lit(null).cast(left.schema(c).dataType).as(c)
      } :+ struct(rightCols.map(col): _*).as("__r"): _*)
    // "strictly before" ⇒ a right row at exactly leftTime must NOT match,
    // so at equal __t the LEFT row (side 1, desc) sorts first and the
    // frame [unbounded, -1] excludes the simultaneous right row.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side").desc, col("__tb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    l.unionByName(r)
      .withColumn("__rc", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col)
        ++ rightCols.map(c => col("__rc").getField(c).as(s"asof_$c")): _*)
  }
}
