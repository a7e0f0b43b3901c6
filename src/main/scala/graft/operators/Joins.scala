package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as built-ins, composed from existing
  * relational ops so Catalyst keeps optimizing them (the preferred
  * extension tier — no custom physical nodes needed).
  */
object Joins {

  /** As-of join (point-in-time lookup): for every left row, attach the
    * latest right row with the same keys and `right.timeCol <=
    * left.timeCol` — the classic ticks⋈quotes / events⋈dimension-
    * history shape.
    *
    * Implementation is the scale-safe union-window formulation, NOT a
    * non-equi join: tag both sides, union, and run a running
    * `last(..., ignoreNulls)` per key ordered by (time, side) so each
    * left row sees exactly the newest right row at-or-before it. One
    * hash shuffle on the keys, O(rows) state, no cross product — a
    * non-equi join would plan as BroadcastNestedLoop and die at scale.
    * Right rows must be unique per (keys, timeCol); pre-aggregate if
    * not (the caller owns the tie-break policy).
    *
    * Output: every left column, plus each right value column as
    * `<name>_asof` and the matched right time as `<timeCol>_asof`
    * (nulls when no right row precedes the left row).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, rightValueCols: Seq[String]): DataFrame = {
    val asofCols = rightValueCols.map(c => s"${c}_asof") :+ s"${timeCol}_asof"
    val leftCols = left.columns.toSeq
    // the right row travels as ONE struct so the running last() always
    // carries every column from the SAME matched row — per-column
    // last(ignoreNulls) would stitch together different right rows
    // whenever a right value is null
    val packed = struct(
      rightValueCols.map(col) :+ col(timeCol).as("__t"): _*)
    // NULL contract (matches the equivalent non-equi join `right.time
    // <= left.time AND keys equal`, where NULL never compares true):
    // a right row with NULL time must not match anything — unfiltered
    // it would sort FIRST (asc = nulls-first) and be carried as the
    // "latest at-or-before" match to every left row — and NULL keys
    // must not pair up, which partitionBy would otherwise do.
    val r = right
      .filter(col(timeCol).isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _))
      .select(keys.map(col) :+ col(timeCol) :+ packed.as("__asof"): _*)
    val structType = r.schema("__asof").dataType
    // right rows sort BEFORE left rows at equal time (<= semantics)
    val l = left
      .select(leftCols.map(col) :+
        lit(null).cast(structType).as("__asof") :+ lit(1).as("__side"): _*)
    val rAligned = r.select(
      leftCols.map(c => if (keys.contains(c) || c == timeCol) col(c)
                        else lit(null).cast(left.schema(c).dataType).as(c)) :+
      col("__asof") :+ lit(0).as("__side"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(rAligned)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
    val unpacked = rightValueCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"${c}_asof", col(s"__asof.$c"))
    }.withColumn(s"${timeCol}_asof", col("__asof.__t"))
    unpacked.filter(col("__side") === 1).drop("__side", "__asof")
      .select(leftCols.map(col) ++ asofCols.map(col): _*)
  }

  /** Range join via bin bucketing: left rows matched to every range
    * `[loCol, hiCol)` that contains `leftValCol`. Ranges explode into
    * the fixed-width bins they cover; the join is then a plain
    * equi-join on the bin plus an exact residual filter — a
    * HashJoin/SortMergeJoin at any scale where the naive inequality
    * join would plan as BroadcastNestedLoop (O(|L|·|R|)). Bin width
    * trades range-side duplication against per-bin fanout; pick it
    * near the median range width. */
  def rangeJoinBinned(left: DataFrame, leftValCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    // binWidth = 0 puts EVERY row of both sides in bin Long.MaxValue
    // (floor(x/0.0) = Infinity) — the single-key cross product this
    // operator exists to prevent, surfacing as a hang, not an error
    require(binWidth > 0 && !binWidth.isInfinite,
      s"binWidth=$binWidth must be a positive finite number")
    // per-ROW guards, same failure class as binWidth=0: one corrupt
    // range (hi < lo, or a range spanning millions of bins) would
    // drive sequence() into the array-size limit and kill the job, or
    // silently emit a junk descending sequence — fail loudly naming
    // the row instead
    val maxBinsPerRange = 1000000L
    val lo = floor(col(loCol) / binWidth).cast("long")
    val hi = floor(col(hiCol) / binWidth).cast("long")
    // the guard is FOLDED INTO the sequence's lower bound (+0) — a
    // standalone projected-then-dropped column would be eliminated by
    // the optimizer and never evaluate the raise_error
    val guardZero = when(col(hiCol) < col(loCol), raise_error(concat(
        lit(s"rangeJoinBinned: inverted range [$loCol, $hiCol) = ["),
        col(loCol), lit(", "), col(hiCol), lit(")"))).cast("long"))
      .when(hi - lo > maxBinsPerRange, raise_error(concat(
        lit(s"rangeJoinBinned: range ["), col(loCol), lit(", "),
        col(hiCol),
        lit(s") spans more than $maxBinsPerRange bins at binWidth=" +
          s"$binWidth — raise binWidth or clean the range rows")))
        .cast("long"))
      .otherwise(lit(0L))
    val binned = ranges
      .withColumn("__bin", explode(sequence(lo + guardZero, hi)))
    val l = left.withColumn("__bin",
      floor(col(leftValCol) / binWidth).cast("long"))
    l.join(binned, Seq("__bin"))
      .filter(col(leftValCol) >= col(loCol) && col(leftValCol) < col(hiCol))
      .drop("__bin")
  }

  /** Salted inner equi-join for a skewed probe side: `big` may carry
    * hot values of `key` (power-law keys — a Zipfian bigram, a
    * celebrity user id) that a plain shuffle join piles onto one
    * reducer; `small` has few rows per key (a counts/dimension
    * table too large to broadcast at full scale). The big side gets a
    * deterministic salt `hash(saltBy) mod salts`; the small side is
    * replicated once per salt value; the join key becomes
    * `(key, salt)`, so each hot key fans out over `salts` reducers
    * and the result set is exactly the unsalted inner join.
    *
    * `saltBy` must be a DETERMINISTIC big-side expression that varies
    * within a hot key (a row id — NOT the join key itself, which
    * would put every hot row back in one bucket, and NOT `rand()`,
    * which breaks retry/speculative-task consistency). Shuffle volume
    * cost: `small` is written `salts`× — pick single-digit `salts`
    * for dimension-sized `small`. AQE's skew-join split solves the
    * same problem reactively for sort-merge plans; this operator is
    * the proactive form that also covers hash joins and keeps working
    * when one key exceeds a whole executor's share. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, saltBy: Column): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val b = big.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
