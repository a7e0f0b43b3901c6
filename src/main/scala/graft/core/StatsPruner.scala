package graft.core

import org.apache.spark.sql.types._

/** Typed comparison over the stringly-stored commit-log stats.
  *
  * Stats land in JSON as strings; pruning decisions need the column's
  * real ordering (numeric "10" > "9", not string). Used by upsert/delete
  * planning (key-range file skipping — the bloom-index analog,
  * spark/conf/hudi-defaults.conf:25) and scan-time data skipping.
  */
object StatsPruner {

  /** negative/zero/positive like compareTo, under dataType ordering. */
  def compare(dt: DataType, a: String, b: String): Int = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: DecimalType =>
      BigDecimal(a).compare(BigDecimal(b))
    case _: FloatType | _: DoubleType =>
      // fractional stats can legitimately hold "Infinity"/"-Infinity"/
      // "NaN" (cast-to-string of ±∞ and NaN extrema) — BigDecimal
      // throws on those; java.lang.Double parses them and Double.compare
      // gives NaN the IEEE total-order slot Spark's max() uses (NaN
      // largest), so pruning stays conservative-correct
      java.lang.Double.compare(
        java.lang.Double.parseDouble(a), java.lang.Double.parseDouble(b))
    case _: BooleanType => a.toBoolean.compareTo(b.toBoolean)
    case _ => a.compareTo(b) // string / timestamp-as-iso / date-as-iso
  }

  /** Does [minA, maxA] intersect [minB, maxB]? Null/empty bounds are
    * treated as unknown → conservatively overlapping. */
  def rangesOverlap(dt: DataType, minA: String, maxA: String,
      minB: String, maxB: String): Boolean = {
    if (minA == null || maxA == null || minB == null || maxB == null ||
        minA.isEmpty || maxA.isEmpty || minB.isEmpty || maxB.isEmpty) true
    else compare(dt, minA, maxB) <= 0 && compare(dt, minB, maxA) <= 0
  }

  /** Can a file with [min,max] contain a value in [lo,hi]? (None = open) */
  def mayContain(dt: DataType, stat: Option[ColStat],
      lo: Option[String], hi: Option[String]): Boolean = stat match {
    case None => true
    case Some(s) =>
      lo.forall(l => s.max == null || s.max.isEmpty || compare(dt, s.max, l) >= 0) &&
      hi.forall(h => s.min == null || s.min.isEmpty || compare(dt, s.min, h) <= 0)
  }

  /** Can a file with [min,max] contain ANY of `sortedValues` (pre-sorted
    * under `dt`'s ordering)? Binary-search for the smallest value ≥ min,
    * then check it against max — O(log n) per file, the point-set
    * analog of [[mayContain]]. Unknown bounds → conservatively true. */
  def mayContainAny(dt: DataType, stat: Option[ColStat],
      sortedValues: Array[String]): Boolean = stat match {
    case None => true
    case Some(s) =>
      if (s.min == null || s.min.isEmpty || s.max == null || s.max.isEmpty) true
      else if (sortedValues.isEmpty) false
      else {
        var lo = 0
        var hi = sortedValues.length
        while (lo < hi) { // smallest index with value >= min
          val mid = (lo + hi) >>> 1
          if (compare(dt, sortedValues(mid), s.min) < 0) lo = mid + 1
          else hi = mid
        }
        lo < sortedValues.length && compare(dt, sortedValues(lo), s.max) <= 0
      }
  }
}
