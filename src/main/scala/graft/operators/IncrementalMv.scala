package graft.operators

import graft.core.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental materialized-view maintenance from retractable CDC.
  *
  * The MV is `SELECT group, count(*), sum(value) GROUP BY group` over a
  * graft table's latest-wins snapshot, stored in its OWN graft table
  * (keyed by the group column) so refreshes are transactional commits
  * with time travel and OCC like any other write.
  *
  * Refresh consumes `readCdc(withPreimages = true)` — `i`/`ua` rows
  * add, `d`/`ub` rows retract — so per-refresh cost is
  * O(changed rows) + a read of the (tiny, group-cardinality) MV table:
  * the base table is NEVER rescanned. Sums run in decimal(18,2), so
  * incremental addition is exact and order-independent — the maintained
  * MV is bit-identical to a from-scratch recompute, which is what the
  * l20 gate checks against DuckDB.
  *
  * At 100 TB: the reference's analog is a Hudi incremental-query ETL
  * into a downstream aggregate table
  * (hudi-streamer-dynamodb-lock/README.md incremental pipeline); the
  * whole refresh shuffles O(distinct dirty groups), bounded by the CDC
  * batch, while a full recompute would shuffle the corpus.
  */
object IncrementalMv {

  private val dec = DecimalType(18, 2)

  /** Full compute of the MV's defining aggregate over a snapshot. */
  def fullAggregate(snapshot: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    snapshot.groupBy(groupCol)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast(dec)).as("sum_value"))

  /** Apply one CDC batch (pre-image format) to the MV table `mv`:
    * upserts changed groups, deletes groups whose count reaches zero.
    * Returns the set-changed row count for observability. */
  def refresh(spark: SparkSession, mv: GraftTable, cdc: DataFrame,
      groupCol: String, valueCol: String): Long = {
    val sign = when(col("_change_type").isin("i", "ua"), lit(1))
      .when(col("_change_type").isin("d", "ub"), lit(-1))
      .otherwise(raise_error(concat(
        lit("IncrementalMv needs pre-image CDC (i|ua|d|ub), got "),
        col("_change_type"))))
    val deltas = cdc
      .groupBy(groupCol)
      .agg(sum(sign).as("d_cnt"),
        sum(sign.cast(dec) * col(valueCol).cast(dec)).as("d_sum"))
    // current MV rows for the touched groups only — the MV table is
    // group-cardinality small, but read it pruned anyway
    val current = mv.read().select(col(groupCol),
      col("cnt").as("o_cnt"), col("sum_value").as("o_sum"))
    val merged = deltas.join(current, Seq(groupCol), "left_outer")
      .select(col(groupCol),
        (coalesce(col("o_cnt"), lit(0L)) + col("d_cnt")).as("cnt"),
        (coalesce(col("o_sum"), lit(0).cast(dec)) + col("d_sum"))
          .cast(dec).as("sum_value"),
        (unix_micros(current_timestamp()) * lit(1000L)).as("_refreshed"))
    // one pass answers both "anything to write?" and "any group
    // retracted to zero?" — the delete is its own commit, so skipping
    // it when nothing hit zero saves a timeline round trip per refresh
    val (changed, zeroed) = {
      val r = merged.agg(count(lit(1)),
        sum(when(col("cnt") === 0L, 1L).otherwise(0L))).collect().head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    if (changed > 0) {
      mv.upsert(merged)
      // a group retracted to zero has no live rows — drop its MV row so
      // the view equals the defining query's result exactly
      if (zeroed > 0) mv.deleteWhere(col("cnt") === 0L)
    }
    changed
  }
}
