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
  // sum over dec(18,2) widens to dec(28,2) in Spark — the MV stores
  // the ACCUMULATED sum at this type; casting back to (18,2) per
  // refresh would NULL out (non-ANSI) once a group's running sum
  // passes 16 integer digits, where the full recompute still succeeds
  private val decSum = DecimalType(28, 2)

  /** Full compute of the MV's defining aggregate over a snapshot. */
  def fullAggregate(snapshot: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    snapshot.groupBy(groupCol)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast(dec)).as("sum_value"))

  /** [[fullAggregate]] plus the maintenance-only `_nn` column (count
    * of NON-NULL values): SQL `sum` ignores NULLs and is NULL for an
    * all-NULL group, so the incremental path must know how many
    * non-null values a group holds to reproduce that — without it, a
    * delta batch whose rows for a group are all NULL-valued would
    * clobber the running sum to NULL. */
  private def fullWithNn(snapshot: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    snapshot.groupBy(groupCol)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast(dec)).as("sum_value"),
        count(col(valueCol)).as("_nn"))

  /** Commit-extra key carrying the base-table instant a refresh
    * covered — rides IN the refresh commit itself, so cursor and data
    * advance atomically (no separate checkpoint file to desync). */
  val CursorKey = "graft.mv.sourceInstant"

  /** Last source instant a sync recorded on `mv`'s timeline. */
  def lastCursor(mv: GraftTable): Option[String] =
    mv.log.commits().reverse.collectFirst {
      case c if c.extra.contains(CursorKey) => c.extra(CursorKey)
    }

  /** Cursor-managed maintenance: bring `mv` up to date with `base`.
    * First call = full build; later calls consume only the pre-image
    * CDC of the uncovered commit range. ONE commit per refresh — rows
    * retracted to zero are written as soft-delete tombstones in the
    * same upsert, and the cursor rides in the commit's extra map, so a
    * crash either persisted the whole refresh (cursor included) or
    * none of it; re-running is always safe. Returns changed groups. */
  def sync(spark: SparkSession, base: GraftTable, mv: GraftTable,
      groupCol: String, valueCol: String): Long = {
    val rowCommits = base.log.commits()
      .filter(c => c.action == "commit" || c.action == "replace")
    val end = rowCommits.lastOption.map(_.instant).getOrElse(return 0L)
    lastCursor(mv) match {
      case None =>
        // read AS OF the cursor instant: a commit landing between the
        // log read above and this snapshot would otherwise be baked
        // into the MV yet NOT covered by the stored cursor, and the
        // next sync would apply its deltas a second time
        val full = fullWithNn(base.read(Some(end)), groupCol, valueCol)
          .withColumn("_refreshed", lit(0L))
        mv.upsert(full, extra = Map(CursorKey -> end))
        mv.read().count()
      case Some(cur) if cur >= end => 0L // nothing new
      case Some(cur) =>
        // bound the CDC read to EXACTLY the commits the cursor will
        // cover (same TOCTOU as the full build: readCdc re-snapshots)
        val nUncovered = rowCommits.count(_.instant > cur)
        refresh(spark, mv,
          base.readCdc(cur, maxCommits = nUncovered, withPreimages = true),
          groupCol, valueCol, cursor = Some(end))
    }
  }

  /** Apply one CDC batch (pre-image format) to the MV table `mv` as a
    * SINGLE commit: changed groups upsert, groups retracted to zero
    * ride along as soft-delete tombstones (the snapshot read hides
    * them), and `cursor` (if any) lands in the commit's extra map.
    * Returns the changed-group count for observability. */
  def refresh(spark: SparkSession, mv: GraftTable, cdc: DataFrame,
      groupCol: String, valueCol: String,
      cursor: Option[String] = None): Long = {
    val sign = when(col("_change_type").isin("i", "ua"), lit(1))
      .when(col("_change_type").isin("d", "ub"), lit(-1))
      .otherwise(raise_error(concat(
        lit("IncrementalMv needs pre-image CDC (i|ua|d|ub), got "),
        col("_change_type"))))
    val deltas = cdc
      .groupBy(groupCol)
      .agg(sum(sign).as("d_cnt"),
        // NULL-valued rows contribute 0 to the sum and 0 to _nn (SQL
        // sum ignores NULLs); coalesce keeps an all-NULL delta batch
        // from clobbering the running sum to NULL
        coalesce(sum(sign.cast(dec) * col(valueCol).cast(dec)),
          lit(0).cast(decSum)).as("d_sum"),
        sum(when(col(valueCol).isNotNull, sign).otherwise(lit(0)))
          .as("d_nn"))
    // current MV rows for the touched groups only — the MV table is
    // group-cardinality small, but read it pruned anyway. An MV built
    // before the _nn column existed falls back to o_nn = cnt (exact
    // whenever its history held no NULL values — the common case).
    val curCols = Seq(col(groupCol), col("cnt").as("o_cnt"),
      col("sum_value").as("o_sum")) :+
      (if (mv.read().columns.contains("_nn")) col("_nn").as("o_nn")
       else col("cnt").as("o_nn"))
    val current = mv.read().select(curCols: _*)
    val nn = coalesce(col("o_nn"), lit(0L)) + col("d_nn")
    val merged = deltas.join(current, Seq(groupCol), "left_outer")
      .select(col(groupCol),
        (coalesce(col("o_cnt"), lit(0L)) + col("d_cnt")).as("cnt"),
        // SQL sum semantics: a group whose surviving rows are all
        // NULL-valued has sum NULL, not 0
        when(nn > 0L,
          (coalesce(col("o_sum"), lit(0).cast(decSum)) + col("d_sum"))
            .cast(decSum))
          .otherwise(lit(null).cast(decSum)).as("sum_value"),
        nn.as("_nn"),
        // the ordering stamp must be MONOTONE per refresh: the covered
        // base instant is (wall-clock current_timestamp could step
        // BACKWARDS under NTP and make a newer refresh lose the
        // latest-wins merge, silently serving stale aggregates)
        cursor.map(c => lit(c.toLong))
          .getOrElse(unix_micros(current_timestamp()) * lit(1000L))
          .as("_refreshed"))
    // materialize ONCE: the count gate and the upsert below otherwise
    // each recompute the whole CDC read + join (measured as a full
    // second pass in the l20 step profile); the merged relation is
    // dirty-group-cardinality small, so the checkpoint is cheap
    val materialized = merged.localCheckpoint()
    val changed = materialized.count()
    if (changed > 0) {
      // zero-count groups become tombstones INSIDE the same upsert —
      // the refresh is one atomic commit (data + retractions + cursor)
      val withTombstones = materialized.withColumn(
        mv.config.softDeleteField, col("cnt") === 0L)
      mv.upsert(withTombstones,
        extra = cursor.map(CursorKey -> _).toMap)
    } else cursor.foreach { c =>
      // ZERO changed groups must still ADVANCE the cursor (a row-less
      // base commit would otherwise be re-diffed on every later sync,
      // forever): an empty upsert is a metadata-only commit
      mv.upsert(materialized, extra = Map(CursorKey -> c))
    }
    changed
  }
}
