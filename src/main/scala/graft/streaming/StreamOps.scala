package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operator layer (SURVEY.md §2.9 + the
  * north-star streaming surface): event-time windowed aggregation
  * under watermarks, keyed streaming dedup, and custom session state
  * via flatMapGroupsWithState. All are plain Structured Streaming
  * transforms — attach any of them upstream of
  * `ingest.Streamer.streamInto` (graft-table sink) or a memory/file
  * sink.
  */
/** Session event emitted by [[StreamOps.sessionize]]. */
case class SessionUpdate(userId: Long, nEvents: Long, totalValue: Double,
    closed: Boolean)

/** Keyed session accumulator (top level — state encoders need public
  * reachable classes). */
case class SessionState(nEvents: Long, totalValue: Double)

object StreamOps {

  /** Tumbling/sliding event-time counts: `groupBy(window(ts, ...))`
    * with a watermark bounding state (late rows beyond `lateness` are
    * dropped). `tsCol` must be a TimestampType column. */
  def windowedAgg(stream: DataFrame, tsCol: String, keyCol: String,
      windowDuration: String, slideDuration: Option[String] = None,
      lateness: String = "10 minutes"): DataFrame = {
    val w = slideDuration match {
      case Some(s) => window(col(tsCol), windowDuration, s)
      case None => window(col(tsCol), windowDuration)
    }
    stream
      .withWatermark(tsCol, lateness)
      .groupBy(w.as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(keyCol), col("n"))
  }

  /** Streaming exact dedup on a key set with watermark-bounded state
    * (the at-least-once → effectively-once bridge for append sinks). */
  def streamingDedup(stream: DataFrame, tsCol: String,
      keyCols: Seq[String], lateness: String = "10 minutes"): DataFrame =
    stream.withWatermark(tsCol, lateness)
      .dropDuplicates(keyCols :+ tsCol)

  /** Watermarked stream-stream inner join (the attribution shape:
    * right events join left events with the same key arriving within
    * `within` AFTER the left event). Both sides carry watermarks so
    * Spark bounds the join state: a left row is dropped from state
    * once the right watermark passes leftTs + within — state is
    * O(events in the interval), not O(stream). Right columns must not
    * collide with left columns apart from `key` (the caller renames).
    * `leftTs`/`rightTs` must be TimestampType event-time columns. */
  def streamStreamJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, within: String = "10 minutes",
      lateness: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
      .withColumnRenamed(key, s"__r_$key")
    l.join(r,
      col(key) === col(s"__r_$key") &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"))
      .drop(s"__r_$key")
  }

  /** Stream-static enrichment: join each micro-batch against a static
    * dimension (broadcast — the dim is planned once, no streaming
    * state). The left-join keeps unmatched stream rows (nulls in dim
    * columns), the usual lookup-table contract. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Custom keyed state via flatMapGroupsWithState: accumulate a
    * per-user session (count + value sum) and close it once the
    * session's value budget is exceeded — the KeyValueGroupedDataset
    * custom-state path the north star names. NoTimeout keeps the
    * operator deterministic under synchronous test drains; a
    * production gap-timeout variant swaps in EventTimeTimeout with a
    * watermark (timeouts then fire as event time advances, not
    * wall-clock — processing-time timeouts make `processAllAvailable`
    * semantics racy by construction). */
  def sessionize(events: Dataset[(Long, Double)], closeAtValue: Double = 100.0)
      : Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0))
          var n = prev.nEvents
          var v = prev.totalValue
          rows.foreach { case (_, value) => n += 1; v += value }
          if (v >= closeAtValue) {
            state.remove()
            Iterator(SessionUpdate(userId, n, v, closed = true))
          } else {
            state.update(SessionState(n, v))
            Iterator(SessionUpdate(userId, n, v, closed = false))
          }
      }
  }
}
