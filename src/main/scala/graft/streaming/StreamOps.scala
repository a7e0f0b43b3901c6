package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

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

/** Input row for [[StreamOps.sessionizeByGap]]. */
case class SessionEvent(userId: Long, ts: java.sql.Timestamp, value: Double)

/** Closed gap-session emitted by [[StreamOps.sessionizeByGap]]. Time
  * axis in µs to match the batch twin [[graft.Queries.q22Sessionize]]
  * exactly. */
case class GapSession(userId: Long, nEvents: Long, startUs: Long,
    endUs: Long, totalValue: Double)

/** Open-session state for [[StreamOps.sessionizeByGap]]. */
case class GapSessionState(nEvents: Long, startUs: Long, endUs: Long,
    totalValue: Double)

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

  /** Streaming OHLC candles — the watermarked event-time twin of the
    * batch q41 aggregate: open/close selected by MIN_BY/MAX_BY on the
    * same zero-padded (event-time µs, sequence) composite key, high/
    * low/count/exact-decimal volume in the SAME aggregation (one state
    * store, no window-function pass). State per (window, key) is one
    * row of O(1) size and the watermark closes it — candles at 100 TB/
    * day cost memory proportional to OPEN windows, not history.
    * StreamingSpec pins the drained stream equal to the batch shape on
    * identical rows. */
  def streamingOhlc(stream: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, seqCol: String, windowDuration: String,
      lateness: String = "10 minutes"): DataFrame = {
    val k = format_string("%020d-%012d",
      unix_micros(col(tsCol)), col(seqCol))
    stream
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowDuration).as("w"), col(keyCol))
      .agg(min_by(col(valueCol), k).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), k).as("close"),
        count(lit(1)).as("n"),
        sum(col(valueCol).cast(DecimalType(18, 2))).cast(DoubleType)
          .as("vol"))
      .select(col("w.start").as("window_start"), col(keyCol),
        col("open"), col("high"), col("low"), col("close"),
        col("n"), col("vol"))
  }

  /** Streaming exact dedup on a key set with watermark-bounded state
    * (the at-least-once → effectively-once bridge for append sinks). */
  def streamingDedup(stream: DataFrame, tsCol: String,
      keyCols: Seq[String], lateness: String = "10 minutes"): DataFrame =
    stream.withWatermark(tsCol, lateness)
      .dropDuplicates(keyCols :+ tsCol)

  /** Key-only streaming dedup tolerating TIMESTAMP DRIFT between
    * replays: a redelivered record whose event time moved (broker
    * re-stamp, clock skew) still carries the same business key, so
    * [[streamingDedup]]'s (key, ts) identity would pass the duplicate
    * through. `dropDuplicatesWithinWatermark` dedups on the key alone
    * and keeps a key's state only until the watermark passes its first
    * sighting + delay — bounded state without requiring ts equality
    * (the Kafka-redelivery shape; Spark 3.5+ operator). */
  def streamingDedupKeyOnly(stream: DataFrame, tsCol: String,
      keyCols: Seq[String], lateness: String = "10 minutes"): DataFrame =
    stream.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

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

  /** Watermarked stream-stream LEFT OUTER interval join (the
    * did-NOT-convert shape: every left event emits, matched or not).
    * Same state bound as [[streamStreamJoin]]; the null-padded row for
    * an unmatched left event is emitted only once the right watermark
    * passes `leftTs + within` — i.e. once no matching right row can
    * still arrive. Outer results are therefore delayed by the
    * interval+lateness, which is the price of a correct "no match"
    * verdict under out-of-order delivery. */
  def streamStreamLeftJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, within: String = "10 minutes",
      lateness: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
      .withColumnRenamed(key, s"__r_$key")
    l.join(r,
      col(key) === col(s"__r_$key") &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"),
      "left_outer")
      .drop(s"__r_$key")
  }

  /** Stream-stream FULL OUTER interval join: both sides' unmatched
    * rows surface null-padded once the global watermark closes their
    * interval — impressions that never click AND clicks that never
    * matched an impression (fraud/ghost-click detection) from one
    * join. State stays watermark-bounded on both sides exactly as in
    * the inner/left variants; the only extra cost is the right side's
    * no-match verdicts being retained to the same horizon. */
  def streamStreamFullOuterJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, within: String = "10 minutes",
      lateness: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
      .withColumnRenamed(key, s"__r_$key")
    l.join(r,
      col(key) === col(s"__r_$key") &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"),
      "full_outer")
      .withColumn(key, coalesce(col(key), col(s"__r_$key")))
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
    * custom-state path the north star names. NoTimeout keeps this
    * demo-shaped operator deterministic under synchronous test drains;
    * [[sessionizeByGap]] is the production gap-timeout variant
    * (EventTimeTimeout under a watermark — timeouts fire as event time
    * advances, not wall-clock, so idle sessions really close and state
    * stays bounded). */
  /** Production gap-based sessionization under EVENT-TIME timeout —
    * the streaming twin of the batch [[graft.Queries.q22Sessionize]]:
    * a session closes when its user is idle longer than `gapMs` in
    * EVENT time. Unlike [[sessionize]]'s value budget, idle sessions
    * here really close: each update arms
    * `state.setTimeoutTimestamp(end + gap)`, and the timeout fires as
    * the WATERMARK passes it (event-time, not wall-clock — semantics
    * stay deterministic under synchronous drains, and state is bounded
    * by the watermark the way the 100 TB design needs: one small
    * struct per ACTIVE user, evicted on close).
    *
    * Within a micro-batch a key's rows are sorted by event time
    * (micro-batch ≪ memory; cross-batch order is the watermark's job —
    * rows later than `lateness` behind the max seen event time are
    * dropped before the function runs, the standard contract). The
    * strict `> gap` break test matches the batch twin exactly, so on a
    * drained stream (watermark pushed past every session's close) the
    * emitted (user, n, start, end) multiset equals the batch answer —
    * spec-asserted against q22 on the real events table. */
  def sessionizeByGap(events: Dataset[SessionEvent],
      gapMs: Long = 30L * 60 * 1000, lateness: String = "0 seconds")
      : Dataset[GapSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000
    def tsUs(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos % 1000000) / 1000
    events.withWatermark("ts", lateness)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[GapSessionState, GapSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, rows, state: GroupState[GapSessionState]) =>
          if (state.hasTimedOut) {
            // no data for this key and the watermark passed end + gap:
            // the session is over in event time — emit and evict
            val s = state.get
            state.remove()
            Iterator(GapSession(userId, s.nEvents, s.startUs, s.endUs,
              s.totalValue))
          } else {
            var closed = List.empty[GapSession]
            var cur = state.getOption
            rows.toSeq.sortBy(e => tsUs(e.ts)).foreach { e =>
              val us = tsUs(e.ts)
              cur match {
                case Some(s) if us - s.endUs > gapUs =>
                  closed ::= GapSession(userId, s.nEvents, s.startUs,
                    s.endUs, s.totalValue)
                  cur = Some(GapSessionState(1L, us, us, e.value))
                case Some(s) =>
                  cur = Some(GapSessionState(s.nEvents + 1, s.startUs,
                    math.max(s.endUs, us), s.totalValue + e.value))
                case None =>
                  cur = Some(GapSessionState(1L, us, us, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // re-arm: close when the watermark passes end + gap (must
              // stay ahead of the current watermark or Spark rejects it)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1, s.endUs / 1000 + gapMs))
            }
            closed.reverse.iterator
          }
      }
  }

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
