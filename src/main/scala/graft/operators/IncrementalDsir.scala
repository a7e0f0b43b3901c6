package graft.operators

import graft.core.{GraftTable, TableConfig}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental DSIR: the ingest-time shape of [[Selection.dsirSelect]]
  * for a corpus that arrives in batches (the continuous-curation
  * deployment, same role [[IncrementalDedup]] plays for minhash-LSH).
  *
  * The DSIR model's sufficient statistic is the O(numBuckets) vector
  * of per-bucket (target, raw) term counts, and counts are ADDITIVE
  * across disjoint batches — so each arriving batch appends its own
  * O(numBuckets) count rows to a graft-table store (atomic commit,
  * crash-safe), and the current model is a sum over the store: the
  * historical corpus is never rescanned, reshuffled, or even read.
  * Per-batch cost is O(batch) + O(numBuckets · batches) store rows,
  * the latter metadata-scale.
  *
  * Equivalence contract (tested in Round19Spec): after ingesting
  * b₁…bₙ, [[currentRatio]] equals the ratio table the BATCH operator
  * fits on b₁ ∪ … ∪ bₙ exactly (integer equality — additive counts,
  * same micronat quantization), so [[selectTopK]] over any frame
  * returns exactly what [[Selection.dsirSelect]] would with the union
  * as its fitting corpus.
  *
  * Idempotence: each ingest stamps `batch_no`; a batch at or below the
  * store's high-water mark is skipped (crash between compute and
  * commit re-runs safely). `batch_no` must be monotone. */
class IncrementalDsir(spark: SparkSession, root: String,
    numBuckets: Int = 256) {

  Selection.requireBuckets(numBuckets)

  /** (bucket, ct, cr, batch_no) append-only count deltas; one commit
    * per batch, O(numBuckets) rows each. */
  val statsStore: GraftTable = GraftTable.create(spark, s"$root/stats",
    TableConfig(name = "dsir_stats", keyField = "bucket",
      orderingField = "batch_no", numBuckets = 1))

  /** High-water `batch_no` from commit-log file stats — zero IO. */
  def highWater: Option[Long] = {
    val bs = statsStore.log.liveFiles()
      .flatMap(_.stats.get("batch_no")).map(_.max).filter(_.nonEmpty)
    if (bs.isEmpty) None else Some(bs.map(_.toLong).max)
  }

  /** Fold one batch's counts into the store. Returns true if the
    * batch was ingested, false if the high-water mark already covers
    * it (idempotent re-run). */
  def ingest(batch: DataFrame, textCol: String, targetPred: Column,
      batchNo: Long): Boolean = {
    val hwm = highWater
    if (hwm.exists(_ >= batchNo)) return false
    val counts = Selection.bucketCounts(batch, textCol, targetPred, numBuckets)
      .withColumn("batch_no", lit(batchNo))
    statsStore.bulkInsert(counts)
    true
  }

  /** The model fitted on everything ingested so far: aggregate the
    * O(numBuckets · batches) store rows back to per-bucket totals —
    * identical to the batch operator's pass-1 statistic on the union
    * corpus — then quantize. */
  def currentRatio(): (Array[Long], Long) = {
    val totals = statsStore.read()
      .groupBy("bucket")
      .agg(sum("ct").as("ct"), sum("cr").as("cr"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    Selection.fitRatio(totals, numBuckets)
  }

  /** Score any frame against the current model and keep the top-k —
    * [[Selection.dsirSelect]]'s pass 2 with the store's statistics. */
  def selectTopK(docs: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    val (lq, cN) = currentRatio()
    Selection.scoreWithRatio(docs, idCol, textCol, numBuckets, lq, cN, topK)
  }
}
