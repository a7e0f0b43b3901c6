package graft.operators

import graft.core.{GraftTable, TableConfig}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental minhash-LSH dedup: the ingest-time shape of
  * [[Dedup.minhashLsh]]. The corpus's band signatures and shingle-hash
  * arrays persist as TWO graft tables (atomic commits, incremental
  * reads for free); each arriving batch dedups against everything seen
  * so far by joining its bands against the index — it never recomputes
  * or reshuffles the historical corpus.
  *
  * Per-batch cost at 100 TB:
  *  - the batch side is shingled/hashed once (O(batch));
  *  - cross-corpus candidates come from ONE scan of the band index
  *    joined against the BROADCAST batch bands — the corpus streams
  *    map-side, no shuffle of it anywhere (the index scan is IO-bound
  *    and prunable by partition once the index is clustered);
  *  - batch-internal candidates use the same bucket expansion as the
  *    batch operator;
  *  - exact verification joins candidate PAIRS to the hash store —
  *    O(candidates), and only the two docs of each pair are read.
  *
  * Equivalence contract (tested): running batches b₁…bₙ through
  * [[dedupBatch]] and unioning the outputs yields EXACTLY
  * `Dedup.minhashLsh(b₁ ∪ … ∪ bₙ)` as an unordered pair set — the
  * incremental path inherits the batch operator's oracle gate
  * transitively.
  */
class IncrementalDedup(spark: SparkSession, root: String,
    k: Int = 5, numHashes: Int = 128, numBands: Int = 32,
    threshold: Double = 0.7) {

  private val rowsPerBand = numHashes / numBands

  /** (id, hashes, _b) keyed by id — the per-doc shingle-hash arrays the
    * verification stage reads. Few buckets: the store is append-mostly
    * and read whole, so files-per-commit is the cost that matters
    * (at real scale, size numBuckets for ~1 GB groups as usual). */
  val hashStore: GraftTable = GraftTable.create(spark, s"$root/hashes",
    TableConfig(name = "dedup_hashes", keyField = "id",
      orderingField = "_b", numBuckets = 2))

  /** (bkey, band, bsig, id, _b) keyed by id:band, partitioned by band —
    * the LSH index the cross-corpus candidate join scans. The band
    * partitioning already spreads writes `numBands` ways; extra buckets
    * per band only multiply files-per-commit (numBands × buckets ×
    * commits tiny files measurably dominated the per-batch cost). */
  val bandIndex: GraftTable = GraftTable.create(spark, s"$root/bands",
    TableConfig(name = "dedup_bands", keyField = "bkey",
      orderingField = "_b", partitionField = Some("band"), numBuckets = 1))

  /** Fold the stores' accumulated per-commit files via the clustering
    * service (sorted, size-packed rewrite per file group — the COW
    * small-file answer) — run periodically like any table maintenance;
    * per-batch dedup cost then stays O(batch + collisions) with a
    * bounded file count. */
  def compactStores(): Unit = {
    graft.core.TableServices.cluster(hashStore)
    graft.core.TableServices.cluster(bandIndex)
  }

  /** Dedup one arriving batch against everything ingested before it,
    * then fold the batch into the index. Returns verified near-dup
    * pairs (doc_a < doc_b) where at least one side is from this batch.
    * `batchNo` stamps the ordering field (any monotone value works). */
  def dedupBatch(batch: DataFrame, idCol: String, textCol: String,
      batchNo: Long): DataFrame = {
    val withHashes = batch.select(col(idCol).as("id"),
        shingleHashes(col(textCol), k).as("hashes"))
      .persist()
    try {
      val sigs = withHashes
        .withColumn("sig", minhashSignature(col("hashes"), numHashes))
        .withColumn("band", explode(lshBands(col("sig"), numBands, rowsPerBand)))
        .select(col("id"), col("band.band").as("band"), col("band.sig").as("bsig"))
        .persist()
      try {
        // cross-corpus: historical index streams against the broadcast
        // batch bands — pair order is normalized with least/greatest
        // (arrival order ≠ id order). First batch: no history yet, so
        // candidates are batch-internal only (keeps id-type agnostic —
        // no hardcoded empty frame).
        val hasHistory = bandIndex.log.lastInstant().nonEmpty
        def cross = bandIndex.read()
          .select(col("band"), col("bsig"), col("id").as("old_id"))
          .join(broadcast(
            sigs.select(col("band"), col("bsig"), col("id").as("new_id"))),
            Seq("band", "bsig"))
          .filter(col("old_id") =!= col("new_id"))
          .select(least(col("old_id"), col("new_id")).as("doc_a"),
            greatest(col("old_id"), col("new_id")).as("doc_b"))
        // batch-internal: the same guarded bucket expansion as
        // Dedup.minhashLsh (chunked, size-capped)
        val internal = Dedup.bucketPairs(
          sigs.groupBy("band", "bsig")
            .agg(sort_array(collect_list(col("id"))).as("ids"))
            .filter(size(col("ids")) > 1),
          "ids", "struct(__x AS doc_a, y AS doc_b)")
          .select(col("p.doc_a"), col("p.doc_b"))
        val candidates =
          (if (hasHistory) cross.union(internal) else internal).distinct()
        // verify against new + historical hashes; only candidate pairs'
        // docs are ever fetched from the store
        val newHashes = withHashes.select("id", "hashes")
        val allHashes =
          if (!hasHistory) newHashes
          else newHashes.unionByName(hashStore.read().select("id", "hashes"))
        val verified = Dedup
          .jaccardOfCandidates(allHashes, candidates, threshold)
          .localCheckpoint()
        // fold the batch in AFTER querying (a batch never pairs with
        // itself through the index — internal pairs covered above)
        hashStore.bulkInsert(withHashes.withColumn("_b", lit(batchNo)))
        bandIndex.bulkInsert(sigs
          .withColumn("bkey", concat_ws(":", col("id"), col("band")))
          .withColumn("_b", lit(batchNo)))
        verified
      } finally sigs.unpersist()
    } finally withHashes.unpersist()
  }
}
