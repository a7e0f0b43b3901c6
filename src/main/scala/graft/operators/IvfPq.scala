package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ: the two ANN halves composed (Jégou et al. 2011 §V — the
  * layout every large-scale vector store uses). [[IvfIndex]] prunes:
  * a query reads only its `nProbe` nearest coarse lists. [[Pq]]
  * compresses: within those lists the scan touches m-int codes, not
  * d-float vectors (~32× fewer bytes at 64-dim/8-sub), scored by ADC
  * lookup tables that ride in the plan.
  *
  * At 100 TB the economics multiply: IVF cuts the scanned fraction to
  * nProbe/nLists, PQ cuts the bytes per scanned row — a query's IO is
  * `corpus × nProbe/nLists / compression`, and nothing shuffles (the
  * probed-partition scan is map-only + TakeOrdered).
  *
  * Build persists three relations under `path`: the coarse centroids
  * and raw assignments ([[IvfIndex.build]]'s layout, kept so exact
  * re-ranking remains possible), the PQ codebooks, and the encoded
  * codes PARTITIONED BY LIST — the relation queries actually scan.
  *
  * Contract (Round19Spec): full probe + lossless codebooks ≡ exact
  * inner-product top-k; partial probe scans only probed list
  * directories (inputFiles-asserted). */
object IvfPq {

  /** Build coarse index + codebooks + encoded codes. */
  def build(embs: DataFrame, idCol: String, vecCol: String,
      nLists: Int, m: Int, codesPerSub: Int, path: String): Pq.Codebooks = {
    val spark = embs.sparkSession
    IvfIndex.build(embs, idCol, vecCol, nLists, path)
    val cb = Pq.train(embs, idCol, vecCol, m, codesPerSub)
    // persist codebooks (m × k × subDim doubles — metadata-scale)
    import spark.implicits._
    cb.codes.zipWithIndex.flatMap { case (book, sub) =>
      book.zipWithIndex.map { case (c, code) => (sub, code, c.toSeq) }
    }.toSeq.toDF("sub", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/pq_codebooks.parquet")
    // encode the assignments relation and lay codes out by list
    val asg = spark.read.parquet(s"$path/assignments")
    Pq.encode(asg, "id", "vec", cb)
      .write.mode("overwrite").partitionBy("list").parquet(s"$path/pq_codes")
    cb
  }

  /** Reload persisted codebooks. */
  def codebooks(spark: SparkSession, path: String): Pq.Codebooks = {
    val rows = spark.read.parquet(s"$path/pq_codebooks.parquet")
      .orderBy("sub", "code").collect()
    val m = rows.map(_.getInt(0)).max + 1
    val books = Array.tabulate(m) { sub =>
      rows.filter(_.getInt(0) == sub).sortBy(_.getInt(1))
        .map(_.getSeq[Double](2).toArray)
    }
    Pq.Codebooks(m, books(0)(0).length, books)
  }

  /** Result of one incremental [[append]]: how much landed, the new
    * corpus size, and the drift statistic. `driftRatio` is the batch's
    * mean assigned-centroid distance over the BUILD-time mean — ~1.0
    * means the frozen coarse quantizer still fits the incoming
    * distribution; a sustained rise (rule of thumb: > 1.5) says the
    * lists have drifted off the data and a retrain ([[build]]) will
    * recover recall. -1 when the index predates the baseline field. */
  final case class AppendStats(appended: Long, corpusCount: Long,
      batchMeanDist: Double, buildMeanDist: Double, driftRatio: Double)

  /** Incremental maintenance — real vector stores append; a full
    * retrain per batch would re-shuffle the whole corpus. New vectors
    * are assigned and PQ-encoded against the FIXED persisted
    * centroids/codebooks and appended to the existing list partitions
    * (the [[IncrementalDedup]] deployment shape applied to the vector
    * index): marginal cost is O(batch) — one map-only assignment +
    * encode pass over the batch, no history rescan, no retraining.
    * Queries see appended vectors immediately: [[topK]] prunes by list
    * directory, and appends land inside those directories.
    *
    * Appending against frozen codebooks is EXACT with respect to the
    * frozen index (spec: append-path topK ≡ rebuild-at-fixed-codebooks
    * topK); what degrades over time is the FIT of the frozen quantizer
    * to a drifting distribution — which is what the returned drift
    * statistic monitors. Caller owns id uniqueness (same contract as
    * build).
    *
    * Failure contract: the two relation appends + the meta write are
    * NOT one atomic commit, so each append journals under
    * `_appends/` — an `.inprogress` marker goes down first and flips
    * to `.done` only after everything landed. A crash in between
    * leaves the marker, and the NEXT append (or any caller checking)
    * fails loudly demanding a rebuild instead of serving an index
    * whose assignments and codes disagree. Pass a stable `batchId` to
    * make retries idempotent: a batch whose `.done` marker exists is
    * skipped (0 appended) rather than double-appended. */
  def append(batch: DataFrame, idCol: String, vecCol: String,
      path: String, batchId: Option[String] = None): AppendStats = {
    val spark = batch.sparkSession
    val meta = IvfIndex.meta(path).getOrElse(throw new IllegalArgumentException(
      s"no IVF-PQ index at $path — build() first"))
    require(meta.idCol == idCol && meta.vecCol == vecCol,
      s"index at $path was built over (${meta.idCol}, ${meta.vecCol}), " +
      s"append called with ($idCol, $vecCol)")
    import java.nio.file.{Files, Paths}
    val appDir = Paths.get(path, "_appends")
    Files.createDirectories(appDir)
    val leftover = graft.util.Fs.list(appDir)(_
      .filter(_.getFileName.toString.endsWith(".inprogress")).toSeq)
    require(leftover.isEmpty,
      s"IVF-PQ index at $path has a half-applied append " +
      s"(${leftover.map(_.getFileName).mkString(", ")}) — its assignments " +
      "and codes may disagree; rebuild() the index")
    val id = batchId.getOrElse(
      s"${System.currentTimeMillis()}-${java.util.UUID.randomUUID()}")
    if (Files.exists(appDir.resolve(s"$id.done")))
      return AppendStats(0L, meta.corpusCount, 0.0, meta.meanAssignDist, -1.0)
    val b = batch.select(col(idCol).as("id"), col(vecCol).as("vec")).persist()
    try {
      // ONE pass answers both emptiness and the dim probe, BEFORE the
      // codebook/centroid loads — idle streaming micro-batches hit
      // append on every epoch and must not pay two parquet collects
      val probe = b.agg(count(lit(1)), first(size(col("vec")))).first()
      val n = probe.getLong(0)
      if (n == 0L)
        return AppendStats(0L, meta.corpusCount, 0.0, meta.meanAssignDist, -1.0)
      // a wrong-dimension batch would silently mis-assign (the distance
      // loops compare only the common prefix) and mis-slice PQ subvectors
      require(probe.getInt(1) == meta.dim,
        s"batch vectors are ${probe.getInt(1)}-dim; index at " +
        s"$path was built over ${meta.dim}-dim vectors")
      val cb = codebooks(spark, path)
      val table = spark.read.parquet(s"$path/centroids.parquet")
        .orderBy("list").collect()
        .map(_.getAs[Seq[Double]]("centroid").toArray)
      val marker = appDir.resolve(s"$id.inprogress")
      Files.writeString(marker, "")
      val asg = b.withColumn("list",
        element_at(graft.functions.GraftExpressions
          .nearest_centroids(col("vec"), table, 1), 1))
      asg.write.mode("append").partitionBy("list").parquet(s"$path/assignments")
      Pq.encode(asg, "id", "vec", cb)
        .write.mode("append").partitionBy("list").parquet(s"$path/pq_codes")
      val batchMean = b.select(avg(graft.functions.GraftExpressions
        .nearest_centroid_dist(col("vec"), table))).first().getDouble(0)
      val newMeta = meta.copy(corpusCount = meta.corpusCount + n)
      Files.write(Paths.get(path, "meta.json"),
        graft.core.CommitLog.mapper.writeValueAsBytes(newMeta))
      Files.move(marker, appDir.resolve(s"$id.done"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      AppendStats(n, newMeta.corpusCount, batchMean, meta.meanAssignDist,
        if (meta.meanAssignDist > 0) batchMean / meta.meanAssignDist else -1.0)
    } finally { b.unpersist(); () }
  }

  /** Streaming index maintenance: a foreachBatch sink that [[append]]s
    * every micro-batch to the persisted index — the vector-store
    * deployment shape (embeddings arrive as a stream; the index must
    * not be rebuilt per batch). Exactly-once across restarts comes
    * from the (queryId, epoch) idempotence key — the SAME contract as
    * the graft streaming sink: queryId is CHECKPOINT-derived, so a
    * restart from the same checkpoint replays epochs onto their
    * existing `.done` markers (no-ops), while a FRESH checkpoint mints
    * a new queryId whose keys can never collide with stale markers —
    * a static name there would silently drop the re-delivered data.
    * (A fresh checkpoint also makes the source re-deliver from scratch,
    * which duplicates rows in an append-only index — same as any
    * new-query append of already-indexed data; dedup of ids is the
    * caller's contract, as with [[build]].) `streamName` is the
    * fallback key component for the off-chance Spark stops publishing
    * the queryId thread property. Monitor drift by logging
    * [[append]]'s AppendStats per batch. */
  def appendStream(stream: DataFrame, idCol: String, vecCol: String,
      path: String, streamName: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, epoch: Long) =>
        val qid = Option(df.sparkSession.sparkContext
            .getLocalProperty("sql.streaming.queryId"))
          .getOrElse(streamName)
        append(df, idCol, vecCol, path, batchId = Some(s"$qid-$epoch"))
        ()
      }
      .start()

  /** Single-query top-k: probe the `nProbe` coarse lists nearest the
    * query (driver-side over the nLists×dim centroid table), scan
    * ONLY those code partitions, ADC-score, TakeOrdered. */
  def topK(spark: SparkSession, path: String, cb: Pq.Codebooks,
      queryVec: Array[Double], k: Int, nProbe: Int): DataFrame = {
    require(nProbe > 0, s"nProbe=$nProbe")
    val cents = spark.read.parquet(s"$path/centroids.parquet")
      .orderBy("list").collect()
      .map(r => r.getInt(0) -> r.getAs[Seq[Double]]("centroid").toArray)
    val probed = cents.map { case (list, c) =>
      var d = 0.0; var j = 0
      while (j < c.length) { val t = queryVec(j) - c(j); d += t * t; j += 1 }
      (list, d)
    }.sortBy { case (list, d) => (d, list) }.take(nProbe).map(_._1)
    val codes = spark.read.parquet(s"$path/pq_codes")
      .filter(col("list").isin(probed.toIndexedSeq: _*))
    Pq.adcTopK(codes, "id", cb, queryVec, k)
  }

  /** Two-stage retrieval — the standard compressed-index REFINE step
    * (Jégou '11 §V.D): ADC scores are quantized approximations, so
    * production queries take the ADC top-`candidates` (cheap: code
    * bytes only) and RE-RANK just those against the RAW vectors the
    * build already persists, returning the exact-inner-product top-k.
    * IO stays two pruned reads — nProbe list partitions of codes, then
    * the same partitions of assignments joined to ≤ `candidates` ids
    * (a broadcast of KBs) — and the exact math touches `candidates`
    * rows, never the corpus. With `candidates` ≫ k the result equals
    * exact search over the probed lists (spec-pinned); the gap that
    * remains is coarse-quantizer recall, which nProbe controls. */
  def topKRerank(spark: SparkSession, path: String, cb: Pq.Codebooks,
      queryVec: Array[Double], k: Int, nProbe: Int,
      candidates: Int): DataFrame = {
    require(candidates >= k, s"candidates=$candidates must be >= k=$k")
    val cents = spark.read.parquet(s"$path/centroids.parquet")
      .orderBy("list").collect()
      .map(r => r.getInt(0) -> r.getAs[Seq[Double]]("centroid").toArray)
    val probed = cents.map { case (list, c) =>
      var d = 0.0; var j = 0
      while (j < c.length) { val t = queryVec(j) - c(j); d += t * t; j += 1 }
      (list, d)
    }.sortBy { case (list, d) => (d, list) }.take(nProbe).map(_._1)
    val cand = Pq.adcTopK(
      spark.read.parquet(s"$path/pq_codes")
        .filter(col("list").isin(probed.toIndexedSeq: _*)),
      "id", cb, queryVec, candidates).select("id")
    val q = array(queryVec.toIndexedSeq.map(lit): _*)
    val exact = expr(
      "aggregate(zip_with(vec, q, (x, y) -> x * y), 0D, (a, x) -> a + x)")
    spark.read.parquet(s"$path/assignments")
      // candidate ids can only live in probed lists — the list filter
      // makes the pruning REAL (a bare id join would scan every
      // assignments partition and filter rows after the fact)
      .filter(col("list").isin(probed.toIndexedSeq: _*))
      .join(broadcast(cand), Seq("id"))
      .withColumn("q", q)
      .withColumn("score", exact)
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
      .select("id", "score")
  }
}
