package graft.operators

import graft.functions.GraftExpressions.nearest_centroids
import graft.functions.VectorFunctions.cosine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Persisted IVF (inverted-file) ANN index — the Faiss-style coarse
  * quantizer as a TABLE SERVICE rather than a per-query computation
  * (the round-1 `Similarity.ivfTopK` recomputed centroids with a
  * corpus-wide shuffle + driver collect on every call; at 100 TB the
  * index must be built once and queried many times).
  *
  * Layout under `path`:
  * {{{
  *   meta.json                        {nLists, dim, corpusCount}
  *   centroids.parquet                (list int, centroid array<double>)
  *   assignments/list=<n>/…parquet    corpus rows + their list id
  * }}}
  *
  * Assignments are PARTITIONED BY list, so a query that probes
  * `nProbe` of `nLists` lists scans nProbe/nLists of the corpus via
  * partition pruning — the inverted-list property expressed in Spark's
  * own partition layout instead of a custom file format.
  *
  * Centroids come from Lloyd's k-means (deterministic init: the
  * `nLists` lowest-id vectors) trained on a bounded deterministic
  * sample (~256 vectors per centroid — the usual IVF training
  * budget), a few rounds of assign → per-dimension mean. Each round
  * shuffles (list, pos, x) triples of the SAMPLE only; the full
  * corpus is touched once, by the final assignment pass.
  */
object IvfIndex {

  /** `meanAssignDist` is the build-time mean squared-L2 distance of
    * corpus vectors to their assigned centroid — the baseline the
    * incremental drift monitor ([[IvfPq.append]]) compares batches
    * against; -1 on indexes persisted before the field existed. */
  case class Meta(nLists: Int, dim: Int, corpusCount: Long,
      idCol: String = "", vecCol: String = "",
      meanAssignDist: Double = -1.0)

  private val mapper = graft.core.CommitLog.mapper

  /** Train centroids and write the index. Returns the meta.
    *
    * `metaCols` persist ALONGSIDE the vectors in both relations (and
    * ride into [[Pq.encode]]'s codes, which carries every non-vector
    * column): they are the STORED-filter-column path for metadata-
    * filtered retrieval — a predicate over them pushes down into the
    * pruned parquet scan itself, costing nothing at any selectivity
    * (the id-set semi join alternative pays a shuffle when the
    * surviving set is broad). The stored relations are self-
    * describing: appends and refreezes recover the meta columns from
    * the assignments schema, so the meta.json format is unchanged. */
  /** `corpusCount` (when ≥ 0) replaces the build's own `count()` job —
    * callers with metadata counts (parquet footers, commit-log stats,
    * or a count already paid at the call site) thread it through so
    * the build never re-scans for a number the caller has. */
  def build(embs: DataFrame, idCol: String, vecCol: String,
      nLists: Int, path: String, iterations: Int = 4,
      metaCols: Seq[String] = Nil, corpusCount: Long = -1L): Meta = {
    val spark = embs.sparkSession
    require(!metaCols.exists(c =>
        Set("id", "vec", "list", "epoch").contains(c)),
      s"metaCols ${metaCols.mkString(",")} collide with the index's own " +
      "column names (id, vec, list, epoch)")
    // `epoch` orders row versions against update tombstones
    // ([[IvfPq.tombstone]]): build-time rows carry the empty epoch
    // (before every tombstone), appended rows carry their maintenance
    // instant. A stale tombstone relation from a previous index at
    // this path would poison the new one — clear it.
    graft.util.TempDirs.deleteRecursively(Paths.get(path, "tombstones"))
    val corpus = embs.select((col(idCol).as("id") +: col(vecCol).as("vec") +:
      lit("").as("epoch") +: metaCols.map(col)): _*).persist()
    try {
      val count = if (corpusCount >= 0L) corpusCount else corpus.count()
      // Train the quantizer on a BOUNDED deterministic sample (~256
      // vectors per centroid, the standard training budget — Lloyd's
      // means converge on a sample); only the final assignment below
      // touches the full corpus, in one pass. Without this, each
      // iteration pays a corpus-wide posexplode shuffle — a build-time
      // scale-killer at 100 TB.
      val targetTrain = 256L * nLists
      val train =
        if (count <= targetTrain) corpus
        else Curation.deterministicSample(corpus, "id",
          targetTrain.toDouble / count).persist()
      // The whole Lloyd loop runs on the DRIVER over the collected
      // sample: the sample is bounded (≤ ~256·nLists vectors — the same
      // bounded-collect discipline as the PQ training sample and the
      // BPE vocab cap), so `iterations` Spark aggregation rounds of
      // one exchange + one collect each were pure job overhead — the
      // flops are O(sample·nLists·dim) either way, but driver-side
      // they cost zero scheduler round-trips. Collected id-ordered so
      // the seed rule (nLists lowest-id vectors) and the per-list
      // float summation order are deterministic run-to-run — STRONGER
      // than the distributed aggregation, whose shuffle-merge order
      // varied per run (the gates are exactness-constructed, so
      // centroid ULPs cannot move results; re-verified at 3 SFs).
      // Assignment math mirrors NearestCentroids exactly: squared L2,
      // ties by lowest index.
      val sample: Array[Array[Double]] = train.orderBy("id")
        .select(col("vec").cast("array<double>")).collect()
        .map(_.getSeq[Double](0).toArray)
      // dim from the already-collected sample — the separate
      // `select(size(vec)).first()` probe was one more Spark job per
      // build; the scan fallback only fires for a pathologically empty
      // sample over a non-empty corpus
      val dim = if (sample.nonEmpty) sample(0).length
        else corpus.select(size(col("vec"))).first().getInt(0)
      // validate ONCE at build time: a ragged corpus would otherwise
      // train on truncated distances here and fail obscurely at query
      // time (the old posexplode path silently zero-padded instead)
      sample.zipWithIndex.foreach { case (v, i) => require(v.length == dim,
        s"ragged vector at sample row $i: length ${v.length}, expected $dim") }
      var table: Array[Array[Double]] =
        if (sample.length >= nLists) sample.take(nLists).map(_.clone())
        else corpus.orderBy("id").limit(nLists)
          .select(col("vec").cast("array<double>")).collect()
          .map(_.getSeq[Double](0).toArray)
      def nearestList(v: Array[Double]): Int = {
        var best = Double.MaxValue; var bestC = 0; var c = 0
        while (c < table.length) {
          val cv = table(c); var d = 0.0; var i = 0
          val m = math.min(v.length, cv.length)
          while (i < m) { val t = v(i) - cv(i); d += t * t; i += 1 }
          if (d < best) { best = d; bestC = c } // strict <: ties keep lowest index
          c += 1
        }
        bestC
      }
      var iter = 0
      while (iter < iterations) {
        val sums = Array.fill(table.length)(new Array[Double](dim))
        val cnts = new Array[Long](table.length)
        sample.foreach { v =>
          val l = nearestList(v)
          cnts(l) += 1
          var i = 0; while (i < dim) { sums(l)(i) += v(i); i += 1 }
        }
        // a list that lost all members keeps its previous centroid
        table = table.indices.map { c =>
          if (cnts(c) == 0L) table(c)
          else { val m = sums(c); var i = 0
            while (i < dim) { m(i) /= cnts(c); i += 1 }; m }
        }.toArray
        iter += 1
      }
      if (train ne corpus) { train.unpersist(); () }
      val cdf = spark.createDataFrame(
        table.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq)
        .toDF("list", "centroid")
      cdf.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids.parquet")
      corpus
        .withColumn("list", element_at(nearest_centroids(col("vec"), table, 1), 1))
        .write.mode("overwrite").partitionBy("list").parquet(s"$path/assignments")
      // drift baseline: mean assigned-centroid distance over the (still
      // cached) corpus — one cache-resident aggregate, no extra IO pass
      val meanDist = corpus.select(avg(
        graft.functions.GraftExpressions.nearest_centroid_dist(col("vec"), table)))
        .first().getDouble(0)
      val meta = Meta(nLists, dim, count, idCol, vecCol, meanDist)
      Files.createDirectories(Paths.get(path))
      Files.write(Paths.get(path, "meta.json"), mapper.writeValueAsBytes(meta))
      meta
    } finally corpus.unpersist()
  }

  def meta(path: String): Option[Meta] = {
    val p = Paths.get(path, "meta.json")
    if (!Files.exists(p)) None
    else Some(mapper.readValue(Files.readAllBytes(p), classOf[Meta]))
  }

  /** Rebuild rule: the index is stale when the corpus row count moved
    * (the cheap high-signal check; callers with a table handle can use
    * the commit instant instead) — or when the index was built over a
    * DIFFERENT id/vector column: the persisted Meta records the full
    * column identity, so calling with other columns can never serve a
    * wrong index. In-place updates at identical count remain invisible
    * to this heuristic; `TableServices.buildVectorIndex` closes that
    * with its commit-instant stamp.
    *
    * Pass `corpusCount` from metadata when you have it — commit-log
    * stats for graft tables (`GraftTable.metadataRowCount`), parquet
    * footers for raw files (`Tables.footerRowCount`) — so a warm
    * staleness check costs zero Spark jobs; the `embs.count()`
    * fallback pays a corpus scan per check (same contract as
    * `Similarity.lshTopK`). */
  def buildIfStale(embs: DataFrame, idCol: String, vecCol: String,
      nLists: Int, path: String, corpusCount: Long = -1L): Meta = {
    lazy val liveCount = if (corpusCount >= 0L) corpusCount else embs.count()
    meta(path) match {
      case Some(m) if m.nLists == nLists && m.idCol == idCol &&
          m.vecCol == vecCol && m.corpusCount == liveCount => m
      case _ => build(embs, idCol, vecCol, nLists, path,
        corpusCount = liveCount)
    }
  }

  /** Top-k via the persisted index: centroids load once (nLists × dim
    * doubles), each query probes its `nProbe` nearest lists, and the
    * assignments scan is partition-pruned to exactly the probed lists —
    * no corpus-wide shuffle, no training work at query time. */
  /** `excludeSelf` drops the row whose id equals the query's id — the
    * contract when queries ARE corpus rows. Pass false for EXTERNAL
    * query vectors carrying a sentinel id: self-exclusion there would
    * silently drop a legitimate corpus row that happens to share the
    * sentinel value. */
  def topK(spark: SparkSession, path: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int,
      allowed: Option[DataFrame] = None,
      storedFilter: Option[org.apache.spark.sql.Column] = None,
      excludeSelf: Boolean = true): DataFrame = {
    val table = spark.read.parquet(s"$path/centroids.parquet")
      .orderBy("list").collect()
      .map(_.getAs[Seq[Double]]("centroid").toArray)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("list", explode(nearest_centroids(col("qvec"), table, nProbe)))
    // queries are the small side by contract; their probed-list union
    // drives partition pruning of the assignments scan
    val probed = q.select("list").distinct().collect().map(_.getInt(0))
    // metadata filter (the filtered-retrieval contract, IvfPq's shared
    // helper): the surviving id set semi-joins BEFORE ranking, so every
    // returned neighbor satisfies the predicate and no rank slot is
    // wasted
    // stored-column predicate (the build-time metaCols path): applied
    // straight to the pruned assignments scan, where it pushes into
    // the parquet read at any selectivity
    val base = storedFilter.foldLeft(
      spark.read.parquet(s"$path/assignments")
        .filter(col("list").isin(probed.toIndexedSeq: _*)))(_.filter(_))
    val filtered = IvfPq.applyAllowed(
      IvfPq.applyTombstones(base, path), allowed)
    val c = filtered
      .select(col("id").as("neighbor_id"), col("vec").as("cvec"), col("list"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val joined = c.join(broadcast(q), Seq("list"))
    (if (excludeSelf) joined.filter(col("query_id") =!= col("neighbor_id"))
     else joined)
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosine(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }
}
