package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for ANN (Jégou, Douze & Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): split each
  * d-dim vector into `m` subvectors, vector-quantize each subspace
  * against its own small codebook, and answer queries by Asymmetric
  * Distance Computation — the query stays exact, every corpus vector
  * is approximated by its m one-byte-ish codes, and a score is m
  * table lookups instead of d multiplies.
  *
  * This is the compression half of the IVF-PQ pairing ([[IvfIndex]]
  * is the pruning half): at 100 TB the encoded corpus is m ints per
  * vector (64-dim float → 8 codes ≈ 32× smaller), scanning it is
  * memory-bandwidth-bound, and the plan is MAP-ONLY — the per-query
  * lookup tables ride in the plan as literals (m·k doubles,
  * metadata-scale) and the top-k is a TakeOrdered.
  *
  * Training mirrors [[IvfIndex.build]]'s discipline: Lloyd's k-means
  * per subspace on a BOUNDED deterministic sample (≈256 vectors per
  * code), driver-side — the sample is capped, so collecting it is the
  * same metadata-scale move as the IVF centroid table; only encoding
  * touches the full corpus, in one pass. Everything is deterministic:
  * md5-sampled training set, lowest-id seeding, fixed iteration
  * count, index-ascending tie-breaks.
  *
  * Contract (Round19Spec): with `codesPerSub` ≥ the number of
  * distinct subvectors, encoding is LOSSLESS and [[adcTopK]] returns
  * exactly the brute-force inner-product top-k; at lossy settings
  * recall is spec-bounded on a clustered fixture.
  */
object Pq {

  /** Per-subspace codebooks: codes(sub)(code) is a subDim-long
    * centroid. */
  case class Codebooks(m: Int, subDim: Int,
      codes: Array[Array[Array[Double]]]) {
    def k: Int = codes(0).length
    def dim: Int = m * subDim
  }

  /** Train per-subspace codebooks on a bounded deterministic sample.
    * `iterations` Lloyd rounds; empty clusters keep their seed. */
  /** `corpusCount` (when ≥ 0) replaces the train's own `count()` job —
    * same threading contract as [[IvfIndex.build]]. */
  def train(embs: DataFrame, idCol: String, vecCol: String,
      m: Int, codesPerSub: Int, iterations: Int = 8,
      corpusCount: Long = -1L): Codebooks = {
    require(m > 0, s"m=$m")
    require(codesPerSub > 0 && codesPerSub <= 65536, s"codesPerSub=$codesPerSub")

    // bounded deterministic training sample → driver (≤ 256·k rows of
    // dim doubles — the IVF centroid-table argument)
    val count = if (corpusCount >= 0L) corpusCount else embs.count()
    val target = 256L * codesPerSub
    val sampled =
      if (count <= target) embs
      else Curation.deterministicSample(embs, idCol, target.toDouble / count)
    val train: Array[Array[Double]] = sampled
      .orderBy(col(idCol))
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(train.nonEmpty, "empty training set")
    // dim from the collected sample — the separate size().first()
    // probe was one more Spark job per train
    val dim = train(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m

    val books = Array.tabulate(m) { sub =>
      val off = sub * subDim
      val pts = train.map(v => java.util.Arrays.copyOfRange(v, off, off + subDim))
      lloyd(pts, math.min(codesPerSub, pts.length), iterations, codesPerSub)
    }
    Codebooks(m, subDim, books)
  }

  /** Driver-side Lloyd on the bounded sample, seeded by DETERMINISTIC
    * farthest-point traversal (first point, then repeatedly the point
    * maximizing distance to its nearest chosen seed, ties by index —
    * the k-means++ idea without its RNG): seeds spread across
    * clusters even when the id-ordered sample is cluster-sorted,
    * where first-k seeding collapses whole clusters into one code.
    * Assign by L2 with index-ascending ties, recompute means,
    * `iterations` times. Pads to `padTo` codebook slots by repeating
    * the last centroid so encode/score never sees an out-of-range
    * code. */
  private def lloyd(pts: Array[Array[Double]], k: Int, iterations: Int,
      padTo: Int): Array[Array[Double]] = {
    // k ≥ n (the lossless-codebook setting the exactness gates use):
    // every point becomes a seed anyway, so the farthest-point
    // traversal below — O(n²·subDim) driver flops whose only output
    // is a PERMUTATION of the points — is skipped and the seeds are
    // the points in sample order. Code indexes permute vs the
    // traversal order, but a code is only ever DECODED (ADC sums the
    // looked-up centroid values); no score, rank or id can change.
    // Lloyd is likewise a no-op here (singleton clusters, mean = p/1),
    // matching the seedIdx.length == pts.length skip below.
    if (k >= pts.length) {
      val cents = pts.map(_.clone())
      return if (cents.length >= padTo) cents
      else cents ++ Array.fill(padTo - cents.length)(cents.last.clone())
    }
    val seedIdx = scala.collection.mutable.ArrayBuffer(0)
    val minD = pts.map(p => dist2(p, pts(0)))
    var exhausted = false // fewer than k distinct points
    while (seedIdx.length < k && !exhausted) {
      var best = -1; var bestD = -1.0
      var i = 0
      while (i < pts.length) {
        if (minD(i) > bestD) { bestD = minD(i); best = i }
        i += 1
      }
      if (bestD <= 0.0) exhausted = true // padTo fills the rest below
      else {
        seedIdx += best
        var j = 0
        while (j < pts.length) {
          val d = dist2(pts(j), pts(best))
          if (d < minD(j)) minD(j) = d
          j += 1
        }
      }
    }
    var cents = seedIdx.map(i => pts(i).clone()).toArray
    // Fixed-point shortcuts (bit-exact, results unchanged):
    //  - every point its own seed (k ≥ n, all points distinct — the
    //    lossless-codebook setting the exactness gates use): each point
    //    assigns to itself at distance 0, every cluster is a singleton,
    //    and mean = p/1 = p exactly, so Lloyd is a no-op from iteration
    //    one — skip it entirely instead of paying `iterations` × O(n·k·
    //    subDim) of driver flops re-deriving the seeds;
    //  - otherwise, stop as soon as an iteration reproduces its input
    //    centroids BITWISE: one iteration is a pure function of `cents`
    //    (deterministic assignment order, fixed summation order), so a
    //    fixed point stays fixed for every remaining iteration.
    var iter = if (seedIdx.length == pts.length) iterations else 0
    var converged = false
    while (iter < iterations && !converged) {
      val sums = Array.fill(cents.length)(new Array[Double](pts(0).length))
      val ns = new Array[Long](cents.length)
      pts.foreach { p =>
        val c = nearest(cents, p)
        ns(c) += 1
        var j = 0
        while (j < p.length) { sums(c)(j) += p(j); j += 1 }
      }
      val next = cents.indices.map { c =>
        if (ns(c) == 0L) cents(c)
        else sums(c).map(_ / ns(c))
      }.toArray
      converged = next.indices.forall(c =>
        java.util.Arrays.equals(next(c), cents(c)))
      cents = next
      iter += 1
    }
    if (cents.length >= padTo) cents
    else cents ++ Array.fill(padTo - cents.length)(cents.last.clone())
  }

  private def dist2(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var j = 0
    while (j < a.length) { val t = a(j) - b(j); d += t * t; j += 1 }
    d
  }

  private def nearest(cents: Array[Array[Double]], p: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0; var j = 0
      while (j < p.length) { val t = p(j) - cents(c)(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Encode the corpus: every column except the vector survives, plus
    * `codes array<int>` — one map-only pass, each subspace assigned
    * via the native [[graft.functions.NearestCentroids]] expression
    * over the subvector slice. (Carrying the other columns through is
    * what lets [[IvfPq]] keep the coarse `list` alongside the codes.) */
  def encode(embs: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks): DataFrame = {
    val codeCols = (0 until cb.m).map { sub =>
      // nearest_centroids emits 0-BASED centroid indexes (cf. IvfIndex)
      element_at(graft.functions.GraftExpressions.nearest_centroids(
        slice(col(vecCol), sub * cb.subDim + 1, cb.subDim),
        cb.codes(sub), 1), 1)
    }
    embs.withColumn("codes", array(codeCols: _*)).drop(vecCol)
  }

  /** ADC top-k by inner product: per query, the per-(sub, code) dot
    * products form an m×k lookup table computed on the driver
    * (metadata-scale) and folded into the plan; each encoded row's
    * score is m `element_at`s summed inside codegen. */
  def adcTopK(encoded: DataFrame, idCol: String, cb: Codebooks,
      queryVec: Array[Double], k: Int): DataFrame = {
    require(queryVec.length == cb.dim,
      s"query dim ${queryVec.length} != index dim ${cb.dim}")
    require(k > 0, s"k=$k")
    val luts: Array[Array[Double]] = Array.tabulate(cb.m) { sub =>
      val off = sub * cb.subDim
      cb.codes(sub).map { c =>
        var d = 0.0; var j = 0
        while (j < cb.subDim) { d += queryVec(off + j) * c(j); j += 1 }
        d
      }
    }
    val score = (0 until cb.m).map { sub =>
      val lut = array(luts(sub).toIndexedSeq.map(lit): _*)
      // codes are 0-based, element_at is 1-based
      element_at(lut, (element_at(col("codes"), sub + 1) + lit(1)).cast("int"))
    }.reduce(_ + _)
    encoded
      .select(col(idCol), score.as("adc_score"))
      .orderBy(col("adc_score").desc, col(idCol).asc)
      .limit(k)
  }
}
