package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns — no UDF,
  * no shuffle. The pairwise cosine is the native [[CosineSim]]
  * expression; `dot`/`norm` remain higher-order-function trees for
  * callers that need the pieces (note: HOFs are CodegenFallback, i.e.
  * interpreted per row — keep them OFF per-pair hot paths).
  *
  * Arithmetic contract (shared with the DuckDB oracle): every element
  * is widened float→double *before* multiplying, and sums are
  * sequential left folds — so both engines produce bit-identical
  * doubles and threshold/ordering decisions can never diverge.
  * [[CosineSim]] implements exactly this contract (asserted
  * bit-for-bit against the HOF tree in PipelineSpec, and against
  * DuckDB by the p5/p6/p7/p14/p15 oracle gates).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double, sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ in double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a,b) = a·b / (‖a‖‖b‖) — native expression, not the
    * interpreted HOF tree. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftExpressions.cosine_sim(a, b)

  /** The HOF formulation of cosine, kept as the reference
    * implementation [[CosineSim]] is tested against. */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit LSH signature for angular similarity: `numPlanes` random
    * hyperplanes (deterministic per `seed`), bit i = sign(a·rᵢ). Public
    * technique: Charikar 2002 random-hyperplane LSH. Returns a long. */
  def hyperplaneSignature(a: Column, dim: Int, numPlanes: Int = 16,
      seed: Long = 7L): Column = {
    val rnd = new java.util.Random(seed)
    val planes = Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
    planes.zipWithIndex.map { case (p, i) =>
      val pArr = array(p.map(lit).toIndexedSeq: _*)
      val d = aggregate(
        zip_with(a, pArr, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** Multi-table LSH keys (OR-construction, Indyk–Motwani): one
    * (table, bucket) struct per table, each bucket from an independent
    * `bitsPerTable`-plane signature. Few bits per table keeps per-table
    * collision probability workable at moderate similarity; many tables
    * drive recall up: P[hit] = 1 - (1 - p^b)^L. */
  def lshTableKeys(a: Column, dim: Int, numTables: Int, bitsPerTable: Int): Column = {
    // all tables' plane dot-products fused into one native pass (the
    // HOF equivalent paid the interpreted-lambda tax per multiply)
    val buckets = GraftExpressions
      .hyperplane_buckets(a, dim, numTables, bitsPerTable)
    transform(buckets, (b, i) => struct(i.as("table"), b.as("bucket")))
  }
}
