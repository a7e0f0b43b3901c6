package graft

import graft.operators.{Dedup, IncrementalSemanticDedup, SemanticDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-23 claims.
  *
  * Incremental SemDeDup equivalence (the [[graft.operators.IncrementalDedup]]
  * pattern applied to the last batch-only dedup-family member): with the
  * coarse quantizer frozen on the union corpus, streaming the corpus
  * through [[IncrementalSemanticDedup.dedupBatch]] in batches must
  * reproduce the batch operator exactly — pair set, group partitions,
  * centroid cosines — on tight-duplicate corpora (all intra-group pairs
  * ≥ threshold, the regime SemDeDup is published for). */
class Round23Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private val dim = 16
  private val threshold = 0.95

  /** The SemanticDedupSpec corpus: 40 near-orthogonal unit vectors,
    * a tight duplicate for every 4th, a second for every 8th. */
  private def corpus: DataFrame = {
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val base = (0 until 40).map { i =>
      i.toLong -> unit(Array.fill(dim)(rnd.nextGaussian()))
    }
    val dups = base.collect { case (i, v) if i % 4 == 0 =>
      val copies = if (i % 8 == 0) 2 else 1
      (1 to copies).map { c =>
        (1000L * c + i) -> unit(v.map(_ + 0.004 * rnd.nextGaussian()))
      }
    }.flatten
    (base ++ dups).toDF("vec_id", "embedding")
  }

  private def tmp(tag: String) =
    graft.util.TempDirs.create(s"graft-r23-$tag-").toString

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)].collect().toSet

  test("3-batch incremental SemDeDup equals the batch operator on tight duplicates") {
    val c = corpus.cache(); c.count()
    val inc = new IncrementalSemanticDedup(spark, tmp("inc"),
      nClusters = 8, threshold = threshold)
    inc.freeze(c, "vec_id", "embedding")

    // stream the corpus in three interleaved batches (dup ids 1000+i /
    // 2000+i land in different batches than their originals)
    val batches = (0 until 3).map(i => c.filter(col("vec_id") % 3 === i))
    assert(batches.forall(_.count() > 0))
    val pairsUnion = batches.zipWithIndex
      .map { case (b, i) => inc.dedupBatch(b, "vec_id", "embedding", i + 1L) }
      .reduce(_ unionByName _).distinct()

    // (1) pair-set equality with exact all-pairs — the batch operator's
    // own gate regime (tight duplicates co-cluster, recall is total)
    val exact = Dedup.embeddingCosinePairs(c, "vec_id", "embedding", threshold)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    assert(pairSet(exact).nonEmpty, "corpus planted no duplicate pairs")
    assert(pairSet(pairsUnion) == pairSet(exact),
      "union of per-batch pairs diverges from exact all-pairs")

    // (2) verdict-store group partitions equal batch verdicts exactly
    // (canonical ids are min member id in both paths)
    val batchV = SemanticDedup.verdicts(c, "vec_id", "embedding",
      nClusters = 8, threshold = threshold, indexPath = tmp("batchidx"))
      .cache()
    val expGroups = batchV.select("vec_id", "group_id")
      .as[(Long, Long)].collect().toMap
    val gotV = inc.verdictStore.read()
      .select(col("vec_id").cast("long"), col("group_id").cast("long"),
        col("centroid_cos"), col("keep")).cache()
    val gotGroups = gotV.select("vec_id", "group_id")
      .as[(Long, Long)].collect().toMap
    assert(gotGroups == expGroups,
      s"incremental groups diverge: got $gotGroups exp $expGroups")

    // (3) exactly one keeper per group (tight groups grow monotonically
    // — no bridging, so the no-unrelease stream rule keeps exactly one)
    val keeps = gotV.filter(col("keep")).select("group_id", "vec_id")
      .as[(Long, Long)].collect()
    assert(keeps.map(_._1).distinct.length == keeps.length,
      "a group holds two keepers")
    assert(keeps.map(_._1).toSet == gotGroups.values.toSet,
      "a group lost its keeper")

    // (4) centroid cosines match the batch operator bit-for-bit: both
    // quantizers were trained deterministically on the same corpus
    val expCos = batchV.select("vec_id", "centroid_cos")
      .as[(Long, Double)].collect().toMap
    val gotCos = gotV.select("vec_id", "centroid_cos")
      .as[(Long, Double)].collect().toMap
    assert(gotCos == expCos, "centroid_cos diverged from the batch path")

    // (5) survivors: every group contributes exactly one, ungrouped
    // docs all survive
    val survivors = inc.survivors().select(col("vec_id").cast("long"))
      .as[Long].collect().toSet
    val allIds = c.select("vec_id").as[Long].collect().toSet
    val grouped = gotGroups.keySet
    assert((allIds -- grouped).subsetOf(survivors))
    gotGroups.values.toSet.foreach { (g: Long) =>
      val members = gotGroups.filter(_._2 == g).keySet
      assert((members & survivors).size == 1,
        s"group $g released ${(members & survivors).size} members")
    }
    gotV.unpersist(); batchV.unpersist(); c.unpersist()
  }

  test("re-running the latest batch is crash recovery: identical state, identical pairs") {
    val c = corpus.cache(); c.count()
    val inc = new IncrementalSemanticDedup(spark, tmp("rec"),
      nClusters = 8, threshold = threshold)
    inc.freeze(c, "vec_id", "embedding")
    val b1 = c.filter(col("vec_id") % 2 === 0)
    val b2 = c.filter(col("vec_id") % 2 === 1)
    inc.dedupBatch(b1, "vec_id", "embedding", 1L).count()
    val firstRun = pairSet(inc.dedupBatch(b2, "vec_id", "embedding", 2L))
    def state() = inc.verdictStore.read()
      .select(col("vec_id").cast("long"), col("group_id").cast("long"),
        col("keep"))
      .as[(Long, Long, Boolean)].collect().toSet
    val s1 = state()
    val members1 = inc.members.read().count()
    // the recovery contract: only the LATEST batch may re-run
    val reRun = pairSet(inc.dedupBatch(b2, "vec_id", "embedding", 2L))
    assert(reRun == firstRun, "recovery re-run returned different pairs")
    assert(state() == s1, "recovery re-run mutated the verdict store")
    assert(inc.members.read().count() == members1,
      "recovery re-run double-inserted members")
    // monotonicity is enforced: an older batch number is refused
    val ex = intercept[IllegalArgumentException] {
      inc.dedupBatch(b1, "vec_id", "embedding", 1L)
    }
    assert(ex.getMessage.contains("monotone"))
    c.unpersist()
  }

  test("freeze refuses to retrain under persisted assignments") {
    val c = corpus
    val inc = new IncrementalSemanticDedup(spark, tmp("frz"),
      nClusters = 8, threshold = threshold)
    inc.freeze(c, "vec_id", "embedding")
    inc.dedupBatch(c.limit(10), "vec_id", "embedding", 1L).count()
    val ex = intercept[IllegalArgumentException] {
      inc.freeze(c, "vec_id", "embedding")
    }
    assert(ex.getMessage.contains("frozen"))
  }
}
