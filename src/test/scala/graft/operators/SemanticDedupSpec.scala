package graft.operators

import graft.Session
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup equivalence gate: on a corpus whose duplicate groups are
  * tight (cos ≥ 0.99 — the regime the method is published for), the
  * within-cluster candidate restriction loses nothing, so the
  * operator's group structure must EQUAL exact all-pairs + connected
  * components, and the keep-rule must hold exactly. */
class SemanticDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private val dim = 16
  private val threshold = 0.95

  /** Deterministic synthetic corpus: 40 near-orthogonal base vectors
    * (seeded Gaussian, unit-normalized), plus a tightly-perturbed
    * duplicate for every 4th base (cos > 0.999) and a SECOND duplicate
    * for every 8th (a 3-member group exercising the group keep-rule
    * beyond pairs). */
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

  private def tmp() = graft.util.TempDirs.create("graft-semdedup-").toString

  test("SemDeDup groups equal exact all-pairs components on a tight-duplicate corpus") {
    val c = corpus.cache(); c.count()
    val got = SemanticDedup.verdicts(c, "vec_id", "embedding",
      nClusters = 8, threshold = threshold, indexPath = tmp())
      .cache()

    // exact reference: all-pairs cosine + connected components
    val exactPairs = Dedup.embeddingCosinePairs(c, "vec_id", "embedding", threshold)
    val expGroups = Dedup.connectedComponents(
        exactPairs.select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
      .as[(Long, Long)].collect().toMap

    val gotGroups = got.select("vec_id", "group_id")
      .as[(Long, Long)].collect().toMap
    assert(expGroups.nonEmpty, "test corpus planted no duplicate pairs")
    assert(gotGroups == expGroups,
      s"within-cluster groups diverge from exact: got $gotGroups exp $expGroups")

    // exactly one keep per group; drops = members minus keeps
    val keeps = got.filter(col("keep")).select("group_id", "vec_id")
      .as[(Long, Long)].collect().toSeq
    assert(keeps.map(_._1).distinct.size == keeps.size)
    assert(keeps.map(_._1).toSet == gotGroups.values.toSet)

    // the kept member has the group-minimum centroid cosine (ties by id)
    val byGroup = got.select("group_id", "vec_id", "centroid_cos", "keep")
      .as[(Long, Long, Double, Boolean)].collect().groupBy(_._1)
    byGroup.foreach { case (_, ms) =>
      val kept = ms.filter(_._4)
      assert(kept.length == 1)
      val best = ms.minBy(m => (m._3, m._2))
      assert(kept.head._2 == best._2)
    }
    got.unpersist(); c.unpersist()
  }

  test("dropList removes every duplicate-group member except the representative") {
    val c = corpus
    val path = tmp()
    val v = SemanticDedup.verdicts(c, "vec_id", "embedding", 8, threshold, path)
    val drops = SemanticDedup.dropList(c, "vec_id", "embedding", 8, threshold, path)
      .select("drop_id").as[Long].collect().toSet
    val members = v.select("vec_id").as[Long].collect().toSet
    val keeps = v.filter(col("keep")).select("vec_id").as[Long].collect().toSet
    assert(drops == members -- keeps)
    // survivors = corpus minus drops; every group contributes exactly one
    val survivors = c.select("vec_id").as[Long].collect().toSet -- drops
    assert(keeps.subsetOf(survivors))
  }
}
