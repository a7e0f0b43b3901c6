package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 additions: pointer-jumping connected components (deep
  * chains converge in O(log diameter); non-convergence fails loudly
  * instead of returning split clusters). */
class Round15Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def chainPairs(n: Int) = {
    import spark.implicits._
    // path graph 1-2-3-…-n, shuffled pair order so nothing depends on
    // input locality
    scala.util.Random.shuffle((1L until n.toLong).map(i => (i, i + 1)).toList)
      .toDF("doc_a", "doc_b")
  }

  test("connectedComponents: diameter-119 path converges to one cluster") {
    import spark.implicits._
    val out = Dedup.connectedComponents(chainPairs(120))
      .as[(Long, Long)].collect().toMap
    assert(out.size == 120)
    assert(out.values.toSet == Set(1L))
  }

  test("connectedComponents: disjoint deep chains keep separate minima") {
    import spark.implicits._
    // two interleaved chains over odd/even ids: 1-3-5-…-199, 2-4-…-200
    val pairs = ((1L to 197L by 2).map(i => (i, i + 2)) ++
      (2L to 198L by 2).map(i => (i, i + 2))).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out.size == 200)
    assert((1L to 199L by 2).forall(out(_) == 1L))
    assert((2L to 200L by 2).forall(out(_) == 2L))
  }

  test("connectedComponents: throws loudly when the iteration cap is hit") {
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chainPairs(200), maxIterations = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("connectedComponents: star + triangle unaffected by jumping") {
    import spark.implicits._
    val pairs = (Seq((10L, 1L), (10L, 2L), (10L, 3L)) ++ // star, min 1
      Seq((20L, 21L), (21L, 22L), (22L, 20L))) // triangle, min 20
      .toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }
}
