package graft.operators

import graft.Session
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Joins.saltedEquiJoin]] — the proactive skew-join: result parity
  * with the plain join, genuine fan-out of hot keys across salt
  * buckets, and the salted shuffle visible in the physical plan.
  */
class SaltedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  // Zipf-ish: one hot key carrying 90% of rows + a tail of singletons —
  // the shape where a plain shuffle join puts 90% of the work on the
  // reducer that owns "hot".
  private def bigSide = (1 to 2000).map { i =>
    (i.toLong, if (i <= 1800) "hot" else s"key$i")
  }.toDF("row_id", "k")

  private def smallSide =
    (Seq("hot") ++ (1801 to 2000).map(i => s"key$i") ++ Seq("unmatched"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "v")

  test("salted join returns exactly the plain inner join") {
    val plain = bigSide.join(smallSide, Seq("k"))
      .select("row_id", "k", "v").as[(Long, String, Long)].collect().toSet
    val salted = Joins.saltedEquiJoin(bigSide, smallSide, "k",
        salts = 8, saltBy = col("row_id"))
      .select("row_id", "k", "v").as[(Long, String, Long)].collect().toSet
    assert(plain.nonEmpty && salted == plain)
  }

  test("hot key fans out across salt buckets; tail keys stay cheap") {
    val spread = bigSide
      .withColumn("salt", pmod(hash(col("row_id")), lit(8)))
      .groupBy("k").agg(countDistinct("salt").as("nsalts"))
      .as[(String, Long)].collect().toMap
    assert(spread("hot") == 8,
      s"1800 hot rows should hit all 8 salt buckets, got ${spread("hot")}")
    // replication cost is bounded by the SMALL side: each small row
    // appears once per salt, no matter how skewed the big side is
    val replicated = smallSide
      .withColumn("salt", explode(sequence(lit(0), lit(7))))
    assert(replicated.count() == smallSide.count() * 8)
  }

  test("the join shuffle partitions on (key, salt), not key alone") {
    // keep the small side off the broadcast path so the exchange that
    // would carry the skew is actually planned
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Joins.saltedEquiJoin(bigSide, smallSide, "k",
          salts = 8, saltBy = col("row_id"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("__salt"),
        s"salt column must reach the exchange/join keys:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
