package graft.tools

import graft.SparkEntry
import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for the named queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the optimization-round evidence
  * files (the judge checks plan claims against these). Not part of the
  * driver contract.
  *
  * Usage: runMain graft.tools.PlanDump <suffix> <query>[,<query>...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_PLAN_TAG
  * (default r18).
  *
  * Note the l-family caveat: those queries build a table eagerly inside
  * the function, so the captured plan covers only the final read leg;
  * the write-pipeline plans are captured separately where a change
  * targets them.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <suffix> <q1,q2,...>")
    val suffix = args(0)
    val names = args(1).split(',').toSeq
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r18")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = Paths.get("plans", tag)
    Files.createDirectories(outDir)
    val spark = graft.Session.local(8)
    spark.sparkContext.setLogLevel("WARN")
    // see [[graft.util.Lineage]]: keep full lineage through the
    // operators' eager localCheckpoints so the dumped plan shows the
    // computation, not `Scan ExistingRDD` (the round-18 p3/p36/p40
    // dumps were vacuous). Plan-dump only — never set for timed runs.
    spark.conf.set("spark.graft.explain.keepLineage", "true")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      // queryExecution.explainString mirrors explain("formatted")
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), txt)
      println(s"wrote ${outDir.resolve(s"${n}_$suffix.txt")}")
    }
    spark.stop()
  }
}
