package graft.plans

import graft.functions.{LangIdExpression, MinHashSignature, SimHash64, WinnowFingerprint}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point — the engine's analog of the
  * reference's `--conf spark.sql.extensions=
  * org.apache.hudi.HoodieSparkSessionExtension` wiring
  * (hudi-spark-minio-trino/README.md:354-358): plugging the engine
  * into Catalyst's standard pipeline instead of per-session manual
  * registration.
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Injects the custom expressions as SQL functions. No analyzer/
  * optimizer rules or strategies are injected — SURVEY.md §4's
  * conclusion holds: every parity operator lands on built-in Catalyst,
  * and custom file selection happens before plan construction.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangIdExpression].getName, "lang_id"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LangIdExpression(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprint"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "winnow_fingerprint"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WinnowFingerprint(exprs.head, 3, 4)))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSignature(exprs.head, 128)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(exprs.head)))
  }
}
