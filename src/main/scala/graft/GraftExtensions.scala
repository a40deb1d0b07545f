package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft._

/** SparkSessionExtensions entry point: registers graft's custom
  * expressions as SQL functions at session construction, so any session
  * built with `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) can call them from
  * `spark.sql(...)` without the imperative
  * `gfunctions.register(spark)` step. The catalog-facing surface of the
  * library — everything else composes from stock Spark functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("t_test_pvalue"),
      info("t_test_pvalue", classOf[TTestPValue]),
      (es: Seq[Expression]) => TTestPValue(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", classOf[CosineSimilarity]),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", classOf[SimHash64]),
      (es: Seq[Expression]) => SimHash64(es.head)))
    ext.injectFunction((FunctionIdentifier("md5_long"),
      info("md5_long", classOf[Md5Long]),
      (es: Seq[Expression]) => Md5Long(es.head)))
    ext.injectFunction((FunctionIdentifier("rolling_hash64"),
      info("rolling_hash64", classOf[RollingHash64]),
      (es: Seq[Expression]) => RollingHash64(es.head)))
  }
}
