package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions at session build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

    e.injectFunction((FunctionIdentifier("extract_filename_dates"),
      new ExpressionInfo(classOf[functions.ExtractFilenameDates].getName,
        "extract_filename_dates"),
      es => functions.ExtractFilenameDates(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("derive_item_id"),
      new ExpressionInfo(classOf[functions.DeriveItemId].getName, "derive_item_id"),
      es => functions.DeriveItemId(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[functions.SimHash64].getName, "simhash64"),
      es => functions.SimHash64(es.head)))
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[functions.CosineSim].getName, "cosine_sim"),
      es => functions.CosineSim(es.head, es(1))))
  }
}
