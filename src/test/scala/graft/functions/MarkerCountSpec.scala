package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.operators.TextAnalysis

/** The native marker-count expression: semantics vs the HOF form it
  * replaces, and the codegen contract (no LambdaFunction left in the
  * text-quality / langid plans).
  */
class MarkerCountSpec extends SparkSuite {

  import spark.implicits._

  test("marker_count matches the filter+isInCollection HOF form") {
    val stop = Seq("the", "a", "of")
    val df = Seq(
      "The quick brown fox of the hill",
      "a A THE of",
      "",
      "nothing matches here").toDF("text")
      .select(split(trim(col("text")), "\\s+").as("toks"))
    val got = df.select(
      GraftFunctions.marker_count(col("toks"), stop, lowercase = true).as("native"),
      size(filter(col("toks"), t => lower(t).isInCollection(stop))).as("hof"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    assert(got.map(_.getInt(0)).toSeq == Seq(3, 4, 0, 0))
  }

  test("case-sensitive mode counts exact matches only") {
    val df = Seq(Seq("le", "Le", "la", "chat")).toDF("toks")
    val n = df.select(GraftFunctions.marker_count(col("toks"), Seq("le", "la")))
      .head().getInt(0)
    assert(n == 2) // "Le" not counted without lowercase
  }

  test("null array and null elements are safe") {
    val df = Seq((1, Seq("the", null, "end")), (2, null))
      .toDF("id", "toks")
    val got = df.select(col("id"),
        GraftFunctions.marker_count(col("toks"), Seq("the"), lowercase = true).as("n"))
      .orderBy("id").collect()
    assert(got(0).getInt(1) == 1)
    assert(got(1).isNullAt(1))
  }

  test("text-quality and langid plans carry no interpreted lambda") {
    val docs = Tables.documents(spark, sf0001)
    val quality = docs.select(col("doc_id") +: TextAnalysis.qualityColumns(col("text")): _*)
    val lang = docs.select(TextAnalysis.langId(col("text")).as("lang"))
    Seq(quality, lang).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("lambdafunction"),
        s"HOF lambda left in a 100TB map stage:\n$plan")
    }
    // and they still execute (codegen.fallback=false makes bad generated
    // code throw here, not silently interpret)
    assert(quality.count() == 500 && lang.count() == 500)
  }
}
