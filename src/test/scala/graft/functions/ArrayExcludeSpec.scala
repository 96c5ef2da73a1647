package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The native array-exclude expression (t20's row-local cleanup stage):
  * parity with the composed HOF filter, order preservation, empty-set
  * identity, and null handling — all under codegen.fallback=false, so
  * the generated code itself is exercised.
  */
class ArrayExcludeSpec extends SparkSuite {

  import spark.implicits._

  test("array_exclude matches the composed filter form, preserving order") {
    val excluded = Seq("boiler", "footer", "")
    val docs = Seq(
      Seq("a", "boiler", "b", "footer", "boiler", "c"),
      Seq("boiler", "footer"),
      Seq("a", "b", "c"),
      Seq("", "x", ""),
      Seq.empty[String]).toDF("lines")
    val lits = typedlit(excluded)
    val got = docs.select(
      GraftFunctions.array_exclude(col("lines"), excluded).as("native"),
      filter(col("lines"), l => !array_contains(lits, l)).as("hof")).collect()
    got.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("empty excluded set is the identity; null array is null") {
    val docs = Seq(Some(Seq("a", "b")), None).toDF("lines")
    val out = docs.select(
      GraftFunctions.array_exclude(col("lines"), Nil).as("kept")).collect()
    assert(out(0).getSeq[String](0) == Seq("a", "b"))
    assert(out(1).isNullAt(0))
  }

  test("null elements are kept (set membership of null is false)") {
    val docs = Seq(Seq(Some("a"), None, Some("boiler"), Some("b")))
      .toDF("lines")
    val out = docs.select(
      GraftFunctions.array_exclude(col("lines"), Seq("boiler")).as("kept"))
      .head().getSeq[String](0)
    assert(out == Seq("a", null, "b"))
  }
}
