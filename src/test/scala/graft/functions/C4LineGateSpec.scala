package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The native C4 line gate: parity with the composed filter form and
  * the rule edge cases — terminal punctuation on the raw line, word
  * count on the trimmed split, case-insensitive banned substrings.
  */
class C4LineGateSpec extends SparkSuite {

  import spark.implicits._

  test("c4_line_gate matches the composed filter form") {
    val docs = Seq(
      Seq("keep this full sentence.", "no terminal punct",
        "two words.", "a JavaScript widget loads here.",
        "ends with bang words!", "ends with question mark?",
        "", "   .", "tabs\tin\tline."),
      Seq.empty[String]).toDF("lines")
    val composed = filter(col("lines"), l =>
      l.rlike("[.!?]$") &&
        size(split(trim(l), "\\s+")) >= 3 &&
        !lower(l).contains("javascript"))
    val got = docs.select(
      GraftFunctions.c4_line_gate(col("lines")).as("native"),
      composed.as("hof")).collect()
    got.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    // and the survivors are exactly the rule-following lines
    assert(got(0).getSeq[String](0) == Seq("keep this full sentence.",
      "ends with bang words!", "ends with question mark?",
      "tabs\tin\tline."))
  }

  test("banned matching is case-insensitive substring; null lines drop") {
    val docs = Seq(Seq(Some("pure JAVASCRIPT embedded here."), None,
      Some("clean closing line here."))).toDF("lines")
    val out = docs.select(
      GraftFunctions.c4_line_gate(col("lines")).as("kept"))
      .head().getSeq[String](0)
    assert(out == Seq("clean closing line here."))
  }
}
