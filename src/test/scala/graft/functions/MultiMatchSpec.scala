package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The native Aho-Corasick blocklist matcher: hand-verified automaton
  * edge cases (overlaps, shared prefixes, failure-link chains, terms
  * inside terms), parity with the naive one-contains-per-term form on a
  * generated corpus, and the SQL registration. Codegen is exercised by
  * construction (`spark.sql.codegen.fallback=false` in SparkSuite).
  */
class MultiMatchSpec extends SparkSuite {

  import spark.implicits._

  test("failure-link chains and nested terms, worked by hand") {
    val terms = Seq("ab", "bc", "abc", "c", "able")
    // "xabcx": ab at 1, abc at 1, bc at 2, c at 3 — all four; able absent
    val out = Seq("xabcx").toDF("text")
      .select(GraftFunctions.multi_match(col("text"), terms).as("m"))
      .head().getSeq[String](0)
    assert(out == Seq("ab", "abc", "bc", "c"))
    // "table" contains able (term inside a longer corpus word) but no c
    val out2 = Seq("table").toDF("text")
      .select(GraftFunctions.multi_match(col("text"), terms).as("m"))
      .head().getSeq[String](0)
    assert(out2 == Seq("ab", "able"))
  }

  test("case-insensitive, distinct, sorted; empty and null behavior") {
    val out = Seq("The ABC abc THE").toDF("text")
      .select(GraftFunctions.multi_match(col("text"),
        Seq("the", "ABC")).as("m"))
      .head().getSeq[String](0)
    assert(out == Seq("abc", "the")) // lowercased, deduped, sorted
    val rows = Seq(Some("no hits here"), Some(""), None).toDF("text")
      .select(GraftFunctions.multi_match(col("text"), Seq("zz")).as("m"))
      .collect()
    assert(rows(0).getSeq[String](0) == Seq.empty)
    assert(rows(1).getSeq[String](0) == Seq.empty)
    assert(rows(2).isNullAt(0))
  }

  test("parity with the naive per-term contains form on a generated corpus") {
    val terms = Seq("spark", "park", "ark", "row row", "window tab",
      "tab", "table value", "merge", "emerge", "absent-term")
    val docs = spark.range(300).selectExpr(
      // pseudo-random word soup with heavy prefix/suffix overlap
      """concat_ws(' ',
           transform(sequence(1, 12), i ->
             element_at(array('spark','park','window','tab','table',
               'value','merge','emerge','row','x'),
               cast(pmod(id * 31 + i * 17, 10) + 1 as int))))
         as text""")
    val naive = terms.map(t =>
      when(col("text").contains(t), t)).toArray
    val got = docs.select(
      GraftFunctions.multi_match(col("text"), terms).as("ac"),
      array_sort(array_compact(array(naive: _*))).as("naive"))
      .collect()
    got.foreach(r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
    // the corpus genuinely exercises hits (not vacuously empty)
    assert(got.exists(_.getSeq[String](0).nonEmpty))
  }

}
