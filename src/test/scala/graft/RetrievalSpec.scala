package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Retrieval family: inverted index, phrase adjacency, BM25 ranking.
  * Hand-computed expectations throughout — the oracle-parity blind-spot
  * rule (shared formulas can be wrong on both sides) means every
  * boundary here is worked on paper, not recomputed with the operator's
  * own code.
  */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("inverted index: positions, tf, ascending order") {
    val d = docs(1L -> "a b c a b c", 2L -> "a b x c", 3L -> "  c a b  ")
    val idx = Retrieval.invertedIndex(d)
      .orderBy("term", "doc_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(idx.toSeq == Seq(
      ("a", 1L, 2L, "0,3"), ("a", 2L, 1L, "0"), ("a", 3L, 1L, "1"),
      ("b", 1L, 2L, "1,4"), ("b", 2L, 1L, "1"), ("b", 3L, 1L, "2"),
      ("c", 1L, 2L, "2,5"), ("c", 2L, 1L, "3"), ("c", 3L, 1L, "0"),
      ("x", 2L, 1L, "2")))
  }

  test("phrase search: multi-match, doc-end boundary, no false positives") {
    // "a b c" occurs in doc 1 at starts 0 and 3 — start 3 ends exactly
    // at the last position (the boundary case); doc 2 has all three
    // terms but never adjacent; doc 3 has "a b" only.
    val d = docs(1L -> "a b c a b c", 2L -> "a b x c", 3L -> "c a b")
    val phrases = Seq((10L, "a b c")).toDF("query_id", "phrase")
    val got = Retrieval.phraseMatches(d, phrases)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((10L, 1L, 2L)))
  }

  test("phrase with a repeated term needs BOTH positions") {
    // phrase "a a" over "a a a": starts 0 and 1 match (2 matches);
    // over "a b a": no start has two adjacent a's.
    val d = docs(1L -> "a a a", 2L -> "a b a")
    val phrases = Seq((1L, "a a")).toDF("query_id", "phrase")
    val got = Retrieval.phraseMatches(d, phrases)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 2L)))
  }

  test("phrase search never shuffles the corpus: query side broadcasts") {
    val d = docs(1L -> "a b c", 2L -> "c b a")
    val phrases = Seq((1L, "a b")).toDF("query_id", "phrase")
    val plan = Retrieval.phraseMatches(d, phrases)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("bm25: hand-computed exact score on a floor boundary") {
    // Corpus: d1 = "q a", d2 = "b c" — N = 2, every dl = 2, avgdl = 2.0
    // so dl/avgdl = 1.0 exactly. Query {q}: df = 1 ⇒ rational idf
    // = (2 - 1 + 0.5)/(1 + 0.5) = 1.5/1.5 = 1.0 exactly ⇒
    // idf_q = floor(2^20 · 1.0) = 1048576 — the floor sits EXACTLY on an
    // integer. tf = 1 ⇒ tf_norm = (1·2.25)/(1 + 1.25·(0.25 + 0.75·1.0))
    // = 2.25/2.25 = 1.0 exactly ⇒ score = floor(1048576 · 1.0) = 1048576.
    // Every step is exact dyadic arithmetic — worked on paper, no shared
    // formula with the implementation.
    val d = docs(1L -> "q a", 2L -> "b c")
    val q = Seq((7L, "q")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(d, q)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((7L, 1, 1L, 1048576L)))
  }

  test("bm25: identical docs tie and break by doc_id; more hits rank higher") {
    val d = docs(
      1L -> "z w w w",
      2L -> "z z w w", // more z's than 1/3 — must rank first
      3L -> "z w w w", // identical to 1 — exact tie, doc 1 wins by id
      4L -> "w w w w") // no z — excluded
    val q = Seq((1L, "z")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(d, q)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 3)
    assert(got(0)._2 == 2L, s"doc 2 should rank first: ${got.toSeq}")
    assert(got(1)._2 == 1L && got(2)._2 == 3L,
      s"tie must break by doc_id: ${got.toSeq}")
    assert(got(1)._3 == got(2)._3, "identical docs must score identically")
    assert(got(0)._3 > got(1)._3)
  }

  test("bm25 rewards rare terms: rational idf orders df correctly") {
    // "rare" appears in 1 of 4 docs, "common" in all 4 — one occurrence
    // each in doc 1; the rare term's contribution must dominate.
    val d = docs(
      1L -> "rare common x x",
      2L -> "common y y y",
      3L -> "common y y y",
      4L -> "common y y y")
    val q = Seq((1L, "rare"), (1L, "common")).toDF("query_id", "term")
    val contribs = Retrieval.bm25TopK(d, q).collect()
      .map(r => (r.getLong(2), r.getLong(3))).toMap
    // doc 1 holds both terms; docs 2-4 only the common one — doc 1 first
    val top = Retrieval.bm25TopK(d, q)
      .filter(col("rank") === 1).head().getLong(2)
    assert(top == 1L, s"$contribs")
  }

  test("bm25 and phrase search are deterministic across runs") {
    val d = docs(1L -> "a b c a", 2L -> "b c a b", 3L -> "c a b c")
    val q = Seq((1L, "a"), (1L, "b")).toDF("query_id", "term")
    val r1 = Retrieval.bm25TopK(d, q).collect().toSeq
    val r2 = Retrieval.bm25TopK(d, q).collect().toSeq
    assert(r1 == r2)
  }

  test("tfidf keywords: hand-computed scores, tie broken by term") {
    // N = 3. df: x→1, y→2, z→2, w→1.
    //   idf_q(df=1) = floor(2^20·2.5/1.5) = 1747626
    //   idf_q(df=2) = floor(2^20·1.5/2.5) = 629145
    // d1 "x x y": x 2·1747626 = 3495252 > y 629145
    // d2 "y z":   y = z = 629145 — tie → term asc: y first
    // d3 "z z z w": z 3·629145 = 1887435 > w 1747626
    val d = docs(1L -> "x x y", 2L -> "y z", 3L -> "z z z w")
    val got = Retrieval.tfidfKeywords(d, k = 2)
      .orderBy(col("doc_id"), col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (1L, 1, "x", 3495252L), (1L, 2, "y", 629145L),
      (2L, 1, "y", 629145L), (2L, 2, "z", 629145L),
      (3L, 1, "z", 1887435L), (3L, 2, "w", 1747626L)), got)
  }

  test("phrase snippets: window clamps at both document edges, multi-site") {
    // doc 1 = "a b c d e f g h" (8 tokens), window 2:
    //   "c d" at start 2 → lo = 0, hi = min(3+2, 7) = 5 → "a b c d e f"
    //   "a b" at start 0 → lo = 0, hi = 3            → "a b c d"
    //   "g h" at start 6 → lo = 4, hi = 7            → "e f g h"
    // doc 2 = "c d c d": "c d" matches at 0 AND 2 (multi-site)
    val d = docs(1L -> "a b c d e f g h", 2L -> "c d c d")
    val phrases = Seq((10L, "c d"), (11L, "a b"), (12L, "g h"))
      .toDF("query_id", "phrase")
    val got = Retrieval.phraseSnippets(d, phrases, window = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == Set(
      (10L, 1L, 2L, "a b c d e f"),
      (10L, 2L, 0L, "c d c d"),
      (10L, 2L, 2L, "c d c d"),
      (11L, 1L, 0L, "a b c d"),
      (12L, 1L, 6L, "e f g h")), got)
  }

  test("decontamination witnesses: contaminated, clean, and gram-near-miss docs") {
    // The c06 composition on a hand-built corpus. Eval doc 10 is
    // CONTAMINATED: train doc 11 contains its full 6-token phrase
    // verbatim (phrase leg) and therefore also shares 8-grams with it
    // (gram leg). Eval doc 20 is CLEAN: no train doc shares its phrase
    // or any 8-gram. Eval doc 30 is a NEAR-MISS: train doc 31 matches 5
    // of its 6 phrase tokens in order ("n5" swapped for "xx") and
    // shares a 7-gram but never a full 8-gram — BOTH legs must say no.
    val evalTen = "e1 e2 e3 e4 e5 e6 e7 e8 e9"     // phrase: e1..e6
    val evalTwenty = "c1 c2 c3 c4 c5 c6 c7 c8"
    val evalThirty = "n1 n2 n3 n4 n5 n6 n7 n8"     // phrase: n1..n6
    val corpus = docs(
      10L -> evalTen,
      20L -> evalTwenty,
      30L -> evalThirty,
      11L -> ("zz " + evalTen + " yy"),             // full containment
      31L -> "n1 n2 n3 n4 xx n6 n7 n8",             // 5-of-6, 7-gram max
      12L -> "w1 w2 w3 w4 w5 w6 w7 w8")
    val evalDocs = corpus.filter(col("doc_id") % 10 === 0)
    val trainDocs = corpus.filter(col("doc_id") % 10 =!= 0)
    val phrases = evalDocs.select(col("doc_id").as("query_id"),
      concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 1, 6))
        .as("phrase"))
    val pm = Retrieval.phraseMatches(trainDocs, phrases)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pm == Set((10L, 11L)), s"phrase leg: $pm")
    val gram = graft.operators.Training.contamination(evalDocs, trainDocs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 10: 9 tokens → 2 distinct 8-grams, both inside doc 11 → 2 hits
    assert(gram(10L) == (2L, 2L), s"gram leg 10: ${gram(10L)}")
    // doc 20: 1 gram (8 tokens), no train match
    assert(gram(20L) == (1L, 0L), s"gram leg 20: ${gram(20L)}")
    // doc 30: near-miss shares at most a 7-gram → 0 of 1 hit
    assert(gram(30L) == (1L, 0L), s"gram leg 30: ${gram(30L)}")
  }

  test("rrf fusion: hand-computed scores, overlap, tie-break, coverage") {
    // leg A ranks docs (1,2,3); leg B ranks (2,3,4). Q = 2^20, k = 60:
    // contrib(rank) = 1048576 div (60 + rank) -> r1: 17189, r2: 16912,
    // r3: 16644 (all exact integer divisions: 63*16644 = 1048572)
    val a = Seq((7L, 1L, 1), (7L, 2L, 2), (7L, 3L, 3))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((7L, 2L, 1), (7L, 3L, 2), (7L, 4L, 3))
      .toDF("query_id", "doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getLong(2),
        (r.getInt(1), r.getLong(3), r.getLong(4)))).toMap
    // doc 2: 16912 + 17189 = 34101 (both legs); doc 3: 16644 + 16912 =
    // 33556; doc 1: 17189; doc 4: 16644
    assert(fused(2L) == ((1, 34101L, 2L)), fused(2L))
    assert(fused(3L) == ((2, 33556L, 2L)), fused(3L))
    assert(fused(1L) == ((3, 17189L, 1L)), fused(1L))
    assert(fused(4L) == ((4, 16644L, 1L)), fused(4L))

    // equal fused scores break toward the smaller doc_id: two docs each
    // rank 1 in exactly one leg
    val c = Seq((1L, 9L, 1)).toDF("query_id", "doc_id", "rank")
    val e = Seq((1L, 4L, 1)).toDF("query_id", "doc_id", "rank")
    val tied = Retrieval.rrfFuse(Seq(c, e), k = 10)
      .orderBy(col("rank")).collect().map(_.getLong(2)).toSeq
    assert(tied == Seq(4L, 9L), tied)

    // k truncates the fused ranking, per query independently
    val multi = Seq((1L, 1L, 1), (1L, 2L, 2), (2L, 5L, 1))
      .toDF("query_id", "doc_id", "rank")
    val cut = Retrieval.rrfFuse(Seq(multi), k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(cut == Set((1L, 1L), (2L, 5L)), cut)
  }
}
