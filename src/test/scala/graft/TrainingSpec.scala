package graft

import org.apache.spark.sql.functions._

import graft.operators.Training

/** Ground-truth semantics of the training-set preparation operators:
  * planted canary grams make their eval docs contaminated, clean synthetic
  * docs score zero, and sequence packing reconstructs a consistent
  * gap-free token stream per source.
  */
class TrainingSpec extends SparkSuite {
  import spark.implicits._

  test("contamination: planted canaries hit; fully-disjoint docs score 0") {
    val rows = SparkEntry.queries("d08_contamination")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    // every eval doc is present exactly once (doc_id % 10 == 0)
    val n = Tables.documents(spark, sf0001).count()
    assert(rows.keySet == (0L until n).filter(_ % 10 == 0).toSet)
    // each canary doc shares at least its planted 8-gram with the train split
    rows.foreach { case (id, (nHit, frac)) =>
      if (id % 30 == 0) assert(nHit >= 1L && frac > 0.0, s"canary doc $id")
      assert(frac >= 0.0 && frac <= 1.0, s"doc $id")
    }
  }

  test("contamination: synthetic disjoint corpora — exact hit accounting") {
    val evalDocs = Seq(
      (1L, "a b c d e f g h i j"), // grams: 3 (8-grams of 10 tokens)
      (2L, "z y x w v u t s r q") // fully disjoint from train
    ).toDF("doc_id", "text")
    val train = Seq(
      (10L, "PRE a b c d e f g h POST") // contains eval doc 1's first 8-gram
    ).toDF("doc_id", "text")
    val out = Training.contamination(evalDocs, train)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((3L, 1L)))
    assert(out(2L) == ((3L, 0L)))
  }

  test("contamination: broadcast, shuffle, and hashed formulations agree") {
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val ev = docs.filter(col("doc_id") % 10 === 0)
    val tr = docs.filter(col("doc_id") % 10 =!= 0)
    val a = Training.contamination(ev, tr, broadcastEval = true)
      .orderBy("doc_id").collect().toSeq
    val b = Training.contamination(ev, tr, broadcastEval = false)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // the long-keyed scale variant produces identical counts
    val c = Training.contamination(ev, tr, hashGrams = true)
      .orderBy("doc_id").collect().toSeq
    assert(a == c)
  }

  test("seq packing: per-source stream is gap-free and spans are exact") {
    val out = SparkEntry.queries("t13_seq_pack")(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, ds) =>
      var cum = 0L
      ds.sortBy(_._2).foreach { case (_, id, nTok, first, last, nSeqs) =>
        assert(nTok >= 1L, s"doc $id")
        assert(first == cum / 256, s"doc $id first_seq")
        assert(last == (cum + nTok - 1) / 256, s"doc $id last_seq")
        assert(nSeqs == last - first + 1, s"doc $id n_seqs")
        cum += nTok
      }
    }
  }

  test("seq packing: a doc longer than seqLen spans multiple sequences") {
    val docs = Seq(
      (1L, "s", Seq.fill(5)("w").mkString(" ")), // 5 tokens
      (2L, "s", Seq.fill(20)("w").mkString(" ")) // crosses the 8-boundary twice
    ).toDF("doc_id", "source", "text")
    val out = Training.packSequences(docs, seqLen = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out(0) == ((1L, 0L, 0L, 1L))) // tokens [0,5) -> seq 0
    assert(out(1) == ((2L, 0L, 3L, 4L))) // tokens [5,25) -> seqs 0..3
  }
}
