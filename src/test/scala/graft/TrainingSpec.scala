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

  test("shuffle shards: balanced permutation, deterministic, non-trivial order") {
    val rows = SparkEntry.queries("t17_shuffle_shards")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(rows.length == nDocs)
    assert(rows.map(_._1).distinct.length == nDocs) // every doc exactly once
    val byShard = rows.groupBy(_._2)
    assert(byShard.keySet == (0L until 8L).toSet)
    // mod assignment: counts differ by at most one
    val sizes = byShard.values.map(_.length)
    assert(sizes.max - sizes.min <= 1, sizes.toSeq)
    // pos is 1..count within each shard
    byShard.values.foreach(s =>
      assert(s.map(_._3).sorted.toSeq == (1 to s.length).toSeq))
    // the seeded order is not the doc_id order (the point of a shuffle)
    val shard0 = byShard(0L).sortBy(_._3).map(_._1).toSeq
    assert(shard0 != shard0.sorted)
    // deterministic: same seed, same permutation
    val again = SparkEntry.queries("t17_shuffle_shards")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("shard sink: files carry the t17 permutation without a global sort") {
    val out = tempDir("shards").getAbsolutePath
    Training.writeShards(Tables.documents(spark, sf0001), s"file:$out")
    // the physical plan the sink runs must not contain a global sort or
    // a window — one exchange, per-partition sorts only
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs.map(_.getName).sorted.toSeq ==
      (0 until 8).map(i => s"shard=$i"))
    // reading one shard's files in order reproduces t17's permutation
    val expected = SparkEntry.queries("t17_shuffle_shards")(spark, sf0001)
      .filter(col("shard") === 3).orderBy(col("pos")).collect()
      .map(_.getLong(0)).toSeq
    val files = new java.io.File(s"$out/shard=3").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val got = files.flatMap { f =>
      spark.read.parquet(s"file:${f.getAbsolutePath}").collect()
        .map(r => (r.getAs[String]("skey"), r.getAs[Long]("doc_id")))
    }.toSeq
    // within-file row order IS the seeded order (sortWithinPartitions
    // wrote it); verify against the recomputed key, then against t17
    assert(got == got.sortBy(identity))
    assert(got.map(_._2) == expected)
  }

  test("token budget: greedy cut reaches the budget and no further") {
    val budget = 2000L
    val kept = SparkEntry.queries("t18_token_budget")(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(kept.nonEmpty)
    val allBySource = Tables.documents(spark, sf0001)
      .select(col("source")).groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    kept.groupBy(_._1).foreach { case (src, ds) =>
      val ordered = ds.sortBy(_._4)
      // cum_end is a proper running sum of the kept prefix
      var cum = 0L
      ordered.foreach { case (_, id, nTok, cumEnd) =>
        cum += nTok; assert(cumEnd == cum, s"doc $id cum_end")
      }
      // budget reached unless the source ran out of documents
      if (ds.length < allBySource(src)) assert(cum >= budget, s"$src under budget")
      // greedy minimality: the last doc starts before the budget line
      val last = ordered.last
      assert(last._4 - last._3 < budget, s"$src kept a doc past the cut")
    }
  }
}
