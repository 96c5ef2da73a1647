package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Streaming semantics over the driver's events table: micro-batch file
  * source (B6), watermarked dedup of at-least-once delivery (A10/B7),
  * tumbling-window rollups — each checked against its batch equivalent.
  */
class StreamingSpec extends SparkSuite {

  private lazy val eventsDir: String = {
    // stage a µs-normalized copy (+ redelivered duplicates) as the stream input
    val d = tempDir("events").getAbsolutePath
    val ev = Tables.events(spark, sf0001)
    ev.union(ev.limit(50)) // 50 duplicate deliveries
      .write.mode("overwrite").parquet(d)
    d
  }

  test("watermarked dedup drops redelivered events") {
    val stream = EventStream.readEvents(spark, eventsDir, maxFilesPerTrigger = 2)
    val q = EventStream.runToMemory(
      EventStream.dedup(stream, "event_id", "ts"), "dedup_out")
    try {
      val n = spark.table("dedup_out").count()
      val expected = Tables.events(spark, sf0001).count()
      assert(n == expected) // 1000, duplicates gone
    } finally q.stop()
  }

  test("tumbling window counts match the batch equivalent") {
    val stream = EventStream.readEvents(spark, eventsDir)
    val dedup = EventStream.dedup(stream, "event_id", "ts", watermark = "2 hours")
    val q = EventStream.runToMemory(
      EventStream.tumblingCounts(dedup, "ts", "1 hour", watermark = None), "win_out",
      outputMode = "append")
    try {
      val got = spark.table("win_out")
        .select(col("window_start"), col("event_type"), col("n_events"))
      val batch = Tables.events(spark, sf0001)
        .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      // append mode emits only windows the watermark closed; every emitted
      // window must match its batch value, and most windows must emit
      val joined = got.alias("g").join(batch.alias("b"),
        Seq("window_start", "event_type"))
      assert(joined.filter(col("g.n_events") =!= col("b.n_events")).count() == 0)
      assert(got.count() > 0 && got.count() == joined.count())
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch interval join") {
    val clicks = EventStream.readEvents(spark, eventsDir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val errors = EventStream.readEvents(spark, eventsDir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
        col("ts").as("err_ts"))
    val joined = EventStream.intervalJoin(
        clicks, errors.withColumnRenamed("err_user", "user_id"),
        "user_id", "click_ts", "err_ts")
      .select(col("click_id"), col("err_id"))
    val q = EventStream.runToMemory(joined, "ssj_out")
    try {
      val got = spark.table("ssj_out").select("click_id", "err_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ev = Tables.events(spark, sf0001)
      val bc = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      val be = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"), col("ts").as("err_ts"))
      val batch = bc.join(be, Seq("user_id"))
        .filter(col("err_ts") <= col("click_ts") &&
          col("err_ts") >= col("click_ts") - expr("INTERVAL 1 hour"))
        .select("click_id", "err_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // duplicate deliveries in the staged input may double-emit a pair;
      // as a SET every emitted pair must be a true batch pair, and the
      // stream must emit the bulk of them (the watermark holds back only
      // the tail of event time)
      assert(got.subsetOf(batch), s"stream emitted ${(got -- batch).size} false pairs")
      assert(got.size > batch.size / 2, s"stream emitted ${got.size} of ${batch.size}")
    } finally q.stop()
  }

  test("streaming session_window totals agree with batch gap sessionization") {
    val stream = EventStream.readEvents(spark, eventsDir)
    val dedup = EventStream.dedup(stream, "event_id", "ts", watermark = "4 hours")
    val q = EventStream.runToMemory(
      EventStream.sessionCounts(dedup, "ts", gap = "30 minutes", watermark = None)
        .drop("session_start", "session_end"),
      "sess_out")
    try {
      // total events across emitted sessions per user == batch count
      // (append mode emits only watermark-closed sessions; compare on the
      // users whose sessions all closed)
      val streamed = spark.table("sess_out")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val batch = Tables.events(spark, sf0001)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
      val joined = streamed.alias("s").join(batch.alias("b"), "user_id")
        .filter(col("s.n_events") === col("b.n_events")) // fully-closed users
      assert(joined.count() > 0)
      assert(joined.filter(col("s.n_sessions") =!= col("b.n_sessions")).count() == 0)
    } finally q.stop()
  }

  test("flatMapGroupsWithState accumulates per-user totals across micro-batches") {
    import org.apache.spark.sql.functions._
    val freshDir = tempDir("events-state").getAbsolutePath
    Tables.events(spark, sf0001).write.mode("overwrite").parquet(freshDir)
    val stream = EventStream.readEvents(spark, freshDir, maxFilesPerTrigger = 1)
    val q = EventStream.runToMemory(
      EventStream.statefulUserTotals(stream).toDF(), "state_out")
    try {
      // the LAST snapshot per user must equal the batch totals
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("n_events").desc)
      val last = spark.table("state_out")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("n_events"))
      val batch = Tables.events(spark, sf0001)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      val joined = last.alias("s").join(batch.alias("b"), "user_id")
      assert(joined.count() == batch.count())
      assert(joined.filter(col("s.n_events") =!= col("b.n_events")).count() == 0)
    } finally q.stop()
  }

  test("dlq split separates bad records without losing any") {
    val batch = Tables.events(spark, sf0001)
    val (good, bad) = EventStream.dlqSplit(batch, col("value") < 10)
    assert(good.count() + bad.count() == batch.count())
    assert(bad.filter(col("value") >= 10).count() == 0)
  }

  test("streaming near-dup admission: corpus copies flagged, novel docs pass") {
    import spark.implicits._
    import graft.operators.Dedup
    val corpus = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    // arriving batch: 10 verbatim copies of corpus docs + 10 novel docs
    // whose shingles exist nowhere in the corpus
    val copies = corpus.filter(col("doc_id") < 10)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val novel = (0 until 10).map { i =>
      (20000L + i, (0 until 12).map(j => s"novelword${i}x$j").mkString(" "))
    }.toDF("doc_id", "text")
    val inDir = tempDir("admit").getAbsolutePath
    copies.unionByName(novel).coalesce(1).write.mode("overwrite").parquet(inDir)

    val stream = spark.readStream
      .schema(copies.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    val q = EventStream.runToMemory(
      Dedup.nearDupAdmission(stream, corpus, fpp = 0.001), "admit_out")
    try {
      val flags = spark.table("admit_out")
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(flags.size == 20)
      (10000L until 10010L).foreach(id => assert(flags(id), s"copy $id not flagged"))
      (20000L until 20010L).foreach(id => assert(!flags(id), s"novel $id flagged"))
    } finally q.stop()

    // batch parity: the same frame through the same filter, same flags
    val batchFlags = Dedup.nearDupAdmission(
        copies.unionByName(novel), corpus, fpp = 0.001)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val streamed = spark.table("admit_out")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(batchFlags == streamed)
  }

  test("streaming embedding admission: copies flagged on the stream, batch parity") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding"))
    val (index, planes) = Similarity.embeddingAdmissionIndex(emb, fpp = 0.001)
    // arriving vectors: 10 corpus re-encodes + 10 hash-derived novel
    // directions (~orthogonal to everything admitted)
    val dim = emb.head().getSeq[Float](1).size
    val copies = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val novel = spark.range(20000, 20010).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        i => ((pmod(xxhash64(col("id"), i), lit(2001L)) - 1000L)
          .cast("double") / 1000d).cast("float")).as("embedding"))
    val inDir = tempDir("embadmit").getAbsolutePath
    copies.unionByName(novel).coalesce(1).write.mode("overwrite").parquet(inDir)

    val stream = spark.readStream.schema(copies.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = EventStream.runToMemory(
      Similarity.embeddingAdmissionWith(stream, index, planes), "emb_admit_out")
    try {
      val flags = spark.table("emb_admit_out")
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(flags.size == 20)
      (10000L until 10010L).foreach(id => assert(flags(id), s"copy $id not flagged"))
      assert((20000L until 20010L).count(flags) <= 1, "novel vectors flagged")
      // batch parity: same frame, same filter, same flags
      val batchFlags = Similarity.embeddingAdmissionWith(
          copies.unionByName(novel), index, planes)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(batchFlags == flags)
    } finally q.stop()
  }

  test("incremental admission: the index grows per admitted batch") {
    import spark.implicits._
    import graft.operators.Dedup
    val corpus = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    // size for the planned crawl capacity up front — Bloom fpp holds for
    // the sized capacity, and growth must not rebuild the filter
    val index = Dedup.admissionIndex(corpus, expectedBuckets = 100000)

    val batch1 = (0 until 8).map { i =>
      (40000L + i, (0 until 12).map(j => s"crawlword${i}yy$j").mkString(" "))
    }.toDF("doc_id", "text")
    // batch 1 is novel against the corpus index
    val flags1 = Dedup.nearDupAdmissionWith(batch1, index)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(flags1.values.forall(!_), flags1)

    // admit batch 1, grow the index with exactly those docs (same
    // capacity/fpp the index was sized with — merge-compatible)
    Dedup.growAdmissionIndex(index, batch1, capacity = 100000)

    // batch 2 re-crawls batch-1 content (ids shifted) + one novel doc
    val batch2 = batch1.select((col("doc_id") + 100).as("doc_id"), col("text"))
      .unionByName(Seq((50000L,
        (0 until 12).map(j => s"freshword0zz$j").mkString(" ")))
        .toDF("doc_id", "text"))
    val flags2 = Dedup.nearDupAdmissionWith(batch2, index)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    (40100L until 40108L).foreach(id => assert(flags2(id), s"re-crawl $id passed"))
    assert(!flags2(50000L), "novel doc flagged after growth")

    // corpus copies still flag (growth never evicts)
    val copy = corpus.filter(col("doc_id") === 2)
      .select((col("doc_id") + 60000).as("doc_id"), col("text"))
    assert(Dedup.nearDupAdmissionWith(copy, index).head().getBoolean(2))
  }

  test("grown-via-merge index flags exactly what a from-scratch rebuild flags") {
    import spark.implicits._
    import graft.operators.Dedup
    // growAdmissionIndex is a distributed Bloom union: same (capacity,
    // fpp) ⇒ same bit layout ⇒ union of the same inserted items must be
    // BIT-IDENTICAL to an index rebuilt over corpus ∪ batch — so every
    // probe, not just a sampled few, agrees between the two paths
    val corpus = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val batch = (0 until 16).map { i =>
      (70000L + i, (0 until 12).map(j => s"mergeword${i}qq$j").mkString(" "))
    }.toDF("doc_id", "text")

    val grown = Dedup.admissionIndex(corpus, expectedBuckets = 100000)
    Dedup.growAdmissionIndex(grown, batch, capacity = 100000)
    val rebuilt = Dedup.admissionIndex(corpus.unionByName(batch),
      expectedBuckets = 100000)

    def bytesOf(bf: org.apache.spark.util.sketch.BloomFilter): Seq[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray.toSeq
    }
    assert(bytesOf(grown) == bytesOf(rebuilt),
      "merge-grown index must be bit-identical to a from-scratch rebuild")

    // and behaviorally: re-crawls of both corpus and batch content flag
    val probes = corpus.limit(5).select((col("doc_id") + 80000).as("doc_id"), col("text"))
      .unionByName(batch.select((col("doc_id") + 1000).as("doc_id"), col("text")))
    val flags = Dedup.nearDupAdmissionWith(probes, grown)
      .collect().map(_.getBoolean(2))
    assert(flags.forall(identity))
  }

  test("streaming incremental dedup: per-batch index probe + grow catches cross-batch dups") {
    import spark.implicits._
    import graft.operators.DedupIndex
    val corpus = Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 50).select(col("doc_id"), col("text"))
    def freshIndex(): String = {
      val d = tempDir("ixs").getAbsolutePath
      DedupIndex.build(corpus, d)
      d
    }

    def novel(tag: String, n: Int): String =
      (0 until n).map(j => s"stream${tag}word$j").mkString(" ")
    // batch 1: a corpus copy, two novel docs
    val b1 = Seq(
      (90000L, corpus.filter(col("doc_id") === 3).head().getString(1)),
      (90001L, novel("alpha", 20)),
      (90002L, novel("beta", 20)))
    // batch 2: an EXACT copy and a NEAR-dup (last word edited) of batch-1
    // novels — both only catchable if the index grew between batches —
    // plus one genuinely new doc
    val b2 = Seq(
      (91000L, novel("alpha", 20)),
      (91001L, novel("beta", 19) + " editedtail"),
      (91002L, novel("gamma", 20)))

    // the crawl loop: probe against the stored index, admit survivors,
    // grow the index AND the text side (near-dup verification reads
    // candidate text, so admitted docs' text must ride along with their
    // index rows — index rows alone only catch exact copies)
    def runLoop(ixDir: String,
        batches: Seq[Seq[(Long, String)]]): Map[Long, (String, Any)] = {
      var extraText = Seq.empty[(Long, String)]
      var out = Map.empty[Long, (String, Any)]
      batches.foreach { rows =>
        val batch = rows.toDF("doc_id", "text")
        val corpusText = corpus.unionByName(extraText.toDF("doc_id", "text"))
        val v = DedupIndex.dedupAgainst(batch, corpusText,
          DedupIndex.load(spark, ixDir))
        out ++= v.collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.get(2)))).toMap
        val survivors = batch.join(
          v.filter(col("status") === "kept").select(col("doc_id")),
          Seq("doc_id"), "left_semi")
          .persist()
        survivors.count() // materialize BEFORE the append (grow scaladoc)
        DedupIndex.grow(survivors, ixDir)
        extraText ++= survivors.collect()
          .map(r => (r.getLong(0), r.getString(1)))
        survivors.unpersist()
        v.unpersist()
      }
      out
    }

    // stream form: the same loop as a foreachBatch sink over a file
    // stream delivering one batch file per trigger, in arrival order
    val inDir = tempDir("ixstream-in")
    def stage(rows: Seq[(Long, String)], name: String, mtime: Long): Unit = {
      val tmp = tempDir(s"ixstage-$name")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(inDir, name)
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(mtime) // file source orders by mtime: b1 first
    }
    stage(b1, "b1.parquet", 1000000L)
    stage(b2, "b2.parquet", 2000000L)

    val streamIx = freshIndex()
    var streamExtra = Seq.empty[(Long, String)]
    val streamOut = scala.collection.mutable.Map.empty[Long, (String, Any)]
    val stream = spark.readStream
      .schema(b1.toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir.getAbsolutePath)
    val q = stream.writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
      val corpusText = corpus.unionByName(streamExtra.toDF("doc_id", "text"))
      val v = DedupIndex.dedupAgainst(df, corpusText,
        DedupIndex.load(spark, streamIx))
      streamOut ++= v.collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.get(2)))).toMap
      val survivors = df.join(
        v.filter(col("status") === "kept").select(col("doc_id")),
        Seq("doc_id"), "left_semi").persist()
      survivors.count()
      DedupIndex.grow(survivors, streamIx)
      streamExtra ++= survivors.collect()
        .map(r => (r.getLong(0), r.getString(1)))
      survivors.unpersist()
      v.unpersist()
      ()
    }.start()
    try q.processAllAvailable() finally q.stop()

    // cross-batch catches: the exact re-crawl and the near-dup edit of
    // batch-1 novels are flagged AGAINST THE GROWN INDEX, attributed to
    // the admitted batch-1 doc ids
    assert(streamOut(90000L)._1 == "exact_corpus", streamOut(90000L))
    assert(streamOut(90001L)._1 == "kept" && streamOut(90002L)._1 == "kept")
    assert(streamOut(91000L) == (("exact_corpus", 90001L)), streamOut(91000L))
    assert(streamOut(91001L)._1 == "near_corpus" &&
      streamOut(91001L)._2 == 90002L, streamOut(91001L))
    assert(streamOut(91002L)._1 == "kept", streamOut(91002L))

    // batch/stream field parity: the same two batches through the same
    // loop in batch mode on a fresh index give identical verdicts
    val batchOut = runLoop(freshIndex(), Seq(b1, b2))
    assert(batchOut == streamOut.toMap)
  }

  test("streaming fingerprint-index maintenance: probe-while-growing, grown equals rebuilt") {
    import spark.implicits._
    import graft.operators.HashIndex
    // seed corpus + two streamed batches of 64-bit fingerprints; batch 2
    // contains a near-copy (1 bit flipped) of a batch-1 fingerprint, so
    // the cross-batch catch requires the index to have GROWN mid-stream
    val seed = Seq(1L -> 0x1111222233334444L, 2L -> 0x0F0F0F0F0F0F0F0FL)
    val b1 = Seq(10L -> 0xAAAA5555AAAA5555L)
    val b2 = Seq(20L -> (0xAAAA5555AAAA5555L ^ 1L), 21L -> 0x7777000077770000L)
    val ixDir = tempDir("hix-stream").getAbsolutePath
    HashIndex.build(seed.toDF("doc_id", "hash"), ixDir)

    val inDir = tempDir("hix-stream-in")
    def stage(rows: Seq[(Long, Long)], name: String, mtime: Long): Unit = {
      val tmp = tempDir(s"hix-stage-$name")
      rows.toDF("doc_id", "hash").coalesce(1)
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(inDir, name)
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    stage(b1, "b1.parquet", 1000000L)
    stage(b2, "b2.parquet", 2000000L)

    // each trigger: probe the arriving batch against the CURRENT index
    // (the dedup-admission shape), then grow with it
    val perBatch = scala.collection.mutable.ArrayBuffer[Set[(Long, Long)]]()
    val stream = spark.readStream
      .schema(b1.toDF("doc_id", "hash").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir.getAbsolutePath)
    val q = stream.writeStream.foreachBatch {
      (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ix = HashIndex.load(spark, ixDir)
        perBatch += HashIndex.probe(ix, df, maxHamming = 2)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        HashIndex.grow(df, ixDir)
        ()
    }.start()
    try q.processAllAvailable() finally q.stop()

    // trigger 1: batch 1 matches nothing in the seed; trigger 2: the
    // near-copy matches the batch-1 fingerprint ADMITTED mid-stream
    assert(perBatch.toSeq == Seq(Set.empty[(Long, Long)], Set((20L, 10L))),
      perBatch)

    // streamed-grown ≡ rebuilt from scratch over seed ∪ b1 ∪ b2
    val rebuiltDir = tempDir("hix-rebuilt").getAbsolutePath
    HashIndex.build((seed ++ b1 ++ b2).toDF("doc_id", "hash"), rebuiltDir)
    def rows(dir: String) = HashIndex.load(spark, dir).buckets
      .select(col("blk"), col("key"), col("doc_id"), col("hash")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(rows(ixDir) == rows(rebuiltDir))
  }

  test("streaming retrieval-index maintenance: search-while-growing, grown equals rebuilt") {
    import spark.implicits._
    import graft.operators.{Retrieval, RetrievalIndex}
    val seed = Seq(1L -> "alpha beta gamma", 2L -> "delta epsilon")
    val b1 = Seq(10L -> "needle one alpha", 11L -> "filler text here")
    val b2 = Seq(20L -> "needle two beta", 21L -> "more filler words")
    val ixDir = tempDir("rix-stream").getAbsolutePath
    RetrievalIndex.build(seed.toDF("doc_id", "text"), ixDir, nBuckets = 8)

    val inDir = tempDir("rix-stream-in")
    def stage(rows: Seq[(Long, String)], name: String, mtime: Long): Unit = {
      val tmp = tempDir(s"rix-stage-$name")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(inDir, name)
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    stage(b1, "b1.parquet", 1000000L)
    stage(b2, "b2.parquet", 2000000L)

    // every trigger: answer a standing query against the CURRENT index
    // (the decontamination-service shape: search keeps working while
    // the index ingests), then grow with the batch. The grow scaladoc's
    // checkpoint discipline makes the probe-then-append safe.
    val probe = Seq("needle").toDF("term")
    val perBatchHits = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    val stream = spark.readStream
      .schema(b1.toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir.getAbsolutePath)
    val q = stream.writeStream.foreachBatch {
      (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ix = RetrievalIndex.load(spark, ixDir)
        perBatchHits += RetrievalIndex.probe(ix, probe)
          .select(col("doc_id")).collect().map(_.getLong(0)).toSet
        RetrievalIndex.grow(df, ixDir)
        ()
    }.start()
    try q.processAllAvailable() finally q.stop()

    // trigger 1 saw the seed-only index (no needle docs); trigger 2 saw
    // batch 1's needle doc — the index visibly grew between triggers
    assert(perBatchHits.toSeq == Seq(Set.empty[Long], Set(10L)),
      perBatchHits)

    // the streamed-grown index answers exactly like a from-scratch
    // build over seed ∪ b1 ∪ b2 — postings, doclens, and a BM25 score
    val all = (seed ++ b1 ++ b2).toDF("doc_id", "text")
    val rebuiltDir = tempDir("rix-rebuilt").getAbsolutePath
    RetrievalIndex.build(all, rebuiltDir, nBuckets = 8)
    val grown = RetrievalIndex.load(spark, ixDir)
    val rebuilt = RetrievalIndex.load(spark, rebuiltDir)
    def rows(ix: RetrievalIndex.Loaded) = ix.postings
      .select(col("term"), col("doc_id"), col("tf"),
        array_join(col("positions"), ",")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(rows(grown) == rows(rebuilt))
    val qterms = Seq((1L, "needle"), (1L, "alpha")).toDF("query_id", "term")
    val a = RetrievalIndex.bm25TopK(grown, qterms, k = 5).collect().toSeq
    val b = RetrievalIndex.bm25TopK(rebuilt, qterms, k = 5).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("stateless curation chain composes in one stream with batch parity") {
    import spark.implicits._
    import graft.operators.{Curate, Dedup}
    val corpus = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))

    // the full stateless curation pass, as ONE chain: HTML → text
    // extraction → C4 line gate → PII scrub → quality verdict (t16's
    // rule on the scrubbed text) → near-dup admission probe. No
    // aggregation, no watermark, no state — the same code path must
    // serve a batch frame and an append stream (extraction and the
    // line gate are row-local codegen projections, so they ride the
    // stream for free).
    def curate(raw: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val docs = raw.withColumn("text", Curate.htmlToText(col("html")))
      val kept = graft.functions.GraftFunctions.c4_line_gate(
        split(col("text"), "\n"))
      val c4 = docs
        .withColumn("n_dropped",
          (size(split(col("text"), "\n")) - size(kept)).cast("long"))
        .withColumn("clean", Curate.redactPii(concat_ws(" ", kept)))
      val toks = split(trim(col("clean")), "\\s+")
      val gated = c4
        .withColumn("n_tok", size(toks).cast("long"))
        .withColumn("verdict",
          when(col("n_tok") < 5, "too_short")
            .otherwise("keep"))
      Dedup.nearDupAdmission(gated, corpus, fpp = 0.001)
        .select(col("doc_id"), col("verdict"), col("dup_candidate"),
          col("clean"), col("n_dropped"))
    }

    val arriving = Seq(
      // a corpus copy wrapped in page chrome and carrying fresh PII —
      // must extract, scrub, AND flag as dup (shingles split on \s+, so
      // extraction-side whitespace normalization can't hide the copy)
      (30000L, "<html><body><p>" +
        corpus.filter(col("doc_id") === 1).head().getString(1) +
        "</p></body></html>"),
      (30001L, "<div>contact me at <b>alice@example.com</b> " +
        "for the files now please.</div>"),
      (30002L, "<p>too&nbsp;short</p>"),
      // middle block trips the gate's banned term; the script subtree
      // must vanish before the gate ever sees it; the doc survives
      (30003L, "<p>genuine first line stays right here.</p>" +
        "<script>var banned = 'javascript';</script>" +
        "<p>buy javascript now.</p><p>second real line is kept too.</p>"))
      .toDF("doc_id", "html")
    val inDir = tempDir("curate").getAbsolutePath
    arriving.coalesce(1).write.mode("overwrite").parquet(inDir)

    val stream = spark.readStream.schema(arriving.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = EventStream.runToMemory(curate(stream), "curate_out")
    try {
      val rows = spark.table("curate_out").collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getBoolean(2), r.getString(3), r.getLong(4))))
        .toMap
      assert(rows.size == 4)
      assert(rows(30000L)._2, "corpus copy not flagged as dup")
      assert(rows(30001L)._1 == "keep" && !rows(30001L)._2)
      assert(!rows(30001L)._3.contains("alice@example.com"), "PII survived")
      assert(rows(30002L)._1 == "too_short")
      // the gate dropped exactly the javascript line; the doc survives
      assert(rows(30003L)._1 == "keep" && rows(30003L)._4 == 1L)
      assert(!rows(30003L)._3.contains("javascript"))
      assert(rows(30003L)._3.contains("second real line is kept too."))
      // batch parity: identical output through the identical chain
      val batch = curate(arriving).collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getBoolean(2), r.getString(3), r.getLong(4))))
        .toMap
      assert(batch == rows)
    } finally q.stop()
  }
}
