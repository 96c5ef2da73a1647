package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** Persistent 64-bit fingerprint index — the stored, servable form of
  * the banded-hamming near-dup screen ([[Dedup.hammingNearDups]]), and
  * the last index family the crawl story needed: a corpus accumulates
  * perceptual hashes (image aHash m08, audio energy-delta m11, video
  * temporal-spatial m21 — any 64-bit fingerprint), and each arriving
  * batch asks "which of mine near-duplicate anything already stored?"
  * without recomputing or re-shuffling the corpus hashes.
  *
  * On-disk layout under `dir` (the RetrievalIndex/DecontamIndex
  * discipline):
  *  - `meta.parquet` — one row: blocks, keyBits (the banding shape
  *    probes MUST reproduce, read from here, never trusted)
  *  - `buckets.parquet/blk=N/` — (key, doc_id, hash): rotated
  *    keyBits-wide hash windows ([[Dedup.hammingNearDups]]'s scheme —
  *    with keyBits = 16 and 4 blocks these are the contiguous 16-bit
  *    slices the m16 oracle recomputes); the stored hash rides along so
  *    verification needs no second corpus join
  *  - `hashes.parquet` — (doc_id, hash), the authoritative table grows
  *    and takedowns audit against
  *  - `tombstones.parquet` — append-only forgotten ids; [[load]] masks
  *    both tables, [[vacuum]] drops rows physically
  *
  * Scale posture: a probe broadcasts the BATCH's band keys into a
  * semi-join, so the stored side streams map-side; candidate rows are
  * bounded by (batch keys × bucket occupancy) and the hot-bucket guard
  * drops any probed bucket over `maxBucket` (the m28 constant-tile
  * lesson) with a candidate-bounded counts pass, never a corpus-wide
  * exchange. Verification is exact `bit_count(xor)` on the hashes the
  * candidate rows already carry.
  */
object HashIndex {

  final case class Loaded(blocks: Int, keyBits: Int,
      hashes: DataFrame, buckets: DataFrame)

  /** (doc_id, hash, blk, key) band rows — rotated keyBits-wide windows,
    * the [[Dedup.hammingNearDups]] contract (Java shift semantics:
    * << 64 is a no-op, so blk 0 is hash & mask). */
  private def keyedOf(sigs: DataFrame, blocks: Int,
      keyBits: Int): DataFrame = {
    val mask = (1L << keyBits) - 1
    sigs.select(col("doc_id"), col("hash"),
        explode(array((0 until blocks).map { i =>
          val off = i * (64 / blocks)
          val rot = shiftrightunsigned(col("hash"), off)
            .bitwiseOR(shiftleft(col("hash"), 64 - off))
          struct(lit(i).as("blk"), rot.bitwiseAND(lit(mask)).as("key"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("hash"),
        col("bk.blk").as("blk"), col("bk.key").as("key"))
  }

  /** Persist the corpus's fingerprint index: one pass over the (already
    * id+hash-shaped — KB per million docs) signature frame. */
  def build(sigs: DataFrame, dir: String, blocks: Int = 4,
      keyBits: Int = 16): Unit = {
    require(blocks >= 1 && 64 % blocks == 0, s"blocks $blocks must divide 64")
    require(keyBits >= 1 && keyBits <= 62, s"keyBits $keyBits")
    val spark = sigs.sparkSession
    import spark.implicits._
    Seq((blocks, keyBits)).toDF("blocks", "keyBits")
      .write.mode("overwrite").parquet(s"$dir/meta.parquet")
    sigs.select(col("doc_id"), col("hash"))
      .write.mode("overwrite").parquet(s"$dir/hashes.parquet")
    keyedOf(sigs, blocks, keyBits)
      .write.mode("overwrite").partitionBy("blk")
      .parquet(s"$dir/buckets.parquet")
  }

  /** Append a new batch's fingerprints (NEW doc_ids — the survivors
    * rule). Frozen before the appends (the index-append-invalidation
    * discipline); compacts when fragmented. */
  def grow(batch: DataFrame, dir: String, compactAbove: Int = 64): Unit = {
    val spark = batch.sparkSession
    // memoized driver-side meta read (StoreGuard) — was one Spark job
    // per grow on the crawl loop's per-batch maintenance path
    val m = StoreGuard.metaRow(spark, dir, "blocks", "keyBits")
    val (blocks, keyBits) = (m.getAs[Int]("blocks"), m.getAs[Int]("keyBits"))
    val frozen = batch.select(col("doc_id"), col("hash"))
      .localCheckpoint(true)
    frozen.write.mode("append").parquet(s"$dir/hashes.parquet")
    keyedOf(frozen, blocks, keyBits)
      .write.mode("append").partitionBy("blk")
      .parquet(s"$dir/buckets.parquet")
    if (compactAbove > 0) {
      Scale.compactTable(spark, s"$dir/hashes.parquet",
        maxFiles = compactAbove)
      Scale.compactTable(spark, s"$dir/buckets.parquet",
        partitionCols = Seq("blk"), maxFiles = compactAbove)
    }
  }

  /** Takedown without a rewrite — [[load]] masks; [[vacuum]] drops. */
  def forget(ids: DataFrame, dir: String): Unit =
    ids.select(col("doc_id")).distinct().localCheckpoint(true)
      .write.mode("append").parquet(s"$dir/tombstones.parquet")

  def vacuum(spark: SparkSession, dir: String): Unit = {
    tombstones(spark, dir).foreach { t =>
      val h = spark.read.parquet(s"$dir/hashes.parquet")
        .join(broadcast(t), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      h.write.mode("overwrite").parquet(s"$dir/hashes.parquet")
      val b = spark.read.parquet(s"$dir/buckets.parquet")
        .join(broadcast(t), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      b.repartition(col("blk"))
        .write.mode("overwrite").partitionBy("blk")
        .parquet(s"$dir/buckets.parquet")
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], t.schema)
        .write.mode("overwrite").parquet(s"$dir/tombstones.parquet")
    }
  }

  private def tombstones(spark: SparkSession, dir: String): Option[DataFrame] =
    StoreGuard.tombstoneIds(spark, dir) // footer-count emptiness, no job

  def load(spark: SparkSession, dir: String): Loaded = {
    val m = StoreGuard.metaRow(spark, dir, "blocks", "keyBits")
    val mask: DataFrame => DataFrame = tombstones(spark, dir) match {
      case Some(t) => df => df.join(broadcast(t), Seq("doc_id"), "left_anti")
      case None => identity
    }
    Loaded(m.getAs[Int]("blocks"), m.getAs[Int]("keyBits"),
      mask(StoreGuard.table(spark, dir, "hashes.parquet", "doc_id", "hash")),
      mask(StoreGuard.table(spark, dir, "buckets.parquet",
        "doc_id", "hash", "blk", "key")))
  }

  /** Near-dup matches of a `batch` (doc_id, hash) against the STORED
    * corpus: (doc_id, corpus_id, hamming ≤ maxHamming). The batch's
    * band keys broadcast; probed buckets over `maxBucket` stored rows
    * are dropped whole (the skew guard — its counts pass reads only the
    * probed slice); verification is exact bit_count(xor) on hashes the
    * candidate rows carry. */
  def probe(ix: Loaded, batch: DataFrame, maxHamming: Int = 2,
      maxBucket: Int = 100): DataFrame = {
    // multi-referenced frames freeze as eager localCheckpoint leaves
    // rather than persist: checkpointed blocks are AUTO-RELEASED by the
    // ContextCleaner when unreferenced, so the per-micro-batch streaming
    // maintenance path cannot leak a pair of cached frames per trigger,
    // and the result stays LAZY
    // bkeys is LAZY: the eager `probed` checkpoint below is its first
    // action (via the broadcast build), so one job materializes both
    // leaves — was two sequential checkpoint jobs per probe (r20)
    val bkeys = keyedOf(batch.select(col("doc_id"), col("hash")),
        ix.blocks, ix.keyBits)
      .localCheckpoint(false)
    val probed = ix.buckets
      .join(broadcast(bkeys.select(col("blk"), col("key")).distinct()),
        Seq("blk", "key"), "left_semi")
      .localCheckpoint(true)
    val hot = probed.groupBy(col("blk"), col("key"))
      .agg(count(lit(1)).as("n")).filter(col("n") > maxBucket)
      .select(col("blk"), col("key"))
    val stored = probed
      .join(broadcast(hot), Seq("blk", "key"), "left_anti")
      .select(col("blk"), col("key"),
        col("doc_id").as("corpus_id"), col("hash").as("corpus_hash"))
    stored.join(broadcast(bkeys), Seq("blk", "key"))
      .select(col("doc_id"), col("hash"), col("corpus_id"), col("corpus_hash"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("hash").bitwiseXOR(col("corpus_hash"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_id"), col("corpus_id"), col("hamming"))
  }

  type Q = (SparkSession, String) => DataFrame

  /** Per-dataset stored image-hash index: corpus = doc_id ≢ 0 mod 10
    * rendered as real PNGs and hashed through the real decode kernel,
    * built 80/20 so grow parity sits under the oracle. */
  private def builtImageIndex(s: SparkSession, d: String): String =
    IxScratch.cached("hashix:" + IxScratch.fingerprint(d),
        "graft_hash_ix") { p =>
      val sigs = imageSigs(s, d).filter(col("doc_id") % 10 =!= 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
      build(sigs.filter(col("doc_id") % 7 =!= 0), p)
      grow(sigs.filter(col("doc_id") % 7 === 0), p)
      sigs.unpersist(blocking = false)
    }

  /** The m16 congruence fixture, one image per doc: unique
    * multiplicative 8×8 tiles keyed by the doc id — except batch docs
    * (id ≡ 0 mod 10) that also satisfy id ≡ 0 mod 30, which borrow
    * corpus doc id+1's exact cells (the planted cross-set match).
    * Hashes go through the real PNG encode → sniffing decode → block
    * sums, so the oracle (which recomputes from the congruences) gates
    * the codec path too. */
  private def imageSigs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // id-spine widening (the r19 Multimodal.docIds treatment, guide
    // §2.5): documents.parquet is ONE row group, so without the
    // repartition the PNG encode + sniffing decode below runs as a
    // single serial task per probe. The exchange carries 8-byte ids;
    // every consumer is row-local on doc_id, so results are unchanged.
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { id =>
          val w = 64; val h = 64
          val src = if (id % 30 == 0 && id % 10 == 0) id + 1 else id
          val m1 = (src * 2654435761L) % 251L + 2L
          val m2 = (src * 40503L) % 239L + 3L
          val px = Array.tabulate(w * h) { i =>
            val bx = (i % w) / 8; val by = (i / w) / 8
            ((bx * m1 + by * m2 + src) % 256L).toInt
          }
          (id, "image",
            graft.kernel.Png.encode(graft.kernel.Png.Image(w, h, 1, 8, px)))
        }
      }
      .toDF("doc_id", "media_type", "payload")
    Multimodal.imageHashesWith(media,
        classOf[Multimodal.ImageDecoder].getName)
      .select(col("doc_id"), col("img_hash").as("hash"))
  }

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // Batch-vs-stored image near-dups: the corpus's perceptual hashes
    // persist once (build 80% → grow 20%), the batch (id ≡ 0 mod 10)
    // probes; planted id ≡ 0 mod 30 docs carry corpus doc id+1's exact
    // pixels → hamming 0. The oracle replays the ENTIRE pipeline from
    // the tile congruences: block sums → ratio bits → 16-bit band
    // slices → stored-side bucket cap → candidate join → exact
    // hamming — a decode, banding, grow, cap, or verify bug breaks the
    // hash (the m16 conversion pattern applied to the stored form).
    ("m36_hash_index", (s: SparkSession, d: String) => {
      val batch = imageSigs(s, d).filter(col("doc_id") % 10 === 0)
      probe(load(s, builtImageIndex(s, d)), batch,
          maxHamming = 2, maxBucket = 100)
        .orderBy(col("doc_id"), col("corpus_id"))
    },
    Some("""WITH grid AS (
        SELECT bx.bx, by.by FROM
          (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS bx) bx,
          (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS by) by),
      eff AS (
        SELECT doc_id,
          CASE WHEN doc_id % 30 = 0 AND doc_id % 10 = 0
            THEN doc_id + 1 ELSE doc_id END AS src
        FROM documents),
      cells AS (
        SELECT e.doc_id, g.by * 8 + g.bx AS pos,
          (g.bx * ((e.src * 2654435761) % 251 + 2)
            + g.by * ((e.src * 40503) % 239 + 3) + e.src) % 256 AS v
        FROM eff e, grid g),
      tot AS (SELECT doc_id, sum(v) AS total FROM cells GROUP BY doc_id),
      bits AS (
        SELECT c.doc_id, c.pos,
          CASE WHEN c.v * 64 > t.total THEN 1 ELSE 0 END AS bit
        FROM cells c JOIN tot t USING (doc_id)),
      bands AS (
        SELECT doc_id, pos // 16 AS blk,
          sum(bit * (1 << (pos % 16))) AS key
        FROM bits GROUP BY doc_id, blk),
      keptC AS (
        SELECT doc_id, blk, key FROM (
          SELECT doc_id, blk, key,
            count(*) OVER (PARTITION BY blk, key) AS n
          FROM bands WHERE doc_id % 10 <> 0) t WHERE n <= 100),
      bandsB AS (
        SELECT doc_id, blk, key FROM bands WHERE doc_id % 10 = 0),
      cand AS (
        SELECT DISTINCT b.doc_id, c.doc_id AS corpus_id
        FROM bandsB b JOIN keptC c ON b.blk = c.blk AND b.key = c.key),
      ham AS (
        SELECT cd.doc_id, cd.corpus_id,
          CAST(sum(abs(ba.bit - bb.bit)) AS INTEGER) AS hamming
        FROM cand cd
        JOIN bits ba ON ba.doc_id = cd.doc_id
        JOIN bits bb ON bb.doc_id = cd.corpus_id AND bb.pos = ba.pos
        GROUP BY cd.doc_id, cd.corpus_id)
      SELECT doc_id, corpus_id, hamming FROM ham WHERE hamming <= 2
      ORDER BY doc_id, corpus_id""")),

    // The FORGET lifecycle under the oracle (the d16/r13 treatment for
    // the fingerprint index, completing the per-family set): the m36
    // index is built 80/20, then every 17th stored doc is tombstoned;
    // the masked load drops its rows from the bucket table, so a
    // forgotten image stops attracting near-dup candidates (including
    // planted id+1 matches whose anchor happens to be forgotten) and
    // stops counting toward the hot-bucket cap. The oracle is m36's
    // full-replay SQL with the stored side restricted to RETAINED ids —
    // a tombstone that failed to mask the buckets hash-mismatches.
    // HashIndexSpec keeps the live forget/vacuum/regrow parity gates.
    ("m43_hash_forget", (s: SparkSession, d: String) => {
      val dir = IxScratch.cached("m43:" + IxScratch.fingerprint(d),
          "graft_m43_ix") { p =>
        val sigs = imageSigs(s, d).filter(col("doc_id") % 10 =!= 0)
          .persist(StorageLevel.MEMORY_AND_DISK)
        build(sigs.filter(col("doc_id") % 7 =!= 0), p)
        grow(sigs.filter(col("doc_id") % 7 === 0), p)
        sigs.unpersist(blocking = false)
        forget(Tables.documents(s, d)
          .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 17 === 0)
          .select(col("doc_id")), p)
      }
      val batch = imageSigs(s, d).filter(col("doc_id") % 10 === 0)
      probe(load(s, dir), batch, maxHamming = 2, maxBucket = 100)
        .orderBy(col("doc_id"), col("corpus_id"))
    },
    Some("""WITH grid AS (
        SELECT bx.bx, by.by FROM
          (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS bx) bx,
          (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS by) by),
      eff AS (
        SELECT doc_id,
          CASE WHEN doc_id % 30 = 0 AND doc_id % 10 = 0
            THEN doc_id + 1 ELSE doc_id END AS src
        FROM documents),
      cells AS (
        SELECT e.doc_id, g.by * 8 + g.bx AS pos,
          (g.bx * ((e.src * 2654435761) % 251 + 2)
            + g.by * ((e.src * 40503) % 239 + 3) + e.src) % 256 AS v
        FROM eff e, grid g),
      tot AS (SELECT doc_id, sum(v) AS total FROM cells GROUP BY doc_id),
      bits AS (
        SELECT c.doc_id, c.pos,
          CASE WHEN c.v * 64 > t.total THEN 1 ELSE 0 END AS bit
        FROM cells c JOIN tot t USING (doc_id)),
      bands AS (
        SELECT doc_id, pos // 16 AS blk,
          sum(bit * (1 << (pos % 16))) AS key
        FROM bits GROUP BY doc_id, blk),
      keptC AS (
        SELECT doc_id, blk, key FROM (
          SELECT doc_id, blk, key,
            count(*) OVER (PARTITION BY blk, key) AS n
          FROM bands
          WHERE doc_id % 10 <> 0 AND doc_id % 17 <> 0) t WHERE n <= 100),
      bandsB AS (
        SELECT doc_id, blk, key FROM bands WHERE doc_id % 10 = 0),
      cand AS (
        SELECT DISTINCT b.doc_id, c.doc_id AS corpus_id
        FROM bandsB b JOIN keptC c ON b.blk = c.blk AND b.key = c.key),
      ham AS (
        SELECT cd.doc_id, cd.corpus_id,
          CAST(sum(abs(ba.bit - bb.bit)) AS INTEGER) AS hamming
        FROM cand cd
        JOIN bits ba ON ba.doc_id = cd.doc_id
        JOIN bits bb ON bb.doc_id = cd.corpus_id AND bb.pos = ba.pos
        GROUP BY cd.doc_id, cd.corpus_id)
      SELECT doc_id, corpus_id, hamming FROM ham WHERE hamming <= 2
      ORDER BY doc_id, corpus_id"""))
  )
}
