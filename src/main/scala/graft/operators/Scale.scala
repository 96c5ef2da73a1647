package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities for the 100 TB posture (SURVEY §7.4 / builder
  * guidance): co-located bucketed joins (no shuffle at query time) and
  * salted joins for skewed keys (complementing AQE's runtime skew
  * handling when skew is known up front).
  */
object Scale {

  /** Persist `df` as a bucketed table: co-locates future equi-joins /
    * aggregations on `keyCol` — the shuffle happens once at write time,
    * never again at read time. The warehouse analog of the reference's
    * per-collection prefix partitioning (one listing call per prefix,
    * s3-discovery/handler.py:29).
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** LSH bucket-key width sized to the corpus: the smallest `bits` with
    * expected occupancy `corpusSize / 2^bits <= targetOccupancy`, clamped
    * to [minBits, maxBits]. A FIXED key width means bucket sizes grow
    * O(n) and a bucket self-join re-quadratifies at scale (then a bucket
    * cap silently deletes the signal); deriving the width from the corpus
    * keeps expected occupancy O(1) at any size — 500 docs get 4-bit keys,
    * a 10^9-doc corpus gets ~25-bit keys. Recall at wider keys is
    * recovered by multi-probing bit-flipped buckets on one side.
    */
  def lshBitsFor(corpusSize: Long, targetOccupancy: Long = 32,
      minBits: Int = 4, maxBits: Int = 30): Int = {
    val ratio = math.max(1.0, corpusSize.toDouble / targetOccupancy)
    val needed = math.ceil(math.log(ratio) / math.log(2.0)).toInt
    math.min(maxBits, math.max(minBits, needed))
  }

  /** Drops rows belonging to oversized LSH/blocking buckets before a
    * bucket self-join. A degenerate bucket (empty docs, boilerplate, a
    * hot hash key) contributes O(n²) candidate pairs and lands on one
    * reducer — on a skewed 100 TB corpus a single hot (band, key) can
    * re-quadratify the whole join. Rows above `maxBucket` are dropped:
    * pairs inside such buckets are overwhelmingly exact/boilerplate
    * duplicates that the exact-hash dedup pass (d01) already catches,
    * and near-dup pairs keep `bands - 1` other chances to collide.
    *
    * Shape matters here: a window `count().over(partitionBy(keys))`
    * would shuffle EVERY row of the hot bucket to one task just to
    * discard them — the guard itself becoming the skew point. Instead
    * the bucket sizes come from `groupBy(keys).count()` (partial
    * aggregation shrinks the hot key to one row per map task before the
    * exchange), only the OVERSIZED keys are kept (a hot key is rare by
    * definition, so this set is tiny), and the rows are filtered with a
    * broadcast anti-join — no row of a hot bucket ever concentrates on
    * a single task, and the corpus side never shuffles at all.
    */
  def capBuckets(rows: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame = {
    val hot = rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__bucket_n"))
      .filter(col("__bucket_n") > maxBucket)
      .select(keys.map(k => col(k).as(s"__hot_$k")): _*)
    // null-safe equality: a null key forms a bucket under groupBy, so the
    // anti-join must match it the same way or a hot null bucket escapes
    val cond = keys.map(k => col(k) <=> col(s"__hot_$k")).reduce(_ && _)
    rows.join(broadcast(hot), cond, "left_anti")
  }

  /** 2-D Morton (Z-order) interleave of two non-negative int columns —
    * the multi-dimensional data-layout primitive (Delta OPTIMIZE
    * ZORDER / Iceberg sort-order lineage): rows close in (x, y) land
    * close in z, so range-partitioning by z gives every output file a
    * TIGHT min/max box in BOTH columns and parquet footer pruning cuts
    * 2-D predicates that a single-column sort can only prune on its
    * leading key. Pure codegen'd bit arithmetic (the standard 5-step
    * bit spread), exact integers — oracle-comparable. Inputs clamp to
    * 31 bits each (loud). */
  def zorder2(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def spreadBits(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      var v = c.cast("long")
      v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x3333333333333333L))
      (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x5555555555555555L))
    }
    val guard = (c: org.apache.spark.sql.Column, n: String) =>
      when(c >= 0 && c < (1L << 31), c)
        .otherwise(raise_error(concat(lit(s"zorder2: $n out of 0..2^31 range: "),
          c.cast("string"))).cast("long"))
    spreadBits(guard(x, "x")).bitwiseOR(shiftleft(spreadBits(guard(y, "y")), 1))
  }

  /** Z-ordered parquet layout: range-partition by [[zorder2]] then sort
    * within partitions — one total-order exchange (sampled bounds, no
    * global sort), every file a contiguous z-range. The footer min/max
    * statistics become a 2-D spatial index for free; ScaleSpec measures
    * the pruning win against a linear layout. */
  def zorderWrite(df: DataFrame, x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column, path: String, nFiles: Int): Unit =
    df.withColumn("_z", zorder2(x, y))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Size-targeted parquet write (small-files compaction): pick the
    * partition count from Catalyst's own size estimate
    * (`optimizedPlan.stats.sizeInBytes` — the planner's number, not a
    * sample pass) so output files land near `targetBytes` each. A 100 TB
    * pipeline that writes a shuffle's default partitioning produces
    * thousands of KB-sized files per job (the classic downstream-scan
    * killer); one `repartition(n)` round-robin exchange bounds both file
    * count and size. Returns the partition count chosen.
    */
  def compactWrite(df: DataFrame, path: String,
      targetBytes: Long = 128L << 20): Int = {
    val estimate = df.queryExecution.optimizedPlan.stats.sizeInBytes // BigInt
    val n = ((estimate + targetBytes - 1) / targetBytes)
      .max(BigInt(1)).min(BigInt(100000)).toInt
    df.repartition(n).write.mode("overwrite").parquet(path)
    n
  }

  /** Count of parquet data files under `path` (recursive — includes
    * partition subdirectories; `_SUCCESS`/metadata files excluded). The
    * fragmentation signal for [[compactTable]]. */
  def dataFileCount(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) n += 1
      }
      n
    }
  }

  /** Rewrite-when-fragmented compaction for an append-maintained parquet
    * table — the missing maintenance step of any grow loop. Parquet
    * appends accumulate one-file-per-task-per-append; over a long crawl
    * loop that is unbounded small-file growth, and small files are the
    * classic downstream-scan killer (every probe pays per-file open +
    * footer read + listing).
    *
    * If the table at `path` holds more than `maxFiles` data files, it is
    * rewritten with size-targeted partitioning (the [[compactWrite]]
    * sizing) into a temporary sibling directory and then swapped in.
    * Content is preserved exactly (same rows, set semantics); the
    * physical layout is rebuilt. Returns true iff a rewrite happened.
    *
    * `partitionCols` must name the table's hive-style partition columns
    * (empty for an unpartitioned table); the rewrite preserves that
    * layout. The exchange is `repartitionByRange` over the partition
    * columns plus the first data column: ranging (not hashing) on the
    * partition column co-locates each partition value into FEW
    * CONSECUTIVE tasks — so files-per-partition-directory stays bounded
    * by the task count — while the secondary column still splits a hot
    * partition value across tasks instead of concentrating it on one
    * (the [[capBuckets]] lesson: never let a maintenance pass become the
    * skew point).
    *
    * Single-writer contract (same as the grow loops it serves): the swap
    * is delete-then-rename, not atomic under concurrent readers, and any
    * DataFrame loaded from `path` BEFORE the call holds a stale file
    * listing afterwards — re-`load` the index after a compacting grow,
    * exactly as the crawl loop already re-loads per batch. */
  def compactTable(spark: SparkSession, path: String,
      partitionCols: Seq[String] = Nil,
      targetBytes: Long = 128L << 20, maxFiles: Int = 64): Boolean = {
    if (dataFileCount(spark, path) <= maxFiles) return false
    val df = spark.read.parquet(path)
    val estimate = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = ((estimate + targetBytes - 1) / targetBytes)
      .max(BigInt(1)).min(BigInt(100000)).toInt
    val rangeCols = (partitionCols ++
      df.columns.filterNot(partitionCols.contains).take(1)).map(col)
    val writer = df.repartitionByRange(n, rangeCols: _*).write
    val tmp = s"$path.__compact_tmp"
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(path))
    true
  }

  /** Salted equi-join for a known-skewed big side: the big side's key is
    * split into `saltFactor` sub-keys; the small side is replicated
    * `saltFactor`× so every sub-key finds its match. Restores balanced
    * partitions when one key dominates (e.g. the 26-city nightlights
    * fan-out, SURVEY §7.4.5).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor))
        .cast("int"))
    val replicated = small
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
