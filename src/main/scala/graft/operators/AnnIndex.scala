package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVFPQ index — the stored form of [[Similarity.ivfpqTopK]]'s
  * pipeline. `ivfpqTopK` trains and encodes per call, which is right for
  * a one-shot query but wrong for a served corpus: at scale the models
  * train once, the corpus encodes once, and every query afterwards pays
  * only probe + ADC scan + re-rank.
  *
  * On-disk layout under `dir`:
  *  - `meta.parquet`  — one row: dim, m, ks, nlist, replicas
  *  - `model.parquet` — the coarse centroids and PQ codebook as flat
  *    float arrays (driver-side objects at load, like any broadcast
  *    model; nlist·dim + m·ks·(dim/m) floats — KBs to low MBs)
  *  - `index.parquet/list_id=N/` — (vec_id, codes binary(m)) rows,
  *    PARTITIONED BY the IVF list: a probe touching `nprobe` lists reads
  *    only those directories, so the scan cost tracks nprobe/nlist of
  *    the corpus — the partition layout IS the inverted file.
  *
  * Replica assignments (a vector stored under its `replicas` nearest
  * lists) multiply the index rows, not the corpus; the query-side
  * distinct collapses them exactly as in [[Similarity.ivfpqTopK]].
  */
object AnnIndex {

  final case class Loaded(dim: Int, m: Int, ks: Int, nlist: Int,
      replicas: Int, centroids: Array[Float], codebook: Array[Float],
      rotation: Option[Seq[Seq[Double]]], index: DataFrame)

  /** Apply a stored OPQ rotation (identity when absent): one codegen'd
    * row-local projection — encode-side and query-side vectors must
    * pass through the SAME rotation the models were trained under. */
  private def rotated(emb: DataFrame,
      rot: Option[Seq[Seq[Double]]]): DataFrame =
    rot.fold(emb)(r => Similarity.pcaProjectFrame(emb, r)
      .select(col("vec_id"), col("reduced").as("embedding")))

  /** Train both models on the corpus, encode it, and persist the whole
    * index. Deterministic: same corpus + params ⇒ byte-identical models
    * (the bounded-sample trainers are seedless and order-fixed).
    *
    * `opq = true` trains and stores the parametric-OPQ rotation
    * ([[Similarity.opqRotation]] — Ge et al. 2013 §4, the s11
    * preprocessing) and both models train over ROTATED vectors; every
    * encode and probe afterwards applies the stored rotation first, so
    * the quantization-error win PcaSpec proves for s11 reaches the
    * SERVED index, not just the one-shot query. Exact doubles persist
    * (a float-rounded rotation would break grow ≡ rebuild parity). */
  def build(corpus: DataFrame, dir: String, nlist: Int = 0,
      replicas: Int = 2, m: Int = 8, ks: Int = 64,
      opq: Boolean = false,
      /** Pre-derived (centroids, codebook) — skips training. The s22
        * oracle twin supplies the md5-sample models here so the STORED
        * index (and everything served from it) is SQL-replayable;
        * production builds leave it None and train. Incompatible with
        * `opq` (the rotation is part of training). */
      models: Option[(Array[Float], Array[Float])] = None): Unit = {
    require(models.isEmpty || !opq,
      "AnnIndex.build: supplied models are incompatible with opq training")
    val spark = corpus.sparkSession
    import spark.implicits._
    val fns = graft.functions.GraftFunctions
    val rot: Option[Seq[Seq[Double]]] =
      if (opq) Some(Similarity.opqRotation(corpus, m)) else None
    val enc = rotated(corpus.select(col("vec_id"), col("embedding")), rot)
    val (centroids, codebook, dim, lists) = models match {
      case Some((c, cb)) =>
        require(nlist > 0, "AnnIndex.build: nlist required with models")
        require(c.nonEmpty && cb.nonEmpty && c.length % nlist == 0,
          "AnnIndex.build: model shapes inconsistent with nlist")
        (c, cb, c.length / nlist, nlist)
      case None =>
        val n = enc.count()
        val lists0 = if (nlist > 0) nlist else Similarity.nlistFor(n)
        val (ctr, d) = Similarity.trainCentroids(enc, lists0, n)
        val (cb, _) = Similarity.trainPq(enc, n, m, ks)
        (ctr, cb, d, lists0)
    }
    val ksEff = codebook.length / dim

    // persist the EFFECTIVE replication (encode uses min(replicas,
    // lists)) so the metadata never overstates what the index contains
    Seq((dim, m, ksEff, lists, math.min(replicas, lists)))
      .toDF("dim", "m", "ks", "nlist", "replicas")
      .write.mode("overwrite").parquet(s"$dir/meta.parquet")
    Seq(("centroids", centroids.toSeq), ("codebook", codebook.toSeq))
      .toDF("kind", "vals")
      .write.mode("overwrite").parquet(s"$dir/model.parquet")
    rot.foreach { r =>
      Seq((r.length, r.flatten))
        .toDF("dim", "vals")
        .write.mode("overwrite").parquet(s"$dir/rotation.parquet")
    }

    enc.select(col("vec_id"),
        explode(fns.nearest_centroids(col("embedding"), centroids, dim,
          math.min(replicas, lists))).as("list_id"),
        fns.pq_encode(col("embedding"), codebook, dim, m).as("codes"))
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$dir/index.parquet")
  }

  /** Append new vectors to a stored index WITHOUT retraining — the
    * index-maintenance step a served corpus needs (vectors arrive daily;
    * the models retrain rarely). Assignment and codes use the STORED
    * models, so the grown index is row-identical to encoding
    * corpus ∪ batch with those models (spec-pinned); it is NOT a
    * retrain — under real distribution shift the standard IVF practice
    * applies: grow until recall degrades, then rebuild.
    *
    * The batch is frozen with an eager localCheckpoint before the
    * append: if its plan derives from a query over this same index (a
    * dedup-then-admit flow), Spark's path refresh after the write would
    * otherwise invalidate and silently recompute it against the
    * half-grown index — the [[DedupIndex.grow]] lesson.
    *
    * Finishes with a rewrite-when-fragmented pass
    * ([[Scale.compactTable]]): daily appends otherwise accumulate one
    * small file per task per batch in every touched list directory,
    * and probe cost is per-file, so a long-lived served index degrades
    * by listing/footer overhead alone. Above `compactAbove` data files
    * the index parquet is rewritten size-targeted, keeping the list_id
    * partitioning (the layout IS the inverted file). `compactAbove <= 0`
    * disables; re-[[load]] after a compacting grow (stale listings). */
  def grow(batch: DataFrame, dir: String, compactAbove: Int = 64): Unit = {
    val spark = batch.sparkSession
    val ix = load(spark, dir)
    val fns = graft.functions.GraftFunctions
    val frozen = rotated(batch.select(col("vec_id"), col("embedding"))
      .localCheckpoint(true), ix.rotation)
    frozen.select(col("vec_id"),
        explode(fns.nearest_centroids(col("embedding"), ix.centroids,
          ix.dim, ix.replicas)).as("list_id"),
        fns.pq_encode(col("embedding"), ix.codebook, ix.dim, ix.m).as("codes"))
      .repartition(col("list_id"))
      .write.mode("append").partitionBy("list_id")
      .parquet(s"$dir/index.parquet")
    if (compactAbove > 0)
      Scale.compactTable(spark, s"$dir/index.parquet",
        partitionCols = Seq("list_id"), maxFiles = compactAbove)
  }

  /** Delete vectors WITHOUT rewriting the inverted file — the other
    * half of the served-index lifecycle next to [[grow]]: deleted ids
    * land in an append-only tombstone table, and [[load]] masks them
    * out lazily, so a deleted vector can never surface — including its
    * REPLICA rows across several lists, which a per-list physical
    * delete would have to chase. Deletes are rare and id-sized; the
    * physical rows leave at the next [[vacuum]]. Same single-writer
    * contract and checkpoint-before-append discipline as [[grow]] (the
    * ids may derive from a query over this very index). */
  def delete(ids: DataFrame, dir: String): Unit =
    ids.select(col("vec_id")).distinct().localCheckpoint(true)
      .write.mode("append").parquet(s"$dir/tombstones.parquet")

  /** Physically drop tombstoned rows and clear the tombstone table —
    * the vacuum step a long-lived index runs off-peak. Survivors are
    * materialized (eager localCheckpoint) BEFORE the overwrite: the
    * rewrite reads the files it is about to delete. Re-[[load]] after
    * (stale listings). */
  def vacuum(spark: SparkSession, dir: String): Unit = {
    val t = tombstones(spark, dir)
    if (t.isDefined) {
      val raw = spark.read.parquet(s"$dir/index.parquet")
      val survivors = raw.join(broadcast(t.get), Seq("vec_id"), "left_anti")
        .localCheckpoint(true)
      survivors
        .repartition(col("list_id"))
        .write.mode("overwrite").partitionBy("list_id")
        .parquet(s"$dir/index.parquet")
      // an empty frame with the right schema clears the table
      t.get.limit(0).write.mode("overwrite")
        .parquet(s"$dir/tombstones.parquet")
    }
  }

  private def tombstones(spark: SparkSession, dir: String): Option[DataFrame] =
    StoreGuard.tombstoneIds(spark, dir, "vec_id") // footer-count emptiness

  /** Load the models driver-side and the index lazily; tombstoned ids
    * ([[delete]]) are masked here, so EVERY consumer honors deletions. */
  def load(spark: SparkSession, dir: String): Loaded = {
    val meta = StoreGuard.metaRow(spark, dir,
      "dim", "m", "ks", "nlist", "replicas")
    val model = StoreGuard.table(spark, dir, "model.parquet", "kind", "vals")
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1).toArray).toMap
    Seq("centroids", "codebook").foreach(k => require(model.contains(k),
      s"AnnIndex.load: $dir/model.parquet has no '$k' row"))
    val rotation =
      if (!new java.io.File(
          dir.stripPrefix("file:") + "/rotation.parquet").exists()) None
      else {
        val r = spark.read.parquet(s"$dir/rotation.parquet").head()
        val d = r.getAs[Int]("dim")
        Some(r.getSeq[Double](r.fieldIndex("vals"))
          .grouped(d).map(_.toSeq).toSeq)
      }
    val raw = StoreGuard.table(spark, dir, "index.parquet",
      "vec_id", "list_id", "codes")
    val visible = tombstones(spark, dir) match {
      case Some(t) => raw.join(broadcast(t), Seq("vec_id"), "left_anti")
      case None => raw
    }
    Loaded(meta.getAs[Int]("dim"), meta.getAs[Int]("m"),
      meta.getAs[Int]("ks"), meta.getAs[Int]("nlist"),
      meta.getAs[Int]("replicas"),
      model("centroids"), model("codebook"), rotation, visible)
  }

  /** Query a loaded index: probe → partition-pruned ADC scan → exact
    * re-rank against `corpus` (the original vectors never live in the
    * index; re-rank joins them back by id). Output shape and values
    * match [[Similarity.ivfpqTopK]] run with the same parameters. */
  def topK(ix: Loaded, queries: DataFrame, corpus: DataFrame, k: Int,
      nprobe: Int = 8, rerank: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fns = graft.functions.GraftFunctions
    // probes run in the index's (possibly rotated) space; the exact
    // re-rank below stays on ORIGINAL vectors — cosine is rotation-
    // invariant, and the corpus join carries the originals anyway.
    // OPQ mode scores with the NORM-CORRECTED ADC (pq_adc_cos): rotated
    // anisotropic spaces expose the raw dot's codeword norm-shrinkage
    // bias (measured: an exact copy's own code ranked below random
    // competitors); the plain path keeps the raw-dot ADC for bit parity
    // with the live ivfpqTopK pipeline and its golden gates.
    val lutFn: Column => Column =
      if (ix.rotation.isDefined)
        e => fns.pq_lut_cos(e, ix.codebook, ix.dim, ix.m)
      else e => fns.pq_lut(e, ix.codebook, ix.dim, ix.m)
    val adcFn: (Column, Column) => Column =
      if (ix.rotation.isDefined) (c, l) => fns.pq_adc_cos(c, l, ix.ks)
      else (c, l) => fns.pq_adc(c, l, ix.ks)
    val probes = rotated(queries.select(col("vec_id"), col("embedding")),
        ix.rotation)
      .select(col("vec_id").as("query_id"),
        explode(fns.nearest_centroids(col("embedding"), ix.centroids, ix.dim,
          math.min(nprobe, ix.nlist))).as("list_id"),
        lutFn(col("embedding")).as("lut"))
    val approx = ix.index.join(broadcast(probes), "list_id")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        adcFn(col("codes"), col("lut")).as("adc"))
      .distinct()
    val cands = graft.plans.TopKPerKey.topKPerKey(approx,
        Seq("query_id"), Seq(("adc", true), ("neighbor_id", false)),
        rerank * k)
      .select(col("query_id"), col("neighbor_id"))
    val scored = cands
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qe"))), "query_id")
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
