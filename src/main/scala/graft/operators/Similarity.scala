package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables

/** Similarity search over the embedding column (`array<float>`, dim 64):
  * exact brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane LSH bucketed variant as the scale path (candidates
  * from sign-pattern buckets instead of the full cross product).
  *
  * All vector math is codegen'd array expressions (`aggregate`/
  * `zip_with`) in double precision with row-local sequential summation —
  * deterministic and oracle-matchable.
  */
object Similarity {

  /** Sequential-sum dot product of two float arrays, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector (brute force): queries ×
    * corpus crossJoin with the small query side broadcast, then per-query
    * top-k via window. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus.alias("c").crossJoin(broadcast(queries.alias("q")))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine(col("q.embedding"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Deterministic pseudo-random unit-ish hyperplanes (splitmix over
    * (plane, dim)), materialized as literal arrays — broadcast to
    * executors inside the plan. */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    def mix(x: Long): Long = {
      var z = x * 0x9e3779b97f4a7c15L + 0x243f6a8885a308d3L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until nPlanes).map(p => (0 until dim).map { j =>
      // map to (-1, 1)
      mix(p.toLong * 131071L + j).toDouble / Long.MaxValue.toDouble
    })
  }

  /** Sign-pattern LSH bucket id of a vector under `planes`. */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(v, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Per-vector LSH keys for `tables` hash tables of `planesPerTable`
    * sign bits each (OR-amplification: a pair is a candidate if it
    * collides in ANY table — without it, a single m-bit bucket has
    * ~(1-θ/π)^m collision probability, near zero for the ~60-70°
    * neighbors in this corpus).
    */
  def lshTableKeys(v: Column, tables: Int, planesPerTable: Int,
      dim: Int): Column = {
    val planes = hyperplanes(tables * planesPerTable, dim)
    array((0 until tables).map { t =>
      val tablePlanes = planes.slice(t * planesPerTable, (t + 1) * planesPerTable)
      struct(lit(t).as("table"), lshBucket(v, tablePlanes).as("bucket"))
    }: _*)
  }

  /** Approximate top-k: candidates collide with the query in any of the
    * LSH tables, are scored exactly, then per-query top-k. The bucket
    * join replaces the cross product — the shuffle is corpus × tables
    * keys, not corpus², which is what survives 100 TB.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      tables: Int = 8, planesPerTable: Int = 4, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def keyed(df: DataFrame) = df
      .withColumn("tk", explode(lshTableKeys(col("embedding"), tables, planesPerTable, dim)))
      .select(col("vec_id"), col("embedding"), col("tk.table"), col("tk.bucket"))
    val qb = keyed(queries)
    val cb = keyed(corpus)
    val scored = cb.alias("c").join(broadcast(qb.alias("q")), Seq("table", "bucket"))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        col("q.embedding").as("qe"), col("c.embedding").as("ce"))
      .distinct() // a pair may collide in several tables
      .select(col("query_id"), col("neighbor_id"), cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // Exact cosine top-10 for a deterministic query set (vec_id < 5),
    // DuckDB-oracle-gated with identical double arithmetic.
    ("s01_cosine_topk", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      bruteForceTopK(emb.filter(col("vec_id") < 5), emb, 10)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_sum(list_transform(list_zip(q.embedding, c.embedding),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
        FROM embeddings c, q WHERE q.vec_id <> c.vec_id),
      ranked AS (
        SELECT query_id, neighbor_id, cos,
          row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    // LSH-bucketed ANN over the full corpus for 20 queries — the scale
    // path (rows-only; recall vs brute force asserted in SimilaritySpec).
    ("s02_ann_lsh", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      lshTopK(emb.filter(col("vec_id") < 20), emb, 10)
        .orderBy(col("query_id"), col("rank"))
    }, None),

    // Embedding-cosine near-dup pairs above a threshold, candidates from
    // any-table LSH collision (rows-only).
    ("s03_embedding_neardup", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("tk", explode(lshTableKeys(col("embedding"), 8, 4, 64)))
        .select(col("vec_id"), col("embedding"), col("tk.table"), col("tk.bucket"))
      emb.alias("a").join(emb.alias("b"),
          col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          col("a.embedding").as("ea"), col("b.embedding").as("eb"))
        .distinct()
        .select(col("vec_a"), col("vec_b"), cosine(col("ea"), col("eb")).as("cos"))
        .filter(col("cos") >= 0.3)
        .orderBy(col("vec_a"), col("vec_b"))
    }, None)
  )
}
