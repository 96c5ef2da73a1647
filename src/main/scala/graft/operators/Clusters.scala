package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** Duplicate-cluster resolution: the step between pair-finding (Dedup's
  * LSH/SimHash/winnow operators emit PAIRS) and an actionable dedup plan
  * (per-document cluster id, cluster size, canonical survivor, keep/drop).
  * Near-dup relations are not transitive, but dedup pipelines treat them
  * as if they were — connected components over the pair graph is the
  * standard formulation (the reference's idempotent re-ingest keeps one
  * survivor per identity the same way; SURVEY §2.4).
  *
  * The component algorithm is the alternating large-star / small-star
  * contraction of Kiveris et al., "Connected Components in MapReduce and
  * Beyond" (SoCC'14): each round is two groupBy-join passes over the edge
  * list and the round count is O(log n) in practice — the formulation
  * that survives 100 TB, where a pair graph can hold billions of edges
  * but per-round state is only ever (node, neighbor) rows. No
  * collect_list: star centers are found with groupBy-min and joined back,
  * so a celebrity node with 10^8 neighbors never materializes a single
  * giant row.
  */
object Clusters {

  /** Connected components of the undirected graph given by `edges`
    * (columns `u`, `v`, any integral type). Returns (node, component)
    * for every node that appears in an edge; `component` is the smallest
    * node id reachable from `node` (a stable, deterministic label).
    *
    * Each iteration is `localCheckpoint`ed (eager): the logical plan of
    * round i+1 would otherwise embed round i's whole plan and the tree
    * grows exponentially with rounds — a 12-round run OOMs just
    * STRINGIFYING its plan. Checkpointing materializes the round and
    * resets lineage to a leaf; the convergence check (count +
    * order-independent hash fold) reads two scalars per round, all data
    * movement stays distributed. (localCheckpoint stores partitions on
    * executors — iterative temp state, recomputable from the source
    * edges by rerunning, which is the standard trade for CC iteration.)
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25,
      driverMax: Long = 100000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // canonical direction u > v; self-loops and duplicates dropped
    val e0 = edges
      .select(greatest(col("u"), col("v")).cast("long").as("u"),
        least(col("u"), col("v")).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    // Small-graph hatch: at or under `driverMax` edges (id pairs — ≤ a
    // few MB collected), a driver-side union-find answers in ONE job
    // where the distributed fixpoint pays checkpoint + signature jobs
    // per round — pure fixed cost when the pair graph is batch-sized
    // (d11's per-snapshot probe, d06 at test scale). Labels are
    // identical by construction: union-by-min keeps the root the
    // smallest reachable id, exactly the fixpoint's component label.
    // The same threshold trade AQE makes for broadcast joins; pass
    // driverMax = 0 to force the distributed path.
    //
    // r19: probe the hatch with ONE bounded collect (limit driverMax+1)
    // instead of checkpoint + signature + collect — the hatch is the
    // path every batch-sized caller takes (curate near-dedup,
    // dedupAgainst within-batch pairs), and the old sequence charged
    // three driver round-trips per call for the same answer. The limit
    // is a full result iff the graph fits, so the collected edge SET —
    // and therefore the union-find labels — are unchanged; an
    // over-limit graph falls through to the checkpointed fixpoint,
    // paying one bounded extra job on the rare large path.
    val probeLimit = math.min(driverMax + 1, Int.MaxValue.toLong).toInt
    val probed =
      if (driverMax <= 0) Array.empty[org.apache.spark.sql.Row]
      else e0.limit(probeLimit).collect()
    if (driverMax > 0 && probed.length <= driverMax) {
      val es = probed.map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (u, v) =>
        val ru = find(u); val rv = find(v)
        if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
      }
      return es.iterator.flatMap(t => Iterator(t._1, t._2)).toSeq.distinct
        .map(n => (n, find(n))).toDF("node", "component")
    }
    var e = e0.localCheckpoint(true)
    var signature = edgeSignature(e)
    var iter = 0
    var converged = signature._1 == 0L
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nextSig = edgeSignature(next)
      e = next
      converged = nextSig == signature
      signature = nextSig
      iter += 1
    }
    // fixpoint edges are stars (node → component root); roots label
    // themselves
    val labels = e.select(col("u").as("node"), col("v").as("component"))
      .union(e.select(col("v").as("node"), col("v").as("component")))
      .groupBy(col("node")).agg(min(col("component")).as("component"))
    labels
  }

  /** Label every node in `nodes` (single column `node`): nodes in no edge
    * become their own singleton component. */
  def labelAll(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25,
      driverMax: Long = 100000L): DataFrame = {
    val labels = connectedComponents(edges, maxIter, driverMax)
    nodes.select(col("node").cast("long").as("node"))
      .join(labels, Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }

  /** (count, order-independent hash sum) of a canonicalized edge frame —
    * equality of consecutive signatures is the fixpoint test. One scalar
    * aggregation per iteration; also the action that materializes the
    * persisted frame. */
  private def edgeSignature(e: DataFrame): (Long, Long) = {
    val row = e.agg(count(lit(1)).as("n"),
      // ANSI mode forbids wrap-around sum; XOR-fold via bit ops instead
      coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h")).head()
    (row.getLong(0), row.getLong(1))
  }

  /** Large-star: every node connects its strictly LARGER neighbors to the
    * minimum of its closed neighborhood. Halves long chains each round. */
  private[operators] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    // m(u) = min(N(u) ∪ {u}) — groupBy-min, no neighborhood collection
    val mins = sym.groupBy(col("u"))
      .agg(min(least(col("v"), col("u"))).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: every node connects its smaller-or-equal neighbors (and
    * itself) to the minimum of that set. */
  private[operators] def smallStar(e: DataFrame): DataFrame = {
    val directed = e
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val mins = directed.groupBy(col("u")).agg(min(col("v")).as("m"))
    directed.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Dedup plan for a labeled corpus: cluster size, canonical survivor
    * (longest text, ties to the smallest doc_id — "keep the richest
    * copy"), and the keep/drop flag a downstream filter applies. */
  def dedupPlan(labeled: DataFrame, docs: DataFrame): DataFrame = {
    val withLen = labeled
      .select(col("node").as("doc_id"), col("component"))
      .join(docs.select(col("doc_id"), length(col("text")).as("len")), "doc_id")
    val byComponent = Window.partitionBy(col("component"))
    val canonicalOrder = byComponent.orderBy(col("len").desc, col("doc_id").asc)
    withLen
      .withColumn("cluster_size", count(lit(1)).over(byComponent))
      .withColumn("canonical_id", first(col("doc_id")).over(canonicalOrder))
      .withColumn("keep", col("doc_id") === col("canonical_id"))
      .select(col("doc_id"), col("component"), col("cluster_size"),
        col("canonical_id"), col("keep"))
  }

  /** Apply a dedup plan: the corpus minus the non-survivors — the step
    * that actually materializes the deduplicated training corpus.
    * The drop set is duplicates-only (keep=false rows, i.e. dup-cluster
    * members minus one survivor each), which for real corpora is a few
    * percent of rows — `broadcastDrop=true` probes it without shuffling
    * the corpus side (the A10/Transfer shape). For a pathological corpus
    * where duplicates ARE the bulk, set it false and pay one hash
    * shuffle on doc_id instead of an oversized broadcast. */
  def applyDedup(docs: DataFrame, plan: DataFrame,
      broadcastDrop: Boolean = true): DataFrame = {
    val drop = plan.filter(!col("keep")).select(col("doc_id"))
    docs.join(if (broadcastDrop) broadcast(drop) else drop,
      Seq("doc_id"), "left_anti")
  }

  type Q = (SparkSession, String) => DataFrame

  /** The d06/d09 oracle fixture: dedup plan over the exact-Jaccard pair
    * graph of the bounded sample (doc_id < 100 — small enough for the
    * DuckDB recursive-CTE transitive closure to mirror it exactly). */
  private def samplePlan(s: SparkSession, d: String): DataFrame = {
    val sample = Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text"), Dedup.shingles(col("text")).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edges = sample.alias("a").join(sample.alias("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("u"), col("b.doc_id").as("v"),
        size(array_intersect(col("a.sh"), col("b.sh")))
          .cast("double").as("inter"),
        size(col("a.sh")).as("na"), size(col("b.sh")).as("nb"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.02)
      .select(col("u"), col("v"))
    val labeled = labelAll(sample.select(col("doc_id").as("node")), edges)
    dedupPlan(labeled, sample)
  }

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // Connected components + canonical selection over the exact-Jaccard
    // pair graph of the d02 sample (bounded edge set → the component
    // algorithm itself is oracle-gated via DuckDB's recursive-CTE
    // transitive closure; the full-corpus LSH→cluster path reuses the
    // identical operator and is spec-gated in ClusterSpec).
    ("d06_dup_clusters", (s: SparkSession, d: String) =>
      samplePlan(s, d).orderBy(col("doc_id")),
    Some("""WITH RECURSIVE sample AS (
        SELECT doc_id, text,
          CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3
               THEN list_distinct(list_transform(
                 range(0, len(string_split_regex(trim(text), '\s+')) - 2),
                 i -> concat_ws(' ',
                   string_split_regex(trim(text), '\s+')[i+1],
                   string_split_regex(trim(text), '\s+')[i+2],
                   string_split_regex(trim(text), '\s+')[i+3])))
               ELSE [text] END AS sh
        FROM documents WHERE doc_id < 100),
      pairs AS (
        SELECT a.doc_id AS u, b.doc_id AS v
        FROM sample a JOIN sample b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.02),
      edges AS (SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs),
      reach(u, v) AS (
        SELECT doc_id AS u, doc_id AS v FROM sample
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u),
      ranked AS (
        SELECT c.doc_id, c.component,
          count(*) OVER (PARTITION BY c.component) AS cluster_size,
          first_value(c.doc_id) OVER (PARTITION BY c.component
            ORDER BY length(s.text) DESC, c.doc_id ASC) AS canonical_id
        FROM comp c JOIN sample s ON c.doc_id = s.doc_id)
      SELECT doc_id, component, cluster_size, canonical_id,
             doc_id = canonical_id AS keep
      FROM ranked ORDER BY doc_id""")),

    // The APPLY step over the same plan: the surviving corpus itself —
    // detect (pairs) → resolve (components) → apply (anti-join) is the
    // complete dedup loop a pipeline actually ships. The drop set
    // broadcasts; the corpus side never shuffles for the join.
    ("d09_dedup_apply", (s: SparkSession, d: String) =>
      applyDedup(Tables.documents(s, d).filter(col("doc_id") < 100),
          samplePlan(s, d))
        .select(col("doc_id"), col("source"), col("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy(col("doc_id")),
    Some("""WITH RECURSIVE sample AS (
        SELECT doc_id, text,
          CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3
               THEN list_distinct(list_transform(
                 range(0, len(string_split_regex(trim(text), '\s+')) - 2),
                 i -> concat_ws(' ',
                   string_split_regex(trim(text), '\s+')[i+1],
                   string_split_regex(trim(text), '\s+')[i+2],
                   string_split_regex(trim(text), '\s+')[i+3])))
               ELSE [text] END AS sh
        FROM documents WHERE doc_id < 100),
      pairs AS (
        SELECT a.doc_id AS u, b.doc_id AS v
        FROM sample a JOIN sample b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.02),
      edges AS (SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs),
      reach(u, v) AS (
        SELECT doc_id AS u, doc_id AS v FROM sample
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u),
      ranked AS (
        SELECT c.doc_id,
          first_value(c.doc_id) OVER (PARTITION BY c.component
            ORDER BY length(s.text) DESC, c.doc_id ASC) AS canonical_id
        FROM comp c JOIN sample s ON c.doc_id = s.doc_id)
      SELECT d.doc_id, d.source, d.n_chars, md5(d.text) AS text_md5
      FROM documents d JOIN ranked r ON d.doc_id = r.doc_id
      WHERE r.doc_id = r.canonical_id ORDER BY d.doc_id"""))
  )
}
