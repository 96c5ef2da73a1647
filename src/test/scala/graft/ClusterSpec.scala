package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clusters, Dedup}

/** Connected-component semantics for the dedup-cluster operator: the
  * large-star/small-star fixpoint must partition exactly like a reference
  * union-find on every planted graph shape (long chains stress the O(log)
  * contraction; cliques stress duplicate-edge handling).
  */
class ClusterSpec extends SparkSuite {
  import spark.implicits._

  /** Reference union-find over the same edges, run driver-side. */
  private def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(x => x -> find(x)).toMap
  }

  /** `driverMax = 0` forces the distributed large-star/small-star
    * fixpoint; the default takes the small-graph driver union-find
    * hatch — both paths must agree with the reference on every shape. */
  private def sparkComponents(n: Long, edges: Seq[(Long, Long)],
      driverMax: Long = 100000L): Map[Long, Long] = {
    val e = edges.toDF("u", "v")
    val nodes = spark.range(n).select(col("id").as("node"))
    Clusters.labelAll(nodes, e, driverMax = driverMax)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, cliques, star, and singletons match reference union-find (both paths)") {
    // one 60-node chain (worst case for naive propagation), two 10-node
    // cliques bridged by one edge, an 8-leaf star, isolated nodes
    val chain = (100L until 159L).map(i => (i, i + 1))
    val cliqueA = for (i <- 200L until 210L; j <- (i + 1) until 210L) yield (i, j)
    val cliqueB = for (i <- 300L until 310L; j <- (i + 1) until 310L) yield (i, j)
    val bridge = Seq((209L, 300L))
    val star = (1L to 8L).map(i => (400L, 400L + i))
    val edges = chain ++ cliqueA ++ cliqueB ++ bridge ++ star
    val want = unionFind(500L, edges)
    val got = sparkComponents(500L, edges) // driver union-find hatch
    assert(got === want)
    val gotDist = sparkComponents(500L, edges, driverMax = 0L) // fixpoint
    assert(gotDist === want)
    // sanity on the shapes themselves
    assert(got(159L) == 100L, "chain collapses to its minimum")
    assert(got(309L) == 200L, "bridged cliques form one component")
    assert(got(408L) == 400L)
    assert(got(42L) == 42L, "isolated nodes are singleton components")
  }

  test("deterministic pseudo-random graph matches reference union-find (both paths)") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val want = unionFind(250L, edges)
    assert(sparkComponents(250L, edges) === want)
    assert(sparkComponents(250L, edges, driverMax = 0L) === want)
  }

  test("empty edge set labels every node as its own component") {
    val got = sparkComponents(10L, Seq.empty)
    assert(got === (0L until 10L).map(x => x -> x).toMap)
    assert(sparkComponents(10L, Seq.empty, driverMax = 0L) ===
      (0L until 10L).map(x => x -> x).toMap)
  }

  test("full pipeline: minhash pairs -> clusters groups the planted near-dups") {
    val docs = Tables.documents(spark, sf0001)
    val pairs = Dedup.minhashNearDups(docs, tau = 0.5)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    val labeled = Clusters.labelAll(
      docs.select(col("doc_id").as("node")), pairs)
    val plan = Clusters.dedupPlan(labeled, docs)
    val clusters = plan.filter(col("cluster_size") > 1)
    // every multi-doc cluster keeps exactly one canonical document
    val perCluster = clusters.groupBy(col("component"))
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("n_keep"),
        count(lit(1)).as("n"))
      .collect()
    assert(perCluster.nonEmpty, "corpus should contain planted near-dup clusters")
    perCluster.foreach { r =>
      assert(r.getLong(1) == 1L, s"cluster keeps exactly one doc: $r")
      assert(r.getLong(2) >= 2L)
    }
    // pair-connectivity is respected: both endpoints of every pair share
    // a component
    val lbl = labeled.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.collect().foreach { r =>
      assert(lbl(r.getLong(0)) == lbl(r.getLong(1)))
    }
    // apply: exactly the survivors remain — one per dup cluster,
    // singletons untouched
    val keptIds = Clusters.applyDedup(docs, plan)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val planRows = plan.collect()
    assert(keptIds.size == planRows.count(_.getBoolean(4)))
    planRows.foreach { r =>
      assert(keptIds.contains(r.getLong(0)) == r.getBoolean(4),
        s"doc ${r.getLong(0)} kept iff flagged keep")
    }
  }
}
