package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale

/** Scale utilities: bucketed joins must not shuffle at query time;
  * salted joins must match the plain join's results on skewed data.
  */
class ScaleSpec extends SparkSuite {

  test("bucketed tables join without a query-time shuffle") {
    // two fact tables bucketed on the join key (warehouse dir is set in
    // SparkSuite — a static conf); clean any leftover locations first
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft-test-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Scale.writeBucketed(Tables.orders(spark, sf0001), "orders_b", "o_orderkey", 8)
    Scale.writeBucketed(
      Tables.lineitem(spark, sf0001).withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 8)

    // at this data size Spark would broadcast instead — force the
    // shuffle-join path to make the bucket co-location observable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"), "o_orderkey")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // join itself must carry no Exchange under it (bucket co-location);
    // the groupBy's exchange is expected
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a sort-merge join in:\n$plan")
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning(o_orderkey"),
      s"join should read co-located buckets, no key exchange:\n$plan")

    // and results match the unbucketed join
    val plain = Tables.orders(spark, sf0001)
      .join(Tables.lineitem(spark, sf0001)
        .withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(joined.collect().toSet == plain.collect().toSet)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE orders_b"); spark.sql("DROP TABLE lineitem_b")
  }

  test("capBuckets drops only the degenerate bucket; planted pairs survive") {
    import spark.implicits._
    // 5000 rows share one hot (band,key) bucket — the boilerplate-doc
    // shape; the healthy buckets hold a handful of rows each
    val hot = spark.range(5000).select(
      col("id").as("doc_id"), lit(0).as("band"), lit(42L).as("key"))
    val healthy = spark.range(5000, 5020).select(
      col("id").as("doc_id"), lit(1).as("band"), (col("id") % 5).as("key"))
    val capped = Scale.capBuckets(hot.unionByName(healthy), Seq("band", "key"), 100)
      .collect()
    assert(capped.forall(_.getInt(1) == 1), "hot bucket rows must be dropped")
    assert(capped.length == 20, "every healthy-bucket row must survive")
  }

  test("minhash-LSH recall survives with the default bucket cap active") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf0001)
    // with the cap at its default vs effectively disabled, the same
    // pairs come back on this (unskewed) corpus — the cap costs no recall
    val capped = Dedup.minhashNearDups(docs, tau = 0.5)
      .select("doc_a", "doc_b").collect().toSet
    val uncapped = Dedup.minhashNearDups(docs, tau = 0.5, maxBucket = Int.MaxValue)
      .select("doc_a", "doc_b").collect().toSet
    assert(capped == uncapped, "default cap must not drop planted pairs")
    assert(capped.nonEmpty)
  }

  test("salted join matches plain join results under skew") {
    import spark.implicits._
    // skewed big side: 90% of rows share key 1
    val big = spark.range(10000)
      .withColumn("key", when(col("id") % 10 =!= 0, 1L).otherwise(col("id")))
      .withColumn("payload", col("id") * 2)
    val small = Seq((1L, "hot"), (10L, "a"), (20L, "b"), (9990L, "z"))
      .toDF("key", "name")

    val plain = big.join(small, "key").select("id", "name")
    val salted = Scale.saltedJoin(big, small, "key", saltFactor = 8)
      .select("id", "name")
    assert(salted.count() == plain.count())
    assert(salted.collect().toSet == plain.collect().toSet)
  }
}
