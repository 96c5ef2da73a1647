package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** As-of join semantics on a hand-built case: latest-right-≤-left per
  * key, inclusive ties, null when nothing precedes, left row count
  * preserved. */
class AsOfSpec extends SparkSuite {

  test("latest right <= left per key; ties inclusive; no-prior -> null") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l10"), (1L, 5L, "l5"), (1L, 1L, "l1"), (2L, 7L, "l7"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, "a"), (1L, 8L, "b"), (2L, 9L, "c"))
      .toDF("k", "t", "v")
    val got = AsOf.asofJoin(left, right, "k", "t", "t")
      .select(col("tag"), col("asof_t"), col("asof_v"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.getString(2))))
      .toMap
    assert(got.size == 4) // every left row survives
    assert(got("l10") == (Some(8L), Some("b"))) // latest of {5, 8}
    assert(got("l5") == (Some(5L), Some("a"))) // equal time matches (inclusive)
    assert(got("l1") == (None, None)) // nothing precedes
    assert(got("l7") == (None, None)) // right exists only after
  }

  test("staleness bound: matches older than maxStale become null") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l")).toDF("k", "t", "tag")
    val right = Seq((1L, 40L, "old")).toDF("k", "t", "v")
    def run(ms: Option[Long]) = AsOf.asofJoin(left, right, "k", "t", "t", ms)
      .select(col("asof_v")).head()
    assert(run(None).getString(0) == "old") // unbounded: matches
    assert(run(Some(70L)).getString(0) == "old") // within 70 units
    assert(run(Some(50L)).isNullAt(0)) // 60 units stale > 50 bound
  }

  test("randomized: matches the brute-force definition on 50 seeded cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    for (_ <- 1 to 50) {
      val nL = 1 + rnd.nextInt(12)
      val nR = rnd.nextInt(10)
      val left = (1 to nL).map(i =>
        (rnd.nextInt(3).toLong, rnd.nextInt(20).toLong, i.toLong))
      val right = (1 to nR).map(i =>
        (rnd.nextInt(3).toLong, rnd.nextInt(20).toLong, 100L + i))
        // contract: unique (key, time) on the right
        .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
      val got = AsOf.asofJoin(
          left.toDF("k", "t", "lid"), right.toDF("k", "t", "rid"), "k", "t", "t")
        .select(col("lid"), col("asof_rid"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      val expect = left.map { case (k, t, lid) =>
        val prior = right.filter(r => r._1 == k && r._2 <= t)
        lid -> (if (prior.isEmpty) None
                else Some(prior.maxBy(r => (r._2, r._3))._3))
      }.toMap
      assert(got == expect, s"left=$left right=$right")
    }
  }

  test("plan shape: one exchange, window, no join operator") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, "a")).toDF("k", "t", "v")
    val plan = AsOf.asofJoin(left, right, "k", "t", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"as-of should not plan a join:\n$plan")
    assert(plan.contains("Window"), plan)
  }
}
