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
