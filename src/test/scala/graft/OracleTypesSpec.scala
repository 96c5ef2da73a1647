package graft

import org.apache.spark.sql.types._

/** Driver-safety lint for oracle-gated outputs (r11 VERDICT item 1).
  *
  * The driver's DuckDB hash compare canonicalizes values on both sides
  * before hashing, and non-scalar / exotic column types stringify
  * differently between its pyarrow and DuckDB paths: `array<int>`
  * crashed the compare in r10 (m08/m11), `decimal(38,0)` silently
  * hash-mismatched in r11 (s09) while being value-identical. Both were
  * instances of one missing lint — this spec.
  *
  * Every oracle-gated query's output schema must therefore use only
  * driver-safe scalar types: boolean, int (and narrower), long, double,
  * float, string, date, timestamp. Exact wide integers (DECIMAL sums)
  * register as STRING — zero information loss for integers, and the
  * compare is string-equal on both sides. Rows-only queries are exempt:
  * the driver only counts their rows.
  */
class OracleTypesSpec extends SparkSuite {

  private val driverSafe: Set[DataType] = Set(
    BooleanType, ByteType, ShortType, IntegerType, LongType,
    FloatType, DoubleType, StringType, DateType, TimestampType,
    // empirically green: q09 has emitted timestamp_ntz (l_shipdate)
    // through the driver's hash compare since r10
    TimestampNTZType)

  test("every oracle-gated query emits only driver-safe scalar columns") {
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf0001)
      val bad = df.schema.fields.filterNot(f => driverSafe.contains(f.dataType))
      spark.catalog.clearCache()
      if (bad.isEmpty) Nil
      else Seq(s"$name: ${bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    }
    assert(offenders.isEmpty,
      "oracle-gated queries with driver-hostile column types (cast to a " +
        s"scalar — exact wide ints to STRING):\n  ${offenders.mkString("\n  ")}")
  }
}
