package graft

import org.apache.spark.sql.types._

/** Every declared query must run on the fixtures and (for oracled ones)
  * only emit oracle-comparable types — SURVEY.md §2.3.
  */
class QueriesSpec extends SparkTestBase {

  private val allowed: Set[DataType] =
    Set(LongType, DoubleType, StringType, DateType)

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracled query has a queries twin") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0)
      if (SparkEntry.oracleSql.contains(name)) {
        assert(n > 0, s"$name: oracled query returned no rows")
        df.schema.fields.foreach { f =>
          assert(allowed.contains(f.dataType),
            s"$name.${f.name}: ${f.dataType} is not oracle-hash-safe")
        }
      }
    }
  }
}
