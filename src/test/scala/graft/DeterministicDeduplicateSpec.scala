package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** The injected analysis rule must turn dropDuplicates' arbitrary
  * survivor into the minimal non-key tuple, under any partitioning —
  * exercised through a sibling session with GraftExtensions installed
  * (the production deployment shape).
  */
class DeterministicDeduplicateSpec extends SparkTestBase {

  private lazy val ext =
    Bridge.sessionWithExtensions(spark, new graft.plans.GraftExtensions)

  test("dropDuplicates keeps the lexicographically minimal row per key") {
    import ext.implicits._
    val df = Seq(
      ("a", 3L, "z"), ("a", 1L, "y"), ("a", 1L, "x"),
      ("b", 9L, "q"), ("b", 2L, "r")
    ).toDF("k", "v1", "v2")
    for (parts <- Seq(1, 3, 7)) {
      val got = df.repartition(parts).dropDuplicates("k")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .sortBy(_._1).toSeq
      assert(got == Seq(("a", 1L, "x"), ("b", 2L, "r")), s"parts=$parts")
    }
  }

  test("rewrite plans as one partial+final aggregate, schema preserved") {
    import ext.implicits._
    // parquet-backed input so the plan doesn't collapse to a local
    // relation at optimization time
    val orders = ext.read.parquet(s"$sf/orders.parquet")
    val df = orders.select("o_custkey", "o_orderkey", "o_totalprice")
      .dropDuplicates("o_custkey")
    assert(df.columns.sameElements(
      Array("o_custkey", "o_orderkey", "o_totalprice")))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("extended"))
    // struct-min is not hash-aggregable: plans as SortAggregate, still
    // partial+final around a single exchange on the dedup key
    assert(plan.contains("Aggregate") && plan.contains("min(named_struct"))
    assert(plan.contains("partial_min"))
    // survivor is the min (o_orderkey, o_totalprice) tuple per custkey
    val expected = orders.groupBy("o_custkey")
      .agg(min(struct(col("o_orderkey"), col("o_totalprice"))).as("m"))
      .select(col("o_custkey"), col("m.o_orderkey"), col("m.o_totalprice"))
      .collect().map(_.toString).sorted
    assert(df.collect().map(_.toString).sorted.sameElements(expected))
    val v = Seq(("a", 1L), ("a", 2L)).toDF("k", "v").dropDuplicates("k")
    assert(v.schema("v").dataType.typeName == "long")
    assert(v.filter(col("v") === 1L).count() == 1)
  }

  test("multi-key dedup and key-only relations still work") {
    import ext.implicits._
    val multi = Seq(("a", 1L, 5.0), ("a", 1L, 3.0), ("a", 2L, 9.0))
      .toDF("k1", "k2", "v").dropDuplicates("k1", "k2")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(multi == Set(("a", 1L, 3.0), ("a", 2L, 9.0)))
    // no non-key columns: rule must not fire; plain distinct semantics
    val only = Seq("x", "x", "y").toDF("k").dropDuplicates("k")
    assert(only.collect().map(_.getString(0)).sorted.sameElements(Array("x", "y")))
  }

  test("vanilla session is untouched (rule only lives in the ext session)") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L)).toDF("k", "v").dropDuplicates("k")
    assert(df.count() == 1) // arbitrary survivor, but still one row
  }
}
