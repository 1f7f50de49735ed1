package graft

import org.apache.spark.sql.functions._
import graft.functions.FrequentItems
import graft.sources.Tables

/** Misra–Gries guarantees checked against exact counts on real fixture
  * tokens, across different partitionings (mergeability).
  */
class FrequentItemsSpec extends SparkTestBase {

  private val k = 32

  private def run(parts: Int): (Map[String, Long], Map[String, Long], Long) = {
    import spark.implicits._
    val toks = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .repartition(parts)
      .as[String]
    val mg = new FrequentItems.MisraGries(k)
    val sketch = toks.select(mg.toColumn).collect()(0)
    val exact = toks.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (sketch, exact, exact.values.sum)
  }

  test("every item above the n/(k+1) threshold survives; counts underestimate") {
    val (sketch, exact, n) = run(parts = 4)
    assert(sketch.size <= k)
    val threshold = n / (k + 1)
    exact.filter(_._2 > threshold).keys.foreach { hot =>
      assert(sketch.contains(hot), s"heavy hitter $hot missing")
    }
    sketch.foreach { case (i, c) =>
      assert(c <= exact(i), s"$i overestimated: $c > ${exact(i)}")
    }
  }

  test("sketch is mergeable: heavy hitters survive any partitioning") {
    val (s4, exact, n) = run(parts = 4)
    val (s13, _, _) = run(parts = 13)
    val threshold = n / (k + 1)
    val hot = exact.filter(_._2 > threshold).keySet
    assert(hot.subsetOf(s4.keySet) && hot.subsetOf(s13.keySet))
  }
}
