package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** MemCatalog's FunctionCatalog surface: catalog-resolved SQL functions —
  * the magic-method scalar (codegen, no boxing) and the v2 aggregate
  * function with a mergeable state (partition-order independent).
  */
class FunctionCatalogSpec extends SparkTestBase {
  import spark.implicits._

  private def init(): Unit =
    spark.conf.set("spark.sql.catalog.graftmem", "graft.sources.MemCatalog")

  test("catalog scalar function matches its arithmetic twin") {
    init()
    Seq(0L, 1L, 7L, 12345L, 999999L).toDF("k")
      .createOrReplaceTempView("fc_keys")
    val rows = spark.sql(
      """SELECT k, graftmem.hash_bucket(k, 8) AS b,
         ((k * 2654435761) % 8 + 8) % 8 AS expect FROM fc_keys""")
      .collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), r))
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8))
    // interpreted fallback agrees with the magic method
    import graft.sources.CatalogFunctions.HashBucket
    val f = HashBucket.Bound
    assert(f.produceResult(
      org.apache.spark.sql.catalyst.InternalRow(12345L, 8)) == f.invoke(12345L, 8))
  }

  test("catalog aggregate function is exact and partitioning-independent") {
    init()
    val vals = (1 to 1000).map(i => (i % 7, i * 0.1 + 0.05))
    vals.toDF("g", "v").repartition(1).createOrReplaceTempView("fc_one")
    vals.toDF("g", "v").repartition(13).createOrReplaceTempView("fc_many")
    val one = spark.sql(
      "SELECT g, graftmem.dsum(v) AS s FROM fc_one GROUP BY g ORDER BY g")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    val many = spark.sql(
      "SELECT g, graftmem.dsum(v) AS s FROM fc_many GROUP BY g ORDER BY g")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(one == many, s"dsum not partition-independent:\n$one\n$many")
    // bit-identical to the Det.dsum expression form
    val det = vals.toDF("g", "v").groupBy("g")
      .agg(graft.util.Det.dsum(col("v")).as("s")).orderBy("g")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(one == det, s"catalog dsum != Det.dsum:\n$one\n$det")
  }

  test("unknown function fails analysis cleanly") {
    init()
    val e = intercept[AnalysisException] {
      spark.sql("SELECT graftmem.no_such_fn(1)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("no_such_fn"), e.getMessage)
  }
}
