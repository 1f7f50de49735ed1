package graft

/** Storage-partitioned join: two v2 tables PARTITIONED BY the same key
  * report KeyGroupedPartitioning from their scans, so with
  * `spark.sql.sources.v2.bucketing.enabled` the join runs with NO
  * shuffle on either side — the zero-shuffle fact⋈fact join for data
  * already laid out by key (the DSv2 analogue of BucketingSpec's
  * bucketed-table join).
  */
class StoragePartitionedJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("co-partitioned v2 tables join without any shuffle exchange") {
    spark.conf.set("spark.sql.catalog.graftmem", "graft.sources.MemCatalog")
    spark.sql("DROP TABLE IF EXISTS graftmem.spja")
    spark.sql("DROP TABLE IF EXISTS graftmem.spjb")
    spark.sql("CREATE TABLE graftmem.spja (k BIGINT, v BIGINT) PARTITIONED BY (k)")
    spark.sql("CREATE TABLE graftmem.spjb (k BIGINT, w BIGINT) PARTITIONED BY (k)")
    (1L to 12L).map(i => (i % 4, i)).toDF("k", "v")
      .createOrReplaceTempView("spja_seed")
    // deliberately a DIFFERENT key set (no k=3 side-b rows, extra k=9):
    // partially-overlapping partition values must still join correctly
    // (Spark fills missing partitions on the other side)
    (1L to 6L).map(i => (if (i == 5) 9L else i % 3, i * 10L)).toDF("k", "w")
      .createOrReplaceTempView("spjb_seed")
    spark.sql("INSERT INTO graftmem.spja SELECT * FROM spja_seed")
    spark.sql("INSERT INTO graftmem.spjb SELECT * FROM spjb_seed")

    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(
        """SELECT a.k, a.v, b.w FROM graftmem.spja a
           JOIN graftmem.spjb b ON a.k = b.k ORDER BY a.k, a.v, b.w""")
      val rows = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val as = (1L to 12L).map(i => (i % 4, i))
      val bs = (1L to 6L).map(i => (if (i == 5) 9L else i % 3, i * 10L))
      val expected = (for { (ka, v) <- as; (kb, w) <- bs; if ka == kb }
        yield (ka, v, w)).sorted
      assert(rows == expected, rows)

      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the ORDER BY's range exchange is expected; the JOIN must not
      // introduce a hash exchange on either side
      assert(!plan.contains("Exchange hashpartitioning"),
        s"storage-partitioned join still shuffles:\n$plan")
    }

    // without v2 bucketing, the same join must shuffle — proving the
    // no-shuffle plan above came from the reported partitioning
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(
        """SELECT a.k, a.v, b.w FROM graftmem.spja a
           JOIN graftmem.spjb b ON a.k = b.k""")
      df.collect()
      assert(df.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    }
    spark.sql("DROP TABLE IF EXISTS graftmem.spja")
    spark.sql("DROP TABLE IF EXISTS graftmem.spjb")
  }

  test("partitioned table still supports row-level DELETE and time travel") {
    spark.conf.set("spark.sql.catalog.graftmem", "graft.sources.MemCatalog")
    spark.sql("DROP TABLE IF EXISTS graftmem.spjc")
    spark.sql("CREATE TABLE graftmem.spjc (k BIGINT, v BIGINT) PARTITIONED BY (k)")
    (1L to 10L).map(i => (i % 5, i)).toDF("k", "v")
      .createOrReplaceTempView("spjc_seed")
    spark.sql("INSERT INTO graftmem.spjc SELECT * FROM spjc_seed")
    spark.sql("DELETE FROM graftmem.spjc WHERE k = 2")
    assert(spark.sql("SELECT COUNT(*) FROM graftmem.spjc").head().getLong(0) == 8L)
    assert(spark.sql("SELECT COUNT(*) FROM graftmem.spjc VERSION AS OF 1")
      .head().getLong(0) == 10L)
    spark.sql("DROP TABLE IF EXISTS graftmem.spjc")
  }
}
