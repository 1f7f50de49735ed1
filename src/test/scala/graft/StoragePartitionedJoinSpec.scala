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

  test("snapshotDiff over co-partitioned snapshots runs with zero shuffle") {
    // pins Diff.scala's scale claim: with both snapshots storage-
    // partitioned by the key, the full-outer diff join introduces no
    // hash exchange on either side (plus the negative control proving
    // the plan came from the reported partitioning, not luck)
    spark.conf.set("spark.sql.catalog.graftmem", "graft.sources.MemCatalog")
    spark.sql("DROP TABLE IF EXISTS graftmem.diffa")
    spark.sql("DROP TABLE IF EXISTS graftmem.diffb")
    spark.sql("CREATE TABLE graftmem.diffa (k BIGINT, v BIGINT) PARTITIONED BY (k)")
    spark.sql("CREATE TABLE graftmem.diffb (k BIGINT, v BIGINT) PARTITIONED BY (k)")
    (1L to 12L).map(i => (i, i * 10L)).toDF("k", "v")
      .createOrReplaceTempView("diffa_seed")
    // k=12 removed, k=13 added, k=5 changed, rest same
    (1L to 13L).filter(_ != 12L)
      .map(i => (i, if (i == 5L) 99L else i * 10L)).toDF("k", "v")
      .createOrReplaceTempView("diffb_seed")
    spark.sql("INSERT INTO graftmem.diffa SELECT * FROM diffa_seed")
    spark.sql("INSERT INTO graftmem.diffb SELECT * FROM diffb_seed")
    def diff() = graft.operators.Diff.snapshotDiff(
      spark.table("graftmem.diffa"), spark.table("graftmem.diffb"),
      keys = Seq("k"), compare = Seq("v"))
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = diff()
      val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got(12L) == "removed" && got(13L) == "added" &&
        got(5L) == "changed" && got(1L) == "same" && got.size == 13)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"storage-partitioned snapshot diff still shuffles:\n$plan")
    }
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = diff()
      df.collect()
      assert(df.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    }
    spark.sql("DROP TABLE IF EXISTS graftmem.diffa")
    spark.sql("DROP TABLE IF EXISTS graftmem.diffb")
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
