package graft

/** SQL MERGE INTO through sources.MemCatalog: the plan must be Spark's
  * native group-based row-level rewrite (MergeRows + ReplaceData), and
  * the applied result must match CDC semantics (updates win, deletes
  * remove, unmatched non-deletes insert) — the same contract as the
  * DataFrame composition pipeline.Upsert.applyCdc.
  */
class MergeIntoSpec extends SparkTestBase {
  import spark.implicits._

  test("MERGE INTO plans to MergeRows+ReplaceData and applies CDC semantics") {
    spark.conf.set("spark.sql.catalog.graftmem", "graft.sources.MemCatalog")
    spark.sql("DROP TABLE IF EXISTS graftmem.t")
    spark.sql("CREATE TABLE graftmem.t (id BIGINT, v DOUBLE)")
    Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "v")
      .createOrReplaceTempView("merge_seed")
    spark.sql("INSERT INTO graftmem.t SELECT * FROM merge_seed")

    Seq((2L, "U", 20.0), (3L, "D", 0.0), (4L, "I", 4.0))
      .toDF("id", "op", "v").createOrReplaceTempView("merge_chg")
    val merge = """MERGE INTO graftmem.t t USING merge_chg c ON t.id = c.id
      WHEN MATCHED AND c.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = c.v
      WHEN NOT MATCHED AND c.op != 'D' THEN INSERT (id, v) VALUES (c.id, c.v)"""

    // EXPLAIN does not execute: assert the native rewrite is in the plan
    val plan = spark.sql("EXPLAIN EXTENDED " + merge)
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan.contains("MergeRows"), plan)
    assert(plan.contains("ReplaceData"), plan)

    spark.sql(merge)
    val out = spark.sql("SELECT id, v FROM graftmem.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((1L, 1.0), (2L, 20.0), (4L, 4.0)), out)
  }

  test("VERSION AS OF pins each commit's snapshot; live table moves on") {
    spark.conf.set("spark.sql.catalog.graftmem", "graft.sources.MemCatalog")
    spark.sql("DROP TABLE IF EXISTS graftmem.tv")
    spark.sql("CREATE TABLE graftmem.tv (id BIGINT, v DOUBLE)")
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
      .createOrReplaceTempView("tv_seed")
    spark.sql("INSERT INTO graftmem.tv SELECT * FROM tv_seed") // v1
    spark.sql("DELETE FROM graftmem.tv WHERE id = 1")          // v2
    assert(spark.sql("SELECT COUNT(*) FROM graftmem.tv VERSION AS OF 0")
      .head().getLong(0) == 0L)
    assert(spark.sql("SELECT COUNT(*) FROM graftmem.tv VERSION AS OF 1")
      .head().getLong(0) == 2L)
    assert(spark.sql("SELECT COUNT(*) FROM graftmem.tv")
      .head().getLong(0) == 1L)
  }

  test("delta catalog: MERGE plans to WriteDelta and only touches delta rows") {
    spark.conf.set("spark.sql.catalog.graftdel", "graft.sources.MemDeltaCatalog")
    spark.sql("DROP TABLE IF EXISTS graftdel.t")
    spark.sql("CREATE TABLE graftdel.t (id BIGINT NOT NULL, v DOUBLE)")
    Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (7L, 7.0)).toDF("id", "v")
      .createOrReplaceTempView("del_seed")
    spark.sql("INSERT INTO graftdel.t SELECT * FROM del_seed")

    Seq((2L, "U", 20.0), (3L, "D", 0.0), (4L, "I", 4.0))
      .toDF("id", "op", "v").createOrReplaceTempView("del_chg")
    val merge = """MERGE INTO graftdel.t t USING del_chg c ON t.id = c.id
      WHEN MATCHED AND c.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = c.v
      WHEN NOT MATCHED AND c.op != 'D' THEN INSERT (id, v) VALUES (c.id, c.v)
      WHEN NOT MATCHED BY SOURCE AND t.id = 7 THEN DELETE"""

    // the SupportsDelta operation must route MERGE to the delta write
    // plan (WriteDelta), not the group-based ReplaceData rewrite
    val plan = spark.sql("EXPLAIN EXTENDED " + merge)
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan.contains("WriteDelta"), plan)
    assert(!plan.contains("ReplaceData"), plan)

    spark.sql(merge)
    val out = spark.sql("SELECT id, v FROM graftdel.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((1L, 1.0), (2L, 20.0), (4L, 4.0)), out)

    // untouched rows keep identity across the delta commit: row 1 was
    // never shipped to the writer, yet survives with its value intact,
    // and the commit produced exactly one new snapshot
    spark.sql("UPDATE graftdel.t SET v = v + 0.5 WHERE id = 4")
    val out2 = spark.sql("SELECT id, v FROM graftdel.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out2 == Seq((1L, 1.0), (2L, 20.0), (4L, 4.5)), out2)
  }

  test("INSERT append accumulates; row-level write replaces, not appends") {
    spark.conf.set("spark.sql.catalog.graftmem", "graft.sources.MemCatalog")
    spark.sql("DROP TABLE IF EXISTS graftmem.t2")
    spark.sql("CREATE TABLE graftmem.t2 (id BIGINT, v DOUBLE)")
    Seq((1L, 1.0)).toDF("id", "v").createOrReplaceTempView("ins_a")
    Seq((2L, 2.0)).toDF("id", "v").createOrReplaceTempView("ins_b")
    spark.sql("INSERT INTO graftmem.t2 SELECT * FROM ins_a")
    spark.sql("INSERT INTO graftmem.t2 SELECT * FROM ins_b")
    assert(spark.sql("SELECT COUNT(*) FROM graftmem.t2").head().getLong(0) == 2L)
    // if the row-level write regressed from replace to append, the
    // surviving row would be duplicated and the count would exceed 1
    spark.sql("DELETE FROM graftmem.t2 WHERE id = 2")
    val rows = spark.sql("SELECT id, v FROM graftmem.t2")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 1.0)), rows)
  }
}
