package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev decomposition driver for the round-15 streaming-maintenance
  * tail (q313/q317/q343): times each component of the per-execution
  * cost — standing-artifact warm serve, AvailableNow stream machinery
  * with a no-op batch body, and the per-batch walk/score pipelines as
  * plain batch calls — so optimization effort lands where the seconds
  * are (guide §1.1). Not part of the driver contract.
  */
object Tune15 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.NativeExpressions.register(spark)
    import graft.operators.Similarity
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"TUNE15 $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def withShuffle8[T](body: => T): T = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    val slot = pmod(col("vec_id") * lit(2654435761L), lit(10L))
    val corpus0 = emb.filter(slot =!= 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))

    // standing artifacts (first call builds, so run everything twice)
    def arts() = {
      val edges = graft.util.FixtureArtifact.parquet(spark, dir,
        "embeddings.parquet", "nnd_d24_r2_stitched_d4_p6_t4_slotc") {
        val stitched = graft.util.FixtureArtifact.parquet(spark, dir,
          "embeddings.parquet", "stitched_d4_p6_t4_slotc")(
          Similarity.lshKnnEdgesMultiTable(corpus0, d = 4,
            nPlanes = 6, dim = 64, nTables = 4))
        Similarity.nnDescentEdges(stitched, corpus0, d = 24, rounds = 2)
      }
      val codes = graft.util.FixtureArtifact.parquet(spark, dir,
        "embeddings.parquet", "pqcodes_s16_c16_slotc")(
        Similarity.pqCodes(corpus0, nSub = 16, nCodes = 16, dim = 64))
      val cnorms = graft.util.FixtureArtifact.parquet(spark, dir,
        "embeddings.parquet", "cnorms_slotc")(
        Similarity.cosNormsDF(corpus0))
      val cb = graft.util.FixtureArtifact.parquet(spark, dir,
        "embeddings.parquet", "pqcb_c16_slotc",
        params = Map("nCodes" -> 16L))(
        Similarity.pqCodebookDF(corpus0, nCodes = 16))
      (edges, codes, cnorms, cb)
    }
    for (pass <- 1 to 2) {
      time(s"p$pass artifacts") { arts() }
      val (edges, codes, cnorms, cb) = arts()
      val cnormsCb = (cnorms, cb)
      val cents = broadcast(corpus0.orderBy("cid").limit(16)
        .select(col("cid").as("centroid_id"), col("ce").as("centroid")))
      val probe = emb.filter(slot === 0)
        .select(col("vec_id").as("da"), col("embedding").as("ea"))
      // the q317 batch pipeline as a plain batch call
      time(s"p$pass graphInsertBatch") {
        withShuffle8 {
          noop(Similarity.graphInsertBatch(probe, corpus0, edges, codes,
            cents, beam = 24, rounds = 4, nSub = 16, nCodes = 16,
            dim = 64, dOut = 8, norms = Some(cnorms),
            codebook = Some(cb)))
        }
      }
      // the q313 batch pipeline
      time(s"p$pass beamPqSemDedupBatch") {
        withShuffle8 {
          noop(Similarity.beamPqSemDedupBatch(probe, corpus0, edges,
            codes, cents, beam = 24, rounds = 4, nSub = 16, nCodes = 16,
            dim = 64, threshold = 0.35, norms = Some(cnorms),
            codebook = Some(cb)))
        }
      }
      // stream machinery alone: same source/filter, no-op batch body
      time(s"p$pass stream-noop") {
        val src = spark.readStream.schema(emb.schema)
          .option("pathGlobFilter", "embeddings.parquet").parquet(dir)
        val pr = src.filter(
            pmod(col("vec_id") * lit(2654435761L), lit(10L)) === 0)
          .select(col("vec_id").as("da"), col("embedding").as("ea"))
        var batches = 0
        val q = withShuffle8 {
          pr.writeStream.foreachBatch { (b: DataFrame, _: Long) =>
            batches += 1; b.count(); ()
          }.trigger(
            org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        println(s"TUNE15 p$pass batches=$batches")
      }
      // per-round instrumented replica of beamPqVisitedScored (q317's
      // walk): where inside a round does the time go?
      time(s"p$pass walk-rounds") {
        withShuffle8 {
          val g = probe.groupBy("ea")
            .agg(min("da").as("rep"), collect_list("da").as("ids"))
          val reps = g.select(col("rep").as("qid"), col("ea").as("qe"))
          val entries = Similarity.assignToCentroids(reps, "qid", "qe",
            cents, nKeep = 2).select(col("qid"),
            col("centroid_id").as("cid"))
          val dsub = 4
          val cbB = broadcast(cnormsCb._2)
          val qtab = broadcast(
            Similarity.quantCoordsPub(reps, "qid", "qe").join(cbB, Seq("i"))
              .groupBy(col("qid"), expr(s"(i - 1) div $dsub").as("s"),
                col("code"))
              .agg(sum(col("x") * col("cx")).as("pdot")))
          val q = reps.withColumn("qn", expr("sqrt(vec_dot(qe, qe))"))
          val cn = cnormsCb._1
          var frontier = entries.select(col("qid"), col("cid"))
          for (r <- 1 to 4) {
            val t0 = System.nanoTime()
            val expanded = frontier.join(edges, frontier("cid") === edges("u"))
              .select(col("qid"), col("v").as("cid"))
              .unionByName(frontier.select("qid", "cid")).distinct()
            val adc = expanded.join(codes, "cid")
              .join(qtab, Seq("qid", "s", "code"))
              .groupBy("qid", "cid").agg(sum("pdot").as("adc"))
            val scored = adc
              .join(broadcast(q.select(col("qid"), col("qn"))), "qid")
              .join(cn, "cid")
              .filter(col("qid") =!= col("cid"))
              .select(col("qid"), col("cid"),
                round(col("adc").cast("double") /
                  (lit(1.0e12) * col("qn") * col("cn")), 6).as("cos"))
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy("qid").orderBy(col("cos").desc, col("cid"))
            val out = graft.util.Scratch.dir(s"t15_r$r")
            scored.withColumn("rn",
                org.apache.spark.sql.functions.row_number().over(w))
              .write.mode("overwrite").parquet(out)
            val rs = spark.read.parquet(out)
            frontier = rs.filter(col("rn") <= 24).select("qid", "cid")
            println(f"TUNE15 p$pass round$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
          }
        }
      }
      // MemCatalog MERGE round-trip cost
      time(s"p$pass merge") {
        spark.conf.set("spark.sql.catalog.graftmem",
          "graft.sources.MemCatalog")
        spark.sql("DROP TABLE IF EXISTS graftmem.tune15")
        spark.sql("CREATE TABLE graftmem.tune15 (u BIGINT, v BIGINT, cos DOUBLE)")
        probe.limit(100).select(col("da").as("u"), col("da").as("v"),
            lit(0.5).as("cos"))
          .createOrReplaceTempView("tune15_batch")
        spark.sql("""MERGE INTO graftmem.tune15 t USING tune15_batch b
          ON t.u = b.u AND t.v = b.v
          WHEN NOT MATCHED THEN INSERT (u, v, cos) VALUES (b.u, b.v, b.cos)""")
        noop(spark.sql("SELECT * FROM graftmem.tune15"))
      }
    }
    spark.stop()
  }
}
