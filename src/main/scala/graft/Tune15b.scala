package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev decomposition driver for q343/q348's per-batch MaxSim scoring
  * pipeline: times each stage of [[graft.operators.Similarity.
  * maxsimSemDedupBatch]] cumulatively (every stage's noop includes its
  * upstream), so the per-stage DELTAS locate the hot stage before any
  * operator surgery (guide §1.1). Not part of the driver contract.
  */
object Tune15b {
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
      println(f"TUNE15B $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def withShuffle8[T](body: => T): T = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    val docSlot = pmod(expr("vec_id div 4") * lit(2654435761L), lit(10L))
    val stok = emb.filter(docSlot =!= 0)
      .select(expr("vec_id div 4").as("cd"), col("vec_id").as("ct"),
        col("embedding").as("ce"))
    val cents = broadcast(stok.orderBy("ct").limit(16)
      .select(col("ct").as("centroid_id"), col("ce").as("centroid")))
    def arts() = {
      val ca = graft.util.FixtureArtifact.parquet(spark, dir,
        "embeddings.parquet", "mving_ca_n16", params = Map("nlist" -> 16L))(
        Similarity.assignToCentroids(
            stok.select(col("ct").as("tid"), col("ce").as("e")),
            "tid", "e", cents, nKeep = 1)
          .select(col("tid"), col("centroid_id")))
      val codes = graft.util.FixtureArtifact.parquet(spark, dir,
        "embeddings.parquet", "mving_sq8")(
        Similarity.sq8Codes(stok.select(col("ct"), col("ce")), "ct", "ce"))
      val ctok = graft.util.FixtureArtifact.parquet(spark, dir,
        "embeddings.parquet", "mving_ctok_sq8")(
        stok.select(col("cd"), col("ct"))
          .join(codes.select(col("id").as("ct"), col("qc").as("cc"),
            col("rc")), Seq("ct")))
      (ca, codes, ctok)
    }
    val batch0 = emb.filter(docSlot === 0)
      .select(expr("vec_id div 4").as("qd"), col("vec_id").as("qt"),
        col("embedding").as("qe"))

    for (pass <- 1 to 2) {
      time(s"p$pass artifacts") { arts() }
      val (ca, codes, ctok) = arts()
      val np = 4; val m = 40; val minScore = 900000L
      withShuffle8 {
        // full operator end to end, as q343's batch body runs it
        time(s"p$pass full") {
          noop(Similarity.maxsimSemDedupBatch(batch0, stok, ca, codes,
            cents, np = np, m = m, minScore = minScore,
            ctokCodes = Some(ctok)))
        }
        // stage-by-stage replica (cumulative)
        val batch = batch0
        val keyed = batch.groupBy("qd")
          .agg(expr("transform(array_sort(collect_list(struct(qt, qe))), " +
            "x -> x.qe)").as("pk"))
        val g = keyed.groupBy("pk")
          .agg(min("qd").as("rep"), collect_set("qd").as("docs"))
        time(s"p$pass s1_repgroup") { noop(g) }
        val rbatch = batch.join(g.select(col("rep").as("qd")), Seq("qd"),
          "left_semi")
        val qa = Similarity.assignToCentroids(rbatch.select("qt", "qe"),
          "qt", "qe", cents, nKeep = np).select(col("qt"), col("centroid_id"))
        time(s"p$pass s2_assign") { noop(qa) }
        val t2d = ctok.select(col("ct").as("tid"), col("cd"))
        val cdocs = qa.join(broadcast(rbatch.select("qd", "qt")), Seq("qt"))
          .join(ca.select(col("tid"), col("centroid_id")), Seq("centroid_id"))
          .join(t2d, Seq("tid"))
          .select("qd", "cd").distinct()
        time(s"p$pass s3_cdocs") { noop(cdocs) }
        val qcodes = broadcast(
          Similarity.sq8Codes(rbatch.select("qt", "qe"), "qt", "qe")
            .select(col("id").as("qt"), col("qc").as("qq"))
            .join(rbatch.select("qd", "qt"), Seq("qt")))
        val apx = cdocs.join(qcodes, Seq("qd"))
          .join(ctok, Seq("cd"))
          .select(col("qd"), col("cd"), col("qt"),
            (expr("vec_dotl(qq, cc)") * col("rc")).as("apair"))
          .groupBy("qd", "cd", "qt").agg(max("apair").as("amx"))
          .groupBy("qd", "cd").agg(sum("amx").as("ascore"))
        time(s"p$pass s4_apx") { noop(apx) }
        val wp = Window.partitionBy("qd").orderBy(col("ascore").desc,
          col("cd"))
        val pool = apx.withColumn("pr", row_number().over(wp))
          .filter(col("pr") <= m).select("qd", "cd")
        time(s"p$pass s5_pool") { noop(pool) }
        val qv = broadcast(rbatch
          .withColumn("qn", expr("sqrt(vec_dot(qe, qe))")))
        val cv = stok.withColumn("cn", expr("sqrt(vec_dot(ce, ce))"))
        val repAlerts = pool.join(qv, Seq("qd")).join(cv, Seq("cd"))
          .select(col("qd"), col("cd"), col("qt"),
            round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn"))
              * lit(1000000.0)).cast("long").as("mc"))
          .groupBy("qd", "cd", "qt").agg(max("mc").as("mx"))
          .groupBy("qd", "cd").agg(sum("mx").as("score"))
          .filter(col("score") >= minScore)
        time(s"p$pass s6_exact") { noop(repAlerts) }
        // row counts for the fanout picture
        println(s"TUNE15B p$pass rows: reps=" + g.count() +
          " cdocs=" + cdocs.count() + " apx=" + apx.count())
      }
    }
    spark.stop()
  }
}
