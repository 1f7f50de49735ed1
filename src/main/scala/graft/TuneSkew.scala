package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only skew A/B for the window family (not part of the driver
  * contract): on a hot-key fixture (make_scale_probe --skew-hot), time
  * the plain rank / lag windows against the two-phase binned forms at a
  * production-style hot threshold. Mirrors the q23-vs-q259 methodology
  * recorded in BASELINE.md (noop-write action, warm second run timed).
  */
object TuneSkew {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/skewhot")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f
      println(f"SKEW $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val wRank = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    time("rank plain")(noop(o.select(col("o_custkey"), col("o_orderkey"),
      row_number().over(wRank).cast("long").as("rn"),
      rank().over(wRank).cast("long").as("rnk"),
      dense_rank().over(wRank).cast("long").as("drnk"))))
    time("rank binned hot>=100k")(noop(graft.operators.Ranks.rankedBinned(
      o, "o_custkey", "-o_totalprice",
      Seq(col("o_totalprice").desc, col("o_orderkey")),
      bins = 64, hotThreshold = 100000L)))

    val e = graft.sources.Events.load(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("sec"))
    val wLag = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    time("lag/lead plain")(noop(e.select(col("event_id"), col("user_id"),
      lag(col("event_type"), 1).over(wLag).as("prev_type"),
      (col("sec") - lag(col("sec"), 1).over(wLag)).as("gap_sec"),
      lead(col("event_id"), 1).over(wLag).as("next_id"))))
    time("lag/lead binned hot>=100k")(noop(graft.operators.Ranks.lagLeadBinned(
      e, "user_id", "sec", Seq(col("sec"), col("event_id")),
      Seq("event_type", "sec", "event_id"),
      bins = 64, hotThreshold = 100000L)
      .select(col("event_id"), col("user_id"),
        col("lag_event_type").as("prev_type"),
        (col("sec") - col("lag_sec")).as("gap_sec"),
        col("lead_event_id").as("next_id"))))
    spark.stop()
  }
}
