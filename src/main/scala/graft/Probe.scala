package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostics main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import graft.functions.TextFunctions
    val docs = sources.Tables.load(spark, dir, "documents")
    val sh = docs.select(col("doc_id"),
      array_distinct(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3)).as("sh"))
    time("shingles")(sh.count())
    val sig = sh.select(col("doc_id"),
      operators.Dedup.minHashSignature(col("sh"), 32).as("sig"))
    time("signatures")(sig.count())
    val banded = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(7)), b => slice(col("sig"), b * 4 + 1, lit(4)))))
      .select(col("doc_id"), col("pos").as("band"), hash(col("col")).as("bucket"))
    time("banded")(banded.count())
    time("bucket-join") {
      val l = banded.select(col("doc_id").as("da"), col("band"), col("bucket"))
      val r = banded.select(col("doc_id").as("db"), col("band"), col("bucket"))
      l.join(r, Seq("band", "bucket")).filter(col("da") < col("db"))
        .select("da", "db").distinct().count()
    }
    time("full-op")(operators.Dedup.minHashCandidates(docs, "doc_id", "text", 3, 32, 8).count())
    spark.stop()
  }
}
