package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.pipeline.{PipelineJob, PipelineRunner}
import graft.sources.Tables

/** Capstone: a real training-data pipeline composed from the library and
  * orchestrated by the builder-semantics runner — ingest → exact dedup →
  * quality filter → decontaminate against a benchmark slice → curated
  * output. Asserts the staged parquet targets and that a re-run is a
  * full no-op (staleness skip).
  */
class TrainingPipelineSpec extends SparkTestBase {

  test("documents flow through dedup -> quality -> decontamination") {
    val root = Files.createTempDirectory("graft_train").toString
    val runner = new PipelineRunner(spark, root)

    val ingest = PipelineJob("ingest", "docs.parquet", Nil)(
      (s, _) => Tables.load(s, sf, "documents"))

    val dedup = PipelineJob("dedup", "deduped.parquet", Seq("docs.parquet"))(
      (s, in) => Dedup.firstPerKey(in("docs.parquet"), Seq("text"), Seq(col("doc_id"))))

    val quality = PipelineJob("quality", "quality.parquet", Seq("deduped.parquet"))(
      (s, in) => {
        val words = TextFunctions.tokens(col("text"))
        in("deduped.parquet")
          .withColumn("q_score", TextFunctions.qualityScore(size(words)))
          .filter(col("q_score") > 0.2)
      })

    val decontaminate = PipelineJob("decontaminate", "curated.parquet",
      Seq("quality.parquet"))(
      (s, in) => {
        val docs = in("quality.parquet")
        val hits = Dedup.contaminated(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", n = 3, minShared = 3L)
        docs.filter(col("source") =!= "src0")
          .join(hits, Seq("doc_id"), "left_anti")
      })

    val jobs = Seq(decontaminate, quality, dedup, ingest)
    val r1 = runner.run(jobs)
    assert(r1.ran == Seq("ingest", "dedup", "quality", "decontaminate"))

    val in = spark.read.parquet(s"$root/docs.parquet").count()
    val curated = spark.read.parquet(s"$root/curated.parquet")
    assert(curated.count() > 0 && curated.count() < in)
    // decontamination holds: nothing in the output shares >= 3 shingles
    // with the benchmark slice of the quality set
    val qual = spark.read.parquet(s"$root/quality.parquet")
    val residue = Dedup.contaminated(curated,
      qual.filter(col("source") === "src0"), "doc_id", "text", 3, 3L).count()
    assert(residue == 0)

    val r2 = runner.run(jobs)
    assert(r2.ran.isEmpty && r2.skipped.size == 4)
  }
}
