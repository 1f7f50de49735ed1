package graft

/** Dev sweep driver for the round-12 dials: dumps the assembled DuckDB
  * probe SQL for (a) filtered IVF-SQ8 over-probe × pool depth and (b)
  * filtered IVFADC over-probe × pool scaling — so every dial is swept
  * in DuckDB BEFORE the Spark side is wired (the round-9 rule: the
  * oracle replay is cheap, exact, and doubles as the bug detector).
  */
object Tune12 {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/r12_sweep")
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/sq8_filtered.sql"),
      graft.queries.Round12.sq8FilteredProbeSql)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/ivfpq_filtered.sql"),
      graft.queries.Round12.ivfpqFilteredProbeSql)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/ivfpq_rederived.sql"),
      graft.queries.Round12.ivfpqRederivedProbeSql)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/drift_retrain.sql"),
      graft.queries.Round12.driftRetrainProbeSql)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/mv_ingest.sql"),
      graft.queries.Round12.mvIngestProbeSql)
    println(s"wrote sweep SQL to $outDir")
  }
}
