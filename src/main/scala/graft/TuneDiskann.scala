package graft

/** Dev sweep driver for the q312 DiskANN-serving dials: dumps the
  * assembled DuckDB oracle for each (beam, rounds) point to /tmp so the
  * replay can be swept in DuckDB BEFORE the Spark side is wired — the
  * round-9 rule (the oracle replay is cheap, exact, and doubles as the
  * bug detector; it caught q309's collapsed codebook and q308's pool
  * drift). No Spark session needed — the oracle is a pure string.
  */
object TuneDiskann {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/diskann_sweep")
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(outDir))
    for {
      beam <- Seq(8, 16, 24, 32)
      rounds <- Seq(2, 3, 4)
    } {
      val sql = graft.queries.Round10.diskannOracle(
        beam = beam, rounds = rounds, nSub = 16, nCodes = 16)
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(s"$outDir/b${beam}_r$rounds.sql"), sql)
      val ing = graft.queries.Round10.ingestGraphOracle(
        beam = beam, rounds = rounds)
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(s"$outDir/ingest_b${beam}_r$rounds.sql"), ing)
    }
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/cal_sampled_probe.sql"),
      graft.queries.Round10.calSampledProbeSql)
    println(s"wrote sweep SQL to $outDir")
  }
}
