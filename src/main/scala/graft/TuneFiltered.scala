package graft

/** Dev sweep driver for the round-11 dials: dumps the assembled DuckDB
  * probe SQL for (a) filtered-IVF nprobe over-probing, (b) the
  * filtered graph walk's beam/rounds recovery, (c) the delete+compact
  * refinement rounds — so every dial is swept in DuckDB BEFORE the
  * Spark side is wired (the round-9 rule: the oracle replay is cheap,
  * exact, and doubles as the bug detector). No Spark session needed.
  */
object TuneFiltered {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/filtered_sweep")
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/ivf_filtered.sql"),
      graft.queries.Round11.ivfFilteredProbeSql)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/graph_filtered.sql"),
      graft.queries.Round11.graphFilteredProbeSql)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/delete_compact.sql"),
      graft.queries.Round11.deleteCompactProbeSql)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/slo_filtered.sql"),
      graft.queries.Round11.sloFilteredProbeSql)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/maintained_filtered.sql"),
      graft.queries.Round11.maintainedFilteredProbeSql)
    println(s"wrote sweep SQL to $outDir")
  }
}
