package graft

/** Dev sweep driver for the round-13 dials: dumps the assembled DuckDB
  * probe SQL for (a) the multi-vector token-index (nlist, nprobe) grid
  * + doc-level takedown, (b) the advised-dial multi-vector ingest
  * coverage, and (c) the graph-family drift response (edge churn,
  * stale/repaired/rebuilt serves) — so every dial is swept in DuckDB
  * BEFORE the Spark side is wired (the round-9 rule).
  */
object Tune13 {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/r13_sweep")
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/mv_advised.sql"),
      graft.queries.Round13.mvAdvisedProbeSql)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/mv_ingest_adv.sql"),
      graft.queries.Round13.mvIngestAdvProbeSql)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/graph_drift.sql"),
      graft.queries.Round13.graphDriftProbeSql)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/hyb_advised.sql"),
      graft.queries.Round13.hybAdvisedProbeSql)
    println(s"wrote sweep SQL to $outDir")
  }
}
