package graft

/** Dev sweep driver for the round-14 dials: dumps the assembled DuckDB
  * probe SQL for (a) the budgeted lexical prefix rung (arm/fused
  * recall + worst-query cost per swept T — how the 90000 posting
  * budget and the T*=21 point were chosen) and (b) the pooled-vs-token
  * maxsim serving sweep (fixed vs corpus-scaled pool containment +
  * the decision's exact cost/byte rows) — so every dial is swept in
  * DuckDB BEFORE the Spark side is wired (the round-9 rule). The
  * q352/q353/q354 sweeps ran as the same fragments the oracles are
  * assembled from (dsirFeatSql/dsirModelSql/mvWorldMsSql chains).
  */
object Tune14 {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/r14_sweep")
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(outDir))
    // lexBudgetProbeSql opens with exactRecallCte, which carries its
    // own WITH; mvPooledProbeSql opens with a bare CTE list
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/lex_budget.sql"),
      graft.queries.Round14.lexBudgetProbeSql)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$outDir/mv_pooled.sql"),
      "WITH " + graft.queries.Round14.mvPooledProbeSql)
    println(s"wrote sweep SQL to $outDir")
  }
}
