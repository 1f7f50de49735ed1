package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative hierarchy traversal (the recursive-CTE replacement on
  * Spark): walk parent pointers to the root in a driver-controlled
  * loop of self-joins. Each round advances every unfinished node one
  * level, so rounds = max depth; for deeper-than-log hierarchies
  * switch to pointer-doubling (join cur->cur) like
  * [[Dedup.componentsStar]]. Only the frontier (unfinished nodes)
  * joins each round — finished rows union straight through.
  */
object Hierarchy {

  /** Depth of each node above the root sentinel (parent == 0 means the
    * node is a root at depth 1). `edges` columns: id, parent.
    */
  def depths(edges: DataFrame, maxRounds: Int = 40): DataFrame = {
    var frontier = edges.select(col("id"), col("parent").as("cur"),
      lit(1L).as("d"))
    var done = frontier.filter(col("cur") === 0).select("id", "d")
    frontier = frontier.filter(col("cur") =!= 0)
    var round = 0
    while (round < maxRounds && !frontier.isEmpty) {
      val stepped = frontier.as("f")
        .join(edges.as("e"), col("f.cur") === col("e.id"))
        .select(col("f.id"), col("e.parent").as("cur"),
          (col("f.d") + 1).as("d"))
      done = done.unionByName(
        stepped.filter(col("cur") === 0).select("id", "d"))
      frontier = stepped.filter(col("cur") =!= 0)
      round += 1
    }
    done
  }
}
