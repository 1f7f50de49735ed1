package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Catalog-wide physical-plan regression guard: no declared query may
  * plan a Cartesian product or an unbounded nested-loop join. The only
  * sanctioned nested loops are 1-row/bounded-by-construction broadcast
  * scalars (per-pair threshold constants, contingency cells, top-k
  * vocabularies) — whitelisted explicitly so a new accidental cross
  * join fails the suite instead of shipping as an O(n²) scale bug.
  *
  * Streaming queries execute on construction (they drain a stream to a
  * memory sink inside the query fn), so they are exercised by
  * StreamingSpec/Verify instead of being re-run here.
  */
class PlanGuardSpec extends SparkTestBase {

  // queries whose nested-loop joins are 1-row or constant-domain
  // broadcast builds (documented in each query's comment)
  private val boundedNlJoins = Set(
    "q171_llm_bpe_merge",          // 1-row best-pair scalar
    "q179_stat_kendall_tau",       // <=550-cell contingency sides + 1-row subtotals
    "q183_cascade_delete_audit",   // three 1-row audit count frames
    "q181_stream_interval_left_outer", // 1-row watermark constant
    "q25_win_ntile",               // documented bounded-dim global window
    "q115_profile",                // 1-row corpus-stats scalar
    "q150_llm_dataset_card",       // 1-row corpus summary joins
    "q176_llm_oov_rate",           // top-1000 vocab broadcast (bounded top-k)
    "q68_subquery",                // scalar subquery becomes 1-row join
    "q94_subquery_exists",
    "q155_llm_mixture_downsample", // per-domain quota: 1-row per-group constant
    "q105_stratified_sample",
    "q169_graph_triangles",        // kNN top-10 edge build: 1-row avg threshold
    "q13_join_cross",              // the cross-join operator itself (bounded dims)
    "q46_llm_cosine_topk",         // 5-row query side broadcast (bounded by construction)
    "q77_llm_ann_ivf",             // broadcast coarse centroids (fixed k)
    "q81_llm_tfidf",               // 1-row corpus-size scalar
    "q186_emb_hard_negatives",     // bounded anchor-minibatch broadcast
    "q197_llm_neardup_eval",       // three 1-row eval-count frames
    "q199_evt_ab_lift"             // two 1-row arm-summary frames
  )

  private def collectPlans(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectPlans(a.executedPlan)
    case other => (other +: other.children.flatMap(collectPlans)) ++
      other.subqueries.flatMap(collectPlans)
  }

  test("no declared query plans a Cartesian or unbounded nested-loop join") {
    val skip = (n: String) => n.contains("stream")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if skip(name) => Nil
      case (name, fn) =>
        try {
          val plan = fn(spark, sf).queryExecution.executedPlan
          val nodes = collectPlans(plan)
          val bad = nodes.exists {
            case _: CartesianProductExec => true
            case _: BroadcastNestedLoopJoinExec => !boundedNlJoins.contains(name)
            case _ => false
          }
          if (bad) Seq(name) else Nil
        } catch {
          case e: Throwable => Seq(s"$name (plan failed: ${e.getMessage})")
        }
    }
    assert(offenders.isEmpty, s"scale-hazard plans: $offenders")
  }
}
