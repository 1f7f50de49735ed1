package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, LocalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Catalog-wide physical-plan regression guards:
  *
  *  1. No declared query may plan a Cartesian product or an unbounded
  *     nested-loop join. The only sanctioned nested loops are
  *     1-row/bounded-by-construction broadcast scalars (per-pair
  *     threshold constants, contingency cells, top-k vocabularies) —
  *     whitelisted explicitly so a new accidental cross join fails the
  *     suite instead of shipping as an O(n²) scale bug.
  *  2. No declared query may funnel an unbounded input through an
  *     `Exchange SinglePartition` (the global-sort/global-window shape
  *     that put the whole corpus in one task in the old q103). A
  *     single-partition exchange is sanctioned only when its input is
  *     bounded by construction: a partial/final aggregate or a limit
  *     somewhere beneath it (post-aggregation spines, scalar
  *     subqueries, top-k), or an explicitly whitelisted bounded dim.
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
    "q269_llm_mmr_rerank",         // 12x12 pairwise sims + <=5-row selection
                                   // frames — every NL side is top-k-bounded
                                   // (TakeOrdered limit 12/1) by construction
    "q46_llm_cosine_topk",         // 5-row query side broadcast (bounded by construction)
    "q275_llm_ann_recall",         // q46's kernel on a 50-row query sample —
                                   // the exact side of recall monitoring
                                   // (bounded broadcast by construction)
    "q276_llm_ann_multiprobe",     // same exact-side kernel as q275
    "q278_llm_ann_ivf_recall",     // same exact-side kernel as q275; IVF
                                   // side broadcasts the 16-row centroids
    "q77_llm_ann_ivf",             // broadcast coarse centroids (fixed k)
    "q81_llm_tfidf",               // 1-row corpus-size scalar
    "q186_emb_hard_negatives",     // bounded anchor-minibatch broadcast
    "q197_llm_neardup_eval",       // three 1-row eval-count frames
    "q199_evt_ab_lift",            // two 1-row arm-summary frames
    "q218_llm_mixture_temperature", // 1-row mixture-normalizer scalar (Z)
    "q222_llm_ann_pq",             // 128-row codebook + 1-row probe broadcasts
    "q226_llm_bm25_retrieval",     // 1-row corpus-stats scalar (n_docs, t_tokens)
    "q227_graph_sssp",             // 1-row source-seed frontier (constant-folded
                                   // equi condition on the literal source node;
                                   // rounds 2-4 are hash joins on real keys)
    "q230_llm_rrf_fusion",         // 3-row query-side broadcast (q46 class)
    "q236_eval_auc_exact",         // Ranks.cumSums 1-row min/max scalar
    "q237_eval_ks_drift",          // same + 1-row totals and sup scalars
    "q238_eval_lift_deciles",      // Ranks scalar + 1-row total-count frame
    "q239_llm_quantile_normalize", // Ranks scalar + 1-row global-count frame
    "q240_llm_budget_waterfill",   // 1-row budget + uncapped-prefix scalars (bounded domain dim)
    "q241_ts_forecast_smape",      // 1-row max-hour scalar (backtest horizon)
    "q244_basket_association",     // 1-row basket-count scalar (lift normalizer)
    "q255_llm_ann_beam",           // 1-row fixed-entry-point seed; beam rounds
                                   // are bounded candidate broadcasts (≤ |Q|·beam·(d+1))
    "q258_llm_ann_beam_dedup",     // same beamTopK entry seed as q255
    "q259_win_running_sum_binned", // Ranks 1-row order-range scalar (cumSums shape)
    "q260_llm_bigram_lm",          // 1-row vocabulary-size scalar (V)
    "q261_mix_priority_sample",    // 1-row tau scalar over the bounded top-(k+1)
    "q263_dq_audit",               // three 1-row metric frames joined for the report
    "q268_eval_chi2_drift",        // 1-row contingency-totals frame
    "q279_llm_ann_ivf_probe",      // q275's exact-side kernel (50-row query
                                   // broadcast) + 16-row centroid broadcast
    "q280_llm_ann_multitable",     // q275's exact-side kernel; the multi-table
                                   // candidate join itself is a hash equi-join
    "q285_llm_ann_ivf_lloyd",      // q275's exact-side kernel; Lloyd passes are
                                   // hash equi-joins on the dim index
    "q283_win_ntile_binned",       // constant partition key folds the joins
                                   // against the 1-row min/max + count
                                   // AGGREGATE frames to NL (bounded builds —
                                   // the global-ntile degenerate-hot case)
    "q289_llm_ann_mrr",            // q275's exact-side kernel (50-row query
                                   // broadcast) + 16-row centroid broadcast
                                   // (the q279 class)
    "q290_llm_curriculum",         // ntileBinned over a constant stage key —
                                   // the q283 fold class (1-row aggregate
                                   // builds)
    "q293_llm_ann_matryoshka",     // q275's exact-side kernel twice (50-row
                                   // query broadcast, full- and 32-dim)
    "q294_llm_ann_ivf_advised",    // q279 class (50-row query + advised-nlist
                                   // centroid broadcasts) + 1-row corpus-stats
                                   // scalar feeding IndexAdvisor
    "q295_llm_ann_matryoshka_rerank", // q293 class (50-row query broadcast on
                                   // the 32-dim stage; rerank is m-bounded
                                   // hash joins)
    "q299_llm_curation_advised",   // advised-nlist centroid broadcast (limit-
                                   // bounded) + 1-row corpus-stats scalar;
                                   // cell pairing is a hash equi-join
    "q300_llm_ann_ivf_matryoshka", // q279 class on sliced vectors (50-row
                                   // query + 16-row centroid broadcasts);
                                   // rerank is m-bounded hash joins
    "q301_llm_ann_beam_advised",   // q255 class: 1-row fixed-entry seed +
                                   // bounded beam-candidate broadcasts +
                                   // the harness's 50-row query broadcast
    "q302_llm_ann_beam_seeded",    // same class; entries from a 16-row
                                   // centroid broadcast instead of 1-row
    "q303_llm_ann_beam_stitched",  // same class over the 4-table stitched
                                   // edge build (bucket equi-joins)
    "q304_llm_ann_beam_nndescent", // q303 class: the harness's 50-row query
                                   // broadcast + bounded beam-candidate
                                   // broadcasts; NN-Descent rounds are hash
                                   // equi-joins on u/v, the refined edge set
                                   // is read back from a parquet scan
    "q307_llm_ann_pq_adc",         // q222 class: the harness's 50-row query
                                   // broadcast (exact side) + nCodes-row
                                   // codebook broadcast (limit-bounded) +
                                   // the broadcast qtab (50·nSub·nCodes
                                   // rows, aggregate-bounded); the ADC scan
                                   // itself is a hash equi-join on (s, code)
    "q308_llm_ann_pq_rerank",      // same class; rerank is m-bounded hash
                                   // joins (the q295 shape)
    "q309_llm_ann_ivfpq",          // q279+q222 class: the harness's 50-row
                                   // query broadcast (exact side) + the
                                   // 16-row centroid / codebook broadcasts
                                   // (assignToCentroids crossJoins vs the
                                   // limit-bounded cents) + the broadcast
                                   // LUT (50·nprobe·nSub·nCodes aggregate
                                   // rows); candidate scoring is hash
                                   // equi-joins, rerank is m-bounded
    "q310_llm_ann_ivfpq_advised",  // q309 class + the 1-row corpus-stats
                                   // scalar feeding adviseServing (q294
                                   // class)
    "q306_llm_ann_calibrated",     // q279/q280 class: the harness's 50-row
                                   // query broadcast (exact side + both
                                   // measurement passes) + 16/32-row centroid
                                   // broadcasts; candidate joins are hash
                                   // equi-joins; decision inputs are 1-row
                                   // stats + recall scalars (q294 class)
    "q318_llm_ann_filtered_ivf",   // q279 class ×4 serves: 50-row query +
                                   // 16-row centroid broadcasts
                                   // (assignToCentroids crossJoins); the
                                   // filter is a hash semi-join on cid;
                                   // the filtered exact sides are read
                                   // back from fixture artifacts
    "q320_llm_ann_advise_filtered", // q294+q318 class: the served branch's
                                   // centroid broadcasts (or the q46-class
                                   // 50-row query broadcast when the
                                   // brute-filtered tier fires) + 1-row
                                   // corpus/filter-count scalars feeding
                                   // adviseFiltered
    "q323_llm_ann_filtered_slo",   // q320 class: the served branch's
                                   // 50-row query broadcast (brute tier at
                                   // sf0.01) or centroid broadcasts (ivf
                                   // tier); decision inputs are 1-row
                                   // corpus/filter-count scalars; the
                                   // sampled measurement runs eagerly over
                                   // the limit-bounded Lehmer-500 sample
    "q324_llm_perplexity_fixedln", // q260 class: the 1-row vocabulary-size
                                   // scalar (V) joins on a constant key
                                   // (folds to a bounded NL join); the
                                   // ln table joins are hash equi-joins
                                   // on the Zipf-bounded distinct counts
    "q315_llm_ann_calibrated_memory", // q306 class: the served branch's
                                   // assignToCentroids crossJoins against
                                   // limit-bounded centroid broadcasts; the
                                   // measurement passes run eagerly (their
                                   // plans are the whitelisted q279/q309
                                   // shapes); decision inputs are 1-row
                                   // stats + recall scalars
    "q326_llm_ann_ivf_sq8",        // q279 class: 50-row query + 16-row
                                   // centroid broadcasts (assignToCentroids
                                   // crossJoins); the SQ8 candidate join is
                                   // a hash equi-join on cell id, the
                                   // rerank is an m=8-bounded hash join
    "q333_llm_maxsim_exact",       // q46 class: the 40-row query-token side
                                   // broadcasts into the all-pairs NL join
                                   // (bounded build); max/sum are hash aggs
    "q334_llm_maxsim_plaid",       // q279 class: centroid/query-token
                                   // broadcasts (bounded builds); candidate
                                   // generation is a hash equi-join on cell
                                   // id, SQ8 ranking and the exact rerank
                                   // are pool-bounded hash joins
    "q330_llm_ann_ivf_bq",         // q279/q326 class: 50-row query + 16-row
                                   // centroid broadcasts; the BQ candidate
                                   // join is a hash equi-join on cell id,
                                   // the rerank join is pool-bounded
    "q328_llm_ann_calibrated_sq8", // q315 class: two measurement pipelines
                                   // (the whitelisted q326/q309 shapes) run
                                   // eagerly; the served branch's centroid
                                   // broadcasts; decision inputs are 1-row
                                   // stats + recall scalars
    "q332_llm_sequence_pack",      // q283 fold class: cumSums's 1-row
                                   // min/max scalar crossJoins (bounded
                                   // build); the offset spine is the
                                   // sanctioned <=64-row post-agg window
    "q335_llm_drift_psi",          // q283 fold class: the 1-row min/max
                                   // scalar crossJoins the scan (bounded
                                   // build); everything downstream is
                                   // 2x2x16-row bounded arithmetic
    "q336_llm_data_pipeline",      // composes q327/q331/q332's whitelisted
                                   // shapes: selection reads the fixture
                                   // artifact flat; the budget/min-max
                                   // scalars fold to bounded NL joins
    "q331_llm_domain_mix",         // q283 fold class: the 1-row budget and
                                   // runningSumsBinned's min/max scalar
                                   // fold to bounded NL joins; the hot-key
                                   // list and per-(lang, bin) offsets are
                                   // bounded broadcasts
    "q337_llm_ann_filtered_sq8",   // q326+q318 class ×4 serves: 50-row
                                   // query + 16-row centroid broadcasts
                                   // (assignToCentroids crossJoins); the
                                   // filter is a hash semi-join on cid
                                   // against the cell lists; the filtered
                                   // exact sides are fixture artifacts
    "q338_llm_ann_filtered_ivfpq", // q309+q318 class ×6 serves: centroid
                                   // broadcasts + the broadcast LUT; the
                                   // member-level filter is a hash
                                   // semi-join on cid before the pool
                                   // window; rerank joins pool-bounded
    "q339_llm_ann_filtered_advisor", // q328 class under a filter: two
                                   // measurement pipelines (the q337/q338
                                   // whitelisted shapes) run eagerly;
                                   // decision inputs are 1-row stats +
                                   // recall scalars; the served branch is
                                   // one of the measured shapes
    "q340_llm_sq8_takedown_serve", // q337 class with the takedown set as
                                   // the filter: centroid broadcasts +
                                   // a hash semi-join of the cell lists
                                   // against the survivor ids
    "q341_llm_drift_churn_retrain", // q337+q225 class: centroid/seed-coord
                                   // broadcasts; the PSI spine join and
                                   // the 1-row total joins fold to bounded
                                   // NL joins (q283 class); churn/psi
                                   // decision inputs are 1-row scalars;
                                   // the Lloyd retrain joins are hash
                                   // equi-joins on the 64-coordinate key
    "q342_llm_encoded_token_pack", // q331/q332's whitelisted fold shapes
                                   // (1-row budget + min/max scalars as
                                   // bounded NL joins) plus the 8-row
                                   // merge-table collect (q316's bounded
                                   // class) and a vocabulary-bounded
                                   // word-count hash join
    "q344_llm_hybrid_retrieval_served", // q226+q326 class: the 1-row BM25
                                   // stats crossJoin (bounded agg build),
                                   // the q46-class 20-row query broadcast
                                   // into the exact arm, and q326's
                                   // centroid-broadcast crossJoins; the
                                   // fusion join is pair-keyed full-outer
                                   // bounded by 20+20 rows per query
    "q345_llm_encoded_data_pipeline", // composes q327's artifact read +
                                   // q342's whitelisted shapes (1-row
                                   // budget/min-max scalars as bounded NL
                                   // joins, the 8-row merge collect, the
                                   // vocab hash join)
    "q346_llm_maxsim_advised",     // q334 class at advised dials: centroid
                                   // + query-token broadcasts (bounded
                                   // builds; the advised nlist is a 1-row
                                   // stat scalar); candidate generation is
                                   // a hash equi-join on cell id, SQ8
                                   // ranking and the exact rerank are
                                   // pool-bounded hash joins
    "q347_llm_maxsim_takedown",    // q346 + q340 class: the doc takedown is
                                   // ONE hash semi-join on the candidate
                                   // doc ids before any scoring; the rest
                                   // is q346's whitelisted shape, twice
                                   // (naive + over-probed dials)
    "q351_llm_hybrid_arm_advised", // q328 + q344 class: the measured arm
                                   // rank tables are fixture artifacts
                                   // (flat scans); the served branch's
                                   // centroid broadcasts / broadcast LUT
                                   // (whitelisted q326/q309 shapes);
                                   // decision inputs are 1-row stats +
                                   // recall scalars; the fusion join is
                                   // pair-keyed full-outer bounded by
                                   // 20+20 rows per query
    "q354_llm_pack_waste_compaction", // q331's mix budget (pipeMix): the
                                   // 1-row half-share budget joins on a
                                   // constant key (bounded NL after
                                   // constant folding, the q283 class),
                                   // once per ingest cycle + once for the
                                   // compaction re-pack; pack windows are
                                   // cumSums' binned shapes
    "q356_llm_maxsim_unified_advisor", // q346's whitelisted PLAID serve run
                                   // live (centroid/query-token broadcasts,
                                   // bounded builds) + 1-row corpus stats;
                                   // the pooled arm is all hash equi-joins
                                   // (dim-keyed dots, pool-bounded rerank)
    "q327_llm_dsir_select"         // q283 fold class: the 1-row NT/NR
                                   // totals, ln-constant and doc-count
                                   // frames join on a constant key (bounded
                                   // NL after constant folding), and
                                   // rankedBinned's constant partition key
                                   // folds its min/max + hot-key joins; the
                                   // feature-count joins are hash equi-joins
                                   // on the 4096-bounded bucket id
  )

  // queries allowed an Exchange SinglePartition over a NON-aggregated,
  // NON-limited input, because that input is a bounded dimension by
  // construction (each documented at the query site)
  private val boundedSinglePartition = Set(
    "q25_win_ntile"                // customer dim global ntile; ApproxNtile is the scale path
  )

  private def collectPlans(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectPlans(a.executedPlan)
    // descend into persisted relations' defining plans — a persist()
    // must not hide a Cartesian/NL join or a global sort from the guard
    // (found via q227, whose 1-row frontier seed folds to a bounded NL
    // join inside the cached d1 lineage)
    case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      i +: collectPlans(i.relation.cachedPlan)
    case other => (other +: other.children.flatMap(collectPlans)) ++
      other.subqueries.flatMap(collectPlans)
  }

  // input bounded by construction: some aggregate (partial or final) or
  // limit sits beneath, so at most (#groups | limit) rows cross the wire
  private def boundedSubtree(p: SparkPlan): Boolean = collectPlans(p).exists {
    case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => true
    case _: LocalLimitExec | _: GlobalLimitExec => true
    case _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
    case _ => false
  }

  // plan every declared (non-streaming) query once; both guards read this
  private lazy val plannedQueries: Seq[(String, Either[String, Seq[SparkPlan]])] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if name.contains("stream") => Nil
      case (name, fn) =>
        val planned =
          try Right(collectPlans(fn(spark, sf).queryExecution.executedPlan))
          catch { case e: Throwable => Left(s"plan failed: ${e.getMessage}") }
        Seq(name -> planned)
    }

  test("no declared query plans a Cartesian or unbounded nested-loop join") {
    val offenders = plannedQueries.flatMap {
      case (name, Left(err)) => Seq(s"$name ($err)")
      case (name, Right(nodes)) =>
        val bad = nodes.exists {
          case _: CartesianProductExec => true
          case _: BroadcastNestedLoopJoinExec => !boundedNlJoins.contains(name)
          case _ => false
        }
        if (bad) Seq(name) else Nil
    }
    assert(offenders.isEmpty, s"scale-hazard plans: $offenders")
  }

  test("no declared query plans a single-partition exchange over unbounded input") {
    val offenders = plannedQueries.flatMap {
      case (_, Left(_)) => Nil // reported by the join guard above
      case (name, _) if boundedSinglePartition.contains(name) => Nil
      case (name, Right(nodes)) =>
        val bad = nodes.exists {
          case e: ShuffleExchangeExec
            if e.outputPartitioning == SinglePartition ||
              e.outputPartitioning.numPartitions == 1 =>
            !boundedSubtree(e.child)
          case _ => false
        }
        if (bad) Seq(name) else Nil
    }
    assert(offenders.isEmpty,
      s"single-partition global sort/window over unbounded input: $offenders")
  }

  test("the single-partition guard catches the old q103 shape (self-check)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // the pre-fix q103: a no-partitionBy window cumsum over the whole
    // documents table — must trip the detector
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars"),
        coalesce(sum(col("n_chars")).over(w), lit(0L)).as("before"))
    val nodes = collectPlans(df.queryExecution.executedPlan)
    val tripped = nodes.exists {
      case e: ShuffleExchangeExec
        if e.outputPartitioning == SinglePartition ||
          e.outputPartitioning.numPartitions == 1 =>
        !boundedSubtree(e.child)
      case _ => false
    }
    assert(tripped, "detector failed to flag a global no-partitionBy window")
  }
}
