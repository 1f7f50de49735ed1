package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Ranks, Similarity}

/** Injection bookkeeping must live on a top-level object: the closure
  * ships to tasks, and in local mode the object is JVM-shared, so the
  * suite can assert the chaos actually fired.
  */
object RetryChaos {
  val injected = new AtomicInteger(0)

  /** Re-throws on each partition's FIRST attempt for every `everyK`-th
    * partition — a retried task (attemptNumber >= 1) passes the rows
    * through untouched. Placed at a pipeline's source, this forces
    * Spark to re-execute downstream lineage for the failed partitions,
    * which is exactly what a lost executor does at 100 TB.
    */
  def partitions(df: DataFrame, everyK: Int = 3): DataFrame =
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber == 0 && tc.partitionId % everyK == 0) {
        injected.incrementAndGet()
        throw new RuntimeException(
          s"retry-determinism chaos: injected failure, partition ${tc.partitionId}")
      }
      it
    }(Encoders.row(df.schema))
}

/** Kills the first attempt of every other task while attached —
  * mid-stage re-execution (shuffle writes included) without touching
  * the query's plan. Kill, not fail: killed attempts never count
  * toward spark.task.maxFailures.
  */
class FirstAttemptKiller(spark: SparkSession) extends SparkListener {
  val killed = new AtomicInteger(0)
  override def onTaskStart(t: SparkListenerTaskStart): Unit = {
    val i = t.taskInfo
    if (i.attemptNumber == 0 && i.index % 2 == 0)
      try {
        if (spark.sparkContext.killTaskAttempt(i.taskId, interruptThread = false,
            reason = "retry-determinism chaos"))
          killed.incrementAndGet()
      } catch { case _: Throwable => () } // already finished — fine
  }
}

/** VERDICT r5 #1: task retries are routine at 100 TB, and several
  * operators carry retry-sensitive machinery (persisted iterative
  * frontiers with localCheckpoint lineage truncation, float-fold
  * recipes, window recompute). Prove bit-identical output under task
  * re-execution, two ways:
  *
  *  (a) source-level chaos — a mapPartitions at the INPUT that throws
  *      on first attempts (deterministic injection; downstream lineage
  *      recompute), per operator family called directly;
  *  (b) a listener that kills first attempts while full catalog
  *      queries run (mid-stage kill + re-execution on the real plans).
  *
  * Needs its own session: local-mode retries exist ONLY via the master
  * string `local[N, maxFailures]` (spark.task.maxFailures is ignored by
  * LocalSchedulerBackend), so the shared local[4] session can never
  * retry — it fails the job on the first task failure.
  */
class RetryDeterminismSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    // the JVM-wide shared session (if a prior suite made one) is
    // local[4] = zero retries; replace it for this suite's lifetime
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[8, 4]")
      .appName("retry-determinism")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit =
    // later suites lazily getOrCreate their local[4] session afresh
    if (spark != null) spark.stop()

  private def tbl(name: String): DataFrame =
    spark.read.parquet(s"$sf/$name.parquet")

  /** Order-insensitive exact fingerprint (rows stringified, sorted). */
  private def fp(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def assertRetryDeterministic(name: String)(build: DataFrame => DataFrame,
      input: DataFrame): Unit = {
    val baseline = fp(build(input))
    val before = RetryChaos.injected.get()
    val chaotic = fp(build(RetryChaos.partitions(input.repartition(6))))
    assert(RetryChaos.injected.get() > before, s"$name: chaos never fired")
    assert(chaotic == baseline, s"$name: output changed under task retry")
  }

  test("hash agg (decimal-backed float sums) is retry-deterministic") {
    assertRetryDeterministic("agg")(
      df => df.groupBy("l_returnflag", "l_linestatus")
        .agg(graft.util.Det.dsum(col("l_extendedprice")).as("s"),
          count(lit(1)).as("n")),
      tbl("lineitem"))
  }

  test("shuffle join + agg is retry-deterministic") {
    val orders = tbl("orders")
    assertRetryDeterministic("join")(
      li => li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q")),
      tbl("lineitem"))
  }

  test("running window sum is retry-deterministic") {
    // FINDING (first run of this spec): ordering by l_linenumber alone
    // is NOT total — the fixture carries duplicate (l_orderkey,
    // l_linenumber) rows, and a running sum over tied rows came back
    // DIFFERENT under retry (tie order is partitioning/attempt-
    // dependent). That is precisely the CLAUDE.md unique-tie-break rule;
    // the catalog's window queries all sort totally. Here the summed
    // operand joins the sort key, making tied rows bit-identical and
    // the prefix sums order-insensitive.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_orderkey")
      .orderBy("l_linenumber", "l_quantity")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    assertRetryDeterministic("window")(
      li => li.select(col("l_orderkey"), col("l_linenumber"),
        sum("l_quantity").over(w).as("run")),
      tbl("lineitem"))
  }

  test("iterative connected components (localCheckpoint frontiers) is retry-deterministic") {
    // o_custkey pairs as an arbitrary-but-real edge set; components'
    // localCheckpoint(eager) lineage truncation is the retry-sensitive
    // part under test (label-prop and star variants both)
    val edges = tbl("orders")
      .select((col("o_orderkey") % 500).as("da"), (col("o_custkey") % 500).as("db"))
      .filter(col("da") =!= col("db")).distinct()
    assertRetryDeterministic("components")(
      e => Dedup.components(e), edges)
    assertRetryDeterministic("componentsStar")(
      e => Dedup.componentsStar(e), edges)
  }

  test("span-union interval coverage is retry-deterministic") {
    assertRetryDeterministic("spanUnion")(
      df => Dedup.spanUnionCount(df, "k", "pos", span = 8),
      tbl("lineitem").select((col("l_orderkey") % 97).as("k"),
        col("l_linenumber").cast("long").as("pos")))
  }

  test("range-binned prefix sums (Ranks.cumSumsBy) are retry-deterministic") {
    assertRetryDeterministic("cumSumsBy")(
      df => Ranks.cumSumsBy(df, Seq("g"), "v", Seq("c")),
      tbl("lineitem").select((col("l_suppkey") % 7).as("g"),
        col("l_quantity").cast("long").as("v"), lit(1L).as("c")))
  }

  test("two-phase windows (rankedBinned / lagLeadBinned / ntileBinned) are retry-deterministic") {
    // the round-7 window family: hybrid hot/cold dispatch + bin/offset
    // composition must survive task re-execution bit-identically (the
    // thresholds force BOTH paths; ordCols carry a unique tie-break —
    // the rule this very suite's window test discovered)
    // the fixture carries full-duplicate rows (CLAUDE.md), so the
    // unique tie-break is a whole-row hash: identical rows may swap
    // freely (bit-identical output either way), DISTINCT rows are
    // totally ordered
    val in = tbl("lineitem").select((col("l_suppkey") % 5).as("g"),
      col("l_partkey").as("o"),
      xxhash64(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity")).as("i"),
      col("l_quantity").cast("long").as("v"))
    assertRetryDeterministic("rankedBinned")(
      df => Ranks.rankedBinned(df, "g", "o",
        Seq(col("o"), col("i")), bins = 4, hotThreshold = 50L), in)
    assertRetryDeterministic("lagLeadBinned")(
      df => Ranks.lagLeadBinned(df, "g", "o",
        Seq(col("o"), col("i")), Seq("v"), bins = 4, hotThreshold = 50L), in)
    assertRetryDeterministic("ntileBinned")(
      df => Ranks.ntileBinned(df, "g", "o",
        Seq(col("o"), col("i")), n = 4, bins = 4, hotThreshold = 50L), in)
  }

  test("simhash + cosine top-k (per-row float folds) are retry-deterministic") {
    assertRetryDeterministic("simHash")(
      df => df.select(col("doc_id"),
        Dedup.simHash(graft.functions.TextFunctions.tokens(col("text"))).as("h")),
      tbl("documents"))
    val emb = tbl("embeddings")
    val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    assertRetryDeterministic("cosineTopK")(
      q => Similarity.cosineTopK(
        q.filter(col("vec_id") < 5).select(col("vec_id").as("qid"),
          col("embedding").as("qe")), corpus, k = 5),
      emb)
  }

  test("catalog sweep under first-attempt task kills is bit-identical") {
    // one query per remaining family on the REAL plans: flagship agg,
    // shuffle join, running window, CC groups, seq packing, verified
    // minhash, dup-span audit, k-means, LSH ANN
    val names = Seq("q01_agg_pricing_summary", "q05_join_inner",
      "q23_win_running_sum", "q91_llm_neardup_groups_star",
      "q103_seq_packing", "q177_llm_minhash_verified",
      "q215_llm_dup_span_coverage", "q225_llm_kmeans_lloyd",
      "q47_llm_ann_lsh",
      // round-8 advisor-driven family: the 1-row stats collect and the
      // advised-centroid build must survive first-attempt kills too
      "q294_llm_ann_ivf_advised", "q299_llm_curation_advised",
      // round-9 compression family: rep-level residual encode +
      // per-(rep, subspace) argmin + ADC pool cut must be attempt-
      // invariant (all int64 arithmetic with total-order tie-breaks)
      "q309_llm_ann_ivfpq")
    val baselines = names.map(n => n -> fp(SparkEntry.queries(n)(spark, sf))).toMap
    val killer = new FirstAttemptKiller(spark)
    spark.sparkContext.addSparkListener(killer)
    try {
      names.foreach { n =>
        val again = fp(SparkEntry.queries(n)(spark, sf))
        assert(again == baselines(n), s"$n: output changed under task kills")
      }
    } finally spark.sparkContext.removeSparkListener(killer)
    // aggregate bite check: per-query kill counts are racy (a fast task
    // can finish before the kill lands) but across 9 queries the
    // sweep must have killed SOMETHING or it proved nothing
    assert(killer.killed.get() > 0, "kill sweep never landed a kill")
  }
}
