package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.IndexAdvisor
import graft.sources.Tables

/** Round-14 batch: the monitoring→maintenance doctrine closed on the
  * PIPELINE itself and on the arms the machinery still skipped — the
  * ingest pipeline's frozen DSIR model gets a feature-churn trigger and
  * a measured keep/refresh/full-retrain decision (q352); the token
  * index gets its drift response (q353); the append-only packed layout
  * gets waste accounting + tail compaction (q354); the hybrid node's
  * lexical arm gets a budgeted (impact-pruned) rung (q355); and the
  * multi-vector family competes under the unified byte budgets (q356).
  */
object Round14 {

  private def t(s: SparkSession, dir: String, n: String) =
    Tables.load(s, dir, n)

  // ---- shared DSIR oracle generators (the q350 chain, prefix- and
  // source-parameterized so the drift worlds instantiate per-corpus
  // chains — the stitchedEdgesSql convention on the pipeline) ----------

  /** The q350 text normalizer + whitespace split as a SQL list expr. */
  private[queries] val DsirSplitTl: String =
    """string_split(trim(regexp_replace(regexp_replace(
        lower(text), '[^a-z ]', ' ', 'g'), ' +', ' ', 'g')), ' ')"""

  /** DSIR bigram-feature CTEs of a docs CTE (doc_id, lang, text).
    * Emits `<p>tk`, `<p>dp`, `<p>fh` (doc_id, lang, f). */
  private[queries] def dsirFeatSql(docs: String, p: String): String =
    s"""${p}tk AS (SELECT doc_id, lang, $DsirSplitTl AS tl FROM $docs),
      ${p}dp AS MATERIALIZED (SELECT doc_id, lang, tl[p] AS w1, tl[p+1] AS w2
        FROM (SELECT doc_id, lang, tl, unnest(range(1, len(tl))) AS p FROM ${p}tk)),
      ${p}fh AS MATERIALIZED (SELECT doc_id, lang,
          CAST(((${Round11b.wordHmSql("w1")} % 65521) * 65521
            + ${Round11b.wordHmSql("w2")} % 65521) % ${Round11b.DsirBuckets} AS BIGINT) AS f
        FROM ${p}dp)"""

  /** DSIR model build from a features CTE: per-feature Laplace counts,
    * fixed-point ln table, weights and the corpus constant. Emits
    * `<m>ct`..`<m>nv`, `<m>ln`, `<m>wt` (f, dlf), `<m>kk` (kk). */
  private[queries] def dsirModelSql(srcFh: String, m: String): String =
    s"""${m}ct AS (SELECT f, COUNT(*) AS tc FROM $srcFh WHERE lang = 'en' GROUP BY 1),
      ${m}cr AS (SELECT f, COUNT(*) AS rcnt FROM $srcFh GROUP BY 1),
      ${m}ntr AS (SELECT SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ntl,
          COUNT(*) AS nrl FROM $srcFh),
      ${m}cc AS (SELECT ${m}cr.f, CAST(COALESCE(${m}ct.tc, 0) + 1 AS BIGINT) AS ctf,
          CAST(${m}cr.rcnt + 1 AS BIGINT) AS crf
        FROM ${m}cr LEFT JOIN ${m}ct USING (f)),
      ${m}nv AS (SELECT ctf AS n FROM ${m}cc UNION SELECT crf FROM ${m}cc
        UNION SELECT ntl + ${Round11b.DsirBuckets} FROM ${m}ntr
        UNION SELECT nrl + ${Round11b.DsirBuckets} FROM ${m}ntr),
      ${graft.operators.FixedPoint.lnFxSql(s"${m}nv", s"${m}ln")},
      ${m}wt AS MATERIALIZED (SELECT ${m}cc.f, lt.ln_fx - lr.ln_fx AS dlf
        FROM ${m}cc JOIN ${m}ln lt ON ${m}cc.ctf = lt.n
        JOIN ${m}ln lr ON ${m}cc.crf = lr.n),
      ${m}kk AS (SELECT
          (SELECT ln_fx FROM ${m}ln WHERE n = (SELECT ntl + ${Round11b.DsirBuckets} FROM ${m}ntr))
        - (SELECT ln_fx FROM ${m}ln WHERE n = (SELECT nrl + ${Round11b.DsirBuckets} FROM ${m}ntr)) AS kk)"""

  /** Score a features CTE against model `<m>`: emits `<out>` (doc_id,
    * w_fx) — features the model never saw drop out of the inner join
    * (the q350 documented rule). */
  private[queries] def dsirScoreSql(qfh: String, m: String,
      out: String): String =
    s"""$out AS (SELECT $qfh.doc_id,
        CAST(SUM(${m}wt.dlf) - COUNT(*) * (SELECT kk FROM ${m}kk) AS BIGINT) AS w_fx
      FROM $qfh JOIN ${m}wt ON $qfh.f = ${m}wt.f GROUP BY 1)"""

  /** Top-quarter selection + threshold of a training-doc CTE under a
    * scored CTE (q327's rule, unscored docs at w_fx = 0). Emits
    * `<p>ad`, `<p>sel` (doc_id, w_fx), `<p>theta` (theta). */
  private[queries] def dsirSelThetaSql(docs: String, scored: String,
      p: String): String =
    s"""${p}ad AS (SELECT d.doc_id, CAST(COALESCE(s.w_fx, 0) AS BIGINT) AS w_fx
        FROM $docs d LEFT JOIN $scored s USING (doc_id)),
      ${p}sel AS MATERIALIZED (SELECT doc_id, w_fx FROM (
        SELECT doc_id, w_fx, row_number() OVER (ORDER BY w_fx DESC, doc_id) AS rnk,
          (SELECT COUNT(*) FROM ${p}ad) AS ndd FROM ${p}ad) WHERE rnk <= ndd // 4),
      ${p}theta AS (SELECT MIN(w_fx) AS theta FROM ${p}sel)"""

  // ---- q352: drift-triggered refresh of the pipeline's frozen model ----

  /** The deterministic drift world — a Caesar shift of every lowercase
    * letter (the stand-in for an upstream text-normalizer/tokenizer
    * change, the q341/q349 'inject' convention on TEXT): every bigram
    * of every word changes, tokenization and token counts are
    * untouched (letters map to letters), and the transform replays
    * exactly in both engines (char-map translate). */
  private[graft] val ShiftFrom = "abcdefghijklmnopqrstuvwxyz"
  private[graft] val ShiftTo = "bcdefghijklmnopqrstuvwxyza"
  private[queries] val ShiftSql =
    s"translate(text, '$ShiftFrom', '$ShiftTo')"

  val defs: Map[String, QueryDef] = Map(

    // ---- drift-triggered refresh for the ingest pipeline's model --------
    // q350 scores arriving docs against the frozen base DSIR model
    // FOREVER; the repo's doctrine (q341 scan, q349 graph) is
    // monitoring → maintenance, and the pipeline was the one loop
    // without it. The trigger is FEATURE CHURN — the fraction of the
    // arriving slice's feature instances the frozen weight table has
    // never seen, a statistic the q350 scorer's own inner join already
    // computes the complement of (the dropped rows ARE the unseen
    // features) — exact BIGINT, one broadcast-join scan of the slice.
    // DuckDB sweep (both SFs, BEFORE wiring): same-distribution slice
    // reads 0.000/0.000, the drifted slice 0.795/0.801 — the 2·unseen
    // >= total threshold separates with margin. The measured QUALITY
    // axis is RATE CONTROL — the selection stage's acceptance rate is
    // its operational contract (the q331 mix budgets downstream are
    // sized to the top-quarter design rate): under drift the stale
    // theta passes ~everything (unseen features drop out, scores
    // collapse toward 0 > the negative base theta) — swept 1.000/0.912
    // vs the 0.25 design; retraining on base+slice only half-restores
    // (0.440/0.638 — the slice's small-sample weights over-score their
    // own vocabulary); FULL re-observation (re-featurize the base
    // under the new normalizer — available exactly because this drift
    // class is an upstream processing change) restores the design rate
    // EXACTLY (0.240/0.248 = the same-world rate). The decision —
    // advisePipelineDrift — replays in BIGINT: keep on low churn, else
    // full-retrain only when its |rate − design| miss beats refresh's
    // by > 5 rate-points (it does, decisively, at both SFs — the
    // honest negative: slice-refresh CANNOT restore rate control
    // here). Models/thetas are fixture artifacts; live per-pass work
    // is two slice-feature scans + four slice scorings.
    "q352_llm_pipeline_drift_refresh" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"))
        val base = docs.filter(expr(
          s"(doc_id * 2654435761) % 10 <> 0"))
        val arrSame = docs.filter(expr(
          s"(doc_id * 2654435761) % 10 = 0"))
        def shifted(d: DataFrame): DataFrame = d.select(col("doc_id"),
          col("lang"), translate(col("text"), ShiftFrom, ShiftTo).as("text"))
        val arrShift = shifted(arrSame)
        // the frozen model: q350's own standing artifacts, byte-shared
        val (wt, kkA, sel, _) = Round13.pipeBaseState(s, dir)
        val kk = kkA.head().getLong(0)
        val theta = sel.agg(min("w_fx")).head().getLong(0)
        val nArr = arrSame.count()
        // the trigger: arriving feature instances unseen by the frozen
        // weight table (exact BIGINT, one slice scan per world)
        def churnOf(arr: DataFrame): (Long, Long) = {
          val r = Round13.pipeFeats(arr)
            .join(broadcast(wt.select(col("f"), lit(1).as("seen"))),
              Seq("f"), "left")
            .agg(sum(when(col("seen").isNull, 1L).otherwise(0L)),
              count(lit(1))).head()
          (r.getLong(0), r.getLong(1))
        }
        val (unS, totS) = churnOf(arrSame)
        val (unH, totH) = churnOf(arrShift)
        // pin the scenario branches (q320/q341 convention)
        require(2L * unS < totS,
          s"the same-distribution slice must stay below the churn " +
            s"threshold ($unS of $totS instances unseen)")
        require(2L * unH >= totH,
          s"the drifted slice must fire the churn threshold " +
            s"($unH of $totH instances unseen)")
        // selection counts per (world, model)
        def nSel(arr: DataFrame, w: DataFrame, k: Long, th: Long): Long =
          Round13.dsirScore(Round13.pipeFeats(arr), w, k)
            .filter(col("w_fx") > lit(th)).count()
        val nSameStale = nSel(arrSame, wt, kk, theta)
        val nShiftStale = nSel(arrShift, wt, kk, theta)
        // refreshed model: retrained on base(original) + arrived(shift)
        // — the cheap warm option (the pipeline has observed exactly
        // this data); theta re-derived by the same top-quarter rule
        // over its own training corpus
        def trainArt(label: String, trainDocs: => DataFrame):
            (DataFrame, Long, Long) = {
          val fcnt = graft.util.FixtureArtifact.parquet(s, dir,
            "documents.parquet", s"pipe_drift_${label}_fcnt")(
            Round13.dsirFcnt(Round13.pipeFeats(trainDocs)))
          val w = graft.util.FixtureArtifact.parquet(s, dir,
            "documents.parquet", s"pipe_drift_${label}_wt")(
            Round13.dsirWtOf(fcnt))
          val kkL = graft.util.FixtureArtifact.parquet(s, dir,
            "documents.parquet", s"pipe_drift_${label}_kk")(
            Round13.dsirKkOf(fcnt)).head().getLong(0)
          val selA = graft.util.FixtureArtifact.parquet(s, dir,
            "documents.parquet", s"pipe_drift_${label}_sel")(
            Round13.dsirTopQuarter(trainDocs,
              Round13.dsirScore(Round13.pipeFeats(trainDocs), w, kkL)))
          (w, kkL, selA.agg(min("w_fx")).head().getLong(0))
        }
        val (rWt, rKk, rTheta) =
          trainArt("ref", base.unionByName(arrShift))
        val (fWt, fKk, fTheta) =
          trainArt("full", shifted(base).unionByName(arrShift))
        val nShiftRef = nSel(arrShift, rWt, rKk, rTheta)
        val nShiftFull = nSel(arrShift, fWt, fKk, fTheta)
        // rate deviations from the top-quarter design rate, in exact
        // 4·count units (dev/nArr = 4·|rate − 0.25|)
        def dev(n: Long): Long = math.abs(4L * n - nArr)
        val decSame = IndexAdvisor.advisePipelineDrift(unS, totS,
          dev(nShiftRef), dev(nShiftFull), nArr)
        val decShift = IndexAdvisor.advisePipelineDrift(unH, totH,
          dev(nShiftRef), dev(nShiftFull), nArr)
        def code(d: String): Long = d match {
          case "keep" => 0L; case "refresh" => 1L; case _ => 2L }
        import s.implicits._
        Seq(
          ("same", "fchurn", unS, totS,
            unS.toDouble / totS),
          ("shift", "fchurn", unH, totH,
            unH.toDouble / totH),
          ("same", "decide", code(decSame), nArr, 0.0),
          ("shift", "decide", code(decShift), nArr,
            (dev(nShiftRef) - dev(nShiftFull)).toDouble / nArr),
          ("same", "kept", nSameStale, nArr,
            nSameStale.toDouble / nArr),
          ("shift", "stale", nShiftStale, nArr,
            nShiftStale.toDouble / nArr),
          ("shift", "refreshed", nShiftRef, nArr,
            nShiftRef.toDouble / nArr),
          ("shift", "fullretrain", nShiftFull, nArr,
            nShiftFull.toDouble / nArr))
          .toDF("sel", "dial", "n_hits", "n_tot", "frac")
          .orderBy("sel", "dial")
      },
      Some(s"""WITH bdocs AS MATERIALIZED (SELECT doc_id, lang, text
        FROM documents WHERE ${Round13.PipeBasePred}),
      asame AS MATERIALIZED (SELECT doc_id, lang, text
        FROM documents WHERE ${Round13.PipeStreamPred}),
      ashift AS MATERIALIZED (SELECT doc_id, lang, $ShiftSql AS text
        FROM documents WHERE ${Round13.PipeStreamPred}),
      bshift AS MATERIALIZED (SELECT doc_id, lang, $ShiftSql AS text
        FROM documents WHERE ${Round13.PipeBasePred}),
      ${dsirFeatSql("bdocs", "b")},
      ${dsirFeatSql("asame", "s")},
      ${dsirFeatSql("ashift", "h")},
      ${dsirFeatSql("bshift", "w")},
      ${dsirModelSql("bfh", "mb")},
      rfh AS (SELECT * FROM bfh UNION ALL SELECT * FROM hfh),
      ${dsirModelSql("rfh", "mr")},
      ffh AS (SELECT * FROM wfh UNION ALL SELECT * FROM hfh),
      ${dsirModelSql("ffh", "mf")},
      chs AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
          CAST(SUM(CASE WHEN mbwt.f IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unseen
        FROM sfh LEFT JOIN mbwt ON sfh.f = mbwt.f),
      chh AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
          CAST(SUM(CASE WHEN mbwt.f IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unseen
        FROM hfh LEFT JOIN mbwt ON hfh.f = mbwt.f),
      ${dsirScoreSql("bfh", "mb", "bsc")},
      ${dsirSelThetaSql("bdocs", "bsc", "tb")},
      ${dsirScoreSql("sfh", "mb", "ssc")},
      ${dsirScoreSql("hfh", "mb", "hsc")},
      nss AS (SELECT COUNT(*) AS n FROM ssc
        WHERE w_fx > (SELECT theta FROM tbtheta)),
      nhs AS (SELECT COUNT(*) AS n FROM hsc
        WHERE w_fx > (SELECT theta FROM tbtheta)),
      rdocs AS (SELECT doc_id FROM bdocs UNION ALL SELECT doc_id FROM ashift),
      ${dsirScoreSql("rfh", "mr", "rsc")},
      ${dsirSelThetaSql("rdocs", "rsc", "tr")},
      ${dsirScoreSql("hfh", "mr", "hr")},
      nhr AS (SELECT COUNT(*) AS n FROM hr
        WHERE w_fx > (SELECT theta FROM trtheta)),
      fdocs AS (SELECT doc_id FROM bshift UNION ALL SELECT doc_id FROM ashift),
      ${dsirScoreSql("ffh", "mf", "fsc")},
      ${dsirSelThetaSql("fdocs", "fsc", "tf")},
      ${dsirScoreSql("hfh", "mf", "hf")},
      nhf AS (SELECT COUNT(*) AS n FROM hf
        WHERE w_fx > (SELECT theta FROM tftheta)),
      na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM asame),
      devs AS (SELECT
          CAST(abs(4 * (SELECT n FROM nhr) - (SELECT n FROM na)) AS BIGINT) AS dref,
          CAST(abs(4 * (SELECT n FROM nhf) - (SELECT n FROM na)) AS BIGINT) AS dfull)
      SELECT * FROM (
        SELECT 'same' AS sel, 'fchurn' AS dial,
          CAST((SELECT unseen FROM chs) AS BIGINT) AS n_hits,
          CAST((SELECT total FROM chs) AS BIGINT) AS n_tot,
          CAST((SELECT unseen FROM chs) AS DOUBLE) / (SELECT total FROM chs) AS frac
        UNION ALL
        SELECT 'shift', 'fchurn', (SELECT unseen FROM chh),
          (SELECT total FROM chh),
          CAST((SELECT unseen FROM chh) AS DOUBLE) / (SELECT total FROM chh)
        UNION ALL
        SELECT 'same', 'decide',
          CAST(CASE WHEN 2 * (SELECT unseen FROM chs) < (SELECT total FROM chs)
            THEN 0 ELSE CASE WHEN 5 * ((SELECT dref FROM devs) - (SELECT dfull FROM devs))
              > (SELECT n FROM na) THEN 2 ELSE 1 END END AS BIGINT),
          (SELECT n FROM na), 0.0
        UNION ALL
        SELECT 'shift', 'decide',
          CAST(CASE WHEN 2 * (SELECT unseen FROM chh) < (SELECT total FROM chh)
            THEN 0 ELSE CASE WHEN 5 * ((SELECT dref FROM devs) - (SELECT dfull FROM devs))
              > (SELECT n FROM na) THEN 2 ELSE 1 END END AS BIGINT),
          (SELECT n FROM na),
          CAST((SELECT dref FROM devs) - (SELECT dfull FROM devs) AS DOUBLE)
            / (SELECT n FROM na)
        UNION ALL
        SELECT 'same', 'kept', (SELECT n FROM nss), (SELECT n FROM na),
          CAST((SELECT n FROM nss) AS DOUBLE) / (SELECT n FROM na)
        UNION ALL
        SELECT 'shift', 'stale', (SELECT n FROM nhs), (SELECT n FROM na),
          CAST((SELECT n FROM nhs) AS DOUBLE) / (SELECT n FROM na)
        UNION ALL
        SELECT 'shift', 'refreshed', (SELECT n FROM nhr), (SELECT n FROM na),
          CAST((SELECT n FROM nhr) AS DOUBLE) / (SELECT n FROM na)
        UNION ALL
        SELECT 'shift', 'fullretrain', (SELECT n FROM nhf), (SELECT n FROM na),
          CAST((SELECT n FROM nhf) AS DOUBLE) / (SELECT n FROM na))
      ORDER BY sel, dial"""))
  )
}
