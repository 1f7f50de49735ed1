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

  // ---- q353: token-index drift oracle generators (the q349 world
  // convention on the TOKEN index; all parameterized by world table) ----

  private val Dim64 = "(SELECT unnest(range(1, 65)) AS i) i"

  /** Exact maxsim of world `tb` (doc, tid, e): emits `<p>ms` (qd, cd,
    * score — exact BIGINT micro-cos maxsim) and `<p>exr` (top-5). */
  private[queries] def mvWorldMsSql(tb: String, p: String): String =
    s"""${p}mpc AS MATERIALIZED (SELECT q.doc AS qd, c.doc AS cd, q.tid AS qt,
        CAST(round(SUM(CAST(q.e[i.i] AS DOUBLE) * CAST(c.e[i.i] AS DOUBLE))
          / (sqrt(ANY_VALUE(list_sum(list_transform(q.e, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))
           * sqrt(ANY_VALUE(list_sum(list_transform(c.e, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))))
          * 1000000) AS BIGINT) AS mc
      FROM (SELECT * FROM $tb WHERE doc < 10) q, $tb c, $Dim64
      WHERE c.doc <> q.doc GROUP BY 1, 2, 3, c.tid),
      ${p}ms AS MATERIALIZED (SELECT qd, cd, CAST(SUM(mx) AS BIGINT) AS score FROM (
        SELECT qd, cd, qt, MAX(mc) AS mx FROM ${p}mpc GROUP BY 1, 2, 3) GROUP BY 1, 2),
      ${p}exr AS MATERIALIZED (SELECT qd, cd FROM (SELECT qd, cd,
        row_number() OVER (PARTITION BY qd ORDER BY score DESC, cd) AS rnk
      FROM ${p}ms) WHERE rnk <= 5)"""

  /** World centroid vectors at the STANDING centroid token ids (`cids`
    * CTE, tid column): the centroid SET survives a re-embedding, its
    * vectors are a lookup. Emits `<p>cent`. */
  private def mvCentsSql(tb: String, p: String): String =
    s"""${p}cent AS MATERIALIZED (SELECT c.tid AS centroid_id, t.e AS centroid
      FROM cids c JOIN $tb t ON c.tid = t.tid)"""

  /** Rounded-dot rank assignment of world `tb` tokens to `<centP>cent`
    * (r <= keepE kept; slice r = 1 for cells, r <= np for probes). */
  private def mvAssignSql(tb: String, centP: String, out: String,
      keepE: String): String =
    s"""$out AS MATERIALIZED (SELECT tid, centroid_id, r FROM (SELECT tid, centroid_id,
        row_number() OVER (PARTITION BY tid ORDER BY d DESC, centroid_id) AS r
      FROM (SELECT t.tid, c.centroid_id,
          round(SUM(CAST(t.e[i.i] AS DOUBLE) * CAST(c.centroid[i.i] AS DOUBLE)), 6) AS d
        FROM $tb t, ${centP}cent c, $Dim64
        GROUP BY 1, 2)) WHERE r <= ($keepE))"""

  /** One PLAID serve of world `tb` from SUPPLIED assignments: probe
    * ranks `qa` (tid, centroid_id, r) sliced at npE, corpus cells `ca`
    * (tid, centroid_id), world codes `sq8`, exact rerank against the
    * world's `ms`. Emits `<p>annr` (qd, cd top-5). */
  private def mvServeFromSql(tb: String, qa: String, ca: String,
      sq8: String, ms: String, npE: String, m: Int, p: String): String =
    s"""${p}cd AS MATERIALIZED (SELECT DISTINCT q.doc AS qd, c.tid // 4 AS cd
      FROM $qa qa JOIN $tb q ON qa.tid = q.tid AND q.doc < 10
      JOIN $ca ca ON qa.centroid_id = ca.centroid_id
      JOIN $tb c ON ca.tid = c.tid
      WHERE qa.r <= ($npE) AND q.doc <> c.tid // 4),
      ${p}capx AS MATERIALIZED (SELECT x.qd, x.cd, q.tid AS qt,
          MAX(CAST(list_sum(list_transform(range(1, 65), i -> qs.qc[i] * cs.qc[i])) AS BIGINT)
            * cs.rc) AS amx
        FROM ${p}cd x JOIN $tb q ON q.doc = x.qd JOIN $tb c ON c.doc = x.cd
        JOIN $sq8 qs ON q.tid = qs.tid JOIN $sq8 cs ON c.tid = cs.tid
        GROUP BY 1, 2, 3),
      ${p}pool AS (SELECT qd, cd FROM (SELECT qd, cd,
          row_number() OVER (PARTITION BY qd ORDER BY ascore DESC, cd) AS pr
        FROM (SELECT qd, cd, CAST(SUM(amx) AS BIGINT) AS ascore
          FROM ${p}capx GROUP BY 1, 2)) WHERE pr <= $m),
      ${p}annr AS (SELECT qd, cd FROM (SELECT pl.qd, pl.cd,
          row_number() OVER (PARTITION BY pl.qd ORDER BY ms.score DESC, pl.cd) AS rnk
        FROM ${p}pool pl JOIN $ms ms ON pl.qd = ms.qd AND pl.cd = ms.cd)
      WHERE rnk <= 5)"""

  /** ONE warm Lloyd round over world `tb`'s quantized token coords,
    * seeded from the standing centroid tokens' world coords (the q341
    * q225 kernel at token level): emits `<p>ra1` (tid, centroid_id —
    * the recentered cells) and `<p>qa1` (query-token probe ranks by
    * int64 L2, r kept to nlist — sliced per serve). */
  private def mvLloydSql(tb: String, nlistE: String, p: String): String =
    s"""${p}cq AS MATERIALIZED (SELECT tid, i.i AS i,
        CAST(FLOOR(CAST(e[i.i] AS DOUBLE) * 1000000) AS BIGINT) AS x
      FROM $tb, $Dim64),
      ${p}ctq AS (SELECT c.tid AS ccid, q.i, q.x AS c
        FROM cids c JOIN ${p}cq q ON c.tid = q.tid),
      ${p}ld AS (SELECT cq.tid, c.ccid, SUM((cq.x - c.c) * (cq.x - c.c)) AS dist
        FROM ${p}cq cq JOIN ${p}ctq c USING (i) GROUP BY 1, 2),
      ${p}la AS (SELECT tid, ccid FROM (SELECT tid, ccid,
          row_number() OVER (PARTITION BY tid ORDER BY dist, ccid) AS rn
        FROM ${p}ld) WHERE rn = 1),
      ${p}c1 AS MATERIALIZED (SELECT la.ccid, cq.i,
          CAST(FLOOR(CAST(SUM(cq.x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
        FROM ${p}cq cq JOIN ${p}la la ON cq.tid = la.tid GROUP BY 1, 2),
      ${p}rd AS MATERIALIZED (SELECT cq.tid, c.ccid, SUM((cq.x - c.c) * (cq.x - c.c)) AS dist
        FROM ${p}cq cq JOIN ${p}c1 c USING (i) GROUP BY 1, 2),
      ${p}ra1 AS MATERIALIZED (SELECT tid, ccid AS centroid_id FROM (
        SELECT tid, ccid, row_number() OVER (PARTITION BY tid ORDER BY dist, ccid) AS rn
        FROM ${p}rd) WHERE rn = 1),
      ${p}qa1 AS MATERIALIZED (SELECT tid, centroid_id, r FROM (
        SELECT rd.tid, rd.ccid AS centroid_id,
          row_number() OVER (PARTITION BY rd.tid ORDER BY rd.dist, rd.ccid) AS r
        FROM ${p}rd rd WHERE rd.tid // 4 < 10) WHERE r <= ($nlistE))"""

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
      ORDER BY sel, dial""")),

    // ---- drift response for the TOKEN index ------------------------------
    // q349 closed the drift loop on the graph family; a re-embedding
    // also invalidates the multi-vector family's token cells (q346/
    // q348's standing artifacts). Trigger: ASSIGNMENT churn — tokens
    // whose rank-1 cell changed between the standing cells and the
    // new world's (one bounded nTok·nlist scan, exact BIGINT); the
    // SQ8 codes re-encode row-locally under EVERY response (no
    // codebook — the family's structural advantage, q341's lesson).
    // Same two worlds as q349 (reversal isometry / half-zero
    // collapse), same advised dials as q346. DuckDB sweep (both SFs,
    // BEFORE wiring): iso churn 0 and the kept-cells serve reads
    // exactly q346's standing recall (0.98/0.96 — the isometry proof
    // measured); trunc churn fires at 0.62/0.65 — yet at the ADVISED
    // np the stale cells serve 0.96/0.92 ≥ recentered 0.96/0.90: the
    // PLAID serve is drift-ROBUST (candidate generation is a UNION
    // over query tokens × probed cells; the m-pool exact rerank
    // absorbs cell noise) — the measured decision is KEEP, the honest
    // negative mirroring q349 where the same drift forces graph
    // repair. The cells DO bind at the np=1 screening rung: stale
    // 0.78 vs recentered 0.84 at sf0.1 — there adviseTokenDrift flips
    // to RECENTER (one warm Lloyd round, the q341 kernel at token
    // level) while sf0.01's 0.86/0.84 keeps — the decision flips by
    // integer admissibility across rung AND scale. Rebuild (fresh
    // dot-assignment) never beats recenter (0.84/0.84) — the
    // re-stitch-is-skippable law again. Live serves: the iso kept
    // serve and the decided trunc serve (stale cells at advised np);
    // contrast serves, assignments, codes, truths, Lloyd layout are
    // fixture artifacts.
    "q353_llm_maxsim_drift_response" -> QueryDef(
      (s, dir) => {
        graft.plans.NativeExpressions.register(s)
        import graft.operators.Similarity
        import graft.util.FixtureArtifact
        val (tok, cents, ca, _, nlist, np) = Round13.mvAdvisedSetup(s, dir)
        def truncOf(c: String) = expr(s"transform(sequence(1, 64), " +
          s"i -> IF(i <= 32, element_at($c, i), CAST(0.0 AS FLOAT)))")
        val toki = tok.select(col("doc"), col("tid"),
          reverse(col("e")).as("e"))
        val tokt = tok.select(col("doc"), col("tid"),
          truncOf("e").as("e"))
        val nTok = tok.count()
        val cidSet = cents.select(col("centroid_id").as("tid"))
        def centsOf(w: DataFrame) = broadcast(
          w.join(cidSet, Seq("tid"))
            .select(col("tid").as("centroid_id"), col("e").as("centroid")))
        val centsI = centsOf(toki); val centsT = centsOf(tokt)
        def assignArt(w: DataFrame, cs: DataFrame, label: String) =
          FixtureArtifact.parquet(s, dir, "embeddings.parquet",
            s"mvdrift_ca_${label}_n$nlist", params = Map("nlist" -> nlist))(
            Similarity.assignToCentroids(w.select("tid", "e"), "tid", "e",
              cs, nKeep = 1).select(col("tid"), col("centroid_id")))
        val caI = assignArt(toki, centsI, "gwi")
        val caT = assignArt(tokt, centsT, "gwt")
        def movedOf(caW: DataFrame): Long =
          ca.withColumnRenamed("centroid_id", "c0").join(caW, Seq("tid"))
            .filter(col("c0") =!= col("centroid_id")).count()
        val movedIso = movedOf(caI)
        val movedTr = movedOf(caT)
        require(2L * movedIso < nTok,
          s"the isometric world must stay below the assignment-churn " +
            s"threshold ($movedIso of $nTok tokens moved)")
        require(2L * movedTr >= nTok,
          s"the non-isometric world must fire the assignment-churn " +
            s"threshold ($movedTr of $nTok tokens moved)")
        def codesArt(w: DataFrame, label: String) =
          FixtureArtifact.parquet(s, dir, "embeddings.parquet",
            s"mvdrift_sq8_$label")(
            Similarity.sq8Codes(w.select("tid", "e"), "tid", "e"))
        val codesI = codesArt(toki, "gwi")
        val codesT = codesArt(tokt, "gwt")
        def qtokOf(w: DataFrame) = w.filter(col("doc") < 10)
          .select(col("doc").as("qd"), col("tid").as("qt"), col("e").as("qe"))
        def ctokOf(w: DataFrame) = w
          .select(col("doc").as("cd"), col("tid").as("ct"), col("e").as("ce"))
        // world exact maxsim truths (artifacts)
        def exactArt(w: DataFrame, label: String): DataFrame =
          FixtureArtifact.parquet(s, dir, "embeddings.parquet",
            s"mvdrift_ex5_$label") {
            val q = qtokOf(w).withColumn("qn", expr("sqrt(vec_dot(qe, qe))"))
            val c = w.select(col("doc").as("cd"), col("e").as("ce"))
              .withColumn("cn", expr("sqrt(vec_dot(ce, ce))"))
            val ms = c.join(broadcast(q), col("cd") =!= col("qd"))
              .select(col("qd"), col("cd"), col("qt"),
                round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn"))
                  * lit(1000000.0)).cast("long").as("mc"))
              .groupBy("qd", "cd", "qt").agg(max("mc").as("mx"))
              .groupBy("qd", "cd").agg(sum("mx").as("score"))
            val wx = org.apache.spark.sql.expressions.Window
              .partitionBy("qd").orderBy(col("score").desc, col("cd"))
            ms.withColumn("rnk", row_number().over(wx))
              .filter(col("rnk") <= 5).select("qd", "cd")
          }
        val exIso = exactArt(toki, "gwi")
        val exTr = exactArt(tokt, "gwt")
        // serves: cells × world; live = the iso kept serve and the
        // decided trunc serve (stale cells, advised np); the rest warm
        def serve(w: DataFrame, caX: DataFrame, codesX: DataFrame,
            csX: DataFrame, npd: Int, label: String,
            asArtifact: Boolean): DataFrame = {
          def run: DataFrame = Similarity.maxsimPlaidTopK(qtokOf(w),
            ctokOf(w), caX, codesX, csX, np = npd, m = 10, k = 5)
          if (asArtifact)
            FixtureArtifact.parquet(s, dir, "embeddings.parquet",
              s"mvdrift_${label}_np$npd",
              params = Map("np" -> npd.toLong, "m" -> 10L, "k" -> 5L))(run)
          else {
            val out = graft.util.Scratch.dir(s"q353_$label")
            run.write.mode("overwrite").parquet(out)
            s.read.parquet(out)
          }
        }
        val kept = serve(toki, ca, codesI, centsI, np.toInt, "kept",
          asArtifact = false)
        val keptNp1 = serve(toki, ca, codesI, centsI, 1, "kept",
          asArtifact = true)
        val stale = serve(tokt, ca, codesT, centsT, np.toInt, "stale",
          asArtifact = false)
        val staleNp1 = serve(tokt, ca, codesT, centsT, 1, "stale",
          asArtifact = true)
        val rebuilt = serve(tokt, caT, codesT, centsT, np.toInt, "reb",
          asArtifact = true)
        val rebuiltNp1 = serve(tokt, caT, codesT, centsT, 1, "reb",
          asArtifact = true)
        // recentered: one warm Lloyd round (the q341 kernel) over the
        // new-world token coords, seeded from the standing centroid
        // tokens' new coords; serves from the recentered assignments
        val ra1 = FixtureArtifact.parquet(s, dir, "embeddings.parquet",
          s"mvdrift_lloyd_ra1_gwt_n$nlist",
          params = Map("nlist" -> nlist)) {
          val corpusW = tokt.select(col("tid").as("cid"), col("e").as("ce"))
          val seed = Round12.quantC(
              tokt.join(cidSet, Seq("tid")).select(col("tid").as("cid"),
                col("e").as("ce")), "cid", "ce")
            .select(col("cid").as("ccid"), col("i"), col("x").as("c"))
          Round12.lloydWarmRetrain(corpusW, seed)._2
            .select(col("cid").as("tid"), col("ccid").as("centroid_id"))
        }
        val c1 = FixtureArtifact.parquet(s, dir, "embeddings.parquet",
          s"mvdrift_lloyd_c1_gwt_n$nlist",
          params = Map("nlist" -> nlist)) {
          val corpusW = tokt.select(col("tid").as("cid"), col("e").as("ce"))
          val seed = Round12.quantC(
              tokt.join(cidSet, Seq("tid")).select(col("tid").as("cid"),
                col("e").as("ce")), "cid", "ce")
            .select(col("cid").as("ccid"), col("i"), col("x").as("c"))
          Round12.lloydWarmRetrain(corpusW, seed)._1
        }
        def recServe(npd: Int): DataFrame =
          FixtureArtifact.parquet(s, dir, "embeddings.parquet",
            s"mvdrift_rec_np$npd",
            params = Map("np" -> npd.toLong, "m" -> 10L, "k" -> 5L)) {
            val qcq = Round12.quantC(tokt.filter(col("doc") < 10)
              .select(col("tid").as("cid"), col("e").as("ce")), "cid", "ce")
            val wq = org.apache.spark.sql.expressions.Window
              .partitionBy("cid").orderBy(col("dist"), col("ccid"))
            val qa = qcq.join(broadcast(c1), Seq("i"))
              .groupBy("cid", "ccid")
              .agg(sum((col("x") - col("c")) * (col("x") - col("c")))
                .as("dist"))
              .withColumn("r", row_number().over(wq))
              .filter(col("r") <= npd)
              .select(col("cid").as("qt"), col("ccid").as("centroid_id"))
            Similarity.maxsimPlaidTopKFrom(qtokOf(tokt), ctokOf(tokt),
              qa, ra1, codesT, m = 10, k = 5)
          }
        val rec = recServe(np.toInt)
        val recNp1 = recServe(1)
        // the decision at both rungs from measured hits (1-row scalars
        // over materialized serves — plan-choice class)
        val nq = exTr.select("qd").distinct().count()
        def hits(ann: DataFrame): Long =
          exTr.join(ann, Seq("qd", "cd")).count()
        val (stH, rcH, rbH) = (hits(stale), hits(rec), hits(rebuilt))
        val (stH1, rcH1, rbH1) =
          (hits(staleNp1), hits(recNp1), hits(rebuiltNp1))
        def code(d: String): Long = d match {
          case "keep" => 0L; case "recenter" => 1L; case _ => 2L }
        val decAdv = IndexAdvisor.adviseTokenDrift(movedTr, nTok,
          stH, rcH, rbH, nq)
        val decNp1 = IndexAdvisor.adviseTokenDrift(movedTr, nTok,
          stH1, rcH1, rbH1, nq)
        import s.implicits._
        val stats = Seq(
          ("iso", "tchurn", -1L, movedIso, movedIso.toDouble / nTok),
          ("trunc", "tchurn", -1L, movedTr, movedTr.toDouble / nTok),
          ("trunc", "decide_adv", -1L, code(decAdv),
            (rcH - stH).toDouble / (5.0 * nq)),
          ("trunc", "decide_np1", -1L, code(decNp1),
            (rcH1 - stH1).toDouble / (5.0 * nq)))
          .toDF("sel", "dial", "qd", "n_hits", "recall")
        stats
          .unionByName(Round13.mvTaggedRecall("iso", "kept", exIso, kept))
          .unionByName(Round13.mvTaggedRecall("iso", "kept_np1", exIso,
            keptNp1))
          .unionByName(Round13.mvTaggedRecall("trunc", "stale", exTr, stale))
          .unionByName(Round13.mvTaggedRecall("trunc", "stale_np1", exTr,
            staleNp1))
          .unionByName(Round13.mvTaggedRecall("trunc", "recentered", exTr,
            rec))
          .unionByName(Round13.mvTaggedRecall("trunc", "recentered_np1",
            exTr, recNp1))
          .unionByName(Round13.mvTaggedRecall("trunc", "rebuilt", exTr,
            rebuilt))
          .unionByName(Round13.mvTaggedRecall("trunc", "rebuilt_np1", exTr,
            rebuiltNp1))
          .orderBy("sel", "dial", "qd")
      },
      Some(s"""WITH tok AS MATERIALIZED (SELECT vec_id // 4 AS doc,
        vec_id AS tid, embedding AS e FROM embeddings),
      toki AS MATERIALIZED (SELECT doc, tid, list_reverse(e) AS e FROM tok),
      tokt AS MATERIALIZED (SELECT doc, tid, list_transform(range(1, 65),
          i -> CASE WHEN i <= 32 THEN e[i] ELSE CAST(0.0 AS FLOAT) END) AS e
        FROM tok),
      ${Round13.mvDialsSql("tok", measNp = 2)},
      cids AS MATERIALIZED (SELECT tid FROM (SELECT tid,
          row_number() OVER (ORDER BY tid) AS rn FROM tok)
        WHERE rn <= (SELECT nlist FROM mvnl)),
      ${mvCentsSql("tok", "b")},
      ${mvAssignSql("tok", "b", "bca0", "1")},
      bca AS (SELECT tid, centroid_id FROM bca0),
      ${mvCentsSql("toki", "wi")},
      ${mvCentsSql("tokt", "wt")},
      ${mvAssignSql("toki", "wi", "ica0", "1")},
      ${mvAssignSql("tokt", "wt", "tca0", "1")},
      mvi AS (SELECT COUNT(*) AS moved FROM bca JOIN ica0
        ON bca.tid = ica0.tid AND bca.centroid_id <> ica0.centroid_id),
      mvt AS (SELECT COUNT(*) AS moved FROM bca JOIN tca0
        ON bca.tid = tca0.tid AND bca.centroid_id <> tca0.centroid_id),
      nt AS (SELECT COUNT(*) AS n FROM tok),
      ${mvWorldMsSql("toki", "i")},
      ${Round13.mvSq8Sql("toki", "isq8")},
      ${mvWorldMsSql("tokt", "t")},
      ${Round13.mvSq8Sql("tokt", "tsq8")},
      ${mvAssignSql("toki", "wi", "iqa", "(SELECT nlist FROM mvnl)")},
      ${mvAssignSql("tokt", "wt", "tqa", "(SELECT nlist FROM mvnl)")},
      tca AS (SELECT tid, centroid_id FROM tca0),
      ${mvServeFromSql("toki", "iqa", "bca", "isq8", "ims",
        "(SELECT np FROM mvnp)", 10, "ki")},
      ${mvServeFromSql("toki", "iqa", "bca", "isq8", "ims", "1", 10, "k1")},
      ${mvServeFromSql("tokt", "tqa", "bca", "tsq8", "tms",
        "(SELECT np FROM mvnp)", 10, "st")},
      ${mvServeFromSql("tokt", "tqa", "bca", "tsq8", "tms", "1", 10, "s1")},
      ${mvServeFromSql("tokt", "tqa", "tca", "tsq8", "tms",
        "(SELECT np FROM mvnp)", 10, "rb")},
      ${mvServeFromSql("tokt", "tqa", "tca", "tsq8", "tms", "1", 10, "r1")},
      ${mvLloydSql("tokt", "(SELECT nlist FROM mvnl)", "ll")},
      ${mvServeFromSql("tokt", "llqa1", "llra1", "tsq8", "tms",
        "(SELECT np FROM mvnp)", 10, "rc")},
      ${mvServeFromSql("tokt", "llqa1", "llra1", "tsq8", "tms", "1",
        10, "c1")},
      qn AS (SELECT COUNT(DISTINCT qd) AS nq FROM texr),
      hs AS (SELECT
        (SELECT COUNT(*) FROM texr JOIN stannr USING (qd, cd)) AS st,
        (SELECT COUNT(*) FROM texr JOIN rcannr USING (qd, cd)) AS rc,
        (SELECT COUNT(*) FROM texr JOIN rbannr USING (qd, cd)) AS rb,
        (SELECT COUNT(*) FROM texr JOIN s1annr USING (qd, cd)) AS st1,
        (SELECT COUNT(*) FROM texr JOIN c1annr USING (qd, cd)) AS rc1,
        (SELECT COUNT(*) FROM texr JOIN r1annr USING (qd, cd)) AS rb1)
      SELECT * FROM (
        SELECT 'iso' AS sel, 'tchurn' AS dial, CAST(-1 AS BIGINT) AS qd,
          CAST((SELECT moved FROM mvi) AS BIGINT) AS n_hits,
          CAST((SELECT moved FROM mvi) AS DOUBLE) / (SELECT n FROM nt) AS recall
        UNION ALL
        SELECT 'trunc', 'tchurn', -1, (SELECT moved FROM mvt),
          CAST((SELECT moved FROM mvt) AS DOUBLE) / (SELECT n FROM nt)
        UNION ALL
        SELECT 'trunc', 'decide_adv', -1,
          CAST(CASE WHEN 2 * (SELECT moved FROM mvt) < (SELECT n FROM nt) THEN 0
            WHEN 10 * ((SELECT rc FROM hs) - (SELECT st FROM hs)) <= (SELECT nq FROM qn) THEN 0
            WHEN 10 * ((SELECT rb FROM hs) - (SELECT rc FROM hs)) <= (SELECT nq FROM qn) THEN 1
            ELSE 2 END AS BIGINT),
          CAST((SELECT rc FROM hs) - (SELECT st FROM hs) AS DOUBLE)
            / (5.0 * (SELECT nq FROM qn))
        UNION ALL
        SELECT 'trunc', 'decide_np1', -1,
          CAST(CASE WHEN 2 * (SELECT moved FROM mvt) < (SELECT n FROM nt) THEN 0
            WHEN 10 * ((SELECT rc1 FROM hs) - (SELECT st1 FROM hs)) <= (SELECT nq FROM qn) THEN 0
            WHEN 10 * ((SELECT rb1 FROM hs) - (SELECT rc1 FROM hs)) <= (SELECT nq FROM qn) THEN 1
            ELSE 2 END AS BIGINT),
          CAST((SELECT rc1 FROM hs) - (SELECT st1 FROM hs) AS DOUBLE)
            / (5.0 * (SELECT nq FROM qn))
        UNION ALL
        SELECT * FROM (${Round13.mvTailSql("'iso'", "'kept'", "iexr",
          "kiannr")})
        UNION ALL
        SELECT * FROM (${Round13.mvTailSql("'iso'", "'kept_np1'", "iexr",
          "k1annr")})
        UNION ALL
        SELECT * FROM (${Round13.mvTailSql("'trunc'", "'stale'", "texr",
          "stannr")})
        UNION ALL
        SELECT * FROM (${Round13.mvTailSql("'trunc'", "'stale_np1'", "texr",
          "s1annr")})
        UNION ALL
        SELECT * FROM (${Round13.mvTailSql("'trunc'", "'recentered'",
          "texr", "rcannr")})
        UNION ALL
        SELECT * FROM (${Round13.mvTailSql("'trunc'", "'recentered_np1'",
          "texr", "c1annr")})
        UNION ALL
        SELECT * FROM (${Round13.mvTailSql("'trunc'", "'rebuilt'", "texr",
          "rbannr")})
        UNION ALL
        SELECT * FROM (${Round13.mvTailSql("'trunc'", "'rebuilt_np1'",
          "texr", "r1annr")}))
      ORDER BY sel, dial, qd"""))
  )
}
