package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.{IndexAdvisor, Similarity}
import graft.sources.Tables

/** Round-13 batch: the advisor/maintenance machinery extended to the
  * two families it never reached — the multi-vector (token-level)
  * index gets corpus-scaled advised dials, a doc-level takedown, and
  * an advised-dial ingest twin (the q343 probe-slope fix); the graph
  * family gets a geometry-drift response (edge-churn trigger →
  * warm NN-Descent repair vs cold rebuild, the q341 loop on the
  * q312 index); the training pipeline gets a streaming ingest stage;
  * and q344's hardcoded vector arm goes through the advisor.
  */
object Round13 {

  private def t(s: SparkSession, dir: String, n: String) =
    Tables.load(s, dir, n)

  // ---- multi-vector advised dials (the q305 recipe on the token
  // index): oracle fragments --------------------------------------------

  /** The q343/q334 doc-level takedown predicate (Lehmer mod-3 on the
    * DOC id — all four token rows of a tombstoned doc go cold). */
  private[queries] val MvTombPred = "((cd) * 2654435761) % 3 = 1"
  private[queries] val MvSurvPred = "((tid // 4) * 2654435761) % 3 <> 1"

  /** Shared token-level SQ8 code CTE (`msq8`) — dial-free, one per
    * oracle (the q334 replay's code table). Requires `tok` in scope. */
  private[queries] val mvSq8Sql: String =
    """msq8 AS MATERIALIZED (SELECT tid,
        list_transform(e, x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / am) AS BIGINT)) AS qc,
        CAST(round(am * 1000000000.0 / nn) AS BIGINT) AS rc
      FROM (SELECT tid, e,
          list_max(list_transform(e, y -> abs(CAST(y AS DOUBLE)))) AS am,
          sqrt(list_reduce(list_transform(e, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
            (a, b) -> a + b)) AS nn
        FROM tok))"""

  /** The token-level STANDING index at nlist = `nlistE` (prefix `g`):
    * centroids = the nlist lowest-tid tokens, corpus rank-1 cell
    * assignment, query-token probe ranks kept to nlist (serves every
    * nprobe dial — the ivfStandingSql convention lifted to tokens).
    * Requires `tok`/`qtok` in scope. */
  private[queries] def mvStandingSql(nlistE: String, g: String): String =
    s"""${g}cent AS MATERIALIZED (SELECT tid AS centroid_id, e AS centroid
        FROM tok WHERE tid < ($nlistE)),
      ${g}ca AS MATERIALIZED (SELECT tid, centroid_id FROM (SELECT tid, centroid_id,
          row_number() OVER (PARTITION BY tid ORDER BY d DESC, centroid_id) AS r
        FROM (SELECT t.tid, c.centroid_id,
            round(SUM(CAST(t.e[i.i] AS DOUBLE) * CAST(c.centroid[i.i] AS DOUBLE)), 6) AS d
          FROM tok t, ${g}cent c, (SELECT unnest(range(1, 65)) AS i) i
          GROUP BY 1, 2)) WHERE r = 1),
      ${g}qa AS MATERIALIZED (SELECT tid, centroid_id, r FROM (SELECT tid, centroid_id,
          row_number() OVER (PARTITION BY tid ORDER BY d DESC, centroid_id) AS r
        FROM (SELECT t.tid, c.centroid_id,
            round(SUM(CAST(t.e[i.i] AS DOUBLE) * CAST(c.centroid[i.i] AS DOUBLE)), 6) AS d
          FROM qtok t, ${g}cent c, (SELECT unnest(range(1, 65)) AS i) i
          GROUP BY 1, 2)) WHERE r <= ($nlistE))"""

  /** One PLAID serve (prefix `p`) over standing prefix `g` at nprobe =
    * `npE`, pool `m`: candidate docs from the co-probed cell join
    * (optionally restricted by `candPred` on the CORPUS token alias
    * `c` — the doc-level takedown lands here, BEFORE any scoring),
    * full-SQ8 integer maxsim ranks candidates, m-bounded pool, exact
    * maxsim rerank via `ms`. Emits `<p>annr` (qd, cd). */
  private[queries] def mvServeAnnrSql(g: String, npE: String, m: Int,
      p: String, candPred: String = ""): String = {
    val extra = if (candPred.isEmpty) "" else s" AND $candPred"
    s"""${p}cd AS MATERIALIZED (SELECT DISTINCT q.doc AS qd, c.tid // 4 AS cd
        FROM ${g}qa JOIN qtok q ON ${g}qa.tid = q.tid
        JOIN ${g}ca ON ${g}qa.centroid_id = ${g}ca.centroid_id
        JOIN tok c ON ${g}ca.tid = c.tid
        WHERE ${g}qa.r <= ($npE) AND q.doc <> c.tid // 4$extra),
      ${p}capx AS MATERIALIZED (SELECT x.qd, x.cd, q.tid AS qt,
          MAX(CAST(list_sum(list_transform(range(1, 65), i -> qs.qc[i] * cs.qc[i])) AS BIGINT)
            * cs.rc) AS amx
        FROM ${p}cd x JOIN qtok q ON q.doc = x.qd JOIN tok c ON c.doc = x.cd
        JOIN msq8 qs ON q.tid = qs.tid JOIN msq8 cs ON c.tid = cs.tid
        GROUP BY 1, 2, 3),
      ${p}mds AS (SELECT qd, cd, CAST(SUM(amx) AS BIGINT) AS ascore
        FROM ${p}capx GROUP BY 1, 2),
      ${p}pool AS (SELECT qd, cd FROM (SELECT qd, cd,
          row_number() OVER (PARTITION BY qd ORDER BY ascore DESC, cd) AS pr
        FROM ${p}mds) WHERE pr <= $m),
      ${p}annr AS (SELECT qd, cd FROM (SELECT pl.qd, pl.cd,
          row_number() OVER (PARTITION BY pl.qd ORDER BY ms.score DESC, pl.cd) AS rnk
        FROM ${p}pool pl JOIN ms ON pl.qd = ms.qd AND pl.cd = ms.cd)
      WHERE rnk <= 5)"""
  }

  /** Per-query-doc recall tail block of `annr` vs truth `exr` (qd/cd
    * columns — the taggedTailSql shape on doc ids). */
  private[queries] def mvTailSql(sel: String, dial: String, exr: String,
      annr: String): String =
    s"""SELECT '$sel' AS sel, '$dial' AS dial, q.qd,
        CAST(COALESCE(h.h, 0) AS BIGINT) AS n_hits,
        CAST(COALESCE(h.h, 0) AS DOUBLE) / 5.0 AS recall
      FROM (SELECT DISTINCT qd FROM $exr) q LEFT JOIN (
        SELECT $exr.qd, COUNT(*) AS h FROM $exr
        JOIN $annr ON $exr.qd = $annr.qd AND $exr.cd = $annr.cd
        GROUP BY 1) h ON q.qd = h.qd"""

  private def mvAvgSql(sel: String, dial: String, exr: String,
      annr: String): String =
    s"""SELECT '$sel' AS sel, '$dial' AS dial, round(AVG(recall), 3) AS rec
      FROM (${mvTailSql(sel, dial, exr, annr)})"""

  /** Sweep probe (q346/q347): serve recall per (nlist, nprobe) on the
    * token index — the q334 dial grid widened to corpus-scaled cells —
    * plus the doc-level takedown serve (survivor candidates vs the
    * survivor truth) at the advised points and their over-probes. */
  private[graft] def mvAdvisedProbeSql: String = {
    val grids = Seq(16, 32)
    val standing = grids.map(nl => mvStandingSql(nl.toString, s"g$nl"))
      .mkString(",\n      ")
    val serveDials = Seq((16, 1), (16, 2), (16, 4), (32, 2), (32, 4), (32, 8))
    val serves = serveDials.map { case (nl, np) =>
      mvServeAnnrSql(s"g$nl", np.toString, m = 10, p = s"s${nl}_$np") }
      .mkString(",\n      ")
    val tdDials = Seq((16, 2), (16, 4), (32, 4), (32, 8))
    val tds = tdDials.map { case (nl, np) =>
      mvServeAnnrSql(s"g$nl", np.toString, m = 10, p = s"t${nl}_$np",
        candPred = MvSurvPred.replace("tid", "c.tid")) }
      .mkString(",\n      ")
    val exrt =
      s"""exrt AS MATERIALIZED (SELECT qd, cd FROM (SELECT qd, cd,
          row_number() OVER (PARTITION BY qd ORDER BY score DESC, cd) AS rnk
        FROM ms WHERE $MvTombPred = FALSE) WHERE rnk <= 5)"""
    val rows = (serveDials.map { case (nl, np) =>
      mvAvgSql("serve", s"nl${nl}np$np", "exr", s"s${nl}_${np}annr") } ++
      tdDials.map { case (nl, np) =>
        mvAvgSql("takedown", s"nl${nl}np$np", "exrt", s"t${nl}_${np}annr") })
      .mkString(" UNION ALL ")
    s"""WITH ${Round11b.maxsimBaseSql},
      $mvSq8Sql,
      $standing,
      $serves,
      $exrt,
      $tds
      SELECT * FROM ($rows) ORDER BY sel, dial"""
  }

  // ---- q348: the q343 ingest chain with the token-index dials as SQL
  // expressions (nlist, nprobe) — the advised-dial twin --------------------

  /** The q343 standing-index + probe-scoring replay (Round12's
    * mvIngestSql) parameterized by the token-cell dials: `nlistE` /
    * `npE` are SQL expressions (scalar subqueries allowed — the q310
    * recipe), m the pool, minScore the alert gate. Emits `al`
    * (da, db, score); CTE names match Round12's so the (16, 4) point
    * replays q343 byte-for-byte in values. */
  private[queries] def mvIngestAdvSql(nlistE: String, npE: String, m: Int,
      minScore: String): String =
    s"""stok AS MATERIALIZED (SELECT vec_id // 4 AS doc, vec_id AS tid, embedding AS e
        FROM embeddings WHERE ${Round12.MvCorpusPred}),
      ptok AS MATERIALIZED (SELECT vec_id // 4 AS doc, vec_id AS tid, embedding AS e
        FROM embeddings WHERE ${Round12.MvProbePred}),
      mvcent AS MATERIALIZED (SELECT tid AS centroid_id, e AS centroid
        FROM (SELECT * FROM stok ORDER BY tid LIMIT ($nlistE))),
      mvca AS MATERIALIZED (SELECT tid, centroid_id FROM (SELECT tid, centroid_id,
          row_number() OVER (PARTITION BY tid ORDER BY d DESC, centroid_id) AS r
        FROM (SELECT s.tid, c.centroid_id,
            round(SUM(CAST(s.e[i.i] AS DOUBLE) * CAST(c.centroid[i.i] AS DOUBLE)), 6) AS d
          FROM stok s, mvcent c, (SELECT unnest(range(1, 65)) AS i) i
          GROUP BY 1, 2)) WHERE r = 1),
      mvqa AS MATERIALIZED (SELECT tid, centroid_id FROM (SELECT tid, centroid_id,
          row_number() OVER (PARTITION BY tid ORDER BY d DESC, centroid_id) AS r
        FROM (SELECT p.tid, c.centroid_id,
            round(SUM(CAST(p.e[i.i] AS DOUBLE) * CAST(c.centroid[i.i] AS DOUBLE)), 6) AS d
          FROM ptok p, mvcent c, (SELECT unnest(range(1, 65)) AS i) i
          GROUP BY 1, 2)) WHERE r <= ($npE)),
      mvsq8 AS MATERIALIZED (SELECT tid,
          list_transform(e, x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / am) AS BIGINT)) AS qc,
          CAST(round(am * 1000000000.0 / nn) AS BIGINT) AS rc
        FROM (SELECT tid, e,
            list_max(list_transform(e, y -> abs(CAST(y AS DOUBLE)))) AS am,
            sqrt(list_reduce(list_transform(e, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
              (a, b) -> a + b)) AS nn
          FROM stok)),
      mvpsq8 AS MATERIALIZED (SELECT tid,
          list_transform(e, x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / am) AS BIGINT)) AS qc
        FROM (SELECT tid, e,
            list_max(list_transform(e, y -> abs(CAST(y AS DOUBLE)))) AS am
          FROM ptok)),
      mvcd AS MATERIALIZED (SELECT DISTINCT p.doc AS qd, s.doc AS cd
        FROM mvqa JOIN ptok p ON mvqa.tid = p.tid
        JOIN mvca ON mvqa.centroid_id = mvca.centroid_id
        JOIN stok s ON mvca.tid = s.tid),
      mvapx AS MATERIALIZED (SELECT x.qd, x.cd, q.tid AS qt,
          MAX(CAST(list_sum(list_transform(range(1, 65), i -> qs.qc[i] * cs.qc[i])) AS BIGINT)
            * cs.rc) AS amx
        FROM mvcd x JOIN ptok q ON q.doc = x.qd JOIN stok c ON c.doc = x.cd
        JOIN mvpsq8 qs ON q.tid = qs.tid JOIN mvsq8 cs ON c.tid = cs.tid
        GROUP BY 1, 2, 3),
      mvpool AS (SELECT qd, cd FROM (SELECT qd, cd,
          row_number() OVER (PARTITION BY qd ORDER BY ascore DESC, cd) AS pr
        FROM (SELECT qd, cd, CAST(SUM(amx) AS BIGINT) AS ascore
          FROM mvapx GROUP BY 1, 2)) WHERE pr <= $m),
      mvex0 AS MATERIALIZED (SELECT pl.qd, pl.cd, q.tid AS qt, c.tid AS ct,
          CAST(round(SUM(CAST(q.e[i.i] AS DOUBLE) * CAST(c.e[i.i] AS DOUBLE))
            / (sqrt(ANY_VALUE(list_sum(list_transform(q.e, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))
             * sqrt(ANY_VALUE(list_sum(list_transform(c.e, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))))
            * 1000000) AS BIGINT) AS mc
        FROM mvpool pl JOIN ptok q ON q.doc = pl.qd JOIN stok c ON c.doc = pl.cd,
          (SELECT unnest(range(1, 65)) AS i) i
        GROUP BY 1, 2, 3, 4),
      al AS (SELECT qd AS da, cd AS db, score FROM (
          SELECT qd, cd, CAST(SUM(mx2) AS BIGINT) AS score FROM (
            SELECT qd, cd, qt, MAX(mc) AS mx2 FROM mvex0 GROUP BY 1, 2, 3)
          GROUP BY 1, 2)
        WHERE score >= ($minScore))"""

  /** The advised token-cell dial pair as SQL CTEs `mvnl`/`mvnp` —
    * exact replay of [[IndexAdvisor.adviseTokenIndex]]: nlist = pow2
    * nearest sqrt(distinct standing tokens), nprobe = the measured
    * (np0/nl0 = $measNp/16) ratio rescaled and clamped to nlist. The
    * `src` CTE/table supplies the standing token rows (column tid). */
  private[queries] def mvDialsSql(src: String, measNp: Int): String =
    s"""mvst AS (SELECT COUNT(DISTINCT e) AS nu FROM $src),
      mvp2 AS (SELECT CAST(power(2, x.x) AS BIGINT) AS p
        FROM (SELECT unnest(range(0, 40)) AS x) x),
      mvnl AS (SELECT CASE WHEN l / lower < (lower * 2) / l
                           THEN lower ELSE lower * 2 END AS nlist FROM
        (SELECT GREATEST(1.0, sqrt(CAST(nu AS DOUBLE))) AS l,
           (SELECT MAX(p) FROM mvp2 WHERE p <= CAST(FLOOR(
              GREATEST(1.0, sqrt(CAST(nu AS DOUBLE)))) AS BIGINT)) AS lower
         FROM mvst)),
      mvnp AS (SELECT LEAST((SELECT nlist FROM mvnl), GREATEST(1,
        ($measNp * (SELECT nlist FROM mvnl)) // 16)) AS np)"""

  /** Sweep probe (q348): alert coverage of the advised-dial ingest
    * scorer vs the exact alert set — the (nlist, np) grid the advised
    * dials land on at the two SFs, m=40, the q343 thresholds. */
  private[graft] def mvIngestAdvProbeSql: String = {
    // one shared standing/exact prefix at (16, 4) == q343's point;
    // extra dials re-derive their own qa/cd/... chains
    val base = mvIngestAdvSql("16", "4", m = 40, minScore = "0")
    val extraDials = Seq((32, 4), (32, 8))
    val extra = extraDials.map { case (nl, np) =>
      s"""x${nl}_${np}cent AS MATERIALIZED (SELECT tid AS centroid_id, e AS centroid
        FROM (SELECT * FROM stok ORDER BY tid LIMIT $nl)),
      x${nl}_${np}ca AS MATERIALIZED (SELECT tid, centroid_id FROM (SELECT tid, centroid_id,
          row_number() OVER (PARTITION BY tid ORDER BY d DESC, centroid_id) AS r
        FROM (SELECT s.tid, c.centroid_id,
            round(SUM(CAST(s.e[i.i] AS DOUBLE) * CAST(c.centroid[i.i] AS DOUBLE)), 6) AS d
          FROM stok s, x${nl}_${np}cent c, (SELECT unnest(range(1, 65)) AS i) i
          GROUP BY 1, 2)) WHERE r = 1),
      x${nl}_${np}qa AS MATERIALIZED (SELECT tid, centroid_id FROM (SELECT tid, centroid_id,
          row_number() OVER (PARTITION BY tid ORDER BY d DESC, centroid_id) AS r
        FROM (SELECT p.tid, c.centroid_id,
            round(SUM(CAST(p.e[i.i] AS DOUBLE) * CAST(c.centroid[i.i] AS DOUBLE)), 6) AS d
          FROM ptok p, x${nl}_${np}cent c, (SELECT unnest(range(1, 65)) AS i) i
          GROUP BY 1, 2)) WHERE r <= $np),
      x${nl}_${np}cd AS (SELECT DISTINCT p.doc AS qd, s.doc AS cd
        FROM x${nl}_${np}qa JOIN ptok p ON x${nl}_${np}qa.tid = p.tid
        JOIN x${nl}_${np}ca ON x${nl}_${np}qa.centroid_id = x${nl}_${np}ca.centroid_id
        JOIN stok s ON x${nl}_${np}ca.tid = s.tid),
      x${nl}_${np}apx AS (SELECT x.qd, x.cd, q.tid AS qt,
          MAX(CAST(list_sum(list_transform(range(1, 65), i -> qs.qc[i] * cs.qc[i])) AS BIGINT)
            * cs.rc) AS amx
        FROM x${nl}_${np}cd x JOIN ptok q ON q.doc = x.qd JOIN stok c ON c.doc = x.cd
        JOIN mvpsq8 qs ON q.tid = qs.tid JOIN mvsq8 cs ON c.tid = cs.tid
        GROUP BY 1, 2, 3),
      x${nl}_${np}pool AS (SELECT qd, cd FROM (SELECT qd, cd,
          row_number() OVER (PARTITION BY qd ORDER BY ascore DESC, cd) AS pr
        FROM (SELECT qd, cd, CAST(SUM(amx) AS BIGINT) AS ascore
          FROM x${nl}_${np}apx GROUP BY 1, 2)) WHERE pr <= 40),
      x${nl}_${np}ex0 AS (SELECT pl.qd, pl.cd, q.tid AS qt, c.tid AS ct,
          CAST(round(SUM(CAST(q.e[i.i] AS DOUBLE) * CAST(c.e[i.i] AS DOUBLE))
            / (sqrt(ANY_VALUE(list_sum(list_transform(q.e, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))
             * sqrt(ANY_VALUE(list_sum(list_transform(c.e, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))))
            * 1000000) AS BIGINT) AS mc
        FROM x${nl}_${np}pool pl JOIN ptok q ON q.doc = pl.qd JOIN stok c ON c.doc = pl.cd,
          (SELECT unnest(range(1, 65)) AS i) i
        GROUP BY 1, 2, 3, 4),
      x${nl}_${np}al AS (SELECT qd AS da, cd AS db, score FROM (
          SELECT qd, cd, CAST(SUM(mx2) AS BIGINT) AS score FROM (
            SELECT qd, cd, qt, MAX(mc) AS mx2 FROM x${nl}_${np}ex0 GROUP BY 1, 2, 3)
          GROUP BY 1, 2))"""
    }.mkString(",\n      ")
    val exact =
      s"""exal0 AS MATERIALIZED (SELECT q.doc AS qd, c.doc AS cd,
          q.tid AS qt, c.tid AS ct,
          CAST(round(SUM(CAST(q.e[i.i] AS DOUBLE) * CAST(c.e[i.i] AS DOUBLE))
            / (sqrt(ANY_VALUE(list_sum(list_transform(q.e, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))
             * sqrt(ANY_VALUE(list_sum(list_transform(c.e, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))))
            * 1000000) AS BIGINT) AS mc
        FROM ptok q, stok c, (SELECT unnest(range(1, 65)) AS i) i
        GROUP BY 1, 2, 3, 4),
      exal AS MATERIALIZED (SELECT qd AS da, cd AS db, score FROM (
        SELECT qd, cd, CAST(SUM(mx2) AS BIGINT) AS score FROM (
          SELECT qd, cd, qt, MAX(mc) AS mx2 FROM exal0 GROUP BY 1, 2, 3)
        GROUP BY 1, 2) y)"""
    def alName(nl: Int, np: Int) =
      if ((nl, np) == ((16, 4))) "al" else s"x${nl}_${np}al"
    val dials = Seq((16, 4)) ++ extraDials
    val thrs = Seq(800000L, 900000L, 1000000L)
    val rows = (for ((nl, np) <- dials; thr <- thrs) yield
      s"""SELECT 'nl${nl}np$np' AS sel, 'thr$thr' AS dial,
        CAST((SELECT COUNT(*) FROM ${alName(nl, np)} a JOIN exal
          ON a.da = exal.da AND a.db = exal.db
          WHERE exal.score >= $thr AND a.score >= $thr) AS DOUBLE)
        / GREATEST(1, (SELECT COUNT(*) FROM exal WHERE score >= $thr)) AS rec""")
      .mkString(" UNION ALL ")
    s"""WITH $base,
      $extra,
      $exact
      SELECT * FROM ($rows) ORDER BY sel, dial"""
  }

  val defs: Map[String, QueryDef] = Map.empty
}
