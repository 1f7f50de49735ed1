package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** LLM-data-pipeline operators (north star): exact + near dedup
  * (n-gram Jaccard, MinHash-LSH, SimHash), similarity search (exact
  * cosine top-k + LSH-bucketed ANN), text analysis (quality score,
  * fingerprint, term frequency, language ID). Approximate/hash-seeded
  * ops are declared without oracle (rows-only check) — their exact
  * counterparts are oracle-scored.
  */
object LlmOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** The >=0.5 Jaccard near-dup pairs relation feeds SIX consumers
    * (q43 pairs, q76/q153/q286 group resolution, q197 eval ground
    * truth, ...). Originally memoized as a persisted DataFrame per
    * (session, dir) — but persist-based sharing DIED with the
    * clearCache-between-queries honesty change (the cache map kept
    * handing out a frame whose storage had been evicted, so every
    * consumer silently recomputed the inverted-index join). Now a
    * fixture-keyed scratch-parquet artifact (the FixtureArtifact
    * rule): built once per harness run, immune to clearCache, every
    * consumer plans against a flat scan.
    */
  private[graft] def jaccardPairsShared(s: SparkSession, dir: String): DataFrame =
    graft.util.FixtureArtifact.parquet(s, dir, "documents.parquet",
      "jaccard_pairs_n3_t05")(
      Dedup.jaccardPairs(t(s, dir, "documents"),
        "doc_id", "text", n = 3, threshold = 0.5, blockCols = Seq("lang")))

  /** Data-sized shingle index domain for DuckDB oracles: the lateral
    * word-position table `i` used by every n-gram / line-split oracle.
    * A FIXED bound (the old `range(1, 1000)`) silently truncates
    * shingles past the cap — Spark's side is unbounded, so a fixture
    * regeneration with longer docs would hash-mismatch 11 queries at
    * once. Bound by the corpus's own max token count instead (the q271
    * recipe); COALESCE covers the empty-corpus edge (MAX of nothing is
    * NULL, and `range(1, NULL)` would be too).
    * `cte` = the tokenized CTE name in scope, `arr` = its list column.
    * A `def` (not val) so object-init order can't bite (CLAUDE.md).
    */
  private[queries] def shingleIdx(cte: String, arr: String = "w"): String =
    s"(SELECT unnest(range(1, (SELECT COALESCE(MAX(len($arr)), 0) FROM $cte) + 1)) AS i) i"

  /** Recursive-CTE prefix computing the near-dup edge closure `r` —
    * shared verbatim by the per-doc component oracle below (q76/q91)
    * and q123's cluster-size tail, which concatenate their own final
    * SELECT onto it (no string surgery: the tails are appended, so a
    * whitespace drift in the prefix can't silently no-op a replace).
    */
  private[queries] val componentsClosureCte = s"""WITH RECURSIVE sp AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
      sh0 AS (SELECT doc_id, lang, w[i.i] || '_' || w[i.i+1] || '_' || w[i.i+2] AS g
        FROM sp, ${shingleIdx("sp")} WHERE i.i + 2 <= len(w)),
      sh AS (SELECT DISTINCT doc_id, lang, g FROM sh0),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      p AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      p2 AS (SELECT da, db FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
        WHERE inter/(x.n + y.n - inter) >= 0.5),
      e AS (SELECT da AS a, db AS b FROM p2 UNION SELECT db, da FROM p2),
      r AS (
        SELECT a, b FROM e
        UNION
        SELECT r.a, e.b FROM r JOIN e ON r.b = e.a)"""

  /** Connected-components oracle shared by q76 (label propagation) and
    * q91 (large-star/small-star) — two implementations of one operator,
    * one ground truth.
    */
  private[queries] val componentsOracle = componentsClosureCte + """
      SELECT a AS doc_id, least(a, MIN(b)) AS comp
      FROM r GROUP BY a ORDER BY doc_id"""

  /** All-pairs blocked-cosine ground truth, shared by q63 (all-pairs
    * plan) and q159 (dedup-first plan) — one oracle, two physical
    * strategies of one operator.
    */
  private val embCosineOracle = """WITH p AS (
        SELECT a.vec_id AS va, b.vec_id AS vb, a.label AS label,
          round(SUM(CAST(a.embedding[i.i] AS DOUBLE) * CAST(b.embedding[i.i] AS DOUBLE)) /
            (sqrt(SUM(CAST(a.embedding[i.i] AS DOUBLE) * CAST(a.embedding[i.i] AS DOUBLE))) *
             sqrt(SUM(CAST(b.embedding[i.i] AS DOUBLE) * CAST(b.embedding[i.i] AS DOUBLE)))), 6) AS cos
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id,
             (SELECT unnest(range(1, 65)) AS i) i
        GROUP BY 1, 2, 3)
      SELECT va, vb, CAST(label AS BIGINT) AS label, cos
      FROM p WHERE cos >= 0.35 ORDER BY va, vb"""

  val defs: Map[String, QueryDef] = Map(
    "q41_llm_dedup_exact" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .groupBy("text")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(md5(col("text")).as("fp"), col("keep_id"), col("n_copies"))
        .orderBy("keep_id"),
      Some("""SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM documents GROUP BY text ORDER BY keep_id""")),

    "q42_llm_dedup_keepers" -> QueryDef(
      (s, dir) => Dedup.firstPerKey(
          t(s, dir, "documents"), Seq("text"), Seq(col("doc_id")))
        .select(col("doc_id"))
        .orderBy("doc_id"),
      Some("""SELECT MIN(doc_id) AS doc_id FROM documents
      GROUP BY text ORDER BY doc_id""")),

    "q43_llm_neardup_jaccard" -> QueryDef(
      (s, dir) => jaccardPairsShared(s, dir)
        .orderBy("da", "db"),
      Some(s"""WITH s AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
      sh0 AS (SELECT doc_id, lang, w[i.i] || '_' || w[i.i+1] || '_' || w[i.i+2] AS g
        FROM s, ${shingleIdx("s")} WHERE i.i + 2 <= len(w)),
      sh AS (SELECT DISTINCT doc_id, lang, g FROM sh0),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      p AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT da, db, round(inter/(x.n + y.n - inter), 6) AS jaccard
      FROM p JOIN sz x ON p.da = x.doc_id JOIN sz y ON p.db = y.doc_id
      WHERE inter/(x.n + y.n - inter) >= 0.5
      ORDER BY da, db""")),

    // near-dup group resolution: connected components over the >= 0.5
    // Jaccard pairs; comp = min doc id in each component.
    "q76_llm_neardup_groups" -> QueryDef(
      (s, dir) => {
        val pairs = jaccardPairsShared(s, dir)
        Dedup.components(pairs)
          .select(col("id").as("doc_id"), col("comp"))
          .orderBy("doc_id")
      },
      Some(componentsOracle)),

    // Same operator, the O(log n)-round formulation: alternating
    // large-star/small-star hooking (Kiveris et al.) instead of
    // diameter-bound label propagation — the variant that survives
    // long-chain components at 100 TB. Scored against the identical
    // recursive-CTE oracle as q76.
    "q91_llm_neardup_groups_star" -> QueryDef(
      (s, dir) => {
        val pairs = jaccardPairsShared(s, dir)
        Dedup.componentsStar(pairs)
          .select(col("id").as("doc_id"), col("comp"))
          .orderBy("doc_id")
      },
      Some(componentsOracle)),

    // MinHash-LSH candidates: approximate by construction (fixed seeds,
    // banding) — no SQL oracle; rows-only check. The exact Jaccard query
    // above is the oracle-scored ground truth of the same operator family.
    "q44_llm_neardup_minhash" -> QueryDef(
      (s, dir) => Dedup.minHashCandidates(t(s, dir, "documents"),
          "doc_id", "text", shingleN = 3, numHashes = 32, bands = 8)
        .orderBy("da", "db"),
      None),

    "q45_llm_simhash" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          Dedup.simHash(TextFunctions.tokens(col("text"))).as("simhash"))
        .orderBy("doc_id"),
      None),

    "q46_llm_cosine_topk" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val corpus = emb
          .select(col("vec_id").as("cid"), col("embedding").as("ce"))
        Similarity.cosineTopK(queries, corpus, k = 5)
          .select(col("qid"), col("cid"), col("cos"), col("rnk"))
          .orderBy("qid", "rnk")
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
      pairs AS (SELECT q.qid, e.vec_id AS cid,
        round(SUM(CAST(q.qe[i.i] AS DOUBLE) * CAST(e.embedding[i.i] AS DOUBLE)) /
          (sqrt(SUM(CAST(q.qe[i.i] AS DOUBLE) * CAST(q.qe[i.i] AS DOUBLE))) *
           sqrt(SUM(CAST(e.embedding[i.i] AS DOUBLE) * CAST(e.embedding[i.i] AS DOUBLE)))), 6) AS cos
        FROM q, embeddings e, (SELECT unnest(range(1, 65)) AS i) i
        WHERE e.vec_id <> q.qid
        GROUP BY 1, 2),
      r AS (SELECT qid, cid, cos,
        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
        FROM pairs)
      SELECT qid, cid, cos, rnk FROM r WHERE rnk <= 5 ORDER BY qid, rnk""")),

    // LSH-bucketed ANN — the 100 TB scale path (bounded per-bucket work
    // instead of a cross join). "Approximate" only in recall: the
    // fixed-seed hyperplanes are embedded in the oracle as exact double
    // literals (Java's toString round-trips through DuckDB's parser)
    // and the per-plane dot is a list_reduce left fold, the same
    // summation order as Spark's HOF aggregate — so bucketing, join,
    // and per-bucket top-k are reproduced exactly.
    "q47_llm_ann_lsh" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val corpus = emb
          .select(col("vec_id").as("cid"), col("embedding").as("ce"))
        Similarity.lshTopK(queries, corpus, k = 5, nPlanes = 6, dim = 64)
          .select(col("qid"), col("cid"), col("cos"), col("rnk"))
          .orderBy("qid", "rnk")
      },
      Some {
        val planes = graft.operators.Similarity.hyperplanes(6, 64)
        val bucket = planes.zipWithIndex.map { case (p, i) =>
          val lst = p.map(_.toString).mkString("[", ", ", "]")
          s"""(CASE WHEN list_reduce(list_transform(range(1, 65),
             d -> $lst[d] * CAST(e[d] AS DOUBLE)), (a, b) -> a + b) >= 0
             THEN 1 ELSE 0 END) * ${1 << i}"""
        }.mkString(" + ")
        s"""WITH qs AS (SELECT vec_id AS id, embedding AS e FROM embeddings
          WHERE vec_id < 50),
        cs AS (SELECT vec_id AS id, embedding AS e FROM embeddings),
        qb AS (SELECT id, $bucket AS bucket FROM qs),
        cb AS (SELECT id, $bucket AS bucket FROM cs),
        scored AS (SELECT qb.id AS qid, cb.id AS cid,
            round(SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(c.embedding[i.i] AS DOUBLE)) /
              (sqrt(SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(q.embedding[i.i] AS DOUBLE))) *
               sqrt(SUM(CAST(c.embedding[i.i] AS DOUBLE) * CAST(c.embedding[i.i] AS DOUBLE)))), 6) AS cos
          FROM qb JOIN cb ON qb.bucket = cb.bucket AND qb.id <> cb.id
          JOIN embeddings q ON qb.id = q.vec_id
          JOIN embeddings c ON cb.id = c.vec_id,
          (SELECT unnest(range(1, 65)) AS i) i
          GROUP BY 1, 2),
        r AS (SELECT qid, cid, cos,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
          FROM scored)
        SELECT qid, cid, cos, CAST(rnk AS BIGINT) AS rnk FROM r
        WHERE rnk <= 5 ORDER BY qid, rnk"""
      }),

    // IVF-bucketed ANN (coarse-quantizer buckets). "Approximate" only
    // in RECALL — every stage is deterministic (first-16 centroids,
    // rounded-dot assignment, rounded-cosine rank), so unlike a seeded
    // sketch this one carries an exact oracle reproducing the
    // quantizer, the bucket join, and the per-bucket top-k.
    "q77_llm_ann_ivf" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val corpus = emb
          .select(col("vec_id").as("cid"), col("embedding").as("ce"))
        Similarity.ivfTopK(queries, corpus, k = 5, nlist = 16)
          .select(col("qid"), col("cid"), col("cos"), col("rnk"))
          .orderBy("qid", "rnk")
      },
      Some("""WITH cent AS (SELECT vec_id AS centroid_id, embedding AS centroid
        FROM embeddings WHERE vec_id < 16),
      qs AS (SELECT vec_id AS id, embedding AS e FROM embeddings WHERE vec_id < 50),
      cs AS (SELECT vec_id AS id, embedding AS e FROM embeddings),
      qa0 AS (SELECT q.id, c.centroid_id,
          round(SUM(CAST(q.e[i.i] AS DOUBLE) * CAST(c.centroid[i.i] AS DOUBLE)), 6) AS d
        FROM qs q, cent c, (SELECT unnest(range(1, 65)) AS i) i GROUP BY 1, 2),
      qa AS (SELECT id, centroid_id FROM (SELECT id, centroid_id,
          row_number() OVER (PARTITION BY id ORDER BY d DESC, centroid_id) AS r
        FROM qa0) WHERE r = 1),
      ca0 AS (SELECT q.id, c.centroid_id,
          round(SUM(CAST(q.e[i.i] AS DOUBLE) * CAST(c.centroid[i.i] AS DOUBLE)), 6) AS d
        FROM cs q, cent c, (SELECT unnest(range(1, 65)) AS i) i GROUP BY 1, 2),
      ca AS (SELECT id, centroid_id FROM (SELECT id, centroid_id,
          row_number() OVER (PARTITION BY id ORDER BY d DESC, centroid_id) AS r
        FROM ca0) WHERE r = 1),
      scored AS (SELECT qa.id AS qid, ca.id AS cid,
          round(SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(c.embedding[i.i] AS DOUBLE)) /
            (sqrt(SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(q.embedding[i.i] AS DOUBLE))) *
             sqrt(SUM(CAST(c.embedding[i.i] AS DOUBLE) * CAST(c.embedding[i.i] AS DOUBLE)))), 6) AS cos
        FROM qa JOIN ca ON qa.centroid_id = ca.centroid_id AND qa.id <> ca.id
        JOIN embeddings q ON qa.id = q.vec_id
        JOIN embeddings c ON ca.id = c.vec_id,
        (SELECT unnest(range(1, 65)) AS i) i
        GROUP BY 1, 2),
      r AS (SELECT qid, cid, cos,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
        FROM scored)
      SELECT qid, cid, cos, CAST(rnk AS BIGINT) AS rnk FROM r
      WHERE rnk <= 5 ORDER BY qid, rnk""")),

    // decontamination: corpus docs sharing >= 3 word-trigrams with the
    // "benchmark" slice (source src0). At 100 TB the benchmark index
    // broadcasts; the corpus only shuffles its shingle hashes.
    "q75_llm_decontaminate" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.contaminated(
            docs.filter(col("source") =!= "src0"),
            docs.filter(col("source") === "src0"),
            "doc_id", "text", n = 3, minShared = 3L)
          .orderBy("doc_id")
      },
      Some(s"""WITH sp AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
      sh0 AS (SELECT doc_id, source, w[i.i] || '_' || w[i.i+1] || '_' || w[i.i+2] AS g
        FROM sp, ${shingleIdx("sp")} WHERE i.i + 2 <= len(w)),
      sh AS (SELECT DISTINCT doc_id, source, g FROM sh0),
      bench AS (SELECT DISTINCT g FROM sh WHERE source = 'src0')
      SELECT c.doc_id, COUNT(*) AS n_shared
      FROM sh c JOIN bench b ON c.g = b.g
      WHERE c.source <> 'src0'
      GROUP BY c.doc_id HAVING COUNT(*) >= 3
      ORDER BY c.doc_id""")),

    "q63_llm_neardup_embedding" -> QueryDef(
      (s, dir) => Similarity.cosinePairs(t(s, dir, "embeddings"),
          "vec_id", "embedding", "label", threshold = 0.35)
        .orderBy("va", "vb"),
      Some(embCosineOracle)),

    // Same semantics, duplication-robust plan: one cosine per UNIQUE
    // vector pair, matches expanded through duplicate groups (the 10×
    // scale probe showed the all-pairs form degrades with duplicate-
    // cluster size² — BASELINE.md). Scored against the identical
    // all-pairs oracle.
    "q159_llm_neardup_embedding_dedup" -> QueryDef(
      (s, dir) => Similarity.cosinePairsDeduped(t(s, dir, "embeddings"),
          "vec_id", "embedding", "label", threshold = 0.35)
        .orderBy("va", "vb"),
      Some(embCosineOracle)),

    "q48_llm_text_quality" -> QueryDef(
      (s, dir) => {
        val words = TextFunctions.tokens(col("text"))
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(words).cast("long").as("n_words"),
            round(length(replace(col("text"), lit(" "), lit(""))).cast("long")
              / size(words), 6).as("avg_word_len"),
            TextFunctions.tokenEstimate(col("text")).as("tok_est"),
            round(TextFunctions.stopwordRatio(words, Seq("the", "a")), 6).as("stop_ratio"),
            round(TextFunctions.qualityScore(size(words)), 6).as("q_score"),
            TextFunctions.fingerprint(col("text")).as("fp"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        round(length(replace(text, ' ', '')) / len(string_split(text, ' ')), 6) AS avg_word_len,
        CAST(ceil(length(text) / 4.0) AS BIGINT) AS tok_est,
        round(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a')))
          / len(string_split(text, ' ')), 6) AS stop_ratio,
        round(1.0 / (1.0 + exp((CAST(len(string_split(text, ' ')) AS DOUBLE) - 20.0) / -10.0)), 6) AS q_score,
        md5(lower(text)) AS fp
      FROM documents ORDER BY doc_id""")),

    "q49_llm_top_terms" -> QueryDef(
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("lang"), explode(TextFunctions.tokens(col("text"))).as("tok"))
        val counts = toks.groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
        graft.operators.TopK.perGroup(counts, Seq("lang"),
            Seq(col("cnt").desc, col("tok")), k = 5)
          .orderBy("lang", "rnk")
      },
      Some("""WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
      c AS (SELECT lang, tok, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
      r AS (SELECT lang, tok, cnt,
        row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS rnk FROM c)
      SELECT lang, tok, cnt, rnk FROM r WHERE rnk <= 5 ORDER BY lang, rnk""")),

    // Language-ID heuristic over the fixtures (the synthetic word soup is
    // language-neutral, so predictions are mostly 'und'/'en' — the
    // operator itself is exercised properly in unit tests on real text).
    "q50_llm_langid" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextFunctions.langId(TextFunctions.tokens(col("text"))).as("pred_lang"))
        .orderBy("doc_id"),
      // the heuristic is a pure deterministic column expression
      // (stopword-hit argmax, ties by list order, 'und' on zero), so
      // unlike a model-based langid it carries an exact oracle: the
      // same stopword lists inlined, same tokenizer (split on ' ').
      Some {
        val scores = TextFunctions.langStopwords.map { case (lang, stops) =>
          val inList = stops.map(w => s"'$w'").mkString("[", ", ", "]")
          lang -> s"len(list_filter(string_split(text, ' '), w -> list_contains($inList, w)))"
        }
        val best = scores.map(_._2).mkString("greatest(", ", ", ")")
        val pick = scores.foldRight("'und'") { case ((lang, sc), acc) =>
          s"CASE WHEN $best > 0 AND $sc = $best THEN '$lang' ELSE $acc END"
        }
        s"""SELECT doc_id, lang, $pick AS pred_lang
        FROM documents ORDER BY doc_id"""
      })
  )
}
