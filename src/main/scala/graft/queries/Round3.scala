package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables
import graft.util.Det
import graft.util.Det.{davgSql, dsumSql}

/** Round-3 completeness batch: warehouse-maintenance operators (SCD2
  * dimension build, CDC snapshot diff), LLM sequence packing, mode
  * aggregate, fixed-width histograms, INTERSECT ALL, and text/sampling
  * additions.
  *
  * Scale notes (100 TB): SCD2 is one window shuffle on the dimension
  * key — the same plan shape at any scale, no self-join. Snapshot diff
  * is a single full-outer shuffle join on the primary key (AQE handles
  * skew); at 100 TB both sides are key-partitioned parquet so the join
  * co-locates. Sequence packing is a running sum over an explicit
  * global order — at scale you partition by shard and pack within
  * shards (the global-window form here is the per-shard kernel). Mode
  * and histogram are two-level hash aggregations with map-side
  * combine; INTERSECT ALL is Spark's built-in count-balancing
  * aggregate (no row explosion).
  */
object Round3 {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val defs: Map[String, QueryDef] = Map(
    // ---- SCD2 dimension build from a change log -----------------------
    // Each customer's orders are the change stream for a slowly-changing
    // "priority" attribute: valid_from = change date, valid_to =
    // next-change date (exclusive; NULL = current row). One window
    // shuffle on the dimension key; no self-join.
    "q101_scd2_dimension" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            col("o_orderpriority").as("prio"),
            col("o_orderdate").cast("date").as("valid_from"),
            lead(col("o_orderdate"), 1).over(w).cast("date").as("valid_to"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderpriority AS prio,
        CAST(o_orderdate AS DATE) AS valid_from,
        CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey) AS DATE) AS valid_to
      FROM orders ORDER BY o_custkey, o_orderkey""")),

    // ---- CDC snapshot diff (insert/delete/update/same) ----------------
    // Two deterministic snapshots of `orders` (disjoint 10% dropped on
    // each side; every 3rd key repriced in the new one) diffed with a
    // single full-outer join on the primary key.
    "q102_snapshot_diff" -> QueryDef(
      (s, dir) => {
        val base = t(s, dir, "orders")
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
        val old = base.filter(pmod(col("k"), lit(10)) =!= 0)
        val neu = base.filter(pmod(col("k"), lit(10)) =!= 1)
          .withColumn("price",
            when(pmod(col("k"), lit(3)) === 0, col("price") + lit(100.0))
              .otherwise(col("price")))
        old.as("o").join(neu.as("n"), col("o.k") === col("n.k"), "full_outer")
          .select(
            when(col("o.k").isNull, "insert")
              .when(col("n.k").isNull, "delete")
              .when(col("o.price") =!= col("n.price"), "update")
              .otherwise("same").as("change_type"))
          .groupBy("change_type").agg(count(lit(1)).as("n"))
          .orderBy("change_type")
      },
      Some("""WITH old AS (SELECT o_orderkey AS k, o_totalprice AS price
        FROM orders WHERE o_orderkey % 10 <> 0),
      neu AS (SELECT o_orderkey AS k,
          CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 100.0
               ELSE o_totalprice END AS price
        FROM orders WHERE o_orderkey % 10 <> 1)
      SELECT CASE WHEN o.k IS NULL THEN 'insert'
                  WHEN n.k IS NULL THEN 'delete'
                  WHEN o.price <> n.price THEN 'update'
                  ELSE 'same' END AS change_type, COUNT(*) AS n
      FROM old o FULL OUTER JOIN neu n ON o.k = n.k
      GROUP BY 1 ORDER BY 1""")),

    // ---- LLM sequence packing (cumulative-budget bucketing) -----------
    // Pack documents (n_chars as the token proxy) into training
    // sequences of budget 8192: seq = floor(chars-before-me / budget)
    // over a deterministic document order. At 100 TB the ORDER BY runs
    // per shard (partitionBy(shard)); this is the per-shard kernel.
    "q103_seq_packing" -> QueryDef(
      (s, dir) => {
        val w = Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            coalesce(sum(col("n_chars")).over(w), lit(0L)).as("before"))
          .withColumn("seq_id", floor(col("before") / lit(8192)))
          .groupBy("seq_id")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("total_chars"))
          .orderBy("seq_id")
      },
      Some("""WITH c AS (SELECT doc_id, n_chars,
        COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM documents)
      SELECT CAST(FLOOR(before / 8192) AS BIGINT) AS seq_id,
        COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM c GROUP BY 1 ORDER BY 1""")),

    // ---- mode (most frequent value, deterministic tie-break) ----------
    // DuckDB's mode() ties are nondeterministic, so both sides use the
    // explicit count + rank form: two hash aggregations + one tiny
    // window over the group's candidate set.
    "q106_agg_mode" -> QueryDef(
      (s, dir) => {
        val counts = t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
          .groupBy("l_returnflag", "qty").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("l_returnflag")
          .orderBy(col("cnt").desc, col("qty"))
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_returnflag"), col("qty").as("mode_qty"), col("cnt"))
          .orderBy("l_returnflag")
      },
      Some("""WITH c AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
        COUNT(*) AS cnt FROM lineitem GROUP BY 1, 2),
      r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
        ORDER BY cnt DESC, qty) AS rn FROM c)
      SELECT l_returnflag, qty AS mode_qty, cnt
      FROM r WHERE rn = 1 ORDER BY l_returnflag""")),

    // ---- fixed-width histogram ----------------------------------------
    // width_bucket-style binning as pure arithmetic (identical IEEE
    // floor/divide both engines); one hash aggregation.
    "q108_histogram" -> QueryDef(
      (s, dir) => t(s, dir, "orders")
        .select(least(floor(col("o_totalprice") / lit(50000.0)), lit(9.0))
          .cast("long").as("bucket"),
          col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("bucket"),
      Some(s"""SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 9.0) AS BIGINT)
          AS bucket, COUNT(*) AS n, ${dsumSql("o_totalprice")} AS sum_price
      FROM orders GROUP BY 1 ORDER BY 1""")),

    // ---- INTERSECT ALL (multiset intersection) ------------------------
    // Spark plans intersectAll as a count-balancing aggregate (no row
    // explosion) — multiplicity = min(count_left, count_right).
    "q119_set_intersect_all" -> QueryDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val a = li.filter(col("l_quantity") < 10)
          .select(pmod(col("l_partkey"), lit(500L)).as("k"))
        val b = li.filter(col("l_quantity") > 40)
          .select(pmod(col("l_partkey"), lit(500L)).as("k"))
        a.intersectAll(b)
          .groupBy("k").agg(count(lit(1)).as("n"))
          .orderBy("k")
      },
      Some("""WITH i AS (
        SELECT l_partkey % 500 AS k FROM lineitem WHERE l_quantity < 10
        INTERSECT ALL
        SELECT l_partkey % 500 AS k FROM lineitem WHERE l_quantity > 40)
      SELECT k, COUNT(*) AS n FROM i GROUP BY k ORDER BY k""")),

    // ---- text normalization (lowercase, strip, collapse whitespace) ---
    // Pure per-row string kernels — stateless, fully codegen'd, no
    // shuffle; the token count uses the length-difference identity so
    // both engines compute it with identical integer arithmetic.
    "q104_text_normalize" -> QueryDef(
      (s, dir) => {
        val norm = trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
        t(s, dir, "documents")
          .select(col("doc_id"), norm.as("norm"))
          .select(col("doc_id"),
            substring(col("norm"), 1, 80).as("prefix"),
            when(col("norm") === "", lit(0L))
              .otherwise(length(col("norm"))
                - length(regexp_replace(col("norm"), " ", "")) + 1)
              .cast("long").as("n_tokens"))
          .orderBy("doc_id")
      },
      Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(
          regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
        FROM documents)
      SELECT doc_id, substring(norm, 1, 80) AS prefix,
        CAST(CASE WHEN norm = '' THEN 0
             ELSE length(norm) - length(replace(norm, ' ', '')) + 1 END AS BIGINT)
          AS n_tokens
      FROM n ORDER BY doc_id""")),

    // ---- stratified sampling (deterministic per-stratum top-k) --------
    // Each language stratum contributes its 20 lowest multiplicative-
    // hash docs: one window shuffle on the stratum key; the same rows
    // win on any cluster layout (vs rand()'s retry nondeterminism).
    "q105_stratified_sample" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("lang")
          .orderBy(pmod(col("doc_id") * lit(2654435761L), lit(1000000L)),
            col("doc_id"))
        t(s, dir, "documents")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .select(col("lang"), col("doc_id"), col("n_chars"))
          .orderBy("lang", "doc_id")
      },
      Some("""WITH r AS (SELECT lang, doc_id, n_chars,
        row_number() OVER (PARTITION BY lang
          ORDER BY (doc_id * 2654435761) % 1000000, doc_id) AS rn
        FROM documents)
      SELECT lang, doc_id, n_chars FROM r WHERE rn <= 20
      ORDER BY lang, doc_id""")),

    // ---- null-safe equality join (<=> / IS NOT DISTINCT FROM) ---------
    "q110_join_null_safe" -> QueryDef(
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .select(col("c_custkey"),
            nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
        val dim = cust.select(col("seg")).distinct()
          .select(col("seg"), coalesce(col("seg"), lit("(none)")).as("label"))
        cust.as("c").join(dim.as("d"), col("c.seg") <=> col("d.seg"))
          .groupBy("label").agg(count(lit(1)).as("n_cust"))
          .orderBy("label")
      },
      Some("""WITH cust AS (SELECT c_custkey,
          nullif(c_mktsegment, 'BUILDING') AS seg FROM customer),
      dim AS (SELECT seg, COALESCE(seg, '(none)') AS label
        FROM (SELECT DISTINCT seg FROM cust))
      SELECT d.label, COUNT(*) AS n_cust
      FROM cust c JOIN dim d ON c.seg IS NOT DISTINCT FROM d.seg
      GROUP BY d.label ORDER BY d.label""")),

    // ---- date spine + gap fill (0-fill and LOCF) ----------------------
    // sequence()+explode generates the spine from the data's own
    // bounds; LOCF is last(ignoreNulls) over an ordered frame. At
    // 100 TB the spine is tiny (days) and the join broadcasts it.
    "q107_date_spine_gapfill" -> QueryDef(
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .filter(pmod(col("o_custkey"), lit(50L)) === 0)
          .groupBy(col("o_orderdate").cast("date").as("d"))
          .agg(count(lit(1)).as("n_raw"))
        val spine = daily.agg(min("d").as("lo"), max("d").as("hi"))
          .select(explode(sequence(col("lo"), col("hi"))).as("d"))
        val w = Window.orderBy("d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(daily, Seq("d"), "left")
          .select(col("d"), coalesce(col("n_raw"), lit(0L)).as("n"),
            last(col("n_raw"), ignoreNulls = true).over(w).as("locf"))
          .orderBy("d")
      },
      Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
          COUNT(*) AS n_raw FROM orders WHERE o_custkey % 50 = 0 GROUP BY 1),
      b AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
      spine AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
          CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d FROM b)
      SELECT s.d, COALESCE(n_raw, 0) AS n,
        last_value(n_raw IGNORE NULLS) OVER (ORDER BY s.d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf
      FROM spine s LEFT JOIN daily USING (d) ORDER BY s.d""")),

    // ---- URL synthesis + parse + blocklist filter ---------------------
    // regexp_extract host/path parsing (portable to the oracle, unlike
    // parse_url); per-row kernels then one hash aggregation.
    "q114_llm_url_parse" -> QueryDef(
      (s, dir) => {
        val url = concat(lit("https://"), col("source"),
          lit(".example.com/docs/"), col("doc_id").cast("string"),
          lit("?lang="), col("lang"))
        t(s, dir, "documents")
          .select(col("doc_id"), url.as("url"))
          .select(col("doc_id"),
            regexp_extract(col("url"), "https://([^/?]+)", 1).as("host"),
            regexp_extract(col("url"), "/docs/([0-9]+)", 1)
              .cast("long").as("path_id"))
          .filter(col("host") =!= "src0.example.com")
          .groupBy("host")
          .agg(count(lit(1)).as("n_docs"), max(col("path_id")).as("max_doc"))
          .orderBy("host")
      },
      Some("""WITH u AS (SELECT doc_id, 'https://' || source ||
          '.example.com/docs/' || CAST(doc_id AS VARCHAR) ||
          '?lang=' || lang AS url FROM documents),
      p AS (SELECT doc_id,
          regexp_extract(url, 'https://([^/?]+)', 1) AS host,
          CAST(regexp_extract(url, '/docs/([0-9]+)', 1) AS BIGINT) AS path_id
        FROM u)
      SELECT host, COUNT(*) AS n_docs, MAX(path_id) AS max_doc
      FROM p WHERE host <> 'src0.example.com'
      GROUP BY host ORDER BY host""")),

    // ---- contamination overlap score (fraction, not just threshold) ---
    // q75's decontamination join, but scoring: shared-shingle fraction
    // per corpus doc. The shingle index carries each doc's distinct-
    // shingle count through the join, so the score needs no second
    // aggregation over text.
    "q116_llm_contamination_score" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val c = graft.operators.Dedup.shingleIndex(
          docs.filter(col("source") =!= "src0"), "doc_id", "text", 3)
        val b = graft.operators.Dedup.shingleIndex(
          docs.filter(col("source") === "src0"), "doc_id", "text", 3)
          .select(col("gh")).distinct()
        c.join(broadcast(b), "gh")
          .groupBy(col("doc_id"), col("__n").as("n_total"))
          .agg(count(lit(1)).as("n_shared"))
          .select(col("doc_id"), col("n_shared"), col("n_total"),
            round(col("n_shared").cast("double")
              / col("n_total").cast("double"), 6).as("frac"))
          .filter(col("n_shared") >= 3)
          .orderBy("doc_id")
      },
      Some("""WITH sp AS (SELECT doc_id, source, string_split(text, ' ') AS w
        FROM documents),
      sh0 AS (SELECT doc_id, source, w[i.i] || '_' || w[i.i+1] || '_' || w[i.i+2] AS g
        FROM sp, (SELECT unnest(range(1, 1000)) AS i) i WHERE i.i + 2 <= len(w)),
      sh AS (SELECT DISTINCT doc_id, source, g FROM sh0),
      tot AS (SELECT doc_id, COUNT(*) AS n_total FROM sh
        WHERE source <> 'src0' GROUP BY doc_id),
      bench AS (SELECT DISTINCT g FROM sh WHERE source = 'src0'),
      shared AS (SELECT c.doc_id, COUNT(*) AS n_shared
        FROM sh c JOIN bench b ON c.g = b.g
        WHERE c.source <> 'src0' GROUP BY c.doc_id)
      SELECT s.doc_id, s.n_shared, t.n_total,
        round(CAST(s.n_shared AS DOUBLE) / CAST(t.n_total AS DOUBLE), 6) AS frac
      FROM shared s JOIN tot t ON s.doc_id = t.doc_id
      WHERE s.n_shared >= 3 ORDER BY s.doc_id"""))
  )
}
