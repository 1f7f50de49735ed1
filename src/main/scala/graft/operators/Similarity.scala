package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.plans.NativeExpressions

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the corpus, so the corpus is scanned once with no shuffle of
  * the big side; per-query top-k via window rank. At 100 TB the scale
  * path is [[lshTopK]]: bucket corpus and queries by random-hyperplane
  * sign bits and only score within matching buckets (recall < 1,
  * bounded work per bucket).
  *
  * CACHE LIFETIME CONTRACT: the few persists that remain here
  * (ivfLloydTopK's quantized coords + final centroids,
  * lshKnnEdgesDeduped's duplicate-group map) back the RETURNED frame
  * and cannot be released inside the call; their scope is the returned
  * frame's lifetime (the Verify/Bench harness clearCache()s between
  * queries; embedders that outlive the result must do the same).
  * Everything with a call-local lifecycle releases in place: pqCodes /
  * ivfPqIndex unpersist after their scratch-parquet writes, and the
  * iterative builds (nnDescentEdges, the beam walks) cut every round
  * boundary to scratch parquet instead of persisting at all.
  */
object Similarity {

  /** Exact cosine top-k of `corpus` rows for each row of `queries`.
    * Scores are rounded to 6 digits *before* ranking so ordering is
    * reproducible across engines and partitionings; ties break on id.
    */
  def cosineTopK(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce
      k: Int): DataFrame = {
    NativeExpressions.register(queries.sparkSession)
    // norms once per side (not per pair); vec_dot is the codegen'd
    // native expression — tight primitive loop per candidate pair
    val q = queries.withColumn("qn", expr("sqrt(vec_dot(qe, qe))"))
    val c = corpus.withColumn("cn", expr("sqrt(vec_dot(ce, ce))"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Embedding-cosine near-dup pairs within a blocking column (e.g. a
    * cluster/label key): all same-block pairs with cosine >= threshold.
    * Blocking bounds the pair count; at 100 TB the block key would come
    * from LSH buckets ([[lshTopK]]) instead of a given label.
    */
  def cosinePairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    NativeExpressions.register(emb.sparkSession)
    val a = emb.select(col(idCol).as("va"), col(vecCol).as("ea"),
        col(blockCol).as("block"))
      .withColumn("na", expr("sqrt(vec_dot(ea, ea))"))
    val b = emb.select(col(idCol).as("vb"), col(vecCol).as("eb"),
        col(blockCol).as("blockb"))
      .withColumn("nb", expr("sqrt(vec_dot(eb, eb))"))
    a.join(b, col("block") === col("blockb") && col("va") < col("vb"))
      .select(col("va"), col("vb"), col("block").cast("long").as("label"),
        round(expr("vec_dot(ea, eb)") / (col("na") * col("nb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Identical output to [[cosinePairs]], duplication-robust: group
    * bit-identical vectors first, score one representative pair per
    * UNIQUE vector pair, then expand matches through the duplicate
    * groups. On a corpus where each vector appears d times, the
    * expensive dot products drop from O((n·d)²) to O(n²) — the output
    * (which enumerates all qualifying id pairs) is still produced, but
    * as a cheap explode, not as d² recomputed cosines. Identical
    * doubles by construction: every emitted cosine is computed from
    * the same float values through the same expression, including the
    * intra-group case (cos(e,e) goes through the full formula, not a
    * literal 1.0 — a zero vector must yield NaN and drop, exactly as
    * the all-pairs form does).
    */
  def cosinePairsDeduped(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    NativeExpressions.register(emb.sparkSession)
    // NULL block keys produce no pairs in the all-pairs form (equi-join
    // semantics); filter them here so the intra-group path cannot
    // resurrect them (groupBy would bucket NULLs together).
    val g = emb.filter(col(blockCol).isNotNull)
      .groupBy(col(blockCol).as("block"), col(vecCol).as("e"))
      .agg(min(col(idCol)).as("rep"), collect_list(col(idCol)).as("ids"))
    val a = g.select(col("rep").as("ra"), col("e").as("ea"), col("block"))
      .withColumn("na", expr("sqrt(vec_dot(ea, ea))"))
    val b = g.select(col("rep").as("rb"), col("e").as("eb"),
        col("block").as("blockb"))
      .withColumn("nb", expr("sqrt(vec_dot(eb, eb))"))
    val repPairs = a
      .join(b, col("block") === col("blockb") && col("ra") < col("rb"))
      .select(col("ra"), col("rb"), col("block"),
        round(expr("vec_dot(ea, eb)") / (col("na") * col("nb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
    val cross = repPairs
      .join(g.select(col("rep").as("ra"), col("ids").as("idsa")), "ra")
      .join(g.select(col("rep").as("rb"), col("ids").as("idsb")), "rb")
      .select(explode(col("idsa")).as("x"), col("idsb"), col("block"), col("cos"))
      .select(col("x"), explode(col("idsb")).as("y"), col("block"), col("cos"))
      .select(least(col("x"), col("y")).as("va"),
        greatest(col("x"), col("y")).as("vb"),
        col("block").cast("long").as("label"), col("cos"))
    val intra = g
      .filter(size(col("ids")) > 1)
      .withColumn("cos", round(expr("vec_dot(e, e)")
        / (expr("sqrt(vec_dot(e, e))") * expr("sqrt(vec_dot(e, e))")), 6))
      .filter(col("cos") >= threshold)
      .select(explode(col("ids")).as("x"), col("ids"), col("block"), col("cos"))
      .select(col("x"), explode(col("ids")).as("y"), col("block"), col("cos"))
      .filter(col("x") < col("y"))
      .select(col("x").as("va"), col("y").as("vb"),
        col("block").cast("long").as("label"), col("cos"))
    cross.unionByName(intra)
  }

  /** IVF-style approximate top-k: a coarse quantizer (here: the first
    * `nlist` corpus vectors as centroids — deterministic; a production
    * build would k-means them) assigns every vector to its nearest
    * centroid; queries probe only their own centroid's bucket
    * (`nprobe`=1 simplification). Bucket assignment broadcasts the
    * centroid set and scans the corpus once; scoring then joins on the
    * bucket key with bounded per-bucket work — the alternative
    * scale path to [[lshTopK]].
    */
  def ivfTopK(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce
      k: Int,
      nlist: Int): DataFrame = {
    NativeExpressions.register(queries.sparkSession)
    val centroids = broadcast(
      corpus.orderBy("cid").limit(nlist)
        .select(col("cid").as("centroid_id"), col("ce").as("centroid")))

    def assign(df: DataFrame, vec: String): DataFrame = {
      // assignment ranks on the ROUNDED dot product (the q46 recipe):
      // raw doubles rank identically in practice, but rounding makes
      // the near-tie boundary engine-portable, which is what lets q77
      // carry an exact oracle
      val scored = df.crossJoin(centroids)
        .withColumn("__d", round(expr(s"vec_dot($vec, centroid)"), 6))
      val w = Window.partitionBy(df.columns.head)
        .orderBy(col("__d").desc, col("centroid_id"))
      scored.withColumn("__r", row_number().over(w))
        .filter(col("__r") === 1)
        .drop("__d", "__r", "centroid")
    }

    val qb = assign(queries.withColumn("qn", expr("sqrt(vec_dot(qe, qe))")), "qe")
    val cb = assign(corpus.withColumn("cn", expr("sqrt(vec_dot(ce, ce))")), "ce")
    val scored = qb.join(cb, "centroid_id")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** IVF with multi-probe (`nprobe` > 1): identical index to [[ivfTopK]]
    * — every corpus vector lives in exactly ONE bucket (its nearest
    * centroid) — but each query probes its `nprobe` nearest centroids
    * instead of only the first. This is THE standard recall knob for an
    * IVF index (the q275-family harness measured nprobe=1 at 0.46
    * average recall@5 — not production-usable): scanned-corpus fraction
    * grows ~nprobe/nlist while the index build cost is unchanged, and
    * because corpus buckets are disjoint and probe centroids are
    * pairwise distinct, no (qid, cid) candidate is generated twice — no
    * dedup pass. Ranking stays on the rounded dot (q46 recipe) so the
    * probe-set boundary is engine-portable and the recall queries carry
    * exact oracles.
    */
  /** Rank-1..`nKeep` nearest-centroid assignment by ROUNDED (6dp) dot
    * product with centroid-id tie-break — the ONE expression the whole
    * IVF / streaming-semdedup / dedup-first family's value-determinism
    * arguments hang on: identical vectors must land in identical cells,
    * across engines (the oracles replay exactly this ranking) and
    * across every caller (q77/q279/q291/q294/q298/q299 all route
    * through here — a rounding or tie-break tweak in one copy would
    * silently break the rep-vs-direct row-identity proofs). `cents`
    * must be the broadcast (centroid_id, centroid) frame; rows keep
    * their own columns plus `centroid_id`.
    */
  def assignToCentroids(df: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, nKeep: Int = 1): DataFrame = {
    NativeExpressions.register(df.sparkSession)
    val scored = df.crossJoin(cents)
      .withColumn("__d", round(expr(s"vec_dot($vecCol, centroid)"), 6))
    if (nKeep == 1) {
      // the rank-1 argmax — (__d DESC, centroid_id ASC) — as a
      // map-side-combinable aggregate: max(struct(__d, -centroid_id))
      // is value-identical to the rank-1 window row, but the
      // crossJoin's nlist-per-id rows collapse in the partial
      // aggregate BEFORE any exchange, where the window form sorted
      // the full nu·nlist frame through a shuffle (at the 100×
      // probe's re-derived nlist=512 index that window was a
      // 102M-row sort — q320's dominant term). `first` of the
      // carried columns is deterministic because ids are unique in
      // every caller's frame (one row per cid/rep — the crossJoin
      // replicates them verbatim per centroid).
      val others = df.columns.filter(_ != idCol).toSeq
      val aggs = max(struct(col("__d"),
          (-col("centroid_id")).as("__nid"))).as("__m") +:
        others.map(c => first(col(c)).as(c))
      scored.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
        .withColumn("centroid_id", -col("__m.__nid"))
        .select(df.columns.map(col).toSeq :+ col("centroid_id"): _*)
    } else {
      val w = Window.partitionBy(idCol)
        .orderBy(col("__d").desc, col("centroid_id"))
      scored.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= nKeep)
        .drop("__d", "__r", "centroid")
    }
  }

  def ivfTopKProbe(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce
      k: Int,
      nlist: Int,
      nprobe: Int): DataFrame = {
    NativeExpressions.register(queries.sparkSession)
    val centroids = broadcast(
      corpus.orderBy("cid").limit(nlist)
        .select(col("cid").as("centroid_id"), col("ce").as("centroid")))

    val qb = assignToCentroids(
      queries.withColumn("qn", expr("sqrt(vec_dot(qe, qe))")),
      "qid", "qe", centroids, nprobe)
    val cb = assignToCentroids(
      corpus.withColumn("cn", expr("sqrt(vec_dot(ce, ce))")),
      "cid", "ce", centroids, 1)
    val scored = qb.join(cb, "centroid_id")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** ATTRIBUTE-FILTERED IVF serving (q318/q320) — the most common
    * production vector-query shape: filter by metadata (lang, source,
    * date window), THEN nearest neighbors. The index is the STANDING
    * full-corpus one ([[ivfTopKProbe]]'s: centroids and cell
    * assignments are built over the WHOLE corpus and do not change per
    * filter — rebuilding an index per predicate is not a serving
    * pattern); the filter applies at QUERY TIME to the scanned cell
    * lists, as a semi-join against `keep` (cid) — production pushes
    * the predicate into the cell-list scan over the metadata column,
    * which the semi-join models without binding this operator to where
    * the attribute lives. The known failure mode this operator exists
    * to measure: under a selective filter the probed cells EMPTY OUT —
    * expected surviving candidates ≈ sel·nu·nprobe/nlist — so recall
    * collapses unless nprobe is raised (over-probing, the q318 sweep)
    * or the filtered subset is brute-forced outright (fNu ≤ budget —
    * the advisor's filtered short-circuit, q320). Scale shape:
    * identical to [[ivfTopKProbe]] plus one hash semi-join on the
    * candidate side (filter-sized build, broadcastable when the
    * predicate is selective).
    */
  def ivfTopKProbeWhere(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce — the standing index's corpus (FULL)
      keep: DataFrame, // cid — ids passing the metadata predicate
      k: Int,
      nlist: Int,
      nprobe: Int): DataFrame = {
    val cents = ivfCentroids(corpus, nlist)
    ivfTopKProbeWhereIndexed(queries, cents,
      ivfAssignIndex(corpus, cents), keep, k, nprobe)
  }

  /** The standing IVF index's centroid set (the family's deterministic
    * seeding convention: the nlist lowest-id corpus vectors). */
  def ivfCentroids(corpus: DataFrame, nlist: Int): DataFrame = {
    NativeExpressions.register(corpus.sparkSession)
    broadcast(corpus.orderBy("cid").limit(nlist)
      .select(col("cid").as("centroid_id"), col("ce").as("centroid")))
  }

  /** The standing IVF index TABLE: every corpus vector with its norm
    * and rank-1 cell (cid, ce, cn, centroid_id) — the build-once
    * artifact a serving tier keeps resident. Exposed so queries whose
    * nlist grows with the corpus (q320's re-derived serve) can route
    * the build through FixtureArtifact instead of re-assigning
    * nu·nlist dots inline per serve. */
  def ivfAssignIndex(corpus: DataFrame, cents: DataFrame): DataFrame = {
    NativeExpressions.register(corpus.sparkSession)
    assignToCentroids(
      corpus.withColumn("cn", expr("sqrt(vec_dot(ce, ce))")),
      "cid", "ce", cents, 1)
  }

  /** [[ivfTopKProbeWhere]] against a prebuilt index table `cb`
    * ([[ivfAssignIndex]]'s shape). */
  def ivfTopKProbeWhereIndexed(
      queries: DataFrame, // qid, qe
      cents: DataFrame, // centroid_id, centroid (broadcast)
      cb: DataFrame, // cid, ce, cn, centroid_id — the standing index
      keep: DataFrame, // cid — ids passing the metadata predicate
      k: Int,
      nprobe: Int): DataFrame = {
    NativeExpressions.register(queries.sparkSession)
    val qb = assignToCentroids(
      queries.withColumn("qn", expr("sqrt(vec_dot(qe, qe))")),
      "qid", "qe", cents, nprobe)
    val filtered = cb.join(keep.select("cid"), Seq("cid"), "left_semi")
    val scored = qb.join(filtered, "centroid_id")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** IVF with a Lloyd-REFINED coarse quantizer: seed centroids from the
    * first `nlist` corpus vectors, run `rounds` k-means iterations on
    * the int64-quantized embeddings (the q225 kernel — floor(x·1e6)
    * coordinates, exact int64 squared distances, floor-mean updates:
    * bit-portable cross-engine), then probe/assign like [[ivfTopKProbe]]
    * but ranking on exact quantized L2 (dist ASC, centroid id ties).
    * The point on the cost/recall frontier: a better-fitting quantizer
    * buys recall at LOWER nprobe — balanced cells mean a query's true
    * neighbors concentrate in fewer lists, so the same recall costs
    * fewer scanned candidates (in production nlist also grows with N,
    * keeping cells bounded). A centroid that loses every member after a
    * round simply drops out (its list is empty — standard k-means
    * behavior; assignment ranks over surviving centroids).
    */
  def ivfLloydTopK(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce
      k: Int,
      nlist: Int,
      nprobe: Int,
      rounds: Int = 1): DataFrame = {
    NativeExpressions.register(queries.sparkSession)
    def quant(df: DataFrame, id: String, vec: String): DataFrame = df
      .select(col(id), posexplode(col(vec)))
      .select(col(id), (col("pos") + 1).as("i"),
        floor(col("col").cast("double") * lit(1000000L)).as("x"))
    val e = quant(corpus, "cid", "ce")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seeds = corpus.orderBy("cid").limit(nlist).select(col("cid"))
    var cents = e.join(broadcast(seeds), Seq("cid"))
      .select(col("cid").as("ccid"), col("i"), col("x").as("c"))
    def assignAll(): DataFrame = e.join(broadcast(cents), Seq("i"))
      .groupBy("cid", "ccid")
      .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("dist"))
    for (_ <- 1 to rounds) {
      val asg = assignAll().withColumn("rn", row_number().over(
          Window.partitionBy("cid").orderBy(col("dist"), col("ccid"))))
        .filter(col("rn") === 1).select(col("cid"), col("ccid"))
      cents = e.join(asg, Seq("cid")).groupBy("ccid", "i")
        .agg(floor(sum("x").cast("double") / count(lit(1))).as("c"))
    }
    cents = cents.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ca = assignAll().withColumn("rn", row_number().over(
        Window.partitionBy("cid").orderBy(col("dist"), col("ccid"))))
      .filter(col("rn") === 1).select(col("cid"), col("ccid"))
    val qa = quant(queries, "qid", "qe").join(broadcast(cents), Seq("i"))
      .groupBy("qid", "ccid")
      .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("dist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("dist"), col("ccid"))))
      .filter(col("rn") <= nprobe).select(col("qid"), col("ccid"))
    val q = queries.withColumn("qn", expr("sqrt(vec_dot(qe, qe))"))
    val c = corpus.withColumn("cn", expr("sqrt(vec_dot(ce, ce))"))
    val scored = qa.join(ca, "ccid")
      .join(broadcast(q), "qid").join(c, "cid")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Multi-table LSH top-k (the classic L-table OR-construction): build
    * `nTables` INDEPENDENT hyperplane tables (seeds 42, 43, …, so table
    * 0 is exactly [[lshTopK]]'s) and take the union of same-bucket
    * candidates across tables before scoring. Where multi-probe widens
    * one table's probe set, extra tables re-draw the partition itself —
    * recall compounds as 1-(1-p)^L. Cost shape: the corpus is bucketed
    * L times (that IS the multi-table index: L·|C| narrow (key, id)
    * index rows — at 100 TB each table is one more shuffle-light pass
    * over vectors already in memory), candidates are deduped on
    * (qid, cid) BEFORE any dot product is computed, and scoring joins
    * the bounded query set broadcast + one hash join on cid.
    */
  def lshMultiTableTopK(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce
      k: Int,
      nPlanes: Int,
      dim: Int,
      nTables: Int): DataFrame = {
    NativeExpressions.register(queries.sparkSession)
    def tableKeys(vec: String): Column = array((0 until nTables).map { t =>
      val planes = hyperplanes(nPlanes, dim, seed = 42L + t)
      VectorFunctions.hyperplaneBucket(col(vec), planes) +
        lit(t.toLong * (1L << nPlanes))
    }: _*)
    val qb = queries.select(col("qid"), explode(tableKeys("qe")).as("tb"))
    val cb = corpus.select(col("cid"), explode(tableKeys("ce")).as("tb"))
    val cand = qb.join(cb, "tb").filter(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
    val q = queries.withColumn("qn", expr("sqrt(vec_dot(qe, qe))"))
    val c = corpus.withColumn("cn", expr("sqrt(vec_dot(ce, ce))"))
    val scored = cand.join(broadcast(q), "qid").join(c, "cid")
      .select(col("qid"), col("cid"),
        round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Deterministic pseudo-random hyperplanes (linear-congruential doubles
    * in [-1, 1]) — fixed seed so bucketing is stable run to run.
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    var state = seed
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Seq.fill(nPlanes)(Seq.fill(dim)(next()))
  }

  /** Approximate top-k: score only within matching hyperplane-sign
    * buckets. The bucket join shuffles on the bucket key — bounded
    * per-bucket work instead of a full cross join.
    */
  def lshTopK(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce
      k: Int,
      nPlanes: Int,
      dim: Int): DataFrame = {
    NativeExpressions.register(queries.sparkSession)
    val planes = hyperplanes(nPlanes, dim)
    val qb = queries.withColumn("bucket",
        VectorFunctions.hyperplaneBucket(col("qe"), planes))
      .withColumn("qn", expr("sqrt(vec_dot(qe, qe))"))
    val cb = corpus.withColumn("bucket",
        VectorFunctions.hyperplaneBucket(col("ce"), planes))
      .withColumn("cn", expr("sqrt(vec_dot(ce, ce))"))
    val scored = qb.join(cb, "bucket")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Multi-probe LSH top-k (Lv et al.): each query probes its own
    * bucket PLUS every bucket at Hamming distance 1 in sign-bit space
    * (nPlanes + 1 probes total) — the standard recall fix when the
    * single-probe recall (measured by the q275 harness) is too low.
    * Candidate coverage multiplies by a FIXED constant while the corpus
    * stays bucketed exactly once, so the scale shape is [[lshTopK]]'s
    * with a (nPlanes+1)× probe-side fan-out; a corpus vector lives in
    * exactly one bucket and probe buckets are pairwise distinct, so no
    * (qid, cid) candidate is generated twice — no dedup pass needed.
    */
  def lshMultiProbeTopK(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce
      k: Int,
      nPlanes: Int,
      dim: Int): DataFrame = {
    NativeExpressions.register(queries.sparkSession)
    val planes = hyperplanes(nPlanes, dim)
    val probes = col("bucket0") +:
      (0 until nPlanes).map(j => expr(s"bucket0 ^ ${1L << j}"))
    val qb = queries.withColumn("bucket0",
        VectorFunctions.hyperplaneBucket(col("qe"), planes))
      .withColumn("qn", expr("sqrt(vec_dot(qe, qe))"))
      .withColumn("bucket", explode(array(probes: _*)))
    val cb = corpus.withColumn("bucket",
        VectorFunctions.hyperplaneBucket(col("ce"), planes))
      .withColumn("cn", expr("sqrt(vec_dot(ce, ce))"))
    val scored = qb.join(cb, "bucket")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Bounded-degree neighbor graph for graph-based ANN: every corpus
    * vector keeps directed edges to its top-`d` SAME-LSH-BUCKET
    * neighbors by (rounded) cosine, ties on id. Bucketing bounds the
    * pair generation (per-bucket work, never all-pairs — the
    * [[lshTopK]] argument); the degree cap bounds the graph to d·|C|
    * edges, which is what makes beam search over it cheap. At 100 TB
    * this build is one bucket-keyed shuffle + a per-node top-d window;
    * production systems refine such an LSH-seeded graph with NN-Descent
    * rounds, which would slot in here as extra (join + window) passes.
    */
  def lshKnnEdges(corpus: DataFrame /* cid, ce */ , d: Int, nPlanes: Int,
      dim: Int, seed: Long = 42L): DataFrame = {
    NativeExpressions.register(corpus.sparkSession)
    val planes = hyperplanes(nPlanes, dim, seed)
    val cb = corpus.withColumn("bucket",
        VectorFunctions.hyperplaneBucket(col("ce"), planes))
      .withColumn("cn", expr("sqrt(vec_dot(ce, ce))"))
    val a = cb.select(col("cid").as("u"), col("ce").as("ue"),
      col("cn").as("un"), col("bucket"))
    val b = cb.select(col("cid").as("v"), col("ce").as("ve"),
      col("cn").as("vn"), col("bucket"))
    val scored = a.join(b, Seq("bucket")).filter(col("u") =!= col("v"))
      .select(col("u"), col("v"),
        round(expr("vec_dot(ue, ve)") / (col("un") * col("vn")), 6).as("cos"))
    val w = Window.partitionBy("u").orderBy(col("cos").desc, col("v"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= d)
      .select(col("u"), col("v"))
  }

  /** kNN-graph edges STITCHED across `nTables` independent LSH tables
    * (seeds `42L..42L+nTables-1`, the q280 OR-construction applied to
    * the GRAPH BUILD): per table, per-bucket top-`d` out-edges per
    * node; the DISTINCT union links nodes that share a bucket in ANY
    * table. The q301/q302 measurements showed why this is not
    * optional: a single-table bucket-restricted kNN graph is
    * DISCONNECTED (≤ 2^nPlanes components by construction — an edge
    * never crosses a bucket boundary), so a beam walk can never leave
    * its entry's component and recall SATURATES regardless of degree,
    * beam width, or rounds (measured flat at 0.068 from d=8 through
    * d=32). Cross-table stitching is the cheap connectivity fix:
    * degree ≤ d·nTables, the build stays bucket-bounded per table,
    * and components merge because independent hyperplane draws cut the
    * space differently.
    */
  def lshKnnEdgesMultiTable(corpus: DataFrame /* cid, ce */ , d: Int,
      nPlanes: Int, dim: Int, nTables: Int): DataFrame =
    // per-table build is the DEDUPED form (edge-identical to the direct
    // build, property-tested): on a replicated corpus the direct
    // per-bucket pair generation is quadratic in copies — the first
    // stitched probe measured 6×/decade before this, 100× at 221 s
    (0 until nTables)
      .map(t => lshKnnEdgesDeduped(corpus, d, nPlanes, dim, 42L + t))
      .reduce(_ unionByName _)
      .distinct()

  /** Identical edge set to [[lshKnnEdges]], duplication-robust: group
    * bit-identical vectors, score one dot per UNIQUE vector pair per
    * bucket, then reconstruct per-member top-d through the duplicate
    * groups. On a corpus where each vector appears c times, the dots
    * drop from O((n·c)² ) to O(n²) per bucket — the round-6 100× probe
    * measured the all-copies build at 454 s (11.7×/decade) on the
    * 100-copies fixture, which is exactly this shape.
    *
    * Correctness of the group cap: a member's top-d candidates are
    * ranked by (cos DESC, id). Keep the top d+1 GROUPS per source rep
    * under (cos DESC, rep): any group ranked below d+1 is outranked by
    * ≥ d+1 members — strictly-higher-cos groups each supply one, and
    * an equal-cos group with smaller rep supplies its rep, whose id is
    * smaller than every id in the later group (rep = min id, so rep
    * order IS first-member order within a cos tie). Self-groups (the
    * copies of one vector) enter with cos computed through the full
    * formula (a zero vector yields NaN and drops, exactly as the
    * all-pairs form does — the cosinePairsDeduped rule).
    */
  def lshKnnEdgesDeduped(corpus: DataFrame /* cid, ce */ , d: Int,
      nPlanes: Int, dim: Int, seed: Long = 42L): DataFrame = {
    NativeExpressions.register(corpus.sparkSession)
    val planes = hyperplanes(nPlanes, dim, seed)
    val g = corpus.groupBy(col("ce"))
      .agg(min("cid").as("rep"), collect_list("cid").as("ids"))
      .withColumn("bucket", VectorFunctions.hyperplaneBucket(col("ce"), planes))
      .withColumn("nn", expr("sqrt(vec_dot(ce, ce))"))
      .persist()
    val a = g.select(col("rep").as("ra"), col("ce").as("ea"),
      col("nn").as("na"), col("bucket"), col("ids").as("idsa"))
    val b = g.select(col("rep").as("rb"), col("ce").as("eb"),
      col("nn").as("nb"), col("bucket"), col("ids").as("idsb"))
    val rp = a.join(b, Seq("bucket")).filter(col("ra") =!= col("rb"))
      .select(col("ra"), col("idsa"), col("rb"), col("idsb"),
        round(expr("vec_dot(ea, eb)") / (col("na") * col("nb")), 6).as("cos"))
    val self = g.filter(size(col("ids")) > 1)
      .select(col("rep").as("ra"), col("ids").as("idsa"),
        col("rep").as("rb"), col("ids").as("idsb"),
        round(expr("vec_dot(ce, ce)")
          / (col("nn") * col("nn")), 6).as("cos"))
    val wg = Window.partitionBy("ra").orderBy(col("cos").desc, col("rb"))
    val kept = rp.unionByName(self)
      .withColumn("gr", row_number().over(wg)).filter(col("gr") <= d + 1)
    val cands = kept
      .select(explode(col("idsa")).as("u"), col("idsb"), col("cos"))
      .select(col("u"), explode(col("idsb")).as("v"), col("cos"))
      .filter(col("u") =!= col("v"))
    val w = Window.partitionBy("u").orderBy(col("cos").desc, col("v"))
    cands.withColumn("rn", row_number().over(w)).filter(col("rn") <= d)
      .select(col("u"), col("v"))
  }

  /** NN-Descent edge refinement (Dong et al., WWW'11): iteratively
    * improve an approximate kNN graph by exploiting that "a neighbor of
    * a neighbor is likely a neighbor". Each round treats the current
    * edges as UNDIRECTED (the paper's reverse-neighbor step: u→v also
    * makes u a candidate for v), generates neighbor-of-neighbor
    * candidates through one self-join, scores every candidate pair by
    * rounded cosine, and keeps the best `d` out-edges per node — so the
    * edge set monotonically approaches the true kNN graph. This is the
    * production refinement step the q303 measurement called for: the
    * LSH-stitched build fixes CONNECTIVITY but its edges are only
    * bucket-local guesses; refinement replaces them with genuinely
    * nearest neighbors, which is what a beam walk needs to hill-climb.
    *
    * Scale shape: the symmetrize step takes each node's out-edges plus
    * at most `d` REVERSE neighbors (row_number by partner id — the
    * deterministic form of the paper's ρ·K reverse-neighbor sampling),
    * so und-degree ≤ 2d BY CONSTRUCTION and the per-node candidate set
    * is ≤ 2d + 4d² — independent of corpus size AND of the input
    * graph's in-degree distribution. The cap is not optional at scale:
    * the build caps OUT-degree only, and on the duplication-heavy 100×
    * fixture the per-member top-d reconstruction points every copy of
    * a group at the same few lowest-id members of the neighbor group —
    * in-degree hubs of ~100+, whose uncapped deg² term measured 361 s
    * (4.85×/decade) at 100× vs 148 s (2.42×/decade) capped on the same
    * local[4] probe (PROBES_r9.json), identical recall at the swept
    * dials. Each round is two linear hash joins
    * (vector lookup per endpoint) plus a window whose groups are
    * bounded; nothing is ever all-pairs, and on a replicated corpus
    * the work grows linearly with members (no copies² term).
    *
    * Every round boundary — including the INPUT edge set — is
    * materialized to scratch parquet, not persist(): each round's edge
    * frame feeds three lineage paths in the next round (direct union,
    * both sides of the NoN self-join), and cache substitution does NOT
    * reliably replace a cached subtree that reaches the plan through
    * unionByName + self-join aliasing — the round-1 cands job was
    * measured RE-EXECUTING the entire upstream stitched-LSH build
    * (every per-table bucket join, concurrently via its broadcast
    * exchanges) despite the input being persisted and materialized:
    * 55 s of refinement fell to 9 s at sf0.1 with the parquet cut. A
    * graph build is an artifact pipeline anyway — each round's output
    * is a degree-bounded edge list (≤ d rows/node), so the write is
    * the cheapest stage of the round. No caches survive the call.
    */
  def nnDescentEdges(edges0: DataFrame /* u, v */ ,
      corpus: DataFrame /* cid, ce */ , d: Int, rounds: Int = 1): DataFrame = {
    val spark = corpus.sparkSession
    NativeExpressions.register(spark)
    val c = corpus.withColumn("nn", expr("sqrt(vec_dot(ce, ce))"))
    val cu = c.select(col("cid").as("u"), col("ce").as("ue"), col("nn").as("un"))
    val cv = c.select(col("cid").as("v"), col("ce").as("ve"), col("nn").as("vn"))
    def cut(df: DataFrame, label: String): DataFrame = {
      val out = graft.util.Scratch.dir(s"nndescent_$label")
      df.write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
    }
    var edges = cut(edges0.select(col("u"), col("v")), "e0")
    for (r <- 1 to rounds) {
      val wr = Window.partitionBy("u").orderBy("v")
      val rev = edges.select(col("v").as("u"), col("u").as("v"))
        .withColumn("rn", row_number().over(wr)).filter(col("rn") <= d)
        .select(col("u"), col("v"))
      val und = edges.unionByName(rev).distinct()
      val non = und.as("a").join(und.as("b"), col("a.v") === col("b.u"))
        .select(col("a.u").as("u"), col("b.v").as("v"))
      val cands = und.unionByName(non)
        .filter(col("u") =!= col("v")).distinct()
      val scored = cands.join(cu, Seq("u")).join(cv, Seq("v"))
        .select(col("u"), col("v"),
          round(expr("vec_dot(ue, ve)") / (col("un") * col("vn")), 6).as("cos"))
      val w = Window.partitionBy("u").orderBy(col("cos").desc, col("v"))
      edges = cut(scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= d).select(col("u"), col("v")), s"e$r")
    }
    edges
  }

  /** Standing-graph DELETE + COMPACTION — the other half of the
    * incremental maintenance story ([[graphInsertBatch]] inserts;
    * takedowns/TTL delete). Deletion is logical-then-physical: the
    * accumulated tombstone set drops every edge with a tombstoned
    * ENDPOINT (two anti-joins — u-side removes the node's own
    * out-list, v-side removes it from every standing node's out-list,
    * which is the read-time form of reverse-edge cleanup: no walk can
    * reach a deleted node), and the compaction pass repairs the
    * navigability damage — nodes that lost out-edges to deletion get
    * them back through `rounds` NN-Descent refinement rounds over the
    * pruned edge set and the SURVIVING corpus ([[nnDescentEdges]]:
    * candidates are neighbors-of-neighbors, scored exact, top-`d`
    * kept — tombstoned nodes cannot re-enter because the corpus join
    * no longer contains their vectors). On a COMPLETE seed the
    * pruned-then-refined graph is row-identical to a from-scratch
    * rebuild on the survivors (complete(V)∖T ≡ complete(V∖T) — the
    * spec's exact-equivalence anchor); on sparse production seeds the
    * equivalence is approximate and the harness measures the recall
    * the compacted graph actually serves (q321). Scale shape: two
    * hash anti-joins against the tombstone set (broadcastable — a
    * takedown set is small) + the refinement rounds' bounded-candidate
    * joins; nothing corpus-quadratic.
    */
  def graphDeleteCompact(
      edges: DataFrame, // u, v — the standing graph
      corpus: DataFrame, // cid, ce — cold storage (full, pre-delete)
      tombstones: DataFrame, // cid — deleted node ids
      d: Int,
      rounds: Int): DataFrame = {
    val t = tombstones.select("cid")
    val survivors = corpus.join(t, Seq("cid"), "left_anti")
    val pruned = edges
      .join(t.select(col("cid").as("u")), Seq("u"), "left_anti")
      .join(t.select(col("cid").as("v")), Seq("v"), "left_anti")
    nnDescentEdges(pruned, survivors, d, rounds)
  }

  /** Product-quantization top-k (Jégou et al., PAMI'11): split the
    * `dim`-dim space into `nSub` subspaces of dim/nSub dims, build a
    * per-subspace codebook from the sub-slices of the first `nCodes`
    * corpus vectors (the family's deterministic seeding convention),
    * encode every corpus vector as its per-subspace nearest code
    * (exact int64 quantized L2 — the q225 floor(x·1e6) kernel, bit-
    * portable cross-engine; ties on code id), and serve queries by
    * asymmetric distance computation (ADC): the query precomputes one
    * nq×nSub×nCodes partial-dot table (exact int64), and each
    * candidate's approximate dot is nSub table lookups summed —
    * ranked as an approximate cosine against the TRUE stored norms
    * (the standard norm-augmented code, 4 extra bytes/vector).
    *
    * This is the COMPRESSION axis of the ANN family, orthogonal to
    * pruning (IVF/LSH/graph) and prefix truncation (Matryoshka): the
    * corpus representation shrinks from dim·4 bytes to
    * nSub·log2(nCodes) bits + 1 norm (64-dim float → 8×4 bits + 4 B =
    * 32×), which at 100 TB is the difference between an index that
    * fits executor memory and one that doesn't. ADC still SCANS all
    * candidates (cost nSub lookups vs dim multiplies per candidate ≈
    * dim/nSub× cheaper); `rerank > 0` adds the standard second stage —
    * exact cosine over the per-query top-`rerank` ADC pool only — so
    * recall is bounded by pool containment (the q295 Matryoshka
    * lesson: the pool size is the dial, rerank recall == pool
    * containment).
    *
    * Scale shape: encoding is rep-level (one row per DISTINCT vector —
    * pure function of the vector, so replication-invariant by
    * construction) against a broadcast nCodes·dim codebook; the ADC
    * scan is one broadcast of the bounded query table hash-joined to
    * the n·nSub code rows with map-side partial aggregation; the
    * rerank join is pool-bounded. The encode runs through [[pqCodes]],
    * which materializes the code table and releases its own persists
    * (call-local lifecycle).
    */
  /** The broadcast PQ codebook for `corpus`: quantized (q225 kernel)
    * sub-slices of the first `nCodes` corpus vectors, one row per
    * (coordinate, code) — the family's deterministic seeding
    * convention. Shared by [[pqTopK]]'s encode/LUT and
    * [[beamPqTopKFrom]]'s LUT. */
  private def pqCodebook(corpus: DataFrame, nCodes: Int): DataFrame =
    broadcast(pqCodebookDF(corpus, nCodes))

  /** The PQ codebook ROWS (i, code, cx) for `corpus` — public so a
    * standing-index caller can materialize the codebook once as a
    * fixture artifact (nCodes·dim rows) and pass it back into the
    * walk/scan operators instead of re-deriving it from the corpus on
    * every micro-batch (guide §2.4). */
  def pqCodebookDF(corpus: DataFrame, nCodes: Int): DataFrame =
    quantCoords(corpus.orderBy("cid").limit(nCodes), "cid", "ce")
      .select(col("i"), col("cid").as("code"), col("x").as("cx"))

  /** Stored cosine norms (cid, cn) for `corpus` — index metadata (4
    * B/vector, written with the codes in a production layout); public
    * so standing-index callers can materialize it once as a fixture
    * artifact instead of re-scanning full vectors per walk round. */
  def cosNormsDF(corpus: DataFrame): DataFrame = {
    NativeExpressions.register(corpus.sparkSession)
    corpus.select(col("cid"), expr("sqrt(vec_dot(ce, ce))").as("cn"))
  }

  /** Per-member PQ codes (cid, s, code) — the RESIDENT compressed
    * representation shared by the scan-all server ([[pqTopK]]) and the
    * DiskANN-shaped graph server ([[beamPqTopKFrom]]): per-subspace
    * nearest code on exact int64 quantized L2 (ties on code id),
    * encoded at REP level (one row per distinct vector — a pure
    * function of the vector, replication-invariant) and expanded
    * through the duplicate-group map. The output is materialized to
    * scratch parquet before returning — an encode is an index-build
    * artifact (built once, served many), the write releases the
    * grouped-by-vector frame's persist HERE (call-local lifecycle, no
    * reliance on a harness-level clearCache), and every consumer then
    * plans against a flat scan instead of the encode tree. */
  def pqCodes(corpus: DataFrame, nSub: Int, nCodes: Int,
      dim: Int): DataFrame = {
    val spark = corpus.sparkSession
    NativeExpressions.register(spark)
    val dsub = dim / nSub
    require(dsub * nSub == dim, s"nSub $nSub must divide dim $dim")
    val cb = pqCodebook(corpus, nCodes)
    val grp = corpus.groupBy("ce")
      .agg(min("cid").as("rep"), collect_list("cid").as("ids"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val encDist = quantCoords(grp.select("rep", "ce"), "rep", "ce")
      .join(cb, Seq("i"))
      .groupBy(col("rep"), expr(s"(i - 1) div $dsub").as("s"), col("code"))
      .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).as("dist"))
    val enc = encDist.withColumn("rn", row_number().over(
        Window.partitionBy("rep", "s").orderBy(col("dist"), col("code"))))
      .filter(col("rn") === 1).select("rep", "s", "code")
    val codes = grp.select(col("rep"), explode(col("ids")).as("cid"))
      .join(enc, "rep").select("cid", "s", "code")
    val out = graft.util.Scratch.dir("pq_codes")
    codes.write.mode("overwrite").parquet(out)
    grp.unpersist()
    spark.read.parquet(out)
  }

  def pqTopK(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce
      k: Int,
      nSub: Int,
      nCodes: Int,
      dim: Int,
      rerank: Int = 0): DataFrame = {
    NativeExpressions.register(queries.sparkSession)
    val dsub = dim / nSub
    require(dsub * nSub == dim, s"nSub $nSub must divide dim $dim")
    val cb = pqCodebook(corpus, nCodes)
    val codes = pqCodes(corpus, nSub, nCodes, dim)
    val qtab = broadcast(quantCoords(queries, "qid", "qe").join(cb, Seq("i"))
      .groupBy(col("qid"), expr(s"(i - 1) div $dsub").as("s"), col("code"))
      .agg(sum(col("x") * col("cx")).as("pdot")))
    val q = queries.withColumn("qn", expr("sqrt(vec_dot(qe, qe))"))
    val c = corpus.withColumn("cn", expr("sqrt(vec_dot(ce, ce))"))
    val adc = codes.join(qtab, Seq("s", "code"))
      .filter(col("qid") =!= col("cid"))
      .groupBy("qid", "cid").agg(sum("pdot").as("adc"))
    val approx = adc
      .join(broadcast(q.select(col("qid"), col("qn"))), "qid")
      .join(c.select(col("cid"), col("cn")), "cid")
      .select(col("qid"), col("cid"),
        round(col("adc").cast("double") /
          (lit(1.0e12) * col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    if (rerank <= 0) {
      approx.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= k)
    } else {
      val pool = approx.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= rerank).select("qid", "cid")
      pool.join(broadcast(q), "qid").join(c, "cid")
        .select(col("qid"), col("cid"),
          round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn")), 6).as("cos"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= k)
    }
  }

  /** IVF×PQ — the IVFADC composition (Jégou et al., PAMI'11 §IV; the
    * FAISS production default): the coarse quantizer prunes CANDIDATES
    * to the query's `nprobe` nearest of `nlist` cells, and within the
    * visited cells every candidate is scored from its `nSub`-byte PQ
    * code over RESIDUALS (vector − assigned centroid) — the residual
    * trick is what makes a small shared codebook accurate: residuals
    * of a decent coarse quantizer concentrate near 0, so the same
    * nCodes codewords cover them far more densely than they cover raw
    * vectors. The query builds one per-visited-cell lookup table
    * (nq·nprobe·nSub·nCodes exact-int64 partial squared distances);
    * each candidate's approximate distance is nSub lookups summed;
    * the per-query top-`rerank` pool is re-ranked at full precision
    * (exact rounded cosine — the harness's metric and tie-break).
    *
    * Determinism: residuals are computed in the QUANTIZED int64 domain
    * (floor(x·1e6) − floor(c·1e6)) — integer subtraction, so encode,
    * LUT, and ADC sums are bit-portable cross-engine with no float
    * folds anywhere before the terminal rounded cosine. Codebook seeds
    * = residuals of the first `nCodes` corpus vectors AFTER the nlist
    * centroid seeds (a centroid's own residual is 0 — see the inline
    * note); ADC ranks (dist ASC, cid).
    *
    * Scale shape: assignment and encoding are rep-level (one row per
    * DISTINCT vector — both are pure functions of the vector, so
    * replication-invariant) against broadcast nlist·dim centroids and
    * a broadcast nCodes·dim codebook; the LUT is a broadcast bounded
    * by the query set; candidate work is ~nprobe/nlist of the corpus
    * per query, each candidate costing nSub integer lookups instead of
    * dim multiplies; full-precision vectors are touched only by the
    * m-bounded rerank join. At rest the corpus index is 1 cell id +
    * nSub codes + 1 norm per vector (~12 B at 16×16 vs 256 B floats).
    */
  /** The IVFADC index AT REST — what a serving node would hold
    * resident: centroids (+ their quantized coords), the shared
    * residual codebook, and per-DISTINCT-vector cell assignment and
    * PQ codes (~13 B/vector at 16×16 vs 256 B floats). `grp` is the
    * rep→members map (persisted; caller/harness releases it). */
  final case class IvfPqIndex(
      cents: DataFrame, // centroid_id, centroid (broadcast)
      centq: DataFrame, // cl, i, cx — quantized centroid coords (broadcast)
      pqc: DataFrame, // i, code, px — residual codebook (broadcast)
      ra: DataFrame, // rep, cl — rep-level cell assignment
      enc: DataFrame, // rep, s, code — rep-level PQ codes
      grp: DataFrame, // ce, rep, ids (persisted)
      nSub: Int,
      dim: Int)

  /** Public alias of [[quantCoords]] for dev tuning mains. */
  def quantCoordsPub(df: DataFrame, id: String, vec: String): DataFrame =
    quantCoords(df, id, vec)

  private[operators] def quantCoords(df: DataFrame, id: String,
      vec: String): DataFrame = df
    .select(col(id), posexplode(col(vec)))
    .select(col(id), (col("pos") + 1).as("i"),
      floor(col("col").cast("double") * lit(1000000L)).as("x"))

  /** Build the IVFADC index over `corpus` (cid, ce) — shared by the
    * batch serve ([[ivfPqTopK]]) and the streaming standing index
    * (q311): rank-1 cell assignment and residual encoding at REP level
    * (one row per distinct vector — pure functions of the vector, so
    * replication-invariant), codebook seeded from the first `nCodes`
    * vectors AFTER the `nlist` centroid seeds — the centroids' own
    * residuals are the ZERO vector (each is its own nearest centroid),
    * so seeding from them collapses the codebook to nCodes copies of 0
    * and ADC distance goes constant (caught by the DuckDB dial sweep:
    * recall was identical across every dial until the seed range moved
    * past nlist). All residual arithmetic in the quantized int64
    * domain (bit-portable cross-engine).
    */
  def ivfPqIndex(corpus: DataFrame, nlist: Int, nSub: Int, nCodes: Int,
      dim: Int, artifact: Option[(String, String, String)] = None
      /* (fixtureDir, fixtureFile, label) */): IvfPqIndex = {
    val spark = corpus.sparkSession
    NativeExpressions.register(spark)
    val dsub = dim / nSub
    require(dsub * nSub == dim, s"nSub $nSub must divide dim $dim")
    // an undersized corpus silently degrades instead of failing: the
    // codebook seed range offset(nlist).limit(nCodes) comes back short
    // or empty, enc is empty, ADC distance goes CONSTANT and recall
    // reads 0 — the same silent-collapse class the round-9 DuckDB
    // sweep caught for centroid-seeded codebooks. Fail loudly.
    val nSeedRows = corpus.select("cid").orderBy("cid")
      .limit(nlist + nCodes).count()
    require(nSeedRows >= nlist + nCodes,
      s"ivfPqIndex needs >= ${nlist + nCodes} corpus rows to seed " +
        s"$nlist centroids + $nCodes codewords; got $nSeedRows")
    val cents = broadcast(corpus.orderBy("cid").limit(nlist)
      .select(col("cid").as("centroid_id"), col("ce").as("centroid")))
    val centq = broadcast(
      quantCoords(cents.select(col("centroid_id").as("cl"), col("centroid")),
        "cl", "centroid")
      .select(col("cl"), col("i"), col("x").as("cx")))
    // the corpus-sized index pieces (rep map, cell assignment, codes)
    // are build-once artifacts when the caller supplies a fixture key
    // (the FixtureArtifact rule — an index is built once, served many;
    // the graph family's edge/code artifacts set the precedent): each
    // is materialized per (fixture fingerprint, dial label) and every
    // later build call — and every consumer — reads a flat scan. The
    // limit-bounded broadcasts (cents, centq, pqc) rebuild cheaply per
    // call. Without a key the pieces plan inline and grp persists
    // (q311-style callers manage the lifecycle; ivfPqTopK releases it).
    def piece(name: String)(build: => DataFrame): DataFrame =
      artifact match {
        case Some((fd, ff, label)) => graft.util.FixtureArtifact.parquet(
          spark, fd, ff, s"${label}_${name}_n${nlist}_s${nSub}_c$nCodes")(build)
        case None => build
      }
    val grp0 = corpus.groupBy("ce")
      .agg(min("cid").as("rep"), collect_list("cid").as("ids"))
    val grp = artifact match {
      case Some(_) => piece("grp")(grp0)
      case None => grp0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val ra = piece("ra")(
      assignToCentroids(grp.select("rep", "ce"), "rep", "ce",
        cents, nKeep = 1).select(col("rep"), col("centroid_id").as("cl")))
    val rres = quantCoords(grp.select("rep", "ce"), "rep", "ce")
      .join(ra, "rep").join(centq, Seq("cl", "i"))
      .select(col("rep"), col("i"), (col("x") - col("cx")).as("rx"))
    val seedReps = corpus.orderBy("cid").offset(nlist).limit(nCodes)
      .select("cid")
      .join(grp.select(col("rep"), explode(col("ids")).as("cid")), "cid")
      .select(col("cid").as("code"), col("rep"))
    val pqc = broadcast(rres.join(broadcast(seedReps), "rep")
      .select(col("i"), col("code"), col("rx").as("px")))
    val enc = piece("enc")(rres.join(pqc, Seq("i"))
      .groupBy(col("rep"), expr(s"(i - 1) div $dsub").as("s"), col("code"))
      .agg(sum((col("rx") - col("px")) * (col("rx") - col("px"))).as("dist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("rep", "s").orderBy(col("dist"), col("code"))))
      .filter(col("rn") === 1).select("rep", "s", "code"))
    IvfPqIndex(cents, centq, pqc, ra, enc, grp, nSub, dim)
  }

  /** `keep` (optional, round 12): ids passing a metadata predicate —
    * ATTRIBUTE-FILTERED IVFADC serving. The filter lands in the
    * candidate stage (probed cells ∩ keep, BEFORE the pool window —
    * the [[ivfTopKProbeWhere]] convention on the compressed rung), so
    * pool slots are never wasted on filtered-out members and the
    * rerank join is filter-pruned. The round-12 DuckDB sweep (both
    * SFs, BEFORE this hook was wired) measured the interaction:
    * over-probe recovers the filtered-cell collapse exactly as on the
    * raw rung (f05 0.752→0.928 from np10→np14), but the rerank pool
    * must stay CORPUS-scaled (the q308 dial) — scaling it with fNu
    * lost 0.05–0.09 recall at sf0.1 (ranking error does not shrink
    * with the filter; only candidates do). */
  def ivfPqTopK(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce
      k: Int,
      nlist: Int,
      nprobe: Int,
      nSub: Int,
      nCodes: Int,
      dim: Int,
      rerank: Int,
      artifact: Option[(String, String, String)] = None,
      keep: Option[DataFrame] = None): DataFrame = {
    NativeExpressions.register(queries.sparkSession)
    require(rerank > 0, "ivfPqTopK serves two-stage; rerank must be > 0")
    val idx = ivfPqIndex(corpus, nlist, nSub, nCodes, dim, artifact)
    val adc = ivfPqAdcCandidates(queries, idx, nprobe, keep)
    val result = ivfPqTopKFromCandidates(adc, queries, corpus, k, rerank)
    // call-local cache lifecycle (the round-9 operator finding): the
    // answer-sized result is materialized, then the index's grouped
    // frame is released HERE — nothing waits for a harness clearCache
    val out = graft.util.Scratch.dir("ivfpq_topk")
    result.write.mode("overwrite").parquet(out)
    idx.grp.unpersist()
    queries.sparkSession.read.parquet(out)
  }

  /** The ADC-ranked candidate table of one IVFADC probe pass (qid,
    * cid, dist — exact int64 residual distances, member-level, keep
    * applied): [[ivfPqTopK]]'s candidate stage exposed so a dial grid
    * can slice SEVERAL pools from ONE scan (q338's corpus- and
    * fNu-scaled pools share the same candidates per (tag, nprobe) —
    * re-running the scan per pool dial was a third of the query's
    * bench cost). The `keep` semi-join lands at MEMBER level, after
    * group-map expansion (a rep's duplicate members can sit on both
    * sides of a metadata predicate), BEFORE any pool window. */
  def ivfPqAdcCandidates(
      queries: DataFrame, // qid, qe
      idx: IvfPqIndex,
      nprobe: Int,
      keep: Option[DataFrame] = None): DataFrame = {
    NativeExpressions.register(queries.sparkSession)
    val dsub = idx.dim / idx.nSub
    val qa = assignToCentroids(queries, "qid", "qe", idx.cents,
      nKeep = nprobe).select(col("qid"), col("centroid_id").as("cl"))
    val lut = broadcast(quantCoords(queries, "qid", "qe")
      .join(qa, "qid").join(idx.centq, Seq("cl", "i"))
      .select(col("qid"), col("cl"), col("i"), (col("x") - col("cx")).as("rx"))
      .join(idx.pqc, Seq("i"))
      .groupBy(col("qid"), col("cl"), expr(s"(i - 1) div $dsub").as("s"),
        col("code"))
      .agg(sum((col("rx") - col("px")) * (col("rx") - col("px"))).as("d")))
    val adc0 = idx.enc.join(idx.ra, "rep")
      .join(lut, Seq("cl", "s", "code"))
      .groupBy("qid", "rep").agg(sum("d").as("dist"))
      .join(idx.grp.select(col("rep"), explode(col("ids")).as("cid")), "rep")
      .filter(col("qid") =!= col("cid"))
    keep.foldLeft(adc0) { (a, kset) =>
      a.join(kset.select("cid"), Seq("cid"), "left_semi") }
  }

  /** Pool + exact-rerank tail over [[ivfPqAdcCandidates]]' output:
    * top-`rerank` by (dist ASC, cid), exact rounded cosine over the
    * pool, top-`k`. */
  def ivfPqTopKFromCandidates(
      cand: DataFrame, // qid, cid, dist
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce — cold storage, pool-bounded join
      k: Int,
      rerank: Int): DataFrame = {
    NativeExpressions.register(queries.sparkSession)
    val wd = Window.partitionBy("qid").orderBy(col("dist"), col("cid"))
    val pool = cand.withColumn("rn", row_number().over(wd))
      .filter(col("rn") <= rerank).select("qid", "cid")
    val q = queries.withColumn("qn", expr("sqrt(vec_dot(qe, qe))"))
    val c = corpus.withColumn("cn", expr("sqrt(vec_dot(ce, ce))"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    pool.join(broadcast(q), "qid").join(c, "cid")
      .select(col("qid"), col("cid"),
        round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn")), 6).as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Per-micro-batch semantic-dedup scoring against a PQ-compressed
    * STANDING index ([[IvfPqIndex]]) — the memory-bounded ingest shape
    * (q311): the resident corpus index is cell ids + PQ codes + the
    * rep→member map, NOT full vectors. Each batch groups identical
    * payload vectors (rep level), assigns each rep to its ONE nearest
    * cell (the q298/q305 ingest convention), builds the per-rep
    * residual LUT against the frozen codebook (incremental encoding —
    * codebooks are trained once, new data encodes cheaply), ADC-ranks
    * the cell's standing codes, keeps the per-probe top-`m` pool
    * (dist ASC, rep id), re-ranks the pool at full precision (the
    * "cold storage fetch" — full vectors touched only for pool
    * members), emits pairs with exact rounded cosine >= `threshold`,
    * and expands through BOTH group maps. When a cell has <= m reps
    * the pool covers it and the alerts are bit-identical to the
    * exact same-cell scan (spec-tested against
    * scoreSemDedupBatchDeduped); past m the alert set is pool-bounded
    * — the honest memory/recall trade the q311 row measures.
    */
  def pqSemDedupBatch(
      batch: DataFrame, // da, ea
      idx: IvfPqIndex,
      m: Int,
      threshold: Double): DataFrame = {
    NativeExpressions.register(batch.sparkSession)
    val dsub = idx.dim / idx.nSub
    val g = batch.groupBy("ea")
      .agg(min("da").as("rep"), collect_list("da").as("ids"))
    val reps = g.select(col("rep").as("pa"), col("ea"))
    val assigned = assignToCentroids(reps, "pa", "ea", idx.cents)
      .withColumn("na", expr("sqrt(vec_dot(ea, ea))"))
      .select(col("pa"), col("ea"), col("na"), col("centroid_id").as("cl"))
    val lut = broadcast(quantCoords(reps, "pa", "ea")
      .join(assigned.select("pa", "cl"), "pa")
      .join(idx.centq, Seq("cl", "i"))
      .select(col("pa"), col("i"), (col("x") - col("cx")).as("rx"))
      .join(idx.pqc, Seq("i"))
      .groupBy(col("pa"), expr(s"(i - 1) div $dsub").as("s"), col("code"))
      .agg(sum((col("rx") - col("px")) * (col("rx") - col("px"))).as("d")))
    val cand = assigned.select(col("pa"), col("cl"))
      .join(idx.ra.select(col("rep").as("pb"), col("cl")), "cl")
    val adc = cand
      .join(idx.enc.select(col("rep").as("pb"), col("s"), col("code")), "pb")
      .join(lut, Seq("pa", "s", "code"))
      .groupBy("pa", "pb").agg(sum("d").as("dist"))
    val wd = Window.partitionBy("pa").orderBy(col("dist"), col("pb"))
    val pool = adc.withColumn("rn", row_number().over(wd))
      .filter(col("rn") <= m).select("pa", "pb")
    val corpusReps = idx.grp.select(col("rep").as("pb"), col("ce").as("eb"))
      .withColumn("nb", expr("sqrt(vec_dot(eb, eb))"))
    val scored = pool.join(assigned.select("pa", "ea", "na"), "pa")
      .join(corpusReps, "pb")
      .select(col("pa"), col("pb"),
        round(expr("vec_dot(ea, eb)") / (col("na") * col("nb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
    val pmem = g.select(col("rep").as("pa"), explode(col("ids")).as("da"))
    val cmem = idx.grp.select(col("rep").as("pb"), explode(col("ids")).as("db"))
    scored.join(pmem, Seq("pa")).join(cmem, Seq("pb"))
      .select(col("da"), col("db"), col("cos"))
  }

  /** Greedy beam search over a bounded-degree neighbor graph — the
    * HNSW/DiskANN-family QUERY pattern, completing the ANN set next to
    * [[lshTopK]] (hash), [[ivfTopK]] (coarse quantizer), and PQ (code
    * compression). All queries start at a fixed entry point (the
    * minimum corpus id — the deterministic stand-in for HNSW's top
    * layer entry); each of `rounds` unrolled steps expands the current
    * beam through its out-edges, scores the candidate set, and keeps
    * the best `beam` per query (rounded cosine, ties on id).
    *
    * Scale shape: the per-query candidate set is ≤ beam·(d+1) BY
    * CONSTRUCTION — independent of corpus size — so each round is one
    * broadcast of |Q|·beam·(d+1) candidate rows hash-joined against the
    * corpus scan (corpus never shuffles), plus a window whose groups
    * are capped at beam·(d+1) rows (bounded-GROUP-SIZE, so the
    * bounded-cardinality-partition trap does not apply). Round
    * boundaries are cut to scratch parquet — each frontier feeds two
    * lineage paths (edge expansion + union), and the cut keeps the
    * cache lifecycle call-local (no persists survive the call).
    */
  def beamTopK(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce
      edges: DataFrame, // u, v
      k: Int,
      beam: Int,
      rounds: Int): DataFrame = {
    val entry = corpus.agg(min("cid").as("cid"))
    // 1-row bounded build side (the q13 class of sanctioned cross join)
    beamTopKFrom(queries, corpus, edges,
      queries.select(col("qid")).crossJoin(broadcast(entry)),
      k, beam, rounds)
  }

  /** [[beamTopK]] with CALLER-SUPPLIED per-query entry points
    * (`entries`: qid, cid) instead of the single fixed min-id entry —
    * the navigability lever the q301 measurement demanded: a beam can
    * only hill-climb from somewhere near the query, so production
    * graph-ANN seeds entries from a coarse structure (HNSW's upper
    * layers; here the IVF centroid set, q302). Entry count per query
    * must be bounded (it adds to the first round's candidate set).
    */
  def beamTopKFrom(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce
      edges: DataFrame, // u, v
      entries: DataFrame, // qid, cid (bounded per qid)
      k: Int,
      beam: Int,
      rounds: Int): DataFrame = {
    val spark = queries.sparkSession
    NativeExpressions.register(spark)
    val q = queries.withColumn("qn", expr("sqrt(vec_dot(qe, qe))"))
    val c = corpus.withColumn("cn", expr("sqrt(vec_dot(ce, ce))"))
    // each round boundary is CUT to scratch parquet (bounded |Q|·beam
    // rows): the next round references the frontier through two lineage
    // paths (edge expansion + union), and a persist would outlive the
    // call (the round-9 operator-lifecycle finding) — the write is
    // answer-sized and leaves nothing cached behind
    def cut(df: DataFrame, label: String): DataFrame = {
      val out = graft.util.Scratch.dir(s"beam_$label")
      df.write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
    }
    var frontier = entries.select(col("qid"), col("cid"))
      .withColumn("cos", lit(null).cast("double"))
    for (r <- 1 to rounds) {
      val f = frontier
      val expanded = f.join(edges, f("cid") === edges("u"))
        .select(col("qid"), col("v").as("cid"))
        .unionByName(f.select("qid", "cid")).distinct()
      val withQ = expanded.join(q, "qid")
      val scored = c.join(broadcast(withQ), "cid")
        .filter(col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"),
          round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn")), 6).as("cos"))
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
      frontier = cut(scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= beam)
        .select(col("qid"), col("cid"), col("cos")), s"f$r")
    }
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    frontier.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("cid"), col("cos"), col("rnk"))
  }

  /** DiskANN-shaped serving (Jayaram Subramanya et al., NeurIPS'19 —
    * the industry composition of graph navigation × code compression):
    * beam search over a bounded-degree neighbor graph where every
    * candidate is ranked by ADC over the RESIDENT PQ codes — nSub
    * integer lookups against the per-query table, never a
    * full-precision dot — and the VISITED candidate list (every
    * candidate any round scored — the paper's search list, ≤
    * beam·(d+1)·rounds per query) is re-ranked at exact cosine through
    * a bounded join to the cold-storage vectors. Re-ranking only the
    * final frontier is NOT enough: the dial sweep measured it at
    * 0.55–0.72 recall (pool containment binds — the q295/q308 lesson a
    * third time), while the visited list reaches 0.984/0.880 at q304's
    * own dials for the SAME walk cost. Composes [[nnDescentEdges]]
    * (edge quality — a navigable graph is what lets the ADC-guided
    * walk hill-climb) with [[pqCodes]] (representation compression):
    * resident bytes/vector = d·8 (edge list) + nSub·log2(nCodes)/8
    * (codes) + 4 (stored norm), so the whole serving index fits
    * executor memory at corpus sizes where even the PQ-augmented IVF
    * index's nprobe/nlist candidate scans blow the per-query budget.
    * This is precisely DiskANN's design point: per-query cost
    * beam·(d+1)·rounds ADC lookups + a same-bound exact re-rank —
    * BOTH corpus-size-independent.
    *
    * Determinism: ADC partial dots are exact int64 (q225 quantized
    * kernel) summed per candidate, divided ONCE by the true stored
    * norms and rounded 6dp (the q307 recipe) — so the walk's frontier
    * boundary is engine-portable and the whole serve carries an exact
    * oracle. Candidates at qid = cid are dropped at scoring, exactly
    * as [[beamTopKFrom]] does.
    *
    * Scale shape: per round, the candidate set is ≤ |Q|·beam·(d+1) BY
    * CONSTRUCTION; it hash-joins the resident code table on cid (nSub
    * rows per candidate) and the broadcast per-query LUT, then a
    * window over ≤ beam·(d+1)-row groups. Every round's scored set is
    * cut to scratch parquet (bounded |Q|·beam·(d+1) rows — the
    * nnDescentEdges lineage rule: the next round references the
    * frontier through two paths, the visited union re-references every
    * round, and cache substitution through union + self-join aliasing
    * is unreliable), so no persists outlive the call. The corpus
    * (full vectors) is touched ONLY by the final rerank join.
    */
  def beamPqTopKFrom(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce — cold storage; final rerank only
      edges: DataFrame, // u, v — the resident graph (refined artifact)
      codes: DataFrame, // cid, s, code — the resident PQ codes artifact
      entries: DataFrame, // qid, cid (bounded per qid)
      k: Int,
      beam: Int,
      rounds: Int,
      nSub: Int,
      nCodes: Int,
      dim: Int,
      norms: Option[DataFrame] = None,
      codebook: Option[DataFrame] = None): DataFrame = {
    val scored = beamPqVisitedScored(queries, corpus, edges, codes,
      entries, beam, rounds, nSub, nCodes, dim, norms = norms,
      codebook = codebook)
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** ATTRIBUTE-FILTERED DiskANN-shaped serving (q319/q320): the walk
    * NAVIGATES THE FULL GRAPH — frontier ranking stays unfiltered,
    * because filtered-out nodes are exactly what keeps the graph
    * connected under a selective predicate (pruning them from the walk
    * is the known recall-collapse mode: the filtered subgraph
    * fragments) — and the filter applies where DiskANN's own filtered
    * variant applies it, to the RESULT pool: the exact re-rank stage
    * scores only visited ∩ `keep`, so the expensive full-precision
    * joins are filter-pruned and the emitted top-k all satisfy the
    * predicate. Recall under a selective filter is pool containment of
    * the FILTERED truth in the visited list (the q295/q308 law on a
    * new axis) — the q319 sweep measures exactly that at ~50% and ~5%
    * selectivity, with `rounds`/`beam` as the recovery dials (more
    * walk = more visited = more filtered survivors). Per-query cost is
    * still ≤ beam·(d+1)·rounds ADC lookups + a ≤-same-bound exact
    * re-rank — corpus-size-independent AND selectivity-independent on
    * the walk side.
    */
  def beamPqTopKFromWhere(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce — cold storage; final rerank only
      edges: DataFrame, // u, v — the resident graph (FULL corpus)
      codes: DataFrame, // cid, s, code — the resident PQ codes
      entries: DataFrame, // qid, cid (bounded per qid)
      keep: DataFrame, // cid — ids passing the metadata predicate
      k: Int,
      beam: Int,
      rounds: Int,
      nSub: Int,
      nCodes: Int,
      dim: Int): DataFrame = {
    val scored = beamPqVisitedScored(queries, corpus, edges, codes,
      entries, beam, rounds, nSub, nCodes, dim, keep = Some(keep))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** The exact-reranked VISITED list of one ADC-guided walk (qid, cid,
    * cos) — the DiskANN search list with exact scores. Public so a
    * dial-grid query (q319) can run ONE walk and re-rank several
    * filtered views of the bounded pool (a filtered top-k from this
    * frame is value-identical to [[beamPqTopKFromWhere]]: same
    * visited ∩ keep candidate set, same exact scores — spec-tested);
    * [[beamPqTopKFrom]] / [[beamPqTopKFromWhere]] are its top-k
    * serving forms. */
  def beamPqVisited(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce
      edges: DataFrame, // u, v
      codes: DataFrame, // cid, s, code
      entries: DataFrame, // qid, cid
      beam: Int,
      rounds: Int,
      nSub: Int,
      nCodes: Int,
      dim: Int): DataFrame =
    beamPqVisitedScored(queries, corpus, edges, codes, entries, beam,
      rounds, nSub, nCodes, dim)

  /** The ADC-guided walk + exact visited-list re-rank shared by the
    * top-k server ([[beamPqTopKFrom]]) and the streaming ingest scorer
    * ([[beamPqSemDedupBatch]]): returns every VISITED candidate with
    * its exact rounded cosine (qid, cid, cos). `keep` (optional)
    * restricts the EXACT RE-RANK to visited ∩ keep — the walk itself
    * always navigates unfiltered (see [[beamPqTopKFromWhere]]). */
  private def beamPqVisitedScored(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce
      edges: DataFrame, // u, v
      codes: DataFrame, // cid, s, code
      entries: DataFrame, // qid, cid
      beam: Int,
      rounds: Int,
      nSub: Int,
      nCodes: Int,
      dim: Int,
      keep: Option[DataFrame] = None,
      norms: Option[DataFrame] = None, // (cid, cn) standing artifact
      codebook: Option[DataFrame] = None): DataFrame = { // (i, code, cx)
    val spark = queries.sparkSession
    NativeExpressions.register(spark)
    val dsub = dim / nSub
    require(dsub * nSub == dim, s"nSub $nSub must divide dim $dim")
    // standing-index metadata: a per-batch/per-round re-derivation of
    // the codebook (corpus TakeOrdered + explode) and the norm table
    // (full-vector scan + vec_dot, referenced by EVERY round's join)
    // collapses to flat artifact scans when the caller owns a standing
    // index (q312/q313/q317 — guide §2.4); values identical by
    // construction (both are pure functions of the corpus)
    val cb = codebook.map(broadcast).getOrElse(pqCodebook(corpus, nCodes))
    val qtab = broadcast(quantCoords(queries, "qid", "qe").join(cb, Seq("i"))
      .groupBy(col("qid"), expr(s"(i - 1) div $dsub").as("s"), col("code"))
      .agg(sum(col("x") * col("cx")).as("pdot")))
    val q = queries.withColumn("qn", expr("sqrt(vec_dot(qe, qe))"))
    // stored norms: index metadata (4 B/vector, written with the codes
    // in a production layout); one column-pruned scan here
    val cn = norms.getOrElse(cosNormsDF(corpus))
    def cut(df: DataFrame, label: String): DataFrame = {
      val out = graft.util.Scratch.dir(s"beampq_$label")
      df.write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
    }
    var frontier = entries.select(col("qid"), col("cid"))
    var visited: DataFrame = null // the DiskANN search list, round-cut
    for (r <- 1 to rounds) {
      val expanded = frontier.join(edges, frontier("cid") === edges("u"))
        .select(col("qid"), col("v").as("cid"))
        .unionByName(frontier.select("qid", "cid")).distinct()
      val adc = expanded.join(codes, "cid")
        .join(qtab, Seq("qid", "s", "code"))
        .groupBy("qid", "cid").agg(sum("pdot").as("adc"))
      val scored = adc
        .join(broadcast(q.select(col("qid"), col("qn"))), "qid")
        .join(cn, "cid")
        .filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"),
          round(col("adc").cast("double") /
            (lit(1.0e12) * col("qn") * col("cn")), 6).as("cos"))
      // one round-boundary write serves both consumers: the ranked
      // frontier (navigation) and the visited accumulation (rerank)
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
      val roundScored = cut(scored.withColumn("rn", row_number().over(w)),
        s"r$r")
      frontier = roundScored.filter(col("rn") <= beam).select("qid", "cid")
      val ids = roundScored.select("qid", "cid")
      visited = if (visited == null) ids else visited.unionByName(ids)
    }
    // the one full-precision stage: exact re-rank of the VISITED list
    // (∩ keep when filtering — prune BEFORE the expensive vector join)
    val c = corpus.withColumn("cn", expr("sqrt(vec_dot(ce, ce))"))
    val pool = keep.foldLeft(visited.distinct()) { (v, kset) =>
      v.join(kset.select("cid"), Seq("cid"), "left_semi") }
    pool.join(broadcast(q), "qid").join(c, "cid")
      .select(col("qid"), col("cid"),
        round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn")), 6).as("cos"))
  }

  /** Incremental maintenance of a standing graph index — the DiskANN
    * INSERT path (q317): each new rep (one per distinct payload in the
    * micro-batch — walks are rep-level, replication-invariant) walks
    * the standing graph ([[beamPqVisitedScored]]: ADC-guided, exact
    * re-rank of the bounded visited list), its top-`dOut` visited
    * neighbors by (cos DESC, cid) become the NEW NODE's out-edges
    * (bounded and per-rep-deterministic), and each chosen target
    * contributes a candidate REVERSE edge (standing node → new rep) so
    * the graph stays navigable TOWARD inserted nodes. The rep's edges
    * are then EXPANDED through the batch's duplicate-group map — every
    * inserted id gets its own out-edges and its own reverse
    * candidates, which is sound because duplicate members' walks are
    * identical by construction (entries tie-break on centroid id over
    * identical embeddings; the walk's qid ≠ cid guard is inert across
    * the ingest slot split, so the rep's scores ARE each member's
    * scores) — the round-10 advice catch: without the expansion,
    * duplicate payloads would silently insert edge-less nodes, and
    * which member got edges would depend on the micro-batch split.
    * Reverse edges are emitted UNCAPPED — the reader caps them at
    * top-`dOut` per standing node over the ACCUMULATED set (cos DESC,
    * new id): capping at read time is what makes the maintained edge
    * set BATCH-SPLIT INVARIANT (a per-batch cap would depend on which
    * reps happened to share a micro-batch — the q296-class ordering
    * hazard). Forward and reverse key spaces are disjoint by the
    * ingest slot split, so an idempotent MERGE on (u, v) accumulates
    * safely.
    */
  def graphInsertBatch(
      batch: DataFrame, // da, ea
      corpus: DataFrame, // cid, ce — cold storage
      edges: DataFrame, // u, v — standing refined graph
      codes: DataFrame, // cid, s, code — standing PQ codes
      cents: DataFrame, // centroid_id, centroid (broadcast)
      beam: Int,
      rounds: Int,
      nSub: Int,
      nCodes: Int,
      dim: Int,
      dOut: Int,
      norms: Option[DataFrame] = None,
      codebook: Option[DataFrame] = None,
      scoredAll: Option[DataFrame] = None): DataFrame = {
    NativeExpressions.register(batch.sparkSession)
    val fwd = scoredAll match {
      case Some(sa) =>
        // standing scored-walk table (da, cid, cos, rn): the batch's
        // rows are a subset of the probe workload the table covers —
        // per-probe results are payload-deterministic, so the semi-join
        // serve is value-identical to the live walk below (incl. the
        // duplicate-member expansion: every member id carries its own
        // pre-expanded rows)
        sa.join(batch.select(col("da")), Seq("da"), "left_semi")
          .filter(col("rn") <= dOut)
          .select(col("da").as("u"), col("cid").as("v"), col("cos"))
      case None =>
        val g = batch.groupBy("ea")
          .agg(min("da").as("rep"), collect_list("da").as("ids"))
        val reps = g.select(col("rep").as("qid"), col("ea").as("qe"))
        val entries = assignToCentroids(reps, "qid", "qe", cents, nKeep = 2)
          .select(col("qid"), col("centroid_id").as("cid"))
        val scored = beamPqVisitedScored(reps, corpus, edges, codes, entries,
          beam, rounds, nSub, nCodes, dim, norms = norms,
          codebook = codebook)
        val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
        val fwdRep = scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= dOut)
          .select(col("qid"), col("cid"), col("cos"))
        // expand the rep's chosen edges to every duplicate member id
        val mem = g.select(col("rep").as("qid"), explode(col("ids")).as("da"))
        fwdRep.join(mem, Seq("qid"))
          .select(col("da").as("u"), col("cid").as("v"), col("cos"))
    }
    fwd.unionByName(
      fwd.select(col("v").as("u"), col("u").as("v"), col("cos")))
  }

  /** The standing probe WORKLOAD's scored walk table (q313/q317): rep-
    * groups the full probe set by payload, runs ONE ADC-guided walk +
    * exact visited-list re-rank per rep, ranks per rep by (cos DESC,
    * cid), and expands to every member probe id — returns (da, cid,
    * cos, rn). The two streaming-maintenance consumers (alerting at a
    * threshold, insert-edge selection at top-dOut) both derive their
    * per-batch outputs from this ONE table by a semi-join on the
    * batch's probe ids: value-identical to the live per-batch walk
    * because the walk is a deterministic function of the probe PAYLOAD
    * alone (tie-breaks are on cid; the qid =!= cid guard is inert
    * across the ingest slot split), and per-member rows are identical
    * to the per-batch duplicate-group expansion (spec-tested). The
    * q315/q328 shared-pipeline rule: the walk over the standing index
    * is the IDENTICAL sub-pipeline of both queries — one build serves
    * both. Caller guarantees every batch row's da appears in `probes`.
    */
  def beamPqWalkScoredAll(
      probes: DataFrame, // da, ea — the standing probe workload
      corpus: DataFrame, // cid, ce — cold storage
      edges: DataFrame, // u, v — standing refined graph
      codes: DataFrame, // cid, s, code — standing PQ codes
      cents: DataFrame, // centroid_id, centroid (broadcast)
      beam: Int,
      rounds: Int,
      nSub: Int,
      nCodes: Int,
      dim: Int,
      norms: Option[DataFrame] = None,
      codebook: Option[DataFrame] = None): DataFrame = {
    NativeExpressions.register(probes.sparkSession)
    val g = probes.groupBy("ea")
      .agg(min("da").as("rep"), collect_list("da").as("ids"))
    val reps = g.select(col("rep").as("qid"), col("ea").as("qe"))
    val entries = assignToCentroids(reps, "qid", "qe", cents, nKeep = 2)
      .select(col("qid"), col("centroid_id").as("cid"))
    val scored = beamPqVisitedScored(reps, corpus, edges, codes, entries,
      beam, rounds, nSub, nCodes, dim, norms = norms,
      codebook = codebook)
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    val ranked = scored.withColumn("rn", row_number().over(w))
    val mem = g.select(col("rep").as("qid"), explode(col("ids")).as("da"))
    ranked.join(mem, Seq("qid"))
      .select(col("da"), col("cid"), col("cos"), col("rn"))
  }

  /** Per-micro-batch semantic-dedup scoring against a standing GRAPH
    * index (q313) — the q305/q311 advisor→ingest loop on the GRAPH
    * family: the resident standing index is the NN-Descent-refined
    * edge set + PQ codes + stored norms (the q312 DiskANN layout); a
    * probe micro-batch groups identical payloads (rep level —
    * replication-invariant walk count), seeds each rep's walk at its 2
    * nearest centroids (the q302 entry convention, `cents` broadcast),
    * runs the ADC-guided beam walk over the standing edges, exact-
    * re-ranks the bounded VISITED list against cold-storage vectors,
    * emits pairs at cosine >= `threshold`, and expands through the
    * probe group map. The alert set is visited-bounded (≤
    * beam·(d+1)·rounds candidates per probe rep — corpus-size-
    * independent, the honest walk/recall trade the q313 row measures
    * against the exact scan); the corpus side is per-id (the graph is
    * an id-level artifact), so duplicates cost pool slots, not extra
    * cosines — the walk count never grows with replication.
    */
  def beamPqSemDedupBatch(
      batch: DataFrame, // da, ea
      corpus: DataFrame, // cid, ce — cold storage
      edges: DataFrame, // u, v — standing refined graph
      codes: DataFrame, // cid, s, code — standing PQ codes
      cents: DataFrame, // centroid_id, centroid (broadcast)
      beam: Int,
      rounds: Int,
      nSub: Int,
      nCodes: Int,
      dim: Int,
      threshold: Double,
      norms: Option[DataFrame] = None,
      codebook: Option[DataFrame] = None,
      scoredAll: Option[DataFrame] = None): DataFrame = {
    NativeExpressions.register(batch.sparkSession)
    scoredAll match {
      case Some(sa) =>
        // standing scored-walk table serve (see [[beamPqWalkScoredAll]])
        sa.join(batch.select(col("da")), Seq("da"), "left_semi")
          .filter(col("cos") >= threshold)
          .select(col("da"), col("cid").as("db"), col("cos"))
      case None =>
        val g = batch.groupBy("ea")
          .agg(min("da").as("rep"), collect_list("da").as("ids"))
        val reps = g.select(col("rep").as("qid"), col("ea").as("qe"))
        val entries = assignToCentroids(reps, "qid", "qe", cents, nKeep = 2)
          .select(col("qid"), col("centroid_id").as("cid"))
        val scored = beamPqVisitedScored(reps, corpus, edges, codes, entries,
            beam, rounds, nSub, nCodes, dim, norms = norms,
            codebook = codebook)
          .filter(col("cos") >= threshold)
        val pmem = g.select(col("rep").as("qid"), explode(col("ids")).as("da"))
        scored.join(pmem, Seq("qid"))
          .select(col("da"), col("cid").as("db"), col("cos"))
    }
  }

  /** SQ8 standing-index variant of [[pqSemDedupBatch]] (q329): the
    * resident index is cell ids + SQ8 codes + the fixed-point rescale
    * + the rep→member map (~72 B/rep at dim 64). The SQ8 advantage at
    * INGEST: encoding a new batch is ROW-LOCAL ([[sq8Codes]] —
    * round(x·127/absmax) per vector) — no frozen codebook, no residual
    * LUT, no training dependency — while the candidate rank stays pure
    * BIGINT (intdot·rc of the standing side). Pool ties, threshold,
    * and group-map expansion mirror pqSemDedupBatch exactly; alerts
    * are batch-split invariant for the same reason (identical payload
    * ⇒ identical codes/assignment/pool/score, and expansion covers
    * each batch's own rows).
    */
  def sq8SemDedupBatch(
      batch: DataFrame, // da, ea
      grp: DataFrame, // rep, ce, ids — standing rep map
      ra: DataFrame, // rep, cl — standing rep cell assignment
      codes: DataFrame, // id (rep), qc, rc — standing SQ8 codes
      cents: DataFrame, // centroid_id, centroid (broadcast)
      m: Int,
      threshold: Double): DataFrame = {
    NativeExpressions.register(batch.sparkSession)
    val g = batch.groupBy("ea")
      .agg(min("da").as("rep"), collect_list("da").as("ids"))
    val reps = g.select(col("rep").as("pa"), col("ea"))
    val assigned = assignToCentroids(reps, "pa", "ea", cents)
      .withColumn("na", expr("sqrt(vec_dot(ea, ea))"))
      .select(col("pa"), col("ea"), col("na"), col("centroid_id").as("cl"))
    val bq = sq8Codes(reps, "pa", "ea")
      .select(col("id").as("pa"), col("qc").as("bq"))
    val ranked = assigned.select("pa", "cl")
      .join(ra.select(col("rep").as("pb"), col("cl")), "cl")
      .join(broadcast(bq), "pa")
      .join(codes.select(col("id").as("pb"), col("qc").as("cq"),
        col("rc")), "pb")
      .select(col("pa"), col("pb"),
        (expr("vec_dotl(bq, cq)")
          * col("rc")).as("akey"))
    val wd = Window.partitionBy("pa").orderBy(col("akey").desc, col("pb"))
    val pool = ranked.withColumn("rn", row_number().over(wd))
      .filter(col("rn") <= m).select("pa", "pb")
    val corpusReps = grp.select(col("rep").as("pb"), col("ce").as("eb"))
      .withColumn("nb", expr("sqrt(vec_dot(eb, eb))"))
    val scored = pool.join(assigned.select("pa", "ea", "na"), "pa")
      .join(corpusReps, "pb")
      .select(col("pa"), col("pb"),
        round(expr("vec_dot(ea, eb)") / (col("na") * col("nb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
    val pmem = g.select(col("rep").as("pa"), explode(col("ids")).as("da"))
    val cmem = grp.select(col("rep").as("pb"), explode(col("ids")).as("db"))
    scored.join(pmem, Seq("pa")).join(cmem, Seq("pb"))
      .select(col("da"), col("db"), col("cos"))
  }

  /** Per-micro-batch MULTI-VECTOR (late-interaction) dedup scoring
    * against a standing token-level index (q343) — the q329 ingest
    * loop on q334's PLAID-shaped family: the resident state is the
    * standing tokens' IVF cells + SQ8 codes + cold-storage token
    * vectors; a probe micro-batch of documents (token rows, DOC-ATOMIC
    * — all of a doc's tokens must land in one batch, since MaxSim is a
    * per-document aggregate; the alert set is then batch-split
    * invariant because all scoring is per probe doc) is scored by the
    * q334 pipeline: probe tokens assigned to their `np` nearest
    * standing centroids (candidate DOCS via the cell join — the
    * round-12 sweep measured candidate containment as the binding
    * dial: np2 saturates at 0.86-0.93 alert coverage regardless of
    * pool depth, np4/m40 reaches 1.0/0.986), integer SQ8 maxsim over
    * ALL candidate token pairs ranks (probe codes are a ROW-LOCAL
    * re-encode — the SQ8 structural ingest advantage a third time),
    * the m-bounded pool re-scores at exact micro-cos BIGINT maxsim,
    * and pairs at score >= `minScore` alert. Output (qd, cd, score) —
    * score exact int64.
    */
  def maxsimSemDedupBatch(
      batch: DataFrame, // qd, qt, qe — probe docs' token rows
      corpusTok: DataFrame, // cd, ct, ce — standing cold storage
      ca: DataFrame, // tid, centroid_id — standing token cells
      codes: DataFrame, // id, qc, rc — standing token SQ8 codes
      cents: DataFrame, // centroid_id, centroid (broadcast)
      np: Int,
      m: Int,
      minScore: Long,
      ctokCodes: Option[DataFrame] = None): DataFrame = { // (cd, ct, cc, rc)
    NativeExpressions.register(batch.sparkSession)
    // probe-doc REP grouping on the token-PAYLOAD (the dedup-first
    // rule lifted to multi-vector docs: the payload key is the doc's
    // token vectors in token order — MaxSim is a pure function of it,
    // so duplicate probe docs walk once and alerts expand through the
    // group map; without it the x10 replicated probe measured probe-
    // duplicates × standing-duplicates QUADRATIC blowup, 5.4 → 72 s)
    val keyed = batch.groupBy("qd")
      .agg(expr("transform(array_sort(collect_list(struct(qt, qe))), " +
        "x -> x.qe)").as("pk"))
    val g = keyed.groupBy("pk")
      .agg(min("qd").as("rep"), collect_set("qd").as("docs"))
    val rbatch = batch.join(g.select(col("rep").as("qd")), Seq("qd"),
      "left_semi")
    val qa = assignToCentroids(rbatch.select("qt", "qe"), "qt", "qe",
      cents, nKeep = np).select(col("qt"), col("centroid_id"))
    // the standing token→doc map and the standing code table: when the
    // caller owns a standing index (q343/q348), both come from ONE
    // (cd, ct, cc, rc) fixture artifact — a flat scan per micro-batch
    // instead of a corpusTok ⋈ codes shuffle join re-run per batch
    // (guide §2.4); values identical by construction
    val t2d = ctokCodes.map(_.select(col("ct").as("tid"), col("cd")))
      .getOrElse(corpusTok.select(col("ct").as("tid"), col("cd")))
    val cdocs = qa.join(broadcast(rbatch.select("qd", "qt")), Seq("qt"))
      .join(ca.select(col("tid"), col("centroid_id")), Seq("centroid_id"))
      .join(t2d, Seq("tid"))
      .select("qd", "cd").distinct()
    val qcodes = broadcast(
      sq8Codes(rbatch.select("qt", "qe"), "qt", "qe")
        .select(col("id").as("qt"), col("qc").as("qq"))
        .join(rbatch.select("qd", "qt"), Seq("qt")))
    val ctok = ctokCodes.getOrElse(corpusTok.select(col("cd"), col("ct"))
      .join(codes.select(col("id").as("ct"), col("qc").as("cc"),
        col("rc")), Seq("ct")))
    val apx = cdocs.join(qcodes, Seq("qd"))
      .join(ctok, Seq("cd"))
      .select(col("qd"), col("cd"), col("qt"),
        (expr("vec_dotl(qq, cc)")
          * col("rc")).as("apair"))
      .groupBy("qd", "cd", "qt").agg(max("apair").as("amx"))
      .groupBy("qd", "cd").agg(sum("amx").as("ascore"))
    val wp = Window.partitionBy("qd").orderBy(col("ascore").desc, col("cd"))
    val pool = apx.withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= m).select("qd", "cd")
    val qv = broadcast(rbatch
      .withColumn("qn", expr("sqrt(vec_dot(qe, qe))")))
    val cv = corpusTok.withColumn("cn", expr("sqrt(vec_dot(ce, ce))"))
    val repAlerts = pool.join(qv, Seq("qd")).join(cv, Seq("cd"))
      .select(col("qd"), col("cd"), col("qt"),
        round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn"))
          * lit(1000000.0)).cast("long").as("mc"))
      .groupBy("qd", "cd", "qt").agg(max("mc").as("mx"))
      .groupBy("qd", "cd").agg(sum("mx").as("score"))
      .filter(col("score") >= minScore)
    // expand rep alerts to every duplicate probe doc in the batch
    val mem = g.select(col("rep").as("qd"), explode(col("docs")).as("qdx"))
    repAlerts.join(mem, Seq("qd"))
      .select(col("qdx").as("qd"), col("cd"), col("score"))
  }

  /** PLAID-shaped multi-vector top-k SERVE (q334's pipeline as the
    * batch operator — q346/q347): token-level IVF cells GENERATE
    * candidate documents (any query token co-probed with any doc token
    * admits the doc), integer SQ8 maxsim over ALL token pairs of each
    * candidate RANKS them, the m-bounded pool reranks at exact
    * micro-cos BIGINT maxsim. `keepDocs` (doc ids as `cd`) restricts
    * the CANDIDATE stage before any scoring — a doc-level takedown is
    * one semi-join that drops ALL of a doc's token rows (the q340
    * tombstone rule lifted to the token index; cells/codes untouched).
    * Dials (np, m) are the q334/q346 swept points; nlist lives in the
    * caller's `ca`/`cents` artifacts (advised via
    * [[IndexAdvisor.adviseTokenIndex]]). Returns (qd, cd) top-k.
    */
  def maxsimPlaidTopK(
      qtok: DataFrame, // qd, qt, qe — query docs' token rows
      corpusTok: DataFrame, // cd, ct, ce — standing cold storage
      ca: DataFrame, // tid, centroid_id — standing token cells
      codes: DataFrame, // id, qc, rc — standing token SQ8 codes
      cents: DataFrame, // centroid_id, centroid (broadcast)
      np: Int,
      m: Int,
      k: Int,
      keepDocs: Option[DataFrame] = None,
      ctokCodes: Option[DataFrame] = None): DataFrame = {
    NativeExpressions.register(qtok.sparkSession)
    val qa = assignToCentroids(qtok.select("qt", "qe"), "qt", "qe",
      cents, nKeep = np).select(col("qt"), col("centroid_id"))
    maxsimPlaidTopKFrom(qtok, corpusTok, qa, ca, codes, m, k, keepDocs,
      ctokCodes)
  }

  /** [[maxsimPlaidTopK]] with CALLER-SUPPLIED query-token probe
    * assignments `qa` (qt, centroid_id — already np-sliced) — the
    * q341 sq8ServeFromAssign convention lifted to the token index, so
    * a recentered (Lloyd-refined, integer-coord) cell layout can serve
    * without materializing float centroid vectors (q353). */
  def maxsimPlaidTopKFrom(
      qtok: DataFrame,
      corpusTok: DataFrame,
      qa: DataFrame, // qt, centroid_id — probe cells per query token
      ca: DataFrame,
      codes: DataFrame,
      m: Int,
      k: Int,
      keepDocs: Option[DataFrame] = None,
      ctokCodes: Option[DataFrame] = None): DataFrame = { // (cd, ct, cc, rc)
    NativeExpressions.register(qtok.sparkSession)
    // standing (cd, ct, cc, rc) artifact: same §2.4 collapse as
    // maxsimSemDedupBatch — the token→doc map and the code table come
    // from one flat scan instead of a per-call corpusTok ⋈ codes join
    val t2d = ctokCodes.map(_.select(col("ct").as("tid"), col("cd")))
      .getOrElse(corpusTok.select(col("ct").as("tid"), col("cd")))
    val cdocs0 = qa.join(broadcast(qtok.select("qd", "qt")), Seq("qt"))
      .join(ca.select(col("tid"), col("centroid_id")), Seq("centroid_id"))
      .join(t2d, Seq("tid"))
      .filter(col("qd") =!= col("cd"))
      .select("qd", "cd").distinct()
    val cdocs = keepDocs.foldLeft(cdocs0) { (d, kset) =>
      d.join(kset.select("cd"), Seq("cd"), "left_semi") }
    val qcodes = broadcast(
      sq8Codes(qtok.select("qt", "qe"), "qt", "qe")
        .select(col("id").as("qt"), col("qc").as("qq"))
        .join(qtok.select("qd", "qt"), Seq("qt")))
    val ctok = ctokCodes.getOrElse(corpusTok.select(col("cd"), col("ct"))
      .join(codes.select(col("id").as("ct"), col("qc").as("cc"),
        col("rc")), Seq("ct")))
    val apx = cdocs.join(qcodes, Seq("qd"))
      .join(ctok, Seq("cd"))
      .select(col("qd"), col("cd"), col("qt"),
        (expr("vec_dotl(qq, cc)")
          * col("rc")).as("apair"))
      .groupBy("qd", "cd", "qt").agg(max("apair").as("amx"))
      .groupBy("qd", "cd").agg(sum("amx").as("ascore"))
    val wp = Window.partitionBy("qd").orderBy(col("ascore").desc, col("cd"))
    val pool = apx.withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= m).select("qd", "cd")
    val qv = broadcast(qtok.withColumn("qn", expr("sqrt(vec_dot(qe, qe))")))
    val cv = corpusTok.withColumn("cn", expr("sqrt(vec_dot(ce, ce))"))
    val served = pool.join(qv, Seq("qd")).join(cv, Seq("cd"))
      .select(col("qd"), col("cd"), col("qt"),
        round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn"))
          * lit(1000000.0)).cast("long").as("mc"))
      .groupBy("qd", "cd", "qt").agg(max("mc").as("mx"))
      .groupBy("qd", "cd").agg(sum("mx").as("score"))
    val ws = Window.partitionBy("qd").orderBy(col("score").desc, col("cd"))
    served.withColumn("rnk", row_number().over(ws))
      .filter(col("rnk") <= k).select("qd", "cd")
  }

  /** Per-vector int8 scalar quantization (the FAISS/ScaNN SQ8 layout):
    * symmetric codes `round(x · 127 / absmax)` (the q96 recipe — round
    * ties away from zero in both engines, so the stored codes are
    * defined integers), plus ONE fixed-point rescale column
    * `rc = round(absmax · 10⁹ / ‖x‖)` folding dequantization and
    * cosine normalization into a stored BIGINT. At query time the
    * candidate rank key is `intdot(codes_q, codes_c) · rc_c` — PURE
    * int64 per pair (the q309 quantized-domain-ADC exactness rule; the
    * query's own absmax/norm are per-query constants that cannot
    * change its ranking), so pool selection replays exactly in SQL.
    * Returns (id, qc array<long>, rc). Resident model: 64 int8 codes
    * + one 4-byte rescale per vector (72 B/vec with a 4-byte cell id —
    * vs 256 B raw floats and ~13-16 B IVFPQ; the scratch parquet
    * stores the codes as int64 for engine portability, the byte
    * accounting is the format's, like the PQ rows').
    */
  def sq8Codes(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    NativeExpressions.register(vecs.sparkSession)
    vecs
      .select(col(idCol).as("id"), col(vecCol).as("vv"))
      .withColumn("am",
        array_max(transform(col("vv"), y => abs(y.cast("double")))))
      .withColumn("nn", expr("sqrt(vec_dot(vv, vv))"))
      .select(col("id"),
        transform(col("vv"),
          x => round(x.cast("double") * lit(127.0) / col("am"))
            .cast("long")).as("qc"),
        round(col("am") * lit(1000000000.0) / col("nn")).cast("long")
          .as("rc"))
  }

  /** Per-vector 1-bit binary quantization (the extreme end of the
    * compression axis — 8 B/vec at dim 64): sign bits packed into two
    * 32-bit halves stored as nonnegative BIGINTs (`h1` = coords 1–32,
    * `h2` = 33–64; two halves so no value ever carries into the int64
    * sign bit — packing is plain addition of disjoint powers of two in
    * both engines, no overflow semantics in play). Zero counts as
    * positive. Returns (id, h1, h2). */
  def bqCodes(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    def packed(arr: Column): Column = aggregate(
      transform(arr, (x, i) => when(x >= lit(0),
        call_function("shiftleft", lit(1L), i.cast("int")))
        .otherwise(lit(0L))),
      lit(0L), (a, x) => a + x)
    vecs.select(col(idCol).as("id"),
      packed(slice(col(vecCol), 1, 32)).as("h1"),
      packed(slice(col(vecCol), 33, 32)).as("h2"))
  }

  /** IVF-BQ top-k serving — the 1-bit rung completing the measured
    * compression ladder (raw 256 B / SQ8 72 B / PQ ~16 B / BQ 16 B
    * per vector resident, at dim 64 with cell id + stored norm... the
    * BQ row is 8 B codes + 4 B cell). The round-11 DuckDB sweep (both
    * SFs, BEFORE this Spark side) measured the three candidate-rank
    * variants:
    *   - symmetric hamming (popcount of xor — integer, but both sides
    *     1-bit): an honest negative at serving pools — 0.33/0.21
    *     recall@5 at m=8, needs m≈200+ to clear 0.8 (the PQ-class
    *     pool-depth cost of ranking error, q307/q308's law);
    *   - float asymmetric (query keeps full precision against ±1
    *     signs): ~3× shallower pools for the same recall;
    *   - INTEGER asymmetric (this implementation): the query is SQ8-
    *     quantized ([[sq8Codes]] — near-lossless, the q326 law) and the
    *     rank key is Σ qc_i·(2·bit_i − 1) — IDENTICAL recall to float
    *     asymmetric at EVERY swept (nprobe, m) point, and pure BIGINT,
    *     so the oracle replays the pool selection exactly.
    * Shipped np=12 with the q308 corpus-scaled pool m =
    * max(100, 3n/20): recall@5 0.928/0.940 at the two SFs. Scale
    * shape: cells + packed codes are build-once fixture artifacts; per
    * query the candidate stage scans nprobe/nlist of 12 B/vec resident
    * codes with a 64-term integer HOF, and the exact rerank touches
    * raw vectors only for the m-bounded pool.
    */
  def ivfBqTopK(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce
      k: Int,
      nlist: Int,
      nprobe: Int,
      m: Int,
      artifact: Option[(String, String, String)] = None): DataFrame = {
    val spark = queries.sparkSession
    NativeExpressions.register(spark)
    def piece(name: String)(build: => DataFrame): DataFrame =
      artifact match {
        case Some((fd, ff, label)) => graft.util.FixtureArtifact.parquet(
          spark, fd, ff, s"${label}_${name}_n$nlist",
          params = Map("nlist" -> nlist.toLong))(build)
        case None => build
      }
    val cents = broadcast(corpus.orderBy("cid").limit(nlist)
      .select(col("cid").as("centroid_id"), col("ce").as("centroid")))
    val ca = piece("ca")(
      assignToCentroids(corpus, "cid", "ce", cents, nKeep = 1)
        .select(col("cid"), col("centroid_id")))
    val codes = piece("bq")(bqCodes(corpus, "cid", "ce"))
    val qa = assignToCentroids(queries, "qid", "qe", cents, nKeep = nprobe)
      .select(col("qid"), col("centroid_id"))
    val qcodes = broadcast(sq8Codes(queries, "qid", "qe")
      .select(col("id").as("qid"), col("qc").as("qq")))
    val cand = qa.join(ca, Seq("centroid_id"))
      .filter(col("qid") =!= col("cid"))
      .join(qcodes, Seq("qid"))
      .join(codes.select(col("id").as("cid"), col("h1"), col("h2")), "cid")
      .select(col("qid"), col("cid"),
        expr("""aggregate(transform(qq, (x, i) -> x *
          (2 * ((CASE WHEN i < 32 THEN shiftright(h1, i)
                 ELSE shiftright(h2, i - 32) END) & 1) - 1)),
          0L, (a, x) -> a + x)""").as("adot"))
    val wp = Window.partitionBy("qid").orderBy(col("adot").desc, col("cid"))
    val pool = cand.withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= m).select("qid", "cid")
    val q = queries.withColumn("qn", expr("sqrt(vec_dot(qe, qe))"))
    val c = corpus.withColumn("cn", expr("sqrt(vec_dot(ce, ce))"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    pool.join(broadcast(q), "qid").join(c, "cid")
      .select(col("qid"), col("cid"),
        round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn")), 6).as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("qid", "cid")
  }

  /** IVF-SQ8 top-k serving (the production-default FAISS `IVF,SQ8`
    * layout): IVF cells prune, int8 scalar-quantized codes rank the
    * probed cells' members, and the top-`m` pool is re-ranked at full
    * precision. The round-11 DuckDB sweep (both SFs, run BEFORE this
    * Spark side existed) measured SQ8 ranking as near-lossless at
    * dim 64: pool containment == the probed-cell ceiling at EVERY
    * swept dial, m=8 saturates (vs the PQ family's hundreds-deep
    * rerank pools — q308/q309), and the m=5 no-rerank serve loses
    * exactly one hit per 250. Candidate scoring is all-BIGINT
    * (`intdot · rc`, [[sq8Codes]]), so the pool — not just the final
    * answer — replays exactly in the oracle. Scale shape: the codes +
    * cell assignment are build-once fixture artifacts when `artifact`
    * is given; per query the work is nprobe cell joins over 72 B/vec
    * resident codes + an m-bounded cold-storage rerank join — the
    * same two-stage residency contract as [[ivfPqTopK]] at 4.5× the
    * bytes and a ~40× smaller pool.
    */
  /** `keep` (optional, round 12): ids passing a metadata predicate —
    * ATTRIBUTE-FILTERED SQ8 serving against the UNCHANGED standing
    * index (cells + codes never rebuild per predicate): the filter
    * semi-joins the probed cell lists before the integer rank, exactly
    * as [[ivfTopKProbeWhere]] does on the raw rung. The round-12
    * DuckDB sweep (both SFs, BEFORE this hook was wired) measured the
    * composition as FREE: filtered-SQ8 recall equals the raw
    * filtered-IVF at every swept (tag, nprobe) point — the q326
    * near-lossless law holds on the filtered axis — and m=8 == m=16
    * everywhere (pool containment is the probed∩filter ceiling), so
    * the q318 over-probe dials carry unchanged and the pool dial
    * needs no selectivity correction (unlike IVFPQ's, see
    * [[ivfPqTopK]]). */
  def ivfSq8TopK(
      queries: DataFrame, // qid, qe
      corpus: DataFrame, // cid, ce
      k: Int,
      nlist: Int,
      nprobe: Int,
      m: Int,
      artifact: Option[(String, String, String)] = None,
      keep: Option[DataFrame] = None): DataFrame = {
    val spark = queries.sparkSession
    NativeExpressions.register(spark)
    def piece(name: String)(build: => DataFrame): DataFrame =
      artifact match {
        case Some((fd, ff, label)) => graft.util.FixtureArtifact.parquet(
          spark, fd, ff, s"${label}_${name}_n$nlist",
          params = Map("nlist" -> nlist.toLong))(build)
        case None => build
      }
    val cents = broadcast(corpus.orderBy("cid").limit(nlist)
      .select(col("cid").as("centroid_id"), col("ce").as("centroid")))
    val ca0 = piece("ca")(
      assignToCentroids(corpus, "cid", "ce", cents, nKeep = 1)
        .select(col("cid"), col("centroid_id")))
    val ca = keep.foldLeft(ca0) { (c, kset) =>
      c.join(kset.select("cid"), Seq("cid"), "left_semi") }
    val codes = piece("sq8")(sq8Codes(corpus, "cid", "ce"))
    val qa = assignToCentroids(queries, "qid", "qe", cents, nKeep = nprobe)
      .select(col("qid"), col("centroid_id"))
    val qcodes = broadcast(sq8Codes(queries, "qid", "qe")
      .select(col("id").as("qid"), col("qc").as("qq")))
    val cand = qa.join(ca, Seq("centroid_id"))
      .filter(col("qid") =!= col("cid"))
      .join(qcodes, Seq("qid"))
      .join(codes.select(col("id").as("cid"), col("qc"), col("rc")), "cid")
      .select(col("qid"), col("cid"),
        (expr("vec_dotl(qq, qc)")
          * col("rc")).as("akey"))
    val wp = Window.partitionBy("qid").orderBy(col("akey").desc, col("cid"))
    val pool = cand.withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= m).select("qid", "cid")
    val q = queries.withColumn("qn", expr("sqrt(vec_dot(qe, qe))"))
    val c = corpus.withColumn("cn", expr("sqrt(vec_dot(ce, ce))"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    pool.join(broadcast(q), "qid").join(c, "cid")
      .select(col("qid"), col("cid"),
        round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn")), 6).as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("qid", "cid")
  }
}
