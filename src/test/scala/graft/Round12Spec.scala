package graft

import org.apache.spark.sql.functions._

/** Round-12 contracts, part 1 (the round-11 verdict/ADVICE hygiene):
  * the lnFx domain guard now lives INSIDE FixedPoint (every caller
  * inherits the loud failure — q324/q327 previously fed unguarded
  * corpus-sized counts that would wrap silently in Spark while DuckDB
  * raised), the Lehmer doc-id hash domain is require/raise_error
  * bounded in all four mix/pack/drift callers, and q335's Laplace
  * smoothing covers all 16 bins per comparison.
  */
class Round12Spec extends SparkTestBase {
  import spark.implicits._

  test("lnFxTable fails loudly past the int64 domain (not a silent wrap)") {
    import graft.operators.FixedPoint
    // in-domain boundary: MaxN itself must evaluate (n·10^6 at the edge)
    val ok = FixedPoint.lnFxTable(Seq(FixedPoint.MaxN).toDF("n"))
      .collect()
    assert(ok.length == 1 && ok(0).getLong(1) > 29L * 1000000L)
    // past the boundary: loud failure, never a wrapped integer
    val e1 = intercept[Exception] {
      FixedPoint.lnFxTable(Seq(FixedPoint.MaxN + 1L).toDF("n")).collect()
    }
    assert(e1.toString.contains("lnFx domain") ||
      Option(e1.getCause).exists(_.toString.contains("lnFx domain")))
    // n = 0 previously DROPPED silently (no 2^i <= 0 join row) — now loud
    val e2 = intercept[Exception] {
      FixedPoint.lnFxTable(Seq(0L).toDF("n")).collect()
    }
    assert(e2.toString.contains("lnFx domain") ||
      Option(e2.getCause).exists(_.toString.contains("lnFx domain")))
  }

  test("lnFxCols fails loudly past the int64 domain (q324/q327's guard)") {
    import graft.operators.FixedPoint
    val ok = FixedPoint.lnFxCols(
        Seq(FixedPoint.MaxN - 1L).toDF("n"), "n + 1", "ln_fx")
      .select("ln_fx").as[Long].collect()
    assert(ok.length == 1 && ok(0) > 29L * 1000000L)
    val e = intercept[Exception] {
      FixedPoint.lnFxCols(Seq(FixedPoint.MaxN).toDF("n"), "n + 1", "ln_fx")
        .select("ln_fx").as[Long].collect()
    }
    assert(e.toString.contains("lnFx domain") ||
      Option(e.getCause).exists(_.toString.contains("lnFx domain")))
  }

  test("adviseFilteredServing: memory blocks brute even when fNu fits") {
    import graft.operators.IndexAdvisor
    import graft.operators.IndexAdvisor.RecallRow
    val rows = Seq(
      RecallRow("sq8-filtered",
        Map("nlist" -> 16L, "nprobe" -> 12L, "m" -> 8L, "k" -> 5L), 0.92),
      RecallRow("ivfpq-filtered",
        Map("nlist" -> 16L, "nprobe" -> 14L, "nSub" -> 16L,
          "nCodes" -> 16L, "k" -> 5L), 0.91))
    // fNu (254) fits the candidate budget, but the raw corpus does NOT
    // fit memory — the q320-style brute short-circuit must NOT fire
    val a = IndexAdvisor.adviseFilteredServing(500L, 254L, 64, 0.8,
      450L, 60000L, rows)
    assert(a.family == "sq8-filtered", a.toString)
    assert(a.params("nlist") == 16L && a.params("nprobe") == 12L)
    // with ample memory the short-circuit DOES fire
    val b = IndexAdvisor.adviseFilteredServing(500L, 254L, 64, 0.8,
      450L, 10000000L, rows)
    assert(b.family == "brute-filtered" && b.candidatesPerQuery == 254L)
  }

  test("adviseFilteredServing: SQ8 evicted by its own bytes -> ivfpq") {
    import graft.operators.IndexAdvisor
    import graft.operators.IndexAdvisor.RecallRow
    val rows = Seq(
      RecallRow("sq8-filtered",
        Map("nlist" -> 16L, "nprobe" -> 12L, "m" -> 8L, "k" -> 5L), 0.95),
      RecallRow("ivfpq-filtered",
        Map("nlist" -> 16L, "nprobe" -> 14L, "nSub" -> 16L,
          "nCodes" -> 16L, "k" -> 5L), 0.94))
    // nu=2000: sq8 bytes 144 kB > 60 kB, ivfpq 32 kB fits; re-derived
    // nlist = 32, nprobe = 14*32/16 = 28, rerank corpus-scaled 300
    val a = IndexAdvisor.adviseFilteredServing(2000L, 996L, 64, 0.8,
      1800L, 60000L, rows)
    assert(a.family == "ivfpq-filtered", a.toString)
    assert(a.params("nlist") == 32L && a.params("nprobe") == 28L &&
      a.params("rerank") == 300L)
    assert(a.candidatesPerQuery == 996L * 28L / 32L)
  }

  test("adviseFilteredServing: escape tier + loud fail") {
    import graft.operators.IndexAdvisor
    import graft.operators.IndexAdvisor.RecallRow
    val graphRow = RecallRow("graph-filtered",
      Map("d" -> 24L, "beam" -> 24L, "rounds" -> 4L, "nSub" -> 16L,
        "nCodes" -> 16L, "k" -> 5L), 0.83)
    val pqRow = RecallRow("ivfpq-filtered",
      Map("nlist" -> 16L, "nprobe" -> 14L, "nSub" -> 16L,
        "nCodes" -> 16L, "k" -> 5L), 0.94)
    // candidate budget below every scan family's cost: only the
    // corpus-size-independent graph row remains (its index fits)
    val a = IndexAdvisor.adviseFilteredServing(1000000L, 500000L, 64,
      0.8, 1000L, 300L * 1000000L, Seq(pqRow, graphRow))
    assert(a.family == "graph-filtered", a.toString)
    // no graph row measured -> loud require, never a silent fallback
    val e = intercept[IllegalArgumentException] {
      IndexAdvisor.adviseFilteredServing(1000000L, 500000L, 64, 0.8,
        1000L, 16L * 1000000L, Seq(pqRow))
    }
    assert(e.getMessage.contains("no measured filtered family"))
  }

  test("filtered serve with keep = ALL ids is identical to unfiltered") {
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val corpus = emb
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val all = corpus.select("cid")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("qid", "cid").collect().map(_.toString).toSeq
    assert(rows(Similarity.ivfSq8TopK(qs, corpus, 5, 16, 10, 8,
        keep = Some(all))) ==
      rows(Similarity.ivfSq8TopK(qs, corpus, 5, 16, 10, 8)))
    assert(rows(Similarity.ivfPqTopK(qs, corpus, 5, 16, 10, 16, 16, 64,
        rerank = 50, keep = Some(all))) ==
      rows(Similarity.ivfPqTopK(qs, corpus, 5, 16, 10, 16, 16, 64,
        rerank = 50)))
    spark.catalog.clearCache()
  }

  test("filtered serves emit only ids passing the predicate") {
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val corpus = emb
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val keep = emb.filter(col("label") < 5).select(col("vec_id").as("cid"))
    val keepSet = keep.collect().map(_.getLong(0)).toSet
    val sq8 = Similarity.ivfSq8TopK(qs, corpus, 5, 16, 12, 8,
      keep = Some(keep)).select("cid").collect().map(_.getLong(0))
    assert(sq8.nonEmpty && sq8.forall(keepSet))
    val pq = Similarity.ivfPqTopK(qs, corpus, 5, 16, 14, 16, 16, 64,
      rerank = 100, keep = Some(keep)).select("cid").collect()
      .map(_.getLong(0))
    assert(pq.nonEmpty && pq.forall(keepSet))
    spark.catalog.clearCache()
  }

  test("q341 warm-start Lloyd retrain matches an independent reference") {
    import graft.queries.Round12
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") < 200)
      .select(col("vec_id").as("cid"), reverse(col("embedding")).as("ce"))
    val seeds = Round12.standingSeedCoords(
      emb.filter(col("vec_id") < 200)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")))
    val (c1, ra1) = Round12.lloydWarmRetrain(corpus, seeds)
    val got = ra1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent driver-side reference: same defined integer kernel,
    // plain Scala arithmetic (the lnFx-spec pattern)
    val vecs = corpus.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(f => math.floor(f.toDouble * 1e6).toLong))
      .toMap
    val seedMap = seeds.collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r =>
          r.getAs[Number](1).longValue -> r.getLong(2)).toMap }
    def assign(cents: Map[Long, Map[Long, Long]]): Map[Long, Long] =
      vecs.map { case (cid, xs) =>
        cid -> cents.toSeq.map { case (ccid, cs) =>
          val d = xs.indices.map { i =>
            val dx = xs(i) - cs(i + 1L); dx * dx }.sum
          (d, ccid)
        }.min._2
      }
    val a1 = assign(seedMap)
    val byC = a1.groupBy(_._2)
    val c1ref = byC.map { case (ccid, members) =>
      ccid -> (1 to 64).map { i =>
        val xs = members.keys.toSeq.map(cid => vecs(cid)(i - 1))
        i.toLong -> math.floor(xs.sum.toDouble / xs.size).toLong
      }.toMap
    }
    assert(assign(c1ref) == got, "retrained assignment must match the reference")
    // the retrained centroids themselves match too
    val c1got = c1.collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r =>
          r.getAs[Number](1).longValue -> r.getLong(2)).toMap }
    assert(c1got == c1ref, "retrained centroid coords must match")
    spark.catalog.clearCache()
  }

  test("q343 maxsim ingest scoring is doc-atomic batch-split invariant") {
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val docSlot = pmod(expr("vec_id div 4") * lit(2654435761L), lit(10L))
    val stok = emb.filter(docSlot =!= 0)
      .select(expr("vec_id div 4").as("cd"), col("vec_id").as("ct"),
        col("embedding").as("ce"))
    val cents = broadcast(stok.orderBy("ct").limit(16)
      .select(col("ct").as("centroid_id"), col("ce").as("centroid")))
    val ca = Similarity.assignToCentroids(
        stok.select(col("ct").as("tid"), col("ce").as("e")),
        "tid", "e", cents, nKeep = 1)
      .select(col("tid"), col("centroid_id"))
    val codes = Similarity.sq8Codes(stok.select(col("ct"), col("ce")),
      "ct", "ce")
    val probe = emb.filter(docSlot === 0)
      .select(expr("vec_id div 4").as("qd"), col("vec_id").as("qt"),
        col("embedding").as("qe"))
    def score(b: org.apache.spark.sql.DataFrame) =
      Similarity.maxsimSemDedupBatch(b, stok, ca, codes, cents,
        np = 4, m = 40, minScore = 700000L)
        .collect().map(_.toString).toSet
    val full = score(probe)
    assert(full.nonEmpty, "fixture must produce at least one alert")
    // two DOC-ATOMIC batches (split by doc parity) reproduce the
    // one-shot alert set exactly — the ingest contract
    val split = score(probe.filter(pmod(col("qd"), lit(2)) === 0)) ++
      score(probe.filter(pmod(col("qd"), lit(2)) === 1))
    assert(split == full, "doc-atomic splits must reproduce the alerts")
    spark.catalog.clearCache()
  }

  test("q342 encoded-token pack invariants at sf0.001") {
    val out = graft.queries.Round12.defs("q342_llm_encoded_token_pack")
      .fn(spark, sf).collect()
    assert(out.nonEmpty)
    // offsets tile gap-free in (hsh, doc_id) order — the q332 algebra
    // holds unchanged on encoded counts
    var off = 0L
    out.foreach { r =>
      assert(r.getLong(4) == off, "offset gap")
      off += r.getLong(2)
    }
    // every doc contributes >= 1 encoded token (the UNK rule floor)
    assert(out.forall(_.getLong(2) >= 1L))
    spark.catalog.clearCache()
  }

  test("q335 smooths ALL 16 bins per cmp (empty bins carry (1,1))") {
    val out = graft.queries.Round11b.defs("q335_llm_drift_psi")
      .fn(spark, sf).collect()
    out.groupBy(_.getString(0)).foreach { case (cmp, rows) =>
      val bins = rows.filter(_.getLong(1) >= 0L).map(_.getLong(1)).sorted
      assert(bins.toSeq == (0L to 15L), s"$cmp: must emit all 16 bins")
      // Laplace totals: Na = n_cmp_refs + 16, Nb likewise
      val roll = rows.find(_.getLong(1) == -1L).get
      assert(rows.filter(_.getLong(1) >= 0L).map(_.getLong(2)).sum ==
        roll.getLong(2), s"$cmp: aa must sum to Na")
    }
    spark.catalog.clearCache()
  }
}
