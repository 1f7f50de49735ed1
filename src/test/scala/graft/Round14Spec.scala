package graft

import org.apache.spark.sql.functions._

/** Round-14 contracts: the pipeline drift-response decision arithmetic
  * (q352), the drift world's tokenization invariance (the Caesar shift
  * must change every bigram while leaving token accounting untouched —
  * the q350 pack algebra depends on it), and the DSIR scorer's
  * zero-known-feature drop rule.
  */
class Round14Spec extends SparkTestBase {
  import spark.implicits._

  test("advisePipelineDrift: keep on low churn, full-retrain only past the 5-point rate margin") {
    import graft.operators.IndexAdvisor.advisePipelineDrift
    // below the churn threshold -> keep, regardless of measured devs
    assert(advisePipelineDrift(0L, 2688L, 0L, 0L, 50L) == "keep")
    assert(advisePipelineDrift(1343L, 2688L, 776L, 4L, 500L) == "keep")
    // fired: full-retrain iff 5*(refDev - fullDev) > nArr
    assert(advisePipelineDrift(2136L, 2688L, 38L, 2L, 50L) == "full-retrain")
    assert(advisePipelineDrift(21158L, 26406L, 776L, 4L, 500L) == "full-retrain")
    // boundary: a margin of exactly nArr/5 dev units still refreshes
    assert(advisePipelineDrift(2136L, 2688L, 12L, 2L, 50L) == "refresh")
    assert(advisePipelineDrift(2136L, 2688L, 13L, 2L, 50L) == "full-retrain")
    // refresh also wins when it is the better of the two
    assert(advisePipelineDrift(2136L, 2688L, 2L, 38L, 50L) == "refresh")
  }

  test("the Caesar drift world changes every bigram but no token count") {
    val docs = sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val shifted = docs.select(col("doc_id"), col("lang"),
      translate(col("text"), queries.Round14.ShiftFrom,
        queries.Round14.ShiftTo).as("text"))
    // token accounting untouched (letters map to letters: same split)
    val a = queries.Round13.pipeTokHsh(docs)
      .orderBy("doc_id").collect()
    val b = queries.Round13.pipeTokHsh(shifted)
      .orderBy("doc_id").collect()
    assert(a.nonEmpty && a.sameElements(b))
    // every hashed bigram instance changes bucket or at least the
    // underlying bigram — checked at the feature level: the shifted
    // world shares NO (doc, bigram-of-words) pair with the original
    // beyond hash collisions; the operational statement the trigger
    // needs is that the shifted slice's feature multiset differs
    val fa = queries.Round13.pipeFeats(docs)
      .groupBy("f").count().orderBy("f").collect()
    val fb = queries.Round13.pipeFeats(shifted)
      .groupBy("f").count().orderBy("f").collect()
    assert(!fa.sameElements(fb))
  }

  test("adviseTokenDrift: keep on low churn OR when recentering buys <= 0.02") {
    import graft.operators.IndexAdvisor.adviseTokenDrift
    // below the churn threshold -> keep, regardless of measured hits
    assert(adviseTokenDrift(0L, 2000L, 0L, 50L, 50L, 10L) == "keep")
    assert(adviseTokenDrift(999L, 2000L, 30L, 50L, 50L, 10L) == "keep")
    // fired but recentering doesn't pay > 0.02 (the advised-rung sweep:
    // stale 46 >= recentered 45 hits at sf0.1) -> keep (re-encode only)
    assert(adviseTokenDrift(1291L, 2000L, 46L, 45L, 45L, 10L) == "keep")
    assert(adviseTokenDrift(1291L, 2000L, 45L, 46L, 46L, 10L) == "keep")
    // the np=1 screening rung at sf0.1: stale 39, recentered 42 -> recenter
    assert(adviseTokenDrift(1291L, 2000L, 39L, 42L, 42L, 10L) == "recenter")
    // rebuild only past another 0.02 margin over recenter
    assert(adviseTokenDrift(1291L, 2000L, 39L, 42L, 44L, 10L) == "rebuild")
    assert(adviseTokenDrift(1291L, 2000L, 39L, 42L, 43L, 10L) == "recenter")
  }

  test("maxsimPlaidTopKFrom == maxsimPlaidTopK at the same assignments") {
    import graft.operators.Similarity
    graft.plans.NativeExpressions.register(spark)
    val tok = sources.Tables.load(spark, sf, "embeddings")
      .select(expr("vec_id div 4").as("doc"), col("vec_id").as("tid"),
        col("embedding").as("e"))
    val qtok = tok.filter(col("doc") < 4)
      .select(col("doc").as("qd"), col("tid").as("qt"), col("e").as("qe"))
    val ctok = tok.select(col("doc").as("cd"), col("tid").as("ct"),
      col("e").as("ce"))
    val cents = broadcast(tok.orderBy("tid").limit(16)
      .select(col("tid").as("centroid_id"), col("e").as("centroid")))
    val ca = Similarity.assignToCentroids(tok.select("tid", "e"), "tid",
      "e", cents, nKeep = 1).select("tid", "centroid_id")
    val codes = Similarity.sq8Codes(tok.select("tid", "e"), "tid", "e")
    val a = Similarity.maxsimPlaidTopK(qtok, ctok, ca, codes, cents,
      np = 2, m = 10, k = 5).orderBy("qd", "cd").collect()
    val qa = Similarity.assignToCentroids(qtok.select("qt", "qe"), "qt",
      "qe", cents, nKeep = 2).select(col("qt"), col("centroid_id"))
    val b = Similarity.maxsimPlaidTopKFrom(qtok, ctok, qa, ca, codes,
      m = 10, k = 5).orderBy("qd", "cd").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("advisePackCompaction: compact iff padding >= a quarter of the span") {
    import graft.operators.IndexAdvisor.advisePackCompaction
    // the two fixture points (q354 sweep): 5062/5267 and 4789/6621
    assert(advisePackCompaction(5062L, 5267L) == "compact")
    assert(advisePackCompaction(4789L, 6621L) == "compact")
    // the 100x shape: bounded pads, grown data -> keep
    assert(advisePackCompaction(6141L, 186000L) == "keep")
    // boundary: exactly a quarter compacts; just below keeps
    assert(advisePackCompaction(25L, 100L) == "compact")
    assert(advisePackCompaction(24L, 100L) == "keep")
    assert(advisePackCompaction(0L, 0L) == "keep")
  }

  test("tail compaction conserves the mixed doc set and eliminates inter-cycle padding") {
    val td = Seq(
      (1L, "en", 100L, 7L), (2L, "de", 90L, 12L), (3L, "en", 80L, 23L),
      (4L, "fr", 70L, 31L), (5L, "en", 60L, 44L), (6L, "de", 50L, 58L))
      .toDF("doc_id", "lang", "tok", "hsh")
    val cycles = (0 to 2).map { c =>
      queries.Round13.pipeMix(td.filter(pmod(col("hsh"), lit(3L)) === c)) }
    val union = cycles.reduce(_ unionByName _)
    val compacted = queries.Round13.pipePack(union, offBase = 2048L)
    // doc multiset conserved
    assert(compacted.select("doc_id", "lang", "tok", "hsh")
      .orderBy("doc_id").collect()
      .sameElements(union.orderBy("doc_id").collect()))
    // offsets contiguous from the base boundary: span == sum of tokens
    val tot = union.agg(sum("tok")).head().getLong(0)
    val mx = compacted.agg(max(col("off") + col("tok"))).head().getLong(0)
    assert(mx - 2048L == tot)
    // re-packing the compacted rows is idempotent
    val again = queries.Round13.pipePack(
      compacted.select("doc_id", "lang", "tok", "hsh"), offBase = 2048L)
    assert(again.orderBy("doc_id").collect()
      .sameElements(compacted.orderBy("doc_id").collect()))
  }

  test("adviseLexicalPrefix: largest admissible prefix; exact iff it covers every term list") {
    import graft.operators.IndexAdvisor.adviseLexicalPrefix
    // the two fixture points (q355 sweep at budget 90000):
    // sf0.01 full walk fits -> exact at T = maxNqt
    assert(adviseLexicalPrefix(Seq(5973L, 6349L, 16503L), 3, 90000L)
      == ((3, "exact")))
    // sf0.1: T=21 is the last admissible of 29 -> pruned
    val costs01 = (1 to 29).map(t =>
      if (t <= 21) 80000L + t else 95000L + t)
    assert(adviseLexicalPrefix(costs01, 29, 90000L) == ((21, "pruned")))
    // not even T=1 fits (the 10x/100x probe shape): floor serve, pruned
    assert(adviseLexicalPrefix(Seq(101L, 201L), 2, 100L) == ((1, "pruned")))
    // costs need not be monotone for the max-admissible rule
    assert(adviseLexicalPrefix(Seq(50L, 200L, 90L), 3, 100L)
      == ((3, "exact")))
  }

  test("adviseMaxsimServing: token wins on candidates, evicted by bytes at scale") {
    import graft.operators.IndexAdvisor.{RecallRow, adviseMaxsimServing}
    def rows(tokBytes: Long, tokCand: Long, pooBytes: Long, pooCand: Long,
        recT: Double = 0.98, recP: Double = 0.96) = Seq(
      RecallRow("mv-token", Map("bytes" -> tokBytes, "cand" -> tokCand), recT),
      RecallRow("mv-pooled", Map("bytes" -> pooBytes, "cand" -> pooCand), recP))
    // the sf0.01 point: both fit the window, token is the cheaper arm
    assert(adviseMaxsimServing(rows(38000L, 408L, 9000L, 925L),
      0.8, 1000L, 60000L).family == "mv-token")
    // the sf0.1 point: token evicted by its own bytes -> pooled
    assert(adviseMaxsimServing(rows(152000L, 1152L, 36000L, 3700L,
      recP = 0.98), 0.8, 4000L, 60000L).family == "mv-pooled")
    // below-target fallback: max recall among admissible
    assert(adviseMaxsimServing(rows(38000L, 408L, 9000L, 925L,
      recT = 0.5, recP = 0.7), 0.8, 1000L, 60000L).family == "mv-pooled")
    // nothing admissible is a pinned scenario -> loud failure
    assertThrows[IllegalArgumentException] {
      adviseMaxsimServing(rows(152000L, 5000L, 70000L, 5000L),
        0.8, 4000L, 60000L)
    }
  }

  test("q357 maintained ingest is re-entrant: two full runs produce identical output") {
    // the q350 contract extended to the stats accumulation: selection
    // AND churn MERGEs are idempotent, every stage deterministic, so a
    // re-run (fresh standing tables, same frozen artifacts) must
    // reproduce the stats rows and the maintained layout bit-for-bit
    val fn = SparkEntry.queries("q357_stream_pipeline_maintained")
    val a = fn(spark, sf).collect()
    val b = fn(spark, sf).collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("dsirScore drops docs with zero known features (the q350 rule)") {
    val feats = Seq((1L, "en", 10L), (1L, "en", 11L), (2L, "en", 99L))
      .toDF("doc_id", "lang", "f")
    val wt = Seq((10L, 5L), (11L, -3L)).toDF("f", "dlf")
    val out = queries.Round13.dsirScore(feats, wt, kk = -2L)
      .orderBy("doc_id").collect()
    // doc 2's only feature (99) is unknown -> no row at all
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    // doc 1: sfx = 2, n_feats = 2, w_fx = 2 - 2*(-2) = 6
    assert(out.head.getLong(1) == 6L)
  }
}
