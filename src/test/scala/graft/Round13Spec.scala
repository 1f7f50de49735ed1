package graft

import org.apache.spark.sql.functions._

/** Round-13 contracts: the token-index advisor's dial arithmetic
  * (corpus-scaled nlist, the q343 slope cure), the PLAID serve's
  * takedown semantics (a keep set of every doc is a no-op; a
  * tombstoned doc never serves), and the graph drift-response
  * decision arithmetic.
  */
class Round13Spec extends SparkTestBase {
  import spark.implicits._

  test("adviseTokenIndex: nlist = pow2(sqrt(nTok)), measured np ratio rescaled") {
    import graft.operators.IndexAdvisor.adviseTokenIndex
    // the two fixture operating points (q346): 500 tokens -> q334's
    // measured config unchanged; 2000 -> cells double, np keeps ratio
    assert(adviseTokenIndex(500L, 16L, 2L) == ((16L, 2L)))
    assert(adviseTokenIndex(2000L, 16L, 2L) == ((32L, 4L)))
    // the ingest point (q348): q343's measured (16, 4)
    assert(adviseTokenIndex(450L, 16L, 4L) == ((16L, 4L)))
    assert(adviseTokenIndex(1800L, 16L, 4L) == ((32L, 8L)))
    // np clamps to nlist (never probes more cells than exist)
    assert(adviseTokenIndex(4L, 2L, 8L) == ((2L, 2L)))
    // np floors at 1
    assert(adviseTokenIndex(500L, 64L, 1L) == ((16L, 1L)))
  }

  test("adviseGraphDrift: keep on preserved edges, repair unless rebuild wins by > 0.02") {
    import graft.operators.IndexAdvisor.adviseGraphDrift
    // isometry: zero churn -> keep, regardless of serve hits
    assert(adviseGraphDrift(0L, 12000L, 0L, 0L, 50L) == "keep")
    assert(adviseGraphDrift(5999L, 12000L, 0L, 250L, 50L) == "keep")
    // fired: repair unless 10*(rb - rp) > nq (margin 0.02 of 5*nq slots)
    assert(adviseGraphDrift(12000L, 12000L, 235L, 232L, 50L) == "repair")
    assert(adviseGraphDrift(12000L, 12000L, 230L, 235L, 50L) == "repair")
    assert(adviseGraphDrift(12000L, 12000L, 229L, 235L, 50L) == "rebuild")
    // boundary: exactly nq/10 hits of margin still repairs
    assert(adviseGraphDrift(6000L, 12000L, 230L, 235L, 50L) == "repair")
  }

  test("NN-Descent refinement is isometry-invariant (the q349 keep proof)") {
    import graft.operators.Similarity
    val corpus = sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val rev = corpus.select(col("cid"), reverse(col("ce")).as("ce"))
    val stitched = Similarity.lshKnnEdgesMultiTable(corpus, d = 4,
      nPlanes = 6, dim = 64, nTables = 2)
    // coordinate reversal preserves every dot product, so refinement
    // over the reversed world must produce the SAME edge set — the
    // measured basis of q349's keep branch (fixture-pinned: a rounded-
    // cosine tie at a 6dp boundary under reversed fold order would
    // fail loudly here, the documented q320-class convention)
    val a = Similarity.nnDescentEdges(stitched, corpus, d = 8, rounds = 1)
      .orderBy("u", "v").collect()
    val b = Similarity.nnDescentEdges(stitched, rev, d = 8, rounds = 1)
      .orderBy("u", "v").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("q350 ingest is re-entrant: two full runs produce the identical layout") {
    // the MERGE accumulation is idempotent on doc_id and every stage is
    // deterministic, so a re-run (fresh standing table, same frozen
    // artifacts) must reproduce the packed layout bit-for-bit
    val fn = SparkEntry.queries("q350_stream_pipeline_ingest")
    val a = fn(spark, sf).collect()
    val b = fn(spark, sf).collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("maxsimPlaidTopK: keep-everything is a no-op; tombstoned docs never serve") {
    import graft.operators.Similarity
    val dir = sf
    val tok = sources.Tables.load(spark, dir, "embeddings").select(
      expr("vec_id div 4").as("doc"), col("vec_id").as("tid"),
      col("embedding").as("e"))
    val cents = broadcast(tok.orderBy("tid").limit(16)
      .select(col("tid").as("centroid_id"), col("e").as("centroid")))
    val ca = Similarity.assignToCentroids(tok.select(col("tid"), col("e")),
        "tid", "e", cents, nKeep = 1)
      .select(col("tid"), col("centroid_id"))
    val codes = Similarity.sq8Codes(tok.select(col("tid"), col("e")),
      "tid", "e")
    val qtok = tok.filter(col("doc") < 5)
      .select(col("doc").as("qd"), col("tid").as("qt"), col("e").as("qe"))
    val corpusTok = tok.select(col("doc").as("cd"), col("tid").as("ct"),
      col("e").as("ce"))
    val allDocs = corpusTok.select("cd").distinct()
    val bare = Similarity.maxsimPlaidTopK(qtok, corpusTok, ca, codes,
      cents, np = 2, m = 10, k = 5).orderBy("qd", "cd").collect()
    val kept = Similarity.maxsimPlaidTopK(qtok, corpusTok, ca, codes,
      cents, np = 2, m = 10, k = 5, keepDocs = Some(allDocs))
      .orderBy("qd", "cd").collect()
    assert(bare.nonEmpty && bare.sameElements(kept))
    // tombstone = the q347 Lehmer mod-3 doc slot: no served cd in it
    val keep = allDocs.filter(
      pmod(col("cd") * lit(2654435761L), lit(3L)) =!= 1)
    val td = Similarity.maxsimPlaidTopK(qtok, corpusTok, ca, codes,
      cents, np = 2, m = 10, k = 5, keepDocs = Some(keep)).collect()
    assert(td.nonEmpty)
    assert(td.forall { r =>
      math.floorMod(r.getLong(1) * 2654435761L, 3L) != 1L })
  }
}
