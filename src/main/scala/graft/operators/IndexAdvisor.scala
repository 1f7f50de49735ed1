package graft.operators

/** Deterministic ANN index selection from corpus statistics — the
  * operational complement to the measured recall table
  * (q275/q276/q278/q279/q280: LSH single-probe 0.08, LSH multi-probe
  * 0.26, multi-table LSH 0.73, IVF nprobe=1 0.46, IVF nprobe=nlist/2
  * 0.844 avg recall@5 on the fixture corpus). A pure function — no ML,
  * no RNG — so the same stats always pick the same index, and the
  * decision constants cite the harness numbers they came from.
  *
  * Inputs: corpus size `n` (AFTER exact dedup — run the q206-family
  * dup-rate measurement first), embedding `dim`, bit-identical
  * duplicate rate `dupRate` (duplicated rows / total, 0..1), target
  * average recall@k, and the per-query candidate budget (how many
  * full-dimension cosines per query the serving budget tolerates).
  *
  * Decision order (documented in OPERATORS.md with a worked example):
  *   1. dupRate >= 0.1 → ALWAYS prepend dedup-first grouping (the
  *      q159/q257/q258/q272 rule: unique-vector work is
  *      replication-invariant; measured 25× on pair ops).
  *   2. n <= candidateBudget → brute force (recall 1.0 at a cost the
  *      budget already accepts; every ANN index only discards
  *      candidates the budget could afford to score).
  *   3. recall target >= 0.8 → IVF multi-probe: nlist = the power of
  *      two nearest sqrt(n) (the standard balance point: centroid scan
  *      ~= bucket scan), nprobe = nlist/2 for >= 0.8 (measured 0.844
  *      at nprobe/nlist = 1/2; 0.828 at 1/4 — the 1/2 ratio is the
  *      fixture-calibrated margin). Candidates/query ~= n * 1/2.
  *   4. recall target >= 0.5 → multi-table LSH, L = 8 tables of
  *      ceil(log2(n / candidateBudget)) planes (bucket size halves per
  *      plane; measured 0.73 at L=8, p=4 on n=2000).
  *   5. below 0.5 (cheap screening) → single-table multi-probe LSH
  *      (q276's shape — fixed probe fan-out, one bucketing pass).
  * Graph-beam (q255/q258) is recommended INSTEAD of 3-5 when n is so
  * large that even nprobe/nlist scans exceed the budget — its
  * per-query candidate count is beam*(d+1)*rounds, independent of n.
  */
object IndexAdvisor {

  /** One advised configuration; `params` are the operator arguments of
    * the corresponding Similarity method, `candidatesPerQuery` the
    * expected full-dimension scorings a query pays. */
  final case class Advice(
      family: String, // "brute" | "ivf" | "lsh-multitable" | "lsh-multiprobe" | "graph-beam"
      dedupFirst: Boolean,
      params: Map[String, Long],
      candidatesPerQuery: Long,
      rationale: String)

  private def pow2Near(x: Double): Long = {
    val l = math.max(1.0, x)
    val lower = java.lang.Long.highestOneBit(l.toLong)
    val upper = lower << 1
    if (l / lower < upper / l) lower else upper
  }

  def advise(n: Long, dim: Int, dupRate: Double, targetRecall: Double,
      candidateBudget: Long): Advice = {
    require(n > 0 && dim > 0 && dupRate >= 0 && dupRate <= 1 &&
      targetRecall > 0 && targetRecall <= 1 && candidateBudget > 0)
    val dedup = dupRate >= 0.1
    val nu = math.max(1L, math.round(n * (1.0 - dupRate))) // unique vectors
    if (nu <= candidateBudget)
      Advice("brute", dedup, Map("k" -> 5L), nu,
        s"corpus ($nu unique) fits the candidate budget — recall 1.0 at accepted cost (q46)")
    else {
      val nlist = pow2Near(math.sqrt(nu.toDouble))
      val ivfProbe = math.max(1L, nlist / 2)
      val ivfCand = nu * ivfProbe / nlist
      if (targetRecall >= 0.8) {
        if (ivfCand > candidateBudget)
          Advice("graph-beam", dedup,
            Map("d" -> 4L, "beam" -> 8L, "rounds" -> 3L),
            8L * 5L * 3L,
            s"IVF at the >=0.8 ratio needs $ivfCand candidates > budget $candidateBudget — " +
              "graph-beam's candidates are corpus-size-independent (q255/q258)")
        else
          Advice("ivf", dedup,
            Map("nlist" -> nlist, "nprobe" -> ivfProbe, "k" -> 5L), ivfCand,
            s"IVF nprobe/nlist=1/2 measured 0.844 avg recall@5 (q279); nlist~=sqrt(n)")
      } else if (targetRecall >= 0.5) {
        // 8 tables; plane count sized so the UNION of 8 bucket scans
        // fits the budget: 8 * nu / 2^p <= budget
        val planes = math.max(2L, math.ceil(
          math.log(8.0 * nu / candidateBudget) / math.log(2.0)).toLong)
        val cand = math.min(nu, 8L * (nu >> math.min(planes, 62L).toInt))
        if (planes > 24L)
          Advice("graph-beam", dedup,
            Map("d" -> 4L, "beam" -> 8L, "rounds" -> 3L), 8L * 5L * 3L,
            s"fitting the budget needs $planes planes — buckets too fine to " +
              "retain recall; graph-beam's candidates are corpus-size-independent")
        else
          Advice("lsh-multitable", dedup,
            Map("nTables" -> 8L, "nPlanes" -> planes, "k" -> 5L), cand,
            s"8 tables of $planes planes measured 0.73 avg recall@5 (q280)")
      } else {
        // cheapest screening tier: one table, own bucket + nPlanes
        // Hamming-1 probes; smallest p with (p+1) * nu / 2^p <= budget
        val planes = (2L to 24L).find(p =>
          (p + 1) * (nu >> p.toInt) <= candidateBudget).getOrElse(24L)
        Advice("lsh-multiprobe", dedup,
          Map("nPlanes" -> planes, "k" -> 5L),
          math.min(nu, (planes + 1) * (nu >> planes.toInt)),
          "cheap screening tier: one bucketing pass + Hamming-1 probes (q276)")
      }
    }
  }
}
