package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only tuning sweep for the ANN recall work (not part of the driver
  * contract): prints avg recall@5 + wall time for each index config at
  * the given SF dir, using the same exact-vs-ann set-membership metric
  * as the q275-family recall harness.
  */
object TuneRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    val qs = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val exact = graft.operators.Similarity.cosineTopK(qs, corpus, k = 5)
      .select(col("qid"), col("cid")).persist()
    exact.count()

    def recall(name: String)(ann: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val a = ann.select(col("qid"), col("cid"))
      val hits = exact.join(a, Seq("qid", "cid")).count()
      val nq = exact.select("qid").distinct().count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"TUNE $name: recall@5=${hits.toDouble / (5.0 * nq)}%.3f time=$secs%.1f s")
    }

    import graft.operators.Similarity._

    // `TuneRecall <dir> graph` sweeps only the graph-ANN family (edge
    // build × NN-Descent refinement × beam depth) — the q303/q304 dials.
    if (args.lift(1).contains("graph")) {
      val cents = broadcast(corpus.orderBy("cid").limit(16)
        .select(col("cid").as("centroid_id"), col("ce").as("centroid")))
      val entries = assignToCentroids(
          qs.select(col("qid"), col("qe")), "qid", "qe", cents, nKeep = 2)
        .select(col("qid"), col("centroid_id").as("cid"))
      val stitched = lshKnnEdgesMultiTable(corpus, d = 4, nPlanes = 6,
        dim = 64, nTables = 4).persist()
      stitched.count()
      // one edge build per (nd, dd) config, materialized BEFORE the br
      // sweep so every timed row reads a warm edge set (comparable
      // times), and unpersisted after its sweep (no cache accumulation)
      // SPARK_GRAFT_TUNE_ND / _DD narrow the sweep (comma-separated)
      def dial(env: String, dflt: Seq[Int]): Seq[Int] =
        sys.env.get(env).map(_.split(',').map(_.trim.toInt).toSeq).getOrElse(dflt)
      for (nd <- dial("SPARK_GRAFT_TUNE_ND", Seq(0, 1, 2));
           dd <- dial("SPARK_GRAFT_TUNE_DD", Seq(8, 16))) {
        if (nd > 0 || dd == 16) {
          // nnDescentEdges materializes every round boundary to scratch
          // parquet internally, so the returned frame is already a flat
          // scan — each beam plan below is shallow and every timed row
          // reads a warm edge set (comparable times across the sweep)
          val e =
            if (nd == 0) stitched
            else nnDescentEdges(stitched, corpus, d = dd, rounds = nd)
          for (br <- dial("SPARK_GRAFT_TUNE_BR", Seq(3, 4, 6));
               bw <- dial("SPARK_GRAFT_TUNE_BEAM", Seq(8)))
            recall(s"graph stitched nd=$nd d=$dd beam=$bw beamRounds=$br")(
              beamTopKFrom(qs, corpus, e, entries, k = 5, beam = bw, rounds = br))
          spark.catalog.clearCache()
          stitched.persist(); stitched.count()
          exact.persist(); exact.count()
        }
      }
      spark.stop(); return
    }

    // `TuneRecall <dir> ivfpq` sweeps the IVFADC composition
    // (cells probed × subspace count × rerank pool) — the q309 dials.
    if (args.lift(1).contains("ivfpq")) {
      def dial(env: String, dflt: Seq[Int]): Seq[Int] =
        sys.env.get(env).map(_.split(',').map(_.trim.toInt).toSeq).getOrElse(dflt)
      for (np <- dial("SPARK_GRAFT_TUNE_NPROBE", Seq(4, 8));
           ns <- dial("SPARK_GRAFT_TUNE_NSUB", Seq(8, 16));
           rr <- dial("SPARK_GRAFT_TUNE_RERANK", Seq(50, 100, 200, 300))) {
        recall(s"ivfpq nlist=16 nprobe=$np nSub=$ns nCodes=16 rerank=$rr")(
          ivfPqTopK(qs, corpus, 5, nlist = 16, nprobe = np, nSub = ns,
            nCodes = 16, dim = 64, rerank = rr))
        spark.catalog.clearCache()
        exact.persist(); exact.count()
      }
      spark.stop(); return
    }

    // `TuneRecall <dir> pq` sweeps the product-quantization family
    // (codebook size × subspace count × rerank pool) — the q307/q308 dials.
    if (args.lift(1).contains("pq")) {
      def dial(env: String, dflt: Seq[Int]): Seq[Int] =
        sys.env.get(env).map(_.split(',').map(_.trim.toInt).toSeq).getOrElse(dflt)
      for (ns <- dial("SPARK_GRAFT_TUNE_NSUB", Seq(8, 16));
           nc <- dial("SPARK_GRAFT_TUNE_NCODES", Seq(16, 32));
           rr <- dial("SPARK_GRAFT_TUNE_RERANK", Seq(0, 50, 100, 200))) {
        recall(s"pq nSub=$ns nCodes=$nc rerank=$rr")(
          pqTopK(qs, corpus, 5, nSub = ns, nCodes = nc, dim = 64, rerank = rr))
        spark.catalog.clearCache()
        exact.persist(); exact.count()
      }
      spark.stop(); return
    }

    recall("ivf nlist=16 nprobe=1")(ivfTopKProbe(qs, corpus, 5, 16, 1))
    recall("ivf nlist=16 nprobe=2")(ivfTopKProbe(qs, corpus, 5, 16, 2))
    recall("ivf nlist=16 nprobe=4")(ivfTopKProbe(qs, corpus, 5, 16, 4))
    recall("ivf nlist=16 nprobe=6")(ivfTopKProbe(qs, corpus, 5, 16, 6))
    recall("ivf nlist=16 nprobe=8")(ivfTopKProbe(qs, corpus, 5, 16, 8))
    recall("ivf nlist=32 nprobe=4")(ivfTopKProbe(qs, corpus, 5, 32, 4))
    recall("ivf nlist=32 nprobe=8")(ivfTopKProbe(qs, corpus, 5, 32, 8))
    recall("mt-lsh p=6 L=4")(lshMultiTableTopK(qs, corpus, 5, 6, 64, 4))
    recall("mt-lsh p=6 L=8")(lshMultiTableTopK(qs, corpus, 5, 6, 64, 8))
    recall("mt-lsh p=4 L=4")(lshMultiTableTopK(qs, corpus, 5, 4, 64, 4))
    recall("mt-lsh p=4 L=8")(lshMultiTableTopK(qs, corpus, 5, 4, 64, 8))
    recall("mt-lsh p=5 L=6")(lshMultiTableTopK(qs, corpus, 5, 5, 64, 6))
    recall("ivf-lloyd nlist=16 r=1 nprobe=2")(ivfLloydTopK(qs, corpus, 5, 16, 2))
    recall("ivf-lloyd nlist=16 r=1 nprobe=4")(ivfLloydTopK(qs, corpus, 5, 16, 4))
    recall("ivf-lloyd nlist=16 r=1 nprobe=8")(ivfLloydTopK(qs, corpus, 5, 16, 8))
    recall("ivf-lloyd nlist=16 r=2 nprobe=4")(ivfLloydTopK(qs, corpus, 5, 16, 4, rounds = 2))
    recall("ivf-lloyd nlist=32 r=1 nprobe=8")(ivfLloydTopK(qs, corpus, 5, 32, 8))
    spark.stop()
  }
}
