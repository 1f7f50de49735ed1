package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.functions.VectorFunctions
import graft.operators.{Dedup, Sessionize}

/** Algebraic-law property tests (SURVEY.md §5.2 item 2), run by sbt's
  * ScalaCheck framework. Few cases per law — each case is a real Spark
  * job on literal data.
  */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val ints = Gen.nonEmptyListOf(Gen.chooseNum(-50, 50))
  private val vecs = Gen.nonEmptyListOf(Gen.chooseNum(-5.0f, 5.0f))
    .suchThat(v => v.exists(_ != 0.0f)).map(_.take(16))

  property("filter conjunction == chained filters") = forAll(ints) { xs =>
    import spark.implicits._
    val df = xs.toDF("x")
    df.filter(col("x") > 0 && col("x") % 2 === 0).count() ==
      df.filter(col("x") > 0).filter(col("x") % 2 === 0).count()
  }

  property("unionAll count is additive") = forAll(ints, ints) { (a, b) =>
    import spark.implicits._
    a.toDF("x").unionByName(b.toDF("x")).count() == (a.size + b.size).toLong
  }

  property("exact dedup is idempotent") = forAll(ints) { xs =>
    import spark.implicits._
    val df = xs.zipWithIndex.map { case (x, i) => (x, i.toLong) }.toDF("k", "id")
    val once = Dedup.exact(df, Seq("k"), "id")
    val twice = Dedup.exact(once, Seq("k"), "id")
    once.collect().map(_.toString).sorted
      .sameElements(twice.collect().map(_.toString).sorted) &&
      once.count() == xs.distinct.size.toLong
  }

  property("cosine(v, v) == 1 for nonzero v") = forAll(vecs) { v =>
    import spark.implicits._
    val c = Seq(Tuple1(v)).toDF("v")
      .select(VectorFunctions.cosine(col("v"), col("v"))).head().getDouble(0)
    math.abs(c - 1.0) < 1e-9
  }

  property("sessionize: ids start at 0 and count <= rows") = forAll(ints) { xs =>
    import spark.implicits._
    val df = xs.zipWithIndex
      .map { case (x, i) => (1L, math.abs(x).toLong * 600, i.toLong) }
      .toDF("u", "sec", "id")
    val s = Sessionize.bySeconds(df, "u", "sec", "id", 1800L)
      .select("session_id").collect().map(_.getLong(0))
    s.min == 0L && s.max < xs.size.toLong
  }

  property("firstPerKey yields one row per key") = forAll(ints) { xs =>
    import spark.implicits._
    val df = xs.zipWithIndex.map { case (x, i) => (x, i.toLong) }.toDF("k", "id")
    Dedup.firstPerKey(df, Seq("k"), Seq(col("id"))).count() ==
      xs.distinct.size.toLong
  }

  // random undirected graphs over a small node universe: the two CC
  // formulations (O(diameter) label propagation vs O(log n) star
  // hooking) must produce identical component labelings
  private val edgeLists: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      a <- Gen.chooseNum(0L, 19L)
      b <- Gen.chooseNum(0L, 19L) if a != b
    } yield (a, b)).map(_.take(30))

  property("componentsStar == components on random graphs") =
    forAll(edgeLists) { es =>
      import spark.implicits._
      val pairs = es.toDF("da", "db")
      val byProp = Dedup.components(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val byStar = Dedup.componentsStar(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      byProp == byStar
    }

  // random corpora with DUPLICATE vectors and NULL labels: the two
  // physical strategies of exact blocked-cosine pairs (all-pairs vs
  // dedup-first-then-expand) must emit identical row sets
  private val dupEmbeddings: Gen[List[(Long, Option[Long], Seq[Float])]] = {
    val base = Gen.listOfN(4, Gen.listOfN(8, Gen.chooseNum(-3.0f, 3.0f)))
      .suchThat(_.forall(_.exists(_ != 0.0f)))
    for {
      vecs <- base
      n <- Gen.chooseNum(6, 14)
      picks <- Gen.listOfN(n, for {
        v <- Gen.chooseNum(0, vecs.size - 1)
        l <- Gen.option(Gen.chooseNum(0L, 1L))
      } yield (v, l))
    } yield picks.zipWithIndex.map { case ((v, l), i) =>
      (i.toLong, l, vecs(v).toSeq)
    }
  }

  property("runningSumsBinned == plain running window (bins force splits)") =
    forAll(Gen.nonEmptyListOf(for {
      p <- Gen.chooseNum(0L, 2L)  // few partitions -> hot groups
      o <- Gen.chooseNum(0L, 50L) // order key with ties
      v <- Gen.chooseNum(-100L, 100L)
    } yield (p, o, v))) { rows =>
      import spark.implicits._
      // unique tie-break: row index as the secondary order column
      val df = rows.zipWithIndex.map { case ((p, o, v), i) =>
        (p, o, i.toLong, v)
      }.toDF("p", "o", "i", "v")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("p").orderBy("o", "i")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val plain = df.select(col("p"), col("o"), col("i"),
          sum("v").over(w).as("run_v"))
        .collect().map(key).sortBy(k => (k._1, k._2, k._3)).toSeq
      // hotThreshold = 5 forces BOTH paths: small groups plain, big
      // groups through the bin/offset machinery
      val binned = operators.Ranks
        .runningSumsBinned(df, "p", "o", Seq("o", "i"), Seq("v"), bins = 4,
          hotThreshold = 5L)
        .select(col("p"), col("o"), col("i"), col("run_v"))
        .collect().map(key).sortBy(k => (k._1, k._2, k._3)).toSeq
      plain == binned
    }

  // shared generator for the window-family bit-identity properties:
  // few partitions (hot groups), an order key WITH ties, a unique
  // tie-break index, and DESC leading order to exercise the
  // direction-carrying ordCols path
  private val winRows = Gen.nonEmptyListOf(for {
    p <- Gen.chooseNum(0L, 2L)
    o <- Gen.chooseNum(0L, 50L)
    v <- Gen.chooseNum(-100L, 100L)
  } yield (p, o, v))

  property("rankedBinned == plain rank windows (bins force splits)") =
    forAll(winRows) { rows =>
      import spark.implicits._
      val df = rows.zipWithIndex.map { case ((p, o, v), i) =>
        (p, o, i.toLong, v)
      }.toDF("p", "o", "i", "v")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("p").orderBy(col("o").desc, col("i"))
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))
      val plain = df.select(col("p"), col("o"), col("i"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"))
        .collect().map(key).sortBy(k => (k._1, k._2, k._3)).toSeq
      val binned = operators.Ranks
        .rankedBinned(df, "p", "-o", Seq(col("o").desc, col("i")),
          bins = 4, hotThreshold = 5L)
        .select(col("p"), col("o"), col("i"),
          col("rn"), col("rnk"), col("drnk"))
        .collect().map(key).sortBy(k => (k._1, k._2, k._3)).toSeq
      plain == binned
    }

  property("lagLeadBinned == plain lag/lead (bin-boundary patches)") =
    forAll(winRows) { rows =>
      import spark.implicits._
      val df = rows.zipWithIndex.map { case ((p, o, v), i) =>
        (p, o, i.toLong, v)
      }.toDF("p", "o", "i", "v")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("p").orderBy(col("o"), col("i"))
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3),
          if (r.isNullAt(4)) null else r.getLong(4))
      val plain = df.select(col("p"), col("o"), col("i"),
          lag(col("v"), 1).over(w).as("lag_v"),
          lead(col("v"), 1).over(w).as("lead_v"))
        .collect().map(key).sortBy(k => (k._1, k._2, k._3)).toSeq
      val binned = operators.Ranks
        .lagLeadBinned(df, "p", "o", Seq(col("o"), col("i")), Seq("v"),
          bins = 4, hotThreshold = 5L)
        .select(col("p"), col("o"), col("i"), col("lag_v"), col("lead_v"))
        .collect().map(key).sortBy(k => (k._1, k._2, k._3)).toSeq
      plain == binned
    }

  property("ntileBinned == plain ntile (uneven buckets, forced bins)") =
    forAll(winRows, Gen.chooseNum(1, 7)) { (rows, n) =>
      import spark.implicits._
      val df = rows.zipWithIndex.map { case ((p, o, v), i) =>
        (p, o, i.toLong, v)
      }.toDF("p", "o", "i", "v")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("p").orderBy(col("o"), col("i"))
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val plain = df.select(col("p"), col("o"), col("i"),
          ntile(n).over(w).cast("long").as("tile"))
        .collect().map(key).sortBy(k => (k._1, k._2, k._3)).toSeq
      val binned = operators.Ranks
        .ntileBinned(df, "p", "o", Seq(col("o"), col("i")), n,
          bins = 4, hotThreshold = 5L)
        .select(col("p"), col("o"), col("i"), col("tile"))
        .collect().map(key).sortBy(k => (k._1, k._2, k._3)).toSeq
      plain == binned
    }

  property("lshKnnEdgesDeduped == lshKnnEdges on dup-heavy corpora") =
    forAll(dupEmbeddings) { rows =>
      import spark.implicits._
      // 8-dim vectors; same hyperplane recipe at dim=8
      val df = rows.map { case (id, _, v) => (id, v) }.toDF("cid", "ce")
      def es(e: org.apache.spark.sql.DataFrame) =
        e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      es(operators.Similarity.lshKnnEdges(df, d = 3, nPlanes = 3, dim = 8)) ==
        es(operators.Similarity.lshKnnEdgesDeduped(df, d = 3, nPlanes = 3, dim = 8))
    }

  property("cosinePairsDeduped == cosinePairs on dup-heavy corpora") =
    forAll(dupEmbeddings) { rows =>
      import spark.implicits._
      val df = rows.toDF("vec_id", "label", "embedding")
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val allPairs = operators.Similarity
        .cosinePairs(df, "vec_id", "embedding", "label", 0.2)
        .collect().map(key).sortBy(k => (k._1, k._2)).toSeq
      val deduped = operators.Similarity
        .cosinePairsDeduped(df, "vec_id", "embedding", "label", 0.2)
        .collect().map(key).sortBy(k => (k._1, k._2)).toSeq
      allPairs == deduped
    }

  // SemDeDup's two physical strategies (q264 all-pairs vs q272
  // dedup-first through bit-identical groups) must agree row-for-row on
  // corpora with duplicate vectors; ids are spread (*7) so some exceed
  // the 32-seed cutoff and duplicate SEEDS occur too
  property("semdedup dedup-first == all-pairs on dup-heavy corpora") =
    forAll(dupEmbeddings) { rows =>
      import spark.implicits._
      // per-iteration scratch is cleaned up and the query fns' internal
      // persists released — a ScalaCheck run must not accumulate disk
      // or executor storage memory across iterations (ADVICE r6)
      val dirPath = java.nio.file.Files.createTempDirectory("semdd")
      try {
        val dir = dirPath.toString
        rows.map { case (id, l, v) => (id * 7, l.map(_.toInt), v) }
          .toDF("vec_id", "label", "embedding")
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        def key(r: org.apache.spark.sql.Row) =
          (r.getLong(0), r.getLong(1), r.getDouble(2))
        val all = queries.Round6b.defs("q264_llm_semdedup").fn(spark, dir)
          .collect().map(key).toSeq.sortBy(_._1)
        val dd = queries.Round6c.defs("q272_llm_semdedup_dedup").fn(spark, dir)
          .collect().map(key).toSeq.sortBy(_._1)
        all == dd
      } finally {
        spark.catalog.clearCache() // both query fns persist internally
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dirPath)
          .sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }

  // random word corpora with planted near-duplicates: the prefix-filtered
  // set-similarity join (PPJoin family) must emit exactly the pairs the
  // full inverted-index join emits — the prefix filter is lossless
  private val dupDocs: Gen[List[(Long, String)]] = {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val sent = Gen.listOfN(8, word).map(_.mkString(" "))
    for {
      bases <- Gen.listOfN(3, sent)
      n <- Gen.chooseNum(6, 12)
      picks <- Gen.listOfN(n, for {
        b <- Gen.chooseNum(0, bases.size - 1)
        tweak <- Gen.option(word)
      } yield (b, tweak))
    } yield picks.zipWithIndex.map { case ((b, tw), i) =>
      (i.toLong, tw.map(w => bases(b) + " " + w).getOrElse(bases(b)))
    }
  }

  property("jaccardPairsPrefix == jaccardPairs on dup-heavy corpora") =
    forAll(dupDocs) { rows =>
      import spark.implicits._
      val df = rows.toDF("doc_id", "text")
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getDouble(2))
      val full = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5)
        .collect().map(key).sortBy(k => (k._1, k._2)).toSeq
      val pref = Dedup.jaccardPairsPrefix(df, "doc_id", "text", 3, 0.5)
        .collect().map(key).sortBy(k => (k._1, k._2)).toSeq
      full == pref
    }

  property("jaccardPairsDeduped == jaccardPairs on dup-heavy corpora") =
    forAll(dupDocs) { rows =>
      import spark.implicits._
      val df = rows.toDF("doc_id", "text")
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getDouble(2))
      val full = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5)
        .collect().map(key).sortBy(k => (k._1, k._2)).toSeq
      val dd = Dedup.jaccardPairsDeduped(df, "doc_id", "text", 3, 0.5)
        .collect().map(key).sortBy(k => (k._1, k._2)).toSeq
      full == dd
    }

  private val posSets = Gen.nonEmptyListOf(Gen.zip(
    Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 60L)))
  private val spans = Gen.chooseNum(1, 7)

  property("spanUnionCount == brute-force interval union per key") =
    forAll(posSets, spans) { (rows, span) =>
      import spark.implicits._
      val distinctRows = rows.distinct
      val df = distinctRows.toDF("k", "pos")
      val got = Dedup.spanUnionCount(df, "k", "pos", span)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = distinctRows.groupBy(_._1).map { case (k, ps) =>
        k -> ps.flatMap { case (_, p) => p until (p + span) }.toSet.size.toLong
      }
      got == want
    }

  private val series = Gen.nonEmptyListOf(Gen.zip(
    Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 20L), Gen.chooseNum(1L, 9L)))

  property("interpolateLinear == per-key brute-force interpolation") =
    forAll(series) { rows =>
      import spark.implicits._
      val obs = rows.map { case (k, t, v) => (k, t, v) }
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // one obs per (k,t)
      val got = graft.operators.TimeSeries
        .interpolateLinear(obs.toDF("k", "t", "v"), "k", "t", "v", step = 1L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3)))
        .toMap
      val want = obs.groupBy(_._1).flatMap { case (k, os) =>
        val m = os.map(o => o._2 -> o._3).toMap
        val (lo, hi) = (m.keys.min, m.keys.max)
        (lo to hi).map { t =>
          val value = m.get(t) match {
            case Some(v) => v.toDouble
            case None =>
              val tp = m.keys.filter(_ < t).max; val tn = m.keys.filter(_ > t).min
              m(tp).toDouble + (m(tn).toDouble - m(tp).toDouble) *
                ((t - tp).toDouble / (tn - tp).toDouble)
          }
          (k, t) -> (value, if (m.contains(t)) 0L else 1L)
        }
      }
      got == want
    }

  private val scored = Gen.nonEmptyListOf(Gen.zip(
    Gen.chooseNum(-100L, 100L), Gen.chooseNum(1L, 5L), Gen.chooseNum(0L, 3L)))

  property("Ranks.cumSums == global running sums, any bin count") =
    forAll(scored, Gen.oneOf(1, 2, 7, 64)) { (rows, bins) =>
      import spark.implicits._
      val d = rows.groupBy(_._1).map { case (k, rs) =>
        (k, rs.map(_._2).sum, rs.map(_._3).sum) }.toSeq
      val got = graft.operators.Ranks
        .cumSums(d.toDF("sc", "n", "np"), "sc", Seq("n", "np"), bins)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
      val sorted = d.sortBy(_._1)
      val want = sorted.zipWithIndex.map { case ((k, _, _), i) =>
        k -> (sorted.take(i + 1).map(_._2).sum, sorted.take(i + 1).map(_._3).sum)
      }.toMap
      got == want
    }

  private val groupedScored = Gen.nonEmptyListOf(Gen.zip(
    Gen.chooseNum(0L, 2L), Gen.chooseNum(-50L, 50L), Gen.chooseNum(1L, 5L)))

  property("Ranks.cumSumsBy == per-group running sums, any bin count") =
    forAll(groupedScored, Gen.oneOf(1, 3, 64)) { (rows, bins) =>
      import spark.implicits._
      val d = rows.groupBy(r => (r._1, r._2)).map { case ((g, k), rs) =>
        (g, k, rs.map(_._3).sum) }.toSeq
      val got = graft.operators.Ranks
        .cumSumsBy(d.toDF("g", "sc", "n"), Seq("g"), "sc", Seq("n"), bins)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
      val want = d.groupBy(_._1).flatMap { case (g, rs) =>
        val sorted = rs.sortBy(_._2)
        sorted.zipWithIndex.map { case ((_, k, _), i) =>
          (g, k) -> sorted.take(i + 1).map(_._3).sum }
      }.toMap
      got == want
    }
}
