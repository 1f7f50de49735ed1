package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.plans.NativeExpressions
import graft.sources.Tables

/** The codegen'd vec_dot must be bit-identical to the higher-order-
  * function form (same sequential ascending-index double accumulation) —
  * that is what keeps the oracle parity intact when it replaces the HOF
  * in similarity operators.
  */
class NativeExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("vec_dot equals HOF dot bitwise on all fixture embeddings") {
    NativeExpressions.register(spark)
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("embedding").as("a"), col("embedding").as("b"))
    val diff = emb.select(
        expr("vec_dot(a, b)").as("native"),
        VectorFunctions.dot(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("vec_dot handles nulls and works from plain SQL") {
    NativeExpressions.register(spark)
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f)))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val rows = spark.sql("SELECT vec_dot(a, b) AS d FROM vecs ORDER BY d").collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) == 11.0)
  }

  test("vec_dotl equals the HOF long fold bitwise on SQ8 codes") {
    NativeExpressions.register(spark)
    val codes = graft.operators.Similarity.sq8Codes(
      Tables.load(spark, sf, "embeddings")
        .select(col("vec_id").as("id0"), col("embedding").as("e")),
      "id0", "e")
    val pairs = codes.select(col("id"), col("qc").as("a"))
      .join(codes.select((col("id") + 1).as("id"), col("qc").as("b")), "id")
    val diff = pairs.select(
        expr("vec_dotl(a, b)").as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, " +
          "(acc, x) -> acc + x)").as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
    // null propagation
    val df = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(3L, 4L))),
      (None, Some(Seq(1L)))).toDF("a", "b")
    df.createOrReplaceTempView("lvecs")
    val rows = spark.sql("SELECT vec_dotl(a, b) AS d FROM lvecs ORDER BY d")
      .collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getLong(0) == 11L)
  }

  test("word_ngram_hashes: count, determinism, and injectivity basics") {
    NativeExpressions.register(spark)
    val df = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y"), (4L, "only"))
      .toDF("id", "text")
    val g = df.select(col("id"), expr("word_ngram_hashes(text, 3)").as("gh"))
    // len-n+1 shingles per doc; docs shorter than n emit nothing
    val counts = g.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 2L, 2L -> 2L))
    // identical texts produce identical hash sets
    val s1 = g.filter(col("id") === 1).select("gh").collect().map(_.getLong(0)).toSet
    val s2 = g.filter(col("id") === 2).select("gh").collect().map(_.getLong(0)).toSet
    assert(s1 == s2 && s1.size == 2)
    // word-boundary sensitivity: ["ab","c"] != ["a","bc"]
    val h = Seq(("ab c x", 1), ("a bc x", 2)).toDF("t", "k")
      .select(col("k"), expr("word_ngram_hashes(t, 3)").as("gh"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h(1) != h(2))
  }

  test("word_ngram_hashes plans with no exchange before the generate") {
    NativeExpressions.register(spark)
    val plan = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), expr("word_ngram_hashes(text, 3)").as("gh"))
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("wordngramhashes") || plan.toLowerCase.contains("word_ngram_hashes"))
    assert(!plan.contains("Exchange"))
  }

  test("morton2 matches the composed-arithmetic interleave and handles nulls") {
    NativeExpressions.register(spark)
    val zExpr = (0 until 16).map { i =>
      s"((x div ${1L << i}) % 2) * ${1L << (2 * i)}" +
        s" + ((y div ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    val df = spark.range(0, 2000)
      .selectExpr("(id * 2654435761) % 65536 AS x", "(id * 40503) % 65536 AS y")
    val bad = df.selectExpr("x", "y", s"morton2(x, y) AS m", s"$zExpr AS a")
      .filter(col("m") =!= col("a")).count()
    assert(bad == 0)
    // corners + null propagation
    val c = Seq[(java.lang.Long, java.lang.Long)]((0L, 0L), (65535L, 0L),
      (0L, 65535L), (65535L, 65535L), (null, 1L))
      .toDF("x", "y").selectExpr("morton2(x, y) AS m").collect()
    assert(c(0).getLong(0) == 0L)
    assert(c(1).getLong(0) == 0x55555555L)
    assert(c(2).getLong(0) == 0xaaaaaaaaL)
    assert(c(3).getLong(0) == 0xffffffffL)
    assert(c(4).isNullAt(0))
  }
}
