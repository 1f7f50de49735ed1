package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}

class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("VectorFunctions dot/norm/cosine") {
    val df = Seq((Seq(3.0f, 4.0f), Seq(4.0f, 3.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.norm(col("a")).as("n"),
      VectorFunctions.cosine(col("a"), col("a")).as("c")).head()
    assert(r.getDouble(0) == 24.0)
    assert(r.getDouble(1) == 5.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("shingles produce n-grams; short texts produce none") {
    val df = Seq("a b c d", "a b").toDF("text")
    val out = df.select(TextFunctions.shingles(
      TextFunctions.tokens(col("text")), 3).as("sh")).collect()
    assert(out(0).getSeq[String](0) == Seq("a_b_c", "b_c_d"))
    assert(out(1).getSeq[String](0).isEmpty)
  }

  test("langId picks the dominant stopword language on real text") {
    val df = Seq(
      ("the cat and the dog went to the park", "en"),
      ("der hund und die katze sind nicht da", "de"),
      ("el perro y la casa es un lugar", "es"),
      ("xyzzy plugh qwerty", "und")).toDF("text", "expect")
    val out = df.select(col("expect"),
      TextFunctions.langId(TextFunctions.tokens(col("text"))).as("got"))
      .collect()
    out.foreach(r => assert(r.getString(1) == r.getString(0),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("tokenEstimate and fingerprint are deterministic") {
    val df = Seq("Hello World").toDF("text")
    val r = df.select(TextFunctions.tokenEstimate(col("text")).as("t"),
      TextFunctions.fingerprint(col("text")).as("f")).head()
    assert(r.getLong(0) == 3) // ceil(11/4)
    assert(r.getString(1) == java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes).map("%02x".format(_)).mkString)
  }

  test("WeightedAvg aggregator: exact decimal accumulation") {
    val df = Seq((10.0, 1.0), (20.0, 3.0)).toDF("x", "w")
    val wavg = org.apache.spark.sql.functions.udaf(functions.Udafs.WeightedAvg)
    val r = df.agg(wavg(col("x"), col("w")).as("v")).head().getDouble(0)
    assert(r == (10.0 * 1 + 20.0 * 3) / 4.0) // 17.5 exactly
    // empty input -> NaN, not a crash
    val e = df.filter(col("x") > 100).agg(wavg(col("x"), col("w"))).head().getDouble(0)
    assert(e.isNaN)
  }

  test("hyperplaneBucket is stable and bounded") {
    val planes = operators.Similarity.hyperplanes(4, 3)
    val df = Seq(Seq(1.0f, 2.0f, -1.0f)).toDF("v")
    val b1 = df.select(VectorFunctions.hyperplaneBucket(col("v"), planes)).head().getLong(0)
    val b2 = df.select(VectorFunctions.hyperplaneBucket(col("v"), planes)).head().getLong(0)
    assert(b1 == b2 && b1 >= 0 && b1 < 16)
  }
}
