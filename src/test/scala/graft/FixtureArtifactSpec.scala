package graft

import org.apache.spark.sql.functions._
import graft.util.FixtureArtifact
import java.util.concurrent.atomic.AtomicInteger

/** The round-10 verdict's FixtureArtifact hardening contract:
  * builds run OUTSIDE the cache lock (two concurrent callers of the
  * same key produce exactly one build, the loser awaits the winner),
  * a changed dial is a changed label hence a REBUILD (never a stale
  * serve), and a label that under-encodes its dials (same label,
  * different params) fails loudly instead of silently serving the
  * first build.
  */
class FixtureArtifactSpec extends SparkTestBase {

  private def fresh(tag: String) = s"fa_spec_${tag}_${System.nanoTime}"

  test("concurrency: two threads, same key, exactly one build") {
    val label = fresh("conc")
    val builds = new AtomicInteger(0)
    def ask(): Long = FixtureArtifact.parquet(spark, sf, "region.parquet",
      label) {
      builds.incrementAndGet()
      Thread.sleep(200) // widen the race window
      spark.range(7).toDF("id")
    }.count()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val f1 = Future(ask()); val f2 = Future(ask())
    assert(Await.result(f1, 120.seconds) == 7L)
    assert(Await.result(f2, 120.seconds) == 7L)
    assert(builds.get() == 1, "exactly one build must run for one key")
  }

  test("changed dial => changed label => rebuild, not stale serve") {
    val base = fresh("dial")
    val builds = new AtomicInteger(0)
    def ask(d: Int): Long = FixtureArtifact.parquet(spark, sf,
      "region.parquet", s"${base}_d$d", Map("d" -> d.toLong)) {
      builds.incrementAndGet()
      spark.range(d.toLong).toDF("id")
    }.count()
    assert(ask(3) == 3L)
    assert(ask(5) == 5L) // different dial: its OWN artifact
    assert(ask(3) == 3L) // cached — no third build
    assert(builds.get() == 2)
  }

  test("under-encoded label (same label, different params) fails loudly") {
    val label = fresh("mismatch")
    FixtureArtifact.parquet(spark, sf, "region.parquet", label,
      Map("beam" -> 8L))(spark.range(1).toDF("id")).count()
    val e = intercept[IllegalArgumentException] {
      FixtureArtifact.parquet(spark, sf, "region.parquet", label,
        Map("beam" -> 16L))(spark.range(1).toDF("id"))
    }
    assert(e.getMessage.contains("dial mismatch"))
  }

  test("failed build clears the slot so a later caller retries") {
    val label = fresh("fail")
    intercept[RuntimeException] {
      FixtureArtifact.parquet(spark, sf, "region.parquet", label) {
        sys.error("boom")
      }
    }
    val n = FixtureArtifact.parquet(spark, sf, "region.parquet", label)(
      spark.range(4).toDF("id")).count()
    assert(n == 4L)
  }

  test("_GRAFT_PARAMS sidecar records label and dials") {
    val label = fresh("sidecar")
    val df = FixtureArtifact.parquet(spark, sf, "region.parquet", label,
      Map("rounds" -> 4L, "beam" -> 24L))(spark.range(2).toDF("id"))
    df.count()
    val dir = df.inputFiles.head.stripPrefix("file:")
      .reverse.dropWhile(_ != '/').drop(1).reverse
    val side = java.nio.file.Paths.get(dir, "_GRAFT_PARAMS")
    val body = new String(java.nio.file.Files.readAllBytes(side), "UTF-8")
    assert(body.contains(s"label=$label"))
    assert(body.contains("beam=24") && body.contains("rounds=4"))
  }
}
