package graft

/** SURVEY.md §5.2 (4): every oracled query must produce identical rows
  * under a different shuffle-partition count — catches order- and
  * partitioning-dependent results before the driver's hash compare does.
  */
class DeterminismSpec extends SparkTestBase {

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
      if SparkEntry.oracleSql.contains(name)) {
    test(s"$name is partitioning-invariant") {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val a = fn(spark, sf).collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = fn(spark, sf).collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(a == b, s"$name differs across shuffle partitionings")
    }
  }
}
