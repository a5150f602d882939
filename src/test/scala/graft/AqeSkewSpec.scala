package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime skew handling: q18 demonstrates MANUAL salting; this spec
  * proves the engine's other skew tool — AQE's OptimizeSkewedJoin — on a
  * deliberately skewed sort-merge join. One key holds ~85% of the fact
  * side; with skew-join enabled (and thresholds scaled down to test-data
  * size) the hot partition must be SPLIT at runtime (`skew=true` /
  * `isSkewJoin` in the final adaptive plan) and the result must equal the
  * plain join. At 100 TB this is the difference between one straggler
  * task holding a 2 TB partition and N parallel slices of it — and it
  * needs no code change, which is why the manual salt (q18) is reserved
  * for aggregation skew where AQE cannot help. */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits the hot key of a skewed sort-merge join at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB")
    val saved = confs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // fact: key 0 carries 60k of 65k rows; the other 50 keys 100 each
      val fact = spark.range(0, 65000)
        .select(when(col("id") < 60000, 0L).otherwise(col("id") % 50 + 1)
          .as("k"), col("id").as("v"))
      val other = spark.range(0, 1020)
        .select((col("id") % 51).as("k"), (col("id") * 7).as("w"))
      val joined = fact.join(other, "k")
      // run the join's OWN query execution so its adaptive plan finalizes
      // (a .count() would plan a separate query and leave this one static)
      val n = joined.queryExecution.executedPlan.execute().count()
      // exact expected multiplicity: every key matches 20 rows on the right
      assert(n == 65000L * 20)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      assert(plan.contains("skew=true") || plan.contains("isSkewJoin=true"),
        s"skewed join was not split:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
