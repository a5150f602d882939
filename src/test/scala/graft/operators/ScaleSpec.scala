package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import java.nio.file.Files

/** Scale-technique proofs: salting preserves semantics, and partitioned
  * writes give partition-pruned scans (the driver-visible half of the
  * 100 TB story that local correctness tests can actually exercise). */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saltedJoin returns exactly the plain-join rows under heavy skew") {
    import spark.implicits._
    // one dominant key (90% of rows) + a long tail
    val big = (1 to 5000).map(i => (if (i <= 4500) 1L else i.toLong % 37, s"v$i"))
      .toDF("k", "payload")
    val small = (0L to 40L).map(k => (k, s"dim$k")).toDF("k", "attr")
    val plain = big.join(small, "k").orderBy("payload").collect().toSeq
    val salted = Skew.saltedJoin(big, small, "k", r = 8)
      .select("k", "payload", "attr").orderBy("payload").collect().toSeq
    assert(salted == plain)
    val counts = Skew.twoPhaseCount(big, "k", r = 8)
      .as[(Long, Long)].collect().toMap
    val expected1 = 4500 + (4501 to 5000).count(_ % 37 == 1)
    assert(counts(1L) == expected1)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1 to 20000).map(i => (i.toLong % 512, s"f$i")).toDF("k", "fact")
        .write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("fact_b")
      (0L to 511L).map(k => (k, s"d$k")).toDF("k", "dim")
        .write.bucketBy(8, "k").mode("overwrite").saveAsTable("dim_b")
      val joined = spark.table("fact_b").join(spark.table("dim_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 20000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS fact_b")
      spark.sql("DROP TABLE IF EXISTS dim_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("partitioned parquet write gives a partition-pruned scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").toString + "/events"
    (1 to 1000).map(i => (i.toLong, Seq("click", "view", "error")(i % 3)))
      .toDF("id", "event_type")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("event_type"), plan)
    // only the matching partition's rows are read
    assert(q.count() == (1 to 1000).count(_ % 3 == 0))
  }
}
