package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The sketch family's bit arithmetic must agree with real binary math.
  * (Plain deterministic fuzz — the scalatestplus bridge is not in the
  * offline cache; one Spark-side batch evaluation keeps it fast.) */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("leadingZeroBits(hex) == Integer.numberOfLeadingZeros, fuzzed") {
    import spark.implicits._
    val rng = new scala.util.Random(20260813L)
    val xs = 0 +: -1 +: 1 +: Int.MinValue +: Int.MaxValue +:
      List.fill(500)(rng.nextInt())
    val hexes = xs.map(x => f"${x}%08x")
    val got = hexes.toDF("h")
      .select(Sketches.leadingZeroBits(col("h")).as("z"))
      .as[Int].collect().toSeq
    val want = xs.map(Integer.numberOfLeadingZeros)
    assert(got == want)
  }

  test("per-source HLL registers max-merge to the global registers") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val global = Sketches.queries("x2_hll_registers")(spark, d)
      .as[(String, Long)].collect().toMap
    val merged = Sketches.queries("x5_hll_by_source")(spark, d)
      .select(col("bucket"), col("r")).as[(String, Long)].collect()
      .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    assert(merged == global)
  }

  test("HLL estimate lands within 10% of the true distinct count") {
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    val regs = Sketches.queries("x2_hll_registers")(spark, d)
      .as[(String, Long)].collect().toMap
    val est = Sketches.hllEstimate(regs)
    val truth = spark.read.parquet(s"$d/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
      .distinct().count()
    assert(math.abs(est - truth) <= 0.10 * truth, s"est $est vs true $truth")
  }

  test("count-min estimate is an upper bound on the true count") {
    // run the probe query on real testdata: est >= n must hold for every
    // probed token (the sketch can only over-count)
    import spark.implicits._
    val rows = Sketches.queries("x1_countmin_probe")(spark, "/root/testdata/sf0.001")
      .select(col("n"), col("est")).as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, est) => assert(est >= n, s"est $est < true $n") }
  }
}
