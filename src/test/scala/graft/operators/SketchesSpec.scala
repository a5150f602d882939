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

  test("KMV theta estimates land near the true set-op cardinalities") {
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    val rows = Sketches.queries("x10_kmv_theta")(spark, d)
      .as[(String, Long, String)].collect()
      .map { case (p, n, t) => p -> ((n, t)) }.toMap
    // exact truths over the same 3-shingle sets
    val sh = Shingles.wordNGrams(
      spark.read.parquet(s"$d/documents.parquet").select("doc_id", "text"), 3)
      .select((col("doc_id") % 2).as("side"), col("sh")).distinct()
      .localCheckpoint()
    val a = sh.filter(col("side") === 0).select("sh")
    val b = sh.filter(col("side") === 1).select("sh")
    val trueA = a.count(); val trueB = b.count()
    val trueI = a.join(b, "sh").count()
    val trueU = trueA + trueB - trueI
    def est(p: String): Double = {
      val (n, t) = rows(p)
      // sides are sketches (their own kth-smallest/max as theta; exact
      // when n < k); the intersect row — and a union that stayed under
      // k — are counts below the externally-shared truncation theta
      if (p.startsWith("side_")) Sketches.kmvSketchEstimate(n, t)
      else if (n == 256) Sketches.kmvSketchEstimate(n, t)
      else Sketches.kmvBelowThetaEstimate(n, t)
    }
    // k=256 -> sigma ~ 1/sqrt(k-2) ~ 6.3% for full sketches; the
    // intersection count is a binomial(true_i, theta) sample (~10%).
    // Bounds are ~4 sigma.
    assert(math.abs(est("side_0") - trueA) <= 0.25 * trueA,
      s"A: ${est("side_0")} vs $trueA")
    assert(math.abs(est("side_1") - trueB) <= 0.25 * trueB,
      s"B: ${est("side_1")} vs $trueB")
    assert(math.abs(est("union") - trueU) <= 0.25 * trueU,
      s"U: ${est("union")} vs $trueU")
    assert(math.abs(est("intersect") - trueI) <= 0.50 * trueI,
      s"I: ${est("intersect")} vs $trueI")
  }

  test("KMV A-not-B estimates land near the true set differences") {
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    val rows = Sketches.queries("x14_kmv_anotb")(spark, d)
      .as[(String, Long, String)].collect()
      .map { case (p, n, t) => p -> ((n, t)) }.toMap
    val sh = Shingles.wordNGrams(
      spark.read.parquet(s"$d/documents.parquet").select("doc_id", "text"), 3)
      .select((col("doc_id") % 2).as("side"), col("sh")).distinct()
      .localCheckpoint()
    val a = sh.filter(col("side") === 0).select("sh")
    val b = sh.filter(col("side") === 1).select("sh")
    val trueAnB = a.exceptAll(a.join(b, "sh")).count()
    val trueBnA = b.exceptAll(b.join(a, "sh")).count()
    def est(p: String): Double = {
      val (n, t) = rows(p)
      Sketches.kmvBelowThetaEstimate(n, t)
    }
    // below-theta counts are binomial(true, theta) samples; 4-sigma-ish
    assert(math.abs(est("a_not_b") - trueAnB) <= 0.35 * trueAnB,
      s"A\\B: ${est("a_not_b")} vs $trueAnB")
    assert(math.abs(est("b_not_a") - trueBnA) <= 0.35 * trueBnA,
      s"B\\A: ${est("b_not_a")} vs $trueBnA")
  }

  test("KMV sketches MERGE: union of shard sketches == direct sketch") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text")
    def hashes(df: org.apache.spark.sql.DataFrame) =
      Shingles.wordNGrams(df, 3)
        .select(lit(0).as("side"), md5(col("sh").cast("binary")).as("h"))
    def sketchSet(df: org.apache.spark.sql.DataFrame): Seq[String] =
      Sketches.kmvSketch(hashes(df), 256).select("h").as[String]
        .collect().toSeq.sorted
    // two disjoint shards of the even half vs the even half directly —
    // merging per-shard sketches (k smallest distinct of their union)
    // must reproduce the direct sketch exactly: the 100 TB property
    // (sketch each input split, merge tiny states, never re-scan)
    val even = docs.filter(col("doc_id") % 2 === 0)
    val s1 = sketchSet(even.filter(col("doc_id") % 4 === 0))
    val s2 = sketchSet(even.filter(col("doc_id") % 4 =!= 0))
    val merged = (s1 ++ s2).distinct.sorted.take(256)
    val direct = sketchSet(even)
    assert(merged == direct)
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
