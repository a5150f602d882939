package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the priority-sampling semantics: the draw is deterministic, the
  * hash matches an independent scalar md5 reimplementation, and weight
  * genuinely tilts inclusion. */
class SamplingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs(n: Int, w: Long => Long) =
    (0L until n.toLong).map(i => (i, "en", w(i))).toDF("doc_id", "lang", "n_chars")

  /** Independent scalar reimplementation of hashU32 (java MessageDigest,
    * not Spark SQL md5) — the spec's source of truth. */
  private def refU32(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  test("hashU32 matches an independent md5 reimplementation") {
    val got = docs(50, _ => 1L)
      .select(col("doc_id"), Sampling.hashU32(col("doc_id")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- 0L until 50L) assert(got(i) === refU32(i), s"doc $i")
  }

  test("the draw equals the brute-force priority order and is deterministic") {
    val d = docs(300, i => 1L + (i % 17) * 50)
    val got = Sampling.weightedSample(d, 40).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val expect = (0L until 300L)
      .map(i => (refU32(i).toDouble / math.max(1L + (i % 17) * 50, 1L).toDouble, i))
      .sortBy(identity).take(40).map(_._2)
    assert(got === expect)
    val again = Sampling.weightedSample(d, 40).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got === again)
  }

  test("weight tilts inclusion: heavy docs are drawn far above their count share") {
    // 1000 docs, 100 of them 100x heavier than the rest
    val d = docs(1000, i => if (i < 100) 10000L else 100L)
    val picked = Sampling.weightedSample(d, 100)
      .select("doc_id").collect().map(_.getLong(0))
    val heavy = picked.count(_ < 100)
    // heavy docs are 10% of rows but ~92% of total weight; a uniform draw
    // would include ~10 — priority sampling must include far more
    assert(heavy > 50, s"only $heavy heavy docs in the sample")
    assert(picked.length === 100)
  }

  test("zero-weight rows are clamped, not dropped or divided by zero") {
    val d = docs(20, _ => 0L)
    val got = Sampling.weightedSample(d, 20).collect()
    assert(got.length === 20)
    assert(got.forall(r => !r.getDouble(4).isInfinite && !r.getDouble(4).isNaN))
  }
}
