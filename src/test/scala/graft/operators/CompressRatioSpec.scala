package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** t20 has no SQL oracle (java.util.zip has no DuckDB twin), so the spec
  * carries the correctness burden: deflate level 6 output is a pure
  * function of the input bytes, repetitive text compresses far below the
  * 0.35 gate, and high-entropy text stays above it. */
class CompressRatioSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ratios are deterministic and separate repetitive from diverse text") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    val docs = Seq(
      1L -> ("spam " * 400).trim,                            // highly repetitive
      2L -> Seq.fill(400)(rnd.alphanumeric.take(6).mkString).mkString(" "))
      .toDF("doc_id", "text")
    // the query reads documents(s, dir) — give it a real parquet dir
    val dir = java.nio.file.Files.createTempDirectory("t20").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run() =
      TextOps.localQueries("t20_compress_ratio")(spark, dir)
        .as[(Long, Long, Long, Double, Int)].collect()
        .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    val a = run()
    val b = run()
    assert(a == b, "deflate output must be deterministic")
    assert(a(1L)._3 == 1 && a(1L)._2 < 0.1, s"repetitive: ${a(1L)}")
    assert(a(2L)._3 == 0 && a(2L)._2 > 0.35, s"diverse: ${a(2L)}")
  }
}
