package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** lev_bounded: the banded kernel must equal min(levenshtein, k+1) for
  * every (a, b, k) — including the saturation region, unicode (code
  * points, not UTF-16 units), empty strings, and the |m-n| > k fast
  * path — through BOTH the interpreted and the codegen execution paths.
  */
class TextExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Classic full-table Levenshtein over code points (reference). */
  private def levRef(a: String, b: String): Int = {
    val s = a.codePoints().toArray
    val t = b.codePoints().toArray
    val dp = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to s.length; j <- 1 to t.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
    dp(s.length)(t.length)
  }

  test("lev_bounded == min(levenshtein, k+1) on crafted + fuzz, all k in 0..5") {
    import org.apache.spark.unsafe.types.UTF8String
    val crafted = Seq(
      ("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
      ("kitten", "sitting"), ("flaw", "lawn"),
      ("abcdefgh", "abXdefgh"), ("abcdefgh", "hgfedcba"),
      ("café", "cafe"), ("😀ab", "ab"), // non-BMP code point
      ("aaaaaaaaaa", "aaaaaaaaab"), ("xy", "yx"))
    val rnd = new scala.util.Random(41)
    val fuzz = Seq.fill(300) {
      def w = Seq.fill(rnd.nextInt(12))("abcdé"(rnd.nextInt(5))).mkString
      (w, w.map(c => if (rnd.nextInt(4) == 0) 'z' else c))
    }
    for ((a, b) <- crafted ++ fuzz; k <- 0 to 5) {
      val want = math.min(levRef(a, b), k + 1).toLong
      val got = LevFns.levBounded(
        UTF8String.fromString(a), UTF8String.fromString(b), k)
      assert(got == want, s"levBounded('$a','$b',$k) = $got, want $want")
    }
  }

  test("lev_bounded codegen path == kernel; filter <= 1 == full levenshtein") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(43)
    val rows = Seq.fill(500) {
      def w = Seq.fill(3 + rnd.nextInt(8))("abcde"(rnd.nextInt(5))).mkString
      val x = w
      val y = if (rnd.nextBoolean()) x.updated(rnd.nextInt(x.length), 'q') else w
      (x, y)
    }
    val df = rows.toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        call_function("lev_bounded", col("a"), col("b"), lit(1)).as("d"))
      .as[(String, String, Long)].collect()
    got.foreach { case (a, b, d) =>
      assert(d == math.min(levRef(a, b), 2).toLong, s"codegen: ('$a','$b')")
    }
    // the d14 contract: filtering at <= 1 selects exactly the same rows,
    // with exactly the same distances, as the full-distance filter
    val keptBounded = got.filter(_._3 <= 1).toSet
    val keptFull = rows.map { case (a, b) => (a, b, levRef(a, b).toLong) }
      .filter(_._3 <= 1).toSet
    assert(keptBounded == keptFull)
    assert(keptFull.nonEmpty && keptFull.size < rows.size)
  }
}
