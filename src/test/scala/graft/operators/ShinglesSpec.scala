package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The typed n-gram generator must emit exactly what the HOF formulation
  * emitted: tokenization = split(text, ' ') including empty tokens from
  * repeated/leading/trailing spaces, nothing for docs shorter than n. */
class ShinglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hofNGrams(df: org.apache.spark.sql.DataFrame, n: Int) = {
    val ws = split(col("text"), " ")
    df.select(col("doc_id"), explode(when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n)))))
      .otherwise(array().cast("array<string>"))).as("sh"))
  }

  test("wordChunks matches the posexplode-HOF formulation on edge-case texts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p q r s t u v w"),
      (2L, "short doc"),
      (3L, ""),
      (4L, (1 to 20).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    for (n <- Seq(3, 10)) {
      val got = Shingles.wordChunks(docs, n)
        .as[(Long, Int, String)].collect().toSeq.sorted
      val want = docs.select(col("doc_id"), posexplode(expr(
          s"transform(sequence(1, size(split(text, ' ')), $n), " +
            s"i -> concat_ws(' ', slice(split(text, ' '), i, $n)))")))
        .toDF("doc_id", "pos", "chunk")
        .as[(Long, Int, String)].collect().toSeq.sorted
      assert(got == want, s"n=$n")
    }
  }

  test("wordNGrams matches the HOF formulation on edge-case texts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "short"),
      (3L, ""),
      (4L, "a b"),
      (5L, "  leading double  spaces trailing "),
      (6L, "exactly three words")
    ).toDF("doc_id", "text")
    for (n <- Seq(2, 3, 5)) {
      val got = Shingles.wordNGrams(docs, n)
        .as[(Long, String)].collect().toSeq.sorted
      val want = hofNGrams(docs, n)
        .as[(Long, String)].collect().toSeq.sorted
      assert(got == want, s"n=$n")
    }
  }

  test("all generators emit nothing for null text instead of NPEing") {
    import spark.implicits._
    val docs = Seq((1L, null.asInstanceOf[String], "s"), (2L, "a b c", "s"))
      .toDF("doc_id", "text", "source")
    assert(Shingles.wordChunks(docs, 2).filter($"doc_id" === 1L).count() == 0)
    assert(Shingles.wordNGrams(docs, 2).filter($"doc_id" === 1L).count() == 0)
    assert(Shingles.wordNGramsPos(docs, 2).filter($"doc_id" === 1L).count() == 0)
    assert(Shingles.wordNGramsPosKeyed(docs, 2)
      .filter($"doc_id" === 1L).count() == 0)
    // the non-null doc is unaffected
    assert(Shingles.wordNGrams(docs, 2).filter($"doc_id" === 2L).count() == 2)
  }
}
