package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Each curation verdict must fire for exactly the right reason. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def flags(docs: Seq[(Long, String)], test: Seq[(Long, String)])
      : Map[Long, (Int, Int, Int, Int, Int)] = {
    import spark.implicits._
    Curation.curate(docs.toDF("doc_id", "text"), test.toDF("doc_id", "text"))
      .as[(Long, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
  }

  test("exact dup, near dup, low quality, and contaminated docs are each flagged") {
    val good = "the quick brown fox jumps over a lazy dog of the north in winter time"
    val nearA = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda the mu nu xi omicron pi rho sigma tau"
    val nearB = nearA.split(" ").dropRight(1).mkString(" ") // near-dup of nearA
    val benchGram = "held out benchmark five gram"
    val docs = Seq(
      1L -> good,                                  // survives everything
      2L -> good,                                  // exact dup of 1
      3L -> nearA,                                 // near-dup cluster min: kept
      4L -> nearB,                                 // near-dup loser: dropped
      5L -> "too short",                           // quality: < 10 tokens
      6L -> s"a clean doc of the corpus with $benchGram inside it here") // contaminated
    val test = Seq(100L -> s"some benchmark text with $benchGram and more words")
    val f = flags(docs, test)
    assert(f(1L) == ((1, 1, 1, 1, 1)), f(1L))
    assert(f(2L)._1 == 0 && f(2L)._5 == 0, f(2L))             // exact dup dropped
    assert(f(3L)._2 == 1, f(3L))                              // cluster min kept
    assert(f(4L)._2 == 0 && f(4L)._5 == 0, f(4L))             // near-dup dropped
    assert(f(5L)._3 == 0 && f(5L)._5 == 0, f(5L))             // quality fail
    assert(f(6L)._4 == 0 && f(6L)._5 == 0, f(6L))             // contaminated
  }
}
