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
      .drop("split")
      .as[(Long, Int, Int, Int, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._9))).toMap
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

  test("semantic stage drops embedding-identical docs, spares unembedded ones") {
    import spark.implicits._
    // three TEXTUALLY unrelated docs (no shared shingles — the MinHash
    // stage must not fire); 10 and 11 share an embedding, 12 has none —
    // only 11 (the larger id of the identical pair) may drop
    val docs = Seq(
      10L -> "the quick brown fox jumps over a lazy dog of the north every winter",
      11L -> "a steel bridge spans the wide river carrying trains of coal at dawn",
      12L -> "bright comets streak across a silent sky while the observatory dome turns")
    val test = Seq(100L -> "held out benchmark totally different words here")
    val emb = Seq(
      (10L, Array(1.0, 0.0, 0.0)),
      (11L, Array(1.0, 0.0, 0.0))).toDF("doc_id", "v")
    val f = Curation.curate(docs.toDF("doc_id", "text"), test.toDF("doc_id", "text"),
        Some(emb), semCentroids = 2)
      .drop("split")
      .as[(Long, Int, Int, Int, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._6, r._9))).toMap
    assert(f(10L) == ((1, 1)), f(10L)) // identical pair: min id kept
    assert(f(11L) == ((0, 0)), f(11L)) // identical pair: larger id dropped
    assert(f(12L) == ((1, 1)), f(12L)) // no embedding: passes trivially
  }

  test("dsir stage keeps target-vocabulary docs, drops off-target ones") {
    import spark.implicits._
    // target (en) docs speak alpha/beta; off-target (fr) speak gamma/delta;
    // doc 20 is an fr doc written in the TARGET's vocabulary — DSIR must
    // select it on content, not its lang label. Unique suffix words keep
    // the exact/near-dup stages out of the way.
    def mk(i: Long, core: String, lang: String) =
      (i, s"$core the of and in to unique$i tail$i pad$i", lang)
    val docs = ((0L until 6L).map(i => mk(i, ("alpha beta " * 10).trim, "en")) ++
      (6L until 12L).map(i => mk(i, ("gamma delta " * 10).trim, "fr")) :+
      mk(20L, ("alpha beta " * 10).trim, "fr"))
      .toDF("doc_id", "text", "lang")
    val test = Seq(100L -> "held out benchmark totally different words here")
      .toDF("doc_id", "text")
    val f = Curation.curate(docs, test, dsirTargetLang = Some("en"))
      .drop("split")
      .as[(Long, Int, Int, Int, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r._8).toMap
    (0L until 6L).foreach(i => assert(f(i) == 1, s"target doc $i"))
    (6L until 12L).foreach(i => assert(f(i) == 0, s"off-target doc $i"))
    assert(f(20L) == 1, "target-vocabulary fr doc must be selected")
  }
}
