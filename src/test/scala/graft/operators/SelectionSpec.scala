package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the two data-selection queries — t30 DSIR importance
  * weighting and s14 cluster-balanced sampling. The oracle gate proves
  * cross-engine equality; these pin that the SELECTION ITSELF does what
  * the method promises (target-like docs score up, head clusters cap).
  */
class SelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("t30: target-vocabulary docs weigh positive, off-target negative, " +
    "gramless docs keep=0") {
    val target = (0 until 10).map(i =>
      (i.toLong, ("alpha beta " * 20).trim, "en", "srcA"))
    val off = (10 until 20).map(i =>
      (i.toLong, ("gamma delta " * 20).trim, "fr", "srcB"))
    val probe = Seq(
      (20L, ("alpha beta " * 20).trim, "fr", "srcB"), // target-like content
      (21L, "solo", "fr", "srcB"))                    // single token: no grams
    val docs = (target ++ off ++ probe)
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("t30").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.queries("t30_dsir_importance")(spark, dir)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.size == 22)
    // the fr doc written in the target's vocabulary is selected...
    assert(got(20L)._2 > 0 && got(20L)._3 == 1, s"probe: ${got(20L)}")
    // ...while every doc of the off-target vocabulary scores negative
    (10L until 20L).foreach(i =>
      assert(got(i)._2 < 0 && got(i)._3 == 0, s"off $i: ${got(i)}"))
    // a doc too short to produce a bigram is never selected
    assert(got(21L) == ((0L, 0L, 0)), s"gramless: ${got(21L)}")
  }

  test("t30: dsirWeights matches an independent scalar reimplementation " +
    "on random corpora") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bits(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    (0 until 3).foreach { trial =>
      val docs = (0 until 40).map { i =>
        val n = 1 + rnd.nextInt(12)
        (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
          if (rnd.nextBoolean()) "en" else "fr", "s")
      }
      // scalar reference: the DSIR weight computed with plain collections
      val grams = docs.flatMap { case (id, text, lang, _) =>
        val ws = text.split(" ", -1)
        ws.indices.dropRight(1).map(j =>
          (id, lang, md5hex(s"${ws(j)} ${ws(j + 1)}").take(2)))
      }
      val p = grams.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val q = grams.filter(_._2 != "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val (np, nq) = (p.values.sum, q.values.sum)
      val expect = docs.map { case (id, text, lang, _) =>
        val g = grams.filter(_._1 == id)
        val w = g.map { case (_, _, b) =>
          bits(p.getOrElse(b, 0L) + 1) - bits(q.getOrElse(b, 0L) + 1) +
            bits(nq + 256) - bits(np + 256)
        }.sum.toLong
        id -> ((g.size.toLong, w))
      }.toMap
      val dir = java.nio.file.Files.createTempDirectory(s"t30f$trial").toString
      import org.apache.spark.sql.functions.length
      docs.toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length($"text").cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = TextOps.dsirWeights(
          spark.read.parquet(s"$dir/documents.parquet"), "en")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expect, s"trial $trial")
    }
  }

  test("t36: iterated BPE training reproduces the classic hand example") {
    // Sennrich et al.'s corpus {low:5, lower:2, newest:6, widest:3}: the
    // hand-derivable 8-merge ladder, including both tie-break sites
    // (lo-vs-ow at 7, and e w < n e < w est at 6) and a RUN-adjacent merge
    // (es then est inside the same words).
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text, "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextOps.bpeTrain(docs, 8)
    val expected = Seq(
      (1, "e s", 9L), (2, "es t", 9L), (3, "l o", 7L), (4, "lo w", 7L),
      (5, "e w", 6L), (6, "ew est", 6L), (7, "n ewest", 6L), (8, "d est", 3L))
    assert(got == expected, got.toString)
    // the doubled-space encoding handles runs: merging (a, a) inside
    // "aaaa" must yield [aa, aa], not [aa, a, a] — greedy left-to-right.
    // After merge 1 the pair 'aa a' occurs ONCE (in "aaa" only); the buggy
    // [aa, a, a] split would count it twice and also leave an 'a a'.
    val runDocs = Seq((1L, "aaaa aaa", "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source")
    val run = TextOps.bpeTrain(runDocs, 2)
    assert(run == Seq((1, "a a", 5L), (2, "aa a", 1L)), run.toString)
    // t37 apply on the same corpus: the learned merges encode low/newest
    // to single tokens while lower/widest keep their unmerged residue
    val enc = TextOps.queries("t37_bpe_encode")(spark, {
      val dir = java.nio.file.Files.createTempDirectory("t37").toString
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }).as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(enc("low") == ((5L, 1L)) && enc("newest") == ((6L, 1L)), enc.toString)
    assert(enc("lower") == ((2L, 3L)) && enc("widest") == ((3L, 3L)), enc.toString)
  }

  test("t38: packSegments matches a sequential walk of the token stream") {
    // Brute-force reference: per source, lay docs end-to-end in doc_id
    // order, cut at every seqLen boundary, close the final partial row
    // with a PAD segment — the definitionally-sequential recurrence the
    // window/cumsum plan must reproduce exactly. The crafted frame hits
    // every edge: a doc exactly seqLen long (doc_start AND doc_end, full
    // row), a doc spanning 3 rows, an empty-ish 1-token doc, a source
    // whose total is an exact multiple of seqLen (NO pad row), and one
    // that isn't (pad row).
    val seqLen = 10L
    val perDoc = Seq(
      ("A", 1L, 4L), ("A", 2L, 10L), ("A", 3L, 23L), ("A", 4L, 1L),
      ("A", 5L, 2L),                                   // A total 40 = 4*10
      ("B", 1L, 7L), ("B", 2L, 10L), ("B", 3L, 6L))    // B total 23 -> pad 7
    def brute(rows: Seq[(String, Long, Long)]) = rows.groupBy(_._1).toSeq
      .flatMap { case (src, ds) =>
        var cur = 0L
        val out = ds.sortBy(_._2).flatMap { case (_, id, n) =>
          val (s0, e0) = (cur, cur + n); cur = e0
          (s0 / seqLen to (e0 - 1) / seqLen).map { seq =>
            val lo = math.max(s0, seq * seqLen)
            val hi = math.min(e0, (seq + 1) * seqLen)
            (src, seq, id, lo - seq * seqLen, hi - lo, 1,
              if (s0 >= seq * seqLen) 1 else 0,
              if (e0 <= (seq + 1) * seqLen) 1 else 0)
          }
        }
        if (cur % seqLen == 0) out
        else out :+ (src, (cur - 1) / seqLen, -1L, cur % seqLen,
          seqLen - cur % seqLen, 0, 0, 0)
      }.toSet
    val got = TextOps.packSegments(
        perDoc.toDF("source", "doc_id", "n_tok"), seqLen)
      .as[(String, Long, Long, Long, Long, Int, Int, Int)].collect().toSet
    assert(got == brute(perDoc), got.toString)
    // invariants every training consumer relies on: each (source, seq)
    // row's segments tile [0, seqLen) exactly, and each doc's segments
    // reassemble its full token count
    val bySeq = got.groupBy(r => (r._1, r._2))
    bySeq.foreach { case (k, segs) =>
      assert(segs.toSeq.map(_._5).sum == seqLen, s"row $k not full")
      val sorted = segs.toSeq.sortBy(_._4)
      assert(sorted.head._4 == 0 && sorted.sliding(2).forall {
        case Seq(a, b) => a._4 + a._5 == b._4; case _ => true
      }, s"row $k has gaps/overlap")
    }
    perDoc.foreach { case (src, id, n) =>
      assert(got.toSeq.filter(r => r._1 == src && r._3 == id).map(_._5).sum == n,
        s"doc $src/$id token count not conserved")
    }
  }

  test("s13: the JL sign projection preserves similarity structure") {
    // the sketch must be USEFUL, not just engine-exact: for planted
    // near-duplicate pairs the 16-dim sketch dot product has to rank the
    // true neighbor above unrelated vectors. Build 20 random int8 vectors
    // plus a tiny perturbation of each; project with the SAME md5(j:d)
    // sign matrix the query uses; assert each original's top sketch-space
    // match among all others is its own perturbed twin.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sgn = Array.tabulate(16, 64)((j, d0) =>
      if ((md5hex(s"$j:${d0 + 1}").charAt(0).toInt) % 2 == 0) 1 else -1)
    val rnd = new scala.util.Random(13)
    val base = Array.fill(20)(Array.fill(64)(rnd.nextInt(255) - 127))
    val twin = base.map(_.map(x => math.max(-127, math.min(127, x + rnd.nextInt(3) - 1))))
    def proj(v: Array[Int]): Array[Long] =
      Array.tabulate(16)(j => (0 until 64).map(d => sgn(j)(d).toLong * v(d)).sum)
    val all = (base ++ twin).map(proj)
    (0 until 20).foreach { i =>
      val best = (0 until 40).filter(_ != i)
        .maxBy(k => (0 until 16).map(j => all(i)(j) * all(k)(j)).sum)
      assert(best == i + 20, s"vector $i's nearest sketch match is $best, " +
        s"expected its twin ${i + 20}")
    }
  }

  test("s14: head cells downsample to the cap, tail cells survive whole") {
    // two well-separated clusters on axes 0/1; seeds are vec_id 0 and 1
    // (the fixed vec_id < 32 quantizer), members sit past the seed range
    def axisVec(axis: Int, wobble: Float): Array[Float] = {
      val v = Array.fill(4)(0f); v(axis) = 1f; v(3) = wobble; v
    }
    val head = (0 until 11).map(i =>
      (if (i == 0) 0L else 99L + i, axisVec(0, 0.01f * i), 0))
    val tail = (0 until 4).map(i =>
      (if (i == 0) 1L else 199L + i, axisVec(1, 0.01f * i), 1))
    val dir = java.nio.file.Files.createTempDirectory("s14").toString
    (head ++ tail).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def run() = Similarity.queries("s14_cluster_sample")(spark, dir)
      .as[(Long, Long, Long, Int)].collect().toSet
    val got = run()
    val byCell = got.groupBy(_._1)
    // head cluster (cell 0, 11 members) capped at 4; tail (cell 1, 4
    // members) kept whole — and every row reports its true cell size
    assert(byCell(0L).size == 4 && byCell(0L).forall(_._2 == 11L))
    assert(byCell(1L).size == 4 && byCell(1L).forall(_._2 == 4L))
    assert(byCell(1L).map(_._3) == tail.map(_._1).toSet)
    assert(got.forall(r => r._4 >= 1 && r._4 <= 4))
    assert(run() == got, "md5-ordered sampling must be deterministic")
  }
}
