package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import graft.TestSpark

class KmerExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("interpreted eval matches reference semantics") {
    def u(s: String) = Literal(UTF8String.fromString(s), org.apache.spark.sql.types.StringType)
    assert(CanonicalKmer(u("TTT")).eval() == UTF8String.fromString("AAA"))
    assert(CanonicalKmer(u("ACG")).eval() == UTF8String.fromString("ACG"))
    assert(ReverseComplement(u("ACGT")).eval() == UTF8String.fromString("ACGT"))
    assert(ReverseComplement(u("AAC")).eval() == UTF8String.fromString("GTT"))
    assert(CanonicalKmer(u("ACGN")).eval() == UTF8String.fromString(""))
    assert(KmerPack(u("ACGT")).eval() == 0x1bL)
    assert(KmerUnpack(Literal(0x1bL), Literal(4)).eval() == UTF8String.fromString("ACGT"))
    assert(KmerPack(u("A" * 32)).eval() == -1L)
    // canon_pack == kmer_pack(canonical_kmer(s)), incl. sentinels
    assert(CanonPack(u("TTT")).eval() == KmerPack(u("AAA")).eval())
    assert(CanonPack(u("ACG")).eval() == KmerPack(u("ACG")).eval())
    assert(CanonPack(u("ACGN")).eval() == -1L)
    assert(CanonPack(u("A" * 32)).eval() == -1L)
    val rnd = new scala.util.Random(9)
    (1 to 200).foreach { _ =>
      val s = Array.fill(rnd.nextInt(31) + 1)("ACGT"(rnd.nextInt(4))).mkString
      assert(CanonPack(u(s)).eval() ==
        KmerPack(Literal(CanonicalKmer(u(s)).eval(),
          org.apache.spark.sql.types.StringType)).eval(), s)
    }
    // soft-masked (lowercase) and mixed-case input must match the composed
    // form too: canonical_kmer compares the RAW string against its
    // uppercase revcomp (no case folding), so canon_pack may not shortcut
    // through the case-folding packer there
    (1 to 200).foreach { _ =>
      val s = Array.fill(rnd.nextInt(31) + 1)("ACGTacgt"(rnd.nextInt(8))).mkString
      assert(CanonPack(u(s)).eval() ==
        KmerPack(Literal(CanonicalKmer(u(s)).eval(),
          org.apache.spark.sql.types.StringType)).eval(), s)
    }
  }

  test("registered SQL functions run inside WholeStageCodegen") {
    GraftFunctions.register(spark)
    // spark.range keeps a real executable plan (a local Seq would be
    // constant-folded into a LocalTableScan before execution)
    val df = spark.range(64)
      .selectExpr("kmer_unpack(id, 10) AS s")
      .selectExpr("canonical_kmer(s) AS c", "revcomp(s) AS r",
        "kmer_unpack(kmer_pack(s), 10) AS roundtrip", "s")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    rows.foreach { case (c, r, rt, s) =>
      val rc = s.reverse.map { case 'A' => 'T'; case 'C' => 'G'; case 'G' => 'C'; case 'T' => 'A' }
      assert(c == Seq(s, rc).min)
      assert(r == rc)
      assert(rt == s)
    }
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen'd project in:\n$plan")
  }

  test("minimizer kernels == declarative HOF chain (fuzz incl. short + non-ACGT)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val r = new scala.util.Random(77)
    // lengths straddle the k+w-1 window threshold; 'N' exercises the
    // translate()-leaves-unknown-chars-alone path the HOF form has
    val strs = (1 to 60).map { i =>
      val n = r.nextInt(40) + 5
      val alpha = if (i % 5 == 0) "ACGTN" else "ACGT"
      Array.fill(n)(alpha(r.nextInt(alpha.length))).mkString
    }
    for ((k, w) <- Seq((11, 4), (11, 8), (5, 3))) {
      val df = strs.toDF("s").select(
        org.apache.spark.sql.functions.expr(s"minimizer_md5(s, $k, $w)").as("native"),
        org.apache.spark.sql.functions.expr(
          s"""CASE WHEN length(s) >= ${k + w - 1} THEN array_distinct(
             |transform(sequence(1, length(s) - ${k + w - 2}), j -> array_min(slice(
             |transform(sequence(1, length(s) - ${k - 1}), i -> md5(least(substring(s, i, $k),
             |reverse(translate(substring(s, i, $k), 'ACGT', 'TGCA'))))), j, $w))))
             |ELSE array() END""".stripMargin.replace("\n", " ")).as("hof"),
        org.apache.spark.sql.functions.expr(s"minimizer_windows(s, $k, $w)").as("nativeW"),
        org.apache.spark.sql.functions.expr(
          s"""CASE WHEN length(s) >= ${k + w - 1} THEN
             |transform(sequence(1, length(s) - ${k + w - 2}), j -> array_min(slice(
             |transform(transform(sequence(1, length(s) - ${k - 1}),
             |i -> least(substring(s, i, $k),
             |reverse(translate(substring(s, i, $k), 'ACGT', 'TGCA')))),
             |km -> named_struct('mh', md5(km), 'km', km)), j, $w)).km)
             |ELSE array() END""".stripMargin.replace("\n", " ")).as("hofW"))
      df.collect().foreach { row =>
        assert(row.getSeq[String](0) == row.getSeq[String](1), s"minimizer_md5 k=$k w=$w")
        assert(row.getSeq[String](2) == row.getSeq[String](3), s"minimizer_windows k=$k w=$w")
      }
    }
  }

  test("canon_pack_at / canon_pack_sub == composed substring forms (fuzz)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val r = new scala.util.Random(131)
    // mixed alphabets (incl. lowercase + N) and window/patch positions
    // both inside and past the end — every row must equal the composed
    // canon_pack(substring(...)) / patched-concat form
    val rows = (1 to 400).map { i =>
      val n = r.nextInt(40) + 1
      val alpha = i % 7 match {
        case 0 => "ACGTN"; case 1 => "ACGTacgt"; case _ => "ACGT"
      }
      val s = Array.fill(n)(alpha(r.nextInt(alpha.length))).mkString
      val k = r.nextInt(33) + 1           // 1..33 (beyond the 31 contract too)
      val i0 = r.nextInt(n + 4) + 1       // window start, may run past end
      val p = r.nextInt(n + 3) + 1        // patch pos, may run past end
      val b = "ACGT"(r.nextInt(4)).toString
      (s, i0, k, p, b)
    }
    val df = rows.toDF("s", "i", "k", "p", "b").selectExpr(
      "canon_pack_at(s, i, k)", "canon_pack(substring(s, i, k))",
      "canon_pack_sub(s, i, k, p, b)",
      "canon_pack(substring(concat(substr(s, 1, p-1), b, substr(s, p+1, length(s)-p)), i, k))")
    df.collect().foreach { row =>
      assert(row.getLong(0) == row.getLong(1), s"canon_pack_at mismatch: $row")
      assert(row.getLong(2) == row.getLong(3), s"canon_pack_sub mismatch: $row")
    }
  }

  test("KmerAlgebra optimizer rule collapses canonical(revcomp(x))") {
    GraftFunctions.register(spark)
    val df = spark.range(16)
      .selectExpr("kmer_unpack(id, 8) AS s")
      .selectExpr("canonical_kmer(revcomp(s)) AS c1",
        "canonical_kmer(canonical_kmer(s)) AS c2",
        "canonical_kmer(s) AS c0")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("revcomp"), s"revcomp should be rewritten away:\n$opt")
    assert("canonical_kmer".r.findAllIn(opt).size == 3, s"idempotence not applied:\n$opt")
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(2) && r.getString(1) == r.getString(2))
    }
  }
}
