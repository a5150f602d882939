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
