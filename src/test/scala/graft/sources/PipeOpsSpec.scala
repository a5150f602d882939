package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PipeOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pipePartitions streams records through a subprocess") {
    import spark.implicits._
    val in = Seq("ACGT", "TTAA", "GGCC").toDS().repartition(2)
    val out = PipeOps.pipePartitions(in, Seq("tr", "ACGT", "TGCA"))
      .collect().sorted.toSeq
    assert(out == Seq("AATT", "CCGG", "TGCA")) // complement, not reversed
  }

  test("a failing subprocess fails the task instead of truncating silently") {
    import spark.implicits._
    val in = Seq("a", "b", "c").toDS().repartition(1)
    val ex = intercept[org.apache.spark.SparkException] {
      PipeOps.pipePartitions(in, Seq("false")).collect()
    }
    assert(ex.getMessage.contains("exited with") ||
      Option(ex.getCause).exists(_.getMessage.contains("exited with")))
  }

  test("availability probe distinguishes present and missing binaries") {
    assert(PipeOps.available("cat"))
    assert(!PipeOps.available("definitely-not-a-real-binary-xyz"))
  }
}
