package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Assembler, Genomics}
import graft.sources.Fastq

/** Golden-value regression over the reference repo's bundled example
  * reads — the only real dataset the reference ships. Values were
  * established by the first clean end-to-end run and pin the whole
  * FASTQ -> count -> assemble path. */
class DomainRunSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("reference example FASTQ assembles to the golden single contig") {
    val reads = Fastq.guardReads(
      Fastq.fastqSequences(spark, "/root/reference/example/*.fq.gz"), minLen = 31)
    assert(reads.count() == 2300)
    val counts = Genomics.countCanonical(reads, 31).localCheckpoint()
    assert(counts.count() == 43748)
    val contigs = Assembler.assemble(counts, 31, minCov = 2, maxIter = 150,
      minContig = 62).collect()
    assert(contigs.length == 1)
    assert(contigs.head.length == 4575)
  }
}
