package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.SamConsensus
import org.apache.spark.sql.functions._

/** E3 orchestration end-to-end with a fake aligner subprocess (the f4
  * pattern): a minimal exact-match aligner script stands in for minimap2 —
  * it loads `{ref}` (the driver-built, SparkFiles-shipped contig FASTA),
  * reads FASTQ from stdin, anchors each read by exact 20-mer prefix or
  * suffix match and emits SAM with edge soft-clips. The pipe + SAM parse +
  * consensus chain must then grow the contig by the reads' overhang. */
class AlignerPipeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val fakeAligner: String =
    """#!/usr/bin/env python3
      |import sys
      |refs, name = {}, None
      |for line in open(sys.argv[1]):
      |    line = line.strip()
      |    if line.startswith('>'):
      |        name = line[1:].split()[0]; refs[name] = []
      |    elif name is not None:
      |        refs[name].append(line)
      |refs = {n: ''.join(p) for n, p in refs.items()}
      |lines = sys.stdin.read().splitlines()
      |for i in range(0, len(lines) - 3, 4):
      |    read = lines[i + 1].strip()
      |    placed = False
      |    for n, ref in refs.items():
      |        j = ref.find(read[:20])
      |        if j >= 0:
      |            m = 0
      |            while m < len(read) and j + m < len(ref) and read[m] == ref[j + m]:
      |                m += 1
      |            cig = '%dM' % m + ('%dS' % (len(read) - m) if m < len(read) else '')
      |            print('r%d\t0\t%s\t%d\t60\t%s\t*\t0\t0\t%s\t*' % (i, n, j + 1, cig, read))
      |            placed = True
      |            break
      |        j = ref.find(read[-20:])
      |        if j >= 0:
      |            m = 20
      |            while m < len(read) and j + 20 - m - 1 >= 0 and read[-(m + 1)] == ref[j + 19 - m]:
      |                m += 1
      |            cig = ('%dS' % (len(read) - m) if m < len(read) else '') + '%dM' % m
      |            print('r%d\t0\t%s\t%d\t60\t%s\t*\t0\t0\t%s\t*' % (i, n, j + 20 - m + 1, cig, read))
      |            placed = True
      |            break
      |    if not placed:
      |        print('r%d\t4\t*\t0\t0\t*\t*\t0\t0\t%s\t*' % (i, read))
      |""".stripMargin

  private def randGenome(n: Int, seed: Long): String = {
    val r = new scala.util.Random(seed)
    Array.fill(n)("ACGT"(r.nextInt(4))).mkString
  }

  test("aligner pipe: driver-built ref + FASTQ pipe + consensus extends both edges") {
    assume(PipeOps.available("python3"), "python3 not on PATH")
    import spark.implicits._
    val script = java.nio.file.Files.createTempDirectory("fake_aligner")
      .resolve("fake_aligner.py")
    java.nio.file.Files.write(script, fakeAligner.getBytes("UTF-8"))

    val genome = randGenome(300, seed = 97)
    val contig = genome.substring(60, 240)
    val contigs = Seq(("c1", contig)).toDF("id", "seq")
    // forward tiling reads over the WHOLE genome: the ones that straddle a
    // contig edge carry the extension evidence as soft-clipped overhangs
    val reads = (0 to 240 by 10).map(i => genome.substring(i, i + 60)).toDS()

    val sam = AlignerPipe.alignReads(contigs, reads,
      Seq("python3", script.toString, "{ref}"))
    val ext = SamConsensus.extendContigs(contigs, sam, minDepth = 2)
      .select("extended").as[String].collect()

    // depth>=2 consensus runs: left offsets 1..30 (reads at 20/30/40/50
    // vote 1..40/1..30/1..20/1..10), right offsets 1..30 (reads at
    // 190/200/210/220 symmetric) -> genome[30..270)
    assert(ext.toSeq == Seq(genome.substring(30, 270)))
  }

  test("unmapped and header lines are dropped by the SAM parse") {
    assume(PipeOps.available("python3"), "python3 not on PATH")
    import spark.implicits._
    val script = java.nio.file.Files.createTempDirectory("fake_aligner")
      .resolve("fake_aligner.py")
    java.nio.file.Files.write(script, fakeAligner.getBytes("UTF-8"))
    val contigs = Seq(("c1", randGenome(100, seed = 101))).toDF("id", "seq")
    // reads unrelated to the contig -> all unmapped -> zero SAM rows
    val reads = Seq.fill(5)(randGenome(60, seed = 103)).toDS()
    val sam = AlignerPipe.alignReads(contigs, reads,
      Seq("python3", script.toString, "{ref}"))
    assert(sam.count() == 0)
    val ext = SamConsensus.extendContigs(contigs, sam, minDepth = 2)
    // no votes: the contig comes back unextended
    assert(ext.select(col("extended")).as[String].collect()
      .toSeq == contigs.select(col("seq")).as[String].collect().toSeq)
  }
}
