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

  /** Adversarial aligner #2 — realistic SAM variation minimap2 actually
    * emits, which the consensus must be INVARIANT to where SAM semantics
    * say so:
    *  - `@HD`/`@SQ`/`@PG` header lines;
    *  - REVERSE-STRAND alignments (flag 16): the read arrives as the
    *    reverse complement of a genome window; SEQ/CIGAR are emitted in
    *    reference orientation per the SAM spec, so the votes must be
    *    identical to the forward read's;
    *  - SECONDARY (256) and SUPPLEMENTARY (2048) records carrying
    *    deterministic POISON evidence (all-A / all-T overhangs at the
    *    contig edges) — if the parse let them vote, the consensus would
    *    visibly change, so equality proves the filter;
    *  - placed-UNMAPPED records (flag 4 WITH a contig name + poison
    *    CIGAR) — droppable only by the FLAG, not the '*' checks;
    *  - optional tags (NM/AS columns >= 12) the positional parse ignores.
    */
  private val adversarialAligner: String =
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
      |def rc(s):
      |    return s[::-1].translate(str.maketrans('ACGT', 'TGCA'))
      |print('@HD\tVN:1.6\tSO:unsorted')
      |for n, ref in refs.items():
      |    print('@SQ\tSN:%s\tLN:%d' % (n, len(ref)))
      |print('@PG\tID:fake2\tPN:fake2')
      |def anchor(read, ref):
      |    j = ref.find(read[:20])
      |    if j >= 0:
      |        m = 0
      |        while m < len(read) and j + m < len(ref) and read[m] == ref[j + m]:
      |            m += 1
      |        cig = '%dM' % m + ('%dS' % (len(read) - m) if m < len(read) else '')
      |        return j + 1, cig
      |    j = ref.find(read[-20:])
      |    if j >= 0:
      |        m = 20
      |        while m < len(read) and j + 20 - m - 1 >= 0 and read[-(m + 1)] == ref[j + 19 - m]:
      |            m += 1
      |        cig = ('%dS' % (len(read) - m) if m < len(read) else '') + '%dM' % m
      |        return j + 20 - m + 1, cig
      |    return None
      |lines = sys.stdin.read().splitlines()
      |for i in range(0, len(lines) - 3, 4):
      |    read = lines[i + 1].strip()
      |    placed = False
      |    for n, ref in refs.items():
      |        hit = anchor(read, ref)
      |        if hit:  # forward: emit with tags the parser must ignore
      |            print('r%d\t0\t%s\t%d\t60\t%s\t*\t0\t0\t%s\t*\tNM:i:0\tAS:i:60' % (i, n, hit[0], hit[1], read))
      |            placed = True
      |        else:
      |            r = rc(read)
      |            hit = anchor(r, ref)
      |            if hit:  # reverse strand: SEQ/CIGAR in REFERENCE orientation
      |                print('r%d\t16\t%s\t%d\t60\t%s\t*\t0\t0\t%s\t*\tNM:i:0' % (i, n, hit[0], hit[1], r))
      |                placed = True
      |        if placed:
      |            # poison SECONDARY: all-A left overhang at the contig start
      |            print('r%d\t256\t%s\t1\t0\t30S30M\t*\t0\t0\t%s\t*' % (i, n, 'A' * 60))
      |            # poison SUPPLEMENTARY: all-T right overhang at the contig end
      |            print('r%d\t2048\t%s\t%d\t0\t30M30S\t*\t0\t0\t%s\t*' % (i, n, len(ref) - 29, 'T' * 60))
      |            # placed-UNMAPPED (flag 4 with a contig name): all-G poison
      |            print('r%d\t4\t%s\t1\t0\t30S30M\t*\t0\t0\t%s\t*' % (i, n, 'G' * 60))
      |            break
      |    if not placed:
      |        print('r%d\t4\t*\t0\t0\t*\t*\t0\t0\t%s\t*' % (i, read))
      |""".stripMargin

  test("adversarial aligner: strand/secondary/supplementary/tags leave the consensus invariant") {
    assume(PipeOps.available("python3"), "python3 not on PATH")
    import spark.implicits._
    def write(body: String, name: String): String = {
      val p = java.nio.file.Files.createTempDirectory("fake_aligner").resolve(name)
      java.nio.file.Files.write(p, body.getBytes("UTF-8"))
      p.toString
    }
    val s1 = write(fakeAligner, "fake_aligner.py")
    val s2 = write(adversarialAligner, "fake_aligner2.py")

    val genome = randGenome(300, seed = 97)
    val contig = genome.substring(60, 240)
    val contigs = Seq(("c1", contig)).toDF("id", "seq")
    val fwd = (0 to 240 by 10).map(i => genome.substring(i, i + 60))
    def rc(s: String): String =
      s.reverse.map { case 'A' => 'T'; case 'C' => 'G'; case 'G' => 'C'; case 'T' => 'A' }
    // every second read arrives REVERSE-COMPLEMENTED — aligner #2 places
    // it on the reverse strand (flag 16, reference-orientation SEQ/CIGAR)
    val mixed = fwd.zipWithIndex.map { case (r, i) => if (i % 2 == 1) rc(r) else r }

    val sam1 = AlignerPipe.alignReads(contigs, fwd.toDS(),
      Seq("python3", s1, "{ref}"))
    val sam2 = AlignerPipe.alignReads(contigs, mixed.toDS(),
      Seq("python3", s2, "{ref}"))
    // headers, tags, poison secondaries/supplementaries, placed-unmapped:
    // all dropped — what remains is one primary row per placed read, and
    // reverse-strand rows carry the SAME reference-orientation evidence
    assert(sam2.count() == sam1.count(), "flag filtering lost or kept the wrong rows")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.selectExpr("concat_ws('|', contig, pos, cigar, seq)")
        .as[String].collect().sorted.toSeq
    assert(canon(sam2) == canon(sam1),
      "reverse-strand rows did not normalize to reference orientation")
    val e1 = SamConsensus.extendContigs(contigs, sam1, minDepth = 2)
      .select("extended").as[String].collect().toSeq
    val e2 = SamConsensus.extendContigs(contigs, sam2, minDepth = 2)
      .select("extended").as[String].collect().toSeq
    assert(e2 == e1 && e1 == Seq(genome.substring(30, 270)),
      "consensus is not invariant under adversarial SAM variation")
  }

  test("unfiltered poison WOULD corrupt the consensus (the filter is load-bearing)") {
    // negative control: feed the poison secondary rows directly into the
    // consensus (bypassing the flag filter) — the result must DIFFER,
    // proving the invariance above is the filter's doing, not luck
    import spark.implicits._
    val genome = randGenome(300, seed = 97)
    val contig = genome.substring(60, 240)
    val contigs = Seq(("c1", contig)).toDF("id", "seq")
    val clean = Seq(
      ("c1", 1, "30S30M", "A" * 30 + contig.substring(0, 30)),
      ("c1", 1, "30S30M", "A" * 30 + contig.substring(0, 30)))
      .toDF("contig", "pos", "cigar", "seq")
    val poisoned = clean.unionAll(Seq(
      ("c1", 1, "30S30M", "C" * 60), ("c1", 1, "30S30M", "C" * 60),
      ("c1", 1, "30S30M", "C" * 60)).toDF("contig", "pos", "cigar", "seq"))
    val okExt = SamConsensus.extendContigs(contigs, clean, minDepth = 2)
      .select("extended").as[String].head()
    val badExt = SamConsensus.extendContigs(contigs, poisoned, minDepth = 2)
      .select("extended").as[String].head()
    assert(okExt == "A" * 30 + contig)
    assert(badExt != okExt, "poison votes were supposed to flip the majority")
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
