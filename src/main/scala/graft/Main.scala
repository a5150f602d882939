package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Assembler, Genomics, Pipelines}
import graft.sources.Fastq

/** CLI surface mirroring the reference's subcommands (`bin/reflexiv`):
  *
  * {{{
  * runMain graft.Main counter -fastq <glob> -kmer 31 -cover 2 -outfile <dir>
  * runMain graft.Main run     -fastq <glob> -kmer 31 -cover 2 -outfile <dir>
  * runMain graft.Main meta    -fastq <glob> -klist 21,31,41 -outfile <dir>
  * }}}
  *
  * `counter` writes a `(kmer,count)` table; `run` writes contig FASTA;
  * `meta` runs the staged dynamic-k pipeline with `_SUCCESS` resume under
  * `<outfile>/stages` and writes the final FASTA.
  */
object Main {
  private def opt(args: Array[String], name: String, dflt: String): String =
    args.sliding(2).collectFirst { case Array(`name`, v) => v }.getOrElse(dflt)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Main <counter|run|meta> [options]")
    val cmd = args.head
    val fastq = opt(args, "-fastq", "/root/reference/example/*.fq.gz")
    val out = opt(args, "-outfile", "/root/repo/target/graft_cli_out")
    val k = opt(args, "-kmer", "31").toInt
    val minCov = opt(args, "-cover", "2").toInt
    val minContig = opt(args, "-mincontig", (2 * k).toString).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Input selection: paired two-file mode (-fastq2, the reference's
    // `-fastq -paired` default), else single-file with the heuristic
    // sequence-line filter P2 (no indexing pass — the scale default);
    // -exact-fastq forces the exact 4-line parser P1.
    val fastq2 = opt(args, "-fastq2", "")
    val rawReads =
      if (fastq2.nonEmpty)
        Fastq.interleavePairs(Fastq.readPairedFastq(spark, fastq, fastq2))
      else if (args.contains("-exact-fastq")) Fastq.fastqSequences(spark, fastq)
      else Fastq.fastqSequencesHeuristic(spark, fastq)
    val reads = Fastq.guardReads(rawReads, minLen = k)
    cmd match {
      case "counter" =>
        val counts = Genomics.decodeCounts(
          Genomics.countCanonical(reads, k)
            .filter(col("count") >= minCov), k)
        Fastq.writeCsv(counts, s"$out/Count_$k")
        println(s"[graft] counter: wrote $out/Count_$k")
      case "run" =>
        val contigs = Assembler.assemble(
          Genomics.countCanonical(reads, k), k,
          minCov = minCov, minContig = minContig).toDF("contig")
        Fastq.writeFasta(contigs, s"$out/Assembly")
        println(s"[graft] run: wrote $out/Assembly")
      case "meta" =>
        val kList = opt(args, "-klist", "21,31,41").split(",").map(_.trim.toInt).toSeq
        val contigs = Pipelines.dynamicAssembly(
          spark, reads, kList, s"$out/stages", minCov = 1, minContig = minContig)
        Fastq.writeFasta(contigs.toDF("contig"), s"$out/Assembly", seqCol = "contig")
        println(s"[graft] meta: wrote $out/Assembly (stages under $out/stages)")
      case other =>
        sys.error(s"unknown subcommand '$other' (counter|run|meta)")
    }
    spark.stop()
  }
}
