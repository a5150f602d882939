package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Assembler, Genomics}
import graft.sources.Fastq

/** Domain end-to-end run on real FASTQ (defaults to the reference repo's
  * bundled example reads): parse -> guard -> count canonical 31-mers ->
  * coverage filter (reference defaults minCov=2) -> assemble -> report
  * contig statistics as one JSON line. This is the `reflexiv run`
  * equivalent on the only dataset the reference ships.
  *
  * Usage: runMain graft.DomainRun [fastqGlob] [k] [minCov] [outFasta]
  *        [-preprocess]  (spectrum error correction before assembly)
  */
object DomainRun {
  def main(rawArgs: Array[String]): Unit = {
    val doPre = rawArgs.contains("-preprocess")
    val args = rawArgs.filterNot(_ == "-preprocess")
    val glob = args.headOption.getOrElse("/root/reference/example/*.fq.gz")
    val k = args.lift(1).map(_.toInt).getOrElse(31)
    val minCov = args.lift(2).map(_.toInt).getOrElse(2)
    val outFasta = args.lift(3).filter(p => p.nonEmpty && p != "''")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // "file1,file2" runs the paired-end path (mates paired positionally,
    // then interleaved — the reference's default input mode)
    val rawReads =
      if (glob.contains(",")) {
        val Array(p1, p2) = glob.split(",", 2)
        Fastq.interleavePairs(Fastq.readPairedFastq(spark, p1, p2))
      } else Fastq.fastqSequences(spark, glob)
    val guarded = Fastq.guardReads(rawReads, minLen = k)
    // -preprocess: the E2 stage — correct each read against the set's own
    // k-mer spectrum (k=21 like lighter's default regime) before counting
    val (reads, nCorrected) =
      if (doPre) {
        val withId = guarded.toDF("read")
          .withColumn("read_id", monotonically_increasing_id())
          .select("read_id", "read")
        val corr = operators.ErrorCorrect.correctReads(withId, 21, minCov.toLong)
          .localCheckpoint()
        (corr.select(col("corrected")).as[String],
          corr.agg(sum(col("changed"))).as[Long].head())
      } else (guarded, 0L)
    val (nReads, tRead) = timed(reads.count())
    val counts = Genomics.countCanonical(reads, k).localCheckpoint()
    val (nKmers, tCount) = timed(counts.count())
    val contigs = Assembler.assemble(counts, k, minCov = minCov, maxIter = 150,
      minContig = 2 * k).toDF("contig").localCheckpoint()
    val (stats, tAsm) = timed {
      contigs.agg(
        count(lit(1)).as("n"),
        sum(length(col("contig"))).as("bases"),
        max(length(col("contig"))).as("longest")).as[(Long, Long, Int)].head()
    }
    // N50 without collecting per-contig lengths to the driver: the
    // distinct-length histogram is vocabulary-sized (bounded by the longest
    // contig, not the contig count), so the descending running sum — and
    // its single-partition window — runs over the histogram only. N50 =
    // largest length whose cumulative (desc) base count reaches half.
    val lenHist = contigs.select(length(col("contig")).cast("long").as("len"))
      .groupBy("len").agg(count(lit(1)).as("cnt")).localCheckpoint()
    val totalBases = lenHist.agg(coalesce(sum(col("len") * col("cnt")), lit(0L)))
      .as[Long].head()
    val cumW = org.apache.spark.sql.expressions.Window
      .orderBy(col("len").desc)
      .rowsBetween(Long.MinValue, 0)
    val n50 = lenHist
      .withColumn("cum", sum(col("len") * col("cnt")).over(cumW))
      .filter(col("cum") * 2 >= totalBases)
      .agg(max(col("len"))).as[Option[Long]].head().getOrElse(0L)
    outFasta.foreach(p => Fastq.writeFasta(contigs, p))
    println(s"""{"reads":$nReads,"kmers":$nKmers,"k":$k,"min_cov":$minCov,""" +
      s""""preprocessed":$doPre,"corrected_reads":$nCorrected,""" +
      s""""contigs":${stats._1},"bases":${stats._2},"longest":${stats._3},"n50":$n50,""" +
      s""""sec_read":$tRead,"sec_count":$tCount,"sec_assemble":$tAsm}""")
    spark.stop()
  }
}
