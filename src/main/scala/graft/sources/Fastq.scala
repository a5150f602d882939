package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

  /** P14: read guards — minimum/maximum length, valid leading charset. */
  def guardReads(reads: Dataset[String], minLen: Int, maxLen: Int = 600): Dataset[String] =
    reads.filter(r => r.length >= minLen && r.length < maxLen &&
      r.nonEmpty && "ACGTN".indexOf(r.charAt(0)) >= 0)

  /** S4: multi-line FASTA -> (id, seq). Correctness formulation via a
    * global line-index window (records can span text-split boundaries);
    * fine for contig-scale inputs, which are post-assembly (small). */
  def readFasta(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.text(path).as[String].rdd.zipWithIndex()
      .map { case (l, i) => (i, l) }.toDF("idx", "line")
    val rec = sum(when(col("line").startsWith(">"), 1).otherwise(0))
      .over(Window.orderBy("idx"))
    lines
      .withColumn("rec", rec)
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
    * text lines; write with `.write.text(path)`. */
  def formatFasta(contigs: DataFrame, seqCol: String = "contig"): DataFrame = {
    val w = Window.orderBy(col(seqCol))
    contigs
      .withColumn("cid", row_number().over(w))
      .select(concat(
        lit(">Contig-"), col("cid"), lit("-"), length(col(seqCol)), lit("\n"),
        // 100-col wrap: newline after each full 100-char chunk, then trim a
        // trailing newline when the length is an exact multiple.
        regexp_replace(regexp_replace(col(seqCol), "(.{100})", "$1\n"), "\n$", ""))
        .as("value"))
  }

  /** S6: write contigs as a FASTA file tree. */
  def writeFasta(contigs: DataFrame, path: String, seqCol: String = "contig"): Unit =
    formatFasta(contigs, seqCol).coalesce(1).write.mode("overwrite").text(path)

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
