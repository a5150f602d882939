package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.sources.Fastq

/** End-to-end IO round-trips, oracle-checked: the FASTQ fabricate -> write
  * -> read -> parse -> count path (P12+S1+P1+P14+A1) and the FASTA
  * sink -> source path (P11+S6+S4). Files land under the repo's target dir
  * (deterministic per scale factor, overwritten each run).
  */
object GenomicsIO {
  private def ioDir(d: String) =
    s"/root/repo/target/graft_io/${new java.io.File(d).getName}"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- P12 -> S1 -> P1 -> P14 -> A1: counts must equal the direct path ---
    "f1_fastq_roundtrip" -> ((s, d) => {
      val tmp = s"${ioDir(d)}/fastq"
      val seqs = documents(s, d).select(Genomics.dna32(col("doc_id")).as("read"))
      Fastq.toFastqLines(seqs).coalesce(1).write.mode("overwrite").text(tmp)
      val reads = Fastq.guardReads(Fastq.fastqSequences(s, tmp), minLen = 15)
      Genomics.decodeCounts(Genomics.countCanonical(reads, 15), 15)
    }),

    // -- contigs -> FASTA file (wrapped) -> parsed back ---------------------
    "f2_fasta_roundtrip" -> ((s, d) => {
      val tmp = s"${ioDir(d)}/fasta"
      val c = concat(Genomics.dna64(col("doc_id")),
        Genomics.dna32(col("doc_id")), Genomics.dna32(col("doc_id")))
      val contigs = documents(s, d).select(c.as("contig"))
      Fastq.writeFasta(contigs, tmp)
      Fastq.readFasta(s, tmp).select(col("id"), length(col("seq")).as("len"), col("seq"))
    }),

    // -- paired-end: two mate files -> positional pairing -> roundtrip ------
    // mate2 simulates the opposite-strand mate (revcomp of the fragment
    // end); a correct join keeps each mate1 with ITS mate2 — any off-by-one
    // in the pairing produces different rows and a hash mismatch.
    "f5_paired_roundtrip" -> ((s, d) => {
      val tmp = ioDir(d)
      // persist so both mate files are written from the SAME row order (the
      // pairing is positional — the two writes must agree record-for-record)
      val docs = documents(s, d).select(Genomics.dna32(col("doc_id")).as("g")).persist()
      val m1 = docs.select(col("g").as("read"))
      val m2 = docs.select(reverse(translate(col("g"), "ACGT", "TGCA")).as("read"))
      Fastq.toFastqLines(m1).coalesce(1).write.mode("overwrite").text(s"$tmp/pair1")
      Fastq.toFastqLines(m2).coalesce(1).write.mode("overwrite").text(s"$tmp/pair2")
      docs.unpersist()
      Fastq.readPairedFastq(s, s"$tmp/pair1", s"$tmp/pair2")
        .select("mate1", "mate2")
    })
  )

  def oracles: Map[String, String] = Map(
    "f1_fastq_roundtrip" -> Genomics.oracles("g1_kmer_count"),
    "f2_fasta_roundtrip" ->
      """WITH c AS (
        |  SELECT translate(md5(CAST(doc_id AS VARCHAR)), '0123456789abcdef', 'ACGTACGTACGTACGT')
        |      || translate(md5(CAST(doc_id AS VARCHAR) || 'x'), '0123456789abcdef', 'ACGTACGTACGTACGT')
        |      || repeat(translate(md5(CAST(doc_id AS VARCHAR)), '0123456789abcdef', 'ACGTACGTACGTACGT'), 2)
        |      AS contig
        |  FROM documents)
        |SELECT 'Contig-' || rn || '-' || length(contig) AS id,
        |       length(contig) AS len, contig AS seq
        |FROM (SELECT contig, ROW_NUMBER() OVER (ORDER BY contig) AS rn FROM c)""".stripMargin,
    "f5_paired_roundtrip" ->
      """SELECT translate(md5(CAST(doc_id AS VARCHAR)), '0123456789abcdef', 'ACGTACGTACGTACGT') AS mate1,
        |       reverse(translate(translate(md5(CAST(doc_id AS VARCHAR)), '0123456789abcdef', 'ACGTACGTACGTACGT'), 'ACGT', 'TGCA')) AS mate2
        |FROM documents""".stripMargin
  )
}
