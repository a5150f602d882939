package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.StageRunner

/** Driver-orchestrated multi-stage pipelines (SURVEY §3.3): the dynamic-k
  * ("meta") assembly strategy as a resumable staged run — count k₁ →
  * assemble → feed contigs + reads into k₂ → ... — with every stage
  * materialized to Parquet and `_SUCCESS`-resumed by [[StageRunner]]
  * (the reference's `Pipelines.java:613-829` checkpoint protocol, minus
  * the gzip-CSV interchange). Iterating k upward lets small k bridge
  * low-coverage regions and large k resolve repeats, with earlier
  * contigs acting as long pseudo-reads for later rounds.
  */
object Pipelines {

  /** Staged dynamic-k assembly with `_SUCCESS` resume. Returns contigs of
    * the final round. Stages: `count_k<k>` and `contigs_k<k>` per k. */
  def dynamicAssembly(spark: SparkSession, reads: Dataset[String],
                      kList: Seq[Int], workDir: String,
                      minCov: Int = 1, minContig: Int = 0): Dataset[String] = {
    import spark.implicits._
    val runner = new StageRunner(spark, workDir)
    var contigs: Dataset[String] = spark.emptyDataset[String]
    kList.foreach { k =>
      val input = reads.union(contigs)
      val counted = runner.stage(s"count_k$k") {
        Genomics.countCanonical(input, k)
      }
      contigs = runner.stage(s"contigs_k$k") {
        Assembler.assemble(counted, k, minCov = minCov).toDF("contig")
      }.select(col("contig")).as[String]
    }
    contigs.filter((c: String) => c.length >= minContig)
  }
}
