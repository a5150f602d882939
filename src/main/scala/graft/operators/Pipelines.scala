package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{KmerCodec, KmerIter}
import graft.sources.StageRunner

/** Driver-orchestrated multi-stage pipelines (SURVEY §3.3): the dynamic-k
  * ("meta") assembly strategy as a resumable staged run, with every stage
  * materialized to Parquet and `_SUCCESS`-resumed by [[StageRunner]]
  * (the reference's `Pipelines.java:613-829` checkpoint protocol, minus
  * the gzip-CSV interchange). Iterating k upward lets small k bridge
  * low-coverage regions and large k resolve repeats, with earlier
  * contigs acting as long pseudo-reads for later rounds.
  *
  * Scale design (the reference's `reduce` interchange,
  * `Pipelines.java:1315-1740` / `ReflexivDSDynamicKmerRuduction.java:199-230`,
  * re-thought Spark-first):
  *  - **One scan of the read set for the whole k-ladder.** `count_multik`
  *    emits (k, kmer) for every k in one flatMap over the reads and counts
  *    them in one hash aggregation — vs. re-reading the full (100 TB-scale)
  *    read set once per k. The shuffle carries the same total volume the
  *    per-k counts would, but the input scan happens once.
  *  - **Reduced per-k interchange.** Round k's assembly input
  *    (`count_k<k>_reduced`) = the read-derived k-counts plus ONLY the
  *    novel bridging k-mers contributed by the previous round's contigs
  *    (an anti-join — J4 semantics). Contigs are tiny next to the reads,
  *    so the per-round work after the first scan is proportional to the
  *    assembly, not the corpus.
  *  - Each k dispatches to the packed-Long assembler (k <= 31) or the
  *    wide block assembler (k > 31); the interchange is block-form so the
  *    ladder can cross 31 (the reference's k=95 regime).
  */
object Pipelines {

  /** Staged dynamic-k assembly with `_SUCCESS` resume. Returns contigs of
    * the final round. Stages: `count_multik`, then `count_k<k>_reduced`
    * and `contigs_k<k>` per k. `minCov` applies to read-derived counts;
    * contig-derived bridging k-mers are trusted (they were assembled from
    * covered k-mers in an earlier round). */
  def dynamicAssembly(spark: SparkSession, reads: Dataset[String],
                      kList: Seq[Int], workDir: String,
                      minCov: Int = 1, minContig: Int = 0): Dataset[String] = {
    import spark.implicits._
    val runner = new StageRunner(spark, workDir)
    val ks = kList.sorted
    val multik = runner.stage("count_multik") {
      val kArr = ks.toArray
      reads.flatMap { r =>
        kArr.iterator.flatMap(k => KmerIter.canonicalBlocks(r, k).map(kb => (k, kb)))
      }.toDF("k", "kb").groupBy("k", "kb").count()
    }
    var contigs: Dataset[String] = spark.emptyDataset[String]
    ks.foreach { k =>
      val reduced = runner.stage(s"count_k${k}_reduced") {
        val fromReads = multik.filter(col("k") === k)
          .select("kb", "count").filter(col("count") >= minCov)
        val bridge = contigs.flatMap(c => KmerIter.canonicalBlocks(c, k))
          .toDF("kb").groupBy("kb").count()
          .join(fromReads.select("kb"), Seq("kb"), "left_anti")
        fromReads.unionAll(bridge)
      }
      // the in-round contraction checkpoints durably under the work dir
      // (restart-resume mid-assembly); the scratch is dropped once the
      // round's contigs stage has landed
      val ckpt = Some(s"$workDir/assemble_k$k")
      contigs = runner.stage(s"contigs_k$k") {
        val out =
          if (k <= 31) {
            val longCounts = reduced.as[(Array[Long], Long)]
              .map { case (kb, c) => (KmerCodec.blocksPrefixLong(kb, k), c) }
              .toDF("kv", "count")
            Assembler.assemble(longCounts, k, minCov = 1, ckptDir = ckpt)
          } else AssemblerWide.assemble(reduced, k, minCov = 1, ckptDir = ckpt)
        out.toDF("contig")
      }.select(col("contig")).as[String]
      runner.clean(s"assemble_k$k")
    }
    contigs.filter((c: String) => c.length >= minContig)
  }
}
