package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: where does m11's Spark time go? (r13 scratch) */
object ScratchM11Spark {
  def main(args: Array[String]): Unit = {
    import graft.operators.{Multimodal, Dedup}
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "8g")
      .appName("scratch-m11").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
    println("n_docs = " + docs.count())

    def sigs = docs.mapPartitions(_.map { id =>
      val wav = Multimodal.wavPcm16(
        Multimodal.audioSamples(id >> 1, gain = 1 + (id % 2).toInt,
          off = 3 * (id % 2).toInt), 8000)
      val (_, samples) = Multimodal.decodeWav(wav)
      (id, Multimodal.audioSig(samples))
    }).toDF("doc_id", "sig")

    // warmup both paths
    noop(Dedup.simhashPairs(sigs))
    (1 to 3).foreach { p =>
      timed(s"sigs only p$p") { noop(sigs) }
      timed(s"full m11 p$p") { noop(Dedup.simhashPairs(sigs)) }
      timed(s"pairs-on-cached p$p") {
        val cached = sigs.cache(); cached.count()
        noop(Dedup.simhashPairs(cached))
        cached.unpersist()
      }
    }
    spark.stop()
  }
}
