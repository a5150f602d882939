package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: m11 stage timing on the x16 corpus (r13). */
object ScratchM16 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scale_replay/sf0.1_x16")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("scratch-m16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.{Multimodal, Dedup}

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def sigs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .repartition(32, col("doc_id"))
      .mapPartitions(_.map { id =>
        val wav = Multimodal.wavPcm16(
          Multimodal.audioSamples(id >> 1, gain = 1 + (id % 2).toInt,
            off = 3 * (id % 2).toInt), 8000)
        (id, Multimodal.audioSig(Multimodal.decodeWav(wav)._2))
      }).toDF("doc_id", "sig")
    val m11 = (SparkEntry.queries ++ SparkEntry.localQueries)("m11_audio_neardup")
    noop(m11(spark, "/root/testdata/sf0.001")) // warm
    (1 to 3).foreach { p =>
      timed(s"sigs only     p$p") { noop(sigs) }
      timed(s"sigs+pairs    p$p") { noop(Dedup.simhashPairs(sigs)) }
      timed(s"m11 via entry p$p") { noop(m11(spark, dir)) }
    }
    spark.stop()
  }
}
