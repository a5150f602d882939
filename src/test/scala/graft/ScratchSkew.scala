package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: band-bucket skew of m11's audio signatures at 16x (r13). */
object ScratchSkew {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scale_replay/sf0.1_x16")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("scratch-skew").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.Multimodal

    val sigs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .repartition(32)
      .mapPartitions(_.map { id =>
        val wav = Multimodal.wavPcm16(
          Multimodal.audioSamples(id >> 1, gain = 1 + (id % 2).toInt,
            off = 3 * (id % 2).toInt), 8000)
        (id, Multimodal.audioSig(Multimodal.decodeWav(wav)._2))
      }).toDF("doc_id", "sig")

    val bands = sigs.select(col("doc_id"),
      explode(array((0 until 4).map(b => struct(lit(b).as("bnd"),
        shiftrightunsigned(col("sig"), 15 * b).bitwiseAND(lit(32767L))
          .as("bv"))): _*)).as("e"))
      .select(col("e.bnd").as("bnd"), col("e.bv").as("bv"))
    val hist = bands.groupBy("bnd", "bv").count()
    println("n_docs = " + sigs.count())
    println("distinct buckets = " + hist.count())
    hist.orderBy(col("count").desc).show(20, truncate = false)
    val top = hist.agg(sum(col("count") * (col("count") - 1) / 2)).first()
    println("total intra-bucket pairs = " + top)
    spark.stop()
  }
}
