package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: what is the fixed floor of a 4-batch AvailableNow stream on
  * this box, and where does an es query's wall go? (r13 scratch) */
object ScratchES {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("scratch-es").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.streaming.Trigger

    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // 4-file fixture, 100 rows each
    val root = "/tmp/scratch_es"
    def del(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(del)
      p.delete(); ()
    }
    del(new java.io.File(root))
    (0 until 4).foreach { i =>
      spark.range(100).select(col("id"), lit(i).as("b"))
        .coalesce(1).write.mode("overwrite").parquet(s"$root/tmp$i")
      val part = new java.io.File(s"$root/tmp$i").listFiles()
        .filter(f => f.getName.endsWith(".parquet")).head
      new java.io.File(s"$root/in").mkdirs()
      java.nio.file.Files.move(part.toPath,
        new java.io.File(s"$root/in/b$i.parquet").toPath)
    }
    val sch = spark.read.parquet(s"$root/in").schema

    def run(parts: Int, tag: String): Unit = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try {
        val name = s"floor_$tag"
        spark.catalog.dropTempView(name)
        val q = spark.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
          .groupBy(col("id") % 10).count()
          .writeStream.format("memory").queryName(name)
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.table(name).collect()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    var n = 0
    (1 to 3).foreach { p =>
      timed(s"floor p$p parts=4") { run(4, s"a$n"); n += 1 }
      timed(s"floor p$p parts=1") { run(1, s"b$n"); n += 1 }
    }
    spark.stop()
  }
}
