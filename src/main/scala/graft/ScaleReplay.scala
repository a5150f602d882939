package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-replay diagnostic: materialize an N-times-larger documents table
  * (each copy word-salted so copies are NOT near-dups — pure volume
  * scaling, same length/shingle distribution) plus pass-through copies of
  * the other tables, then time selected SparkEntry queries on it.
  * Evidence for "does this operator scale linearly", run at will:
  *
  *   runMain graft.ScaleReplay /root/testdata/sf0.1 8 d3_lsh_pairs t16_tfidf
  *
  * Prints one JSON line compatible with Bench's shape.
  */
object ScaleReplay {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"/root/repo/target/scale_replay/${new java.io.File(sfDir).getName}_x$factor"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val enlarged = (0 until factor).map { i =>
      docs.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        // salt every word so cross-copy shingles never collide
        (if (i == 0) col("text")
         else array_join(transform(split(col("text"), " "),
           w => concat(w, lit(s"$i"))), " ")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    enlarged.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // embeddings scale too (for the s-family): copies get a deterministic
    // first-dimension nudge so they are distinct vectors, not near-dups
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    (0 until factor).map { i =>
      emb.select(
        (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
        (if (i == 0) col("embedding")
         else transform(col("embedding"),
           (x, j) => when(j === 0, x + lit(0.001f * i)).otherwise(x))).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events").foreach { t =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }

    var times = Vector.empty[(String, Double)]
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.mode("overwrite").format("noop").save()
      times :+= (n -> (System.nanoTime() - t0) / 1e9)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    val qs = times.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_replay_x$factor","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
