package graft

import org.apache.spark.sql.SparkSession

/** Throwaway (r14): min-of-N timer for arbitrary queries + a streaming
  * progress listener that sums per-batch durationMs phases, so the
  * es-family micro-batch floor is attributable (walCommit vs planning vs
  * addBatch). Usage: ScratchQ <q1,q2,...> [passes] [sfDir]
  */
object ScratchQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("scratch-q").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-batch phase accounting across every stream the queries start
    val phases = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    var batches = 0
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        batches += 1
        e.progress.durationMs.forEach { (k, v) =>
          phases.merge(k, v.toLong, (a, b) => a + b); ()
        }
      }
    })

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val all = SparkEntry.queries ++ SparkEntry.localQueries
    names.foreach(n => noop(all(n)(spark, "/root/testdata/sf0.001"))) // warm
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    val results = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to passes).foreach { p =>
      names.foreach { n =>
        phases.clear(); batches = 0
        val t0 = System.nanoTime()
        noop(all(n)(spark, sfDir))
        val t = (System.nanoTime() - t0) / 1e9
        results(n) ::= t
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        val ph = phases.entrySet().toArray.map(_.toString).sorted.mkString(" ")
        println(f"[pass $p] $n%-28s ${t}%6.2f s  batches=$batches  $ph")
      }
    }
    println("== mins ==")
    names.foreach { n =>
      val v = results(n)
      println(f"$n%-28s min=${v.min}%6.2f med=${v.sorted.apply(v.size / 2)}%6.2f passes=${v.size}")
    }
    spark.stop()
  }
}
