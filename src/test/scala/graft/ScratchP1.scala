package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Throwaway: where does p1's time go, per stage per pass? (r13 scratch) */
object ScratchP1 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("scratch-p1").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.ErrorCorrect

    @volatile var collect = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (collect) {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        println(f"  stage ${si.stageId}%4d ${si.name.take(40)}%-40s tasks=${si.numTasks}%3d " +
          f"wall=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3}%7.2f " +
          f"run=${tm.executorRunTime / 1e3}%8.2f cpu=${tm.executorCpuTime / 1e9}%8.2f " +
          f"gc=${tm.jvmGCTime / 1e3}%6.2f deser=${tm.executorDeserializeTime / 1e3}%6.2f " +
          f"shRead=${tm.shuffleReadMetrics.fetchWaitTime / 1e3}%5.2f")
      }
    })

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val fn = ErrorCorrect.queries("p1_error_correct")
    noop(fn(spark, "/root/testdata/sf0.001")) // Bench-style warmup
    collect = true
    (1 to 4).foreach { p =>
      timed(s"pass $p: full p1") { noop(fn(spark, sfDir)) }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
