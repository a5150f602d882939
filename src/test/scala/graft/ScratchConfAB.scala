package graft

import org.apache.spark.sql.SparkSession

/** Throwaway (r14): generic in-JVM ABBA of a boolean session conf —
  * alternates <confKey> between true and false so both variants see
  * identical JIT/host phase.
  * Usage: ScratchConfAB <confKey> <q1,q2,...> [passes] */
object ScratchConfAB {
  def main(args: Array[String]): Unit = {
    val confKey = args(0)
    val names = args(1).split(",").toSeq
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("scratch-conf-ab").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val all = SparkEntry.queries ++ SparkEntry.localQueries
    val results = scala.collection.mutable.Map.empty[(String, Boolean), List[Double]]
      .withDefaultValue(Nil)
    names.foreach { n =>
      Seq(true, false).foreach { on =>
        spark.conf.set(confKey, on.toString)
        noop(all(n)(spark, "/root/testdata/sf0.001"))
      }
    }
    (1 to passes).foreach { _ =>
      names.foreach { n =>
        Seq(true, false, false, true).foreach { on =>
          spark.conf.set(confKey, on.toString)
          val t0 = System.nanoTime()
          noop(all(n)(spark, sfDir))
          val t = (System.nanoTime() - t0) / 1e9
          results((n, on)) ::= t
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        }
      }
    }
    names.foreach { n =>
      val on = results((n, true)); val off = results((n, false))
      println(f"$n%-26s ON  min=${on.min}%6.2f med=${on.sorted.apply(on.size / 2)}%6.2f   " +
        f"OFF min=${off.min}%6.2f med=${off.sorted.apply(off.size / 2)}%6.2f")
    }
    spark.stop()
  }
}
