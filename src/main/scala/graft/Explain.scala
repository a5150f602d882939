package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of selected queries
  * (all, or those named in args) so scan pushdown (`PushedFilters`,
  * `ReadSchema`), broadcast joins, and WholeStageCodegen coverage can be
  * inspected. Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val all = SparkEntry.queries ++ SparkEntry.localQueries
    val names = if (args.length > 1) args.drop(1).toSeq else all.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      all(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
