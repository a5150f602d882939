package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-executor smoke: run a representative query per family under
  * `local-cluster[2,4,2048]` — REAL forked executor JVMs, so closure
  * serialization, task-binary broadcast, and netty shuffle all happen for
  * real (local[*] runs everything in one JVM and hides all three) — and
  * compare an in-engine full-result hash against the same queries on
  * local[*]. This is the closest a single box gets to 1000-executor
  * evidence: a query that passes here has no driver-only state, no
  * unserializable closure, and no single-JVM assumption.
  *
  * Usage: runMain graft.ClusterSmoke <sfDir> [q1,q2,...]
  * Needs the packaged jar on spark.jars (executors fork with the Spark
  * jars on their classpath, but application classes must ship):
  * `sbt package` first; the main locates the jar itself.
  */
object ClusterSmoke {
  // one query per operator family, biased toward multi-stage plans:
  // shuffles, windows, typed mapPartitions generators, broadcast joins,
  // TypedImperativeAggregate, localCheckpoint, and the assembler loop.
  private val DefaultPicks = Seq(
    "q1_agg", "q17_percentiles", "q18_salted_join",
    "g1_kmer_count", "a1_assembly", "j13_stitch", "p1_error_correct",
    "d1_exact_dedup", "d3_lsh_pairs", "d13_span_dedup", "d11_simhash_pairs",
    "s7_semdedup", "s8_kmeans_step", "t16_tfidf", "t22_encode",
    "t27_contamination_frac", "x2_hll_registers", "e6_asof_attribution",
    "e13_transitions", "m4_batch_encode", "c1_curate", "f2_fasta_roundtrip")

  /** Order-independent full-result digest computed IN the engine:
    * decimal-sum of xxhash64 over the canonically-stringified row (sorted
    * column order, U+0001 field separator so column boundaries can't
    * alias, NULL sentinel) plus the row count — multiset-faithful, no
    * collect, no driver-side row loop, and decimal(38,0) cannot overflow
    * under ANSI mode at any realistic row count. */
  private def digest(df: DataFrame): String = {
    val cols = df.columns.sorted.map(c =>
      coalesce(col(c).cast("string"), lit("<NULL>")))
    val h = xxhash64(concat_ws("\u0001", cols.toIndexedSeq: _*))
    val r = df.select(h.cast("decimal(38,0)").as("h"))
      .agg(sum(col("h")).as("s"), count(lit(1)).as("n")).first()
    s"${r.get(0)}:${r.getLong(1)}"
  }

  /** `<spark home>/jars/spark-core*.jar` is where SparkContext loaded
    * from, so two `getParentFile`s give a SPARK_HOME that is valid even
    * when the calling shell exported nothing. */
  private def sparkHomeFromClasspath: String =
    new java.io.File(classOf[org.apache.spark.SparkContext]
      .getProtectionDomain.getCodeSource.getLocation.toURI)
      .getParentFile.getParentFile.getAbsolutePath

  /** Worker-side home pin. `spark.executorEnv.SPARK_HOME` is NOT enough
    * for local-cluster: the in-process Worker builds each executor command
    * through `launcher.WorkerCommandBuilder`, which force-overwrites the
    * child env's SPARK_HOME with the WORKER's own sparkHome — and the
    * Worker resolves that from `System.getenv("SPARK_HOME")` (falling back
    * to cwd, which then dies on `./assembly/target/scala-2.13/jars`). The
    * one env-free seam Spark offers is the testing pair it uses for its
    * own local-cluster suites: when `spark.testing` is set, the Worker
    * takes its home from the `spark.test.home` sysprop. Both are driver
    * JVM sysprops (the Worker lives in the driver process under
    * local-cluster), so setting them here makes a bare `java -cp` launch
    * with NO ambient env work; when the caller already exported
    * SPARK_HOME we leave the standard path alone. */
  private def pinWorkerSparkHome(): Unit =
    if (System.getenv("SPARK_HOME") == null) {
      sys.props.getOrElseUpdate("spark.testing", "true")
      sys.props.getOrElseUpdate("spark.test.home", sparkHomeFromClasspath)
      ()
    }

  private def session(master: String, jar: Option[String]): SparkSession = {
    if (master.startsWith("local-cluster")) pinWorkerSparkHome()
    val b = SparkSession.builder()
      .master(master)
      .appName(s"graft-cluster-smoke-$master")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Self-contained executor launch: the in-process Worker builds the
      // executor command via launcher.AbstractCommandBuilder, whose
      // getScalaVersion()/getSparkHome() consult childEnv (seeded from
      // spark.executorEnv.*) before System.getenv and otherwise demand a
      // source-tree launcher/target/scala-* build dir. bin/spark-class
      // exports both vars in shell launches, but a bare `sbt runMain` has
      // no such ambient env — without these configs a fresh shell dies
      // with "Cannot find any build directories" / a cwd-relative
      // assembly dir. SPARK_HOME is derived from the jar that loaded
      // SparkContext (<home>/jars/spark-core*.jar), so nothing here
      // depends on the caller's shell profile.
      .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
      .config("spark.executorEnv.SPARK_HOME", sparkHomeFromClasspath)
      // forked executors need the JDK17 opens the driver already has
      .config("spark.executor.extraJavaOptions",
        "--add-opens=java.base/java.lang=ALL-UNNAMED " +
        "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED " +
        "--add-opens=java.base/java.lang.reflect=ALL-UNNAMED " +
        "--add-opens=java.base/java.io=ALL-UNNAMED " +
        "--add-opens=java.base/java.net=ALL-UNNAMED " +
        "--add-opens=java.base/java.nio=ALL-UNNAMED " +
        "--add-opens=java.base/java.util=ALL-UNNAMED " +
        "--add-opens=java.base/java.util.concurrent=ALL-UNNAMED " +
        "--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED " +
        "--add-opens=java.base/jdk.internal.ref=ALL-UNNAMED " +
        "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED " +
        "--add-opens=java.base/sun.nio.cs=ALL-UNNAMED " +
        "--add-opens=java.base/sun.security.action=ALL-UNNAMED " +
        "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED")
    jar.foreach(b.config("spark.jars", _))
    b.getOrCreate()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val all = SparkEntry.queries ++ SparkEntry.localQueries
    val picks = args.lift(1) match {
      case Some("ALL") => all.keys.toSeq.sorted
      case Some(list)  => list.split(",").toSeq.filter(all.contains)
      case None        => DefaultPicks.filter(all.contains)
    }

    val jar = new java.io.File("target/scala-2.13").listFiles()
      .filter(f => f.getName.startsWith("reflexivspark") && f.getName.endsWith(".jar"))
      .sortBy(-_.lastModified).headOption.map(_.getAbsolutePath)
    require(jar.nonEmpty, "run `sbt package` first: executors need the app jar")

    def runAll(master: String): Map[String, Either[String, String]] = {
      val spark = session(master, jar)
      spark.sparkContext.setLogLevel("WARN")
      val out = picks.map { name =>
        name -> (try Right(digest(all(name)(spark, sfDir)))
        catch { case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        })
      }.toMap
      spark.stop()
      // SparkSession caches the stopped session unless cleared
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      out
    }

    val localRes = runAll("local[8]")
    val clusterRes = runAll("local-cluster[2,4,2048]")

    var bad = 0
    picks.foreach { n =>
      (localRes(n), clusterRes(n)) match {
        case (Right(a), Right(b)) if a == b => println(s"[smoke] $n OK ($a)")
        case (a, b) => bad += 1; println(s"[smoke] $n MISMATCH local=$a cluster=$b")
      }
    }
    println(s"[smoke] ${picks.size - bad}/${picks.size} queries identical across " +
      "local[8] and local-cluster[2,4,2048] (2 forked executor JVMs)")
    if (bad > 0) sys.exit(1)
  }
}
