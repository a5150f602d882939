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
  *
  * With NO query names it only materializes the scaled corpus and prints
  * its directory — `runMain graft.ScaleReplay /root/testdata/sf0.1 10`
  * builds the sf1-equivalent tables that a full
  * `SPARK_GRAFT_SF_DIR=<dir> runMain graft.Bench` pass then consumes
  * (VERDICT r8 #5: the whole-bench memory/spill story at 10x, not just
  * per-query replays).
  */
object ScaleReplay {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: ScaleReplay <sfDir> <factor> [query ...]\n" +
          "query names may be space-separated or comma-joined (a,b,c)")
      sys.exit(2)
    }
    val sfDir = args(0)
    val factor = args(1).toInt
    // accept BOTH `a b c` and `a,b,c` — every sibling main (Verify,
    // ClusterSmoke, Bench) takes comma lists, so this one must too
    val names = args.drop(2).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    val allQueries = SparkEntry.queries ++ SparkEntry.localQueries
    val unknown = names.filterNot(allQueries.contains)
    if (unknown.nonEmpty) {
      System.err.println(
        s"unknown queries: ${unknown.mkString(", ")}\n" +
          s"valid names: ${allQueries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
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
    // embeddings scale too (for the s-family): copy i is the CYCLIC
    // ROTATION of the original by i dimensions — norm-preserving, and the
    // cosine between a random vector and its rotation is near 0, so copies
    // are genuinely distinct directions, not semantic near-dups (the old
    // 0.001*i first-dim nudge left cosine ~1-5e-7, far above s7's 0.999
    // threshold, so s7 silently dropped every scaled copy and skewed the
    // s-family evidence)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dims = emb.select(size(col("embedding"))).first().getInt(0)
    (0 until factor).map { i =>
      emb.select(
        (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
        (if (i == 0) col("embedding")
         else transform(col("embedding"),
           (_, j) => element_at(col("embedding"),
             ((j + lit(i)) % dims) + 1))).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // the relational/event fact tables scale with key offsets that
    // replicate the join structure per copy (q17/q18/q22/q23, e-family):
    // per-order and per-customer relationships repeat in each copy, while
    // DIMENSION keys (l_suppkey, l_partkey) stay shared — dims grow slower
    // than facts in real warehouses, and keeping them shared preserves the
    // hot-key skew q18's salted join exists for.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def enlarge(t: String, offsets: Map[String, Long]): Unit =
      (0 until factor).map { i =>
        val df = spark.read.parquet(s"$sfDir/$t.parquet")
        df.select(df.columns.toIndexedSeq.map { c =>
          offsets.get(c) match {
            case Some(off) => (col(c) + lit(i * off)).as(c)
            case None      => col(c)
          }
        }: _*)
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    enlarge("lineitem", Map("l_orderkey" -> 1000000000L))
    enlarge("orders", Map("o_orderkey" -> 1000000000L, "o_custkey" -> 100000000L))
    enlarge("customer", Map("c_custkey" -> 100000000L))
    enlarge("events", Map("event_id" -> 1000000000L, "user_id" -> 100000000L))
    Seq("region", "nation", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }

    if (names.isEmpty) {
      println(s"""{"metric":"scale_corpus_x$factor","dir":"$dir","sf":"$sfDir"}""")
      spark.stop()
      return
    }
    // SPARK_GRAFT_PASSES=N: min-of-N per query (default 1) — the noisy
    // host makes single samples unadjudicable (VERDICT r11 #1/#2); the
    // emitted line carries min + all samples + operator counters
    // (contraction rounds, endgame size) per query. Non-numeric values
    // fail loudly; 0/negative clamp to 1 (ADVICE r12: zero passes used to
    // run nothing and then throw v.min's UnsupportedOperationException).
    val passes = sys.env.get("SPARK_GRAFT_PASSES") match {
      case None => 1
      case Some(raw) => raw.toIntOption match {
        case Some(n) => math.max(1, n)
        case None =>
          System.err.println(s"SPARK_GRAFT_PASSES must be a positive int, got '$raw'")
          sys.exit(2)
      }
    }
    // Bench-style warmup (VERDICT r12 #3): run every selected query once
    // at sf0.001 before timing. Generated code is plan-specific, so first
    // samples otherwise run 3-10x the steady state (measured 16x j13:
    // [112.5, 138.8, 55.3] cold vs [35.2, 27.3, ...] warmed) and min-of-N
    // never converges inside realistic pass counts.
    names.foreach { n =>
      try allQueries(n)(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache()
    var times = Vector.empty[(String, Seq[Double])]
    var counters = Map.empty[String, Map[String, Long]]
    names.foreach { n =>
      val ts = (0 until passes).map { _ =>
        val cBefore = graft.core.Counters.snapshot
        val t0 = System.nanoTime()
        allQueries(n)(spark, dir).write.mode("overwrite").format("noop").save()
        val t = (System.nanoTime() - t0) / 1e9
        val d = graft.core.Counters.diff(cBefore, graft.core.Counters.snapshot)
        if (d.nonEmpty) counters += n -> d
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        t
      }
      times :+= (n -> ts)
    }
    val qs = times.map { case (k, v) => s""""$k":${v.min}""" }.mkString("{", ",", "}")
    val samp = times.map { case (k, v) =>
      s""""$k":${v.mkString("[", ",", "]")}""" }.mkString("{", ",", "}")
    val ctr = counters.toSeq.sortBy(_._1).map { case (q, m) =>
      s""""$q":""" + m.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    // self-describing line (VERDICT r12 #2/#3): factor, passes, and the
    // materialized corpus dir identify the run without reading counters
    println(s"""{"metric":"scale_replay_x$factor","factor":$factor,"passes":$passes,"corpus_dir":"$dir","queries":$qs,"samples":$samp,"counters":$ctr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
