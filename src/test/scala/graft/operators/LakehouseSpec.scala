package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Lakehouse layout + incremental-maintenance guarantees:
  *  - the bucketed-table join really is exchange-free (the structural
  *    claim f12's oracle row cannot see)
  *  - the x8 summary state obeys its merge laws under ANY batch split,
  *    so the incremental fold equals a full recompute by construction
  */
class LakehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def canon(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("eventState merge law: merge(state(A), state(B), state(C)) == state(A+B+C)") {
    import spark.implicits._
    // adversarial-ish values: negatives, cents-precision, duplicate users
    // across splits (the case where register MAX and count SUM differ)
    val rows = Seq(
      ("view", 1L, 1.25), ("view", 2L, -3.10), ("view", 1L, 0.05),
      ("buy", 1L, 99.99), ("buy", 3L, 0.0), ("view", 4L, 7.77),
      ("buy", 2L, -0.01), ("view", 3L, 123.45), ("buy", 4L, 1e6),
      ("view", 5L, 2.22))
    val all = rows.toDF("event_type", "user_id", "value")
    // split by row index into three arbitrary uneven batches
    val withIdx = rows.zipWithIndex
    def batch(p: Int => Boolean) =
      withIdx.collect { case (r, i) if p(i) => r }
        .toDF("event_type", "user_id", "value")
    val merged = Lakehouse.mergeEventState(
      Lakehouse.eventState(batch(_ % 3 == 0)),
      Lakehouse.eventState(batch(_ % 3 == 1)),
      Lakehouse.eventState(batch(_ % 3 == 2)))
    assert(canon(merged) == canon(Lakehouse.eventState(all)))
  }

  test("eventState merge is associative: ((A+B)+C) == (A+(B+C))") {
    import spark.implicits._
    def df(rows: (String, Long, Double)*) =
      rows.toDF("event_type", "user_id", "value")
    val a = Lakehouse.eventState(df(("view", 1L, 1.0), ("buy", 2L, 2.0)))
    val b = Lakehouse.eventState(df(("view", 1L, 3.0)))
    val c = Lakehouse.eventState(df(("buy", 9L, 4.5), ("view", 7L, 0.5)))
    val left = Lakehouse.mergeEventState(Lakehouse.mergeEventState(a, b), c)
    val right = Lakehouse.mergeEventState(a, Lakehouse.mergeEventState(b, c))
    assert(canon(left) == canon(right))
  }

  test("bucketed join runs with ZERO exchanges (and zero sorts) after the layout write") {
    val s = spark
    val dir = "/root/repo/target/graft_test/bucketed_spec"
    s.sql("DROP TABLE IF EXISTS spec_fact_b")
    s.sql("DROP TABLE IF EXISTS spec_dim_b")
    import s.implicits._
    (1L to 2000L).map(i => (i % 97, i)).toDF("k", "v")
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .option("path", s"$dir/fact").format("parquet").saveAsTable("spec_fact_b")
    (0L until 97L).map(i => (i, s"n$i")).toDF("k", "name")
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .option("path", s"$dir/dim").format("parquet").saveAsTable("spec_dim_b")
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = s.table("spec_fact_b").join(s.table("spec_dim_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n${plan.take(2000)}")
      // sortBy in the layout also pre-sorts each bucket file; Spark still
      // inserts a defensive sort only when a bucket has >1 file — with the
      // single-write layout here there must be none
      assert(j.count() == 2000)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("mismatched bucket counts fall back to a shuffle (the layout contract)") {
    val s = spark
    val dir = "/root/repo/target/graft_test/bucketed_spec2"
    s.sql("DROP TABLE IF EXISTS spec_fact_b8")
    import s.implicits._
    (1L to 100L).map(i => (i % 7, i)).toDF("k", "v")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/fact8").format("parquet").saveAsTable("spec_fact_b8")
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // 8-bucket fact vs 4-bucket dim from the previous test: Spark must
      // still answer correctly (one side re-shuffles or re-buckets)
      val j = s.table("spec_fact_b8").join(s.table("spec_dim_b"), "k")
      assert(j.count() == 100)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compaction: fewer files, identical rows, old snapshot untouched") {
    val s = spark
    import s.implicits._
    val root = "/root/repo/target/graft_test/compaction_spec"
    val df = (1L to 5000L).map(i => (i, s"r$i", i % 13)).toDF("id", "v", "g")
    df.repartition(20).write.mode("overwrite").parquet(s"$root/small")
    def files(sub: String) = new java.io.File(s"$root/$sub").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted.toSeq
    val v1 = files("small")
    assert(v1.size == 20)
    s.read.parquet(v1: _*).repartition(2)
      .write.mode("overwrite").parquet(s"$root/compact")
    val v2 = files("compact")
    assert(v2.size == 2, s"expected 2 compacted files, got ${v2.size}")
    // compaction moved every row and invented/lost none
    assert(canon(s.read.parquet(v2: _*)) == canon(df))
    // time travel to v1 still works: the old files were never rewritten
    assert(canon(s.read.parquet(v1: _*)) == canon(df))
  }

  test("deletion vector is POSITIONAL: kills one copy of two identical rows") {
    val s = spark
    import s.implicits._
    val root = "/root/repo/target/graft_test/delvec_spec"
    // two byte-identical rows (id=1) plus distinct neighbors, one file
    Seq((1L, "dup"), (1L, "dup"), (2L, "b"), (3L, "c"))
      .toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/data")
    val t = s.read.parquet(s"$root/data")
      .select(col("_metadata.file_path").as("path"),
        col("_metadata.row_index").as("pos"), col("id"), col("v"))
    // delete exactly ONE of the duplicate positions — a predicate cannot
    // express this; the vector can
    val dv = t.filter(col("id") === 1L)
      .orderBy("pos").limit(1).select("path", "pos")
    val survivors = t.join(dv, Seq("path", "pos"), "left_anti")
      .select("id", "v").collect().map(_.toString).toList.sorted
    assert(survivors == List("[1,dup]", "[2,b]", "[3,c]"),
      s"got $survivors")
  }

  test("dynamic partition overwrite touches ONLY the restated partition") {
    val s = spark
    import s.implicits._
    val root = "/root/repo/target/graft_test/dynover_spec"
    val base = Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "de", 5L),
      (4L, "de", 200L), (5L, "fr", 30L))
      .toDF("doc_id", "lang", "n_chars")
    base.write.mode("overwrite").partitionBy("lang").parquet(root)
    def partFiles(lang: String): Map[String, Long] = {
      val dir = new java.io.File(s"$root/lang=$lang")
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val enBefore = partFiles("en")
    val frBefore = partFiles("fr")
    // restate de only: drop short docs
    base.filter(col("lang") === "de" && col("n_chars") >= 100)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("lang").parquet(root)
    // untouched partitions keep the exact same files (names AND mtimes)
    assert(partFiles("en") === enBefore)
    assert(partFiles("fr") === frBefore)
    // the de partition now holds only the restated row
    val de = s.read.parquet(root).filter(col("lang") === "de")
      .select("doc_id").collect().map(_.getLong(0)).toList
    assert(de === List(4L))
    // contrast: STATIC overwrite mode truncates the whole table
    base.filter(col("lang") === "de")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("lang").parquet(root)
    val langs = s.read.parquet(root).select("lang").distinct()
      .collect().map(_.getString(0)).toList
    assert(langs === List("de"), s"static overwrite kept $langs")
  }

  test("x12 retraction IVM equals a from-scratch recompute of the post-state join") {
    // the signed-delta maintenance (insert/delete/update on BOTH sides,
    // incl. the cancellation interactions: updated order x deleted
    // customer nets to zero) must land exactly on the direct join of the
    // post-state tables — the same claim the DuckDB oracle states, proven
    // here in-engine so a gate-side SQL drift can never mask a rule bug
    val s = spark
    val d = "/root/testdata/sf0.001"
    val ivm = graft.SparkEntry.queries("x12_ivm_retract")(s, d)
    val oPost = graft.Tables.orders(s, d)
      .filter(col("o_orderkey") % 10 =!= 2)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") +
          when(col("o_orderkey") % 10 === 3, 1).otherwise(0).cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("price"))
    val cPost = graft.Tables.customer(s, d)
      .filter(col("c_custkey") % 10 =!= 4)
      .select(col("c_custkey"),
        when(col("c_custkey") % 10 === 6, "UPDATED")
          .otherwise(col("c_mktsegment")).as("segment"))
    val scratch = oPost.join(cPost, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("segment"),
        col("price").cast("double").as("price"))
    assert(canon(ivm) == canon(scratch))
    // the mixed batch really exercised every verb: some view keys deleted,
    // some updated, some inserted relative to v0
    val v0Keys = graft.Tables.orders(s, d)
      .filter(col("o_orderkey") % 10 =!= 9)
      .join(graft.Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val outKeys = ivm.select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert((v0Keys -- outKeys).nonEmpty, "no deletes took effect")
    assert((outKeys -- v0Keys).nonEmpty, "no inserts took effect")
  }

  test("x15 MAX/MIN IVM: hot set is exactly the extremum-retracting groups; purge drops out") {
    // the non-invertible-aggregate seam: the maintained view must equal
    // the from-scratch MAX/MIN/COUNT of the post-state events (proven
    // in-engine, so a gate-side SQL drift can never mask a rule bug), and
    // the hot (recompute) set must cover every group whose extremum the
    // batch retracted — by construction every (purchase, bucket) group
    // (its max row is retracted via the max-delete, point-delete, or
    // update class) and every signup group (whole-group purge).
    val s = spark
    val d = "/root/testdata/sf0.001"
    val (hotKeys, view) = graft.operators.Lakehouse.x15MinMaxIvm(s, d)
    val ev = graft.Tables.events(s, d).select(col("event_id"),
      (col("user_id") % 8).as("bucket"), col("event_type"),
      col("value").as("v"))
    val base = ev.filter(col("event_id") % 10 =!= 9)
    val isDel = col("event_id") % 10 === 2
    val isUpd = col("event_id") % 10 === 3
    val pmax = base.filter(col("event_type") === "purchase")
      .groupBy("bucket").agg(max(col("v")).as("mv"))
    val post = base.join(pmax, Seq("bucket"), "left")
      .filter(col("event_type") =!= "signup" && !isDel &&
        !coalesce(col("event_type") === "purchase" && !isDel && !isUpd &&
          col("v") === col("mv"), lit(false)))
      .withColumn("v", col("v") + when(isUpd, lit(1.0)).otherwise(lit(0.0)))
      .select("event_type", "bucket", "v")
      .unionByName(ev.filter(col("event_id") % 10 === 9 &&
        col("event_type") =!= "signup").select("event_type", "bucket", "v"))
    val scratch = post.groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n_events"),
        max(col("v")).as("max_v"), min(col("v")).as("min_v"))
    assert(canon(view) == canon(scratch),
      "maintained MAX/MIN view diverged from the from-scratch post-state aggregate")
    val hot = hotKeys.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    def groups(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
      df.select("event_type", "bucket").distinct()
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val purchaseGroups = groups(base.filter(col("event_type") === "purchase"))
    val signupGroups = groups(base.filter(col("event_type") === "signup"))
    assert(purchaseGroups.nonEmpty && signupGroups.nonEmpty, "degenerate fixture")
    assert(purchaseGroups.subsetOf(hot),
      s"extremum-retracted purchase groups missing from the hot set: " +
        s"${purchaseGroups -- hot}")
    assert(signupGroups.subsetOf(hot),
      s"purged signup groups missing from the hot set: ${signupGroups -- hot}")
    // the purge genuinely drives its groups OUT of the view
    assert(view.filter(col("event_type") === "signup").count() == 0,
      "purged groups lingered in the maintained view")
    // and the hot set is a strict subset of all groups — the cold fold
    // path is really exercised too
    assert((groups(base) -- hot).nonEmpty, "every group went hot; no cold-fold coverage")
  }

  test("f20 vacuum deletes exactly the expired-unique files; shared survive") {
    val s = spark
    val d = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("f20_vacuum")(s, d)
    val full = graft.Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    assert(canon(out) == canon(full), "retained snapshot lost rows to vacuum")
    val root = new java.io.File(s"${graft.Scratch.dir("sf0.001")}/vacuum")
    def parquets(sub: String): Seq[String] = {
      val dir = new java.io.File(root, sub)
      if (!dir.exists()) Seq.empty
      else dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.getName).toSeq
    }
    // c1 is shared between the expired v1 and the retained v2 — its files
    // must survive; c2 is referenced only by v1 — all its data files gone
    assert(parquets("c1").size == 4,
      s"shared-commit files vacuumed: ${parquets("c1")}")
    assert(parquets("c2").isEmpty,
      s"expired-unique files survived vacuum: ${parquets("c2")}")
    assert(parquets("c3").size == 2)
    assert(!new java.io.File(root, "_manifests/v1.txt").exists(),
      "expired manifest not removed")
    // idempotent under re-invocation (bench retimes re-run the builder)
    val again = graft.SparkEntry.queries("f20_vacuum")(s, d)
    assert(canon(again) == canon(full))
  }

  test("x16 change feed: net semantics on a crafted log") {
    import spark.implicits._
    // (okey, status, price, version, op) — interval is (1, latest]
    val log = Seq(
      // k1: unchanged across the interval -> no row
      (1L, "A", "10.00", 0L, "U"),
      // k2: updated at v2 -> pre+post pair
      (2L, "A", "10.00", 0L, "U"), (2L, "B", "11.00", 2L, "U"),
      // k3: deleted at v2 -> delete
      (3L, "A", "10.00", 0L, "U"), (3L, null, null, 2L, "D"),
      // k4: inserted at v2 -> insert
      (4L, "N", "5.00", 2L, "U"),
      // k5: inserted at v2 AND deleted at v3, both inside -> NOTHING
      (5L, "N", "5.00", 2L, "U"), (5L, null, null, 3L, "D"),
      // k6: deleted at v2, resurrected at v3 with IDENTICAL values -> NOTHING
      (6L, "A", "10.00", 0L, "U"), (6L, null, null, 2L, "D"),
      (6L, "A", "10.00", 3L, "U"),
      // k7: existed, deleted BEFORE the interval start -> absent both sides
      (7L, "A", "10.00", 0L, "U"), (7L, null, null, 1L, "D"))
      .toDF("okey", "status", "price0", "version", "op")
      .withColumn("price", col("price0").cast("decimal(18,2)")).drop("price0")
    val got = Lakehouse.changeFeed(log, vFrom = 1L)
      .as[(Long, String, String, Double)].collect().toSet
    assert(got == Set(
      (2L, "update_preimage", "A", 10.0),
      (2L, "update_postimage", "B", 11.0),
      (3L, "delete", "A", 10.0),
      (4L, "insert", "N", 5.0)), got.toString)
  }

  test("f23 partition evolution: day predicate prunes per spec on both layouts") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val sf = "/root/testdata/sf0.001"
    val root = graft.Scratch.dir(sf) + "/partevo"
    Lakehouse.partEvoWrite(spark, sf, root)
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case o => o.children.flatMap(scans)
    }
    def partsRead(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      df.collect()
      scans(df.queryExecution.executedPlan).map { f =>
        val gen = if (f.relation.location.rootPaths.head.toString
          .contains("gen0")) "gen0" else "gen1"
        gen -> f.metrics.get("numPartitions").map(_.value).getOrElse(-1L)
      }.toMap
    }
    // a day in generation 1 (week-partitioned): gen0 prunes to ZERO
    // day dirs, gen1 prunes to exactly the ONE containing week dir
    val late = partsRead(Lakehouse.partEvoRead(spark, root, Some("d20240120")))
    assert(late("gen0") == 0, s"gen0 read ${late("gen0")} day dirs for a gen1 day")
    assert(late("gen1") == 1, s"gen1 read ${late("gen1")} week dirs, want 1")
    // a day in generation 0: one day dir there, zero week dirs in gen1
    val early = partsRead(Lakehouse.partEvoRead(spark, root, Some("d20240103")))
    assert(early("gen0") == 1, s"gen0 read ${early("gen0")} day dirs, want 1")
    assert(early("gen1") == 0, s"gen1 read ${early("gen1")} week dirs for a gen0 day")
    // and the per-spec predicate rewrite loses nothing: filtered union ==
    // full read filtered on the data column
    val got = Lakehouse.partEvoRead(spark, root, Some("d20240120"))
      .collect().map(_.toString).toSet
    val want = Lakehouse.partEvoRead(spark, root, None)
      .filter(col("dayk") === "d20240120").collect().map(_.toString).toSet
    assert(got == want && got.nonEmpty)
  }

  test("x17 HLL-state IVM: view equals from-scratch registers; purge drops its source") {
    // the sketch-state recompute-on-retract seam: the maintained register
    // view must equal the from-scratch x5 registers of the post-state
    // corpus, every purged-source register must be hot (its extremum was
    // retracted by definition), the purged source must vanish from the
    // view, and the cold fold path must be genuinely exercised.
    val s = spark
    val d = "/root/testdata/sf0.001"
    val (hotRegs, view) = graft.operators.Lakehouse.x17HllIvm(s, d)
    val h = md5(col("tok").cast("binary"))
    val scratch = graft.Tables.documents(s, d)
      .filter(col("source") =!= "src7" && col("doc_id") % 10 =!= 2)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .select(col("source"), substring(h, 1, 2).as("bucket"),
        (graft.operators.Sketches.leadingZeroBits(substring(h, 3, 8)) + 1).as("rho"))
      .groupBy("source", "bucket").agg(max(col("rho")).cast("long").as("r"))
    assert(canon(view) == canon(scratch),
      "maintained HLL register view diverged from the from-scratch post-state registers")
    val hot = hotRegs.collect().map(r => (r.getString(0), r.getString(1))).toSet
    def regKeys(src: String): Set[(String, String)] = graft.Tables.documents(s, d)
      .filter(col("source") === src && col("doc_id") % 10 =!= 9)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .select(col("source"), substring(h, 1, 2).as("bucket")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val purgedRegs = regKeys("src7")
    assert(purgedRegs.nonEmpty, "degenerate fixture: src7 has no registers")
    assert(purgedRegs.subsetOf(hot),
      s"purged-source registers missing from the hot set: ${purgedRegs -- hot}")
    assert(view.filter(col("source") === "src7").count() == 0,
      "purged source lingered in the maintained view")
    // some stored registers stayed cold (fold path exercised) ...
    val v0regs = s.read.parquet(s"${graft.Scratch.dir(d)}/x17_view")
      .select("source", "bucket")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert((v0regs -- hot).nonEmpty, "every register went hot; no cold-fold coverage")
    // ... and some NON-purged registers went hot (the tie-detection path
    // fires on point deletes too, not only on the purge)
    assert((hot -- purgedRegs).nonEmpty, "only the purge produced hot registers")
  }

  test("es21 bucketed advance: a commit touching 1 bucket rewrites exactly 1 bucket") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("bukadv").toString
    val D2 = "decimal(12,2)"
    def frame(rows: Seq[(Long, String, Double, Long, String)]) =
      rows.toDF("okey", "status", "price0", "version", "op")
        .select(col("okey"), col("status"), col("price0").cast(D2).as("price"),
          col("version"), col("op"))
    // base spans THREE buckets of width 2^19: 0, 1, and 40 (okey ~ 21M)
    val W = Lakehouse.BUK_W
    val base = frame(Seq(
      (10L, "A", 1.0, 0L, "U"), (W + 5L, "B", 2.0, 0L, "U"),
      (40 * W + 7L, "C", 3.0, 0L, "U")))
    val m0 = Lakehouse.bucketedInit(base, s"$root/snap")
    assert(m0.keySet == Set(0L, 1L, 40L), m0.keySet.toString)
    // commit 1: update + insert, keys all inside bucket 1
    val b1 = frame(Seq((W + 5L, "B2", 9.0, 1L, "U"), (W + 6L, "N", 4.0, 1L, "U")))
    val m1 = Lakehouse.bucketedAdvance(spark, m0, b1, s"$root/snap/v1", Set(1L))
    // exactly one bucket dir exists under v1; the other manifest entries
    // are carried forward BY REFERENCE (same paths as v0)
    val v1Dirs = new java.io.File(s"$root/snap/v1").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bk=")).map(_.getName).toSet
    assert(v1Dirs == Set("bk=1"), v1Dirs.toString)
    assert(m1(0L) == m0(0L) && m1(40L) == m0(40L) && m1(1L) != m0(1L))
    // merged view is correct: update applied, insert present, others intact
    val view = Lakehouse.bucketedRead(spark, m1, m1.keySet)
      .select(col("okey"), col("status")).as[(Long, String)].collect().toSet
    assert(view == Set((10L, "A"), (W + 5L, "B2"), (W + 6L, "N"), (40 * W + 7L, "C")))
    // commit 2: insert into a FRESH key range -> touches a bucket with no
    // manifest entry; O(|batch|) write, every existing bucket untouched
    val b2 = frame(Seq((100 * W + 1L, "Z", 5.0, 2L, "U")))
    val m2 = Lakehouse.bucketedAdvance(spark, m1, b2, s"$root/snap/v2", Set(100L))
    assert(m2.keySet == m1.keySet + 100L)
    assert(m1.forall { case (k, v) => m2(k) == v })
  }

  test("OCC log: CAS exclusivity, disjoint rebase, same-partition abort") {
    import graft.sources.OccLog
    val root = java.nio.file.Files.createTempDirectory("occspec").toString
    OccLog.init(root, Map("p" -> "d/p0", "q" -> "d/q0"))
    // CAS exclusivity: N racing writers, exactly one claims v2
    val gate = new java.util.concurrent.CountDownLatch(4)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val wins = Await.result(Future.sequence((1 to 4).map(i => Future {
      gate.countDown(); gate.await()
      OccLog.tryCommit(root, 2, Map("p" -> s"d/p$i", "q" -> "d/q0"))
    })), Duration(30, "s"))
    assert(wins.count(identity) == 1, s"CAS not exclusive: $wins")
    val v2 = OccLog.readLatest(root)
    assert(v2.version == 2)
    // disjoint rebase: a writer that read v1 replaces 'q' AFTER v2
    // repointed 'p' -> rebases onto v2 and lands v3 with both changes
    val v3 = OccLog.commitReplacePartition(root, "q", "d/q9", readVersion = 1)
    assert(v3 == 3)
    val fin = OccLog.readLatest(root)
    assert(fin.entries("q") == "d/q9" && fin.entries("p") == v2.entries("p"),
      fin.entries.toString)
    // same-partition abort: a v1-snapshot writer of 'q' must NOT blindly
    // retry over v3's replacement of 'q'
    intercept[OccLog.ConflictException] {
      OccLog.commitReplacePartition(root, "q", "d/q-stale", readVersion = 1)
    }
    // ... but a writer whose snapshot already includes v3 commits fine
    assert(OccLog.commitReplacePartition(root, "q", "d/q10", readVersion = 3) == 4)
  }
}
