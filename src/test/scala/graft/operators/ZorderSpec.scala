package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The structural half of f13's claim: the z-order layout + min/max
  * manifest skips files for boxes on EITHER dimension, where a
  * single-column sort only skips on its own column — and skipping never
  * changes the answer. */
class ZorderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mortonKey interleaves bits (locality sanity + monotone corners)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L),
      (0L, 2L), (3L, 3L), (65535L, 0L), (0L, 65535L))
      .toDF("a", "b")
      .select(col("a"), col("b"), Zorder.mortonKey(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows((0L, 0L)) == 0L)
    assert(rows((1L, 0L)) == 1L) // a-bit 0 -> z-bit 0
    assert(rows((0L, 1L)) == 2L) // b-bit 0 -> z-bit 1
    assert(rows((1L, 1L)) == 3L)
    assert(rows((2L, 0L)) == 4L)
    assert(rows((0L, 2L)) == 8L)
    assert(rows((3L, 3L)) == 15L)
    // 16 bits of each column participate
    assert(rows((65535L, 0L)) == 0x55555555L)
    assert(rows((0L, 65535L)) == 0xaaaaaaaaL)
  }

  test("z-order manifest prunes boxes on BOTH dimensions; linear layout cannot") {
    import spark.implicits._
    // a 64x64 grid: both columns uniform on [0, 64)
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b))
      .toDF("a", "b")
    val zdir = "/root/repo/target/graft_test/zorder_grid"
    val zman = Zorder.writeZordered(grid, "a", "b", zdir, nFiles = 16)
      .localCheckpoint()
    val total = zman.count()
    assert(total == 16L)
    // box on a only
    val pa = Zorder.pruneFiles(zman, 0, 7, Long.MinValue, Long.MaxValue)
    // box on b only — the case a linear sort cannot skip
    val pb = Zorder.pruneFiles(zman, Long.MinValue, Long.MaxValue, 0, 7)
    assert(pa.size < 16, s"a-box not pruned: ${pa.size}")
    assert(pb.size < 16, s"b-box not pruned: ${pb.size}")

    // same data laid out linearly (range-sorted by a only)
    val ldir = "/root/repo/target/graft_test/linear_grid"
    grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(ldir)
    val lman = spark.read.parquet(ldir)
      .select(col("_metadata.file_path").as("path"), col("a"), col("b"))
      .groupBy("path")
      .agg(min("a").as("min_a"), max("a").as("max_a"),
        min("b").as("min_b"), max("b").as("max_b"))
      .localCheckpoint()
    val la = Zorder.pruneFiles(lman, 0, 7, Long.MinValue, Long.MaxValue)
    val lb = Zorder.pruneFiles(lman, Long.MinValue, Long.MaxValue, 0, 7)
    assert(la.size < 16, "linear layout should prune on its own sort column")
    assert(lb.size == lman.count(), // every file spans the full b range
      s"linear layout unexpectedly pruned a b-only box: ${lb.size}")
  }

  test("pruned scan equals the unpruned filter (skipping never drops rows)") {
    import spark.implicits._
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b))
      .toDF("a", "b")
    val dir = "/root/repo/target/graft_test/zorder_eq"
    val man = Zorder.writeZordered(grid, "a", "b", dir, nFiles = 16)
      .localCheckpoint()
    val picked = Zorder.pruneFiles(man, 10, 20, 30, 50)
    val pruned = spark.read.parquet(picked: _*)
      .filter(col("a").between(10, 20) && col("b").between(30, 50))
      .collect().map(r => (r.getLong(r.fieldIndex("a")), r.getLong(r.fieldIndex("b")))).toSet
    val full = grid
      .filter(col("a").between(10, 20) && col("b").between(30, 50))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == full)
    assert(full.size == 11 * 21)
  }

  test("f18 dynamic partition pruning reads only the dim-selected partitions") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = Zorder.queries("f18_dpp_prune")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    // the md5-tag filter selects exactly signup + view (2 of 5 types)
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("signup", "view"))
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case o => o.children.flatMap(scans)
    }
    val factScans = scans(df.queryExecution.executedPlan)
      .filter(_.partitionFilters.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning])))
    assert(factScans.nonEmpty, "no scan carries a DynamicPruning filter")
    val m = factScans.head.metrics
    // runtime proof: 2 of the 5 event_type directories were actually read
    assert(m.contains("numPartitions"),
      s"partition metric missing; have: ${m.keys.mkString(",")}")
    assert(m("numPartitions").value == 2,
      s"expected 2 partitions read, got ${m("numPartitions").value}")
  }
}
