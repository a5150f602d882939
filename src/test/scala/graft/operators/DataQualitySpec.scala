package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the data-quality layer's verdict semantics on planted violations —
  * every constraint must count EXACTLY the rows planted to break it. */
class DataQualitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf(_: String)

  test("dq1: each planted violation is counted by exactly its constraint") {
    // 6 clean rows + targeted breakage: a null key, an out-of-range
    // quantity, a negative discount, a bogus returnflag, a zero price,
    // a pre-1992 shipdate, and one duplicated (orderkey, linenumber) pair
    val rows = Seq(
      (Some(1L), 1, 10.0, 0.05, "A", 100.0, "1995-06-01 00:00:00"),
      (Some(2L), 1, 20.0, 0.00, "N", 200.0, "1996-06-01 00:00:00"),
      (Some(3L), 1, 30.0, 0.10, "R", 300.0, "1997-06-01 00:00:00"),
      (Some(4L), 1, 40.0, 0.02, "A", 400.0, "1998-06-01 00:00:00"),
      (Some(5L), 1, 50.0, 0.03, "N", 500.0, "1999-06-01 00:00:00"),
      (Some(6L), 1, 25.0, 0.04, "R", 600.0, "1994-06-01 00:00:00"),
      (None, 1, 10.0, 0.05, "A", 100.0, "1995-06-01 00:00:00"), // null key
      (Some(7L), 1, 99.0, 0.05, "A", 100.0, "1995-06-01 00:00:00"), // qty
      (Some(8L), 1, 10.0, -0.1, "A", 100.0, "1995-06-01 00:00:00"), // disc
      (Some(9L), 1, 10.0, 0.05, "X", 100.0, "1995-06-01 00:00:00"), // flag
      (Some(10L), 1, 10.0, 0.05, "A", 0.0, "1995-06-01 00:00:00"), // price
      (Some(11L), 1, 10.0, 0.05, "A", 100.0, "1990-06-01 00:00:00"), // date
      (Some(3L), 1, 15.0, 0.05, "A", 100.0, "1995-06-01 00:00:00") // dup key
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
      "l_returnflag", "l_extendedprice", "sd")
      .withColumn("l_shipdate", col("sd").cast("timestamp")).drop("sd")

    val got = DataQuality.lineitemConstraints(rows)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(3))).toMap
    assert(got("not_null:l_orderkey") === ((1L, 0)))
    assert(got("range:l_quantity[1,50]") === ((1L, 0)))
    assert(got("range:l_discount[0,0.1]") === ((1L, 0)))
    assert(got("in_set:l_returnflag{A,N,R}") === ((1L, 0)))
    assert(got("positive:l_extendedprice") === ((1L, 0)))
    assert(got("range:l_shipdate[1992,2000)") === ((1L, 0)))
    // the duplicate group has size 2 -> 1 extra row
    assert(got("unique:(l_orderkey,l_linenumber)") === ((1L, 0)))
  }

  test("dq1: a clean table passes every constraint") {
    val rows = Seq((Some(1L), 1, 10.0, 0.05, "A", 100.0))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag", "l_extendedprice")
      .withColumn("l_shipdate", lit("1995-06-01").cast("timestamp"))
    val got = DataQuality.lineitemConstraints(rows).collect()
    assert(got.forall(_.getInt(3) == 1))
    assert(got.length === 7)
  }

  test("dq2: orphans counted per relationship; null FKs are not orphans") {
    val li = Seq((1L, 1), (1L, 2), (7L, 1), (7L, 2), (8L, 1))
      .toDF("l_orderkey", "l_linenumber")
    val ord = Seq((1L, 10L), (2L, 10L), (3L, 99L))
      .toDF("o_orderkey", "o_custkey")
    val cust = Seq(Tuple1(10L)).toDF("c_custkey")
    val got = DataQuality.referentialAudit(li, ord, cust)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // lineitem rows 7,7,8 have no order: 3 orphan rows over 2 keys
    assert(got("lineitem->orders") === ((3L, 2L)))
    // order 3 references customer 99 which does not exist
    assert(got("orders->customer") === ((1L, 1L)))
    // orders 2 and 3 have no lineitem
    assert(got("orders_without_lineitem") === ((2L, 2L)))
  }

  test("dq3: gap accounting over a day spine with a hole") {
    // days 1,2,3 then 7,8 -> one 3-day hole, max_gap 4
    val ev = Seq("2024-01-01", "2024-01-02", "2024-01-03",
        "2024-01-07", "2024-01-07", "2024-01-08")
      .map(d => ts(s"$d 12:00:00")).toDF("ts")
    val r = DataQuality.continuityAudit(ev).collect().head
    assert(r.getLong(0) === 5L) // n_days
    assert(r.getString(1) === "2024-01-01")
    assert(r.getString(2) === "2024-01-08")
    assert(r.getLong(3) === 3L) // missing days 4,5,6
    assert(r.getLong(4) === 4L) // max gap
    assert(r.getLong(5) === 6L) // events
  }

  test("dq4: QI groups below k are flagged, groups at k are not") {
    import spark.implicits._
    // 5 identical QI rows (exactly k -> safe), 2 identical (risk),
    // 1 singleton (risk); bucket edges: -0.5 lands in bucket -1
    val cust = (
      Seq.fill(5)((1, "AUTO", 1500.0)) ++
      Seq.fill(2)((2, "AUTO", 500.0)) ++
      Seq((3, "RAIL", -0.5))
    ).zipWithIndex.map { case ((n, seg, bal), i) => (i.toLong, n, seg, bal) }
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = DataQuality.kAnonymityRisks(cust)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got.size == 2)
    assert(got((2, "AUTO", 0L)) == 2L)
    assert(got((3, "RAIL", -1L)) == 1L) // floor(-0.0005) bucket, not round
  }

  test("dq5: quarantine sidecar holds exactly the malformed raw lines") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("dq5_quarantine")(spark, sf)
    val expectBad = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 13 === 0).count()
    val gotBad = out.filter(col("lang") === "__quarantined")
      .select("n_docs").collect().head.getLong(0)
    assert(gotBad == expectBad)
    // the sidecar preserves the RAW malformed lines for forensics — every
    // one carries the planted unparseable key and nothing else landed
    val side = spark.read.parquet(
      graft.Scratch.dir("sf0.001") + "/dq5/quarantine")
    val raws = side.collect().map(_.getString(0))
    assert(raws.length == expectBad)
    assert(raws.forall(_.startsWith("X")), raws.take(3).mkString("; "))
    // reconciliation: good + quarantined == every fabricated line
    val total = out.agg(sum(col("n_docs"))).collect().head.getLong(0)
    assert(total == graft.Tables.documents(spark, sf).count())
  }

  test("dq6 drift: planted length shift flags, identical distributions do not") {
    import spark.implicits._
    // 4 sources with the SAME per-source length histogram (100 docs each,
    // lengths cycling 50..950) + one SMALL source (25 docs) shifted
    // wholesale into the top bucket. The identical sources' TV vs the
    // corpus comes only from the shifted source's pull on the corpus
    // distribution — which must stay under the 1500 bp gate, while the
    // shifted source itself flags.
    val same = for {
      s <- 0 until 4; i <- 0 until 100
    } yield (s"s$s", 50L + (i % 10) * 100)
    val shifted = (0 until 25).map(_ => ("bad", 950L))
    val df = (same ++ shifted).toDF("source", "n_chars")
    val got = DataQuality.distributionDrift(df)
      .as[(String, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set("s0", "s1", "s2", "s3", "bad"))
    assert(got("bad")._3 == 1, s"shifted source not flagged: ${got("bad")}")
    (0 until 4).foreach { s =>
      assert(got(s"s$s")._3 == 0, s"uniform source s$s flagged: ${got(s"s$s")}")
    }
    // hand math (N=425, buckets 0..8 hold 40, bucket 9 holds 65):
    // bad (N_s=25, all in b9): l1 = 9*|0*425-40*25| + |25*425-65*25|
    //   = 9000 + 9000 = 18000 -> 180000000 // (2*25*425) = 8470
    assert(got("bad")._2 == 8470L, got("bad").toString)
    // s0 (N_s=100, 10/bucket): l1 = 9*|4250-4000| + |4250-6500| = 4500
    //   -> 45000000 // (2*100*425) = 529
    assert(got("s0")._2 == 529L, got("s0").toString)
  }
}
