package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** vec_dot must be bit-identical to the HOF formulation it replaced
  * (aggregate(zip_with(a,b,_*_), 0.0, _+_) over double-cast arrays) —
  * FP addition order is part of the oracle contract. */
class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hofDot = {
    // the formulation vec_dot replaced, verbatim
    val a = transform(col("a"), x => x.cast("double"))
    val b = transform(col("b"), x => x.cast("double"))
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  }

  test("vec_dot on float arrays matches the double-cast HOF fold bit-for-bit") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(call_function("vec_dot", col("a"), col("b")).as("nd"), hofDot.as("hd"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("int8_quant matches the declarative transform/zip_with chain bit-for-bit") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    // random vectors, plus edge rows: all-zero (amax floor), exact .5
    // rounding boundaries both signs, single element, empty
    val rows = Seq.fill(60)(Array.fill(64)(rnd.nextFloat() * 2 - 1)) ++ Seq(
      Array.fill(64)(0.0f), Array(0.5f, -0.5f, 1.0f), Array(0.25f), Array.empty[Float])
    // the formulation int8_quant replaced, verbatim (s6's former body)
    val old = rows.toDF("embedding")
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("amax",
        greatest(array_max(transform(col("v"), x => abs(x))), lit(1e-12)))
      .withColumn("q", transform(col("v"),
        x => round(x * lit(127.0) / col("amax")).cast("long")))
      .withColumn("err", zip_with(col("v"), col("q"),
        (x, qq) => x - qq.cast("double") * col("amax") / lit(127.0)))
      .select(col("amax"), concat_ws(",", col("q")).as("q"),
        call_function("vec_dot", col("err"), col("err")).as("sse"))
      .collect()
    val neu = rows.toDF("embedding")
      .select(expr("int8_quant(embedding)").as("e"))
      .select(col("e.amax"), col("e.q"), col("e.sse")).collect()
    old.zip(neu).foreach { case (o, n) =>
      assert(java.lang.Double.doubleToRawLongBits(o.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(n.getDouble(0)))
      assert(o.getString(1) == n.getString(1))
      assert(java.lang.Double.doubleToRawLongBits(o.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(n.getDouble(2)))
    }
  }

  test("vec_dot on double arrays, null array, and SQL registration") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -0.25), Array(8.0, 4.0))
    ).toDF("a", "b")
    val out = df.selectExpr("vec_dot(a, b) AS d").as[Double].collect()
    assert(out.toSeq == Seq(32.0, 3.0))
    val withNull = df.select(
      call_function("vec_dot", lit(null).cast("array<double>"), col("b")))
    assert(withNull.collect().forall(_.isNullAt(0)))
  }

  test("sign_pack: codegen path matches the kernel; zero/short/long edges") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(60)(Array.fill(rnd.nextInt(80))(rnd.nextFloat() * 2 - 1)) ++
      Seq(Array.empty[Float],
        Array(0.0f, -0.0f, 1e-30f, -1e-30f),   // strict > 0: only bit 2 set
        Array.fill(64)(1f), Array.fill(70)(-1f))
    val got = rows.toDF("v")
      .select(call_function("sign_pack", col("v")).as("c")).as[Long].collect()
    rows.zip(got).foreach { case (v, c) =>
      val want = v.take(64).zipWithIndex
        .map { case (x, i) => if (x > 0f) 1L << i else 0L }
        .foldLeft(0L)(_ | _)
      assert(c == want, s"len=${v.length}")
    }
    // the documented contract rows: +/-0 are NOT positive; tiny positive
    // denormal IS; dims past 64 ignored
    assert(got(rows.length - 3) == 4L)          // only 1e-30f at index 2
    assert(got(rows.length - 2) == -1L)         // all 64 bits set
    assert(got(rows.length - 1) == 0L)          // all negative
    val n = rows.toDF("v")
      .select(call_function("sign_pack", lit(null).cast("array<float>")))
    assert(n.collect().forall(_.isNullAt(0)))
  }
}
