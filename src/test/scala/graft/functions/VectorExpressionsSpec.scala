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
}
