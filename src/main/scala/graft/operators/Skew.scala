package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join handles most cases at
  * runtime; explicit salting remains the tool when one key dominates so
  * badly that even split shuffle blocks overwhelm a task, or when the
  * skewed side feeds a non-AQE-eligible operator.
  */
object Skew {

  /** Salted inner equi-join: the big side gets a deterministic per-row
    * salt in [0, r), the small side is replicated r times, and the join
    * key becomes (key, salt) — a hot key's rows spread over r tasks.
    * Result rows are identical to a plain inner join on `key`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, r: Int): DataFrame = {
    require(r > 0)
    val bigCols = big.columns.map(col)
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(bigCols.toIndexedSeq: _*), lit(r)).cast("int"))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(r - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (salted) aggregation: pre-aggregate on (key, salt), then
    * final-aggregate on key. For algebraic aggregates this is what
    * partial aggregation already does; exposed for the cases where an
    * explicit intermediate (e.g. before a window) is wanted. */
  def twoPhaseCount(df: DataFrame, key: String, r: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(r)).cast("int"))
    salted.groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum(col("_partial")).as("n"))
  }
}
