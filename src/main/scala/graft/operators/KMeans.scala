package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column — the clustering half of
  * SemDedup-style semantic curation (cluster first, then dedup inside each
  * cluster — see [[Similarity.semDedup]]) and the natural trainer for the
  * IVF coarse quantizer (`s5_ivf_ann` uses a fixed seed set; a production
  * index would train it here).
  *
  * Scale design (per iteration):
  *  - the k centroids are BROADCAST — k is an absolute, caller-chosen cap,
  *    so the broadcast never grows with the corpus;
  *  - assignment is a broadcast nested-loop + one map-side partially
  *    aggregated `max(struct)` shuffle of n rows (argmax cosine without a
  *    per-vector window sort — no n×k row shuffle anywhere);
  *  - the centroid update shuffles (cell, dim) partial sums — map-side
  *    combine collapses each partition to at most k×dim rows regardless of
  *    corpus size.
  * Nothing but the k×dim centroid table ever reaches the driver, and only
  * as the RETURN value (it is the model).
  */
object KMeans {

  private def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  /** `iters` Lloyd rounds over `vectors` = `(vec_id, v)` (float or double
    * array), cosine metric (scale-invariant, so centroids need no
    * re-normalization). Seeds = the `k` lowest `vec_id`s — deterministic,
    * re-runnable. Cells that lose all members drop their centroid
    * (standard Lloyd). Returns `(cid, cv: Array[Double])`. */
  def lloyd(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    val s = vectors.sparkSession
    graft.functions.GraftFunctions.register(s)
    // the member table feeds every iteration: materialize it once
    val vs = vectors
      .select(col("vec_id"), transform(col("v"), _.cast("double")).as("v"))
      .withColumn("n2", dot(col("v"), col("v")))
      .localCheckpoint()
    var cents: DataFrame = vs.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    for (_ <- 0 until iters) {
      val cn = cents.withColumn("cn2", dot(col("cv"), col("cv")))
      // argmax cosine (centroid-id tie-break) as ONE partial aggregation:
      // max(struct(cc, -cid, v)) — (cc, -cid) is unique per centroid, so
      // the struct order never falls through to comparing v
      val assigned = vs.join(broadcast(cn), lit(true))
        .withColumn("cc", dot(col("v"), col("cv")) / sqrt(col("n2") * col("cn2")))
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cc"), (-col("cid")).as("ncid"), col("v"))).as("m"))
        .select((-col("m.ncid")).as("cid"), col("m.v").as("v"))
      // element-wise mean per cell: (cid, dim) partial sums, then fold the
      // dims back into an array ordered by position
      cents = assigned
        .select(col("cid"), posexplode(col("v")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("cv"))
    }
    cents
  }
}
