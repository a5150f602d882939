package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Similarity search over the embedding column (`Array[Float]`).
  *
  * Two paths, mirroring what a 100 TB pipeline needs:
  *  - s1: brute-force cosine top-k for a bounded QUERY SET against the full
  *    corpus — the correctness baseline. The query side is tiny and
  *    broadcast, so the "cross join" is a broadcast nested loop, never a
  *    shuffle cartesian.
  *  - s2: bucketed ANN: vectors are hashed to a 8-bit sign bucket
  *    (hyperplane LSH with standard-basis planes — pure float sign tests,
  *    no arithmetic, so the oracle is bit-exact), then top-k runs within
  *    buckets only. This is the shape that survives scale: an equi-join on
  *    the bucket id.
  *
  * Dot products fold sequentially over the array (`aggregate`/`zip_with`),
  * matching DuckDB's `list_dot_product` element order; scores are emitted
  * rounded to 4 decimals.
  */
object Similarity {

  /** Double-precision view of the embedding + its squared norm. */
  private def vecs(s: SparkSession, d: String): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    embeddings(s, d)
      .select(col("vec_id"), v.as("v"))
      .withColumn("n2", dot(col("v"), col("v")))
  }

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** 8-bit sign bucket over the first 8 dimensions (raw float sign tests —
    * deterministic across engines, no FP arithmetic). */
  private def bucketOf(emb: Column): Column =
    (0 until 8).map(j =>
      when(element_at(emb, j + 1) >= 0f, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- brute-force cosine top-5 for the query set (vec_id % 50 == 0) -----
    "s1_knn_brute" -> ((s, d) => {
      val all = vecs(s, d)
      val q = all.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("n2").as("qn2"))
      val scored = all.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("c", dot(col("qv"), col("v")) / sqrt(col("qn2") * col("n2")))
      val w = Window.partitionBy(col("q_id")).orderBy(col("c").desc, col("vec_id"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("vec_id").as("neighbor"), col("rnk").cast("long").as("rnk"),
          round(col("c"), 4).as("score"))
    }),

    // -- bucketed ANN: equi-join on sign bucket, top-3 within bucket -------
    "s2_knn_bucket" -> ((s, d) => {
      val all = embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"),
          bucketOf(col("embedding")).as("bkt"))
        .withColumn("n2", dot(col("v"), col("v")))
      val r = all.select(col("bkt").as("bkt2"), col("vec_id").as("neighbor"),
        col("v").as("v2"), col("n2").as("m2"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("c").desc, col("neighbor"))
      all.join(r, col("bkt") === col("bkt2") && col("vec_id") =!= col("neighbor"))
        .withColumn("c", dot(col("v"), col("v2")) / sqrt(col("n2") * col("m2")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("vec_id"), col("neighbor"), col("rnk").cast("long").as("rnk"), round(col("c"), 4).as("score"))
    }),

    // -- embedding-cosine near-dup: bucketed pairs above threshold ---------
    // corpus augmented with exact copies (vec_id + 10000) the near-dup
    // pass must find; bucket equi-join keeps it cartesian-free
    "s4_embedding_neardup" -> ((s, d) => {
      val base = embeddings(s, d)
      val aug = base.union(base.withColumn("vec_id", col("vec_id") + 10000))
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"),
          bucketOf(col("embedding")).as("bkt"))
        .withColumn("n2", dot(col("v"), col("v")))
      val r = aug.select(col("bkt").as("bkt2"), col("vec_id").as("b"),
        col("v").as("v2"), col("n2").as("m2"))
      aug.join(r, col("bkt") === col("bkt2") && col("vec_id") < col("b"))
        .withColumn("c", dot(col("v"), col("v2")) / sqrt(col("n2") * col("m2")))
        .filter(col("c") >= 0.999)
        .select(col("vec_id").as("a"), col("b"), round(col("c"), 4).as("score"))
    }),

    // -- IVF ANN: coarse quantizer (broadcast centroids) + in-cell search --
    // centroids = deterministic subset (vec_id % 97 == 0); every vector is
    // assigned to its nearest centroid (argmax cosine, centroid-id
    // tie-break), queries search only their own cell (nprobe=1)
    "s5_ivf_ann" -> ((s, d) => {
      val all = vecs(s, d)
      val cents = all.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("n2").as("cn2"))
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("cc").desc, col("cid"))
      val assigned = all.join(broadcast(cents), lit(true))
        .withColumn("cc", dot(col("v"), col("cv")) / sqrt(col("n2") * col("cn2")))
        .withColumn("arn", row_number().over(wAssign))
        .filter(col("arn") === 1)
        .select(col("vec_id"), col("v"), col("n2"), col("cid").as("cell"))
      val q = assigned.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("n2").as("qn2"), col("cell"))
      val wTop = Window.partitionBy(col("q_id")).orderBy(col("c").desc, col("vec_id"))
      q.join(assigned, Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("c", dot(col("qv"), col("v")) / sqrt(col("qn2") * col("n2")))
        .withColumn("rnk", row_number().over(wTop))
        .filter(col("rnk") <= 3)
        .select(col("q_id"), col("vec_id").as("neighbor"), col("rnk").cast("long").as("rnk"),
          round(col("c"), 4).as("score"))
    }),

    // -- per-vector L2 norm + bucket id (sanity surface for the ANN path) --
    "s3_vector_stats" -> ((s, d) =>
      embeddings(s, d).select(
        col("vec_id"),
        col("label"),
        round(sqrt(dot(transform(col("embedding"), x => x.cast("double")),
          transform(col("embedding"), x => x.cast("double")))), 4).as("l2"),
        bucketOf(col("embedding")).as("bkt")))
  )

  private val sqlBucket = (0 until 8)
    .map(j => s"CASE WHEN embedding[${j + 1}] >= 0 THEN ${1 << j} ELSE 0 END")
    .mkString(" + ")

  def oracles: Map[String, String] = Map(
    "s1_knn_brute" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM e),
        |q AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM n WHERE vec_id % 50 = 0),
        |sc AS (SELECT q_id, vec_id AS neighbor,
        |         list_dot_product(qv, v) / sqrt(qn2 * n2) AS c
        |       FROM q, n WHERE vec_id <> q_id),
        |r AS (SELECT q_id, neighbor, c,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor) AS rnk
        |      FROM sc)
        |SELECT q_id, neighbor, rnk, round(c, 4) AS score FROM r WHERE rnk <= 5""".stripMargin,
    "s2_knn_bucket" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, $sqlBucket AS bkt FROM embeddings),
         |n AS (SELECT vec_id, v, bkt, list_dot_product(v, v) AS n2 FROM e),
         |sc AS (SELECT a.vec_id, b.vec_id AS neighbor,
         |         list_dot_product(a.v, b.v) / sqrt(a.n2 * b.n2) AS c
         |       FROM n a JOIN n b ON a.bkt = b.bkt AND a.vec_id <> b.vec_id),
         |r AS (SELECT vec_id, neighbor, c,
         |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, neighbor) AS rnk
         |      FROM sc)
         |SELECT vec_id, neighbor, rnk, round(c, 4) AS score FROM r WHERE rnk <= 3""".stripMargin,
    "s4_embedding_neardup" ->
      s"""WITH aug AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 10000, embedding FROM embeddings),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v, $sqlBucket AS bkt FROM aug),
         |n AS (SELECT vec_id, v, bkt, list_dot_product(v, v) AS n2 FROM e),
         |sc AS (SELECT a.vec_id AS a, b.vec_id AS b,
         |         list_dot_product(a.v, b.v) / sqrt(a.n2 * b.n2) AS c
         |       FROM n a JOIN n b ON a.bkt = b.bkt AND a.vec_id < b.vec_id)
         |SELECT a, b, round(c, 4) AS score FROM sc WHERE c >= 0.999""".stripMargin,
    "s5_ivf_ann" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM e),
        |cents AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM n WHERE vec_id % 97 = 0),
        |assigned AS (
        |  SELECT vec_id, v, n2, cid AS cell FROM (
        |    SELECT n.vec_id, n.v, n.n2, c.cid,
        |      ROW_NUMBER() OVER (PARTITION BY n.vec_id
        |        ORDER BY list_dot_product(n.v, c.cv) / sqrt(n.n2 * c.cn2) DESC, c.cid) AS arn
        |    FROM n CROSS JOIN cents c) WHERE arn = 1),
        |q AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2, cell
        |      FROM assigned WHERE vec_id % 50 = 0),
        |sc AS (SELECT q.q_id, a.vec_id AS neighbor,
        |         list_dot_product(q.qv, a.v) / sqrt(q.qn2 * a.n2) AS c
        |       FROM q JOIN assigned a ON q.cell = a.cell AND a.vec_id <> q.q_id),
        |r AS (SELECT q_id, neighbor, c,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor) AS rnk
        |      FROM sc)
        |SELECT q_id, neighbor, rnk, round(c, 4) AS score FROM r WHERE rnk <= 3""".stripMargin,
    "s3_vector_stats" ->
      s"""SELECT vec_id, label,
         |  round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 4) AS l2,
         |  $sqlBucket AS bkt
         |FROM embeddings""".stripMargin
  )
}
