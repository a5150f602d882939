package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** E2's substance — in-engine k-mer-spectrum read error correction.
  *
  * The reference's `preprocess` stage pipes every read through the external
  * `lighter` binary (`ReflexivDataFrameErrorCorrecter.java:551-632`,
  * `Pipelines.java:1299`) — the engine itself has no corrector. This is the
  * same spectrum idea (count k-mers; a sequencing error makes every k-mer
  * covering it rare, so patch the base whose restoration makes them solid)
  * expressed as three Catalyst stages instead of a subprocess:
  *
  *  1. SPECTRUM: canonical k-mer counts over the (noisy) read set; a k-mer
  *     is `solid` when its count >= `minSolid` (errors are singletons at
  *     any real coverage; correct k-mers are re-sampled by overlapping
  *     reads).
  *  2. CANDIDATES: for every position p and base b, the single-substitution
  *     candidate read. Scoring only needs the <=k k-mers COVERING p —
  *     k-mers not touching p are identical for every candidate of a read,
  *     so ranking by covering-solid-count difference (`delta` vs the
  *     original base at p) equals ranking by whole-read solid count at a
  *     fraction of the join volume (k vs read-length k-mers per candidate).
  *  3. SELECT: the best strict improvement (delta > 0) wins, deterministic
  *     tie-break (position asc, base asc); otherwise the read is untouched.
  *     One `row_number` window PARTITIONED BY read_id — bounded at 3·L+1
  *     rows per partition regardless of corpus size.
  *
  * Everything is string-domain `least(s, revcomp(s))` canonicalization —
  * identical semantics in DuckDB (`least`/`reverse`/`translate`), which is
  * what makes the p1 oracle exact; it also works for any k (no 31-base
  * packing limit). All joins are equality joins on the k-mer string; the
  * candidate explosion is linear in read length — no all-pairs anywhere.
  */
object ErrorCorrect {

  private def rc(c: Column): Column = reverse(translate(c, "ACGT", "TGCA"))
  private def canon(c: Column): Column = least(c, rc(c))

  /** All canonical k-mers of `c` (empty when the sequence is shorter than
    * k — Spark's `sequence(a, b)` would otherwise DESCEND for b < a). */
  private def kmersOf(c: Column, k: Int): Column =
    when(length(c) >= k,
      transform(sequence(lit(1), length(c) - k + 1), i => canon(c.substr(i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** Canonical k-mers of `c` covering position `p` (1-based). */
  private def covering(c: Column, p: Column, k: Int): Column =
    when(length(c) >= k,
      transform(
        sequence(greatest(lit(1), p - (k - 1)), least(p, length(c) - k + 1)),
        i => canon(c.substr(i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** The solid-k-mer spectrum of a read set: `(skm)` canonical k-mers with
    * count >= `minSolid`. */
  def solidSpectrum(reads: DataFrame, k: Int, minSolid: Long): DataFrame =
    reads.select(explode(kmersOf(col("read"), k)).as("skm"))
      .groupBy("skm").agg(count(lit(1)).as("sc"))
      .filter(col("sc") >= minSolid)
      .select("skm")

  /** Correct `reads` = `(read_id, read)` against their own spectrum.
    * Returns `(read_id, corrected, changed)` — `changed` 1 iff a
    * substitution strictly improved the solid covering-k-mer count. */
  def correctReads(reads: DataFrame, k: Int, minSolid: Long = 2L): DataFrame = {
    val solid = solidSpectrum(reads, k, minSolid)
    // per (read, position): the 4 single-base variants (the original base's
    // row doubles as the baseline score at that position)
    val cand = reads
      .select(col("read_id"), col("read"),
        explode(sequence(lit(1), length(col("read")))).as("p"))
      .select(col("read_id"), col("read"), col("p"),
        explode(array(lit("A"), lit("C"), lit("G"), lit("T"))).as("b"))
      .withColumn("cand", concat(
        col("read").substr(lit(1), col("p") - 1), col("b"),
        col("read").substr(col("p") + 1, length(col("read")) - col("p"))))
    // solid count over the k-mers covering p only
    val sc = cand
      .select(col("read_id"), col("read"), col("p"), col("b"), col("cand"),
        explode(covering(col("cand"), col("p"), k)).as("km"))
      .join(solid, col("km") === col("skm"), "left")
      .groupBy("read_id", "read", "p", "b", "cand")
      .agg(sum(when(col("skm").isNotNull, 1).otherwise(0)).as("c"))
    val base = sc.filter(col("b") === col("read").substr(col("p"), lit(1)))
      .select(col("read_id").as("rid2"), col("p").as("p2"), col("c").as("oc"))
    val alt = sc.filter(col("b") =!= col("read").substr(col("p"), lit(1)))
      .join(base, col("read_id") === col("rid2") && col("p") === col("p2"))
      .withColumn("delta", col("c") - col("oc"))
    val w = Window.partitionBy("read_id").orderBy(col("delta").desc, col("p"), col("b"))
    alt.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("read_id"),
        when(col("delta") > 0, col("cand")).otherwise(col("read")).as("corrected"),
        when(col("delta") > 0, 1).otherwise(0).as("changed"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- spectrum correction end-to-end, with ground truth in-query --------
    // 9 overlapping 32-base reads per synthetic genome at 4-base offsets
    // (~4.5x coverage — dense enough that every interior k-mer is
    // re-sampled by >=2 error-free reads, which is what makes it solid);
    // reads (doc_id%5==0, rid==4) get a deterministic substitution error
    // at position 16 — a position every k-mer of that read covers, and
    // which neighbor reads re-sample, so the corrector must restore it.
    // `recovered` compares against the pre-corruption truth: the oracle
    // checks not just that both engines agree on the corrections but that
    // the corrections are RIGHT (an 8-base-offset first cut passed the
    // hash gate with changed=0 everywhere — a corrector that never fires
    // — precisely because correct k-mers had only 1-fold re-sampling).
    "p1_error_correct" -> ((s, d) => {
      val g = documents(s, d).select(col("doc_id"), Genomics.dna64(col("doc_id")).as("s"))
      val r0 = g.select(col("doc_id"),
          explode(sequence(lit(1), lit(33), lit(4))).as("i"), col("s"))
        .select(col("doc_id"), expr("(i-1) div 4").cast("long").as("rid"),
          col("s").substr(col("i"), lit(32)).as("tr"))
      val reads = r0.withColumn("read",
          when(col("doc_id") % 5 === 0 && col("rid") === 4,
            concat(col("tr").substr(lit(1), lit(15)),
              translate(col("tr").substr(lit(16), lit(1)), "ACGT", "CGTA"),
              col("tr").substr(lit(17), lit(16))))
            .otherwise(col("tr")))
        .withColumn("read_id", col("doc_id") * 16 + col("rid"))
      val corr = correctReads(reads.select("read_id", "read"), 21, 2L)
      reads.join(corr, "read_id")
        .select(col("doc_id"), col("rid"), col("read"), col("corrected"),
          col("changed"),
          when(col("corrected") === col("tr"), 1).otherwise(0).as("recovered"))
    })
  )

  def oracles: Map[String, String] = Map(
    "p1_error_correct" ->
      """WITH g AS (SELECT doc_id,
        |    translate(md5(CAST(doc_id AS VARCHAR)), '0123456789abcdef', 'ACGTACGTACGTACGT')
        |    || translate(md5(CAST(doc_id AS VARCHAR) || 'x'), '0123456789abcdef', 'ACGTACGTACGTACGT') AS s
        |  FROM documents),
        |r0 AS (SELECT doc_id, CAST((i-1)//4 AS BIGINT) AS rid, substr(s, i, 32) AS tr
        |       FROM (SELECT doc_id, s, unnest(generate_series(1, 33, 4)) AS i FROM g)),
        |reads AS (SELECT doc_id*16 + rid AS read_id, doc_id, rid, tr,
        |    CASE WHEN doc_id % 5 = 0 AND rid = 4
        |      THEN substr(tr,1,15) || translate(substr(tr,16,1),'ACGT','CGTA') || substr(tr,17,16)
        |      ELSE tr END AS read
        |  FROM r0),
        |km AS (SELECT least(substr(read,i,21), reverse(translate(substr(read,i,21),'ACGT','TGCA'))) AS kmer
        |       FROM (SELECT read, unnest(generate_series(1, 12)) AS i FROM reads)),
        |solid AS (SELECT kmer FROM km GROUP BY kmer HAVING COUNT(*) >= 2),
        |pos AS (SELECT read_id, read, unnest(generate_series(1, 32)) AS p FROM reads),
        |cand AS (SELECT read_id, read, p, b,
        |    substr(read,1,p-1) || b || substr(read,p+1, 32-p) AS cand
        |  FROM pos, (SELECT unnest(['A','C','G','T']) AS b) bases),
        |ckm AS (SELECT read_id, read, p, b, cand,
        |    least(substr(cand,i,21), reverse(translate(substr(cand,i,21),'ACGT','TGCA'))) AS kmer
        |  FROM (SELECT read_id, read, p, b, cand,
        |          unnest(generate_series(greatest(1, p-20), least(p, 12))) AS i
        |        FROM cand)),
        |sc AS (SELECT c.read_id, c.read, c.p, c.b, c.cand,
        |    SUM(CASE WHEN s.kmer IS NOT NULL THEN 1 ELSE 0 END) AS c
        |  FROM ckm c LEFT JOIN solid s ON c.kmer = s.kmer
        |  GROUP BY c.read_id, c.read, c.p, c.b, c.cand),
        |o AS (SELECT read_id, p, c AS oc FROM sc WHERE b = substr(read, p, 1)),
        |alt AS (SELECT sc.*, sc.c - o.oc AS delta
        |        FROM sc JOIN o ON sc.read_id = o.read_id AND sc.p = o.p
        |        WHERE sc.b <> substr(sc.read, sc.p, 1)),
        |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY read_id
        |           ORDER BY delta DESC, p, b) AS rn FROM alt)
        |SELECT r.doc_id, r.rid, r.read,
        |  CASE WHEN b2.delta > 0 THEN b2.cand ELSE r.read END AS corrected,
        |  CASE WHEN b2.delta > 0 THEN 1 ELSE 0 END AS changed,
        |  CASE WHEN (CASE WHEN b2.delta > 0 THEN b2.cand ELSE r.read END) = r.tr
        |    THEN 1 ELSE 0 END AS recovered
        |FROM reads r JOIN best b2 ON r.read_id = b2.read_id AND b2.rn = 1""".stripMargin
  )
}
