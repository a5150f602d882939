package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text-analysis layer: token statistics, quality scoring, heuristic
  * language ID, document fingerprints, and character n-gram profiles —
  * all pure Catalyst expressions (no UDFs), so they stay inside
  * whole-stage codegen and push down column pruning to the scan.
  */
object TextOps {

  private def ws: Column = split(col("text"), " ")

  private def tokenCountIn(set: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(set)))

  private val enWords = Seq("the", "a", "of", "and", "in", "to")
  private val deWords = Seq("der", "und", "die", "das", "ein")
  private val esWords = Seq("el", "la", "de", "los", "que")
  private val frWords = Seq("le", "la", "et", "les", "des")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- token counting (whitespace + distinct + max token length) ---------
    "t1_token_stats" -> ((s, d) =>
      documents(s, d).select(
        col("doc_id"),
        size(ws).as("n_tokens"),
        size(array_distinct(ws)).as("n_distinct"),
        array_max(transform(ws, w => length(w))).as("max_tok_len"),
        length(col("text")).as("n_chars_actual"))),

    // -- quality scoring: stopword ratio, distinct ratio, length guards ----
    "t2_quality" -> ((s, d) => {
      val nt = size(ws)
      val sw = tokenCountIn(enWords)
      val dr = round(size(array_distinct(ws)).cast("double") / nt, 4)
      documents(s, d).select(
        col("doc_id"),
        nt.as("n_tokens"),
        sw.as("n_stopwords"),
        round(sw.cast("double") / nt, 4).as("stopword_ratio"),
        dr.as("distinct_ratio"),
        when(nt.between(10, 2000) && sw >= 1, 1).otherwise(0).as("quality_ok"))
    }),

    // -- heuristic language ID: stopword-list votes, deterministic argmax --
    "t3_langid" -> ((s, d) => {
      val en = tokenCountIn(enWords); val de = tokenCountIn(deWords)
      val es = tokenCountIn(esWords); val fr = tokenCountIn(frWords)
      documents(s, d).select(
        col("doc_id"), col("lang"),
        en.as("en_score"), de.as("de_score"), es.as("es_score"), fr.as("fr_score"),
        when(en >= de && en >= es && en >= fr, "en")
          .when(de >= es && de >= fr, "de")
          .when(es >= fr, "es")
          .otherwise("fr").as("predicted"))
    }),

    // -- fingerprints: exact hash + order-insensitive bag hash -------------
    "t4_fingerprint" -> ((s, d) =>
      documents(s, d).select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("exact_fp"),
        md5(concat_ws(" ", array_sort(array_distinct(ws))).cast("binary")).as("bag_fp"),
        (length(col("text")).cast("long") / 100).cast("long").as("len_bucket"))),

    // -- rolling-hash fingerprint (native expression, order-sensitive) -----
    "t6_rolling_fp" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      documents(s, d).selectExpr("doc_id", "rolling_hash(text) AS fp")
    }),

    // -- BPE-ish regex token counting (words / numbers / punct) ------------
    "t7_bpe_tokens" -> ((s, d) =>
      documents(s, d).select(
        col("doc_id"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).as("n_bpe"),
        size(split(col("text"), " ")).as("n_ws"))),

    // -- overlapping token-window chunking (training-data prep) ------------
    // 50-token chunks, stride 40 (10-token overlap between neighbors)
    "t8_chunking" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"), ws.as("w"))
        .select(col("doc_id"), col("w"),
          explode(expr("sequence(1, size(w), 40)")).as("start"))
        .select(col("doc_id"),
          (((col("start") - 1) / 40).cast("long")).as("chunk_id"),
          concat_ws(" ", slice(col("w"), col("start"), lit(50))).as("chunk"),
          least(size(col("w")) - col("start") + 1, lit(50)).cast("long").as("chunk_tokens"))
    }),

    // -- deterministic per-source stratified sampling ----------------------
    // "random" order = md5 of the id: reproducible training-mix sampling
    "t9_stratified_sample" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
      documents(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("source"), col("doc_id"), col("rk").cast("long").as("rk"))
    }),

    // -- character trigram profile per language ----------------------------
    "t5_trigrams" -> ((s, d) =>
      documents(s, d)
        .select(col("lang"), col("text"),
          explode(sequence(lit(1), length(col("text")) - 2)).as("i"))
        .select(col("lang"), expr("substring(text, i, 3)").as("g"))
        .groupBy("lang", "g").count()
        .filter(col("count") >= 50))
  )

  private def sqlVotes(set: Seq[String], name: String) =
    s"len(list_filter(string_split(text, ' '), w -> w IN (${set.map(w => s"'$w'").mkString(", ")}))) AS $name"

  def oracles: Map[String, String] = Map(
    "t1_token_stats" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |  list_max(list_transform(string_split(text, ' '), w -> length(w))) AS max_tok_len,
        |  length(text) AS n_chars_actual
        |FROM documents""".stripMargin,
    "t2_quality" ->
      s"""WITH b AS (SELECT doc_id,
         |  len(string_split(text, ' ')) AS nt,
         |  ${sqlVotes(enWords, "sw")},
         |  len(list_distinct(string_split(text, ' '))) AS nd
         |FROM documents)
         |SELECT doc_id, nt AS n_tokens, sw AS n_stopwords,
         |  round(CAST(sw AS DOUBLE) / nt, 4) AS stopword_ratio,
         |  round(CAST(nd AS DOUBLE) / nt, 4) AS distinct_ratio,
         |  CASE WHEN nt BETWEEN 10 AND 2000 AND sw >= 1 THEN 1 ELSE 0 END AS quality_ok
         |FROM b""".stripMargin,
    "t3_langid" ->
      s"""WITH v AS (SELECT doc_id, lang,
         |  ${sqlVotes(enWords, "en_score")},
         |  ${sqlVotes(deWords, "de_score")},
         |  ${sqlVotes(esWords, "es_score")},
         |  ${sqlVotes(frWords, "fr_score")}
         |FROM documents)
         |SELECT doc_id, lang, en_score, de_score, es_score, fr_score,
         |  CASE WHEN en_score >= de_score AND en_score >= es_score AND en_score >= fr_score THEN 'en'
         |       WHEN de_score >= es_score AND de_score >= fr_score THEN 'de'
         |       WHEN es_score >= fr_score THEN 'es'
         |       ELSE 'fr' END AS predicted
         |FROM v""".stripMargin,
    "t4_fingerprint" ->
      """SELECT doc_id, md5(text) AS exact_fp,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bag_fp,
        |  length(text) // 100 AS len_bucket
        |FROM documents""".stripMargin,
    "t6_rolling_fp" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split_regex(text, ''), c -> CAST(unicode(c) AS BIGINT))),
        |              (h, c) -> (h * 31 + c) % 1000000000000037) AS fp
        |FROM documents""".stripMargin,
    "t7_bpe_tokens" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe,
        |  len(string_split(text, ' ')) AS n_ws
        |FROM documents""".stripMargin,
    "t8_chunking" ->
      """SELECT doc_id, (start - 1) // 40 AS chunk_id,
        |  array_to_string(w[start:least(start + 49, len(w))], ' ') AS chunk,
        |  least(len(w) - start + 1, 50) AS chunk_tokens
        |FROM (SELECT doc_id, w, unnest(generate_series(1, len(w), 40)) AS start
        |      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))""".stripMargin,
    "t9_stratified_sample" ->
      """SELECT source, doc_id, rk FROM (
        |  SELECT source, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) WHERE rk <= 5""".stripMargin,
    "t5_trigrams" ->
      """SELECT lang, substr(text, i, 3) AS g, COUNT(*) AS count
        |FROM (SELECT lang, text, unnest(generate_series(1, length(text) - 2)) AS i
        |      FROM documents)
        |GROUP BY lang, substr(text, i, 3)
        |HAVING COUNT(*) >= 50""".stripMargin
  )
}
