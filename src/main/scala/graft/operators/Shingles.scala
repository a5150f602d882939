package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Typed word-n-gram generator shared by the dedup/decontamination layer.
  *
  * This is the one deliberate typed-lambda boundary in the text path
  * (same rationale as the k-mer generator, SURVEY P3): Spark's array
  * higher-order functions (`transform`, `filter`, `aggregate`) are
  * CodegenFallback — a `transform(sequence(...), i -> concat_ws(...))`
  * shingler runs INTERPRETED per element and materializes every doc's
  * full shingle array before explode. This flatMap streams shingles out
  * of a JIT-compiled loop instead (measured on d2_minhash_sig at sf0.1:
  * the interpreted-HOF shingler dominated the 5.7 s runtime; DuckDB does
  * the whole query in 0.45 s, so the HOF overhead, not the data, was the
  * cost).
  *
  * Tokenization matches `split(text, ' ')` exactly (Java split with
  * limit -1 keeps trailing empty tokens, as Spark's `split` does).
  */
object Shingles {

  /** (id, text) -> one row per NON-OVERLAPPING n-token chunk:
    * (id, pos, chunk), pos = 0-based chunk index; the final chunk may be
    * shorter. Matches `transform(sequence(1, size(ws), n), i ->
    * concat_ws(' ', slice(ws, i, n)))` with posexplode. */
  def wordChunks(df: DataFrame, n: Int,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty else {
          val ws = text.split(" ", -1)
          (0 until (ws.length + n - 1) / n).iterator.map { p =>
            val from = p * n
            val until = math.min(from + n, ws.length)
            val sb = new java.lang.StringBuilder(ws(from))
            var j = from + 1
            while (j < until) { sb.append(' ').append(ws(j)); j += 1 }
            (id, p, sb.toString)
          } }
        }
      }.toDF(idCol, "pos", "chunk")
  }

  /** (id, text) -> one row per n-word shingle: (id, sh). Docs with fewer
    * than n tokens emit nothing — same contract as the
    * `when(size(ws) >= n, transform(...)).otherwise(array())` form. */
  def wordNGrams(df: DataFrame, n: Int,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val ws = if (text == null) Array.empty[String] else text.split(" ", -1)
          if (ws.length < n) Iterator.empty
          else (0 to ws.length - n).iterator.map { i =>
            val sb = new java.lang.StringBuilder(ws(i))
            var j = 1
            while (j < n) { sb.append(' ').append(ws(i + j)); j += 1 }
            (id, sb.toString)
          }
        }
      }.toDF(idCol, "sh")
  }

  /** [[wordNGrams]] with the 0-based start-token position kept:
    * (id, pos, sh). The positional form span-level dedup needs —
    * adjacency of hit positions is what lets single-gram hits merge back
    * into maximal repeated passages. */
  def wordNGramsPos(df: DataFrame, n: Int,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val ws = if (text == null) Array.empty[String] else text.split(" ", -1)
          if (ws.length < n) Iterator.empty
          else (0 to ws.length - n).iterator.map { i =>
            val sb = new java.lang.StringBuilder(ws(i))
            var j = 1
            while (j < n) { sb.append(' ').append(ws(i + j)); j += 1 }
            (id, i.toLong, sb.toString)
          }
        }
      }.toDF(idCol, "pos", "sh")
  }

  /** [[wordNGramsPos]] with a string group key carried through:
    * (id, key, pos, sh). Carrying the key out of the generator lets
    * downstream group by (key, sh) directly instead of re-joining the
    * token-scale gram table back to the document-metadata table — at
    * corpus scale that join is a second full shuffle of the biggest
    * table in the plan. */
  def wordNGramsPosKeyed(df: DataFrame, n: Int,
                         idCol: String = "doc_id", keyCol: String = "source",
                         textCol: String = "text"): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(idCol).cast("long"), col(keyCol).cast("string"),
        col(textCol).cast("string"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, key, text) =>
          val ws = if (text == null) Array.empty[String] else text.split(" ", -1)
          if (ws.length < n) Iterator.empty
          else (0 to ws.length - n).iterator.map { i =>
            val sb = new java.lang.StringBuilder(ws(i))
            var j = 1
            while (j < n) { sb.append(' ').append(ws(i + j)); j += 1 }
            (id, key, i.toLong, sb.toString)
          }
        }
      }.toDF(idCol, keyCol, "pos", "sh")
  }
}
