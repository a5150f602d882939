package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal column plumbing: media payloads are opaque `binary` columns
  * with typed metadata; decode/feature-extraction runs as a per-partition
  * batch pipeline (`mapPartitions` over the payload bytes, one decoder
  * instance per partition) so a real image/audio codec drops in without
  * changing the plan shape.
  *
  * STUB NOTE: this container has no media libraries, so the "decode" step
  * is a clearly-marked deterministic fake (byte length, md5, fake
  * dimensions derived from the byte length). The Spark-side plumbing —
  * binary schema, partition-wise batch decode, frame sampling shape — is
  * real and oracle-checked; swap `decodeStub`/`frameStub` for a codec call
  * in production.
  */
object Multimodal {

  /** STUB decoder: stands in for e.g. an image decode + EXIF read. */
  private def decodeStub(id: Long, payload: Array[Byte]): (Long, Long, String, Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val n = payload.length.toLong
    (id, n, hex, n % 640, (n * 31) % 480)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- payload -> metadata extraction via partition-wise batch decode ----
    "m1_media_meta" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, payload) => decodeStub(id, payload) })
        .toDF("doc_id", "n_bytes", "content_md5", "fake_w", "fake_h")
    }),

    // -- modality-mix report: the dataset-composition table a multimodal --
    // training mix is balanced against. Modality is derived from a
    // deterministic md5 coin (the container has no real media); byte
    // totals are the numbers a mix planner budgets with.
    "m5_modality_mix" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), octet_length(col("text")).cast("long").as("n_bytes"),
          substring(md5(col("text").cast("binary")), 1, 1).as("h"))
        .withColumn("modality",
          when(col("h").isin("0", "1", "2", "3", "4", "5"), "image")
            .when(col("h").isin("6", "7", "8", "9"), "audio")
            .when(col("h").isin("a", "b"), "video")
            .otherwise("text"))
        .groupBy("modality")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bytes")).as("total_bytes"),
          max(col("n_bytes")).as("max_bytes"))),

    // -- STUB "resize": downsample payload bytes 2:1, re-extract metadata --
    // (stands in for an image resize; the partition-wise batch shape and
    // binary in/out schema are the real plumbing)
    "m3_resize" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { case (id, payload) =>
            val out = Array.tabulate((payload.length + 1) / 2)(i => payload(2 * i))
            (id, out.length.toLong, md.digest(out).map("%02x".format(_)).mkString)
          }
        }
        .toDF("doc_id", "resized_bytes", "resized_md5")
    }),

    // -- batched "inference" plumbing: fixed batch formation + padding -----
    // the shape a GPU encoder stage needs: items grouped into batches
    // (deterministic key doc_id div 64 — batch membership must not depend
    // on partitioning), every payload zero-cost padded to the batch max
    // (here with ' ' so the oracle can rpad), one encoder call per batch
    // (the md5 stands in for the model forward pass). The per-item
    // padded_len/n_bytes output is the padding-waste report that drives
    // batch-size/bucketing decisions in a real pipeline.
    "m4_batch_encode" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .groupByKey(_._1 / 64)
        .flatMapGroups { (bid, it) =>
          val items = it.toArray.sortBy(_._1)
          val maxLen = items.map(_._2.length).max
          val md = java.security.MessageDigest.getInstance("MD5")
          items.iterator.map { case (id, p) =>
            val padded = p ++ Array.fill(maxLen - p.length)(' '.toByte)
            (id, bid, items.length.toLong, maxLen.toLong, p.length.toLong,
              md.digest(padded).map("%02x".format(_)).mkString)
          }
        }
        .toDF("doc_id", "batch_id", "batch_items", "padded_len", "n_bytes", "enc_md5")
    }),

    // -- frame sampling: 16-byte "frames", keep every 4th ------------------
    "m2_frame_sample" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.flatMap { case (id, payload) =>
            val nFrames = payload.length / 16
            (0 until nFrames).iterator
              .filter(_ % 4 == 0)
              .map { i =>
                val frame = java.util.Arrays.copyOfRange(payload, i * 16, i * 16 + 16)
                (id, i.toLong, md.digest(frame).map("%02x".format(_)).mkString)
              }
          }
        }
        .toDF("doc_id", "frame_idx", "frame_md5")
    }),

    // -- m6: perceptual-hash near-duplicate pairing ------------------------
    // image near-dup at corpus scale (the web-image-dataset problem): a
    // decode-side 60-bit signature, then EXACTLY the d11 machinery —
    // 4x15-bit band join + popcount verify ([[Dedup.simhashPairs]],
    // pigeonhole-complete for hamming<=3). The signature is a STUB pHash
    // (bit i = parity of payload bytes at positions ≡ i mod 60): like a
    // real DCT pHash it is locality-sensitive — a small payload edit
    // flips only the bits of the touched blocks — so the banded pairing
    // semantics are exercised for real; swap the stub for a codec+DCT in
    // production, the plan is unchanged. The corpus plants a
    // one-byte-edited copy of every payload; each is a hamming<=1 pair
    // the bands must find.
    "m6_phash_neardup" -> ((s, d) => {
      import s.implicits._
      val doc = documents(s, d)
      val base = doc.select(col("doc_id"), col("text"))
        .unionByName(doc.select((col("doc_id") + 400000).as("doc_id"),
          concat(substring(col("text"), 1, 6), lit("q"),
            expr("substring(text, 8)")).as("text")))
      val sigs = base
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, p) =>
          val par = new Array[Long](60)
          var i = 0
          while (i < p.length) { par(i % 60) += p(i) & 0xffL; i += 1 }
          var sig = 0L
          var b = 0
          while (b < 60) { if ((par(b) & 1L) == 1L) sig |= 1L << b; b += 1 }
          (id, sig)
        })
        .toDF("doc_id", "sig")
      Dedup.simhashPairs(sigs)
    }),

    // -- m7: ingest integrity audit + quarantine report --------------------
    // the gate a multimodal lake runs before payloads are trusted: verify
    // each payload against its manifest (declared size + content
    // checksum), classify, and report the quarantine mix per source. The
    // manifest here is derived from the corpus with PLANTED corruption
    // (doc_id % 97 == 13 carries a wrong checksum — a transfer-corruption
    // stand-in) and the declared length is the CHAR count, so any
    // multibyte payload fails the byte==declared check exactly like a
    // mis-transcoded file would. Verdict precedence: empty >
    // checksum_mismatch > size_mismatch > ok. The checksum recompute is
    // the same partition-wise batch shape as m1 (one digest instance per
    // batch, payload bytes never leave the executor); the manifest join
    // is an equi-join on doc_id.
    "m7_integrity_audit" -> ((s, d) => {
      import s.implicits._
      val doc = documents(s, d)
      // manifest the upstream transfer claims: declared char-count and a
      // checksum corrupted for the planted id class
      val manifest = doc.select(col("doc_id"),
        col("n_chars").as("declared_len"),
        when(col("doc_id") % 97 === 13, lit("0" * 32))
          .otherwise(md5(col("text").cast("binary"))).as("declared_md5"))
      val observed = doc
        .select(col("doc_id"), col("source"),
          col("text").cast("binary").as("payload"))
        .as[(Long, String, Array[Byte])]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { case (id, src, p) =>
            md.reset()
            val hex = md.digest(p).map("%02x".format(_)).mkString
            (id, src, p.length.toLong, hex)
          }
        }
        .toDF("doc_id", "source", "n_bytes", "observed_md5")
      observed.join(manifest, Seq("doc_id"))
        .withColumn("verdict",
          when(col("n_bytes") === 0, "empty")
            .when(col("observed_md5") =!= col("declared_md5"), "checksum_mismatch")
            .when(col("n_bytes") =!= col("declared_len"), "size_mismatch")
            .otherwise("ok"))
        .groupBy(col("source"), col("verdict"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("total_bytes"))
    })
  )

  def oracles: Map[String, String] = Map(
    // BYTE-exact oracle: the payload is the utf-8 encoding of `text`, so
    // octet_length gives its true byte count and DuckDB's md5(varchar)
    // hashes those same bytes — exact for ANY text, multibyte included
    // (verified by the pathological-corpus sweep, tools/patho_check.py).
    // m2/m3/m6 instead slice RAW bytes (possibly mid-codepoint), which no
    // SQL string op can express — their oracles keep the documented
    // ASCII-payload stub contract.
    // byte-exact like m1: declared_len is the CHAR count (length), the
    // observed size is the BYTE count (octet_length(encode)), and DuckDB's
    // md5(varchar) hashes the utf-8 bytes — so multibyte docs land in
    // size_mismatch and the planted % 97 = 13 class in checksum_mismatch
    // on both engines
    "m7_integrity_audit" ->
      """WITH v AS (
        |  SELECT source,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    CASE WHEN octet_length(encode(text)) = 0 THEN 'empty'
        |         WHEN doc_id % 97 = 13 THEN 'checksum_mismatch'
        |         WHEN octet_length(encode(text)) <> n_chars THEN 'size_mismatch'
        |         ELSE 'ok' END AS verdict
        |  FROM documents)
        |SELECT source, verdict, COUNT(*) AS n_docs,
        |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
        |FROM v GROUP BY source, verdict""".stripMargin,
    "m1_media_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5,
        |  octet_length(encode(text)) % 640 AS fake_w,
        |  (octet_length(encode(text)) * 31) % 480 AS fake_h
        |FROM documents""".stripMargin,
    "m5_modality_mix" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    CASE WHEN substring(md5(text), 1, 1) IN ('0','1','2','3','4','5') THEN 'image'
        |         WHEN substring(md5(text), 1, 1) IN ('6','7','8','9') THEN 'audio'
        |         WHEN substring(md5(text), 1, 1) IN ('a','b') THEN 'video'
        |         ELSE 'text' END AS modality
        |  FROM documents)
        |SELECT modality, COUNT(*) AS n_docs,
        |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |  MAX(n_bytes) AS max_bytes
        |FROM m GROUP BY modality""".stripMargin,
    "m3_resize" ->
      """SELECT doc_id,
        |  CAST((length(text) + 1) // 2 AS BIGINT) AS resized_bytes,
        |  md5(array_to_string(list_transform(
        |        generate_series(1, length(text), 2), i -> substr(text, i, 1)), '')) AS resized_md5
        |FROM documents""".stripMargin,
    "m2_frame_sample" ->
      """SELECT doc_id, i AS frame_idx, md5(substr(text, i * 16 + 1, 16)) AS frame_md5
        |FROM (SELECT doc_id, text, unnest(generate_series(0, length(text) // 16 - 1)) AS i
        |      FROM documents)
        |WHERE i % 4 = 0""".stripMargin,
    // byte-exact like m1: padded_len is the batch max in BYTES, and the
    // space padding appends single-byte chars, so the padded utf-8 string
    // has exactly the engine's padded byte array — md5(varchar) hashes it
    "m4_batch_encode" ->
      """WITH b AS (SELECT doc_id, doc_id // 64 AS batch_id, text,
        |             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents),
        |m AS (SELECT batch_id, COUNT(*) AS batch_items,
        |        CAST(MAX(n_bytes) AS BIGINT) AS padded_len
        |      FROM b GROUP BY batch_id)
        |SELECT doc_id, b.batch_id, batch_items, padded_len, n_bytes,
        |  md5(text || repeat(' ', CAST(padded_len - n_bytes AS INT))) AS enc_md5
        |FROM b JOIN m USING (batch_id)""".stripMargin,
    "m6_phash_neardup" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 400000 AS doc_id,
        |         substring(text, 1, 6) || 'q' || substring(text, 8) AS text
        |  FROM documents),
        |bits AS (
        |  SELECT doc_id, (i - 1) % 60 AS b,
        |         SUM(unicode(substring(text, i, 1))) AS sm
        |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
        |        FROM base)
        |  GROUP BY doc_id, (i - 1) % 60),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN sm % 2 = 1 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sig
        |  FROM bits GROUP BY doc_id),
        |bands AS (SELECT doc_id, sig, b, (sig >> (15*b)) & 32767 AS bv
        |          FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bs),
        |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |           x.sig AS sa, y.sig AS sb
        |         FROM bands x JOIN bands y
        |           ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id)
        |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin
  )
}
