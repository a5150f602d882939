package graft.sources

import java.io.{InputStream, OutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, Path}

/** Block-indexed LZ4 container (`.gb4z`) — a SPLITTABLE compressed text
  * format, closing the one seam generic stream codecs leave open: a
  * gzip/zstd member has no addressable interior, so a compressed shard is
  * one task no matter its size (see [[FastqScan.planInputPartitions]]'s
  * whole-file fallback). This container makes byte-range splitting legal
  * again, the same capability the reference delegates to its block-codec
  * input format (reference: hadoop-4mc — an external artifact; the format
  * here is our own):
  *
  *   header   8 B magic "GB4ZHDR2"
  *   block*   [compLen: Int BE][rawLen: Int BE][crc32: Int BE][payload]
  *   footer   [blockOffset: Long BE]*n  [n: Int BE]  8 B magic "GB4ZIDX1"
  *
  * crc32 covers the COMPRESSED payload bytes (java.util.zip.CRC32 — the
  * gzip polynomial): a flipped storage byte is detected BEFORE
  * decompression instead of silently decoding to garbage records (LZ4 has
  * no internal integrity check; a corrupted block usually still
  * "decompresses"). Readers validate every block and fail with the file +
  * block offset; [[verifyBlocks]] is the quarantine route — it classifies
  * each block good/bad without throwing, so corrupt shards can be
  * sidelined dq5-style while healthy blocks keep flowing.
  *
  * Two invariants carry the split contract:
  *  - blocks are RECORD-aligned: the writer only cuts a block at a record
  *    boundary (`recordLines` lines), so any block decodes to whole
  *    records and a reader needs no mid-record sync heuristics;
  *  - the footer indexes every block's byte offset, so the PLANNER (one
  *    tail read per file, file-count-bounded driver work) can hand each
  *    task an exact consecutive block range — tasks seek straight to
  *    their first block and never scan for a boundary.
  *
  * At 100 TB this is the difference between one task per shard and
  * shard-size-independent parallelism on compressed text ingest. LZ4 is
  * the block codec (lz4-java ships with Spark); the safe decompressor
  * bounds output by the recorded rawLen, so a corrupt header cannot
  * balloon allocation.
  */
object BlockLz4 {
  val Extension = ".gb4z"
  private val HeaderMagic = "GB4ZHDR2".getBytes("US-ASCII")
  private val FooterMagic = "GB4ZIDX1".getBytes("US-ASCII")

  private def factory = net.jpountz.lz4.LZ4Factory.fastestInstance()

  private def crc32(bytes: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32()
    c.update(bytes)
    c.getValue.toInt
  }

  /** Stream `lines` into a container at `path` (created/overwritten),
    * cutting blocks at record boundaries once `blockBytes` of raw text
    * has accumulated. Single-writer (call per task with a task-unique
    * path); returns the block count. */
  def writeFile(conf: Configuration, path: String, lines: Iterator[String],
                blockBytes: Int = 256 * 1024, recordLines: Int = 4): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try writeStream(out, lines, blockBytes, recordLines)
    finally out.close()
  }

  private def writeInt(out: OutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }
  private def writeLong(out: OutputStream, v: Long): Unit = {
    writeInt(out, (v >>> 32).toInt); writeInt(out, v.toInt)
  }

  private def writeStream(out: OutputStream, lines: Iterator[String],
                          blockBytes: Int, recordLines: Int): Int = {
    val comp = factory.fastCompressor()
    out.write(HeaderMagic)
    var offset = HeaderMagic.length.toLong
    var offsets = Vector.empty[Long]
    val buf = new java.io.ByteArrayOutputStream(blockBytes + 4096)
    var lineInRecord = 0
    def flush(): Unit = if (buf.size() > 0) {
      val raw = buf.toByteArray
      val packed = comp.compress(raw)
      offsets :+= offset
      writeInt(out, packed.length)
      writeInt(out, raw.length)
      writeInt(out, crc32(packed))
      out.write(packed)
      offset += 12L + packed.length
      buf.reset()
    }
    lines.foreach { l =>
      buf.write(l.getBytes("UTF-8")); buf.write('\n')
      lineInRecord = (lineInRecord + 1) % recordLines
      if (lineInRecord == 0 && buf.size() >= blockBytes) flush()
    }
    flush()
    offsets.foreach(writeLong(out, _))
    writeInt(out, offsets.length)
    out.write(FooterMagic)
    offsets.length
  }

  /** Distributed container sink: each partition of `lines` (a
    * single-string-column frame) writes ONE task-local `.gb4z` shard —
    * the compressed analogue of `df.write.text(dir)`, and each shard is
    * itself block-splittable on read, so the layout parallelizes twice:
    * across shards AND within a shard. CONTRACT: records must not
    * straddle partitions — callers repartition BEFORE fabricating the
    * `recordLines`-line records (the es12 convention), exactly as for
    * the plain-text FASTQ sink. Overwrite semantics: the directory is
    * cleared on the driver first (file-count-bounded). */
  def writeDir(lines: org.apache.spark.sql.DataFrame, dir: String,
               blockBytes: Int = 256 * 1024, recordLines: Int = 4): Unit = {
    val conf = lines.sparkSession.sessionState.newHadoopConf()
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) { fs.delete(p, true); () }
    fs.mkdirs(p)
    // ship the SESSION's Hadoop conf into the tasks (same pattern as
    // FastqScan.createReaderFactory): a fresh executor-side Configuration
    // would silently drop non-default filesystem settings — s3a
    // credentials, custom FS impls — and write to the wrong place
    val sconf = new org.apache.spark.util.SerializableConfiguration(conf)
    lines.select(lines.columns.head).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          writeFile(sconf.value, f"$dir/part-$pid%05d$Extension",
            it.map(_.getString(0)), blockBytes, recordLines)
          ()
        }
    }
  }

  /** Exactly-once STREAMING batch sink: write one microbatch of `lines`
    * as task-local container shards named `batch-<id>-part-<pid>.gb4z`,
    * then commit the batch by writing a `_manifest-<id>` file listing its
    * shards (tmp write + atomic rename — a reader sees the whole manifest
    * or none of it). Exactly-once falls out of determinism + gating:
    *  - a task RETRY overwrites its own (batchId, partitionId) name;
    *  - a batch REPLAY after restart (foreachBatch re-delivery) rewrites
    *    the same shard names and re-commits the same manifest —
    *    idempotent, no duplicates;
    *  - a batch that DIED before its manifest commit leaves orphan shards
    *    that [[committedShards]] never lists — no partial batch is ever
    *    read ([[GenomicsIO]] es20 gates this; Gb4zSinkSpec kills/replays).
    * Manifests start with '_' so directory-level scans skip them. Returns
    * the committed shard names (task-count-bounded driver data). */
  def writeBatch(lines: org.apache.spark.sql.DataFrame, dir: String,
                 batchId: Long, blockBytes: Int = 256 * 1024,
                 recordLines: Int = 4): Seq[String] = {
    val spark = lines.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val sconf = new org.apache.spark.util.SerializableConfiguration(conf)
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p)
    import spark.implicits._
    val shards = lines.select(lines.columns.head).mapPartitions { it =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val name = f"batch-$batchId%05d-part-$pid%05d$Extension"
        writeFile(sconf.value, s"$dir/$name",
          it.map(_.getString(0)), blockBytes, recordLines)
        Iterator.single(name)
      } else Iterator.empty
    }.collect().sorted.toSeq
    val mf = new Path(p, f"_manifest-$batchId%05d")
    val tmp = new Path(p, f"._manifest-$batchId%05d.tmp")
    val out = fs.create(tmp, true)
    try out.write(shards.mkString("", "\n", "").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(mf)) fs.delete(mf, false)
    require(fs.rename(tmp, mf), s"manifest commit rename failed for batch $batchId")
    shards
  }

  /** The manifest-gated read set: shard names listed by every committed
    * `_manifest-*` in `dir`, as a single Hadoop `{a,b,...}` alternation
    * glob rooted at the dir (the fastq source takes one path). Orphan
    * shards from uncommitted batches are invisible by construction. */
  def committedShardsGlob(conf: Configuration, dir: String): Option[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val names = fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.startsWith("_manifest-"))
      .sortBy(_.getPath.getName)
      .flatMap { m =>
        val in = fs.open(m.getPath)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty).toVector
        finally in.close()
      }
    if (names.isEmpty) None else Some(s"$dir/{${names.mkString(",")}}")
  }

  /** Footer read: (block offsets, first footer byte). One 12-byte tail
    * read + one offsets read — the planner's whole per-file cost. Every
    * field is sanity-checked with a descriptive message BEFORE any seek
    * derived from it: a corrupt footer must name the file and the bad
    * field, not surface later as a negative-seek or OOM-sized allocation
    * deep inside planning. A ZERO-LENGTH file is reported as an empty
    * container (no offsets) rather than an error — an in-flight writer's
    * just-created shard should be skippable by planners, while a
    * truncated non-empty file is always a hard error. */
  def footerOffsets(conf: Configuration, path: String): (Seq[Long], Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    if (len == 0L) return (Seq.empty, 0L)
    val in = fs.open(p)
    try {
      require(len >= HeaderMagic.length + 12L,
        s"$path: $len bytes is too short for a $Extension container " +
          s"(min ${HeaderMagic.length + 12}: header + empty footer); truncated?")
      val hdr = new Array[Byte](HeaderMagic.length)
      in.readFully(hdr)
      require(java.util.Arrays.equals(hdr, HeaderMagic),
        s"$path: bad $Extension header magic " +
          s"'${new String(hdr, "US-ASCII")}' (expected 'GB4ZHDR2')")
      in.seek(len - 12)
      val n = in.readInt()
      val magic = new Array[Byte](8)
      in.readFully(magic)
      require(java.util.Arrays.equals(magic, FooterMagic),
        s"$path: missing $Extension footer magic; truncated or not a container")
      require(n >= 0 && HeaderMagic.length + 12L + 8L * n <= len,
        s"$path: footer block count $n is impossible for a $len-byte file; corrupt footer")
      val footerStart = len - 12 - 8L * n
      in.seek(footerStart)
      val offs = (0 until n).map(_ => in.readLong())
      offs.zipWithIndex.foreach { case (o, i) =>
        require(o >= HeaderMagic.length && o < footerStart,
          s"$path: footer offset[$i]=$o outside the block region " +
            s"[${HeaderMagic.length}, $footerStart); corrupt footer")
      }
      (offs, footerStart)
    } finally in.close()
  }

  /** One block's verification verdict from [[verifyBlocks]]. */
  case class BlockReport(offset: Long, ok: Boolean, error: String)

  /** Quarantine route: CRC-validate every block of a container WITHOUT
    * throwing on payload corruption — returns one [[BlockReport]] per
    * block so callers can sideline the bad ones (dq5's PERMISSIVE-parse
    * pattern at the storage layer) while healthy blocks keep flowing.
    * Footer corruption still throws (there is no per-block recovery
    * without an index). File-sized sequential read; run it task-side. */
  def verifyBlocks(conf: Configuration, path: String): Seq[BlockReport] = {
    val (offs, footerStart) = footerOffsets(conf, path)
    if (offs.isEmpty) return Seq.empty
    val fs = new Path(path).getFileSystem(conf)
    val in = fs.open(new Path(path))
    try offs.zipWithIndex.map { case (o, i) =>
      val end = if (i + 1 < offs.length) offs(i + 1) else footerStart
      try {
        in.seek(o)
        val compLen = in.readInt()
        val rawLen = in.readInt()
        val crc = in.readInt()
        require(compLen >= 0 && o + 12L + compLen <= end,
          s"block header says $compLen payload bytes but the next block starts at $end")
        require(rawLen >= 0, s"negative rawLen $rawLen")
        val packed = new Array[Byte](compLen)
        in.readFully(packed)
        val got = crc32(packed)
        require(got == crc,
          f"crc mismatch: stored 0x$crc%08x, computed 0x$got%08x")
        // decompression bound-check comes free: safeDecompressor caps at rawLen
        factory.safeDecompressor().decompress(packed, rawLen)
        BlockReport(o, ok = true, "")
      } catch {
        case e: Exception =>
          BlockReport(o, ok = false,
            s"$path block@$o: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    finally in.close()
  }

  /** Decompressed view of the consecutive blocks whose offsets lie in
    * [start, end): seeks to `start` (a block boundary from the footer)
    * and serves raw bytes block by block. close() closes `raw` — the
    * wrapping LineReader's close() must release the file handle exactly
    * as it does on the uncompressed path, or every container split
    * leaks one fd per task. */
  def rangeStream(raw: FSDataInputStream, start: Long, end: Long,
                  name: String = "<gb4z>"): InputStream =
    new InputStream {
      override def close(): Unit = raw.close()
      private val decomp = factory.safeDecompressor()
      private var pos = start
      private var block: Array[Byte] = Array.emptyByteArray
      private var at = 0
      private def readInt(): Int = {
        val b = new Array[Byte](4)
        raw.readFully(b)
        ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) |
          ((b(2) & 0xff) << 8) | (b(3) & 0xff)
      }
      private def advance(): Boolean = {
        if (pos >= end) return false
        raw.seek(pos)
        val compLen = readInt()
        val rawLen = readInt()
        val crc = readInt()
        require(compLen >= 0 && pos + 12L + compLen <= end,
          s"$name block@$pos: header says $compLen payload bytes, past the " +
            s"split end $end; corrupt block header")
        val packed = new Array[Byte](compLen)
        raw.readFully(packed)
        val got = crc32(packed)
        require(got == crc,
          f"$name block@$pos: crc mismatch (stored 0x$crc%08x, computed " +
            f"0x$got%08x) — corrupt storage; quarantine via BlockLz4.verifyBlocks")
        block = decomp.decompress(packed, rawLen)
        at = 0
        pos += 12L + compLen
        true
      }
      override def read(): Int = {
        while (at >= block.length) if (!advance()) return -1
        val b = block(at) & 0xff
        at += 1
        b
      }
      override def read(dst: Array[Byte], off: Int, len: Int): Int = {
        while (at >= block.length) if (!advance()) return -1
        val n = math.min(len, block.length - at)
        System.arraycopy(block, at, dst, off, n)
        at += n
        n
      }
    }
}
