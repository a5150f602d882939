package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.{InputSplit, JobContext, RecordReader, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.input.{FileInputFormat, FileSplit}

/** `.4mc`-style block-LZ4 container + the Hadoop text input format that
  * reads it — the reference's DEFAULT input codec seam closed literally:
  * `-inputformat graft.sources.FourMcTextInputFormat` goes through
  * [[graft.sources.Fastq.readLinesWithFormat]] UNCHANGED, exactly as the
  * reference passes `com.fing.mapreduce.FourMcTextInputFormat`
  * (reference: `ReflexivDataFrameDecompresser.java:4,205`).
  *
  * Format (the public 4mc design — github.com/fingltd/4mc: LZ4 block
  * compression, XXHash32 integrity, a block-offset index making the file
  * byte-range splittable):
  *
  *   header   MAGIC "4MC\0" | version: Int BE = 2 | XXH32(first 8 bytes)
  *   block*   [rawLen: Int BE][compLen: Int BE][XXH32(payload): Int BE][payload]
  *            (payload stored UNCOMPRESSED when LZ4 gains nothing, marked
  *             by compLen == rawLen — the 4mc incompressible-block rule)
  *   footer   [footerLen: Int BE][version: Int BE]
  *            [blockOffset: Long BE]*n [totalRawBytes: Long BE]
  *            [XXH32(footerLen..totalRawBytes)]
  *            [footerLen: Int BE (copy)] [MAGIC]
  *
  * The trailing footerLen copy sits at the FIXED position len-8, so the
  * footer is located with one 8-byte tail read and then read exactly
  * sized — no probing, no tail-size cap on the footer (a >4 MiB footer,
  * ~134 GB of 256 KiB blocks, was previously rejected as corrupt), and
  * no way for a payload int that happens to equal 8n+28 to derail
  * discovery (ADVICE r11). footerLen = 8n + 28 covers the whole trailer
  * including the copy+magic, so the trailer spans exactly footerLen
  * bytes ending at EOF.
  *
  * FIDELITY NOTE: the reference repo does NOT ship the 4mc source
  * in-tree (`/root/reference/hadoop-4mc` holds only an IDE module file;
  * the code is an unresolvable external Maven artifact), so this
  * container follows the public project's documented DESIGN (LZ4
  * blocks, XXH32 integrity, indexed footer) but is NOT byte-compatible
  * with files produced by `com.fing.mapreduce` — the exact field
  * layout could not be verified offline (zero egress, no sample
  * binary), and the fixed-position footerLen copy above is this
  * implementation's own self-describing choice. Treat `.4mc` here as
  * "this engine's splittable LZ4 line container in the 4mc style";
  * what IS pinned is the structure, the split semantics below, and the
  * writer/reader round-trip at every split granularity (FourMcSpec's
  * split grid + the f24 oracle gate).
  *
  * Unlike `.gb4z` (record-aligned blocks), blocks here cut at ARBITRARY
  * byte positions — lines straddle blocks, as in the real codec — so the
  * record reader implements the standard block-codec line-ownership rule:
  * a line belongs to the split owning the BLOCK ITS FIRST BYTE LIVES IN.
  * A reader whose range starts at block i first decompresses block i-1
  * (ONE block, bounded) to learn whether block i begins mid-line (drop
  * the partial — it belongs upstream) or on a fresh line (keep it), and
  * reads past its range end only until its last owned line completes.
  * Each line is thus emitted by exactly one split, with no sync markers
  * and no driver state. */
object FourMc {
  val Extension = ".4mc"
  private[sources] val Magic = Array[Byte]('4', 'M', 'C', 0)
  /** Container version. 2 = the round-12 footer layout (fixed-position
    * footerLen copy at len-8); version-1 files (the pre-r12 probed-footer
    * layout) are NOT readable — the version is validated on open so a
    * stale v1 file fails with a format-version message instead of a
    * misleading "missing trailing magic" (ADVICE r12). */
  private[sources] val Version = 2

  /** Hard cap on a block's RAW size: bounds the allocation a (possibly
    * corrupt or hostile) 12-byte block header can demand BEFORE any
    * checksum runs (ADVICE r11 — a bogus rawLen could otherwise ask for
    * ~2 GiB). 64 MiB is 256x the default block and far above any sane
    * split-friendly setting. Enforced symmetrically at write time. */
  private[sources] val MaxBlockBytes = 64 * 1024 * 1024

  private def lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance()

  private[sources] def xxh32(bytes: Array[Byte], off: Int, len: Int): Int =
    net.jpountz.xxhash.XXHashFactory.fastestInstance().hash32()
      .hash(bytes, off, len, 0)

  private def be(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def beL(v: Long): Array[Byte] = be((v >>> 32).toInt) ++ be(v.toInt)

  /** Write `lines` as one `.4mc` file; blocks cut at exact `blockBytes`
    * raw-byte boundaries (mid-line — the real codec's behavior). Returns
    * the block count. Single-writer per path (call per task). */
  def writeFile(conf: Configuration, path: String, lines: Iterator[String],
                blockBytes: Int = 256 * 1024): Int = {
    require(blockBytes > 0 && blockBytes <= MaxBlockBytes,
      s"blockBytes must be in (0, $MaxBlockBytes], got $blockBytes")
    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    val comp = lz4.fastCompressor()
    try {
      val hdr = Magic ++ be(Version)
      out.write(hdr); out.write(be(xxh32(hdr, 0, hdr.length)))
      var offset = 12L
      var offsets = Vector.empty[Long]
      var totalRaw = 0L
      val buf = new java.io.ByteArrayOutputStream(blockBytes + 4096)
      def emit(raw: Array[Byte]): Unit = {
        val packed = comp.compress(raw)
        val (payload, stored) =
          if (packed.length >= raw.length) (raw, raw.length)
          else (packed, packed.length)
        offsets :+= offset
        out.write(be(raw.length)); out.write(be(stored))
        out.write(be(xxh32(payload, 0, payload.length)))
        out.write(payload, 0, stored)
        offset += 12L + stored
        totalRaw += raw.length
      }
      def drainFull(): Unit = while (buf.size() >= blockBytes) {
        val all = buf.toByteArray
        emit(java.util.Arrays.copyOfRange(all, 0, blockBytes))
        buf.reset()
        if (all.length > blockBytes)
          buf.write(all, blockBytes, all.length - blockBytes)
      }
      lines.foreach { l =>
        buf.write(l.getBytes("UTF-8")); buf.write('\n')
        drainFull()
      }
      if (buf.size() > 0) emit(buf.toByteArray)
      val body = offsets.toArray.flatMap(beL) ++ beL(totalRaw)
      val fl = body.length + 20 // whole trailer incl. checksum + copy + magic
      val footer = be(fl) ++ be(Version) ++ body
      out.write(footer); out.write(be(xxh32(footer, 0, footer.length)))
      out.write(be(fl)) // fixed-position copy at len-8: locates the footer
      out.write(Magic)
      offsets.length
    } finally out.close()
  }

  /** Footer read: (block offsets, first block-region-end byte). The
    * fixed-position footerLen copy at len-8 locates the trailer in one
    * 8-byte tail read; the trailer is then read exactly sized and
    * checksum-validated, so footers of ANY size (footerLen is bounded
    * only by the file itself) are handled and a coincidental payload int
    * can never masquerade as the footer (ADVICE r11 — the old ascending
    * probe had both defects). Every derived seek is bounds-checked with
    * the file named. */
  def footerOffsets(conf: Configuration, path: String): (Seq[Long], Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len >= 40L, // header 12 + minimal (0-block) trailer 28
      s"$path: $len bytes is too short for a $Extension file (min 40); truncated?")
    val in = fs.open(p)
    try {
      val hdr = new Array[Byte](12)
      in.readFully(hdr)
      require(hdr.take(4).sameElements(Magic),
        s"$path: bad $Extension magic; not a 4mc file")
      require(xxh32(hdr, 0, 8) == java.nio.ByteBuffer.wrap(hdr, 8, 4).getInt,
        s"$path: header checksum mismatch; corrupt header")
      val hdrVersion = java.nio.ByteBuffer.wrap(hdr, 4, 4).getInt
      require(hdrVersion == Version,
        s"$path: $Extension container version $hdrVersion, reader supports " +
          s"$Version only (the footer layout changed in v$Version; files " +
          "from older writers are incompatible — regenerate them)")
      val tail8 = new Array[Byte](8)
      in.seek(len - 8)
      in.readFully(tail8)
      require(tail8.slice(4, 8).sameElements(Magic),
        s"$path: missing trailing magic; truncated or not a $Extension file")
      val fl = java.nio.ByteBuffer.wrap(tail8).getInt(0)
      require(fl >= 28 && (fl - 28) % 8 == 0 && fl <= len - 12,
        s"$path: implausible footer length $fl for a $len-byte file; corrupt")
      val n = (fl - 28) / 8
      val trailer = new Array[Byte](fl)
      val footerStart = len - fl
      in.seek(footerStart)
      in.readFully(trailer)
      val bb = java.nio.ByteBuffer.wrap(trailer)
      require(bb.getInt(0) == fl,
        s"$path: footer length copies disagree (${bb.getInt(0)} vs $fl); corrupt")
      require(bb.getInt(4) == Version,
        s"$path: unsupported $Extension footer version ${bb.getInt(4)} " +
          s"(reader supports $Version; older-writer files are incompatible)")
      val stored = bb.getInt(fl - 12)
      val got = xxh32(trailer, 0, fl - 12)
      require(stored == got,
        f"$path: footer checksum mismatch (stored 0x$stored%08x, got 0x$got%08x)")
      val offs = (0 until n).map(i => bb.getLong(8 + 8 * i))
      offs.zipWithIndex.foreach { case (o, i) =>
        require(o >= 12 && o < footerStart,
          s"$path: footer offset[$i]=$o outside the block region " +
            s"[12, $footerStart); corrupt footer")
      }
      (offs, footerStart)
    } finally in.close()
  }

  /** Decompress the single block at `offset`. XXH32-validated BEFORE the
    * decode; the safe decompressor bounds allocation by rawLen. */
  private[sources] def readBlock(in: FSDataInputStream, offset: Long,
      name: String): Array[Byte] = {
    in.seek(offset)
    val h = new Array[Byte](12)
    in.readFully(h)
    val bb = java.nio.ByteBuffer.wrap(h)
    val rawLen = bb.getInt(0); val compLen = bb.getInt(4); val ck = bb.getInt(8)
    require(rawLen >= 0 && compLen >= 0 && compLen <= rawLen &&
      rawLen <= MaxBlockBytes, // bound the allocation BEFORE trusting the header
      s"$name block@$offset: impossible sizes raw=$rawLen comp=$compLen " +
        s"(max block $MaxBlockBytes)")
    val payload = new Array[Byte](compLen)
    in.readFully(payload)
    val got = xxh32(payload, 0, compLen)
    require(got == ck,
      f"$name block@$offset: XXH32 mismatch (stored 0x$ck%08x, got 0x$got%08x)")
    if (compLen == rawLen) payload // stored uncompressed
    else lz4.safeDecompressor().decompress(payload, rawLen)
  }
}

/** Hadoop input format over [[FourMc]] files: line records, byte-range
  * splittable, pluggable through `Fastq.readLinesWithFormat` with NO code
  * change there (the literal `-inputformat` contract). Keys are the
  * compressed offset of the block holding the line's first byte. */
class FourMcTextInputFormat extends FileInputFormat[LongWritable, Text] {
  override def isSplitable(ctx: JobContext, file: Path): Boolean = true

  override def createRecordReader(split: InputSplit, ctx: TaskAttemptContext)
      : RecordReader[LongWritable, Text] = new RecordReader[LongWritable, Text] {
    private var in: FSDataInputStream = _
    private var it: Iterator[(Long, String)] = Iterator.empty
    private var cur: (Long, String) = _
    private var nOwned = 1L
    private var served = 0L

    override def initialize(s: InputSplit, c: TaskAttemptContext): Unit = {
      val fsplit = s.asInstanceOf[FileSplit]
      val path = fsplit.getPath.toString
      val (offs, footerStart) = FourMc.footerOffsets(c.getConfiguration, path)
      if (offs.isEmpty) return
      val start = fsplit.getStart
      val end = start + fsplit.getLength
      val firstIdx = offs.indexWhere(_ >= start)
      if (firstIdx < 0 || offs(firstIdx) >= end) return
      val ownedEnd = offs.indexWhere(_ >= end) match {
        case -1 => footerStart
        case i  => offs(i)
      }
      nOwned = offs.count(o => o >= start && o < end).toLong.max(1L)
      in = fsplit.getPath.getFileSystem(c.getConfiguration).open(fsplit.getPath)
      // does our first block begin mid-line? ONE bounded look at the
      // previous block's final byte decides first-line ownership
      val startsFresh = firstIdx == 0 || {
        val prev = FourMc.readBlock(in, offs(firstIdx - 1), path)
        prev.nonEmpty && prev.last == '\n'
      }
      it = new FourMcLineIterator(in, path, offs.drop(firstIdx), footerStart,
        ownedEnd, startsFresh)
    }

    override def nextKeyValue(): Boolean =
      if (it.hasNext) { cur = it.next(); served += 1; true } else false
    override def getCurrentKey: LongWritable = new LongWritable(cur._1)
    override def getCurrentValue: Text = new Text(cur._2)
    override def getProgress: Float = math.min(1f, served.toFloat / nOwned)
    override def close(): Unit = if (in != null) in.close()
  }
}

/** Lines whose first byte lives in a block with offset < ownedEnd, read
  * from the block sequence starting at `blocks.head`. `startsFresh`
  * decides whether the very first line is ours (previous block ended on a
  * newline) or a straddler to drop. */
private[sources] class FourMcLineIterator(in: FSDataInputStream, path: String,
    blocks: Seq[Long], footerStart: Long, ownedEnd: Long, startsFresh: Boolean)
  extends Iterator[(Long, String)] {

  private val blockIter = blocks.iterator
  private var curBlock: Array[Byte] = Array.emptyByteArray
  private var curOff = -1L
  private var at = 0
  private val line = new java.io.ByteArrayOutputStream(256)
  private var pending: (Long, String) = _
  private var eof = false
  private var mustDropFirst = !startsFresh

  /** -1 at end of file; otherwise the next byte, with `curOff` naming the
    * block it came from. */
  private def nextByte(): Int = {
    while (at >= curBlock.length) {
      if (!blockIter.hasNext) return -1
      curOff = blockIter.next()
      curBlock = FourMc.readBlock(in, curOff, path)
      at = 0
    }
    val b = curBlock(at) & 0xff; at += 1; b
  }

  /** True iff the NEXT byte (the start of a new line) sits in a block we
    * do not own — the cheap early stop that avoids reading a whole
    * foreign line just to discard it. */
  private def nextLineForeign(): Boolean = {
    while (at >= curBlock.length) {
      if (!blockIter.hasNext) return true // EOF: nothing further to own
      curOff = blockIter.next()
      curBlock = FourMc.readBlock(in, curOff, path)
      at = 0
    }
    curOff >= ownedEnd
  }

  private def advance(): Unit = {
    pending = null
    if (eof) return
    var lineStart = -1L
    var looping = true
    while (looping) {
      if (line.size() == 0 && lineStart < 0) {
        // at a line boundary: stop the split as soon as the next line's
        // first byte is foreign (or EOF)
        if (!mustDropFirst && nextLineForeign()) { eof = true; return }
      }
      val ownerBefore = if (at < curBlock.length) curOff else -1L
      val b = nextByte()
      if (b < 0) {
        eof = true
        if (line.size() > 0 && !mustDropFirst && lineStart < ownedEnd && lineStart >= 0)
          pending = (lineStart, line.toString("UTF-8"))
        line.reset()
        looping = false
      } else {
        if (lineStart < 0) lineStart = if (ownerBefore >= 0) ownerBefore else curOff
        if (b == '\n') {
          if (mustDropFirst) { mustDropFirst = false; line.reset(); lineStart = -1L }
          else {
            pending = (lineStart, line.toString("UTF-8"))
            line.reset()
            looping = false
          }
        } else line.write(b)
      }
    }
  }

  advance()
  override def hasNext: Boolean = pending != null
  override def next(): (Long, String) = { val r = pending; advance(); r }
}
