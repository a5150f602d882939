package graft.core

/** Streaming k-mer generators over a read — the engine's UDTF-like core
  * (semantics per reference `ReflexivDataFrameCounter.java:448-506`:
  * slide a k-window, maintain forward and reverse-complement packings
  * incrementally, emit the canonical = min of the two; invalid bases
  * (N etc.) reset the window).
  *
  * These run inside `Dataset.flatMap` on executors; they allocate nothing
  * per emitted k-mer in the Long form (k <= 31).
  */
object KmerIter {

  /** Canonical k-mers of `s` as packed Longs, k <= 31, rolling O(1)/base. */
  def canonicalLong(s: CharSequence, k: Int): Iterator[Long] = {
    require(k >= 1 && k <= 31, s"canonicalLong requires 1 <= k <= 31, got $k")
    new Iterator[Long] {
      private var i = 0
      private var run = 0
      private var fwd = 0L
      private var rc = 0L
      private var ready = false
      private var nextVal = 0L
      private def advance(): Unit = {
        while (!ready && i < s.length) {
          val c = KmerCodec.code(s.charAt(i))
          i += 1
          if (c < 0) run = 0
          else {
            fwd = KmerCodec.rollForward(fwd, c, k)
            rc = KmerCodec.rollRc(rc, c, k)
            run += 1
            if (run >= k) {
              nextVal = if (fwd <= rc) fwd else rc
              ready = true
            }
          }
        }
      }
      def hasNext: Boolean = { advance(); ready }
      def next(): Long = {
        advance()
        if (!ready) throw new NoSuchElementException
        ready = false
        nextVal
      }
    }
  }

  /** Canonical k-mers in block form for arbitrary k (k > 31 path).
    * O(k) per position — the correctness reference; a rolling block
    * variant is the scale optimization. Invalid bases skip the window. */
  def canonicalBlocks(s: String, k: Int): Iterator[Array[Long]] = {
    require(k >= 1, s"canonicalBlocks requires k >= 1, got $k")
    if (s.length < k) Iterator.empty
    else (0 to s.length - k).iterator
      .map(i => KmerCodec.encodeBlocks(s, i, i + k))
      .filter(_ ne null)
      .map(KmerCodec.canonicalBlocks)
  }
}
