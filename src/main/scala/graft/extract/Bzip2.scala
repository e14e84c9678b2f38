package graft.extract

import graft.core.ProcessingError

/** From-scratch bzip2 codec — the reference shells out to Python's bz2
  * module (`/root/reference/ingestors/packages/__init__.py:39-89`); the
  * format (RLE1 → BWT → MTF+RLE2 → Huffman, MSB-first bitstream) is public.
  *
  * Decoder: full format — multi-block, CONTINUE-group Huffman switching
  * every 50 symbols, CRC verification, output cap.
  * Encoder (corpus/test support): one block, two identical fixed-length
  * Huffman tables (spec minimum nGroups=2), naive O(n² log n) BWT — valid
  * output for the small payloads the synthetic corpus renders. */
object Bzip2 {

  // ---- CRC (poly 0x04c11db7, MSB-first, bzip2 flavor) ----------------------

  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private final class Crc {
    private var v = 0xffffffff
    def update(b: Byte): Unit =
      v = (v << 8) ^ crcTable(((v >>> 24) ^ (b & 0xff)) & 0xff)
    def value: Int = ~v
  }

  // ---- bit I/O (MSB-first) --------------------------------------------------

  private final class BitReader(d: Array[Byte]) {
    private var pos = 0L // bit position
    def bits(n: Int): Int = {
      var out = 0
      var k = 0
      while (k < n) {
        val byteIx = (pos >>> 3).toInt
        if (byteIx >= d.length) throw new ProcessingError("bzip2: truncated stream")
        val bit = (d(byteIx) >>> (7 - (pos & 7).toInt)) & 1
        out = (out << 1) | bit
        pos += 1
        k += 1
      }
      out
    }
    def bit(): Int = bits(1)
    def long48(): Long = (bits(24).toLong << 24) | (bits(24).toLong & 0xffffffL)
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def write(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >>> k) & 1)
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        k -= 1
      }
    }
    def write48(v: Long): Unit = { write((v >>> 24).toInt, 24); write((v & 0xffffff).toInt, 24) }
    def finish(): Array[Byte] = {
      if (nbits > 0) { out.write(cur << (8 - nbits)); nbits = 0 }
      out.toByteArray
    }
  }

  private val BlockMagic = 0x314159265359L
  private val EndMagic = 0x177245385090L

  // ---- decoder ---------------------------------------------------------------

  def decompress(data: Array[Byte],
                 cap: Long = PackageLimits.MaxMemberBytes): Array[Byte] = {
    if (data.length < 10 || data(0) != 'B' || data(1) != 'Z' || data(2) != 'h')
      throw new ProcessingError("bzip2: bad stream header")
    val level = data(3) - '0'
    if (level < 1 || level > 9)
      throw new ProcessingError("bzip2: bad block-size level")
    val maxBlock = level * 100000
    val br = new BitReader(data)
    br.bits(32) // header consumed bitwise from here on
    val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4, 1 << 20))
    var streamCrc = 0
    var more = true
    while (more) {
      val magic = br.long48()
      if (magic == EndMagic) {
        br.bits(32) // stream CRC — decoder-side value checked per block below
        more = false
      } else if (magic == BlockMagic) {
        val blockCrc = (br.bits(16) << 16) | br.bits(16)
        if (br.bit() != 0) throw new ProcessingError("bzip2: randomized blocks unsupported")
        val origPtr = br.bits(24)

        // symbol map
        val used16 = br.bits(16)
        val used = new Array[Boolean](256)
        var nUsed = 0
        var i = 0
        while (i < 16) {
          if ((used16 & (0x8000 >>> i)) != 0) {
            val m = br.bits(16)
            var j = 0
            while (j < 16) {
              if ((m & (0x8000 >>> j)) != 0) { used(i * 16 + j) = true; nUsed += 1 }
              j += 1
            }
          }
          i += 1
        }
        if (nUsed == 0) throw new ProcessingError("bzip2: empty symbol map")
        val seqToUnseq = new Array[Int](nUsed)
        var k = 0
        i = 0
        while (i < 256) { if (used(i)) { seqToUnseq(k) = i; k += 1 }; i += 1 }
        val alphaSize = nUsed + 2

        val nGroups = br.bits(3)
        if (nGroups < 2 || nGroups > 6) throw new ProcessingError("bzip2: bad nGroups")
        val nSelectors = br.bits(15)
        if (nSelectors < 1) throw new ProcessingError("bzip2: bad nSelectors")
        // selectors, MTF-coded unary
        val selMtf = Array.tabulate(nGroups)(identity)
        val selectors = new Array[Int](nSelectors)
        i = 0
        while (i < nSelectors) {
          var j = 0
          while (br.bit() == 1) {
            j += 1
            if (j >= nGroups) throw new ProcessingError("bzip2: bad selector")
          }
          val v = selMtf(j)
          while (j > 0) { selMtf(j) = selMtf(j - 1); j -= 1 }
          selMtf(0) = v
          selectors(i) = v
          i += 1
        }

        // Huffman tables: delta-coded lengths → canonical limit/base/perm
        val lens = Array.ofDim[Int](nGroups, alphaSize)
        var g = 0
        while (g < nGroups) {
          var c = br.bits(5)
          var s = 0
          while (s < alphaSize) {
            var go = true
            while (go) {
              if (c < 1 || c > 20) throw new ProcessingError("bzip2: bad code length")
              if (br.bit() == 0) go = false
              else c += (if (br.bit() == 0) 1 else -1)
            }
            lens(g)(s) = c
            s += 1
          }
          g += 1
        }
        val limit = Array.ofDim[Int](nGroups, 25)
        val base = Array.ofDim[Int](nGroups, 25)
        val perm = Array.ofDim[Int](nGroups, alphaSize)
        val minLens = new Array[Int](nGroups)
        g = 0
        while (g < nGroups) {
          var minLen = 32; var maxLen = 0
          var s = 0
          while (s < alphaSize) {
            if (lens(g)(s) > maxLen) maxLen = lens(g)(s)
            if (lens(g)(s) < minLen) minLen = lens(g)(s)
            s += 1
          }
          minLens(g) = minLen
          // perm: symbols ordered by code length
          var pp = 0
          var l = minLen
          while (l <= maxLen) {
            s = 0
            while (s < alphaSize) {
              if (lens(g)(s) == l) { perm(g)(pp) = s; pp += 1 }
              s += 1
            }
            l += 1
          }
          val cnt = new Array[Int](25)
          s = 0
          while (s < alphaSize) { cnt(lens(g)(s) + 1) += 1; s += 1 }
          var q = 1
          while (q < 25) { cnt(q) += cnt(q - 1); q += 1 }
          var vec = 0
          l = minLen
          while (l <= maxLen) {
            vec += cnt(l + 1) - cnt(l)
            limit(g)(l) = vec - 1
            vec <<= 1
            l += 1
          }
          l = minLen + 1
          while (l <= maxLen) {
            base(g)(l) = ((limit(g)(l - 1) + 1) << 1) - cnt(l)
            l += 1
          }
          g += 1
        }

        // MTF + RLE2 decode into the BWT buffer
        val mtf = seqToUnseq.clone()
        val bwt = new Array[Byte](maxBlock)
        val unzftab = new Array[Int](256)
        var nblock = 0
        var groupNo = -1
        var groupPos = 0
        var curG = 0
        def nextSym(): Int = {
          if (groupPos == 0) {
            groupNo += 1
            if (groupNo >= nSelectors) throw new ProcessingError("bzip2: selectors exhausted")
            groupPos = 50
            curG = selectors(groupNo)
          }
          groupPos -= 1
          var l = minLens(curG)
          var v = br.bits(l)
          while (l <= 23 && v > limit(curG)(l)) { l += 1; v = (v << 1) | br.bit() }
          if (l > 23) throw new ProcessingError("bzip2: bad huffman code")
          val ix = v - base(curG)(l)
          if (ix < 0 || ix >= alphaSize) throw new ProcessingError("bzip2: bad huffman code")
          perm(curG)(ix)
        }
        val eob = alphaSize - 1
        var sym = nextSym()
        while (sym != eob) {
          if (sym <= 1) { // RUNA / RUNB zero-run
            var run = 0L
            var shift = 0
            while (sym <= 1) {
              run += (sym + 1).toLong << shift
              shift += 1
              if (shift > 40) throw new ProcessingError("bzip2: absurd run")
              sym = nextSym()
            }
            val b = mtf(0).toByte
            if (nblock + run > maxBlock) throw new ProcessingError("bzip2: block overflow")
            var r = 0L
            while (r < run) { bwt(nblock) = b; unzftab(b & 0xff) += 1; nblock += 1; r += 1 }
          } else {
            // MTF value sym-1
            var j = sym - 1
            val v = mtf(j)
            while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
            mtf(0) = v
            if (nblock >= maxBlock) throw new ProcessingError("bzip2: block overflow")
            bwt(nblock) = v.toByte
            unzftab(v & 0xff) += 1
            nblock += 1
            sym = nextSym()
          }
        }
        if (origPtr >= nblock) throw new ProcessingError("bzip2: bad origPtr")

        // inverse BWT
        val cftab = new Array[Int](257)
        i = 0
        while (i < 256) { cftab(i + 1) = cftab(i) + unzftab(i); i += 1 }
        val tt = new Array[Int](nblock)
        i = 0
        while (i < nblock) {
          val b = bwt(i) & 0xff
          tt(cftab(b)) = i
          cftab(b) += 1
          i += 1
        }
        // RLE1 expand while walking
        val crc = new Crc()
        var tPos = tt(origPtr)
        var count = 0
        var runLen = 0
        var prev = -1
        while (count < nblock) {
          val b = bwt(tPos) & 0xff
          tPos = tt(tPos)
          count += 1
          if (runLen == 4) {
            // this byte is the repeat count
            var r = 0
            while (r < b) {
              out.write(prev); crc.update(prev.toByte)
              if (out.size > cap) throw new ProcessingError("bzip2: output exceeds cap")
              r += 1
            }
            runLen = 0
            prev = -1
          } else {
            if (b == prev) runLen += 1 else { runLen = 1; prev = b }
            out.write(b); crc.update(b.toByte)
            if (out.size > cap) throw new ProcessingError("bzip2: output exceeds cap")
          }
        }
        if (crc.value != blockCrc)
          throw new ProcessingError("bzip2: block CRC mismatch")
        streamCrc = ((streamCrc << 1) | (streamCrc >>> 31)) ^ blockCrc
      } else throw new ProcessingError("bzip2: bad block magic")
    }
    out.toByteArray
  }

  // ---- encoder (test/corpus support) ------------------------------------

  def compress(data: Array[Byte]): Array[Byte] = {
    if (data.length > 800000)
      throw new ProcessingError("bzip2 encoder: single-block support only")

    // RLE1
    val rle = new java.io.ByteArrayOutputStream(data.length + 16)
    var i = 0
    while (i < data.length) {
      val b = data(i)
      var run = 1
      while (i + run < data.length && data(i + run) == b && run < 255 + 4) run += 1
      if (run >= 4) {
        rle.write(b); rle.write(b); rle.write(b); rle.write(b)
        rle.write(run - 4)
        i += run
      } else {
        var k = 0
        while (k < run) { rle.write(b); k += 1 }
        i += run
      }
    }
    val block = rle.toByteArray
    val n = block.length

    val crc = new Crc()
    data.foreach(crc.update)
    val blockCrc = crc.value

    val bw = new BitWriter()
    bw.write('B', 8); bw.write('Z', 8); bw.write('h', 8); bw.write('9', 8)

    if (n == 0) {
      // empty stream: just the end marker
      bw.write48(EndMagic)
      bw.write(0, 32)
      return bw.finish()
    }

    // BWT via rotation index sort
    val idx = Array.range(0, n)
    val sorted = idx.sortWith { (a, b) =>
      var k = 0
      var r = 0
      var done = false
      while (!done && k < n) {
        val ca = block((a + k) % n) & 0xff
        val cb = block((b + k) % n) & 0xff
        if (ca != cb) { r = ca - cb; done = true }
        k += 1
      }
      if (!done) r = a - b // equal rotations: stable, any order works
      r < 0
    }
    val last = new Array[Byte](n)
    var origPtr = 0
    i = 0
    while (i < n) {
      val s = sorted(i)
      if (s == 0) origPtr = i
      last(i) = block((s + n - 1) % n)
      i += 1
    }

    // symbol map
    val used = new Array[Boolean](256)
    block.foreach(b => used(b & 0xff) = true)
    val seq = (0 until 256).filter(used).toArray
    val nUsed = seq.length
    val alphaSize = nUsed + 2
    val toSeq = new Array[Int](256)
    seq.zipWithIndex.foreach { case (v, k) => toSeq(v) = k }

    // MTF + RLE2
    val mtf = seq.clone()
    val syms = scala.collection.mutable.ArrayBuffer.empty[Int]
    var zeroRun = 0L
    def flushRun(): Unit = {
      var r = zeroRun
      while (r > 0) {
        r -= 1
        if ((r & 1) == 0) syms += 0 else syms += 1 // RUNA / RUNB
        r >>= 1
      }
      zeroRun = 0
    }
    i = 0
    while (i < n) {
      val v = toSeq(last(i) & 0xff)
      var j = 0
      while (mtf(j) != seq(v)) j += 1
      if (j == 0) zeroRun += 1
      else {
        flushRun()
        syms += (j + 1)
        val tmp = mtf(j)
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = tmp
      }
      i += 1
    }
    flushRun()
    syms += (alphaSize - 1) // EOB

    // fixed-length Huffman: every symbol gets length L (2^L >= alphaSize)
    var lenL = 1
    while ((1 << lenL) < alphaSize) lenL += 1
    if (lenL < 2) lenL = 2 // keep delta coding trivially valid

    bw.write48(BlockMagic)
    bw.write(blockCrc, 32)
    bw.write(0, 1) // not randomized
    bw.write(origPtr, 24)
    // symbol map
    var used16 = 0
    for (q <- 0 until 16 if (0 until 16).exists(j => used(q * 16 + j)))
      used16 |= 0x8000 >>> q
    bw.write(used16, 16)
    for (q <- 0 until 16 if (used16 & (0x8000 >>> q)) != 0) {
      var m = 0
      for (j <- 0 until 16 if used(q * 16 + j)) m |= 0x8000 >>> j
      bw.write(m, 16)
    }
    val nGroups = 2
    val nSelectors = (syms.length + 49) / 50
    bw.write(nGroups, 3)
    bw.write(nSelectors, 15)
    for (_ <- 0 until nSelectors) bw.write(0, 1) // selector 0, MTF-unary
    for (_ <- 0 until nGroups) {
      bw.write(lenL, 5)
      for (_ <- 0 until alphaSize) bw.write(0, 1) // no delta per symbol
    }
    // canonical fixed-length codes: code(symbol s) = s (L bits), since all
    // lengths equal → perm is identity, base = 0
    syms.foreach(s => bw.write(s, lenL))

    bw.write48(EndMagic)
    val streamCrc = blockCrc // single block: rotl(0,1) ^ crc
    bw.write(streamCrc, 32)
    bw.finish()
  }
}
