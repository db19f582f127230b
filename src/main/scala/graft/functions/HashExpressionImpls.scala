package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.unsafe.types.UTF8String

/** Row-level kernels for [[HashExpressions]], kept in a plain object so
  * both the interpreted `eval` path and generated Java (via the static
  * forwarders Scala emits for object methods) call the same code.
  */
object HashExpressionImpls {

  private val seedA = 42L // matches Spark's xxhash64 default seed
  private val seedB = 0x7A3C5E1FD1CE4E5BL

  def minhashSig(text: UTF8String, numHashes: Int, shingleSize: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val shingles = new java.util.HashSet[String]()
    if (toks.length <= shingleSize) {
      shingles.add(toks.mkString(" "))
    } else {
      val sb = new StringBuilder
      var i = 0
      while (i <= toks.length - shingleSize) {
        sb.setLength(0)
        var j = 0
        while (j < shingleSize) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        shingles.add(sb.toString)
        i += 1
      }
    }
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val it = shingles.iterator()
    while (it.hasNext) {
      val sh = UTF8String.fromString(it.next())
      val h1 = Shim.xxhash64String(sh, seedA)
      val h2 = Shim.xxhash64String(sh, seedB) | 1L
      var k = 0
      var g = h1
      while (k < numHashes) {
        if (g < sig(k)) sig(k) = g
        g += h2
        k += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** Polynomial rolling hash h = (h*31 + codePoint) mod 1e9+7 over the
    * string's Unicode code points — the compiled replacement for the
    * interpreted `aggregate(split(text, ""), ...)` HOF (per-character
    * array allocation + interpreted eval; the only round-2 bench
    * regression). Code points match DuckDB `ord()` per character, and
    * equal the raw bytes for ASCII text.
    */
  def rollingHash64(text: UTF8String): Long = {
    val s = text.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  /** Same polynomial rolling hash over raw bytes (multimodal checksum
    * path — identical to [[rollingHash64]] on ASCII payloads).
    */
  def rollingHashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    h
  }

  /** Distinct word k-shingles in first-occurrence order — matches
    * `array_distinct(wordShingles(text, k))` element-for-element
    * (wordShingles emits positional order; array_distinct keeps the first
    * occurrence). Short docs (≤ k tokens) collapse to one whole-text
    * shingle, the same rule as [[minhashSig]]'s internal shingling.
    */
  def shingleSet(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]()
    if (toks.length <= k) {
      seen.add(toks.mkString(" "))
    } else {
      val sb = new StringBuilder
      var i = 0
      while (i <= toks.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) {
      out(i) = UTF8String.fromString(it.next())
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 128-bit SimHash: per-bit majority vote like [[simhash64]], but over
    * TWO independent 64-bit token hashes (seedA bits 0-63, seedB bits
    * 64-127). Returns Array[Long](2) = (word0, word1). Twice the bits
    * puts random doc pairs at expected Hamming ~64 instead of ~32, so
    * wide radii (h ≈ 10) sit far in the tail and blocking discriminates
    * again — the fingerprint-width escape hatch for radii where 64-bit
    * chunks degenerate to 5-6 bits.
    */
  def simhash128(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](128)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val u = UTF8String.fromString(toks(i))
        val h1 = Shim.xxhash64String(u, seedA)
        val h2 = Shim.xxhash64String(u, seedB)
        var b = 0
        while (b < 64) {
          if (((h1 >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          if (((h2 >>> b) & 1L) == 1L) votes(64 + b) += 1 else votes(64 + b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var w0 = 0L
    var w1 = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) w0 |= (1L << b)
      if (votes(64 + b) > 0) w1 |= (1L << b)
      b += 1
    }
    new GenericArrayData(Array(w0, w1))
  }

  def simhash64(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val h = Shim.xxhash64String(UTF8String.fromString(toks(i)), seedA)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
