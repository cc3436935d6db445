package graft.functions

/** Byte-level twin of the tokenizer's space-free-script rewrite
  * (`Text.tokens`: `regexp_replace(c, "([Han|kana|hangul])", " $1 ")`) for
  * the fused shingle kernels ([[Md5MinHash.signatureFromText]],
  * [[XxShingleHashes.compute]]).
  *
  * Those kernels exploit the identity "a w-token shingle is a verbatim
  * byte span of the source text" — true only AFTER the CJK unigram
  * rewrite has inserted token boundaries. Normalizing here keeps the
  * identity (spans of the NORMALIZED buffer) and keeps native ==
  * portable for every input, CJK included (MinHashSpec/TextSpec
  * property-test it).
  *
  * All three ranges (U+4E00–9FFF Han, U+3040–30FF kana, U+AC00–D7AF
  * hangul) are 3-byte UTF-8, so detection is one linear scan of lead
  * bytes; text without them returns the INPUT ARRAY unchanged — the
  * 100 TB ASCII/Latin hot path pays one branchy scan, no allocation.
  */
object CjkFold {

  @inline private def isCjk(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3040 && cp <= 0x30FF) ||
      (cp >= 0xAC00 && cp <= 0xD7AF)

  @inline private def seqLen(b: Int): Int =
    if (b < 0x80) 1
    else if ((b & 0xE0) == 0xC0) 2
    else if ((b & 0xF0) == 0xE0) 3
    else if ((b & 0xF8) == 0xF0) 4
    else 1 // stray continuation byte — resync (UTF8String input is valid)

  @inline private def cp3(bytes: Array[Byte], p: Int): Int =
    ((bytes(p) & 0x0F) << 12) | ((bytes(p + 1) & 0x3F) << 6) | (bytes(p + 2) & 0x3F)

  /** UTF-8 bytes of `regexp_replace(text, "([cjk])", " $1 ")`; returns the
    * input array itself (no copy) when no CJK codepoint occurs.
    */
  def normalize(bytes: Array[Byte]): Array[Byte] = {
    val len = bytes.length
    var nCjk = 0
    var p = 0
    while (p < len) {
      val n = seqLen(bytes(p) & 0xFF)
      if (n == 3 && p + 2 < len && isCjk(cp3(bytes, p))) nCjk += 1
      p += math.min(n, len - p)
    }
    if (nCjk == 0) return bytes
    val out = new Array[Byte](len + 2 * nCjk)
    var q = 0
    p = 0
    while (p < len) {
      val n = math.min(seqLen(bytes(p) & 0xFF), len - p)
      if (n == 3 && p + 2 < len && isCjk(cp3(bytes, p))) {
        out(q) = ' '
        out(q + 1) = bytes(p); out(q + 2) = bytes(p + 1); out(q + 3) = bytes(p + 2)
        out(q + 4) = ' '
        q += 5
      } else {
        var j = 0
        while (j < n) { out(q + j) = bytes(p + j); j += 1 }
        q += n
      }
      p += n
    }
    out
  }
}
