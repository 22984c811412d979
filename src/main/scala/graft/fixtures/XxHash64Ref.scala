package graft.fixtures

/** Independent implementation of the public XXH64 algorithm
  * (https://github.com/Cyan4973/xxHash spec; little-endian reads), used by
  * the expected-table generator to cross-check the engine's
  * `xxhash64(url)` bucket assignment without calling Spark's own hasher.
  */
object XxHash64Ref {
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  private def le64(b: Array[Byte], i: Int): Long = {
    var v = 0L; var k = 7
    while (k >= 0) { v = (v << 8) | (b(i + k) & 0xffL); k -= 1 }
    v
  }
  private def le32(b: Array[Byte], i: Int): Long = {
    var v = 0L; var k = 3
    while (k >= 0) { v = (v << 8) | (b(i + k) & 0xffL); k -= 1 }
    v
  }

  private def round(acc: Long, input: Long): Long =
    rotl(acc + input * P2, 31) * P1

  private def mergeRound(acc: Long, v: Long): Long =
    (acc ^ round(0L, v)) * P1 + P4

  def hash(bytes: Array[Byte], seed: Long): Long = {
    val len = bytes.length
    var i = 0
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2; var v2 = seed + P2
        var v3 = seed; var v4 = seed - P1
        while (i + 32 <= len) {
          v1 = round(v1, le64(bytes, i)); v2 = round(v2, le64(bytes, i + 8))
          v3 = round(v3, le64(bytes, i + 16)); v4 = round(v4, le64(bytes, i + 24))
          i += 32
        }
        var acc = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        acc = mergeRound(acc, v1); acc = mergeRound(acc, v2)
        acc = mergeRound(acc, v3); acc = mergeRound(acc, v4)
        acc
      } else seed + P5
    h += len
    while (i + 8 <= len) {
      h = rotl(h ^ round(0L, le64(bytes, i)), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h = rotl(h ^ (le32(bytes, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h = rotl(h ^ ((bytes(i) & 0xffL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  /** Spark's `xxhash64(col)` default seed. */
  def sparkHash(s: String): Long = hash(s.getBytes("UTF-8"), 42L)
}
