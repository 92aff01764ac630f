package graft

/** Clean-room XXH64 implementation from Yann Collet's public xxHash
  * specification (github.com/Cyan4973/xxHash, BSD) — the INDEPENDENT
  * reference the specs pin the engine's `xxhash64` production families
  * against (Bootstrap.weightFast, PpsSample.sampleFast, CountMin fast
  * family). Spark's `xxhash64(col)` hashes the UTF-8 bytes of a string
  * column with seed 42; if either side deviated from the standard
  * algorithm — or the engine's salt/concat conventions drifted — the
  * draw-level equality tests would flip. Deliberately written from the
  * spec, not copied from Spark's XXH64, so agreement is evidence. */
object TestXxHash64 {

  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  private def readLE64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  private def readLE32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  private def round(acc: Long, lane: Long): Long =
    rotl(acc + lane * P2, 31) * P1

  private def mergeRound(h: Long, acc: Long): Long =
    (h ^ round(0L, acc)) * P1 + P4

  def hash(b: Array[Byte], seed: Long = 42L): Long = {
    val len = b.length
    var i = 0
    var h =
      if (len >= 32) {
        var a1 = seed + P1 + P2
        var a2 = seed + P2
        var a3 = seed
        var a4 = seed - P1
        while (i + 32 <= len) {
          a1 = round(a1, readLE64(b, i))
          a2 = round(a2, readLE64(b, i + 8))
          a3 = round(a3, readLE64(b, i + 16))
          a4 = round(a4, readLE64(b, i + 24))
          i += 32
        }
        var m = rotl(a1, 1) + rotl(a2, 7) + rotl(a3, 12) + rotl(a4, 18)
        m = mergeRound(m, a1); m = mergeRound(m, a2)
        m = mergeRound(m, a3); m = mergeRound(m, a4)
        m
      } else seed + P5
    h += len
    while (i + 8 <= len) {
      h = rotl(h ^ round(0L, readLE64(b, i)), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h = rotl(h ^ (readLE32(b, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h = rotl(h ^ ((b(i) & 0xffL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  def hashString(s: String, seed: Long = 42L): Long =
    hash(s.getBytes("UTF-8"), seed)
}
