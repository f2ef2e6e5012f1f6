package graft.ops

/** Shared per-row MD5-hex for the ingest audits — one ThreadLocal digest
  * per executor thread, the same discipline `functions/Md5Split` uses
  * (getInstance per row would dominate the hash cost on the codec-seam
  * hot paths). */
object Md5Hex {
  private val local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val hex = "0123456789abcdef".toCharArray

  /** Lowercase hex MD5 of the UTF-8 bytes — byte-compatible with
    * DuckDB's `md5(text)`. */
  def of(s: String): String = {
    val md = local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Code-POINT count — DuckDB `len()` parity (java String.length counts
    * UTF-16 units and diverges on astral-plane characters). */
  def codePoints(s: String): Long = s.codePointCount(0, s.length).toLong
}
