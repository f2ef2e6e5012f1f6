package graft.ops

/** Encoding triage: BOM and BOM-less detection must pick the right
  * charset for every posture, decode must be byte-exact, and the
  * mojibake repair loop must undo exactly the planted rounds — stopping
  * on clean text (which contains bare high chars that would break if
  * over-repaired). */
class EncodingOpsSpec extends graft.SparkSpec {

  test("sniffDecode round-trips every charset posture") {
    (0L to 15L).foreach { id =>
      val text = s"doc $id body"
      val (cs, decoded) = EncodingOps.sniffDecode(EncodingOps.encodedBytes(id, text))
      assert(cs === EncodingOps.charsetName(id), s"doc $id charset")
      assert(decoded === EncodingOps.wrapped(id, text), s"doc $id text")
    }
  }

  test("BOM-less valid UTF-8 with multibyte chars detects as utf-8") {
    val s = "naïve café — test"
    val (cs, decoded) = EncodingOps.sniffDecode(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(cs === "utf-8")
    assert(decoded === s)
  }

  test("invalid high bytes fall back to iso-8859-1") {
    val bytes = Array[Byte]('a', 0xe9.toByte, 'b') // lone é: invalid UTF-8
    val (cs, decoded) = EncodingOps.sniffDecode(bytes)
    assert(cs === "iso-8859-1")
    assert(decoded === "aéb")
  }

  test("mojibake repair undoes exactly the planted rounds and stops") {
    val clean = EncodingOps.wrapped(7L, "plain words and more words")
    // zero rounds: clean text must come back untouched
    assert(EncodingOps.repair(clean) === ((clean, 0L)))
    // one and two rounds
    val once = EncodingOps.mojibake(clean)
    assert(once !== clean)
    assert(EncodingOps.repair(once) === ((clean, 1L)))
    val twice = EncodingOps.mojibake(once)
    assert(EncodingOps.repair(twice) === ((clean, 2L)))
    // pure ASCII never loops
    assert(EncodingOps.repair("just ascii") === (("just ascii", 0L)))
  }

  test("q307/q308 run end-to-end at sf0.001") {
    val r7 = graft.SparkEntry.queries("q307_charset_sniff")(spark, sf001).collect()
    val r8 = graft.SparkEntry.queries("q308_mojibake_repair")(spark, sf001).collect()
    assert(r7.length === 500 && r8.length === 500)
    // the two audits agree on the recovered text hash per document
    val h7 = r7.map(r => r.getLong(0) -> r.getString(2)).toMap
    r8.foreach(r => assert(r.getString(2) === h7(r.getLong(0)), s"doc ${r.getLong(0)}"))
  }
}
