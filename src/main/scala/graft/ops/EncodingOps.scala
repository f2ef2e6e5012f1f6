package graft.ops

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8, UTF_16BE, UTF_16LE}
import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.{t, tSpread}

/** Character-encoding triage — the chardet/ftfy stage of crawl ingest,
  * between [[WarcOps]] (bytes off the wire) and every text operator:
  * real crawl bodies arrive in mixed encodings and a measurable share is
  * MOJIBAKE (UTF-8 bytes mis-decoded as Latin-1 somewhere upstream, the
  * "Ã©" corruption). The reference treats payloads as opaque
  * (`/root/reference/pkg/converter/converter.go:52-57`); this extends
  * the curation surface per the north star.
  *
  * q307 — detection + transcode, all REAL byte work:
  *   - BOM sniff (EF BB BF / FF FE / FE FF);
  *   - BOM-less discrimination: a STRICT UTF-8 trial decode (the JDK
  *     CharsetDecoder with REPORT semantics) — bytes that fail it and
  *     contain high bytes are Latin-1 by the crawl fallback rule;
  *   - decode through the detected charset and byte-exact recovery of a
  *     non-ASCII wrapper + the document text.
  *
  * q308 — mojibake repair, the ftfy core loop: while the text re-encoded
  * as Latin-1 forms VALID multibyte UTF-8, it was mis-decoded upstream —
  * undo one round. The fixture plants one round (and a DOUBLE round on
  * every third doc); the repaired text must equal the original exactly,
  * and the loop must know when to STOP (the clean text contains bare
  * high-range characters that do NOT form valid UTF-8 when re-encoded,
  * so over-repair breaks the hash as loudly as under-repair).
  *
  * Both are strict against the REAL text column (the oracle concats the
  * raw columns into the same wrapper and md5s). Scale shape: per-doc
  * maps, narrow rows, zero cross-doc state.
  */
object EncodingOps {

  /** The non-ASCII wrapper forced around every document: guillemets and
    * an accented suffix make ASCII-transparent bugs impossible to hide
    * and give the Latin-1/UTF-8 discriminators real work on every row. */
  private[ops] def wrapped(id: Long, text: String): String =
    "«" + id + "»\n" + Option(text).getOrElse("") + "\né-fin"

  // --------------------------------------------------------- q307 synth

  private[ops] def charsetName(id: Long): String = (id % 4) match {
    case 0 => "utf-8"
    case 1 => "utf-16le"
    case 2 => "utf-16be"
    case _ => "iso-8859-1"
  }

  /** Encode the wrapped text per the schedule — BOMs included where the
    * charset convention carries one. */
  private[ops] def encodedBytes(id: Long, text: String): Array[Byte] = {
    val s = wrapped(id, text)
    (id % 4) match {
      case 0 => Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ s.getBytes(UTF_8)
      case 1 => Array[Byte](0xff.toByte, 0xfe.toByte) ++ s.getBytes(UTF_16LE)
      case 2 => Array[Byte](0xfe.toByte, 0xff.toByte) ++ s.getBytes(UTF_16BE)
      case _ =>
        // getBytes(ISO_8859_1) silently writes '?' for chars above U+00FF,
        // which would corrupt the fixture instead of testing the decoder —
        // refuse loudly; the audit's Latin-1 posture only makes sense for
        // Latin-1-representable text (true of the driver corpus, asserted
        // here rather than assumed)
        require(s.forall(_ <= 'ÿ'),
          "Latin-1 posture requires Latin-1-representable text")
        s.getBytes(ISO_8859_1)
    }
  }

  // --------------------------------------------------------- q307 parse

  private def strictUtf8(bytes: Array[Byte], from: Int): Option[String] =
    try {
      val dec = UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      Some(dec.decode(java.nio.ByteBuffer.wrap(bytes, from, bytes.length - from)).toString)
    } catch { case _: java.nio.charset.CharacterCodingException => None }

  /** Detect and decode: BOM first, then the strict-UTF-8 trial, then the
    * Latin-1 crawl fallback. Returns (charsetName, decodedText). */
  private[ops] def sniffDecode(bytes: Array[Byte]): (String, String) = {
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
        (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf)
      ("utf-8", strictUtf8(bytes, 3).getOrElse(
        throw new IllegalArgumentException("UTF-8 BOM but malformed body")))
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
      ("utf-16le", new String(bytes, 2, bytes.length - 2, UTF_16LE))
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      ("utf-16be", new String(bytes, 2, bytes.length - 2, UTF_16BE))
    else strictUtf8(bytes, 0) match {
      case Some(s) => ("utf-8", s) // BOM-less valid UTF-8
      case None => ("iso-8859-1", new String(bytes, ISO_8859_1))
    }
  }

  // --------------------------------------------------------- q308 repair

  /** One round of the classic corruption: the text's UTF-8 bytes read
    * back as Latin-1 ("é" → "Ã©"). */
  private[ops] def mojibake(s: String): String =
    new String(s.getBytes(UTF_8), ISO_8859_1)

  /** The ftfy core loop: undo mis-decodes while the Latin-1 re-encoding
    * is valid MULTIBYTE UTF-8 (pure-ASCII never loops; clean text with
    * bare high chars fails the trial decode and stops). Returns
    * (repairedText, roundsUndone). */
  private[ops] def repair(s: String): (String, Long) = {
    var cur = s
    var rounds = 0L
    var continue = true
    while (continue) {
      // Latin-1 must represent every char (mojibake always is); otherwise stop
      if (!cur.forall(_ <= 'ÿ')) continue = false
      else {
        val bytes = cur.getBytes(ISO_8859_1)
        if (!bytes.exists(b => (b & 0x80) != 0)) continue = false // pure ASCII
        else strictUtf8(bytes, 0) match {
          case Some(decoded) => cur = decoded; rounds += 1
          case None => continue = false
        }
      }
      require(rounds <= 8, "runaway mojibake repair")
    }
    (cur, rounds)
  }

  // ------------------------------------------------------------ queries

  /** The wrapper, restated in DuckDB (strings are UTF-8 on both sides). */
  private val OracleWrapped: String =
    "'«' || CAST(doc_id AS VARCHAR) || '»' || chr(10) || " +
      "coalesce(text, '') || chr(10) || 'é-fin'"

  val qs: Seq[Q] = Seq(

    // ---- charset detection + transcode audit ----
    // Spark encodes the wrapped text per the schedule (BOMs, UTF-16 both
    // endiannesses, Latin-1) and must detect + decode it back byte-
    // exactly; the oracle concats the raw columns. A BOM, endianness,
    // trial-decode, or fallback defect breaks the hashes.
    Q("q307_charset_sniff",
      s"""SELECT doc_id,
         |  CASE doc_id % 4 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16le'
         |       WHEN 2 THEN 'utf-16be' ELSE 'iso-8859-1' END AS charset,
         |  md5($OracleWrapped) AS text_md5,
         |  CAST(9 + len(CAST(doc_id AS VARCHAR)) + len(coalesce(text, ''))
         |      AS BIGINT) AS text_len
         |FROM documents
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      tSpread(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val (cs, decoded) = sniffDecode(encodedBytes(id, text))
          (id, cs, Md5Hex.of(decoded), Md5Hex.codePoints(decoded))
        })
        .toDF("doc_id", "charset", "text_md5", "text_len")
        .orderBy(col("doc_id"))
    },

    // ---- mojibake repair audit ----
    // Spark plants one round of UTF-8-as-Latin-1 corruption (two rounds
    // on every third doc) and repairs with the trial-decode loop; the
    // repaired text must equal the ORIGINAL wrapper+text (oracle md5 of
    // the raw columns) and the round count must match the planting —
    // over-repair and under-repair both break the hashes.
    Q("q308_mojibake_repair",
      s"""SELECT doc_id,
         |  CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS rounds,
         |  md5($OracleWrapped) AS text_md5,
         |  CAST(9 + len(CAST(doc_id AS VARCHAR)) + len(coalesce(text, ''))
         |      AS BIGINT) AS text_len
         |FROM documents
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      tSpread(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val clean = wrapped(id, text)
          val corrupted =
            if (id % 3 == 0) mojibake(mojibake(clean)) else mojibake(clean)
          val (repaired, rounds) = repair(corrupted)
          (id, rounds, Md5Hex.of(repaired), Md5Hex.codePoints(repaired))
        })
        .toDF("doc_id", "rounds", "text_md5", "text_len")
        .orderBy(col("doc_id"))
    }
  )
}
