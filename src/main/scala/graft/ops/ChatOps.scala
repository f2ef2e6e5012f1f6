package graft.ops

import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t

/** Chat-template rendering + loss-span masking — the SFT data-prep stage
  * of a modern training pipeline: conversations render into one training
  * string under a fixed template, and the loss mask supervises ONLY the
  * assistant spans (the standard instruction-tuning rule: prompt tokens
  * contribute no gradient). At 100 TB this is a per-conversation map
  * whose correctness lives in exact offset arithmetic — an off-by-one in
  * a span boundary silently trains on template tokens. The reference has
  * no text surface (`/root/reference/pkg/converter/converter.go:52-57`).
  *
  * The template is the ChatML shape (`<|im_start|>role\n…<|im_end|>\n`
  * per message); [[render]] is generic over any message list and returns
  * every assistant CONTENT span as exact character offsets into the
  * rendered string. The audit builds a deterministic conversation from
  * each document (system prompt, user = first half of the words,
  * assistant = second half), and the oracle reconstructs the rendered
  * string, the md5, and both span offsets closed-form in SQL — so the
  * renderer's offsets are pinned character-exactly against an
  * independent reconstruction.
  */
object ChatOps {

  private[ops] final case class Message(role: String, content: String)

  /** Render messages under the ChatML template; returns the rendered
    * string and the [start, end) character span of every assistant
    * message's CONTENT (the supervised spans). */
  private[ops] def render(messages: Seq[Message]): (String, Seq[(Long, Long)]) = {
    val sb = new StringBuilder
    val spans = Vector.newBuilder[(Long, Long)]
    messages.foreach { m =>
      sb.append("<|im_start|>").append(m.role).append('\n')
      val start = sb.length.toLong
      sb.append(m.content)
      if (m.role == "assistant") spans += ((start, sb.length.toLong))
      sb.append("<|im_end|>\n")
    }
    (sb.toString, spans.result())
  }

  /** The per-document conversation: split the text's words in half. The
    * -1 limit keeps trailing empty tokens, matching DuckDB string_split
    * exactly (a trailing space must not desynchronize the two engines). */
  private[ops] def conversation(text: String): Seq[Message] = {
    val words = Option(text).getOrElse("").split(" ", -1)
    val k = words.length / 2
    Seq(
      Message("system", "You are a helpful assistant."),
      Message("user", words.slice(0, k).mkString(" ")),
      Message("assistant", words.slice(k, words.length).mkString(" ")))
  }

  // ------------------------------------------------------------ queries

  val qs: Seq[Q] = Seq(

    // ---- chat-template render + loss-mask audit ----
    // Spark renders each document's conversation and reports the exact
    // assistant-span offsets; the oracle REBUILDS the rendered string in
    // SQL (fixed template arithmetic over the word split) and md5s it.
    // Any template, split, join, or offset defect breaks the hashes.
    Q("q311_chat_template",
      """WITH w AS (SELECT doc_id,
        |    string_split(coalesce(text, ''), ' ') AS ws
        |  FROM documents),
        |parts AS (SELECT doc_id,
        |    array_to_string(list_slice(ws, 1, len(ws) // 2), ' ') AS usr,
        |    array_to_string(list_slice(ws, len(ws) // 2 + 1, len(ws)), ' ') AS asst,
        |    CAST(len(ws) - len(ws) // 2 AS BIGINT) AS asst_tokens
        |  FROM w),
        |r AS (SELECT doc_id, usr, asst, asst_tokens,
        |    '<|im_start|>system' || chr(10) || 'You are a helpful assistant.'
        |      || '<|im_end|>' || chr(10) || '<|im_start|>user' || chr(10) || usr
        |      || '<|im_end|>' || chr(10) || '<|im_start|>assistant' || chr(10)
        |      || asst || '<|im_end|>' || chr(10) AS rendered
        |  FROM parts)
        |SELECT doc_id,
        |  md5(rendered) AS rendered_md5,
        |  CAST(len(rendered) AS BIGINT) AS rendered_len,
        |  CAST(108 + len(usr) AS BIGINT) AS asst_start,
        |  CAST(108 + len(usr) + len(asst) AS BIGINT) AS asst_end,
        |  asst_tokens
        |FROM r
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val msgs = conversation(text)
          val (rendered, spans) = render(msgs)
          require(spans.size == 1, "exactly one assistant span expected")
          val (a0, a1) = spans.head
          // span offsets in CODE POINTS (DuckDB len() parity — the same
          // astral-plane discipline as every text_len in the family)
          val a0cp = rendered.codePointCount(0, a0.toInt).toLong
          val a1cp = rendered.codePointCount(0, a1.toInt).toLong
          val tokens = msgs.last.content.split(" ", -1).length.toLong
          (id, Md5Hex.of(rendered), Md5Hex.codePoints(rendered), a0cp, a1cp, tokens)
        })
        .toDF("doc_id", "rendered_md5", "rendered_len", "asst_start",
          "asst_end", "asst_tokens")
        .orderBy(col("doc_id"))
    }
  )
}
