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
    },

    // ---- packed loss masks: q311's spans through q91's packing ----
    // The GPT-style pre-training batch shape: rendered conversations are
    // CONCATENATED per source in doc_id order and cut into fixed
    // 512-char context windows, so an assistant span can CROSS a window
    // boundary and its mask must split into per-window segments — the
    // real subtlety of packed SFT. Fully declarative: the per-source
    // running sum rides the stitch engine (no single-partition window),
    // span→window fan-out is a bounded sequence() explode (a span
    // touches ≤3 windows), and the result is one hash aggregate. The
    // oracle recomputes stream offsets and segment overlaps closed-form.
    Q("q312_packed_loss_mask",
      """WITH w AS (SELECT doc_id, source,
        |    string_split(coalesce(text, ''), ' ') AS ws
        |  FROM documents),
        |parts AS (SELECT doc_id, source,
        |    len(array_to_string(list_slice(ws, 1, len(ws) // 2), ' ')) AS ul,
        |    len(array_to_string(list_slice(ws, len(ws) // 2 + 1, len(ws)), ' ')) AS al
        |  FROM w),
        |r AS (SELECT doc_id, source,
        |    119 + ul + al AS L, 108 + ul AS a0l, 108 + ul + al AS a1l
        |  FROM parts),
        |c AS (SELECT *, sum(L) OVER (PARTITION BY source ORDER BY doc_id
        |                             ROWS UNBOUNDED PRECEDING) AS cum FROM r),
        |sp AS (SELECT source, doc_id, cum - L + a0l AS A0, cum - L + a1l AS A1
        |  FROM c WHERE a1l > a0l),
        |seg AS (SELECT source, doc_id, A0, A1, (A0 // 512) + u.k AS window_id
        |  FROM sp, range(0, 4) u(k) WHERE (A0 // 512) + u.k <= (A1 - 1) // 512)
        |SELECT source, CAST(window_id AS BIGINT) AS window_id,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(least((window_id + 1) * 512, A1)
        |       - greatest(window_id * 512, A0)) AS BIGINT) AS mask_chars,
        |  min(doc_id) AS first_doc
        |FROM seg GROUP BY 1, 2
        |ORDER BY source, window_id""".stripMargin) { (s, dir) =>
      val ws = split(coalesce(col("text"), lit("")), " ", -1)
      val k = (size(ws) / 2).cast("int")
      val base = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          length(array_join(slice(ws, lit(1), k), " ")).cast("long").as("ul"),
          length(array_join(
            slice(ws, k + 1, greatest(size(ws) - k, lit(0))), " "))
            .cast("long").as("al"))
        .select(col("doc_id"), col("source"),
          (lit(119L) + col("ul") + col("al")).as("L"),
          (lit(108L) + col("ul")).as("a0l"),
          (lit(108L) + col("ul") + col("al")).as("a1l"))
      Skew.groupedRunningSum(base, Seq("source"), Seq(col("doc_id")),
          value = col("L"),
          numPartitions = s.conf.get("spark.sql.shuffle.partitions").toInt,
          outCol = "cum")
        .filter(col("a1l") > col("a0l"))
        .select(col("source"), col("doc_id"),
          (col("cum") - col("L") + col("a0l")).as("A0"),
          (col("cum") - col("L") + col("a1l")).as("A1"))
        .select(col("source"), col("doc_id"), col("A0"), col("A1"),
          explode(sequence(expr("A0 DIV 512"), expr("(A1 - 1) DIV 512")))
            .as("window_id"))
        .groupBy(col("source"), col("window_id"))
        .agg(count(lit(1)).cast("long").as("n_segments"),
          sum(least((col("window_id") + 1) * 512, col("A1"))
            - greatest(col("window_id") * 512, col("A0")))
            .cast("long").as("mask_chars"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("source"), col("window_id"))
    }
  )
}
