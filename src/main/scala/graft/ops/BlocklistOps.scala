package graft.ops

import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.{t, tSpread}

/** Multi-pattern blocklist filtering — the UT1-blocklist stage of crawl
  * curation (CCNet and RefinedWeb both gate documents/URLs on large
  * literal blocklists before anything expensive runs). The reference
  * moves opaque payloads (`/root/reference/pkg/converter/converter.go:
  * 52-57`); this extends the curation surface per the north star.
  *
  * The engine shape that matters at 100 TB: a blocklist is
  * DICTIONARY-sized (10⁵–10⁷ literals) while the corpus is not, so the
  * pattern set compiles ONCE into an Aho–Corasick automaton on the
  * driver and ships to executors inside the task closure (the
  * `graft.dict.maxRows` posture — bounded build side, corpus-side
  * streaming scan); each document is then scanned in O(len + matches)
  * INDEPENDENT of pattern count, where the naive form pays O(K·len)
  * regex passes. The automaton is the real algorithm: goto trie, BFS
  * fail links, and output lists aggregated through the fail chain so a
  * pattern that is a proper substring of another (`at` inside `data`)
  * is still reported at every occurrence.
  *
  * The audit pattern set includes nested pairs (`at`⊂`data`, `me`⊂
  * `merge`, `art`⊂`part`) so the output links are load-bearing, and
  * every pattern is self-border-free (no proper prefix equals a
  * suffix), which makes occurrences non-overlapping per pattern — the
  * property that lets the DuckDB oracle count them exactly with the
  * replace-length formula.
  */
object BlocklistOps {

  /** Aho–Corasick automaton over Char alphabet: goto/fail/output.
    * Matching returns every (patternId, endPos) occurrence. */
  final class AhoCorasick(patterns: IndexedSeq[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty")
    // trie
    private val goto_ = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    private val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      p.foreach { c =>
        s = goto_(s).getOrElseUpdate(c, {
          goto_ += scala.collection.mutable.Map.empty[Char, Int]
          ends += Nil
          goto_.length - 1
        })
      }
      ends(s) = id :: ends(s)
    }
    private val n = goto_.length
    private val fail = new Array[Int](n)
    // outputs(s): every pattern id that ends at s OR at a state on s's
    // fail chain — precomputed so matching never walks the chain
    private val outputs = new Array[List[Int]](n)
    locally {
      val queue = scala.collection.mutable.Queue.empty[Int]
      outputs(0) = ends(0)
      goto_(0).values.foreach { s =>
        fail(s) = 0; outputs(s) = ends(s); queue += s
      }
      while (queue.nonEmpty) {
        val r = queue.dequeue()
        goto_(r).foreach { case (c, s) =>
          var f = fail(r)
          while (f != 0 && !goto_(f).contains(c)) f = fail(f)
          fail(s) = if (goto_(f).contains(c) && goto_(f)(c) != s)
            goto_(f)(c) else 0
          outputs(s) = ends(s) ++ outputs(fail(s))
          queue += s
        }
      }
    }

    /** Walk the text; `onMatch(patternId, endIndex0)` per occurrence. */
    def scan(text: String)(onMatch: (Int, Int) => Unit): Unit = {
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !goto_(s).contains(c)) s = fail(s)
        s = goto_(s).getOrElse(c, 0)
        var out = outputs(s)
        while (out.nonEmpty) { onMatch(out.head, i); out = out.tail }
        i += 1
      }
    }

    def patternCount: Int = patterns.length
    def patternLength(id: Int): Int = patterns(id).length
  }

  /** The audit blocklist — self-border-free literals with nested pairs
    * (see object scaladoc); mirrored verbatim in the oracle VALUES. */
  private[ops] val Patterns: IndexedSeq[String] =
    IndexedSeq("at", "data", "me", "merge", "art", "part", "join", "scan",
      "stream")

  /** Block threshold: total hits at or above this label the doc 'block'. */
  private[ops] val BlockAt = 12L

  val qs: Seq[Q] = Seq(

    // ---- q324: Aho–Corasick blocklist audit ----
    // Spark compiles the pattern set into the automaton and scans every
    // document once, reporting total occurrences (ALL patterns, nested
    // ones included), distinct patterns hit, the earliest match start,
    // and the block/keep gate; the oracle recomputes each pattern's
    // (non-overlapping == exact, by the self-border-free property)
    // occurrence count with the replace-length formula and the earliest
    // hit with position(). A goto/fail/output defect — a missed nested
    // match, a wrong fail target after a mismatch — breaks the hashes.
    Q("q324_blocklist_filter",
      raw"""WITH pats AS (SELECT * FROM (VALUES ('at'), ('data'), ('me'),
         |    ('merge'), ('art'), ('part'), ('join'), ('scan'), ('stream'))
         |    p(pat)),
         |cnt AS (SELECT d.doc_id, p.pat,
         |    CAST((len(coalesce(d.text, ''))
         |      - len(replace(coalesce(d.text, ''), p.pat, '')))
         |      // len(p.pat) AS BIGINT) AS c,
         |    position(p.pat IN coalesce(d.text, '')) AS fp
         |  FROM documents d, pats p)
         |SELECT doc_id,
         |  CAST(sum(c) AS BIGINT) AS n_hits,
         |  CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_patterns,
         |  CAST(coalesce(min(CASE WHEN c > 0 THEN fp END), 0) AS BIGINT)
         |    AS first_hit,
         |  CASE WHEN sum(c) >= ${BlockAt} THEN 'block' ELSE 'keep' END
         |    AS label
         |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ac = new AhoCorasick(Patterns)
      tSpread(s, dir, "documents")
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          var hits = 0L
          val perPat = new Array[Long](ac.patternCount)
          var first = 0L
          ac.scan(text) { (pid, end) =>
            hits += 1
            perPat(pid) += 1
            val start = end - ac.patternLength(pid) + 2 // 1-based start
            if (first == 0L || start < first) first = start
          }
          (id, hits, perPat.count(_ > 0).toLong, first,
            if (hits >= BlockAt) "block" else "keep")
        })
        .toDF("doc_id", "n_hits", "n_patterns", "first_hit", "label")
        .orderBy(col("doc_id"))
    }
  )
}
