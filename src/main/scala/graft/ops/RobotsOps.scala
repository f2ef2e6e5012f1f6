package graft.ops

import org.apache.spark.sql.functions._
import graft.Q
import graft.schema.Tables.t

/** robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol) — the
  * crawl-policy gate: before a frontier fetches anything, every URL must
  * pass the host's robots rules, so a 100 TB pipeline evaluates
  * billions of (path, policy) decisions. The reference has no crawl
  * surface (`/root/reference/pkg/converter/converter.go:52-57`).
  *
  * What is REAL here:
  *   - the file grammar: comment stripping, case-insensitive field
  *     names, group formation (consecutive User-agent lines share the
  *     following rule block);
  *   - GROUP SELECTION: the most specific matching user-agent group wins
  *     and `*` applies only when nothing longer matches — the fixture
  *     always contains a catch-all `Disallow: /` group, so an evaluator
  *     that wrongly merges groups or falls through to `*` disallows
  *     everything and fails loudly;
  *   - rule matching with `*` wildcards and the `$` end anchor
  *     (RFC 9309 §2.2.3);
  *   - precedence: the LONGEST matching pattern wins; on a tie, Allow
  *     wins (§2.2.2).
  *
  * Strictness: the per-doc policy varies by schedule (a conditional
  * anchored wildcard Disallow over ".tmp" paths, an id-dependent
  * disallowed prefix), five probe paths cover every decision class (no-match
  * default-allow, prefix disallow, longer-Allow override, wildcard+$
  * match, id-dependent prefix), and the oracle states the expected
  * allow-mask closed-form.
  */
object RobotsOps {

  // --------------------------------------------------------- schedule

  private[ops] final case class Schedule(id: Long) {
    val tmpRule: Boolean = id % 2 == 0
    val prefixSeg: Long = id % 5
    def robotsTxt: String = {
      val sb = new StringBuilder
      sb.append("# synthetic policy for example-").append(id).append(".test\n")
      sb.append("User-agent: graftbot\n")
      sb.append("Disallow: /private/\n")
      sb.append("Allow: /private/ok\n")
      if (tmpRule) sb.append("Disallow: /*.tmp$\n")
      sb.append(s"Disallow: /p$prefixSeg/\n")
      sb.append("Crawl-delay: 3\n") // non-rule field: must be skipped
      sb.append("\n")
      sb.append("User-agent: *\n") // the trap group: everything forbidden
      sb.append("Disallow: /\n")
      sb.toString
    }
    /** The five probe paths — one per decision class. */
    def probes: Seq[String] = Seq(
      "/", "/private/x", "/private/ok", s"/file${id % 3}.tmp", s"/p$prefixSeg/z")
    /** Closed-form expected allow flags (mirrored in the oracle). */
    def expectedMask: Long = 1L + 4L + (if (tmpRule) 0L else 8L)
  }

  // ------------------------------------------------------------ parser

  private[ops] final case class Rule(allow: Boolean, pattern: String)
  private[ops] final case class Group(agents: Seq[String], rules: Seq[Rule])

  /** Parse the file into user-agent groups (comments stripped,
    * field names case-insensitive, consecutive UA lines share a block). */
  private[ops] def parseRobots(txt: String): Seq[Group] = {
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules)
      agents = Vector.empty; rules = Vector.empty; inRules = false
    }
    txt.split("\n", -1).foreach { rawLine =>
      val line = rawLine.split("#", 2)(0).trim
      if (line.nonEmpty) {
        val c = line.indexOf(':')
        if (c > 0) {
          val field = line.substring(0, c).trim.toLowerCase
          val value = line.substring(c + 1).trim
          field match {
            case "user-agent" =>
              if (inRules) flush()
              // RFC 9309 requires a non-empty product token: a blank UA
              // would startsWith-match EVERY crawler and outrank `*`
              if (value.nonEmpty) agents :+= value.toLowerCase
            case "allow" => inRules = true; rules :+= Rule(allow = true, value)
            case "disallow" => inRules = true; rules :+= Rule(allow = false, value)
            case _ => inRules = true // crawl-delay etc.: group content, not a rule
          }
        }
      }
    }
    flush()
    groups.result()
  }

  /** RFC 9309 §2.2.3 pattern match: literal prefix with `*` wildcards,
    * optional `$` end anchor. */
  private[ops] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val parts = pat.split("\\*", -1)
    // greedy left-to-right scan: first part must be a prefix, the rest
    // found in order; with the $ anchor the last part must end the path
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part)) return false
        pos = part.length
      } else if (i == parts.length - 1 && anchored) {
        if (!(path.length - pos >= part.length && path.endsWith(part))) return false
        pos = path.length
      } else {
        val at = path.indexOf(part, pos)
        if (at < 0) return false
        pos = at + part.length
      }
      i += 1
    }
    !anchored || pos == path.length
  }

  /** Group selection (§2.2.1): the longest user-agent token that is a
    * prefix of ours wins; `*` only if nothing else matches. */
  private[ops] def selectGroup(groups: Seq[Group], agent: String): Option[Group] = {
    val named = groups.filter(_.agents.exists(a => a != "*" && agent.startsWith(a)))
    if (named.nonEmpty)
      Some(named.maxBy(_.agents.filter(a => agent.startsWith(a)).map(_.length).max))
    else groups.find(_.agents.contains("*"))
  }

  /** The access decision (§2.2.2): longest matching pattern wins; on a
    * tie Allow wins; no match ⇒ allowed. An empty pattern never blocks. */
  private[ops] def allowed(group: Group, path: String): Boolean = {
    val hits = group.rules.filter(r => r.pattern.nonEmpty && matches(r.pattern, path))
    if (hits.isEmpty) true
    else {
      val best = hits.map(_.pattern.length).max
      hits.filter(_.pattern.length == best).exists(_.allow)
    }
  }

  // ------------------------------------------------------------ queries

  val qs: Seq[Q] = Seq(

    // ---- robots.txt policy evaluation audit ----
    // Spark parses each document's synthetic policy and evaluates the
    // five probe paths for "graftbot" (the catch-all trap group makes a
    // group-selection bug disallow everything); the oracle states the
    // allow mask closed-form. Any grammar, group-selection, wildcard, or
    // precedence defect breaks the hashes.
    Q("q310_robots_filter",
      """SELECT doc_id,
        |  CAST(5 AS BIGINT) AS n_probes,
        |  CAST(2 + doc_id % 2 AS BIGINT) AS n_allowed,
        |  CAST(5 + CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 8 END AS BIGINT) AS allow_mask
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions(_.map { id =>
          val sch = Schedule(id)
          val group = selectGroup(parseRobots(sch.robotsTxt), "graftbot")
            .getOrElse(throw new IllegalStateException("no group matched"))
          val flags = sch.probes.map(p => allowed(group, p))
          val mask = flags.zipWithIndex.collect { case (true, k) => 1L << k }.sum
          (id, sch.probes.size.toLong, flags.count(identity).toLong, mask)
        })
        .toDF("doc_id", "n_probes", "n_allowed", "allow_mask")
        .orderBy(col("doc_id"))
    }
  )
}
