package graft.news

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt politeness gate on the fetch seam — the engine form of
  * the reference's per-article `can_fetch` check
  * (airflow_news/dags/news/utils.py:17-33, urllib.robotparser): a link
  * is fetched only if the outlet's robots.txt allows it for our
  * user-agent.
  *
  * Semantics follow urllib.robotparser: rules live in user-agent
  * groups; the group whose agent token is the longest substring of the
  * checked user-agent wins (`*` is the fallback); within the group the
  * FIRST rule (file order) whose path prefix matches decides; no match
  * ⇒ allowed; an empty `Disallow:` matches nothing.
  *
  * Scale shape: robots bodies are O(outlets) — a handful of KB — so
  * they parse on the driver (the same O(sources) seam the fetch plan
  * already has) into a rule table that BROADCAST-joins the link frame;
  * the verdict is pure column logic (longest-prefix via min rule
  * order), so gating a billion-link frame never shuffles it. */
object RobotsGate {

  /** One parsed rule: file order, path prefix, allow/deny. */
  final case class Rule(order: Int, prefix: String, allow: Boolean)

  /** Parse one robots.txt body into the rule list governing
    * `userAgent` (urllib.robotparser group selection: longest
    * agent-token substring match, `*` fallback). */
  def rulesFor(robotsTxt: String, userAgent: String): Seq[Rule] = {
    // group the file into (agentTokens, rules) entries
    val entries = Seq.newBuilder[(Seq[String], Seq[(String, Boolean)])]
    var agents = Seq.empty[String]
    var rules = Seq.empty[(String, Boolean)]
    var inRules = false
    for (raw <- robotsTxt.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      val (key, value) = line.split(":", 2) match {
        case Array(k, v) => (k.trim.toLowerCase, v.trim)
        case _ => ("", "")
      }
      key match {
        case "user-agent" =>
          if (inRules) { // a new group starts
            if (agents.nonEmpty) entries += ((agents, rules))
            agents = Seq.empty; rules = Seq.empty; inRules = false
          }
          agents :+= value.toLowerCase
        case "allow" | "disallow" if agents.nonEmpty =>
          inRules = true
          // empty Disallow matches nothing (allow-all); drop it
          if (value.nonEmpty) rules :+= ((value, key == "allow"))
        case _ => ()
      }
    }
    if (agents.nonEmpty) entries += ((agents, rules))
    val ua = userAgent.toLowerCase
    // longest agent token that is a substring of ua; '*' matches all
    // with length 0 (the fallback)
    val best = entries.result()
      .flatMap { case (as, rs) =>
        as.collect {
          case "*" => (0, rs)
          case a if ua.contains(a) => (a.length, rs)
        }
      }
      .sortBy(-_._1)
      .headOption
    best.toSeq.flatMap(_._2).zipWithIndex
      .map { case ((p, a), i) => Rule(i, p, a) }
  }

  /** Gate a link frame on per-outlet robots rules. `robotsBodies` is
    * (source_name, robots_body) — O(outlets) rows, collected on the
    * driver for parsing, re-emitted as a broadcast rule table. Links
    * whose decisive rule is Disallow are dropped; links with no
    * matching rule pass. `links` needs (source_name, link). */
  def filterAllowed(links: DataFrame, robotsBodies: DataFrame,
      userAgent: String): DataFrame = {
    val spark = links.sparkSession
    import spark.implicits._
    val ruleRows = robotsBodies.select("source_name", "robots_body")
      .as[(String, String)].collect()
      .flatMap { case (src, body) =>
        rulesFor(body, userAgent).map(r => (src, r.order, r.prefix, r.allow))
      }.toSeq
    if (ruleRows.isEmpty) return links
    val rules = ruleRows.toDF("source_name", "rule_order", "prefix", "allow")
    // path = URL minus scheme+host; robots prefixes match on the path
    val path = regexp_replace(col("link"), "^[a-z]+://[^/]*", "")
    // decisive rule = first MATCHING rule in file order (robotparser);
    // links none of whose rules match (or with no rules at all after
    // the left join) keep a non-matching row that defaults to allow
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source_name"), col("link"))
      .orderBy(when(col("m"), col("rule_order")).asc_nulls_last)
    links
      .join(broadcast(rules), Seq("source_name"), "left")
      .withColumn("m",
        col("prefix").isNotNull && startswith(path, col("prefix")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && (!col("m") || col("allow")))
      .drop("rule_order", "prefix", "allow", "m", "rn")
  }
}
