package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and URL admission (RFC 9309) — the crawl-front
  * gate between [[graft.sources.WarcShards]] ingestion and everything
  * downstream keyed by URL: a compliant crawl pipeline must drop pages
  * its agent was never allowed to fetch BEFORE they enter curation, and
  * a frontier builder must not emit candidate URLs a host disallows.
  * (Reference scope: cosmos-xenna pipelines treat crawl compliance as a
  * user stage; here it is a first-class operator over the same WARC
  * tables, like `Html`/`Url`.)
  *
  * Everything is a pure `Column`/window/array-lambda composition — NO
  * UDFs, same contract as [[Url]]: admission touches every URL at
  * 100 TB and must stay inside codegen. The shapes are crawl-scale by
  * construction:
  *
  *   - [[rules]] parses per-host bodies with windows PARTITIONED BY
  *     HOST (RFC 9309 caps a robots.txt at 500 KiB, so a host's line
  *     set is one small partition-local sort; parallelism = |hosts|);
  *   - [[admit]] aggregates each host's rule set into ONE array row
  *     (bounded by the same cap) and joins urls→rule-arrays once on
  *     host — the longest-match argmax then runs as an array lambda
  *     per URL with no per-URL groupBy and no second shuffle. Hosts
  *     without robots rows admit everything, per the RFC.
  *
  * Matching semantics implemented (RFC 9309 §2.2): groups of
  * consecutive `User-agent` lines share the rules that follow; rules
  * before any group are ignored; empty `Allow`/`Disallow` values match
  * nothing (a group whose only rules are empty — the `Disallow:`
  * allow-all idiom — still EXISTS for agent selection and admits
  * everything, see [[rules]]); the most specific (longest-pattern) rule
  * wins with `Allow` winning exact ties; `*` wildcards and the `$`
  * end-anchor are honored; keys and agent names are case-insensitive,
  * paths are case-sensitive. Agent-group selection is simplified to
  * "exact product token, else the `*` group" (the RFC's longest-prefix
  * product-token match matters only for versioned agent strings —
  * callers pass the bare token). Per RFC 9309 §2.2.2, `%XX` escapes of
  * UNRESERVED octets are decoded and surviving escapes' hex uppercased
  * on BOTH rule paths and URL paths before comparison
  * ([[normalizePercent]]), so `/a%2Db` and `/a-b` match while `/a%2Fb`
  * and `/a/b` stay distinct (decoding a reserved octet would change
  * path structure).
  */
object Robots {

  /** Parse per-host robots.txt bodies into one row per (host, agent,
    * rule): `host, agent, allow, path, has_wildcard`. `bodies` needs a
    * host column and a STRING body column (decode bytes upstream, e.g.
    * via `WarcShards.decodedResponses`). Agents are lowercased; paths
    * keep their case. Empty-path rules (the "allow everything" idiom
    * `Disallow:` with no value) match nothing per the RFC and are not
    * emitted AS RULES — but the group they name must still win agent
    * selection (RFC 9309 §2.2.1: a matched group with no applicable
    * rules admits everything; falling through to `*` would apply the
    * WRONG group). Every group therefore also emits one zero-length
    * `Allow` marker row (`path = ""`): it matches every path at the
    * lowest possible precedence (len 0, beaten by any real rule), so it
    * encodes exactly "this group exists and its default verdict is
    * allow" for [[admit]]/[[crawlDelays]] without a side-channel.
    */
  def rules(bodies: DataFrame, hostCol: String = "host",
      bodyCol: String = "body"): DataFrame = {
    val grouped = groupedLines(bodies, hostCol, bodyCol)
    val ruleRows = grouped
      .where(col("key").isin("allow", "disallow") && col("value") =!= "" &&
        col("grp") > 0)
      .select(col("host"), col("grp"), (col("key") === "allow").as("allow"),
        col("value").as("path"))
    val agents = groupAgents(grouped)
    // small per-host metadata joining small per-host metadata: both
    // sides are robots lines (≤500 KiB/host), keyed identically
    val real = agents.join(ruleRows, Seq("host", "grp"))
      .select(col("host"), col("agent"), col("allow"), col("path"),
        col("path").contains("*").or(col("path").contains("$"))
          .as("has_wildcard"))
    val markers = agents
      .select(col("host"), col("agent"), lit(true).as("allow"),
        lit("").as("path"), lit(false).as("has_wildcard"))
    real.unionByName(markers)
  }

  /** Per-host `Crawl-delay` for `agent` (seconds, fractional allowed) —
    * the de-facto politeness directive (not in RFC 9309, but honored by
    * most crawlers and load-bearing for frontier scheduling). Same group
    * semantics as [[admit]]: the agent's own group is preferred over
    * `*`; several directives in scope collapse to the MINIMUM (the
    * conservative read). Group preference follows group EXISTENCE, not
    * directive presence (RFC 9309 §2.2.1): an exact-agent group WITHOUT
    * a Crawl-delay never inherits the `*` group's value — the host is
    * simply absent. Hosts without a parseable directive in the selected
    * group are absent — the caller owns the default.
    * Output: (host, crawl_delay_s).
    */
  def crawlDelays(bodies: DataFrame, agent: String, hostCol: String = "host",
      bodyCol: String = "body"): DataFrame = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val grouped = groupedLines(bodies, hostCol, bodyCol)
    val delayRows = grouped
      .where(col("key") === "crawl-delay" && col("grp") > 0)
      .withColumn("delay_s", col("value").try_cast("double")) // junk → null, not ANSI throw
      .where(col("delay_s").isNotNull && col("delay_s") >= 0)
      .select(col("host"), col("grp"), col("delay_s"))
    val byHost = Window.partitionBy("host")
    // LEFT join: agent-group rows with no directive survive, so the
    // exact-group-preference window sees every group the host declares
    groupAgents(grouped).join(delayRows, Seq("host", "grp"), "left")
      .where(col("agent").isin(a, "*"))
      .withColumn("exact", col("agent") === a)
      .withColumn("has_exact", max(col("exact")).over(byHost))
      .where(col("exact") === col("has_exact"))
      .where(col("delay_s").isNotNull)
      .groupBy("host")
      .agg(min(col("delay_s")).as("crawl_delay_s"))
  }

  /** Shared line machinery: one row per robots.txt line with comments
    * stripped, `key`/`value` split (keys lowercased), and the RFC group
    * id (`grp`): a group starts at a User-agent line NOT preceded by
    * another User-agent line; grp 0 = ignored preamble. The window is
    * partitioned by host — a body is ≤500 KiB by the RFC, one small
    * partition-local sort.
    */
  private def groupedLines(bodies: DataFrame, hostCol: String,
      bodyCol: String): DataFrame = {
    val byPos = Window.partitionBy("host").orderBy("pos")
    bodies
      .select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\r?\n")).as(Seq("pos", "raw")))
      // comments run to end of line; keys are case-insensitive
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .withColumn("key", lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))))
      .withColumn("value", trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)))
      .withColumn("is_ua", col("key") === "user-agent")
      .withColumn("starts",
        col("is_ua") && !coalesce(lag(col("is_ua"), 1).over(byPos), lit(false)))
      .withColumn("grp", sum(when(col("starts"), 1).otherwise(0)).over(byPos))
  }

  /** (host, grp, agent) — the agents naming each group. */
  private def groupAgents(grouped: DataFrame): DataFrame =
    grouped.where(col("is_ua") && col("grp") > 0)
      .select(col("host"), col("grp"), lower(col("value")).as("agent")).distinct()

  /** `Sitemap:` URLs declared in robots bodies (host, sitemap) — they
    * live outside agent groups and seed frontier builders.
    */
  def sitemaps(bodies: DataFrame, hostCol: String = "host",
      bodyCol: String = "body"): DataFrame =
    bodies
      .select(col(hostCol).as("host"),
        explode(split(col(bodyCol), "\r?\n")).as("raw"))
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .where(lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))) === "sitemap")
      .select(col("host"),
        trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)).as("sitemap"))
      .where(col("sitemap") =!= "")

  /** RFC 9309 §2.2.2 percent-encoding normalization, pure-Column: `%XX`
    * escapes of UNRESERVED octets (ALPHA / DIGIT / `-` `.` `_` `~`,
    * RFC 3986 §2.3) decode to the literal character, and every surviving
    * escape's hex digits are uppercased — so a rule and a path match no
    * matter which spelling the webmaster and the crawler chose.
    * Reserved / non-ASCII escapes stay encoded (decoding `%2F` would
    * turn it into a path separator — a structural change, not a
    * spelling). Malformed escapes (`%` not followed by two hex digits)
    * pass through untouched; a guard keeps escape-free strings (the
    * overwhelming crawl majority) on a single `contains` check.
    *
    * Shape: split on a `(?=%)` lookahead (each escape starts its own
    * segment), one array lambda per segment, re-concat — all codegen'd
    * collection ops, zero UDFs, applied per-URL at 100 TB.
    */
  def normalizePercent(s: Column): Column = {
    val normalized = concat_ws("", transform(split(s, "(?=%)"), seg => {
      val hex = upper(seg.substr(lit(2), lit(2)))
      val isEsc = seg.startsWith("%") && hex.rlike("^[0-9A-F]{2}$")
      val code = conv(hex, 16, 10).cast("int")
      val unreserved =
        (code >= 0x30 && code <= 0x39) || (code >= 0x41 && code <= 0x5A) ||
        (code >= 0x61 && code <= 0x7A) || code.isin(0x2D, 0x2E, 0x5F, 0x7E)
      val rest = seg.substr(lit(4), length(seg))
      when(!isEsc, seg)
        .when(unreserved, concat(chr(code), rest))
        .otherwise(concat(lit("%"), hex, rest))
    }))
    when(s.isNull, lit(null).cast("string"))
      .when(!s.contains("%"), s)
      .otherwise(normalized)
  }

  /** A rule path as an anchored regex: specials escaped, `*` → `.*`,
    * a trailing `$` kept as the end anchor. Built column-side so rule
    * tables can come straight off a crawl with no driver round-trip.
    */
  private def ruleRegex(path: Column): Column = {
    val endAnchored = path.endsWith("$")
    val body = when(endAnchored, path.substr(lit(1), length(path) - 1))
      .otherwise(path)
    val escaped = regexp_replace(body, "([\\.\\[\\]\\{\\}\\(\\)\\+\\?\\^\\$\\|\\\\])", "\\\\$1")
    val wild = regexp_replace(escaped, "\\*", ".*")
    concat(lit("^"), wild, when(endAnchored, lit("$")).otherwise(lit("")))
  }

  /** Admission: `urls` gains a `robots_allowed` boolean (and keeps all
    * its columns). `ruleRows` is [[rules]] output; `agent` is the
    * crawler's product token. Per host the agent's own group is
    * preferred over `*`; within the group the longest matching rule
    * wins, `Allow` winning ties; no rules / no robots row → allowed.
    *
    * Plan shape: rules collapse to ONE row per host (group-preference
    * resolved with a window over the per-host rule metadata, then
    * `collect_list` into a struct array), the urls side joins that once
    * on host, and the match/argmax is an array lambda — the only
    * exchange on the 100-TB side is the host-keyed join, which AQE
    * broadcasts whenever the crawled host set fits.
    *
    * Streaming: `urls` may be a streaming Dataset — the rule side is
    * static, so this plans as a stream-static join and gates URLs live
    * at ingest (spec-asserted batch parity). The static side is planned
    * once per query; for live rule refresh WITHOUT a query restart,
    * route through [[graft.streaming.StreamingRobots]] (foreachBatch
    * re-plans per micro-batch against a rate-limited snapshot).
    */
  def admit(urls: DataFrame, ruleRows: DataFrame, agent: String,
      urlCol: String = "url"): DataFrame = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val byHost = Window.partitionBy("host")
    val chosen = ruleRows
      .where(col("agent").isin(a, "*"))
      .withColumn("exact", col("agent") === a)
      .withColumn("has_exact", max(col("exact")).over(byHost))
      .where(col("exact") === col("has_exact"))
      // §2.2.2: rules and paths compare percent-normalized; precedence
      // (len) counts the normalized octets
      .withColumn("path_n", normalizePercent(col("path")))
      .withColumn("rx", when(col("has_wildcard"), ruleRegex(col("path_n")))
        .otherwise(lit(null).cast("string")))
      .groupBy("host")
      .agg(collect_list(struct(
        length(col("path_n")).as("len"),
        when(col("allow"), 1).otherwise(0).as("allow"),
        col("path_n").as("path"),
        col("rx").as("rx"))).as("robots_rules"))
    val path = normalizePercent(
      coalesce(nullif(try_parse_url(col(urlCol), lit("PATH")), lit("")), lit("/")))
    val hits = filter(col("robots_rules"), r =>
      when(r.getField("rx").isNotNull, regexp_like(path, r.getField("rx")))
        .otherwise(path.startsWith(r.getField("path"))))
    val winner = array_max(transform(hits, r =>
      struct(r.getField("len").as("len"), r.getField("allow").as("allow"))))
    urls
      .withColumn("__robots_host", Url.host(col(urlCol)))
      .join(chosen.withColumnRenamed("host", "__robots_host"),
        Seq("__robots_host"), "left")
      .withColumn("robots_allowed",
        col("robots_rules").isNull || winner.isNull ||
          winner.getField("allow") === 1)
      .drop("__robots_host", "robots_rules")
  }
}
