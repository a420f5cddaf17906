package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt compliance filtering (RFC 9309, the Robots Exclusion
  * Protocol) — the crawl-side gate every 100 TB web pipeline needs
  * before a URL is fetched or kept. Entirely RELATIONAL (parse = line
  * explode + window-function group islands; match = one equi-join on
  * host with a LIKE predicate; verdict = one window top-1), so the
  * whole pipeline is codegen'd, shuffle-bounded by the rule table, and
  * replayable verbatim in SQL:
  *
  *  - GROUPS: consecutive `User-agent:` lines open a group whose rules
  *    bind to all listed agents; comments (`#`) stripped; blank lines
  *    ignored (they do NOT close a group per the RFC's grammar — only
  *    a new agent run does); field names case-insensitive.
  *  - AGENT SELECTION: a host's rules for the crawler's agent token if
  *    any group names it, else the `*` group, else no rules (allowed).
  *  - MATCHING: rule paths are prefix patterns with `*` wildcards and
  *    a trailing-`$` end anchor (RFC 9309 §2.2.3), compiled to LIKE
  *    patterns (escape `\`/`%`/`_`, then `*`→`%`, anchor drops the
  *    trailing `%`); most-specific rule wins = longest PATTERN, Allow
  *    beats Disallow on equal length (§2.2.2); no matching rule =
  *    allowed; an EMPTY rule value is no rule (the `Disallow:`
  *    allow-all idiom).
  */
object Robots {

  /** Parse robots.txt bodies into a flat rule table
    * `(host, agent, rtype, pattern, pattern_len)` — one row per
    * (group agent × group rule). */
  def parseRules(robots: DataFrame, hostCol: String,
      textCol: String): DataFrame = {
    // RFC 9309 permits CRLF line endings (and they are common in the
    // wild); Spark's trim strips only spaces, so split on \r?\n — a
    // trailing \r left in an agent name or pattern would otherwise make
    // named groups unmatchable and compile LIKE patterns that never hit,
    // silently failing the gate OPEN.
    val lines = robots.select(col(hostCol).as("host"),
      posexplode(split(coalesce(col(textCol), lit("")), "\r?\n"))
        .as(Seq("ln", "raw")))
    val cleaned = lines
      .select(col("host"), col("ln"),
        trim(regexp_replace(col("raw"), "#.*", "")).as("line"))
      .filter(col("line").contains(":"))
      .select(col("host"), col("ln"),
        lower(trim(substring_index(col("line"), ":", 1))).as("field"),
        trim(expr("substring(line, instr(line, ':') + 1)")).as("value"))
      .filter(col("field").isin("user-agent", "allow", "disallow"))
    val byLine = Window.partitionBy("host").orderBy("ln")
    val grouped = cleaned
      .withColumn("isua", (col("field") === "user-agent").cast("int"))
      .withColumn("newgrp",
        when(col("isua") === 1 &&
          coalesce(lag("isua", 1).over(byLine), lit(0)) === 0, 1)
          .otherwise(0))
      .withColumn("grp", sum("newgrp").over(byLine))
    val agents = grouped.filter(col("field") === "user-agent")
      .select(col("host"), col("grp"), lower(col("value")).as("agent"))
    val rules = grouped
      .filter(col("field") =!= "user-agent" && col("value") =!= "")
      .select(col("host"), col("grp"), col("field").as("rtype"),
        col("value").as("pattern"))
    // ranking length per RFC 9309 §2.2.2 — OCTETS (UTF-8 bytes, via
    // octet_length — a non-ASCII pattern ranks by its byte weight as a
    // conformant crawler would), with the trailing `$` anchor excluded:
    // it is a metacharacter, not matched text, so `Allow: /p*` (3)
    // must not tie-beat `Disallow: /pq$` (raw 4, ranking 3 → allow-tie
    // applies, but `Disallow: /pqr$` ranks 4 and wins). `*` stays
    // counted (it can match ≥0 octets; full §2.2.2 fidelity would need
    // per-path match lengths — documented approximation).
    agents.join(rules, Seq("host", "grp"))
      .select(col("host"), col("agent"), col("rtype"), col("pattern"),
        (octet_length(col("pattern")) -
          when(col("pattern").endsWith("$"), 1).otherwise(0))
          .cast("long").as("pattern_len"))
  }

  /** Per-URL verdict for `agent`: output = `urls` + `allowed` boolean +
    * `matched` (the winning rule's pattern, null when no rule applied).
    * The decision is a function of (host, path) only, so it is computed
    * once per DISTINCT (host, path) and joined back — at 100 TB the
    * expensive side is the URL table and this keeps the LIKE join on
    * the (small) distinct key set × (small) rule table. */
  def filterUrls(urls: DataFrame, rules: DataFrame, agent: String,
      hostCol: String, pathCol: String): DataFrame = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val hasSpec = rules.groupBy("host")
      .agg(max(when(col("agent") === agentLc, 1).otherwise(0))
        .as("has_spec"))
    val chosen = rules.join(hasSpec, Seq("host"))
      .filter((col("has_spec") === 1 && col("agent") === agentLc) ||
        (col("has_spec") === 0 && col("agent") === "*"))
      .withColumn("likewild",
        replace(replace(replace(replace(col("pattern"),
          lit("\\"), lit("\\\\")), lit("%"), lit("\\%")),
          lit("_"), lit("\\_")), lit("*"), lit("%")))
      .withColumn("likepat",
        when(col("pattern").endsWith("$"),
          expr("substring(likewild, 1, length(likewild) - 1)"))
          .otherwise(concat(col("likewild"), lit("%"))))
      .select("host", "rtype", "pattern", "pattern_len", "likepat")
    val hp = urls.select(col(hostCol).as("host"), col(pathCol).as("path"))
      .distinct()
    val m = hp.join(chosen,
        Seq("host"), "left")
      .withColumn("hit",
        col("likepat").isNotNull &&
          expr("path LIKE likepat ESCAPE '\\\\'"))
    // most-specific match: longest pattern, allow beats disallow on
    // ties ('allow' < 'disallow' sorts first); unmatched rules rank
    // below every hit. The final pattern tiebreak makes the TOTAL
    // order deterministic — without it, `Allow: /abc` vs `Allow:
    // /abc$` (equal ranking length after the anchor exclusion) would
    // leave the reported `matched` pattern to engine whim.
    val w = Window.partitionBy("host", "path")
      .orderBy(col("hit").desc, col("pattern_len").desc,
        col("rtype").asc, col("pattern").asc)
    val verdicts = m
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("host").as("__vh"), col("path").as("__vp"),
        (!col("hit") || col("rtype") === "allow").as("allowed"),
        when(col("hit"), col("pattern")).as("matched"))
    urls.join(verdicts,
      urls(hostCol) === col("__vh") && urls(pathCol) === col("__vp"),
      "left")
      .drop("__vh", "__vp")
      .withColumn("allowed", coalesce(col("allowed"), lit(true)))
  }
}
