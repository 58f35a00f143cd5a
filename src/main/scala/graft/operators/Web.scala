package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / host-level curation — the FineWeb/CCNet pipeline stage that
  * runs BEFORE everything else in this repo: extract the host from each
  * document's URL, roll up per-host statistics (the crawl-health view a
  * curator reads to spot spam farms and boilerplate mills), and apply a
  * domain blocklist with subdomain inheritance (the UT1/adult-list
  * "URL filtering" gate).
  *
  * Reference scope note: the reference stores free-form metadata
  * (storage.py:19) and filters on it client-side; it has no URL layer.
  * These operators are the training-data-pipeline extension surface
  * (BASELINE.json) for the `source`-as-URL case.
  *
  * Scale design: host extraction is a per-row codegen regexp (no UDF,
  * no shuffle); host stats aggregate two-level (host, lang) → host so
  * the distinct-language count never expands the corpus
  * (count-distinct EXPAND doubles the exchange); the blocklist join
  * explodes each host into its ≤label-count suffix chain (bounded
  * fan-out, like the shingle frames) and semi-joins the BROADCAST
  * blocklist — the corpus never shuffles for the blocklist, and
  * subdomain inheritance ("block example.com ⇒ block a.b.example.com")
  * becomes an equi-join instead of an un-indexable suffix predicate.
  */
object Web {

  /** Host part of a URL: scheme-mandatory, userinfo stripped, port and
    * path/query/fragment excluded, lowercased. One regexp so the SAME
    * pattern runs in Spark (java.util.regex) and DuckDB (RE2) — the
    * pattern stays inside the dialect intersection (no backrefs, no
    * lookaround) and both engines return '' on no-match. Non-URL
    * strings (no `scheme://`) yield ''. */
  val HostPattern: String = "^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)"

  def host(url: Column): Column = regexp_extract(lower(url), HostPattern, 1)

  /** Registrable-domain heuristic: the last two labels of the host
    * (`a.b.example.org` → `example.org`); single-label hosts are their
    * own apex. A public-suffix list upgrade slots in as a broadcast
    * suffix table via [[hostSuffixes]] — same join shape. */
  def apexDomain(hostCol: Column): Column = {
    val lastTwo = regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)
    when(lastTwo === "", hostCol).otherwise(lastTwo)
  }

  /** Every dot-suffix of a host, most-specific first:
    * `a.b.example.org` → [a.b.example.org, b.example.org, example.org,
    * org]. Bounded by the label count (≤ ~5 on real hosts) — the
    * blocklist probe fan-out, analogous to the shingle explode. */
  def hostSuffixes(hostCol: Column): Column = {
    val parts = split(hostCol, "\\.")
    transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts)), "."))
  }

  /** Per-host crawl statistics: `(host, apex, n_docs, n_chars,
    * n_tokens, n_langs)` — the table a curator ranks to find hosts
    * worth blocking (mega-hosts with one language and boilerplate-flat
    * token counts read as farms).
    *
    * Scale shape: one (host, lang) exchange of counted partials, then
    * a host-keyed roll-up of the language-bounded frame — `n_langs` is
    * an exact distinct WITHOUT `countDistinct`'s EXPAND doubling the
    * corpus-side exchange. Hosts are Zipf-skewed; partial aggregation
    * absorbs the head before the shuffle. */
  def hostStats(docs: DataFrame, urlCol: String, textCol: String,
      nCharsCol: String, langCol: String): DataFrame =
    docs
      .select(host(col(urlCol)).as("host"), col(langCol).as("__lang"),
        col(nCharsCol).as("__nc"), TextOps.tokenCount(col(textCol)).as("__nt"))
      .groupBy("host", "__lang")
      .agg(count(lit(1)).as("__docs"), sum("__nc").as("__chars"),
        sum("__nt").as("__toks"))
      .groupBy("host")
      .agg(
        sum("__docs").as("n_docs"),
        sum("__chars").as("n_chars"),
        sum("__toks").as("n_tokens"),
        count(lit(1)).as("n_langs"))
      .select(col("host"), apexDomain(col("host")).as("apex"),
        col("n_docs"), col("n_chars"), col("n_tokens"), col("n_langs"))

  /** Blocklist URL filter with subdomain inheritance: drop every doc
    * whose host — or ANY dot-suffix of it — appears in `blocked`
    * (entries are exact hosts or apex domains). `notexample.org` does
    * NOT match a blocked `example.org` (label-boundary exact, not
    * string suffix).
    *
    * Scale shape: a ZERO-SHUFFLE codegen projection — the blocklist
    * ships once in the task closure (UT1-class lists are millions of
    * rows ≈ tens of MB; `isInCollection` compiles to an O(1) InSet hash
    * probe per suffix) and every row is an independent filter, the
    * [[Sketches]] Bloom-prefilter shape but exact. No join, no
    * exchange: the plan is Scan → Filter, PlanSpec-pinned. For a
    * blocklist that lives in a TABLE, [[urlFilterTable]] is the
    * join-shaped equivalent (WebSpec pins them row-equal). */
  def urlFilter(docs: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame =
    if (blocked.isEmpty) docs
    else docs.filter(!exists(hostSuffixes(host(col(urlCol))),
      s => s.isInCollection(blocked)))

  /** [[urlFilter]] when the blocklist is data (a maintained table, not
    * a shipped artifact): each host explodes into its ≤label-count
    * suffix chain of `(id, suffix)` SCALARS, semi-joined against the
    * BROADCAST blocklist; the matched-id frame — bounded by the blocked
    * subset, which a curation blocklist keeps a small fraction of the
    * corpus — broadcasts back for the anti-join, so the corpus-side
    * rows (text included) never cross an exchange. If the blocklist is
    * expected to drop MOST of the corpus, flip the keep/drop sides —
    * the operator contract (like [[Budget.withBucketBounds]]'s narrow-
    * frame contract) is that blocked ids are the broadcastable side. */
  def urlFilterTable(docs: DataFrame, urlCol: String, idCol: String,
      blockedHosts: DataFrame): DataFrame = {
    val blockCol = blockedHosts.columns.head
    val blockedIds = docs
      .select(col(idCol),
        explode(hostSuffixes(host(col(urlCol)))).as("__sfx"))
      .join(broadcast(blockedHosts.select(col(blockCol).as("__sfx"))),
        Seq("__sfx"), "left_semi")
      .select(idCol).distinct()
    docs.join(broadcast(blockedIds), Seq(idCol), "left_anti")
  }
}
