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
    * whose host — or ANY dot-suffix of it — appears in `blockedHosts`
    * (one `host STRING` column; entries are exact hosts or apex
    * domains). `notexample.org` does NOT match a blocked `example.org`
    * (label-boundary exact, not string suffix).
    *
    * Scale shape: the suffix chain explodes ≤ label-count rows per doc
    * of `(id, suffix)` scalars, semi-joined against the BROADCAST
    * blocklist (UT1-class lists are millions of rows — megabytes — and
    * broadcast fine); the surviving anti-join keys on `idCol` against
    * the matched-id frame, which is bounded by the blocked subset. The
    * corpus text crosses no shuffle at any point. */
  def urlFilter(docs: DataFrame, urlCol: String, idCol: String,
      blockedHosts: DataFrame): DataFrame = {
    val withHost = docs.withColumn("__host", host(col(urlCol)))
    val blockCol = blockedHosts.columns.head
    val blockedIds = withHost
      .select(col(idCol), explode(hostSuffixes(col("__host"))).as("__sfx"))
      .join(broadcast(blockedHosts.select(col(blockCol).as("__sfx"))),
        Seq("__sfx"), "left_semi")
    withHost.join(blockedIds.select(idCol), Seq(idCol), "left_anti")
      .drop("__host")
  }
}
