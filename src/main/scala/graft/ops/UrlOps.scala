package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for web-corpus curation (north-star extension) — the
  * C4 / RefinedWeb stage-1 passes that run BEFORE any text operator:
  * canonicalize the URL, key documents by registered domain, drop
  * blocklisted domains, dedup by canonical URL.
  *
  * Everything is a chain of RE2-portable `regexp_replace`s (no
  * lookaround/backreferences — the q87 redaction discipline): pure
  * codegen, narrow, streams at scan speed, and the DuckDB oracle
  * replays the exact strings. At 100 TB these are the cheapest filters
  * in the pipeline and belong before every text shuffle.
  */
object UrlOps {

  /** Canonical form: lowercase, fragment and query stripped (corpus
    * curation treats `?utm_source=…` variants as one page — the C4
    * simplification; session-critical queries are long gone by crawl
    * time), scheme and a leading `www.` stripped, trailing slash
    * stripped. The result is `host/path`, the natural dedup key. */
  def canonicalizeUrl(url: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(url), "#.*$", ""),
            "\\?.*$", ""),
          "^[a-z][a-z0-9+.-]*://", ""),
        "^www\\.", ""),
      "/$", "")

  /** Host of a canonical URL (everything before the first '/'). */
  def hostOf(canonical: Column): Column =
    regexp_replace(canonical, "/.*$", "")

  /** Registered domain: the last two dot-labels of the host. A public-
    * suffix-list-aware build swaps this expression for a broadcast PSL
    * join (co.uk-style suffixes need the list; the operator shape —
    * narrow extract or small broadcast — is identical). */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** Stamp canonical + domain columns. */
  def withCanonicalUrl(df: DataFrame, urlCol: String): DataFrame = {
    val canon = canonicalizeUrl(col(urlCol))
    df.withColumn("canonical_url", canon)
      .withColumn("domain", registeredDomain(hostOf(canon)))
  }

  /** Drop documents whose registered domain is blocklisted. The
    * blocklist is list-sized (thousands), never corpus-sized —
    * broadcast anti-join, no corpus shuffle. */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bl = blocked.toDF("__blocked_domain")
    val stamped = withCanonicalUrl(df, urlCol)
    stamped.join(broadcast(bl),
        stamped("domain") === col("__blocked_domain"), "left_anti")
  }

  /** URL-level exact dedup: keep the lowest-id document per canonical
    * URL — the crawl-dedup pass that removes re-crawls and tracking-
    * parameter variants before any content hashing. Same one-narrow-
    * key shuffle shape as [[Dedup.exact]]. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val keyed = df.withColumn("__curl", canonicalizeUrl(col(urlCol)))
    val keep = keyed.groupBy("__curl").agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(keep, Seq(idCol), "left_semi")
  }
}
