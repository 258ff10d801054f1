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

  /** Registered domain, 2-label heuristic: the last two dot-labels of
    * the host. Wrong for `co.uk`-style multi-label public suffixes —
    * use [[withRegisteredDomain]] (PSL-aware) for real crawls; this
    * stays as the zero-join fast path and the PSL miss fallback. */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** Embedded snapshot SUBSET of the Public Suffix List
    * (publicsuffix.org — public data, Mozilla-maintained, MPL-2.0).
    * Multi-label suffixes only: unlisted TLDs default to the 1-label
    * rule, which the 2-label fallback already implements, so
    * single-label entries (`com`, `org`, …) carry no information here.
    * A production deployment replaces this constant with the full
    * list (~10k rules, still KB-sized → same broadcast plan). Wildcard
    * (`*.ck`) and exception (`!www.ck`) rules live in
    * [[pslWildcardParents]] / [[pslExceptions]]. */
  val pslSnapshot: Seq[String] = Seq(
    // ccTLD second-level registries
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "gen.nz", "maori.nz",
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
    "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar", "mil.ar",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "av.tr", "bbs.tr",
    "gen.tr", "web.tr",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "k12.il", "muni.il",
    "co.id", "net.id", "or.id", "web.id", "sch.id", "go.id", "mil.id",
    "my.id", "biz.id", "ac.id",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my",
    "name.my",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "mi.th", "in.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph", "i.ph",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg", "eun.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa", "pub.sa",
    "sch.sa",
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk", "fam.pk", "biz.pk",
    "web.pk",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng", "name.ng",
    "sch.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "info.ke",
    // multi-label private registries common in crawls (PSL private
    // section): every user-site is an unrelated registrant
    "github.io", "gitlab.io", "blogspot.com", "appspot.com",
    "herokuapp.com", "wordpress.com", "cloudfront.net", "amazonaws.com",
    "azurewebsites.net", "netlify.app", "vercel.app", "web.app",
    "firebaseapp.com", "pages.dev", "workers.dev",
    // 3-label rules so the s3 match path is real
    "blogspot.co.uk", "blogspot.com.au", "blogspot.co.nz",
    "blogspot.com.br", "blogspot.co.il", "s3.amazonaws.com")

  /** PSL WILDCARD rules (`*.ck` — every direct child of the parent is
    * a public suffix) from the same snapshot: stored as the parent
    * label. The PSL's pure-wildcard ccTLDs. */
  val pslWildcardParents: Seq[String] =
    Seq("ck", "jm", "bd", "kw", "er", "fk", "mm", "np", "pg")

  /** PSL EXCEPTION rules (`!www.ck` — carved back OUT of a wildcard:
    * the name IS registrable). */
  val pslExceptions: Seq[String] = Seq("www.ck")

  /** PSL-aware registered domain, full rule algebra: the public suffix
    * is decided by the PREVAILING rule over the host's trailing labels
    * (checked at label boundaries — candidates are exact last-k-label
    * strings): exception rules beat everything (`!www.ck` → `www.ck`
    * itself is registrable), then the longest match among plain rules
    * and wildcards (`*.ck` → any direct child of `ck` is a public
    * suffix), and the registered domain is the public suffix plus one
    * label. Hosts that ARE a public suffix, and single-label hosts,
    * have no registered domain (null). Unlisted TLDs fall back to the
    * 2-label rule — the PSL's own default for unknown TLDs.
    * (Canonical vectors: `c.ck`→null, `b.c.ck`→`b.c.ck`,
    * `a.b.c.ck`→`b.c.ck`, `www.ck`→`www.ck`, `www.www.ck`→`www.ck`.)
    *
    * Plan shape: the plain-rule set is KB-sized → TWO broadcast left
    * joins (3-label then 2-label candidates); the wildcard/exception
    * sets are single-digit → literal `isin` predicates (pure codegen).
    * Everything is map-side, zero corpus shuffle — the same cost class
    * as the regex heuristic, so there is no scale reason to accept
    * `bbc.co.uk` keying as `co.uk`. */
  def withRegisteredDomain(df: DataFrame, hostCol: String,
      out: String = "registered_domain"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val psl = pslSnapshot.toDF("__psl_suffix")
    val labels = split(col(hostCol), "\\.")
    val n = size(labels)
    def lastK(k: Int): Column = array_join(slice(labels, -k, k), ".")
    val stamped = df
      .withColumn("__s2", when(n >= 2, lastK(2)))
      .withColumn("__s3", when(n >= 3, lastK(3)))
    val joined = stamped
      .join(broadcast(psl.select(col("__psl_suffix").as("__m3"))),
        col("__s3") === col("__m3"), "left")
      .join(broadcast(psl.select(col("__psl_suffix").as("__m2"))),
        col("__s2") === col("__m2"), "left")
    val isExc = col("__s2").isin(pslExceptions: _*)
    val isWild = element_at(labels, -1).isin(pslWildcardParents: _*)
    joined
      .withColumn(out,
        // exception prevails: the exception name itself is registrable
        when(isExc, lastK(2))
          // then longest match: plain 3-label rules…
          .when(col("__m3").isNotNull && n >= 4, lastK(4))
          .when(col("__m3").isNotNull, lit(null).cast("string"))
          // …wildcard rules (effective length 2: parent + any child)…
          .when(isWild && n >= 3, lastK(3))
          .when(isWild, lit(null).cast("string"))
          // …plain 2-label rules, then the unlisted-TLD default
          .when(col("__m2").isNotNull && n >= 3, lastK(3))
          .when(col("__m2").isNotNull, lit(null).cast("string"))
          .when(n >= 2, lastK(2))
          .otherwise(lit(null).cast("string")))
      .drop("__s2", "__s3", "__m2", "__m3")
  }

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
