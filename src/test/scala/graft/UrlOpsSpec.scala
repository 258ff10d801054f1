package graft

import graft.ops.{Sampling, UrlOps}
import org.apache.spark.sql.functions._

/** URL hygiene + weighted-sampling operators (round-6 additions). */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalizeUrl: scheme/www/query/fragment/trailing-slash rules") {
    val cases = Seq(
      ("HTTPS://WWW.Ex.COM/A/B/?q=1#f", "ex.com/a/b"),
      ("http://ex.org/x", "ex.org/x"),
      ("https://ex.com/", "ex.com"),
      ("ftp://files.ex.com/pub", "files.ex.com/pub"),
      ("ex.com/no-scheme", "ex.com/no-scheme"),
      ("https://www.ex.com", "ex.com"))
    val got = cases.map(_._1).toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("registeredDomain: last two labels; hostOf strips the path") {
    val got = Seq("a.b.ex.com/p/q", "ex.org", "single")
      .toDF("c")
      .select(UrlOps.registeredDomain(UrlOps.hostOf(col("c"))))
      .as[String].collect()
    assert(got.toSeq == Seq("ex.com", "ex.org", ""))
  }

  test("withRegisteredDomain: PSL longest-match, host-is-suffix and " +
    "single-label null, unlisted-TLD fallback") {
    val cases = Seq(
      ("bbc.co.uk", "bbc.co.uk"),          // 2-label rule + 1
      ("news.bbc.co.uk", "bbc.co.uk"),     // deeper subdomain
      ("a.b.news.bbc.co.uk", "bbc.co.uk"), // arbitrarily deep
      ("me.blogspot.co.uk", "me.blogspot.co.uk"), // 3-label rule + 1
      ("x.me.blogspot.co.uk", "me.blogspot.co.uk"),
      ("user.github.io", "user.github.io"), // private-registry rule
      ("www.example.com", "example.com"),   // unlisted TLD → 2-label
      ("example.com", "example.com"),
      ("co.uk", null),                      // host IS a public suffix
      ("blogspot.co.uk", null),             // host IS a 3-label suffix
      ("localhost", null),                  // single label
      // canonical publicsuffix.org wildcard/exception vectors (*.ck,
      // !www.ck)
      ("c.ck", null),
      ("b.c.ck", "b.c.ck"),
      ("a.b.c.ck", "b.c.ck"),
      ("www.ck", "www.ck"),
      ("www.www.ck", "www.ck"),
      ("ck", null))
    val got = UrlOps.withRegisteredDomain(
        cases.map(_._1).toDF("host"), "host")
      .select("host", "registered_domain")
      .as[(String, String)].collect().toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"host $h")
    }
  }

  test("filterBlockedDomains anti-joins on registered domain; " +
    "urlDedup keeps min id per canonical form") {
    val docs = Seq(
      (1L, "https://www.spam.com/x"),
      (2L, "http://ok.org/y"),
      (3L, "https://sub.spam.com/z"),
      (4L, "https://OK.org/y/?utm=1"), // canonical dup of 2
      (5L, "https://ok.org/y#frag")    // canonical dup of 2
    ).toDF("id", "url")
    val kept = UrlOps.filterBlockedDomains(docs, "url", Seq("spam.com"))
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 4L, 5L))
    val deduped = UrlOps.urlDedup(docs, "id", "url")
      .select("id").as[Long].collect().sorted
    assert(deduped.toSeq == Seq(1L, 2L, 3L))
  }

  test("weightedSampleK: exact top-k by ln(u)/w, zero/null weights " +
    "excluded, deterministic across partitionings") {
    val df = (1L to 200L).map(i => (i, if (i % 50 == 0) 0L else i))
      .toDF("id", "w")
    val got = Sampling.weightedSampleK(df, "id", "w", k = 20, seed = 7)
      .select("id").as[Long].collect().toSeq
    // reference computation on the driver, same formula
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(i: Long, w: Long): Double = {
      val h = md.digest(s"$i:7".getBytes("UTF-8"))
        .take(6).map(b => f"$b%02x").mkString
      val v = java.lang.Long.parseLong(h, 16).toDouble
      math.log((v + 1) / 281474976710656.0) / w
    }
    val want = (1L to 200L).filter(_ % 50 != 0)
      .map(i => (key(i, i), i)).sortBy { case (k, i) => (-k, i) }
      .take(20).map(_._2)
    assert(got == want)
    // repartitioned input selects the identical set (pure fn of id,seed)
    val got2 = Sampling.weightedSampleK(df.repartition(13), "id", "w",
      k = 20, seed = 7).select("id").as[Long].collect().toSeq
    assert(got2 == want)
    // heavier weights dominate: the top of a strongly increasing-weight
    // population should skew to large ids
    assert(got.count(_ > 100) > 10)
  }
}
