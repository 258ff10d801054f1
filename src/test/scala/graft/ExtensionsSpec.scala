package graft

import org.apache.spark.sql.functions._

/** SparkSessionExtensions function registration: the native expressions
  * are reachable from plain SQL and agree with the Scala API. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_* SQL functions resolve and match the Scala API") {
    Seq(("the quick brown fox jumps over the lazy dog", 1L))
      .toDF("t", "id").createOrReplaceTempView("ext_docs")

    val sql = spark.sql(
      """SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       graft_jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L))
        |         AS j,
        |       size(graft_char_shingle_hashes(t, 5)) AS nsh,
        |       size(graft_minhash_sig(
        |         graft_char_shingle_hashes(t, 5), 16)) AS nsig,
        |       graft_simhash(t) AS sh,
        |       size(graft_winnow_fp(t, 8, 4)) AS nfp,
        |       graft_interp_ecdf(2.0D, array(1.0D, 2.0D, 3.0D)) AS e
        |FROM ext_docs""".stripMargin).collect().head
    assert(sql.getDouble(0) == 1.0)
    assert(math.abs(sql.getDouble(1) - 0.5) < 1e-12)
    assert(sql.getInt(2) > 0)
    assert(sql.getInt(3) == 16)
    assert(sql.getInt(5) > 0)
    assert(sql.getDouble(6) == 0.5)

    // SQL form ≡ Scala API form (same expression class underneath)
    val t = "the quick brown fox jumps over the lazy dog"
    val viaScala = Seq(t).toDF("t").select(
      graft.expressions.TextExpressions.winnowFingerprints(col("t"), 8, 4)
        .as("f")).as[Seq[Long]].head()
    val viaSql = spark.sql(
      s"SELECT graft_winnow_fp('$t', 8, 4) AS f").as[Seq[Long]].head()
    assert(viaScala == viaSql)
    assert(sql.getLong(4) == Seq(t).toDF("t")
      .select(graft.expressions.TextExpressions.simhashSig(
        graft.expressions.TextExpressions.wsTokenHashes(col("t"))))
      .as[Long].head())
  }

  test("round-5 natives reach SQL: cdc boundaries, poly hash, " +
    "cms sketch, weighted vec sum") {
    val r = spark.sql(
      """SELECT
        |  graft_cdc_boundaries('abcdefabcdef', 3, 2) AS cuts,
        |  graft_str_poly_hash('hello', 257, 16) AS ph""".stripMargin)
      .collect().head
    // same kernels as the Scala API
    val cutsScala = Seq("abcdefabcdef").toDF("t")
      .select(graft.expressions.TextExpressions
        .cdcBoundaries(col("t"), 3, 2).as("c"))
      .as[Seq[Int]].head()
    assert(r.getSeq[Int](0) == cutsScala)
    assert(r.getLong(1) == Seq("hello").toDF("t")
      .select(graft.expressions.TextExpressions
        .strPolyHash(col("t"), 257L, 16).as("h"))
      .as[Long].head())
    // aggregates work from pure SQL
    val agg = spark.sql(
      """SELECT
        |  aggregate(graft_cms_sketch(t, 8), CAST(0 AS BIGINT),
        |    (a, x) -> a + x) AS mass,
        |  graft_weighted_vec_sum(w, v) AS vs
        |FROM VALUES ('a b', 2.0D, array(1.0D, 10.0D)),
        |            ('c',   1.0D, array(5.0D, 5.0D)) AS t(t, w, v)
        |""".stripMargin).collect().head
    assert(agg.getLong(0) == 3L * 4) // 3 tokens × 4 hash rows
    assert(agg.getSeq[Double](1) == Seq(7.0, 25.0))
  }

  test("graft_winnow_fp rejects non-literal size arguments") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_winnow_fp('abc', 1 + 2, 4)").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getMessage.contains("graft_winnow_fp"))
  }

  test("runtime register() injects into a live FunctionRegistry, " +
    "idempotently; graft_nfc_normalize composes from SQL") {
    // The driver-contract reality: a session built WITHOUT the
    // extensions conf gets the same functions post-hoc.
    GraftExtensions.register(spark)
    GraftExtensions.register(spark) // second call must not throw
    Seq("éclair").toDF("t").createOrReplaceTempView("nfc_in")
    val r = spark.sql(
      "SELECT graft_nfc_normalize(t) AS n FROM nfc_in").as[String].head()
    assert(r == "éclair")
    // a pre-existing registration still resolves after re-register
    assert(spark.sql("SELECT graft_str_poly_hash('hello', 257, 16) AS h")
      .as[Long].head() ==
      Seq("hello").toDF("t")
        .select(graft.expressions.TextExpressions
          .strPolyHash(col("t"), 257L, 16).as("h")).as[Long].head())
  }
}
