package graft

import graft.preprocess.NumericKernel
import org.apache.spark.sql.functions._

/** Numeric preprocessing kernels
  * (reference event_stream_dataset.py:152-368, 1216-1277, 1488-1595). */
class NumericSpec extends SparkSpec {
  import spark.implicits._

  test("dropOrCensor: inclusivity-aware drop then censor clamp") {
    // reference :168-181 — an INCLUSIVE drop bound drops the bound value
    // itself (val <= lo / val >= hi); exclusive drops strictly-outside only
    val df = Seq(
      (-5.0, "below drop"),
      (0.0, "at exclusive drop lo -> kept, censored up"),
      (0.5, "below censor lo -> clamped"),
      (5.0, "inside"),
      (95.0, "above censor hi -> clamped"),
      (100.0, "at inclusive drop hi -> dropped"),
      (200.0, "above drop")).toDF("v", "why")
    val out = df.select(col("why"), NumericKernel.dropOrCensor(col("v"),
      lit(0.0), lit(false), // drop lo exclusive: only v < 0 dropped
      lit(100.0), lit(true), // drop hi inclusive: v >= 100 dropped
      lit(1.0), lit(90.0)).as("r"))
      .as[(String, Option[Double])].collect().toMap
    assert(out("below drop").isEmpty)
    assert(out("at exclusive drop lo -> kept, censored up").contains(1.0))
    assert(out("below censor lo -> clamped").contains(1.0))
    assert(out("inside").contains(5.0))
    assert(out("above censor hi -> clamped").contains(90.0))
    assert(out("at inclusive drop hi -> dropped").isEmpty)
    assert(out("above drop").isEmpty)
    // null propagates
    val nul = Seq(Option.empty[Double]).toDF("v")
      .select(NumericKernel.dropOrCensor(col("v"), lit(0.0), lit(false),
        lit(100.0), lit(false), lit(null), lit(null)).as("r"))
      .as[Option[Double]].collect()
    assert(nul.head.isEmpty)
  }

  test("inferValueTypes hits every rule branch") {
    // rules (reference :1216-1277): dropped(min-obs) / dropped(1 distinct) /
    // categorical_int / categorical_float / integer / float
    val rows =
      Seq.fill(5)(("too_few", 1.0)) ++ // n=5 < 10 → dropped
      Seq.fill(20)(("constant", 7.0)) ++ // 1 distinct → dropped
      (1 to 20).flatMap(i => Seq(("cat_int", (i % 3).toDouble))) ++ //
      (1 to 20).flatMap(i => Seq(("cat_flt", (i % 3) + 0.5))) ++ //
      (1 to 30).map(i => ("int", i.toDouble)) ++ // 30 uniq ints
      (1 to 30).map(i => ("flt", i + 0.25)) // 30 uniq floats
    val df = rows.toDF("k", "v")
    val out = NumericKernel.inferValueTypes(df, "k", "v",
      minValidVocabElementObservations = 10,
      minTrueFloatFrequency = 0.25,
      minUniqueNumericalObservations = 20,
      maxNumericalValueFrequency = 0.5)
      .select("key", "value_type").as[(String, String)].collect().toMap
    assert(out("too_few") == "dropped")
    assert(out("constant") == "dropped")
    assert(out("cat_int") == "categorical_integer")
    assert(out("cat_flt") == "categorical_float")
    assert(out("int") == "integer")
    assert(out("flt") == "float")
  }

  test("inferValueTypes: rounded value_counts, gated 1-unique drop, " +
    "null-inclusive min-obs (reference :1229-1270)") {
    // integer-ish keys round (np HALF_EVEN) BEFORE value_counts: 20 raw
    // distinct values collapse to 16 rounded ints → categorical_integer
    // (raw n_unique=20 would have said plain 'integer').
    val merge = (1 to 16).map(i => ("m", i.toDouble)) ++
      Seq(("m", 1.0000001), ("m", 2.0000001), ("m", 3.0000001),
        ("m", 4.0000001))
    // 1-unique → dropped fires ONLY inside the categorical branch: with the
    // categorical thresholds disabled a constant key stays 'integer'.
    val const = Seq.fill(20)(("c", 7.0))
    // rule-1 min-obs counts null-valued observations too: 6 values + 8
    // nulls = 14 obs ≥ 10 → NOT dropped.
    val sparse = (1 to 6).map(i => ("s", Some(i + 0.5))) ++
      Seq.fill(8)(("s", Option.empty[Double]))
    val out1 = NumericKernel.inferValueTypes(merge.toDF("k", "v"), "k", "v",
      10, 0.25, 20, 0.5)
      .select("key", "value_type", "n_unique")
      .as[(String, String, Long)].collect().head
    assert(out1._2 == "categorical_integer" && out1._3 == 16L)
    val out2 = NumericKernel.inferValueTypes(const.toDF("k", "v"), "k", "v",
      10, 0.25, minUniqueNumericalObservations = 1,
      maxNumericalValueFrequency = 1.0)
      .select("key", "value_type").as[(String, String)].collect().head
    assert(out2._2 == "integer")
    val out3 = NumericKernel.inferValueTypes(
      sparse.toDF("k", "v"), "k", "v", 10, 0.25, 3, 0.5)
      .select("key", "value_type", "n").as[(String, String, Long)]
      .collect().head
    assert(out3._2 == "float" && out3._3 == 6L)
  }

  test("inferValueTypesCfg: None disables rules; proportions resolve by " +
    "truncation against the reference denominators") {
    import graft.core.CountOrProportion
    // CountOrProportion resolves proportions as int(p*N) — truncation
    // (reference utils.py count_or_proportion), NOT ceil
    assert(CountOrProportion.proportion(0.15).resolve(450) == 67L)
    // all rules disabled → everything is 'float'
    val df = (Seq.fill(20)(("c", 7.0)) ++ Seq(("c", 8.0))).toDF("k", "v")
    val allOff = NumericKernel.inferValueTypesCfg(df, "k", "v",
      None, None, None, None)
      .select("value_type").as[String].collect().head
    assert(allOff == "float")
    // min-unique PROPORTION resolves per key against len(vals):
    // 30 values, 10 unique ints; p=0.4 → int(0.4*30)=12 > 10 → categorical
    val u = (1 to 30).map(i => ("u", (i % 10).toDouble)).toDF("k", "v")
    def infer(p: Double) = NumericKernel.inferValueTypesCfg(u, "k", "v",
      None, Some(0.25), Some(CountOrProportion.proportion(p)), None)
      .select("value_type").as[String].collect().head
    assert(infer(0.4) == "categorical_integer")
    // p=0.3 → int(0.3*30)=9 ≤ 10 → not categorical → integer
    assert(infer(0.3) == "integer")
    // min-valid-vocab PROPORTION resolves against total column obs:
    // A has 90 rows, B 10; p=0.15 → int(0.15*100)=15 → B dropped
    val ab = ((1 to 90).map(i => ("A", i.toDouble + 0.5)) ++
      (1 to 10).map(i => ("B", i.toDouble + 0.5))).toDF("k", "v")
    val types = NumericKernel.inferValueTypesCfg(ab, "k", "v",
      Some(CountOrProportion.proportion(0.15)), Some(0.25),
      None, None)
      .select("key", "value_type").as[(String, String)].collect().toMap
    assert(types("B") == "dropped" && types("A") == "float")
  }

  test("categorical re-encode key__EQ_val (reference :288-368)") {
    val df = Seq(("hr", 72.4, "categorical_integer"),
      ("hr", 72.5, "categorical_integer"),
      ("hr", 73.5, "categorical_integer"),
      ("bp", 1.25, "categorical_float"),
      ("wt", 80.1, "float")).toDF("k", "v", "vt")
    val out = df.select(
      NumericKernel.reencodeKey(col("k"), col("v"), col("vt")).as("k2"),
      NumericKernel.reencodeValue(col("v"), col("vt")).as("v2"))
      .as[(String, Option[Double])].collect().toSet
    assert(out.contains(("hr__EQ_72", None)))
    // np.round is HALF_EVEN (banker's): 72.5 → 72, 73.5 → 74
    assert(!out.contains(("hr__EQ_73", None)))
    assert(out.contains(("hr__EQ_74", None)))
    assert(out.contains(("bp__EQ_1.25", None)))
    assert(out.contains(("wt", Some(80.1)))) // untouched
  }

  test("standard scaler fit uses sample std (pandas ddof=1)") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("k", "v")
    val fit = NumericKernel.fitStandardScaler(df, "k", "v")
      .as[(String, Double, Double)].collect().head
    assert(fit._2 == 2.0)
    assert(math.abs(fit._3 - 1.0) < 1e-12) // stddev_samp([1,2,3]) = 1
    // transform
    val z = df.select(NumericKernel.applyStandardScaler(col("v"),
      lit(2.0), lit(1.0)).as("z")).as[Double].collect().sorted
    assert(z.toSeq == Seq(-1.0, 0.0, 1.0))
    // zero std → identity
    val id = Seq(5.0).toDF("v").select(NumericKernel.applyStandardScaler(
      col("v"), lit(2.0), lit(0.0)).as("z")).as[Double].collect()
    assert(id.head == 5.0)
  }

  test("quantile transform: interpolated ECDF to [0,1]") {
    val df = (1 to 101).map(i => ("k", i.toDouble)).toDF("k", "v")
    val fit = NumericKernel.fitQuantiles(df, "k", "v", nQuantiles = 5)
    val q = fit.select("quantiles").as[Seq[Double]].collect().head
    assert(q == Seq(1.0, 26.0, 51.0, 76.0, 101.0))
    val probe = Seq(1.0, 26.0, 51.0, 101.0, 38.5, 0.0, 200.0).toDF("v")
      .crossJoin(fit)
    val out = probe.select(col("v"),
      NumericKernel.applyQuantileTransform(col("v"), col("quantiles"))
        .as("u")).as[(Double, Double)].collect().toMap
    assert(out(1.0) == 0.0)
    assert(out(26.0) == 0.25)
    assert(out(51.0) == 0.5)
    assert(out(101.0) == 1.0)
    assert(math.abs(out(38.5) - 0.375) < 1e-12) // midpoint interpolation
    assert(out(0.0) == 0.0) // clamped below
    assert(out(200.0) == 1.0) // clamped above
  }

  test("nan/inf normalization and inlier predicate") {
    val df = Seq(1.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity).toDF("v")
    val out = df.select(NumericKernel.nanInfToNull(col("v")).as("r"))
      .as[Option[Double]].collect()
    assert(out.count(_.isEmpty) == 3)
    // inlier: exclusive bounds, absent model → true
    val in = Seq((5.0, Some(0.0), Some(10.0)), (0.0, Some(0.0), Some(10.0)),
      (5.0, None, None))
      .toDF("v", "lo", "hi")
      .select(NumericKernel.isInlier(col("v"), col("lo"), col("hi"))
        .as("r")).as[Boolean].collect()
    assert(in.toSeq == Seq(true, false, true))
  }
}
