package graft.ops

import graft.expressions.{AggregateFunctions, TextExpressions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency sketching over document text — the streaming-friendly
  * corpus-statistics half of a curation pipeline (heavy-hitter stopword
  * discovery, frequency floors for vocab cuts, boilerplate detection).
  *
  * The Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005)
  * estimates every token's frequency with one constant-size state: a
  * `d×width` counter grid; est(term) = min_j grid(j, hash_j(term) %
  * width) ≥ exact count, with overestimate bounded by N·e/width at
  * probability 1−e^−d. `CmsSketchAgg` builds the grid in a single pass
  * over the corpus with map-side combine — the shuffle carries one
  * 64 KB buffer per partition, never a token row.
  */
object Sketch {

  /** SQL-replayable hash rows: base-b polynomials mod 1e9+7 (the
    * q78/q79 twin family). */
  val defaultBases: Seq[Long] = Seq(257L, 263L, 269L, 271L)

  /** The sketch grid as a relational table (j, bucket, cnt). One global
    * aggregate → one row → d·width exploded rows (driver-free, tiny). */
  def cmsTable(docs: DataFrame, textCol: String,
      bases: Seq[Long] = defaultBases, width: Int = 2048): DataFrame =
    docs
      .agg(AggregateFunctions.cmsSketch(col(textCol), bases, width)
        .as("sk"))
      .select(posexplode(col("sk")).as(Seq("slot", "cnt")))
      .select(expr(s"slot DIV $width").as("j"),
        (col("slot") % width).cast("long").as("bucket"), col("cnt"))

  /** Top-`k` terms by exact count (desc, then term asc) with their CMS
    * estimate: (term, exact, est), est ≥ exact always. The exact pass
    * exists to grade the sketch; a pure-sketch deployment drops it and
    * probes candidate terms against `cmsTable` alone. */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int,
      bases: Seq[Long] = defaultBases, width: Int = 2048): DataFrame = {
    val sketch = cmsTable(docs, textCol, bases, width)
    val top = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("exact"))
      .orderBy(desc("exact"), asc("term")).limit(k)
    // one row per (term, hash row) — posexplode over the d bucket
    // expressions, not a d-way union (which would recompute `top`)
    val probes = top.select(col("term"), col("exact"),
        posexplode(array(bases.map(b =>
          element_at(
            TextExpressions.wsTokenPolyHashes(col("term"), b), 1) % width)
          : _*)).as(Seq("j", "bucket")))
      .select(col("term"), col("exact"), col("j").cast("long").as("j"),
        col("bucket"))
    probes.join(sketch, Seq("j", "bucket"))
      .groupBy("term", "exact").agg(min(col("cnt")).as("est"))
      .select("term", "exact", "est")
  }

  /** Word n-gram STRINGS per doc (distinct per doc by default; pass
    * distinct = false for the multiplicity-keeping token stream
    * frequency statistics need), built with one window of n−1 leads
    * (codegen'd — no interpreted per-gram lambdas): (id, gram). */
  def wordNgrams(docs: DataFrame, idCol: String, textCol: String,
      n: Int, distinct: Boolean = true): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"),
        posexplode(split(trim(col(textCol)), "\\s+"))
          .as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val wn = Window.partitionBy("id").orderBy("pos")
    val withLeads = (1 until n).foldLeft(toks) { (df, k) =>
      df.withColumn(s"__w$k", lead(col("w"), k).over(wn))
    }
    val grams = withLeads
      .filter((1 until n).map(k => col(s"__w$k").isNotNull)
        .foldLeft(lit(true))(_ && _))
      .select(col("id"), concat_ws(" ",
        col("w") +: (1 until n).map(k => col(s"__w$k")): _*).as("gram"))
    if (distinct) grams.distinct() else grams
  }

  /** Two-stage decontamination with a Bloom prefilter: the eval suite's
    * gram set collapses into a counting-Bloom grid (the CMS in
    * whole-string mode — a gram is "present" iff ALL `d` of its grid
    * cells are nonzero), train grams probe the broadcast grid, and only
    * bloom survivors pay the exact gram-string verify join.
    *
    * This is the 100 TB shape the plain broadcast-set join
    * (TextOps.contaminationMatches) can't reach: a large eval suite's
    * distinct gram set grows without bound, but the grid is
    * `d×width` Longs regardless — FP rate ≈ (1−e^(−n/width))^d, and
    * false positives only cost verify work, never correctness.
    *
    * Returns one row per train doc with ≥ 1 bloom hit:
    * (id, n_bloom, n_matched) — n_bloom ≥ n_matched, the gap is the
    * prefilter's FP count (distinct-gram granularity). */
  def bloomDecontaminate(train: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 5,
      bases: Seq[Long] = defaultBases, width: Int = 1 << 17,
      cap: Int = 16, replayable: Boolean = true): DataFrame = {
    // replayable=true: capped poly hashes an external engine replays
    // (grams sharing a `cap`-byte prefix collide — extra FPs, still
    // sound). Production flips to full-gram xxhash64 rows (family
    // "xx"), same operator code, no prefix collisions.
    val family = if (replayable) "poly" else "xx"
    def probeBucket(b: Long, j: Int) =
      if (replayable)
        TextExpressions.strPolyHash(col("gram"), b, cap) % width
      else
        pmod(xxhash64(lit(graft.core.Hashing.splitmix64(j.toLong)),
          col("gram")), lit(width.toLong))
    val evalGrams = wordNgrams(evalSet, idCol, textCol, n)
      .select(col("gram")).distinct().localCheckpoint(true)
    val grid = evalGrams
      .agg(AggregateFunctions.cmsSketch(col("gram"), bases, width,
        split = false, cap = cap, family = family).as("sk"))
      .select(posexplode(col("sk")).as(Seq("slot", "cnt")))
      .filter(col("cnt") > 0)
      .select(expr(s"slot DIV $width").as("j"),
        (col("slot") % width).cast("long").as("bucket"))
    val trainGrams = wordNgrams(train, idCol, textCol, n)
    val probes = trainGrams.select(col("id"), col("gram"),
        posexplode(array(bases.zipWithIndex.map { case (b, j) =>
          probeBucket(b, j) }: _*)).as(Seq("j", "bucket")))
      .select(col("id"), col("gram"), col("j").cast("long").as("j"),
        col("bucket"))
    // survivors are small — checkpoint so the two consumers below don't
    // re-run the probe join
    val bloomPass = probes.join(broadcast(grid), Seq("j", "bucket"))
      .groupBy("id", "gram").agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === bases.length)
      .select("id", "gram")
      .localCheckpoint(true)
    val matched = bloomPass.join(evalGrams, Seq("gram"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_matched"))
    bloomPass.groupBy("id").agg(count(lit(1)).as("n_bloom"))
      .join(matched, Seq("id"), "left")
      .select(col("id"), col("n_bloom"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"))
  }

  /** Linear-probabilistic distinct counting (Whang, Vander-Zanden &
    * Taylor, TODS 1990): distinct ≈ −m·ln(V_m/m) where V_m is the
    * number of VACANT buckets of an m-bucket hash bitmap. The
    * cardinality-estimation sibling of the CMS grid, in relational
    * form: per-group occupied-bucket count (one distinct-aggregate over
    * (group, bucket) — nothing wider than m rows per group survives the
    * shuffle), replayable poly-hash buckets so an external engine
    * replays the estimate bit-for-bit. Precision-per-byte favors
    * [[hllRegisters]] (m·6-bit state, unbounded range) once group
    * cardinality can exceed m; linear counting stays the more accurate
    * estimator well below saturation. Saturated groups estimate
    * null (ln 0); size m above the expected cardinality.
    *
    * The hash reads only the first `cap` bytes of each value, so
    * distinct values sharing a `cap`-byte prefix collapse into one
    * bucket BEFORE bitmap collision — a systematic undercount the
    * −m·ln(V/m) estimator cannot correct (same tradeoff as
    * bloomDecontaminate's prefix hashing). Default cap = 16 keeps the
    * precomputed-coefficient oracle replay exact (unreduced sum < 2^63);
    * raise it for columns whose values share long prefixes. */
  def linearCountDistinct(df: DataFrame, groupCol: String,
      valueCol: String, m: Int = 4096, base: Long = 257L, cap: Int = 16)
      : DataFrame =
    df.select(col(groupCol).as("grp"),
        (TextExpressions.strPolyHash(col(valueCol), base, cap) % m)
          .as("__b"))
      .groupBy("grp")
      .agg(countDistinct(col("__b")).as("occupied"))
      .select(col("grp"), col("occupied"),
        when(col("occupied") < m,
          round(-lit(m.toDouble) *
            log((lit(m.toDouble) - col("occupied")) / m), 6))
          .as("est_distinct"))

  /** HyperLogLog registers (Flajolet et al., AofA 2007) in relational
    * form: one row per (group, bucket) holding the max leading-zero rank
    * observed — the mergeable distinct-count sketch for 100 TB corpus
    * audits. The aggregation is two-level: `max(rho)` per (group,
    * bucket) map-side-combines to ≤ 2^b rows per group per partition
    * BEFORE the shuffle, so the exchange carries register state, never
    * token rows — the same wire-bound argument as `cmsTable`.
    *
    * Unlike the usual engine-specific HLL blobs (and the stale claim
    * `linearCountDistinct` used to make), these registers are
    * bit-replayable by an external engine: the q78 poly family over
    * Z_p scrambled by one square-and-affine step
    * `g = ((h²+h) mod P · 2654435761 + 40503) mod P` — the raw
    * polynomial has NO avalanche (inputs differing in trailing bytes
    * land in a handful of residue clusters; measured: 5000 structured
    * tokens estimated as 127), while the nonlinear square restores the
    * geometric leading-zero tail HLL's estimator is built on. Both
    * steps stay under 2^63 (P² ≈ 10^18), so any BIGINT engine replays
    * them. Bucket = low `b` bits of g; the rank comes from the binary
    * bit-length of the remaining `W = bitlen((P-1) >> b)` bits —
    * `rho = W+1 - bitlen(w)` (W+1 for w = 0), exact integer/string
    * ops. The narrower hash domain caps the max observable rank at
    * W+1 (vs 64-bit HLL's 58): irrelevant below ~2^W ≈ 16M distinct
    * per group; size `b`/`base` up for more.
    *
    * Same prefix-collision caveat as every `strPolyHash` consumer:
    * values sharing a `cap`-byte prefix collapse before bucketing.
    * Returns (grp, bucket, reg). */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
      b: Int = 6, base: Long = 257L, cap: Int = 16): DataFrame = {
    require(b >= 4 && b <= 16, s"b must be in [4,16]: $b")
    val P = 1000000007L
    val m = 1 << b
    val W = 64 - java.lang.Long.numberOfLeadingZeros((P - 1) >> b)
    val h = TextExpressions.strPolyHash(col(valueCol), base, cap)
    val hv = (((h * h + h) % P) * lit(2654435761L) + lit(40503L)) % P
    df.select(col(groupCol).as("grp"),
        hv.bitwiseAND(lit((m - 1).toLong)).as("bucket"),
        shiftrightunsigned(hv, b).as("__w"))
      .groupBy("grp", "bucket")
      .agg(max(when(col("__w") === 0L, lit((W + 1).toLong))
        .otherwise(lit((W + 1).toLong) - length(bin(col("__w")))))
        .cast("long").as("reg"))
  }

  /** Distinct-count estimate from `hllRegisters` output: the textbook
    * harmonic mean alpha_m·m²/Σ2^−reg with the small-range linear-
    * counting correction (est ≤ 2.5m and empty buckets remain). The
    * harmonic sum runs in EXACT integer arithmetic — Σ 2^(40−reg) as
    * BIGINT (reg ≤ W+1 < 40; absent buckets contribute 2^40 each) — so
    * the estimate is one deterministic FP division of two exact
    * integers, order-insensitive under Spark's partial aggregation and
    * bit-replayable externally. Returns (grp, occupied, est_distinct). */
  def hllEstimate(registers: DataFrame, b: Int = 6): DataFrame = {
    val m = 1 << b
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val c = alpha * m * m * math.pow(2, 40)
    registers.groupBy("grp")
      .agg(count(lit(1)).as("occupied"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(40 - reg AS INT))"))
          .as("__s_occ"))
      .select(col("grp"), col("occupied"),
        (col("__s_occ") + (lit(m.toLong) - col("occupied"))
          * lit(1L << 40)).as("__s"),
        (lit(m.toLong) - col("occupied")).as("__v"))
      .select(col("grp"), col("occupied"),
        when(lit(c) / col("__s") <= lit(2.5 * m) && col("__v") > 0L,
          round(lit(m.toDouble) * log(lit(m.toDouble) / col("__v")), 6))
          .otherwise(round(lit(c) / col("__s"), 6)).as("est_distinct"))
  }

  /** Hash-family parameters of a persisted grid. */
  case class GridParams(bases: Seq[Long], width: Int, cap: Int,
      family: String)

  /** Persist a sketch grid WITH its hash-family parameters as data
    * (the EventDataset save/load discipline — plain parquet, no
    * serialized objects): `path/grid` holds (j, bucket, cnt),
    * `path/params` one row of (bases, width, cap, family). Incremental
    * curation loads yesterday's grid and probes today's batch with the
    * recorded family — probing with mismatched params is the classic
    * silent-corruption bug, which is why they travel with the grid. */
  def saveGrid(grid: DataFrame, params: GridParams, path: String)
      : Unit = {
    grid.write.mode("overwrite").parquet(s"$path/grid")
    val spark = grid.sparkSession
    import spark.implicits._
    Seq((params.bases, params.width, params.cap, params.family))
      .toDF("bases", "width", "cap", "family")
      .write.mode("overwrite").parquet(s"$path/params")
  }

  def loadGrid(spark: org.apache.spark.sql.SparkSession, path: String)
      : (DataFrame, GridParams) = {
    val p = spark.read.parquet(s"$path/params").collect()(0)
    (spark.read.parquet(s"$path/grid"),
      GridParams(p.getSeq[Long](p.fieldIndex("bases")).toList,
        p.getAs[Int]("width"),
        p.getAs[Int]("cap"), p.getAs[String]("family")))
  }

  /** Per-group quantile ESTIMATES from a deterministic bottom-k hash
    * sample (the KMV idiom applied to quantiles): the k rows with the
    * smallest md5 rank are a uniform sample of the group, selected by
    * the map-side-combinable
    * [[graft.expressions.TopKByScoreAgg]] (bottom-k under a total
    * order is associative — state is k pairs per group per partition,
    * never the group), and the p-quantile estimate is the
    * nearest-rank element of the sorted sample. Exact-percentile
    * aggregation ([[graft.SparkEntry]] q114) buffers every value per
    * group; this holds k·16 bytes per group at ANY group size, and —
    * unlike rank-error sketches (t-digest/KLL) — the estimate is a
    * pure function of (ids, seed): bit-replayable and
    * partition-invariant. Sampling error is the classic order-
    * statistic bound (~1/√k quantile deviation).
    *
    * Returns (keyCol, p, est, n_sample). */
  def bottomKQuantiles(df: DataFrame, keyCol: String, valCol: String,
      idCol: String, k: Int, probs: Seq[Double], seed: Long)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"probs must be in [0,1]: $probs")
    val v = conv(substring(Sampling.md5Rank(col(idCol), seed), 1, 12),
      16, 10).cast("double")
    df.groupBy(col(keyCol))
      .agg(graft.expressions.AggregateFunctions
        .topKByScore(-v, col(valCol).cast("long"), k).as("__s"))
      .select(col(keyCol),
        expr("array_sort(transform(__s, x -> x.id))").as("__vals"))
      .select(col(keyCol),
        explode(typedLit(probs)).as("p"), col("__vals"))
      .select(col(keyCol), col("p"),
        element_at(col("__vals"),
          (floor(col("p") * (size(col("__vals")) - 1)) + 1).cast("int"))
          .as("est"),
        size(col("__vals")).cast("long").as("n_sample"))
  }
}
