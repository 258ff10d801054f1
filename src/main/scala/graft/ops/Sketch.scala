package graft.ops

import graft.expressions.{AggregateFunctions, TextExpressions}
import org.apache.spark.sql.DataFrame
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
}
