package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sinusoidal embedding of CONTINUOUS time — the reference's
  * TemporalPositionEncoding (/root/reference/EventStream/
  * EventStreamTransformer/transformer.py:362-403): unlike ordinal
  * positional encodings, the phase argument is the event's time in minutes
  * from sequence start, so irregularly-spaced events embed faithfully.
  *
  *   enc[2i]   = sin(t / max_timescale^(2i/d))
  *   enc[2i+1] = cos(t / max_timescale^(2i/d))
  *
  * Pure column expressions → whole-stage codegen, narrow. */
object TemporalEncoding {

  def encode(timeMinutes: Column, dim: Int,
      maxTimescale: Double = 10000.0): Column = {
    require(dim % 2 == 0, s"encoding dim must be even: $dim")
    val comps = (0 until dim / 2).flatMap { i =>
      val freq = 1.0 / math.pow(maxTimescale, (2.0 * i) / dim)
      Seq(sin(timeMinutes * freq), cos(timeMinutes * freq))
    }
    array(comps: _*)
  }

  /** Attach the encoding to a frame carrying a time column. */
  def withEncoding(df: DataFrame, timeCol: String, dim: Int,
      outCol: String = "time_enc"): DataFrame =
    df.withColumn(outCol, encode(col(timeCol), dim))
}
