package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact integer column arithmetic shared by operators whose cross-engine
  * determinism depends on it. */
object Arith {

  /** True floor-division of a long column by a positive literal width.
    * Spark's `/` is DOUBLE division (loses integer precision above 2^53 —
    * ns-scale epochs land there) and its `div` truncates toward zero for
    * negatives; pmod's non-negative remainder makes this a floor at any
    * magnitude, and the decimal divide of the resulting exact multiple is
    * lossless. Matches DuckDB's `//` on BIGINTs bit-for-bit. */
  def floorDiv(c: Column, w: Long): Column = {
    require(w > 0, s"floorDiv width must be positive, got $w")
    // Subtract in DECIMAL: near Long.MinValue the long-typed
    // `c - pmod(c, w)` underflows (ANSI overflow error / wrapped value).
    ((c.cast("decimal(38,0)") - pmod(c, lit(w))) / w).cast("long")
  }
}
