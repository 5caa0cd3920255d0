package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * Sorting a table by one column gives perfect min/max pruning on that
  * column and none on any other; interleaving the bits of two key
  * columns into one Morton key and range-sorting by IT gives useful
  * pruning on BOTH — each file's (a, b) bounding box is a small tile of
  * the z-curve, so a predicate on either dimension skips most files.
  * This is the layout trick behind Delta/Iceberg `ZORDER BY`, built here
  * from plain Column bit arithmetic (the magic-mask bit spread), so the
  * key is deterministic and replays in any engine.
  *
  * Inputs are clamped to 16 bits (`& 0xFFFF`); map real domains onto
  * that range upstream (day numbers, bucketed ids, quantized floats).
  */
object ZOrder {

  /** Spreads the low 16 bits of `c` to the even bit positions of a
    * 32-bit value (…b2·4 b1·2 b0·1 → …b2·16 b1·4 b0·1). */
  def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 2-D Morton key: a's bits on even positions, b's on odd. */
  def zkey2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Rewrites `df` into `numFiles` range partitions ordered by the
    * Morton key of (a, b) — the write-side layout operator: each output
    * file covers one z-curve tile, so min/max stats prune on both
    * dimensions. One range exchange + local sort, same cost as a plain
    * global sort. */
  def cluster(df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame =
    df.withColumn("__z", zkey2(a, b))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
