package graft.functions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused KML gx:Track renderer — the whole 51-point Placemark of
  * Paths.kmlTracks as ONE kernel call per pair row.
  *
  * The Column form builds the track with two higher-order `transform`s
  * (when-tags, coord-tags) whose lambdas are interpreted per element
  * (HigherOrderFunction is CodegenFallback): 102 interpreted
  * format/concat/date_format evaluations per pair row, plus the giant
  * expression tree itself. This kernel renders the identical bytes in one
  * StringBuilder pass.
  *
  * Bit-identity, piece by piece (KmlExprSpec pins kernel ≡ Column chain
  * on the real pair rows; the w6d oracle re-pins vs DuckDB end-to-end):
  *  - doubles evaluate in the exact order of the Column tree:
  *    `from + (dif * seq) / maxCount`, parabola
  *    `(-pow((seq - mc/2)·rise, 2) + pow(mc/2·rise, 2)) · height + vo`,
  *    `height = pmod(path_id, 5000) / 100 + 50`;
  *  - `%.5f` rendering via java.util.Formatter with Locale.US — the same
  *    formatter format_string lowers to;
  *  - dates via epoch-day arithmetic in UTC (the session timezone),
  *    identical to date_format(timestamp_millis(x), 'yyyy-MM-dd') on this
  *    tier's CE-year domain;
  *  - time interpolation `startMs + floor(((end-start)·seq)/mc)` exactly
  *    as Scalars.interpMillis (products < 2^53, double intermediate
  *    exact).
  */
object KmlKernel {

  def track(lat0: Double, lon0: Double, lat1: Double, lon1: Double,
            fromMs: Long, toMs: Long, pathId: Long,
            maxCount: Int, rise: Double, verticalOffset: Double,
            fmt: String): UTF8String = {
    // Scalars.lonDiff, scalar twin (same branch structure, same ops)
    val firstWrap = if (lon0 > 0) lon0 - 180 else lon0 + 180
    val within = lon1 >= math.min(lon0, firstWrap) && lon1 <= math.max(lon0, firstWrap)
    val sameSignE = lon0 >= 0 && lon1 >= 0 && lon0 <= 180 && lon1 <= 180
    val sameSignW = lon0 <= 0 && lon1 <= 0 && lon0 >= -180 && lon1 >= -180
    val diflon =
      if (within || sameSignE || sameSignW) lon1 - lon0
      else {
        val orientation = if (lon0 >= 0) 1.0 else -1.0
        orientation * (math.abs(180.0 - math.max(lon0, lon1)) +
          math.abs(-180.0 - math.min(lon0, lon1)))
      }
    val diflat = lat1 - lat0
    val height = {
      val m = pathId % 5000L
      (if (m < 0) m + 5000L else m).toDouble / 100.0 + 50.0
    }
    val half = maxCount / 2.0
    val peak = math.pow(half * rise, 2) // lit(maxCount / 2.0 * rise) pow 2, constant-folded
    val mcD = maxCount.toDouble

    val sb = new java.lang.StringBuilder(64 * (maxCount + 1) + 96)
    val formatter = new java.util.Formatter(sb, Locale.US)
    sb.append("<Placemark><gx:Track><altitudeMode>absolute</altitudeMode>")
    val dtms = toMs - fromMs
    var i = 0
    while (i <= maxCount) {
      if (i > 0) sb.append('\n')
      // Scalars.interpMillis: startMs + floor(((end - start) * seq) / mc)
      val ms = fromMs + math.floor((dtms * i) / mcD).toLong
      sb.append("<when>")
      appendUtcDate(sb, ms)
      sb.append("</when>")
      i += 1
    }
    i = 0
    while (i <= maxCount) {
      if (i > 0) sb.append('\n')
      val seqD = i.toDouble
      val lon = lon0 + (diflon * seqD) / mcD
      val lat = lat0 + (diflat * seqD) / mcD
      val countShift = seqD - half
      val alt = (-math.pow(countShift * rise, 2) + peak) * height + verticalOffset
      sb.append("<gx:coord>")
      formatter.format(fmt, java.lang.Double.valueOf(lon))
      sb.append(' ')
      formatter.format(fmt, java.lang.Double.valueOf(lat))
      sb.append(' ')
      formatter.format(fmt, java.lang.Double.valueOf(alt))
      sb.append("</gx:coord>")
      i += 1
    }
    sb.append("</gx:Track></Placemark>")
    UTF8String.fromString(sb.toString)
  }

  /** yyyy-MM-dd of an epoch-millis instant in UTC (positive 4-digit CE
    * years — this tier's whole domain; equal to Spark's
    * date_format(timestamp_millis(ms), 'yyyy-MM-dd') there). */
  private def appendUtcDate(sb: java.lang.StringBuilder, ms: Long): Unit = {
    val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(ms, 86400000L))
    val y = d.getYear; val m = d.getMonthValue; val dd = d.getDayOfMonth
    if (y < 1000) sb.append('0')
    if (y < 100) sb.append('0')
    if (y < 10) sb.append('0')
    sb.append(y).append('-')
    if (m < 10) sb.append('0')
    sb.append(m).append('-')
    if (dd < 10) sb.append('0')
    sb.append(dd)
  }
}

/** Native expression over (lat0, lon0, lat1, lon1, fromMs, toMs, pathId).
  * One eval per PAIR row renders the full 51-point track, so interpreted
  * dispatch is per row, not per tag — CodegenFallback is deliberate. */
case class KmlTrack(children: Seq[Expression], maxCount: Int, rise: Double,
                    verticalOffset: Double, fmt: String)
    extends Expression with CodegenFallback {
  require(children.size == 7, "KmlTrack expects 7 inputs")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val want = Seq(DoubleType, DoubleType, DoubleType, DoubleType,
      LongType, LongType, LongType)
    if (children.map(_.dataType) == want)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kml_track expects (double x4, long x3), got ${children.map(_.dataType)}")
  }

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else KmlKernel.track(
      vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
      vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Double],
      vs(4).asInstanceOf[Long], vs(5).asInstanceOf[Long],
      vs(6).asInstanceOf[Long], maxCount, rise, verticalOffset, fmt)
  }

  override def prettyName: String = "kml_track"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmlTrack =
    copy(children = newChildren)
}

object KmlTrack {
  /** Column-API wrapper: (lat0, lon0, lat1, lon1, fromMs, toMs, pathId). */
  def apply(lat0: Column, lon0: Column, lat1: Column, lon1: Column,
            fromMs: Column, toMs: Column, pathId: Column,
            maxCount: Int, rise: Double, verticalOffset: Double,
            fmt: String): Column =
    ColumnBridge.column(KmlTrack(
      Seq(lat0, lon0, lat1, lon1, fromMs, toMs, pathId).map(ColumnBridge.expression),
      maxCount, rise, verticalOffset, fmt))
}
