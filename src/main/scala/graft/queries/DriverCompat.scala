package graft.queries

import org.apache.spark.sql.types._

/** Harness-compat contract on registry output schemas.
  *
  * The external correctness driver compares Spark output against the
  * DuckDB oracle by sorting EVERY column with pandas and hashing cell
  * values — a top-level array/map/struct column arrives as a numpy
  * ndarray / dict cell, and `sort_values` dies on it
  * (`TypeError: unhashable type: 'numpy.ndarray'` — the r10 emb6 red
  * row). The repo's local check.py canonicalizes such cells, which is
  * exactly how that bug survived local gates; this contract closes the
  * gap at commit time: every registered query must emit SCALAR-ONLY
  * top-level columns (explode to LONG form, or derive scalar
  * fingerprints) unless explicitly exempted here with a reason.
  */
object DriverCompat {

  /** Queries allowed to carry complex top-level columns, with the reason.
    * Deliberately EMPTY: rows-only queries don't crash the comparator
    * (the driver never sorts them), but keeping them scalar means any of
    * them can graduate to a hash-checked oracle without a shape change. */
  val exemptions: Map[String, String] = Map.empty

  /** Column names in `schema` the driver's comparator cannot hash. */
  def violations(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if !isDriverSafe(f.dataType) =>
        s"${f.name}: ${f.dataType.simpleString}"
    }

  private def isDriverSafe(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _                                         => true
  }
}
