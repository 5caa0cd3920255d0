package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC) — the storage-level dedup primitive
  * (LBFS/rsync lineage: Muthitacharoen et al. 2001). A chunk boundary is
  * declared wherever a rolling content hash of the trailing `w`-character
  * window hits a mask condition, so chunk boundaries RE-SYNCHRONIZE after
  * an insert/delete: two documents that share a long run of content
  * produce identical chunks for the shared run no matter how their
  * prefixes differ — exactly what fixed-size blocking cannot do. At
  * 100 TB this is the dedup that works on *binary/media* columns and
  * crawl re-fetches, complementing MinHash (similarity) and exact-hash
  * (identity) dedup.
  *
  * Portability contract (what makes the operator oracle-checkable): the
  * boundary hash is the md5-28 family shared with the portable MinHash
  * kernels — position `i` (1-based, `i ≥ w`) ends a chunk iff
  * `md5_28(substr(text, i-w+1, w)) % 2^maskBits == 0` — and the chunk id
  * is the 60-bit md5 prefix of the chunk text. DuckDB replays both
  * bit-for-bit (`Dedup.cdcChunkOracleSql`). Windowing is by CHARACTER
  * (UTF8String.substringSQL ≡ substr), so multi-byte text chunks
  * identically on both engines. Text is NOT lowercased: storage dedup is
  * about literal content, unlike the similarity family.
  */
object CdcKernel {

  /** Chunks of `text` as (start, len, hash) rows; start is 1-based, len in
    * characters, hash the 60-bit md5 prefix of the chunk substring. Texts
    * shorter than `w` form a single chunk; empty text yields no chunks. */
  def chunks(text: UTF8String, w: Int, maskBits: Int): ArrayData = {
    val n = text.numChars()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << maskBits) - 1
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    // ASCII fast path: char positions == byte positions, so boundary
    // windows and chunk ids hash byte slices in place (no per-window
    // UTF8String + byte-array allocation). Multi-byte text keeps the
    // substringSQL windowing (char-based, the oracle contract).
    val ascii = text.numBytes() == n
    val raw = if (ascii) text.getBytes else null
    def emit(start: Int, end: Int): Unit = { // [start, end] 1-based inclusive
      val len = end - start + 1
      val h =
        if (ascii) Md5Kernel.first8(raw, start - 1, len) >>> 4
        else {
          val b = text.substringSQL(start, len).getBytes
          Md5Kernel.first8(b, 0, b.length) >>> 4
        }
      out += org.apache.spark.sql.catalyst.InternalRow(start, len, h)
    }
    var prev = 0
    var i = w
    while (i <= n) {
      val h =
        if (ascii) Md5Kernel.first8(raw, i - w, w) >>> 36
        else {
          val b = text.substringSQL(i - w + 1, w).getBytes
          Md5Kernel.first8(b, 0, b.length) >>> 36
        }
      if ((h & mask) == 0L || i == n) { emit(prev + 1, i); prev = i }
      i += 1
    }
    if (prev < n) emit(prev + 1, n) // n < w: the loop never ran
    new GenericArrayData(out.toArray)
  }

  val chunkType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)
}

/** Native expression for [[CdcKernel.chunks]]. Input: string. Output:
  * array<struct<start:int, len:int, hash:long>>. */
case class CdcChunks(child: Expression, w: Int, maskBits: Int) extends UnaryExpression {

  override def dataType: DataType = CdcKernel.chunkType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cdc_chunks expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    CdcKernel.chunks(input.asInstanceOf[UTF8String], w, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcKernel.chunks($c, $w, $maskBits)")

  override def prettyName: String = "cdc_chunks"

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  /** Column-API wrapper. */
  def apply(text: Column, w: Int, maskBits: Int): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(text), w, maskBits))
}
