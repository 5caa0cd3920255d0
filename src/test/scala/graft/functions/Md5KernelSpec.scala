package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins Md5Kernel.first8's byte-fold and (off, len) slice handling
  * bit-for-bit to a fresh JDK MessageDigest (the kernel itself stays on
  * the thread-local MessageDigest — a hand-rolled single-block transform
  * was tried and measured SLOWER, see Md5Kernel's note), including
  * lengths straddling the 55-byte one-block boundary, and pins the
  * Md5Prefix expression to the conv(substring(md5(x), 1, h), 16, 10)
  * Column chain it replaces — multi-byte UTF-8 included — so every
  * portable oracle is unaffected by construction. */
class Md5KernelSpec extends SparkSpecBase {

  private def jdkFirst8(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  test("first8 equals MessageDigest on every length across the block boundary") {
    val rnd = new scala.util.Random(42)
    for (len <- 0 to 130) {
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      assert(Md5Kernel.first8(b, 0, len) === jdkFirst8(b), s"len=$len")
    }
  }

  test("first8 honors (off, len) slices") {
    val rnd = new scala.util.Random(7)
    val b = new Array[Byte](300)
    rnd.nextBytes(b)
    for (_ <- 1 to 200) {
      val off = rnd.nextInt(250)
      val len = rnd.nextInt(math.min(60, 300 - off))
      assert(Md5Kernel.first8(b, off, len) ===
        jdkFirst8(java.util.Arrays.copyOfRange(b, off, off + len)),
        s"off=$off len=$len")
    }
  }

  test("Md5Prefix equals the conv(substring(md5)) Column chain, incl. UTF-8 and nulls") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 300).map { i =>
      val n = rnd.nextInt(80)
      val str = (1 to n).map(_ => rnd.nextPrintableChar()).mkString +
        (if (i % 3 == 0) "éß漢字🚀" else "")
      (i.toLong, if (i % 17 == 0) null else str)
    }
    val df = rows.toDF("id", "t")
    for (h <- Seq(1, 7, 8, 13, 15)) {
      val got = df.select(col("id"), Md5Prefix(col("t"), h).as("v"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
      val want = df.select(col("id"),
          conv(substring(md5(col("t").cast("binary")), 1, h), 16, 10).cast("long").as("v"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
      assert(got === want, s"hexDigits=$h")
    }
  }
}
