package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class NfcSpec extends SparkSpecBase {

  test("NFC composes combining marks, is idempotent, preserves ASCII identity") {
    val s = spark; import s.implicits._
    val rows = Seq(
      "café",      // cafe + combining acute → café
      "café",            // already composed
      "plain ascii stays",
      "über öl",  // diaeresis pairs
      "Å"          // A + ring → Å
    ).toDF("t")
    val got = rows.select(NfcNormalize(col("t")).as("n")).as[String].collect()
    assert(got(0) == "caf\u00e9")
    assert(got(1) == "caf\u00e9")
    assert(got(2) == "plain ascii stays")
    assert(got(3) == "\u00fcber \u00f6l")
    assert(got(4) == "\u00c5")
    // idempotence: NFC(NFC(x)) == NFC(x)
    val twice = rows.select(NfcNormalize(NfcNormalize(col("t"))).as("n"))
      .as[String].collect()
    assert(twice.toSeq == got.toSeq)
  }

  test("NFC null propagates") {
    val s = spark; import s.implicits._
    val r = Seq(Option.empty[String]).toDF("t")
      .select(NfcNormalize(col("t"))).collect()
    assert(r(0).isNullAt(0))
  }
}
