package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Registry-level gate for the harness-compat contract (DriverCompat):
  * the external driver's comparator cannot hash complex-typed cells, so
  * every registered query must emit scalar-only top-level columns. This
  * is the assert that would have caught r10's emb6 red row at commit
  * time — and the negative test below proves it does. */
class DriverSchemaSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("every registry query emits a driver-safe (scalar-only) schema") {
    val bad = graft.SparkEntry.all.flatMap { q =>
      DriverCompat.exemptions.get(q.name) match {
        case Some(_) => None // explicitly exempted, reason recorded there
        case None =>
          val v = DriverCompat.violations(q.fn(spark, dir).schema)
          if (v.isEmpty) None else Some(s"${q.name}: ${v.mkString(", ")}")
      }
    }
    assert(bad.isEmpty,
      s"driver-unsafe output schemas (emit LONG form or scalar derivatives, " +
        s"or add an exemption with a reason):\n${bad.mkString("\n")}")
  }

  test("the gate catches the r10 emb6 shape: a raw array<int> codes column") {
    // scalarQuantize's WIDE frame is the internal API for sim7 — exactly
    // the shape that crashed the driver when registered directly
    val wide = graft.llm.Similarity.scalarQuantize(
      graft.model.Tables.embeddings(spark, dir), "vec_id", "embedding")
    val v = DriverCompat.violations(wide.schema)
    assert(v.exists(_.startsWith("codes:")),
      s"expected the codes array to violate the contract, got: $v")
    // and the registered LONG form passes it
    val registered = graft.SparkEntry.all.find(_.name == "emb6_scalar_quant").get
    assert(DriverCompat.violations(registered.fn(spark, dir).schema).isEmpty)
  }

  test("the driver's flagship entry returns rows with a driver-safe schema") {
    // the driver smoke-checks rows > 0 on sf0.001; a local regression
    // here must not first surface in the round harness
    val df = graft.SparkEntry.entry(spark)
    assert(DriverCompat.violations(df.schema).isEmpty)
    assert(df.count() > 0)
  }

  test("exemption list stays justified: every entry names a live query") {
    val names = graft.SparkEntry.all.map(_.name).toSet
    val dead = DriverCompat.exemptions.keys.filterNot(names.contains)
    assert(dead.isEmpty, s"exemptions for unregistered queries: $dead")
  }
}
