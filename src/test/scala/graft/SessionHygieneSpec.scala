package graft

import graft.Ckpt._
import org.apache.spark.storage.StorageLevel

class SessionHygieneSpec extends SparkSpecBase {

  private def persisted(id: Int): Boolean =
    spark.sparkContext.getPersistentRDDs.get(id)
      .exists(_.getStorageLevel != StorageLevel.NONE)

  test("freeCheckpoint frees a checkpoint-rooted frame and rejects derived plans") {
    val s = spark; import s.implicits._
    val df = (1 to 100).toDF("x").ckpt()
    val rddId = df.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd.id
    assert(persisted(rddId), "localCheckpoint must pin blocks")
    SessionHygiene.freeCheckpoint(df)
    assert(!persisted(rddId), "freeCheckpoint must release them")
    // a derived plan could strand OTHER live checkpoints — must throw
    val derived = (1 to 100).toDF("x").ckpt().select(org.apache.spark.sql.functions.col("x") + 1)
    intercept[IllegalArgumentException](SessionHygiene.freeCheckpoint(derived))
  }

  test("audit mode: loopCkpt frames still free; derived frames no-op instead of throwing") {
    val s = spark; import s.implicits._
    sys.props("graft.ckpt.disable") = "true"
    try {
      // loopCkpt checkpoints EVEN in audit mode (Ckpt.scala) — the shadow
      // audit leaks one pinned block set per loop round unless these free
      val loop = (1 to 100).toDF("x").loopCkpt()
      val rddId = loop.queryExecution.analyzed
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd.id
      assert(persisted(rddId))
      SessionHygiene.freeCheckpoint(loop)
      assert(!persisted(rddId), "audit mode must still free loopCkpt frames")
      // ckpt() was the identity → callers hand plain derived plans with
      // nothing persisted: no-op, not IllegalArgumentException
      val plain = (1 to 100).toDF("x").ckpt()
      SessionHygiene.freeCheckpoint(plain)
    } finally sys.props.remove("graft.ckpt.disable")
  }
}
