package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class WindowSpec extends SparkSpecBase {

  test("approx_percentile sketch stays within the GK rank-error bound of exact") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val accuracy = 10000
    val approx = orders.groupBy("o_orderstatus")
      .agg(
        expr(s"approx_percentile(o_totalprice, 0.5, $accuracy)").as("p50"),
        expr(s"approx_percentile(o_totalprice, 0.95, $accuracy)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((status, (p50, p95)) <- approx; (p, v) <- Seq(0.5 -> p50, 0.95 -> p95)) {
      val grp = orders.filter(col("o_orderstatus") === status)
      val n = grp.count()
      // GK guarantee: the returned value's rank is within n/accuracy of p·n
      val rank = grp.filter(col("o_totalprice") <= v).count()
      val tol = n.toDouble / accuracy + 1
      assert(math.abs(rank - p * n) <= tol,
        s"$status p$p: rank $rank of $n outside ±$tol of ${p * n}")
      // and the sketch value is an actual element of the group
      assert(grp.filter(col("o_totalprice") === v).count() > 0,
        s"$status p$p: $v is not a data element")
    }
  }
}
