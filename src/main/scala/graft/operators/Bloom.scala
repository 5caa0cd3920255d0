package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning — the classic 100 TB fact-table pattern.
  *
  * A semi-join of a petabyte fact table against a dim too large to
  * broadcast normally shuffles the ENTIRE fact side on the join key. A
  * Bloom filter of the dim keys, however, fits in executor memory at
  * key-counts where the dim itself does not (~1.2 GB for 10^9 keys at 1%
  * fpp), so the fact side can be pre-filtered map-side — only rows whose
  * key *might* match ever reach the exchange, cutting shuffled volume by
  * the join selectivity. The exact semi-join afterwards removes the false
  * positives, so the composition is EXACT — the filter only prunes.
  *
  * (Spark's own `InjectRuntimeFilter` does this automatically in narrow
  * cases; this operator is the explicit, always-available form, with the
  * filter built by `DataFrameStatFunctions.bloomFilter` — a distributed
  * treeAggregate, merged once on the driver, rebroadcast to tasks.)
  */
object Bloom {

  /** Exact semi-join of `fact` on `factKey` against `keys.keyCol`,
    * pre-pruned map-side by a Bloom filter of the key set.
    *
    * `expected`/`fpp` size the filter: bits ≈ -n·ln(fpp)/ln2². */
  def semiJoin(fact: DataFrame, keys: DataFrame,
               factKey: String, keyCol: String,
               expected: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    val bf = keys.stat.bloomFilter(keyCol, expected, fpp)
    val bfB = fact.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bfB.value.mightContainLong(k))
    // no distinct on the keys side: left_semi keeps a fact row if ANY
    // match exists, so duplicate keys cannot duplicate output, and a
    // distinct would cost a full extra exchange on the dim
    fact.filter(mightContain(col(factKey)))
      .join(keys.select(col(keyCol).as(factKey)), Seq(factKey), "left_semi")
  }

  /** String-keyed variant of [[semiJoin]] (raw token grams, URLs): same
    * exact-composition contract, keyed through `mightContainString`. */
  def semiJoinString(fact: DataFrame, keys: DataFrame,
                     factKey: String, keyCol: String,
                     expected: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    val bf = keys.stat.bloomFilter(keyCol, expected, fpp)
    val bfB = fact.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: String) =>
      k != null && bfB.value.mightContainString(k))
    fact.filter(mightContain(col(factKey)))
      .join(keys.select(col(keyCol).as(factKey)), Seq(factKey), "left_semi")
  }
}
