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

  /** The shared composition: build the filter over the dim keys, broadcast
    * it, prune the fact side map-side through `probe`, then the exact
    * left_semi. No distinct on the keys side: left_semi keeps a fact row
    * if ANY match exists, so duplicate keys cannot duplicate output, and
    * a distinct would cost a full extra exchange on the dim. */
  private def pruned(fact: DataFrame, keys: DataFrame,
                     factKey: String, keyCol: String,
                     expected: Long, fpp: Double)
                    (probe: org.apache.spark.broadcast.Broadcast[
                       org.apache.spark.util.sketch.BloomFilter]
                       => org.apache.spark.sql.expressions.UserDefinedFunction): DataFrame = {
    val bf = keys.stat.bloomFilter(keyCol, expected, fpp)
    // the probe UDF must capture the BROADCAST handle, not the filter:
    // a captured filter rides every task closure instead of the
    // once-per-executor broadcast block
    val bfB = fact.sparkSession.sparkContext.broadcast(bf)
    fact.filter(probe(bfB)(col(factKey)))
      .join(keys.select(col(keyCol).as(factKey)), Seq(factKey), "left_semi")
  }

  /** Exact semi-join of `fact` on `factKey` against `keys.keyCol`,
    * pre-pruned map-side by a Bloom filter of the key set.
    *
    * `expected`/`fpp` size the filter: bits ≈ -n·ln(fpp)/ln2². */
  def semiJoin(fact: DataFrame, keys: DataFrame,
               factKey: String, keyCol: String,
               expected: Long = 1000000L, fpp: Double = 0.03): DataFrame =
    pruned(fact, keys, factKey, keyCol, expected, fpp) { bfB =>
      udf((k: java.lang.Long) => k != null && bfB.value.mightContainLong(k))
    }

  /** String-keyed variant of [[semiJoin]] (raw token grams, URLs): same
    * exact-composition contract, keyed through `mightContainString`. */
  def semiJoinString(fact: DataFrame, keys: DataFrame,
                     factKey: String, keyCol: String,
                     expected: Long = 1000000L, fpp: Double = 0.03): DataFrame =
    pruned(fact, keys, factKey, keyCol, expected, fpp) { bfB =>
      udf((k: String) => k != null && bfB.value.mightContainString(k))
    }
}
