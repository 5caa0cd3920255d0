package graft.llm

import graft.Ckpt._

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-pipeline quality/domain classifier — the fastText-style gate modern
  * curation stacks train on weak labels and apply at corpus scale (GPT-3's
  * WebText-similarity filter, DCLM's fastText classifier, LLaMA's
  * Wikipedia-reference model all follow this shape: cheap linear model
  * over hashed bag-of-words, trained in minutes, applied in one scan).
  *
  * Spark-first composition: HashingTF buckets tokens into a fixed feature
  * space (no vocabulary build, no driver state — the hashing trick is
  * what makes train AND apply single-pass at any corpus size), MLlib
  * LogisticRegression trains distributed (L-BFGS over partial gradients),
  * and scoring is one `model.transform` scan. The model object is
  * weights-sized (numFeatures doubles), a MODEL like IVF's centroids —
  * never data-sized.
  */
object Classifier {

  final case class Fitted(model: LogisticRegressionModel, numFeatures: Int)

  private def featurize(df: DataFrame, text: String, numFeatures: Int): DataFrame = {
    val tf = new HashingTF().setInputCol("__toks").setOutputCol("__feat")
      .setNumFeatures(numFeatures)
    tf.transform(df.withColumn("__toks", split(lower(col(text)), "\\s+")))
  }

  /** Train on weak labels (any boolean column expression). */
  def train(df: DataFrame, text: String, label: Column,
            numFeatures: Int = 1 << 12, maxIter: Int = 100,
            regParam: Double = 1e-3, standardize: Boolean = true): Fitted = {
    val prepared = featurize(df.withColumn("__label", label.cast("double")), text, numFeatures)
    val lr = new LogisticRegression()
      .setFeaturesCol("__feat").setLabelCol("__label")
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(standardize)
    Fitted(lr.fit(prepared), numFeatures)
  }

  /** Score a corpus: (…, prob, pred). One transform scan, no shuffle. */
  def score(fitted: Fitted, df: DataFrame, text: String,
            threshold: Double = 0.5): DataFrame =
    fitted.model.transform(featurize(df, text, fitted.numFeatures))
      .withColumn("prob", element_at(vector_to_array(col("probability")), 2))
      .withColumn("pred", (col("prob") >= threshold))
      .drop("__toks", "__feat", "rawPrediction", "probability", "prediction")

  // -------------------------------------------------------------------------
  // Portable twin — the sim5b/dd10 pattern applied to classifier training:
  // fixed-round full-batch gradient descent over md5-bucketed hashing-trick
  // features, squashed by the RATIONAL fast sigmoid
  // σ̃(z) = 0.5 + 0.5·z/(1+|z|) (only + * / abs — IEEE-exact on both
  // engines, unlike exp whose last ulp is libm-dependent). Every cross-row
  // sum folds in a canonical order (per-doc dot by feature index, per-
  // feature gradient by doc id), so weights, probabilities, and
  // predictions replay BIT-FOR-BIT in DuckDB ([[portableOracleSql]]).
  // MLlib [[train]]/[[score]] stay the production path (L-BFGS, true
  // logistic loss) with their ClassifierSpec accuracy pins.
  // -------------------------------------------------------------------------

  /** md5-bucketed hashing trick: same 7-hex-digit fold the portable
    * MinHash family uses. Tokens split on the explicit class (not `\s` —
    * Java and RE2 disagree on vertical tab). */
  private val tokenSep = "[ \t\n\r\f]+"

  private def bucket(tok: Column, numFeatures: Int): Column =
    graft.functions.Md5Prefix(tok, 7) % numFeatures

  private def fastSigmoid(z: Column): Column =
    lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))

  /** (pid, f, c) term-frequency rows + one bias row (f = numFeatures,
    * c = 1) per doc; `extra` columns are carried through (the label). */
  private def featsPortable(df: DataFrame, id: String, text: String,
                            numFeatures: Int, extra: Seq[(String, Column)]): DataFrame = {
    val carried = extra.map { case (n, c) => c.as(n) }
    val toks = df.select(
        (col(id).cast("long").as("pid") +: carried) :+
          explode(split(lower(col(text)), tokenSep)).as("tok"): _*)
      .filter(col("tok") =!= "")
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy("pid")
    toks
      .groupBy(col("pid") +: extra.map(e => col(e._1)) :+ bucket(col("tok"), numFeatures).as("f"): _*)
      .agg(count(lit(1)).as("cnt"))
      // TF normalization: raw counts make z scale with document length and
      // saturate the sigmoid into the base rate (measured: ~0.51 holdout
      // accuracy unnormalized vs 0.78 normalized); integer counts divide
      // exactly the same on both engines
      .withColumn("c", col("cnt").cast("double") / sum(col("cnt")).over(wTot).cast("double"))
      .drop("cnt")
      .unionByName(df.select(
        (col(id).cast("long").as("pid") +: carried) :+ lit(numFeatures.toLong).as("f") :+ lit(1.0).as("c"): _*))
  }

  /** Canonical-order dot product of a doc's features with the weight
    * literal: fold `c·w(f)` sorted by feature index (DuckDB twin:
    * `list_sum(list(c*w ORDER BY f))`, the same L2R fold). Sort on the
    * (f, t) struct, extract t in that order, then the native FoldSum —
    * identical additions in the identical order to the old interpreted
    * struct-field fold, one lambda per element instead of two. */
  private def zFold(w: Array[Double]): Column =
    graft.functions.FoldSum(transform(
      array_sort(collect_list(struct(col("f"),
        (col("c") * element_at(array(w.map(lit): _*), (col("f") + 1).cast("int"))).as("t")))),
      s => s.getField("t")))

  /** [[zFold]] over a PRE-SORTED per-doc (f, c) array column: the same
    * c·w(f) multiplications folded in the same f-ascending order (f is
    * unique per doc, so sorting struct(f, c) IS the f order), just
    * without re-collecting and re-sorting the rows every round. */
  private def zFoldArr(fc: Column, w: Array[Double]): Column =
    graft.functions.FoldSum(transform(fc,
      s => s.getField("c") *
        element_at(array(w.map(lit): _*), (s.getField("f") + 1).cast("int"))))

  /** Fixed-round portable fit. Returns the weight vector (numFeatures
    * term weights + trailing bias) — model-sized driver state, like
    * BPE's merge table or IVF's centroids. */
  def trainPortable(train: DataFrame, id: String, text: String, label: Column,
                    numFeatures: Int = 256, rounds: Int = 8, lr: Double = 4.0): Array[Double] = {
    // Pre-grouped per-doc feature arrays (r16): the old loop re-ran a
    // collect_list + array_sort aggregate over the (pid, f, c) rows PLUS
    // a join back EVERY round (8×). Grouping once into an f-sorted
    // (f, c) array per doc makes each round's error pass a pure
    // PROJECTION over the doc-sized checkpoint and its gradient pass one
    // explode + one aggregate — the round's only shuffle, as before.
    // Fold orders are unchanged (zFoldArr's scaladoc for the dot; the
    // gradient still folds struct(pid, t) sorted by pid over the same
    // row set after the explode), so the weights replay bit-for-bit —
    // ClassifierSpec pins them against the row-at-a-time form and the
    // cls1b DuckDB oracle re-pins the whole chain.
    val featsArr = featsPortable(train, id, text, numFeatures,
      Seq("y" -> label.cast("double")))
      .groupBy("pid")
      .agg(first(col("y")).as("y"),
           array_sort(collect_list(struct(col("f"), col("c")))).as("fc"))
      .ckpt()
    val n = train.count()
    val w = Array.fill(numFeatures + 1)(0.0)
    for (_ <- 1 to rounds) {
      val werr = featsArr.select(col("pid"), col("fc"),
        (col("y") - fastSigmoid(zFoldArr(col("fc"), w))).as("err"))
      val grads = werr
        .select(col("pid"), col("err"), explode(col("fc")).as("e"))
        .groupBy(col("e.f").as("f"))
        .agg(graft.functions.FoldSum(transform(
          array_sort(collect_list(struct(col("pid"), (col("e.c") * col("err")).as("t")))),
          s => s.getField("t"))).as("g"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      for (f <- 0 to numFeatures) w(f) = w(f) + lr * grads.getOrElse(f.toLong, 0.0) / n
    }
    w
  }

  /** Score with a portable model: (id, prob 3dp, pred). One scan + one
    * per-doc fold; the weight vector rides along as a literal. */
  def scorePortable(df: DataFrame, id: String, text: String,
                    w: Array[Double], numFeatures: Int = 256): DataFrame = {
    val sig = fastSigmoid(col("z"))
    featsPortable(df, id, text, numFeatures, Seq.empty)
      .groupBy("pid").agg(zFold(w).as("z"))
      .select(col("pid").as(id),
        (floor(sig * 1000 + 0.5) / 1000.0).as("prob"),
        (sig >= 0.5).as("pred"))
  }

  /** DuckDB twin of trainPortable + scorePortable: the token hashing, the
    * unrolled GD rounds (z CTE, error CTE, weight CTE per round), and the
    * scoring fold — all sums `list(x ORDER BY …)` + list_sum ≡ Spark's
    * sorted aggregate fold. `labelSql` must evaluate to a BOOLEAN over the
    * train CTE's columns; `trainWhere`/`scoreWhere` filter `table`. */
  def portableOracleSql(table: String, id: String, text: String,
                        labelSql: String, trainWhere: String, scoreWhere: String,
                        numFeatures: Int = 256, rounds: Int = 8, lr: Double = 4.0): String = {
    val f = numFeatures
    def featsCte(src: String, withY: Boolean): String = {
      val y = if (withY) ", y" else ""
      s"""SELECT pid$y, f, cnt::DOUBLE / (sum(cnt) OVER (PARTITION BY pid))::DOUBLE AS c
         |FROM (
         |  SELECT pid$y, ('0x' || substr(md5(tok), 1, 7))::BIGINT % $f AS f, count(*) AS cnt
         |  FROM (SELECT pid$y, unnest(string_split_regex(lower(t), '[ \\t\\n\\r\\f]+')) AS tok
         |        FROM $src) WHERE tok <> '' GROUP BY ALL)
         |UNION ALL SELECT pid$y, $f::BIGINT, 1.0 FROM $src""".stripMargin
    }
    val roundCtes = (1 to rounds).map { r =>
      s"""z$r AS MATERIALIZED (
         |  SELECT pid, any_value(y) AS y, list_sum(list(c * w ORDER BY f)) AS z
         |  FROM tf JOIN w${r - 1} USING (f) GROUP BY pid),
         |e$r AS (SELECT pid, y - (0.5 + 0.5 * z / (1 + abs(z))) AS err FROM z$r),
         |w$r AS MATERIALIZED (
         |  SELECT wp.f, wp.w + ($lr * coalesce(g.g, 0.0) / (SELECT count(*) FROM tr)) AS w
         |  FROM w${r - 1} wp LEFT JOIN (
         |    SELECT f, list_sum(list(c * err ORDER BY pid)) AS g
         |    FROM tf JOIN e$r USING (pid) GROUP BY f) g USING (f))""".stripMargin
    }.mkString(",\n")
    s"""WITH tr AS MATERIALIZED (
       |  SELECT $id::BIGINT AS pid, ($labelSql)::INT::DOUBLE AS y, $text AS t
       |  FROM $table WHERE $trainWhere),
       |tf AS MATERIALIZED (${featsCte("tr", withY = true)}),
       |w0 AS (SELECT unnest(generate_series(0, $f))::BIGINT AS f, 0.0 AS w),
       |$roundCtes,
       |sc AS MATERIALIZED (
       |  SELECT $id::BIGINT AS pid, $text AS t FROM $table WHERE $scoreWhere),
       |sf AS (${featsCte("sc", withY = false)}),
       |zs AS (
       |  SELECT pid, list_sum(list(c * w ORDER BY f)) AS z
       |  FROM sf JOIN w$rounds USING (f) GROUP BY pid)
       |SELECT pid AS $id,
       |       floor((0.5 + 0.5 * z / (1 + abs(z))) * 1000 + 0.5) / 1000.0 AS prob,
       |       (0.5 + 0.5 * z / (1 + abs(z))) >= 0.5 AS pred
       |FROM zs ORDER BY $id""".stripMargin
  }
}
