package graft.llm

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
}
