package graft.ml

import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.{Pipeline => MlPipeline, PipelineModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X3 (ref: Solutions/gold_war_etl_dag.py:158-181 + lecture6/test_model.py):
  * the gold×news ML stage — feature assembly, RandomForest(numTrees=50,
  * seed=42), 80/20 split, accuracy — re-expressed on MLlib.
  *
  * The reference's pandas shift(-1) target becomes a lead() window; its
  * pickle artifact becomes PipelineModel.save (K8).
  */
object RfPipeline {

  /** Build the training frame from a daily series: features + next-day
    * up/down target (ref: gold_war:144-146). `orderCol` must be unique per
    * row (a date) within a series. The reference's single-instrument
    * series uses the default empty `partitionCols` (global-window lead —
    * acceptable for thousands of rows); pass the instrument/key columns
    * for a multi-series frame, where each series shifts independently in
    * parallel with no single-reducer sort. */
  def withTarget(daily: DataFrame, closeCol: String, orderCol: String,
                 partitionCols: Seq[String] = Nil): DataFrame = {
    val w =
      if (partitionCols.isEmpty) Window.orderBy(col(orderCol))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    daily
      .withColumn("close_next", lead(col(closeCol), 1).over(w))
      .withColumn("label", (col("close_next") > col(closeCol)).cast("double"))
      .na.drop(Seq("close_next"))
  }

  /** Train RF(50 trees, seed 42) on an 80/20 split; returns (model,
    * accuracy) — the reference's train_model contract. */
  def train(training: DataFrame, featureCols: Seq[String]): (PipelineModel, Double) = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val rf = new RandomForestClassifier()
      .setNumTrees(50).setSeed(42L)
      .setLabelCol("label").setFeaturesCol("features")
    val pipeline = new MlPipeline().setStages(Array(assembler, rf))
    val Array(train, test) = training.randomSplit(Array(0.8, 0.2), seed = 42L)
    val model = pipeline.fit(train)
    val accuracy = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction").setMetricName("accuracy")
      .evaluate(model.transform(test))
    (model, accuracy)
  }

  /** K8: persist / reload the model artifact. */
  def save(model: PipelineModel, path: String): Unit = model.write.overwrite().save(path)
  def load(path: String): PipelineModel = PipelineModel.load(path)

  /** lecture6/test_model.py equivalent: reload, re-score, sample
    * predictions. */
  def evaluate(modelPath: String, data: DataFrame): (Double, DataFrame) = {
    val model = load(modelPath)
    val scored = model.transform(data)
    val accuracy = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction").setMetricName("accuracy")
      .evaluate(scored)
    (accuracy, scored.select("label", "prediction").limit(10))
  }
}
