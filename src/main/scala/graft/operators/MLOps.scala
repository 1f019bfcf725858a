package graft.operators

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{RandomForestRegressionModel, RandomForestRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** fit_regr_random_forest / predict_random_forest
  * (reference: openeo_processes_dask ml/random_forest.py:22-161 — the
  * reference trains an XGBoost "random forest" over dask; here the model is
  * Spark MLlib's native distributed RandomForestRegressor, trained and
  * applied on executors, with a fixed seed for reproducible runs).
  */
object MLOps {

  /** Train on `featureCols` → `targetCol`. Mirrors the reference's
    * defaults: 100 trees, sqrt feature subset strategy
    * (reference: random_forest.py:49-57).
    */
  def fitRandomForest(df: DataFrame, featureCols: Seq[String],
      targetCol: String, numTrees: Int = 100, maxDepth: Int = 8,
      seed: Long = 42L): RandomForestRegressionModel = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(df)
    new RandomForestRegressor()
      .setNumTrees(numTrees)
      .setMaxDepth(maxDepth)
      .setFeatureSubsetStrategy("sqrt")
      .setSeed(seed)
      .setLabelCol(targetCol)
      .setFeaturesCol("features")
      .fit(assembled)
  }

  /** Batch prediction: assemble features, score on executors
    * (reference: random_forest.py:128-161's pixel flattening is unnecessary
    * here — rows are already the flat form).
    */
  def predictRandomForest(model: RandomForestRegressionModel, df: DataFrame,
      featureCols: Seq[String]): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(df)
    model.transform(assembled).drop("features")
  }
}
