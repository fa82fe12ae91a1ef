package graft.ml

import org.apache.spark.ml.feature.{OneHotEncoder, OneHotEncoderModel, StringIndexer, StringIndexerModel}
import org.apache.spark.sql.DataFrame

/** Categorical encoding parity (SURVEY §2.8 M1/M2;
  * /root/reference/nyc_taxi_final.py:581-596): per-column
  * StringIndexer(handleInvalid="keep") fit+transform in a loop, then one
  * OneHotEncoder(dropLast=false) over all `*_idx` columns, dropping the
  * original and index columns in reference order.
  *
  * Scale notes: StringIndexer.fit is one countByValue job whose result (the
  * label array) is O(#distinct) on the driver — fine for low-cardinality
  * categoricals like time_period; the transform itself is a broadcast map.
  * OneHotEncoder.fit only reads column metadata / max index.
  */
object FeatureEncoding {

  /** M1: index each categorical column to `<col>_idx` (frequencyDesc order,
    * unseen labels kept in the extra bucket). Returns the transformed frame
    * and the fitted models (exposed for tests and for applying the same
    * mapping to new data).
    */
  def indexCategoricals(df: DataFrame, cats: Seq[String]): (DataFrame, Seq[StringIndexerModel]) =
    cats.foldLeft((df, Seq.empty[StringIndexerModel])) { case ((d, ms), c) =>
      val m = new StringIndexer()
        .setInputCol(c).setOutputCol(s"${c}_idx")
        .setHandleInvalid("keep")
        .fit(d)
      (m.transform(d), ms :+ m)
    }

  /** M2: one-hot encode all `*_idx` columns to `*_ohe` with dropLast=false
    * (every category gets a slot, nyc_taxi_final.py:588-594). */
  def oneHotEncode(df: DataFrame, cats: Seq[String]): (DataFrame, OneHotEncoderModel) = {
    val m = new OneHotEncoder()
      .setInputCols(cats.map(c => s"${c}_idx").toArray)
      .setOutputCols(cats.map(c => s"${c}_ohe").toArray)
      .setDropLast(false)
      .fit(df)
    (m.transform(df), m)
  }

  /** The reference's full encode step: index → drop originals → encode →
    * drop index columns (nyc_taxi_final.py:581-596). */
  def encode(df: DataFrame, cats: Seq[String] = Seq("time_period")): DataFrame = {
    val (indexed, _) = indexCategoricals(df, cats)
    val (encoded, _) = oneHotEncode(indexed.drop(cats: _*), cats)
    encoded.drop(cats.map(c => s"${c}_idx"): _*)
  }
}
