package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** fastText-style linear quality filter (ml.QualityFilter): the model must
  * actually separate target-language documents from the rest on held-out
  * data, keep-rates must order the way a corpus filter needs them to, and
  * membership of the train split must be the deterministic hash split (not
  * partition-layout-dependent sampling).
  */
class QualityFilterSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("held-out AUC: model rediscovers the heuristic decision surface from raw features") {
    val (_, heldOut, _) = QualityFilter.trainScore(spark, dir)
    val cached = heldOut.cache()
    // both classes must actually appear held-out, else AUC is vacuous
    val classes = cached.select($"is_target").distinct().as[Double].collect().toSet
    assert(classes == Set(0.0, 1.0), s"degenerate held-out label set $classes")
    val auc = RandomForestPipeline.evaluate(cached, "is_target")("roc_auc")
    assert(auc > 0.8, s"held-out AUC $auc — linear filter failed to learn the quality label")
    cached.unpersist()
  }

  test("kept docs score higher on the heuristic than dropped docs (held-out)") {
    val (_, heldOut, _) = QualityFilter.trainScore(spark, dir)
    val byPred = heldOut
      .withColumn("q", graft.ops.LlmData.qualityCol(concat_ws(" ", $"toks")))
      .groupBy($"prediction").agg(avg($"q").as("mean_q"))
      .as[(Double, Double)].collect().toMap
    if (byPred.size == 2)
      assert(byPred(1.0) > byPred(0.0),
        s"keep-class mean quality ${byPred(1.0)} must beat drop-class ${byPred(0.0)}")
  }

  test("train split is the deterministic hash split — stable under repartitioning") {
    val df = QualityFilter.featurize(spark, dir)
    val bucket = graft.ops.Etl.hashBucket(col("doc_id"))
    val a = df.filter(bucket < 80).select($"doc_id").as[Long].collect().sorted
    val b = df.repartition(13).filter(bucket < 80)
      .select($"doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
    assert(a.length > 0 && a.length < df.count())
  }
}
