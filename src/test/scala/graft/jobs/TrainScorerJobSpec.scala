package graft.jobs

import graft.engine.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class TrainScorerJobSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("logistic fit separates date spans from the rest (C1 train -> predict)") {
    import spark.implicits._
    val train = TrainScorerJob.examplesFromCorpus(spark, 150, 4, "date").persist()
    val model = TrainScorerJob.fitBinary(train, graft.core.Features.width, iters = 40)
    assert(model.trainLoss < 0.2, s"train loss ${model.trainLoss}")
    // held-out docs (disjoint url range via different count → different pages)
    val test = TrainScorerJob.examplesFromCorpus(spark, 40, 2, "date")
      .collect()
    val correct = test.count { ex =>
      val p = TrainScorerJob.predict(model, ex.features)
      (p >= 0.5) == (ex.label == 1.0)
    }
    val acc = correct.toDouble / test.length
    assert(acc >= 0.95, s"held-out accuracy $acc over ${test.length} spans")
    train.unpersist()
  }

  test("X8 -> C1: fit on the ASSEMBLED 270-wide feature frame (date vs rest)") {
    import spark.implicits._
    val dim = graft.engine.FeatureFrame.width()
    assert(dim == 270)
    val train = TrainScorerJob.examplesFromFrame(spark, 120, 4, "date").persist()
    val model = TrainScorerJob.fitBinary(train, dim, iters = 40)
    val test = TrainScorerJob.examplesFromFrame(spark, 40, 2, "date").collect()
    val correct = test.count { ex =>
      (TrainScorerJob.predict(model, ex.features) >= 0.5) == (ex.label == 1.0)
    }
    val acc = correct.toDouble / test.length
    assert(acc >= 0.95, s"frame-trained held-out accuracy $acc over ${test.length} spans")
    train.unpersist()
  }

  test("fit is reproducible for a fixed partitioning") {
    import spark.implicits._
    val train = TrainScorerJob.examplesFromCorpus(spark, 60, 4, "amount").persist()
    val a = TrainScorerJob.fitBinary(train, graft.core.Features.width, iters = 10)
    val b = TrainScorerJob.fitBinary(train, graft.core.Features.width, iters = 10)
    assert(a.weights.toSeq == b.weights.toSeq && a.bias == b.bias)
    train.unpersist()
  }
}
