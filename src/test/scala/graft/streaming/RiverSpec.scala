package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** River-equivalent online ML (streamz/river.py contract at micro-batch
  * granularity): exact online least squares recovers the generating
  * coefficients and equals the one-shot batch fit after any prefix of
  * batches; prequential metrics are predict-before-learn; the scaler
  * transform normalizes with running moments.
  */
class RiverSpec extends SparkSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // y = 3·x1 − 2·x2 + 1, exactly (noise-free → exact recovery)
  private def gen(seed: Int, n: Int): Seq[(Seq[Double], Double)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      val x1 = rnd.nextDouble() * 10 - 5
      val x2 = rnd.nextDouble() * 4
      (Seq(x1, x2), 3.0 * x1 - 2.0 * x2 + 1.0)
    }
  }

  test("train: recovers exact coefficients across micro-batches; metrics are prequential") {
    val model = new River.OnlineLinearRegression(features = 2)
    val in = MemoryStream[(Seq[Double], Double)]
    val h = River.train(in.toDS(), model, queryName = "river_train_t")
    val chunks = gen(7, 300).grouped(100).toSeq
    chunks.foreach { c => in.addData(c); h.query.processAllAvailable() }
    h.query.stop()

    val w = model.weights
    assert(math.abs(w(0) - 3.0) < 1e-6 && math.abs(w(1) + 2.0) < 1e-6)
    assert(math.abs(model.intercept - 1.0) < 1e-6)

    // prequential: batch 0 is scored by the zero model (large error),
    // later batches by an already-exact fit (≈ 0 error)
    val ms = h.metrics
    assert(ms.map(_.batchId) == Vector(0L, 1L, 2L))
    assert(ms.head.mae > 1.0)
    assert(ms(1).mae < 1e-6 && ms(2).mae < 1e-6)
    assert(ms.forall(_.n == 100))
  }

  test("online fit after k batches == one-shot OLS of the union (order independence)") {
    val data = gen(21, 240)
    // online, 3 uneven batches
    val online = new River.OnlineLinearRegression(features = 2)
    Seq(data.take(30), data.slice(30, 200), data.drop(200)).foreach { c =>
      online.learn(River.computeStats(c.toDS(), 2))
    }
    // one shot, different physical order
    val oneShot = new River.OnlineLinearRegression(features = 2)
    oneShot.learn(River.computeStats(data.reverse.toDS().repartition(7), 2))
    online.weights.zip(oneShot.weights).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-8)
    }
  }

  test("replayed micro-batch folds at most once (at-least-once guard)") {
    import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
    val model = new River.OnlineLinearRegression(features = 2)
    val mref = new AtomicReference[Vector[River.BatchMetric]](Vector.empty)
    val last = new AtomicLong(-1L)
    val batch = gen(11, 50).toDS()
    River.foldBatch(batch, 0L, model, mref, last, None)
    val w1 = model.weights.toSeq
    val n1 = model.snapshot.n
    // foreachBatch retry: same batch id arrives again — must be a no-op
    River.foldBatch(batch, 0L, model, mref, last, None)
    assert(model.weights.toSeq == w1 && model.snapshot.n == n1)
    assert(mref.get().size == 1)
    // the next real batch still folds
    River.foldBatch(gen(12, 50).toDS(), 1L, model, mref, last, None)
    assert(model.snapshot.n == n1 + 50 && mref.get().size == 2)
  }

  test("train with stateDir: model survives a query restart (resumes == one-shot OLS)") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("graft_river_src").toString
    val state = Files.createTempDirectory("graft_river_state").toString
    def writeRows(rows: Seq[(Seq[Double], Double)]): Unit =
      rows.map { case (x, y) => (x(0), x(1), y) }.toDF("x1", "x2", "y")
        .coalesce(1).write.mode("append").parquet(src)
    def stream() = spark.readStream
      .schema("x1 double, x2 double, y double").parquet(src)
      .selectExpr("array(x1, x2)", "y").as[(Seq[Double], Double)]

    val all = gen(31, 200)
    writeRows(all.take(80))
    val m1 = new River.OnlineLinearRegression(features = 2)
    val h1 = River.train(stream(), m1, "river_restart_a", stateDir = Some(state))
    h1.query.processAllAvailable(); h1.query.stop()
    assert(m1.snapshot.n == 80)

    // restart: FRESH model object, same stateDir — offsets log skips the
    // committed batch, the restored Stats carry the learned state forward
    writeRows(all.drop(80))
    val m2 = new River.OnlineLinearRegression(features = 2)
    val h2 = River.train(stream(), m2, "river_restart_b", stateDir = Some(state))
    h2.query.processAllAvailable(); h2.query.stop()
    assert(m2.snapshot.n == 200) // 80 restored + 120 new, none twice

    val oneShot = new River.OnlineLinearRegression(features = 2)
    oneShot.learn(River.computeStats(all.toDS(), 2))
    m2.weights.zip(oneShot.weights).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-8)
    }
  }

  test("predict: scores with current parameters (RiverPredict)") {
    val model = new River.OnlineLinearRegression(features = 2)
    model.learn(River.computeStats(gen(5, 120).toDS(), 2))
    val scored = River.predict(gen(6, 10).toDS(), model)
      .select("label", "prediction")
      .as[(Double, Double)].collect()
    scored.foreach { case (y, p) => assert(math.abs(y - p) < 1e-6) }
  }

  test("model agrees with the oracle-checked river_ols query on real data") {
    val model = new River.OnlineLinearRegression(features = 1)
    val data = spark.read.parquet(sf() + "/lineitem.parquet")
      .select($"l_quantity", $"l_extendedprice")
      .as[(Double, Double)].collect()
      .map { case (x, y) => (Seq(x), y) }
    // two uneven online batches — must converge to the same closed form
    Seq(data.take(1000), data.drop(1000)).foreach { c =>
      model.learn(River.computeStats(c.toSeq.toDS(), 1))
    }
    val row = graft.queries.MlOps.queries("river_ols")(spark, sf())
      .select("slope", "intercept").first()
    assert(math.abs(model.weights(0) - row.getDouble(0)) < 1e-7)
    assert(math.abs(model.intercept - row.getDouble(1)) < 1e-4) // intercept ~1e3
  }

  test("scaler: transform normalizes with running moments (RiverTransform)") {
    val scaler = new River.OnlineStandardScaler(features = 2)
    val xs = Seq(Seq(1.0, 10.0), Seq(3.0, 10.0), Seq(5.0, 40.0), Seq(7.0, 40.0))
    scaler.learn(River.computeStats(xs.map((_, 0.0)).toDS(), 2))
    val (mean, varr) = scaler.meanVar
    assert(mean.toSeq == Seq(4.0, 25.0))
    assert(varr(0) == 5.0 && varr(1) == 225.0) // population variance
    val out = scaler.transform(xs.toDS()).collect()
    // normalized column means ≈ 0, sd ≈ 1
    val m0 = out.map(_(0)).sum / out.length
    val m1 = out.map(_(1)).sum / out.length
    assert(math.abs(m0) < 1e-12 && math.abs(m1) < 1e-12)
    assert(math.abs(out.map(r => r(0) * r(0)).sum / out.length - 1.0) < 1e-12)
  }

  test("logistic regression: prequential accuracy climbs; direction tracks a one-shot fit") {
    // planted separable stream: y = 1 iff w*·x + b* > 0
    val wStar = Array(1.5, -2.0, 0.8, 1.0)
    val bStar = 0.3
    val rnd = new scala.util.Random(11)
    def row(): (Seq[Double], Double) = {
      val x = Seq.fill(4)(rnd.nextGaussian())
      val z = (0 until 4).map(i => wStar(i) * x(i)).sum + bStar
      (x, if (z > 0) 1.0 else 0.0)
    }
    val batches = Seq.fill(8)(Seq.fill(250)(row()))
    val model = new River.OnlineLogisticRegression(features = 4,
      lr = 0.5, l2 = 1e-3, stepsPerBatch = 5)
    val in = MemoryStream[(Seq[Double], Double)]
    val h = River.train(in.toDS(), model, queryName = "river_logreg_t")
    batches.foreach { b => in.addData(b); h.query.processAllAvailable() }
    h.query.stop()

    // prequential: each batch scored BEFORE learning it. Batch 0 meets
    // the zero model (p = 0.5 for everything — zero within-half hits);
    // later batches meet a trained one. The non-exact model's metric
    // CLIMBS instead of snapping to zero like the OLS spec's.
    val ms = h.metrics
    assert(ms.map(_.batchId) == (0L until 8L).toVector)
    assert(ms.head.acc < 0.6, s"untrained model scored too well: ${ms.head.acc}")
    assert(ms.last.acc > 0.9, s"trained prequential accuracy too low: ${ms.map(_.acc)}")
    assert(ms.takeRight(3).map(_.acc).sum / 3 > ms.take(2).map(_.acc).sum / 2 + 0.2,
      s"accuracy did not climb: ${ms.map(_.acc)}")

    // the learned coefficient DIRECTION tracks (a) the generating
    // hyperplane and (b) a one-shot full-data gradient fit (same loss,
    // driver-side), within a cosine tolerance — on separable data the
    // norm keeps growing, the direction is what converges
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (p, q) => p * q }.sum
      d / (math.sqrt(a.map(p => p * p).sum) * math.sqrt(b.map(p => p * p).sum))
    }
    val all = batches.flatten
    val oneShot = {
      val w = new Array[Double](5)
      for (_ <- 0 until 40) { // 8 batches × 5 steps, full data each step
        val g = new Array[Double](5)
        all.foreach { case (x, y) =>
          val z = (0 until 4).map(i => w(i) * x(i)).sum + w(4)
          val e = 1.0 / (1.0 + math.exp(-z)) - y
          (0 until 4).foreach(i => g(i) += e * x(i))
          g(4) += e
        }
        (0 until 5).foreach { i =>
          val reg = if (i < 4) 1e-3 * w(i) else 0.0
          w(i) -= 0.5 * (g(i) / all.size + reg)
        }
      }
      w
    }
    val learned = model.weights // (w1..w4, intercept)
    assert(cosine(learned, oneShot) > 0.95,
      s"online direction drifted from one-shot: ${learned.toSeq} vs ${oneShot.toSeq}")
    assert(cosine(learned.take(4), wStar) > 0.95,
      s"online direction drifted from the generator: ${learned.toSeq}")
    // the fitted model separates the full stream it was trained on
    val fullAcc = all.count { case (x, y) =>
      (model.predict(x) >= 0.5) == (y == 1.0) }.toDouble / all.size
    assert(fullAcc > 0.95, s"full-data accuracy $fullAcc")

    // state round trip (the restart-restore path train() uses)
    val clone = new River.OnlineLogisticRegression(features = 4)
    clone.restoreState(model.state)
    assert(clone.weights.toSeq == model.weights.toSeq)
  }
}
