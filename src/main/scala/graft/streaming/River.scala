package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Online-ML layer — the Spark-native equivalent of the reference's river
  * bridge (streamz/river.py:7-62: RiverTransform = transform_one,
  * RiverTrain = learn_one with optional prequential metric emission,
  * RiverPredict = predict_one), closing SURVEY §2.7 with running code.
  *
  * Where river updates models one element at a time in one process, the
  * Spark-first shape is one update per MICRO-BATCH with the per-batch
  * work fully distributed: each batch reduces to a constant-size
  * sufficient-statistics vector (one narrow mapPartitions + a driver
  * fold over ≤ numPartitions partials — the treeAggregate shape, no
  * shuffle at all), the driver folds it into the running state, and the
  * updated model broadcasts back implicitly via the next batch's closure.
  * At 100 TB/day the wide work per batch is a single scan.
  *
  * [[OnlineLinearRegression]] is deliberately EXACT, not SGD: it folds
  * Gram-matrix statistics (G += Σ x·xᵀ, b += Σ y·x) and solves the ridge
  * normal equations per batch, so after any prefix of batches the
  * weights equal the batch OLS fit of everything seen — a stronger
  * invariant than river's incremental learners, and the property the
  * spec pins. [[OnlineStandardScaler]] is the transform_one analogue
  * (running mean/variance normalization from the same kind of folded
  * moments).
  *
  * Train-time metric emission mirrors river's progressive validation
  * (predict with the model BEFORE it has learned the batch, then learn),
  * at batch granularity: [[River.train]] appends one prequential metric
  * row per micro-batch to [[TrainHandle.metrics]].
  */
object River {

  /** Constant-size sufficient statistics of one data batch: row count,
    * Σ y, Σ y², Σ x (d), Σ y·x (d), upper triangle of Σ x·xᵀ (d(d+1)/2). */
  final case class Stats(n: Long, sy: Double, syy: Double,
                         sx: Array[Double], sxy: Array[Double], sxx: Array[Double]) {
    def merge(o: Stats): Stats = {
      var i = 0
      val ax = sx.clone(); val axy = sxy.clone(); val axx = sxx.clone()
      i = 0; while (i < ax.length) { ax(i) += o.sx(i); i += 1 }
      i = 0; while (i < axy.length) { axy(i) += o.sxy(i); i += 1 }
      i = 0; while (i < axx.length) { axx(i) += o.sxx(i); i += 1 }
      Stats(n + o.n, sy + o.sy, syy + o.syy, ax, axy, axx)
    }
  }
  object Stats {
    def zero(d: Int): Stats = Stats(0L, 0.0, 0.0,
      new Array[Double](d), new Array[Double](d), new Array[Double](d * (d + 1) / 2))
  }

  /** Distributed per-batch statistics: one partial per partition (narrow),
    * folded on the driver — `collect()` returns ≤ numPartitions rows of
    * O(d²) doubles, never data rows. */
  def computeStats(batch: Dataset[(Seq[Double], Double)], d: Int): Stats = {
    val spark = batch.sparkSession
    import spark.implicits._
    val partials = batch.mapPartitions { it =>
      var s = Stats.zero(d)
      it.foreach { case (x, y) =>
        require(x.length == d, s"feature width ${x.length} != $d")
        s = s.copy(n = s.n + 1, sy = s.sy + y, syy = s.syy + y * y)
        var i = 0
        var t = 0
        while (i < d) {
          s.sx(i) += x(i)
          s.sxy(i) += y * x(i)
          var j = i
          while (j < d) { s.sxx(t) += x(i) * x(j); j += 1; t += 1 }
          i += 1
        }
      }
      if (s.n == 0) Iterator.empty
      else Iterator.single((s.n, s.sy, s.syy, s.sx.toSeq, s.sxy.toSeq, s.sxx.toSeq))
    }
    partials.collect().foldLeft(Stats.zero(d)) { case (acc, (n, sy, syy, sx, sxy, sxx)) =>
      acc.merge(Stats(n, sy, syy, sx.toArray, sxy.toArray, sxx.toArray))
    }
  }

  /** river model contract at batch granularity: fold a micro-batch in,
    * predict for a feature vector, and expose a whole-model `state` so
    * [[train]] can persist/restore across query restarts. Two families
    * implement it: exact-sufficient-statistics models
    * ([[OnlineLinearRegression]], [[OnlineStandardScaler]]) reduce the
    * batch to a constant-size [[Stats]] and fold that; gradient models
    * ([[OnlineLogisticRegression]]) run their own distributed passes —
    * the reference's river.py wraps arbitrary `learn_one` models, and
    * this is the arbitrary-model face of the same shape. Either way the
    * contract is: DISTRIBUTED work only inside `learnBatch`; nothing but
    * O(d)-to-O(d²) aggregates reach the driver. */
  trait OnlineModel extends Serializable {
    def d: Int
    /** Fold one micro-batch into the model (distributed). */
    def learnBatch(batch: Dataset[(Seq[Double], Double)]): Unit
    def predict(x: Seq[Double]): Double
    /** Whole-model snapshot for atomic persistence (restart restore). */
    def state: java.io.Serializable
    /** Replace the model's state (restart restore). */
    def restoreState(s: java.io.Serializable): Unit
  }

  /** Exact online least squares with intercept and ridge `lambda`:
    * solving (G + λI)·w = b over the RUNNING sufficient statistics means
    * the fit after k batches equals the one-shot OLS fit of all k batches'
    * rows — order-independent. Restart-safe only when driven by
    * [[River.train]] with a `stateDir` (the running Stats persists per
    * batch and restores on restart); a bare in-memory handle is
    * single-run. Features are augmented with a constant 1 for the
    * intercept, so weights = (w₁…w_d, intercept). */
  final class OnlineLinearRegression(val features: Int, lambda: Double = 1e-9)
      extends OnlineModel {
    val d: Int = features
    private val aug = features + 1 // + intercept column
    private var acc: Stats = Stats.zero(d)
    @volatile private var w: Array[Double] = new Array[Double](aug)

    def weights: Array[Double] = w.clone()
    def intercept: Double = w(d)

    def learn(stats: Stats): Unit = synchronized {
      acc = acc.merge(stats)
      if (acc.n > 0) w = solve()
    }
    override def learnBatch(batch: Dataset[(Seq[Double], Double)]): Unit =
      learn(computeStats(batch, d))

    // learn/merge never mutates acc's arrays in place, so handing out the
    // reference is safe
    def snapshot: Stats = synchronized(acc)
    def restore(s: Stats): Unit = synchronized {
      require(s.sx.length == d, s"restored width ${s.sx.length} != $d")
      acc = s
      w = if (acc.n > 0) solve() else new Array[Double](aug)
    }
    override def state: java.io.Serializable = snapshot
    override def restoreState(s: java.io.Serializable): Unit =
      restore(s.asInstanceOf[Stats])

    /** Normal equations over augmented features [x, 1]: the Gram matrix
      * blocks are Σxxᵀ (from sxx), Σx (from sx) and n; rhs is (Σy·x, Σy).
      * Gauss-Jordan with partial pivoting — d is model width, driver-side
      * O(d³), negligible vs any batch. */
    private def solve(): Array[Double] = {
      val a = Array.ofDim[Double](aug, aug + 1)
      var t = 0
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) { a(i)(j) = acc.sxx(t); a(j)(i) = acc.sxx(t); j += 1; t += 1 }
        a(i)(d) = acc.sx(i); a(d)(i) = acc.sx(i)
        a(i)(aug) = acc.sxy(i)
        i += 1
      }
      a(d)(d) = acc.n.toDouble
      a(d)(aug) = acc.sy
      i = 0
      while (i < aug) { a(i)(i) += lambda; i += 1 }
      // Gauss-Jordan elimination with partial pivoting
      var col = 0
      while (col < aug) {
        var p = col
        var r = col + 1
        while (r < aug) { if (math.abs(a(r)(col)) > math.abs(a(p)(col))) p = r; r += 1 }
        val tmp = a(col); a(col) = a(p); a(p) = tmp
        val piv = a(col)(col)
        require(math.abs(piv) > 0, "singular normal equations — raise lambda")
        var j = col
        while (j <= aug) { a(col)(j) /= piv; j += 1 }
        r = 0
        while (r < aug) {
          if (r != col && a(r)(col) != 0) {
            val f = a(r)(col)
            var j2 = col
            while (j2 <= aug) { a(r)(j2) -= f * a(col)(j2); j2 += 1 }
          }
          r += 1
        }
        col += 1
      }
      Array.tabulate(aug)(i2 => a(i2)(aug))
    }

    override def predict(x: Seq[Double]): Double = {
      val wv = w
      var s = wv(d)
      var i = 0
      while (i < d) { s += wv(i) * x(i); i += 1 }
      s
    }
  }

  /** transform_one analogue: running-moments standard scaler. `learn`
    * folds count/sum/sum-of-squares; `transform` normalizes a batch with
    * the current moments (population variance, river's convention). */
  final class OnlineStandardScaler(val features: Int) extends OnlineModel {
    val d: Int = features
    private var acc: Stats = Stats.zero(d)
    def learn(stats: Stats): Unit = synchronized { acc = acc.merge(stats) }
    override def learnBatch(batch: Dataset[(Seq[Double], Double)]): Unit =
      learn(computeStats(batch, d))
    def snapshot: Stats = synchronized(acc)
    def restore(s: Stats): Unit = synchronized { acc = s }
    override def state: java.io.Serializable = snapshot
    override def restoreState(s: java.io.Serializable): Unit =
      restore(s.asInstanceOf[Stats])
    override def predict(x: Seq[Double]): Double =
      throw new UnsupportedOperationException("scaler transforms, not predicts")
    def meanVar: (Array[Double], Array[Double]) = synchronized {
      val n = math.max(acc.n, 1L).toDouble
      val mean = acc.sx.map(_ / n)
      // Var(x_i) needs Σx_i² — the diagonal of sxx
      val varr = new Array[Double](d)
      var i = 0
      var t = 0
      while (i < d) { varr(i) = acc.sxx(t) / n - mean(i) * mean(i); t += d - i; i += 1 }
      (mean, varr)
    }
    def transform(xs: Dataset[Seq[Double]]): Dataset[Seq[Double]] = {
      val spark = xs.sparkSession
      import spark.implicits._
      val (mean, varr) = meanVar
      val sd = varr.map(v => math.sqrt(math.max(v, 1e-300)))
      xs.map(x => x.indices.map(i => (x(i) - mean(i)) / sd(i)))
    }
  }

  /** Persistent state of [[OnlineLogisticRegression]]: the weight vector
    * (w₁…w_d, intercept) plus the gradient-step count. */
  final case class LogisticState(w: Array[Double], steps: Long)

  /** Online binary logistic regression — the NON-exact member of the
    * River family, proving the shape holds for models with no
    * closed-form sufficient statistics (the reference's river.py wraps
    * arbitrary `learn_one` models; here "arbitrary" means
    * gradient-trained). Per micro-batch, `stepsPerBatch` full-batch
    * gradient-descent steps: each step is one distributed aggregate of
    * the (d+1)-dim logistic gradient Σ (σ(w·x+b) − y)·[x, 1] — a narrow
    * mapPartitions + a ≤ numPartitions-row driver fold, exactly
    * [[computeStats]]'s shape, except the aggregate depends on the
    * CURRENT weights so it cannot be a static Stats reduction. The batch
    * is pinned in storage across the steps (and released after), so the
    * source is scanned once per batch, not once per step.
    *
    * `predict` returns the probability σ(w·x + b); classification is
    * `>= 0.5`. The intercept is never L2-regularized (standard
    * convention). Unlike [[OnlineLinearRegression]] the fit is
    * order-dependent and approximate — prequential accuracy improving
    * over batches, and the coefficient direction tracking a one-shot
    * full-data fit, are what RiverSpec pins. */
  final class OnlineLogisticRegression(val features: Int, lr: Double = 0.5,
      l2: Double = 0.0, stepsPerBatch: Int = 5) extends OnlineModel {
    require(features >= 1, s"features must be >= 1: $features")
    require(lr > 0 && l2 >= 0 && stepsPerBatch >= 1,
      s"need lr > 0, l2 >= 0, stepsPerBatch >= 1: $lr, $l2, $stepsPerBatch")
    val d: Int = features
    private val aug = features + 1
    @volatile private var w: Array[Double] = new Array[Double](aug)
    private var steps = 0L

    /** (w₁…w_d, intercept). */
    def weights: Array[Double] = w.clone()
    def intercept: Double = w(d)

    override def predict(x: Seq[Double]): Double = {
      val wv = w
      var z = wv(d)
      var i = 0
      while (i < d) { z += wv(i) * x(i); i += 1 }
      1.0 / (1.0 + math.exp(-z))
    }

    override def learnBatch(batch: Dataset[(Seq[Double], Double)]): Unit = synchronized {
      val spark = batch.sparkSession
      import spark.implicits._
      val pinned = if (stepsPerBatch > 1)
        batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else batch
      try {
        var step = 0
        var n = -1L
        while (step < stepsPerBatch && n != 0L) {
          val wv = w
          val dd = d
          val augW = aug
          val partials = pinned.mapPartitions { it =>
            val g = new Array[Double](augW)
            var cnt = 0L
            it.foreach { case (x, y) =>
              require(x.length == dd, s"feature width ${x.length} != $dd")
              var z = wv(dd)
              var i = 0
              while (i < dd) { z += wv(i) * x(i); i += 1 }
              val e = 1.0 / (1.0 + math.exp(-z)) - y
              i = 0
              while (i < dd) { g(i) += e * x(i); i += 1 }
              g(dd) += e
              cnt += 1
            }
            if (cnt == 0) Iterator.empty else Iterator.single((g.toSeq, cnt))
          }.collect()
          n = partials.iterator.map(_._2).sum
          if (n > 0) {
            val g = new Array[Double](aug)
            partials.foreach { case (pg, _) =>
              var i = 0
              while (i < aug) { g(i) += pg(i); i += 1 }
            }
            val nw = new Array[Double](aug)
            var i = 0
            while (i < aug) {
              val reg = if (i < d) l2 * wv(i) else 0.0 // intercept unregularized
              nw(i) = wv(i) - lr * (g(i) / n + reg)
              i += 1
            }
            w = nw
            steps += 1
          }
          step += 1
        }
      } finally if (stepsPerBatch > 1) pinned.unpersist(blocking = false)
    }

    override def state: java.io.Serializable =
      synchronized(LogisticState(w.clone(), steps))
    override def restoreState(s: java.io.Serializable): Unit = synchronized {
      val st = s.asInstanceOf[LogisticState]
      require(st.w.length == aug, s"restored width ${st.w.length} != $aug")
      w = st.w.clone()
      steps = st.steps
    }
  }

  /** One prequential metric row per micro-batch. Deliberate divergence
    * from the reference: river.py's RiverTrain (river.py:45-47) calls
    * `learn_one` FIRST and predicts after, so its metric scores a model
    * that has already seen the example; this engine predicts before
    * learning — the standard prequential (test-then-train) order, which
    * measures true out-of-sample error. `acc`
    * is the within-half-a-unit rate — for {0,1} labels and probability
    * predictions that is exactly classification accuracy; for regression
    * it is a fixed-tolerance hit rate. */
  final case class BatchMetric(batchId: Long, n: Long, mae: Double, rmse: Double,
                               acc: Double)

  /** Handle on a running training stream: the live model plus the
    * per-batch prequential metrics (the reference's metric emission). */
  final class TrainHandle(val query: StreamingQuery, val model: OnlineModel,
                          metricsRef: AtomicReference[Vector[BatchMetric]]) {
    def metrics: Vector[BatchMetric] = metricsRef.get()
  }

  /** Atomic (batchId, Stats) persistence for restart-safe training: write
    * a temp file, then atomically rename over the live snapshot, so a
    * crash mid-write can never leave a torn file. One constant-size file,
    * not a log — the Stats value is the whole model. */
  private object ModelStore {
    import java.io.{BufferedInputStream, BufferedOutputStream, ObjectInputStream, ObjectOutputStream}
    import java.nio.file.{Files, Paths, StandardCopyOption}
    def write(dir: String, batchId: Long, state: java.io.Serializable): Unit = {
      Files.createDirectories(Paths.get(dir))
      val tmp = Paths.get(dir, "model-stats.bin.tmp")
      val out = new ObjectOutputStream(new BufferedOutputStream(Files.newOutputStream(tmp)))
      try { out.writeLong(batchId); out.writeObject(state) } finally out.close()
      Files.move(tmp, Paths.get(dir, "model-stats.bin"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    def read(dir: String): Option[(Long, java.io.Serializable)] = {
      val p = Paths.get(dir, "model-stats.bin")
      if (!Files.exists(p)) None
      else {
        val in = new ObjectInputStream(new BufferedInputStream(Files.newInputStream(p)))
        try Some((in.readLong(), in.readObject().asInstanceOf[java.io.Serializable]))
        finally in.close()
      }
    }
  }

  /** One micro-batch fold: prequential metric with the CURRENT model,
    * then learn, then (optionally) persist — guarded against replays.
    * foreachBatch is at-least-once, so a retried batch id at or below
    * `lastFolded` is dropped whole: folding it again would break the
    * "fit == one-shot OLS of everything seen" invariant. Persist happens
    * BEFORE Spark commits the batch, so every crash point replays into
    * either the fold (stats not yet written) or the guard (already
    * written) — exactly-once either way. */
  private[streaming] def foldBatch(batch: Dataset[(Seq[Double], Double)], batchId: Long,
      model: OnlineModel, metricsRef: AtomicReference[Vector[BatchMetric]],
      lastFolded: java.util.concurrent.atomic.AtomicLong,
      stateDir: Option[String]): Unit = {
    if (batchId <= lastFolded.get()) return
    val spark = batch.sparkSession
    import spark.implicits._
    val m = model // serialized into the closure with current weights
    val err = batch.map { case (x, y) =>
      val e = m.predict(x) - y
      (math.abs(e), e * e, if (math.abs(e) < 0.5) 1L else 0L, 1L)
    }.toDF("sae", "sse", "hit", "n")
      .agg(sum("sae"), sum("sse"), sum("hit"), sum("n")).first()
    if (!err.isNullAt(3) && err.getLong(3) > 0) {
      val n = err.getLong(3)
      metricsRef.updateAndGet(_ :+ BatchMetric(
        batchId, n, err.getDouble(0) / n, math.sqrt(err.getDouble(1) / n),
        err.getLong(2).toDouble / n))
    }
    model.learnBatch(batch)
    stateDir.foreach(d => ModelStore.write(d, batchId, model.state))
    lastFolded.set(batchId)
  }

  /** RiverTrain: drive a `(features, label)` stream into `model` via
    * foreachBatch. Per micro-batch: (1) prequential metric — predict the
    * batch with the CURRENT model (distributed map, before learning);
    * (2) reduce the batch to Stats (distributed, constant-size result);
    * (3) fold into the model on the driver.
    *
    * With `stateDir` the training run is RESTART-SAFE and exactly-once:
    * the query checkpoints offsets under `stateDir/checkpoint`, the
    * model's accumulated Stats persists atomically per batch under
    * `stateDir`, restarting restores the Stats and resumes from the next
    * uncommitted batch, and replayed batch ids are folded at most once
    * (see [[foldBatch]]). Without it the handle is single-run: a
    * restarted query re-reads from scratch into a fresh model. */
  def train(data: Dataset[(Seq[Double], Double)], model: OnlineModel,
            queryName: String = "river_train",
            stateDir: Option[String] = None): TrainHandle = {
    val metricsRef = new AtomicReference[Vector[BatchMetric]](Vector.empty)
    val lastFolded = new java.util.concurrent.atomic.AtomicLong(
      stateDir.flatMap(ModelStore.read) match {
        case Some((bid, st)) => model.restoreState(st); bid
        case None => -1L
      })
    val writer = data.writeStream.queryName(queryName)
    val query = stateDir
      .fold(writer)(d => writer.option("checkpointLocation", d + "/checkpoint"))
      .foreachBatch { (batch: Dataset[(Seq[Double], Double)], batchId: Long) =>
        foldBatch(batch, batchId, model, metricsRef, lastFolded, stateDir)
      }
      .start()
    new TrainHandle(query, model, metricsRef)
  }

  /** RiverPredict: score a batch with the model's CURRENT parameters
    * (inside foreachBatch for streams, directly for batch frames). */
  def predict(df: Dataset[(Seq[Double], Double)], model: OnlineModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = model
    df.map { case (x, y) => (x, y, m.predict(x)) }
      .toDF("features", "label", "prediction")
  }
}
