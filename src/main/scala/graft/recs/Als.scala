package graft.recs

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Collaborative-filtering recommendation pipeline (the reference's
  * cf.recommendations.recording.* family re-expressed Spark-first):
  *
  *   1. [[buildPlaycounts]] — (user, item) playcounts with dense integer
  *      ids. The reference assigns ids with a global `rank()` window — a
  *      single-partition scaling hazard it documents itself
  *      (create_dataframes.py:235-264, SURVEY §4); here ids come from
  *      `zipWithIndex`, which is distributed.
  *   2. confidence transform — the piecewise CASE of
  *      create_dataframes.py:172-183 mapping raw playcount → implicit
  *      confidence.
  *   3. [[train]] — spark.ml ALS, implicit prefs, coldStartStrategy=drop
  *      (train_models.py:154-161); seeded randomSplit 5:1 (:78) with RMSE
  *      model selection.
  *   4. [[recommend]] — top-k per user from the model, exploded flat
  *      (recommend.py:293-305).
  */
object Als {

  /** Distributed dense-id assignment: distinct values zipped with a stable
    * index. Deterministic given a sorted input. */
  def denseIds(df: DataFrame, valueCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(valueCol),
      org.apache.spark.sql.types.StructField(idCol,
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    val rows = df.select(col(valueCol)).distinct()
      .orderBy(col(valueCol))
      .rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row(r.get(0), i.toInt)
      }
    spark.createDataFrame(rows, schema)
  }

  /** Confidence transform constants (create_dataframes.py:83-89). */
  private val PlaycountCap = 100

  def buildPlaycounts(
      listens: DataFrame, userCol: String, itemCol: String): DataFrame = {
    val users = denseIds(listens, userCol, "als_user_id")
    val items = denseIds(listens, itemCol, "als_item_id")
    listens
      .groupBy(col(userCol), col(itemCol))
      .agg(count(lit(1)).as("playcount"))
      .join(users, Seq(userCol))
      .join(items, Seq(itemCol))
      .withColumn("confidence",
        when(col("playcount") > PlaycountCap, lit(PlaycountCap.toFloat))
          .otherwise(col("playcount").cast("float")))
  }

  def train(playcounts: DataFrame, rank: Int = 8, maxIter: Int = 5,
      regParam: Double = 0.1, alpha: Double = 3.0): ALSModel = {
    val als = new ALS()
      .setUserCol("als_user_id").setItemCol("als_item_id")
      .setRatingCol("confidence")
      .setImplicitPrefs(true).setColdStartStrategy("drop")
      .setRank(rank).setMaxIter(maxIter).setRegParam(regParam)
      .setAlpha(alpha).setSeed(45L)
    als.fit(playcounts)
  }

  /** Train/validation RMSE (the reference's model-selection metric). */
  def validationRmse(playcounts: DataFrame): Double = {
    val Array(trainDf, valDf) = playcounts.randomSplit(Array(5.0, 1.0), 45L)
    val model = train(trainDf)
    new RegressionEvaluator().setMetricName("rmse")
      .setLabelCol("confidence").setPredictionCol("prediction")
      .evaluate(model.transform(valDf))
  }

  /** The grid search's winner plus the selection evidence the reference
    * ledgers with every saved model (train_models.py:236-250). */
  final case class GridResult(
      model: ALSModel, rank: Int, regParam: Double, alpha: Double,
      maxIter: Int, validationRmse: Double)

  /** Grid-searched training with 2-fold cross-validation, parallelism 3,
    * RMSE selection — the reference's model-selection harness
    * (train_models.py:163-179: ParamGridBuilder over rank/regParam/alpha,
    * CrossValidator numFolds=2 parallelism=3, RegressionEvaluator RMSE).
    * Returns the winner WITH its params and cross-validated RMSE, so the
    * caller can ledger them. */
  def trainWithGridDetailed(
      playcounts: DataFrame,
      ranks: Seq[Int] = Seq(4, 8),
      regParams: Seq[Double] = Seq(0.1, 1.0),
      alphas: Seq[Double] = Seq(3.0)): GridResult = {
    import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
    val als = new ALS()
      .setUserCol("als_user_id").setItemCol("als_item_id")
      .setRatingCol("confidence")
      .setImplicitPrefs(true).setColdStartStrategy("drop")
      .setMaxIter(5).setSeed(45L)
    val grid = new ParamGridBuilder()
      .addGrid(als.rank, ranks)
      .addGrid(als.regParam, regParams)
      .addGrid(als.alpha, alphas)
      .build()
    val cv = new CrossValidator()
      .setEstimator(als)
      .setEvaluator(new RegressionEvaluator().setMetricName("rmse")
        .setLabelCol("confidence").setPredictionCol("prediction"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(2)
      .setParallelism(3)
      .setSeed(45L)
    val fitted = cv.fit(playcounts)
    val best = fitted.bestModel.asInstanceOf[ALSModel]
    // avgMetrics is aligned with the param grid; RMSE → lower is better
    val bestIdx = fitted.avgMetrics.zipWithIndex.minBy(_._1)._2
    val bestParams = grid(bestIdx)
    GridResult(best,
      rank = bestParams(als.rank),
      regParam = bestParams(als.regParam),
      alpha = bestParams(als.alpha),
      maxIter = als.getMaxIter,
      validationRmse = fitted.avgMetrics(bestIdx))
  }

  def trainWithGrid(
      playcounts: DataFrame,
      ranks: Seq[Int] = Seq(4, 8),
      regParams: Seq[Double] = Seq(0.1, 1.0),
      alphas: Seq[Double] = Seq(3.0)): ALSModel =
    trainWithGridDetailed(playcounts, ranks, regParams, alphas).model

  /** Top-k recommendations for a user subset, flat (user, rank, item,
    * score) — the reference recommends per requested user batch
    * (`recommendForUserSubset`, recommend.py:293), not for the full user
    * universe; scoring all users × all items is the quadratic trap. */
  def recommend(model: ALSModel, users: DataFrame, k: Int): DataFrame =
    model.recommendForUserSubset(users.select(col("als_user_id")).distinct(), k)
      .select(col("als_user_id"),
        posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("als_user_id"), (col("pos") + 1).as("rank"),
        col("rec.als_item_id").as("als_item_id"),
        col("rec.rating").as("score"))

  /** Deterministic-given-data fit envelope (the q268 recipe applied to the
    * ML row): trains the seeded model once and reduces the fit + the
    * recommendation batch to counts and contract booleans the driver
    * oracle can pin exactly —
    *
    *   - `n_users`/`n_items`: distinct dense ids, DuckDB-recomputable from
    *     the raw purchase pairs;
    *   - factor-matrix shape: one factor row per training user/item, every
    *     factor vector of length `rank` (train_models.py trains, then the
    *     saved model's factor frames ARE the model);
    *   - the `recommendForUserSubset` contract (recommend.py:293-305):
    *     exactly min(k, n_items) recommendations per requested user, ranks
    *     a 1..k permutation, scores non-increasing in rank, item ids
    *     inside the dense-id domain.
    *
    * Every column is deterministic for fixed data regardless of ALS float
    * jitter — a broken id assignment, dropped user, or unsorted
    * recommendation batch flips a boolean and fails the driver gate. The
    * raw factor/score VALUES stay spec-gated (seeded-RMSE spec), as floats
    * from iterative training must be. */
  def fitEnvelope(pc0: DataFrame, rank: Int = 8, maxIter: Int = 5,
      subsetMax: Int = 500, k: Int = 5): DataFrame = {
    val spark = pc0.sparkSession
    import spark.implicits._
    // the playcount frame feeds FOUR+ plan positions (training, both
    // distinct counts, the recommend subset) and its plan is expensive —
    // two dense-id sorts + zipWithIndex + two joins; materialize once
    // with size-gated placement (guide §1.2: stop recomputing the same
    // subtree; pinned at bench scale, local-disk stage at corpus scale)
    val pcP = graft.core.StateTable.pinOrStage(pc0, Seq.empty, "als_pc")
    val pc = pcP.df
    val model = train(pc, rank = rank, maxIter = maxIter)
    val nUsers = pc.select(col("als_user_id")).distinct().count()
    val nItems = pc.select(col("als_item_id")).distinct().count()
    def shape(factors: DataFrame): (Long, Int, Int) = {
      val r = factors.agg(count(lit(1)), min(size(col("features"))),
        max(size(col("features")))).head()
      (r.getLong(0), r.getInt(1), r.getInt(2))
    }
    val (ufN, ufMin, ufMax) = shape(model.userFactors)
    val (ifN, ifMin, ifMax) = shape(model.itemFactors)
    val kEff = math.min(k.toLong, nItems)
    val recs = recommend(model, pc.filter(col("als_user_id") < subsetMax), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("als_user_id")).orderBy(col("rank"))
    val perUser = recs
      .withColumn("prev_score", lag(col("score"), 1).over(w))
      .groupBy(col("als_user_id"))
      .agg(count(lit(1)).as("n"),
        min(col("rank")).as("rmin"), max(col("rank")).as("rmax"),
        countDistinct(col("rank")).as("rdist"),
        bool_and(col("prev_score").isNull ||
          col("score") <= col("prev_score")).as("mono"),
        bool_and(col("als_item_id") >= 0 &&
          col("als_item_id") < nItems).as("items"))
    val rec = perUser.agg(
      count(lit(1)).as("rec_users"), sum(col("n")).as("rec_rows"),
      bool_and(col("n") === kEff && col("rmin") === 1 &&
        col("rmax") === kEff && col("rdist") === kEff).as("ranks_ok"),
      bool_and(col("mono")).as("scores_ok"),
      bool_and(col("items")).as("items_ok")).head()
    pcP.release() // every consumer above is eager; nothing reads pc later
    Seq((nUsers, nItems,
      ufN == nUsers, ifN == nItems,
      ufMin == rank && ufMax == rank && ifMin == rank && ifMax == rank,
      rec.getLong(0), rec.getLong(1),
      rec.getBoolean(2), rec.getBoolean(3), rec.getBoolean(4)))
      .toDF("n_users", "n_items", "user_factors_ok", "item_factors_ok",
        "factor_dim_ok", "rec_users", "rec_rows", "rec_ranks_ok",
        "rec_scores_ok", "rec_items_ok")
  }

  /** Model-selection envelope (train_models.py:78 seeded 5:1 split + RMSE
    * metric): the split bookkeeping is exact (sizes sum to the population;
    * the realized fraction sits far inside a 5σ binomial band), and the
    * validation RMSE — a float from iterative training — collapses to a
    * boolean the way q268 pins its 5σ statistics. The bound is DERIVED
    * from the data, not pinned: the zero predictor's RMSE on the same
    * validation rows (`sqrt(mean(label²))`) is the score a fit that
    * learned nothing would approach from below, so a healthy fit sits at
    * or under it at every scale (measured ratio 0.889→0.995 as sf grows,
    * rising toward — never past — 1.0), while a DIVERGED fit (exploding
    * factors) or a broken confidence transform lands at a large multiple.
    * The gate is `rmse <= zeroRmse * ratioBound`, scale-free by
    * construction — a fixed absolute bound would eventually pinch as the
    * measured trend approaches the baseline (round-9 ADVICE). */
  def validationEnvelope(pc0: DataFrame, ratioBound: Double): DataFrame = {
    val spark = pc0.sparkSession
    import spark.implicits._
    // same materialize-once as fitEnvelope: the frame feeds the total
    // count, both split counts, the zero-predictor aggregate, training,
    // and the evaluation transform — six executions of the dense-id +
    // join subtree without it. (randomSplit already depended on the
    // incoming partitioning, so the oracle pins booleans, not the split.)
    val pcP = graft.core.StateTable.pinOrStage(pc0, Seq.empty, "als_pc")
    val pc = pcP.df
    val n = pcP.rows // the placement's measured count — no re-count job
    val Array(trainDf, valDf) = pc.randomSplit(Array(5.0, 1.0), 45L)
    val nTrain = trainDf.count()
    val nVal = valDf.count()
    val zeroRmse = math.sqrt(
      valDf.agg(avg(col("confidence") * col("confidence"))).head().getDouble(0))
    val model = train(trainDf)
    val rmse = new RegressionEvaluator().setMetricName("rmse")
      .setLabelCol("confidence").setPredictionCol("prediction")
      .evaluate(model.transform(valDf))
    pcP.release() // every consumer above is eager
    Seq((n, nTrain + nVal == n,
      math.abs(nTrain.toDouble / n - 5.0 / 6.0) < 0.05,
      rmse > 0.0 && zeroRmse > 0.0 && rmse <= zeroRmse * ratioBound))
      .toDF("n_playcounts", "split_total_ok", "split_frac_ok", "rmse_ok")
  }
}

/** Model-metadata ledger: every saved model appends one row recording what
  * was trained, with which params, and how well it validated — the
  * reference's model_metadata dataframe (train_models.py:236-250 appends;
  * schema.py:96-104: model_id, model_created, model_param struct(alpha,
  * iteration, lmbda, rank), validation_rmse, test_rmse, dataframe_id).
  * An append-only parquet keyed by model_id; the training-count fields of
  * the companion dataframe_metadata ride along so one row answers "what
  * data, what params, what error". */
object ModelLedger {

  final case class Entry(
      model_id: String,
      dataframe_id: String,
      alpha: Double,
      iteration: Int,
      lmbda: Double,
      rank: Int,
      validation_rmse: Double,
      test_rmse: Double,
      users_count: Long,
      items_count: Long,
      playcounts_count: Long,
      model_created: java.sql.Timestamp)

  def append(spark: SparkSession, path: String, entry: Entry): Unit = {
    import spark.implicits._
    Seq(entry).toDF().repartition(1).write.mode("append").parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Build a ledger entry from a grid-search winner and its training set. */
  def entryFor(
      modelId: String, dataframeId: String, grid: Als.GridResult,
      playcounts: DataFrame, testRmse: Double = Double.NaN): Entry =
    Entry(
      model_id = modelId,
      dataframe_id = dataframeId,
      alpha = grid.alpha,
      iteration = grid.maxIter,
      lmbda = grid.regParam,
      rank = grid.rank,
      validation_rmse = grid.validationRmse,
      test_rmse = testRmse,
      users_count = playcounts.select(col("als_user_id")).distinct().count(),
      items_count = playcounts.select(col("als_item_id")).distinct().count(),
      playcounts_count = playcounts.count(),
      model_created = new java.sql.Timestamp(System.currentTimeMillis()))
}
