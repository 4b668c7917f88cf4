package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation operators over scored rows — the metrics a training
  * pipeline computes at corpus scale AFTER a model scores billions of
  * examples (classifier quality gates, ranker comparisons). Everything
  * reduces the row-level frame to a bounded per-threshold frame first:
  * scores are pre-rounded by the caller, so the distinct-score domain is
  * small by construction and the only window in either operator runs
  * over that bounded aggregate, never over rows.
  */
object Evaluation {

  /** Exact binary AUC by the Mann-Whitney rank statistic, ties handled
    * by midranks — identical to trapezoidal ROC integration, no curve
    * discretization error. The arithmetic stays INTEGRAL until the one
    * final division: with per-score-group [min,max] rank bounds,
    * `2·Σ(pos ranks) = Σ_g pos_g·(min_g + max_g)`, so
    * `AUC = (Σ_g pos_g·(min_g+max_g) − n_pos·(n_pos+1)) / (2·n_pos·n_neg)`
    * — engine-exact, oracle-reproducible.
    *
    * Returns one row: `(n, n_pos, n_neg, n_thresholds, auc)`; `auc` is
    * NULL when a class is empty (undefined, not 0.5).
    *
    * Scale shape: one hash aggregation collapses rows to the distinct
    * score domain (bounded because callers round scores); the cumulative
    * rank walk is a window over THAT frame only, then a 1-row fold.
    * `labelCol` must be 0/1. */
  def aucBinary(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val groups = df
      .select(scoreCol.as("__s"), labelCol.cast("long").as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__cp"))
    val cum = groups.withColumn("__cum",
      sum(col("__c")).over(Window.orderBy(col("__s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum
      .select(col("__cp"), col("__c"),
        (col("__cum") - col("__c") + 1).as("__mn"), col("__cum").as("__mx"))
      .agg(sum(col("__cp") * (col("__mn") + col("__mx"))).as("__sp"),
        sum(col("__cp")).as("__np"),
        sum(col("__c") - col("__cp")).as("__nn"),
        count(lit(1)).as("n_thresholds"))
      .select((col("__np") + col("__nn")).as("n"),
        col("__np").as("n_pos"), col("__nn").as("n_neg"),
        col("n_thresholds"),
        when(col("__np") > 0 && col("__nn") > 0,
          round((col("__sp") - col("__np") * (col("__np") + lit(1)))
            .cast("double") /
            (lit(2.0) * col("__np").cast("double") * col("__nn").cast("double")),
            6)).as("auc"))
  }

  /** [[aucBinary]] stratified by a group column — the fairness panel
    * ("does the scorer rank equally well for every source/cohort?"). One
    * row per group with the same exact midrank arithmetic; the rank walk
    * is a window PARTITIONED by group over the bounded per-group score
    * domain, so groups parallelize. */
  def aucBinaryBy(df: DataFrame, groupCol: String, scoreCol: Column,
      labelCol: Column): DataFrame = {
    val groups = df
      .select(col(groupCol), scoreCol.as("__s"), labelCol.cast("long").as("__y"))
      .groupBy(col(groupCol), col("__s"))
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__cp"))
    val cum = groups.withColumn("__cum",
      sum(col("__c")).over(Window.partitionBy(col(groupCol))
        .orderBy(col("__s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum
      .select(col(groupCol), col("__cp"), col("__c"),
        (col("__cum") - col("__c") + 1).as("__mn"), col("__cum").as("__mx"))
      .groupBy(col(groupCol))
      .agg(sum(col("__cp") * (col("__mn") + col("__mx"))).as("__sp"),
        sum(col("__cp")).as("__np"),
        sum(col("__c") - col("__cp")).as("__nn"),
        count(lit(1)).as("n_thresholds"))
      .select(col(groupCol), (col("__np") + col("__nn")).as("n"),
        col("__np").as("n_pos"), col("__nn").as("n_neg"),
        col("n_thresholds"),
        when(col("__np") > 0 && col("__nn") > 0,
          round((col("__sp") - col("__np") * (col("__np") + lit(1)))
            .cast("double") /
            (lit(2.0) * col("__np").cast("double") * col("__nn").cast("double")),
            6)).as("auc"))
  }

  /** Calibration (reliability) table: equal-width probability bins with
    * exact counts, mean predicted confidence, observed positive rate,
    * the |acc − conf| gap, and each bin's expected-calibration-error
    * contribution (their sum is ECE). The audit a scored quality filter
    * runs before its scores are trusted as probabilities.
    *
    * Exactness: predicted probabilities quantize to unscaled longs at
    * `scale` ([[Decimals.unscaledLong]]), so per-bin confidence sums are
    * integers and every emitted double is one fixed IEEE op sequence
    * from exact integers. Probabilities outside [0,1] clamp into the
    * edge bins rather than fabricating bins.
    *
    * Scale shape: one hash aggregation to `bins` rows + a 1-row
    * broadcast total. */
  def calibration(df: DataFrame, probCol: Column, labelCol: Column,
      bins: Int, scale: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val pow = math.pow(10, scale).toLong
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val bin = least(greatest(floor(probCol * bins).cast("int"), lit(0)),
      lit(bins - 1))
    val grouped = df
      .select(bin.as("bin"), labelCol.cast("long").as("__y"),
        graft.functions.Decimals.unscaledLong(probCol, scale).as("__q"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("__pos"),
        sum(col("__q")).as("__sq"))
    val total = grouped.agg(sum(col("n")).as("__nt"))
    val meanConf = (col("__sq").cast(dec38) / lit(pow)).cast("double") /
      col("n").cast("double")
    val fracPos = col("__pos").cast("double") / col("n").cast("double")
    grouped.crossJoin(broadcast(total))
      .select(col("bin"), col("n"), col("__pos").as("n_pos"),
        round(meanConf, 6).as("mean_conf"),
        round(fracPos, 6).as("frac_pos"),
        round(abs(fracPos - meanConf), 6).as("abs_gap"),
        round(abs(fracPos - meanConf) * col("n").cast("double") /
          col("__nt").cast("double"), 6).as("ece_term"))
  }

  /** Fixed DCG rank discounts `round6(1/log2(i+1))` as micro-unit longs,
    * i = 1..k. Shared by [[retrievalMetrics]] AND any SQL oracle: the
    * weights are computed ONCE here and embedded as literals on both
    * sides, so no cross-engine log()/pow() ever runs — and integer
    * weight sums make DCG immune to floating-point summation order. */
  def dcgWeightsMicro(k: Int): Seq[Long] =
    (1 to k).map(i => (BigDecimal(1.0 / (math.log(i + 1.0) / math.log(2.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP) * 1000000).toLongExact)

  /** Binary-relevance retrieval metrics per query over a ranked result
    * list: hits@k, NDCG@k, and MRR — the eval a vector index runs
    * against labeled data ("neighbors should share my label").
    * `ranked` carries one row per (query, rank<=k) with a 0/1 `relCol`;
    * `nRelCol` is the query's TOTAL relevant count in the corpus (caps
    * the ideal DCG). DCG sums the fixed micro-long discounts of
    * [[dcgWeightsMicro]] — integer arithmetic, so partition order
    * cannot leak in; the one double division (DCG/IDCG) and the 1/rank
    * MRR round to 6 dp.
    *
    * Scale shape: one hash aggregation keyed by query; the discount
    * table is a k-element literal array. */
  def retrievalMetrics(ranked: DataFrame, queryCol: String, rankCol: String,
      relCol: String, nRelCol: String, k: Int): DataFrame = {
    val w = dcgWeightsMicro(k)
    val wArr = array(w.map(lit): _*)
    val idcgArr = array(w.scanLeft(0L)(_ + _).tail.map(lit): _*)
    val rel = col(relCol).cast("long")
    ranked
      .groupBy(col(queryCol), col(nRelCol))
      .agg(sum(rel).as("hits"),
        sum(when(rel === 1, element_at(wArr, col(rankCol).cast("int")))
          .otherwise(0L)).as("__dcg"),
        min(when(rel === 1, col(rankCol))).as("__fr"))
      .withColumn("__m", least(col(nRelCol).cast("int"), lit(k)))
      .select(col(queryCol), col(nRelCol), col("hits"),
        when(col("__m") > 0, round(col("__dcg").cast("double") /
          element_at(idcgArr, col("__m")).cast("double"), 6))
          .otherwise(lit(0.0)).as("ndcg"),
        when(col("__fr").isNotNull,
          round(lit(1.0) / col("__fr").cast("double"), 6))
          .otherwise(lit(0.0)).as("mrr"))
  }

  /** Spearman rank correlation between two quality signals, ties by
    * midranks — "do two scorers agree on the ordering?" is the check a
    * pipeline runs before swapping a cheap signal in for an expensive
    * one. Doubled midranks (`min_rank + max_rank`, an integer) keep the
    * whole computation integral: the Pearson moments of the doubled
    * ranks accumulate in DECIMAL(38,0) and rho comes out in one final
    * fixed IEEE sequence — engine-exact (doubling both variables leaves
    * the correlation unchanged).
    *
    * Returns one row `(n, rho)`; NULL rho when either variable is
    * constant. Callers should pass quantized signals (the distinct-value
    * domain bounds the rank-walk window, as in [[aucBinary]]).
    *
    * Scale shape: per variable, one hash aggregation to the distinct
    * value domain + a window over THAT bounded frame; ranks rejoin rows
    * by value (broadcast-sized maps); one 1-row moment fold. */
  def spearman(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = df.select(xCol.cast("double").as("__x"), yCol.cast("double").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    def doubledRanks(c: String): DataFrame = v
      .groupBy(col(c))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(Window.orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col(c), (lit(2) * col("__cum") - col("__c") + 1).as(s"__dr$c"))
    val ranked = v
      .join(broadcast(doubledRanks("__x")), "__x")
      .join(broadcast(doubledRanks("__y")), "__y")
      .select(col("__dr__x").cast(dec38).as("__a"),
        col("__dr__y").cast(dec38).as("__b"))
    ranked
      .agg(count(lit(1)).as("n"), sum(col("__a")).as("__sa"),
        sum(col("__b")).as("__sb"), sum(col("__a") * col("__a")).as("__saa"),
        sum(col("__b") * col("__b")).as("__sbb"),
        sum(col("__a") * col("__b")).as("__sab"))
      .select(col("n"),
        {
          val n = col("n").cast(dec38)
          val num = (n * col("__sab") - col("__sa") * col("__sb")).cast("double")
          val d1 = (n * col("__saa") - col("__sa") * col("__sa")).cast("double")
          val d2 = (n * col("__sbb") - col("__sb") * col("__sb")).cast("double")
          when(d1 > 0 && d2 > 0, round(num / sqrt(d1 * d2), 6)).as("rho")
        })
  }

  /** ROC curve at every distinct score threshold ("predict positive when
    * score >= t"): exact TP/FP counts plus the TPR/FPR pair — the raw
    * points whose trapezoidal integral is [[aucBinary]] (kept exact there
    * via midranks; this table is for PLOTTING and threshold picking, the
    * two uses that need the per-point coordinates).
    *
    * Scale shape: identical to [[prCurve]] — one hash aggregation to the
    * bounded distinct-score domain, one descending cumulative window over
    * that frame, one 1-row broadcast of the class totals. */
  def rocCurve(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val groups = df
      .select(scoreCol.as("threshold"), labelCol.cast("long").as("__y"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__cp"))
    val desc = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = groups
      .withColumn("tp", sum(col("__cp")).over(desc))
      .withColumn("fp", sum(col("__c") - col("__cp")).over(desc))
    val totals = groups.agg(sum(col("__cp")).as("__p"),
      sum(col("__c") - col("__cp")).as("__n"))
    cum.crossJoin(broadcast(totals))
      .select(col("threshold"), col("tp"), col("fp"),
        when(col("__p") > 0,
          round(col("tp").cast("double") / col("__p").cast("double"), 6))
          .as("tpr"),
        when(col("__n") > 0,
          round(col("fp").cast("double") / col("__n").cast("double"), 6))
          .as("fpr"))
  }

  /** Cohen's kappa between two categorical raters — chance-corrected
    * agreement, the standard check on a labeling pipeline ("do the two
    * annotators/heuristics agree beyond what their marginal label rates
    * guarantee?"). Categories compare as strings; rows where either
    * rating is NULL are excluded (no rating ≠ a rating of NULL).
    *
    * Exactness: observed and expected agreement both come from exact
    * long counts; the expected-agreement products widen to
    * DECIMAL(38,0) before summing (category-count products overflow
    * long at ~10^9.5 rows per side), and po/pe/kappa are each one fixed
    * IEEE sequence from those integers. Returns one row
    * `(n, po, pe, kappa)`; kappa is NULL when pe = 1 (a single shared
    * category — chance agreement is total and kappa is undefined).
    *
    * Scale shape: one row-level fold (n + agree count) plus two hash
    * aggregations to the bounded category domains whose equi-join on
    * category is the pe sum — no row-level shuffle anywhere. */
  def cohenKappa(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = df.select(aCol.cast("string").as("__a"), bCol.cast("string").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
    val agree = v.agg(count(lit(1)).as("n"),
      sum(when(col("__a") === col("__b"), 1L).otherwise(0L)).as("__agree"))
    val pe = v.groupBy(col("__a")).agg(count(lit(1)).as("__ca"))
      .join(v.groupBy(col("__b")).agg(count(lit(1)).as("__cb")),
        col("__a") === col("__b"))
      .agg(coalesce(sum(col("__ca").cast(dec38) * col("__cb").cast(dec38)),
        lit(0).cast(dec38)).as("__pe_num"))
    val n = col("n").cast("double")
    val po = col("__agree").cast("double") / n
    val peV = col("__pe_num").cast("double") / (n * n)
    agree.crossJoin(broadcast(pe))
      .select(col("n"), round(po, 6).as("po"), round(peV, 6).as("pe"),
        when(peV < 1.0, round((po - peV) / (lit(1.0) - peV), 6)).as("kappa"))
  }

  /** Precision/recall curve at every distinct score threshold
    * ("predict positive when score >= t"): per threshold, exact
    * TP/FP/FN counts and the derived precision/recall — the table a
    * quality-filter calibration reads to pick its operating point.
    *
    * Scale shape: same bounded-domain reduction as [[aucBinary]] (one
    * hash aggregation to distinct scores, one window over that frame,
    * descending cumulative sums), plus a 1-row broadcast of the total
    * positive count for recall's denominator. */
  def prCurve(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val groups = df
      .select(scoreCol.as("threshold"), labelCol.cast("long").as("__y"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__cp"))
    val desc = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = groups
      .withColumn("tp", sum(col("__cp")).over(desc))
      .withColumn("fp", sum(col("__c") - col("__cp")).over(desc))
    val totals = groups.agg(sum(col("__cp")).as("__tp_all"))
    cum.crossJoin(broadcast(totals))
      .select(col("threshold"), col("tp"), col("fp"),
        (col("__tp_all") - col("tp")).as("fn"),
        round(col("tp").cast("double") /
          (col("tp") + col("fp")).cast("double"), 6).as("precision"),
        when(col("__tp_all") > 0,
          round(col("tp").cast("double") / col("__tp_all").cast("double"), 6))
          .as("recall"))
  }
}
