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

  /** Exact two-sample Kolmogorov–Smirnov statistic between the `valueCol`
    * distributions of two frames — the UNBINNED complement of
    * [[Profiling.driftPsi]]: PSI answers "how much did the binned shape
    * move", KS answers "what is the single largest ECDF gap and where".
    * The distribution-shift gate a training pipeline runs between a
    * reference snapshot and a fresh crawl before mixing them.
    *
    * Exactness: with `na`/`nb` the side totals, the ECDF gap at value v
    * is `|cumA·nb − cumB·na| / (na·nb)` — the numerator is an exact
    * DECIMAL(38,0) integer per distinct value, so the argmax is an
    * integer comparison and only the final division is IEEE. Ties on the
    * max gap resolve to the smallest value.
    *
    * Returns one row `(n_a, n_b, n_values, d_stat, at_value)`; NULL
    * d_stat when either side is empty.
    *
    * Scale shape: each side hash-aggregates to its distinct-value
    * domain (bounded — callers pass quantized signals, as in
    * [[aucBinary]]); a full-outer equi-join merges the two bounded
    * frames; ONE cumulative window runs over that merged frame; totals
    * ride a 1-row broadcast. No row-level shuffle anywhere. */
  def ksTwoSample(a: DataFrame, b: DataFrame, valueCol: Column): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def side(df: DataFrame, cnt: String): DataFrame = df
      .select(valueCol.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__v"))
      .agg(count(lit(1)).as(cnt))
    val merged = side(a, "__ca").join(side(b, "__cb"), Seq("__v"), "full_outer")
      .select(col("__v"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merged
      .withColumn("__cumA", sum(col("__ca")).over(w))
      .withColumn("__cumB", sum(col("__cb")).over(w))
    val totals = merged.agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"),
      count(lit(1)).as("n_values"))
    val gaps = cum.crossJoin(broadcast(totals))
      .select(col("__v"), col("n_a"), col("n_b"), col("n_values"),
        abs(col("__cumA").cast(dec38) * col("n_b").cast(dec38) -
          col("__cumB").cast(dec38) * col("n_a").cast(dec38)).as("__gap"))
    val dmax = gaps.agg(max(col("__gap")).as("__gmax"))
    gaps.crossJoin(broadcast(dmax))
      .filter(col("__gap") === col("__gmax"))
      .groupBy(col("n_a"), col("n_b"), col("n_values"), col("__gmax"))
      .agg(min(col("__v")).as("at_value"))
      .select(col("n_a"), col("n_b"), col("n_values"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round(col("__gmax").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double")), 6))
          .as("d_stat"),
        col("at_value"))
  }

  /** Kendall's tau-b rank correlation from the JOINT distinct-value
    * contingency — concordant/discordant pair counts with the standard
    * tie corrections. Tau reads association from pair ORDERINGS only, so
    * unlike [[spearman]]'s moment fold it is insensitive to rank-gap
    * magnitudes — the pair a ranker comparison wants.
    *
    * Semantics: with cells `(x, y, c)`, `C = Σ c₁c₂` over cell pairs
    * with x₁<x₂ ∧ y₁<y₂, `D` the same with y₁>y₂, and
    * `tau_b = (C−D) / √((n₀−tx)(n₀−ty))` where `n₀ = n(n−1)/2` and
    * tx/ty are the per-variable tie-pair counts. All counts stay in
    * DECIMAL(38,0) until the one final IEEE division. Returns one row
    * `(n, n_cells, concordant, discordant, tau_b)`; NULL tau_b when
    * either variable is constant.
    *
    * Scale shape: one hash aggregation collapses rows to the joint
    * distinct-value grid (bounded because callers quantize both
    * signals, the [[aucBinary]] convention), then a broadcast
    * self-join over that k-cell frame does the O(k²) pair walk —
    * `maxCells` fail-fasts if the grid is not actually bounded, the
    * [[Similarity.semanticDedup]] guard idiom. Row count never enters
    * the quadratic term. */
  def kendallTau(df: DataFrame, xCol: Column, yCol: Column,
      maxCells: Long = 10000L): DataFrame = {
    require(maxCells > 0, "maxCells must be positive")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val cells = df
      .select(xCol.cast("double").as("__x"), yCol.cast("double").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(col("__x"), col("__y"))
      .agg(count(lit(1)).cast(dec38).as("__c"))
    val guarded = cells.crossJoin(
        broadcast(cells.agg(count(lit(1)).as("__k"))))
      .where(OpsUtil.orRaise(col("__k") <= maxCells,
        lit("kendallTau: joint value grid has "), col("__k"),
        lit(s" cells (> maxCells=$maxCells); quantize the inputs more " +
          "coarsely or raise maxCells")))
      .select(col("__x"), col("__y"), col("__c"))
    val a = guarded.select(col("__x").as("__x1"), col("__y").as("__y1"),
      col("__c").as("__c1"))
    val b = guarded.select(col("__x").as("__x2"), col("__y").as("__y2"),
      col("__c").as("__c2"))
    val pairs = a.join(broadcast(b), col("__x1") < col("__x2"))
      .agg(
        coalesce(sum(when(col("__y1") < col("__y2"),
          col("__c1") * col("__c2"))), lit(0).cast(dec38)).as("concordant"),
        coalesce(sum(when(col("__y1") > col("__y2"),
          col("__c1") * col("__c2"))), lit(0).cast(dec38)).as("discordant"))
    val ties = guarded.agg(
      sum(col("__c")).cast(dec38).as("__n"),
      count(lit(1)).as("n_cells"))
    val tx = guarded.groupBy(col("__x")).agg(sum(col("__c")).as("__cx"))
      .agg(coalesce(sum(col("__cx") * (col("__cx") - 1)), lit(0).cast(dec38))
        .as("__tx2"))
    val ty = guarded.groupBy(col("__y")).agg(sum(col("__c")).as("__cy"))
      .agg(coalesce(sum(col("__cy") * (col("__cy") - 1)), lit(0).cast(dec38))
        .as("__ty2"))
    ties.crossJoin(broadcast(pairs)).crossJoin(broadcast(tx))
      .crossJoin(broadcast(ty))
      .select(col("__n").cast("long").as("n"), col("n_cells"),
        col("concordant").cast("long").as("concordant"),
        col("discordant").cast("long").as("discordant"),
        {
          // doubled counts throughout: n0x2 = n(n-1), tx2 = Σ cx(cx-1),
          // so (n0-tx)(n0-ty) = (n0x2-tx2)(n0x2-ty2)/4 — the 4 cancels
          // against (2C-2D)' numerator staying as-is: tau = (C-D)/sqrt(
          // ((n0x2-tx2)/2)((n0x2-ty2)/2))
          val n0x2 = (col("__n") * (col("__n") - 1)).cast("double")
          val dx = (n0x2 - col("__tx2").cast("double")) / lit(2.0)
          val dy = (n0x2 - col("__ty2").cast("double")) / lit(2.0)
          val num = (col("concordant") - col("discordant")).cast("double")
          when(dx > 0 && dy > 0, round(num / sqrt(dx * dy), 6)).as("tau_b")
        })
  }

  /** Multi-class confusion matrix with a ZERO-FILLED spine — every
    * (actual, predicted) cell of the label grid appears, observed or
    * not, because the downstream consumer (a per-class dashboard, a
    * cost-matrix fold) indexes cells positionally and a missing cell is
    * a silent wrong answer (the [[Profiling.contingencyChi2]] spine
    * convention). Labels = distinct actuals ∪ distinct predictions.
    *
    * Returns `(actual, predicted, n_obs, row_rate)` where `row_rate` =
    * n_obs / Σ n_obs over the actual's row (the per-class recall
    * diagonal); NULL when the actual never occurs. NULL labels are
    * excluded — label NULL-ness is [[DataQuality.Completeness]]'s job.
    *
    * Scale shape: one (actual, predicted) hash aggregation bounded by
    * the label-pair grid; the spine is a broadcast cross join of the two
    * bounded label domains; row totals ride a broadcast equi-join. */
  def confusionMatrix(df: DataFrame, actualCol: Column,
      predictedCol: Column): DataFrame = {
    val pairs = df
      .select(actualCol.cast("string").as("actual"),
        predictedCol.cast("string").as("predicted"))
      .filter(col("actual").isNotNull && col("predicted").isNotNull)
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("__c"))
    val labels = pairs.select(col("actual").as("__l"))
      .union(pairs.select(col("predicted")))
      .distinct()
    val spine = labels.select(col("__l").as("actual"))
      .crossJoin(broadcast(labels.select(col("__l").as("predicted"))))
    val rowT = pairs.groupBy(col("actual")).agg(sum(col("__c")).as("__rt"))
    spine
      .join(pairs, Seq("actual", "predicted"), "left")
      .join(broadcast(rowT), Seq("actual"), "left")
      .select(col("actual"), col("predicted"),
        coalesce(col("__c"), lit(0L)).as("n_obs"),
        when(col("__rt") > 0,
          round(coalesce(col("__c"), lit(0L)).cast("double") /
            col("__rt").cast("double"), 6)).as("row_rate"))
  }

  /** Per-class precision / recall / F1 over a multi-class prediction
    * frame — the classification report every model gate reads. One row
    * per label in distinct(actual) ∪ distinct(predicted):
    * `(label, n_actual, n_predicted, tp, precision, recall, f1)`.
    * Precision is NULL when the class is never predicted, recall NULL
    * when it never occurs, F1 NULL unless both are defined and nonzero
    * in sum — degenerate classes surface as NULL, not fake zeros.
    *
    * Scale shape: the same bounded (actual, predicted) aggregation as
    * [[confusionMatrix]]; margins and the diagonal are bounded
    * per-label folds joined on the label frame — row count never
    * re-enters after the first aggregation. */
  def classificationReport(df: DataFrame, actualCol: Column,
      predictedCol: Column): DataFrame = {
    val pairs = df
      .select(actualCol.cast("string").as("__a"),
        predictedCol.cast("string").as("__p"))
      .filter(col("__a").isNotNull && col("__p").isNotNull)
      .groupBy(col("__a"), col("__p"))
      .agg(count(lit(1)).as("__c"))
    val actT = pairs.groupBy(col("__a").as("label"))
      .agg(sum(col("__c")).as("n_actual"))
    val preT = pairs.groupBy(col("__p").as("label"))
      .agg(sum(col("__c")).as("n_predicted"))
    val diag = pairs.filter(col("__a") === col("__p"))
      .select(col("__a").as("label"), col("__c").as("tp"))
    val p = col("tp").cast("double") / col("n_predicted").cast("double")
    val r = col("tp").cast("double") / col("n_actual").cast("double")
    actT.join(preT, Seq("label"), "full_outer")
      .join(diag, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_predicted"), lit(0L)).as("n_predicted"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .select(col("label"), col("n_actual"), col("n_predicted"), col("tp"),
        when(col("n_predicted") > 0, round(p, 6)).as("precision"),
        when(col("n_actual") > 0, round(r, 6)).as("recall"),
        when(col("n_predicted") > 0 && col("n_actual") > 0 && (p + r) > 0,
          round(lit(2.0) * p * r / (p + r), 6)).as("f1"))
  }

  /** Probabilistic-forecast scoring in one pass: Brier score
    * `mean((p − y)²)` and log-loss `mean(−[y·ln p̃ + (1−y)·ln(1−p̃)])`
    * with `p̃ = clamp(p, eps, 1−eps)` — the clamp is part of the
    * CONTRACT (a single hard 0/1 miss otherwise makes the whole
    * corpus's log-loss infinite, which grades the pipeline, not the
    * model). Returns one row `(n, brier, log_loss)`; NULL metrics on an
    * empty frame. Rows with NULL prob or label are excluded.
    *
    * Scale shape: pure per-row projection into ONE map-side-combined
    * 1-row aggregation — the minimal plan. */
  def probScores(df: DataFrame, probCol: Column, labelCol: Column,
      eps: Double = 1e-15): DataFrame = {
    require(eps > 0 && eps < 0.5, s"eps must be in (0, 0.5): $eps")
    val p = probCol.cast("double")
    val y = labelCol.cast("double")
    val pc = least(greatest(p, lit(eps)), lit(1.0 - eps))
    df.select(p.as("__p"), y.as("__y"), pc.as("__pc"))
      .filter(col("__p").isNotNull && col("__y").isNotNull)
      .agg(count(lit(1)).as("n"),
        round(avg((col("__p") - col("__y")) * (col("__p") - col("__y"))), 6)
          .as("brier"),
        round(avg(-(col("__y") * log(col("__pc")) +
          (lit(1.0) - col("__y")) * log(lit(1.0) - col("__pc")))), 6)
          .as("log_loss"))
  }

  /** McNemar's paired test for two classifiers scored on the SAME rows —
    * the A/B gate that, unlike comparing two accuracies, uses only the
    * DISAGREEMENT cells (b = A right/B wrong, c = A wrong/B right) and so
    * detects a real difference the shared-easy-rows mass would wash out.
    * Uses the continuity-corrected statistic
    * `(|b − c| − 1)² / (b + c)`; NULL when b + c = 0 (no disagreements —
    * the test is undefined, not "no difference proven").
    *
    * Inputs are correctness indicator columns (1 = correct). Rows where
    * either indicator is NULL are excluded; out-of-domain values fail
    * fast ([[fleissKappa]]'s guard contract).
    *
    * Returns one row `(n, both_right, both_wrong, a_only, b_only,
    * statistic)`.
    *
    * Scale shape: one map-side-combined 1-row aggregation. */
  def mcnemar(df: DataFrame, aCorrectCol: Column,
      bCorrectCol: Column): DataFrame = {
    val a = aCorrectCol.cast("long")
    val b = bCorrectCol.cast("long")
    val inDomain = Seq(a, b)
      .map(c => c.isNull || c === 0L || c === 1L)
      .reduce(_ && _)
    val cells = df
      .where(OpsUtil.orRaise(inDomain,
        lit("mcnemar: correctness indicator outside {0, 1, NULL}")))
      .select(a.as("__a"), b.as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .agg(count(lit(1)).as("n"),
        coalesce(sum((col("__a") === 1 && col("__b") === 1).cast("long")),
          lit(0L)).as("both_right"),
        coalesce(sum((col("__a") === 0 && col("__b") === 0).cast("long")),
          lit(0L)).as("both_wrong"),
        coalesce(sum((col("__a") === 1 && col("__b") === 0).cast("long")),
          lit(0L)).as("a_only"),
        coalesce(sum((col("__a") === 0 && col("__b") === 1).cast("long")),
          lit(0L)).as("b_only"))
    val bb = col("a_only").cast("double")
    val cc = col("b_only").cast("double")
    cells.select(col("n"), col("both_right"), col("both_wrong"),
      col("a_only"), col("b_only"),
      when(col("a_only") + col("b_only") > 0,
        round((abs(bb - cc) - 1.0) * (abs(bb - cc) - 1.0) / (bb + cc), 6))
        .as("statistic"))
  }

  /** Two-proportion z-test between an experiment's variants — the A/B
    * readout: per-entity conversion rates, their difference, and the
    * pooled-variance z statistic
    * `z = (p_b − p_a) / √(p̂(1−p̂)(1/n_a + 1/n_b))`. Entities (not raw
    * events) are the unit: each entity converts once or not at all, so
    * the frame is first collapsed to one row per (variant, entity) with
    * `max(converted)` — double-counting a heavy user's events is the
    * classic A/B bug this operator refuses to reproduce.
    *
    * Returns one row `(n_a, n_b, conv_a, conv_b, rate_a, rate_b, lift,
    * z)`; z NULL when either arm is empty or the pooled variance is 0
    * (all or none converted everywhere — no information). `variantCol`
    * must yield exactly the two values `a` and `b` after string cast;
    * anything else fails fast.
    *
    * Scale shape: one (variant, entity) hash aggregation — map-side
    * combined on the entity key — then a 2-row fold. No window, no
    * join. */
  def abTest(df: DataFrame, variantCol: Column, entityCol: Column,
      convertedCol: Column): DataFrame = {
    val v = variantCol.cast("string")
    val cRaw = convertedCol.cast("long")
    val entities = df
      .where(OpsUtil.orRaise(v.isNull || v.isin("a", "b"),
        lit("abTest: variant must be 'a' or 'b', got "), v))
      // {0,1,NULL} contract, same as mcnemar/cochranQ/fleissKappa: a
      // converted value of e.g. 5 would flow through max() into the
      // conv sums and silently yield rates > 1 and a bogus z
      .where(OpsUtil.orRaise(cRaw.isNull || cRaw === 0L || cRaw === 1L,
        lit("abTest: converted must be 0/1/NULL, got "), cRaw))
      .select(v.as("__v"), entityCol.as("__e"), cRaw.as("__c"))
      .filter(col("__v").isNotNull && col("__e").isNotNull)
      .groupBy(col("__v"), col("__e"))
      .agg(max(coalesce(col("__c"), lit(0L))).as("__conv"))
    val arms = entities.groupBy()
      .agg(
        sum((col("__v") === "a").cast("long")).as("n_a"),
        sum((col("__v") === "b").cast("long")).as("n_b"),
        sum(when(col("__v") === "a", col("__conv")).otherwise(0L))
          .as("conv_a"),
        sum(when(col("__v") === "b", col("__conv")).otherwise(0L))
          .as("conv_b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val pa = col("conv_a").cast("double") / na
    val pb = col("conv_b").cast("double") / nb
    val pp = (col("conv_a") + col("conv_b")).cast("double") / (na + nb)
    val se = sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / na + lit(1.0) / nb))
    arms.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      when(col("n_a") > 0, round(pa, 6)).as("rate_a"),
      when(col("n_b") > 0, round(pb, 6)).as("rate_b"),
      when(col("n_a") > 0 && col("n_b") > 0, round(pb - pa, 6)).as("lift"),
      when(col("n_a") > 0 && col("n_b") > 0 && pp > 0 && pp < 1,
        round((pb - pa) / se, 6)).as("z"))
  }

  /** CUPED variance-reduced treatment-effect estimate (Deng, Xu, Kohavi
    * & Walker, "Improving the Sensitivity of Online Controlled
    * Experiments by Utilizing Pre-Experiment Data", WSDM 2013): adjust
    * each unit's experiment-period metric by its own PRE-period metric,
    * `ŷ_i = y_i − θ·(x_i − x̄)` with `θ = cov(x,y)/var(x)` pooled across
    * arms, which shrinks the difference-in-means standard error by the
    * factor `1 − ρ²` without biasing the effect (x predates assignment,
    * so E[x|T] = E[x|C]). The estimator every experimentation platform
    * runs once a metric has week-over-week autocorrelation worth
    * harvesting.
    *
    * Unit semantics match [[abTest]]: rows collapse to one row per
    * `unitCol` first (pre sum, post sum, arm), so heavy users cannot
    * double-count; a unit observed under BOTH arms fails fast (a
    * corrupted assignment, not an analysis input). Units with no
    * pre-period (or no post-period) activity contribute an exact 0 —
    * dropping them would bias both arms toward active users.
    *
    * Exactness: `valueCol` quantizes to an unscaled LONG at `scale`
    * (the [[graft.functions.Decimals]] convention), so per-unit sums
    * and all moment sums `Σx, Σy, Σx², Σxy, Σy²` (DECIMAL(38,0) — the
    * cross products overflow a LONG at realistic magnitudes) are exact;
    * θ and ρ² are dimensionless ratios of exact integers, and only the
    * final divisions run IEEE.
    *
    * Returns one row `(n_units, n_t, n_c, theta, mean_pre, diff_raw,
    * diff_cuped, var_reduction)`: `diff_raw` = post-mean(T) −
    * post-mean(C); `diff_cuped` = diff_raw − θ·(pre-mean(T) −
    * pre-mean(C)) (the x̄ centering cancels in the difference);
    * `var_reduction` = ρ² = cov²/(var_x·var_y), the fraction of metric
    * variance CUPED removes. θ/ρ² are NULL when var(x) (resp. var(y))
    * is 0; the diffs are NULL when either arm is empty.
    *
    * Scale shape: ONE (unit) hash aggregation — map-side combined on
    * the unit key — then a 1-row moment fold. No window, no join, no
    * second pass over rows: θ, both arm means, and the variance ratio
    * all come out of the same nine moment sums. */
  def cuped(df: DataFrame, unitCol: Column, treatedCol: Column,
      isPostCol: Column, valueCol: Column, scale: Int = 2): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val q = graft.functions.Decimals.unscaledLong(valueCol, scale)
    val units = df
      .select(unitCol.as("__u"), treatedCol.cast("int").as("__t"),
        isPostCol.cast("boolean").as("__p"), coalesce(q, lit(0L)).as("__q"))
      .filter(col("__u").isNotNull && col("__t").isNotNull &&
        col("__p").isNotNull)
      .groupBy(col("__u"))
      .agg(max(col("__t")).as("__tmax"), min(col("__t")).as("__tmin"),
        coalesce(sum(when(!col("__p"), col("__q"))), lit(0L)).as("__x"),
        coalesce(sum(when(col("__p"), col("__q"))), lit(0L)).as("__y"))
      .where(OpsUtil.orRaise(col("__tmax") === col("__tmin"),
        lit("cuped: unit observed under both arms — assignment is not " +
          "unit-constant")))
    val x = col("__x").cast(dec38)
    val y = col("__y").cast(dec38)
    val t = col("__tmax") === 1
    val agg = units.agg(
      count(lit(1)).as("n_units"),
      sum(when(t, 1L).otherwise(0L)).as("n_t"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * x).as("__sxx"), sum(x * y).as("__sxy"),
      sum(y * y).as("__syy"),
      sum(when(t, x).otherwise(lit(0).cast(dec38))).as("__sxt"),
      sum(when(t, y).otherwise(lit(0).cast(dec38))).as("__syt"))
    val pow = lit(math.pow(10, scale))
    val n = col("n_units").cast(dec38)
    // n²·var and n²·cov stay in exact decimal; double only at the ratio
    val varxN = (n * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val varyN = (n * col("__syy") - col("__sy") * col("__sy")).cast("double")
    val covN = (n * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val theta = when(varxN > 0.0, covN / varxN)
    val nt = col("n_t").cast("double")
    val nc = (col("n_units") - col("n_t")).cast("double")
    val bothArms = col("n_t") > 0 && col("n_units") > col("n_t")
    def armDiff(st: Column, s: Column): Column =
      (st.cast("double") / nt -
        (s - st).cast("double") / nc) / pow
    val diffRaw = armDiff(col("__syt"), col("__sy"))
    val diffPre = armDiff(col("__sxt"), col("__sx"))
    agg.select(
      col("n_units"), col("n_t"),
      (col("n_units") - col("n_t")).as("n_c"),
      round(theta, 6).as("theta"),
      when(col("n_units") > 0,
        round(col("__sx").cast("double") / (n.cast("double") * pow), 6))
        .as("mean_pre"),
      when(bothArms, round(diffRaw, 6)).as("diff_raw"),
      when(bothArms && theta.isNotNull,
        round(diffRaw - theta * diffPre, 6)).as("diff_cuped"),
      when(varxN > 0.0 && varyN > 0.0,
        round(covN * covN / (varxN * varyN), 6)).as("var_reduction"))
  }

  /** Gains / lift decile table — the model-deployment readout ("call
    * the top decile and you reach 4.2× the base response rate"): rows
    * rank by score DESC (id ASC tiebreak), split into `buckets` equal
    * rank slices via `ceil(rank·buckets/n)`, and each bucket reports
    * its response rate plus CUMULATIVE capture and lift against the
    * base rate.
    *
    * Returns one row per non-empty bucket: `(bucket, n, n_pos, rate,
    * cum_n, cum_pos, capture, cum_lift)`; capture = share of ALL
    * positives reached by this depth, cum_lift = cumulative rate /
    * base rate (NULL when there are no positives). Labels outside
    * {0,1,NULL} fail fast; NULL score/label rows are excluded.
    *
    * Scale shape: scores collapse to a (score, label) histogram
    * (bounded — callers quantize, the [[aucBinary]] convention), ONE
    * cumulative window walks it in rank order computing bucket
    * boundaries from exact cumulative counts, and the bucket fold +
    * totals run on the bounded frame. Row count never enters a window.
    *
    * Bucket convention: a bucket is the rows whose ceil-rank slice
    * lands on it; score ties are NOT split across ranks here — the
    * histogram walk assigns each distinct score's whole run to the
    * bucket of its LAST rank (deterministic, and the one convention a
    * grouped oracle reproduces without per-row numbering). */
  def gainsTable(df: DataFrame, scoreCol: Column, labelCol: Column,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val y = labelCol.cast("long")
    val hist = df
      .where(OpsUtil.orRaise(y.isNull || y === 0L || y === 1L,
        lit("gainsTable: label outside {0, 1, NULL}")))
      .select(scoreCol.cast("double").as("__s"), y.as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__p"))
    val w = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum(col("__c")).as("__n"), sum(col("__p")).as("__np"))
    val walked = hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("bucket",
        ceil(col("__cum").cast("double") * lit(buckets.toDouble) /
          col("__n").cast("double")).cast("int"))
    val byBucket = walked.groupBy(col("bucket"))
      .agg(sum(col("__c")).as("n"), sum(col("__p")).as("n_pos"),
        max(col("__n")).as("__n"), max(col("__np")).as("__np"))
    val wb = Window.orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byBucket
      .withColumn("cum_n", sum(col("n")).over(wb))
      .withColumn("cum_pos", sum(col("n_pos")).over(wb))
      .select(col("bucket"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("rate"),
        col("cum_n"), col("cum_pos"),
        when(col("__np") > 0,
          round(col("cum_pos").cast("double") / col("__np").cast("double"),
            6)).as("capture"),
        when(col("__np") > 0,
          round((col("cum_pos").cast("double") / col("cum_n").cast("double"))
            / (col("__np").cast("double") / col("__n").cast("double")), 6))
          .as("cum_lift"))
  }

  /** Covariate-balance audit for a two-group comparison — the table
    * every observational study (and every A/B sanity check) prints
    * first: per covariate, the standardized mean difference
    * `SMD = (x̄_t − x̄_c) / √((s²_t + s²_c)/2)` with POPULATION
    * variances from exact integer sums. |SMD| ≳ 0.1 is the
    * conventional imbalance flag; a randomized split failing it on many
    * covariates means the bucketing hash is broken.
    *
    * Returns one row per covariate: `(covariate, n_treat, n_ctrl,
    * mean_treat, mean_ctrl, smd)`; smd NULL when a group is empty or
    * both variances are 0. Treat indicator outside {0,1,NULL} fails
    * fast; NULL indicator or value rows are excluded per covariate.
    *
    * Scale shape: covariates UNPIVOT (bounded ×|C| multiplier, the
    * [[Features.miRanking]] precedent) into ONE (covariate, group)
    * aggregation carrying exact decimal sums — no join, no window
    * beyond the bounded 2|C|-row frame. */
  def covariateBalance(df: DataFrame, treatCol: Column,
      covariates: Seq[(String, Column)], scale: Int = 6): DataFrame = {
    require(covariates.nonEmpty, "covariateBalance needs covariates")
    require(covariates.map(_._1).distinct.size == covariates.size,
      "covariate names must be unique")
    val t = treatCol.cast("long")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val pow = math.pow(10, scale)
    val stacked = df
      .where(OpsUtil.orRaise(t.isNull || t === 0L || t === 1L,
        lit("covariateBalance: treat indicator outside {0, 1, NULL}")))
      .filter(t.isNotNull)
      .select(t.as("__t"),
        array(covariates.map { case (n, c) =>
          struct(lit(n).as("c"),
            graft.functions.Decimals.unscaledLong(c, scale).as("q"))
        }: _*).as("__cs"))
      .select(col("__t"), explode(col("__cs")).as("__cv"))
      .select(col("__t"), col("__cv.c").as("__c"), col("__cv.q").as("__q"))
      .filter(col("__q").isNotNull)
    val cells = stacked.groupBy(col("__c"), col("__t"))
      .agg(count(lit(1)).as("__n"), sum(col("__q")).cast(dec38).as("__s"),
        sum(col("__q").cast(dec38) * col("__q").cast(dec38)).as("__sq"))
    def side(i: Int, out: String): DataFrame = cells
      .filter(col("__t") === i)
      .select(col("__c"), col("__n").as(s"n_$out"),
        col("__s").as(s"__s_$out"), col("__sq").as(s"__sq_$out"))
    def mean(o: String): Column =
      (col(s"__s_$o").cast("double") / lit(pow)) /
        col(s"n_$o").cast("double")
    def variance(o: String): Column = {
      val n = col(s"n_$o").cast("double")
      (col(s"n_$o").cast(dec38) * col(s"__sq_$o") -
        col(s"__s_$o") * col(s"__s_$o")).cast("double") /
        (n * n * lit(pow) * lit(pow))
    }
    val ok = col("n_treat") > 0 && col("n_ctrl") > 0 &&
      (variance("treat") + variance("ctrl")) > 0
    side(1, "treat").join(side(0, "ctrl"), Seq("__c"), "full_outer")
      .select(col("__c").as("covariate"),
        coalesce(col("n_treat"), lit(0L)).as("n_treat"),
        coalesce(col("n_ctrl"), lit(0L)).as("n_ctrl"),
        when(col("n_treat") > 0, round(mean("treat"), 6)).as("mean_treat"),
        when(col("n_ctrl") > 0, round(mean("ctrl"), 6)).as("mean_ctrl"),
        when(ok, round((mean("treat") - mean("ctrl")) /
          sqrt((variance("treat") + variance("ctrl")) / lit(2.0)), 6))
          .as("smd"))
  }

  /** Binary label-shift estimation (BBSE, Lipton et al. 2018): under
    * covariate-stable label shift, the target's class prior solves
    * `C·π = μ` where `C_ij = P(f=i | y=j)` comes from a labeled holdout
    * and `μ_i = P(f=i)` from the UNLABELED target — the drift monitor
    * that works when the new data has no labels yet. For two classes
    * the solve is closed-form (2×2 inverse), so both engines run the
    * identical IEEE chain from exact counts.
    *
    * Returns one row `(n_holdout, n_target, det, naive_0, naive_1,
    * pi_0, pi_1)`: `naive` is the raw predicted distribution on the
    * target (what you'd report without the correction), `pi` the
    * corrected prior. π is NULL when the confusion matrix is singular
    * (a useless classifier — no correction exists) or a holdout class
    * is absent; estimates may leave [0,1] when assumptions fail —
    * reported raw, clamping is the caller's decision. Out-of-domain
    * indicators fail fast ([[fleissKappa]]'s contract).
    *
    * Scale shape: one 1-row aggregation per frame (six conditional
    * counts + two), joined by a broadcast cross join. */
  def labelShiftBinary(holdout: DataFrame, target: DataFrame,
      predCol: Column, labelCol: Column): DataFrame = {
    val f = predCol.cast("long")
    val y = labelCol.cast("long")
    def guard(df: DataFrame, cols: Seq[Column], what: String): DataFrame =
      df.where(OpsUtil.orRaise(
        cols.map(c => c.isNull || c === 0L || c === 1L).reduce(_ && _),
        lit(s"labelShiftBinary: $what outside {0, 1, NULL}")))
    val hold = guard(holdout, Seq(f, y), "holdout pred/label")
      .select(f.as("__f"), y.as("__y"))
      .filter(col("__f").isNotNull && col("__y").isNotNull)
      .agg(count(lit(1)).as("n_holdout"),
        sum((col("__y") === 0).cast("long")).as("__ny0"),
        sum((col("__y") === 1).cast("long")).as("__ny1"),
        sum((col("__f") === 0 && col("__y") === 0).cast("long")).as("__h00"),
        sum((col("__f") === 0 && col("__y") === 1).cast("long")).as("__h01"),
        sum((col("__f") === 1 && col("__y") === 0).cast("long")).as("__h10"))
    val targ = guard(target, Seq(f), "target pred")
      .select(f.as("__f")).filter(col("__f").isNotNull)
      .agg(count(lit(1)).as("n_target"),
        sum((col("__f") === 0).cast("long")).as("__t0"))
    val j = hold.crossJoin(broadcast(targ))
    def r(n: Column, d: Column): Column = n.cast("double") / d.cast("double")
    val c00 = r(col("__h00"), col("__ny0"))
    val c01 = r(col("__h01"), col("__ny1"))
    val c10 = r(col("__h10"), col("__ny0"))
    val c11 = lit(1.0) - c01
    val mu0 = r(col("__t0"), col("n_target"))
    val mu1 = lit(1.0) - mu0
    val det = c00 * c11 - c01 * c10
    val ok = col("__ny0") > 0 && col("__ny1") > 0 && col("n_target") > 0 &&
      det =!= 0.0
    j.select(col("n_holdout"), col("n_target"),
      when(col("__ny0") > 0 && col("__ny1") > 0, round(det, 6)).as("det"),
      when(col("n_target") > 0, round(mu0, 6)).as("naive_0"),
      when(col("n_target") > 0, round(mu1, 6)).as("naive_1"),
      when(ok, round((c11 * mu0 - c01 * mu1) / det, 6)).as("pi_0"),
      when(ok, round((c00 * mu1 - c10 * mu0) / det, 6)).as("pi_1"))
  }

  /** Difference-in-differences estimate over a 2×2 (treatment × period)
    * panel — the quasi-experimental readout when assignment wasn't
    * randomized: `DiD = (ȳ_treat,post − ȳ_treat,pre) −
    * (ȳ_ctrl,post − ȳ_ctrl,pre)`, the treatment effect net of the
    * shared time trend a naive post-vs-pre comparison conflates.
    *
    * Values quantize at `scale` ([[graft.functions.Decimals]]); each
    * cell's sum is an exact integer and each mean one IEEE sequence.
    * Returns one row `(n_00, n_01, n_10, n_11, mean_00, mean_01,
    * mean_10, mean_11, did)` — first index = treated, second = post;
    * did NULL when any cell is empty. Indicators outside {0,1,NULL}
    * fail fast ([[fleissKappa]]'s contract); NULL indicator or value
    * rows are excluded.
    *
    * Scale shape: ONE map-side-combined 1-row aggregation (eight
    * conditional sums) — no join, no window. */
  def diffInDiff(df: DataFrame, treatCol: Column, postCol: Column,
      valueCol: Column, scale: Int = 6): DataFrame = {
    val t = treatCol.cast("long")
    val p = postCol.cast("long")
    val inDomain = Seq(t, p).map(c => c.isNull || c === 0L || c === 1L)
      .reduce(_ && _)
    val q = graft.functions.Decimals.unscaledLong(valueCol, scale)
    val pow = math.pow(10, scale)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df
      .where(OpsUtil.orRaise(inDomain,
        lit("diffInDiff: treat/post indicator outside {0, 1, NULL}")))
      .select(t.as("__t"), p.as("__p"), q.as("__q"))
      .filter(col("__t").isNotNull && col("__p").isNotNull &&
        col("__q").isNotNull)
    def cell(ti: Int, pi: Int) = col("__t") === ti && col("__p") === pi
    val agg = base.agg(
      sum(cell(0, 0).cast("long")).as("n_00"),
      sum(cell(0, 1).cast("long")).as("n_01"),
      sum(cell(1, 0).cast("long")).as("n_10"),
      sum(cell(1, 1).cast("long")).as("n_11"),
      sum(when(cell(0, 0), col("__q")).otherwise(0L)).cast(dec38).as("__s00"),
      sum(when(cell(0, 1), col("__q")).otherwise(0L)).cast(dec38).as("__s01"),
      sum(when(cell(1, 0), col("__q")).otherwise(0L)).cast(dec38).as("__s10"),
      sum(when(cell(1, 1), col("__q")).otherwise(0L)).cast(dec38).as("__s11"))
    def mean(i: String) = (col(s"__s$i").cast("double") / lit(pow)) /
      col(s"n_$i").cast("double")
    val allCells = Seq("00", "01", "10", "11")
      .map(i => col(s"n_$i") > 0).reduce(_ && _)
    val outCols =
      Seq("00", "01", "10", "11").map(i => col(s"n_$i")) ++
      Seq("00", "01", "10", "11").map(i =>
        when(col(s"n_$i") > 0, round(mean(i), 6)).as(s"mean_$i")) :+
      when(allCells,
        round((mean("11") - mean("10")) - (mean("01") - mean("00")), 6))
        .as("did")
    agg.select(outCols: _*)
  }

  /** Split-conformal prediction threshold: the `ceil((n+1)(1−alpha))`-th
    * smallest calibration nonconformity score — the distribution-free
    * cutoff guaranteeing ≥ 1−alpha coverage on exchangeable future rows
    * (Vovk et al.). The model-agnostic uncertainty gate a scoring
    * pipeline computes once per calibration batch.
    *
    * The rank is an exact integer order statistic (any SQL oracle
    * selects the same value); when the rank exceeds n (tiny calibration
    * sets at small alpha) the threshold is NULL — "no finite-sample
    * guarantee possible", not +∞. NULL scores are excluded.
    *
    * Returns one row `(n, rank, threshold)`.
    *
    * Scale shape: scores collapse to a value histogram (bounded —
    * callers quantize, the [[aucBinary]] convention); the rank
    * selection is one cumulative window over that bounded frame. */
  def conformalThreshold(df: DataFrame, scoreCol: Column,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    val hist = df
      .select(scoreCol.cast("double").as("__s"))
      .filter(col("__s").isNotNull)
      .groupBy(col("__s")).agg(count(lit(1)).as("__c"))
    val w = Window.orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum(col("__c")).as("n"))
    val rk = ceil((col("n").cast("double") + 1.0) * lit(1.0 - alpha))
      .cast("long")
    hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("n"), rk.as("rank"),
        when(col("__cum") >= rk, col("__s")).as("__hit"))
      .groupBy(col("n"), col("rank"))
      .agg(min(col("__hit")).as("threshold"))
  }

  /** Jensen–Shannon divergence between two binned distributions — the
    * SYMMETRIC, always-finite drift measure completing the family
    * ([[Profiling.driftPsi]] is bin-ratio weighted, [[ksTwoSample]] is
    * unbinned max-gap): `JS = ½·KL(P‖M) + ½·KL(Q‖M)` with
    * `M = ½(P+Q)`, in nats, bounded by ln 2. Zero-count bins contribute
    * 0 to their own side's KL (0·ln0 = 0) and are always finite on the
    * mixture side — no epsilon hacks.
    *
    * `binCol` values are the caller's quantized buckets. Returns one
    * row `(n_a, n_b, n_bins, js)`; NULL when either side is empty.
    *
    * Scale shape: each side hash-aggregates to its bin histogram; one
    * full-outer merge of two bounded frames; a 1-row fold. */
  def jsDivergence(a: DataFrame, b: DataFrame, binCol: Column): DataFrame = {
    def side(df: DataFrame, cnt: String): DataFrame = df
      .select(binCol.cast("string").as("__b"))
      .filter(col("__b").isNotNull)
      .groupBy(col("__b")).agg(count(lit(1)).as(cnt))
    val merged = side(a, "__ca").join(side(b, "__cb"), Seq("__b"),
        "full_outer")
      .select(col("__b"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val tot = merged.agg(sum(col("__ca")).as("n_a"),
      sum(col("__cb")).as("n_b"), count(lit(1)).as("n_bins"))
    val withT = merged.crossJoin(broadcast(tot))
    // NULL (not ANSI-error) on an empty side: the mixture term references
    // BOTH shares inside the taken branch, so an empty side's 0/0 would
    // throw before the output guard ever ran — a NULL denominator
    // propagates to the guarded NULL result instead
    val p = col("__ca").cast("double") /
      when(col("n_a") > 0, col("n_a").cast("double"))
    val q = col("__cb").cast("double") /
      when(col("n_b") > 0, col("n_b").cast("double"))
    val m = (p + q) / lit(2.0)
    val term =
      when(col("__ca") > 0, p * log(p / m) / lit(2.0)).otherwise(lit(0.0)) +
      when(col("__cb") > 0, q * log(q / m) / lit(2.0)).otherwise(lit(0.0))
    withT
      .groupBy(col("n_a"), col("n_b"), col("n_bins"))
      .agg(sum(term).as("__js"))
      .select(col("n_a"), col("n_b"), col("n_bins"),
        when(col("n_a") > 0 && col("n_b") > 0, round(col("__js"), 6))
          .as("js"))
  }

  /** Rank-biased overlap (truncated) between two top-k rankings of the
    * same id space — the ranker-comparison metric that, unlike set
    * overlap@k, weights agreement at the TOP (Webber et al.'s RBO with
    * persistence `p`): `RBO@k = (1−p) · Σ_{d=1..k} p^{d−1} · |A_d∩B_d|/d`.
    * The A/B answer to "did the new scorer actually change what users
    * see first?".
    *
    * Inputs are two frames each carrying `(idCol, scoreCol)`; ranks are
    * dense positions by score DESC with id ASC tiebreak (deterministic —
    * rankings must not depend on partitioning). Returns one row
    * `(k, p, n_common, rbo)` where `n_common` = ids in both top-k.
    *
    * Scale shape: each side reduces to its top-k via
    * TakeOrderedAndProject (k bounded); everything after runs on ≤ 2k
    * rows — the depth spine is a k-row broadcast cross join, the
    * overlap-at-depth walk a bounded aggregation. Row count touches
    * nothing but the two top-k selections. */
  def rankBiasedOverlap(a: DataFrame, b: DataFrame, idCol: Column,
      scoreCol: Column, k: Int, p: Double = 0.9): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(p > 0 && p < 1, s"persistence p must be in (0,1): $p")
    def topk(df: DataFrame, rank: String): DataFrame = df
      .select(idCol.as("__id"), scoreCol.cast("double").as("__s"))
      .filter(col("__id").isNotNull && col("__s").isNotNull)
      .orderBy(col("__s").desc, col("__id").asc)
      .limit(k)
      .withColumn(rank, row_number().over(
        Window.orderBy(col("__s").desc, col("__id").asc)))
      .select(col("__id"), col(rank))
    val joined = topk(a, "__ra").join(topk(b, "__rb"), Seq("__id"))
    val depths = spark_range_df(joined, k)
    val terms = depths
      .join(joined, col("__ra") <= col("__d") && col("__rb") <= col("__d"),
        "left")
      .groupBy(col("__d"))
      .agg(count(col("__id")).as("__ov"))
      .select(col("__d"),
        (pow(lit(p), col("__d").cast("double") - 1.0) *
          col("__ov").cast("double") / col("__d").cast("double"))
          .as("__t"))
    val common = joined.agg(count(lit(1)).as("n_common"))
    terms.agg(sum(col("__t")).as("__sum"))
      .crossJoin(broadcast(common))
      .select(lit(k).as("k"), lit(p).as("p"), col("n_common"),
        round(lit(1.0 - p) * col("__sum"), 6).as("rbo"))
  }

  /** k-row depth spine 1..k built from the session at hand (a bounded
    * literal frame — never a row-dependent range). */
  private def spark_range_df(like: DataFrame, k: Int): DataFrame =
    like.sparkSession.range(1, k + 1).toDF("__d")
      .select(col("__d").cast("int").as("__d"))

  /** Per-group fairness panel for a binary classifier — demographic
    * parity (predicted-positive rate) and equalized-odds components
    * (TPR / FPR) per protected group, each with its gap to the GLOBAL
    * rate, so the audit reads directly as "group g is flagged 12 points
    * more often than the corpus". The training-data-audit sibling of
    * [[aucBinaryBy]]'s per-group ranking check.
    *
    * Returns one row per group:
    * `(group, n, pos_rate, tpr, fpr, pos_rate_gap, tpr_gap, fpr_gap)`.
    * TPR is NULL where the group has no positive labels, FPR where no
    * negatives (undefined, not 0); gaps are NULL when either side is.
    * Rows with NULL group, prediction, or label are excluded;
    * out-of-domain indicators fail fast ([[fleissKappa]]'s contract).
    *
    * Scale shape: ONE map-side-combined hash aggregation to |groups|
    * rows; the global rates ride a 1-row broadcast cross join. No
    * window, no row-level shuffle. */
  def fairnessPanel(df: DataFrame, groupCol: Column, predCol: Column,
      labelCol: Column): DataFrame = {
    val p = predCol.cast("long")
    val y = labelCol.cast("long")
    val inDomain = Seq(p, y).map(c => c.isNull || c === 0L || c === 1L)
      .reduce(_ && _)
    val base = df
      .where(OpsUtil.orRaise(inDomain,
        lit("fairnessPanel: prediction/label outside {0, 1, NULL}")))
      .select(groupCol.cast("string").as("group"), p.as("__p"), y.as("__y"))
      .filter(col("group").isNotNull && col("__p").isNotNull &&
        col("__y").isNotNull)
    def rates(grouped: org.apache.spark.sql.RelationalGroupedDataset)
        : DataFrame = grouped
      .agg(count(lit(1)).as("n"),
        sum(col("__p")).as("__np"),
        sum(col("__y")).as("__ny"),
        sum(col("__p") * col("__y")).as("__tp"),
        sum(col("__p") * (lit(1L) - col("__y"))).as("__fp"))
    def pr(n: Column, d: Column): Column =
      when(d > 0, n.cast("double") / d.cast("double"))
    val g = rates(base.groupBy(col("group")))
    val all = rates(base.groupBy())
      .select(pr(col("__np"), col("n")).as("__gpos"),
        pr(col("__tp"), col("__ny")).as("__gtpr"),
        pr(col("__fp"), col("n") - col("__ny")).as("__gfpr"))
    g.crossJoin(broadcast(all))
      .select(col("group"), col("n"),
        round(pr(col("__np"), col("n")), 6).as("pos_rate"),
        round(pr(col("__tp"), col("__ny")), 6).as("tpr"),
        round(pr(col("__fp"), col("n") - col("__ny")), 6).as("fpr"),
        round(pr(col("__np"), col("n")) - col("__gpos"), 6)
          .as("pos_rate_gap"),
        round(pr(col("__tp"), col("__ny")) - col("__gtpr"), 6)
          .as("tpr_gap"),
        round(pr(col("__fp"), col("n") - col("__ny")) - col("__gfpr"), 6)
          .as("fpr_gap"))
  }

  /** Fleiss' kappa for k raters over binary categories — the multi-rater
    * generalization of [[cohenKappa]] ("across the whole labeling
    * panel, how much agreement beyond chance?"). Each column of
    * `raterCols` is one rater's 0/1 assignment; rows with any NULL
    * rating are excluded (a fixed panel per item — the statistic's
    * standard balanced form).
    *
    * Exactness: per item, `r = Σ ratings` and agreement weight
    * `Σ_c n_c(n_c−1) = r(r−1) + (k−r)(k−r−1)`, an integer; `P̄` and
    * `P̄e` (from exact category-total squares in DECIMAL(38,0)) are each
    * one IEEE sequence. Returns one row
    * `(n, n_raters, p_bar, p_e, kappa)`; kappa NULL when p_e = 1.
    *
    * Scale shape: one row-level projection (`r` per item) folded by a
    * single hash aggregation — no join, no window, no shuffle beyond
    * the 1-row final. */
  def fleissKappa(df: DataFrame, raterCols: Seq[Column]): DataFrame = {
    require(raterCols.size >= 2, "fleissKappa needs at least 2 raters")
    val k = raterCols.size
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // a NULL rating nulls the whole sum, so the isNotNull filter drops
    // any item with an incomplete panel
    val casted = raterCols.map(_.cast("long"))
    // out-of-domain ratings would silently corrupt the r(r-1)+(k-r)(k-r-1)
    // agreement weight, so fail fast instead of producing a plausible kappa
    val inDomain = casted
      .map(c => c.isNull || c === 0L || c === 1L)
      .reduce(_ && _)
    val r = casted.reduce(_ + _)
    val items = df
      .where(OpsUtil.orRaise(inDomain,
        lit("fleissKappa: rating outside {0, 1, NULL}; raterCols must be " +
          "binary 0/1 assignments")))
      .select(r.as("__r")).filter(col("__r").isNotNull)
    val agg = items.agg(
      count(lit(1)).as("n"),
      sum(col("__r")).cast(dec38).as("__sr"),
      sum(col("__r") * (col("__r") - 1) +
        (lit(k.toLong) - col("__r")) * (lit(k.toLong) - col("__r") - 1))
        .cast(dec38).as("__sagree"))
    val n = col("n").cast("double")
    val kk = lit(k.toDouble)
    // P̄ = Σ_i Σ_c n_ic(n_ic-1) / (n·k·(k-1)); p1 = Σr/(n·k), p0 = 1-p1;
    // P̄e = p1² + p0²
    val pBar = col("__sagree").cast("double") / (n * kk * lit((k - 1).toDouble))
    val p1 = col("__sr").cast("double") / (n * kk)
    val pe = p1 * p1 + (lit(1.0) - p1) * (lit(1.0) - p1)
    agg.select(col("n"), lit(k).as("n_raters"),
      round(pBar, 6).as("p_bar"), round(pe, 6).as("p_e"),
      when(pe < 1.0, round((pBar - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** Mann–Whitney U rank-sum test between the `valueCol` distributions
    * of two frames — the RANK-based complement of [[ksTwoSample]]: KS
    * reads the largest ECDF gap, U reads the probability that a random
    * A-draw exceeds a random B-draw (the common-language effect size,
    * numerically the same statistic as [[aucBinary]] over group
    * membership). The nonparametric location-shift gate a pipeline runs
    * when a metric's distribution is too heavy-tailed for a t/z test.
    *
    * Exactness: on the merged distinct-value histogram with per-value
    * counts `(ca, cb)` and `t = ca + cb`, the doubled midrank at value v
    * is the INTEGER `2·cumBefore + t + 1`, so `2·R_a = Σ ca·(2·cumBefore
    * + t + 1)` and `2·U_a = 2·R_a − na·(na+1)` stay exact in
    * DECIMAL(38,0); the tie term `Σ(t³−t)` likewise. Only the final
    * z/effect-size divisions are IEEE.
    *
    * Returns one row `(n_a, n_b, n_values, u_a, cles, z)`; `z` uses the
    * tie-corrected normal approximation `σ² = na·nb/12·((n+1) −
    * Σ(t³−t)/(n(n−1)))` and is NULL when σ = 0 (all values tied) or
    * either side is empty.
    *
    * Scale shape: identical to [[ksTwoSample]] — each side
    * hash-collapses to its distinct-value domain, a full-outer
    * equi-join merges the bounded frames, ONE cumulative window walks
    * the merged histogram, totals fold to one row. No row-level
    * shuffle. */
  def mannWhitney(a: DataFrame, b: DataFrame, valueCol: Column): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def side(df: DataFrame, cnt: String): DataFrame = df
      .select(valueCol.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__v"))
      .agg(count(lit(1)).as(cnt))
    val merged = side(a, "__ca").join(side(b, "__cb"), Seq("__v"), "full_outer")
      .select(col("__v"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
      .withColumn("__t", col("__ca") + col("__cb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = merged.withColumn("__before",
      coalesce(sum(col("__t")).over(w), lit(0L)))
    val agg = ranked.agg(
      sum(col("__ca")).cast(dec38).as("__na"),
      sum(col("__cb")).cast(dec38).as("__nb"),
      count(lit(1)).as("n_values"),
      sum(col("__ca").cast(dec38) *
        (lit(2).cast(dec38) * col("__before").cast(dec38) +
          col("__t").cast(dec38) + lit(1).cast(dec38))).as("__r2a"),
      sum(col("__t").cast(dec38) * col("__t").cast(dec38) *
        col("__t").cast(dec38) - col("__t").cast(dec38)).as("__ties"))
    val na = col("__na").cast("double")
    val nb = col("__nb").cast("double")
    val n = na + nb
    // 2·U_a exact; halve in double (exact: integer/2)
    val u2 = col("__r2a") - col("__na") * (col("__na") + lit(1).cast(dec38))
    val uA = u2.cast("double") / lit(2.0)
    val sigma2 = na * nb / lit(12.0) *
      ((n + lit(1.0)) - col("__ties").cast("double") / (n * (n - lit(1.0))))
    val nonEmpty = col("__na") > 0 && col("__nb") > 0
    agg.select(
      col("__na").cast("bigint").as("n_a"),
      col("__nb").cast("bigint").as("n_b"),
      col("n_values"),
      when(nonEmpty, uA).as("u_a"),
      when(nonEmpty, round(uA / (na * nb), 6)).as("cles"),
      when(nonEmpty && sigma2 > 0.0,
        round((uA - na * nb / lit(2.0)) / sqrt(sigma2), 6)).as("z"))
  }

  /** One-way ANOVA F-test across groups of a quantized measure — the
    * PARAMETRIC mean-separation gate ([[mannWhitney]] is its two-group
    * rank-based sibling): does the between-group mean spread exceed the
    * within-group noise? Run per data source / shard over a quality
    * signal before mixing sources into a training blend.
    *
    * Exactness: `valueCol` is quantized to an unscaled BIGINT at
    * `scale` decimals (the [[graft.functions.Decimals]] convention), so
    * per-group `n_g, S_g, Q_g = Σv²` are exact DECIMAL(38,0); each
    * group's within-term numerator `n_g·Q_g − S_g²` is exact, and only
    * the per-group division by `n_g` plus the final ratios run IEEE.
    * The OUTPUTS are deliberately dimensionless (η², F) or exactly
    * divided (grand mean): raw sums-of-squares can sit at 1e11+
    * magnitudes where cross-engine fold-order noise (~ulps of the SUM)
    * exceeds the round(,6) absorber, while the ratios carry only
    * ~1e-15 RELATIVE noise and round cleanly.
    *
    * Returns one row `(n, k, grand_mean, eta_sq, f_stat)`; F is NULL
    * when k < 2, any within-df is absent (n ≤ k), or SSW = 0; η² is
    * NULL when total SS = 0.
    *
    * Scale shape: ONE hash aggregation to the group frame (bounded:
    * grouping keys are low-cardinality by contract), one 1-row fold.
    * No window, no join, no row-level shuffle beyond the group agg. */
  def anovaF(df: DataFrame, groupCol: Column, valueCol: Column,
      scale: Int = 4): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = graft.functions.Decimals.unscaledLong(valueCol, scale).cast(dec38)
    val perGroup = df
      .select(groupCol.as("__g"), v.as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
      .groupBy(col("__g"))
      .agg(count(lit(1)).cast(dec38).as("__n"),
        sum(col("__v")).as("__s"),
        sum(col("__v") * col("__v")).as("__q"))
    // descale: v was ×10^scale, so S carries 10^scale and Q/S² carry 10^2scale
    val down = math.pow(10.0, 2.0 * scale)
    val withinG = (col("__n") * col("__q") - col("__s") * col("__s"))
      .cast("double") / (col("__n").cast("double") * lit(down))
    val folded = perGroup.agg(
      sum(col("__n")).cast(dec38).as("__nt"),
      count(lit(1)).as("k"),
      sum(col("__s")).as("__st"),
      sum(withinG).as("__ssw"),
      sum((col("__s") * col("__s")).cast("double") /
        (col("__n").cast("double") * lit(down))).as("__sgn"))
    val nT = col("__nt").cast("double")
    val kD = col("k").cast("double")
    // SSB = Σ S_g²/n_g − S²/n (all in descaled units)
    val ssb = col("__sgn") -
      (col("__st") * col("__st")).cast("double") / (nT * lit(down))
    val sst = ssb + col("__ssw")
    val f = (ssb / (kD - lit(1.0))) /
      (col("__ssw") / (nT - kD))
    // grand mean: exact decimal division, one final cast
    val mean = graft.functions.Decimals.fromUnscaled(
      col("__st").cast("decimal(38,0)"), scale).cast("double") / nT
    folded.select(
      col("__nt").cast("bigint").as("n"), col("k"),
      round(mean, 6).as("grand_mean"),
      when(sst > 0.0, round(ssb / sst, 6)).as("eta_sq"),
      when(col("k") >= 2 && col("__nt").cast("bigint") > col("k") &&
        col("__ssw") > 0.0, round(f, 6)).as("f_stat"))
  }

  /** Isotonic (monotone) calibration fit over the score histogram — the
    * non-parametric alternative to Platt scaling: the fitted curve is
    * the L2-optimal NON-DECREASING map from score to empirical positive
    * rate (pool-adjacent-violators solution). Computed by the minimax
    * identity `fit_i = max_{j≤i} min_{k≥i} wavg(y[j..k])` rather than
    * the sequential PAV merge loop, so the whole fit stays declarative:
    * scores collapse to their bounded distinct-bin histogram (callers
    * pre-round scores, the [[aucBinary]] convention; `maxBins`
    * fail-fasts otherwise), prefix sums index the bins, ONE self-join
    * builds the O(bins²) interval-average grid, a per-j reversed
    * cumulative-min window and a per-bin max fold finish the fit.
    *
    * Exactness: interval averages are single IEEE divisions of exact
    * integer (count, positive) prefix differences — identical in any
    * engine — and min/max never round; only the two output rates round
    * at 6.
    *
    * Returns per bin `(score, n, y_rate, iso_fit)` with `iso_fit`
    * non-decreasing in score.
    *
    * Scale shape: rows collapse to the bin histogram FIRST (hash agg);
    * everything quadratic runs on the ≤`maxBins` frame. The bin-index
    * window is global but bounded by the same guard. */
  def isotonicFit(df: DataFrame, scoreCol: Column, labelCol: Column,
      maxBins: Long = 2000L): DataFrame = {
    require(maxBins > 0, "maxBins must be positive")
    val y = labelCol.cast("long")
    val bins = df
      .select(scoreCol.cast("double").as("score"), y.as("__y"))
      .where(OpsUtil.orRaise(col("__y").isNull || col("__y") === 0L ||
        col("__y") === 1L,
        lit("isotonicFit: labelCol outside {0, 1, NULL}")))
      .filter(col("score").isNotNull && col("__y").isNotNull)
      .groupBy(col("score"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__s"))
    val guarded = bins.crossJoin(broadcast(bins.agg(count(lit(1)).as("__k"))))
      .where(OpsUtil.orRaise(col("__k") <= maxBins,
        lit("isotonicFit: "), col("__k"),
        lit(s" score bins (> maxBins=$maxBins); round scores more " +
          "coarsely or raise maxBins")))
      .select(col("score"), col("__n"), col("__s"))
    val wIdx = Window.orderBy(col("score"))
    val pre = guarded
      .withColumn("__i", row_number().over(wIdx))
      .withColumn("__cn", sum(col("__n")).over(
        wIdx.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__cs", sum(col("__s")).over(
        wIdx.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val a = pre.select(col("__i").as("__j"),
      (col("__cn") - col("__n")).as("__nj0"),
      (col("__cs") - col("__s")).as("__sj0"))
    val b = pre.select(col("__i").as("__k2"), col("__cn").as("__nk"),
      col("__cs").as("__sk"))
    val grid = a.join(b, col("__j") <= col("__k2"))
      .select(col("__j"), col("__k2"),
        ((col("__sk") - col("__sj0")).cast("double") /
          (col("__nk") - col("__nj0")).cast("double")).as("__avg"))
    val wMin = Window.partitionBy(col("__j")).orderBy(col("__k2").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fit = grid.withColumn("__m", min(col("__avg")).over(wMin))
      .groupBy(col("__k2").as("__i"))
      .agg(max(col("__m")).as("__fit"))
    pre.join(fit, Seq("__i"))
      .select(col("score"), col("__n").as("n"),
        round(col("__s").cast("double") / col("__n").cast("double"), 6)
          .as("y_rate"),
        round(col("__fit"), 6).as("iso_fit"))
  }

  /** Wilson score lower-bound ranking of per-group binomial rates —
    * "sort by the rate you can DEFEND, not the observed one": a group
    * with 2/2 successes ranks below one with 80/100 because its
    * interval is wide. The standard fix for small-sample rate ranking
    * (Wilson 1927) a curation pipeline applies when ordering sources /
    * shards by acceptance rate.
    *
    * `successCol` must be 0/1 (guarded — out-of-domain raises rather
    * than corrupting the interval). `z` defaults to 1.96 (95%).
    * Returns per group `(group, trials, successes, rate, wilson_low)`
    * with both rates rounded 6.
    *
    * Scale shape: one hash aggregation to the group frame; the interval
    * is a closed-form per-group expression — no window, no join. */
  def wilsonRanking(df: DataFrame, groupCol: Column, successCol: Column,
      z: Double = 1.96): DataFrame = {
    val y = successCol.cast("long")
    val guarded = df
      .where(OpsUtil.orRaise(y.isNull || y === 0L || y === 1L,
        lit("wilsonRanking: successCol outside {0, 1, NULL}")))
      .select(groupCol.as("group"), y.as("__y"))
      .filter(col("__y").isNotNull)
    val agg = guarded.groupBy(col("group"))
      .agg(count(lit(1)).as("trials"), sum(col("__y")).as("successes"))
    val n = col("trials").cast("double")
    val p = col("successes").cast("double") / n
    val z2 = lit(z * z)
    val low = (p + z2 / (lit(2.0) * n) -
      lit(z) * sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n))) /
      (lit(1.0) + z2 / n)
    agg.select(col("group"), col("trials"), col("successes"),
      round(p, 6).as("rate"),
      round(greatest(low, lit(0.0)), 6).as("wilson_low"))
  }

  /** Kruskal–Wallis H test — the k-group generalization of
    * [[mannWhitney]] (and the rank-based sibling of [[anovaF]]): do the
    * k value distributions share a location, judged on ranks alone?
    * The multi-source gate when a quality metric is too heavy-tailed
    * for ANOVA's normality assumption.
    *
    * Exactness follows the [[mannWhitney]] construction: on the merged
    * distinct-value histogram, the DOUBLED per-group rank sum
    * `2·R_g = Σ_v c_gv·(2·cumBefore_v + t_v + 1)` is an exact
    * DECIMAL(38,0) integer (t_v = total count at v across groups), as
    * is the tie sum `Σ(t³−t)`; `H = 12/(N(N+1))·Σ_g R_g²/n_g − 3(N+1)`
    * and the tie correction `C = 1 − Σ(t³−t)/(N³−N)` run IEEE on those
    * exact integers in a fixed op sequence any engine reproduces.
    *
    * Returns one row `(n, n_groups, n_values, h, h_corrected)`; h is
    * NULL when k < 2 or N < 2, `h_corrected = H/C` additionally NULL
    * when C = 0 (every observation tied at one value — no rank
    * information at all).
    *
    * Scale shape: one (group, value) hash collapse, one value-level
    * re-aggregation for the tie histogram, ONE cumulative window over
    * the bounded distinct-value frame, a bounded equi-join back on the
    * value key, then per-group and 1-row folds. Rows never enter a
    * window; `valueCol` should be quantized by the caller when its
    * domain is continuous (the [[aucBinary]] convention). */
  def kruskalWallis(df: DataFrame, groupCol: Column,
      valueCol: Column): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val gv = df.select(groupCol.as("__g"), valueCol.cast("double").as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
      .groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val vtot = gv.groupBy(col("__v")).agg(sum(col("__c")).as("__t"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val vrank = vtot.withColumn("__bef",
      coalesce(sum(col("__t")).over(w), lit(0L)))
    val grp = gv.join(vrank, Seq("__v"))
      .groupBy(col("__g"))
      .agg(sum(col("__c")).cast(dec38).as("__n"),
        sum(col("__c").cast(dec38) *
          (lit(2).cast(dec38) * col("__bef").cast(dec38) +
            col("__t").cast(dec38) + lit(1).cast(dec38))).as("__r2"))
    val ties = vrank.agg(
      sum(col("__t").cast(dec38) * col("__t").cast(dec38) *
        col("__t").cast(dec38) - col("__t").cast(dec38)).as("__ties"),
      count(lit(1)).as("n_values"))
    // Σ R_g²/n_g = Σ (2R)²/(4n) — (2R)² in double is deterministic
    // (the square of one exact-integer double, same rounding anywhere)
    val tot = grp.agg(
      sum(col("__n")).as("__N"), count(lit(1)).as("__k"),
      sum(col("__r2").cast("double") * col("__r2").cast("double") /
        (lit(4.0) * col("__n").cast("double"))).as("__sr"))
    val nD = col("__N").cast("double")
    val h = lit(12.0) / (nD * (nD + lit(1.0))) * col("__sr") -
      lit(3.0) * (nD + lit(1.0))
    val c = lit(1.0) - col("__ties").cast("double") /
      (nD * nD * nD - nD)
    tot.crossJoin(broadcast(ties)).select(
      col("__N").cast("bigint").as("n"),
      col("__k").as("n_groups"),
      col("n_values"),
      when(col("__k") >= 2 && col("__N") >= 2, round(h, 6)).as("h"),
      when(col("__k") >= 2 && col("__N") >= 2 && c > 0.0,
        round(h / c, 6)).as("h_corrected"))
  }

  /** Brown–Forsythe test (the robust Levene variant, 1974) for
    * VARIANCE homogeneity across groups: one-way ANOVA on the
    * absolute deviations from each group's MEDIAN, `z_ig = |x_ig −
    * med_g|`. The gate [[anovaF]] itself assumes away — unequal
    * spreads invalidate the pooled-variance F — and the robust choice
    * of median (vs Levene's mean) keeps the test honest under heavy
    * tails.
    *
    * Contract: `valueCol` INTEGRAL (counts, lengths — the usual graft
    * quantization discipline), so the per-group medians are exact
    * halves (percentile at (n−1)/2, the quantile_cont convention) and
    * every |x − med| is an exact multiple of 0.5 — the scale-1
    * unscaled-long moments in the delegated [[anovaF]] fold are then
    * EXACT, and the statistic inherits anovaF's determinism story.
    *
    * Returns one row `(n, k, mean_absdev, eta_sq, f_stat)` (anovaF's
    * panel over z; `f_stat` IS the Brown–Forsythe W).
    *
    * Scale shape: one per-group percentile aggregation (state bounded
    * by the distinct-value domain, not rows), a join back on the
    * bounded group key, then anovaF's single moment pass. */
  def brownForsythe(df: DataFrame, groupCol: Column,
      valueCol: Column): DataFrame = {
    val base = df.select(groupCol.as("__g"),
        valueCol.cast("double").as("__x"))
      .filter(col("__g").isNotNull && col("__x").isNotNull)
    val med = base.groupBy(col("__g"))
      .agg(expr("percentile(__x, 0.5)").as("__med"))
    val z = base.join(med, Seq("__g"))
      .select(col("__g"), abs(col("__x") - col("__med")).as("__z"))
    anovaF(z, col("__g"), col("__z"), scale = 1)
      .select(col("n"), col("k"),
        col("grand_mean").as("mean_absdev"), col("eta_sq"), col("f_stat"))
  }

  /** Cochran's Q test over k matched binary raters/classifiers — the
    * k-rater generalization of [[mcnemar]] (and the significance-test
    * companion to [[fleissKappa]]'s agreement measure): do the k
    * binary columns share one marginal positive rate, or does at
    * least one rater/model systematically fire more often? The gate
    * before declaring k model versions interchangeable on the same
    * eval set.
    *
    * `Q = (k−1)·(k·ΣC_j² − (ΣC_j)²) / (k·ΣR_i − ΣR_i²)` with C_j the
    * per-rater positive totals and R_i the per-item row totals —
    * every term an exact integer (DECIMAL(38,0) for the squares), one
    * final IEEE division. Follows [[fleissKappa]]'s input discipline:
    * ratings outside {0,1,NULL} fail fast, items with an incomplete
    * panel (any NULL) are dropped.
    *
    * Returns one row `(n_items, n_raters, q_stat)`; Q is NULL when
    * the denominator is 0 (every item unanimous — no discordance to
    * test) or k < 2.
    *
    * Scale shape: ONE aggregation pass computing the k column totals
    * and both row-total moments together; no join, no window, k-wide
    * state only. */
  def cochranQ(df: DataFrame, raterCols: Seq[Column]): DataFrame = {
    require(raterCols.size >= 2, "cochranQ needs at least 2 raters")
    val k = raterCols.size
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val casted = raterCols.map(_.cast("long"))
    val inDomain = casted
      .map(c => c.isNull || c === 0L || c === 1L)
      .reduce(_ && _)
    val r = casted.reduce(_ + _)
    val items = df
      .where(OpsUtil.orRaise(inDomain,
        lit("cochranQ: rating outside {0, 1, NULL}; raterCols must be " +
          "binary 0/1 assignments")))
      .select((casted :+ r.as("__r")).zipWithIndex.map {
        case (c, i) => c.as(s"__c$i")
      }: _*)
      .filter(col(s"__c$k").isNotNull)   // __r landed as __c{k}
    val colTotals = (0 until k).map(i =>
      sum(col(s"__c$i")).cast(dec38).as(s"__t$i"))
    val agg = items.agg(count(lit(1)).as("n_items"),
      (colTotals :+
        sum(col(s"__c$k")).cast(dec38).as("__sr") :+
        sum(col(s"__c$k").cast(dec38) * col(s"__c$k").cast(dec38))
          .as("__sr2")): _*)
    val sumC = (0 until k).map(i => col(s"__t$i")).reduce(_ + _)
    val sumC2 = (0 until k).map(i => col(s"__t$i") * col(s"__t$i"))
      .reduce(_ + _)
    val kDec = lit(k).cast(dec38)
    val num = (kDec * sumC2 - sumC * sumC).cast("double")
    val den = (kDec * col("__sr") - col("__sr2")).cast("double")
    agg.select(col("n_items"), lit(k).as("n_raters"),
      when(den > 0.0, round(lit((k - 1).toDouble) * num / den, 6))
        .as("q_stat"))
  }

  /** Bland–Altman agreement analysis between two measurements of the
    * same quantity (Bland & Altman, Lancet 1986): bias = mean
    * difference, 95% limits of agreement = bias ± 1.96·SD(diff), and
    * the share of observations falling OUTSIDE those limits. The
    * data-quality read when two pipelines (a recorded column vs a
    * recomputed one, two extraction versions) should agree: a nonzero
    * bias is systematic drift, fat limits are noise, and rows outside
    * the limits are the audit queue.
    *
    * Exactness: both measurements quantize to unscaled LONGs at
    * `scale`, so per-row differences and the moment sums `n, Σd, Σd²`
    * are exact DECIMAL(38,0); bias/SD/limits are fixed IEEE sequences
    * on those integers, and the outside test compares each exact
    * integer difference against the two limit doubles — deterministic
    * in any engine.
    *
    * Returns one row `(n, bias, sd_diff, lo_limit, hi_limit,
    * n_outside, pct_outside)`; SD and the limits are NULL when n < 2,
    * `sd_diff` uses the sample (n−1) denominator.
    *
    * Scale shape: differences collapse to their DISTINCT-VALUE
    * histogram first (near-agreeing measurements have a tiny diff
    * domain by construction), so the moment fold and the outside
    * count both run over the bounded histogram — the raw frame is
    * scanned exactly once. */
  def blandAltman(df: DataFrame, aCol: Column, bCol: Column,
      scale: Int = 0): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val qa = graft.functions.Decimals.unscaledLong(aCol.cast("double"), scale)
    val qb = graft.functions.Decimals.unscaledLong(bCol.cast("double"), scale)
    val hist = df.select((qa - qb).as("__d"))
      .filter(col("__d").isNotNull)
      .groupBy(col("__d"))
      .agg(count(lit(1)).as("__c"))
    val m = hist.agg(
      sum(col("__c")).as("__n"),
      sum(col("__d").cast(dec38) * col("__c").cast(dec38)).as("__s"),
      sum(col("__d").cast(dec38) * col("__d").cast(dec38) *
        col("__c").cast(dec38)).as("__q"))
    val pow = lit(math.pow(10, scale))
    val nD = col("__n").cast("double")
    val bias = col("__s").cast("double") / nD
    val sd = sqrt((nD * col("__q").cast("double") -
      col("__s").cast("double") * col("__s").cast("double")) /
      (nD * (nD - lit(1.0))))
    val lo = bias - lit(1.96) * sd
    val hi = bias + lit(1.96) * sd
    val limits = m.select(col("__n"), bias.as("__bias"),
      when(col("__n") >= 2, sd).as("__sd"),
      when(col("__n") >= 2, lo).as("__lo"),
      when(col("__n") >= 2, hi).as("__hi"))
    val outside = hist.crossJoin(broadcast(limits))
      .agg(sum(when(col("__d").cast("double") < col("__lo") ||
        col("__d").cast("double") > col("__hi"), col("__c"))
        .otherwise(0L)).as("__out"))
    limits.crossJoin(broadcast(outside)).select(
      col("__n").as("n"),
      round(col("__bias") / pow, 6).as("bias"),
      round(col("__sd") / pow, 6).as("sd_diff"),
      round(col("__lo") / pow, 6).as("lo_limit"),
      round(col("__hi") / pow, 6).as("hi_limit"),
      when(col("__sd").isNotNull, col("__out")).as("n_outside"),
      when(col("__sd").isNotNull,
        round(col("__out").cast("double") / col("__n").cast("double"), 6))
        .as("pct_outside"))
  }
}
