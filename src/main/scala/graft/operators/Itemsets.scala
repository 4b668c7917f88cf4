package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent co-occurrence mining — the first step of market-basket /
  * association analysis (Agrawal & Srikant '94 a-priori family), and in
  * corpus curation the "which labels/tags/domains travel together" audit.
  */
object Itemsets {

  /** Pairwise co-occurrence counts: for every unordered pair of distinct
    * items appearing in the same group, the number of groups containing
    * both, ranked by support. `item_a < item_b` canonicalizes the pair;
    * the (count DESC, item_a, item_b) output order is a total order, so
    * the top-k cut is engine-reproducible under ties.
    *
    * Scale shape: distinct (group, item) collapses multiplicity first
    * (one hash aggregation), then the self-join meets on the group key —
    * BOTH sides are the same aggregated frame, so the physical plan
    * reuses one exchange (the q89 sourceOverlap idiom) and the join
    * itself is shuffle-free. Fan-out is Σ k_g² over per-group item
    * counts k_g — bounded by the natural basket size, NOT corpus size;
    * a degenerate mega-group (one key holding millions of items) should
    * be capped upstream the same way LSH mega-buckets are. The pair
    * aggregation shuffles |pairs| rows on the pair key, and the final
    * top-k is TakeOrderedAndProject (per-partition partial top-k + k-row
    * driver merge, no global sort).
    *
    * A/B'd (round 7, sf0.1, same session) against the collect_list +
    * HOF pair-expansion form: 1.21 s vs 1.09 s — inside window noise,
    * and the array form additionally materializes each group's whole
    * item set in one row (a mega-basket becomes a mega-array in memory,
    * where the join form merely fans out rows). Self-join kept. */
  def coOccurrencePairs(df: DataFrame, groupCol: String, itemCol: String,
      topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    val items = df.select(col(groupCol), col(itemCol)).distinct()
    val a = items.alias("a")
    val b = items.alias("b")
    a.join(b, col(s"a.$groupCol") === col(s"b.$groupCol") &&
        col(s"a.$itemCol") < col(s"b.$itemCol"))
      .groupBy(col(s"a.$itemCol").as("item_a"), col(s"b.$itemCol").as("item_b"))
      .agg(count(lit(1)).as("n_groups"))
      .orderBy(col("n_groups").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** Undirected co-occurrence EDGE LIST — [[coOccurrencePairs]] without
    * the top-k cut, for consumers that need the whole (thresholded)
    * graph (e.g. [[Graph.triangleStats]] over the co-purchase graph).
    *
    * Shape: ONE data shuffle. Baskets collapse to a per-group sorted
    * distinct item array (`collect_set` dedups in the aggregation
    * buffer, so the distinct pre-shuffle of the self-join form is not
    * needed), pairs expand map-side with a codegen'd nested-transform
    * HOF over the sorted array (x < y by construction), and the pair
    * aggregation is the only other exchange. Round-12 A/B at sf0.1 vs
    * the q156 distinct→self-join→agg edge build: 0.76 s vs 1.1 s
    * min-of-3 — the HOF form drops both the distinct shuffle and the
    * join. The round-7 caveat about mega-baskets becoming mega-arrays
    * is ENFORCED here, not advisory: `maxBasket` fail-fasts a group
    * whose item set exceeds it (pair fan-out is quadratic in basket
    * size, so a degenerate group would dominate the plan either way —
    * better to die naming it).
    *
    * Output: `(item_a, item_b, n_groups)` with `item_a < item_b`,
    * filtered to `n_groups >= minGroups`. */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
      minGroups: Long = 1L, maxBasket: Int = 10000): DataFrame = {
    require(minGroups >= 1, s"minGroups must be >= 1: $minGroups")
    require(maxBasket >= 2, s"maxBasket must be >= 2: $maxBasket")
    val sets = df.groupBy(col(groupCol))
      .agg(sort_array(collect_set(col(itemCol))).as("__ps"))
      .filter(size(col("__ps")) >= 2)
      .where(OpsUtil.orRaise(size(col("__ps")) <= maxBasket,
        lit("coOccurrenceEdges: a group holds "),
        size(col("__ps")).cast("string"),
        lit(s" distinct items (> maxBasket=$maxBasket); pair fan-out " +
          "is quadratic in basket size — cap the group upstream or " +
          "raise maxBasket")))
    sets.select(explode(flatten(transform(col("__ps"), (x, i) =>
        transform(slice(col("__ps"), i + lit(2), size(col("__ps")) - i - 1),
          y => struct(x.as("a"), y.as("b")))))).as("__pr"))
      .groupBy(col("__pr.a").as("item_a"), col("__pr.b").as("item_b"))
      .agg(count(lit(1)).as("n_groups"))
      .filter(col("n_groups") >= minGroups)
  }

  /** [[coOccurrenceEdges]] specialized to NON-NEGATIVE INTEGRAL item
    * keys below 2³¹: each a<b pair packs into ONE long
    * (`a·2³¹ + b`) for the count shuffle — half the key bytes and one
    * flat comparison instead of a struct — and decodes with integral
    * `div`/`pmod` after the aggregation (the [[TextDedup.chunkClusters]]
    * packed-key idiom, including its round-14 lesson: never decode a
    * packed long with `/`, which evaluates in double). The key-domain
    * contract is ENFORCED, not advisory: the sorted basket's first and
    * last elements bound every item, so one `orRaise` on the already-
    * built array checks the whole group at zero extra passes — keys
    * outside [0, 2³¹) abort naming the fix (use the generic struct
    * form). Same output contract as [[coOccurrenceEdges]].
    *
    * Same-JVM interleaved A/B at sf0.1 (q123_ab, warm min-of-3): 0.93 /
    * 0.99 s struct shape → 0.84 / 0.90 s packed. */
  def coOccurrenceEdgesPacked(df: DataFrame, groupCol: String,
      itemCol: String, minGroups: Long = 1L,
      maxBasket: Int = 10000): DataFrame = {
    require(minGroups >= 1, s"minGroups must be >= 1: $minGroups")
    require(maxBasket >= 2, s"maxBasket must be >= 2: $maxBasket")
    // Type misuse fails HERE with the same actionable message as range
    // misuse (round-15 ADVICE): without this, a string item column hits
    // the .cast("long") below as a raw ANSI CAST error and the curated
    // guard never fires.
    df.schema(itemCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"coOccurrenceEdgesPacked: item column '$itemCol' has type $other — " +
        "packing requires an integral key in [0, 2^31); use " +
        "coOccurrenceEdges (struct keys) for arbitrary item types")
    }
    val shift = 1L << 31
    val sets = df.groupBy(col(groupCol))
      .agg(sort_array(collect_set(col(itemCol).cast("long"))).as("__ps"))
      .filter(size(col("__ps")) >= 2)
      .where(OpsUtil.orRaise(size(col("__ps")) <= maxBasket,
        lit("coOccurrenceEdgesPacked: a group holds "),
        size(col("__ps")).cast("string"),
        lit(s" distinct items (> maxBasket=$maxBasket); pair fan-out " +
          "is quadratic in basket size — cap the group upstream or " +
          "raise maxBasket")))
      .where(OpsUtil.orRaise(
        element_at(col("__ps"), 1) >= 0 &&
          element_at(col("__ps"), -1) < shift,
        lit("coOccurrenceEdgesPacked: item key outside [0, 2^31) — "),
        lit("packing would collide; use coOccurrenceEdges (struct keys)")))
    sets.select(explode(flatten(transform(col("__ps"), (x, i) =>
        transform(slice(col("__ps"), i + lit(2), size(col("__ps")) - i - 1),
          y => x * lit(shift) + y)))).as("__pk"))
      .groupBy(col("__pk"))
      .agg(count(lit(1)).as("n_groups"))
      .filter(col("n_groups") >= minGroups)
      .select(expr(s"__pk div $shift").as("item_a"),
        pmod(col("__pk"), lit(shift)).as("item_b"), col("n_groups"))
  }

  /** Directed association rules a→b with the full interestingness
    * panel — support, confidence, lift, conviction (Agrawal & Srikant
    * '94; conviction from Brin et al. '97 "Dynamic Itemset Counting"):
    * [[coOccurrencePairs]] says WHICH items travel together, this says
    * in which DIRECTION the implication carries information. Lift > 1
    * = positive association; conviction → ∞ as the rule approaches
    * exceptionlessness (NULL at confidence = 1).
    *
    * Exactness: every count (c_a, c_b, c_ab, N distinct baskets) is an
    * exact integer; the four metrics are fixed IEEE ratio sequences on
    * them. The (lift DESC, antecedent, consequent) output order is
    * computed on the UNROUNDED lift — a deterministic double since
    * both factors are integer-exact — so the top-k cut is
    * engine-reproducible; ties break on the rule key.
    *
    * Scale shape: identical to [[coOccurrencePairs]] up to the pair
    * frame (one distinct collapse, exchange-reused self-join, pair
    * hash agg); `minCount` prunes the pair frame BEFORE it doubles
    * into directed rules, item supports join on the bounded item
    * domain, N is a 1-row broadcast, and the final cut is
    * TakeOrderedAndProject. */
  def associationRules(df: DataFrame, groupCol: String, itemCol: String,
      minCount: Long, topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val items = df.select(col(groupCol).as("__g"), col(itemCol).as("__i"))
      .filter(col("__g").isNotNull && col("__i").isNotNull)
      .distinct()
    val nGroups = items.agg(countDistinct(col("__g")).as("__n"))
    val counts = items.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val a = items.alias("a")
    val b = items.alias("b")
    val pairs = a.join(b, col("a.__g") === col("b.__g") &&
        col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("__ia"), col("b.__i").as("__ib"))
      .agg(count(lit(1)).as("__cab"))
      .filter(col("__cab") >= minCount)
    val directed = pairs
      .select(col("__ia").as("antecedent"), col("__ib").as("consequent"),
        col("__cab"))
      .union(pairs.select(col("__ib").as("antecedent"),
        col("__ia").as("consequent"), col("__cab")))
    val ca = counts.select(col("__i").as("antecedent"), col("__c").as("__ca"))
    val cb = counts.select(col("__i").as("consequent"), col("__c").as("__cb"))
    val nD = col("__n").cast("double")
    val conf = col("__cab").cast("double") / col("__ca").cast("double")
    val lift = col("__cab").cast("double") * nD /
      (col("__ca").cast("double") * col("__cb").cast("double"))
    val conviction = when(conf < 1.0,
      (lit(1.0) - col("__cb").cast("double") / nD) / (lit(1.0) - conf))
    directed.join(ca, Seq("antecedent")).join(cb, Seq("consequent"))
      .crossJoin(broadcast(nGroups))
      .orderBy(lift.desc, col("antecedent"), col("consequent"))
      .limit(topK)
      .select(col("antecedent"), col("consequent"),
        col("__cab").as("n_both"),
        round(col("__cab").cast("double") / nD, 6).as("support"),
        round(conf, 6).as("confidence"),
        round(lift, 6).as("lift"),
        round(conviction, 6).as("conviction"))
  }
}
