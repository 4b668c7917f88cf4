package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star scope). Two paths:
  *
  *  - [[bruteForceTopK]] — exact: queries × corpus cross-join scored by
  *    cosine, per-query top-k via window-group-limit. Correctness baseline
  *    and the right plan when |queries| is small (broadcast the queries →
  *    no shuffle of the 100 TB corpus, single pass).
  *  - [[lshTopK]] — scale path: random-hyperplane LSH buckets both sides;
  *    only same-bucket pairs are scored. Recall < 1 traded for a corpus
  *    scan that shuffles on a small int key instead of cross-joining.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector. `queries` is expected to
    * be small — it is broadcast, so the corpus is never shuffled. Each
    * side's norm is computed ONCE below the join (per row, not per pair) —
    * only the codegen'd dot product runs per (query × corpus) pair. Cosine
    * is rounded to `roundTo` decimals before ranking so ordering (and any
    * external oracle) is stable; ties break on corpus id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, roundTo: Int = 6,
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("__qv"), norm(col(vecCol)).as("__qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("__cv"), norm(col(vecCol)).as("__cn"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("cosine",
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("__rn").as("rank"))
  }

  /** Exact squared-L2 top-k — [[bruteForceTopK]]'s Euclidean sibling and
    * the like-for-like baseline for distance-metric indexes (PQ/ADC
    * approximates L2, so gating its recall against a COSINE baseline
    * would conflate metric mismatch with quantization loss). Same shape:
    * queries broadcast, per-side self-dots below the join, one codegen'd
    * dot per pair, rounded-distance ranking with id ties. */
  def bruteForceL2TopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, roundTo: Int = 6,
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("__qv"), dot(col(vecCol), col(vecCol)).as("__dqq"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("__cv"), dot(col(vecCol), col(vecCol)).as("__dcc"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("dist2", round(
        col("__dqq") - dot(col("__qv"), col("__cv")) * 2 + col("__dcc"), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist2").asc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("dist2"),
        col("__rn").as("rank"))
  }

  /** Corpus side of the LSH index: one row per vector with its routing
    * bucket — schema `(id, vec, nrm, bucket)`. At scale THIS frame is the
    * index: persist it (or write/reload as parquet, ideally partitioned by
    * bucket) once and amortize the corpus scan across query batches via
    * [[lshSearch]]. */
  def buildLshIndex(corpus: DataFrame, vecCol: String, idCol: String,
      planes: Seq[Seq[Double]]): DataFrame =
    corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"),
      norm(col(vecCol)).as("nrm"),
      hyperplaneBucket(col(vecCol), planes).as("bucket"))

  /** Search a prebuilt [[buildLshIndex]] frame: queries are bucketed with
    * the SAME planes the index was built with and joined on bucket; only
    * colliding pairs are scored. */
  def lshSearch(index: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, planes: Seq[Seq[Double]],
      roundTo: Int = 6): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("__qv"), norm(col(vecCol)).as("__qn"),
      hyperplaneBucket(col(vecCol), planes).as("__bucket"))
    val c = index.select(col("id").as("neighbor_id"), col("vec").as("__cv"),
      col("nrm").as("__cn"), col("bucket").as("__bucket"))
    val scored = c.join(broadcast(q), Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("__rn").as("rank"))
  }

  /** LSH-bucketed ANN: both sides bucketed by `planes` sign-pattern; only
    * bucket-colliding pairs are scored. With b planes the corpus fans out
    * ×1 (one bucket per vector) and the join key has 2^b values — size b
    * to executor count at scale. One-shot convenience over
    * [[buildLshIndex]] + [[lshSearch]]; batch workloads should build once
    * and search many times. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, planes: Seq[Seq[Double]],
      roundTo: Int = 6): DataFrame =
    lshSearch(buildLshIndex(corpus, vecCol, idCol, planes), queries,
      vecCol, idCol, k, planes, roundTo)

  /** Multi-probe LSH search (Lv et al. 2007): each query probes its own
    * bucket PLUS every bucket at Hamming distance 1 (one hyperplane sign
    * flipped) — the buckets a true neighbor most likely fell into when a
    * single plane narrowly disagreed. Recall rises toward exact search
    * without growing the index: the corpus side still holds ONE row per
    * vector, only the tiny broadcast query side fans out ×(planes+1).
    * The alternative recall lever — more hash tables — multiplies corpus
    * storage and shuffle instead; multi-probe is the scale-friendly
    * knob. A neighbor cannot be double-counted: it lives in exactly one
    * bucket and the probe set is distinct. */
  def lshSearchMultiProbe(index: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, planes: Seq[Seq[Double]],
      roundTo: Int = 6): DataFrame = {
    val probes = array(
      col("__b0") +: planes.indices.map(j =>
        col("__b0").bitwiseXOR(lit(1 << j))): _*)
    val q = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("__qv"), norm(col(vecCol)).as("__qn"),
        hyperplaneBucket(col(vecCol), planes).as("__b0"))
      .withColumn("__bucket", explode(probes))
      .drop("__b0")
    val c = index.select(col("id").as("neighbor_id"), col("vec").as("__cv"),
      col("nrm").as("__cn"), col("bucket").as("__bucket"))
    val scored = c.join(broadcast(q), Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("__rn").as("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (north-star dedup family):
    * LSH-bucketed candidate generation — only same-bucket (a, b) pairs
    * with a < b are scored — then a cosine threshold. The corpus never
    * self-cross-joins: the bucket equi-join bounds work to colliding
    * pairs, exactly the MinHash-band shape in [[TextDedup]], so the plan
    * scales as O(pairs-in-bucket), not O(n²). */
  def neardupPairs(corpus: DataFrame, vecCol: String, idCol: String,
      planes: Seq[Seq[Double]], threshold: Double, roundTo: Int = 6): DataFrame = {
    val side = corpus.select(col(idCol),
      asDouble(col(vecCol)).as("__v"), norm(col(vecCol)).as("__n"),
      hyperplaneBucket(col(vecCol), planes).as("__bucket"))
    val a = side.alias("a")
    val b = side.alias("b")
    a.join(b, col("a.__bucket") === col("b.__bucket") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cosine", round(
        dot(col("a.__v"), col("b.__v")) / (col("a.__n") * col("b.__n")), roundTo))
      .filter(col("cosine") >= threshold)
      .select(col(s"a.$idCol").as(s"${idCol}_a"),
        col(s"b.$idCol").as(s"${idCol}_b"), col("cosine"))
  }

  /** A prebuilt IVF index. `centroids` — `(cell, vec, nrm)`, tiny, always
    * broadcast. `entries` — `(id, vec, nrm, cell)`, one row per corpus
    * vector with its nearest-centroid cell: at scale THIS assignment IS
    * the index. Both are plain DataFrames so a caller can persist them or
    * write/reload as parquet (entries ideally partitioned by cell) and
    * amortize the build — the dominant cost — across query batches. */
  final case class IvfIndex(centroids: DataFrame, entries: DataFrame)

  /** Nearest-`take` centroid cells for each row of `df` (shared by index
    * build — take=1 — and query probing — take=nProbe). */
  private def nearestCells(df: DataFrame, cents: DataFrame, vecCol: String,
      idCol: String, id: String, take: Int, roundTo: Int): DataFrame = {
    val scored = df
      .select(col(idCol).as(id), asDouble(col(vecCol)).as(s"__v_$id"),
        norm(col(vecCol)).as(s"__n_$id"))
      .join(broadcast(cents.select(col("cell").as("__cent"),
        col("vec").as("__cv"), col("nrm").as("__cn"))), lit(true))
      .withColumn("__cos",
        round(dot(col(s"__v_$id"), col("__cv")) / (col(s"__n_$id") * col("__cn")), roundTo))
    val w = Window.partitionBy(col(id))
      .orderBy(col("__cos").desc, col("__cent").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= take)
      .select(col(id), col(s"__v_$id"), col(s"__n_$id"), col("__cent"))
  }

  /** Sampled-Lloyd centroids for [[buildIvfIndex]]: seed with the
    * first-`nlist` vectors, then run `iterations` Lloyd steps over a
    * DETERMINISTIC hash-sample of the corpus (`crc32(id) % sampleMod ==
    * 0` — reproducible, no RNG; ~1/sampleMod of the rows). Each step
    * broadcasts the tiny centroid frame, assigns the sample to nearest
    * cells, and recomputes per-cell per-dimension means (posexplode →
    * avg → re-assemble); a cell that captured no sample keeps its
    * previous centroid. On a skewed corpus — where first-N seeds all
    * land in one dense region — the moved centroids spread over the
    * real clusters and `nProbe`-bounded recall improves; plan shape is
    * unchanged (this is purely a better `centroids` input).
    *
    * Not the default: the q41/q100 oracles pin the deterministic
    * first-N construction, and a DuckDB oracle cannot reasonably
    * replay Lloyd means. Flag it in via `buildIvfIndex(...,
    * centroids = Some(kmeansCentroids(...)))`. */
  def kmeansCentroids(corpus: DataFrame, vecCol: String, idCol: String,
      nlist: Int, iterations: Int = 1, sampleMod: Int = 4,
      roundTo: Int = 6): DataFrame = {
    require(iterations >= 1 && sampleMod >= 1, "iterations and sampleMod must be >= 1")
    val sample = corpus
      .filter(pmod(crc32(col(idCol).cast("string")), lit(sampleMod)) === 0)
      .select(col(idCol), col(vecCol))
      .persist()
    var cents = corpus.filter(col(idCol) < nlist)
      .select(col(idCol).as("cell"), asDouble(col(vecCol)).as("vec"),
        norm(col(vecCol)).as("nrm"))
    for (_ <- 1 to iterations) {
      val assigned = nearestCells(sample, cents, vecCol, idCol, "id", 1, roundTo)
      val means = assigned
        .select(col("__cent").as("cell"), posexplode(col("__v_id")).as(Seq("__pos", "__x")))
        .groupBy(col("cell"), col("__pos")).agg(avg(col("__x")).as("__m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__m")))),
          e => e("__m")).as("__mv"))
      // localCheckpoint per Lloyd step (the BpeTrainer/dupClusters
      // idiom): each iteration re-derives `cents` from the previous
      // frame, so without a checkpoint the plan nests one join + agg
      // deeper per step — quadratic analysis cost and a re-execution of
      // every prior step at the final action. The centroid frame is
      // nlist rows, so the materialization is trivial; superseded
      // checkpoint blocks are freed to keep storage O(1) iterations.
      val next = cents.alias("c")
        .join(means.alias("m"), Seq("cell"), "left")
        .select(col("cell"),
          coalesce(col("__mv"), col("c.vec")).as("vec"))
        .withColumn("nrm", norm(col("vec")))
        .localCheckpoint()
      val superseded = OpsUtil.ckptRdds(cents)
      cents = next
      superseded.foreach(_.unpersist(blocking = false))
    }
    sample.unpersist()
    cents
  }

  /** Build the IVF index: assign every corpus vector to its nearest of
    * `nlist` coarse centroids in one scan. Default centroids are the
    * first `nlist` corpus vectors — deterministic and
    * oracle-reproducible; pass `centroids = Some(kmeansCentroids(...))`
    * for recall on skewed corpora (changes recall, not the plan
    * shape). A supplied frame must have the `(cell, vec, nrm)` schema. */
  def buildIvfIndex(corpus: DataFrame, vecCol: String, idCol: String,
      nlist: Int, roundTo: Int = 6,
      centroids: Option[DataFrame] = None): IvfIndex = {
    val cents = centroids.getOrElse(
      corpus.filter(col(idCol) < nlist)
        .select(col(idCol).as("cell"), asDouble(col(vecCol)).as("vec"),
          norm(col(vecCol)).as("nrm")))
    IvfIndex(cents, assignToCells(corpus, cents, vecCol, idCol, roundTo))
  }

  /** The assignment half of [[buildIvfIndex]] / [[ivfAppend]] as a
    * standalone batch operation: the `(id, vec, nrm, cell)` postings
    * frame for `df` against a frozen `(cell, vec, nrm)` centroid frame.
    * This is the unit a streaming ingest appends per micro-batch
    * ([[graft.streaming.StreamingEtl.annIngest]]). */
  def assignToCells(df: DataFrame, centroids: DataFrame, vecCol: String,
      idCol: String, roundTo: Int = 6): DataFrame =
    nearestCells(df, centroids, vecCol, idCol, "id", 1, roundTo)
      .select(col("id"), col("__v_id").as("vec"), col("__n_id").as("nrm"),
        col("__cent").as("cell"))

  /** Per-cell cluster-vs-label agreement panel: assign every vector to
    * its nearest centroid (the [[buildIvfIndex]] first-`nlist`
    * convention) and report, per cell, the population, the majority
    * label, and the cell's purity — the audit that tells a clustering
    * whether its cells mean anything ("cell 7 is 92% label 3" vs "cell 7
    * is noise"). Ties on the majority break to the smallest label;
    * assignment ties break to the smallest cell (the [[cellBalance]]
    * convention, so the two panels describe the same partition of the
    * corpus).
    *
    * Scale shape: centroids broadcast; the per-row argmax is a window
    * over `nlist` scored copies (bounded fan-out, window-group-limited);
    * everything after is hash aggregation over the |cells|x|labels|
    * contingency. The label rides through assignment — no join back to
    * the corpus. */
  def clusterLabelAgreement(corpus: DataFrame, vecCol: String, idCol: String,
      labelCol: String, nlist: Int, roundTo: Int = 6): DataFrame = {
    val cl = cellLabelCounts(corpus, vecCol, idCol, labelCol, nlist, roundTo)
    val perCell = cl.groupBy(col("cell"))
      .agg(sum(col("__nck")).as("n_vecs"))
    val top = cl.withColumn("__r", row_number().over(
        Window.partitionBy(col("cell"))
          .orderBy(col("__nck").desc, col("__lab"))))
      .filter(col("__r") === 1)
      .select(col("cell"), col("__lab").as("top_label"),
        col("__nck").as("n_top"))
    perCell.join(top, "cell")
      .select(col("cell"), col("n_vecs"), col("top_label"), col("n_top"),
        round(col("n_top").cast("double") / col("n_vecs").cast("double"),
          roundTo).as("purity"))
  }

  /** One-row clustering-quality summary over the same assignment as
    * [[clusterLabelAgreement]]: overall purity and normalized mutual
    * information `I(C;L) / sqrt(H(C)·H(L))` (nats) between the cell
    * assignment and the label column — purity rewards majority mass,
    * NMI penalizes the degenerate everything-in-one-cell clustering that
    * purity alone can't see. NMI is NULL when either marginal entropy is
    * 0 (a single cell or a single label — agreement is undefined, not
    * perfect).
    *
    * All entropy/MI terms are fixed IEEE sequences from exact long
    * counts, summed over the bounded contingency (the q103 KL
    * precedent). Returns `(n, n_cells, n_labels, purity, nmi)`.
    *
    * The contingency is COLLECTED and the summary computed driver-side
    * (round 17): the frame is bounded by construction (≤ nlist ×
    * |labels| rows — cluster count × categorical label cardinality,
    * metadata-sized; the counted collect fails fast past the bound),
    * and the previous shape derived SEVEN tiny frames from it
    * (marginals, entropies, total, purity, MI) that re-entered as
    * broadcast legs — each leg a separate Spark job, so the query paid
    * ~6 job constants to fold 200 rows of longs. Now: ONE distributed
    * assignment job ends at the counted collect, the entropy/MI folds
    * run on the collected longs in a fixed order (MORE deterministic
    * than the distributed sum they replace), and the 1-row answer
    * re-enters as a LocalRelation (the bounded-metadata discipline:
    * BPE's per-round top merge, covariance's d×d moment fold). */
  def clusterAgreementSummary(corpus: DataFrame, vecCol: String,
      idCol: String, labelCol: String, nlist: Int,
      roundTo: Int = 6): DataFrame = {
    val spark = corpus.sparkSession
    val (rows, _) = OpsUtil.localizedWithRows(
      cellLabelCounts(corpus, vecCol, idCol, labelCol, nlist, roundTo),
      maxRows = 100000, n =>
        s"clusterAgreementSummary: contingency exceeded $n rows " +
          "(nlist x label cardinality; labels must be categorical — " +
          "bucket continuous labels upstream)")
    // (cell, label, count) triples, folded in (cell, label-repr) order so
    // the IEEE sum sequence is fixed across runs; the label stays its
    // native type (int, string, …) and only SORTS by representation.
    // The cell inherits idCol's NUMERIC type (long in every in-repo
    // caller, but int/short/byte id columns are legal inputs), so read
    // it with numeric widening — widening preserves the Long sort order
    // the fold sequence is pinned to (round-18 ADVICE: a bare getLong
    // threw ClassCastException on non-long id columns).
    def cellAsLong(v: Any): Long = v match {
      case l: java.lang.Long => l.longValue
      case i: java.lang.Integer => i.longValue
      case s: java.lang.Short => s.longValue
      case b: java.lang.Byte => b.longValue
      case other => throw new IllegalArgumentException(
        s"clusterAgreementSummary: idCol must be an integral type, got " +
          s"${if (other == null) "null" else other.getClass.getName}")
    }
    val triples = rows.map(r => (cellAsLong(r.get(0)), r.get(1), r.getLong(2)))
      .sortBy(t => (t._1, String.valueOf(t._2)))
    val out: org.apache.spark.sql.Row = if (triples.isEmpty) {
      // empty-corpus contract of the previous aggregation shape:
      // null total/purity/nmi, zero marginal counts
      org.apache.spark.sql.Row(null, 0L, 0L, null, null)
    } else {
      val n = triples.map(_._3).sum
      val nd = n.toDouble
      val byCell = triples.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (c, ts) => (c, ts.map(_._3).sum, ts.map(_._3).max) }
      val byLab = triples.groupBy(_._2).toSeq
        .sortBy(t => String.valueOf(t._1))
        .map { case (l, ts) => (l, ts.map(_._3).sum) }
      def h(counts: Seq[Long]): Double =
        counts.map { c => val p = c.toDouble / nd; -p * math.log(p) }.sum
      val hc = h(byCell.map(_._2))
      val hl = h(byLab.map(_._2))
      val ncOf = byCell.map(t => t._1 -> t._2).toMap
      val nlOf = byLab.toMap
      val mi = triples.map { case (c, l, nck) =>
        (nck.toDouble / nd) * math.log(
          nck.toDouble * nd / (ncOf(c).toDouble * nlOf(l).toDouble))
      }.sum
      def r6(x: Double): java.lang.Double = java.lang.Double.valueOf(
        BigDecimal(x).setScale(roundTo, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      org.apache.spark.sql.Row(java.lang.Long.valueOf(n),
        byCell.size.toLong, byLab.size.toLong,
        r6(byCell.map(_._3).sum.toDouble / nd),
        if (hc > 0 && hl > 0) r6(mi / math.sqrt(hc * hl)) else null)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("n_cells",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_labels",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("purity",
        org.apache.spark.sql.types.DoubleType, nullable = true),
      org.apache.spark.sql.types.StructField("nmi",
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(out)), schema)
  }

  /** Shared contingency for the cluster-agreement pair: nearest-centroid
    * assignment (label carried through) collapsed to per-(cell, label)
    * counts. */
  private def cellLabelCounts(corpus: DataFrame, vecCol: String,
      idCol: String, labelCol: String, nlist: Int,
      roundTo: Int): DataFrame = {
    val cents = corpus.filter(col(idCol) < nlist)
      .select(col(idCol).as("__cent"), asDouble(col(vecCol)).as("__cv"),
        norm(col(vecCol)).as("__cn"))
    corpus
      .select(col(idCol).as("__id"), col(labelCol).as("__lab"),
        asDouble(col(vecCol)).as("__v"), norm(col(vecCol)).as("__n0"))
      .join(broadcast(cents), lit(true))
      .withColumn("__cos", round(
        dot(col("__v"), col("__cv")) / (col("__n0") * col("__cn")), roundTo))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__id"))
          .orderBy(col("__cos").desc, col("__cent"))))
      .filter(col("__rn") === 1)
      .groupBy(col("__cent").as("cell"), col("__lab"))
      .agg(count(lit(1)).as("__nck"))
  }

  /** Incremental index maintenance: assign ONLY the new vectors to the
    * existing (frozen) centroids and append their postings — the
    * standard production shape for a growing corpus, where re-running
    * [[buildIvfIndex]] would re-pay the full 100 TB assignment scan for
    * a 0.1% daily delta. Because the centroids are unchanged, the
    * appended index is IDENTICAL to a fresh build over base ∪ delta
    * with the same centroid frame (assignment is per-row), so searches
    * need no special casing; what appending does NOT do is re-balance —
    * monitor with [[cellBalance]] and rebuild centroids when drift
    * (cells absorbing a disproportionate share of appends) crosses the
    * line. */
  def ivfAppend(index: IvfIndex, newVecs: DataFrame, vecCol: String,
      idCol: String, roundTo: Int = 6): IvfIndex =
    IvfIndex(index.centroids, index.entries.unionByName(
      assignToCells(newVecs, index.centroids, vecCol, idCol, roundTo)))

  /** Search a prebuilt [[IvfIndex]]: each query probes its `nProbe`
    * nearest cells and is scored exactly against only those cells'
    * entries. */
  def ivfSearch(index: IvfIndex, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, nProbe: Int,
      roundTo: Int = 6): DataFrame = {
    val cells = index.entries.select(col("id").as("neighbor_id"),
      col("vec").as("__v_neighbor_id"), col("nrm").as("__n_neighbor_id"),
      col("cell").as("__cent"))
    val probes = nearestCells(queries, index.centroids, vecCol, idCol,
      "query_id", nProbe, roundTo)
    val scored = cells.join(probes, Seq("__cent"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(
        dot(col("__v_query_id"), col("__v_neighbor_id")) /
          (col("__n_query_id") * col("__n_neighbor_id")), roundTo))
      // The same neighbor can surface via several probed cells; keep one.
      .select("query_id", "neighbor_id", "cosine").distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("__rn").as("rank"))
  }

  /** IVF-style ANN (the classic inverted-file index, cf. Jégou et al.'s
    * IVFADC construction), one-shot: [[buildIvfIndex]] + [[ivfSearch]].
    * Batch workloads should build once, persist `index.entries`, and
    * search many times — rebuilding the assignment per call re-pays the
    * full corpus scan, the dominant cost at scale.
    *
    * Scale posture: centroids broadcast everywhere (tiny); the search
    * join hits only probed cells (`nProbe/nlist` of the corpus per
    * query); the corpus shuffles once on cell id at index build. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, nlist: Int, nProbe: Int,
      roundTo: Int = 6): DataFrame =
    ivfSearch(buildIvfIndex(corpus, vecCol, idCol, nlist, roundTo),
      queries, vecCol, idCol, k, nProbe, roundTo)

  /** Hard-negative mining for contrastive training: per query, the `k`
    * HIGHEST-cosine neighbors whose similarity falls in
    * `[negLo, negHi)` — close enough to be confusable (the negatives
    * that actually move a contrastive loss), but strictly below the
    * near-duplicate band `>= negHi` (mining a paraphrase as a negative
    * actively teaches the model the wrong thing — the reason this is
    * NOT just ANN-top-k: the band filter must run BEFORE the per-query
    * ranking, or duplicates crowd the k slots out).
    *
    * Scale shape: identical to [[ivfSearch]] — centroids broadcast,
    * each query scored only against its `nProbe` probed cells, one
    * window over the per-query candidate band for the top-k. The same
    * rounded-cosine id-tie-broken total order as every other ranking
    * here, so a SQL oracle reproduces the exact pair set. */
  def hardNegatives(index: IvfIndex, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, nProbe: Int,
      negHi: Double, negLo: Double = -1.0, roundTo: Int = 6): DataFrame = {
    require(negLo < negHi, s"negLo must be < negHi: [$negLo, $negHi)")
    val cells = index.entries.select(col("id").as("neighbor_id"),
      col("vec").as("__v_neighbor_id"), col("nrm").as("__n_neighbor_id"),
      col("cell").as("__cent"))
    val probes = nearestCells(queries, index.centroids, vecCol, idCol,
      "query_id", nProbe, roundTo)
    val banded = cells.join(probes, Seq("__cent"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(
        dot(col("__v_query_id"), col("__v_neighbor_id")) /
          (col("__n_query_id") * col("__n_neighbor_id")), roundTo))
      .filter(col("cosine") >= negLo && col("cosine") < negHi)
      .select("query_id", "neighbor_id", "cosine").distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    banded.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("__rn").as("rank"))
  }

  /** Deterministic pseudo-random unit-ish hyperplanes from a seed (golden-
    * ratio lattice — no RNG dependency, reproducible across engines). */
  def deterministicPlanes(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map { p =>
      (0 until dim).map { i =>
        val x = math.sin((p * dim + i + 1) * 12.9898) * 43758.5453
        2.0 * (x - math.floor(x)) - 1.0
      }
    }

  /** Leave-one-out kNN label-agreement audit — the label-noise detector
    * for labeled embedding sets (the cleanlab-style check run before a
    * classifier or a label-conditioned sampler trusts the labels): for
    * each probe vector, do its k nearest neighbors (self excluded) vote
    * for its recorded label? Per label: probes audited, probes whose
    * neighbor-majority agrees, and the agreement rate. Labels with low
    * agreement are either mislabeled slices or genuinely entangled
    * classes — both worth a human look before training.
    *
    * The vote is the neighbor-label majority with deterministic ties:
    * more votes → nearer best-ranked neighbor → smaller label value.
    * Neighbor ranking reuses [[bruteForceTopK]]'s rounded-cosine,
    * id-tie-broken total order, so any SQL oracle reproduces the exact
    * neighbor sets.
    *
    * Scale shape: probes broadcast (audit a sample, not the corpus —
    * the |probes| × |corpus| score pass is the same single corpus scan
    * as [[bruteForceTopK]]); the label lookup joins the tiny
    * |probes|·k neighbor frame against the corpus projection, and the
    * vote/agreement reductions run over |probes| rows. Swap the
    * brute-force neighbor search for [[ivfSearch]]/[[lshSearch]] over a
    * prebuilt index when auditing at full-corpus width. */
  def knnLabelAgreement(vecs: DataFrame, probes: DataFrame, vecCol: String,
      idCol: String, labelCol: String, k: Int): DataFrame = {
    val labels = vecs.select(col(idCol), col(labelCol))
    val voted = bruteForceTopK(vecs, probes, vecCol, idCol, k)
      .join(labels.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("__nl")), "neighbor_id")
      .groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("__votes"), min(col("rank")).as("__best"))
      .withColumn("__vr", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("__votes").desc, col("__best").asc, col("__nl").asc)))
      .filter(col("__vr") === 1)
    voted
      .join(labels.select(col(idCol).as("query_id"),
        col(labelCol).as("__own")), "query_id")
      .groupBy(col("__own").as(labelCol))
      .agg(
        count(lit(1)).as("n_probes"),
        sum(when(col("__nl") === col("__own"), 1L).otherwise(0L)).as("n_agree"))
      .withColumn("agreement",
        round(col("n_agree").cast("double") / col("n_probes"), 6))
  }

  /** Embedding-table health audit, per label: vector count, dimension
    * spread (a ragged dim column means a broken encoder batch), zero
    * vectors (failed encodes — they poison cosine math with NaN), and the
    * mean L2 norm (un-normalized embeddings shift similarity thresholds).
    * The first panel to run before any ANN/dedup job trusts a new
    * embedding dump. Norms accumulate via the repo-wide exact-decimal
    * convention, so the mean is order-independent and oracle-exact.
    *
    * Scale shape: one codegen'd per-row projection (norm + dim), one hash
    * aggregation on the label — map-side partials collapse everything;
    * no joins, no windows. */
  def embeddingAudit(embeds: DataFrame, vecCol: String, idCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val nrm = norm(col(vecCol))
    embeds
      .select(col(labelCol), size(col(vecCol)).cast("long").as("__dim"),
        nrm.cast(DecimalType(18, 9)).as("__nrm"))
      .groupBy(col(labelCol))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("__dim")).as("dim_min"),
        max(col("__dim")).as("dim_max"),
        sum(when(col("__nrm") === 0, 1L).otherwise(0L)).as("n_zero"),
        // cast the EXACT decimal sum to double before dividing: decimal
        // division scale rules differ across engines, double division
        // doesn't (the sum stays under 2^53 ulp-exact far past any
        // realistic label population)
        (sum(col("__nrm")).cast("double") / count(lit(1))).as("avg_norm"))
      .select(col(labelCol), col("n_vecs"), col("dim_min"), col("dim_max"),
        col("n_zero"), round(col("avg_norm"), 6).as("avg_norm"))
  }

  /** Quantization-balance audit of an IVF-style coarse assignment: every
    * vector goes to its highest-cosine centroid (the [[buildIvfIndex]]
    * assignment — first `nlist` vectors as deterministic centroids), and
    * each cell reports its population, population share, and mean
    * centroid cosine — the panel that decides whether an index needs
    * re-clustering (empty/overfull cells) or more probes (low mean
    * cosine = wide cells). Decimal-accumulated means, oracle-exact.
    *
    * Scale shape: centroids broadcast (tiny), the corpus never shuffles
    * until it has collapsed to per-cell partials: the argmax-by-cell is
    * a per-row window over `nlist` scored copies — bounded fan-out — and
    * the final aggregation is |cells| rows. */
  def cellBalance(corpus: DataFrame, vecCol: String, idCol: String,
      nlist: Int, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val idx = buildIvfIndex(corpus, vecCol, idCol, nlist, roundTo)
    val cents = idx.centroids.select(col("cell"), col("vec").as("__cv"),
      col("nrm").as("__cn"))
    val assigned = idx.entries
      .join(broadcast(cents), "cell")
      .select(col("cell"),
        round(dot(col("vec"), col("__cv")) / (col("nrm") * col("__cn")), roundTo)
          .cast(DecimalType(18, 9)).as("__cos"))
    val total = corpus.agg(count(lit(1)).as("__total"))
    assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        // decimal-sum → double BEFORE dividing (see embeddingAudit)
        (sum(col("__cos")).cast("double") / count(lit(1))).as("mean_cos"))
      .crossJoin(broadcast(total))
      .select(col("cell"), col("n_vecs"),
        round(col("n_vecs").cast("double") / col("__total"), roundTo).as("share"),
        round(col("mean_cos"), roundTo).as("mean_cos"))
  }

  /** Per-label cluster-quality panel: cohesion (mean cosine of each
    * vector to its own label centroid) and separation (the nearest OTHER
    * label centroid by cosine). A label whose cohesion is low is
    * internally incoherent (mixed concepts under one name); a pair of
    * labels whose centroids are mutually nearest at high cosine are
    * duplicates of each other — the class-taxonomy audit that tells a
    * labeling effort where to split and where to merge (the
    * [[knnLabelAgreement]] panel's geometric sibling: that one scores
    * individual rows, this one scores the label scheme itself).
    *
    * Centroids are kept as per-dimension SUMS, never divided by the
    * count — cosine is scale-invariant, so cos(sum) = cos(mean) and the
    * division (a per-label float that the oracle would have to
    * reproduce bit-for-bit) simply never happens. Zero vectors are
    * excluded from cohesion (their cosine is undefined; they are
    * [[embeddingAudit]]'s finding, not this panel's).
    *
    * Scale shape: the corpus-order work is two exploded-sum aggregations
    * (centroid sums; per-vector dot products against the broadcast
    * centroid frame) — the explode is re-run for the second pass rather
    * than persisting a corpus×dim frame (the [[CorpusStats.lmLogProb]]
    * economics). Everything else — norms, the |labels|² pairwise
    * centroid matrix, the nearest-neighbor window — rides frames no
    * bigger than |labels| × dim. Per-dimension double sums are rounded
    * to 6 decimals only at the final cosines, the repo's
    * float-association convention (the q103 precedent). */
  def labelSeparation(embeds: DataFrame, vecCol: String, idCol: String,
      labelCol: String): DataFrame = {
    val v = embeds.select(col(labelCol).as("__l"), col(idCol).as("__id"),
        posexplode(col(vecCol)).as(Seq("__i", "__xf")))
      .select(col("__l"), col("__id"), col("__i"),
        col("__xf").cast("double").as("__x"))
    val cs = v.groupBy(col("__l"), col("__i")).agg(sum(col("__x")).as("__s"))
    val cn = cs.groupBy(col("__l")).agg(sum(col("__s") * col("__s")).as("__n2"))
    val dots = cs.select(col("__l").as("__la"), col("__i"), col("__s").as("__sa"))
      .join(cs.select(col("__l").as("__lb"), col("__i"), col("__s").as("__sb")), "__i")
      .filter(col("__la") =!= col("__lb"))
      .groupBy(col("__la"), col("__lb"))
      .agg(sum(col("__sa") * col("__sb")).as("__dot"))
    val near = dots
      .join(cn.select(col("__l").as("__la"), col("__n2").as("__na")), "__la")
      .join(cn.select(col("__l").as("__lb"), col("__n2").as("__nb")), "__lb")
      .withColumn("__c", col("__dot") / (sqrt(col("__na")) * sqrt(col("__nb"))))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__la")).orderBy(col("__c").desc, col("__lb"))))
      .filter(col("__rn") === 1)
      .select(col("__la").as("__l"), col("__lb").as("nearest_label"),
        round(col("__c"), 6).as("nearest_cos"))
    val dv = v.join(broadcast(cs), Seq("__l", "__i"))
      .groupBy(col("__l"), col("__id"))
      .agg(sum(col("__x") * col("__s")).as("__dot"),
        sum(col("__x") * col("__x")).as("__vn2"))
      .filter(col("__vn2") > 0.0)
    val coh = dv.join(broadcast(cn), "__l")
      .groupBy(col("__l"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("__dot") / (sqrt(col("__vn2")) * sqrt(col("__n2")))), 6)
          .as("cohesion"))
    coh.join(near, "__l")
      .select(col("__l").as(labelCol), col("n_vecs"), col("cohesion"),
        col("nearest_label"), col("nearest_cos"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): embedding-space
    * deduplication by CLUSTER-BOUNDED pairwise cosine — assign every
    * vector to its nearest coarse centroid ([[buildIvfIndex]], one scan,
    * centroids broadcast), then compare pairs only WITHIN a cell and
    * flag each vector that has a lower-id cell-mate at cosine ≥
    * `threshold` as a duplicate of the smallest such id. The cluster
    * step is what makes semantic dedup tractable: all-pairs cosine is
    * O(n²) over the corpus, within-cell pairs are O(Σ|cell|²) — bounded
    * by the clustering, and guarded here (`maxCell`) so one degenerate
    * mega-cell fails fast instead of silently exploding the shuffle.
    *
    * Keeper election is min-id-per-ball (the paper keeps one random
    * representative; min-id is the deterministic choice every engine
    * reproduces). Emits one row per vector: cell, is_dup, dup_of. */
  def semanticDedup(corpus: DataFrame, vecCol: String, idCol: String,
      nlist: Int, threshold: Double, roundTo: Int = 6,
      centroids: Option[DataFrame] = None,
      maxCell: Long = 100000L): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1]: $threshold")
    require(maxCell > 0, "maxCell must be positive")
    val e = buildIvfIndex(corpus, vecCol, idCol, nlist, roundTo, centroids)
      .entries
    val counts = e.groupBy(col("cell")).agg(count(lit(1)).as("__cnt"))
    val guarded = e.join(broadcast(counts), "cell")
      .where(OpsUtil.orRaise(col("__cnt") <= maxCell,
        lit(s"semanticDedup: cell "), col("cell"),
        lit(s" holds "), col("__cnt"),
        lit(s" vectors (> maxCell=$maxCell); use better centroids or raise maxCell")))
    val a = guarded.select(col("cell"), col("id").as("id_a"),
      col("vec").as("__va"), col("nrm").as("__na"))
    val b = guarded.select(col("cell"), col("id").as("id_b"),
      col("vec").as("__vb"), col("nrm").as("__nb"))
    val dupOf = a.join(b, "cell")
      .filter(col("id_b") < col("id_a"))
      .withColumn("__cos",
        round(dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")), roundTo))
      .filter(col("__cos") >= threshold)
      .groupBy(col("id_a")).agg(min(col("id_b")).as("dup_of"))
    e.select(col("id").as(idCol), col("cell"))
      .join(dupOf.withColumnRenamed("id_a", idCol), Seq(idCol), "left")
      .withColumn("is_dup", col("dup_of").isNotNull)
      .select(col(idCol), col("cell"), col("is_dup"), col("dup_of"))
  }

  /** Incremental SemDeDup probe — [[semanticDedup]]'s batch-vs-index
    * form (the q77 build/probe split in embedding space): a batch of
    * new vectors is assigned to the FROZEN centroids and compared only
    * against the standing index's members of the SAME cell; a batch
    * vector with any index cell-mate at cosine ≥ `threshold` is a
    * duplicate of the smallest such index id. The index is
    * [[assignToCells]] output `(id, vec, nrm, cell)` — the corpus is
    * never re-embedded, never re-assigned, never re-scanned beyond the
    * probed cells.
    *
    * Batch-INTERNAL near-dups are deliberately out of scope (both
    * members are novel vs the index — the [[semanticDedup]] batch pass
    * handles self-duplicating ingest), mirroring
    * [[graft.streaming.StreamingEtl.dedupIngest]]'s contract.
    *
    * Emits one row per batch vector: `(idCol, cell, is_dup, dup_of)`
    * — [[semanticDedup]]'s verdict contract, so downstream removal
    * passes are interchangeable.
    *
    * Scale shape: centroids broadcast (bounded by nlist); the probe is
    * an equi-join on `cell` — with the index parquet written
    * cell-partitioned ([[Maintenance.compactIvfIndex]]'s layout) the
    * join prunes to the batch's cells and never shuffles the standing
    * index; `maxCell` fails fast on a degenerate mega-cell exactly as
    * [[semanticDedup]] does (the all-pairs failure mode is fenced, not
    * inherited). */
  def semanticDedupIncremental(batch: DataFrame, index: DataFrame,
      centroids: DataFrame, vecCol: String, idCol: String,
      threshold: Double, roundTo: Int = 6,
      maxCell: Long = 100000L): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1]: $threshold")
    require(maxCell > 0, "maxCell must be positive")
    val asg = assignToCells(batch, centroids, vecCol, idCol, roundTo)
    val counts = index.groupBy(col("cell")).agg(count(lit(1)).as("__cnt"))
    val guarded = index.join(broadcast(counts), "cell")
      .where(OpsUtil.orRaise(col("__cnt") <= maxCell,
        lit(s"semanticDedupIncremental: cell "), col("cell"),
        lit(s" holds "), col("__cnt"),
        lit(s" vectors (> maxCell=$maxCell); use better centroids or " +
          "raise maxCell")))
    asg.select(col("cell"), col("id"),
        col("vec").as("__va"), col("nrm").as("__na"))
      // LEFT join: a batch vector landing in an empty cell is still a
      // verdict row (is_dup = false), not a dropped record
      .join(guarded.select(col("cell"), col("id").as("__ib"),
        col("vec").as("__vb"), col("nrm").as("__nb")), Seq("cell"), "left")
      .withColumn("__cos", when(col("__ib").isNotNull,
        round(dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")),
          roundTo)))
      .groupBy(col("id"), col("cell"))
      .agg(min(when(col("__cos") >= threshold, col("__ib"))).as("dup_of"))
      .select(col("id").as(idCol), col("cell"),
        col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
  }

  /** Recall@k of an approximate top-k table against the exact baseline —
    * the retrieval-quality gate every ANN deployment needs before the
    * exact path is switched off: per query, the fraction of true top-k
    * neighbors the approximate index returned. Inputs are any two
    * (query, neighbor) top-k frames (e.g. [[bruteForceTopK]] vs
    * [[lshTopK]] / [[ivfTopK]]).
    *
    * Scale shape: one equi-join on (query, neighbor) — the k-row-per-
    * query frames are tiny relative to the corpus that produced them —
    * then a per-query count. AQE broadcasts the approximate side. */
  def recallAtK(exact: DataFrame, approx: DataFrame, queryCol: String,
      neighborCol: String): DataFrame = {
    val hit = approx.select(col(queryCol), col(neighborCol))
      .withColumn("__hit", lit(1L))
    exact.select(col(queryCol), col(neighborCol))
      .join(hit, Seq(queryCol, neighborCol), "left")
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .select(col(queryCol), col("n_exact"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_exact").cast("double"), 6)
          .as("recall"))
  }

  /** Embedding-space outliers by distance to the corpus centroid — the
    * cheap first screen for mis-embedded rows (all-zero vectors, wrong
    * normalization, foreign-model leakage) before any clustering.
    * Returns the top `k` `(idCol, dist)` by Euclidean distance to the
    * per-dimension mean vector.
    *
    * Exactness: the centroid comes from per-dimension decimal-quantized
    * sums ([[graft.expressions.VectorUnscaledSum]] at scale 6 — ONE
    * aggregate carrying exact integer folds, bit-identical to the
    * per-column `sum(unscaledLong(element_at(...)))` form it replaced),
    * and the distance is the codegen'd strict-index-order
    * [[VectorFunctions.dot]] fold of the per-row difference vector —
    * every double is one fixed IEEE op sequence from exact sums,
    * oracle-reproducible.
    *
    * Scale shape: one map-side-combined 1-row aggregation (a 2·dim-long
    * buffer), whose single row is bounded metadata — read on the driver
    * and re-entered as a LITERAL mean vector (the previous broadcast
    * cross-join re-evaluated the 64-wide mean array expression per row
    * and dragged the agg lineage into the probe plan) — then a
    * shuffle-free per-row distance pass and a TakeOrderedAndProject
    * top-k. */
  def centroidOutliers(embeds: DataFrame, vecCol: String, idCol: String,
      dim: Int, k: Int): DataFrame = {
    require(dim >= 1 && k >= 1, s"need dim >= 1 and k >= 1: dim=$dim k=$k")
    val v = asDouble(col(vecCol))
    val stats = embeds.agg(count(lit(1)).as("__n"),
      graft.functions.VectorFunctions.vectorUnscaledSum(v, dim, 6)
        .as("__sv")).collect()(0)
    // driver fold of the mean, replicating the old expression exactly:
    // exact decimal·10^-6 → nearest double → one IEEE division by n
    val n = stats.getLong(0).toDouble
    val sv = stats.getSeq[Any](1)
    val meanArr = array((0 until dim).map { i =>
      sv(i) match {
        case null => lit(null).cast("double")
        case s: java.lang.Long => lit(java.math.BigDecimal
          .valueOf(s.longValue()).movePointLeft(6).doubleValue() / n)
      }
    }: _*)
    embeds
      .select(col(idCol), meanArr.as("__mv"), v.as("__v"))
      .withColumn("__d", zip_with(col("__v"), col("__mv"), (a, b) => a - b))
      .select(col(idCol), round(sqrt(dot(col("__d"), col("__d"))), 6).as("dist"))
      .orderBy(col("dist").desc, col(idCol).asc)
      .limit(k)
  }

  /** Exact population covariance matrix over the leading `dims`
    * embedding dimensions — the input both to drift monitoring
    * ("did the embedding model's output geometry move?") and to
    * [[topPrincipalComponent]]'s power iteration. Returns the upper
    * triangle as rows `(i, j, n, cov)`, 0-based, i ≤ j.
    *
    * Exactness: each value quantizes to an unscaled long at `scale`
    * ([[graft.functions.Decimals.unscaledLong]], the
    * [[centroidOutliers]] convention); cross-products accumulate in
    * DECIMAL(38,0) (a q·q product already fills 2·scale digits — a
    * long buffer would overflow near 10^6 rows at scale 6); the
    * numerator `n·Sij − Si·Sj` is an exact integer and only the final
    * division is IEEE.
    *
    * Scale shape: ONE 1-row map-side-combined aggregation carrying
    * `dims·(dims+3)/2` buffers — no explode, no shuffle of data rows.
    * The buffer count is the quadratic term, so `dims` is capped
    * (lead dims of a wide embedding are the drift-sensitive ones; a
    * full-width matrix at d=1024 belongs to a block-wise variant). */
  def embeddingCovariance(embeds: DataFrame, vecCol: String, dims: Int,
      scale: Int = 6): DataFrame = {
    require(dims >= 2 && dims <= 16,
      s"dims must be in [2,16] (${dims * (dims + 1) / 2} pair buffers " +
        "at 16 already): use a block-wise variant beyond that")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = asDouble(col(vecCol))
    val q = (0 until dims).map(i => graft.functions.Decimals
      .unscaledLong(element_at(v, i + 1), scale))
    val pairs = for { i <- 0 until dims; j <- i until dims } yield (i, j)
    val aggs =
      (0 until dims).map(i => sum(q(i)).cast(dec38).as(s"__s$i")) ++
        pairs.map { case (i, j) =>
          sum(q(i).cast(dec38) * q(j).cast(dec38)).as(s"__p${i}_$j") }
    val stats = embeds.agg(count(lit(1)).as("__n"), aggs: _*)
    val pow2 = math.pow(10, 2 * scale)
    val rows = pairs.map { case (i, j) =>
      val num = (col("__n").cast(dec38) * col(s"__p${i}_$j") -
        col(s"__s$i") * col(s"__s$j"))
      struct(lit(i).as("i"), lit(j).as("j"), col("__n").as("n"),
        round(num.cast("double") /
          (col("__n").cast("double") * col("__n").cast("double") * lit(pow2)),
          9).as("cov"))
    }
    stats.select(inline(array(rows: _*)))
  }

  /** Dominant eigenvector of a [[embeddingCovariance]] matrix by power
    * iteration — the data-driven 1-D projection ([[Features]]' JL
    * projection is its oblivious cousin). The cov matrix is bounded
    * driver metadata (≤ 16×16 by the covariance cap), so the iteration
    * runs locally; the returned unit vector is deterministic: it starts
    * from the normalized all-ones vector and the sign convention makes
    * the largest-|component| coordinate positive.
    *
    * Scale posture: the DISTRIBUTED work ended inside
    * [[embeddingCovariance]]'s one-pass aggregation; iterating on a
    * d×d matrix driver-side is the documented bounded-metadata idiom
    * (the [[BpeTrainer]] 1-row election, the Bloom sketch bytes). */
  def topPrincipalComponent(cov: DataFrame, dims: Int,
      iterations: Int = 50): Array[Double] = {
    require(iterations >= 1, "iterations must be >= 1")
    val m = Array.ofDim[Double](dims, dims)
    // an empty input frame yields n = 0 rows with NULL cov — skip them
    // (the matrix stays zero and the degenerate branch below returns the
    // start vector) instead of throwing on getDouble
    cov.select(col("i"), col("j"), col("cov")).collect().foreach { r =>
      if (!r.isNullAt(2)) {
        val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
        m(i)(j) = c
        m(j)(i) = c
      }
    }
    var vec = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    var it = 0
    var converged = false
    while (it < iterations && !converged) {
      val next = Array.tabulate(dims)(i =>
        (0 until dims).map(j => m(i)(j) * vec(j)).sum)
      val nrm = math.sqrt(next.map(x => x * x).sum)
      if (nrm == 0.0) return vec // degenerate (zero matrix): keep start
      val scaled = next.map(_ / nrm)
      // EXACT fixed-point convergence check: once the normalized vector
      // reproduces itself bit-for-bit, every further iteration is a
      // no-op, so early exit provably cannot diverge from a fixed-count
      // reference (an epsilon tolerance here would — the remaining
      // iterations could drift a value across a rounding boundary)
      converged = scaled.sameElements(vec)
      vec = scaled
      it += 1
    }
    val kMax = vec.indices.maxBy(i => math.abs(vec(i)))
    if (vec(kMax) < 0) vec.map(-_) else vec
  }

  /** Projection of each embedding onto a fixed component vector (e.g.
    * [[topPrincipalComponent]]'s output): `(idCol, score)` with the
    * codegen'd strict-index-order dot fold. The component broadcasts as
    * a literal — the per-row work never shuffles. */
  def pcProject(embeds: DataFrame, vecCol: String, idCol: String,
      component: Array[Double]): DataFrame = {
    val lits = array(component.map(lit(_)): _*)
    embeds.select(col(idCol),
      round(dot(asDouble(col(vecCol)), lits), 6).as("score"))
  }

  /** Simplified (centroid-based) silhouette per cluster — the
    * clustering-quality read that complements purity/NMI (which need
    * ground-truth labels): `s = (b − a) / max(a, b)` with `a` the
    * distance to the OWN cluster centroid and `b` the distance to the
    * nearest OTHER centroid (Hruschka's simplified variant — the exact
    * silhouette's all-pairs a/b is the O(n²) formulation that cannot
    * ship at corpus scale). Mean s per cluster; a cluster whose mean
    * drops toward 0 is overlapping its neighbor.
    *
    * Exactness: centroids come from per-dimension decimal-quantized
    * sums per cluster (the [[centroidOutliers]] convention — scale-6
    * unscaled longs, exact integer folds, one rounding per mean);
    * distances are the codegen'd strict-index-order [[VectorFunctions
    * .dot]] fold; `b` is an exact min; the final mean's cross-engine
    * fold noise (~1e-12 at these magnitudes) sits far below round(,6).
    *
    * Scale shape: one map-side-combined hash agg to the cluster frame
    * (k rows × dim buffers), which is then LOCALIZED — k ≤ `maxClusters`
    * by a counted fail-fast, so the collect is bounded metadata, and the
    * driver fold of means/norms keeps the 64-wide expression trees out
    * of every downstream optimizer pass — then one broadcast of the
    * k-row local relation into the per-row pass, one hash agg back to k
    * rows. Row count never multiplies beyond ×k. */
  def simplifiedSilhouette(embeds: DataFrame, vecCol: String,
      idCol: String, labelCol: String, dim: Int,
      maxClusters: Int = 64): DataFrame = {
    require(dim >= 1, s"dim must be >= 1: $dim")
    val v = asDouble(col(vecCol))
    val cents = embeds
      .filter(col(labelCol).isNotNull)
      .groupBy(col(labelCol).as("__cl"))
      .agg(count(lit(1)).as("__n"),
        graft.functions.VectorFunctions.vectorUnscaledSum(v, dim, 6)
          .as("__sv"))
    // The centroid frame is ≤ maxClusters rows BY CONTRACT — localize
    // it (counted collect, the bounded-metadata idiom) and fold the
    // means driver-side. The previous distributed form re-entered the
    // 64-wide mean/dot expression trees into the broadcast leg AND the
    // final plan: ~1 s of pure optimizer mass on a k-row frame
    // (round-12 verdict's 4th-largest constant). The arithmetic below
    // replicates the distributed ops bit-for-bit: exact unscaled-long
    // sum → exact scale-6 decimal (movePointLeft = Decimal÷10^6) →
    // nearest double (doubleValue = Decimal.toDouble) → one IEEE
    // division by n; __cc is DotProduct's strict-index-order fold.
    val (crows, _) = OpsUtil.localizedWithRows(cents, maxClusters, n =>
      s"simplifiedSilhouette: $n clusters (> maxClusters=" +
        s"$maxClusters); the k-way centroid pass is quadratic in k")
    val centroidRows = crows.toSeq.map { r =>
      val n = r.getLong(1).toDouble
      val sv = r.getSeq[Any](2)
      val cv: Array[Any] = Array.tabulate(dim) { i =>
        sv(i) match {
          case null => null
          case s: java.lang.Long => java.lang.Double.valueOf(
            java.math.BigDecimal.valueOf(s.longValue())
              .movePointLeft(6).doubleValue() / n)
        }
      }
      val cc: Any =
        if (cv.contains(null)) null
        else {
          var s = 0.0
          var i = 0
          while (i < dim) {
            val x = cv(i).asInstanceOf[java.lang.Double].doubleValue()
            s += x * x
            i += 1
          }
          java.lang.Double.valueOf(s)
        }
      org.apache.spark.sql.Row(r.get(0), cv.toSeq, cc)
    }
    val centroids = embeds.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(centroidRows).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        cents.schema("__cl").copy(name = "__cl"),
        org.apache.spark.sql.types.StructField("__cv",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType), nullable = false),
        org.apache.spark.sql.types.StructField("__cc",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
    val rows = embeds
      .filter(col(labelCol).isNotNull)
      .select(col(labelCol).as("__l"), v.as("__v"),
        col(idCol).as("__rid"))
      .withColumn("__vv", dot(col("__v"), col("__v")))
    // ONE pass over rows × the ≤maxClusters broadcast centroid frame
    // (bounded fan-out, not a cartesian risk): a and min-other-b fall
    // out of the same conditional aggregation, replacing the previous
    // own-join + other-join + rid-rejoin three-pass shape. Distance via
    // the norm identity ‖v−c‖² = v·v − 2 v·c + c·c with both norms
    // hoisted (once per row / per centroid), so the per-pair work is a
    // single codegen'd DotProduct — no per-pair zip_with allocation
    // (the bruteForceL2TopK construction). The identity cancels
    // catastrophically when v ≈ c (the own-centroid case): the residue
    // is ~(v·v + c·c)·ulp and its sqrt (~1e-5) is NOT absorbed by
    // round(,6), so computed d² at or below (v·v + c·c)·1e-12 is
    // zeroed BEFORE the sqrt — a true distance that small is
    // ~1e-6·‖v‖, indistinguishable from 0 at the rounded output
    // precision, and zeroing keeps the max(a,b)==0 branch exact for
    // points sitting on their centroid. round(,6) on the outputs
    // absorbs the remaining fold-order drift per repo convention.
    val perRow = rows.crossJoin(broadcast(centroids))
      .select(col("__rid"), col("__l"),
        (col("__l") === col("__cl")).as("__own"),
        (col("__vv") - dot(col("__v"), col("__cv")) * 2 + col("__cc"))
          .as("__d2"),
        ((col("__vv") + col("__cc")) * lit(1e-12)).as("__eps"))
      .select(col("__rid"), col("__l"), col("__own"),
        sqrt(when(col("__d2") <= col("__eps"), lit(0.0))
          .otherwise(col("__d2"))).as("__d"))
      .groupBy(col("__rid"), col("__l"))
      .agg(min(when(col("__own"), col("__d"))).as("__a"),
        min(when(!col("__own"), col("__d"))).as("__b"))
    perRow
      .withColumn("__s",
        when(col("__b").isNull, lit(null).cast("double"))
          .when(greatest(col("__a"), col("__b")) === 0.0, lit(0.0))
          .otherwise((col("__b") - col("__a")) /
            greatest(col("__a"), col("__b"))))
      .groupBy(col("__l").as("cluster"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("__s")), 6).as("mean_silhouette"),
        round(avg(col("__a")), 6).as("mean_dist_own"),
        round(avg(col("__b")), 6).as("mean_dist_other"))
  }
}
