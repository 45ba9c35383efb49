package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Similarity search over embedding columns (`ArrayType(FloatType)`).
  *
  * Three tiers, as a 100 TB design demands:
  *   - [[bruteForceTopK]]: exact cosine top-k for ONE query vector —
  *     broadcast the query, one scan, TakeOrderedAndProject (per-partition
  *     top-k + k-way merge; no global sort, no shuffle of the corpus).
  *   - [[ivfTopK]]: cell-partitioned approximate search — probe-count
  *     tunes recall vs scan fraction (the alternative when LSH bucket
  *     sizes skew).
  *   - [[lshTopKNeighbors]] / [[nearDupPairs]]: all-vectors variants that
  *     restrict the candidate space to LSH buckets (axis-sign hyperplanes,
  *     [[VectorFns.signBucket]]) — the pair space shrinks from O(n²) to
  *     O(Σ bucket²), and the bucket join is a plain shuffle-on-key
  *     equality join. Recall is the LSH trade; the algorithm is
  *     deterministic, so results remain exactly reproducible.
  *
  * Input contract: vectors are assumed non-zero-norm — cosine against a
  * zero vector is undefined, and under ANSI mode the inline
  * `dot/(‖a‖·‖b‖)` forms raise DIVIDE_BY_ZERO rather than fabricate a
  * value. Filter zero vectors at ingest (a one-line quality gate);
  * only the SQL-registered `array_cosine` (reachable from arbitrary
  * user SQL) soft-returns NULL for them.
  */
object Similarity {

  /** Occupancy-scaled LSH bit count: the smallest width that keeps
    * expected bucket occupancy at or below the calibration density
    * (`calibration` vectors over `2^baseBits` buckets — the density the
    * base configuration was measured at). Each corpus doubling past
    * `calibration` adds one bit, so the per-bucket pair volume — the
    * quadratic term every bucket self-join pays — stays ~constant as
    * the corpus grows instead of growing linearly (measured: fixed
    * 4-bit buckets at a 100× corpus meant 2.5B candidate pairs and a
    * disk-exhausting join; the same rule as the PQ codebook's
    * cell-occupancy contract). Integer arithmetic throughout — the
    * DuckDB oracle derives the same width from `count(*)` with the
    * same comparisons, and a float log2 could round differently at
    * exact powers of two. Capped at `maxBits` (axis-sign buckets use
    * one embedding coordinate per bit, and 2^20 buckets ≈ 1M is past
    * any fixture's occupancy needs). */
  /** The widest bucket width at which the SINGLE-probe sign-LSH join
    * ([[lshTopKNeighbors]]) still has an oracle-assertable recall
    * floor — under the [[occupancyBits]] rule, ≈ 2000·2^(8−4) ≈ 32k
    * vectors. Past it the method refuses (see its scaladoc). */
  val CalibrationMaxBits: Int = 8

  def occupancyBits(corpus: Long, baseBits: Int = 4,
      calibration: Long = 2000L, maxBits: Int = 20): Int = {
    require(baseBits >= 1 && baseBits <= maxBits,
      s"baseBits $baseBits outside [1, $maxBits]")
    require(calibration >= 1, s"calibration must be >= 1, got $calibration")
    var bits = baseBits
    var cap = calibration
    while (cap < corpus && bits < maxBits) { bits += 1; cap *= 2 }
    bits
  }

  /** Exact top-k nearest to the vector of `queryId` (excluded from
    * results), by cosine. */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") === queryId)
      .select(VectorFns.toDouble(col("embedding")).as("qv"))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        VectorFns.cosine(VectorFns.toDouble(col("embedding")), col("qv"))
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Vectors with their LSH bucket and norm, ready for bucketed joins.
    * The norm is computed ONCE per vector here — a pair join that calls
    * [[VectorFns.cosine]] would recompute both norms per candidate pair,
    * turning O(n·d) work into O(pairs·d). Same arithmetic, same values. */
  private def bucketed(emb: DataFrame, bits: Int): DataFrame =
    emb.select(
      col("vec_id"),
      VectorFns.toDouble(col("embedding")).as("v"),
      VectorFns.signBucket(col("embedding"), bits).as("bucket"))
      .withColumn("nrm", VectorFns.norm(col("v")))

  /** Skew guard ([[SkewGuard.capBuckets]]): vectors in buckets larger
    * than `maxBucket` are excluded from candidate generation entirely
    * (both join sides — the capped view is shared, keeping the semantics
    * symmetric; minSize stays 1 so multi-probe singletons still probe
    * neighboring buckets). The scale fix for routinely oversized buckets
    * is more `bits` or [[ivfTopK]], not a bigger cap. */
  private def capBuckets(b: DataFrame, maxBucket: Int): DataFrame =
    SkewGuard.capBuckets(b, Seq("bucket"), maxBucket)

  /** Cosine from a pair's dot product and precomputed norms — identical
    * operation order to [[VectorFns.cosine]] (dot / (‖a‖·‖b‖)). */
  private def pairCosine: Column =
    VectorFns.dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))

  /** Per-vector top-k neighbors *within the same LSH bucket*.
    *
    * SCALE ENVELOPE — calibration/fixture scale only, now ENFORCED:
    * a fixed-`bits` single-bucket probe has a recall that COLLAPSES
    * as the corpus grows (measured: identity 0.007 at 100× under
    * occupancy-preserving bits — BASELINE.md), because one Hamming
    * ball covers an ever-smaller fraction of each vector's true
    * neighborhood — and no fixed-small-probe variant escapes that
    * argument (probe count must SCALE with the bit width, which is
    * precisely [[lshTopKNeighborsQueryDirected]]'s scaled
    * configuration). So rather than documenting the trap, the method
    * refuses `bits` above the calibration ceiling: at calibration
    * occupancy (≤ [[CalibrationMaxBits]] bucket bits ≈ a few hundred
    * thousand vectors) the single-probe recall floor is
    * oracle-asserted (`e7_recall_bound`); past it, the query-directed
    * prober — whose quality floor IS asserted at 10×/100× by the
    * scale certification (`tools/ScaleBench`) — is the entry point. */
  def lshTopKNeighbors(emb: DataFrame, bits: Int, k: Int,
      maxBucket: Int = 100000,
      querySide: Option[Column] = None): DataFrame = {
    require(bits <= CalibrationMaxBits,
      s"single-probe sign-LSH with $bits bucket bits is past the " +
        s"calibration envelope (<= $CalibrationMaxBits): its recall " +
        "collapses as bits grow (measured 0.007 at 100× — BASELINE.md); " +
        "use lshTopKNeighborsQueryDirected, whose probe count scales " +
        "with the bit width and whose floor is certified at scale")
    val bAll = capBuckets(bucketed(emb, bits), maxBucket)
    // optional query-side restriction (e.g. e7's fixed recall sample):
    // applied AFTER the symmetric skew cap and only to the x side, so
    // each kept vector's top-k against the FULL candidate corpus is
    // exactly what the unrestricted call computes for it — the pair
    // join and the per-vector window just skip vectors nobody reads
    val b = querySide.map(bAll.filter).getOrElse(bAll)
    val pairs = b.as("x").join(bAll.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("nb_id"),
        pairCosine.as("cos_sim"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos_sim").desc, col("nb_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Multi-probe variant of [[lshTopKNeighbors]]: each vector also
    * searches the buckets within Hamming distance `maxHamming` of its
    * own (probe buckets = bucket XOR every ≤maxHamming-bit mask),
    * implemented by exploding one join side to its probe list — the
    * candidate space grows by Σ C(bits, h), never toward all-pairs.
    *
    * Measured on the sf0.01 fixtures (bits=4, k=3, vs exact top-3):
    * single-probe recall 0.125 → 0.473 at maxHamming=1 → 0.830 at
    * maxHamming=2. Axis-sign buckets correlate weakly with cosine on
    * dense gaussian embeddings — when recall matters more than scan
    * fraction, prefer [[ivfTopK]] (measured 1.0 for query top-10). */
  def lshTopKNeighborsMultiProbe(emb: DataFrame, bits: Int, k: Int,
      maxHamming: Int = 1, maxBucket: Int = 100000,
      querySide: Option[Column] = None): DataFrame = {
    val bAll = capBuckets(bucketed(emb, bits), maxBucket)
    // query-side restriction: see [[lshTopKNeighbors]] — filtered
    // BEFORE the probe explode, so the Hamming ball is only generated
    // for vectors whose shortlist is actually consumed
    val b = querySide.map(bAll.filter).getOrElse(bAll)
    val masks = (0 until (1 << bits))
      .filter(m => Integer.bitCount(m) <= maxHamming)
    val probed = b.withColumn("probe", explode(array(
      masks.map(m => col("bucket").bitwiseXOR(lit(m.toLong))): _*)))
    val pairs = probed.as("x").join(bAll.as("y"),
        col("x.probe") === col("y.bucket") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("nb_id"),
        pairCosine.as("cos_sim"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos_sim").desc, col("nb_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Query-directed multi-probe (the Lv et al. VLDB'07 idea, adapted to
    * axis-sign buckets): instead of the FULL Hamming ball, each vector
    * probes the 2^`probeBits` buckets reached by flipping any subset of
    * its `probeBits` LOWEST-MARGIN bits — the coordinates with the
    * smallest |v_j|, which are exactly where a near neighbor's sign
    * most plausibly differs (the flip probability of bit j falls with
    * the margin |v_j|). Two properties make this the SCALE
    * configuration of the multi-probe family:
    *
    *   - probe count is 2^probeBits REGARDLESS of the bucket width, so
    *     under occupancy-preserving bits ([[occupancyBits]]) the
    *     per-vector candidate volume stays ~constant as the corpus
    *     grows — where a fixed Hamming radius h pays C(bits, ≤h) probes
    *     (growing polynomially in bits) for coverage that still decays;
    *   - the probes concentrate on the highest-flip-probability buckets
    *     instead of spreading uniformly over the radius-h sphere, so
    *     recall per probe is strictly better than uniform-ball probing
    *     (measured: see BASELINE.md's scaled ANN certification).
    *
    * The low-margin positions are ranked deterministically (|v_j| asc,
    * position asc on ties), so results stay exactly reproducible and
    * oracle-replayable. `probeBits` ≤ 16 bounds the explode. */
  def lshTopKNeighborsQueryDirected(emb: DataFrame, bits: Int, k: Int,
      probeBits: Int, maxBucket: Int = 100000,
      querySide: Option[Column] = None): DataFrame = {
    require(probeBits >= 0 && probeBits <= bits && probeBits <= 16,
      s"probeBits $probeBits outside [0, min(bits=$bits, 16)]")
    val bAll = capBuckets(bucketed(emb, bits), maxBucket)
    // query-side restriction: see [[lshTopKNeighbors]] — the margin
    // ranking and probe explode run only for consumed vectors
    val b = querySide.map(bAll.filter).getOrElse(bAll)
    // positions of the probeBits smallest |v_j| among the bucket bits,
    // ties broken by position: struct sort is field-order lexicographic
    val ranked = array_sort(array((0 until bits).map(j =>
      struct(abs(col("v").getItem(j)).as("a"), lit(j).as("j"))): _*))
    val withLow = b.withColumn("__low",
      slice(transform(ranked, s => s.getField("j")), 1, probeBits))
    // mask of subset m = Σ 2^position over m's set bits; positions are
    // distinct so the sum IS the bitwise OR (2^j via double pow: exact
    // for j < 52, and j < 20 here)
    val masks: Seq[Column] = (0 until (1 << probeBits)).map { m =>
      val terms = (0 until probeBits).collect {
        case t if ((m >> t) & 1) == 1 =>
          pow(lit(2.0), element_at(col("__low"), t + 1).cast("double"))
            .cast("long")
      }
      terms.reduceOption(_ + _).getOrElse(lit(0L))
    }
    val probed = withLow.withColumn("probe",
      explode(array(masks.map(col("bucket").bitwiseXOR(_)): _*)))
    val pairs = probed.as("x").join(bAll.as("y"),
        col("x.probe") === col("y.bucket") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("nb_id"),
        pairCosine.as("cos_sim"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos_sim").desc, col("nb_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic Lloyd (k-means) refinement of an initial centroid set —
    * the training step that lifts [[ivfTopK]]/[[pqTopK]] from the first-N
    * stand-in to real codebooks without changing either plan's shape.
    *
    * `points`: (groupCols..., id, v); `cents`: (groupCols..., cid, cv) —
    * one independent k-means per `groupCols` value (PQ trains one codebook
    * per subspace; IVF passes no group columns). Each of the `iters`
    * unrolled rounds: (1) assign every point to its nearest centroid by
    * squared L2, expanded as ((s·s − 2·s·c) + c·c) with ties broken on
    * cid; (2) recompute each centroid as the element-wise mean of its
    * members. Every floating-point reduction is an explicit sorted left
    * fold (member values sorted by point id, positions reassembled in
    * order), because a groupBy-sum of doubles is partition-order-dependent
    * — this is what keeps the trained codebook bitwise-reproducible and
    * the DuckDB oracle able to replay training step-for-step. A centroid
    * that loses all members keeps its previous value (coalesce), again
    * mirrored by the oracle.
    *
    * Scale shape: each round's centroid table is DRIVER-COLLECTED into a
    * local relation (k·dim doubles — the canonical collect-then-broadcast
    * dimension pattern) before the next round reads it. Without that
    * re-root, round n's plan embeds round n−1's twice (assignment join +
    * empty-cluster coalesce join), so the iterated plan re-executes
    * earlier rounds ~2^iters times — the same exponential-iteration trap
    * dedupClusters solves with RDD re-rooting; here the frame is small
    * enough to localize outright, which also makes every downstream join
    * against the codebook trivially broadcastable. Assignment is one
    * narrow pass over the points; the update aggregates k·dim tiny
    * groups. At 100 TB you train on a sample (points is any DataFrame —
    * pass a `.sample` or a fixed id-range slice) and encode the full
    * corpus with the final codebook; iters is fixed and small. */
  /** Driver-collect a SMALL deterministic frame into a true LOCAL
    * relation — the collect-then-broadcast dimension pattern. Exact
    * values are preserved (collect round-trips doubles bit-for-bit),
    * so oracle parity is unaffected; the payoff is a flat plan for
    * anything iterated or multiply-referenced. A LocalRelation (not an
    * RDD-backed frame): it broadcasts without an RDD job, Catalyst
    * folds through it, and the plan itself PROVES the broadcast side
    * bounded — PlanAudit classifies a BroadcastNestedLoopJoin over it
    * as the intended scalar-attach shape instead of flagging an
    * unbounded nested loop. Only for frames known bounded (centroid
    * tables, query vectors, top-k ground truths). */
  private[graft] def localizeSmall(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)
  }

  /** Corpus-scaled exact re-rank multiplier for the quantized ANN paths
    * ([[pqTopK]], [[sqTopK]]): `base` at `baseCorpus` rows, growing
    * linearly with the corpus. A FIXED shortlist width loses recall as
    * the corpus grows — the codebook (hence quantization error per
    * cell) is constant while the number of competitors inside that
    * error band grows linearly, so the exact re-rank must widen with it
    * to keep covering the true top-k (measured: PQ recall 1.0 at 2k
    * vectors and 0.50 at 20k with the same width; 0.90+ once the width
    * scales — RecallProbe sweep, BASELINE.md). Cost stays negligible:
    * the exact pass touches `rerank·k` of N vectors — a constant
    * FRACTION of the corpus. */
  def scaledRerank(corpusRows: Long, base: Int, baseCorpus: Long): Int = {
    require(base >= 1 && baseCorpus >= 1)
    val mult = math.ceil(corpusRows.toDouble / baseCorpus.toDouble)
      .toLong.max(1L).min(Int.MaxValue / base)
    base * mult.toInt
  }

  private[ops] def lloydRefine(points: DataFrame, cents: DataFrame,
      groupCols: Seq[String], iters: Int): DataFrame = {
    if (iters <= 0) localizeSmall(cents)
    else {
      val c0 = localizeSmall(cents)
      val joined =
        if (groupCols.isEmpty) points.crossJoin(broadcast(c0))
        else points.join(broadcast(c0), groupCols)
      val d2 = (VectorFns.dot(col("v"), col("v"))
        - lit(2.0) * VectorFns.dot(col("v"), col("cv"))
        + VectorFns.dot(col("cv"), col("cv")))
      // argmin as min(struct(d2, cid)) — lexicographic struct order IS
      // "least distance, then least cid", the same row a row_number
      // window would pick, but as a hash aggregation with map-side
      // partial combine (no per-iteration sort shuffle). first(v) is
      // deterministic here: v is constant within its (group, id) group.
      val asg = joined
        .withColumn("__d2", d2)
        .groupBy((groupCols :+ "id").map(col): _*)
        .agg(min(struct(col("__d2"), col("cid"))).as("__m"),
          first(col("v")).as("v"))
        .select((groupCols.map(col) ++ Seq(col("id"),
          col("__m.cid").as("cid"), col("v"))): _*)
      // element-wise means in ONE aggregation (no position explode, no
      // second reassembly shuffle): per centroid, members sort by id and
      // each coordinate left-folds over them — the identical addition
      // sequence the oracle's per-(cid, pos) `list(val ORDER BY id)`
      // fold performs, just batched per centroid instead of per
      // coordinate. Member lists are k-bounded fractions of the
      // (sampled) training set, so the interpreted lambda is off the
      // hot path by construction.
      val fresh = asg
        .groupBy((groupCols :+ "cid").map(col): _*)
        .agg(sort_array(collect_list(struct(col("id"), col("v"))))
          .as("__vs"), count(lit(1)).as("__n"))
        .select((groupCols.map(col) ++ Seq(col("cid"),
          transform(
            sequence(lit(0),
              size(element_at(col("__vs"), 1).getField("v")) - 1),
            i => aggregate(col("__vs"), lit(0.0),
              (a, s) => a + element_at(s.getField("v"), i + 1))
              / col("__n").cast("double")).as("__cv"))): _*)
      val next = c0
        .join(broadcast(fresh), groupCols :+ "cid", "left") // k-row sides
        .select((groupCols.map(col) ++ Seq(col("cid"),
          coalesce(col("__cv"), col("cv")).as("cv"))): _*)
      lloydRefine(points, next, groupCols, iters - 1)
    }
  }

  /** IVF (inverted-file) approximate top-k: partition the corpus into
    * cells around `nCentroids` centroid vectors, then search only the
    * query's `nProbe` nearest cells.
    *
    * Centroid training is deterministic: seeds are the vectors with
    * `vec_id < nCentroids`, refined by `trainIters` unrolled Lloyd
    * rounds ([[lloydRefine]] — sorted-fold means, cid tie-breaks, so the
    * oracle replays training exactly). At scale: centroids broadcast
    * (tiny), cell assignment is one narrow pass over the corpus, and the
    * probe restricts the final scoring scan to ~nProbe/nCentroids of the
    * data. Everything is deterministic, so the approximate result is
    * oracle-checkable. */
  def ivfTopK(emb: DataFrame, nCentroids: Int, nProbe: Int,
      queryId: Long, k: Int, trainIters: Int = 0): DataFrame = {
    val e = emb.select(
      col("vec_id"), VectorFns.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorFns.norm(col("v")))
    val seeds = e.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val c = lloydRefine(
        e.select(col("vec_id").as("id"), col("v")), seeds, Nil, trainIters)
      .select(col("cid"), col("cv"),
        VectorFns.norm(col("cv")).as("cnrm"))
    val scored = e.crossJoin(broadcast(c))
      .select(col("vec_id"), col("cid"),
        (VectorFns.dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
          .as("ccos"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cid").asc)
    val ranked = scored.withColumn("rn", row_number().over(w))
    val cell = ranked.filter(col("rn") === 1).select("vec_id", "cid")
    val probed = ranked.filter(col("vec_id") === queryId &&
      col("rn") <= nProbe).select("cid")
    val cands = cell.join(broadcast(probed), Seq("cid"))
      .filter(col("vec_id") =!= queryId).select("vec_id")
    val q = e.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qnrm"))
    e.join(cands, Seq("vec_id")).crossJoin(broadcast(q))
      .select(col("vec_id"),
        (VectorFns.dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Product-quantization (PQ) approximate top-k: split each vector
    * into `m` subvectors, quantize every subvector to its nearest
    * codebook centroid (codes are what a 100 TB deployment would STORE —
    * m bytes instead of the full vector), score candidates by
    * asymmetric-distance lookup (query·centroid table, summed in fixed
    * subspace order), then exactly re-rank the top `rerank·k` by true
    * cosine.
    *
    * Determinism (what keeps an approximate index oracle-checkable):
    * codebooks are seeded by the subvectors of `vec_id < nCentroids` and
    * refined per-subspace by `trainIters` unrolled Lloyd rounds
    * ([[lloydRefine]] — sorted-fold means, cid tie-breaks, so the oracle
    * replays training step-for-step); argmin ties break on centroid id;
    * the per-vector score sums its m lookup terms in sub_idx order via
    * an explicit sorted fold, because a groupBy-sum of doubles is
    * partition-order-dependent and would break bitwise parity.
    *
    * Scale shape: codebooks broadcast (m·nCentroids rows); encoding is
    * one narrow pass; candidate scoring joins byte codes against the
    * broadcast lookup table; only `rerank·k` vectors ever touch full
    * embeddings again.
    *
    * Measured on the sf0.01 fixtures (m=8, rerank=4) vs exact top-10:
    * recall 0.6 untrained (16 first-N centroids) → 1.0 trained
    * (32 centroids, 3 Lloyd rounds) — the `e7_recall_bound` query keeps
    * that figure oracle-checked every round; training changes recall,
    * not the plan shape.
    *
    * `seedSpread` is the corpus-growth lever: the default (0) seeds
    * codebooks from `vec_id < nCentroids` — fine when those ids sample
    * the distribution (the fixtures), WRONG at a grown corpus whose
    * early ids cover only one slice of it. Passing `corpus /
    * targetSeeds` seeds from `xxhash64(vec_id) % seedSpread == 0`
    * instead — a deterministic uniform sample of the WHOLE corpus
    * (~targetSeeds seeds), the sample a 100 TB deployment trains on.
    * Pair it with an nCentroids (and rerank) that grow with the corpus:
    * a fixed codebook's per-cell occupancy rises linearly with corpus
    * size and recall collapses (measured in BASELINE.md: 1.0 at sf0.1's
    * 2k vectors → 0.50 at the 10× corpus with everything fixed). */
  def pqTopK(emb: DataFrame, m: Int, dsub: Int, nCentroids: Int,
      queryId: Long, k: Int, rerank: Int = 4,
      trainIters: Int = 0, seedSpread: Long = 0L): DataFrame = {
    val e = emb.select(col("vec_id"),
      VectorFns.toDouble(col("embedding")).as("v"))
    val sub = e.select(col("vec_id"),
      posexplode(array((0 until m).map(i =>
        slice(col("v"), i * dsub + 1, dsub)): _*)).as(Seq("sub_idx", "subv")))
    val seedFilter =
      if (seedSpread <= 1L) col("vec_id") < nCentroids
      else pmod(xxhash64(col("vec_id")), lit(seedSpread)) === 0
    val seeds = sub.filter(seedFilter)
      .select(col("sub_idx"), col("vec_id").as("cid"), col("subv").as("cv"))
    val cents = lloydRefine(
      sub.select(col("sub_idx"), col("vec_id").as("id"),
        col("subv").as("v")),
      seeds, Seq("sub_idx"), trainIters)
    // nearest centroid per (vector, subspace): ||s-c||² expanded as
    // ((s·s - 2·(s·c)) + c·c) — identical fold order in the oracle
    val d2 = (VectorFns.dot(col("subv"), col("subv"))
      - lit(2.0) * VectorFns.dot(col("subv"), col("cv"))
      + VectorFns.dot(col("cv"), col("cv")))
    // argmin as min(struct(d2, cid)): same (least-distance, least-cid)
    // row a row_number window selects, but a hash aggregation with
    // map-side partial combine — encoding is the full-corpus pass, so
    // this is the plan that matters at scale.
    val codes = sub.join(broadcast(cents), Seq("sub_idx"))
      .withColumn("__d2", d2)
      .groupBy("vec_id", "sub_idx")
      .agg(min(struct(col("__d2"), col("cid"))).as("__m"))
      .select(col("vec_id"), col("sub_idx"), col("__m.cid").as("cid"))
    // asymmetric-distance lookup table: query subvector · each centroid
    val qsub = sub.filter(col("vec_id") === queryId)
      .select(col("sub_idx"), col("subv").as("qsub"))
    val lut = cents.join(broadcast(qsub), Seq("sub_idx"))
      .select(col("sub_idx"), col("cid"),
        VectorFns.dot(col("qsub"), col("cv")).as("pdot"))
    // fixed-order sum: sort the m lookup terms by sub_idx, left fold
    val scored = codes.join(broadcast(lut), Seq("sub_idx", "cid"))
      .groupBy("vec_id")
      .agg(sort_array(collect_list(struct(col("sub_idx"), col("pdot"))))
        .as("__terms"))
      .select(col("vec_id"),
        aggregate(transform(col("__terms"), t => t.getField("pdot")),
          lit(0.0), (a, b) => a + b).as("approx_dot"))
    val cands = scored.filter(col("vec_id") =!= queryId)
      .orderBy(col("approx_dot").desc, col("vec_id").asc)
      .limit(rerank * k)
      .select("vec_id")
    // exact re-rank of the shortlist by true cosine
    val en = e.withColumn("nrm", VectorFns.norm(col("v")))
    val q = en.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qnrm"))
    en.join(cands, Seq("vec_id")).crossJoin(broadcast(q))
      .select(col("vec_id"),
        (VectorFns.dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Scalar-quantization (SQ8) approximate top-k: compress every
    * dimension to an 8-bit code against per-dimension [min, max] corpus
    * bounds (the codes are what a 100 TB deployment STORES — d bytes per
    * vector, an 8× cut vs float32 with no codebook training), score
    * candidates by the dot product of the midpoint-reconstructed codes
    * against the raw query, then exactly re-rank the top `rerank·k`.
    *
    * Determinism: the quantization grid is min/max per dimension (exact
    * aggregates), codes are `floor` of an IEEE expression both engines
    * evaluate identically (saturating at 255 via `least` for v = max),
    * and reconstruction/scoring reuse the fused left-fold dot product —
    * so the approximate scores, like PQ's, are oracle-checkable bitwise.
    *
    * Scale shape: the per-dimension stats are one narrow posexplode pass
    * aggregated to d rows, localized and broadcast (the
    * collect-then-broadcast dimension pattern); encoding is one narrow
    * pass over the corpus; scoring reads codes only; only `rerank·k`
    * vectors touch full embeddings again. */
  def sqTopK(emb: DataFrame, queryId: Long, k: Int,
      rerank: Int = 4): DataFrame = {
    val e = emb.select(col("vec_id"),
      VectorFns.toDouble(col("embedding")).as("v"))
    val stats = e.select(posexplode(col("v")).as(Seq("pos", "val")))
      .groupBy("pos").agg(min("val").as("mn"), max("val").as("mx"))
    // d rows → one (mns, mxs) array pair, position-ordered — localized
    // and broadcast everywhere it is read
    val scale = localizeSmall(stats.agg(
      transform(sort_array(collect_list(struct(col("pos"), col("mn")))),
        t => t.getField("mn")).as("mns"),
      transform(sort_array(collect_list(struct(col("pos"), col("mx")))),
        t => t.getField("mx")).as("mxs")))
    val coded = e.crossJoin(broadcast(scale)).select(
      col("vec_id"),
      transform(sequence(lit(1), size(col("v"))), i => {
        val mn = element_at(col("mns"), i)
        val mx = element_at(col("mxs"), i)
        val vv = element_at(col("v"), i)
        when(mx === mn, lit(0L))
          .otherwise(least(lit(255L), floor((vv - mn) / (mx - mn) * 256.0)))
      }).as("codes"),
      col("mns"), col("mxs"))
    val q = localizeSmall(e.filter(col("vec_id") === queryId)
      .select(col("v").as("qv")))
    // asymmetric scoring: midpoint reconstruction of the stored code
    // against the raw query vector, fused left-fold dot product
    val recon = transform(sequence(lit(1), size(col("codes"))), i => {
      val mn = element_at(col("mns"), i)
      val mx = element_at(col("mxs"), i)
      val cd = element_at(col("codes"), i)
      mn + (cd.cast("double") + 0.5) * (mx - mn) / 256.0
    })
    val scored = coded.crossJoin(broadcast(q))
      .select(col("vec_id"),
        VectorFns.dot(recon, col("qv")).as("approx_dot"))
    val cands = scored.filter(col("vec_id") =!= queryId)
      .orderBy(col("approx_dot").desc, col("vec_id").asc)
      .limit(rerank * k)
      .select("vec_id")
    val en = e.withColumn("nrm", VectorFns.norm(col("v")))
    val qn = en.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qnrm"))
    en.join(cands, Seq("vec_id")).crossJoin(broadcast(qn))
      .select(col("vec_id"),
        (VectorFns.dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Maximal-Marginal-Relevance diversified top-k: greedily pick the
    * candidate maximizing `wRel·sim(q,c) − wDiv·max_{s∈picked} sim(c,s)`
    * — relevance minus redundancy, the reranker that turns "top-k most
    * similar" into "top-k similar AND mutually different" (the diversity
    * pass a training-mix or retrieval pipeline runs over a shortlist).
    *
    * Plan shape: the distributed work is the exact shortlist scan
    * ([[bruteForceTopK]]); the greedy loop then runs k unrolled steps
    * over the LOCALIZED shortlist (bounded: `shortlist` rows — the same
    * collect-then-broadcast dimension pattern as [[lloydRefine]]), each
    * step one anti-join + max-aggregate + argmax over ≤ shortlist rows,
    * so the iterated plan stays flat and nothing big is ever re-shuffled.
    *
    * `wRel`/`wDiv` are taken separately (NOT `1−λ` computed at runtime:
    * `1.0 − 0.7` is `0.30000000000000004` while an oracle's literal
    * `0.3` is not — the caller pins both literals on both sides).
    * Ties break on vec_id for a total order.
    */
  def mmrTopK(emb: DataFrame, queryId: Long, k: Int, shortlist: Int,
      wRel: Double, wDiv: Double): DataFrame = {
    val short = localizeSmall(
      bruteForceTopK(emb, queryId, shortlist)
        .join(emb.select(col("vec_id"),
          VectorFns.toDouble(col("embedding")).as("v")), "vec_id")
        .select(col("vec_id"), col("cos_sim"), col("v")))
    var sel = localizeSmall(short
      .orderBy(col("cos_sim").desc, col("vec_id").asc).limit(1)
      .select(col("vec_id"), col("cos_sim"), col("v"),
        lit(1L).as("mmr_rank"), col("cos_sim").as("mmr_score")))
    for (i <- 2 to k) {
      val cand = short.join(sel.select("vec_id"), Seq("vec_id"), "left_anti")
      val selV = broadcast(sel.select(col("v").as("sv")))
      val scored = cand.crossJoin(selV)
        .groupBy("vec_id", "cos_sim")
        .agg(max(VectorFns.cosine(col("v"), col("sv"))).as("max_sel_sim"),
          first(col("v")).as("v"))
        .withColumn("mmr_score",
          lit(wRel) * col("cos_sim") - lit(wDiv) * col("max_sel_sim"))
      val pick = scored
        .orderBy(col("mmr_score").desc, col("vec_id").asc).limit(1)
        .select(col("vec_id"), col("cos_sim"), col("v"),
          lit(i.toLong).as("mmr_rank"), col("mmr_score"))
      sel = localizeSmall(sel.unionByName(pick))
    }
    sel.select("vec_id", "mmr_rank", "cos_sim", "mmr_score")
  }

  /** SemDeDup-style semantic dedup: k-means-cluster the embeddings, then
    * within each cluster mark every vector whose cosine to a LOWER-id
    * cluster-mate reaches `threshold` as a duplicate (keep-lowest-id, the
    * same deterministic survivor rule the text dedup tiers use). Returns
    * (vec_id, cid, kept) for every input vector.
    *
    * This is the scale path for embedding dedup when LSH bucket recall is
    * not enough: the candidate space is Σ cluster², bounded by choosing
    * `nCentroids` ∝ corpus size (cluster size stays ~constant) plus the
    * [[SkewGuard.capBuckets]] cap on degenerate clusters — never
    * all-pairs. Clustering reuses [[lloydRefine]] (deterministic,
    * oracle-replayable); assignment is the same min(struct(d2, cid))
    * hash-aggregate the PQ encoder uses — one narrow pass, no window
    * sort. Vectors in capped-out clusters are kept (reported, never
    * silently dropped — same discipline as every other cap). */
  def semDedup(emb: DataFrame, nCentroids: Int, trainIters: Int,
      threshold: Double, maxCluster: Int = 100000): DataFrame = {
    val e = emb.select(col("vec_id"),
      VectorFns.toDouble(col("embedding")).as("v"))
    val seeds = e.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val c = lloydRefine(
      e.select(col("vec_id").as("id"), col("v")), seeds, Nil, trainIters)
    val d2 = (VectorFns.dot(col("v"), col("v"))
      - lit(2.0) * VectorFns.dot(col("v"), col("cv"))
      + VectorFns.dot(col("cv"), col("cv")))
    val asg = e.crossJoin(broadcast(c))
      .withColumn("__d2", d2)
      .groupBy("vec_id")
      .agg(min(struct(col("__d2"), col("cid"))).as("__m"),
        first(col("v")).as("v"))
      .select(col("vec_id"), col("__m.cid").as("cid"), col("v"))
      .withColumn("nrm", VectorFns.norm(col("v")))
    val capped = SkewGuard.capBuckets(asg, Seq("cid"), maxCluster)
    val dropped = capped.as("x").join(capped.as("y"),
        col("x.cid") === col("y.cid") &&
          col("x.vec_id") > col("y.vec_id"))
      .filter(pairCosine >= threshold)
      .select(col("x.vec_id")).distinct()
    asg.select("vec_id", "cid")
      .join(dropped.withColumn("__dup", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("__dup").isNull.as("kept"))
  }

  /** Near-duplicate pairs by embedding cosine ≥ threshold, candidates
    * restricted to same-bucket pairs.
    *
    * Corpus growth: bucket occupancy (hence per-bucket pair volume,
    * quadratic in it) grows linearly at fixed `bits` — the measured
    * driver of d7's 11× step at the 100× ScaleGen corpus, where the
    * SkewGuard cap is what kept the join bounded (degrade-with-report).
    * The committed d4/d7 plans therefore derive `bits` from the corpus
    * with [[occupancyBits]], holding occupancy ~constant so the cap
    * stops binding (same cell-occupancy rule as the PQ codebook);
    * [[semDedup]], whose nCentroids ∝ corpus contract is the other
    * designed scale path, remains the alternative for recall-sensitive
    * embedding dedup. */
  def nearDupPairs(emb: DataFrame, bits: Int, threshold: Double,
      maxBucket: Int = 100000): DataFrame = {
    val b = capBuckets(bucketed(emb, bits), maxBucket)
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        pairCosine.as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
