package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, count, lit, row_number}

import graft.{GraftFunctions, Tables}
import graft.functions.VectorFns
import graft.ops.{Similarity, TextDedup}

/** Similarity search over the `embeddings` table (64-dim float vectors).
  * Oracles mirror the exact left-fold arithmetic (see VectorFns), so
  * cosine values match bitwise.
  *
  * Every tuning constant (bucket caps, centroid counts, rerank width,
  * Lloyd rounds, …) is defined ONCE below and drives both the Spark
  * impls and the generated oracle CTEs — including e7's recall replay,
  * which re-uses the same CTE builders as the standalone e2/e5/e3/e6
  * oracles rather than a hand-copied second spelling of each pipeline.
  */
object SimilarityQueries {

  // ---- tuning constants: one definition for Spark impls AND oracles ----
  /** Lloyd rounds for centroid training, one constant per tier (drives
    * both the Spark `trainIters` argument and the unrolled oracle CTEs).
    * IVF plateaus at 2 rounds (measured recall 0.90 at 2 and 3); PQ
    * needs 3 to reach recall 1.0. */
  private val IvfIters = 2
  private val PqIters = 3
  private val Dim = 64 // fixture embedding width
  private val LshBits = 4
  private val LshK = 3 // per-vector neighbors (e2/e5)
  private val MaxBucket = 100000
  private val MaxHamming = 1 // e5 probe radius
  // occupancy rule (Similarity.occupancyBits): the 4-bit base is
  // calibrated at sf0.1's 2000 vectors (125/bucket); every corpus
  // doubling past that adds one bit. d4/d7 derive their committed bit
  // width from this; at the sf0.01/sf0.1 oracle scales it IS LshBits.
  private val LshCalib = 2000L
  private val LshMaxBits = 20
  private val QdProbeBits = 2 // e10 query-directed probes = 2^2 = 4
  private val QdScaledProbeBits = 5 // scaled-cert e5 probes = 2^5 = 32
  // e5 scaled-cert quality-ratio floor (returned top-3 true-cosine mass
  // over exact top-3 mass, sampled vectors) — set from the measured
  // 10×/100× figures in BASELINE.md's round-7 scaled ANN table.
  private val E5QualityFloor = 0.80
  private val IvfNc = 8 // IVF centroids
  private val IvfProbe = 2 // cells probed
  private val PqM = 8 // PQ subspaces
  private val PqDsub = 8 // dims per subspace
  private val PqNc = 32 // PQ centroids per subspace
  private val PqRerank = 4 // exact re-rank width = PqRerank·AnnK
  private val SqRerank = 4 // e8 exact re-rank width = SqRerank·AnnK
  private val SemNc = 8 // d11 semantic-dedup cluster count
  private val SemIters = 2 // d11 Lloyd rounds
  private val SemMaxCluster = 100000 // d11 degenerate-cluster cap
  private val AnnK = 10 // query top-k (e1/e3/e6)
  private val MmrK = 5 // e9 diversified picks
  private val MmrShortlist = 20 // e9 relevance shortlist
  private val NearDupThreshold = 0.35 // d4/d7 cosine cutoff
  // e7 exact-ground-truth query sample: FIXED COUNT, not proportional, so
  // the sample×corpus scoring pass stays O(corpus) as the corpus grows
  // (1-in-10 sampling made it O(corpus²/10) — the one scale-killer-shaped
  // term flagged in round 3).
  private val RecallSampleN = 150

  /** DuckDB left-fold dot product of double lists `a`·`b` (b indexed). */
  private def dkDot(a: String, b: String) =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform($a, (x,i) -> x * $b[i])), (p,q) -> p + q)"
  private def dkNorm(a: String) = s"sqrt(${dkDot(a, a)})"
  private def dkCos(a: String, b: String) =
    s"(${dkDot(a, b)} / (${dkNorm(a)} * ${dkNorm(b)}))"
  private val toD = "list_transform(embedding, x -> x::DOUBLE)"
  /** Axis-sign LSH bucket over the first `LshBits` coordinates. */
  private def dkBucket(e: String) = (0 until LshBits).map { j =>
    s"(CASE WHEN $e[${j + 1}] > 0 THEN ${1L << j} ELSE 0 END)"
  }.mkString("(", " + ", ")")

  /** Unrolled Lloyd-iteration CTEs mirroring `Similarity.lloydRefine`
    * step-for-step: argmin by expanded squared-L2 with cid tie-break,
    * element-wise means as id-sorted left folds divided by the member
    * count, empty clusters keeping their previous centroid. Emits
    * `${p}cents0` (seeds = `$idCol < $k`) through `${p}cents$iters`
    * (the trained codebook) against the points CTE `$src` with columns
    * (`$grp`?, `$idCol`, `$vecCol`). Generated from the same parameters
    * as the Spark call so the two replays cannot drift. */
  private def dkKmeansCtes(p: String, src: String, grp: Option[String],
      idCol: String, vecCol: String, k: Int, dim: Int, iters: Int): String = {
    val g = grp.toSeq // group columns as a list
    def cols(prefix: String) = (g.map(c => s"$prefix$c") :+ s"${prefix}cid")
    val gSel = g.map(c => s"$c, ").mkString
    val usingGrp = g.map(c => s"$c, ").mkString // for USING (grp, cid)
    val seed =
      s"""${p}cents0 AS (SELECT $gSel$idCol AS cid, $vecCol AS cv
         |  FROM $src WHERE $idCol < $k)""".stripMargin
    val iterCtes = (0 until iters).map { i =>
      val joinClause = grp match {
        case Some(c) => s"FROM $src s JOIN ${p}cents$i c USING ($c)"
        case None    => s"FROM $src s CROSS JOIN ${p}cents$i c"
      }
      val partCols = (g.map(c => s"s.$c") :+ s"s.$idCol").mkString(", ")
      val aGrp = g.map(c => s"a.$c, ").mkString
      s"""${p}asg$i AS (SELECT ${g.map(c => s"s.$c, ").mkString}s.$idCol,
         |    s.$vecCol AS pv, c.cid,
         |    row_number() OVER (PARTITION BY $partCols
         |      ORDER BY ((${dkDot(s"s.$vecCol", s"s.$vecCol")}
         |        - (2.0 * ${dkDot(s"s.$vecCol", "c.cv")}))
         |        + ${dkDot("c.cv", "c.cv")}) ASC, c.cid ASC) AS rn
         |  $joinClause),
         |${p}pos$i AS (SELECT ${aGrp}a.cid, a.$idCol, pp.pos,
         |    a.pv[pp.pos] AS val
         |  FROM (SELECT * FROM ${p}asg$i WHERE rn = 1) a,
         |       (SELECT unnest(generate_series(1, $dim)) AS pos) pp),
         |${p}mean$i AS (SELECT ${gSel}cid, pos,
         |    list_reduce(list_prepend(0.0::DOUBLE,
         |      list(val ORDER BY $idCol)), (a, b) -> a + b)
         |      / (count(*)::DOUBLE) AS mval
         |  FROM ${p}pos$i GROUP BY ${gSel}cid, pos),
         |${p}new$i AS (SELECT ${gSel}cid, list(mval ORDER BY pos) AS cv
         |  FROM ${p}mean$i GROUP BY ${gSel}cid),
         |${p}cents${i + 1} AS (SELECT ${cols("c.").mkString(", ")},
         |    coalesce(n.cv, c.cv) AS cv
         |  FROM ${p}cents$i c LEFT JOIN ${p}new$i n
         |    USING (${usingGrp}cid))""".stripMargin
    }
    (seed +: iterCtes).mkString(",\n")
  }

  /** Capped bucketed-vector CTEs straight off `embeddings`:
    * `${p}e` (vec_id, v, bucket) → `${p}keep` (surviving buckets) →
    * `${p}ek` (the SkewGuard-capped view both LSH tiers join on). */
  private def dkBucketBase(p: String): String =
    s"""${p}e AS (SELECT vec_id, $toD AS v,
       |    ${dkBucket("embedding")} AS bucket FROM embeddings),
       |${p}keep AS (SELECT bucket FROM ${p}e GROUP BY bucket
       |  HAVING count(*) <= $MaxBucket),
       |${p}ek AS (SELECT ${p}e.* FROM ${p}e JOIN ${p}keep USING (bucket))""".stripMargin

  /** [[dkBucketBase]] with the OCCUPANCY-SCALED bit width: `${p}bq`
    * derives `bits` from `count(embeddings)` by the same integer rule
    * as `Similarity.occupancyBits` (smallest width whose calibration
    * capacity covers the corpus — no float log2 on either side), then
    * the bucket sums only the first `bits` sign terms. At the oracle
    * scales (≤ $LshCalib vectors) this is bit-identical to
    * [[dkBucketBase]]; past them the d4/d7 replay grows its buckets
    * exactly as the Spark plan does. */
  private def dkBucketBaseScaled(p: String): String = {
    val terms = (0 until LshMaxBits).map { j =>
      s"(CASE WHEN $j < bits AND embedding[${j + 1}] > 0" +
        s" THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", "\n      + ", ")")
    val bMax = LshMaxBits - LshBits
    s"""${p}bq AS (SELECT $LshBits + coalesce(min(g.b), $bMax) AS bits
       |  FROM (SELECT count(*) AS n FROM embeddings) nb,
       |       generate_series(0, $bMax) g(b)
       |  WHERE nb.n <= $LshCalib * (1::BIGINT << g.b)),
       |${p}e AS (SELECT vec_id, $toD AS v,
       |    $terms AS bucket
       |  FROM embeddings, ${p}bq),
       |${p}keep AS (SELECT bucket FROM ${p}e GROUP BY bucket
       |  HAVING count(*) <= $MaxBucket),
       |${p}ek AS (SELECT ${p}e.* FROM ${p}e JOIN ${p}keep USING (bucket))""".stripMargin
  }

  /** Ranked LSH neighbor pairs over a capped bucket view `$ek`: ends in
    * `${p}r` (vec_id, nb_id, cos_sim, rank). `multiProbe` adds the
    * Hamming-≤`MaxHamming` bucket expansion (e5) before the pair join. */
  private def dkLshPairs(p: String, ek: String, multiProbe: Boolean): String = {
    val pair =
      if (!multiProbe)
        s"""${p}p AS (SELECT x.vec_id, y.vec_id AS nb_id,
           |    ${dkCos("x.v", "y.v")} AS cos_sim
           |  FROM $ek x JOIN $ek y ON x.bucket = y.bucket
           |    AND x.vec_id <> y.vec_id)""".stripMargin
      else {
        val masks = (0 until (1 << LshBits))
          .filter(Integer.bitCount(_) <= MaxHamming)
          .mkString("[", ", ", "]")
        s"""${p}px AS (SELECT vec_id, v, xor(bucket::BIGINT, m.mask) AS probe
           |  FROM $ek, unnest($masks::BIGINT[]) AS m(mask)),
           |${p}p AS (SELECT x.vec_id, y.vec_id AS nb_id,
           |    ${dkCos("x.v", "y.v")} AS cos_sim
           |  FROM ${p}px x JOIN $ek y ON x.probe = y.bucket::BIGINT
           |    AND x.vec_id <> y.vec_id)""".stripMargin
      }
    s"""$pair,
       |${p}r AS (SELECT vec_id, nb_id, cos_sim,
       |    row_number() OVER (PARTITION BY vec_id
       |                       ORDER BY cos_sim DESC, nb_id ASC) AS rank
       |  FROM ${p}p)""".stripMargin
  }

  /** IVF pipeline over a CTE `e` (vec_id, v): k-means training, cell
    * assignment, query-probe, exact scoring of probed cells — ends in
    * `${p}top` (vec_id, cos_sim), the query's approximate top-`AnnK`. */
  private def dkIvfCtes(p: String): String =
    s"""${dkKmeansCtes(s"${p}km", "e", None, "vec_id", "v", IvfNc, Dim,
          IvfIters)},
       |${p}c AS (SELECT cid, cv FROM ${p}kmcents$IvfIters),
       |${p}a AS (SELECT e.vec_id, ${p}c.cid,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${dkCos("e.v", s"${p}c.cv")} DESC, ${p}c.cid ASC) AS rn
       |  FROM e CROSS JOIN ${p}c),
       |${p}cell AS (SELECT vec_id, cid FROM ${p}a WHERE rn = 1),
       |${p}probe AS (SELECT cid FROM ${p}a WHERE vec_id = 0
       |  AND rn <= $IvfProbe),
       |${p}cand AS (SELECT mm.vec_id FROM ${p}cell mm JOIN ${p}probe pr
       |  ON mm.cid = pr.cid WHERE mm.vec_id <> 0),
       |${p}q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |${p}top AS (SELECT e.vec_id, ${dkCos("e.v", "qv")} AS cos_sim
       |  FROM e JOIN ${p}cand USING (vec_id), ${p}q
       |  ORDER BY cos_sim DESC, vec_id ASC LIMIT $AnnK)""".stripMargin

  /** PQ pipeline over a CTE `e` (vec_id, v): subvector split, per-subspace
    * k-means codebooks, byte-code encoding, asymmetric-distance scoring,
    * exact re-rank — ends in `${p}top` (vec_id, cos_sim). */
  private def dkPqCtes(p: String): String =
    s"""${p}sub AS (SELECT vec_id, m.i AS sub_idx,
       |    v[m.i*$PqDsub+1 : m.i*$PqDsub+$PqDsub] AS subv
       |  FROM e, (SELECT unnest(generate_series(0, ${PqM - 1})) AS i) m),
       |${dkKmeansCtes(s"${p}km", s"${p}sub", Some("sub_idx"), "vec_id",
          "subv", PqNc, PqDsub, PqIters)},
       |${p}c AS (SELECT sub_idx, cid, cv FROM ${p}kmcents$PqIters),
       |${p}asg AS (SELECT s.vec_id, s.sub_idx, c.cid,
       |    row_number() OVER (PARTITION BY s.vec_id, s.sub_idx
       |      ORDER BY ((${dkDot("s.subv", "s.subv")}
       |        - (2.0 * ${dkDot("s.subv", "c.cv")}))
       |        + ${dkDot("c.cv", "c.cv")}) ASC, c.cid ASC) AS rn
       |  FROM ${p}sub s JOIN ${p}c c USING (sub_idx)),
       |${p}codes AS (SELECT vec_id, sub_idx, cid FROM ${p}asg WHERE rn = 1),
       |${p}q AS (SELECT sub_idx, subv AS qsub FROM ${p}sub WHERE vec_id = 0),
       |${p}lut AS (SELECT c.sub_idx, c.cid, ${dkDot("q.qsub", "c.cv")} AS pdot
       |  FROM ${p}c c JOIN ${p}q q USING (sub_idx)),
       |${p}scored AS (SELECT cd.vec_id,
       |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(
       |      list_sort(list(struct_pack(i := cd.sub_idx, p := pdot))),
       |      r -> r.p)), (a, b) -> a + b) AS approx_dot
       |  FROM ${p}codes cd JOIN ${p}lut USING (sub_idx, cid)
       |  GROUP BY cd.vec_id),
       |${p}cand AS (SELECT vec_id FROM ${p}scored WHERE vec_id <> 0
       |  ORDER BY approx_dot DESC, vec_id ASC LIMIT ${PqRerank * AnnK}),
       |${p}qq AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |${p}top AS (SELECT e.vec_id, ${dkCos("e.v", "qv")} AS cos_sim
       |  FROM e JOIN ${p}cand USING (vec_id), ${p}qq
       |  ORDER BY cos_sim DESC, vec_id ASC LIMIT $AnnK)""".stripMargin

  /** SQ8 pipeline over a CTE `e` (vec_id, v): per-dimension [min, max]
    * grid, 8-bit encoding (floor, saturating at 255), midpoint
    * reconstruction scored against the raw query, exact re-rank — ends
    * in `${p}top` (vec_id, cos_sim). Mirrors `Similarity.sqTopK`
    * expression-for-expression (same operator precedence in the code
    * and reconstruction arithmetic, same fold order in the dots). */
  private def dkSqCtes(p: String): String = {
    val recon = s"list_transform(generate_series(1, len(codes)), i -> " +
      s"mns[i] + (codes[i]::DOUBLE + 0.5) * (mxs[i] - mns[i]) / 256.0)"
    s"""${p}st AS (SELECT u.pos, min(e.v[u.pos]) AS mn, max(e.v[u.pos]) AS mx
       |  FROM e, unnest(generate_series(1, len(e.v))) AS u(pos)
       |  GROUP BY u.pos),
       |${p}sc AS (SELECT list(mn ORDER BY pos) AS mns,
       |    list(mx ORDER BY pos) AS mxs FROM ${p}st),
       |${p}cd AS (SELECT vec_id,
       |    list_transform(generate_series(1, len(v)), i ->
       |      CASE WHEN mxs[i] = mns[i] THEN 0::BIGINT
       |           ELSE least(255::BIGINT,
       |             floor((v[i] - mns[i]) / (mxs[i] - mns[i]) * 256.0)::BIGINT)
       |      END) AS codes
       |  FROM e, ${p}sc),
       |${p}q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |${p}ap AS (SELECT vec_id, ${dkDot(recon, "qv")} AS approx_dot
       |  FROM ${p}cd, ${p}sc, ${p}q),
       |${p}cand AS (SELECT vec_id FROM ${p}ap WHERE vec_id <> 0
       |  ORDER BY approx_dot DESC, vec_id ASC LIMIT ${SqRerank * AnnK}),
       |${p}qq AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |${p}top AS (SELECT e.vec_id, ${dkCos("e.v", "qv")} AS cos_sim
       |  FROM e JOIN ${p}cand USING (vec_id), ${p}qq
       |  ORDER BY cos_sim DESC, vec_id ASC LIMIT $AnnK)""".stripMargin
  }

  /** DuckDB replay of the d4 near-dup pair pipeline (no ORDER BY — also
    * the edge set of d7_embed_dedup_clusters). Buckets are
    * OCCUPANCY-SCALED ([[dkBucketBaseScaled]]) because the committed
    * d4/d7 plans derive their bit width from the corpus. */
  private lazy val d4OracleSql: String =
    s"""WITH ${dkBucketBaseScaled("")}
       |SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       |  ${dkCos("x.v", "y.v")} AS cos_sim
       |FROM ek x JOIN ek y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       |WHERE ${dkCos("x.v", "y.v")} >= $NearDupThreshold""".stripMargin

  /** DuckDB replay of e7_recall_bound: exact sampled ground truth plus
    * the e2/e5/e3/e6 shortlist pipelines — built from the SAME CTE
    * builders as those queries' standalone oracles, reduced to hit
    * counts. Only ids feed the counts, so bitwise cosine parity (which
    * the pipelines already have) is exactly what makes the recalls
    * engine-identical. */
  private lazy val e7OracleSql: String =
    s"""WITH e AS (SELECT vec_id, $toD AS v FROM embeddings),
       |en AS (SELECT vec_id, v, ${dkNorm("v")} AS nrm FROM e),
       |ap AS (SELECT x.vec_id, y.vec_id AS nb_id,
       |    ${dkDot("x.v", "y.v")} / (x.nrm * y.nrm) AS cos_sim
       |  FROM en x JOIN en y ON x.vec_id <> y.vec_id
       |  WHERE x.vec_id < $RecallSampleN),
       |rk AS (SELECT vec_id, nb_id,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos_sim DESC, nb_id ASC) AS rank FROM ap),
       |ex3 AS (SELECT vec_id, nb_id FROM rk WHERE rank <= $LshK),
       |ex10 AS (SELECT nb_id AS vec_id FROM rk
       |  WHERE vec_id = 0 AND rank <= $AnnK),
       |${dkBucketBase("b")},
       |${dkLshPairs("s", "bek", multiProbe = false)},
       |r2 AS (SELECT vec_id, nb_id FROM sr WHERE rank <= $LshK),
       |${dkLshPairs("h", "bek", multiProbe = true)},
       |r5 AS (SELECT vec_id, nb_id FROM hr WHERE rank <= $LshK),
       |${dkIvfCtes("i")},
       |${dkPqCtes("p")},
       |m AS (
       |  SELECT 'e2_ann_lsh' AS method,
       |    (SELECT count(*) FROM r2 JOIN ex3 USING (vec_id, nb_id)) AS hits,
       |    (SELECT count(*) FROM ex3) AS total, 0.10 AS bound
       |  UNION ALL SELECT 'e5_ann_multiprobe',
       |    (SELECT count(*) FROM r5 JOIN ex3 USING (vec_id, nb_id)),
       |    (SELECT count(*) FROM ex3), 0.40
       |  UNION ALL SELECT 'e3_ivf',
       |    (SELECT count(*) FROM itop JOIN ex10 USING (vec_id)),
       |    (SELECT count(*) FROM ex10), 0.85
       |  UNION ALL SELECT 'e6_pq',
       |    (SELECT count(*) FROM ptop JOIN ex10 USING (vec_id)),
       |    (SELECT count(*) FROM ex10), 0.90)
       |SELECT method, hits, total,
       |  CAST(hits AS DOUBLE) / CAST(total AS DOUBLE) AS recall,
       |  (CAST(hits AS DOUBLE) / CAST(total AS DOUBLE)) >= bound AS pass
       |FROM m ORDER BY method""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // Brute-force exact cosine top-k for one query vector — the ANN
    // baseline: broadcast query, one scan, per-partition top-k merge.
    QueryDef("e1_cosine_topk",
      (s, dir) => Similarity.bruteForceTopK(
        Tables.embeddings(s, dir), queryId = 0L, k = AnnK),
      s"""WITH e AS (SELECT vec_id, $toD AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
         |SELECT e.vec_id, ${dkCos("e.v", "qv")} AS cos_sim
         |FROM e, q WHERE e.vec_id <> 0
         |ORDER BY cos_sim DESC, vec_id ASC LIMIT $AnnK""".stripMargin),

    // LSH-bucketed ANN: per-vector top-3 neighbors within the same
    // axis-sign bucket (candidate space shrinks from O(n²) to
    // O(Σ bucket²); bucket join is a plain equality shuffle).
    // CALIBRATION-SCALE ROW: the fixed single-bucket probe's recall
    // collapses as the corpus grows (identity 0.007 at 100× —
    // BASELINE.md), so the method now REFUSES bucket widths past
    // Similarity.CalibrationMaxBits — this row stays registered as
    // the mechanism-correctness oracle for the bucketing itself,
    // inside the enforced envelope. The ASSERTED-at-scale ANN rows
    // are e5/e10 (query-directed multi-probe, quality floor certified
    // at 10×/100× by tools/ScaleBench).
    QueryDef("e2_ann_lsh_topk",
      (s, dir) => Similarity.lshTopKNeighbors(
        Tables.embeddings(s, dir), bits = LshBits, k = LshK)
        .orderBy("vec_id", "rank"),
      s"""WITH ${dkBucketBase("")},
         |${dkLshPairs("", "ek", multiProbe = false)}
         |SELECT vec_id, nb_id, cos_sim, rank FROM r WHERE rank <= $LshK
         |ORDER BY vec_id, rank""".stripMargin),

    // Multi-probe LSH ANN: each vector also searches Hamming-1 neighbor
    // buckets — measured recall 0.125 → 0.473 vs exact top-3 for ~5×
    // candidates (see Similarity scaladoc for the trade).
    QueryDef("e5_ann_multiprobe_topk",
      (s, dir) => Similarity.lshTopKNeighborsMultiProbe(
        Tables.embeddings(s, dir), bits = LshBits, k = LshK,
        maxHamming = MaxHamming)
        .orderBy("vec_id", "rank"),
      s"""WITH ${dkBucketBase("")},
         |${dkLshPairs("", "ek", multiProbe = true)}
         |SELECT vec_id, nb_id, cos_sim, rank FROM r WHERE rank <= $LshK
         |ORDER BY vec_id, rank""".stripMargin),

    // Query-directed multi-probe LSH (Lv et al. VLDB'07 shape): probes
    // the 2^2 = 4 buckets reached by flipping subsets of each vector's
    // 2 LOWEST-MARGIN bits (smallest |coordinate|) instead of a uniform
    // Hamming ball — better recall per probe, and the probe count stays
    // fixed as the bit width grows, which is what lets the scaled ANN
    // certification hold an e5-family recall floor at 10×/100× corpora
    // (ScaleBench + BASELINE.md). The oracle replays the margin ranking
    // (struct sort, position tie-break) and the subset masks exactly.
    QueryDef("e10_ann_query_directed",
      (s, dir) => Similarity.lshTopKNeighborsQueryDirected(
        Tables.embeddings(s, dir), bits = LshBits, k = LshK,
        probeBits = QdProbeBits)
        .orderBy("vec_id", "rank"),
      {
        val maskExpr = (0 until QdProbeBits).map { t =>
          s"(((m.m >> $t) & 1) * (1::BIGINT << low[${t + 1}]))"
        }.mkString("\n      + ")
        val maskList =
          (0 until (1 << QdProbeBits)).mkString("[", ", ", "]")
        s"""WITH ${dkBucketBase("")},
           |lw AS (SELECT vec_id, v, bucket,
           |    list_transform(list_slice(list_sort(
           |      list_transform(range(0, $LshBits),
           |        j -> {'a': abs(v[j+1]), 'j': j})),
           |      1, $QdProbeBits), s -> s.j) AS low
           |  FROM ek),
           |px AS (SELECT vec_id, v,
           |    xor(bucket::BIGINT, $maskExpr) AS probe
           |  FROM lw, unnest($maskList::BIGINT[]) AS m(m)),
           |p AS (SELECT x.vec_id, y.vec_id AS nb_id,
           |    ${dkCos("x.v", "y.v")} AS cos_sim
           |  FROM px x JOIN ek y ON x.probe = y.bucket::BIGINT
           |    AND x.vec_id <> y.vec_id),
           |r AS (SELECT vec_id, nb_id, cos_sim,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY cos_sim DESC, nb_id ASC) AS rank FROM p)
           |SELECT vec_id, nb_id, cos_sim, rank FROM r WHERE rank <= $LshK
           |ORDER BY vec_id, rank""".stripMargin
      }),

    // SQL-surface variant: the same brute-force top-k expressed in pure
    // SQL against the registered `array_cosine` function
    // (GraftExtensions / GraftFunctions) — proves the custom expression
    // is a first-class SQL citizen, not just a DataFrame helper.
    QueryDef("e4_sql_cosine_topk",
      (s, dir) => {
        GraftFunctions.register(s)
        Tables.embeddings(s, dir).createOrReplaceTempView("embeddings_v")
        s.sql("""
          |WITH e AS (SELECT vec_id,
          |    transform(embedding, x -> cast(x AS double)) AS v
          |  FROM embeddings_v),
          |q AS (SELECT v AS qv FROM e WHERE vec_id = 1)
          |SELECT e.vec_id, array_cosine(e.v, qv) AS cos_sim
          |FROM e, q WHERE e.vec_id <> 1
          |ORDER BY cos_sim DESC, vec_id ASC LIMIT 5""".stripMargin)
      },
      s"""WITH e AS (SELECT vec_id, $toD AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 1)
         |SELECT e.vec_id, ${dkCos("e.v", "qv")} AS cos_sim
         |FROM e, q WHERE e.vec_id <> 1
         |ORDER BY cos_sim DESC, vec_id ASC LIMIT 5""".stripMargin),

    // IVF approximate top-k: 8 centroids seeded from the first 8 vectors
    // and refined by 2 deterministic Lloyd rounds, cell assignment by
    // nearest centroid, probe the query's 2 nearest cells, exact cosine
    // within the probed cells. The scale path that beats LSH when bucket
    // sizes skew: cells are explicit and probe count tunes recall vs
    // scan fraction.
    QueryDef("e3_ivf_topk",
      (s, dir) => Similarity.ivfTopK(
        Tables.embeddings(s, dir), nCentroids = IvfNc, nProbe = IvfProbe,
        queryId = 0L, k = AnnK, trainIters = IvfIters),
      s"""WITH e AS (SELECT vec_id, $toD AS v FROM embeddings),
         |${dkIvfCtes("i")}
         |SELECT vec_id, cos_sim FROM itop
         |ORDER BY cos_sim DESC, vec_id ASC""".stripMargin),

    // Product-quantization ANN: 8×8-dim subspaces, 32-centroid codebooks
    // trained per-subspace by 3 deterministic Lloyd rounds,
    // asymmetric-distance scoring over the stored byte codes, exact
    // re-rank of the top-40. The tier a 100 TB embedding store actually
    // deploys: codes are m bytes/vector, so the scoring scan never
    // touches full vectors.
    QueryDef("e6_pq_topk",
      (s, dir) => Similarity.pqTopK(
        Tables.embeddings(s, dir), m = PqM, dsub = PqDsub,
        nCentroids = PqNc, queryId = 0L, k = AnnK, rerank = PqRerank,
        trainIters = PqIters),
      s"""WITH e AS (SELECT vec_id, $toD AS v FROM embeddings),
         |${dkPqCtes("p")}
         |SELECT vec_id, cos_sim FROM ptop
         |ORDER BY cos_sim DESC, vec_id ASC""".stripMargin),

    // Scalar-quantization (SQ8) ANN: every dimension compressed to an
    // 8-bit code against per-dimension corpus [min, max] bounds — the
    // training-free 8× compression tier between brute force and PQ.
    // Midpoint-reconstruction scoring against the raw query, exact
    // re-rank of the top-40. The oracle replays the quantization grid,
    // encoding, and fold arithmetic exactly.
    QueryDef("e8_sq_topk",
      (s, dir) => Similarity.sqTopK(
        Tables.embeddings(s, dir), queryId = 0L, k = AnnK,
        rerank = SqRerank),
      s"""WITH e AS (SELECT vec_id, $toD AS v FROM embeddings),
         |${dkSqCtes("s")}
         |SELECT vec_id, cos_sim FROM stop
         |ORDER BY cos_sim DESC, vec_id ASC""".stripMargin),

    // ANN recall as a CORRECTNESS-checked quantity: recall of the e2/e5
    // (per-vector top-3) and e3/e6 (query top-10) shortlists against the
    // exact top-k, computed INSIDE the query — the measured recall is no
    // longer just a scaladoc claim. Per-vector recall (e2/e5) is measured
    // over a DETERMINISTIC FIXED-COUNT query sample (vec_id < 150): the
    // exact ground truth is then O(sample × corpus) with the sample size
    // CONSTANT in corpus size — a proportional (1-in-10) sample would make
    // the ground-truth pass quadratic at scale, and a full n² ground truth
    // would cost more than the indexes it certifies. The `pass` bounds are floor claims
    // for the fixture distribution: LSH single-probe is honest-but-weak
    // (≥0.10), multi-probe ≥0.40, IVF ≥0.85 (measured 0.90), trained PQ
    // ≥0.90 (measured 1.00).
    QueryDef("e7_recall_bound",
      (s, dir) => recallBound(s, dir, pqRerank = PqRerank),
      e7OracleSql),
    // Embedding-cosine near-duplicate pairs (bucketed candidates,
    // threshold 0.35 — the fixtures' max pair similarity is ~0.51).
    // The bit width is OCCUPANCY-SCALED from the corpus count (one
    // metadata-cheap count(), then Similarity.occupancyBits): constant
    // ~125-vector buckets at any corpus, so the per-bucket pair join
    // never re-grows quadratically and the SkewGuard cap stops binding
    // at 100× (the round-6 verdict's top item). The oracle derives the
    // same width from count(*) with the same integer rule.
    QueryDef("d4_embed_neardup",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.nearDupPairs(emb,
          bits = Similarity.occupancyBits(emb.count(), LshBits,
            LshCalib, LshMaxBits),
          threshold = NearDupThreshold)
          .orderBy("vec_a", "vec_b")
      },
      d4OracleSql + "\nORDER BY vec_a, vec_b"),

    // Embedding near-dup pairs → dedup clusters: the d6 connected-
    // components pass over the d4 edge set — "keep one of each
    // semantically-duplicated group" for an embedding corpus. Oracle
    // replays the closure with a recursive CTE over the d4 pipeline.
    QueryDef("d7_embed_dedup_clusters",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val pairs = Similarity.nearDupPairs(emb,
            bits = Similarity.occupancyBits(emb.count(), LshBits,
              LshCalib, LshMaxBits),
            threshold = NearDupThreshold)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
        TextDedup.dedupClusters(
          emb.select(col("vec_id").as("doc_id")), pairs)
          .orderBy("doc_id")
      },
      s"""WITH RECURSIVE pairs AS ($d4OracleSql),
         |edges AS (SELECT vec_a AS a, vec_b AS b FROM pairs
         |          UNION SELECT vec_b, vec_a FROM pairs),
         |reach AS (SELECT a, b FROM edges
         |          UNION SELECT r.a, e2.b FROM reach r
         |                JOIN edges e2 ON r.b = e2.a),
         |m AS (SELECT a AS doc_id, min(b) AS min_reach FROM reach GROUP BY a)
         |SELECT emb.vec_id AS doc_id,
         |  least(emb.vec_id, coalesce(m.min_reach, emb.vec_id)) AS cluster_id
         |FROM embeddings emb LEFT JOIN m ON m.doc_id = emb.vec_id
         |ORDER BY doc_id""".stripMargin),

    // SemDeDup-style semantic dedup: k-means clusters (same deterministic
    // trainer as e3), within-cluster cosine >= threshold marks the
    // higher-id vector a duplicate. The candidate space is per-cluster,
    // not all-pairs — the embedding-dedup shape that scales by growing
    // the cluster count with the corpus. Oracle replays training,
    // assignment, and the pair pass.
    QueryDef("d11_semdedup",
      (s, dir) => Similarity.semDedup(
        Tables.embeddings(s, dir), nCentroids = SemNc,
        trainIters = SemIters, threshold = NearDupThreshold)
        .orderBy("vec_id"),
      s"""WITH e AS (SELECT vec_id, $toD AS v FROM embeddings),
         |${dkKmeansCtes("dkm", "e", None, "vec_id", "v", SemNc, Dim,
            SemIters)},
         |dc AS (SELECT cid, cv FROM dkmcents$SemIters),
         |da AS (SELECT e.vec_id, dc.cid, e.v,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ((${dkDot("e.v", "e.v")}
         |        - (2.0 * ${dkDot("e.v", "dc.cv")}))
         |        + ${dkDot("dc.cv", "dc.cv")}) ASC, dc.cid ASC) AS rn
         |  FROM e CROSS JOIN dc),
         |dasg AS (SELECT vec_id, cid, v FROM da WHERE rn = 1),
         |dkeep AS (SELECT cid FROM dasg GROUP BY cid
         |  HAVING count(*) <= $SemMaxCluster),
         |dcap AS (SELECT dasg.* FROM dasg JOIN dkeep USING (cid)),
         |ddrop AS (SELECT DISTINCT x.vec_id
         |  FROM dcap x JOIN dcap y ON x.cid = y.cid
         |    AND x.vec_id > y.vec_id
         |  WHERE ${dkCos("x.v", "y.v")} >= $NearDupThreshold)
         |SELECT a.vec_id, a.cid, (d.vec_id IS NULL) AS kept
         |FROM dasg a LEFT JOIN ddrop d USING (vec_id)
         |ORDER BY a.vec_id""".stripMargin),

    // e9: MMR diversified top-k — relevance minus redundancy over the
    // exact top-20 shortlist (wRel=0.7, wDiv=0.3; the weights are pinned
    // as literals on BOTH sides — `1.0 - 0.7` computed at runtime is
    // 0.30000000000000004, not the literal 0.3). The oracle unrolls the
    // greedy loop step-for-step: each CTE excludes the already-picked
    // set, takes max-similarity-to-picked per candidate, and argmaxes
    // the score with the vec_id tiebreak — same replay idiom as the
    // k-means training CTEs.
    QueryDef("e9_mmr_topk",
      (s, dir) => Similarity.mmrTopK(Tables.embeddings(s, dir),
        queryId = 0L, k = MmrK, shortlist = MmrShortlist,
        wRel = 0.7, wDiv = 0.3)
        .orderBy("mmr_rank"),
      dkMmr(MmrK, MmrShortlist))
  )

  /** Unrolled MMR greedy CTEs (see e9 above). */
  private def dkMmr(k: Int, shortlist: Int): String = {
    val steps = (2 to k).map { i =>
      val selu = (1 until i).map(j => s"SELECT vec_id, v FROM sel$j")
        .mkString(" UNION ALL ")
      s"""selu${i - 1} AS ($selu),
         |sel$i AS (
         |  SELECT vec_id, cos_sim, v, $i AS mmr_rank,
         |    0.7 * cos_sim - 0.3 * mx AS mmr_score
         |  FROM (
         |    SELECT c.vec_id, c.cos_sim, c.v,
         |      max(${dkCos("c.v", "s.v")}) AS mx
         |    FROM short c, selu${i - 1} s
         |    WHERE c.vec_id NOT IN (SELECT vec_id FROM selu${i - 1})
         |    GROUP BY c.vec_id, c.cos_sim, c.v) t
         |  ORDER BY mmr_score DESC, vec_id ASC LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to k).map(i =>
      s"SELECT vec_id, mmr_rank, cos_sim, mmr_score FROM sel$i")
      .mkString(" UNION ALL ")
    s"""WITH e AS (SELECT vec_id, $toD AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |short AS (SELECT e.vec_id, ${dkCos("e.v", "qv")} AS cos_sim, e.v
       |  FROM e, q WHERE e.vec_id <> 0
       |  ORDER BY cos_sim DESC, vec_id ASC LIMIT $shortlist),
       |sel1 AS (SELECT vec_id, cos_sim, v, 1 AS mmr_rank,
       |    cos_sim AS mmr_score
       |  FROM short ORDER BY cos_sim DESC, vec_id ASC LIMIT 1),
       |$steps
       |SELECT vec_id, mmr_rank::BIGINT AS mmr_rank, cos_sim, mmr_score
       |FROM ($unionAll) ORDER BY mmr_rank""".stripMargin
  }

  /** e7's recall computation as a reusable method: recall of the e2/e5
    * (per-vector top-3) and e3/e6 (query top-10) shortlists against the
    * exact top-k, with the PQ re-rank width injectable. The e7 QueryDef
    * pins `pqRerank = PqRerank` so the oracle replay stays literal;
    * [[recallBoundScaled]] derives it from the corpus instead. */
  private[graft] def recallBound(s: org.apache.spark.sql.SparkSession,
      dir: String, pqRerank: Int, pqSeedSpread: Long = 0L): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val e = emb.select(col("vec_id"),
      VectorFns.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorFns.norm(col("v")))
    val ap = e.filter(col("vec_id") < RecallSampleN).as("x").join(e.as("y"),
        col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("nb_id"),
        (VectorFns.dot(col("x.v"), col("y.v"))
          / (col("x.nrm") * col("y.nrm"))).as("cos_sim"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos_sim").desc, col("nb_id").asc)
    val ranked = ap.withColumn("rank", row_number().over(w))
    // localize the ground truth: each recallRow below references its
    // exact set twice (hits + total), and four rows share this
    // lineage — without materialization the sample×corpus scoring
    // pass would execute up to 8 times in the unioned plan. Both
    // sets are tiny (3·sample and k rows) and deterministic.
    val ex3 = Similarity.localizeSmall(
      ranked.filter(col("rank") <= LshK).select("vec_id", "nb_id"))
    val ex10 = Similarity.localizeSmall(
      ranked.filter(col("vec_id") === 0 && col("rank") <= AnnK)
        .select(col("nb_id").as("vec_id")))
    def recallRow(name: String, got: DataFrame, exact: DataFrame,
        joinCols: Seq[String], bound: Double) =
      got.join(org.apache.spark.sql.functions.broadcast(exact),
          joinCols, "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(exact.agg(count(lit(1)).as("total")))
        .select(
          lit(name).as("method"),
          col("hits"), col("total"),
          (col("hits").cast("double") / col("total").cast("double"))
            .as("recall"))
        .withColumn("pass", col("recall") >= lit(bound))
    // the recall semi-joins consume only the SAMPLE vectors' shortlists
    // (ex3 holds vec_id < RecallSampleN alone), so the e2/e5 pipelines
    // compute per-vector top-k just for the sample — the candidate side
    // stays the full corpus, so each sampled vector's shortlist (hence
    // hits) is bit-identical to the unrestricted pipelines'
    val sample = Some(col("vec_id") < RecallSampleN)
    val r2 = recallRow("e2_ann_lsh",
      Similarity.lshTopKNeighbors(emb, bits = LshBits, k = LshK,
        querySide = sample)
        .select("vec_id", "nb_id"),
      ex3, Seq("vec_id", "nb_id"), 0.10)
    val r5 = recallRow("e5_ann_multiprobe",
      Similarity.lshTopKNeighborsMultiProbe(emb, bits = LshBits,
        k = LshK, maxHamming = MaxHamming, querySide = sample)
        .select("vec_id", "nb_id"),
      ex3, Seq("vec_id", "nb_id"), 0.40)
    val r3 = recallRow("e3_ivf",
      Similarity.ivfTopK(emb, nCentroids = IvfNc, nProbe = IvfProbe,
        queryId = 0L, k = AnnK, trainIters = IvfIters).select("vec_id"),
      ex10, Seq("vec_id"), 0.85)
    val r6 = recallRow("e6_pq",
      Similarity.pqTopK(emb, m = PqM, dsub = PqDsub, nCentroids = PqNc,
        queryId = 0L, k = AnnK, rerank = pqRerank,
        trainIters = PqIters, seedSpread = pqSeedSpread).select("vec_id"),
      ex10, Seq("vec_id"), 0.90)
    r2.unionByName(r5).unionByName(r3).unionByName(r6)
      .orderBy("method")
  }

  /** ANN quality certification at a SCALED corpus — what ScaleBench
    * asserts on ScaleGen derivatives: e2/e5/e3 keep their identity-
    * recall floors; e6 (PQ) is held to a top-k QUALITY RATIO ≥ 0.95
    * (sum of true cosines of the returned top-k over sum of true
    * cosines of the exact top-k — the ANN-benchmarks "epsilon recall"
    * style metric), under a corpus-scaled configuration
    * (seed-spread codebook training + proportional exact re-rank).
    *
    * Why quality ratio for PQ at scale (measured, BASELINE.md): at
    * sf0.1 (2k vectors) the fixed config gives identity recall 1.0; at
    * the 10× decorrelated corpus (20k) the SAME config measured 0.50 —
    * and the scaled corpus' exact top-10 for the probe query is partly
    * a NOISE TAIL (8 of 10 are cross-replica vectors at cosine
    * 0.40-0.47, separated by gaps of ~0.001-0.02, below quantization
    * resolution), so identity recall near the tail measures
    * tie-breaking as much as index quality. The scaled config restores
    * identity 0.90 / quality 1.0 at 10× (RecallProbe sweep), and the
    * asserted floor is the quality ratio — what a user gets: neighbors
    * within a whisker of the true best. */
  def recallBoundScaled(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val corpus = Tables.embeddings(s, dir).count()
    // base calibration corpus: sf0.1's 2,000 vectors — where the fixed
    // e7 config (rerank=4, 32 first-id seeds) measures recall 1.0
    val mult = math.max(1L, math.ceil(corpus / 2000.0).toLong)
    val targetSeeds = math.min(256L, PqNc * mult)
    val pqRerank = Similarity.scaledRerank(corpus, PqRerank, 2000L)
    // at the calibration scale keep the oracle-pinned first-id seeds;
    // beyond it, train on a corpus-spread sample with a codebook grown
    // until the 256-centroid cap
    val pqSeedSpread =
      if (mult <= 1L) 0L else math.max(2L, corpus / targetSeeds)
    // LSH bits grow with the corpus to keep BUCKET OCCUPANCY constant
    // (~125 vectors/bucket, the calibration density): with fixed bits
    // the bucket self-join is quadratic in corpus size — at the 100×
    // corpus, 4 bits = 16 buckets × 12.5k vectors = 2.5B candidate
    // pairs, which exhausted a 79 GB local disk (measured; the same
    // cell-occupancy rule as the PQ codebook above, and the same
    // integer rule the committed d4/d7 plans and their oracle use).
    val lshBits = Similarity.occupancyBits(corpus, LshBits,
      LshCalib, LshMaxBits)

    val emb = Tables.embeddings(s, dir)
    val e = emb.select(col("vec_id"),
      VectorFns.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorFns.norm(col("v")))
    val ap = e.filter(col("vec_id") < RecallSampleN).as("x").join(e.as("y"),
        col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("nb_id"),
        (VectorFns.dot(col("x.v"), col("y.v"))
          / (col("x.nrm") * col("y.nrm"))).as("cos_sim"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos_sim").desc, col("nb_id").asc)
    val ranked = ap.withColumn("rank", row_number().over(w))
    // ONE localized ground-truth pass feeds every row below (the
    // sample×corpus scoring would otherwise re-execute per reference)
    val top = Similarity.localizeSmall(
      ranked.filter(col("rank") <= AnnK)
        .select("vec_id", "nb_id", "cos_sim", "rank"))
    val ex3 = top.filter(col("rank") <= LshK).select("vec_id", "nb_id")
    // sample exact top-3 WITH cosines: the e5 quality-ratio denominator
    val ex3c = top.filter(col("rank") <= LshK)
      .select("vec_id", "nb_id", "cos_sim")
    // query 0's exact top-10 ids + cosines: identity set and the
    // quality-ratio denominator
    val exCos = top.filter(col("vec_id") === 0)
      .select(col("nb_id").as("vec_id"), col("cos_sim"))
    val ex10 = exCos.select("vec_id")

    def identityRow(name: String, got: DataFrame, exact: DataFrame,
        joinCols: Seq[String], bound: Option[Double]) =
      got.join(org.apache.spark.sql.functions.broadcast(exact),
          joinCols, "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(exact.agg(count(lit(1)).as("total")))
        .select(lit(name).as("method"),
          (col("hits").cast("double") / col("total").cast("double"))
            .as("recall"),
          lit(null).cast("double").as("quality"))
        .withColumn("pass",
          bound.map(b => col("recall") >= lit(b)).getOrElse(lit(true)))

    // e2 (single-probe sign-LSH) no longer appears at scale: its
    // recall decays with corpus size by construction (P[shared
    // bucket] falls per added bit — measured 0.007 at 100×), and no
    // fixed-small-probe config escapes that argument, so rather than
    // reporting a floor-less observability row the METHOD now refuses
    // bucket widths past Similarity.CalibrationMaxBits. The
    // fixture-scale floor stays oracle-asserted in e7_recall_bound;
    // the at-scale LSH row is the query-directed prober below.
    // e5's SCALE configuration is the query-directed prober: 2^5 = 32
    // probes spent on the lowest-margin bit subsets, so per-vector
    // candidate volume stays ~constant under occupancy-preserving bits
    // (32 × ~125 vectors) while the probes sit exactly where a
    // neighbor's signs most plausibly flip — where the fixed Hamming
    // ball's recall decayed to 0.069 at 100×, this holds a measured
    // floor (BASELINE.md round-7 scaled ANN table). Asserted as a
    // QUALITY RATIO (sum of true cosines of the returned top-3 over
    // the exact top-3, sampled vectors) with identity recall reported
    // alongside: past the calibration corpus the exact per-vector
    // top-3 is densely tied mid-cosine mass (the e6 noise-tail
    // finding, measured), so identity there measures tie-breaking as
    // much as index quality; the quality ratio is what a user gets.
    // querySide pushes the sample INTO the prober (margin ranking and
    // probe explode run only for the 150 consumed vectors; candidate
    // side stays the full corpus, so per-vector shortlists are
    // identical to the post-filtered unrestricted call)
    val qdGot = Similarity.lshTopKNeighborsQueryDirected(emb,
        bits = lshBits, k = LshK,
        probeBits = math.min(QdScaledProbeBits, lshBits),
        querySide = Some(col("vec_id") < RecallSampleN))
      .select("vec_id", "nb_id", "cos_sim")
    val r5 = {
      val hits = qdGot.join(
          org.apache.spark.sql.functions.broadcast(ex3),
          Seq("vec_id", "nb_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
      val tot = ex3.agg(count(lit(1)).as("total"))
      val sums = qdGot.agg(
          org.apache.spark.sql.functions.sum("cos_sim").as("got_cos"))
        .crossJoin(ex3c.agg(
          org.apache.spark.sql.functions.sum("cos_sim").as("exact_cos")))
      hits.crossJoin(tot).crossJoin(sums)
        .select(lit("e5_ann_multiprobe").as("method"),
          (col("hits").cast("double") / col("total").cast("double"))
            .as("recall"),
          (col("got_cos") / col("exact_cos")).as("quality"))
        .withColumn("pass", col("quality") >= lit(E5QualityFloor))
    }
    val r3 = identityRow("e3_ivf",
      Similarity.ivfTopK(emb, nCentroids = IvfNc, nProbe = IvfProbe,
        queryId = 0L, k = AnnK, trainIters = IvfIters).select("vec_id"),
      ex10, Seq("vec_id"), Some(0.85))

    val pqGot = Similarity.localizeSmall(
      Similarity.pqTopK(emb, m = PqM, dsub = PqDsub,
        nCentroids = PqNc, queryId = 0L, k = AnnK, rerank = pqRerank,
        trainIters = PqIters, seedSpread = pqSeedSpread)
        .select("vec_id"))
    // true cosines of the RETURNED ids: one narrow corpus scan
    // (broadcast semi of 10 ids + broadcast 1-row query vector)
    val qv = Similarity.localizeSmall(
      e.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("nrm").as("qnrm")))
    val gotSum = e.join(
        org.apache.spark.sql.functions.broadcast(pqGot), Seq("vec_id"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(qv))
      .select((VectorFns.dot(col("v"), col("qv"))
        / (col("nrm") * col("qnrm"))).as("got_cos_one"))
      .agg(org.apache.spark.sql.functions.sum("got_cos_one").as("got_cos"))
    val exactSum = exCos
      .agg(org.apache.spark.sql.functions.sum("cos_sim").as("exact_cos"))
    val identity = pqGot.join(
        org.apache.spark.sql.functions.broadcast(ex10),
        Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val r6 = gotSum.crossJoin(exactSum).crossJoin(identity)
      .select(lit("e6_pq").as("method"),
        (col("hits").cast("double") / lit(AnnK.toDouble)).as("recall"),
        (col("got_cos") / col("exact_cos")).as("quality"))
      .withColumn("pass", col("quality") >= lit(0.95))

    r5.unionByName(r3).unionByName(r6)
      .orderBy("method")
  }
}
