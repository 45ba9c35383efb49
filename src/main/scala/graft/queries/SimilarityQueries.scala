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
  */
object SimilarityQueries {

  /** Lloyd rounds for IVF/PQ centroid training — one constant drives both
    * the Spark `trainIters` arguments and the unrolled oracle CTEs. */
  private val KmIters = 3

  /** DuckDB left-fold dot product of double lists `a`·`b` (b indexed). */
  private def dkDot(a: String, b: String) =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform($a, (x,i) -> x * $b[i])), (p,q) -> p + q)"
  private def dkNorm(a: String) = s"sqrt(${dkDot(a, a)})"
  private def dkCos(a: String, b: String) =
    s"(${dkDot(a, b)} / (${dkNorm(a)} * ${dkNorm(b)}))"
  private val toD = "list_transform(embedding, x -> x::DOUBLE)"
  /** Axis-sign LSH bucket over the first 4 coordinates (16 buckets). */
  private def dkBucket(e: String) = (0 until 4).map { j =>
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

  /** DuckDB replay of the d4 near-dup pair pipeline (no ORDER BY — also
    * the edge set of d7_embed_dedup_clusters). */
  private lazy val d4OracleSql: String =
    s"""WITH e AS (SELECT vec_id, $toD AS v,
       |    ${dkBucket("embedding")} AS bucket FROM embeddings),
       |keep AS (SELECT bucket FROM e GROUP BY bucket
       |  HAVING count(*) <= 100000),
       |ek AS (SELECT e.* FROM e JOIN keep USING (bucket))
       |SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       |  ${dkCos("x.v", "y.v")} AS cos_sim
       |FROM ek x JOIN ek y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       |WHERE ${dkCos("x.v", "y.v")} >= 0.35""".stripMargin

  /** DuckDB replay of e7_recall_bound: exact all-pairs ground truth plus
    * the e2/e5/e3/e6 shortlist pipelines (the same CTE bodies as their own
    * oracles, kmeans training included), reduced to hit counts. Only ids
    * feed the counts, so bitwise cosine parity (which the pipelines
    * already have) is exactly what makes the recalls engine-identical. */
  private lazy val e7OracleSql: String = {
    val masks = (0 until 16).filter(Integer.bitCount(_) <= 1)
      .mkString("[", ", ", "]")
    val dsub = 8
    def sl(v: String) = s"$v[m.i*$dsub+1 : m.i*$dsub+$dsub]"
    s"""WITH e AS (SELECT vec_id, $toD AS v FROM embeddings),
       |en AS (SELECT vec_id, v, ${dkNorm("v")} AS nrm FROM e),
       |ap AS (SELECT x.vec_id, y.vec_id AS nb_id,
       |    ${dkDot("x.v", "y.v")} / (x.nrm * y.nrm) AS cos_sim
       |  FROM en x JOIN en y ON x.vec_id <> y.vec_id
       |  WHERE x.vec_id % 10 = 0),
       |rk AS (SELECT vec_id, nb_id,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos_sim DESC, nb_id ASC) AS rank FROM ap),
       |ex3 AS (SELECT vec_id, nb_id FROM rk WHERE rank <= 3),
       |ex10 AS (SELECT nb_id AS vec_id FROM rk
       |  WHERE vec_id = 0 AND rank <= 10),
       |eb AS (SELECT vec_id, $toD AS v,
       |    ${dkBucket("embedding")} AS bucket FROM embeddings),
       |keep AS (SELECT bucket FROM eb GROUP BY bucket
       |  HAVING count(*) <= 100000),
       |ek AS (SELECT eb.* FROM eb JOIN keep USING (bucket)),
       |p2 AS (SELECT x.vec_id, y.vec_id AS nb_id,
       |    ${dkCos("x.v", "y.v")} AS cos_sim
       |  FROM ek x JOIN ek y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
       |r2 AS (SELECT vec_id, nb_id FROM (SELECT vec_id, nb_id,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos_sim DESC, nb_id ASC) AS rank FROM p2)
       |  WHERE rank <= 3),
       |px AS (SELECT vec_id, v, xor(bucket::BIGINT, m.mask) AS probe
       |  FROM ek, unnest($masks::BIGINT[]) AS m(mask)),
       |p5 AS (SELECT x.vec_id, y.vec_id AS nb_id,
       |    ${dkCos("x.v", "y.v")} AS cos_sim
       |  FROM px x JOIN ek y ON x.probe = y.bucket::BIGINT
       |    AND x.vec_id <> y.vec_id),
       |r5 AS (SELECT vec_id, nb_id FROM (SELECT vec_id, nb_id,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos_sim DESC, nb_id ASC) AS rank FROM p5)
       |  WHERE rank <= 3),
       |${dkKmeansCtes("ik", "e", None, "vec_id", "v", 8, 64, KmIters)},
       |ic AS (SELECT cid, cv FROM ikcents$KmIters),
       |ia AS (SELECT e.vec_id, ic.cid,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${dkCos("e.v", "ic.cv")} DESC, ic.cid ASC) AS rn
       |  FROM e CROSS JOIN ic),
       |icell AS (SELECT vec_id, cid FROM ia WHERE rn = 1),
       |iprobe AS (SELECT cid FROM ia WHERE vec_id = 0 AND rn <= 2),
       |icand AS (SELECT mm.vec_id FROM icell mm
       |  JOIN iprobe pr ON mm.cid = pr.cid WHERE mm.vec_id <> 0),
       |i10 AS (SELECT en.vec_id FROM en JOIN icand USING (vec_id),
       |    (SELECT v AS qv, nrm AS qnrm FROM en WHERE vec_id = 0) q
       |  ORDER BY ${dkDot("en.v", "q.qv")} / (en.nrm * q.qnrm) DESC,
       |    en.vec_id ASC LIMIT 10),
       |sub AS (SELECT vec_id, m.i AS sub_idx, ${sl("v")} AS subv
       |  FROM e, (SELECT unnest(generate_series(0, 7)) AS i) m),
       |${dkKmeansCtes("pk", "sub", Some("sub_idx"), "vec_id", "subv",
          32, dsub, KmIters)},
       |pc AS (SELECT sub_idx, cid, cv FROM pkcents$KmIters),
       |pasg AS (SELECT s.vec_id, s.sub_idx, c.cid,
       |    row_number() OVER (PARTITION BY s.vec_id, s.sub_idx
       |      ORDER BY ((${dkDot("s.subv", "s.subv")}
       |        - (2.0 * ${dkDot("s.subv", "c.cv")}))
       |        + ${dkDot("c.cv", "c.cv")}) ASC, c.cid ASC) AS rn
       |  FROM sub s JOIN pc c USING (sub_idx)),
       |pcodes AS (SELECT vec_id, sub_idx, cid FROM pasg WHERE rn = 1),
       |pq AS (SELECT sub_idx, subv AS qsub FROM sub WHERE vec_id = 0),
       |plut AS (SELECT c.sub_idx, c.cid, ${dkDot("pq.qsub", "c.cv")} AS pdot
       |  FROM pc c JOIN pq USING (sub_idx)),
       |pscored AS (SELECT pcodes.vec_id,
       |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(
       |      list_sort(list(struct_pack(i := pcodes.sub_idx, p := pdot))),
       |      r -> r.p)), (a, b) -> a + b) AS approx_dot
       |  FROM pcodes JOIN plut USING (sub_idx, cid) GROUP BY pcodes.vec_id),
       |pcand AS (SELECT vec_id FROM pscored WHERE vec_id <> 0
       |  ORDER BY approx_dot DESC, vec_id ASC LIMIT 40),
       |p10 AS (SELECT en.vec_id FROM en JOIN pcand USING (vec_id),
       |    (SELECT v AS qv, nrm AS qnrm FROM en WHERE vec_id = 0) q
       |  ORDER BY ${dkDot("en.v", "q.qv")} / (en.nrm * q.qnrm) DESC,
       |    en.vec_id ASC LIMIT 10),
       |m AS (
       |  SELECT 'e2_ann_lsh' AS method,
       |    (SELECT count(*) FROM r2 JOIN ex3 USING (vec_id, nb_id)) AS hits,
       |    (SELECT count(*) FROM ex3) AS total, 0.10 AS bound
       |  UNION ALL SELECT 'e5_ann_multiprobe',
       |    (SELECT count(*) FROM r5 JOIN ex3 USING (vec_id, nb_id)),
       |    (SELECT count(*) FROM ex3), 0.40
       |  UNION ALL SELECT 'e3_ivf',
       |    (SELECT count(*) FROM i10 JOIN ex10 USING (vec_id)),
       |    (SELECT count(*) FROM ex10), 0.85
       |  UNION ALL SELECT 'e6_pq',
       |    (SELECT count(*) FROM p10 JOIN ex10 USING (vec_id)),
       |    (SELECT count(*) FROM ex10), 0.90)
       |SELECT method, hits, total,
       |  CAST(hits AS DOUBLE) / CAST(total AS DOUBLE) AS recall,
       |  (CAST(hits AS DOUBLE) / CAST(total AS DOUBLE)) >= bound AS pass
       |FROM m ORDER BY method""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(

    // Brute-force exact cosine top-k for one query vector — the ANN
    // baseline: broadcast query, one scan, per-partition top-k merge.
    QueryDef("e1_cosine_topk",
      (s, dir) => Similarity.bruteForceTopK(
        Tables.embeddings(s, dir), queryId = 0L, k = 10),
      s"""WITH e AS (SELECT vec_id, $toD AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
         |SELECT e.vec_id, ${dkCos("e.v", "qv")} AS cos_sim
         |FROM e, q WHERE e.vec_id <> 0
         |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin),

    // LSH-bucketed ANN: per-vector top-3 neighbors within the same
    // axis-sign bucket — the scale path (candidate space shrinks from
    // O(n²) to O(Σ bucket²); bucket join is a plain equality shuffle).
    QueryDef("e2_ann_lsh_topk",
      (s, dir) => Similarity.lshTopKNeighbors(
        Tables.embeddings(s, dir), bits = 4, k = 3)
        .orderBy("vec_id", "rank"),
      s"""WITH e AS (SELECT vec_id, $toD AS v,
         |    ${dkBucket("embedding")} AS bucket FROM embeddings),
         |keep AS (SELECT bucket FROM e GROUP BY bucket
         |  HAVING count(*) <= 100000),
         |ek AS (SELECT e.* FROM e JOIN keep USING (bucket)),
         |p AS (SELECT x.vec_id, y.vec_id AS nb_id,
         |    ${dkCos("x.v", "y.v")} AS cos_sim
         |  FROM ek x JOIN ek y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
         |r AS (SELECT vec_id, nb_id, cos_sim,
         |    row_number() OVER (PARTITION BY vec_id
         |                       ORDER BY cos_sim DESC, nb_id ASC) AS rank
         |  FROM p)
         |SELECT vec_id, nb_id, cos_sim, rank FROM r WHERE rank <= 3
         |ORDER BY vec_id, rank""".stripMargin),

    // Multi-probe LSH ANN: each vector also searches Hamming-1 neighbor
    // buckets — measured recall 0.125 → 0.473 vs exact top-3 for ~5×
    // candidates (see Similarity scaladoc for the trade).
    QueryDef("e5_ann_multiprobe_topk",
      (s, dir) => Similarity.lshTopKNeighborsMultiProbe(
        Tables.embeddings(s, dir), bits = 4, k = 3, maxHamming = 1)
        .orderBy("vec_id", "rank"),
      {
        val masks = (0 until 16).filter(Integer.bitCount(_) <= 1)
          .mkString("[", ", ", "]")
        s"""WITH e AS (SELECT vec_id, $toD AS v,
           |    ${dkBucket("embedding")} AS bucket FROM embeddings),
           |keep AS (SELECT bucket FROM e GROUP BY bucket
           |  HAVING count(*) <= 100000),
           |ek AS (SELECT e.* FROM e JOIN keep USING (bucket)),
           |px AS (SELECT vec_id, v, xor(bucket::BIGINT, m.mask) AS probe
           |  FROM ek, unnest($masks::BIGINT[]) AS m(mask)),
           |p AS (SELECT x.vec_id, y.vec_id AS nb_id,
           |    ${dkCos("x.v", "y.v")} AS cos_sim
           |  FROM px x JOIN ek y ON x.probe = y.bucket::BIGINT
           |    AND x.vec_id <> y.vec_id),
           |r AS (SELECT vec_id, nb_id, cos_sim,
           |    row_number() OVER (PARTITION BY vec_id
           |                       ORDER BY cos_sim DESC, nb_id ASC) AS rank
           |  FROM p)
           |SELECT vec_id, nb_id, cos_sim, rank FROM r WHERE rank <= 3
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
    // and refined by 3 deterministic Lloyd rounds, cell assignment by
    // nearest centroid, probe the query's 2 nearest cells, exact cosine
    // within the probed cells. The scale path that beats LSH when bucket
    // sizes skew: cells are explicit and probe count tunes recall vs
    // scan fraction.
    QueryDef("e3_ivf_topk",
      (s, dir) => Similarity.ivfTopK(
        Tables.embeddings(s, dir), nCentroids = 8, nProbe = 2,
        queryId = 0L, k = 10, trainIters = KmIters),
      s"""WITH e AS (SELECT vec_id, $toD AS v FROM embeddings),
         |${dkKmeansCtes("k", "e", None, "vec_id", "v", 8, 64, KmIters)},
         |c AS (SELECT cid, cv FROM kcents$KmIters),
         |a AS (SELECT e.vec_id, c.cid, ${dkCos("e.v", "c.cv")} AS ccos,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${dkCos("e.v", "c.cv")} DESC, c.cid ASC) AS rn
         |  FROM e CROSS JOIN c),
         |cell AS (SELECT vec_id, cid FROM a WHERE rn = 1),
         |probe AS (SELECT cid FROM a WHERE vec_id = 0 AND rn <= 2),
         |cand AS (SELECT m.vec_id FROM cell m JOIN probe p ON m.cid = p.cid
         |  WHERE m.vec_id <> 0),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
         |SELECT e.vec_id, ${dkCos("e.v", "qv")} AS cos_sim
         |FROM e JOIN cand USING (vec_id), q
         |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin),

    // Product-quantization ANN: 8×8-dim subspaces, 32-centroid codebooks
    // trained per-subspace by 3 deterministic Lloyd rounds,
    // asymmetric-distance scoring over the stored byte codes, exact
    // re-rank of the top-40. The tier a 100 TB embedding store actually
    // deploys: codes are m bytes/vector, so the scoring scan never
    // touches full vectors.
    QueryDef("e6_pq_topk",
      (s, dir) => Similarity.pqTopK(
        Tables.embeddings(s, dir), m = 8, dsub = 8, nCentroids = 32,
        queryId = 0L, k = 10, rerank = 4, trainIters = KmIters),
      {
        val dsub = 8
        def sl(v: String) =
          s"$v[m.i*$dsub+1 : m.i*$dsub+$dsub]"
        s"""WITH e AS (SELECT vec_id, $toD AS v FROM embeddings),
           |sub AS (SELECT vec_id, m.i AS sub_idx, ${sl("v")} AS subv
           |  FROM e, (SELECT unnest(generate_series(0, 7)) AS i) m),
           |${dkKmeansCtes("k", "sub", Some("sub_idx"), "vec_id", "subv",
                32, dsub, KmIters)},
           |cents AS (SELECT sub_idx, cid, cv FROM kcents$KmIters),
           |asg AS (SELECT s.vec_id, s.sub_idx, c.cid,
           |    row_number() OVER (PARTITION BY s.vec_id, s.sub_idx
           |      ORDER BY ((${dkDot("s.subv", "s.subv")}
           |        - (2.0 * ${dkDot("s.subv", "c.cv")}))
           |        + ${dkDot("c.cv", "c.cv")}) ASC, c.cid ASC) AS rn
           |  FROM sub s JOIN cents c USING (sub_idx)),
           |codes AS (SELECT vec_id, sub_idx, cid FROM asg WHERE rn = 1),
           |q AS (SELECT sub_idx, subv AS qsub FROM sub WHERE vec_id = 0),
           |lut AS (SELECT c.sub_idx, c.cid, ${dkDot("q.qsub", "c.cv")} AS pdot
           |  FROM cents c JOIN q USING (sub_idx)),
           |scored AS (SELECT codes.vec_id,
           |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(
           |      list_sort(list(struct_pack(i := codes.sub_idx, p := pdot))),
           |      r -> r.p)), (a, b) -> a + b) AS approx_dot
           |  FROM codes JOIN lut USING (sub_idx, cid) GROUP BY codes.vec_id),
           |cand AS (SELECT vec_id FROM scored WHERE vec_id <> 0
           |  ORDER BY approx_dot DESC, vec_id ASC LIMIT 40)
           |SELECT e.vec_id, ${dkCos("e.v", "qq.qv")} AS cos_sim
           |FROM e JOIN cand USING (vec_id),
           |  (SELECT v AS qv FROM e WHERE vec_id = 0) qq
           |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin
      }),

    // ANN recall as a CORRECTNESS-checked quantity: recall of the e2/e5
    // (per-vector top-3) and e3/e6 (query top-10) shortlists against the
    // exact top-k, computed INSIDE the query — the measured recall is no
    // longer just a scaladoc claim. Per-vector recall (e2/e5) is measured
    // over a DETERMINISTIC 1-in-10 query sample (vec_id % 10 = 0): the
    // exact ground truth is a query-sample × corpus scoring pass, the
    // standard shape at scale — a full n² ground truth would cost more
    // than the indexes it certifies. The `pass` bounds are floor claims
    // for the fixture distribution: LSH single-probe is honest-but-weak
    // (≥0.10), multi-probe ≥0.40, IVF ≥0.85 (measured 0.90), trained PQ
    // ≥0.90 (measured 1.00).
    QueryDef("e7_recall_bound",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val e = emb.select(col("vec_id"),
          VectorFns.toDouble(col("embedding")).as("v"))
          .withColumn("nrm", VectorFns.norm(col("v")))
        val ap = e.filter(col("vec_id") % 10 === 0).as("x").join(e.as("y"),
            col("x.vec_id") =!= col("y.vec_id"))
          .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("nb_id"),
            (VectorFns.dot(col("x.v"), col("y.v"))
              / (col("x.nrm") * col("y.nrm"))).as("cos_sim"))
        val w = Window.partitionBy("vec_id")
          .orderBy(col("cos_sim").desc, col("nb_id").asc)
        val ranked = ap.withColumn("rank",
          row_number().over(w))
        val ex3 = ranked.filter(col("rank") <= 3).select("vec_id", "nb_id")
        val ex10 = ranked.filter(col("vec_id") === 0 && col("rank") <= 10)
          .select(col("nb_id").as("vec_id"))
        def recallRow(name: String, got: DataFrame,
            exact: DataFrame, joinCols: Seq[String],
            bound: Double) =
          got.join(exact, joinCols, "left_semi")
            .agg(count(lit(1)).as("hits"))
            .crossJoin(exact.agg(count(lit(1)).as("total")))
            .select(
              lit(name).as("method"),
              col("hits"), col("total"),
              (col("hits").cast("double") / col("total").cast("double"))
                .as("recall"))
            .withColumn("pass", col("recall") >=
              lit(bound))
        val r2 = recallRow("e2_ann_lsh",
          Similarity.lshTopKNeighbors(emb, bits = 4, k = 3)
            .select("vec_id", "nb_id"),
          ex3, Seq("vec_id", "nb_id"), 0.10)
        val r5 = recallRow("e5_ann_multiprobe",
          Similarity.lshTopKNeighborsMultiProbe(emb, bits = 4, k = 3,
            maxHamming = 1).select("vec_id", "nb_id"),
          ex3, Seq("vec_id", "nb_id"), 0.40)
        val r3 = recallRow("e3_ivf",
          Similarity.ivfTopK(emb, nCentroids = 8, nProbe = 2, queryId = 0L,
            k = 10, trainIters = KmIters).select("vec_id"),
          ex10, Seq("vec_id"), 0.85)
        val r6 = recallRow("e6_pq",
          Similarity.pqTopK(emb, m = 8, dsub = 8, nCentroids = 32,
            queryId = 0L, k = 10, rerank = 4, trainIters = KmIters)
            .select("vec_id"),
          ex10, Seq("vec_id"), 0.90)
        r2.unionByName(r5).unionByName(r3).unionByName(r6)
          .orderBy("method")
      },
      e7OracleSql),

    // Embedding-cosine near-duplicate pairs (bucketed candidates,
    // threshold 0.35 — the fixtures' max pair similarity is ~0.51).
    QueryDef("d4_embed_neardup",
      (s, dir) => Similarity.nearDupPairs(
        Tables.embeddings(s, dir), bits = 4, threshold = 0.35)
        .orderBy("vec_a", "vec_b"),
      d4OracleSql + "\nORDER BY vec_a, vec_b"),

    // Embedding near-dup pairs → dedup clusters: the d6 connected-
    // components pass over the d4 edge set — "keep one of each
    // semantically-duplicated group" for an embedding corpus. Oracle
    // replays the closure with a recursive CTE over the d4 pipeline.
    QueryDef("d7_embed_dedup_clusters",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val pairs = Similarity.nearDupPairs(emb, bits = 4, threshold = 0.35)
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
         |ORDER BY doc_id""".stripMargin)
  )
}
