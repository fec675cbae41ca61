package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.functions.Rounding.{sqlMirrorRound => mr}
import graft.functions.{Signatures => Sig}
import graft.functions.VectorFunctions.{sqlCosine, sqlFoldSum}
import graft.operators.{Similarity => Ops}
import graft.sources.Tables

/** Verified-query surface for the similarity operators (SURVEY.md §2c
  * S1–S4); implementations live in [[graft.operators.Similarity]] — these
  * entries bind them to the embeddings table, fix the deterministic
  * parameters (query set, plane matrix), and carry the DuckDB mirror SQL.
  */
object Similarity {

  private val NumQueries = 8
  private val TopK = 5
  private val NumPlanes = 8
  private val Dim = 64
  // hot-bucket document-frequency cap (the d05 pattern): the within-bucket
  // join is quadratic in bucket size; the cap is mirrored in the oracle SQL
  // and BINDS at every test sf (largest bucket: 9 @ sf0.01, 23 @ sf0.1)
  private val MaxBucketDf = 8

  /** Deterministic hyperplanes with small-integer components in [-5, 5]
    * (exactly representable as doubles → identical literals both engines).
    * Shared generator: [[graft.operators.Similarity.genPlanes]].
    */
  val planes: IndexedSeq[IndexedSeq[Int]] = Ops.genPlanes(NumPlanes, Dim)

  /** DuckDB mirror of [[Ops.lshBucket]] over column name `e`. */
  private def sqlBucket(e: String): String = {
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val planeLit = s"[${p.map(v => s"CAST($v AS DOUBLE)").mkString(", ")}]"
      val dot = sqlFoldSum(
        s"list_transform(range(1, len($e) + 1), i -> CAST($e[i] AS DOUBLE) * ($planeLit)[i])")
      s"CASE WHEN $dot > 0 THEN ${1L << j} ELSE 0 END"
    }
    s"CAST(${bits.mkString(" + ")} AS BIGINT)"
  }

  val s01 = QueryDef(
    "s01_knn_bruteforce",
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
       |           FROM embeddings WHERE vec_id < $NumQueries),
       |sc AS (SELECT query_id, e.vec_id AS neighbor_id,
       |         round(${sqlCosine("qv", "e.embedding")}, 6) AS cos
       |       FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id)
       |SELECT query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
       |  neighbor_id, cos
       |FROM sc
       |QUALIFY rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir, "embeddings")
    Ops.knnBruteForce(e, e.filter(col("vec_id") < NumQueries), "vec_id", "embedding", TopK)
      .orderBy("query_id", "rank")
  }

  val s02 = QueryDef(
    "s02_ann_lsh",
    s"""WITH b0 AS (SELECT vec_id, embedding, ${sqlBucket("embedding")} AS bucket
       |            FROM embeddings),
       |b AS (SELECT vec_id, embedding, bucket FROM (
       |  SELECT vec_id, embedding, bucket, count(*) OVER (PARTITION BY bucket) AS df
       |  FROM b0) WHERE df <= $MaxBucketDf),
       |p AS (SELECT a.vec_id AS vec_id, a.bucket AS bucket, b.vec_id AS nn_id,
       |        round(${sqlCosine("a.embedding", "b.embedding")}, 6) AS cos
       |      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
       |SELECT vec_id, bucket, nn_id, cos FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nn_id) AS rn
       |  FROM p) WHERE rn = 1
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    Ops.annLsh(Tables(s, dir, "embeddings"), "vec_id", "embedding", planes,
      maxBucketDf = MaxBucketDf)
      .orderBy("vec_id")
  }

  val s03 = QueryDef(
    "s03_centroids",
    s"""SELECT CAST(label AS BIGINT) AS label, CAST(r.i AS BIGINT) AS dim,
       |  round(avg(CAST(embedding[r.i + 1] AS DOUBLE)), 4) AS centroid
       |FROM embeddings CROSS JOIN range(0, $Dim) r(i)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Ops.centroids(Tables(s, dir, "embeddings"), "label", "embedding")
      .orderBy("label", "dim")
  }

  private val sqlCentroids =
    s"""cent AS (SELECT label, list(c ORDER BY i) AS cv FROM (
       |  SELECT label, r.i AS i, avg(CAST(embedding[r.i + 1] AS DOUBLE)) AS c
       |  FROM embeddings CROSS JOIN range(0, $Dim) r(i) GROUP BY 1, 2)
       |  GROUP BY label)""".stripMargin

  val s04 = QueryDef(
    "s04_ivf_knn",
    s"""WITH $sqlCentroids,
       |asg AS (SELECT vec_id, embedding, cell FROM (
       |  SELECT e.vec_id, e.embedding, CAST(c.label AS BIGINT) AS cell,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${sqlCosine("e.embedding", "c.cv")} DESC, c.label) AS rn
       |  FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, cell AS qcell
       |      FROM asg WHERE vec_id < $NumQueries),
       |sc AS (SELECT query_id, qcell AS cell, a.vec_id AS neighbor_id,
       |         round(${sqlCosine("qv", "a.embedding")}, 6) AS cos
       |       FROM asg a JOIN q ON a.cell = q.qcell AND a.vec_id <> q.query_id)
       |SELECT query_id, cell,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
       |  neighbor_id, cos
       |FROM sc QUALIFY rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir, "embeddings")
    Ops.ivfKnn(e, "vec_id", "embedding",
      Ops.centroidVectors(e, "label", "embedding"),
      isQuery = col("vec_id") < NumQueries, k = TopK)
      .orderBy("query_id", "rank")
  }

  /** s05: int8-quantized brute-force kNN
    * ([[Ops.quantizedKnn]]): per-vector scales cancel in cosine, so the
    * scan ranks on integer codes alone (1/4 the bytes of s01, exact
    * integer dot products — no float-sum ordering concerns). The oracle
    * reproduces the quantization arithmetic (`floor(x/scale + 0.5)`)
    * and the code-domain cosine exactly.
    */
  val s05 = QueryDef(
    "s05_quantized_knn",
    s"""WITH z AS (SELECT vec_id,
       |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx,
       |    embedding FROM embeddings),
       |c AS (SELECT vec_id,
       |    list_transform(embedding, x -> CASE WHEN mx = 0 THEN CAST(0 AS DOUBLE)
       |      ELSE floor(CAST(x AS DOUBLE) / (mx / 127.0) + 0.5) END) AS qv
       |  FROM z),
       |q AS (SELECT vec_id AS query_id, qv AS qq FROM c WHERE vec_id < $NumQueries),
       |sc AS (SELECT query_id, c.vec_id AS neighbor_id,
       |         round(${sqlCosine("qq", "c.qv")}, 6) AS cos
       |       FROM c CROSS JOIN q WHERE c.vec_id <> q.query_id)
       |SELECT query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
       |  neighbor_id, cos
       |FROM sc
       |QUALIFY rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir, "embeddings")
    Ops.quantizedKnn(e, e.filter(col("vec_id") < NumQueries), "vec_id", "embedding", TopK)
      .orderBy("query_id", "rank")
  }

  private val ProtoK = 8        // k-means cells (size n/k is the scale knob)
  private val ProtoKeepNum = 7L // keep the hardest 7/10 of every cell
  private val ProtoKeepDen = 10L

  /** s06: prototypicality pruning (Sorscher et al. 2022 —
    * [[graft.operators.Similarity.prototypePrune]]): deterministic
    * spherical k-means (the d09 seed→assign→update→assign chain,
    * unrolled in the oracle with its own salt), score = cosine to the
    * OWN cell centroid, keep each cell's hardest 7/10 — the keep
    * decision is the pure-integer crossing test rank·10 ≤ 7·n + 9
    * (⟺ rank ≤ ceil(0.7·n)), never a float threshold.
    */
  val s06 = QueryDef(
    "s06_prototype_prune",
    s"""WITH k0 AS (SELECT vec_id, embedding,
       |              'proto:' || CAST(vec_id AS VARCHAR) AS kk FROM embeddings),
       |h AS (SELECT vec_id, embedding,
       |        (${Sig.sqlPolyHashStr("kk")} * 2654435761) % 1000000007 AS hh
       |      FROM k0),
       |c0 AS (SELECT CAST(row_number() OVER (ORDER BY hh, vec_id) - 1 AS BIGINT) AS clabel,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
       |       FROM (SELECT * FROM h ORDER BY hh, vec_id LIMIT $ProtoK)),
       |a1 AS (SELECT vec_id, embedding, clabel AS cell FROM (
       |  SELECT e.vec_id, e.embedding, c.clabel,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${sqlCosine("e.embedding", "c.cv")} DESC, c.clabel) AS rn
       |  FROM embeddings e CROSS JOIN c0 c) WHERE rn = 1),
       |c1 AS (SELECT clabel, list(c ORDER BY i) AS cv FROM (
       |  SELECT cell AS clabel, r.i AS i, avg(CAST(embedding[r.i + 1] AS DOUBLE)) AS c
       |  FROM a1 CROSS JOIN range(0, $Dim) r(i) GROUP BY 1, 2) GROUP BY clabel),
       |a2 AS (SELECT vec_id, cell, cos FROM (
       |  SELECT e.vec_id, c.clabel AS cell,
       |    ${sqlCosine("e.embedding", "c.cv")} AS cos,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${sqlCosine("e.embedding", "c.cv")} DESC, c.clabel) AS rn
       |  FROM embeddings e CROSS JOIN c1 c) WHERE rn = 1),
       |r AS (SELECT vec_id, cell, cos,
       |        CAST(row_number() OVER (PARTITION BY cell ORDER BY cos, vec_id) AS BIGINT) AS proto_rank,
       |        CAST(count(*) OVER (PARTITION BY cell) AS BIGINT) AS n
       |      FROM a2)
       |SELECT vec_id, cell, ${mr("cos", 6)} AS cos, proto_rank,
       |  proto_rank * $ProtoKeepDen <= n * $ProtoKeepNum + ${ProtoKeepDen - 1} AS keep
       |FROM r ORDER BY vec_id""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    Ops.prototypePrune(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        k = ProtoK, iters = 1, keepNum = ProtoKeepNum, keepDen = ProtoKeepDen,
        salt = "proto:")
      .withColumn("cos", Rounding.mirrorRound(col("cos"), 6))
      .orderBy("vec_id")
  }

  /** s07: population covariance matrix of the embedding space
    * ([[Ops.covarianceMatrix]]) — the one-pass d²-buffer aggregation
    * behind PCA/whitening; the oracle recomputes every upper-triangle
    * entry with DuckDB's covar_pop over an exploded (row × i × j) set.
    */
  val s07 = QueryDef(
    "s07_covariance",
    s"""WITH pts AS (
       |  SELECT i.range AS i, j.range AS j,
       |         CAST(embedding[i.range] AS DOUBLE) AS x,
       |         CAST(embedding[j.range] AS DOUBLE) AS y
       |  FROM embeddings, range(1, ${Dim + 1}) i, range(1, ${Dim + 1}) j
       |  WHERE i.range <= j.range)
       |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       |  ${mr("avg(x)", 6)} AS mean_i, ${mr("avg(y)", 6)} AS mean_j,
       |  ${mr("covar_pop(x, y)", 6)} AS cov
       |FROM pts GROUP BY i, j ORDER BY i, j""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding.mirrorRound
    Ops.covarianceMatrix(Tables(s, dir, "embeddings"), "embedding")
      .select(col("i"), col("j"),
        mirrorRound(col("mean_i"), 6).as("mean_i"),
        mirrorRound(col("mean_j"), 6).as("mean_j"),
        mirrorRound(col("cov"), 6).as("cov"))
      .orderBy("i", "j")
  }

  /** s08: per-dimension z-score standardization ([[Ops.standardize]]) —
    * stats come from the same one-pass s07 buffer (no second scan); the
    * oracle recomputes mean/stddev_pop per dimension over the exploded
    * values. Raw x is a float→double cast (exact on both engines, no
    * rounding needed); z rounds at 6 dp.
    */
  val s08 = QueryDef(
    "s08_standardize",
    s"""WITH e AS (
       |  SELECT vec_id, r.range AS i, CAST(embedding[r.range] AS DOUBLE) AS x
       |  FROM embeddings, range(1, ${Dim + 1}) r),
       |st AS (SELECT i, avg(x) AS m, stddev_pop(x) AS sd FROM e GROUP BY 1)
       |SELECT vec_id, CAST(e.i AS BIGINT) AS i, e.x AS x,
       |  CASE WHEN st.sd > 0.0 THEN ${mr("(e.x - st.m) / st.sd", 6)}
       |       ELSE 0.0 END AS z
       |FROM e JOIN st USING (i) ORDER BY vec_id, i""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding.mirrorRound
    Ops.standardize(Tables(s, dir, "embeddings"), "vec_id", "embedding")
      .select(col("vec_id"), col("i"), col("x"),
        mirrorRound(col("z"), 6).as("z"))
      .orderBy("vec_id", "i")
  }

  /** s09: Matryoshka truncation ([[Ops.mrlTruncate]], S10) — half-dim
    * prefixes re-normalized to unit length, the flop/byte halving an
    * MRL-trained corpus gets before any ANN stage. The oracle restates
    * the left-to-right norm fold (the d05/s01 `sqlFoldSum` mirror) and
    * the per-element divide; 6 dp mirror-round absorbs the sqrt/divide
    * ulps. Output exploded to (vec_id, i, y, norm) rows for the
    * array-free compare (the s08 convention).
    */
  private val MrlD = Dim / 2
  val s09 = QueryDef(
    "s09_mrl_truncate",
    s"""WITH t AS (SELECT vec_id,
       |    sqrt(${sqlFoldSum(s"list_transform(range(1, ${MrlD + 1}), " +
        "i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))")}) AS norm
       |  FROM embeddings),
       |e AS (SELECT vec_id, r.range AS i, CAST(embedding[r.range] AS DOUBLE) AS x
       |      FROM embeddings, range(1, ${MrlD + 1}) r)
       |SELECT e.vec_id, CAST(e.i AS BIGINT) AS i,
       |  CASE WHEN t.norm > 0.0 THEN ${mr("e.x / t.norm", 6)} ELSE 0.0 END AS y,
       |  ${mr("t.norm", 6)} AS norm
       |FROM e JOIN t USING (vec_id) ORDER BY vec_id, i""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding.mirrorRound
    Ops.mrlTruncate(Tables(s, dir, "embeddings"), "vec_id", "embedding", MrlD)
      .select(col("vec_id"), posexplode(col("emb_d")).as(Seq("_p", "y")),
        col("norm"))
      .select(col("vec_id"), (col("_p") + 1).cast("long").as("i"),
        mirrorRound(col("y"), 6).as("y"), mirrorRound(col("norm"), 6).as("norm"))
      .orderBy("vec_id", "i")
  }

  private val PqM = 4              // subspaces
  private val PqSubDim = Dim / PqM // 16 dims each

  /** DuckDB mirror of the subspace L2² ([[Ops.ivfPqKnn]]'s `sqDist`):
    * left-to-right fold over the subDim squared differences.
    */
  private def sqlSubD2(a: String, b: String): String =
    sqlFoldSum(s"list_transform(range(1, ${PqSubDim + 1}), " +
      s"i -> (($a)[i] - ($b)[i]) * (($a)[i] - ($b)[i]))")

  /** s10: IVFADC ([[Ops.ivfPqKnn]]) — coarse cells × compressed-domain
    * ADC scan, the production 100 TB ANN shape. Coarse cells are the s04
    * label centroids; PQ codebooks are label-supervised (per-(subspace,
    * label) averages — a deterministic one-step Lloyd both engines
    * replay verbatim, mirror-rounded at 6 dp so cross-engine float-sum
    * ordering cannot flip an encode). The oracle replays ALL FIVE
    * stages: coarse assignment (argmax cosine, ties → smallest label),
    * per-subspace encode (argmin L2², ties → smallest code), the
    * per-query distance table, the probed-cell candidate scan, and the
    * ADC sum — so a hash match certifies the whole composition, not
    * just the final ranking.
    */
  val s10 = QueryDef(
    "s10_ivfpq",
    s"""WITH $sqlCentroids,
       |asg AS (SELECT vec_id, cell FROM (
       |  SELECT e.vec_id, CAST(c.label AS BIGINT) AS cell,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${sqlCosine("e.embedding", "c.cv")} DESC, c.label) AS rn
       |  FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
       |cb AS (SELECT sub, code, list(c ORDER BY i) AS cv FROM (
       |  SELECT CAST(sp.s AS BIGINT) AS sub, CAST(label AS BIGINT) AS code, r.i AS i,
       |    ${mr(s"avg(CAST(embedding[sp.s * $PqSubDim + r.i + 1] AS DOUBLE))", 6)} AS c
       |  FROM embeddings CROSS JOIN range(0, $PqM) sp(s) CROSS JOIN range(0, $PqSubDim) r(i)
       |  GROUP BY 1, 2, 3) GROUP BY sub, code),
       |sv AS (SELECT vec_id, CAST(sp.s AS BIGINT) AS sub,
       |    list_transform(range(1, ${PqSubDim + 1}),
       |      i -> CAST(embedding[sp.s * $PqSubDim + i] AS DOUBLE)) AS sv
       |  FROM embeddings CROSS JOIN range(0, $PqM) sp(s)),
       |enc AS (SELECT vec_id, sub, code FROM (
       |  SELECT sv.vec_id, sv.sub, cb.code,
       |    row_number() OVER (PARTITION BY sv.vec_id, sv.sub
       |      ORDER BY ${sqlSubD2("sv.sv", "cb.cv")} ASC, cb.code) AS rn
       |  FROM sv JOIN cb USING (sub)) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, cell AS qcell FROM asg
       |      WHERE vec_id < $NumQueries),
       |dt AS (SELECT sv.vec_id AS query_id, sv.sub, cb.code,
       |         ${sqlSubD2("sv.sv", "cb.cv")} AS d2
       |       FROM sv JOIN cb USING (sub) WHERE sv.vec_id < $NumQueries),
       |sc AS (SELECT dt.query_id, q.qcell AS cell, enc.vec_id AS neighbor_id,
       |         ${mr("sum(dt.d2)", 6)} AS adc_d2
       |       FROM enc JOIN asg ON enc.vec_id = asg.vec_id
       |         JOIN q ON asg.cell = q.qcell AND enc.vec_id <> q.query_id
       |         JOIN dt ON dt.query_id = q.query_id AND dt.sub = enc.sub
       |           AND dt.code = enc.code
       |       GROUP BY 1, 2, 3)
       |SELECT query_id, cell,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc_d2, neighbor_id) AS BIGINT) AS rank,
       |  neighbor_id, adc_d2
       |FROM sc QUALIFY rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir, "embeddings")
    // ONE per-(label, dim) mean table feeds BOTH model artifacts: the
    // coarse cells are the full-width label means and the
    // label-supervised codebook entry (sub, label)[j] is exactly
    // mean(label, sub·subDim + j) mirror-rounded at 6 dp — the same
    // values centroidVectors/labelCodebooks compute from separate
    // explodes, at half the aggregation stages (the shared means
    // exchange is reused across the two rollups)
    val means = e.select(col("label").cast("long").as("clabel"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("clabel", "i").agg(avg(col("x").cast("double")).as("c"))
    val model = Ops.ivfPqModelFromMeans(means, dim = Dim, m = PqM)
    Ops.ivfPqKnnModel(e, "vec_id", "embedding", model,
        isQuery = col("vec_id") < NumQueries, dim = Dim, m = PqM, k = TopK)
      .orderBy("query_id", "rank")
  }

  val queries: Seq[QueryDef] = Seq(s01, s02, s03, s04, s05, s06, s07, s08, s09, s10)
}
