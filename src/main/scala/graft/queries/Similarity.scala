package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.functions.GraftExpressions
import graft.functions.VectorFunctions.{sqlCosine, sqlFoldSum}
import graft.sources.Tables

/** Similarity-search operators (SURVEY.md §2c S1–S3) over the embeddings
  * table (`embedding: array<float>`, dim 64).
  *
  * Scale design:
  *  - s01: query vectors are tiny → `broadcast` them and stream the corpus
  *    once (one narrow pass + a top-k window per query). At 100 TB the
  *    corpus side never shuffles; only (num_queries × k) rows survive.
  *  - s02: random-hyperplane LSH — bucket assignment is per-row map-side
  *    work; neighbor search is an equi-join on the bucket id, never a
  *    cross product. More planes → smaller buckets → cheaper join.
  *  - s03: centroids via (label, dim) partial aggregation — map-side
  *    combine does most of the work; output is |labels|×dim rows.
  */
object Similarity {

  private val NumQueries = 8
  private val TopK = 5

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
    GraftExpressions.register(s)
    val e = Tables(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(GraftExpressions.cosineSim(col("qv"), col("embedding")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }

  // --- s02: random-hyperplane LSH ------------------------------------

  private val NumPlanes = 8
  private val Dim = 64

  /** Deterministic hyperplanes with small-integer components in [-5, 5]
    * (exactly representable as doubles → identical literals both engines).
    */
  val planes: IndexedSeq[IndexedSeq[Int]] = {
    val it = Iterator.iterate(2026L)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)
    IndexedSeq.fill(NumPlanes)(IndexedSeq.fill(Dim)(Math.floorMod(it.next(), 11L).toInt - 5))
  }

  /** Spark bucket id: 8 sign bits of plane·embedding. */
  private def bucket(emb: Column): Column =
    (0 until NumPlanes).map { j =>
      val planeLit = array(planes(j).map(v => lit(v.toDouble)): _*)
      val dot = aggregate(zip_with(emb, planeLit, (x, p) => x.cast("double") * p),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB mirror of [[bucket]] over column name `e`. */
  private def sqlBucket(e: String): String = {
    val bits = (0 until NumPlanes).map { j =>
      val planeLit = s"[${planes(j).map(v => s"CAST($v AS DOUBLE)").mkString(", ")}]"
      val dot = sqlFoldSum(
        s"list_transform(range(1, len($e) + 1), i -> CAST($e[i] AS DOUBLE) * ($planeLit)[i])")
      s"CASE WHEN $dot > 0 THEN ${1L << j} ELSE 0 END"
    }
    s"CAST(${bits.mkString(" + ")} AS BIGINT)"
  }

  val s02 = QueryDef(
    "s02_ann_lsh",
    s"""WITH b AS (SELECT vec_id, embedding, ${sqlBucket("embedding")} AS bucket
       |           FROM embeddings),
       |p AS (SELECT a.vec_id AS vec_id, a.bucket AS bucket, b.vec_id AS nn_id,
       |        round(${sqlCosine("a.embedding", "b.embedding")}, 6) AS cos
       |      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
       |SELECT vec_id, bucket, nn_id, cos FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nn_id) AS rn
       |  FROM p) WHERE rn = 1
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    GraftExpressions.register(s)
    val b = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), bucket(col("embedding")).as("bucket"))
    val p = b.as("a")
      .join(b.as("b"), col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("a.bucket").as("bucket"),
        col("b.vec_id").as("nn_id"),
        round(GraftExpressions.cosineSim(col("a.embedding"), col("b.embedding")), 6).as("cos"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nn_id"))
    p.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("vec_id", "bucket", "nn_id", "cos")
      .orderBy("vec_id")
  }

  val s03 = QueryDef(
    "s03_centroids",
    s"""SELECT CAST(label AS BIGINT) AS label, CAST(r.i AS BIGINT) AS dim,
       |  round(avg(CAST(embedding[r.i + 1] AS DOUBLE)), 4) AS centroid
       |FROM embeddings CROSS JOIN range(0, $Dim) r(i)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables(s, dir, "embeddings")
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(round(avg(col("x").cast("double")), 4).as("centroid"))
      .orderBy("label", "dim")
  }

  private val sqlCentroids =
    s"""cent AS (SELECT label, list(c ORDER BY i) AS cv FROM (
       |  SELECT label, r.i AS i, avg(CAST(embedding[r.i + 1] AS DOUBLE)) AS c
       |  FROM embeddings CROSS JOIN range(0, $Dim) r(i) GROUP BY 1, 2)
       |  GROUP BY label)""".stripMargin

  /** IVF-style ANN: vectors are assigned to coarse cells (nearest label
    * centroid); a query probes only its own cell — at 100 TB the inverted
    * file is a partition key, so a probe reads 1/|cells| of the corpus
    * (nprobe trades recall for scans). Cells here reuse the data's label
    * structure for determinism; production would k-means the sample.
    */
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
    GraftExpressions.register(s)
    val e = Tables(s, dir, "embeddings")
    val cent = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("label", "i").agg(avg(col("x").cast("double")).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
        p => p.getField("c")).as("cv"))
      .select(col("label").as("clabel"), col("cv"))
    val w1 = Window.partitionBy("vec_id")
      .orderBy(graft.functions.VectorFunctions.cosine(col("embedding"), col("cv")).desc,
        col("clabel"))
    val asg = e.crossJoin(broadcast(cent))
      .withColumn("rn", row_number().over(w1)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("clabel").cast("long").as("cell"))
    val q = asg.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("cell").as("qcell"))
    val sc = asg.join(broadcast(q),
        col("cell") === col("qcell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qcell").as("cell"), col("vec_id").as("neighbor_id"),
        round(GraftExpressions.cosineSim(col("qv"), col("embedding")), 6).as("cos"))
    val w2 = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    sc.withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "cell", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }

  val queries: Seq[QueryDef] = Seq(s01, s02, s03, s04)
}
