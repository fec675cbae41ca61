package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.functions.{GraftExpressions, SignatureExpressions => SigX, Signatures => Sig}
import graft.functions.TextFunctions.tokens
import graft.functions.VectorFunctions.sqlCosine
import graft.sources.Tables

/** Deduplication operators (SURVEY.md §2c D1–D5) over the documents /
  * embeddings tables. All candidate generation is join-based (equi-join on
  * content keys, LSH band keys, SimHash chunk keys) — never an O(n²)
  * driver-side loop — so the same plans hold at 100 TB:
  *
  *  - d01: shuffle on a 16-byte md5 of the normalized text (not the text).
  *  - d02: exact pairwise Jaccard via shingle equi-join, with a
  *    document-frequency cap on hot shingles (a shingle present in many
  *    documents carries no dedup signal and only fans out the join).
  *  - d03: MinHash signatures → 8×4 LSH banding → candidates → exact verify.
  *  - d04: 60-bit SimHash → 4×15-bit pigeonhole chunks → candidates →
  *    Hamming ≤ 3 (the chunk split guarantees full recall at that radius).
  *  - d05: exact embedding-cosine pairs (the approximate scale path is
  *    s02's hyperplane LSH; this is the oracle-exact baseline).
  */
object Dedup {

  private val MaxShingleDf = 20   // hot-shingle document-frequency cap (d02)
  private val JaccardThr = 0.5    // verified-pair threshold (d02, d03)

  // Shared oracle-SQL prefix: tokens -> token hashes -> shingle hashes.
  private val sqlShingleCte =
    s"""WITH t AS (SELECT doc_id, ${Sig.sqlToks} AS toks FROM documents),
       |h AS (SELECT doc_id, ${Sig.sqlTokenHashes("toks")} AS th FROM t),
       |s AS (SELECT doc_id, ${Sig.sqlShingleHashes("th")} AS sh FROM h)""".stripMargin

  /** doc_id -> distinct shingle-hash array (shared Spark-side prefix). */
  private def shingled(s: org.apache.spark.sql.SparkSession, dir: String) = {
    SigX.register(s)
    Tables(s, dir, "documents")
      .select(col("doc_id"), SigX.shingleHash(tokens(col("text"))).as("sh"))
  }

  val d01 = QueryDef(
    "d01_exact_dedup",
    """SELECT doc_id,
      |  min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS canonical_id,
      |  count(*) OVER (PARTITION BY md5(lower(trim(text)))) AS group_size,
      |  doc_id = min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS keep
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(md5(lower(trim(col("text"))).cast("binary")))
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        min("doc_id").over(w).as("canonical_id"),
        count(lit(1)).over(w).as("group_size"))
      .withColumn("keep", col("doc_id") === col("canonical_id"))
      .orderBy("doc_id")
  }

  val d02 = QueryDef(
    "d02_ngram_jaccard",
    s"""$sqlShingleCte,
       |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
       |kept AS (SELECT doc_id, shingle FROM (
       |  SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM ex)
       |  WHERE df <= $MaxShingleDf),
       |n AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY 1),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |      FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2)
       |SELECT id_a, id_b, round(inter*1.0/(na.n + nb.n - inter), 4) AS jaccard
       |FROM p JOIN n na ON p.id_a = na.doc_id JOIN n nb ON p.id_b = nb.doc_id
       |WHERE round(inter*1.0/(na.n + nb.n - inter), 4) >= $JaccardThr
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val ex = shingled(s, dir).select(col("doc_id"), explode(col("sh")).as("shingle"))
    val kept = ex
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
      .filter(col("df") <= MaxShingleDf)
      .select("doc_id", "shingle")
    val n = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = kept.as("a")
      .join(kept.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(n.as("na"), col("id_a") === col("na.doc_id"))
      .join(n.as("nb"), col("id_b") === col("nb.doc_id"))
      .select(col("id_a"), col("id_b"),
        round(col("inter") * 1.0 / (col("na.n") + col("nb.n") - col("inter")), 4).as("jaccard"))
      .filter(col("jaccard") >= JaccardThr)
      .orderBy("id_a", "id_b")
  }

  val d03 = QueryDef(
    "d03_minhash_lsh",
    s"""$sqlShingleCte,
       |bands AS (SELECT doc_id, unnest(${Sig.sqlBandKeys("sh")}) AS bk
       |          FROM s WHERE len(sh) > 0),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b,
       |  round(len(list_intersect(sa.sh, sb.sh))*1.0 /
       |        (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4) AS jaccard
       |FROM cand JOIN s sa ON id_a = sa.doc_id JOIN s sb ON id_b = sb.doc_id
       |WHERE round(len(list_intersect(sa.sh, sb.sh))*1.0 /
       |      (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4) >= $JaccardThr
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val docs = shingled(s, dir).filter(size(col("sh")) > 0)
    val bands = docs
      .select(col("doc_id"), explode(SigX.minhashBandKeys(col("sh"))).as("bk"))
    val cand = bands.as("a")
      .join(bands.as("b"), col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val inter = size(array_intersect(col("sa.sh"), col("sb.sh")))
    cand
      .join(docs.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(docs.as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"),
        round(inter * 1.0 / (size(col("sa.sh")) + size(col("sb.sh")) - inter), 4).as("jaccard"))
      .filter(col("jaccard") >= JaccardThr)
      .orderBy("id_a", "id_b")
  }

  // Hot-chunk cap: a chunk key shared by > MaxChunkDf docs fans the
  // candidate join out quadratically (measured: 5k docs → 538k candidates
  // uncapped at sf0.1) while carrying almost no near-dup signal — the same
  // skew guard as d02's shingle cap, mirrored exactly in the oracle.
  private val MaxChunkDf = 100

  val d04 = QueryDef(
    "d04_simhash",
    s"""WITH t AS (SELECT doc_id, ${Sig.sqlToks} AS toks FROM documents),
       |h AS (SELECT doc_id, ${Sig.sqlTokenHashes("toks")} AS th FROM t),
       |sim AS (SELECT doc_id, ${Sig.sqlSimhash("th")} AS sim FROM h),
       |ck0 AS (SELECT doc_id, sim, unnest(${Sig.sqlSimChunkKeys("sim")}) AS ck FROM sim),
       |ck AS (SELECT doc_id, sim, ck FROM (
       |  SELECT doc_id, sim, ck, count(*) OVER (PARTITION BY ck) AS df FROM ck0)
       |  WHERE df <= $MaxChunkDf),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |                a.sim AS sim_a, b.sim AS sim_b
       |         FROM ck a JOIN ck b ON a.ck = b.ck AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    SigX.register(s)
    val sims = Tables(s, dir, "documents")
      .select(col("doc_id"), SigX.simhash(tokens(col("text"))).as("sim"))
    val chunks = sims
      .select(col("doc_id"), col("sim"), explode(Sig.simChunkKeys(col("sim"))).as("ck"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("ck")))
      .filter(col("df") <= MaxChunkDf)
      .select("doc_id", "sim", "ck")
    chunks.as("a")
      .join(chunks.as("b"), col("a.ck") === col("b.ck") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("id_a", "id_b")
  }

  private val CosThr = 0.4

  val d05 = QueryDef(
    "d05_embedding_dup",
    s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(${sqlCosine("a.embedding", "b.embedding")}, 6) AS cos
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE round(${sqlCosine("a.embedding", "b.embedding")}, 6) >= $CosThr
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    GraftExpressions.register(s)
    val e = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(GraftExpressions.cosineSim(col("a.embedding"), col("b.embedding")), 6).as("cos"))
      .filter(col("cos") >= CosThr)
      .orderBy("id_a", "id_b")
  }

  val queries: Seq[QueryDef] = Seq(d01, d02, d03, d04, d05)
}
