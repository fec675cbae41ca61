package graft.queries

import graft.operators.Ckpt._
import graft.QueryDef
import graft.functions.EmbeddingLsh
import graft.functions.Rounding.{sqlMirrorRound => mr}
import graft.functions.{Signatures => Sig}
import graft.functions.VectorFunctions.sqlCosine
import graft.operators.{Dedup => Ops}
import graft.sources.Tables

import org.apache.spark.sql.functions.{col, explode}

/** Verified-query surface for the dedup operators (SURVEY.md §2c D1–D5);
  * the implementations live in [[graft.operators.Dedup]] — these entries
  * bind them to the test tables, add the deterministic ORDER BY for the
  * oracle compare, and carry the DuckDB mirror SQL (generated from the
  * same coefficient tables as the Spark expressions).
  */
object Dedup {

  private val MaxShingleDf = 20   // hot-shingle document-frequency cap (d02)
  private val JaccardThr = 0.5    // verified-pair threshold (d02, d03)
  private val MaxChunkDf = 100    // hot-chunk cap (d04); see operators.Dedup
  private val CosThr = 0.4        // cosine near-dup threshold (d05)
  private val MaxBandDf = 1000    // hot band-bucket cap (d05); mirrored in the oracle

  // Shared oracle-SQL prefix: tokens -> token hashes -> shingle hashes.
  private val sqlShingleCte =
    s"""WITH t AS (SELECT doc_id, ${Sig.sqlToks} AS toks FROM documents),
       |h AS (SELECT doc_id, ${Sig.sqlTokenHashes("toks")} AS th FROM t),
       |s AS (SELECT doc_id, ${Sig.sqlShingleHashes("th")} AS sh FROM h)""".stripMargin

  val d01 = QueryDef(
    "d01_exact_dedup",
    """SELECT doc_id,
      |  min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS canonical_id,
      |  count(*) OVER (PARTITION BY md5(lower(trim(text)))) AS group_size,
      |  doc_id = min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS keep
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Ops.exact(Tables(s, dir, "documents"), "doc_id", "text").orderBy("doc_id")
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
       |SELECT id_a, id_b, ${mr("inter*1.0/(na.n + nb.n - inter)", 4)} AS jaccard
       |FROM p JOIN n na ON p.id_a = na.doc_id JOIN n nb ON p.id_b = nb.doc_id
       |WHERE ${mr("inter*1.0/(na.n + nb.n - inter)", 4)} >= $JaccardThr
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    Ops.ngramJaccardPairs(Tables(s, dir, "documents"), "doc_id", "text",
      JaccardThr, MaxShingleDf).orderBy("id_a", "id_b")
  }

  val d03 = QueryDef(
    "d03_minhash_lsh",
    s"""$sqlShingleCte,
       |bands AS (SELECT doc_id, unnest(${Sig.sqlBandKeys("sh")}) AS bk
       |          FROM s WHERE len(sh) > 0),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b,
       |  ${mr("""len(list_intersect(sa.sh, sb.sh))*1.0 /
       |        (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))""", 4)} AS jaccard
       |FROM cand JOIN s sa ON id_a = sa.doc_id JOIN s sb ON id_b = sb.doc_id
       |WHERE ${mr("""len(list_intersect(sa.sh, sb.sh))*1.0 /
       |      (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))""", 4)} >= $JaccardThr
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    Ops.minhashLshPairs(Tables(s, dir, "documents"), "doc_id", "text", JaccardThr)
      .orderBy("id_a", "id_b")
  }

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
    Ops.simhashPairs(Tables(s, dir, "documents"), "doc_id", "text",
      maxHamming = 3, maxChunkDf = MaxChunkDf).orderBy("id_a", "id_b")
  }

  /** d05: banded hyperplane-LSH near-dup pairs (candidates = band-key
    * equi-join, exact cosine verification — d03's shape for embeddings).
    * The oracle embeds the SAME plane literals, so both engines compute
    * identical band keys; d07 keeps the exact all-pairs baseline.
    */
  val d05 = QueryDef(
    "d05_embedding_dup",
    s"""WITH bk0 AS (SELECT vec_id, embedding,
       |               unnest(${EmbeddingLsh.sqlBandKeys("embedding")}) AS bk
       |             FROM embeddings),
       |bk AS (SELECT vec_id, bk FROM (
       |  SELECT vec_id, bk, count(*) OVER (PARTITION BY bk) AS df FROM bk0)
       |  WHERE df <= $MaxBandDf),
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |         FROM bk a JOIN bk b ON a.bk = b.bk AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, round(${sqlCosine("ea.embedding", "eb.embedding")}, 6) AS cos
       |FROM cand JOIN embeddings ea ON id_a = ea.vec_id
       |          JOIN embeddings eb ON id_b = eb.vec_id
       |WHERE round(${sqlCosine("ea.embedding", "eb.embedding")}, 6) >= $CosThr
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    Ops.embeddingPairsLsh(Tables(s, dir, "embeddings"), "vec_id", "embedding",
      CosThr, MaxBandDf).orderBy("id_a", "id_b")
  }

  /** d07: the exact all-pairs cosine baseline (guarded in the operator;
    * d05 is the scale path).
    */
  val d07 = QueryDef(
    "d07_embedding_exact",
    s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(${sqlCosine("a.embedding", "b.embedding")}, 6) AS cos
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE round(${sqlCosine("a.embedding", "b.embedding")}, 6) >= $CosThr
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    Ops.embeddingPairs(Tables(s, dir, "embeddings"), "vec_id", "embedding", CosThr)
      .orderBy("id_a", "id_b")
  }

  /** d06: near-dup CLUSTERS — connected components over the d03 pair graph
    * (min-id label propagation in Spark; transitive closure via recursive
    * CTE in the oracle). Every document gets a cluster id; keep = canonical.
    */
  val d06 = QueryDef(
    "d06_dup_clusters",
    s"""WITH RECURSIVE
       |t AS (SELECT doc_id, ${Sig.sqlToks} AS toks FROM documents),
       |h AS (SELECT doc_id, ${Sig.sqlTokenHashes("toks")} AS th FROM t),
       |s AS (SELECT doc_id, ${Sig.sqlShingleHashes("th")} AS sh FROM h),
       |bands AS (SELECT doc_id, unnest(${Sig.sqlBandKeys("sh")}) AS bk
       |          FROM s WHERE len(sh) > 0),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id),
       |p AS (SELECT id_a, id_b
       |      FROM cand JOIN s sa ON id_a = sa.doc_id JOIN s sb ON id_b = sb.doc_id
       |      WHERE ${mr("""len(list_intersect(sa.sh, sb.sh))*1.0 /
       |        (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))""", 4)} >= $JaccardThr),
       |edges AS (SELECT id_a AS a, id_b AS b FROM p
       |          UNION SELECT id_b, id_a FROM p),
       |reach(a, b) AS (SELECT a, b FROM edges
       |                UNION
       |                SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |comp AS (SELECT a AS id, least(a, min(b)) AS cluster FROM reach GROUP BY a)
       |SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster,
       |       d.doc_id = coalesce(c.cluster, d.doc_id) AS keep
       |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val pairs = Ops.minhashLshPairs(docs, "doc_id", "text", JaccardThr)
    Ops.clusters(docs, "doc_id", pairs, checkIds = false) // pairs ⊆ docs
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  private val ContamTestPct = 10  // hash-bucket % held out as the "benchmark"
  private val MinContamOverlap = 5 // distinct shared shingles to flag

  /** q21: benchmark decontamination — training docs sharing >=
    * MinContamOverlap distinct shingles with any held-out test doc. The
    * test split is the deterministic q20 hash sample (salt 'contam:'),
    * so both engines agree on membership bit-for-bit; the join mirrors
    * d02's capped shingle equi-join across the two corpora.
    */
  val q21 = QueryDef(
    "q21_decontaminate",
    s"""$sqlShingleCte,
       |k AS (SELECT doc_id, 'contam:' || CAST(doc_id AS VARCHAR) AS kk FROM documents),
       |m AS (SELECT doc_id, ((${Sig.sqlPolyHashStr("kk")} * 2654435761) % 1000000007) % 100 < $ContamTestPct AS is_test
       |      FROM k),
       |ex AS (SELECT s.doc_id, unnest(sh) AS shingle FROM s),
       |tr AS (SELECT doc_id, shingle FROM (
       |    SELECT e.doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
       |    FROM ex e JOIN m USING (doc_id) WHERE NOT is_test)
       |  WHERE df <= $MaxShingleDf),
       |te AS (SELECT e.doc_id, shingle FROM ex e JOIN m USING (doc_id) WHERE is_test)
       |SELECT tr.doc_id AS train_id, te.doc_id AS test_id,
       |  CAST(count(*) AS BIGINT) AS overlap
       |FROM tr JOIN te USING (shingle)
       |GROUP BY 1, 2 HAVING count(*) >= $MinContamOverlap
       |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    graft.functions.GraftExpressions.register(s)
    val docs = Tables(s, dir, "documents")
    val isTest = graft.operators.Sampling.hashBucket(
      org.apache.spark.sql.functions.col("doc_id"), 100, "contam:") < ContamTestPct
    Ops.contaminationPairs(docs.filter(!isTest), docs.filter(isTest),
        "doc_id", "text", MinContamOverlap, MaxShingleDf)
      .orderBy("train_id", "test_id")
  }

  private val IncNewPct = 10 // hash-bucket % treated as "today's batch"

  /** q27: incremental ingest dedup — MinHash pairs between a new batch
    * (deterministic hash sample) and the full corpus, existing×existing
    * structurally excluded ([[graft.operators.Dedup.incrementalMinhashPairs]]).
    */
  val q27 = QueryDef(
    "q27_incremental_dedup",
    s"""$sqlShingleCte,
       |k AS (SELECT doc_id, 'inc:' || CAST(doc_id AS VARCHAR) AS kk FROM documents),
       |m AS (SELECT doc_id, ((${Sig.sqlPolyHashStr("kk")} * 2654435761) % 1000000007) % 100 < $IncNewPct AS is_new
       |      FROM k),
       |s2 AS (SELECT doc_id, sh FROM s WHERE len(sh) > 0),
       |bn AS (SELECT s2.doc_id, unnest(${Sig.sqlBandKeys("sh")}) AS bk
       |       FROM s2 JOIN m USING (doc_id) WHERE is_new),
       |ba AS (SELECT s2.doc_id, unnest(${Sig.sqlBandKeys("sh")}) AS bk, m.is_new
       |       FROM s2 JOIN m USING (doc_id)),
       |cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS other_id
       |         FROM bn a JOIN ba b ON a.bk = b.bk AND a.doc_id <> b.doc_id
       |         WHERE NOT b.is_new OR a.doc_id < b.doc_id)
       |SELECT new_id, other_id,
       |  ${mr("""len(list_intersect(sa.sh, sb.sh))*1.0 /
       |        (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))""", 4)} AS jaccard
       |FROM cand JOIN s sa ON new_id = sa.doc_id JOIN s sb ON other_id = sb.doc_id
       |WHERE ${mr("""len(list_intersect(sa.sh, sb.sh))*1.0 /
       |      (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))""", 4)} >= $JaccardThr
       |ORDER BY new_id, other_id""".stripMargin) { (s, dir) =>
    graft.functions.GraftExpressions.register(s)
    val docs = Tables(s, dir, "documents")
    val isNew = graft.operators.Sampling.hashBucket(
      org.apache.spark.sql.functions.col("doc_id"), 100, "inc:") < IncNewPct
    Ops.incrementalMinhashPairs(docs.filter(isNew), docs.filter(!isNew),
        "doc_id", "text", JaccardThr)
      .orderBy("new_id", "other_id")
  }

  private val SemK = 8      // k-means cells (scale knob: size so n/k is constant)
  private val SemIters = 1  // Lloyd update rounds (unrolled in the oracle)
  private val SemDim = 64   // embedding dimensionality (centroid reassembly)

  /** d09: SemDeDup semantic dedup — deterministic spherical k-means
    * (scrambled-hash seeds, one Lloyd round, both unrolled in the oracle
    * as seed → assign → centroid-update → assign CTEs), then a within-cell
    * cosine check pruning every vector with a lower-id near-dup in its
    * cell. Assignment ranks on the bit-identical cosine fold (the s04
    * precedent); centroid averages follow the s03/s04 avg parity.
    */
  val d09 = QueryDef(
    "d09_semantic_dedup",
    s"""WITH k0 AS (SELECT vec_id, embedding,
       |              'sem:' || CAST(vec_id AS VARCHAR) AS kk FROM embeddings),
       |h AS (SELECT vec_id, embedding,
       |        (${Sig.sqlPolyHashStr("kk")} * 2654435761) % 1000000007 AS hh
       |      FROM k0),
       |c0 AS (SELECT CAST(row_number() OVER (ORDER BY hh, vec_id) - 1 AS BIGINT) AS clabel,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
       |       FROM (SELECT * FROM h ORDER BY hh, vec_id LIMIT $SemK)),
       |a1 AS (SELECT vec_id, embedding, clabel AS cell FROM (
       |  SELECT e.vec_id, e.embedding, c.clabel,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${sqlCosine("e.embedding", "c.cv")} DESC, c.clabel) AS rn
       |  FROM embeddings e CROSS JOIN c0 c) WHERE rn = 1),
       |c1 AS (SELECT clabel, list(c ORDER BY i) AS cv FROM (
       |  SELECT cell AS clabel, r.i AS i, avg(CAST(embedding[r.i + 1] AS DOUBLE)) AS c
       |  FROM a1 CROSS JOIN range(0, $SemDim) r(i) GROUP BY 1, 2) GROUP BY clabel),
       |a2 AS (SELECT vec_id, embedding, clabel AS cell FROM (
       |  SELECT e.vec_id, e.embedding, c.clabel,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${sqlCosine("e.embedding", "c.cv")} DESC, c.clabel) AS rn
       |  FROM embeddings e CROSS JOIN c1 c) WHERE rn = 1),
       |d AS (SELECT DISTINCT y.vec_id FROM a2 x JOIN a2 y
       |        ON x.cell = y.cell AND x.vec_id < y.vec_id
       |      WHERE round(${sqlCosine("x.embedding", "y.embedding")}, 6) >= $CosThr)
       |SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS keep
       |FROM a2 a LEFT JOIN d ON a.vec_id = d.vec_id
       |ORDER BY a.vec_id""".stripMargin) { (s, dir) =>
    Ops.semanticDedup(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        SemK, SemIters, CosThr, "sem:")
      .orderBy("vec_id")
  }

  private val SpanN = 8        // duplicated-span window length (tokens)
  private val SpanMinCount = 2 // occurrences anywhere in the corpus to flag

  /** q31: duplicated-span scrub (the ExactSubstr shape, Lee et al. 2022) —
    * every 8-token window occurring >= 2 times in the corpus marks its
    * positions duplicated; the scrub keeps exactly the uncovered tokens in
    * order. Both engines compute the identical 16-byte span-key pair
    * (two polynomial folds over the shared token hashes), so flagged
    * windows — and the scrubbed text — match byte for byte.
    */
  val q31 = QueryDef(
    "q31_span_scrub", {
      val f1 = Sig.sqlSpanFold("th", "s", SpanN, Sig.B)
      val f2 = Sig.sqlSpanFold("th", "s", SpanN, Sig.B2)
      s"""WITH t AS (SELECT doc_id, ${Sig.sqlToks} AS toks FROM documents),
         |h AS (SELECT doc_id, toks, ${Sig.sqlTokenHashes("toks")} AS th FROM t),
         |g0 AS (SELECT doc_id, unnest(range(0, len(th) - $SpanN + 1)) AS s, th FROM h),
         |g AS (SELECT doc_id, s, $f1 AS h1, $f2 AS h2 FROM g0),
         |dupg AS (SELECT h1, h2 FROM g GROUP BY h1, h2
         |         HAVING count(*) >= $SpanMinCount),
         |ds AS (SELECT DISTINCT g.doc_id, g.s FROM g JOIN dupg USING (h1, h2)),
         |cov0 AS (SELECT doc_id, unnest(range(s, s + $SpanN)) AS p FROM ds),
         |cov AS (SELECT DISTINCT doc_id, p FROM cov0),
         |cnt AS (SELECT doc_id, count(*) AS c FROM cov GROUP BY 1),
         |tok0 AS (SELECT doc_id, unnest(range(0, len(toks))) AS p, toks FROM t),
         |tok AS (SELECT doc_id, p, toks[p + 1] AS tk FROM tok0),
         |unc AS (SELECT k.doc_id, k.p, k.tk FROM tok k
         |        WHERE NOT EXISTS (SELECT 1 FROM cov c
         |                          WHERE c.doc_id = k.doc_id AND c.p = k.p)),
         |sc AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY p) AS scrubbed
         |       FROM unc GROUP BY 1)
         |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(cnt.c, 0) AS BIGINT) AS dup_tokens,
         |  ${mr("coalesce(cnt.c, 0) * 1.0 / len(toks)", 4)} AS dup_frac,
         |  coalesce(sc.scrubbed, '') AS scrubbed
         |FROM t LEFT JOIN cnt USING (doc_id) LEFT JOIN sc USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin
    }) { (s, dir) =>
    Ops.spanScrub(Tables(s, dir, "documents"), "doc_id", "text",
      n = SpanN, minCount = SpanMinCount).orderBy("doc_id")
  }

  private val PruneFrac = 0.79

  /** d10: corpus-adaptive stopword pruning — [[Ops.lineDedup]] with
    * token granularity (sep = " ") and a scale-free fractional
    * threshold: every token occurring in ≥ ceil(0.79·N) distinct docs
    * is dropped from ALL docs, positions preserved in the rebuild (the
    * IR vocabulary-pruning step; the same machinery dedups boilerplate
    * LINES at sep = "\n"). All-integer semantics — zero float-parity
    * risk beyond the one ratio, which divides exact ints.
    */
  val d10 = QueryDef(
    "d10_df_prune",
    s"""WITH l AS (SELECT doc_id, string_split(text, ' ') AS ls FROM documents),
       |e0 AS (SELECT doc_id, ls, unnest(range(0, len(ls))) AS p FROM l),
       |e AS (SELECT doc_id, CAST(p AS INT) AS p, ls[CAST(p AS INT) + 1] AS t FROM e0),
       |ne AS (SELECT doc_id, p, t FROM e WHERE length(trim(t)) > 0),
       |th AS (SELECT CAST(ceil($PruneFrac * count(*)) AS BIGINT) AS md FROM documents),
       |hot AS (SELECT t FROM (SELECT t, count(DISTINCT doc_id) AS df
       |                       FROM ne GROUP BY 1) d, th WHERE d.df >= th.md),
       |dup AS (SELECT ne.doc_id, ne.p FROM ne JOIN hot USING (t)),
       |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_lines FROM dup GROUP BY 1),
       |keep AS (SELECT e.doc_id, e.p, e.t FROM e LEFT JOIN dup
       |         ON e.doc_id = dup.doc_id AND e.p = dup.p WHERE dup.p IS NULL),
       |cl AS (SELECT doc_id, string_agg(t, ' ' ORDER BY p) AS cleaned
       |       FROM keep GROUP BY doc_id)
       |SELECT l.doc_id, CAST(len(l.ls) AS BIGINT) AS n_lines,
       |  coalesce(ag.dup_lines, 0) AS dup_lines,
       |  ${mr("coalesce(ag.dup_lines, 0) * 1.0 / len(l.ls)", 4)} AS dup_frac,
       |  coalesce(cl.cleaned, '') AS cleaned
       |FROM l LEFT JOIN ag USING (doc_id) LEFT JOIN cl USING (doc_id)
       |ORDER BY l.doc_id""".stripMargin) { (s, dir) =>
    Ops.lineDedup(Tables(s, dir, "documents"), "doc_id", "text",
        sep = " ", minDfFrac = Some(PruneFrac))
      .orderBy("doc_id")
  }

  private val BloomCutoff = "1996-01-01"

  /** d11: bloom-gated novelty check in the VERIFIED lane — the
    * incremental-ingest pattern behind [[Ops.bloomSeen]] made EXACT and
    * oracle-checked, over first-seen-customer detection (the synthetic
    * corpus has zero exact text dups, so customer keys across an order-
    * date cutoff are the realistic membership domain): customers with
    * pre-cutoff orders are the reference, post-cutoff customers the
    * batch. `probably_seen = false` rows are DEFINITELY novel (blooms
    * have no false negatives) and skip the join entirely — at scale
    * that's most of the batch never shuffling; only flagged rows (true
    * members + ~fpp false positives) pay the exact anti-join backstop
    * that removes the false positives. definite ∪ confirmed ≡ the plain
    * anti-join, which is the oracle. The gate's value is the pruned
    * shuffle; the backstop makes it exact.
    */
  val d11 = QueryDef(
    "d11_bloom_novel",
    s"""SELECT DISTINCT o_custkey FROM orders
       |WHERE o_orderdate >= TIMESTAMP '$BloomCutoff'
       |  AND o_custkey NOT IN (SELECT o_custkey FROM orders
       |                        WHERE o_orderdate < TIMESTAMP '$BloomCutoff')
       |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    val orders = Tables(s, dir, "orders").select("o_custkey", "o_orderdate")
    val cut = org.apache.spark.sql.functions.lit(BloomCutoff).cast("timestamp")
    // ref feeds THREE consumers (bloomSeen's items count, the bloom
    // aggregation, the backstop anti-join) and inc two — materialize
    // both or each branch re-scans + re-distincts orders
    val ref = orders.filter(col("o_orderdate") < cut)
      .select(col("o_custkey").cast("string").as("ck")).distinct()
      .eagerPin()
    val inc = orders.filter(col("o_orderdate") >= cut)
      .select(col("o_custkey")).distinct()
      .withColumn("ck", col("o_custkey").cast("string"))
      .eagerPin()
    val gated = Ops.bloomSeen(inc, ref, "o_custkey", "ck")
    val definiteNovel = gated.filter(!col("probably_seen")).select("o_custkey")
    val confirmedNovel = gated.filter(col("probably_seen"))
      .join(ref, Seq("ck"), "left_anti")
      .select("o_custkey")
    definiteNovel.unionAll(confirmedNovel).orderBy("o_custkey")
  }

  /** d12: fuzzy name matching over the part dimension via
    * [[graft.operators.Dedup.fuzzyNamePairs]] — ALL name pairs within
    * Levenshtein distance 3, exact by contract, so the oracle is the
    * plain quadratic self-join and ANY lossless candidate scheme binds:
    * the operator's Ed-Join gram-prefix + low-gram length-band pruning
    * must reproduce the brute-force pair set verbatim (the 64-name
    * vocabulary here exercises both paths — len-7 names sit at the
    * low-gram boundary for q=2, k=3). Integer-only output; no floats.
    */
  val d12 = QueryDef(
    "d12_fuzzy_names",
    """WITH names AS (SELECT p_name AS name, CAST(count(*) AS BIGINT) AS cnt
      |  FROM part WHERE p_name IS NOT NULL AND length(p_name) > 0 GROUP BY 1)
      |SELECT a.name AS name_a, b.name AS name_b,
      |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
      |  a.cnt AS cnt_a, b.cnt AS cnt_b
      |FROM names a JOIN names b
      |  ON ((length(a.name) < length(b.name))
      |      OR (length(a.name) = length(b.name) AND a.name < b.name))
      |WHERE levenshtein(a.name, b.name) <= 3
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Ops.fuzzyNamePairs(Tables(s, dir, "part"), "p_name", maxDist = 3)
      .orderBy("name_a", "name_b")
  }

  private val D13MaxDfFrac = 0.5
  private val D13MinCos = 0.3

  /** Shared d13/d14 weight CTEs over SHINGLE-HASH tokens: this corpus's
    * word vocabulary is ~31 near-uniform-df tokens (word tf-idf
    * degenerates — everything is a stopword under any fractional cap),
    * while 3-gram shingle dfs discriminate; the bindings therefore run
    * the token-level operator entries over `sh`, exactly the d02/d03
    * feature space. N = docs with ≥ 1 shingle (the operator's toks
    * contract).
    */
  private val sqlTfidfCtes =
    s"""tk AS (SELECT doc_id AS d, unnest(sh) AS t FROM s),
       |tf AS (SELECT d, t, CAST(count(*) AS BIGINT) AS tf FROM tk GROUP BY 1, 2),
       |nn AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS n FROM tk),
       |dfq AS (SELECT t, CAST(count(*) AS BIGINT) AS dfc FROM tf GROUP BY 1),
       |keep AS (SELECT t, dfc FROM dfq CROSS JOIN nn
       |         WHERE dfc >= 2 AND dfc <= CAST(ceil($D13MaxDfFrac * n) AS BIGINT)),
       |w AS (SELECT d, tf.t,
       |        CAST(tf AS DOUBLE) * ln(CAST(n AS DOUBLE) / CAST(dfc AS DOUBLE)) AS w
       |      FROM tf JOIN keep ON tf.t = keep.t CROSS JOIN nn),
       |nm AS (SELECT d, sqrt(sum(w * w)) AS nm FROM w GROUP BY 1)""".stripMargin

  private def shingleToks(s: org.apache.spark.sql.SparkSession, dir: String) =
    Ops.shingled(Tables(s, dir, "documents"), "doc_id", "text")
      .select(col("_gid").as("d"), explode(col("sh")).as("t"))

  /** d13: exact TF-IDF sparse cosine pairs
    * ([[graft.operators.Dedup.sparseCosinePairsTokens]]) — the true
    * weighted cosine the signature family approximates, over the d02/d03
    * shingle feature space: inverted-index token join (never docs ×
    * docs), two-sided df prune (df < 2 feeds nothing; df > ceil(frac·N)
    * boilerplate shingles leave the representation — the scale-free
    * hot-key discipline), norms over the pruned space so the oracle
    * reproduces every value exactly.
    */
  val d13 = QueryDef(
    "d13_sparse_cosine",
    s"""$sqlShingleCte,
       |$sqlTfidfCtes,
       |dots AS (SELECT a.d AS doc_a, b.d AS doc_b, sum(a.w * b.w) AS dot
       |         FROM w a JOIN w b ON a.t = b.t AND a.d < b.d GROUP BY 1, 2),
       |c AS (SELECT doc_a, doc_b, dot, dot / (na.nm * nb.nm) AS cos
       |      FROM dots JOIN nm na ON na.d = doc_a JOIN nm nb ON nb.d = doc_b)
       |SELECT doc_a, doc_b, ${mr("dot", 6)} AS dot, ${mr("cos", 6)} AS cos
       |FROM c WHERE cos >= $D13MinCos ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    Ops.sparseCosinePairsTokens(shingleToks(s, dir), "d", "t",
        maxDfFrac = D13MaxDfFrac, minCos = D13MinCos)
      .select(col("doc_a"), col("doc_b"),
        Rounding.mirrorRound(col("dot"), 6).as("dot"),
        Rounding.mirrorRound(col("cos"), 6).as("cos"))
      .orderBy("doc_a", "doc_b")
  }

  /** d14: LSH candidates → exact TF-IDF rescoring
    * ([[graft.operators.Dedup.sparseCosineRescore]]) — the 100 TB
    * similarity composition in the verified lane: the d03 MinHash band
    * join generates the bounded candidate set (threshold 0 = every
    * banded collision), and ONLY those pairs pay the exact weighted
    * cosine, so cost tracks |candidates|·doc-length instead of d13's
    * all-surviving-pairs join. Oracle chains the band CTEs with the d13
    * weight CTEs over the same candidate set.
    */
  val d14 = QueryDef(
    "d14_lsh_rescored",
    s"""$sqlShingleCte,
       |bands AS (SELECT doc_id, unnest(${Sig.sqlBandKeys("sh")}) AS bk
       |          FROM s WHERE len(sh) > 0),
       |cand AS (SELECT DISTINCT a.doc_id AS ca, b.doc_id AS cb
       |         FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id),
       |$sqlTfidfCtes,
       |dots AS (SELECT c.ca AS doc_a, c.cb AS doc_b, sum(a.w * b.w) AS dot
       |         FROM cand c JOIN w a ON a.d = c.ca
       |         JOIN w b ON b.d = c.cb AND b.t = a.t
       |         GROUP BY 1, 2),
       |cc AS (SELECT doc_a, doc_b, dot, dot / (na.nm * nb.nm) AS cos
       |       FROM dots JOIN nm na ON na.d = doc_a JOIN nm nb ON nb.d = doc_b)
       |SELECT doc_a, doc_b, ${mr("dot", 6)} AS dot, ${mr("cos", 6)} AS cos
       |FROM cc WHERE cos >= $D13MinCos ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    import graft.functions.Rounding
    val docs = Tables(s, dir, "documents")
    val cand = Ops.minhashBandCandidates(docs, "doc_id", "text")
    Ops.sparseCosineRescoreTokens(shingleToks(s, dir), "d", "t", cand,
        maxDfFrac = D13MaxDfFrac, minCos = D13MinCos)
      .select(col("doc_a"), col("doc_b"),
        Rounding.mirrorRound(col("dot"), 6).as("dot"),
        Rounding.mirrorRound(col("cos"), 6).as("cos"))
      .orderBy("doc_a", "doc_b")
  }

  private val D15W = 8          // duplicated-window width in tokens (d15)
  private val D15MinDocs = 2    // cross-document threshold (d15)
  private val D15Thr = 0.2      // is_dup flag threshold on dup_frac (d15)

  /** d15: per-document duplicated-window profile ([[Ops.windowDupProfile]])
    * — overlapping 8-token windows, stride 1, a window "duplicated" when
    * it appears in >= 2 distinct documents; the Lee et al. 2022
    * substring-dedup signal. The oracle rebuilds the same dual polynomial
    * window folds from [[Sig.sqlSpanFold]] so both sides hash the
    * identical window family.
    */
  val d15 = QueryDef(
    "d15_window_dup",
    s"""WITH t AS (SELECT doc_id, ${Sig.sqlToks} AS toks FROM documents),
       |h AS (SELECT doc_id, ${Sig.sqlTokenHashes("toks")} AS th FROM t),
       |wk AS (SELECT doc_id, unnest(list_distinct(list_transform(
       |         range(0, len(th) - $D15W + 1),
       |         s -> concat(${Sig.sqlSpanFold("th", "s", D15W, Sig.B)}, '_',
       |                     ${Sig.sqlSpanFold("th", "s", D15W, Sig.B2)})))) AS wk
       |       FROM h WHERE len(th) >= $D15W),
       |dfc AS (SELECT wk, count(*) AS wdf FROM wk GROUP BY 1),
       |p AS (SELECT doc_id, count(*) AS n_windows,
       |        CAST(sum(CASE WHEN wdf >= $D15MinDocs THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
       |      FROM wk JOIN dfc USING (wk) GROUP BY 1)
       |SELECT doc_id, n_windows, n_dup,
       |  ${mr("n_dup * 1.0 / n_windows", 4)} AS dup_frac,
       |  ${mr("n_dup * 1.0 / n_windows", 4)} >= $D15Thr AS is_dup
       |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Ops.windowDupProfile(Tables(s, dir, "documents"), "doc_id", "text",
      D15W, D15MinDocs, D15Thr).orderBy("doc_id")
  }

  /** p16: decontamination-safe split end-to-end (P16) — the pipeline a
    * lab actually runs before training, as ONE verified chain: X13's
    * leakage-safe DOMAIN split assigns train/test by registered domain
    * (no site straddles), then q21's shingle decontamination removes
    * from TRAIN every doc sharing ≥ `MinContamOverlap` rare 13-gram
    * shingles with ANY test doc — belt and suspenders, because a
    * mirror hosted on a different domain slips the domain split but not
    * the n-gram gate. The oracle chains the q106 domain arithmetic +
    * hash membership with the q21 shingle/df/overlap CTEs and the final
    * NOT-IN — pinning the COMPOSITION, not just the parts. Scale shape
    * unchanged from the parts: narrow split + the q21 equi-join on
    * df-capped shingles; the anti-join key side is \|flagged\| ids.
    */
  val p16 = QueryDef(
    "p16_decontam_split",
    s"""$sqlShingleCte,
       |dm AS (SELECT doc_id,
       |    'example' || CAST(doc_id % 211 AS VARCHAR) ||
       |      CASE WHEN doc_id % 2 = 0 THEN '.com' ELSE '.co.uk' END AS domain
       |  FROM documents),
       |b AS (SELECT doc_id, domain, 'dsplit:' || domain AS kk FROM dm),
       |m AS (SELECT doc_id, domain,
       |    ((${Sig.sqlPolyHashStr("kk")} * 2654435761) % 1000000007) % 100 < 90 AS is_train
       |  FROM b),
       |ex AS (SELECT s.doc_id, unnest(sh) AS shingle FROM s),
       |tr AS (SELECT doc_id, shingle FROM (
       |    SELECT e.doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
       |    FROM ex e JOIN m USING (doc_id) WHERE is_train)
       |  WHERE df <= $MaxShingleDf),
       |te AS (SELECT e.doc_id, shingle FROM ex e JOIN m USING (doc_id)
       |       WHERE NOT is_train),
       |bad AS (SELECT DISTINCT tr.doc_id FROM tr JOIN te USING (shingle)
       |        GROUP BY tr.doc_id, te.doc_id HAVING count(*) >= $MinContamOverlap)
       |SELECT doc_id, domain FROM m
       |WHERE is_train AND doc_id NOT IN (SELECT doc_id FROM bad)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.functions._
    graft.functions.GraftExpressions.register(s)
    val subs = typedlit(Seq("www", "cdn", "shop"))
    val docs = Tables(s, dir, "documents")
      .withColumn("url", concat(lit("https://"),
        element_at(subs, (col("doc_id") % 3 + 1).cast("int")),
        lit(".example"), (col("doc_id") % 211).cast("string"),
        when(col("doc_id") % 2 === 0, ".com").otherwise(".co.uk"),
        lit("/p/"), col("doc_id").cast("string")))
      .withColumn("domain", graft.operators.Url.registeredDomain(col("url")))
    // the split table feeds THREE consumers (the train filter — itself
    // read by the shingle stream AND the final anti-join left side — and
    // the test filter): materialize once or the url-build +
    // registeredDomain parse + split hash re-evaluates per reference
    // (the d02/d16 plan-audit discipline)
    val split = graft.operators.Sampling.split(docs, "domain",
      Seq("train" -> 90, "test" -> 10), salt = "dsplit:")
      .eagerPin()
    val clean = Ops.decontaminate(
      split.filter(col("split") === "train"),
      split.filter(col("split") === "test"),
      "doc_id", "text", MinContamOverlap, MaxShingleDf)
    clean.select("doc_id", "domain").orderBy("doc_id")
  }

  private val ContainThr = 0.5    // containment-pair threshold (d16)
  private val ContainMaxDf = 50   // hot char-window df cap (d16)

  /** d16: character-window CONTAINMENT pairs
    * ([[graft.operators.Dedup.containmentPairs]]) — the asymmetric dedup
    * mode Jaccard misses: a short document pasted whole into a long one
    * shares few of the long document's shingles (d02/d03 never fire) but
    * nearly all of its own. Signatures are winnowed 20-char window
    * polynomial hashes (content-defined sampling: h ≡ 0 mod 8, so shared
    * text samples the same positions in both documents regardless of
    * alignment), then exactly d02's scale shape: df-capped hash
    * equi-join, containment = |∩| / min(|A|,|B|). The oracle rebuilds
    * every window hash with the inner char fold on a DIFFERENT lambda
    * variable (j) so the outer window index i stays in scope.
    */
  val d16 = QueryDef(
    "d16_containment", {
      val containSql = "inter * 1.0 / least(na.n, nb.n)"
      s"""WITH w AS (SELECT doc_id,
         |    list_transform(range(1, length(text) - 18), i ->
         |      list_reduce(list_prepend(CAST(0 AS BIGINT),
         |        list_transform(range(i, i + 20), j -> CAST(ascii(text[j]) AS BIGINT))),
         |      (acc, x) -> (acc * 31 + x) % 1000000007)) AS hs
         |  FROM documents WHERE length(text) >= 20),
         |fp AS (SELECT doc_id, list_distinct(list_filter(hs, h -> h % 8 = 0)) AS fp
         |       FROM w),
         |f AS (SELECT doc_id, fp FROM fp WHERE len(fp) > 0),
         |ex AS (SELECT doc_id, unnest(fp) AS h FROM f),
         |kept AS (SELECT doc_id, h FROM (
         |  SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS df FROM ex)
         |  WHERE df <= $ContainMaxDf),
         |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM kept GROUP BY 1),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |        CAST(count(*) AS BIGINT) AS inter
         |      FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2)
         |SELECT id_a, id_b, na.n AS n_a, nb.n AS n_b, inter,
         |  ${mr(containSql, 4)} AS containment
         |FROM p JOIN n na ON p.id_a = na.doc_id JOIN n nb ON p.id_b = nb.doc_id
         |WHERE ${mr(containSql, 4)} >= $ContainThr
         |ORDER BY id_a, id_b""".stripMargin
    }) { (s, dir) =>
    Ops.containmentPairs(Tables(s, dir, "documents"), "doc_id", "text",
        thr = ContainThr, window = 20, sampleMod = 8, maxDf = ContainMaxDf)
      .orderBy("id_a", "id_b")
  }

  private val DupBase = 8      // base span length (q31's SpanN scale)
  private val DupDoublings = 3 // witnessed lengths 8, 16, 32, 64

  /** The d17 prefix-doubling replay as generated CTEs, through the
    * per-level survivor sets s0..s`DupDoublings` — shared by d17's
    * witness and d18's scrub. Ends with a trailing comma; `t` carries
    * toks for d18's rebuild.
    */
  private def dupLadderCtes: String = {
    val f1 = Sig.sqlSpanFold("th", "s", DupBase, Sig.B)
    val f2 = Sig.sqlSpanFold("th", "s", DupBase, Sig.B2)
    val sb = new StringBuilder
    sb.append(
      s"""WITH t AS (SELECT doc_id, ${Sig.sqlToks} AS toks FROM documents),
         |h AS (SELECT doc_id, ${Sig.sqlTokenHashes("toks")} AS th FROM t),
         |g0 AS (SELECT doc_id, unnest(range(0, len(th) - $DupBase + 1)) AS s, th FROM h),
         |k0 AS (SELECT doc_id, s, $f1 AS h1, $f2 AS h2 FROM g0),
         |s0 AS (SELECT k.doc_id, k.s, k.h1, k.h2 FROM k0 k
         |       JOIN (SELECT h1, h2 FROM k0 GROUP BY 1, 2 HAVING count(*) >= 2) d
         |       USING (h1, h2)),""".stripMargin)
    for (r <- 1 to DupDoublings) {
      val half = DupBase << (r - 1)
      sb.append(
        s"""
           |k$r AS (SELECT a.doc_id, a.s,
           |          (a.h1 * ${Sig.B} + b.h1) % ${Sig.P} AS h1,
           |          (a.h2 * ${Sig.B2} + b.h2) % ${Sig.P} AS h2
           |        FROM s${r - 1} a JOIN s${r - 1} b
           |          ON a.doc_id = b.doc_id AND b.s = a.s + $half),
           |s$r AS (SELECT k.doc_id, k.s, k.h1, k.h2 FROM k$r k
           |        JOIN (SELECT h1, h2 FROM k$r GROUP BY 1, 2 HAVING count(*) >= 2) d
           |        USING (h1, h2)),""".stripMargin)
    }
    sb.toString
  }

  /** d17 (north-star, VERDICT r12 item 5): VARIABLE-LENGTH duplicated
    * spans by prefix doubling ([[graft.operators.Dedup.longestDupSpans]])
    * — the ExactSubstr longest-duplicate witness q31's fixed-n windows
    * cannot express. The oracle replays every doubling round as
    * generated CTEs (the q43/q49 fixed-round discipline): level-0 keys
    * are q31's two polynomial folds, each round composes
    * (h_L(s)·B + h_L(s+L)) mod P over the PRUNED survivor set (a
    * duplicated 2L-span's halves are duplicated L-spans, so the filter
    * is lossless), and each level contributes its per-doc summary. All
    * integer arithmetic — a hash match certifies all four rounds.
    */
  val d17 = QueryDef(
    "d17_longest_dup_span", {
      val levels = (0 to DupDoublings).map { r =>
        val full = DupBase << r
        s"""l$r AS (SELECT doc_id, CAST($full AS BIGINT) AS span_len,
           |          count(*) AS n_spans, CAST(min(s) AS BIGINT) AS first_start
           |        FROM s$r GROUP BY 1),""".stripMargin
      }.mkString("\n")
      val union = (0 to DupDoublings).map(r => s"SELECT * FROM l$r")
        .mkString(" UNION ALL ")
      dupLadderCtes + "\n" + levels + s"""
        |u AS ($union)
        |SELECT doc_id, span_len, n_spans, first_start FROM u
        |ORDER BY doc_id, span_len""".stripMargin
    }) { (s, dir) =>
    Ops.longestDupSpans(Tables(s, dir, "documents"), "doc_id", "text",
        n = DupBase, doublings = DupDoublings)
      .orderBy("doc_id", "span_len")
  }

  /** d18 (round 13): VARIABLE-LENGTH duplicated-span SCRUB
    * ([[graft.operators.Dedup.longestDupScrub]]) — the removal half of
    * the d17 witness: each document drops the tokens covered by its
    * DEEPEST-witnessed duplicated spans (the ladder's last surviving
    * level for that document), remaining tokens rejoin with single
    * spaces (the q31 rebuild); clean documents pass through with
    * span_len 0. The oracle chains d17's ladder CTEs with the per-doc
    * deepest-level selection, the coverage unnest, and the q31
    * position-filtered string_agg rebuild — all integer arithmetic plus
    * exact strings.
    */
  val d18 = QueryDef(
    "d18_longest_dup_scrub", {
      val u = (0 to DupDoublings).map { r =>
        val full = DupBase << r
        s"SELECT doc_id, s, CAST($full AS BIGINT) AS len FROM s$r"
      }.mkString(" UNION ALL ")
      dupLadderCtes + s"""
        |u AS ($u),
        |mx AS (SELECT doc_id, max(len) AS mlen FROM u GROUP BY 1),
        |ds AS (SELECT DISTINCT u.doc_id, u.s, u.len FROM u
        |       JOIN mx ON u.doc_id = mx.doc_id AND u.len = mx.mlen),
        |cov AS (SELECT DISTINCT doc_id, unnest(range(s, s + len)) AS p FROM ds),
        |cnt AS (SELECT doc_id, count(*) AS c FROM cov GROUP BY 1),
        |tok0 AS (SELECT doc_id, unnest(range(0, len(toks))) AS p, toks FROM t),
        |tok AS (SELECT doc_id, p, toks[p + 1] AS tk FROM tok0),
        |unc AS (SELECT k.doc_id, k.p, k.tk FROM tok k
        |        WHERE NOT EXISTS (SELECT 1 FROM cov c
        |                          WHERE c.doc_id = k.doc_id AND c.p = k.p)),
        |sc AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY p) AS scrubbed
        |       FROM unc GROUP BY 1)
        |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(mx.mlen, 0) AS BIGINT) AS span_len,
        |  CAST(coalesce(cnt.c, 0) AS BIGINT) AS dup_tokens,
        |  coalesce(sc.scrubbed, '') AS scrubbed
        |FROM t LEFT JOIN mx USING (doc_id) LEFT JOIN cnt USING (doc_id)
        |LEFT JOIN sc USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin
    }) { (s, dir) =>
    Ops.longestDupScrub(Tables(s, dir, "documents"), "doc_id", "text",
        n = DupBase, doublings = DupDoublings)
      .orderBy("doc_id")
  }

  val queries: Seq[QueryDef] =
    Seq(d01, d02, d03, d04, d05, d06, d07, q21, q27, d09, q31, d10, d11, d12, d13,
      d14, d15, p16, d16, d17, d18)
}
