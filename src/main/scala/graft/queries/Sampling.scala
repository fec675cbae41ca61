package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.functions.Rounding.{sqlMirrorRound => mr}
import graft.operators.{Sampling => Ops}
import graft.sources.Tables

/** Verified-query surface for deterministic sampling/splitting
  * ([[graft.operators.Sampling]]): both engines compute the identical
  * polynomial hash of the salted key (the t04 fingerprint fold), so
  * bucket assignment — and therefore sample/split membership — is
  * bit-identical row by row.
  */
object Sampling {

  /** DuckDB mirror of the polyHash fold over a (pre-materialized) string
    * column `c` — the same formula t04 verifies against document text.
    */
  private def sqlPolyHash(c: String): String =
    graft.functions.Signatures.sqlPolyHashStr(c)

  /** DuckDB mirror of [[graft.operators.Sampling.hashBucket]]'s scrambled
    * hash (before the `% buckets`): the order-shuffling bijection that
    * makes bucket thresholds fair for structured key families.
    */
  private def sqlScram(c: String): String =
    s"((${sqlPolyHash(c)} * 2654435761) % 1000000007)"

  val q19 = QueryDef(
    "q19_hash_split",
    s"""WITH k AS (SELECT doc_id, 'split:' || CAST(doc_id AS VARCHAR) AS kk
       |           FROM documents),
       |b AS (SELECT doc_id, ${sqlScram("kk")} % 100 AS bucket FROM k)
       |SELECT doc_id,
       |  CASE WHEN bucket < 80 THEN 'train'
       |       WHEN bucket < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM b ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Ops.split(Tables(s, dir, "documents"), "doc_id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10), salt = "split:")
      .select("doc_id", "split").orderBy("doc_id")
  }

  val q20 = QueryDef(
    "q20_hash_sample",
    s"""WITH k AS (SELECT doc_id, 's1:' || CAST(doc_id AS VARCHAR) AS kk
       |           FROM documents)
       |SELECT doc_id FROM k
       |WHERE ${sqlScram("kk")} % 100 < 37
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Ops.sample(Tables(s, dir, "documents"), "doc_id", pct = 37, salt = "s1:")
      .select("doc_id").orderBy("doc_id")
  }

  private val PackBudget = 512
  private val PackShards = 8

  /** q22: sequence packing — greedy first-fit token-budget packing in id
    * order within deterministic hash shards
    * ([[graft.operators.Packing]]). The oracle replays the same greedy
    * rule with a recursive CTE: rows advance one per iteration per
    * shard, carrying (pack, fill, pos) state — sequential semantics
    * expressed relationally, so both engines agree row for row.
    */
  val q22 = QueryDef(
    "q22_pack_sequences",
    s"""WITH RECURSIVE k AS (
       |  SELECT doc_id, 'pack:' || CAST(doc_id AS VARCHAR) AS kk,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
       |  FROM documents),
       |d AS (SELECT doc_id, ${sqlScram("kk")} % $PackShards AS shard, n,
       |        row_number() OVER (PARTITION BY ${sqlScram("kk")} % $PackShards
       |                           ORDER BY doc_id) AS rn
       |      FROM k),
       |p(shard, rn, doc_id, n, pack, fill, pos) AS (
       |  SELECT shard, rn, doc_id, n, CAST(0 AS BIGINT), n, CAST(0 AS BIGINT)
       |  FROM d WHERE rn = 1
       |  UNION ALL
       |  SELECT d.shard, d.rn, d.doc_id, d.n,
       |    CASE WHEN p.fill > 0 AND p.fill + d.n > $PackBudget
       |         THEN p.pack + 1 ELSE p.pack END,
       |    CASE WHEN p.fill > 0 AND p.fill + d.n > $PackBudget
       |         THEN d.n ELSE p.fill + d.n END,
       |    CASE WHEN p.fill > 0 AND p.fill + d.n > $PackBudget
       |         THEN CAST(0 AS BIGINT) ELSE p.pos + 1 END
       |  FROM p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard, pack, pos AS pack_pos
       |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ", -1)).as("n"))
    graft.operators.Packing.packSequences(docs, "doc_id", "n",
        budget = PackBudget, shards = PackShards, salt = "pack:")
      .orderBy("doc_id")
  }

  /** q23: stratified hash sample — an independent deterministic sample
    * per stratum (the stratum salts the key, so strata are decorrelated
    * while each stays permanent and layout-independent).
    */
  val q23 = QueryDef(
    "q23_stratified_sample",
    s"""WITH k AS (SELECT doc_id, lang,
       |  'strat:' || lang || ':' || CAST(doc_id AS VARCHAR) AS kk
       |  FROM documents)
       |SELECT doc_id, lang FROM k
       |WHERE ${sqlScram("kk")} % 100 < 25
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Ops.stratifiedSample(Tables(s, dir, "documents"), "doc_id", "lang",
        pct = 25, salt = "strat:")
      .select("doc_id", "lang").orderBy("doc_id")
  }

  /** q28: balanced fixed-count take — 20 docs per language by hash
    * order ([[graft.operators.Sampling.takePerGroup]]): the
    * source-balancing step, deterministic and unbiased.
    */
  val q28 = QueryDef(
    "q28_balanced_take",
    s"""WITH k AS (SELECT doc_id, lang,
       |  'bal:' || CAST(doc_id AS VARCHAR) AS kk FROM documents),
       |r AS (SELECT doc_id, lang, row_number() OVER (
       |        PARTITION BY lang
       |        ORDER BY (${sqlPolyHash("kk")} * 2654435761) % 1000000007, doc_id) AS rk
       |      FROM k)
       |SELECT doc_id, lang FROM r WHERE rk <= 20
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Ops.takePerGroup(Tables(s, dir, "documents"), "doc_id", "lang", n = 20, salt = "bal:")
      .select("doc_id", "lang").orderBy("doc_id")
  }

  /** q29: temperature resampling (data mixing) — per-language keep-rate
    * (n_min/n_l)^(1-alpha) at alpha = 0.5, membership by the group-salted
    * hash predicate. sqrt is IEEE-correctly-rounded on both engines, so
    * the floor()'d per-group threshold — and therefore every row's
    * membership — is bit-identical.
    */
  val q29 = QueryDef(
    "q29_temperature_sample",
    s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
       |m AS (SELECT min(n) AS nmin FROM c),
       |r AS (SELECT lang,
       |        CAST(floor(sqrt(CAST(nmin AS DOUBLE) / n) * 1000000) AS BIGINT) AS thr
       |      FROM c CROSS JOIN m),
       |k AS (SELECT d.doc_id, d.lang,
       |        'temp:' || d.lang || ':' || CAST(d.doc_id AS VARCHAR) AS kk, r.thr
       |      FROM documents d JOIN r ON d.lang = r.lang)
       |SELECT doc_id, lang FROM k
       |WHERE ${sqlScram("kk")} % 1000000 < thr
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Ops.temperatureSample(Tables(s, dir, "documents"), "doc_id", "lang",
        alpha = 0.5, salt = "temp:")
      .select("doc_id", "lang").orderBy("doc_id")
  }

  /** q30: deterministic shuffle-to-shards — the pre-training global
    * shuffle as (shard, shard_pos) from one scrambled hash: shard
    * assignment is narrow, positions are a per-shard window (parallel
    * across shards, no global sort), and re-salting is a fresh epoch
    * shuffle.
    */
  val q30 = QueryDef(
    "q30_shuffle_shards",
    s"""WITH k AS (SELECT doc_id, 'ep1:' || CAST(doc_id AS VARCHAR) AS kk
       |           FROM documents),
       |h AS (SELECT doc_id, ${sqlScram("kk")} AS h FROM k)
       |SELECT doc_id, CAST(h % 8 AS BIGINT) AS shard,
       |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1 AS BIGINT)
       |    AS shard_pos
       |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Ops.shuffleShards(Tables(s, dir, "documents"), "doc_id", shards = 8, salt = "ep1:")
      .select("doc_id", "shard", "shard_pos").orderBy("doc_id")
  }

  private val DsirDim = 4096     // hashed-feature buckets
  private val DsirTargetPct = 10 // hash-bucket % playing the target corpus

  /** q32: DSIR importance weights (Xie et al. 2023) — raw docs scored by
    * Σ_f [ln p̂_target(f) − ln p̂_raw(f)] over hashed unigram+bigram
    * buckets with add-one smoothing; the target corpus is the
    * deterministic 10% hash split (salt 'dsir:'). Both engines share the
    * token-hash → bucket arithmetic and the smoothing formula; sums of
    * logs are rounded to 4 dp (the t11 log-parity precedent).
    */
  val q32 = QueryDef(
    "q32_dsir_weights", {
      val Sg = graft.functions.Signatures
      val uni = s"x * 2654435761 % 1000000007 % $DsirDim"
      val bi = s"((th[i] * ${Sg.B} + th[i+1]) % 1000000007) * 2654435761 % 1000000007 % $DsirDim"
      s"""WITH k AS (SELECT doc_id, text,
         |             'dsir:' || CAST(doc_id AS VARCHAR) AS kk FROM documents),
         |m AS (SELECT doc_id, text, ${sqlScram("kk")} % 100 < $DsirTargetPct AS is_t
         |      FROM k),
         |t AS (SELECT doc_id, is_t, string_split(text, ' ') AS toks FROM m),
         |h AS (SELECT doc_id, is_t, ${Sg.sqlTokenHashes("toks")} AS th FROM t),
         |f AS (SELECT doc_id, is_t,
         |        unnest(list_transform(th, x -> $uni)) AS bucket FROM h
         |      UNION ALL
         |      SELECT doc_id, is_t,
         |        unnest(list_transform(range(1, len(th)), i -> $bi)) AS bucket FROM h),
         |tc AS (SELECT bucket, count(*) AS ct FROM f WHERE is_t GROUP BY 1),
         |rc AS (SELECT bucket, count(*) AS cr FROM f WHERE NOT is_t GROUP BY 1),
         |tot AS (SELECT (SELECT coalesce(sum(ct), 0) FROM tc) AS tt,
         |               (SELECT coalesce(sum(cr), 0) FROM rc) AS rt),
         |ratio AS (SELECT coalesce(tc.bucket, rc.bucket) AS bucket,
         |            ln(coalesce(ct, 0) + 1.0) - ln(tt + $DsirDim)
         |            - ln(coalesce(cr, 0) + 1.0) + ln(rt + $DsirDim) AS lr
         |          FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket
         |          CROSS JOIN tot),
         |s AS (SELECT f.doc_id, count(*) AS n_feats, sum(r.lr) AS lw
         |      FROM f JOIN ratio r USING (bucket)
         |      WHERE NOT f.is_t GROUP BY 1)
         |SELECT doc_id, CAST(n_feats AS BIGINT) AS n_feats,
         |  ${graft.functions.Rounding.sqlMirrorRound("lw", 4)} AS logw
         |FROM s ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
    graft.functions.GraftExpressions.register(s)
    val docs = Tables(s, dir, "documents")
    val isT = Ops.hashBucket(col("doc_id"), 100, "dsir:") < DsirTargetPct
    Ops.dsirWeights(docs.filter(!isT), docs.filter(isT), "doc_id", "text",
      dim = DsirDim).orderBy("doc_id")
  }

  private val WTakeN = 100

  /** q54: deterministic weighted sampling without replacement
    * ([[graft.operators.Sampling.weightedTake]]) — Efraimidis–Spirakis
    * exponential keys with the scrambled hash as the uniform, weights =
    * doc length: both engines compute the identical rank key ln(u)/w
    * (u = (scram+1)/(P+1) — never 0, so ln is finite) and the same
    * top-100 row SET falls out; the oracle LIMITs on the UNROUNDED key
    * and only then mirror-rounds for the value compare.
    */
  val q54 = QueryDef(
    "q54_weighted_sample",
    s"""WITH k AS (SELECT doc_id, n_chars,
       |            'w1:' || CAST(doc_id AS VARCHAR) AS kk FROM documents),
       |b AS (SELECT doc_id, n_chars,
       |        ln(CAST(${sqlScram("kk")} + 1 AS DOUBLE) / 1000000008.0)
       |          / CAST(n_chars AS DOUBLE) AS wkey
       |      FROM k),
       |top AS (SELECT * FROM b ORDER BY wkey DESC, doc_id LIMIT $WTakeN)
       |SELECT doc_id, n_chars,
       |  ${graft.functions.Rounding.sqlMirrorRound("wkey", 8)} AS wkey
       |FROM top ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Ops.weightedTake(Tables(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", col("n_chars"), n = WTakeN, salt = "w1:")
      .withColumn("wkey", graft.functions.Rounding.mirrorRound(col("wkey"), 8))
      .orderBy("doc_id")
  }

  /** q102: per-source token-budget mixing
    * ([[graft.operators.Sampling.takeToBudget]]) — the data-mixer
    * selection: each source contributes documents in scrambled-hash
    * order until its char budget (1000 + 400·i for src`i`) is reached,
    * the crossing document kept. The budget formula spans both paths at
    * every SF: small budgets truncate rich sources, large budgets
    * exhaust poor ones (whole source kept). Oracle mirrors the hash
    * order and the running-sum window; `cum − w < budget` is exact
    * integer arithmetic on both engines.
    */
  val q102 = QueryDef(
    "q102_token_budget",
    s"""WITH k AS (SELECT doc_id, source, n_chars,
       |             'mix:' || CAST(doc_id AS VARCHAR) AS kk,
       |             1000 + 400 * CAST(substr(source, 4) AS BIGINT) AS budget
       |           FROM documents),
       |c AS (SELECT doc_id, source, n_chars, budget,
       |        sum(n_chars) OVER (PARTITION BY source
       |          ORDER BY ${sqlScram("kk")}, doc_id) AS cum
       |      FROM k)
       |SELECT doc_id, source, n_chars FROM c
       |WHERE cum - n_chars < budget ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val budgets = (0 until 20).map(i => s"src$i" -> (1000L + 400L * i)).toMap
    Ops.takeToBudget(Tables(s, dir, "documents"), "source", "n_chars",
        "doc_id", budgets, salt = "mix:")
      .select("doc_id", "source", "n_chars").orderBy("doc_id")
  }

  /** q103: per-source epoch upsampling
    * ([[graft.operators.Sampling.epochMix]]) — the mixer's other half:
    * src`i` repeats 1 + (i mod 5)·0.5 epochs (1.0×–3.0×), full copies
    * exploded with an epoch id, the fractional epoch a scrambled-hash
    * permille subset salted by the epoch index. Everything integer:
    * membership is `scram % 1000 < frac`, bit-identical cross-engine.
    */
  val q103 = QueryDef(
    "q103_epoch_mix",
    s"""WITH k AS (SELECT doc_id, source,
       |             1000 + (CAST(substr(source, 4) AS BIGINT) % 5) * 500 AS permille
       |           FROM documents),
       |s(epoch) AS (VALUES (CAST(0 AS BIGINT)), (1), (2), (3)),
       |x AS (SELECT doc_id, source, epoch, permille // 1000 AS eFull,
       |        permille % 1000 AS frac,
       |        'em:ep' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR) AS kk
       |      FROM k JOIN s ON epoch <= permille // 1000),
       |y AS (SELECT doc_id, source, epoch FROM x
       |      WHERE epoch < eFull OR ${sqlScram("kk")} % 1000 < frac)
       |SELECT doc_id, source, epoch FROM y ORDER BY doc_id, epoch""".stripMargin) { (s, dir) =>
    val mix = (0 until 20).map(i => s"src$i" -> (1000L + (i % 5) * 500L)).toMap
    Ops.epochMix(Tables(s, dir, "documents"), "source", "doc_id", mix, salt = "em:")
      .select("doc_id", "source", "epoch").orderBy("doc_id", "epoch")
  }

  /** q104: curriculum annealing ([[graft.operators.Sampling.annealMix]]) —
    * the mixer's schedule axis: src`i`'s keep-rate interpolates from
    * 1000−(i%5)·200‰ to 200+(i%5)·200‰ across 4 phases, so some sources
    * anneal down while others anneal up, and the /3 interpolation exercises
    * truncation. Membership per phase is the phase-salted permille rule —
    * all integer, bit-identical cross-engine.
    */
  val q104 = QueryDef(
    "q104_anneal_mix",
    s"""WITH w AS (SELECT doc_id, source,
       |             1000 - (CAST(substr(source, 4) AS BIGINT) % 5) * 200 AS w0,
       |             200 + (CAST(substr(source, 4) AS BIGINT) % 5) * 200 AS w1
       |           FROM documents),
       |p(phase) AS (VALUES (CAST(0 AS BIGINT)), (1), (2), (3)),
       |x AS (SELECT doc_id, source, phase,
       |        (w0 * (3 - phase) + w1 * phase) // 3 AS permille,
       |        'am:ph' || CAST(phase AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR) AS kk
       |      FROM w CROSS JOIN p)
       |SELECT doc_id, source, phase FROM x
       |WHERE ${sqlScram("kk")} % 1000 < permille
       |ORDER BY doc_id, phase""".stripMargin) { (s, dir) =>
    val start = (0 until 20).map(i => s"src$i" -> (1000L - (i % 5) * 200L)).toMap
    val end = (0 until 20).map(i => s"src$i" -> (200L + (i % 5) * 200L)).toMap
    Ops.annealMix(Tables(s, dir, "documents"), "source", "doc_id",
        start, end, phases = 4, salt = "am:")
      .select("doc_id", "source", "phase").orderBy("doc_id", "phase")
  }

  /** q106: leakage-safe domain-grouped split (X13) — q19's hash split
    * with the split KEY lifted from the row to its REGISTERED DOMAIN,
    * so every page of one site lands in one split and near-duplicates
    * within a site (boilerplate, templated pages, mirrored articles)
    * can never straddle train/test — the contamination mode a row-level
    * split is blind to. The chain under verification is the real one:
    * fabricated per-doc URLs (subdomain varying, `.com`/`.co.uk` TLDs)
    * → `Url.host` → `Url.registeredDomain` (the second-level-ccTLD
    * rule must strip `co.uk` to the same depth as `.com`) → the q19
    * scrambled-hash bucket on the DOMAIN string. The oracle recomputes
    * the domain INDEPENDENTLY from doc_id arithmetic (the p13 pattern)
    * — it agrees only if host extraction and PSL-style reduction both
    * worked — then replays the hash membership bit-identically.
    * Scale shape: domain derivation and split assignment are narrow
    * codegen'd Columns (zero UDFs, zero shuffle, zero joins) — at
    * 100 TB split assignment rides the scan.
    */
  val q106 = QueryDef(
    "q106_domain_split",
    s"""WITH d AS (SELECT doc_id,
       |    'example' || CAST(doc_id % 211 AS VARCHAR) ||
       |      CASE WHEN doc_id % 2 = 0 THEN '.com' ELSE '.co.uk' END AS domain
       |  FROM documents),
       |b AS (SELECT doc_id, domain, 'dsplit:' || domain AS kk FROM d)
       |SELECT doc_id, domain,
       |  CASE WHEN ${sqlScram("kk")} % 100 < 90 THEN 'train' ELSE 'test' END AS split
       |FROM b ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val subs = typedlit(Seq("www", "cdn", "shop"))
    val docs = Tables(s, dir, "documents")
      .withColumn("url", concat(lit("https://"),
        element_at(subs, (col("doc_id") % 3 + 1).cast("int")),
        lit(".example"), (col("doc_id") % 211).cast("string"),
        when(col("doc_id") % 2 === 0, ".com").otherwise(".co.uk"),
        lit("/p/"), col("doc_id").cast("string")))
      .withColumn("domain", graft.operators.Url.registeredDomain(col("url")))
    Ops.split(docs, "domain", Seq("train" -> 90, "test" -> 10), salt = "dsplit:")
      .select("doc_id", "domain", "split").orderBy("doc_id")
  }

  private val BootB = 200     // replicates
  private val BootAlpha = 25  // one-sided tail mass, 1/1000 units -> 95% CI

  /** q111: Poisson-bootstrap 95% CI for the mean account balance per
    * market segment ([[Ops.poissonBootstrapMeanCI]]) — the SCALABLE
    * bootstrap (Chamandy et al.): classical with-replacement resampling
    * needs global coordination per replicate; Poisson(1) multiplicities
    * are a pure map-side function of the (row, replicate) hash, so the
    * whole bootstrap is ONE partial-agg groupBy shuffling only B·|groups|
    * replicate partials. The oracle replays the hash→uniform→inverse-CDF
    * weight chain bit for bit (shared threshold literals), mirror-rounds
    * each replicate mean BEFORE ranking (a last-ulp float-sum gap cannot
    * flip a rank), and selects the interval by the exact rank rule.
    */
  val q111 = QueryDef(
    "q111_bootstrap_ci", {
      val cdf = graft.operators.Sampling.poissonCdfLiterals
      val wgt = cdf.zipWithIndex
        .map { case (t, k) => s"WHEN u < $t THEN $k" }
        .mkString("CASE ", " ", s" ELSE ${cdf.length} END")
      s"""WITH rep AS (SELECT c_mktsegment AS seg, c_custkey, c_acctbal, b.range AS b,
         |    'boot:' || CAST(c_custkey AS VARCHAR) || '#' || CAST(b.range AS VARCHAR) AS kk
         |  FROM customer CROSS JOIN range(0, $BootB) b
         |  WHERE c_acctbal IS NOT NULL AND c_custkey IS NOT NULL),
         |w AS (SELECT seg, b, c_acctbal,
         |        CAST(${sqlScram("kk")} AS DOUBLE) / 1000000007.0 AS u
         |      FROM rep),
         |means AS (SELECT seg, b,
         |    ${mr("sum(CAST(w AS DOUBLE) * c_acctbal) / CAST(sum(w) AS DOUBLE)", 6)} AS m
         |  FROM (SELECT seg, b, c_acctbal, $wgt AS w FROM w) s
         |  GROUP BY 1, 2 HAVING sum(w) > 0),
         |ci AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_reps,
         |         list(m ORDER BY m, b) AS ms
         |       FROM means GROUP BY 1),
         |fin AS (SELECT seg, n_reps,
         |    ms[CAST(greatest(1, ceil(n_reps * $BootAlpha / 1000.0)) AS BIGINT)] AS lo,
         |    ms[CAST(ceil(n_reps * ${1000 - BootAlpha} / 1000.0) AS BIGINT)] AS hi
         |  FROM ci),
         |allrows AS (SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
         |    ${mr("sum(c_acctbal) / CAST(count(*) AS DOUBLE)", 6)} AS mean
         |  FROM customer WHERE c_acctbal IS NOT NULL AND c_custkey IS NOT NULL
         |  GROUP BY 1)
         |SELECT allrows.seg AS c_mktsegment, n, mean, n_reps, lo, hi
         |FROM allrows JOIN fin ON allrows.seg = fin.seg
         |ORDER BY c_mktsegment""".stripMargin
    }) { (s, dir) =>
    Ops.poissonBootstrapMeanCI(Tables(s, dir, "customer"),
        Seq("c_mktsegment"), "c_custkey", col("c_acctbal"),
        b = BootB, alphaPct = BootAlpha, salt = "boot:")
      .orderBy("c_mktsegment")
  }

  val queries: Seq[QueryDef] = Seq(q19, q20, q22, q23, q28, q29, q30, q32, q54,
    q102, q103, q104, q106, q111)
}
