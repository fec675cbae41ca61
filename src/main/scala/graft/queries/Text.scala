package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Text-analysis operators (SURVEY.md §2c T1–T5) over the documents table:
  * token counting, marker-based language ID, quality scoring, document
  * fingerprinting (polynomial rolling hash) and shingling stats.
  *
  * All operators are single-pass narrow transformations — at 100 TB they
  * run map-side with zero shuffle (the final ORDER BY exists only for the
  * deterministic oracle compare; production pipelines drop it).
  */
object Text {

  // DuckDB fragments mirrored by the Column helpers in TextFunctions.
  private val duckToks = "string_split(text, ' ')"
  private def duckMarkers(words: Seq[String]) =
    s"len(list_filter($duckToks, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"

  val t01 = QueryDef(
    "t01_token_stats",
    s"""SELECT doc_id, len($duckToks) AS n_tokens,
       |  length(text) AS n_chars,
       |  round((length(text) - len($duckToks) + 1) / len($duckToks), 4) AS mean_wlen
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("mean_wlen",
        round((col("n_chars") - col("n_tokens") + 1) / col("n_tokens"), 4))
      .orderBy("doc_id")
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "es" -> Seq("el", "la", "los"),
    "de" -> Seq("der", "die", "das"),
    "fr" -> Seq("le", "les", "une"))

  val t02 = QueryDef(
    "t02_lang_id",
    s"""SELECT doc_id,
       |  ${langMarkers.map { case (l, ws) => s"${duckMarkers(ws)} AS score_$l" }.mkString(",\n  ")},
       |  CASE ${langMarkers.map { case (l, _) =>
             s"WHEN score_$l > 0 AND score_$l >= greatest(${langMarkers.map("score_" + _._1).mkString(",")}) THEN '$l'"
           }.mkString(" ")}
       |    ELSE 'unknown' END AS predicted
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val toks = tokens(col("text"))
    val scored = Tables(s, dir, "documents")
      .select(col("doc_id") +:
        langMarkers.map { case (l, ws) => markerCount(toks, ws).as(s"score_$l") }: _*)
    val best = greatest(langMarkers.map(m => col("score_" + m._1)): _*)
    // CASE chain, first match wins — earlier languages take ties like the SQL.
    val pred = langMarkers.foldRight(lit("unknown")) { case ((l, _), els) =>
      when(col(s"score_$l") > 0 && col(s"score_$l") >= best, lit(l)).otherwise(els)
    }
    scored.withColumn("predicted", pred).orderBy("doc_id")
  }

  val t03 = QueryDef(
    "t03_quality_score",
    s"""SELECT doc_id,
       |  round(${duckMarkers(Seq("the", "a"))} / len($duckToks), 4) AS stop_ratio,
       |  round((length(text) - len($duckToks) + 1) / len($duckToks), 4) AS mean_wlen,
       |  round(0.6 * (1 - ${duckMarkers(Seq("the", "a"))} / len($duckToks))
       |    + 0.4 * least((length(text) - len($duckToks) + 1) / len($duckToks) / 8.0, 1.0), 4) AS quality
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val stops = markerCount(toks, Seq("the", "a"))
    val meanW = (length(col("text")).cast("long") - nTok + 1) / nTok
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        round(stops / nTok, 4).as("stop_ratio"),
        round(meanW, 4).as("mean_wlen"),
        round(lit(0.6) * (lit(1) - stops / nTok)
          + lit(0.4) * least(meanW / 8.0, lit(1.0)), 4).as("quality"))
      .orderBy("doc_id")
  }

  val t04 = QueryDef(
    "t04_fingerprint",
    """SELECT doc_id,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(text)+1),
      |    i -> CAST(ascii(text[i]) AS BIGINT))), (acc, c) -> (acc*31 + c) % 1000000007) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.functions.GraftExpressions.register(s)
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.GraftExpressions.polyHash(col("text")).as("fingerprint"))
      .orderBy("doc_id")
  }

  val t05 = QueryDef(
    "t05_shingles",
    s"""SELECT doc_id, len($duckToks) AS n_tokens,
       |  CASE WHEN len($duckToks) >= 3
       |    THEN len(list_distinct(list_transform(range(1, len($duckToks)-1),
       |           i -> $duckToks[i] || ' ' || $duckToks[i+1] || ' ' || $duckToks[i+2])))
       |    ELSE 0 END AS n_shingles
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.functions.SignatureExpressions.register(s)
    val toks = tokens(col("text"))
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        graft.functions.SignatureExpressions.distinctShingleCount(toks).as("n_shingles"))
      .orderBy("doc_id")
  }

  val queries: Seq[QueryDef] = Seq(t01, t02, t03, t04, t05)
}
