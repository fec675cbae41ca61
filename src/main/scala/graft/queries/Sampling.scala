package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryDef
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

  val q19 = QueryDef(
    "q19_hash_split",
    s"""WITH k AS (SELECT doc_id, 'split:' || CAST(doc_id AS VARCHAR) AS kk
       |           FROM documents),
       |b AS (SELECT doc_id, ${sqlPolyHash("kk")} % 100 AS bucket FROM k)
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
       |WHERE ${sqlPolyHash("kk")} % 100 < 37
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Ops.sample(Tables(s, dir, "documents"), "doc_id", pct = 37, salt = "s1:")
      .select("doc_id").orderBy("doc_id")
  }

  val queries: Seq[QueryDef] = Seq(q19, q20)
}
