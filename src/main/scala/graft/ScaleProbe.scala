package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: replicates the documents/embeddings tables N× (ids
  * shifted, text/vectors perturbed deterministically so replicas are not
  * trivial duplicates) into /tmp, then runs the dedup/similarity operators
  * at the inflated size and prints timings. Validates that the LSH-join
  * designs scale superlinearly better than the O(n²) baselines they
  * replace — evidence for SURVEY.md §4.
  *
  *   sbt "runMain graft.ScaleProbe 10"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val src = "/root/testdata/sf0.1"
    val out = s"/tmp/graft_scale_x$factor"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.count()
    val reps = spark.range(factor).select(col("id").as("rep"))
    // Perturb each replica: append a replica-specific token so cross-replica
    // pairs are near-dups (high Jaccard) rather than exact dups — the worst
    // case for candidate generation.
    docs.crossJoin(reps)
      .select((col("doc_id") + col("rep") * nDocs).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nEmb = emb.count()
    // Perturb replicas elementwise (rep-scaled shift) so cross-replica
    // vectors are near- but not exact duplicates.
    emb.crossJoin(reps)
      .select((col("vec_id") + col("rep") * nEmb).as("vec_id"),
        transform(col("embedding"),
          x => (x + col("rep").cast("float") * lit(0.003f)).cast("float")).as("embedding"),
        col("label"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale x$factor] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs  out_rows=$n")
    }
    println(s"[scale x$factor] documents=${nDocs * factor} embeddings=${nEmb * factor}")
    val d = spark.read.parquet(s"$out/documents.parquet")
    time("d01 exact")(graft.operators.Dedup.exact(d, "doc_id", "text").count())
    time("d03 minhash-lsh")(graft.operators.Dedup.minhashLshPairs(d, "doc_id", "text", 0.5).count())
    time("d04 simhash")(graft.operators.Dedup.simhashPairs(d, "doc_id", "text").count())
    time("d02 ngram-jaccard")(graft.operators.Dedup.ngramJaccardPairs(d, "doc_id", "text", 0.5, 20).count())
    time("d06 clusters")(graft.operators.Dedup.clusters(d, "doc_id",
      graft.operators.Dedup.minhashLshPairs(d, "doc_id", "text", 0.5)).filter(col("keep")).count())
    val e = spark.read.parquet(s"$out/embeddings.parquet")
    time("s02 ann-lsh")(graft.operators.Similarity.annLsh(e, "vec_id", "embedding",
      graft.queries.Similarity.planes).count())
    time("s03 centroids")(graft.operators.Similarity.centroids(e, "label", "embedding").count())
    spark.stop()
  }
}
