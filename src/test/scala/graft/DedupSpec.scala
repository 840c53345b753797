package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dedup operators against planted duplicates (the driver data has
  * near-dups but no exact dups, so we plant our own here).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  /** documents ∪ copies of the first 20 docs (new ids, same text,
    * one with extra whitespace/case noise that normalization removes).
    */
  private lazy val withDups = {
    val copies = docs.orderBy("doc_id").limit(20)
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", concat(upper(substring(col("text"), 1, 5)),
        substring(col("text"), 6, 1000000), lit("  ")))
    docs.unionByName(copies)
  }

  test("d1: exact dedup collapses normalized duplicates") {
    val out = Dedup.exact(withDups, "text", "doc_id")
    assert(out.count() === docs.count()) // 20 dups collapsed
    assert(out.where(col("n_copies") === 2).count() === 20)
    // keeper is always the original (minimum) id
    assert(out.where(col("n_copies") === 2).where(col("keep_id") >= 100000L).count() === 0)
  }

  test("d2: minhash LSH surfaces planted exact dups as candidates") {
    val cands = Dedup.minhashCandidates(withDups, "text", "doc_id")
      .where(col("id_b") >= 100000L && col("id_a") === col("id_b") - 100000L)
    assert(cands.count() === 20) // every planted pair collides in all bands
    assert(cands.where(col("n_bands") === 4).count() === 20)
  }

  test("d3: simhash of planted dup pairs has hamming 0; distinct docs differ") {
    val fp = Dedup.simhashFingerprints(withDups, "text", "doc_id")
    val a = fp.toDF("id_a", "sh_a")
    val b = fp.toDF("id_b", "sh_b")
    val planted = a.join(b, col("id_b") === col("id_a") + 100000L)
    assert(planted.count() === 20)
    assert(planted.where(col("sh_a") === col("sh_b")).count() === 20)
    assert(fp.select("simhash").distinct().count() > 400)
  }

  test("d3: simhashPairs finds planted dups within hamming bound") {
    val pairs = Dedup.simhashPairs(withDups, "text", "doc_id", maxHamming = 3)
    val planted = pairs.where(col("id_b") >= 100000L && col("id_a") === col("id_b") - 100000L)
    assert(planted.count() === 20)
  }

  test("d4: jaccard pairs include the driver data's near-dups at >= 0.9") {
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", 0.5)
    assert(pairs.where(col("jaccard") >= 0.9).count() > 0)
  }

  test("d5: embedding pairs are symmetric-safe (id_a < id_b) and thresholded") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pairs = Dedup.embeddingPairs(emb, "embedding", "vec_id", 0.45)
    assert(pairs.where(col("id_a") >= col("id_b")).count() === 0)
    assert(pairs.where(col("cos_sim") < 0.45).count() === 0)
  }

  test("d6: decontamination excludes the benchmark slice and flags iff shared") {
    val rows = graft.queries.DedupQueries.queries("d6_decontaminate")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 97 != 0L)
      assert(r.getAs[Boolean]("contaminated") === (r.getAs[Long]("n_shared") > 0))
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("n_shingles"))
    }
  }
}
