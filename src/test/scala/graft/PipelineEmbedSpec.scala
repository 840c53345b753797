package graft

import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, Dedup, Similarity}

/** End-to-end composition on the embedding side: near-dup prune →
  * ANN index (IVF+PQ) → query — the retrieval half of a training
  * pipeline (the text half lives in PipelineSpec). Exact accounting
  * at each stage, and the index only ever serves surviving vectors.
  */
class PipelineEmbedSpec extends SparkSpec {
  import spark.implicits._

  test("embedding near-dup prune → IVF+PQ index → query, with accounting") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val n = emb.count()
    assert(n > 0)

    // 1. exact embedding near-dup pairs (cos ≥ 0.45, d5's threshold
    //    on this corpus) → connected components → keep the min-id
    //    representative
    val pairs = Dedup.embeddingPairs(emb, "embedding", "vec_id", 0.45)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val comp = ConnectedComponents.run(pairs)
    val drop = comp.where(col("id") =!= col("component"))
      .select(col("id").as("vec_id"))
    val survivors = emb.join(drop, Seq("vec_id"), "left_anti")
      .localCheckpoint()
    val nSurv = survivors.count()
    assert(nSurv === n - drop.count())
    assert(nSurv > 0)

    // 2. query the pruned corpus through the IVF+PQ composite index;
    //    queries come from the dropped near-dups (the realistic shape:
    //    a new crawl probing the deduped index)
    val queries = emb.join(drop.orderBy("vec_id").limit(5), Seq("vec_id"))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .localCheckpoint()
    val nQ = queries.count()
    if (nQ > 0) {
      val hits = Similarity.ivfPqKnn(survivors, "embedding", "vec_id", queries, k = 5)
      // every emitted neighbor is a survivor (the index never leaks
      // pruned vectors), every query answered with a full k list
      val survIds = survivors.select("vec_id").as[Long].collect().toSet
      val rows = hits.select("q_id", "neighbor_id").as[(Long, Long)].collect()
      assert(rows.length === nQ * 5, s"${rows.length} rows for $nQ queries")
      rows.foreach { case (_, nb) =>
        assert(survIds.contains(nb), s"pruned vector $nb served from the index")
      }
      // a dropped near-dup's top hit should be (one of) its cluster
      // representatives — the vector it was deduped against — for at
      // least one query (sanity that similarity survives the prune)
      val repOf = comp.select("id", "component").as[(Long, Long)].collect().toMap
      val topHits = Similarity.ivfPqKnn(survivors, "embedding", "vec_id", queries, k = 1)
        .select("q_id", "neighbor_id").as[(Long, Long)].collect().toMap
      val recovered = topHits.count { case (q, nb) => repOf.get(q).contains(nb) }
      assert(recovered >= 1, s"no dropped dup recovered its representative: $topHits")
    }
  }
}
