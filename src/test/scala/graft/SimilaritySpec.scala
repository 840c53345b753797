package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val queries = emb.where(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  test("s2: LSH ANN achieves reasonable recall vs brute force") {
    val exact = Similarity.bruteKnn(emb, "embedding", "vec_id", queries, 10)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshKnn(emb, "embedding", "vec_id", queries, 10)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@10 = $recall")
  }

  test("s2: LSH scores far fewer candidates than brute force") {
    val planes = Similarity.hyperplanes(8, 64)
    assert(planes.length === 8 && planes(0).length === 64)
    // deterministic across calls
    assert(Similarity.hyperplanes(8, 64)(3)(17) === planes(3)(17))
    // bucket sizes: no bucket holds more than a quarter of the corpus
    val n = emb.count()
    val maxBucket = Similarity.lshKnn(emb, "embedding", "vec_id", queries, Int.MaxValue)
      .groupBy("q_id").count().agg(max("count")).as[Long].head()
    assert(maxBucket < n / 2, s"maxBucket=$maxBucket of $n")
  }

  test("s9: recall summary is consistent with its own legs and deterministic") {
    val row = Similarity.annRecallEval(emb, "embedding", "vec_id", k = 5, samplePct = 20).head()
    val nQ = row.getAs[Long]("n_q")
    val nHits = row.getAs[Long]("n_hits")
    val recall = row.getAs[Double]("recall")
    // md5 buckets spread ~20% of the 500 vectors
    assert(nQ > 50 && nQ < 150, s"n_q=$nQ")
    assert(row.getAs[Long]("k") === 5L)
    assert(nHits <= nQ * 5)
    assert(recall >= 0.0 && recall <= 1.0)
    // same floor as the s2 recall spec: multiprobe LSH finds a
    // reasonable share of the true top-5
    assert(recall >= 0.3, s"recall@5 = $recall")
    // sampled-query evaluation is deterministic (no RNG anywhere)
    assert(Similarity.annRecallEval(emb, "embedding", "vec_id", k = 5, samplePct = 20)
      .head() === row)
  }

  test("s3: IVF ANN achieves reasonable recall and probes a corpus fraction") {
    val exact = Similarity.bruteKnn(emb, "embedding", "vec_id", queries, 10)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfKnn(emb, "embedding", "vec_id", queries, 10)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"ivf recall@10 = $recall")
    assert(ivf.size === 50)
  }

  test("s18: filtered kNN returns only predicate rows; filtered IVF keeps recall and is exact at full probe") {
    val pred = pmod(col("label"), lit(3)) === 0
    val exact = Similarity.filteredKnn(emb, "embedding", "vec_id", pred, queries, 10)
    val rows = exact.collect()
    assert(rows.length === 50) // 5 queries x 10
    // every neighbor satisfies the predicate
    val allowedIds = emb.where(pred).select("vec_id").as[Long].collect().toSet
    rows.foreach(r => assert(allowedIds.contains(r.getAs[Long]("neighbor_id"))))
    val exactSet = rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    // IVF-served: allowed set semi-joins the cells before scoring
    val index = Similarity.ivfIndexBuild(emb, "embedding", "vec_id", nlist = 16)
    val allowed = emb.where(pred).select("vec_id")
    val served = Similarity.ivfKnnFiltered(index, allowed, queries, 10, nprobe = 4)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    served.foreach { case (_, n) => assert(allowedIds.contains(n)) }
    val recall = (exactSet & served).size.toDouble / exactSet.size
    assert(recall >= 0.3, s"filtered ivf recall@10 = $recall")
    // full probe scans every cell → identical to the exact baseline
    val full = Similarity.ivfKnnFiltered(index, allowed, queries, 10, nprobe = 16)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full === exactSet)
    // shuffled allowed-set path serves the same rows as the broadcast one
    val shuffled = Similarity.ivfKnnFiltered(
      index, allowed, queries, 10, nprobe = 4, broadcastAllowed = false)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(shuffled === served)
  }

  test("s11: persisted IVF index round-trips and serves bit-identical results to the fresh index") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    val fresh = Similarity.ivfIndexBuild(emb, "embedding", "vec_id")
    val (cv, lv) = Similarity.ivfIndexSave(fresh, dir)
    assert(cv === 1 && lv === 1)
    val loaded = Similarity.ivfIndexLoad(spark, dir)
    def run(ix: Similarity.IvfIndex) =
      Similarity.ivfKnnWith(ix, queries, k = 10)
        .collect().map(_.toString).sorted.toSeq
    // serving from the lake ≡ serving from the in-session build: the
    // floats round-trip parquet exactly, scoring/tie-breaks follow
    val servedFresh = run(fresh)
    assert(run(loaded) === servedFresh)
    // and ≡ the one-shot ivfKnn composition
    assert(Similarity.ivfKnn(emb, "embedding", "vec_id", queries, 10)
      .collect().map(_.toString).sorted.toSeq === servedFresh)
    // re-index = a new atomic snapshot; the old serving release stays
    // pinned and replayable by version
    val (cv2, lv2) = Similarity.ivfIndexSave(
      Similarity.ivfIndexBuild(emb.where(col("vec_id") % 2 === 0), "embedding", "vec_id"), dir)
    assert(cv2 === 2 && lv2 === 2)
    assert(run(Similarity.ivfIndexLoad(spark, dir, Some(1), Some(1))) === servedFresh)
    assert(Similarity.ivfIndexLoad(spark, dir).cells.count() === emb.count() / 2)
  }

  test("s12: cell-balance report is consistent, deterministic, and detects a collapsed index") {
    val ix = Similarity.ivfIndexBuild(emb, "embedding", "vec_id")
    val r = Similarity.cellBalance(ix).collect().head
    val (nlist, used, empty, nVec, minOcc, maxOcc, imb) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))
    assert(nVec === emb.count())
    assert(used + empty === nlist)
    assert(minOcc >= 1 && maxOcc >= minOcc)
    assert(imb >= 1.0 - 1e-9)
    // deterministic across runs (same seeding, same fold)
    val again = Similarity.cellBalance(
      Similarity.ivfIndexBuild(emb, "embedding", "vec_id")).collect().head
    assert(again.toString === r.toString)
    // a degenerate corpus (every vector identical) collapses into one
    // cell and the report says so loudly
    val oneVec = emb.limit(1).select(col("embedding")).head.getSeq[Float](0)
    val clones = spark.range(0, 64).select(
      col("id").as("vec_id"),
      typedLit(oneVec).as("embedding"))
    val deg = Similarity.cellBalance(
      Similarity.ivfIndexBuild(clones, "embedding", "vec_id", nlist = 8))
      .collect().head
    // collapse is loud either way: one live cell holding everything,
    // and the centroid fit itself shrank far below the requested 8
    assert(deg.getLong(1) === 1L) // one cell used
    assert(deg.getLong(5) === 64L) // ...holding every vector
    assert(deg.getLong(0) < 8L) // requested nlist not even reachable
  }

  test("s4: PQ ANN achieves reasonable recall, exact scores on survivors") {
    val exactDf = Similarity.bruteKnn(emb, "embedding", "vec_id", queries, 10)
    val exact = exactDf.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pqDf = Similarity.pqKnn(emb, "embedding", "vec_id", queries, 10)
    val pq = pqDf.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.3, s"pq recall@10 = $recall")
    assert(pq.size === 50)
    // rerank emits the EXACT cosine: every (q, n) pair PQ shares with
    // brute force must carry an identical score
    val exactScores = exactDf
      .select("q_id", "neighbor_id", "cos_sim").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val pqScores = pqDf
      .select("q_id", "neighbor_id", "cos_sim").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    (exact & pq).foreach { key =>
      assert(pqScores(key) === exactScores(key), s"score mismatch at $key")
    }
  }

  test("s7: IVF+PQ achieves reasonable recall, exact scores, determinism") {
    val exactDf = Similarity.bruteKnn(emb, "embedding", "vec_id", queries, 10)
    val exact = exactDf.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfpqDf = Similarity.ivfPqKnn(emb, "embedding", "vec_id", queries, 10)
    val ivfpq = ivfpqDf.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // two pruning layers stack, so the floor sits below s3/s4's
    val recall = (exact & ivfpq).size.toDouble / exact.size
    assert(recall >= 0.2, s"ivfpq recall@10 = $recall")
    assert(ivfpq.size === 50)
    // the rerank emits the EXACT cosine on shared pairs
    val exactScores = exactDf
      .select("q_id", "neighbor_id", "cos_sim").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val ivfpqScores = ivfpqDf
      .select("q_id", "neighbor_id", "cos_sim").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    (exact & ivfpq).foreach { key =>
      assert(ivfpqScores(key) === exactScores(key), s"score mismatch at $key")
    }
    // deterministic across runs (no RNG anywhere in either layer)
    val again = Similarity.ivfPqKnn(emb, "embedding", "vec_id", queries, 10)
      .select("q_id", "rank", "neighbor_id", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val first = ivfpqDf
      .select("q_id", "rank", "neighbor_id", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(again === first)
  }

  test("s13: SQ8 keeps high recall (quantization error only) and exact rerank scores") {
    val exactDf = Similarity.bruteKnn(emb, "embedding", "vec_id", queries, 10)
    val exact = exactDf.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val sqDf = Similarity.sq8Knn(emb, "embedding", "vec_id", queries, 10)
    val sq = sqDf.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & sq).size.toDouble / exact.size
    // 8-bit-per-dim error is tiny — recall should be near-perfect,
    // far above the trained quantizers' floors
    assert(recall >= 0.9, s"sq8 recall@10 = $recall")
    assert(sq.size === 50)
    // rerank emits the EXACT cosine: shared (q, n) pairs score equal
    val exactScores = exactDf.select("q_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    sqDf.select("q_id", "neighbor_id", "cos_sim").as[(Long, Long, Double)]
      .collect().foreach { case (q, n, c) =>
        exactScores.get((q, n)).foreach(e => assert(e === c, s"($q,$n)"))
      }
  }

  test("s4: PQ is deterministic across runs") {
    val a = Similarity.pqKnn(emb, "embedding", "vec_id", queries, 10)
      .select("q_id", "rank", "neighbor_id", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val b = Similarity.pqKnn(emb, "embedding", "vec_id", queries, 10)
      .select("q_id", "rank", "neighbor_id", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(a === b)
  }

  test("s6: corpus kNN join matches the equivalent per-query LSH run and keeps recall") {
    // the salted shuffle self-join must produce exactly the pairs the
    // broadcast lshKnn produces when every item is a query
    val allAsQueries = emb.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val viaLsh = Similarity.lshKnn(emb, "embedding", "vec_id", allAsQueries, 5)
      .select("q_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSet
    val viaJoin = Similarity.knnJoin(emb, "embedding", "vec_id", 5, numPlanes = 4)
      .select("q_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSet
    assert(viaJoin === viaLsh)
    // auto plane sizing returns one row set per item too
    val auto = Similarity.knnJoin(emb, "embedding", "vec_id", 5)
    assert(auto.select("q_id").distinct().count() === emb.count())
  }

  test("s6 (auto config): recall vs exact all-pairs, and candidate symmetry") {
    // exact ground truth: brute-force top-5 per vector (500 vectors →
    // 250k pairs, test-only; the operator under test never does this)
    import graft.functions.cosine
    val l = emb.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val r = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
    val exact = l.crossJoin(r).where(col("q_id") =!= col("n_id"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("q_id"), cosine(col("q_vec"), col("n_vec")).desc, col("n_id"))))
      .where(col("rk") <= 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val auto = Similarity.knnJoin(emb, "embedding", "vec_id", 5)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (auto & exact).size.toDouble / exact.size
    assert(recall >= 0.6, f"auto-config recall@5 = $recall%.3f")
    // symmetry of the candidate generation: the bucket (+ multiprobe)
    // structure is identical on both sides of the self-join, so if a
    // scores against b, b scored against a — any top-5 asymmetry comes
    // only from the heap cut, never from candidate generation. Spot
    // check: every mutual-top-5 exact pair whose BOTH endpoints were
    // recalled individually appears in both directions.
    val mutualExact = exact.filter { case (a, b) => exact((b, a)) }
    val recalled = mutualExact.filter(p => auto(p) || auto(p.swap))
    val bothWays = recalled.count(p => auto(p) && auto(p.swap))
    assert(bothWays >= (recalled.size * 0.8).toInt,
      s"$bothWays of ${recalled.size} recalled mutual pairs appear both ways")
  }

  test("nearestId: exact parity with the relational transform/array_max form") {
    import graft.functions.{cosine, dot, nearestId}
    val cents = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(16)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val packed = cents.agg(
      array_sort(collect_list(struct(col("c_id"), col("c_vec")))).as("cs"))
    val both = emb.select(col("vec_id"), col("embedding").as("v"))
      .crossJoin(broadcast(packed))
      .select(
        col("vec_id"),
        nearestId(col("cs"), col("v"), "cosine").as("fast_cos"),
        array_max(transform(col("cs"), c =>
          struct(cosine(col("v"), c("c_vec")).as("sim"), (-c("c_id")).as("nid"))))("nid").as("slow_ncos"),
        nearestId(col("cs"), col("v"), "l2").as("fast_l2"),
        array_min(transform(col("cs"), c =>
          struct((dot(c("c_vec"), c("c_vec")) - lit(2.0) * dot(col("v"), c("c_vec"))).as("d2"),
            c("c_id").as("c_id"))))("c_id").as("slow_l2"))
    assert(both.where(col("fast_cos") =!= -col("slow_ncos")).count() === 0)
    assert(both.where(col("fast_l2") =!= col("slow_l2")).count() === 0)
  }

  test("kmeans seeding survives an id-sorted-by-cluster corpus") {
    // ids arrive sorted by cluster (the crawl-shard pathology): ids
    // 0..99 are cluster 0, 100..199 cluster 1, ... Lowest-id seeding
    // would draw ALL seeds from cluster 0; the md5-spread seed order
    // must scatter them across clusters, and IVF recall must hold.
    val dim = 64
    val nPerCluster = 100
    val rows = (0L until 400L).map { id =>
      val c = (id / nPerCluster).toInt
      // deterministic "noise": small per-id offsets around an axis-
      // aligned cluster center (unit direction c*16)
      val v = Array.tabulate(dim) { d =>
        val base = if (d == c * 16) 1.0f else 0.0f
        base + 0.05f * (((id * 31 + d * 17) % 7).toFloat - 3.0f) / 3.0f
      }
      (id, v)
    }
    val clustered = rows.toDF("vec_id", "embedding")
    val data = clustered.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
    val seeds = Similarity.kmeansCentroids(data, 8, 0)
      .select("c_id").as[Long].collect()
    val seedClusters = seeds.map(_ / nPerCluster).toSet
    assert(seedClusters.size >= 2, s"seeds all from clusters $seedClusters")
    val qs = clustered.where(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteKnn(clustered, "embedding", "vec_id", qs, 10)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfKnn(clustered, "embedding", "vec_id", qs, 10, nlist = 8)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"clustered-corpus ivf recall@10 = $recall")
  }

  test("s8: purity is 1.0 on a label-aligned clustered corpus, structural on the real one") {
    val dim = 64
    val nPerCluster = 100
    val rows = (0L until 400L).map { id =>
      val c = (id / nPerCluster).toInt
      val v = Array.tabulate(dim) { d =>
        val base = if (d == c * 16) 1.0f else 0.0f
        base + 0.05f * (((id * 31 + d * 17) % 7).toFloat - 3.0f) / 3.0f
      }
      (id, v, c)
    }
    val labeled = rows.toDF("vec_id", "embedding", "label")
    val rep = Similarity.clusterPurity(labeled, "embedding", "vec_id", "label",
        nlist = 8, lloydIters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    // labels ARE the clusters: every cell is pure, and the members add
    // up to the corpus
    assert(rep.map(_._2).sum === 400L)
    rep.foreach { case (cell, n, _, purity) =>
      assert(purity === 1.0, s"cell $cell: purity $purity over $n members")
    }
    // scrambled labels floor the purity — the metric actually measures
    // alignment, it can't report high on noise
    val scrambled = Similarity.clusterPurity(
        labeled.withColumn("label", (col("vec_id") % 10).cast("int")),
        "embedding", "vec_id", "label", nlist = 8, lloydIters = 3)
      .agg(max("purity")).head().getDouble(0)
    assert(scrambled < 0.5, s"scrambled-label purity $scrambled")
    // real corpus: structural invariants + determinism
    val real1 = SparkEntry.queries("s8_cluster_purity")(spark, sf)
      .collect().map(_.toString).toSeq
    val real2 = SparkEntry.queries("s8_cluster_purity")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(real1 === real2)
    assert(real1.nonEmpty)
  }

  test("s15: MMR promotes the diverse candidate over the near-copy (hand-computed fixture)") {
    // id1 is most relevant; id2 is a near-copy of id1 (cos ≈ 0.99995);
    // id3 points elsewhere. Greedy with λ=0.5: pick1 = id1 (top rel);
    // pick2 = id3 (0.5·0.7071 − 0.5·0.6247 ≈ +0.041 beats id2's
    // 0.5·0.9926 − 0.5·0.99995 ≈ −0.004); pick3 = id2. Plain top-3
    // is (1, 2, 3) — MMR demotes the duplicate.
    val corpus = Seq(
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.9f, 0.11f)),
      (3L, Array(0.5f, -0.5f)),
      (4L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val q = Seq((99L, Array(1.0f, 0.0f))).toDF("q_id", "q_vec")
    val got = Similarity.mmrRerank(corpus, "embedding", "vec_id", q,
        k = 3, m = 4, lambda = 0.5)
      .orderBy("mmr_rank")
      .select("neighbor_id").as[Long].collect().toSeq
    assert(got === Seq(1L, 3L, 2L))
    val plain = Similarity.bruteKnn(corpus, "embedding", "vec_id", q, 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(plain === Seq(1L, 2L, 3L))
  }

  test("s15: the redundancy term floors at 0 — an anti-similar selection never pays a bonus") {
    // id2 is ANTI-similar to pick-1 id1 (cos < 0). Without the floor,
    // pick 2's score would be λ·rel − (1−λ)·(negative) > λ·rel — the
    // contract (MmrOps doc, mirrored by the oracle's greatest(0, ...))
    // is that negative similarity counts as NO redundancy, so the
    // score is exactly λ·rel.
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(-0.6f, 0.8f)), // cos(1,2) = -0.6 < 0
      (3L, Array(0.8f, 0.6f))).toDF("vec_id", "embedding")
    val q = Seq((99L, Array(1.0f, 0.0f))).toDF("q_id", "q_vec")
    val got = Similarity.mmrRerank(corpus, "embedding", "vec_id", q,
        k = 3, m = 3, lambda = 0.5)
      .orderBy("mmr_rank")
      .select("neighbor_id", "mmr_score").as[(Long, Double)].collect().toSeq
    // rel(id2) = cos(q, id2) rounded = -0.6; floored score = 0.5·(-0.6)
    val id2 = got.find(_._1 == 2L).get
    assert(id2._2 === 0.5 * -0.6, got.toString)
  }

  test("s15: first pick is the top-1 neighbor; selection is less redundant than plain top-k; invariant to partitioning") {
    val mmr = SparkEntry.queries("s15_mmr_rerank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val plain = SparkEntry.queries("s1_knn_brute")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // rank-1 agrees with exact retrieval per query (λ·rel ordering)
    val mmrFirst = mmr.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
    val plainFirst = plain.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
    assert(mmrFirst === plainFirst)
    // redundancy: mean pairwise cosine within each query's selection
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    def meanPairwise(sel: Map[Long, Seq[Long]]): Double = {
      val sims = for {
        (_, ids) <- sel.toSeq
        a <- ids; b <- ids if a < b
      } yield {
        val (x, y) = (vecs(a), vecs(b))
        val dot = x.zip(y).map { case (p, q2) => p.toDouble * q2 }.sum
        dot / (math.sqrt(x.map(p => p.toDouble * p).sum) *
          math.sqrt(y.map(p => p.toDouble * p).sum))
      }
      sims.sum / sims.size
    }
    val mmrSel = mmr.groupBy(_._1).map { case (q, r) => q -> r.map(_._3).toSeq }
    val plainSel = plain.groupBy(_._1).map { case (q, r) => q -> r.map(_._3).toSeq }
    assert(meanPairwise(mmrSel) <= meanPairwise(plainSel))
    // determinism under a different input partitioning
    val repart = Similarity.mmrRerank(
        emb.repartition(7), "embedding", "vec_id",
        emb.where(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
        k = 10, m = 32, lambda = 0.7)
      .orderBy("q_id", "mmr_rank").collect().map(_.toString).toSeq
    val base = SparkEntry.queries("s15_mmr_rerank")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(repart === base)
  }

  test("s16: drift report reads ~1.0 on aligned slices and flags the drifted label") {
    val dim = 8
    def base(l: Int) = Array.tabulate(dim)(d => if (d == l % dim) 1.0f else 0.0f)
    val rows = for { l <- 0 until 4; i <- 0 until 40 } yield {
      val id = l * 1000 + i
      val noise = Array.tabulate(dim)(d => (((id * 31 + d * 7) % 13) - 6) * 0.01f)
      // slice 1 (odd ids) of label 3 embeds in a different direction —
      // the poisoned-shard / model-change signature
      val drifted = l == 3 && id % 2 == 1
      val v = base(if (drifted) l + 1 else l).zip(noise).map { case (a, b) => a + b }
      (id.toLong, v, l)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val rep = Similarity.embedDrift(df, "embedding", "vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert((0 to 2).forall(l => rep(l.toLong) > 0.95), rep.toString)
    assert(rep(3L) < 0.5, rep.toString)
  }

  test("s17: nprobe sweep — recall monotone in nprobe, exact at full probe, deterministic") {
    val sweep = SparkEntry.queries("s17_nprobe_sweep")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4)))
    assert(sweep.map(_._1).toSeq === Seq(1L, 2L, 4L, 8L))
    // recall never decreases as more cells are probed
    val recalls = sweep.map(_._2).toSeq
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a }, recalls.toString)
    // probing every cell IS brute force: recall exactly 1
    assert(recalls.last === 1.0, recalls.toString)
    assert(sweep.last._3 === 1.0)
    // cost knob reads correctly
    assert(sweep.map(_._3).toSeq === Seq(0.125, 0.25, 0.5, 1.0))
    val run1 = SparkEntry.queries("s17_nprobe_sweep")(spark, sf)
      .collect().map(_.toString).toSeq
    val run2 = SparkEntry.queries("s17_nprobe_sweep")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(run1 === run2)
  }

  test("s17 internals: partial-cover sweep rows match the full-cover sweep's") {
    // nprobes maxing BELOW nlist takes the separate brute-truth branch;
    // maxing AT nlist folds the truth into the fused scoring pass — a
    // sweep point's row depends only on its own nprobe, so the shared
    // rows must be identical across the two cover modes (pins both the
    // rank-prefix property and the folded-truth equivalence)
    val partial = Similarity.nprobeSweep(emb, "embedding", "vec_id", k = 5,
      nprobes = Seq(1, 2), maxQueries = 64).collect().map(_.toString).toSeq
    val full = Similarity.nprobeSweep(emb, "embedding", "vec_id", k = 5,
      nprobes = Seq(1, 2, 4, 8), maxQueries = 64).collect().map(_.toString).toSeq
    assert(full.take(2) === partial)
  }

  test("s1: ranks are dense, per-query, and self-free") {
    val out = Similarity.bruteKnn(emb, "embedding", "vec_id", queries, 10)
    assert(out.count() === 50)
    assert(out.where(col("neighbor_id") === col("q_id")).count() === 0)
    val ranks = out.where(col("q_id") === 0).select("rank").as[Long].collect().sorted
    assert(ranks.toSeq === (1L to 10L))
  }

  // --- s19/s20: binary sign-bit quantization -----------------------------

  /** In-memory reference of the sign packer: 32 bits per word. */
  private def refSig(v: Seq[Float]): Array[Long] =
    Array.tabulate(v.length / 32) { w =>
      (0 until 32).foldLeft(0L)((acc, j) =>
        if (v(w * 32 + j) > 0) acc | (1L << j) else acc)
    }

  private def refHd(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum

  test("s19: brute Hamming kNN matches an in-memory reference exactly (packing, distances, ranks, ties)") {
    val vecs = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val sigs = vecs.map { case (id, v) => id -> refSig(v) }.toMap
    val expect = vecs.filter(_._1 < 5).flatMap { case (qid, _) =>
      vecs.filter(_._1 != qid)
        .map { case (nid, _) => (refHd(sigs(qid), sigs(nid)), nid) }
        .sorted.take(10).zipWithIndex
        .map { case ((hd, nid), i) => (qid, (i + 1).toLong, nid, hd) }
    }.toSet
    val got = Similarity.hammingKnn(emb, "embedding", "vec_id", queries, 10)
      .select("q_id", "rank", "neighbor_id", "hamming")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === expect)
  }

  test("s20: MIH retrieves every neighbor inside the pigeonhole radius at its exact distance; all-band-diff vectors never surface") {
    val base = Array.fill(64)(1.0f)
    def flip(idxs: Seq[Int]): Seq[Float] = {
      val a = base.clone(); idxs.foreach(i => a(i) = -1.0f); a.toSeq
    }
    // 8 bands of 8 bits: any vector within Hamming radius 7 leaves
    // some band untouched, so MIH must always retrieve it (Norouzi
    // et al. 2012's exactness bound); a vector flipped once in EVERY
    // band shares no band and must never become a candidate.
    val corpus = Seq(
      0L   -> base.toSeq,                                  // the query itself (self-excluded)
      100L -> flip(Seq(3)),                                // hd 1
      101L -> flip(Seq(0, 9, 17, 33, 40, 55, 63)),         // hd 7, 7 distinct bands touched
      102L -> flip(0 until 64 by 8),                       // hd 8, one flip in every band
      103L -> flip(Seq(1, 2))                              // hd 2
    ).toDF("vec_id", "embedding")
    val q = Seq(0L -> base.toSeq).toDF("q_id", "q_vec")
    val got = Similarity.mihKnn(corpus, "embedding", "vec_id", q, k = 10)
      .select("neighbor_id", "hamming").as[(Long, Long)].collect().toMap
    assert(got.get(100L) === Some(1L))
    assert(got.get(101L) === Some(7L))
    assert(got.get(103L) === Some(2L))
    assert(!got.contains(102L), "a vector differing in every band must not be a candidate")
    assert(!got.contains(0L), "self-match must be excluded")
  }

  test("s22: radius search ≡ brute force inside the pigeonhole bound; out-of-bound radius refused") {
    // corpus-derived probes: every 7th vector, first 5 dims negated —
    // the banded radius result must equal an exhaustive signature
    // scan EXACTLY (the operator's completeness guarantee), on the
    // real corpus, under any partitioning
    val probes = emb.where(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 1000000L).as("q_id"),
        transform(col("embedding"), (x, i) => when(i < 5, -x).otherwise(x)).as("q_vec"))
    val got = Similarity.mihRadius(emb, "embedding", "vec_id", probes, maxHamming = 7)
      .select("q_id", "neighbor_id", "hamming").as[(Long, Long, Long)].collect().toSet
    // brute force over reference signatures
    val sigs = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> refSig(v) }
    val qsigs = probes.select("q_id", "q_vec").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> refSig(v) }
    val brute = (for {
      (qid, qs) <- qsigs; (nid, ns) <- sigs
      hd = refHd(qs, ns) if hd <= 7 && nid != qid
    } yield (qid, nid, hd)).toSet
    assert(got === brute)
    // every probe retrieves its source vector (hd = sign flips among
    // the 5 negated dims ≤ 5 < nBands — pigeonhole-guaranteed)
    val srcPairs = got.map(t => (t._1, t._2))
    qsigs.foreach { case (qid, _) =>
      assert(srcPairs.contains((qid, qid - 1000000L)), s"probe $qid lost its source")
    }
    // same under a different input partitioning
    val again = Similarity.mihRadius(
      emb.repartition(7), "embedding", "vec_id", probes, maxHamming = 7)
      .select("q_id", "neighbor_id", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(again === got)
    // the exactness bound is enforced, not documented-only
    val e = intercept[IllegalArgumentException](
      Similarity.mihRadius(emb, "embedding", "vec_id", probes, maxHamming = 8))
    assert(e.getMessage.contains("nBands-1"), e.getMessage)
  }

  test("s20: real-corpus candidates carry exact distances, share a band with the query, and survive repartitioning") {
    val vecs = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val sigs = vecs.map { case (id, v) => id -> refSig(v) }.toMap
    def bands(s: Array[Long]): Set[(Int, Long)] =
      (0 until 8).map(b => b -> ((s((b * 8) / 32) >> ((b * 8) % 32)) & 255L)).toSet
    val mih = Similarity.mihKnn(emb, "embedding", "vec_id", queries, 10)
      .select("q_id", "neighbor_id", "hamming").as[(Long, Long, Long)].collect()
    assert(mih.nonEmpty)
    mih.foreach { case (qid, nid, hd) =>
      assert(refHd(sigs(qid), sigs(nid)) === hd, s"distance for ($qid,$nid)")
      assert((bands(sigs(qid)) & bands(sigs(nid))).nonEmpty, s"($qid,$nid) shares no band")
    }
    // band pruning really prunes: candidates are a small corpus fraction
    assert(mih.length < vecs.length, "MIH returned more pairs than a full scan would")
    // deterministic under any input partitioning
    val again = Similarity.mihKnn(emb.repartition(7), "embedding", "vec_id", queries, 10)
      .select("q_id", "neighbor_id", "hamming").as[(Long, Long, Long)].collect()
    assert(again.toSet === mih.toSet)
  }

  test("s20: persisted MIH band index round-trips and serves bit-identical results; old releases stay pinned") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mih_idx").toString
    val fresh = Similarity.mihIndexBuild(emb, "embedding", "vec_id")
    assert(Similarity.mihIndexSave(fresh, dir) === 1)
    def run(ix: org.apache.spark.sql.DataFrame) =
      Similarity.mihKnnWith(ix, queries, k = 10)
        .collect().map(_.toString).sorted.toSeq
    val servedFresh = run(fresh)
    assert(run(Similarity.mihIndexLoad(spark, dir)) === servedFresh)
    // ≡ the one-shot composition (integer pipeline: exact, not just close)
    assert(Similarity.mihKnn(emb, "embedding", "vec_id", queries, 10)
      .collect().map(_.toString).sorted.toSeq === servedFresh)
    // re-index = a new atomic snapshot; version 1 stays replayable
    assert(Similarity.mihIndexSave(
      Similarity.mihIndexBuild(emb.where(col("vec_id") % 2 === 0), "embedding", "vec_id"),
      dir) === 2)
    assert(run(Similarity.mihIndexLoad(spark, dir, Some(1))) === servedFresh)
    assert(Similarity.mihIndexLoad(spark, dir).select("n_id").distinct().count()
      === emb.count() / 2)
    // the persisted layout guards serving: a load at a different
    // packing layout (stale index vs re-tuned bandBits/dim) refuses
    // loudly instead of matching nothing
    val e = intercept[IllegalArgumentException](
      Similarity.mihIndexLoad(spark, dir, bandBits = 4))
    assert(e.getMessage.contains("packed at dim=64/bandBits=8"), e.getMessage)
    // layout is versioned WITH the bands: after a re-save at a new
    // packing, a pinned load of an old release verifies against that
    // release's OWN layout — the old layout still loads (no false
    // reject) and the new layout is refused for it (no silent serve)
    assert(Similarity.mihIndexSave(
      Similarity.mihIndexBuild(emb, "embedding", "vec_id", bandBits = 16),
      dir, bandBits = 16) === 3)
    assert(run(Similarity.mihIndexLoad(spark, dir, Some(1))) === servedFresh)
    val e2 = intercept[IllegalArgumentException](
      Similarity.mihIndexLoad(spark, dir, Some(1), bandBits = 16))
    assert(e2.getMessage.contains("packed at dim=64/bandBits=8"), e2.getMessage)
    assert(Similarity.mihIndexLoad(spark, dir, bandBits = 16)
      .columns.toSet === Set("n_id", "n_sig", "band", "bv"))
  }

  test("s20: unverifiable MIH index layouts refuse to serve (empty snapshot, pre-layout format)") {
    // zero-row snapshot: the single-row probe finds no layout to check —
    // that is "layout unverifiable", not "layout fine"
    val emptyDir = java.nio.file.Files.createTempDirectory("graft_mih_empty").toString
    assert(Similarity.mihIndexSave(
      Similarity.mihIndexBuild(emb.where(col("vec_id") < 0), "embedding", "vec_id"),
      emptyDir) === 1)
    val e = intercept[IllegalArgumentException](
      Similarity.mihIndexLoad(spark, emptyDir))
    assert(e.getMessage.contains("layout unverifiable"), e.getMessage)
    // legacy snapshot without dim/band_bits columns: targeted re-save
    // error, not an opaque unresolved-column failure downstream
    val legacyDir = java.nio.file.Files.createTempDirectory("graft_mih_legacy").toString
    val legacy = Similarity.mihIndexBuild(emb, "embedding", "vec_id")
    legacy.write.mode("errorifexists").parquet(s"$legacyDir/bands")
    graft.sources.ParquetLake.snapshotManifest(spark, s"$legacyDir/bands")
    val e2 = intercept[IllegalArgumentException](
      Similarity.mihIndexLoad(spark, legacyDir))
    assert(e2.getMessage.contains("pre-layout"), e2.getMessage)
  }

  test("lk47: MIH-gated embedding ingest — exact radius gate (collide-but-far admits), intra min-id keeper, idempotent replay") {
    import graft.sources.ParquetLake
    val dataPath = java.nio.file.Files.createTempDirectory("graft_eg_data").toString + "/lake"
    val indexPath = java.nio.file.Files.createTempDirectory("graft_eg_idx").toString + "/index"
    val base = Array.fill(64)(1.0f)
    def flip(idxs: Seq[Int]): Seq[Float] = {
      val a = base.clone(); idxs.foreach(i => a(i) = -1.0f); a.toSeq
    }
    val neg = base.map(-_).toSeq
    val corpus = Seq(1L -> base.toSeq, 2L -> neg).toDF("vec_id", "embedding")
    corpus.write.parquet(dataPath)
    ParquetLake.snapshotManifest(spark, dataPath)
    assert(Similarity.embedIndexInit(spark, indexPath, corpus, "embedding", "vec_id") === 1)
    // alternating pattern: Hamming 32 from both corpus vectors (far)
    val w = (0 until 64).map(i => if (i % 2 == 0) 1.0f else -1.0f)
    val w1 = { val a = w.toArray.clone(); a(3) = -a(3); a.toSeq } // hd 1 from w
    val inc = Seq(
      10L -> base.toSeq,                           // hd 0 from corpus 1 → corpus-near
      11L -> flip(Seq(0, 9, 17, 33, 40, 55, 63)),  // hd 7 → corpus-near (pigeonhole radius)
      12L -> flip(0 until 8),                      // hd 8, all flips in band 0: COLLIDES on
                                                   //   bands 1–7 but the exact cut admits it
      13L -> w,                                    // far from corpus; intra keeper (min id)
      14L -> w1                                    // hd 1 from 13 → intra loser
    ).toDF("vec_id", "embedding")
    val r = Similarity.embedGatedIngest(
      spark, dataPath, indexPath, inc, "embedding", "vec_id", maxHamming = 7)
    // 11 is BOTH corpus-near (hd 7 from corpus 1) and intra-near (hd 7
    // edge to 10): corpus-near takes priority, counts stay disjoint
    assert(r.admitted === 2, r.toString)
    assert(r.rejectedCorpusNear === 2, r.toString)
    assert(r.rejectedIntraNear === 1, r.toString)
    assert(r.dataVersion === 2 && r.indexVersion === 2, r.toString)
    val lake = ParquetLake.readManifested(spark, dataPath)
    assert(lake.select("vec_id").as[Long].collect().toSet === Set(1L, 2L, 12L, 13L))
    // the index carries exactly the lake's band rows (8 per vector)
    assert(ParquetLake.readManifested(spark, indexPath).count() === 4 * 8)
    // replay of the full batch: admitted rows are now Hamming-0 to
    // their indexed selves — nothing lands, no versions move
    val r2 = Similarity.embedGatedIngest(
      spark, dataPath, indexPath, inc, "embedding", "vec_id", maxHamming = 7)
    assert(r2.admitted === 0 && r2.dataVersion === 0 && r2.indexVersion === 0, r2.toString)
    assert(ParquetLake.readManifested(spark, dataPath).count() === 4)
    // radius wider than the pigeonhole bound is refused loudly
    intercept[IllegalArgumentException] {
      Similarity.embedGatedIngest(
        spark, dataPath, indexPath, inc, "embedding", "vec_id", maxHamming = 8)
    }
  }

  test("s21: bandBits sweep — nested band frontiers are monotone, every config reports, pigeonhole recall is 1 inside the radius") {
    import org.apache.spark.sql.functions.col
    // real corpus: wider bands can only shrink the candidate set (a
    // 2b-bit band match implies both nested b-bit matches), so mass
    // and recall are monotone non-increasing in bandBits — and every
    // config must emit its row even when its candidate set is empty
    val sweep = Similarity.mihBandSweep(emb, "embedding", "vec_id", queries, 10)
      .orderBy("band_bits")
      .select("band_bits", "n_bands", "exact_radius", "n_candidates", "recall_at_k")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(sweep.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((4L, 16L, 15L), (8L, 8L, 7L), (16L, 4L, 3L)))
    assert(sweep(0)._4 >= sweep(1)._4 && sweep(1)._4 >= sweep(2)._4, sweep.mkString(","))
    assert(sweep(0)._5 >= sweep(1)._5 && sweep(1)._5 >= sweep(2)._5, sweep.mkString(","))

    // pigeonhole at the TIGHTEST config: a 3-flip neighbor is within
    // radius 3 = nBands-1 even at bandBits=16, so every config must
    // score recall 1.0 on a corpus where it is the only truth row
    val base = Array.fill(64)(1.0f)
    val flip3 = { val a = base.clone(); Seq(0, 21, 47).foreach(i => a(i) = -1f); a }
    val planted = Seq((0L, base.toSeq), (1L, flip3.toSeq))
      .toDF("vec_id", "embedding")
    val q1 = planted.where(col("vec_id") === 0L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val r = Similarity.mihBandSweep(planted, "embedding", "vec_id", q1, 10)
      .select("band_bits", "recall_at_k").as[(Long, Double)].collect().toMap
    assert(r === Map(4L -> 1.0, 8L -> 1.0, 16L -> 1.0), r.toString)
  }

  test("sign-bit kernel guards: dim/type mismatches fail loudly instead of diverging silently") {
    import org.apache.spark.sql.functions.{array, lit, typedLit}
    def rootMessages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")

    // word-count mismatch: signatures packed at different dims must
    // throw, never understate the distance over the common prefix
    val mixed = spark.range(1).select(
      graft.functions.hamming(
        array(lit(1L)), array(lit(1L), lit(2L))).as("hd"))
    val e1 = intercept[Throwable](mixed.collect())
    assert(rootMessages(e1).contains("word counts differ"), rootMessages(e1))

    // declared dim vs runtime length: the packer asserts when told to
    val short = spark.range(1).select(
      typedLit(Seq.fill(32)(1.0f)).as("v"))
    val e2 = intercept[Throwable](
      short.select(graft.functions.signpack(col("v"), 32, expectDim = 64)).collect())
    assert(rootMessages(e2).contains("vector length 32 != declared dim 64"), rootMessages(e2))

    // analysis-time input typing (Catalyst checkInputDataTypes): a
    // non-float packer child / non-bigint signature is rejected before
    // execution ever sees it
    val ints = spark.range(1).select(array(lit(1), lit(2)).as("iv"))
    val e3 = intercept[org.apache.spark.sql.AnalysisException](
      ints.select(graft.functions.signpack(col("iv"), 32)).collect())
    assert(e3.getMessage.contains("graft_signpack"), e3.getMessage)
    val e4 = intercept[org.apache.spark.sql.AnalysisException](
      ints.select(graft.functions.hamming(col("iv"), col("iv"))).collect())
    assert(e4.getMessage.contains("graft_hamming"), e4.getMessage)
  }
}
