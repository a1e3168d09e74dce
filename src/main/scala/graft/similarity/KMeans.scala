package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an `array<float>` embedding column — the coarse
  * quantizer for IVF similarity search when no cluster labels ship with
  * the data. UDF-free and fully deterministic:
  *
  *  - seeds are the k vectors with the smallest `xxhash64(id)` — a
  *    deterministic pseudo-random sample, no RNG state;
  *  - assignment scores every (item, centroid) pair with the codegen'd
  *    quantized dot product and picks the cell with `min_by`, ties broken
  *    by cell id. Centroids are broadcast (k rows), so assignment is a
  *    narrow map over the corpus — no shuffle of the items;
  *  - update recomputes each cell's mean by positional explode +
  *    avg per (cell, dim) — one shuffle keyed by (cell, dim), k*dim groups.
  *
  * Scale: per iteration the corpus is read once, shuffled only as
  * (cell, dim, component) triples. Squared L2 distance uses the
  * |a|^2 + |b|^2 - 2ab identity so the same quantized dot kernel serves
  * both distance and similarity.
  */
object KMeans {

  /** Assign every item to its nearest centroid.
    * `centroids`: (cell, cv: array<float>); output (idCol, cell).
    */
  def assign(items: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val scored = items.select(col(idCol), col(vecCol).as("_v"))
      .join(broadcast(centroids.select(col("cell"), col("cv"))))
      .select(
        col(idCol), col("cell"),
        // squared L2 in quantized space: |v|^2 + |c|^2 - 2 v.c
        (Ann.quantizedDot(col("_v"), col("_v"))
          + Ann.quantizedDot(col("cv"), col("cv"))
          - lit(2L) * Ann.quantizedDot(col("_v"), col("cv"))).as("_d2"))
    scored.groupBy(col(idCol))
      .agg(min_by(col("cell"), struct(col("_d2"), col("cell"))).as("cell"))
  }

  /** Centroid of each cell: positional explode -> mean per (cell, dim) ->
    * repack in dim order. Output (cell, cv: array<float>).
    */
  def recompute(items: DataFrame, assignments: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    items.select(col(idCol), col(vecCol).as("_v"))
      .join(assignments, Seq(idCol))
      .select(col("cell"), posexplode(col("_v")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(avg(col("x")).as("cx"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("dim"), col("cx")))).as("pairs"))
      .select(col("cell"),
        transform(col("pairs"), p => p.getField("cx").cast("float")).as("cv"))

  /** Deterministic farthest-first seeding (Gonzalez'85, the greedy
    * k-center heuristic k-means++ approximates): seed 1 is the vector
    * with the smallest xxhash64(id); each next seed maximizes the
    * quantized distance to its nearest chosen seed, ties broken by id.
    * Unlike plain hash sampling this never places two seeds in one dense
    * cluster, so Lloyd's iteration starts near the real partition.
    *
    * Costs one corpus pass per seed — fine for a coarse quantizer
    * (k in the tens-to-hundreds); for k in the thousands use k-means||
    * style oversampling instead.
    */
  def farthestFirstSeeds(items: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    import items.sparkSession.implicits._
    val it = items.select(col(idCol), col(vecCol).as("_v"))
      .withColumn("_vq", Ann.quantizedDot(col("_v"), col("_v")))
      .localCheckpoint()
    def distTo(seed: Seq[Float]) = {
      val sc = typedlit(seed)
      col("_vq") + Ann.quantizedDot(sc, sc) - lit(2L) * Ann.quantizedDot(col("_v"), sc)
    }
    val first = it.orderBy(xxhash64(col(idCol)), col(idCol)).limit(1)
      .select(col("_v")).head().getAs[scala.collection.Seq[Float]](0).toSeq
    var seeds = Vector(first)
    while (seeds.size < k) {
      val dists = seeds.map(distTo)
      val nearest = if (dists.size == 1) dists.head else least(dists: _*)
      val next = it
        .select(col(idCol), col("_v"), nearest.as("_d"))
        .orderBy(col("_d").desc, col(idCol))
        .limit(1)
        .select(col("_v")).head().getAs[scala.collection.Seq[Float]](0).toSeq
      seeds = seeds :+ next
    }
    seeds.zipWithIndex.map { case (v, i) => (i, v) }.toDF("cell", "cv")
      .select(col("cell"), col("cv").cast("array<float>").as("cv"))
  }

  /** Fit k cells with `maxIterations` Lloyd rounds from farthest-first
    * seeds; returns the final (cell, cv) centroids. Centroids are tiny
    * (k rows) — each round's frame is collected into a broadcast on the
    * next assignment.
    *
    * A cell that loses every member in a round keeps its previous
    * centroid instead of vanishing — `fit` always returns exactly k
    * cells with dense ids, so `ivfTopK(nprobe)` probes the codebook size
    * it asked for.
    */
  def fit(items: DataFrame, idCol: String, vecCol: String,
      k: Int, maxIterations: Int = 10,
      checkpoint: graft.core.CheckpointPolicy = graft.core.CheckpointPolicy.Local): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val it = items.select(col(idCol), col(vecCol))
    var centroids = checkpoint.pin(farthestFirstSeeds(it, idCol, vecCol, k))
    var i = 0
    while (i < maxIterations) {
      val assignments = assign(it, centroids, idCol, vecCol)
      val fresh = recompute(it, assignments, idCol, vecCol)
      centroids = checkpoint.pin(
        centroids.select(col("cell"), col("cv").as("_prev"))
          .join(fresh, Seq("cell"), "left")
          .select(col("cell"), coalesce(col("cv"), col("_prev")).as("cv")))
      i += 1
    }
    centroids
  }

  /** Fit + assign: (idCol, cell) cluster labels for every item. */
  def fitPredict(items: DataFrame, idCol: String, vecCol: String,
      k: Int, maxIterations: Int = 10,
      checkpoint: graft.core.CheckpointPolicy = graft.core.CheckpointPolicy.Local): DataFrame =
    assign(items, fit(items, idCol, vecCol, k, maxIterations, checkpoint), idCol, vecCol)
}
