package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{VectorFunctions, VectorAggFunctions}

/** IVF (inverted-file) approximate nearest neighbor.
  *
  * Build: deterministic seed centroids → `iters` Lloyd rounds
  * (assign each vector to its nearest centroid by cosine, recompute
  * centroids as the mean via the `vec_sum_d` aggregate) → inverted
  * lists keyed by centroid id. Probe: route each query to its
  * `nprobe` nearest centroids (broadcast — there are only k), scan
  * just those lists brute-force, take top-k.
  *
  * Scale: the corpus is scanned once per Lloyd round and once for
  * final assignment, all narrow + one groupBy(cid) each; the probe
  * joins queries×lists on `cid`, so scored pairs ≈ |Q|·(n/k)·nprobe
  * instead of |Q|·n. Centroid count k is the recall/speed dial.
  */
object Ivf {
  /** Owning handle for the built index: callers release the persisted
    * lists/centroids when done probing (leaked caches tax every later
    * query in the session). */
  final case class Index(centroids: DataFrame, lists: DataFrame) {
    def release(): Unit = {
      lists.unpersist(blocking = false)
      // centroids are localCheckpoint-materialized (see build):
      // unpersist() is a no-op on a checkpointed frame, release the
      // underlying RDD blocks instead
      graft.Caching.release(centroids)
    }
  }

  private def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)(implicit s: SparkSession) = {
    VectorFunctions.register(s)
    call_function("cosine_sim", a, b)
  }

  /** Assign each vector to its nearest centroid (ties → smallest
    * cid). `max_by` over (cos, -cid) instead of a window: partial
    * aggregation combines map-side, so the shuffle carries one row
    * per vector per map task — the window formulation shuffled AND
    * sorted all corpus×k scored rows. centroids: (cid,
    * centroid: array<float>). */
  private def assign(corpus: DataFrame, centroids: DataFrame, idCol: String, vecCol: String)(
      implicit s: SparkSession): DataFrame = {
    corpus.crossJoin(broadcast(centroids))
      .withColumn("__c", cos(col(vecCol), col("centroid")))
      .groupBy(col(idCol))
      .agg(
        max_by(col("cid"), struct(col("__c"), (-col("cid")).as("__nc"))).as("cid"),
        first(col(vecCol)).as(vecCol))
      .select(col(idCol), col("cid"), col(vecCol))
  }

  def build(corpus: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int = 2)(
      implicit s: SparkSession): Index = {
    VectorAggFunctions.register(s)
    // deterministic seeds: the k smallest ids
    var centroids = corpus.orderBy(col(idCol)).limit(k)
      .select(row_number().over(Window.orderBy(col(idCol))).as("cid"), col(vecCol).as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assign(corpus, centroids, idCol, vecCol)
      centroids = assigned
        .groupBy("cid")
        .agg(call_function("vec_sum_d", col(vecCol)).as("__s"), count(lit(1)).as("__n"))
        .select(col("cid"),
          transform(col("__s"), x => (x / col("__n")).cast("float")).as("centroid"))
    }
    // materialize the k centroid rows once: every downstream consumer
    // broadcasts them (final assign, radii, query routing), and each
    // broadcast would otherwise re-execute the whole nested Lloyd
    // chain — for iters rounds that's the dominant cost of the build
    val mat = centroids.localCheckpoint(true)
    val lists = assign(corpus, mat, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Index(mat, lists)
  }

  /** EXACT top-k probe: IVF with a triangle-inequality completeness
    * bound (the ball-pruning of FLANN/FAISS exact modes, in angular
    * space). Phase 1 scans the `nprobe` closest lists and takes the
    * provisional k-th best cosine c_k; phase 2 additionally scans
    * every list that could still beat it — list j qualifies iff
    * cos(max(angle(q, c_j) − r_j, 0)) >= c_k − ε, where r_j is the
    * list's angular radius (max member angle to its centroid):
    * by the spherical triangle inequality no member of a
    * non-qualifying list can enter the top-k. The union is re-ranked
    * for the final answer.
    *
    * The output therefore EQUALS brute force at any data distribution
    * — on tightly clustered corpora (the 100 TB case) phase 2 prunes
    * almost every list and the scan cost stays ≈ |Q|·(n/k)·nprobe; on
    * noise-dominated data it degrades gracefully toward a full scan
    * rather than silently losing recall. ε = 1e-9 absorbs float error
    * on the bound side only (may scan one list too many, never one
    * too few beyond genuine sub-ε ties). */
  def probeExact(index: Index, queries: DataFrame, idCol: String, vecCol: String,
                 nprobe: Int, topK: Int)(implicit s: SparkSession): DataFrame = {
    val eps = 1e-9
    val clamp = (c: org.apache.spark.sql.Column) => greatest(lit(-1.0), least(lit(1.0), c))
    // angular radius per list (skips empty lists by construction)
    val radii = index.lists
      .join(broadcast(index.centroids), "cid")
      .groupBy("cid")
      .agg(max(acos(clamp(cos(col(vecCol), col("centroid"))))).as("__r"))
    val cents = index.centroids.join(radii, "cid")

    // per (query, list): closeness rank and best-achievable cosine
    val wq = Window.partitionBy("query_id").orderBy(col("__qc").desc, col("cid"))
    val routes = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .crossJoin(broadcast(cents))
      .withColumn("__qc", cos(col("__qv"), col("centroid")))
      .withColumn("__rank", row_number().over(wq))
      .withColumn("__best",
        org.apache.spark.sql.functions.cos(greatest(acos(clamp(col("__qc"))) - col("__r"), lit(0.0))))
      .select(col("query_id"), col("__qv"), col("cid"), col("__rank"), col("__best"))

    // phase 1: provisional k-th best cosine from the nprobe lists
    val w = Window.partitionBy("query_id").orderBy(col("cosine_raw").desc, col("neighbor_id"))
    def scan(routed: DataFrame): DataFrame =
      routed.join(index.lists.withColumnRenamed(idCol, "neighbor_id"), "cid")
        .where(col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine_raw", cos(col("__qv"), col(vecCol)))
        .withColumn("rank", row_number().over(w))
    val ck = scan(routes.where(col("__rank") <= nprobe))
      .where(col("rank") === topK)
      .select(col("query_id"), col("cosine_raw").as("__ck"))

    // phase 2: nprobe lists ∪ lists whose bound still beats c_k
    // (queries with < topK provisional hits scan everything)
    val selected = routes.join(broadcast(ck), Seq("query_id"), "left")
      .where(col("__rank") <= nprobe || col("__ck").isNull ||
        col("__best") >= col("__ck") - eps)
      .select("query_id", "__qv", "cid")
    scan(selected)
      .where(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine_raw"), 4).as("cosine"))
  }

  /** Top-k neighbors per query, scanning only `nprobe` lists. */
  def probe(index: Index, queries: DataFrame, idCol: String, vecCol: String,
            nprobe: Int, topK: Int)(implicit s: SparkSession): DataFrame = {
    val wq = Window.partitionBy("query_id").orderBy(col("__c").desc, col("cid"))
    val routed = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .crossJoin(broadcast(index.centroids))
      .withColumn("__c", cos(col("__qv"), col("centroid")))
      .withColumn("__r", row_number().over(wq))
      .where(col("__r") <= nprobe)
      .select(col("query_id"), col("__qv"), col("cid"))

    val w = Window.partitionBy("query_id").orderBy(col("cosine_raw").desc, col("neighbor_id"))
    routed.join(index.lists.withColumnRenamed(idCol, "neighbor_id"), "cid")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_raw", cos(col("__qv"), col(vecCol)))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cosine_raw"), 4).as("cosine"))
  }
}
