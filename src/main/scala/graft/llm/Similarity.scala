package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embeddings (SURVEY §2.11 X3/X4).
  *
  * Numeric discipline: embeddings are float32 at rest; every vector is
  * widened to array<double> BEFORE any arithmetic (float→double widening
  * is exact), and dot/norm accumulate left-to-right via the higher-order
  * `aggregate` — the same order the oracle's `list_reduce` uses — so
  * cosine values are bit-identical across engines.
  *
  * Scale shapes:
  *   - brute-force top-k broadcasts the (small) QUERY set and scans the
  *     corpus once — a broadcast nested-loop by construction, linear in
  *     corpus size, never corpus×corpus;
  *   - near-dup pair generation is sign-bucket LSH (equi-join on an 8-bit
  *     hyperplane-sign bucket);
  *   - the IVF-style path probes one coarse partition (equi-join on the
  *     cluster key) instead of the whole corpus.
  */
object Similarity {

  /** float[] → double[] exactly */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** left-to-right dot product of two double arrays */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** exact top-k neighbors for a bounded query set (`vec_id < nQueries`):
    * broadcast the queries, score the corpus in one scan, rank per query.
    * Self-matches excluded; ties broken on vec_id.
    */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosine(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** [[bruteForceTopK]] driven by the native codegen'd
    * [[graft.functions.CosineSim]] expression instead of the higher-order
    * composition — bit-identical results (same accumulation order), one
    * fused loop inside whole-stage codegen.
    */
  def bruteForceTopKNative(embeddings: DataFrame, nQueries: Int,
      k: Int): DataFrame = {
    graft.functions.CosineSim.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        expr("cosine_sim(qv, v)").as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** 8-bit sign bucket: the sign pattern of the first 8 dimensions — a
    * degenerate-but-deterministic random-hyperplane LSH (axis-aligned
    * hyperplanes), shared by construction between engines.
    */
  def signBucket(v: Column): Column =
    concat((1 to 8).map(i =>
      when(element_at(v, i) >= 0.0, "1").otherwise("0")): _*)

  /** near-duplicate vector pairs: same sign bucket AND cosine above the
    * threshold. Pair generation is the bucket equi-join.
    */
  def lshNearDup(embeddings: DataFrame, minCos: Double): DataFrame = {
    val e = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", signBucket(col("v")))
    val l = e.select(col("bucket"), col("vec_id").as("vec_a"),
      col("v").as("va"))
    val r = e.select(col("bucket").as("bucket_r"), col("vec_id").as("vec_b"),
      col("v").as("vb"))
    l.join(r, col("bucket") === col("bucket_r") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("bucket"),
        cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") > minCos)
  }

  /** IVF with a real coarse quantizer: `centroidIds` picks the centroid
    * vectors (the deterministic stand-in for a k-means "train" step);
    * every vector is assigned to its nearest centroid (broadcast of the
    * tiny centroid set, one scan), and a query probes ONLY its own
    * cell — candidate work drops from N to ~N/cells per query. nprobe>1
    * is the same join on a top-n assignment set.
    */
  def ivfCentroidTopK(embeddings: DataFrame, centroidIds: Seq[Long],
      nQueries: Int, k: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val cents = e.filter(col("vec_id").isin(centroidIds: _*))
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    // assignment = argmax cosine over the centroid set (ties → lowest cid)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid").asc)
    val assigned = e.join(broadcast(cents))
      .withColumn("ccos", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cid").as("cell"))
    val q = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("cell").as("q_cell"))
    val scored = assigned.join(broadcast(q),
        col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosine(col("qv"), col("v")).as("cos"))
    val wk = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(wk)).filter(col("rank") <= k)
  }

  /** IVF-style probed top-k: the coarse quantizer here is the `label`
    * column (cluster id); each query scores ONLY its own cluster's
    * vectors (1-probe). Equi-join on the cluster key — the sub-linear
    * scale path vs [[bruteForceTopK]].
    */
  def ivfTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("label"),
      asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("qv"))
    val scored = e.join(broadcast(q),
        col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosine(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
