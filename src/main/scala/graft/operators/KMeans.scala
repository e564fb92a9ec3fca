package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SquaredDistanceExpr

/** Distributed Lloyd's k-means over quantized (long) vectors — the
  * clustering stage of SemDeDup-style semantic dedup and of
  * embedding-space corpus bucketing.
  *
  * Scale shape (the reason this survives 100 TB):
  *   - The corpus NEVER shuffles for assignment: centroids live on the
  *     driver as k×dims longs and re-enter each round as array literals,
  *     so the k-way argmin is a map-side projection inside whole-stage
  *     codegen ([[graft.functions.SquaredDistanceExpr]] has doGenCode).
  *   - The update step is a posexplode → partial-aggregated groupBy on
  *     (cluster, dim): each task pre-reduces to ≤ k×dims rows before the
  *     exchange, so the shuffle is O(partitions × k × dims) regardless of
  *     corpus size.
  *   - Driver state is O(k × dims) per round (the centroid matrix) —
  *     the same bounded-driver-state discipline as [[GlobalOrder]].
  *
  * Determinism / oracle parity: initial centroids are the k lowest-id
  * vectors; all distances are integer squared-L2 (summation-order-proof);
  * centroid components are floor(sum / n) where the division is done in
  * double (both engines produce the identical IEEE quotient) and floored
  * to a long; empty clusters keep their previous centroid; argmin ties
  * break to the lowest cluster id. Every step is reproducible bit-for-bit
  * in ANSI SQL, which is what lets an ITERATIVE operator be
  * DuckDB-oracled under the strict hash compare (SURVEY §7.4).
  */
object KMeans {

  /** Run `iters` full Lloyd rounds (assign + recenter) and return the
    * final assignment: input columns plus `cluster` (long, 0..k-1) and
    * `dist2` (long squared L2 to the winning centroid).
    *
    * @param vecs   input relation; `vecCol` must be array<long>
    * @param idCol  total-order id used for the deterministic k-lowest init
    */
  def lloyd(vecs: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): DataFrame = {
    require(!vecs.columns.contains("dist2") && !vecs.columns.contains("cluster"),
      "KMeans.lloyd adds output columns 'dist2' and 'cluster'; the input " +
        s"relation already has ${vecs.columns.filter(Set("dist2", "cluster")).mkString(", ")} " +
        "— rename or drop it first")
    assign(vecs, vecCol, trainCentroids(vecs, idCol, vecCol, k, iters))
  }

  /** The training loop alone: `iters` Lloyd rounds, returning the final
    * k×dims centroid matrix (driver-held — O(k×dims) longs). Callers
    * that need the codebook itself (e.g. [[Pq]] product quantization)
    * use this; [[lloyd]] is trainCentroids + one final assignment. */
  def trainCentroids(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Array[Array[Long]] = {
    val initRows = vecs
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
    require(initRows.forall(!_.isNullAt(0)),
      s"KMeans.lloyd: '$vecCol' contains null vectors (seen among the k-lowest-$idCol init rows)")
    var cents: Array[Array[Long]] = initRows.map(_.getSeq[Long](0).toArray)
    require(cents.length == k, s"need at least k=$k vectors, got ${cents.length}")
    val dims = cents.head.length
    require(cents.forall(_.length == dims),
      s"KMeans.lloyd: '$vecCol' vectors must have uniform length; init rows " +
        s"have lengths ${cents.map(_.length).distinct.mkString(", ")}")
    var it = 0
    while (it < iters) {
      val updated = assign(vecs, vecCol, cents)
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("dim", "v")))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .select(col("cluster"), col("dim"),
          floor(col("s").cast("double") / col("n")).cast("long").as("c"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("dc"))
        .select(col("cluster"), transform(col("dc"), x => x.getField("c")).as("cent"))
        .collect()
        .map(r => r.getLong(0).toInt -> r.getSeq[Long](1).toArray)
        .toMap
      cents = Array.tabulate(k)(cid => updated.getOrElse(cid, cents(cid)))
      it += 1
    }
    cents
  }

  // internal names for the per-row validated vector and the winning
  // (dist2, cluster) struct — never visible in the output schema, and
  // unique enough not to collide with caller columns
  private val VecChk = "__graft_kmeans_vec"
  private val BestCol = "__graft_kmeans_best"

  /** Map-side argmin over the k centroid literals: min over an array of
    * (dist, cid) structs — struct ordering is lexicographic, so the min
    * is the lowest distance with ties broken to the lowest cluster id.
    *
    * Each centroid distance is computed ONCE per row: the struct array
    * and its `array_min` live in their own projection under an internal
    * name, and the final projection only extracts the two fields.
    * CollapseProject keeps that split (a non-trivial alias consumed more
    * than once is not inlined), so the plan carries exactly k
    * `SquaredDistanceExpr`s per row — not the 2k of the previous
    * `array_min(darr)` + `array_position(darr, …)` shape, where the whole
    * distance array was inlined into both consumers. Assignment dominates
    * k-means cost at scale, so this halves the hot loop.
    *
    * Input hardening: a null vector or a row whose vector length differs
    * from the centroids' fails fast with a clear per-row error
    * (`raise_error`, codegen'd) instead of surfacing as a null-key group
    * and an opaque NPE in the recenter collect. */
  private def assign(vecs: DataFrame, vecCol: String, cents: Array[Array[Long]]): DataFrame = {
    val dims = cents.head.length
    val vec = col(vecCol)
    val checked = when(vec.isNotNull && size(vec) === dims, vec)
      .otherwise(raise_error(concat(
        lit(s"KMeans: '$vecCol' must be a non-null array<long> of length $dims, got "),
        when(vec.isNull, lit("null")).otherwise(
          concat(lit("length "), size(vec).cast("string"))))))
    val dcand = array(cents.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      struct(
        SquaredDistanceExpr(col(VecChk), typedlit(c.toSeq)).as("d"),
        lit(i.toLong).as("i"))
    }: _*)
    val outCols = vecs.columns.map(col).toIndexedSeq :+
      col(BestCol).getField("d").as("dist2") :+
      col(BestCol).getField("i").as("cluster")
    vecs
      .withColumn(VecChk, checked)
      .withColumn(BestCol, array_min(dcand))
      .select(outCols: _*)
  }
}
