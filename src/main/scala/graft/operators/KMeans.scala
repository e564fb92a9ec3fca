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
    var cents: Array[Array[Long]] = vecs
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Long](0).toArray)
    require(cents.length == k, s"need at least k=$k vectors, got ${cents.length}")
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
    assign(vecs, vecCol, cents)
  }

  /** Map-side argmin over the k centroid literals: first index of the
    * minimum distance (ties → lowest cluster id). */
  private def assign(vecs: DataFrame, vecCol: String, cents: Array[Array[Long]]): DataFrame = {
    val darr = array(cents.toIndexedSeq.map(c =>
      SquaredDistanceExpr(col(vecCol), typedlit(c.toSeq))): _*)
    vecs
      .withColumn("dist2", array_min(darr))
      .withColumn("cluster", array_position(darr, col("dist2")) - 1)
  }
}
