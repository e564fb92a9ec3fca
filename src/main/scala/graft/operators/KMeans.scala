package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
      // collect the ≤ k×dims (cluster, dim, c) rows and assemble the
      // centroid arrays on the driver (the lloydPartitioned discipline):
      // the previous collect_list/array_sort re-aggregation added a
      // second exchange + stage per iteration to build arrays the driver
      // immediately unpacked anyway. Bounded driver state either way;
      // the per-component floor(double-quotient) stays in SQL so the
      // value is the engine's own IEEE quotient, bit-identical to before.
      val updated = assign(vecs, vecCol, cents)
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("dim", "v")))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .select(col("cluster"), col("dim"),
          floor(col("s").cast("double") / col("n")).cast("long").as("c"))
        .collect()
        .map(r => (r.getLong(0).toInt, r.getInt(1)) -> r.getLong(2))
        .toMap
      cents = Array.tabulate(k)(cid =>
        if (!updated.contains((cid, 0))) cents(cid)
        else Array.tabulate(dims)(dIdx => updated((cid, dIdx))))
      it += 1
    }
    cents
  }

  /** PARTITIONED Lloyd — one independent k-means per value of `partCol`
    * (0..parts-1), executed as ONE combined job per step (the Pq.train
    * discipline: m semantically-independent trainings must not cost m
    * scan+collect rounds). Bit-identical to running [[lloyd]] on each
    * partition's rows separately (same k-lowest-id init, same integer
    * recenter, same lowest-id tiebreak — KMeansSpec proves equality):
    *
    *   - init: per-partition k-lowest-id rows via one partitioned
    *     row_number window, collected once (≤ parts×k×dims longs);
    *     partitions with fewer than k rows train with every row as its
    *     own centroid (k_c = min(k, n_c)).
    *   - assign: the per-partition codebook enters as one nested
    *     array literal, indexed by partCol — `element_at` picks the
    *     row's own codebook and a `transform` HOF computes its k_c
    *     distances in a codegen'd loop (constant code size — the Pq
    *     encode lesson); argmin = array_position of the array_min
    *     (first match ⇒ lowest cluster id on ties).
    *   - recenter: ONE groupBy (part, cluster, dim) aggregation updates
    *     every partition's centroids; empty clusters keep their
    *     previous centroid.
    *
    * Output: input columns + `cluster` (long, 0..k_c-1 WITHIN the row's
    * partition). Driver state: parts × k × dims longs. */
  def lloydPartitioned(vecs: DataFrame, partCol: String, idCol: String,
      vecCol: String, parts: Int, k: Int, iters: Int): DataFrame =
    lloydPartitionedWithBooks(vecs, partCol, idCol, vecCol, parts, k, iters)._1

  /** [[lloydPartitioned]] plus the trained per-partition codebooks —
    * callers that LAND the quantizer for serving/append (the q149/q154
    * index lifecycle) need the centroids, not just the assignment. */
  def lloydPartitionedWithBooks(vecs: DataFrame, partCol: String, idCol: String,
      vecCol: String, parts: Int, k: Int, iters: Int)
      : (DataFrame, Vector[Vector[Array[Long]]]) = {
    require(!vecs.columns.contains("cluster"),
      "lloydPartitioned adds output column 'cluster' — drop it first")
    val w = Window.partitionBy(col(partCol)).orderBy(col(idCol))
    val initRows = vecs
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      // cast: the contract is "integer partition id", not LongType
      // specifically — getLong on an IntegerType column would throw
      .select(col(partCol).cast("long"), col("__rk"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getInt(1), r.getSeq[Long](2).toArray))
    var books: Vector[Vector[Array[Long]]] = Vector.tabulate(parts) { p =>
      initRows.filter(_._1 == p).sortBy(_._2).map(_._3).toVector
    }
    // an EMPTY partition value is legal — no row carries it (the coarse
    // k-means upstream may legitimately empty a cell; KMeans.lloyd
    // itself permits empty clusters), so its empty codebook is simply
    // never referenced by assignExpr; callers that route NEW data (the
    // q154 append) must check book emptiness themselves
    require(books.exists(_.nonEmpty),
      s"lloydPartitioned: no $partCol value in 0..${parts - 1} has any row")
    val dims = books.find(_.nonEmpty).get.head.length

    def assignExpr(bs: Vector[Vector[Array[Long]]]): DataFrame = {
      val bigLit = typedlit(bs.map(_.map(_.toSeq).toSeq))
      val vchk = when(col(vecCol).isNotNull && size(col(vecCol)) === dims,
        col(vecCol)).otherwise(raise_error(
          lit(s"lloydPartitioned: '$vecCol' must be non-null array<long> of length $dims")))
      // partCol range-checked map-side with the same raise_error pattern as
      // the vector check: element_at past the literal array would silently
      // yield cluster = null (>= parts) or an opaque "array index starts at
      // 1" error (negative) — contract violations must fail fast instead
      val pchk = when(col(partCol).cast("long").between(0, parts - 1),
        col(partCol).cast("int")).otherwise(raise_error(
          lit(s"lloydPartitioned: '$partCol' must be a non-null integer in 0..${parts - 1}"))
          .cast("int"))
      vecs
        .withColumn(VecChk, vchk)
        .withColumn(DistCol, transform(
          element_at(bigLit, pchk + 1),
          c => SquaredDistanceExpr(col(VecChk), c)))
        .withColumn("cluster",
          (array_position(col(DistCol), array_min(col(DistCol))) - 1)
            .cast("long"))
        .drop(VecChk, DistCol)
    }

    var it = 0
    while (it < iters) {
      val updated = assignExpr(books)
        .select(col(partCol).cast("long").as("__p"), col("cluster"),
          posexplode(col(vecCol)).as(Seq("dim", "v")))
        .groupBy(col("__p"), col("cluster"), col("dim"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .select(col("__p"), col("cluster"), col("dim"),
          floor(col("s").cast("double") / col("n")).cast("long").as("c"))
        .collect()
        .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getInt(2)) -> r.getLong(3))
        .toMap
      books = Vector.tabulate(parts) { p =>
        Vector.tabulate(books(p).length) { cid =>
          if (!updated.contains((p, cid, 0))) books(p)(cid)
          else Array.tabulate(dims)(dIdx => updated((p, cid, dIdx)))
        }
      }
      it += 1
    }
    (assignExpr(books), books)
  }

  /** The map-side argmin assignment against a given centroid matrix —
    * public for callers that serve from LANDED centroids (the q154
    * index-append path: new vectors join an already-trained quantizer
    * without retraining; [[lloyd]] is trainCentroids + this). */
  def assignWith(vecs: DataFrame, vecCol: String,
      cents: Array[Array[Long]]): DataFrame =
    assign(vecs, vecCol, cents)

  // internal names for the per-row validated vector, its per-centroid
  // distance array, and the winning (dist2, cluster) struct — never
  // visible in the output schema, and unique enough not to collide with
  // caller columns
  private val VecChk = "__graft_kmeans_vec"
  private val BestCol = "__graft_kmeans_best"
  private val DistCol = "__graft_kmeans_dist"

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
