package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SquaredDistanceExpr

/** Product quantization (PQ) — the compression half of large-scale ANN
  * (IVF gives the sub-linear probe set, PQ shrinks each vector to `m`
  * code bytes so a 100 TB float corpus fits a few TB of codes and
  * distance evaluation becomes `m` table lookups instead of `dims`
  * multiplies).
  *
  * Pipeline: [[train]] learns one codebook per subspace (the vector
  * split into `m` contiguous sub-vectors; each codebook is [[KMeans]]
  * Lloyd over that slice — bit-reproducible integer math, so the whole
  * PQ pipeline inherits k-means' determinism and stays
  * DuckDB-oracle-able). [[encode]] assigns every sub-vector its nearest
  * centroid id — a map-side codegen'd argmin over k driver-held centroid
  * literals per subspace, the corpus never shuffles. [[adc]] scores an
  * encoded corpus against a probe vector with asymmetric distance
  * computation: the m×k table of probe-subvector→centroid distances is
  * computed once driver-side and baked in as literals, so the per-row
  * cost is m array lookups + a sum, map-side, followed by a distributed
  * top-k (TakeOrderedAndProject).
  *
  * Scale posture: training touches the corpus 2×iters+1 times per
  * subspace but each recenter shuffles only O(partitions × k × sub)
  * partial sums (KMeans' shape); encode and adc are shuffle-free;
  * driver state is O(m × k × sub) longs. Codes are `long` here for
  * oracle parity — a production writer would cast to byte (k ≤ 256).
  */
object Pq {

  /** `books(j)(c)` = centroid `c` of subspace `j` (each of length
    * `dims / m`). */
  final case class Codebooks(dims: Int, m: Int, k: Int,
      books: Vector[Vector[Vector[Long]]]) {
    def sub: Int = dims / m
  }

  /** Learn the m codebooks: subspace j is Lloyd k-means over
    * `vecCol[j*sub+1 .. (j+1)*sub]` with the k-lowest-`idCol` init —
    * semantically m independent [[KMeans]] runs, but executed as ONE
    * combined job per iteration: the scan computes every subspace's
    * argmin code, explodes (subspace, code, dim, v), and a single
    * aggregation produces all m×k×sub recenter sums (the shuffle carries
    * O(partitions × m × k × sub) partial rows — 4 KB here — instead of
    * m separate scan+shuffle rounds). Init is one more scan (the
    * k-lowest-id vectors, sliced driver-side). iters+1 jobs total, not
    * m×(iters+1); identical bit-for-bit to the per-subspace formulation,
    * which is what the q104 oracle (m independent Lloyd CTE chains)
    * verifies. */
  def train(vecs: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, k: Int, iters: Int): Codebooks = {
    require(m >= 1 && dims % m == 0, s"dims=$dims not divisible by m=$m")
    val sub = dims / m
    val initRows = vecs.orderBy(col(idCol)).limit(k).select(col(vecCol)).collect()
    require(initRows.length == k, s"need at least k=$k vectors, got ${initRows.length}")
    require(initRows.forall(r => !r.isNullAt(0) && r.getSeq[Long](0).length == dims),
      s"Pq.train: '$vecCol' must be non-null array<long> of length $dims " +
        "(violated among the k-lowest init rows)")
    var books: Vector[Vector[Vector[Long]]] = Vector.tabulate(m) { j =>
      initRows.map(_.getSeq[Long](0).slice(j * sub, (j + 1) * sub).toVector).toVector
    }
    for (_ <- 1 to iters) {
      val cb = Codebooks(dims, m, k, books)
      val perSub = (0 until m).map { j =>
        struct(lit(j).as("j"), col(s"code_$j").as("code"),
          slice(col(vecCol), j * sub + 1, sub).as("sv"))
      }
      val sums = encode(vecs, vecCol, cb)
        .select(explode(array(perSub: _*)).as("s"))
        .select(col("s.j").as("j"), col("s.code").as("code"),
          posexplode(col("s.sv")).as(Seq("dim", "v")))
        .groupBy(col("j"), col("code"), col("dim"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1).toInt, r.getInt(2)) ->
          (r.getLong(3), r.getLong(4))).toMap
      books = Vector.tabulate(m) { j =>
        Vector.tabulate(k) { c =>
          if (!sums.contains((j, c, 0))) books(j)(c) // empty cluster: keep
          else Vector.tabulate(sub) { dIdx =>
            val (s, n) = sums((j, c, dIdx))
            // EXACTLY KMeans' floor(CAST(s AS DOUBLE)/n) recenter — the
            // IEEE quotient both engines produce, floored
            math.floor(s.toDouble / n).toLong
          }
        }
      }
    }
    Codebooks(dims, m, k, books)
  }

  // internal single-eval slots for each sub-vector slice and its
  // per-centroid distance array (the KMeans single-evaluation
  // discipline: bind once, consume twice)
  private def subCol(j: Int) = s"__graft_pq_sub_$j"
  private def distCol(j: Int) = s"__graft_pq_dist_$j"

  /** Input + `code_0..code_{m-1}` (long, 0..k-1): per-subspace nearest
    * centroid, ties to the lowest id. Map-side only.
    *
    * The codebook enters as ONE array<array<long>> literal per subspace
    * and the k distances come from a `transform` HOF — a codegen'd LOOP
    * over the literal, constant code size in k. The previous shape (k
    * separate `SquaredDistanceExpr(slice, typedlit)` struct candidates
    * per subspace) inlined m×k distance expressions into one projection;
    * at m=8, k=64 the generated processNext() blew past Janino's method
    * limit and the whole encode stage fell back to interpreted — the
    * one codegen failure in the registry (r9 verify logs). Argmin =
    * array_position of the array_min (first match ⇒ lowest centroid id
    * on ties — the same tiebreak as the struct-min form, which the q104
    * per-chain oracles verify bit-for-bit). */
  def encode(vecs: DataFrame, vecCol: String, cb: Codebooks): DataFrame = {
    val codeCols = (0 until cb.m).map(j => s"code_$j")
    require(!vecs.columns.exists(codeCols.contains),
      s"Pq.encode adds ${codeCols.mkString(",")}; input already has one")
    var out = vecs
    for (j <- 0 until cb.m) {
      val bookLit = typedlit(cb.books(j).map(_.toSeq))
      out = out
        .withColumn(subCol(j), slice(col(vecCol), j * cb.sub + 1, cb.sub))
        .withColumn(distCol(j),
          transform(bookLit, c => SquaredDistanceExpr(col(subCol(j)), c)))
        .withColumn(s"code_$j",
          (array_position(col(distCol(j)), array_min(col(distCol(j)))) - 1)
            .cast("long"))
        .drop(subCol(j), distCol(j))
    }
    out
  }

  /** Asymmetric-distance score of every encoded row against `probe`
    * (full-dims quantized vector): Σ_j table_j[code_j], the m×k lookup
    * tables computed here on the driver. Returns a Column usable on
    * [[encode]]'s output. */
  def adc(cb: Codebooks, probe: Array[Long]): Column = {
    require(probe.length == cb.dims,
      s"probe has ${probe.length} dims, codebooks expect ${cb.dims}")
    val terms = (0 until cb.m).map { j =>
      val p = probe.slice(j * cb.sub, (j + 1) * cb.sub)
      val table: Seq[Long] = cb.books(j).map { c =>
        var s = 0L; var i = 0
        while (i < cb.sub) { val d = p(i) - c(i); s += d * d; i += 1 }
        s
      }
      // element_at is 1-based; codes are 0-based
      element_at(typedlit(table), col(s"code_$j").cast("int") + 1)
    }
    terms.reduce(_ + _)
  }
}
