package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.CosineSimilarityExpr

/** Dev-only evidence harness for the r10 trained-IVF change: prints the
  * cell-occupancy balance (max n_c, mean n_c, max/mean) of the OLD
  * untrained seed-cell assignment (first-k-by-id centroids, max-cosine
  * assign — the r9 q130/q34d scheme) vs the NEW trained k-means cells
  * ([[graft.operators.KMeans]], 2 Lloyd rounds), on the same embeddings
  * dir. Σ n_c² is the within-cell pairwise cost the IVF block pays, so
  * the ratio of the two Σ n_c² columns is the measured speedup/risk
  * factor of training the quantizer.
  *
  * Usage: runMain graft.tools.CellBalance <embeddingsDir> [k]
  *        (k defaults to q130's greatest(16, ceil(sqrt(n/8))))
  */
object CellBalance {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CellBalance <sfDir> [k]")
    val dir = args(0)
    val spark = graft.SparkEnv.local("cell-balance")
    try {
      val e = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val n = e.count()
      val k = if (args.length > 1) args(1).toInt
        else math.max(16L, math.ceil(math.sqrt(n / 8.0)).toLong).toInt

      def stats(assign: org.apache.spark.sql.DataFrame, label: String): String = {
        val occ = assign.groupBy(col("cell")).agg(count(lit(1)).as("nc"))
        val r = occ.agg(max(col("nc")).as("mx"),
            avg(col("nc")).as("mean"),
            sum(col("nc") * col("nc")).as("sumsq"),
            count(lit(1)).as("cells"))
          .collect()(0)
        f""""$label":{"cells":${r.getLong(3)},"max":${r.getLong(0)},""" +
          f""""mean":${r.getDouble(1)}%.1f,"imbalance":${r.getLong(0) / r.getDouble(1)}%.2f,""" +
          f""""sum_nc2":${r.getLong(2)}}"""
      }

      // OLD scheme: first-k-by-id seed centroids, max-cosine assignment
      val wa = Window.partitionBy(col("vec_id"))
        .orderBy(col("csim").desc, col("centroid_id"))
      val untrained = e.crossJoin(broadcast(
          e.filter(col("vec_id") < k)
            .select(col("vec_id").as("centroid_id"),
              col("embedding").as("cemb"))))
        .select(col("vec_id"), col("centroid_id"),
          round(CosineSimilarityExpr(col("embedding"), col("cemb")), 4)
            .as("csim"))
        .withColumn("arn", row_number().over(wa))
        .filter(col("arn") === 1)
        .select(col("vec_id"), col("centroid_id").as("cell"))

      // NEW scheme: trained k-means cells (q130's exact path)
      val vq = e.select(col("vec_id"),
        transform(col("embedding"),
          v => round(v.cast("double") * 10000, 0).cast("long")).as("vq"))
      val trained = graft.operators.KMeans
        .lloyd(vq, "vec_id", "vq", k, iters = 2)
        .select(col("vec_id"), col("cluster").as("cell"))

      println(s"""{"metric":"cell_balance","dir":"$dir","n":$n,"k":$k,""" +
        s"${stats(untrained, "untrained")},${stats(trained, "trained")}}")
    } finally spark.stop()
  }
}
