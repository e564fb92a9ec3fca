package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{GlobalOrder, Scratch, SuffixArray}

/** Dev-only scale evidence for [[graft.operators.SuffixArray]] — the r9
  * verdict's "only operator with zero measured scale evidence". Builds
  * the suffix array over the FULL documents table of a dir (not q121's
  * 8-doc oracle head): the flat token stream's contiguous global
  * positions come from a [[GlobalOrder]] range-partitioned rank over
  * (doc_id, p) — the corpus-scale offsets path the q121 Scaladoc
  * promises — then runs the prefix-doubling rounds, recording each
  * round's wall clock and distinct-group count through the onRound hook.
  *
  * Prints one JSON line:
  *   {"metric":"sa_scale","dir":…,"n":tokens,"rounds":R,"build_wall":S,
  *    "rounds_detail":[{"prefix":p,"groups":g,"sec":s},…]}
  *
  * Usage: runMain graft.tools.SaScale [dir] [seedWidth] — defaults to
  * sf0.1, seedWidth 1 (the production ladder; pass 8 to reproduce the
  * r14 measured-and-rejected fused-opener experiment —
  * [[SuffixArray.ExperimentalSeedWidth]]).
  */
object SaScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val seedW = if (args.length > 1) args(1).toInt else 1
    val spark = graft.SparkEnv.local("sa-scale")
    try {
      val toksRaw = Tables.documents(spark, dir)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("p", "tok")))
      val (flatRankPath, nTok) = GlobalOrder.rowNumberPath(
        toksRaw, "rn", col("doc_id"), col("p"))
      val flat = spark.read.parquet(flatRankPath)
        .select((col("rn") - 1).as("pos"), col("tok"))
      val flatPath = Scratch.materializePath(flat, "sa-scale-toks")
      Scratch.release(flatRankPath)

      val rounds = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
      val t0 = System.nanoTime()
      val h = SuffixArray.hierarchy(
        spark.read.parquet(flatPath),
        (prefix, groups, sec) => rounds += ((prefix, groups, sec)),
        seedWidth = seedW)
      val n = h.n
      val wall = (System.nanoTime() - t0) / 1e9
      require(n == nTok, s"token count drifted: rank=$nTok sa=$n")

      // the LCP descent (q123/q148/q159's core op) from the hierarchy just
      // built — descent-only wall, no rebuild (lcpFromLevels, r11)
      // optional third arg picks the LCP implementation to measure:
      // default | bracket | composite (the r16 A/B candidates)
      val lcpImpl = if (args.length > 2) args(2) else "default"
      val t1 = System.nanoTime()
      val phases = scala.collection.mutable.ArrayBuffer[(String, Double)]()
      val hook = (nm: String, s: Double) => { phases += ((nm, s)); () }
      val lcpP = lcpImpl match {
        case "default" => SuffixArray.lcpFromLevels(spark, h)
        case "bracket" =>
          SuffixArray.lcpFromLevelsBracket(spark, h, onPhase = hook)
        case "composite" =>
          SuffixArray.lcpFromLevelsComposite(spark, h, onPhase = hook)
        case bad => throw new IllegalArgumentException(
          s"lcpImpl must be default|bracket|composite, got '$bad'")
      }
      val lcpWall = (System.nanoTime() - t1) / 1e9
      val lcpRows = spark.read.parquet(lcpP).count()
      Scratch.release(lcpP)
      h.release()
      Scratch.release(flatPath)

      val detail = rounds.map { case (p, g, s) =>
        f"""{"prefix":$p,"groups":$g,"sec":$s%.2f}"""
      }.mkString("[", ",", "]")
      val phaseJson = phases.map { case (nm, s) =>
        f""""$nm":$s%.2f""" }.mkString("{", ",", "}")
      println(f"""{"metric":"sa_scale","dir":"$dir","n":$n,""" +
        f""""rounds":${rounds.size},"build_wall":$wall%.2f,""" +
        f""""lcp_impl":"$lcpImpl","lcp_descent_wall":$lcpWall%.2f,""" +
        f""""lcp_phases":$phaseJson,"lcp_rows":$lcpRows,""" +
        s""""rounds_detail":$detail}""")
    } finally spark.stop()
  }
}
