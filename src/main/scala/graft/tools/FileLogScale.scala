package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

import graft.sources.VehicleCsvFileLog

/** Dev-only receipt for the streaming file log's bounded compaction
  * (r17 verdict ask #3): simulates an eternal stream admitting `files`
  * files (10 per discovery round, committed as processed, age cutoff
  * trailing `retain` rounds behind) and measures per-compact write
  * volume in BOTH regimes — retention on (the default `maxFileAge`
  * path) vs off. The claim under test: with retention, per-compact
  * entries/bytes PLATEAU at the age window, so lifetime write cost is
  * O(files · window); without, every compact rewrites the whole
  * history — O(files²) lifetime, the r17 behavior this receipt
  * buries.
  *
  * Usage: runMain graft.tools.FileLogScale [files] [retainRounds]
  * Prints one JSON line:
  *   {"metric":"filelog_scale","files":N,"compacts":C,
  *    "bounded":{"maxCompactBytes":…,"totalWrittenBytes":…,"wallSec":…},
  *    "unbounded":{…}}
  */
object FileLogScale {
  def main(args: Array[String]): Unit = {
    val files = args.lift(0).map(_.toInt).getOrElse(10000)
    val retain = args.lift(1).map(_.toInt).getOrElse(100) // rounds ≈ ×10 files
    val conf = new Configuration()

    def drive(expire: Boolean): (Long, Long, Int, Double) = {
      val dir = new HPath(java.nio.file.Files
        .createTempDirectory(s"graft-flscale-$expire").toString)
      val fs = dir.getFileSystem(conf)
      val log = new VehicleCsvFileLog(dir, conf)
      var maxCompact = 0L
      var totalWritten = 0L
      var compacts = 0
      var lastCompactName = ""
      val t0 = System.nanoTime()
      val rounds = files / 10
      for (r <- 0 until rounds) {
        val batch = (0 until 10).map(j =>
          f"/data/part-$r%06d-$j.csv.gz" -> r.toLong)
        log.recordWatermark(r.toLong)
        log.append(batch)
        log.trimCommitted(log.size) // processed as admitted (steady stream)
        if (expire) {
          log.expireBelow(r.toLong - retain)
          log.compactIfExpired() // the stream's commit-time flow
        }
        // track compact turnover: a new .compact name means one landed
        val compact = fs.listStatus(dir).filter(_.isFile)
          .find(_.getPath.getName.endsWith(".compact"))
        compact.foreach { st =>
          if (st.getPath.getName != lastCompactName) {
            lastCompactName = st.getPath.getName
            compacts += 1
            maxCompact = math.max(maxCompact, st.getLen)
            totalWritten += st.getLen
          }
        }
      }
      val wall = (System.nanoTime() - t0) / 1e9
      // sanity: the log still answers its contract
      require(log.size == files.toLong, s"lost entries: ${log.size}")
      (maxCompact, totalWritten, compacts, wall)
    }

    val (bMax, bTot, bC, bW) = drive(expire = true)
    val (uMax, uTot, uC, uW) = drive(expire = false)
    println(f"""{"metric":"filelog_scale","files":$files,"compacts":$bC,""" +
      f""""bounded":{"maxCompactBytes":$bMax,"totalWrittenBytes":$bTot,"wallSec":$bW%.2f},""" +
      f""""unbounded":{"maxCompactBytes":$uMax,"totalWrittenBytes":$uTot,"compacts":$uC,"wallSec":$uW%.2f}}""")
  }
}
