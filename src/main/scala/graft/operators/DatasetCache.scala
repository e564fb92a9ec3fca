package graft.operators

import java.util.concurrent.ConcurrentHashMap

/** Per-dataset-dir memoization of scratch-materialized intermediates
  * (shingle hot-lists, Jaccard pair relations, LSH signatures, global
  * ranks): build once per dataset dir, serve the parquet path for the
  * JVM lifetime.
  *
  * ASSUMPTION — dataset dirs are immutable while memoized. The cache key
  * is the directory PATH; if a driver regenerates the data at that path
  * in-process, memoized entries silently serve results computed from the
  * OLD bytes. Batch runs satisfy this trivially (one dataset per run); a
  * long-lived driver that rewrites a dataset dir must call
  * [[DatasetCache.invalidate]] (or key its datasets by content-versioned
  * paths, the production norm: immutable snapshot dirs, never in-place
  * rewrites). Invalidation also releases the entry's scratch dirs, so a
  * looping driver's disk stays bounded.
  *
  * @param releasePaths scratch paths owned by a cached value, released on
  *   invalidation (values that memoize more than a path, e.g. (path,
  *   rowCount), expose just their paths here).
  */
final class DatasetCache[V](val name: String, releasePaths: V => Seq[String]) {
  // the map holds lazy CELLS, not values: the multi-job Spark build runs
  // under the cell's own monitor, never inside computeIfAbsent's bin
  // lock — so a minutes-long build for one dataset dir neither blocks
  // unrelated keys that hash to the same bin nor trips
  // ConcurrentHashMap's recursive-update detection if a build consults
  // another entry. A build that THROWS leaves the cell unfilled and is
  // retried on the next access (transient Spark failures don't poison
  // the memo).
  private final class Cell(build: () => V) {
    @volatile private var filled: Option[V] = None
    def value: V = filled.getOrElse(this.synchronized {
      filled.getOrElse { val v = build(); filled = Some(v); v }
    })
    def peek: Option[V] = filled
  }

  private val entries = new ConcurrentHashMap[String, Cell]()
  DatasetCache.register(this)

  /** Number of memoized (completed) dataset dirs — unfilled cells from
    * in-flight or failed builds hold no scratch and don't count
    * (observability — see [[DatasetCache.stats]]). */
  def size: Int = {
    import scala.jdk.CollectionConverters._
    entries.values().asScala.count(_.peek.isDefined)
  }

  override def toString: String = s"DatasetCache($name, ${entries.size()} entries)"

  /** Memoized value for `dir`, building (and typically scratch-
    * materializing) on first use. `build` runs at most once per dir
    * (concurrent same-dir callers wait for the one build). */
  def getOrCompute(dir: String)(build: String => V): V =
    entries.computeIfAbsent(dir, d => new Cell(() => build(d))).value

  /** Drop `dir`'s entry and release its scratch dirs (no-op if absent;
    * a cell whose build FAILED holds no scratch to release). If a build
    * is IN FLIGHT, block on the cell's monitor until it completes, then
    * release what it produced — removing the cell without waiting would
    * leave the freshly-built scratch dirs untracked (leaked until JVM
    * exit) and let a concurrent getOrCompute double-build the dir. */
  def invalidate(dir: String): Unit =
    Option(entries.remove(dir)).foreach { cell =>
      cell.synchronized {
        cell.peek.foreach(v => releasePaths(v).foreach(Scratch.release))
      }
    }

  /** Drop every entry (test isolation / full refresh). */
  def invalidateAll(): Unit = {
    import scala.jdk.CollectionConverters._
    entries.keySet().asScala.toSeq.foreach(invalidate)
  }
}

object DatasetCache {
  private val registry =
    ConcurrentHashMap.newKeySet[DatasetCache[_]]()
  private def register(c: DatasetCache[_]): Unit = registry.add(c)

  /** The driver-facing invalidation hook: drop every memoized relation
    * derived from `dir` across all caches and release their scratch
    * storage. Call after regenerating a dataset path in-process. */
  def invalidate(dir: String): Unit = registry.forEach(_.invalidate(dir))

  /** Per-cache entry counts by name — the long-lived driver's view of
    * what is memoized (each entry pins its scratch dirs until
    * invalidated, so this is also a disk-held-by-memo inventory). */
  def stats: Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    // groupBy, not toMap: two caches constructed with the same name must
    // aggregate, not silently drop one
    registry.asScala.toSeq.groupBy(_.name)
      .map { case (n, cs) => n -> cs.map(_.size).sum }
  }
}
