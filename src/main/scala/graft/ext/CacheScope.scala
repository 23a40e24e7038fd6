package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Deterministic lifetime for the frames ext operators persist.
  *
  * The pair-producing operators ([[Dedup.minhashLsh]],
  * [[Dedup.ngramJaccard]], [[Similarity.cosineNearDupLsh]],
  * [[Contamination.overlaps]], …) persist internal frames at
  * MEMORY_AND_DISK — load-bearing barriers (each blocks a measured
  * 4–40× re-evaluation of the scan+kernel lineage) that the returned
  * DataFrame still reads lazily, so the operator cannot unpersist
  * before returning. Without a scope those blocks live until
  * `spark.catalog.clearCache()` or session end.
  *
  * [[CacheScope.withCacheScope]] gives library callers the handle the
  * bare contract lacked: every frame an ext operator persists while the
  * scope is active is registered with it, and `close()` (automatic at
  * the end of the block) unpersists them all, blocking until the
  * executors have dropped the blocks.
  *
  * {{{
  * val pairs = CacheScope.withCacheScope { _ =>
  *   val p = Dedup.minhashLsh(docs)
  *   p.count()          // materialize INSIDE the scope
  *   p.collect()
  * }                    // all operator-persisted blocks freed here
  * }}}
  *
  * Materialize (count/collect/write) inside the scope: after close the
  * returned plan still computes correctly, but the barriers are gone
  * and a fresh action re-runs the full lineage.
  *
  * Scopes are per-thread (registration uses a thread-local, matching
  * driver-side plan construction) and nest: the innermost active scope
  * owns new frames.
  */
final class CacheScope private[ext] () {
  private val buf = scala.collection.mutable.ArrayBuffer[DataFrame]()

  private[ext] def track(df: DataFrame): DataFrame = synchronized {
    buf += df
    df
  }

  /** Frames persisted under this scope so far (test/inspection hook). */
  def registered: Seq[DataFrame] = synchronized(buf.toSeq)

  /** Unpersist every registered frame, blocking until blocks are freed.
    * Idempotent. */
  def close(): Unit = synchronized {
    buf.foreach(_.unpersist(blocking = true))
    buf.clear()
  }
}

object CacheScope {

  private val active = new ThreadLocal[List[CacheScope]] {
    override def initialValue(): List[CacheScope] = Nil
  }

  /** Run `body` with a fresh innermost scope; all frames ext operators
    * persist inside it are freed when the block exits (also on throw). */
  def withCacheScope[A](body: CacheScope => A): A = {
    val scope = new CacheScope
    active.set(scope :: active.get())
    try body(scope)
    finally {
      active.set(active.get().filterNot(_ eq scope))
      scope.close()
    }
  }

  /** The single persist point for ext operators (and the query layer's
    * composition barriers): MEMORY_AND_DISK, and registration with the
    * innermost active scope when one exists — outside any scope the
    * behavior is the documented session-lifetime contract, unchanged. */
  private[graft] def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    active.get().headOption.foreach(_.track(p))
    p
  }
}
