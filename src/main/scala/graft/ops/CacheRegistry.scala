package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry for every persisted frame the operator library
  * creates, so caches are a bounded, releasable resource instead of an
  * unbounded executor-memory leak in long-lived sessions.
  *
  * Memoization (`cached`) is a legitimate cross-query win — q41/q42/q43
  * share one shingle explosion, repeat invocations of q41/q65 reuse their
  * band/code frames — but `persist()` without a release hook pins executor
  * memory (and the keying map pins SparkSession references) forever.
  * [[clear]] unpersists and drops everything for a session; `Verify` and
  * `Bench` call it after their last action, and callers embedding the
  * library do the same at end-of-life.
  */
object CacheRegistry {

  private val cached =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Memoize-and-persist: builds (and persists) at most one frame per
    * (session, key); later calls reuse the cached plan and its storage. */
  def cache(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cached.getOrElseUpdate((s, key), build.persist())

  private val ctr = new java.util.concurrent.atomic.AtomicLong()

  /** Register an already-persisted frame for release-on-clear (no
    * memoization — each call gets a unique key), e.g. the converged label
    * frame of an iterative algorithm. */
  def track(s: SparkSession, name: String, df: DataFrame): DataFrame = {
    cached.put((s, s"$name#${ctr.incrementAndGet()}"), df)
    df
  }

  /** Unpersist and forget every frame registered for this session. */
  def clear(s: SparkSession): Unit =
    cached.keys.filter(_._1 eq s).foreach { k =>
      cached.remove(k).foreach(_.unpersist(blocking = false))
    }

  /** Number of live cached frames for a session (test/diagnostic hook). */
  def size(s: SparkSession): Int = cached.keys.count(_._1 eq s)
}
