package graft.pipeline

import scala.collection.concurrent.TrieMap
import scala.reflect.ClassTag

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** One [[Broadcast]] per (SparkContext, model identity) — the
  * model-carrying kernel expressions (BPE merges, unigram costs,
  * langid grids) get their broadcast here instead of creating a fresh
  * one per call (r17 ADVICE):
  *
  *  - a long-running firehose that reloads its config, or a caller
  *    chaining encode + encodeTokens over one model, re-uses the
  *    existing broadcast instead of leaving orphans to GC + the
  *    ContextCleaner;
  *  - two independently built but identical queries share the SAME
  *    `Broadcast` instance, so their broadcast-typed case-class expr
  *    params compare equal and cached-plan / canonicalization reuse
  *    works again (broadcasts compare by reference).
  *
  * Keys carry the model CONTENT (immutable collections, structural
  * equality), so a retrained model gets its own broadcast while a
  * re-read of the same artifact shares. Bounded: past [[MaxEntries]]
  * per context the oldest entry is unpersisted (safe for running
  * plans — executors lazily re-fetch on next use) and dropped. */
private[graft] object Broadcasts {

  private val MaxEntries = 64
  private val cache = TrieMap[(String, Any), Broadcast[_]]()
  private val order =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Any)]()

  def of[T: ClassTag](spark: SparkSession, key: Any)(mk: => T): Broadcast[T] =
    synchronized {
      val k = (spark.sparkContext.applicationId, key)
      cache.getOrElse(k, {
        while (order.size >= MaxEntries) {
          val old = order.poll()
          cache.remove(old).foreach(_.unpersist(blocking = false))
        }
        val b = spark.sparkContext.broadcast(mk)
        cache(k) = b
        order.add(k)
        b
      }).asInstanceOf[Broadcast[T]]
    }

  /** Test hook: current entry count. */
  private[graft] def size: Int = cache.size
}
