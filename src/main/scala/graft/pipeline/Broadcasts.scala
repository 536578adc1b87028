package graft.pipeline

import scala.collection.concurrent.TrieMap
import scala.reflect.ClassTag
import scala.util.control.NonFatal

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
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
  * Model identity is an MD5 over the java-serialized model content
  * (r18 ADVICE): a retrained model gets its own broadcast while a
  * re-read of the same artifact shares, and the cache retains 16-byte
  * digests instead of up to [[MaxEntries]] boxed deep copies of the
  * models themselves — lookups hash a digest, not O(model size)
  * collections. Bounded: past [[MaxEntries]] the oldest entry is
  * unpersisted (safe for running plans — executors lazily re-fetch on
  * next use; `destroy` would break them, so eviction only drops OUR
  * strong reference and lets GC reclaim the driver-side value once no
  * plan holds the broadcast). Entries for a STOPPED SparkContext are
  * dropped eagerly by an ApplicationEnd listener instead of waiting
  * for LRU displacement. */
private[graft] object Broadcasts {

  private val MaxEntries = 64
  private val cache = TrieMap[(String, String), Broadcast[_]]()
  private val order =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  private val listening = TrieMap[String, Unit]()

  /** MD5 of the java-serialized key — content identity at O(16 bytes)
    * retained per entry.
    *
    * KEY CONTRACT (r19 ADVICE): keys must be `Serializable` values
    * whose serialized form is CANONICAL for equal content — sequences
    * (List/Vector/tuples) of primitives and strings, in a
    * caller-determined order. Iteration-order-sensitive collections
    * (HashMap/HashSet) are rejected: two equal maps can serialize
    * differently and would silently mint duplicate broadcasts,
    * defeating the reference-equality plan-reuse this cache exists
    * for — callers must pass `.toSeq.sorted` (or similar) instead. A
    * non-Serializable key fails loudly here rather than as an opaque
    * NotSerializableException from deep inside ObjectOutputStream. */
  private def digest(key: Any): String = {
    def reject(v: Any): Unit = v match {
      case _: scala.collection.Map[_, _] | _: scala.collection.Set[_] |
           _: java.util.Map[_, _] | _: java.util.Set[_] =>
        throw new IllegalArgumentException(
          "Broadcasts key contains a map/set, whose serialized form is " +
            "iteration-order-sensitive — pass a sorted sequence instead " +
            s"(got ${v.getClass.getName})")
      // Iterable BEFORE Product: a List is a Product (`::`) whose
      // field-wise walk would recurse once per element — foreach is a
      // loop, so a model-sized list stays stack-safe
      case i: Iterable[_] => i.foreach(reject)
      case p: Product => p.productIterator.foreach(reject)
      case _ => ()
    }
    reject(key)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    try { oos.writeObject(key.asInstanceOf[AnyRef]); oos.close() }
    catch {
      case e: java.io.NotSerializableException =>
        throw new IllegalArgumentException(
          "Broadcasts keys must be Serializable (canonical-form " +
            s"sequences of primitives/strings); ${e.getMessage} is not", e)
    }
    java.security.MessageDigest.getInstance("MD5").digest(bos.toByteArray)
      .map("%02x".format(_)).mkString
  }

  private[graft] def dropApp(appId: String): Unit = synchronized {
    val dead = cache.keys.filter(_._1 == appId).toSeq
    dead.foreach { k =>
      order.remove(k)
      // no unpersist: the context is gone, its blocks died with it —
      // dropping the strong reference is all that's left to reclaim
      cache.remove(k)
    }
    listening.remove(appId); ()
  }

  def of[T: ClassTag](spark: SparkSession, key: Any)(mk: => T): Broadcast[T] =
    synchronized {
      val appId = spark.sparkContext.applicationId
      val k = (appId, digest(key))
      cache.getOrElse(k, {
        if (listening.putIfAbsent(appId, ()).isEmpty)
          try spark.sparkContext.addSparkListener(new SparkListener {
            override def onApplicationEnd(
                e: SparkListenerApplicationEnd): Unit = dropApp(appId)
          }) catch { case NonFatal(_) => () }
        while (order.size >= MaxEntries) {
          val old = order.poll()
          cache.remove(old).foreach { b =>
            try b.unpersist(blocking = false)
            catch { case NonFatal(_) => () }
          }
        }
        val b = spark.sparkContext.broadcast(mk)
        cache(k) = b
        order.add(k)
        b
      }).asInstanceOf[Broadcast[T]]
    }

  /** Test hook: current entry count. */
  private[graft] def size: Int = cache.size

  /** Test hook: entry count for one application. */
  private[graft] def sizeFor(appId: String): Int =
    cache.keys.count(_._1 == appId)
}
