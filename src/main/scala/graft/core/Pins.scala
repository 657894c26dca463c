package graft.core

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Registry of operator cache pins, releasable at the DATASET level.
  *
  * Why this exists: operators persist load-bearing intermediates
  * (shingle sets, minhash signatures, LSH candidates, fitted
  * baselines). Sweeping those pins via `SparkContext.getPersistentRDDs`
  * + `RDD.unpersist` — the shape CacheScope/Bench used through round 6
  * — drops the cached blocks but leaves the entry in Catalyst's
  * CacheManager. The entry is then poison twice over: a LATER identical
  * plan's `.persist()` is a silent no-op ("already cached") against a
  * relation whose storage level can never be re-enabled, and plan
  * substitution keeps routing scans through the dead InMemoryRelation
  * (recompute + columnar re-encode per scan, nothing stored). Measured:
  * q_dedup_ngram_jaccard ran its WARM runs slower than cold (2.1 s vs
  * 1.5 s) because q_dedup_cc — which pins the same capped-shingle plan
  * — ran first and its sweep left the dead entry.
  *
  * `Dataset.unpersist` is the only release that removes the
  * CacheManager entry, so pins must be released through the Dataset
  * handle. Operators register every persist here ([[pin]]); sweeps
  * release by scope ([[scoped]]) and a raw-RDD fallback stays in the
  * sweeps only for persists that never touched the Dataset API.
  *
  * Scopes are a per-thread stack, so concurrently-evaluated Hyperband
  * configs (each fit inside its own CacheScope on its own thread)
  * release exactly their own pins.
  */
object Pins {

  private sealed trait Pin { def release(): Unit }
  private final case class DsPin(ds: Dataset[_]) extends Pin {
    def release(): Unit = ds.unpersist(blocking = true)
  }
  private final case class RddPin(rdd: RDD[_]) extends Pin {
    def release(): Unit = rdd.unpersist(blocking = true)
  }
  private final case class CkptPin(ds: Dataset[_]) extends Pin {
    def release(): Unit = releaseCheckpoint(ds)
  }

  private final class Scope {
    val pins = new java.util.concurrent.ConcurrentLinkedQueue[Pin]()
  }

  // Innermost active scope per thread. Plain ThreadLocal, NOT
  // inheritable: pooled worker threads are created once and reused, so
  // an inherited stack would freeze whatever scope happened to be
  // active at thread creation and leak every later pin into it. Each
  // worker opens its own scope (Hyperband's parallel rung evaluation
  // wraps every config in CacheScope on its evaluation thread).
  private val current = new ThreadLocal[List[Scope]] {
    override def initialValue(): List[Scope] = Nil
  }

  private def register(p: Pin): Unit = current.get() match {
    case s :: _ => s.pins.add(p)
    case Nil    => () // unscoped pin: caller owns the lifecycle
  }

  /** Persist `ds` and register it with the innermost scope on this
    * thread (no scope → the caller owns the release).
    *
    * Idempotent per canonical plan: if the plan already has a
    * CacheManager entry (a sibling operator or the shared setup
    * already pinned it), the persist is skipped and the EXISTING
    * owner keeps the release — a second `.persist()` would no-op
    * with a "Asked to cache already cached data" warning while this
    * scope wrongly believed it held a pin to drop.
    */
  def pin[T](ds: Dataset[T],
             level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    requireConsumable(ds, "pin() input")
    if (!org.apache.spark.sql.graft.bridge.isCached(ds)) {
      ds.persist(level)
      register(DsPin(ds))
    }
    ds
  }

  /** Pin `ds`, then globally order it — for queries whose FINAL
    * orderBy sits on an expensive exchange-free frontier. A global
    * sort is a range exchange, and RangePartitioner first runs a
    * SAMPLE job over the full child output to pick bounds, then the
    * real shuffle executes the child AGAIN. Below-frontier shuffle
    * stages are reused (AQE materializes them), but everything ABOVE
    * the last exchange — a cartesian pair predicate, a codec decode,
    * a scan-fused scoring projection — executes twice per run.
    * Pinning the frontier makes the sample pass populate the cache
    * and the shuffle pass read it: the dominant work runs once.
    * (jstack-verified on the sf10 board: q_dedup_embed_cos's
    * RangePartitioner sample sat inside CartesianProductExec.)
    */
  def sortedOnce[T](ds: Dataset[T],
                    cols: org.apache.spark.sql.Column*): Dataset[T] =
    pin(ds).orderBy(cols: _*)

  /** RDD-level twin of [[pin]] for genuine RDD persists (per-partition
    * training accumulators etc.), which never enter the CacheManager.
    */
  def pinRdd[T](rdd: RDD[T],
                level: StorageLevel = StorageLevel.MEMORY_AND_DISK): RDD[T] = {
    rdd.persist(level)
    register(RddPin(rdd))
    rdd
  }

  /** Register an eagerly-checkpointed Dataset for release at the
    * innermost scope's exit (no scope → the caller owns the release,
    * exactly like [[pin]]). This is how an iterative operator's FINAL
    * checkpoint — the one round the rotation can't release, because
    * the returned frame reads it — gets the same lifecycle under bare
    * [[scoped]] that `CacheScope`'s getPersistentRDDs-diff fallback
    * already gives it: released once the scope closes.
    *
    * Same safety contract as [[releaseCheckpoint]]: the scope must
    * materialize every consumer of the returned frame before it exits
    * — a truncated-lineage block can never recompute. That is already
    * the documented CacheScope contract ("consume the result inside
    * the scope").
    *
    * HAZARD (scope nesting): registration is with the INNERMOST scope
    * on the current thread. If an operator returning a
    * checkpoint-backed frame is ever invoked inside a narrower
    * internal `scoped` block, the blocks are released at that inner
    * scope's exit and the caller's later consumption fails — the
    * frame must escape no scope narrower than its consumers. Released
    * ids are tombstoned ([[requireConsumable]]) so the failure names
    * the contract instead of surfacing as a block-manager error.
    */
  def pinCheckpoint(ds: Dataset[_]): Unit = register(CkptPin(ds))

  // ---- use-after-release tombstones -------------------------------
  // RDD ids of checkpoints released through releaseCheckpoint (state
  // rotation AND scope-exit CkptPins). A released local checkpoint's
  // lineage is truncated, so any later execution over it dies deep in
  // the block manager with a generic "block not found" that names
  // neither the operator nor the contract; the tombstones let the
  // entry points that stale frames cross (bridge.rebind, [[pin]])
  // fail loudly with the fix in the message instead. Bounded ring —
  // ids are context-unique and never reused, so there are no ID-REUSE
  // false positives; eviction only ever FORGETS an old release (back
  // to the generic error), never misreports a live one. (The check is
  // a LINEAGE property, not a cache one — see the caveat on
  // [[requireConsumable]].)
  private val TombstoneCap = 4096
  private val tombstoneRing =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  // ring occupancy tracked explicitly: ConcurrentLinkedQueue.size() is
  // an O(n) traversal, so calling it per released checkpoint turns the
  // eviction loop quadratic once the ring sits near the cap
  private val tombstoneCount = new java.util.concurrent.atomic.AtomicInteger(0)
  private val tombstones =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  // RDD ids restart at 0 per SparkContext, so the key carries the
  // context's epoch-unique startTime — a tombstone can never flag an
  // RDD of a LATER context that happens to reuse the integer id.
  private def tombstoneKey(rdd: RDD[_]): String =
    s"${rdd.context.startTime}:${rdd.id}"

  private def recordTombstone(rdd: RDD[_]): Unit = {
    val key = tombstoneKey(rdd)
    if (tombstones.add(key)) {
      tombstoneRing.add(key)
      // count races concurrent adds at worst into harmless transient
      // over-eviction (one extra old entry forgotten), never a miss
      if (tombstoneCount.incrementAndGet() > TombstoneCap) {
        val old = tombstoneRing.poll()
        if (old != null) { tombstoneCount.decrementAndGet(); tombstones.remove(old) }
      }
    }
  }

  private def lineageHitsTombstone(rdd: RDD[_],
                                   seen: scala.collection.mutable.Set[Int]): Option[Int] =
    if (!seen.add(rdd.id)) None
    else if (tombstones.contains(tombstoneKey(rdd))) Some(rdd.id)
    else rdd.dependencies.iterator
      .flatMap(d => lineageHitsTombstone(d.rdd, seen)).nextOption()

  /** First released-checkpoint RDD id reachable from `ds`'s plan
    * (LogicalRDD leaves and their lineage — a re-bound frame's leaf is
    * a DERIVED scan over the checkpoint RDD, so the walk follows
    * dependencies; checkpoint lineage is truncated, keeping it
    * shallow). None → every checkpoint under `ds` is still live.
    */
  def releasedCheckpointIn(ds: Dataset[_]): Option[Int] = {
    if (tombstones.isEmpty) return None // nothing released yet: no walk
    val seen = scala.collection.mutable.Set.empty[Int]
    ds.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.iterator.flatMap(lineageHitsTombstone(_, seen)).nextOption()
  }

  /** Fail loudly — naming the operator contract and the fix — when
    * `ds` reads a checkpoint that state rotation or a pin-scope exit
    * already released. Called where stale frames cross operator
    * boundaries (bridge.rebind, [[pin]]); also a standalone debug
    * helper for diagnosing a raw "block not found".
    *
    * CAVEAT (conservative by design): the walk is a LINEAGE property —
    * it is blind to CacheManager coverage. A frame whose lineage roots
    * in a released checkpoint but whose subtree is fully served by a
    * live InMemoryRelation pin would execute fine off the cache, yet
    * is rejected here; cache entries are evictable, so treating a
    * cache hit as consumability would make the check load-dependent
    * (pass under memory headroom, "block not found" under pressure).
    * No in-repo call path pins/rebinds over released lineage, but
    * library callers composing their own scopes may hit this: keep
    * the checkpoint live until its cached consumers are materialized
    * (the documented scope contract), exactly as the error says.
    */
  def requireConsumable(ds: Dataset[_], what: String = "frame"): Unit =
    releasedCheckpointIn(ds).foreach { id =>
      throw new IllegalStateException(
        s"$what is backed by a local checkpoint (RDD $id) that was " +
          "already released at pin-scope exit or by state rotation — a " +
          "truncated-lineage checkpoint cannot recompute, so this frame " +
          "is permanently dead (Spark would fail with a generic 'block " +
          "not found' at execution). Consume an operator's result inside " +
          "the Pins.scoped/CacheScope block that produced it.")
    }

  /** Release the cached blocks of a locally-checkpointed Dataset —
    * the per-iteration STATE ROTATION primitive for iterative
    * operators (PageRank, connectedComponents). Without rotation a
    * 20-round loop leaves 20 superseded checkpoint RDDs in the
    * storage pool; at scale the pool saturates and every block
    * unroll fights task execution for the ONE UnifiedMemoryManager
    * monitor (jstack on the sf10 board's slow PageRank runs: 18–30
    * of 32 task threads BLOCKED in acquireExecutionMemory /
    * reserveUnrollMemoryForThisTask while guest CPUs sat idle).
    *
    * A checkpointed Dataset's plan is a bare LogicalRDD over the
    * checkpoint RDD (possibly under later projections), so the RDD
    * is recovered from the analyzed plan and unpersisted directly —
    * `Dataset.unpersist` can't reach it (checkpoint blocks never
    * enter the CacheManager, so there is no entry to poison either).
    *
    * SAFETY: only call once every consumer of `ds` has been
    * materialized into its own (eager) checkpoint or count — a
    * locally-checkpointed RDD's lineage is truncated, so an
    * unpersisted block can never be recomputed. Anything still lazy
    * over `ds` will throw on next execution.
    */
  def releaseCheckpoint(ds: Dataset[_]): Unit = {
    val rdds = ds.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    // Exactly ONE LogicalRDD by contract: every caller passes a single
    // eagerly-checkpointed dataset (possibly under later projections).
    // A plan with several — e.g. a JOIN of two checkpoints — would
    // silently release a still-live sibling whose truncated lineage
    // can never recompute ("block not found" far from the bug), so
    // misuse fails loudly here instead.
    require(rdds.size == 1,
      s"releaseCheckpoint expects exactly one checkpoint RDD in the plan, " +
        s"found ${rdds.size} — pass the checkpointed dataset itself, not a " +
        "composition of checkpoints")
    rdds.foreach { r => recordTombstone(r); r.unpersist(blocking = false) }
  }

  /** Run `f` in a fresh scope; every pin taken during `f` on THIS
    * thread is released — Dataset-level, so the CacheManager entry
    * goes too — when `f` finishes. Pins taken on other threads
    * (including threads `f` spawns) are NOT scoped here: `current` is
    * deliberately non-inheritable (see its comment), so each worker
    * thread opens its own scope.
    */
  def scoped[T](f: => T): T = {
    val s = new Scope
    current.set(s :: current.get())
    try f
    finally {
      current.set(current.get() match {
        case `s` :: rest => rest
        case other       => other.filterNot(_ eq s)
      })
      s.pins.forEach(_.release())
      s.pins.clear()
    }
  }
}
