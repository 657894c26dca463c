package graft.model

import java.util.concurrent.ConcurrentHashMap

/** Sharing of config-independent training prep across model fits.
  *
  * Every trainer's `fit` starts with the same hyperparameter-FREE
  * prefix — tensorize the train split, fit the scaler / duration cuts,
  * persist the encoded rows. Inside a Hyperband search that prefix was
  * rebuilt (and re-persisted) once per evaluated config: a rung of 27
  * configs paid 27 identical tensorize+standardize jobs for at most 3
  * distinct results (one per model family). At 100 TB the prep is a
  * full pass over the train split, so the rebuild count — not the
  * training math — dominates rung cost.
  *
  * [[sharing]] activates a process-wide memo for the duration of a
  * search ([[graft.automl.Hyperband.selectModel]] wraps itself in it);
  * trainers route their prefix through [[acquire]]. With no sharing
  * active, `acquire` degenerates to running the build — single fits
  * behave exactly as before, releasing their own prep at fit end.
  * With sharing active, the first config of a family builds and later
  * configs (any rung, any thread) reuse; the scope releases every
  * entry on exit.
  *
  * The build's persists MUST be raw `.persist` (never [[graft.core
  * .Pins.pin]]): a shared entry is built on some config's evaluation
  * thread inside that config's cache scope, and a scoped pin would be
  * released when THAT config finishes while other configs still read
  * the entry.
  */
object TrainCache {

  private final case class Entry(value: Any, release: () => Unit)

  @volatile private var memo: ConcurrentHashMap[String, Entry] = null

  /** Activate sharing for the duration of `f`; releases every cached
    * entry (their persisted Datasets/RDDs) on exit. Non-reentrant by
    * design: a nested call keeps the OUTER memo alive and restores it.
    */
  def sharing[T](f: => T): T = {
    val prev = memo
    val m = new ConcurrentHashMap[String, Entry]()
    memo = m
    try f
    finally {
      memo = prev
      m.values.forEach(_.release())
      m.clear()
    }
  }

  /** Build-or-reuse a config-independent prep. `build` returns the
    * value and a release callback for the sharing scope. Returns the
    * value plus `owned`: true ⇒ no sharing is active and the CALLER
    * keeps its usual own-lifecycle release; false ⇒ the value is
    * shared and the caller must NOT release it.
    */
  def acquire[A](key: String)(build: => (A, () => Unit)): (A, Boolean) = {
    val m = memo
    if (m == null) (build._1, true)
    else {
      val e = m.computeIfAbsent(key, _ => {
        val (a, release) = build
        Entry(a, release)
      })
      (e.value.asInstanceOf[A], false)
    }
  }

  /** Memo key namespace helper: family + dataset identity. Identity
    * (not content) is correct here — a sharing scope spans one search
    * over one immutable SurvDataset instance.
    */
  def key(family: String, ds: graft.surv.SurvDataset, extra: String = ""): String =
    family + "|" + System.identityHashCode(ds) +
      (if (extra.isEmpty) "" else "|" + extra)
}
