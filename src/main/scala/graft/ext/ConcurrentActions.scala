package graft.ext

/** Overlap INDEPENDENT Spark actions from driver threads (guide §2.6):
  * Spark's scheduler runs several jobs at once inside one application —
  * actions are only sequential because the driver calls them
  * sequentially. The index/lifecycle builders issue several small
  * independent writes (signatures/fingerprints/meta, codes/centroids/
  * codebooks/meta, per-slice staging files); run sequentially each pays
  * its own full job latency (driver planning gap + scheduling + commit)
  * while the cluster idles through every tail. Submitting them from a
  * small pool lets the next write's tasks back-fill executors freed by
  * the current write's stragglers — the FIFO back-fill behaviour §2.6
  * describes — and overlaps the driver-side gaps (measured via
  * JobProfile: the r21 lifecycle queries spent 2-5 s in such gaps).
  *
  * Failure semantics: every thunk runs to completion (no cancellation
  * mid-write — a half-cancelled stage write is exactly the torn state
  * the ledger protocols guard against); the FIRST failure is rethrown
  * (unwrapped) after all thunks finish.
  */
object ConcurrentActions {
  def inParallel(thunks: (() => Unit)*): Unit = {
    if (thunks.sizeIs <= 1) { thunks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futs = thunks.map(t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        }))
      var firstFailure: Option[Throwable] = None
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure.isEmpty) firstFailure = Some(e.getCause)
        }
      }
      firstFailure.foreach(throw _)
    } finally { pool.shutdown(); () }
  }
}
