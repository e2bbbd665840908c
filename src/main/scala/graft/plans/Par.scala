package graft.plans

/** Driver-side overlap of INDEPENDENT job legs (optimization guide §2.6:
  * "Spark's scheduler happily runs several jobs at once inside one
  * application; actions are only sequential because your driver code
  * calls them sequentially").
  *
  * The iterative operators here materialize eager pins
  * ([[Pins.pin]] = `localCheckpoint(true)`) from driver loops, so two
  * independent pin chains invoked one after the other serialize dozens
  * of small jobs that could back-fill each other's scheduling gaps and
  * stage tails — at local[32] the loops are per-round-latency-bound and
  * leave most cores idle, and on a cluster the tail of one leg's stage
  * leaves executors free for the other (the guide's motivating case).
  *
  * `both` runs the second thunk on a dedicated thread while the first
  * runs on the caller's: same frames, same plans, same values — only
  * the job timeline overlaps. Each call uses a fresh daemon thread
  * (never a ForkJoin common pool, whose lazily-created workers would
  * capture inheritable thread-locals — job group / description — from
  * whichever caller happened to create them). Exceptions from either
  * leg propagate to the caller.
  *
  * Determinism: both legs compute exactly what they computed when
  * sequential — no shared mutable state, and concurrent actions on one
  * SparkSession are supported (FIFO-scheduled). Oracle hashes are
  * therefore unchanged by construction.
  */
object Par {
  def both[A, B](a: => A, b: => B): (A, B) = {
    val rb = new java.util.concurrent.atomic.AtomicReference[Either[Throwable, B]]()
    val t = new Thread(
      () => rb.set(try Right(b) catch { case e: Throwable => Left(e) }),
      "graft-par")
    t.setDaemon(true)
    t.start()
    val ra =
      try a
      catch {
        case e: Throwable =>
          t.join() // never leave the second leg running unobserved
          throw e
      }
    t.join()
    rb.get() match {
      case Right(v) => (ra, v)
      case Left(e) => throw e
    }
  }

  /** Three-way [[both]] for triples of independent legs. */
  def three[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val (ra, (rbb, rc)) = both(a, both(b, c))
    (ra, rbb, rc)
  }
}
