package graft.util

import scala.concurrent.ExecutionContext

/** Execution context for overlapped independent Spark actions (guide
  * §2.6: "actions are only sequential because driver code calls them
  * sequentially"). Every future body at the overlap sites BLOCKS on a
  * Spark action (count / write), so running them on
  * `ExecutionContext.Implicits.global` — a ForkJoinPool whose
  * parallelism equals the core count — can serialize the intended
  * overlap on a small-core host, and a body that is never wrapped in
  * `blocking{}` does not grow the pool (the round-14 advice item). A
  * cached pool of daemon threads keeps job SUBMISSION independent of
  * the compute pool: threads exist only while jobs are in flight, and
  * each is created from the submitting thread, so Spark's inheritable
  * thread-local job properties (description/group) propagate.
  */
object Jobs {
  implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(
    java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-jobs")
      t.setDaemon(true)
      t
    }))
}
