package graft.lake

/** Driver-side helper for OVERLAPPING independent Spark actions (guide
  * §2.6: actions are only sequential because the driver calls them
  * sequentially — submitting independent jobs from two driver threads
  * lets the second job's tasks back-fill executors freed by the first
  * job's tail). Used where one operator performs several INDEPENDENT
  * writes/builds (stats + bloom index builds, the BM25 two-table
  * apply): the operations must not share mutable state beyond the
  * engine's concurrent-safe memos.
  *
  * Cached daemon pool: these threads only SUBMIT Spark jobs and block,
  * so they are cheap; idle threads retire, and daemon status keeps a
  * hung action from pinning the JVM open.
  */
private[graft] object Overlap {

  implicit val ec: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newCachedThreadPool(
        (r: Runnable) => {
          val t = new Thread(r, "graft-overlap"); t.setDaemon(true); t }))

  /** Await every future (so no action is left running behind the
    * caller), then rethrow the FIRST failure if any. */
  def all[T](futs: Seq[scala.concurrent.Future[T]]): Seq[T] = {
    futs.foreach(f => scala.concurrent.Await.ready(f,
      scala.concurrent.duration.Duration.Inf))
    futs.map(_.value.get.get)
  }
}
