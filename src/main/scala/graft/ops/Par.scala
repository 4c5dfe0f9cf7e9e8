package graft.ops

/** Run independent Spark actions concurrently (guide §2.6 — overlap
  * independent jobs): the scheduler happily runs several jobs at once
  * inside one application; sequential driver code is what serializes
  * them. Rethrows the first failure after all tasks finish.
  */
object Par {
  def run(tasks: (String, () => Unit)*): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = tasks.map { case (n, t) =>
      val th = new Thread(() => {
        try t() catch { case e: Throwable => errs.add(e); () }
      }, s"par-$n")
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }
}
