package graft.ops

/** Run two INDEPENDENT Spark actions concurrently (optimization guide
  * §2.6 "overlap independent jobs"): Spark's scheduler happily runs
  * several jobs at once inside one application — actions are only
  * sequential because driver code calls them sequentially — so two
  * jobs over DIFFERENT tables overlap their fixed per-job costs
  * (scheduling, codegen, commit) and back-fill each other's task
  * tails. Use ONLY for actions with no ordering contract between them
  * (e.g. the compaction tick's two table compactions, or two fresh
  * index builds); anything whose crash-window semantics depend on
  * which commit lands first must stay sequential. Either side's
  * failure propagates (the first side's exception wins when both
  * throw). */
object Par {
  def both(a: => Unit, b: => Unit): Unit = {
    @volatile var err: Throwable = null
    val t = new Thread(() => try b catch { case e: Throwable => err = e })
    t.setName(s"graft-par-${t.getId}")
    t.start()
    try a
    finally t.join()
    if (err != null) throw err
  }
}
