package graft

/** Mutable broadcast slot for re-executed RDD plans whose closures
  * (not Catalyst expressions — that is
  * [[graft.functions.VecBcHolder]]'s job) probe a per-iteration
  * model: the driver re-points `bc` between jobs, and the scheduler's
  * per-job task-binary re-serialization ships the new stub with the
  * closure — so ONE planned RDD serves every training iteration with
  * no Catalyst re-plan. The caller owns the broadcast lifecycle
  * (destroy after the iteration's job, re-point before the next). */
final class BcSlot[T] extends Serializable {
  @volatile var bc: org.apache.spark.broadcast.Broadcast[T] = null
}
