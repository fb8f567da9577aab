package graft.sqlx

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Submit independent Spark actions from a small thread pool so a later
  * job's tasks back-fill executor cores freed by an earlier job's tail
  * (optimization-guide §2.6: actions are only sequential because driver
  * code calls them sequentially). Use ONLY for actions with no
  * happens-before edge — same-store mutations keep their program order.
  * Failures rethrow at the join point, first-listed first. */
object Par {
  def run[A](tasks: (() => A)*): Seq[A] = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = tasks.map(t => Future(t()))
    fs.map(Await.result(_, Duration.Inf))
  }
}
