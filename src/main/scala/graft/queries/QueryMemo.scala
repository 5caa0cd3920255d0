package graft.queries

import graft.Ckpt._

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for intermediates shared by several registry
  * queries (the credits ETL chain feeds five e2e queries, one component
  * labeling feeds dd6/dd6b, one PCA model feeds emb2/emb3).
  *
  * Every registry query must stay standalone-correct: a memo hit only
  * changes WHERE the shared stage's result comes from, never what it is.
  * Whichever query runs first pays for the build; the checkpoint
  * materializes it so later queries read blocks instead of re-deriving
  * the plan. On a real cluster this is the staged-table / reliable-
  * checkpoint pattern — a pipeline server would persist these between
  * requests exactly like this.
  *
  * [[graft.SessionHygiene]] must NOT release memoized frames' blocks (a
  * checkpoint's lineage is truncated, so a released frame is stranded,
  * not recomputable) — `frames` exposes them for protection.
  */
private[graft] object QueryMemo {

  /** Kill switch for plan audits: a memo hit replaces a query's upstream
    * plan with a checkpoint scan, which would blind the plan-shape
    * regression gate to the real chain. The audit sets this property to
    * see (and snapshot) the un-memoized plans; correctness is unaffected
    * either way. */
  private def disabled: Boolean =
    sys.props.get("graft.querymemo.disable").contains("true")

  private val frameMemo =
    new ConcurrentHashMap[(SparkSession, String, String), DataFrame]()
  private val valueMemo =
    new ConcurrentHashMap[(SparkSession, String, String), AnyRef]()

  /** Memoized DataFrame, localCheckpoint'ed on first build. */
  def frame(s: SparkSession, dir: String, key: String)
           (build: => DataFrame): DataFrame =
    if (disabled) build
    else frameMemo.computeIfAbsent((s, dir, key), _ => build.ckpt())

  /** Memoized driver-side value (a fitted model, a dim snapshot). */
  def value[T <: AnyRef](s: SparkSession, dir: String, key: String)
                        (build: => T): T =
    if (disabled) build
    else valueMemo.computeIfAbsent((s, dir, key), _ => build).asInstanceOf[T]

  /** Frames whose checkpoint blocks later queries still read. */
  def frames: Seq[DataFrame] = {
    import scala.jdk.CollectionConverters._
    frameMemo.values.asScala.toSeq
  }

  /** Evicts every memoized frame (freeing its checkpoint blocks NOW) and
    * every memoized value. The bench calls this at PASS boundaries so each
    * repeat pass rebuilds shared stages exactly once — charging every
    * memo build to the first query that needs it, in every pass, instead
    * of letting warm memos turn the per-query minima into
    * steady-state-only numbers (the round-8 "flattered min-sum" finding).
    * Frames are checkpoint-rooted by construction ([[frame]] stores
    * `build.ckpt()`), so [[graft.SessionHygiene.freeCheckpoint]]
    * applies directly. */
  def clear(): Unit = {
    import scala.jdk.CollectionConverters._
    frameMemo.values.asScala.foreach(graft.SessionHygiene.freeCheckpoint)
    frameMemo.clear()
    valueMemo.clear()
  }
}
