package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{GraftSession, TableStore, TempDirs}

/** Regression: manifest-level pruning keyed on table NAME must not
  * apply one alias's id bounds to every occurrence of the table in a
  * self-join. `FROM t a, t b WHERE a.id >= N` resolves BOTH scans by
  * the name `t`; round-8's resolver matched the first TableRef (alias
  * a) and returned the a-pruned scan for b too, silently losing every
  * b-side file outside a's id range. The resolver now disables
  * pruning whenever the name appears more than once in the FROM list. */
class SelfJoinPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("self-join with one-sided id bound returns all matching pairs") {
    val dir = TempDirs.create("graft_selfjoin_prune_")
    val st = new TableStore(spark, dir, "id")
    // Two manifest files with disjoint id ranges so pruning, if it
    // wrongly fires on the b side, physically drops the low file.
    st.append((1L to 100L).map(i => (i, i % 100)).toDF("id", "grp"))
    st.append((101L to 200L).map(i => (i, i % 100)).toDF("id", "grp"))

    val gs = new GraftSession(spark)
    gs.registerStore("t", st)

    // Each a ∈ [101, 200] pairs with exactly one b ∈ [1, 100] on grp:
    // every correct b-side row lives in the file a's bound would prune.
    val got = gs.execute(
      "select a.id aid, b.id bid from t a, t b " +
      "where a.id >= 101 and a.grp = b.grp and b.id <= 100")
    assert(got.count() == 100L,
      s"self-join lost b-side rows outside a's pruned id range: ${got.count()}")

    // Single-occurrence pruning still works (same session, same store).
    val single = gs.execute("select a.id aid from t a where a.id >= 150")
    assert(single.count() == 51L)
  }
}
