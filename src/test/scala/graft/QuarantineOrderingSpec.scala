package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{TableStore, TempDirs}

/** appendQuarantine crash-ordering contract: the quarantine side
  * commits FIRST, so no failure between the two commits can durably
  * accept rows while silently losing the violations (the exact drop
  * the API exists to prevent). Failure is injected naturally — the
  * quarantine store is poisoned with a committed schema that
  * conflicts with the routed batch, so ITS append throws before the
  * main store is touched. */
class QuarantineOrderingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("failing quarantine commit leaves main untouched; batch stays retryable") {
    val main = new TableStore(spark, TempDirs.create("graft_qcrash_main_"), "id")
    val broken = new TableStore(spark, TempDirs.create("graft_qcrash_bad_"), "id")
    // poison: quarantine committed 'v' as string; the routed batch
    // arrives with v double -> enforceSchema throws inside ITS append
    broken.append(Seq((999L, "seed", "x", 0L))
      .toDF("id", "v", "_violated", "_quarantined_at"))
    val rows = Seq((1L, 5.0), (2L, 500.0)).toDF("id", "v")
    val checks = Seq("v_small" -> (col("v") < 100.0))
    val mainBefore = main.versions.size
    intercept[IllegalArgumentException] {
      main.appendQuarantine(rows, checks, broken)
    }
    assert(main.versions.size == mainBefore,
      "main store committed while the quarantine commit failed — " +
        "violations would be silently lost on crash (ordering regression)")
    // nothing was lost: the whole batch retries cleanly into a healthy quarantine
    val quar = new TableStore(spark, TempDirs.create("graft_qcrash_ok_"), "id")
    val (g, b) = main.appendQuarantine(rows, checks, quar)
    assert(g == 1 && b == 1, s"retry split wrong: ($g, $b)")
    assert(main.read.count() == 1 && quar.read.count() == 1)
    assert(quar.read.filter(col("_violated") === "v_small").count() == 1)
  }
}
