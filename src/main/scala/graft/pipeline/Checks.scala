package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (SURVEY D3 — dbt schema tests:
  * not_null / unique / accepted_values, magic_shop models/schema.yml:6-28).
  * Each check is one aggregate job returning a violation count; `runAll`
  * composes them into a single report.
  */
object Checks {

  final case class CheckResult(name: String, passed: Boolean, violations: Long)

  def notNull(df: DataFrame, column: String): CheckResult = {
    val v = df.filter(col(column).isNull).count()
    CheckResult(s"not_null($column)", v == 0, v)
  }

  def unique(df: DataFrame, column: String): CheckResult = {
    // total - distinct, computed in one pass
    val row = df.agg(count(col(column)).as("n"),
      countDistinct(col(column)).as("d")).head
    val v = row.getLong(0) - row.getLong(1)
    CheckResult(s"unique($column)", v == 0, v)
  }

  def acceptedValues(df: DataFrame, column: String,
      domain: Seq[String]): CheckResult = {
    val v = df.filter(col(column).isNotNull &&
      !col(column).isin(domain: _*)).count()
    CheckResult(s"accepted_values($column)", v == 0, v)
  }

  def relationship(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): CheckResult = {
    // alias both sides — the key names may collide across the two frames.
    // NULL child keys are not violations (dbt's relationships test
    // checks only non-null keys; pair with notNull to forbid them)
    val v = child.select(col(childKey).as("__ck"))
      .filter(col("__ck").isNotNull)
      .join(parent.select(col(parentKey).as("__pk")),
        col("__ck") === col("__pk"), "left_anti").count()
    CheckResult(s"relationship($childKey -> $parentKey)", v == 0, v)
  }

  def runAll(checks: Seq[CheckResult]): (Boolean, Seq[CheckResult]) =
    (checks.forall(_.passed), checks)
}
