package graft

/** Local stand-in for the driver's smoke check: builds a session the way
  * the driver does, runs SparkEntry.entry, asserts rows > 0.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cpus = 8, appName = "graft-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n schema=${df.schema.simpleString}")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
