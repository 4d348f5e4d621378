package graft

/**
 * The SparkSessionExtensions injection path: SparkSpec's shared
 * session is built `.withExtensions(new GraftExtensions)` (exactly
 * like every graft main), so a `newSession()` — whose TEMP function
 * registry is fresh and has never seen
 * [[graft.functions.VectorExpressions.register]] — must still resolve
 * every kernel as a built-in. That isolates the extension path from
 * the per-session register() path.
 */
class GraftExtensionsSpec extends SparkSpec {

  test("injected kernels resolve in a fresh session without register()") {
    val fresh = spark.newSession()
    // no register() on `fresh` — resolution below rides ONLY on the
    // extension's injectFunction calls
    val d = fresh.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(math.abs(d - 11.0) < 1e-9)
    val n = fresh.sql(
      "SELECT graft_isect_size(array('a','b','c'), array('b','c','d')) AS n")
      .collect().head.getInt(0)
    assert(n == 2)
  }

  test("extension and register() paths expose the same kernel set") {
    val fresh = spark.newSession()
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val names = functions.VectorExpressions.kernelBuilders.map(_._1)
    for (name <- names)
      assert(fresh.sessionState.functionRegistry
        .functionExists(FunctionIdentifier(name)),
        s"$name missing from the injected registry")
  }
}
