package graft

/** Driver-contract invariants: the registry is well-formed, the flagship
  * smoke query returns rows, and every registered query executes on the
  * smallest fixture. */
class ContractSpec extends SparkSuite {

  test("query names are unique and oracle keys are a subset") {
    val names = SparkEntry.queries.keySet
    assert(names.nonEmpty)
    assert(SparkEntry.oracleSql.keySet.subsetOf(names),
      s"orphan oracle keys: ${SparkEntry.oracleSql.keySet -- names}")
  }

  test("entry (t1 smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query named in COVERAGE.md exists in the registry") {
    val md = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")))
    val cited = "q\\d{2,3}_[a-z0-9_]+".r.findAllIn(md).toSet
    val names = SparkEntry.queries.keySet
    val stale = cited -- names
    assert(stale.isEmpty, s"COVERAGE.md cites non-existent queries: $stale")
    // and the map is total the other way: every query appears in the doc
    // (by full name or its qNN prefix — family rows cite ranges)
    val prefixes = "q\\d{2,3}".r.findAllIn(md).toSet
    val undocumented = names.filterNot(n =>
      cited.contains(n) || prefixes.contains(n.takeWhile(_ != '_')))
    assert(undocumented.isEmpty, s"queries missing from COVERAGE.md: $undocumented")
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // README numbers rot silently (round 4 shipped "42 tests" against 45
  // actual) — derive each from the artifact it describes and assert the
  // doc carries the derived value, same contract as the COVERAGE.md sync.
  test("README counts match the registry and the test tree") {
    val md = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")))
    val n = SparkEntry.queries.size
    assert(md.contains(s"`SparkEntry.queries.size`, $n as of"),
      s"README query count drifted from $n")
    val noOracle = (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet)
      .map(_.takeWhile(_ != '_')).toSeq.sortBy(_.drop(1).toInt)
    assert(md.contains(
      s"the ${noOracle.size} engine-specific queries ${noOracle.mkString("/")}"),
      s"README no-oracle list drifted: expected ${noOracle.mkString("/")}")
    val suites = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get("src/test/scala"))
      try s.filter(_.toString.endsWith("Spec.scala")).count()
      finally s.close()
    }
    assert(md.contains(s"$suites suites"), s"README suite count drifted from $suites")
  }

  test("oracle SQL mentions only fixture tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // FROM/JOIN targets must be fixture tables or inline subqueries.
    val bad = SparkEntry.oracleSql.collect {
      case (name, sql) =>
        val refs = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        // CTE names and aliases resolve before tables; only flag unknown
        // refs that are not defined as CTEs in the same statement. A CTE
        // may carry a column list (recursive form: `reach(src, dst) AS (`).
        val ctes = "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*(?:MATERIALIZED\\s*)?\\(".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        name -> (refs -- tables -- ctes)
    }.filter(_._2.nonEmpty)
    // Inline VALUES/derived-table aliases and generator table functions
    // (q88's FROM range(n)) are fine; just surface surprises.
    val unknown = bad.filterNot { case (_, refs) =>
      refs.forall(r => Set("t", "t2", "o", "r", "bands", "cand", "jp",
        "sh", "sh0", "sz", "pr", "sig", "banded", "wc", "bits", "fp", "iw", "h",
        "w", "f", "eb", "e2", "cond", "range", "rowred",
        "generate_series").contains(r))
    }
    assert(unknown.isEmpty, unknown.mkString("\n"))
  }
}
