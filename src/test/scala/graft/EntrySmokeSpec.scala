package graft

/** Executes every registered query end-to-end at sf0.001 — catches
  * runtime plan errors (overflow, bad casts, unresolvable columns) that
  * compile-time checks cannot. The oracle hash-compare runs driver-side;
  * this pins "every query at least executes and produces a schema+rows".
  */
class EntrySmokeSpec extends SparkSuite {

  test("flagship entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query carries a DuckDB oracle — no rows-only checks remain") {
    // round 5 closed the set: q38/q42 switched to md5-derived token
    // hashes (engine-independent), so even the sketch pipelines are
    // rebuilt in SQL; approximate results (HLL/CMS/GK, IVF) are oracled
    // via in-row exact+bound columns
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set.empty[String])
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001 with a nonempty schema") {
      val df = fn(spark, sf0001)
      assert(df.schema.fields.nonEmpty)
      assert(df.count() >= 0) // forces full execution
    }
  }

  test("no query leaves a session-lifetime cache behind") {
    // shingleRel/tokenRel default to cache=false — running the heaviest
    // consumers must leave the cache manager empty (a long-lived service
    // embedding these plans must not leak memory per query built)
    spark.sharedState.cacheManager.clearCache()
    Seq("q36_dedup_ngram", "q37_dedup_minhash", "q38_dedup_simhash",
      "q46_ngram_freq", "q55_explode_tokens", "q61_doc_repetition", "q65_tfidf")
      .foreach(q => SparkEntry.queries(q)(spark, sf0001).count())
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
