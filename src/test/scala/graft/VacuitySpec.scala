package graft

/** Vacuity guard (round-2 verdict: `join_range_bucketed` was green with 0
  * rows — an empty-vs-empty hash match proves nothing). Every oracle-checked
  * key must produce at least one row on the smallest fixture, or be on the
  * explicit allowlist below with a reason. A new key that silently returns
  * empty fails here before it can masquerade as coverage.
  */
class VacuitySpec extends SparkSpec {

  /** Keys whose EMPTY result is the asserted behavior (documented, paired
    * with a non-empty variant), or empty only at sf0.001's size. */
  private val emptyOk: Map[String, String] = Map(
    "setop_except" -> ("purchase-users minus error-users is empty at every " +
      "SF (purchasers ⊆ error users by fixture construction); the DISTINCT " +
      "semantics are proven non-vacuously by setop_except_nonempty"))

  test("every query key returns rows at sf0.001 (or is allowlisted)") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val empties = names.flatMap { name =>
      try {
        if (SparkEntry.queries(name)(spark, sfDir).isEmpty && !emptyOk.contains(name))
          Some(name -> "0 rows")
        else None
      } catch {
        case e: Throwable =>
          Some(name -> s"errored: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
      }
    }
    assert(empties.isEmpty,
      s"vacuous/broken keys:\n  ${empties.map { case (k, v) => s"$k: $v" }.mkString("\n  ")}")
  }

  test("every query key carries an oracle (no silent rows-only downgrades)") {
    // the driver records a WEAKER rows-only check for keys missing an
    // oracleSql entry — every key must keep full hash-checked coverage,
    // and no oracle may point at a key that doesn't exist
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.diff(o).isEmpty, s"keys without an oracle: ${q.diff(o).toSeq.sorted}")
    assert(o.diff(q).isEmpty, s"orphan oracles: ${o.diff(q).toSeq.sorted}")
    assert(q.forall(_.matches("[a-z0-9_]+")), "keys are stable snake_case ids")
  }

  test("allowlist entries stay genuinely empty (else the entry is stale)") {
    emptyOk.keys.foreach { name =>
      assert(SparkEntry.queries(name)(spark, sfDir).isEmpty,
        s"$name now returns rows — drop it from the allowlist")
    }
  }
}
