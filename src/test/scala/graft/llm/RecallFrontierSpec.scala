package graft.llm

import graft.SparkSpec

/** The dominance claims RECALL.json documents, pinned on the
  * deterministic fixture (every family and the ground truth are
  * deterministic, so these orderings are reproducible facts, not flaky
  * thresholds). */
class RecallFrontierSpec extends SparkSpec {

  private lazy val rows =
    Similarity.recallFrontier(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap

  test("frontier covers every serving family with sane bounds") {
    assert(rows.keySet == Set("brute_force", "lsh_1table", "lsh_4tables",
      "ivf_nprobe2", "nsw", "hnsw_2layer", "pq_adc", "pq_adc_trained",
      "ivfpq_nprobe5"))
    rows.foreach { case (f, (recall, visited, unit, n)) =>
      assert(recall >= 0 && recall <= 1000, s"$f recall $recall out of range")
      assert(visited >= 3 && visited <= n - 1,
        s"$f visited $visited vs corpus $n")
      assert(unit == "vectors" || unit == "codes")
    }
  }

  test("brute force is the recall ceiling at full-scan cost") {
    val (recall, visited, _, n) = rows("brute_force")
    assert(recall == 1000, "exact search must have perfect recall")
    assert(visited == n - 1, "exact search must visit everything")
    assert(rows.values.forall(_._1 <= 1000))
  }

  test("multi-table LSH dominates single-table in recall, at higher candidate cost") {
    // guaranteed by construction: table 0's candidates are a subset of the
    // 4-table union, and the re-rank is exact on both
    assert(rows("lsh_4tables")._1 > rows("lsh_1table")._1,
      "4-table recall must exceed the single-table baseline")
    assert(rows("lsh_4tables")._2 >= rows("lsh_1table")._2,
      "the recall is bought with candidates — cost cannot shrink")
  }

  test("PQ training moves recall at identical scan cost") {
    val (rU, vU, uU, _) = rows("pq_adc")
    val (rT, vT, uT, _) = rows("pq_adc_trained")
    assert(vU == vT && uU == "codes" && uT == "codes",
      "both PQ variants ADC-scan the full code table")
    assert(rT > rU, "trained codebooks must beat label-seeded ones")
  }

  test("graph walks are sub-scan and the hierarchy helps") {
    val (nswR, nswV, _, n) = rows("nsw")
    val (hR, hV, _, _) = rows("hnsw_2layer")
    assert(nswV * 3 < n && hV * 3 < n,
      s"graph walks must visit well under the corpus: $nswV, $hV of $n")
    // the L1 coarse walk spends a few extra visits to start the L0 walk
    // near the target — on the deterministic fixture that buys recall
    assert(hR >= nswR, s"2-layer recall $hR fell below flat NSW $nswR")
  }

  test("IVF probes a bounded slice and beats the single-table LSH baseline") {
    val (r, v, _, n) = rows("ivf_nprobe2")
    assert(v * 3 < n, s"nprobe=2 of 10 cells must be a corpus slice: $v of $n")
    assert(r > rows("lsh_1table")._1)
  }

  test("recall drift gate: no family's fixture recall drops below the committed artifact (r13 item 7)") {
    // RECALL_FIXTURE.json is the committed frontier at THIS fixture SF
    // (regenerate with `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 sbt
    // "runMain graft.RecallFrontier RECALL_FIXTURE.json"` and document
    // the change in PERF.md — the plan_fp protocol applied to recall).
    // Every family is deterministic on the fixture, so a silent code
    // change that degrades recall fails HERE instead of surfacing rounds
    // later in the sf1 artifact.
    val p = java.nio.file.Paths.get("RECALL_FIXTURE.json")
    assert(java.nio.file.Files.exists(p),
      "committed fixture recall artifact missing — regenerate it")
    val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val re = """\{"family": "([a-z0-9_]+)", "recall_pm": (\d+)""".r
    val committed = re.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
    assert(committed.keySet == rows.keySet,
      s"family set drifted: committed ${committed.keySet} vs live ${rows.keySet}")
    val drops = rows.collect {
      case (f, (live, _, _, _)) if live < committed(f) =>
        s"$f: ${committed(f)} -> $live"
    }
    assert(drops.isEmpty,
      s"recall dropped vs committed RECALL_FIXTURE.json (${drops.mkString("; ")}) — " +
        "if intentional, regenerate the artifact and document in PERF.md")
  }
}
