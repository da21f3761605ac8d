package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The I/O claim table_corpus_pointread's oracle can't state: a doc_id
  * point read over the versioned corpus opens a STRICT SUBSET of the
  * committed files — the bloom index prunes what min/max stats cannot on
  * a hash-scattered id column — and the pruned read returns exactly the
  * plain filter's rows. */
class CorpusPointReadSpec extends SparkSpec {

  test("bloom point read over the committed corpus opens a strict file subset") {
    val root = TableQueries.corpusTable(spark, sfDir)
    val all = VersionedTable.manifest(root, 1)
    assert(all.size == 8, s"corpus staging expected 8 files, got ${all.size}")

    // min/max stats are useless on the hash-scattered doc_id (every file
    // spans the domain) — the bloom is what prunes
    for (id <- Seq(1L, 7L, 13L, 29L, 41L)) {
      val survivors = VersionedTable.prunedFilesPoint(root, 1, "doc_id", id)
      assert(survivors.nonEmpty, s"doc $id: bloom pruned the holder away")
      assert(survivors.size < all.size,
        s"doc $id: point read opened all ${all.size} files — no pruning")
      assert(survivors.toSet.subsetOf(all.toSet))
      // no false negatives: the pruned read IS the plain filter
      val got = VersionedTable.readVersionPoint(spark, root, 1, "doc_id", id)
        .select(col("doc_id"), col("lang"), col("n_chars")).collect().toSeq
      val want = VersionedTable.readVersion(spark, root, 1)
        .filter(col("doc_id") === id)
        .select(col("doc_id"), col("lang"), col("n_chars")).collect().toSeq
      assert(got == want, s"doc $id: pruned read diverges from plain filter")
      assert(got.size == 1, s"doc $id: expected exactly one corpus row")
    }

    // an absent key prunes everywhere it can and returns nothing
    assert(VersionedTable.readVersionPoint(spark, root, 1, "doc_id", 999999L)
      .isEmpty)

    // the staged corpus also carries the planner-facing metadata the
    // commit declared: NDV sketches on lang/source answer without a scan
    val (rows, ndvLang) = VersionedTable.scanFreeStats(root, 1, "lang")
    assert(rows == VersionedTable.readVersion(spark, root, 1).count())
    assert(ndvLang >= 1.0 && ndvLang <= 64.0,
      s"lang NDV estimate out of plausible range: $ndvLang")
  }
}
