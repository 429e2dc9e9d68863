package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.index.{Compactor, IndexBuilder, Fs, Snapshotter}
import graft.query.Searcher
import graft.streaming.StreamingIngest

/** Snapshot / restore (Snapshotter.scala — the ES `_snapshot` analog): a
  * snapshot pins ONE catalog state (epoch tables + live segments + committed
  * tombstones) behind a sha256 manifest and a marker-last commit; the
  * snapshot dir opens as an index, later mutations of the source never leak
  * in, restore re-verifies every byte, and corruption is refused loudly.
  */
class SnapshotSpec extends AnyFunSuite with SparkSuite {

  private val queries = Seq("the", "import def", "postinglist docfreq")

  private def byCommit(h: IndexBuilder.Handle, q: String): Set[(String, Double)] =
    Searcher.topK(spark, h, q, Int.MaxValue).toDF()
      .join(h.docmetaAll(spark).toDF(), "docId")
      .select(col("commit"), col("score"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet

  /** batch + one streamed segment + a live tombstone delta — every artifact
    * class a snapshot must carry.
    */
  private def freshIndex(seed: Long): (String, IndexBuilder.Handle) = {
    import spark.implicits._
    val all = (0 until 60).map(i => Corpus.synthDoc(i, seed))
    val idx = tmpDir("graft-snap-src")
    val h = IndexBuilder.build(spark, all.take(45).toDS(), idx,
      IndexBuilder.Config(salts = 4))
    StreamingIngest.appendSegment(spark, all.drop(45).toDS(), 0L, idx,
      h.stats(spark).avgdl, 4, 1L << 40)
    val dead = h.docmeta(spark).collect().map(_.docId).filter(_ % 5 == 0).toSeq
    Compactor.tombstone(spark, idx, dead.toDF("docId"))
    (idx, h)
  }

  test("snapshot pins one state: opens as an index, identical results, later mutations isolated") {
    import spark.implicits._
    val (idx, h) = freshIndex(91L)
    val snap = tmpDir("graft-snap-dest")
    val n = Snapshotter.snapshot(spark, idx, snap)
    assert(n > 0 && Fs.exists(s"$snap/${Snapshotter.DoneMarker}"))
    val before = queries.map(q => q -> byCommit(h, q)).toMap

    // the snapshot dir IS an index: same live segments, same tombstones,
    // bit-identical results
    val hs = IndexBuilder.openHandle(snap)
    assert(hs.segmentDirs.size == h.segmentDirs.size)
    assert(hs.snapshot.tombstoneDirs.size == h.snapshot.tombstoneDirs.size)
    for (q <- queries) assert(byCommit(hs, q) == before(q), s"snapshot differs for '$q'")

    // verify passes on the intact snapshot
    assert(Snapshotter.verify(spark, snap).isEmpty)

    // mutate the SOURCE (more deletes + a compacting fold): the snapshot's
    // results must not move — it pinned the pre-mutation state
    val more = h.docmeta(spark).collect().map(_.docId).filter(_ % 5 == 1).toSeq
    Compactor.tombstone(spark, idx, more.toDF("docId"))
    val hc = Compactor.compact(spark, idx)
    assert(byCommit(hc, "the") != before("the"), "fixture vacuous: mutation must change the source")
    for (q <- queries) assert(byCommit(IndexBuilder.openHandle(snap), q) == before(q),
      s"source mutation leaked into the snapshot for '$q'")

    // guard: a non-empty destination is refused
    intercept[IllegalArgumentException] { Snapshotter.snapshot(spark, idx, snap) }
  }

  test("restore re-verifies every byte; epoch snapshots carry CURRENT; corruption refused") {
    import spark.implicits._
    val (idx, h) = freshIndex(92L)
    val hc = Compactor.compact(spark, idx) // epoch layout (CURRENT pointer)
    val dead2 = hc.docmeta(spark).collect().map(_.docId).filter(_ % 7 == 2).toSeq
    Compactor.tombstone(spark, idx, dead2.toDF("docId")) // epoch-scoped tombstones
    val want = queries.map(q => q -> byCommit(IndexBuilder.openHandle(idx), q)).toMap

    val snap = tmpDir("graft-snap-epoch")
    Snapshotter.snapshot(spark, idx, snap)
    assert(Fs.readString(s"$snap/CURRENT").isDefined, "epoch snapshot must carry CURRENT")

    val restored = tmpDir("graft-snap-restored")
    val n = Snapshotter.restore(spark, snap, restored)
    assert(n > 0)
    // restore materializes an INDEX, not another snapshot
    assert(!Fs.exists(s"$restored/${Snapshotter.ManifestName}"))
    assert(!Fs.exists(s"$restored/${Snapshotter.DoneMarker}"))
    val hr = IndexBuilder.openHandle(restored)
    for (q <- queries) assert(byCommit(hr, q) == want(q), s"restore differs for '$q'")

    // corrupt ONE byte of one data file: verify names it, restore refuses
    val victim = Snapshotter.readManifest(snap)._2
      .find(e => e.rel.contains("parquet") && e.len > 8).get
    val p = java.nio.file.Paths.get(s"$snap/${victim.rel}")
    val bytes = java.nio.file.Files.readAllBytes(p)
    bytes(4) = (bytes(4) ^ 0x5a).toByte
    java.nio.file.Files.write(p, bytes)
    val bad = Snapshotter.verify(spark, snap)
    assert(bad == Seq(victim.rel), s"verify must name exactly the corrupt file, got $bad")
    intercept[Exception] {
      Snapshotter.restore(spark, snap, tmpDir("graft-snap-restored2"))
    }
  }

  test("CLI: snapshot / verify-snapshot / restore round-trip") {
    val (idx, h) = freshIndex(94L)
    val snap = tmpDir("graft-snap-cli")
    val dest = tmpDir("graft-snap-cli-restored")
    Cli.run(spark, Seq("snapshot", idx, snap))
    Cli.run(spark, Seq("verify-snapshot", snap))
    Cli.run(spark, Seq("restore", snap, dest))
    assert(byCommit(IndexBuilder.openHandle(dest), "the") == byCommit(h, "the"))
  }

  test("incomplete snapshots are refused; manifest round-trips") {
    val (idx, _) = freshIndex(93L)
    val snap = tmpDir("graft-snap-partial")
    Snapshotter.snapshot(spark, idx, snap)
    val (epoch, entries) = Snapshotter.readManifest(snap)
    assert(epoch.isEmpty, "pre-compact fixture is genesis layout")
    assert(entries.nonEmpty && entries.map(_.rel).distinct.size == entries.size)
    // nothing transient captured: no lock, no gc ledger, no nested manifest
    assert(!entries.exists(e => e.rel.startsWith("_MAINT") || e.rel == "_gc" ||
      e.rel == Snapshotter.ManifestName || e.rel == Snapshotter.DoneMarker))
    // strip the marker: restore must refuse the partial copy
    Fs.delete(s"$snap/${Snapshotter.DoneMarker}")
    intercept[IllegalArgumentException] {
      Snapshotter.restore(spark, snap, tmpDir("graft-snap-x"))
    }
    intercept[IllegalArgumentException] { Snapshotter.verify(spark, snap) }
  }
}
