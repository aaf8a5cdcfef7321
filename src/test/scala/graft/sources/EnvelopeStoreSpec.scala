package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Unit spec for the store seam extracted from the DSv2 source:
  * KeySlice byte bounds (the HBasePartitioner contract), VersionSelect
  * winner arithmetic (Scan.setTimeRange + one-version semantics), the
  * fixture store's pruning behavior, and the HFile sketch's explicit
  * unsupported-ness (it must FAIL, not silently return nothing). */
class EnvelopeStoreSpec extends AnyFunSuite {

  test("KeySlice covers the signed byte space exactly, no overlap") {
    val slices = (0 until 256 / 8).map(KeySlice(_, 8))
    assert(slices.head.startByte === -128)
    assert(slices.last.stopByte === 128)
    slices.sliding(2).foreach { case Seq(a, b) =>
      assert(a.stopByte === b.startByte, s"$a / $b adjacency")
    }
    assert(slices.map(s => s.stopByte - s.startByte).distinct === Seq(8))
  }

  test("VersionSelect returns the latest IN-RANGE version only") {
    import VersionSelect.latestIn
    // 3 versions at ts 1000,1001,1002; range covers all -> latest (v2)
    assert(latestIn(3L, 1000L, TsRange(0L, 5000L)) === Some(2L))
    // range caps at 1001: the newer v2 is OUT of range, v1 wins
    assert(latestIn(3L, 1000L, TsRange(0L, 1001L)) === Some(1L))
    // range floor above every version: nothing
    assert(latestIn(3L, 1000L, TsRange(1003L, 5000L)) === None)
    // range ceiling below every version: nothing
    assert(latestIn(3L, 1000L, TsRange(0L, 999L)) === None)
    // exact single-point range on the base version
    assert(latestIn(1L, 1000L, TsRange(1000L, 1000L)) === Some(0L))
  }

  test("fixture store scans only its slice and applies ts pruning") {
    val store = FixtureEnvelopeStore(n = 512L, corrupt = false,
      tsSpread = 10L, versions = 1)
    val all = (0 until 256 / 8).flatMap(i =>
      store.scan(KeySlice(i, 8), TsRange.All).toSeq)
    assert(all.size === 512, "every key appears in exactly one slice")
    assert(all.map(c => c.hbaseId.toSeq).distinct.size === 512)
    // ts pruning: tsSpread=10 puts key i at CellTimestamp + i%10 —
    // restricting to offset 0 keeps exactly the i%10==0 keys
    val t0 = graft.pipeline.Fixture.CellTimestamp
    val pruned = (0 until 256 / 8).flatMap(i =>
      store.scan(KeySlice(i, 8), TsRange(t0, t0)).toSeq)
    assert(pruned.size === 512 / 10 + (if (512 % 10 > 0) 1 else 0))
    assert(pruned.forall(_.ts === t0))
  }

  test("multi-version store: winner ts matches VersionSelect") {
    val store = FixtureEnvelopeStore(n = 64L, corrupt = false,
      tsSpread = 0L, versions = 4)
    val t0 = graft.pipeline.Fixture.CellTimestamp
    val cells = (0 until 256 / 8).flatMap(i =>
      store.scan(KeySlice(i, 8), TsRange(0L, t0 + 1L)).toSeq)
    // keys with 1 + (i % 4) versions, range caps at t0+1: every key
    // yields its min(numVersions-1, 1) version
    assert(cells.size === 64)
    assert(cells.forall(c => c.ts === t0 || c.ts === t0 + 1L))
  }

  test("the HFile snapshot sketch refuses to scan without a runtime") {
    val sketch = new HFileSnapshotStoreSketch("/nonexistent/snapshot")
    intercept[UnsupportedOperationException] {
      sketch.scan(KeySlice(0, 8), TsRange.All)
    }
  }
}
