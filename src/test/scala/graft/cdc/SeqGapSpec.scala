package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** o25's gap detection on a SYNTHETIC gapped log — the registry
  * testdata is gap-free, so this spec is where missing offsets are
  * actually detected: known holes, a redelivered duplicate (which must
  * NOT shrink the missing count), and a block with only one event.
  */
class SeqGapSpec extends SparkSpec {

  test("o25 counts known holes; duplicates don't mask them") {
    import spark.implicits._
    // block 0: 0..999 with 997, 998 missing and 5 delivered twice
    // block 1: 1000..1999 complete
    // block 2: only offset 2500 present (span 1, nothing missing)
    val seqs = ((0L until 1000L).filterNot(s => s == 997L || s == 998L) :+ 5L) ++
      (1000L until 2000L) :+ 2500L
    val got = CdcQueries.seqGapsFrom(seqs.toDF("event_id"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(0L) == ((0L, 999L, 998L, 2L)), s"block 0: ${got(0L)}")
    assert(got(1L) == ((1000L, 1999L, 1000L, 0L)), s"block 1: ${got(1L)}")
    assert(got(2L) == ((2500L, 2500L, 1L, 0L)), s"block 2: ${got(2L)}")
    assert(got.keySet == Set(0L, 1L, 2L))
  }
}
