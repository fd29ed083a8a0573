package graft.cdc

import graft.SparkSpec

/** o24's pairing logic against a SYNTHETIC log with known re-key events
  * — window edges, nearest-of-many selection, same-key exclusion and
  * insert-before-delete are each constructed explicitly, and the
  * expected pairs come from an independent sequential fold, not from
  * re-running the banded join.
  */
class KeyMigrationSpec extends SparkSpec {

  // (seq, key, type, payload). 'error' = delete, 'signup' = insert.
  private val rows = Seq(
    // plain migration: delete k1@10, insert k2@50, same payload A
    (10L, 1L, "error", "A"), (50L, 2L, "signup", "A"),
    // nearest-of-many: delete k3@100; inserts k4@150 and k5@120 (same
    // payload B) — the NEAREST following insert (120) must win
    (100L, 3L, "error", "B"), (150L, 4L, "signup", "B"), (120L, 5L, "signup", "B"),
    // window edge: delete k6@200, insert k7@400 — gap exactly W=200, in
    (200L, 6L, "error", "C"), (400L, 7L, "signup", "C"),
    // out of window: delete k8@500, insert k9@701 — gap 201 > W, out
    (500L, 8L, "error", "D"), (701L, 9L, "signup", "D"),
    // same key: delete k10@800, insert k10@820 — key unchanged, excluded
    (800L, 10L, "error", "E"), (820L, 10L, "signup", "E"),
    // insert BEFORE delete: k12@900 then delete k11@950 — no pair
    (900L, 12L, "signup", "F"), (950L, 11L, "error", "F"),
    // block-straddling: delete @199 (block 0), insert @201 (block 1) —
    // the +1-block posting must catch it
    (199L, 13L, "error", "G"), (201L, 14L, "signup", "G"),
    // noise: unrelated update-type events sharing payloads
    (55L, 20L, "click", "A"), (130L, 21L, "view", "B")
  )

  test("o24 pairs known migrations; window, tiebreak and exclusions exact") {
    import spark.implicits._
    val events = rows.toDF("event_id", "user_id", "event_type", "props")
    val got = CdcQueries.keyMigrationFrom(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    // independent fold: for every delete, the nearest following insert
    // with equal payload, a different key, gap in (0, 200]
    val dels = rows.filter(_._3 == "error")
    val ins = rows.filter(_._3 == "signup")
    val expected = dels.flatMap { case (ds, dk, _, dp) =>
      ins.filter { case (cs, ck, _, cp) =>
        cp == dp && cs > ds && cs - ds <= 200 && ck != dk
      }.sortBy(_._1).headOption.map { case (cs, ck, _, _) =>
        (ds, dk, ck, cs, cs - ds)
      }
    }.toSet

    assert(expected == Set(
      (10L, 1L, 2L, 50L, 40L),     // plain
      (100L, 3L, 5L, 120L, 20L),   // nearest of two
      (200L, 6L, 7L, 400L, 200L),  // window edge inclusive
      (199L, 13L, 14L, 201L, 2L)   // straddles a seq block
    ), s"fold self-check failed: $expected")
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }
}
