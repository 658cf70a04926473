package graft.tools
import org.scalatest.funsuite.AnyFunSuite

/** Pins the quadratic-shape detector's NOT(attr = attr) scan — the
  * round-8 regex missed cast-wrapped attributes (`NOT (cast(a#1 as
  * bigint) = b#2)`), so a BNLJ all-pairs-except-self join could evade
  * the audit by widening one side.
  */
class PlanAuditSpec extends AnyFunSuite {

  test("bare not-equal on two attrs is flagged") {
    assert(PlanAudit.notEqualOnAttrsHit(
      "BroadcastNestedLoopJoin BuildRight, Inner, NOT (id1#12L = id2#34L)"))
  }

  test("cast-wrapped attr on either side is flagged (round-8 evasion)") {
    assert(PlanAudit.notEqualOnAttrsHit(
      "BroadcastNestedLoopJoin BuildRight, Inner, " +
        "NOT (cast(a#1 as bigint) = b#2L)"))
    assert(PlanAudit.notEqualOnAttrsHit(
      "BroadcastNestedLoopJoin BuildRight, Inner, " +
        "NOT (a#1L = coalesce(b#2L, c#3L))"))
    assert(PlanAudit.notEqualOnAttrsHit(
      "NOT (cast(substring(x#7, 1, 3) as int) = cast(y#9 as int))"))
  }

  test("not-equal against a literal is NOT flagged (probe filters)") {
    assert(!PlanAudit.notEqualOnAttrsHit("NOT (id1#12L = 5)"))
    assert(!PlanAudit.notEqualOnAttrsHit("NOT (cast(a#1 as bigint) = 42)"))
    assert(!PlanAudit.notEqualOnAttrsHit("NOT (lang#3 = en)"))
  }

  test("equality nested INSIDE a function arg is not a top-level split") {
    // the = lives one paren level down; the top level has no split, so
    // this is not the all-pairs-except-self shape
    assert(!PlanAudit.notEqualOnAttrsHit(
      "NOT (if ((a#1L = b#2L)) x else y)".replace("if", "iff")))
  }

  test("no NOT group, or unbalanced tail, never throws or flags") {
    assert(!PlanAudit.notEqualOnAttrsHit("BroadcastHashJoin [a#1L], [b#2L]"))
    assert(!PlanAudit.notEqualOnAttrsHit("NOT (a#1L = b#2L"))
    assert(!PlanAudit.notEqualOnAttrsHit(""))
  }

  test("unpartitioned-window detector: partition spec vs order spec") {
    // real plan-string shapes (trimmed lines from executedPlan.toString)
    // unpartitioned + ordered: 2 groups, last is an order spec
    assert(PlanAudit.unpartitionedWindowHit(
      "+- Window [row_number() windowspecdefinition(x#15 DESC NULLS LAST, " +
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), " +
        "currentrow$())) AS rn#16], [x#15 DESC NULLS LAST]"))
    // unpartitioned frame-only (partitionBy() totals): 1 group
    assert(PlanAudit.unpartitionedWindowHit(
      "+- Window [sum(x#15) windowspecdefinition(specifiedwindowframe(" +
        "RowFrame, unboundedpreceding$(), unboundedfollowing$())) AS s#20]"))
    // partitioned + ordered: 3 groups
    assert(!PlanAudit.unpartitionedWindowHit(
      "+- Window [row_number() windowspecdefinition(g#14, x#15 DESC NULLS " +
        "LAST, specifiedwindowframe(RowFrame, unboundedpreceding$(), " +
        "currentrow$())) AS rn#18], [g#14], [x#15 DESC NULLS LAST]"))
    // partitioned frame-only: 2 groups but the last is a bare attribute
    // list, NOT an order spec — the emb_margin_mine false positive the
    // first detector draft produced
    assert(!PlanAudit.unpartitionedWindowHit(
      "+- Window [sum(_w0#28L) windowspecdefinition(id#3L, " +
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), " +
        "unboundedfollowing$())) AS bk#26L], [id#3L]"))
    // multi-column partition spec, frame-only
    assert(!PlanAudit.unpartitionedWindowHit(
      "+- Window [count(__ch#1553) windowspecdefinition(k#1562L, " +
        "__cts#1548, specifiedwindowframe(RowFrame, unboundedpreceding$(), " +
        "unboundedfollowing$())) AS __n#1563L], [k#1562L, __cts#1548]"))
    // WindowGroupLimit and non-window nodes never match
    assert(!PlanAudit.unpartitionedWindowHit(
      "+- WindowGroupLimit [x#15 DESC NULLS LAST], rank(x#15), 5"))
    assert(!PlanAudit.unpartitionedWindowHit("+- Sort [x#15 DESC], false, 0"))
    assert(!PlanAudit.unpartitionedWindowHit(""))
  }

  test("unpartitioned-window census is a snapshot: new and stale names fail") {
    val ack = PlanAudit.unpartWindowAcknowledged.keySet
    assert(ack.nonEmpty, "the committed snapshot is not empty")
    assert(PlanAudit.objectAggDrift(ack, ack) == (Set.empty, Set.empty))
    // a query growing a corpus-sized Window.orderBy tomorrow is flagged
    // as unacknowledged, not silently absorbed
    val (fresh, _) = PlanAudit.objectAggDrift(ack + "sneaky_global_sort", ack)
    assert(fresh == Set("sneaky_global_sort"))
    // and an acknowledgement whose query stops planning one goes stale
    val dropped = ack.head
    val (_, stale) = PlanAudit.objectAggDrift(ack - dropped, ack)
    assert(stale == Set(dropped))
  }

  test("object-aggregate census is a snapshot: new and stale names fail") {
    val ack = PlanAudit.objectAggAcknowledged
    // the committed snapshot against itself: clean
    assert(PlanAudit.objectAggDrift(ack, ack) == (Set.empty, Set.empty))
    // a DELIBERATE new name (a query growing a collect_list) is flagged
    // as unacknowledged, not silently absorbed
    val (fresh, _) = PlanAudit.objectAggDrift(ack + "sneaky_new_query", ack)
    assert(fresh == Set("sneaky_new_query"))
    // a query that stops planning one leaves a stale acknowledgement,
    // which fails too (same rule as the join allowlist)
    val dropped = ack.head
    val (_, stale) = PlanAudit.objectAggDrift(ack - dropped, ack)
    assert(stale == Set(dropped))
  }
}
