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
