package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[PlanAudit.windowOverSinglePartition]] underpins 13 audit rows — it
  * must catch the pattern through arbitrary wrapper nesting (the r9
  * review's false-negative: a fixed 3-line lookback missed AQE/codegen
  * wrapper lines between the Window and its exchange) and must NOT flag
  * the benign SinglePartition above a partial scalar aggregate. */
class PlanAuditDetectorSpec extends AnyFunSuite {
  private val det = PlanAudit.windowOverSinglePartition _

  test("direct Window <- Sort <- SinglePartition is flagged") {
    assert(det(
      """Window [sum(x) windowspecdefinition(...)], [y ASC]
        |+- *(2) Sort [y ASC NULLS FIRST], false, 0
        |   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=5]
        |      +- *(1) Project [x, y]""".stripMargin))
  }

  test("wrapper nesting (WSCG/InputAdapter/AQE stages) cannot hide the pattern") {
    assert(det(
      """Window [row_number() ...], [y ASC]
        |+- WholeStageCodegen (4)
        |   +- InputAdapter
        |      +- AQEShuffleRead coalesced
        |         +- ShuffleQueryStage 2
        |            +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]
        |               +- *(1) Project [x, y]""".stripMargin))
    assert(det(
      """*(3) Sort [y ASC NULLS FIRST], false, 0
        |+- InputAdapter
        |   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=2]
        |      +- *(1) Project [y]""".stripMargin))
  }

  test("pass-through Project/Filter between the Sort/Window and the " +
    "exchange cannot hide the pattern (r9 advice false-negative)") {
    assert(det(
      """Window [row_number() ...], [y ASC]
        |+- *(2) Sort [y ASC NULLS FIRST], false, 0
        |   +- *(2) Project [x, y]
        |      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=5]
        |         +- *(1) Project [x, y, z]""".stripMargin))
    assert(det(
      """*(3) Sort [y ASC NULLS FIRST], false, 0
        |+- *(3) Filter (x > 0)
        |   +- WholeStageCodegen (2)
        |      +- InputAdapter
        |         +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=7]
        |            +- *(1) Project [x, y]""".stripMargin))
    // a Project above a SinglePartition with NO window/sort anywhere
    // above it stays benign (e.g. final projection of a scalar agg)
    assert(!det(
      """*(2) Project [s]
        |+- *(2) HashAggregate(keys=[], functions=[sum(x)])
        |   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=3]
        |      +- *(1) HashAggregate(keys=[], functions=[partial_sum(x)])""".stripMargin))
  }

  test("SinglePartition above a partial scalar aggregate is benign") {
    assert(!det(
      """*(2) HashAggregate(keys=[], functions=[sum(x)])
        |+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=3]
        |   +- *(1) HashAggregate(keys=[], functions=[partial_sum(x)])
        |      +- *(1) Project [x]""".stripMargin))
    assert(!det(
      """*(2) HashAggregate(keys=[], functions=[count(1)])
        |+- ShuffleQueryStage 1
        |   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=3]
        |      +- *(1) HashAggregate(keys=[], functions=[partial_count(1)])""".stripMargin))
  }

  test("hash-partitioned windows never flag; sibling subtrees don't bleed") {
    assert(!det(
      """Union
        |:- Window [...], [grp], [y ASC]
        |:  +- *(2) Sort [grp ASC, y ASC], false, 0
        |:     +- Exchange hashpartitioning(grp, 8)
        |:        +- *(1) Project [x]
        |+- *(4) HashAggregate(keys=[], functions=[sum(x)])
        |   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]
        |      +- *(3) HashAggregate(keys=[], functions=[partial_sum(x)])""".stripMargin))
  }
}
