"""Tiered merge planner vs the reference's published behavior
(/root/reference/index/scorch/mergeplan/merge_plan.go + test vectors
from merge_plan_test.go:209-249). Pure-python, no Spark."""

from bleve_spark.index.mergeplan import (
    DEFAULT_OPTIONS,
    MergePlanOptions,
    Segment,
    calc_budget,
    plan,
    plan_from_manifests,
)


def test_calc_budget_reference_vectors():
    # merge_plan_test.go:216-249
    empty = MergePlanOptions(
        max_segments_per_tier=0, max_segment_size=0, tier_growth=0,
        segments_per_merge_task=0, floor_segment_size=0,
    )
    assert calc_budget(0, 0, empty) == 0
    assert calc_budget(1, 0, empty) == 1
    assert calc_budget(9, 0, empty) == 9
    o1 = MergePlanOptions(
        max_segments_per_tier=1, max_segment_size=1000, tier_growth=2.0,
        segments_per_merge_task=2, floor_segment_size=1,
    )
    assert calc_budget(1, 1, o1) == 1
    assert calc_budget(21, 1, o1) == 5
    o2 = MergePlanOptions(
        max_segments_per_tier=2, max_segment_size=1000, tier_growth=2.0,
        segments_per_merge_task=2, floor_segment_size=1,
    )
    assert calc_budget(21, 1, o2) == 7


def test_no_plan_for_single_segment():
    assert plan([Segment(0, 100)]).tasks == []


def test_many_small_segments_get_merged():
    segs = [Segment(i, 100) for i in range(40)]
    p = plan(segs, DEFAULT_OPTIONS)
    assert p.tasks, "40 floor-size segments must trigger merging"
    for t in p.tasks:
        assert 2 <= len(t) <= DEFAULT_OPTIONS.segments_per_merge_task
    merged = [s.id for t in p.tasks for s in t]
    assert len(merged) == len(set(merged))  # disjoint rosters


def test_oversized_segments_left_alone():
    big = DEFAULT_OPTIONS.max_segment_size  # > max/2 → ineligible
    segs = [Segment(i, big) for i in range(20)]
    assert plan(segs, DEFAULT_OPTIONS).tasks == []


def test_under_budget_no_merge():
    # 5 segments in one tier with per-tier budget 10 → no merging
    segs = [Segment(i, 2000) for i in range(5)]
    assert plan(segs, DEFAULT_OPTIONS).tasks == []


def test_plan_from_manifests_roundtrip():
    ms = [{"segment_id": i, "doc_count": 50} for i in range(30)]
    rosters = plan_from_manifests(ms)
    assert rosters and all(len(r) >= 2 for r in rosters)
    assert all(isinstance(i, int) for r in rosters for i in r)
