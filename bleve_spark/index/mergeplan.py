"""Tiered merge planner — the reference's policy, restated from its
observable behavior (/root/reference/index/scorch/mergeplan/
merge_plan.go: defaults :159-167, CalcBudget :397-428, ScoreSegments
:446-477, plan loop :238-393). Lucene-TieredMergePolicy-style: climb a
logarithmic tier staircase to budget how many segments SHOULD exist;
while over budget, pick the lowest-scoring contiguous roster (by
live-size-descending order) of ≤ segments_per_merge_task segments and
emit it as a merge task.

Deletes are live: plan_from_manifests subtracts per-segment deleted
counts (parquet delete files, segments.py deleted_counts) so
live_size = doc_count − deleted, and the reclaim_deletes_weight term
actively prioritizes delete-heavy rosters, as in the reference.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field as dc_field


@dataclass
class Segment:
    id: int
    full_size: int
    live_size: int | None = None

    def __post_init__(self):
        if self.live_size is None:
            self.live_size = self.full_size


@dataclass
class MergePlanOptions:
    max_segments_per_tier: int = 10
    max_segment_size: int = 5_000_000
    tier_growth: float = 10.0
    segments_per_merge_task: int = 10
    floor_segment_size: int = 2_000
    reclaim_deletes_weight: float = 2.0

    def raise_to_floor(self, s: int) -> int:
        return s if s > self.floor_segment_size else self.floor_segment_size


DEFAULT_OPTIONS = MergePlanOptions()

SINGLE_SEGMENT_OPTIONS = MergePlanOptions(
    max_segments_per_tier=1,
    max_segment_size=1 << 30,
    tier_growth=1.0,
    segments_per_merge_task=10,
    floor_segment_size=1 << 30,
)


def calc_budget(total_size: int, first_tier_size: int,
                o: MergePlanOptions) -> int:
    """#segments the staircase allows for ``total_size``
    (merge_plan.go:397-428)."""
    tier_size = max(first_tier_size, 1)
    per_tier = max(o.max_segments_per_tier, 1)
    growth = max(o.tier_growth, 1.0)
    budget = 0
    while total_size > 0:
        in_tier = total_size / tier_size
        if in_tier < per_tier:
            budget += math.ceil(in_tier)
            break
        budget += per_tier
        total_size -= per_tier * tier_size
        tier_size = int(tier_size * growth)
    return budget


def score_segments(roster: list[Segment], o: MergePlanOptions) -> float:
    """Lower is better (merge_plan.go:446-477): balance × gentle size
    penalty × strong delete-reclaim preference."""
    tot_before = sum(s.full_size for s in roster)
    tot_after = sum(s.live_size for s in roster)
    tot_after_floored = sum(
        o.raise_to_floor(s.live_size) for s in roster
    )
    if tot_before <= 0 or tot_after <= 0 or tot_after_floored <= 0:
        return 0.0
    balance = o.raise_to_floor(roster[0].live_size) / tot_after_floored
    score = balance * (tot_after ** 0.05)
    non_del_ratio = tot_after / tot_before
    return score * (non_del_ratio ** o.reclaim_deletes_weight)


@dataclass
class MergePlan:
    tasks: list[list[Segment]] = dc_field(default_factory=list)


def plan(segments: list[Segment],
         o: MergePlanOptions | None = None) -> MergePlan:
    """merge_plan.go:238-393 without the vector/file-size currency (no
    vector segments in this engine)."""
    o = o or DEFAULT_OPTIONS
    rv = MergePlan()
    if len(segments) <= 1:
        return rv
    segs = sorted(segments, key=lambda s: -s.live_size)

    eligibles = [s for s in segs if s.live_size < o.max_segment_size / 2]
    if not eligibles:
        return rv
    min_live = min(s.live_size for s in segs)
    total_live = sum(s.live_size for s in eligibles)
    budget = calc_budget(total_live, o.raise_to_floor(min_live), o)

    empties = [s for s in eligibles if s.live_size <= 0]
    if empties:
        rv.tasks.append(empties)
        eligibles = [s for s in eligibles if s not in empties]

    n_tasks = 0
    while eligibles and (len(eligibles) + n_tasks) > budget:
        best: tuple[float, list[Segment]] | None = None
        for start in range(len(eligibles)):
            roster: list[Segment] = []
            roster_live = 0
            for s in eligibles[start:]:
                if len(roster) >= o.segments_per_merge_task:
                    break
                if roster_live + s.live_size >= o.max_segment_size:
                    continue
                roster.append(s)
                roster_live += s.live_size
            if not roster:
                continue
            sc = score_segments(roster, o)
            if best is None or _better(roster, sc, best[1], best[0]):
                best = (sc, roster)
        if best is None:
            return rv
        roster = best[1]
        # valid merges only: ≥2 segments, or 1 segment with deletes
        if len(roster) > 1 or roster[0].live_size < roster[0].full_size:
            rv.tasks.append(roster)
            n_tasks += 1
        eligibles = [s for s in eligibles if s not in roster]
    return rv


def _better(roster_a, score_a, roster_b, score_b) -> bool:
    """rosterCandidate.betterThan (merge_plan.go:210-231): prefer
    multi-segment rosters over a fully-live singleton."""
    if len(roster_a) > 1 and len(roster_b) == 1:
        solo = roster_b[0]
        if solo.live_size == solo.full_size:
            return True
    if len(roster_a) == 1 and len(roster_b) > 1:
        solo = roster_a[0]
        if solo.live_size == solo.full_size:
            return False
    return score_a < score_b


def plan_from_manifests(
    manifests: list[dict],
    o: MergePlanOptions | None = None,
    deleted: dict[int, int] | None = None,
) -> list[list[int]]:
    """Segment-id rosters to merge, from store manifests.
    ``deleted`` maps segment_id → #deleted docs (live = full −
    deleted), which drives the delete-reclaim scoring term."""
    deleted = deleted or {}
    segs = [
        Segment(
            id=m["segment_id"],
            full_size=int(m["doc_count"]),
            live_size=int(m["doc_count"])
            - int(deleted.get(m["segment_id"], 0)),
        )
        for m in manifests
    ]
    return [[s.id for s in task] for task in plan(segs, o).tasks]
