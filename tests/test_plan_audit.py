"""Physical-plan guardrails for the whole query registry.

An unpartitioned Window funnels its entire input through ONE task — a
single-node choke point that a local bench never surfaces but a
1000-executor cluster dies on.  This suite fails if anyone reintroduces
one outside the documented bounded-cardinality sites.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.audit_plans import _top_level_groups, global_windows

from .conftest import SF_SMOKE

# Global (unpartitioned) Window nodes that are ALLOWED because their
# input frame is bounded by construction, independent of corpus size;
# each count is pinned so growth fails the test.
ALLOWED_GLOBAL_WINDOWS = {
    # k-means seeding: windows run post-.limit(16) (operators/
    # similarity.py) — a 16-row frame at any scale.
    "ann_ivf_topk": 2,
    # IVF-PQ: the same post-.limit(8) seed window, duplicated per
    # unshared centroid subtree (residual build, probe scoring, the
    # assignment inside ivf_assign) — every copy is an 8-row frame.
    "ann_ivfpq_topk": 7,
    "cluster_kmeans": 1,
    "dedup_semantic": 3,
    "sample_cluster_balanced": 1,
    # token-budget selection: the cumulative window runs over the
    # quality-band aggregate (<= 10^4 + 1 rows; queries/llm.py).
    "select_token_budget": 1,
}


def test_bracket_group_parser():
    assert _top_level_groups("[a], [b ASC NULLS FIRST]") == [
        "a",
        "b ASC NULLS FIRST",
    ]
    assert _top_level_groups("[f(x[1]) AS y], [p], [o DESC NULLS LAST]") == [
        "f(x[1]) AS y",
        "p",
        "o DESC NULLS LAST",
    ]


def test_global_window_detector():
    part_only = "+- Window [count(1) windowspecdefinition(g#1L, specifiedwindowframe(RowFrame, unboundedpreceding$(), unboundedfollowing$())) AS r#2L], [g#1L]"
    order_only = "+- Window [row_number() windowspecdefinition(id#0L ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS r#4], [id#0L ASC NULLS FIRST]"
    part_order = "+- Window [row_number() windowspecdefinition(g#1L, id#0L ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS r#6], [g#1L], [id#0L ASC NULLS FIRST]"
    assert global_windows(part_only) == 0
    assert global_windows(order_only) == 1
    assert global_windows(part_order) == 0
    assert global_windows("\n".join([part_only, order_only, part_order])) == 1


def test_no_unbounded_global_windows(spark):
    """Every registry query's physical plan: no global Window beyond
    the pinned allowlist.  Plan construction only — no job runs except
    the few queries that execute eagerly while building (k-means /
    PageRank convergence loops), which are tiny at sf0.001."""
    from rc_scanner_spark.queries import build_registry

    bad: dict[str, int] = {}
    for name, spec in sorted(build_registry().items()):
        df = spec.fn(spark, SF_SMOKE)
        plan = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        g = global_windows(plan)
        if g != ALLOWED_GLOBAL_WINDOWS.get(name, 0):
            bad[name] = g
    assert not bad, (
        f"unpartitioned Window outside allowlist (or allowlist drift): {bad}"
    )
