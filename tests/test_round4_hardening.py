"""Round-4 hardening: whole-registry physical-plan audit.

An unpartitioned WindowExec is the classic silent scale killer — every
row funnels through ONE task regardless of cluster size.  Round 3's
only offender was ``curation_funnel``'s report windows (benign but
noisy: they spammed "No Partition Defined for Window operation" over
every bench run); those are gone (driver-side pass over the rules+1
report rows).  This audit locks the invariant for every registered
query: NO physical plan may contain a Window node with an empty
partition spec — so a future regression shows up as a red test, not as
one warning line lost in log noise.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"


def _window_nodes(df):
    """(simpleName, partitionSpec-is-empty) for every Window node in
    the physical plan, descending through AQE wrappers."""
    out = []
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        n = stack.pop()
        name = n.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            stack.append(n.inputPlan())
        if "Window" in name and hasattr(n, "partitionSpec"):
            out.append((name, n.partitionSpec().isEmpty()))
        ch = n.children()
        for i in range(ch.length()):
            stack.append(ch.apply(i))
    return out


@pytest.mark.slow
def test_no_query_plan_has_unpartitioned_window(spark):
    import __spark_entry__ as entry

    offenders = {}
    for name, fn in entry.queries().items():
        df = fn(spark, SF_DIR)
        bad = [w for w, empty in _window_nodes(df) if empty]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"unpartitioned Window nodes (single-task at any cluster size): "
        f"{offenders}"
    )
