"""Blanket physical-plan audit over EVERY registered catalog query: no
scale anti-pattern may appear in any plan, not just the individually
plan-asserted ones (tests/test_plans.py pins specific positive properties;
this file pins global negative ones).

Checked per query at sf0.001 (plan shape is data-size-independent for
these properties):

- no ``CartesianProduct`` — an unconstrained all-pairs join is never
  acceptable; 1-row/k-row broadcast crossJoins lower to
  BroadcastNestedLoopJoin, which is allowed (bounded by the broadcast);
- no ``BatchEvalPython`` — row-at-a-time Python UDFs; every Python hop
  must be Arrow-vectorized (``ArrowEvalPython`` / ``MapInPandas`` /
  ``FlatMapGroupsInPandas``), per the engine's UDF discipline.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

_QUERIES = sorted(entry_mod.queries().items())


@pytest.mark.parametrize("name,fn", _QUERIES, ids=[n for n, _ in _QUERIES])
def test_no_scale_antipatterns_in_plan(spark, name, fn):
    plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
