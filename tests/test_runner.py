from __future__ import annotations

import pytest

from lion_parcel_etl_spark.runner import CycleError, Pipeline, TaskFailed


def _mk(order):
    def fn(name):
        return lambda ctx: order.append(name)

    return fn


def test_topo_order_and_full_run():
    order = []
    f = _mk(order)
    p = (
        Pipeline("e1")
        .task("scd", f("scd"), deps=["stage"], tags={"retail"})
        .task("stage", f("stage"), tags={"retail"})
        .task("bonus_stg", f("bonus_stg"), tags={"bonus"})
        .task("bonus_prod", f("bonus_prod"), deps=["bonus_stg"], tags={"bonus"})
    )
    timings = p.run({})
    assert set(timings) == {"scd", "stage", "bonus_stg", "bonus_prod"}
    assert order.index("stage") < order.index("scd")
    assert order.index("bonus_stg") < order.index("bonus_prod")


def test_tag_selection_pulls_upstream_deps():
    order = []
    f = _mk(order)
    p = (
        Pipeline()
        .task("stage", f("stage"), tags={"staging"})
        .task("mart", f("mart"), deps=["stage"], tags={"mart"})
        .task("other", f("other"), tags={"elsewhere"})
    )
    p.run({}, tags={"mart"})
    assert order == ["stage", "mart"]  # upstream pulled in, 'other' not


def test_fail_fast_names_task():
    def boom(ctx):
        raise ValueError("nope")

    p = Pipeline().task("a", lambda c: None).task("b", boom, deps=["a"])
    with pytest.raises(TaskFailed) as ei:
        p.run({})
    assert ei.value.task == "b"


def test_cycle_detected():
    p = (
        Pipeline()
        .task("a", lambda c: None, deps=["b"])
        .task("b", lambda c: None, deps=["a"])
    )
    with pytest.raises(CycleError):
        p.run({})


def test_ctx_shared_state():
    p = Pipeline().task("w", lambda c: c.setdefault("hits", []).append(1))
    ctx: dict = {}
    p.run(ctx)
    assert ctx["hits"] == [1]


def test_retries_recover_flaky_task():
    from lion_parcel_etl_spark.runner import Pipeline

    calls = {"n": 0}

    def flaky(ctx):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")

    p = Pipeline("r").task("flaky", flaky, retries=2)
    timings = p.run({})
    assert calls["n"] == 3 and "flaky" in timings


def test_retries_exhausted_raises_taskfailed():
    from lion_parcel_etl_spark.runner import Pipeline, TaskFailed
    import pytest

    calls = {"n": 0}

    def always_fails(ctx):
        calls["n"] += 1
        raise RuntimeError("permanent")

    p = Pipeline("r").task("bad", always_fails, retries=2)
    with pytest.raises(TaskFailed):
        p.run({})
    assert calls["n"] == 3
