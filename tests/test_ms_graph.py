"""Pledge-graph runtime tests (the libs/ms module.h semantics)."""
import threading

import pytest

from ma_tpu.ms import (
    Collector,
    CyclicQueue,
    FunctionModule,
    Lock,
    Module,
    Pledge,
    QueuePicker,
    Splitter,
    UnLock,
    parallel_graph,
    promise_me,
    simultaneous_get,
    value_pledge,
)


def test_lazy_memoized_get():
    calls = []

    def f(x):
        calls.append(x)
        return x * 2

    p = promise_me(FunctionModule(f), value_pledge(21))
    assert p.get() == 42
    assert p.get() == 42
    assert calls == [21]  # memoized
    p.reset()
    assert p.get() == 42
    assert calls == [21, 21]  # re-run after reset


def test_reset_invalidates_downstream_only_on_success():
    a = value_pledge(1)
    b = promise_me(FunctionModule(lambda x: x + 1), a)
    c = promise_me(FunctionModule(lambda x: x * 10), b)
    assert c.get() == 20
    a.set(5)
    a.reset()  # invalidates b, c
    assert c.get() == 60


def test_volatile_stream_to_collector():
    src = Splitter(range(5))
    col = Collector()
    stream = promise_me(src)
    sink = promise_me(col, promise_me(FunctionModule(lambda x: x * x), stream))
    simultaneous_get([sink], n_threads=0)
    assert sorted(col.collected) == [0, 1, 4, 9, 16]


def test_lock_unlock_pins_value_per_pass():
    src = Splitter(range(4))
    stream = promise_me(src)
    locked = promise_me(Lock(), stream)
    # use the locked value twice in one pass: both see the same item
    seen = []
    a = promise_me(FunctionModule(lambda x: ("a", x)), locked)
    b = promise_me(FunctionModule(lambda x: ("b", x)), locked)
    col = Collector()
    joined = promise_me(FunctionModule(lambda u, v: (u, v)), a, b)
    collected = promise_me(col, joined)
    sink = promise_me(UnLock(locked), collected)
    simultaneous_get([sink], n_threads=0)
    assert len(col.collected) == 4
    for (ua, va) in col.collected:
        assert ua[1] == va[1]  # same pinned item in both branches


def test_parallel_graph_replicas_share_splitter():
    src = Splitter(range(100))
    stream = promise_me(src)
    col = Collector()

    def setup(i):
        return promise_me(col, promise_me(FunctionModule(lambda x: x + 1), stream))

    sinks = parallel_graph(4, setup)
    simultaneous_get(sinks)
    assert sorted(col.collected) == list(range(1, 101))


def test_race_check_rejects_shared_unsafe_module():
    shared = promise_me(FunctionModule(lambda: object()))  # not lock-protected

    class Source(Module):
        def execute(self):
            return 1

    def setup(i):
        return promise_me(FunctionModule(lambda x: x), shared)

    shared._build_thread = 0  # built inside replica 0
    with pytest.raises(RuntimeError, match="race check"):
        parallel_graph(2, setup)


def test_exception_cancels_workers():
    src = Splitter(range(1000))
    stream = promise_me(src)

    def boom(x):
        if x == 5:
            raise ValueError("boom")
        return x

    def setup(i):
        return promise_me(FunctionModule(boom), stream)

    sinks = parallel_graph(3, setup)
    with pytest.raises(ValueError, match="boom"):
        simultaneous_get(sinks)


def test_cyclic_queue_drains_all_streams():
    q = CyclicQueue([iter(range(0, 5)), iter(range(10, 13)), iter(range(20, 24))])
    col = Collector()

    def setup(i):
        return promise_me(col, promise_me(QueuePicker(q)))

    sinks = parallel_graph(3, setup)
    simultaneous_get(sinks)
    assert sorted(col.collected) == [0, 1, 2, 3, 4, 10, 11, 12, 20, 21, 22, 23]


def test_exec_timers_accumulate():
    import time

    p = promise_me(FunctionModule(lambda: time.sleep(0.01) or 7))
    assert p.get() == 7
    assert p.exec_time >= 0.01
