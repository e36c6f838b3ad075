"""Native task-runtime contract tests.

Mirror of the reference's assert-based runtime unit tests:
test/multigpu/cutask.c:24-54 (create/execute/destroy incl. error cases) and
test/multigpu/cumultigpu.c:30-48 (pool create/run/sync/out-of-range index).
"""

import threading
import time

import pytest

from cholesky_tpu.runtime import Task, TaskPool, TaskPoolError


def test_task_execute_and_join():
    hits = []
    t = Task(lambda: hits.append(1) or 7)
    t.execute()
    assert t.join() == 7
    assert hits == [1]


def test_task_join_returns_result_once():
    t = Task(lambda: 3)
    t.execute()
    assert t.join() == 3
    assert t.join() == 3  # cached after destroy


def test_pool_runs_on_workers():
    # task return values are status codes (the reference's CUresult
    # contract): 0 = success, nonzero is latched as a worker error.
    # Payload results travel through the closure.
    with TaskPool(4) as pool:
        assert pool.n_workers == 4
        ids = []
        lock = threading.Lock()

        def work(i):
            def fn():
                with lock:
                    ids.append((i, threading.get_ident()))
                return 0
            return fn

        results = pool.map([work(i) for i in range(16)])
        assert results == [0] * 16
        assert sorted(i for i, _ in ids) == list(range(16))
        # work landed on native threads, not the caller
        assert all(tid != threading.get_ident() for _, tid in ids)


def test_pool_join_blocks_until_complete():
    with TaskPool(1) as pool:
        done = threading.Event()

        def slow():
            time.sleep(0.2)
            done.set()
            return 0

        t = pool.run(0, slow)
        assert t.join() == 0
        assert done.is_set()


def test_pool_out_of_range_worker():
    # reference cumultigpu.c:44-48 — running on an out-of-range context
    # index must fail with invalid-value
    with TaskPool(2) as pool:
        with pytest.raises(TaskPoolError):
            pool.run(5, lambda: 0)
        with pytest.raises(TaskPoolError):
            pool.run(-1, lambda: 0)


def test_pool_invalid_create():
    with pytest.raises(TaskPoolError):
        TaskPool(0)


def test_sequential_pool_is_inline_and_deterministic():
    # the libcumultigpu_seq.a analog: same API, execute inline
    with TaskPool(3, sequential=True) as pool:
        order = []
        tid = threading.get_ident()
        inline = []

        def work(i):
            def fn():
                order.append(i)
                inline.append(threading.get_ident() == tid)
                return 0
            return fn

        pool.map([work(i) for i in range(9)])
        assert order == list(range(9))       # strict submission order
        assert all(inline)                   # ran on the caller's thread


def test_worker_error_latched_and_reported_at_destroy():
    # reference multigpu.c:139-159 — first worker error reported at destroy
    pool = TaskPool(2)
    t = pool.run(0, lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    assert t.join() == 4  # CTP_ERROR_WORKER_FAILED from the trampoline
    with pytest.raises(TaskPoolError):
        pool.close()


def test_synchronize_barrier():
    with TaskPool(2) as pool:
        state = []
        pool.run(0, lambda: state.append("a") or 0)
        pool.run(1, lambda: state.append("b") or 0)
        pool.synchronize()
        assert sorted(state) == ["a", "b"]
