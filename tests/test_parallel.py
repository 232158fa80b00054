"""Pool state-machine tests (reference ``test_parallel.py:42-242``):
auto-pool reuse, worker-flag propagation through real process pools,
fork-PID guard, nested-pool prevention."""

import concurrent.futures
import multiprocessing
import os

import pytest

import cotengra_tpu as ctg
import cotengra_tpu.parallel.pools as par


@pytest.fixture(autouse=True)
def _reset_pool_state():
    """Isolate each test: clear cached pools and worker/pid flags."""

    def reset():
        for pool in par._CACHED_POOLS.values():
            try:
                pool.shutdown(wait=False)
            except Exception:
                pass
        par._CACHED_POOLS.clear()
        par._POOL_PID = None
        par._IS_WORKER = False

    reset()
    yield
    reset()


def _check_worker_flag():
    return par.is_worker_process()


def _worker_auto_returns_none():
    return par.parse_parallel_arg("auto") is None


def _subprocess_probe(q):
    q.put(par.parse_parallel_arg("auto") is None)


def test_auto_creates_pool():
    pool = par.parse_parallel_arg("auto")
    assert pool is not None
    assert hasattr(pool, "submit")


def test_serial_values_return_none():
    assert par.parse_parallel_arg(False) is None
    assert par.parse_parallel_arg(None) is None


def test_pool_persists_across_calls():
    pool1 = par.parse_parallel_arg("auto")
    pool2 = par.parse_parallel_arg("auto")
    assert pool1 is pool2


def test_true_and_auto_share_the_pool():
    pool1 = par.parse_parallel_arg(True)
    pool2 = par.parse_parallel_arg("auto")
    assert pool1 is pool2


def test_int_requests_sized_pool():
    pool = par.parse_parallel_arg(2)
    assert par.get_pool_size(pool) == 2


def test_threads_and_processes_are_distinct_pools():
    t = par.parse_parallel_arg("threads:2")
    p = par.parse_parallel_arg("processes:2")
    assert t is not p
    # repeated requests reuse each
    assert par.parse_parallel_arg("threads:2") is t
    assert par.parse_parallel_arg("processes:2") is p


def test_explicit_executor_passes_through():
    with concurrent.futures.ThreadPoolExecutor(1) as pool:
        assert par.parse_parallel_arg(pool) is pool


def test_unknown_backend_raises():
    with pytest.raises(ValueError):
        par.parse_parallel_arg("not-a-backend")
    with pytest.raises(ValueError):
        par.parse_parallel_arg(3.7)


def test_worker_flag_prevents_auto_pool():
    par._IS_WORKER = True
    assert par.parse_parallel_arg("auto") is None
    assert par.parse_parallel_arg("processes:2") is None


def test_submit_sets_worker_flag_in_process_workers():
    """The pool initializer must mark real worker processes so they
    never recursively auto-create pools."""
    pool = par.parse_parallel_arg("processes:1")
    fut = par.submit(pool, _check_worker_flag)
    assert fut.result(timeout=30) is True
    # and workers refuse to build nested pools
    fut = par.submit(pool, _worker_auto_returns_none)
    assert fut.result(timeout=30) is True


def test_thread_submit_does_not_mark_workers():
    pool = par.parse_parallel_arg("threads:1")
    fut = par.submit(pool, _check_worker_flag)
    assert fut.result(timeout=30) is False
    # parent state untouched
    assert par.is_worker_process() is False
    assert par.parse_parallel_arg("auto") is not None


def test_fork_pid_guard_returns_none_for_auto():
    if "fork" not in multiprocessing.get_all_start_methods():
        pytest.skip("fork not available")
    # create pool state in the parent
    par.parse_parallel_arg(True)
    ctx = multiprocessing.get_context("fork")
    q = ctx.Queue()
    p = ctx.Process(target=_subprocess_probe, args=(q,))
    p.start()
    assert q.get(timeout=30) is True
    p.join(timeout=30)


def test_simulated_pid_mismatch_returns_none_for_auto():
    par.parse_parallel_arg(True)
    par._POOL_PID = -1  # impossible pid, as after a fork
    assert par.parse_parallel_arg("auto") is None
    # explicit requests still work (cache invalidated first)
    pool = par.parse_parallel_arg("processes:1")
    assert pool is not None
    assert par._POOL_PID == os.getpid()


def test_hyper_search_through_real_process_pool():
    """End to end: a parallel hyper search over a real process pool."""
    inputs, output, shapes, size_dict = ctg.rand_equation(
        20, 3, seed=4
    )
    opt = ctg.HyperOptimizer(
        max_repeats=8,
        parallel="processes:2",
        on_trial_error="raise",
        seed=0,
    )
    tree = opt.search(inputs, output, size_dict)
    assert tree.is_complete()
    assert len(opt.trials) == 8


def test_scatter_noop_for_local_pools():
    pool = par.parse_parallel_arg("threads:1")
    assert not par.can_scatter(pool)
    data = [1, 2, 3]
    assert par.scatter(pool, data) is data


def test_loky_pool_submits_and_marks_workers():
    """loky reusable executor: submit works and worker processes carry
    the nested-pool guard flag."""
    pytest.importorskip("joblib")
    pool = par.parse_parallel_arg("loky:1")
    fut = par.submit(pool, _check_worker_flag)
    assert fut.result(timeout=60) is True
    fut = par.submit(pool, _worker_auto_returns_none)
    assert fut.result(timeout=60) is True


def test_loky_hyper_search():
    pytest.importorskip("joblib")
    inputs, output, shapes, size_dict = ctg.rand_equation(
        16, 3, seed=2
    )
    opt = ctg.HyperOptimizer(
        max_repeats=4,
        parallel="loky:2",
        on_trial_error="raise",
        seed=0,
    )
    tree = opt.search(inputs, output, size_dict)
    assert tree.is_complete()
    assert len(opt.trials) == 4


def test_dask_pool_smoke():
    """Import-gated: the dask wrapper produces a working executor."""
    pytest.importorskip("dask.distributed")
    pool = par.parse_parallel_arg("dask:1")
    fut = par.submit(pool, _check_worker_flag)
    # dask workers are separate processes without our initializer; just
    # check the round trip works
    fut.result(timeout=60)


def test_ray_pool_smoke():
    """Import-gated: the ray wrapper submits, scatters, resolves."""
    pytest.importorskip("ray")
    pool = par.parse_parallel_arg("ray:1")
    assert par.can_scatter(pool)
    fut = par.submit(pool, _check_worker_flag)
    fut.result(timeout=60)
