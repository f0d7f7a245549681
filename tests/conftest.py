import os
import signal
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Per-test watchdog: one Ray streaming-executor stall was observed to hang a
# test indefinitely (idle MapWorker, pipeline never completing, under heavy
# external CPU contention). SIGALRM interrupts the blocked wait (ray.get is
# signal-interruptible) and fails THAT test with a traceback at the hang
# point instead of stalling the whole suite. The slowest legitimate test
# finishes in well under a minute uncontended.
_TEST_TIMEOUT_S = int(os.environ.get("TRR_TEST_TIMEOUT", "300"))


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    def _alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded {_TEST_TIMEOUT_S}s watchdog (TRR_TEST_TIMEOUT) — "
            "likely a stalled Ray pipeline; failing fast instead of hanging"
        )

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(_TEST_TIMEOUT_S)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    """64-doc seeded corpus (cached; generation is byte-stable per seed)."""
    from tesseract_recognize_ray.fixtures import corpus_cached

    return corpus_cached("/tmp/trr_test_corpus_tiny", 64)
