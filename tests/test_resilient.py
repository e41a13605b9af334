"""Fault-tolerant eval (harness/resilient.py): crash-resume equivalence
and transient retry behavior."""

import numpy as np
import pytest

from ant_quantization_tpu.harness.resilient import (ResumableAccumulator,
                                                    retry_transient)


def _batches(n=20, seed=0):
    rng = np.random.default_rng(seed)
    return [(rng.integers(0, 10, 8), rng.integers(0, 10, 8))
            for _ in range(n)]


def _contrib(batch):
    preds, labels = batch
    return {"correct": int((preds == labels).sum()), "total": 8}


def test_crash_resume_matches_uninterrupted(tmp_path):
    batches = _batches()
    path = str(tmp_path / "eval")

    # uninterrupted reference
    ref = ResumableAccumulator("", init={"correct": 0, "total": 0})
    for i, b in enumerate(batches):
        ref.fold(i, _contrib(b))
    want = ref.finalize()

    # crash after batch 12 (journal saved every 5)
    acc = ResumableAccumulator(path, init={"correct": 0, "total": 0},
                               save_every=5)
    with pytest.raises(RuntimeError):
        for i, b in enumerate(batches):
            if i == 12:
                raise RuntimeError("preempted")
            acc.fold(i, _contrib(b))

    # restart: resumes from the last journal (batch 10), refolds 10..19
    acc2 = ResumableAccumulator(path, init={"correct": 0, "total": 0},
                                save_every=5)
    assert acc2.next_index == 10
    redone = 0
    for i, b in enumerate(batches):
        if acc2.already_done(i):
            continue
        acc2.fold(i, _contrib(b))
        redone += 1
    got = acc2.finalize()
    assert redone == 10
    assert got["correct"] == want["correct"]
    assert got["total"] == want["total"]


def test_array_state_roundtrip(tmp_path):
    path = str(tmp_path / "hist")
    acc = ResumableAccumulator(path, init={"hist": np.zeros(4, np.int64)},
                               save_every=1)
    acc.fold(0, {"hist": np.asarray([1, 0, 2, 0])})
    acc.fold(1, {"hist": np.asarray([0, 1, 0, 3])})
    acc2 = ResumableAccumulator(path, init={"hist": np.zeros(4, np.int64)})
    np.testing.assert_array_equal(acc2.state["hist"], [1, 1, 2, 3])
    assert acc2.next_index == 2


def test_out_of_order_fold_rejected(tmp_path):
    acc = ResumableAccumulator("", init={"n": 0})
    acc.fold(0, {"n": 1})
    with pytest.raises(AssertionError):
        acc.fold(2, {"n": 1})


def test_retry_transient_succeeds_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE: device preempted")
        return 42

    assert retry_transient(flaky, retries=5, backoff_s=0.001) == 42
    assert calls["n"] == 3


def test_retry_gives_up_on_real_errors():
    def broken():
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        retry_transient(broken, retries=5, backoff_s=0.001)


def test_fingerprint_mismatch_discards_journal(tmp_path):
    path = str(tmp_path / "eval")
    acc = ResumableAccumulator(path, init={"n": 0}, save_every=1,
                               fingerprint="resnet18|int|w4a4")
    acc.fold(0, {"n": 5})
    acc.finalize()

    # same config resumes...
    same = ResumableAccumulator(path, init={"n": 0}, save_every=1,
                                fingerprint="resnet18|int|w4a4")
    assert same.next_index == 1 and same.state["n"] == 5
    # ...different config starts fresh instead of serving stale results
    other = ResumableAccumulator(path, init={"n": 0}, save_every=1,
                                 fingerprint="resnet18|flint|w4a4")
    assert other.next_index == 0 and other.state["n"] == 0
