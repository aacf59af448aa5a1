"""CLI entry point tests: reference-compatible flags, end-to-end runs."""

import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, reference_available


def test_training_and_test_diagonals_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from tensornetworkforml_tpu.cli.training_diagonals import main as train_main
    from tensornetworkforml_tpu.cli.test_diagonals import main as test_main

    val_acc = train_main([
        "--n_samples", "1200", "--linear_dim", "5", "--sigma", "0.5",
        "--M", "6", "--n_epochs", "3", "--lr", "0.02", "--seed", "0",
        "--out", str(tmp_path / "model.npz"),
        "--results_dir", str(tmp_path / "results"),
    ])
    assert max(val_acc) >= 0.95
    assert os.path.exists(tmp_path / "model.npz")
    # plots written when matplotlib is present
    try:
        import matplotlib  # noqa: F401

        assert os.path.exists(tmp_path / "results" / "diag_accuracy.png")
        assert os.path.exists(tmp_path / "results" / "diag_MAE.png")
    except ImportError:
        pass

    acc, mae = test_main([
        "--filename", str(tmp_path / "model.npz"),
        "--n_samples", "400", "--sigma", "0.5", "--seed", "1",
    ])
    assert acc >= 0.9
    assert 0.0 <= mae <= 1.0


@pytest.mark.skipif(not reference_available(), reason="reference absent")
def test_test_diagonals_cli_accepts_reference_pickle(tmp_path, monkeypatch):
    """The evaluation CLI must load the reference's .dat checkpoints."""
    monkeypatch.chdir(tmp_path)
    from tensornetworkforml_tpu.cli.test_diagonals import main as test_main

    acc, mae = test_main([
        "--filename", f"{REFERENCE_DIR}/trained_diag_model.dat",
        "--n_samples", "400", "--sigma", "0.6", "--seed", "2",
    ])
    assert acc >= 0.9  # the shipped reference model solves this task


def test_training_binary_mnist_cli_synthetic(tmp_path, monkeypatch):
    """Full binary-MNIST pipeline on the synthetic stand-in dataset."""
    monkeypatch.chdir(tmp_path)
    from tensornetworkforml_tpu.cli.training_binary_MNIST import (
        main as train_main,
    )
    from tensornetworkforml_tpu.cli.test_binary_MNIST import main as test_main

    val_acc = train_main([
        "--synthetic", "--n_epochs", "2", "--n_train_batch", "4",
        "--seed", "0",
        "--out", str(tmp_path / "mnist.npz"),
        "--results_dir", str(tmp_path / "results"),
    ])
    assert os.path.exists(tmp_path / "mnist.npz")
    # synthetic 0-vs-1 classes are separable; should learn well
    assert max(val_acc) >= 0.95, f"val accuracy too low: {val_acc}"

    acc, mae = test_main([
        "--filename", str(tmp_path / "mnist.npz"), "--synthetic",
    ])
    assert acc >= 0.9


def test_training_mnist10_cli_synthetic(tmp_path, monkeypatch):
    """10-class pipeline (pooled synthetic stand-in) learns well -- a config
    beyond the reference's capability surface."""
    monkeypatch.chdir(tmp_path)
    from tensornetworkforml_tpu.cli.training_mnist import main as train_main

    val_acc, test_acc = train_main([
        "--synthetic", "--pool", "--M", "16", "--n_epochs", "2",
        "--batch_size", "256", "--seed", "0",
        "--out", str(tmp_path / "mnist10.npz"),
    ])
    assert os.path.exists(tmp_path / "mnist10.npz")
    assert max(val_acc) >= 0.9, f"val accuracy too low: {val_acc}"
    assert test_acc >= 0.9, f"test accuracy too low: {test_acc}"


def test_replicate_stoudenmire_runner_synthetic_smoke(tmp_path, monkeypatch):
    """The north-star replication runner dry-runs end-to-end on the
    synthetic stand-in (smoke scale): bond schedule, warmup, gate print.
    The real-data gate (99.03% @ m=120) activates when IDX files exist."""
    monkeypatch.chdir(tmp_path)
    from tensornetworkforml_tpu.cli.replicate_stoudenmire import main

    rc = main([
        "--synthetic", "--smoke", "--out", str(tmp_path / "m120.npz"),
    ])
    assert rc == 0
    assert os.path.exists(tmp_path / "m120.npz")


def test_training_mnist10_cli_checkpoint_resume(tmp_path, monkeypatch):
    """Resume round-trip for the 10-class CLI (VERDICT r4 item 8): a run
    interrupted after epoch 1 resumes into epoch 2 only, and the resumed
    model trains on rather than restarting."""
    monkeypatch.chdir(tmp_path)
    from tensornetworkforml_tpu.cli.training_mnist import main as train_main

    ck = str(tmp_path / "ck.npz")
    common = [
        "--synthetic", "--pool", "--M", "8", "--batch_size", "128",
        "--seed", "0", "--restarts", "0", "--checkpoint", ck,
        "--out", str(tmp_path / "m.npz"),
    ]
    val1, _ = train_main(common + ["--n_epochs", "1"])
    assert len(val1) == 1 and os.path.exists(ck)

    # resume: only the remaining epoch runs
    val2, test_acc = train_main(common + ["--n_epochs", "2", "--resume"])
    assert len(val2) == 1, "resume must skip the already-trained epoch"
    # training continued from the epoch-1 model: epoch-2 validation does
    # not collapse back to an untrained level
    assert val2[-1] >= val1[-1] - 0.05

    # a fully-complete checkpoint resumes to a no-op
    val3, _ = train_main(common + ["--n_epochs", "2", "--resume"])
    assert len(val3) == 0
