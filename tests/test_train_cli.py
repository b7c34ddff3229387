"""End-to-end test of the production training CLI (scripts/train.py):
synthetic data, sharded mesh, checkpoint save + resume."""

import glob
import os
import sys

import pytest

pytestmark = pytest.mark.slow

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
sys.path.insert(0, SCRIPTS)


def run_cli(argv, monkeypatch, capsys):
    import train as train_cli

    monkeypatch.setattr(sys, "argv", ["train.py"] + argv)
    train_cli.main()
    return capsys.readouterr().out


def test_train_cli_synthetic_and_resume(tmp_path, monkeypatch, capsys):
    ckpt_dir = str(tmp_path / "ckpts")
    base = [
        "--synthetic", "16", "--tier", "tiny", "--input-size", "16",
        "--frames", "2", "--batch-size", "8", "--num-classes", "4",
        "--log-every", "1", "--checkpoint-dir", ckpt_dir,
        "--save-every", "2", "--lr-schedule", "cosine",
        "--warmup-steps", "1", "--total-steps", "8",
    ]
    out = run_cli(base + ["--steps", "2"], monkeypatch, capsys)
    assert "step 2" in out and "[val @ step 2]" in out
    ckpts = glob.glob(os.path.join(ckpt_dir, "train_state_*.msgpack"))
    assert ckpts, "no checkpoint written"

    out2 = run_cli(base + ["--steps", "1", "--resume"], monkeypatch, capsys)
    assert "resumed" in out2
    # global step continues from the saved step
    assert "step 3" in out2
    assert "(global step 3)" in out2
