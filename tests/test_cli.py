"""CLI surface: synth -> train -> eval, in-process."""

import json

import pytest

from mmssl_tpu.cli.main import main


def test_cli_synth_train_eval(tmp_path, capsys):
    rc = main(["synth", "--out", str(tmp_path), "--name", "d", "--users", "60", "--items", "30"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["path"].endswith("/d")

    rc = main([
        "train", "--dataset", "d", "--model", "lightgcn", "--data-path", str(tmp_path),
        "--epochs", "2",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--set", "data.batch_size=16",
        "--set", "model.embed_size=16",
        "--set", "eval.ks=(3,5)",
        "--set", "train.checkpoint_every=1",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["epochs_run"] == 2
    assert "recall" in summary["test"]

    rc = main([
        "eval", "--dataset", "d", "--model", "lightgcn", "--data-path", str(tmp_path),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--split", "test",
        "--set", "data.batch_size=16",
        "--set", "model.embed_size=16",
        "--set", "eval.ks=(3,5)",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(res["recall"]) == 2


def test_cli_bad_set(tmp_path):
    with pytest.raises(SystemExit):
        main(["train", "--dataset", "d", "--data-path", str(tmp_path), "--set", "notakv"])


def test_cli_mesh_train(tmp_path, capsys):
    """--mesh DxM builds a (data, model) mesh and trains SPMD (the test
    harness provides 8 virtual CPU devices, conftest.py)."""
    rc = main(["synth", "--out", str(tmp_path), "--name", "m", "--users", "64", "--items", "32"])
    assert rc == 0
    capsys.readouterr()
    rc = main([
        "train", "--dataset", "m", "--model", "mmssl", "--data-path", str(tmp_path),
        "--epochs", "1", "--mesh", "4x2",
        "--set", "data.batch_size=16",
        "--set", "model.embed_size=16",
        "--set", "eval.ks=(3,5)",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["epochs_run"] == 1
