"""CLI end-to-end: train a tiny synthetic scene, then render + eval the
exported PLY through the same entry points a user runs."""

import json
import os

import pytest

from gaussiansplat_tpu.cli import main


def test_train_render_eval_roundtrip(tmp_path, capsys):
    out = str(tmp_path / "run")
    rc = main([
        "train", "--scene", "synthetic", "--synthetic-n", "64",
        "--synthetic-size", "64", "--iterations", "3", "--sh-degree", "1",
        "--impl", "xla", "--out", out,
    ])
    assert rc == 0
    ply = os.path.join(out, "point_cloud.ply")
    assert os.path.exists(ply)
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.path.isdir(os.path.join(out, "ckpts"))

    renders = str(tmp_path / "renders")
    rc = main([
        "render", "--ply", ply, "--out", renders, "--frames", "1",
        "--width", "64", "--height", "64", "--fx", "60", "--sh-degree", "1",
        "--impl", "xla",
    ])
    assert rc == 0
    files = os.listdir(renders)
    assert any(f.startswith("frame_0000") for f in files)

    rc = main([
        "eval", "--scene", "synthetic", "--synthetic-n", "64",
        "--synthetic-size", "64", "--ply", ply, "--sh-degree", "1",
        "--impl", "xla",
    ])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(line)
    assert result["n_views"] == 4
    assert result["psnr"] == result["psnr"]  # not NaN


def test_resume_from_checkpoint(tmp_path):
    out = str(tmp_path / "run")
    args = [
        "train", "--scene", "synthetic", "--synthetic-n", "64",
        "--synthetic-size", "64", "--sh-degree", "1", "--impl", "xla",
        "--out", out,
    ]
    assert main(args + ["--iterations", "2"]) == 0
    # resume continues past the saved step without retraining from scratch
    assert main(args + ["--iterations", "4", "--resume"]) == 0
    steps = sorted(os.listdir(os.path.join(out, "ckpts")))
    assert steps[-1] == "step_00000004"


def test_bad_scene_exits():
    with pytest.raises(SystemExit):
        main(["train", "--scene", "/nonexistent/path"])
