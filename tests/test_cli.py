# coding=utf-8
"""End-to-end CLI tests: the full driver loop on tiny runs (CPU)."""

import json
import os

import numpy as np
import pytest

import main as cli


def _write_cfg(tmp_path, **overrides):
    cfg = {
        "dim": 2,
        "delta_time": 5e-4,
        "sim_count": 2,
        "auto_diff": True,
        "use_explicit_method": True,
        "implicit_method": 0,
        "preconditioned": 1,
        "g_dir": [0, -1],
        "is_output_gif": True,
        "is_output_obj": False,
        "output_fps": 60,
        "objects": [
            {"id": 0, "rho": 500, "center": [0.5, 0.8], "side_length": 0.2,
             "subdivisions": 4, "E": 4e4, "nu": 0.2, "damping": 14.5}
        ],
        "blocks": [
            {"id": 0, "block_center": [0.8, 0.5], "block_radius": 0.21}
        ],
    }
    cfg.update(overrides)
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    return str(path)


def test_cli_bad_config_exits_3(tmp_path):
    # Reference parity: config-parse failure exits with code 3 (utils.py:29-32).
    assert cli.run(["--config", str(tmp_path / "missing.json")]) == 3


def test_cli_explicit_run_writes_gif(tmp_path):
    cfg = _write_cfg(tmp_path)
    out = tmp_path / "out"
    rc = cli.run(
        ["--config", cfg, "--frames", "4", "--output", str(out),
         "--print-every", "2"]
    )
    assert rc == 0
    assert (out / "video.gif").exists()


def test_cli_implicit_with_checkpoint_and_resume(tmp_path):
    cfg = _write_cfg(
        tmp_path, auto_diff=False, use_explicit_method=False,
        implicit_method=1, is_output_gif=False,
    )
    out = tmp_path / "out"
    rc = cli.run(
        ["--config", cfg, "--frames", "4", "--output", str(out),
         "--checkpoint-every", "2", "--no-render", "--debug"]
    )
    assert rc == 0
    ckpt = out / "ckpt_000002.npz"
    assert ckpt.exists()
    rc = cli.run(
        ["--config", cfg, "--frames", "4", "--output", str(tmp_path / "o2"),
         "--resume", str(ckpt), "--no-render"]
    )
    assert rc == 0


def test_cli_3d_run_renders_and_exports_obj(tmp_path):
    """3D path end-to-end: cube STL -> tetrahedralize -> explicit sim ->
    wireframe render + gif + per-frame OBJ export (reference main.py:117-122
    gating: obj export only for dim == 3)."""
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stl = os.path.join(here, "assets", "cube.stl")
    if not os.path.exists(stl):
        import subprocess
        import sys

        subprocess.run(
            [sys.executable, os.path.join(here, "assets", "make_assets.py")],
            check=True,
        )
    cfg = {
        "dim": 3,
        "delta_time": 5e-4,
        "sim_count": 2,
        "auto_diff": False,
        "use_explicit_method": True,
        "g_dir": [0, -1, 0],
        "is_output_gif": True,
        "is_output_obj": True,
        "output_fps": 60,
        "objects": [
            {"rho": 1000, "center": [0.3, 0.3, 0.3], "obj": stl,
             "E": 4e4, "nu": 0.3, "damping": 10}
        ],
        "blocks": [],
    }
    path = tmp_path / "cfg3d.json"
    path.write_text(json.dumps(cfg))
    out = tmp_path / "out"
    rc = cli.run(
        ["--config", str(path), "--frames", "20", "--output", str(out),
         "--camera", "20,-70", "--print-every", "10"]
    )
    assert rc == 0
    assert (out / "video.gif").exists()
    objs = list(out.glob("obj_*.obj"))
    assert objs, "expected per-frame OBJ exports for dim==3"
    text = objs[0].read_text()
    assert text.startswith("v ") and "\nf " in text


def test_cli_multibody_checkpoint_resume_bit_identical(tmp_path):
    """Checkpointing a 2-body scene and resuming continues EVERY body
    bit-identically (round-1 review: only scene[0] used to be saved)."""
    objects = [
        {"id": 0, "rho": 500, "center": [0.3, 0.8], "side_length": 0.1,
         "subdivisions": 3, "E": 4e4, "nu": 0.2, "damping": 14.5},
        {"id": 1, "rho": 800, "center": [0.6, 0.6], "side_length": 0.12,
         "subdivisions": 4, "E": 8e4, "nu": 0.3, "damping": 10.0},
    ]
    cfg = _write_cfg(
        tmp_path, objects=objects, auto_diff=False,
        use_explicit_method=False, implicit_method=1, is_output_gif=False,
    )
    # Straight run: 4 frames, checkpoint at the end.
    a = tmp_path / "a"
    rc = cli.run(["--config", cfg, "--frames", "4", "--output", str(a),
                  "--checkpoint-every", "4", "--no-render"])
    assert rc == 0
    # Split run: checkpoint at frame 2, resume to frame 4.
    b = tmp_path / "b"
    rc = cli.run(["--config", cfg, "--frames", "4", "--output", str(b),
                  "--checkpoint-every", "2", "--no-render"])
    assert rc == 0
    rc = cli.run(["--config", cfg, "--frames", "4", "--output", str(b),
                  "--resume", str(b / "ckpt_000002.npz"),
                  "--checkpoint-every", "2", "--no-render"])
    assert rc == 0
    ref = np.load(a / "ckpt_000004.npz")
    got = np.load(b / "ckpt_000004.npz")
    assert int(ref["n_bodies"]) == 2 and int(got["n_bodies"]) == 2
    for key in ref.files:
        np.testing.assert_array_equal(ref[key], got[key], err_msg=key)


def test_cli_resume_body_count_mismatch_rejected(tmp_path):
    cfg1 = _write_cfg(tmp_path, is_output_gif=False)
    out = tmp_path / "out"
    rc = cli.run(["--config", cfg1, "--frames", "2", "--output", str(out),
                  "--checkpoint-every", "2", "--no-render"])
    assert rc == 0
    cfg2 = _write_cfg(
        tmp_path,
        objects=[
            {"id": 0, "center": [0.3, 0.8], "side_length": 0.1,
             "subdivisions": 3},
            {"id": 1, "center": [0.6, 0.6], "side_length": 0.12,
             "subdivisions": 4},
        ],
        is_output_gif=False,
    )
    rc = cli.run(["--config", cfg2, "--frames", "4", "--output",
                  str(tmp_path / "o2"),
                  "--resume", str(out / "ckpt_000002.npz"), "--no-render"])
    assert rc == 3


def test_cli_multibody_virtual_time_pacing_quirk(tmp_path, capsys):
    """Reference main.py:113 advances virtual_time once per object per
    frame — a 2-body scene reports 2x the wall-frame virtual time.
    Replicated deliberately (PARITY.md)."""
    cfg = _write_cfg(
        tmp_path,
        objects=[
            {"id": 0, "center": [0.3, 0.8], "side_length": 0.1,
             "subdivisions": 3},
            {"id": 1, "center": [0.6, 0.6], "side_length": 0.1,
             "subdivisions": 3},
        ],
        is_output_gif=False,
        sim_count=10,
    )
    rc = cli.run(["--config", cfg, "--frames", "4", "--output",
                  str(tmp_path / "out"), "--no-render", "--print-every", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    # 4 frames x 2 bodies x 10 substeps x 5e-4 = 0.040 virtual seconds.
    assert "t=0.040s" in out


def test_cli_multi_object_scene(tmp_path):
    cfg = _write_cfg(
        tmp_path,
        objects=[
            {"id": 0, "rho": 500, "center": [0.3, 0.8], "side_length": 0.1,
             "subdivisions": 3, "E": 4e4, "nu": 0.2, "damping": 14.5},
            {"id": 1, "rho": 800, "center": [0.6, 0.6], "side_length": 0.12,
             "subdivisions": 4, "E": 8e4, "nu": 0.3, "damping": 10.0},
        ],
        is_output_gif=False,
    )
    rc = cli.run(
        ["--config", cfg, "--frames", "3", "--output",
         str(tmp_path / "out"), "--no-render"]
    )
    assert rc == 0


def test_cli_sharded_flag(tmp_path):
    """--sharded drives the whole CLI loop under shard_map (8 virtual CPU
    devices via conftest) and matches the single-device run."""
    cfg = _write_cfg(
        tmp_path, auto_diff=False, use_explicit_method=False,
        implicit_method=1, is_output_gif=False,
    )
    out1 = str(tmp_path / "single")
    out2 = str(tmp_path / "sharded")
    assert cli.run([
        "--config", cfg, "--frames", "3", "--no-render", "--output", out1,
        "--checkpoint-every", "3",
    ]) in (0, None)
    assert cli.run([
        "--config", cfg, "--frames", "3", "--no-render", "--output", out2,
        "--checkpoint-every", "3", "--sharded",
    ]) in (0, None)
    from fem_tpu.utils.io import load_scene_checkpoint

    s1, f1, *_ = load_scene_checkpoint(os.path.join(out1, "ckpt_000003.npz"))
    s2, f2, *_ = load_scene_checkpoint(os.path.join(out2, "ckpt_000003.npz"))
    assert f1 == f2 == 3
    np.testing.assert_allclose(
        np.asarray(s2[0].pos), np.asarray(s1[0].pos), rtol=1e-5, atol=1e-6
    )
