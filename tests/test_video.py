# coding=utf-8
"""Video export: gif via Pillow, MJPEG AVI via the native writer."""

import numpy as np

from fem_tpu.render.avi import write_mjpeg_avi
from fem_tpu.render.raster import HeadlessRenderer, render_frame_2d


def _frames(n=5, size=64):
    rng = np.random.default_rng(0)
    return [
        (rng.uniform(0, 255, (size, size, 3))).astype(np.uint8)
        for _ in range(n)
    ]


def test_mjpeg_avi_structure(tmp_path):
    path = str(tmp_path / "t.avi")
    write_mjpeg_avi(path, _frames(), fps=30)
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF"
    assert data[8:12] == b"AVI "
    assert b"MJPG" in data[:400]
    assert b"movi" in data
    assert b"idx1" in data
    # RIFF length field consistent with file size.
    import struct

    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8


def test_renderer_make_video_writes_gif_and_fallback(tmp_path):
    r = HeadlessRenderer(2, str(tmp_path), output_fps=30, is_output_gif=True)
    pos = np.array([[0.2, 0.2], [0.8, 0.2], [0.5, 0.8]], np.float32)
    faces = np.array([[0, 1, 2]])
    phi = np.array([0.5])
    for t in (0.1, 0.2, 0.3):
        assert r.maybe_capture(
            t, pos, faces, phi, np.zeros((1, 2)), np.zeros(1)
        )
    written = r.make_video(gif=True, mp4=True)
    names = [w.split("/")[-1] for w in written]
    assert "video.gif" in names
    # mp4 via imageio if ffmpeg exists, else native AVI.
    assert "video.mp4" in names or "video.avi" in names


def test_frame_pacing():
    r = HeadlessRenderer(2, "/tmp/fem_test_out", output_fps=60)
    pos = np.array([[0.5, 0.5]], np.float32)
    faces = np.zeros((0, 3), np.int32)
    # Before the first 1/60 s slot: no capture.
    assert not r.maybe_capture(0.0, pos, faces, None, np.zeros((1, 2)),
                               np.zeros(1))
    assert r.maybe_capture(0.02, pos, faces, None, np.zeros((1, 2)),
                           np.zeros(1))
    assert r.output_frame_cnt == 1
