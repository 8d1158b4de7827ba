# coding=utf-8
"""Video export: gif via Pillow, MJPEG AVI + MP4 via the native writers."""

import io
import struct

import numpy as np

from fem_tpu.render.avi import write_mjpeg_avi
from fem_tpu.render.mp4 import write_mjpeg_mp4
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


def _walk_boxes(data, start, end):
    """Yield (fourcc, payload_start, payload_end) of ISO BMFF boxes."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        fourcc = data[pos + 4 : pos + 8]
        assert size >= 8
        yield fourcc, pos + 8, pos + size
        pos += size
    assert pos == end


def _find(data, start, end, path):
    """Descend a box path like [b'moov', b'trak', ...]; returns span."""
    for fourcc, s, e in _walk_boxes(data, start, end):
        if fourcc == path[0]:
            if len(path) == 1:
                return s, e
            return _find(data, s, e, path[1:])
    raise AssertionError(f"box {path[0]} not found")


def test_mjpeg_mp4_structure(tmp_path):
    """The native .mp4: valid box tree, JPEG codec declaration (esds OTI
    0x6C), sample table consistent with the mdat payload, every sample a
    decodable JPEG of the right dimensions."""
    from PIL import Image

    frames = _frames()
    path = str(tmp_path / "t.mp4")
    write_mjpeg_mp4(path, frames, fps=30)
    data = open(path, "rb").read()
    tops = list(_walk_boxes(data, 0, len(data)))
    assert [f for f, _, _ in tops] == [b"ftyp", b"mdat", b"moov"]
    assert data[8:12] == b"isom"
    stbl = _find(
        data, 0, len(data),
        [b"moov", b"trak", b"mdia", b"minf", b"stbl"],
    )
    stsd = _find(data, stbl[0], stbl[1], [b"stsd"])
    # First sample entry is 'mp4v' with an esds declaring OTI 0x6C (JPEG).
    entry_fourcc = data[stsd[0] + 8 + 4 : stsd[0] + 8 + 8]
    assert entry_fourcc == b"mp4v"
    esds_at = data.find(b"esds", stsd[0], stsd[1])
    assert esds_at > 0
    esds_payload = data[esds_at + 8 : stsd[1]]
    assert b"\x6c" in esds_payload[:16]
    # Sample sizes + chunk offset walk the actual mdat JPEG stream.
    stsz = _find(data, stbl[0], stbl[1], [b"stsz"])
    _, default, count = struct.unpack(">III", data[stsz[0] : stsz[0] + 12])
    assert default == 0 and count == len(frames)
    sizes = struct.unpack(
        f">{count}I", data[stsz[0] + 12 : stsz[0] + 12 + 4 * count]
    )
    stco = _find(data, stbl[0], stbl[1], [b"stco"])
    _, n_off, off0 = struct.unpack(">III", data[stco[0] : stco[0] + 12])
    assert n_off == 1
    mdat = [t for t in tops if t[0] == b"mdat"][0]
    assert off0 == mdat[1]
    assert sum(sizes) == mdat[2] - mdat[1]
    pos = off0
    for s in sizes:
        img = Image.open(io.BytesIO(data[pos : pos + s]))
        assert img.size == (64, 64)
        pos += s
    # Duration: timescale fps, one tick per frame.
    mdhd = _find(data, 0, len(data), [b"moov", b"trak", b"mdia", b"mdhd"])
    _, _, _, timescale, duration = struct.unpack(
        ">IIIII", data[mdhd[0] : mdhd[0] + 20]
    )
    assert timescale == 30 and duration == len(frames)


def test_mjpeg_mp4_decodes_with_opencv(tmp_path):
    """Independent end-to-end validation: OpenCV's bundled ffmpeg must
    open the native .mp4 and decode every frame at the declared fps."""
    cv2 = __import__("pytest").importorskip("cv2")
    base = np.zeros((64, 64, 3), np.float32)
    base[:, :, 0] = np.linspace(0, 200, 64)[None, :]
    frames = [
        (base + 10 * i).clip(0, 255).astype(np.uint8) for i in range(6)
    ]
    path = str(tmp_path / "t.mp4")
    write_mjpeg_mp4(path, frames, fps=30)
    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
    decoded = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        decoded.append(f[:, :, ::-1])
    assert len(decoded) == len(frames)
    assert cap.get(cv2.CAP_PROP_FPS) == 30.0
    for got, src in zip(decoded, frames):
        assert np.abs(got.astype(int) - src.astype(int)).mean() < 3.0


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


def test_render_frame_3d_shaded_vs_wireframe():
    """Shaded 3D render (the reference's lit scene.mesh look): filled
    surface pixels, brighter toward the light, distinct from the
    wireframe style."""
    from fem_tpu.render.raster import render_frame_3d

    # A tetrahedron sitting mid-box.
    pos = np.array(
        [[2.0, 1.0, 2.0], [3.0, 1.0, 2.0], [2.5, 1.0, 3.0],
         [2.5, 2.0, 2.4]],
        np.float32,
    )
    faces = np.array([[0, 2, 1], [0, 1, 3], [1, 2, 3], [2, 0, 3]])
    shaded = render_frame_3d(pos, faces)
    wire = render_frame_3d(pos, faces, style="wireframe")
    assert shaded.shape == wire.shape == (640, 640, 3)
    # Filled gray interior: many near-gray pixels absent from the wireframe.
    def gray_px(img):
        r, g, b = img[..., 0].astype(int), img[..., 1].astype(int), img[..., 2].astype(int)
        return int(((abs(r - g) < 12) & (abs(g - b) < 12) & (g > 60)).sum())

    assert gray_px(shaded) > gray_px(wire) + 1000
