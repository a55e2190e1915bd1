"""Terminal viewer: frame encoding + non-interactive loop + CLI --view.

Covers the DynamicCamera-window replacement (models/viewer.py): ANSI
half-block frame generation, the progressive loop stepping/converging with a
non-TTY stdin, and checkpoint save on exit.
"""
import io
import os

import numpy as np

from real_time_ray_tracing_engine_tpu.models.viewer import (frame_to_ansi,
                                                            run_viewer)
from real_time_ray_tracing_engine_tpu.scene import builders


def test_frame_to_ansi_shapes_and_colors():
    img = np.zeros((8, 8, 3), np.uint8)
    img[:4] = [255, 0, 0]        # top half red
    img[4:] = [0, 0, 255]        # bottom half blue
    text = frame_to_ansi(img, cols=4, rows=2)
    lines = text.split("\n")
    assert len(lines) == 2
    assert "38;2;255;0;0" in lines[0]        # red foreground upper pixels
    assert "48;2;0;0;255" in lines[1]        # blue background lower pixels
    assert lines[0].count("▀") == 4


def test_run_viewer_non_interactive(tmp_path):
    scene = builders.cornell_box()
    scene.camera.image_width = 16
    scene.camera.samples_per_pixel = 4       # 2x2 strata
    scene.camera.max_depth = 2
    ckpt = str(tmp_path / "view.npz")
    buf = io.StringIO()
    prog = run_viewer(scene, max_frames=2, checkpoint=ckpt, out=buf)
    assert prog.samples_taken == 2
    assert os.path.exists(ckpt)
    text = buf.getvalue()
    assert "fps" in text and "▀" in text
    # resume from the checkpoint and converge
    buf2 = io.StringIO()
    prog2 = run_viewer(scene, checkpoint=ckpt, out=buf2)
    assert prog2.converged and prog2.samples_taken == 4
    assert "Converged" in buf2.getvalue()
    img = np.asarray(prog2.image())
    assert np.isfinite(img).all() and img.mean() > 0
