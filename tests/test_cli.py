"""CLI end-to-end: flags parse (reference parity) and files get written."""

import numpy as np

from myraytracer_tpu.cli import build_parser, main
from myraytracer_tpu.output.image import read_ppm


def test_reference_flag_defaults():
    """Defaults match native-runner/src/main.rs:20-31."""
    args = build_parser().parse_args([])
    assert args.width == 0
    assert args.height == 0
    assert args.samples_per_frame == 1
    assert args.ray_depth == 50
    assert args.max_framebuffer_weight == 1.0


def test_size_inference_rules():
    from myraytracer_tpu.config import RenderConfig

    assert RenderConfig(width=0, height=0).resolve_size() == (640, 360)
    assert RenderConfig(width=0, height=7).resolve_size() == (7, 7)
    assert RenderConfig(width=9, height=0).resolve_size() == (9, 9)
    assert RenderConfig(width=9, height=7).resolve_size() == (9, 7)


def test_cli_end_to_end(tmp_path):
    out = tmp_path / "img.ppm"
    ckpt = tmp_path / "c.npz"
    rc = main(
        [
            "--width", "16", "--height", "8",
            "--samples-per-frame", "2",
            "--ray-depth", "4",
            "--frames", "2",
            "--scene", "reference",
            "--backend", "jnp",
            "--sample-batch", "2",
            "--out", str(out),
            "--checkpoint", str(ckpt),
        ]
    )
    assert rc == 0
    img = read_ppm(out)
    assert img.shape == (8, 16, 3)
    assert img.max() > 0
    assert ckpt.exists()

    # Resume and continue.
    out2 = tmp_path / "img2.ppm"
    rc = main(
        [
            "--width", "16", "--height", "8",
            "--samples-per-frame", "2",
            "--ray-depth", "4",
            "--frames", "1",
            "--backend", "jnp",
            "--sample-batch", "2",
            "--resume", str(ckpt),
            "--out", str(out2),
        ]
    )
    assert rc == 0
    assert read_ppm(out2).shape == (8, 16, 3)
