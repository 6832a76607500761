"""Image encode + PPM/PNG round-trips."""

import numpy as np

from myraytracer_tpu.output import image as im


def test_gamma_encode():
    img = np.array([[[0.0, 0.25, 1.0]]], np.float32)
    enc = im.gamma_encode(img, 2.0)
    np.testing.assert_allclose(enc, [[[0.0, 0.5, 1.0]]], rtol=1e-6)
    # Out-of-range values clamp before encode.
    np.testing.assert_allclose(
        im.gamma_encode(np.array([[[-1.0, 2.0, 0.5]]]), 1.0),
        [[[0.0, 1.0, 0.5]]],
    )


def test_to_u8_rounding():
    img = np.array([[[1.0, 0.0, 0.25]]], np.float32)
    u8 = im.to_u8(img, gamma=2.0)
    assert u8.dtype == np.uint8
    assert u8[0, 0, 0] == 255 and u8[0, 0, 1] == 0 and u8[0, 0, 2] == 128


def test_ppm_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (7, 5, 3), np.uint8)
    p = tmp_path / "x.ppm"
    im.write_ppm(p, u8)
    back = im.read_ppm(p)
    np.testing.assert_array_equal(back, u8)


def test_png_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    u8 = rng.randint(0, 256, (9, 13, 3), np.uint8)
    p = tmp_path / "x.png"
    im.write_png(p, u8)
    back = im.read_png(p)
    np.testing.assert_array_equal(back, u8)


def test_write_image_dispatch(tmp_path):
    img = np.full((4, 4, 3), 0.25, np.float32)
    im.write_image(tmp_path / "a.ppm", img)
    im.write_image(tmp_path / "a.png", img)
    a = im.read_ppm(tmp_path / "a.ppm")
    b = im.read_png(tmp_path / "a.png")
    np.testing.assert_array_equal(a, b)
    assert a[0, 0, 0] == 128  # sqrt(0.25)*255+0.5

    import pytest

    with pytest.raises(ValueError):
        im.write_image(tmp_path / "a.jpg", img)


def test_srgb_transfer_option():
    """--gamma srgb applies the piecewise sRGB EOTF (the transfer the
    reference gets from its sRGB surface format, lib.rs:1105-1107), so
    output compares pixel-exactly with the live reference window."""
    import numpy as np

    from myraytracer_tpu.output.image import gamma_encode, parse_gamma

    img = np.asarray([[[0.0, 0.002, 0.0031308], [0.5, 1.0, 2.0]]], np.float32)
    enc = gamma_encode(img, "srgb")
    np.testing.assert_allclose(enc[0, 0, 0], 0.0)
    np.testing.assert_allclose(enc[0, 0, 1], 12.92 * 0.002, rtol=1e-6)
    np.testing.assert_allclose(
        enc[0, 1, 0], 1.055 * 0.5 ** (1 / 2.4) - 0.055, rtol=1e-6
    )
    np.testing.assert_allclose(enc[0, 1, 1], 1.0, rtol=1e-6)
    np.testing.assert_allclose(enc[0, 1, 2], 1.0, rtol=1e-6)  # clamped

    assert parse_gamma("srgb") == "srgb"
    assert parse_gamma("2.2") == 2.2
    import pytest

    with pytest.raises(ValueError):
        parse_gamma("bogus")
    with pytest.raises(ValueError):
        parse_gamma("-1")

    from myraytracer_tpu.cli import build_parser

    assert build_parser().parse_args(["--gamma", "srgb"]).gamma == "srgb"
    assert build_parser().parse_args(["--gamma", "1.8"]).gamma == 1.8


def test_pfm_roundtrip_color_and_gray():
    """write_pfm/read_pfm: bitwise float roundtrip for PF (color) and
    Pf (grayscale) — the HDR sink must not touch the radiance values."""
    import numpy as np

    from myraytracer_tpu.output.image import read_pfm, write_pfm

    rng = np.random.default_rng(7)
    color = (rng.standard_normal((17, 23, 3)) * 10).astype(np.float32)
    gray = (rng.random((9, 5)) * 1e4).astype(np.float32)
    write_pfm("/tmp/_pfm_c.pfm", color)
    write_pfm("/tmp/_pfm_g.pfm", gray)
    np.testing.assert_array_equal(read_pfm("/tmp/_pfm_c.pfm"), color)
    np.testing.assert_array_equal(read_pfm("/tmp/_pfm_g.pfm"), gray)


def test_write_image_hdr_sinks_skip_transfer(tmp_path):
    """.pfm and .npy sinks write RAW linear float32 — no gamma encode,
    no u8 quantize (values above 1.0 and negatives survive)."""
    import numpy as np

    from myraytracer_tpu.output.image import read_pfm, write_image

    img = np.array(
        [[[2.5, 0.25, -0.5], [0.0, 1.0, 7.0]]], np.float32
    )
    write_image(tmp_path / "x.pfm", img, gamma=2.0)
    write_image(tmp_path / "x.npy", img, gamma=2.0)
    np.testing.assert_array_equal(read_pfm(tmp_path / "x.pfm"), img)
    np.testing.assert_array_equal(np.load(tmp_path / "x.npy"), img)


def test_aces_tonemap_rolls_off_highlights():
    """--gamma aces: the Narkowicz ACES fit runs on UNCLIPPED radiance —
    monotone, 0→0, and HDR highlights compress smoothly instead of the
    hard clip every other mode applies."""
    import numpy as np

    from myraytracer_tpu.output.image import gamma_encode, parse_gamma, to_u8

    assert parse_gamma("aces") == "aces"
    assert parse_gamma("ACES") == "aces"
    x = np.array([[[0.0, 0.18, 0.5], [1.0, 2.0, 16.0]]], np.float32)
    enc = gamma_encode(x, "aces")
    flat = enc.reshape(-1)
    assert flat[0] == 0.0
    # Monotone in the input ordering above.
    assert np.all(np.diff(flat) > 0)
    # x=2.0 is NOT clipped to the x=1.0 level (sqrt/srgb modes clip both
    # to 255); under ACES they quantize to distinct u8 values.
    u8 = to_u8(x, "aces").reshape(-1)
    assert u8[3] < u8[4] < u8[5] <= 255
    clipped = to_u8(x, 2.0).reshape(-1)
    assert clipped[3] == clipped[4] == clipped[5] == 255
    # Mid-gray matches the published fit: aces(0.18) ≈ 0.267 linear
    # → ≈ 0.553 sRGB-encoded → u8 141.
    assert 138 <= u8[1] <= 144


def test_parse_gamma_rejects_unknown_string():
    import pytest

    from myraytracer_tpu.output.image import parse_gamma

    with pytest.raises(ValueError):
        parse_gamma("filmic")


def test_exposure_scales_before_transfer(tmp_path):
    """--exposure: linear pre-transfer scale for display encodes; HDR
    sinks stay unscaled."""
    import numpy as np

    from myraytracer_tpu.output.image import (
        read_pfm,
        to_u8,
        write_image,
    )

    img = np.full((2, 2, 3), 0.2, np.float32)
    # gamma 1.0: 0.2*2 = 0.4 → 102.
    assert to_u8(img, 1.0, exposure=2.0)[0, 0, 0] == 102
    assert to_u8(img, 1.0)[0, 0, 0] == 51
    # ACES composes: exposure shifts the tonemap operating point.
    assert to_u8(img, "aces", exposure=2.0)[0, 0, 0] > \
        to_u8(img, "aces")[0, 0, 0]
    # HDR sink ignores exposure (raw radiance for compositing).
    write_image(tmp_path / "e.pfm", img, gamma=1.0, exposure=4.0)
    np.testing.assert_array_equal(read_pfm(tmp_path / "e.pfm"), img)


def test_cli_exposure_changes_output(tmp_path):
    from myraytracer_tpu import cli
    from myraytracer_tpu.output.image import read_png

    common = [
        "--width", "32", "--height", "16", "--samples-per-frame", "1",
        "--ray-depth", "2", "--frames", "1", "--scene", "three-sphere",
        "--backend", "jnp",
    ]
    a, b = tmp_path / "n.png", tmp_path / "e.png"
    assert cli.main(common + ["--out", str(a)]) == 0
    assert cli.main(common + ["--out", str(b), "--exposure", "2.0"]) == 0
    assert read_png(str(b)).mean() > read_png(str(a)).mean()
