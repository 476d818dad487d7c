"""Pure PNG/BMP/Y4M codec tests: encode->decode round-trips across every
color type and scanline filter, spec-level validation (CRC, magic,
truncation), Pillow cross-checks where Pillow exists, and the area
resampler.  These back the multimodal strict path, so they must pass in
the dependency-free environment."""

import numpy as np
import pytest

from elasticsearch_ray.functions import imagecodec as ic


def _img(h, w, c=None, seed=7):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c is None else (h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("filters", [0, 1, 2, 3, 4, None])
def test_png_gray_roundtrip_all_filters(filters):
    img = _img(13, 9)
    data = ic.png_encode(img, filters=filters)
    assert np.array_equal(ic.png_decode(data), img)


@pytest.mark.parametrize("channels", [2, 3, 4])
def test_png_multichannel_roundtrip(channels):
    img = _img(11, 7, channels)
    # filters=None cycles 0..4 -> every filter exercised on every type
    data = ic.png_encode(img, filters=None)
    out = ic.png_decode(data)
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_png_palette_roundtrip():
    idx = _img(9, 12)
    pal = _img(256, 3, seed=11).reshape(256, 3)
    data = ic.png_encode(idx, palette=pal, filters=None)
    assert np.array_equal(ic.png_decode(data, expand_palette=False), idx)
    assert np.array_equal(ic.png_decode(data), pal[idx])


def test_png_rejects_garbage_and_corruption():
    with pytest.raises(ValueError):
        ic.png_decode(b"not a png at all")
    img = _img(5, 5)
    data = bytearray(ic.png_encode(img))
    # flip a pixel byte inside IDAT -> CRC must catch it
    data[-20] ^= 0xFF
    with pytest.raises(ValueError):
        ic.png_decode(bytes(data))
    with pytest.raises(ValueError):
        ic.decode_image(b"GIF89a...")


def test_png_single_pixel_and_row():
    for shape in [(1, 1), (1, 8), (8, 1)]:
        img = _img(*shape)
        assert np.array_equal(ic.png_decode(ic.png_encode(img, filters=None)), img)


def test_bmp_roundtrip_gray_and_rgb():
    gray = _img(10, 6)
    assert np.array_equal(ic.bmp_decode(ic.bmp_encode(gray)), gray)
    rgb = _img(7, 9, 3)
    assert np.array_equal(ic.bmp_decode(ic.bmp_encode(rgb)), rgb)
    # row padding exercised (w*3 not a multiple of 4 above; also w=5 gray)
    g2 = _img(3, 5)
    assert np.array_equal(ic.bmp_decode(ic.bmp_encode(g2)), g2)


def test_decode_image_dispatch_and_to_gray():
    gray = _img(6, 6)
    assert np.array_equal(ic.decode_image(ic.png_encode(gray)), gray)
    assert np.array_equal(ic.decode_image(ic.bmp_encode(gray)), gray)
    rgb = _img(4, 4, 3)
    g = ic.to_gray(rgb)
    assert g.shape == (4, 4) and g.dtype == np.uint8
    # BT.601 luma of a pure-red pixel
    red = np.zeros((1, 1, 3), np.uint8)
    red[0, 0, 0] = 255
    assert ic.to_gray(red)[0, 0] == int(255 * 299 / 1000)


def test_pillow_cross_check():
    """When Pillow IS present, its decoder must agree with ours on our
    encodings and vice versa (skipped in the bare sandbox — the pure
    round-trips above still pin the format)."""
    Image = pytest.importorskip("PIL.Image")
    import io

    img = _img(16, 16)
    ours = ic.png_encode(img, filters=None)
    assert np.array_equal(
        np.asarray(Image.open(io.BytesIO(ours)).convert("L")), img
    )
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    assert np.array_equal(ic.png_decode(buf.getvalue()), img)


def test_resize_area():
    # constant image resizes to the constant
    const = np.full((32, 32), 77, np.uint8)
    assert (ic.resize_area(const, 4, 4) == 77).all()
    # block means: 2x2 blocks of a 4x4 checker
    img = np.array(
        [[0, 0, 100, 100],
         [0, 0, 100, 100],
         [200, 200, 40, 40],
         [200, 200, 40, 40]], dtype=np.uint8)
    out = ic.resize_area(img, 2, 2)
    assert out.tolist() == [[0, 100], [200, 40]]
    # non-divisible sizes still cover every source pixel
    img2 = _img(10, 7)
    out2 = ic.resize_area(img2, 3, 3)
    assert out2.shape == (3, 3)
    assert img2.min() <= out2.min() <= out2.max() <= img2.max()


def test_y4m_roundtrip_and_chroma_variants():
    frames = np.stack([_img(6, 8, seed=i) for i in range(5)])
    for chroma in ["mono", "420", "422", "444"]:
        data = ic.y4m_encode(frames, chroma=chroma)
        params, out = ic.y4m_parse(data)
        assert params["width"] == 8 and params["height"] == 6
        assert params["chroma"] == chroma
        assert len(out) == 5
        for a, b in zip(out, frames):
            assert np.array_equal(a, b)
    with pytest.raises(ValueError):
        ic.y4m_parse(b"RIFF....AVI LIST")
    data = ic.y4m_encode(frames, chroma="420")
    with pytest.raises(ValueError):
        ic.y4m_parse(data[:-10])  # truncated last frame


def test_to_gray_gray_alpha_and_upscale_no_black_columns():
    """Review regressions: (a) to_gray on a (H,W,2) gray+alpha decode
    must take the luma channel, not crash; (b) resize_area upscaling
    must never emit zero-width (black) columns/rows."""
    ga = np.dstack([np.full((3, 3), 7, np.uint8),
                    np.full((3, 3), 255, np.uint8)])
    g = ic.to_gray(ga)
    assert g.shape == (3, 3) and int(g[0, 0]) == 7
    # round-trip through a color-type-4 PNG hits the same path
    dec = ic.png_decode(ic.png_encode(ga))
    assert dec.shape == (3, 3, 2)
    assert np.array_equal(ic.to_gray(dec), g)
    # single-channel 3-D shape too
    assert ic.to_gray(ga[:, :, :1]).shape == (3, 3)

    img = (np.arange(16, dtype=np.uint8).reshape(4, 4) * 10 + 100)
    up = ic.resize_area(img, 8, 8)
    assert up.shape == (8, 8)
    assert up.min() >= img.min()  # no black pixels from empty blocks
    # extreme: 1x1 -> 5x5 is a constant fill
    one = np.array([[42]], dtype=np.uint8)
    assert np.array_equal(ic.resize_area(one, 5, 5),
                          np.full((5, 5), 42, np.uint8))
