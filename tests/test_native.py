"""Native IO library vs numpy reference (skipped when not built)."""

import numpy as np
import pytest

from stereoformer_tpu.data import file_io, native, transforms

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_native_pfm_matches_numpy(tmp_path):
    rng = np.random.RandomState(0)
    disp = rng.rand(37, 53).astype(np.float32) * 100
    p = str(tmp_path / "d.pfm")
    file_io.write_pfm(p, disp)
    want = file_io.read_pfm(p)[0]
    got = native.read_pfm(p)
    np.testing.assert_array_equal(got, want)


def test_native_pfm_color(tmp_path):
    rng = np.random.RandomState(1)
    img = rng.rand(10, 12, 3).astype(np.float32)
    p = str(tmp_path / "c.pfm")
    file_io.write_pfm(p, img)
    np.testing.assert_array_equal(native.read_pfm(p), file_io.read_pfm(p)[0])


def test_native_pfm_bigendian(tmp_path):
    """Big-endian PFM (positive scale) must byteswap correctly."""
    disp = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = str(tmp_path / "be.pfm")
    with open(p, "wb") as f:
        f.write(b"Pf\n4 3\n1.0\n")
        np.flipud(disp).astype(">f4").tofile(f)
    np.testing.assert_array_equal(native.read_pfm(p), disp)


def test_crop_normalize_matches_numpy():
    rng = np.random.RandomState(2)
    img = (rng.rand(40, 60, 3) * 255).astype(np.float32)
    mean, std = transforms.IMAGENET_MEAN, transforms.IMAGENET_STD
    got = native.crop_normalize(img, 3, 5, 16, 32, mean, std)
    want = ((img[3:19, 5:37] / 255.0) - mean) / std
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_batch_decode(tmp_path):
    lib = native.load_library()
    rng = np.random.RandomState(3)
    paths, wants = [], []
    H, W = 8, 10
    for i in range(5):
        p = str(tmp_path / f"{i}.pfm")
        d = rng.rand(H, W).astype(np.float32)
        file_io.write_pfm(p, d)
        paths.append(p)
        wants.append(d)
    blob = b"".join(p.encode() + b"\0" for p in paths)
    cap = H * W
    out = np.empty((5, cap), np.float32)
    results = np.zeros(5, np.int32)
    rc = lib.sf_read_pfm_batch(blob, 5, out, cap, results, 3)
    assert rc == 0 and (results == 0).all()
    for i, w in enumerate(wants):
        np.testing.assert_array_equal(out[i].reshape(H, W), w)


def test_train_transform_native_path_parity():
    """train_transform's fused native crop+normalize fast path must
    produce the same sample as the pure-numpy fallback — same RNG draw
    order (ox, oy), same crop window on every dense key, values equal to
    float-ulp noise ((x·(1/255) − mean)·(1/std) vs (x/255 − mean)/std)."""
    import numpy as np
    import pytest

    from stereoformer_tpu.data import native
    from stereoformer_tpu.data.transforms import train_transform

    if not native.available():
        pytest.skip("native IO library not built (make -C native)")

    rng_img = np.random.RandomState(7)
    def fresh():
        return {
            "img_left": rng_img.uniform(0, 255, (64, 96, 3)).astype(
                np.float32),
            "img_right": rng_img.uniform(0, 255, (64, 96, 3)).astype(
                np.float32),
            "gt_disp": rng_img.uniform(0, 32, (64, 96)).astype(np.float32),
        }
    s0 = fresh()
    s1 = {k: v.copy() for k, v in s0.items()}

    fast = train_transform(s0, np.random.default_rng(3), crop=(32, 48))

    saved, native._lib = native._lib, None
    saved_p, native._LIB_PATH = native._LIB_PATH, "/nonexistent"
    try:
        slow = train_transform(s1, np.random.default_rng(3), crop=(32, 48))
    finally:
        native._lib, native._LIB_PATH = saved, saved_p

    for k in ("img_left", "img_right", "gt_disp"):
        assert fast[k].shape == slow[k].shape, k
        np.testing.assert_allclose(fast[k], slow[k], rtol=0, atol=2e-6,
                                   err_msg=k)


def test_native_png_parity_and_fallback(tmp_path):
    """sf_read_png byte-parity vs PIL.convert("RGB") for RGB, gray and
    RGBA 8-bit PNGs; palette PNGs return None (PIL fallback), and
    file_io.read_img routes through the native decoder transparently."""
    import numpy as np
    import pytest
    from PIL import Image

    from stereoformer_tpu.data import file_io, native

    if not native.available():
        pytest.skip("native IO library not built (make -C native)")

    rng = np.random.RandomState(3)
    cases = {
        "rgb.png": Image.fromarray(
            rng.randint(0, 255, (41, 67, 3), dtype=np.uint8)),
        "gray.png": Image.fromarray(
            rng.randint(0, 255, (29, 31), dtype=np.uint8), "L"),
        "rgba.png": Image.fromarray(
            rng.randint(0, 255, (23, 17, 4), dtype=np.uint8), "RGBA"),
        # gray+alpha (colortype 4): convert("RGB") keeps the gray plane
        "la.png": Image.fromarray(
            rng.randint(0, 255, (19, 23, 2), dtype=np.uint8), "LA"),
    }
    for name, im in cases.items():
        p = str(tmp_path / name)
        im.save(p)
        ref = np.array(Image.open(p).convert("RGB"), dtype=np.float32)
        got = native.read_png_rgb(p)
        assert got is not None and got.dtype == np.float32
        np.testing.assert_array_equal(got, ref, err_msg=name)
        # the production entry point routes through the same decoder
        np.testing.assert_array_equal(file_io.read_img(p), ref)

    pal = str(tmp_path / "pal.png")
    cases["rgb.png"].convert("P").save(pal)
    assert native.read_png_rgb(pal) is None  # unsupported -> PIL path
    ref = np.array(Image.open(pal).convert("RGB"), dtype=np.float32)
    np.testing.assert_array_equal(file_io.read_img(pal), ref)

    # corrupt/truncated file: native decode fails -> None (PIL fallback),
    # never an exception unless STEREOFORMER_NATIVE_STRICT=1
    trunc = str(tmp_path / "trunc.png")
    with open(str(tmp_path / "rgb.png"), "rb") as fh:
        blob = fh.read()
    with open(trunc, "wb") as fh:
        fh.write(blob[: len(blob) // 2])
    native._warned_fallback = False
    assert native.read_png_rgb(trunc) is None
    assert native.read_png_gray16(trunc) is None
    import os as _os

    _os.environ["STEREOFORMER_NATIVE_STRICT"] = "1"
    try:
        with pytest.raises(IOError):
            native.read_png_rgb(trunc)
    finally:
        del _os.environ["STEREOFORMER_NATIVE_STRICT"]


def test_native_png16_kitti_disp_parity(tmp_path):
    """16-bit gray PNG (the KITTI disparity encoding): native decode is
    byte-exact vs PIL, and ``file_io._read_kitti_disp`` routes through
    it (÷256 semantics unchanged)."""
    import numpy as np
    import pytest
    from PIL import Image

    from stereoformer_tpu.data import file_io, native

    if not native.available():
        pytest.skip("native IO library not built (make -C native)")

    rng = np.random.RandomState(4)
    arr = (rng.rand(19, 43) * 65535).astype(np.uint16)
    p = str(tmp_path / "disp16.png")
    Image.fromarray(arr).save(p)
    got = native.read_png_gray16(p)
    assert got is not None and got.dtype == np.uint16
    np.testing.assert_array_equal(got, arr)
    ref = np.array(Image.open(p), dtype=np.float32) / 256.0
    np.testing.assert_array_equal(file_io._read_kitti_disp(p), ref)
    # 8-bit RGB is not this path's job
    p8 = str(tmp_path / "rgb.png")
    Image.fromarray(rng.randint(0, 255, (8, 8, 3), dtype=np.uint8)).save(p8)
    assert native.read_png_gray16(p8) is None
