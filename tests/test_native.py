"""Native C++ data plane vs Python reference path."""
import base64
import io

import numpy as np
import pytest

from lavender_tpu.data import native
from lavender_tpu.data import transforms as TF
from lavender_tpu.data.tsv import tsv_writer

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def _jpeg_b64(arr):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def tsv(tmp_path_factory):
    d = tmp_path_factory.mktemp("nat")
    rs = np.random.RandomState(0)
    rows = []
    frames_per_row = []
    for i in range(3):
        frames = [(rs.rand(60 + 10 * i, 80, 3) * 255).astype(np.uint8)
                  for _ in range(4)]
        frames_per_row.append(frames)
        rows.append([f"v{i}", "{}"] + [_jpeg_b64(f) for f in frames])
    path = str(d / "clips.tsv")
    tsv_writer(rows, path)
    with open(str(d / "clips.lineidx")) as f:
        offsets = [int(l) for l in f]
    return path, offsets, frames_per_row


def test_row_fields_and_clip_decode(tsv):
    path, offsets, frames = tsv
    nt = native.NativeTSV(path)
    assert nt.num_fields(offsets[0]) == 6  # key + meta + 4 frames
    clip = nt.decode_clip(offsets[1], [2, 4], size_img=56)
    assert clip.shape == (2, 56, 56, 3)
    # compare against the Python path on the SAME decoded JPEG bytes
    import base64 as b64mod
    import io as iomod
    from PIL import Image
    from lavender_tpu.data.tsv import TSVFile
    row = TSVFile(path).seek(1)
    decoded = np.asarray(Image.open(
        iomod.BytesIO(b64mod.b64decode(row[2]))).convert("RGB"))
    ref = TF.img_center_crop(decoded, 56)
    # the native resize is BIT-EXACT Pillow fixed-point bilinear
    # (loader.cpp triangle_weights/clip8), so decode+resize+crop must
    # match the Python path exactly
    np.testing.assert_array_equal(clip[0], ref)


def test_batch_decode_parallel(tsv):
    path, offsets, frames = tsv
    nt = native.NativeTSV(path)
    cols = np.array([[2, 3], [3, 5], [2, 4]], np.int32)
    out = nt.decode_batch(offsets, cols, size_img=48, n_threads=4)
    assert out.shape == (3, 2, 48, 48, 3)
    # deterministic: single-thread result identical
    out1 = nt.decode_batch(offsets, cols, size_img=48, n_threads=1)
    np.testing.assert_array_equal(out, out1)
    # matches per-clip calls
    one = nt.decode_clip(offsets[1], [3, 5], size_img=48)
    np.testing.assert_array_equal(out[1], one)


def test_random_crop_seeded(tsv):
    path, offsets, _ = tsv
    nt = native.NativeTSV(path)
    a = nt.decode_clip(offsets[0], [2, 3], 40, random_crop=True, seed=7)
    b = nt.decode_clip(offsets[0], [2, 3], 40, random_crop=True, seed=7)
    c = nt.decode_clip(offsets[0], [2, 3], 40, random_crop=True, seed=8)
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()
    # same crop window for all frames of the clip
    # (cannot assert directly, but shapes/content sanity)
    assert a.shape == (2, 40, 40, 3)
