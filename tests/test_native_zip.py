import io
import os
import zipfile

import numpy as np
import pytest

from few_shot_transformer_tts_tpu.native import zipreader
from few_shot_transformer_tts_tpu.data.zipstore import ZipStore


@pytest.fixture(scope="module")
def zip_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("nzip")
    path = os.path.join(root, "test.zip")
    rng = np.random.RandomState(0)
    with zipfile.ZipFile(path, "w") as zf:  # default ZIP_STORED
        for i in range(20):
            buf = io.BytesIO()
            np.save(buf, rng.randn(i + 1, 8).astype(np.float32))
            zf.writestr("mel_%04d.npy" % i, buf.getvalue())
        zf.writestr("deflated.bin", b"x" * 1000,
                    compress_type=zipfile.ZIP_DEFLATED)
    return path


def test_native_reader_builds_and_reads(zip_path):
    r = zipreader.NativeZipReader(zip_path)
    assert len(r) == 21
    names = r.namelist()
    assert "mel_0003.npy" in names
    data = r.read("mel_0003.npy")
    ref = zipfile.ZipFile(zip_path).read("mel_0003.npy")
    assert data == ref
    arr = np.load(io.BytesIO(data))
    assert arr.shape == (4, 8)


def test_native_reader_missing_and_deflated(zip_path):
    r = zipreader.NativeZipReader(zip_path)
    assert r.read("nonexistent") is None
    assert r.read("deflated.bin") is None  # python fallback territory


def test_zipstore_uses_native_and_falls_back(zip_path):
    store = ZipStore(zip_path)
    assert store._native is not None
    arr = store.read_npy("mel_0005.npy")
    assert arr.shape == (6, 8)
    # deflated entry goes through the zipfile fallback transparently
    import zipfile as zfmod
    raw = store._zf.read("deflated.bin")
    assert raw == b"x" * 1000


def test_threaded_reads(zip_path):
    from concurrent.futures import ThreadPoolExecutor
    r = zipreader.NativeZipReader(zip_path)
    ref = {n: zipfile.ZipFile(zip_path).read(n)
           for n in r.namelist() if n.endswith(".npy")}

    def hit(i):
        name = "mel_%04d.npy" % (i % 20)
        return r.read(name) == ref[name]

    with ThreadPoolExecutor(8) as ex:
        assert all(ex.map(hit, range(200)))
