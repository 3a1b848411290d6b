
import numpy as np
import pytest

from fast_lio_sam_qn_tpu.runtime import native
from fast_lio_sam_qn_tpu.utils import io


@pytest.fixture(scope="module")
def scan_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("scans")
    rng = np.random.default_rng(0)
    paths = []
    truth = []
    for i in range(6):
        pts = rng.normal(0, 5, (500 + 100 * i, 4)).astype(np.float32)
        if i % 2 == 0:
            p = str(d / f"{i:06d}.bin")
            pts.tofile(p)
        else:
            p = str(d / f"{i:06d}.pcd")
            io.save_pcd(p, pts[:, :3], pts[:, 3])
        paths.append(p)
        truth.append(pts)
    return paths, truth


def test_native_lib_builds():
    assert native.available(), "native runtime failed to build (g++ present?)"


def test_read_scan_bin_and_pcd(scan_files):
    paths, truth = scan_files
    for p, t in zip(paths, truth):
        got = native.read_scan(p)
        assert got.shape[0] == t.shape[0]
        np.testing.assert_allclose(got[:, :3], t[:, :3], atol=1e-4)


def test_scan_loader_prefetch(scan_files):
    paths, truth = scan_files
    loader = native.ScanLoader(paths, cap=4096, n_threads=2, lookahead=3)
    # out-of-order access still works (blocks until decoded)
    for idx in [0, 2, 1, 5, 3, 4]:
        got = loader.get(idx)
        assert got.shape[0] == truth[idx].shape[0]
        np.testing.assert_allclose(got[:, :3], truth[idx][:, :3], atol=1e-4)
    loader.close()


def test_approx_time_sync_pairs_nearest():
    s = native.ApproxTimeSync(slop=0.05)
    # stream a at 10 Hz, stream b slightly offset
    for i in range(10):
        s.push_a(i * 0.1, i)
    for i in range(10):
        s.push_b(i * 0.1 + 0.01, 100 + i)
    pairs = []
    while (p := s.pop()) is not None:
        pairs.append(p)
    assert len(pairs) == 10
    for (ia, ib, ta, tb) in pairs:
        assert ib == 100 + ia
        assert abs(ta - tb) < 0.05
    s.close()


def test_approx_time_sync_drops_unmatched():
    s = native.ApproxTimeSync(slop=0.02)
    s.push_a(0.0, 0)
    s.push_a(1.0, 1)
    s.push_b(1.005, 100)   # only matches a[1]
    pairs = []
    while (p := s.pop()) is not None:
        pairs.append(p)
    assert len(pairs) == 1
    assert pairs[0][0] == 1 and pairs[0][1] == 100
    s.close()


def test_python_fallback_sync_matches_native():
    a = native.ApproxTimeSync(slop=0.05)
    b = native.ApproxTimeSync(slop=0.05)
    b._h = None  # force the python fallback path
    b._qa, b._qb = [], []
    rng = np.random.default_rng(1)
    ts_a = np.sort(rng.uniform(0, 10, 40))
    ts_b = np.sort(rng.uniform(0, 10, 40))
    for i, t in enumerate(ts_a):
        a.push_a(t, i)
        b.push_a(t, i)
    for i, t in enumerate(ts_b):
        a.push_b(t, i)
        b.push_b(t, i)
    pa, pb = [], []
    while (p := a.pop()) is not None:
        pa.append(p)
    while (p := b.pop()) is not None:
        pb.append(p)
    assert pa == pb


def test_read_pcd_rejects_undecodable(tmp_path):
    """binary_compressed / double-typed / short-ascii PCDs must error or
    stop, never silently return garbage (round-3 review findings)."""
    hdr = ("VERSION .7\nFIELDS x y z intensity\nSIZE {s} {s} {s} {s}\n"
           "TYPE {t} {t} {t} {t}\nCOUNT 1 1 1 1\nWIDTH 3\nHEIGHT 1\n"
           "POINTS 3\nDATA {mode}\n")
    # binary_compressed: unsupported -> -1 (read_scan raises)
    p1 = tmp_path / "c.pcd"
    p1.write_bytes(hdr.format(s=4, t="F", mode="binary_compressed").encode()
                   + b"\x00" * 64)
    with pytest.raises(IOError):
        native.read_scan(str(p1))
    # SIZE 8 / TYPE F (doubles): the 4-byte memcpy would produce garbage
    p2 = tmp_path / "d.pcd"
    p2.write_bytes(hdr.format(s=8, t="F", mode="binary").encode()
                   + np.zeros(12, np.float64).tobytes())
    with pytest.raises(IOError):
        native.read_scan(str(p2))
    # ascii with a truncated final line: stop at the rows decoded so far
    p3 = tmp_path / "t.pcd"
    p3.write_text(hdr.format(s=4, t="F", mode="ascii")
                  + "1 2 3 0.5\n4 5 6 0.5\n7 8\n")
    got = native.read_scan(str(p3))
    assert got.shape[0] == 2
    np.testing.assert_allclose(got[:, 0], [1.0, 4.0])


def test_approx_time_sync_symmetric_lookahead():
    """A later a closer to the current b must win the pairing (the
    lookahead used to be b-side only, so results depended on which stream
    was denser)."""
    for force_py in (False, True):
        s = native.ApproxTimeSync(slop=0.2)
        if force_py:
            s._h = None
            s._qa, s._qb = [], []
        s.push_a(9.90, 0)
        s.push_a(10.00, 1)
        s.push_b(10.01, 0)
        ia, ib, ta, tb = s.pop()
        assert (ia, ib) == (1, 0), (force_py, ia, ib)
        s.close()


def test_load_pcd_python_fallback_parity(tmp_path):
    """utils.io.load_pcd: intensity round-trip (the native-less read_scan
    fallback used to zero-fill it), empty-cloud round-trip, and rejection
    of binary_compressed instead of decoding garbage."""
    rng = np.random.default_rng(3)
    pts = rng.normal(0, 5, (40, 3)).astype(np.float32)
    inten = rng.random(40).astype(np.float32)
    p = str(tmp_path / "a.pcd")
    io.save_pcd(p, pts, inten)
    xyzi = io.load_pcd(p, with_intensity=True)
    np.testing.assert_allclose(xyzi[:, :3], pts, atol=1e-5)
    np.testing.assert_allclose(xyzi[:, 3], inten, atol=1e-5)
    # empty cloud round-trips
    p0 = str(tmp_path / "e.pcd")
    io.save_pcd(p0, np.zeros((0, 3), np.float32))
    assert io.load_pcd(p0).shape == (0, 3)
    assert io.load_pcd(p0, with_intensity=True).shape == (0, 4)
    # binary_compressed is rejected
    pc = str(tmp_path / "c.pcd")
    with open(p, "rb") as f:
        content = f.read().replace(b"DATA ascii", b"DATA binary_compressed")
    with open(pc, "wb") as f:
        f.write(content)
    with pytest.raises(ValueError):
        io.load_pcd(pc)


def test_load_pcd_binary_multiple_pad_fields(tmp_path):
    """PCL writes every pad region as a field named '_' — a PointNormal-
    style layout has TWO of them, which np.dtype rejects unless the
    loader uniquifies the names (review finding, round 5)."""
    import struct

    import numpy as np

    from fast_lio_sam_qn_tpu.utils import io

    pts = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], np.float32)
    nrm = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], np.float32)
    curv = np.array([0.5, 0.25], np.float32)
    p = str(tmp_path / "pn.pcd")
    with open(p, "wb") as f:
        f.write(b"VERSION 0.7\n")
        f.write(b"FIELDS x y z _ normal_x normal_y normal_z _ curvature\n")
        f.write(b"SIZE 4 4 4 1 4 4 4 1 4\n")
        f.write(b"TYPE F F F U F F F U F\n")
        f.write(b"COUNT 1 1 1 4 1 1 1 8 1\n")
        f.write(b"WIDTH 2\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n")
        f.write(b"POINTS 2\nDATA binary\n")
        for i in range(2):
            f.write(struct.pack("<3f", *pts[i]) + b"\x00" * 4)
            f.write(struct.pack("<3f", *nrm[i]) + b"\x00" * 8)
            f.write(struct.pack("<f", curv[i]))
    out = io.load_pcd(p)
    np.testing.assert_allclose(out, pts, rtol=1e-6)
    # no intensity field -> zero-filled fourth column
    out4 = io.load_pcd(p, with_intensity=True)
    np.testing.assert_allclose(out4[:, 3], 0.0)
