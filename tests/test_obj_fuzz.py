"""Malformed-mesh fuzz corpus for the OBJ ingestion path (VERDICT r3 #9).

Covers the real-world scan hazards the reference absorbs via open3d
(``openpoints/dataset/io.py``): material/texture/normal lines, CRLF,
no-trailing-newline, degenerate & non-manifold faces, vertex colors,
scientific notation, >16k-vertex scans, and outright garbage.  The native
C++ parser (``native/obj_loader.cpp``) and the numpy fallback
(``data/io.py``) must agree on every case: malformed vertex lines are
SKIPPED (never emitted as silent zeros), everything else parses the first
three coordinates of each ``v`` line.
"""
import numpy as np
import pytest

from geot_tpu.data import io as io_mod


def _python_parse(tmp_path, body: bytes, monkeypatch):
    p = tmp_path / "scan_py.obj"
    p.write_bytes(body)
    from geot_tpu import native
    monkeypatch.setattr(native.obj_loader, "load_vertices", lambda _: None)
    return io_mod.load_obj_vertices(str(p))


def _native_parse(tmp_path, body: bytes):
    from geot_tpu.native import obj_loader
    p = tmp_path / "scan_nat.obj"
    p.write_bytes(body)
    return obj_loader.load_vertices(str(p))


CASES = {
    "plain": (b"v 1 2 3\nv 4 5 6\n", [[1, 2, 3], [4, 5, 6]]),
    "full_mesh": (
        b"# exported scan\nmtllib scan.mtl\no tooth\ng lower\ns off\n"
        b"usemtl enamel\nv 0.5 -1.25 3e-2\nvn 0 1 0\nvt 0.5 0.5\n"
        b"v -2 +4 1e5\nf 1/1/1 2/1/1 1/1/1\n",
        [[0.5, -1.25, 0.03], [-2, 4, 1e5]]),
    "crlf": (b"v 1 2 3\r\nv 4 5 6\r\n", [[1, 2, 3], [4, 5, 6]]),
    "no_trailing_newline": (b"v 1 2 3\nv 7 8 9", [[1, 2, 3], [7, 8, 9]]),
    "tabs": (b"v\t1\t2\t3\n", [[1, 2, 3]]),
    "vertex_colors": (b"v 1 2 3 255 0 0\n", [[1, 2, 3]]),
    "w_component": (b"v 1 2 3 0.5\n", [[1, 2, 3]]),
    "short_line_skipped": (b"v 1 2\nv 4 5 6\n", [[4, 5, 6]]),
    "garbage_fields_skipped": (b"v a b c\nv 1 2 3\n", [[1, 2, 3]]),
    "empty": (b"", []),
    "whitespace_only": (b"\n\n  \n", []),
    "faces_only": (b"f 1 2 3\nf 1 1 1\n", []),
    "degenerate_nonmanifold": (
        b"v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\nf 1 2 3\nf 1 1 2\n",
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]]),
    "indented_v_not_vertex": (b" v 1 2 3\nv 4 5 6\n", [[4, 5, 6]]),
    "vn_vt_not_vertices": (b"vn 1 2 3\nvt 0.5 0.5\n", []),
    "binary_garbage": (bytes(range(256)) * 4, None),     # no-crash only
    # >255-char vertex line (huge comment-like tail after the coords): the
    # native parser must heap-copy, not truncate — a coordinate straddling
    # a fixed-buffer cutoff would parse as a silently wrong prefix
    "long_line": ((b"v 1 2 3 " + b"0.123456 " * 64 + b"\nv 4 5 6\n"),
                  [[1, 2, 3], [4, 5, 6]]),
    # coords only reachable past a 255-byte cutoff
    "long_line_late_coords": ((b"v" + b" " * 300 + b"7 8 9\n"), [[7, 8, 9]]),
    # trailing garbage fused to a field is malformed (python float("3x")
    # raises; strtof alone would yield 3.0) — both parsers must skip
    "fused_garbage_third": (b"v 1 2 3x\nv 4 5 6\n", [[4, 5, 6]]),
    "fused_garbage_first": (b"v 1y 2 3\nv 4 5 6\n", [[4, 5, 6]]),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_obj_corpus_python_fallback(tmp_path, monkeypatch, name):
    body, want = CASES[name]
    got = _python_parse(tmp_path, body, monkeypatch)
    assert got.shape[1:] == (3,)
    if want is not None:
        np.testing.assert_allclose(got, np.asarray(want, np.float32)
                                   .reshape(-1, 3), rtol=1e-6)


@pytest.mark.parametrize("name", sorted(CASES))
def test_obj_corpus_native_matches_python(tmp_path, monkeypatch, name):
    from geot_tpu.native import get_lib
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    body, want = CASES[name]
    nat = _native_parse(tmp_path, body)
    py = _python_parse(tmp_path, body, monkeypatch)
    assert nat is not None
    np.testing.assert_allclose(nat.reshape(-1, 3), py.reshape(-1, 3),
                               rtol=1e-6)


def test_obj_large_scan_roundtrip(tmp_path, monkeypatch):
    """>16k-vertex scan (typical intraoral resolution): native and python
    agree to the float32 digit, interleaved with face/normal noise."""
    from geot_tpu.native import get_lib
    rng = np.random.default_rng(0)
    verts = rng.standard_normal((20000, 3)).astype(np.float32)
    lines = []
    for i, v in enumerate(verts):
        lines.append(f"v {v[0]:.7g} {v[1]:.7g} {v[2]:.7g}")
        if i % 7 == 0:
            lines.append("vn 0 0 1")
        if i % 11 == 0:
            lines.append(f"f {i % 97 + 1} {(i + 1) % 97 + 1} {(i + 2) % 97 + 1}")
    body = ("\n".join(lines) + "\n").encode()
    # native first: _python_parse patches obj_loader.load_vertices to None
    # for the rest of the test
    nat = _native_parse(tmp_path, body) if get_lib() is not None else None
    py = _python_parse(tmp_path, body, monkeypatch)
    assert py.shape == (20000, 3)
    np.testing.assert_allclose(py, verts, rtol=1e-5, atol=1e-6)
    if nat is not None:
        np.testing.assert_array_equal(nat, py)
