"""Systematic malformed-input sweep for the mesh loaders.

The loaders replace trimesh (reference datagenerator/data_generator.py:828),
a battle-tested library — so the contract is tested adversarially: for ANY
input bytes, `load_mesh` either returns a valid Mesh (finite (V,3) coords,
in-range (F,3) indices) or raises ValueError/OSError. It must never hang,
never leak an internal exception (struct.error, IndexError, KeyError, ...),
and never return out-of-contract arrays.

Corpus: a valid STL/OBJ/PLY (binary + ascii) of an icosphere, damaged by
 * truncation at a dense sweep of offsets,
 * random byte flips (seeded),
 * NaN/Inf coordinate injection,
 * lying element/face counts,
 * degenerate-only geometry (zero-area faces — loads fine, stays finite).
"""

import struct

import numpy as np
import pytest

from sdf_representation_tpu.geometry.mesh_io import (
    Mesh,
    load_mesh,
    save_mesh,
)
from sdf_representation_tpu.geometry.primitives import make_icosphere

ACCEPTABLE = (ValueError, OSError)


def _assert_contract(path):
    """load_mesh(path) either raises cleanly or returns an in-contract mesh."""
    try:
        mesh = load_mesh(path)
    except ACCEPTABLE:
        return None
    assert mesh.vertices.ndim == 2 and mesh.vertices.shape[1] == 3
    assert mesh.faces.ndim == 2 and mesh.faces.shape[1] == 3
    assert np.isfinite(mesh.vertices).all()
    if len(mesh.faces):
        assert mesh.faces.min() >= 0
        assert mesh.faces.max() < len(mesh.vertices)
    return mesh


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """{ext: bytes} of one valid file per format (+ ascii STL/binary PLY)."""
    d = tmp_path_factory.mktemp("meshes")
    mesh = make_icosphere(1, radius=0.5)  # 80 faces — small, real topology
    files = {}
    for ext in ("stl", "obj", "ply"):
        p = d / f"m.{ext}"
        save_mesh(mesh, str(p))
        files[ext] = p.read_bytes()
    # ascii STL variant (writer emits binary)
    lines = ["solid fuzz"]
    for tri in mesh.triangles:
        lines.append(" facet normal 0 0 0\n  outer loop")
        for v in tri:
            lines.append(f"   vertex {v[0]:.6g} {v[1]:.6g} {v[2]:.6g}")
        lines.append("  endloop\n endfacet")
    lines.append("endsolid fuzz")
    files["stl_ascii"] = "\n".join(lines).encode()
    # binary little-endian PLY variant (writer emits ascii)
    v = mesh.vertices.astype("<f4")
    f32 = v.tobytes()
    fb = b"".join(
        struct.pack("<B3i", 3, int(a), int(b), int(c)) for a, b, c in mesh.faces
    )
    header = (
        b"ply\nformat binary_little_endian 1.0\n"
        + b"element vertex %d\n" % len(mesh.vertices)
        + b"property float x\nproperty float y\nproperty float z\n"
        + b"element face %d\n" % len(mesh.faces)
        + b"property list uchar int vertex_indices\nend_header\n"
    )
    files["ply_binary"] = header + f32 + fb
    return files


def _ext(kind):
    return "." + kind.split("_")[0]


@pytest.mark.parametrize("kind", ["stl", "obj", "ply", "stl_ascii", "ply_binary"])
def test_valid_corpus_loads(corpus, tmp_path, kind):
    p = tmp_path / f"ok{_ext(kind)}"
    p.write_bytes(corpus[kind])
    mesh = _assert_contract(str(p))
    assert mesh is not None and len(mesh.faces) == 80


@pytest.mark.parametrize("kind", ["stl", "obj", "ply", "stl_ascii", "ply_binary"])
def test_truncation_sweep(corpus, tmp_path, kind):
    """Truncate at a dense sweep of byte offsets — every prefix must load
    cleanly or raise cleanly."""
    data = corpus[kind]
    offsets = sorted(
        set(range(0, min(len(data), 200), 7))
        | set(range(0, len(data), max(1, len(data) // 64)))
        | {len(data) - 1, len(data) - 2, len(data) - 49}
    )
    p = tmp_path / f"t{_ext(kind)}"
    for off in offsets:
        p.write_bytes(data[:off])
        _assert_contract(str(p))


@pytest.mark.parametrize("kind", ["stl", "obj", "ply", "stl_ascii", "ply_binary"])
def test_byte_flip_sweep(corpus, tmp_path, kind):
    """Flip random bytes (128 seeded trials x 4 flips)."""
    data = bytearray(corpus[kind])
    rng = np.random.default_rng(42)
    p = tmp_path / f"b{_ext(kind)}"
    for _ in range(128):
        buf = bytearray(data)
        for pos in rng.integers(0, len(buf), size=4):
            buf[pos] = int(rng.integers(0, 256))
        p.write_bytes(bytes(buf))
        _assert_contract(str(p))


def test_nan_inf_vertices_rejected(tmp_path):
    for bad in ("nan", "inf", "-inf"):
        p = tmp_path / "bad.obj"
        p.write_text(f"v 0 0 {bad}\nv 0 1 0\nv 1 0 0\nf 1 2 3\n")
        with pytest.raises(ValueError, match="non-finite"):
            load_mesh(str(p))
        # binary STL with injected NaN payload
        tri = np.zeros((1, 50), np.uint8)
        coords = np.array([[0, 0, np.float32(bad)], [0, 1, 0], [1, 0, 0]], "<f4")
        tri[0, 12:48] = np.frombuffer(coords.tobytes(), np.uint8)
        pb = tmp_path / "bad.stl"
        pb.write_bytes(b"\0" * 80 + struct.pack("<I", 1) + tri.tobytes())
        with pytest.raises(ValueError, match="non-finite"):
            load_mesh(str(pb))


def test_out_of_range_face_indices_rejected(tmp_path):
    p = tmp_path / "bad.obj"
    p.write_text("v 0 0 0\nv 0 1 0\nv 1 0 0\nf 1 2 9999\n")
    with pytest.raises(ValueError, match="out of range"):
        load_mesh(str(p))
    p2 = tmp_path / "bad.ply"
    p2.write_text(
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n0 0 0\n0 1 0\n1 0 0\n3 0 1 77\n"
    )
    with pytest.raises(ValueError, match="out of range"):
        load_mesh(str(p2))


def test_lying_stl_count_no_memory_bomb(tmp_path):
    """Binary STL claiming 4e9 triangles must raise, not allocate 200 GB."""
    p = tmp_path / "bomb.stl"
    p.write_bytes(b"\0" * 80 + struct.pack("<I", 4_000_000_000) + b"\0" * 100)
    with pytest.raises(ValueError, match="[Tt]runcated"):
        load_mesh(str(p))


def test_lying_ply_counts(tmp_path):
    """Element counts larger than the body: clean failure, no hang."""
    p = tmp_path / "lie.ply"
    p.write_text(
        "ply\nformat ascii 1.0\nelement vertex 1000000\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 0\nproperty list uchar int vertex_indices\n"
        "end_header\n0 0 0\n"
    )
    with pytest.raises(ACCEPTABLE):
        load_mesh(str(p))


def test_degenerate_only_mesh_loads(tmp_path):
    """A mesh of exclusively zero-area faces is geometrically useless but
    structurally valid: it must load with finite normals (normalization
    guards /0), not crash."""
    p = tmp_path / "degen.obj"
    p.write_text("v 0 0 0\nv 1 1 1\nv 2 2 2\nf 1 2 3\nf 1 1 2\n")
    mesh = load_mesh(str(p))
    assert len(mesh.faces) == 2
    assert np.isfinite(mesh.face_normals()).all()
    assert mesh.face_areas().max() == 0.0


def test_garbage_and_empty_files(tmp_path):
    rng = np.random.default_rng(7)
    for ext in (".stl", ".obj", ".ply"):
        p = tmp_path / ("g" + ext)
        for payload in (b"", b"hello world\n" * 3, bytes(rng.integers(0, 256, 400, dtype=np.uint8))):
            p.write_bytes(payload)
            _assert_contract(str(p))


def test_point_only_obj_loads(tmp_path):
    """OBJ with vertices but no faces (point cloud) is legal input for PCD
    mode; faces must still be a well-formed (0, 3) array."""
    p = tmp_path / "pts.obj"
    p.write_text("v 0 0 0\nv 0 1 0\nv 1 0 0\n")
    mesh = load_mesh(str(p))
    assert mesh.faces.shape == (0, 3) and len(mesh.vertices) == 3


@pytest.mark.parametrize("kind", ["stl", "obj", "ply", "stl_ascii", "ply_binary"])
def test_chunk_mutation_sweep(corpus, tmp_path, kind):
    """Structure-shifting damage (delete / duplicate / transplant whole byte
    ranges) — unlike point flips this desynchronizes counts from payloads."""
    data = corpus[kind]
    rng = np.random.default_rng(13)
    p = tmp_path / f"c{_ext(kind)}"
    for _ in range(48):
        buf = bytearray(data)
        a = int(rng.integers(0, max(1, len(buf) - 1)))
        b = int(min(len(buf), a + rng.integers(1, 64)))
        op = rng.integers(0, 3)
        if op == 0:        # delete [a, b)
            del buf[a:b]
        elif op == 1:      # duplicate [a, b) in place
            buf[a:a] = buf[a:b]
        else:              # transplant [a, b) to a random offset
            chunk = bytes(buf[a:b])
            del buf[a:b]
            c = int(rng.integers(0, max(1, len(buf))))
            buf[c:c] = chunk
        p.write_bytes(bytes(buf))
        _assert_contract(str(p))


def test_cross_format_content(corpus, tmp_path):
    """Bytes of one format behind another format's extension: clean raise or
    in-contract mesh (e.g. ascii STL sniffing), never an internal error."""
    for ext_kind in ("stl", "obj", "ply"):
        for content_kind, blob in corpus.items():
            p = tmp_path / f"x_{content_kind}.{ext_kind}"
            p.write_bytes(blob)
            _assert_contract(str(p))


def test_obj_quads_negative_and_slash_indices(tmp_path):
    """Legal OBJ variants beyond tri faces: quads fan-triangulate, negative
    indices are relative to the vertices seen so far, and v/vt/vn index
    triples parse to the vertex index."""
    p = tmp_path / "var.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvn 0 0 1\n"
        "f 1/1/1 2/1/1 3/1/1 4/1/1\n"   # quad with slash triples -> 2 tris
        "f -4 -3 -2\n"                    # negative (relative) indices
    )
    mesh = load_mesh(str(p))
    assert len(mesh.faces) == 3
    np.testing.assert_array_equal(mesh.faces[0], [0, 1, 2])
    np.testing.assert_array_equal(mesh.faces[1], [0, 2, 3])
    np.testing.assert_array_equal(mesh.faces[2], [0, 1, 2])


def test_ply_extra_properties(tmp_path):
    """PLY vertices carrying extra per-vertex properties (normals, colors):
    x/y/z are picked out by name in ascii; binary skips extra scalars via
    the structured dtype."""
    p = tmp_path / "extra.ply"
    p.write_text(
        "ply\nformat ascii 1.0\n"
        "comment produced by a scanner\n"
        "element vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float nx\nproperty float ny\nproperty float nz\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0 0 0 1\n0 1 0 0 0 1\n1 0 0 0 0 1\n"
        "3 0 1 2\n"
    )
    mesh = load_mesh(str(p))
    assert len(mesh.vertices) == 3 and len(mesh.faces) == 1
    np.testing.assert_array_equal(mesh.vertices[1], [0, 1, 0])

    b = tmp_path / "extra_bin.ply"
    v = np.array(
        [(0, 0, 0, 255), (0, 1, 0, 255), (1, 0, 0, 255)],
        dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("red", "u1")],
    )
    header = (
        b"ply\nformat binary_little_endian 1.0\n"
        b"element vertex 3\n"
        b"property float x\nproperty float y\nproperty float z\n"
        b"property uchar red\n"
        b"element face 1\nproperty list uchar int vertex_indices\n"
        b"end_header\n"
    )
    b.write_bytes(header + v.tobytes() + struct.pack("<B3i", 3, 0, 1, 2))
    mesh = load_mesh(str(b))
    assert len(mesh.vertices) == 3 and len(mesh.faces) == 1
    np.testing.assert_array_equal(mesh.vertices[2], [1, 0, 0])


def test_ascii_stl_whitespace_variants(tmp_path):
    """ASCII STL with tabs, blank lines, and scientific-notation coords."""
    p = tmp_path / "ws.stl"
    p.write_text(
        "solid  weird\n\n"
        "\tfacet normal 0 0 0\n"
        "\t\touter loop\n"
        "\t\t\tvertex 0.0e0 0 0\n"
        "\t\t\tvertex 1E-1 0 0\n\n"
        "\t\t\tvertex 0 1e+0 0\n"
        "\t\tendloop\n"
        "\tendfacet\n"
        "endsolid weird\n"
    )
    mesh = load_mesh(str(p))
    assert len(mesh.faces) == 1
    # welding may reorder vertices; the sci-notation coord must be present
    assert np.isclose(mesh.vertices, [0.1, 0, 0]).all(axis=1).any()
