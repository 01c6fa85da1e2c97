"""Minimal PLY mesh export (replaces the reference's trimesh.export;
demo.py:321-353 saves fitted meshes as .ply)."""

from __future__ import annotations

import numpy as np


def save_ply(path: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    vertices = np.asarray(vertices, np.float32).reshape(-1, 3)
    faces = np.asarray(faces, np.int32).reshape(-1, 3)
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(vertices)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        f.write(header.encode("ascii"))
        f.write(vertices.astype("<f4").tobytes())
        counts = np.full((len(faces), 1), 3, np.uint8)
        face_rec = np.concatenate(
            [counts.view(np.uint8),
             faces.astype("<i4").view(np.uint8).reshape(len(faces), -1)],
            axis=1,
        )
        f.write(face_rec.tobytes())


def load_ply(path: str):
    """Minimal loader for the binary files written by save_ply."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode("ascii").splitlines()
        nv = int(next(l.split()[-1] for l in lines
                      if l.startswith("element vertex")))
        nf = int(next(l.split()[-1] for l in lines
                      if l.startswith("element face")))
        verts = np.frombuffer(f.read(nv * 12), "<f4").reshape(nv, 3)
        face_data = np.frombuffer(f.read(nf * 13), np.uint8).reshape(nf, 13)
        faces = face_data[:, 1:].copy().view("<i4").reshape(nf, 3)
    return verts.copy(), faces
