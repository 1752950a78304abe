"""Index (de)serialization dispatch.

Every index class writes its own on-disk layout (flat/IVF: ``<path>.npz`` +
``<path>.meta.json``; transformed chains: a directory with
``transformed_meta.json``).  ``load_index`` restores whichever kind lives at
``path`` — the role of ``faiss.read_index`` (reference trainer.py:252-262),
which likewise dispatches on the serialized index type.
"""

from __future__ import annotations

import json
import os


def load_index(path: str):
    """Load a saved index of any kind (flat, IVF, or transformed chain)."""
    if os.path.isdir(path) and os.path.exists(
            os.path.join(path, "transformed_meta.json")):
        from .transforms import TransformedIndex

        return TransformedIndex.load(path)
    meta_path = path + ".meta.json"
    if not os.path.exists(meta_path):
        raise FileNotFoundError(f"no index found at {path!r}")
    with open(meta_path) as fh:
        meta = json.load(fh)
    if meta.get("kind") == "pq":
        from .pq import PQIndex

        return PQIndex.load(path)
    if meta.get("kind") == "ivfpq":
        from .ivf_pq import IVFPQIndex

        return IVFPQIndex.load(path)
    if meta.get("kind") == "ivfr":
        from .ivf import IVFRaggedIndex

        return IVFRaggedIndex.load(path)
    if meta.get("kind") == "ivf":
        from .ivf import IVFFlatIndex

        return IVFFlatIndex.load(path)
    from .flat import FlatIPIndex

    return FlatIPIndex.load(path)
