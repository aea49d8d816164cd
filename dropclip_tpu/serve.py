"""Load and run exported grounding artifacts (``tools/export_model.py``).

The consumer side of the export story: a serving host needs only this
module (and jax) — no model code, checkpoint, or config. The artifact
bakes the student weights and the grounding math; text embeddings come
from the caller (a CLIP text tower or a prompt cache).

    from dropclip_tpu.serve import load_exported
    run = load_exported("student_serve.jaxexp")
    masks, sims, dropped = run(coords, mask, in_feats, qpos, qneg)
"""

from __future__ import annotations

from typing import Callable


def load_exported(path: str) -> Callable:
    """Deserialize an exported artifact into a jit-compiled callable.

    The callable's signature and static shapes are whatever the artifact
    was exported with (see its ``.in_avals`` via
    ``jax.export.deserialize(open(path, 'rb').read())``)."""
    import jax
    from jax import export

    with open(path, "rb") as f:
        exported = export.deserialize(bytearray(f.read()))
    return jax.jit(exported.call)
