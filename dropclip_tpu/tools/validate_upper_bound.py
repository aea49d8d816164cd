"""Fusion-quality upper-bound evaluation — CLI alias.

Counterpart of reference tools/validate_upper_bound.py:164-313: runs the
grounding eval scoring the FUSED TEACHER FEATURES themselves as if they
were model outputs (``out = targets``, :191-192) — the ceiling a perfect
student could reach. Equivalent to
``validate_blender --opts eval_upper_bound True``; kept as its own entry
point for reference-CLI parity.
"""

from __future__ import annotations

import sys


def main() -> None:
    from ..core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()  # the axon TPU plugin ignores the env var
    if "--opts" in sys.argv:
        i = sys.argv.index("--opts")
        sys.argv = (sys.argv[: i + 1] + ["eval_upper_bound", "True"]
                    + sys.argv[i + 1:])
    else:
        sys.argv += ["--opts", "eval_upper_bound", "True"]
    from .validate_blender import main as vb_main

    vb_main()


if __name__ == "__main__":
    main()
