"""Tiny-mode knob for the example scripts (smoke gate).

The reference executes its literate tutorials in docs CI, so a tutorial
that raises or diverges fails the build (``docs/src/literate-tutorials/``
via Literate.jl). The TPU-native analog: every ``examples/*.py`` honors
``THUNDERBOLT_SMOKE=1`` by shrinking meshes/time horizons to a
seconds-scale run (and loosening any quantitative asserts accordingly),
and ``tests/test_examples.py`` executes each one in a subprocess under
that knob — an example that raises or produces NaNs fails the suite.

Usage inside an example::

    from thunderbolt_tpu.utils.smoke import smoke, SMOKE
    mesh = tb.generate_ideal_lv_mesh(*smoke((6, 2, 3), (12, 3, 6)))
    NSTEPS = smoke(5, 400)

Importing this module with ``THUNDERBOLT_SMOKE=1`` also forces the CPU
platform: the smoke gate's subprocesses must not round-trip the remote
TPU tunnel (the container's sitecustomize registers the axon backend
before env overrides can land, so this must happen via jax.config).
"""

import os

SMOKE = os.environ.get("THUNDERBOLT_SMOKE", "") == "1"

if SMOKE:
    import jax

    jax.config.update("jax_platforms", "cpu")


def smoke(tiny, full):
    """``tiny`` when THUNDERBOLT_SMOKE=1, else ``full``."""
    return tiny if SMOKE else full
