"""Cross-backend golden check: render the golden scenes on the REAL
backend (TPU: Pallas exact-pair rasterizer + packed samplers) and compare
against the committed CPU-generated goldens.

The CI suite runs on CPU (tests/conftest.py), where the jnp reference
rasterizer is used — so nothing there exercises the TPU kernels against
the goldens. This tool closes that gap — its first run caught a real bug
(bitcast int-in-float material ids being denormal-flushed to 0 on TPU).

Tolerances are looser than the CPU test: edge coverage can flip between
backends within FP ULPs (both rasterizations are valid), and a flipped
shadow-silhouette texel moves PCF by exactly one tap (0.036), so pixels
are allowed to deviate by up to one tap and a small fraction (penumbra
edges) by more.

Usage: python tools/tpu_golden_check.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.test_golden import GOLDEN_DIR, VIEWS, _render_all  # noqa: E402


def main() -> int:
    import jax

    backend = jax.default_backend()
    if backend == "cpu":
        print("WARNING: running on CPU — this only re-checks the jnp path")
    from zeldaengine_tpu.utils.image import read_png

    out = _render_all()
    failures = []
    for name in sorted(VIEWS):
        path = os.path.join(GOLDEN_DIR, f"{name}.png")
        if not os.path.exists(path):
            print(f"{name}: no golden, skipped")
            continue
        golden = read_png(path)[..., :3]
        got = out[name]
        diff = np.abs(got - golden)
        frac_off = float((diff > 0.045).mean())  # > one PCF tap
        med = float(np.median(diff))
        # The raw shadow-factor view is the most edge-sensitive surface:
        # one borderline silhouette edge flipping between backends (both
        # rasterizations valid within FP ULPs) shifts a whole penumbra
        # band by a texel (~3% of pixels by >1 tap on the golden scene).
        limit = 0.05 if name == "shadow" else 0.02
        ok = frac_off < limit and med <= 1 / 255
        print(f"{name}: off>tap {frac_off:.4f}, median {med:.5f} "
              f"-> {'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append(name)
    if failures:
        print(f"FAIL on {backend}: {failures}")
        return 1
    print(f"ALL GOLDENS MATCH on backend={backend}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
