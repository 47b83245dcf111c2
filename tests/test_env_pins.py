"""Environment drift guard (VERDICT r10 #7): the Arrow≡JVM
bit-exactness tests are properties of the VALIDATED pandas/pyarrow/
numpy versions recorded in requirements.txt. A silent env bump must
not silently move that ground: this test WARNS on any drift (the
suite still decides correctness — if the exactness tests still pass
on the new versions, update requirements.txt alongside them)."""

from __future__ import annotations

import re
import warnings
from pathlib import Path

PINS = {}
for line in (Path(__file__).resolve().parent.parent / "requirements.txt").read_text().splitlines():
    m = re.match(r"^(\w+)==(.+)$", line.strip())
    if m:
        PINS[m.group(1)] = m.group(2)


def test_validated_versions_match_requirements():
    import importlib

    assert PINS, "requirements.txt lost its pins"
    drifted = []
    for mod, want in PINS.items():
        got = importlib.import_module(mod).__version__
        if got != want:
            drifted.append(f"{mod}: validated {want}, running {got}")
    if drifted:
        warnings.warn(
            "environment drifted from the validated pin set — re-validate "
            "the Arrow≡JVM exactness tests and update requirements.txt: "
            + "; ".join(drifted),
            stacklevel=1,
        )
