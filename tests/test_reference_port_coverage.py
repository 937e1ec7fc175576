"""Port-coverage audit: every test function in the reference's suite
must be covered — either its name appears in our tests (direct port) or
a ``file.py:line`` citation within 8 lines of its definition does
(ports that cite the reference's line ranges). Rounds 5-7 ported the
whole inventory; this invariant keeps future reference-suite drift
visible instead of silently unported."""

import glob
import os
import re

HERE = os.path.dirname(os.path.abspath(__file__))
REF_TESTS = "/root/reference/tests"


def test_every_reference_test_is_ported_or_cited():
    ours = ""
    for f in glob.glob(os.path.join(HERE, "*.py")):
        if os.path.basename(f) == os.path.basename(__file__):
            continue
        ours += open(f, encoding="utf-8").read()
    missing = []
    for rf in sorted(glob.glob(os.path.join(REF_TESTS, "test_*.py"))):
        src = open(rf, encoding="utf-8").read()
        base = os.path.basename(rf)
        for m in re.finditer(r"^\s*def (test_[a-zA-Z_0-9]+)", src, re.M):
            name = m.group(1)
            line = src[: m.start()].count("\n") + 1
            if name in ours:
                continue
            if any(f"{base}:{ln}" in ours
                   for ln in range(line - 8, line + 9)):
                continue
            missing.append(f"{name} ({base}:{line})")
    assert not missing, (
        f"{len(missing)} reference tests have no port/citation:\n  "
        + "\n  ".join(missing)
    )
