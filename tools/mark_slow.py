"""Regenerate tests/slow_tests.txt (the smoke tier's slow-mark list) from
a full-suite duration profile:

    python -m pytest tests/ -q --durations=0 > /tmp/durations.log
    python tools/mark_slow.py /tmp/durations.log [threshold_seconds]

A test FUNCTION is marked slow when its cumulative setup+call+teardown
across all parametrized cases meets the threshold (default 3 s — chosen
so `pytest -m "not slow"` completes in under ~3 minutes)."""

import collections
import re
import sys


def main() -> None:
    log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/durations.log"
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    tot = collections.Counter()
    for ln in open(log):
        m = re.match(r"(\d+\.\d+)s (call|setup|teardown)\s+(\S+)",
                     ln.strip())
        if m:
            tot[m.group(3).split("[")[0]] += float(m.group(1))
    slow = sorted(f for f, t in tot.items() if t >= thresh)
    kept = sum(t for f, t in tot.items() if t < thresh)
    with open("tests/slow_tests.txt", "w") as f:
        f.write(
            "# Tests marked @slow by the conftest hook (cumulative setup+"
            "call+\n# teardown >= %g s in the full-suite duration profile;"
            " regenerate\n# with: pytest tests/ -q --durations=0 and "
            "tools/mark_slow.py).\n# The smoke tier `pytest -m 'not slow'`"
            " runs the remainder in\n# under ~3 minutes; CI runs the full "
            "suite.\n" % thresh)
        for fn in slow:
            f.write(fn + "\n")
    print(f"marked {len(slow)} functions; smoke tier ~{kept:.0f}s of "
          f"profiled time")


if __name__ == "__main__":
    main()
