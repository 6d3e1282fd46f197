"""Summarize a hardware-queue log (/tmp/hw_queue.log) into a triage table.

The outage-recovery queue (docs/ROUND3.md) appends every tool's stdout to
one log. This parses it back into per-step status + every GCUPS
measurement line, so the adoption decisions (DESIGN.md round-3 checklist)
can be made at a glance instead of re-reading thousands of log lines.

Usage: python tools/hw_summary.py [/tmp/hw_queue.log]
"""

from __future__ import annotations

import re
import sys


def summarize(text: str) -> str:
    out: list[str] = []
    step = None
    gcups_re = re.compile(
        r"(lq=\s*\d+.*?(\d+\.\d+)\s*GCUPS|\"value\": ?([\d.]+)|"
        r"GCUPS[=:]? ?([\d.]+))"
    )
    fail_re = re.compile(r"COMPILE FAIL|FAIL|Error|error:|Traceback")
    steps: list[tuple[str, list[str], list[str], str | None]] = []
    hits: list[str] = []
    fails: list[str] = []
    rc: str | None = None
    for line in text.splitlines():
        m = re.match(r"^--- (\[\d+\].*) ---$", line)
        if m:
            if step is not None:
                steps.append((step, hits, fails, rc))
            step, hits, fails, rc = m.group(1), [], [], None
            continue
        if line.startswith("rc="):
            rc = line[3:].strip()
            continue
        if step is None:
            continue
        if gcups_re.search(line):
            hits.append(line.strip())
        elif fail_re.search(line):
            fails.append(line.strip())
    if step is not None:
        steps.append((step, hits, fails, rc))

    if not steps:
        return "no queue steps found (log empty or format changed)"
    for name, hits, fails, rc in steps:
        status = "ok" if rc == "0" else f"rc={rc}"
        out.append(f"\n=== {name}  [{status}] ===")
        for h in hits:
            out.append(f"  {h}")
        for f in fails[:6]:
            out.append(f"  ! {f}")
        if len(fails) > 6:
            out.append(f"  ! ... {len(fails) - 6} more failure lines")
        if not hits and not fails:
            out.append("  (no measurement lines)")
    return "\n".join(out)


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hw_queue.log"
    try:
        text = open(path).read()
    except OSError as e:
        print(f"cannot read {path}: {e}")
        sys.exit(1)
    print(summarize(text))
