"""tools/adopt.py — queue-log parsing and adoption decision rules.

The tool must be trustworthy BEFORE the hardware window opens (it reads
the logs the armed queue writes, docs/outage/hw_queue.sh), so every
decision rule is pinned here against a synthetic log that mimics the
real tools' print formats byte-for-byte (exp_pack/tpu_check/
longpair_check/bench.py).
"""

import subprocess
import sys

import pytest

pytestmark = pytest.mark.fast

# Mimics /tmp/hw_queue.log: step headers from hw_queue.sh's step(),
# tool output formats from tools/{exp_pack,tpu_check,longpair_check}.py
# and bench.py. lq is printed %4d, GCUPS %6.1f by the real tools.
LOG = """\
=== HW QUEUE START Tue Aug 18 12:00:00 UTC 2026 ===
--- [0] bench.py --rehearse (tiny-shape two-program hardware rehearsal) ---
{"metric": "gcups", "value": 3.1, "unit": "GCUPS", "vs_baseline": 0.07, "detail": {"rehearsal": true}}
rc=0
--- [1] bench.py official capture ---
{"metric": "gcups", "value": 231.0, "unit": "GCUPS", "vs_baseline": 5.37, "detail": {}}
rc=0
--- [2] tpu_check --paths (production path validation) ---
stream lq=144 KernelConfig(nw=2, jb=4, ui=16, ic=144, pipe=6, pack=4, upk='floor'): exact=True
striped verify lq=1200: exact=True
FAILURES: 0
rc=0
--- [3] exp_pack sweep: all bands + chain-count candidates, 3 reps ---
--- lq=17 (production: KernelConfig(nw=5, jb=8, ui=2, ic=18, pipe=6, pack=2, upk='floor')) ---
lq=  17 KernelConfig(nw=5, jb=8, ui=2, ic=18, pipe=6, pack=2, upk='floor'): exact=True   174.0 GCUPS  (load 12s) rep1
lq=  17 KernelConfig(nw=5, jb=8, ui=2, ic=18, pipe=6, pack=2, upk='floor'): exact=True   176.0 GCUPS  (load 12s) rep2
lq=  17 KernelConfig(nw=5, jb=8, ui=2, ic=18, pipe=6, pack=2, upk='floor'): exact=True   175.0 GCUPS  (load 12s) rep3
lq=  17 KernelConfig(nw=5, jb=8, ui=2, ic=18, pipe=6, pack=2, upk='floor'): median  175.0 GCUPS over 3 reps (spread 1.1%)
lq=  17 KernelConfig(nw=8, jb=8, ui=2, ic=20, pipe=6, pack=4, upk='floor'): exact=True   160.0 GCUPS  (load 30s) rep1
lq=  17 KernelConfig(nw=8, jb=8, ui=2, ic=20, pipe=6, pack=4, upk='floor'): median  160.0 GCUPS over 3 reps (spread 2.0%)
--- lq=64 (production: KernelConfig(nw=2, jb=4, ui=16, ic=16, pipe=6, pack=1, upk='floor')) ---
lq=  64 KernelConfig(nw=2, jb=4, ui=16, ic=16, pipe=6, pack=1, upk='floor'): median  200.0 GCUPS over 3 reps (spread 3.0%)
lq=  64 KernelConfig(nw=4, jb=4, ui=16, ic=16, pipe=6, pack=1, upk='floor'): median  206.0 GCUPS over 3 reps (spread 4.0%)
--- lq=144 (production: KernelConfig(nw=2, jb=4, ui=16, ic=144, pipe=6, pack=4, upk='floor')) ---
lq= 144 KernelConfig(nw=2, jb=4, ui=16, ic=144, pipe=6, pack=4, upk='floor'): exact=True   232.0 GCUPS  (load 14s) rep1
lq= 144 KernelConfig(nw=2, jb=4, ui=16, ic=144, pipe=6, pack=4, upk='floor'): median  232.0 GCUPS over 3 reps (spread 4.0%)
lq= 144 KernelConfig(nw=3, jb=8, ui=16, ic=144, pipe=6, pack=4, upk='floor'): exact=True   268.0 GCUPS  (load 22s) rep1
lq= 144 KernelConfig(nw=3, jb=8, ui=16, ic=144, pipe=6, pack=4, upk='floor'): median  268.0 GCUPS over 3 reps (spread 3.5%)
mq8 lq= 144 KernelConfig(nw=9, jb=9, ui=2, ic=16, pipe=6, pack=4, upk='floor'): SKIP (exceeds VMEM budget)
--- lq=256 (production: KernelConfig(nw=4, jb=4, ui=16, ic=16, pipe=0, pack=1, upk='floor')) ---
lq= 256 KernelConfig(nw=4, jb=4, ui=16, ic=16, pipe=0, pack=1, upk='floor'): median  224.0 GCUPS over 3 reps (spread 2.0%)
lq= 256 KernelConfig(nw=2, jb=8, ui=16, ic=16, pipe=0, pack=1, upk='floor'): exact=True   270.0 GCUPS  (load 25s)
rc=0
--- [4] exp_pack upk=round vs floor at lq=144, 3 reps ---
--- lq=144 (production: KernelConfig(nw=2, jb=4, ui=16, ic=144, pipe=6, pack=4, upk='floor')) ---
lq= 144 KernelConfig(nw=2, jb=4, ui=16, ic=144, pipe=6, pack=4, upk='floor'): median  256.0 GCUPS over 3 reps (spread 3.0%)
rc=0
--- [5] exp_pack row-stacked mq ---
--- mq8 lq=17 (production: KernelConfig(nw=8, jb=4, ui=8, ic=24, pipe=6, pack=1, upk='floor')) ---
lq=  17 KernelConfig(nw=8, jb=4, ui=8, ic=24, pipe=6, pack=1, upk='floor'): median  120.0 GCUPS over 3 reps (spread 4.0%)
lq=  17 KernelConfig(nw=2, jb=4, ui=2, ic=160, pipe=6, pack=4, upk='floor'): median  140.0 GCUPS over 3 reps (spread 4.0%)
rc=0
--- [6] tpu_check --mq64 (aggregate vs single-query) ---
mq64: exact=True  blocked kernel=1.000s wall=2.0s  sequential kernel=1.500s wall=3.0s  kernel speedup=1.50x  wall speedup=1.50x  aggregate=150.0 GCUPS
rc=0
--- [7] longpair hardware point (striped pipe0) ---
longpair lq=35000:  180.0 GCUPS wall (3.00s, 550.5 Gcell, 69 stripe passes, warm 60s)
rc=0
--- [8] longpair packed stripes (pipe6 pack4 full-height) ---
longpair lq=35000:  210.0 GCUPS wall (2.60s, 550.5 Gcell, 92 stripe passes, warm 70s)
rc=0
--- [10] per-band constant-S ceilings (roofline) ---
--- lq=17 (production: KernelConfig(nw=5, jb=8, ui=2, ic=18, pipe=6, pack=2, upk='floor')) ---
lq=  17 KernelConfig(nw=5, jb=8, ui=2, ic=18, pipe=6, pack=2, upk='floor'): exact=skipped   430.0 GCUPS  (load 9s)
--- lq=144 (production: KernelConfig(nw=2, jb=4, ui=16, ic=144, pipe=6, pack=4, upk='floor')) ---
lq= 144 KernelConfig(nw=2, jb=4, ui=16, ic=144, pipe=6, pack=4, upk='floor'): exact=skipped   471.0 GCUPS  (load 9s)
rc=0
=== HW QUEUE DONE Tue Aug 18 14:00:00 UTC 2026 ===
"""


def run_adopt(tmp_path, text):
    p = tmp_path / "hw_queue.log"
    p.write_text(text)
    r = subprocess.run(
        [sys.executable, "tools/adopt.py", str(p)],
        capture_output=True, text=True, cwd=".",
    )
    return r.returncode, r.stdout


def test_full_queue_log(tmp_path):
    rc, out = run_adopt(tmp_path, LOG)
    assert rc == 0, out
    assert "CRITICAL" not in out

    # bench lines, rehearsal tagged
    assert "gcups=3.1 GCUPS vs_baseline=0.07 [rehearsal]" in out
    assert "gcups=231.0 GCUPS vs_baseline=5.37" in out

    # lq=17: production is the winner -> KEEP
    assert "-- lq=17 " in out
    i17 = out.index("-- lq=17 ")
    assert "KEEP production (it is the measured winner)" in \
        out[i17:out.index("-- lq=64")]

    # lq=64: +3.0% inside the 6% floor -> tie, KEEP
    seg64 = out[out.index("-- lq=64"):out.index("-- lq=144")]
    assert "inside the" in seg64 and "KEEP production" in seg64

    # lq=144: +15.5% with 3 reps -> ADOPT with the exact table tuple
    seg144 = out[out.index("-- lq=144"):out.index("-- lq=256")]
    assert "ADOPT: prepend (3, 8, 16, 6, True, 4) to _SHAPES_XLONG" \
        in seg144

    # lq=256: +20% but single rep -> NEEDS REPEATS
    seg256 = out[out.index("-- lq=256"):]
    assert "NEEDS REPEATS" in seg256
    assert "exp_pack --lq 256 --repeat 3" in seg256

    # upk: round 256 vs floor 232 (+10.3% > 4% spread) -> FLIP
    assert "-> FLIP" in out
    assert "set PRODUCTION_UPK = 'round'" in out

    # mq: stacked best 140 vs flat best 175 at lq=17 -> DELETE
    assert "DELETE _SHAPES_MQ" in out
    assert "kernel speedup 1.50x" in out

    # longpair: packed +16.7% -> prepend recommendation
    assert "packed stripes win" in out
    assert "_SHAPES_STRIPE" in out

    # const-S ceilings -> roofline refresh with the max
    assert "ROOFLINE_GCUPS = 471.0" in out

    # VMEM skip surfaced, never adopted
    assert "exceeds VMEM" in out

    # every step's rc visible
    assert "[8] ok" in out


def test_exactness_failure_is_critical(tmp_path):
    bad = LOG.replace(
        "KernelConfig(nw=3, jb=8, ui=16, ic=144, pipe=6, pack=4, "
        "upk='floor'): median  268.0",
        "KernelConfig(nw=3, jb=8, ui=16, ic=144, pipe=6, pack=4, "
        "upk='floor'): median  268.0",
    ).replace("FAILURES: 0", "FAILURES: 2")
    rc, out = run_adopt(tmp_path, bad)
    assert rc == 1
    assert "CRITICAL" in out and "FAILURES: 2" in out


def test_exact_false_blocks_and_flags(tmp_path):
    bad = LOG.replace(
        "lq= 144 KernelConfig(nw=3, jb=8, ui=16, ic=144, pipe=6, "
        "pack=4, upk='floor'): median  268.0 GCUPS over 3 reps "
        "(spread 3.5%)",
        "lq= 144 KernelConfig(nw=3, jb=8, ui=16, ic=144, pipe=6, "
        "pack=4, upk='floor'): exact=False   268.0 GCUPS  (load 20s)",
    )
    rc, out = run_adopt(tmp_path, bad)
    assert rc == 1
    assert "CRITICAL" in out
    # the inexact challenger must not be adopted
    assert "ADOPT: prepend (3, 8, 16, 6, True, 4)" not in out


def test_empty_log(tmp_path):
    rc, out = run_adopt(tmp_path, "")
    assert rc == 0
    assert "nothing recognized" in out
